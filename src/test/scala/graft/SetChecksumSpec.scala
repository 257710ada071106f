package graft

import graft.streaming.{NodeSetChecksumManager, SetChecksum}
import org.scalatest.funsuite.AnyFunSuite

/** Dispatcher-set consistency checksum + the coordinator-side manager
  * (reference pkg/set_checksum/set_checksum.go;
  * maintainer/node_set_checksum_manager.go incl. its resend/ack and
  * heartbeat-warn tests). */
class SetChecksumSpec extends AnyFunSuite {

  test("checksum algebra: order-independent, removal is exact inverse") {
    val ids = Seq((1L, 2L), (3L, 4L), (-5L, Long.MaxValue), (7L, Long.MinValue))
    val fwd = SetChecksum.of(ids)
    val rev = SetChecksum.of(ids.reverse)
    assert(fwd == rev, "add order must not matter")
    assert(fwd.count == 4)
    // removing one element equals the checksum of the rest
    val without = SetChecksum.of(ids.tail)
    assert(fwd.remove(1L, 2L) == without)
    // removing everything returns to empty
    assert(ids.foldLeft(fwd) { case (c, (h, l)) => c.remove(h, l) }.isEmpty)
    // (count,xor,sum) catches what xor alone cannot: {a,a,b} vs {b}
    val a = (11L, 13L); val b = (17L, 19L)
    val multi = SetChecksum().add(a._1, a._2).add(a._1, a._2).add(b._1, b._2)
    assert(multi != SetChecksum().add(b._1, b._2))
  }

  test("assign/move keeps the one-owner invariant: both nodes dirty, " +
      "checksums track exactly the owned sets") {
    val m = new NodeSetChecksumManager(resendIntervalMs = 1000L)
    m.assign(1L, 1L, node = 0)
    m.assign(2L, 2L, node = 0)
    m.assign(3L, 3L, node = 1)
    assert(m.expected(0) == SetChecksum.of(Seq((1L, 1L), (2L, 2L))))
    assert(m.expected(1) == SetChecksum.of(Seq((3L, 3L))))
    // move 2 from node 0 to node 1: both sides update
    m.assign(2L, 2L, node = 1)
    assert(m.expected(0) == SetChecksum.of(Seq((1L, 1L))))
    assert(m.expected(1) == SetChecksum.of(Seq((3L, 3L), (2L, 2L))))
    // re-assigning to the same node is a no-op (no dirty churn)
    val before = m.collectUpdates(nowMs = 0L) // drain dirt
    assert(before.map(_.node).sorted == Seq(0, 1))
    m.assign(2L, 2L, node = 1)
    m.handleAck(0, before.find(_.node == 0).get.seq)
    m.handleAck(1, before.find(_.node == 1).get.seq)
    assert(m.collectUpdates(nowMs = 1L).isEmpty)
    // remove drops from its owner only
    m.remove(1L, 1L)
    assert(m.expected(0).isEmpty)
    assert(m.expected(1) == SetChecksum.of(Seq((3L, 3L), (2L, 2L))))
  }

  test("resend-and-ack: an unacked update resends after the throttle, " +
      "an acked one never does (node_set_checksum_manager_test.go analog)") {
    val m = new NodeSetChecksumManager(resendIntervalMs = 1000L)
    m.assign(1L, 1L, node = 0)
    m.assign(2L, 2L, node = 1)
    val first = m.collectUpdates(nowMs = 0L)
    assert(first.map(_.node).sorted == Seq(0, 1))
    assert(first.forall(_.seq == 1L))
    // inside the throttle window: nothing resends
    assert(m.collectUpdates(nowMs = 500L).isEmpty)
    // node 0 acks; node 1 does not → only node 1 resends, SAME seq
    m.handleAck(0, 1L)
    val resent = m.collectUpdates(nowMs = 1500L)
    assert(resent.map(_.node) == Seq(1) && resent.head.seq == 1L)
    // a new assignment bumps the sequence (fresh update, not a resend)
    m.assign(9L, 9L, node = 1)
    val fresh = m.collectUpdates(nowMs = 1600L)
    assert(fresh.map(_.node) == Seq(1) && fresh.head.seq == 2L)
    assert(fresh.head.checksum == SetChecksum.of(Seq((2L, 2L), (9L, 9L))))
    // stale ack (seq 1) does not regress the acked watermark past 2
    m.handleAck(1, 2L)
    m.handleAck(1, 1L)
    assert(m.collectUpdates(nowMs = 9999L).isEmpty)
  }

  test("registry drift check: moves and splits relocate span checksums; " +
      "a stale worker report is flagged, a faithful one is not") {
    val spark = SparkSpec.spark
    val tmp = java.nio.file.Files.createTempDirectory("graft-drift").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/src/events.parquet"))
    val reg = new graft.streaming.ChangefeedRegistry(spark)
    // a WILDCARD dispatch rule — the expected-placement side must
    // resolve it with the same first-match TableMatcher semantics the
    // data-path partitioner uses, not literal matcher equality
    val cfg = graft.model.ChangefeedConfig(id = "cf-drift",
      sink = graft.model.SinkConfig(numPartitions = 4,
        dispatch = Seq(graft.model.DispatchRule(Seq("app.*"),
          graft.model.PartitionRule.Fixed(2)))))
    reg.create(cfg, s"$tmp/src", s"$tmp/sink", s"$tmp/ckpt")
      .awaitTermination(120000)
    val tables = Seq(("app", "t0"), ("app", "t1"), ("app", "t2"))
    val before = reg.spanSetChecksums("cf-drift", tables)
    assert(before.values.map(_.count).sum == 3L)
    assert(before.keySet == Set(2),
      s"the app.* wildcard pins every app table at node 2: $before")
    // a faithful report (the expected sets themselves) shows no drift
    assert(reg.spanDrift("cf-drift", tables, before).isEmpty)
    // move t1 to node 3: the drift check against the STALE report
    // flags exactly the nodes whose sets changed
    reg.moveTable("cf-drift", "app", "t1", target = 3)
    val after = reg.spanSetChecksums("cf-drift", tables)
    assert(after.values.map(_.count).sum == 3L)
    val drifted = reg.spanDrift("cf-drift", tables, before)
    assert(drifted.nonEmpty && drifted.contains(3),
      s"the move target must drift vs the stale report: $drifted")
    assert(reg.spanDrift("cf-drift", tables, after).isEmpty)
    // splitting multiplies the span's pieces across nodes
    reg.splitTable("cf-drift", "app", "t2", parts = 4)
    val split = reg.spanSetChecksums("cf-drift", tables)
    assert(split.values.map(_.count).sum == 6L, "t2 becomes 4 pieces")
    assert(reg.spanDrift("cf-drift", tables, after).nonEmpty)
    reg.remove("cf-drift")
  }

  test("heartbeat observation: warn only after a continuous non-match run, " +
      "throttled; MATCH or a state transition resets the clock") {
    val m = new NodeSetChecksumManager(
      warnAfterMs = 1000L, warnIntervalMs = 1000L)
    assert(m.observeHeartbeat(0, "mismatch", 0L).isEmpty)     // run starts
    assert(m.observeHeartbeat(0, "mismatch", 500L).isEmpty)   // < warnAfter
    assert(m.observeHeartbeat(0, "mismatch", 1000L) == Some(1000L)) // warns
    assert(m.observeHeartbeat(0, "mismatch", 1500L).isEmpty)  // throttled
    assert(m.observeHeartbeat(0, "mismatch", 2000L) == Some(2000L)) // again
    // a MATCH resets everything
    assert(m.observeHeartbeat(0, "match", 2500L).isEmpty)
    assert(m.observeHeartbeat(0, "mismatch", 3000L).isEmpty)
    assert(m.observeHeartbeat(0, "mismatch", 3500L).isEmpty)  // run only 500
    // a transition between NON-match states restarts the run too
    assert(m.observeHeartbeat(0, "unknown", 4000L).isEmpty)
    assert(m.observeHeartbeat(0, "unknown", 4800L).isEmpty)   // run only 800
    assert(m.observeHeartbeat(0, "unknown", 5200L) == Some(1200L))
  }
}
