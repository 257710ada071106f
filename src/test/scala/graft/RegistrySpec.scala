package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.model._
import graft.operators.{Filters, Routing}
import graft.streaming.ChangefeedRegistry

class RegistrySpec extends SparkFunSuite {

  test("changefeed lifecycle: create -> pause -> resume, exactly-once") {
    val tmp = Files.createTempDirectory("graft-reg").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/src/events.parquet"))
    val reg = new ChangefeedRegistry(spark)
    val cfg = ChangefeedConfig(id = "cf1")
    val q = reg.create(cfg, s"$tmp/src", s"$tmp/sink", s"$tmp/ckpt")
    q.awaitTermination(120000)
    val (_, _, n1) = reg.status("cf1")
    assert(n1 > 0)
    reg.pause("cf1")
    assert(reg.status("cf1")._2 == "paused")
    val q2 = reg.resume("cf1")
    q2.awaitTermination(120000)
    assert(reg.status("cf1")._3 == n1, "resume from checkpoint re-emits nothing")
    assert(reg.list == Seq("cf1"))
    reg.remove("cf1")
    assert(reg.list.isEmpty)
  }

  test("error reports drive warning -> backoff restart -> recovery; fast-fail pins failed") {
    import graft.streaming.{FeedError, FeedState}
    val tmp = Files.createTempDirectory("graft-boreg").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/src/events.parquet"))
    val reg = new ChangefeedRegistry(spark)
    reg.create(ChangefeedConfig(id = "cfb"), s"$tmp/src", s"$tmp/sink", s"$tmp/ckpt")
      .awaitTermination(120000)
    val t0 = 1000000L
    // healthy baseline report, then a sink error with the checkpoint
    // stuck at that baseline: feed goes warning, query stops
    assert(reg.reportStatus("cfb", 7L, Nil, t0 - 1000) == FeedState.Normal)
    val st = reg.reportStatus("cfb", checkpointTs = 7L,
      Seq(FeedError("CDC:ErrMySQLTxnError", "deadlock")), t0)
    assert(st == FeedState.Warning && reg.status("cfb")._2 == "warning")
    assert(reg.retryDue(t0 + 5000).isEmpty, "backoff interval not elapsed")
    assert(reg.retryDue(t0 + 10000) == Seq("cfb"), "restarts once 10s elapsed")
    assert(reg.status("cfb")._2 == "warning",
      "warning persists until the checkpoint advances")
    // progress clears it
    assert(reg.reportStatus("cfb", 8L, Nil, t0 + 20000) == FeedState.Normal)
    assert(reg.status("cfb")._2 != "warning")
    assert(reg.lastError("cfb").isEmpty)
    // fast-fail: pinned failed until an explicit resume
    assert(reg.reportStatus("cfb", 8L,
      Seq(FeedError("CDC:ErrStartTsBeforeGC", "gone")), t0 + 30000) == FeedState.Failed)
    assert(reg.status("cfb")._2 == "failed")
    assert(reg.retryDue(Long.MaxValue - 1).isEmpty)
    reg.resume("cfb").awaitTermination(120000)
    assert(reg.status("cfb")._2 != "failed", "resume clears failed")
    reg.remove("cfb")
  }

  test("gc safepoint: min checkpoint over feeds that still block GC") {
    import graft.streaming.FeedError
    val tmp = Files.createTempDirectory("graft-gcsp").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/src/events.parquet"))
    val reg = new ChangefeedRegistry(spark)
    for (cf <- Seq("ga", "gb"))
      reg.create(ChangefeedConfig(id = cf), s"$tmp/src", s"$tmp/sink-$cf",
        s"$tmp/ckpt-$cf").awaitTermination(120000)
    reg.reportStatus("ga", 100L, Nil, 0L)
    reg.reportStatus("gb", 50L, Nil, 0L)
    assert(reg.gcSafepoint.contains(50L), "min over all blocking feeds")
    assert(reg.gcBarriers == Map("default" -> 50L),
      "same-keyspace feeds share one barrier")
    // gb fails BECAUSE of GC: it stops blocking the safepoint
    reg.reportStatus("gb", 50L, Seq(FeedError("CDC:ErrSnapshotLostByGC", "gone")), 1L)
    assert(reg.gcSafepoint.contains(100L), "gc-failed feed releases the safepoint")
    // ga fails for a non-GC reason: its data is still wanted -> blocks
    reg.reportStatus("ga", 100L, Seq(FeedError("CDC:ErrSinkURIInvalid", "bad")), 2L)
    assert(reg.gcSafepoint.contains(100L), "non-gc-failed feed still blocks")
    reg.remove("ga"); reg.remove("gb")
    assert(reg.gcSafepoint.isEmpty, "no feeds, nothing blocks GC")
  }

  test("target-ts reached: feed finishes, stops blocking GC, cannot resume") {
    val tmp = Files.createTempDirectory("graft-fin").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/src/events.parquet"))
    val reg = new ChangefeedRegistry(spark)
    reg.create(ChangefeedConfig(id = "fin", targetTs = Some(500L)),
      s"$tmp/src", s"$tmp/sink", s"$tmp/ckpt").awaitTermination(120000)
    assert(reg.reportStatus("fin", 499L, Nil, 0L) == graft.streaming.FeedState.Normal)
    assert(reg.reportStatus("fin", 500L, Nil, 1L) == graft.streaming.FeedState.Finished)
    assert(reg.status("fin")._2 == "finished")
    assert(reg.gcSafepoint.isEmpty, "a finished feed releases the gc safepoint")
    intercept[IllegalArgumentException](reg.resume("fin"))
    reg.remove("fin")
  }

  test("error-caused safe mode: duplicate-entry trips a 5s safe window") {
    val sm = new graft.sinks.MysqlSink.ErrorCausedSafeMode()
    assert(!sm.active(1000L))
    sm.onWriteError("some other failure", 1000L)
    assert(!sm.active(1000L), "non-1062 errors do not trip safe mode")
    sm.onWriteError("Duplicate entry '7' for key 'PRIMARY'", 1000L)
    assert(sm.active(1000L) && sm.active(6000L))
    assert(!sm.active(6001L), "window expires after 5s")
  }

  test("multiple changefeeds over one source run independently with distinct filters") {
    // multi_changefeeds coverage: two feeds, same upstream, different
    // table filters -> disjoint sink contents, independent lifecycle
    val tmp = Files.createTempDirectory("graft-multi").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/src/events.parquet"))
    val reg = new ChangefeedRegistry(spark)
    val qA = reg.create(
      ChangefeedConfig(id = "cf-a", filter = FilterConfig(rules = Seq("app.events_0"))),
      s"$tmp/src", s"$tmp/sinkA", s"$tmp/ckptA")
    val qB = reg.create(
      ChangefeedConfig(id = "cf-b", filter = FilterConfig(rules = Seq("app.events_1"))),
      s"$tmp/src", s"$tmp/sinkB", s"$tmp/ckptB")
    qA.awaitTermination(120000)
    qB.awaitTermination(120000)
    assert(reg.list == Seq("cf-a", "cf-b"))
    val a = spark.read.parquet(s"$tmp/sinkA")
    val b = spark.read.parquet(s"$tmp/sinkB")
    assert(a.count() > 0 && b.count() > 0)
    assert(a.filter(!col("_value").contains("\"table\":\"events_0\"")).count() == 0)
    assert(b.filter(!col("_value").contains("\"table\":\"events_1\"")).count() == 0)
    // pausing one leaves the other resolvable
    reg.pause("cf-a")
    assert(reg.status("cf-a")._2 == "paused" && reg.exists("cf-b"))
    reg.remove("cf-a"); reg.remove("cf-b")
  }

  test("registry persists and restores across coordinator restarts") {
    val tmp = Files.createTempDirectory("graft-regp").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/src/events.parquet"))
    val reg = new ChangefeedRegistry(spark)
    val cfg = ChangefeedConfig(id = "cf-p",
      filter = FilterConfig(rules = Seq("app.*", "!app.events_3")))
    val q = reg.create(cfg, s"$tmp/src", s"$tmp/sink", s"$tmp/ckpt")
    q.awaitTermination(120000)
    val emitted = reg.status("cf-p")._3
    reg.pause("cf-p")
    reg.persist(s"$tmp/meta")

    // coordinator failover: a fresh registry restores the definition
    val reg2 = new ChangefeedRegistry(spark)
    reg2.restore(s"$tmp/meta")
    assert(reg2.list == Seq("cf-p"))
    assert(reg2.status("cf-p")._2 == "paused", "feeds come back paused")
    // resume picks up the original streaming checkpoint: no re-emit
    val q2 = reg2.resume("cf-p")
    q2.awaitTermination(120000)
    assert(reg2.status("cf-p")._3 == emitted, "exactly-once across failover")
    reg2.remove("cf-p")
  }

  test("multi-rule dispatch: first match wins, default rule appended") {
    val env = graft.model.Envelope.fromEvents(
      Tables.events(spark, "/root/testdata/sf0.001"))
    val rules = Seq(
      DispatchRule(matcher = Seq("app.events_0"),
        partition = PartitionRule.Ts, topic = Some("t0_{table}")),
      DispatchRule(matcher = Seq("app.events_*"),
        partition = PartitionRule.KeyColumns(Seq("user_id")),
        topic = Some("rest_{table}")))
    val out = Routing.dispatch(env, rules, 8)
    // events_0 takes the ts rule
    val t0 = out.filter(col("_table") === "events_0")
    assert(t0.filter(col("_partition") =!= pmod(col("_commit_ts"), lit(8L))).count() == 0)
    assert(t0.select("_topic").distinct().head().getString(0) == "t0_events_0")
    // other tables take the key rule topic
    val rest = out.filter(col("_table") === "events_2").select("_topic").distinct()
    assert(rest.head().getString(0) == "rest_events_2")
    // default rule keeps partition within range for everything
    assert(out.filter(col("_partition") < 0 || col("_partition") >= 8).count() == 0)
    // move_split: rows of the split table land ONLY on the pinned
    // targets, and on more than one of them (it actually splits)
    val ms = Routing.dispatch(env, Seq(DispatchRule(
      matcher = Seq("app.events_1"),
      partition = PartitionRule.SplitFixed(Seq(2, 5)))), 8)
      .filter(col("_table") === "events_1")
      .select("_partition").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ms == Set(2L, 5L), s"split-moved rows must cover exactly the targets, got $ms")
  }

  test("salted repartition fans hot keys across sub-partitions") {
    val env = graft.model.Envelope.fromEvents(
      Tables.events(spark, "/root/testdata/sf0.001"))
    val salted = Routing.saltedRepartition(env, Seq("_table"),
      hotKeys = Seq("events_0"), numPartitions = 8, saltFactor = 4)
    import org.apache.spark.sql.functions.spark_partition_id
    val hotSpread = salted.filter(col("_table") === "events_0")
      .select(spark_partition_id()).distinct().count()
    val coldSpread = salted.filter(col("_table") === "events_1")
      .select(spark_partition_id()).distinct().count()
    assert(hotSpread > 1, "hot key spans multiple partitions")
    assert(coldSpread == 1, "cold keys keep per-key locality")
  }

  test("auto load-based span scheduling: a skewed feed auto-splits its hot " +
      "table at the write threshold (balance_splits/write_bytes_splitter), " +
      "the split is key-sticky, and resume re-emits nothing") {
    val tmp = Files.createTempDirectory("graft-autobal").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    // wave 1: every row lands in app.events_0 (user_id ≡ 0 mod 4) —
    // the persistently hot table
    events.withColumn("user_id", col("user_id") * 4L)
      .write.mode("append").parquet(s"$tmp/src")
    val reg = new ChangefeedRegistry(spark)
    val cfg = ChangefeedConfig(id = "cf-bal",
      scheduler = SchedulerConfig(
        enableTableAcrossNodes = true, writeKeyThreshold = 500))
    reg.create(cfg, s"$tmp/src", s"$tmp/sink", s"$tmp/ckpt")
      .awaitTermination(120000)
    val n1 = reg.status("cf-bal")._3
    assert(n1 > 500L, s"the fixture must exceed the threshold: $n1")
    // the balance tick ran on the batch heartbeat: the hot table's
    // span is now split (key-sticky), fenced at the next restart
    val spans = reg.tableSpans("cf-bal")
    assert(spans.exists { case (m, r) =>
      m == "app.events_0" && r.startsWith("split:") }, s"spans: $spans")
    // wave 2 rides the SPLIT placement after resume
    events
      .withColumn("user_id", col("user_id") * 4L)
      .withColumn("event_id", col("event_id") + 10000000L)
      .write.mode("append").parquet(s"$tmp/src")
    reg.resume("cf-bal").awaitTermination(120000)
    assert(reg.status("cf-bal")._3 == n1 * 2,
      "resume re-emits nothing and drains exactly wave 2 (monotone)")
    val sunk = spark.read.parquet(s"$tmp/sink")
      .filter(col("_table") === "events_0")
      .withColumn("uid", coalesce(col("after.user_id"), col("before.user_id")))
    val w1 = sunk.filter(col("_row_id") < 10000000L)
    val w2 = sunk.filter(col("_row_id") >= 10000000L)
    // pre-split: the table rule kept ONE partition; post-split: ≥2
    assert(w1.select("_partition").distinct().count() == 1)
    assert(w2.select("_partition").distinct().count() >= 2,
      "the auto-split must fan the hot table out")
    // key-sticky: every key keeps exactly one sub-partition
    assert(w2.groupBy(col("uid"))
      .agg(countDistinct(col("_partition")).as("nparts"))
      .filter(col("nparts") > 1).count() == 0,
      "per-key order must survive the split (key-sticky salt)")
    // a cooled table merges back on a later tick (hysteresis)
    reg.reportTableWrites("cf-bal", Seq((("app", "events_0"), 10L)))
    val acts = reg.balanceTick("cf-bal")
    assert(acts == Seq("merge:app.events_0"), s"acts: $acts")
    assert(reg.tableSpans("cf-bal").isEmpty)
    // a table that goes FULLY idle (absent from the window) still
    // merges: only tables that keep writing appear in the window, so
    // the idle case must reach the merge branch too
    reg.reportTableWrites("cf-bal", Seq((("app", "events_0"), 1200L)))
    assert(reg.balanceTick("cf-bal") == Seq("split:app.events_0:3"))
    assert(reg.balanceTick("cf-bal") == Seq("merge:app.events_0"),
      "an idle auto-split table merges on the next tick")
    assert(reg.tableSpans("cf-bal").isEmpty)
    // a MANUAL split never auto-merges, idle or not
    reg.splitTable("cf-bal", "app", "events_1", 2)
    assert(reg.balanceTick("cf-bal").isEmpty)
    assert(reg.tableSpans("cf-bal") == Seq(("app.events_1", "split:2")))
    reg.remove("cf-bal")
  }

  test("a create that fails at plan build unregisters the entry: the id " +
      "is NOT burned and a retried create with a fixed config succeeds") {
    val tmp = Files.createTempDirectory("graft-zombie").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/src/events.parquet"))
    val reg = new ChangefeedRegistry(spark)
    // avro with an empty schema-registry fails encodeFeed's require at
    // plan build, BEFORE the query starts
    val bad = ChangefeedConfig(id = "cf-zombie",
      sink = SinkConfig(protocol = graft.model.Protocol.Avro))
    intercept[IllegalArgumentException] {
      reg.create(bad, s"$tmp/src", s"$tmp/sink", s"$tmp/ckpt")
    }
    assert(!reg.exists("cf-zombie"),
      "a failed create must remove its zombie entry")
    // the retry with the registry uri fixed succeeds under the SAME id
    val fixed = bad.copy(sink = bad.sink.copy(
      schemaRegistry = "mem://zombie-retry"))
    graft.functions.AvroWire.dropRegistry("mem://zombie-retry")
    reg.create(fixed, s"$tmp/src", s"$tmp/sink", s"$tmp/ckpt")
      .awaitTermination(120000)
    assert(reg.exists("cf-zombie"))
    assert(reg.status("cf-zombie")._3 > 0L, "the retried feed drains rows")
    reg.remove("cf-zombie")
  }

  test("per-table expression filter rules scope to their matcher") {
    val env = graft.model.Envelope.fromEvents(
      Tables.events(spark, "/root/testdata/sf0.001"))
    val rules = Seq(
      Filters.ExprFilterRule(Seq("app.events_0"), ignoreInsert = Some("value < 1000")),
      Filters.ExprFilterRule(Seq("app.events_1"), ignoreDelete = Some("user_id >= 0")))
    val out = Filters.exprFilterRules(spark, env, rules)
    // all inserts on events_0 dropped (value always < 1000)
    assert(out.filter(col("_table") === "events_0" && col("_op") === "I").count() == 0)
    // all deletes on events_1 dropped
    assert(out.filter(col("_table") === "events_1" && col("_op") === "D").count() == 0)
    // other tables untouched
    val before = env.filter(col("_table") === "events_2").count()
    assert(out.filter(col("_table") === "events_2").count() == before)
  }

  test("synced-status decision table (api/v2/changefeed.go:1671-1730)") {
    val tmp = Files.createTempDirectory("graft-sync").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/src/events.parquet"))
    val reg = new ChangefeedRegistry(spark)
    // zero thresholds fall back to the 300/15 defaults (changefeed.go:1661)
    assert(SyncedStatusConfig(0, 0).effective == SyncedStatusConfig(300, 15))
    val cfg = ChangefeedConfig(id = "cfs")
    reg.create(cfg, s"$tmp/src", s"$tmp/sink", s"$tmp/ckpt").awaitTermination(120000)
    reg.pause("cfs")

    val base = 1700000000000L
    val wait = "The data syncing is not finished, please wait"

    // data arrived 10s ago < synced-check-interval -> not synced, wait
    reg.reportSyncState("cfs", checkpointTsMs = base,
      lastSyncedTsMs = base, pullerResolvedTsMs = base)
    val s3 = reg.syncedStatus("cfs", nowMs = base + 10000)
    assert(!s3.synced && s3.info == wait)
    assert(s3.lastSyncedTsMs == base && s3.nowMs == base + 10000)

    // idle past 300s AND checkpoint fresh within 15s -> strictly synced
    reg.reportSyncState("cfs", checkpointTsMs = base + 395000,
      pullerResolvedTsMs = base + 398000)
    val s1 = reg.syncedStatus("cfs", nowMs = base + 400000)
    assert(s1.synced && s1.info == "The data syncing is finished")

    // idle, checkpoint stale, puller-to-checkpoint gap small -> the
    // upstream-health hint (PD/TiKV may be stuck, data may be complete)
    val s2a = reg.syncedStatus("cfs", nowMs = base + 800000)
    assert(!s2a.synced && s2a.info.startsWith("Please check whether PD is online"))

    // idle, checkpoint stale, puller far ahead -> genuinely not synced
    reg.reportSyncState("cfs", pullerResolvedTsMs = base + 600000)
    val s2b = reg.syncedStatus("cfs", nowMs = base + 800000)
    assert(!s2b.synced && s2b.info == wait)

    // clocks are monotone: a stale report cannot move them backwards
    reg.reportSyncState("cfs", checkpointTsMs = base - 5000)
    assert(reg.syncedStatus("cfs", nowMs = base + 800000)
      .sinkCheckpointTsMs == base + 395000)
    reg.remove("cfs")
  }
}
