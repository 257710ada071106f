package graft

import java.nio.file.Files

import graft.model.DdlAction._
import graft.model.{ChangefeedConfig, ColumnDef, DispatchRule, Envelope, PartitionRule, SchemaRegistry}
import graft.operators.Routing
import graft.streaming.{Changefeed, Failpoints}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DDL execution under split/moved/merged table spans — the
  * single-driver analog of the ddl_for_split_tables family
  * (tests/integration_tests/ddl_for_split_tables… run.sh: one thread
  * runs random DDLs, one runs DMLs, one randomly merges and splits the
  * tables' spans — with the _with_failover variant also killing nodes —
  * then upstream/downstream consistency is checked).
  *
  * The analog composes the pieces the way the reference does:
  * [[Changefeed.runWithDdl]] provides the DDL barrier,
  * [[Routing.dispatch]] with Fixed / TableSplit / SplitFixed rules IS
  * the span placement (a split span = the table fanned over N worker
  * partitions), rule changes fence at restart boundaries (the
  * scheduling fence the reference's barrier-ts provides), and
  * [[Failpoints]] inject the kills. Invariants:
  *
  *  - the downstream DISTINCT state equals the chaos-free golden run
  *    regardless of the split/move/merge/kill schedule (the final
  *    `check_data_consistency` of every variant),
  *  - a key-sticky split keeps each handle key in exactly ONE
  *    partition — the key-range-span property real split spans have
  *    (maintainer/split/splitter.go splits by key range, so one key
  *    never straddles spans and per-key order survives),
  *  - emitted DDL-barrier step bounds stay monotone per batch.
  */
class DdlSplitTablesSpec extends SparkFunSuite {

  private def mkSource(tmp: String): String = {
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Seq("events1.parquet", "events2.parquet").foreach { f =>
      Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$src/$f"))
    }
    src
  }

  private lazy val cuts: Seq[Long] = {
    val ts = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
      .select("_commit_ts").orderBy("_commit_ts")
      .collect().map(_.getLong(0))
    Seq(ts(300), ts(700))
  }

  private def initialRegistry = SchemaRegistry().applyAll((0 until 4).map(i =>
    CreateTable("app", s"events_$i",
      Seq(ColumnDef("user_id", "bigint"), ColumnDef("value", "double")), 0L)))

  /** The run.sh DDL thread's flavors that change row shape. */
  private def ddls: Seq[graft.model.DdlAction] = Seq(
    AddColumn("app", "events_1", ColumnDef("k", "bigint", Some("7")), cuts(0)),
    AddColumn("app", "events_2", ColumnDef("tag", "string", Some("s")), cuts(1)))

  private val numPartitions = 4
  private val cfgBase = ChangefeedConfig(id = "cf-split-ddl",
    splitUpdateOnKeyChange = false, maxFilesPerTrigger = Some(1))

  /** Route a flat emitted step with the CURRENT span rules and append
    * with its assigned partition — the span placement applied at the
    * sink fence. The key image for delete-aware salts is
    * reconstructed from the flat payload (the step is already
    * image-resolved). */
  private def routeAndWrite(step: DataFrame, rules: Seq[DispatchRule],
                            outDir: String): Unit = {
    val withImages = step
      .withColumn("after", struct(col("user_id")))
      .withColumn("before", struct(col("user_id")))
    Routing.dispatch(withImages, rules, numPartitions)
      .drop("after", "before")
      .write.mode("append").parquet(outDir)
  }

  /** Drive to completion with kill-restart; span rules are re-read at
    * every restart (the scheduling fence). */
  private def drive(src: String, ckpt: String, outDir: String, id: String,
                    rulesAt: Int => Seq[DispatchRule],
                    maxAttempts: Int = 10): (Seq[Seq[Long]], Int) = {
    val logs = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    var attempt = 0
    var done = false
    while (!done && attempt < maxAttempts) {
      val rules = rulesAt(attempt)
      attempt += 1
      val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = Changefeed.runWithDdl(spark, cfgBase.copy(id = id), src, ckpt,
        ddls, initialRegistry, payloadCols = Seq("user_id", "value")) { (step, upTo) =>
        routeAndWrite(step, rules, outDir)
        emitted += upTo
      }
      try { q.awaitTermination(180000); done = true }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally { if (q.isActive) q.stop() }
      logs += emitted.toSeq
    }
    assert(done, s"changefeed failed to converge within $maxAttempts attempts")
    (logs.toSeq, attempt)
  }

  private def stateOf(outDir: String) =
    spark.read.option("mergeSchema", "true").parquet(outDir)
      .select(col("_row_id"), col("_schema"), col("_table"), col("_op"),
        col("_commit_ts"), col("user_id"), col("value"),
        col("k"), col("tag"))
      .distinct()

  test("key-sticky split: one handle key occupies exactly one of the span's partitions") {
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val rules = Seq(DispatchRule(Seq("app.events_1"),
      PartitionRule.TableSplit(3, Seq("user_id"))))
    val routed = Routing.dispatch(env, rules, numPartitions)
      .filter(col("_table") === "events_1")
      .withColumn("key", coalesce(col("after.user_id"), col("before.user_id")))
    val perKey = routed.groupBy("key")
      .agg(countDistinct(col("_partition")).as("nparts"))
    assert(perKey.filter(col("nparts") > 1).count() == 0,
      "a handle key straddled split sub-partitions")
    // the split actually fans out over up to 3 adjacent slots
    val used = routed.select(countDistinct(col("_partition"))).head.getLong(0)
    assert(used >= 2 && used <= 3, s"split used $used partitions")
  }

  test("random split/move/merge schedules with mid-stream DDL and kills " +
      "all converge to the golden state (ddl_for_split_tables analog)") {
    val tmp = Files.createTempDirectory("graft-split-ddl").toString
    val src = mkSource(tmp)
    val tables = (0 until 4).map(i => s"events_$i")

    Failpoints.clear()
    val goldenOut = s"$tmp/golden"
    drive(src, s"$tmp/ckpt-golden", goldenOut, "cf-split-golden", _ => Nil)
    val golden = stateOf(goldenOut).collect().toSet
    assert(golden.nonEmpty)

    val rng = new scala.util.Random(0x5711)
    val killSites = Seq(
      "graft/ddl/pre-barrier", "graft/ddl/post-registry",
      "graft/ddl/pre-write", "graft/ddl/post-write", "graft/ddl/post-sink")

    (1 to 8).foreach { i =>
      // per-schedule span-op generator: a fresh random rule set per
      // restart attempt (the "sometimes merging, sometimes splitting"
      // thread; rules fence at restart like a real move's barrier ts)
      def randomRules(): Seq[DispatchRule] =
        tables.flatMap { t =>
          rng.nextInt(4) match {
            case 0 => Some(DispatchRule(Seq(s"app.$t"),
              PartitionRule.TableSplit(2 + rng.nextInt(2), Seq("user_id"))))
            case 1 => Some(DispatchRule(Seq(s"app.$t"),
              PartitionRule.Fixed(rng.nextInt(numPartitions))))
            case 2 => Some(DispatchRule(Seq(s"app.$t"),
              PartitionRule.SplitFixed(Seq(rng.nextInt(numPartitions),
                rng.nextInt(numPartitions)))))
            case _ => None // merged: default table rule
          }
        }
      val ruleEpochs = scala.collection.mutable.Map.empty[Int, Seq[DispatchRule]]
      def rulesAt(attempt: Int): Seq[DispatchRule] =
        ruleEpochs.getOrElseUpdate(attempt, randomRules())

      Failpoints.clear()
      if (rng.nextBoolean()) {
        val (site, k) = (killSites(rng.nextInt(killSites.length)), rng.nextInt(5))
        Failpoints.enable(site, if (k == 0) "1*panic" else s"$k*off->1*panic")
      }

      val outDir = s"$tmp/out-$i"
      val (logs, _) = drive(src, s"$tmp/ckpt-$i", outDir, s"cf-split-$i", rulesAt)
      Failpoints.clear()

      val got = stateOf(outDir).collect().toSet
      assert(got == golden,
        s"schedule $i: downstream diverged under span chaos " +
          s"(missing=${(golden -- got).size}, extra=${(got -- golden).size})")

      // barrier-monotone emit ladder per batch (as in FailoverSpec)
      logs.foreach { ts =>
        val segs = ts.foldLeft(Vector(Vector.empty[Long])) { (acc, t) =>
          val grown = acc.init :+ (acc.last :+ t)
          if (t == Long.MaxValue) grown :+ Vector.empty else grown
        }.filter(_.nonEmpty)
        segs.foreach(s => assert(s == s.sorted, s"non-monotone barrier ladder: $s"))
      }

      // every routed partition must be inside the worker range
      val parts = spark.read.option("mergeSchema", "true").parquet(outDir)
        .select("_partition").distinct().collect().map(_.getLong(0))
      assert(parts.forall(p => p >= 0 && p < numPartitions))
    }
  }

  test("span rules mutating BETWEEN barrier arm and barrier write converge, " +
      "with identical syncpoint windows (in_flight_ddl/syncpoint_during_scheduling)") {
    val tmp = Files.createTempDirectory("graft-inflight-ddl").toString
    val src = mkSource(tmp)
    val tables = (0 until 4).map(i => s"events_$i")

    Failpoints.clear()
    val goldenOut = s"$tmp/golden"
    drive(src, s"$tmp/ckpt-golden", goldenOut, "cf-inflight-golden", _ => Nil)
    val goldenState = stateOf(goldenOut)
    val golden = goldenState.collect().toSet
    val hourNs = 3600L * 1000 * 1000 * 1000
    val goldenSync = graft.operators.TxnOps.syncPoints(goldenState, hourNs)
      .collect().map(_.toString).toSet

    val rng = new scala.util.Random(0xDD1F)
    def randomRules(): Seq[DispatchRule] =
      tables.flatMap { t =>
        rng.nextInt(4) match {
          case 0 => Some(DispatchRule(Seq(s"app.$t"),
            PartitionRule.TableSplit(2 + rng.nextInt(2), Seq("user_id"))))
          case 1 => Some(DispatchRule(Seq(s"app.$t"),
            PartitionRule.Fixed(rng.nextInt(numPartitions))))
          case 2 => Some(DispatchRule(Seq(s"app.$t"),
            PartitionRule.SplitFixed(Seq(rng.nextInt(numPartitions),
              rng.nextInt(numPartitions)))))
          case _ => None
        }
      }

    (1 to 4).foreach { i =>
      Failpoints.clear()
      // half the schedules ALSO kill between arm and write, so the
      // restart replans the barrier while the span rules have moved on
      if (i % 2 == 0)
        Failpoints.enable(
          if (i == 2) "graft/ddl/pre-write" else "graft/ddl/post-write",
          s"${rng.nextInt(3) + 1}*off->1*panic")

      val outDir = s"$tmp/out-$i"
      // the in-flight scheduler: span rules change AFTER EVERY emitted
      // barrier segment — i.e. between a DDL barrier's arm
      // (DdlBarrier.plan) and its remaining writes, and across every
      // syncpoint boundary inside the stream
      @volatile var rules: Seq[DispatchRule] = randomRules()
      val logs = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      var attempt = 0
      var done = false
      while (!done && attempt < 10) {
        attempt += 1
        val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
        val q = Changefeed.runWithDdl(spark, cfgBase.copy(id = s"cf-inflight-$i"),
          src, s"$tmp/ckpt-$i", ddls, initialRegistry,
          payloadCols = Seq("user_id", "value")) { (step, upTo) =>
          routeAndWrite(step, rules, outDir)
          emitted += upTo
          rules = randomRules() // the mid-barrier span op
        }
        try { q.awaitTermination(180000); done = true }
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
        finally { if (q.isActive) q.stop() }
        logs += emitted.toSeq
      }
      Failpoints.clear()
      assert(done, s"schedule $i failed to converge")

      // both DDL barriers actually armed AND wrote under mutation:
      // their exact barrier ts appear as emitted segment bounds
      val bounds = logs.flatten.toSet
      assert(cuts.forall(bounds.contains),
        s"schedule $i: a DDL barrier segment never wrote (bounds=$bounds)")

      val gotState = stateOf(outDir)
      val got = gotState.collect().toSet
      assert(got == golden,
        s"schedule $i diverged under in-flight span mutation " +
          s"(missing=${(golden -- got).size}, extra=${(got -- golden).size})")

      // syncpoint windows are content-identical: a consistency
      // snapshot taken at any sync ts sees the same primary state
      val gotSync = graft.operators.TxnOps.syncPoints(gotState, hourNs)
        .collect().map(_.toString).toSet
      assert(gotSync == goldenSync, s"schedule $i: syncpoint windows diverged")

      // barrier-monotone emit ladder per batch
      logs.foreach { ts =>
        val segs = ts.foldLeft(Vector(Vector.empty[Long])) { (acc, t) =>
          val grown = acc.init :+ (acc.last :+ t)
          if (t == Long.MaxValue) grown :+ Vector.empty else grown
        }.filter(_.nonEmpty)
        segs.foreach(s => assert(s == s.sorted, s"non-monotone barrier ladder: $s"))
      }
    }
  }

  test("moved span pins every row of the table to the target partition") {
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val routed = Routing.dispatch(env,
      Seq(DispatchRule(Seq("app.events_2"), PartitionRule.Fixed(3))), numPartitions)
    val moved = routed.filter(col("_table") === "events_2")
      .select(countDistinct(col("_partition")).as("n"), min(col("_partition")).as("p"))
      .head()
    assert(moved.getLong(0) == 1 && moved.getLong(1) == 3L)
  }
}
