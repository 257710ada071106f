package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The custom DSv2 source must drain exactly `totalRows` deterministic
  * rows, honor partitioning, and replay exactly-once from offsets. */
class ChangelogGenSourceSpec extends SparkFunSuite {

  private def readGen(total: Long, tables: Int = 8) =
    spark.readStream
      .format("graft.sources.ChangelogGenSource")
      .option("tables", tables)
      .option("totalRows", total)
      .option("rowsPerBatch", 1000)
      .option("numPartitions", 4)
      .load()

  test("custom source feeds the full changefeed pipeline to an encoded sink") {
    import graft.model._
    import graft.streaming.Changefeed
    val tmp = Files.createTempDirectory("graft-genpipe").toString
    val cfg = ChangefeedConfig(id = "cf-gen",
      sink = SinkConfig(protocol = Protocol.CanalJson, numPartitions = 4,
        dispatch = Seq(DispatchRule(
          partition = PartitionRule.KeyColumns(Seq("user_id")),
          topic = Some("gen_{schema}_{table}")))),
      splitUpdateOnKeyChange = false)
    val q = Changefeed.pipeline(spark, cfg)(Envelope.fromFlat(readGen(4000)))
      .writeStream.format("parquet").option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() == 4000)
    assert(out.select("_topic").head().getString(0).startsWith("gen_app_"))
    assert(out.select("_value").head().getString(0).startsWith("{\"id\":0"))
    val parts = out.select("_partition").distinct().count()
    assert(parts > 1 && parts <= 4)
  }

  test("drains exactly totalRows with deterministic content") {
    val tmp = Files.createTempDirectory("graft-gen").toString
    val q = readGen(5000).writeStream
      .format("parquet").option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() == 5000)
    assert(out.select("_row_id").distinct().count() == 5000)
    // rowsPerBatch=1000 over 5000 rows => multiple micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
      "scan-window batch sizing produces multiple micro-batches")
    // all 8 tables represented; ops are I/U/D
    assert(out.select("_table").distinct().count() == 8)
    assert(out.select("_op").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("I", "U", "D")))
    // deterministic: same row ids give same payloads on a second run
    val tmp2 = Files.createTempDirectory("graft-gen2").toString
    val q2 = readGen(5000).writeStream
      .format("parquet").option("path", s"$tmp2/out")
      .option("checkpointLocation", s"$tmp2/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val again = spark.read.parquet(s"$tmp2/out")
    assert(again.exceptAll(out).count() == 0 && out.exceptAll(again).count() == 0)
  }

  test("perf-rig shape: 1000 tables x 40 events through the pipeline") {
    // the reference's downstream_performance_test.go:33-37 rig
    val tmp = Files.createTempDirectory("graft-rig").toString
    val q = spark.readStream
      .format("graft.sources.ChangelogGenSource")
      .option("tables", 1000)
      .option("totalRows", 40000)
      .option("rowsPerBatch", 40000)
      .option("numPartitions", 8)
      .load()
      .groupBy("_table").agg(count(lit(1)).as("n"), max("_commit_ts").as("resolved"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("rig")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rig = spark.table("rig")
    assert(rig.count() == 1000)
    assert(rig.agg(sum("n")).head().getLong(0) == 40000)
  }

  private def rawKvMeta(tbl: Int) = {
    import graft.operators.RawKvMounter.{KvColumn, KvTableMeta}
    KvTableMeta(graft.sources.ChangelogGen.tableIdOf(tbl.toLong), "app", s"t_$tbl",
      Seq(
        KvColumn(1L, "user_id", "bigint", nullable = false),
        KvColumn(2L, "value", "double"),
        KvColumn(3L, "k", "bigint")),
      handleCol = "user_id")
  }

  test("rawKv mode: the source emits real TiKV bytes and the mounted stream " +
      "reproduces the typed stream exactly") {
    import graft.operators.RawKvMounter
    val tmp = Files.createTempDirectory("graft-rawgen").toString
    def read(raw: Boolean) = spark.readStream
      .format("graft.sources.ChangelogGenSource")
      .option("tables", 1).option("totalRows", 5000)
      .option("rowsPerBatch", 2500).option("numPartitions", 4)
      .option("rawKv", raw).load()

    val q = RawKvMounter.mountTable(read(raw = true), rawKvMeta(0))
      .writeStream.format("parquet").option("path", s"$tmp/mounted")
      .option("checkpointLocation", s"$tmp/ckpt-m")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val q2 = read(raw = false)
      .writeStream.format("parquet").option("path", s"$tmp/typed")
      .option("checkpointLocation", s"$tmp/ckpt-t")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(180000)

    val mounted = spark.read.parquet(s"$tmp/mounted")
      .select(col("_op"), col("_commit_ts"), col("_start_ts"),
        coalesce(col("after.user_id"), col("before.user_id")).as("user_id"),
        coalesce(col("after.value"), col("before.value")).as("value"),
        coalesce(col("after.k"), col("before.k")).as("k"),
        col("before.value").as("pre_value"))
    val typed = spark.read.parquet(s"$tmp/typed")
      .select(col("_op"), col("_commit_ts"), col("_start_ts"),
        col("user_id"), col("value"), col("k"),
        when(col("_op") === "U", col("value") - 1.0)
          .when(col("_op") === "D", col("value")).as("pre_value"))
    assert(mounted.count() == 5000)
    assert(mounted.exceptAll(typed).count() == 0 &&
      typed.exceptAll(mounted).count() == 0,
      "byte-mounted stream must equal the typed stream")
  }

  test("rawKv throughput rig: 1M raw entries mount in bounded wall time") {
    import graft.operators.RawKvMounter
    val tmp = Files.createTempDirectory("graft-rawrig").toString
    val t0 = System.nanoTime()
    val q = RawKvMounter.mountTable(
      spark.readStream.format("graft.sources.ChangelogGenSource")
        .option("tables", 1).option("totalRows", 1000000)
        .option("rowsPerBatch", 1000000).option("numPartitions", 8)
        .option("rawKv", true).load(),
      rawKvMeta(0))
      .groupBy("_op").count()
      .writeStream.outputMode("complete").format("memory").queryName("rawrig")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val secs = (System.nanoTime() - t0) / 1e9
    val n = spark.table("rawrig").agg(sum("count")).head().getLong(0)
    assert(n == 1000000L)
    // generate + encode + decode 1M rows: catch order-of-magnitude
    // regressions without a flaky tight bound
    assert(secs < 120.0, f"raw mount rig took $secs%.1f s")
    info(f"raw-kv mount rig: 1M rows in $secs%.2f s (${1000000 / secs}%.0f rows/s)")
  }

  test("fused mount->encode rig: 1M raw entries render to wire strings " +
      "in bounded wall time (the hetero steady-state's per-entry path)") {
    import graft.operators.RawKvMounter
    val meta = rawKvMeta(0)
    val plan = Map(meta.tableId -> Seq(0L -> Option(meta)))
    val t0 = System.nanoTime()
    val q = RawKvMounter.mountTablesEncodeCanal(
      spark.readStream.format("graft.sources.ChangelogGenSource")
        .option("tables", 1).option("totalRows", 1000000)
        .option("rowsPerBatch", 1000000).option("numPartitions", 8)
        .option("rawKv", true).load(),
      plan)
      .agg(count(lit(1)).as("n"), sum(length(col("_value"))).as("bytes"))
      .writeStream.outputMode("complete").format("memory").queryName("fusedrig")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val secs = (System.nanoTime() - t0) / 1e9
    val row = spark.table("fusedrig").head()
    assert(row.getLong(0) == 1000000L)
    assert(row.getLong(1) > 100000000L, "wire strings actually rendered")
    assert(secs < 120.0, f"fused encode rig took $secs%.1f s")
    info(f"fused mount->encode rig: 1M rows in $secs%.2f s " +
      f"(${1000000 / secs}%.0f rows/s)")
  }
}
