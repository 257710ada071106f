package graft

import java.nio.file.Files
import graft.model._
import graft.streaming.{Changefeed, Failpoints, TxnMatcher}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Sync-point bookkeeping WIRED into the MySQL evolving composition
  * (mysql_writer_for_syncpoint.go; interval math
  * downstreamadapter/syncpoint/sync_point.go:28): the batch splits at
  * every crossed interval boundary, the `tidb_cdc.syncpoint_v1` map
  * row writes when the downstream state IS the snapshot at the
  * boundary, and replay writes no duplicates (INSERT IGNORE on the
  * (cluster, changefeed, primary_ts) pk). */
class SyncpointWireSpec extends SparkFunSuite {

  test("syncpoint rows land in Derby at crossed boundaries, the downstream " +
      "state at the write instant equals the upstream snapshot at the " +
      "boundary, and kill-replay writes no duplicate map rows") {
    val tmp = Files.createTempDirectory("graft-syncpoint").toString
    val srcDir = s"$tmp/src"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def jobEntry(jid: Long, tpe: Int, q: String, ts: Long): Seq[Row] = {
      val j = (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":900,""" +
        s""""schema_name":"app","table_name":"t","state":4,""" +
        s""""query":"$q","binlog":{"SchemaVersion":$ts,"TableInfo":{"id":900}},""" +
        s""""version":1}""").getBytes("UTF-8")
      val (k, v) = DdlJobParser.encodeJobEntry(jid, j, tpe)
      Seq(Row(k, v, null, "put", "committed", ts - 1L, ts, 0L))
    }
    def rowPair(id: Long, v: Long, commitTs: Long): Seq[Row] = {
      val k = TiKvCodec.encodeRecordKey(900L, TiKvCodec.IntHandle(id))
      val img = TiKvCodec.encodeV2(Seq(2L -> Some(TiKvCodec.intCell(v))))
      Seq(
        Row(k, img, null, "put", "prewrite", commitTs - 1L, 0L, 0L),
        Row(k, null, null, "put", "commit", commitTs - 1L, commitTs, 0L))
    }
    var fileSeq = 0
    def writeFile(rows: Seq[Row]): Unit = {
      fileSeq += 1
      val stage = s"$tmp/stage-$fileSeq"
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), TxnMatcher.uncommittedSchema)
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(srcDir, f"f$fileSeq%03d.parquet"))
    }
    // batch 1 stays inside window [0, 200): no boundary crossed
    writeFile(jobEntry(1L, 3, "CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L) ++
      rowPair(1L, 10L, 50L) ++ rowPair(2L, 20L, 60L))
    // batch 2 crosses boundary 200: the @150 row applies BEFORE the
    // map row, the @260 update only after
    writeFile(rowPair(3L, 30L, 150L) ++ rowPair(1L, 11L, 260L))
    // batch 3 crosses boundary 400
    writeFile(rowPair(2L, 21L, 460L))

    val applier = graft.sinks.JdbcApplier.inMemory("syncpoint-wire")
    val cfg = ChangefeedConfig(id = "cf-syncpoint",
      filter = FilterConfig(rules = Seq("app.*")), handleKeys = Seq("id"),
      syncPointIntervalNs = Some(200L),
      sink = SinkConfig(numPartitions = 2, safeMode = true))
    def start() = Changefeed.runMysqlFromRaw2pcEvolving(spark, cfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      SchemaStore(), s"$tmp/ckpt", applier, matcherGcMs = 600000L)

    // kill at the FIRST boundary, right after its map row committed:
    // the downstream at this instant is exactly snapshotAt(200)
    Failpoints.enable("graft/changefeed/evolve-mysql-post-syncpoint",
      "1*panic->off")
    val q1 = start()
    try q1.awaitTermination(180000)
    catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
    finally { if (q1.isActive) q1.stop() }
    assert(applier.tableRows("app", "t", Seq("id", "v")) ==
      Seq(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, 30L)),
      "at the syncpoint write instant the downstream equals the " +
        "upstream snapshot at 200 (the @260 update must NOT be in)")
    assert(applier.tableRows("tidb_cdc", "syncpoint_v1",
      Seq("changefeed", "primary_ts", "secondary_ts")) ==
      Seq(Seq("cf-syncpoint", 200L, 200L)))

    Failpoints.clear()
    var attempts = 0; var done = false
    while (!done && attempts < 5) {
      attempts += 1
      val q = start()
      try { q.awaitTermination(180000); done = true }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally { if (q.isActive) q.stop() }
    }
    assert(done, "syncpoint feed failed to drain after the kill")

    // final state converged; the replayed boundary wrote NO duplicate,
    // and the later boundary followed — monotone (primary, secondary)
    assert(applier.tableRows("app", "t", Seq("id", "v")) ==
      Seq(Seq(1L, 11L), Seq(2L, 21L), Seq(3L, 30L)))
    assert(applier.tableRows("tidb_cdc", "syncpoint_v1",
      Seq("changefeed", "primary_ts", "secondary_ts")) ==
      Seq(Seq("cf-syncpoint", 200L, 200L), Seq("cf-syncpoint", 400L, 400L)))
  }

  test("syncpoint rows on the PLAIN runMysql composition (envelope source): " +
      "the reference writes the map row for EVERY MySQL-class changefeed, " +
      "boundaries split the batch, kill-replay writes no duplicates") {
    val tmp = Files.createTempDirectory("graft-syncpoint-plain").toString
    val srcDir = s"$tmp/src"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    var fileSeq = 0
    // (event_id, ts_us, user_id, value, k) — commit ts lands at
    // ts_us*1000 ns; all signups → I rows on app.events_<uid%4>
    def writeEvents(rows: Seq[(Long, Long, Long, Double, Long)]): Unit = {
      fileSeq += 1
      import spark.implicits._
      val df = rows.toDF("event_id", "ts_us", "user_id", "value", "k")
        .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
          col("user_id"), lit("signup").as("event_type"), col("value"),
          concat(lit("{\"k\":"), col("k"), lit("}")).as("props"))
      val stage = s"$tmp/stage-$fileSeq"
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(srcDir, f"f$fileSeq%03d.parquet"))
    }
    // interval 200_000 ns; batch 1 inside window, batch 2 crosses
    // boundary 200_000 (row @150k before, @260k after), batch 3
    // crosses 400_000
    writeEvents(Seq((1L, 50L, 1L, 10.0, 100L), (2L, 60L, 2L, 20.0, 200L)))
    writeEvents(Seq((3L, 150L, 3L, 30.0, 300L), (4L, 260L, 1L, 11.0, 101L)))
    writeEvents(Seq((5L, 460L, 2L, 21.0, 201L)))

    val applier = graft.sinks.JdbcApplier.inMemory("syncpoint-plain")
    applier.ensureMetaTables()
    Seq("events_1", "events_2", "events_3").foreach(t =>
      applier.createTable("app", t,
        Seq("user_id" -> "BIGINT", "value" -> "DOUBLE", "k" -> "BIGINT"),
        Seq("user_id")))
    val cfg = ChangefeedConfig(id = "cf-syncpoint-plain",
      syncPointIntervalNs = Some(200000L),
      maxFilesPerTrigger = Some(1),
      sink = SinkConfig(numPartitions = 2, safeMode = true))
    def start() = Changefeed.runMysql(spark, cfg, srcDir, s"$tmp/ckpt")(
      graft.sinks.JdbcApplier.executeFor(applier.url))

    // kill right after the FIRST boundary's map row: the downstream at
    // this instant equals the upstream snapshot at 200_000 — the @260k
    // update to user 1 must NOT be in yet
    Failpoints.enable("graft/changefeed/mysql-post-syncpoint", "1*panic->off")
    val q1 = start()
    try q1.awaitTermination(180000)
    catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
    finally { if (q1.isActive) q1.stop() }
    assert(applier.tableRows("app", "events_1", Seq("user_id", "value")) ==
      Seq(Seq(1L, 10.0)),
      "at the map-row instant the downstream is snapshotAt(200000)")
    assert(applier.tableRows("tidb_cdc", "syncpoint_v1",
      Seq("changefeed", "primary_ts", "secondary_ts")) ==
      Seq(Seq("cf-syncpoint-plain", 200000L, 200000L)))

    Failpoints.clear()
    var attempts = 0; var done = false
    while (!done && attempts < 5) {
      attempts += 1
      val q = start()
      try { q.awaitTermination(180000); done = true }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally { if (q.isActive) q.stop() }
    }
    assert(done, "plain syncpoint feed failed to drain after the kill")
    assert(applier.tableRows("app", "events_1", Seq("user_id", "value")) ==
      Seq(Seq(1L, 11.0)))
    assert(applier.tableRows("app", "events_2", Seq("user_id", "value")) ==
      Seq(Seq(2L, 21.0)))
    assert(applier.tableRows("tidb_cdc", "syncpoint_v1",
      Seq("changefeed", "primary_ts", "secondary_ts")) ==
      Seq(Seq("cf-syncpoint-plain", 200000L, 200000L),
        Seq("cf-syncpoint-plain", 400000L, 400000L)),
      "kill-replay writes no duplicate map rows; later boundary follows")
  }
}
