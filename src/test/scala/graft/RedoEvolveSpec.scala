package graft

import java.nio.file.Files
import graft.model._
import graft.streaming.{Changefeed, Failpoints, TxnMatcher}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Redo WAL on the evolving MySQL composition
  * (consistent.level=eventual; reference pkg/redo writer ordering +
  * applier pkg/applier/redo.go:59): rows and emitted DDLs log-ahead
  * of the downstream apply, and after a crash the downstream restores
  * from the redo directory ALONE across a DDL boundary. */
class RedoEvolveSpec extends SparkFunSuite {

  test("kill between the WAL write and the row apply: RedoApplier restores " +
      "a checkpoint-state downstream from the redo dir alone across the DDL " +
      "boundary, and the restored state equals the chaos-free drain") {
    val tmp = Files.createTempDirectory("graft-redo-evolve").toString
    val srcDir = s"$tmp/src"
    val redoDir = s"$tmp/redo"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def jobEntry(jid: Long, tpe: Int, q: String, ts: Long): Seq[Row] = {
      val j = (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":900,""" +
        s""""schema_name":"app","table_name":"t","state":4,""" +
        s""""query":"$q","binlog":{"SchemaVersion":$ts,"TableInfo":{"id":900}},""" +
        s""""version":1}""").getBytes("UTF-8")
      val (k, v) = DdlJobParser.encodeJobEntry(jid, j, tpe)
      Seq(Row(k, v, null, "put", "committed", ts - 1L, ts, 0L))
    }
    def rowPair(id: Long, cells: Seq[(Long, Long)], commitTs: Long): Seq[Row] = {
      val k = TiKvCodec.encodeRecordKey(900L, TiKvCodec.IntHandle(id))
      val v = TiKvCodec.encodeV2(cells.map { case (cid, x) =>
        cid -> Some(TiKvCodec.intCell(x)) })
      Seq(
        Row(k, v, null, "put", "prewrite", commitTs - 1L, 0L, 0L),
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
    // the wire DDL text is backtick-quoted (TiDB's canonical restore
    // form) so the raw replay statement resolves the same lowercase
    // identifiers the live sink created
    writeFile(jobEntry(1L, 3, "CREATE TABLE `app`.`t` (`id` BIGINT, `v` BIGINT)", 10L) ++
      rowPair(1L, Seq(2L -> 10L), 50L) ++ rowPair(2L, Seq(2L -> 20L), 60L))
    writeFile(jobEntry(2L, 5,
      "ALTER TABLE `app`.`t` ADD COLUMN `k` BIGINT DEFAULT 7", 100L) ++
      rowPair(3L, Seq(2L -> 30L, 3L -> 33L), 150L) ++
      rowPair(1L, Seq(2L -> 11L, 3L -> 12L), 160L))

    val applier = graft.sinks.JdbcApplier.inMemory("redo-evolve-live")
    val cfg = ChangefeedConfig(id = "cf-redo-evolve",
      filter = FilterConfig(rules = Seq("app.*")), handleKeys = Seq("id"),
      consistent = ConsistentConfig("eventual", redoDir),
      sink = SinkConfig(numPartitions = 2, safeMode = true))
    def start() = Changefeed.runMysqlFromRaw2pcEvolving(spark, cfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      SchemaStore(), s"$tmp/ckpt", applier, matcherGcMs = 600000L)

    // batch 1 logs+applies clean; batch 2 crashes AFTER its WAL write,
    // BEFORE any row statement reaches the downstream
    Failpoints.enable("graft/changefeed/evolve-mysql-post-redo",
      "1*off->1*panic")
    val q1 = start()
    try q1.awaitTermination(180000)
    catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
    finally { if (q1.isActive) q1.stop() }
    Failpoints.clear()

    // the WAL is ahead of the downstream: resolved covers the crashed
    // batch, the applied-through checkpoint does not
    val (ck, rts) = graft.sinks.RedoApplier.replayWindow(spark, redoDir)
    assert(ck == 60L && rts == 160L, s"replay window ($ck, $rts]")

    // DISASTER RECOVERY from the redo dir ALONE: a fresh downstream
    // restored to the checkpoint state (the reference applier's
    // starting point), then the ordered replay stream — the
    // mid-window ALTER executes between the ≤100 and >100 rows
    val rec = graft.sinks.JdbcApplier.inMemory("redo-evolve-rec")
    rec.createTable("app", "t",
      Seq("id" -> "BIGINT", "v" -> "BIGINT"), Seq("id"))
    rec.execute(Iterator(
      "INSERT INTO `app`.`t` (`id`,`v`) VALUES (1,10)",
      "INSERT INTO `app`.`t` (`id`,`v`) VALUES (2,20)"))
    val stmts = graft.sinks.RedoApplier.replayStatements(
      spark, redoDir, handleKeys = Seq("id"))
    val ordered = stmts
      .orderBy(col("_apply_order"), col("_start_ts"),
        when(col("_op") === "D", 1).when(col("_op") === "U", 2).otherwise(3),
        col("_row_id"))
      .select("_stmt").collect().map(_.getString(0))
    rec.execute(ordered.iterator)
    val expected = Seq(Seq(1L, 11L, 12L), Seq(2L, 20L, 7L), Seq(3L, 30L, 33L))
    assert(rec.tableRows("app", "t", Seq("id", "v", "k")) == expected,
      "redo-only recovery must cross the DDL boundary and converge")

    // chaos-free equivalence: the restarted live feed drains to the
    // same state the redo recovery produced
    var attempts = 0; var done = false
    while (!done && attempts < 5) {
      attempts += 1
      val q = start()
      try { q.awaitTermination(180000); done = true }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally { if (q.isActive) q.stop() }
    }
    assert(done, "live feed failed to drain after the kill")
    assert(applier.tableRows("app", "t", Seq("id", "v", "k")) == expected)
  }

  test("MQ evolving feed under the redo WAL: the kill window replays from " +
      "the redo dir alone onto a checkpoint-state downstream, and the " +
      "restarted feed's wire carries the same rows") {
    val tmp = Files.createTempDirectory("graft-redo-mq").toString
    val srcDir = s"$tmp/src"
    val redoDir = s"$tmp/redo"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def jobEntry(jid: Long, tpe: Int, q: String, ts: Long): Seq[Row] = {
      val j = (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":900,""" +
        s""""schema_name":"app","table_name":"t","state":4,""" +
        s""""query":"$q","binlog":{"SchemaVersion":$ts,"TableInfo":{"id":900}},""" +
        s""""version":1}""").getBytes("UTF-8")
      val (k, v) = DdlJobParser.encodeJobEntry(jid, j, tpe)
      Seq(Row(k, v, null, "put", "committed", ts - 1L, ts, 0L))
    }
    def rowPair(id: Long, cells: Seq[(Long, Long)], commitTs: Long): Seq[Row] = {
      val k = TiKvCodec.encodeRecordKey(900L, TiKvCodec.IntHandle(id))
      val v = TiKvCodec.encodeV2(cells.map { case (cid, x) =>
        cid -> Some(TiKvCodec.intCell(x)) })
      Seq(
        Row(k, v, null, "put", "prewrite", commitTs - 1L, 0L, 0L),
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
    writeFile(jobEntry(1L, 3, "CREATE TABLE `app`.`t` (`id` BIGINT, `v` BIGINT)", 10L) ++
      rowPair(1L, Seq(2L -> 10L), 50L) ++ rowPair(2L, Seq(2L -> 20L), 60L))
    writeFile(jobEntry(2L, 5,
      "ALTER TABLE `app`.`t` ADD COLUMN `k` BIGINT DEFAULT 7", 100L) ++
      rowPair(3L, Seq(2L -> 30L, 3L -> 33L), 150L))

    val cfg = ChangefeedConfig(id = "cf-redo-mq",
      filter = FilterConfig(rules = Seq("app.*")), handleKeys = Seq("id"),
      consistent = ConsistentConfig("eventual", redoDir),
      sink = SinkConfig(protocol = Protocol.CanalJson, numPartitions = 2))
    def start() = Changefeed.runMqFromRaw2pcEvolving(spark, cfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      SchemaStore(), s"$tmp/sink", s"$tmp/ckpt", matcherGcMs = 600000L)

    Failpoints.enable("graft/changefeed/evolve-mq-post-redo",
      "1*off->1*panic")
    val q1 = start()
    try q1.awaitTermination(180000)
    catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
    finally { if (q1.isActive) q1.stop() }
    Failpoints.clear()

    // the WAL is ahead of the wire: batch 2's rows (and the ALTER) are
    // logged but never sank
    val (ck, rts) = graft.sinks.RedoApplier.replayWindow(spark, redoDir)
    assert(ck == 60L && rts == 150L, s"replay window ($ck, $rts]")
    assert(spark.read.parquet(s"$tmp/sink")
      .filter(col("_kind") === "row" && col("_value").contains("\"k\":33"))
      .count() == 0, "the killed batch's rows must not be on the wire")

    // disaster recovery targets the DOWNSTREAM (the reference's redo
    // applier replays into the sink-uri database whatever the feed's
    // own sink was): checkpoint-state Derby + the window's statements
    val rec = graft.sinks.JdbcApplier.inMemory("redo-mq-rec")
    rec.createTable("app", "t",
      Seq("id" -> "BIGINT", "v" -> "BIGINT"), Seq("id"))
    rec.execute(Iterator(
      "INSERT INTO `app`.`t` (`id`,`v`) VALUES (1,10)",
      "INSERT INTO `app`.`t` (`id`,`v`) VALUES (2,20)"))
    val stmts = graft.sinks.RedoApplier.replayStatements(
      spark, redoDir, handleKeys = Seq("id"))
    val ordered = stmts
      .orderBy(col("_apply_order"), col("_start_ts"),
        when(col("_op") === "D", 1).when(col("_op") === "U", 2).otherwise(3),
        col("_row_id"))
      .select("_stmt").collect().map(_.getString(0))
    rec.execute(ordered.iterator)
    assert(rec.tableRows("app", "t", Seq("id", "v", "k")) ==
      Seq(Seq(1L, 10L, 7L), Seq(2L, 20L, 7L), Seq(3L, 30L, 33L)),
      "redo-only recovery crosses the DDL boundary")

    // the restarted feed drains and the wire now carries the row the
    // WAL was ahead on
    var attempts = 0; var done = false
    while (!done && attempts < 5) {
      attempts += 1
      val q = start()
      try { q.awaitTermination(180000); done = true }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally { if (q.isActive) q.stop() }
    }
    assert(done, "MQ feed failed to drain after the kill")
    assert(spark.read.parquet(s"$tmp/sink")
      .filter(col("_kind") === "row" && col("_value").contains("\"k\":33"))
      .count() >= 1)
  }

  test("STORAGE evolving feed under the redo WAL " +
      "(consistent_replicate_storage_file): rows and DDLs log-ahead of the " +
      "data/schema files, the kill window replays from the redo dir alone " +
      "across the ALTER boundary, and the restarted feed's layout converges") {
    val tmp = Files.createTempDirectory("graft-redo-storage").toString
    val srcDir = s"$tmp/src"
    val redoDir = s"$tmp/redo"
    val baseDir = s"$tmp/store"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def jobEntry(jid: Long, tpe: Int, q: String, ts: Long): Seq[Row] = {
      val j = (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":900,""" +
        s""""schema_name":"app","table_name":"t","state":4,""" +
        s""""query":"$q","binlog":{"SchemaVersion":$ts,"TableInfo":{"id":900}},""" +
        s""""version":1}""").getBytes("UTF-8")
      val (k, v) = DdlJobParser.encodeJobEntry(jid, j, tpe)
      Seq(Row(k, v, null, "put", "committed", ts - 1L, ts, 0L))
    }
    def rowPair(id: Long, cells: Seq[(Long, Long)], commitTs: Long): Seq[Row] = {
      val k = TiKvCodec.encodeRecordKey(900L, TiKvCodec.IntHandle(id))
      val v = TiKvCodec.encodeV2(cells.map { case (cid, x) =>
        cid -> Some(TiKvCodec.intCell(x)) })
      Seq(
        Row(k, v, null, "put", "prewrite", commitTs - 1L, 0L, 0L),
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
    writeFile(jobEntry(1L, 3, "CREATE TABLE `app`.`t` (`id` BIGINT, `v` BIGINT)", 10L) ++
      rowPair(1L, Seq(2L -> 10L), 50L) ++ rowPair(2L, Seq(2L -> 20L), 60L))
    writeFile(jobEntry(2L, 5,
      "ALTER TABLE `app`.`t` ADD COLUMN `k` BIGINT DEFAULT 7", 100L) ++
      rowPair(3L, Seq(2L -> 30L, 3L -> 33L), 150L))

    val cfg = ChangefeedConfig(id = "cf-redo-storage",
      filter = FilterConfig(rules = Seq("app.*")), handleKeys = Seq("id"),
      consistent = ConsistentConfig("eventual", redoDir),
      sink = SinkConfig(protocol = Protocol.CanalJson, numPartitions = 2))
    def start() = Changefeed.runStorageFromRaw2pcEvolving(spark, cfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      SchemaStore(), baseDir, s"$tmp/ckpt", matcherGcMs = 600000L)

    // batch 1 logs + writes files clean; batch 2 crashes AFTER its WAL
    // write, BEFORE any data file lands
    Failpoints.enable("graft/changefeed/storage-post-redo", "1*off->1*panic")
    val q1 = start()
    try q1.awaitTermination(180000)
    catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
    finally { if (q1.isActive) q1.stop() }
    Failpoints.clear()

    // WAL ahead of the layout: the window covers the crashed batch and
    // its row never reached a data file
    val (ck, rts) = graft.sinks.RedoApplier.replayWindow(spark, redoDir)
    assert(ck == 60L && rts == 150L, s"replay window ($ck, $rts]")
    val layout1 = spark.read.option("recursiveFileLookup", "true").text(baseDir)
    assert(layout1.filter(col("value").contains("\"k\":33")).count() == 0,
      "the killed batch's row must not be in any data file")

    // disaster recovery from the redo dir ALONE onto a checkpoint-state
    // downstream, crossing the ALTER boundary (the WAL's DDL log
    // carries the statement; rows ≤ ckpt pre-exist)
    val rec = graft.sinks.JdbcApplier.inMemory("redo-storage-rec")
    rec.createTable("app", "t",
      Seq("id" -> "BIGINT", "v" -> "BIGINT"), Seq("id"))
    rec.execute(Iterator(
      "INSERT INTO `app`.`t` (`id`,`v`) VALUES (1,10)",
      "INSERT INTO `app`.`t` (`id`,`v`) VALUES (2,20)"))
    val stmts = graft.sinks.RedoApplier.replayStatements(
      spark, redoDir, handleKeys = Seq("id"))
    val ordered = stmts
      .orderBy(col("_apply_order"), col("_start_ts"),
        when(col("_op") === "D", 1).when(col("_op") === "U", 2).otherwise(3),
        col("_row_id"))
      .select("_stmt").collect().map(_.getString(0))
    rec.execute(ordered.iterator)
    assert(rec.tableRows("app", "t", Seq("id", "v", "k")) ==
      Seq(Seq(1L, 10L, 7L), Seq(2L, 20L, 7L), Seq(3L, 30L, 33L)),
      "redo-only recovery crosses the DDL boundary")

    // the restarted feed drains; the layout now carries the row and the
    // per-dir CDC index stays MONOTONE under the replay (idempotent
    // rename pass, generator.go:350-420)
    var attempts = 0; var done = false
    while (!done && attempts < 5) {
      attempts += 1
      val q = start()
      try { q.awaitTermination(180000); done = true }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally { if (q.isActive) q.stop() }
    }
    assert(done, "storage feed failed to drain after the kill")
    val layout2 = spark.read.option("recursiveFileLookup", "true").text(baseDir)
    assert(layout2.filter(col("value").contains("\"k\":33")).count() >= 1,
      "the replayed batch's row reaches the layout")
    def cdcFiles(dir: java.io.File): Seq[java.io.File] = {
      val cs = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
      cs.filter(_.isDirectory).toSeq.flatMap(cdcFiles) ++
        cs.filter(f => f.isFile && f.getName.matches("CDC\\d+\\.txt")).toSeq
    }
    val byDir = cdcFiles(new java.io.File(baseDir)).groupBy(_.getParent)
    assert(byDir.nonEmpty, "committed files renamed to the CDC{idx} form")
    byDir.foreach { case (dir, fs) =>
      val idxs = fs.map(_.getName.stripPrefix("CDC").stripSuffix(".txt").toLong)
        .sorted
      assert(idxs == (1L to idxs.size.toLong),
        s"per-dir CDC index must stay contiguous/monotone under replay: " +
          s"$dir -> $idxs")
    }
  }
}
