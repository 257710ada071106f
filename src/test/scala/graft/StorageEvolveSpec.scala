package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.model._
import graft.sinks.StorageSink
import graft.streaming.{Changefeed, TxnMatcher}

/** Raw-2PC → cloud-storage evolving composition
  * (Changefeed.runStorageFromRaw2pcEvolving): data files land in the
  * reference layout, every dispatched DDL writes a versioned schema
  * file at its finishedTs, and a consumer reconstructs the post-DDL
  * shape from the layout alone (schema_file.go's SchemaFile contract). */
class StorageEvolveSpec extends SparkFunSuite {

  test("mid-stream ADD COLUMN: rows as-of decode into dated canal files, " +
      "schema files version at each DDL, consumer learns the live shape " +
      "from the layout, checkpoint metadata advances") {
    val tmp = Files.createTempDirectory("graft-storage-evolve").toString
    val srcDir = s"$tmp/src"
    val outDir = s"$tmp/out"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val cfg = ChangefeedConfig(id = "cf-storage-evolve",
      filter = FilterConfig(rules = Seq("app.*")),
      handleKeys = Seq("id"),
      sink = SinkConfig(protocol = Protocol.CanalJson, numPartitions = 2))

    def jobJson(jid: Long, tpe: Int, q: String, ts: Long): Array[Byte] =
      (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":900,""" +
        s""""schema_name":"app","table_name":"t","state":4,""" +
        s""""query":"${q.replace("\"", "\\\"")}",""" +
        s""""binlog":{"SchemaVersion":$ts,"TableInfo":{"id":900}},"version":1}""")
        .getBytes("UTF-8")
    def jobEntry(jid: Long, tpe: Int, q: String, ts: Long): Seq[Row] = {
      val (k, v) = DdlJobParser.encodeJobEntry(jid, jobJson(jid, tpe, q, ts), tpe)
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
      val dst = java.nio.file.Paths.get(srcDir, f"f$fileSeq%03d.parquet")
      Files.move(part.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + fileSeq * 60000L)
    }
    // batch 1: CREATE at ts 10 + a v1-shape row; batch 2: ADD COLUMN
    // at ts 100 + a pre-DDL late row (as-of 90 → v1, no k on the wire)
    // + a post-DDL row carrying k
    writeFile(jobEntry(1L, 3, "CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L) ++
      rowPair(1L, Seq(2L -> 10L), 50L))
    writeFile(jobEntry(2L, 5, "ALTER TABLE app.t ADD COLUMN k BIGINT DEFAULT 7", 100L) ++
      rowPair(5L, Seq(2L -> 50L), 90L) ++
      rowPair(3L, Seq(2L -> 30L, 3L -> 33L), 150L))

    val q = Changefeed.runStorageFromRaw2pcEvolving(spark, cfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      SchemaStore(), outDir, s"$tmp/ckpt", matcherGcMs = 600000L)
    try q.awaitTermination(240000)
    finally { if (q.isActive) q.stop() }
    assert(q.exception.isEmpty, s"feed error: ${q.exception}")

    // schema files: one per DDL, versioned by finishedTs; the CREATE's
    // file has two columns, the ALTER's three (with the default text)
    val meta = new java.io.File(s"$outDir/app/t/meta")
    val names = meta.listFiles().map(_.getName).toSeq
      .sortBy(n => n.split("_")(1).toLong)
    assert(names.size == 2, s"schema files: $names")
    assert(names.head.startsWith("schema_10_") && names.last.startsWith("schema_100_"))
    assert(names.forall(n => StorageSink.isSchemaFile(s"app/t/meta/$n")))
    val v10 = Files.readString(meta.listFiles().filter(_.getName.startsWith("schema_10_")).head.toPath)
    assert(v10.contains(""""TableVersion": 10""") && v10.contains(""""TableColumnsTotal": 2"""))
    assert(v10.contains(""""Query": "CREATE TABLE app.t (id BIGINT, v BIGINT)"""") &&
      v10.contains(""""Type": 3"""))
    assert(v10.contains("""{"ColumnName": "id", "ColumnType": "BIGINT", "ColumnNullable": "false", "ColumnIsPk": "true"}"""))
    val v100 = Files.readString(meta.listFiles().filter(_.getName.startsWith("schema_100_")).head.toPath)
    assert(v100.contains(""""TableColumnsTotal": 3""") &&
      v100.contains("""{"ColumnName": "k", "ColumnType": "BIGINT", "ColumnDefault": "7"}"""))

    // consumer half: the layout alone yields the post-DDL shape
    val latest = StorageSink.latestSchemaFile(outDir, "app", "t")
    assert(latest == Some((100L,
      Seq(("id", "BIGINT"), ("v", "BIGINT"), ("k", "BIGINT")))))

    // data files: dated text files under the table prefix, each line a
    // canal message. Wire semantics follow the mounter-conformance
    // contract (the MQ evolve e2e pins the same): a row SHIPPED before
    // the DDL carries its commit-time shape (no k); a LATE pre-DDL row
    // decoded once the DDL is known default-fills k=7; post-DDL rows
    // carry real values
    val dataFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".txt") || f.getName.startsWith("part-")) Seq(f)
        else Nil
      walk(new java.io.File(s"$outDir/_schema=app"))
    }
    // reference file naming ran per batch: every data file is CDC{idx}.txt
    assert(dataFiles.nonEmpty &&
      dataFiles.forall(_.getName.matches("CDC\\d{6}\\.txt")),
      s"CDC naming applied: ${dataFiles.map(_.getName)}")
    val lines = dataFiles.flatMap(f =>
      scala.io.Source.fromFile(f).getLines().toSeq)
    assert(lines.size == 3, s"data lines: $lines")
    val byId = lines.map { l =>
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(l)
      (n.get("data").get(0).get("id").asText().toLong,
        Option(n.get("data").get(0).get("k")).map(_.asText()))
    }.toMap
    assert(byId.keySet == Set(1L, 5L, 3L), s"rows on the wire: $byId")
    assert(byId(1L).isEmpty, s"pre-DDL-shipped row must not carry k: $byId")
    assert(byId(5L) == Some("7"), s"late pre-DDL row default-fills k=7: $byId")
    assert(byId(3L) == Some("33"), s"post-DDL row carries k: $byId")

    // flush marker advanced to the max commit ts
    assert(StorageSink.readCheckpointMeta(outDir) == Some(150L))
  }

  test("kill-restart across the DDL boundary: schema files stay idempotent " +
      "(content-checksummed names), data replays at-least-once with the " +
      "exact distinct row set, the CDC index only advances") {
    import graft.streaming.Failpoints
    val tmp = Files.createTempDirectory("graft-storage-kill").toString
    val srcDir = s"$tmp/src"
    val outDir = s"$tmp/out"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val cfg = ChangefeedConfig(id = "cf-storage-kill",
      filter = FilterConfig(rules = Seq("app.*")),
      handleKeys = Seq("id"),
      sink = SinkConfig(protocol = Protocol.CanalJson, numPartitions = 2))
    def jobJson(jid: Long, tpe: Int, q: String, ts: Long): Array[Byte] =
      (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":900,""" +
        s""""schema_name":"app","table_name":"t","state":4,""" +
        s""""query":"${q.replace("\"", "\\\"")}",""" +
        s""""binlog":{"SchemaVersion":$ts,"TableInfo":{"id":900}},"version":1}""")
        .getBytes("UTF-8")
    def jobEntry(jid: Long, tpe: Int, q: String, ts: Long): Seq[Row] = {
      val (k, v) = DdlJobParser.encodeJobEntry(jid, jobJson(jid, tpe, q, ts), tpe)
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
      val dst = java.nio.file.Paths.get(srcDir, f"f$fileSeq%03d.parquet")
      Files.move(part.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + fileSeq * 60000L)
    }
    writeFile(jobEntry(1L, 3, "CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L) ++
      rowPair(1L, Seq(2L -> 10L), 50L))
    writeFile(jobEntry(2L, 5, "ALTER TABLE app.t ADD COLUMN k BIGINT DEFAULT 7", 100L) ++
      rowPair(3L, Seq(2L -> 30L, 3L -> 33L), 150L))

    def start() = Changefeed.runStorageFromRaw2pcEvolving(spark, cfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      SchemaStore(), outDir, s"$tmp/ckpt", matcherGcMs = 600000L)

    // kill the SECOND batch (the DDL boundary) at admission, then
    // drain on the same checkpoint
    Failpoints.enable("graft/changefeed/storage-batch", "1*off->1*panic")
    var attempts = 0
    var done = false
    while (!done && attempts < 6) {
      attempts += 1
      val q = start()
      try { q.awaitTermination(240000); done = true }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally { if (q.isActive) q.stop() }
    }
    Failpoints.clear()
    assert(done, "storage feed failed to drain")
    assert(attempts >= 2, "the injected batch kill must force a restart")

    // schema files idempotent: exactly two (CREATE + ALTER), whatever
    // the replay count — the checksummed name rewrites in place
    val metaNames = new java.io.File(s"$outDir/app/t/meta").listFiles()
      .map(_.getName).toSeq.sortBy(_.split("_")(1).toLong)
    assert(metaNames.size == 2, s"schema files: $metaNames")
    assert(StorageSink.latestSchemaFile(outDir, "app", "t")
      .exists(_._2.map(_._1) == Seq("id", "v", "k")))
    // data: at-least-once — the DISTINCT line set equals the workload,
    // every file is CDC-named, the index never reuses a number
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.matches("CDC\\d{6}\\.txt")) Seq(f) else Nil
    val files = walk(new java.io.File(s"$outDir/_schema=app"))
    assert(files.nonEmpty)
    val lines = files.flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
    val ids = lines.map { l =>
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(l)
      (n.get("data").get(0).get("id").asText().toLong,
        Option(n.get("data").get(0).get("k")).map(_.asText()).orNull)
    }
    assert(ids.distinct.toSet == Set((1L, null), (3L, "33")),
      s"distinct replayed rows: ${ids.distinct}")
    assert(StorageSink.readCheckpointMeta(outDir) == Some(150L))
  }

  test("csv storage mode: the same evolving feed writes csv records " +
      "(csv_storage_basic analog) with schema files beside them") {
    val tmp = Files.createTempDirectory("graft-storage-csv").toString
    val srcDir = s"$tmp/src"
    val outDir = s"$tmp/out"
    val cfg = ChangefeedConfig(id = "cf-storage-csv",
      filter = FilterConfig(rules = Seq("app.*")),
      handleKeys = Seq("id"),
      sink = SinkConfig(protocol = Protocol.Csv, numPartitions = 2))
    def jobJson(jid: Long, tpe: Int, q: String, ts: Long): Array[Byte] =
      (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":900,""" +
        s""""schema_name":"app","table_name":"t","state":4,""" +
        s""""query":"${q.replace("\"", "\\\"")}",""" +
        s""""binlog":{"SchemaVersion":$ts,"TableInfo":{"id":900}},"version":1}""")
        .getBytes("UTF-8")
    val (jk, jv) = DdlJobParser.encodeJobEntry(1L,
      jobJson(1L, 3, "CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L), 3)
    def rowPair(id: Long, cells: Seq[(Long, Long)], commitTs: Long): Seq[Row] = {
      val k = TiKvCodec.encodeRecordKey(900L, TiKvCodec.IntHandle(id))
      val v = TiKvCodec.encodeV2(cells.map { case (cid, x) =>
        cid -> Some(TiKvCodec.intCell(x)) })
      Seq(
        Row(k, v, null, "put", "prewrite", commitTs - 1L, 0L, 0L),
        Row(k, null, null, "put", "commit", commitTs - 1L, commitTs, 0L))
    }
    val rows = Seq(Row(jk, jv, null, "put", "committed", 9L, 10L, 0L)) ++
      rowPair(1L, Seq(2L -> 10L), 50L) ++ rowPair(2L, Seq(2L -> 20L), 60L)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), TxnMatcher.uncommittedSchema)
      .write.parquet(srcDir)
    val q = Changefeed.runStorageFromRaw2pcEvolving(spark, cfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema).parquet(srcDir),
      SchemaStore(), outDir, s"$tmp/ckpt", matcherGcMs = 600000L)
    try q.awaitTermination(240000)
    finally { if (q.isActive) q.stop() }
    assert(q.exception.isEmpty, s"feed error: ${q.exception}")
    // schema file written from the CREATE
    assert(StorageSink.latestSchemaFile(outDir, "app", "t") ==
      Some((10L, Seq(("id", "BIGINT"), ("v", "BIGINT")))))
    // data files are csv records in the wire's meta order
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.matches("CDC\\d{6}\\.txt")) Seq(f) else Nil
    val lines = walk(new java.io.File(s"$outDir/_schema=app"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq).sorted
    assert(lines == Seq(
      "\"I\",\"t\",\"app\",50,1,10",
      "\"I\",\"t\",\"app\",60,2,20"), s"csv lines: $lines")
  }
}
