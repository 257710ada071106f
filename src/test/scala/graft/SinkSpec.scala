package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.model.Envelope
import graft.operators.Routing
import graft.functions.{Codecs, LargeMessage}
import graft.sinks.{KafkaSink, StorageSink}
import graft.streaming.ResolvedTs

class SinkSpec extends SparkFunSuite {

  private lazy val env =
    Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))

  test("storage sink lays out schema/table/date prefixes") {
    val tmp = Files.createTempDirectory("graft-storage").toString
    val encoded = Codecs.canalJson(env)
    StorageSink.write(encoded, tmp, "text")
    val tableDirs = new java.io.File(s"$tmp/_schema=app").list()
    assert(tableDirs != null && tableDirs.count(_.startsWith("_table=events_")) == 4)
    val dates = new java.io.File(s"$tmp/_schema=app/_table=events_0").list()
    assert(dates.exists(_.startsWith("_date=2024-")))
    // messages readable back with partition columns recovered
    val back = spark.read.text(tmp)
    assert(back.count() == env.count())
    StorageSink.writeSchemaMeta(spark, encoded, tmp)
    // versioned schema file: <schema>/<table>/meta/schema_{v}_{crc:%010d}.json
    val metaFiles = new java.io.File(s"$tmp/app/events_0/meta").list()
    assert(metaFiles != null && metaFiles.length == 1, String.valueOf(metaFiles))
    assert(metaFiles.head.matches("schema_100_\\d{10}\\.json"), metaFiles.head)
    assert(StorageSink.isSchemaFile(s"app/events_0/meta/${metaFiles.head}"))
    assert(!StorageSink.isSchemaFile("app/events_0/meta/schema.json"))
    // a different schema version writes a NEW file (history survives)
    StorageSink.writeSchemaMeta(spark, encoded, tmp, tableVersion = 101L)
    assert(new java.io.File(s"$tmp/app/events_0/meta").list().length == 2)
  }

  test("partition-table layout: _partition_num rides between table and date " +
      "(canal_json_storage_partition_table analog)") {
    val tmp = Files.createTempDirectory("graft-storage-pt").toString
    // a partitioned table's rows carry the physical partition's table
    // ID (generator.go:434-444); model 3 physical partitions by key
    val encoded = Codecs.canalJson(env)
      .withColumn("_partition_num",
        lit(7000L) + pmod(coalesce(col("after.user_id"), col("before.user_id")), lit(3L)))
    StorageSink.write(encoded, tmp, "text")
    // layout: <schema>/<table>/<partitionNum>/<date>/... (path_key.go:198-216)
    val partDirs = new java.io.File(s"$tmp/_schema=app/_table=events_0").list()
    assert(partDirs != null && partDirs.count(_.startsWith("_partition_num=7")) == 3,
      String.valueOf(partDirs))
    val dates = new java.io.File(
      s"$tmp/_schema=app/_table=events_0/_partition_num=7000").list()
    assert(dates != null && dates.exists(_.startsWith("_date=")), String.valueOf(dates))
    // cdc naming applies per physical-partition dir
    StorageSink.applyCdcNaming(tmp, "json")
    val dateDir = new java.io.File(
      s"$tmp/_schema=app/_table=events_0/_partition_num=7000")
      .listFiles().find(_.isDirectory).get
    assert(dateDir.listFiles().map(_.getName).exists(_.matches("CDC\\d{6}\\.json")))
    // the storage consumer reads every message back with the partition
    // level recovered as a column (data files only — CDC.index files
    // are bookkeeping, not messages)
    val typed = spark.read.format("text")
      .option("pathGlobFilter", "CDC*.json").load(tmp)
      .withColumn("_p", regexp_extract(input_file_name(), "_partition_num=(\\d+)", 1))
    assert(typed.filter(col("_p").isin("7000", "7001", "7002")).count() == env.count())
    // a frame WITHOUT the column keeps the flat layout (PartitionNum=0
    // is omitted from the path, path_key.go:209-211)
    val tmp2 = Files.createTempDirectory("graft-storage-flat").toString
    StorageSink.write(Codecs.canalJson(env), tmp2, "text")
    val flat = new java.io.File(s"$tmp2/_schema=app/_table=events_0").list()
    assert(flat.forall(_.startsWith("_date=")))
  }

  test("cdc file naming: part files become CDC{idx}.{ext}, index advances across writes") {
    val tmp = Files.createTempDirectory("graft-cdcname").toString
    StorageSink.write(Codecs.canalJson(env), tmp, "text")
    StorageSink.applyCdcNaming(tmp, "json")
    val dir = new java.io.File(s"$tmp/_schema=app/_table=events_0")
      .listFiles().find(_.isDirectory).get
    val names = dir.listFiles().map(_.getName).sorted.toSeq
    assert(names.exists(_.matches("CDC\\d{6}\\.json")), names.mkString(","))
    assert(!names.exists(_.startsWith("part-")), "no raw part files remain")
    val hw1 = java.nio.file.Files.readString(dir.toPath.resolve("CDC.index")).toLong
    // a second write continues the index instead of clobbering
    StorageSink.write(Codecs.canalJson(env), tmp, "text")
    StorageSink.applyCdcNaming(tmp, "json")
    val hw2 = java.nio.file.Files.readString(dir.toPath.resolve("CDC.index")).toLong
    assert(hw2 > hw1, s"index must advance ($hw1 -> $hw2)")
    // messages still all readable
    val n = spark.read.text(s"$tmp/_schema=app/_table=events_0/*/CDC*.json").count()
    assert(n > 0)
  }

  test("storage retention: expired date partitions drop, checkpoint meta persists") {
    val tmp = Files.createTempDirectory("graft-cleanup").toString
    StorageSink.write(Codecs.canalJson(env), tmp, "text")
    StorageSink.writeCheckpointMeta(tmp, 1700000000000000000L)
    assert(StorageSink.readCheckpointMeta(tmp).contains(1700000000000000000L))
    // fixture dates are 2024-xx; "today" far in the future with a
    // short retention expires them all
    val removed = StorageSink.cleanupExpired(tmp, keepDays = 30,
      today = java.time.LocalDate.parse("2030-01-01"))
    assert(removed.nonEmpty && removed.forall(_.contains("_date=")))
    val left = new java.io.File(s"$tmp/_schema=app/_table=events_0").list()
    assert(left == null || !left.exists(_.startsWith("_date=")))
    // retention window keeps fresh partitions
    val tmp2 = Files.createTempDirectory("graft-cleanup2").toString
    StorageSink.write(Codecs.canalJson(env), tmp2, "text")
    val kept = StorageSink.cleanupExpired(tmp2, keepDays = 36500,
      today = java.time.LocalDate.parse("2030-01-01"))
    assert(kept.isEmpty)
  }

  test("cloud-storage-config knobs (sink.go:730-747): file-size drives the " +
      "per-file roll, flush-interval parses with the reference clamps, " +
      "retention gates on file-expiration-days") {
    import graft.model.CloudStorageSinkConfig
    // flush-interval: parse + [100ms, 10m] clamp (cloudstorage/config.go:41-43)
    assert(CloudStorageSinkConfig(flushInterval = "2s").flushIntervalMs == 2000L)
    assert(CloudStorageSinkConfig(flushInterval = "500ms").flushIntervalMs == 500L)
    assert(CloudStorageSinkConfig(flushInterval = "1ms").flushIntervalMs == 100L)
    assert(CloudStorageSinkConfig(flushInterval = "99m").flushIntervalMs == 600000L)
    intercept[IllegalArgumentException](
      CloudStorageSinkConfig(flushInterval = "soon").flushIntervalMs)
    // file-size: [1KiB, 512MiB] clamp (config.go:55-57)
    assert(CloudStorageSinkConfig(fileSize = 1).adjustedFileSize == 1024)
    assert(CloudStorageSinkConfig(fileSize = Int.MaxValue).adjustedFileSize ==
      512 * 1024 * 1024)
    assert(CloudStorageSinkConfig().isDefault &&
      CloudStorageSinkConfig().fileExpirationDays == 0,
      "cleanup disabled by default (config.go:60)")
    // the roll knob visibly splits data files: a 2-record cap over a
    // many-row table yields multiple part files per partition dir
    val tmp = Files.createTempDirectory("graft-filesize").toString
    StorageSink.write(Codecs.canalJson(env).limit(40).coalesce(1), tmp, "text",
      maxRecordsPerFile = Some(2L))
    val dirs = new java.io.File(tmp).listFiles()
      .filter(_.getName.startsWith("_schema=")).flatMap(_.listFiles())
      .flatMap(_.listFiles()).filter(_.getName.startsWith("_date="))
    val counts = dirs.map(_.listFiles().count(_.getName.startsWith("part-")))
    assert(counts.exists(_ > 1),
      s"a 2-record roll must split some dir's file: ${counts.toSeq}")
  }

  test("kafka frame has the connector contract columns") {
    val prepared = KafkaSink.prepare(
      Codecs.canalJson(Routing.routeTopic(
        Routing.partitionByKeyColumns(env, Seq("user_id"), 8), "cdc_{schema}_{table}")),
      Seq("user_id"))
    assert(prepared.columns.toSeq == Seq("topic", "partition", "key", "value"))
    val r = prepared.head()
    assert(r.getAs[String]("topic").startsWith("cdc_app_events_"))
    assert(r.getAs[Int]("partition") >= 0 && r.getAs[Int]("partition") < 8)
    assert(new String(r.getAs[Array[Byte]]("value")).startsWith("{\"id\":0"))
  }

  test("file-backed MQ emulation: per-partition order, replay dedup, e2e decode") {
    import org.apache.spark.sql.expressions.Window
    import graft.sinks.FileMq
    val tmp = Files.createTempDirectory("graft-filemq").toString
    val routed = Codecs.canalJson(Routing.routeTopic(
      Routing.partitionByKeyColumns(env, Seq("user_id"), 4), "cdc_{schema}"))
    val prepared = KafkaSink.prepare(routed, Seq("user_id"),
      carry = Seq("_commit_ts", "_start_ts", "_op", "_row_id"))
    val order = Seq(col("_commit_ts").asc, col("_start_ts").asc,
      Envelope.opOrder(col("_op")).asc, col("_row_id").asc)
    // two producer batches split on commit ts, then batch 1 REPLAYED
    // (the streaming checkpoint re-runs a batch after a crash)
    val cut = env.agg(expr("percentile_approx(_commit_ts, 0.5)")).head().getLong(0)
    val b0 = prepared.filter(col("_commit_ts") <= cut)
    val b1 = prepared.filter(col("_commit_ts") > cut)
    FileMq.append(b0, tmp, 0, order)
    FileMq.append(b1, tmp, 1, order)
    FileMq.append(b1, tmp, 1, order) // at-least-once replay, same batch id
    val log = FileMq.read(spark, tmp)
    assert(log.count() == env.count(), "consumer dedupes the replayed batch")
    // per (partition, key): offset order == commit order
    val w = Window.partitionBy(col("partition"), col("key")).orderBy(col("offset"))
    val violations = log
      .withColumn("prev_ts", lag(col("_commit_ts"), 1).over(w))
      .filter(col("prev_ts") > col("_commit_ts")).count()
    assert(violations == 0, "per-key commit order must hold in offset order")
    // the sunk wire bytes decode back to the source rows
    val decoded = graft.functions.Decoders.decodeCanal(
      log.select(col("value").cast("string").as("_value")))
    assert(decoded.count() == env.count())
    assert(decoded.select(sum(coalesce(col("after.user_id"), col("before.user_id")))).head().getLong(0) ==
      env.select(sum(coalesce(col("after.user_id"), col("before.user_id")))).head().getLong(0))
  }

  test("pulsar frame has the connector contract columns; constant-key rule pins the key") {
    val routed = Codecs.canalJson(Routing.routeTopic(
      Routing.partitionByKeyColumns(env, Seq("user_id"), 8), "cdc_{schema}_{table}"))
    val prepared = graft.sinks.PulsarSink.prepare(routed, Seq("user_id"))
    assert(prepared.columns.toSeq == Seq("__topic", "__key", "__eventTime", "value"))
    val r = prepared.head()
    assert(r.getAs[String]("__topic").startsWith("cdc_app_events_"))
    assert(r.getAs[String]("__key").startsWith("app|events_"))
    assert(new String(r.getAs[Array[Byte]]("value")).startsWith("{\"id\":0"))
    // partition rule `key` (partition/key.go:31): one constant user key
    val pinned = graft.sinks.PulsarSink.prepare(routed, Seq("user_id"), Some("cdc"))
    assert(pinned.select("__key").distinct().collect().map(_.getString(0)).toSeq == Seq("cdc"))
  }

  test("large message claim-check emits pointers with locations") {
    val out = LargeMessage.claimCheck(Codecs.canalJson(env), 210, "s3://bucket/claims")
    val large = out.filter(col("_large"))
    assert(large.count() > 0 && large.count() < out.count())
    val r = large.select("_value", "_claim_location").head()
    assert(r.getString(0).startsWith("{\"claimCheckLocation\":\"s3://bucket/claims/app/"))
    assert(r.getString(1) == r.getString(0).stripPrefix("{\"claimCheckLocation\":\"").stripSuffix("\"}"))
    // small messages untouched
    assert(out.filter(!col("_large")).select("_value").head().getString(0).startsWith("{\"id\":0"))
  }

  test("streaming windowed progress with watermark drains availableNow") {
    val tmp = Files.createTempDirectory("graft-win").toString
    Tables.events(spark, "/root/testdata/sf0.001").write.mode("overwrite")
      .parquet(s"$tmp/src")
    val schema = spark.read.parquet(s"$tmp/src").schema
    val stream = Envelope.fromEvents(
      spark.readStream.schema(schema).parquet(s"$tmp/src"))
    val q = ResolvedTs.windowedProgress(stream, "1 hour", "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("win_progress")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.table("win_progress")
    assert(out.count() > 0)
    // windowed totals reconcile with the batch envelope, minus the
    // final window (still open at the terminal watermark, correctly
    // withheld in append mode)
    val streamed = out.agg(sum("n_events")).head().getLong(0)
    val hourNs = 3600L * 1000 * 1000 * 1000
    val maxTs = env.agg(max("_commit_ts")).head().getLong(0)
    val expectedClosed = env.filter(
      (col("_commit_ts") - pmod(col("_commit_ts"), lit(hourNs))) + hourNs <= maxTs).count()
    assert(streamed == expectedClosed)
    // resolved ts is monotone with window start per table
    import org.apache.spark.sql.expressions.Window
    val mono = out.withColumn("prev",
        lag("resolved_ts", 1).over(Window.partitionBy("_schema", "_table").orderBy("window_start")))
      .filter(col("prev").isNotNull && col("resolved_ts") < col("prev"))
    assert(mono.count() == 0)
  }

  test("canal decoder inverts encoder on nested images") {
    val decoded = graft.functions.Decoders.decodeCanal(Codecs.canalJson(env))
    assert(decoded.count() == env.count())
    val u = decoded.filter(col("_op") === "U")
    assert(u.filter(col("before").isNull || col("after").isNull).count() == 0)
    val d = decoded.filter(col("_op") === "D")
    assert(d.filter(col("after").isNotNull).count() == 0)
    assert(d.filter(col("before").isNull).count() == 0)
  }
}
