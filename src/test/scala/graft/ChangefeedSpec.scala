package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.model._
import graft.streaming.Changefeed

/** End-to-end streaming changefeed over the sf0.001 events log:
  * source → envelope → filters → route → encode → parquet sink, with
  * exactly-once restart semantics from the streaming checkpoint
  * (the reference's integration-test model, SURVEY §5.2).
  */
class ChangefeedSpec extends SparkFunSuite {

  private val cfg = ChangefeedConfig(
    id = "cf-test",
    filter = FilterConfig(
      rules = Seq("app.*", "!app.events_3"),
      ignoreOps = Seq.empty,
      ignoreDeleteValueExpr = Some("user_id < 0")),
    sink = SinkConfig(
      protocol = Protocol.CanalJson,
      numPartitions = 4,
      dispatch = Seq(DispatchRule(
        partition = PartitionRule.KeyColumns(Seq("user_id")),
        topic = Some("cdc_{schema}_{table}")))))

  test("changefeed drains the log once and restart is a no-op") {
    val tmp = Files.createTempDirectory("graft-cf").toString
    val sinkDir = s"$tmp/sink"
    val ckptDir = s"$tmp/ckpt"
    // streaming file sources read directories: stage the change log
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))

    val q1 = Changefeed.run(spark, cfg, src, sinkDir, ckptDir)
    q1.awaitTermination(120000)
    val n1 = spark.read.parquet(sinkDir).count()
    assert(n1 > 0)
    // events_3 filtered out
    val tables = spark.read.parquet(sinkDir).select("_table").distinct()
      .collect().map(_.getString(0)).toSet
    assert(!tables.contains("events_3") && tables.nonEmpty)
    // encoded payload present and canal-shaped
    val v = spark.read.parquet(sinkDir).select("_value").head().getString(0)
    assert(v.startsWith("{\"id\":0,\"database\":\"app\""))

    // restart with same checkpoint: no new data -> no duplicates
    val q2 = Changefeed.run(spark, cfg, src, sinkDir, ckptDir)
    q2.awaitTermination(120000)
    val n2 = spark.read.parquet(sinkDir).count()
    assert(n2 == n1, s"restart must be exactly-once (was $n1, now $n2)")

    // progress summary behaves like a checkpoint table
    val prog = Changefeed.progress(spark, sinkDir)
    assert(prog.agg(sum("n_events")).head().getLong(0) == n1)
  }

  test("streaming exact dedup: cross-batch duplicates collapse, state watermark-bounded") {
    val tmp = Files.createTempDirectory("graft-sdedup").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    // the SAME log staged twice = every row duplicated across files
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events_a.parquet"))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events_b.parquet"))
    val schema = spark.read.parquet(src).schema
    val env = Envelope.fromEvents(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src))
      .withColumn("_event_time",
        timestamp_micros((col("_commit_ts") / lit(1000L)).cast("long")))
    val deduped = graft.operators.Dedup.streamingExact(
      env, Seq("_row_id"), "_event_time", "1 hour")
    val q = deduped.drop("_event_time").writeStream
      .format("parquet").option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$tmp/out")
    val unique = spark.read.parquet(src).select("event_id").distinct().count()
    assert(out.count() == unique,
      s"duplicates across batches must collapse (${out.count()} vs $unique)")
    assert(out.select("_row_id").distinct().count() == out.count())
  }

  test("streaming near-dup: signature collisions collapse across batches") {
    // expression signature must be bit-equal to the aggregated lanes
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val viaAgg = graft.operators.Dedup.minhashSignatures(docs)
      .select(col("doc_id"), concat_ws(",",
        (0 until graft.operators.Dedup.NumHashes)
          .map(i => col(s"m$i").cast("string")): _*).as("sig"))
    val viaExpr = docs.select(col("doc_id"),
      graft.operators.Dedup.minhashSignatureExpr(col("text")).as("sig2"))
    assert(viaAgg.join(viaExpr, "doc_id")
      .filter(col("sig") =!= col("sig2")).count() == 0,
      "expression signature must equal the aggregated signature")

    // cross-batch collapse: same corpus staged twice, one file per batch
    val tmp = Files.createTempDirectory("graft-sneardup").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet"),
      java.nio.file.Paths.get(s"$src/docs_a.parquet"))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet"),
      java.nio.file.Paths.get(s"$src/docs_b.parquet"))
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .withColumn("_event_time", timestamp_micros(col("doc_id") * 1000L))
    val deduped = graft.operators.Dedup.streamingNearDup(
      stream, "text", "_event_time", "1 hour")
    val q = deduped.drop("_event_time").writeStream
      .format("parquet").option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$tmp/out")
    val distinctSigs = viaExpr.select(col("sig2")).distinct().count()
    assert(out.count() == distinctSigs,
      s"near-dup signatures must collapse across batches (${out.count()} vs $distinctSigs)")
  }

  test("streaming curation pipeline: normalize + gates + dedup equals batch") {
    // the live-ingest training-data shape: every stateless curation
    // op (normalize, quality, hashed gate) rides the stream as plain
    // columns, ONE stateful op (exact dedup) bounds the plan — and
    // the stream's output is exactly the batch pipeline's output
    import graft.operators.{Dedup, TextOps}
    val tmp = Files.createTempDirectory("graft-scur").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet"),
      java.nio.file.Paths.get(s"$src/docs_a.parquet"))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet"),
      java.nio.file.Paths.get(s"$src/docs_b.parquet"))
    val schema = spark.read.parquet(src).schema

    def curate(docs: org.apache.spark.sql.DataFrame) =
      docs
        .withColumn("text_clean", TextOps.normalizeExpr(col("text")))
        .withColumn("score_micro",
          TextOps.hashScoreExpr(split(col("text_clean"), " "), 256L))
        .filter(col("score_micro") >= -5900L) // ~p10 cut on the fixture
        .withColumn("content_md5", md5(col("text_clean")))

    val stream = curate(spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src))
      // keep every event time strictly above the initial watermark (0)
      .withColumn("_event_time",
        timestamp_micros(lit(3600000000L) + col("doc_id") * 1000L))
    val deduped = Dedup.streamingExact(
      stream, Seq("content_md5"), "_event_time", "1 hour")
    val q = deduped.drop("_event_time").writeStream
      .format("parquet").option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(s"$tmp/out")
    val batch = curate(Tables.documents(spark, "/root/testdata/sf0.001"))
    // gate some but not all (the fixture must exercise the filter)
    assert(batch.count() > 0 &&
      batch.count() < Tables.documents(spark, "/root/testdata/sf0.001").count())
    // one survivor per distinct cleaned content, same content set
    val batchMd5 = batch.select("content_md5").distinct()
      .collect().map(_.getString(0)).toSet
    val streamMd5 = streamed.select("content_md5")
      .collect().map(_.getString(0))
    assert(streamMd5.length == batchMd5.size, "one survivor per content")
    assert(streamMd5.toSet == batchMd5, "stream output = batch content set")
    // stateless column values agree with batch per doc
    val joined = streamed.select(col("doc_id"), col("score_micro").as("s1"))
      .join(batch.select(col("doc_id"), col("score_micro").as("s2")), "doc_id")
    assert(joined.filter(col("s1") =!= col("s2")).count() == 0)
  }

  test("mysql-path changefeed applies ordered statements via foreachBatch") {
    val tmp = Files.createTempDirectory("graft-cfm").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val stmtDir = s"$tmp/stmts"
    Files.createDirectories(java.nio.file.Paths.get(stmtDir))
    val mysqlCfg = ChangefeedConfig(id = "cf-mysql",
      sink = SinkConfig(safeMode = true, numPartitions = 4),
      splitUpdateOnKeyChange = false)
    // executor-side statement collector: one file per worker partition
    val q = Changefeed.runMysql(spark, mysqlCfg, src, s"$tmp/ckpt") { it =>
      val f = java.nio.file.Paths.get(stmtDir,
        java.util.UUID.randomUUID().toString + ".sql")
      java.nio.file.Files.write(f,
        it.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    q.awaitTermination(120000)
    val all = new java.io.File(stmtDir).listFiles().toSeq
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
      .filter(_.nonEmpty)
    // every worker connection leads with the full session prologue
    // (connectionPrologue: helper.go:220-290 DSN params as SETs)
    val prologues = all.filter(s => s.startsWith("SET "))
    assert(prologues.contains("SET SESSION foreign_key_checks = 0"))
    assert(prologues.count(_ == "SET SESSION foreign_key_checks = 0") == 4,
      "one prologue per worker partition")
    val stmts = all.filterNot(_.startsWith("SET "))
    assert(stmts.size == 1000, s"one statement per change row, got ${stmts.size}")
    assert(stmts.count(_.startsWith("REPLACE INTO")) > 0)
    assert(stmts.count(_.startsWith("DELETE FROM")) > 0)
  }

  test("differential: decoding the sunk wire bytes recovers the source exactly") {
    // the reference's consumer-harness verification model (SURVEY §5.2:
    // kafka-consumer decodes and re-applies, then sync_diff compares) —
    // here: changefeed → open-protocol sink files → decode ONLY the
    // wire key/value → must equal the source envelope
    val tmp = Files.createTempDirectory("graft-cfdiff").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val diffCfg = ChangefeedConfig(id = "cf-diff",
      sink = SinkConfig(protocol = Protocol.Open, numPartitions = 4,
        fixtureRenderer = true), // the diff asserts the DECIMAL(18,2) wire form
      splitUpdateOnKeyChange = false)
    val q = Changefeed.run(spark, diffCfg, src, s"$tmp/sink", s"$tmp/ckpt")
    q.awaitTermination(120000)

    val wire = spark.read.parquet(s"$tmp/sink").select("_key", "_value")
    val decoded = graft.functions.Decoders.decodeOpen(wire)
      .select(col("_schema"), col("_table"), col("_commit_ts"), col("_op"),
        col("before.user_id"), col("before.value"), col("before.k"),
        col("after.user_id"), col("after.value"), col("after.k"))
    // source side, with value passing through the wire's DECIMAL(18,2)
    val dec = (c: org.apache.spark.sql.Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(18, 2)).cast("double")
    val source = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
      .select(col("_schema"), col("_table"), col("_commit_ts"), col("_op"),
        col("before.user_id"), dec(col("before.value")), col("before.k"),
        col("after.user_id"), dec(col("after.value")), col("after.k"))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).sorted.toSeq
    val d = canon(decoded)
    assert(d.size == 1000 && d == canon(source),
      "wire-decoded rows must equal the source envelope row-for-row")
  }

  test("admission cap bounds each micro-batch (flow control)") {
    val tmp = Files.createTempDirectory("graft-cffc").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    // two source files; cap = 1 file per trigger -> >= 2 batches
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events1.parquet"))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events2.parquet"))
    val capped = cfg.copy(id = "cf-fc", maxFilesPerTrigger = Some(1))
    val q = Changefeed.run(spark, capped, src, s"$tmp/sink", s"$tmp/ckpt")
    q.awaitTermination(120000)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 2,
      s"cap of 1 file must split the drain, got ${batches.length} batches")
    assert(batches.forall(_.numInputRows <= 1000),
      "no batch may admit more than one file's rows")
  }

  test("text-DDL path: dispatch + parse + barrier end-to-end") {
    import graft.model.{ColumnDef, SchemaRegistry}
    import graft.model.DdlAction.CreateTable
    val tmp = Files.createTempDirectory("graft-cfsql").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val cut = env.select("_commit_ts").orderBy("_commit_ts")
      .collect().map(_.getLong(0)).apply(500)
    val initial = SchemaRegistry().applyAll((0 until 4).map(i =>
      CreateTable("app", s"events_$i",
        Seq(ColumnDef("user_id", "bigint"), ColumnDef("value", "double")), 0L)))
    val ddlSql = Seq(
      cut -> "ALTER TABLE events_0 ADD COLUMN k BIGINT DEFAULT 42", // emit + fold
      (cut + 1) -> "TRUNCATE TABLE events_1",                       // ignored: fold only
      (cut + 2) -> "DROP TABLE events_3",                           // discarded (not replicated)
      (cut + 3) -> "CREATE INDEX idx ON events_0 (k)")              // not shape-changing
    val sqlCfg = ChangefeedConfig(id = "cf-sql",
      filter = FilterConfig(rules = Seq("app.*", "!app.events_3")),
      splitUpdateOnKeyChange = false)
    val outDir = s"$tmp/out"
    Files.createDirectories(java.nio.file.Paths.get(outDir))
    val emittedDdl = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = Changefeed.runWithDdlSql(spark, sqlCfg, src, s"$tmp/ckpt",
      ddlSql, initial, payloadCols = Seq("user_id", "value"),
      ignoreDdlClasses = Seq("truncate table")) { (step, _) =>
      step.write.mode("append").parquet(outDir)
    } { (ts, sql) => emittedDdl += (ts -> sql); () }
    q.awaitTermination(120000)

    // only the ADD COLUMN emits downstream; truncate folded silently,
    // drop of the unreplicated table discarded, index skipped
    assert(emittedDdl.map(_._2) == Seq("ALTER TABLE events_0 ADD COLUMN k BIGINT DEFAULT 42"))
    val out = spark.read.option("mergeSchema", "true").parquet(outDir)
    val post = out.filter(col("_commit_ts") >= cut && col("_table") === "events_0")
    assert(post.count() > 0)
    assert(post.filter(col("k").isNull || col("k") =!= 42L).count() == 0,
      "parsed AddColumn default surfaces post-DDL")
  }

  test("mq path emits resolved-ts watermarks covering every data row") {
    val tmp = Files.createTempDirectory("graft-cfmq").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val q = Changefeed.runMq(spark, cfg.copy(id = "cf-mq"), src,
      s"$tmp/sink", s"$tmp/ckpt")
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$tmp/sink")
    val rows = out.filter(col("_kind") === "row")
    val resolved = out.filter(col("_kind") === "resolved")
    assert(rows.count() > 0 && resolved.count() > 0)
    // a resolved message reached every routing partition
    assert(resolved.select("_partition").distinct().count() == 4)
    // the control payload is protocol-specific: this canal-json feed
    // carries the TIDB_WATERMARK message with the watermark in _tidb
    val wm = resolved.select("_value").head().getString(0)
    assert(wm.contains("\"type\":\"TIDB_WATERMARK\"")
      && wm.contains("\"_tidb\":{\"watermarkTs\":"), wm)
    // the watermark covers every data row: no row above the max resolved
    val maxResolved = resolved.agg(max("_commit_ts")).head().getLong(0)
    assert(rows.filter(col("_commit_ts") > maxResolved).count() == 0,
      "resolved-ts promises no earlier commit will arrive")
  }

  test("ddl barrier wired into the streaming loop evolves the registry mid-stream") {
    import graft.model.DdlAction._
    import graft.model.{ColumnDef, SchemaRegistry}
    val tmp = Files.createTempDirectory("graft-cfddl").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))

    // pick a DDL commit-ts in the middle of the stream
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val cut = env.select("_commit_ts").orderBy("_commit_ts")
      .collect().map(_.getLong(0)).apply(500)
    val initial = SchemaRegistry().applyAll((0 until 4).map(i =>
      CreateTable("app", s"events_$i",
        Seq(ColumnDef("user_id", "bigint"), ColumnDef("value", "double")), 0L)))
    // AddColumn k lands mid-stream with default 42: rows below `cut`
    // must not see k; rows at/above it surface the default (the data's
    // payloadCols deliberately omit k, so only the default can fill it)
    val ddls = Seq[graft.model.DdlAction](
      AddColumn("app", "events_0", ColumnDef("k", "bigint", Some("42")), cut))

    val ddlCfg = ChangefeedConfig(id = "cf-ddl", splitUpdateOnKeyChange = false)
    val outDir = s"$tmp/out"
    Files.createDirectories(java.nio.file.Paths.get(outDir))
    val q = Changefeed.runWithDdl(spark, ddlCfg, src, s"$tmp/ckpt",
      ddls, initial, payloadCols = Seq("user_id", "value")) { (step, _) =>
      step.write.mode("append").parquet(outDir)
    }
    q.awaitTermination(120000)

    // pre-DDL steps legitimately lack k in their file schema — merge
    val out = spark.read.option("mergeSchema", "true").parquet(outDir)
    assert(out.count() == env.count(), "steps tile the stream exactly")
    assert(out.columns.contains("k"), "post-DDL column surfaces in the union")
    // pre-DDL rows: no k anywhere; post-DDL rows of events_0: default 42
    assert(out.filter(col("_commit_ts") < cut && col("k").isNotNull).count() == 0)
    val post = out.filter(col("_commit_ts") >= cut && col("_table") === "events_0")
    assert(post.count() > 0)
    assert(post.filter(col("k") =!= 42L || col("k").isNull).count() == 0,
      "post-DDL events_0 rows carry the AddColumn default")
    // other tables never gained k
    assert(out.filter(col("_table") =!= "events_0" && col("k").isNotNull).count() == 0)
  }

  test("mq-path kill-restart: the wire state converges and watermarks still " +
      "cover every row (random_drop_message / mq_sink_error_resume analog)") {
    import graft.streaming.Failpoints
    def mkSrc(tmp: String): String = {
      val src = s"$tmp/src"
      Files.createDirectories(java.nio.file.Paths.get(src))
      Seq("a", "b").foreach { n =>
        Files.copy(
          java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
          java.nio.file.Paths.get(s"$src/events-$n.parquet"))
      }
      src
    }
    val mqCfg = ChangefeedConfig(id = "cf-mq-chaos",
      sink = SinkConfig(protocol = Protocol.Open),
      maxFilesPerTrigger = Some(1))

    def drive(src: String, sink: String, ckpt: String, id: String): Int = {
      var attempts = 0
      var done = false
      while (!done && attempts < 8) {
        attempts += 1
        val q = Changefeed.runMq(spark, mqCfg.copy(id = id), src, sink, ckpt)
        try { q.awaitTermination(120000); done = true }
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
        finally { if (q.isActive) q.stop() }
      }
      assert(done, "mq changefeed failed to drain")
      attempts
    }

    val tmp = Files.createTempDirectory("graft-mq-chaos").toString
    val src = mkSrc(tmp)
    Failpoints.clear()
    drive(src, s"$tmp/sink-golden", s"$tmp/ckpt-golden", "cf-mq-golden")
    val golden = spark.read.parquet(s"$tmp/sink-golden")
    val goldenRows = golden.filter(col("_kind") === "row")
      .select("_value").distinct().collect().map(_.getString(0)).toSet

    // kill the SECOND batch at its admission point, then drain
    Failpoints.enable("graft/changefeed/batch", "1*off->1*panic")
    val attempts = drive(src, s"$tmp/sink", s"$tmp/ckpt", "cf-mq-chaos")
    Failpoints.clear()
    assert(attempts >= 2, "the injected batch kill must force a restart")

    val sunk = spark.read.parquet(s"$tmp/sink")
    val rows = sunk.filter(col("_kind") === "row")
    assert(rows.select("_value").distinct().collect()
      .map(_.getString(0)).toSet == goldenRows,
      "distinct wire state must match the chaos-free run")
    // watermark contract across the restart: the final resolved bound
    // covers the maximum row commit-ts
    val maxRowTs = rows.agg(max(col("_commit_ts"))).head.getLong(0)
    val resolvedTs = sunk.filter(col("_kind") === "resolved")
      .select(regexp_extract(col("_value"), "\"ts\":(\\d+)", 1).cast("long").as("ts"))
      .agg(max(col("ts"))).head.getLong(0)
    assert(resolvedTs >= maxRowTs,
      s"resolved $resolvedTs must cover the last row commit $maxRowTs")
  }

  test("steady-state from raw 2PC bytes: source → matcher → mount → pipeline " +
      "→ MQ sink as ONE query equals the committed-mode feed; kill-restart " +
      "recovers matcher state and sink checkpoint together") {
    import graft.operators.RawKvMounter
    import graft.operators.RawKvMounter.{KvColumn, KvTableMeta}
    import graft.sources.ChangelogGen
    val tmp = Files.createTempDirectory("graft-cf2pc").toString
    val metas = (0 until 4).map { i =>
      KvTableMeta(ChangelogGen.tableIdOf(i.toLong), "app", s"events_$i",
        Seq(
          KvColumn(1L, "user_id", "bigint", nullable = false),
          KvColumn(2L, "value", "double"),
          KvColumn(3L, "k", "bigint")),
        handleCol = "user_id")
    }
    def gen(total: Long, mode: String) = spark.readStream
      .format("graft.sources.ChangelogGenSource")
      .option("tables", 4).option("totalRows", total)
      .option("rowsPerBatch", 1000).option("numPartitions", 4)
      .option(mode, "true").load()
    val feedCfg = cfg.copy(id = "cf-2pc")

    // golden: the committed-mode feed through the identical pipeline
    val qG = Changefeed.runMqStream(spark, feedCfg.copy(id = "cf-2pc-golden"),
      RawKvMounter.mountTables(gen(4000, "rawKv"), metas),
      s"$tmp/golden", s"$tmp/ckpt-g")
    qG.awaitTermination(180000)

    // the 2PC steady-state feed: kill mid-run (matcher state holds
    // pending prewrite/commit pairs), then resume on the SAME
    // checkpoint — offsets, per-txn state store, and the sink's
    // _spark_metadata recover as one
    def start() = Changefeed.runMqFromRaw2pc(spark, feedCfg,
      gen(8000, "rawKvUncommitted"), metas, s"$tmp/sink", s"$tmp/ckpt",
      matcherGcMs = 600000L)
    val q1 = start()
    val deadline = System.currentTimeMillis() + 120000
    while (q1.isActive &&
        q1.recentProgress.count(_.numInputRows > 0) < 3 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    q1.stop()
    val q2 = start()
    q2.awaitTermination(180000)

    // wire equality: the 2PC feed must emit exactly the committed-mode
    // rows minus rolled-back (i%23) and orphan (i%31) txns — same
    // routing partition, same encoded bytes
    val i = (col("_commit_ts") - lit(ChangelogGen.baseTs)) / lit(1000000L)
    val expected = spark.read.parquet(s"$tmp/golden")
      .filter(col("_kind") === "row")
      .filter(i % 23 =!= 0 && i % 31 =!= 0)
      .select("_partition", "_value")
    val got = spark.read.parquet(s"$tmp/sink")
      .filter(col("_kind") === "row")
      .select("_partition", "_value")
    assert(got.count() == expected.count() && got.count() > 0,
      s"row counts: got ${got.count()} expected ${expected.count()}")
    assert(got.exceptAll(expected).count() == 0 &&
      expected.exceptAll(got).count() == 0,
      "raw-2PC wire output must equal the committed-mode feed's")
    // watermark contract survives the composition: resolved messages
    // exist and cover every emitted row
    val sunk = spark.read.parquet(s"$tmp/sink")
    val resolved = sunk.filter(col("_kind") === "resolved")
    assert(resolved.count() > 0)
    val maxRow = sunk.filter(col("_kind") === "row")
      .agg(max("_commit_ts")).head().getLong(0)
    assert(resolved.agg(max("_commit_ts")).head().getLong(0) >= maxRow)
  }

  test("bootstrap census reads the schema registry, NOT the corpus " +
      "(no scan job at changefeed create)") {
    val bootCfg = ChangefeedConfig(id = "cf-census",
      sink = SinkConfig(protocol = Protocol.Simple,
        sendAllBootstrapAtStart = true))
    val reg = SchemaRegistry()
      .apply(DdlAction.CreateTable("app", "t1", Seq(ColumnDef("id", "bigint")), 1L))
      .apply(DdlAction.CreateTable("app", "t0", Seq(ColumnDef("id", "bigint")), 1L))
      .apply(DdlAction.CreateTable("crm", "users", Seq(ColumnDef("id", "bigint")), 1L))
    // the source dir DOES NOT EXIST: a registry-backed census must be a
    // driver-only map read — any corpus scan here would throw
    val census = Changefeed.bootstrapCensus(
      spark, bootCfg, "/nonexistent/census-source", Some(reg))
    assert(census == Seq(("app", "t0"), ("app", "t1"), ("crm", "users")))
    // registry-less deployments still fall back to the log's table set
    val fallback = Changefeed.bootstrapCensus(
      spark, bootCfg, "/root/testdata/sf0.001/events.parquet", None)
    assert(fallback.nonEmpty && fallback.forall(_._1 == "app"))
    // census is empty (and scan-free) when the at-start flag is off
    assert(Changefeed.bootstrapCensus(
      spark, bootCfg.copy(sink = bootCfg.sink.copy(sendAllBootstrapAtStart = false)),
      "/nonexistent/census-source", None).isEmpty)
  }

  test("DDL-aware steady state (raw 2PC, evolving store): an ADD COLUMN lands " +
      "mid-stream — pre-DDL rows default-fill, post-DDL rows carry the column, " +
      "wire equals the batch versioned mount; kill-restart across the DDL " +
      "boundary stays exactly-once with ONE state store") {
    import graft.operators.RawKvMounter
    import graft.operators.RawKvMounter.{KvColumn, KvTableMeta}
    import graft.streaming.{Failpoints, TxnMatcher}
    import org.apache.spark.sql.Row

    val tmp = Files.createTempDirectory("graft-cf-evolve").toString
    val srcDir = s"$tmp/src"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val feedCfg = ChangefeedConfig(id = "cf-evolve",
      filter = FilterConfig(rules = Seq("app.*")),
      handleKeys = Seq("id"),
      sink = SinkConfig(protocol = Protocol.CanalJson, numPartitions = 2))

    def jobJson(jid: Long, tpe: Int, q: String, ts: Long): Array[Byte] =
      (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":900,""" +
        s""""schema_name":"app","table_name":"t","state":4,""" +
        s""""query":"${q.replace("\"", "\\\"")}",""" +
        s""""binlog":{"SchemaVersion":$ts,"TableInfo":{"id":900}},"version":1}""")
        .getBytes("UTF-8")
    // DDL jobs ride the wire pre-paired (COMMITTED passthrough); rows
    // arrive as raw 2PC prewrite/commit pairs
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
    // f1: CREATE TABLE at ts 10 + two v1-shape rows
    writeFile(jobEntry(1L, 3, "CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L) ++
      rowPair(1L, Seq(2L -> 10L), 50L) ++ rowPair(2L, Seq(2L -> 20L), 60L))
    // f2: ADD COLUMN at ts 100 + a LATE pre-DDL row (committed at 90,
    // arriving after the DDL is known: decodes as-of 90, conforms with
    // the default) + a row carrying the new column
    writeFile(jobEntry(2L, 5, "ALTER TABLE app.t ADD COLUMN k BIGINT DEFAULT 7", 100L) ++
      rowPair(5L, Seq(2L -> 50L), 90L) ++
      rowPair(3L, Seq(2L -> 30L, 3L -> 33L), 150L))
    // f3: another post-DDL row
    writeFile(rowPair(4L, Seq(2L -> 40L, 3L -> 44L), 200L))

    // golden: the proven BATCH versioned mount through the same
    // pipeline, given the SAME knowledge horizon per batch — rows the
    // feed shipped before the DDL encode under v1 (the reference
    // encodes each row with its commit-time schema on the wire); rows
    // decoded once the DDL is known conform to v2 (late pre-DDL rows
    // default-fill — the mounter-conformance contract)
    val rawSchema = org.apache.spark.sql.types.StructType(
      TxnMatcher.committedSchema.fields)
    def committedDf(rows: Seq[(Long, Seq[(Long, Long)], Long)]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows.map {
        case (id, cells, cts) =>
          Row(TiKvCodec.encodeRecordKey(900L, TiKvCodec.IntHandle(id)),
            TiKvCodec.encodeV2(cells.map { case (cid, x) =>
              cid -> Some(TiKvCodec.intCell(x)) }),
            null, "put", cts - 1L, cts)
      }, 2), rawSchema)
    val metaV1 = KvTableMeta(900L, "app", "t",
      Seq(KvColumn(1L, "id", "bigint"), KvColumn(2L, "v", "bigint")),
      handleCol = "id")
    val metaV2 = metaV1.copy(columns =
      metaV1.columns :+ KvColumn(3L, "k", "bigint", default = Some("7")))
    def pipe(env: org.apache.spark.sql.DataFrame) =
      Changefeed.pipeline(spark, feedCfg)(
        env.withColumn("_row_id", coalesce(col("after.id"), col("before.id"))))
        .select("_partition", "_value").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    val expected =
      pipe(RawKvMounter.mountTableVersioned(
        committedDf(Seq((1L, Seq(2L -> 10L), 50L), (2L, Seq(2L -> 20L), 60L))),
        Seq(10L -> metaV1))) ++
      pipe(RawKvMounter.mountTableVersioned(
        committedDf(Seq(
          (5L, Seq(2L -> 50L), 90L),
          (3L, Seq(2L -> 30L, 3L -> 33L), 150L),
          (4L, Seq(2L -> 40L, 3L -> 44L), 200L))),
        Seq(10L -> metaV1, 100L -> metaV2)))
    assert(expected.size == 5)

    def stream() = spark.readStream.schema(TxnMatcher.uncommittedSchema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    def start() = Changefeed.runMqFromRaw2pcEvolving(spark, feedCfg,
      stream(), SchemaStore(), s"$tmp/sink", s"$tmp/ckpt",
      matcherGcMs = 600000L)

    // kill the SECOND batch (the DDL boundary) at its admission point,
    // then drain on the same checkpoint: offsets, the matcher's state
    // store, the sink metadata, and the persisted schema-store log
    // must recover TOGETHER
    Failpoints.enable("graft/changefeed/evolve-batch", "1*off->1*panic")
    var attempts = 0
    var done = false
    var lastQuery: org.apache.spark.sql.streaming.StreamingQuery = null
    while (!done && attempts < 6) {
      attempts += 1
      val q = start()
      lastQuery = q
      try { q.awaitTermination(180000); done = true }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally { if (q.isActive) q.stop() }
    }
    Failpoints.clear()
    assert(done, "evolving feed failed to drain")
    assert(attempts >= 2, "the injected batch kill must force a restart")
    // exactly one state store in the whole composition (the matcher's)
    val so = Option(lastQuery.lastProgress).toSeq.flatMap(_.stateOperators)
    assert(so.size == 1, s"state operators: ${so.size}")
    // the schema-store fold persisted under the checkpoint dir
    assert(Files.exists(java.nio.file.Paths.get(
      s"$tmp/ckpt/schemastore/ddl_jobs.jsonl")),
      "the DDL-job log must persist with the checkpoint")

    val got = spark.read.parquet(s"$tmp/sink")
      .filter(col("_kind") === "row")
      .select("_partition", "_value").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expected,
      s"evolving wire output must equal the batch versioned mount's:\n" +
        s"got ${got.toSeq.sortBy(_._2)}\nexp ${expected.toSeq.sortBy(_._2)}")
    // spot the semantics in the bytes: a row SHIPPED pre-DDL has no k
    // (commit-time schema on the wire); a late pre-DDL row decoded
    // after the DDL default-fills k=7; post-DDL rows carry real values
    val shipped = got.find(_._2.contains("\"id\":1,"))
    assert(shipped.exists(!_._2.contains("\"k\"")),
      s"a pre-DDL-shipped row carries its commit-time shape: $shipped")
    val late = got.find(_._2.contains("\"id\":5,"))
    assert(late.exists(_._2.contains("\"k\":7")),
      s"a late pre-DDL row must default-fill k=7: $late")
    assert(got.exists(_._2.contains("\"k\":33")), "post-DDL row must carry k=33")
  }

  test("evolving feed is REPLICATION-complete: the mid-stream DDL ships on " +
      "the wire before the first post-DDL row, the handshake re-sends with " +
      "the LIVE post-DDL schema in the same batch, a filtered-out foreign " +
      "table never leaks, and a consumer decodes with ONLY wire-learned " +
      "schema") {
    import graft.streaming.TxnMatcher
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._

    val tmp = Files.createTempDirectory("graft-cf-evolve-wire").toString
    val srcDir = s"$tmp/src"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    // simple protocol + giant cadence windows: the ONLY re-send
    // trigger left is the schema-version change (bootstraper.go:259)
    val feedCfg = ChangefeedConfig(id = "cf-evolve-wire",
      filter = FilterConfig(rules = Seq("app.*")),
      handleKeys = Seq("id"),
      sink = SinkConfig(protocol = Protocol.Simple, numPartitions = 2,
        sendBootstrapIntervalInSec = 100000L,
        sendBootstrapInMsgCount = 100000000,
        sendBootstrapToAllPartition = false))

    def jobJson(jid: Long, tpe: Int, q: String, ts: Long, sc: String,
                tb: String, tid: Long): Array[Byte] =
      (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":$tid,""" +
        s""""schema_name":"$sc","table_name":"$tb","state":4,""" +
        s""""query":"${q.replace("\"", "\\\"")}",""" +
        s""""binlog":{"SchemaVersion":$ts,"TableInfo":{"id":$tid}},"version":1}""")
        .getBytes("UTF-8")
    def jobEntry(jid: Long, tpe: Int, q: String, ts: Long,
                 sc: String = "app", tb: String = "t", tid: Long = 900L): Seq[Row] = {
      val (k, v) = DdlJobParser.encodeJobEntry(jid, jobJson(jid, tpe, q, ts, sc, tb, tid), tpe)
      Seq(Row(k, v, null, "put", "committed", ts - 1L, ts, 0L))
    }
    def rowPair(tid: Long, id: Long, cells: Seq[(Long, Long)], commitTs: Long): Seq[Row] = {
      val k = TiKvCodec.encodeRecordKey(tid, TiKvCodec.IntHandle(id))
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
    // f1: CREATE app.t + a FILTERED-OUT foreign table with a DIFFERENT
    // column shape riding the same wire (other.x) + its row — the feed
    // must neither fail (shared-payload require) nor leak it
    writeFile(
      jobEntry(1L, 3, "CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L) ++
      jobEntry(10L, 3, "CREATE TABLE other.x (a VARCHAR(8))", 11L,
        sc = "other", tb = "x", tid = 700L) ++
      rowPair(700L, 9L, Seq(1L -> 99L), 40L) ++
      rowPair(900L, 1L, Seq(2L -> 10L), 50L) ++ rowPair(900L, 2L, Seq(2L -> 20L), 60L))
    // f2: ADD COLUMN at 100 + a post-DDL row carrying the new column
    writeFile(
      jobEntry(2L, 5, "ALTER TABLE app.t ADD COLUMN k BIGINT DEFAULT 7", 100L) ++
      rowPair(900L, 3L, Seq(2L -> 30L, 3L -> 33L), 150L))

    val q = Changefeed.runMqFromRaw2pcEvolving(spark, feedCfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      SchemaStore(), s"$tmp/sink", s"$tmp/ckpt", matcherGcMs = 600000L)
    q.awaitTermination(180000)
    if (q.isActive) q.stop()

    val sunk = spark.read.parquet(s"$tmp/sink")
    // 1) the DDLs are ON THE WIRE: CREATE at 10, ALTER at 100 — and
    //    the foreign CREATE (other.x, filtered out) is NOT
    val ddls = MqConsume.wireDdls(sunk.select(col("_value")))
    assert(ddls.map(_._1) == Seq(10L, 100L), s"wire DDLs: $ddls")
    assert(ddls(1)._4 == "ALTER TABLE app.t ADD COLUMN k BIGINT DEFAULT 7")
    assert(!ddls.exists(_._2 == "other"), "a discarded DDL must not emit")
    // 2) DDL-before-row in consumer replay order: the ALTER's commit
    //    ts precedes the first post-DDL row's, and the DDL row rides
    //    _kind=ddl so equal-ts replay applies DDL first
    val ddlTs = sunk.filter(col("_kind") === "ddl")
      .agg(max(col("_commit_ts"))).head().getLong(0)
    val postDdlMin = sunk.filter(col("_kind") === "row" &&
      col("_value").contains("\"k\":\"33\""))
      .agg(min(col("_commit_ts"))).head().getLong(0)
    assert(ddlTs == 100L && postDdlMin == 150L && ddlTs < postDdlMin,
      s"DDL($ddlTs) must precede the first post-DDL row($postDdlMin)")
    // 3) the handshake re-sent WITH the live post-DDL schema in the
    //    DDL's own batch (version change beat both cadence windows)
    val boots = sunk.filter(col("_kind") === "bootstrap")
      .select("_value").collect().map(_.getString(0)).toSeq
    assert(boots.count(_.contains("\"table\":\"t\"")) >= 2,
      s"version change must re-send the handshake: $boots")
    val live = boots.filter(_.contains("\"version\":100"))
    assert(live.nonEmpty && live.forall(b =>
      b.contains("\"name\":\"k\"") && b.contains("\"default\":\"7\"") &&
        b.contains("\"tableID\":900")),
      s"the re-sent handshake carries the post-DDL live schema: $boots")
    assert(boots.exists(b => b.contains("\"version\":10") && !b.contains("\"name\":\"k\"")),
      "the first handshake carried the pre-DDL shape")
    assert(!boots.exists(_.contains("\"table\":\"x\"")), "no handshake for a filtered table")
    // 4) a consumer decodes post-DDL rows with ONLY wire-learned
    //    schema: handshake → column list → generic simple decode
    val wire = MqConsume.bootstrapSchemas(sunk.select(col("_value")))
    assert(wire(("app", "t"))._1.map(_._1) == Seq("id", "v", "k") &&
      wire(("app", "t"))._2 == Seq("id"), s"wire-learned: $wire")
    val image = StructType(wire(("app", "t"))._1.map {
      case (n, "BIGINT") => StructField(n, LongType)
      case (n, _) => StructField(n, StringType)
    })
    val decoded = graft.functions.Decoders.decodeSimpleFor(
      MqConsume.dataMessagesOnly(
        sunk.filter(col("_kind") === "row")
          .select(col("_value"), lit(null).cast("string").as("_key"))), image)
      .select(col("after.id"), col("after.k")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(decoded(3L) == Some(33L), s"post-DDL row decodes k=33: $decoded")
    assert(decoded(1L).isEmpty, s"pre-DDL-shipped row has no k on the wire: $decoded")
    assert(!decoded.contains(9L), "the filtered foreign table's row never shipped")
  }

  test("heterogeneous shapes in ONE evolving feed (fused wire): two tables " +
      "with DIFFERENT column sets ride one raw-2PC stream, and the wire " +
      "equals the two per-table struct feeds' union byte-for-byte") {
    import graft.operators.RawKvMounter
    import graft.operators.RawKvMounter.{KvColumn, KvTableMeta}
    import graft.streaming.TxnMatcher
    import org.apache.spark.sql.Row

    val tmp = Files.createTempDirectory("graft-cf-fused").toString
    val srcDir = s"$tmp/src"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def jobJson(jid: Long, q: String, ts: Long, sc: String, tb: String,
                tid: Long): Array[Byte] =
      (s"""{"id":$jid,"type":3,"schema_id":1,"table_id":$tid,""" +
        s""""schema_name":"$sc","table_name":"$tb","state":4,""" +
        s""""query":"$q","binlog":{"SchemaVersion":$ts,"TableInfo":{"id":$tid}},""" +
        s""""version":1}""").getBytes("UTF-8")
    def jobEntry(jid: Long, q: String, ts: Long, sc: String, tb: String,
                 tid: Long): Seq[Row] = {
      val (k, v) = DdlJobParser.encodeJobEntry(jid, jobJson(jid, q, ts, sc, tb, tid), 3)
      Seq(Row(k, v, null, "put", "committed", ts - 1L, ts, 0L))
    }
    val metaT = KvTableMeta(900L, "app", "t",
      Seq(KvColumn(1L, "id", "bigint", nullable = false),
        KvColumn(2L, "v", "bigint")), handleCol = "id")
    val metaU = KvTableMeta(910L, "app", "u",
      Seq(KvColumn(1L, "id", "bigint", nullable = false),
        KvColumn(2L, "label", "varchar(32)")), handleCol = "id")
    def rowPair(m: KvTableMeta, id: Long, payload: Seq[Any], cts: Long): Seq[Row] = {
      val k = TiKvCodec.encodeRecordKey(m.tableId, TiKvCodec.IntHandle(id))
      val v = RawKvMounter.encodeImage(m, payload)
      Seq(
        Row(k, v, null, "put", "prewrite", cts - 1L, 0L, 0L),
        Row(k, null, null, "put", "commit", cts - 1L, cts, 0L))
    }
    val metaT2 = metaT.copy(columns =
      metaT.columns :+ KvColumn(3L, "k", "bigint", default = Some("7")))
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
    writeFile(
      jobEntry(1L, "CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L, "app", "t", 900L) ++
      jobEntry(2L, "CREATE TABLE app.u (id BIGINT, label VARCHAR(32))", 11L, "app", "u", 910L) ++
      rowPair(metaT, 1L, Seq(1L, 10L), 50L) ++
      rowPair(metaU, 1L, Seq(1L, "alpha"), 55L) ++
      rowPair(metaT, 2L, Seq(2L, 20L), 60L))
    // a mid-stream ALTER on ONE of the shapes: the fused path evolves
    // per table — batch-2 t rows render with k, u rows untouched
    writeFile({
      val (k, v) = DdlJobParser.encodeJobEntry(5L,
        (s"""{"id":5,"type":5,"schema_id":1,"table_id":900,""" +
          s""""schema_name":"app","table_name":"t","state":4,""" +
          s""""query":"ALTER TABLE app.t ADD COLUMN k BIGINT DEFAULT 7",""" +
          s""""binlog":{"SchemaVersion":100,"TableInfo":{"id":900}},""" +
          s""""version":1}""").getBytes("UTF-8"), 5)
      Seq(Row(k, v, null, "put", "committed", 99L, 100L, 0L))
    } ++ rowPair(metaT2, 3L, Seq(3L, 30L, 33L), 150L))

    val cfg = ChangefeedConfig(id = "cf-fused",
      filter = FilterConfig(rules = Seq("app.*")), handleKeys = Seq("id"),
      sink = SinkConfig(protocol = Protocol.CanalJson, numPartitions = 2))
    // WITHOUT fused wire this feed is impossible: the shared-payload
    // require trips on the two shapes
    val q = Changefeed.runMqFromRaw2pcEvolving(spark, cfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      SchemaStore(), s"$tmp/sink", s"$tmp/ckpt",
      matcherGcMs = 600000L, fusedWire = true)
    q.awaitTermination(180000)
    if (q.isActive) q.stop()

    val got = spark.read.parquet(s"$tmp/sink").filter(col("_kind") === "row")
      .select("_value").collect().map(_.getString(0)).toSet
    // golden: each table mounted struct-shaped on its own (versioned
    // for the ALTERed one, per batch knowledge horizon), then the
    // columnar generic canal encoder — the per-table feeds' union
    val rawSchema = org.apache.spark.sql.types.StructType(
      TxnMatcher.committedSchema.fields)
    def committed(m: KvTableMeta, rows: Seq[(Long, Seq[Any], Long)]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows.map {
        case (id, p, cts) =>
          Row(TiKvCodec.encodeRecordKey(m.tableId, TiKvCodec.IntHandle(id)),
            RawKvMounter.encodeImage(m, p), null, "put", cts - 1L, cts)
      }, 1), rawSchema)
    def feed(m: KvTableMeta, rows: Seq[(Long, Seq[Any], Long)]) =
      graft.functions.Codecs.canalJsonFor(
          RawKvMounter.mountTables(committed(m, rows), Seq(m)), m.handleCols)
        .select("_value").collect().map(_.getString(0)).toSet
    def feedVersioned(rows: Seq[(Long, Seq[Any], Long)], enc: KvTableMeta) =
      graft.functions.Codecs.canalJsonFor(
          RawKvMounter.mountTableVersioned(committed(enc, rows),
            Seq(10L -> metaT, 100L -> metaT2))
            .withColumn("_row_id", col("after.id")), Seq("id"))
        .select("_value").collect().map(_.getString(0)).toSet
    val expected =
      feed(metaT, Seq((1L, Seq(1L, 10L), 50L), (2L, Seq(2L, 20L), 60L))) ++
      feed(metaU, Seq((1L, Seq(1L, "alpha"), 55L))) ++
      feedVersioned(Seq((3L, Seq(3L, 30L, 33L), 150L)), metaT2)
    assert(got == expected,
      s"fused wire must equal the per-table union:\nonly-fused ${got.diff(expected)}" +
        s"\nonly-expected ${expected.diff(got)}")
    // both CREATEs AND the ALTER shipped as (canal-form) DDL messages
    assert(MqConsume.wireDdls(spark.read.parquet(s"$tmp/sink")
      .select(col("_value"))).map(_._3) == Seq("t", "u", "t"))
  }

  test("heterogeneous shapes on the STRUCT path: the evolving MQ feed splits " +
      "the plan into payload-shape groups, runs the full pipeline per group, " +
      "and sinks ONE batch (one resolved message set) — wire equals the " +
      "per-table feeds' union") {
    import graft.operators.RawKvMounter
    import graft.operators.RawKvMounter.{KvColumn, KvTableMeta}
    import graft.streaming.TxnMatcher
    import org.apache.spark.sql.Row

    val tmp = Files.createTempDirectory("graft-cf-hetero-struct").toString
    val srcDir = s"$tmp/src"
    def jobEntry(jid: Long, q: String, ts: Long, tb: String, tid: Long): Seq[Row] = {
      val meta = (s"""{"id":$jid,"type":3,"schema_id":1,"table_id":$tid,""" +
        s""""schema_name":"app","table_name":"$tb","state":4,""" +
        s""""query":"$q","binlog":{"SchemaVersion":$ts,"TableInfo":{"id":$tid}},""" +
        s""""version":1}""").getBytes("UTF-8")
      val (k, v) = DdlJobParser.encodeJobEntry(jid, meta, 3)
      Seq(Row(k, v, null, "put", "committed", ts - 1L, ts, 0L))
    }
    val metaT = KvTableMeta(900L, "app", "t",
      Seq(KvColumn(1L, "id", "bigint", nullable = false),
        KvColumn(2L, "v", "bigint")), handleCol = "id")
    val metaU = KvTableMeta(910L, "app", "u",
      Seq(KvColumn(1L, "id", "bigint", nullable = false),
        KvColumn(2L, "label", "varchar(32)")), handleCol = "id")
    def pair(m: KvTableMeta, id: Long, p: Seq[Any], cts: Long): Seq[Row] = {
      val k = TiKvCodec.encodeRecordKey(m.tableId, TiKvCodec.IntHandle(id))
      Seq(
        Row(k, RawKvMounter.encodeImage(m, p), null, "put", "prewrite", cts - 1L, 0L, 0L),
        Row(k, null, null, "put", "commit", cts - 1L, cts, 0L))
    }
    val all =
      jobEntry(1L, "CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L, "t", 900L) ++
      jobEntry(2L, "CREATE TABLE app.u (id BIGINT, label VARCHAR(32))", 11L, "u", 910L) ++
      pair(metaT, 1L, Seq(1L, 10L), 50L) ++
      pair(metaU, 1L, Seq(1L, "alpha"), 55L) ++
      pair(metaT, 2L, Seq(2L, 20L), 60L)
    spark.createDataFrame(
      spark.sparkContext.parallelize(all, 1), TxnMatcher.uncommittedSchema)
      .coalesce(1).write.parquet(srcDir)

    val cfg = ChangefeedConfig(id = "cf-hetero-struct",
      filter = FilterConfig(rules = Seq("app.*")), handleKeys = Seq("id"),
      sink = SinkConfig(protocol = Protocol.CanalJson, numPartitions = 2))
    val q = Changefeed.runMqFromRaw2pcEvolving(spark, cfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema).parquet(srcDir),
      SchemaStore(), s"$tmp/sink", s"$tmp/ckpt", matcherGcMs = 600000L)
    q.awaitTermination(120000)
    if (q.isActive) q.stop()

    val sunk = spark.read.parquet(s"$tmp/sink")
    val got = sunk.filter(col("_kind") === "row")
      .select("_value").collect().map(_.getString(0)).toSet
    val rawSchema = org.apache.spark.sql.types.StructType(
      TxnMatcher.committedSchema.fields)
    def feed(m: KvTableMeta, rows: Seq[(Long, Seq[Any], Long)]) =
      graft.functions.Codecs.canalJsonFor(
          RawKvMounter.mountTables(
            spark.createDataFrame(spark.sparkContext.parallelize(rows.map {
              case (id, p, cts) =>
                Row(TiKvCodec.encodeRecordKey(m.tableId, TiKvCodec.IntHandle(id)),
                  RawKvMounter.encodeImage(m, p), null, "put", cts - 1L, cts)
            }, 1), rawSchema), Seq(m)), m.handleCols)
        .select("_value").collect().map(_.getString(0)).toSet
    val expected =
      feed(metaT, Seq((1L, Seq(1L, 10L), 50L), (2L, Seq(2L, 20L), 60L))) ++
      feed(metaU, Seq((1L, Seq(1L, "alpha"), 55L)))
    assert(got == expected,
      s"struct-path hetero wire must equal the per-table union:\n" +
        s"only-got ${got.diff(expected)}\nonly-exp ${expected.diff(got)}")
    // ONE batch → exactly numPartitions resolved messages, covering
    // BOTH shape groups' rows (the union sinks once)
    val resolved = sunk.filter(col("_kind") === "resolved")
    assert(resolved.count() == cfg.sink.numPartitions.toLong,
      s"one resolved set per batch: ${resolved.count()}")
    assert(resolved.agg(max(col("_commit_ts"))).head().getLong(0) == 60L)
  }

  test("raw-2PC -> MySQL evolving composition: a wire CREATE builds the " +
      "downstream table, a mid-stream ALTER executes there under ddl_ts_v1 " +
      "bookkeeping BEFORE the batch's rows, Derby state converges to the " +
      "workload model, and a kill-restart across the DDL boundary replays " +
      "idempotently (ddl_reentrant)") {
    import graft.streaming.{Failpoints, TxnMatcher}
    import org.apache.spark.sql.Row

    import graft.operators.RawKvMounter
    import graft.operators.RawKvMounter.{KvColumn, KvTableMeta}
    val tmp = Files.createTempDirectory("graft-cf-evolve-mysql").toString
    val srcDir = s"$tmp/src"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def jobJson(jid: Long, tpe: Int, q: String, ts: Long, tb: String,
                tid: Long): Array[Byte] =
      (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":$tid,""" +
        s""""schema_name":"app","table_name":"$tb","state":4,""" +
        s""""query":"$q","binlog":{"SchemaVersion":$ts,"TableInfo":{"id":$tid}},""" +
        s""""version":1}""").getBytes("UTF-8")
    def jobEntry(jid: Long, tpe: Int, q: String, ts: Long, tb: String = "t",
                 tid: Long = 900L): Seq[Row] = {
      val (k, v) = DdlJobParser.encodeJobEntry(jid, jobJson(jid, tpe, q, ts, tb, tid), tpe)
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
    // a SECOND table with a DIFFERENT shape riding the same feed — the
    // per-shape-group mount+apply path
    val metaU = KvTableMeta(910L, "app", "u",
      Seq(KvColumn(1L, "id", "bigint", nullable = false),
        KvColumn(2L, "label", "varchar(32)")), handleCol = "id")
    def rowPairU(id: Long, label: String, commitTs: Long): Seq[Row] = {
      val k = TiKvCodec.encodeRecordKey(910L, TiKvCodec.IntHandle(id))
      val v = RawKvMounter.encodeImage(metaU, Seq(id, label))
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
    writeFile(jobEntry(1L, 3, "CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L) ++
      jobEntry(3L, 3, "CREATE TABLE app.u (id BIGINT, label VARCHAR(32))", 11L,
        tb = "u", tid = 910L) ++
      rowPair(1L, Seq(2L -> 10L), 50L) ++ rowPair(2L, Seq(2L -> 20L), 60L) ++
      rowPairU(1L, "alpha", 55L))
    writeFile(jobEntry(2L, 5, "ALTER TABLE app.t ADD COLUMN k BIGINT DEFAULT 7", 100L) ++
      rowPair(3L, Seq(2L -> 30L, 3L -> 33L), 150L))

    val applier = graft.sinks.JdbcApplier.inMemory("evolve-mysql")
    // safe mode: a replayed batch re-delivers its rows (at-least-once)
    val cfg = ChangefeedConfig(id = "cf-evolve-mysql",
      filter = FilterConfig(rules = Seq("app.*")), handleKeys = Seq("id"),
      sink = SinkConfig(numPartitions = 2, safeMode = true))
    def start() = Changefeed.runMysqlFromRaw2pcEvolving(spark, cfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      SchemaStore(), s"$tmp/ckpt", applier, matcherGcMs = 600000L)

    // kill the SECOND batch AFTER its DDL executed but BEFORE its rows
    // applied, then drain on the same checkpoint: the replay
    // re-executes the ALTER (already took effect -> ignorable,
    // ddl_reentrant) and re-applies the rows (REPLACE)
    Failpoints.enable("graft/changefeed/evolve-mysql-post-ddl", "1*off->1*panic")
    var attempts = 0; var done = false
    while (!done && attempts < 6) {
      attempts += 1
      val q = start()
      try { q.awaitTermination(180000); done = true }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally { if (q.isActive) q.stop() }
    }
    Failpoints.clear()
    assert(done, "evolving MySQL feed failed to drain")
    assert(attempts >= 2, "the injected batch kill must force a restart")

    // downstream state == the workload model: pre-DDL rows picked up
    // the ALTER's default (Derby fills existing rows), the post-DDL
    // row carries its wire value
    assert(applier.tableRows("app", "t", Seq("id", "v", "k")) ==
      Seq(Seq(1L, 10L, 7L), Seq(2L, 20L, 7L), Seq(3L, 30L, 33L)))
    // the differently-shaped second table converged through its own
    // shape group (heterogeneous MySQL replication, one feed)
    assert(applier.tableRows("app", "u", Seq("id", "label")) ==
      Seq(Seq(1L, "alpha")))
    // ddl_ts bookkeeping advanced to the ALTER's finishedTs
    assert(applier.tableRows("tidb_cdc", "ddl_ts_v1", Seq("changefeed", "ddl_ts"))
      == Seq(Seq("cf-evolve-mysql", 100L)))
    // the replayed ALTER hit the already-took-effect path, not a failure
    assert(!applier.ignoredDdlErrors.isEmpty,
      "the replay must have re-executed the DDL and swallowed the " +
        "duplicate-column error (ddl_reentrant)")
  }

  test("evolving MySQL downstream DDL: a wire CREATE with PRIMARY KEY on a " +
      "NON-first column registers the real pk (REPLACE keys on it under " +
      "safe-mode replay), and mid-stream RENAME COLUMN + MODIFY COLUMN " +
      "execute downstream so post-DDL DML converges") {
    import graft.streaming.{Failpoints, TxnMatcher}
    import org.apache.spark.sql.Row

    val tmp = Files.createTempDirectory("graft-cf-evolve-mysql-pk").toString
    val srcDir = s"$tmp/src"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def jobJson(jid: Long, tpe: Int, q: String, ts: Long): Array[Byte] =
      (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":920,""" +
        s""""schema_name":"app","table_name":"r","state":4,""" +
        s""""query":"$q","binlog":{"SchemaVersion":$ts,"TableInfo":{"id":920}},""" +
        s""""version":1}""").getBytes("UTF-8")
    def jobEntry(jid: Long, tpe: Int, q: String, ts: Long): Seq[Row] = {
      val (k, v) = DdlJobParser.encodeJobEntry(jid, jobJson(jid, tpe, q, ts), tpe)
      Seq(Row(k, v, null, "put", "committed", ts - 1L, ts, 0L))
    }
    // pk-is-handle on the SECOND column: the record key carries `id`,
    // the image carries only v (cid 1) and note/label (cid 3) — the
    // mount must route the key handle into `id`, not column 1
    def rowPair(id: Long, v: Long, text: String, commitTs: Long): Seq[Row] = {
      val k = TiKvCodec.encodeRecordKey(920L, TiKvCodec.IntHandle(id))
      val img = TiKvCodec.encodeV2(Seq(
        1L -> Some(TiKvCodec.intCell(v)),
        3L -> Some(TiKvCodec.encodeCell(text, "varchar"))))
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
    // two rows with the SAME v: if the downstream pk were wrongly
    // registered as column 1 (v), the safe-mode REPLACE translation's
    // pk delete would collapse them into one row
    writeFile(jobEntry(1L, 3,
      "CREATE TABLE app.r (v BIGINT, id BIGINT, note VARCHAR(8), PRIMARY KEY (id))",
      10L) ++
      rowPair(1L, 10L, "a", 50L) ++ rowPair(2L, 10L, "bb", 60L))
    // row-shape DDLs mid-stream: rename + varchar widen; the post-DDL
    // rows need BOTH in place downstream (the long label overflows the
    // original VARCHAR(8)), and the put on id=2 exercises REPLACE on
    // the real pk
    writeFile(jobEntry(2L, 12, "ALTER TABLE app.r RENAME COLUMN note TO label", 100L) ++
      jobEntry(3L, 12, "ALTER TABLE app.r MODIFY COLUMN label VARCHAR(64)", 110L) ++
      rowPair(3L, 30L, "a-label-well-past-eight-chars", 150L) ++
      rowPair(2L, 21L, "bb2", 160L))

    val applier = graft.sinks.JdbcApplier.inMemory("evolve-mysql-pk")
    val cfg = ChangefeedConfig(id = "cf-evolve-mysql-pk",
      filter = FilterConfig(rules = Seq("app.*")), handleKeys = Seq("id"),
      sink = SinkConfig(numPartitions = 2, safeMode = true))
    def start() = Changefeed.runMysqlFromRaw2pcEvolving(spark, cfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      SchemaStore(), s"$tmp/ckpt", applier, matcherGcMs = 600000L)

    // kill between the batch-2 DDL execution and its rows: the replay
    // re-runs RENAME COLUMN (already took effect -> ignorable) and the
    // MODIFY re-probe finds the target shape (no-op), then REPLACEs
    // the rows keyed on the real pk
    Failpoints.enable("graft/changefeed/evolve-mysql-post-ddl", "1*off->1*panic")
    var attempts = 0; var done = false
    while (!done && attempts < 6) {
      attempts += 1
      val q = start()
      try { q.awaitTermination(180000); done = true }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally { if (q.isActive) q.stop() }
    }
    Failpoints.clear()
    assert(done, "evolving MySQL pk feed failed to drain")
    assert(attempts >= 2, "the injected batch kill must force a restart")

    assert(applier.tableRows("app", "r", Seq("v", "id", "label")) ==
      Seq(Seq(10L, 1L, "a"), Seq(21L, 2L, "bb2"),
        Seq(30L, 3L, "a-label-well-past-eight-chars")),
      "non-first pk + rename + widen must converge (both v=10 rows " +
        "survive only when REPLACE keys on id)")
    assert(applier.tableRows("tidb_cdc", "ddl_ts_v1", Seq("changefeed", "ddl_ts"))
      == Seq(Seq("cf-evolve-mysql-pk", 110L)))
  }

  test("integrity circuit breaker on the evolving feed: EVERY checksummed " +
      "image failing downgrades to a WARNING (checksum-domain suspect) and " +
      "forwards; ONE bad image among verified-good ones still fails the " +
      "feed with ErrCorruptedDataMutation") {
    import graft.streaming.{SinkCounters, TxnMatcher}
    import org.apache.spark.sql.Row

    def jobJson(jid: Long, q: String, ts: Long): Array[Byte] =
      (s"""{"id":$jid,"type":3,"schema_id":1,"table_id":900,""" +
        s""""schema_name":"app","table_name":"t","state":4,""" +
        s""""query":"$q","binlog":{"SchemaVersion":$ts,"TableInfo":{"id":900}},""" +
        s""""version":1}""").getBytes("UTF-8")
    def rowPairCk(id: Long, cells: Seq[(Long, Long)], commitTs: Long,
                  corrupt: Boolean): Seq[Row] = {
      val k = TiKvCodec.encodeRecordKey(900L, TiKvCodec.IntHandle(id))
      val v = TiKvCodec.encodeV2RawChecksummed(
        cells.map { case (cid, x) => cid -> Some(TiKvCodec.intCell(x)) }, k,
        version = 1, corrupt = corrupt)
      Seq(
        Row(k, v, null, "put", "prewrite", commitTs - 1L, 0L, 0L),
        Row(k, null, null, "put", "commit", commitTs - 1L, commitTs, 0L))
    }
    def drive(name: String, rows: Seq[Row]) = {
      val tmp = Files.createTempDirectory(s"graft-ck-$name").toString
      val srcDir = s"$tmp/src" // the parquet write creates it
      val (k, v) = DdlJobParser.encodeJobEntry(1L,
        jobJson(1L, "CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L), 3)
      val all = Seq(Row(k, v, null, "put", "committed", 9L, 10L, 0L)) ++ rows
      spark.createDataFrame(
        spark.sparkContext.parallelize(all, 1), TxnMatcher.uncommittedSchema)
        .coalesce(1).write.parquet(srcDir)
      val cfg = ChangefeedConfig(id = s"cf-ck-$name",
        filter = FilterConfig(rules = Seq("app.*")), handleKeys = Seq("id"),
        sink = SinkConfig(protocol = Protocol.CanalJson, numPartitions = 2),
        integrity = IntegrityConfig(
          integrityCheckLevel = "correctness", corruptionHandleLevel = "error"))
      val q = Changefeed.runMqFromRaw2pcEvolving(spark, cfg,
        spark.readStream.schema(TxnMatcher.uncommittedSchema).parquet(srcDir),
        SchemaStore(), s"$tmp/sink", s"$tmp/ckpt", matcherGcMs = 600000L)
      try q.awaitTermination(120000) finally { if (q.isActive) q.stop() }
      (cfg.id, s"$tmp/sink")
    }

    // ALL checksummed images fail → the domain-suspect circuit trips:
    // the feed survives, warns, and forwards every row (warn semantics)
    SinkCounters.clear()
    val (allBadId, allBadSink) = drive("allbad",
      rowPairCk(1L, Seq(1L -> 1L, 2L -> 10L), 50L, corrupt = true) ++
        rowPairCk(2L, Seq(1L -> 2L, 2L -> 20L), 60L, corrupt = true))
    val warn = SinkCounters.warningFor(allBadId)
    assert(warn.exists(_.code == "CDC:ErrChecksumDomainSuspect"),
      s"all-mismatch must warn, not fail: $warn")
    assert(spark.read.parquet(allBadSink).filter(col("_kind") === "row")
      .count() == 2L, "warn semantics forward the rows")
    // and the warning code is NOT in the unretryable fast-fail set —
    // a backoff keeps the feed alive on it
    assert(!graft.streaming.FeedBackoff.defaultFastFailCodes
      .contains("CDC:ErrChecksumDomainSuspect"))

    // ONE corrupted image among verified-good ones → real corruption:
    // the unretryable CDC error still kills the feed
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drive("onebad",
        rowPairCk(1L, Seq(1L -> 1L, 2L -> 10L), 50L, corrupt = false) ++
          rowPairCk(2L, Seq(1L -> 2L, 2L -> 20L), 60L, corrupt = true))
    }
    assert(rootMessages(e).exists(_.contains("CDC:ErrCorruptedDataMutation")),
      rootMessages(e).mkString(" | "))
  }

  test("live barrier loop compacts at the checkpoint floor: a 200-DDL-churn " +
      "feed stays bounded per batch, output is identical across the " +
      "compaction, and a kill-restart replays correctly (schemastore GC " +
      "wired into the loop, not just available)") {
    import graft.streaming.{DdlBarrier, Failpoints}
    import graft.model.DdlAction._
    val tmp = Files.createTempDirectory("graft-cf-compact").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Seq("a", "b").foreach { n =>
      Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$src/events-$n.parquet"))
    }
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val cut = env.select("_commit_ts").orderBy("_commit_ts")
      .collect().map(_.getLong(0)).apply(500)
    val initial = SchemaRegistry().applyAll((0 until 4).map(i =>
      CreateTable("app", s"events_$i",
        Seq(ColumnDef("user_id", "bigint"), ColumnDef("value", "double")), 0L)))
    // a YEAR of DDL below the stream: 200 churn versions plus a dead
    // table (created + dropped entirely below the checkpoint floor),
    // then one real mid-stream AddColumn
    val churn: Seq[DdlAction] =
      (1 to 200).flatMap(i => Seq[DdlAction](
        AddColumn("app", "events_1", ColumnDef(s"c$i", "bigint"), i.toLong * 2),
        DropColumn("app", "events_1", s"c$i", i.toLong * 2 + 1))) ++
      Seq(CreateTable("app", "ephemeral", Seq(ColumnDef("id", "bigint")), 10L),
        DropTable("app", "ephemeral", 20L),
        AddColumn("app", "events_0", ColumnDef("k", "bigint", Some("42")), cut))
    // the boundedness claim, at the exact call the loop now makes:
    // compacting at any mid-stream floor leaves 1 floor version per
    // table + the still-pending DDLs, whatever the feed's age
    val (compacted, pendingAfter) = DdlBarrier.compact(initial, churn, cut - 1)
    assert(compacted.versionCount <= initial.versionCount + 1,
      s"compacted registry must stay floor-sized: ${compacted.versionCount}")
    assert(pendingAfter.size == 1, "only the mid-stream DDL stays pending")
    assert(!compacted.versions.contains(("app", "ephemeral")),
      "a table dead below the floor is fully collected")

    val ddlCfg = ChangefeedConfig(id = "cf-compact",
      splitUpdateOnKeyChange = false, maxFilesPerTrigger = Some(1))
    def drive(id: String, outDir: String, ckpt: String): Int = {
      Files.createDirectories(java.nio.file.Paths.get(outDir))
      var attempts = 0; var done = false
      while (!done && attempts < 6) {
        attempts += 1
        val q = Changefeed.runWithDdl(spark, ddlCfg.copy(id = id), src, ckpt,
          churn, initial, payloadCols = Seq("user_id", "value")) { (step, _) =>
          step.write.mode("append").parquet(outDir)
        }
        try { q.awaitTermination(120000); done = true }
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
        finally { if (q.isActive) q.stop() }
      }
      assert(done, s"$id failed to drain"); attempts
    }
    // golden: chaos-free
    Failpoints.clear()
    drive("cf-compact-golden", s"$tmp/golden", s"$tmp/ckpt-g")
    // chaos: kill the SECOND batch once (after the first batch's
    // compaction floor advanced), then resume on the same checkpoint
    Failpoints.enable("graft/ddl/pre-barrier", "1*off->1*panic")
    val attempts = drive("cf-compact-chaos", s"$tmp/out", s"$tmp/ckpt")
    Failpoints.clear()
    assert(attempts >= 2, "the injected kill must force a restart")
    val golden = spark.read.option("mergeSchema", "true").parquet(s"$tmp/golden")
    val out = spark.read.option("mergeSchema", "true").parquet(s"$tmp/out")
    val cols = golden.columns.sorted.map(col(_))
    assert(out.select(cols: _*).distinct().exceptAll(
      golden.select(cols: _*).distinct()).count() == 0 &&
      golden.select(cols: _*).distinct().exceptAll(
        out.select(cols: _*).distinct()).count() == 0,
      "restart across a compaction must reproduce the chaos-free output")
    // the mid-stream DDL semantics survive compaction + restart
    assert(out.filter(col("_commit_ts") < cut && col("k").isNotNull).count() == 0)
    assert(out.filter(col("_commit_ts") >= cut && col("_table") === "events_0")
      .filter(col("k") =!= 42L || col("k").isNull).count() == 0)
  }
}
