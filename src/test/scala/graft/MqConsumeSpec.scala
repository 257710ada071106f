package graft

import graft.functions.Codecs
import graft.sinks.{FileMq, StorageSink}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end consumer harness (VERDICT r5 item #4): encode a fixture
  * envelope with every wire protocol, persist through the MQ/storage
  * stores, then run [[MqConsume.run]] — auto-detect, decode, re-apply
  * via real JDBC, sync-diff — and require a clean diff for all six
  * protocols plus the storage path and the upstream-envelope diff.
  * This is the reference's primary e2e verification pattern
  * (cmd/kafka-consumer + check_sync_diff) as one runnable tool.
  */
class MqConsumeSpec extends SparkFunSuite {

  private def mkEnv(rows: Seq[(Long, String, Long, Double, Long)]): DataFrame = {
    import spark.implicits._
    val base = rows.toDF("_row_id", "_op", "user_id", "value", "k")
      .withColumn("_schema", lit("app"))
      .withColumn("_table", concat(lit("t"), pmod(col("user_id"), lit(2L))))
      .withColumn("_commit_ts", lit(1700000000000000000L) + col("_row_id") * 1000000L)
      .withColumn("_start_ts", col("_commit_ts") - 1L)
    val img = struct(col("user_id"), col("value"), col("k"))
    val pre = struct(col("user_id"), (col("value") - 1.0).as("value"), (col("k") - 1L).as("k"))
    base.select(
      col("_row_id"), col("_schema"), col("_table"), col("_op"),
      col("_commit_ts"), col("_start_ts"),
      when(col("_op") === "I", lit(null)).otherwise(
        when(col("_op") === "D", img).otherwise(pre)).as("before"),
      when(col("_op") === "D", lit(null)).otherwise(img).as("after"))
  }

  private val env = mkEnv(Seq(
    (1L, "I", 1L, 10.0, 100L),
    (2L, "U", 1L, 11.0, 101L),
    (3L, "I", 2L, 20.0, 200L),
    (4L, "I", 3L, 30.0, 300L),
    (5L, "D", 3L, 30.0, 300L),
    (6L, "I", 4L, 40.0, 400L),
    (7L, "U", 4L, 41.0, 401L),
    (8L, "I", 5L, 50.0, 500L)))

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"mqconsume-$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Encode + append to a FileMq dir as the kafka contract frame. */
  private def publish(encoded: DataFrame, dir: String): Unit = {
    val hasImages = encoded.columns.contains("after")
    val partCol =
      if (hasImages) pmod(coalesce(col("after.user_id"), col("before.user_id")), lit(2L))
      else pmod(col("_commit_ts"), lit(2L)) // txn-variant frame has no images
    val frame = encoded
      .withColumn("topic", lit("events"))
      .withColumn("partition", partCol.cast("int"))
      .select(col("topic"), col("partition"),
        (if (encoded.columns.contains("_key")) col("_key") else lit("")).cast("binary").as("key"),
        col("_value").cast("binary").as("value"))
    FileMq.append(frame, dir, batchSeq = 1L,
      orderBy = Seq(col("partition"), col("topic")))
  }

  private def checkProtocol(name: String, encoded: DataFrame,
                            expectProtocol: String,
                            upstream: DataFrame = env): Unit = {
    val dir = tmp(name)
    publish(encoded, dir)
    // upstream envelope parquet for the cross-system diff half
    val expectDir = tmp(s"$name-expect")
    upstream.write.mode("overwrite").parquet(expectDir)
    val s = MqConsume.run(spark, dir, source = "mq", protocol = "auto",
      dbName = s"mqc_$name", expect = Some(expectDir))
    assert(s.protocol == expectProtocol, s"auto-detect for $name")
    assert(s.applied == 8L || expectProtocol == "canal-json-txn",
      s"all rows decoded for $name (got ${s.applied})")
    assert(s.tables == 2L)
    assert(s.diffs == 0L, s"stream-implied state diff for $name")
    assert(s.expectDiffs == 0L, s"upstream-envelope diff for $name")
  }

  test("canal-json end to end") {
    checkProtocol("canal", Codecs.canalJson(env), "canal-json")
  }

  test("canal-json TXN variant end to end") {
    // add a second insert (different key, same table) sharing row 6's
    // txn identity so at least one TXN message is genuinely multi-row
    // (single-row TXN messages are plain canal-json and decode
    // identically)
    val txnEnv = env.unionByName(
      mkEnv(Seq((9L, "I", 6L, 60.0, 600L)))
        .withColumn("_commit_ts", lit(1700000000000000000L) + 6L * 1000000L)
        .withColumn("_start_ts", col("_commit_ts") - 1L))
    checkProtocol("canaltxn", Codecs.canalJsonTxn(txnEnv), "canal-json-txn",
      upstream = txnEnv)
  }

  test("open protocol end to end") {
    checkProtocol("open", Codecs.openProtocol(env), "open")
  }

  test("debezium end to end") {
    checkProtocol("debezium", Codecs.debeziumJson(env), "debezium")
  }

  test("simple protocol end to end (bootstrap messages filtered)") {
    val msgs = Codecs.simpleProtocol(env)
      .select(col("_value"), col("after"), col("before"))
    val bootstrap = Codecs.bootstrapMessages(env)
      .select(col("_value"),
        lit(null).cast(msgs.schema("after").dataType).as("after"),
        lit(null).cast(msgs.schema("before").dataType).as("before"))
    checkProtocol("simple", msgs.unionByName(bootstrap), "simple")
  }

  test("csv end to end") {
    checkProtocol("csv", Codecs.csvLine(env), "csv")
  }

  test("simple-protocol changefeed emits WATERMARK controls the consumer filters") {
    val base = tmp("simple-feed")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/src"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$base/src/events.parquet"))
    val cfg = graft.model.ChangefeedConfig(id = "cf-simple",
      sink = graft.model.SinkConfig(protocol = graft.model.Protocol.Simple,
        fixtureRenderer = true))
    graft.streaming.Changefeed.runMq(
      spark, cfg, s"$base/src", s"$base/sink", s"$base/ckpt").awaitTermination(120000)
    val sunk = spark.read.parquet(s"$base/sink")
    // one WATERMARK per routing partition, the simple wire shape
    val controls = sunk.filter(col("_kind") === "resolved")
    assert(controls.count() == cfg.sink.numPartitions.toLong)
    val wm = controls.select("_value").head().getString(0)
    assert(wm.startsWith("{\"version\":1,\"type\":\"WATERMARK\",\"commitTs\":"), wm)
    // the consumer-side filter drops them; every data row decodes
    val rows = sunk.filter(col("_kind") === "row")
      .select(col("_value"), lit(null).cast("string").as("_key"))
    val kept = MqConsume.dataMessagesOnly(rows)
    assert(kept.count() == rows.count(), "data rows survive the control filter")
    assert(MqConsume.dataMessagesOnly(
      controls.select(col("_value"), lit(null).cast("string").as("_key"))).count() == 0L,
      "watermarks are filtered")
    val decoded = graft.functions.Decoders.decodeSimple(kept)
    assert(decoded.filter(col("_schema").isNull).count() == 0L)
    assert(decoded.count() == rows.count())
  }

  test("integrity correctness level: the feed carries the CRC32 block, the " +
      "consumer verifies it, and a tampered wire is caught (warn counts, " +
      "error stops)") {
    val base = tmp("integrity-e2e")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/src"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$base/src/events.parquet"))
    val cfg = graft.model.ChangefeedConfig(id = "cf-integrity",
      sink = graft.model.SinkConfig(protocol = graft.model.Protocol.Simple),
      integrity = graft.model.IntegrityConfig(
        integrityCheckLevel = "correctness"))
    graft.streaming.Changefeed.runMq(
      spark, cfg, s"$base/src", s"$base/sink", s"$base/ckpt").awaitTermination(120000)
    val rows = spark.read.parquet(s"$base/sink").filter(col("_kind") === "row")
    assert(rows.select("_value").head().getString(0)
      .contains("\"checksum\":{\"version\":1,\"corrupted\":false,\"current\":"))

    // clean wire verifies end-to-end through the consumer flag
    rows.select("_value").coalesce(1).write.text(s"$base/wire")
    val clean = MqConsume.run(spark, s"$base/wire", source = "storage",
      protocol = "simple", dbName = "int-clean", verifyChecksum = Some("warn"))
    assert(clean.corrupted == 0L && clean.diffs == 0L, clean)

    // tamper one money value inside the wire data image (pick a row
    // whose last decimal digit actually changes under the flip)
    val lines = spark.read.text(s"$base/wire").collect().map(_.getString(0))
    val re = "\"value\":\"(\\d+)\\.(\\d)[0-8]\""
    val idx = lines.indexWhere(l => l.contains("\"data\":{") &&
      re.r.findFirstIn(l).isDefined)
    assert(idx >= 0, "no tamperable money value found")
    val tampered = lines.updated(idx,
      lines(idx).replaceFirst(re, "\"value\":\"$1.$29\""))
    assert(tampered(idx) != lines(idx), "the tamper must change a digit")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/wire-bad.txt"),
      tampered.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/wire-bad"))
    java.nio.file.Files.move(java.nio.file.Paths.get(s"$base/wire-bad.txt"),
      java.nio.file.Paths.get(s"$base/wire-bad/part-00000.txt"))
    val warned = MqConsume.run(spark, s"$base/wire-bad", source = "storage",
      protocol = "simple", dbName = "int-warn", verifyChecksum = Some("warn"))
    assert(warned.corrupted == 1L, warned)
    // corruption-handle-level error: the consumer stops
    intercept[IllegalStateException] {
      MqConsume.run(spark, s"$base/wire-bad", source = "storage",
        protocol = "simple", dbName = "int-err", verifyChecksum = Some("error"))
    }
  }

  test("bootstrap re-send cadence: a mid-stream consumer gets a handshake " +
      "and decodes with wire-learned schema only") {
    val base = tmp("bootstrap-cadence")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/src"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$base/src/events.parquet"))
    // count-driven cadence: the interval can't elapse inside this test,
    // so every batch larger than 50 rows/table re-sends the handshake;
    // partition 0 only (send-bootstrap-to-all-partition = false)
    val cfg = graft.model.ChangefeedConfig(id = "cf-bootstrap",
      sink = graft.model.SinkConfig(protocol = graft.model.Protocol.Simple,
        fixtureRenderer = true,
        sendBootstrapIntervalInSec = 100000L,
        sendBootstrapInMsgCount = 50,
        sendBootstrapToAllPartition = false))
    graft.streaming.Changefeed.runMq(
      spark, cfg, s"$base/src", s"$base/sink", s"$base/ckpt").awaitTermination(120000)
    def sinkFiles(): Set[String] =
      new java.io.File(s"$base/sink").listFiles()
        .map(_.getName).filter(_.endsWith(".parquet")).toSet
    val firstBatchFiles = sinkFiles()

    // batch 1 handshakes every first-seen table, on partition 0 only
    val all1 = spark.read.parquet(s"$base/sink")
    val boots1 = all1.filter(col("_kind") === "bootstrap")
    assert(boots1.count() > 0, "first sight of a table handshakes immediately")
    assert(boots1.select("_partition").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(0L),
      "send-bootstrap-to-all-partition=false → partition 0 only")

    // more traffic → a consumer joining for batch 2 must still get a
    // handshake (each table's row count exceeds the 50-message window)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$base/src/events2.parquet"))
    graft.streaming.Changefeed.runMq(
      spark, cfg, s"$base/src", s"$base/sink", s"$base/ckpt").awaitTermination(120000)

    // THE MID-STREAM JOIN: the consumer sees only batch-2 output
    val newFiles = (sinkFiles() -- firstBatchFiles).toSeq
      .map(f => s"$base/sink/$f")
    assert(newFiles.nonEmpty)
    val slice = spark.read.parquet(newFiles: _*)
    val bootsSlice = slice.filter(col("_kind") === "bootstrap")
    assert(bootsSlice.count() > 0,
      "cadence re-sent the handshake inside the new consumer's window")

    // decode the slice with NOTHING but what's on the wire: schema,
    // columns, and primary key all come from the handshake message
    val wire = MqConsume.bootstrapSchemas(slice.select(col("_value")))
    val sliceTables = slice.filter(col("_kind") === "row")
      .select(col("_value")).transform(df =>
        graft.functions.Decoders.decodeSimple(df))
      .select(col("_schema"), col("_table")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(sliceTables.nonEmpty)
    sliceTables.foreach { st =>
      assert(wire.contains(st), s"wire-learned schema covers $st; got ${wire.keys}")
      val (cols, pk) = wire(st)
      assert(cols.map(_._1) == Seq("user_id", "value", "k"))
      assert(pk == Seq("user_id"))
    }
    // and the re-apply works end-to-end from those learned schemas
    val applier = graft.sinks.JdbcApplier.inMemory("mqc_bootstrap")
    sliceTables.foreach { case (s, t) =>
      val (cols, pk) = wire((s, t)); applier.createTable(s, t, cols, pk)
    }
    val env2 = MqConsume.decode(
      MqConsume.dataMessagesOnly(
        slice.filter(col("_kind") === "row")
          .select(col("_value"), lit(null).cast("string").as("_key"))),
      "simple")
    graft.sinks.MysqlSink.applyBatch(env2, Seq("user_id"),
      numWorkers = 2, safeMode = true)(
      graft.sinks.JdbcApplier.executeFor(applier.url))
    val applied = sliceTables.map { case (s, t) =>
      applier.tableRows(s, t, Seq("user_id")).size }.sum
    assert(applied > 0, "wire-learned DDL accepts the decoded rows")
  }

  test("send-all-bootstrap-at-start: every table handshakes before batch 1, " +
      "without double-sends") {
    val base = tmp("bootstrap-at-start")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/src"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$base/src/events.parquet"))
    val cfg = graft.model.ChangefeedConfig(id = "cf-bootstrap-start",
      sink = graft.model.SinkConfig(protocol = graft.model.Protocol.Simple,
        sendAllBootstrapAtStart = true,
        sendBootstrapToAllPartition = false,
        // wide cadence windows: only the at-start path may handshake
        sendBootstrapIntervalInSec = 100000L,
        sendBootstrapInMsgCount = 100000000))
    graft.streaming.Changefeed.runMq(
      spark, cfg, s"$base/src", s"$base/sink", s"$base/ckpt").awaitTermination(120000)
    val sunk = spark.read.parquet(s"$base/sink")
    val boots = sunk.filter(col("_kind") === "bootstrap")
    val tables = graft.model.Envelope.fromEvents(
      spark.read.parquet(s"$base/src"))
      .select(col("_schema"), col("_table")).distinct().count()
    assert(boots.count() == tables,
      s"exactly one handshake per table (${boots.count()} vs $tables): " +
        "at-start covered every table AND pre-registration stopped batch 1 " +
        "from re-sending")
  }

  test("bootstrapper cadence unit semantics (bootstraper.go)") {
    import graft.streaming.Bootstrapper
    val b = new Bootstrapper(intervalSec = 10L, msgCount = 100)
    val t0 = 1000000L
    // first sight → immediate, regardless of count
    assert(b.onBatch(Seq(("app", "t1") -> 1L), t0) == Seq(("app", "t1")))
    // below both windows → nothing
    assert(b.onBatch(Seq(("app", "t1") -> 50L), t0 + 1000).isEmpty)
    // count window trips (50 + 60 ≥ 100)
    assert(b.onBatch(Seq(("app", "t1") -> 60L), t0 + 2000) == Seq(("app", "t1")))
    // counter reset by the send; interval window trips on its own
    assert(b.onBatch(Seq(("app", "t1") -> 1L), t0 + 3000).isEmpty)
    assert(b.onBatch(Seq(("app", "t1") -> 1L), t0 + 13000) == Seq(("app", "t1")))
    // inactive table forgotten → handshakes immediately on return
    val b2 = new Bootstrapper(10L, 100, maxInactiveMs = 5000L)
    assert(b2.onBatch(Seq(("app", "t2") -> 1L), t0).nonEmpty)
    assert(b2.onBatch(Seq(("app", "t3") -> 1L), t0 + 20000L) == Seq(("app", "t3")))
    assert(b2.onBatch(Seq(("app", "t2") -> 1L), t0 + 21000L) == Seq(("app", "t2")),
      "t2 was gc'd while inactive, so its reappearance handshakes")
    // version-triggered re-send (bootstraper.go:259): a schema-version
    // change beats BOTH cadence windows; an unchanged version doesn't
    val bv = new Bootstrapper(intervalSec = 100000L, msgCount = 100000000)
    val k = ("app", "tv")
    assert(bv.onBatch(Seq(k -> 1L), t0, versions = Map(k -> 10L)) == Seq(k))
    assert(bv.onBatch(Seq(k -> 1L), t0 + 1000, versions = Map(k -> 10L)).isEmpty)
    assert(bv.onBatch(Seq(k -> 1L), t0 + 2000, versions = Map(k -> 99L)) == Seq(k),
      "a DDL's version bump must re-send within its own batch")
    assert(bv.onBatch(Seq(k -> 1L), t0 + 3000, versions = Map(k -> 99L)).isEmpty)
    // either knob ≤ 0 disables (the negative-disables rule)
    assert(!new Bootstrapper(-1L, 100).enabled)
    assert(!new Bootstrapper(10L, 0).enabled)
    assert(new Bootstrapper(-1L, 100).onBatch(Seq(("a", "b") -> 1L), t0).isEmpty)
    // send-all-at-start pre-registration
    val b3 = new Bootstrapper(10L, 100)
    assert(b3.bootstrapAll(Seq(("app", "x"), ("app", "y")), t0)
      == Seq(("app", "x"), ("app", "y")))
  }

  test("open-protocol claim-check e2e: pointer message → storage fetch → " +
      "full-fidelity recovery (open_protocol_claim_check)") {
    import graft.functions.{Codecs, Decoders, LargeMessage}
    val store = tmp("cc-open-store")
    val encoded = Codecs.openProtocol(env)
    // a threshold between min and max wire size → a MIXED stream of
    // plain messages and pointers
    val cut = encoded.agg(
      expr("percentile(length(_value), 0.5)")).head().getDouble(0).toInt
    val withCc = LargeMessage.openClaimCheck(encoded, cut, s"file://$store")
    val nPointers = withCc.filter(col("_large")).count()
    assert(nPointers > 0, "oversize messages became pointers")
    assert(withCc.filter(!col("_large")).count() > 0, "small messages untouched")
    // pointer key carries ohk:false + ccl (codec.go:55-57); pointer
    // value is handle-key-only
    val ptr = withCc.filter(col("_large")).select("_key", "_value").head()
    assert(ptr.getString(0).contains("\"ohk\":false,\"ccl\":\"file://"), ptr.getString(0))
    assert(!ptr.getString(1).contains("\"value\""), "pointer value is hk-only")

    // THE CONSUMER: follow ccl back to storage, then decode as if the
    // pointer never happened
    val restored = LargeMessage.resolveClaimChecks(
      withCc.select(col("_key"), col("_value")),
      get_json_object(col("_key"), "$.ccl"))
    val decoded = Decoders.decodeOpen(restored)
      .select(col("_schema"), col("_table"), col("_commit_ts"), col("_op"),
        col("before"), col("after"))
    val direct = Decoders.decodeOpen(encoded)
      .select(col("_schema"), col("_table"), col("_commit_ts"), col("_op"),
        col("before"), col("after"))
    assert(decoded.exceptAll(direct).count() == 0L &&
      direct.exceptAll(decoded).count() == 0L,
      "claim-check recovery is full-fidelity: decoded stream == original stream")
  }

  test("live handshake renders the DECLARED pk (non-first column) and " +
      "per-column nullability from the evolving store") {
    val store = graft.model.SchemaStore().applyAction(
      graft.model.DdlParser.parse(
        "CREATE TABLE app.r (v BIGINT, id BIGINT, note VARCHAR(8), PRIMARY KEY (id))",
        10L).get)
    val hs = graft.functions.Codecs.bootstrapValueFromStore(store, "app", "r")
    // the index block names the REAL pk, not column 1
    assert(hs.contains("\"columns\":[\"id\"]"), hs)
    assert(hs.contains("\"name\":\"id\",\"dataType\":{\"mysqlType\":\"bigint\"," +
      "\"charset\":\"binary\",\"collate\":\"binary\",\"length\":20},\"nullable\":false"), hs)
    assert(hs.contains("\"name\":\"v\",\"dataType\":{\"mysqlType\":\"bigint\"," +
      "\"charset\":\"binary\",\"collate\":\"binary\",\"length\":20},\"nullable\":true"), hs)
    // the consumer's wire-learned schema keys on it
    import spark.implicits._
    val learned = MqConsume.bootstrapSchemas(Seq(hs).toDF("_value"))
    assert(learned(("app", "r"))._2 == Seq("id"))
    assert(learned(("app", "r"))._1.map(_._1) == Seq("v", "id", "note"))
  }

  test("canal-json claim-check e2e: TiDB-extension pointer message → " +
      "storage fetch → full-fidelity recovery (canal_json_claim_check)") {
    import graft.functions.{Codecs, Decoders, LargeMessage}
    val store = tmp("cc-canal-store")
    val encoded = Codecs.canalJson(env)
    // threshold between min and max wire size → a MIXED stream of
    // plain canal messages and claim-check pointers
    val cut = encoded.agg(
      expr("percentile(length(_value), 0.5)")).head().getDouble(0).toInt
    val withCc = LargeMessage.canalClaimCheck(encoded, cut, s"file://$store")
    assert(withCc.filter(col("_large")).count() > 0, "oversize rows became pointers")
    assert(withCc.filter(!col("_large")).count() > 0, "small rows untouched")
    // the pointer is itself a VALID canal message: handle-key-only
    // data block + the _tidb extension carrying commitTs and
    // claimCheckLocation (canal_json_encoder.go:506-521)
    val ptr = withCc.filter(col("_large")).select("_value").head().getString(0)
    assert(ptr.contains("\"claimCheckLocation\":\"file://"), ptr)
    assert(ptr.contains("\"_tidb\":{\"commitTs\":"), ptr)
    assert(!ptr.contains("\"value\""), "pointer data block is handle-key-only")

    // THE CONSUMER: follow the extension's location back to storage,
    // then decode as if the pointer never happened
    val restored = LargeMessage.resolveClaimChecks(
      withCc.select(lit(null).cast("string").as("_key"), col("_value")),
      get_json_object(col("_value"), "$._tidb.claimCheckLocation"))
    val decoded = Decoders.decodeCanal(restored.select(col("_value")))
      .select(col("_schema"), col("_table"), col("_commit_ms"), col("_op"),
        col("before"), col("after"))
    val direct = Decoders.decodeCanal(encoded.select(col("_value")))
      .select(col("_schema"), col("_table"), col("_commit_ms"), col("_op"),
        col("before"), col("after"))
    assert(decoded.exceptAll(direct).count() == 0L &&
      direct.exceptAll(decoded).count() == 0L,
      "claim-check recovery is full-fidelity: decoded stream == original stream")
  }

  test("simple-protocol claim-check e2e over JSON and Avro " +
      "(kafka_simple_claim_check_avro)") {
    import graft.functions.{Codecs, Decoders, LargeMessage, SimpleAvro}
    // --- JSON form: pointer carries handleKeyOnly + claimCheckLocation
    val store = tmp("cc-simple-store")
    val encoded = Codecs.simpleProtocol(env)
    val cut = encoded.agg(
      expr("percentile(length(_value), 0.5)")).head().getDouble(0).toInt
    val withCc = LargeMessage.simpleClaimCheck(encoded, cut, s"file://$store")
    assert(withCc.filter(col("_large")).count() > 0)
    val ptr = withCc.filter(col("_large")).select("_value").head().getString(0)
    assert(ptr.contains("\"handleKeyOnly\":true"), ptr)
    assert(ptr.contains("\"claimCheckLocation\":\"file://"), ptr)
    val restored = LargeMessage.resolveClaimChecks(
      withCc.select(col("_value")),
      get_json_object(col("_value"), "$.claimCheckLocation"))
    val decoded = Decoders.decodeSimple(restored.select(col("_value")))
      .select(col("_schema"), col("_table"), col("_commit_ts"), col("_op"),
        col("before"), col("after"))
    val direct = Decoders.decodeSimple(encoded.select(col("_value")))
      .select(col("_schema"), col("_table"), col("_commit_ts"), col("_op"),
        col("before"), col("after"))
    assert(decoded.exceptAll(direct).count() == 0L &&
      direct.exceptAll(decoded).count() == 0L)

    // --- Avro form: the stored object wraps the FULL Avro message;
    // the stream message is a pointer with claimCheckLocation set
    import SimpleAvro.Val
    val full = SimpleAvro.encodeDml("UPDATE", "app", "t9", 9L,
      commitTs = 1700000001L, buildTs = 1700L, schemaVersion = 0L,
      data = Map("user_id" -> Val.L(42L), "value" -> Val.D(3.5), "k" -> Val.L(7L)),
      old = Map("user_id" -> Val.L(42L), "value" -> Val.D(2.5), "k" -> Val.L(7L)))
    val loc = s"file://$store/app/t9/avro-42.json"
    LargeMessage.storeClaimCheck(loc, Array.emptyByteArray, full)
    val pointer = SimpleAvro.encodeDml("UPDATE", "app", "t9", 9L,
      commitTs = 1700000001L, buildTs = 1700L, schemaVersion = 0L,
      data = Map("user_id" -> Val.L(42L)),
      handleKeyOnly = true, claimCheckLocation = Some(loc))
    // consumer: decode pointer, follow the location, decode the full
    // message from storage (simple/decoder.go:194-195)
    val pRec = SimpleAvro.decode(pointer)
    val pPayload = pRec.get("payload").asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(String.valueOf(pPayload.get("claimCheckLocation")) == loc)
    assert(pPayload.get("handleKeyOnly") == java.lang.Boolean.TRUE)
    val (_, storedBytes) = LargeMessage.fetchClaimCheck(
      String.valueOf(pPayload.get("claimCheckLocation")))
    assert(storedBytes.toSeq == full.toSeq, "stored Avro bytes survive the wrap")
    val fRec = SimpleAvro.decode(storedBytes)
    val fPayload = fRec.get("payload").asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(String.valueOf(fPayload.get("type")) == "UPDATE")
    val data = fPayload.get("data").asInstanceOf[java.util.Map[AnyRef, AnyRef]]
    val vals = scala.jdk.CollectionConverters.MapHasAsScala(data).asScala
      .map { case (k, v) => String.valueOf(k) -> v }.toMap
    assert(vals.contains("value") && vals.contains("k"),
      s"full fidelity recovered, not handle-key-only: ${vals.keys}")
  }

  test("protocol-faithful handle-key-only forms (open_protocol_handle_key_only, " +
      "kafka_simple_handle_key_only, canal_json_handle_key_only)") {
    import graft.functions.{Codecs, Decoders, LargeMessage}
    def cut(df: DataFrame): Int = df.agg(
      expr("percentile(length(_value), 0.5)")).head().getDouble(0).toInt

    // OPEN: key gains ohk:true, value shrinks to the handle key; the
    // decoder still yields a typed row (with only the key populated)
    val open = Codecs.openProtocol(env)
    val openHk = LargeMessage.openHandleKeyOnly(open, cut(open))
    assert(openHk.filter(col("_large")).count() > 0)
    val ok = openHk.filter(col("_large")).select("_key", "_value").head()
    assert(ok.getString(0).contains("\"ohk\":true"), ok.getString(0))
    assert(!ok.getString(1).contains("\"value\""), ok.getString(1))
    val openDec = Decoders.decodeOpen(openHk)
    assert(openDec.count() == env.count(), "every message still decodes")
    assert(openDec.filter(col("_schema").isNull).count() == 0L)

    // SIMPLE: handleKeyOnly:true + hk-only image, still a valid
    // simple message
    val simple = Codecs.simpleProtocol(env)
    val simpleHk = LargeMessage.simpleHandleKeyOnly(simple, cut(simple))
    val sv = simpleHk.filter(col("_large")).select("_value").head().getString(0)
    assert(sv.contains("\"handleKeyOnly\":true"), sv)
    assert(sv.contains("\"version\":1,\"database\":"), sv)
    val simpleDec = Decoders.decodeSimple(simpleHk.select(col("_value")))
    assert(simpleDec.count() == env.count())
    assert(simpleDec.filter(col("_schema").isNull).count() == 0L)

    // CANAL: full canal message, hk-only data, _tidb.onlyHandleKey
    val canal = Codecs.canalJson(env)
    val canalHk = LargeMessage.canalHandleKeyOnly(canal, cut(canal))
    val cv = canalHk.filter(col("_large")).select("_value").head().getString(0)
    assert(cv.contains("\"_tidb\":{\"commitTs\":"), cv)
    assert(cv.contains("\"onlyHandleKey\":true"), cv)
    val canalDec = Decoders.decodeCanal(canalHk.select(col("_value")))
    assert(canalDec.count() == env.count())
    assert(canalDec.filter(col("_schema").isNull).count() == 0L)

    // and THROUGH THE CHANGEFEED: the configured hk-only feed emits
    // the simple-protocol form
    val base = tmp("hk-feed")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/src"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$base/src/events.parquet"))
    val cfg = graft.model.ChangefeedConfig(id = "cf-hk",
      sink = graft.model.SinkConfig(protocol = graft.model.Protocol.Simple,
        fixtureRenderer = true,
        maxMessageBytes = 150,
        largeMessageHandle = graft.model.LargeMessageHandle(
          option = graft.model.LargeMessageHandle.OptionHandleKeyOnly)))
    graft.streaming.Changefeed.runMq(
      spark, cfg, s"$base/src", s"$base/sink", s"$base/ckpt").awaitTermination(120000)
    val hkRows = spark.read.parquet(s"$base/sink")
      .filter(col("_kind") === "row" && col("_value").contains("\"handleKeyOnly\":true"))
    assert(hkRows.count() > 0, "oversize rows re-encoded handle-key-only")
  }

  test("avro changefeed consumed END-TO-END by the standalone consumer: " +
      "schemas round-trip a REAL HTTP registry, wire DDLs build the " +
      "downstream, both eras decode by writer id, tombstones delete " +
      "(cmd/kafka-consumer avro arm over avro/decoder.go:680)") {
    import graft.streaming.{Changefeed, TxnMatcher}
    import graft.model._
    import org.apache.spark.sql.Row
    val stub = new graft.functions.HttpSchemaRegistry.Stub().start()
    try {
      val uri = stub.baseUrl
      graft.functions.AvroWire.dropRegistry(uri)
      val base = tmp("avro-consume")
      val srcDir = s"$base/src"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
      def jobJson(jid: Long, tpe: Int, q: String, ts: Long): Array[Byte] =
        (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":930,""" +
          s""""schema_name":"app","table_name":"t","state":4,""" +
          s""""query":"$q","binlog":{"SchemaVersion":$ts,"TableInfo":{"id":930}},""" +
          s""""version":1}""").getBytes("UTF-8")
      def jobEntry(jid: Long, tpe: Int, q: String, ts: Long): Seq[Row] = {
        val (k, v) = DdlJobParser.encodeJobEntry(jid, jobJson(jid, tpe, q, ts), tpe)
        Seq(Row(k, v, null, "put", "committed", ts - 1L, ts, 0L))
      }
      def putPair(id: Long, cells: Seq[(Long, Long)], commitTs: Long): Seq[Row] = {
        val k = TiKvCodec.encodeRecordKey(930L, TiKvCodec.IntHandle(id))
        val v = TiKvCodec.encodeV2(cells.map { case (cid, x) =>
          cid -> Some(TiKvCodec.intCell(x)) })
        Seq(
          Row(k, v, null, "put", "prewrite", commitTs - 1L, 0L, 0L),
          Row(k, null, null, "put", "commit", commitTs - 1L, commitTs, 0L))
      }
      def delPair(id: Long, cells: Seq[(Long, Long)], commitTs: Long): Seq[Row] = {
        val k = TiKvCodec.encodeRecordKey(930L, TiKvCodec.IntHandle(id))
        val old = TiKvCodec.encodeV2(cells.map { case (cid, x) =>
          cid -> Some(TiKvCodec.intCell(x)) })
        Seq(
          Row(k, null, old, "delete", "prewrite", commitTs - 1L, 0L, 0L),
          Row(k, null, null, "delete", "commit", commitTs - 1L, commitTs, 0L))
      }
      var fileSeq = 0
      def writeFile(rows: Seq[Row]): Unit = {
        fileSeq += 1
        val stage = s"$base/stage-$fileSeq"
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), TxnMatcher.uncommittedSchema)
          .coalesce(1).write.parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(srcDir, f"f$fileSeq%03d.parquet"))
      }
      writeFile(jobEntry(1L, 3,
        "CREATE TABLE app.t (id BIGINT, v BIGINT, PRIMARY KEY (id))", 10L) ++
        putPair(1L, Seq(2L -> 10L), 50L) ++ putPair(2L, Seq(2L -> 20L), 60L))
      writeFile(jobEntry(2L, 5,
        "ALTER TABLE app.t ADD COLUMN k BIGINT", 100L) ++
        putPair(3L, Seq(2L -> 30L, 3L -> 33L), 150L) ++
        delPair(2L, Seq(2L -> 20L), 160L))
      val cfg = ChangefeedConfig(id = "cf-avro-consume",
        filter = FilterConfig(rules = Seq("app.*")), handleKeys = Seq("id"),
        sink = SinkConfig(protocol = Protocol.Avro, numPartitions = 2,
          schemaRegistry = uri,
          // the standalone consumer learns tables from the 0x01 DDL
          // control events — shipped only under avro-enable-watermark
          avroEnableWatermark = true))
      val q = Changefeed.runMqFromRaw2pcEvolving(spark, cfg,
        spark.readStream.schema(TxnMatcher.uncommittedSchema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir),
        SchemaStore(), s"$base/sink", s"$base/ckpt", matcherGcMs = 600000L)
      try q.awaitTermination(180000) finally { if (q.isActive) q.stop() }
      assert(q.exception.isEmpty, s"feed must drain clean: ${q.exception}")

      // THE SEPARATE CONSUMER: drop the producer's in-JVM client cache
      // so every schema the consumer reads crosses the HTTP wire anew —
      // the second-process view the reference's kafka consumer has
      graft.functions.AvroWire.dropRegistry(uri)
      val served = stub.requestsServed
      val s = MqConsume.runAvro(spark, s"$base/sink", uri,
        topic = "cf-avro-consume", dbName = "avro_consume_e2e")
      assert(s.protocol == "avro" && s.tables == 1L, s)
      assert(s.applied == 4L, s"2 era-1 rows + 1 era-2 row + 1 tombstone: $s")
      assert(s.diffs == 0L, s"downstream must equal the stream-implied state: $s")
      assert(stub.requestsServed > served,
        "the consumer resolved writers over the real HTTP registry")
      // downstream truth: era-1 row fills the added column's default,
      // era-2 row carries it, the tombstoned key is GONE
      val db = graft.sinks.JdbcApplier.inMemory("avro_consume_e2e")
      assert(db.tableRows("app", "t", Seq("id", "v", "k")) ==
        Seq(Seq(1L, 10L, null), Seq(3L, 30L, 33L)),
        "both eras + tombstone converge on the real downstream")
      // and the auto-detector recognizes the frame wire as avro
      val one = spark.read.parquet(s"$base/sink")
        .filter(col("_kind") === "row").select("_value").head().getString(0)
      assert(MqConsume.detect(one) == "avro")
    } finally stub.stop()
  }

  test("simple protocol with encoding-format=avro end to end: the feed " +
      "ships avro BOOTSTRAP/DML/WATERMARK messages and the consumer decodes " +
      "with NOTHING but the wire-learned handshake schema " +
      "(kafka_simple_basic_avro)") {
    import graft.functions.{OpenBatch, SimpleAvro, SimpleAvroWire}
    import org.apache.spark.sql.types._
    val base = tmp("simple-avro-feed")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/src"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$base/src/events.parquet"))
    val cfg = graft.model.ChangefeedConfig(id = "cf-simple-avro",
      sink = graft.model.SinkConfig(protocol = graft.model.Protocol.Simple,
        encodingFormat = "avro", sendBootstrapToAllPartition = false))
    graft.streaming.Changefeed.runMq(
      spark, cfg, s"$base/src", s"$base/sink", s"$base/ckpt")
      .awaitTermination(120000)
    val sunk = spark.read.parquet(s"$base/sink")

    // WATERMARK controls ride the official avro record, one per
    // routing partition
    val controls = sunk.filter(col("_kind") === "resolved")
    assert(controls.count() == cfg.sink.numPartitions.toLong)
    val wm = SimpleAvro.decode(OpenBatch.parseFrame(
      controls.select("_value").head().getString(0))._2)
    assert(String.valueOf(wm.get("type")) == "WATERMARK", wm.toString)

    // the handshake is an avro BOOTSTRAP carrying the full table
    // schema — the consumer learns columns AND pk from the wire alone
    val boots = sunk.filter(col("_kind") === "bootstrap")
    assert(boots.count() > 0, "handshakes shipped")
    val learned = SimpleAvroWire.bootstrapSchemas(boots.select(col("_value")))
    assert(learned.nonEmpty)
    learned.values.foreach { case (cols, pk) =>
      assert(cols.map(_._1) == Seq("user_id", "value", "k"), cols)
      assert(pk == Seq("user_id"))
    }
    // the handshake predicate runs IN SPARK: on the FULL wire (rows +
    // watermarks + handshakes) only the handshake frames survive it,
    // so the driver never materializes row events
    assert(graft.functions.SimpleAvroWire
      .bootstrapFrames(sunk.select(col("_value"))).count() == boots.count(),
      "only bootstrap frames pass the two-byte column predicate")

    // decode rows with a reader DERIVED from the learned schema, then
    // re-apply onto real JDBC and diff against the stream-implied state
    def sparkT(sql: String): DataType = sql match {
      case "BIGINT" => LongType
      case "INTEGER" => IntegerType
      case _ if sql.startsWith("DECIMAL") => DoubleType
      case _ => StringType
    }
    val anyCols = learned.values.head._1
    val reader = StructType(anyCols.map { case (n, t) => StructField(n, sparkT(t)) })
    val rows = sunk.filter(col("_kind") === "row")
    assert(MqConsume.detect(rows.select("_value").head().getString(0))
      == "simple-avro")
    val envDec = SimpleAvroWire.decodeFeed(rows.select(col("_value")), reader)
      .withColumn("_row_id", monotonically_increasing_id())
      .withColumn("_start_ts", col("_commit_ts") - 1L)
    assert(envDec.count() == rows.count(), "every DML decodes")
    val applier = graft.sinks.JdbcApplier.inMemory("mqc_simple_avro")
    val tables = envDec.select(col("_schema"), col("_table")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    tables.foreach { case (s, t) =>
      val (cols, pk) = learned((s, t)); applier.createTable(s, t, cols, pk)
    }
    graft.sinks.MysqlSink.applyBatch(envDec, learned.values.head._2,
      numWorkers = 4, safeMode = true)(
      graft.sinks.JdbcApplier.executeFor(applier.url))
    val expected = graft.operators.Materialize.tableState(envDec)
      .select(col("_schema"), col("_table"), col("user_id"), col("value"), col("k"))
    val actualRows = tables.flatMap { case (s, t) =>
      applier.tableRows(s, t, Seq("user_id", "value", "k")).map(r =>
        org.apache.spark.sql.Row(s, t,
          r(0).asInstanceOf[Number].longValue(),
          r(1).asInstanceOf[java.math.BigDecimal].doubleValue(),
          r(2).asInstanceOf[Number].longValue()))
    }
    val actual = spark.createDataFrame(
      java.util.Arrays.asList(actualRows: _*),
      StructType(Seq(
        StructField("_schema", StringType), StructField("_table", StringType),
        StructField("user_id", LongType), StructField("value", DoubleType),
        StructField("k", LongType))))
    assert(graft.operators.TableDiff.diff(expected, actual,
      Seq("_schema", "_table", "user_id")).count() == 0L,
      "wire-learned decode + re-apply converges on the stream state")

    // and the FULL standalone harness handles the wire end to end:
    // publish to the MQ store, auto-detect simple-avro, decode with
    // the avro handshake schemas, re-apply, sync-diff clean
    val mqDir = tmp("simple-avro-mq")
    publish(sunk.select(col("_value"), col("_commit_ts")), mqDir)
    val s = MqConsume.run(spark, mqDir, source = "mq", protocol = "auto",
      dbName = "mqc_simple_avro_auto")
    assert(s.protocol == "simple-avro", s)
    assert(s.tables >= 1L && s.applied > 0L, s)
    assert(s.diffs == 0L, s"auto-detected simple-avro harness diff: $s")
  }

  test("EVOLVING feed with simple encoding-format=avro: the live avro " +
      "handshake re-renders the post-DDL shape from the schema store " +
      "(version-triggered re-send; bootstraper.go:259)") {
    import graft.streaming.{Changefeed, TxnMatcher}
    import graft.model._
    import graft.functions.{OpenBatch, SimpleAvro, SimpleAvroWire}
    import org.apache.spark.sql.Row
    val base = tmp("simple-avro-evolve")
    val srcDir = s"$base/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def jobEntry(jid: Long, tpe: Int, q: String, ts: Long): Seq[Row] = {
      val j = (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":950,""" +
        s""""schema_name":"app","table_name":"t","state":4,""" +
        s""""query":"$q","binlog":{"SchemaVersion":$ts,"TableInfo":{"id":950}},""" +
        s""""version":1}""").getBytes("UTF-8")
      val (k, v) = DdlJobParser.encodeJobEntry(jid, j, tpe)
      Seq(Row(k, v, null, "put", "committed", ts - 1L, ts, 0L))
    }
    def putPair(id: Long, cells: Seq[(Long, Long)], ts: Long): Seq[Row] = {
      val k = TiKvCodec.encodeRecordKey(950L, TiKvCodec.IntHandle(id))
      val v = TiKvCodec.encodeV2(cells.map { case (cid, x) =>
        cid -> Some(TiKvCodec.intCell(x)) })
      Seq(Row(k, v, null, "put", "prewrite", ts - 1L, 0L, 0L),
        Row(k, null, null, "put", "commit", ts - 1L, ts, 0L))
    }
    var fileSeq = 0
    def writeFile(rows: Seq[Row]): Unit = {
      fileSeq += 1
      val stage = s"$base/stage-$fileSeq"
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), TxnMatcher.uncommittedSchema)
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(srcDir, f"f$fileSeq%03d.parquet"))
    }
    writeFile(jobEntry(1L, 3,
      "CREATE TABLE app.t (id BIGINT, v BIGINT, PRIMARY KEY (id))", 10L) ++
      putPair(1L, Seq(2L -> 10L), 50L))
    writeFile(jobEntry(2L, 5,
      "ALTER TABLE app.t ADD COLUMN k BIGINT", 100L) ++
      putPair(2L, Seq(2L -> 20L, 3L -> 22L), 150L))
    val cfg = ChangefeedConfig(id = "cf-simple-avro-evolve",
      filter = FilterConfig(rules = Seq("app.*")), handleKeys = Seq("id"),
      sink = SinkConfig(protocol = Protocol.Simple, encodingFormat = "avro",
        numPartitions = 2, sendBootstrapToAllPartition = false))
    val q = Changefeed.runMqFromRaw2pcEvolving(spark, cfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      SchemaStore(), s"$base/sink", s"$base/ckpt", matcherGcMs = 600000L)
    try q.awaitTermination(180000) finally { if (q.isActive) q.stop() }
    assert(q.exception.isEmpty, s"feed must drain clean: ${q.exception}")
    val boots = spark.read.parquet(s"$base/sink")
      .filter(col("_kind") === "bootstrap").select(col("_value"))
    // both eras handshook: the DDL's version bump re-sent within its
    // own batch, each frame rendered from the LIVE store
    val versions = boots.collect().map { r =>
      val p = SimpleAvro.decode(OpenBatch.parseFrame(r.getString(0))._2)
        .get("payload").asInstanceOf[org.apache.avro.generic.GenericRecord]
      val ts = p.get("tableSchema").asInstanceOf[org.apache.avro.generic.GenericRecord]
      ts.get("version").asInstanceOf[java.lang.Long].longValue()
    }.toSet
    assert(versions == Set(10L, 100L), s"handshake versions: $versions")
    // the consumer's wire-learned schema keeps the HIGHEST version:
    // post-DDL columns + the declared pk, no out-of-band knowledge
    val learned = SimpleAvroWire.bootstrapSchemas(boots)
    assert(learned(("app", "t"))._1.map(_._1) == Seq("id", "v", "k"),
      s"post-DDL handshake carries the added column: ${learned(("app", "t"))}")
    assert(learned(("app", "t"))._2 == Seq("id"), "declared pk learned")
    // DDL events ride the official union's DDL message class too — the
    // wire stays ONE encoding (a JSON frame amid avro binaries would
    // fail any union-schema consumer); the 0x16 0x04 predicate finds
    // them on the FULL wire without materializing rows
    val allFrames = spark.read.parquet(s"$base/sink").select(col("_value"))
    val wds = SimpleAvroWire.wireDdls(allFrames)
    assert(wds.map(_._1) == Seq(10L, 100L), s"wire DDLs: $wds")
    assert(wds(1)._2.contains("ADD COLUMN"), wds(1)._2)
  }

  test("simple-avro integrity: the feed carries the CRC32 block over its " +
      "own wire values, the consumer verifies it, and a tampered wire " +
      "is caught") {
    import graft.functions.{OpenBatch, SimpleAvro, SimpleAvroWire}
    import org.apache.avro.generic.GenericRecord
    val order = Map(
      ("app", "t0") -> Seq("user_id", "value", "k"),
      ("app", "t1") -> Seq("user_id", "value", "k"))
    val encoded = SimpleAvroWire.encodeFeed(env, enableRowChecksum = true)
      .select(col("_value")).cache()
    // every frame carries a block that recomputes clean
    assert(SimpleAvroWire.countCorrupted(encoded, order) == 0L)
    val p = SimpleAvro.decode(OpenBatch.parseFrame(
      encoded.head().getString(0))._2)
      .get("payload").asInstanceOf[GenericRecord]
    val blk = p.get("checksum").asInstanceOf[GenericRecord]
    assert(blk != null && blk.get("corrupted") == java.lang.Boolean.FALSE)
    // the checksum domain follows the WIRE's value representation
    // (verify_checksum recomputes from decoded wire values): the avro
    // form carries exact doubles → tokenDouble, while the JSON form
    // renders money as decimal strings → string-byte tokens, so the
    // two wires fold different canonical bytes for the same upstream
    // row — each self-verifies against its own wire (countCorrupted
    // above), which is the contract
    // tamper: a frame whose image changed but whose block did not
    import SimpleAvro.Val
    val tampered = OpenBatch.frameJson(Array.emptyByteArray,
      SimpleAvro.encodeDml("INSERT", "app", "t1", 0L, 999L, 0L, 0L,
        data = Map("user_id" -> Val.L(1L), "value" -> Val.D(99.9),
          "k" -> Val.L(1L)),
        checksum = Some((1, false, 12345L, 0L))))
    import spark.implicits._
    assert(SimpleAvroWire.countCorrupted(
      Seq(tampered).toDF("_value"), order) == 1L, "tampering is caught")
    // THROUGH THE FEED + CONSUMER: integrity-enabled avro feed carries
    // blocks; the full harness verifies them (warn level counts 0)
    val base = tmp("integrity-avro")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/src"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$base/src/events.parquet"))
    val cfg = graft.model.ChangefeedConfig(id = "cf-integrity-avro",
      sink = graft.model.SinkConfig(protocol = graft.model.Protocol.Simple,
        encodingFormat = "avro"),
      integrity = graft.model.IntegrityConfig(
        integrityCheckLevel = "correctness"))
    graft.streaming.Changefeed.runMq(
      spark, cfg, s"$base/src", s"$base/sink", s"$base/ckpt")
      .awaitTermination(120000)
    val sunk = spark.read.parquet(s"$base/sink")
    val rowP = SimpleAvro.decode(OpenBatch.parseFrame(
      sunk.filter(col("_kind") === "row").select("_value")
        .head().getString(0))._2)
      .get("payload").asInstanceOf[GenericRecord]
    assert(rowP.get("checksum") != null,
      "the integrity-enabled avro feed carries the block on the wire")
    val mqDir = tmp("integrity-avro-mq")
    publish(sunk.select(col("_value"), col("_commit_ts")), mqDir)
    val s = MqConsume.run(spark, mqDir, source = "mq", protocol = "auto",
      dbName = "mqc_integrity_avro", verifyChecksum = Some("warn"))
    assert(s.protocol == "simple-avro" && s.corrupted == 0L && s.diffs == 0L, s)
    encoded.unpersist()
  }

  test("simple-avro oversize forms: handle-key-only re-marshals the " +
      "official avro DML, claim-check stores the full message and the " +
      "pointer resolves (kafka_simple_handle_key_only_avro / " +
      "kafka_simple_claim_check_avro), and the configured feed emits them") {
    import graft.functions.{LargeMessage, OpenBatch, SimpleAvro, SimpleAvroWire}
    import org.apache.avro.generic.GenericRecord
    import org.apache.spark.sql.types._
    val reader = StructType(Seq(StructField("user_id", LongType),
      StructField("value", DoubleType), StructField("k", LongType)))
    def payloadOf(frame: String): GenericRecord =
      SimpleAvro.decode(OpenBatch.parseFrame(frame)._2)
        .get("payload").asInstanceOf[GenericRecord]
    def imgOf(p: GenericRecord): java.util.Map[AnyRef, AnyRef] =
      Option(p.get("data")).orElse(Option(p.get("old")))
        .get.asInstanceOf[java.util.Map[AnyRef, AnyRef]]

    val encoded = SimpleAvroWire.encodeFeed(env)
    val cut = encoded.agg(
      expr("percentile(length(_value), 0.5)")).head().getDouble(0).toInt

    // --- handle-key-only: oversize frames re-marshal with ONLY the
    // handle key in the image, still valid official-schema messages
    val hk = LargeMessage.simpleAvroHandleKeyOnly(encoded, cut, Seq("user_id"))
    assert(hk.filter(col("_large")).count() > 0, "oversize frames exist")
    assert(hk.filter(!col("_large")).count() > 0, "small frames untouched")
    val one = payloadOf(
      hk.filter(col("_large")).select("_value").head().getString(0))
    assert(one.get("handleKeyOnly") == java.lang.Boolean.TRUE)
    val oneImg = imgOf(one)
    assert(oneImg.size == 1 &&
      String.valueOf(oneImg.keySet().iterator().next()) == "user_id",
      s"hk image trims to the handle key: $oneImg")
    val dec = SimpleAvroWire.decodeFeed(hk.select(col("_value")), reader)
    assert(dec.count() == env.count(), "every message still decodes")
    assert(dec.filter(col("_schema").isNull).count() == 0L)

    // --- claim-check: the FULL message stores first, pointers carry
    // the content-addressed location, the fetch restores full fidelity
    val store = tmp("cc-simple-avro-feedstore")
    var stored = 0L
    val cc = LargeMessage.simpleAvroClaimCheck(encoded, cut,
      s"file://$store", Seq("user_id"), n => stored = n)
    val nLarge = cc.filter(col("_large")).count()
    assert(nLarge > 0 && stored == nLarge, s"stored=$stored large=$nLarge")
    val ptr = payloadOf(
      cc.filter(col("_large")).select("_value").head().getString(0))
    val loc = String.valueOf(ptr.get("claimCheckLocation"))
    assert(loc.startsWith("file://") &&
      ptr.get("handleKeyOnly") == java.lang.Boolean.TRUE, loc)
    val (_, full) = LargeMessage.fetchClaimCheck(loc)
    val fullImg = imgOf(SimpleAvro.decode(full)
      .get("payload").asInstanceOf[GenericRecord])
    assert(fullImg.size == 3, s"stored object carries the FULL image: $fullImg")

    // --- THROUGH THE CHANGEFEED CONFIG: the avro-format hk-only feed
    // emits official handleKeyOnly messages
    val base = tmp("hk-avro-feed")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/src"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$base/src/events.parquet"))
    val cfg = graft.model.ChangefeedConfig(id = "cf-hk-avro",
      sink = graft.model.SinkConfig(protocol = graft.model.Protocol.Simple,
        encodingFormat = "avro",
        maxMessageBytes = 150,
        largeMessageHandle = graft.model.LargeMessageHandle(
          option = graft.model.LargeMessageHandle.OptionHandleKeyOnly)))
    graft.streaming.Changefeed.runMq(
      spark, cfg, s"$base/src", s"$base/sink", s"$base/ckpt")
      .awaitTermination(120000)
    val frames = spark.read.parquet(s"$base/sink")
      .filter(col("_kind") === "row").select("_value").collect()
    val nHk = frames.count(r =>
      payloadOf(r.getString(0)).get("handleKeyOnly") == java.lang.Boolean.TRUE)
    assert(nHk > 0, "oversize rows re-encoded handle-key-only on the wire")
  }

  test("storage-sink text layout end to end") {
    val dir = tmp("storage")
    StorageSink.write(Codecs.canalJson(env), dir, fmt = "text")
    val s = MqConsume.run(spark, dir, source = "storage",
      dbName = "mqc_storage")
    assert(s.protocol == "canal-json" && s.tables == 2L && s.diffs == 0L)
  }

  test("a corrupted stream is CAUGHT by the diff (the check can fail)") {
    val dir = tmp("corrupt")
    // drop one insert so the applied state diverges from the upstream
    publish(Codecs.canalJson(env.filter(col("_row_id") =!= 8L)), dir)
    val expectDir = tmp("corrupt-expect")
    env.write.mode("overwrite").parquet(expectDir)
    val s = MqConsume.run(spark, dir, source = "mq",
      dbName = "mqc_corrupt", expect = Some(expectDir))
    assert(s.diffs == 0L, "stream-implied state still self-consistent")
    assert(s.expectDiffs > 0L, "upstream diff must flag the lost row")
  }

  test("changefeed-level claim-check: the configured feed uploads oversize " +
      "messages and emits pointers the consumer resolves") {
    import graft.functions.{Decoders, LargeMessage}
    val base = tmp("cc-feed")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/src"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$base/src/events.parquet"))
    // a max-message-bytes below the typical wire size → most rows
    // become pointers, THROUGH THE CHANGEFEED CONFIG, not library calls
    val cfg = graft.model.ChangefeedConfig(id = "cf-claim",
      sink = graft.model.SinkConfig(protocol = graft.model.Protocol.Simple,
        fixtureRenderer = true,
        maxMessageBytes = 150,
        largeMessageHandle = graft.model.LargeMessageHandle(
          option = graft.model.LargeMessageHandle.OptionClaimCheck,
          claimCheckStorageUri = s"file://$base/claims")))
    graft.streaming.Changefeed.runMq(
      spark, cfg, s"$base/src", s"$base/sink", s"$base/ckpt").awaitTermination(120000)
    val rows = spark.read.parquet(s"$base/sink").filter(col("_kind") === "row")
    val pointers = rows.filter(col("_value").contains("\"claimCheckLocation\""))
    assert(pointers.count() > 0, "oversize rows became pointers")
    // consumer: resolve + decode; every row must decode with a schema
    val restored = LargeMessage.resolveClaimChecks(
      rows.select(col("_value")),
      get_json_object(col("_value"), "$.claimCheckLocation"))
    val decoded = Decoders.decodeSimple(restored.select(col("_value")))
    assert(decoded.filter(col("_schema").isNull).count() == 0L)
    assert(decoded.count() == rows.count())
    // full fidelity: resolved rows carry the complete image again
    assert(restored.filter(col("_value").contains("\"claimCheckLocation\""))
      .count() == 0L, "no pointers survive resolution")

    // a misconfigured feed (claim-check without a URI) fails at create
    intercept[IllegalArgumentException] {
      graft.streaming.Changefeed.runMq(spark,
        cfg.copy(id = "cf-claim-bad",
          sink = cfg.sink.copy(largeMessageHandle =
            graft.model.LargeMessageHandle(
              option = graft.model.LargeMessageHandle.OptionClaimCheck))),
        s"$base/src", s"$base/sink2", s"$base/ckpt2")
    }

    // the upload counter surfaced the work (claimcheck/metrics.go:30)
    val sent = graft.streaming.SinkCounters.claimChecksSent.toMap
    assert(sent.getOrElse("cf-claim", 0L) >= pointers.count(),
      s"claim-check counter recorded the uploads: $sent")
    val scrape = graft.streaming.Prometheus.render(
      new graft.streaming.ChangefeedRegistry(spark), None)
    assert(scrape.contains(
      """ticdc_sink_mq_claim_check_send_message_count{namespace="default",changefeed="cf-claim"}"""),
      scrape.linesIterator.filter(_.contains("claim")).mkString("\n"))
  }

  test("canal-json claim-check pointer carries the _tidb extension; " +
      "raw-value mode stores the bare message") {
    import graft.functions.{Codecs, Decoders, LargeMessage}
    val store = tmp("cc-canal-store")
    val encoded = Codecs.canalJson(env)
    val cut = encoded.agg(
      expr("percentile(length(_value), 0.5)")).head().getDouble(0).toInt
    val withCc = LargeMessage.canalClaimCheck(encoded, cut, s"file://$store")
    assert(withCc.filter(col("_large")).count() > 0)
    val ptr = withCc.filter(col("_large")).select("_value").head().getString(0)
    // the pointer is itself a canal message: hk-only data + _tidb ext
    // (canal_json_encoder.go:318-338)
    assert(ptr.contains("\"_tidb\":{\"commitTs\":"), ptr)
    assert(ptr.contains("\"claimCheckLocation\":\"file://"), ptr)
    assert(ptr.contains("\"isDdl\":false"), ptr)
    assert(!ptr.contains("\"value\""), "pointer data is handle-key-only")
    val restored = LargeMessage.resolveClaimChecks(
      withCc.select(col("_value")),
      get_json_object(col("_value"), "$._tidb.claimCheckLocation"))
    val decoded = Decoders.decodeCanal(restored.select(col("_value")))
      .select(col("_schema"), col("_table"), col("_op"), col("before"), col("after"))
    val direct = Decoders.decodeCanal(encoded.select(col("_value")))
      .select(col("_schema"), col("_table"), col("_op"), col("before"), col("after"))
    assert(decoded.exceptAll(direct).count() == 0L &&
      direct.exceptAll(decoded).count() == 0L)

    // raw-value mode (claim-check-raw-value): the stored object is
    // the bare canal message, consumed without the unwrap hop
    val store2 = tmp("cc-canal-raw")
    val withRaw = LargeMessage.canalClaimCheck(encoded, cut, s"file://$store2",
      rawValue = true)
    val rawRestored = LargeMessage.resolveClaimChecks(
      withRaw.select(col("_value")),
      get_json_object(col("_value"), "$._tidb.claimCheckLocation"),
      rawValue = true)
    val rawDecoded = Decoders.decodeCanal(rawRestored.select(col("_value")))
      .select(col("_schema"), col("_table"), col("_op"), col("before"), col("after"))
    assert(rawDecoded.exceptAll(direct).count() == 0L &&
      direct.exceptAll(rawDecoded).count() == 0L,
      "raw-value objects decode identically")
  }
}
