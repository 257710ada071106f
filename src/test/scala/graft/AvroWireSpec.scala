package graft

import java.nio.file.Files
import graft.model._
import graft.streaming.Changefeed
import org.apache.spark.sql.functions._

/** Avro as a STREAMING changefeed protocol (reference builder.go +
  * avro/encoder.go:68): the evolving raw-2PC feed ships Confluent-
  * framed rows, registers the post-fold table version on every DDL
  * fold, emits 0x01/0x02 control events, and a consumer decodes both
  * schema eras by registry id with one post-DDL reader. */
class AvroWireSpec extends SparkFunSuite {

  test("evolving avro feed: DDL fold registers the new schema version, " +
      "control events ride the 0x01/0x02 framing, and one post-DDL reader " +
      "decodes BOTH eras by id (old era fills the added column's default)") {
    import graft.streaming.TxnMatcher
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._

    val uri = "mem://spec-avro-evolve"
    graft.functions.AvroWire.dropRegistry(uri)
    val tmp = Files.createTempDirectory("graft-avro-evolve").toString
    val srcDir = s"$tmp/src"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def jobJson(jid: Long, tpe: Int, q: String, ts: Long): Array[Byte] =
      (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":900,""" +
        s""""schema_name":"app","table_name":"t","state":4,""" +
        s""""query":"$q","binlog":{"SchemaVersion":$ts,"TableInfo":{"id":900}},""" +
        s""""version":1}""").getBytes("UTF-8")
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
      Files.move(part.toPath,
        java.nio.file.Paths.get(srcDir, f"f$fileSeq%03d.parquet"))
    }
    writeFile(jobEntry(1L, 3, "CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L) ++
      rowPair(1L, Seq(2L -> 10L), 50L) ++ rowPair(2L, Seq(2L -> 20L), 60L))
    writeFile(jobEntry(2L, 5, "ALTER TABLE app.t ADD COLUMN k BIGINT DEFAULT 7", 100L) ++
      rowPair(3L, Seq(2L -> 30L, 3L -> 33L), 150L))

    val cfg = ChangefeedConfig(id = "cf-avro-evolve",
      filter = FilterConfig(rules = Seq("app.*")), handleKeys = Seq("id"),
      sink = SinkConfig(protocol = Protocol.Avro, numPartitions = 2,
        schemaRegistry = uri,
        // the 0x01/0x02 control events this spec pins ship only under
        // avro-enable-watermark (encoder.go:106,125; default false)
        avroEnableWatermark = true))
    val q = Changefeed.runMqFromRaw2pcEvolving(spark, cfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      SchemaStore(), s"$tmp/sink", s"$tmp/ckpt", matcherGcMs = 600000L)
    try q.awaitTermination(180000) finally { if (q.isActive) q.stop() }
    assert(q.exception.isEmpty, s"feed must drain clean: ${q.exception}")

    // 1) the registry carries BOTH table versions under the value
    //    subject — the ALTER's fold registered the post-DDL shape
    val store = graft.functions.AvroWire.registryFor(uri)
    val ids = store.idsFor("cf-avro-evolve-app.t-value")
    assert(ids.size == 2, s"DDL fold must register the new version: $ids")
    assert(!store.byId(ids.head).contains("\"name\":\"k\""),
      "version 1 is the pre-DDL shape")
    assert(store.byId(ids(1)).contains("\"name\":\"k\""),
      "version 2 carries the added column")

    val sunk = spark.read.parquet(s"$tmp/sink")
    // 2) control events: both DDLs as 0x01 events (with query text and
    //    commit ts), per-batch checkpoints as 0x02 events
    val ctl = graft.functions.AvroWire.controlEvents(sunk)
    val ddls = ctl.collect { case Left(d) => d }
    assert(ddls.map(_._5).sorted == Seq(10L, 100L), s"wire DDLs: $ddls")
    assert(ddls.exists(d => d._1.contains("ADD COLUMN k") &&
      d._3 == "app" && d._4 == "t"))
    val cps = ctl.collect { case Right(ts) => ts }
    assert(cps.contains(60L) && cps.contains(150L),
      s"per-batch checkpoints: $cps")

    // 3) the wire really carries TWO writer ids, and ONE post-DDL
    //    reader decodes both eras (era-1 rows fill k's null default)
    val rows = sunk.filter(col("_kind") === "row")
    val seenIds = rows.select("_value").collect().map { r =>
      val (_, v) = graft.functions.OpenBatch.parseFrame(r.getString(0))
      graft.functions.AvroRegistry.unframe(v)._1
    }.toSet
    assert(seenIds.size == 2, s"both eras on the wire: $seenIds")
    assert(seenIds == ids.toSet, "wire ids are the registered ids")
    val decoded = graft.functions.AvroWire.decodeFeedAs(rows, uri,
      StructType(Seq(StructField("id", LongType),
        StructField("v", LongType), StructField("k", LongType))))
    val byId = decoded.collect().map(r =>
      r.getLong(4) -> ((Option(r.get(5)), Option(r.get(6)),
        r.getString(0), r.getString(1), r.getLong(3)))).toMap
    assert(byId(1L) == ((Some(10L), None, "app", "t", 50L)), s"$byId")
    assert(byId(2L) == ((Some(20L), None, "app", "t", 60L)), s"$byId")
    assert(byId(3L) == ((Some(30L), Some(33L), "app", "t", 150L)),
      s"post-DDL row decodes the new column: $byId")
  }

  test("glue framing: a glue:// registry uri ships header-3 UUID frames, " +
      "the consumer resolves writers by version uuid, and the two framings " +
      "coexist in one decode (per-frame leading-byte dispatch)") {
    import org.apache.spark.sql.types._
    val cUri = "mem://spec-avro-mixed"
    val gUri = "glue://spec-avro-glue"
    graft.functions.AvroWire.dropRegistry(cUri)
    graft.functions.AvroWire.dropRegistry(gUri)
    val env = graft.model.Envelope.fromEvents(
      Tables.events(spark, "/root/testdata/sf0.001")).limit(200).cache()
    val confluent = graft.functions.AvroWire
      .encodeFeed(env, Seq("user_id"), cUri, "mix")
    val glue = graft.functions.AvroWire
      .encodeFeed(env, Seq("user_id"), gUri, "mix")
    // byte-level: glue frames open with header version 3 + a
    // compression byte + the 16-byte content-derived uuid
    val gv = glue.filter(col("_value").isNotNull).select("_value")
      .collect().map(r => graft.functions.OpenBatch.parseFrame(r.getString(0)))
    val gRow = gv.map(_._2).find(_.nonEmpty).get
    assert(gRow(0) == 3.toByte && gRow(1) == 0.toByte, "glue header + no compression")
    val (uuid, _) = graft.functions.AvroRegistry.glueUnframe(gRow)
    assert(uuid != null)
    val cRow = gv.map(_._1).head
    assert(cRow(0) == 3.toByte, "keys ride the glue framing too")
    // decode resolves by uuid; a MIXED stream (some frames confluent,
    // some glue) decodes in one pass — but writer resolution is
    // per-URI, so feed the glue frames through the glue uri and assert
    // equality with the confluent decode
    val reader = StructType(Seq(StructField("user_id", LongType),
      StructField("value", DoubleType), StructField("k", LongType)))
    val viaGlue = graft.functions.AvroWire.decodeFeedAs(glue, gUri, reader)
    val viaConf = graft.functions.AvroWire.decodeFeedAs(confluent, cUri, reader)
    assert(viaGlue.exceptAll(viaConf).count() == 0 &&
      viaConf.exceptAll(viaGlue).count() == 0,
      "glue and confluent framings carry the identical feed")
    env.unpersist()
  }

  test("registry scheme dispatch: http(s):// resolves the REAL Confluent " +
      "HTTP client (not a silent in-memory store), mem:// and glue:// keep " +
      "their stores, unknown schemes reject at create") {
    import graft.functions.{AvroWire, HttpSchemaRegistry}
    intercept[IllegalArgumentException](AvroWire.validateUri("bogus://x"))
    intercept[IllegalArgumentException](AvroWire.validateUri("no-scheme"))
    AvroWire.validateUri("mem://ok"); AvroWire.validateUri("glue://ok")
    AvroWire.validateUri("http://127.0.0.1:1"); AvroWire.validateUri("https://r")
    intercept[IllegalArgumentException](AvroWire.registryFor("bogus://y"))
    // an http:// uri resolves to the HTTP client and the round trip
    // crosses a real TCP socket
    val stub = new HttpSchemaRegistry.Stub().start()
    try {
      val uri = stub.baseUrl
      AvroWire.dropRegistry(uri)
      val store = AvroWire.registryFor(uri)
      assert(store.isInstanceOf[HttpSchemaRegistry.ConfluentHttpClient],
        s"http uri must resolve the HTTP client, got ${store.getClass}")
      val before = stub.requestsServed
      val id = store.register("dispatch-t-value",
        """{"type":"record","name":"t","namespace":"graft.app","fields":[{"name":"a","type":"long"}]}""")
      assert(store.byId(id).contains("\"name\":\"a\""))
      assert(store.idsFor("dispatch-t-value") == Seq(id))
      assert(stub.requestsServed >= before + 3, "the calls crossed the wire")
      AvroWire.dropRegistry(uri)
    } finally stub.stop()
    // the create-time gate rejects unknown schemes before the stream
    val ex = intercept[IllegalArgumentException] {
      graft.streaming.Changefeed.runMqFromRaw2pcEvolving(spark,
        ChangefeedConfig(id = "cf-avro-scheme",
          sink = SinkConfig(protocol = Protocol.Avro,
            schemaRegistry = "bogus://nowhere")),
        spark.readStream.schema(graft.streaming.TxnMatcher.uncommittedSchema)
          .parquet(Files.createTempDirectory("graft-avro-scheme").toString),
        SchemaStore(),
        Files.createTempDirectory("graft-avro-scheme-sink").toString,
        Files.createTempDirectory("graft-avro-scheme-ckpt").toString)
    }
    assert(ex.getMessage.contains("bogus"))
  }

  test("sanitize collisions fail fast at schema build, naming the columns") {
    import org.apache.spark.sql.types._
    val ex = intercept[IllegalArgumentException] {
      graft.functions.AvroWire.valueSchemaJson(
        Seq(StructField("a-b", LongType), StructField("a_b", LongType)),
        "app", "t")
    }
    assert(ex.getMessage.contains("a-b") && ex.getMessage.contains("a_b"),
      ex.getMessage)
    val ex2 = intercept[IllegalArgumentException] {
      graft.functions.AvroWire.keySchemaJson(
        Seq(StructField("k 1", LongType), StructField("k_1", LongType)),
        "app", "t")
    }
    assert(ex2.getMessage.contains("k 1"), ex2.getMessage)
  }

  test("controlEvents pushes the control-frame predicate into Spark: row " +
      "events (confluent AND glue framed, tombstones, non-frame text) drop " +
      "distributed and only control frames reach the driver") {
    import spark.implicits._
    import graft.functions.{AvroRegistry, AvroWire, OpenBatch}
    val ddl = OpenBatch.frameJson(Array.emptyByteArray,
      AvroRegistry.ddlEventBytes("CREATE TABLE a.b (x INT)", 3, "a", "b", 10L))
    val cp = OpenBatch.frameJson(Array.emptyByteArray,
      AvroRegistry.checkpointEventBytes(99L))
    val row = OpenBatch.frameJson(
      AvroRegistry.frame(7, Array[Byte](1, 2)),
      AvroRegistry.frame(7, Array[Byte](3, 4, 5)))
    val glueRow = OpenBatch.frameJson(
      AvroRegistry.glueFrame(java.util.UUID.randomUUID(), Array[Byte](1)),
      AvroRegistry.glueFrame(java.util.UUID.randomUUID(), Array[Byte](2)))
    val tombstone = OpenBatch.frameJson(
      AvroRegistry.frame(7, Array[Byte](1)), Array.emptyByteArray)
    val nonFrame = """{"u":{"a":1}}"""
    val msgs = (Seq.fill(2000)(row) ++ Seq.fill(2000)(glueRow) ++
      Seq(tombstone, nonFrame, ddl, cp)).toDF("_value")
    // the SPARK-side predicate alone bounds what can ever collect
    assert(AvroWire.controlFrames(msgs).count() == 2,
      "only the two control frames survive the column predicate")
    val evs = AvroWire.controlEvents(msgs)
    assert(evs.collect { case Right(ts) => ts } == Seq(99L))
    val ddls = evs.collect { case Left(d) => d }
    assert(ddls.map(d => (d._3, d._4, d._5)) == Seq(("a", "b", 10L)), s"$ddls")
  }

  test("value-mapping modes (arvo.go:551,637,657): precise ships decimals " +
      "as bytes+logical and u64 bits as long; string mode ships both as " +
      "plain strings — and ONE decoder reads every mode back identically") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import graft.functions.AvroWire
    val payload = StructType(Seq(
      StructField("id", LongType),
      StructField("price", DecimalType(18, 2)),
      StructField("u64", DecimalType(20, 0)))) // unsigned-bigint carrier
    val envSchema = StructType(Seq(
      StructField("_row_id", LongType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_commit_ts", LongType),
      StructField("_op", StringType),
      StructField("before", payload), StructField("after", payload)))
    def img(id: Long, price: String, u: String) =
      Row(id, new java.math.BigDecimal(price), new java.math.BigDecimal(u))
    val rows = java.util.Arrays.asList(
      Row(1L, "app", "m", 100L, "I", null, img(1L, "12.50", "42")),
      // > Long.MaxValue: the u64-bits long round trip must survive it
      Row(2L, "app", "m", 110L, "I", null,
        img(2L, "-3.07", "18446744073709551615")),
      Row(3L, "app", "m", 120L, "U",
        img(1L, "12.50", "42"), img(1L, "99.99", "7")))
    val env = spark.createDataFrame(rows, envSchema)

    def schemaOf(uri: String): String =
      AvroWire.registryFor(uri).latest("m-app.m-value")._2
    val reader = payload

    // precise/long (the defaults)
    val pUri = "mem://spec-avro-mode-precise"
    AvroWire.dropRegistry(pUri)
    val pFrames = AvroWire.encodeFeed(env, Seq("id"), pUri, "m").cache()
    pFrames.count() // force the encode: registration is task-lazy
    val pSchema = schemaOf(pUri)
    assert(pSchema.contains("\"logicalType\":\"decimal\""),
      s"precise decimals are bytes+logical: $pSchema")
    assert(pSchema.contains("\"name\":\"u64\",\"type\":[\"null\",\"long\"]"),
      s"u64 long mode ships the bits as avro long: $pSchema")
    val pDec = AvroWire.decodeFeedAs(pFrames, pUri, reader)

    // string/string
    val sUri = "mem://spec-avro-mode-string"
    AvroWire.dropRegistry(sUri)
    val sFrames = AvroWire.encodeFeed(env, Seq("id"), sUri, "m",
      modes = AvroWire.AvroModes(decimal = "string",
        unsignedBigint = "string")).cache()
    sFrames.count()
    val sSchema = schemaOf(sUri)
    assert(!sSchema.contains("logicalType"),
      s"string mode has no logical decimal: $sSchema")
    assert(sSchema.contains("\"name\":\"price\",\"type\":[\"null\",\"string\"]") &&
      sSchema.contains("\"name\":\"u64\",\"type\":[\"null\",\"string\"]"),
      s"both columns ship as plain strings: $sSchema")
    val sDec = AvroWire.decodeFeedAs(sFrames, sUri, reader)

    // the two wires differ in BYTES but carry the identical feed
    assert(pDec.exceptAll(sDec).count() == 0 &&
      sDec.exceptAll(pDec).count() == 0,
      "every mode decodes back to the same values")
    val big = pDec.filter(col("id") === 2L).select("u64").head().getDecimal(0)
    assert(big.toPlainString == "18446744073709551615",
      s"u64 > Long.MaxValue survives the bits round trip: $big")
    // invalid modes reject at construction (= changefeed create)
    intercept[IllegalArgumentException](AvroWire.AvroModes(decimal = "exact"))
    intercept[IllegalArgumentException](AvroWire.AvroModes(unsignedBigint = "u64"))
    pFrames.unpersist(); sFrames.unpersist()
  }

  test("avro-enable-watermark gates the delete VALUE form (arvo.go:130): " +
      "off = bare-key tombstone, on = 0x03 + BE commit ts — and the decoder " +
      "reads the delete's commit ts from the watermark value itself") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import graft.functions.{AvroRegistry, AvroWire, OpenBatch}
    val payload = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    val envSchema = StructType(Seq(
      StructField("_row_id", LongType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_commit_ts", LongType),
      StructField("_op", StringType),
      StructField("before", payload), StructField("after", payload)))
    val env = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, "app", "w", 50L, "I", null, Row(7L, 1L)),
      Row(2L, "app", "w", 60L, "D", Row(7L, 1L), null)), envSchema)

    val uri = "mem://spec-avro-watermark"
    AvroWire.dropRegistry(uri)
    val off = AvroWire.encodeFeed(env, Seq("id"), uri, "w").cache()
    val offDel = off.filter(col("_commit_ts") === 60L).select("_value")
      .head().getString(0)
    assert(OpenBatch.parseFrame(offDel)._2.isEmpty,
      "watermark off: the delete is a bare-key tombstone")

    val on = AvroWire.encodeFeed(env, Seq("id"), uri, "w",
      enableWatermark = true).cache()
    val onDel = on.filter(col("_commit_ts") === 60L).select("_value")
      .head().getString(0)
    val vb = OpenBatch.parseFrame(onDel)._2
    assert(vb.length == 9 && vb(0) == AvroRegistry.DeleteByte,
      "watermark on: 0x03 + 8-byte BE commit ts")
    assert(AvroRegistry.deleteValueCommitTs(vb) == 60L)
    // neither form is mistaken for a control event
    assert(AvroWire.controlEvents(on) ++ AvroWire.controlEvents(off) == Nil)
    // both decode as the same delete (ts from the value in on-mode)
    for (frames <- Seq(off, on)) {
      val d = AvroWire.decodeFeedAs(frames, uri, payload)
        .filter(col("_op") === "d").collect()
      assert(d.length == 1 && d.head.getLong(3) == 60L &&
        d.head.getLong(4) == 7L,
        s"delete decodes with ts 60 and key id 7: ${d.toSeq}")
    }
    off.unpersist(); on.unpersist()
  }

  test("avro feed config surface: registry uri is required at create; " +
      "toml round-trips protocol avro") {
    val cfg = ChangefeedConfig(id = "cf-avro-bad",
      sink = SinkConfig(protocol = Protocol.Avro))
    val ex = intercept[IllegalArgumentException] {
      Changefeed.runMqFromRaw2pcEvolving(spark, cfg,
        spark.readStream.schema(graft.streaming.TxnMatcher.uncommittedSchema)
          .parquet(Files.createTempDirectory("graft-avro-none").toString),
        SchemaStore(),
        Files.createTempDirectory("graft-avro-sink").toString,
        Files.createTempDirectory("graft-avro-ckpt").toString)
    }
    assert(ex.getMessage.contains("schema-registry"))
  }
}
