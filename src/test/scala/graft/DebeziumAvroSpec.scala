package graft

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{AvroRegistry, DebeziumAvroCodec}
import graft.model.Envelope

/** Debezium-over-Avro wire format (reference
  * pkg/sink/codec/debezium/avro.go + avro_decoder.go): Confluent
  * framing, key/value subjects, envelope field semantics per op, and
  * a golden payload decoded with raw avro-core (not our decoder) so
  * the bytes themselves are pinned. */
class DebeziumAvroSpec extends SparkFunSuite {

  private val envSchema = StructType(Seq(
    StructField("_row_id", LongType),
    StructField("_schema", StringType),
    StructField("_table", StringType),
    StructField("_op", StringType),
    StructField("_commit_ts", LongType),
    StructField("_start_ts", LongType),
    StructField("before", StructType(Seq(
      StructField("user_id", LongType),
      StructField("value", DoubleType),
      StructField("k", LongType)))),
    StructField("after", StructType(Seq(
      StructField("user_id", LongType),
      StructField("value", DoubleType),
      StructField("k", LongType))))))

  private def fixture = {
    val rows = Seq(
      Row(1L, "app", "t1", "I", 7000000L, 6999999L,
        null, Row(11L, 1.5, 21L)),
      Row(2L, "app", "t1", "U", 8000000L, 7999999L,
        Row(12L, 2.0, 22L), Row(12L, 2.5, 22L)),
      Row(3L, "app", "t2", "D", 9000000L, 8999999L,
        Row(13L, 3.0, 23L), null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), envSchema)
  }

  test("subjects register under {topic}-key / {topic}-value and frames carry their ids") {
    val store = new AvroRegistry.InMemoryStore
    val out = DebeziumAvroCodec.encode(fixture, "orders", "c1", store).collect()
    val keyIds = store.idsFor("orders-key")
    val valueIds = store.idsFor("orders-value")
    assert(keyIds.size == 1 && valueIds.size == 1)
    out.foreach { r =>
      val (kid, _) = AvroRegistry.unframe(r.getAs[Array[Byte]](1))
      val (vid, _) = AvroRegistry.unframe(r.getAs[Array[Byte]](2))
      assert(kid == keyIds.head && vid == valueIds.head)
    }
  }

  test("golden payload: insert envelope decoded with raw avro-core matches field by field") {
    val store = new AvroRegistry.InMemoryStore
    val enc = DebeziumAvroCodec.encode(fixture, "orders", "cluster-7", store)
      .collect().sortBy(_.getLong(0))
    def readRaw(framed: Array[Byte]): GenericRecord = {
      val (id, payload) = AvroRegistry.unframe(framed)
      val schema = new Schema.Parser().parse(store.byId(id))
      new GenericDatumReader[GenericRecord](schema)
        .read(null, DecoderFactory.get().binaryDecoder(payload, null))
    }
    val ins = readRaw(enc(0).getAs[Array[Byte]](2))
    assert(ins.get("op").toString == "c")
    assert(ins.get("before") == null)
    val after = ins.get("after").asInstanceOf[GenericRecord]
    assert(after.get("user_id") == 11L && after.get("value") == 1.5 && after.get("k") == 21L)
    val src = ins.get("source").asInstanceOf[GenericRecord]
    assert(src.get("version").toString == DebeziumAvroCodec.SourceVersion)
    assert(src.get("connector").toString == DebeziumAvroCodec.SourceConnector)
    assert(src.get("db").toString == "app" && src.get("table").toString == "t1")
    assert(src.get("commit_ts") == 7000000L && src.get("cluster_id").toString == "cluster-7")
    assert(ins.get("ts_ms") == 7L && src.get("ts_ms") == 7L)

    val upd = readRaw(enc(1).getAs[Array[Byte]](2))
    assert(upd.get("op").toString == "u")
    assert(upd.get("before") != null && upd.get("after") != null)

    val del = readRaw(enc(2).getAs[Array[Byte]](2))
    assert(del.get("op").toString == "d")
    assert(del.get("after") == null)
    assert(del.get("before").asInstanceOf[GenericRecord].get("user_id") == 13L)

    // key: after image except deletes, which key on the before image
    val insKey = readRaw(enc(0).getAs[Array[Byte]](1))
    val delKey = readRaw(enc(2).getAs[Array[Byte]](1))
    assert(insKey.get("user_id") == 11L && delKey.get("user_id") == 13L)
  }

  test("roundtrip over the real envelope matches the expected flattening") {
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val store = new AvroRegistry.InMemoryStore
    val decoded = DebeziumAvroCodec.decode(
      DebeziumAvroCodec.encode(env, "events", "graft-cluster", store), store)
    val expected = env.select(
      when(col("_op") === "I", "c").when(col("_op") === "U", "u")
        .otherwise("d").as("op"),
      col("_commit_ts").as("commit_ts"),
      // exact decimal division: a double quotient of an epoch-ns long
      // (> 2^53) rounds and drifts off the encoder's integer division
      (col("_commit_ts").cast(DecimalType(38, 0)) / lit(1000000L))
        .cast("long").as("ts_ms"),
      col("_schema").as("db"), col("_table").as("tbl"),
      lit("graft-cluster").as("cluster_id"),
      when(col("_op") === "D", col("before.user_id"))
        .otherwise(col("after.user_id")).as("key_user_id"),
      col("before.user_id").as("before_user_id"),
      col("before.value").as("before_value"),
      col("before.k").as("before_k"),
      col("after.user_id").as("after_user_id"),
      col("after.value").as("after_value"),
      col("after.k").as("after_k"))
    assert(decoded.count() == env.count())
    assert(decoded.exceptAll(expected).isEmpty && expected.exceptAll(decoded).isEmpty)
  }

  test("debezium encoding-format=avro as a STREAMING protocol: the evolving " +
      "raw-2PC feed ships Confluent-framed envelopes under per-table " +
      "subjects, both eras register and decode, deletes ride the before " +
      "image, and DDL rides the JSON schema-change event (debezium_avro)") {
    import java.nio.file.Files
    import graft.streaming.{Changefeed, TxnMatcher}
    import graft.model._
    val uri = "mem://spec-dbz-avro-feed"
    graft.functions.AvroWire.dropRegistry(uri)
    val tmp = Files.createTempDirectory("graft-dbz-avro-feed").toString
    val srcDir = s"$tmp/src"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def jobJson(jid: Long, tpe: Int, q: String, ts: Long): Array[Byte] =
      (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":940,""" +
        s""""schema_name":"app","table_name":"t","state":4,""" +
        s""""query":"$q","binlog":{"SchemaVersion":$ts,"TableInfo":{"id":940}},""" +
        s""""version":1}""").getBytes("UTF-8")
    def jobEntry(jid: Long, tpe: Int, q: String, ts: Long): Seq[Row] = {
      val (k, v) = graft.model.DdlJobParser.encodeJobEntry(
        jid, jobJson(jid, tpe, q, ts), tpe)
      Seq(Row(k, v, null, "put", "committed", ts - 1L, ts, 0L))
    }
    def putPair(id: Long, cells: Seq[(Long, Long)], ts: Long): Seq[Row] = {
      val k = graft.model.TiKvCodec.encodeRecordKey(
        940L, graft.model.TiKvCodec.IntHandle(id))
      val v = graft.model.TiKvCodec.encodeV2(cells.map { case (cid, x) =>
        cid -> Some(graft.model.TiKvCodec.intCell(x)) })
      Seq(Row(k, v, null, "put", "prewrite", ts - 1L, 0L, 0L),
        Row(k, null, null, "put", "commit", ts - 1L, ts, 0L))
    }
    def delPair(id: Long, cells: Seq[(Long, Long)], ts: Long): Seq[Row] = {
      val k = graft.model.TiKvCodec.encodeRecordKey(
        940L, graft.model.TiKvCodec.IntHandle(id))
      val old = graft.model.TiKvCodec.encodeV2(cells.map { case (cid, x) =>
        cid -> Some(graft.model.TiKvCodec.intCell(x)) })
      Seq(Row(k, null, old, "delete", "prewrite", ts - 1L, 0L, 0L),
        Row(k, null, null, "delete", "commit", ts - 1L, ts, 0L))
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
    writeFile(jobEntry(1L, 3,
      "CREATE TABLE app.t (id BIGINT, v BIGINT, PRIMARY KEY (id))", 10L) ++
      putPair(1L, Seq(2L -> 10L), 50L) ++ putPair(2L, Seq(2L -> 20L), 60L))
    writeFile(jobEntry(2L, 5,
      "ALTER TABLE app.t ADD COLUMN k BIGINT", 100L) ++
      putPair(3L, Seq(2L -> 30L, 3L -> 33L), 150L) ++
      delPair(2L, Seq(2L -> 20L), 160L))
    val cfg = ChangefeedConfig(id = "cf-dbz-avro",
      filter = FilterConfig(rules = Seq("app.*")), handleKeys = Seq("id"),
      sink = SinkConfig(protocol = Protocol.Debezium, encodingFormat = "avro",
        numPartitions = 2, schemaRegistry = uri))
    val q = Changefeed.runMqFromRaw2pcEvolving(spark, cfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      SchemaStore(), s"$tmp/sink", s"$tmp/ckpt", matcherGcMs = 600000L)
    try q.awaitTermination(180000) finally { if (q.isActive) q.stop() }
    assert(q.exception.isEmpty, s"feed must drain clean: ${q.exception}")

    // both table eras registered under the per-table value subject;
    // the key subject kept one version (the pk never changed)
    val store = graft.functions.AvroWire.registryFor(uri)
    assert(store.versions("cf-dbz-avro-app.t-value").size == 2,
      "the post-DDL shape registered its own version")
    assert(store.versions("cf-dbz-avro-app.t-key").size == 1)

    val sunk = spark.read.parquet(s"$tmp/sink")
    // DDL rides the debezium JSON schema-change event in BOTH formats
    val ddlMsgs = sunk.filter(col("_kind") === "ddl")
    assert(ddlMsgs.count() == 2)
    assert(ddlMsgs.select("_value").collect()
      .forall(_.getString(0).contains("\"tableChanges\":")),
      "schema-change events are the JSON form")

    // rows decode by writer id: era-1 rows leave the added column
    // null, the delete is a REAL envelope carrying its before image
    val rows = sunk.filter(col("_kind") === "row")
    val reader = StructType(Seq(StructField("id", LongType),
      StructField("v", LongType), StructField("k", LongType)))
    val dec = graft.functions.DebeziumAvroWire
      .decodeFeed(rows, uri, reader).collect()
      .map(r => (r.getLong(3), (r.getString(2),
        Option(r.getStruct(4)), Option(r.getStruct(5))))).toMap
    assert(dec(50L)._1 == "I" && dec(50L)._3.exists(a =>
      a.getLong(0) == 1L && a.getLong(1) == 10L && a.isNullAt(2)))
    assert(dec(150L)._1 == "I" && dec(150L)._3.exists(a =>
      a.getLong(0) == 3L && a.getLong(1) == 30L && a.getLong(2) == 33L),
      "post-DDL row carries the added column")
    assert(dec(160L)._1 == "D" && dec(160L)._3.isEmpty &&
      dec(160L)._2.exists(b => b.getLong(0) == 2L && b.getLong(1) == 20L),
      "delete ships its BEFORE image (not a key-only tombstone)")
  }
}
