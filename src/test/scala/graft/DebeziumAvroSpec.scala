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
    val keyIds = store.versions("orders-key")
    val valueIds = store.versions("orders-value")
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
}
