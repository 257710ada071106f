package graft

import org.apache.spark.sql.functions._
import graft.functions.AvroCodec
import graft.model.Envelope

/** Avro encode/decode round trip over avro-core (lossless: Avro
  * carries full ns commit-ts and exact doubles). */
class AvroCodecSpec extends SparkFunSuite {

  test("avro round trip is lossless on the envelope") {
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val decoded = AvroCodec.decode(AvroCodec.encode(env))
    assert(decoded.count() == env.count())
    val flat = Envelope.flat(env)
    val diff = decoded.exceptAll(flat).count() + flat.exceptAll(decoded).count()
    assert(diff == 0, "decode(encode(env)) == env exactly")
  }

  test("avro messages are compact binary") {
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val sizes = AvroCodec.encode(env)
      .select(length(col("_value")).as("n")).agg(avg("n"), max("n")).head()
    assert(sizes.getDouble(0) < 100, "avro ~5x smaller than the JSON codecs")
  }
}
