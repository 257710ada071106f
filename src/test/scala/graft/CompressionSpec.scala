package graft

import org.apache.spark.sql.functions._
import graft.functions.{Codecs, Compression, LargeMessage}
import graft.model.Envelope

/** Per-message compression (pkg/compression + the large-message
  * compression knob, large_message.go:33): every codec round-trips,
  * and the claim-check/handle-key pipeline composes with it. */
class CompressionSpec extends SparkFunSuite {

  private val sample =
    ("canal-json message body " * 40 + "tailé\n").getBytes("UTF-8")

  test("every codec round-trips bytes; compressible input shrinks") {
    for (cc <- Seq(Compression.Snappy, Compression.Lz4, Compression.Zstd)) {
      val packed = Compression.encode(cc, sample)
      assert(packed.length < sample.length, s"$cc should shrink repetitive text")
      assert(Compression.decode(cc, packed).toSeq == sample.toSeq, cc)
    }
    assert(Compression.encode(Compression.None, sample) eq sample)
    assert(!Compression.supported("gzip9"))
    intercept[RuntimeException](Compression.encode("gzip9", sample))
  }

  test("columnar compress/decompress inverts over the encoded envelope") {
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val encoded = Codecs.canalJson(env).select(col("_row_id"), col("_value"))
    for (cc <- Seq(Compression.Snappy, Compression.Lz4, Compression.Zstd)) {
      val packed = LargeMessage.compressed(encoded, cc)
      assert(packed.select(col("_codec")).head().getString(0) == cc)
      val back = LargeMessage.decompressed(packed, cc)
        .select(col("_row_id"), col("_value"))
      val orig = encoded.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val rt = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rt == orig, s"$cc round trip over the wire frame")
      // compression actually bites on the wire payloads
      val rawBytes = encoded.select(sum(length(col("_value")))).head().getLong(0)
      val packedBytes = packed.select(sum(length(col("_value_bin")))).head().getLong(0)
      assert(packedBytes < rawBytes, s"$cc shrank the message stream")
    }
  }

  test("claim-check pipeline composes with compression") {
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val checked = LargeMessage.claimCheck(
      Codecs.canalJson(env), maxBytes = 210, locationPrefix = "s3://claims")
    val packed = LargeMessage.compressed(checked, Compression.Zstd)
    val back = LargeMessage.decompressed(packed, Compression.Zstd)
    // pointers and small messages both survive
    assert(back.filter(col("_large") &&
      !col("_value").contains("claimCheckLocation")).count() == 0)
    assert(back.count() == checked.count())
  }
}
