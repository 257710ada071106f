package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.OpenBatch

/** Open-protocol batch wire format (open/encoder.go:32-273,
  * decoder.go:92-135): golden byte vectors, greedy boundary rules,
  * roundtrip identity, and the DataFrame pack/unpack layer. */
class OpenBatchSpec extends AnyFunSuite {

  private def ev(k: String, v: String): (Array[Byte], Array[Byte]) =
    (k.getBytes(UTF_8), v.getBytes(UTF_8))

  test("golden vector: one event, exact bytes") {
    val batches = OpenBatch.packBatches(Seq(ev("KY", "VAL!")), 16, Int.MaxValue)
    assert(batches.size == 1)
    val b = batches.head
    assert(b.rows == 1)
    // Key = version(8, big-endian 1) ++ keyLen(8, =2) ++ "KY"
    val expKey = Array[Byte](0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 2) ++
      "KY".getBytes(UTF_8)
    assert(java.util.Arrays.equals(b.key, expKey))
    // Value = valueLen(8, =4) ++ "VAL!"
    val expVal = Array[Byte](0, 0, 0, 0, 0, 0, 0, 4) ++ "VAL!".getBytes(UTF_8)
    assert(java.util.Arrays.equals(b.value, expVal))
  }

  test("count boundary: maxBatchSize splits greedily in order") {
    val events = (1 to 5).map(i => ev(s"k$i", s"v$i"))
    val batches = OpenBatch.packBatches(events, maxBatchSize = 2, Int.MaxValue)
    assert(batches.map(_.rows) == Seq(2, 2, 1))
    // order preserved: first batch holds k1,k2
    val first = OpenBatch.unpackBatch(batches.head.key, batches.head.value)
    assert(first.map(p => new String(p._1, UTF_8)) == Seq("k1", "k2"))
    assert(first.map(p => new String(p._2, UTF_8)) == Seq("v1", "v2"))
  }

  test("byte boundary: maxBatchedBytes counts framing + record overhead") {
    // each event: key 2 + value 2 + 16 framing = 20; message base:
    // version 8 + maxRecordOverhead 36 = 44. Cap at 44+20+20 = 84
    // admits exactly two events (a third would make 44+60 > 84).
    val events = (1 to 5).map(i => ev(s"k$i", s"v$i"))
    val batches = OpenBatch.packBatches(events, 100, maxBatchedBytes = 84)
    assert(batches.map(_.rows) == Seq(2, 2, 1))
    // one byte less only fits one event per message
    val tight = OpenBatch.packBatches(events, 100, maxBatchedBytes = 83)
    assert(tight.map(_.rows) == Seq(1, 1, 1, 1, 1))
  }

  test("oversized single event still ships as its own message") {
    val big = ev("key", "x" * 1000)
    val batches = OpenBatch.packBatches(Seq(big, ev("k2", "v2")), 16, 100)
    assert(batches.map(_.rows) == Seq(1, 1))
    val back = OpenBatch.unpackBatch(batches.head.key, batches.head.value)
    assert(new String(back.head._2, UTF_8) == "x" * 1000)
  }

  test("roundtrip identity over random event sets") {
    val rnd = new scala.util.Random(42)
    (0 until 20).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val events = (0 until n).map { i =>
        ev(s"""{"ts":${1000 + i},"t":1}""",
          rnd.alphanumeric.take(rnd.nextInt(60)).mkString)
      }
      val size = 1 + rnd.nextInt(8)
      val bytes = 60 + rnd.nextInt(400)
      val batches = OpenBatch.packBatches(events, size, bytes)
      assert(batches.map(_.rows).sum == n)
      assert(batches.forall(_.rows <= size))
      val back = batches.flatMap(b => OpenBatch.unpackBatch(b.key, b.value))
      assert(back.map(p => new String(p._1, UTF_8)) ==
        events.map(p => new String(p._1, UTF_8)))
      assert(back.map(p => new String(p._2, UTF_8)) ==
        events.map(p => new String(p._2, UTF_8)))
    }
  }

  test("DDL message: single-event framing, t=2 key, {q,t} value") {
    val (k, v) = OpenBatch.ddlMessage(777L, "app", "events_1",
      "ALTER TABLE events_1 ADD COLUMN note text", actionType = 5)
    assert(OpenBatch.readBe64(k, 0) == 1L) // batch version
    val events = OpenBatch.unpackBatch(k, v)
    assert(events.size == 1)
    val keyJson = new String(events.head._1, UTF_8)
    val valJson = new String(events.head._2, UTF_8)
    assert(keyJson ==
      """{"ts":777,"scm":"app","tbl":"events_1","t":2}""")
    assert(valJson ==
      """{"q":"ALTER TABLE events_1 ADD COLUMN note text","t":5}""")
  }

  test("checkpoint message: t=3 key, value is the bare zero length") {
    val (k, v) = OpenBatch.resolvedMessage(424242L)
    val events = OpenBatch.unpackBatch(k, v)
    assert(events.size == 1)
    assert(new String(events.head._1, UTF_8) == """{"ts":424242,"t":3}""")
    assert(events.head._2.isEmpty)
    // wire value is exactly the 8-byte zero prefix (encoder.go:268)
    assert(v.length == 8 && v.forall(_ == 0))
  }

  test("per-event value compression inside the framing (lz4/snappy/zstd)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val body = "{\"u\":{\"id\":1,\"text\":\"" + ("abcdef" * 40) + "\"}}"
    val msgs = Seq((0L, 1000L, 1L, """{"ts":1000,"t":1}""", body))
      .toDF("_partition", "_commit_ts", "_row_id", "_key", "_value")
    Seq("lz4", "snappy", "zstd").foreach { codec =>
      val packed = OpenBatch.packOpenBatches(msgs, 16, valueCodec = codec)
      val vlen = packed.select(length(col("_value_bytes"))).head().getInt(0)
      // framed value = 8-byte length prefix + compressed body; the
      // repetitive body must actually shrink
      assert(vlen < body.length, s"$codec: framed $vlen vs plain ${body.length}")
      val back = OpenBatch.unpackOpenBatches(packed, valueCodec = codec)
        .select("_value").head().getString(0)
      assert(back == body, s"$codec roundtrip")
      // the consumer-side frame unwrap decompresses too (and leaves an
      // empty checkpoint value alone)
      val frames = packed.select(col("_partition"),
        col("_batch_seq").cast("long").as("_commit_ts"),
        org.apache.spark.sql.functions.lit("batch").as("_kind"),
        graft.functions.OpenBatch.frameJsonCol(
          col("_key_bytes"), col("_value_bytes")).as("_value"))
      val un = MqConsume.unwrapOpenBatchFrames(frames, valueCodec = codec)
        .select("_value").head().getString(0)
      assert(un == body, s"$codec frame unwrap")
    }
    // ddl message value compresses under the codec as well
    val (dk, dv) = OpenBatch.ddlMessage(9L, "app", "t",
      "ALTER TABLE t COMMENT '" + ("x" * 400) + "'", 17, valueCodec = "zstd")
    val events = OpenBatch.unpackBatch(dk, dv)
    val q = new String(graft.functions.Compression.decode("zstd", events.head._2),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(q.contains("\"t\":17") && q.length > 400)
  }

  test("unsupported version is rejected") {
    val batches = OpenBatch.packBatches(Seq(ev("k", "v")), 16, Int.MaxValue)
    val bad = batches.head.key.clone()
    bad(7) = 9
    intercept[IllegalArgumentException] {
      OpenBatch.unpackBatch(bad, batches.head.value)
    }
  }

  test("DataFrame pack/unpack: per-partition order and batch identity") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val msgs = (1 to 23).map { i =>
      (i % 3L, 1000L + i, i.toLong, s"""{"ts":${1000 + i},"t":1}""", s"""{"u":{"id":$i}}""")
    }.toDF("_partition", "_commit_ts", "_row_id", "_key", "_value")
    val packed = graft.functions.OpenBatch.packOpenBatches(msgs, maxBatchSize = 4)
    val rows = packed.select("_partition", "_batch_seq", "_batch_rows")
      .as[(Long, Int, Int)].collect().toSeq
    // 23 events over 3 partitions (8, 8, 7) at batch size 4
    assert(rows.map(_._3).sum == 23)
    assert(rows.forall(_._3 <= 4))
    val unpacked = graft.functions.OpenBatch.unpackOpenBatches(packed)
    val back = unpacked
      .orderBy(col("_partition"), col("_batch_seq"), col("_batch_idx"))
      .select("_partition", "_key").as[(Long, String)].collect()
    // events come back in commit-ts order within each partition
    val expected = msgs.orderBy(col("_partition"), col("_commit_ts"), col("_row_id"))
      .select("_partition", "_key").as[(Long, String)].collect()
    assert(back.toSeq == expected.toSeq)
  }

  test("positional (count-cap-only) pack is byte-identical to the greedy path") {
    val spark = SparkSpec.spark
    import spark.implicits._
    // multiple groups, awkward remainders, a repeated sort key, and a
    // compressing codec — everything that could diverge between the
    // window-positional fast path and the per-group greedy walk
    val msgs = (1 to 37).map { i =>
      (i % 4L, 1000L + (i % 9), i.toLong,
        s"""{"ts":${1000 + (i % 9)},"t":1}""",
        s"""{"u":{"id":$i,"pad":"${"ab" * (i % 13)}"}}""")
    }.toDF("_partition", "_commit_ts", "_row_id", "_key", "_value")
    Seq("none", "lz4").foreach { codec =>
      // Int.MaxValue byte cap → positional path; MaxValue-1 → greedy
      // path with a cap these tiny frames can never reach
      val pos = OpenBatch.packOpenBatches(msgs, maxBatchSize = 5,
        maxBatchedBytes = Int.MaxValue, valueCodec = codec)
      val greedy = OpenBatch.packOpenBatches(msgs, maxBatchSize = 5,
        maxBatchedBytes = Int.MaxValue - 1, valueCodec = codec)
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select(col("_partition"), col("_batch_seq").cast("long"),
          base64(col("_key_bytes")), base64(col("_value_bytes")),
          col("_batch_rows").cast("long"))
        .as[(Long, Long, String, String, Long)].collect().toSeq.sorted
      assert(canon(pos) == canon(greedy), s"codec=$codec")
    }
  }
}
