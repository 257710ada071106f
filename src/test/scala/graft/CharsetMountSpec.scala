package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.model.TiKvCodec
import graft.model.TiKvCodec._
import graft.operators.RawKvMounter
import graft.operators.RawKvMounter.{KvColumn, KvTableMeta}

/** Charset-aware mount: TiKV stores string cells as raw bytes in the
  * COLUMN's character set, and the mounter transcodes them to the
  * UTF-8 strings the reference emits — its GBK matrix decodes
  * char/varchar/text to the Chinese text while blob-class columns
  * keep the raw GBK bytes (pkg/common/event/mounter_test.go:729-739;
  * tests/integration_tests/charset_gbk). Byte-level pin: the
  * reference's fixture bytes C4E3BAC3CAC0BDE7 ARE "你好世界" in GBK
  * (mounter_test.go:735-738). */
class CharsetMountSpec extends SparkFunSuite {

  private val gbk = java.nio.charset.Charset.forName("GBK")

  private val meta = KvTableMeta(301L, "test", "gbk_t", Seq(
    KvColumn(1L, "id", "bigint", nullable = false),
    KvColumn(2L, "name", "varchar(128)", charset = "gbk"),
    KvColumn(3L, "country", "char(32)", charset = "gbk"),
    KvColumn(4L, "description", "text", charset = "gbk"),
    KvColumn(5L, "payload", "tinyblob"), // blob: raw bytes, never transcoded
    KvColumn(6L, "plain", "varchar(16)"), // default charset = utf8: no-op
    KvColumn(7L, "west", "varchar(16)", charset = "latin1")),
    handleCol = "id")

  private val rawSchema = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("old_value", BinaryType), StructField("op_type", StringType),
    StructField("start_ts", LongType), StructField("commit_ts", LongType)))

  private def mount(value: Array[Byte], handle: Long = 1L): Row = {
    val key = TiKvCodec.encodeRecordKey(301L, IntHandle(handle))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(key, value, null, "put", 9L, 10L)), 1), rawSchema)
    RawKvMounter.mountTable(raw, meta).collect().head.getStruct(6)
  }

  test("the reference's pinned GBK bytes decode to the Chinese text") {
    // mounter_test.go's fixture: C4E3BAC3CAC0BDE7 = 你好世界 in GBK
    val pinned = Array(0xC4, 0xE3, 0xBA, 0xC3, 0xCA, 0xC0, 0xBD, 0xE7)
      .map(_.toByte)
    assert("你好世界".getBytes(gbk).toSeq == pinned.toSeq)
    assert(new String(pinned, gbk) == "你好世界")
  }

  test("v2 mount: GBK char/varchar/text transcode to UTF-8; blob keeps raw bytes") {
    val gbkBytes = "你好,世界".getBytes(gbk)
    val value = TiKvCodec.encodeV2(Seq(
      2L -> Some("测试".getBytes(gbk)),
      3L -> Some("中国".getBytes(gbk)),
      4L -> Some(gbkBytes),
      5L -> Some(gbkBytes), // tinyblob: same bytes must stay raw
      6L -> Some("plain".getBytes("UTF-8")),
      7L -> Some("café".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))))
    val r = mount(value)
    assert(r.getLong(0) == 1L)
    assert(r.getString(1) == "测试")
    assert(r.getString(2) == "中国")
    assert(r.getString(3) == "你好,世界")
    assert(r.getAs[Array[Byte]](4).toSeq == gbkBytes.toSeq,
      "blob-class columns carry the raw GBK bytes untranscoded")
    assert(r.getString(5) == "plain")
    assert(r.getString(6) == "café")
  }

  test("v1 mount: the same transcode applies to old-format rows") {
    val v1 = TiKvCodec.encodeV1(Seq(
      2L -> DBytes("测试".getBytes(gbk)),
      4L -> DBytes("你好".getBytes(gbk)),
      5L -> DBytes("你好".getBytes(gbk))))
    val r = mount(v1, handle = 2L)
    assert(r.getString(1) == "测试")
    assert(r.getString(3) == "你好")
    assert(r.getAs[Array[Byte]](4).toSeq == "你好".getBytes(gbk).toSeq)
  }

  test("a GBK string primary key decodes from the record key's charset bytes") {
    val m2 = KvTableMeta(302L, "test", "gbk_pk", Seq(
      KvColumn(1L, "name", "varchar(32)", nullable = false, charset = "gbk"),
      KvColumn(2L, "v", "bigint")),
      handleCol = "name")
    val key = TiKvCodec.encodeRecordKey(302L,
      CommonHandle(Seq(DBytes("测试".getBytes(gbk)))))
    val value = TiKvCodec.encodeV2(Seq(2L -> Some(TiKvCodec.intCell(5L))))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(key, value, null, "put", 9L, 10L)), 1), rawSchema)
    val r = RawKvMounter.mountTable(raw, m2).collect().head.getStruct(6)
    assert(r.getString(0) == "测试")
    assert(r.getLong(1) == 5L)
  }

  test("charset embedded in the raw MySQL type text is honored (registry-built metas)") {
    val m = KvTableMeta(304L, "test", "ddl_t", Seq(
      KvColumn(1L, "id", "bigint", nullable = false),
      KvColumn(2L, "name", "varchar(128) CHARACTER SET gbk")),
      handleCol = "id")
    val key = TiKvCodec.encodeRecordKey(304L, IntHandle(1L))
    val value = TiKvCodec.encodeV2(Seq(2L -> Some("测试".getBytes(gbk))))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(key, value, null, "put", 9L, 10L)), 1), rawSchema)
    assert(RawKvMounter.mountTable(raw, m).collect().head
      .getStruct(6).getString(1) == "测试")
  }

  test("utf8/utf8mb4/ascii columns never pay a transcode") {
    // the transcoder is None for UTF-8-compatible charsets — the hot
    // path stays the zero-copy decodeCell branch
    Seq("", "utf8", "utf8mb4", "ascii").foreach { cs =>
      val c = KvColumn(9L, "x", "varchar(8)", charset = cs)
      val value = TiKvCodec.encodeV2(Seq(9L -> Some("ok".getBytes("UTF-8"))))
      val m = KvTableMeta(303L, "t", "t", Seq(
        KvColumn(1L, "id", "bigint", nullable = false), c), handleCol = "id")
      val key = TiKvCodec.encodeRecordKey(303L, IntHandle(1L))
      val raw = spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(Row(key, value, null, "put", 9L, 10L)), 1), rawSchema)
      assert(RawKvMounter.mountTable(raw, m).collect().head
        .getStruct(6).getString(1) == "ok")
    }
  }
}
