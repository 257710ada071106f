package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.model.TiKvCodec
import graft.model.TiKvCodec._
import graft.operators.RawKvMounter
import graft.operators.RawKvMounter.{KvColumn, KvTableMeta}

/** Charset semantics of the mount, per source dialect.
  *
  * TiDB dialect (default, the reference's only mode): TiDB converts
  * non-utf8 charset data to utf8mb4 BEFORE storage, so TiKV row bytes
  * for char/varchar/text are ALWAYS UTF-8 regardless of the declared
  * column charset and the reference mounter does no transcoding — its
  * GBK matrix (pkg/common/event/mounter_test.go:729-739;
  * tests/integration_tests/charset_gbk) mounts the Chinese text
  * directly while blob-class columns keep raw bytes (the tinyblob
  * fixture C4E3BAC3CAC0BDE7 stays those bytes, which ARE "你好世界"
  * in GBK — the bytes survive because blob, not because charset).
  *
  * mysql-native dialect (explicit opt-in for MySQL-native byte
  * sources): stored string bytes live in the DECLARED column charset
  * and the mount transcodes gbk/gb18030/latin1 to UTF-8. MySQL
  * `latin1` maps to cp1252 (windows-1252), not ISO-8859-1. */
class CharsetMountSpec extends SparkFunSuite {

  private val gbk = java.nio.charset.Charset.forName("GBK")

  private def meta(dialect: String) = KvTableMeta(301L, "test", "gbk_t", Seq(
    KvColumn(1L, "id", "bigint", nullable = false),
    KvColumn(2L, "name", "varchar(128)", charset = "gbk"),
    KvColumn(3L, "country", "char(32)", charset = "gbk"),
    KvColumn(4L, "description", "text", charset = "gbk"),
    KvColumn(5L, "payload", "tinyblob"), // blob: raw bytes, never transcoded
    KvColumn(6L, "plain", "varchar(16)"), // default charset = utf8: no-op
    KvColumn(7L, "west", "varchar(16)", charset = "latin1")),
    handleCol = "id", dialect = dialect)

  private val rawSchema = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("old_value", BinaryType), StructField("op_type", StringType),
    StructField("start_ts", LongType), StructField("commit_ts", LongType)))

  private def mount(m: KvTableMeta, value: Array[Byte], handle: Long = 1L): Row = {
    val key = TiKvCodec.encodeRecordKey(m.tableId, IntHandle(handle))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(key, value, null, "put", 9L, 10L)), 1), rawSchema)
    RawKvMounter.mountTable(raw, m).collect().head.getStruct(6)
  }

  test("the reference's pinned GBK bytes decode to the Chinese text") {
    // mounter_test.go's tinyblob fixture: C4E3BAC3CAC0BDE7 = 你好世界 in GBK
    val pinned = Array(0xC4, 0xE3, 0xBA, 0xC3, 0xCA, 0xC0, 0xBD, 0xE7)
      .map(_.toByte)
    assert("你好世界".getBytes(gbk).toSeq == pinned.toSeq)
    assert(new String(pinned, gbk) == "你好世界")
  }

  test("tidb dialect (default): GBK-declared columns carry UTF-8 bytes and " +
    "mount WITHOUT transcoding; blob keeps raw bytes") {
    // what a real TiDB upstream stores: utf8mb4 bytes, whatever the
    // declared charset (the reference mounter does no transcoding —
    // mounter_test.go:729-739 reads the text straight out)
    val blobGbk = "你好,世界".getBytes(gbk) // blob content: arbitrary bytes
    val value = TiKvCodec.encodeV2(Seq(
      2L -> Some("测试".getBytes("UTF-8")),
      3L -> Some("中国".getBytes("UTF-8")),
      4L -> Some("你好,世界".getBytes("UTF-8")),
      5L -> Some(blobGbk),
      6L -> Some("plain".getBytes("UTF-8")),
      7L -> Some("café".getBytes("UTF-8")))) // latin1-declared: still utf8 bytes
    val r = mount(meta("tidb"), value)
    assert(r.getLong(0) == 1L)
    assert(r.getString(1) == "测试")
    assert(r.getString(2) == "中国")
    assert(r.getString(3) == "你好,世界")
    assert(r.getAs[Array[Byte]](4).toSeq == blobGbk.toSeq,
      "blob-class columns carry raw bytes untouched")
    assert(r.getString(5) == "plain")
    assert(r.getString(6) == "café")
  }

  test("tidb dialect: encodeImage writes UTF-8 bytes for GBK-declared columns " +
    "(what TiDB actually stores), and the round trip is the identity") {
    val m = meta("tidb")
    val img = RawKvMounter.encodeImage(m,
      Seq(1L, "测试", "中国", "你好", Array[Byte](1, 2), "p", "café"))
    // the stored cell for the GBK-declared varchar must be UTF-8 bytes
    val cells = TiKvCodec.decodeV2(img)
    assert(cells.cell(2L).get.toSeq == "测试".getBytes("UTF-8").toSeq,
      "tidb dialect stores utf8mb4 bytes — no real upstream produces GBK bytes")
    val r = mount(m, img)
    assert(r.getString(1) == "测试" && r.getString(3) == "你好")
  }

  test("mysql-native dialect: GBK char/varchar/text transcode to UTF-8; " +
    "blob keeps raw bytes") {
    val gbkBytes = "你好,世界".getBytes(gbk)
    val value = TiKvCodec.encodeV2(Seq(
      2L -> Some("测试".getBytes(gbk)),
      3L -> Some("中国".getBytes(gbk)),
      4L -> Some(gbkBytes),
      5L -> Some(gbkBytes), // tinyblob: same bytes must stay raw
      6L -> Some("plain".getBytes("UTF-8")),
      7L -> Some(Array(0x63, 0x61, 0x66, 0xE9, 0x20, 0x80).map(_.toByte))))
    val r = mount(meta("mysql-native"), value)
    assert(r.getLong(0) == 1L)
    assert(r.getString(1) == "测试")
    assert(r.getString(2) == "中国")
    assert(r.getString(3) == "你好,世界")
    assert(r.getAs[Array[Byte]](4).toSeq == gbkBytes.toSeq,
      "blob-class columns carry the raw GBK bytes untranscoded")
    assert(r.getString(5) == "plain")
    // MySQL latin1 is cp1252: 0xE9=é and 0x80=€ (ISO-8859-1 would map
    // 0x80 to a C1 control character, not the euro sign)
    assert(r.getString(6) == "café €")
  }

  test("mysql-native dialect: v1 rows transcode the same way") {
    val v1 = TiKvCodec.encodeV1(Seq(
      2L -> DBytes("测试".getBytes(gbk)),
      4L -> DBytes("你好".getBytes(gbk)),
      5L -> DBytes("你好".getBytes(gbk))))
    val r = mount(meta("mysql-native"), v1, handle = 2L)
    assert(r.getString(1) == "测试")
    assert(r.getString(3) == "你好")
    assert(r.getAs[Array[Byte]](4).toSeq == "你好".getBytes(gbk).toSeq)
  }

  test("v1 rows in tidb dialect never transcode either") {
    val utf8 = "测试".getBytes("UTF-8")
    val v1 = TiKvCodec.encodeV1(Seq(2L -> DBytes(utf8)))
    val r = mount(meta("tidb"), v1, handle = 3L)
    assert(r.getString(1) == "测试")
  }

  test("mysql-native: a GBK string primary key decodes from the key's " +
    "charset bytes; tidb: the same key bytes are UTF-8") {
    def pkMeta(dialect: String) = KvTableMeta(302L, "test", "gbk_pk", Seq(
      KvColumn(1L, "name", "varchar(32)", nullable = false, charset = "gbk"),
      KvColumn(2L, "v", "bigint")),
      handleCol = "name", dialect = dialect)
    def run(m: KvTableMeta, keyBytes: Array[Byte]): Row = {
      val key = TiKvCodec.encodeRecordKey(302L, CommonHandle(Seq(DBytes(keyBytes))))
      val value = TiKvCodec.encodeV2(Seq(2L -> Some(TiKvCodec.intCell(5L))))
      val raw = spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(Row(key, value, null, "put", 9L, 10L)), 1), rawSchema)
      RawKvMounter.mountTable(raw, m).collect().head.getStruct(6)
    }
    val native = run(pkMeta("mysql-native"), "测试".getBytes(gbk))
    assert(native.getString(0) == "测试" && native.getLong(1) == 5L)
    val tidb = run(pkMeta("tidb"), "测试".getBytes("UTF-8"))
    assert(tidb.getString(0) == "测试" && tidb.getLong(1) == 5L)
  }

  test("charset embedded in the raw MySQL type text is honored " +
    "(registry-built metas, mysql-native only)") {
    val m = KvTableMeta(304L, "test", "ddl_t", Seq(
      KvColumn(1L, "id", "bigint", nullable = false),
      KvColumn(2L, "name", "varchar(128) CHARACTER SET gbk")),
      handleCol = "id", dialect = "mysql-native")
    val key = TiKvCodec.encodeRecordKey(304L, IntHandle(1L))
    val value = TiKvCodec.encodeV2(Seq(2L -> Some("测试".getBytes(gbk))))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(key, value, null, "put", 9L, 10L)), 1), rawSchema)
    assert(RawKvMounter.mountTable(raw, m).collect().head
      .getStruct(6).getString(1) == "测试")
  }

  test("utf8/utf8mb4/ascii columns never pay a transcode in either dialect") {
    // the transcoder is None for UTF-8-compatible charsets — the hot
    // path stays the zero-copy decodeCell branch
    for (dialect <- Seq("tidb", "mysql-native");
         cs <- Seq("", "utf8", "utf8mb4", "ascii")) {
      val c = KvColumn(9L, "x", "varchar(8)", charset = cs)
      val value = TiKvCodec.encodeV2(Seq(9L -> Some("ok".getBytes("UTF-8"))))
      val m = KvTableMeta(303L, "t", "t", Seq(
        KvColumn(1L, "id", "bigint", nullable = false), c),
        handleCol = "id", dialect = dialect)
      val key = TiKvCodec.encodeRecordKey(303L, IntHandle(1L))
      val raw = spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(Row(key, value, null, "put", 9L, 10L)), 1), rawSchema)
      assert(RawKvMounter.mountTable(raw, m).collect().head
        .getStruct(6).getString(1) == "ok")
    }
  }
}
