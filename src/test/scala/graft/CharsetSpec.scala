package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{CharsetExpressions, Codecs, Decoders}

/** Charset / collation matrix (reference
  * tests/integration_tests/canal_json_basic/data/data_gbk.sql;
  * canal_json_encoder.go:32 ISO-8859-1 BLOB framing;
  * canal_json_decoder.go:458-459 reverse). */
class CharsetSpec extends SparkFunSuite {
  import CharsetExpressions._

  // data_gbk.sql's tinyblob literal 0xC4E3BAC3CAC0BDE7 is the GBK
  // encoding of this string
  private val nihao = "你好世界"
  private val nihaoGbk = Array(0xC4, 0xE3, 0xBA, 0xC3, 0xCA, 0xC0, 0xBD, 0xE7)
    .map(_.toByte)

  private def oneBin(bytes: Array[Byte]) = {
    val schema = StructType(Seq(StructField("b", BinaryType)))
    spark.createDataFrame(
      java.util.List.of[Row](Row(bytes)), schema)
  }

  test("charset_decode: canonical GBK bytes → UTF-8 text") {
    val out = oneBin(nihaoGbk).select(charsetDecode(col("b"), "GBK").as("s"))
      .head().getString(0)
    assert(out == nihao)
  }

  test("charset encode/decode round-trips across the legacy matrix") {
    for (cs <- Seq("GBK", "GB18030", "Big5", "ISO-8859-1", "UTF-8")) {
      val text = if (cs == "ISO-8859-1") "écran façade ¡hola!" else nihao
      val df = spark.createDataFrame(
        java.util.List.of[Row](Row(text)),
        StructType(Seq(StructField("s", StringType))))
      val back = df.select(
        charsetDecode(charsetEncode(col("s"), cs), cs).as("r"))
        .head().getString(0)
      assert(back == text, s"round trip through $cs")
    }
  }

  test("charset_decode is total: malformed bytes map to U+FFFD, not an error") {
    // 0x81 alone is an invalid GBK tail — the mounter-style decode
    // must stay lossy-but-total (REPLACE), never throw mid-changefeed
    val bad = Array(0xC4.toByte, 0x81.toByte, 0xFF.toByte)
    val out = oneBin(bad).select(charsetDecode(col("b"), "GBK").as("s"))
      .head().getString(0)
    assert(out.nonEmpty && out.contains('\uFFFD'))
  }

  test("canal_blob_json escapes control bytes into valid JSON and round-trips") {
    // every hostile byte class: control chars, quote, backslash,
    // high bytes — the regexp-escape paths would miss the controls
    val bytes = Array[Byte](0, 1, 9, 10, 13, 31, '"'.toByte, '\\'.toByte,
      'a'.toByte, 0x7F.toByte, 0x80.toByte, 0xC4.toByte, 0xFF.toByte)
    val json = oneBin(bytes)
      .select(concat(lit("{\"v\":"), canalBlobJson(col("b")), lit("}")).as("j"))
    val back = json.select(
      canalBlobBytes(get_json_object(col("j"), "$.v")).as("b"))
      .head().getAs[Array[Byte]](0)
    assert(back.toSeq == bytes.toSeq)
  }

  test("canal-json BLOB framing survives the full encode→decode wire") {
    val payload = StructType(Seq(
      StructField("id", LongType), StructField("img", BinaryType)))
    val envSchema = StructType(Seq(
      StructField("_row_id", LongType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_op", StringType),
      StructField("_commit_ts", LongType), StructField("_start_ts", LongType),
      StructField("before", payload), StructField("after", payload)))
    val hostile = Array[Byte](0, 10, '"'.toByte, '\\'.toByte, 0xC4.toByte,
      0xE3.toByte, 0x1F.toByte)
    val env = spark.createDataFrame(
      java.util.List.of[Row](
        Row(1L, "app", "t1", "I", 1700000000000000000L, 1699999999999999999L,
          null, Row(1L, hostile)),
        Row(2L, "app", "t1", "U", 1700000000000000001L, 1700000000000000000L,
          Row(2L, nihaoGbk), Row(2L, hostile))),
      envSchema)
    val decoded = Decoders.decodeCanalFor(Codecs.canalJsonFor(env, Seq("id")), payload)
      .orderBy("_commit_ms")
    val rows = decoded.collect()
    assert(rows(0).getAs[Row]("after").getAs[Array[Byte]]("img").toSeq == hostile.toSeq)
    assert(rows(1).getAs[Row]("before").getAs[Array[Byte]]("img").toSeq == nihaoGbk.toSeq)
    assert(rows(1).getAs[Row]("after").getAs[Array[Byte]]("img").toSeq == hostile.toSeq)
  }

  test("charset functions are registered for SQL via GraftExtensions") {
    import org.apache.spark.sql.SparkSession
    val shared = SparkSpec.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extended = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val hexLit = nihaoGbk.map(b => f"${b & 0xff}%02X").mkString
      val s = extended.sql(
        s"SELECT charset_decode(X'$hexLit', 'GBK') AS s").head().getString(0)
      assert(s == nihao)
      val n = extended.sql(
        s"SELECT charset_decode(charset_encode('$nihao', 'GB18030'), 'GB18030') AS s")
        .head().getString(0)
      assert(n == nihao)
      val j = extended.sql(
        "SELECT canal_blob_json(X'00C4FF22') AS j").head().getString(0)
      assert(j == "\"\\u0000\u00c4\u00ff\\\"\"")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
