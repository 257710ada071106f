package graft

import graft.functions.RowChecksum
import graft.model.MySqlDdl
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Wire-compatibility of the CRC32-IEEE e2e row checksum
  * (verify_checksum.go:90-152 buildChecksumBytes/calculateChecksum).
  *
  * The reference ships no checksum golden file, so every expected
  * value here was computed INDEPENDENTLY of the code under test: the
  * Go algorithm (per-column LE typed bytes, crc32-IEEE fold) applied
  * by hand (python struct+zlib.crc32 — zlib's CRC is the IEEE
  * polynomial Go's crc32.IEEETable uses) to the canonical literal
  * strings, then pinned as literal constants. A Go consumer folding
  * the same canonical values gets exactly these uint32s.
  */
class RowChecksumSpec extends SparkFunSuite {

  private val ddl =
    """CREATE TABLE cks (
      |  id INT PRIMARY KEY,
      |  t TINYINT,
      |  s SMALLINT UNSIGNED,
      |  big BIGINT UNSIGNED,
      |  sbig BIGINT,
      |  y YEAR,
      |  f FLOAT,
      |  d DOUBLE,
      |  dec DECIMAL(10,2),
      |  b BIT(5),
      |  e ENUM('a','b','c'),
      |  st SET('x','y','z'),
      |  dt DATETIME(3),
      |  dte DATE,
      |  tm TIME(2),
      |  ch VARCHAR(20),
      |  vb VARBINARY(10),
      |  bin BINARY(4),
      |  js JSON,
      |  vec VECTOR(3),
      |  nul VARCHAR(5)
      |)""".stripMargin

  private lazy val table = MySqlDdl.parseCreateTable(ddl).get

  private def frame(rows: Seq[Seq[String]], op: String = "I") = {
    val img = StructType(table.cols.map(c => StructField(c.name, StringType, nullable = true)))
    val schema = StructType(Seq(
      StructField("before", img, nullable = true),
      StructField("after", img, nullable = true),
      StructField("_op", StringType)))
    val sparkRows = rows.map(vals => Row(null, Row(vals: _*), op))
    spark.createDataFrame(sparkRows.asJava, schema)
  }

  private val row1: Seq[String] = Seq(
    "7", "-3", "65535", "18446744073709551615", "-9223372036854775808",
    "2023", "3.5", "-1.25", "12345.60", "21", "b", "x,z",
    "2023-01-02 03:04:05.678", "2023-01-02", "11:22:33.45",
    "hello, 世界", "0x0A0B0C", "0x41", """{"k":1}""", "[1,2.5,-3]", null)

  private val row2: Seq[String] =
    "8" +: Seq.fill(table.cols.length - 1)(null.asInstanceOf[String])

  private def checksums(rows: Seq[Seq[String]]): Seq[Long] =
    RowChecksum.withRowChecksum(frame(rows), table.cols)
      .select(col("_checksum_current")).collect().map(_.getLong(0)).toSeq

  test("full type-matrix row folds to the hand-computed Go CRC32") {
    // every column class at once: int family signed/unsigned incl.
    // uint64 max and int64 min, year, float/double, decimal at scale,
    // bit, enum index, set mask, datetime/date/time at fsp, utf8 text,
    // varbinary, zero-padded BINARY(n), json, vector, trailing NULL
    assert(checksums(Seq(row1)) === Seq(3833763225L))
  }

  test("NULL columns contribute no bytes (verify_checksum.go:112-114)") {
    assert(checksums(Seq(row2)) === Seq(3066545372L))
  }

  test("an absent image checksums to 0 — the 'not enabled' sentinel") {
    val out = RowChecksum.withRowChecksum(frame(Seq(row1)), table.cols)
      .select(col("_checksum_previous")).collect().map(_.getLong(0))
    assert(out === Array(0L)) // before is null ⇒ crc32("") = 0
  }

  test("token kinds: pinned single-column probes") {
    val tiny = table.cols.find(_.name == "t").get
    val flt = table.cols.find(_.name == "f").get
    val ch = table.cols.find(_.name == "ch").get
    def one(c: MySqlDdl.MySqlCol, v: Column): Long =
      spark.range(1).select(RowChecksum.checksumOf(Seq(c), Seq(v)).as("c"))
        .head().getLong(0)
    assert(one(tiny, lit("-3")) === 1667356769L) // LE8 two's complement
    // ±Inf and NaN coerce to float64 bits of 0.0 (verify_checksum.go:125-127)
    assert(one(flt, lit("Infinity")) === 1696784233L)
    assert(one(flt, lit("NaN")) === 1696784233L)
    assert(one(ch, lit("abc")) === 1726045491L) // LE4 length + utf8 bytes
  }

  test("checksum changes when any column's value changes") {
    val variants = Seq(
      row1.updated(1, "-4"),        // tinyint bits
      row1.updated(8, "12345.61"),  // decimal string
      row1.updated(11, "y"),        // set mask 2 instead of 5
      row1.updated(17, "0x42"))     // binary payload
    val base = checksums(Seq(row1)).head
    val others = checksums(variants)
    assert(others.forall(_ !== base))
    assert(others.distinct.length === others.length)
  }

  test("simple-protocol wire carriage: encode → decode → verify, tamper detected") {
    import graft.functions.{Codecs, Decoders}
    val img = StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType),
      StructField("k", LongType)))
    val schema = StructType(Seq(
      StructField("before", img, nullable = true),
      StructField("after", img, nullable = true),
      StructField("_op", StringType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_commit_ts", LongType)))
    val envRows = Seq(
      Row(null, Row(1L, 2.345, 9L), "I", "app", "t1", 100L),
      Row(Row(1L, 2.345, 9L), Row(1L, 7.5, 10L), "U", "app", "t1", 101L),
      Row(Row(1L, 7.5, 10L), null, "D", "app", "t1", 102L))
    val env = spark.createDataFrame(envRows.asJava, schema)
    val wire = Codecs.simpleProtocol(env, enableRowChecksum = true)
      .select(col("_value"))
    // the block rides the message-struct position, non-zero on the
    // populated image, zero on the absent one
    val first = wire.orderBy(col("_value")).head().getString(0)
    assert(first.contains("\"checksum\":{\"version\":1,\"corrupted\":false,\"current\":"))
    val decoded = Decoders.decodeSimple(wire, withChecksum = true)
    val verified = RowChecksum.verify(decoded, Codecs.envelopeCols)
    assert(verified.filter(col("_checksum_ok")).count() === 3)
    // bit-flip a digit of the money value inside the wire data image
    val tampered = wire.withColumn("_value",
      regexp_replace(col("_value"), "\"value\":\"7\\.50\"", "\"value\":\"7.51\""))
    val reverified = RowChecksum.verify(
      Decoders.decodeSimple(tampered, withChecksum = true), Codecs.envelopeCols)
    assert(reverified.filter(!col("_checksum_ok")).count() === 2) // U data + D old
  }

  test("SimpleAvro Val fold matches the Column fold on the envelope shape") {
    import graft.functions.{Codecs, SimpleAvro}
    // Column side over one envelope row
    val colSide = spark.range(1).select(RowChecksum.checksumOf(
      Codecs.envelopeCols,
      Seq(lit(42L), lit("123.40"), lit(7L))).as("c")).head().getLong(0)
    // driver side: same canonical values through the Val model
    val jvmSide = SimpleAvro.checksumOf(Seq(
      SimpleAvro.Val.L(42L), SimpleAvro.Val.S("123.40"), SimpleAvro.Val.L(7L)))
    assert(colSide === jvmSide)
  }

  test("whole-stage codegen path agrees with the interpreted path") {
    val on = checksums(Seq(row1, row2))
    val conf = spark.conf
    val keys = Seq("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val saved = keys.map { case (k, _) => k -> conf.getOption(k) }
    keys.foreach { case (k, v) => conf.set(k, v) }
    try assert(checksums(Seq(row1, row2)) === on)
    finally saved.foreach { case (k, ov) =>
      ov.fold(conf.unset(k))(conf.set(k, _)) }
  }
}
