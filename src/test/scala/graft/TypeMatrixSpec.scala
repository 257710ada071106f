package graft

import java.sql.Date
import java.time.LocalDateTime
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Codecs

/** Full scalar type matrix through the schema-driven encoders — the
  * reference's golden-data test (canal_json_basic/data/data.sql:5-45
  * exercises min/max of every numeric type; vector/data/data.sql the
  * VECTOR column). Every value must survive encode → wire → parse. */
class TypeMatrixSpec extends SparkFunSuite {

  private val payloadSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("i8", ByteType),
    StructField("i16", ShortType),
    StructField("i32", IntegerType),
    StructField("i64", LongType),
    StructField("u64", DecimalType(20, 0)), // unsigned BIGINT max
    StructField("f32", FloatType),
    StructField("f64", DoubleType),
    StructField("dec", DecimalType(18, 2)),
    StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("flag", BooleanType),
    StructField("d", DateType),
    StructField("t", TimestampNTZType),
    StructField("vec", ArrayType(FloatType))))

  private val maxRow = Row(1L, 127.toByte, 32767.toShort, Int.MaxValue, Long.MaxValue,
    new java.math.BigDecimal("18446744073709551615"), Float.MaxValue, Double.MaxValue,
    new java.math.BigDecimal("12345678901234.56"),
    "qu\"ote, comma \\ back ünïcode \t tab \r ret", Array[Byte](0, 1, 127, -128),
    true, Date.valueOf("2024-02-29"),
    LocalDateTime.parse("2024-02-29T23:59:59.999999"),
    Seq(1.5f, -2.25f))

  private val minRow = Row(2L, (-128).toByte, (-32768).toShort, Int.MinValue, Long.MinValue,
    new java.math.BigDecimal("0"), Float.MinPositiveValue, Double.MinPositiveValue,
    new java.math.BigDecimal("-0.01"),
    "", Array[Byte](), false, Date.valueOf("1970-01-01"),
    LocalDateTime.parse("1970-01-01T00:00:00"), Seq.empty[Float])

  private def envOf(rows: Row*) = {
    val envSchema = StructType(Seq(
      StructField("_row_id", LongType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_op", StringType),
      StructField("_commit_ts", LongType), StructField("_start_ts", LongType),
      StructField("before", payloadSchema), StructField("after", payloadSchema)))
    val data = rows.zipWithIndex.map { case (r, i) =>
      Row(i.toLong, "app", "types", "I", 1700000000000000000L + i, 1700000000000000000L - 1 + i,
        null, r)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      envSchema)
  }

  /** Wire-level parse schema: how each payload type comes back off the
    * JSON wire (bool arrives as MySQL-style 1/0, vector as its
    * bracketed rendering). */
  private val wireSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("i8", ByteType),
    StructField("i16", ShortType),
    StructField("i32", IntegerType),
    StructField("i64", LongType),
    StructField("u64", DecimalType(20, 0)),
    StructField("f32", FloatType),
    StructField("f64", DoubleType),
    StructField("dec", DecimalType(18, 2)),
    StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("flag", LongType),
    StructField("d", DateType),
    StructField("t", TimestampNTZType),
    StructField("vec", StringType)))

  test("canal generic encoder round-trips the full type matrix") {
    val env = envOf(maxRow, minRow)
    val encoded = Codecs.canalJsonFor(env, Seq("id"))
    // canal frames BINARY as ISO-8859-1 char strings (JavaSQLTypeBLOB,
    // canal_json_encoder.go:32) — parse as string, re-encode to bytes
    val canalWire = StructType(wireSchema.fields.map {
      case StructField("bin", _, n, m) => StructField("bin", StringType, n, m)
      case f => f
    })
    val msgSchema = StructType(Seq(
      StructField("database", StringType), StructField("table", StringType),
      StructField("pkNames", ArrayType(StringType)),
      StructField("type", StringType),
      StructField("data", ArrayType(canalWire))))
    val parsed = encoded.select(col("_row_id"),
      from_json(col("_value"), msgSchema,
        scala.jdk.CollectionConverters.MapHasAsJava(Map(
          "timestampNTZFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS")).asJava).as("m"))
      .select(col("_row_id"), col("m.pkNames").as("pks"),
        element_at(col("m.data"), 1)
          .withField("bin", graft.functions.CharsetExpressions.canalBlobBytes(
            element_at(col("m.data"), 1).getField("bin"))).as("w"))
    val rows = parsed.orderBy("_row_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getSeq[String](1) == Seq("id"))

    val w = rows(0).getStruct(2)
    assert(w.getByte(1) == 127.toByte && w.getShort(2) == 32767.toShort)
    assert(w.getInt(3) == Int.MaxValue && w.getLong(4) == Long.MaxValue)
    assert(w.getDecimal(5) == new java.math.BigDecimal("18446744073709551615"))
    assert(w.getFloat(6) == Float.MaxValue)
    assert(w.getDouble(7) == Double.MaxValue)
    assert(w.getDecimal(8).compareTo(new java.math.BigDecimal("12345678901234.56")) == 0)
    assert(w.getString(9) == "qu\"ote, comma \\ back ünïcode \t tab \r ret")
    assert(w.getAs[Array[Byte]](10).toSeq == Seq[Byte](0, 1, 127, -128))
    assert(w.getLong(11) == 1L, "boolean arrives MySQL-style 1/0")
    assert(w.getDate(12) == Date.valueOf("2024-02-29"))
    assert(w.getAs[LocalDateTime](13) == LocalDateTime.parse("2024-02-29T23:59:59.999999"))
    assert(w.getString(14) == "[1.5,-2.25]", "vector renders TiDB-style")

    val m = rows(1).getStruct(2)
    assert(m.getByte(1) == -128 && m.getInt(3) == Int.MinValue && m.getLong(4) == Long.MinValue)
    assert(m.getFloat(6) == Float.MinPositiveValue && m.getDouble(7) == Double.MinPositiveValue)
    assert(m.getDecimal(8).compareTo(new java.math.BigDecimal("-0.01")) == 0)
    assert(m.getString(9) == "" && m.getAs[Array[Byte]](10).isEmpty)
    assert(m.getLong(11) == 0L && m.getString(14) == "[]")
  }

  test("debezium generic encoder carries before/after for the matrix") {
    val env = envOf(maxRow)
      .withColumn("_op", lit("U"))
      .withColumn("before", col("after"))
    val encoded = Codecs.debeziumJsonFor(env)
    val msgSchema = StructType(Seq(
      StructField("before", wireSchema), StructField("after", wireSchema),
      StructField("op", StringType)))
    val p = encoded.select(from_json(col("_value"), msgSchema,
      scala.jdk.CollectionConverters.MapHasAsJava(Map(
        "timestampNTZFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS")).asJava).as("m"))
      .select("m.before.i64", "m.after.u64", "m.op").head()
    assert(p.getLong(0) == Long.MaxValue)
    assert(p.getDecimal(1) == new java.math.BigDecimal("18446744073709551615"))
    assert(p.getString(2) == "u")
  }

  test("generic decoders invert the generic encoders") {
    import graft.functions.Decoders
    val env = envOf(maxRow)
    val canal = Decoders.decodeCanalFor(Codecs.canalJsonFor(env, Seq("id")), wireSchema)
    val c = canal.select(col("_op"), col("_schema"), col("after.i64"),
      col("after.u64"), col("after.s")).head()
    assert(c.getString(0) == "I" && c.getString(1) == "app")
    assert(c.getLong(2) == Long.MaxValue)
    assert(c.getDecimal(3) == new java.math.BigDecimal("18446744073709551615"))
    assert(c.getString(4) == "qu\"ote, comma \\ back ünïcode \t tab \r ret")

    val deb = Decoders.decodeDebeziumFor(Codecs.debeziumJsonFor(env), wireSchema)
    val d = deb.select(col("_commit_ts"), col("after.vec"), col("before")).head()
    assert(d.getLong(0) == 1700000000000000000L, "full-ns commit ts lossless")
    assert(d.getString(1) == "[1.5,-2.25]")
    assert(d.isNullAt(2), "insert has no pre-image")
  }

  test("generic avro schema-gen round-trips the matrix losslessly") {
    import graft.functions.AvroCodec
    val env = envOf(maxRow, minRow)
    val decoded = AvroCodec.decodeGeneric(
      AvroCodec.encodeGeneric(env, payloadSchema), payloadSchema)
      .orderBy("_row_id").collect()
    assert(decoded.length == 2)
    val w = decoded(0)
    assert(w.getAs[Byte]("i8") == 127.toByte)
    assert(w.getAs[Long]("i64") == Long.MaxValue)
    assert(w.getAs[java.math.BigDecimal]("u64")
      .compareTo(new java.math.BigDecimal("18446744073709551615")) == 0)
    assert(w.getAs[Float]("f32") == Float.MaxValue)
    assert(w.getAs[java.math.BigDecimal]("dec")
      .compareTo(new java.math.BigDecimal("12345678901234.56")) == 0)
    assert(w.getAs[String]("s") == "qu\"ote, comma \\ back ünïcode \t tab \r ret")
    assert(w.getAs[Array[Byte]]("bin").toSeq == Seq[Byte](0, 1, 127, -128))
    assert(w.getAs[Boolean]("flag"))
    assert(w.getAs[Date]("d") == Date.valueOf("2024-02-29"))
    assert(w.getAs[LocalDateTime]("t") == LocalDateTime.parse("2024-02-29T23:59:59.999999"))
    assert(w.getSeq[Float](w.fieldIndex("vec")) == Seq(1.5f, -2.25f))
    val m = decoded(1)
    assert(m.getAs[Byte]("i8") == -128 && !m.getAs[Boolean]("flag"))
    assert(m.getAs[String]("s") == "" && m.getSeq[Float](m.fieldIndex("vec")).isEmpty)
    // generated schema is stable + registry-compatible
    val json = AvroCodec.avroSchemaFor(payloadSchema.fields.toSeq, "Payload")
    val store = new graft.functions.AvroRegistry.InMemoryStore
    assert(store.register("types-value", json) == store.register("types-value", json))
  }

  test("avro generic codec round-trips TimestampType (timestamp-micros)") {
    import graft.functions.AvroCodec
    val tsPayload = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType)))
    val envSchema = StructType(Seq(
      StructField("_row_id", LongType), StructField("before", tsPayload),
      StructField("after", tsPayload)))
    val inst = java.sql.Timestamp.from(java.time.Instant.parse("2024-02-29T23:59:59.123456Z"))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(
        Seq(Row(1L, null, Row(1L, inst)))).asJava), envSchema)
    val decoded = AvroCodec.decodeGeneric(
      AvroCodec.encodeGeneric(df, tsPayload), tsPayload).head()
    assert(decoded.getAs[java.sql.Timestamp]("ts") == inst,
      "TimestampType must come back as java.sql.Timestamp, micros preserved")
  }

  test("wide table: 64-column payload round-trips the generic codecs") {
    // wide_table coverage: schema-driven encoders must not degrade or
    // truncate on wide rows
    val n = 64
    val widePayload = StructType(
      StructField("id", LongType) +:
        (1 until n).map(i => StructField(s"c$i", LongType)))
    val envSchema = StructType(Seq(
      StructField("_row_id", LongType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_op", StringType),
      StructField("_commit_ts", LongType), StructField("_start_ts", LongType),
      StructField("before", widePayload), StructField("after", widePayload)))
    val vals = Row.fromSeq(7L +: (1 until n).map(i => i * 11L))
    val env = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(
        Seq(Row(1L, "app", "wide", "I", 1700000000000000000L,
          1699999999999999999L, null, vals))).asJava), envSchema)
    val decoded = graft.functions.AvroCodec.decodeGeneric(
      graft.functions.AvroCodec.encodeGeneric(env, widePayload), widePayload).head()
    assert(decoded.getAs[Long]("c63") == 63 * 11L)
    val canal = Codecs.canalJsonFor(env, Seq("id"))
    val parsed = canal.select(from_json(col("_value"),
      StructType(Seq(StructField("data", ArrayType(widePayload))))).as("m"))
      .select(element_at(col("m.data"), 1).as("w")).head().getStruct(0)
    assert(parsed.getAs[Long]("id") == 7L && parsed.getAs[Long]("c40") == 440L)
    // statement rendering carries all 64 columns
    val stmt = graft.sinks.MysqlSink.statements(env, Seq("id"), 4, safeMode = true)
      .select("_stmt").head().getString(0)
    assert(stmt.contains("`c63`") && stmt.contains(s"${63 * 11L}"))
  }

  test("charset matrix: GBK-era Chinese + surrogate-pair text survives every codec") {
    // the reference's canal_json_basic/data_gbk.sql coverage: non-ASCII
    // payloads must survive the JSON/CSV/avro wires byte-exactly, and
    // legacy-charset BYTES (GBK) ride BinaryType + base64 losslessly
    val zh = "中文数据库 表格 écran ☃ 😀 终端"
    val gbkText = "中文 GBK 编码"
    val gbkBytes = gbkText.getBytes(java.nio.charset.Charset.forName("GBK"))
    val payload = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("bin", BinaryType)))
    val envSchema = StructType(Seq(
      StructField("_row_id", LongType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_op", StringType),
      StructField("_commit_ts", LongType), StructField("_start_ts", LongType),
      StructField("before", payload), StructField("after", payload)))
    val env = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(
        Seq(Row(1L, "应用", "事件表", "I", 1700000000000000000L,
          1699999999999999999L, null, Row(1L, zh, gbkBytes)))).asJava),
      envSchema)

    // canal-json: unicode strings exact; gbk BYTES ride as ISO-8859-1
    // char strings (JavaSQLTypeBLOB framing, canal_json_encoder.go:32)
    // and the decoder recovers them byte-exactly
    val canal = Codecs.canalJsonFor(env, Seq("id"))
    val dec = graft.functions.Decoders.decodeCanalFor(canal, payload).head()
    assert(dec.getAs[String]("_schema") == "应用" &&
      dec.getAs[String]("_table") == "事件表")
    val img = dec.getAs[Row]("after")
    assert(img.getAs[String]("s") == zh)
    assert(img.getAs[Array[Byte]]("bin").toSeq == gbkBytes.toSeq)
    assert(new String(img.getAs[Array[Byte]]("bin"),
      java.nio.charset.Charset.forName("GBK")) == gbkText)

    // csv: quoted unicode survives from_csv
    val csv = Codecs.csvLineFor(env)
    val lineSchema = StructType(
      Seq(StructField("_op", StringType), StructField("_table", StringType),
        StructField("_schema", StringType), StructField("_commit_ts", LongType),
        StructField("id", LongType), StructField("s", StringType),
        StructField("bin", StringType)))
    val p = csv.select(from_csv(col("_value"), lineSchema,
      Map("nullValue" -> "\\N", "escape" -> "\"")).as("w")).select("w.*").head()
    assert(p.getAs[String]("s") == zh)
    assert(java.util.Base64.getDecoder.decode(p.getAs[String]("bin")).toSeq
      == gbkBytes.toSeq)

    // avro: utf8 + bytes lossless
    import graft.functions.AvroCodec
    val av = AvroCodec.decodeGeneric(
      AvroCodec.encodeGeneric(env, payload), payload).head()
    assert(av.getAs[String]("s") == zh)
    assert(av.getAs[Array[Byte]]("bin").toSeq == gbkBytes.toSeq)

    // mysql statement rendering keeps the text intact (escaping only
    // touches quotes/backslashes)
    val stmt = graft.sinks.MysqlSink.statements(env, Seq("id"), 4, safeMode = false)
      .select(col("_stmt")).head().getString(0)
    assert(stmt.contains(zh) && stmt.contains("应用"))
  }

  test("csv codec config surface (CSVConfig, sink.go:270-290): hex binary, " +
      "custom delimiter + null, no commit ts, and decodeCsvAs round-trips " +
      "the configured wire") {
    import graft.model.CsvConfig
    val csvRow = Row.fromSeq(maxRow.toSeq.updated(9, "semi;colon"))
    val env = envOf(csvRow)
    val cfg = CsvConfig(delimiter = ";", nullString = "NULL",
      includeCommitTs = false, binaryEncodingMethod = "hex")
    val encoded = Codecs.csvLineFor(env, cfg)
    val line = encoded.select("_value").head().getString(0)
    // hex binary, lowercase (csv_message.go:290 hex.EncodeToString)
    assert(line.contains("00017f80"), s"hex binary cell: $line")
    assert(!line.contains(java.util.Base64.getEncoder.encodeToString(
      Array[Byte](0, 1, 127, -128))), "no base64 form on a hex wire")
    // no commit-ts meta column: the line leads op;TABLE;SCHEMA;payload
    assert(line.startsWith("\"I\";\"types\";\"app\";"),
      s"custom delimiter joins the meta: $line")
    assert(!line.contains("1700000000000000000"),
      s"include-commit-ts=false drops the ts cell: $line")
    // the configured decode recovers the binary bytes and fills ts 0
    val wireReader = StructType(wireSchema.fields.map {
      case StructField("bin", _, _, _) =>
        StructField("bin", BinaryType)
      case f => f
    })
    val dec = graft.functions.Decoders.decodeCsvAs(
      encoded, wireReader, csv = cfg).head()
    assert(dec.getAs[Long]("_commit_ts") == 0L,
      "absent commit-ts column decodes as 0 (csv_message.go:130)")
    assert(dec.getAs[Array[Byte]]("bin").toSeq == Seq[Byte](0, 1, 127, -128),
      "hex binary decodes back to the bytes")
    assert(dec.getAs[String]("s") == "semi;colon",
      "quoted delimiter-bearing string survives the custom separator")
    // validation mirrors sink.go:292-345
    intercept[IllegalArgumentException](CsvConfig(quote = "ab").validate())
    intercept[IllegalArgumentException](CsvConfig(delimiter = "").validate())
    intercept[IllegalArgumentException](CsvConfig(delimiter = "abcd").validate())
    intercept[IllegalArgumentException](CsvConfig(delimiter = "a\nb").validate())
    intercept[IllegalArgumentException](
      CsvConfig(delimiter = "a\"", quote = "\"").validate())
    intercept[IllegalArgumentException](
      CsvConfig(binaryEncodingMethod = "raw").validate())
    CsvConfig(quote = "", delimiter = "||").validate()
  }

  test("csv generic encoder round-trips the matrix via from_csv") {
    // newline-free string for the line-oriented wire
    val csvRow = Row.fromSeq(maxRow.toSeq.updated(9, "qu\"ote, comma"))
    val env = envOf(csvRow)
    val encoded = Codecs.csvLineFor(env)
    val lineSchema = StructType(
      Seq(StructField("_op", StringType), StructField("_table", StringType),
        StructField("_schema", StringType), StructField("_commit_ts", LongType)) ++
        wireSchema.fields.map {
          case StructField("bin", _, _, _) => StructField("bin", StringType) // base64 text
          case f => f
        })
    val p = encoded.select(from_csv(col("_value"), lineSchema, Map(
      "nullValue" -> "\\N", "escape" -> "\"",
      "timestampNTZFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS")).as("w"))
      .select("w.*").head()
    assert(p.getAs[String]("_op") == "I")
    assert(p.getAs[Long]("i64") == Long.MaxValue)
    assert(p.getAs[java.math.BigDecimal]("u64") == new java.math.BigDecimal("18446744073709551615"))
    assert(p.getAs[String]("s") == "qu\"ote, comma")
    assert(java.util.Base64.getDecoder.decode(p.getAs[String]("bin")).toSeq ==
      Seq[Byte](0, 1, 127, -128))
    assert(p.getAs[Long]("flag") == 1L)
    assert(p.getAs[Date]("d") == Date.valueOf("2024-02-29"))
    assert(p.getAs[String]("vec") == "[1.5,-2.25]")
  }
}
