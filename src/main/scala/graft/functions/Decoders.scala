package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Wire-protocol decoders — the consumer-harness side of SURVEY §2.7
  * (reference decoders: open/decoder.go:817, canal_json_decoder.go:725,
  * debezium/decoder.go:532, csv_decoder.go:360; used by
  * cmd/kafka-consumer etc. to re-apply messages and diff).
  *
  * Each decoder inverts its encoder back to the recoverable envelope
  * fields (protocol timestamps are ms, so commit-ts comes back at ms
  * precision).
  */
object Decoders {

  private val imageSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("value", DoubleType),
    StructField("k", LongType)))

  /** The options a canal wire parse needs for the generic encoders'
    * canonical renderings. */
  private val wireOptions = Map(
    "timestampNTZFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS")

  private def canalSchemaFor(image: StructType) = StructType(Seq(
    StructField("id", LongType),
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("pkNames", ArrayType(StringType)),
    StructField("isDdl", BooleanType),
    StructField("type", StringType),
    StructField("es", LongType),
    StructField("ts", LongType),
    StructField("data", ArrayType(image)),
    StructField("old", ArrayType(image))))

  /** Canal-JSON message → envelope-ish frame for the fixture payload. */
  def decodeCanal(msgs: DataFrame, valueCol: String = "_value"): DataFrame =
    decodeCanalFor(msgs, imageSchema, valueCol)

  /** Canal-JSON decode over an arbitrary wire image schema (consumer
    * side of Codecs.canalJsonFor; reference canal_json_decoder.go:725).
    * `data[0]` is the post-image (pre-image for DELETE); `old[0]` the
    * update pre-image. */
  def decodeCanalFor(msgs: DataFrame, image: StructType,
                     valueCol: String = "_value"): DataFrame = {
    val imageSchema = image
    // BLOB columns ride the canal wire as ISO-8859-1 char strings
    // (JavaSQLTypeBLOB, encoder side Codecs.jsonValueFor canalBlob;
    // reference canal_json_decoder.go:458-459) — parse them as STRING
    // and re-encode the chars back to bytes after the JSON parse.
    val blobFields = image.fields.collect {
      case StructField(n, BinaryType, _, _) => n
    }.toSet
    val wireImage = StructType(image.fields.map {
      case f if blobFields(f.name) => f.copy(dataType = StringType)
      case f => f
    })
    def rebin(img: Column): Column =
      if (blobFields.isEmpty) img
      else when(img.isNull, lit(null).cast(imageSchema)).otherwise(
        struct(image.fields.map { f =>
          val c = img.getField(f.name)
          (if (blobFields(f.name))
            graft.functions.CharsetExpressions.charsetEncode(c, "ISO-8859-1")
          else c).as(f.name)
        }.toIndexedSeq: _*))
    // parse ONCE into an attribute: a getField over an inline
    // from_json re-parses per field (the optimizer rewrites each into
    // its own schema-pruned parse — every one re-lexes the whole
    // message text; the reference unmarshals once, decoder.go)
    val j = col("__j")
    msgs
      .withColumn("__j", from_json(col(valueCol), canalSchemaFor(wireImage), wireOptions))
      .select(
      j.getField("database").as("_schema"),
      j.getField("table").as("_table"),
      when(j.getField("type") === "INSERT", "I")
        .when(j.getField("type") === "UPDATE", "U")
        .otherwise("D").as("_op"),
      j.getField("es").as("_commit_ms"),
      rebin(element_at(j.getField("data"), 1)).as("__img"),
      rebin(element_at(j.getField("old"), 1)).as("__old"))
      .withColumn("before",
        when(col("_op") === "D", col("__img"))
          .when(col("_op") === "U", col("__old"))
          .otherwise(lit(null).cast(imageSchema)))
      .withColumn("after",
        when(col("_op") === "D", lit(null).cast(imageSchema)).otherwise(col("__img")))
      .drop("__img", "__old")
  }

  private val openKeySchema = StructType(Seq(
    StructField("ts", LongType), StructField("scm", StringType),
    StructField("tbl", StringType), StructField("t", IntegerType)))

  /** Open-protocol key+value → envelope-ish frame for the fixture
    * payload (exact commit-ts: the open key carries full ns). */
  def decodeOpen(msgs: DataFrame, keyCol: String = "_key",
                 valueCol: String = "_value",
                 carry: Seq[String] = Nil): DataFrame =
    decodeOpenFor(msgs, imageSchema, keyCol, valueCol, carry)

  /** Open-protocol decode over an arbitrary wire image schema
    * (consumer side of Codecs.openProtocolFor; open/decoder.go:817).
    * `carry` names transport-level columns to keep alongside the
    * decoded envelope (e.g. batch coordinates from
    * [[graft.functions.OpenBatch.unpackOpenBatches]]). */
  def decodeOpenFor(msgs: DataFrame, image: StructType,
                    keyCol: String = "_key",
                    valueCol: String = "_value",
                    carry: Seq[String] = Nil): DataFrame = {
    val openValueSchema = StructType(Seq(
      StructField("u", image), StructField("p", image),
      StructField("d", image)))
    // parse each side ONCE into an attribute (see decodeCanalFor)
    val k = col("__k")
    val v = col("__v")
    msgs
      .withColumn("__k", from_json(col(keyCol), openKeySchema))
      .withColumn("__v", from_json(col(valueCol), openValueSchema, wireOptions))
      .select(
      k.getField("scm").as("_schema") +:
      k.getField("tbl").as("_table") +:
      k.getField("ts").as("_commit_ts") +:
      when(v.getField("d").isNotNull, "D")
        .when(v.getField("p").isNotNull, "U")
        .otherwise("I").as("_op") +:
      coalesce(v.getField("p"), v.getField("d")).as("before") +:
      v.getField("u").as("after") +:
      carry.map(col): _*)
  }

  private def debeziumSchemaFor(image: StructType) = StructType(Seq(
    StructField("before", image),
    StructField("after", image),
    StructField("source", StructType(Seq(
      StructField("db", StringType), StructField("table", StringType),
      StructField("commit_ts", LongType)))),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Debezium envelope → envelope frame for the fixture payload. */
  def decodeDebezium(msgs: DataFrame, valueCol: String = "_value"): DataFrame =
    decodeDebeziumFor(msgs, imageSchema, valueCol)

  /** Debezium decode over an arbitrary wire image schema (consumer
    * side of Codecs.debeziumJsonFor; reference debezium/decoder.go:532;
    * lossless: source block carries full ns commit-ts). */
  def decodeDebeziumFor(msgs: DataFrame, image: StructType,
                        valueCol: String = "_value"): DataFrame = {
    // parse ONCE into an attribute (see decodeCanalFor)
    val j = col("__j")
    msgs
      .withColumn("__j", from_json(col(valueCol), debeziumSchemaFor(image), wireOptions))
      .select(
      j.getField("source").getField("db").as("_schema"),
      j.getField("source").getField("table").as("_table"),
      j.getField("source").getField("commit_ts").as("_commit_ts"),
      when(j.getField("op") === "c", "I")
        .when(j.getField("op") === "u", "U")
        .otherwise("D").as("_op"),
      j.getField("before").as("before"),
      j.getField("after").as("after"))
  }

  /** Full-fidelity Debezium envelope decode — the consumer side of
    * [[DebeziumFull.encode]] (schema block + payload wrapper; the
    * source block carries db/table, commit time returns at ms
    * precision from payload.ts_ms). A string-typed `image` keeps
    * values in their wire form (numbers/epoch forms/base64) for
    * wire-space state folding. */
  def decodeDebeziumFull(msgs: DataFrame, image: StructType,
                         valueCol: String = "_value"): DataFrame = {
    val payload = StructType(Seq(
      StructField("before", image), StructField("after", image),
      StructField("source", StructType(Seq(
        StructField("db", StringType), StructField("table", StringType)))),
      StructField("op", StringType), StructField("ts_ms", LongType)))
    val j = col("__j").getField("payload")
    msgs.withColumn("__j", from_json(col(valueCol),
        StructType(Seq(StructField("payload", payload))), wireOptions))
      .select(
        j.getField("source").getField("db").as("_schema"),
        j.getField("source").getField("table").as("_table"),
        j.getField("ts_ms").as("_commit_ts_ms"),
        when(j.getField("op") === "c", "I")
          .when(j.getField("op") === "u", "U")
          .otherwise("D").as("_op"),
        j.getField("before").as("before"),
        j.getField("after").as("after"))
  }

  /** Simple-protocol message → envelope frame for the fixture payload
    * (lossless commit-ts; reference simple/decoder.go:829). */
  def decodeSimple(msgs: DataFrame, valueCol: String = "_value",
                   withChecksum: Boolean = false): DataFrame =
    decodeSimpleFor(msgs, imageSchema, valueCol, withChecksum)

  /** Simple-protocol decode over an arbitrary target image schema.
    * The wire object carries every scalar as a STRING (and
    * TypeTimestamp as the {"location","value"} object — encodeValue,
    * simple/message.go:434-491), so the parse schema is string-typed
    * and each field casts back to its target type. */
  def decodeSimpleFor(msgs: DataFrame, image: StructType,
                      valueCol: String = "_value",
                      withChecksum: Boolean = false): DataFrame = {
    val wireImage = StructType(image.fields.map { f =>
      f.dataType match {
        case _: TimestampType => StructField(f.name, StructType(Seq(
          StructField("location", StringType), StructField("value", StringType))))
        case _ => StructField(f.name, StringType)
      }
    })
    val simpleSchema = StructType(Seq(
      StructField("version", IntegerType),
      StructField("database", StringType),
      StructField("table", StringType),
      StructField("tableID", LongType),
      StructField("type", StringType),
      StructField("sql", StringType),
      StructField("commitTs", LongType),
      StructField("buildTs", LongType),
      StructField("schemaVersion", LongType),
      StructField("claimCheckLocation", StringType),
      StructField("handleKeyOnly", BooleanType),
      StructField("checksum", StructType(Seq(
        StructField("version", IntegerType),
        StructField("corrupted", BooleanType),
        StructField("current", LongType),
        StructField("previous", LongType)))),
      StructField("data", wireImage),
      StructField("old", wireImage)))
    def mount(img: Column): Column = {
      val fields = image.fields.map { f =>
        val c = img.getField(f.name)
        val cast: Column = f.dataType match {
          case BooleanType => (c === "1" || c === "true").as(f.name)
          case BinaryType => unbase64(c)
          case DateType => to_date(c, "yyyy-MM-dd")
          case _: TimestampType => to_timestamp(c.getField("value"), "yyyy-MM-dd HH:mm:ss")
          case _: TimestampNTZType =>
            to_timestamp(c, "yyyy-MM-dd HH:mm:ss").cast(TimestampNTZType)
          case dt => c.cast(dt)
        }
        cast.as(f.name)
      }
      when(img.isNull, lit(null).cast(image)).otherwise(struct(fields.toIndexedSeq: _*))
    }
    // parse ONCE into an attribute (see decodeCanalFor)
    val j = col("__j")
    msgs
      .withColumn("__j", from_json(col(valueCol), simpleSchema, wireOptions))
      .select(Seq(
        j.getField("database").as("_schema"),
        j.getField("table").as("_table"),
        j.getField("commitTs").as("_commit_ts"),
        when(j.getField("type") === "INSERT", "I")
          .when(j.getField("type") === "UPDATE", "U")
          .otherwise("D").as("_op"),
        mount(j.getField("old")).as("before"),
        mount(j.getField("data")).as("after")) ++
        // e2e checksum block (message.go:262-263); absent → 0, the
        // "not enabled" sentinel RowChecksum.verify honors
        (if (withChecksum) Seq(
          coalesce(j.getField("checksum").getField("current"), lit(0L))
            .as("_checksum_current"),
          coalesce(j.getField("checksum").getField("previous"), lit(0L))
            .as("_checksum_previous"))
         else Nil): _*)
  }

  private val csvSchema = StructType(Seq(
    StructField("_op", StringType),
    StructField("_table", StringType),
    StructField("_schema", StringType),
    StructField("_commit_ts", LongType),
    StructField("user_id", LongType),
    StructField("value", DoubleType),
    StructField("k", LongType)))

  /** CSV line → envelope fields (meta cols op,TABLE,SCHEMA,commitTs
    * then payload — encodeMeta writes tableName before schemaName,
    * csv_message.go:122-127). Parsed with `from_csv` so RFC-4180 quoting —
    * embedded commas, doubled quotes (escape = `"`) — round-trips
    * Codecs.csvLine exactly (reference csv_message.go:199-245);
    * `\N` is the null marker (CSVConfig NullString,
    * pkg/config/sink.go:283). */
  private val csvOldValueSchema = StructType(Seq(
    StructField("_op", StringType),
    StructField("_table", StringType),
    StructField("_schema", StringType),
    StructField("_commit_ts", LongType),
    StructField("is_updated", BooleanType),
    StructField("user_id", LongType),
    StructField("value", DoubleType),
    StructField("k", LongType)))

  /** Consumer side of [[Codecs.csvLineOldValue]]: split multi-record
    * messages on the record terminator, parse with the is-updated
    * column (csv_message.go decode's dataColIdx walk). */
  def decodeCsvOldValue(msgs: DataFrame, valueCol: String = "_value"): DataFrame = {
    val parsed = col("__csv")
    msgs
      .select(explode(split(col(valueCol), "\n")).as("__line"))
      .withColumn("__csv", from_csv(col("__line"), csvOldValueSchema,
        Map("nullValue" -> "\\N", "escape" -> "\"")))
      .select(
        parsed.getField("_op").as("_op"),
        parsed.getField("_table").as("_table"),
        parsed.getField("_schema").as("_schema"),
        parsed.getField("_commit_ts").as("_commit_ts"),
        parsed.getField("is_updated").as("is_updated"),
        parsed.getField("user_id").as("user_id"),
        parsed.getField("value").as("value"),
        parsed.getField("k").as("k"))
  }

  /** Generic csv decode for an ARBITRARY payload shape — the wire
    * carries bare values with no schema, so the caller supplies the
    * reader struct (meta cols op, TABLE, SCHEMA, [commitTs] lead each
    * line, csv_message.go encodeMeta order) and the codec config the
    * producer encoded with (csv_decoder.go builds its reader from the
    * same CSVConfig). Binary columns arrive as text in the configured
    * `binary-encoding-method`; a missing commit-ts column (the
    * reference DEFAULT) decodes as 0 (csv_message.go:130). */
  def decodeCsvAs(msgs: DataFrame, reader: StructType,
                  valueCol: String = "_value",
                  csv: graft.model.CsvConfig =
                    graft.functions.Codecs.csvLegacy): DataFrame = {
    csv.validate()
    val wire = StructType(Seq(
      StructField("_op", StringType),
      StructField("_table", StringType),
      StructField("_schema", StringType)) ++
      (if (csv.includeCommitTs) Seq(StructField("_commit_ts", LongType)) else Nil) ++
      reader.fields.map { f =>
        val dt = f.dataType match {
          case BinaryType => StringType // b64/hex text, converted below
          case other => other
        }
        StructField(f.name, dt, nullable = true)
      })
    val opts = Map("nullValue" -> csv.nullString, "sep" -> csv.delimiter,
      "timestampNTZFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS",
      "timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS") ++
      (if (csv.quote.nonEmpty) Map("quote" -> csv.quote, "escape" -> csv.quote)
       else Map("quote" -> "\u0000", "escape" -> "\\"))
    val parsed = col("__csv")
    def payloadCol(f: StructField): Column = f.dataType match {
      case BinaryType if csv.binaryEncodingMethod == "hex" =>
        unhex(parsed.getField(f.name)).as(f.name)
      case BinaryType => unbase64(parsed.getField(f.name)).as(f.name)
      case _ => parsed.getField(f.name).as(f.name)
    }
    msgs
      .withColumn("__csv", from_csv(col(valueCol), wire, opts))
      .select(Seq("_op", "_schema", "_table").map(n =>
          parsed.getField(n).as(n)) ++
        Seq(if (csv.includeCommitTs) parsed.getField("_commit_ts").as("_commit_ts")
            else lit(0L).as("_commit_ts")) ++
        reader.fields.toSeq.map(payloadCol): _*)
  }

  def decodeCsv(msgs: DataFrame, valueCol: String = "_value"): DataFrame = {
    // parse ONCE into an attribute (see decodeCanalFor)
    val parsed = col("__csv")
    msgs
      .withColumn("__csv", from_csv(col(valueCol), csvSchema,
        Map("nullValue" -> "\\N", "escape" -> "\"")))
      .select(
      parsed.getField("_op").as("_op"),
      parsed.getField("_schema").as("_schema"),
      parsed.getField("_table").as("_table"),
      parsed.getField("_commit_ts").as("_commit_ts"),
      parsed.getField("user_id").as("user_id"),
      parsed.getField("value").as("value"),
      parsed.getField("k").as("k"))
  }
}
