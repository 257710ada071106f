package graft.functions

import java.io.ByteArrayOutputStream
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro wire codec (SURVEY §2.7; reference pkg/sink/codec/avro/
  * encoder.go:68, schema gen arvo.go, decoder.go:680).
  *
  * No spark-avro connector ships in this environment, but avro-core
  * does — so the encoder is a mapPartitions batch over avro-core's
  * GenericDatumWriter (one writer + reusable buffer per partition,
  * the per-partition-init shape a schema-registry client would also
  * use). The schema-registry round trip is out of scope offline; the
  * record schema is versioned in the message envelope the way the
  * reference's bootstrap flow pins (topic, table-version) → schema.
  */
object AvroCodec {

  /** Envelope payload as an Avro record schema (nullable images,
    * nullable fields — matches the reference's generated schemas with
    * optional columns). */
  val envelopeSchemaJson: String =
    """{"type":"record","name":"ChangeEvent","namespace":"graft","fields":[
      |{"name":"row_id","type":"long"},
      |{"name":"schema","type":"string"},
      |{"name":"table","type":"string"},
      |{"name":"op","type":"string"},
      |{"name":"commit_ts","type":"long"},
      |{"name":"start_ts","type":"long"},
      |{"name":"before","type":["null",{"type":"record","name":"ImageB","fields":[
      |  {"name":"user_id","type":["null","long"]},
      |  {"name":"value","type":["null","double"]},
      |  {"name":"k","type":["null","long"]}]}],"default":null},
      |{"name":"after","type":["null",{"type":"record","name":"ImageA","fields":[
      |  {"name":"user_id","type":["null","long"]},
      |  {"name":"value","type":["null","double"]},
      |  {"name":"k","type":["null","long"]}]}],"default":null}
      |]}""".stripMargin

  private val outSchema = StructType(Seq(
    StructField("_row_id", LongType),
    StructField("_value", BinaryType)))

  private def imageRecord(s: Schema, r: Row): GenericRecord = {
    val rec = new GenericData.Record(s)
    rec.put("user_id", if (r.isNullAt(0)) null else r.getLong(0))
    rec.put("value", if (r.isNullAt(1)) null else r.getDouble(1))
    rec.put("k", if (r.isNullAt(2)) null else r.getLong(2))
    rec
  }

  /** Envelope → (row_id, avro binary). */
  def encode(env: DataFrame): DataFrame = {
    val json = envelopeSchemaJson
    env.select(col("_row_id"), col("_schema"), col("_table"), col("_op"),
        col("_commit_ts"), col("_start_ts"), col("before"), col("after"))
      .mapPartitions { rows =>
        val schema = new Schema.Parser().parse(json)
        val beforeSchema = schema.getField("before").schema().getTypes.get(1)
        val afterSchema = schema.getField("after").schema().getTypes.get(1)
        val writer = new GenericDatumWriter[GenericRecord](schema)
        val buf = new ByteArrayOutputStream(256)
        var enc: BinaryEncoder = null
        rows.map { r =>
          val rec = new GenericData.Record(schema)
          rec.put("row_id", r.getLong(0))
          rec.put("schema", r.getString(1))
          rec.put("table", r.getString(2))
          rec.put("op", r.getString(3))
          rec.put("commit_ts", r.getLong(4))
          rec.put("start_ts", r.getLong(5))
          rec.put("before", if (r.isNullAt(6)) null else imageRecord(beforeSchema, r.getStruct(6)))
          rec.put("after", if (r.isNullAt(7)) null else imageRecord(afterSchema, r.getStruct(7)))
          buf.reset()
          enc = EncoderFactory.get().binaryEncoder(buf, enc)
          writer.write(rec, enc)
          enc.flush()
          Row(r.getLong(0), buf.toByteArray)
        }
      }(Encoders.row(outSchema))
  }

  private val decodedSchema = StructType(Seq(
    StructField("_row_id", LongType),
    StructField("_schema", StringType),
    StructField("_table", StringType),
    StructField("_op", StringType),
    StructField("_commit_ts", LongType),
    StructField("_start_ts", LongType),
    StructField("before_user_id", LongType),
    StructField("before_value", DoubleType),
    StructField("before_k", LongType),
    StructField("after_user_id", LongType),
    StructField("after_value", DoubleType),
    StructField("after_k", LongType)))

  // ---- generic schema generation (reference avro/arvo.go: schema
  // per table version from column metadata) ----

  /** Spark type → Avro schema JSON fragment, using the logical types
    * the reference's generator emits (decimal-as-bytes,
    * date, timestamp-micros; VECTOR → float array). */
  def avroTypeFor(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType => "\"int\""
    case LongType => "\"long\""
    case FloatType => "\"float\""
    case DoubleType => "\"double\""
    case BooleanType => "\"boolean\""
    case StringType => "\"string\""
    case BinaryType => "\"bytes\""
    case d: DecimalType =>
      s"""{"type":"bytes","logicalType":"decimal","precision":${d.precision},"scale":${d.scale}}"""
    case DateType => """{"type":"int","logicalType":"date"}"""
    case _: TimestampType | _: TimestampNTZType =>
      """{"type":"long","logicalType":"timestamp-micros"}"""
    case ArrayType(FloatType, _) => """{"type":"array","items":"float"}"""
    case ArrayType(DoubleType, _) => """{"type":"array","items":"double"}"""
    case other => sys.error(s"unsupported avro payload type: $other")
  }

  /** Record schema for an arbitrary payload (every field a nullable
    * union, like the reference's optional columns). */
  def avroSchemaFor(fields: Seq[StructField], name: String): String =
    fields.map(f =>
      s"""{"name":"${f.name}","type":["null",${avroTypeFor(f.dataType)}],"default":null}""")
      .mkString(
        s"""{"type":"record","name":"$name","namespace":"graft","fields":[""",
        ",", "]}")

  private[functions] def toAvroValue(v: Any, dt: DataType): AnyRef = (v, dt) match {
    case (null, _) => null
    case (x: Byte, _) => Int.box(x.toInt)
    case (x: Short, _) => Int.box(x.toInt)
    case (x: java.math.BigDecimal, _) =>
      java.nio.ByteBuffer.wrap(x.unscaledValue.toByteArray)
    case (x: Array[Byte], _) => java.nio.ByteBuffer.wrap(x)
    case (x: java.sql.Date, _) => Int.box(x.toLocalDate.toEpochDay.toInt)
    case (x: java.time.LocalDateTime, _) =>
      Long.box(x.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
        x.getNano / 1000L)
    case (x: java.sql.Timestamp, _) =>
      Long.box(x.getTime * 1000L + (x.getNanos % 1000000) / 1000L)
    case (x: scala.collection.Seq[_], _) =>
      scala.jdk.CollectionConverters.SeqHasAsJava(
        x.map(_.asInstanceOf[AnyRef])).asJava
    case (x, _) => x.asInstanceOf[AnyRef]
  }

  private[functions] def fromAvroValue(v: AnyRef, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    // string-mode decimals (avro-decimal-handling-mode=string /
    // avro-bigint-unsigned-handling-mode=string, arvo.go:551,657):
    // the wire carries the plain decimal string
    case (x: org.apache.avro.util.Utf8, _: DecimalType) =>
      new java.math.BigDecimal(x.toString)
    case (x: org.apache.avro.util.Utf8, _) => x.toString
    case (x: java.lang.Integer, ByteType) => x.byteValue()
    case (x: java.lang.Integer, ShortType) => x.shortValue()
    // unsigned-bigint long mode (arvo.go:637 int64(d.GetUint64())):
    // a long landing in the DecimalType(20,0) carrier is the u64 BITS
    case (x: java.lang.Long, d: DecimalType)
        if d.precision == 20 && d.scale == 0 =>
      new java.math.BigDecimal(java.lang.Long.toUnsignedString(x.longValue()))
    case (x: java.lang.Long, _: DecimalType) =>
      java.math.BigDecimal.valueOf(x.longValue())
    case (x: java.nio.ByteBuffer, d: DecimalType) =>
      new java.math.BigDecimal(new java.math.BigInteger(bytesOf(x)), d.scale)
    case (x: java.nio.ByteBuffer, BinaryType) => bytesOf(x)
    case (x: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(x.longValue()))
    case (x: java.lang.Long, TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(x.longValue(), 1000000L),
        Math.floorMod(x.longValue(), 1000000L) * 1000L))
    case (x: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(x.longValue(), 1000000L),
        (Math.floorMod(x.longValue(), 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (x: java.util.Collection[_], _) =>
      scala.jdk.CollectionConverters.CollectionHasAsScala(x)
        .asScala.map(e => fromAvroValue(e.asInstanceOf[AnyRef], NullType)).toSeq
    case (x, _) => x
  }

  private def bytesOf(bb: java.nio.ByteBuffer): Array[Byte] = {
    val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
  }

  /** Generic encode: payload struct `after` of any supported schema →
    * (row_id, avro binary) under the generated record schema. */
  def encodeGeneric(env: DataFrame, payload: StructType): DataFrame = {
    val json = avroSchemaFor(payload.fields.toSeq, "Payload")
    val fieldTypes = payload.fields.map(f => f.name -> f.dataType).toSeq
    env.select(col("_row_id"), col("after"))
      .mapPartitions { rows =>
        val schema = new Schema.Parser().parse(json)
        val writer = new GenericDatumWriter[GenericRecord](schema)
        val buf = new ByteArrayOutputStream(256)
        var enc: BinaryEncoder = null
        rows.map { r =>
          val rec = new GenericData.Record(schema)
          val payloadRow = r.getStruct(1)
          fieldTypes.zipWithIndex.foreach { case ((n, dt), i) =>
            rec.put(n, if (payloadRow == null || payloadRow.isNullAt(i)) null
              else toAvroValue(payloadRow.get(i), dt))
          }
          buf.reset()
          enc = EncoderFactory.get().binaryEncoder(buf, enc)
          writer.write(rec, enc)
          enc.flush()
          Row(r.getLong(0), buf.toByteArray)
        }
      }(Encoders.row(outSchema))
  }

  /** Generic decode: avro binary → flattened payload columns. */
  def decodeGeneric(msgs: DataFrame, payload: StructType): DataFrame = {
    val json = avroSchemaFor(payload.fields.toSeq, "Payload")
    val fieldTypes = payload.fields.map(f => f.name -> f.dataType).toSeq
    val out = StructType(StructField("_row_id", LongType) +: payload.fields)
    msgs.select(col("_row_id"), col("_value"))
      .mapPartitions { rows =>
        val schema = new Schema.Parser().parse(json)
        val reader = new GenericDatumReader[GenericRecord](schema)
        var dec: BinaryDecoder = null
        rows.map { r =>
          dec = DecoderFactory.get().binaryDecoder(r.getAs[Array[Byte]](1), dec)
          val rec = reader.read(null, dec)
          Row.fromSeq(r.getLong(0) +: fieldTypes.map { case (n, dt) =>
            fromAvroValue(rec.get(n), dt)
          })
        }
      }(Encoders.row(out))
  }

  /** (row_id, avro binary) → flattened envelope (consumer harness). */
  def decode(msgs: DataFrame): DataFrame = {
    val json = envelopeSchemaJson
    msgs.select(col("_value"))
      .mapPartitions { rows =>
        val schema = new Schema.Parser().parse(json)
        val reader = new GenericDatumReader[GenericRecord](schema)
        var dec: BinaryDecoder = null
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](0)
          dec = DecoderFactory.get().binaryDecoder(bytes, dec)
          val rec = reader.read(null, dec)
          def img(name: String): (Any, Any, Any) =
            Option(rec.get(name).asInstanceOf[GenericRecord])
              .map(i => (i.get("user_id"), i.get("value"), i.get("k")))
              .getOrElse((null, null, null))
          val (bu, bv, bk) = img("before")
          val (au, av, ak) = img("after")
          Row(rec.get("row_id"), rec.get("schema").toString,
            rec.get("table").toString, rec.get("op").toString,
            rec.get("commit_ts"), rec.get("start_ts"), bu, bv, bk, au, av, ak)
        }
      }(Encoders.row(decodedSchema))
  }
}
