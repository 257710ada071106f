package graft.functions

import java.io.ByteArrayOutputStream
import scala.jdk.CollectionConverters._
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

/** Simple protocol, Avro marshalling (reference
  * pkg/sink/codec/simple/marshaller.go:102-150 avroMarshaller +
  * avro.go map builders; the wire schema is the reference's OWN
  * message.json — the `com.pingcap.simple.avro` record family).
  *
  * The schema here is built programmatically, record by record, in
  * the exact order message.json declares them; the spec pins
  * interoperability by comparing Avro parsing-form fingerprints with
  * the reference file and by decoding our bytes with a codec parsed
  * from that file. The top-level schema is the UNION of all twelve
  * types (goavro treats a JSON-array schema as a union), so every
  * message starts with the union index of `Message` — the last
  * branch — exactly like goavro's BinaryFromNative.
  */
object SimpleAvro {

  private val NS = "com.pingcap.simple.avro"

  private def rec(name: String, doc: String, fields: Seq[Schema.Field]): Schema = {
    val s = Schema.createRecord(name, doc, NS, false)
    s.setFields(fields.asJava)
    s
  }
  private def f(name: String, s: Schema): Schema.Field = new Schema.Field(name, s)
  private def fDef(name: String, s: Schema): Schema.Field =
    new Schema.Field(name, s, null, Schema.Field.NULL_DEFAULT_VALUE)
  private def p(t: Schema.Type) = Schema.create(t)
  private def nullable(ts: Schema*): Schema =
    Schema.createUnion((p(Schema.Type.NULL) +: ts).asJava)

  // record order = message.json order (union indexes are wire-visible)
  val dataTypeSchema: Schema = rec("DataType", "each column's mysql type information", Seq(
    f("mysqlType", p(Schema.Type.STRING)),
    f("charset", p(Schema.Type.STRING)),
    f("collate", p(Schema.Type.STRING)),
    f("length", p(Schema.Type.LONG)),
    fDef("decimal", nullable(p(Schema.Type.INT))),
    fDef("elements", nullable(Schema.createArray(p(Schema.Type.STRING)))),
    fDef("unsigned", nullable(p(Schema.Type.BOOLEAN))),
    fDef("zerofill", nullable(p(Schema.Type.BOOLEAN)))))

  val columnSchema: Schema = rec("ColumnSchema", "each column's schema", Seq(
    f("name", p(Schema.Type.STRING)),
    f("dataType", dataTypeSchema),
    f("nullable", p(Schema.Type.BOOLEAN)),
    fDef("default", nullable(p(Schema.Type.STRING)))))

  val indexSchema: Schema = rec("IndexSchema", "each index's schema", Seq(
    f("name", p(Schema.Type.STRING)),
    f("unique", p(Schema.Type.BOOLEAN)),
    f("primary", p(Schema.Type.BOOLEAN)),
    f("nullable", p(Schema.Type.BOOLEAN)),
    f("columns", Schema.createArray(p(Schema.Type.STRING)))))

  val tableSchemaSchema: Schema = rec("TableSchema", "table schema information", Seq(
    f("database", p(Schema.Type.STRING)),
    f("table", p(Schema.Type.STRING)),
    f("tableID", p(Schema.Type.LONG)),
    f("version", p(Schema.Type.LONG)),
    f("columns", Schema.createArray(columnSchema)),
    f("indexes", Schema.createArray(indexSchema))))

  val checksumSchema: Schema = rec("Checksum", "event's e2e checksum", Seq(
    f("version", p(Schema.Type.INT)),
    f("corrupted", p(Schema.Type.BOOLEAN)),
    f("current", p(Schema.Type.LONG)),
    f("previous", p(Schema.Type.LONG))))

  val watermarkSchema: Schema = rec("Watermark", "the message format of the watermark event", Seq(
    f("version", p(Schema.Type.INT)),
    f("commitTs", p(Schema.Type.LONG)),
    f("buildTs", p(Schema.Type.LONG))))

  val bootstrapSchema: Schema = rec("Bootstrap", "the message format of the bootstrap event", Seq(
    f("version", p(Schema.Type.INT)),
    f("buildTs", p(Schema.Type.LONG)),
    f("tableSchema", tableSchemaSchema)))

  val ddlSchema: Schema = rec("DDL", "the message format of the DDL event", Seq(
    f("version", p(Schema.Type.INT)),
    f("type", Schema.createEnum("DDLType", null, NS,
      Seq("CREATE", "ALTER", "ERASE", "RENAME", "TRUNCATE", "CINDEX", "DINDEX", "QUERY").asJava)),
    f("sql", p(Schema.Type.STRING)),
    f("commitTs", p(Schema.Type.LONG)),
    f("buildTs", p(Schema.Type.LONG)),
    fDef("tableSchema", nullable(tableSchemaSchema)),
    fDef("preTableSchema", nullable(tableSchemaSchema))))

  val timestampSchema: Schema = rec("Timestamp", "the timestamp value format", Seq(
    f("location", p(Schema.Type.STRING)),
    f("value", p(Schema.Type.STRING))))

  val unsignedBigintSchema: Schema = rec("UnsignedBigint", "unsigned bigint value format", Seq(
    f("value", p(Schema.Type.LONG))))

  private val dmlValueUnion: Schema = Schema.createUnion(Seq(
    p(Schema.Type.NULL), p(Schema.Type.LONG), p(Schema.Type.FLOAT),
    p(Schema.Type.DOUBLE), p(Schema.Type.STRING), p(Schema.Type.BYTES),
    timestampSchema, unsignedBigintSchema).asJava)

  val dmlSchema: Schema = rec("DML", "the message format of the DML event", Seq(
    f("version", p(Schema.Type.INT)),
    f("database", p(Schema.Type.STRING)),
    f("table", p(Schema.Type.STRING)),
    f("tableID", p(Schema.Type.LONG)),
    f("type", Schema.createEnum("DMLType", null, NS,
      Seq("INSERT", "UPDATE", "DELETE").asJava)),
    f("commitTs", p(Schema.Type.LONG)),
    f("buildTs", p(Schema.Type.LONG)),
    f("schemaVersion", p(Schema.Type.LONG)),
    fDef("claimCheckLocation", nullable(p(Schema.Type.STRING))),
    fDef("handleKeyOnly", nullable(p(Schema.Type.BOOLEAN))),
    fDef("checksum", nullable(checksumSchema)),
    fDef("data", nullable(Schema.createMap(dmlValueUnion))),
    fDef("old", nullable(Schema.createMap(dmlValueUnion)))))

  val messageSchema: Schema = rec("Message", "the wrapper for all kind of messages", Seq(
    f("type", Schema.createEnum("MessageType", null, NS,
      Seq("WATERMARK", "BOOTSTRAP", "DDL", "DML").asJava)),
    f("payload", Schema.createUnion(Seq(
      watermarkSchema, bootstrapSchema, ddlSchema, dmlSchema).asJava))))

  /** Top-level wire schema: the union over every declared type, in
    * declaration order (goavro's reading of the JSON array). */
  val wireSchema: Schema = Schema.createUnion(Seq(
    dataTypeSchema, columnSchema, indexSchema, tableSchemaSchema,
    checksumSchema, watermarkSchema, bootstrapSchema, ddlSchema,
    timestampSchema, unsignedBigintSchema, dmlSchema, messageSchema).asJava)

  // ---- value model for DML column maps (encodeValue4Avro,
  //      message.go:377-430) ----

  sealed trait Val
  object Val {
    case object Null extends Val
    final case class L(v: Long) extends Val // all signed ints, enum/set index
    final case class F(v: Float) extends Val
    final case class D(v: Double) extends Val
    final case class S(v: String) extends Val // decimal/date/duration/bit/json render as strings
    final case class B(v: Array[Byte]) extends Val // binary-flagged
    final case class Ts(location: String, value: String) extends Val
    final case class UBig(v: Long) extends Val // unsigned bigint, reinterpreted bits
  }

  /** Wire-compatible CRC32-IEEE checksum of one image's values in
    * column order — the driver-side twin of
    * [[RowChecksum.checksumOf]] for this encoder's [[Val]] model
    * (verify_checksum.go:90-152): L/UBig fold their int64 bits LE,
    * F widens float32→float64 then folds the float64 bits, S/B/Ts
    * fold length-prefixed canonical bytes, Null folds nothing. Feed
    * the result into [[encodeDml]]'s `checksum` current/previous. */
  def checksumOf(vals: Seq[Val]): Long = {
    val crc = new java.util.zip.CRC32()
    vals.foreach { v =>
      val bytes = v match {
        case Val.Null => RowChecksum.empty
        case Val.L(x) => RowChecksum.tokenLong(x)
        case Val.UBig(x) => RowChecksum.tokenLong(x)
        case Val.F(x) => RowChecksum.tokenDouble(x.toDouble)
        case Val.D(x) => RowChecksum.tokenDouble(x)
        case Val.S(x) =>
          RowChecksum.tokenBytes(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        case Val.B(x) => RowChecksum.tokenBytes(x)
        case Val.Ts(_, value) =>
          RowChecksum.tokenBytes(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      crc.update(bytes)
    }
    crc.getValue
  }

  private def valToAvro(v: Val): AnyRef = v match {
    case Val.Null => null
    case Val.L(x) => java.lang.Long.valueOf(x)
    case Val.F(x) => java.lang.Float.valueOf(x)
    case Val.D(x) => java.lang.Double.valueOf(x)
    case Val.S(x) => x
    case Val.B(x) => java.nio.ByteBuffer.wrap(x)
    case Val.Ts(loc, value) =>
      val r = new GenericData.Record(timestampSchema)
      r.put("location", loc); r.put("value", value); r
    case Val.UBig(x) =>
      val r = new GenericData.Record(unsignedBigintSchema)
      r.put("value", java.lang.Long.valueOf(x)); r
  }

  final case class ColumnDef(name: String, mysqlType: String,
                             charset: String = "utf8mb4", collate: String = "utf8mb4_bin",
                             length: Long = 0L, decimalDigits: Option[Int] = None,
                             elements: Seq[String] = Nil,
                             unsigned: Option[Boolean] = None, zerofill: Option[Boolean] = None,
                             nullable: Boolean = true, default: Option[String] = None)
  final case class IndexDef(name: String, unique: Boolean, primary: Boolean,
                            nullable: Boolean, columns: Seq[String])
  final case class TableDef(database: String, table: String, tableId: Long,
                            version: Long, columns: Seq[ColumnDef], indexes: Seq[IndexDef])

  private def tableSchemaRecord(t: TableDef): GenericRecord = {
    val cols = t.columns.map { c =>
      val dt = new GenericData.Record(dataTypeSchema)
      dt.put("mysqlType", c.mysqlType)
      dt.put("charset", c.charset)
      dt.put("collate", c.collate)
      dt.put("length", java.lang.Long.valueOf(c.length))
      dt.put("decimal", c.decimalDigits.map(Int.box).orNull)
      dt.put("elements", if (c.elements.nonEmpty) c.elements.asJava else null)
      dt.put("unsigned", c.unsigned.map(Boolean.box).orNull)
      dt.put("zerofill", c.zerofill.map(Boolean.box).orNull)
      val r = new GenericData.Record(columnSchema)
      r.put("name", c.name); r.put("dataType", dt)
      r.put("nullable", java.lang.Boolean.valueOf(c.nullable))
      r.put("default", c.default.orNull)
      r
    }
    val idxs = t.indexes.map { i =>
      val r = new GenericData.Record(indexSchema)
      r.put("name", i.name); r.put("unique", java.lang.Boolean.valueOf(i.unique))
      r.put("primary", java.lang.Boolean.valueOf(i.primary))
      r.put("nullable", java.lang.Boolean.valueOf(i.nullable))
      r.put("columns", i.columns.asJava)
      r
    }
    val r = new GenericData.Record(tableSchemaSchema)
    r.put("database", t.database); r.put("table", t.table)
    r.put("tableID", java.lang.Long.valueOf(t.tableId))
    r.put("version", java.lang.Long.valueOf(t.version))
    r.put("columns", cols.asJava); r.put("indexes", idxs.asJava)
    r
  }

  // hot-path reuse: writer, encoder, and buffer are thread-local so a
  // per-partition encode loop allocates none of them per message (a
  // fresh GenericDatumWriter + binaryEncoder per row measured ~19× the
  // JSON form's wall on the sf0.1 roundtrip sweep)
  private val wrapBuf: ThreadLocal[ByteArrayOutputStream] =
    ThreadLocal.withInitial(() => new ByteArrayOutputStream(512))
  private val wrapWriter: ThreadLocal[GenericDatumWriter[AnyRef]] =
    ThreadLocal.withInitial(() => new GenericDatumWriter[AnyRef](wireSchema))
  private val wrapEnc =
    new ThreadLocal[org.apache.avro.io.BinaryEncoder]

  private def wrap(msgType: String, payload: GenericRecord): Array[Byte] = {
    val m = new GenericData.Record(messageSchema)
    m.put("type", new GenericData.EnumSymbol(
      messageSchema.getField("type").schema(), msgType))
    m.put("payload", payload)
    val out = wrapBuf.get(); out.reset()
    val enc = EncoderFactory.get().binaryEncoder(out, wrapEnc.get())
    wrapEnc.set(enc)
    wrapWriter.get().write(m, enc)
    enc.flush()
    out.toByteArray
  }

  /** MarshalCheckpoint (marshaller.go:116): a WATERMARK message. */
  def encodeWatermark(commitTs: Long, buildTs: Long, version: Int = 1): Array[Byte] = {
    val w = new GenericData.Record(watermarkSchema)
    w.put("version", java.lang.Integer.valueOf(version))
    w.put("commitTs", java.lang.Long.valueOf(commitTs))
    w.put("buildTs", java.lang.Long.valueOf(buildTs))
    wrap("WATERMARK", w)
  }

  /** Bootstrap handshake carrying the full table schema
    * (avro.go:159-178). */
  def encodeBootstrap(table: TableDef, buildTs: Long, version: Int = 1): Array[Byte] = {
    val b = new GenericData.Record(bootstrapSchema)
    b.put("version", java.lang.Integer.valueOf(version))
    b.put("buildTs", java.lang.Long.valueOf(buildTs))
    b.put("tableSchema", tableSchemaRecord(table))
    wrap("BOOTSTRAP", b)
  }

  /** DDL message (avro.go:181-215). */
  def encodeDdl(ddlType: String, sql: String, commitTs: Long, buildTs: Long,
                schema: Option[TableDef], preSchema: Option[TableDef] = None,
                version: Int = 1): Array[Byte] = {
    val d = new GenericData.Record(ddlSchema)
    d.put("version", java.lang.Integer.valueOf(version))
    d.put("type", new GenericData.EnumSymbol(
      ddlSchema.getField("type").schema(), ddlType))
    d.put("sql", sql)
    d.put("commitTs", java.lang.Long.valueOf(commitTs))
    d.put("buildTs", java.lang.Long.valueOf(buildTs))
    d.put("tableSchema", schema.map(tableSchemaRecord).orNull)
    d.put("preTableSchema", preSchema.map(tableSchemaRecord).orNull)
    wrap("DDL", d)
  }

  /** DML message (avro.go:250-341 newDMLMessageMap): INSERT carries
    * `data`, DELETE carries `old`, UPDATE carries both. */
  def encodeDml(op: String, database: String, table: String, tableId: Long,
                commitTs: Long, buildTs: Long, schemaVersion: Long,
                data: Map[String, Val] = Map.empty, old: Map[String, Val] = Map.empty,
                handleKeyOnly: Boolean = false, claimCheckLocation: Option[String] = None,
                checksum: Option[(Int, Boolean, Long, Long)] = None,
                version: Int = 1): Array[Byte] = {
    val d = new GenericData.Record(dmlSchema)
    d.put("version", java.lang.Integer.valueOf(version))
    d.put("database", database); d.put("table", table)
    d.put("tableID", java.lang.Long.valueOf(tableId))
    d.put("type", new GenericData.EnumSymbol(
      dmlSchema.getField("type").schema(), op))
    d.put("commitTs", java.lang.Long.valueOf(commitTs))
    d.put("buildTs", java.lang.Long.valueOf(buildTs))
    d.put("schemaVersion", java.lang.Long.valueOf(schemaVersion))
    d.put("claimCheckLocation", claimCheckLocation.orNull)
    d.put("handleKeyOnly", if (handleKeyOnly) java.lang.Boolean.TRUE else null)
    d.put("checksum", checksum.map { case (v, corrupted, cur, prev) =>
      val c = new GenericData.Record(checksumSchema)
      c.put("version", java.lang.Integer.valueOf(v))
      c.put("corrupted", java.lang.Boolean.valueOf(corrupted))
      c.put("current", java.lang.Long.valueOf(cur))
      c.put("previous", java.lang.Long.valueOf(prev))
      c
    }.orNull)
    def m(vals: Map[String, Val]): AnyRef =
      if (vals.isEmpty) null
      else vals.map { case (k, v) => k -> valToAvro(v) }.asJava
    op match {
      case "INSERT" => d.put("data", m(data))
      case "DELETE" => d.put("old", m(old))
      case "UPDATE" => d.put("data", m(data)); d.put("old", m(old))
      case other => throw new IllegalArgumentException(s"unknown DML type: $other")
    }
    wrap("DML", d)
  }

  private val selfReader: ThreadLocal[GenericDatumReader[AnyRef]] =
    ThreadLocal.withInitial(() => new GenericDatumReader[AnyRef](wireSchema))
  private val decDec =
    new ThreadLocal[org.apache.avro.io.BinaryDecoder]

  /** Decode one wire message with `readerSchema` (defaults to ours;
    * pass a schema parsed from the reference's message.json to prove
    * cross-implementation reads). Returns the Message record. The
    * self-schema path reuses a thread-local reader + decoder (the
    * per-message reader construction re-resolves the whole union). */
  def decode(bytes: Array[Byte], readerSchema: Schema = wireSchema): GenericRecord = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, decDec.get())
    decDec.set(dec)
    val reader =
      if (readerSchema eq wireSchema) selfReader.get()
      else new GenericDatumReader[AnyRef](wireSchema, readerSchema)
    reader.read(null, dec).asInstanceOf[GenericRecord]
  }
}
