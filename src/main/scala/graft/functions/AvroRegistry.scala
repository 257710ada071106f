package graft.functions

import java.nio.ByteBuffer
import scala.collection.concurrent.TrieMap
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, DecoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro schema-registry round trip (SURVEY §2.7; reference
  * pkg/sink/codec/avro/confluent_schema_registry.go:1-499 — register
  * returns a global schema id, messages carry the Confluent wire
  * framing `magic 0x00 | id int32-BE | avro payload`, consumers
  * resolve the WRITER schema by id and read with their own reader
  * schema).
  *
  * Offline container — the HTTP client is out of reach — so the
  * registry is a trait with an in-memory store carrying the protocol
  * semantics: content-addressed ids (same schema text → same id),
  * per-subject version lists, id-resolved decode with Avro schema
  * resolution (new-reader-reads-old-writer via field defaults — the
  * compatibility rule a real registry enforces). The wire bytes are
  * exactly the Confluent framing, so swapping the store for an HTTP
  * client changes no data-path code.
  */
object AvroRegistry {

  /** Registry surface (subject = `{topic}-{schema}.{table}-value` in
    * the reference's naming, confluent_schema_registry.go).
    *
    * `versions` follows the REAL Confluent API contract: `GET
    * /subjects/{s}/versions` returns VERSION NUMBERS (1,2,3…), NOT
    * global schema ids — the two spaces only coincide on a fresh
    * single-subject registry. Callers that need writer ids use
    * [[latest]] (the `versions/latest` answer carries the global id
    * alongside the schema) or [[idsFor]] (version→id translated per
    * entry). */
  trait SchemaStore extends Serializable {
    def register(subject: String, schemaJson: String): Int
    def byId(id: Int): String
    /** Version numbers (1-based, ascending) — the Confluent
      * `GET /subjects/{s}/versions` payload. */
    def versions(subject: String): Seq[Int]
    /** (global schema id, canonical schema json) of the subject's
      * latest version — `GET /subjects/{s}/versions/latest`. */
    def latest(subject: String): (Int, String)
    /** Global schema ids of ALL the subject's versions, in version
      * order (each `GET /subjects/{s}/versions/{v}` answer's `id`). */
    def idsFor(subject: String): Seq[Int]
  }

  /** Registering a schema the subject's compatibility level rejects —
    * the condition a Confluent registry answers with HTTP 409
    * (confluent_schema_registry.go:176 "409 for incompatible
    * schema"). */
  final class IncompatibleSchemaException(val subject: String)
    extends RuntimeException(
      s"schema is incompatible with the latest version of subject $subject")

  /** BACKWARD compatibility — the Confluent default level the
    * reference's registry enforces on register: the NEW schema (as
    * reader) must be able to read data written with the OLD schema
    * (Avro schema-resolution rules: removed fields ok, added fields
    * need defaults, no type changes without promotion). */
  def backwardCompatible(newSchemaJson: String, oldSchemaJson: String): Boolean = {
    import org.apache.avro.SchemaCompatibility
    val reader = new Schema.Parser().parse(newSchemaJson)
    val writer = new Schema.Parser().parse(oldSchemaJson)
    SchemaCompatibility.checkReaderWriterCompatibility(reader, writer)
      .getType == SchemaCompatibility.SchemaCompatibilityType.COMPATIBLE
  }

  /** In-memory store: content-addressed global ids + per-subject
    * version chains — the reference registry's data model. Evolution
    * is gated by `compatibility` ("BACKWARD" — the Confluent default
    * — or "NONE"): an incompatible register throws
    * [[IncompatibleSchemaException]] (→ HTTP 409 through the stub). */
  final class InMemoryStore(compatibility: String = "BACKWARD") extends SchemaStore {
    require(compatibility == "BACKWARD" || compatibility == "NONE",
      s"unsupported compatibility level $compatibility")
    private val byText = TrieMap.empty[String, Int]
    private val byIdMap = TrieMap.empty[Int, String]
    private val subjects = TrieMap.empty[String, Vector[Int]]
    private val nextId = new java.util.concurrent.atomic.AtomicInteger(0)

    /** Would `schemaJson` be accepted as the subject's next version?
      * (the `POST /compatibility/subjects/{s}/versions/latest`
      * answer). Re-registering an existing version verbatim is always
      * compatible. */
    def compatibleWithLatest(subject: String, schemaJson: String): Boolean = {
      val canonical = new Schema.Parser().parse(schemaJson).toString
      // idsFor, not versions: the latest GLOBAL id resolves the schema
      compatibility == "NONE" || idsFor(subject).lastOption.forall { latest =>
        val old = byId(latest)
        old == canonical || backwardCompatible(canonical, old)
      }
    }

    def register(subject: String, schemaJson: String): Int = {
      val canonical = new Schema.Parser().parse(schemaJson).toString
      if (!compatibleWithLatest(subject, canonical))
        throw new IncompatibleSchemaException(subject)
      val id = byText.getOrElseUpdate(canonical, {
        val i = nextId.incrementAndGet()
        byIdMap.put(i, canonical)
        i
      })
      subjects.updateWith(subject) {
        case Some(v) if v.contains(id) => Some(v)
        case Some(v) => Some(v :+ id)
        case None => Some(Vector(id))
      }
      id
    }
    def byId(id: Int): String =
      byIdMap.getOrElse(id, sys.error(s"unknown schema id $id"))
    def versions(subject: String): Seq[Int] =
      (1 to idsFor(subject).size)
    def idsFor(subject: String): Seq[Int] =
      subjects.getOrElse(subject, Vector.empty)
    def latest(subject: String): (Int, String) = {
      val ids = idsFor(subject)
      require(ids.nonEmpty, s"no registered versions under subject $subject")
      (ids.last, byId(ids.last))
    }
  }

  /** Confluent wire framing: magic 0x00 + 4-byte big-endian schema id
    * + payload. */
  // ---- avro control events (tidb-extension + watermark mode) ----
  // avro/encoder.go:104-147 + helper.go:51-52: row messages carry the
  // Confluent magic byte 0 head; DDL events are 0x01 ++ a compact JSON
  // {"query","type","schema","table","commitTs"}; checkpoint events
  // are 0x02 ++ the big-endian u64 resolved ts. The decoder dispatches
  // on the first byte (decoder.go:94-98).

  val DdlByte: Byte = 1
  val CheckpointByte: Byte = 2
  /** Watermark-mode delete VALUE marker (helper.go:53 deleteByte;
    * arvo.go:130-141): 0x03 ++ BE u64 commit ts — 9 bytes exactly
    * (decoder.go:232 panics otherwise). Only emitted under
    * `avro-enable-watermark`; otherwise deletes are bare-key
    * tombstones. */
  val DeleteByte: Byte = 3

  def deleteValueBytes(commitTs: Long): Array[Byte] = {
    val b = new Array[Byte](9)
    b(0) = DeleteByte
    var i = 0
    while (i < 8) { b(1 + i) = ((commitTs >>> (8 * (7 - i))) & 0xffL).toByte; i += 1 }
    b
  }

  /** Commit ts of a watermark-mode delete value
    * (decodeDeleteCommitTs, decoder.go:231-239). */
  def deleteValueCommitTs(bytes: Array[Byte]): Long = {
    require(bytes.length == 9 && bytes(0) == DeleteByte,
      s"avro invalid delete value: expected 0x03 + 8-byte commit ts, " +
        s"got ${bytes.length} bytes")
    var ts = 0L
    var i = 0
    while (i < 8) { ts = (ts << 8) | (bytes(1 + i) & 0xffL); i += 1 }
    ts
  }

  def ddlEventBytes(query: String, actionType: Int, schema: String,
                    table: String, commitTs: Long): Array[Byte] = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val json = s"""{"query":"${esc(query)}","type":$actionType,""" +
      s""""schema":"${esc(schema)}","table":"${esc(table)}",""" +
      s""""commitTs":$commitTs}"""
    Array(DdlByte) ++ json.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  def checkpointEventBytes(ts: Long): Array[Byte] = {
    val b = new Array[Byte](9)
    b(0) = CheckpointByte
    var i = 0
    while (i < 8) { b(1 + i) = ((ts >>> (8 * (7 - i))) & 0xffL).toByte; i += 1 }
    b
  }

  /** Consumer dispatch on the leading byte (decoder.go:94-98):
    * Left((query, type, schema, table, commitTs)) for DDL,
    * Right(resolvedTs) for checkpoint; None for row messages (magic 0,
    * which [[unframe]] handles). */
  def decodeControlEvent(bytes: Array[Byte])
      : Option[Either[(String, Int, String, String, Long), Long]] =
    bytes.headOption match {
      case Some(DdlByte) =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val n = mapper.readTree(new String(bytes.drop(1),
          java.nio.charset.StandardCharsets.UTF_8))
        Some(Left((n.get("query").asText(), n.get("type").asInt(),
          n.get("schema").asText(), n.get("table").asText(),
          n.get("commitTs").asLong())))
      case Some(CheckpointByte) =>
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | (bytes(1 + i) & 0xffL); i += 1 }
        Some(Right(v))
      case _ => None
    }

  def frame(schemaId: Int, payload: Array[Byte]): Array[Byte] =
    ByteBuffer.allocate(5 + payload.length)
      .put(0.toByte).putInt(schemaId).put(payload).array()

  def unframe(bytes: Array[Byte]): (Int, Array[Byte]) = {
    require(bytes.length >= 5 && bytes(0) == 0, "bad confluent framing")
    val bb = ByteBuffer.wrap(bytes)
    bb.get()
    val id = bb.getInt
    val payload = new Array[Byte](bytes.length - 5)
    bb.get(payload)
    (id, payload)
  }

  /** Encode the envelope with registry framing: the schema registers
    * once on the driver (the reference registers on encoder init /
    * schema change, not per message) and executors emit framed bytes. */
  def encodeFramed(env: DataFrame, store: SchemaStore, subject: String): DataFrame = {
    val schemaId = store.register(subject, AvroCodec.envelopeSchemaJson)
    val framed = AvroCodec.encode(env)
      .mapPartitions { rows =>
        rows.map(r => Row(r.getLong(0), frame(schemaId, r.getAs[Array[Byte]](1))))
      }(Encoders.row(StructType(Seq(
        StructField("_row_id", LongType), StructField("_value", BinaryType)))))
    framed
  }

  private val decodedSchema = StructType(Seq(
    StructField("_row_id", LongType),
    StructField("_schema_id", IntegerType),
    StructField("_op", StringType),
    StructField("_commit_ts", LongType),
    StructField("after_user_id", LongType),
    StructField("after_value", DoubleType),
    StructField("after_k", LongType),
    StructField("origin", StringType)))

  /** Consumer-side decode: unframe, resolve the writer schema by id
    * from the (broadcast) id→schema map, read with `readerSchemaJson`
    * — Avro schema resolution fills reader-only fields from their
    * defaults, exactly how a registry-compatible evolution reads old
    * messages. */
  def decodeFramed(msgs: DataFrame, idToSchema: Map[Int, String],
                   readerSchemaJson: String): DataFrame = {
    msgs.select(col("_row_id"), col("_value"))
      .mapPartitions { rows =>
        val readerSchema = new Schema.Parser().parse(readerSchemaJson)
        val readers = scala.collection.mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
        var dec: BinaryDecoder = null
        rows.map { r =>
          val (id, payload) = unframe(r.getAs[Array[Byte]](1))
          val reader = readers.getOrElseUpdate(id, {
            val writer = new Schema.Parser().parse(idToSchema(id))
            new GenericDatumReader[GenericRecord](writer, readerSchema)
          })
          dec = DecoderFactory.get().binaryDecoder(payload, dec)
          val rec = reader.read(null, dec)
          val after = Option(rec.get("after").asInstanceOf[GenericRecord])
          Row(r.getLong(0), id,
            rec.get("op").toString, rec.get("commit_ts"),
            after.map(_.get("user_id")).orNull,
            after.map(_.get("value")).orNull,
            after.map(_.get("k")).orNull,
            Option(rec.get("origin")).map(_.toString).orNull)
        }
      }(Encoders.row(decodedSchema))
  }

  /** The evolved reader schema: envelope + an `origin` field with a
    * default — readable against old-writer messages via resolution. */
  val evolvedSchemaJson: String =
    AvroCodec.envelopeSchemaJson.stripSuffix("]}") +
      """,{"name":"origin","type":"string","default":"upstream"}]}"""

  // ---- AWS Glue registry framing (glue_schema_registry.go:1-352) ----
  // Glue's wire format differs from Confluent's: 1-byte header version
  // (3), 1-byte compression (0 = none), then the schema-version UUID
  // (16 bytes big-endian), then the payload. Registry semantics
  // (register → id, resolve by id) are shared with SchemaStore; the
  // UUID derives deterministically from the canonical schema text so
  // both sides compute it without coordination.

  val GlueHeaderVersion: Byte = 3
  val GlueCompressionNone: Byte = 0
  /** Glue's zlib compression marker (glue_schema_registry.go's
    * compression byte; 5 = zlib in the AWS wire format). */
  val GlueCompressionZlib: Byte = 5

  /** Deterministic schema-version UUID: md5 of the canonical schema
    * text (content-addressing, like the in-memory store's ids). */
  def glueSchemaUuid(schemaJson: String): java.util.UUID = {
    val canonical = new Schema.Parser().parse(schemaJson).toString
    java.util.UUID.nameUUIDFromBytes(canonical.getBytes("UTF-8"))
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val i = new java.util.zip.Inflater()
    i.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 3 + 64)
    val buf = new Array[Byte](4096)
    while (!i.finished()) {
      val n = i.inflate(buf)
      require(n > 0 || i.finished() || !i.needsInput(), "truncated zlib payload")
      out.write(buf, 0, n)
    }
    i.end()
    out.toByteArray
  }

  def glueFrame(uuid: java.util.UUID, payload: Array[Byte],
                compress: Boolean = false): Array[Byte] = {
    val body = if (compress) deflate(payload) else payload
    ByteBuffer.allocate(18 + body.length)
      .put(GlueHeaderVersion)
      .put(if (compress) GlueCompressionZlib else GlueCompressionNone)
      .putLong(uuid.getMostSignificantBits)
      .putLong(uuid.getLeastSignificantBits)
      .put(body).array()
  }

  def glueUnframe(bytes: Array[Byte]): (java.util.UUID, Array[Byte]) = {
    require(bytes.length >= 18 && bytes(0) == GlueHeaderVersion,
      "bad glue framing")
    val compression = bytes(1)
    require(compression == GlueCompressionNone || compression == GlueCompressionZlib,
      s"unknown glue compression byte $compression")
    val bb = ByteBuffer.wrap(bytes)
    bb.get(); bb.get()
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    val body = new Array[Byte](bytes.length - 18)
    bb.get(body)
    val payload = if (compression == GlueCompressionZlib) inflate(body) else body
    (uuid, payload)
  }
}
