package graft.functions

import scala.collection.concurrent.TrieMap
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro as a STREAMING changefeed protocol (SURVEY §2.7; reference
  * pkg/sink/codec/builder.go builds avro through the same encoder
  * factory as every other protocol; avro/encoder.go:68 runs the
  * schema-registry round trip per (topic, table-version)).
  *
  * Wire shape per row event: Confluent-framed KEY (handle-key record)
  * and VALUE (column record + the TiDB extension meta fields
  * `_tidb_op` / `_tidb_commit_ts` / `_tidb_physical_time`,
  * avro/arvo.go enableTiDBExtension); a DELETE ships the key with an
  * EMPTY value (the tombstone form — the key alone identifies the
  * row, avro/encoder.go delete path). DDL and checkpoint events ride
  * the 0x01/0x02 control framing ([[AvroRegistry.ddlEventBytes]] /
  * [[AvroRegistry.checkpointEventBytes]]). On the parquet FileMq
  * transport the binary pair wraps into the `{"k":b64,"v":b64}`
  * string frame ([[OpenBatch.frameJson]]), exactly like the open
  * batch wire.
  *
  * Table identity rides the WRITER schema's fullname
  * (namespace `graft.<schema>`, record name `<table>` — the
  * reference's schema naming, avro/arvo.go recordName), so a consumer
  * recovers (schema, table) from the registry alone, no out-of-band
  * metadata.
  *
  * Registration happens on FIRST SIGHT of a (schema, table) inside
  * the encode task — the reference registers from the sink worker's
  * encoder on table or version change — and the evolving feed
  * additionally registers the post-fold shape on every DDL fold
  * (driver-side, before the batch's rows encode). The in-memory
  * registry stands in for the Confluent endpoint offline
  * ([[AvroRegistry.InMemoryStore]]); ids are content-addressed, so
  * executor-lazy and driver-eager registration agree.
  *
  * Scale: one mapPartitions over the already-routed envelope —
  * encode work is row-local, registration is census-sized (distinct
  * tables), and no driver state enters the closure (executors resolve
  * the registry by URI).
  */
object AvroWire {

  /** Process-global registries by URI — one registry service per URL,
    * the way every sink worker of a deployment shares the endpoint.
    * SCHEME-DISPATCHED (confluent_schema_registry.go resolves the
    * sink-uri's schema-registry param to the HTTP client): `http(s)://`
    * → the real Confluent client ([[HttpSchemaRegistry
    * .ConfluentHttpClient]], retry/backoff/409 semantics over TCP),
    * `glue://` → the Glue wire's per-URI store, `mem://` → the
    * in-memory offline stand-in. Unknown schemes reject — at
    * changefeed create via [[validateUri]], and again here so a
    * mis-routed executor task fails loud instead of silently keeping
    * schemas process-local. */
  private val stores = TrieMap.empty[String, AvroRegistry.SchemaStore]
  def registryFor(uri: String): AvroRegistry.SchemaStore =
    stores.getOrElseUpdate(uri, schemeOf(uri) match {
      case "http" | "https" => new HttpSchemaRegistry.ConfluentHttpClient(uri)
      case "glue" | "mem" => new AvroRegistry.InMemoryStore()
      case other => throw new IllegalArgumentException(
        s"unsupported schema-registry scheme '$other' in $uri " +
          "(expected http://, https://, glue://, or mem://)")
    })
  private def schemeOf(uri: String): String = {
    val i = uri.indexOf("://")
    if (i < 0) "" else uri.substring(0, i)
  }
  /** Create-time scheme check: an avro changefeed with an unresolvable
    * registry uri is rejected before the stream starts. */
  def validateUri(uri: String): Unit = {
    require(Set("http", "https", "glue", "mem").contains(schemeOf(uri)),
      s"unsupported schema-registry scheme in '$uri' " +
        "(expected http://, https://, glue://, or mem://)")
  }
  /** Test isolation: drop a registry instance. */
  def dropRegistry(uri: String): Unit = { stores.remove(uri); glueSchemas.remove(uri); () }

  /** A `glue://` registry URI selects the AWS Glue wire framing
    * (header version 3 + compression byte + content-derived
    * schema-version UUID, glue_schema_registry.go) instead of the
    * Confluent magic-0 + int-id head; registration and subject
    * bookkeeping are shared — the uuid→schema map is the Glue
    * service's resolve-by-version-id, stood in per URI. */
  def isGlue(uri: String): Boolean = uri.startsWith("glue://")
  private val glueSchemas = TrieMap.empty[String, TrieMap[java.util.UUID, String]]
  private def glueMap(uri: String): TrieMap[java.util.UUID, String] =
    glueSchemas.getOrElseUpdate(uri, TrieMap.empty)
  private def recordGlue(uri: String, json: String): java.util.UUID = {
    val u = AvroRegistry.glueSchemaUuid(json)
    glueMap(uri).put(u, json)
    u
  }

  /** Avro-legal name (common.go sanitizeName: [A-Za-z0-9_] with a
    * leading letter/underscore; everything else becomes '_'). */
  def sanitize(name: String): String = {
    val s = name.map(c => if (c.isLetterOrDigit || c == '_') c else '_')
    if (s.isEmpty || s.head.isDigit) "_" + s else s
  }

  /** Subject naming (confluent_schema_registry.go): per-table topic
    * suffixed -key / -value. */
  def valueSubject(topic: String, schema: String, table: String): String =
    s"$topic-$schema.$table-value"
  def keySubject(topic: String, schema: String, table: String): String =
    s"$topic-$schema.$table-key"

  /** Sanitization can map DISTINCT column names to one Avro field
    * (`a-b` and `a_b` both become `a_b`) — the duplicate-field record
    * Schema.Parser rejects with an opaque error deep in mapPartitions.
    * Fail fast at schema build, naming the colliding columns. */
  private[functions] def checkSanitizeCollisions(fields: Seq[StructField],
                                      schema: String, table: String): Unit =
    fields.groupBy(f => sanitize(f.name)).foreach { case (san, fs) =>
      require(fs.size == 1,
        s"avro schema for $schema.$table: columns " +
          fs.map(_.name).mkString("'", "', '", "'") +
          s" all sanitize to avro field '$san' — rename the columns or " +
          "select them apart before the avro sink")
    }

  /** Value-mapping modes (codec/common/config.go:130-131 defaults):
    * `decimal` = precise (bytes + logical decimal) | string;
    * `unsignedBigint` = long (the u64 bits) | string. Unsigned BIGINT
    * rides DecimalType(20,0) in this engine's payloads (the
    * RawKvMounter convention, RawKvMounter.scala:208-212), so that
    * shape dispatches the unsigned mode, not the decimal mode. */
  final case class AvroModes(decimal: String = "precise",
                             unsignedBigint: String = "long") {
    require(decimal == "precise" || decimal == "string",
      s"avro-decimal-handling-mode must be precise|string, got $decimal")
    require(unsignedBigint == "long" || unsignedBigint == "string",
      s"avro-bigint-unsigned-handling-mode must be long|string, got $unsignedBigint")
  }

  /** Mode-aware wire type for one column (arvo.go:551,637,657): the
    * two string modes replace the precise carriers with plain
    * strings; unsigned-bigint long mode ships the u64 BITS as avro
    * long (the reference's int64(d.GetUint64())). */
  private def wireTypeFor(dt: DataType, modes: AvroModes): String = dt match {
    case d: DecimalType if d.precision == 20 && d.scale == 0 =>
      if (modes.unsignedBigint == "long") "\"long\"" else "\"string\""
    case _: DecimalType if modes.decimal == "string" => "\"string\""
    case other => AvroCodec.avroTypeFor(other)
  }

  /** Mode-aware encode of one value (the inverse lives in
    * [[AvroCodec.fromAvroValue]], which dispatches on the runtime
    * avro type so ONE decoder reads every mode). */
  private def toWireValue(v: Any, dt: DataType, modes: AvroModes): AnyRef =
    (v, dt) match {
      case (null, _) => null
      case (x: java.math.BigDecimal, d: DecimalType)
          if d.precision == 20 && d.scale == 0 =>
        if (modes.unsignedBigint == "long") Long.box(x.toBigInteger.longValue())
        else x.toPlainString
      case (x: java.math.BigDecimal, _: DecimalType)
          if modes.decimal == "string" =>
        x.toPlainString
      case _ => AvroCodec.toAvroValue(v, dt)
    }

  /** VALUE record schema: every column a nullable union with default
    * (optional columns, the reference's generated shape) + the TiDB
    * extension meta fields. */
  def valueSchemaJson(payload: Seq[StructField], schema: String,
                      table: String,
                      modes: AvroModes = AvroModes()): String = {
    checkSanitizeCollisions(payload, schema, table)
    val cols = payload.map(f =>
      s"""{"name":"${sanitize(f.name)}","type":["null",${wireTypeFor(f.dataType, modes)}],"default":null}""")
    val ext = Seq(
      """{"name":"_tidb_op","type":"string","default":"c"}""",
      """{"name":"_tidb_commit_ts","type":"long","default":0}""",
      """{"name":"_tidb_physical_time","type":"long","default":0}""")
    (cols ++ ext).mkString(
      s"""{"type":"record","name":"${sanitize(table)}","namespace":"graft.${sanitize(schema)}","fields":[""",
      ",", "]}")
  }

  /** KEY record schema: the handle-key columns, non-null (a handle
    * key is never null upstream). */
  def keySchemaJson(keys: Seq[StructField], schema: String,
                    table: String,
                    modes: AvroModes = AvroModes()): String = {
    checkSanitizeCollisions(keys, schema, table)
    keys.map(f =>
      s"""{"name":"${sanitize(f.name)}","type":${wireTypeFor(f.dataType, modes)}}""")
      .mkString(
        s"""{"type":"record","name":"${sanitize(table)}","namespace":"graft.${sanitize(schema)}.key","fields":[""",
        ",", "]}")
  }

  /** Driver-side registration for one table shape — the evolving
    * feed's register-on-DDL-fold half (avro/encoder.go:68 registers
    * the new version before post-DDL rows encode). Returns
    * (keySchemaId, valueSchemaId). */
  def registerTable(registryUri: String, topic: String, schema: String,
                    table: String, payload: StructType,
                    handleKeys: Seq[String],
                    modes: AvroModes = AvroModes()): (Int, Int) = {
    val store = registryFor(registryUri)
    val keyFields = payload.fields.filter(f => handleKeys.contains(f.name)).toSeq
    val kJson = keySchemaJson(keyFields, schema, table, modes)
    val vJson = valueSchemaJson(payload.fields.toSeq, schema, table, modes)
    val kid = store.register(keySubject(topic, schema, table), kJson)
    val vid = store.register(valueSubject(topic, schema, table), vJson)
    if (isGlue(registryUri)) { recordGlue(registryUri, kJson); recordGlue(registryUri, vJson) }
    (kid, vid)
  }

  private val outSchema = StructType(Seq(
    StructField("_row_id", LongType),
    StructField("_schema", StringType),
    StructField("_table", StringType),
    StructField("_partition", LongType),
    StructField("_commit_ts", LongType),
    StructField("_value", StringType)))

  /** Envelope → per-row `{"k":b64(framed key),"v":b64(framed value)}`
    * string frames. One payload shape per call (the struct path's
    * invariant); heterogeneous feeds run per shape group like every
    * other struct-path protocol. */
  def encodeFeed(env: DataFrame, handleKeys: Seq[String],
                 registryUri: String, topic: String = "graft",
                 modes: AvroModes = AvroModes(),
                 enableWatermark: Boolean = false): DataFrame = {
    require(registryUri.nonEmpty,
      "avro protocol requires a schema-registry uri")
    val payload = env.schema.fields.find(_.name == "after").get
      .dataType.asInstanceOf[StructType]
    val fieldTypes = payload.fields.map(f => f.name -> f.dataType).toSeq
    val keyIdx = payload.fields.zipWithIndex
      .filter { case (f, _) => handleKeys.contains(f.name) }
      .map { case (f, i) => (f.name, f.dataType, i) }.toSeq
    require(keyIdx.nonEmpty, s"avro key needs handle keys $handleKeys " +
      s"present in the payload ${payload.fieldNames.mkString(",")}")
    val withPart =
      if (env.columns.contains("_partition")) env
      else env.withColumn("_partition", lit(0L))
    withPart.select(col("_row_id"), col("_schema"), col("_table"),
        col("_partition").cast("long"), col("_commit_ts"), col("_op"),
        col("before"), col("after"))
      .mapPartitions { rows =>
        val store = registryFor(registryUri)
        // per-(schema, table) lazy registration + writer cache — the
        // encoder-on-first-sight shape; census-sized state
        val glue = isGlue(registryUri)
        val cache = scala.collection.mutable.Map.empty[(String, String),
          (Array[Byte] => Array[Byte], Schema, GenericDatumWriter[GenericRecord],
           Array[Byte] => Array[Byte], Schema, GenericDatumWriter[GenericRecord])]
        val buf = new java.io.ByteArrayOutputStream(256)
        var enc: BinaryEncoder = null
        def write(w: GenericDatumWriter[GenericRecord], rec: GenericRecord): Array[Byte] = {
          buf.reset()
          enc = EncoderFactory.get().binaryEncoder(buf, enc)
          w.write(rec, enc); enc.flush()
          buf.toByteArray
        }
        rows.map { r =>
          val (s, t) = (r.getString(1), r.getString(2))
          val (kFrame, kSchema, kWriter, vFrame, vSchema, vWriter) =
            cache.getOrElseUpdate((s, t), {
              val kJson = keySchemaJson(
                keyIdx.map(k => StructField(k._1, k._2)), s, t, modes)
              val vJson = valueSchemaJson(payload.fields.toSeq, s, t, modes)
              val ki = store.register(keySubject(topic, s, t), kJson)
              val vi = store.register(valueSubject(topic, s, t), vJson)
              val (kf, vf): (Array[Byte] => Array[Byte], Array[Byte] => Array[Byte]) =
                if (glue) {
                  val ku = recordGlue(registryUri, kJson)
                  val vu = recordGlue(registryUri, vJson)
                  (AvroRegistry.glueFrame(ku, _), AvroRegistry.glueFrame(vu, _))
                } else (AvroRegistry.frame(ki, _), AvroRegistry.frame(vi, _))
              val ks = new Schema.Parser().parse(kJson)
              val vs = new Schema.Parser().parse(vJson)
              (kf, ks, new GenericDatumWriter[GenericRecord](ks),
                vf, vs, new GenericDatumWriter[GenericRecord](vs))
            })
          val op = r.getString(5) match {
            case "I" => "c"; case "D" => "d"; case _ => "u"
          }
          // key from the pre-image for deletes, post-image otherwise
          val img = if (op == "d") r.getStruct(6) else r.getStruct(7)
          val kRec = new GenericData.Record(kSchema)
          keyIdx.foreach { case (n, dt, i) =>
            kRec.put(sanitize(n),
              if (img == null || img.isNullAt(i)) null
              else toWireValue(img.get(i), dt, modes))
          }
          val keyBytes = kFrame(write(kWriter, kRec))
          val valueBytes =
            if (op == "d") {
              // watermark mode: the delete VALUE is 0x03 ++ BE commit
              // ts (arvo.go:130-141) so a log-compacted topic keeps
              // the delete's position; off, the bare-key avro
              // tombstone (encodeValue returns nil)
              if (!enableWatermark) Array.emptyByteArray
              else AvroRegistry.deleteValueBytes(r.getLong(4))
            } else {
              val vRec = new GenericData.Record(vSchema)
              fieldTypes.zipWithIndex.foreach { case ((n, dt), i) =>
                vRec.put(sanitize(n), if (img == null || img.isNullAt(i)) null
                  else toWireValue(img.get(i), dt, modes))
              }
              vRec.put("_tidb_op", op)
              vRec.put("_tidb_commit_ts", r.getLong(4))
              vRec.put("_tidb_physical_time", r.getLong(4) / 1000000L)
              vFrame(write(vWriter, vRec))
            }
          Row(r.getLong(0), s, t, r.getLong(3), r.getLong(4),
            OpenBatch.frameJson(keyBytes, valueBytes))
        }
      }(Encoders.row(outSchema))
  }

  /** Consumer decode by REGISTRY ID with an explicit reader shape:
    * every frame's writer schema resolves from the store by its
    * carried id; Avro schema resolution reads OLD-era messages with
    * the reader's defaults (the evolving-feed contract — one reader,
    * both eras). Deletes (empty value) decode their KEY record.
    * Control frames (0x01/0x02) and non-row frames are skipped —
    * [[controlEvents]] surfaces them. (schema, table) come from the
    * writer fullname. */
  def decodeFeedAs(msgs: DataFrame, registryUri: String,
                   reader: StructType): DataFrame = {
    val fieldTypes = reader.fields.map(f => f.name -> f.dataType).toSeq
    // frame stores written since the offset contract carry `_offset`
    // (the producer's per-event apply order — the Kafka offset
    // analog); pass it through so consumers can tiebreak
    // same-commit-ts rows deterministically. Appended LAST so
    // positional payload access stays stable for offset-less callers.
    val hasOffset = msgs.columns.contains("_offset")
    val out = StructType(Seq(
      StructField("_schema", StringType), StructField("_table", StringType),
      StructField("_op", StringType), StructField("_commit_ts", LongType)) ++
      reader.fields.map(f => f.copy(nullable = true)) ++
      (if (hasOffset) Seq(StructField("_offset", LongType)) else Nil))
    val selected =
      if (hasOffset) msgs.select(col("_value"), col("_commit_ts"), col("_offset"))
      else msgs.select(col("_value"), col("_commit_ts"))
    selected.mapPartitions { rows =>
      def offOf(r: Row): Seq[Any] =
        if (!hasOffset) Nil
        else Seq(if (r.isNullAt(2)) null else r.getLong(2))
      val store = registryFor(registryUri)
      val readers = scala.collection.mutable.Map.empty[String, (Schema, GenericDatumReader[GenericRecord])]
      var dec: BinaryDecoder = null
      // resolve the writer schema by the frame's own registry
      // reference: Confluent magic-0 int id via the store, Glue
      // header-3 schema-version UUID via the per-URI version map
      def resolveWriter(bytes: Array[Byte]): (String, String, Array[Byte]) =
        if (bytes.nonEmpty && bytes(0) == AvroRegistry.GlueHeaderVersion) {
          val (uuid, payload) = AvroRegistry.glueUnframe(bytes)
          (uuid.toString,
            glueMap(registryUri).getOrElse(uuid,
              sys.error(s"unknown glue schema version $uuid")), payload)
        } else {
          val (id, payload) = AvroRegistry.unframe(bytes)
          (id.toString, store.byId(id), payload)
        }
      // read every record with its WRITER schema and probe per reader
      // field (like DebeziumAvroWire): pre-DDL eras read their missing
      // columns as null, and a mode-divergent writer (string-mode
      // decimals/u64) decodes without the reader guessing its wire
      // types — fromAvroValue converts by runtime avro type
      def readRec(bytes: Array[Byte]): (Schema, GenericRecord) = {
        val (refKey, writerJson, payload) = resolveWriter(bytes)
        val (wSchema, rdr) = readers.getOrElseUpdate(refKey, {
          val w = new Schema.Parser().parse(writerJson)
          (w, new GenericDatumReader[GenericRecord](w))
        })
        dec = DecoderFactory.get().binaryDecoder(payload, dec)
        (wSchema, rdr.read(null, dec))
      }
      rows.flatMap { r =>
        val (k, v) = OpenBatch.parseFrame(r.getString(0))
        val isWatermarkDelete = v.length == 9 && v(0) == AvroRegistry.DeleteByte
        if (v.nonEmpty && (v(0) == AvroRegistry.DdlByte ||
            v(0) == AvroRegistry.CheckpointByte)) None // control event
        else if (v.isEmpty || isWatermarkDelete) {
          // delete: bare-key tombstone, or the watermark-mode 0x03 +
          // commit-ts value (isDeleteValue, decoder.go:225-239) — the
          // image decodes from the KEY either way
          val (ks, rec) = readRec(k)
          val vals = fieldTypes.map { case (n, dt) =>
            Option(ks.getField(sanitize(n)))
              .map(f => AvroCodec.fromAvroValue(rec.get(f.pos()), dt)).orNull
          }
          val ts =
            if (isWatermarkDelete) AvroRegistry.deleteValueCommitTs(v)
            else r.getLong(1)
          Some(Row.fromSeq(Seq(
            ks.getNamespace.stripPrefix("graft.").stripSuffix(".key"),
            ks.getName, "d", ts) ++ vals ++ offOf(r)))
        } else {
          val (vs, rec) = readRec(v)
          val vals = fieldTypes.map { case (n, dt) =>
            Option(vs.getField(sanitize(n)))
              .map(f => AvroCodec.fromAvroValue(rec.get(f.pos()), dt)).orNull
          }
          Some(Row.fromSeq(Seq(
            vs.getNamespace.stripPrefix("graft."), vs.getName,
            rec.get("_tidb_op").toString,
            rec.get("_tidb_commit_ts").asInstanceOf[Long]) ++ vals ++ offOf(r)))
        }
      }
    }(Encoders.row(out))
  }

  /** Spark type of one avro field schema — the inverse of
    * [[AvroCodec.avroTypeFor]] over the wire shapes this encoder
    * emits (nullable unions unwrap; logical types map back). Lets a
    * consumer build its reader struct FROM THE REGISTRY alone. */
  def sparkTypeOf(s: Schema): DataType = {
    import scala.jdk.CollectionConverters._
    s.getType match {
      case Schema.Type.UNION =>
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL)
          .map(sparkTypeOf).getOrElse(NullType)
      case Schema.Type.INT =>
        if (s.getLogicalType != null && s.getLogicalType.getName == "date")
          DateType
        else IntegerType
      case Schema.Type.LONG =>
        if (s.getLogicalType != null &&
            s.getLogicalType.getName == "timestamp-micros") TimestampType
        else LongType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.STRING => StringType
      case Schema.Type.BYTES => s.getLogicalType match {
        case d: org.apache.avro.LogicalTypes.Decimal =>
          DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
      case Schema.Type.ARRAY => ArrayType(sparkTypeOf(s.getElementType))
      case other => sys.error(s"unsupported avro reader type: $other")
    }
  }

  /** Registry-learned READER shape for one table: the latest value
    * schema under the subject, minus the `_tidb_*` extension meta
    * fields (the consumer's schema round trip, avro/decoder.go:680 —
    * schemas come from the endpoint, never out-of-band). */
  def readerFromRegistry(registryUri: String, topic: String,
                         schema: String, table: String): StructType = {
    import scala.jdk.CollectionConverters._
    val store = registryFor(registryUri)
    val subject = valueSubject(topic, schema, table)
    require(store.versions(subject).nonEmpty,
      s"no registered value schema under $subject")
    // versions/latest — the answer that carries the GLOBAL schema id
    // with the schema (version numbers are NOT ids on a real registry)
    val parsed = new Schema.Parser().parse(store.latest(subject)._2)
    StructType(parsed.getFields.asScala
      .filterNot(_.name.startsWith("_tidb_"))
      .map(f => StructField(f.name, sparkTypeOf(f.schema()))).toSeq)
  }

  /** Handle-key columns of one table, from its registered KEY schema
    * — the apply key a consumer learns from the registry alone. */
  def keysFromRegistry(registryUri: String, topic: String,
                       schema: String, table: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val store = registryFor(registryUri)
    val subject = keySubject(topic, schema, table)
    require(store.versions(subject).nonEmpty,
      s"no registered key schema under $subject")
    new Schema.Parser().parse(store.latest(subject)._2)
      .getFields.asScala.map(_.name).toSeq
  }

  /** Control events of an avro feed: Left(ddl (query, actionType,
    * schema, table, commitTs)) / Right(checkpoint ts). The
    * control-frame predicate runs IN SPARK — the `{"k":` frame prefix
    * and the value's first decoded byte (0x01 DDL / 0x02 checkpoint)
    * are cheap column tests — so only the control-plane-sized
    * survivors ever reach the driver; row events (magic-0 / glue
    * header-3 first byte) filter out distributed, never collect. */
  def controlEvents(msgs: DataFrame)
      : Seq[Either[(String, Int, String, String, Long), Long]] =
    controlFrames(msgs).collect().toSeq.flatMap { r =>
      AvroRegistry.decodeControlEvent(OpenBatch.parseFrame(r.getString(0))._2)
    }

  /** The Spark-side control-frame predicate of [[controlEvents]],
    * exposed so specs can pin that row events are dropped BEFORE any
    * driver materialization. */
  def controlFrames(msgs: DataFrame): DataFrame = {
    val firstByte =
      substring(unbase64(get_json_object(col("_value"), "$.v")), 1, 1)
    msgs.select(col("_value")).filter(
      col("_value").startsWith("{\"k\":") &&
        (firstByte === lit(Array(AvroRegistry.DdlByte)) ||
          firstByte === lit(Array(AvroRegistry.CheckpointByte))))
  }
}
