package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-over-Avro as a STREAMING changefeed wire — the
  * `protocol = debezium, encoding-format = avro` arm (reference
  * pkg/sink/codec/debezium/avro.go:1-1077; the debezium_avro
  * scenario). SCHEMA-DRIVEN, unlike the fixture-payload
  * [[DebeziumAvroCodec]]: the Envelope's Value record derives from
  * the feed's payload StructType, so any table shape rides the wire.
  *
  * Reference semantics carried over:
  *  - key message = handle-key record, value message = the Debezium
  *    envelope before/after/source/op/ts_ms, both Confluent-framed
  *    under subjects `{topic}-key` / `{topic}-value` (avro.go:232,273
  *    — the per-table Kafka topic embeds the table, so here the
  *    subject root is `{feed}-{schema}.{table}`);
  *  - op mapping I→c / U→u / D→d; insert has before = null, delete
  *    ships its BEFORE image with after = null (avro.go:238-241 — a
  *    debezium delete is a real envelope, NOT the avro-protocol
  *    key-only tombstone);
  *  - registration on first sight of a (schema, table) inside the
  *    encode task (content-addressed ids keep executors consistent);
  *    the registry resolves by URI inside the task — no driver state
  *    in closures;
  *  - `ts_ms` derives from the commit ts (engine-determinism rule;
  *    the reference stamps the wall clock, avro.go:291).
  *
  * DDL rides the debezium JSON schema-change event exactly as the
  * JSON-format feed emits it ([[Codecs.ddlMessageFor]] — the
  * reference's schema-change topic is JSON in both formats). */
object DebeziumAvroWire {

  import AvroWire.sanitize

  private def sourceFieldsJson: String =
    """{"name":"version","type":"string"},
      |{"name":"connector","type":"string"},
      |{"name":"name","type":"string"},
      |{"name":"ts_ms","type":"long"},
      |{"name":"db","type":"string"},
      |{"name":"table","type":"string"},
      |{"name":"commit_ts","type":"long"},
      |{"name":"cluster_id","type":"string"}""".stripMargin

  /** Envelope value schema for one table shape: Value record from the
    * payload fields (nullable unions with defaults), per-table
    * namespace so the writer fullname identifies the table. */
  def valueSchemaJson(payload: Seq[StructField], schema: String,
                      table: String): String = {
    AvroWire.checkSanitizeCollisions(payload, schema, table)
    val cols = payload.map(f =>
      s"""{"name":"${sanitize(f.name)}","type":["null",${AvroCodec.avroTypeFor(f.dataType)}],"default":null}""")
      .mkString(",")
    s"""{"type":"record","name":"Envelope","namespace":"graft.debezium.${sanitize(schema)}.${sanitize(table)}","fields":[""" +
      s"""{"name":"before","type":["null",{"type":"record","name":"Value","fields":[$cols]}],"default":null},""" +
      """{"name":"after","type":["null","Value"],"default":null},""" +
      s"""{"name":"source","type":{"type":"record","name":"Source","fields":[$sourceFieldsJson]}},""" +
      """{"name":"op","type":"string"},{"name":"ts_ms","type":"long"}]}"""
  }

  /** Key record: the handle-key columns (avro.go:232 — non-null, a
    * handle key is never null upstream). */
  def keySchemaJson(keys: Seq[StructField], schema: String,
                    table: String): String = {
    AvroWire.checkSanitizeCollisions(keys, schema, table)
    keys.map(f =>
      s"""{"name":"${sanitize(f.name)}","type":${AvroCodec.avroTypeFor(f.dataType)}}""")
      .mkString(
        s"""{"type":"record","name":"Key","namespace":"graft.debezium.${sanitize(schema)}.${sanitize(table)}","fields":[""",
        ",", "]}")
  }

  // one subject-naming convention for every registry-framed wire
  // (AvroWire owns it — per-table topic root suffixed -key/-value)
  def keySubject(topic: String, schema: String, table: String): String =
    AvroWire.keySubject(topic, schema, table)
  def valueSubject(topic: String, schema: String, table: String): String =
    AvroWire.valueSubject(topic, schema, table)

  private val outSchema = StructType(Seq(
    StructField("_schema", StringType),
    StructField("_table", StringType),
    StructField("_partition", LongType),
    StructField("_commit_ts", LongType),
    StructField("_value", StringType)))

  /** Envelope → per-row `{"k":b64,"v":b64}` frames of Confluent-framed
    * debezium key/value records. One payload shape per call (the
    * struct path's invariant). */
  def encodeFeed(env: DataFrame, handleKeys: Seq[String],
                 registryUri: String, topic: String,
                 clusterId: String = "graft-cluster"): DataFrame = {
    require(registryUri.nonEmpty,
      "debezium encoding-format=avro requires a schema-registry uri")
    val payload = env.schema.fields.find(_.name == "after").get
      .dataType.asInstanceOf[StructType]
    val fieldTypes = payload.fields.map(f => f.name -> f.dataType).toSeq
    val keyIdx = payload.fields.zipWithIndex
      .filter { case (f, _) => handleKeys.contains(f.name) }
      .map { case (f, i) => (f.name, f.dataType, i) }.toSeq
    require(keyIdx.nonEmpty, s"debezium-avro key needs handle keys " +
      s"$handleKeys present in the payload ${payload.fieldNames.mkString(",")}")
    val withPart =
      if (env.columns.contains("_partition")) env
      else env.withColumn("_partition", lit(0L))
    val cluster = clusterId
    withPart.select(col("_schema"), col("_table"),
        col("_partition").cast("long"), col("_commit_ts"), col("_op"),
        col("before"), col("after"))
      .mapPartitions { rows =>
        val store = AvroWire.registryFor(registryUri)
        // per-(schema, table) cache carries the IMAGE and SOURCE
        // sub-schemas too — constant per entry, never re-resolved
        // per row (the avro hot-path rule)
        val cache = scala.collection.mutable.Map.empty[(String, String),
          (Int, Schema, GenericDatumWriter[GenericRecord],
           Int, Schema, GenericDatumWriter[GenericRecord], Schema, Schema)]
        val buf = new java.io.ByteArrayOutputStream(256)
        var enc: org.apache.avro.io.BinaryEncoder = null
        def write(w: GenericDatumWriter[GenericRecord], rec: GenericRecord): Array[Byte] = {
          buf.reset()
          enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(buf, enc)
          w.write(rec, enc); enc.flush()
          buf.toByteArray
        }
        rows.map { r =>
          val (s, t) = (r.getString(0), r.getString(1))
          val (kid, kSchema, kWriter, vid, vSchema, vWriter,
               imgSchema, srcSchema) =
            cache.getOrElseUpdate((s, t), {
              val kJson = keySchemaJson(
                keyIdx.map(k => StructField(k._1, k._2)), s, t)
              val vJson = valueSchemaJson(payload.fields.toSeq, s, t)
              val ki = store.register(keySubject(topic, s, t), kJson)
              val vi = store.register(valueSubject(topic, s, t), vJson)
              val ks = new Schema.Parser().parse(kJson)
              val vs = new Schema.Parser().parse(vJson)
              (ki, ks, new GenericDatumWriter[GenericRecord](ks),
                vi, vs, new GenericDatumWriter[GenericRecord](vs),
                vs.getField("before").schema().getTypes.get(1),
                vs.getField("source").schema())
            })
          def img(i: Int): GenericRecord =
            if (r.isNullAt(i)) null
            else {
              val st = r.getStruct(i)
              val rec = new GenericData.Record(imgSchema)
              fieldTypes.zipWithIndex.foreach { case ((n, dt), j) =>
                rec.put(sanitize(n), if (st.isNullAt(j)) null
                  else AvroCodec.toAvroValue(st.get(j), dt))
              }
              rec
            }
          val op = r.getString(4) match {
            case "I" => "c"; case "D" => "d"; case _ => "u"
          }
          val commitTs = r.getLong(3)
          val tsMs = commitTs / 1000000L
          val before = if (op == "c") null else img(5)
          val after = if (op == "d") null else img(6)
          val keyImg = if (op == "d") before else after
          // the key schema is intentionally non-nullable — fail with
          // the offending table/op instead of an opaque datum-writer
          // NPE deep inside the task
          require(keyImg != null,
            s"debezium-avro $op event on $s.$t has no key-side image " +
              "(delete needs `before`, insert/update need `after`)")
          val kRec = new GenericData.Record(kSchema)
          keyIdx.foreach { case (n, dt, i) =>
            kRec.put(sanitize(n),
              if (keyImg == null) null
              else Option(keyImg.get(sanitize(n))).orNull)
          }
          val src = new GenericData.Record(srcSchema)
          src.put("version", DebeziumAvroCodec.SourceVersion)
          src.put("connector", DebeziumAvroCodec.SourceConnector)
          src.put("name", cluster)
          src.put("ts_ms", tsMs)
          src.put("db", s); src.put("table", t)
          src.put("commit_ts", commitTs)
          src.put("cluster_id", cluster)
          val rec = new GenericData.Record(vSchema)
          rec.put("before", before); rec.put("after", after)
          rec.put("source", src); rec.put("op", op); rec.put("ts_ms", tsMs)
          Row(s, t, r.getLong(2), commitTs,
            OpenBatch.frameJson(AvroRegistry.frame(kid, write(kWriter, kRec)),
              AvroRegistry.frame(vid, write(vWriter, rec))))
        }
      }(Encoders.row(outSchema))
  }

  /** Consumer decode by registry id: unframe value, resolve the
    * WRITER schema through the store, read the envelope, emit the
    * normalized row frame ((db, table) from the source block — the
    * avro_decoder flow). `reader` is the payload shape. */
  def decodeFeed(msgs: DataFrame, registryUri: String,
                 reader: StructType): DataFrame = {
    val out = StructType(Seq(
      StructField("_schema", StringType), StructField("_table", StringType),
      StructField("_op", StringType), StructField("_commit_ts", LongType),
      StructField("before", reader), StructField("after", reader)))
    val fields = reader.fields.toSeq
    msgs.select(col("_value")).mapPartitions { rows =>
      val store = AvroWire.registryFor(registryUri)
      val readers = scala.collection.mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
      var dec: org.apache.avro.io.BinaryDecoder = null
      def read(bytes: Array[Byte]): GenericRecord = {
        val (id, payload) = AvroRegistry.unframe(bytes)
        val rdr = readers.getOrElseUpdate(id, {
          val writer = new Schema.Parser().parse(store.byId(id))
          new GenericDatumReader[GenericRecord](writer)
        })
        dec = org.apache.avro.io.DecoderFactory.get().binaryDecoder(payload, dec)
        rdr.read(null, dec)
      }
      rows.map { r =>
        val (_, v) = OpenBatch.parseFrame(r.getString(0))
        val rec = read(v)
        val src = rec.get("source").asInstanceOf[GenericRecord]
        def img(name: String): Row =
          Option(rec.get(name).asInstanceOf[GenericRecord]).map { i =>
            // reader fields absent from this WRITER era (pre-DDL rows
            // lack later columns) read as null — probe the field,
            // GenericData.Record.get(String) THROWS on unknown names
            Row.fromSeq(fields.map { f =>
              val fld = i.getSchema.getField(sanitize(f.name))
              if (fld == null) null
              else AvroCodec.fromAvroValue(
                i.get(fld.pos()).asInstanceOf[AnyRef], f.dataType)
            })
          }.orNull
        val op = rec.get("op").toString match {
          case "c" => "I"; case "d" => "D"; case _ => "U"
        }
        Row(src.get("db").toString, src.get("table").toString, op,
          src.get("commit_ts").asInstanceOf[java.lang.Long].longValue(),
          img("before"), img("after"))
      }
    }(Encoders.row(out))
  }
}
