package graft.functions

import scala.jdk.CollectionConverters._
import org.apache.avro.generic.GenericRecord
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Simple protocol with `encoding-format = avro` as a STREAMING wire
  * (reference pkg/config/sink.go:456 `encoding-format`; the
  * kafka_simple_basic_avro / kafka_simple_handle_key_only_avro
  * scenarios): every message class of the simple protocol — DML rows,
  * WATERMARK checkpoints, BOOTSTRAP handshakes — ships as Avro under
  * the official `com.pingcap.simple.avro` union schema
  * ([[SimpleAvro]], fingerprint-pinned to the reference's
  * message.json) instead of JSON. No registry rides this wire: the
  * schema is FIXED by the protocol (marshaller.go:102-150 encodes
  * against the compiled schema), so a consumer needs only the spec's
  * own schema file; per-table column shape travels inside the
  * BOOTSTRAP handshake like the JSON form.
  *
  * Transport: the binary message wraps into the `{"k":b64,"v":b64}`
  * string frame ([[OpenBatch.frameJson]], empty key) on the parquet
  * FileMq stand-in — exactly like the avro-protocol and open-batch
  * binary wires.
  *
  * Value model per column type (encodeValue4Avro,
  * simple/message.go:377-430): integers ride long, float32 float,
  * float64 double, strings string, binary bytes, decimals their
  * plain-string rendering, timestamps the Timestamp record. The data
  * map keys are the COLUMN NAMES (no sanitization — avro map keys are
  * free-form strings, unlike record field names).
  *
  * Scale: one mapPartitions over the routed envelope; encode work is
  * row-local, no driver state in the closure.
  */
object SimpleAvroWire {

  import SimpleAvro.Val

  private def toVal(v: Any): Val = v match {
    case null => Val.Null
    case x: Long => Val.L(x)
    case x: Int => Val.L(x.toLong)
    case x: Short => Val.L(x.toLong)
    case x: Byte => Val.L(x.toLong)
    case x: Boolean => Val.L(if (x) 1L else 0L)
    case x: Float => Val.F(x)
    case x: Double => Val.D(x)
    case x: String => Val.S(x)
    case x: Array[Byte] => Val.B(x)
    case x: java.math.BigDecimal => Val.S(x.toPlainString)
    case x: java.sql.Timestamp => Val.Ts("UTC", x.toString)
    case other => Val.S(String.valueOf(other))
  }

  private def fromAvro(v: AnyRef, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (x: java.lang.Long, LongType) => x.longValue()
    case (x: java.lang.Long, IntegerType) => x.intValue()
    case (x: java.lang.Long, BooleanType) => x.longValue() != 0L
    case (x: java.lang.Double, DoubleType) => x.doubleValue()
    case (x: java.lang.Float, FloatType) => x.floatValue()
    case (x: java.lang.Float, DoubleType) => x.floatValue().toDouble
    case (x: java.nio.ByteBuffer, BinaryType) =>
      val b = new Array[Byte](x.remaining()); x.duplicate().get(b); b
    case (rec: GenericRecord, _) if rec.getSchema.getName == "UnsignedBigint" =>
      rec.get("value")
    case (rec: GenericRecord, rdt) if rec.getSchema.getName == "Timestamp" =>
      // the reader dtype decides the carrier: a wire-learned reader
      // (bootstrapSchemas maps time types to VARCHAR → StringType)
      // must receive the RENDERED string, not a Timestamp object in a
      // StringType slot (the Row encoder rejects that at runtime)
      val rendered = String.valueOf(rec.get("value"))
      rdt match {
        case TimestampType => java.sql.Timestamp.valueOf(rendered)
        case DateType => java.sql.Date.valueOf(rendered.take(10))
        case _ => rendered
      }
    case (x, DateType) => java.sql.Date.valueOf(String.valueOf(x).take(10))
    case (x, StringType) => String.valueOf(x)
    case (x, d: DecimalType) => new java.math.BigDecimal(String.valueOf(x))
    case (x, _) => x
  }

  private val outSchema = StructType(Seq(
    StructField("_schema", StringType),
    StructField("_table", StringType),
    StructField("_partition", LongType),
    StructField("_commit_ts", LongType),
    StructField("_value", StringType)))

  /** Envelope → one framed simple-avro DML message per row event
    * (avro.go:250-341 newDMLMessageMap: INSERT carries `data`, DELETE
    * carries `old`, UPDATE both). `enableRowChecksum` rides the
    * e2e CRC32 block exactly like the JSON form (avro.go:276
    * EnableRowChecksum; current/previous over the images' values in
    * column order, 0 = image absent — the SAME fold as
    * [[RowChecksum]], so the two wire forms carry identical sums). */
  def encodeFeed(env: DataFrame, schemaVersion: Long = 0L,
                 enableRowChecksum: Boolean = false): DataFrame = {
    val payload = env.schema.fields.find(_.name == "after").get
      .dataType.asInstanceOf[StructType]
    val names = payload.fieldNames.toSeq
    val withPart =
      if (env.columns.contains("_partition")) env
      else env.withColumn("_partition", lit(0L))
    val version = schemaVersion
    val withChecksum = enableRowChecksum
    withPart.select(col("_schema"), col("_table"),
        col("_partition").cast("long"), col("_commit_ts"), col("_op"),
        col("before"), col("after"))
      .mapPartitions { rows =>
        rows.map { r =>
          def vals(i: Int): Seq[Val] =
            if (r.isNullAt(i)) Nil
            else {
              val s = r.getStruct(i)
              names.indices.map(j => toVal(s.get(j)))
            }
          def m(i: Int): Map[String, Val] =
            if (r.isNullAt(i)) Map.empty
            else names.zip(vals(i)).toMap
          val op = r.getString(4) match {
            case "I" => "INSERT"; case "D" => "DELETE"; case _ => "UPDATE"
          }
          val ts = r.getLong(3)
          val checksum =
            if (!withChecksum) None
            else Some((1, false,
              SimpleAvro.checksumOf(vals(6)), SimpleAvro.checksumOf(vals(5))))
          val bytes = SimpleAvro.encodeDml(op, r.getString(0), r.getString(1),
            tableId = 0L, commitTs = ts, buildTs = ts / 1000000L,
            schemaVersion = version,
            data = if (op == "DELETE") Map.empty else m(6),
            old = if (op == "INSERT") Map.empty else m(5),
            checksum = checksum)
          Row(r.getString(0), r.getString(1), r.getLong(2), ts,
            OpenBatch.frameJson(Array.emptyByteArray, bytes))
        }
      }(Encoders.row(outSchema))
  }

  /** Consumer-side e2e checksum verification for the avro wire
    * (VerifyChecksum, verify_checksum.go:34-86): recompute each
    * carried block from the decoded wire values in the table's COLUMN
    * ORDER (`columnsOf`, wire-learned from the handshake) and count
    * mismatches. Frames without a block (or unknown tables) skip —
    * a carried 0 means "image absent". */
  def countCorrupted(msgs: DataFrame,
                     columnsOf: Map[(String, String), Seq[String]]): Long = {
    val cols = columnsOf
    msgs.select(col("_value")).mapPartitions { rows =>
      var bad = 0L
      rows.foreach { r =>
        val v = r.getString(0)
        if (v.startsWith("{\"k\":")) {
          val msg = SimpleAvro.decode(OpenBatch.parseFrame(v)._2)
          if (String.valueOf(msg.get("type")) == "DML") {
            val p = msg.get("payload").asInstanceOf[GenericRecord]
            val blk = p.get("checksum").asInstanceOf[GenericRecord]
            val names = cols.get((String.valueOf(p.get("database")),
              String.valueOf(p.get("table"))))
            if (blk != null && names.isDefined) {
              def recompute(field: String): Long =
                Option(p.get(field).asInstanceOf[java.util.Map[AnyRef, AnyRef]])
                  .map { jm =>
                    val byName = jm.asScala.map { case (k, x) =>
                      String.valueOf(k) -> x }.toMap
                    SimpleAvro.checksumOf(names.get.map(n =>
                      avroToVal(byName.getOrElse(n, null))))
                  }.getOrElse(0L)
              val curOk = blk.get("current").asInstanceOf[java.lang.Long] ==
                recompute("data")
              val prevOk = blk.get("previous").asInstanceOf[java.lang.Long] ==
                recompute("old")
              if (!(curOk && prevOk)) bad += 1
            }
          }
        }
      }
      Iterator.single(bad)
    }(Encoders.scalaLong).reduce(_ + _)
  }

  /** One emitted DDL as the official DDL message class
    * (newDDLMessage, simple/message.go:295-318; type taxonomy
    * getDDLType :74-97 — shared with the JSON form's `ddlWireType`):
    * tableSchema stays absent like the JSON arm — the
    * version-triggered BOOTSTRAP handshake carries the live shape
    * separately. */
  def ddlFrame(query: String, commitTs: Long): String = {
    val tpe = graft.operators.Filters.ddlClassValue(query) match {
      case "create table" => "CREATE"
      case "rename table" => "RENAME"
      case "create index" => "CINDEX"
      case "drop index" => "DINDEX"
      case "drop table" => "ERASE"
      case "truncate table" => "TRUNCATE"
      case "add column" | "drop column" | "modify column" |
           "change column" | "alter partition" | "alter table" |
           "recover table" => "ALTER"
      case _ => "QUERY"
    }
    OpenBatch.frameJson(Array.emptyByteArray,
      SimpleAvro.encodeDdl(tpe, query, commitTs, commitTs / 1000000L,
        schema = None))
  }

  /** Wire DDLs of a simple-avro feed ((commitTs, query)) in commit-ts
    * order — the consumer half; the 0x16 0x04 two-byte predicate
    * (Message union index + DDL enum) keeps the collect
    * control-plane-sized like [[bootstrapFrames]]. */
  def wireDdls(msgs: DataFrame): Seq[(Long, String)] = {
    val firstTwo =
      substring(unbase64(get_json_object(col("_value"), "$.v")), 1, 2)
    msgs.select(col("_value"))
      .filter(col("_value").startsWith("{\"k\":") &&
        firstTwo === lit(Array[Byte](22, 4)))
      .collect().toSeq.map { r =>
        val p = SimpleAvro.decode(OpenBatch.parseFrame(r.getString(0))._2)
          .get("payload").asInstanceOf[GenericRecord]
        (p.get("commitTs").asInstanceOf[java.lang.Long].longValue(),
          String.valueOf(p.get("sql")))
      }.sortBy(_._1)
  }

  /** Consumer decode: framed simple-avro messages back to the envelope
    * (`reader` is the payload shape — wire-learned from the BOOTSTRAP
    * handshake via [[bootstrapSchemas]], the
    * kafka_simple_basic_avro consumer's flow). Non-DML message classes
    * (WATERMARK, BOOTSTRAP, DDL) drop — [[graft.MqConsume]] surfaces
    * them separately. */
  def decodeFeed(msgs: DataFrame, reader: StructType): DataFrame = {
    val out = StructType(Seq(
      StructField("_schema", StringType), StructField("_table", StringType),
      StructField("_op", StringType), StructField("_commit_ts", LongType),
      StructField("before", reader), StructField("after", reader)))
    val fields = reader.fields.toSeq
    msgs.select(col("_value")).mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = OpenBatch.parseFrame(r.getString(0))._2
        val msg = SimpleAvro.decode(bytes)
        if (String.valueOf(msg.get("type")) != "DML") None
        else {
          val p = msg.get("payload").asInstanceOf[GenericRecord]
          def img(field: String): Row =
            Option(p.get(field).asInstanceOf[java.util.Map[AnyRef, AnyRef]])
              .filter(!_.isEmpty)
              .map { jm =>
                val vals = jm.asScala.map { case (k, v) =>
                  String.valueOf(k) -> v }.toMap
                Row.fromSeq(fields.map(f =>
                  fromAvro(vals.getOrElse(f.name, null), f.dataType)))
              }.orNull
          val op = String.valueOf(p.get("type")) match {
            case "INSERT" => "I"; case "DELETE" => "D"; case _ => "U"
          }
          Some(Row(String.valueOf(p.get("database")),
            String.valueOf(p.get("table")), op,
            p.get("commitTs").asInstanceOf[java.lang.Long].longValue(),
            img("old"), img("data")))
        }
      }
    }(Encoders.row(out))
  }

  private def avroToVal(v: AnyRef): Val = v match {
    case null => Val.Null
    case x: java.lang.Long => Val.L(x.longValue())
    case x: java.lang.Float => Val.F(x.floatValue())
    case x: java.lang.Double => Val.D(x.doubleValue())
    case x: org.apache.avro.util.Utf8 => Val.S(x.toString)
    case x: String => Val.S(x)
    case x: java.nio.ByteBuffer =>
      val b = new Array[Byte](x.remaining()); x.duplicate().get(b); Val.B(b)
    case r: GenericRecord if r.getSchema.getName == "UnsignedBigint" =>
      Val.UBig(r.get("value").asInstanceOf[java.lang.Long].longValue())
    case r: GenericRecord if r.getSchema.getName == "Timestamp" =>
      Val.Ts(String.valueOf(r.get("location")), String.valueOf(r.get("value")))
    case other => Val.S(String.valueOf(other))
  }

  /** Deterministic claim-check object location for one frame —
    * content-addressed (md5 of the frame) so the store pass and the
    * pointer pass agree without coordination. */
  def claimLocationOf(uriPrefix: String, db: String, table: String,
                      frame: String): String = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(frame.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    s"$uriPrefix/$db/$table/avro-$md5.json"
  }

  /** Oversize re-marshal of one framed simple-avro message
    * (kafka_simple_handle_key_only_avro; claim-check form with
    * `claimUri` set — simple/decoder.go:194 reads it back): decode the
    * DML, trim both images to the handle keys, re-encode with
    * `handleKeyOnly = true` (+ the pointer location). Non-DML frames
    * pass through untouched. */
  def oversizeReencode(frame: String, handleKeys: Seq[String],
                       claimUri: Option[String]): String = {
    val bytes = OpenBatch.parseFrame(frame)._2
    val msg = SimpleAvro.decode(bytes)
    if (String.valueOf(msg.get("type")) != "DML") frame
    else {
      val p = msg.get("payload").asInstanceOf[GenericRecord]
      def trim(name: String): Map[String, Val] =
        Option(p.get(name).asInstanceOf[java.util.Map[AnyRef, AnyRef]])
          .map(_.asScala.collect {
            case (k, v) if handleKeys.contains(String.valueOf(k)) =>
              String.valueOf(k) -> avroToVal(v)
          }.toMap).getOrElse(Map.empty)
      val op = String.valueOf(p.get("type"))
      val db = String.valueOf(p.get("database"))
      val tb = String.valueOf(p.get("table"))
      // the pointer forms KEEP the original e2e checksum block
      // (simple/encoder.go keeps it on handle-key-only messages) — a
      // consumer that fetches the claim object can still verify, and
      // countCorrupted no longer silently skips these rows
      val cks = Option(p.get("checksum").asInstanceOf[GenericRecord]).map { c =>
        (c.get("version").asInstanceOf[java.lang.Integer].intValue(),
          c.get("corrupted").asInstanceOf[java.lang.Boolean].booleanValue(),
          c.get("current").asInstanceOf[java.lang.Long].longValue(),
          c.get("previous").asInstanceOf[java.lang.Long].longValue())
      }
      val out = SimpleAvro.encodeDml(op, db, tb,
        p.get("tableID").asInstanceOf[java.lang.Long].longValue(),
        p.get("commitTs").asInstanceOf[java.lang.Long].longValue(),
        p.get("buildTs").asInstanceOf[java.lang.Long].longValue(),
        p.get("schemaVersion").asInstanceOf[java.lang.Long].longValue(),
        data = if (op == "DELETE") Map.empty else trim("data"),
        old = if (op == "INSERT") Map.empty else trim("old"),
        handleKeyOnly = true,
        claimCheckLocation = claimUri.map(u => claimLocationOf(u, db, tb, frame)),
        checksum = cks)
      OpenBatch.frameJson(Array.emptyByteArray, out)
    }
  }

  /** (db, table, message bytes) of one frame when it is a DML — the
    * claim-check store pass's view. */
  def dmlOf(frame: String): Option[(String, String, Array[Byte])] = {
    val bytes = OpenBatch.parseFrame(frame)._2
    val msg = SimpleAvro.decode(bytes)
    if (String.valueOf(msg.get("type")) != "DML") None
    else {
      val p = msg.get("payload").asInstanceOf[GenericRecord]
      Some((String.valueOf(p.get("database")),
        String.valueOf(p.get("table")), bytes))
    }
  }

  /** WATERMARK checkpoint frame (MarshalCheckpoint,
    * marshaller.go:116). */
  def watermarkFrame(resolvedTs: Long): String =
    OpenBatch.frameJson(Array.emptyByteArray,
      SimpleAvro.encodeWatermark(resolvedTs, resolvedTs / 1000000L))

  /** BOOTSTRAP handshake frame for the fixture payload — the avro
    * twin of [[Codecs.bootstrapValue]] (same column/index model, the
    * official Bootstrap record instead of JSON). */
  def bootstrapFrame(schema: String, table: String,
                     version: Long = 0L): String = {
    val t = SimpleAvro.TableDef(schema, table, tableId = 0L,
      version = version,
      columns = Seq(
        SimpleAvro.ColumnDef("user_id", "bigint", charset = "binary",
          collate = "binary", length = 20L, nullable = false),
        SimpleAvro.ColumnDef("value", "double", charset = "binary",
          collate = "binary", length = 22L),
        SimpleAvro.ColumnDef("k", "bigint", charset = "binary",
          collate = "binary", length = 20L)),
      indexes = Seq(SimpleAvro.IndexDef("primary", unique = true,
        primary = true, nullable = false, columns = Seq("user_id"))))
    OpenBatch.frameJson(Array.emptyByteArray,
      SimpleAvro.encodeBootstrap(t, buildTs = 0L))
  }

  /** BOOTSTRAP handshake rendered from the LIVE evolving schema store
    * — the avro twin of [[Codecs.bootstrapValueFromStore]] (the
    * reference builds the handshake's TableSchema from the CURRENT
    * TableInfo, simple/message.go:65-72): columns, declared pk, table
    * id and registry version all come from the store, so a consumer
    * joining after a mid-stream DDL learns the post-DDL shape from the
    * avro wire alone. Unknown tables fall back to the fixture frame. */
  def bootstrapFrameFromStore(store: graft.model.SchemaStore,
                              schema: String, table: String): String =
    store.registry.latest(schema, table) match {
      case None => bootstrapFrame(schema, table)
      case Some(sch) =>
        val tableId = store.membership.get((schema, table))
          .flatMap(_.lastOption.map(_._2._1)).getOrElse(0L)
        val pks = if (sch.pks.nonEmpty) sch.pks else Seq(sch.columns.head.name)
        val cols = sch.columns.map { c =>
          val (mt, len) = Codecs.mysqlTypeOf(c.dataType)
          SimpleAvro.ColumnDef(c.name, mt, charset = "binary",
            collate = "binary", length = len.toLong,
            nullable = !pks.contains(c.name), default = c.default)
        }
        val t = SimpleAvro.TableDef(schema, table, tableId, sch.versionTs,
          cols, Seq(SimpleAvro.IndexDef("primary", unique = true,
            primary = true, nullable = false, columns = pks)))
        OpenBatch.frameJson(Array.emptyByteArray,
          SimpleAvro.encodeBootstrap(t, buildTs = 0L))
    }

  /** The Spark-side BOOTSTRAP-frame predicate: a handshake's binary
    * opens with the Message union index (11 → zigzag 0x16) followed by
    * the MessageType enum (BOOTSTRAP = 1 → zigzag 0x02) — a two-byte
    * column test, so on a full feed only the control-plane-sized
    * handshakes ever reach the driver (row DMLs carry 0x16 0x06 and
    * drop distributed). */
  def bootstrapFrames(msgs: DataFrame): DataFrame = {
    val firstTwo =
      substring(unbase64(get_json_object(col("_value"), "$.v")), 1, 2)
    msgs.select(col("_value")).filter(
      col("_value").startsWith("{\"k\":") &&
        firstTwo === lit(Array[Byte](22, 2)))
  }

  /** Wire-learned apply schema from the avro BOOTSTRAP handshakes —
    * ((schema, table) → (columns as (name, sql type), pk columns)),
    * the avro twin of [[graft.MqConsume.bootstrapSchemas]] (same
    * mysqlType→SQL mapping, keeps each table's highest-version
    * handshake). Control-plane sized: only handshake frames collect
    * ([[bootstrapFrames]]' two-byte predicate runs in Spark). */
  def bootstrapSchemas(msgs: DataFrame)
      : Map[(String, String), (Seq[(String, String)], Seq[String])] = {
    def sqlOf(mysql: String): String = mysql match {
      case "bigint" => "BIGINT"
      case "int" | "mediumint" => "INTEGER"
      case "smallint" | "tinyint" => "SMALLINT"
      case "double" | "float" | "decimal" => "DECIMAL(18,2)"
      case _ => "VARCHAR(255)"
    }
    bootstrapRaw(msgs).map { case (k, (cols, pk)) =>
      k -> (cols.map { case (n, mt) => n -> sqlOf(mt) }, pk)
    }
  }

  /** Wire-learned READER structs from the handshakes — mysqlType →
    * the Spark type this wire's DML values decode to (encodeValue4Avro
    * value model: integer family → long, float/double → double,
    * decimals ride plain strings, time types rendered strings). The
    * decode-side twin of [[bootstrapSchemas]]' apply DDL. */
  def bootstrapReaders(msgs: DataFrame): Map[(String, String), StructType] = {
    def sparkOf(mysql: String): DataType = mysql match {
      case "bigint" | "int" | "mediumint" | "smallint" | "tinyint" => LongType
      case "double" | "float" => DoubleType
      case _ => StringType
    }
    bootstrapRaw(msgs).map { case (k, (cols, _)) =>
      k -> StructType(cols.map { case (n, mt) => StructField(n, sparkOf(mt)) })
    }
  }

  /** Handshake decode shared by [[bootstrapSchemas]] /
    * [[bootstrapReaders]]: (schema, table) → (columns as (name,
    * mysqlType), pk), highest-version handshake wins. */
  private def bootstrapRaw(msgs: DataFrame)
      : Map[(String, String), (Seq[(String, String)], Seq[String])] = {
    bootstrapFrames(msgs)
      .collect().iterator.flatMap { r =>
        try {
          val msg = SimpleAvro.decode(OpenBatch.parseFrame(r.getString(0))._2)
          if (String.valueOf(msg.get("type")) != "BOOTSTRAP") None
          else {
            val p = msg.get("payload").asInstanceOf[GenericRecord]
            val ts = p.get("tableSchema").asInstanceOf[GenericRecord]
            val cols = ts.get("columns")
              .asInstanceOf[java.util.List[AnyRef]].asScala.map { c =>
                val cr = c.asInstanceOf[GenericRecord]
                val mysql = String.valueOf(
                  cr.get("dataType").asInstanceOf[GenericRecord].get("mysqlType"))
                String.valueOf(cr.get("name")) -> mysql
              }.toSeq
            val pk = ts.get("indexes")
              .asInstanceOf[java.util.List[AnyRef]].asScala
              .map(_.asInstanceOf[GenericRecord])
              .find(_.get("primary") == java.lang.Boolean.TRUE)
              .map(_.get("columns").asInstanceOf[java.util.List[AnyRef]]
                .asScala.map(String.valueOf(_)).toSeq)
              .getOrElse(Seq.empty)
            val version = ts.get("version").asInstanceOf[java.lang.Long].longValue()
            Some((String.valueOf(ts.get("database")),
              String.valueOf(ts.get("table"))) -> (version, (cols, pk)))
          }
        } catch { case _: Exception => None }
      }.toSeq.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1)._2 }
  }
}
