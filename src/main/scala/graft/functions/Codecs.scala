package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Wire-protocol encoders (SURVEY §2.7). Each produces a `_value`
  * string column (and `_key` where the protocol has one) from the
  * envelope.
  *
  * JSON is assembled with concat of codegen'd string expressions
  * rather than `to_json`: (a) protocol compatibility pins exact field
  * order and null layout, which `to_json` does not (it omits null
  * fields); (b) the rendering is then engine-portable, so every
  * encoder is oracle-checkable byte-for-byte. All pieces stay inside
  * whole-stage codegen.
  *
  * Payload rendering: longs as bare JSON numbers; doubles through
  * DECIMAL(18,2) (the upstream money scale) so formatting is
  * deterministic; strings JSON-escaped.
  */
object Codecs {

  /** ns → ms epoch (the protocols' timestamp unit). Division runs in
    * the decimal domain: epoch-ns (~1.7e18) exceeds double's exact
    * integer range (2^53), so Spark's long `/` (double division)
    * would be off by ±1ms. */
  private def ms(c: Column): Column =
    (c.cast(DecimalType(38, 0)) / lit(1000000L)).cast("long")

  private def jsonNum(c: Column): Column =
    coalesce(c.cast("string"), lit("null"))

  private def jsonMoney(c: Column): Column =
    coalesce(c.cast(DecimalType(18, 2)).cast("string"), lit("null"))

  /** Payload object for one image (user_id, value, k — the envelope's
    * payload row), or literal null when the image is absent. */
  private def imageJson(img: String): Column =
    when(col(img).isNull, lit("null")).otherwise(concat(
      lit("{\"user_id\":"), jsonNum(col(s"$img.user_id")),
      lit(",\"value\":"), jsonMoney(col(s"$img.value")),
      lit(",\"k\":"), jsonNum(col(s"$img.k")),
      lit("}")))

  /** Canal-JSON envelope (reference
    * pkg/sink/codec/canal/canal_json_encoder.go:444): `type`
    * INSERT/UPDATE/DELETE, `data` = post-image (pre-image for
    * deletes), `old` = pre-image for updates, `es`/`ts` in ms. */
  def canalJson(env: DataFrame): DataFrame = {
    val typ = when(col("_op") === "I", "INSERT")
      .when(col("_op") === "U", "UPDATE").otherwise("DELETE")
    val dataImg = when(col("_op") === "D", imageJson("before"))
      .otherwise(imageJson("after"))
    val oldImg = when(col("_op") === "U", concat(lit("["), imageJson("before"), lit("]")))
      .otherwise(lit("null"))
    env.withColumn("_value", concat(
      lit("{\"id\":0,\"database\":\""), col("_schema"),
      lit("\",\"table\":\""), col("_table"),
      lit("\",\"pkNames\":[\"user_id\"],\"isDdl\":false,\"type\":\""), typ,
      lit("\",\"es\":"), ms(col("_commit_ts")),
      lit(",\"ts\":"), ms(col("_commit_ts")),
      lit(",\"data\":["), dataImg,
      lit("],\"old\":"), oldImg,
      lit("}")))
  }

  /** Open Protocol (pkg/sink/codec/open/encoder.go:77, message layout
    * open/message.go:30-78): separate key (`ts`,`scm`,`tbl`,`t`) and
    * value (`u`/`p`/`d` column maps). */
  def openProtocol(env: DataFrame): DataFrame = {
    val key = concat(
      lit("{\"ts\":"), col("_commit_ts"),
      lit(",\"scm\":\""), col("_schema"),
      lit("\",\"tbl\":\""), col("_table"),
      lit("\",\"t\":1}"))
    val value =
      when(col("_op") === "I", concat(lit("{\"u\":"), imageJson("after"), lit("}")))
        .when(col("_op") === "U", concat(
          lit("{\"u\":"), imageJson("after"),
          lit(",\"p\":"), imageJson("before"), lit("}")))
        .otherwise(concat(lit("{\"d\":"), imageJson("before"), lit("}")))
    env.withColumn("_key", key).withColumn("_value", value)
  }

  /** Debezium-style envelope (pkg/sink/codec/debezium/codec.go):
    * before/after/source/op/ts_ms; op c|u|d. */
  def debeziumJson(env: DataFrame): DataFrame = {
    val op = when(col("_op") === "I", "c")
      .when(col("_op") === "U", "u").otherwise("d")
    env.withColumn("_value", concat(
      lit("{\"before\":"), imageJson("before"),
      lit(",\"after\":"), imageJson("after"),
      lit(",\"source\":{\"db\":\""), col("_schema"),
      lit("\",\"table\":\""), col("_table"),
      lit("\",\"commit_ts\":"), col("_commit_ts"),
      lit("},\"op\":\""), op,
      lit("\",\"ts_ms\":"), ms(col("_commit_ts")),
      lit("}")))
  }

  /** CSV line (pkg/sink/codec/csv/csv_message.go:104-246): meta
    * columns op,schema,table,commitTs then payload; RFC-4180 quoting
    * (quote doubling) on string fields. Deletes render the pre-image
    * (csv has no old/new pair). */
  def csvLine(env: DataFrame): DataFrame = {
    def q(c: Column): Column = concat(
      lit("\""),
      regexp_replace(coalesce(c.cast("string"), lit("\\N")), lit("\""), lit("\"\"")),
      lit("\""))
    val img = when(col("_op") === "D", col("before")).otherwise(col("after"))
    // meta order is op, TABLE, SCHEMA, commitTs — csv_message.go:122-127
    // encodeMeta writes tableName before schemaName
    env.withColumn("_value", concat_ws(",",
      q(when(col("_op") === "I", "I").when(col("_op") === "U", "U").otherwise("D")),
      q(col("_table")), q(col("_schema")),
      col("_commit_ts").cast("string"),
      coalesce(img.getField("user_id").cast("string"), lit("\\N")),
      coalesce(img.getField("value").cast(DecimalType(18, 2)).cast("string"), lit("\\N")),
      coalesce(img.getField("k").cast("string"), lit("\\N"))))
  }

  /** CSV with output-old-value (csv_message.go:104-140): every record
    * gains an is-updated flag after commitTs (`true` for records born
    * from an UPDATE, `false` otherwise — rendered bare per formatValue's
    * %v), and an UPDATE becomes a TWO-record message: the pre-image as
    * "D" then the post-image as "I", newline-terminated records
    * (encodeColumns writes the terminator per record) — the storage
    * sink's update representation (csv_update_old_value scenario). */
  def csvLineOldValue(env: DataFrame): DataFrame = {
    def q(c: Column): Column = concat(
      lit("\""),
      regexp_replace(coalesce(c.cast("string"), lit("\\N")), lit("\""), lit("\"\"")),
      lit("\""))
    def rec(op: String, img: Column, updated: Boolean): Column = concat_ws(",",
      q(lit(op)), q(col("_table")), q(col("_schema")),
      col("_commit_ts").cast("string"), lit(if (updated) "true" else "false"),
      coalesce(img.getField("user_id").cast("string"), lit("\\N")),
      coalesce(img.getField("value").cast(DecimalType(18, 2)).cast("string"), lit("\\N")),
      coalesce(img.getField("k").cast("string"), lit("\\N")))
    val value =
      when(col("_op") === "U",
        concat(rec("D", col("before"), updated = true), lit("\n"),
          rec("I", col("after"), updated = true)))
        .when(col("_op") === "D", rec("D", col("before"), updated = false))
        .otherwise(rec("I", col("after"), updated = false))
    env.withColumn("_value", value)
  }

  /** Canal-JSON TXN variant (canal_json_txn_encoder.go): one message
    * per transaction — the txn's per-row canal messages newline-joined
    * in apply order (DMLOrder, then row id), with the txn identity on
    * the envelope. Ordering is made deterministic by sorting the
    * collected (op_order, row_id, msg) triples, not by collection
    * order. */
  def canalJsonTxn(env: DataFrame): DataFrame = {
    val perRow = canalJson(env)
    val opOrd = graft.model.Envelope.opOrder(col("_op"))
    perRow
      .groupBy(col("_schema"), col("_table"), col("_start_ts"), col("_commit_ts"))
      .agg(
        count(lit(1)).as("n_rows"),
        array_join(
          transform(
            array_sort(collect_list(struct(
              opOrd.as("o"), col("_row_id").as("r"), col("_value").as("v")))),
            e => e.getField("v")),
          "\n").as("_value"))
  }

  /** Simple protocol DML message (pkg/sink/codec/simple/encoder.go:48,
    * message.go): version header + type + full ts + table ref. */
  /** Quoted-string image for the simple protocol's JSON form: the
    * reference's encodeValue (simple/message.go:434-491) renders
    * EVERY scalar as a JSON string (strconv for ints/floats), so the
    * wire object is {"user_id":"7","value":"2.00","k":"9"}. Doubles
    * keep the money-decimal convention for cross-engine stability. */
  private def simpleImage(img: String): Column = {
    def qs(c: Column): Column =
      coalesce(concat(lit("\""), c, lit("\"")), lit("null"))
    when(col(img).isNull, lit("null")).otherwise(concat(
      lit("{\"user_id\":"), qs(col(s"$img.user_id").cast("string")),
      lit(",\"value\":"), qs(col(s"$img.value").cast(DecimalType(18, 2)).cast("string")),
      lit(",\"k\":"), qs(col(s"$img.k").cast("string")),
      lit("}")))
  }

  /** Simple protocol DML message (simple/message.go:243-274 `message`
    * struct field order and json tags: version, database, table,
    * type, commitTs, buildTs, then data/old under omitempty — INSERT
    * carries data only, DELETE old only, UPDATE both). `tableID`/
    * `schemaVersion` are zero here and omitempty drops them;
    * `buildTs` is the deterministic commit-ms stand-in for the
    * reference's time.Now. Values are strings per encodeValue. */
  /** The envelope payload's MySQL-typed column model — what the e2e
    * row checksum folds over. `value` is modeled DECIMAL(18,2), the
    * money-decimal convention every envelope codec renders
    * ([[simpleImage]], csvLine), so the checksum a consumer recomputes
    * from WIRE values folds the identical canonical bytes the
    * encoder folded. */
  val envelopeCols: Seq[graft.model.MySqlDdl.MySqlCol] = Seq(
    graft.model.MySqlDdl.MySqlCol("user_id", "bigint", notNull = true, pk = true),
    graft.model.MySqlDdl.MySqlCol("value", "decimal", flen = 18, dec = 2),
    graft.model.MySqlDdl.MySqlCol("k", "bigint"))

  def simpleProtocol(env: DataFrame, enableRowChecksum: Boolean = false): DataFrame = {
    val typ = when(col("_op") === "I", "INSERT")
      .when(col("_op") === "U", "UPDATE").otherwise("DELETE")
    // enable-row-checksum: the wire-compatible CRC32 block rides
    // between buildTs and data, the message-struct field position
    // (simple/message.go:262-263; values RowChecksum CRC32-IEEE)
    val checksumPart =
      if (!enableRowChecksum) lit("")
      else concat(
        lit(",\"checksum\":{\"version\":1,\"corrupted\":false,\"current\":"),
        RowChecksum.checksumFor(envelopeCols, "after"),
        lit(",\"previous\":"),
        RowChecksum.checksumFor(envelopeCols, "before"),
        lit("}"))
    env.withColumn("_value", concat(
      lit("{\"version\":1,\"database\":\""), col("_schema"),
      lit("\",\"table\":\""), col("_table"),
      lit("\",\"type\":\""), typ,
      lit("\",\"commitTs\":"), col("_commit_ts"),
      lit(",\"buildTs\":"), ms(col("_commit_ts")),
      checksumPart,
      when(col("_op") =!= "D", concat(lit(",\"data\":"), simpleImage("after")))
        .otherwise(lit("")),
      when(col("_op") =!= "I", concat(lit(",\"old\":"), simpleImage("before")))
        .otherwise(lit("")),
      lit("}")))
  }

  /** Simple protocol bootstrap/handshake messages: one per table,
    * carrying the full TableSchema (send-bootstrap-* config
    * sink.go:188-200; bootstraper.go; schema shape
    * simple/message.go:65-72 — schema/table/tableID/version/columns/
    * indexes, columns with the dataType block of message.go:100-135).
    * Top-level fields follow the message struct: database/table are
    * empty for bootstrap (omitempty drops them), commitTs has no
    * omitempty and rides as 0; buildTs is 0, the deterministic
    * stand-in. */
  private def bootstrapCol3(name: String, mysqlType: String,
                            length: Int, nullable: Boolean) =
    s"""{"name":"$name","dataType":{"mysqlType":"$mysqlType","charset":"binary",""" +
      s""""collate":"binary","length":$length},"nullable":$nullable,"default":null}"""
  private val bootstrapColumns = Seq(
    bootstrapCol3("user_id", "bigint", 20, nullable = false),
    bootstrapCol3("value", "double", 22, nullable = true),
    bootstrapCol3("k", "bigint", 20, nullable = true)).mkString("[", ",", "]")
  private val bootstrapIndexes =
    """[{"name":"primary","unique":true,"primary":true,"nullable":false,"columns":["user_id"]}]"""
  private val bootstrapTail =
    s"""","tableID":0,"version":0,"columns":$bootstrapColumns,"indexes":$bootstrapIndexes}}"""

  /** One table's BOOTSTRAP wire value — the scalar form the
    * [[graft.streaming.Bootstrapper]] cadence emits per due table. */
  def bootstrapValue(schema: String, table: String): String =
    s"""{"version":1,"type":"BOOTSTRAP","commitTs":0,"buildTs":0,""" +
      s""""tableSchema":{"schema":"$schema","table":"$table$bootstrapTail"""

  def bootstrapMessages(env: DataFrame): DataFrame =
    env.select(col("_schema"), col("_table")).distinct()
      .withColumn("_value", concat(
        lit("{\"version\":1,\"type\":\"BOOTSTRAP\",\"commitTs\":0,\"buildTs\":0,"),
        lit("\"tableSchema\":{\"schema\":\""), col("_schema"),
        lit("\",\"table\":\""), col("_table"),
        lit(bootstrapTail)))

  /** Open-protocol RESOLVED control message (type field t=3,
    * open/message.go type taxonomy): key carries the watermark ts,
    * value is empty — the consumer may advance its own progress to
    * `ts` because no earlier commit will ever arrive. */
  def openResolvedMessage(resolvedTs: Long): (String, String) =
    (s"""{"ts":$resolvedTs,"t":3}""", "")

  /** Simple-protocol WATERMARK message (newResolvedMessage,
    * simple/message.go:275-282: version, type, commitTs, buildTs —
    * every omitempty field absent). */
  def simpleResolvedMessage(resolvedTs: Long): String =
    s"""{"version":1,"type":"WATERMARK","commitTs":$resolvedTs,""" +
      s""""buildTs":${resolvedTs / 1000000L}}"""

  /** Per-protocol resolved/watermark control message for the MQ path:
    * (key, value). Open rides in the KEY (t=3, empty value);
    * canal-json and simple carry a watermark VALUE message
    * (TIDB_WATERMARK / WATERMARK); debezium ships the op:"m" watermark
    * envelope (EncodeCheckpointEvent, debezium/codec.go:1645-1747);
    * protocols with no wire-level watermark (csv) fall back to the
    * open key as a transport-level marker the consumer filters. */
  def resolvedMessageFor(protocol: graft.model.Protocol, resolvedTs: Long,
                         encodingFormat: String = "json",
                         debeziumDisableSchema: Boolean = false): (String, String) =
    protocol match {
      // encoding-format=avro: the WATERMARK rides the official
      // com.pingcap.simple.avro record (MarshalCheckpoint,
      // simple/marshaller.go:116) in the binary string frame
      case graft.model.Protocol.Simple if encodingFormat == "avro" =>
        ("", SimpleAvroWire.watermarkFrame(resolvedTs))
      case graft.model.Protocol.Open => openResolvedMessage(resolvedTs)
      case graft.model.Protocol.CanalJson =>
        ("", CanalFull.watermarkMessage(resolvedTs, resolvedTs / 1000000L))
      case graft.model.Protocol.Simple => ("", simpleResolvedMessage(resolvedTs))
      case graft.model.Protocol.Debezium =>
        (DebeziumFull.watermarkKeyJson("graft", debeziumDisableSchema),
          DebeziumFull.watermarkValueJson("graft", resolvedTs,
            disableSchema = debeziumDisableSchema))
      // avro checkpoint: the 0x02 control event's bytes in the b64
      // string frame (EncodeCheckpointEvent, avro/encoder.go:104-147)
      case graft.model.Protocol.Avro =>
        ("", OpenBatch.frameJson(Array.emptyByteArray,
          AvroRegistry.checkpointEventBytes(resolvedTs)))
      case _ => openResolvedMessage(resolvedTs)
    }

  /** DDL message encoding, protocol-common form
    * (pkg/sink/codec/common/ddl.go:1-240): ddl rows =
    * (_schema, _table, version_ts, query). The query text is
    * JSON-escaped (real DDL can carry quotes in defaults/comments). */
  def ddlMessage(ddl: DataFrame): DataFrame =
    ddl.withColumn("_value", concat(
      lit("{\"type\":\"DDL\",\"actionType\":\"alter table\",\"commitTs\":"),
      col("version_ts"),
      lit(",\"schema\":\""), col("_schema"),
      lit("\",\"table\":\""), col("_table"),
      lit("\",\"query\":\""), jsonEscape(col("query")), lit("\"}")))

  /** The DDL subtype string the canal AND simple codecs share
    * (convertDdlEventType, canal/helper.go:211-243 ≡ getDDLType,
    * simple/message.go:74-97), derived from the statement class:
    * CREATE / RENAME / CINDEX / DINDEX / ERASE / TRUNCATE / ALTER,
    * QUERY for schema-level and not-classified families. */
  def ddlWireType(query: Column): Column = {
    val cls = graft.operators.Filters.ddlClass(query)
    when(cls === "create table", "CREATE")
      .when(cls === "rename table", "RENAME")
      .when(cls === "create index", "CINDEX")
      .when(cls === "drop index", "DINDEX")
      .when(cls === "drop table", "ERASE")
      .when(cls === "truncate table", "TRUNCATE")
      .when(cls.isin("add column", "drop column", "modify column",
        "change column", "alter partition", "alter table", "recover table"), "ALTER")
      .otherwise("QUERY")
  }

  /** Per-protocol DDL wire message over (_schema, _table, version_ts,
    * query) rows — the reference encodes DDL per protocol, not in one
    * common form:
    *  - canal-JSON: the JSONMessage DDL shape (canal_json_encoder.go
    *    :384-404 — isDdl true, canal EventType string, sql; null row
    *    blocks) WITH the `_tidb` commitTs extension so consumers keep
    *    the exact commit ts (es is ms-truncated);
    *  - simple: the `message` struct with the DDL subtype as `type`
    *    and the statement in `sql` (newDDLMessage, simple/message.go
    *    :295-318; tableSchema omitted — the version-triggered
    *    BOOTSTRAP handshake carries the live schema separately);
    *  - debezium: the schema-change event (dbzCodec.EncodeDDLEvent,
    *    debezium/codec.go:1223-1639) — SchemaChangeKey `_key` +
    *    payload with source block (connector "TiCDC"), ddl text, and
    *    tableChanges carrying the post-DDL table definition when
    *    `tableFor` resolves it (the evolving SchemaStore's live
    *    shape); built per row in a UDF because the stream is
    *    DDL-rate-sized (control plane), like the rename dispatch;
    *  - other protocols fall back to the protocol-common form
    *    ([[ddlMessage]]; open's two-part key/value DDL rides
    *    [[OpenBatch.ddlMessage]]'s byte framing on byte transports). */
  def ddlMessageFor(ddl: DataFrame, protocol: graft.model.Protocol,
                    tableFor: (String, String) => Option[graft.model.MySqlDdl.MySqlTable] =
                      (_, _) => None,
                    clusterId: String = "graft",
                    debeziumDisableSchema: Boolean = false): DataFrame =
    protocol match {
      case graft.model.Protocol.Debezium =>
        val enc = udf((s: String, t: String, ts: Long, q: String) => {
          val block = tableFor(s, t)
            .map(tt => DebeziumFull.ddlTableBlockJson(tt))
          (DebeziumFull.ddlKeyJson(s, debeziumDisableSchema),
            DebeziumFull.ddlValueJson(clusterId, s, t, q, ts, ts / 1000000L,
              block, disableSchema = debeziumDisableSchema))
        })
        ddl.withColumn("__kv",
            enc(col("_schema"), col("_table"), col("version_ts"), col("query")))
          .withColumn("_key", col("__kv._1"))
          .withColumn("_value", col("__kv._2"))
          .drop("__kv")
      case graft.model.Protocol.CanalJson =>
        ddl.withColumn("_value", concat(
          lit("{\"id\":0,\"database\":\""), col("_schema"),
          lit("\",\"table\":\""), col("_table"),
          lit("\",\"pkNames\":null,\"isDdl\":true,\"type\":\""),
          ddlWireType(col("query")),
          lit("\",\"es\":"), ms(col("version_ts")),
          lit(",\"ts\":"), ms(col("version_ts")),
          lit(",\"sql\":\""), jsonEscape(col("query")),
          lit("\",\"sqlType\":null,\"mysqlType\":null,\"data\":null,\"old\":null,"),
          lit("\"_tidb\":{\"commitTs\":"), col("version_ts"), lit("}}")))
      case graft.model.Protocol.Simple =>
        ddl.withColumn("_value", concat(
          lit("{\"version\":1,\"type\":\""), ddlWireType(col("query")),
          lit("\",\"sql\":\""), jsonEscape(col("query")),
          lit("\",\"commitTs\":"), col("version_ts"),
          lit(",\"buildTs\":"), ms(col("version_ts")), lit("}")))
      case _ => ddlMessage(ddl)
    }

  /** mysqlType + display length for a registry dataType string (the
    * handshake's dataType block needs both). */
  private[functions] def mysqlTypeOf(dt: String): (String, Int) = {
    val base = dt.takeWhile(_ != '(').trim.toLowerCase
    val len = "\\((\\d+)".r.findFirstMatchIn(dt).map(_.group(1).toInt)
      .getOrElse(base match {
        case "bigint" => 20
        case "int" | "integer" => 11
        case "smallint" => 6
        case "tinyint" => 4
        case "double" => 22
        case "float" => 12
        case _ => 0
      })
    (base, len)
  }

  /** BOOTSTRAP handshake rendered from the LIVE evolving schema store
    * — the reference builds the handshake's TableSchema from the
    * CURRENT TableInfo (simple/message.go:65-72, pulled by
    * bootstraper.go from the schema store), so a consumer joining
    * after a mid-stream DDL learns the post-DDL shape from the wire
    * alone. tableID is the table's logical id, version its registry
    * versionTs (the reference's TableInfo.UpdateTS). Tables the store
    * doesn't know fall back to the fixture handshake (registry-less
    * feeds keep their old wire). */
  def bootstrapValueFromStore(store: graft.model.SchemaStore,
                              schema: String, table: String): String =
    store.registry.latest(schema, table) match {
      case None => bootstrapValue(schema, table)
      case Some(sch) =>
        val tableId = store.membership.get((schema, table))
          .flatMap(_.lastOption.map(_._2._1)).getOrElse(0L)
        // the statement's DECLARED pk when the fold captured one (r14:
        // TableSchema.pks); the first-column handle convention remains
        // only as the keyless fallback
        val pks = if (sch.pks.nonEmpty) sch.pks else Seq(sch.columns.head.name)
        val cols = sch.columns.map { c =>
          val (mt, len) = mysqlTypeOf(c.dataType)
          val dflt = c.default.map(d => "\"" + d + "\"").getOrElse("null")
          s"""{"name":"${c.name}","dataType":{"mysqlType":"$mt",""" +
            s""""charset":"binary","collate":"binary","length":$len},""" +
            s""""nullable":${!pks.contains(c.name)},"default":$dflt}"""
        }.mkString("[", ",", "]")
        s"""{"version":1,"type":"BOOTSTRAP","commitTs":0,"buildTs":0,""" +
          s""""tableSchema":{"schema":"$schema","table":"$table",""" +
          s""""tableID":$tableId,"version":${sch.versionTs},""" +
          s""""columns":$cols,"indexes":[{"name":"primary","unique":true,""" +
          s""""primary":true,"nullable":false,"columns":[${
            pks.map(p => "\"" + p + "\"").mkString(",")}]}]}}"""
    }

  /** JSON string escaping for payload text fields (quote, backslash,
    * newline/return/tab) — used by encoders over free-text tables. */
  def jsonEscape(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, lit("\\\\"), lit("\\\\\\\\")),
            lit("\""), lit("\\\\\"")),
          lit("\n"), lit("\\\\n")),
        lit("\r"), lit("\\\\r")),
      lit("\t"), lit("\\\\t"))

  // ---- schema-driven (generic payload) encoders ----
  // The fixture encoders above pin the oracle-checked byte layout for
  // the (user_id, value, k) payload; these derive the rendering from
  // the payload StructType, covering the reference's full scalar type
  // matrix (formatColVal pkg/common/event/chunk.go:242-310, CSV type
  // switch csv_message.go:246-330): integers bare, decimals plain,
  // strings JSON-escaped, BINARY base64 (CSVConfig binary-encoding,
  // pkg/config/sink.go:283), DATE/DATETIME canonical strings,
  // BOOLEAN as 1/0 (MySQL tinyint), VECTOR as the bracketed list
  // TiDB renders (chunk.go:302-303).

  import org.apache.spark.sql.types._

  /** Render one payload field as a JSON value expression.
    * `canalBlob`: frame BINARY as the ISO-8859-1 char view of the
    * bytes (canal-JSON's JavaSQLTypeBLOB convention, reference
    * canal_json_encoder.go:32) instead of base64. */
  def jsonValueFor(c: Column, dt: DataType, canalBlob: Boolean = false): Column = {
    val rendered: Column = dt match {
      case ByteType | ShortType | IntegerType | LongType => c.cast("string")
      case _: DecimalType => c.cast("string")
      case FloatType | DoubleType => c.cast("string")
      case BooleanType => when(c, lit("1")).otherwise(lit("0"))
      case StringType => concat(lit("\""), jsonEscape(c), lit("\""))
      case BinaryType if canalBlob => CharsetExpressions.canalBlobJson(c)
      case BinaryType => concat(lit("\""), base64(c), lit("\""))
      case DateType => concat(lit("\""), date_format(c, "yyyy-MM-dd"), lit("\""))
      case _: TimestampType | _: TimestampNTZType =>
        concat(lit("\""), date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"), lit("\""))
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        concat(lit("\"["), array_join(transform(c, e => e.cast("string")), ","), lit("]\""))
      case _ => concat(lit("\""), jsonEscape(c.cast("string")), lit("\""))
    }
    coalesce(rendered, lit("null"))
  }

  /** JSON image object for an arbitrary payload struct column, fields
    * in schema order; null image → literal null. */
  def imageJsonFor(img: String, fields: Seq[StructField],
                   canalBlob: Boolean = false): Column = {
    val body = fields.zipWithIndex.flatMap { case (f, i) =>
      val sep = if (i == 0) "{\"" else ",\""
      Seq(lit(s"$sep${f.name}\":"),
        jsonValueFor(col(s"$img.${f.name}"), f.dataType, canalBlob))
    } :+ lit("}")
    when(col(img).isNull, lit("null")).otherwise(concat(body: _*))
  }

  /** Canal-JSON over an arbitrary payload schema (generic form of
    * [[canalJson]]). */
  def canalJsonFor(env: DataFrame, handleKeys: Seq[String]): DataFrame = {
    val fields = env.schema("after").dataType.asInstanceOf[StructType].fields.toSeq
    val typ = when(col("_op") === "I", "INSERT")
      .when(col("_op") === "U", "UPDATE").otherwise("DELETE")
    // canalBlob: BINARY columns ride as ISO-8859-1 char strings, the
    // canal JavaSQLTypeBLOB convention (canal_json_encoder.go:32)
    val dataImg = when(col("_op") === "D", imageJsonFor("before", fields, canalBlob = true))
      .otherwise(imageJsonFor("after", fields, canalBlob = true))
    val oldImg = when(col("_op") === "U",
      concat(lit("["), imageJsonFor("before", fields, canalBlob = true), lit("]")))
      .otherwise(lit("null"))
    val pks = handleKeys.map(k => "\"" + k + "\"").mkString(",")
    env.withColumn("_value", concat(
      lit("{\"id\":0,\"database\":\""), col("_schema"),
      lit("\",\"table\":\""), col("_table"),
      lit(s"""\",\"pkNames\":[$pks],\"isDdl\":false,\"type\":\""""), typ,
      lit("\",\"es\":"), ms(col("_commit_ts")),
      lit(",\"ts\":"), ms(col("_commit_ts")),
      lit(",\"data\":["), dataImg,
      lit("],\"old\":"), oldImg,
      lit("}")))
  }

  /** Debezium envelope over an arbitrary payload schema. */
  def debeziumJsonFor(env: DataFrame): DataFrame = {
    val fields = env.schema("after").dataType.asInstanceOf[StructType].fields.toSeq
    val op = when(col("_op") === "I", "c")
      .when(col("_op") === "U", "u").otherwise("d")
    env.withColumn("_value", concat(
      lit("{\"before\":"), imageJsonFor("before", fields),
      lit(",\"after\":"), imageJsonFor("after", fields),
      lit(",\"source\":{\"db\":\""), col("_schema"),
      lit("\",\"table\":\""), col("_table"),
      lit("\",\"commit_ts\":"), col("_commit_ts"),
      lit("},\"op\":\""), op,
      lit("\",\"ts_ms\":"), ms(col("_commit_ts")),
      lit("}")))
  }

  /** Open Protocol over an arbitrary payload schema (generic form of
    * [[openProtocol]]): key layout unchanged, value `u`/`p`/`d` maps
    * rendered per type. */
  def openProtocolFor(env: DataFrame): DataFrame = {
    val fields = env.schema("after").dataType.asInstanceOf[StructType].fields.toSeq
    val key = concat(
      lit("{\"ts\":"), col("_commit_ts"),
      lit(",\"scm\":\""), col("_schema"),
      lit("\",\"tbl\":\""), col("_table"),
      lit("\",\"t\":1}"))
    val value =
      when(col("_op") === "I", concat(lit("{\"u\":"), imageJsonFor("after", fields), lit("}")))
        .when(col("_op") === "U", concat(
          lit("{\"u\":"), imageJsonFor("after", fields),
          lit(",\"p\":"), imageJsonFor("before", fields), lit("}")))
        .otherwise(concat(lit("{\"d\":"), imageJsonFor("before", fields), lit("}")))
    env.withColumn("_key", key).withColumn("_value", value)
  }

  /** Simple protocol over an arbitrary payload schema. */
  /** Simple-protocol value rendering over an arbitrary type
    * (encodeValue, simple/message.go:434-491): every scalar is a
    * JSON STRING (strconv ints/floats, base64 binary, "1"/"0"
    * bools), EXCEPT TypeTimestamp which is the
    * {"location","value"} object. Spark TimestampType maps to
    * TypeTimestamp (tz-aware), TimestampNTZType to TypeDatetime (a
    * plain string). */
  def simpleValueFor(c: Column, dt: DataType): Column = {
    def qs(body: Column): Column = concat(lit("\""), body, lit("\""))
    val rendered: Column = dt match {
      case ByteType | ShortType | IntegerType | LongType => qs(c.cast("string"))
      case _: DecimalType => qs(c.cast("string"))
      case FloatType | DoubleType => qs(c.cast("string"))
      case BooleanType => qs(when(c, lit("1")).otherwise(lit("0")))
      case StringType => concat(lit("\""), jsonEscape(c), lit("\""))
      case BinaryType => qs(base64(c))
      case DateType => qs(date_format(c, "yyyy-MM-dd"))
      case _: TimestampNTZType => qs(date_format(c, "yyyy-MM-dd HH:mm:ss"))
      case _: TimestampType => concat(
        lit("{\"location\":\"UTC\",\"value\":\""),
        date_format(c, "yyyy-MM-dd HH:mm:ss"), lit("\"}"))
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        // TiDB VECTOR rides the simple wire as its bracket string
        // (simple/message.go:401-402 GetVectorFloat32().String, "string")
        concat(lit("\"["), array_join(transform(c, e => e.cast("string")), ","), lit("]\""))
      case _ => concat(lit("\""), jsonEscape(c.cast("string")), lit("\""))
    }
    coalesce(rendered, lit("null"))
  }

  private def simpleImageFor(img: String, fields: Seq[StructField]): Column = {
    val body = fields.zipWithIndex.flatMap { case (f, i) =>
      val sep = if (i == 0) "{\"" else ",\""
      Seq(lit(s"$sep${f.name}\":"), simpleValueFor(col(s"$img.${f.name}"), f.dataType))
    } :+ lit("}")
    when(col(img).isNull, lit("null")).otherwise(concat(body: _*))
  }

  /** Simple-protocol JSON over an arbitrary payload schema (generic
    * form of [[simpleProtocol]] — message layout per the `message`
    * struct, values per encodeValue). */
  def simpleProtocolFor(env: DataFrame): DataFrame = {
    val fields = env.schema("after").dataType.asInstanceOf[StructType].fields.toSeq
    val typ = when(col("_op") === "I", "INSERT")
      .when(col("_op") === "U", "UPDATE").otherwise("DELETE")
    env.withColumn("_value", concat(
      lit("{\"version\":1,\"database\":\""), col("_schema"),
      lit("\",\"table\":\""), col("_table"),
      lit("\",\"type\":\""), typ,
      lit("\",\"commitTs\":"), col("_commit_ts"),
      lit(",\"buildTs\":"), ms(col("_commit_ts")),
      when(col("_op") =!= "D",
        concat(lit(",\"data\":"), simpleImageFor("after", fields))).otherwise(lit("")),
      when(col("_op") =!= "I",
        concat(lit(",\"old\":"), simpleImageFor("before", fields))).otherwise(lit("")),
      lit("}")))
  }

  /** CSV line over an arbitrary payload schema (meta columns then
    * payload in schema order; csv_message.go:246-330 type switch). */
  /** Config-driven column rendering for the generic csv wire
    * (fromColValToCsvVal + formatValue, csv_message.go:166-345):
    * `quote` nonempty → RFC-4180 quote doubling; empty → the
    * backslash-escape mode (formatWithEscapes: \\ \r \n and each
    * delimiter character escape); binaries per
    * `binary-encoding-method`. */
  private def csvCell(c: Column, dt: DataType,
                      csv: graft.model.CsvConfig): Column = {
    val nul = lit(csv.nullString)
    def render(s: Column): Column =
      if (csv.quote.nonEmpty)
        concat(lit(csv.quote),
          regexp_replace(s, lit(csv.quote), lit(csv.quote + csv.quote)),
          lit(csv.quote))
      else {
        // escape order matters: backslash first, then CR/LF, then the
        // delimiter's characters (csv_message.go:208-244)
        val esc0 = regexp_replace(s, lit("\\\\"), lit("\\\\\\\\"))
        val esc1 = regexp_replace(esc0, lit("\r"), lit("\\\\r"))
        val esc2 = regexp_replace(esc1, lit("\n"), lit("\\\\n"))
        csv.delimiter.distinct.foldLeft(esc2) { (acc, ch) =>
          regexp_replace(acc,
            lit(java.util.regex.Pattern.quote(ch.toString)),
            lit(java.util.regex.Matcher.quoteReplacement("\\" + ch)))
        }
      }
    def bin(c2: Column): Column =
      if (csv.binaryEncodingMethod == "hex") lower(hex(c2)) else base64(c2)
    dt match {
      case StringType => coalesce(render(c), nul)
      case BinaryType => coalesce(bin(c), nul)
      case BooleanType => coalesce(when(c, lit("1")).otherwise(lit("0")), nul)
      case DateType => coalesce(date_format(c, "yyyy-MM-dd"), nul)
      case _: TimestampType | _: TimestampNTZType =>
        coalesce(date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"), nul)
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        coalesce(render(concat(lit("["),
          array_join(transform(c, e => e.cast("string")), ","), lit("]"))), nul)
      case _ => coalesce(c.cast("string"), nul)
    }
  }

  /** `ticdc-meta$...` header line (encodeHeader, csv_message.go:
    * 418-446): meta column names, then the payload column names, in
    * the record order — emitted once per message/file when
    * `output-field-header` is on. */
  def csvHeaderFor(colNames: Seq[String],
                   csv: graft.model.CsvConfig): String = {
    val meta = Seq("ticdc-meta$operation", "ticdc-meta$table",
      "ticdc-meta$schema") ++
      (if (csv.includeCommitTs) Seq("ticdc-meta$commit-ts") else Nil) ++
      (if (csv.outputOldValue) Seq("ticdc-meta$is-update") else Nil)
    (meta ++ colNames).mkString(csv.delimiter)
  }

  /** The csv codec config this engine's established storage layout
    * pinned before the knob surface existed: commit ts included
    * (the common cloud-storage deployment shape). The [[graft.model
    * .CsvConfig]] DEFAULTS mirror the reference's config defaults
    * instead (include-commit-ts=false). */
  val csvLegacy: graft.model.CsvConfig =
    graft.model.CsvConfig(includeCommitTs = true)

  def csvLineFor(env: DataFrame,
                 csv: graft.model.CsvConfig = csvLegacy): DataFrame = {
    csv.validate()
    val fields = env.schema("after").dataType.asInstanceOf[StructType].fields.toSeq
    def q(c: Column): Column = csvCell(c, StringType, csv)
    def payloadOf(img: Column) =
      fields.map(f => csvCell(img.getField(f.name), f.dataType, csv))
    // meta order is op, TABLE, SCHEMA, [commitTs], [is-updated]
    // (encodeMeta, csv_message.go:122-140)
    def rec(op: Column, img: Column, updated: Column): Seq[Column] =
      Seq(q(op), q(col("_table")), q(col("_schema"))) ++
        (if (csv.includeCommitTs) Seq(col("_commit_ts").cast("string")) else Nil) ++
        (if (csv.outputOldValue) Seq(updated.cast("string")) else Nil) ++
        payloadOf(img)
    val plainOp = when(col("_op") === "I", "I")
      .when(col("_op") === "U", "U").otherwise("D")
    val plainImg = when(col("_op") === "D", col("before")).otherwise(col("after"))
    val plain = concat_ws(csv.delimiter,
      rec(plainOp, plainImg, lit(false)): _*)
    if (!csv.outputOldValue) env.withColumn("_value", plain)
    else {
      // output-old-value: an UPDATE ships as a D+I record pair with
      // is-updated=true (csv_message.go:104-118)
      val pair = concat_ws("\n",
        concat_ws(csv.delimiter, rec(lit("D"), col("before"), lit(true)): _*),
        concat_ws(csv.delimiter, rec(lit("I"), col("after"), lit(true)): _*))
      env.withColumn("_value",
        when(col("_op") === "U" && col("before").isNotNull, pair)
          .otherwise(plain))
    }
  }
}
