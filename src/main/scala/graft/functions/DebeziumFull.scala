package graft.functions

import graft.model.MySqlDdl.{MySqlCol, MySqlTable}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Full-fidelity Debezium JSON encoder — the schema-block +
  * semantic-type layout of the reference's dbzCodec
  * (pkg/sink/codec/debezium/codec.go:163-606 field schemas,
  * :614-900 value conversion), reproduced over a DataFrame whose
  * payload columns carry the raw MySQL literals of the change.
  *
  * Golden-parity bar (debezium_test.go:77-103): byte-identical modulo
  * `payload.source` and `payload.ts_ms`, which the reference's own
  * suite ignores because they come from a live Debezium capture.
  *
  * Layout decisions mirrored from codec.go:
  *  - DATE → int32 `io.debezium.time.Date` (epoch days); invalid
  *    ('0000-00-00') → null (0 when NOT NULL)
  *  - DATETIME fsp≤3 → int64 `io.debezium.time.Timestamp` (ms);
  *    fsp>3 → `MicroTimestamp` (µs); value rounded at fsp
  *  - TIME → int64 `io.debezium.time.MicroTime` (signed µs)
  *  - TIMESTAMP → string `io.debezium.time.ZonedTimestamp`
  *    ("yyyy-MM-dd'T'HH:mm:ss[.f{fsp}]Z", UTC)
  *  - YEAR → int32 `io.debezium.time.Year`
  *  - BIT(1) → boolean; BIT(n>1) → bytes `io.debezium.data.Bits`
  *    (little-endian, ceil(n/8) bytes, base64)
  *  - binary-flagged strings (BINARY/VARBINARY/BLOB) → base64 string;
  *    BINARY(n) zero-padded to n
  *  - DECIMAL → double (decimal.handling.mode=double, the JSON default)
  *  - unsigned BIGINT → int64 two's-complement reinterpret (max → -1)
  *  - TINYINT UNSIGNED stays int16, SMALLINT UNSIGNED → int32,
  *    INT UNSIGNED → int64 (codec.go:393-480)
  *  - ENUM/SET → string with `allowed` parameters; invalid stored
  *    value → ""
  *
  * The schema block is a per-table constant (driver-side string); the
  * per-row payload stays whole-stage-codegen Column expressions.
  */
object DebeziumFull {

  // ---------- schema block (driver-side, table-shaped) ----------

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    }

  /** One field-schema object (codec.go:writeDebeziumFieldSchema).
    * Field order: type, optional, [name], [version], [parameters],
    * field. */
  def fieldSchemaJson(c: MySqlCol): String = {
    val opt = (!c.notNull).toString
    def plain(t: String) =
      s"""{"type":"$t","optional":$opt,"field":"${esc(c.name)}"}"""
    def semantic(t: String, name: String, params: Option[(String, String)] = None) = {
      val p = params.map { case (k, v) => s""","parameters":{"$k":"${esc(v)}"}""" }.getOrElse("")
      s"""{"type":"$t","optional":$opt,"name":"$name","version":1$p,"field":"${esc(c.name)}"}"""
    }
    c.base match {
      case "bit" if c.flen <= 1 => plain("boolean")
      case "bit" => semantic("bytes", "io.debezium.data.Bits", Some("length" -> c.flen.toString))
      case "varchar" | "char" | "tinytext" | "text" | "mediumtext" | "longtext" |
           "varbinary" | "binary" | "blob" | "tinyblob" | "mediumblob" | "longblob" =>
        plain("string")
      case "enum" => semantic("string", "io.debezium.data.Enum", Some("allowed" -> c.elems.mkString(",")))
      case "set" => semantic("string", "io.debezium.data.EnumSet", Some("allowed" -> c.elems.mkString(",")))
      case "date" => semantic("int32", "io.debezium.time.Date")
      case "datetime" =>
        if (c.fsp <= 3) semantic("int64", "io.debezium.time.Timestamp")
        else semantic("int64", "io.debezium.time.MicroTimestamp")
      case "timestamp" => semantic("string", "io.debezium.time.ZonedTimestamp")
      case "time" => semantic("int64", "io.debezium.time.MicroTime")
      case "json" => semantic("string", "io.debezium.data.Json")
      case "year" => semantic("int32", "io.debezium.time.Year")
      case "tinyint" => plain("int16")
      case "smallint" => plain(if (c.unsigned) "int32" else "int16")
      case "mediumint" => plain("int32")
      case "int" => plain(if (c.unsigned) "int64" else "int32")
      case "bigint" => plain("int64")
      case "float" => plain(if (c.dec >= 0) "double" else "float")
      case "double" => plain("double")
      case "decimal" => plain("double")
      case "vector" =>
        // codec.go:575-580: named semantic type, NO version field
        s"""{"type":"string","optional":$opt,"name":"io.debezium.data.TiDBVectorFloat32","field":"${esc(c.name)}"}"""
      case _ => plain("string")
    }
  }

  /** The fixed `source` struct schema
    * (codec.go:writeSourceSchema — Debezium's
    * io.debezium.connector.mysql.Source block). */
  private val sourceSchemaJson: String = {
    def f(t: String, opt: Boolean, name: String) =
      s"""{"type":"$t","optional":$opt,"field":"$name"}"""
    val snapshot =
      """{"type":"string","optional":true,"name":"io.debezium.data.Enum","version":1,""" +
        """"parameters":{"allowed":"true,last,false,incremental"},"default":"false","field":"snapshot"}"""
    val fields = Seq(
      f("string", opt = false, "version"), f("string", opt = false, "connector"),
      f("string", opt = false, "name"), f("int64", opt = false, "ts_ms"),
      snapshot,
      f("string", opt = false, "db"), f("string", opt = true, "sequence"),
      f("string", opt = true, "table"), f("int64", opt = false, "server_id"),
      f("string", opt = true, "gtid"), f("string", opt = false, "file"),
      f("int64", opt = false, "pos"), f("int32", opt = false, "row"),
      f("int64", opt = true, "thread"), f("string", opt = true, "query")
    ).mkString(",")
    s"""{"type":"struct","fields":[$fields],"optional":false,""" +
      s""""name":"io.debezium.connector.mysql.Source","field":"source"}"""
  }

  private val transactionSchemaJson: String =
    """{"type":"struct","fields":[""" +
      """{"type":"string","optional":false,"field":"id"},""" +
      """{"type":"int64","optional":false,"field":"total_order"},""" +
      """{"type":"int64","optional":false,"field":"data_collection_order"}],""" +
      """"optional":true,"name":"event.block","version":1,"field":"transaction"}"""

  /** The value message's `schema` block for one table. */
  def envelopeSchemaJson(serverName: String, t: MySqlTable): String = {
    val fq = s"$serverName.${t.schema}.${t.table}"
    val cols = t.cols.map(fieldSchemaJson).mkString(",")
    def image(which: String) =
      s"""{"type":"struct","fields":[$cols],"optional":true,"name":"$fq.Value","field":"$which"}"""
    s"""{"type":"struct","fields":[${image("before")},${image("after")},$sourceSchemaJson,""" +
      s"""{"type":"string","optional":false,"field":"op"},""" +
      s"""{"type":"int64","optional":true,"field":"ts_ms"},""" +
      s"""$transactionSchemaJson],"optional":false,"name":"$fq.Envelope","version":1}"""
  }

  /** The key message's `schema` block (handle columns only). */
  def keySchemaJson(serverName: String, t: MySqlTable): String = {
    val fq = s"$serverName.${t.schema}.${t.table}"
    val cols = t.pkCols.map(fieldSchemaJson).mkString(",")
    s"""{"type":"struct","fields":[$cols],"optional":false,"name":"$fq.Key"}"""
  }

  // ---------- per-row value conversion (Catalyst expressions) ----------

  private val epochDay = to_date(lit("1970-01-01"))

  /** Unchunked base64: Spark's `base64` MIME-chunks with CRLF every
    * 76 chars (visible at BINARY(100)); JSON wire fields are single
    * line. */
  private def b64(c: Column): Column =
    regexp_replace(base64(c), "[\\r\\n]", "")

  /** Exact integer division (decimal domain — epoch-µs would lose
    * ±1 in double division; quotient truncates toward zero, which
    * equals floor for the non-negative sub-second parts here). */
  private def idiv(n: Column, d: Long): Column =
    (n.cast(DecimalType(38, 0)) / lit(d)).cast("long")

  /** Half-up rounding of `us` (microseconds) at `fsp` fractional
    * digits. */
  private def roundAtFsp(us: Column, fsp: Int): Column = {
    val unit = math.pow(10, 6 - fsp).toLong
    if (unit <= 1) us else idiv(us + lit(unit / 2), unit) * lit(unit)
  }

  /** JSON token (already-rendered string: number, quoted string,
    * true/false, or null) for one column's raw MySQL literal. */
  def jsonToken(c: MySqlCol, raw: Column): Column = {
    val rendered: Column = c.base match {
      case "tinyint" | "smallint" | "mediumint" | "int" | "year" =>
        raw.cast("long").cast("string")
      case "bigint" if c.unsigned =>
        // two's-complement reinterpret; 2^64-1 (and anything above the
        // signed range) lands on -1 via the same wrap (codec.go:845-852)
        val d = raw.cast(DecimalType(38, 0))
        when(d >= lit(BigDecimal("9223372036854775808").underlying()),
          (d - lit(BigDecimal("18446744073709551616").underlying())).cast("long").cast("string"))
          .otherwise(d.cast("long").cast("string"))
      case "bigint" => raw.cast("long").cast("string")
      case "float" if c.dec < 0 => raw.cast("float").cast("string")
      case "float" | "double" | "decimal" => raw.cast("double").cast("string")
      case "bit" if c.flen <= 1 =>
        when(raw.cast("long") =!= 0, lit("true")).otherwise(lit("false"))
      case "bit" =>
        // little-endian bytes sized to ceil(n/8), base64 (Debezium Bits)
        val nBytes = (c.flen + 7) / 8
        val v = raw.cast("long")
        val hexLe = concat((0 until nBytes).map(i =>
          lpad(hex(shiftright(v, 8 * i).bitwiseAND(lit(255L))), 2, "0")): _*)
        concat(lit("\""), b64(unhex(hexLe)), lit("\""))
      case "varbinary" | "blob" | "tinyblob" | "mediumblob" | "longblob" =>
        concat(lit("\""), b64(raw.cast("binary")), lit("\""))
      case "binary" =>
        // BINARY(n) storage zero-pads to n bytes
        val padded =
          if (c.flen > 0)
            call_function("rpad", raw.cast("binary"), lit(c.flen), lit(Array[Byte](0)))
          else raw.cast("binary")
        concat(lit("\""), b64(padded), lit("\""))
      case "varchar" | "char" | "tinytext" | "text" | "mediumtext" | "longtext" | "json" =>
        concat(lit("\""), Codecs.jsonEscape(raw), lit("\""))
      case "vector" =>
        // codec.go:872-874: the VectorFloat32.String() bracket form
        concat(lit("\""), CanalFull.vectorToken(raw), lit("\""))
      case "enum" =>
        val valid = raw.isin(c.elems: _*)
        concat(lit("\""), when(valid, Codecs.jsonEscape(raw)).otherwise(lit("")), lit("\""))
      case "set" =>
        // valid iff every member is an allowed element; normalized to
        // element order with duplicates collapsed (MySQL SET semantics)
        val members = split(raw, ",")
        val allValid = forall(members, m => m.isin(c.elems: _*))
        val normalized = array_join(
          filter(typedlit(c.elems), e => array_contains(members, e)), ",")
        concat(lit("\""), when(allValid, normalized).otherwise(lit("")), lit("\""))
      case "date" =>
        val d = try_to_date(raw)
        val days = datediff(d, epochDay).cast("string")
        if (c.notNull) coalesce(days, lit("0")) else days
      case "datetime" =>
        val us = roundAtFsp(unix_micros(try_to_timestamp(raw)), c.fsp)
        val n = if (c.fsp <= 3) idiv(us, 1000L) else us
        val s = n.cast("string")
        if (c.notNull) coalesce(s, lit("0")) else s
      case "timestamp" =>
        val us = roundAtFsp(unix_micros(try_to_timestamp(raw)), c.fsp)
        val ts = timestamp_micros(us)
        val base = date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
        val frac =
          if (c.fsp > 0)
            concat(lit("."),
              substring(lpad(pmod(us, lit(1000000L)).cast("string"), 6, "0"), 1, c.fsp))
          else lit("")
        val s = concat(lit("\""), base, frac, lit("Z\""))
        if (c.notNull) coalesce(s, lit("\"1970-01-01T00:00:00Z\"")) else s
      case "time" =>
        val sign = when(raw.startsWith("-"), -1L).otherwise(1L)
        val body = regexp_replace(raw, "^-", "")
        // nullif guards the ANSI cast: a non-TIME literal extracts ""
        // and must render null, not kill the batch
        val h = nullif(regexp_extract(body, "^(\\d+):", 1), lit("")).cast("long")
        val m = nullif(regexp_extract(body, "^\\d+:(\\d+)", 1), lit("")).cast("long")
        val sec = nullif(regexp_extract(body, "^\\d+:\\d+:(\\d+)", 1), lit("")).cast("long")
        val fracRaw = regexp_extract(body, "\\.(\\d+)$", 1)
        val fracUs = coalesce(
          rpad(fracRaw, 6, "0").cast("long"), lit(0L))
        val us = (h * 3600L + m * 60L + sec) * 1000000L + roundAtFsp(fracUs, c.fsp)
        (sign * us).cast("string")
      case _ => concat(lit("\""), Codecs.jsonEscape(raw), lit("\""))
    }
    coalesce(rendered, lit("null"))
  }

  /** JSON image object over `img.<col>` raw-literal columns; null
    * struct → literal null. */
  def imageJson(img: String, cols: Seq[MySqlCol]): Column = {
    val body = cols.zipWithIndex.flatMap { case (c, i) =>
      val sep = if (i == 0) "{\"" else ",\""
      Seq(lit(s"$sep${c.name}\":"), jsonToken(c, col(s"$img.${c.name}")))
    } :+ lit("}")
    when(col(img).isNull, lit("null")).otherwise(concat(body: _*))
  }

  /** The `source` payload block. Field values are synthesized from the
    * envelope (the reference fills them from the upstream capture;
    * its golden suite ignores this block — debezium_test.go:81). */
  private def sourcePayload(serverName: String): Column = concat(
    lit(s"""{"version":"2.4.0.Final","connector":"mysql","name":"$serverName","ts_ms":"""),
    (col("_commit_ts").cast(DecimalType(38, 0)) / lit(1000000L)).cast("long"),
    lit(""","snapshot":"false","db":""""), col("_schema"),
    lit("""","sequence":null,"table":""""), col("_table"),
    lit("""","server_id":0,"gtid":null,"file":"","pos":0,"row":0,"thread":null,"query":null}"""))

  /** Encode DML envelope rows (`before`/`after` structs of raw MySQL
    * literal strings, `_op` I/U/D, `_schema`/`_table`/`_commit_ts`)
    * into full Debezium key+value messages with schema blocks. */
  def encode(env: DataFrame, t: MySqlTable, serverName: String,
             disableSchema: Boolean = false): DataFrame = {
    val op = when(col("_op") === "I", "c").when(col("_op") === "U", "u").otherwise("d")
    val tsMs = (col("_commit_ts").cast(DecimalType(38, 0)) / lit(1000000L)).cast("long")
    val keyImg = when(col("_op") === "D", col("before")).otherwise(col("after"))
    val keyBody = t.pkCols.zipWithIndex.flatMap { case (c, i) =>
      val sep = if (i == 0) "{\"" else ",\""
      Seq(lit(s"$sep${c.name}\":"), jsonToken(c, keyImg.getField(c.name)))
    } :+ lit("}")
    // debezium-disable-schema (codec.go:1023,1131): the `schema`
    // block drops from key AND envelope, the {"payload":...} wrapper
    // stays — the schemas.enable=false JSON-converter shape a
    // registry-backed consumer expects
    val keyHead =
      if (disableSchema) """{"payload":"""
      else s"""{"schema":${keySchemaJson(serverName, t)},"payload":"""
    val valueHead =
      if (disableSchema) """{"payload":{"before":"""
      else s"""{"schema":${envelopeSchemaJson(serverName, t)},"payload":{"before":"""
    env
      .withColumn("_key", concat(
        lit(keyHead), concat(keyBody: _*), lit("}")))
      .withColumn("_value", concat(
        lit(valueHead),
        imageJson("before", t.cols),
        lit(""","after":"""), imageJson("after", t.cols),
        lit(""","source":"""), sourcePayload(serverName),
        lit(""","op":""""), op,
        lit("""","ts_ms":"""), tsMs,
        lit(""","transaction":null}}""")))
  }

  // ---------- DDL (schema-change) events ----------
  // dbzCodec.EncodeDDLEvent, codec.go:1223-1639: key is the
  // SchemaChangeKey (databaseName), value is the Debezium
  // schema-change payload — source block (connector "TiCDC"), the ddl
  // text, and a tableChanges array carrying the post-DDL table
  // definition. payload.ts_ms is pinned to the commit ms (the
  // reference stamps wall-clock nowFunc(); its own golden suite
  // ignores the field — same determinism rule as the row encoder's
  // source block above).

  private def jesc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  /** Debezium change type — the reference's DDL action-type switch
    * (codec.go:1237-1276) re-expressed over the statement class:
    * CREATE = create schema/table(s)/view; DROP = drop
    * schema/table/index/view + TRUNCATE; ALTER = every table-shape /
    * index / rename / partition change (note ADD INDEX is ALTER while
    * DROP INDEX is DROP, exactly as the reference maps them).
    * None = unsupported (ErrDDLUnsupportType — e.g. RECOVER TABLE). */
  def ddlChangeType(query: String): Option[String] = {
    val qn = query.trim.toLowerCase.replaceAll("\\s+", " ")
    if (qn.startsWith("create table") || qn.startsWith("create schema") ||
      qn.startsWith("create database") || qn.startsWith("create view"))
      Some("CREATE")
    else if (qn.startsWith("drop table") || qn.startsWith("drop schema") ||
      qn.startsWith("drop database") || qn.startsWith("drop index") ||
      qn.startsWith("drop view") || qn.startsWith("truncate table") ||
      qn.startsWith("truncate "))
      Some("DROP")
    else if (qn.startsWith("alter table") || qn.startsWith("alter database") ||
      qn.startsWith("alter schema") || qn.startsWith("rename table") ||
      qn.startsWith("create index") || qn.startsWith("create unique index"))
      Some("ALTER")
    else None
  }

  /** MySQL type → java.sql.Types code (MySQLType2JdbcType,
    * common/java.go:155-229). Note TINYINT maps to SMALLINT and text
    * types to VARCHAR, exactly as the reference does. */
  def jdbcTypeOf(c: MySqlCol): Int = c.base.toLowerCase match {
    case "tinyint" | "smallint" | "bool" | "boolean" => 5
    case "int" | "integer" | "mediumint" | "year" => 4
    case "float" => 6
    case "double" => 8
    case "decimal" | "numeric" => 3
    case "timestamp" => 2014
    case "datetime" => 93
    case "bigint" => -5
    case "date" => 91
    case "time" => 92
    case "enum" | "set" => 1
    case "text" | "tinytext" | "mediumtext" | "longtext" => 12
    case "blob" | "tinyblob" | "mediumblob" | "longblob" => 2004
    case "varchar" => 12
    case "varbinary" => -3
    case "char" => 1
    case "binary" => -2
    case "bit" => -7
    case "json" => 1111
    case "vector" => 1111
    case _ => 12
  }

  /** Default display length per type (mysql
    * GetDefaultFieldLengthAndDecimal) — getLen emits the declared flen
    * only when it differs (helper.go:190-220). */
  private def defaultFlen(base: String, unsigned: Boolean): Int = {
    val signed = base match {
      case "tinyint" => 4
      case "smallint" => 6
      case "mediumint" => 9
      case "int" | "integer" => 11
      case "bigint" => 20
      case "float" => 12
      case "double" => 22
      case "bit" => 1
      case _ => -999
    }
    if (unsigned && Set("tinyint", "smallint", "mediumint", "int", "integer")
      .contains(base)) signed - 1
    else signed
  }

  /** length field (getLen, helper.go:190-220): fsp for temporal
    * types, declared flen when non-default for numerics/strings,
    * 2n-1 / 1 for SET/ENUM, absent (-1 → null) otherwise. */
  def lengthOf(c: MySqlCol): Option[Int] = c.base.toLowerCase match {
    case "timestamp" | "time" | "datetime" =>
      if (c.dec >= 0) Some(c.dec) else None
    case b @ ("bit" | "varchar" | "char" | "bigint" | "float" | "double" | "vector" |
              "tinyint" | "smallint" | "mediumint" | "int" | "integer") =>
      if (c.flen > 0 && c.flen != defaultFlen(b, c.unsigned)) Some(c.flen) else None
    case "year" | "decimal" | "numeric" => if (c.flen > 0) Some(c.flen) else None
    case "set" => Some(2 * c.elems.size - 1)
    case "enum" => Some(1)
    case _ => None
  }

  /** scale field (getScale, helper.go:222-228): decimal/float/double
    * only. */
  def scaleOf(c: MySqlCol): Option[Int] = c.base.toLowerCase match {
    case "decimal" | "numeric" | "float" | "double" =>
      if (c.dec >= 0) Some(c.dec) else None
    case _ => None
  }

  /** typeName / typeExpression (getExpressionAndName,
    * helper.go:273-287): year/bit/varchar/char/decimal render the bare
    * upper-cased type; others append the non-default display suffix
    * and UNSIGNED flag. */
  def typeNameAndExpression(c: MySqlCol): (String, String) = {
    val base = c.base.toLowerCase
    val prefix = base.toUpperCase
    base match {
      case "year" | "bit" | "varchar" | "char" | "decimal" | "numeric" =>
        (prefix, prefix)
      case _ =>
        val suffix = base match {
          case "double" | "float" if c.dec >= 0 && c.flen > 0 =>
            s"(${c.flen},${c.dec})"
          case "vector" if c.flen > 0 => s"(${c.flen})"
          case "enum" | "set" =>
            c.elems.map(e => s"'${e}'").mkString("(", ",", ")")
          case b if c.flen > 0 && c.flen != defaultFlen(b, c.unsigned) =>
            s"(${c.flen})"
          case _ => ""
        }
        val un = if (c.unsigned) " UNSIGNED" else ""
        (prefix + un, prefix + suffix + un)
    }
  }

  /** charsetName (getCharset, helper.go:178-188): textual types carry
    * their charset; binary/numeric types render null. */
  def charsetNameOf(c: MySqlCol, defaultCharset: String): Option[String] =
    c.base.toLowerCase match {
      case "varchar" | "char" | "text" | "tinytext" | "mediumtext" |
           "longtext" | "enum" | "set" => Some(defaultCharset)
      case _ => None
    }

  /** Registry schema → MySqlTable for schema-change rendering: the
    * evolving store's live columns become the tableChanges definition
    * (the reference renders e.TableInfo, i.e. the POST-fold shape).
    * dataType strings parse as `base(flen[,dec])[ unsigned]`;
    * handle-col convention: the first column is the pk/handle
    * (SchemaStore.metaAsOf). */
  def tableFromRegistry(sch: graft.model.TableSchema): MySqlTable = {
    val typeRe = """(?i)^\s*(\w+)\s*(?:\((\d+)(?:\s*,\s*(\d+))?\))?(\s+unsigned)?""".r
    val cols = sch.columns.zipWithIndex.map { case (c, i) =>
      val m = typeRe.findFirstMatchIn(c.dataType)
      val base = m.map(_.group(1).toLowerCase).getOrElse("text")
      MySqlCol(c.name, base,
        flen = m.flatMap(x => Option(x.group(2))).map(_.toInt).getOrElse(-1),
        dec = m.flatMap(x => Option(x.group(3))).map(_.toInt).getOrElse(-1),
        unsigned = m.exists(_.group(4) != null),
        notNull = i == 0, pk = i == 0,
        default = c.default)
    }
    MySqlTable(sch.schema, sch.table, cols)
  }

  /** One tableChanges column object — payload field order per
    * codec.go:1377-1455. */
  def ddlColumnJson(c: MySqlCol, pos: Int, defaultCharset: String): String = {
    val (name, expr) = typeNameAndExpression(c)
    val dflt = c.default match {
      case Some(v) if v.equalsIgnoreCase("CURRENT_TIMESTAMP") =>
        "\"1970-01-01 00:00:00\"" // debezium temporal-default convention (codec.go:1396)
      case Some(v) => "\"" + jesc(v) + "\""
      case None => "null"
    }
    val enums =
      if (c.elems.nonEmpty)
        c.elems.map(e => s""""'${jesc(e)}'"""").mkString("[", ",", "]")
      else "null"
    s"""{"name":"${jesc(c.name)}","jdbcType":${jdbcTypeOf(c)},"nativeType":null,""" +
      s""""comment":null,"defaultValueExpression":$dflt,"enumValues":$enums,""" +
      s""""typeName":"$name","typeExpression":"$expr",""" +
      s""""charsetName":${charsetNameOf(c, defaultCharset).map("\"" + _ + "\"").getOrElse("null")},""" +
      s""""length":${lengthOf(c).map(_.toString).getOrElse("null")},""" +
      s""""scale":${scaleOf(c).map(_.toString).getOrElse("null")},""" +
      s""""position":${pos + 1},"optional":${!c.notNull},""" +
      s""""autoIncremented":${c.autoInc},"generated":${c.autoInc}}"""
  }

  /** The tableChanges `table` object (codec.go:1364-1455): charset,
    * primary-key names, columns (hidden columns skipped — the model
    * has none), comment. */
  def ddlTableBlockJson(t: MySqlTable, defaultCharset: String = "utf8mb4"): String = {
    val pks = (if (t.primaryOrder.nonEmpty) t.primaryOrder
               else t.pkCols.map(_.name))
      .map(n => "\"" + jesc(n) + "\"").mkString("[", ",", "]")
    val cols = t.cols.zipWithIndex
      .map { case (c, i) => ddlColumnJson(c, i, defaultCharset) }
      .mkString("[", ",", "]")
    s"""{"defaultCharsetName":"$defaultCharset","primaryKeyColumnNames":$pks,""" +
      s""""columns":$cols,"comment":null}"""
  }

  /** SchemaChangeKey (codec.go:1280-1300): payload first, then the
    * fixed key schema unless disabled. */
  def ddlKeyJson(db: String, disableSchema: Boolean = false): String = {
    val payload = s"""{"payload":{"databaseName":"${jesc(db)}"}"""
    if (disableSchema) payload + "}"
    else payload +
      ""","schema":{"type":"struct","name":"io.debezium.connector.mysql.SchemaChangeKey",""" +
      """"optional":false,"version":1,"fields":[{"field":"databaseName",""" +
      """"optional":false,"type":"string"}]}}"""
  }

  /** The (constant) SchemaChangeValue schema block
    * (codec.go:1460-1639). */
  private val schemaChangeValueSchemaJson: String = {
    def f(field: String, opt: Boolean, t: String) =
      s"""{"field":"$field","optional":$opt,"type":"$t"}"""
    val columnFields = Seq(
      f("name", opt = false, "string"), f("jdbcType", opt = false, "int32"),
      f("nativeType", opt = true, "int32"), f("typeName", opt = false, "string"),
      f("typeExpression", opt = true, "string"), f("charsetName", opt = true, "string"),
      f("length", opt = true, "int32"), f("scale", opt = true, "int32"),
      f("position", opt = false, "int32"), f("optional", opt = true, "boolean"),
      f("autoIncremented", opt = true, "boolean"), f("generated", opt = true, "boolean"),
      f("comment", opt = true, "string"), f("defaultValueExpression", opt = true, "string"),
      """{"field":"enumValues","optional":true,"type":"array",""" +
        """"items":{"type":"string","optional":false}}"""
    ).mkString(",")
    val tableFields =
      f("defaultCharsetName", opt = true, "string") + "," +
        """{"field":"primaryKeyColumnNames","optional":true,"type":"array",""" +
        """"items":{"type":"string","optional":false}},""" +
        s"""{"field":"columns","optional":false,"type":"array","items":{""" +
        s""""name":"io.debezium.connector.schema.Column","optional":false,""" +
        s""""type":"struct","version":1,"fields":[$columnFields]}},""" +
        f("comment", opt = true, "string")
    val changeFields =
      f("type", opt = false, "string") + "," + f("id", opt = false, "string") + "," +
        s"""{"field":"table","optional":true,"type":"struct",""" +
        s""""name":"io.debezium.connector.schema.Table","version":1,""" +
        s""""fields":[$tableFields]}"""
    s"""{"optional":false,"type":"struct","version":1,""" +
      s""""name":"io.debezium.connector.mysql.SchemaChangeValue","fields":[""" +
      s"""$sourceSchemaJson,""" +
      f("ts_ms", opt = false, "int64") + "," +
      f("databaseName", opt = true, "string") + "," +
      f("schemaName", opt = true, "string") + "," +
      f("ddl", opt = true, "string") + "," +
      s"""{"field":"tableChanges","optional":false,"type":"array","items":{""" +
      s""""name":"io.debezium.connector.schema.Change","optional":false,""" +
      s""""type":"struct","version":1,"fields":[$changeFields]}}]}"""
  }

  private def sanitize(s: String): String =
    s.replaceAll("[^a-zA-Z0-9._-]", "_")

  /** Debezium WATERMARK (checkpoint) messages
    * (dbzCodec.EncodeCheckpointEvent, codec.go:1645-1747): key is an
    * empty payload under the `<clusterId>.watermark.Key` schema; value
    * is a row-envelope-shaped payload with an empty-source block
    * carrying the resolved ts (`commit_ts`) and op "m". ts_ms fields
    * pin to the commit ms like everywhere else in this encoder. */
  def watermarkKeyJson(clusterId: String, disableSchema: Boolean = false): String =
    if (disableSchema) """{"payload":{}}"""
    else s"""{"payload":{},"schema":{"type":"struct",""" +
      s""""name":"${sanitize(clusterId)}.watermark.Key","optional":false,""" +
      s""""fields":[]}}"""

  def watermarkValueJson(clusterId: String, ts: Long,
                         disableSchema: Boolean = false): String = {
    val ms = ts / 1000000L
    val source =
      s"""{"version":"2.4.0.Final","connector":"TiCDC","name":"${jesc(clusterId)}",""" +
        s""""ts_ms":$ms,"snapshot":"false","db":"","table":"","server_id":0,""" +
        s""""gtid":null,"file":"","pos":0,"row":0,"thread":0,"query":null,""" +
        s""""commit_ts":$ts,"cluster_id":"${jesc(clusterId)}"}"""
    val payload =
      s"""{"source":$source,"ts_ms":$ms,"transaction":null,"op":"m"}"""
    if (disableSchema) s"""{"payload":$payload}"""
    else {
      val txnBlock =
        """{"type":"struct","fields":[""" +
          """{"type":"string","optional":false,"field":"id"},""" +
          """{"type":"int64","optional":false,"field":"total_order"},""" +
          """{"type":"int64","optional":false,"field":"data_collection_order"}],""" +
          """"optional":true,"name":"event.block","version":1,"field":"transaction"}"""
      val schema =
        s"""{"type":"struct","optional":false,""" +
          s""""name":"${sanitize(clusterId)}.watermark.Envelope","version":1,""" +
          s""""fields":[$sourceSchemaJson,""" +
          s"""{"type":"string","optional":false,"field":"op"},""" +
          s"""{"type":"int64","optional":true,"field":"ts_ms"},$txnBlock]}"""
      s"""{"payload":$payload,"schema":$schema}"""
    }
  }

  /** Schema-change value message. `tableBlock` is
    * [[ddlTableBlockJson]] of the POST-DDL table (None → table:null,
    * the DROP TABLE shape); `oldId` carries the pre-rename identity
    * for RENAME's two-part id. TRUNCATE and schema-level DDL render an
    * empty tableChanges array (codec.go:1331-1340). */
  def ddlValueJson(clusterId: String, db: String, table: String,
                   query: String, commitTs: Long, commitMs: Long,
                   tableBlock: Option[String],
                   oldId: Option[(String, String)] = None,
                   disableSchema: Boolean = false): String = {
    val changeType = ddlChangeType(query).getOrElse(
      throw new IllegalArgumentException(
        s"ErrDDLUnsupportType: unsupported debezium DDL: $query"))
    val qn = query.trim.toLowerCase
    val source =
      s"""{"version":"2.4.0.Final","connector":"TiCDC","name":"${jesc(clusterId)}",""" +
        s""""ts_ms":$commitMs,"snapshot":"false","db":"${jesc(db)}",""" +
        s""""table":"${jesc(table)}","server_id":0,"gtid":null,"file":"","pos":0,""" +
        s""""row":0,"thread":0,"query":null,"commit_ts":$commitTs,""" +
        s""""cluster_id":"${jesc(clusterId)}"}"""
    // the id is a quoted identifier INSIDE a JSON string, so the JSON
    // text carries backslash-escaped quotes: "id":"\"db\".\"tbl\""
    val idSelf = "\\\"" + jesc(db) + "\\\".\\\"" + jesc(table) + "\\\""
    val changes =
      if (table.isEmpty || qn.startsWith("truncate")) "[]"
      else if (qn.startsWith("drop table"))
        s"""[{"type":"$changeType","id":"$idSelf","table":null}]"""
      else {
        val id = oldId match {
          case Some((os, ot)) if qn.startsWith("rename table") =>
            "\\\"" + jesc(os) + "\\\".\\\"" + jesc(ot) + "\\\"," + idSelf
          case _ => idSelf
        }
        val tbl = tableBlock.getOrElse("null")
        s"""[{"type":"$changeType","id":"$id","table":$tbl}]"""
      }
    val payload =
      s"""{"source":$source,"ts_ms":$commitMs,"databaseName":"${jesc(db)}",""" +
        s""""schemaName":null,"ddl":"${jesc(query)}","tableChanges":$changes}"""
    if (disableSchema) s"""{"payload":$payload}"""
    else s"""{"payload":$payload,"schema":$schemaChangeValueSchemaJson}"""
  }
}
