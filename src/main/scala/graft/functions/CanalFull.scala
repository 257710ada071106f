package graft.functions

import graft.model.MySqlDdl.{MySqlCol, MySqlTable}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Full-fidelity canal-JSON encoder — the reference's JSONMessage
  * layout (pkg/sink/codec/canal/canal_json_message.go:40-61) with the
  * per-type value/sqlType semantics of formatColumnValue
  * (canal/helper.go:94-205) and mysqlType2JavaType (helper.go:37-92),
  * driven by a [[MySqlTable]] column model.
  *
  * Contract mirrored from the Go encoder (canal_json_encoder.go):
  *  - field order: id, database, table, pkNames, isDdl, type, es, ts,
  *    sql, sqlType, mysqlType, then old before data
  *  - `es` = commit TSO >> 18 (physical ms — convertToCanalTs,
  *    helper.go:207); `ts` = build time, ignored by consumers
  *  - every data/old value is a JSON string (or null): ints as decimal
  *    strings, ENUM as its 1-based index, SET as its bitmask value,
  *    BIT as unsigned decimal, DECIMAL canonical at declared scale,
  *    date/datetime/timestamp/time in MySQL literal form at fsp,
  *    binary-flagged values as the ISO-8859-1 char view of the bytes
  *  - sqlType: java.sql.Types codes with the value-dependent unsigned
  *    promotions (TINYINT>127 → SMALLINT, SMALLINT>32767 → INTEGER,
  *    INT>MaxInt32 → BIGINT, BIGINT>MaxInt64 → DECIMAL;
  *    helper.go:143-186)
  *  - mysqlType: lowercase base name, `+" unsigned"` except bit/year
  *    (common/helper.go:38-62, fullType=false)
  *  - update `old` carries ALL pre-image columns
  *    (only_output_updated_columns=false default)
  *
  * Documented divergences (semantic content identical, formatting
  * differs): JSON column values re-render through Spark's variant
  * parser (compact separators; TiDB prints `"key": value` with
  * spaces); float/double formatting follows Java shortest-round-trip,
  * which switches to scientific notation beyond 1e7 where Go's
  * FormatFloat('f') never does.
  */
object CanalFull {

  private def q(c: Column): Column =
    concat(lit("\""), Codecs.jsonEscape(c), lit("\""))

  /** Rounded total microseconds of a TIME literal at fsp (shared shape
    * with DebeziumFull — MySQL rounds the fractional part half-up). */
  private def timeMicros(raw: Column, fsp: Int): Column = {
    val sign = when(raw.startsWith("-"), -1L).otherwise(1L)
    val body = regexp_replace(raw, "^-", "")
    // nullif guards the ANSI cast: a non-TIME literal extracts ""
    // and must render null, not kill the batch
    val h = nullif(regexp_extract(body, "^(\\d+):", 1), lit("")).cast("long")
    val m = nullif(regexp_extract(body, "^\\d+:(\\d+)", 1), lit("")).cast("long")
    val sec = nullif(regexp_extract(body, "^\\d+:\\d+:(\\d+)", 1), lit("")).cast("long")
    val fracUs = coalesce(rpad(regexp_extract(body, "\\.(\\d+)$", 1), 6, "0").cast("long"), lit(0L))
    val unit = math.pow(10, 6 - fsp).toLong
    val rounded = if (unit <= 1) fracUs
      else (fracUs + lit(unit / 2)).cast(DecimalType(38, 0)).divide(lit(unit)).cast("long") * lit(unit)
    sign * ((h * 3600L + m * 60L + sec) * 1000000L + rounded)
  }

  private def idiv(n: Column, d: Long): Column =
    (n.cast(DecimalType(38, 0)) / lit(d)).cast("long")

  /** Datetime/timestamp → MySQL literal string at fsp
    * ("yyyy-MM-dd HH:mm:ss[.ffffff]", fixed-width fraction). */
  private def dtString(raw: Column, fsp: Int): Column = {
    val us0 = unix_micros(try_to_timestamp(raw))
    val unit = math.pow(10, 6 - fsp).toLong
    val us = if (unit <= 1) us0 else idiv(us0 + lit(unit / 2), unit) * lit(unit)
    val base = date_format(timestamp_micros(us), "yyyy-MM-dd HH:mm:ss")
    if (fsp > 0)
      concat(base, lit("."),
        substring(lpad(pmod(us, lit(1000000L)).cast("string"), 6, "0"), 1, fsp))
    else base
  }

  /** The UNQUOTED canonical literal string for one column's raw
    * value — what [[valueToken]] JSON-quotes, and what the e2e row
    * checksum ([[RowChecksum]]) folds for the varchar class. Binary-
    * flagged types are not string-canonical; use [[binaryBytes]]. */
  def canonicalLiteral(c: MySqlCol, raw: Column): Column = c.base match {
    case "bit" => raw.cast(DecimalType(20, 0)).cast("string")
    case "tinyint" | "smallint" | "mediumint" | "int" | "bigint" | "year" =>
      // unsigned values are non-negative; decimal domain covers 2^64-1
      raw.cast(DecimalType(20, 0)).cast("string")
    case "float" => raw.cast("float").cast("string")
    case "double" => raw.cast("double").cast("string")
    case "decimal" =>
      val p = if (c.flen > 0) c.flen else 10
      val s = if (c.dec > 0) c.dec else 0
      raw.cast(DecimalType(p, s)).cast("string")
    case "enum" =>
      // MySQL enum value = 1-based index; invalid stored value = 0
      array_position(typedlit(c.elems), raw).cast("string")
    case "set" => setMask(c, raw).cast("string")
    case "date" => date_format(try_to_date(raw), "yyyy-MM-dd")
    case "datetime" | "timestamp" => dtString(raw, c.fsp)
    case "time" =>
      val us = timeMicros(raw, c.fsp)
      val au = abs(us)
      val h = idiv(au, 3600000000L)
      val m = pmod(idiv(au, 60000000L), lit(60L))
      val s = pmod(idiv(au, 1000000L), lit(60L))
      val frac =
        if (c.fsp > 0)
          concat(lit("."), substring(lpad(pmod(au, lit(1000000L)).cast("string"), 6, "0"), 1, c.fsp))
        else lit("")
      concat(when(us < 0, "-").otherwise(""),
        lpad(h.cast("string"), 2, "0"), lit(":"),
        lpad(m.cast("string"), 2, "0"), lit(":"),
        lpad(s.cast("string"), 2, "0"), frac)
    case "json" =>
      // divergence: compact separators (TiDB prints `"k": v`)
      to_json(try_parse_json(raw))
    case "vector" => vectorToken(raw)
    case _ => raw // char/varchar/text family: the text itself
  }

  /** SET bitmask value (1-based member positions; any invalid member →
    * 0, MySQL's invalid-stored-value rendering). */
  def setMask(c: MySqlCol, raw: Column): Column = {
    val members = split(raw, ",")
    val allValid = forall(members, m => m.isin(c.elems: _*))
    val mask = aggregate(members, lit(0L),
      (acc, m) => acc + call_function("shiftleft",
        lit(1L), (array_position(typedlit(c.elems), m) - 1).cast("int")))
    when(allValid, mask).otherwise(lit(0L))
  }

  /** The rendered JSON token (quoted string or null) for one column's
    * canonical raw literal. */
  def valueToken(c: MySqlCol, raw: Column): Column = {
    val rendered: Column =
      if (c.isBinary) CharsetExpressions.canalBlobJson(paddedBytes(c, raw))
      else q(canonicalLiteral(c, raw))
    coalesce(rendered, lit("null"))
  }

  /** The byte view of a binary-flagged column's raw literal (0xHEX or
    * text), BINARY(n) zero-padded to its declared length. */
  def binaryBytes(c: MySqlCol, raw: Column): Column = paddedBytes(c, raw)

  /** TiDB VectorFloat32.String() rendering of a bracket-literal
    * VECTOR(n) value (tidb types/vector: each element
    * strconv.FormatFloat 'g' at 32-bit): float32-parsed, shortest
    * form, integral values carry no ".0" (so '2.0' → "2").
    * Divergence (documented): |v| ≥ 1e7 renders scientific here where
    * Go 'g' switches at different exponents — no fixture value hits
    * that range. */
  def vectorToken(raw: Column): Column = {
    val elems = filter(split(regexp_replace(raw, "[\\[\\]\\s]", ""), ","),
      e => length(e) > 0)
    val toks = transform(elems,
      e => regexp_replace(e.cast("float").cast("string"), "\\.0$", ""))
    concat(lit("["), array_join(toks, ","), lit("]"))
  }

  private def paddedBytes(c: MySqlCol, raw: Column): Column = {
    val b = when(raw.startsWith("0x"), unhex(substring(raw, 3, 1 << 24)))
      .otherwise(raw.cast("binary"))
    if (c.base == "binary" && c.flen > 0)
      call_function("rpad", b, lit(c.flen), lit(Array[Byte](0)))
    else b
  }

  /** java.sql.Types code for one column, with the value-dependent
    * unsigned promotions (helper.go:143-186). `raw` = the data-image
    * value the reference derives javaTypeMap from. */
  def sqlTypeCode(c: MySqlCol, raw: Column): Column = {
    def const(n: Int) = lit(n)
    c.base match {
      case "bit" | "set" => const(-7)
      case "tinyblob" | "mediumblob" | "longblob" | "blob" =>
        const(if (c.isBinary) 2004 else 2005)
      case "tinytext" | "text" | "mediumtext" | "longtext" => const(2005)
      case "varchar" => const(12)
      case "varbinary" => const(2004)
      case "char" => const(1)
      case "binary" => const(2004)
      case "enum" => const(4)
      case "date" => const(91)
      case "datetime" | "timestamp" => const(93)
      case "time" => const(92)
      case "json" | "year" => const(12)
      case "decimal" => const(3)
      case "vector" => const(12) // TypeTiDBVectorFloat32 → VARCHAR (java.go:146)
      case "mediumint" => const(4)
      case "float" => const(7)
      case "double" => const(8)
      case "tinyint" =>
        if (!c.unsigned) const(-6)
        else when(raw.cast("long") > 127L, 5).otherwise(-6)
      case "smallint" =>
        if (!c.unsigned) const(5)
        else when(raw.cast("long") > 32767L, 4).otherwise(5)
      case "int" =>
        if (!c.unsigned) const(4)
        else when(raw.cast("long") > 2147483647L, -5).otherwise(4)
      case "bigint" =>
        if (!c.unsigned) const(-5)
        else when(raw.cast(DecimalType(20, 0)) >
          lit(BigDecimal("9223372036854775807").underlying()), 3).otherwise(-5)
      case _ => const(12)
    }
  }

  /** mysqlType string (common/helper.go GetMySQLType): the short form
    * — lowercase base, " unsigned" suffix except bit/year — by
    * default; the FULL TiDB type description (display length / fsp /
    * element list) when `contentCompatible` is on, the canal
    * content-compatible mode (sink.go:169-170, encoder passes
    * config.ContentCompatible as GetMySQLType's fullType —
    * canal_json_content_compatible / adapter-compatibility
    * scenarios). */
  def mysqlTypeName(c: MySqlCol, contentCompatible: Boolean = false): String =
    if (contentCompatible) c.typeDesc
    else {
      val base = c.base
      if (c.unsigned && base != "bit" && base != "year") s"$base unsigned" else base
    }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case ch if ch < ' ' => "\\u%04x".format(ch.toInt)
      case ch => ch.toString
    } + "\""

  /** Map object over per-column value tokens, e.g. `[{"id":"1",...}]`
    * (canal data/old are single-element arrays). */
  private def imageArray(img: String, cols: Seq[MySqlCol]): Column = {
    val body = cols.zipWithIndex.flatMap { case (c, i) =>
      val sep = if (i == 0) "[{" else ","
      Seq(lit(sep + jsonStr(c.name) + ":"), valueToken(c, col(s"$img.${c.name}")))
    } :+ lit("}]")
    when(col(img).isNull, lit("null")).otherwise(concat(body: _*))
  }

  /** Canal EventType for a DDL statement (helper.go:211-244
    * convertDdlEventType, keyed here off the statement head since the
    * action classes map 1:1 onto it for the statement surface the
    * parser accepts). */
  def ddlEventType(query: String): String = {
    val q = query.trim.toUpperCase.replaceAll("\\s+", " ")
    if (q.startsWith("CREATE TABLE")) "CREATE"
    else if (q.startsWith("RENAME TABLE")) "RENAME"
    else if (q.startsWith("DROP TABLE")) "ERASE"
    else if (q.startsWith("TRUNCATE")) "TRUNCATE"
    else if (q.startsWith("DROP INDEX") ||
      (q.startsWith("ALTER TABLE") && q.contains(" DROP INDEX"))) "DINDEX"
    else if (q.startsWith("CREATE INDEX") ||
      (q.startsWith("ALTER TABLE") && (q.contains(" ADD INDEX") ||
        q.contains(" ADD PRIMARY KEY") || q.contains(" ADD FOREIGN KEY") ||
        q.contains(" ADD UNIQUE")))) "CINDEX"
    else if (q.startsWith("ALTER TABLE")) "ALTER"
    else "QUERY" // CREATE/DROP DATABASE, views, sequences, ... (canal QUERY)
  }

  /** DDL message — json.Marshal of JSONMessage (struct-tag order,
    * canal_json_encoder.go:384-404): row-level maps are null, `sql`
    * carries the query, `_tidb.commitTs` when the TiDB extension is
    * on. */
  def ddlMessage(schema: String, table: String, query: String, tso: Long,
                 buildTsMs: Long = 0L, tidbExtension: Boolean = false): String = {
    val ext = if (tidbExtension) s""","_tidb":{"commitTs":$tso}""" else ""
    s"""{"id":0,"database":${jsonStr(schema)},"table":${jsonStr(table)},""" +
      s""""pkNames":null,"isDdl":true,"type":"${ddlEventType(query)}",""" +
      s""""es":${tso >> 18},"ts":$buildTsMs,"sql":${jsonStr(query)},""" +
      s""""sqlType":null,"mysqlType":null,"data":null,"old":null$ext}"""
  }

  /** Checkpoint/watermark message (newJSONMessage4CheckpointEvent,
    * canal_json_encoder.go:407-420): type TIDB_WATERMARK, empty
    * schema/table, `_tidb.watermarkTs` — only emitted with the TiDB
    * extension, like the reference. */
  def watermarkMessage(ts: Long, buildTsMs: Long = 0L): String =
    s"""{"id":0,"database":"","table":"","pkNames":null,"isDdl":false,""" +
      s""""type":"TIDB_WATERMARK","es":${ts >> 18},"ts":$buildTsMs,"sql":"",""" +
      s""""sqlType":null,"mysqlType":null,"data":null,"old":null,""" +
      s""""_tidb":{"watermarkTs":$ts}}"""

  /** Encode DML envelope rows (`before`/`after` structs of canonical
    * raw literals, `_op` I/U/D, `_schema`/`_table`, `_tso` commit TSO)
    * into full canal-JSON messages. `tidbExtension` appends the
    * `_tidb:{commitTs}` block (canal_json_encoder.go:316-321). */
  def encode(env: DataFrame, t: MySqlTable, buildTsMs: Long = 0L,
             tidbExtension: Boolean = false,
             contentCompatible: Boolean = false): DataFrame = {
    val typ = when(col("_op") === "I", "INSERT")
      .when(col("_op") === "U", "UPDATE").otherwise("DELETE")
    val dataImg = when(col("_op") === "D", lit("before")).otherwise(lit("after"))
    val pkNames = t.pkCols.map(c => jsonStr(c.name)).mkString("[", ",", "]")
    val mysqlTypes = t.cols
      .map(c => jsonStr(c.name) + ":" + jsonStr(mysqlTypeName(c, contentCompatible)))
      .mkString("{", ",", "}")
    // sqlType derives from the data image (after, pre-image for deletes)
    val dataRaw: MySqlCol => Column = c =>
      when(col("_op") === "D", col(s"before.${c.name}")).otherwise(col(s"after.${c.name}"))
    val sqlTypes = concat(t.cols.zipWithIndex.flatMap { case (c, i) =>
      val sep = if (i == 0) "{" else ","
      Seq(lit(sep + jsonStr(c.name) + ":"), sqlTypeCode(c, dataRaw(c)).cast("string"))
    } :+ lit("}"): _*)
    val dataArr = when(col("_op") === "D", imageArray("before", t.cols))
      .otherwise(imageArray("after", t.cols))
    val oldArr = when(col("_op") === "U", imageArray("before", t.cols)).otherwise(lit("null"))
    val ext: Column =
      if (tidbExtension) concat(lit(""","_tidb":{"commitTs":"""), col("_tso"), lit("}"))
      else lit("")
    env.withColumn("_value", concat(
      lit("{\"id\":0,\"database\":"), q(col("_schema")),
      lit(",\"table\":"), q(col("_table")),
      lit(s""",\"pkNames\":$pkNames,\"isDdl\":false,\"type\":\""""), typ,
      lit("\",\"es\":"), shiftright(col("_tso"), 18),
      lit(s""",\"ts\":$buildTsMs,\"sql\":\"\",\"sqlType\":"""), sqlTypes,
      lit(s""",\"mysqlType\":$mysqlTypes,\"old\":"""), oldArr,
      lit(",\"data\":"), dataArr,
      ext,
      lit("}")))
  }
}
