package graft.operators

import graft.model.TiKvCodec
import graft.model.TiKvCodec._
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** The byte-level mount step (SURVEY §2.1 "KV→row decode"): turn raw
  * TiKV change entries — `(key, value, old_value, op_type, start_ts,
  * commit_ts)`, the reference's `RawKVEntry` shape
  * (pkg/common/kv_entry.go:53-70) — into typed Envelope rows, decoding
  * the actual TiKV bytes with [[graft.model.TiKvCodec]] the way
  * pkg/common/event/mounter.go:45-120 does with
  * tablecodec/rowcodec:
  *
  *  - the handle comes from the KEY, not the value (mounter.go:71
  *    `DecodeRowKey`; codec.go:93 `DecodeHandleToDatumMap`),
  *  - v2 (first byte ≥128) and v1 row values both decode
  *    (codec.go:86 `IsNewFormat` dispatch),
  *  - columns missing from the value get the column default, else
  *    the type's zero value when NOT NULL, else NULL (mounter
  *    defaults, chunk.go:182 `getDefaultOrZeroValue`),
  *  - `op_type=delete` → D with the before-image from `old_value`;
  *    a put carrying an old_value → U; a bare put → I
  *    (row_change.go:64-78 image rules).
  *
  * Decoding is per-row imperative byte parsing with a per-partition
  * reusable decoder — the one place `mapPartitions` beats an
  * Expression, because the column layout is data-dependent (IDs and
  * order live inside each value). Partition-parallel, no shuffle: the
  * mount is a map over the change-log scan exactly as the reference
  * decodes on the event-service scan path.
  */
/** The reference's ErrCorruptedDataMutation: an integrity-enabled
  * changefeed at corruption-handle-level `error` fails on the first
  * corrupted row (mounter.go:106,130). Carries the CDC error-class
  * prefix so FeedBackoff classifies it. */
final class CorruptedDataMutationException(detail: String)
  extends RuntimeException(s"CDC:ErrCorruptedDataMutation $detail")

object RawKvMounter {

  /** A record key: 't' + 8-byte table ID + "_r" — index keys
    * ("_i") and meta keys are not row changes and must be DROPPED,
    * not decoded (the reference skips them, mounter.go:75;
    * tablecodec's record/index prefix split). */
  private def isRecordKey(key: Array[Byte]): Boolean =
    key != null && key.length >= 11 && key(0) == 't' &&
      key(9) == '_' && key(10) == 'r'

  /** One column of a table's KV schema. `sqlType` is the MySQL type
    * ("bigint", "varchar(64)", "decimal(12,2)", …). */
  /** `virtualGen`: a VIRTUAL GENERATED column — never stored in the
    * row value; the mounter appends NULL and downstream expression
    * filters evaluate it on demand (expr_filter.go:323
    * buildRowWithVirtualColumns; chunk decode appends null for
    * IsVirtualGenerated, chunk.go:108-110). */
  /** `charset`: the column's DECLARED MySQL character set. For
    * TiDB-format sources (the default dialect) this is metadata only:
    * TiDB converts non-utf8 string data to utf8mb4 BEFORE storage, so
    * the row bytes a GBK-declared char/varchar/text column carries are
    * already UTF-8 and the reference's mounter does NO transcoding —
    * its GBK matrix (pkg/common/event/mounter_test.go:729-739;
    * tests/integration_tests/charset_gbk) mounts the text directly
    * while blob-class columns keep raw bytes. Transcoding only applies
    * under the `mysql-native` source dialect (see [[KvTableMeta]]),
    * where the stored bytes genuinely live in the column charset. */
  /** `collation`: a case/accent-insensitive collation name
    * ("utf8mb4_general_ci", "utf8_general_ci", "utf8mb4_unicode_ci")
    * marks a NEW-COLLATION column: its common-handle KEY bytes are the
    * collator's SORT KEY (not restorable), and its real value rides
    * the row value as restore data — the tablecodec layout the
    * reference's ci_collation_compatibility scenario exercises. Empty
    * = binary semantics (key bytes are the value bytes). */
  final case class KvColumn(id: Long, name: String, sqlType: String,
                            unsigned: Boolean = false, nullable: Boolean = true,
                            default: Option[String] = None,
                            virtualGen: Boolean = false,
                            charset: String = "",
                            collation: String = "") {
    def caseInsensitive: Boolean = collation.toLowerCase.endsWith("_ci")
  }

  /** Code points whose MySQL utf8mb4_general_ci weight diverges from
    * the JDK's Character.toUpperCase: general_ci's table is frozen
    * (derived from Unicode ~4.0 simple case folding with MySQL-specific
    * entries), while the JDK tracks current Unicode. The documented
    * divergences compare-equal to a LATIN letter in MySQL but
    * upper-case to themselves (or to something else) in Java:
    *  - U+00DF ß  → weight 'S' (general_ci compares ß = s; toUpperCase
    *    keeps ß),
    *  - U+0130 İ  (dotted capital I) → 'I' (general_ci folds both
    *    Turkish i-variants to the base letter; toUpperCase keeps İ).
    * Code points added to Unicode AFTER MySQL's table froze (e.g.
    * U+1E9E ẞ) take MySQL's fallback weight = the code point itself,
    * which the JDK path already yields when toUpperCase is identity;
    * ones where a LATER Unicode version added a case mapping are
    * outside the byte-identity claim — see the caveat below. */
  private val generalCiExceptions: Map[Int, Int] = Map(
    0x00DF -> 'S', 0x0130 -> 'I')

  /** general_ci sort key: one 2-byte big-endian weight per rune —
    * the Unicode simple-uppercase mapping for BMP runes, 0xFFFD for
    * supplementary-plane runes (MySQL utf8mb4_general_ci's plane-0
    * rule, which TiDB reproduces), with MySQL's documented
    * divergences from the JDK mapping pinned explicitly
    * ([[generalCiExceptions]]). unicode_ci's full UCA weights are
    * out of scope; general_ci covers the compatibility scenario. Two
    * strings equal under the collation produce identical key bytes,
    * which is exactly the identity/conflict semantics the record key
    * carries.
    *
    * Compatibility claim, stated precisely: byte identity with real
    * TiKV holds for ASCII, Latin-1/Latin-Extended letters, and every
    * BMP rune whose simple-uppercase mapping predates Unicode 4.0;
    * runes whose case mappings were ADDED to Unicode later (e.g.
    * Glagolitic, Deseret additions) may weight differently than
    * MySQL's frozen table and are excluded from the claim. */
  def generalCiSortKey(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length * 2)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val w =
        if (cp > 0xFFFF) 0xFFFD
        else generalCiExceptions.getOrElse(cp, Character.toUpperCase(cp) & 0xFFFF)
      out.write((w >> 8) & 0xff); out.write(w & 0xff)
      i += Character.charCount(cp)
    }
    out.toByteArray
  }

  /** Table metadata for the mount: which physical table ID maps to
    * which (schema, table) and columns; `handleCol` names the int-pk
    * column materialized from the record key. A clustered non-int
    * (common-handle) PK lists its columns in key order via
    * `handleCols`; a PARTITIONED table lists its per-partition
    * physical IDs in `physicalIds` — every partition's records mount
    * to the one logical table, the physical→logical mapping the
    * reference does via `DecodeTableID` returning physicalTableID
    * (mounter.go:191) resolved through TableInfo. */
  /** `dialect`: the byte provenance of string cells. `"tidb"` (the
    * default and the reference's only mode) — string bytes are always
    * utf8mb4 regardless of declared column charset, so the mount never
    * transcodes (mounter.go does none; mounter_test.go GBK matrix).
    * `"mysql-native"` — the bytes were produced by a MySQL-native
    * writer and live in the DECLARED column charset; the mount
    * transcodes gbk/gb18030/latin1(→cp1252, MySQL's real latin1) to
    * UTF-8 on decode and writes column-charset bytes on encode. */
  final case class KvTableMeta(tableId: Long, schema: String, table: String,
                               columns: Seq[KvColumn], handleCol: String,
                               moreHandleCols: Seq[String] = Nil,
                               physicalIds: Seq[Long] = Nil,
                               tz: String = "UTC",
                               dialect: String = "tidb") {
    /** The full handle column list, key order. */
    def handleCols: Seq[String] = handleCol +: moreHandleCols
    /** All physical table IDs whose records belong to this table. */
    def allIds: Set[Long] = (tableId +: physicalIds).toSet
    /** The changefeed time zone TIMESTAMP columns render in. */
    def zoneId: java.time.ZoneId = java.time.ZoneId.of(tz)
  }

  private def base(sqlType: String): String = {
    val t = sqlType.toLowerCase
    val p = t.indexOf('(')
    // first token only: "text CHARACTER SET gbk" → "text"
    (if (p < 0) t else t.substring(0, p)).trim.takeWhile(!_.isWhitespace)
  }

  /** String-class base types whose stored bytes are in the column
    * charset (blob/binary classes are charset `binary` by definition
    * and never transcode). */
  private val charClass = Set(
    "char", "varchar", "text", "tinytext", "mediumtext", "longtext")

  private val charsetRe = "(?i)(?:character\\s+set|charset)\\s+(\\w+)".r

  /** The column's charset: the explicit field, else one embedded in
    * the raw MySQL type text ("varchar(128) CHARACTER SET gbk") — the
    * form a registry meta built from DDL query text carries. */
  private def effectiveCharset(c: KvColumn): String =
    if (c.charset.nonEmpty) c.charset
    else charsetRe.findFirstMatchIn(c.sqlType).map(_.group(1)).getOrElse("")

  /** The transcoding charset for a string column — ALWAYS None under
    * the default `tidb` dialect (TiDB stores utf8mb4 bytes whatever
    * the declared charset; the reference mounter never transcodes).
    * Under `mysql-native`, None when the declared charset is already
    * a UTF-8 subset (utf8/utf8mb4/ascii); MySQL charset names map to
    * their JVM equivalents — note MySQL `latin1` is really cp1252
    * (windows-1252), not ISO-8859-1. Anything else passes through to
    * Charset.forName so future charsets fail loudly, not silently. */
  private def transcoder(meta: KvTableMeta,
                         c: KvColumn): Option[java.nio.charset.Charset] =
    if (meta.dialect != "mysql-native") None
    else effectiveCharset(c).toLowerCase match {
      case "" | "utf8" | "utf8mb4" | "ascii" | "binary" => None
      case "gbk" => Some(java.nio.charset.Charset.forName("GBK"))
      case "gb18030" => Some(java.nio.charset.Charset.forName("GB18030"))
      case "latin1" => Some(java.nio.charset.Charset.forName("windows-1252"))
      case other => Some(java.nio.charset.Charset.forName(other))
    }

  /** Spark-side type for a column (the envelope payload field type).
    * Unsigned BIGINT carries as DECIMAL(20,0) — values above
    * Long.MaxValue are real (the reference renders u64; the SQL-model
    * path already carries unsigned BIGINT this way), so LongType would
    * surface them as wrapped negatives. Narrower unsigned ints fit a
    * Long exactly. */
  def sparkType(c: KvColumn): DataType = base(c.sqlType) match {
    case "bigint" if c.unsigned => DecimalType(20, 0)
    case "tinyint" | "smallint" | "mediumint" | "int" | "bigint" | "year" |
         "bit" | "time" => LongType
    case "float" | "double" => DoubleType
    case "decimal" | "numeric" =>
      val spec = """\((\d+)\s*,\s*(\d+)\)""".r.findFirstMatchIn(c.sqlType)
      spec.map(m => DecimalType(m.group(1).toInt, m.group(2).toInt))
        .getOrElse(DecimalType(10, 0))
    case "blob" | "binary" | "varbinary" | "tinyblob" | "mediumblob" | "longblob" =>
      BinaryType
    case _ => StringType // char-class, enum/set names, temporal canonical
  }

  /** chunk.go:182 getDefaultOrZeroValue: declared default, else NULL
    * when nullable, else the type's zero value. */
  def defaultValue(c: KvColumn): Any = {
    val b = base(c.sqlType)
    c.default match {
      case Some(d) => sparkType(c) match {
        case LongType => d.toLong
        case DoubleType => d.toDouble
        case _: DecimalType => new java.math.BigDecimal(d)
        case BinaryType => d.getBytes("UTF-8")
        case _ => d
      }
      case None if c.nullable => null
      case None => sparkType(c) match {
        case LongType => 0L
        case DoubleType => 0.0
        case _: DecimalType => java.math.BigDecimal.ZERO
        case BinaryType => Array.empty[Byte]
        case _ if b == "date" => "0000-00-00"
        case _ if b == "datetime" || b == "timestamp" => "0000-00-00 00:00:00"
        case _ => ""
      }
    }
  }

  /** Decode one row value (v1 or v2) + key handle into payload values
    * ordered as `meta.columns`. */
  private def decodeImage(meta: KvTableMeta, handle: Handle,
                          value: Array[Byte]): Array[Any] = {
    if (value == null || value.isEmpty) return null
    val v2 = if (TiKvCodec.isNewFormat(value)) Some(TiKvCodec.decodeV2(value)) else None
    val v1 = if (v2.isEmpty) TiKvCodec.decodeV1(value) else Map.empty[Long, Datum]
    // handle columns come from the KEY (DecodeHandleToDatumMap):
    // position in handleCols = position in the common handle's datum
    // list; an int handle is the single pk column's value
    val handleVals: Map[String, Any] = handle match {
      case IntHandle(h) => Map(meta.handleCol -> h)
      case CommonHandle(ds) =>
        meta.handleCols.zip(ds).map { case (name, d) =>
          val v = d match {
            case DInt(x) => x
            case DUint(x) => x
            case DFloat(x) => x
            case DBytes(x) =>
              // a string PK's key bytes follow the source dialect too
              val cs = meta.columns.find(_.name == name)
                .flatMap(transcoder(meta, _))
                .getOrElse(java.nio.charset.StandardCharsets.UTF_8)
              new String(x, cs)
            case DDecimal(x) => x
            case other => throw new IllegalArgumentException(s"bad handle $other")
          }
          name -> v
        }.toMap
    }
    meta.columns.map { c =>
      if (c.virtualGen) null // never stored; evaluated downstream
      else if (handleVals.contains(c.name)) {
        // RESTORE DATA wins over the key bytes: a new-collation
        // (CI) handle column's key carries the collator's sort key,
        // not the value — TiDB then keeps the real value in the row
        // value, and a cell's presence for a handle column means
        // exactly that (tablecodec restore data;
        // ci_collation_compatibility scenario)
        val restored: Option[Any] = v2.flatMap(_.cell(c.id)).map { cell =>
          val bt = base(c.sqlType)
          transcoder(meta, c) match {
            case Some(cs) if charClass(bt) => new String(cell, cs)
            case _ => TiKvCodec.decodeCell(cell, bt, c.unsigned)
          }
        }.orElse(v1.get(c.id).collect {
          case d if d != DNull => datumValue(d, base(c.sqlType))
        })
        normalize(restored.getOrElse(handleVals(c.name)), c)
      } else {
        val bt = base(c.sqlType)
        v2 match {
          case Some(row) =>
            row.cell(c.id) match {
              case Some(cell) =>
                val v = transcoder(meta, c) match {
                  // mysql-native dialect only: string cell stored in
                  // the column charset (blob-class stays raw via
                  // decodeCell); tidb dialect decodes UTF-8 directly
                  case Some(cs) if charClass(bt) => new String(cell, cs)
                  case _ => TiKvCodec.decodeCell(cell, bt, c.unsigned)
                }
                val shifted =
                  if (bt == "timestamp" && meta.tz != "UTC")
                    graft.model.PackedTime.unpackInZone(
                      TiKvCodec.uintCellDecode(cell), meta.zoneId)
                  else v
                normalize(shifted, c)
              case None if row.isNull(c.id) => null
              case None => defaultValue(c)
            }
          case None =>
            v1.get(c.id) match {
              case Some(DNull) => null
              case Some(d) =>
                // the changefeed-tz shift applies to v1 TIMESTAMPs too
                // (the reference threads tz through decodeRowV1 →
                // unflatten); DATETIME stays zone-naive
                val v0 = d match {
                  case DInt(x) if bt == "timestamp" && meta.tz != "UTC" =>
                    graft.model.PackedTime.unpackInZone(x, meta.zoneId)
                  case DUint(x) if bt == "timestamp" && meta.tz != "UTC" =>
                    graft.model.PackedTime.unpackInZone(x, meta.zoneId)
                  case DBytes(x)
                      if charClass(bt) && transcoder(meta, c).isDefined =>
                    new String(x, transcoder(meta, c).get) // v1, mysql-native
                  case other => datumValue(other, bt)
                }
                normalize(v0, c)
              case None => defaultValue(c)
            }
        }
      }
    }.toArray
  }

  private def datumValue(d: Datum, baseType: String): Any = d match {
    case DInt(v) =>
      if (baseType == "datetime" || baseType == "timestamp")
        graft.model.PackedTime.unpack(v)
      else if (baseType == "date") graft.model.PackedTime.unpackDate(v)
      else v
    case DUint(v) =>
      if (baseType == "datetime" || baseType == "timestamp")
        graft.model.PackedTime.unpack(v)
      else if (baseType == "date") graft.model.PackedTime.unpackDate(v)
      else v
    case DFloat(v) => v
    case DBytes(v) =>
      if (baseType.endsWith("blob") || baseType == "binary" || baseType == "varbinary") v
      else new String(v, "UTF-8")
    case DDecimal(v) => v
    case DDuration(v) => v
    case DNull => null
  }

  private val twoTo64 = new java.math.BigDecimal("18446744073709551616")

  /** Fit the decoded JVM value to the payload field's Spark type. A
    * Long landing in a DecimalType field is an unsigned-BIGINT bit
    * pattern (uintCellDecode wraps above Long.MaxValue) — undo the
    * 2^64 wrap, the exact inverse of RowChecksum's token fold. */
  private def normalize(v: Any, c: KvColumn): Any = (v, sparkType(c)) match {
    case (null, _) => null
    case (x: java.math.BigDecimal, dt: DecimalType) =>
      x.setScale(dt.scale, java.math.RoundingMode.HALF_UP)
    case (x: Long, dt: DecimalType) =>
      val bd = java.math.BigDecimal.valueOf(x)
      (if (x < 0) bd.add(twoTo64) else bd).setScale(dt.scale)
    case (x: Long, DoubleType) => x.toDouble
    case (x, _) => x
  }

  def payloadType(meta: KvTableMeta): StructType =
    StructType(meta.columns.map(c => StructField(c.name, sparkType(c))))

  def outputSchema(meta: KvTableMeta): StructType = StructType(Seq(
    StructField("_schema", StringType, nullable = false),
    StructField("_table", StringType, nullable = false),
    StructField("_op", StringType, nullable = false),
    StructField("_commit_ts", LongType, nullable = false),
    StructField("_start_ts", LongType, nullable = false),
    StructField("before", payloadType(meta)),
    StructField("after", payloadType(meta))))

  /** Mount one table's raw entries. Input columns: `key` BINARY,
    * `value` BINARY, `old_value` BINARY (nullable), `op_type` STRING
    * ("put"|"delete"), `start_ts` LONG, `commit_ts` LONG. Entries
    * whose key is not a record key of `meta.tableId` are dropped
    * (the reference skips non-record keys, mounter.go:75). */
  def mountTable(raw: DataFrame, meta: KvTableMeta): DataFrame = {
    val enc = Encoders.row(outputSchema(meta))
    val m = meta
    raw.select("key", "value", "old_value", "op_type", "start_ts", "commit_ts")
      .mapPartitions { it =>
        it.flatMap { r =>
          val key = r.getAs[Array[Byte]](0)
          if (!isRecordKey(key)) Iterator.empty
          else {
            val (tableId, handle) = TiKvCodec.decodeRecordKey(key)
            if (!m.allIds.contains(tableId)) Iterator.empty
            else {
              val value = r.getAs[Array[Byte]](1)
              val oldValue = r.getAs[Array[Byte]](2)
              val opType = r.getAs[String](3)
              val after = if (opType == "delete") null else decodeImage(m, handle, value)
              val before = decodeImage(m, handle, oldValue)
              val op =
                if (opType == "delete") "D"
                else if (before != null) "U"
                else "I"
              Iterator(Row(m.schema, m.table, op,
                r.getLong(5), r.getLong(4),
                if (before == null) null else Row.fromSeq(before.toIndexedSeq),
                if (after == null) null else Row.fromSeq(after.toIndexedSeq)))
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** [[mountTable]] with INTEGRITY verification fused into the decode
    * — the reference mounter's shape when the integrity feature is on
    * (mounter.go:79-146: verify each image's checksum as it decodes;
    * corruption-handle-level `error` returns
    * ErrCorruptedDataMutation and the changefeed FAILS, level `warn`
    * marks the event corrupted and forwards it). Output = the
    * envelope plus a `_corrupted` boolean. Both images verify (the
    * pre-image with its warn-skip v0 semantics); rows without regions
    * pass untouched, so the operator is safe on integrity-off
    * upstreams too. */
  def mountTableVerified(raw: DataFrame, meta: KvTableMeta,
                         errorHandle: Boolean): DataFrame = {
    val enc = Encoders.row(StructType(
      outputSchema(meta).fields.toSeq :+
        StructField("_corrupted", BooleanType, nullable = false)))
    val m = meta
    raw.select("key", "value", "old_value", "op_type", "start_ts", "commit_ts")
      .mapPartitions { it =>
        it.flatMap { r =>
          val key = r.getAs[Array[Byte]](0)
          if (!isRecordKey(key)) Iterator.empty
          else {
            val (tableId, handle) = TiKvCodec.decodeRecordKey(key)
            if (!m.allIds.contains(tableId)) Iterator.empty
            else {
              val value = r.getAs[Array[Byte]](1)
              val oldValue = r.getAs[Array[Byte]](2)
              val opType = r.getAs[String](3)
              def verifies(bytes: Array[Byte], isPreRow: Boolean): Boolean =
                bytes == null || bytes.isEmpty ||
                  !TiKvCodec.isNewFormat(bytes) ||
                  checksumVerdict(m, handle, key, bytes, isPreRow)._3
              val preOk = verifies(oldValue, isPreRow = true)
              val curOk = opType == "delete" || verifies(value, isPreRow = false)
              val corrupted = !(preOk && curOk)
              if (corrupted && errorHandle)
                throw new CorruptedDataMutationException(
                  s"${m.schema}.${m.table} commit_ts=${r.getLong(5)}")
              val after =
                if (opType == "delete") null else decodeImage(m, handle, value)
              val before = decodeImage(m, handle, oldValue)
              val op =
                if (opType == "delete") "D"
                else if (before != null) "U"
                else "I"
              Iterator(Row(m.schema, m.table, op,
                r.getLong(5), r.getLong(4),
                if (before == null) null else Row.fromSeq(before.toIndexedSeq),
                if (after == null) null else Row.fromSeq(after.toIndexedSeq),
                corrupted))
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** Mount MANY tables' raw entries in ONE pass — one mapPartitions,
    * no self-union. The single-pass shape matters in streaming: a
    * change stream downstream of a stateful operator (the 2PC
    * matcher's flatMapGroupsWithState) must be consumed exactly once —
    * a per-table self-union would instantiate the stateful operator
    * once per branch, each with its own state store. All metas must
    * share one payload shape (the envelope's before/after struct is a
    * single column type); mount heterogeneous tables as separate
    * feeds. Entries whose table id matches no meta drop, like
    * [[mountTable]] (mounter.go:75).
    *
    * Unlike [[mountTable]] (the bare byte-decode surface), this emits
    * the FULL envelope contract including `_row_id` — the stable
    * source record id the transform pipeline's header expects
    * ([[graft.model.Envelope]]): the int handle for int-handle keys,
    * a deterministic 64-bit FNV-1a over the handle's memcomparable
    * key bytes for common handles (byte-level, so the same row always
    * hashes the same across decodes and task retries).
    *
    * `failOnCorruption` fuses the integrity error-handle level into
    * the decode (mounter.go:106,130: corruption-handle-level `error`
    * returns ErrCorruptedDataMutation and the changefeed fails on the
    * first corrupted image) — the steady-state composition's
    * integrity hook; the warn level's flagged-forward form lives on
    * [[mountTableVerified]]. */
  def mountTables(raw: DataFrame, metas: Seq[KvTableMeta],
                  failOnCorruption: Boolean = false): DataFrame = {
    require(metas.nonEmpty, "mountTables: no table metas")
    val pt = payloadType(metas.head)
    require(metas.forall(m => payloadType(m) == pt),
      "mountTables requires a shared payload shape across metas")
    val enc = Encoders.row(StructType(
      StructField("_row_id", LongType, nullable = false) +:
        outputSchema(metas.head).fields.toSeq))
    val byId: Map[Long, KvTableMeta] =
      metas.flatMap(m => m.allIds.map(_ -> m)).toMap
    raw.select("key", "value", "old_value", "op_type", "start_ts", "commit_ts")
      .mapPartitions { it =>
        it.flatMap { r =>
          val key = r.getAs[Array[Byte]](0)
          if (!isRecordKey(key)) Iterator.empty
          else {
            val (tableId, handle) = TiKvCodec.decodeRecordKey(key)
            byId.get(tableId) match {
              case None => Iterator.empty
              case Some(m) =>
                val value = r.getAs[Array[Byte]](1)
                val oldValue = r.getAs[Array[Byte]](2)
                val opType = r.getAs[String](3)
                if (failOnCorruption) {
                  def okOf(bytes: Array[Byte], isPreRow: Boolean): Boolean =
                    bytes == null || bytes.isEmpty ||
                      !TiKvCodec.isNewFormat(bytes) ||
                      checksumVerdict(m, handle, key, bytes, isPreRow)._3
                  if (!okOf(oldValue, isPreRow = true) ||
                      (opType != "delete" && !okOf(value, isPreRow = false)))
                    throw new CorruptedDataMutationException(
                      s"${m.schema}.${m.table} commit_ts=${r.getLong(5)}")
                }
                val after =
                  if (opType == "delete") null else decodeImage(m, handle, value)
                val before = decodeImage(m, handle, oldValue)
                val op =
                  if (opType == "delete") "D"
                  else if (before != null) "U"
                  else "I"
                val rowId = handle match {
                  case IntHandle(v) => v
                  case CommonHandle(_) =>
                    // FNV-1a over the handle's canonical memcomparable
                    // bytes — the record-key suffix after 't'+id+"_r"
                    // (offset 11). Byte-level, so identical rows hash
                    // identically across decodes, task retries, and
                    // restarts (exactly-once + per-key ordering depend
                    // on _row_id determinism).
                    var h = -3750763034362895579L
                    var i = 11
                    while (i < key.length) {
                      h = (h ^ (key(i) & 0xffL)) * 1099511628211L
                      i += 1
                    }
                    h
                }
                Iterator(Row(rowId, m.schema, m.table, op,
                  r.getLong(5), r.getLong(4),
                  if (before == null) null else Row.fromSeq(before.toIndexedSeq),
                  if (after == null) null else Row.fromSeq(after.toIndexedSeq)))
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** Schema-versioned mount — the multi-version decode the reference's
    * mounter does via `GetTableInfo(tableID, commitTs)`
    * (schemastore/schema_store.go:50-54): each entry decodes against
    * the greatest schema version ≤ its commit-ts, so a cell written
    * before a MODIFY keeps its old type's byte interpretation, then the
    * decoded row CONFORMS to the latest version's shape (columns added
    * later fill their default; values retyped by a lossy MODIFY cast
    * to the new Spark type) — the per-step conformance the DDL barrier
    * applies downstream.
    *
    * `versions`: (versionTs, meta) with identical tableId; column IDs
    * are stable across versions (TiDB never reuses a column ID), which
    * is what makes id-keyed decode version-safe for add/drop.
    */
  def mountTableVersioned(raw: DataFrame,
                          versions: Seq[(Long, KvTableMeta)]): DataFrame = {
    require(versions.nonEmpty)
    val sorted = versions.sortBy(_._1)
    require(sorted.map(_._2.tableId).distinct.size == 1,
      "all versions must describe one physical table")
    val latest = sorted.last._2
    val enc = Encoders.row(outputSchema(latest))
    raw.select("key", "value", "old_value", "op_type", "start_ts", "commit_ts")
      .mapPartitions { it =>
        def metaAt(ts: Long): KvTableMeta =
          sorted.takeWhile(_._1 <= ts).lastOption.map(_._2).getOrElse(sorted.head._2)
        it.flatMap { r =>
          val key = r.getAs[Array[Byte]](0)
          if (!isRecordKey(key)) Iterator.empty
          else {
            val (tableId, handle) = TiKvCodec.decodeRecordKey(key)
            val commitTs = r.getLong(5)
            val asOf = metaAt(commitTs)
            // membership is AS-OF: an EXCHANGE PARTITION swaps which
            // physical IDs belong to the table from its version ts on
            if (!asOf.allIds.contains(tableId)) Iterator.empty
            else {
              val opType = r.getAs[String](3)
              val after =
                if (opType == "delete") null
                else conform(asOf, latest, decodeImage(asOf, handle, r.getAs[Array[Byte]](1)))
              val before = conform(asOf, latest,
                decodeImage(asOf, handle, r.getAs[Array[Byte]](2)))
              val op =
                if (opType == "delete") "D" else if (before != null) "U" else "I"
              Iterator(Row(latest.schema, latest.table, op,
                commitTs, r.getLong(4),
                if (before == null) null else Row.fromSeq(before.toIndexedSeq),
                if (after == null) null else Row.fromSeq(after.toIndexedSeq)))
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** DDL-aware one-pass mount over EVERY table — the steady-state
    * decode against an EVOLVING schema store (schema_store.go:50-54
    * `GetTableInfo(tableID, commitTs)` feeding event_scanner.go:351):
    * each raw entry decodes with the schema version AND physical-id
    * membership as of its own commit ts.
    *
    * `plan` is [[graft.model.SchemaStore.physicalPlan]]'s shape:
    * physical table id → ts-ascending segments of Some(meta to decode
    * with from that ts) / None (the id leaves the feed at that ts —
    * dropped table, swapped-out partition). Executors do one binary
    * search per entry; the plan is driver-built, broadcast-sized
    * (tables × versions), and immutable per micro-batch — fold DDLs
    * between batches and pass the new plan.
    *
    * Decoded images CONFORM to the id's latest segment meta (columns
    * added later default-fill, dropped vanish, retypes cast), the same
    * contract as [[mountTableVersioned]]; all latest metas must share
    * one payload shape (the envelope's before/after is a single
    * struct type) — HETEROGENEOUS shapes ride one feed through the
    * fused [[mountTablesEncodeCanal]], which emits wire strings and
    * needs no shared struct.
    *
    * Accounting (the unknown-id observable): entries whose physical id
    * has NO plan entry bump `unknownIds`; entries whose id is planned
    * but outside every mounted window bump `outOfWindow`. Both are
    * optional [[org.apache.spark.util.LongAccumulator]]s so a running
    * feed surfaces silent drops instead of hiding them
    * (mounter.go:75's skip, made loud). */
  def mountTablesPlan(raw: DataFrame,
                      plan: Map[Long, Seq[(Long, Option[KvTableMeta])]],
                      failOnCorruption: Boolean = false,
                      unknownIds: Option[org.apache.spark.util.LongAccumulator] = None,
                      outOfWindow: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    require(plan.nonEmpty, "mountTablesPlan: empty plan")
    // per-id: ts array for binary search + aligned metas + conform target
    val compiled: Map[Long, (Array[Long], Array[KvTableMeta], KvTableMeta)] =
      plan.flatMap { case (pid, segs) =>
        val sorted = segs.sortBy(_._1)
        sorted.flatMap(_._2).lastOption.map { latest =>
          pid -> (sorted.map(_._1).toArray,
            sorted.map(_._2.orNull).toArray, latest)
        }
      }
    val latests = compiled.values.map(_._3).toSeq
    require(latests.nonEmpty, "mountTablesPlan: no mountable segment")
    val pt = payloadType(latests.head)
    require(latests.forall(m => payloadType(m) == pt),
      "mountTablesPlan requires a shared payload shape across tables")
    val enc = Encoders.row(StructType(
      StructField("_row_id", LongType, nullable = false) +:
        outputSchema(latests.head).fields.toSeq))
    raw.select("key", "value", "old_value", "op_type", "start_ts", "commit_ts")
      .mapPartitions { it =>
        def segAt(tss: Array[Long], ts: Long): Int = {
          // greatest index with tss(i) <= ts, or -1
          var lo = 0; var hi = tss.length - 1; var res = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (tss(mid) <= ts) { res = mid; lo = mid + 1 } else hi = mid - 1
          }
          res
        }
        it.flatMap { r =>
          val key = r.getAs[Array[Byte]](0)
          if (!isRecordKey(key)) Iterator.empty
          else {
            val (tableId, handle) = TiKvCodec.decodeRecordKey(key)
            compiled.get(tableId) match {
              case None =>
                // reserved system-table ids (top of the 48-bit id
                // space, span_op.go:34-35 — the DDL job table rides
                // the same wire) are control traffic, not data loss
                if (tableId < ReservedIdFloor) unknownIds.foreach(_.add(1L))
                Iterator.empty
              case Some((tss, metas, latest)) =>
                val commitTs = r.getLong(5)
                val i = segAt(tss, commitTs)
                val asOf = if (i < 0) null else metas(i)
                if (asOf == null) {
                  outOfWindow.foreach(_.add(1L))
                  Iterator.empty
                } else {
                  val value = r.getAs[Array[Byte]](1)
                  val oldValue = r.getAs[Array[Byte]](2)
                  val opType = r.getAs[String](3)
                  if (failOnCorruption) {
                    def okOf(bytes: Array[Byte], isPreRow: Boolean): Boolean =
                      bytes == null || bytes.isEmpty ||
                        !TiKvCodec.isNewFormat(bytes) ||
                        checksumVerdict(asOf, handle, key, bytes, isPreRow)._3
                    if (!okOf(oldValue, isPreRow = true) ||
                        (opType != "delete" && !okOf(value, isPreRow = false)))
                      throw new CorruptedDataMutationException(
                        s"${asOf.schema}.${asOf.table} commit_ts=$commitTs")
                  }
                  val after =
                    if (opType == "delete") null
                    else conform(asOf, latest, decodeImage(asOf, handle, value))
                  val before = conform(asOf, latest, decodeImage(asOf, handle, oldValue))
                  val op =
                    if (opType == "delete") "D"
                    else if (before != null) "U"
                    else "I"
                  val rowId = handle match {
                    case IntHandle(v) => v
                    case CommonHandle(_) =>
                      var h = -3750763034362895579L
                      var j = 11
                      while (j < key.length) {
                        h = (h ^ (key(j) & 0xffL)) * 1099511628211L
                        j += 1
                      }
                      h
                  }
                  Iterator(Row(rowId, latest.schema, latest.table, op,
                    commitTs, r.getLong(4),
                    if (before == null) null else Row.fromSeq(before.toIndexedSeq),
                    if (after == null) null else Row.fromSeq(after.toIndexedSeq)))
                }
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** JSON string escaping — the JVM twin of
    * [[graft.functions.Codecs.jsonEscape]] (same characters, same
    * order), for the fused mount→encode path. */
  private def jsonEsc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  /** One decoded cell as its canal-JSON literal — the JVM twin of
    * [[graft.functions.Codecs.jsonValueFor]] with canalBlob semantics
    * (byte identity with the columnar encoder is spec-pinned):
    * integers/decimals/floats bare, booleans 1/0, strings escaped,
    * BINARY as the ISO-8859-1 char view. */
  private def canalJsonLit(v: Any): String = v match {
    case null => "null"
    case x: Long => x.toString
    case x: Int => x.toString
    case x: Short => x.toString
    case x: Byte => x.toString
    case x: Boolean => if (x) "1" else "0"
    case x: Double => x.toString
    case x: Float => x.toString
    case x: java.math.BigDecimal => x.toPlainString
    case x: Array[Byte] =>
      "\"" + jsonEsc(new String(x, java.nio.charset.StandardCharsets.ISO_8859_1)) + "\""
    case x: String => "\"" + jsonEsc(x) + "\""
    case x => "\"" + jsonEsc(x.toString) + "\""
  }

  private def canalImage(m: KvTableMeta, image: Array[Any]): String =
    if (image == null) "null"
    else m.columns.zip(image).map { case (c, v) =>
      "\"" + c.name + "\":" + canalJsonLit(v)
    }.mkString("{", ",", "}")

  /** Fused mount→encode over HETEROGENEOUS table shapes — the
    * reference's scan→encode pipeline shape (event_scanner.go decoding
    * per TableInfo, feeding the encoder group): each raw entry decodes
    * against ITS OWN as-of meta, conforms to its table's latest
    * segment, and renders straight to the canal-JSON wire inside the
    * SAME mapPartitions — the stream carries wire STRINGS, so no
    * shared payload struct exists and a `*.*` feed over arbitrarily
    * shaped tables runs as ONE query (the [[mountTablesPlan]]
    * shared-shape require does not apply). Byte-identical to
    * [[graft.functions.Codecs.canalJsonFor]] over each table's own
    * struct-shaped mount (spec-pinned).
    *
    * Scale shape: one shuffle-free map chain over the change-log scan
    * per entry — binary search into the broadcast-sized plan, byte
    * decode, string render; nothing is corpus-sized on the driver. */
  def mountTablesEncodeCanal(raw: DataFrame,
                             plan: Map[Long, Seq[(Long, Option[KvTableMeta])]],
                             failOnCorruption: Boolean = false,
                             unknownIds: Option[org.apache.spark.util.LongAccumulator] = None,
                             outOfWindow: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame =
    mountTablesEncodeWith(raw, plan, failOnCorruption, unknownIds, outOfWindow) {
      (latest, op, commitTs, before, after) =>
        // canal-JSON assembly, field-for-field the columnar
        // canalJsonFor layout
        val typ = op match {
          case "I" => "INSERT"; case "U" => "UPDATE"; case _ => "DELETE"
        }
        val ms = commitTs / 1000000L
        val dataImg =
          if (op == "D") canalImage(latest, before)
          else canalImage(latest, after)
        val oldArr =
          if (op == "U") "[" + canalImage(latest, before) + "]" else "null"
        val pks = latest.handleCols.map("\"" + _ + "\"").mkString(",")
        "{\"id\":0,\"database\":\"" + latest.schema +
          "\",\"table\":\"" + latest.table +
          "\",\"pkNames\":[" + pks + "],\"isDdl\":false,\"type\":\"" + typ +
          "\",\"es\":" + ms + ",\"ts\":" + ms +
          ",\"data\":[" + dataImg + "],\"old\":" + oldArr + "}"
    }

  /** CSV literal for one decoded cell — the fused twin of
    * [[graft.functions.Codecs.csvLineFor]]'s per-type rendering
    * (fromColValToCsvVal, csv/csv_message.go:275-345): strings RFC-4180
    * quoted with quote doubling, binary base64, booleans 1/0, numerics
    * bare, null → \N. */
  private def csvLit(v: Any, csv: graft.model.CsvConfig): String = v match {
    case null => csv.nullString
    case x: Boolean => if (x) "1" else "0"
    case x: Array[Byte] =>
      if (csv.binaryEncodingMethod == "hex")
        x.map("%02x".format(_)).mkString
      else java.util.Base64.getEncoder.encodeToString(x)
    case x: String =>
      if (csv.quote.nonEmpty)
        csv.quote + x.replace(csv.quote, csv.quote + csv.quote) + csv.quote
      else {
        // backslash-escape mode (formatWithEscapes)
        val esc = x.replace("\\", "\\\\").replace("\r", "\\r")
          .replace("\n", "\\n")
        csv.delimiter.distinct.foldLeft(esc)((acc, ch) =>
          acc.replace(ch.toString, "\\" + ch))
      }
    case x: java.math.BigDecimal => x.toPlainString
    case x => x.toString
  }

  /** Fused mount→encode to the csv storage wire over HETEROGENEOUS
    * shapes — one csv RECORD per event in the reference's meta order
    * (op, TABLE, SCHEMA, commitTs — encodeMeta, csv_message.go:122-127)
    * then the latest-shape payload cells. `outputOldValue` adds the
    * is-updated column and splits an UPDATE into a two-record D+I
    * message (csv_message.go:104-140), newline-joined. Same scan-speed
    * shape as [[mountTablesEncodeCanal]]. */
  def mountTablesEncodeCsv(raw: DataFrame,
                           plan: Map[Long, Seq[(Long, Option[KvTableMeta])]],
                           outputOldValue: Boolean = false,
                           failOnCorruption: Boolean = false,
                           unknownIds: Option[org.apache.spark.util.LongAccumulator] = None,
                           outOfWindow: Option[org.apache.spark.util.LongAccumulator] = None,
                           csv: graft.model.CsvConfig =
                             graft.functions.Codecs.csvLegacy)
      : DataFrame = {
    csv.validate()
    val oldValue = outputOldValue || csv.outputOldValue
    mountTablesEncodeWith(raw, plan, failOnCorruption, unknownIds, outOfWindow) {
      (latest, op, commitTs, before, after) =>
        def q(s: String): String = csvLit(s, csv)
        def rec(o: String, img: Array[Any], updated: Boolean): String = {
          val meta = Seq(q(o), q(latest.table), q(latest.schema)) ++
            (if (csv.includeCommitTs) Seq(commitTs.toString) else Nil) ++
            (if (oldValue) Seq(updated.toString) else Nil)
          val cells =
            if (img == null) latest.columns.map(_ => csv.nullString)
            else img.toSeq.map(csvLit(_, csv))
          (meta ++ cells).mkString(csv.delimiter)
        }
        op match {
          case "U" if oldValue =>
            rec("D", before, updated = true) + "\n" + rec("I", after, updated = true)
          case "U" => rec("U", after, updated = false)
          case "D" => rec("D", before, updated = false)
          case _ => rec("I", after, updated = false)
        }
    }
  }

  private def mountTablesEncodeWith(raw: DataFrame,
                                    plan: Map[Long, Seq[(Long, Option[KvTableMeta])]],
                                    failOnCorruption: Boolean,
                                    unknownIds: Option[org.apache.spark.util.LongAccumulator],
                                    outOfWindow: Option[org.apache.spark.util.LongAccumulator])
                                   (render: (KvTableMeta, String, Long,
                                             Array[Any], Array[Any]) => String)
      : DataFrame = {
    require(plan.nonEmpty, "mountTablesEncode: empty plan")
    val compiled: Map[Long, (Array[Long], Array[KvTableMeta], KvTableMeta)] =
      plan.flatMap { case (pid, segs) =>
        val sorted = segs.sortBy(_._1)
        sorted.flatMap(_._2).lastOption.map { latest =>
          pid -> (sorted.map(_._1).toArray,
            sorted.map(_._2.orNull).toArray, latest)
        }
      }
    require(compiled.nonEmpty, "mountTablesEncode: no mountable segment")
    val enc = Encoders.row(StructType(Seq(
      StructField("_row_id", LongType, nullable = false),
      StructField("_schema", StringType, nullable = false),
      StructField("_table", StringType, nullable = false),
      StructField("_op", StringType, nullable = false),
      StructField("_commit_ts", LongType, nullable = false),
      StructField("_start_ts", LongType, nullable = false),
      StructField("_value", StringType, nullable = false))))
    raw.select("key", "value", "old_value", "op_type", "start_ts", "commit_ts")
      .mapPartitions { it =>
        def segAt(tss: Array[Long], ts: Long): Int = {
          var lo = 0; var hi = tss.length - 1; var res = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (tss(mid) <= ts) { res = mid; lo = mid + 1 } else hi = mid - 1
          }
          res
        }
        it.flatMap { r =>
          val key = r.getAs[Array[Byte]](0)
          if (!isRecordKey(key)) Iterator.empty
          else {
            val (tableId, handle) = TiKvCodec.decodeRecordKey(key)
            compiled.get(tableId) match {
              case None =>
                if (tableId < ReservedIdFloor) unknownIds.foreach(_.add(1L))
                Iterator.empty
              case Some((tss, metas, latest)) =>
                val commitTs = r.getLong(5)
                val i = segAt(tss, commitTs)
                val asOf = if (i < 0) null else metas(i)
                if (asOf == null) {
                  outOfWindow.foreach(_.add(1L))
                  Iterator.empty
                } else {
                  val value = r.getAs[Array[Byte]](1)
                  val oldValue = r.getAs[Array[Byte]](2)
                  val opType = r.getAs[String](3)
                  if (failOnCorruption) {
                    def okOf(bytes: Array[Byte], isPreRow: Boolean): Boolean =
                      bytes == null || bytes.isEmpty ||
                        !TiKvCodec.isNewFormat(bytes) ||
                        checksumVerdict(asOf, handle, key, bytes, isPreRow)._3
                    if (!okOf(oldValue, isPreRow = true) ||
                        (opType != "delete" && !okOf(value, isPreRow = false)))
                      throw new CorruptedDataMutationException(
                        s"${asOf.schema}.${asOf.table} commit_ts=$commitTs")
                  }
                  val after =
                    if (opType == "delete") null
                    else conform(asOf, latest, decodeImage(asOf, handle, value))
                  val before = conform(asOf, latest, decodeImage(asOf, handle, oldValue))
                  val op =
                    if (opType == "delete") "D"
                    else if (before != null) "U"
                    else "I"
                  val rowId = handle match {
                    case IntHandle(v) => v
                    case CommonHandle(_) =>
                      var h = -3750763034362895579L
                      var j = 11
                      while (j < key.length) {
                        h = (h ^ (key(j) & 0xffL)) * 1099511628211L
                        j += 1
                      }
                      h
                  }
                  val wire = render(latest, op, commitTs, before, after)
                  Iterator(Row(rowId, latest.schema, latest.table, op,
                    commitTs, r.getLong(4), wire))
                }
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** Per-batch checksum CENSUS over the entries a plan mounts:
    * (ok, bad) counts of VERIFIED checksummed images — the same
    * verdict the fused mount applies; images without a checksum (or
    * v0 pre-row warn-skips) count in neither bucket. Drives the
    * all-mismatch circuit breaker: ONE bad image among verified-good
    * ones is data corruption and must fail the feed
    * (ErrCorruptedDataMutation); EVERY checksummed image failing is
    * the signature of a checksum-DOMAIN mismatch (e.g. a re-derived
    * checksum domain against a real upstream's), which must downgrade
    * to a feed warning instead of killing replication. One extra pass
    * over the (persisted) micro-batch, two counters across the wire. */
  def checksumCensus(raw: DataFrame,
                     plan: Map[Long, Seq[(Long, Option[KvTableMeta])]])
      : (Long, Long) = {
    val compiled: Map[Long, (Array[Long], Array[KvTableMeta])] =
      plan.flatMap { case (pid, segs) =>
        val sorted = segs.sortBy(_._1)
        if (sorted.exists(_._2.isDefined))
          Some(pid -> (sorted.map(_._1).toArray, sorted.map(_._2.orNull).toArray))
        else None
      }
    import org.apache.spark.sql.functions.{col, sum}
    val sums = raw
      .select("key", "value", "old_value", "op_type", "start_ts", "commit_ts")
      .mapPartitions { it =>
        def segAt(tss: Array[Long], ts: Long): Int = {
          var lo = 0; var hi = tss.length - 1; var res = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (tss(mid) <= ts) { res = mid; lo = mid + 1 } else hi = mid - 1
          }
          res
        }
        var ok = 0L; var bad = 0L
        it.foreach { r =>
          val key = r.getAs[Array[Byte]](0)
          if (isRecordKey(key)) {
            val (tableId, handle) = TiKvCodec.decodeRecordKey(key)
            compiled.get(tableId).foreach { case (tss, metas) =>
              val i = segAt(tss, r.getLong(5))
              val asOf = if (i < 0) null else metas(i)
              if (asOf != null) {
                def tally(bytes: Array[Byte], isPreRow: Boolean): Unit =
                  if (bytes != null && bytes.nonEmpty && TiKvCodec.isNewFormat(bytes)) {
                    val v = checksumVerdict(asOf, handle, key, bytes, isPreRow)
                    // count only images a verdict actually judged: ok
                    // requires verified; NOT-ok counts bad whether the
                    // mismatch verified or the version was unknown
                    if (!v._3) bad += 1
                    else if (v._4) ok += 1
                  }
                tally(r.getAs[Array[Byte]](2), isPreRow = true)
                if (r.getAs[String](3) != "delete")
                  tally(r.getAs[Array[Byte]](1), isPreRow = false)
              }
            }
          }
        }
        Iterator((ok, bad))
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .toDF("ok", "bad")
      .agg(sum(col("ok")), sum(col("bad")))
      .head()
    (if (sums.isNullAt(0)) 0L else sums.getLong(0),
      if (sums.isNullAt(1)) 0L else sums.getLong(1))
  }

  /** Reserved system-table ids sit at the top of the 48-bit table-id
    * space (span_op.go:34-35; the DDL job table is MaxInt48-1) — wire
    * entries under them are control traffic, never counted as data
    * loss by the coverage accounting. */
  val ReservedIdFloor: Long = 281474976710000L

  /** The unknown-id OBSERVABLE as a one-row summary (the
    * coverage-accounting mold of `checksumCoverage`): how many record
    * keys a mount over `metas` would decode vs silently drop.
    * `n_record_keys` counts data-table record keys (reserved system
    * ids excluded), `n_known_id` those whose physical id some meta
    * claims, `n_unknown_id` the silent-drop class (mounter.go:75's
    * skip, surfaced). Scan-bound: one map-side-combined aggregate,
    * no shuffle of row data — run it alongside any feed to make
    * membership gaps (missed partition DDLs, unsynced metas) LOUD
    * instead of invisible. */
  def mountCoverage(raw: DataFrame, metas: Seq[KvTableMeta]): DataFrame = {
    val known = metas.flatMap(_.allIds).toSet
    import org.apache.spark.sql.functions._
    raw.select("key")
      .mapPartitions { it =>
        it.flatMap { r =>
          val key = r.getAs[Array[Byte]](0)
          if (!isRecordKey(key)) Iterator.empty
          else {
            val tid = TiKvCodec.decodeRecordKey(key)._1
            if (tid >= ReservedIdFloor) Iterator.empty
            else Iterator((1L, if (known.contains(tid)) 1L else 0L,
              if (known.contains(tid)) 0L else 1L))
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .toDF("rk", "kn", "un")
      .agg(sum("rk").as("n_record_keys"), sum("kn").as("n_known_id"),
        sum("un").as("n_unknown_id"))
  }

  /** Reshape an image decoded under `asOf` into `latest`'s column
    * order/types: dropped columns vanish, added columns default,
    * retyped values cast. */
  private def conform(asOf: KvTableMeta, latest: KvTableMeta,
                      image: Array[Any]): Array[Any] = {
    if (image == null) return null
    if (asOf eq latest) return image
    val byName = asOf.columns.map(_.name).zip(image).toMap
    latest.columns.map { c =>
      byName.get(c.name) match {
        case Some(v) => cast(v, sparkType(c))
        case None => defaultValue(c)
      }
    }.toArray
  }

  private def cast(v: Any, to: DataType): Any = (v, to) match {
    case (null, _) => null
    case (x: Long, StringType) => x.toString
    case (x: Long, DoubleType) => x.toDouble
    case (x: Double, StringType) => x.toString
    case (x: String, LongType) => x.toLong
    case (x: java.math.BigDecimal, StringType) => x.toPlainString
    case (x, _) => x
  }

  /** One image's checksum verdict — (computed column checksum, stored,
    * ok, verified, version). Version 0 compares the column fold
    * (extra accepted; pre-row mismatch warn-skips, checksum.go:100-112),
    * versions 1/2 re-derive the RAW-BYTES domain over the wire bytes +
    * key (checksum.go:146-161, strict for both images), unknown
    * versions verdict not-ok/not-verified (checksum.go:66-68). */
  private def checksumVerdict(m: KvTableMeta, handle: Handle,
                              key: Array[Byte], bytes: Array[Byte],
                              isPreRow: Boolean)
      : (Long, Any, Boolean, Boolean, Any) = {
    val row = TiKvCodec.decodeV2(bytes)
    val image = decodeImage(m, handle, bytes)
    val tokens = m.columns.zip(image).map { case (c, v) =>
      graft.functions.RowChecksum.tokenPlain(base(c.sqlType), v)
    }
    val computed = graft.functions.RowChecksum.crc32Plain(tokens)
    row.checksum match {
      case None => // integrity off upstream
        (computed, null, true, false, null)
      case Some(region) if region.version == 1 || region.version == 2 =>
        val raw = TiKvCodec.rawChecksumOf(bytes, key).get
        (computed, region.first.asInstanceOf[Any],
          region.first == raw, true, region.version.asInstanceOf[Any])
      case Some(region) if region.version != 0 =>
        (computed, region.first.asInstanceOf[Any], false, false,
          region.version.asInstanceOf[Any])
      case Some(region) =>
        val matched = region.first == computed ||
          region.extra.contains(computed)
        if (!matched && isPreRow)
          (computed, region.first.asInstanceOf[Any], true, false,
            region.version.asInstanceOf[Any])
        else
          (computed, region.first.asInstanceOf[Any], matched, true,
            region.version.asInstanceOf[Any])
    }
  }

  /** Mounter-side in-row checksum verification — verifyColumnChecksum
    * (pkg/common/event/checksum.go:31-112, the integrity feature's
    * version-0 column-checksum path): decode each put's value, fold
    * the decoded row through the wire-true CRC32 column domain
    * ([[graft.functions.RowChecksum.tokenPlain]]), and compare with
    * the checksum region the row carries. Rows without a region pass
    * (upstream integrity off, :78-80); a stored EXTRA checksum also
    * passes if it matches (the online-DDL transition window, :92-95).
    * The comparison is GATED on the region's checksum VERSION
    * (checksum.go:40-46 verifyChecksum dispatch): version 0 is the
    * column checksum this engine computes from the decoded row;
    * versions 1/2 are the RAW-BYTES scheme — verified here via
    * [[graft.model.TiKvCodec.rawChecksumOf]] (CRC32-IEEE over the
    * stored value bytes before the region + the record key), the
    * pre-decode formulation of checksum.go:140-210
    * verifyRawBytesChecksum. The reference re-encodes decoded datums
    * (tz-aware) because its decoder already consumed the raw bytes;
    * verifying before decode needs no re-encode and no tz, and also
    * catches corruption the decode would mask. After a v1/v2 match the
    * reference computes the COLUMN checksum to forward downstream
    * (checksum.go:57-64) — mirrored here: `computed` always carries
    * the column checksum. Region versions outside 0/1/2 are unknown
    * (checksum.go:66-68 errors): verdict `ok = false, verified =
    * false`, counted by [[checksumCoverage]] as skipped_versioned.
    *
    * BOTH images verdict: the put value as image `current`, and when
    * an old value rides the entry (updates with old-value enabled) a
    * second verdict row as image `previous`. The previous image gets
    * the reference's skipFail semantics for version 0
    * (checksum.go:41-44,100-112: after Add/Drop Column the old row's
    * column set no longer matches the schema, so a pre-row COLUMN
    * mismatch is warn-skipped, not failed — here `ok = true,
    * verified = false` so coverage can still see it); the v1/v2
    * raw-bytes path has no such branch and verifies previous images
    * strictly (checksum.go:46 dispatches both images the same way).
    *
    * Returns verdict rows: (commit_ts, handle, stored, computed, ok,
    * verified, version, image) — `verified` is true when a comparison
    * actually ran and counted (v0 column or v1/v2 raw-bytes);
    * `version` is null when the image carries no checksum region. */
  def verifyInRowChecksums(raw: DataFrame, meta: KvTableMeta): DataFrame = {
    val schema = StructType(Seq(
      StructField("_commit_ts", LongType, nullable = false),
      StructField("handle", StringType, nullable = false),
      StructField("stored", LongType),
      StructField("computed", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("verified", BooleanType, nullable = false),
      StructField("version", IntegerType),
      StructField("image", StringType, nullable = false)))
    val enc = Encoders.row(schema)
    val m = meta
    raw.select("key", "value", "old_value", "op_type", "commit_ts")
      .mapPartitions { it =>
        it.flatMap { r =>
          val key = r.getAs[Array[Byte]](0)
          val value = r.getAs[Array[Byte]](1)
          if (!isRecordKey(key) ||
              r.getAs[String](3) == "delete" || value == null || value.isEmpty ||
              !TiKvCodec.isNewFormat(value))
            Iterator.empty
          else {
            val (tableId, handle) = TiKvCodec.decodeRecordKey(key)
            if (!m.allIds.contains(tableId)) Iterator.empty
            else {
              val (computed, stored, ok, verified, version) =
                checksumVerdict(m, handle, key, value, isPreRow = false)
              val h = handle match {
                case IntHandle(v) => v.toString
                case CommonHandle(ds) => ds.mkString("|")
              }
              val commitTs = r.getLong(4)
              val cur = Row(commitTs, h, stored, computed, ok, verified,
                version, "current")
              val old = r.getAs[Array[Byte]](2)
              if (old == null || old.isEmpty || !TiKvCodec.isNewFormat(old))
                Iterator(cur)
              else {
                val (pc, ps, po, pv, pver) =
                  checksumVerdict(m, handle, key, old, isPreRow = true)
                Iterator(cur,
                  Row(commitTs, h, ps, pc, po, pv, pver, "previous"))
              }
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** Integrity coverage summary over a verdict frame: one row with
    * (n_rows, n_verified, n_skipped_versioned, n_no_region,
    * n_mismatch, all_skipped_versioned). `n_verified` counts rows
    * where a comparison ran (v0 column OR v1/v2 raw-bytes — both are
    * real verifications now); `n_skipped_versioned` counts only
    * UNKNOWN region versions (not 0/1/2 — future formats this engine
    * cannot verify); `n_mismatch` counts verified rows that FAILED.
    * A caller seeing `all_skipped_versioned = true` is running
    * against an upstream whose regions this engine cannot verify and
    * should surface a changefeed warning rather than report
    * integrity green. */
  def checksumCoverage(verdicts: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    verdicts.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("verified"), 1L).otherwise(0L)).as("n_verified"),
      sum(when(col("version").isNotNull && col("version") =!= 0 &&
               col("version") =!= 1 && col("version") =!= 2, 1L)
        .otherwise(0L)).as("n_skipped_versioned"),
      sum(when(col("version").isNull, 1L).otherwise(0L)).as("n_no_region"),
      sum(when(col("verified") && !col("ok"), 1L).otherwise(0L)).as("n_mismatch"))
    .withColumn("all_skipped_versioned",
      col("n_rows") > 0 && col("n_skipped_versioned") === col("n_rows"))
  }

  private val rawEntrySchema = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("old_value", BinaryType), StructField("op_type", StringType),
    StructField("start_ts", LongType), StructField("commit_ts", LongType)))

  /** Unpack a column of RawKVEntry wire frames
    * ([[graft.model.RawKvEntryCodec]] layout — the event-store /
    * message-center serialization) into the mounter's input shape.
    * Resolved entries (op 3) are watermarks, not rows — they are
    * dropped here; read them with [[resolvedTsOf]]. */
  def fromEncodedEntries(df: DataFrame, entryCol: String = "entry"): DataFrame = {
    import graft.model.RawKvEntryCodec
    val enc = Encoders.row(rawEntrySchema)
    df.select(entryCol).mapPartitions { it =>
      it.flatMap { r =>
        val e = RawKvEntryCodec.decode(r.getAs[Array[Byte]](0))
        if (e.isResolved) Iterator.empty
        else Iterator(Row(
          e.key,
          if (e.value.isEmpty) null else e.value,
          if (e.oldValue.isEmpty) null else e.oldValue,
          e.opTypeName, e.startTs, e.crts))
      }
    }(enc).toDF()
  }

  /** The watermark stream of an encoded-entry column: one
    * (region_id, resolved_ts) row per resolved entry. */
  def resolvedTsOf(df: DataFrame, entryCol: String = "entry"): DataFrame = {
    import graft.model.RawKvEntryCodec
    val schema = StructType(Seq(
      StructField("region_id", LongType, nullable = false),
      StructField("resolved_ts", LongType, nullable = false)))
    val enc = Encoders.row(schema)
    df.select(entryCol).mapPartitions { it =>
      it.flatMap { r =>
        val e = RawKvEntryCodec.decode(r.getAs[Array[Byte]](0))
        if (e.isResolved) Iterator(Row(e.regionId, e.crts)) else Iterator.empty
      }
    }(enc).toDF()
  }

  // ---- encode side (test/replay tooling: build raw entries) ----

  /** Encode one payload (ordered as meta.columns) into a v2 row value;
    * the handle column is omitted from the value, as TiDB does. */
  /** A payload value as the source stores it. TiDB dialect: strings
    * are stored utf8mb4 whatever the declared charset — encode UTF-8.
    * mysql-native dialect: encode in the COLUMN charset (the write
    * side of the dialect-gated transcode). */
  private def storedValue(meta: KvTableMeta, c: KvColumn, v: Any): Any =
    v match {
      case s: String if charClass(base(c.sqlType)) =>
        transcoder(meta, c).map(cs => s.getBytes(cs): Any).getOrElse(s)
      case other => other
    }

  def encodeImage(meta: KvTableMeta, payload: Seq[Any]): Array[Byte] = {
    val cells = meta.columns.zip(payload).collect {
      // a CI-collated handle column ALSO writes its real value into
      // the row (restore data) — its key bytes are only a sort key
      case (c, v) if !meta.handleCols.contains(c.name) || c.caseInsensitive =>
        (c.id, Option(v).map(x => TiKvCodec.encodeCell(
          storedValue(meta, c, x), base(c.sqlType), c.unsigned)))
    }
    TiKvCodec.encodeV2(cells)
  }

  /** [[encodeImage]] with the in-row checksum region: the column
    * checksum folds EVERY column of the row (handle included — the
    * reference computes over the decoded chunk row, which carries the
    * handle column). */
  def encodeImageChecksummed(meta: KvTableMeta, payload: Seq[Any],
                             extra: Option[Long] = None): Array[Byte] = {
    val cells = meta.columns.zip(payload).collect {
      case (c, v) if !meta.handleCols.contains(c.name) || c.caseInsensitive =>
        (c.id, Option(v).map(x => TiKvCodec.encodeCell(x, base(c.sqlType), c.unsigned)))
    }
    val tokens = meta.columns.zip(payload).map { case (c, v) =>
      graft.functions.RowChecksum.tokenPlain(base(c.sqlType), v)
    }
    TiKvCodec.encodeV2Checksummed(cells,
      graft.functions.RowChecksum.crc32Plain(tokens), extra)
  }

  /** Build the record key for a payload: an int handle when the single
    * handle column is integer-typed — INCLUDING unsigned BIGINT, whose
    * u64 value keys as its int64 BIT PATTERN (TiDB's unsigned
    * int-handle encoding: the handle is always one int64 slot; the
    * unsigned interpretation lives in the column type, which is also
    * how the decode side re-renders it as DECIMAL(20,0)) — else a
    * common handle of memcomparable datums in key order. `physicalId`
    * overrides the logical table ID for partitioned tables (records
    * live under the PARTITION's physical ID). */
  def recordKeyFor(meta: KvTableMeta, payload: Seq[Any],
                   physicalId: Option[Long] = None): Array[Byte] = {
    val byName = meta.columns.map(_.name).zip(payload).toMap
    def datumOf(name: String, v: Any): Datum = v match {
      case l: Long => DInt(l)
      case i: Int => DInt(i.toLong)
      case s: String =>
        val col = meta.columns.find(_.name == name)
        if (col.exists(_.caseInsensitive))
          // new-collation PK: the key carries the collator's SORT KEY
          // (general_ci weights); the real value rides the row value
          DBytes(generalCiSortKey(s))
        else {
          // a string PK's key bytes follow the source dialect (tidb:
          // always UTF-8; mysql-native: the column charset)
          val cs = col.flatMap(transcoder(meta, _))
            .getOrElse(java.nio.charset.StandardCharsets.UTF_8)
          DBytes(s.getBytes(cs))
        }
      case d: Double => DFloat(d)
      case b: Array[Byte] => DBytes(b)
      case other => throw new IllegalArgumentException(s"unsupported handle value $other")
    }
    def u64Bits(v: Any): Long = v match {
      case d: java.math.BigDecimal => d.toBigInteger.longValue()
      case d: BigDecimal => d.toBigInt.longValue
      case n: Number => n.longValue()
      case other =>
        throw new IllegalArgumentException(s"unsupported unsigned handle $other")
    }
    def handleColType(name: String): Option[org.apache.spark.sql.types.DataType] =
      meta.columns.find(_.name == name).map(sparkType)
    val handle = meta.handleCols match {
      case Seq(one) if handleColType(one).contains(LongType) =>
        IntHandle(byName(one).asInstanceOf[Number].longValue())
      case Seq(one) if handleColType(one).contains(DecimalType(20, 0)) =>
        IntHandle(u64Bits(byName(one))) // unsigned bigint PK
      case cols => CommonHandle(cols.map(n => datumOf(n, byName(n))))
    }
    TiKvCodec.encodeRecordKey(physicalId.getOrElse(meta.tableId), handle)
  }
}
