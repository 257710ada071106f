package graft.functions

import graft.model.MySqlDdl.MySqlCol
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType, DecimalType}
import org.apache.spark.unsafe.types.UTF8String

/** Wire-compatible TiDB e2e row checksum — CRC32-IEEE over per-column
  * little-endian typed bytes, the exact fold of the reference's
  * `buildChecksumBytes`/`calculateChecksum`
  * (pkg/sink/codec/common/verify_checksum.go:90-152, itself tracking
  * tidb util/rowcodec/common.go):
  *
  *  - NULL column → contributes no bytes (verify_checksum.go:112-114)
  *  - integer class (TINY/SHORT/INT24/LONG/LONGLONG/YEAR) → the
  *    datum's uint64 bit pattern, 8 bytes LE (:121-122); signed
  *    negatives fold their two's-complement bits, unsigned BIGINT
  *    above MaxInt64 folds its unsigned value's bits
  *  - FLOAT/DOUBLE → float64 bits LE, with ±Inf/NaN coerced to 0
  *    (:123-128); FLOAT widens float32→float64 first
  *  - ENUM/SET → the numeric value (1-based index / bitmask) as
  *    uint64 LE (:129-132); BIT → its unsigned integer value (:133-135)
  *  - varchar class (char/varchar/text/blob families, DATE/DATETIME/
  *    TIMESTAMP/TIME, DECIMAL, JSON, VECTOR — :136-139) → uint32 LE
  *    length prefix + the canonical string bytes (`%v` of the datum:
  *    MySQL literal forms at declared fsp/scale; blob datums are their
  *    raw bytes); appendLengthValue :148-152
  *  - GEOMETRY/NULL types contribute nothing (:140-141)
  *
  * The per-column `crc32.Update` chain (:104) over buffers b1..bn
  * equals one CRC32-IEEE over their concatenation (CRC32 is a
  * streaming digest), so the plan is
  * `crc32(concat(token(c1), ..., token(cn)))` — one codegen'd
  * projection, no UDF, columns folded in model order (= column-ID
  * order for the DDL-defined tables this engine mounts; the reference
  * requires the same ordering, :88).
  *
  * Documented divergence (same as [[CanalFull]]): JSON values
  * re-render with compact separators where TiDB prints `"k": v`, and
  * float/double `%v` uses Go shortest-form where ours is Java
  * shortest-round-trip — identical for the fixture domain. The
  * mounter-side raw-bytes checksum v1/v2 (pkg/common/event/
  * checksum.go:140-177) additionally folds the KV key via TiDB's
  * rowcodec and is out of scope: it verifies TiKV bytes this engine
  * never sees. This column-level fold is the one the sink protocols
  * carry and downstream consumers re-verify.
  */
object RowChecksum {

  /** 8 little-endian bytes of a long's bit pattern. */
  def tokenLong(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0; var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    b
  }

  /** float64 bits LE; ±Inf/NaN → 0 (verify_checksum.go:125-127). */
  def tokenDouble(v: Double): Array[Byte] = {
    val d = if (java.lang.Double.isInfinite(v) || java.lang.Double.isNaN(v)) 0.0 else v
    tokenLong(java.lang.Double.doubleToLongBits(d))
  }

  /** uint32 LE length prefix + bytes (appendLengthValue :148-152). */
  def tokenBytes(v: Array[Byte]): Array[Byte] = {
    val b = new Array[Byte](4 + v.length)
    val n = v.length
    b(0) = (n & 0xff).toByte; b(1) = ((n >>> 8) & 0xff).toByte
    b(2) = ((n >>> 16) & 0xff).toByte; b(3) = ((n >>> 24) & 0xff).toByte
    System.arraycopy(v, 0, b, 4, n)
    b
  }

  def tokenStr(v: UTF8String): Array[Byte] = tokenBytes(v.getBytes)

  val empty: Array[Byte] = Array.emptyByteArray

  /** Plain-JVM token for a DECODED value (the mounter-side
    * verifyColumnChecksum domain, pkg/common/event/checksum.go:71-112
    * — same byte fold as [[columnToken]], over JVM values instead of
    * Catalyst columns, so [[graft.operators.RawKvMounter]] can verify
    * in-row checksums inside its decode loop without a second plan).
    * `base` is the lowercase MySQL base type; TIME values arrive as
    * GoDuration nanoseconds. */
  def tokenPlain(base: String, value: Any, fsp: Int = 0): Array[Byte] = value match {
    case null => empty
    case v: Long => base match {
      case "time" => tokenBytes(durationLiteral(v, fsp).getBytes("UTF-8"))
      case _ => tokenLong(v) // int classes, BIT, ENUM/SET numeric
    }
    case v: Int => tokenLong(v.toLong)
    case v: Double => tokenDouble(v)
    case v: Float => tokenDouble(v.toDouble)
    case v: java.math.BigDecimal =>
      base match {
        // unsigned BIGINT carried as DECIMAL(20,0): fold the uint64
        // bit pattern like the integer class it is
        case "tinyint" | "smallint" | "mediumint" | "int" | "bigint" | "year" =>
          val big = new java.math.BigDecimal(twoTo64.underlying().toBigInteger)
          val bits =
            if (v.compareTo(java.math.BigDecimal.valueOf(Long.MaxValue)) > 0)
              v.subtract(big).longValueExact()
            else v.longValueExact()
          tokenLong(bits)
        case _ => tokenBytes(v.toPlainString.getBytes("UTF-8"))
      }
    case v: Array[Byte] => tokenBytes(v)
    case v: String => tokenBytes(v.getBytes("UTF-8"))
    case other =>
      throw new IllegalArgumentException(s"unsupported checksum value $other")
  }

  /** CRC32-IEEE over the concatenated tokens (crc32.Update chain). */
  def crc32Plain(tokens: Seq[Array[Byte]]): Long = {
    val c = new java.util.zip.CRC32
    tokens.foreach(t => c.update(t))
    c.getValue
  }

  /** Canonical MySQL TIME literal from GoDuration nanoseconds. */
  def durationLiteral(ns: Long, fsp: Int): String = {
    val neg = ns < 0
    val abs = math.abs(ns)
    val h = abs / 3600000000000L
    val m = (abs / 60000000000L) % 60
    val s = (abs / 1000000000L) % 60
    val micro = (abs / 1000L) % 1000000L
    val baseStr = f"${if (neg) "-" else ""}$h%02d:$m%02d:$s%02d"
    if (fsp > 0) baseStr + "." + f"$micro%06d".take(fsp) else baseStr
  }

  private def token(kind: String, c: Column): Column =
    GraftColumnBridge.column(
      ChecksumTokenExpr(GraftColumnBridge.expression(c), kind))

  private val twoTo64 = BigDecimal("18446744073709551616")

  /** The checksum byte contribution of one column (BinaryType; empty
    * for NULL). `raw` is the canonical raw literal, as everywhere in
    * the codec layer. */
  def columnToken(c: MySqlCol, raw: Column): Column = c.base match {
    case "tinyint" | "smallint" | "mediumint" | "int" | "bigint" | "year" =>
      // two's-complement bits: unsigned values above MaxInt64 wrap
      val d = raw.cast(DecimalType(20, 0))
      val bits = when(d > lit(Long.MaxValue),
        (d - lit(twoTo64.underlying())).cast("long")).otherwise(d.cast("long"))
      token("long", bits)
    case "bit" =>
      token("long", raw.cast(DecimalType(20, 0)).cast("long"))
    case "enum" =>
      // 1-based member index; an invalid stored value folds 0 (the Go
      // datum's Enum.Value), NULL folds nothing
      token("long", when(raw.isNotNull,
        coalesce(array_position(typedlit(c.elems), raw), lit(0L))))
    case "set" =>
      token("long", when(raw.isNotNull, CanalFull.setMask(c, raw)))
    case "float" =>
      token("double", raw.cast("float").cast("double"))
    case "double" =>
      token("double", raw.cast("double"))
    case "geometry" => lit(empty)
    case _ if c.isBinary =>
      token("bytes", CanalFull.binaryBytes(c, raw))
    case _ =>
      token("str", CanalFull.canonicalLiteral(c, raw))
  }

  /** CRC32-IEEE checksum of one row image (`img`.col struct fields),
    * columns in model order — a uint32 carried as long, 0 when every
    * column is NULL (matching the "0 = absent" convention the
    * reference's verify path honors, verify_checksum.go:45). */
  def checksumFor(cols: Seq[MySqlCol], img: String): Column =
    checksumOf(cols, cols.map(c => col(s"$img.${c.name}")))

  /** As [[checksumFor]] over explicit value columns. */
  def checksumOf(cols: Seq[MySqlCol], raws: Seq[Column]): Column =
    crc32(concat(cols.zip(raws).map { case (c, r) => columnToken(c, r) }: _*))

  /** Current/previous checksum pair for an envelope (`after`/`before`
    * structs): the simple-protocol `checksum` block's current/previous
    * fields (simple/message.go:236-241, avro.go:276-286). */
  def withRowChecksum(env: DataFrame, cols: Seq[MySqlCol]): DataFrame =
    env.withColumn("_checksum_current", checksumFor(cols, "after"))
      .withColumn("_checksum_previous", checksumFor(cols, "before"))

  /** Consumer-side verification (VerifyChecksum,
    * verify_checksum.go:34-86): a carried checksum of 0 means "not
    * enabled" and passes; non-zero must equal the recomputation over
    * the decoded image. Corrupt rows flag `_checksum_ok=false`
    * (side-channel, where the reference's correctness level errors). */
  def verify(env: DataFrame, cols: Seq[MySqlCol]): DataFrame =
    env.withColumn("_checksum_ok",
      (col("_checksum_current") === 0L ||
        col("_checksum_current") === checksumFor(cols, "after")) &&
      (col("_checksum_previous") === 0L ||
        col("_checksum_previous") === checksumFor(cols, "before")))
}

/** One column's checksum byte contribution: LE typed bytes per
  * `kind` ("long" | "double" | "str" | "bytes"), EMPTY (not null) on
  * NULL input so a plain `concat` folds the row. */
case class ChecksumTokenExpr(child: Expression, kind: String)
    extends UnaryExpression {

  require(ChecksumTokenExpr.kinds.contains(kind), s"unknown token kind $kind")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) RowChecksum.empty
    else kind match {
      case "long" => RowChecksum.tokenLong(v.asInstanceOf[Long])
      case "double" => RowChecksum.tokenDouble(v.asInstanceOf[Double])
      case "str" => RowChecksum.tokenStr(v.asInstanceOf[UTF8String])
      case "bytes" => RowChecksum.tokenBytes(v.asInstanceOf[Array[Byte]])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val fn = kind match {
      case "long" => "tokenLong"
      case "double" => "tokenDouble"
      case "str" => "tokenStr"
      case "bytes" => "tokenBytes"
    }
    ev.copy(
      code = code"""
        ${c.code}
        byte[] ${ev.value} = ${c.isNull}
          ? graft.functions.RowChecksum.empty()
          : graft.functions.RowChecksum.$fn(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ChecksumTokenExpr =
    copy(child = newChild)
}

object ChecksumTokenExpr {
  private[functions] val kinds = Set("long", "double", "str", "bytes")
}
