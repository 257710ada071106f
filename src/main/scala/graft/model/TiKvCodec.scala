package graft.model

import java.nio.charset.StandardCharsets

/** Byte-level codecs for TiKV record keys and TiDB row values — the
  * wire formats the reference's mounter consumes
  * (pkg/common/event/codec.go:32-120 `decodeTableID`/`decodeRow`,
  * pkg/common/event/mounter.go:71 `tablecodec.DecodeRowKey`). The
  * formats themselves are TiDB's public on-disk contracts:
  *
  *  - **record key**: `'t' ++ EncodeInt(tableID) ++ "_r" ++ handle`
  *    where ints use the memcomparable sign-flipped big-endian form
  *    and a common (non-int) handle is a memcomparable datum list
  *    (TiDB docs "TiDB Computing: mapping of table data to key-value";
  *    codec.go:39 `prefixTableIDLen` = 1+8).
  *  - **row value v1** (old format): a flat `[colID datum][value
  *    datum]…` stream in the flag-prefixed memcomparable datum codec
  *    (codec.go:98-120 `decodeRowV1`, "Row layout: colID1, value1,
  *    colID2, value2").
  *  - **row value v2** (new format, first byte 128): TiDB design doc
  *    2018-07-19-row-format.md — header `version(1) | flag(1) |
  *    notNullCount(u16 LE) | nullCount(u16 LE)`, sorted not-null then
  *    null column-ID arrays (1 byte each, or 4 LE when flag&1), END
  *    offsets (u16 LE, or u32 when big) into the value section, then
  *    per-type compact cells. `rowcodec.IsNewFormat` = first byte
  *    ≥ 128 (codec.go:86).
  *
  * Cell encodings in v2 (TiDB rowcodec): integers as minimal-length
  * little-endian (1/2/4/8 bytes), unsigned likewise, float/double as
  * the 8-byte memcomparable float, CHAR-class/JSON/BLOB raw bytes,
  * DECIMAL as the MySQL binary decimal (precision, scale, 9-digits-
  * per-4-byte-word big-endian with sign flip), DATETIME/TIMESTAMP/DATE
  * as the packed-uint core, TIME as int64 nanoseconds, ENUM/SET/BIT as
  * uint. Trailing bytes after the last offset (the in-row checksum
  * region newer TiDB appends under flag bit 3) are preserved verbatim
  * in [[RowV2.trailing]] — [[graft.functions.RowChecksum]] owns
  * checksum semantics.
  *
  * Everything here is pure bytes→values Scala so the hot path can run
  * inside `mapPartitions` without boxing through Catalyst; see
  * [[graft.operators.RawKvMounter]] for the DataFrame face.
  */
object TiKvCodec {

  // ---- memcomparable primitive codec (tidb pkg/util/codec) ----

  final val NilFlag: Byte = 0
  final val BytesFlag: Byte = 1
  final val CompactBytesFlag: Byte = 2
  final val IntFlag: Byte = 3
  final val UintFlag: Byte = 4
  final val FloatFlag: Byte = 5
  final val DecimalFlag: Byte = 6
  final val DurationFlag: Byte = 7
  final val VarintFlag: Byte = 8
  final val UvarintFlag: Byte = 9
  final val JsonFlag: Byte = 10

  private val SignMask = 0x8000000000000000L

  def encodeInt(v: Long): Array[Byte] = {
    val u = v ^ SignMask
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = ((u >>> (56 - i * 8)) & 0xff).toByte; i += 1 }
    out
  }

  def decodeInt(b: Array[Byte], off: Int): Long = {
    var u = 0L
    var i = 0
    while (i < 8) { u = (u << 8) | (b(off + i) & 0xffL); i += 1 }
    u ^ SignMask
  }

  def encodeUint(v: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = ((v >>> (56 - i * 8)) & 0xff).toByte; i += 1 }
    out
  }

  def decodeUint(b: Array[Byte], off: Int): Long = {
    var u = 0L
    var i = 0
    while (i < 8) { u = (u << 8) | (b(off + i) & 0xffL); i += 1 }
    u
  }

  /** Memcomparable float: IEEE bits, MSB set when ≥ 0 else all bits
    * flipped, big-endian. */
  def encodeFloat(v: Double): Array[Byte] = {
    var bits = java.lang.Double.doubleToLongBits(v)
    bits = if (v >= 0) bits | SignMask else ~bits
    encodeUint(bits)
  }

  def decodeFloat(b: Array[Byte], off: Int): Double = {
    var bits = decodeUint(b, off)
    bits = if ((bits & SignMask) != 0) bits & ~SignMask else ~bits
    java.lang.Double.longBitsToDouble(bits)
  }

  /** Memcomparable bytes: 8-byte groups zero-padded, each followed by
    * a marker byte `0xFF - padCount` (0xFF for a full group). */
  def encodeBytes(data: Array[Byte]): Array[Byte] = {
    val groups = data.length / 8 + 1
    val out = new Array[Byte](groups * 9)
    var g = 0
    while (g < groups) {
      val start = g * 8
      val n = math.min(8, data.length - start)
      System.arraycopy(data, start, out, g * 9, math.max(n, 0))
      out(g * 9 + 8) = (0xff - (8 - math.max(n, 0))).toByte
      g += 1
    }
    out
  }

  /** Decode memcomparable bytes at `off`; returns (data, bytesRead). */
  def decodeBytes(b: Array[Byte], off: Int): (Array[Byte], Int) = {
    val buf = new java.io.ByteArrayOutputStream()
    var p = off
    var done = false
    while (!done) {
      val marker = b(p + 8) & 0xff
      val n = 8 - (0xff - marker)
      buf.write(b, p, n)
      p += 9
      if (n < 8) done = true
    }
    (buf.toByteArray, p - off)
  }

  /** Protobuf-style unsigned varint. */
  def encodeUvarint(v: Long): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    var x = v
    while ((x & ~0x7fL) != 0) { buf.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
    buf.write(x.toInt)
    buf.toByteArray
  }

  def decodeUvarint(b: Array[Byte], off: Int): (Long, Int) = {
    var x = 0L; var s = 0; var p = off
    while (true) {
      val c = b(p) & 0xff
      if (c < 0x80) return (x | (c.toLong << s), p - off + 1)
      x |= (c & 0x7fL) << s
      s += 7; p += 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** Protobuf zigzag varint (binary.PutVarint). */
  def encodeVarint(v: Long): Array[Byte] =
    encodeUvarint((v << 1) ^ (v >> 63))

  def decodeVarint(b: Array[Byte], off: Int): (Long, Int) = {
    val (u, n) = decodeUvarint(b, off)
    ((u >>> 1) ^ -(u & 1), n)
  }

  // ---- one flag-prefixed datum (codec.DecodeOne / CutOne) ----

  sealed trait Datum
  case object DNull extends Datum
  final case class DInt(v: Long) extends Datum
  final case class DUint(v: Long) extends Datum
  final case class DFloat(v: Double) extends Datum
  final case class DBytes(v: Array[Byte]) extends Datum
  final case class DDecimal(v: java.math.BigDecimal) extends Datum
  /** TIME / GoDuration, nanoseconds. */
  final case class DDuration(v: Long) extends Datum

  /** Key-side datum encode (memcomparable forms only — the forms
    * handles and index keys use). */
  def encodeKeyDatum(d: Datum): Array[Byte] = d match {
    case DNull => Array(NilFlag)
    case DInt(v) => IntFlag +: encodeInt(v)
    case DUint(v) => UintFlag +: encodeUint(v)
    case DFloat(v) => FloatFlag +: encodeFloat(v)
    case DBytes(v) => BytesFlag +: encodeBytes(v)
    case DDuration(v) => DurationFlag +: encodeInt(v)
    case DDecimal(_) =>
      throw new UnsupportedOperationException("decimal handle keys unsupported")
  }

  /** Value-side datum encode (the compact forms EncodeValue emits into
    * v1 row values: varint ints, compact bytes). */
  def encodeValueDatum(d: Datum): Array[Byte] = d match {
    case DNull => Array(NilFlag)
    case DInt(v) => VarintFlag +: encodeVarint(v)
    case DUint(v) => UvarintFlag +: encodeUvarint(v)
    case DFloat(v) => FloatFlag +: encodeFloat(v)
    case DBytes(v) => CompactBytesFlag +: (encodeVarint(v.length) ++ v)
    case DDuration(v) => DurationFlag +: encodeInt(v)
    case DDecimal(v) => DecimalFlag +: MyDecimal.encode(v)
  }

  /** Decode one flag-prefixed datum; returns (datum, bytesRead).
    * JSON (flag 10) and unknown flags raise a DESCRIPTIVE error
    * instead of a MatchError: TiDB's JSON binary has no
    * length-prefixed framing this codec can skip, so a v1 row
    * carrying one cannot be partially decoded. */
  def decodeOne(b: Array[Byte], off: Int): (Datum, Int) = b(off) match {
    case NilFlag => (DNull, 1)
    case IntFlag => (DInt(decodeInt(b, off + 1)), 9)
    case UintFlag => (DUint(decodeUint(b, off + 1)), 9)
    case FloatFlag => (DFloat(decodeFloat(b, off + 1)), 9)
    case DurationFlag => (DDuration(decodeInt(b, off + 1)), 9)
    case BytesFlag =>
      val (v, n) = decodeBytes(b, off + 1); (DBytes(v), n + 1)
    case CompactBytesFlag =>
      val (len, n) = decodeVarint(b, off + 1)
      val v = java.util.Arrays.copyOfRange(b, off + 1 + n, off + 1 + n + len.toInt)
      (DBytes(v), 1 + n + len.toInt)
    case VarintFlag =>
      val (v, n) = decodeVarint(b, off + 1); (DInt(v), n + 1)
    case UvarintFlag =>
      val (v, n) = decodeUvarint(b, off + 1); (DUint(v), n + 1)
    case DecimalFlag =>
      val (v, n) = MyDecimal.decode(b, off + 1); (DDecimal(v), n + 1)
    case JsonFlag =>
      throw new IllegalArgumentException(
        "JSON datum (flag 10) is not supported in v1 row decode — " +
          "upgrade the table to row format v2, where JSON cells are opaque bytes")
    case flag =>
      throw new IllegalArgumentException(
        s"unknown datum flag $flag at offset $off (${b.length}-byte buffer)")
  }

  // ---- record keys ----

  /** A row's handle: an int handle or a common (clustered non-int PK)
    * handle of memcomparable datums. */
  sealed trait Handle
  final case class IntHandle(v: Long) extends Handle
  final case class CommonHandle(datums: Seq[Datum]) extends Handle

  private val RecordSep = Array[Byte]('_', 'r')

  def encodeRecordKey(tableID: Long, handle: Handle): Array[Byte] = {
    val h = handle match {
      case IntHandle(v) => encodeInt(v)
      case CommonHandle(ds) => ds.flatMap(encodeKeyDatum).toArray
    }
    Array[Byte]('t') ++ encodeInt(tableID) ++ RecordSep ++ h
  }

  /** Decode `'t' ++ tableID ++ "_r" ++ handle`. An 8-byte rest is an
    * int handle, anything else common-handle datums — exactly
    * tablecodec.DecodeRowKey's length rule. */
  def decodeRecordKey(key: Array[Byte]): (Long, Handle) = {
    require(key.length >= 11 && key(0) == 't' && key(9) == '_' && key(10) == 'r',
      "not a record key")
    val tableID = decodeInt(key, 1)
    val rest = key.length - 11
    val handle =
      if (rest == 8) IntHandle(decodeInt(key, 11))
      else if (rest == 0) IntHandle(0L)
      else {
        val ds = scala.collection.mutable.ArrayBuffer.empty[Datum]
        var p = 11
        while (p < key.length) {
          val (d, n) = decodeOne(key, p); ds += d; p += n
        }
        CommonHandle(ds.toSeq)
      }
    (tableID, handle)
  }

  // ---- row value v2 ----

  /** In-row checksum region (the rowcodec checksum the reference reads
    * via `decoder.GetChecksum`/`GetExtraChecksum`,
    * pkg/common/event/checksum.go:77,92): header byte = version (low 3
    * bits) | extra-present (bit 3), then u32 LE first checksum, then
    * the optional u32 LE extra (the pre-DDL value kept during an
    * online schema change so either side of the change verifies). */
  final case class RowChecksumRegion(version: Int, first: Long, extra: Option[Long])

  final case class RowV2(isBig: Boolean,
                         notNull: IndexedSeq[(Long, Array[Byte])],
                         nullIds: IndexedSeq[Long],
                         trailing: Array[Byte],
                         checksum: Option[RowChecksumRegion] = None) {
    def cell(colId: Long): Option[Array[Byte]] =
      notNull.find(_._1 == colId).map(_._2)
    def isNull(colId: Long): Boolean = nullIds.contains(colId)
  }

  final val CodecVer: Int = 128
  /** Flag bits in the v2 header's second byte. */
  final val FlagBig: Int = 1
  final val FlagChecksum: Int = 8
  private final val ChecksumExtraBit = 8

  def isNewFormat(value: Array[Byte]): Boolean =
    value.nonEmpty && (value(0) & 0xff) >= CodecVer

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  def decodeV2(value: Array[Byte]): RowV2 = {
    require(isNewFormat(value), s"not a v2 row (first byte ${value(0) & 0xff})")
    val big = (value(1) & FlagBig) != 0
    val hasChecksum = (value(1) & FlagChecksum) != 0
    val nNotNull = u16(value, 2)
    val nNull = u16(value, 4)
    val idSize = if (big) 4 else 1
    val offSize = if (big) 4 else 2
    var p = 6
    def colId(i: Int): Long =
      if (big) u32(value, p + i * 4) else (value(p + i) & 0xffL)
    val notNullIds = (0 until nNotNull).map(colId)
    p += nNotNull * idSize
    val nullIds = (0 until nNull).map(colId)
    p += nNull * idSize
    val offs = (0 until nNotNull).map { i =>
      if (big) u32(value, p + i * 4).toInt else u16(value, p + i * 2)
    }
    p += nNotNull * offSize
    val dataStart = p
    var prev = 0
    val cells = (0 until nNotNull).map { i =>
      val end = offs(i)
      val cell = java.util.Arrays.copyOfRange(value, dataStart + prev, dataStart + end)
      prev = end
      (notNullIds(i), cell)
    }
    val trailing = java.util.Arrays.copyOfRange(value, dataStart + prev, value.length)
    val cks =
      if (!hasChecksum || trailing.length < 5) None
      else {
        val hdr = trailing(0) & 0xff
        val version = hdr & 0x7
        val hasExtra = (hdr & ChecksumExtraBit) != 0 && trailing.length >= 9
        Some(RowChecksumRegion(version,
          u32(trailing, 1),
          if (hasExtra) Some(u32(trailing, 5)) else None))
      }
    RowV2(big, cells, nullIds.toIndexedSeq, trailing, cks)
  }

  /** Encode a v2 row. `cells`: colId → Some(cellBytes) | None (null).
    * Column IDs are sorted ascending within each section as TiDB
    * writes them. */
  def encodeV2(cells: Seq[(Long, Option[Array[Byte]])]): Array[Byte] = {
    val notNull = cells.collect { case (id, Some(v)) => (id, v) }.sortBy(_._1)
    val nulls = cells.collect { case (id, None) => id }.sorted
    val big = cells.exists(_._1 > 255) ||
      notNull.map(_._2.length).sum > 0xffff
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(CodecVer)
    buf.write(if (big) 1 else 0)
    def w16(v: Int): Unit = { buf.write(v & 0xff); buf.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      buf.write((v & 0xff).toInt); buf.write(((v >> 8) & 0xff).toInt)
      buf.write(((v >> 16) & 0xff).toInt); buf.write(((v >> 24) & 0xff).toInt)
    }
    def wid(id: Long): Unit = if (big) w32(id) else buf.write(id.toInt)
    def woff(o: Int): Unit = if (big) w32(o.toLong) else w16(o)
    w16(notNull.size); w16(nulls.size)
    notNull.foreach { case (id, _) => wid(id) }
    nulls.foreach(wid)
    var off = 0
    notNull.foreach { case (_, v) => off += v.length; woff(off) }
    notNull.foreach { case (_, v) => buf.write(v, 0, v.length) }
    buf.toByteArray
  }

  /** [[encodeV2]] with the in-row checksum region appended and the
    * checksum flag set. */
  def encodeV2Checksummed(cells: Seq[(Long, Option[Array[Byte]])],
                          first: Long, extra: Option[Long] = None,
                          version: Int = 0): Array[Byte] = {
    val base = encodeV2(cells)
    base(1) = (base(1) | FlagChecksum).toByte
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(base, 0, base.length)
    buf.write((version & 0x7) | (if (extra.isDefined) ChecksumExtraBit else 0))
    def w32(v: Long): Unit = {
      buf.write((v & 0xff).toInt); buf.write(((v >> 8) & 0xff).toInt)
      buf.write(((v >> 16) & 0xff).toInt); buf.write(((v >> 24) & 0xff).toInt)
    }
    w32(first)
    extra.foreach(w32)
    buf.toByteArray
  }

  /** Byte offset where the in-row checksum region starts (= one past
    * the last cell byte), or None when the row carries no region.
    * Walks the v2 header without materializing cells — this is the
    * boundary of the RAW-BYTES checksum domain below. */
  def checksumRegionStart(value: Array[Byte]): Option[Int] = {
    if (!isNewFormat(value) || (value(1) & FlagChecksum) == 0) return None
    val big = (value(1) & FlagBig) != 0
    val nNotNull = u16(value, 2)
    val nNull = u16(value, 4)
    val idSize = if (big) 4 else 1
    val offSize = if (big) 4 else 2
    val offsAt = 6 + (nNotNull + nNull) * idSize
    val dataStart = offsAt + nNotNull * offSize
    val lastOff =
      if (nNotNull == 0) 0
      else if (big) u32(value, offsAt + (nNotNull - 1) * 4).toInt
      else u16(value, offsAt + (nNotNull - 1) * 2)
    val start = dataStart + lastOff
    if (value.length - start >= 5) Some(start) else None
  }

  /** RAW-BYTES checksum (region versions 1/2) — the re-derivation the
    * reference runs in `verifyRawBytesChecksum`
    * (pkg/common/event/checksum.go:140-210, delegating to TiDB
    * rowcodec `CalculateRawChecksum` over the non-null datums + the
    * record key + the handle, checksum.go:154-161). The reference must
    * RE-ENCODE decoded datums (hence its tz/columnID plumbing) because
    * its decoder has already turned the value into a chunk row; this
    * engine verifies BEFORE decode, where the original bytes are still
    * in hand, so the same domain is computed directly: CRC32-IEEE over
    * the stored value bytes up to the checksum region (checksum flag
    * bit as stored, region header + checksum words excluded — the
    * checksum cannot cover itself) followed by the full record key.
    * Both v1 and v2 share this domain, mirroring checksum.go:46's
    * `case 1, 2` dispatch to one function; the version byte records
    * the header generation, not a domain change. Byte-for-byte layout
    * vs real TiKV is pinned by this engine's own golden vectors
    * (RawChecksumSpec hand-assembled bytes) since TiDB's rowcodec is
    * not available to diff against; the write side
    * ([[encodeV2RawChecksummed]]) and this verifier are deliberately
    * independent computations over an explicitly documented domain.
    * Returns None when the row has no checksum region. */
  def rawChecksumOf(value: Array[Byte], key: Array[Byte]): Option[Long] =
    checksumRegionStart(value).map { start =>
      val crc = new java.util.zip.CRC32()
      crc.update(value, 0, start)
      crc.update(key, 0, key.length)
      crc.getValue & 0xFFFFFFFFL
    }

  /** SECOND, independent raw-checksum derivation — the datum
    * re-encode path of the reference's contract
    * (verifyRawBytesChecksum → rowcodec.CalculateRawChecksum,
    * checksum.go:140-177: decode the row, hand the datums back to the
    * codec, re-encode fresh bytes, CRC32-IEEE over them + the record
    * key). Here: fully DECODE the stored v2 row (cells + null-id set),
    * re-encode it canonically with the checksum flag, fold the fresh
    * bytes + key. Agrees with [[rawChecksumOf]] (which folds the
    * STORED bytes without ever decoding) exactly when the codec is
    * canonical — decode∘encode must reproduce the wire bytes bit for
    * bit. TiKvCodecSpec pins the two derivations equal over randomized
    * rows, so the domain is no longer held up only by this repo's own
    * golden vectors: an encoder and a decoder bug would have to cancel
    * to fool both. */
  def rawChecksumReencoded(value: Array[Byte], key: Array[Byte]): Option[Long] =
    checksumRegionStart(value).map { _ =>
      val row = decodeV2(value)
      val cells: Seq[(Long, Option[Array[Byte]])] =
        row.notNull.map { case (id, b) => id -> Some(b) } ++
          row.nullIds.map(_ -> None)
      val fresh = encodeV2(cells)
      fresh(1) = (fresh(1) | FlagChecksum).toByte
      val crc = new java.util.zip.CRC32()
      crc.update(fresh, 0, fresh.length)
      crc.update(key, 0, key.length)
      crc.getValue & 0xFFFFFFFFL
    }

  /** [[encodeV2]] with a RAW-BYTES (v1/v2) checksum region: the
    * checksum is computed over the flagged value bytes + record key
    * (the [[rawChecksumOf]] domain) and embedded. `corrupt` flips the
    * stored word (tamper fixture); `extra` carries the online-DDL
    * second word (excluded from the domain, like the first). */
  def encodeV2RawChecksummed(cells: Seq[(Long, Option[Array[Byte]])],
                             key: Array[Byte], version: Int = 1,
                             extra: Option[Long] = None,
                             corrupt: Boolean = false): Array[Byte] = {
    require(version == 1 || version == 2, s"raw-bytes region version: $version")
    val base = encodeV2(cells)
    base(1) = (base(1) | FlagChecksum).toByte
    val crc = new java.util.zip.CRC32()
    crc.update(base, 0, base.length)
    crc.update(key, 0, key.length)
    val first0 = crc.getValue & 0xFFFFFFFFL
    val first = if (corrupt) (first0 + 1L) & 0xFFFFFFFFL else first0
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(base, 0, base.length)
    buf.write((version & 0x7) | (if (extra.isDefined) ChecksumExtraBit else 0))
    def w32(v: Long): Unit = {
      buf.write((v & 0xff).toInt); buf.write(((v >> 8) & 0xff).toInt)
      buf.write(((v >> 16) & 0xff).toInt); buf.write(((v >> 24) & 0xff).toInt)
    }
    w32(first)
    extra.foreach(w32)
    buf.toByteArray
  }

  // ---- row value v1 ----

  /** v1 row → colID → value datum (codec.go:98-120 layout). */
  def decodeV1(value: Array[Byte]): Map[Long, Datum] = {
    if (value.isEmpty || (value.length == 1 && value(0) == NilFlag)) return Map.empty
    val out = scala.collection.mutable.LinkedHashMap.empty[Long, Datum]
    var p = 0
    while (p < value.length) {
      val (cid, n1) = decodeOne(value, p)
      p += n1
      val (v, n2) = decodeOne(value, p)
      p += n2
      val id = cid match {
        case DInt(i) => i
        case DUint(i) => i
        case other => throw new IllegalArgumentException(s"bad colID datum $other")
      }
      out(id) = v
    }
    out.toMap
  }

  def encodeV1(cells: Seq[(Long, Datum)]): Array[Byte] =
    cells.flatMap { case (id, d) =>
      encodeValueDatum(DInt(id)) ++ encodeValueDatum(d)
    }.toArray

  // ---- typed v2 cells (rowcodec value encodings per column class) ----

  /** Encode a JVM value into a v2 cell for a MySQL base type (lower
    * case, parens stripped — "bigint", "varchar", …). */
  def encodeCell(v: Any, baseType: String, unsigned: Boolean = false): Array[Byte] =
    baseType match {
      case "tinyint" | "smallint" | "mediumint" | "int" | "bigint" | "year" =>
        val x = v.asInstanceOf[Number].longValue()
        if (unsigned) uintCell(x) else intCell(x)
      case "float" | "double" => encodeFloat(v.asInstanceOf[Number].doubleValue())
      case "bit" | "enum" | "set" => uintCell(v.asInstanceOf[Number].longValue())
      case "decimal" | "numeric" => MyDecimal.encode(v match {
        case d: java.math.BigDecimal => d
        case d: BigDecimal => d.bigDecimal
        case s: String => new java.math.BigDecimal(s)
        case n: Number => new java.math.BigDecimal(n.toString)
      })
      case "time" => intCell(v.asInstanceOf[Number].longValue()) // GoDuration ns
      case "date" | "datetime" | "timestamp" =>
        uintCell(PackedTime.pack(v.toString))
      case _ => v match { // varchar/char/text/blob/json/vector: raw bytes
        case b: Array[Byte] => b
        case s: String => s.getBytes(StandardCharsets.UTF_8)
        case other => other.toString.getBytes(StandardCharsets.UTF_8)
      }
    }

  /** Decode a v2 cell back to a JVM value for the base type. String
    * classes return String; binary classes byte arrays; temporal
    * classes their canonical string. */
  def decodeCell(cell: Array[Byte], baseType: String, unsigned: Boolean = false,
                 binary: Boolean = false): Any = baseType match {
    case "tinyint" | "smallint" | "mediumint" | "int" | "bigint" | "year" =>
      if (unsigned) uintCellDecode(cell) else intCellDecode(cell)
    case "float" | "double" => decodeFloat(cell, 0)
    case "bit" | "enum" | "set" => uintCellDecode(cell)
    case "decimal" | "numeric" => MyDecimal.decode(cell, 0)._1
    case "time" => intCellDecode(cell)
    case "date" => PackedTime.unpackDate(uintCellDecode(cell))
    case "datetime" | "timestamp" => PackedTime.unpack(uintCellDecode(cell))
    case "blob" | "binary" | "varbinary" | "longblob" | "mediumblob" | "tinyblob" => cell
    case _ if binary => cell
    case _ => new String(cell, StandardCharsets.UTF_8)
  }

  /** Minimal-length little-endian signed int cell (1/2/4/8 bytes). */
  def intCell(v: Long): Array[Byte] =
    if (v >= Byte.MinValue && v <= Byte.MaxValue) Array(v.toByte)
    else if (v >= Short.MinValue && v <= Short.MaxValue)
      Array(v.toByte, (v >> 8).toByte)
    else if (v >= Int.MinValue && v <= Int.MaxValue)
      Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    else (0 until 8).map(i => (v >> (8 * i)).toByte).toArray

  def intCellDecode(b: Array[Byte]): Long = b.length match {
    case 1 => b(0).toLong
    case 2 => ((b(0) & 0xffL) | ((b(1) & 0xffL) << 8)).toShort.toLong
    case 4 => ((b(0) & 0xffL) | ((b(1) & 0xffL) << 8) | ((b(2) & 0xffL) << 16) |
      ((b(3) & 0xffL) << 24)).toInt.toLong
    case 8 => (0 until 8).map(i => (b(i) & 0xffL) << (8 * i)).reduce(_ | _)
    case n => throw new IllegalArgumentException(s"bad int cell length $n")
  }

  /** Minimal-length little-endian unsigned int cell. */
  def uintCell(v: Long): Array[Byte] =
    if ((v & ~0xffL) == 0) Array(v.toByte)
    else if ((v & ~0xffffL) == 0) Array(v.toByte, (v >> 8).toByte)
    else if ((v & ~0xffffffffL) == 0)
      Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    else (0 until 8).map(i => (v >>> (8 * i)).toByte).toArray

  def uintCellDecode(b: Array[Byte]): Long = b.length match {
    case 1 => b(0) & 0xffL
    case 2 => (b(0) & 0xffL) | ((b(1) & 0xffL) << 8)
    case 4 => (b(0) & 0xffL) | ((b(1) & 0xffL) << 8) | ((b(2) & 0xffL) << 16) |
      ((b(3) & 0xffL) << 24)
    case 8 => (0 until 8).map(i => (b(i) & 0xffL) << (8 * i)).reduce(_ | _)
    case n => throw new IllegalArgumentException(s"bad uint cell length $n")
  }
}

/** The RawKVEntry binary serialization — the event-store / wire frame
  * of one raw change (pkg/common/kv_entry.go:38-48 header layout,
  * :146-175 Encode/Decode; the same frame
  * kv_entry_benchmark_test.go's custom-binary number measures):
  * `op(u32 LE) | crts(u64) | start_ts(u64) | region_id(u64) |
  * key_len(u32) | value_len(u32) | old_value_len(u32) | key | value |
  * old_value`, header = 40 bytes. Op codes: 1 put, 2 delete,
  * 3 resolved (kv_entry.go:24-29). */
object RawKvEntryCodec {

  final val OpPut = 1
  final val OpDelete = 2
  final val OpResolved = 3
  final val HeaderSize = 40

  final case class RawEntry(opType: Int, crts: Long, startTs: Long,
                            regionId: Long, key: Array[Byte],
                            value: Array[Byte], oldValue: Array[Byte]) {
    def isResolved: Boolean = opType == OpResolved
    def opTypeName: String = opType match {
      case OpDelete => "delete"
      case OpResolved => "resolved"
      case _ => "put"
    }
  }

  // single-allocation encode / bulk-read decode: the frame is the
  // event-store hot path (the Go side does this in 389 ns/op with one
  // allocation), so header fields go through VarHandle-free manual
  // LE stores and payloads through System.arraycopy
  private def putInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }
  private def putLong(b: Array[Byte], off: Int, v: Long): Unit = {
    putInt(b, off, v.toInt); putInt(b, off + 4, (v >>> 32).toInt)
  }
  private def r32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def r64(b: Array[Byte], off: Int): Long =
    r32(b, off) | (r32(b, off + 4) << 32)

  def encode(e: RawEntry): Array[Byte] = {
    val key = if (e.key == null) Array.emptyByteArray else e.key
    val value = if (e.value == null) Array.emptyByteArray else e.value
    val old = if (e.oldValue == null) Array.emptyByteArray else e.oldValue
    val out = new Array[Byte](HeaderSize + key.length + value.length + old.length)
    putInt(out, 0, e.opType)
    putLong(out, 4, e.crts)
    putLong(out, 12, e.startTs)
    putLong(out, 20, e.regionId)
    putInt(out, 28, key.length)
    putInt(out, 32, value.length)
    putInt(out, 36, old.length)
    var p = HeaderSize
    System.arraycopy(key, 0, out, p, key.length); p += key.length
    System.arraycopy(value, 0, out, p, value.length); p += value.length
    System.arraycopy(old, 0, out, p, old.length)
    out
  }

  /** Zero-copy decode — the Go side's actual semantics (its Decode
    * returns slices INTO `data`; kv_entry.go:169 "do not keep
    * reference"): header fields parse eagerly, payload sections stay
    * offsets into the input until materialized. Use when the caller
    * consumes the entry before the buffer is reused; [[decode]]
    * copies for retain-safe callers. */
  final class RawEntryView(val data: Array[Byte]) {
    require(data.length >= HeaderSize, "insufficient data length")
    val opType: Int = r32(data, 0).toInt
    val crts: Long = r64(data, 4)
    val startTs: Long = r64(data, 12)
    val regionId: Long = r64(data, 20)
    val keyLen: Int = r32(data, 28).toInt
    val valueLen: Int = r32(data, 32).toInt
    val oldValueLen: Int = r32(data, 36).toInt
    require(data.length >= HeaderSize + keyLen + valueLen + oldValueLen,
      "truncated entry")
    def isResolved: Boolean = opType == OpResolved
    def key: Array[Byte] =
      java.util.Arrays.copyOfRange(data, HeaderSize, HeaderSize + keyLen)
    def value: Array[Byte] = java.util.Arrays.copyOfRange(data,
      HeaderSize + keyLen, HeaderSize + keyLen + valueLen)
    def oldValue: Array[Byte] = java.util.Arrays.copyOfRange(data,
      HeaderSize + keyLen + valueLen, HeaderSize + keyLen + valueLen + oldValueLen)
  }

  def decodeView(data: Array[Byte]): RawEntryView = new RawEntryView(data)

  def decode(data: Array[Byte]): RawEntry = {
    require(data.length >= HeaderSize, "insufficient data length")
    val op = r32(data, 0).toInt
    val crts = r64(data, 4)
    val startTs = r64(data, 12)
    val regionId = r64(data, 20)
    val keyLen = r32(data, 28).toInt
    val valueLen = r32(data, 32).toInt
    val oldLen = r32(data, 36).toInt
    require(data.length >= HeaderSize + keyLen + valueLen + oldLen, "truncated entry")
    val key = java.util.Arrays.copyOfRange(data, HeaderSize, HeaderSize + keyLen)
    val value = java.util.Arrays.copyOfRange(data, HeaderSize + keyLen,
      HeaderSize + keyLen + valueLen)
    val old = java.util.Arrays.copyOfRange(data, HeaderSize + keyLen + valueLen,
      HeaderSize + keyLen + valueLen + oldLen)
    RawEntry(op, crts, startTs, regionId, key, value, old)
  }
}

/** MessagePack form of the RawKVEntry — the `msg:"…"` tags on
  * pkg/common/kv_entry.go:53-70 compiled by tinylib/msgp into a
  * 10-field map with struct-ordered string keys, minimal-width
  * unsigned ints, and bin-family byte sections (the middle row of
  * kv_entry_benchmark_test.go: 945.7 ns/op). Encode writes the
  * generated code's exact byte choices (fixmap, fixstr keys, smallest
  * uint form, bin8/16/32 by length); decode accepts any well-formed
  * msgpack widths so foreign encoders interoperate. */
object RawKvEntryMsgp {
  import RawKvEntryCodec.RawEntry

  private val keyBytes: Array[Array[Byte]] =
    Array("op_type", "crts", "start_ts", "region_id", "key_len", "value_len",
      "old_value_len", "key", "value", "old_value").map(_.getBytes("UTF-8"))

  private def uintSize(v: Long): Int =
    if (v >= 0 && v < 128) 1
    else if (v >= 0 && v <= 0xffL) 2
    else if (v >= 0 && v <= 0xffffL) 3
    else if (v >= 0 && v <= 0xffffffffL) 5
    else 9

  private def binHeadSize(n: Int): Int =
    if (n <= 0xff) 2 else if (n <= 0xffff) 3 else 5

  // single exact-size buffer (the generated Go code appends into one
  // pre-grown slice the same way)
  private final class W(val buf: Array[Byte]) {
    var p = 0
    def u8(v: Int): Unit = { buf(p) = v.toByte; p += 1 }
    def uint(v: Long): Unit = {
      if (v >= 0 && v < 128) u8(v.toInt)
      else if (v >= 0 && v <= 0xffL) { u8(0xcc); u8(v.toInt) }
      else if (v >= 0 && v <= 0xffffL) { u8(0xcd); u8((v >> 8).toInt); u8((v & 0xff).toInt) }
      else if (v >= 0 && v <= 0xffffffffL) {
        u8(0xce)
        var i = 3
        while (i >= 0) { u8(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
      } else {
        u8(0xcf)
        var i = 7
        while (i >= 0) { u8(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
      }
    }
    def str(b: Array[Byte]): Unit = {
      u8(0xa0 | b.length)
      System.arraycopy(b, 0, buf, p, b.length); p += b.length
    }
    def bin(b: Array[Byte]): Unit = {
      val n = b.length
      if (n <= 0xff) { u8(0xc4); u8(n) }
      else if (n <= 0xffff) { u8(0xc5); u8(n >> 8); u8(n & 0xff) }
      else {
        u8(0xc6)
        var i = 3
        while (i >= 0) { u8((n >>> (8 * i)) & 0xff); i -= 1 }
      }
      System.arraycopy(b, 0, buf, p, n); p += n
    }
  }

  def encode(e: RawEntry): Array[Byte] = {
    val key = if (e.key == null) Array.emptyByteArray else e.key
    val value = if (e.value == null) Array.emptyByteArray else e.value
    val old = if (e.oldValue == null) Array.emptyByteArray else e.oldValue
    var size = 1 // fixmap tag
    var i = 0
    while (i < keyBytes.length) { size += 1 + keyBytes(i).length; i += 1 }
    size += uintSize(e.opType.toLong) + uintSize(e.crts) + uintSize(e.startTs) +
      uintSize(e.regionId) + uintSize(key.length.toLong) +
      uintSize(value.length.toLong) + uintSize(old.length.toLong) +
      binHeadSize(key.length) + key.length +
      binHeadSize(value.length) + value.length +
      binHeadSize(old.length) + old.length
    val w = new W(new Array[Byte](size))
    w.u8(0x80 | keyBytes.length) // fixmap(10)
    w.str(keyBytes(0)); w.uint(e.opType.toLong)
    w.str(keyBytes(1)); w.uint(e.crts)
    w.str(keyBytes(2)); w.uint(e.startTs)
    w.str(keyBytes(3)); w.uint(e.regionId)
    w.str(keyBytes(4)); w.uint(key.length.toLong)
    w.str(keyBytes(5)); w.uint(value.length.toLong)
    w.str(keyBytes(6)); w.uint(old.length.toLong)
    w.str(keyBytes(7)); w.bin(key)
    w.str(keyBytes(8)); w.bin(value)
    w.str(keyBytes(9)); w.bin(old)
    w.buf
  }

  def decode(data: Array[Byte]): RawEntry = {
    var p = 0
    def u8(): Int = { val v = data(p) & 0xff; p += 1; v }
    def beN(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (data(p + i) & 0xffL); i += 1 }
      p += n; v
    }
    def readUint(): Long = {
      val t = u8()
      if (t < 0x80) t.toLong
      else t match {
        case 0xcc => beN(1)
        case 0xcd => beN(2)
        case 0xce => beN(4)
        case 0xcf => beN(8)
        case other => throw new IllegalArgumentException(f"not a uint tag 0x$other%02x")
      }
    }
    /** Field dispatch without a String allocation: the 10 field names
      * are distinguishable by (length, first byte). Returns the field
      * index in [[keyBytes]]. */
    def readFieldKey(): Int = {
      val t = u8()
      val n =
        if ((t & 0xe0) == 0xa0) t & 0x1f
        else if (t == 0xd9) beN(1).toInt
        else throw new IllegalArgumentException(f"not a str tag 0x$t%02x")
      val first = data(p)
      p += n
      // packed (length << 8 | first byte) — a primitive tableswitch,
      // no tuple boxing on the hot path (10 dispatches per entry)
      (n << 8) | (first & 0xff) match {
        case 0x76F => 0 // (7,'o') op_type
        case 0x463 => 1 // (4,'c') crts
        case 0x873 => 2 // (8,'s') start_ts
        case 0x972 => 3 // (9,'r') region_id
        case 0x76B => 4 // (7,'k') key_len
        case 0x976 => 5 // (9,'v') value_len
        case 0xD6F => 6 // (13,'o') old_value_len
        case 0x36B => 7 // (3,'k') key
        case 0x576 => 8 // (5,'v') value
        case 0x96F => 9 // (9,'o') old_value
        case _ =>
          throw new IllegalArgumentException(
            s"unknown field ${new String(data, p - n, n, "UTF-8")}")
      }
    }
    def readBin(): Array[Byte] = {
      val t = u8()
      val n = t match {
        case 0xc0 => return Array.emptyByteArray // nil slice
        case 0xc4 => beN(1).toInt
        case 0xc5 => beN(2).toInt
        case 0xc6 => beN(4).toInt
        case other => throw new IllegalArgumentException(f"not a bin tag 0x$other%02x")
      }
      val out = java.util.Arrays.copyOfRange(data, p, p + n); p += n; out
    }
    val mapTag = u8()
    val nFields =
      if ((mapTag & 0xf0) == 0x80) mapTag & 0x0f
      else if (mapTag == 0xde) beN(2).toInt
      else throw new IllegalArgumentException(f"not a map tag 0x$mapTag%02x")
    var op = 0; var crts = 0L; var start = 0L; var region = 0L
    var key: Array[Byte] = Array.emptyByteArray
    var value: Array[Byte] = Array.emptyByteArray
    var old: Array[Byte] = Array.emptyByteArray
    var i = 0
    while (i < nFields) {
      readFieldKey() match {
        case 0 => op = readUint().toInt
        case 1 => crts = readUint()
        case 2 => start = readUint()
        case 3 => region = readUint()
        case 4 | 5 | 6 => readUint()
        case 7 => key = readBin()
        case 8 => value = readBin()
        case 9 => old = readBin()
      }
      i += 1
    }
    RawEntry(op, crts, start, region, key, value, old)
  }
}

/** The 16-byte event wire header every inter-node event frame starts
  * with (pkg/common/event/header.go:21-80; design doc
  * 2025-11-09-ticdc-event-encoding-architecture.md "Wire Format"):
  * `MAGIC(4B BE = 0xDA7A6A6A) | EVENT_TYPE(2B BE) | VERSION(2B BE) |
  * PAYLOAD_LENGTH(8B BE)` then the payload. Event type tags per
  * pkg/common/event/interface.go:61-79. */
object EventHeaderCodec {

  final val Magic = 0xDA7A6A6AL
  final val HeaderSize = 16

  // interface.go:61-79 type tags
  final val TypeDML = 0
  final val TypeBatchDML = 1
  final val TypeDDL = 2
  final val TypeResolved = 3
  final val TypeSyncPoint = 5
  final val TypeReady = 6
  final val TypeHandshake = 7
  final val TypeNotReusable = 8
  final val TypeDrop = 9

  /** MarshalEventWithHeader (header.go:40-52). */
  def marshal(eventType: Int, version: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](HeaderSize + payload.length)
    def be32(off: Int, v: Long): Unit = {
      out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
      out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
    }
    be32(0, Magic)
    out(4) = (eventType >>> 8).toByte; out(5) = eventType.toByte
    out(6) = (version >>> 8).toByte; out(7) = version.toByte
    be32(8, payload.length.toLong >>> 32)
    be32(12, payload.length.toLong & 0xffffffffL)
    System.arraycopy(payload, 0, out, HeaderSize, payload.length)
    out
  }

  /** UnmarshalEventHeader (header.go:63-80): (type, version, payload).
    * Throws on short data or bad magic — the reference's validation
    * errors. */
  def unmarshal(data: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(data.length >= HeaderSize,
      s"data too short: need at least $HeaderSize bytes for header, got ${data.length}")
    def be32(off: Int): Long =
      ((data(off) & 0xffL) << 24) | ((data(off + 1) & 0xffL) << 16) |
        ((data(off + 2) & 0xffL) << 8) | (data(off + 3) & 0xffL)
    val magic = be32(0)
    require(magic == Magic,
      f"invalid magic bytes: expected [0x$Magic%08X], got [0x$magic%08X]")
    val eventType = ((data(4) & 0xff) << 8) | (data(5) & 0xff)
    val version = ((data(6) & 0xff) << 8) | (data(7) & 0xff)
    val len = (be32(8) << 32) | be32(12)
    require(data.length >= HeaderSize + len,
      s"truncated payload: declared $len, have ${data.length - HeaderSize}")
    (eventType, version,
      java.util.Arrays.copyOfRange(data, HeaderSize, HeaderSize + len.toInt))
  }
}

/** MySQL binary decimal (myDecimal) — the on-disk DECIMAL format both
  * row formats embed (TiDB types/mydecimal.go `WriteBin`; layout from
  * the MySQL source strings/decimal.c `decimal2bin` documentation):
  * digits are packed 9 per 4-byte big-endian word, the partial
  * leading/trailing groups use the minimal byte count
  * (dig2bytes = 0,1,1,2,2,3,3,4,4,4), and a negative number flips
  * every byte; the first byte's MSB is then flipped so unsigned byte
  * comparison orders numerically. The codec form (codec.EncodeDecimal)
  * prepends precision and fraction-digit count bytes. */
object MyDecimal {

  private val dig2bytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)

  /** Encode with codec header: precision byte, frac byte, bin body. */
  def encode(v: java.math.BigDecimal): Array[Byte] = {
    val frac = math.max(v.scale, 0)
    val plain = v.setScale(frac).unscaledValue.abs.toString
    val intDigits = math.max(plain.length - frac, 1)
    val precision = intDigits + frac
    Array(precision.toByte, frac.toByte) ++ writeBin(v, precision, frac)
  }

  def writeBin(v: java.math.BigDecimal, precision: Int, frac: Int): Array[Byte] = {
    val neg = v.signum < 0
    val scaled = v.abs.setScale(frac, java.math.RoundingMode.HALF_UP)
    val unscaled = scaled.unscaledValue.toString
    val intDigits = precision - frac
    // left-pad the integer part to `intDigits`, fraction is exact
    val allDigits = ("0" * math.max(0, intDigits + frac - unscaled.length)) + unscaled
    val intPart = allDigits.substring(0, intDigits)
    val fracPart = allDigits.substring(intDigits)

    val buf = new java.io.ByteArrayOutputStream()
    // integer part: leading partial group (from the left), then full
    // 9-digit groups
    val intLead = intDigits % 9
    var pos = 0
    if (intLead > 0) {
      writeWord(buf, intPart.substring(0, intLead).toLong, dig2bytes(intLead))
      pos = intLead
    }
    while (pos < intDigits) {
      writeWord(buf, intPart.substring(pos, pos + 9).toLong, 4)
      pos += 9
    }
    // fraction part: full groups then trailing partial
    pos = 0
    while (pos + 9 <= frac) {
      writeWord(buf, fracPart.substring(pos, pos + 9).toLong, 4)
      pos += 9
    }
    val fracTail = frac - pos
    if (fracTail > 0)
      writeWord(buf, fracPart.substring(pos).toLong, dig2bytes(fracTail))

    val out = buf.toByteArray
    if (neg) { var i = 0; while (i < out.length) { out(i) = (~out(i)).toByte; i += 1 } }
    out(0) = (out(0) ^ 0x80).toByte
    out
  }

  private def writeWord(buf: java.io.ByteArrayOutputStream, v: Long, bytes: Int): Unit = {
    var i = bytes - 1
    while (i >= 0) { buf.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  /** Decode a codec-form decimal at `off`; returns (value, bytesRead
    * including the 2 header bytes). */
  def decode(b: Array[Byte], off: Int): (java.math.BigDecimal, Int) = {
    val precision = b(off) & 0xff
    val frac = b(off + 1) & 0xff
    val intDigits = precision - frac
    val intLead = intDigits % 9
    val binSize = dig2bytes(intLead) + (intDigits / 9) * 4 +
      (frac / 9) * 4 + dig2bytes(frac % 9)
    val bin = java.util.Arrays.copyOfRange(b, off + 2, off + 2 + binSize)
    bin(0) = (bin(0) ^ 0x80).toByte
    val neg = (bin(0) & 0x80) != 0
    if (neg) { var i = 0; while (i < bin.length) { bin(i) = (~bin(i)).toByte; i += 1 } }

    val sb = new StringBuilder
    var p = 0
    def readWord(bytes: Int): Long = {
      var v = 0L
      var i = 0
      while (i < bytes) { v = (v << 8) | (bin(p + i) & 0xffL); i += 1 }
      p += bytes
      v
    }
    if (intLead > 0) sb.append(padded(readWord(dig2bytes(intLead)), intLead))
    var g = 0
    while (g < intDigits / 9) { sb.append(padded(readWord(4), 9)); g += 1 }
    if (sb.isEmpty) sb.append('0')
    val intStr = sb.toString
    sb.clear()
    g = 0
    while (g < frac / 9) { sb.append(padded(readWord(4), 9)); g += 1 }
    val fracTail = frac % 9
    if (fracTail > 0) sb.append(padded(readWord(dig2bytes(fracTail)), fracTail))
    val s = (if (neg) "-" else "") + stripLeadingZeros(intStr) +
      (if (frac > 0) "." + sb.toString else "")
    (new java.math.BigDecimal(s), 2 + binSize)
  }

  private def padded(v: Long, digits: Int): String = {
    val s = v.toString
    ("0" * math.max(0, digits - s.length)) + s
  }

  private def stripLeadingZeros(s: String): String = {
    val t = s.dropWhile(_ == '0')
    if (t.isEmpty) "0" else t
  }
}

/** MySQL packed temporal core (TiDB types.Time `ToPackedUint`): the
  * uint64 both row formats store for DATE/DATETIME/TIMESTAMP —
  * `(((year*13+month)<<5 | day) << 17 | hour<<12 | minute<<6 |
  * second) << 24 | microsecond`. */
object PackedTime {

  private val DateTimeRe =
    """(\d{4})-(\d{2})-(\d{2})(?:[ T](\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,6}))?)?""".r

  def pack(canonical: String): Long = canonical match {
    case DateTimeRe(y, mo, d, h, mi, s, us) =>
      val ymd = (y.toLong * 13 + mo.toLong) << 5 | d.toLong
      val hms =
        if (h == null) 0L
        else h.toLong << 12 | mi.toLong << 6 | s.toLong
      val micro = if (us == null) 0L else (us + "0" * (6 - us.length)).toLong
      ((ymd << 17) | hms) << 24 | micro
    case other => throw new IllegalArgumentException(s"bad temporal literal '$other'")
  }

  /** TIMESTAMP columns store the packed core in UTC; the mounter
    * renders them in the changefeed's time zone (the `tz` the
    * reference threads through its mounter/filter,
    * pkg/filter/filter.go:102). DATETIME is zone-naive and never
    * shifts. */
  def unpackInZone(packed: Long, zone: java.time.ZoneId): String = {
    if (packed == 0L) return unpack(packed)
    val utc = unpack(packed)
    val fmt = java.time.format.DateTimeFormatter.ofPattern(
      if (utc.length > 19) "yyyy-MM-dd HH:mm:ss.SSSSSS" else "yyyy-MM-dd HH:mm:ss")
    val ldt = java.time.LocalDateTime.parse(utc, fmt)
    ldt.atZone(java.time.ZoneOffset.UTC).withZoneSameInstant(zone)
      .toLocalDateTime.format(fmt)
  }

  def unpack(packed: Long): String = {
    val micro = packed & ((1L << 24) - 1)
    val ymdhms = packed >>> 24
    val ymd = ymdhms >>> 17
    val hms = ymdhms & ((1L << 17) - 1)
    val day = ymd & 31
    val ym = ymd >>> 5
    val year = ym / 13
    val month = ym % 13
    val base = f"$year%04d-$month%02d-$day%02d ${hms >>> 12}%02d:${(hms >>> 6) & 63}%02d:${hms & 63}%02d"
    if (micro > 0) base + "." + f"$micro%06d" else base
  }

  def unpackDate(packed: Long): String = unpack(packed).substring(0, 10)
}
