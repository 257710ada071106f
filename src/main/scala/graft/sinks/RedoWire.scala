package graft.sinks

import java.io.FileOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** The reference's REDO LOG v2 on-disk wire format, byte-exact — so a
  * real upstream redo directory can be replayed by this engine and a
  * directory written here can be consumed by the reference's
  * `cdc redo apply`.
  *
  * Format (all layouts from the reference's generated codecs, which
  * are the normative spec):
  *  - record = 0xFFFF version-prefix + uint16 BE version (latest 2) +
  *    msgpack(RedoLog) (pkg/redo/codec/codec.go:37-96);
  *  - RedoLog and friends are tinylib/msgp maps with fixed key order
  *    (pkg/common/event/redo_gen.go; field tables below);
  *  - file framing is the etcd-WAL frame: int64 LE length field whose
  *    low 56 bits are the record size; a set sign bit marks padding,
  *    stored in the low 3 bits of the top byte; records pad to 8-byte
  *    alignment (pkg/redo/writer/writer.go:77-84, reader/file.go:372);
  *  - file names `capture_changefeed_{row|ddl}_maxCommitTs_uuid.log`
  *    and `capture_keyspace_changefeed_meta_uuid.meta`
  *    (pkg/redo/config.go:272-280, writer/file/file.go:461-474);
  *  - meta = msgpack LogMeta {checkpointTs, resolvedTs, version};
  *    multiple metas fold by MAX on both fields
  *    (pkg/redo/common/redo_meta.go:25-50).
  *
  * The msgpack subset here reproduces tinylib/msgp's exact compact
  * forms — notably its ASYMMETRIC integer rule: AppendInt64 uses the
  * SIGNED families for positive values (128 → 0xd1 int16), while
  * AppendUint64 uses the unsigned families (128 → 0xcc uint8) — so
  * encode output is byte-identical to the Go writer, not merely
  * msgpack-valid.
  */
object RedoWire {

  // ---------------------------------------------------------------
  // minimal msgpack, tinylib-compatible
  // ---------------------------------------------------------------

  final class MsgWriter(initial: Int = 256) {
    private var buf = new Array[Byte](initial)
    private var p = 0
    private def ensure(n: Int): Unit =
      if (p + n > buf.length) {
        var cap = buf.length * 2
        while (cap < p + n) cap *= 2
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    def u8(v: Int): this.type = { ensure(1); buf(p) = v.toByte; p += 1; this }
    private def beBytes(v: Long, n: Int): Unit = {
      ensure(n)
      var i = n - 1
      while (i >= 0) { buf(p) = ((v >>> (8 * i)) & 0xff).toByte; p += 1; i -= 1 }
    }
    def raw(b: Array[Byte]): this.type = {
      ensure(b.length); System.arraycopy(b, 0, buf, p, b.length); p += b.length; this
    }
    def mapHeader(n: Int): this.type = {
      require(n < 16, "fixmap only"); u8(0x80 | n)
    }
    def arrayHeader(n: Int): this.type =
      if (n < 16) u8(0x90 | n)
      else if (n <= 0xffff) { u8(0xdc); beBytes(n.toLong, 2); this }
      else { u8(0xdd); beBytes(n.toLong, 4); this }
    def str(s: String): this.type = {
      val b = s.getBytes("UTF-8")
      if (b.length < 32) u8(0xa0 | b.length)
      else if (b.length <= 0xff) { u8(0xd9); u8(b.length) }
      else if (b.length <= 0xffff) { u8(0xda); beBytes(b.length.toLong, 2) }
      else { u8(0xdb); beBytes(b.length.toLong, 4) }
      raw(b)
    }
    def bin(b: Array[Byte]): this.type = {
      if (b.length <= 0xff) { u8(0xc4); u8(b.length) }
      else if (b.length <= 0xffff) { u8(0xc5); beBytes(b.length.toLong, 2) }
      else { u8(0xc6); beBytes(b.length.toLong, 4) }
      raw(b)
    }
    /** tinylib AppendUint64: unsigned families. */
    def uint(v: Long): this.type = {
      if (v >= 0 && v <= 127) u8(v.toInt)
      else if (v >= 0 && v <= 0xffL) { u8(0xcc); u8(v.toInt) }
      else if (v >= 0 && v <= 0xffffL) { u8(0xcd); beBytes(v, 2); this }
      else if (v >= 0 && v <= 0xffffffffL) { u8(0xce); beBytes(v, 4); this }
      else { u8(0xcf); beBytes(v, 8); this } // incl. u64 bit patterns < 0
    }
    /** tinylib AppendInt64: SIGNED families even for positive values. */
    def int(v: Long): this.type = {
      if (v >= 0) {
        if (v <= 127) u8(v.toInt)
        else if (v <= Short.MaxValue) { u8(0xd1); beBytes(v, 2); this }
        else if (v <= Int.MaxValue) { u8(0xd2); beBytes(v, 4); this }
        else { u8(0xd3); beBytes(v, 8); this }
      } else {
        if (v >= -32) u8(0xe0 | (v & 0x1f).toInt)
        else if (v >= Byte.MinValue) { u8(0xd0); u8((v & 0xff).toInt) }
        else if (v >= Short.MinValue) { u8(0xd1); beBytes(v, 2); this }
        else if (v >= Int.MinValue) { u8(0xd2); beBytes(v, 4); this }
        else { u8(0xd3); beBytes(v, 8); this }
      }
    }
    /** tinylib AppendByte = AppendUint8. */
    def byte8(v: Int): this.type =
      if ((v & 0xff) <= 127) u8(v & 0xff) else { u8(0xcc); u8(v & 0xff) }
    def bool(v: Boolean): this.type = u8(if (v) 0xc3 else 0xc2)
    def nil(): this.type = u8(0xc0)
    def float64(v: Double): this.type = {
      u8(0xcb); beBytes(java.lang.Double.doubleToLongBits(v), 8); this
    }
    /** tinylib AppendIntf over the value types TiCDC column values
      * take (ints, uint64 bit patterns, strings, bytes, bool, float,
      * null). A Long routes through the SIGNED form — the Go side's
      * column values are typed int64/uint64 before marshal, so callers
      * that mean uint64 must call [[uint]] via [[anyUnsigned]]. */
    def any(v: Any): this.type = v match {
      case null => nil()
      case s: String => str(s)
      case b: Array[Byte] => bin(b)
      case b: Boolean => bool(b)
      case l: Long => int(l)
      case i: Int => int(i.toLong)
      case d: Double => float64(d)
      case f: Float => { u8(0xca); beBytes(java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL, 4); this }
      case d: java.math.BigDecimal => str(d.toPlainString) // decimals travel as strings
      case other => str(other.toString)
    }
    def anyUnsigned(v: Long): this.type = uint(v)
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, p)
  }

  final class MsgReader(val buf: Array[Byte], var p: Int = 0) {
    private def u8(): Int = { val v = buf(p) & 0xff; p += 1; v }
    private def be(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (buf(p + i) & 0xffL); i += 1 }
      p += n; v
    }
    def readMapHeader(): Int = {
      val t = u8()
      if ((t & 0xf0) == 0x80) t & 0x0f
      else if (t == 0xde) be(2).toInt
      else if (t == 0xdf) be(4).toInt
      else throw new IllegalArgumentException(f"not a map tag 0x$t%02x at ${p - 1}")
    }
    def readArrayHeader(): Int = {
      val t = u8()
      if ((t & 0xf0) == 0x90) t & 0x0f
      else if (t == 0xdc) be(2).toInt
      else if (t == 0xdd) be(4).toInt
      else throw new IllegalArgumentException(f"not an array tag 0x$t%02x")
    }
    def readStr(): String = {
      val t = u8()
      val n =
        if ((t & 0xe0) == 0xa0) t & 0x1f
        else if (t == 0xd9) be(1).toInt
        else if (t == 0xda) be(2).toInt
        else if (t == 0xdb) be(4).toInt
        else throw new IllegalArgumentException(f"not a str tag 0x$t%02x")
      val s = new String(buf, p, n, "UTF-8"); p += n; s
    }
    def readBin(): Array[Byte] = {
      val t = u8()
      val n = t match {
        case 0xc4 => be(1).toInt
        case 0xc5 => be(2).toInt
        case 0xc6 => be(4).toInt
        case other => throw new IllegalArgumentException(f"not a bin tag 0x$other%02x")
      }
      val out = java.util.Arrays.copyOfRange(buf, p, p + n); p += n; out
    }
    def isNil: Boolean = (buf(p) & 0xff) == 0xc0
    def readNil(): Unit = { require(isNil); p += 1 }
    def readBool(): Boolean = u8() match {
      case 0xc3 => true
      case 0xc2 => false
      case other => throw new IllegalArgumentException(f"not a bool 0x$other%02x")
    }
    /** Signed OR unsigned integer forms → Long (u64 as bit pattern). */
    def readLong(): Long = {
      val t = u8()
      if (t < 0x80) t.toLong
      else if (t >= 0xe0) (t - 256).toLong // negative fixint
      else t match {
        case 0xcc => be(1)
        case 0xcd => be(2)
        case 0xce => be(4)
        case 0xcf => be(8)
        case 0xd0 => be(1).toByte.toLong
        case 0xd1 => be(2).toShort.toLong
        case 0xd2 => be(4).toInt.toLong
        case 0xd3 => be(8)
        case other => throw new IllegalArgumentException(f"not an int tag 0x$other%02x")
      }
    }
    def readAny(): Any = {
      val t = buf(p) & 0xff
      if (t == 0xc0) { p += 1; null }
      else if (t == 0xc2 || t == 0xc3) readBool()
      else if ((t & 0xe0) == 0xa0 || t == 0xd9 || t == 0xda || t == 0xdb) readStr()
      else if (t == 0xc4 || t == 0xc5 || t == 0xc6) readBin()
      else if (t == 0xcb) { p += 1; java.lang.Double.longBitsToDouble({ var v = 0L; var i = 0; while (i < 8) { v = (v << 8) | (buf(p + i) & 0xffL); i += 1 }; p += 8; v }) }
      else if (t == 0xca) { p += 1; java.lang.Float.intBitsToFloat({ var v = 0; var i = 0; while (i < 4) { v = (v << 8) | (buf(p + i) & 0xff); i += 1 }; p += 4; v }).toDouble }
      else readLong()
    }
    /** msgp.Skip — forward-compat for unknown fields. */
    def skip(): Unit = {
      val t = u8()
      if (t < 0x80 || t >= 0xe0) ()            // fixint
      else if ((t & 0xe0) == 0xa0) p += t & 0x1f // fixstr
      else if ((t & 0xf0) == 0x90) { var n = t & 0x0f; while (n > 0) { skip(); n -= 1 } }
      else if ((t & 0xf0) == 0x80) { var n = (t & 0x0f) * 2; while (n > 0) { skip(); n -= 1 } }
      else t match {
        case 0xc0 | 0xc2 | 0xc3 => ()
        case 0xcc | 0xd0 => p += 1
        case 0xcd | 0xd1 => p += 2
        case 0xce | 0xd2 | 0xca => p += 4
        case 0xcf | 0xd3 | 0xcb => p += 8
        case 0xc4 => p += be(1).toInt
        case 0xc5 => p += be(2).toInt
        case 0xc6 => p += be(4).toInt
        case 0xd9 => p += be(1).toInt
        case 0xda => p += be(2).toInt
        case 0xdb => p += be(4).toInt
        case 0xdc => { var n = be(2).toInt; while (n > 0) { skip(); n -= 1 } }
        case 0xdd => { var n = be(4).toInt; while (n > 0) { skip(); n -= 1 } }
        case 0xde => { var n = be(2).toInt * 2; while (n > 0) { skip(); n -= 1 } }
        case 0xdf => { var n = be(4).toInt * 2; while (n > 0) { skip(); n -= 1 } }
        case other => throw new IllegalArgumentException(f"cannot skip tag 0x$other%02x")
      }
    }
  }

  // ---------------------------------------------------------------
  // record model
  // ---------------------------------------------------------------

  /** Column flag bits (pkg/common/column.go:86-107). */
  val BinaryFlag = 1L << 0
  val HandleKeyFlag = 1L << 1
  val GeneratedColumnFlag = 1L << 2
  val PrimaryKeyFlag = 1L << 3
  val UniqueKeyFlag = 1L << 4
  val MultipleKeyFlag = 1L << 5
  val NullableFlag = 1L << 6
  val UnsignedFlag = 1L << 7

  /** RedoColumn — per-column meta (name, MySQL type code, charsets). */
  final case class RedoCol(name: String, tpe: Int,
                           charset: String = "", collation: String = "")
  /** RedoColumnValue — a column's value + flags. `isEmptyBytes` works
    * around msgp turning empty byte slices into nil (msgp#247). */
  final case class RedoColVal(value: Any, isEmptyBytes: Boolean, flag: Long) {
    def unsigned: Boolean = (flag & UnsignedFlag) != 0
    def handleKey: Boolean = (flag & HandleKeyFlag) != 0
  }
  final case class RedoDml(startTs: Long, commitTs: Long,
                           schema: String, table: String, tableId: Long,
                           isPartition: Boolean,
                           cols: Seq[RedoCol],
                           values: Seq[RedoColVal],      // empty for delete
                           preValues: Seq[RedoColVal],   // empty for insert
                           indexColumns: Seq[Seq[Int]] = Nil) {
    def op: String =
      if (values.nonEmpty && preValues.nonEmpty) "U"
      else if (values.nonEmpty) "I" else "D"
  }
  final case class RedoDdl(startTs: Long, commitTs: Long, query: String,
                           ddlType: Int, schema: String, table: String,
                           tableId: Long = 0L, isPartition: Boolean = false)

  sealed trait RedoRecord { def commitTs: Long }
  final case class DmlRecord(dml: RedoDml) extends RedoRecord {
    def commitTs: Long = dml.commitTs
  }
  final case class DdlRecord(ddl: RedoDdl) extends RedoRecord {
    def commitTs: Long = ddl.commitTs
  }

  // ---------------------------------------------------------------
  // record encode (codec.go MarshalRedoLog + redo_gen.go layouts)
  // ---------------------------------------------------------------

  private def writeTableName(w: MsgWriter, schema: String, table: String,
                             tableId: Long, isPartition: Boolean): Unit = {
    w.mapHeader(4)
    w.str("db-name"); w.str(schema)
    w.str("tbl-name"); w.str(table)
    w.str("tbl-id"); w.int(tableId)
    w.str("is-partition"); w.bool(isPartition)
  }

  private def writeColVals(w: MsgWriter, vals: Seq[RedoColVal]): Unit = {
    w.arrayHeader(vals.length)
    vals.foreach { v =>
      w.mapHeader(3)
      w.str("column")
      v.value match {
        case l: Long if v.unsigned => w.anyUnsigned(l)
        case other => w.any(other)
      }
      w.str("value-is-empty-bytes"); w.bool(v.isEmptyBytes)
      w.str("flag"); w.uint(v.flag)
    }
  }

  def encodeRecord(r: RedoRecord): Array[Byte] = {
    val w = new MsgWriter()
    w.u8(0xff).u8(0xff) // version prefix
    w.u8(0x00).u8(0x02) // uint16 BE version 2
    w.mapHeader(3)
    w.str("row")
    r match {
      case DmlRecord(d) =>
        w.mapHeader(3)
        w.str("row")
        w.mapHeader(6)
        w.str("start-ts"); w.uint(d.startTs)
        w.str("commit-ts"); w.uint(d.commitTs)
        w.str("table"); writeTableName(w, d.schema, d.table, d.tableId, d.isPartition)
        // column metas land on the side(s) the row type carries
        // (ToRedoLog, redo.go:191-199: I→Columns, D→PreColumns, U→both)
        def writeColMetas(cs: Seq[RedoCol]): Unit = {
          w.arrayHeader(cs.length)
          cs.foreach { c =>
            w.mapHeader(4)
            w.str("name"); w.str(c.name)
            w.str("type"); w.byte8(c.tpe)
            w.str("charset"); w.str(c.charset)
            w.str("collation"); w.str(c.collation)
          }
        }
        w.str("columns")
        writeColMetas(if (d.values.nonEmpty) d.cols else Nil)
        w.str("pre-columns")
        writeColMetas(if (d.preValues.nonEmpty) d.cols else Nil)
        w.str("index-columns"); w.arrayHeader(d.indexColumns.length)
        d.indexColumns.foreach { ic =>
          w.arrayHeader(ic.length); ic.foreach(i => w.int(i.toLong))
        }
        w.str("columns"); writeColVals(w, d.values)
        w.str("pre-columns"); writeColVals(w, d.preValues)
      case DdlRecord(_) => w.nil()
    }
    w.str("ddl")
    r match {
      case DdlRecord(d) =>
        w.mapHeader(4)
        w.str("ddl")
        w.mapHeader(8)
        w.str("start-ts"); w.uint(d.startTs)
        w.str("commit-ts"); w.uint(d.commitTs)
        w.str("query"); w.str(d.query)
        w.str("columns"); w.arrayHeader(0)
        w.str("blocked-tables"); w.nil()
        w.str("blocked-table-names"); w.arrayHeader(0)
        w.str("need-dropped-tables"); w.nil()
        w.str("need_added_tables"); w.arrayHeader(0)
        w.str("type"); w.byte8(d.ddlType)
        w.str("table-name"); writeTableName(w, d.schema, d.table, d.tableId, d.isPartition)
        w.str("table-schema-store"); w.nil()
      case DmlRecord(_) => w.nil()
    }
    w.str("type")
    w.int(r match { case _: DmlRecord => 1L; case _: DdlRecord => 2L })
    w.result()
  }

  // ---------------------------------------------------------------
  // record decode (tolerant field-order / unknown-field, like msgp)
  // ---------------------------------------------------------------

  private def readTableName(r: MsgReader): (String, String, Long, Boolean) = {
    var schema = ""; var table = ""; var id = 0L; var part = false
    var n = r.readMapHeader()
    while (n > 0) {
      r.readStr() match {
        case "db-name" => schema = r.readStr()
        case "tbl-name" => table = r.readStr()
        case "tbl-id" => id = r.readLong()
        case "is-partition" => part = r.readBool()
        case _ => r.skip()
      }
      n -= 1
    }
    (schema, table, id, part)
  }

  private def readColVals(r: MsgReader): Seq[RedoColVal] = {
    val n = r.readArrayHeader()
    (0 until n).map { _ =>
      var value: Any = null; var empty = false; var flag = 0L
      var m = r.readMapHeader()
      while (m > 0) {
        r.readStr() match {
          case "column" => value = r.readAny()
          case "value-is-empty-bytes" => empty = r.readBool()
          case "flag" => flag = r.readLong()
          case _ => r.skip()
        }
        m -= 1
      }
      val v = if (empty && value == null) Array.emptyByteArray else value
      RedoColVal(v, empty, flag)
    }
  }

  private def readCols(r: MsgReader): Seq[RedoCol] = {
    val n = r.readArrayHeader()
    (0 until n).flatMap { _ =>
      if (r.isNil) { r.readNil(); None }
      else {
        var name = ""; var tpe = 0; var cs = ""; var co = ""
        var m = r.readMapHeader()
        while (m > 0) {
          r.readStr() match {
            case "name" => name = r.readStr()
            case "type" => tpe = r.readLong().toInt
            case "charset" => cs = r.readStr()
            case "collation" => co = r.readStr()
            case _ => r.skip()
          }
          m -= 1
        }
        Some(RedoCol(name, tpe, cs, co))
      }
    }
  }

  def decodeRecord(bytes: Array[Byte]): RedoRecord = {
    require(bytes.length > 4 && bytes(0) == -1 && bytes(1) == -1,
      "missing redo v2 version prefix")
    val version = ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    require(version == 2, s"unsupported redo codec version $version")
    val r = new MsgReader(bytes, 4)
    var dml: RedoDml = null
    var ddl: RedoDdl = null
    var logType = 0L
    var n = r.readMapHeader()
    while (n > 0) {
      r.readStr() match {
        case "row" =>
          if (r.isNil) r.readNil()
          else {
            var startTs = 0L; var commitTs = 0L
            var schema = ""; var table = ""; var tableId = 0L; var part = false
            var cols: Seq[RedoCol] = Nil
            var vals: Seq[RedoColVal] = Nil
            var preVals: Seq[RedoColVal] = Nil
            var idxCols: Seq[Seq[Int]] = Nil
            var m = r.readMapHeader()
            while (m > 0) {
              r.readStr() match {
                case "row" =>
                  if (r.isNil) r.readNil()
                  else {
                    var k = r.readMapHeader()
                    while (k > 0) {
                      r.readStr() match {
                        case "start-ts" => startTs = r.readLong()
                        case "commit-ts" => commitTs = r.readLong()
                        case "table" =>
                          if (r.isNil) r.readNil()
                          else {
                            val t = readTableName(r)
                            schema = t._1; table = t._2; tableId = t._3; part = t._4
                          }
                        case "columns" => cols = readCols(r)
                        case "pre-columns" =>
                          // delete rows carry their metas here only
                          val pc = readCols(r)
                          if (cols.isEmpty) cols = pc
                        case "index-columns" =>
                          val a = r.readArrayHeader()
                          idxCols = (0 until a).map { _ =>
                            val b = r.readArrayHeader()
                            (0 until b).map(_ => r.readLong().toInt)
                          }
                        case _ => r.skip()
                      }
                      k -= 1
                    }
                  }
                case "columns" => vals = readColVals(r)
                case "pre-columns" => preVals = readColVals(r)
                case _ => r.skip()
              }
              m -= 1
            }
            dml = RedoDml(startTs, commitTs, schema, table, tableId, part,
              cols, vals, preVals, idxCols)
          }
        case "ddl" =>
          if (r.isNil) r.readNil()
          else {
            var startTs = 0L; var commitTs = 0L; var query = ""
            var ddlType = 0
            var schema = ""; var table = ""; var tableId = 0L; var part = false
            var m = r.readMapHeader()
            while (m > 0) {
              r.readStr() match {
                case "ddl" =>
                  if (r.isNil) r.readNil()
                  else {
                    var k = r.readMapHeader()
                    while (k > 0) {
                      r.readStr() match {
                        case "start-ts" => startTs = r.readLong()
                        case "commit-ts" => commitTs = r.readLong()
                        case "query" => query = r.readStr()
                        case _ => r.skip()
                      }
                      k -= 1
                    }
                  }
                case "type" => ddlType = r.readLong().toInt
                case "table-name" =>
                  val t = readTableName(r)
                  schema = t._1; table = t._2; tableId = t._3; part = t._4
                case _ => r.skip()
              }
              m -= 1
            }
            ddl = RedoDdl(startTs, commitTs, query, ddlType, schema, table,
              tableId, part)
          }
        case "type" => logType = r.readLong()
        case _ => r.skip()
      }
      n -= 1
    }
    if (logType == 2L && ddl != null) DdlRecord(ddl)
    else if (dml != null) DmlRecord(dml)
    else throw new IllegalArgumentException(s"empty redo log record (type=$logType)")
  }

  // ---------------------------------------------------------------
  // etcd-WAL file framing (writer.go:77-84 / reader file.go:329-381)
  // ---------------------------------------------------------------

  def writeLogFile(path: String, records: Iterator[Array[Byte]],
                   compress: Boolean = false): Unit = {
    // Buffered: the frame stream is many small writes (8-byte len +
    // record + pad) — unbuffered FileOutputStream paid 3 syscalls per
    // record. With `compress` the LZ4 frame encoder wraps the buffer
    // directly, so the compressed export is written ONCE instead of
    // write-all → read-all → rewrite (byte-identical frames: the
    // encoder packs its 4 MB blocks by stream position, so chunked
    // writes produce the same file as one whole-buffer write).
    val fos = new java.io.BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    val out: java.io.OutputStream =
      if (compress) new net.jpountz.lz4.LZ4FrameOutputStream(fos) else fos
    try {
      val lenBuf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      val padZero = new Array[Byte](8)
      records.foreach { rec =>
        val pad = (8 - (rec.length % 8)) % 8
        var lenField = rec.length.toLong
        if (pad != 0) lenField |= (0x80L | pad.toLong) << 56
        lenBuf.clear(); lenBuf.putLong(lenField)
        out.write(lenBuf.array())
        out.write(rec)
        if (pad != 0) out.write(padZero, 0, pad)
      }
    } finally out.close()
  }

  /** LZ4 frame magic — an upstream redo file may be lz4-compressed as
    * a whole (reader/file.go:55-56,263-266: detect by magic,
    * decompress, then parse frames). */
  private val lz4Magic = Array[Byte](0x04, 0x22, 0x4d.toByte, 0x18)

  /** Read every whole record; a torn/short tail frame ends the read
    * (the reference tolerates torn writes the same way). A whole-file
    * LZ4 frame (magic 0x04224D18) decompresses first, exactly like
    * the reference reader. */
  def readLogFile(path: String): Seq[Array[Byte]] = {
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val content =
      if (raw.length >= 4 && raw(0) == lz4Magic(0) && raw(1) == lz4Magic(1) &&
          raw(2) == lz4Magic(2) && raw(3) == lz4Magic(3))
        graft.functions.Compression.decode(graft.functions.Compression.Lz4, raw)
      else raw
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var p = 0
    var done = false
    while (!done) {
      if (p + 8 > content.length) done = true
      else {
        val lenField = ByteBuffer.wrap(content, p, 8)
          .order(ByteOrder.LITTLE_ENDIAN).getLong
        p += 8
        val recBytes = (lenField & ~(0xffL << 56)).toInt
        val padBytes = if (lenField < 0) ((lenField >>> 56) & 0x7L).toInt else 0
        if (recBytes == 0 || p + recBytes > content.length) done = true // torn
        else {
          out += java.util.Arrays.copyOfRange(content, p, p + recBytes)
          p += recBytes + padBytes
        }
      }
    }
    out.toSeq
  }

  /** Compress an already-written log file whole-file LZ4 (what the
    * reference writer does with `compression = lz4`) — for parity
    * tests and compressed export. */
  def lz4CompressFile(path: String): Unit = {
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      graft.functions.Compression.encode(graft.functions.Compression.Lz4, raw))
  }

  // ---------------------------------------------------------------
  // meta (LogMeta msgp; fold by max — redo_meta.go:39-50)
  // ---------------------------------------------------------------

  def encodeMeta(checkpointTs: Long, resolvedTs: Long): Array[Byte] = {
    val w = new MsgWriter(64)
    w.mapHeader(3)
    w.str("checkpointTs"); w.uint(checkpointTs)
    w.str("resolvedTs"); w.uint(resolvedTs)
    w.str("version"); w.int(1L)
    w.result()
  }

  def decodeMeta(bytes: Array[Byte]): (Long, Long) = {
    val r = new MsgReader(bytes)
    var ckpt = 0L; var res = 0L
    var n = r.readMapHeader()
    while (n > 0) {
      r.readStr() match {
        case "checkpointTs" => ckpt = r.readLong()
        case "resolvedTs" => res = r.readLong()
        case _ => r.skip()
      }
      n -= 1
    }
    (ckpt, res)
  }

  /** Fold every *.meta in the dir by MAX on both fields (ParseMeta). */
  def readMetaWindow(dir: String): (Long, Long) = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(MetaExt))
    files.foldLeft((0L, 0L)) { case ((c, r), f) =>
      val (c2, r2) = decodeMeta(java.nio.file.Files.readAllBytes(f.toPath))
      (math.max(c, c2), math.max(r, r2))
    }
  }

  // ---------------------------------------------------------------
  // file naming (config.go:272-280; writer file.go:461-474)
  // ---------------------------------------------------------------

  val LogExt = ".log"
  val MetaExt = ".meta"

  def logFileName(captureId: String, changefeedId: String, logType: String,
                  maxCommitTs: Long, uuid: String): String =
    s"${captureId}_${changefeedId}_${logType}_${maxCommitTs}_$uuid$LogExt"

  def metaFileName(captureId: String, keyspace: String, changefeedId: String,
                   uuid: String): String =
    s"${captureId}_${keyspace}_${changefeedId}_meta_$uuid$MetaExt"

  /** FilterChangefeedFiles (pkg/redo/common/util.go:23-41). */
  def changefeedMatches(fileName: String, changefeedId: String,
                        keyspace: String = "default"): Boolean = {
    val matcher =
      if (keyspace == "default") s"_${changefeedId}_"
      else s"_${keyspace}_${changefeedId}_"
    fileName.contains(matcher)
  }

  // ---------------------------------------------------------------
  // directory-level read/write
  // ---------------------------------------------------------------

  /** Write records as a reference-format redo dir: rows and DDLs in
    * their own files (the reference separates row/ddl logs), plus one
    * meta spanning the written window. */
  def writeDir(dir: String, records: Seq[RedoRecord],
               checkpointTs: Long, resolvedTs: Long,
               captureId: String = "graft", changefeedId: String = "feed",
               uuid: String = "0001", compress: Boolean = false): Unit = {
    new java.io.File(dir).mkdirs()
    val (ddls, dmls) = records.partition(_.isInstanceOf[DdlRecord])
    def maxTs(rs: Seq[RedoRecord]) = if (rs.isEmpty) 0L else rs.map(_.commitTs).max
    def writeLog(path: String, recs: Seq[RedoRecord]): Unit =
      // whole-file LZ4, the reference writer's `compression = lz4`
      // (writer file.go; reader auto-detects by magic) — streamed
      // through the frame encoder in one pass
      writeLogFile(path, recs.iterator.map(encodeRecord), compress)
    if (dmls.nonEmpty)
      writeLog(
        new java.io.File(dir, logFileName(captureId, changefeedId, "row",
          maxTs(dmls), uuid)).getPath, dmls)
    if (ddls.nonEmpty)
      writeLog(
        new java.io.File(dir, logFileName(captureId, changefeedId, "ddl",
          maxTs(ddls), uuid)).getPath, ddls)
    java.nio.file.Files.write(
      new java.io.File(dir, metaFileName(captureId, "default", changefeedId,
        uuid)).toPath,
      encodeMeta(checkpointTs, resolvedTs))
  }

  /** Read a reference-format redo dir: every matching .log file's
    * records, windowed to (checkpointTs, resolvedTs] per the metas —
    * exactly the applier's replay window (pkg/applier/redo.go). */
  def readDir(dir: String, changefeedId: Option[String] = None)
      : (Long, Long, Seq[RedoRecord]) = {
    val (ckpt, res) = readMetaWindow(dir)
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(LogExt) &&
        changefeedId.forall(id => changefeedMatches(f.getName, id)))
      .sortBy(_.getName)
    val records = files.toSeq
      .flatMap(f => readLogFile(f.getPath).map(decodeRecord))
      .filter(r => r.commitTs > ckpt && (res == 0L || r.commitTs <= res))
      // DML before DDL at equal commitTs — the applier's order
      // (pkg/applier/redo.go shouldApplyDDL applies a DDL only once
      // row.CommitTs > ddl.CommitTs; RedoWireBridge's 2t/2t+1 apply
      // key encodes the same rule)
      .sortBy(r => (r.commitTs, r match { case _: DdlRecord => 1; case _ => 0 }))
    (ckpt, res, records)
  }
}
