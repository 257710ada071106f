package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.RedoWire
import graft.sinks.RedoWire._

/** Byte-exact coverage of the reference's redo-log v2 wire format
  * (pkg/redo/codec/codec.go, pkg/common/event/redo_gen.go,
  * pkg/redo/writer/writer.go WAL framing, pkg/redo/common/
  * redo_meta.go). The golden blobs below are HAND-ASSEMBLED from the
  * generated Go marshaler's documented byte layout — not produced by
  * the code under test — so they pin true wire parity. */
class RedoWireSpec extends AnyFunSuite {

  private def hexOf(s: String): String =
    s.getBytes("UTF-8").map(b => f"$b%02x").mkString
  /** msgpack fixstr (len < 32): tag 0xa0|len + utf8 bytes. */
  private def k(s: String): String = f"${0xa0 | s.length}%02x" + hexOf(s)
  private def bytesOf(hex: String): Array[Byte] =
    hex.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ---- tinylib integer/str form pins (write.go compact rules) ----

  test("tinylib msgp integer forms: signed family for ints, unsigned for uints") {
    def enc(f: MsgWriter => Unit): String = {
      val w = new MsgWriter(); f(w); w.result().map(b => f"$b%02x").mkString
    }
    assert(enc(_.int(5)) == "05")
    // AppendInt64(128) uses int16 0xd1 — NOT the uint8 form
    assert(enc(_.int(128)) == "d10080")
    assert(enc(_.int(40000)) == "d200009c40")
    assert(enc(_.int(-1)) == "ff")
    assert(enc(_.int(-33)) == "d0df")
    assert(enc(_.int(-40000)) == "d2ffff63c0")
    // AppendUint64(128) uses uint8 0xcc
    assert(enc(_.uint(128)) == "cc80")
    assert(enc(_.uint(40000)) == "cd9c40")
    // u64 bit pattern above Long.Max rides the 0xcf form
    assert(enc(_.uint(-1L)) == "cfffffffffffffffff")
    // AppendByte = AppendUint8 (MySQL type code 0xfe)
    assert(enc(_.byte8(0xfe)) == "ccfe")
    // str8 kicks in at length 32
    val s32 = "x" * 32
    assert(enc(_.str(s32)) == "d920" + hexOf(s32))
  }

  // ---- golden records ----

  private val dmlInsert = DmlRecord(RedoDml(
    startTs = 1L, commitTs = 2L, schema = "db", table = "t", tableId = 45L,
    isPartition = false,
    cols = Seq(RedoCol("id", 3)),
    values = Seq(RedoColVal(5L, isEmptyBytes = false,
      flag = HandleKeyFlag | PrimaryKeyFlag)),
    preValues = Nil,
    indexColumns = Seq(Seq(0))))

  private val dmlGoldenHex =
    "ffff0002" + "83" +                       // prefix+ver2, RedoLog map(3)
      k("row") + "83" +                       // RedoDMLEvent map(3)
        k("row") + "86" +                     // DMLEventInRedoLog map(6)
          k("start-ts") + "01" +
          k("commit-ts") + "02" +
          k("table") + "84" +
            k("db-name") + k("db") +
            k("tbl-name") + k("t") +
            k("tbl-id") + "2d" +              // AppendInt64(45) fixint
            k("is-partition") + "c2" +
          k("columns") + "91" + "84" +        // one RedoColumn
            k("name") + k("id") +
            k("type") + "03" +                // AppendByte(3)
            k("charset") + "a0" +
            k("collation") + "a0" +
          k("pre-columns") + "90" +           // insert: no pre metas
          k("index-columns") + "9191" + "00" +
        k("columns") + "91" + "83" +          // one RedoColumnValue
          k("column") + "05" +                // AppendIntf(int64(5))
          k("value-is-empty-bytes") + "c2" +
          k("flag") + "0a" +                  // AppendUint64(10)
        k("pre-columns") + "90" +
      k("ddl") + "c0" +
      k("type") + "01"                        // RedoLogTypeRow

  test("golden DML insert: encode is byte-identical to the Go marshaler layout") {
    val enc = encodeRecord(dmlInsert)
    assert(enc.map(b => f"$b%02x").mkString == dmlGoldenHex)
  }

  test("golden DML decodes back to the record") {
    decodeRecord(bytesOf(dmlGoldenHex)) match {
      case DmlRecord(d) =>
        assert(d.startTs == 1L && d.commitTs == 2L)
        assert(d.schema == "db" && d.table == "t" && d.tableId == 45L)
        assert(d.cols == Seq(RedoCol("id", 3)))
        assert(d.values.head.value == 5L)
        assert(d.values.head.flag == (HandleKeyFlag | PrimaryKeyFlag))
        assert(d.preValues.isEmpty && d.op == "I")
        assert(d.indexColumns == Seq(Seq(0)))
      case other => fail(s"expected DML, got $other")
    }
  }

  private val ddlRec = DdlRecord(RedoDdl(
    startTs = 9L, commitTs = 10L, query = "CREATE TABLE db.t (id INT)",
    ddlType = 3, schema = "db", table = "t"))

  private val ddlGoldenHex = {
    val q = "CREATE TABLE db.t (id INT)"
    "ffff0002" + "83" +
      k("row") + "c0" +
      k("ddl") + "84" +                       // RedoDDLEvent map(4)
        k("ddl") + "88" +                     // DDLEventInRedoLog map(8)
          k("start-ts") + "09" +
          k("commit-ts") + "0a" +
          k("query") + k(q) +
          k("columns") + "90" +
          k("blocked-tables") + "c0" +
          k("blocked-table-names") + "90" +
          k("need-dropped-tables") + "c0" +
          k("need_added_tables") + "90" +
        k("type") + "03" +
        k("table-name") + "84" +
          k("db-name") + k("db") +
          k("tbl-name") + k("t") +
          k("tbl-id") + "00" +
          k("is-partition") + "c2" +
        k("table-schema-store") + "c0" +
      k("type") + "02"                        // RedoLogTypeDDL
  }

  test("golden DDL record: byte-identical both ways") {
    assert(encodeRecord(ddlRec).map(b => f"$b%02x").mkString == ddlGoldenHex)
    decodeRecord(bytesOf(ddlGoldenHex)) match {
      case DdlRecord(d) =>
        assert(d.query == "CREATE TABLE db.t (id INT)")
        assert(d.ddlType == 3 && d.commitTs == 10L)
        assert(d.schema == "db" && d.table == "t")
      case other => fail(s"expected DDL, got $other")
    }
  }

  test("value round trips: unsigned u64 bit pattern, strings, bytes, empty bytes, null") {
    val d = RedoDml(1L, 2L, "s", "t", 7L, isPartition = false,
      cols = Seq(RedoCol("u", 8), RedoCol("s", 15, "utf8mb4", "utf8mb4_bin"),
        RedoCol("b", 254), RedoCol("e", 254), RedoCol("n", 15)),
      values = Seq(
        RedoColVal(-1L, isEmptyBytes = false, UnsignedFlag), // u64 max
        RedoColVal("héllo", isEmptyBytes = false, 0L),
        RedoColVal(Array[Byte](1, 2, 3), isEmptyBytes = false, BinaryFlag),
        RedoColVal(Array.emptyByteArray, isEmptyBytes = true, BinaryFlag),
        RedoColVal(null, isEmptyBytes = false, NullableFlag)),
      preValues = Nil)
    decodeRecord(encodeRecord(DmlRecord(d))) match {
      case DmlRecord(out) =>
        assert(out.values(0).value == -1L && out.values(0).unsigned)
        assert(out.values(1).value == "héllo")
        assert(out.values(2).value.asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3))
        assert(out.values(3).value.asInstanceOf[Array[Byte]].isEmpty &&
          out.values(3).isEmptyBytes)
        assert(out.values(4).value == null)
        assert(out.cols(1).charset == "utf8mb4")
      case other => fail(s"$other")
    }
  }

  test("update and delete rows round trip with the metas on the right side") {
    val cols = Seq(RedoCol("id", 3), RedoCol("v", 15))
    val upd = RedoDml(1L, 5L, "s", "t", 7L, isPartition = false, cols,
      values = Seq(RedoColVal(1L, false, HandleKeyFlag), RedoColVal("new", false, 0L)),
      preValues = Seq(RedoColVal(1L, false, HandleKeyFlag), RedoColVal("old", false, 0L)))
    val del = upd.copy(values = Nil,
      preValues = Seq(RedoColVal(1L, false, HandleKeyFlag), RedoColVal("old", false, 0L)))
    decodeRecord(encodeRecord(DmlRecord(upd))) match {
      case DmlRecord(o) =>
        assert(o.op == "U" && o.cols == cols)
        assert(o.preValues(1).value == "old" && o.values(1).value == "new")
      case other => fail(s"$other")
    }
    decodeRecord(encodeRecord(DmlRecord(del))) match {
      case DmlRecord(o) =>
        // a delete's column metas travel in pre-columns only
        assert(o.op == "D" && o.cols == cols && o.values.isEmpty)
      case other => fail(s"$other")
    }
  }

  test("fuzz: 500 adversarial records round trip bytes->record->bytes identically") {
    val rnd = new scala.util.Random(42)
    def rndString(): String = {
      // lengths crossing the fixstr/str8/str16 edges, with multi-byte
      // code points so byte length ≠ char length
      val n = Seq(0, 1, 5, 31, 32, 33, 255, 256, 300)(rnd.nextInt(9))
      val sb = new StringBuilder
      while (sb.length < n) sb.append(
        Seq("a", "й", "测", "🙂", "'", "\\", " ")(rnd.nextInt(7)))
      sb.toString
    }
    // surrogate-safe names (truncating a 🙂 mid-pair makes invalid
    // UTF-8, which no Go string would carry either)
    def rndName(max: Int): String = {
      val n = rnd.nextInt(max + 1)
      (0 until n).map(_ => Seq('a', 'й', '测', '\'', '\\', ' ')(rnd.nextInt(6)))
        .mkString
    }
    def rndLong(): Long = Seq(
      0L, 1L, -1L, 127L, 128L, 255L, 256L, 32767L, 32768L, 65535L, 65536L,
      Int.MaxValue.toLong, Int.MaxValue + 1L, -32L, -33L, -128L, -129L,
      -32768L, -32769L, Int.MinValue.toLong, Int.MinValue - 1L,
      Long.MaxValue, Long.MinValue, rnd.nextLong())(rnd.nextInt(24))
    def rndBytes(): Array[Byte] = {
      val n = Seq(0, 1, 7, 255, 256, 1000, 70000)(rnd.nextInt(7))
      val b = new Array[Byte](n); rnd.nextBytes(b); b
    }
    def rndVal(): RedoColVal = rnd.nextInt(7) match {
      case 0 => RedoColVal(rndLong(), isEmptyBytes = false,
        if (rnd.nextBoolean()) UnsignedFlag else 0L)
      case 1 => RedoColVal(rndString(), isEmptyBytes = false, 0L)
      case 2 =>
        val b = rndBytes()
        RedoColVal(b, b.isEmpty, BinaryFlag)
      case 3 => RedoColVal(null, isEmptyBytes = false, NullableFlag)
      case 4 => RedoColVal(rnd.nextDouble() * math.pow(10, rnd.nextInt(20) - 10),
        isEmptyBytes = false, 0L)
      case 5 => RedoColVal(if (rnd.nextBoolean()) -0.0 else Double.MinPositiveValue,
        isEmptyBytes = false, 0L)
      case _ => RedoColVal(rnd.nextBoolean(), isEmptyBytes = false, 0L)
    }
    def sameVal(a: RedoColVal, b: RedoColVal): Boolean =
      a.flag == b.flag && a.isEmptyBytes == b.isEmptyBytes && ((a.value, b.value) match {
        case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
        case (x: Double, y: Double) =>
          java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
        case (x, y) => x == y
      })
    (1 to 500).foreach { i =>
      val nCols = 1 + rnd.nextInt(14)
      val cols = (0 until nCols).map(j =>
        RedoCol(s"c$j${rndName(8)}", rnd.nextInt(256),
          rndName(10), rndName(10)))
      val op = rnd.nextInt(3)
      val post = if (op != 1) (0 until nCols).map(_ => rndVal()) else Nil
      val pre = if (op != 0) (0 until nCols).map(_ => rndVal()) else Nil
      val rec =
        if (rnd.nextInt(10) == 0)
          DdlRecord(RedoDdl(rndLong().abs, rndLong().abs, rndString(),
            rnd.nextInt(256), rndString(), rndString(), rndLong(),
            rnd.nextBoolean()))
        else DmlRecord(RedoDml(rndLong().abs, rndLong().abs,
          rndString(), rndString(), rndLong(), rnd.nextBoolean(),
          cols, post, pre,
          indexColumns = Seq((0 until rnd.nextInt(4)).toSeq)))
      val bytes = encodeRecord(rec)
      val back = decodeRecord(bytes)
      // encode(decode(x)) must be byte-identical — the codec is a
      // bijection on its own output
      assert(encodeRecord(back).toSeq == bytes.toSeq, s"iteration $i: bytes drifted")
      (rec, back) match {
        case (DmlRecord(a), DmlRecord(b)) =>
          assert(a.startTs == b.startTs && a.commitTs == b.commitTs, s"iter $i")
          assert(a.schema == b.schema && a.table == b.table && a.tableId == b.tableId)
          assert(a.cols == b.cols, s"iter $i cols")
          assert(a.values.length == b.values.length &&
            a.values.zip(b.values).forall((sameVal _).tupled), s"iter $i values")
          assert(a.preValues.length == b.preValues.length &&
            a.preValues.zip(b.preValues).forall((sameVal _).tupled), s"iter $i pre")
        case (DdlRecord(a), DdlRecord(b)) =>
          assert(a == b, s"iter $i ddl")
        case other => fail(s"iter $i: record class flipped: $other")
      }
    }
  }

  // ---- WAL framing ----

  test("etcd-WAL framing: length field, 8-byte padding, torn tail tolerated") {
    val dir = Files.createTempDirectory("graft-redowire").toString
    val recs = Seq(
      Array.tabulate[Byte](5)(_.toByte),   // pad 3
      Array.tabulate[Byte](8)(_.toByte),   // pad 0
      Array.tabulate[Byte](13)(i => (i + 1).toByte)) // pad 3
    val f = s"$dir/frames.log"
    RedoWire.writeLogFile(f, recs.iterator)
    val raw = Files.readAllBytes(java.nio.file.Paths.get(f))
    // first frame: lenField = 5 | (0x80|3)<<56, little-endian
    val lf = java.nio.ByteBuffer.wrap(raw, 0, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    assert((lf & ~(0xffL << 56)) == 5L)
    assert(lf < 0 && ((lf >>> 56) & 0x7L) == 3L)
    assert(raw.length == (8 + 5 + 3) + (8 + 8) + (8 + 13 + 3))
    val back = RedoWire.readLogFile(f)
    assert(back.map(_.toSeq) == recs.map(_.toSeq))
    // torn tail: truncate into the last record — complete prefix reads
    val torn = s"$dir/torn.log"
    Files.write(java.nio.file.Paths.get(torn),
      java.util.Arrays.copyOf(raw, raw.length - 10))
    assert(RedoWire.readLogFile(torn).map(_.toSeq) == recs.take(2).map(_.toSeq))
  }

  test("a whole-file LZ4 log (upstream compression=lz4) decompresses transparently") {
    val dir = Files.createTempDirectory("graft-redolz4").toString
    val f = s"$dir/c.log"
    val recs = Seq(encodeRecord(dmlInsert), encodeRecord(ddlRec))
    RedoWire.writeLogFile(f, recs.iterator)
    val plain = RedoWire.readLogFile(f)
    RedoWire.lz4CompressFile(f)
    val raw = Files.readAllBytes(java.nio.file.Paths.get(f))
    assert((raw(0) & 0xff) == 0x04 && (raw(1) & 0xff) == 0x22 &&
      (raw(2) & 0xff) == 0x4d && (raw(3) & 0xff) == 0x18,
      "compressed file must start with the lz4 frame magic")
    assert(RedoWire.readLogFile(f).map(_.toSeq) == plain.map(_.toSeq))
  }

  // ---- meta ----

  test("LogMeta round trip and max-fold across meta files (ParseMeta)") {
    val dir = Files.createTempDirectory("graft-redometa").toString
    assert(decodeMeta(encodeMeta(100L, 200L)) == ((100L, 200L)))
    Files.write(java.nio.file.Paths.get(
      s"$dir/${metaFileName("c1", "default", "feed", "u1")}"),
      encodeMeta(100L, 180L))
    Files.write(java.nio.file.Paths.get(
      s"$dir/${metaFileName("c2", "default", "feed", "u2")}"),
      encodeMeta(90L, 200L))
    assert(readMetaWindow(dir) == ((100L, 200L)))
  }

  test("file naming matches the reference formats") {
    assert(logFileName("cap1", "feed-a", "row", 42L, "abc") ==
      "cap1_feed-a_row_42_abc.log")
    assert(metaFileName("cap1", "default", "feed-a", "abc") ==
      "cap1_default_feed-a_meta_abc.meta")
    assert(changefeedMatches("cap1_feed-a_row_42_abc.log", "feed-a"))
    assert(!changefeedMatches("cap1_feed-b_row_42_abc.log", "feed-a"))
    assert(changefeedMatches("cap1_ks1_feed-a_row_42_abc.log", "feed-a", "ks1"))
  }

  // ---- directory round trip with the applier's replay window ----

  test("writeDir/readDir: reference-format dir round trips, windowed to (ckpt, resolved]") {
    val dir = Files.createTempDirectory("graft-redodir").toString
    val cols = Seq(RedoCol("id", 3), RedoCol("v", 15))
    def ins(id: Long, ts: Long) = DmlRecord(RedoDml(ts - 1, ts, "s", "t", 7L,
      isPartition = false, cols,
      values = Seq(RedoColVal(id, false, HandleKeyFlag),
        RedoColVal(s"v$id", false, 0L)),
      preValues = Nil))
    val ddl = DdlRecord(RedoDdl(14L, 15L, "ALTER TABLE s.t ADD COLUMN c INT",
      5, "s", "t"))
    val recs = Seq(ins(1L, 10L), ins(2L, 15L), ddl, ins(3L, 20L), ins(4L, 25L))
    RedoWire.writeDir(dir, recs, checkpointTs = 10L, resolvedTs = 20L)
    val (ckpt, res, back) = RedoWire.readDir(dir, changefeedId = Some("feed"))
    assert(ckpt == 10L && res == 20L)
    // 10 excluded (≤ ckpt), 25 excluded (> resolved); DML at equal ts
    // sorts BEFORE the DDL — the applier's order (redo.go
    // shouldApplyDDL applies a DDL only once row.CommitTs > ddl's)
    assert(back.map(_.commitTs) == Seq(15L, 15L, 20L))
    assert(back(0).isInstanceOf[DmlRecord] && back(1).isInstanceOf[DdlRecord])
    val ids = back.collect { case DmlRecord(d) => d.values.head.value }
    assert(ids == Seq(2L, 3L))
    // a foreign changefeed's filter sees nothing
    assert(RedoWire.readDir(dir, Some("other"))._3.isEmpty)
  }
}
