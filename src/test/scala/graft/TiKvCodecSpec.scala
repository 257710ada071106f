package graft

import graft.model.{MyDecimal, PackedTime, TiKvCodec}
import graft.model.TiKvCodec._
import graft.operators.RawKvMounter
import graft.operators.RawKvMounter.{KvColumn, KvTableMeta}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level vectors for the TiKV key / TiDB row-value codecs —
  * golden bytes hand-computed from the public formats (TiDB design
  * doc 2018-07-19-row-format.md; the memcomparable codec rules the
  * reference consumes via pkg/common/event/codec.go), plus
  * encode∘decode identities over randomized values.
  */
class TiKvCodecSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString

  // ---- memcomparable primitives ----

  test("memcomparable int golden vectors (sign-flipped big-endian)") {
    assert(hex(encodeInt(0L)) == "8000000000000000")
    assert(hex(encodeInt(1L)) == "8000000000000001")
    assert(hex(encodeInt(-1L)) == "7fffffffffffffff")
    assert(hex(encodeInt(Long.MinValue)) == "0000000000000000")
    assert(hex(encodeInt(Long.MaxValue)) == "ffffffffffffffff")
    Seq(0L, 1L, -1L, 42L, -1234567890123L, Long.MinValue, Long.MaxValue).foreach { v =>
      assert(decodeInt(encodeInt(v), 0) == v)
    }
    // ordering property: byte order == numeric order
    val sorted = Seq(-5L, -1L, 0L, 3L, 1000L).map(encodeInt).map(hex)
    assert(sorted == sorted.sorted)
  }

  test("memcomparable bytes golden vector (8-byte groups, 0xFF-pad marker)") {
    // "abc" + 5 zero pads, marker 0xFF-5 = 0xFA
    assert(hex(encodeBytes("abc".getBytes)) == "6162630000000000fa")
    // exactly 8 bytes: full group (marker 0xFF) + empty group (marker 0xF7)
    assert(hex(encodeBytes("12345678".getBytes)) ==
      "3132333435363738ff" + "0000000000000000f7")
    Seq("", "a", "12345678", "123456789", "héllo wörld ✓").foreach { s =>
      val (back, n) = decodeBytes(encodeBytes(s.getBytes("UTF-8")), 0)
      assert(new String(back, "UTF-8") == s)
      assert(n == encodeBytes(s.getBytes("UTF-8")).length)
    }
  }

  test("memcomparable float golden vectors (MSB set for +, flipped for -)") {
    // 1.0 bits 3FF0000000000000 → +: set sign bit → BFF0...
    assert(hex(encodeFloat(1.0)) == "bff0000000000000")
    assert(hex(encodeFloat(0.0)) == "8000000000000000")
    // -1.0: ~bits
    assert(hex(encodeFloat(-1.0)) == "400fffffffffffff")
    Seq(0.0, 1.5, -2.25, 1e300, -1e-300, math.Pi).foreach { v =>
      assert(decodeFloat(encodeFloat(v), 0) == v)
    }
    val ordered = Seq(-10.5, -0.25, 0.0, 0.5, 99.75).map(encodeFloat).map(hex)
    assert(ordered == ordered.sorted)
  }

  test("varint / uvarint roundtrip") {
    Seq(0L, 1L, -1L, 300L, -300L, Long.MaxValue, Long.MinValue).foreach { v =>
      val b = encodeVarint(v)
      assert(decodeVarint(b, 0) == ((v, b.length)))
    }
    Seq(0L, 127L, 128L, 300L, Long.MaxValue).foreach { v =>
      val b = encodeUvarint(v)
      assert(decodeUvarint(b, 0) == ((v, b.length)))
    }
  }

  // ---- record keys ----

  test("record key golden vector: t | tableID | _r | handle") {
    // the canonical example shape from the TiDB key-layout docs
    val key = encodeRecordKey(1L, IntHandle(5L))
    assert(hex(key) == "74" + "8000000000000001" + "5f72" + "8000000000000005")
    assert(decodeRecordKey(key) == ((1L, IntHandle(5L))))
  }

  test("common-handle record key roundtrips (string pk)") {
    val key = encodeRecordKey(42L,
      CommonHandle(Seq(DBytes("user-9".getBytes("UTF-8")))))
    val (tid, h) = decodeRecordKey(key)
    assert(tid == 42L)
    h match {
      case CommonHandle(Seq(DBytes(b))) => assert(new String(b, "UTF-8") == "user-9")
      case other => fail(s"wrong handle: $other")
    }
  }

  // ---- row format v2 ----

  test("row v2 golden vector: header, sorted ids, end-offsets, cells") {
    // cols: id 1 = int 1000 (2-byte LE cell), id 3 = "abc", id 4 = NULL
    val value = encodeV2(Seq(
      1L -> Some(intCell(1000L)),
      3L -> Some("abc".getBytes("UTF-8")),
      4L -> None))
    assert(hex(value) ==
      "80" +        // codec version 128
      "00" +        // small format
      "0200" +      // 2 not-null
      "0100" +      // 1 null
      "0103" +      // not-null ids 1,3
      "04" +        // null ids 4
      "0200" + "0500" + // END offsets 2,5
      "e803" +      // 1000 as little-endian int16
      "616263")     // "abc"
    val row = decodeV2(value)
    assert(!row.isBig)
    assert(intCellDecode(row.cell(1L).get) == 1000L)
    assert(new String(row.cell(3L).get, "UTF-8") == "abc")
    assert(row.isNull(4L) && row.cell(4L).isEmpty)
    assert(row.trailing.isEmpty)
  }

  test("row v2 big format: 4-byte ids and offsets when a col id > 255") {
    val value = encodeV2(Seq(300L -> Some(intCell(7L)), 2L -> Some(intCell(-9L))))
    assert((value(1) & 1) == 1)
    val row = decodeV2(value)
    assert(row.isBig)
    assert(intCellDecode(row.cell(300L).get) == 7L)
    assert(intCellDecode(row.cell(2L).get) == -9L)
  }

  test("row v2 big format by data size: a >64 KiB cell forces u32 offsets") {
    val bigCell = Array.fill[Byte](70000)('x')
    val value = encodeV2(Seq(1L -> Some(intCell(5L)), 2L -> Some(bigCell)))
    val row = decodeV2(value)
    assert(row.isBig, "64 KiB+ of cell data must flip the big flag")
    assert(intCellDecode(row.cell(1L).get) == 5L)
    assert(row.cell(2L).get.length == 70000 && row.cell(2L).get.forall(_ == 'x'))
  }

  test("row v2 all-null row: zero not-null cells decode cleanly") {
    val value = encodeV2(Seq(1L -> None, 2L -> None))
    val row = decodeV2(value)
    assert(row.notNull.isEmpty && row.nullIds == Seq(1L, 2L))
    assert(row.isNull(1L) && row.isNull(2L) && row.cell(1L).isEmpty)
  }

  test("row v2 trailing bytes (in-row checksum region) are preserved") {
    val value = encodeV2(Seq(1L -> Some(intCell(5L)))) ++ Array[Byte](1, 2, 3, 4)
    val row = decodeV2(value)
    assert(intCellDecode(row.cell(1L).get) == 5L)
    assert(row.trailing.toSeq == Seq[Byte](1, 2, 3, 4))
  }

  test("int cells use the minimal little-endian width") {
    assert(hex(intCell(5L)) == "05")
    assert(hex(intCell(-1L)) == "ff")
    assert(hex(intCell(1000L)) == "e803")
    assert(hex(intCell(100000L)) == "a0860100")
    assert(intCell(5000000000L).length == 8)
    Seq(0L, 127L, -128L, 32767L, -32768L, Int.MaxValue.toLong,
      Int.MinValue.toLong, Long.MaxValue, Long.MinValue).foreach { v =>
      assert(intCellDecode(intCell(v)) == v)
    }
    Seq(0L, 255L, 65535L, 4294967295L, Long.MaxValue, -1L /* u64 max */).foreach { v =>
      assert(uintCellDecode(uintCell(v)) == v)
    }
  }

  // ---- row format v1 ----

  test("row v1: colID/value datum pairs roundtrip") {
    val v1 = encodeV1(Seq(
      1L -> DInt(77L),
      2L -> DBytes("hé".getBytes("UTF-8")),
      3L -> DNull,
      4L -> DFloat(2.5),
      5L -> DDecimal(new java.math.BigDecimal("-12.34"))))
    val m = decodeV1(v1)
    assert(m(1L) == DInt(77L))
    assert(new String(m(2L).asInstanceOf[DBytes].v, "UTF-8") == "hé")
    assert(m(3L) == DNull)
    assert(m(4L) == DFloat(2.5))
    assert(m(5L).asInstanceOf[DDecimal].v.compareTo(
      new java.math.BigDecimal("-12.34")) == 0)
  }

  // ---- MySQL binary decimal ----

  test("myDecimal binary format roundtrips incl. sign and 9-digit word splits") {
    Seq("0", "1", "-1", "12.34", "-12.34", "0.5", "-0.5",
      "1234567890.123456789", "-1234567890123456789.000000001",
      "999999999999999999", "0.000000001").foreach { s =>
      val v = new java.math.BigDecimal(s)
      val enc = MyDecimal.encode(v)
      val (back, n) = MyDecimal.decode(enc, 0)
      assert(back.compareTo(v) == 0, s"decimal $s: got $back")
      assert(n == enc.length)
    }
    // sign-flip makes the first byte order negatives before positives
    val neg = MyDecimal.writeBin(new java.math.BigDecimal("-5"), 1, 0)
    val pos = MyDecimal.writeBin(new java.math.BigDecimal("5"), 1, 0)
    assert((neg(0) & 0xff) < (pos(0) & 0xff))
  }

  // ---- packed temporal ----

  test("packed time golden: layout ((year*13+month)<<5|day)<<17|hms)<<24|micro") {
    val packed = PackedTime.pack("2020-01-01 00:00:00")
    assert(packed == ((((2020L * 13 + 1) << 5 | 1) << 17) << 24))
    assert(PackedTime.unpack(packed) == "2020-01-01 00:00:00")
    Seq("2023-04-19 11:48:00", "1999-12-31 23:59:59.999999",
      "0001-01-01 00:00:00", "2026-08-14 09:30:05.000100").foreach { s =>
      assert(PackedTime.unpack(PackedTime.pack(s)) == s)
    }
    assert(PackedTime.unpackDate(PackedTime.pack("2024-02-29")) == "2024-02-29")
  }

  // ---- typed cell matrix ----

  test("typed v2 cells roundtrip across the scalar matrix") {
    def rt(v: Any, t: String, unsigned: Boolean = false): Any =
      TiKvCodec.decodeCell(TiKvCodec.encodeCell(v, t, unsigned), t, unsigned)
    assert(rt(-42L, "bigint") == -42L)
    assert(rt(255L, "tinyint", unsigned = true) == 255L)
    assert(rt(-1L, "bigint", unsigned = true) == -1L) // u64 max in the Long bits
    assert(rt(3.5, "double") == 3.5)
    assert(rt("héllo", "varchar") == "héllo")
    assert(rt("2023-04-19 11:48:00", "datetime") == "2023-04-19 11:48:00")
    assert(rt(5L, "enum") == 5L)
    assert(rt(0xb1L, "bit") == 0xb1L)
    assert(rt(3600L * 1000000000L, "time") == 3600L * 1000000000L)
    assert(rt(new java.math.BigDecimal("12.30"), "decimal")
      .asInstanceOf[java.math.BigDecimal].compareTo(new java.math.BigDecimal("12.3")) == 0)
    assert(rt(Array[Byte](1, 2, 3), "blob").asInstanceOf[Array[Byte]].toSeq ==
      Seq[Byte](1, 2, 3))
  }
}

/** The mount operator over raw KV entries — the reference's
  * mounter.go decode path driven through Spark. */
class RawKvMounterSpec extends SparkFunSuite {

  private val meta = KvTableMeta(101L, "app", "users",
    Seq(
      KvColumn(1L, "id", "bigint", nullable = false),
      KvColumn(2L, "name", "varchar(64)"),
      KvColumn(3L, "score", "double"),
      KvColumn(4L, "tag", "varchar(16)", default = Some("x")),
      KvColumn(5L, "n", "int", nullable = false)),
    handleCol = "id")

  private def rawDf(rows: Seq[(Array[Byte], Array[Byte], Array[Byte], String, Long, Long)]) = {
    val schema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("old_value", BinaryType), StructField("op_type", StringType),
      StructField("start_ts", LongType), StructField("commit_ts", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromTuple), 2), schema)
  }

  private def key(h: Long) = TiKvCodec.encodeRecordKey(101L, IntHandle(h))
  private def img(id: Long, name: String, score: java.lang.Double,
                  tag: String, n: Long) =
    RawKvMounter.encodeImage(meta, Seq(id, name, score, tag, n))

  test("mount: insert, update with pre-image, delete from old_value") {
    val raw = rawDf(Seq(
      (key(1L), img(1L, "ada", 1.5, "a", 10L), null, "put", 90L, 100L),
      (key(1L), img(1L, "ada2", 2.5, "a", 11L), img(1L, "ada", 1.5, "a", 10L), "put", 190L, 200L),
      (key(2L), img(2L, "bob", null, "b", 20L), null, "put", 90L, 100L),
      (key(2L), null, img(2L, "bob", null, "b", 20L), "delete", 290L, 300L)))
    val out = RawKvMounter.mountTable(raw, meta).collect()
      .sortBy(r => (r.getLong(3),
        Option(r.getStruct(6)).getOrElse(r.getStruct(5)).getLong(0)))
    assert(out.map(_.getString(2)).toSeq == Seq("I", "I", "U", "D"))
    val ins = out(0)
    assert(ins.getStruct(5) == null) // no before image on insert
    assert(ins.getStruct(6).getLong(0) == 1L) // handle from the KEY
    assert(ins.getStruct(6).getString(1) == "ada")
    val upd = out(2)
    assert(upd.getStruct(5).getString(1) == "ada")
    assert(upd.getStruct(6).getString(1) == "ada2")
    val del = out(3)
    assert(del.getStruct(6) == null)
    assert(del.getStruct(5).getString(1) == "bob")
    // null double survives as null, not zero
    assert(out(1).getStruct(6).isNullAt(2))
  }

  test("mount: missing columns fill declared default, else zero when NOT NULL") {
    // value carries only (name) — score nullable→null, tag default "x",
    // n NOT NULL no default → 0
    val value = TiKvCodec.encodeV2(Seq(2L -> Some("eve".getBytes("UTF-8"))))
    val raw = rawDf(Seq((key(7L), value, null, "put", 9L, 10L)))
    val r = RawKvMounter.mountTable(raw, meta).collect().head.getStruct(6)
    assert(r.getLong(0) == 7L)
    assert(r.getString(1) == "eve")
    assert(r.isNullAt(2))
    assert(r.getString(3) == "x")
    assert(r.getLong(4) == 0L)
  }

  test("mount: v1-format values decode through the same path") {
    val v1 = TiKvCodec.encodeV1(Seq(
      2L -> DBytes("old-fmt".getBytes("UTF-8")),
      3L -> DFloat(9.75),
      4L -> DBytes("t".getBytes("UTF-8")),
      5L -> DInt(3L)))
    val raw = rawDf(Seq((key(9L), v1, null, "put", 9L, 10L)))
    val r = RawKvMounter.mountTable(raw, meta).collect().head.getStruct(6)
    assert(r.getLong(0) == 9L && r.getString(1) == "old-fmt")
    assert(r.getDouble(2) == 9.75 && r.getString(3) == "t" && r.getLong(4) == 3L)
  }

  test("versioned mount: as-of decode + conformance to the latest shape " +
      "(add column default, int→varchar modify à la lossy_ddl)") {
    // v1 (ts 0): (id, b int)   — the lossy_ddl example2 shape
    // v2 (ts 150): b modified to varchar(100), c added default 9
    val v1 = KvTableMeta(55L, "app", "ex",
      Seq(KvColumn(1L, "id", "bigint", nullable = false),
        KvColumn(2L, "b", "int")),
      handleCol = "id")
    val v2 = KvTableMeta(55L, "app", "ex",
      Seq(KvColumn(1L, "id", "bigint", nullable = false),
        KvColumn(2L, "b", "varchar(100)"),
        KvColumn(3L, "c", "bigint", default = Some("9"))),
      handleCol = "id")
    def k(h: Long) = TiKvCodec.encodeRecordKey(55L, IntHandle(h))
    // row written BEFORE the DDL: b is an int cell
    val oldRow = RawKvMounter.encodeImage(v1, Seq(1L, 42L))
    // row written AFTER: b is a varchar cell, c present
    val newRow = RawKvMounter.encodeImage(v2, Seq(2L, "forty", 10L))
    val raw = rawDf(Seq(
      (k(1L), oldRow, null, "put", 90L, 100L),
      (k(2L), newRow, null, "put", 190L, 200L)))
    val out = RawKvMounter.mountTableVersioned(raw, Seq(0L -> v1, 150L -> v2))
      .collect().sortBy(_.getLong(3))
    val r1 = out(0).getStruct(6)
    assert(r1.getString(1) == "42", "pre-DDL int cell must decode as int then cast")
    assert(r1.getLong(2) == 9L, "added column fills its default for old rows")
    val r2 = out(1).getStruct(6)
    assert(r2.getString(1) == "forty" && r2.getLong(2) == 10L)
  }

  test("bytes to SQL engine: raw KV entries drive the MySQL sink to the right state") {
    import graft.sinks.{JdbcApplier, MysqlSink}
    val raw = rawDf(Seq(
      (key(1L), img(1L, "ada", 1.5, "a", 10L), null, "put", 90L, 100L),
      (key(2L), img(2L, "bob", 2.0, "b", 20L), null, "put", 90L, 100L),
      (key(1L), img(1L, "ada2", 9.5, "a", 11L), img(1L, "ada", 1.5, "a", 10L), "put", 190L, 200L),
      (key(2L), null, img(2L, "bob", 2.0, "b", 20L), "delete", 290L, 300L)))
    val env = RawKvMounter.mountTable(raw, meta)
      .withColumn("_row_id", coalesce(col("after.id"), col("before.id")))
    val a = JdbcApplier.inMemory("rawkv_e2e")
    a.createTable("app", "users",
      Seq("id" -> "BIGINT", "name" -> "VARCHAR(64)", "score" -> "DOUBLE",
        "tag" -> "VARCHAR(16)", "n" -> "BIGINT"),
      Seq("id"))
    MysqlSink.applyBatch(env, Seq("id"), numWorkers = 2, safeMode = true)(
      JdbcApplier.executeFor(a.url))
    val rows = a.tableRows("app", "users", Seq("id", "name", "score", "n"))
    assert(rows == Seq(Seq(1L, "ada2", 9.5, 11L).map(_.asInstanceOf[Any])))
  }

  test("streaming e2e: raw KV bytes → mount → changefeed → open-protocol messages") {
    import graft.model.ChangefeedConfig
    import graft.streaming.Changefeed
    val tmp = java.nio.file.Files.createTempDirectory("graft-rawkv-stream").toString
    val srcDir = s"$tmp/raw"
    // two files → two micro-batches; each file a batch of raw entries
    rawDf(Seq(
      (key(1L), img(1L, "ada", 1.5, "a", 10L), null, "put", 90L, 100L),
      (key(2L), img(2L, "bob", 2.0, "b", 20L), null, "put", 91L, 101L)))
      .coalesce(1).write.parquet(s"$srcDir/p=1")
    rawDf(Seq(
      (key(1L), img(1L, "ada2", 9.5, "a", 11L), img(1L, "ada", 1.5, "a", 10L), "put", 190L, 200L),
      (key(2L), null, img(2L, "bob", 2.0, "b", 20L), "delete", 290L, 300L)))
      .coalesce(1).write.parquet(s"$srcDir/p=2")

    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val env = RawKvMounter.mountTable(stream, meta)
      .withColumn("_row_id", coalesce(col("after.id"), col("before.id")))
    val cfg = ChangefeedConfig(id = "cf-rawkv", handleKeys = Seq("id"),
      splitUpdateOnKeyChange = false)
    val q = Changefeed.runMqStream(spark, cfg, env, s"$tmp/sink", s"$tmp/ckpt")
    try q.processAllAvailable() finally q.stop()

    val msgs = spark.read.parquet(s"$tmp/sink")
    val rows = msgs.filter(col("_kind") === "row")
    assert(rows.count() == 4, "every mounted change must reach the wire")
    // the open-protocol payloads carry the decoded column values
    val values = rows.select("_value").collect().map(_.getString(0)).mkString("\n")
    assert(values.contains("ada2") && values.contains("\"ada\""))
    // watermark contract: one resolved control message per batch, none
    // below a row it covers
    val resolved = msgs.filter(col("_kind") === "resolved")
    assert(resolved.count() >= 2)
  }

  test("partitioned table: per-partition physical IDs mount to the one logical table") {
    // partition_table scenario: physical partitions p0=201, p1=202 of
    // logical table 200 — records carry the PARTITION's ID in the key
    val part = meta.copy(tableId = 200L, physicalIds = Seq(201L, 202L))
    val raw = rawDf(Seq(
      (RawKvMounter.recordKeyFor(part, Seq(1L, "p0row", 0.0, "x", 1L), Some(201L)),
        RawKvMounter.encodeImage(part, Seq(1L, "p0row", 0.0, "x", 1L)), null, "put", 1L, 2L),
      (RawKvMounter.recordKeyFor(part, Seq(2L, "p1row", 0.0, "x", 1L), Some(202L)),
        RawKvMounter.encodeImage(part, Seq(2L, "p1row", 0.0, "x", 1L)), null, "put", 1L, 2L),
      (TiKvCodec.encodeRecordKey(999L, IntHandle(3L)),
        RawKvMounter.encodeImage(part, Seq(3L, "foreign", 0.0, "x", 1L)), null, "put", 1L, 2L)))
    val out = RawKvMounter.mountTable(raw, part).collect()
      .sortBy(_.getStruct(6).getLong(0))
    assert(out.map(_.getStruct(6).getString(1)).toSeq == Seq("p0row", "p1row"))
    assert(out.forall(r => r.getString(0) == "app" && r.getString(1) == "users"))
  }

  test("common handle: multi-column clustered PK decodes from the key") {
    // clustered PK (region varchar, seq bigint) — no int handle
    val ch = KvTableMeta(77L, "app", "events_ch",
      Seq(
        KvColumn(1L, "region", "varchar(16)", nullable = false),
        KvColumn(2L, "seq", "bigint", nullable = false),
        KvColumn(3L, "payload", "varchar(64)")),
      handleCol = "region", moreHandleCols = Seq("seq"))
    val payload = Seq[Any]("eu-west", 42L, "hello")
    val raw = rawDf(Seq(
      (RawKvMounter.recordKeyFor(ch, payload),
        RawKvMounter.encodeImage(ch, payload), null, "put", 9L, 10L)))
    val r = RawKvMounter.mountTable(raw, ch).collect().head.getStruct(6)
    assert(r.getString(0) == "eu-west", "first handle col from the key")
    assert(r.getLong(1) == 42L, "second handle col from the key")
    assert(r.getString(2) == "hello")
    // the value section must NOT carry the handle cols
    val row = TiKvCodec.decodeV2(RawKvMounter.encodeImage(ch, payload))
    assert(row.cell(1L).isEmpty && row.cell(2L).isEmpty && row.cell(3L).nonEmpty)
  }

  test("in-row checksum: carried in the v2 checksum region, verified at mount, " +
      "tampering caught, extra checksum honored (integrity feature)") {
    import graft.functions.RowChecksum
    import graft.model.MySqlDdl.MySqlCol
    val payload = Seq[Any](5L, "ada", 2.5, "a", 10L)
    val good = RawKvMounter.encodeImageChecksummed(meta, payload)
    // region present with version 0 and a first checksum
    val region = TiKvCodec.decodeV2(good).checksum.getOrElse(fail("no checksum region"))
    assert(region.version == 0 && region.extra.isEmpty)

    // cross-implementation equality: the plain fold == the codegen'd
    // Catalyst expression (itself golden-pinned to the reference's
    // verify_checksum vectors)
    import spark.implicits._
    val mysqlCols = Seq(
      MySqlCol("id", "bigint"), MySqlCol("name", "varchar", flen = 64),
      MySqlCol("score", "double"), MySqlCol("tag", "varchar", flen = 16),
      MySqlCol("n", "int"))
    val catalyst = Seq((5L, "ada", 2.5, "a", 10L))
      .toDF("id", "name", "score", "tag", "n")
      .select(RowChecksum.checksumOf(mysqlCols,
        Seq(col("id"), col("name"), col("score"), col("tag"), col("n"))).as("c"))
      .head.getLong(0)
    assert(region.first == catalyst,
      s"plain fold ${region.first} != catalyst $catalyst")

    // verification: good row ok; tampered cell caught; checksum-free
    // row passes (integrity off); extra checksum rescues a mismatched
    // first (online-DDL window)
    val tampered = good.clone()
    // first byte of the value-data section (header 6 + 4 ids + 4 u16
    // offsets = 18): corrupt the name cell's first byte
    tampered(18) = (tampered(18) ^ 0x01).toByte
    val noCks = RawKvMounter.encodeImage(meta, payload)
    val extraOk = TiKvCodec.encodeV2Checksummed(
      TiKvCodec.decodeV2(noCks).notNull.map { case (id, c) => (id, Some(c)) },
      first = 12345L, extra = Some(region.first))
    val raw = rawDf(Seq(
      (key(5L), good, null, "put", 1L, 10L),
      (key(5L), tampered, null, "put", 1L, 20L),
      (key(5L), noCks, null, "put", 1L, 30L),
      (key(5L), extraOk, null, "put", 1L, 40L)))
    val verdicts = RawKvMounter.verifyInRowChecksums(raw, meta)
      .collect().sortBy(_.getLong(0)).map(r => (r.getLong(0), r.getBoolean(4)))
    assert(verdicts.toSeq == Seq((10L, true), (20L, false), (30L, true), (40L, true)),
      s"got ${verdicts.toSeq}")
  }

  test("timestamp renders in the changefeed tz; datetime never shifts; " +
      "virtual generated columns mount as NULL") {
    val m = KvTableMeta(88L, "app", "tzt",
      Seq(
        KvColumn(1L, "id", "bigint", nullable = false),
        KvColumn(2L, "created", "timestamp"),
        KvColumn(3L, "local_dt", "datetime"),
        KvColumn(4L, "doubled", "bigint", virtualGen = true)),
      handleCol = "id", tz = "Asia/Shanghai")
    // value stores the packed UTC core for TIMESTAMP; a virtual
    // generated column is never in the value
    val value = TiKvCodec.encodeV2(Seq(
      2L -> Some(TiKvCodec.encodeCell("2020-01-01 00:00:00", "timestamp")),
      3L -> Some(TiKvCodec.encodeCell("2020-01-01 00:00:00", "datetime"))))
    val raw = rawDf(Seq((TiKvCodec.encodeRecordKey(88L, IntHandle(1L)),
      value, null, "put", 9L, 10L)))
    val r = RawKvMounter.mountTable(raw, m).collect().head.getStruct(6)
    assert(r.getString(1) == "2020-01-01 08:00:00", "UTC+8 render for TIMESTAMP")
    assert(r.getString(2) == "2020-01-01 00:00:00", "DATETIME is zone-naive")
    assert(r.isNullAt(3), "virtual generated column mounts as NULL")
  }

  test("exchange partition: physical-ID membership is as-of the row's commit-ts") {
    // before ts 150 the table's partition is physical 201; the
    // exchange swaps in 202 from then on
    val v1 = meta.copy(tableId = 200L, physicalIds = Seq(201L))
    val v2 = meta.copy(tableId = 200L, physicalIds = Seq(202L))
    def k(pid: Long, h: Long) = TiKvCodec.encodeRecordKey(pid, IntHandle(h))
    val raw = rawDf(Seq(
      (k(201L, 1L), img(1L, "pre-old-part", 0.0, "x", 1L), null, "put", 1L, 100L),
      (k(202L, 2L), img(2L, "pre-foreign", 0.0, "x", 1L), null, "put", 1L, 100L),
      (k(202L, 3L), img(3L, "post-new-part", 0.0, "x", 1L), null, "put", 1L, 200L),
      (k(201L, 4L), img(4L, "post-foreign", 0.0, "x", 1L), null, "put", 1L, 200L)))
    val names = RawKvMounter.mountTableVersioned(raw, Seq(0L -> v1, 150L -> v2))
      .collect().map(_.getStruct(6).getString(1)).toSet
    assert(names == Set("pre-old-part", "post-new-part"),
      s"as-of membership failed: $names")
  }

  test("RawKVEntry wire frame: golden header layout, roundtrip, resolved " +
      "extraction, and frame→mount equivalence") {
    import graft.model.RawKvEntryCodec
    import graft.model.RawKvEntryCodec._
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    // golden: put, crts=0x10, start=0x0F, region=2, key="k", value="v",
    // no old value — byte-for-byte the kv_entry.go:146-166 layout
    val golden = encode(RawEntry(OpPut, 0x10L, 0x0fL, 2L,
      "k".getBytes, "v".getBytes, null))
    assert(hex(golden) ==
      "01000000" +                  // op u32 LE
      "1000000000000000" +          // crts u64 LE
      "0f00000000000000" +          // start_ts
      "0200000000000000" +          // region_id
      "01000000" + "01000000" + "00000000" + // key/value/old lens
      "6b" + "76")                  // 'k', 'v'
    assert(golden.length == HeaderSize + 2)
    val back = decode(golden)
    assert(back.opType == OpPut && back.crts == 0x10L && back.regionId == 2L)
    assert(new String(back.key) == "k" && new String(back.value) == "v" &&
      back.oldValue.isEmpty)

    // frames → unpack → mount ≡ direct mount; resolved frames carry
    // the watermark channel
    import spark.implicits._
    val frames = Seq(
      encode(RawEntry(OpPut, 100L, 90L, 7L, key(1L),
        img(1L, "ada", 1.5, "a", 10L), null)),
      encode(RawEntry(OpPut, 200L, 190L, 7L, key(1L),
        img(1L, "ada2", 2.5, "a", 11L), img(1L, "ada", 1.5, "a", 10L))),
      encode(RawEntry(OpDelete, 300L, 290L, 7L, key(1L),
        null, img(1L, "ada2", 2.5, "a", 11L))),
      encode(RawEntry(OpResolved, 305L, 0L, 7L, null, null, null)))
      .toDF("entry")
    val unpacked = RawKvMounter.fromEncodedEntries(frames)
    val out = RawKvMounter.mountTable(unpacked, meta).collect().sortBy(_.getLong(3))
    assert(out.map(_.getString(2)).toSeq == Seq("I", "U", "D"))
    assert(out(1).getStruct(6).getString(1) == "ada2")
    assert(out(1).getStruct(5).getString(1) == "ada")
    val wm = RawKvMounter.resolvedTsOf(frames).collect()
    assert(wm.length == 1 && wm.head.getLong(0) == 7L && wm.head.getLong(1) == 305L)
  }

  test("event wire header: golden magic/type/version/length layout, " +
      "framed RawKVEntry round trip, bad magic rejected") {
    import graft.model.{EventHeaderCodec, RawKvEntryCodec}
    import graft.model.EventHeaderCodec._
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    // header.go:40-52: BE magic DA7A6A6A, type 2, version 1, len 3
    val framed = marshal(TypeDDL, 1, Array[Byte](7, 8, 9))
    assert(hex(framed) ==
      "da7a6a6a" + "0002" + "0001" + "0000000000000003" + "070809")
    val (t, v, payload) = unmarshal(framed)
    assert(t == TypeDDL && v == 1 && payload.toSeq == Seq[Byte](7, 8, 9))

    // a DML event frame carrying a RawKVEntry payload — the
    // message-center shape — survives the full wrap/unwrap
    val entry = RawKvEntryCodec.RawEntry(RawKvEntryCodec.OpPut, 100L, 90L, 7L,
      key(1L), img(1L, "ada", 1.5, "a", 10L), null)
    val wire = marshal(TypeDML, 1, RawKvEntryCodec.encode(entry))
    val (t2, _, p2) = unmarshal(wire)
    assert(t2 == TypeDML)
    val back = RawKvEntryCodec.decode(p2)
    assert(back.crts == 100L && new String(back.key.take(1)) == "t")

    // corrupted magic must be rejected with the reference's error shape
    val bad = framed.clone(); bad(0) = 0x00
    val err = intercept[IllegalArgumentException](unmarshal(bad))
    assert(err.getMessage.contains("invalid magic bytes"))
    intercept[IllegalArgumentException](unmarshal(Array[Byte](1, 2, 3)))
  }

  test("msgp form: struct-ordered map with golden prefix, minimal widths, " +
      "nil-slice tolerance, roundtrip") {
    import graft.model.{RawKvEntryCodec, RawKvEntryMsgp}
    import graft.model.RawKvEntryCodec.RawEntry
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    val e = RawEntry(RawKvEntryCodec.OpPut, 300L, 90L, 7L,
      "k".getBytes, "v".getBytes, null)
    val enc = RawKvEntryMsgp.encode(e)
    // fixmap(10), fixstr "op_type", fixint 1, fixstr "crts", uint16 300
    assert(hex(enc).startsWith(
      "8a" + "a76f705f74797065" + "01" + "a463727473" + "cd012c"))
    val back = RawKvEntryMsgp.decode(enc)
    assert(back.opType == 1 && back.crts == 300L && back.startTs == 90L &&
      back.regionId == 7L)
    assert(new String(back.key) == "k" && new String(back.value) == "v" &&
      back.oldValue.isEmpty)

    // widths: 1600-byte value → bin16; u64-range crts → 0xcf
    val big = RawEntry(RawKvEntryCodec.OpDelete, Long.MaxValue, 0L, 0L,
      null, null, Array.fill[Byte](1600)('x'))
    val encBig = RawKvEntryMsgp.encode(big)
    assert(hex(encBig).contains("cf7fffffffffffffff"), "u64 width for crts")
    assert(hex(encBig).contains("c50640"), "bin16 for the 1600-byte section")
    val backBig = RawKvEntryMsgp.decode(encBig)
    assert(backBig.crts == Long.MaxValue && backBig.oldValue.length == 1600)

    // a foreign encoder writing nil for an absent slice still decodes:
    // hand-built frame map(1) { "key": nil }
    val handNil = Array[Byte](0x81.toByte, 0xa3.toByte, 'k', 'e', 'y', 0xc0.toByte)
    assert(RawKvEntryMsgp.decode(handNil).key.isEmpty)
  }

  test("mount drops foreign-table, index, and non-record keys") {
    val otherTable = TiKvCodec.encodeRecordKey(999L, IntHandle(1L))
    // an INDEX key of OUR table: 't' + tableID + "_i" + indexID + datums —
    // not a row change; it must be dropped, never decoded
    val indexKey = {
      val rec = key(1L)
      rec(10) = 'i'; rec
    }
    val raw = rawDf(Seq(
      (otherTable, img(1L, "z", 0.0, "x", 1L), null, "put", 1L, 2L),
      ("m_meta".getBytes, Array[Byte](1), null, "put", 1L, 2L),
      (indexKey, Array[Byte](0, 1), null, "put", 1L, 2L),
      (key(1L), img(1L, "keep", 0.0, "x", 1L), null, "put", 1L, 2L)))
    val out = RawKvMounter.mountTable(raw, meta).collect()
    assert(out.length == 1 && out.head.getStruct(6).getString(1) == "keep")
  }

  test("unsigned BIGINT mounts as DECIMAL(20,0): values above Long.MaxValue " +
      "surface unwrapped, matching the SQL-model path") {
    val m = KvTableMeta(101L, "app", "u64t",
      Seq(
        KvColumn(1L, "id", "bigint", nullable = false),
        KvColumn(2L, "big", "bigint", unsigned = true),
        KvColumn(3L, "small_u", "int", unsigned = true)),
      handleCol = "id")
    assert(RawKvMounter.sparkType(KvColumn(2L, "big", "bigint", unsigned = true)) ==
      DecimalType(20, 0))
    // 2^64 - 6 = 18446744073709551610: wraps to -6 in the uint cell
    val overMax = new java.math.BigDecimal("18446744073709551610")
    val value = TiKvCodec.encodeV2(Seq(
      2L -> Some(TiKvCodec.uintCell(-6L)),
      3L -> Some(TiKvCodec.uintCell(4000000000L))))
    val raw = rawDf(Seq((key(1L), value, null, "put", 1L, 2L)))
    val row = RawKvMounter.mountTable(raw, m).collect().head.getStruct(6)
    assert(row.getDecimal(1).compareTo(overMax) == 0,
      s"expected $overMax got ${row.getDecimal(1)}")
    assert(row.getLong(2) == 4000000000L, "narrow unsigned fits a Long exactly")
    // and the in-row checksum over the mounted image agrees with the
    // RowChecksum DECIMAL(20,0) token fold (the inverse conversions
    // compose)
    val sealed0 = RawKvMounter.encodeImageChecksummed(m, Seq(1L, overMax, 4000000000L))
    val verdict = RawKvMounter.verifyInRowChecksums(
      rawDf(Seq((key(1L), sealed0, null, "put", 1L, 2L))), m).collect().head
    assert(verdict.getBoolean(4) && verdict.getBoolean(5),
      s"u64 checksum must verify: $verdict")
  }

  test("v1 rows render TIMESTAMP in the changefeed tz like v2 (datetime naive)") {
    val m = KvTableMeta(101L, "app", "tzv1",
      Seq(
        KvColumn(1L, "id", "bigint", nullable = false),
        KvColumn(2L, "created", "timestamp"),
        KvColumn(3L, "local_dt", "datetime")),
      handleCol = "id", tz = "Asia/Shanghai")
    val packed = graft.model.PackedTime.pack("2020-01-01 00:00:00")
    val v1 = TiKvCodec.encodeV1(Seq(
      2L -> DUint(packed), 3L -> DUint(packed)))
    assert(!TiKvCodec.isNewFormat(v1))
    val row = RawKvMounter.mountTable(
      rawDf(Seq((key(1L), v1, null, "put", 1L, 2L))), m).collect().head.getStruct(6)
    assert(row.getString(1) == "2020-01-01 08:00:00",
      s"v1 TIMESTAMP must shift to UTC+8, got ${row.getString(1)}")
    assert(row.getString(2) == "2020-01-01 00:00:00", "DATETIME stays naive")
  }

  test("unsigned BIGINT primary key keys as an int handle (u64 bit pattern) " +
      "and round-trips through encode -> mount") {
    val m = KvTableMeta(89L, "app", "u64pk",
      Seq(
        KvColumn(1L, "id", "bigint", unsigned = true, nullable = false),
        KvColumn(2L, "v", "bigint")),
      handleCol = "id")
    val big = new java.math.BigDecimal("18446744073709551615") // 2^64 - 1
    val payload = Seq[Any](big, 7L)
    // encode side: the key is a PLAIN int handle carrying the bit
    // pattern (TiDB's unsigned int-handle encoding), not a common
    // handle — and it must not throw
    val keyBytes = RawKvMounter.recordKeyFor(m, payload)
    val (tid, h) = TiKvCodec.decodeRecordKey(keyBytes)
    assert(tid == 89L && h == TiKvCodec.IntHandle(-1L))
    // decode side re-renders the u64 from the bits
    val value = RawKvMounter.encodeImage(m, payload)
    val row = RawKvMounter.mountTable(
      rawDf(Seq((keyBytes, value, null, "put", 1L, 2L))), m)
      .collect().head.getStruct(6)
    assert(row.getDecimal(0).compareTo(big) == 0,
      s"expected $big got ${row.getDecimal(0)}")
    assert(row.getLong(1) == 7L)
    // sub-Long.Max unsigned values keep their natural bits
    val small = RawKvMounter.recordKeyFor(m,
      Seq[Any](new java.math.BigDecimal(42), 1L))
    assert(TiKvCodec.decodeRecordKey(small)._2 == TiKvCodec.IntHandle(42L))
  }

  test("raw-bytes checksum (v1/v2) golden: hand-assembled domain bytes, " +
      "CRC32-IEEE over value-before-region + record key") {
    // one not-null bigint cell (colId 2, value 7) on an int-handle key
    // — small enough to lay the domain out by hand, byte by byte
    val cells = Seq(2L -> Some(TiKvCodec.encodeCell(7L, "bigint", unsigned = false)))
    val k = key(5L)
    val v = TiKvCodec.encodeV2RawChecksummed(cells, k, version = 1)
    // hand-assembled expected domain: the v2 row WITHOUT the region —
    // codecVer 128, flags = checksum bit (8), 1 not-null, 0 null,
    // colId byte 2, u16 LE offset 1, cell byte 0x07 — then the key
    val domain = Array[Byte](
      0x80.toByte, 0x08, 0x01, 0x00, 0x00, 0x00, 0x02, 0x01, 0x00, 0x07
    ) ++ k
    val crc = new java.util.zip.CRC32(); crc.update(domain)
    val expected = crc.getValue & 0xFFFFFFFFL
    // the produced value = domain-minus-key, then header byte
    // (version 1, no extra), then the u32 LE checksum word
    val hdrAt = domain.length - k.length
    assert(v.length == hdrAt + 5,
      s"region layout: ${v.map(x => f"${x & 0xff}%02x").mkString}")
    assert(java.util.Arrays.equals(v.take(hdrAt), domain.take(hdrAt)))
    assert((v(hdrAt) & 0xff) == 1)
    val stored = (v(hdrAt + 1) & 0xffL) | ((v(hdrAt + 2) & 0xffL) << 8) |
      ((v(hdrAt + 3) & 0xffL) << 16) | ((v(hdrAt + 4) & 0xffL) << 24)
    assert(stored == expected, f"stored $stored%08x expected $expected%08x")
    assert(TiKvCodec.rawChecksumOf(v, k).contains(expected))
    assert(TiKvCodec.decodeV2(v).checksum.map(_.first).contains(expected))
  }

  test("raw-bytes checksum domain covers the KEY and the value, " +
      "excludes the region words (extra included)") {
    val payload = Seq(5L, "eve", 2.5, "x", 7L)
    val noCks = RawKvMounter.encodeImage(meta, payload)
    val cells = TiKvCodec.decodeV2(noCks).notNull.map { case (id, c) => (id, Some(c)) }
    val k = key(5L)
    val good = TiKvCodec.encodeV2RawChecksummed(cells, k, version = 2)
    val cks = TiKvCodec.rawChecksumOf(good, k).get
    assert(TiKvCodec.decodeV2(good).checksum.map(_.first).contains(cks))
    // a different key → different checksum (key IS in the domain)
    assert(!TiKvCodec.rawChecksumOf(good, key(6L)).contains(cks))
    // value tamper (flip one cell byte) → verify catches it
    val tampered = good.clone()
    tampered(9) = (tampered(9) ^ 0x01).toByte
    assert(!TiKvCodec.rawChecksumOf(tampered, k).contains(cks))
    // region word tamper → the DOMAIN checksum is unchanged (the
    // checksum cannot cover itself), only the stored word moved
    val wordFlip = good.clone()
    wordFlip(wordFlip.length - 1) = (wordFlip(wordFlip.length - 1) ^ 0x40).toByte
    assert(TiKvCodec.rawChecksumOf(wordFlip, k).contains(cks))
    assert(!TiKvCodec.decodeV2(wordFlip).checksum.map(_.first).contains(cks))
    // extra word present: same domain → same first checksum
    val withExtra = TiKvCodec.encodeV2RawChecksummed(
      cells, k, version = 2, extra = Some(12345L))
    assert(TiKvCodec.decodeV2(withExtra).checksum.map(_.first).contains(cks))
    assert(TiKvCodec.decodeV2(withExtra).checksum.flatMap(_.extra).contains(12345L))
    assert(TiKvCodec.rawChecksumOf(withExtra, k).contains(cks))
  }

  test("new-collation (general_ci) clustered string PK: the key carries the " +
      "sort key, the value carries restore data, the mount restores the " +
      "original case (ci_collation_compatibility)") {
    val ciMeta = KvTableMeta(120L, "app", "ci_users", Seq(
      KvColumn(1L, "name", "varchar(64)", nullable = false,
        collation = "utf8mb4_general_ci"),
      KvColumn(2L, "score", "bigint")),
      handleCol = "name")
    val payload = Seq[Any]("Alice", 7L)
    val key = RawKvMounter.recordKeyFor(ciMeta, payload)
    // CI identity: case variants key identically (conflict semantics),
    // binary-collation variants would not
    assert(java.util.Arrays.equals(key,
      RawKvMounter.recordKeyFor(ciMeta, Seq[Any]("ALICE", 7L))))
    assert(java.util.Arrays.equals(key,
      RawKvMounter.recordKeyFor(ciMeta, Seq[Any]("aLiCe", 7L))))
    assert(!java.util.Arrays.equals(key,
      RawKvMounter.recordKeyFor(ciMeta, Seq[Any]("Alicf", 7L))))
    // the key's datum is the 2-byte-weight sort key, NOT utf-8 text
    val CommonHandle(ds) = TiKvCodec.decodeRecordKey(key)._2
    val DBytes(sortKey) = ds.head
    assert(sortKey.toSeq == "ALICE".flatMap(c =>
      Seq(0.toByte, c.toByte)).toSeq, "general_ci weights = uppercase BMP")
    // restore data: the row value CARRIES the name cell
    val img = RawKvMounter.encodeImage(ciMeta, payload)
    assert(TiKvCodec.decodeV2(img).cell(1L).isDefined,
      "CI handle column must ride the value as restore data")
    // the mount restores the ORIGINAL case from the value, not the key
    val mounted = RawKvMounter.mountTable(
      rawDf(Seq((key, img, null, "put", 1L, 10L))), ciMeta)
      .select("after.name", "after.score").head()
    assert(mounted.getString(0) == "Alice" && mounted.getLong(1) == 7L)
    // supplementary-plane runes weight as 0xFFFD (plane-0 rule)
    assert(RawKvMounter.generalCiSortKey("😀").toSeq ==
      Seq(0xFF.toByte, 0xFD.toByte))
    // MySQL's frozen-table divergences from the JDK mapping: general_ci
    // compares ß = s and İ = i (the pinned exception map)
    assert(RawKvMounter.generalCiSortKey("ß").toSeq ==
      RawKvMounter.generalCiSortKey("s").toSeq, "general_ci: ß = s")
    assert(RawKvMounter.generalCiSortKey("İ").toSeq ==
      RawKvMounter.generalCiSortKey("i").toSeq, "general_ci: İ = i")
    // post-freeze code points take the fallback weight (themselves)
    assert(RawKvMounter.generalCiSortKey("\u1e9e").toSeq ==
      Seq(0x1E.toByte, 0x9E.toByte))
  }

  test("raw checksum: TWO independent derivations agree on 1500 randomized " +
      "rows — stored-bytes fold vs full-decode + canonical re-encode " +
      "(CalculateRawChecksum's datum path, checksum.go:140-177) — and both " +
      "match the embedded region") {
    val rnd = new scala.util.Random(42)
    var bigSeen = 0; var nullSeen = 0; var extraSeen = 0
    (1 to 1500).foreach { i =>
      val nCols = 1 + rnd.nextInt(8)
      // random ids, sometimes >255 to force the big layout
      val ids = rnd.shuffle((1L to 500L).toList).take(nCols)
      val cells: Seq[(Long, Option[Array[Byte]])] = ids.map { id =>
        rnd.nextInt(4) match {
          case 0 => id -> None // null column rides the null-id array
          case 1 => id -> Some(TiKvCodec.intCell(rnd.nextLong()))
          case 2 =>
            val b = new Array[Byte](rnd.nextInt(40)); rnd.nextBytes(b)
            id -> Some(b)
          case _ => id -> Some(TiKvCodec.intCell(rnd.nextInt(3).toLong))
        }
      }
      if (ids.exists(_ > 255L)) bigSeen += 1
      if (cells.exists(_._2.isEmpty)) nullSeen += 1
      val key = TiKvCodec.encodeRecordKey(100L + rnd.nextInt(900),
        TiKvCodec.IntHandle(rnd.nextLong()))
      val version = 1 + rnd.nextInt(2)
      val extra = if (rnd.nextBoolean()) { extraSeen += 1; Some(rnd.nextInt(1 << 30).toLong) } else None
      val value = TiKvCodec.encodeV2RawChecksummed(cells, key, version, extra)
      val stored = TiKvCodec.decodeV2(value).checksum.map(_.first)
      val d1 = TiKvCodec.rawChecksumOf(value, key)
      val d2 = TiKvCodec.rawChecksumReencoded(value, key)
      assert(d1.isDefined && d1 == d2,
        s"row $i: stored-bytes fold $d1 != re-encode fold $d2 (cells=$cells)")
      assert(stored == d1, s"row $i: embedded region $stored != computed $d1")
      // a tampered region still fails BOTH ways
      val bad = TiKvCodec.encodeV2RawChecksummed(cells, key, version, extra,
        corrupt = true)
      assert(TiKvCodec.decodeV2(bad).checksum.map(_.first) !=
        TiKvCodec.rawChecksumReencoded(bad, key))
    }
    assert(bigSeen > 100 && nullSeen > 400 && extraSeen > 400,
      s"regime coverage: big=$bigSeen null=$nullSeen extra=$extraSeen")
  }

  test("_row_id for common handles is deterministic across independent " +
      "decodes (byte-level FNV over the handle key bytes, not object hash)") {
    val ciMeta = KvTableMeta(121L, "app", "rowid_users", Seq(
      KvColumn(1L, "name", "varchar(64)", nullable = false,
        collation = "utf8mb4_general_ci"),
      KvColumn(2L, "score", "bigint")),
      handleCol = "name")
    def mountIds(): Map[String, Long] = {
      // fresh key/value byte arrays each call — an identity-based hash
      // would differ between calls even for identical logical rows
      val rows = Seq("Alice", "Bob").zipWithIndex.map { case (n, i) =>
        val p = Seq[Any](n, i.toLong)
        (RawKvMounter.recordKeyFor(ciMeta, p),
          RawKvMounter.encodeImage(ciMeta, p),
          null.asInstanceOf[Array[Byte]], "put", 1L, 10L)
      }
      RawKvMounter.mountTables(rawDf(rows), Seq(ciMeta))
        .select("after.name", "_row_id").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val a = mountIds()
    val b = mountIds()
    assert(a == b, s"_row_id must be retry/restart-stable: $a vs $b")
    assert(a("Alice") != a("Bob"), "distinct handles must get distinct ids")
  }

  test("fused mount->encode over heterogeneous shapes: ONE pass emits " +
      "canal-JSON wire bytes per table, byte-identical to the columnar " +
      "canalJsonFor over each table's own struct mount — updates with " +
      "pre-images, deletes, null doubles, escaped strings included") {
    import graft.functions.Codecs
    val metaB = KvTableMeta(202L, "app", "tags",
      Seq(KvColumn(1L, "id", "bigint", nullable = false),
        KvColumn(2L, "tag", "varchar(16)")), handleCol = "id")
    def keyB(h: Long) = TiKvCodec.encodeRecordKey(202L, IntHandle(h))
    def imgB(id: Long, tag: String) =
      RawKvMounter.encodeImage(metaB, Seq(id, tag))
    val rowsA = Seq(
      (key(1L), img(1L, "ada", 1.5, "a", 10L), null, "put", 90L, 100L),
      (key(1L), img(1L, "ada2", 2.5, "a", 11L),
        img(1L, "ada", 1.5, "a", 10L), "put", 190L, 200L),
      (key(2L), img(2L, "bob", null, "b", 20L), null, "put", 90L, 100L),
      (key(2L), null, img(2L, "bob", null, "b", 20L), "delete", 290L, 300L))
    // different SHAPE, plus an escape-needing string
    val rowsB = Seq(
      (keyB(7L), imgB(7L, "t\"x\\y"), null, "put", 90L, 110L),
      (keyB(7L), null, imgB(7L, "t\"x\\y"), "delete", 190L, 210L))
    val plan = Map(
      101L -> Seq(0L -> Option(meta)),
      202L -> Seq(0L -> Option(metaB)))
    val fused = RawKvMounter
      .mountTablesEncodeCanal(rawDf(rowsA ++ rowsB), plan)
      .select("_value").collect().map(_.getString(0)).toSet
    def columnar(ms: KvTableMeta,
                 rows: Seq[(Array[Byte], Array[Byte], Array[Byte], String, Long, Long)]) =
      Codecs.canalJsonFor(RawKvMounter.mountTables(rawDf(rows), Seq(ms)),
          ms.handleCols)
        .select("_value").collect().map(_.getString(0)).toSet
    val expected = columnar(meta, rowsA) ++ columnar(metaB, rowsB)
    assert(fused == expected,
      s"fused wire must equal the per-table feeds' union:\n" +
        s"only-fused: ${fused.diff(expected)}\nonly-cols: ${expected.diff(fused)}")
  }

  test("fused mount->encode to the CSV storage wire: record-identical to " +
      "the columnar csvLineFor per table; output-old-value splits updates " +
      "into flagged D+I records") {
    import graft.functions.Codecs
    val metaB = KvTableMeta(202L, "app", "tags",
      Seq(KvColumn(1L, "id", "bigint", nullable = false),
        KvColumn(2L, "tag", "varchar(16)")), handleCol = "id")
    def keyB(h: Long) = TiKvCodec.encodeRecordKey(202L, IntHandle(h))
    def imgB(id: Long, tag: String) =
      RawKvMounter.encodeImage(metaB, Seq(id, tag))
    val rowsA = Seq(
      (key(1L), img(1L, "ada", 1.5, "a", 10L), null, "put", 90L, 100L),
      (key(1L), img(1L, "ada2", 2.5, "a", 11L),
        img(1L, "ada", 1.5, "a", 10L), "put", 190L, 200L),
      (key(2L), img(2L, "bob", null, "b", 20L), null, "put", 90L, 100L),
      (key(2L), null, img(2L, "bob", null, "b", 20L), "delete", 290L, 300L))
    val rowsB = Seq(
      (keyB(7L), imgB(7L, "t\"x,y"), null, "put", 90L, 110L),
      (keyB(7L), null, imgB(7L, "t\"x,y"), "delete", 190L, 210L))
    val plan = Map(
      101L -> Seq(0L -> Option(meta)),
      202L -> Seq(0L -> Option(metaB)))
    val fused = RawKvMounter
      .mountTablesEncodeCsv(rawDf(rowsA ++ rowsB), plan)
      .select("_value").collect().map(_.getString(0)).toSet
    def columnar(ms: KvTableMeta,
                 rows: Seq[(Array[Byte], Array[Byte], Array[Byte], String, Long, Long)]) =
      Codecs.csvLineFor(RawKvMounter.mountTables(rawDf(rows), Seq(ms)))
        .select("_value").collect().map(_.getString(0)).toSet
    val expected = columnar(meta, rowsA) ++ columnar(metaB, rowsB)
    assert(fused == expected,
      s"fused csv must equal the per-table feeds' union:\n" +
        s"only-fused: ${fused.diff(expected)}\nonly-cols: ${expected.diff(fused)}")
    // quoting sanity: the comma/quote-bearing tag is RFC-4180 safe
    assert(fused.exists(_.contains("\"t\"\"x,y\"")))

    // output-old-value: the update becomes a two-record D+I message
    // with the is-updated column after commitTs (csv_message.go:104-140)
    val ov = RawKvMounter
      .mountTablesEncodeCsv(rawDf(rowsA), Map(101L -> Seq(0L -> Option(meta))),
        outputOldValue = true)
      .select("_op", "_value").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    val uMsg = ov("U")
    val recs = uMsg.split("\n")
    assert(recs.length == 2)
    assert(recs(0).startsWith("\"D\",\"users\",\"app\",200,true,") ||
      recs(0).startsWith("\"D\",\"" + meta.table + "\",\"" + meta.schema + "\",200,true,"),
      s"old-value D record: ${recs(0)}")
    assert(recs(1).contains(",true,") && recs(1).startsWith("\"I\","))
    assert(ov("I").contains(",false,"), s"insert flagged false: ${ov("I")}")
  }

  test("integrity-fused mount: warn level marks corrupted rows and forwards, " +
      "error level fails the feed (mounter.go:79-146 ErrCorruptedDataMutation)") {
    val payload = Seq(5L, "eve", 2.5, "x", 7L)
    val k = key(5L)
    val good = RawKvMounter.encodeImageChecksummed(meta, payload)
    val cells = TiKvCodec.decodeV2(RawKvMounter.encodeImage(meta, payload))
      .notNull.map { case (id, c) => (id, Some(c)) }
    val badV1 = TiKvCodec.encodeV2RawChecksummed(cells, k, version = 1,
      corrupt = true)
    val noRegion = RawKvMounter.encodeImage(meta, payload)
    val raw = rawDf(Seq(
      (k, good, null, "put", 1L, 10L),
      (k, badV1, null, "put", 1L, 20L),
      (k, noRegion, null, "put", 1L, 30L)))
    // warn: the corrupted row FORWARDS, flagged
    val out = RawKvMounter.mountTableVerified(raw, meta, errorHandle = false)
      .select("_commit_ts", "_corrupted").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
    assert(out == Seq((10L, false), (20L, true), (30L, false)), s"got $out")
    // error: the feed fails with the CDC error class
    val e = intercept[org.apache.spark.SparkException] {
      RawKvMounter.mountTableVerified(raw, meta, errorHandle = true).count()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    assert(rootMessages(e).exists(_.contains("CDC:ErrCorruptedDataMutation")),
      rootMessages(e).mkString(" | "))
    // a corrupted PRE-image follows the same handle level
    val badPre = rawDf(Seq((k, good,
      TiKvCodec.encodeV2RawChecksummed(cells, k, version = 2, corrupt = true),
      "put", 1L, 40L)))
    val pre = RawKvMounter.mountTableVerified(badPre, meta, errorHandle = false)
      .select("_corrupted").head().getBoolean(0)
    assert(pre, "a corrupted v2 pre-image must mark the event corrupted")
    // the multi-table (steady-state) mount fuses the error level too
    val multiOk = RawKvMounter.mountTables(raw, Seq(meta),
      failOnCorruption = false).count()
    assert(multiOk == 3L, "without the error level every row mounts")
    val e2 = intercept[org.apache.spark.SparkException] {
      RawKvMounter.mountTables(raw, Seq(meta), failOnCorruption = true).count()
    }
    assert(rootMessages(e2).exists(_.contains("CDC:ErrCorruptedDataMutation")),
      rootMessages(e2).mkString(" | "))
  }

  test("previous-image checksums: v0 pre-row mismatch warn-skips " +
      "(checksum.go:100-112), v1/v2 raw-bytes verify previous strictly") {
    val payload = Seq(5L, "eve", 2.5, "x", 7L)
    val prePayload = Seq(5L, "eva", 2.0, "y", 6L)
    val k = key(5L)
    val cur = RawKvMounter.encodeImageChecksummed(meta, payload) // correct v0
    def cells(p: Seq[Any]) = TiKvCodec.decodeV2(RawKvMounter.encodeImage(meta, p))
      .notNull.map { case (id, c) => (id, Some(c)) }
    // corrupted v0 old value: stored = computed + 1
    val preTokens = meta.columns.zip(prePayload).map { case (c, v) =>
      graft.functions.RowChecksum.tokenPlain(
        c.sqlType.takeWhile(_ != '('), v)
    }
    val preCrc = graft.functions.RowChecksum.crc32Plain(preTokens)
    val oldBadV0 = TiKvCodec.encodeV2Checksummed(cells(prePayload),
      first = (preCrc + 1L) & 0xFFFFFFFFL)
    val oldBadV1 = TiKvCodec.encodeV2RawChecksummed(cells(prePayload), k,
      version = 1, corrupt = true)
    val oldGoodV2 = TiKvCodec.encodeV2RawChecksummed(cells(prePayload), k,
      version = 2)
    val verdicts = RawKvMounter.verifyInRowChecksums(
      rawDf(Seq(
        (k, cur, oldBadV0, "put", 1L, 10L),
        (k, cur, oldBadV1, "put", 1L, 20L),
        (k, cur, oldGoodV2, "put", 1L, 30L))), meta)
      .collect()
      .map(r => (r.getLong(0), r.getString(7), r.getBoolean(4), r.getBoolean(5)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(verdicts == Seq(
      (10L, "current", true, true),
      (10L, "previous", true, false), // v0 pre-row mismatch: warn-SKIP
      (20L, "current", true, true),
      (20L, "previous", false, true), // v1 raw: strict, FAILS
      (30L, "current", true, true),
      (30L, "previous", true, true)), // v2 raw correct
      s"got $verdicts")
  }

  test("checksum versions 1/2 (raw-bytes scheme) are VERIFIED at mount; " +
      "only unknown versions skip (checksum.go:46,66-68)") {
    val payload = Seq(5L, "eve", 2.5, "x", 7L)
    val noCks = RawKvMounter.encodeImage(meta, payload)
    val cells = TiKvCodec.decodeV2(noCks).notNull.map { case (id, c) => (id, Some(c)) }
    val k = key(5L)
    val v1Good = TiKvCodec.encodeV2RawChecksummed(cells, k, version = 1)
    val v2Good = TiKvCodec.encodeV2RawChecksummed(cells, k, version = 2)
    val v1Bad = TiKvCodec.encodeV2RawChecksummed(cells, k, version = 1,
      corrupt = true)
    val unknown = TiKvCodec.encodeV2Checksummed(cells, first = 424242L, version = 5)
    val colCks = RawKvMounter.encodeImageChecksummed(meta, payload) // version 0
    val verdictDf = RawKvMounter.verifyInRowChecksums(
      rawDf(Seq(
        (k, v1Good, null, "put", 1L, 10L),
        (k, v2Good, null, "put", 1L, 20L),
        (k, v1Bad, null, "put", 1L, 30L),
        (k, unknown, null, "put", 1L, 40L),
        (k, colCks, null, "put", 1L, 50L))), meta)
    val verdicts = verdictDf
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getBoolean(4), r.getBoolean(5),
        if (r.isNullAt(6)) -1 else r.getInt(6)))
    assert(verdicts.toSeq == Seq(
      (10L, true, true, 1),   // v1 correct: verified, ok
      (20L, true, true, 2),   // v2 correct: verified, ok
      (30L, false, true, 1),  // v1 tampered: verified, MISMATCH
      (40L, false, false, 5), // unknown version: skipped, not-ok
      (50L, true, true, 0)),  // v0 column path unchanged
      s"got ${verdicts.toSeq}")
    val cov = RawKvMounter.checksumCoverage(verdictDf).collect().head
    assert(cov.getAs[Long]("n_verified") == 4L &&
      cov.getAs[Long]("n_skipped_versioned") == 1L &&
      cov.getAs[Long]("n_mismatch") == 1L &&
      !cov.getAs[Boolean]("all_skipped_versioned"))
    // all-skipped warning now fires only on an all-UNKNOWN upstream
    val onlyUnknown = RawKvMounter.checksumCoverage(
      RawKvMounter.verifyInRowChecksums(
        rawDf(Seq((k, unknown, null, "put", 1L, 10L))), meta)).collect().head
    assert(onlyUnknown.getAs[Boolean]("all_skipped_versioned"))
    // an all-v1/v2 upstream no longer warns: those ARE verified
    val onlyRaw = RawKvMounter.checksumCoverage(
      RawKvMounter.verifyInRowChecksums(
        rawDf(Seq(
          (k, v1Good, null, "put", 1L, 10L),
          (k, v2Good, null, "put", 1L, 20L))), meta)).collect().head
    assert(!onlyRaw.getAs[Boolean]("all_skipped_versioned") &&
      onlyRaw.getAs[Long]("n_verified") == 2L)
  }
}
