package graft

import graft.model._
import graft.model.RawKvEntryCodec.RawEntry
import graft.operators.RawKvMounter
import graft.operators.RawKvMounter.{KvColumn, KvTableMeta}
import graft.sinks.{JdbcApplier, MysqlSink}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The full byte stack in one pass — the reference's pipeline shape
  * from the wire inward, every layer at byte level:
  *
  * event-header frames (header.go) carrying RawKVEntry serializations
  * (kv_entry.go) → frame unwrap → entry split: `mysql.tidb_ddl_job`
  * records parse through [[DdlJobParser]] into registry versions
  * (schema store), row records mount through the schema-VERSIONED
  * byte decoder ([[RawKvMounter.mountTableVersioned]]), resolved
  * entries carry the watermark — and the mounted envelope drives the
  * MySQL statement stream onto a real JDBC engine. A column added by
  * the mid-stream DDL default-fills rows written before it and
  * carries real values after it, exactly the mounter-conformance
  * contract.
  */
class ByteStackSpec extends SparkFunSuite {

  private val TableId = 900L

  /** TiDB allocates column IDs sequentially; the test mirrors that:
    * registry column order → ids 1..n. */
  private def kvMetaOf(schema: TableSchema): KvTableMeta =
    KvTableMeta(TableId, schema.schema, schema.table,
      schema.columns.zipWithIndex.map { case (c, i) =>
        KvColumn(i + 1L, c.name, c.dataType, default = c.default)
      },
      handleCol = schema.columns.head.name)

  test("framed bytes to SQL state: rows + DDL job + resolved through every layer") {
    // --- upstream: build the framed wire stream ---
    val createQ = "CREATE TABLE app.users (id BIGINT, name VARCHAR(32))"
    val addColQ = "ALTER TABLE app.users ADD COLUMN tier BIGINT DEFAULT 3"
    def jobJson(id: Long, tpe: Int, q: String): Array[Byte] =
      (s"""{"id":$id,"type":$tpe,"schema_id":1,"table_id":$TableId,""" +
        s""""schema_name":"app","table_name":"users","state":4,""" +
        s""""query":"${q.replace("\"", "\\\"")}",""" +
        """"binlog":{"SchemaVersion":9,"FinishedTS":0},"version":1}""").getBytes("UTF-8")

    val metaV1Cols = Seq(KvColumn(1L, "id", "bigint"), KvColumn(2L, "name", "varchar(32)"))
    def rowV1(id: Long, name: String): Array[Byte] =
      TiKvCodec.encodeV2(Seq(2L -> Some(name.getBytes("UTF-8"))))
    def rowV2(id: Long, name: String, tier: Long): Array[Byte] =
      TiKvCodec.encodeV2(Seq(
        2L -> Some(name.getBytes("UTF-8")),
        3L -> Some(TiKvCodec.intCell(tier))))
    def rowKey(id: Long) = TiKvCodec.encodeRecordKey(TableId, TiKvCodec.IntHandle(id))

    def frame(e: RawEntry): Array[Byte] =
      EventHeaderCodec.marshal(EventHeaderCodec.TypeDML, 1, RawKvEntryCodec.encode(e))
    val (jobKey1, jobVal1) = DdlJobParser.encodeJobEntry(1L, jobJson(1L, 3, createQ), 3)
    val (jobKey2, jobVal2) = DdlJobParser.encodeJobEntry(2L, jobJson(2L, 5, addColQ), 5)
    val frames: Seq[Array[Byte]] = Seq(
      frame(RawEntry(1, 50L, 49L, 5L, jobKey1, jobVal1, null)), // CREATE at 50
      frame(RawEntry(1, 100L, 99L, 5L, rowKey(1L), rowV1(1L, "ada"), null)),
      frame(RawEntry(1, 110L, 109L, 5L, rowKey(2L), rowV1(2L, "bob"), null)),
      frame(RawEntry(1, 150L, 149L, 5L, jobKey2, jobVal2, null)), // ADD COLUMN at 150
      frame(RawEntry(1, 200L, 199L, 5L, rowKey(3L), rowV2(3L, "eve", 7L), null)),
      frame(RawEntry(1, 210L, 209L, 5L,
        rowKey(1L), rowV2(1L, "ada2", 9L), rowV1(1L, "ada"))),
      frame(RawEntry(2, 220L, 219L, 5L, rowKey(2L), null, rowV1(2L, "bob"))), // delete
      frame(RawEntry(3, 230L, 0L, 5L, null, null, null))) // resolved

    // --- unwrap the frames and split the entry stream ---
    val entries = frames.map { f =>
      val (t, v, payload) = EventHeaderCodec.unmarshal(f)
      assert(t == EventHeaderCodec.TypeDML && v == 1)
      RawKvEntryCodec.decode(payload)
    }
    val resolved = entries.filter(_.isResolved)
    assert(resolved.map(_.crts).max == 230L, "watermark rides the entry stream")

    // DDL-job entries → registry versions (the schema-store fold)
    val actions = entries.filterNot(_.isResolved).flatMap { e =>
      DdlJobParser.parseRawEntry(e.key, e.value, e.opTypeName, e.startTs, e.crts)
        .flatMap(DdlJobParser.toAction)
    }
    assert(actions.size == 2)
    val registry = SchemaRegistry().applyAll(actions)
    val v1 = registry.asOf("app", "users", 100L).getOrElse(fail("v1 missing"))
    val v2 = registry.asOf("app", "users", 200L).getOrElse(fail("v2 missing"))
    assert(v1.columns.map(_.name) == Seq("id", "name"))
    assert(v2.columns.map(_.name) == Seq("id", "name", "tier"))
    assert(v2.columns.last.default.contains("3"))

    // row entries → versioned byte mount under the registry's versions
    val rowEntries = entries.filter(e => !e.isResolved &&
      TiKvCodec.decodeRecordKey(e.key)._1 == TableId)
    val rawSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("old_value", BinaryType), StructField("op_type", StringType),
      StructField("start_ts", LongType), StructField("commit_ts", LongType)))
    val rawDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rowEntries.map(e => Row(
        e.key,
        if (e.value.isEmpty) null else e.value,
        if (e.oldValue.isEmpty) null else e.oldValue,
        e.opTypeName, e.startTs, e.crts)), 2),
      rawSchema)
    val env = RawKvMounter.mountTableVersioned(rawDf,
      Seq(v1.versionTs -> kvMetaOf(v1), v2.versionTs -> kvMetaOf(v2)))

    val rows = env.collect().sortBy(_.getLong(3))
    assert(rows.map(_.getString(2)).toSeq == Seq("I", "I", "I", "U", "D"))
    // pre-DDL rows conform to the latest shape with the default filled
    val ada = rows(0).getStruct(6)
    assert(ada.getString(1) == "ada" && ada.getLong(2) == 3L,
      "pre-DDL row must default-fill the added column")
    // post-DDL rows carry their real values
    assert(rows(2).getStruct(6).getLong(2) == 7L)
    // the update's pre-image decoded under v1 bytes, conformed to v2
    assert(rows(3).getStruct(5).getString(1) == "ada" &&
      rows(3).getStruct(5).getLong(2) == 3L)

    // --- the mounted envelope drives a real SQL engine ---
    val a = JdbcApplier.inMemory("bytestack")
    a.createTable("app", "users",
      Seq("id" -> "BIGINT", "name" -> "VARCHAR(32)", "tier" -> "BIGINT"),
      Seq("id"))
    MysqlSink.applyBatch(
      env.withColumn("_row_id", coalesce(col("after.id"), col("before.id"))),
      Seq("id"), numWorkers = 2, safeMode = true)(JdbcApplier.executeFor(a.url))
    val state = a.tableRows("app", "users", Seq("id", "name", "tier"))
    assert(state == Seq(
      Seq[Any](1L, "ada2", 9L),
      Seq[Any](3L, "eve", 7L)),
      s"final engine state diverged: $state")
  }

  test("EXCHANGE PARTITION at byte level: the swapped-in physical id mounts " +
      "from the exchange ts on, the swapped-out one stops (physical/logical " +
      "id swap, persist_storage_ddl_handlers.go:382; row_change.go:29-38)") {
    // logical table t = 900 with partitions 901/902; standalone s = 903.
    // EXCHANGE PARTITION at ts 100 swaps 901 <-> 903: t's span set
    // becomes {903, 902} — rows under 903 belong to t from 100 on,
    // rows under 901 stop belonging (they are the standalone's now).
    val cols = Seq(KvColumn(1L, "id", "bigint"), KvColumn(2L, "v", "bigint"))
    val tV1 = KvTableMeta(900L, "app", "t", cols, handleCol = "id",
      physicalIds = Seq(901L, 902L))
    val tV2 = tV1.copy(physicalIds = Seq(903L, 902L))
    val exchangeTs = 100L

    def put(pid: Long, id: Long, v: Long, ts: Long): Row = Row(
      TiKvCodec.encodeRecordKey(pid, TiKvCodec.IntHandle(id)),
      TiKvCodec.encodeV2(Seq(2L -> Some(TiKvCodec.intCell(v)))),
      null, "put", ts - 1L, ts)
    val rawSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("old_value", BinaryType), StructField("op_type", StringType),
      StructField("start_ts", LongType), StructField("commit_ts", LongType)))
    val raw = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      put(901L, 1L, 10L, 50L),   // pre-exchange, partition p1: in t
      put(902L, 2L, 20L, 60L),   // pre-exchange, partition p2: in t
      put(903L, 3L, 30L, 70L),   // pre-exchange, standalone: NOT in t
      put(901L, 4L, 40L, 150L),  // post-exchange, swapped OUT: not in t
      put(902L, 5L, 50L, 160L),  // post-exchange, untouched partition: in t
      put(903L, 6L, 60L, 170L)), // post-exchange, swapped IN: in t
      2), rawSchema)
    val mounted = RawKvMounter.mountTableVersioned(raw,
      Seq(0L -> tV1, exchangeTs -> tV2))
      .select(col("_commit_ts"), col("after.id"), col("after.v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // the typed stream: exactly the rows whose physical id belonged to
    // t at their commit ts
    assert(mounted == Seq((50L, 1L, 10L), (60L, 2L, 20L),
      (160L, 5L, 50L), (170L, 6L, 60L)),
      s"exchange-partition membership diverged: $mounted")

    // the registry drives the same swap logically: both sides' column
    // shapes cross over at the exchange ts
    import graft.model.DdlAction._
    val reg = SchemaRegistry().applyAll(Seq(
      CreateTable("app", "t", Seq(ColumnDef("id", "bigint"),
        ColumnDef("v", "bigint")), 1L),
      CreateTable("app", "s", Seq(ColumnDef("id", "bigint"),
        ColumnDef("v", "bigint"), ColumnDef("extra", "bigint")), 1L),
      ExchangeTablePartition("app", "t", "app", "s", exchangeTs)))
    assert(reg.asOf("app", "t", 99L).get.columns.map(_.name) == Seq("id", "v"))
    assert(reg.asOf("app", "t", 101L).get.columns.map(_.name) ==
      Seq("id", "v", "extra"))
  }

  private def rawOf(rows: Seq[Row]) = {
    val rawSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("old_value", BinaryType), StructField("op_type", StringType),
      StructField("start_ts", LongType), StructField("commit_ts", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), rawSchema)
  }

  private def putRow(pid: Long, id: Long, v: Long, ts: Long): Row = Row(
    TiKvCodec.encodeRecordKey(pid, TiKvCodec.IntHandle(id)),
    TiKvCodec.encodeV2(Seq(2L -> Some(TiKvCodec.intCell(v)))),
    null, "put", ts - 1L, ts)

  test("REORGANIZE PARTITION at byte level: rows under the new physical id " +
      "mount from the DDL ts on, replaced-id rows before it still mount " +
      "(job fold -> physicalPlan -> one-pass mount; handler :418)") {
    def jobRaw(jid: Long, tpe: Int, q: String, ts: Long,
               parts: Seq[Long]): Row = {
      val meta = (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":900,""" +
        s""""schema_name":"app","table_name":"t","state":4,""" +
        s""""query":"${q.replace("\"", "\\\"")}",""" +
        s""""binlog":{"SchemaVersion":$ts,"TableInfo":{"id":900,""" +
        s""""partition":{"definitions":[""" +
        parts.map(p => s"""{"id":$p}""").mkString(",") +
        """]}}},"version":1}""").getBytes("UTF-8")
      val (k, v) = DdlJobParser.encodeJobEntry(jid, meta, tpe)
      Row(k, v, null, "put", ts - 1L, ts)
    }
    val entries = Seq(
      jobRaw(1L, 3, "CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L,
        Seq(901L, 902L)),
      jobRaw(2L, 64,
        "ALTER TABLE app.t REORGANIZE PARTITION p0 INTO (PARTITION p3 VALUES LESS THAN (9))",
        100L, Seq(903L, 902L)))
    // the DDL jobs arrive on the SAME raw wire as the rows
    val jobs = entries.flatMap { r =>
      DdlJobParser.parseRawEntry(r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1),
        r.getString(3), r.getLong(4), r.getLong(5))
    }
    val store = SchemaStore().applyJobs(jobs)
    val unknown = spark.sparkContext.longAccumulator("unknown")
    val oow = spark.sparkContext.longAccumulator("oow")
    val raw = rawOf(entries ++ Seq(
      putRow(901L, 1L, 10L, 50L),  // old partition, pre-reorg: mounts
      putRow(902L, 2L, 20L, 60L),  // untouched partition: mounts
      putRow(903L, 3L, 30L, 70L),  // new id BEFORE the reorg: not yet a member
      putRow(901L, 4L, 40L, 150L), // replaced id after reorg: stops
      putRow(903L, 5L, 50L, 160L), // new id after reorg: mounts
      putRow(777L, 6L, 60L, 170L))) // never-known id: counted, dropped
    val mounted = RawKvMounter.mountTablesPlan(raw, store.physicalPlan(),
      unknownIds = Some(unknown), outOfWindow = Some(oow))
      .select(col("_commit_ts"), col("after.id"), col("after.v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(mounted == Seq((50L, 1L, 10L), (60L, 2L, 20L), (160L, 5L, 50L)),
      s"reorganize membership diverged: $mounted")
    // the unknown-id observable is LOUD about silent drops
    assert(unknown.value == 1L, s"unknown-id count: ${unknown.value}")
    assert(oow.value == 2L,
      s"out-of-window = pre-claim 903 + post-release 901: ${oow.value}")
  }

  test("DROP then RECOVER TABLE at byte level: rows in the dropped window " +
      "drop (counted), rows after the recover ts mount again with the " +
      "pre-drop shape (handler :337; multi_version.go:209)") {
    def jobRaw(jid: Long, tpe: Int, q: String, ts: Long): Row = {
      val meta = (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":900,""" +
        s""""schema_name":"app","table_name":"t","state":4,""" +
        s""""query":"${q.replace("\"", "\\\"")}",""" +
        s""""binlog":{"SchemaVersion":$ts,"TableInfo":{"id":900}},"version":1}""")
        .getBytes("UTF-8")
      val (k, v) = DdlJobParser.encodeJobEntry(jid, meta, tpe)
      Row(k, v, null, "put", ts - 1L, ts)
    }
    val jobs = Seq(
      jobRaw(1L, 3, "CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L),
      jobRaw(2L, 4, "DROP TABLE app.t", 100L),
      jobRaw(3L, 25, "RECOVER TABLE app.t", 200L)).flatMap { r =>
      DdlJobParser.parseRawEntry(r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1),
        r.getString(3), r.getLong(4), r.getLong(5))
    }
    val store = SchemaStore().applyJobs(jobs)
    val oow = spark.sparkContext.longAccumulator("oow")
    val raw = rawOf(Seq(
      putRow(900L, 1L, 10L, 50L),   // alive: mounts
      putRow(900L, 2L, 20L, 150L),  // dropped window: drops, counted
      putRow(900L, 3L, 30L, 250L))) // recovered: mounts with pre-drop shape
    val mounted = RawKvMounter.mountTablesPlan(raw, store.physicalPlan(),
      outOfWindow = Some(oow))
      .select(col("_commit_ts"), col("after.id"), col("after.v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(mounted == Seq((50L, 1L, 10L), (250L, 3L, 30L)),
      s"drop/recover window diverged: $mounted")
    assert(oow.value == 1L, "the dropped-window row is counted, not silent")
  }
}
