package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.model._
import graft.streaming.{Changefeed, TxnMatcher}

/** The open-protocol BATCH wire through the streaming compositions:
  * `openBatchWire` packs many events per MQ record (encoder.go:40-224),
  * checkpoint and DDL events ride the same framing as single-event
  * records, and the consumer unwrap restores the exact per-event feed. */
class OpenBatchWireSpec extends SparkFunSuite {

  test("runMq with openBatchWire: batch records unwrap to the exact " +
      "per-event feed; the checkpoint record frames t=3 with the same " +
      "resolved ts as the plain wire") {
    val tmp = Files.createTempDirectory("graft-openbatch").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    def cfg(batch: Boolean, id: String) = ChangefeedConfig(id = id,
      filter = FilterConfig(rules = Seq("app.*")),
      handleKeys = Seq("user_id"),
      sink = SinkConfig(protocol = Protocol.Open, numPartitions = 4,
        fixtureRenderer = true, openBatchWire = batch, maxBatchSize = 7))

    Changefeed.runMq(spark, cfg(batch = true, "cf-ob"), src,
      s"$tmp/sink-b", s"$tmp/ckpt-b").awaitTermination(120000)
    Changefeed.runMq(spark, cfg(batch = false, "cf-plain"), src,
      s"$tmp/sink-p", s"$tmp/ckpt-p").awaitTermination(120000)

    val framesB = spark.read.parquet(s"$tmp/sink-b")
    // every row event rides a batch record; sizes respect the cap
    assert(framesB.filter(col("_kind") === "row").count() == 0)
    val unwrapped = MqConsume.unwrapOpenBatchFrames(framesB)
    val rowsB = unwrapped.filter(col("_kind") === "row")
    val plain = spark.read.parquet(s"$tmp/sink-p").filter(col("_kind") === "row")
    assert(rowsB.count() == plain.count())
    // identical per-event wire values (the batch framing is lossless)
    val gotVals = rowsB.select("_value").collect().map(_.getString(0)).sorted.toSeq
    val expVals = plain.select("_value").collect().map(_.getString(0)).sorted.toSeq
    assert(gotVals == expVals)
    // per-event commit ts restored from the framed keys
    val tsFromKeys = rowsB.select("_commit_ts").agg(max("_commit_ts")).head().getLong(0)
    val tsPlain = plain.agg(max("_commit_ts")).head().getLong(0)
    assert(tsFromKeys == tsPlain)
    // batch sizing: records hold >1 event on average but never exceed the cap
    val sizes = framesB.filter(col("_kind") === "batch")
      .select(col("_value")).collect().map { r =>
        val (k, v) = graft.functions.OpenBatch.parseFrame(r.getString(0))
        graft.functions.OpenBatch.unpackBatch(k, v).size
      }
    assert(sizes.forall(_ <= 7), s"batch sizes: ${sizes.toSeq}")
    assert(sizes.sum == plain.count(), "every event framed exactly once")
    assert(sizes.max == 7, "the count boundary actually binds at this volume")
    // checkpoint record: single framed event, t=3, same resolved ts as
    // the plain run's control message
    val resolvedB = unwrapped.filter(col("_kind") === "resolved")
      .select("_key", "_commit_ts").collect()
    assert(resolvedB.nonEmpty)
    assert(resolvedB.forall(_.getString(0).endsWith("\"t\":3}")))
    assert(resolvedB.map(_.getLong(1)).max == tsPlain)
    // decode parity end to end: unwrap → decodeOpen equals the plain decode
    val decB = graft.functions.Decoders.decodeOpen(
      rowsB.select("_key", "_value"))
      .select("_schema", "_table", "_commit_ts", "_op").collect()
      .map(_.toString).sorted.toSeq
    // plain frames drop the key at the transport (documented model):
    // decode the batch side only and check row identity via values
    assert(decB.size == gotVals.size)
  }

  test("evolving raw-2PC feed with openBatchWire ships the two-part open " +
      "DDL message in byte framing; the consumer unwrap + wireDdls " +
      "recovers (ts, schema, table, query)") {
    val tmp = Files.createTempDirectory("graft-openbatch-ddl").toString
    val srcDir = s"$tmp/src"
    val cfg = ChangefeedConfig(id = "cf-ob-evolve",
      filter = FilterConfig(rules = Seq("app.*")),
      handleKeys = Seq("id"),
      sink = SinkConfig(protocol = Protocol.Open, numPartitions = 2,
        openBatchWire = true, maxBatchSize = 4))

    def jobJson(jid: Long, tpe: Int, q: String, ts: Long): Array[Byte] =
      (s"""{"id":$jid,"type":$tpe,"schema_id":1,"table_id":900,""" +
        s""""schema_name":"app","table_name":"t","state":4,""" +
        s""""query":"${q.replace("\"", "\\\"")}",""" +
        s""""binlog":{"SchemaVersion":$ts,"TableInfo":{"id":900}},"version":1}""")
        .getBytes("UTF-8")
    def jobEntry(jid: Long, tpe: Int, q: String, ts: Long): Seq[Row] = {
      val (k, v) = DdlJobParser.encodeJobEntry(jid, jobJson(jid, tpe, q, ts), tpe)
      Seq(Row(k, v, null, "put", "committed", ts - 1L, ts, 0L))
    }
    def rowPair(id: Long, cells: Seq[(Long, Long)], commitTs: Long): Seq[Row] = {
      val k = TiKvCodec.encodeRecordKey(900L, TiKvCodec.IntHandle(id))
      val v = TiKvCodec.encodeV2(cells.map { case (cid, x) =>
        cid -> Some(TiKvCodec.intCell(x)) })
      Seq(
        Row(k, v, null, "put", "prewrite", commitTs - 1L, 0L, 0L),
        Row(k, null, null, "put", "commit", commitTs - 1L, commitTs, 0L))
    }
    val rows = jobEntry(1L, 3, "CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L) ++
      rowPair(1L, Seq(2L -> 10L), 50L) ++
      jobEntry(2L, 5, "ALTER TABLE app.t ADD COLUMN k BIGINT DEFAULT 7", 100L) ++
      rowPair(3L, Seq(2L -> 30L, 3L -> 33L), 150L)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), TxnMatcher.uncommittedSchema)
      .write.parquet(srcDir)

    val q = Changefeed.runMqFromRaw2pcEvolving(spark, cfg,
      spark.readStream.schema(TxnMatcher.uncommittedSchema).parquet(srcDir),
      SchemaStore(), s"$tmp/sink", s"$tmp/ckpt", matcherGcMs = 600000L)
    try q.awaitTermination(240000)
    finally { if (q.isActive) q.stop() }
    assert(q.exception.isEmpty, s"feed error: ${q.exception}")

    val frames = spark.read.parquet(s"$tmp/sink")
    val unwrapped = MqConsume.unwrapOpenBatchFrames(frames)
    // the DDL byte messages parse back with action type preserved
    val ddls = MqConsume.wireDdls(
      unwrapped.select(col("_key"), col("_value")))
    assert(ddls == Seq(
      (10L, "app", "t", "CREATE TABLE app.t (id BIGINT, v BIGINT)"),
      (100L, "app", "t", "ALTER TABLE app.t ADD COLUMN k BIGINT DEFAULT 7")),
      s"wire DDLs: $ddls")
    // rows still decode from the unwrapped frames (generic image)
    val img = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    val dec = graft.functions.Decoders.decodeOpenFor(
      MqConsume.dataMessagesOnly(
        unwrapped.filter(col("_kind") === "row")), img)
      .select(col("_commit_ts"), col("after.id"), col("after.k")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).sortBy(_._1).toSeq
    assert(dec.map(_._2) == Seq(1L, 3L))
    assert(dec.last._3 == Some(33L), s"post-DDL row carries k: $dec")
  }
}
