package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.ChangelogGen
import graft.streaming.TxnMatcher

/** Prewrite/commit matching over a genuinely raw 2PC-interleaved
  * stream (reference logservice/logpuller/txn_matcher.go +
  * region_event_handler.go handleEventEntries): matched output must
  * equal the committed-mode stream minus rolled-back/orphan txns, in
  * both the batch-join and the cross-batch streaming-state forms. */
class TxnMatcherSpec extends SparkFunSuite {

  private def mkRaw(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), TxnMatcher.uncommittedSchema)

  private val key1 = Array[Byte](1, 2, 3)
  private def canon(df: DataFrame): Seq[String] =
    df.select(
        base64(col("key")), base64(col("value")), base64(col("old_value")),
        col("op_type"), col("start_ts"), col("commit_ts"))
      .collect().map(_.mkString("|")).sorted.toSeq

  test("fake heartbeat prewrite (empty value) never clobbers the real bytes") {
    val real = Array[Byte](9, 9, 9)
    val out = TxnMatcher.matchCommitted(mkRaw(Seq(
      Row(key1, real, null, "put", "prewrite", 10L, 0L, 0L),
      Row(key1, Array.emptyByteArray, null, "put", "prewrite", 10L, 0L, 0L),
      Row(key1, null, null, "put", "commit", 10L, 20L, 0L)))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Array[Byte]]("value").toSeq == real.toSeq)
    assert(out.head.getAs[Long]("commit_ts") == 20L)
  }

  test("pipelined DML: the highest generation wins regardless of arrival order") {
    val gen1 = Array[Byte](1)
    val gen2 = Array[Byte](2)
    val out = TxnMatcher.matchCommitted(mkRaw(Seq(
      Row(key1, gen2, null, "put", "prewrite", 10L, 0L, 2L),
      Row(key1, gen1, null, "put", "prewrite", 10L, 0L, 1L),
      Row(key1, null, null, "put", "commit", 10L, 20L, 0L)))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Array[Byte]]("value").toSeq == gen2.toSeq)
  }

  test("rollback kills the txn; orphan prewrite emits nothing; COMMITTED passes through") {
    val k2 = Array[Byte](4, 5)
    val k3 = Array[Byte](6)
    val img = Array[Byte](7)
    val out = TxnMatcher.matchCommitted(mkRaw(Seq(
      // rolled back: prewrite + rollback (+ a late commit that must not revive it)
      Row(key1, img, null, "put", "prewrite", 10L, 0L, 0L),
      Row(key1, null, null, "put", "rollback", 10L, 0L, 0L),
      Row(key1, null, null, "put", "commit", 10L, 20L, 0L),
      // orphan: prewrite only
      Row(k2, img, null, "put", "prewrite", 11L, 0L, 0L),
      // pre-paired committed entry from the incremental scan
      Row(k3, img, null, "delete", "committed", 12L, 22L, 0L))))
    assert(canon(out) == canon(mkRaw(Seq(
      Row(k3, img, null, "delete", "committed", 12L, 22L, 0L)))
      .select("key", "value", "old_value", "op_type", "start_ts", "commit_ts")))
  }

  // ---- generator equivalence: matched uncommitted ≡ committed-class subset ----

  private def drain(df: DataFrame, dir: String): DataFrame = {
    val q = df.writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    spark.read.parquet(s"$dir/out")
  }

  private def readGen(total: Long, extra: (String, String)*) = {
    var r = spark.readStream.format("graft.sources.ChangelogGenSource")
      .option("tables", 4).option("totalRows", total)
      .option("rowsPerBatch", 1000).option("numPartitions", 4)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  /** Committed-mode stream filtered to the events whose txn commits. */
  private def committedSubset(dir: String): DataFrame = {
    val all = drain(readGen(4000, "rawKv" -> "true"), dir)
    val i = (col("commit_ts") - lit(ChangelogGen.baseTs)) / lit(1000000L)
    all.filter(i % 23 =!= 0 && i % 31 =!= 0)
  }

  test("batch matcher over the 2PC generator reproduces the committed-mode stream") {
    val base = Files.createTempDirectory("graft-txnm-b").toString
    val expected = committedSubset(s"$base/com")
    val un = drain(readGen(8000, "rawKvUncommitted" -> "true"), s"$base/un")
    // sanity: the 2PC frame really interleaves all three entry kinds
    val kinds = un.select("entry_type").distinct().collect()
      .map(_.getString(0)).toSet
    assert(kinds == Set("prewrite", "commit", "rollback"))
    assert(canon(TxnMatcher.matchCommitted(un)) == canon(expected))
  }

  test("streaming matcher holds state across micro-batches (incl. commit-before-prewrite)") {
    val base = Files.createTempDirectory("graft-txnm-s").toString
    val expected = committedSubset(s"$base/com")
    // EntryLag puts a prewrite and its commit ~100 events apart →
    // different 1000-row micro-batches; the mod-N wrap makes the first
    // ~100 commits arrive BEFORE their prewrites (the cached-commit
    // path, region_event_handler.go cacheCommitRow)
    val matched = drain(
      TxnMatcher.matchStream(spark, readGen(8000, "rawKvUncommitted" -> "true"),
        gcMs = 600000L),
      s"$base/out")
    assert(canon(matched) == canon(expected))
  }

  test("resolved-ts bound: pending locks pin their region at min(start)-1, " +
      "resolution by commit OR rollback releases it, cap clamps (resolve_lock)") {
    import graft.model.TiKvCodec
    def rk(h: Long) = TiKvCodec.encodeRecordKey(77L, TiKvCodec.IntHandle(h))
    val raw = mkRaw(Seq(
      // region 0 (handles 0-9): h1 commits, h2 is a LOCK (crashed
      // client: no second phase), h3 rolls back — released
      Row(rk(1), Array[Byte](1), null, "put", "prewrite", 100L, 0L, 0L),
      Row(rk(1), null, null, "put", "commit", 100L, 110L, 0L),
      Row(rk(2), Array[Byte](2), null, "put", "prewrite", 50L, 0L, 0L),
      Row(rk(3), Array[Byte](3), null, "put", "prewrite", 40L, 0L, 0L),
      Row(rk(3), null, null, "put", "rollback", 40L, 0L, 0L),
      // region 1 (10-19): fully committed — advances to cap
      Row(rk(12), Array[Byte](4), null, "put", "prewrite", 80L, 0L, 0L),
      Row(rk(12), null, null, "put", "commit", 80L, 90L, 0L),
      // region 2 (20-29): two locks — the OLDEST pins the bound
      Row(rk(25), Array[Byte](5), null, "put", "prewrite", 70L, 0L, 0L),
      Row(rk(27), Array[Byte](6), null, "put", "prewrite", 60L, 0L, 0L),
      // region 3 (30-39): a lock YOUNGER than the cap — cap clamps
      Row(rk(35), Array[Byte](7), null, "put", "prewrite", 300L, 0L, 0L)))
    val out = TxnMatcher.resolvedTsBound(raw, regionSize = 10L, cap = 200L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), r.getLong(3)))).toMap
    assert(out(0L) == ((1L, Some(50L), 49L)))
    assert(out(1L) == ((0L, None, 200L)))
    assert(out(2L) == ((2L, Some(60L), 59L)))
    assert(out(3L) == ((1L, Some(300L), 200L)))
  }

  test("matcher state survives kill-restart: exactly-once matched output " +
      "(kv_client_stream_reconnect analog)") {
    val base = Files.createTempDirectory("graft-txnm-r").toString
    val expected = committedSubset(s"$base/com")
    // gcMs is GENEROUS here on purpose: this test pins state SURVIVAL
    // across a kill, and a loaded host can stall >5s between
    // micro-batches — the default clear delay would then time out
    // still-pending halves and the test would flake on lost matches
    // (orphan GC has its own test above)
    def start() = TxnMatcher
      .matchStream(spark, readGen(8000, "rawKvUncommitted" -> "true"),
        gcMs = 600000L)
      .writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    // first attempt: kill after a couple of committed micro-batches —
    // pending prewrite/commit state is mid-flight in the state store
    val q1 = start()
    val deadline = System.currentTimeMillis() + 120000
    while (q1.isActive &&
        q1.recentProgress.count(_.numInputRows > 0) < 3 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    q1.stop()
    // reconnect: the checkpoint resumes the offsets AND the per-txn
    // state; the parquet sink's _spark_metadata keeps replayed batches
    // exactly-once
    val q2 = start()
    q2.awaitTermination(180000)
    assert(canon(spark.read.parquet(s"$base/out")) == canon(expected))
  }
}
