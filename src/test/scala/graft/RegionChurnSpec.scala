package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.TxnMatcher

/** Region churn and reconnect semantics: a region merge/split or a
  * broken TiKV stream makes the puller resubscribe and RE-SCAN from
  * the last resolved ts, so the same 2PC entries arrive AGAIN
  * (at-least-once delivery — tests/integration_tests/region_merge,
  * kv_client_stream_reconnect, random_drop_message). The matcher must
  * keep its output exactly-once through that: batch matching dedups
  * the commit/committed frames, the streaming state store leaves a
  * tombstone (the reference's per-region cache + clear-delay,
  * logservice/logpuller/txn_matcher.go tryCleanUnmatchedValue) so a
  * redelivered pair — or a redelivered rollback — cannot re-emit or
  * revive a txn. The resolved-ts bound must also be merge-consistent:
  * the merged region's bound is the min of its constituents'. */
class RegionChurnSpec extends SparkFunSuite {

  private def mkRaw(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), TxnMatcher.uncommittedSchema)

  private def canon(df: DataFrame): Seq[String] =
    df.select(
        base64(col("key")), base64(col("value")), base64(col("old_value")),
        col("op_type"), col("start_ts"), col("commit_ts"))
      .collect().map(_.mkString("|")).sorted.toSeq

  private val img = Array[Byte](9)

  /** Three txns: one matched pair, one rolled back, one pre-paired
    * committed scan entry. */
  private def baseEntries: Seq[Row] = Seq(
    Row(Array[Byte](1), img, null, "put", "prewrite", 10L, 0L, 0L),
    Row(Array[Byte](1), null, null, "put", "commit", 10L, 20L, 0L),
    Row(Array[Byte](2), img, null, "put", "prewrite", 11L, 0L, 0L),
    Row(Array[Byte](2), null, null, "put", "rollback", 11L, 0L, 0L),
    Row(Array[Byte](3), img, null, "delete", "committed", 12L, 22L, 0L))

  test("batch matcher is exactly-once under full redelivery (merge rescan)") {
    val once = TxnMatcher.matchCommitted(mkRaw(baseEntries))
    // the resubscribe re-scan delivers every entry a second time
    val twice = TxnMatcher.matchCommitted(mkRaw(baseEntries ++ baseEntries))
    assert(canon(once).nonEmpty && canon(twice) == canon(once))
    // partial redelivery (only the suffix re-scans) too
    val partial = TxnMatcher.matchCommitted(
      mkRaw(baseEntries ++ baseEntries.drop(2)))
    assert(canon(partial) == canon(once))
  }

  test("streaming matcher: redelivered pair and redelivered rollback stay dead " +
      "across micro-batches") {
    val base = Files.createTempDirectory("graft-churn").toString
    val in = s"$base/in"
    // batch 1: the full entry set; batch 2: the re-scan redelivers it
    // all, plus one genuinely new txn — one file per micro-batch
    mkRaw(baseEntries).repartition(1)
      .write.parquet(s"$in/f=1")
    mkRaw(baseEntries ++ Seq(
        Row(Array[Byte](4), img, null, "put", "prewrite", 13L, 0L, 0L),
        Row(Array[Byte](4), null, null, "put", "commit", 13L, 23L, 0L)))
      .repartition(1).write.parquet(s"$in/f=2")
    val stream = spark.readStream
      .schema(mkRaw(baseEntries).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/f=*")
    val q = TxnMatcher.matchStream(spark, stream)
      .writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val out = spark.read.parquet(s"$base/out")
    val expected = TxnMatcher.matchCommitted(mkRaw(baseEntries ++ Seq(
      Row(Array[Byte](4), img, null, "put", "prewrite", 13L, 0L, 0L),
      Row(Array[Byte](4), null, null, "put", "commit", 13L, 23L, 0L))))
    assert(canon(out) == canon(expected),
      s"redelivery must not duplicate or revive txns: ${canon(out)}")
  }

  test("cross-form redelivery: a txn arriving BOTH as a COMMITTED scan " +
      "entry and as a prewrite/commit pair emits exactly once") {
    // straddles the scan/stream boundary: the incremental scan already
    // delivered the txn pre-paired, then the resubscribed stream
    // replays its prewrite+commit (same key, start_ts, bytes)
    val both = Seq(
      Row(Array[Byte](7), img, null, "put", "committed", 15L, 25L, 0L),
      Row(Array[Byte](7), img, null, "put", "prewrite", 15L, 0L, 0L),
      Row(Array[Byte](7), null, null, "put", "commit", 15L, 25L, 0L))
    // batch form: union of matched + passthrough dedups on txn identity
    val batch = TxnMatcher.matchCommitted(mkRaw(both))
    assert(batch.count() == 1L, canon(batch).mkString(";"))
    // streaming, all three in ONE micro-batch: passthrough wins, the
    // matched emit is suppressed
    val base = Files.createTempDirectory("graft-churn-xform").toString
    mkRaw(both).repartition(1).write.parquet(s"$base/one/f=1")
    // duplicate COMMITTED redelivery within the same batch collapses too
    mkRaw(Seq(
        Row(Array[Byte](8), img, null, "delete", "committed", 16L, 26L, 0L),
        Row(Array[Byte](8), img, null, "delete", "committed", 16L, 26L, 0L)))
      .repartition(1).write.parquet(s"$base/one/f=2")
    val stream = spark.readStream
      .schema(mkRaw(both).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/one/f=*")
    val q = TxnMatcher.matchStream(spark, stream)
      .writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 2L, canon(out).mkString(";"))
    assert(canon(out) == canon(TxnMatcher.matchCommitted(mkRaw(both ++ Seq(
      Row(Array[Byte](8), img, null, "delete", "committed", 16L, 26L, 0L))))))
  }

  test("resolved-ts bound is merge-consistent: merged region = min of constituents") {
    import graft.model.TiKvCodec
    def entry(handle: Long, entryType: String, startTs: Long): Row = {
      val key = TiKvCodec.encodeRecordKey(1L, TiKvCodec.IntHandle(handle))
      Row(key, img, null, "put", entryType, startTs, 0L, 0L)
    }
    val rows = Seq(
      entry(1L, "prewrite", 100L),               // region 0 (size 10): lock
      entry(12L, "prewrite", 50L),               // region 1: older lock
      entry(15L, "prewrite", 60L), entry(15L, "commit", 60L)) // resolved
    val cap = 500L
    val small = TxnMatcher.resolvedTsBound(mkRaw(rows), regionSize = 10L, cap = cap)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(small(0L) == 99L && small(1L) == 49L)
    // regions 0 and 1 merge (regionSize 20 puts handles 0-19 in one
    // region): the merged bound is the min of the constituents' —
    // resolved-ts never regresses below a surviving lock
    val merged = TxnMatcher.resolvedTsBound(mkRaw(rows), regionSize = 20L, cap = cap)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(merged(0L) == math.min(small(0L), small(1L)))
    // both locks resolve (one commits, one rolls back): the merged
    // region advances to the cap — monotone through the merge
    val resolvedRows = rows ++ Seq(
      entry(1L, "commit", 100L), entry(12L, "rollback", 50L))
    val after = TxnMatcher.resolvedTsBound(mkRaw(resolvedRows), regionSize = 20L, cap = cap)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(after(0L) == cap && after(0L) >= merged(0L))
  }
}
