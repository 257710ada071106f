package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Prewrite/commit transaction matcher (SURVEY §2.1; reference
  * logservice/logpuller/txn_matcher.go:45-188 `matcher`, driven by
  * region_event_handler.go:263-360 `handleEventEntries`).
  *
  * A genuinely raw TiKV change stream interleaves two-phase-commit
  * events: a PREWRITE carries the row bytes keyed by (key, startTs); a
  * later COMMIT carries the commitTs but NO value; a ROLLBACK aborts
  * the txn. Regions may also ship pre-paired COMMITTED entries (the
  * incremental scan output). The matcher pairs them into committed
  * RawKVEntries, with the reference's exact edge semantics:
  *
  *  - fake prewrites: txn heartbeats emit a prewrite with EMPTY value
  *    (old-value on or off) — it must never overwrite a cached real
  *    prewrite (txn_matcher.go:59-85 putPrewriteRow);
  *  - pipelined DML: a txn may re-prewrite the same (key, startTs)
  *    with increasing `generation`; the LATEST generation wins
  *    (txn_matcher.go:74-77);
  *  - rollback: deletes the cached prewrite; the txn never emits
  *    (txn_matcher.go:141-144);
  *  - orphan prewrite: a prewrite whose commit/rollback never arrives
  *    emits nothing (resolved-lock resolution happens upstream; the
  *    cache is GC'd, txn_matcher.go:163-172);
  *  - commit-before-prewrite: commits arriving before the region
  *    initializes are cached and matched once the prewrite lands
  *    (region_event_handler.go cacheCommitRow/matchCachedRow).
  *
  * Spark-first: the BATCH form is one equi-join — prewrites aggregate
  * per (key, startTs) with a max_by priority (non-empty value, then
  * generation: exactly putPrewriteRow's keep rule), commits inner-join
  * them, rollbacks anti-join — all shuffle-partitioned on the txn
  * identity, no driver state, linear at any scale. The STREAMING form
  * is `flatMapGroupsWithState` keyed on (key, startTs): the state
  * store plays the reference's per-region `unmatchedValue` cache with
  * a processing-time GC timeout (tryCleanUnmatchedValue's
  * clearCacheDelay), and commit-before-prewrite falls out of state
  * buffering for free.
  */
object TxnMatcher {

  /** Entry kinds of the uncommitted stream (cdcpb.Event_LogType). */
  final val Prewrite = "prewrite"
  final val Commit = "commit"
  final val Rollback = "rollback"
  final val Committed = "committed"

  /** Uncommitted RawKVEntry frame: the committed shape plus the 2PC
    * entry type and the pipelined-DML generation. */
  val uncommittedSchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = false),
    StructField("value", BinaryType),
    StructField("old_value", BinaryType),
    StructField("op_type", StringType, nullable = false),
    StructField("entry_type", StringType, nullable = false),
    StructField("start_ts", LongType, nullable = false),
    StructField("commit_ts", LongType, nullable = false),
    StructField("generation", LongType, nullable = false)))

  /** Committed output shape = the mounter's input (RawKVEntry,
    * pkg/common/kv_entry.go:53-70). */
  val committedSchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = false),
    StructField("value", BinaryType),
    StructField("old_value", BinaryType),
    StructField("op_type", StringType, nullable = false),
    StructField("start_ts", LongType, nullable = false),
    StructField("commit_ts", LongType, nullable = false)))

  /** Batch matcher: pair prewrites with commits, drop rolled-back and
    * orphan txns, pass pre-paired COMMITTED entries through. One
    * shuffle on the txn identity (key, start_ts); row order within
    * the input is irrelevant, exactly like the reference's per-region
    * cache after initialization. */
  def matchCommitted(raw: DataFrame): DataFrame = {
    // A pre-paired COMMITTED scan entry IS its own prewrite+commit:
    // expand it into both halves and run ONE matching pipeline. The
    // cross-form dedup (the same txn redelivered as a scan entry AND
    // as a stream pair) then falls out of the per-txn aggregation the
    // pipeline already does — no post-union distinct, no extra
    // shuffle. The committed bytes equal the winning prewrite's by
    // the 2PC contract, so whichever form the max_by keeps, the
    // output row is identical.
    val asIs = struct(
      col("key"), col("value"), col("old_value"), col("op_type"),
      col("entry_type"), col("start_ts"), col("commit_ts"), col("generation"))
    val preHalf = struct(
      col("key"), col("value"), col("old_value"), col("op_type"),
      lit(Prewrite).as("entry_type"), col("start_ts"),
      lit(0L).as("commit_ts"), col("generation"))
    val commitHalf = struct(
      col("key"), lit(null).cast(BinaryType).as("value"),
      lit(null).cast(BinaryType).as("old_value"), col("op_type"),
      lit(Commit).as("entry_type"), col("start_ts"), col("commit_ts"),
      col("generation"))
    val expanded = raw
      .withColumn("__x",
        when(col("entry_type") === Committed, array(preHalf, commitHalf))
          .otherwise(array(asIs)))
      .select(explode(col("__x")).as("__e"))
      .select(col("__e.*"))
    matchExpanded(expanded)
  }

  private def matchExpanded(raw: DataFrame): DataFrame = {
    // Every matching decision is per txn identity (key, start_ts), so
    // ONE map-side-combined aggregation carries all three facts at
    // once — the winning prewrite, the deduped commit, the rollback
    // flag — where the previous plan ran three scans of the (expensive
    // to recompute) raw subtree, three exchanges and two joins. The
    // filters below reproduce the join semantics exactly: inner join
    // on the prewrite ⇒ p non-null; inner join on the commit ⇒ c
    // non-null; anti-join on rollbacks ⇒ rollback count 0.
    val isPre = col("entry_type") === Prewrite
    val isCommit = col("entry_type") === Commit
    // putPrewriteRow's keep rule as a max_by priority: a real (non-
    // empty) value beats a fake heartbeat's empty one; among real
    // prewrites the highest pipelined-DML generation wins. max_by /
    // min_by skip null orderings, so each picks only from its own
    // entry class.
    val prePriority = when(isPre, struct(
      when(col("value").isNotNull && length(col("value")) > 0, 1).otherwise(0)
        .as("real"),
      col("generation").as("gen")))
    raw.groupBy(col("key"), col("start_ts"))
      .agg(
        max_by(struct(col("value"), col("old_value"), col("op_type")),
          prePriority).as("p"),
        // one commit per txn per key is the 2PC contract — min_by
        // absorbs at-least-once redelivery (a region merge/split or
        // stream reconnect re-scans from the last resolved ts and
        // re-delivers entries; redelivered commits are identical, so
        // the pick is the same row the former dropDuplicates kept)
        min_by(when(isCommit, struct(col("commit_ts"), col("op_type"))),
          when(isCommit, col("commit_ts"))).as("c"),
        max(when(col("entry_type") === Rollback, 1).otherwise(0)).as("__rb"))
      .filter(col("p").isNotNull && col("c").isNotNull && col("__rb") === 0)
      .select(col("key"), col("p.value").as("value"),
        col("p.old_value").as("old_value"), col("c.op_type").as("op_type"),
        col("start_ts"), col("c.commit_ts").as("commit_ts"))
  }

  /** Per-region resolved-ts bound over the uncommitted 2PC stream —
    * the lock-resolution observability of the reference's
    * resolve_lock scenario (tests/integration_tests/resolve_lock;
    * TiKV's resolved-ts rule: a region's resolved ts may never pass a
    * pending lock, so resolved = min(lock.startTs) - 1 while locks
    * are pending and advances to the scan high-water `cap` once they
    * resolve by commit OR rollback). A prewrite with no second phase
    * IS a lock — exactly the state a crashed client leaves behind,
    * and the reason the reference test forces lock resolution before
    * the changefeed can advance.
    *
    * Regions are contiguous int-handle ranges of `regionSize` rows —
    * the TiKV region model. The handle decodes from the record key
    * with NATIVE expressions (memcomparable = sign-flipped big-endian
    * at bytes 12-19: conv ∘ substring ∘ hex), so the whole operator
    * is two map-side-combined aggregations — txn-identity then
    * region — with zero joins and zero UDFs: linear at any scale,
    * second shuffle region-count-sized. */
  def resolvedTsBound(raw: DataFrame, regionSize: Long, cap: Long): DataFrame = {
    val handle = (conv(substring(hex(col("key")), 23, 16), 16, 10)
      .cast(DecimalType(20, 0)) -
      lit(new java.math.BigDecimal("9223372036854775808")))
      .cast(LongType)
    val txn = raw
      .withColumn("_handle", handle)
      .groupBy(expr(s"_handle div $regionSize").as("region_id"),
        col("key"), col("start_ts"))
      .agg(
        max(when(col("entry_type") === Prewrite, 1).otherwise(0)).as("_pre"),
        max(when(col("entry_type") === Commit ||
          col("entry_type") === Rollback, 1).otherwise(0)).as("_phase2"))
    val pending = col("_pre") === 1 && col("_phase2") === 0
    txn.groupBy(col("region_id"))
      .agg(
        sum(when(pending, 1L).otherwise(0L)).as("n_locks"),
        min(when(pending, col("start_ts"))).as("min_lock_start_ts"))
      .select(col("region_id"), col("n_locks"), col("min_lock_start_ts"),
        when(col("n_locks") > 0,
          least(lit(cap), col("min_lock_start_ts") - 1L))
          .otherwise(lit(cap)).as("resolved_ts"))
  }

  // ---- streaming form ----

  /** Encoder-visible (codegen accesses them): one 2PC entry and the
    * per-(key, startTs) pending-txn state. */
  case class TxnEntry(key: Array[Byte], value: Array[Byte],
                      oldValue: Array[Byte], opType: String,
                      entryType: String, startTs: Long, commitTs: Long,
                      generation: Long)
  case class Pending(value: Array[Byte], oldValue: Array[Byte],
                     opType: String, generation: Long, hasPrewrite: Boolean,
                     commitTs: Long, commitOp: String, hasCommit: Boolean,
                     rolledBack: Boolean, emitted: Boolean)

  /** Streaming matcher: the per-(key, startTs) state store carries the
    * pending prewrite/commit pair across micro-batches; a matched txn
    * emits exactly once; `gcMs` evicts dangling state
    * (tryCleanUnmatchedValue's clear delay). Output rows follow
    * [[committedSchema]]. */
  def matchStream(spark: SparkSession, raw: DataFrame,
                  gcMs: Long = 5000L): DataFrame = {
    import spark.implicits._
    val entries = raw.select(
        col("key"), col("value"), col("old_value").as("oldValue"),
        col("op_type").as("opType"), col("entry_type").as("entryType"),
        col("start_ts").as("startTs"), col("commit_ts").as("commitTs"),
        col("generation"))
      .as[TxnEntry]
    val out = entries
      .groupByKey(e => (java.util.Base64.getEncoder.encodeToString(e.key), e.startTs))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (k: (String, Long), it: Iterator[TxnEntry], state: GroupState[Pending]) => {
          if (state.hasTimedOut) {
            // orphan prewrite / dangling commit: GC, emit nothing
            state.remove()
            Iterator.empty
          } else {
            var p = state.getOption.getOrElse(
              Pending(null, null, null, -1L, hasPrewrite = false,
                0L, null, hasCommit = false, rolledBack = false,
                emitted = false))
            val immediate = scala.collection.mutable.ArrayBuffer.empty[TxnEntry]
            it.foreach { e =>
              e.entryType match {
                case Prewrite =>
                  val fake = e.value == null || e.value.isEmpty
                  val keep = p.hasPrewrite &&
                    ((fake && !(p.value == null || p.value.isEmpty)) ||
                      e.generation < p.generation)
                  if (!keep)
                    p = p.copy(value = e.value, oldValue = e.oldValue,
                      opType = e.opType,
                      generation = math.max(e.generation, p.generation),
                      hasPrewrite = true)
                case Commit =>
                  p = p.copy(commitTs = e.commitTs, commitOp = e.opType,
                    hasCommit = true)
                case Rollback =>
                  p = p.copy(rolledBack = true)
                case Committed =>
                  immediate += e // pre-paired: pass straight through
              }
            }
            // A txn that already emitted (or rolled back) leaves a
            // TOMBSTONE in the state store until the GC timeout, not a
            // remove(): a region merge/split or stream reconnect
            // re-scans from the last resolved ts and RE-DELIVERS the
            // same prewrite/commit (even rollback) entries
            // (region_merge, kv_client_stream_reconnect scenarios —
            // the reference's per-region cache keeps matched state
            // until tryCleanUnmatchedValue's clear delay), so matched
            // output stays exactly-once under at-least-once delivery.
            // same group = same txn: redelivered COMMITTED duplicates
            // within one batch collapse to a single passthrough row
            val passthrough = immediate.iterator
              .filter(_ => !p.emitted).take(1)
              .map(e => Row(e.key, e.value, e.oldValue, e.opType,
                e.startTs, e.commitTs))
            val emitCommitted = immediate.nonEmpty && !p.emitted
            if (p.emitted) {
              state.update(p)
              state.setTimeoutDuration(gcMs)
              Iterator.empty
            } else if (p.rolledBack) {
              state.update(p.copy(emitted = true))
              state.setTimeoutDuration(gcMs)
              passthrough
            } else if (p.hasPrewrite && p.hasCommit) {
              val key = java.util.Base64.getDecoder.decode(k._1)
              state.update(p.copy(emitted = true))
              state.setTimeoutDuration(gcMs)
              // cross-form dedup: if a pre-paired COMMITTED entry for
              // this txn landed in the SAME batch, the passthrough
              // already carries the bytes — suppress the matched emit
              // (one txn identity, one output row)
              if (emitCommitted) passthrough
              else passthrough ++ Iterator.single(
                Row(key, p.value, p.oldValue, p.commitOp, k._2, p.commitTs))
            } else {
              state.update(if (emitCommitted) p.copy(emitted = true) else p)
              state.setTimeoutDuration(gcMs)
              passthrough
            }
          }
        })(Encoders.product[Pending], Encoders.row(committedSchema))
    out
  }
}
