package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Envelope

/** Transaction assembly + progress aggregation (SURVEY §2.3/§2.9/§2.11).
  */
object TxnOps {

  /** Assemble rows into transactions: one group per
    * (schema, table, start_ts, commit_ts) — the reference's DMLEvent
    * batch identity (pkg/common/event/dml_event.go:370-430). Emits
    * txn-level stats used by batching decisions downstream. */
  def txnGroups(env: DataFrame): DataFrame =
    env.groupBy(col("_schema"), col("_table"), col("_start_ts"), col("_commit_ts"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("_op") === "I", 1L).otherwise(0L)).as("n_insert"),
        sum(when(col("_op") === "U", 1L).otherwise(0L)).as("n_update"),
        sum(when(col("_op") === "D", 1L).otherwise(0L)).as("n_delete"),
        min(col("_row_id")).as("first_row_id"))

  /** Per-table progress: min/max commit-ts + row count — the
    * table_progress aggregate (downstreamadapter/dispatcher/
    * table_progress.go). */
  def tableProgress(env: DataFrame): DataFrame =
    env.groupBy(col("_schema"), col("_table"))
      .agg(
        min(col("_commit_ts")).as("min_unflushed_ts"),
        max(col("_commit_ts")).as("resolved_ts"),
        count(lit(1)).as("n_events"))

  /** Changefeed checkpoint = min over all tables' progress
    * (maintainer heartbeat aggregation, maintainer/maintainer.go;
    * barrier.go:323). Two-level aggregation: partial per table, then
    * global — a few bytes per table cross the final exchange. */
  def checkpoint(env: DataFrame): DataFrame =
    tableProgress(env)
      .agg(
        min(col("min_unflushed_ts")).as("checkpoint_ts"),
        min(col("resolved_ts")).as("min_resolved_ts"),
        count(lit(1)).as("n_tables"))

  /** Big-txn tracking (pkg/eventservice/big_txn_metric.go): the k
    * largest transactions by row count — orderBy+limit compiles to
    * TakeOrderedAndProject (bounded per-partition heap + driver
    * merge), so the metric costs one agg pass regardless of scale. */
  def topTxns(env: DataFrame, k: Int): DataFrame =
    txnGroups(env)
      .orderBy(col("n_rows").desc, col("_schema"), col("_table"),
        col("_start_ts"), col("_commit_ts"))
      .limit(k)

  /** Scan-batch chunk assignment — the txn scan strategy of
    * pkg/eventservice/txn_scan_strategy.go:23-70.
    *
    * Atomic mode: a transaction never splits across scan batches —
    * chunk boundaries fall only at txn boundaries. Computed as the
    * txn-level running row count (exclusive) over the per-table
    * commit order, divided by `maxRows`; every row of a txn inherits
    * its txn's chunk.
    *
    * Split mode: the scan may pause mid-txn (docs/design/2026-07-22).
    * Rows chunk individually in the eventstore sort order
    * (commit, start, DMLOrder, row id — format.go:26-60), so when a
    * txn straddles a boundary its deletes land in the earlier chunk —
    * which is exactly why the reference spills the INSERT half of
    * unique-key-changing updates: compose with
    * [[Transforms.updateSplit]] and the D-before-I order falls out of
    * the DMLOrder sort key.
    *
    * Scale: the window partitions by table — the reference's scan is
    * per-dispatcher (one table span) sequential, so the per-table
    * window IS the dispatcher; spans of distinct tables chunk in
    * parallel. */
  def scanChunks(env: DataFrame, maxRows: Long, atomic: Boolean): DataFrame =
    if (atomic) {
      val sizes = env.groupBy(col("_schema"), col("_table"),
          col("_start_ts"), col("_commit_ts"))
        .agg(count(lit(1)).as("__n"))
      val w = Window.partitionBy(col("_schema"), col("_table"))
        .orderBy(col("_commit_ts"), col("_start_ts"))
      val chunked = sizes
        .withColumn("_chunk", floor((sum(col("__n")).over(w) - col("__n")) / maxRows))
        .drop("__n")
      env.join(chunked, Seq("_schema", "_table", "_start_ts", "_commit_ts"))
    } else {
      val w = Window.partitionBy(col("_schema"), col("_table"))
        .orderBy(col("_commit_ts"), col("_start_ts"),
          Envelope.opOrder(col("_op")), col("_row_id"))
      env.withColumn("_chunk", floor((row_number().over(w) - lit(1)) / maxRows))
    }

  /** Sync points (downstreamadapter/syncpoint/sync_point.go:28):
    * tumbling consistency windows over commit-ts; emits one row per
    * (table, window) with the primary/secondary ts mapping — the
    * boundary row written to the ts-map table. */
  def syncPoints(env: DataFrame, intervalNs: Long): DataFrame =
    env.groupBy(
        col("_schema"), col("_table"),
        (col("_commit_ts") - pmod(col("_commit_ts"), lit(intervalNs)))
          .as("sync_point_ts"))
      .agg(
        max(col("_commit_ts")).as("primary_ts"),
        count(lit(1)).as("n_events"))
}
