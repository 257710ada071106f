package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
