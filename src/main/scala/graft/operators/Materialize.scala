package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Envelope

/** Change-log → table-state materialization: the batch equivalent of
  * what the MySQL sink produces downstream after applying every
  * change in commit order (the differential-diff model the reference's
  * integration tests verify with sync_diff_inspector, SURVEY §5.2).
  *
  * Last-writer-wins per (table, key) in eventstore order; a final
  * DELETE removes the row. One window shuffle on (table, key) — the
  * same partitioning the sink itself uses, so at scale this shares
  * the sink's shuffle.
  */
object Materialize {

  /** Active-active (BDR) last-writer-wins state: rows replicated from
    * another cluster carry an origin-ts, local writes don't; a write
    * wins when its effective version `IFNULL(origin_ts, commit_ts)`
    * is greatest — the condition the reference's
    * `INSERT .. ON DUPLICATE KEY UPDATE col = IF(IFNULL(origin,commit)
    * <= VALUES(origin), ...)` applies per statement
    * (sql_builder.go:247-350, mysql_writer_dml_active_active.go).
    * Envelope must carry `_origin_ts` (nullable long). Ties fall back
    * to commit order + DMLOrder, matching sequential apply. */
  def tableStateLww(env: DataFrame, keyCol: String = "user_id"): DataFrame = {
    val key = when(col("_op") === "D", col(s"before.$keyCol"))
      .otherwise(col(s"after.$keyCol"))
    val effective = coalesce(col("_origin_ts"), col("_commit_ts"))
    val w = Window.partitionBy(col("_schema"), col("_table"), col("__key"))
      .orderBy(col("__eff").desc, col("_commit_ts").desc, col("_start_ts").desc,
        Envelope.opOrder(col("_op")).desc, col("_row_id").desc)
    env.withColumn("__key", key)
      .withColumn("__eff", effective)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("_op") =!= "D")
      .select(
        col("_schema"), col("_table"),
        col("after.user_id").as("user_id"),
        col("after.value").as("value"),
        col("after.k").as("k"),
        col("__eff").as("_effective_ts"))
  }

  /** Table state AS OF a past commit ts (time travel): apply only
    * changes with `_commit_ts <= ts` — the state a syncpoint
    * consistency check compares against the downstream snapshot
    * ([[graft.operators.TxnOps.syncPoints]] supplies the ts; the
    * reference's upstream/downstream snapshot alignment). The
    * predicate pushes into the scan, so historical snapshots read
    * only the covered prefix; the single window shuffle is shared
    * with [[tableState]]. */
  def snapshotAt(env: DataFrame, ts: Long, keyCol: String = "user_id"): DataFrame =
    tableState(env.filter(col("_commit_ts") <= ts), keyCol)

  /** Reduce the envelope to final rows keyed by `keyCol` from the
    * payload (post-image key; deletes key on the pre-image). */
  def tableState(env: DataFrame, keyCol: String = "user_id"): DataFrame = {
    val key = when(col("_op") === "D", col(s"before.$keyCol"))
      .otherwise(col(s"after.$keyCol"))
    val w = Window.partitionBy(col("_schema"), col("_table"), col("__key"))
      .orderBy(col("_commit_ts").desc, col("_start_ts").desc,
        Envelope.opOrder(col("_op")).desc, col("_row_id").desc)
    env.withColumn("__key", key)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("_op") =!= "D")
      .select(
        col("_schema"), col("_table"),
        col("after.user_id").as("user_id"),
        col("after.value").as("value"),
        col("after.k").as("k"),
        col("_commit_ts").as("_applied_ts"))
  }
}
