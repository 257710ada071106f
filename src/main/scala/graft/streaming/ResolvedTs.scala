package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Watermark / resolved-ts semantics (SURVEY §2.11).
  *
  * The reference's resolved-ts contract — "no event with commitTs ≤ W
  * will arrive" (ResolvedEvent, event_store.go:71) — is exactly
  * Structured Streaming's watermark. These helpers express the
  * windowed progress aggregations on a streaming envelope.
  */
object ResolvedTs {

  /** ns commit-ts → event-time timestamp column. */
  def commitTime(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros((c.cast(DecimalType(38, 0)) / lit(1000L)).cast("long"))

  /** Streaming per-table tumbling-window progress: count + max commit
    * ts per (table, window). With watermark `delay`, state for closed
    * windows is evicted — the GC the reference does explicitly
    * (eventstore/gc.go) is engine-managed here. */
  def windowedProgress(env: DataFrame, windowLen: String, delay: String): DataFrame =
    env
      .withColumn("_commit_time", commitTime(col("_commit_ts")))
      .withWatermark("_commit_time", delay)
      .groupBy(window(col("_commit_time"), windowLen),
        col("_schema"), col("_table"))
      .agg(
        count(lit(1)).as("n_events"),
        max(col("_commit_ts")).as("resolved_ts"))
      .select(col("window.start").as("window_start"),
        col("_schema"), col("_table"), col("n_events"), col("resolved_ts"))
}
