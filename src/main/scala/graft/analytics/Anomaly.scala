package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed z-score anomaly detection over the events stream — the
  * metric-outlier gate a data pipeline runs over ingest telemetry
  * (the reference's closest analog is its big-txn tracking metric,
  * pkg/eventservice/big_txn_metric.go, which flags outliers by fixed
  * threshold; this generalizes to a per-group statistical gate).
  *
  * Engine portability: event values round ONCE per row to exact
  * milli units; per-(event_type, day) moment sums are then exact
  * integers; mean/sd/z are fixed-shape IEEE double expressions over
  * those integers (sqrt and / are correctly-rounded, hence
  * deterministic), and z rounds ONCE to milli units for output.
  */
object Anomaly {

  /** Milli-unit projection of the event stream (the ONE per-row
    * rounding; everything downstream is exact-integer or fixed-shape
    * IEEE). Works on batch and streaming frames alike — every op is
    * stateless and narrow. */
  private def milliValues(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("event_type"),
      expr("CAST(ts AS LONG) div 86400000000000").as("day"),
      round(col("value") * lit(1000.0)).cast("long").as("value_milli"))

  /** Baseline moments per (event_type, UTC-day): mean and sd from
    * exact integer moment sums. Group count is bounded by
    * types × days — broadcast-sized at any corpus scale. Groups with
    * zero variance cannot rank anything and are dropped. */
  def momentStats(events: DataFrame): DataFrame =
    milliValues(events).groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("value_milli")).as("s"),
        sum(col("value_milli") * col("value_milli")).as("ss"))
      .withColumn("mean", col("s").cast("double") / col("n").cast("double"))
      .withColumn("variance",
        col("ss").cast("double") / col("n").cast("double")
          - col("mean") * col("mean"))
      .filter(col("variance") > lit(0.0))
      .withColumn("sdv", sqrt(col("variance")))
      .select(col("event_type"), col("day"), col("mean"), col("sdv"))

  /** Apply a trained baseline to an event frame — batch or stream
    * (train-batch/score-stream is the production shape: the stats
    * side broadcasts, so the event stream is a stateless stream-
    * static join and is never reshuffled). */
  def zOutliersAgainst(events: DataFrame, stats: DataFrame,
      zMilliThreshold: Long): DataFrame =
    milliValues(events).join(broadcast(stats), Seq("event_type", "day"))
      .withColumn("z_milli",
        round(((col("value_milli").cast("double") - col("mean")) / col("sdv"))
          * lit(1000.0)).cast("long"))
      .filter(abs(col("z_milli")) >= zMilliThreshold)
      .select(col("event_id"), col("event_type"), col("day"),
        col("value_milli"), col("z_milli"))

  /** Self-trained batch form: events whose value is at least
    * `zMilliThreshold` milli-sigmas from their group mean. One
    * shuffle for the moments, broadcast join back. */
  def zOutliers(events: DataFrame, zMilliThreshold: Long): DataFrame =
    zOutliersAgainst(events, momentStats(events), zMilliThreshold)
}
