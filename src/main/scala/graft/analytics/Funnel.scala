package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event log: funnel conversion and
  * retention cohorts — the product-analytics queries a CDC-fed event
  * table exists to answer.
  *
  * Both operators are two-shuffle plans: a per-user aggregation, then
  * a join/aggregation that REUSES the user hash partitioning (Spark
  * co-partitions the agg output with the join key, so the second step
  * adds no extra exchange of the big side). Timestamps are µs-
  * truncated nanos, the cross-engine-safe domain for the ns parquet
  * column. */
object Funnel {

  private def tsNs = {
    val t = col("ts").cast("long")
    (t - pmod(t, lit(1000L))).as("ts_ns")
  }

  /** Two-step funnel: for each user who did `fromType`, the first
    * `toType` within `windowNs` after their FIRST `fromType`.
    * Output: user_id, from_ts, to_ts (null = no conversion),
    * converted, ns_to_convert. */
  def funnel(events: DataFrame, fromType: String, toType: String,
             windowNs: Long): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"), tsNs)
    val entered = ev.filter(col("event_type") === fromType)
      .groupBy(col("user_id")).agg(min(col("ts_ns")).as("from_ts"))
    val converted = ev.filter(col("event_type") === toType)
      .join(entered, "user_id")
      .filter(col("ts_ns") >= col("from_ts") &&
        col("ts_ns") <= col("from_ts") + windowNs)
      .groupBy(col("user_id")).agg(min(col("ts_ns")).as("to_ts"))
    entered.join(converted, Seq("user_id"), "left")
      .select(col("user_id"), col("from_ts"), col("to_ts"),
        col("to_ts").isNotNull.as("converted"),
        (col("to_ts") - col("from_ts")).as("ns_to_convert"))
  }

  /** Retention cohorts: users bucket by FIRST-SEEN period (cohort),
    * and each (cohort, age-in-periods) cell counts the distinct users
    * from that cohort active that period — the classic triangle. */
  def retention(events: DataFrame, bucketNs: Long): DataFrame = {
    val ev = events.select(col("user_id"), tsNs)
    val firstSeen = ev.groupBy(col("user_id"))
      .agg(min(col("ts_ns")).as("first_ts"))
    // ns epochs exceed 2^53: bucket math must stay in LONG integer
    // division (`div`), never pass through a double
    ev.join(firstSeen, "user_id")
      .select(col("user_id"),
        expr(s"first_ts div ${bucketNs}L").as("cohort"),
        (expr(s"ts_ns div ${bucketNs}L") -
          expr(s"first_ts div ${bucketNs}L")).as("age"))
      .groupBy(col("cohort"), col("age"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }
}
