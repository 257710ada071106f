package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gap-based sessionization over the events stream — the
  * session-window analytic a training-data pipeline runs over user
  * activity logs (Structured Streaming's `session_window` is the
  * streaming twin; this is the deterministic batch form used by the
  * oracle gate).
  *
  * A new session starts when the gap to the previous event of the
  * same user exceeds `gapNs`. Single shuffle on user, two window
  * passes over the same partitioning (Catalyst reuses the exchange).
  */
object Sessionize {

  def sessions(events: DataFrame, gapNs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    // µs-truncate (oracle engines read parquet ns at µs precision)
    val withTs = events.select(
      col("event_id"), col("user_id"),
      (col("ts").cast("long") - pmod(col("ts").cast("long"), lit(1000L))).as("ts_ns"),
      col("value"))
    val marked = withTs
      .withColumn("__prev", lag(col("ts_ns"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull || col("ts_ns") - col("__prev") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts_ns")).as("session_start"),
        max(col("ts_ns")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("session_value"))
  }

  /** Top-k session paths — the ordered event-type sequence of every
    * session, counted corpus-wide (the product-analytics "common
    * journeys" report). Session marking is identical to [[sessions]];
    * the path string builds from a sorted struct collect, so ordering
    * is (ts, event_id)-deterministic on any engine. Distinct paths
    * are bounded by observed behaviors (vocab-like), so the final
    * rank window sorts paths, never events. */
  def sessionPaths(events: DataFrame, gapNs: Long, k: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    val withTs = events.select(
      col("event_id"), col("user_id"), col("event_type"),
      (col("ts").cast("long") - pmod(col("ts").cast("long"), lit(1000L))).as("ts_ns"))
    val marked = withTs
      .withColumn("__prev", lag(col("ts_ns"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull || col("ts_ns") - col("__prev") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val paths = marked
      .groupBy(col("user_id"), col("session_seq"))
      .agg(array_join(
        transform(
          array_sort(collect_list(
            struct(col("ts_ns"), col("event_id"), col("event_type")))),
          s => s.getField("event_type")), ">").as("path"))
    val w = Window.orderBy(col("n_sessions").desc, col("path").asc)
    paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("path"), col("n_sessions"))
  }

  /** Streaming form: Structured Streaming's native `session_window`
    * (gap-close semantics identical to the batch two-pass window) +
    * watermark, so session state evicts `delay` past the newest event
    * — unbounded-corpus sessionization with bounded memory. Emits one
    * row per closed session (append mode: a session is final once the
    * watermark passes its close). */
  def streamingSessions(events: DataFrame, gapNs: Long, delay: String): DataFrame = {
    // event time is µs precision; a sub-µs gap cannot round-trip
    require(gapNs % 1000L == 0, s"gap must be whole microseconds, got $gapNs ns")
    // ns→µs with INTEGER division: `/` on longs coerces to double and
    // epoch-ns values exceed double's 53-bit mantissa (off-by-1-µs on
    // real data); `div` stays in the long domain
    val withTs = events
      .withColumn("__ts_ns", col("ts").cast("long"))
      .select(
        col("event_id"), col("user_id"),
        timestamp_micros(expr("__ts_ns div 1000")).as("event_time"),
        col("value"))
    withTs
      .withWatermark("event_time", delay)
      .groupBy(col("user_id"),
        session_window(col("event_time"), s"${gapNs / 1000L} microseconds"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))
  }

  /** DuckDB mirror (same two-pass window + group). */
  /** DuckDB twin of [[sessionPaths]] — same marking CTEs, path via
    * ordered string_agg. */
  def pathsOracleSql(gapNs: Long, k: Int): String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, event_type, epoch_ns(ts) AS ts_ns FROM events
       |), marked AS (
       |  SELECT *,
       |    CASE WHEN lag(ts_ns) OVER w IS NULL
       |              OR ts_ns - lag(ts_ns) OVER w > $gapNs
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)
       |), numbered AS (
       |  SELECT *,
       |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
       |  FROM marked
       |), paths AS (
       |  SELECT user_id, session_seq,
       |    string_agg(event_type, '>' ORDER BY ts_ns, event_id) AS path
       |  FROM numbered GROUP BY 1, 2
       |)
       |SELECT rank, path, n_sessions FROM (
       |  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       |    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS BIGINT) AS rank
       |  FROM paths GROUP BY 1)
       |WHERE rank <= $k""".stripMargin

  def oracleSql(gapNs: Long): String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, epoch_ns(ts) AS ts_ns, value FROM events
       |), marked AS (
       |  SELECT *,
       |    CASE WHEN lag(ts_ns) OVER w IS NULL
       |              OR ts_ns - lag(ts_ns) OVER w > $gapNs
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)
       |), numbered AS (
       |  SELECT *,
       |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
       |  FROM marked
       |)
       |SELECT user_id, session_seq,
       |  MIN(ts_ns) AS session_start,
       |  MAX(ts_ns) AS session_end,
       |  COUNT(*) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
       |FROM numbered GROUP BY 1, 2""".stripMargin
}
