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

  /** N-step funnel: first occurrence of each step AFTER the previous
    * step, all within `windowNs` of the step-0 anchor. Output:
    * user_id, ts_0..ts_{k-1} (null once the user stalls), and depth =
    * deepest step reached. One per-user agg per step, every join
    * co-partitioned on user_id — k steps cost k small user-keyed
    * passes, never an events×events join. */
  def funnelSteps(events: DataFrame, steps: Seq[String],
                  windowNs: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got $steps")
    val ev = events.select(col("user_id"), col("event_type"), tsNs)
    var acc = ev.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts_ns")).as("ts_0"))
    steps.zipWithIndex.tail.foreach { case (st, i) =>
      val prevCols = // i = 1's previous step IS the anchor
        if (i == 1) Seq(col("user_id"), col("ts_0"))
        else Seq(col("user_id"), col("ts_0"), col(s"ts_${i - 1}"))
      val stepTs = ev.filter(col("event_type") === st)
        .join(acc.select(prevCols: _*), "user_id")
        .filter(col("ts_ns") >= col(s"ts_${i - 1}") &&
          col("ts_ns") <= col("ts_0") + windowNs)
        .groupBy(col("user_id")).agg(min(col("ts_ns")).as(s"ts_$i"))
      acc = acc.join(stepTs, Seq("user_id"), "left")
    }
    acc.withColumn("depth",
      steps.indices.tail.foldLeft(lit(0L)) { (d, i) =>
        when(col(s"ts_$i").isNotNull, i.toLong).otherwise(d)
      })
  }

  case class FunnelEvent(userId: Long, eventType: String, tsUs: Long)
  case class FunnelState(fromTsUs: Long, toCands: List[Long])
  case class FunnelResult(user_id: Long, from_ts_us: Long,
                          to_ts_us: Option[Long], converted: Boolean)

  /** Streaming twin of [[funnel]]: per-user state holds the earliest
    * entry ts plus the conversion CANDIDATES that could still matter,
    * and finalizes via an EVENT-TIME timeout once the watermark
    * passes `first entry + window` — at that point no in-window
    * conversion can still arrive, so the emitted row is final
    * (append-mode exact, the resolved-ts pattern TxnAssembler uses).
    *
    * Late-data reasoning bounds the state: an event below the
    * watermark is dropped by contract, so any future entry event has
    * ts ≥ watermark — a conversion candidate below BOTH the current
    * earliest entry and the watermark can never become valid and is
    * pruned every invocation. Users with candidates but no entry yet
    * time out at their newest candidate and evaporate. */
  def streamingFunnel(spark: org.apache.spark.sql.SparkSession, events: DataFrame,
                      fromType: String, toType: String, windowNs: Long,
                      delay: String = "0 seconds"): org.apache.spark.sql.Dataset[FunnelResult] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(windowNs % 1000L == 0, s"window must be whole microseconds: $windowNs")
    val windowUs = windowNs / 1000L
    val none = Long.MaxValue
    val rows = events
      .withColumn("__ts_us", expr("CAST(ts AS LONG) div 1000"))
      .withColumn("event_time", timestamp_micros(col("__ts_us")))
      .withWatermark("event_time", delay)
      .filter(col("event_type").isin(fromType, toType))
      .select(col("user_id").as("userId"), col("event_type").as("eventType"),
        col("__ts_us").as("tsUs"), col("event_time"))
      .as[FunnelEvent]
    rows.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            if (st.fromTsUs == none) Iterator.empty // never entered
            else {
              val valid = st.toCands
                .filter(t => t >= st.fromTsUs && t <= st.fromTsUs + windowUs)
              Iterator.single(FunnelResult(user, st.fromTsUs,
                if (valid.isEmpty) None else Some(valid.min), valid.nonEmpty))
            }
          } else {
            val prev = state.getOption.getOrElse(FunnelState(none, Nil))
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (from, cands) = it.foldLeft((prev.fromTsUs, prev.toCands)) {
              case ((f, cs), e) =>
                if (e.eventType == fromType) (math.min(f, e.tsUs), cs)
                else (f, e.tsUs :: cs)
            }
            val kept = cands.filter(t => t >= from || t >= wmUs)
            val fireMs =
              (if (from != none) from + windowUs else if (kept.nonEmpty) kept.max else 0L) / 1000L + 1L
            if (from == none && kept.isEmpty) { state.remove(); Iterator.empty }
            else if (from != none && fireMs <= state.getCurrentWatermarkMs()) {
              // entry arrived when its window had already closed
              // (timeouts must sit above the watermark): final NOW
              state.remove()
              val valid = kept.filter(t => t >= from && t <= from + windowUs)
              Iterator.single(FunnelResult(user, from,
                if (valid.isEmpty) None else Some(valid.min), valid.nonEmpty))
            } else {
              state.update(FunnelState(from, kept))
              state.setTimeoutTimestamp(fireMs)
              Iterator.empty
            }
          }
        })
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

  /** Event co-occurrence lift — the market-basket report over
    * (user, event_type): lift(a,b) = P(a,b) / (P(a)·P(b)) across
    * users, in exact integer micro units (n_ab·N·1e6 div n_a·n_b —
    * no double ever touches the data). Pair generation is a per-user
    * sorted-set explode (type vocab is tiny), so the only shuffles
    * are the distinct and the pair count; output is type²-sized. */
  def eventLift(events: DataFrame): DataFrame = {
    val ut = events.select(col("user_id"), col("event_type")).distinct()
    val nUsers = ut.agg(countDistinct(col("user_id")).as("n_users"))
    val nT = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    val pairs = ut.groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("__ts"))
      .select(explode(flatten(transform(col("__ts"), (a, i) =>
        transform(slice(col("__ts"), i + 2, size(col("__ts"))),
          b => struct(a.as("ta"), b.as("tb")))))).as("p"))
      .groupBy(col("p.ta").as("ta"), col("p.tb").as("tb"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(nT.select(col("event_type").as("ta"), col("n_t").as("n_a"))), "ta")
      .join(broadcast(nT.select(col("event_type").as("tb"), col("n_t").as("n_b"))), "tb")
      .crossJoin(broadcast(nUsers))
      .withColumn("lift_micro",
        expr("(n_ab * n_users * 1000000L) div (n_a * n_b)"))
      .select(col("ta"), col("tb"), col("n_ab"), col("n_a"), col("n_b"),
        col("lift_micro"))
  }
}
