package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-changefeed observability — the Spark-side analog of the
  * reference's Prometheus surface (pkg/metrics/changefeed.go,
  * dispatcher.go; lag gauges
  * downstreamadapter/dispatchermanager/dispatcher_manager.go:193-195,
  * :970-971 — checkpoint/resolved lag in seconds, event counts,
  * throughput).
  *
  * A [[StreamingQueryListener]] captures every micro-batch's progress
  * (Spark already aggregates input rows, processing rate and duration
  * per trigger — the engine's counters ARE the metric source, exactly
  * as the reference hangs its gauges off dispatcher heartbeats), plus
  * watermark lag computed against the wall clock. Snapshots surface as
  * a DataFrame so lag/throughput dashboards are one `spark.sql` away.
  *
  * Driver state is bounded: a ring of the last `capacity` progress
  * rows (control-plane-sized — batch count, not row count; the
  * reference similarly keeps only current gauge values + histogram
  * buckets).
  */
final class MetricsCollector(capacity: Int = 1024) extends StreamingQueryListener {

  import MetricsCollector.BatchMetric

  private val buf = new ConcurrentLinkedQueue[BatchMetric]()
  @volatile private var started = 0L
  @volatile private var terminated = 0L

  // Cumulative per-changefeed totals, never evicted (unlike the ring
  // above): the Prometheus counters and histograms must stay monotone
  // for a scraper's rate() even after the ring has rolled over. One
  // histogram matches the reference's sink batch_row_count buckets
  // (pkg/metrics/statistics.go ExecBatchHistogram:
  // ExponentialBuckets(1, 2, 18)).
  private val cum =
    new java.util.concurrent.ConcurrentHashMap[String, MetricsCollector.Totals]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    started += 1

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    terminated += 1

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val ts = java.time.Instant.parse(p.timestamp).toEpochMilli
    // eventTime.watermark is absent for stateless queries; lag 0 then
    val wmLag = Option(p.eventTime.get("watermark"))
      .filter(_.nonEmpty)
      .map(w => math.max(0L, ts - java.time.Instant.parse(w).toEpochMilli))
      .getOrElse(0L)
    val add = Option(p.durationMs.get("addBatch")).map(_.longValue()).getOrElse(0L)
    val total = p.durationMs.values().asScala.foldLeft(0L)(_ + _.longValue())
    val name = Option(p.name).getOrElse(p.id.toString)
    buf.add(BatchMetric(
      name, p.batchId, ts,
      p.numInputRows, p.processedRowsPerSecond, total, add, wmLag))
    while (buf.size() > capacity) { buf.poll(); () }
    val t = cum.computeIfAbsent(name, _ => new MetricsCollector.Totals)
    t.observe(p.numInputRows, p.processedRowsPerSecond, wmLag, p.batchId)
  }

  /** Cumulative per-changefeed totals for the Prometheus scrape —
    * driver-local, no Spark job. */
  def totals: Seq[(String, MetricsCollector.Totals)] = {
    import scala.jdk.CollectionConverters._
    cum.asScala.toSeq.sortBy(_._1)
  }

  /** All captured batch metrics as a DataFrame. */
  def snapshot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    buf.asScala.toSeq.toDF()
  }

  /** Per-changefeed rollup: the gauge set the reference exports —
    * total rows, mean throughput, last lag, batch count. */
  def gauges(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("changefeed")).orderBy(col("batchId").desc)
    snapshot(spark)
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("changefeed"))
      .agg(
        count(lit(1)).as("n_batches"),
        sum(col("numInputRows")).as("total_rows"),
        (sum(col("numInputRows")).cast("double") /
          (sum(col("batchDurationMs")).cast("double") / 1000.0)).as("rows_per_sec"),
        max(when(col("__rn") === 1, col("watermarkLagMs"))).as("last_watermark_lag_ms"),
        max(when(col("__rn") === 1, col("batchId"))).as("last_batch_id"))
  }

  def queriesStarted: Long = started
  def queriesTerminated: Long = terminated
}

object MetricsCollector {

  /** Histogram bucket upper bounds mirroring the reference's
    * batch_row_count: ExponentialBuckets(1, 2, 18) → 1,2,…,131072. */
  val batchRowBuckets: Vector[Long] = Vector.iterate(1L, 18)(_ * 2L)

  /** Monotone per-changefeed counters + one batch-size histogram.
    * Mutated only from the listener thread; read by the scraper. */
  final class Totals {
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    /** per-bucket increment counts (index aligned to batchRowBuckets,
      * last slot = +Inf overflow) */
    val hist: Array[java.util.concurrent.atomic.AtomicLong] =
      Array.fill(batchRowBuckets.length + 1)(
        new java.util.concurrent.atomic.AtomicLong(0L))
    @volatile var lastRowsPerSec: Double = 0.0
    @volatile var lastWatermarkLagMs: Long = 0L
    @volatile var lastBatchId: Long = -1L

    private[streaming] def observe(nRows: Long, rate: Double,
                                   lagMs: Long, batchId: Long): Unit = {
      batches.incrementAndGet()
      rows.addAndGet(nRows)
      val i = batchRowBuckets.indexWhere(nRows <= _) match {
        case -1 => batchRowBuckets.length
        case k => k
      }
      hist(i).incrementAndGet()
      lastRowsPerSec = rate
      lastWatermarkLagMs = lagMs
      lastBatchId = batchId
    }
  }

  /** One micro-batch observation (changefeed = query name). */
  final case class BatchMetric(
      changefeed: String,
      batchId: Long,
      epochMs: Long,
      numInputRows: Long,
      processedRowsPerSec: Double,
      batchDurationMs: Long,
      addBatchMs: Long,
      watermarkLagMs: Long)

  /** Attach a collector to the session's streams. Caller keeps the
    * handle for snapshots and must remove it when done. */
  def attach(spark: SparkSession, capacity: Int = 1024): MetricsCollector = {
    val c = new MetricsCollector(capacity)
    spark.streams.addListener(c)
    c
  }

  def detach(spark: SparkSession, c: MetricsCollector): Unit =
    spark.streams.removeListener(c)
}
