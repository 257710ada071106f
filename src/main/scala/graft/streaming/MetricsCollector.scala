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
    buf.add(BatchMetric(
      Option(p.name).getOrElse(p.id.toString), p.batchId, ts,
      p.numInputRows, p.processedRowsPerSecond, total, add, wmLag))
    while (buf.size() > capacity) { buf.poll(); () }
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
