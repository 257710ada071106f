package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Process-global sink-side counters that have no per-batch progress
  * event to ride (the reference registers these directly in the sink
  * component, e.g. pkg/sink/kafka/claimcheck/metrics.go) — surfaced
  * by [[Prometheus.render]] like the failpoint hit counters. */
object SinkCounters {

  private val claimChecks = new ConcurrentHashMap[String, AtomicLong]()

  /** Count messages uploaded to the claim-check storage
    * (ticdc_sink_mq_claim_check_send_message_count, metrics.go:30-36). */
  def addClaimChecksSent(changefeed: String, n: Long): Unit =
    if (n > 0)
      claimChecks.computeIfAbsent(changefeed, _ => new AtomicLong()).addAndGet(n)

  def claimChecksSent: Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    claimChecks.asScala.toSeq.map { case (k, v) => k -> v.get() }.sortBy(_._1)
  }

  private val warns = new ConcurrentHashMap[String, FeedError]()

  /** Record a feed-level WARNING raised inside a sink/batch loop (the
    * all-mismatch integrity circuit) — the reference reports these as
    * RunningErrors on the feed's status; here the latest per feed is
    * surfaced for the status/ops surface and specs. */
  def reportWarning(changefeed: String, err: FeedError): Unit =
    warns.put(changefeed, err)

  def warningFor(changefeed: String): Option[FeedError] =
    Option(warns.get(changefeed))

  /** Test hook: drop every counter. */
  def clear(): Unit = { claimChecks.clear(); warns.clear() }
}
