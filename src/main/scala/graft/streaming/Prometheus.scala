package graft.streaming

/** Prometheus text-format (version 0.0.4) exposition of the engine's
  * control-plane state — the reference's ops story is a Prometheus
  * scrape feeding the shipped Grafana dashboards
  * (api/http.go:54 `router.Any("/metrics", promhttp.Handler())`;
  * metric families registered across the pkg/metrics package).
  *
  * Family names, subsystems, and label sets mirror the reference's
  * registrations so those dashboards work against this engine:
  *  - ticdc_owner_status / checkpoint_ts / checkpoint_ts_lag
  *    (pkg/metrics/changefeed.go:70,98,107; values follow
  *    coordinator/controller.go:267-355 — status carries
  *    FeedState.ToInt, lag is seconds behind now)
  *  - ticdc_maintainer_checkpoint_ts{,_lag} / resolved_ts{,_lag}
  *    (changefeed.go:23-52)
  *  - ticdc_sink_dml_event_count (counter) and
  *    ticdc_sink_batch_row_count (histogram,
  *    ExponentialBuckets(1,2,18)) from pkg/metrics/statistics.go
  *  - ticdc_server_build_info / go_max_procs (server.go:30-49)
  *  - ticdc_server_failpoint_hits_total — this engine's failpoint
  *    registry exposed the same way (the Go failpoint lib keeps hit
  *    state internal; a counter per enabled point is the scrapeable
  *    form of the same information)
  *
  * The keyspace label is `namespace` — the classic-kernel name
  * (pkg/metrics/init.go:51-56 GetKeyspaceLabel).
  *
  * Everything rendered here is driver-local state: a scrape never
  * launches a Spark job, exactly as the reference's gauges read
  * in-memory atomics.
  */
object Prometheus {

  private val ks = "namespace"

  private def esc(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  private def fmt(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else String.format(java.util.Locale.ROOT, "%.6g", Double.box(d))

  private final class Builder {
    private val sb = new StringBuilder
    def family(name: String, kind: String, help: String): this.type = {
      sb.append(s"# HELP $name $help\n# TYPE $name $kind\n"); this
    }
    def sample(name: String, labels: Seq[(String, String)], v: Double): this.type = {
      sb.append(name)
      if (labels.nonEmpty)
        sb.append(labels.map { case (k, x) => s"""$k="${esc(x)}"""" }
          .mkString("{", ",", "}"))
      sb.append(' ').append(fmt(v)).append('\n')
      this
    }
    def render: String = sb.toString
  }

  /** Render the full exposition. `collector` contributes the sink
    * counters/histogram when a [[MetricsCollector]] is attached. */
  def render(registry: ChangefeedRegistry,
             collector: Option[MetricsCollector],
             nowMs: Long = System.currentTimeMillis()): String = {
    val b = new Builder
    val feeds = registry.feedMetrics

    b.family("ticdc_server_build_info", "gauge",
      "Build information of the server")
    b.sample("ticdc_server_build_info",
      Seq("version" -> "graft"), 1.0)
    b.family("ticdc_server_go_max_procs", "gauge",
      "The value of runtime parallelism")
    b.sample("ticdc_server_go_max_procs", Nil,
      registry.spark.sparkContext.defaultParallelism.toDouble)

    b.family("ticdc_owner_ownership_counter", "counter",
      "The counter of ownership increases on an owner capture")
    b.sample("ticdc_owner_ownership_counter", Nil, registry.ownerEpoch.toDouble)

    b.family("ticdc_owner_status", "gauge", "The status of changefeeds")
    feeds.foreach(f => b.sample("ticdc_owner_status",
      Seq(ks -> f.keyspace, "changefeed" -> f.id, "keyspace_id" -> "0"),
      f.stateCode.toDouble))

    b.family("ticdc_owner_checkpoint_ts", "gauge",
      "checkpoint ts of changefeeds")
    feeds.foreach(f => b.sample("ticdc_owner_checkpoint_ts",
      Seq(ks -> f.keyspace, "changefeed" -> f.id), f.checkpointTs.toDouble))

    // lag in seconds behind the scrape clock, from the feed's last
    // status report (controller.go:346-352 computes against the PD
    // clock; the wall clock is this deployment's PD clock)
    b.family("ticdc_owner_checkpoint_ts_lag", "gauge",
      "changefeed checkpoint ts lag in seconds")
    feeds.foreach { f =>
      val lag =
        if (f.lastStatusMs <= 0) 0.0
        else math.max(0.0, (nowMs - f.lastStatusMs).toDouble / 1000.0)
      b.sample("ticdc_owner_checkpoint_ts_lag",
        Seq(ks -> f.keyspace, "changefeed" -> f.id, "keyspace_id" -> "0"), lag)
    }

    // maintainer view (changefeed.go:23-52): one capture, so the
    // maintainer's checkpoint/resolved are the owner's values; the
    // resolved ts is the checkpoint at batch close (watermark 0)
    b.family("ticdc_maintainer_checkpoint_ts", "gauge",
      "checkpoint ts of maintainer")
    feeds.foreach(f => b.sample("ticdc_maintainer_checkpoint_ts",
      Seq(ks -> f.keyspace, "changefeed" -> f.id), f.checkpointTs.toDouble))
    b.family("ticdc_maintainer_resolved_ts", "gauge",
      "resolved ts of maintainer")
    feeds.foreach(f => b.sample("ticdc_maintainer_resolved_ts",
      Seq(ks -> f.keyspace, "changefeed" -> f.id), f.checkpointTs.toDouble))

    b.family("ticdc_changefeed_maintainer_counter", "gauge",
      "The counter of changefeed maintainer")
    feeds.foreach(f => b.sample("ticdc_changefeed_maintainer_counter",
      Seq(ks -> f.keyspace, "changefeed" -> f.id),
      if (f.state == "normal") 1.0 else 0.0))

    collector.foreach { c =>
      val totals = c.totals
      val keyspaceOf = feeds.map(f => f.id -> f.keyspace).toMap

      b.family("ticdc_sink_dml_event_count", "counter",
        "Total count of DML events.")
      totals.foreach { case (cf, t) =>
        b.sample("ticdc_sink_dml_event_count",
          Seq(ks -> keyspaceOf.getOrElse(cf, "default"), "changefeed" -> cf),
          t.rows.get().toDouble)
      }

      b.family("ticdc_sink_batch_row_count", "histogram",
        "Row count number for a given batch.")
      totals.foreach { case (cf, t) =>
        val labels = Seq(ks -> keyspaceOf.getOrElse(cf, "default"),
          "changefeed" -> cf, "type" -> "mq", "keyspace_id" -> "0")
        var cumCount = 0L
        MetricsCollector.batchRowBuckets.zipWithIndex.foreach { case (le, i) =>
          cumCount += t.hist(i).get()
          b.sample("ticdc_sink_batch_row_count_bucket",
            labels :+ ("le" -> le.toString), cumCount.toDouble)
        }
        cumCount += t.hist(MetricsCollector.batchRowBuckets.length).get()
        b.sample("ticdc_sink_batch_row_count_bucket",
          labels :+ ("le" -> "+Inf"), cumCount.toDouble)
        b.sample("ticdc_sink_batch_row_count_sum", labels, t.rows.get().toDouble)
        b.sample("ticdc_sink_batch_row_count_count", labels, cumCount.toDouble)
      }

      // the dispatcher-manager lag gauges the reference's heartbeat
      // publishes (pkg/metrics/dispatcher.go:79 checkpoint_ts_lag,
      // dispatcher_manager.go:970-971 — seconds)
      b.family("ticdc_dispatchermanager_checkpoint_ts_lag", "gauge",
        "checkpoint ts lag of dispatcher manager in seconds")
      totals.foreach { case (cf, t) =>
        b.sample("ticdc_dispatchermanager_checkpoint_ts_lag",
          Seq(ks -> keyspaceOf.getOrElse(cf, "default"), "changefeed" -> cf),
          t.lastWatermarkLagMs.toDouble / 1000.0)
      }
    }

    val claims = SinkCounters.claimChecksSent
    if (claims.nonEmpty) {
      val keyspaceOf = feeds.map(f => f.id -> f.keyspace).toMap
      b.family("ticdc_sink_mq_claim_check_send_message_count", "counter",
        "The total count of messages sent to the external claim-check storage.")
      claims.foreach { case (cf, n) =>
        b.sample("ticdc_sink_mq_claim_check_send_message_count",
          Seq(ks -> keyspaceOf.getOrElse(cf, "default"), "changefeed" -> cf),
          n.toDouble)
      }
    }

    val fps = Failpoints.hitCounts
    if (fps.nonEmpty) {
      b.family("ticdc_server_failpoint_hits_total", "counter",
        "Evaluation count of enabled failpoints")
      fps.foreach { case (name, n) =>
        b.sample("ticdc_server_failpoint_hits_total",
          Seq("name" -> name), n.toDouble)
      }
    }
    b.render
  }
}
