package graft

import java.net.{HttpURLConnection, URL}
import java.nio.file.Files
import scala.io.Source
import graft.streaming.{ApiServer, ChangefeedRegistry, Failpoints}
import graft.model.{ChangefeedConfig, Redact}

/** Ops/debug surface: dynamic failpoints (grammar + a real injected
  * batch failure), TSO, owner resign, redaction mode, and the unsafe
  * routes (api/v2/api.go:51-53,:103,:106,:109-113). */
class OpsSurfaceSpec extends SparkFunSuite {

  private def call(method: String, url: String, body: Option[String] = None,
                   headers: Map[String, String] = Map.empty): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    body.foreach { b =>
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(b.getBytes("UTF-8")) finally os.close()
    }
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val out = Source.fromInputStream(stream, "UTF-8").mkString
    conn.disconnect()
    (code, out)
  }

  test("failpoint grammar: counted, chained, percentage, and panic terms") {
    Failpoints.clear()
    // 2*return(boom)->1*off->return(tail): counted chain in order
    Failpoints.enable("fp/chain", """2*return(boom)->1*off->return(tail)""")
    assert(Failpoints.eval("fp/chain").contains("boom"))
    assert(Failpoints.eval("fp/chain").contains("boom"))
    assert(Failpoints.eval("fp/chain").isEmpty) // off window
    assert(Failpoints.eval("fp/chain").contains("tail")) // unmodified tail persists
    assert(Failpoints.eval("fp/chain").contains("tail"))

    // exhausted counted chain with no tail → disabled
    Failpoints.enable("fp/count", "1*return(x)")
    assert(Failpoints.eval("fp/count").contains("x"))
    assert(Failpoints.eval("fp/count").isEmpty)

    // percentage: fires on the first N of every 100 hits (deterministic)
    Failpoints.enable("fp/pct", "10%return(p)")
    val fired = (0 until 200).count(_ => Failpoints.eval("fp/pct").isDefined)
    assert(fired == 20, s"10% of 200 hits, got $fired")

    // panic throws; disable clears
    Failpoints.enable("fp/panic", "panic(die)")
    intercept[Failpoints.FailpointPanic](Failpoints.eval("fp/panic"))
    Failpoints.disable("fp/panic")
    assert(Failpoints.eval("fp/panic").isEmpty)

    // malformed expressions are rejected at enable time
    intercept[IllegalArgumentException](Failpoints.enable("fp/bad", "explode(now)"))
    intercept[IllegalArgumentException](Failpoints.enable("fp/bad2", "sleep"))
    // terms after a terminal (percentage / unmodified) term are
    // unreachable — rejected up front rather than silently dropped
    intercept[IllegalArgumentException](
      Failpoints.enable("fp/bad3", "10%return->return(tail)"))
    intercept[IllegalArgumentException](
      Failpoints.enable("fp/bad4", "return(head)->1*off"))
    Failpoints.clear()
  }

  test("an enabled failpoint fails the changefeed batch; disable + resume recovers") {
    Failpoints.clear()
    val tmp = Files.createTempDirectory("graft-fp").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/src/events.parquet"))
    val cfg = ChangefeedConfig(id = "cf-fp")

    Failpoints.enable("graft/changefeed/batch", "return(injected-batch-failure)")
    val q = graft.streaming.Changefeed.runMq(
      spark, cfg, s"$tmp/src", s"$tmp/sink", s"$tmp/ckpt")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000)
    }
    assert(String.valueOf(err.getMessage).contains("injected-batch-failure"),
      s"injected failure must surface: ${err.getMessage}")

    // chaos over: the same checkpoint resumes cleanly and drains the log
    Failpoints.disable("graft/changefeed/batch")
    graft.streaming.Changefeed.runMq(
      spark, cfg, s"$tmp/src", s"$tmp/sink", s"$tmp/ckpt").awaitTermination(120000)
    assert(spark.read.parquet(s"$tmp/sink").count() > 0)
  }

  test("/metrics: Prometheus scrape parses, counters monotone, labels present") {
    Failpoints.clear()
    val tmp = Files.createTempDirectory("graft-prom").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/src/events.parquet"))

    val registry = new graft.streaming.ChangefeedRegistry(spark)
    val collector = graft.streaming.MetricsCollector.attach(spark)
    val api = new graft.streaming.ApiServer(registry, metrics = Some(collector)).start()
    def scrape(): String = {
      val conn = new java.net.URL(s"http://127.0.0.1:${api.boundPort}/metrics")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      assert(conn.getContentType.startsWith("text/plain"))
      val body = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
      conn.disconnect(); body
    }
    // the exposition-format shape every non-comment line must have
    val sampleRe =
      """^[a-zA-Z_:][a-zA-Z0-9_:]*(\{[^}]*\})? -?[0-9.eE+-]+(e[+-]?[0-9]+)?$""".r
    def parse(body: String): Map[String, Double] =
      body.linesIterator.filterNot(l => l.startsWith("#") || l.isEmpty).map { l =>
        assert(sampleRe.matches(l), s"unparseable sample line: $l")
        val i = l.lastIndexOf(' ')
        l.take(i) -> l.drop(i + 1).toDouble
      }.toMap
    try {
      // batch 1: create drains the fixture; wait for the query to finish
      registry.create(ChangefeedConfig(id = "cf-prom", keyspace = "ks1"),
        s"$tmp/src", s"$tmp/sink", s"$tmp/ckpt").awaitTermination(120000)
      registry.reportStatus("cf-prom", 1000L, Nil, System.currentTimeMillis())
      // progress events are delivered async; wait for the listener
      val deadline = System.currentTimeMillis() + 30000
      while (collector.totals.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      Failpoints.enable("graft/prom/marker", "100*off")
      Failpoints.eval("graft/prom/marker"); Failpoints.eval("graft/prom/marker")

      val m1 = parse(scrape())
      val feedLabels = """namespace="ks1",changefeed="cf-prom""""
      assert(m1.contains(s"""ticdc_owner_status{$feedLabels,keyspace_id="0"}"""),
        s"per-changefeed labels present; got keys: ${m1.keys.filter(_.startsWith("ticdc_owner")).mkString("; ")}")
      assert(m1(s"ticdc_owner_checkpoint_ts{$feedLabels}") == 1000.0)
      assert(m1(s"ticdc_maintainer_resolved_ts{$feedLabels}") == 1000.0)
      val rows1 = m1(s"ticdc_sink_dml_event_count{$feedLabels}")
      assert(rows1 > 0, "first drain must count rows")
      // histogram coherence: +Inf bucket == _count, buckets cumulative
      val histLabels = s"""$feedLabels,type="mq",keyspace_id="0""""
      val infB = m1(s"""ticdc_sink_batch_row_count_bucket{$histLabels,le="+Inf"}""")
      assert(infB == m1(s"ticdc_sink_batch_row_count_count{$histLabels}"))
      assert(m1(s"ticdc_sink_batch_row_count_sum{$histLabels}") == rows1)
      assert(m1("""ticdc_server_failpoint_hits_total{name="graft/prom/marker"}""") == 2.0)

      // batch 2: more data through the same feed; counters stay monotone
      Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$tmp/src/events2.parquet"))
      registry.resume("cf-prom").awaitTermination(120000)
      registry.reportStatus("cf-prom", 2000L, Nil, System.currentTimeMillis())
      val d2 = System.currentTimeMillis() + 30000
      while (collector.totals.headOption.map(_._2.rows.get()).getOrElse(0L) <= rows1.toLong
        && System.currentTimeMillis() < d2) Thread.sleep(200)

      val m2 = parse(scrape())
      val rows2 = m2(s"ticdc_sink_dml_event_count{$feedLabels}")
      assert(rows2 > rows1, s"counter monotone across batches: $rows1 -> $rows2")
      assert(m2(s"ticdc_owner_checkpoint_ts{$feedLabels}") == 2000.0)
      assert(m2(s"ticdc_sink_batch_row_count_count{$histLabels}") >=
        m1(s"ticdc_sink_batch_row_count_count{$histLabels}"))
      assert(m2("ticdc_owner_ownership_counter") >= m1("ticdc_owner_ownership_counter"))
      // lag gauge present and sane (reported seconds since last status)
      assert(m2.keys.exists(_.startsWith(
        s"ticdc_owner_checkpoint_ts_lag{$feedLabels")), "lag gauge present")
    } finally {
      Failpoints.clear()
      graft.streaming.MetricsCollector.detach(spark, collector)
      try registry.remove("cf-prom") catch { case _: Throwable => () }
      api.stop()
    }
  }

  test("tso, resign, redact, unsafe routes, /debug surface over HTTP") {
    Failpoints.clear()
    Redact.reset()
    val reg = new ChangefeedRegistry(spark)
    val api = new ApiServer(reg).start()
    val root = s"http://127.0.0.1:${api.boundPort}"
    try {
      // failpoints CRUD (failpoint.go:73-140)
      assert(call("POST", s"$root/debug/failpoints",
        Some("""{"name":"fp/api","expr":"return(y)"}"""))._1 == 200)
      assert(call("POST", s"$root/debug/failpoints",
        Some("""{"name":"fp/api"}"""))._1 == 400) // expr required
      assert(call("POST", s"$root/debug/failpoints",
        Some("""{"name":"fp/api","expr":"nonsense()"}"""))._1 == 500) // bad grammar
      val (_, listed) = call("GET", s"$root/debug/failpoints")
      assert(listed.contains(""""name":"fp/api"""") && listed.contains("return(y)"), listed)
      assert(Failpoints.eval("fp/api").contains("y")) // actually live
      assert(call("DELETE", s"$root/debug/failpoints?name=fp/api")._1 == 200)
      assert(call("GET", s"$root/debug/failpoints")._2 == "[]")

      // /debug/info is a text dump mentioning the owner epoch
      val (ci, bi) = call("GET", s"$root/debug/info")
      assert(ci == 200 && bi.contains("owner epoch"), bi)

      // tso (tso.go): two calls give monotone logical counters
      val (ct1, bt1) = call("POST", s"$root/api/v2/tso", Some("{}"))
      val (_, bt2) = call("POST", s"$root/api/v2/tso", Some("{}"))
      assert(ct1 == 200 && bt1.contains("\"timestamp\""), bt1)
      def logic(b: String) = b.split("\"logic_time\":")(1).takeWhile(_.isDigit).toLong
      assert(logic(bt2) > logic(bt1))

      // owner resign bumps the epoch visible in /api/v2/status
      def epoch() = call("GET", s"$root/api/v2/status")._2
        .split("\"epoch\":")(1).takeWhile(_.isDigit).toLong
      val e0 = epoch()
      assert(call("POST", s"$root/api/v2/owner/resign")._1 == 200)
      assert(epoch() == e0 + 1)

      // redact: off→marker ok, marker→off rejected (upgrade-only),
      // and the mode actually redacts /status error text
      val (cr1, br1) = call("POST", s"$root/api/v2/log/redact",
        Some("""{"redact_info_log":"marker"}"""))
      assert(cr1 == 200 && br1.contains("\"previous_mode\":\"off\"")
        && br1.contains("\"current_mode\":\"marker\""), br1)
      val (cr2, br2) = call("POST", s"$root/api/v2/log/redact",
        Some("""{"redact_info_log":"off"}"""))
      assert(cr2 == 400 && br2.contains("cannot relax"), br2)
      assert(call("POST", s"$root/api/v2/log/redact",
        Some("""{"redact_info_log":"bogus"}"""))._1 == 400)
      assert(Redact("secret-row") == "‹secret-row›")

      // unsafe: metadata dump has the owner key; resolve_lock
      // validates its body; gc safepoint delete drops the safepoint
      // until the owner re-registers it
      val (cm, bm) = call("GET", s"$root/api/v2/unsafe/metadata")
      assert(cm == 200 && bm.contains("__cdc_meta__/owner"), bm)
      assert(call("POST", s"$root/api/v2/unsafe/resolve_lock",
        Some("""{"region_id":7,"ts":123456}"""))._1 == 200)
      assert(call("POST", s"$root/api/v2/unsafe/resolve_lock",
        Some("""{"region_id":7}"""))._1 == 400)
    } finally {
      api.stop()
      Redact.reset()
      Failpoints.clear()
    }
  }

  test("deleted service gc safepoint stays gone until the owner tick re-registers it") {
    val tmp = Files.createTempDirectory("graft-gc").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/src/events.parquet"))
    val reg = new ChangefeedRegistry(spark)
    val api = new ApiServer(reg).start()
    val root = s"http://127.0.0.1:${api.boundPort}"
    try {
      reg.create(ChangefeedConfig(id = "cf-gc"), s"$tmp/src", s"$tmp/sink", s"$tmp/ckpt")
        .awaitTermination(120000)
      reg.reportStatus("cf-gc", 777L, Nil, 1L)
      assert(call("GET", s"$root/api/v2/gc_safepoint")._2.contains("777"))
      assert(call("DELETE", s"$root/api/v2/unsafe/service_gc_safepoint")._1 == 200)
      assert(call("GET", s"$root/api/v2/gc_safepoint")._2.contains("null"))
      // the next status report (owner tick) re-advertises it
      reg.reportStatus("cf-gc", 778L, Nil, 2L)
      assert(call("GET", s"$root/api/v2/gc_safepoint")._2.contains("778"))
    } finally {
      reg.remove("cf-gc")
      api.stop()
    }
  }
}
