package graft

import java.net.{HttpURLConnection, URL}
import java.nio.file.Files
import scala.io.Source
import graft.streaming.{ApiServer, ChangefeedRegistry}

/** API v2 lifecycle over HTTP: create → status → pause → resume →
  * delete, against a real changefeed on the sf0.001 log (the
  * reference's api/v2 integration surface). */
class ApiServerSpec extends SparkFunSuite {

  private def call(method: String, url: String,
                   headers: Map[String, String] = Map.empty): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = Source.fromInputStream(stream, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  private def callBody(method: String, url: String, body: String): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json")
    val os = conn.getOutputStream
    try os.write(body.getBytes("UTF-8")) finally os.close()
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text = Source.fromInputStream(stream, "UTF-8").mkString
    conn.disconnect()
    (code, text)
  }

  private def basicAuth(user: String, pass: String = "pw"): Map[String, String] =
    Map("Authorization" -> ("Basic " + java.util.Base64.getEncoder
      .encodeToString(s"$user:$pass".getBytes("UTF-8"))))

  test("changefeed lifecycle over the HTTP surface") {
    val tmp = Files.createTempDirectory("graft-api").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))

    val registry = new ChangefeedRegistry(spark)
    val api = new ApiServer(registry, catalog = Some(graft.streaming.TableCatalog(
      all = () => Seq(("app", "events_1"), ("app", "events_2"), ("app", "nopk")),
      eligible = (_, t) => t != "nopk"))).start()
    val base = s"http://127.0.0.1:${api.boundPort}/api/v2/changefeeds"
    try {
      val (c0, l0) = call("GET", base)
      assert(c0 == 200 && l0 == "[]")

      val (c1, b1) = call("POST",
        s"$base?id=cf-api&source=$src&sink=$tmp/sink&ckpt=$tmp/ckpt&rules=app.*")
      assert(c1 == 201 && b1.contains("\"cf-api\""), b1)

      // missing params rejected
      val (c400, _) = call("POST", s"$base?id=x")
      assert(c400 == 400)

      // wait for the AvailableNow drain, then check status
      registry.status("cf-api") // touches nothing, just resolvable
      val deadline = System.currentTimeMillis() + 120000
      var emitted = 0L
      while (emitted == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        val (_, s) = call("GET", s"$base/cf-api/status")
        val m = "\"emitted\":(\\d+)".r.findFirstMatchIn(s)
        emitted = m.map(_.group(1).toLong).getOrElse(0L)
      }
      assert(emitted > 0, "changefeed emitted rows")

      val (c2, b2) = call("GET", base)
      assert(c2 == 200 && b2 == "[\"cf-api\"]")

      // a drained feed with a fresh maintainer checkpoint and 5 min of
      // data quiet reports strictly synced (api/v2/changefeed.go:1676)
      val nowMs = System.currentTimeMillis()
      registry.reportSyncState("cf-api", checkpointTsMs = nowMs,
        lastSyncedTsMs = nowMs - 400000L, pullerResolvedTsMs = nowMs)
      val (cs, bs) = call("GET", s"$base/cf-api/synced")
      assert(cs == 200 && bs.contains("\"synced\":true"), bs)
      assert(bs.contains("\"info\":\"The data syncing is finished\""), bs)

      val (c3, b3) = call("POST", s"$base/cf-api/pause")
      assert(c3 == 200 && b3.contains("paused"))
      val (_, s3) = call("GET", s"$base/cf-api/status")
      assert(s3.contains("\"state\":\"paused\""))

      // update while paused (reference UpdateChangefeed semantics)
      val (cu, bu) = call("PUT", s"$base/cf-api?rules=app.*,audit.events")
      assert(cu == 200 && bu.contains("audit.events"), bu)
      val (cu400, _) = call("PUT", s"$base/cf-api")
      assert(cu400 == 400)

      // GET exposes config.scheduler fully populated with defaults,
      // and a partial-body PUT merges over it
      // (update_changefeed_check_config)
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val (cSch, bSch) = call("GET", s"$base/cf-api")
      val sched0 = om.readTree(bSch).get("config").get("scheduler")
      assert(sched0 != null && !sched0.get("enable_table_across_nodes").asBoolean(), bSch)
      assert(sched0.get("region_threshold").asInt() == 10000)
      assert(sched0.get("region_count_refresh_interval").asLong() == 300000000000L)
      assert(sched0.get("min_traffic_percentage").asDouble() == 0.8)
      assert(cSch == 200 && sched0.size() == 11, bSch)
      val (cps, bps) = callBody("PUT", s"$base/cf-api",
        """{"replica_config":{"scheduler":{"enable_table_across_nodes":true}}}""")
      assert(cps == 200, bps)
      val sched1 = om.readTree(call("GET", s"$base/cf-api")._2)
        .get("config").get("scheduler")
      assert(sched1.get("enable_table_across_nodes").asBoolean())
      // every other knob kept its default (parquet sink: no MySQL pinning)
      assert(sched1.get("region_threshold").asInt() == 10000 &&
        !sched1.get("enable_splittable_check").asBoolean(), sched1.toString)

      // an out-of-range knob in the PUT body clamps through
      // FillMissingWithDefaults rather than erroring (the reference's
      // fill-then-validate order)
      val (cClamp, _) = callBody("PUT", s"$base/cf-api",
        """{"replica_config":{"scheduler":{"min_traffic_percentage":5.0}}}""")
      assert(cClamp == 200)
      assert(om.readTree(call("GET", s"$base/cf-api")._2)
        .get("config").get("scheduler")
        .get("min_traffic_percentage").asDouble() == 0.8)

      // VALIDATE-THEN-APPLY (advice r8): a combined rules+scheduler
      // update whose scheduler half throws must apply NEITHER — the
      // registry validates the whole update before committing any of
      // it (no partial update behind a 400)
      val rulesBefore = registry.filterRules("cf-api")
      intercept[IllegalArgumentException] {
        registry.updateFilterAndScheduler("cf-api", Some(Seq("atomic.nope")),
          Some(_ => throw new IllegalArgumentException("bad scheduler block")))
      }
      assert(registry.filterRules("cf-api") == rulesBefore,
        "rules must not half-apply when the scheduler merge fails")

      val (c4, b4) = call("POST", s"$base/cf-api/resume")
      assert(c4 == 200 && b4.contains("running"), b4)

      // update while running is a client error (400)
      val (cuRun, _) = call("PUT", s"$base/cf-api?rules=other.*")
      assert(cuRun == 400)

      // server-level surface: status/health/captures/processors
      val root = s"http://127.0.0.1:${api.boundPort}/api/v2"
      val (chs, bhs) = call("GET", s"$root/status")
      assert(chs == 200 && bhs.contains("capture-0"), bhs)
      assert(call("GET", s"$root/health")._1 == 200)
      val (cc, bc) = call("GET", s"$root/captures")
      assert(cc == 200 && bc.contains("is_owner"), bc)
      // the resumed AvailableNow query may already have drained, so
      // the processor list is either empty or holds this feed
      val (cp, bp) = call("GET", s"$root/processors")
      assert(cp == 200 && (bp == "[]" || bp.contains("cf-api")), bp)
      // dynamic log level: valid levels apply, junk rejects, GET rejects
      assert(call("POST", s"$root/log?log_level=warn")._1 == 200)
      assert(call("POST", s"$root/log?log_level=nope")._1 == 400)
      assert(call("GET", s"$root/log?log_level=WARN")._1 == 405)

      // upstream catalog: eligibility verdicts + the full table list
      val (cv, bv) = call("POST",
        s"$root/verify_table?tables=app.events_1,app.nopk")
      assert(cv == 200 && bv.contains("\"eligible\":[\"app.events_1\"]")
        && bv.contains("\"ineligible\":[\"app.nopk\"]"), bv)
      val (ca, ba) = call("POST", s"$root/get_all_tables")
      assert(ca == 200 && ba.contains("app.events_2"), ba)

      // gc safepoint: the feed blocks at its reported checkpoint, and
      // a warning report surfaces last_error in the status body
      registry.reportStatus("cf-api", 777L, Nil, 0L)
      val (cg, bg) = call("GET", s"$root/gc_safepoint")
      assert(cg == 200 && bg.contains("\"gc_safepoint\":777"), bg)
      registry.reportStatus("cf-api", 777L,
        Seq(graft.streaming.FeedError("CDC:ErrMySQLTxnError", "deadlock")), 1L)
      val (cse, bse) = call("GET", s"$base/cf-api/status")
      assert(cse == 200 && bse.contains("\"state\":\"warning\"")
        && bse.contains("\"last_error\"") && bse.contains("deadlock"), bse)
      // recover so the remaining lifecycle asserts see a clean feed
      registry.reportStatus("cf-api", 778L, Nil, 2L)

      // GetChangeFeed info + dispatcher count
      val (ci, bi) = call("GET", s"$base/cf-api")
      assert(ci == 200 && bi.contains("\"keyspace\":\"default\"")
        && bi.contains("\"filter_rules\""), bi)
      val (cd, bd) = call("GET", s"$base/cf-api/get_dispatcher_count")
      assert(cd == 200 && bd.contains("\"count\":"), bd)

      // span scheduling: move → split → list → merge
      val (cm, bm) = call("POST",
        s"$base/cf-api/move_table?schema=app&table=events_1&target=3")
      assert(cm == 200 && bm.contains("\"moved_to\":3"), bm)
      val (csp, bsp) = call("POST",
        s"$base/cf-api/split_table?schema=app&table=events_2&parts=4")
      assert(csp == 200 && bsp.contains("\"split\":4"), bsp)
      val (ct, bt) = call("GET", s"$base/cf-api/tables")
      assert(ct == 200 && bt.contains("app.events_1") && bt.contains("moved:3")
        && bt.contains("split:4"), bt)
      val (cms, bms) = call("POST",
        s"$base/cf-api/move_split_table?schema=app&table=events_3&targets=1,3")
      assert(cms == 200 && bms.contains("\"split_to\":[1,3]"), bms)
      val (_, btms) = call("GET", s"$base/cf-api/tables")
      assert(btms.contains("split_moved:1+3"), btms)
      val (cmg, _) = call("POST",
        s"$base/cf-api/merge_table?schema=app&table=events_2")
      assert(cmg == 200)
      val (_, bt2) = call("GET", s"$base/cf-api/tables")
      assert(!bt2.contains("split:4"), bt2)
      // bad split arg is a client error
      val (cbad, _) = call("POST",
        s"$base/cf-api/split_table?schema=app&table=events_2&parts=1")
      assert(cbad == 500) // handler-level require — genuine failure class

      val (c5, _) = call("DELETE", s"$base/cf-api")
      assert(c5 == 200)
      val (_, l5) = call("GET", base)
      assert(l5 == "[]")

      // unknown id is a client error (404), not a server fault
      val (c6, _) = call("GET", s"$base/ghost/status")
      assert(c6 == 404)
      val (c7, _) = call("POST", s"$base/ghost/pause")
      assert(c7 == 404)
      val (c8, _) = call("POST", s"$base/ghost/move_table?schema=a&table=b&target=0")
      assert(c8 == 404)
    } finally api.stop()
  }

  test("auth middleware (client-user-required) and node drain") {
    val tmp = Files.createTempDirectory("graft-api-auth").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))

    val registry = new ChangefeedRegistry(spark)
    val api = new ApiServer(registry,
      security = graft.model.Security.Credential(
        clientUserRequired = true, clientAllowedUser = Seq("ticdc"))).start()
    val root = s"http://127.0.0.1:${api.boundPort}/api/v2"
    val base = s"$root/changefeeds"
    val auth = basicAuth("ticdc")
    try {
      // middleware (authenticate_middleware.go:34): no header → 401,
      // disallowed user → 401, allowed user → through
      val (cNo, bNo) = call("GET", base)
      assert(cNo == 401 && bNo.contains("authorization header"), bNo)
      val (cBad, bBad) = call("GET", base, basicAuth("mallory"))
      assert(cBad == 401 && bBad.contains("not allowed"), bBad)
      assert(call("POST", s"$root/drain?target=1")._1 == 401)
      val (cOk, bOk) = call("GET", base, auth)
      assert(cOk == 200 && bOk == "[]")
      // read-only server surface stays open (health probes)
      assert(call("GET", s"$root/health")._1 == 200)

      // a feed with spans pinned on partition 2, then drain node 2
      val (cc, _) = call("POST",
        s"$base?id=cf-drain&source=$src&sink=$tmp/sink&ckpt=$tmp/ckpt&rules=app.*", auth)
      assert(cc == 201)
      registry.reportStatus("cf-drain", 500L, Nil, 1L)
      assert(call("POST",
        s"$base/cf-drain/move_table?schema=app&table=events_1&target=2", auth)._1 == 200)
      assert(call("POST",
        s"$base/cf-drain/move_split_table?schema=app&table=events_2&targets=2,3", auth)._1 == 200)
      val (cd1, bd1) = call("POST", s"$root/drain?target=2", auth)
      assert(cd1 == 200 && bd1.contains("\"moved\":2") && bd1.contains("\"remaining\":0"), bd1)
      val (_, spans) = call("GET", s"$base/cf-drain/tables", auth)
      assert(!spans.contains("moved:2") && !spans.contains("2+"), spans)
      assert(spans.contains("moved:3"), spans)
      // drain converges: second call finds nothing on the node
      val (_, bd2) = call("POST", s"$root/drain?target=2", auth)
      assert(bd2.contains("\"moved\":0"), bd2)
      // the feed kept its progress — drain never resets checkpoints
      // (gc_safepoint = min checkpoint over live feeds; it must only
      // advance across the drain: 500 before, 600 after)
      registry.reportStatus("cf-drain", 600L, Nil, 2L)
      val (_, gc) = call("GET", s"$root/gc_safepoint")
      assert(gc.contains("600"), gc)

      // bad target is a client error
      assert(call("POST", s"$root/drain?target=x", auth)._1 == 400)
    } finally {
      registry.remove("cf-drain")
      api.stop()
    }
  }

  test("TLS: https round trip with client cert; plain, rogue, and wrong-CN rejected") {
    val registry = new ChangefeedRegistry(spark)
    val api = new ApiServer(registry,
      security = TlsFixture.serverCredential(allowedCN = Seq("client"))).start()
    val url = s"https://127.0.0.1:${api.boundPort}/api/v2/status"
    def tlsCall(cred: graft.model.Security.Credential): (Int, String) = {
      val ctx = graft.model.Tls.sslContext(cred)
      val conn = new URL(url).openConnection()
        .asInstanceOf[javax.net.ssl.HttpsURLConnection]
      conn.setSSLSocketFactory(ctx.getSocketFactory)
      val code = conn.getResponseCode
      val body = Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
      conn.disconnect()
      (code, body)
    }
    try {
      // the happy path: CA-trusted client cert with an allowed CN
      val (code, body) = tlsCall(TlsFixture.clientCredential())
      assert(code == 200 && body.contains("\"is_owner\":true"), body)

      // plain HTTP against the TLS port fails the protocol
      intercept[java.io.IOException] {
        val c = new URL(s"http://127.0.0.1:${api.boundPort}/api/v2/status")
          .openConnection().asInstanceOf[HttpURLConnection]
        c.setConnectTimeout(5000); c.setReadTimeout(5000)
        assert(c.getResponseCode != 200)
      }

      // a client signed by an unrelated CA fails the handshake
      intercept[java.io.IOException](
        tlsCall(TlsFixture.clientCredential(
          cert = "rogue-client.pem", key = "rogue-client-key.pem")))

      // a CA-trusted client whose CN is not allowed fails too
      // (cert-allowed-cn enforced at handshake, credential.go:214)
      intercept[java.io.IOException](
        tlsCall(TlsFixture.clientCredential(
          cert = "client-other.pem", key = "client-other-key.pem")))
    } finally api.stop()
  }

  test("TLS + user auth combined: client cert AND Basic credentials both " +
      "required (http_api_tls_with_user_auth)") {
    val registry = new ChangefeedRegistry(spark)
    val api = new ApiServer(registry,
      security = TlsFixture.serverCredential(allowedCN = Seq("client")).copy(
        clientUserRequired = true, clientAllowedUser = Seq("ticdc"))).start()
    val url = s"https://127.0.0.1:${api.boundPort}/api/v2/changefeeds"
    def tlsCall(headers: Map[String, String]): (Int, String) = {
      val ctx = graft.model.Tls.sslContext(TlsFixture.clientCredential())
      val conn = new URL(url).openConnection()
        .asInstanceOf[javax.net.ssl.HttpsURLConnection]
      conn.setSSLSocketFactory(ctx.getSocketFactory)
      conn.setRequestMethod("GET")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val code = conn.getResponseCode
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body = Source.fromInputStream(stream, "UTF-8").mkString
      conn.disconnect()
      (code, body)
    }
    try {
      // valid cert but no Basic credentials → 401 from the middleware
      val (c1, b1) = tlsCall(Map.empty)
      assert(c1 == 401 && b1.contains("authorization"), s"$c1 $b1")
      // valid cert + disallowed user → 401
      val (c2, _) = tlsCall(basicAuth("stranger"))
      assert(c2 == 401)
      // valid cert + allowed user → 200 through both gates
      val (c3, b3) = tlsCall(basicAuth("ticdc"))
      assert(c3 == 200 && b3 == "[]", s"$c3 $b3")
    } finally api.stop()
  }

  test("resume with overwrite_checkpoint_ts re-replicates from the rewritten " +
      "checkpoint (changefeed_resume_with_checkpoint_ts)") {
    val tmp = Files.createTempDirectory("graft-owckpt").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val registry = new ChangefeedRegistry(spark)
    val api = new ApiServer(registry).start()
    val base = s"http://127.0.0.1:${api.boundPort}/api/v2/changefeeds"
    try {
      val (c1, _) = call("POST",
        s"$base?id=cf-ow&source=$src&sink=$tmp/sink&ckpt=$tmp/ckpt")
      assert(c1 == 201)
      // drain batch 1
      val deadline = System.currentTimeMillis() + 120000
      def sinkRows(): Long =
        try spark.read.parquet(s"$tmp/sink").count()
        catch { case _: Throwable => 0L }
      while (registry.list.nonEmpty &&
        registry.status("cf-ow")._2 == "running" &&
        System.currentTimeMillis() < deadline) Thread.sleep(300)
      val n1 = sinkRows()
      assert(n1 > 0)
      call("POST", s"$base/cf-ow/pause")

      // a malformed overwrite is a client error
      assert(call("POST", s"$base/cf-ow/resume?overwrite_checkpoint_ts=abc")._1 == 400)

      // overwrite BELOW every commit ts → the whole log re-replicates
      // (rows duplicate: that IS the semantic - replication restarts
      // from the rewritten checkpoint)
      val (c2, _) = call("POST", s"$base/cf-ow/resume?overwrite_checkpoint_ts=1")
      assert(c2 == 200)
      val d2 = System.currentTimeMillis() + 120000
      while (sinkRows() < 2 * n1 && System.currentTimeMillis() < d2)
        Thread.sleep(300)
      assert(sinkRows() == 2 * n1,
        s"full re-replication doubles the sink (${sinkRows()} vs 2x$n1)")

      // pause + overwrite ABOVE every commit ts → nothing re-emits
      call("POST", s"$base/cf-ow/pause")
      val maxTs = spark.read.parquet(src).count() // rows exist; use a huge ts
      val (c3, _) = call("POST",
        s"$base/cf-ow/resume?overwrite_checkpoint_ts=${Long.MaxValue - 1}")
      assert(c3 == 200 && maxTs > 0)
      // wait for that run to drain
      val d3 = System.currentTimeMillis() + 120000
      while (registry.status("cf-ow")._2 == "running" &&
        System.currentTimeMillis() < d3) Thread.sleep(300)
      assert(sinkRows() == 2 * n1, "floor above all commits suppresses everything")
    } finally {
      try registry.remove("cf-ow") catch { case _: Throwable => () }
      api.stop()
    }
  }

  test("GET /synced returns the full SyncedStatus body with JSONTime clocks " +
      "(synced_status)") {
    val tmp = Files.createTempDirectory("graft-syncapi").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val registry = new ChangefeedRegistry(spark)
    val api = new ApiServer(registry).start()
    val base = s"http://127.0.0.1:${api.boundPort}/api/v2/changefeeds"
    try {
      val (c1, _) = call("POST",
        s"$base?id=cf-sy&source=$src&sink=$tmp/sink&ckpt=$tmp/ckpt")
      assert(c1 == 201)
      val deadline = System.currentTimeMillis() + 120000
      while (registry.status("cf-sy")._2 == "running" &&
        System.currentTimeMillis() < deadline) Thread.sleep(300)

      val (code, body) = call("GET", s"$base/cf-sy/synced")
      assert(code == 200, body)
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      // all six SyncedStatus fields (api/v2 model.go:1374-1382)
      for (k <- Seq("synced", "sink_checkpoint_ts", "puller_resolved_ts",
        "last_synced_ts", "now_ts", "info")) assert(node.has(k), s"missing $k: $body")
      // clocks in the reference's JSONTime text form
      val stamp = """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}""".r
      for (k <- Seq("sink_checkpoint_ts", "puller_resolved_ts",
        "last_synced_ts", "now_ts"))
        assert(stamp.matches(node.get(k).asText()), s"$k: ${node.get(k).asText()}")
      // now_ts is second-resolution, like time.Unix(ts/1e3, 0)
      assert(node.get("now_ts").asText().endsWith(".000"))

      // no sync reports yet: idle + stale checkpoint + tiny puller gap
      // -> not synced with the upstream-health hint
      assert(!node.get("synced").asBoolean())
      assert(node.get("info").asText().startsWith("Please check whether PD is online"))

      // a fresh checkpoint with old data flips it to strictly synced
      val now = System.currentTimeMillis()
      registry.reportSyncState("cf-sy", checkpointTsMs = now,
        lastSyncedTsMs = now - 400000L, pullerResolvedTsMs = now)
      val (_, body2) = call("GET", s"$base/cf-sy/synced")
      val node2 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body2)
      assert(node2.get("synced").asBoolean(), body2)
      assert(node2.get("info").asText() == "The data syncing is finished")
    } finally {
      try registry.remove("cf-sy") catch { case _: Throwable => () }
      api.stop()
    }
  }

  test("api v1 legacy surface: delegates to the v2 handlers with the " +
      "from-ticdc-api-v1 marker; old-arch table ops and capture drain work") {
    val tmp = Files.createTempDirectory("graft-apiv1").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val registry = new ChangefeedRegistry(spark)
    val api = new ApiServer(registry).start()
    val host = s"http://127.0.0.1:${api.boundPort}"
    def callHdr(method: String, url: String): (Int, String, String) = {
      val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod(method)
      val code = conn.getResponseCode
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body = Source.fromInputStream(stream, "UTF-8").mkString
      val mark = String.valueOf(conn.getHeaderField("from-ticdc-api-v1"))
      conn.disconnect()
      (code, body, mark)
    }
    try {
      // create through v1, list through v1 — the v2 handler shapes,
      // plus the v1 marker on every response
      val (c1, b1, m1) = callHdr("POST",
        s"$host/api/v1/changefeeds?id=cf-v1&source=$src&sink=$tmp/sink&ckpt=$tmp/ckpt&rules=app.*")
      assert(c1 == 201 && b1.contains("\"cf-v1\"") && m1 == "true", s"$c1 $b1 $m1")
      val (c2, b2, m2) = callHdr("GET", s"$host/api/v1/changefeeds")
      assert(c2 == 200 && b2 == "[\"cf-v1\"]" && m2 == "true")
      // server-level delegates
      val (c3, b3, m3) = callHdr("GET", s"$host/api/v1/status")
      assert(c3 == 200 && b3.contains("\"is_owner\":true") && m3 == "true")
      assert(callHdr("GET", s"$host/api/v1/health")._1 == 200)
      assert(callHdr("GET", s"$host/api/v1/captures")._2.contains("capture-0"))
      assert(callHdr("GET", s"$host/api/v1/processors")._1 == 200)
      // drain the feed before mutating placements
      val deadline = System.currentTimeMillis() + 120000
      var emitted = 0L
      while (emitted == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        val (_, s) = call("GET", s"$host/api/v1/changefeeds/cf-v1/status")
        val m = "\"emitted\":(\\d+)".r.findFirstMatchIn(s)
        emitted = m.map(_.group(1).toLong).getOrElse(0L)
      }
      assert(emitted > 0, "v1 status must report the drained feed")
      call("POST", s"$host/api/v1/changefeeds/cf-v1/pause")
      // old-arch move_table: capture-2 pins worker partition 2
      val (mc, mb) = callBody("POST",
        s"$host/api/v1/changefeeds/cf-v1/tables/move_table",
        """{"schema":"app","table":"events_0","capture_id":"capture-2"}""")
      assert(mc == 202, s"$mc $mb")
      assert(registry.tableSpans("cf-v1") == Seq(("app.events_0", "moved:2")))
      // rebalance drops every placement back to the default rule
      val (rc, _) = callBody("POST",
        s"$host/api/v1/changefeeds/cf-v1/tables/rebalance_table", "{}")
      assert(rc == 202 && registry.tableSpans("cf-v1").isEmpty)
      // owner resign bumps the epoch, observable through v1 status
      val epoch0 = "\"epoch\":(\\d+)".r.findFirstMatchIn(b3).get.group(1).toLong
      assert(callHdr("POST", s"$host/api/v1/owner/resign")._1 == 200)
      val (_, b4, _) = callHdr("GET", s"$host/api/v1/status")
      assert("\"epoch\":(\\d+)".r.findFirstMatchIn(b4).get.group(1).toLong == epoch0 + 1)
      // v1 drain-capture PUT with the capture_id body
      val (dc, db) = callBody("PUT", s"$host/api/v1/captures/drain",
        """{"capture_id":"capture-1"}""")
      assert(dc == 202 && db.contains("current_table_count"), s"$dc $db")
      // delete through v1
      assert(callHdr("DELETE", s"$host/api/v1/changefeeds/cf-v1")._1 == 200)
      assert(call("GET", s"$host/api/v1/changefeeds")._2 == "[]")
    } finally {
      try registry.remove("cf-v1") catch { case _: Throwable => () }
      api.stop()
    }
  }
}
