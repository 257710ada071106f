package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.model.{ChangefeedConfig, FilterConfig}

/** API v2 HTTP front-end (SURVEY §2.14; reference api/v2/api.go:39-106
  * — changefeed CRUD :61-71, pause/resume :69-70, status/synced
  * :72-73) — a thin JSON surface over [[ChangefeedRegistry]], served
  * by the JDK's built-in HttpServer (zero dependencies, driver-side
  * only — the control plane is not a data-path concern).
  *
  * Routes:
  *   GET    /api/v2/changefeeds                → ["id", ...]
  *   POST   /api/v2/changefeeds?id=&source=&sink=&ckpt=[&rules=a.b,c.*]
  *   GET    /api/v2/changefeeds/{id}/status    → {"id","state","emitted"}
  *   POST   /api/v2/changefeeds/{id}/pause
  *   POST   /api/v2/changefeeds/{id}/resume
  *   DELETE /api/v2/changefeeds/{id}
  *   PUT    /api/v2/changefeeds/{id}?rules=a.b,c.*   (paused only)
  *   POST   /api/v2/changefeeds/{id}/move_table?schema=&table=&target=N
  *   POST   /api/v2/changefeeds/{id}/split_table?schema=&table=&parts=N
  *   POST   /api/v2/changefeeds/{id}/merge_table?schema=&table=
  *   GET    /api/v2/changefeeds/{id}/tables    → span placements
  *   GET    /api/v2/status | /health | /captures | /processors
  * (span routes: api/v2/api.go:76-81 move_table /
  * split_table_by_region_count / merge_table / ListTables; server
  * surface api/v2/api.go:39,:58,:84-98.)
  *
  * Unknown changefeed ids answer 404 (the reference's 4xx), keeping
  * 500 for genuine handler failures.
  */
/** Upstream table catalog backing verify_table / get_all_tables
  * (api/v2/api.go:88-91): `all` lists replicable tables, `eligible`
  * answers the reference's PK/non-null-UK check (VerifyTable) —
  * backed by whatever schema source the embedder has (SchemaRegistry,
  * information_schema, a static list). */
final case class TableCatalog(all: () => Seq[(String, String)],
                              eligible: (String, String) => Boolean)

class ApiServer(registry: ChangefeedRegistry, port: Int = 0,
                catalog: Option[TableCatalog] = None,
                security: graft.model.Security.Credential = graft.model.Security.Credential(),
                metrics: Option[MetricsCollector] = None) {

  // TLS when the credential carries the PEM trio (http_api_tls /
  // cli_tls_with_auth): the same server surface behind HTTPS, client
  // certs required whenever mTLS or a cert-allowed-cn list is
  // configured, CN verified at handshake (Tls.serverSslContext)
  private val server: HttpServer =
    if (security.isTlsEnabled) {
      val s = com.sun.net.httpserver.HttpsServer.create(
        new InetSocketAddress("127.0.0.1", port), 0)
      val ctx = graft.model.Tls.serverSslContext(security)
      val needClientAuth = security.mtls || security.certAllowedCN.nonEmpty
      s.setHttpsConfigurator(new com.sun.net.httpserver.HttpsConfigurator(ctx) {
        override def configure(
            params: com.sun.net.httpserver.HttpsParameters): Unit = {
          val p = ctx.getDefaultSSLParameters
          if (needClientAuth) p.setNeedClientAuth(true)
          params.setSSLParameters(p)
        }
      })
      s
    } else HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort

  /** Basic-auth gate (api/middleware/authenticate_middleware.go:34):
    * when `client-user-required` is on, every API request must carry
    * Basic credentials with an allowed username — the reference
    * verifies the password against upstream TiDB, which this sandbox
    * has no analog for, so the allowed-user check is the enforced
    * half. Returns None when authorized, or the 401 body. */
  private def authError(ex: HttpExchange): Option[String] = {
    if (!security.clientUserRequired) None
    else {
      val header = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      if (!header.startsWith("Basic ")) {
        Some("""{"error":"please specify the user and password via authorization header"}""")
      } else {
        val decoded = new String(
          java.util.Base64.getDecoder.decode(header.stripPrefix("Basic ").trim),
          StandardCharsets.UTF_8)
        val user = decoded.split(":", 2).head
        if (security.clientAllowedUser.contains(user)) None
        else Some(s"""{"error":"The user is not allowed.","user":${jsonString(user)}}""")
      }
    }
  }

  /** Wrap a handler with the auth middleware. */
  private def authed(handler: HttpExchange => Unit): HttpExchange => Unit =
    ex => authError(ex) match {
      case Some(body) => respond(ex, 401, body)
      case None => handler(ex)
    }

  private def jsonString(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** The reference's api.JSONTime wire form: a quoted
    * "2006-01-02 15:04:05.000" stamp in the server's zone
    * (tests/integration_tests/api_v2/model.go:23-32). */
  private val jsonTimeFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
    .withZone(java.time.ZoneId.systemDefault())
  private def jsonTime(ms: Long): String =
    "\"" + jsonTimeFmt.format(java.time.Instant.ofEpochMilli(ms)) + "\""

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).map(_.split("&").toSeq
      .flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
          case _ => None
        }
      }.toMap).getOrElse(Map.empty)

  /** SAM bridge so wrapped `HttpExchange => Unit` values register. */
  private def handler(f: HttpExchange => Unit): com.sun.net.httpserver.HttpHandler =
    (ex: HttpExchange) => f(ex)

  // orderly node evacuation (controller_drain.go:139 DrainNode; the
  // api v2 drain flow): move every pinned span off `target`; the
  // response's `remaining` converges to 0 for the reference's poll
  // loop (mutating → behind the auth middleware)
  server.createContext("/api/v2/drain", handler(authed(ex => {
    if (ex.getRequestMethod != "POST")
      respond(ex, 405, """{"error":"POST required"}""")
    else queryParams(ex).get("target").flatMap(_.toIntOption) match {
      case None => respond(ex, 400, """{"error":"integer target required"}""")
      case Some(t) =>
        val moved = registry.drainNode(t)
        respond(ex, 200, s"""{"moved":$moved,"remaining":0}""")
    }
  })))

  server.createContext("/api/v2/changefeeds",
    handler(authed(changefeedRoutes("/api/v2/changefeeds", v1 = false))))

  /** The changefeed route table, shared by /api/v2 and the legacy
    * /api/v1 group — the reference wires v1 straight onto the v2
    * handlers (api/v1/api.go:53-98); only the old-arch table ops are
    * v1-specific. */
  private def changefeedRoutes(prefix: String, v1: Boolean)
      : HttpExchange => Unit = ex => {
    try {
      val path = ex.getRequestURI.getPath.stripPrefix(prefix)
        .stripPrefix("/").split("/").filter(_.nonEmpty).toSeq
      (ex.getRequestMethod, path) match {
        // unknown changefeed id → 404 (the reference's 4xx), before
        // any handler can raise on it
        case (_, id +: _) if !registry.exists(id) =>
          respond(ex, 404, s"""{"error":"changefeed not found","id":${jsonString(id)}}""")

        case ("GET", Seq()) =>
          respond(ex, 200, registry.list.map(jsonString).mkString("[", ",", "]"))

        case ("POST", Seq()) =>
          val p = queryParams(ex)
          (p.get("id"), p.get("source"), p.get("sink"), p.get("ckpt")) match {
            case (Some(id), Some(src), Some(sink), Some(ckpt)) =>
              // a JSON body is the full v2 replica-config model
              // (reference POST /api/v2/changefeeds body); bare query
              // params remain the minimal rules-only form
              val body = scala.io.Source.fromInputStream(
                ex.getRequestBody, "UTF-8").mkString
              val cfgOrErr: Either[String, ChangefeedConfig] =
                if (body.trim.nonEmpty)
                  try Right(graft.model.ConfigToml.fromApiJson(body).copy(id = id))
                  catch { case e: Exception => Left(String.valueOf(e.getMessage)) }
                else {
                  val rules = p.get("rules").map(_.split(",").toSeq)
                    .getOrElse(Seq("*.*"))
                  Right(ChangefeedConfig(id = id, filter = FilterConfig(rules = rules)))
                }
              cfgOrErr match {
                case Left(msg) => respond(ex, 400,
                  s"""{"error":"bad replica config","detail":${jsonString(msg)}}""")
                case Right(cfg) =>
                  // an explicit keyspace param wins over the body's
                  // (the CLI's --keyspace / -k carrier)
                  val withKs = p.get("keyspace")
                    .map(k => cfg.copy(keyspace = k)).getOrElse(cfg)
                  registry.create(withKs, src, sink, ckpt)
                  respond(ex, 201, s"""{"id":${jsonString(id)},"state":"running"}""")
              }
            case _ =>
              respond(ex, 400, """{"error":"id, source, sink, ckpt required"}""")
          }

        case ("GET", Seq(id, "status")) =>
          val (_, state, n) = registry.status(id)
          // last running error rides along like the reference's
          // ChangefeedStatus.LastError (api/v2 model.go)
          // error text may embed row values (a failed statement) — it
          // rides through the redaction mode like every reference log line
          val err = registry.lastError(id).map(e =>
            s""","last_error":{"code":${jsonString(e.code)},"message":${
              jsonString(graft.model.Redact(e.message))}}""")
            .getOrElse("")
          respond(ex, 200,
            s"""{"id":${jsonString(id)},"state":${jsonString(state)},"emitted":$n$err}""")

        case ("GET", Seq(id, "synced")) =>
          // full SyncedStatus body (api/v2/changefeed.go:1634-1730,
          // model.go:1374); clocks render in the reference's JSONTime
          // text form ("2006-01-02 15:04:05.000"), now_ts at second
          // resolution exactly like time.Unix(ts/1e3, 0)
          val st = registry.syncedStatus(id, System.currentTimeMillis())
          respond(ex, 200,
            s"""{"synced":${st.synced},""" +
              s""""sink_checkpoint_ts":${jsonTime(st.sinkCheckpointTsMs)},""" +
              s""""puller_resolved_ts":${jsonTime(st.pullerResolvedTsMs)},""" +
              s""""last_synced_ts":${jsonTime(st.lastSyncedTsMs)},""" +
              s""""now_ts":${jsonTime(st.nowMs / 1000L * 1000L)},""" +
              s""""info":${jsonString(st.info)}}""")

        case ("POST", Seq(id, "pause")) =>
          registry.pause(id)
          respond(ex, 200, s"""{"id":${jsonString(id)},"state":"paused"}""")

        case ("POST", Seq(id, "resume")) =>
          // overwrite_checkpoint_ts: query param or JSON body field
          // (api/v2 model.go:90); "now" = the current TSO instant
          val raw = queryParams(ex).get("overwrite_checkpoint_ts")
            .orElse(bodyField(ex, "overwrite_checkpoint_ts"))
          val overwrite: Either[String, Option[Long]] = raw match {
            case None => Right(None)
            case Some("now") => Right(Some(System.currentTimeMillis() * 1000000L))
            case Some(v) => v.toLongOption.filter(_ > 0)
              .map(ts => Right(Some(ts)))
              .getOrElse(Left(s"bad overwrite_checkpoint_ts: $v"))
          }
          overwrite match {
            case Left(msg) => respond(ex, 400, s"""{"error":${jsonString(msg)}}""")
            case Right(ow) =>
              registry.resume(id, ow)
              respond(ex, 200, s"""{"id":${jsonString(id)},"state":"running"}""")
          }

        case ("DELETE", Seq(id)) =>
          registry.remove(id)
          respond(ex, 200, s"""{"id":${jsonString(id)},"state":"removed"}""")

        case ("POST", Seq(id, "move_table")) =>
          val p = queryParams(ex)
          (p.get("schema"), p.get("table"), p.get("target").map(_.toInt)) match {
            case (Some(s), Some(t), Some(target)) =>
              registry.moveTable(id, s, t, target)
              respond(ex, 200,
                s"""{"id":${jsonString(id)},"table":${jsonString(s"$s.$t")},"moved_to":$target}""")
            case _ => respond(ex, 400, """{"error":"schema, table, target required"}""")
          }

        case ("POST", Seq(id, "split_table")) =>
          val p = queryParams(ex)
          (p.get("schema"), p.get("table"), p.get("parts").map(_.toInt)) match {
            case (Some(s), Some(t), Some(parts)) =>
              registry.splitTable(id, s, t, parts)
              respond(ex, 200,
                s"""{"id":${jsonString(id)},"table":${jsonString(s"$s.$t")},"split":$parts}""")
            case _ => respond(ex, 400, """{"error":"schema, table, parts required"}""")
          }

        case ("POST", Seq(id, "move_split_table")) =>
          val p = queryParams(ex)
          (p.get("schema"), p.get("table"),
            p.get("targets").map(_.split(",").toSeq.filter(_.nonEmpty).map(_.toInt))) match {
            case (Some(s), Some(t), Some(targets)) if targets.nonEmpty =>
              registry.moveSplitTable(id, s, t, targets)
              respond(ex, 200,
                s"""{"id":${jsonString(id)},"table":${jsonString(s"$s.$t")},""" +
                  s""""split_to":[${targets.mkString(",")}]}""")
            case _ => respond(ex, 400, """{"error":"schema, table, targets required"}""")
          }

        case ("POST", Seq(id, "merge_table")) =>
          val p = queryParams(ex)
          (p.get("schema"), p.get("table")) match {
            case (Some(s), Some(t)) =>
              registry.mergeTable(id, s, t)
              respond(ex, 200,
                s"""{"id":${jsonString(id)},"table":${jsonString(s"$s.$t")},"state":"merged"}""")
            case _ => respond(ex, 400, """{"error":"schema, table required"}""")
          }

        case ("GET", Seq(id, "tables")) =>
          val body = registry.tableSpans(id).map { case (t, r) =>
            s"""{"table":${jsonString(t)},"placement":${jsonString(r)}}"""
          }.mkString("[", ",", "]")
          respond(ex, 200, body)

        // GetChangeFeed info (api/v2/api.go:61): definition + state;
        // config.scheduler rides along fully populated — the shape
        // update_changefeed_check_config diffs with jq
        case ("GET", Seq(id)) =>
          val cfg = registry.config(id)
          val (_, state, _) = registry.status(id)
          respond(ex, 200,
            s"""{"id":${jsonString(id)},"state":${jsonString(state)},""" +
              s""""keyspace":${jsonString(cfg.keyspace)},""" +
              s""""filter_rules":${cfg.filter.rules.map(jsonString).mkString("[", ",", "]")},""" +
              s""""target_ts":${cfg.targetTs.map(_.toString).getOrElse("null")},""" +
              s""""sink_partitions":${cfg.sink.numPartitions},""" +
              s""""config":{"scheduler":${
                graft.model.ConfigToml.schedulerJson(cfg.scheduler)}}}""")

        // dispatcher count = sink worker partitions + per-table span
        // rules (get_dispatcher_count, api/v2/api.go:80)
        case ("GET", Seq(id, "get_dispatcher_count")) =>
          val cfg = registry.config(id)
          respond(ex, 200,
            s"""{"count":${cfg.sink.numPartitions + cfg.sink.dispatch.size}}""")

        // reference UpdateChangefeed (api/v2/api.go:68): rules update
        // and/or a partial replica_config.scheduler merge, only while
        // paused; IllegalArgument surfaces as 400
        case ("PUT", Seq(id)) =>
          // an EMPTY rule list would silently filter out every row
          // (TableMatcher: no rule matches nothing) — reject it like
          // the absent-param case instead of configuring a black hole
          val rulesOpt = queryParams(ex).get("rules")
            .map(_.split(",").toSeq.filter(_.nonEmpty)).filter(_.nonEmpty)
          val bodyText =
            scala.io.Source.fromInputStream(ex.getRequestBody, "UTF-8").mkString
          // keys present in the body merge over the stored block, like
          // the reference unmarshalling the PUT onto the old config
          // (update_changefeed_check_config)
          val schedNode =
            if (bodyText.trim.isEmpty) None
            else try {
              val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bodyText)
              Option(n.get("replica_config")).flatMap(rc => Option(rc.get("scheduler")))
                .orElse(Option(n.get("scheduler")))
            } catch { case _: Exception => None }
          if (rulesOpt.isEmpty && schedNode.isEmpty)
            respond(ex, 400, """{"error":"rules or replica_config required"}""")
          else try {
            // validate-then-apply: both halves commit atomically, so a
            // scheduler 400 cannot leave a half-applied rules change
            registry.updateFilterAndScheduler(id, rulesOpt,
              schedNode.map(sn => (base: graft.model.SchedulerConfig) =>
                graft.model.ConfigToml.schedulerFromJson(sn, base)))
            respond(ex, 200, s"""{"id":${jsonString(id)},"rules":${
              registry.filterRules(id).map(jsonString).mkString("[", ",", "]")
            },"scheduler":${
              graft.model.ConfigToml.schedulerJson(registry.config(id).scheduler)}}""")
          } catch {
            case e: IllegalArgumentException =>
              respond(ex, 400, s"""{"error":${jsonString(String.valueOf(e.getMessage))}}""")
          }

        // legacy old-arch table ops, v1 only (api/v1/api.go:78-80 —
        // "implemented for compatibility with old arch cdc only"):
        // move_table pins the span to the capture named in the body
        // (capture-N → worker partition N in the single-capture
        // model); rebalance_table drops every placement back to the
        // default rule — the scheduler's own re-balance target
        case ("POST", Seq(id, "tables", "move_table")) if v1 =>
          val bodyText = scala.io.Source.fromInputStream(
            ex.getRequestBody, "UTF-8").mkString
          val n = try Some(new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(bodyText)) catch { case _: Exception => None }
          def f(k: String) = n.flatMap(x =>
            Option(x.get(k)).map(_.asText()).filter(_.nonEmpty))
          (f("schema"), f("table"),
            f("capture_id").flatMap(_.stripPrefix("capture-").toIntOption)) match {
            case (Some(s), Some(t), Some(target)) =>
              registry.moveTable(id, s, t, target)
              respond(ex, 202, "{}")
            case _ =>
              respond(ex, 400, """{"error":"schema, table, capture_id required"}""")
          }

        case ("POST", Seq(id, "tables", "rebalance_table")) if v1 =>
          registry.tableSpans(id).foreach { case (span, _) =>
            // skip malformed span keys (no dot) instead of 500ing
            // mid-iteration with some spans merged and others not
            span.split("\\.", 2) match {
              case Array(s, t) => registry.mergeTable(id, s, t)
              case _ => ()
            }
          }
          respond(ex, 202, "{}")

        case _ =>
          respond(ex, 404, """{"error":"not found"}""")
      }
    } catch {
      case e: Throwable =>
        respond(ex, 500, s"""{"error":${jsonString(String.valueOf(e.getMessage))}}""")
    }
  }

  /** Read a JSON request body field (Jackson — the same dependency the
    * config carrier uses). None when absent or the body isn't JSON. */
  private def bodyField(ex: HttpExchange, field: String): Option[String] = {
    val body = scala.io.Source.fromInputStream(ex.getRequestBody, "UTF-8").mkString
    if (body.trim.isEmpty) None
    else try {
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      Option(n.get(field)).map(_.asText()).filter(_.trim.nonEmpty)
    } catch { case _: Exception => None }
  }

  // dynamic fault injection (api/v2/api.go:51-53 + failpoint.go:73-140):
  // POST enables name+expr, DELETE disables (name via query or body),
  // GET lists enabled points sorted by name
  server.createContext("/debug/failpoints", handler(ex => {
    ex.getRequestMethod match {
      case "POST" =>
        val body = scala.io.Source.fromInputStream(ex.getRequestBody, "UTF-8").mkString
        val (name, expr) =
          try {
            val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
            (Option(n.get("name")).map(_.asText("").trim).getOrElse(""),
              Option(n.get("expr")).map(_.asText("").trim).getOrElse(""))
          } catch { case _: Exception => ("", "") }
        if (name.isEmpty || expr.isEmpty)
          respond(ex, 400, """{"error":"name and expr are required"}""")
        else
          try { Failpoints.enable(name, expr); respond(ex, 200, "{}") }
          catch {
            case e: IllegalArgumentException =>
              // reference: failpoint.Enable error → HTTP 500
              respond(ex, 500, s"""{"error":${jsonString(String.valueOf(e.getMessage))}}""")
          }
      case "DELETE" =>
        val name = queryParams(ex).get("name").map(_.trim).filter(_.nonEmpty)
          .orElse(bodyField(ex, "name"))
        name match {
          case None => respond(ex, 400, """{"error":"name is required"}""")
          case Some(n) => Failpoints.disable(n); respond(ex, 200, "{}")
        }
      case "GET" =>
        respond(ex, 200, Failpoints.list.map { case (n, e) =>
          s"""{"name":${jsonString(n)},"expr":${jsonString(e)}}"""
        }.mkString("[", ",", "]"))
      case _ => respond(ex, 405, """{"error":"method not allowed"}""")
    }
  }))

  // Prometheus scrape endpoint (api/http.go:54 router.Any("/metrics",
  // promhttp.Handler()) — unauthenticated in the reference, same
  // here). Text format 0.0.4; family names mirror pkg/metrics.
  server.createContext("/metrics", (ex: HttpExchange) => {
    val body = Prometheus.render(registry, metrics)
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      "text/plain; version=0.0.4; charset=utf-8")
    ex.sendResponseHeaders(200, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  })

  // /debug/info (api/v2/api.go:46 handleDebugInfo): human-oriented
  // dump — feeds, placements, failpoints, owner epoch
  server.createContext("/debug/info", (ex: HttpExchange) => {
    val feeds = registry.list.map { id =>
      val (_, state, n) = registry.status(id)
      s"  $id state=$state emitted=$n spans=${registry.tableSpans(id).mkString(",")}"
    }.mkString("\n")
    val fps = Failpoints.list.map { case (n, e) => s"  $n=$e" }.mkString("\n")
    val body = s"owner epoch ${registry.ownerEpoch}\nchangefeeds:\n$feeds\nfailpoints:\n$fps\n"
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain")
    ex.sendResponseHeaders(200, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  })

  // owner resign (api/v2/api.go:103 + coordinator.go:29): the single
  // in-process capture re-campaigns immediately — observable as the
  // epoch bump in /api/v2/status
  server.createContext("/api/v2/owner/resign", handler(ex =>
    if (ex.getRequestMethod != "POST")
      respond(ex, 405, """{"error":"POST required"}""")
    else { registry.resignOwner(); respond(ex, 200, "{}") }))

  // current TSO (api/v2/api.go:106 + tso.go QueryTso): physical ms +
  // logical counter, the placement driver's clock
  private val tsoLogical = new java.util.concurrent.atomic.AtomicLong(0L)
  server.createContext("/api/v2/tso", handler(ex =>
    if (ex.getRequestMethod != "POST")
      respond(ex, 405, """{"error":"POST required"}""")
    else respond(ex, 200,
      s"""{"timestamp":${System.currentTimeMillis()},"logic_time":${
        tsoLogical.incrementAndGet()}}""")))

  // unsafe group (api/v2/api.go:109-113; authenticated in the
  // reference — same here): metadata dump, lock resolution, GC
  // safepoint removal
  server.createContext("/api/v2/unsafe/metadata", handler(authed(ex =>
    respond(ex, 200, registry.metadataDump.map { case (k, v) =>
      s"""{"key":${jsonString(k)},"value":${jsonString(v)}}"""
    }.mkString("[", ",", "]")))))
  server.createContext("/api/v2/unsafe/resolve_lock", handler(authed(ex =>
    if (ex.getRequestMethod != "POST")
      respond(ex, 405, """{"error":"POST required"}""")
    else {
      // the reference resolves stale TiKV locks at (region_id, ts) via
      // a store RPC (unsafe.go:66 + txnutil). No separate KV store
      // exists here — committed data is the only upstream — so the
      // modeled surface is the validated request contract; a live
      // deployment would wire this to its source's lock resolver.
      val body = scala.io.Source.fromInputStream(ex.getRequestBody, "UTF-8").mkString
      val (region, ts) =
        try {
          val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
          (Option(n.get("region_id")).map(_.asLong()),
            Option(n.get("ts")).map(_.asLong()))
        } catch { case _: Exception => (None, None) }
      (region, ts) match {
        case (Some(_), Some(_)) => respond(ex, 200, "{}")
        case _ => respond(ex, 400, """{"error":"region_id and ts are required"}""")
      }
    })))
  server.createContext("/api/v2/unsafe/service_gc_safepoint", handler(authed(ex =>
    if (ex.getRequestMethod != "DELETE")
      respond(ex, 405, """{"error":"DELETE required"}""")
    else { registry.deleteServiceGcSafepoint(); respond(ex, 200, "{}") })))

  // redaction mode (api/v2/api.go:41 + log.go:86 SetRedactMode):
  // upgrade-only transition, previous/current echoed back
  server.createContext("/api/v2/log/redact", handler(authed(ex =>
    if (ex.getRequestMethod != "POST")
      respond(ex, 405, """{"error":"POST required"}""")
    else bodyField(ex, "redact_info_log")
        .orElse(queryParams(ex).get("redact_info_log")) match {
      case None => respond(ex, 400,
        """{"error":"missing required field 'redact_info_log': must be 'off', 'on', or 'marker'"}""")
      case Some(m) => graft.model.Redact.set(m) match {
        case Left(err) => respond(ex, 400, s"""{"error":${jsonString(err)}}""")
        case Right(prev) => respond(ex, 200,
          s"""{"previous_mode":${jsonString(prev)},"current_mode":${
            jsonString(graft.model.Redact.current)}}""")
      }
    })))

  // server-level surface (api/v2/api.go:39,:58,:84-98): status,
  // health, the single in-process capture, processors = running feeds
  server.createContext("/api/v2/status", (ex: HttpExchange) =>
    respond(ex, 200,
      s"""{"version":"graft","id":"capture-0","is_owner":true,"epoch":${registry.ownerEpoch}}"""))
  server.createContext("/api/v2/health", (ex: HttpExchange) =>
    respond(ex, 200, "{}"))
  // dynamic log level (api/v2/api.go:40 SetLogLevel) — maps straight
  // onto the engine's runtime log control (mutating → authed)
  private def setLogLevelRoute(ex: HttpExchange): Unit = {
    val lvl = queryParams(ex).getOrElse("log_level", "").toUpperCase
    if (ex.getRequestMethod != "POST")
      respond(ex, 405, """{"error":"POST required"}""")
    else if (!Seq("ALL", "DEBUG", "ERROR", "FATAL", "INFO", "OFF", "TRACE", "WARN")
        .contains(lvl))
      respond(ex, 400, s"""{"error":"bad log_level","got":${jsonString(lvl)}}""")
    else {
      registry.spark.sparkContext.setLogLevel(lvl)
      respond(ex, 200, "{}")
    }
  }
  server.createContext("/api/v2/log", handler(authed(setLogLevelRoute)))
  server.createContext("/api/v2/captures", (ex: HttpExchange) =>
    respond(ex, 200,
      s"""[{"id":"capture-0","is_owner":true,"address":"127.0.0.1:$boundPort"}]"""))
  server.createContext("/api/v2/processors", (ex: HttpExchange) =>
    respond(ex, 200, registry.runningFeeds.map(id =>
      s"""{"changefeed_id":${jsonString(id)},"capture_id":"capture-0"}""")
      .mkString("[", ",", "]")))
  // the coordinator's GC view: min checkpoint over gc-blocking feeds
  // (coordinator.go:483-492; null when nothing blocks)
  server.createContext("/api/v2/gc_safepoint", (ex: HttpExchange) =>
    respond(ex, 200,
      s"""{"gc_safepoint":${registry.gcSafepoint.map(_.toString).getOrElse("null")}}"""))
  // replication-eligibility check + full table list (api/v2/api.go:
  // 88-91); 503 without a catalog, like a coordinator missing its
  // upstream connection
  server.createContext("/api/v2/verify_table", (ex: HttpExchange) =>
    catalog match {
      case None => respond(ex, 503, """{"error":"no upstream catalog"}""")
      case Some(c) =>
        val ts = queryParams(ex).get("tables").map(_.split(",").toSeq.filter(_.nonEmpty))
          .getOrElse(Seq.empty)
          .map { t => val Array(s, tb) = t.split("\\.", 2); (s, tb) }
        val (ok, bad) = ts.partition { case (s, t) => c.eligible(s, t) }
        def arr(xs: Seq[(String, String)]) =
          xs.map { case (s, t) => jsonString(s"$s.$t") }.mkString("[", ",", "]")
        respond(ex, 200, s"""{"eligible":${arr(ok)},"ineligible":${arr(bad)}}""")
    })
  server.createContext("/api/v2/get_all_tables", (ex: HttpExchange) =>
    catalog match {
      case None => respond(ex, 503, """{"error":"no upstream catalog"}""")
      case Some(c) => respond(ex, 200,
        c.all().map { case (s, t) => jsonString(s"$s.$t") }.mkString("[", ",", "]"))
    })

  // ---- api v1: the legacy owner-era surface (api/v1/api.go:53-98).
  // Every route delegates to its v2 handler exactly like the
  // reference's route table (v1.GET("status", api.v2.ServerStatus)
  // etc.); the from-ticdc-api-v1 request marker the reference sets is
  // observable here as a response header. The old-arch table ops
  // (tables/move_table, tables/rebalance_table) and the captures
  // drain PUT live only under v1, as in the reference. ----
  private def v1Mark(ex: HttpExchange): Unit =
    ex.getResponseHeaders.set("from-ticdc-api-v1", "true")
  server.createContext("/api/v1/changefeeds", handler(authed(ex => {
    v1Mark(ex)
    changefeedRoutes("/api/v1/changefeeds", v1 = true)(ex)
  })))
  server.createContext("/api/v1/status", (ex: HttpExchange) => {
    v1Mark(ex)
    respond(ex, 200,
      s"""{"version":"graft","id":"capture-0","is_owner":true,"epoch":${registry.ownerEpoch}}""")
  })
  server.createContext("/api/v1/health", (ex: HttpExchange) => {
    v1Mark(ex); respond(ex, 200, "{}")
  })
  server.createContext("/api/v1/log", handler(authed(ex => {
    v1Mark(ex); setLogLevelRoute(ex)
  })))
  server.createContext("/api/v1/owner/resign", handler(ex => {
    v1Mark(ex)
    if (ex.getRequestMethod != "POST")
      respond(ex, 405, """{"error":"POST required"}""")
    else { registry.resignOwner(); respond(ex, 200, "{}") }
  }))
  server.createContext("/api/v1/processors", (ex: HttpExchange) => {
    v1Mark(ex)
    respond(ex, 200, registry.runningFeeds.map(id =>
      s"""{"changefeed_id":${jsonString(id)},"capture_id":"capture-0"}""")
      .mkString("[", ",", "]"))
  })
  server.createContext("/api/v1/captures", handler(ex => {
    v1Mark(ex)
    val sub = ex.getRequestURI.getPath.stripPrefix("/api/v1/captures")
      .stripPrefix("/")
    (ex.getRequestMethod, sub) match {
      case ("GET", "") =>
        respond(ex, 200,
          s"""[{"id":"capture-0","is_owner":true,"address":"127.0.0.1:$boundPort"}]""")
      case ("PUT", "drain") =>
        // v1 drain-capture: body {"capture_id":"capture-N"} → evacuate
        // worker N (api/v1/api.go:97 drainCapture; the poll contract
        // returns the remaining table count)
        authed { e =>
          bodyField(e, "capture_id")
            .flatMap(_.stripPrefix("capture-").toIntOption) match {
            case Some(target) =>
              registry.drainNode(target)
              respond(e, 202, """{"current_table_count":0}""")
            case None =>
              respond(e, 400, """{"error":"capture_id required"}""")
          }
        }(ex)
      case _ => respond(ex, 404, """{"error":"not found"}""")
    }
  }))

  def start(): ApiServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
