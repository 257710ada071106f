package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Minimal TOML subset reader/renderer plus the v2-API JSON bridge
  * for changefeed configs — the role of the reference's
  * cmd/config-converter (main.go: toml ReplicaConfig ↔ JSON API
  * model, fixed exit codes) scoped to graft's [[ChangefeedConfig]]
  * ADT.
  *
  * Supported TOML: `key = value`, `[section]`, `[[array.of.tables]]`,
  * single-/double-quoted strings, booleans, integers, homogeneous
  * arrays, `#` comments. That subset covers the changefeed configs
  * the reference's integration corpus uses for the features graft
  * implements. JSON parsing rides Jackson (already on the Spark
  * classpath); rendering is explicit so field names stay the
  * reference's snake_case exactly.
  */
object ConfigToml {

  // exit codes mirror cmd/config-converter/main.go:32-39
  val ExitExecuteFailed = 1
  val ExitDecodeTomlFailed = 2
  val ExitMarshalJson = 3
  val ExitDecodeJsonFailed = 4
  val ExitMarshalTomlFailed = 5
  val ExitInvalidFlag = 6

  sealed trait V
  final case class VStr(s: String) extends V
  final case class VBool(b: Boolean) extends V
  final case class VInt(l: Long) extends V
  final case class VDbl(d: Double) extends V
  final case class VArr(items: Seq[V]) extends V

  /** Parsed document: top-level pairs, `[section]` pairs, and
    * `[[name]]` table arrays (by full dotted name). */
  final case class Doc(
      top: Map[String, V],
      sections: Map[String, Map[String, V]],
      tableArrays: Map[String, Seq[Map[String, V]]]) {
    def str(section: String, key: String): Option[String] =
      get(section, key).collect { case VStr(s) => s }
    def bool(section: String, key: String): Option[Boolean] =
      get(section, key).collect { case VBool(b) => b }
    def int(section: String, key: String): Option[Long] =
      get(section, key).collect { case VInt(l) => l }
    def strs(section: String, key: String): Option[Seq[String]] =
      get(section, key).collect { case VArr(xs) => xs.collect { case VStr(s) => s } }
    def ints(section: String, key: String): Option[Seq[Long]] =
      get(section, key).collect { case VArr(xs) => xs.collect { case VInt(l) => l } }
    def dbl(section: String, key: String): Option[Double] =
      get(section, key).collect { case VDbl(d) => d; case VInt(l) => l.toDouble }
    private def get(section: String, key: String): Option[V] =
      if (section.isEmpty) top.get(key) else sections.get(section).flatMap(_.get(key))
  }

  /** Strip a trailing comment, respecting quoted strings. */
  private def stripComment(line: String): String = {
    var inS = false; var inD = false
    val out = new StringBuilder
    var i = 0
    var done = false
    while (i < line.length && !done) {
      val c = line.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      if (c == '#' && !inS && !inD) done = true else out.append(c)
      i += 1
    }
    out.toString
  }

  /** Split on top-level commas (array items may hold commas inside
    * quotes). */
  private def splitItems(body: String): Seq[String] = {
    val items = Seq.newBuilder[String]
    var inS = false; var inD = false
    val cur = new StringBuilder
    body.foreach { c =>
      if (c == '\'' && !inD) { inS = !inS; cur.append(c) }
      else if (c == '"' && !inS) { inD = !inD; cur.append(c) }
      else if (c == ',' && !inS && !inD) { items += cur.toString; cur.clear() }
      else cur.append(c)
    }
    if (cur.toString.trim.nonEmpty) items += cur.toString
    items.result().map(_.trim).filter(_.nonEmpty)
  }

  private def parseValue(raw: String): V = {
    val t = raw.trim
    if (t.startsWith("[")) {
      require(t.endsWith("]"), s"unterminated array: $t")
      VArr(splitItems(t.substring(1, t.length - 1)).map(parseValue))
    } else if ((t.startsWith("'") && t.endsWith("'") && t.length >= 2) ||
               (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2)) {
      VStr(t.substring(1, t.length - 1))
    } else if (t == "true" || t == "false") VBool(t == "true")
    else if (t.matches("-?[0-9]+\\.[0-9]+")) VDbl(t.toDouble)
    else {
      require(t.matches("-?[0-9]+"), s"unsupported TOML value: $t")
      VInt(t.toLong)
    }
  }

  def parse(text: String): Doc = {
    var top = Map.empty[String, V]
    var sections = Map.empty[String, Map[String, V]]
    var arrays = Map.empty[String, Seq[Map[String, V]]]
    // current sink for key=value pairs: None → top; Left(section);
    // Right(array name) → last element of that array
    var target: Option[Either[String, String]] = None
    text.linesIterator.map(stripComment).map(_.trim).filter(_.nonEmpty).foreach { line =>
      if (line.startsWith("[[") && line.endsWith("]]")) {
        val name = line.substring(2, line.length - 2).trim
        arrays = arrays.updated(name, arrays.getOrElse(name, Nil) :+ Map.empty)
        target = Some(Right(name))
      } else if (line.startsWith("[") && line.endsWith("]")) {
        val name = line.substring(1, line.length - 1).trim
        sections = sections.updated(name, sections.getOrElse(name, Map.empty))
        target = Some(Left(name))
      } else {
        val eq = line.indexOf('=')
        require(eq > 0, s"expected key = value, got: $line")
        val k = line.substring(0, eq).trim
        val v = parseValue(line.substring(eq + 1))
        target match {
          case None => top = top.updated(k, v)
          case Some(Left(s)) =>
            sections = sections.updated(s, sections(s).updated(k, v))
          case Some(Right(a)) =>
            val elems = arrays(a)
            arrays = arrays.updated(a, elems.init :+ elems.last.updated(k, v))
        }
      }
    }
    Doc(top, sections, arrays)
  }

  /** "30s" / "10m" / "1h" / "500ms" → nanoseconds (sync-point-interval
    * style durations; pkg/config duration strings). */
  private[model] def durationNs(s: String): Long = {
    val m = "([0-9]+)(ms|s|m|h)".r
    s.trim match {
      case m(n, "ms") => n.toLong * 1000000L
      case m(n, "s") => n.toLong * 1000000000L
      case m(n, "m") => n.toLong * 60L * 1000000000L
      case m(n, "h") => n.toLong * 3600L * 1000000000L
      case other => throw new IllegalArgumentException(s"bad duration: $other")
    }
  }

  private def protocolOf(s: String): Protocol = s match {
    case "canal-json" => Protocol.CanalJson
    case "open-protocol" => Protocol.Open
    case "debezium" => Protocol.Debezium
    case "csv" => Protocol.Csv
    case "simple" => Protocol.Simple
    case "avro" => Protocol.Avro
    case other => throw new IllegalArgumentException(s"unknown protocol: $other")
  }
  private def protocolName(p: Protocol): String = p match {
    case Protocol.CanalJson => "canal-json"
    case Protocol.Open => "open-protocol"
    case Protocol.Debezium => "debezium"
    case Protocol.Csv => "csv"
    case Protocol.Simple => "simple"
    case Protocol.Avro => "avro"
  }

  private def dispatchOf(m: Map[String, V]): DispatchRule = {
    def strs(k: String) = m.get(k).collect { case VArr(xs) => xs.collect { case VStr(s) => s } }
    def str(k: String) = m.get(k).collect { case VStr(s) => s }
    val cols = strs("columns").getOrElse(Nil)
    val partition = str("partition").getOrElse("table") match {
      case "table" | "default" => PartitionRule.Table
      case "ts" => PartitionRule.Ts
      // named-index / explicit column hashing both key on columns
      case "columns" | "index-value" => PartitionRule.KeyColumns(cols)
      case other => throw new IllegalArgumentException(s"unknown partition rule: $other")
    }
    DispatchRule(
      matcher = strs("matcher").getOrElse(Seq("*.*")),
      partition = partition,
      topic = str("topic"),
      targetSchema = str("target-schema"),
      targetTable = str("target-table"))
  }

  /** TOML document → [[ChangefeedConfig]]. */
  def toConfig(doc: Doc, id: String): ChangefeedConfig = {
    val filter = FilterConfig(
      rules = doc.strs("filter", "rules").getOrElse(Seq("*.*")),
      caseSensitive = doc.bool("", "case-sensitive")
        .orElse(doc.bool("filter", "case-sensitive")).getOrElse(false),
      ignoreOps = doc.strs("filter", "ignore-ops").getOrElse(Nil),
      ignoreTxnStartTs = doc.ints("filter", "ignore-txn-start-ts").getOrElse(Nil),
      ignoreInsertValueExpr = doc.str("filter", "ignore-insert-value-expr"),
      ignoreUpdateOldValueExpr = doc.str("filter", "ignore-update-old-value-expr"),
      ignoreUpdateNewValueExpr = doc.str("filter", "ignore-update-new-value-expr"),
      ignoreDeleteValueExpr = doc.str("filter", "ignore-delete-value-expr"),
      ignoreUpdateOnlyColumns = doc.strs("filter", "ignore-update-only-columns").getOrElse(Nil))
    val dispatchers = doc.tableArrays.getOrElse("sink.dispatchers", Nil).map(dispatchOf)
    val sink = SinkConfig(
      protocol = doc.str("sink", "protocol").map(protocolOf).getOrElse(Protocol.CanalJson),
      numPartitions = doc.int("sink", "partition-num").map(_.toInt).getOrElse(16),
      safeMode = doc.bool("sink", "safe-mode").getOrElse(false),
      contentCompatible = doc.bool("sink", "content-compatible").getOrElse(false),
      columnSelector = doc.strs("sink", "column-selectors"),
      onlyOutputUpdatedColumns = doc.bool("sink", "only-output-updated-columns").getOrElse(false),
      deleteOnlyOutputHandleKey =
        doc.bool("sink", "delete-only-output-handle-key-columns").getOrElse(false),
      dispatch = if (dispatchers.nonEmpty) dispatchers else Seq(DispatchRule()),
      bdrMode = doc.bool("", "bdr-mode").getOrElse(false),
      sendBootstrapIntervalInSec =
        doc.int("sink", "send-bootstrap-interval-in-sec").getOrElse(120L),
      sendBootstrapInMsgCount =
        doc.int("sink", "send-bootstrap-in-msg-count").map(_.toInt).getOrElse(10000),
      sendBootstrapToAllPartition =
        doc.bool("sink", "send-bootstrap-to-all-partition").getOrElse(true),
      sendAllBootstrapAtStart =
        doc.bool("sink", "send-all-bootstrap-at-start").getOrElse(false),
      maxMessageBytes =
        doc.int("sink", "max-message-bytes").map(_.toInt).getOrElse(10 * 1024 * 1024),
      schemaRegistry = doc.str("sink", "schema-registry").getOrElse(""),
      encodingFormat = doc.str("sink", "encoding-format").getOrElse("json"),
      avroDecimalHandlingMode =
        doc.str("sink", "avro-decimal-handling-mode").getOrElse("precise"),
      avroBigintUnsignedHandlingMode =
        doc.str("sink", "avro-bigint-unsigned-handling-mode").getOrElse("long"),
      avroEnableWatermark =
        doc.bool("sink", "avro-enable-watermark").getOrElse(false),
      debeziumDisableSchema =
        doc.bool("sink", "debezium-disable-schema").getOrElse(false),
      mysqlConfig = {
        val m = "sink.mysql-config"
        MysqlSinkConfig(
          workerCount = doc.int(m, "worker-count").map(_.toInt).getOrElse(16),
          maxTxnRow = doc.int(m, "max-txn-row").map(_.toInt).getOrElse(256),
          maxMultiUpdateRow =
            doc.int(m, "max-multi-update-row").map(_.toInt).getOrElse(40),
          maxMultiUpdateRowSize =
            doc.int(m, "max-multi-update-row-size").map(_.toInt).getOrElse(1024),
          enableBatchDml = doc.bool(m, "enable-batch-dml").getOrElse(true))
      },
      cloudStorageConfig = {
        val c = "sink.cloud-storage-config"
        CloudStorageSinkConfig(
          workerCount = doc.int(c, "worker-count").map(_.toInt).getOrElse(16),
          flushInterval = doc.str(c, "flush-interval").getOrElse("5s"),
          fileSize = doc.int(c, "file-size").map(_.toInt)
            .getOrElse(64 * 1024 * 1024),
          fileExpirationDays =
            doc.int(c, "file-expiration-days").map(_.toInt).getOrElse(0),
          fileCleanupCronSpec =
            doc.str(c, "file-cleanup-cron-spec").getOrElse("0 0 2 * * *"))
      },
      csv = {
        val c = "sink.csv"
        CsvConfig(
          delimiter = doc.str(c, "delimiter").getOrElse(","),
          quote = doc.str(c, "quote").getOrElse("\""),
          nullString = doc.str(c, "null").getOrElse("\\N"),
          includeCommitTs = doc.bool(c, "include-commit-ts").getOrElse(false),
          binaryEncodingMethod =
            doc.str(c, "binary-encoding-method").getOrElse("base64"),
          outputOldValue = doc.bool(c, "output-old-value").getOrElse(false),
          outputFieldHeader =
            doc.bool(c, "output-field-header").getOrElse(false))
      },
      largeMessageHandle = {
        val lmh = "sink.large-message-handle"
        LargeMessageHandle(
          option = doc.str(lmh, "large-message-handle-option")
            .getOrElse(LargeMessageHandle.OptionNone),
          compression = doc.str(lmh, "large-message-handle-compression")
            .getOrElse("none"),
          claimCheckStorageUri =
            doc.str(lmh, "claim-check-storage-uri").getOrElse(""),
          claimCheckRawValue =
            doc.bool(lmh, "claim-check-raw-value").getOrElse(false))
      },
      pulsarConfig = pulsarOf(doc))
    ChangefeedConfig(
      id = id,
      filter = filter,
      sink = sink,
      handleKeys = doc.strs("", "handle-keys").getOrElse(Seq("user_id")),
      splitUpdateOnKeyChange = doc.bool("", "split-update-on-key-change").getOrElse(true),
      syncPointIntervalNs =
        if (doc.bool("", "enable-sync-point").getOrElse(false))
          doc.str("", "sync-point-interval").map(durationNs)
        else None,
      maxFilesPerTrigger = doc.int("", "max-files-per-trigger").map(_.toInt),
      targetTs = doc.int("", "target-ts"),
      keyspace = doc.str("", "keyspace").getOrElse("default"),
      security = securityOf(doc),
      syncedStatus = SyncedStatusConfig(
        syncedCheckInterval =
          doc.int("synced-status", "synced-check-interval").getOrElse(300L),
        checkpointInterval =
          doc.int("synced-status", "checkpoint-interval").getOrElse(15L)),
      scheduler = schedulerOf(doc),
      // [integrity] (pkg/integrity toml tags)
      integrity = IntegrityConfig(
        integrityCheckLevel = doc.str("integrity", "integrity-check-level")
          .getOrElse(IntegrityConfig.CheckLevelNone),
        corruptionHandleLevel = doc.str("integrity", "corruption-handle-level")
          .getOrElse(IntegrityConfig.HandleLevelWarn)),
      // [consistent] (pkg/config/consistent.go toml tags)
      consistent = ConsistentConfig(
        level = doc.str("consistent", "level").getOrElse("none"),
        storage = doc.str("consistent", "storage").getOrElse("")))
  }

  /** `[scheduler]` (scheduler_config.go:35-69 toml tags) →
    * [[SchedulerConfig]]; absent keys keep the defaults. */
  private def schedulerOf(doc: Doc): SchedulerConfig = {
    val d = SchedulerConfig()
    val s = "scheduler"
    SchedulerConfig(
      enableTableAcrossNodes =
        doc.bool(s, "enable-table-across-nodes").getOrElse(d.enableTableAcrossNodes),
      regionThreshold =
        doc.int(s, "region-threshold").map(_.toInt).getOrElse(d.regionThreshold),
      regionCountPerSpan =
        doc.int(s, "region-count-per-span").map(_.toInt).getOrElse(d.regionCountPerSpan),
      // a Go-duration string ("5m") or raw nanos, like the reference's
      // time.Duration JSON/TOML forms
      regionCountRefreshIntervalNs = doc.str(s, "region-count-refresh-interval")
        .map(durationNs)
        .orElse(doc.int(s, "region-count-refresh-interval"))
        .getOrElse(d.regionCountRefreshIntervalNs),
      writeKeyThreshold =
        doc.int(s, "write-key-threshold").map(_.toInt).getOrElse(d.writeKeyThreshold),
      schedulingTaskCountPerNode = doc.int(s, "scheduling-task-count-per-node")
        .map(_.toInt).getOrElse(d.schedulingTaskCountPerNode),
      enableSplittableCheck =
        doc.bool(s, "enable-splittable-check").getOrElse(d.enableSplittableCheck),
      forceSplit = doc.bool(s, "force-split").getOrElse(d.forceSplit),
      balanceScoreThreshold = doc.int(s, "balance-score-threshold")
        .map(_.toInt).getOrElse(d.balanceScoreThreshold),
      minTrafficPercentage =
        doc.dbl(s, "min-traffic-percentage").getOrElse(d.minTrafficPercentage),
      maxTrafficPercentage =
        doc.dbl(s, "max-traffic-percentage").getOrElse(d.maxTrafficPercentage))
  }

  /** `[security]` (credential.go toml tags) + `[sink.kafka-config]`
    * SASL keys (sink.go:473-489 toml tags) → [[Security.SecurityConfig]].
    * TLS turns on when the credential is complete (options.go:420). */
  private def securityOf(doc: Doc): Security.SecurityConfig = {
    val cred = Security.Credential(
      caPath = doc.str("security", "ca-path").getOrElse(""),
      certPath = doc.str("security", "cert-path").getOrElse(""),
      keyPath = doc.str("security", "key-path").getOrElse(""),
      certAllowedCN = doc.strs("security", "cert-allowed-cn").getOrElse(Nil),
      mtls = doc.bool("security", "mtls").getOrElse(false),
      clientUserRequired = doc.bool("security", "client-user-required").getOrElse(false),
      clientAllowedUser = doc.strs("security", "client-allowed-user").getOrElse(Nil))
    val kc = "sink.kafka-config"
    val sasl = Security.SaslConfig(
      user = doc.str(kc, "sasl-user").getOrElse(""),
      password = doc.str(kc, "sasl-password").getOrElse(""),
      mechanism = doc.str(kc, "sasl-mechanism").map(Security.SaslMechanism.fromString),
      gssapi = Security.GssapiConfig(
        authType = doc.str(kc, "sasl-gssapi-auth-type").getOrElse(""),
        keytabPath = doc.str(kc, "sasl-gssapi-keytab-path").getOrElse(""),
        kerberosConfigPath = doc.str(kc, "sasl-gssapi-kerberos-config-path").getOrElse(""),
        serviceName = doc.str(kc, "sasl-gssapi-service-name").getOrElse(""),
        user = doc.str(kc, "sasl-gssapi-user").getOrElse(""),
        password = doc.str(kc, "sasl-gssapi-password").getOrElse(""),
        realm = doc.str(kc, "sasl-gssapi-realm").getOrElse(""),
        disablePafxfast = doc.bool(kc, "sasl-gssapi-disable-pafxfast").getOrElse(false)),
      oauth2 = Security.OAuth2Config(
        clientId = doc.str(kc, "sasl-oauth-client-id").getOrElse(""),
        clientSecret = doc.str(kc, "sasl-oauth-client-secret").getOrElse(""),
        tokenUrl = doc.str(kc, "sasl-oauth-token-url").getOrElse(""),
        scopes = doc.strs(kc, "sasl-oauth-scopes").getOrElse(Nil),
        grantType = doc.str(kc, "sasl-oauth-grant-type").getOrElse("client_credentials"),
        audience = doc.str(kc, "sasl-oauth-audience").getOrElse("")))
    Security.SecurityConfig(
      enableTls = cred.isTlsEnabled,
      insecureSkipVerify = doc.bool(kc, "insecure-skip-verify").getOrElse(false),
      credential = cred,
      sasl = sasl)
  }

  /** `[sink.pulsar-config]` (+ `.oauth2` subtable) — sink.go:606-672
    * toml tags → [[Security.PulsarConfig]]. None when absent. */
  private def pulsarOf(doc: Doc): Option[Security.PulsarConfig] = {
    val pc = "sink.pulsar-config"
    val oc = "sink.pulsar-config.oauth2"
    val oauth =
      if (doc.sections.contains(oc)) Some(Security.PulsarOAuth2(
        issuerUrl = doc.str(oc, "oauth2-issuer-url").getOrElse(""),
        audience = doc.str(oc, "oauth2-audience").getOrElse(""),
        scope = doc.str(oc, "oauth2-scope").getOrElse(""),
        privateKey = doc.str(oc, "oauth2-private-key").getOrElse(""),
        clientId = doc.str(oc, "oauth2-client-id").getOrElse("")))
      else None
    if (!doc.sections.contains(pc) && oauth.isEmpty) None
    else Some(Security.PulsarConfig(
      authenticationToken = doc.str(pc, "authentication-token"),
      tokenFromFile = doc.str(pc, "token-from-file"),
      basicUserName = doc.str(pc, "basic-user-name"),
      basicPassword = doc.str(pc, "basic-password"),
      oauth2 = oauth,
      authTlsCertificatePath = doc.str(pc, "auth-tls-certificate-path"),
      authTlsPrivateKeyPath = doc.str(pc, "auth-tls-private-key-path"),
      tlsTrustCertsFilePath = doc.str(pc, "tls-trust-certs-file-path"),
      tlsCertificateFile = doc.str(pc, "tls-certificate-file"),
      tlsKeyFilePath = doc.str(pc, "tls-key-file-path"),
      compressionType = doc.str(pc, "compression-type"),
      producerCacheSize = doc.int(pc, "pulsar-producer-cache-size").map(_.toInt),
      batchingMaxMessages = doc.int(pc, "batching-max-messages").map(_.toInt),
      batchingMaxPublishDelayMs = doc.str(pc, "batching-max-publish-delay")
        .map(durationNs(_) / 1000000L),
      sendTimeoutSec = doc.str(pc, "send-timeout").map(durationNs(_) / 1000000000L),
      connectionTimeoutSec = doc.str(pc, "connection-timeout").map(durationNs(_) / 1000000000L),
      operationTimeoutSec = doc.str(pc, "operation-timeout").map(durationNs(_) / 1000000000L),
      outputRawChangeEvent = doc.bool(pc, "output-raw-change-event").getOrElse(false)))
  }

  // ---- render: config → TOML ----

  private def tomlStr(s: String) = "'" + s + "'"
  private def tomlArr(xs: Seq[String]) = xs.map(tomlStr).mkString("[", ", ", "]")

  def renderToml(cfg: ChangefeedConfig): String = {
    val b = new StringBuilder
    b ++= s"case-sensitive = ${cfg.filter.caseSensitive}\n"
    if (cfg.sink.bdrMode) b ++= "bdr-mode = true\n"
    b ++= s"handle-keys = ${tomlArr(cfg.handleKeys)}\n"
    b ++= s"split-update-on-key-change = ${cfg.splitUpdateOnKeyChange}\n"
    cfg.syncPointIntervalNs.foreach { ns =>
      b ++= "enable-sync-point = true\n"
      b ++= s"sync-point-interval = '${ns / 1000000000L}s'\n"
    }
    cfg.maxFilesPerTrigger.foreach(n => b ++= s"max-files-per-trigger = $n\n")
    cfg.targetTs.foreach(t => b ++= s"target-ts = $t\n")
    if (cfg.keyspace != "default") b ++= s"keyspace = ${tomlStr(cfg.keyspace)}\n"
    b ++= "\n[filter]\n"
    b ++= s"rules = ${tomlArr(cfg.filter.rules)}\n"
    if (cfg.filter.ignoreOps.nonEmpty)
      b ++= s"ignore-ops = ${tomlArr(cfg.filter.ignoreOps)}\n"
    if (cfg.filter.ignoreTxnStartTs.nonEmpty)
      b ++= s"ignore-txn-start-ts = ${cfg.filter.ignoreTxnStartTs.mkString("[", ", ", "]")}\n"
    cfg.filter.ignoreInsertValueExpr.foreach(e => b ++= s"ignore-insert-value-expr = ${tomlStr(e)}\n")
    cfg.filter.ignoreUpdateOldValueExpr.foreach(e => b ++= s"ignore-update-old-value-expr = ${tomlStr(e)}\n")
    cfg.filter.ignoreUpdateNewValueExpr.foreach(e => b ++= s"ignore-update-new-value-expr = ${tomlStr(e)}\n")
    cfg.filter.ignoreDeleteValueExpr.foreach(e => b ++= s"ignore-delete-value-expr = ${tomlStr(e)}\n")
    if (cfg.filter.ignoreUpdateOnlyColumns.nonEmpty)
      b ++= s"ignore-update-only-columns = ${tomlArr(cfg.filter.ignoreUpdateOnlyColumns)}\n"
    b ++= "\n[sink]\n"
    b ++= s"protocol = ${tomlStr(protocolName(cfg.sink.protocol))}\n"
    b ++= s"partition-num = ${cfg.sink.numPartitions}\n"
    if (cfg.sink.safeMode) b ++= "safe-mode = true\n"
    if (cfg.sink.contentCompatible) b ++= "content-compatible = true\n"
    cfg.sink.columnSelector.foreach(cs => b ++= s"column-selectors = ${tomlArr(cs)}\n")
    if (cfg.sink.onlyOutputUpdatedColumns) b ++= "only-output-updated-columns = true\n"
    if (cfg.sink.deleteOnlyOutputHandleKey) b ++= "delete-only-output-handle-key-columns = true\n"
    if (cfg.sink.sendBootstrapIntervalInSec != 120L)
      b ++= s"send-bootstrap-interval-in-sec = ${cfg.sink.sendBootstrapIntervalInSec}\n"
    if (cfg.sink.sendBootstrapInMsgCount != 10000)
      b ++= s"send-bootstrap-in-msg-count = ${cfg.sink.sendBootstrapInMsgCount}\n"
    if (!cfg.sink.sendBootstrapToAllPartition)
      b ++= "send-bootstrap-to-all-partition = false\n"
    if (cfg.sink.sendAllBootstrapAtStart)
      b ++= "send-all-bootstrap-at-start = true\n"
    if (cfg.sink.maxMessageBytes != 10 * 1024 * 1024)
      b ++= s"max-message-bytes = ${cfg.sink.maxMessageBytes}\n"
    if (cfg.sink.schemaRegistry.nonEmpty)
      b ++= s"schema-registry = ${tomlStr(cfg.sink.schemaRegistry)}\n"
    if (cfg.sink.encodingFormat != "json")
      b ++= s"encoding-format = ${tomlStr(cfg.sink.encodingFormat)}\n"
    if (cfg.sink.avroDecimalHandlingMode != "precise")
      b ++= "avro-decimal-handling-mode = " +
        s"${tomlStr(cfg.sink.avroDecimalHandlingMode)}\n"
    if (cfg.sink.avroBigintUnsignedHandlingMode != "long")
      b ++= "avro-bigint-unsigned-handling-mode = " +
        s"${tomlStr(cfg.sink.avroBigintUnsignedHandlingMode)}\n"
    if (cfg.sink.avroEnableWatermark)
      b ++= "avro-enable-watermark = true\n"
    if (cfg.sink.debeziumDisableSchema)
      b ++= "debezium-disable-schema = true\n"
    if (!cfg.sink.mysqlConfig.isDefault) {
      val m = cfg.sink.mysqlConfig
      b ++= "\n[sink.mysql-config]\n"
      if (m.workerCount != 16) b ++= s"worker-count = ${m.workerCount}\n"
      if (m.maxTxnRow != 256) b ++= s"max-txn-row = ${m.maxTxnRow}\n"
      if (m.maxMultiUpdateRow != 40)
        b ++= s"max-multi-update-row = ${m.maxMultiUpdateRow}\n"
      if (m.maxMultiUpdateRowSize != 1024)
        b ++= s"max-multi-update-row-size = ${m.maxMultiUpdateRowSize}\n"
      if (!m.enableBatchDml) b ++= "enable-batch-dml = false\n"
    }
    if (!cfg.sink.cloudStorageConfig.isDefault) {
      val c = cfg.sink.cloudStorageConfig
      b ++= "\n[sink.cloud-storage-config]\n"
      if (c.workerCount != 16) b ++= s"worker-count = ${c.workerCount}\n"
      if (c.flushInterval != "5s")
        b ++= s"flush-interval = ${tomlStr(c.flushInterval)}\n"
      if (c.fileSize != 64 * 1024 * 1024) b ++= s"file-size = ${c.fileSize}\n"
      if (c.fileExpirationDays != 0)
        b ++= s"file-expiration-days = ${c.fileExpirationDays}\n"
      if (c.fileCleanupCronSpec != "0 0 2 * * *")
        b ++= s"file-cleanup-cron-spec = ${tomlStr(c.fileCleanupCronSpec)}\n"
    }
    if (!cfg.sink.csv.isDefault) {
      val c = cfg.sink.csv
      b ++= "\n[sink.csv]\n"
      if (c.delimiter != ",") b ++= s"delimiter = ${tomlStr(c.delimiter)}\n"
      if (c.quote != "\"") b ++= s"quote = ${tomlStr(c.quote)}\n"
      if (c.nullString != "\\N") b ++= s"null = ${tomlStr(c.nullString)}\n"
      if (c.includeCommitTs) b ++= "include-commit-ts = true\n"
      if (c.binaryEncodingMethod != "base64")
        b ++= s"binary-encoding-method = ${tomlStr(c.binaryEncodingMethod)}\n"
      if (c.outputOldValue) b ++= "output-old-value = true\n"
      if (c.outputFieldHeader) b ++= "output-field-header = true\n"
    }
    if (!cfg.sink.largeMessageHandle.isDefault) {
      val l = cfg.sink.largeMessageHandle
      b ++= "\n[sink.large-message-handle]\n"
      b ++= s"large-message-handle-option = ${tomlStr(l.option)}\n"
      b ++= s"large-message-handle-compression = ${tomlStr(l.compression)}\n"
      if (l.claimCheckStorageUri.nonEmpty)
        b ++= s"claim-check-storage-uri = ${tomlStr(l.claimCheckStorageUri)}\n"
      if (l.claimCheckRawValue) b ++= "claim-check-raw-value = true\n"
    }
    if (cfg.syncedStatus != SyncedStatusConfig()) {
      b ++= "\n[synced-status]\n"
      b ++= s"synced-check-interval = ${cfg.syncedStatus.syncedCheckInterval}\n"
      b ++= s"checkpoint-interval = ${cfg.syncedStatus.checkpointInterval}\n"
    }
    if (cfg.consistent != ConsistentConfig()) {
      b ++= "\n[consistent]\n"
      b ++= s"level = ${tomlStr(cfg.consistent.level)}\n"
      b ++= s"storage = ${tomlStr(cfg.consistent.storage)}\n"
    }
    if (cfg.integrity != IntegrityConfig()) {
      b ++= "\n[integrity]\n"
      b ++= s"integrity-check-level = ${tomlStr(cfg.integrity.integrityCheckLevel)}\n"
      b ++= s"corruption-handle-level = ${tomlStr(cfg.integrity.corruptionHandleLevel)}\n"
    }
    if (cfg.scheduler != SchedulerConfig()) {
      val sc = cfg.scheduler
      b ++= "\n[scheduler]\n"
      b ++= s"enable-table-across-nodes = ${sc.enableTableAcrossNodes}\n"
      b ++= s"region-threshold = ${sc.regionThreshold}\n"
      b ++= s"region-count-per-span = ${sc.regionCountPerSpan}\n"
      b ++= s"region-count-refresh-interval = ${sc.regionCountRefreshIntervalNs}\n"
      b ++= s"write-key-threshold = ${sc.writeKeyThreshold}\n"
      b ++= s"scheduling-task-count-per-node = ${sc.schedulingTaskCountPerNode}\n"
      b ++= s"enable-splittable-check = ${sc.enableSplittableCheck}\n"
      b ++= s"force-split = ${sc.forceSplit}\n"
      b ++= s"balance-score-threshold = ${sc.balanceScoreThreshold}\n"
      b ++= s"min-traffic-percentage = ${sc.minTrafficPercentage}\n"
      b ++= s"max-traffic-percentage = ${sc.maxTrafficPercentage}\n"
    }
    cfg.sink.dispatch.foreach { d =>
      b ++= "\n[[sink.dispatchers]]\n"
      b ++= s"matcher = ${tomlArr(d.matcher)}\n"
      d.partition match {
        case PartitionRule.Table => b ++= "partition = 'table'\n"
        case PartitionRule.Ts => b ++= "partition = 'ts'\n"
        case PartitionRule.KeyColumns(cols) =>
          b ++= "partition = 'columns'\n"
          b ++= s"columns = ${tomlArr(cols)}\n"
        // scheduling rules are API-plane state, not user TOML
        case PartitionRule.Fixed(_) | PartitionRule.TableSplit(_, _) |
             PartitionRule.SplitFixed(_) =>
          b ++= "partition = 'table'\n"
      }
      d.topic.foreach(t => b ++= s"topic = ${tomlStr(t)}\n")
      d.targetSchema.foreach(t => b ++= s"target-schema = ${tomlStr(t)}\n")
      d.targetTable.foreach(t => b ++= s"target-table = ${tomlStr(t)}\n")
    }
    val sec = cfg.security
    if (!sec.credential.isEmpty || sec.credential.mtls ||
        sec.credential.clientUserRequired || sec.credential.clientAllowedUser.nonEmpty) {
      b ++= "\n[security]\n"
      if (sec.credential.caPath.nonEmpty) b ++= s"ca-path = ${tomlStr(sec.credential.caPath)}\n"
      if (sec.credential.certPath.nonEmpty) b ++= s"cert-path = ${tomlStr(sec.credential.certPath)}\n"
      if (sec.credential.keyPath.nonEmpty) b ++= s"key-path = ${tomlStr(sec.credential.keyPath)}\n"
      if (sec.credential.certAllowedCN.nonEmpty)
        b ++= s"cert-allowed-cn = ${tomlArr(sec.credential.certAllowedCN)}\n"
      if (sec.credential.mtls) b ++= "mtls = true\n"
      if (sec.credential.clientUserRequired) b ++= "client-user-required = true\n"
      if (sec.credential.clientAllowedUser.nonEmpty)
        b ++= s"client-allowed-user = ${tomlArr(sec.credential.clientAllowedUser)}\n"
    }
    if (sec.sasl.isEnabled || sec.insecureSkipVerify) {
      b ++= "\n[sink.kafka-config]\n"
      if (sec.sasl.user.nonEmpty) b ++= s"sasl-user = ${tomlStr(sec.sasl.user)}\n"
      if (sec.sasl.password.nonEmpty) b ++= s"sasl-password = ${tomlStr(sec.sasl.password)}\n"
      sec.sasl.mechanism.foreach(m => b ++= s"sasl-mechanism = ${tomlStr(m.name.toLowerCase)}\n")
      val g = sec.sasl.gssapi
      if (g.authType.nonEmpty) b ++= s"sasl-gssapi-auth-type = ${tomlStr(g.authType)}\n"
      if (g.keytabPath.nonEmpty) b ++= s"sasl-gssapi-keytab-path = ${tomlStr(g.keytabPath)}\n"
      if (g.kerberosConfigPath.nonEmpty)
        b ++= s"sasl-gssapi-kerberos-config-path = ${tomlStr(g.kerberosConfigPath)}\n"
      if (g.serviceName.nonEmpty) b ++= s"sasl-gssapi-service-name = ${tomlStr(g.serviceName)}\n"
      if (g.user.nonEmpty) b ++= s"sasl-gssapi-user = ${tomlStr(g.user)}\n"
      if (g.password.nonEmpty) b ++= s"sasl-gssapi-password = ${tomlStr(g.password)}\n"
      if (g.realm.nonEmpty) b ++= s"sasl-gssapi-realm = ${tomlStr(g.realm)}\n"
      if (g.disablePafxfast) b ++= "sasl-gssapi-disable-pafxfast = true\n"
      val o = sec.sasl.oauth2
      if (o.clientId.nonEmpty) b ++= s"sasl-oauth-client-id = ${tomlStr(o.clientId)}\n"
      if (o.clientSecret.nonEmpty) b ++= s"sasl-oauth-client-secret = ${tomlStr(o.clientSecret)}\n"
      if (o.tokenUrl.nonEmpty) b ++= s"sasl-oauth-token-url = ${tomlStr(o.tokenUrl)}\n"
      if (o.scopes.nonEmpty) b ++= s"sasl-oauth-scopes = ${tomlArr(o.scopes)}\n"
      if (o.grantType != "client_credentials") b ++= s"sasl-oauth-grant-type = ${tomlStr(o.grantType)}\n"
      if (o.audience.nonEmpty) b ++= s"sasl-oauth-audience = ${tomlStr(o.audience)}\n"
      if (sec.insecureSkipVerify) b ++= "insecure-skip-verify = true\n"
    }
    cfg.sink.pulsarConfig.foreach { p =>
      b ++= "\n[sink.pulsar-config]\n"
      p.authenticationToken.foreach(v => b ++= s"authentication-token = ${tomlStr(v)}\n")
      p.tokenFromFile.foreach(v => b ++= s"token-from-file = ${tomlStr(v)}\n")
      p.basicUserName.foreach(v => b ++= s"basic-user-name = ${tomlStr(v)}\n")
      p.basicPassword.foreach(v => b ++= s"basic-password = ${tomlStr(v)}\n")
      p.authTlsCertificatePath.foreach(v => b ++= s"auth-tls-certificate-path = ${tomlStr(v)}\n")
      p.authTlsPrivateKeyPath.foreach(v => b ++= s"auth-tls-private-key-path = ${tomlStr(v)}\n")
      p.tlsTrustCertsFilePath.foreach(v => b ++= s"tls-trust-certs-file-path = ${tomlStr(v)}\n")
      p.tlsCertificateFile.foreach(v => b ++= s"tls-certificate-file = ${tomlStr(v)}\n")
      p.tlsKeyFilePath.foreach(v => b ++= s"tls-key-file-path = ${tomlStr(v)}\n")
      p.compressionType.foreach(v => b ++= s"compression-type = ${tomlStr(v)}\n")
      p.producerCacheSize.foreach(v => b ++= s"pulsar-producer-cache-size = $v\n")
      p.batchingMaxMessages.foreach(v => b ++= s"batching-max-messages = $v\n")
      p.batchingMaxPublishDelayMs.foreach(v => b ++= s"batching-max-publish-delay = '${v}ms'\n")
      p.sendTimeoutSec.foreach(v => b ++= s"send-timeout = '${v}s'\n")
      p.connectionTimeoutSec.foreach(v => b ++= s"connection-timeout = '${v}s'\n")
      p.operationTimeoutSec.foreach(v => b ++= s"operation-timeout = '${v}s'\n")
      if (p.outputRawChangeEvent) b ++= "output-raw-change-event = true\n"
      p.oauth2.foreach { o =>
        b ++= "\n[sink.pulsar-config.oauth2]\n"
        if (o.issuerUrl.nonEmpty) b ++= s"oauth2-issuer-url = ${tomlStr(o.issuerUrl)}\n"
        if (o.audience.nonEmpty) b ++= s"oauth2-audience = ${tomlStr(o.audience)}\n"
        if (o.scope.nonEmpty) b ++= s"oauth2-scope = ${tomlStr(o.scope)}\n"
        if (o.privateKey.nonEmpty) b ++= s"oauth2-private-key = ${tomlStr(o.privateKey)}\n"
        if (o.clientId.nonEmpty) b ++= s"oauth2-client-id = ${tomlStr(o.clientId)}\n"
      }
    }
    b.toString
  }

  // ---- render: config → v2 API JSON ----

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  private def jsonArr(xs: Seq[String]) = xs.map(jsonStr).mkString("[", ",", "]")

  def toApiJson(cfg: ChangefeedConfig): String = {
    val f = cfg.filter
    val s = cfg.sink
    val dispatchers = s.dispatch.map { d =>
      val (rule, cols) = d.partition match {
        case PartitionRule.Table => ("table", Nil)
        case PartitionRule.Ts => ("ts", Nil)
        case PartitionRule.KeyColumns(cs) => ("columns", cs)
        case _ => ("table", Nil)
      }
      s"""{"matcher":${jsonArr(d.matcher)},"partition":${jsonStr(rule)}""" +
        (if (cols.nonEmpty) s""","columns":${jsonArr(cols)}""" else "") +
        d.topic.map(t => s""","topic":${jsonStr(t)}""").getOrElse("") +
        d.targetSchema.map(t => s""","target_schema":${jsonStr(t)}""").getOrElse("") +
        d.targetTable.map(t => s""","target_table":${jsonStr(t)}""").getOrElse("") + "}"
    }.mkString("[", ",", "]")
    val filterJson =
      s"""{"rules":${jsonArr(f.rules)},"case_sensitive":${f.caseSensitive}""" +
        (if (f.ignoreOps.nonEmpty) s""","ignore_ops":${jsonArr(f.ignoreOps)}""" else "") +
        (if (f.ignoreTxnStartTs.nonEmpty)
          s""","ignore_txn_start_ts":${f.ignoreTxnStartTs.mkString("[", ",", "]")}""" else "") +
        f.ignoreInsertValueExpr.map(e => s""","ignore_insert_value_expr":${jsonStr(e)}""").getOrElse("") +
        f.ignoreUpdateOldValueExpr.map(e => s""","ignore_update_old_value_expr":${jsonStr(e)}""").getOrElse("") +
        f.ignoreUpdateNewValueExpr.map(e => s""","ignore_update_new_value_expr":${jsonStr(e)}""").getOrElse("") +
        f.ignoreDeleteValueExpr.map(e => s""","ignore_delete_value_expr":${jsonStr(e)}""").getOrElse("") +
        (if (f.ignoreUpdateOnlyColumns.nonEmpty)
          s""","ignore_update_only_columns":${jsonArr(f.ignoreUpdateOnlyColumns)}""" else "") + "}"
    val sinkJson =
      s"""{"protocol":${jsonStr(protocolName(s.protocol))},"partition_num":${s.numPartitions}""" +
        s""","safe_mode":${s.safeMode}""" +
        (if (s.contentCompatible) s""","content_compatible":true""" else "") +
        s.columnSelector.map(cs => s""","column_selectors":${jsonArr(cs)}""").getOrElse("") +
        s""","only_output_updated_columns":${s.onlyOutputUpdatedColumns}""" +
        s""","delete_only_output_handle_key_columns":${s.deleteOnlyOutputHandleKey}""" +
        s""","dispatchers":$dispatchers,"bdr_mode":${s.bdrMode}""" +
        s""","send_bootstrap_interval_in_sec":${s.sendBootstrapIntervalInSec}""" +
        s""","send_bootstrap_in_msg_count":${s.sendBootstrapInMsgCount}""" +
        s""","send_bootstrap_to_all_partition":${s.sendBootstrapToAllPartition}""" +
        s""","send_all_bootstrap_at_start":${s.sendAllBootstrapAtStart}""" +
        s""","max_message_bytes":${s.maxMessageBytes}""" +
        (if (s.schemaRegistry.isEmpty) ""
         else s""","schema_registry":${jsonStr(s.schemaRegistry)}""") +
        (if (s.encodingFormat == "json") ""
         else s""","encoding_format":${jsonStr(s.encodingFormat)}""") +
        (if (s.avroDecimalHandlingMode == "precise") ""
         else s""","avro_decimal_handling_mode":${jsonStr(s.avroDecimalHandlingMode)}""") +
        (if (s.avroBigintUnsignedHandlingMode == "long") ""
         else s""","avro_bigint_unsigned_handling_mode":${jsonStr(s.avroBigintUnsignedHandlingMode)}""") +
        (if (!s.avroEnableWatermark) ""
         else s""","avro_enable_watermark":true""") +
        (if (!s.debeziumDisableSchema) ""
         else s""","debezium_disable_schema":true""") +
        (if (s.mysqlConfig.isDefault) "" else {
          val m = s.mysqlConfig
          s""","mysql_config":{"worker-count":${m.workerCount},""" +
            s""""max-txn-row":${m.maxTxnRow},""" +
            s""""max-multi-update-row":${m.maxMultiUpdateRow},""" +
            s""""max-multi-update-row-size":${m.maxMultiUpdateRowSize},""" +
            s""""enable-batch-dml":${m.enableBatchDml}}"""
        }) +
        (if (s.cloudStorageConfig.isDefault) "" else {
          val c = s.cloudStorageConfig
          s""","cloud_storage_config":{"worker-count":${c.workerCount},""" +
            s""""flush-interval":${jsonStr(c.flushInterval)},""" +
            s""""file-size":${c.fileSize},""" +
            s""""file-expiration-days":${c.fileExpirationDays},""" +
            s""""file-cleanup-cron-spec":${jsonStr(c.fileCleanupCronSpec)}}"""
        }) +
        (if (s.csv.isDefault) "" else {
          val c = s.csv
          s""","csv":{"delimiter":${jsonStr(c.delimiter)},""" +
            s""""quote":${jsonStr(c.quote)},"null":${jsonStr(c.nullString)},""" +
            s""""include-commit-ts":${c.includeCommitTs},""" +
            s""""binary-encoding-method":${jsonStr(c.binaryEncodingMethod)},""" +
            s""""output-old-value":${c.outputOldValue},""" +
            s""""output-field-header":${c.outputFieldHeader}}"""
        }) +
        (if (s.largeMessageHandle.isDefault) "" else {
          val l = s.largeMessageHandle
          s""","large_message_handle":{"large-message-handle-option":${jsonStr(l.option)},""" +
            s""""large-message-handle-compression":${jsonStr(l.compression)},""" +
            s""""claim-check-storage-uri":${jsonStr(l.claimCheckStorageUri)},""" +
            s""""claim-check-raw-value":${l.claimCheckRawValue}}"""
        }) +
        s.pulsarConfig.map(p => s""","pulsar-config":${pulsarJson(p)}""").getOrElse("") + "}"
    s"""{"id":${jsonStr(cfg.id)},"filter":$filterJson,"sink":$sinkJson""" +
      s""","handle_keys":${jsonArr(cfg.handleKeys)}""" +
      s""","split_update_on_key_change":${cfg.splitUpdateOnKeyChange}""" +
      cfg.syncPointIntervalNs.map(ns => s""","sync_point_interval_ns":$ns""").getOrElse("") +
      cfg.maxFilesPerTrigger.map(n => s""","max_files_per_trigger":$n""").getOrElse("") +
      cfg.targetTs.map(t => s""","target_ts":$t""").getOrElse("") +
      s""","keyspace":${jsonStr(cfg.keyspace)}""" +
      securityJson(cfg.security).map(j => s""","security":$j""").getOrElse("") +
      (if (cfg.syncedStatus == SyncedStatusConfig()) "" else
        s""","synced_status":{"synced_check_interval":${cfg.syncedStatus.syncedCheckInterval},""" +
          s""""checkpoint_interval":${cfg.syncedStatus.checkpointInterval}}""") +
      s""","scheduler":${schedulerJson(cfg.scheduler)}""" +
      (if (cfg.integrity == IntegrityConfig()) "" else
        s""","integrity":{"integrity_check_level":${jsonStr(cfg.integrity.integrityCheckLevel)},""" +
          s""""corruption_handle_level":${jsonStr(cfg.integrity.corruptionHandleLevel)}}""") +
      (if (cfg.consistent == ConsistentConfig()) "" else
        s""","consistent":{"level":${jsonStr(cfg.consistent.level)},""" +
          s""""storage":${jsonStr(cfg.consistent.storage)}}""") +
      "}"
  }

  /** The api/v2 scheduler object — always fully populated, snake_case
    * keys, exactly the shape update_changefeed_check_config diffs
    * against (api/v2 model.go ChangefeedSchedulerConfig). */
  def schedulerJson(sc: SchedulerConfig): String =
    s"""{"enable_table_across_nodes":${sc.enableTableAcrossNodes},""" +
      s""""region_threshold":${sc.regionThreshold},""" +
      s""""region_count_per_span":${sc.regionCountPerSpan},""" +
      s""""region_count_refresh_interval":${sc.regionCountRefreshIntervalNs},""" +
      s""""write_key_threshold":${sc.writeKeyThreshold},""" +
      s""""scheduling_task_count_per_node":${sc.schedulingTaskCountPerNode},""" +
      s""""enable_splittable_check":${sc.enableSplittableCheck},""" +
      s""""force_split":${sc.forceSplit},""" +
      s""""balance_score_threshold":${sc.balanceScoreThreshold},""" +
      s""""min_traffic_percentage":${sc.minTrafficPercentage},""" +
      s""""max_traffic_percentage":${sc.maxTrafficPercentage}}"""

  /** Pulsar block → JSON, kebab keys = sink.go:606-672 json tags. */
  private def pulsarJson(p: Security.PulsarConfig): String = {
    val fields = Seq.newBuilder[String]
    p.authenticationToken.foreach(v => fields += s""""authentication-token":${jsonStr(v)}""")
    p.tokenFromFile.foreach(v => fields += s""""token-from-file":${jsonStr(v)}""")
    p.basicUserName.foreach(v => fields += s""""basic-user-name":${jsonStr(v)}""")
    p.basicPassword.foreach(v => fields += s""""basic-password":${jsonStr(v)}""")
    p.authTlsCertificatePath.foreach(v => fields += s""""auth-tls-certificate-path":${jsonStr(v)}""")
    p.authTlsPrivateKeyPath.foreach(v => fields += s""""auth-tls-private-key-path":${jsonStr(v)}""")
    p.tlsTrustCertsFilePath.foreach(v => fields += s""""tls-trust-certs-file-path":${jsonStr(v)}""")
    p.tlsCertificateFile.foreach(v => fields += s""""tls-certificate-file":${jsonStr(v)}""")
    p.tlsKeyFilePath.foreach(v => fields += s""""tls-key-file-path":${jsonStr(v)}""")
    p.compressionType.foreach(v => fields += s""""compression-type":${jsonStr(v)}""")
    p.producerCacheSize.foreach(v => fields += s""""pulsar-producer-cache-size":$v""")
    p.batchingMaxMessages.foreach(v => fields += s""""batching-max-messages":$v""")
    p.batchingMaxPublishDelayMs.foreach(v => fields += s""""batching-max-publish-delay":$v""")
    p.sendTimeoutSec.foreach(v => fields += s""""send-timeout":$v""")
    p.connectionTimeoutSec.foreach(v => fields += s""""connection-timeout":$v""")
    p.operationTimeoutSec.foreach(v => fields += s""""operation-timeout":$v""")
    if (p.outputRawChangeEvent) fields += s""""output-raw-change-event":true"""
    p.oauth2.foreach { o =>
      val of = Seq.newBuilder[String]
      if (o.issuerUrl.nonEmpty) of += s""""oauth2-issuer-url":${jsonStr(o.issuerUrl)}"""
      if (o.audience.nonEmpty) of += s""""oauth2-audience":${jsonStr(o.audience)}"""
      if (o.scope.nonEmpty) of += s""""oauth2-scope":${jsonStr(o.scope)}"""
      if (o.privateKey.nonEmpty) of += s""""oauth2-private-key":${jsonStr(o.privateKey)}"""
      if (o.clientId.nonEmpty) of += s""""oauth2-client-id":${jsonStr(o.clientId)}"""
      fields += s""""oauth2":${of.result().mkString("{", ",", "}")}"""
    }
    fields.result().mkString("{", ",", "}")
  }

  /** Security block → JSON, kebab keys = the reference's own json tags
    * (credential.go:107-129, sink.go:473-489). None when default. */
  private def securityJson(sec: Security.SecurityConfig): Option[String] = {
    if (sec.isEmpty) None
    else {
      val c = sec.credential
      val s = sec.sasl
      val g = s.gssapi
      val o = s.oauth2
      val fields = Seq.newBuilder[String]
      if (c.caPath.nonEmpty) fields += s""""ca-path":${jsonStr(c.caPath)}"""
      if (c.certPath.nonEmpty) fields += s""""cert-path":${jsonStr(c.certPath)}"""
      if (c.keyPath.nonEmpty) fields += s""""key-path":${jsonStr(c.keyPath)}"""
      if (c.certAllowedCN.nonEmpty) fields += s""""cert-allowed-cn":${jsonArr(c.certAllowedCN)}"""
      if (c.mtls) fields += s""""mtls":true"""
      if (c.clientUserRequired) fields += s""""client-user-required":true"""
      if (c.clientAllowedUser.nonEmpty)
        fields += s""""client-allowed-user":${jsonArr(c.clientAllowedUser)}"""
      if (sec.enableTls) fields += s""""enable-tls":true"""
      if (sec.insecureSkipVerify) fields += s""""insecure-skip-verify":true"""
      if (s.user.nonEmpty) fields += s""""sasl-user":${jsonStr(s.user)}"""
      if (s.password.nonEmpty) fields += s""""sasl-password":${jsonStr(s.password)}"""
      s.mechanism.foreach(m => fields += s""""sasl-mechanism":${jsonStr(m.name.toLowerCase)}""")
      if (g.authType.nonEmpty) fields += s""""sasl-gssapi-auth-type":${jsonStr(g.authType)}"""
      if (g.keytabPath.nonEmpty) fields += s""""sasl-gssapi-keytab-path":${jsonStr(g.keytabPath)}"""
      if (g.kerberosConfigPath.nonEmpty)
        fields += s""""sasl-gssapi-kerberos-config-path":${jsonStr(g.kerberosConfigPath)}"""
      if (g.serviceName.nonEmpty) fields += s""""sasl-gssapi-service-name":${jsonStr(g.serviceName)}"""
      if (g.user.nonEmpty) fields += s""""sasl-gssapi-user":${jsonStr(g.user)}"""
      if (g.password.nonEmpty) fields += s""""sasl-gssapi-password":${jsonStr(g.password)}"""
      if (g.realm.nonEmpty) fields += s""""sasl-gssapi-realm":${jsonStr(g.realm)}"""
      if (g.disablePafxfast) fields += s""""sasl-gssapi-disable-pafxfast":true"""
      if (o.clientId.nonEmpty) fields += s""""sasl-oauth-client-id":${jsonStr(o.clientId)}"""
      if (o.clientSecret.nonEmpty) fields += s""""sasl-oauth-client-secret":${jsonStr(o.clientSecret)}"""
      if (o.tokenUrl.nonEmpty) fields += s""""sasl-oauth-token-url":${jsonStr(o.tokenUrl)}"""
      if (o.scopes.nonEmpty) fields += s""""sasl-oauth-scopes":${jsonArr(o.scopes)}"""
      if (o.grantType != "client_credentials")
        fields += s""""sasl-oauth-grant-type":${jsonStr(o.grantType)}"""
      if (o.audience.nonEmpty) fields += s""""sasl-oauth-audience":${jsonStr(o.audience)}"""
      Some(fields.result().mkString("{", ",", "}"))
    }
  }

  /** v2 API JSON → [[ChangefeedConfig]] (Jackson tree walk). */
  def fromApiJson(json: String): ChangefeedConfig = {
    val root = new ObjectMapper().readTree(json)
    require(root != null && root.isObject, "model JSON must be an object")
    def strsOf(n: JsonNode): Seq[String] = n.elements().asScala.map(_.asText()).toSeq
    def opt(n: JsonNode, k: String): Option[JsonNode] = Option(n.get(k))
    val f = opt(root, "filter").getOrElse(new ObjectMapper().createObjectNode())
    val s = opt(root, "sink").getOrElse(new ObjectMapper().createObjectNode())
    val filter = FilterConfig(
      rules = opt(f, "rules").map(strsOf).getOrElse(Seq("*.*")),
      caseSensitive = opt(f, "case_sensitive").exists(_.asBoolean()),
      ignoreOps = opt(f, "ignore_ops").map(strsOf).getOrElse(Nil),
      ignoreTxnStartTs = opt(f, "ignore_txn_start_ts")
        .map(_.elements().asScala.map(_.asLong()).toSeq).getOrElse(Nil),
      ignoreInsertValueExpr = opt(f, "ignore_insert_value_expr").map(_.asText()),
      ignoreUpdateOldValueExpr = opt(f, "ignore_update_old_value_expr").map(_.asText()),
      ignoreUpdateNewValueExpr = opt(f, "ignore_update_new_value_expr").map(_.asText()),
      ignoreDeleteValueExpr = opt(f, "ignore_delete_value_expr").map(_.asText()),
      ignoreUpdateOnlyColumns = opt(f, "ignore_update_only_columns").map(strsOf).getOrElse(Nil))
    val dispatchers = opt(s, "dispatchers").map(_.elements().asScala.toSeq).getOrElse(Nil).map { d =>
      val cols = opt(d, "columns").map(strsOf).getOrElse(Nil)
      DispatchRule(
        matcher = opt(d, "matcher").map(strsOf).getOrElse(Seq("*.*")),
        partition = opt(d, "partition").map(_.asText()).getOrElse("table") match {
          case "table" => PartitionRule.Table
          case "ts" => PartitionRule.Ts
          case "columns" => PartitionRule.KeyColumns(cols)
          case other => throw new IllegalArgumentException(s"unknown partition rule: $other")
        },
        topic = opt(d, "topic").map(_.asText()),
        targetSchema = opt(d, "target_schema").map(_.asText()),
        targetTable = opt(d, "target_table").map(_.asText()))
    }
    val sink = SinkConfig(
      protocol = opt(s, "protocol").map(n => n.asText() match {
        case "canal-json" => Protocol.CanalJson
        case "open-protocol" => Protocol.Open
        case "debezium" => Protocol.Debezium
        case "csv" => Protocol.Csv
        case "simple" => Protocol.Simple
        case "avro" => Protocol.Avro
        case other => throw new IllegalArgumentException(s"unknown protocol: $other")
      }).getOrElse(Protocol.CanalJson),
      numPartitions = opt(s, "partition_num").map(_.asInt()).getOrElse(16),
      safeMode = opt(s, "safe_mode").exists(_.asBoolean()),
      contentCompatible = opt(s, "content_compatible").exists(_.asBoolean()),
      columnSelector = opt(s, "column_selectors").map(strsOf),
      onlyOutputUpdatedColumns = opt(s, "only_output_updated_columns").exists(_.asBoolean()),
      deleteOnlyOutputHandleKey =
        opt(s, "delete_only_output_handle_key_columns").exists(_.asBoolean()),
      dispatch = if (dispatchers.nonEmpty) dispatchers else Seq(DispatchRule()),
      bdrMode = opt(s, "bdr_mode").exists(_.asBoolean()),
      sendBootstrapIntervalInSec =
        opt(s, "send_bootstrap_interval_in_sec").map(_.asLong()).getOrElse(120L),
      sendBootstrapInMsgCount =
        opt(s, "send_bootstrap_in_msg_count").map(_.asInt()).getOrElse(10000),
      sendBootstrapToAllPartition =
        opt(s, "send_bootstrap_to_all_partition").forall(_.asBoolean()),
      sendAllBootstrapAtStart =
        opt(s, "send_all_bootstrap_at_start").exists(_.asBoolean()),
      maxMessageBytes =
        opt(s, "max_message_bytes").map(_.asInt()).getOrElse(10 * 1024 * 1024),
      schemaRegistry = opt(s, "schema_registry").map(_.asText()).getOrElse(""),
      encodingFormat = opt(s, "encoding_format").map(_.asText()).getOrElse("json"),
      avroDecimalHandlingMode = opt(s, "avro_decimal_handling_mode")
        .map(_.asText()).getOrElse("precise"),
      avroBigintUnsignedHandlingMode = opt(s, "avro_bigint_unsigned_handling_mode")
        .map(_.asText()).getOrElse("long"),
      avroEnableWatermark =
        opt(s, "avro_enable_watermark").exists(_.asBoolean()),
      debeziumDisableSchema =
        opt(s, "debezium_disable_schema").exists(_.asBoolean()),
      mysqlConfig = opt(s, "mysql_config").map { m =>
        MysqlSinkConfig(
          workerCount = opt(m, "worker-count").map(_.asInt()).getOrElse(16),
          maxTxnRow = opt(m, "max-txn-row").map(_.asInt()).getOrElse(256),
          maxMultiUpdateRow =
            opt(m, "max-multi-update-row").map(_.asInt()).getOrElse(40),
          maxMultiUpdateRowSize =
            opt(m, "max-multi-update-row-size").map(_.asInt()).getOrElse(1024),
          enableBatchDml =
            opt(m, "enable-batch-dml").forall(_.asBoolean()))
      }.getOrElse(MysqlSinkConfig()),
      cloudStorageConfig = opt(s, "cloud_storage_config").map { c =>
        CloudStorageSinkConfig(
          workerCount = opt(c, "worker-count").map(_.asInt()).getOrElse(16),
          flushInterval =
            opt(c, "flush-interval").map(_.asText()).getOrElse("5s"),
          fileSize = opt(c, "file-size").map(_.asInt())
            .getOrElse(64 * 1024 * 1024),
          fileExpirationDays =
            opt(c, "file-expiration-days").map(_.asInt()).getOrElse(0),
          fileCleanupCronSpec = opt(c, "file-cleanup-cron-spec")
            .map(_.asText()).getOrElse("0 0 2 * * *"))
      }.getOrElse(CloudStorageSinkConfig()),
      csv = opt(s, "csv").map { c =>
        CsvConfig(
          delimiter = opt(c, "delimiter").map(_.asText()).getOrElse(","),
          quote = opt(c, "quote").map(_.asText()).getOrElse("\""),
          nullString = opt(c, "null").map(_.asText()).getOrElse("\\N"),
          includeCommitTs =
            opt(c, "include-commit-ts").exists(_.asBoolean()),
          binaryEncodingMethod = opt(c, "binary-encoding-method")
            .map(_.asText()).getOrElse("base64"),
          outputOldValue = opt(c, "output-old-value").exists(_.asBoolean()),
          outputFieldHeader =
            opt(c, "output-field-header").exists(_.asBoolean()))
      }.getOrElse(CsvConfig()),
      largeMessageHandle = opt(s, "large_message_handle").map { l =>
        LargeMessageHandle(
          option = opt(l, "large-message-handle-option").map(_.asText())
            .getOrElse(LargeMessageHandle.OptionNone),
          compression = opt(l, "large-message-handle-compression")
            .map(_.asText()).getOrElse("none"),
          claimCheckStorageUri =
            opt(l, "claim-check-storage-uri").map(_.asText()).getOrElse(""),
          claimCheckRawValue =
            opt(l, "claim-check-raw-value").exists(_.asBoolean()))
      }.getOrElse(LargeMessageHandle()),
      pulsarConfig = opt(s, "pulsar-config").map { p =>
        def txt(k: String) = opt(p, k).map(_.asText()).filter(_.nonEmpty)
        Security.PulsarConfig(
          authenticationToken = txt("authentication-token"),
          tokenFromFile = txt("token-from-file"),
          basicUserName = txt("basic-user-name"),
          basicPassword = txt("basic-password"),
          oauth2 = opt(p, "oauth2").map { o =>
            def otxt(k: String) = Option(o.get(k)).map(_.asText()).getOrElse("")
            Security.PulsarOAuth2(
              issuerUrl = otxt("oauth2-issuer-url"),
              audience = otxt("oauth2-audience"),
              scope = otxt("oauth2-scope"),
              privateKey = otxt("oauth2-private-key"),
              clientId = otxt("oauth2-client-id"))
          },
          authTlsCertificatePath = txt("auth-tls-certificate-path"),
          authTlsPrivateKeyPath = txt("auth-tls-private-key-path"),
          tlsTrustCertsFilePath = txt("tls-trust-certs-file-path"),
          tlsCertificateFile = txt("tls-certificate-file"),
          tlsKeyFilePath = txt("tls-key-file-path"),
          compressionType = txt("compression-type"),
          producerCacheSize = opt(p, "pulsar-producer-cache-size").map(_.asInt()),
          batchingMaxMessages = opt(p, "batching-max-messages").map(_.asInt()),
          batchingMaxPublishDelayMs = opt(p, "batching-max-publish-delay").map(_.asLong()),
          sendTimeoutSec = opt(p, "send-timeout").map(_.asLong()),
          connectionTimeoutSec = opt(p, "connection-timeout").map(_.asLong()),
          operationTimeoutSec = opt(p, "operation-timeout").map(_.asLong()),
          outputRawChangeEvent = opt(p, "output-raw-change-event").exists(_.asBoolean()))
      })
    val security = opt(root, "security").map { sec =>
      def txt(k: String) = opt(sec, k).map(_.asText()).getOrElse("")
      def flag(k: String) = opt(sec, k).exists(_.asBoolean())
      Security.SecurityConfig(
        enableTls = flag("enable-tls"),
        insecureSkipVerify = flag("insecure-skip-verify"),
        credential = Security.Credential(
          caPath = txt("ca-path"), certPath = txt("cert-path"), keyPath = txt("key-path"),
          certAllowedCN = opt(sec, "cert-allowed-cn").map(strsOf).getOrElse(Nil),
          mtls = flag("mtls"),
          clientUserRequired = flag("client-user-required"),
          clientAllowedUser = opt(sec, "client-allowed-user").map(strsOf).getOrElse(Nil)),
        sasl = Security.SaslConfig(
          user = txt("sasl-user"), password = txt("sasl-password"),
          mechanism = opt(sec, "sasl-mechanism").map(n =>
            Security.SaslMechanism.fromString(n.asText())),
          gssapi = Security.GssapiConfig(
            authType = txt("sasl-gssapi-auth-type"),
            keytabPath = txt("sasl-gssapi-keytab-path"),
            kerberosConfigPath = txt("sasl-gssapi-kerberos-config-path"),
            serviceName = txt("sasl-gssapi-service-name"),
            user = txt("sasl-gssapi-user"), password = txt("sasl-gssapi-password"),
            realm = txt("sasl-gssapi-realm"),
            disablePafxfast = flag("sasl-gssapi-disable-pafxfast")),
          oauth2 = Security.OAuth2Config(
            clientId = txt("sasl-oauth-client-id"),
            clientSecret = txt("sasl-oauth-client-secret"),
            tokenUrl = txt("sasl-oauth-token-url"),
            scopes = opt(sec, "sasl-oauth-scopes").map(strsOf).getOrElse(Nil),
            grantType = opt(sec, "sasl-oauth-grant-type").map(_.asText())
              .getOrElse("client_credentials"),
            audience = txt("sasl-oauth-audience"))))
    }.getOrElse(Security.SecurityConfig())
    ChangefeedConfig(
      id = opt(root, "id").map(_.asText()).getOrElse("changefeed"),
      filter = filter,
      sink = sink,
      handleKeys = opt(root, "handle_keys").map(strsOf).getOrElse(Seq("user_id")),
      splitUpdateOnKeyChange =
        opt(root, "split_update_on_key_change").forall(_.asBoolean()),
      syncPointIntervalNs = opt(root, "sync_point_interval_ns").map(_.asLong()),
      maxFilesPerTrigger = opt(root, "max_files_per_trigger").map(_.asInt()),
      targetTs = opt(root, "target_ts").map(_.asLong()),
      keyspace = opt(root, "keyspace").map(_.asText()).getOrElse("default"),
      security = security,
      syncedStatus = opt(root, "synced_status").map { ss =>
        SyncedStatusConfig(
          syncedCheckInterval =
            opt(ss, "synced_check_interval").map(_.asLong()).getOrElse(300L),
          checkpointInterval =
            opt(ss, "checkpoint_interval").map(_.asLong()).getOrElse(15L))
      }.getOrElse(SyncedStatusConfig()),
      scheduler = opt(root, "scheduler")
        .map(schedulerFromJson(_, SchedulerConfig()))
        .getOrElse(SchedulerConfig()),
      integrity = opt(root, "integrity").map { in =>
        IntegrityConfig(
          integrityCheckLevel = opt(in, "integrity_check_level")
            .map(_.asText()).getOrElse(IntegrityConfig.CheckLevelNone),
          corruptionHandleLevel = opt(in, "corruption_handle_level")
            .map(_.asText()).getOrElse(IntegrityConfig.HandleLevelWarn))
      }.getOrElse(IntegrityConfig()),
      consistent = opt(root, "consistent").map { cn =>
        ConsistentConfig(
          level = opt(cn, "level").map(_.asText()).getOrElse("none"),
          storage = opt(cn, "storage").map(_.asText()).getOrElse(""))
      }.getOrElse(ConsistentConfig()))
  }

  /** Apply the keys PRESENT in an api/v2 scheduler object onto `base`
    * — the reference's update flow unmarshals the PUT body over the
    * stored config, so absent keys keep their values
    * (update_changefeed_check_config). */
  def schedulerFromJson(n: JsonNode, base: SchedulerConfig): SchedulerConfig = {
    def b(k: String, cur: Boolean) = Option(n.get(k)).map(_.asBoolean()).getOrElse(cur)
    def i(k: String, cur: Int) = Option(n.get(k)).map(_.asInt()).getOrElse(cur)
    def l(k: String, cur: Long) = Option(n.get(k)).map(_.asLong()).getOrElse(cur)
    def d(k: String, cur: Double) = Option(n.get(k)).map(_.asDouble()).getOrElse(cur)
    SchedulerConfig(
      enableTableAcrossNodes = b("enable_table_across_nodes", base.enableTableAcrossNodes),
      regionThreshold = i("region_threshold", base.regionThreshold),
      regionCountPerSpan = i("region_count_per_span", base.regionCountPerSpan),
      regionCountRefreshIntervalNs =
        l("region_count_refresh_interval", base.regionCountRefreshIntervalNs),
      writeKeyThreshold = i("write_key_threshold", base.writeKeyThreshold),
      schedulingTaskCountPerNode =
        i("scheduling_task_count_per_node", base.schedulingTaskCountPerNode),
      enableSplittableCheck = b("enable_splittable_check", base.enableSplittableCheck),
      forceSplit = b("force_split", base.forceSplit),
      balanceScoreThreshold = i("balance_score_threshold", base.balanceScoreThreshold),
      minTrafficPercentage = d("min_traffic_percentage", base.minTrafficPercentage),
      maxTrafficPercentage = d("max_traffic_percentage", base.maxTrafficPercentage))
  }
}
