package graft.model

/** Changefeed configuration ADT — mirrors the reference's user-facing
  * config surface (FilterConfig pkg/config/filter.go:21-47, SinkConfig
  * pkg/config/sink.go:139-200, DispatchRule pkg/config/sink.go:409-440)
  * re-expressed as plain Scala data.
  */
final case class FilterConfig(
    rules: Seq[String] = Seq("*.*"),
    caseSensitive: Boolean = false,
    ignoreOps: Seq[String] = Nil,
    ignoreTxnStartTs: Seq[Long] = Nil,
    ignoreInsertValueExpr: Option[String] = None,
    ignoreUpdateOldValueExpr: Option[String] = None,
    ignoreUpdateNewValueExpr: Option[String] = None,
    ignoreDeleteValueExpr: Option[String] = None,
    ignoreUpdateOnlyColumns: Seq[String] = Nil)

sealed trait PartitionRule
object PartitionRule {
  case object Table extends PartitionRule
  case object Ts extends PartitionRule
  final case class KeyColumns(cols: Seq[String]) extends PartitionRule
  /** Pin a table's rows to one worker partition — the data-plane
    * effect of api/v2 move_table (a span moves to a chosen node). */
  final case class Fixed(partition: Int) extends PartitionRule
  /** Fan a table's rows over `parts` sub-partitions (span split —
    * api/v2 split_table / the write-bytes splitter,
    * maintainer/split/splitter.go:41-65). Per-table ordering is
    * intentionally given up, exactly like a split table span. */
  /** Span split: fan the table over `parts` adjacent slots. With
    * `keyCols` (the handle keys) the salt is the delete-aware key
    * image, so one key keeps ONE partition across the split — the
    * reference's key-range span property that keeps per-key order
    * under split tables (maintainer/split/splitter.go key-range
    * spans). Empty `keyCols` salts by `_row_id` (keyless tables:
    * every row its own key). */
  final case class TableSplit(parts: Int, keyCols: Seq[String] = Nil) extends PartitionRule
  /** Split a table's rows across CHOSEN worker partitions — the
    * data-plane effect of api/v2 move_split_table (split a hot span
    * AND pin where the pieces land). */
  final case class SplitFixed(targets: Seq[Int]) extends PartitionRule
}

final case class DispatchRule(
    matcher: Seq[String] = Seq("*.*"),
    partition: PartitionRule = PartitionRule.Table,
    topic: Option[String] = None,
    targetSchema: Option[String] = None,
    targetTable: Option[String] = None)

sealed trait Protocol
object Protocol {
  case object CanalJson extends Protocol
  case object Open extends Protocol
  case object Debezium extends Protocol
  case object Csv extends Protocol
  case object Simple extends Protocol
  /** Confluent-framed Avro with a schema-registry round trip per
    * (topic, table-version) — [[graft.functions.AvroWire]]. */
  case object Avro extends Protocol
}

/** CSV codec block (pkg/config/sink.go:270-290 CSVConfig; defaults
  * replica_config.go:68-73 — note `include-commit-ts` defaults FALSE
  * in the reference, so a default reference config ships csv lines
  * WITHOUT the commit-ts column). Validation mirrors
  * `validateAndAdjust` (sink.go:292-345). */
final case class CsvConfig(
    /** 1-3 characters, no CR/LF, disjoint from `quote`. */
    delimiter: String = ",",
    /** One quoting character ("" = backslash-escape mode,
      * csv_message.go:208-244 formatWithEscapes). */
    quote: String = "\"",
    nullString: String = "\\N",
    includeCommitTs: Boolean = false,
    /** base64 | hex (csv_message.go:286-293). */
    binaryEncodingMethod: String = "base64",
    /** Update ships as a D+I record pair with the is-updated meta
      * column (csv_message.go:104-140). */
    outputOldValue: Boolean = false,
    /** `ticdc-meta$...` header line leads each message/file
      * (csv_message.go:418-446 encodeHeader). */
    outputFieldHeader: Boolean = false) {

  def isDefault: Boolean = this == CsvConfig()

  /** sink.go:292-345 validateAndAdjust, minus the nil/adjust arms. */
  def validate(): Unit = {
    require(quote.length <= 1,
      "csv config quote contains more than one character")
    require(!quote.exists(c => c == '\r' || c == '\n'),
      "csv config quote cannot be line break character")
    require(delimiter.nonEmpty, "csv config delimiter cannot be empty")
    require(delimiter.length <= 3,
      "csv config delimiter contains more than three characters")
    require(!delimiter.exists(c => c == '\r' || c == '\n'),
      "csv config delimiter contains line break characters")
    require(quote.isEmpty || !delimiter.exists(quote.contains(_)),
      "csv config quote and delimiter has common characters which is not allowed")
    require(binaryEncodingMethod == "base64" || binaryEncodingMethod == "hex",
      "csv config binary-encoding-method can only be hex or base64")
  }
}

/** `[sink.mysql-config]` writer-tuning block (pkg/config/sink.go:
  * 710-728; defaults + caps pkg/sink/mysql/config.go:40-81). Drives
  * the statement coalescer: `max-txn-row` caps every multi-row run,
  * `max-multi-update-row`/`-size` additionally cap UPDATE-class runs,
  * `enable-batch-dml=false` forces per-row statements
  * (mysql_writer_dml.go:126-140). */
final case class MysqlSinkConfig(
    workerCount: Int = 16,
    maxTxnRow: Int = 256,
    maxMultiUpdateRow: Int = 40,
    maxMultiUpdateRowSize: Int = 1024,
    enableBatchDml: Boolean = true) {
  def isDefault: Boolean = this == MysqlSinkConfig()
  /** validateAndAdjust (mysql/config.go:554-585): values must be
    * positive; over-cap values CLAMP to the upper limits (the
    * reference warns and clamps rather than rejecting). */
  def adjusted: MysqlSinkConfig = {
    require(workerCount > 0 && maxTxnRow > 0 && maxMultiUpdateRow > 0 &&
        maxMultiUpdateRowSize > 0,
      s"mysql sink config values must be greater than 0: $this")
    copy(
      workerCount = math.min(workerCount, 1024),
      maxTxnRow = math.min(maxTxnRow, 2048),
      maxMultiUpdateRow = math.min(maxMultiUpdateRow, 256),
      maxMultiUpdateRowSize = math.min(maxMultiUpdateRowSize, 8192))
  }
}

/** `[sink.cloud-storage-config]` block (pkg/config/sink.go:730-747;
  * defaults + clamps pkg/cloudstorage/config.go:34-63). `file-size`
  * drives the data-file roll, `flush-interval` the flush cadence
  * (micro-batch trigger period in this engine),
  * `file-expiration-days` + `file-cleanup-cron-spec` the date-
  * partition retention pass ([[graft.sinks.StorageSink
  * .cleanupExpired]]); 0 expiration days = cleanup disabled (the
  * reference default). */
final case class CloudStorageSinkConfig(
    workerCount: Int = 16,
    flushInterval: String = "5s",
    fileSize: Int = 64 * 1024 * 1024,
    fileExpirationDays: Int = 0,
    fileCleanupCronSpec: String = "0 0 2 * * *") {
  def isDefault: Boolean = this == CloudStorageSinkConfig()
  /** flush-interval parsed to ms, clamped to the reference's
    * [100ms, 10m] window (cloudstorage/config.go:41-43). */
  def flushIntervalMs: Long = {
    val p = "^(\\d+)(ms|s|m)$".r
    val raw = flushInterval.trim match {
      case p(n, "ms") => n.toLong
      case p(n, "s") => n.toLong * 1000L
      case p(n, "m") => n.toLong * 60000L
      case other => throw new IllegalArgumentException(
        s"invalid flush-interval '$other' (want e.g. 500ms, 2s, 1m)")
    }
    math.min(math.max(raw, 100L), 600000L)
  }
  /** file-size clamped to [1KiB, 512MiB]
    * (cloudstorage/config.go:55-57). */
  def adjustedFileSize: Int =
    math.min(math.max(fileSize, 1024), 512 * 1024 * 1024)
}

/** Large-message handling block (pkg/config/large_message.go:30-37
  * toml tags; semantics large_message.go:47-116 AdjustAndValidate). */
final case class LargeMessageHandle(
    option: String = LargeMessageHandle.OptionNone,
    compression: String = "none",
    claimCheckStorageUri: String = "",
    claimCheckRawValue: Boolean = false) {
  def handleKeyOnly: Boolean = option == LargeMessageHandle.OptionHandleKeyOnly
  def enableClaimCheck: Boolean = option == LargeMessageHandle.OptionClaimCheck
  def disabled: Boolean = option == LargeMessageHandle.OptionNone
  def isDefault: Boolean = this == LargeMessageHandle()

  /** AdjustAndValidate (large_message.go:47-96): compression always
    * checked; an enabled option demands a handle-key-capable protocol
    * (open/simple; canal-json only with the TiDB extension), a
    * claim-check storage URI, and no raw-value under open. */
  def validate(protocol: Protocol, enableTidbExtension: Boolean = true): Unit = {
    require(graft.functions.Compression.supported(compression),
      s"large message handle compression is not supported, got $compression")
    if (!disabled) {
      require(option == LargeMessageHandle.OptionClaimCheck ||
        option == LargeMessageHandle.OptionHandleKeyOnly,
        s"unknown large-message-handle-option $option")
      protocol match {
        case Protocol.Open | Protocol.Simple => ()
        case Protocol.CanalJson =>
          require(enableTidbExtension,
            s"large message handle is set to $option, protocol is canal-json, " +
              "but enable-tidb-extension is false")
        case other => throw new IllegalArgumentException(
          s"large message handle is set to $option, protocol is $other, " +
            "it's not supported")
      }
      if (enableClaimCheck) {
        require(claimCheckStorageUri.nonEmpty,
          "large message handle is set to claim-check, but the " +
            "claim-check-storage-uri is empty")
        require(!(claimCheckRawValue && protocol == Protocol.Open),
          "large message handle is set to claim-check, raw value is not " +
            "supported for the open protocol")
      }
    }
  }
}
object LargeMessageHandle {
  val OptionNone = "none"
  val OptionClaimCheck = "claim-check"
  val OptionHandleKeyOnly = "handle-key-only"
}

final case class SinkConfig(
    protocol: Protocol = Protocol.CanalJson,
    numPartitions: Int = 16,
    /** Kafka broker message-size cap — the oversize threshold the
      * large-message handling triggers on (pkg/config/sink.go
      * DefaultMaxMessageBytes, 10 MiB). */
    maxMessageBytes: Int = 10 * 1024 * 1024,
    largeMessageHandle: LargeMessageHandle = LargeMessageHandle(),
    safeMode: Boolean = false,
    /** Canal-json content-compatible mode (sink.go:169-170): the
      * mysqlType map renders the FULL TiDB type description the way
      * the official canal deployment does, so canal-adapter consumers
      * can rebuild DDL from it (canal_json_content_compatible). */
    contentCompatible: Boolean = false,
    columnSelector: Option[Seq[String]] = None,
    onlyOutputUpdatedColumns: Boolean = false,
    deleteOnlyOutputHandleKey: Boolean = false,
    dispatch: Seq[DispatchRule] = Seq(DispatchRule()),
    bdrMode: Boolean = false,
    /** Simple-protocol bootstrap re-send cadence (sink.go:191-200 +
      * bootstraper.go): a table's schema handshake is re-sent once
      * either the interval elapses or this many row messages have gone
      * out since the last one, so a consumer joining mid-stream gets a
      * handshake within a bounded message window. Either knob ≤ 0
      * disables re-sending (the reference's negative-disables rule). */
    sendBootstrapIntervalInSec: Long = 120L,
    sendBootstrapInMsgCount: Int = 10000,
    /** false → the handshake goes only to partition 0 of each topic
      * (bootstraper.go:173-176). */
    sendBootstrapToAllPartition: Boolean = true,
    /** true → bootstrap every replicated table once at changefeed
      * start (DefaultSendAllBootstrapAtStart). */
    sendAllBootstrapAtStart: Boolean = false,
    /** Pulsar client/producer block (sink.go:606-672 PulsarConfig),
      * rendered to connector options by Security.pulsarOptions. */
    pulsarConfig: Option[Security.PulsarConfig] = None,
    /** EXPLICIT opt-in to the events-fixture renderer (money-decimal
      * string rendering for the user_id/value/k payload — the
      * oracle-mirrored convention of this deployment's events table).
      * Off, every table flows through the schema-driven generic
      * encoders — the path a real deployment's arbitrary tables take.
      * An explicit flag, NOT payload-shape sniffing: a real table that
      * happens to have those three columns must not silently change
      * rendering. */
    fixtureRenderer: Boolean = false,
    /** Open-protocol BATCH wire (open/encoder.go:40-224): many row
      * events per MQ record under [[maxBatchSize]] and
      * [[maxMessageBytes]], framed as version-headed length-prefixed
      * key/value bytes; DDL and resolved events ride the same framing
      * as single-event records. Open protocol only. */
    openBatchWire: Boolean = false,
    /** max-batch-size (codec/common/config.go:34-35, default 16): the
      * event-count cap per open-protocol batch message. */
    maxBatchSize: Int = 16,
    /** Schema-registry URI for the avro protocol (the sink-uri's
      * `schema-registry` param) — required when protocol = avro,
      * resolved per URI by [[graft.functions.AvroWire.registryFor]]. */
    schemaRegistry: String = "",
    /** `encoding-format` (pkg/config/sink.go:456): "json" (default)
      * or "avro" — the simple protocol ships its messages under the
      * official com.pingcap.simple.avro schema
      * ([[graft.functions.SimpleAvroWire]],
      * kafka_simple_basic_avro), debezium under Confluent-framed
      * envelope records ([[graft.functions.DebeziumAvroWire]], the
      * debezium_avro scenario — needs [[schemaRegistry]]). */
    encodingFormat: String = "json",
    /** `avro-decimal-handling-mode` (pkg/config/sink.go:454; codec
      * default "precise", codec/common/config.go:130): precise →
      * DECIMAL columns ship as avro bytes + logical decimal; string →
      * plain decimal strings (arvo.go:551,657 — a string-mode feed is
      * NOT byte-compatible with a precise one). */
    avroDecimalHandlingMode: String = "precise",
    /** `avro-bigint-unsigned-handling-mode` (sink.go:455; default
      * "long"): long → the u64 bits as avro long; string → the
      * decimal string (arvo.go:637). Unsigned BIGINT rides
      * DecimalType(20,0) in this engine's payloads (the
      * RawKvMounter convention). */
    avroBigintUnsignedHandlingMode: String = "long",
    /** `avro-enable-watermark` (sink.go:453; default FALSE): the 0x01
      * DDL and 0x02 checkpoint control events ship ONLY when enabled
      * (encoder.go:106,125), and deletes carry the 0x03 + commit-ts
      * value instead of the bare key tombstone (arvo.go:130,
      * decoder.go:227). */
    avroEnableWatermark: Boolean = false,
    /** `[sink.csv]` codec block (sink.go:205 `toml:"csv"`). */
    csv: CsvConfig = CsvConfig(),
    /** `debezium-disable-schema` (sink.go:202; codec default false,
      * codec/common/config.go:145): drop the `schema` block from
      * EVERY debezium JSON message — DML envelopes and keys included
      * (codec.go:1023,1131,1284,1460,1653) — leaving the bare
      * `{"payload":...}` wrapper. Halves message size for
      * registry-backed consumers. */
    debeziumDisableSchema: Boolean = false,
    /** `[sink.mysql-config]` writer tuning (sink.go:180). */
    mysqlConfig: MysqlSinkConfig = MysqlSinkConfig(),
    /** `[sink.cloud-storage-config]` (sink.go:181). */
    cloudStorageConfig: CloudStorageSinkConfig = CloudStorageSinkConfig())

/** Span-scheduling knobs (pkg/config/scheduler_config.go:35-69;
  * defaults replica_config.go:105-117). In this engine the split
  * knobs govern the PartitionRule.TableSplit fan-out the maintainer
  * applies; the block is carried faithfully so reference configs and
  * the api/v2 update flow (update_changefeed_check_config) behave
  * identically. */
final case class SchedulerConfig(
    enableTableAcrossNodes: Boolean = false,
    regionThreshold: Int = 10000,
    regionCountPerSpan: Int = 100,
    regionCountRefreshIntervalNs: Long = 300L * 1000000000L,
    writeKeyThreshold: Int = 0,
    schedulingTaskCountPerNode: Int = 20,
    enableSplittableCheck: Boolean = false,
    forceSplit: Boolean = false,
    balanceScoreThreshold: Int = 20,
    minTrafficPercentage: Double = 0.8,
    maxTrafficPercentage: Double = 1.25) {

  /** FillMissingWithDefaults (scheduler_config.go:72-100): invalid or
    * zero numeric fields fall back to the defaults. */
  def fillMissingWithDefaults: SchedulerConfig = {
    val d = SchedulerConfig()
    copy(
      regionThreshold = if (regionThreshold <= 0) d.regionThreshold else regionThreshold,
      regionCountPerSpan =
        if (regionCountPerSpan <= 0) d.regionCountPerSpan else regionCountPerSpan,
      regionCountRefreshIntervalNs =
        if (regionCountRefreshIntervalNs <= 0) d.regionCountRefreshIntervalNs
        else regionCountRefreshIntervalNs,
      writeKeyThreshold =
        if (writeKeyThreshold < 0) d.writeKeyThreshold else writeKeyThreshold,
      schedulingTaskCountPerNode =
        if (schedulingTaskCountPerNode <= 0) d.schedulingTaskCountPerNode
        else schedulingTaskCountPerNode,
      balanceScoreThreshold =
        if (balanceScoreThreshold <= 0) d.balanceScoreThreshold else balanceScoreThreshold,
      minTrafficPercentage =
        if (minTrafficPercentage <= 0 || minTrafficPercentage >= 1) d.minTrafficPercentage
        else minTrafficPercentage,
      maxTrafficPercentage =
        if (maxTrafficPercentage <= 1) d.maxTrafficPercentage else maxTrafficPercentage)
  }

  /** ValidateAndAdjust (scheduler_config.go:103-160): a no-op unless
    * cross-node splitting is on; then bounds-checks every knob,
    * floors a too-small write-key threshold at 10 MiB, clamps
    * region-count-per-span to the split threshold, and pins the
    * splittable check for a MySQL-compatible downstream (always on —
    * splitting a table without a usable PK loses consistency — unless
    * force-split explicitly overrides). */
  def validateAndAdjust(mysqlDownstream: Boolean): SchedulerConfig = {
    if (!enableTableAcrossNodes) this
    else {
      require(regionThreshold >= 0, "region-threshold must be larger than 0")
      require(writeKeyThreshold >= 0, "write-key-threshold must be larger than 0")
      require(schedulingTaskCountPerNode >= 0,
        "scheduling-task-count-per-node must be larger than 0")
      require(regionCountPerSpan > 0, "region-count-per-span must be larger than 0")
      require(regionCountRefreshIntervalNs > 0,
        "region-count-refresh-interval must be larger than 0")
      require(balanceScoreThreshold > 0, "balance-score-threshold must be larger than 0")
      require(minTrafficPercentage > 0 && minTrafficPercentage < 1,
        "min-traffic-percentage must be between 0 and 1")
      require(maxTrafficPercentage > 1, "max-traffic-percentage must be greater than 1")
      val wkt =
        if (writeKeyThreshold > 0 && writeKeyThreshold < SchedulerConfig.MinWriteKeyThreshold)
          SchedulerConfig.MinWriteKeyThreshold
        else writeKeyThreshold
      val rcps =
        if (regionThreshold > 0 && regionCountPerSpan > regionThreshold) regionThreshold
        else regionCountPerSpan
      val splittable =
        if (mysqlDownstream && !forceSplit) true
        else if (forceSplit) false
        else enableSplittableCheck
      copy(writeKeyThreshold = wkt, regionCountPerSpan = rcps,
        enableSplittableCheck = splittable)
    }
  }
}
object SchedulerConfig {
  /** 10 MiB — below this, write-threshold splitting would thrash
    * (scheduler_config.go:29). */
  val MinWriteKeyThreshold = 10485760
}

/** Synced-status thresholds (pkg/config/synced_status_config.go:16-22,
  * defaults replica_config.go:123-126): a feed is "synced" when no new
  * data has arrived for `syncedCheckInterval` seconds AND the sink
  * checkpoint is within `checkpointInterval` seconds of now. Either
  * knob at 0 falls back to the defaults (api/v2/changefeed.go:1661). */
final case class SyncedStatusConfig(
    syncedCheckInterval: Long = 300L,
    checkpointInterval: Long = 15L) {
  def effective: SyncedStatusConfig =
    if (syncedCheckInterval == 0L || checkpointInterval == 0L) SyncedStatusConfig()
    else this
}

/** Integrity block (pkg/integrity/integrity.go:23-75): the e2e row
  * checksum switch. `integrity-check-level` none (default) |
  * correctness (compute/carry/verify the CRC32 row checksum,
  * [[graft.functions.RowChecksum]]); `corruption-handle-level` warn
  * (default — log, mark corrupted, forward) | error (stop the
  * changefeed on a corrupted row). */
final case class IntegrityConfig(
    integrityCheckLevel: String = IntegrityConfig.CheckLevelNone,
    corruptionHandleLevel: String = IntegrityConfig.HandleLevelWarn) {

  /** integrity.go:45-63 Validate: both enums closed. */
  def validate(): Unit = {
    require(integrityCheckLevel == IntegrityConfig.CheckLevelNone ||
      integrityCheckLevel == IntegrityConfig.CheckLevelCorrectness,
      s"integrity-check-level must be none or correctness: $integrityCheckLevel")
    require(corruptionHandleLevel == IntegrityConfig.HandleLevelWarn ||
      corruptionHandleLevel == IntegrityConfig.HandleLevelError,
      s"corruption-handle-level must be warn or error: $corruptionHandleLevel")
  }

  def enabled: Boolean =
    integrityCheckLevel == IntegrityConfig.CheckLevelCorrectness
  def errorHandle: Boolean =
    corruptionHandleLevel == IntegrityConfig.HandleLevelError
}

object IntegrityConfig {
  val CheckLevelNone = "none"
  val CheckLevelCorrectness = "correctness"
  val HandleLevelWarn = "warn"
  val HandleLevelError = "error"
}

/** Consistency (redo WAL) block (pkg/config/consistent.go:25-55):
  * level "none" disables; "eventual" log-aheads every row change and
  * emitted DDL to `storage` BEFORE the sink applies them (pkg/redo
  * writer ordering), so [[graft.sinks.RedoApplier]] can restore the
  * downstream from the log alone after a disaster. */
final case class ConsistentConfig(
    level: String = "none",
    storage: String = "") {
  require(level == "none" || level == "eventual",
    s"unsupported consistent level $level")
  def eventual: Boolean = level == "eventual"
  def validate(): Unit =
    if (eventual) require(storage.nonEmpty,
      "consistent.level=eventual requires consistent.storage")
}

final case class ChangefeedConfig(
    id: String,
    filter: FilterConfig = FilterConfig(),
    sink: SinkConfig = SinkConfig(),
    handleKeys: Seq[String] = Seq("user_id"),
    splitUpdateOnKeyChange: Boolean = true,
    syncPointIntervalNs: Option[Long] = None,
    /** Per-trigger admission cap — the flow-control role of the
      * reference's adaptive scan window / dynstream memory quota
      * (pkg/eventservice/scan_window.go:160-210,
      * docs/design/2024-12-20-ticdc-flow-control.md:36-58): bound how
      * much source data one micro-batch admits so memory stays flat;
      * Spark's backpressure replaces the pause/resume thresholds. */
    maxFilesPerTrigger: Option[Int] = None,
    /** Replication end ts (the reference's target-ts): once the
      * checkpoint reaches it the feed FINISHES — stops cleanly and no
      * longer blocks GC (StateFinished, config/changefeed.go:321). */
    targetTs: Option[Long] = None,
    /** Upstream keyspace (multi-tenant cluster): GC barriers compute
      * per keyspace (changefeed_db.go:345-368). */
    keyspace: String = "default",
    /** Runtime commit-ts floor set by resume-with-overwrite-checkpoint
      * (api/v2 model.go:90): rows at or below it are already
      * replicated by definition of the overwritten checkpoint. Not a
      * user-config field — the carriers don't serialize it. */
    replicateFromTs: Option[Long] = None,
    /** Sink security: mTLS credential + SASL
      * (pkg/security/credential.go:106-129, sasl.go:61-67; kafka
      * sink-URI params options.go:110-139). */
    security: Security.SecurityConfig = Security.SecurityConfig(),
    /** api/v2 model.go:246 SyncedStatus block — thresholds for the
      * GET /changefeeds/{id}/synced decision table. */
    syncedStatus: SyncedStatusConfig = SyncedStatusConfig(),
    /** replica_config.go:181 Scheduler block — span-split and traffic
      * balance knobs, update-mergeable through the API. */
    scheduler: SchedulerConfig = SchedulerConfig(),
    /** pkg/integrity Config — the e2e row-checksum switch. */
    integrity: IntegrityConfig = IntegrityConfig(),
    /** Redo WAL block (pkg/config/consistent.go) — log-ahead on the
      * evolving compositions when level=eventual. */
    consistent: ConsistentConfig = ConsistentConfig())
