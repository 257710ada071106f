package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._

/** cmd-surface parity: config-converter (toml ↔ v2 JSON model, fixed
  * exit codes) and filter-helper (table / DDL decisions against the
  * rules), both over the shared minimal-TOML reader. */
class ConfigToolsSpec extends AnyFunSuite {

  private val toml =
    """# changefeed config (reference integration style)
      |case-sensitive = false
      |enable-sync-point = true
      |sync-point-interval = '10m'
      |target-ts = 9999
      |
      |[filter]
      |rules = ['test.*', '!test.skip']   # deny-listed table
      |ignore-txn-start-ts = [1, 2]
      |ignore-insert-value-expr = 'id = 2'
      |
      |[sink]
      |protocol = "canal-json"
      |partition-num = 8
      |safe-mode = true
      |column-selectors = ['user_id', 'balance']
      |
      |[[sink.dispatchers]]
      |matcher = ['test.*']
      |partition = "index-value"
      |columns = ['user_id']
      |topic = 'tp_{schema}'
      |
      |[[sink.dispatchers]]
      |matcher = ['*.*']
      |partition = "ts"
      |""".stripMargin

  test("toml parses into the typed changefeed config") {
    val cfg = ConfigToml.toConfig(ConfigToml.parse(toml), "cf1")
    assert(cfg.filter.rules == Seq("test.*", "!test.skip"))
    assert(cfg.filter.ignoreTxnStartTs == Seq(1L, 2L))
    assert(cfg.filter.ignoreInsertValueExpr.contains("id = 2"))
    assert(cfg.sink.protocol == Protocol.CanalJson)
    assert(cfg.sink.numPartitions == 8 && cfg.sink.safeMode)
    assert(cfg.sink.columnSelector.contains(Seq("user_id", "balance")))
    assert(cfg.sink.dispatch.head.partition == PartitionRule.KeyColumns(Seq("user_id")))
    assert(cfg.sink.dispatch.head.topic.contains("tp_{schema}"))
    assert(cfg.sink.dispatch(1).partition == PartitionRule.Ts)
    assert(cfg.syncPointIntervalNs.contains(600L * 1000000000L))
    assert(cfg.targetTs.contains(9999L))
  }

  test("toml -> json -> config and config -> toml -> config round-trip") {
    val cfg = ConfigToml.toConfig(ConfigToml.parse(toml), "cf1")
    val viaJson = ConfigToml.fromApiJson(ConfigToml.toApiJson(cfg))
    assert(viaJson == cfg, "JSON model round trip must preserve every field")
    val viaToml = ConfigToml.toConfig(ConfigToml.parse(ConfigToml.renderToml(cfg)), "cf1")
    assert(viaToml == cfg, "TOML render round trip must preserve every field")
  }

  test("config-converter exit codes mirror the reference") {
    assert(ConfigConvert.run(Seq("--config", "a", "--model", "b"))._1
      == ConfigToml.ExitInvalidFlag)
    assert(ConfigConvert.run(Nil)._1 == ConfigToml.ExitInvalidFlag)
    assert(ConfigConvert.run(Seq("--config", "/nonexistent.toml"))._1
      == ConfigToml.ExitExecuteFailed)
    val badToml = java.nio.file.Files.createTempFile("bad", ".toml")
    java.nio.file.Files.write(badToml, "rules = @@nope".getBytes)
    assert(ConfigConvert.run(Seq("--config", badToml.toString))._1
      == ConfigToml.ExitDecodeTomlFailed)
    val badJson = java.nio.file.Files.createTempFile("bad", ".json")
    java.nio.file.Files.write(badJson, "[not, an, object]".getBytes)
    assert(ConfigConvert.run(Seq("--model", badJson.toString))._1
      == ConfigToml.ExitDecodeJsonFailed)
  }

  test("config-converter converts both directions losslessly") {
    val tomlFile = java.nio.file.Files.createTempFile("cf", ".toml")
    java.nio.file.Files.write(tomlFile, toml.getBytes)
    val (c1, json) = ConfigConvert.run(Seq("--config", tomlFile.toString))
    assert(c1 == 0, json)
    val jsonFile = java.nio.file.Files.createTempFile("cf", ".json")
    java.nio.file.Files.write(jsonFile, json.getBytes)
    val (c2, tomlOut) = ConfigConvert.run(Seq("--model", jsonFile.toString))
    assert(c2 == 0, tomlOut)
    val a = ConfigToml.toConfig(ConfigToml.parse(toml), "cf")
    val b = ConfigToml.toConfig(ConfigToml.parse(tomlOut), "cf")
    assert(a == b, "toml -> json -> toml must land on the same config")
  }

  test("filter-helper table decisions mirror the reference output") {
    val f = java.nio.file.Files.createTempFile("cf", ".toml")
    java.nio.file.Files.write(f, toml.getBytes)
    val hit = FilterHelper.run(Seq("--config", f.toString, "--table", "test.t1"))
    assert(hit.code == 0 && hit.text == "Table: test.t1, Matched filter rule")
    val miss = FilterHelper.run(Seq("--config", f.toString, "--table", "test.skip"))
    assert(miss.code == 0 && miss.text == "Table: test.skip, Not matched filter rule")
    val other = FilterHelper.run(Seq("--config", f.toString, "--table", "prod.t"))
    assert(other.text.endsWith("Not matched filter rule"))
    val bad = FilterHelper.run(Seq("--table", "no_dot"))
    assert(bad.code == ConfigToml.ExitInvalidFlag)
  }

  test("filter-helper ddl decisions: discard, ignore by class, ignore by regex") {
    val discard = FilterHelper.run(Seq("--rules", "test.*,!test.skip",
      "--table", "test.skip", "--ddl", "DROP TABLE test.skip"))
    assert(discard.text == "DDL: DROP TABLE test.skip, should be discard by event filter rule")
    val byClass = FilterHelper.run(Seq("--rules", "test.*",
      "--table", "test.t1", "--ddl", "DROP TABLE test.t1",
      "--ignore-ddl-classes", "drop table"))
    assert(byClass.text.endsWith("should be ignored by event filter rule"))
    val byRegex = FilterHelper.run(Seq("--rules", "test.*",
      "--table", "test.t1", "--ddl", "DROP TABLE test.t1",
      "--ignore-sql", "^DROP"))
    assert(byRegex.text.endsWith("should be ignored by event filter rule"))
    val keep = FilterHelper.run(Seq("--rules", "test.*",
      "--table", "test.t1", "--ddl", "DROP TABLE test.t1"))
    assert(keep.text.endsWith("should not be discard by event filter rule"))
  }

  test("keyspace + bootstrap cadence survive both config carriers") {
    val cfg = ChangefeedConfig(id = "cf-ks",
      keyspace = "tenant-7",
      sink = SinkConfig(protocol = Protocol.Simple,
        sendBootstrapIntervalInSec = 30L,
        sendBootstrapInMsgCount = 500,
        sendBootstrapToAllPartition = false,
        sendAllBootstrapAtStart = true))
    val viaToml = ConfigToml.toConfig(
      ConfigToml.parse(ConfigToml.renderToml(cfg)), "cf-ks")
    assert(viaToml.keyspace == "tenant-7")
    assert(viaToml.sink.sendBootstrapIntervalInSec == 30L)
    assert(viaToml.sink.sendBootstrapInMsgCount == 500)
    assert(!viaToml.sink.sendBootstrapToAllPartition)
    assert(viaToml.sink.sendAllBootstrapAtStart)
    val viaJson = ConfigToml.fromApiJson(ConfigToml.toApiJson(cfg))
    assert(viaJson == cfg.copy(id = viaJson.id) && viaJson.keyspace == "tenant-7")
  }

  test("synced-status block survives both config carriers with defaults elided") {
    val cfg = ChangefeedConfig(id = "cf-ss",
      syncedStatus = SyncedStatusConfig(syncedCheckInterval = 120L,
        checkpointInterval = 20L))
    val toml = ConfigToml.renderToml(cfg)
    assert(toml.contains("[synced-status]"))
    assert(toml.contains("synced-check-interval = 120"))
    val viaToml = ConfigToml.toConfig(ConfigToml.parse(toml), "cf-ss")
    assert(viaToml.syncedStatus == SyncedStatusConfig(120L, 20L))
    val viaJson = ConfigToml.fromApiJson(ConfigToml.toApiJson(cfg))
    assert(viaJson.syncedStatus == SyncedStatusConfig(120L, 20L))
    // defaults stay out of both wire forms
    val dflt = ChangefeedConfig(id = "cf-dflt")
    assert(!ConfigToml.renderToml(dflt).contains("synced-status"))
    assert(!ConfigToml.toApiJson(dflt).contains("synced_status"))
    assert(ConfigToml.toConfig(ConfigToml.parse(ConfigToml.renderToml(dflt)),
      "cf-dflt").syncedStatus == SyncedStatusConfig())
  }

  test("consistent (redo) block + sink schema-registry survive both carriers " +
      "with defaults elided (pkg/config/consistent.go)") {
    val cfg = ChangefeedConfig(id = "cf-cons",
      consistent = ConsistentConfig("eventual", "file:///tmp/redo"),
      sink = SinkConfig(protocol = Protocol.Avro,
        schemaRegistry = "http://registry:8081"))
    val toml = ConfigToml.renderToml(cfg)
    assert(toml.contains("[consistent]"))
    assert(toml.contains("level = 'eventual'"))
    assert(toml.contains("schema-registry = 'http://registry:8081'"))
    assert(toml.contains("protocol = 'avro'"))
    val viaToml = ConfigToml.toConfig(ConfigToml.parse(toml), "cf-cons")
    assert(viaToml.consistent == cfg.consistent)
    assert(viaToml.sink.schemaRegistry == cfg.sink.schemaRegistry)
    assert(viaToml.sink.protocol == Protocol.Avro)
    val viaJson = ConfigToml.fromApiJson(ConfigToml.toApiJson(cfg))
    assert(viaJson.consistent == cfg.consistent)
    assert(viaJson.sink.schemaRegistry == cfg.sink.schemaRegistry)
    assert(viaJson.sink.protocol == Protocol.Avro)
    // encoding-format (sink.go:456) survives both carriers; the json
    // default stays elided
    val avroFmt = ChangefeedConfig(id = "cf-fmt",
      sink = SinkConfig(protocol = Protocol.Simple, encodingFormat = "avro"))
    val fmtToml = ConfigToml.renderToml(avroFmt)
    assert(fmtToml.contains("encoding-format = 'avro'"))
    assert(ConfigToml.toConfig(ConfigToml.parse(fmtToml), "cf-fmt")
      .sink.encodingFormat == "avro")
    assert(ConfigToml.fromApiJson(ConfigToml.toApiJson(avroFmt))
      .sink.encodingFormat == "avro")
    assert(!ConfigToml.renderToml(ChangefeedConfig(id = "cf-j"))
      .contains("encoding-format"))
    // defaults stay out of both wire forms
    val dflt = ChangefeedConfig(id = "cf-dflt")
    assert(!ConfigToml.renderToml(dflt).contains("[consistent]"))
    assert(!ConfigToml.toApiJson(dflt).contains("consistent"))
    assert(!ConfigToml.toApiJson(dflt).contains("schema_registry"))
    // validate: eventual demands a storage uri; levels are closed
    ConsistentConfig().validate()
    cfg.consistent.validate()
    intercept[IllegalArgumentException] {
      ConsistentConfig("eventual").validate()
    }
    intercept[IllegalArgumentException] { ConsistentConfig("exact") }
  }

  test("[sink.csv] block (sink.go:270-290 CSVConfig) survives both carriers " +
      "with defaults elided — and the reference DEFAULT omits commit-ts") {
    val cfg = ChangefeedConfig(id = "cf-csv",
      sink = SinkConfig(protocol = Protocol.Csv,
        csv = CsvConfig(delimiter = "|", quote = "'", nullString = "NIL",
          includeCommitTs = true, binaryEncodingMethod = "hex",
          outputOldValue = true, outputFieldHeader = true)))
    val toml = ConfigToml.renderToml(cfg)
    assert(toml.contains("[sink.csv]"))
    assert(toml.contains("delimiter = '|'") &&
      toml.contains("null = 'NIL'") &&
      toml.contains("include-commit-ts = true") &&
      toml.contains("binary-encoding-method = 'hex'") &&
      toml.contains("output-old-value = true") &&
      toml.contains("output-field-header = true"), toml)
    val viaToml = ConfigToml.toConfig(ConfigToml.parse(toml), "cf-csv")
    assert(viaToml.sink.csv == cfg.sink.csv)
    val viaJson = ConfigToml.fromApiJson(ConfigToml.toApiJson(cfg))
    assert(viaJson.sink.csv == cfg.sink.csv)
    // a default block stays out of both wire forms, and the parsed
    // default carries the REFERENCE defaults (include-commit-ts=false)
    val dflt = ChangefeedConfig(id = "cf-csv-d",
      sink = SinkConfig(protocol = Protocol.Csv))
    assert(!ConfigToml.renderToml(dflt).contains("[sink.csv]"))
    assert(!ConfigToml.toApiJson(dflt).contains("\"csv\":{"))
    assert(ConfigToml.toConfig(ConfigToml.parse(ConfigToml.renderToml(dflt)),
      "cf-csv-d").sink.csv == CsvConfig())
    assert(!CsvConfig().includeCommitTs)
  }

  test("[sink.mysql-config] + [sink.cloud-storage-config] tuning blocks " +
      "(sink.go:180-181,710-747) survive both carriers with defaults elided") {
    val cfg = ChangefeedConfig(id = "cf-tuning",
      sink = SinkConfig(
        mysqlConfig = MysqlSinkConfig(workerCount = 8, maxTxnRow = 128,
          maxMultiUpdateRow = 20, maxMultiUpdateRowSize = 2048,
          enableBatchDml = false),
        cloudStorageConfig = CloudStorageSinkConfig(flushInterval = "2s",
          fileSize = 1024 * 1024, fileExpirationDays = 7,
          fileCleanupCronSpec = "0 0 4 * * *")))
    val toml = ConfigToml.renderToml(cfg)
    assert(toml.contains("[sink.mysql-config]") &&
      toml.contains("max-txn-row = 128") &&
      toml.contains("max-multi-update-row = 20") &&
      toml.contains("max-multi-update-row-size = 2048") &&
      toml.contains("enable-batch-dml = false") &&
      toml.contains("worker-count = 8"), toml)
    assert(toml.contains("[sink.cloud-storage-config]") &&
      toml.contains("flush-interval = '2s'") &&
      toml.contains("file-size = 1048576") &&
      toml.contains("file-expiration-days = 7") &&
      toml.contains("file-cleanup-cron-spec = '0 0 4 * * *'"), toml)
    val viaToml = ConfigToml.toConfig(ConfigToml.parse(toml), "cf-tuning")
    assert(viaToml.sink.mysqlConfig == cfg.sink.mysqlConfig)
    assert(viaToml.sink.cloudStorageConfig == cfg.sink.cloudStorageConfig)
    val viaJson = ConfigToml.fromApiJson(ConfigToml.toApiJson(cfg))
    assert(viaJson.sink.mysqlConfig == cfg.sink.mysqlConfig)
    assert(viaJson.sink.cloudStorageConfig == cfg.sink.cloudStorageConfig)
    // default blocks stay out of both wire forms
    val dflt = ChangefeedConfig(id = "cf-tuning-d")
    assert(!ConfigToml.renderToml(dflt).contains("mysql-config") &&
      !ConfigToml.renderToml(dflt).contains("cloud-storage-config"))
    assert(!ConfigToml.toApiJson(dflt).contains("mysql_config") &&
      !ConfigToml.toApiJson(dflt).contains("cloud_storage_config"))
    assert(ConfigToml.toConfig(ConfigToml.parse(ConfigToml.renderToml(dflt)),
      "cf-tuning-d").sink.mysqlConfig == MysqlSinkConfig())
  }

  test("avro codec knobs (sink.go:453-455) survive both carriers with " +
      "defaults elided: decimal/bigint-unsigned handling modes + " +
      "avro-enable-watermark") {
    val cfg = ChangefeedConfig(id = "cf-avro-modes",
      sink = SinkConfig(protocol = Protocol.Avro,
        schemaRegistry = "http://registry:8081",
        avroDecimalHandlingMode = "string",
        avroBigintUnsignedHandlingMode = "string",
        avroEnableWatermark = true))
    val toml = ConfigToml.renderToml(cfg)
    assert(toml.contains("avro-decimal-handling-mode = 'string'"))
    assert(toml.contains("avro-bigint-unsigned-handling-mode = 'string'"))
    assert(toml.contains("avro-enable-watermark = true"))
    val viaToml = ConfigToml.toConfig(ConfigToml.parse(toml), "cf-avro-modes")
    assert(viaToml.sink.avroDecimalHandlingMode == "string" &&
      viaToml.sink.avroBigintUnsignedHandlingMode == "string" &&
      viaToml.sink.avroEnableWatermark)
    val viaJson = ConfigToml.fromApiJson(ConfigToml.toApiJson(cfg))
    assert(viaJson.sink.avroDecimalHandlingMode == "string" &&
      viaJson.sink.avroBigintUnsignedHandlingMode == "string" &&
      viaJson.sink.avroEnableWatermark)
    // defaults (precise/long/false) stay out of both wire forms
    val dflt = ChangefeedConfig(id = "cf-avro-dflt",
      sink = SinkConfig(protocol = Protocol.Avro,
        schemaRegistry = "mem://r"))
    assert(!ConfigToml.renderToml(dflt).contains("avro-"))
    assert(!ConfigToml.toApiJson(dflt).contains("avro_"))

    // debezium-disable-schema (sink.go:202) rides the same surface
    val dbz = ChangefeedConfig(id = "cf-dbz-ds",
      sink = SinkConfig(protocol = Protocol.Debezium,
        debeziumDisableSchema = true))
    assert(ConfigToml.renderToml(dbz).contains("debezium-disable-schema = true"))
    assert(ConfigToml.toConfig(ConfigToml.parse(ConfigToml.renderToml(dbz)),
      "cf-dbz-ds").sink.debeziumDisableSchema)
    assert(ConfigToml.fromApiJson(ConfigToml.toApiJson(dbz))
      .sink.debeziumDisableSchema)
    assert(!ConfigToml.renderToml(dflt).contains("debezium-disable-schema"))
  }

  test("integrity block: both carriers, defaults elided, Validate enums closed " +
      "(pkg/integrity/integrity.go:23-75)") {
    val cfg = ChangefeedConfig(id = "cf-int",
      integrity = IntegrityConfig(
        integrityCheckLevel = "correctness", corruptionHandleLevel = "error"))
    val toml = ConfigToml.renderToml(cfg)
    assert(toml.contains("[integrity]"))
    assert(toml.contains("integrity-check-level = 'correctness'"))
    assert(toml.contains("corruption-handle-level = 'error'"))
    val viaToml = ConfigToml.toConfig(ConfigToml.parse(toml), "cf-int")
    assert(viaToml.integrity == cfg.integrity && viaToml.integrity.enabled &&
      viaToml.integrity.errorHandle)
    val viaJson = ConfigToml.fromApiJson(ConfigToml.toApiJson(cfg))
    assert(viaJson.integrity == cfg.integrity)
    // defaults stay out of both wire forms and are disabled
    val dflt = ChangefeedConfig(id = "cf-dflt")
    assert(!ConfigToml.renderToml(dflt).contains("[integrity]"))
    assert(!ConfigToml.toApiJson(dflt).contains("integrity"))
    assert(!dflt.integrity.enabled && !dflt.integrity.errorHandle)
    // Validate: both enums closed (integrity.go:45-56)
    IntegrityConfig().validate()
    cfg.integrity.validate()
    intercept[IllegalArgumentException] {
      IntegrityConfig(integrityCheckLevel = "full").validate()
    }
    intercept[IllegalArgumentException] {
      IntegrityConfig(corruptionHandleLevel = "panic").validate()
    }
  }

  test("scheduler block: carriers, FillMissingWithDefaults, ValidateAndAdjust " +
      "(update_changefeed_check_config)") {
    // invalid/zero fields fall back to defaults (scheduler_config.go:72-100)
    val filled = SchedulerConfig(regionThreshold = -1, regionCountPerSpan = 0,
      minTrafficPercentage = 1.5, maxTrafficPercentage = 0.5,
      balanceScoreThreshold = 0).fillMissingWithDefaults
    assert(filled == SchedulerConfig())

    // disabled cross-node splitting: validation is a no-op
    assert(SchedulerConfig().validateAndAdjust(mysqlDownstream = true) ==
      SchedulerConfig())

    // enabled: too-small write threshold floors at 10 MiB, per-span
    // count clamps to the split threshold, MySQL pins splittable check
    val v = SchedulerConfig(enableTableAcrossNodes = true,
      writeKeyThreshold = 1024, regionThreshold = 50, regionCountPerSpan = 100)
      .validateAndAdjust(mysqlDownstream = true)
    assert(v.writeKeyThreshold == SchedulerConfig.MinWriteKeyThreshold)
    assert(v.regionCountPerSpan == 50)
    assert(v.enableSplittableCheck)
    // force-split overrides the MySQL pinning
    assert(!SchedulerConfig(enableTableAcrossNodes = true, forceSplit = true)
      .validateAndAdjust(mysqlDownstream = true).enableSplittableCheck)
    // out-of-range traffic band rejected
    intercept[IllegalArgumentException] {
      SchedulerConfig(enableTableAcrossNodes = true, maxTrafficPercentage = 0.9)
        .validateAndAdjust(mysqlDownstream = false)
    }

    // both carriers round-trip a non-default block (floats included)
    val cfg = ChangefeedConfig(id = "cf-sched",
      scheduler = SchedulerConfig(enableTableAcrossNodes = true,
        regionThreshold = 5000, minTrafficPercentage = 0.7))
    val viaToml = ConfigToml.toConfig(
      ConfigToml.parse(ConfigToml.renderToml(cfg)), "cf-sched")
    assert(viaToml.scheduler == cfg.scheduler)
    val viaJson = ConfigToml.fromApiJson(ConfigToml.toApiJson(cfg))
    assert(viaJson.scheduler == cfg.scheduler)

    // partial-merge: keys present in the PUT body override, the rest
    // keep the stored values
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree("""{"enable_table_across_nodes":true}""")
    val merged = ConfigToml.schedulerFromJson(node, cfg.scheduler)
    assert(merged == cfg.scheduler.copy(enableTableAcrossNodes = true))
  }

  test("large-message-handle block: both carriers + AdjustAndValidate rules") {
    val lmh = LargeMessageHandle(
      option = LargeMessageHandle.OptionClaimCheck,
      compression = "zstd",
      claimCheckStorageUri = "file:///tmp/claims",
      claimCheckRawValue = true)
    val cfg = ChangefeedConfig(id = "cf-lmh",
      sink = SinkConfig(protocol = Protocol.Simple,
        maxMessageBytes = 1048576, largeMessageHandle = lmh))
    val viaToml = ConfigToml.toConfig(
      ConfigToml.parse(ConfigToml.renderToml(cfg)), "cf-lmh")
    assert(viaToml.sink.largeMessageHandle == lmh, viaToml.sink.largeMessageHandle)
    assert(viaToml.sink.maxMessageBytes == 1048576)
    val viaJson = ConfigToml.fromApiJson(ConfigToml.toApiJson(cfg))
    assert(viaJson.sink.largeMessageHandle == lmh)
    assert(viaJson.sink.maxMessageBytes == 1048576)

    // validation rules (large_message.go:47-96)
    lmh.validate(Protocol.Simple) // claim-check + simple + uri: fine
    intercept[IllegalArgumentException](
      LargeMessageHandle(option = "bogus").validate(Protocol.Open))
    intercept[IllegalArgumentException]( // claim-check without a URI
      LargeMessageHandle(option = LargeMessageHandle.OptionClaimCheck)
        .validate(Protocol.Open))
    intercept[IllegalArgumentException]( // raw value not for open
      LargeMessageHandle(option = LargeMessageHandle.OptionClaimCheck,
        claimCheckStorageUri = "file:///x", claimCheckRawValue = true)
        .validate(Protocol.Open))
    intercept[IllegalArgumentException]( // canal-json needs the extension
      LargeMessageHandle(option = LargeMessageHandle.OptionHandleKeyOnly)
        .validate(Protocol.CanalJson, enableTidbExtension = false))
    LargeMessageHandle(option = LargeMessageHandle.OptionHandleKeyOnly)
      .validate(Protocol.CanalJson, enableTidbExtension = true)
    intercept[IllegalArgumentException]( // csv has no handle-key form
      LargeMessageHandle(option = LargeMessageHandle.OptionHandleKeyOnly)
        .validate(Protocol.Csv))
    intercept[IllegalArgumentException]( // unsupported codec
      LargeMessageHandle(compression = "brotli").validate(Protocol.Open))
    // disabled config never protocol-checks (none is always legal)
    LargeMessageHandle().validate(Protocol.Csv)
  }
}
