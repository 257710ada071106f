package graft

import graft.functions.Decoders
import graft.model.Envelope
import graft.operators.{Materialize, TableDiff}
import graft.sinks.{FileMq, JdbcApplier, MysqlSink}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Standalone consumer harness — the reference's differential
  * verification model (cmd/kafka-consumer/main.go:40,
  * cmd/storage-consumer, tests/integration_tests check_sync_diff):
  * tail a message store, auto-detect the protocol, decode back to the
  * envelope, re-apply through the MySQL sink path onto a REAL SQL
  * engine ([[JdbcApplier]], embedded Derby), and sync-diff the
  * resulting table state against what the message stream itself
  * implies (and optionally against an upstream envelope parquet).
  *
  * Usage:
  * {{{
  * runMain graft.MqConsume <dir> [--source mq|storage]
  *   [--protocol auto|canal-json|canal-json-txn|open|debezium|simple|csv]
  *   [--db <derby-db-name>] [--expect <envelope-parquet-dir>]
  * }}}
  * Prints one JSON summary line; exit 1 when the diff is non-empty
  * (the check_sync_diff contract).
  */
object MqConsume {

  /** Auto-detect the wire protocol from one message value (the
    * reference consumer takes --protocol; auto-detection covers the
    * common case where the value shape is unambiguous). */
  def detect(value: String): String = {
    val v = value.trim
    if (v.startsWith("{\"k\":")) {
      // binary frame wire: dispatch on the value's first decoded byte
      // (avro/decoder.go:94-98 leading-byte dispatch). Confluent rows
      // open with magic 0 + a NON-ZERO int id; the open BATCH wire's
      // value opens with its big-endian uint64 version (= 1), whose
      // first five bytes read as magic 0 + id 0 — the id disambiguates
      val vb = graft.functions.OpenBatch.parseFrame(v)._2
      if (vb.isEmpty) "avro" // delete tombstone
      else vb(0) match {
        case 1 | 2 | 3 => "avro" // ddl / checkpoint / glue header
        case 0 if vb.length >= 5 &&
          java.nio.ByteBuffer.wrap(vb, 1, 4).getInt != 0 => "avro"
        // the simple protocol's avro wire opens with the union index
        // of the Message branch (11 → zigzag varint 0x16)
        case 22 => "simple-avro"
        case _ => "open-batch"
      }
    } else if (v.startsWith("{")) {
      if (v.contains("\"isDdl\"")) {
        if (v.contains("\n{")) "canal-json-txn" else "canal-json"
      } else if (v.contains("\"source\"") || v.contains("\"ts_ms\"")) "debezium"
      else if (v.contains("\"commitTs\"") && v.contains("\"version\"")) "simple"
      else if (v.startsWith("{\"u\":") || v.startsWith("{\"p\":") ||
        v.startsWith("{\"d\":")) "open"
      else "canal-json"
    } else "csv"
  }

  /** Decode messages (string `_key`/`_value` columns) into the
    * normalized envelope frame (`_schema`,`_table`,`_op`,
    * `_commit_ts`,`_start_ts`,`_row_id`,`before`,`after`).
    * `_row_id` is a store-order tiebreak for same-commit-ts rows
    * (protocol commit timestamps order the apply; the decoders keep
    * partition-local row order through the 1:1 parse).
    *
    * `reader` is REQUIRED for the wire formats whose row messages
    * don't self-describe their payload shape (simple-avro rows
    * reference the bootstrap handshake; csv carries bare values) —
    * [[run]] wire-learns it from the feed's handshakes. The
    * self-describing JSON wires ignore it. */
  def decode(msgs: DataFrame, protocol: String,
             reader: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    def readerFor(arm: String): org.apache.spark.sql.types.StructType =
      reader.getOrElse(throw new IllegalArgumentException(
        s"the $arm wire does not describe its row shape per message — " +
          "pass reader= (wire-learned from the feed's bootstrap " +
          "handshake, or the table's known schema)"))
    val env = protocol match {
      case "canal-json" =>
        Decoders.decodeCanal(msgs)
          .withColumn("_commit_ts", col("_commit_ms")).drop("_commit_ms")
      case "canal-json-txn" =>
        // one message per txn, per-row canal messages newline-joined
        val exploded = msgs.withColumn("_value", explode(split(col("_value"), "\n")))
        Decoders.decodeCanal(exploded)
          .withColumn("_commit_ts", col("_commit_ms")).drop("_commit_ms")
      case "open" => Decoders.decodeOpen(msgs)
      case "debezium" => Decoders.decodeDebezium(msgs)
      case "simple" => Decoders.decodeSimple(msgs)
      case "simple-avro" =>
        // the official com.pingcap.simple.avro wire; non-DML message
        // classes (WATERMARK/BOOTSTRAP) drop inside the decode
        graft.functions.SimpleAvroWire.decodeFeed(msgs,
          readerFor("simple-avro"))
      case "csv" =>
        val rdr = readerFor("csv")
        // this harness's feeds ride the engine's pinned storage wire
        // (commit ts included — Codecs.csvLegacy)
        val flat = Decoders.decodeCsvAs(msgs, rdr,
          csv = graft.functions.Codecs.csvLegacy)
        val img = struct(rdr.fieldNames.toSeq.map(col): _*)
        val nullImg = lit(null).cast(
          org.apache.spark.sql.types.StructType(
            rdr.fields.map(_.copy(nullable = true))))
        // csv carries one image: post for I/U, pre for D; the U
        // pre-image shares the handle key, which is all apply needs
        flat.select(
          col("_schema"), col("_table"), col("_op"), col("_commit_ts"),
          when(col("_op") === "I", nullImg).otherwise(img).as("before"),
          when(col("_op") === "D", nullImg).otherwise(img).as("after"))
      case "avro" => throw new IllegalArgumentException(
        "this is an avro-protocol (or debezium-avro) frame store: run with " +
          "--protocol avro --registry <uri> (the registry resolves the " +
          "writer schemas; auto mode cannot)")
      case "open-batch" => throw new IllegalArgumentException(
        "this is an open BATCH wire store: unwrap it with " +
          "unwrapOpenBatchFrames over the feed's frame parquet " +
          "(the kind column drives the unwrap), then consume the events")
      case other => throw new IllegalArgumentException(s"unknown protocol: $other")
    }
    env
      .withColumn("_row_id", monotonically_increasing_id())
      .withColumn("_start_ts", col("_commit_ts") - 1L)
      .filter(col("_schema").isNotNull &&
        (col("after.user_id").isNotNull || col("before.user_id").isNotNull))
  }

  /** Parse the stream's BOOTSTRAP handshakes into per-table apply
    * DDL: ((schema, table) → (columns as (name, sql type), primary-key
    * columns)). The mysqlType→SQL mapping keeps the harness's
    * money-decimal convention (double rides as DECIMAL(18,2) so the
    * sync-diff is engine-stable). Control-plane sized: one collect of
    * the handshake messages only. */
  def bootstrapSchemas(msgs: DataFrame)
      : Map[(String, String), (Seq[(String, String)], Seq[String])] = {
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    msgs.filter(col("_value").contains("\"type\":\"BOOTSTRAP\""))
      .select(col("_value")).collect().iterator.flatMap { r =>
        try {
          val n = mapper.readTree(r.getString(0))
          val ts = n.get("tableSchema")
          val cols = ts.get("columns").elements().asScala.map { c =>
            val mysql = c.get("dataType").get("mysqlType").asText()
            val sql = mysql match {
              case "bigint" => "BIGINT"
              case "int" | "mediumint" => "INTEGER"
              case "smallint" | "tinyint" => "SMALLINT"
              case "double" | "float" | "decimal" => "DECIMAL(18,2)"
              case _ => "VARCHAR(255)"
            }
            c.get("name").asText() -> sql
          }.toSeq
          val pk = ts.get("indexes").elements().asScala
            .find(i => i.get("primary").asBoolean(false))
            .map(_.get("columns").elements().asScala.map(_.asText()).toSeq)
            .getOrElse(Seq.empty)
          val version = Option(ts.get("version")).map(_.asLong(0L)).getOrElse(0L)
          Some((ts.get("schema").asText(), ts.get("table").asText()) ->
            (version, (cols, pk)))
        } catch { case _: Exception => None }
      }
      // an EVOLVING feed re-sends the handshake on schema change
      // (bootstraper.go:259) — the consumer keeps each table's
      // highest-version handshake, so a post-DDL join decodes with
      // the post-DDL shape
      .toSeq.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1)._2 }
  }

  /** Drop control messages (resolved watermarks, bootstrap
    * handshakes, DDL events in every protocol's form) before decoding
    * — value shapes per protocol. */
  def dataMessagesOnly(msgs: DataFrame): DataFrame =
    msgs.filter(length(trim(col("_value"))) > 0 &&
      !col("_value").contains("\"BOOTSTRAP\"") &&
      !col("_value").contains("\"TIDB_WATERMARK\"") &&
      !col("_value").contains("\"type\":\"WATERMARK\"") &&
      !col("_value").startsWith("{\"type\":\"DDL\"") &&
      !col("_value").contains("\"isDdl\":true") &&
      // simple-protocol DDL: the only simple message class carrying sql
      !(col("_value").startsWith("{\"version\":1,\"type\":\"") &&
        col("_value").contains("\"sql\":\"")) &&
      // open two-part DDL value ({"q":...,"t":N}, unwrapped batch wire)
      !col("_value").startsWith("{\"q\":\"") &&
      // debezium schema-change + watermark envelopes
      !col("_value").contains("\"tableChanges\":") &&
      !col("_value").contains("\"op\":\"m\"") &&
      !(col("_value").startsWith("{\"ts\":") && col("_value").endsWith("\"t\":3}")))

  /** Open-BATCH wire records back to per-event string frames: `batch`
    * records explode into their framed events (one `row` frame per
    * event, commit ts from the framed key); `ddl` and `resolved`
    * records unwrap their single framed event. Other kinds (bootstrap
    * handshakes) pass through unchanged. The inverse of the
    * `openBatchWire` sink mode — after this, every existing consumer
    * path (decodeOpen, [[wireDdls]], [[dataMessagesOnly]]) works
    * unchanged on the per-event frames. */
  def unwrapOpenBatchFrames(frames: DataFrame,
                            valueCodec: String = "none"): DataFrame = {
    val un = udf((v: String) => {
      val (kb, vb) = graft.functions.OpenBatch.parseFrame(v)
      graft.functions.OpenBatch.unpackBatch(kb, vb).map { case (k, vv) =>
        // checkpoint events carry an EMPTY value — never compressed
        // (EncodeCheckpointEvent writes the bare zero length prefix)
        val body = if (vv.isEmpty) vv
                   else graft.functions.Compression.decode(valueCodec, vv)
        (new String(k, java.nio.charset.StandardCharsets.UTF_8),
          new String(body, java.nio.charset.StandardCharsets.UTF_8))
      }
    })
    val framed = frames.filter(col("_kind").isin("batch", "ddl", "resolved"))
      .withColumn("__evs", un(col("_value")))
      .select(col("_partition"), col("_kind"), explode(col("__evs")).as("__e"))
      .select(col("_partition"),
        when(col("_kind") === "batch", "row").otherwise(col("_kind")).as("_kind"),
        get_json_object(col("__e._1"), "$.ts").cast("long").as("_commit_ts"),
        col("__e._1").as("_key"), col("__e._2").as("_value"))
    val rest = frames.filter(!col("_kind").isin("batch", "ddl", "resolved"))
      .select(col("_partition"), col("_kind"), col("_commit_ts"),
        lit(null).cast("string").as("_key"), col("_value"))
    framed.unionByName(rest)
  }

  /** Wire DDL events ((commitTs, schema, table, query)) in commit-ts
    * order — the consumer-side half of the evolving feed's DDL
    * emission, covering every emitted form: the protocol-common
    * [[graft.functions.Codecs.ddlMessage]], the canal-JSON DDL
    * (isDdl true; exact ts from the `_tidb` extension), the
    * simple-protocol DDL (`sql` field, DDL-subtype `type`), the
    * debezium schema-change payload, and — when the frame carries a
    * `_key` column (the open batch wire after
    * [[unwrapOpenBatchFrames]]) — the open two-part form (key
    * {ts,scm,tbl,t:2}, value {q,t}). A consumer applies each before
    * any row at or above its ts (DDL-first at equal ts, the
    * event-scanner interleave contract). Control-plane sized: one
    * collect over the DDL messages only. */
  def wireDdls(msgs: DataFrame): Seq[(Long, String, String, String)] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    if (msgs.columns.contains("_key")) {
      val open = msgs
        .filter(coalesce(col("_key"), lit("")).contains("\"t\":2"))
        .select(col("_key"), col("_value")).collect().map { r =>
          val k = mapper.readTree(r.getString(0))
          val v = mapper.readTree(r.getString(1))
          (k.get("ts").asLong(0L), k.get("scm").asText(""),
            k.get("tbl").asText(""), v.get("q").asText(""))
        }.toSeq
      val others = wireDdls(msgs.filter(
        coalesce(col("_key"), lit("")).contains("\"t\":2") === false)
        .select(col("_value")))
      return (open ++ others).sortBy(_._1)
    }
    msgs.filter(
        col("_value").startsWith("{\"type\":\"DDL\"") ||
        col("_value").contains("\"isDdl\":true") ||
        col("_value").contains("\"tableChanges\":") ||
        (col("_value").startsWith("{\"version\":1,\"type\":\"") &&
          col("_value").contains("\"sql\":\"")))
      .select(col("_value")).collect().map { r =>
        val n = mapper.readTree(r.getString(0))
        def s(k: String) = Option(n.get(k)).map(_.asText("")).getOrElse("")
        if (n.has("isDdl")) // canal form
          (Option(n.get("_tidb")).flatMap(t => Option(t.get("commitTs")))
            .map(_.asLong(0L)).getOrElse(
              Option(n.get("es")).map(_.asLong(0L) * 1000000L).getOrElse(0L)),
            s("database"), s("table"), s("sql"))
        else if (n.has("payload")) { // debezium schema-change form
          val p = n.get("payload")
          def ps(k: String) = Option(p.get(k)).map(_.asText("")).getOrElse("")
          (Option(p.get("source")).flatMap(src => Option(src.get("commit_ts")))
            .map(_.asLong(0L)).getOrElse(0L),
            ps("databaseName"),
            Option(p.get("source")).flatMap(src => Option(src.get("table")))
              .map(_.asText("")).getOrElse(""),
            ps("ddl"))
        } else if (n.has("sql")) // simple form (schema rides the handshake)
          (Option(n.get("commitTs")).map(_.asLong(0L)).getOrElse(0L),
            s("database"), s("table"), s("sql"))
        else // protocol-common form
          (Option(n.get("commitTs")).map(_.asLong(0L)).getOrElse(0L),
            s("schema"), s("table"), s("query"))
      }.toSeq.sortBy(_._1)
  }

  final case class Summary(protocol: String, messages: Long, applied: Long,
                           tables: Long, diffs: Long, expectDiffs: Long,
                           corrupted: Long = 0L)

  /** Standalone AVRO changefeed consumer (reference cmd/kafka-consumer
    * with avro/decoder.go:680): tail the feed's frame store, resolve
    * EVERY schema through the registry uri alone (a separate process's
    * view — nothing rides in-JVM state), replay the 0x01 control
    * events as downstream DDL (CREATEs build the tables, ALTERs evolve
    * them — the consumer learns the world from the wire), decode rows
    * of BOTH schema eras by their carried writer ids with the
    * registry-latest reader, re-apply through the MySQL sink path onto
    * embedded Derby keyed on the registry-learned handle key, and diff
    * the downstream against the stream-implied state.
    *
    * `dir` is the feed's MQ frame store (`_partition`,`_commit_ts`,
    * `_kind`,`_value` parquet — the transport a Kafka topic stands in
    * for); `topic` is the changefeed id the subjects were registered
    * under. */
  def runAvro(spark: SparkSession, dir: String, registryUri: String,
              topic: String, dbName: String = "avroconsume"): Summary = {
    import graft.functions.AvroWire
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.expressions.Window
    // mergeSchema: row frames carry `_offset` (the producer's
    // per-event apply order) while control frames may not — a
    // single-footer read could silently drop the column
    val frames = spark.read.option("mergeSchema", "true").parquet(dir)
    val rows = frames.filter(col("_kind") === "row")
    // control plane (driver-sized by the Spark-side frame predicate):
    // DDLs build/evolve the downstream in commit-ts order
    val ddls = AvroWire.controlEvents(frames)
      .collect { case Left((q, _, s, t, ts)) => (ts, s, t, q) }.sortBy(_._1)
    // a frame store with rows but NO 0x01 control events is not an
    // avro-PROTOCOL feed (e.g. a debezium-avro topic, which has no
    // per-frame DDL events) — fail loud instead of consuming zero
    // tables and reporting a false clean diff
    require(ddls.nonEmpty || rows.isEmpty,
      "no avro DDL control events found on a non-empty feed — either the " +
        "producer ran without avro-enable-watermark (0x01 events ship only " +
        "under that knob, encoder.go:125) or this is not an avro-protocol " +
        "frame store (a debezium encoding-format=avro feed decodes via " +
        "DebeziumAvroWire.decodeFeed, not this consumer)")
    val applier = JdbcApplier.inMemory(dbName)
    applier.ensureMetaTables()
    ddls.foreach { case (ts, _, _, q) =>
      graft.streaming.Changefeed.executeDdlDownstream(
        applier, s"consumer-$topic", ts, q)
    }
    val tables = ddls.map(d => (d._2, d._3)).distinct
    // the registry carries SANITIZED avro field names while the
    // downstream tables are created from the wire DDL's REAL column
    // names — recover the mapping from the parsed DDL stream so SQL
    // identifiers match (sanitize-identical names pass through)
    val realCols = scala.collection.mutable.Map.empty[(String, String), Seq[String]]
    ddls.foreach { case (ts, _, _, q) =>
      graft.model.DdlParser.parse(q, ts).foreach {
        case graft.model.DdlAction.CreateTable(s2, t2, cols2, _, _) =>
          realCols((s2, t2)) = cols2.map(_.name)
        case graft.model.DdlAction.AddColumn(s2, t2, c2, _) =>
          realCols.updateWith((s2, t2))(v => Some(v.getOrElse(Nil) :+ c2.name))
        case _ => ()
      }
    }
    var applied = 0L
    var diffs = 0L
    tables.foreach { case (s, t) =>
      // reader + apply key learned from the REGISTRY, not out-of-band
      val reader = AvroWire.readerFromRegistry(registryUri, topic, s, t)
      val keys = AvroWire.keysFromRegistry(registryUri, topic, s, t)
      def realName(san: String): String =
        realCols.get((s, t))
          .flatMap(_.find(n => AvroWire.sanitize(n) == san)).getOrElse(san)
      val realReader = org.apache.spark.sql.types.StructType(
        reader.fields.map(f => f.copy(name = realName(f.name))))
      val realKeys = keys.map(realName)
      // pre-filter frames by the table's registered KEY ids so other
      // tables' rows never avro-decode for this pass (confluent frames
      // carry the id at bytes 2-5; glue feeds fall back to decode-all)
      val tableRows0 =
        if (AvroWire.isGlue(registryUri)) rows
        else {
          // idsFor, NOT versions: frames carry GLOBAL schema ids at
          // bytes 2-5 while versions(subject) returns 1-based version
          // numbers on a real Confluent registry
          val kIds = AvroWire.registryFor(registryUri)
            .idsFor(AvroWire.keySubject(topic, s, t))
          if (kIds.isEmpty) rows
          else {
            val idBytes = kIds.map(i =>
              java.nio.ByteBuffer.allocate(4).putInt(i).array())
            rows.filter(
              substring(unbase64(get_json_object(col("_value"), "$.k")), 2, 4)
                .isin(idBytes: _*))
          }
        }
      val dec = AvroWire.decodeFeedAs(tableRows0, registryUri, reader)
        .filter(col("_schema") === s && col("_table") === t)
      val img = struct(reader.fieldNames.toSeq.map(n =>
        col(n).as(realName(n))): _*)
      val env = dec.select(col("_schema"), col("_table"),
          when(col("_op") === "c", lit("I")).when(col("_op") === "d", lit("D"))
            .otherwise(lit("U")).as("_op"),
          col("_commit_ts"),
          when(col("_op") === "d", img).as("before"),
          when(col("_op") =!= "d", img).as("after"),
          (if (dec.columns.contains("_offset")) col("_offset")
           else lit(null).cast("long")).as("_offset"))
        // apply-order tiebreak for same-commit-ts rows of one key:
        // the frame `_offset` (the producer's per-event order — the
        // Kafka offset a reference consumer replays by); pre-offset
        // stores fall back to partition-local read order
        .withColumn("_row_id",
          coalesce(col("_offset"), monotonically_increasing_id()))
        .drop("_offset")
        .withColumn("_start_ts", col("_commit_ts") - 1L)
        .persist()
      applied += env.count()
      MysqlSink.applyBatch(env, realKeys, numWorkers = 4, safeMode = true)(
        JdbcApplier.executeFor(applier.url))
      // stream-implied final state (last writer per handle key wins,
      // deletes erase) vs the real downstream rows
      val keyCols = realKeys.map(k2 =>
        coalesce(col(s"after.$k2"), col(s"before.$k2")).as(s"__key_$k2"))
      val w = Window.partitionBy(realKeys.map(k2 => col(s"__key_$k2")): _*)
        .orderBy(col("_commit_ts").desc, col("_row_id").desc)
      val expected = env.select(Seq(col("_op"), col("_commit_ts"),
          col("_row_id"), col("after")) ++ keyCols: _*)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1 && col("_op") =!= "D")
        .select(realReader.fieldNames.toSeq.map(n => col(s"after.$n").as(n)): _*)
      val actualRows = applier.tableRows(s, t, realReader.fieldNames.toSeq)
        .map(vs => Row.fromSeq(vs))
      val actual = spark.createDataFrame(
        java.util.Arrays.asList(actualRows: _*), realReader)
      diffs += graft.operators.TableDiff.diff(expected, actual, realKeys).count()
      env.unpersist()
    }
    Summary("avro", rows.count(), applied, tables.size.toLong, diffs, 0L)
  }

  /** Consume → decode → re-apply (real JDBC) → sync-diff.
    *
    * `verifyChecksum` (the reference consumer's enable-row-checksum
    * verification, VerifyChecksum verify_checksum.go:34-86): on the
    * simple protocol, recompute the CRC32 row checksum from decoded
    * wire values and compare to the carried block. "warn" counts and
    * forwards corrupted rows (Summary.corrupted); "error" throws —
    * the corruption-handle-level error stance that stops the feed. */
  def run(spark: SparkSession, dir: String, source: String = "mq",
          protocol: String = "auto", dbName: String = "mqconsume",
          expect: Option[String] = None,
          verifyChecksum: Option[String] = None): Summary = {
    val raw = source match {
      case "storage" =>
        spark.read.text(dir)
          .withColumnRenamed("value", "_value")
          .withColumn("_key", lit(null).cast("string"))
          .withColumn("offset", monotonically_increasing_id())
      case _ =>
        FileMq.read(spark, dir)
          .select(col("key").cast("string").as("_key"),
            col("value").cast("string").as("_value"),
            // global replay order: partition-major, then offset
            (col("partition").cast("long") * 1000000000L + col("offset")).as("offset"))
    }
    val data = dataMessagesOnly(raw)
    val proto =
      if (protocol != "auto") protocol
      else {
        // sample a few messages: a single-row canal TXN message is
        // indistinguishable from plain canal-json (and decodes
        // identically), so any multi-row message decides
        val samples = data.select(col("_value")).limit(20)
          .collect().map(r => detect(r.getString(0)))
        if (samples.contains("canal-json-txn")) "canal-json-txn"
        else samples.headOption.getOrElse("canal-json")
      }
    // reader for the non-self-describing wires: simple-avro learns it
    // from the feed's own bootstrap handshake (never hard-coded); csv
    // has NO wire handshake, so this harness's sync-diff half supplies
    // its fixture payload shape explicitly — the shape lives HERE, at
    // the fixture-harness call site, not inside the generic decoder
    val readerOpt: Option[StructType] = proto match {
      case "simple-avro" =>
        val learned = graft.functions.SimpleAvroWire
          .bootstrapReaders(raw.select(col("_value")))
        require(learned.nonEmpty,
          "simple-avro feed carries no BOOTSTRAP handshake — cannot " +
            "learn the row shape from the wire")
        require(learned.values.toSet.size == 1,
          s"tables with different shapes on one feed: ${learned.keys}; " +
            "decode them per-table with SimpleAvroWire.decodeFeed")
        Some(learned.values.head)
      case "csv" => Some(StructType(Seq(
        StructField("user_id", LongType), StructField("value", DoubleType),
        StructField("k", LongType))))
      case _ => None
    }
    val env = decode(data, proto, readerOpt)

    // e2e checksum verification (simple protocol carries the block,
    // in both encoding formats)
    val corrupted: Long = verifyChecksum match {
      case Some(level) if proto == "simple-avro" =>
        // column ORDER for the recompute comes from the avro handshake
        val order = graft.functions.SimpleAvroWire
          .bootstrapSchemas(raw.select(col("_value")))
          .map { case (k, (cols, _)) => k -> cols.map(_._1) }
        val bad = graft.functions.SimpleAvroWire.countCorrupted(data, order)
        if (bad > 0 && level == "error")
          throw new IllegalStateException(
            s"row checksum mismatch on $bad rows (corruption-handle-level=error)")
        bad
      case Some(level) if proto == "simple" =>
        val decoded = Decoders.decodeSimple(data, withChecksum = true)
        val bad = graft.functions.RowChecksum
          .verify(decoded, graft.functions.Codecs.envelopeCols)
          .filter(!col("_checksum_ok")).count()
        if (bad > 0 && level == "error")
          throw new IllegalStateException(
            s"row checksum mismatch on $bad rows (corruption-handle-level=error)")
        bad
      case _ => 0L
    }

    // re-apply through the sink path onto embedded Derby. The apply
    // DDL comes from the wire when the stream carries BOOTSTRAP
    // handshakes (simple protocol, either encoding format): schema,
    // column list, and primary key are all learned from the handshake
    // message, so a consumer joining mid-stream needs no out-of-band
    // schema knowledge.
    val wireSchemas =
      if (proto == "simple-avro")
        graft.functions.SimpleAvroWire.bootstrapSchemas(raw.select(col("_value")))
      else bootstrapSchemas(raw)
    val applier = JdbcApplier.inMemory(dbName)
    val tables = env.select(col("_schema"), col("_table")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    tables.foreach { case (s, t) =>
      val (cols, pk) = wireSchemas.getOrElse((s, t),
        (Seq("user_id" -> "BIGINT", "value" -> "DECIMAL(18,2)", "k" -> "BIGINT"),
          Seq("user_id")))
      applier.createTable(s, t, cols, pk)
    }
    // safe mode: the consumer replays at-least-once delivery, the
    // reference consumer's idempotent-apply stance
    MysqlSink.applyBatch(env, Seq("user_id"), numWorkers = 4, safeMode = true)(
      JdbcApplier.executeFor(applier.url))

    // state implied by the stream itself
    val expected = Materialize.tableState(env)
      .select(col("_schema"), col("_table"), col("user_id"), col("value"), col("k"))
    val actualRows = tables.flatMap { case (s, t) =>
      applier.tableRows(s, t, Seq("user_id", "value", "k")).map(r =>
        org.apache.spark.sql.Row(s, t,
          r(0).asInstanceOf[Number].longValue(),
          r(1).asInstanceOf[java.math.BigDecimal].doubleValue(),
          r(2).asInstanceOf[Number].longValue()))
    }
    val actual = spark.createDataFrame(
      java.util.Arrays.asList(actualRows: _*),
      StructType(Seq(
        StructField("_schema", StringType), StructField("_table", StringType),
        StructField("user_id", LongType), StructField("value", DoubleType),
        StructField("k", LongType))))
    val diffs = TableDiff.diff(expected, actual,
      Seq("_schema", "_table", "user_id")).count()

    // optional upstream diff (the cross-system half of check_sync_diff)
    val expectDiffs = expect.map { p =>
      val upstream = Materialize.tableState(spark.read.parquet(p))
        .select(col("_schema"), col("_table"), col("user_id"), col("value"), col("k"))
      TableDiff.diff(upstream, actual, Seq("_schema", "_table", "user_id")).count()
    }.getOrElse(0L)

    Summary(proto, data.count(), env.count(), tables.size.toLong, diffs,
      expectDiffs, corrupted)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MqConsume <dir> [--source mq|storage] " +
      "[--protocol auto|...] [--db name] [--expect dir]")
    val dir = args(0)
    def opt(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    try {
      val proto = opt("--protocol").getOrElse("auto")
      val s = if (proto == "avro")
        runAvro(spark, dir,
          registryUri = opt("--registry").getOrElse(sys.error(
            "--protocol avro needs --registry <uri>")),
          topic = opt("--topic").getOrElse("graft"),
          dbName = opt("--db").getOrElse("avroconsume"))
      else run(spark, dir,
        source = opt("--source").getOrElse("mq"),
        protocol = proto,
        dbName = opt("--db").getOrElse("mqconsume"),
        expect = opt("--expect"),
        verifyChecksum = opt("--verify-checksum"))
      println(s"""{"protocol":"${s.protocol}","messages":${s.messages},""" +
        s""""applied":${s.applied},"tables":${s.tables},""" +
        s""""diffs":${s.diffs},"expect_diffs":${s.expectDiffs},""" +
        s""""corrupted":${s.corrupted}}""")
      if (s.diffs + s.expectDiffs > 0) sys.exit(1)
    } finally spark.stop()
  }
}
