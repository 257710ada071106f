package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.GraftSession
import graft.model._
import graft.operators._
import graft.functions.Codecs

/** One changefeed = one Structured Streaming query (SURVEY §3.1-3.2):
  * change-log source → envelope → filter pipeline → transforms →
  * routing → encode → sink, with the streaming checkpoint playing the
  * reference's changefeed checkpoint (resolved-ts persistence) and the
  * micro-batch boundary playing the DDL barrier.
  *
  * The full operator pipeline is batch/stream agnostic
  * (`DataFrame => DataFrame`), so the same code path serves both the
  * oracle-checked batch queries and the streaming runtime — mirroring
  * how the reference's event pipeline is exercised by both its unit
  * and integration harnesses.
  */
object Changefeed {

  /** Filter/transform/route stages (everything before wire encoding) —
    * the shape consumed by row-level sinks (MySQL). */
  def transform(spark: SparkSession, cfg: ChangefeedConfig)(env: DataFrame): DataFrame = {
    val f = cfg.filter
    var df = env
    // overwrite-checkpoint resume floor: ≤ floor means already
    // replicated under the rewritten checkpoint (predicate reaches
    // the change-log scan like any commit-ts bound)
    cfg.replicateFromTs.foreach(ts => df = df.filter(col("_commit_ts") > ts))
    df = Filters.cdcWriteSourceFilter(df) // BDR loop prevention (no-op w/o marker)
    df = Filters.systemSchemaFilter(df)
    df = Filters.tableFilter(df, f.rules, f.caseSensitive)
    df = Filters.eventTypeFilter(df, f.ignoreOps)
    df = Filters.startTsFilter(df, f.ignoreTxnStartTs)
    df = Filters.exprFilter(spark, df,
      f.ignoreInsertValueExpr, f.ignoreUpdateOldValueExpr,
      f.ignoreUpdateNewValueExpr, f.ignoreDeleteValueExpr)
    if (f.ignoreUpdateOnlyColumns.nonEmpty)
      df = Filters.updateOnlyColumnsFilter(df, f.ignoreUpdateOnlyColumns)
    if (cfg.splitUpdateOnKeyChange)
      df = Transforms.updateSplit(df, cfg.handleKeys)
    cfg.sink.columnSelector.foreach { keep =>
      require(Transforms.verifyKeySurvives(keep, cfg.handleKeys),
        s"column selector $keep drops handle keys ${cfg.handleKeys}")
      df = Transforms.columnSelector(df, keep)
    }
    if (cfg.sink.onlyOutputUpdatedColumns)
      df = Transforms.updatedColumnsOnly(df, cfg.handleKeys)
    if (cfg.sink.deleteOnlyOutputHandleKey)
      df = Transforms.deleteHandleKeyOnly(df, cfg.handleKeys)
    Routing.dispatch(df, cfg.sink.dispatch, cfg.sink.numPartitions)
  }

  /** Payload-shape groups of a physical mount plan, each with its
    * handle keys (every table of a group shares the payload shape,
    * hence the key column names — the per-table conflict key). Used by
    * all three evolving compositions so shape-group derivation cannot
    * silently diverge between them. Census-sized (distinct shapes). */
  private[streaming] def shapeGroups[K, S](
      plan: Map[K, Seq[(S, Option[graft.operators.RawKvMounter.KvTableMeta])]],
      defaultKeys: Seq[String])
      : Seq[(Map[K, Seq[(S, Option[graft.operators.RawKvMounter.KvTableMeta])]], Seq[String])] =
    plan.groupBy { case (_, segs) =>
      segs.flatMap(_._2).lastOption
        .map(graft.operators.RawKvMounter.payloadType).orNull
    }.collect { case (pt, g) if pt != null =>
      val keys = g.valuesIterator.flatMap(_.flatMap(_._2)).toSeq.headOption
        .map(_.handleCols).getOrElse(defaultKeys)
      (g, keys)
    }.toSeq

  /** The full filter/transform/route/encode pipeline for one
    * changefeed (MQ/storage sinks consume the encoded `_value`). */
  def pipeline(spark: SparkSession, cfg: ChangefeedConfig)(env: DataFrame): DataFrame =
    encodeFor(spark, cfg)(transform(spark, cfg)(env))

  /** The encode half of [[pipeline]] — protocol dispatch over an
    * already-transformed envelope (split out so the redo WAL can
    * log-ahead the shaped rows between the two halves). */
  def encodeFor(spark: SparkSession, cfg: ChangefeedConfig)(df: DataFrame): DataFrame = {
    // the fixture-payload encoders carry the oracle-mirrored rendering
    // conventions (money-decimal strings for the events payload); the
    // selection is an EXPLICIT config flag — payload-shape sniffing
    // would silently re-render any real table that happens to have the
    // fixture's three column names
    val fixturePayload = cfg.sink.fixtureRenderer
    cfg.sink.protocol match {
      // encoding-format = avro (sink.go:456): the simple protocol
      // ships the official com.pingcap.simple.avro union messages,
      // debezium the Confluent-framed envelope records — both
      // schema-driven, one arm each for fixture and generic feeds
      case Protocol.Simple if cfg.sink.encodingFormat == "avro" =>
        // the integrity block rides the avro DML too (avro.go:276
        // EnableRowChecksum — same CRC32 fold as the JSON form)
        graft.functions.SimpleAvroWire.encodeFeed(df,
          enableRowChecksum = cfg.integrity.enabled)
      case Protocol.Debezium if cfg.sink.encodingFormat == "avro" =>
        graft.functions.DebeziumAvroWire.encodeFeed(df, cfg.handleKeys,
          cfg.sink.schemaRegistry, topic = cfg.id)
      case Protocol.CanalJson if !fixturePayload =>
        Codecs.canalJsonFor(df, cfg.handleKeys)
      case Protocol.Open if !fixturePayload => Codecs.openProtocolFor(df)
      case Protocol.Debezium if !fixturePayload => Codecs.debeziumJsonFor(df)
      case Protocol.Csv if !fixturePayload =>
        Codecs.csvLineFor(df, cfg.sink.csv)
      // avro is schema-driven by construction (the record schema IS
      // the payload shape) — one arm serves fixture and generic feeds
      case Protocol.Avro =>
        graft.functions.AvroWire.encodeFeed(df, cfg.handleKeys,
          cfg.sink.schemaRegistry, topic = cfg.id,
          modes = graft.functions.AvroWire.AvroModes(
            cfg.sink.avroDecimalHandlingMode,
            cfg.sink.avroBigintUnsignedHandlingMode),
          enableWatermark = cfg.sink.avroEnableWatermark)
      case Protocol.CanalJson => Codecs.canalJson(df)
      case Protocol.Open      => Codecs.openProtocol(df)
      case Protocol.Debezium  => Codecs.debeziumJson(df)
      case Protocol.Csv       => Codecs.csvLine(df)
      // enable-row-checksum rides the integrity block: the simple
      // protocol is the wire that carries the e2e CRC32 checksum
      // (simple/message.go:262-263, EnableRowChecksum avro.go:276) —
      // the checksum fold is typed over the fixture payload model, so
      // integrity pins the fixture encoder
      case Protocol.Simple if fixturePayload || cfg.integrity.enabled =>
        Codecs.simpleProtocol(df, cfg.integrity.enabled)
      case Protocol.Simple    => Codecs.simpleProtocolFor(df)
    }
  }

  /** Two-level dispatch for ONE wire DDL job — the driver-side twin of
    * [[graft.operators.Filters.ddlDispatchRenameAware]], applied to the
    * control-plane-sized job list the evolving feed folds per
    * micro-batch (filter.go:53-68; rename decision table
    * persist_storage_ddl_handlers.go:2354-2518): DISCARD when the
    * class is outside the replication whitelist or the target isn't
    * replicated, IGNORE (fold into the store but don't emit) per the
    * ignore rules, EMIT otherwise. Renames re-dispatch through the
    * rename decision table — their emitted query shrinks to the
    * surviving pairs, and a rename INTO the feed fails it with the
    * unretryable CDC:ErrSyncRenameTableFailed. Returns the query to
    * put on the wire. */
  def dispatchDdlJob(job: DdlJobParser.DdlJob, filter: FilterConfig,
                     ignoreClasses: Seq[String] = Nil,
                     ignoreSqlRegexps: Seq[String] = Nil): Option[String] = {
    import graft.operators.{Filters, TableMatcher}
    val q = job.query
    val cls = Filters.ddlClassValue(q)
    def ignored(text: String): Boolean =
      ignoreClasses.contains(cls) ||
        ignoreSqlRegexps.exists(p => p.r.findFirstIn(text).isDefined)
    if (cls == "other ddl") None
    else if (cls == "rename table") {
      val d = Filters.renameDispatch(q, job.schemaName, filter.rules,
        filter.caseSensitive)
      d.action match {
        case "error" =>
          throw new IllegalStateException(s"CDC:ErrSyncRenameTableFailed: $q")
        case "emit" if !ignored(q) => Some(d.query)
        case _ => None
      }
    } else if (cls == "create database" || cls == "drop database" ||
        cls == "alter database") {
      // db-level DDLs affect every table of the schema — the registry
      // always folds them; emission only bows to the ignore rules
      if (ignored(q)) None else Some(q)
    } else if (!TableMatcher.matchesValue(job.schemaName, job.tableName,
        filter.rules, filter.caseSensitive)) None
    else if (ignored(q)) None
    else Some(q)
  }

  /** Parquet change-log stream with the changefeed's admission cap
    * applied (flow control, scan_window.go:160-210). */
  private def sourceStream(spark: SparkSession, cfg: ChangefeedConfig,
                           sourceDir: String): DataFrame = {
    val schema = spark.read.parquet(sourceDir).schema
    val reader = spark.readStream.schema(schema)
    cfg.maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(sourceDir)
  }

  /** MySQL-path changefeed: foreachBatch applies each micro-batch's
    * rows as ordered SQL statements through the conflict-key
    * partitioned writer (SURVEY §2.8 — the reference's
    * mysql sink.AddDMLEvent/Flush cycle). `execute` receives each
    * worker-partition's statement stream, in per-key commit order; in
    * production it opens a JDBC txn, here it is pluggable. */
  /** Syncpoint boundaries a batch's ts range crosses: multiples of
    * `iv` in (lo - iv, hi], floored at iv — the lower window is
    * inclusive so a boundary falling BETWEEN batches still emits on
    * the first batch past it (the idempotent insert drops the overlap
    * with the previous batch). */
  private[graft] def syncPointBounds(lo: Long, hi: Long, iv: Long): Seq[Long] = {
    val first = Math.floorDiv(lo - iv - 1, iv) * iv + iv
    Iterator.iterate(math.max(first, iv))(_ + iv).takeWhile(_ <= hi).toSeq
  }

  def runMysql(spark: SparkSession, cfg: ChangefeedConfig, sourceDir: String,
               checkpointDir: String)(execute: Iterator[String] => Unit): StreamingQuery = {
    GraftSession.tune(spark)
    val env = Envelope.fromEvents(sourceStream(spark, cfg, sourceDir))
    val prologue = graft.sinks.MysqlSink.connectionPrologue(cfg.sink.bdrMode)
    // [sink.mysql-config] writer tuning: a configured block routes the
    // apply through the statement COALESCER with its caps (max-txn-row
    // / max-multi-update-row / -size; enable-batch-dml=false = per-row
    // statements); the default config keeps this engine's established
    // per-row statement stream. worker parallelism stays
    // numPartitions (a Spark-partitioning knob here — worker-count is
    // carried and validated for config fidelity).
    val mysqlTuning = cfg.sink.mysqlConfig
    def apply(rows: DataFrame): Unit =
      if (mysqlTuning.isDefault)
        graft.sinks.MysqlSink.applyBatch(rows, cfg.handleKeys,
          cfg.sink.numPartitions, cfg.sink.safeMode, prologue)(execute)
      else
        graft.sinks.MysqlSink.applyBatchCoalesced(rows, cfg.handleKeys,
          cfg.sink.numPartitions, cfg.sink.safeMode,
          maxBatchRows = mysqlTuning.adjusted.maxTxnRow,
          mysql = mysqlTuning, prologue = prologue)(execute)
    val syncIv = cfg.syncPointIntervalNs.filter(_ > 0)
    transform(spark, cfg)(env)
      .writeStream
      .queryName(cfg.id)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        syncIv match {
          case None => apply(batch)
          case Some(iv) =>
            // SYNC POINTS on the plain MySQL composition — the
            // reference writes the map row for EVERY MySQL-class
            // changefeed (mysql_writer_for_syncpoint.go), not only the
            // evolving one: split at each crossed boundary, rows ≤ b
            // apply, then the idempotent map-row insert, then the rest
            val b = batch.persist()
            try {
              val mm = b.agg(min(col("_commit_ts")), max(col("_commit_ts"))).head()
              val bounds =
                if (mm.isNullAt(0)) Nil
                else syncPointBounds(mm.getLong(0), mm.getLong(1), iv)
              var applied = Long.MinValue
              bounds.foreach { bd =>
                apply(b.filter(col("_commit_ts") > applied &&
                  col("_commit_ts") <= bd))
                applied = bd
                execute(Iterator(
                  graft.sinks.MysqlSink.syncPointStatement(cfg.id, bd, bd)))
                Failpoints.evalThrow("graft/changefeed/mysql-post-syncpoint")
              }
              apply(if (applied == Long.MinValue) b
                else b.filter(col("_commit_ts") > applied))
            } finally { b.unpersist(); () }
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** DDL-barrier-wired changefeed (SURVEY §3.3; reference
    * maintainer/barrier.go:41-323): the schema registry evolves
    * mid-stream. Each micro-batch splits at the commit-ts of every DDL
    * falling inside its range ([[DdlBarrier.plan]]); each step's rows
    * conform to that step's registry snapshot — with mounter defaults
    * for schema columns absent from the data — and flow to `emit`
    * with the step's upper bound.
    *
    * Restart-safe by construction: the registry for a batch is derived
    * purely from (initial, ddls, the batch's commit-ts range) — a DDL
    * with ts ≤ the batch's min commit-ts is already folded in, one
    * inside the range splits the batch (DDL-first at equal ts,
    * event_scanner.go:617-671). Nothing mutable lives on the driver,
    * so a checkpoint replay recomputes identical snapshots. */
  def runWithDdl(spark: SparkSession, cfg: ChangefeedConfig, sourceDir: String,
                 checkpointDir: String, ddls: Seq[DdlAction],
                 initial: SchemaRegistry, payloadCols: Seq[String])
                (emit: (DataFrame, Long) => Unit): StreamingQuery = {
    GraftSession.tune(spark)
    val env = Envelope.fromEvents(sourceStream(spark, cfg, sourceDir))
    transform(spark, cfg)(env)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // fail_over_ddl kill sites (tests/integration_tests/
        // fail_over_ddl_A..O model node kills at distinct points
        // around the DDL barrier): a firing `panic`/`return` fails the
        // batch at that point; the batch is uncommitted so a restart
        // from the checkpoint replays it. Sites, in batch order:
        // pre-barrier (nothing ran), post-registry (snapshots planned,
        // nothing written), pre-write/post-write (around each step's
        // downstream write — post-write leaves a PARTIAL emit the
        // restart must re-cover), post-sink (all writes done, ack not
        // yet recorded — the replay-after-success case).
        Failpoints.evalThrow("graft/ddl/pre-barrier")
        val b = batch.persist()
        try {
          val range = b.agg(min(col("_commit_ts")), max(col("_commit_ts"))).head()
          if (!range.isNullAt(0)) {
            val (lo, hi) = (range.getLong(0), range.getLong(1))
            // checkpoint-cadence compaction (DdlBarrier.compact, the
            // schemastore GC in the live barrier loop): the batch's low
            // watermark IS the feed's checkpoint floor — versions below
            // it can never be read by this or any later batch, so the
            // per-batch registry stays bounded by the post-lo DDL count
            // on a feed of any age. Derivation stays pure (initial,
            // ddls, range) → restart replays compute identical
            // snapshots, compacted or not (the plan-identity proof in
            // DdlBarrierSpec).
            val (registryAtLo, after) = DdlBarrier.compact(initial, ddls, lo)
            val pending = after.filter(_.ts <= hi)
            // dynamic route-conflict fence (table_route_conflict_
            // detection's create-table case): a CREATE TABLE inside
            // this batch that makes two sources route to one target
            // FAILS the feed — ErrTableRouteConflict is unretryable
            if (pending.exists(_.isInstanceOf[DdlAction.CreateTable]))
              graft.operators.Routing.validateRoutes(
                registryAtLo.applyAll(pending).liveTables,
                cfg.sink.dispatch).foreach { msg =>
                throw new IllegalStateException(
                  s"${graft.operators.Routing.RouteConflictCode}: $msg")
              }
            val steps = DdlBarrier.plan(b, pending, registryAtLo)
            Failpoints.evalThrow("graft/ddl/post-registry")
            steps.foreach { s =>
              Failpoints.evalThrow("graft/ddl/pre-write")
              emit(DdlBarrier.conform(s, payloadCols), s.upToTs)
              Failpoints.evalThrow("graft/ddl/post-write")
            }
            Failpoints.evalThrow("graft/ddl/post-sink")
          }
        } finally { b.unpersist(); () }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Full text-DDL changefeed: raw (ts, DDL SQL) control rows run the
    * reference's complete DDL path — two-level dispatch
    * (Filters.ddlDispatch semantics: discard when the table isn't
    * replicated; ignore = fold into the registry but don't emit;
    * emit = fold AND hand to `emitDdl`), parse
    * ([[graft.model.DdlParser]], the ParseDDLJob analog), then the
    * micro-batch barrier of [[runWithDdl]]. */
  def runWithDdlSql(spark: SparkSession, cfg: ChangefeedConfig, sourceDir: String,
                    checkpointDir: String, ddlSql: Seq[(Long, String)],
                    initial: SchemaRegistry, payloadCols: Seq[String],
                    ignoreDdlClasses: Seq[String] = Nil,
                    ignoreDdlSqlRegexps: Seq[String] = Nil)
                   (emit: (DataFrame, Long) => Unit)
                   (emitDdl: (Long, String) => Unit): StreamingQuery = {
    val parsed = ddlSql.sortBy(_._1).flatMap { case (ts, q) =>
      DdlParser.parse(q, ts).map(a => (ts, q, a))
    }
    // dispatch each parsed DDL by its target table + statement; the
    // class taxonomy is shared with the columnar filter (one rule
    // table in Filters — no drift between batch and streaming paths)
    val rules = cfg.filter.rules
    def classOf(q: String): String = graft.operators.Filters.ddlClassValue(q)
    def target(a: DdlAction): (String, String) = a match {
      // db-level DDLs target every table of the schema; the registry
      // must always fold them (the filter below special-cases them)
      case DdlAction.CreateSchema(s, _) => (s, "")
      case DdlAction.DropSchema(s, _) => (s, "")
      case DdlAction.CreateTable(s, t, _, _, _) => (s, t)
      case DdlAction.AddColumn(s, t, _, _) => (s, t)
      case DdlAction.DropColumn(s, t, _, _) => (s, t)
      case DdlAction.ModifyColumn(s, t, _, _) => (s, t)
      case DdlAction.ChangeColumn(s, t, _, _, _) => (s, t)
      case DdlAction.RenameColumn(s, t, _, _, _) => (s, t)
      case DdlAction.RenameTable(s, t, _, _, _) => (s, t)
      case DdlAction.RenameTables(renames, _) =>
        (renames.head.schema, renames.head.table)
      case DdlAction.TruncateTable(s, t, _) => (s, t)
      case DdlAction.DropTable(s, t, _) => (s, t)
      case DdlAction.ExchangeTablePartition(s, t, _, _, _) => (s, t)
      case DdlAction.AddTablePartition(s, t, _) => (s, t)
      case DdlAction.DropTablePartition(s, t, _, _) => (s, t)
      case DdlAction.TruncateTablePartition(s, t, _, _) => (s, t)
      case DdlAction.RecoverTable(s, t, _) => (s, t)
      case DdlAction.AlterMulti(s, t, _, _) => (s, t)
      case DdlAction.BatchActions(actions, _) =>
        actions.headOption.map(target).getOrElse(("", ""))
      case DdlAction.ReorganizePartition(s, t, _) => (s, t)
      case DdlAction.AlterTablePartitioning(s, t, _) => (s, t)
      case DdlAction.RemovePartitioning(s, t, _) => (s, t)
      case DdlAction.SetDefault(s, t, _, _, _) => (s, t)
      case DdlAction.ConvertCharset(s, t, _, _) => (s, t)
    }
    val kept = parsed.filter {
      case (_, _, DdlAction.CreateSchema(_, _)) | (_, _, DdlAction.DropSchema(_, _)) =>
        true // db-level: affects all of the schema's tables
      case (_, _, a) =>
        val (s, t) = target(a)
        graft.operators.TableMatcher.matchesValue(s, t, rules) // else discard
    }
    val ignored = kept.filter { case (_, q, _) =>
      ignoreDdlClasses.contains(classOf(q)) ||
        ignoreDdlSqlRegexps.exists(p => p.r.findFirstIn(q).isDefined)
    }.map(x => (x._1, x._2)).toSet
    // ALL kept DDLs fold into the registry; only non-ignored emit
    kept.collect { case (ts, q, _) if !ignored.contains((ts, q)) => emitDdl(ts, q) }
    runWithDdl(spark, cfg, sourceDir, checkpointDir,
      kept.map(_._3), initial, payloadCols)(emit)
  }

  /** Run a changefeed over a parquet change-log directory as a
    * streaming source, writing encoded messages to `sinkDir` partitioned
    * by the routing assignment. `Trigger.AvailableNow` drains what's
    * there and stops — restart with the same checkpoint resumes
    * exactly-once from the commit log. */
  /** `onBatch`: per-micro-batch driver hook (the heartbeat surface —
    * [[ChangefeedRegistry]] feeds its auto-balance window through it;
    * the default costs nothing). */
  def run(spark: SparkSession, cfg: ChangefeedConfig, sourceDir: String,
          sinkDir: String, checkpointDir: String,
          onBatch: DataFrame => Unit = _ => ()): StreamingQuery = {
    GraftSession.tune(spark)
    val env = Envelope.fromEvents(sourceStream(spark, cfg, sourceDir))
    val out = pipeline(spark, cfg)(env)
    out
      .writeStream
      // the query name is the changefeed id — it becomes the
      // `changefeed` label on every /metrics series the progress
      // listener publishes
      .queryName(cfg.id)
      // foreachBatch append rather than the streaming file sink: the
      // file sink's _spark_metadata pins batch ids to the OUTPUT dir,
      // so a checkpoint rewrite (resume --overwrite-checkpoint-ts
      // rotates to a fresh checkpoint, restarting at batch 0) would
      // silently skip "already committed" batches. Appends are
      // at-least-once under crash-replay — the MQ delivery model this
      // sink represents (consumers dedupe by offset, FileMq.read).
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").partitionBy("_partition").parquet(sinkDir)
        onBatch(batch)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** MQ-path changefeed with RESOLVED-TS emission: each micro-batch
    * writes its encoded rows and then ONE resolved control message at
    * the batch's max commit-ts (the reference broadcasts resolved
    * events to every MQ partition after flushing the rows below it —
    * the consumer-side watermark). Log-then-watermark ordering holds
    * because the control row is written after the batch's data rows
    * within the same foreachBatch. */
  /** send-all-bootstrap-at-start census: the set of tables to
    * handshake before the first row. The reference reads its SCHEMA
    * STORE — a control-plane-sized lookup (bootstraper.go pulls from
    * schemastore, never from the data) — so when a
    * [[graft.model.SchemaRegistry]] is available the census is its
    * key set: a driver-only map read, NO Spark job, O(tables) at any
    * corpus size. Only a registry-less deployment falls back to
    * scanning the change log's own table set (a full-corpus distinct
    * — fine at test scale, a multi-hour create at 100 TB, which is
    * exactly why the registry path is the default). */
  def bootstrapCensus(spark: SparkSession, cfg: ChangefeedConfig,
                      sourceDir: String,
                      registry: Option[graft.model.SchemaRegistry] = None)
      : Seq[(String, String)] =
    if (!(cfg.sink.sendAllBootstrapAtStart &&
        cfg.sink.protocol == Protocol.Simple)) Nil
    else registry match {
      case Some(reg) => reg.liveTables.sorted
      case None =>
        Envelope.fromEvents(spark.read.parquet(sourceDir))
          .select(col("_schema"), col("_table")).distinct()
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    }

  def runMq(spark: SparkSession, cfg: ChangefeedConfig, sourceDir: String,
            sinkDir: String, checkpointDir: String,
            registry: Option[graft.model.SchemaRegistry] = None): StreamingQuery = {
    // static route-conflict check at create (router.go:376
    // ValidateNoConflicts; table_route_conflict_detection): two source
    // tables routing to one target name can never replicate — reject
    // the changefeed before it starts
    registry.foreach { reg =>
      graft.operators.Routing.validateRoutes(
        reg.liveTables, cfg.sink.dispatch).foreach { msg =>
        throw new IllegalArgumentException(
          s"${graft.operators.Routing.RouteConflictCode}: $msg")
      }
    }
    runMqStream(spark, cfg,
      Envelope.fromEvents(sourceStream(spark, cfg, sourceDir)),
      sinkDir, checkpointDir,
      allTablesAtStart = bootstrapCensus(spark, cfg, sourceDir, registry))
  }

  /** [[runMq]] over an arbitrary streaming envelope — the entry the
    * DSv2 changelog generator (and any custom source) feeds. */
  /** The reference's STEADY-STATE shape as ONE streaming query: raw
    * 2PC entries from the region stream → streaming txn matcher
    * (per-txn state across micro-batches) → byte-level mount → the
    * standard filter/transform/route/encode pipeline → MQ sink
    * (region_event_handler.go:263-360 feeding the dispatcher chain;
    * logpuller/txn_matcher.go upstream of the mounter). The matcher's
    * flatMapGroupsWithState state store and the source offsets live
    * under the changefeed's single `checkpointDir`, so a kill-restart
    * recovers them TOGETHER: re-delivered raw entries land on the
    * matcher's tombstones, replayed matched batches land on the file
    * sink's _spark_metadata — exactly-once from raw bytes to wire.
    * `metas`: the table schemas to mount (one shared payload shape;
    * unknown table ids and non-record keys drop, mounter.go:75).
    * `matcherGcMs`: the tombstone/orphan clear delay
    * (tryCleanUnmatchedValue's). */
  def runMqFromRaw2pc(spark: SparkSession, cfg: ChangefeedConfig,
                      raw: DataFrame,
                      metas: Seq[graft.operators.RawKvMounter.KvTableMeta],
                      sinkDir: String, checkpointDir: String,
                      matcherGcMs: Long = 60000L): StreamingQuery = {
    val matched = TxnMatcher.matchStream(spark, raw, matcherGcMs)
    // integrity at corruption-handle-level `error` fuses into the
    // mount: the first corrupted image fails the feed with the
    // unretryable CDC:ErrCorruptedDataMutation (mounter.go:106,130)
    val env = graft.operators.RawKvMounter.mountTables(matched, metas,
      failOnCorruption = cfg.integrity.enabled && cfg.integrity.errorHandle)
    runMqStream(spark, cfg, env, sinkDir, checkpointDir)
  }

  /** [[runMqFromRaw2pc]] with an EVOLVING schema store — the
    * reference's true steady state (schema_store.go:50-54 feeding
    * event_scanner.go:351): DDL jobs ride the same raw 2PC wire as the
    * rows, fold into the store between micro-batches, and every DML
    * decodes against the schema version AND physical-id membership
    * as-of its own commit ts. A mid-stream ADD COLUMN default-fills
    * rows written before it; a REORGANIZE/EXCHANGE re-homes physical
    * ids; a DROP darkens the table until a RECOVER.
    *
    * One streaming query, one state store (the matcher's), one
    * checkpoint: the job fold persists as a JSONL log UNDER the
    * checkpoint dir ([[SchemaStoreHolder]], the persist_storage role),
    * so a kill-restart rebuilds the same schema view before the
    * replayed batch re-mounts — exactly-once across DDL boundaries.
    *
    * Mount + pipeline run per-batch (the plan is as-of by commit ts,
    * so a batch straddling a DDL still decodes each row correctly);
    * the registry compacts at checkpoint-advance cadence with
    * `gcLagBatches` of safety lag (the schemastore gc loop — verdict
    * long-feed boundedness). `initial` seeds pre-existing tables;
    * CREATEs arriving on the wire need no seed at all. */
  /** `fusedWire`: decode-and-ENCODE each entry against its own meta in
    * one mapPartitions ([[graft.operators.RawKvMounter
    * .mountTablesEncodeCanal]], the reference's scan→encode pipeline
    * shape) so HETEROGENEOUSLY-shaped tables ride ONE feed — the
    * stream carries wire strings and no shared payload struct exists.
    * Canal-JSON only; the scalar-level filters (table, event-type,
    * start-ts) apply — expression/column-transform rules need the
    * struct path (run shape-homogeneous feeds for those). */
  def runMqFromRaw2pcEvolving(spark: SparkSession, cfg: ChangefeedConfig,
                              raw: DataFrame, initial: SchemaStore,
                              sinkDir: String, checkpointDir: String,
                              matcherGcMs: Long = 60000L,
                              gcLagBatches: Int = 2,
                              ignoreDdlClasses: Seq[String] = Nil,
                              ignoreDdlSqlRegexps: Seq[String] = Nil,
                              fusedWire: Boolean = false): StreamingQuery = {
    if (fusedWire) require(cfg.sink.protocol == Protocol.CanalJson,
      "fused wire encoding is canal-JSON only")
    cfg.consistent.validate()
    val redoOn = cfg.consistent.eventual
    val redoDir = cfg.consistent.storage
    require(!(redoOn && fusedWire),
      "redo WAL needs the struct path (fused feeds carry wire strings, " +
        "not envelope rows)")
    val (bootstrapper, bootstrapOn) = prepareMqSink(spark, cfg, sinkDir, Nil)
    val holder = new SchemaStoreHolder(initial, s"$checkpointDir/schemastore")
    // version-triggered LIVE handshake (bootstraper.go:259 + the
    // TableSchema block from the schema store): the bootstrap renders
    // from the EVOLVING store and re-sends within the batch a DDL
    // lands in, so a joining consumer always decodes with wire-learned
    // post-DDL schema
    val liveBootstrapValue: (String, String) => String =
      if (cfg.sink.encodingFormat == "avro")
        (s, t) => graft.functions.SimpleAvroWire
          .bootstrapFrameFromStore(holder.store, s, t)
      else
        (s, t) => Codecs.bootstrapValueFromStore(holder.store, s, t)
    val liveVersion: (String, String) => Long =
      (s, t) => holder.store.registry.latest(s, t).map(_.versionTs).getOrElse(0L)
    val failOn = cfg.integrity.enabled && cfg.integrity.errorHandle
    val resolvedLag = new java.util.ArrayDeque[Long]()
    TxnMatcher.matchStream(spark, raw, matcherGcMs)
      .writeStream
      .queryName(cfg.id)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // kill site OWNED by the evolving composition (fires before
        // the schema fold, so a killed batch re-folds its DDLs from
        // the persisted log on restart)
        Failpoints.evalThrow("graft/changefeed/evolve-batch")
        // the matched batch is read twice (job extract + mount): pin it
        batch.persist()
        try {
          val jobs = SchemaStoreHolder.jobsIn(batch)
          holder.fold(jobs)
          // DDL WIRE MESSAGES (the reference sink's WriteBlockEvent,
          // sink.go:32; encoding codec/common/ddl.go): every emitted
          // DDL ships in THIS batch's append BEFORE its rows and
          // carries its finishedTs, so a consumer replaying in
          // commit-ts order (DDL-first at equal ts) applies it before
          // the first post-DDL row. Emission keys on the BATCH's jobs,
          // not the fold's freshness: a crash-replayed batch re-emits
          // its DDLs — at-least-once, the same contract as the row
          // appends (consumers dedupe replays by offset).
          val emitted = jobs.sortBy(_.finishedTs).flatMap { j =>
            dispatchDdlJob(j, cfg.filter, ignoreDdlClasses, ignoreDdlSqlRegexps)
              .map(qq => (j.schemaName, j.tableName, j.finishedTs, qq, j.actionType))
          }
          // redo WAL (consistent.level=eventual): DDLs log-ahead of
          // their wire emission, like the MySQL composition
          if (redoOn && emitted.nonEmpty) {
            import spark.implicits._
            graft.sinks.RedoApplier.appendDdl(
              emitted.map(e => (e._1, e._2, e._3, e._4))
                .toDF("_schema", "_table", "_commit_ts", "query"), redoDir)
          }
          if (emitted.nonEmpty &&
              cfg.sink.openBatchWire && cfg.sink.protocol == Protocol.Open) {
            // open BATCH wire: the two-part key/value DDL message in
            // its byte framing (encodeDDLEvent, open/codec.go:121-165)
            // — one single-event record per job, before the batch's rows
            import spark.implicits._
            emitted.map { case (s, t, ts, qq, at) =>
              val (kb, vb) = graft.functions.OpenBatch.ddlMessage(ts, s, t, qq, at,
                valueCodec = cfg.sink.largeMessageHandle.compression)
              (0L, ts, "ddl", graft.functions.OpenBatch.frameJson(kb, vb))
            }.toDF("_partition", "_commit_ts", "_kind", "_value")
              .coalesce(1).write.mode("append").parquet(sinkDir)
          } else if (emitted.nonEmpty && cfg.sink.protocol == Protocol.Avro) {
            // the avro wire's evolving half: REGISTER the post-fold
            // table version under its value/key subjects BEFORE any
            // post-DDL row encodes (the reference's schema round trip
            // on schema change, avro/encoder.go:68), then ship each
            // DDL as the 0x01 control event
            val maxTs = jobs.map(_.finishedTs).max
            emitted.map(e => (e._1, e._2)).distinct.foreach { case (sc, tb) =>
              holder.store.metaAsOf(sc, tb, maxTs).foreach { meta =>
                graft.functions.AvroWire.registerTable(
                  cfg.sink.schemaRegistry, cfg.id, sc, tb,
                  graft.operators.RawKvMounter.payloadType(meta),
                  meta.handleCols,
                  modes = graft.functions.AvroWire.AvroModes(
                    cfg.sink.avroDecimalHandlingMode,
                    cfg.sink.avroBigintUnsignedHandlingMode))
              }
            }
            // the 0x01 DDL control event ships ONLY under
            // avro-enable-watermark (EncodeDDLEvent, encoder.go:125)
            // — the registry registration above is the protocol's
            // schema-change carrier either way
            if (cfg.sink.avroEnableWatermark) {
              import spark.implicits._
              emitted.map { case (sc, tb, ts, qq, at) =>
                (0L, ts, "ddl", graft.functions.OpenBatch.frameJson(
                  Array.emptyByteArray,
                  graft.functions.AvroRegistry.ddlEventBytes(qq, at, sc, tb, ts)))
              }.toDF("_partition", "_commit_ts", "_kind", "_value")
                .coalesce(1).write.mode("append").parquet(sinkDir)
            }
          } else if (emitted.nonEmpty && cfg.sink.protocol == Protocol.Simple &&
              cfg.sink.encodingFormat == "avro") {
            // simple-avro DDL rides the official union's DDL message
            // class — the wire stays ONE encoding (a JSON DDL frame
            // amid avro binaries would fail any union-schema consumer)
            import spark.implicits._
            emitted.map { case (_, _, ts, qq, _) =>
              (0L, ts, "ddl", graft.functions.SimpleAvroWire.ddlFrame(qq, ts))
            }.toDF("_partition", "_commit_ts", "_kind", "_value")
              .coalesce(1).write.mode("append").parquet(sinkDir)
          } else if (emitted.nonEmpty) {
            import spark.implicits._
            // per-protocol encoding (codec/common/ddl.go dispatches to
            // each protocol's own DDL message shape). Debezium's
            // tableChanges renders the POST-fold live shape from the
            // evolving registry — resolved on the DRIVER into an
            // immutable map (job-rate-sized) so no store state enters
            // the encode closure; a dropped table resolves to None →
            // table:null, the reference's DROP shape.
            val liveShapes: Map[(String, String), graft.model.MySqlDdl.MySqlTable] =
              emitted.map(e => (e._1, e._2)).distinct.flatMap { case (s, t) =>
                holder.store.registry.latest(s, t)
                  .map(sch => ((s, t), graft.functions.DebeziumFull.tableFromRegistry(sch)))
              }.toMap
            Codecs.ddlMessageFor(
                emitted.map(e => (e._1, e._2, e._3, e._4))
                  .toDF("_schema", "_table", "version_ts", "query"),
                cfg.sink.protocol,
                tableFor = (s, t) => liveShapes.get((s, t)),
                debeziumDisableSchema = cfg.sink.debeziumDisableSchema)
              .select(lit(0L).as("_partition"),
                col("version_ts").as("_commit_ts"),
                lit("ddl").as("_kind"), col("_value"))
              .coalesce(1).write.mode("append").parquet(sinkDir)
          }
          // the mount plan is SCOPED by the changefeed's filter rules
          // (the reference scopes its schema view the same way): an
          // unrelated CREATE TABLE on the shared wire — any column
          // shape — can never trip the shared-payload require or leak
          // rows the tableFilter would drop anyway
          val plan = holder.store.physicalPlan(keep = (s, t) =>
            graft.operators.TableMatcher.matchesValue(
              s, t, cfg.filter.rules, cfg.filter.caseSensitive))
          // integrity at error level rides the ALL-MISMATCH circuit
          // breaker: one corrupted image among verified-good ones is
          // data corruption → the unretryable ErrCorruptedDataMutation;
          // EVERY checksummed image of the batch failing is the
          // signature of a checksum-DOMAIN mismatch (a re-derived
          // domain against a real upstream — e.g. a derivation bug this
          // repo and a real TiKV disagree on), which downgrades to a
          // feed WARNING and forwards under warn semantics instead of
          // hard-failing genuine replication.
          if (failOn) {
            val (okN, badN) =
              graft.operators.RawKvMounter.checksumCensus(batch, plan)
            if (badN > 0 && okN > 0)
              throw new graft.operators.CorruptedDataMutationException(
                s"$badN corrupted of ${okN + badN} checksummed images " +
                  s"in batch $batchId")
            if (badN > 0)
              SinkCounters.reportWarning(cfg.id, FeedError(
                "CDC:ErrChecksumDomainSuspect",
                s"all $badN checksummed images of batch $batchId fail " +
                  "verification — checksum-domain mismatch suspected; " +
                  "forwarding under warn semantics until a genuine " +
                  "upstream fixture confirms the domain"))
          }
          var pendingUnpersist: Seq[DataFrame] = Nil
          val encoded =
            if (fusedWire) {
              val f = cfg.filter
              var df = graft.operators.RawKvMounter.mountTablesEncodeCanal(
                batch, plan, failOnCorruption = false)
              df = graft.operators.Filters.tableFilter(df, f.rules, f.caseSensitive)
              df = graft.operators.Filters.eventTypeFilter(df, f.ignoreOps)
              df = graft.operators.Filters.startTsFilter(df, f.ignoreTxnStartTs)
              graft.operators.Routing.partitionByTable(df, cfg.sink.numPartitions)
            } else {
              // struct path over possibly HETEROGENEOUS shapes: split
              // the plan into payload-shape groups (census-sized),
              // run the full pipeline per group, union the ENCODED
              // frames (homogeneous after encoding) so the batch still
              // sinks once — one resolved message, one bootstrap pass.
              // Large-message handling re-reads images post-encode, so
              // multi-group requires it disabled (use fusedWire or
              // per-shape feeds for oversize+hetero).
              val groups = shapeGroups(plan, cfg.handleKeys)
              require(groups.nonEmpty,
                "mountTablesPlan: no mountable segment") // pre-group parity
              require(groups.size <= 1 || cfg.sink.largeMessageHandle.disabled,
                "heterogeneous shapes with large-message handling need " +
                  "fusedWire or per-shape feeds")
              val walPinned = scala.collection.mutable.Buffer.empty[DataFrame]
              val encodedGroups = groups.map { case (group, groupKeys) =>
                // each group's handle keys come from its own metas
                // (the per-table conflict key — canal pkNames, avro
                // key records, update-split all read them), like the
                // MySQL composition's per-group apply
                val gCfg = cfg.copy(handleKeys = groupKeys)
                val shaped = transform(spark, gCfg)(
                  graft.operators.RawKvMounter.mountTablesPlan(
                    batch, group, failOnCorruption = false))
                if (redoOn) {
                  // log-ahead: the shaped rows are durable in the WAL
                  // before any wire frame lands (pkg/redo writer
                  // ordering); pinned because the WAL write and the
                  // encode both consume them
                  shaped.persist()
                  walPinned += shaped
                  graft.sinks.RedoLog.append(shaped, redoDir)
                  Failpoints.evalThrow("graft/changefeed/evolve-mq-post-redo")
                }
                val df = encodeFor(spark, gCfg)(shaped)
                if (groups.size == 1) df
                else df.select(col("_schema"), col("_table"), col("_partition"),
                  col("_commit_ts"), col("_value"))
              }
              try encodedGroups.reduce(_.unionByName(_))
              finally if (walPinned.nonEmpty) {
                // the encode consumes the pinned frames inside
                // sinkMqBatch below; unpersist AFTER the batch write
                pendingUnpersist = walPinned.toSeq
              }
            }
          try sinkMqBatch(cfg, bootstrapper, bootstrapOn, sinkDir,
            liveBootstrapValue, liveVersion)(encoded, batchId)
          finally pendingUnpersist.foreach(_.unpersist())
          if (redoOn) {
            val rhi = batch.agg(max(col("commit_ts"))).head()
            if (!rhi.isNullAt(0))
              graft.sinks.RedoApplier.advanceCheckpoint(
                spark, redoDir, rhi.getLong(0))
          }
          // compaction at checkpoint-advance cadence: a resolved ts
          // `gcLagBatches` batches old is durably covered — versions
          // below it can never be read again (even a crash-replay only
          // re-runs the LAST batch, which is younger)
          val hi = batch.agg(max(col("commit_ts"))).head()
          if (!hi.isNullAt(0)) {
            resolvedLag.addLast(hi.getLong(0))
            if (resolvedLag.size > gcLagBatches)
              holder.truncateBelow(resolvedLag.removeFirst())
          }
        } finally batch.unpersist()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Raw-2PC → MySQL: the reference's FLAGSHIP sink on the true steady
    * state — raw 2PC bytes → streaming matcher → per-batch evolving
    * mount → filter/transform → per-key-ordered SQL statements on a
    * real JDBC downstream, with emitted DDLs EXECUTED downstream under
    * `ddl_ts_v1` bookkeeping (mysql_writer_ddl.go;
    * mysql_writer_for_ddl_ts.go:266), barriered at the micro-batch
    * boundary: the batch's DDLs run BEFORE its rows (the mounted
    * envelope conforms to the post-fold shape, so row statements need
    * the new columns in place), and a crash-replayed batch re-executes
    * them idempotently — already-took-effect downstream errors are
    * swallowed per the ddl_reentrant contract (IsIgnorableMySQLDDLError,
    * mysql_writer_ddl.go:216-231).
    *
    * `applier` is DRIVER-held (DDL execution is control-plane sized);
    * row statements reach the downstream through
    * [[graft.sinks.JdbcApplier.executeFor]], which captures only the
    * URL — no JdbcApplier ever enters a Spark closure. */
  def runMysqlFromRaw2pcEvolving(spark: SparkSession, cfg: ChangefeedConfig,
                                 raw: DataFrame, initial: SchemaStore,
                                 checkpointDir: String,
                                 applier: graft.sinks.JdbcApplier,
                                 matcherGcMs: Long = 60000L,
                                 ignoreDdlClasses: Seq[String] = Nil,
                                 ignoreDdlSqlRegexps: Seq[String] = Nil): StreamingQuery = {
    GraftSession.tune(spark)
    val holder = new SchemaStoreHolder(initial, s"$checkpointDir/schemastore")
    applier.ensureMetaTables()
    cfg.consistent.validate()
    val redoOn = cfg.consistent.eventual
    val redoDir = cfg.consistent.storage
    val url = applier.url
    val failOn = cfg.integrity.enabled && cfg.integrity.errorHandle
    val prologue = graft.sinks.MysqlSink.connectionPrologue(cfg.sink.bdrMode)
    TxnMatcher.matchStream(spark, raw, matcherGcMs)
      .writeStream
      .queryName(cfg.id)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Failpoints.evalThrow("graft/changefeed/evolve-mysql-batch")
        batch.persist()
        try {
          val jobs = SchemaStoreHolder.jobsIn(batch)
          holder.fold(jobs)
          val emittedDdls = jobs.sortBy(_.finishedTs).flatMap { j =>
            dispatchDdlJob(j, cfg.filter, ignoreDdlClasses, ignoreDdlSqlRegexps)
              .map(q => (j.schemaName, j.tableName, j.finishedTs, q))
          }
          // redo WAL (consistent.level=eventual): DDLs log-ahead of
          // their downstream execution (pkg/redo writer precedes the
          // sink; the applier interleaves them DML-first at equal ts,
          // applier/redo.go:181-190). At-least-once like the row log —
          // a replayed batch re-appends, the applier dedupes.
          if (redoOn && emittedDdls.nonEmpty) {
            import spark.implicits._
            graft.sinks.RedoApplier.appendDdl(
              emittedDdls.toDF("_schema", "_table", "_commit_ts", "query"),
              redoDir)
          }
          // the batch boundary IS the DDL barrier: execute the batch's
          // emitted DDLs downstream first, in finishedTs order, each
          // followed by the idempotent ddl_ts_v1 upsert
          emittedDdls.foreach { case (_, _, ts, q) =>
            executeDdlDownstream(applier, cfg.id, ts, q)
          }
          // kill site BETWEEN the DDL execution and the row apply —
          // the fail_over_ddl window whose replay re-executes an
          // already-applied DDL (the ddl_reentrant contract)
          Failpoints.evalThrow("graft/changefeed/evolve-mysql-post-ddl")
          val plan = holder.store.physicalPlan(keep = (s, t) =>
            graft.operators.TableMatcher.matchesValue(
              s, t, cfg.filter.rules, cfg.filter.caseSensitive))
          // HETEROGENEOUS shapes: the struct-shaped mount needs one
          // payload type per pass, so the plan splits into shape
          // GROUPS and each group mounts+applies separately — group
          // count is census-sized (distinct shapes, not tables), and
          // SQL statements render from each group's own StructType.
          // Per-key ordering holds within every table; row-level mode
          // never ordered across tables anyway (the reference's
          // conflict-key parallelism).
          val groups = shapeGroups(plan, cfg.handleKeys)
          def applyRows(rows: DataFrame): Unit =
            groups.foreach { case (group, groupKeys) =>
            val gCfg = cfg.copy(handleKeys = groupKeys)
            val env = graft.operators.RawKvMounter.mountTablesPlan(
              rows, group, failOnCorruption = failOn)
            val shaped = transform(spark, gCfg)(env)
            if (redoOn) {
              // log-ahead: the shaped rows are durable in the WAL
              // before the first downstream statement runs, so a crash
              // between the two leaves a replayable (ckpt, resolved]
              // window (pkg/redo writer ordering). Pinned because the
              // WAL write and the apply both consume it.
              shaped.persist()
              graft.sinks.RedoLog.append(shaped, redoDir)
              Failpoints.evalThrow("graft/changefeed/evolve-mysql-post-redo")
            }
            try {
              if (cfg.sink.mysqlConfig.isDefault)
                graft.sinks.MysqlSink.applyBatch(
                  shaped, groupKeys,
                  cfg.sink.numPartitions, cfg.sink.safeMode, prologue)(
                  graft.sinks.JdbcApplier.executeFor(url))
              else
                graft.sinks.MysqlSink.applyBatchCoalesced(
                  shaped, groupKeys,
                  cfg.sink.numPartitions, cfg.sink.safeMode,
                  maxBatchRows = cfg.sink.mysqlConfig.adjusted.maxTxnRow,
                  mysql = cfg.sink.mysqlConfig, prologue = prologue)(
                  graft.sinks.JdbcApplier.executeFor(url))
            }
            finally if (redoOn) shaped.unpersist()
          }
          // SYNC POINTS (downstreamadapter/syncpoint/sync_point.go:28;
          // mysql_writer_for_syncpoint.go): the batch splits at every
          // interval boundary its ts range crosses, so the map row
          // writes when the downstream state IS the snapshot at the
          // boundary — rows ≤ b apply, then the idempotent
          // (primary_ts=b, secondary_ts=b) INSERT IGNORE (replay
          // re-offers, the pk drops duplicates; the identity mapping
          // models the single commit-ts clock of the embedded
          // downstream), then the remainder. Boundaries search
          // (lo - interval, hi] so a boundary falling BETWEEN batches
          // still emits on the first batch past it; the no-syncpoint
          // config is one whole-batch segment — today's path.
          val bounds: Seq[Long] = cfg.syncPointIntervalNs match {
            case Some(iv) if iv > 0 =>
              val mm = batch.agg(min(col("commit_ts")),
                max(col("commit_ts"))).head()
              if (mm.isNullAt(0)) Nil
              else syncPointBounds(mm.getLong(0), mm.getLong(1), iv)
            case _ => Nil
          }
          var applied = Long.MinValue
          bounds.foreach { b =>
            applyRows(batch.filter(col("commit_ts") > applied &&
              col("commit_ts") <= b))
            applied = b
            applier.execute(Iterator(
              graft.sinks.MysqlSink.syncPointStatement(cfg.id, b, b)))
            // kill site between the syncpoint write and the remainder:
            // the downstream at this instant must equal the upstream
            // snapshot at b (the sync-point consistency contract)
            Failpoints.evalThrow("graft/changefeed/evolve-mysql-post-syncpoint")
          }
          applyRows(
            if (applied == Long.MinValue) batch
            else batch.filter(col("commit_ts") > applied))
          // applied-through meta AFTER the whole batch flushed: a
          // crash before this line keeps the checkpoint below the
          // logged rows, so the replay window covers the partial batch
          if (redoOn) {
            val hi = batch.agg(max(col("commit_ts"))).head()
            if (!hi.isNullAt(0))
              graft.sinks.RedoApplier.advanceCheckpoint(
                spark, redoDir, hi.getLong(0))
          }
        } finally batch.unpersist()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Execute ONE emitted DDL on the JDBC downstream with ddl_ts
    * bookkeeping. The wire query is MySQL-dialect with bare
    * identifiers; for the embedded ANSI engine the statement re-renders
    * from the PARSED action so identifiers quote correctly (a real
    * MySQL downstream executes the raw text unchanged — the reference's
    * path). Partition-only actions change no shape on a non-partitioned
    * ANSI downstream and record just the ddl_ts advance. */
  private[graft] def executeDdlDownstream(applier: graft.sinks.JdbcApplier,
                                          feedId: String, ts: Long,
                                          query: String): Unit = {
    import graft.model.{DdlAction => A}
    def derbyType(dt: String): String = {
      val b = dt.takeWhile(_ != '(').trim.toLowerCase
      val args = dt.dropWhile(_ == ' ').dropWhile(_ != '(')
      b match {
        case "bigint" => "BIGINT"
        case "int" | "integer" | "mediumint" => "INTEGER"
        case "smallint" | "tinyint" => "SMALLINT"
        case "double" | "float" => "DOUBLE"
        case "decimal" | "numeric" =>
          if (args.nonEmpty) s"DECIMAL$args" else "DECIMAL(18,2)"
        case "char" | "varchar" =>
          if (args.nonEmpty) s"VARCHAR$args" else "VARCHAR(255)"
        case _ => "VARCHAR(1024)"
      }
    }
    def dflt(d: Option[String]): String = d.map { v =>
      if (v.matches("-?\\d+(\\.\\d+)?")) s" DEFAULT $v"
      else s" DEFAULT '${v.replace("'", "''")}'"
    }.getOrElse("")
    // Derby's only in-place retype is VARCHAR widening (SET DATA
    // TYPE); anything else rebuilds the column via
    // rename→add→copy→drop, where each step is either
    // replay-ignorable DDL (42X14 / X0Y32) or a re-runnable copy, so
    // a kill at ANY statement boundary converges on replay — the same
    // ddl_reentrant contract the plain statements rely on (the
    // reference executes the raw text on real MySQL,
    // mysql_writer_ddl.go). `lookupName` is the column's CURRENT
    // downstream name (ChangeColumn renders its RENAME first, so the
    // pre-state sits under the old name; after a replayed rename it
    // sits under the new one — probe both).
    def retype(s: String, t: String, c: graft.model.ColumnDef,
               lookupName: String): Seq[String] = {
      val dt = derbyType(c.dataType)
      val base = dt.takeWhile(_ != '(')
      val argLen = "\\d+".r.findFirstIn(dt.dropWhile(_ != '(')).map(_.toInt)
      val tmp = c.name + "__graft_retype"
      val copyDrop = Seq(
        s"""UPDATE "$s"."$t" SET "${c.name}" = CAST("$tmp" AS $dt)""",
        s"""ALTER TABLE "$s"."$t" DROP COLUMN "$tmp"""")
      val stmts =
        if (applier.columnInfo(s, t, tmp).isDefined) {
          // a prior rebuild crashed between its RENAME and its DROP:
          // the values still live under the tmp column, so RESUME —
          // re-ADD the target column if the crash preceded the ADD,
          // then re-copy (idempotent: tmp is immutable from here) and
          // DROP. Probing ONLY c.name here would either skip the
          // rebuild entirely (crash-after-RENAME: column missing →
          // looks registry-only) or silently lose the values
          // (crash-after-ADD: target type already in place → looks
          // already-done while every row is still NULL).
          val add =
            if (applier.columnInfo(s, t, c.name).isEmpty)
              Seq(s"""ALTER TABLE "$s"."$t" ADD COLUMN "${c.name}" $dt""")
            else Nil
          add ++ copyDrop
        } else {
          val cur = applier.columnInfo(s, t, lookupName)
            .orElse(applier.columnInfo(s, t, c.name))
          cur match {
            case Some((tn, sz)) if tn.equalsIgnoreCase(base) && argLen.forall(_ == sz) =>
              Nil // already the target shape (replay / display-width-only)
            case Some((tn, sz)) if tn.equalsIgnoreCase("VARCHAR") &&
                base == "VARCHAR" && argLen.exists(_ >= sz) =>
              Seq(s"""ALTER TABLE "$s"."$t" ALTER COLUMN "${c.name}" SET DATA TYPE $dt""")
            case Some(_) =>
              s"""RENAME COLUMN "$s"."$t"."${c.name}" TO "$tmp"""" +:
                s"""ALTER TABLE "$s"."$t" ADD COLUMN "${c.name}" $dt""" +:
                copyDrop
            case None => Nil // column unknown downstream: registry-only fold
          }
        }
      stmts ++ c.default.map(_ =>
        s"""ALTER TABLE "$s"."$t" ALTER COLUMN "${c.name}"""" + dflt(c.default))
    }
    // returns the statement(s) to run; CreateTable goes through the
    // applier's table API (which registers the pk for REPLACE
    // translation) and contributes none
    def render(a: graft.model.DdlAction): Seq[String] = a match {
      case A.CreateTable(s, t, cols, _, pks) =>
        // register the PARSED handle keys, not column 1: the action
        // carries the statement's true pk; a pk-less table falls back
        // to the fewest-column NOT-NULL UK (MySqlTable.handleKeys,
        // table_info_helper.go:660-732), and only a keyless table
        // keeps the legacy first-column registration so REPLACE
        // translation stays deterministic
        val keys =
          if (pks.nonEmpty) pks
          else query.split(";").iterator.map(_.trim).filter(_.nonEmpty)
            .flatMap(stmt => graft.model.MySqlDdl.parseCreateTable(stmt, s))
            .find(mt => mt.schema == s && mt.table == t)
            .map(_.handleKeys).filter(_.nonEmpty)
            .getOrElse(cols.headOption.map(_.name).toSeq)
        applier.createTable(s, t,
          cols.map(c => c.name -> derbyType(c.dataType)), pks = keys)
        Nil
      case A.AddColumn(s, t, c, _) =>
        Seq(s"""ALTER TABLE "$s"."$t" ADD COLUMN "${c.name}" """ +
          derbyType(c.dataType) + dflt(c.default))
      case A.DropColumn(s, t, n, _) =>
        Seq(s"""ALTER TABLE "$s"."$t" DROP COLUMN "$n"""")
      case A.DropTable(s, t, _) => Seq(s"""DROP TABLE "$s"."$t"""")
      case A.TruncateTable(s, t, _) => Seq(s"""TRUNCATE TABLE "$s"."$t"""")
      case A.RenameTable(s, t, _, nt, _) =>
        applier.renameTableKeys(s, t, s, nt)
        Seq(s"""RENAME TABLE "$s"."$t" TO "$nt"""")
      case A.RenameTables(rs, _) => rs.flatMap(render)
      case A.RenameColumn(s, t, o, n, _) =>
        // row-shape DDL: mounted rows carry the NEW field name from
        // this version on, so the downstream column must follow or
        // every subsequent DML on the table fails
        applier.renameColumnKey(s, t, o, n)
        Seq(s"""RENAME COLUMN "$s"."$t"."$o" TO "$n"""")
      case A.ModifyColumn(s, t, c, _) => retype(s, t, c, c.name)
      case A.ChangeColumn(s, t, o, c, _) =>
        applier.renameColumnKey(s, t, o, c.name)
        s"""RENAME COLUMN "$s"."$t"."$o" TO "${c.name}"""" +: retype(s, t, c, o)
      case A.SetDefault(s, t, cn, d, _) =>
        // ALTER COLUMN SET/DROP DEFAULT changes what later defaulted
        // inserts store; DROP renders as DEFAULT NULL (Derby's reset)
        Seq(s"""ALTER TABLE "$s"."$t" ALTER COLUMN "$cn"""" +
          (if (d.isDefined) dflt(d) else " DEFAULT NULL"))
      case A.AlterMulti(_, _, actions, _) => actions.flatMap(render)
      case A.BatchActions(actions, _) => actions.flatMap(render)
      case _ => Nil // partition/registry-only actions: ddl_ts only
    }
    val stmts = graft.model.DdlParser.parse(query, ts) match {
      case Some(a) => render(a)
      case None => Seq(query) // unparsed: raw passthrough (real MySQL)
    }
    applier.execute(
      (stmts :+ graft.sinks.MysqlSink.ddlTsStatement(feedId, ts)).iterator)
  }

  /** Create-time sink setup shared by every MQ run shape: bootstrap
    * worker, up-front validation, send-all-at-start handshake.
    * Returns (bootstrapper, bootstrapOn). */
  private def prepareMqSink(spark: SparkSession, cfg: ChangefeedConfig,
                            sinkDir: String,
                            allTablesAtStart: Seq[(String, String)])
      : (Bootstrapper, Boolean) = {
    GraftSession.tune(spark)
    // simple-protocol bootstrap cadence (bootstraper.go): one worker
    // per changefeed run, alive across micro-batches so the interval/
    // count windows span triggers like the reference's ticker loop
    val bootstrapper = new Bootstrapper(
      cfg.sink.sendBootstrapIntervalInSec, cfg.sink.sendBootstrapInMsgCount)
    val bootstrapOn =
      cfg.sink.protocol == Protocol.Simple && bootstrapper.enabled
    // large-message handling is validated up front (AdjustAndValidate,
    // large_message.go:47-96) so a misconfigured feed fails at create,
    // not mid-stream
    val lmh = cfg.sink.largeMessageHandle
    if (!lmh.disabled) {
      lmh.validate(cfg.sink.protocol)
      // the simple protocol's avro-format oversize forms exist
      // (kafka_simple_handle_key_only_avro / claim_check_avro —
      // LargeMessage.simpleAvro*); debezium-avro has none in the
      // reference — reject at create, not mid-batch
      require(cfg.sink.encodingFormat != "avro" ||
          cfg.sink.protocol == Protocol.Simple,
        "large-message-handle with encoding-format=avro is supported " +
          "for the simple protocol only")
    }
    // avro demands its registry endpoint at create (the reference
    // rejects an avro sink-uri without schema-registry, builder.go);
    // the scheme must resolve to a real client class too — unknown
    // schemes fail HERE, not deep inside an executor task
    if (cfg.sink.protocol == Protocol.Avro) {
      require(cfg.sink.schemaRegistry.nonEmpty,
        "avro protocol requires a schema-registry uri")
      graft.functions.AvroWire.validateUri(cfg.sink.schemaRegistry)
      // value-mapping modes validate at create, not mid-batch
      // (AvroModes' own requires name the offending value)
      graft.functions.AvroWire.AvroModes(
        cfg.sink.avroDecimalHandlingMode,
        cfg.sink.avroBigintUnsignedHandlingMode)
    }
    // encoding-format (sink.go:456): json everywhere; avro only on the
    // protocols whose avro wire exists (simple's fixed union schema,
    // debezium's registry-framed envelope — the latter needs the
    // registry endpoint like the avro protocol itself)
    require(cfg.sink.encodingFormat == "json" || cfg.sink.encodingFormat == "avro",
      s"unknown encoding-format '${cfg.sink.encodingFormat}' (json | avro)")
    if (cfg.sink.encodingFormat == "avro") {
      require(cfg.sink.protocol == Protocol.Simple ||
          cfg.sink.protocol == Protocol.Debezium,
        s"encoding-format=avro is not supported for protocol ${cfg.sink.protocol}")
      if (cfg.sink.protocol == Protocol.Debezium) {
        require(cfg.sink.schemaRegistry.nonEmpty,
          "debezium with encoding-format=avro requires a schema-registry uri")
        graft.functions.AvroWire.validateUri(cfg.sink.schemaRegistry)
      }
    }
    // integrity block validated at create like the reference
    // (integrity.go:45-63 Validate inside replica-config validation)
    cfg.integrity.validate()
    // send-all-bootstrap-at-start (DefaultSendAllBootstrapAtStart):
    // handshake every known table BEFORE the stream's first batch;
    // pre-registration in the bootstrapper keeps batch 1 from
    // immediately re-sending for the same tables
    if (bootstrapOn && cfg.sink.sendAllBootstrapAtStart &&
        allTablesAtStart.nonEmpty) {
      val due = bootstrapper.bootstrapAll(allTablesAtStart,
        System.currentTimeMillis())
      val parts: Seq[Int] =
        if (cfg.sink.sendBootstrapToAllPartition) 0 until cfg.sink.numPartitions
        else Seq(0)
      import spark.implicits._
      val render: (String, String) => String =
        if (cfg.sink.encodingFormat == "avro")
          graft.functions.SimpleAvroWire.bootstrapFrame(_, _, 0L)
        else Codecs.bootstrapValue
      due.flatMap { case (sc, tb) =>
        parts.map(p => (p.toLong, 0L, "bootstrap", render(sc, tb)))
      }.toDF("_partition", "_commit_ts", "_kind", "_value")
        .coalesce(1)
        .write.mode("append").parquet(sinkDir)
    }
    (bootstrapper, bootstrapOn)
  }

  /** Raw-2PC → cloud storage: the reference's storage sink on the
    * evolving steady state. Rows land as canal-JSON text files under
    * the `<schema>/<table>/<date>` layout ([[graft.sinks.StorageSink]])
    * via the FUSED mount→encode (heterogeneous shapes ride one feed);
    * every dispatched DDL writes a NEW versioned schema file —
    * `<schema>/<table>/meta/schema_{finishedTs}_{checksum}.json`, the
    * storage sink's DDL message (SchemaFile.DDLEvent,
    * pkg/cloudstorage/schema_file.go:196-257) — rendered from the
    * POST-fold registry so a consumer rebuilds the live TableInfo from
    * the layout alone. The batch's schema files write BEFORE its data
    * files (the WriteBlockEvent ordering). Crash-replay semantics:
    * schema files are idempotent (content-checksummed names rewrite in
    * place); data files are at-least-once like every append sink here —
    * a replayed batch re-appends and consumers dedupe by commit ts (or
    * the [[graft.sinks.StorageSink.applyCdcNaming]] index pass collapses
    * replays, the reference's file-index contract). A `metadata`
    * checkpoint marker flushes after each batch (cloudstorage
    * metadata.go). */
  def runStorageFromRaw2pcEvolving(spark: SparkSession, cfg: ChangefeedConfig,
                                   raw: DataFrame, initial: SchemaStore,
                                   baseDir: String, checkpointDir: String,
                                   matcherGcMs: Long = 60000L,
                                   ignoreDdlClasses: Seq[String] = Nil,
                                   ignoreDdlSqlRegexps: Seq[String] = Nil,
                                   cdcNaming: Boolean = true,
                                   csvOutputOldValue: Boolean = false,
                                   csvConfig: graft.model.CsvConfig =
                                     graft.functions.Codecs.csvLegacy): StreamingQuery = {
    require(cfg.sink.protocol == Protocol.CanalJson ||
        cfg.sink.protocol == Protocol.Csv,
      "the storage composition writes canal-JSON or csv text files")
    val csvMode = cfg.sink.protocol == Protocol.Csv
    GraftSession.tune(spark)
    cfg.consistent.validate()
    val redoOn = cfg.consistent.eventual
    val redoDir = cfg.consistent.storage
    val holder = new SchemaStoreHolder(initial, s"$checkpointDir/schemastore")
    TxnMatcher.matchStream(spark, raw, matcherGcMs)
      .writeStream
      .queryName(cfg.id)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Failpoints.evalThrow("graft/changefeed/storage-batch")
        batch.persist()
        try {
          val jobs = SchemaStoreHolder.jobsIn(batch)
          holder.fold(jobs)
          val emitted = jobs.sortBy(_.finishedTs).flatMap { j =>
            dispatchDdlJob(j, cfg.filter, ignoreDdlClasses, ignoreDdlSqlRegexps)
              .map(qq => (j, qq))
          }
          // redo WAL (consistent.level=eventual — the reference's redo
          // is SINK-AGNOSTIC, consistent_replicate_storage_file): DDLs
          // log-ahead of their schema files like every composition
          if (redoOn && emitted.nonEmpty) {
            import spark.implicits._
            graft.sinks.RedoApplier.appendDdl(
              emitted.map { case (j, qq) =>
                (j.schemaName, j.tableName, j.finishedTs, qq) }
                .toDF("_schema", "_table", "_commit_ts", "query"), redoDir)
          }
          emitted.foreach { case (j, qq) =>
            // DROP leaves no live registry shape: persist a
            // name-only file like SchemaFile.Build with nil
            // TableInfo (schema_file.go:216-220)
            val sch = holder.store.registry.latest(j.schemaName, j.tableName)
              .getOrElse(graft.model.TableSchema(
                j.schemaName, j.tableName, j.finishedTs, Nil))
            graft.sinks.StorageSink.writeSchemaFile(
              baseDir, sch.copy(versionTs = j.finishedTs), qq, j.actionType)
          }
          val plan = holder.store.physicalPlan(keep = (s, t) =>
            graft.operators.TableMatcher.matchesValue(
              s, t, cfg.filter.rules, cfg.filter.caseSensitive))
          // log-ahead of the DATA files: the WAL carries shaped
          // ENVELOPE rows (replayable as SQL), so the struct mount
          // runs per shape group alongside the fused wire encode —
          // the double decode is the WAL-enabled feed's durability
          // cost, paid batch-locally. The WAL applies EXACTLY the
          // filter subset the fused file path applies below (table /
          // event-type / start-ts) — running the full transform here
          // would let expr-filter or update-split configs log a
          // DIFFERENT row set than the files sink, breaking the
          // WAL ⊇ sunk-rows invariant recovery relies on
          if (redoOn && plan.nonEmpty) {
            val f = cfg.filter
            shapeGroups(plan, cfg.handleKeys).foreach { case (group, _) =>
              var w = graft.operators.RawKvMounter.mountTablesPlan(
                batch, group, failOnCorruption = false)
              w = graft.operators.Filters.tableFilter(w, f.rules, f.caseSensitive)
              w = graft.operators.Filters.eventTypeFilter(w, f.ignoreOps)
              w = graft.operators.Filters.startTsFilter(w, f.ignoreTxnStartTs)
              graft.sinks.RedoLog.append(
                graft.operators.Routing.dispatch(
                  w, cfg.sink.dispatch, cfg.sink.numPartitions), redoDir)
            }
            Failpoints.evalThrow("graft/changefeed/storage-post-redo")
          }
          if (plan.nonEmpty) {
            val f = cfg.filter
            var df =
              if (csvMode) graft.operators.RawKvMounter.mountTablesEncodeCsv(
                batch, plan, outputOldValue = csvOutputOldValue,
                csv = csvConfig)
              else graft.operators.RawKvMounter.mountTablesEncodeCanal(
                batch, plan, failOnCorruption = false)
            df = graft.operators.Filters.tableFilter(df, f.rules, f.caseSensitive)
            df = graft.operators.Filters.eventTypeFilter(df, f.ignoreOps)
            df = graft.operators.Filters.startTsFilter(df, f.ignoreTxnStartTs)
            // [sink.cloud-storage-config] file-size: translate the
            // byte cap into the writer's per-file record roll using
            // this batch's average encoded line length (the batch is
            // already persisted — one cheap agg, and only when the
            // block is configured)
            val roll: Option[Long] =
              if (cfg.sink.cloudStorageConfig.isDefault) None
              else {
                val sized = df.persist()
                val avg = sized.agg(
                  org.apache.spark.sql.functions.avg(length(col("_value"))))
                  .head()
                Some(math.max(1L,
                  cfg.sink.cloudStorageConfig.adjustedFileSize.toLong /
                    math.max(1L,
                      if (avg.isNullAt(0)) 1L else avg.getDouble(0).toLong)))
              }
            graft.sinks.StorageSink.write(df, baseDir, "text", roll)
            // output-field-header: each committed csv file leads with
            // the ticdc-meta$ header line for ITS table's shape
            // (encodeHeader, csv_message.go:418-446; the encoder
            // emits it once per message = once per file here)
            if (csvMode && csvConfig.outputFieldHeader)
              graft.sinks.StorageSink.prependCsvHeaders(baseDir, "txt",
                (sch, tbl) => plan.valuesIterator.flatten.toSeq
                  .collect {
                    case (ts, Some(m))
                        if m.schema == sch && m.table == tbl => (ts, m)
                  }.sortBy(_._1).lastOption.map { case (_, m) =>
                    graft.functions.Codecs.csvHeaderFor(
                      m.columns.map(_.name),
                      csvConfig.copy(outputOldValue =
                        csvOutputOldValue || csvConfig.outputOldValue))
                  })
            // reference file naming: committed part-files rename to
            // CDC{idx}.txt with the per-dir index advancing across
            // batches (generator.go:350-420; idempotent on replay —
            // already-renamed files only advance the index)
            if (cdcNaming)
              graft.sinks.StorageSink.applyCdcNaming(baseDir, "txt")
          }
          // flush marker AFTER the batch's files are durable; the
          // redo applied-through advances with it so a crash earlier
          // leaves a replayable (ckpt, resolved] window
          val hi = batch.agg(max(col("commit_ts"))).head()
          if (!hi.isNullAt(0)) {
            graft.sinks.StorageSink.writeCheckpointMeta(baseDir, hi.getLong(0))
            if (redoOn)
              graft.sinks.RedoApplier.advanceCheckpoint(
                spark, redoDir, hi.getLong(0))
          }
          // [sink.cloud-storage-config] retention: file-expiration-days
          // > 0 enables the date-partition cleanup (the reference runs
          // it on file-cleanup-cron-spec's daily schedule; here it
          // piggybacks the micro-batch — same retention window,
          // tighter staleness bound). 0 = disabled, the default.
          if (cfg.sink.cloudStorageConfig.fileExpirationDays > 0) {
            graft.sinks.StorageSink.cleanupExpired(baseDir,
              cfg.sink.cloudStorageConfig.fileExpirationDays,
              java.time.LocalDate.now())
            ()
          }
        } finally batch.unpersist()
      }
      .option("checkpointLocation", checkpointDir)
      // flush-interval ↔ the micro-batch trigger period: the default
      // block keeps AvailableNow (drain-and-stop, the spec harness
      // contract); a configured interval runs the continuous cadence
      .trigger(
        if (cfg.sink.cloudStorageConfig.isDefault ||
            cfg.sink.cloudStorageConfig.flushInterval == "5s")
          Trigger.AvailableNow()
        else Trigger.ProcessingTime(
          cfg.sink.cloudStorageConfig.flushIntervalMs))
      .start()
  }

  /** Static-schema handshake renderer per encoding format (the
    * fixture payload shape; the evolving compositions pass a
    * live-store renderer instead). */
  private def staticBootstrapRenderer(cfg: ChangefeedConfig)
      : (String, String) => String =
    if (cfg.sink.encodingFormat == "avro")
      graft.functions.SimpleAvroWire.bootstrapFrame(_, _, 0L)
    else Codecs.bootstrapValue

  def runMqStream(spark: SparkSession, cfg: ChangefeedConfig, env: DataFrame,
                  sinkDir: String, checkpointDir: String,
                  allTablesAtStart: Seq[(String, String)] = Nil): StreamingQuery = {
    val (bootstrapper, bootstrapOn) =
      prepareMqSink(spark, cfg, sinkDir, allTablesAtStart)
    pipeline(spark, cfg)(env)
      .writeStream
      .queryName(cfg.id)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sinkMqBatch(cfg, bootstrapper, bootstrapOn, sinkDir,
          bootstrapValueOf = staticBootstrapRenderer(cfg))(batch, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One encoded micro-batch onto the MQ file sink: bootstrap
    * handshakes, large-message handling, rows-then-resolved ordering.
    * Shared by the static-schema and the DDL-evolving compositions —
    * the latter passes a LIVE handshake renderer + per-table schema
    * version so a DDL re-triggers the handshake with the new shape. */
  private def sinkMqBatch(cfg: ChangefeedConfig, bootstrapper: Bootstrapper,
                          bootstrapOn: Boolean, sinkDir: String,
                          bootstrapValueOf: (String, String) => String =
                            Codecs.bootstrapValue,
                          versionOf: (String, String) => Long = (_, _) => 0L)
                         (batch: DataFrame, batchId: Long): Unit = {
    val lmh = cfg.sink.largeMessageHandle
    locally {
        // fault-injection site (api/v2 failpoint surface): a `return`/
        // `panic` expression fails this batch before anything commits,
        // `sleep` stalls it — the knobs the reference's chaos tests
        // drive through /debug/failpoints
        Failpoints.evalThrow("graft/changefeed/batch")
        if (bootstrapOn) {
          // per-table row counts: one table-count-sized aggregate, the
          // batch equivalent of the reference's per-row addEvent
          val counts = batch.groupBy(col("_schema"), col("_table")).count()
            .collect()
            .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toSeq
          val due = bootstrapper.onBatch(counts, System.currentTimeMillis(),
            versions = counts.map { case (k, _) => k -> versionOf(k._1, k._2) }.toMap)
          if (due.nonEmpty) {
            // handshake BEFORE the rows it describes (addEvent sends
            // on first sight, before the row ships); partition 0 only
            // unless send-bootstrap-to-all-partition
            val parts: Seq[Int] =
              if (cfg.sink.sendBootstrapToAllPartition)
                0 until cfg.sink.numPartitions
              else Seq(0)
            val s = batch.sparkSession
            val hs = due.flatMap { case (sc, tb) =>
              parts.map(p => (p.toLong, 0L, "bootstrap",
                bootstrapValueOf(sc, tb)))
            }
            // handshakes are control-plane-sized too: driver-direct
            // append with the Spark-job fallback (see resolved below)
            if (!graft.sinks.TinyParquet.writeControlFrames(
                s.sessionState.newHadoopConf(), sinkDir, hs)) {
              import s.implicits._
              hs.toDF("_partition", "_commit_ts", "_kind", "_value")
                .coalesce(1)
                .write.mode("append").parquet(sinkDir)
            }
          }
        }
        // large-message handling on the encoded batch: oversized
        // values become handle-key-only messages or claim-check
        // pointers (the stored objects upload first, so a pointer is
        // never visible before its object is durable)
        val handled =
          if (lmh.disabled) batch
          else if (lmh.handleKeyOnly) cfg.sink.protocol match {
            // protocol-faithful hk re-encode (each protocol's own
            // oversize form, not the generic compact)
            case Protocol.Open => graft.functions.LargeMessage
              .openHandleKeyOnly(batch, cfg.sink.maxMessageBytes)
            case Protocol.Simple if cfg.sink.encodingFormat == "avro" =>
              graft.functions.LargeMessage.simpleAvroHandleKeyOnly(
                batch, cfg.sink.maxMessageBytes, cfg.handleKeys)
            case Protocol.Simple => graft.functions.LargeMessage
              .simpleHandleKeyOnly(batch, cfg.sink.maxMessageBytes)
            case _ => graft.functions.LargeMessage
              .canalHandleKeyOnly(batch, cfg.sink.maxMessageBytes)
          }
          else {
            val counted: Long => Unit =
              n => SinkCounters.addClaimChecksSent(cfg.id, n)
            cfg.sink.protocol match {
              case Protocol.Open => graft.functions.LargeMessage.openClaimCheck(
                batch, cfg.sink.maxMessageBytes, lmh.claimCheckStorageUri,
                onStored = counted)
              case Protocol.Simple if cfg.sink.encodingFormat == "avro" =>
                graft.functions.LargeMessage.simpleAvroClaimCheck(
                  batch, cfg.sink.maxMessageBytes, lmh.claimCheckStorageUri,
                  cfg.handleKeys, onStored = counted)
              case Protocol.Simple => graft.functions.LargeMessage.simpleClaimCheck(
                batch, cfg.sink.maxMessageBytes, lmh.claimCheckStorageUri,
                rawValue = lmh.claimCheckRawValue, onStored = counted)
              case _ => graft.functions.LargeMessage.canalClaimCheck(
                batch, cfg.sink.maxMessageBytes, lmh.claimCheckStorageUri,
                rawValue = lmh.claimCheckRawValue, onStored = counted)
            }
          }
        // rows commit FIRST, control messages second: a resolved-ts
        // event must never be visible before every row it covers is
        // durable (the reference's watermark contract). The resolved
        // ts itself rides the row write as an observed metric —
        // ONE pass over the batch, no persist and no second agg scan
        // (at scale the batch need never fit in storage memory).
        val openBatch =
          cfg.sink.openBatchWire && cfg.sink.protocol == Protocol.Open
        val obs = org.apache.spark.sql.Observation(s"resolved-$batchId")
        val observed = handled.observe(obs, max(col("_commit_ts")).as("resolved"))
        if (openBatch) {
          // the open protocol's REAL wire: many events per record under
          // the batch framing (open/encoder.go:40-224). A record frame's
          // _commit_ts is its per-partition batch sequence (the Kafka
          // offset analog — replay order); per-event commit ts ride the
          // framed keys. The record's binary key/value wrap base64 into
          // the string frame (the FileMq transport stand-in).
          graft.functions.OpenBatch.packOpenBatches(
              observed, cfg.sink.maxBatchSize, cfg.sink.maxMessageBytes,
              orderCols = Seq("_commit_ts", "_value"),
              valueCodec = lmh.compression)
            .select(col("_partition"), col("_batch_seq").cast("long").as("_commit_ts"),
              lit("batch").as("_kind"),
              graft.functions.OpenBatch.frameJsonCol(
                col("_key_bytes"), col("_value_bytes")).as("_value"))
            .write.mode("append").parquet(sinkDir)
        } else {
          // encoders that carry the envelope `_row_id` (the per-event
          // production order) persist it as the frame `_offset` — the
          // Kafka-offset analog a consumer tiebreaks same-commit-ts
          // rows of one key on (replay order is part of the contract)
          val offCol =
            if (observed.columns.contains("_row_id")) col("_row_id")
            else lit(null).cast("long")
          observed
            .select(col("_partition"), col("_commit_ts"),
              lit("row").as("_kind"), offCol.as("_offset"), col("_value"))
            .write.mode("append").parquet(sinkDir)
        }
        obs.get.get("resolved") match {
          // avro checkpoint events ship ONLY under
          // avro-enable-watermark (EncodeCheckpointEvent returns nil
          // otherwise, encoder.go:106-120)
          case Some(_: Long) if cfg.sink.protocol == Protocol.Avro &&
              !cfg.sink.avroEnableWatermark => ()
          case Some(resolved: Long) =>
            // the control payload is protocol-specific: open rides in
            // the key, canal-json/simple carry a watermark value; the
            // open BATCH wire frames the checkpoint event's bytes
            // (EncodeCheckpointEvent, encoder.go:241-273)
            val key =
              if (openBatch) {
                val (kb, vb) = graft.functions.OpenBatch.resolvedMessage(resolved)
                graft.functions.OpenBatch.frameJson(kb, vb)
              } else {
                val (k, v) = Codecs.resolvedMessageFor(cfg.sink.protocol,
                  resolved, cfg.sink.encodingFormat,
                  debeziumDisableSchema = cfg.sink.debeziumDisableSchema)
                if (v.nonEmpty) v else k
              }
            val s = batch.sparkSession
            // one control message per routing partition (the reference
            // broadcasts resolved events to every MQ partition); the
            // rows job above has committed, so control-after-rows
            // visibility holds. Driver-direct parquet append (a Spark
            // job per micro-batch costs 115-190 ms of pure fixed cost
            // for numPartitions rows); falls back to the job write if
            // the direct writer cannot reach the sink FS.
            val ctrl = (0 until cfg.sink.numPartitions).map(p =>
              (p.toLong, resolved, "resolved", key))
            if (!graft.sinks.TinyParquet.writeControlFrames(
                s.sessionState.newHadoopConf(), sinkDir, ctrl)) {
              import s.implicits._
              ctrl.toDF("_partition", "_commit_ts", "_kind", "_value")
                .coalesce(1)
                .write.mode("append").parquet(sinkDir)
            }
          case _ => () // empty batch: nothing durable to cover
        }
    }
  }

  /** Post-run checkpoint summary (the resolved-ts/progress the
    * coordinator would persist): per-partition max commit ts + count. */
  def progress(spark: SparkSession, sinkDir: String): DataFrame =
    spark.read.parquet(sinkDir)
      .groupBy(col("_partition"))
      .agg(max(col("_commit_ts")).as("resolved_ts"), count(lit(1)).as("n_events"))
}
