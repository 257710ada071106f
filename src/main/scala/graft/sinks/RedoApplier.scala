package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Routing, Transforms}

/** Standalone redo-log applier — the disaster-recovery entry point
  * (SURVEY §2.8; reference pkg/applier/redo.go:59 `RedoApplier`,
  * :170 `consumeLogs`, :456 `Apply`): given only a redo directory, it
  * reads the meta watermarks, replays the logged window
  * (checkpointTs, resolvedTs] and renders the exact downstream
  * statement stream that restores eventual consistency.
  *
  * Reference semantics carried over:
  *  - the window: rows at or below the checkpoint are already applied
  *    downstream and never replay; rows above the resolved ts are not
  *    durably complete and never replay (consumeLogs reads meta
  *    first);
  *  - update split: an update whose handle key changed replays as
  *    DELETE-then-INSERT (`updateEventSplitter`, redo.go:62) — REPLACE
  *    cannot move a key;
  *  - idempotent forms: replay is re-delivery by definition, so every
  *    DML renders in safe mode (REPLACE / DELETE — the applier's
  *    `batch-dml-enable=false` + safe apply path, redo.go:468);
  *  - DDL interleave: a DDL applies only after every row with
  *    commitTs ≤ its own (shouldApplyDDL, redo.go:181-190 — note this
  *    is DML-first at equal ts, the OPPOSITE of the live changefeed's
  *    DDL-first rule, because redo rows were logged by dispatchers
  *    that had already observed the pre-DDL schema).
  *
  * Spark-first: the applier is one declarative plan over the log
  * parquet — the window predicate pushes into the scan, the statement
  * render is the sink's own codegen'd expression, and the DDL
  * interleave is an `_apply_order` sort key instead of a driver-side
  * merge loop. Nothing here is row-count-scaled driver state.
  */
object RedoApplier {

  /** Advance the applied-through checkpoint meta — called by the sink
    * after a successful flush (the meta the reference's redo meta
    * file pairs with the resolved ts). */
  def advanceCheckpoint(spark: SparkSession, dir: String, ts: Long): Unit = {
    import spark.implicits._
    Seq(ts).toDF("checkpoint_ts").write.mode("append").parquet(s"$dir/ckpt")
  }

  /** Applied-through watermark: max over checkpoint meta, MinValue
    * when the sink never flushed (full replay). */
  def checkpointTs(spark: SparkSession, dir: String): Long =
    if (!new java.io.File(s"$dir/ckpt").isDirectory) Long.MinValue
    else {
      val r = spark.read.parquet(s"$dir/ckpt")
        .agg(max(col("checkpoint_ts"))).head()
      if (r.isNullAt(0)) Long.MinValue else r.getLong(0)
    }

  /** Log a DDL alongside the row log (the reference's separate DDL
    * redo log, reader.ReadNextDDL). Expects
    * (_schema, _table, _commit_ts, query). */
  def appendDdl(ddls: DataFrame, dir: String): Unit =
    ddls.select(col("_schema"), col("_table"), col("_commit_ts"), col("query"))
      .write.mode("append").parquet(s"$dir/ddl")

  /** The replay window (checkpointTs, resolvedTs] from the meta. */
  def replayWindow(spark: SparkSession, dir: String): (Long, Long) =
    (checkpointTs(spark, dir), RedoLog.resolvedTs(spark, dir))

  /** The full replay statement stream: windowed + deduped log rows →
    * key-change update split → safe-mode sink statements, with logged
    * DDLs interleaved DML-first at equal commit ts. Sorting by
    * `_apply_order` (then `_partition`-local commit order) reproduces
    * the reference applier's apply sequence; `_partition = -1` marks
    * DDL barriers (they gate every worker, waitTableFlush). */
  /** The logged window, unsealing it when the dir is an encrypted
    * (KEYMETA-carrying) log and a master key is supplied. */
  def logWindow(spark: SparkSession, dir: String, ck: Long, rts: Long,
                masterKey: Option[Array[Byte]]): DataFrame =
    masterKey match {
      case Some(mk) if java.nio.file.Files.exists(
          java.nio.file.Paths.get(dir, "KEYMETA")) =>
        RedoLog.readEncrypted(spark, dir, mk, ck, rts)
      case _ => RedoLog.read(spark, dir, ck, rts)
    }

  /** `routes`: the changefeed's dispatch rules — replay renders
    * statements against the ROUTED target-schema/target-table names,
    * exactly like the live sink (pkg/applier/redo.go replays through
    * the sink path; redo_apply_table_route: a routed feed's redo
    * recovery must land rows in the routed tables, not the source
    * names). Routing applies BEFORE the key-change split and the
    * conflict-key partition hash, so per-key ordering is computed on
    * the downstream identity the statements target. */
  def replayStatements(spark: SparkSession, dir: String,
                       handleKeys: Seq[String] = Seq("user_id"),
                       numWorkers: Int = 8,
                       masterKey: Option[Array[Byte]] = None,
                       routes: Seq[graft.model.DispatchRule] = Nil,
                       splitUpdateOnKeyChange: Boolean = true): DataFrame = {
    val (ck, rts) = replayWindow(spark, dir)
    val window = Routing.applyTableRoutes(
      logWindow(spark, dir, ck, rts, masterKey), routes)
    val split =
      if (splitUpdateOnKeyChange) Transforms.updateSplit(window, handleKeys)
      else window
    val dml = MysqlSink.statements(split, handleKeys, numWorkers, safeMode = true)
      .withColumn("_apply_order", col("_commit_ts") * 2)
    val withDdl =
      if (!new java.io.File(s"$dir/ddl").isDirectory) dml
      else {
        // routed DDL rewrites the statement text too (router.go
        // ApplyToDDLEvent → rewriteParserBackedDDLQuery): the frame's
        // metadata AND its `query` must name the routed table
        val ddl = Routing.applyTableRoutes(
          spark.read.parquet(s"$dir/ddl"), routes, ddlQueryCol = Some("query"))
          .filter(col("_commit_ts") > ck && col("_commit_ts") <= rts)
          .select(
            lit(-1).as("_partition"),
            lit(-1L).as("_row_id"),
            col("_schema"), col("_table"), col("_commit_ts"),
            (col("_commit_ts") - 1L).as("_start_ts"),
            lit("DDL").as("_op"),
            col("query").as("_stmt"),
            (col("_commit_ts") * 2 + 1).as("_apply_order"))
        dml.unionByName(ddl)
      }
    withDdl
  }

  /** The table state the window replay converges the downstream to —
    * the convergence-check form (RedoLog.replay over the same
    * window). */
  def replayState(spark: SparkSession, dir: String,
                  masterKey: Option[Array[Byte]] = None,
                  routes: Seq[graft.model.DispatchRule] = Nil): DataFrame = {
    val (ck, rts) = replayWindow(spark, dir)
    graft.operators.Materialize.tableState(Routing.applyTableRoutes(
      logWindow(spark, dir, ck, rts, masterKey), routes))
  }
}
