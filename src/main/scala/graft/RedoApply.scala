package graft

import org.apache.spark.sql.functions._

/** Standalone redo-apply main — the `cdc redo apply` command
  * equivalent (reference pkg/applier/redo.go:456; cmd wiring
  * cmd/redo): `runMain graft.RedoApply <redoDir> [outDir]` reads the
  * redo meta, replays the (checkpoint, resolved] window into the
  * ordered downstream statement stream, optionally writes it as
  * parquet, and prints one JSON status line. For an encrypted log
  * (dir carries KEYMETA), pass the master key base64-encoded in
  * `GRAFT_REDO_MASTER_KEY`. Pass the changefeed's TOML config path in
  * `GRAFT_REDO_CONFIG` to replay with its `[[sink.dispatchers]]`
  * table routes applied — a routed feed's recovery must land rows in
  * the ROUTED tables (redo_apply_table_route), exactly like the live
  * sink.
  *
  * A directory written by the REFERENCE (the upstream's own `.log` +
  * `.meta` wire files) is auto-detected and replayed through the
  * byte-exact [[graft.sinks.RedoWireBridge]] path — point this main
  * at a real upstream redo dir and it recovers from those bytes. */
object RedoApply {

  /** Reference on-disk redo dir = WAL `.log`/`.meta` files present and
    * none of our parquet log layout. */
  private[graft] def isReferenceFormat(dir: String): Boolean = {
    val d = new java.io.File(dir)
    val names = Option(d.list()).getOrElse(Array.empty)
    names.exists(n => n.endsWith(graft.sinks.RedoWire.LogExt) ||
      n.endsWith(graft.sinks.RedoWire.MetaExt)) &&
      !new java.io.File(d, "log").isDirectory &&
      !new java.io.File(d, "slog").isDirectory
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RedoApply <redoDir> [outDir]")
    val dir = args(0)
    val out = args.lift(1)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (isReferenceFormat(dir)) {
      val (ck, rts) = graft.sinks.RedoWire.readMetaWindow(dir)
      val stmts = graft.sinks.RedoWireBridge.statementsFromDir(spark, dir)
      val counts = stmts.agg(
        count(lit(1)).as("n"),
        sum(when(col("_op") === "DDL", 1L).otherwise(0L)).as("ddl")).head()
      out.foreach(o => stmts.orderBy(col("_apply_order"), col("_partition"),
        col("_commit_ts"), col("_row_id")).write.mode("overwrite").parquet(o))
      println(s"""{"metric":"redo_apply","format":"reference-wire",""" +
        s""""checkpoint_ts":$ck,"resolved_ts":$rts,""" +
        s""""statements":${counts.getLong(0)},"ddl":${counts.getLong(1)}}""")
      spark.stop()
      return
    }

    val masterKey = sys.env.get("GRAFT_REDO_MASTER_KEY")
      .map(java.util.Base64.getDecoder.decode)
    // the feed's config drives the WHOLE replay surface, not just the
    // routes: its handle keys decide update-split + conflict-key
    // partitioning, its split flag decides whether key-change updates
    // fan out to DELETE+INSERT
    val cfg = sys.env.get("GRAFT_REDO_CONFIG").map { path =>
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      graft.model.ConfigToml.toConfig(
        graft.model.ConfigToml.parse(text), "redo-apply")
    }
    val (ck, rts) = graft.sinks.RedoApplier.replayWindow(spark, dir)
    val stmts = graft.sinks.RedoApplier.replayStatements(spark, dir,
      handleKeys = cfg.map(_.handleKeys).getOrElse(Seq("user_id")),
      masterKey = masterKey,
      routes = cfg.map(_.sink.dispatch).getOrElse(Nil),
      splitUpdateOnKeyChange = cfg.forall(_.splitUpdateOnKeyChange))
    val counts = stmts.agg(
      count(lit(1)).as("n"),
      sum(when(col("_op") === "DDL", 1L).otherwise(0L)).as("ddl")).head()
    out.foreach(o => stmts.orderBy(col("_apply_order"), col("_partition"),
      col("_commit_ts"), col("_row_id")).write.mode("overwrite").parquet(o))
    println(s"""{"metric":"redo_apply","checkpoint_ts":$ck,"resolved_ts":$rts,""" +
      s""""statements":${counts.getLong(0)},"ddl":${counts.getLong(1)}}""")
    spark.stop()
  }
}
