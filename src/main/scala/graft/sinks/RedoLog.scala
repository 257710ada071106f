package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Materialize

/** Redo log — the consistency WAL (SURVEY §2.8; reference
  * pkg/redo/writer + reader, event codec pkg/common/event/redo.go:
  * 39-53, applier pkg/applier/redo.go:59,456).
  *
  * The reference logs every row change (and DDL) to cheap storage
  * BEFORE the sink applies it, advancing a (checkpointTs, resolvedTs)
  * meta pair; after a disaster the RedoApplier replays the window
  * (checkpointTs, resolvedTs] into the downstream to restore eventual
  * consistency.
  *
  * Spark-first: the log is an append-only parquet directory of
  * envelope rows plus a tiny meta directory of flush watermarks.
  * Writes are at-least-once (a failed batch may re-append), so the
  * applier dedupes on the envelope identity before applying — the
  * same idempotence the reference gets from REPLACE-mode apply.
  * Replay reuses [[graft.operators.Materialize.tableState]], i.e. the
  * applier IS the sink's apply path, run from the log instead of the
  * live stream.
  */
object RedoLog {

  /** Append a batch to the log and advance the resolved-ts meta.
    * Called from foreachBatch BEFORE the sink applies the batch
    * (log-ahead ordering). */
  def append(env: DataFrame, dir: String): Unit = {
    env.write.mode("append").parquet(s"$dir/log")
    val resolved = env.agg(max(col("_commit_ts"))).head()
    if (!resolved.isNullAt(0)) {
      val spark = env.sparkSession
      import spark.implicits._
      Seq(resolved.getLong(0)).toDF("resolved_ts")
        .write.mode("append").parquet(s"$dir/meta")
    }
  }

  /** [[append]] with the payload sealed at rest — the reference's
    * CMEK encryption surface (pkg/config/encryption.go
    * EnableEncryption; pkg/encryption/cipher.go) applied to the WAL.
    * Each envelope row serializes to JSON and is AES-GCM-sealed
    * inside codegen; only the identity/meta columns the log machinery
    * needs (watermark, window filter, GC, dedup) stay plaintext —
    * the same meta-readable/payload-sealed split the reference keeps.
    * First append creates `dir/KEYMETA`: the data key wrapped by the
    * master key plus the envelope schema DDL (self-describing
    * decrypt). */
  def appendEncrypted(env: DataFrame, dir: String,
                      masterKey: Array[Byte]): Unit = {
    import graft.functions.AtRestEncryption
    val key = AtRestEncryption.ensureKeyFile(dir, masterKey, env.schema.toDDL)
    val cols = env.columns.map(col)
    env.select(
        col("_commit_ts"), col("_row_id"), col("_op"),
        AtRestEncryption.sealColumn(to_json(struct(cols.toIndexedSeq: _*)), key)
          .as("_sealed"))
      .write.mode("append").parquet(s"$dir/slog")
    val resolved = env.agg(max(col("_commit_ts"))).head()
    if (!resolved.isNullAt(0)) {
      val spark = env.sparkSession
      import spark.implicits._
      Seq(resolved.getLong(0)).toDF("resolved_ts")
        .write.mode("append").parquet(s"$dir/meta")
    }
  }

  /** [[read]] semantics over the sealed log: window filter and
    * exactly-once dedup run on the plaintext meta columns (no decrypt
    * needed to prune), then surviving rows unseal and re-inflate to
    * the logged envelope schema. */
  def readEncrypted(spark: SparkSession, dir: String, masterKey: Array[Byte],
                    checkpointTs: Long = Long.MinValue,
                    upToTs: Long = Long.MaxValue): DataFrame = {
    import graft.functions.AtRestEncryption
    val (key, ddl) = AtRestEncryption.loadKeyFile(dir, masterKey)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    spark.read.parquet(s"$dir/slog")
      .filter(col("_commit_ts") > checkpointTs && col("_commit_ts") <= upToTs)
      .dropDuplicates("_row_id", "_op", "_commit_ts")
      .select(from_json(
        AtRestEncryption.openStringColumn(col("_sealed"), key), schema).as("__r"))
      .select(schema.fieldNames.toIndexedSeq.map(f => col(s"__r.`$f`")): _*)
  }

  /** The log's resolved-ts: every change with commit-ts ≤ this is
    * durably logged (max over flush watermarks). */
  def resolvedTs(spark: SparkSession, dir: String): Long = {
    val r = spark.read.parquet(s"$dir/meta").agg(max(col("resolved_ts"))).head()
    if (r.isNullAt(0)) Long.MinValue else r.getLong(0)
  }

  /** Read back the logged window (checkpointTs, upToTs], deduped to
    * exactly-once on the envelope identity (re-appended batches
    * collapse). */
  def read(spark: SparkSession, dir: String,
           checkpointTs: Long = Long.MinValue,
           upToTs: Long = Long.MaxValue): DataFrame =
    // mergeSchema: a log spanning a DDL boundary holds appends with
    // pre- and post-DDL payload shapes (and a heterogeneous feed holds
    // one shape per group) — the replay must see the UNION of the
    // image fields, old appends null-filling the added columns, or a
    // single-footer read silently drops post-DDL columns. Footer-count
    // cost only (log files, not rows).
    spark.read.option("mergeSchema", "true").parquet(s"$dir/log")
      .filter(col("_commit_ts") > checkpointTs && col("_commit_ts") <= upToTs)
      .dropDuplicates("_row_id", "_op", "_commit_ts")

  /** GC: drop log FILES entirely below the global checkpoint
    * (logservice/eventstore/gc.go — data below checkpoint is never
    * replayed, so retention prunes whole segments). File-level: a file
    * is removed only when its max commit-ts ≤ checkpointTs — replay
    * reads strictly above the checkpoint, so such files can never
    * contribute. Stats come from a tiny per-file max query
    * (control-plane cost). */
  def gc(spark: SparkSession, dir: String, checkpointTs: Long): Int = {
    val logDir = new java.io.File(s"$dir/log")
    val files = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    var removed = 0
    files.foreach { f =>
      val mx = spark.read.parquet(f.getPath)
        .agg(max(col("_commit_ts"))).head()
      if (!mx.isNullAt(0) && mx.getLong(0) <= checkpointTs) {
        if (f.delete()) removed += 1
      }
    }
    removed
  }

  /** The applier: replay the logged window into final table state —
    * what the downstream must look like after recovery
    * (pkg/applier/redo.go:456 consumes the log through the same sink
    * path; here both routes share Materialize.tableState). */
  def replay(spark: SparkSession, dir: String,
             checkpointTs: Long = Long.MinValue,
             upToTs: Long = Long.MaxValue): DataFrame =
    Materialize.tableState(read(spark, dir, checkpointTs, upToTs))
}
