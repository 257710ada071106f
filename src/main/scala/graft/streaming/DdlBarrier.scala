package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{ColumnDef, DdlAction, SchemaRegistry}

/** DDL barrier at micro-batch boundaries (SURVEY §3.3/§7.4 hard part
  * #6; reference maintainer/barrier.go:41-323 — all dispatchers of
  * blocked tables reach the DDL's commit-ts before it applies).
  *
  * In Spark the barrier is free: the driver serializes micro-batches,
  * so each batch processes DML strictly below the next pending DDL's
  * commit-ts, applies the DDL to the (immutable) [[SchemaRegistry]],
  * then continues — every row in a batch is decoded against exactly
  * one registry snapshot, never a torn one.
  */
object DdlBarrier {

  final case class Step(registry: SchemaRegistry, batch: DataFrame, upToTs: Long)

  /** Plan the barrier-aligned batches of `env` against a DDL stream:
    * returns one Step per DDL interval — the DML below that DDL plus
    * the registry snapshot valid for it. The last step carries the
    * remaining DML with the fully-evolved registry.
    *
    * Driver-side only plans the SPLIT POINTS (ddl list is
    * DDL-rate-sized); the per-step DataFrames stay lazy/distributed.
    */
  def plan(env: DataFrame, ddls: Seq[DdlAction],
           initial: SchemaRegistry): Seq[Step] = {
    val sorted = ddls.sortBy(_.ts)
    val bounds = sorted.map(_.ts) :+ Long.MaxValue
    var reg = initial
    var lo = Long.MinValue
    bounds.zipWithIndex.map { case (hi, i) =>
      val batch = env.filter(col("_commit_ts") >= lo && col("_commit_ts") < hi)
      val step = Step(reg, batch, hi)
      if (i < sorted.length) reg = reg.apply(sorted(i))
      lo = hi
      step
    }
  }

  /** Checkpoint compaction — the barrier-loop face of the schema GC
    * ([[graft.model.SchemaRegistry.truncateBelow]], the schemastore
    * trim below the resolved gc ts): once the changefeed's checkpoint
    * has passed `ckptTs`, every DDL at or below it is already folded
    * into all future batches' snapshots, so fold them into the
    * initial registry, GC versions below the checkpoint, and keep
    * only the still-pending DDLs. `plan(env > ckptTs, ddls', init')`
    * is step-for-step identical to the uncompacted plan over the same
    * stream, while both the registry and the driver-side DDL list
    * stay bounded by the post-checkpoint DDL count on a feed of any
    * age. */
  def compact(initial: SchemaRegistry, ddls: Seq[DdlAction],
              ckptTs: Long): (SchemaRegistry, Seq[DdlAction]) = {
    val (folded, pending) = ddls.sortBy(_.ts).partition(_.ts <= ckptTs)
    (initial.applyAll(folded).truncateBelow(ckptTs), pending)
  }

  /** Render a ColumnDef default in its declared type (mounter default
    * values, chunk.go:182). `versionTs` (ns) backs
    * DEFAULT CURRENT_TIMESTAMP (ddl_default_current_timestamp
    * coverage): the reference fills with the DDL execution time — here
    * deterministically the schema version's commit ts, canonical
    * string rendering. */
  private def defaultLit(cd: ColumnDef, versionTs: Long): org.apache.spark.sql.Column =
    cd.default match {
      case None => lit(null)
      case Some(v) if v.equalsIgnoreCase("current_timestamp") ||
        v.equalsIgnoreCase("now()") =>
        date_format(timestamp_micros(lit(versionTs / 1000L)),
          "yyyy-MM-dd HH:mm:ss")
      case Some(v) => cd.dataType.toLowerCase match {
        case "bigint" | "long" | "int" | "integer" | "smallint" | "tinyint" => lit(v.toLong)
        case "double" | "float" | "real" | "decimal" => lit(v.toDouble)
        case "boolean" => lit(v.toBoolean)
        case _ => lit(v)
      }
    }

  /** Decode a batch against its snapshot: project each row's payload
    * to the columns of its table's schema as-of this step's interval
    * (every commit-ts in the batch resolves to the same version —
    * that is the barrier invariant). Columns the schema doesn't have
    * yet are dropped to null; columns the schema has but the data
    * lacks surface their ColumnDef.default (mounter defaults,
    * chunk.go:182).
    *
    * `payloadCols` = the columns physically present in the data's
    * `after` struct. Output carries the union of payload and schema
    * columns so a late AddColumn's default materializes. */
  def conform(step: Step, payloadCols: Seq[String]): DataFrame = {
    val keep = step.batch.columns.filter(_.startsWith("_")).map(col)
    val asOfTs = if (step.upToTs == Long.MaxValue) Long.MaxValue else step.upToTs - 1
    val snapshots = step.registry.versions.keys.toSeq.sorted
      .flatMap { case (s, t) => step.registry.asOf(s, t, asOfTs).map(((s, t), _)) }
    val allCols =
      (payloadCols ++ snapshots.flatMap(_._2.columns.map(_.name))).distinct
    val projected = allCols.map { c =>
      val branches = snapshots.flatMap { case ((s, t), sch) =>
        sch.columns.find(_.name == c).map { cd =>
          val src =
            if (payloadCols.contains(c)) col(s"after.$c")
            else defaultLit(cd, sch.versionTs)
          (col("_schema") === s && col("_table") === t, src)
        }
      }
      branches.foldRight(lit(null): org.apache.spark.sql.Column) {
        case ((cond, src), acc) => when(cond, src).otherwise(acc)
      }.as(c)
    }
    step.batch.select(keep.toIndexedSeq ++ projected: _*)
  }
}
