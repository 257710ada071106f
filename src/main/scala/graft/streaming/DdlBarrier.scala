package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{DdlAction, SchemaRegistry}

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

  /** Decode a batch against its snapshot: project each row's payload
    * to the columns of the schema version as-of its commit-ts —
    * columns added later are absent, columns added earlier but
    * missing in the data surface their defaults
    * (mounter defaults, chunk.go:182). */
  def conform(step: Step, payloadCols: Seq[String]): DataFrame = {
    // per-table as-of column sets, broadcast as literal metadata
    val keep = step.batch.columns.filter(_.startsWith("_")).map(col)
    val projected = payloadCols.map { c =>
      val presentFor = step.registry.versions.keys.toSeq
        .filter { case (s, t) =>
          step.registry.asOf(s, t, Long.MaxValue).exists(_.columns.exists(_.name == c)) }
      if (presentFor.isEmpty) lit(null).as(c)
      else {
        val cond = presentFor.map { case (s, t) =>
          col("_schema") === s && col("_table") === t
        }.reduce(_ || _)
        when(cond, col(s"after.$c")).otherwise(lit(null)).as(c)
      }
    }
    step.batch.select(keep ++ projected: _*)
  }
}
