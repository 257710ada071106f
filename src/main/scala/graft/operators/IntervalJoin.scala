package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Big-big interval-containment join (probe ts ∈ [start, end]).
  *
  * Spark plans a bare inequality join as a (broadcast) nested loop —
  * a quadratic shape with a fits-in-memory requirement on one side.
  * Bucketing restores the equi-join: each interval explodes to the
  * fixed-width time buckets it covers, each probe maps to its single
  * bucket, and the join runs hash-partitioned on the bucket with the
  * exact containment predicate evaluated behind the hash match. Every
  * qualifying (probe, interval) pair meets in EXACTLY one task — the
  * probe's bucket — so there is no dedup pass. Replication is
  * ⌈len/width⌉ rows per interval: width ≈ the typical interval length
  * keeps it ~2×, and both sides stay data-scaled (no broadcast
  * requirement at any size — the same argument as the as-of join).
  *
  * Bucket ids are computed with integral `div`, never double
  * division: ns epochs (~1.7e18) exceed a double's 53-bit exact
  * range, and a rounded quotient can floor into the wrong bucket.
  */
object IntervalJoin {

  /** Join `probes` to every interval containing `probes(tsCol)`.
    * Column names must not collide across the two inputs (rename
    * before calling — the result carries both sides' columns). */
  def containment(probes: DataFrame, tsCol: String,
                  intervals: DataFrame, startCol: String, endCol: String,
                  bucketNs: Long): DataFrame = {
    require(bucketNs > 0, s"bucket width must be positive, got $bucketNs")
    def bucketOf(c: String): Column = expr(s"`$c` div $bucketNs")
    val iv = intervals.withColumn("__ibk",
      explode(sequence(bucketOf(startCol), bucketOf(endCol))))
    val pr = probes.withColumn("__pbk", bucketOf(tsCol))
    pr.join(iv, col("__pbk") === col("__ibk") &&
        col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__pbk", "__ibk")
  }
}
