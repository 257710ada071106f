package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY §4 partitioning
  * row): facts written bucketed+sorted by their join key join WITHOUT
  * a shuffle — at 100 TB this turns the nightly fact⋈fact join from
  * the dominant exchange into a local zip of pre-sorted buckets.
  * The reference's analog is its fixed table-span partitioning of the
  * event store (one sorted range per table span).
  */
object Bucketing {

  /** Write a DataFrame as a bucketed, per-bucket-sorted table in the
    * session catalog (parquet files under `path`). */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
                    bucketCol: String, numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** True if the physical plan of `df` contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
