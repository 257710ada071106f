package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema as-of-timestamp resolution (SURVEY §2.10; reference
  * SchemaStore.GetTableInfo(tableID, ts) returns the largest schema
  * version ≤ ts — logservice/schemastore/schema_store.go:50-54,
  * multi_version.go).
  *
  * Implemented as a broadcast as-of join: the version table (one row
  * per (table, versionTs)) is tiny relative to the event stream — it's
  * DDL-rate-sized — so it broadcasts; each event picks the greatest
  * version ≤ its commit-ts. No shuffle of the event side beyond what
  * the dedup window needs; at cluster scale the window can be replaced
  * by a sorted-array lookup expression over the broadcast if DDL
  * cardinality per table grows.
  */
object SchemaAsOf {

  /** Attach `_schema_version` (greatest versionTs ≤ commit_ts, null if
    * none) to each event. `versions` has columns
    * (_schema, _table, version_ts).
    *
    * versions is first collapsed to one array row per table (the
    * version list per table is DDL-count-sized), broadcast, joined
    * 1:1, and the as-of pick is a pure array expression — no row
    * multiplication, no window, zero shuffle on the event side. */
  def resolve(env: DataFrame, versions: DataFrame): DataFrame = {
    val perTable = versions
      .groupBy(col("_schema"), col("_table"))
      .agg(sort_array(collect_list(col("version_ts"))).as("__versions"))
    env.join(broadcast(perTable), Seq("_schema", "_table"), "left")
      .withColumn("_schema_version",
        array_max(filter(col("__versions"), v => v <= col("_commit_ts"))))
      .drop("__versions")
  }

  /** Deterministic toy DDL/version stream derived from the envelope
    * itself (sparse sample of commit timestamps): stands in for the
    * reference's ddlJobFetcher output in oracle-checked tests. */
  def sampleVersions(env: DataFrame, modulus: Long = 97L): DataFrame =
    env.filter(pmod(col("_row_id"), lit(modulus)) === 0)
      .select(col("_schema"), col("_table"), col("_commit_ts").as("version_ts"))
}
