package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.Tpch
import graft.model.{Envelope, EnvelopeSql}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY §2 appears here as a `queries`
  * entry, with a DuckDB-dialect oracle in `oracleSql` where the
  * semantics are SQL-expressible (else the driver records a rows-only
  * check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> ((s, dir) => Tpch.q1(s, dir)),
    "q3_shipping" -> ((s, dir) => Tpch.q3(s, dir)),
    "q5_local_supplier" -> ((s, dir) => Tpch.q5(s, dir)),
    "q14_promo" -> ((s, dir) => Tpch.q14(s, dir)),
    "q6_forecast" -> ((s, dir) => Tpch.q6(s, dir)),
    "q4_priority" -> ((s, dir) => Tpch.q4(s, dir)),
    "q_event_rollup" -> ((s, dir) => Tpch.eventRollup(s, dir)),
    "q_topk" -> ((s: SparkSession, dir: String) => Tpch.topkRevenue(s, dir)),
    "q_envelope" -> ((s: SparkSession, dir: String) =>
      Envelope.flat(Envelope.fromEvents(Tables.events(s, dir))))
  ) ++ CdcQueries.queries ++ DataQueries.queries ++ ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Tpch.oracle ++ Map(
    "q_envelope" -> EnvelopeSql.query("SELECT * FROM env")
  ) ++ CdcQueries.oracle ++ DataQueries.oracle ++ ExtQueries.oracle
}
