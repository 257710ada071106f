package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cloud-storage sink (SURVEY §2.8; reference path scheme
  * `<schema>/<table>/<tableVersion>/[partition]/[date]/CDC{idx}.{ext}`
  * — pkg/cloudstorage/generator.go:350-420, date-separator
  * year/month/day).
  *
  * Spark-native layout: `partitionBy(schema, table, date)` gives the
  * same prefix structure with engine-managed atomic commits; one file
  * per (partition-dir, task) replaces the reference's file-index
  * bookkeeping (indexer.go) because the commit protocol already
  * guarantees exactly-once visibility.
  */
object StorageSink {

  /** Write encoded messages under schema/table/date prefixes. `fmt` is
    * "parquet" (columnar archive) or "text" (one wire message per
    * line, as the reference's csv/canal-json files). */
  def write(encoded: DataFrame, baseDir: String, fmt: String = "parquet"): Unit = {
    val withDate = encoded.withColumn("_date",
      date_format(timestamp_micros(
        (col("_commit_ts").cast(org.apache.spark.sql.types.DecimalType(38, 0)) /
          lit(1000L)).cast("long")), "yyyy-MM-dd"))
    val cols = Seq("_schema", "_table", "_date")
    fmt match {
      case "text" =>
        withDate.select(col("_value"), col("_schema"), col("_table"), col("_date"))
          .write.mode("append").partitionBy(cols: _*).text(baseDir)
      case _ =>
        withDate.write.mode("append").partitionBy(cols: _*).parquet(baseDir)
    }
  }

  /** Schema metadata file per (schema, table) — the reference writes
    * `schema.json` beside the data (generator.go:103). */
  def writeSchemaMeta(spark: SparkSession, encoded: DataFrame, baseDir: String): Unit = {
    val tables = encoded.select("_schema", "_table").distinct().collect()
    tables.foreach { r =>
      val (s, t) = (r.getString(0), r.getString(1))
      val dir = java.nio.file.Paths.get(baseDir, "meta", s, t)
      java.nio.file.Files.createDirectories(dir)
      val json =
        s"""{"schema":"$s","table":"$t","columns":[
           |{"name":"user_id","type":"bigint"},
           |{"name":"value","type":"double"},
           |{"name":"k","type":"bigint"}]}""".stripMargin
      java.nio.file.Files.writeString(dir.resolve("schema.json"), json)
    }
  }
}
