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

  /** Exact reference file naming: rename each partition directory's
    * committed part-files to `CDC{idx}.{ext}` with a zero-padded
    * index continuing from the directory's current max
    * (generator.go:342 index file, :350-420 data files;
    * file-index-width config). Runs AFTER the Spark commit — renames
    * of committed files are atomic per file and idempotent on re-run
    * (already-renamed files match the CDC pattern and only advance
    * the index), which is the same visibility contract the
    * reference's indexer keeps. Driver-side directory walk: the file
    * COUNT is partition-dir-sized, not row-sized. */
  def applyCdcNaming(baseDir: String, ext: String, indexWidth: Int = 6): Unit = {
    val cdcName = ("^CDC(\\d{" + indexWidth + "})\\." + ext + "$").r
    def walk(dir: java.io.File): Unit = {
      val children = Option(dir.listFiles()).getOrElse(Array.empty)
      children.filter(_.isDirectory).foreach(walk)
      val parts = children.filter(f => f.isFile &&
        f.getName.startsWith("part-")).sortBy(_.getName)
      if (parts.nonEmpty) {
        var idx = children.map(_.getName).collect {
          case cdcName(n) => n.toLong
        }.foldLeft(0L)(math.max)
        parts.foreach { f =>
          idx += 1
          val target = new java.io.File(dir,
            s"CDC${("%0" + indexWidth + "d").format(idx)}.$ext")
          require(f.renameTo(target), s"rename failed: $f -> $target")
        }
        // the index file records the high-water mark (indexer.go)
        java.nio.file.Files.writeString(
          dir.toPath.resolve("CDC.index"), idx.toString)
      }
    }
    walk(new java.io.File(baseDir))
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
