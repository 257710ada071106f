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

  /** Write encoded messages under schema/table/[partition]/date
    * prefixes. `fmt` is "parquet" (columnar archive) or "text" (one
    * wire message per line, as the reference's csv/canal-json files).
    *
    * Physical-partition tables (canal_json_storage_partition_table /
    * csv_storage_partition_table scenarios): when the frame carries a
    * `_partition_num` column — the physical partition's table ID
    * (generator.go:434-444 PartitionNum) — it becomes an extra path
    * level between the table and the date, the reference's optional
    * `[partition]` segment (path_key.go:198-216
    * generateDMLDataDirPath: emitted only when non-zero). */
  def write(encoded: DataFrame, baseDir: String, fmt: String = "parquet",
            maxRecordsPerFile: Option[Long] = None): Unit = {
    val withDate = encoded.withColumn("_date",
      date_format(timestamp_micros(
        (col("_commit_ts").cast(org.apache.spark.sql.types.DecimalType(38, 0)) /
          lit(1000L)).cast("long")), "yyyy-MM-dd"))
    val partitioned = encoded.columns.contains("_partition_num")
    val cols =
      if (partitioned) Seq("_schema", "_table", "_partition_num", "_date")
      else Seq("_schema", "_table", "_date")
    // cloud-storage `file-size` roll: Spark's writer rolls by RECORD
    // count, so the byte cap arrives pre-translated by the caller
    // (fileSize / batch avg record length)
    def withRoll[T](w: org.apache.spark.sql.DataFrameWriter[T]) =
      maxRecordsPerFile.fold(w)(n => w.option("maxRecordsPerFile", n))
    fmt match {
      case "text" =>
        withRoll(withDate.select((col("_value") +: cols.map(col)): _*)
          .write.mode("append").partitionBy(cols: _*)).text(baseDir)
      case _ =>
        withRoll(withDate.write.mode("append").partitionBy(cols: _*))
          .parquet(baseDir)
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

  /** Flush marker: the reference's storage sink writes a `metadata`
    * file carrying the checkpoint ts after each flush
    * (cloudstorage metadata.go) — consumers and the cleaner read it to
    * know what is durable. Idempotent overwrite (monotonic ts). */
  /** Prepend the csv `ticdc-meta$` header line to each NOT-YET-NAMED
    * part-file (csv_encoder.go:46 writes it once per message batch =
    * once per committed file here). Runs between the Spark commit and
    * [[applyCdcNaming]], so only this batch's files rewrite — batch-
    * local IO, never the corpus. `headerFor(schema, table)` renders
    * the table's header (None = unknown table, file left as-is). */
  def prependCsvHeaders(baseDir: String, ext: String,
                        headerFor: (String, String) => Option[String]): Unit = {
    val base = java.nio.file.Paths.get(baseDir)
    if (!java.nio.file.Files.exists(base)) return
    val dec = (s: String) => java.net.URLDecoder.decode(s, "UTF-8")
    java.nio.file.Files.walk(base).forEach { p =>
      val name = p.getFileName.toString
      if (name.startsWith("part-") && name.endsWith(s".$ext")) {
        // recover (schema, table) from the partition dir path
        val segs = base.relativize(p).iterator()
        var sch: String = null; var tbl: String = null
        segs.forEachRemaining { seg =>
          val s2 = seg.toString
          if (s2.startsWith("_schema=")) sch = dec(s2.stripPrefix("_schema="))
          if (s2.startsWith("_table=")) tbl = dec(s2.stripPrefix("_table="))
        }
        if (sch != null && tbl != null) headerFor(sch, tbl).foreach { h =>
          val body = java.nio.file.Files.readAllBytes(p)
          java.nio.file.Files.write(p,
            (h + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8) ++ body)
        }
      }
    }
  }

  def writeCheckpointMeta(baseDir: String, checkpointTs: Long): Unit = {
    val dir = java.nio.file.Paths.get(baseDir)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("metadata"),
      s"""{"checkpoint-ts":$checkpointTs}""")
  }

  def readCheckpointMeta(baseDir: String): Option[Long] = {
    val p = java.nio.file.Paths.get(baseDir, "metadata")
    if (!java.nio.file.Files.exists(p)) None
    else """"checkpoint-ts":(\d+)""".r.findFirstMatchIn(
      java.nio.file.Files.readString(p)).map(_.group(1).toLong)
  }

  /** Date-partition retention (storage_cleanup coverage; reference
    * `file-cleanup-cron-spec`): drop `_date=` partition directories
    * older than `keepDays` relative to `today`. Walks only partition
    * DIRECTORIES (table-count × day-count entries — control-plane
    * sized); data files delete recursively per expired dir. Returns
    * the removed partition paths. */
  def cleanupExpired(baseDir: String, keepDays: Int,
                     today: java.time.LocalDate): Seq[String] = {
    val cutoff = today.minusDays(keepDays.toLong)
    val removed = scala.collection.mutable.ArrayBuffer.empty[String]
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete(); ()
    }
    def walk(dir: java.io.File): Unit = {
      val children = Option(dir.listFiles()).getOrElse(Array.empty)
      children.filter(_.isDirectory).foreach { d =>
        val name = d.getName
        if (name.startsWith("_date=")) {
          val date = java.time.LocalDate.parse(name.stripPrefix("_date="))
          if (date.isBefore(cutoff)) { removed += d.getPath; deleteRec(d) }
        } else walk(d)
      }
    }
    walk(new java.io.File(baseDir))
    removed.toSeq
  }

  /** Spark type → MySQL-ish column type name for schema.json (the
    * reverse of the mounter's type mapping, SURVEY §1.3). */
  def mysqlTypeFor(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType => "tinyint"
      case ShortType => "smallint"
      case IntegerType => "int"
      case LongType => "bigint"
      case FloatType => "float"
      case DoubleType => "double"
      case BooleanType => "tinyint(1)"
      case d: DecimalType => s"decimal(${d.precision},${d.scale})"
      case StringType => "text"
      case BinaryType => "blob"
      case DateType => "date"
      case _: TimestampType => "timestamp"
      case _: TimestampNTZType => "datetime"
      case ArrayType(FloatType, _) => "vector"
      case other => other.simpleString
    }
  }

  private def schemaJson(s: String, t: String,
                         payload: org.apache.spark.sql.types.StructType): String = {
    val cols = payload.fields.map(f =>
      s"""{"name":"${f.name}","type":"${mysqlTypeFor(f.dataType)}"}""")
    s"""{"schema":"$s","table":"$t","columns":[
       |${cols.mkString(",\n")}]}""".stripMargin
  }

  /** Versioned schema file name — the reference's
    * `<schema>/<table>/meta/schema_{tableVersion}_{checksum:%010d}.json`
    * layout (pkg/cloudstorage/generator.go:49-56, schema_file.go:286).
    * The checksum is CRC32 of the canonical schema JSON — a
    * deterministic stand-in for the reference's PositionInertia hash
    * (the exact hash is internal to file naming, not a wire
    * contract). */
  def schemaFileName(version: Long, content: String): String = {
    val crc = new java.util.zip.CRC32()
    crc.update(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f"schema_${version}%d_${crc.getValue}%010d.json"
  }

  private val schemaFileRe =
    """meta/schema_\d+_\d{10}\.json$""".r

  /** Mirrors the reference's IsSchemaFile (generator.go:61). */
  def isSchemaFile(path: String): Boolean =
    schemaFileRe.findFirstIn(path).isDefined

  /** Schema metadata file per (schema, table) — the reference writes
    * versioned `meta/schema_{version}_{checksum}.json` beside the data
    * (generator.go:49-56). Columns derive from the frame's own
    * `after` payload schema (TableInfo-generic, like the reference's
    * generator), never hardcoded. A new table version writes a NEW
    * file — consumers pick the highest version, so schema evolution
    * never overwrites history.
    *
    * Delegates to the executor-side writer — the driver never
    * materializes the table list, so table count is unbounded (the
    * reference's 1M-table design goal; a driver-side collect here
    * would be a 1M-row collect). */
  def writeSchemaMeta(spark: SparkSession, encoded: DataFrame, baseDir: String,
                      tableVersion: Long = 100L): Unit =
    writeSchemaMetaDistributed(encoded, baseDir, tableVersion)

  // ------------------------------------------------------------------
  // Reference-layout schema files (pkg/cloudstorage/schema_file.go):
  // the schema file IS the storage sink's DDL message — a consumer
  // rebuilds TableInfo from it (SchemaFile.DDLEvent/TableInfo), so the
  // evolving composition writes one per DDL at the job's finishedTs.
  // ------------------------------------------------------------------

  /** One TableColumns entry (TableCol, schema_file.go:40-107):
    * ColumnName/ColumnType (upper, UNSIGNED suffix), precision/scale
    * per type family, Nullable "false" and IsPk "true" only when set
    * (omitempty). */
  def tableColJson(name: String, dataType: String,
                   isPk: Boolean, notNull: Boolean,
                   default: Option[String]): String = {
    val typeRe = """(?i)^\s*(\w+)\s*(?:\((\d+)(?:\s*,\s*(\d+))?\))?(\s+unsigned)?""".r
    val m = typeRe.findFirstMatchIn(dataType)
    val base = m.map(_.group(1).toLowerCase).getOrElse("text")
    val flen = m.flatMap(x => Option(x.group(2))).map(_.toInt).getOrElse(-1)
    val dec = m.flatMap(x => Option(x.group(3))).map(_.toInt).getOrElse(-1)
    val unsigned = m.exists(_.group(4) != null)
    val tp = base.toUpperCase + (if (unsigned) " UNSIGNED" else "")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val fields = scala.collection.mutable.ArrayBuffer[String](
      s""""ColumnName": "${esc(name)}"""",
      s""""ColumnType": "$tp"""")
    default.foreach(d => fields += s""""ColumnDefault": "${esc(d)}"""")
    // precision/scale per fromTiColumnInfo's type families
    base match {
      case "timestamp" | "datetime" | "time" =>
        if (dec > 0) fields += s""""ColumnScale": "$dec""""
      case "double" | "float" | "decimal" | "numeric" =>
        if (flen >= 0) fields += s""""ColumnPrecision": "$flen""""
        if (dec >= 0) fields += s""""ColumnScale": "$dec""""
      case _ =>
        if (flen >= 0) fields += s""""ColumnPrecision": "$flen""""
    }
    if (notNull) fields += s""""ColumnNullable": "false""""
    if (isPk) fields += s""""ColumnIsPk": "true""""
    fields.mkString("{", ", ", "}")
  }

  /** The full schema-file payload (SchemaFile, schema_file.go:170-182):
    * Table/Schema/Version(=1)/TableVersion (the DDL's finishedTs,
    * repeated in the file NAME)/Query/Type (job action code)/
    * TableColumns/TableColumnsTotal. */
  def schemaFileJson(schema: String, table: String, tableVersion: Long,
                     query: String, actionType: Int,
                     cols: Seq[String]): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"Table": "${esc(table)}", "Schema": "${esc(schema)}", "Version": 1, """ +
      s""""TableVersion": $tableVersion, "Query": "${esc(query)}", """ +
      s""""Type": $actionType, "TableColumns": [${cols.mkString(", ")}], """ +
      s""""TableColumnsTotal": ${cols.size}}"""
  }

  /** Render a schema file from the evolving registry's live shape —
    * handle-col convention: the first column is the pk/handle
    * (SchemaStore.metaAsOf). Returns (fileName, content). */
  def schemaFileFor(sch: graft.model.TableSchema, query: String,
                    actionType: Int): (String, String) = {
    val cols = sch.columns.zipWithIndex.map { case (c, i) =>
      tableColJson(c.name, c.dataType, isPk = i == 0, notNull = i == 0, c.default)
    }
    val content = schemaFileJson(sch.schema, sch.table, sch.versionTs,
      query, actionType, cols)
    (schemaFileName(sch.versionTs, content), content)
  }

  /** Write one table's schema file under `<schema>/<table>/meta/`
    * (driver-side: DDLs are control-plane-rate). Idempotent — the name
    * carries version + content checksum, so a crash-replayed batch
    * rewrites the same file. */
  def writeSchemaFile(baseDir: String, sch: graft.model.TableSchema,
                      query: String, actionType: Int): String = {
    val (name, content) = schemaFileFor(sch, query, actionType)
    val dir = java.nio.file.Paths.get(baseDir, sch.schema, sch.table, "meta")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve(name), content)
    s"${sch.schema}/${sch.table}/meta/$name"
  }

  /** Consumer half: list a table's schema files and return the parsed
    * (tableVersion, columns name→type) of the HIGHEST version — how a
    * storage consumer learns the post-DDL shape from the layout alone
    * (SchemaFile.TableInfo, schema_file.go:236-257). */
  def latestSchemaFile(baseDir: String, schema: String,
                       table: String): Option[(Long, Seq[(String, String)])] = {
    val dir = new java.io.File(s"$baseDir/$schema/$table/meta")
    val re = """schema_(\d+)_\d{10}\.json""".r
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .flatMap(f => f.getName match {
        case re(v) => Some((v.toLong, f))
        case _ => None
      })
    files.sortBy(_._1).lastOption.map { case (v, f) =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = mapper.readTree(java.nio.file.Files.readString(f.toPath))
      val cols = (0 until n.get("TableColumns").size()).map { i =>
        val c = n.get("TableColumns").get(i)
        (c.get("ColumnName").asText(), c.get("ColumnType").asText())
      }
      (v, cols)
    }
  }

  /** Executor-side variant: the distinct (schema, table) set stays
    * distributed and each partition writes its own tables' meta files
    * — the driver never materializes the table list, so table count is
    * unbounded. `baseDir` must be a shared filesystem / object store
    * (which a cloud-storage sink's target always is). */
  def writeSchemaMetaDistributed(encoded: DataFrame, baseDir: String,
                                 tableVersion: Long = 100L): Unit = {
    val payload = encoded.schema("after").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val payloadJsonCols = payload.fields.map(f =>
      s"""{"name":"${f.name}","type":"${mysqlTypeFor(f.dataType)}"}""").mkString(",\n")
    encoded.select("_schema", "_table").distinct()
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val (s, t) = (r.getString(0), r.getString(1))
          val dir = java.nio.file.Paths.get(baseDir, s, t, "meta")
          java.nio.file.Files.createDirectories(dir)
          val content =
            s"""{"schema":"$s","table":"$t","columns":[
               |$payloadJsonCols]}""".stripMargin
          java.nio.file.Files.writeString(
            dir.resolve(schemaFileName(tableVersion, content)), content)
        }
      }
  }
}
