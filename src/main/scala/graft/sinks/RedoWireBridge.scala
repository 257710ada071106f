package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.sinks.RedoWire._

/** Spark bridge over [[RedoWire]] — the two interop directions:
  *
  *  - [[statementsFromDir]]: a REAL upstream redo directory (written
  *    by the reference) → the windowed, idempotent downstream
  *    statement stream, shaped exactly like
  *    [[RedoApplier.replayStatements]] output (the applier semantics:
  *    safe-mode REPLACE/DELETE forms, key-change update split, DDLs
  *    DML-first at equal commit ts, conflict-key partition
  *    assignment — pkg/applier/redo.go:62,181-190,456-468);
  *  - [[writeDirFromEnvelope]]: an envelope frame → a redo directory
  *    in the reference's format, one log file per Spark partition
  *    (the reference writes one file per redo worker the same way).
  *
  * Per-record imperative decode is the RawKvMounter trade: the column
  * layout lives inside each record, so this is a mapPartitions over a
  * file-parallel scan — partition-parallel, no shuffle before the
  * conflict-key repartition the applier does anyway.
  */
object RedoWireBridge {

  val stmtSchema: StructType = StructType(Seq(
    StructField("_partition", LongType, nullable = false),
    StructField("_row_id", LongType, nullable = false),
    StructField("_schema", StringType, nullable = false),
    StructField("_table", StringType, nullable = false),
    StructField("_commit_ts", LongType, nullable = false),
    StructField("_start_ts", LongType, nullable = false),
    StructField("_op", StringType, nullable = false),
    StructField("_stmt", StringType, nullable = false),
    StructField("_apply_order", LongType, nullable = false)))

  private val twoTo64 = new java.math.BigDecimal("18446744073709551616")

  /** A decoded value as the SQL-literal-ready JVM value: unsigned u64
    * bit patterns surface as DECIMAL(20,0) (the mounter's own
    * convention). */
  def jvmValue(v: RedoColVal): Any = v.value match {
    case l: Long if v.unsigned && l < 0 =>
      java.math.BigDecimal.valueOf(l).add(twoTo64)
    case other => other
  }

  /** Handle-key column indices: flagged columns, else ALL columns (a
    * no-PK force-replicated table has no handle flags — whereSlice's
    * fallback). */
  private def handleIdx(vals: Seq[RedoColVal]): Seq[Int] = {
    val flagged = vals.zipWithIndex.collect { case (v, i) if v.handleKey => i }
    if (flagged.nonEmpty) flagged else vals.indices
  }

  /** Routing.stableHash's semantic in plain Scala (md5-prefix of the
    * "|"-joined key strings; null values skipped like concat_ws). */
  private def partitionOf(parts: Seq[Any], numWorkers: Int): Long = {
    val joined = parts.filter(_ != null).map(String.valueOf).mkString("|")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(joined.getBytes("UTF-8"))
    val hex = md5.map(b => f"$b%02x").mkString.take(15)
    math.floorMod(java.lang.Long.parseLong(hex, 16), numWorkers.toLong)
  }

  /** One record → its idempotent statement rows (safe-mode replay
    * forms, update split on handle-key change). */
  def statementRows(r: RedoRecord, rowId: Long, numWorkers: Int): Seq[Row] = r match {
    case DdlRecord(d) =>
      Seq(Row(-1L, rowId, d.schema, d.table, d.commitTs, d.startTs, "DDL",
        d.query, d.commitTs * 2 + 1))
    case DmlRecord(d) =>
      val names = d.cols.map(_.name)
      def keyPred(vals: Seq[RedoColVal]): String =
        handleIdx(vals).map { i =>
          val v = jvmValue(vals(i))
          if (v == null) s"`${names(i)}` IS NULL"
          else s"`${names(i)}` = ${SqlBuilder.literal(v)}"
        }.mkString(" AND ")
      def replaceStmt(vals: Seq[RedoColVal]): String =
        s"REPLACE INTO `${d.schema}`.`${d.table}` " +
          s"(${names.map(n => s"`$n`").mkString(",")}) VALUES " +
          s"(${vals.map(v => SqlBuilder.literal(jvmValue(v))).mkString(",")})"
      def deleteStmt(vals: Seq[RedoColVal]): String =
        s"DELETE FROM `${d.schema}`.`${d.table}` WHERE ${keyPred(vals)} LIMIT 1"
      def part(vals: Seq[RedoColVal]): Long =
        partitionOf(d.schema +: d.table +: handleIdx(vals).map(i => jvmValue(vals(i))),
          numWorkers)
      def row(p: Long, op: String, stmt: String) =
        Row(p, rowId, d.schema, d.table, d.commitTs, d.startTs, op, stmt,
          d.commitTs * 2)
      d.op match {
        case "I" => Seq(row(part(d.values), "I", replaceStmt(d.values)))
        case "D" => Seq(row(part(d.preValues), "D", deleteStmt(d.preValues)))
        case "U" =>
          val ki = handleIdx(d.values)
          val keyChanged = ki.exists { i =>
            val a = jvmValue(d.values(i)); val b = jvmValue(d.preValues(i))
            (a, b) match {
              case (x: Array[Byte], y: Array[Byte]) => !java.util.Arrays.equals(x, y)
              case _ => a != b
            }
          }
          if (keyChanged)
            Seq(row(part(d.preValues), "D", deleteStmt(d.preValues)),
              row(part(d.values), "I", replaceStmt(d.values)))
          else Seq(row(part(d.values), "U", replaceStmt(d.values)))
      }
  }

  /** A reference-format redo directory → the replay statement stream,
    * windowed to (checkpointTs, resolvedTs] per the metas. File-
    * parallel: each log file decodes in its own task. */
  def statementsFromDir(spark: SparkSession, dir: String,
                        changefeedId: Option[String] = None,
                        numWorkers: Int = 8): DataFrame = {
    val (ckpt, res) = RedoWire.readMetaWindow(dir)
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(LogExt) &&
        changefeedId.forall(id => changefeedMatches(f.getName, id)))
      .map(_.getPath).sorted.toSeq
    val nw = numWorkers
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { path =>
        RedoWire.readLogFile(path).iterator.zipWithIndex
          .map { case (b, i) => (RedoWire.decodeRecord(b), i.toLong) }
          .filter { case (r, _) =>
            r.commitTs > ckpt && (res == 0L || r.commitTs <= res) }
          .flatMap { case (r, i) => RedoWireBridge.statementRows(r, i, nw) }
      }
    spark.createDataFrame(rdd, stmtSchema)
  }

  /** Decoded DML records of a directory as a flat frame for
    * state/consistency checks: one row per record with the value
    * arrays positionally aligned to `colNames` (values rendered via
    * [[jvmValue]]; absent side = null array). */
  def recordsFromDir(spark: SparkSession, dir: String,
                     changefeedId: Option[String] = None)
      : (Long, Long, org.apache.spark.rdd.RDD[RedoRecord]) = {
    val (ckpt, res) = RedoWire.readMetaWindow(dir)
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(LogExt) &&
        changefeedId.forall(id => changefeedMatches(f.getName, id)))
      .map(_.getPath).sorted.toSeq
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { path =>
        RedoWire.readLogFile(path).iterator.map(RedoWire.decodeRecord)
          .filter(r => r.commitTs > ckpt && (res == 0L || r.commitTs <= res))
      }
    (ckpt, res, rdd)
  }

  /** MySQL type code + flags for a payload field — the column meta the
    * reference writes per redo column. */
  private[sinks] def colMetaFor(f: StructField, handleKeys: Seq[String])
      : (Int, Long) = {
    val base = f.dataType match {
      case LongType => 8                    // longlong
      case DoubleType | FloatType => 5      // double
      case BinaryType => 254                // string + BinaryFlag
      case d: DecimalType if d.precision == 20 && d.scale == 0 => 8 // u64
      case _: DecimalType => 246            // newdecimal
      case _ => 15                          // varchar-class
    }
    var flag = 0L
    if (handleKeys.contains(f.name)) flag |= HandleKeyFlag | PrimaryKeyFlag
    if (f.dataType == BinaryType) flag |= BinaryFlag
    f.dataType match {
      case d: DecimalType if d.precision == 20 && d.scale == 0 =>
        flag |= UnsignedFlag
      case _ => ()
    }
    (base, flag)
  }

  private[sinks] def wireValue(v: Any, unsigned: Boolean): Any = v match {
    case d: java.math.BigDecimal if unsigned =>
      // u64 back to its bit pattern (the Go side carries uint64)
      d.toBigInteger.longValue()
    case d: java.math.BigDecimal => d.toPlainString
    case other => other
  }

  /** DDL frames (_schema, _table, _commit_ts, query — the
    * [[RedoApplier.appendDdl]] shape) → the dir's `ddl` log file. DDL
    * streams are control-plane-sized, so one file suffices (the
    * reference also keeps one ddl writer per changefeed). */
  def writeDdlLog(ddls: DataFrame, dir: String,
                  captureId: String = "graft",
                  changefeedId: String = "feed",
                  compress: Boolean = false): Unit = {
    val rows = ddls.select("_schema", "_table", "_commit_ts", "query")
      .collect() // control-plane-sized by definition
    if (rows.isEmpty) return
    val recs = rows.map { r =>
      DdlRecord(RedoDdl(r.getLong(2) - 1L, r.getLong(2), r.getString(3),
        0, r.getString(0), r.getString(1)))
    }
    val maxTs = recs.map(_.commitTs).max
    val path = new java.io.File(dir, RedoWire.logFileName(captureId,
      changefeedId, "ddl", maxTs, "d000")).getPath
    RedoWire.writeLogFile(path, recs.iterator.map(RedoWire.encodeRecord),
      compress)
  }

  /** An envelope frame → a reference-format redo directory: one log
    * file per Spark partition (the per-worker files the reference
    * writes), one meta for the window. */
  def writeDirFromEnvelope(env: DataFrame, dir: String, handleKeys: Seq[String],
                           checkpointTs: Long, resolvedTs: Long,
                           captureId: String = "graft",
                           changefeedId: String = "feed",
                           compress: Boolean = false): Unit = {
    new java.io.File(dir).mkdirs()
    val payload = env.schema("after").dataType.asInstanceOf[StructType]
    val metas = payload.fields.map(f => colMetaFor(f, handleKeys)).toSeq
    val cols = payload.fields.zip(metas).map { case (f, (tpe, _)) =>
      RedoCol(f.name, tpe)
    }.toSeq
    val flags = metas.map(_._2)
    val names = payload.fields.map(_.name).toSeq
    val dirPath = dir
    val cap = captureId
    val feed = changefeedId
    val doCompress = compress
    env.select("_schema", "_table", "_op", "_commit_ts", "_start_ts",
        "before", "after")
      .foreachPartition { (it: Iterator[Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var maxTs = 0L
        val recs = it.map { r =>
          val commitTs = r.getLong(3)
          maxTs = math.max(maxTs, commitTs)
          def vals(img: Row): Seq[RedoColVal] =
            if (img == null) Nil
            else names.indices.map { i =>
              val raw = if (img.isNullAt(i)) null
              else wireValue(img.get(i), (flags(i) & UnsignedFlag) != 0)
              val isEmpty = raw match {
                case b: Array[Byte] => b.isEmpty
                case _ => false
              }
              RedoColVal(raw, isEmpty, flags(i))
            }
          val (pre, post) = (vals(r.getStruct(5)), vals(r.getStruct(6)))
          DmlRecord(RedoDml(r.getLong(4), commitTs, r.getString(0),
            r.getString(1), 0L, isPartition = false, cols,
            values = post, preValues = pre))
        }
        if (recs.hasNext) {
          // stream records to a temp name (maxTs — part of the final
          // file name — is only known at the end), then rename: the
          // partition never materializes in task memory, and the LZ4
          // export compresses inline instead of write → read → rewrite.
          // The attempt id keys the temp name so a speculative/retried
          // attempt of the same partition never interleaves frames into
          // another attempt's file; a failed write deletes its temp.
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val tmp = new java.io.File(dirPath, f".p$pid%04d-a$attempt.log.tmp")
          try {
            RedoWire.writeLogFile(tmp.getPath,
              recs.map(RedoWire.encodeRecord), doCompress)
            val path = new java.io.File(dirPath, RedoWire.logFileName(
              cap, feed, "row", maxTs, f"p$pid%04d"))
            if (!tmp.renameTo(path))
              throw new java.io.IOException(s"rename $tmp -> $path failed")
          } catch {
            case e: Throwable => tmp.delete(); throw e
          }
        }
      }
    java.nio.file.Files.write(
      new java.io.File(dir, RedoWire.metaFileName(captureId, "default",
        changefeedId, "0000")).toPath,
      RedoWire.encodeMeta(checkpointTs, resolvedTs))
  }
}
