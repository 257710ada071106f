package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util

/** Custom DataSource V2 micro-batch source: a deterministic change-log
  * generator (SURVEY §2.1 — the role of the TiKV region subscription,
  * logservice/logpuller/subscription_client.go, whose feed our
  * environment has no network to reach; also the reference's perf-rig
  * generator, downstream_performance_test.go:33-37 "1000 dispatchers ×
  * 40 events").
  *
  * Offsets are row indices into an infinite deterministic event
  * sequence: exactly-once replay is a pure function of the offset
  * range, so checkpoint recovery needs no source-side state. Each
  * batch splits into `numPartitions` row-range slices, generated
  * computationally in the executors — the source scales to any
  * cluster size with zero I/O.
  *
  * Options: `tables` (fan-out), `rowsPerBatch`, `totalRows`,
  * `numPartitions`.
  *
  * Usage: `spark.readStream.format("graft.sources.ChangelogGenSource")
  * .option(...).load()`.
  */
class ChangelogGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangelogGen.schemaFor(options)
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChangelogGenTable(new CaseInsensitiveStringMap(properties))
}

object ChangelogGen {
  val schema: StructType = StructType(Seq(
    StructField("_row_id", LongType, nullable = false),
    StructField("_schema", StringType, nullable = false),
    StructField("_table", StringType, nullable = false),
    StructField("_op", StringType, nullable = false),
    StructField("_commit_ts", LongType, nullable = false),
    StructField("_start_ts", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("k", LongType, nullable = false)))

  val baseTs = 1704067200000000000L // 2024-01-01 in ns

  /** RawKVEntry shape (pkg/common/kv_entry.go:53-70) for
    * `option("rawKv", true)`: the source emits REAL TiKV bytes —
    * record keys and row-format-v2 values — so the subscription →
    * mount path is byte-level end to end. */
  val rawSchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = false),
    StructField("value", BinaryType),
    StructField("old_value", BinaryType),
    StructField("op_type", StringType, nullable = false),
    StructField("start_ts", LongType, nullable = false),
    StructField("commit_ts", LongType, nullable = false)))

  /** Schema per source mode: `rawKvUncommitted=true` emits the 2PC
    * prewrite/commit/rollback frame the txn matcher consumes;
    * `rawKv=true` the pre-paired committed RawKVEntry frame; default
    * the typed change-row frame. */
  def schemaFor(options: CaseInsensitiveStringMap): StructType =
    if (options.getBoolean("rawKvUncommitted", false))
      graft.streaming.TxnMatcher.uncommittedSchema
    else if (options.getBoolean("rawKv", false)) rawSchema
    else schema

  def modeFor(options: CaseInsensitiveStringMap): String =
    if (options.getBoolean("rawKvUncommitted", false)) "rawKvUncommitted"
    else if (options.getBoolean("rawKv", false)) "rawKv"
    else "typed"

  /** Physical table ID for generated table t_i. */
  def tableIdOf(tbl: Long): Long = 100L + tbl

  /** KV column ids of the generated payload (user_id = handle, in the
    * key; value/k in the row value). */
  final val ValueColId = 2L
  final val KColId = 3L

  private def imageBytes(value: Double, k: Long): Array[Byte] =
    graft.model.TiKvCodec.encodeV2(Seq(
      ValueColId -> Some(graft.model.TiKvCodec.encodeFloat(value)),
      KColId -> Some(graft.model.TiKvCodec.intCell(k))))

  /** Deterministic event i as raw TiKV bytes — the SAME logical event
    * [[row]] yields, so a mount of the raw stream must reproduce the
    * typed stream (update pre-image = value-1.0 / k-1, the
    * OperatorSpec fixture convention). */
  def rawRow(i: Long, tables: Int): InternalRow = {
    import graft.model.TiKvCodec
    val h = i * 6364136223846793005L + 1442695040888963407L
    val tbl = math.floorMod(h >>> 17, tables.toLong)
    val op = math.floorMod(h >>> 33, 10L) match {
      case 0 => "D"; case 1 | 2 | 3 => "I"; case _ => "U"
    }
    val commit = baseTs + i * 1000000L
    val start = commit - 1000L - math.floorMod(h, 997L)
    val userId = math.floorMod(h >>> 7, 100000L)
    val value = math.floorMod(h >>> 11, 1000000L) / 100.0
    val k = math.floorMod(h >>> 23, 1000000L)
    val key = TiKvCodec.encodeRecordKey(tableIdOf(tbl), TiKvCodec.IntHandle(userId))
    val (valBytes, oldBytes, opType) = op match {
      case "I" => (imageBytes(value, k), null, "put")
      case "U" => (imageBytes(value, k), imageBytes(value - 1.0, k - 1L), "put")
      case _ => (null, imageBytes(value, k), "delete")
    }
    InternalRow(key, valBytes, oldBytes, UTF8String.fromString(opType), start, commit)
  }

  /** Commit entries trail their prewrites by this many events — so a
    * prewrite and its commit routinely land in DIFFERENT micro-batches
    * (and, via the mod-N wrap, the first `EntryLag` commit slots
    * arrive BEFORE their prewrites: the cached-commit path,
    * region_event_handler.go cacheCommitRow). */
  final val EntryLag = 100L

  /** Txn outcome class of event i: ~1/23 roll back, ~1/31 of the rest
    * stay orphaned (their second slot is a fake heartbeat prewrite
    * with empty value instead of a commit), everything else commits. */
  def txnClassOf(i: Long): String =
    if (i % 23L == 0L) "rollback"
    else if (i % 31L == 0L) "orphan"
    else "commit"

  /** Uncommitted (2PC) entry at stream index j over `totalEntries` =
    * 2N slots: even slots carry event (j/2)'s PREWRITE (real row
    * bytes, commit_ts 0); odd slot m carries the second-phase entry of
    * event (m - EntryLag) mod N — its COMMIT (no value), its ROLLBACK,
    * or (orphan class) a fake heartbeat prewrite. The matched stream
    * must therefore reproduce exactly the committed-class subset of
    * [[rawRow]]'s output. */
  def uncommittedRow(j: Long, totalEntries: Long, tables: Int): InternalRow = {
    import graft.model.TiKvCodec
    val n = math.max(1L, totalEntries / 2L)
    def fields(i: Long) = {
      val h = i * 6364136223846793005L + 1442695040888963407L
      val tbl = math.floorMod(h >>> 17, tables.toLong)
      val op = math.floorMod(h >>> 33, 10L) match {
        case 0 => "D"; case 1 | 2 | 3 => "I"; case _ => "U"
      }
      val commit = baseTs + i * 1000000L
      val start = commit - 1000L - math.floorMod(h, 997L)
      val userId = math.floorMod(h >>> 7, 100000L)
      val value = math.floorMod(h >>> 11, 1000000L) / 100.0
      val k = math.floorMod(h >>> 23, 1000000L)
      val key = TiKvCodec.encodeRecordKey(tableIdOf(tbl), TiKvCodec.IntHandle(userId))
      (key, op, start, commit, value, k)
    }
    if (j % 2L == 0L) {
      val i = j / 2L
      val (key, op, start, _, value, k) = fields(i)
      val (valBytes, oldBytes, opType) = op match {
        case "I" => (imageBytes(value, k), null, "put")
        case "U" => (imageBytes(value, k), imageBytes(value - 1.0, k - 1L), "put")
        case _ => (null, imageBytes(value, k), "delete")
      }
      InternalRow(key, valBytes, oldBytes, UTF8String.fromString(opType),
        UTF8String.fromString("prewrite"), start, 0L, 0L)
    } else {
      val m = (j - 1L) / 2L
      val i = math.floorMod(m - EntryLag, n)
      val (key, op, start, commit, _, _) = fields(i)
      val opType = if (op == "D") "delete" else "put"
      txnClassOf(i) match {
        case "rollback" =>
          InternalRow(key, null, null, UTF8String.fromString(opType),
            UTF8String.fromString("rollback"), start, 0L, 0L)
        case "orphan" => // heartbeat: fake prewrite, EMPTY value
          InternalRow(key, Array.emptyByteArray, null,
            UTF8String.fromString(opType),
            UTF8String.fromString("prewrite"), start, 0L, 0L)
        case _ =>
          InternalRow(key, null, null, UTF8String.fromString(opType),
            UTF8String.fromString("commit"), start, commit, 0L)
      }
    }
  }

  /** Deterministic event i — a cheap LCG drives the payload. */
  def row(i: Long, tables: Int): InternalRow = {
    val h = i * 6364136223846793005L + 1442695040888963407L
    val tbl = math.floorMod(h >>> 17, tables.toLong)
    val op = math.floorMod(h >>> 33, 10L) match {
      case 0 => "D"; case 1 | 2 | 3 => "I"; case _ => "U"
    }
    val commit = baseTs + i * 1000000L
    InternalRow(
      i,
      UTF8String.fromString("app"),
      UTF8String.fromString(s"t_$tbl"),
      UTF8String.fromString(op),
      commit,
      commit - 1000L - math.floorMod(h, 997L),
      math.floorMod(h >>> 7, 100000L),
      math.floorMod(h >>> 11, 1000000L) / 100.0,
      math.floorMod(h >>> 23, 1000000L))
  }
}

class ChangelogGenTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_changelog_gen"
  override def schema(): StructType = ChangelogGen.schemaFor(options)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new ChangelogGenScan(options)
}

class ChangelogGenScan(options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = ChangelogGen.schemaFor(options)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChangelogGenStream(
      tables = options.getInt("tables", 4),
      rowsPerBatch = options.getLong("rowsPerBatch", 10000L),
      totalRows = options.getLong("totalRows", 100000L),
      numPartitions = options.getInt("numPartitions", 8),
      mode = ChangelogGen.modeFor(options))
}

case class RowOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

class ChangelogGenStream(tables: Int, rowsPerBatch: Long, totalRows: Long,
                         numPartitions: Int, mode: String = "typed")
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = RowOffset(0L)
  override def deserializeOffset(json: String): Offset = RowOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  // scan-window batch sizing (SURVEY §2.3 adaptive scan window): each
  // trigger admits at most rowsPerBatch rows past the last committed
  // offset — the admission-control API, so AvailableNow still drains
  // to the prepared end across multiple batches.
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def reportLatestOffset(): Offset = RowOffset(totalRows)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val lo = start.asInstanceOf[RowOffset].index
    RowOffset(math.min(totalRows, lo + rowsPerBatch))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[RowOffset].index
    val hi = end.asInstanceOf[RowOffset].index
    val n = math.max(1, numPartitions)
    val step = math.max(1L, (hi - lo + n - 1) / n)
    (lo until hi by step).map { s =>
      ChangelogRange(s, math.min(s + step, hi), tables, mode, totalRows): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[ChangelogRange]
      new PartitionReader[InternalRow] {
        private var i = p.lo - 1
        override def next(): Boolean = { i += 1; i < p.hi }
        override def get(): InternalRow = p.mode match {
          case "rawKvUncommitted" => ChangelogGen.uncommittedRow(i, p.total, p.tables)
          case "rawKv" => ChangelogGen.rawRow(i, p.tables)
          case _ => ChangelogGen.row(i, p.tables)
        }
        override def close(): Unit = ()
      }
    }
}

case class ChangelogRange(lo: Long, hi: Long, tables: Int,
                          mode: String = "typed",
                          total: Long = 0L) extends InputPartition
