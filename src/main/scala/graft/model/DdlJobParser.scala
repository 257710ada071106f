package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.operators.RawKvMounter
import graft.operators.RawKvMounter.{KvColumn, KvTableMeta}

/** The DDL-job WIRE path (SURVEY §2.1 "DDL job fetcher"): the
  * reference tails the `mysql.tidb_ddl_job` system table's change
  * stream, decodes each row like any other table, pulls the `job_meta`
  * column's bytes and JSON-unmarshals TiDB's `model.Job`
  * (pkg/common/event/mounter.go:175-231 ParseDDLJob/parseJob;
  * logservice/schemastore/ddl_job_fetcher.go:201-215 builds the job
  * table meta by NAME, job_meta column looked up the same way).
  *
  *  - only jobs in state Done replay (mounter.go:221 `job.IsDone()` —
  *    the normalized lifecycle note), with StartTS taken from the
  *    entry and FinishedTS from the entry's commit ts
  *    (mounter.go:225-230),
  *  - the job's ActionType code classifies the schema action; for
  *    shape-changing actions the `query` text carries the column
  *    detail, so classification delegates to [[DdlParser]] with the
  *    job's own schema as the default — the same two-level split the
  *    reference has between job fetch and the persist-storage
  *    handlers (persist_storage_ddl_handlers.go:121-400),
  *  - non-shape actions (indexes, FKs, views, locks, sequences,
  *    placement/attributes) yield no registry action, mirroring the
  *    handler table's ignores and the replication whitelist.
  *
  * Action-type codes are TiDB's frozen on-disk enum (they are
  * serialized into every job row, so they can never be renumbered);
  * codes outside the mapped set fall back to query-text parsing,
  * which also covers future additions.
  */
object DdlJobParser {

  /** metadef.TiDBDDLJobTableID — the RESERVED id of
    * `mysql.tidb_ddl_job` (MaxInt48 - 1; pkg/common/span_op.go:34-35).
    * Reserved IDs sit at the top of the 48-bit table-id space so they
    * never collide with user tables. */
  val JobTableId: Long = 281474976710654L

  /** `mysql.tidb_ddl_job`'s column layout (column IDs in creation
    * order); `job_meta` holds the marshaled model.Job. */
  val jobTableMeta: KvTableMeta = KvTableMeta(JobTableId, "mysql", "tidb_ddl_job",
    Seq(
      KvColumn(1L, "job_id", "bigint", nullable = false),
      KvColumn(2L, "reorg", "int"),
      KvColumn(3L, "schema_ids", "text"),
      KvColumn(4L, "table_ids", "text"),
      KvColumn(5L, "job_meta", "longblob"),
      KvColumn(6L, "type", "int"),
      KvColumn(7L, "processing", "int")),
    handleCol = "job_id")

  /** model.Job JobStateDone (frozen serialized enum: 4). */
  val JobStateDone = 4

  // The frozen ActionType codes this classifier maps directly. Codes
  // not listed fall back to query-text parsing.
  val ActionCreateSchema = 1
  val ActionDropSchema = 2
  val ActionCreateTable = 3
  val ActionDropTable = 4
  val ActionAddColumn = 5
  val ActionDropColumn = 6
  val ActionTruncateTable = 11
  val ActionModifyColumn = 12
  val ActionRenameTable = 14
  val ActionAddTablePartition = 19
  val ActionDropTablePartition = 20
  val ActionTruncateTablePartition = 23
  /** RECOVER/FLASHBACK TABLE: re-adds the dropped table via the
    * CreateTable handler path (persist_storage_ddl_handlers.go:337;
    * multi_version.go:209 clears the store's delete version). */
  val ActionRecoverTable = 25
  val ActionExchangeTablePartition = 42
  val ActionRenameTables = 47
  /** One CREATE TABLES batch job (BR / batch-create;
    * handler :400 iterates binlog.MultipleTableInfos). */
  val ActionCreateTables = 60
  /** Multi-clause ALTER TABLE wrapped in one job (handler :409
    * iterates the sub-jobs); the query text carries every clause. */
  val ActionMultiSchemaChange = 61
  /** Partition-set rewrite keeping the logical table id (handler
    * :418): new physical partition ids join at finishedTs, replaced
    * ones stop. */
  val ActionReorganizePartition = 64
  /** ALTER TABLE .. PARTITION BY — the table gets a NEW logical id
    * plus a fresh partition set (handler :445). */
  val ActionAlterTablePartitioning = 70
  /** ALTER TABLE .. REMOVE PARTITIONING — new plain-table id, no
    * partitions (handler :454). */
  val ActionRemovePartitioning = 71

  /** The non-shape action codes the registry ignores outright
    * (indexes/FKs/views/locks/sequences/placement — the
    * persist-storage handler table's no-ops and the replication
    * whitelist's never-replicate classes). */
  private val ignoredActions: Set[Int] = Set(
    7, 8, // add/drop index
    9, 10, // add/drop foreign key
    13, 16, 17, 18, // rebase auto-id, shard-rowid, comment, rename index
    // NOT ignored: 15 (SetDefaultValue), 22/26 (charset/collate
    // modifies) — the reference stores a NEW TableInfo version for
    // them (updateFullTableInfoForSingleTableDDL, persist_storage_
    // ddl_handlers.go:247-318); they fall through to query-text
    // parsing (SetDefault / ConvertCharset registry bumps)
    21, 24, // create/drop view
    27, 28, 29, 30, 31, // lock/unlock/repair/tiflash
    32, 33, // add/drop primary key (constraint-only here)
    34, 35, 36, // sequences
    39, 40, 41, // auto-id cache, auto-random rebase, index visibility
    43, 44, 45, // check constraints
    49, 50, 51, 52, 53, 54, 55, 56, // attributes + placement policies
    57, 58, 59, // cache table / stats options
    62, 63, // flashback cluster / recover schema — the reference itself
            // ignores both (persist_storage.go:863-864 "ignore ddl")
    65, 66, // TTL info/remove (updateSchemaMetadataIgnore in the handler table)
    67, 68, 69) // resource groups

  /** One parsed, Done-state DDL job.
    *
    * `tableId` is the job row's table_id; `tableInfoId` and
    * `partitionIds` come from the job's `binlog.TableInfo` snapshot
    * (model.HistoryInfo — Go marshals the untagged fields by name;
    * TableInfo's own fields carry json tags: `id`,
    * `partition.definitions[].id`) — the reference's handlers read
    * exactly these for physical-id membership
    * (getAllPartitionIDs, persist_storage_ddl_handlers.go:488). */
  final case class DdlJob(id: Long, actionType: Int, schemaName: String,
                          tableName: String, query: String,
                          startTs: Long, finishedTs: Long,
                          schemaVersion: Long,
                          tableId: Long = 0L,
                          tableInfoId: Long = 0L,
                          partitionIds: Seq[Long] = Nil,
                          /** binlog.MultipleTableInfos (CreateTables):
                            * (table id, table name, partition ids). */
                          tableInfos: Seq[(Long, String, Seq[Long])] = Nil)

  private def mapper = new ObjectMapper()

  /** parseJob (mounter.go:211-231): unmarshal, gate on Done, stamp
    * start/finished ts from the KV entry. */
  def parseJobBytes(jobMeta: Array[Byte], startTs: Long,
                    commitTs: Long): Option[DdlJob] = {
    val n = mapper.readTree(jobMeta)
    def str(k: String): String = Option(n.get(k)).map(_.asText("")).getOrElse("")
    def num(k: String): Long = Option(n.get(k)).map(_.asLong(0L)).getOrElse(0L)
    if (num("state").toInt != JobStateDone) None
    else {
      val binlog = Option(n.get("binlog"))
      val tableInfo = binlog.flatMap(b => Option(b.get("TableInfo")))
      Some(DdlJob(
        id = num("id"),
        actionType = num("type").toInt,
        schemaName = str("schema_name"),
        tableName = str("table_name"),
        query = str("query"),
        startTs = startTs,
        finishedTs = commitTs,
        schemaVersion =
          binlog.flatMap(b => Option(b.get("SchemaVersion"))).map(_.asLong(0L)).getOrElse(0L),
        tableId = num("table_id"),
        tableInfoId =
          tableInfo.flatMap(t => Option(t.get("id"))).map(_.asLong(0L)).getOrElse(0L),
        partitionIds = tableInfo.map(partIdsOf).getOrElse(Nil),
        tableInfos = binlog.flatMap(b => Option(b.get("MultipleTableInfos")))
          .map(arr => (0 until arr.size).map { i =>
            val t = arr.get(i)
            (Option(t.get("id")).map(_.asLong(0L)).getOrElse(0L),
              Option(t.get("name")).flatMap(nm => Option(nm.get("O")))
                .map(_.asText("")).getOrElse(""),
              partIdsOf(t))
          }.toSeq).getOrElse(Nil)))
    }
  }

  /** TableInfo's partition definition ids (getAllPartitionIDs,
    * persist_storage_ddl_handlers.go:488). */
  private def partIdsOf(tableInfo: JsonNode): Seq[Long] =
    Option(tableInfo.get("partition"))
      .flatMap(p => Option(p.get("definitions")))
      .map(ds => (0 until ds.size).flatMap(i =>
        Option(ds.get(i).get("id")).map(_.asLong(0L))).toSeq)
      .getOrElse(Nil)

  /** Classify a Done job into a registry action. Shape actions parse
    * their query text (the column detail lives there); name-only
    * actions build directly from the job fields; ignored classes and
    * unparseable text yield None. */
  def toAction(job: DdlJob): Option[DdlAction] = {
    val ts = job.finishedTs
    def textParse: Option[DdlAction] =
      DdlParser.parse(job.query, ts, defaultSchema =
        if (job.schemaName.nonEmpty) job.schemaName else "app")
    job.actionType match {
      case a if ignoredActions.contains(a) => None
      case ActionCreateSchema => Some(DdlAction.CreateSchema(job.schemaName, ts))
      case ActionDropSchema => Some(DdlAction.DropSchema(job.schemaName, ts))
      case ActionDropTable =>
        Some(DdlAction.DropTable(job.schemaName, job.tableName, ts))
      case ActionTruncateTable =>
        Some(DdlAction.TruncateTable(job.schemaName, job.tableName, ts))
      case ActionRecoverTable =>
        Some(DdlAction.RecoverTable(job.schemaName, job.tableName, ts))
      case ActionReorganizePartition =>
        Some(DdlAction.ReorganizePartition(job.schemaName, job.tableName, ts))
      case ActionAlterTablePartitioning =>
        Some(DdlAction.AlterTablePartitioning(job.schemaName, job.tableName, ts))
      case ActionRemovePartitioning =>
        Some(DdlAction.RemovePartitioning(job.schemaName, job.tableName, ts))
      case ActionCreateTables =>
        // batch create: the query is the original statements joined by
        // ';' — parse each, fold in order (handler :400 iterates the
        // job's table infos the same way)
        val creates = job.query.split(';').toSeq.map(_.trim).filter(_.nonEmpty)
          .flatMap(q => DdlParser.parse(q, ts, defaultSchema =
            if (job.schemaName.nonEmpty) job.schemaName else "app"))
        creates match {
          case Seq() => None
          case Seq(one) => Some(one)
          case many => Some(DdlAction.BatchActions(many, ts))
        }
      case ActionCreateTable | ActionAddColumn | ActionDropColumn |
           ActionModifyColumn | ActionRenameTable | ActionRenameTables |
           ActionAddTablePartition | ActionDropTablePartition |
           ActionTruncateTablePartition | ActionExchangeTablePartition |
           ActionMultiSchemaChange =>
        textParse
      case _ => textParse // future/unknown codes: the query is authoritative
    }
  }

  /** Full wire path for one raw KV entry of the job table: record-key
    * check, row decode against the job table meta, job_meta JSON
    * parse. Deletes and non-job-table keys yield None. */
  def parseRawEntry(key: Array[Byte], value: Array[Byte],
                    opType: String, startTs: Long, commitTs: Long): Option[DdlJob] = {
    if (opType == "delete" || value == null || value.isEmpty) return None
    if (key == null || key.length < 11 || key(0) != 't' ||
        key(9) != '_' || key(10) != 'r') return None
    val (tableId, _) = TiKvCodec.decodeRecordKey(key)
    if (tableId != JobTableId) return None
    // the job table row can arrive in either row format — dispatch on
    // the version byte like the mounter (codec.go:86 IsNewFormat)
    val metaBytes: Option[Array[Byte]] =
      if (TiKvCodec.isNewFormat(value)) TiKvCodec.decodeV2(value).cell(5L)
      else TiKvCodec.decodeV1(value).get(5L).collect {
        case TiKvCodec.DBytes(b) => b
      }
    metaBytes.flatMap(meta => parseJobBytes(meta, startTs, commitTs))
  }

  /** Encode a job row as raw KV bytes (test/replay tooling): the
    * job table's record key + v2 value with job_meta. */
  def encodeJobEntry(jobId: Long, jobMeta: Array[Byte],
                     actionType: Int): (Array[Byte], Array[Byte]) = {
    val key = TiKvCodec.encodeRecordKey(JobTableId, TiKvCodec.IntHandle(jobId))
    val value = RawKvMounter.encodeImage(jobTableMeta,
      Seq(jobId, 0L, "[]", "[]", jobMeta, actionType.toLong, 0L))
    (key, value)
  }
}
