package graft.model

import scala.collection.immutable.TreeMap

/** Multi-versioned schema store (SURVEY §1.4; reference
  * logservice/schemastore: `GetTableInfo(tableID, ts)` returns the
  * greatest version ≤ ts — schema_store.go:50-54, multi_version.go —
  * fed by the DDL action handlers of
  * persist_storage_ddl_handlers.go:121-400).
  *
  * Immutable value: applying a DDL returns a NEW registry, so a
  * snapshot can be broadcast to executors per micro-batch while the
  * driver folds further DDLs — the barrier semantics fall out of
  * passing one snapshot per batch (see [[graft.streaming.DdlBarrier]]).
  */
/** `position` is ALTER-statement metadata ("first" | "after:<col>"),
  * consumed by the registry's insert handlers and stripped before the
  * column is stored. */
/** `charset` is the column's declared character set ("" = table/
  * server default, utf8mb4 semantics): metadata under the TiDB
  * dialect, the byte provenance under `mysql-native` (see
  * [[graft.operators.RawKvMounter.KvColumn]]). A CONVERT TO CHARACTER
  * SET rewrites it on every string column. */
final case class ColumnDef(name: String, dataType: String, default: Option[String] = None,
                           position: Option[String] = None, charset: String = "")

final case class TableSchema(
    schema: String, table: String, versionTs: Long, columns: Seq[ColumnDef],
    /** Declared PRIMARY KEY column names in index order (empty = no
      * pk). Rename/drop folds keep it in step with `columns`; the
      * mount uses it for pk-is-handle selection and sinks for row
      * identity. */
    pks: Seq[String] = Nil) {
  def key: (String, String) = (schema, table)
}

/** DDL actions — the subset of the reference's 30+ handlers that
  * changes row shape or table identity
  * (persist_storage_ddl_handlers.go: CreateTable :139, AddColumn
  * :157, DropColumn, ModifyColumn — the Modify/ChangeColumn job
  * class, TruncateTable :211, RenameTable :238, RenameTables :391,
  * DropTable :148, partition handlers :292-:382). */
sealed trait DdlAction { def ts: Long }
object DdlAction {
  final case class CreateTable(schema: String, table: String,
                               columns: Seq[ColumnDef], ts: Long,
                               /** PRIMARY KEY column names from the
                                 * statement's key clauses (the
                                 * ColumnDef list itself carries no key
                                 * info). */
                               pks: Seq[String] = Nil) extends DdlAction
  /** CREATE DATABASE/SCHEMA (CreateSchema handler :121). */
  final case class CreateSchema(schema: String, ts: Long) extends DdlAction
  /** DROP DATABASE/SCHEMA: every table of the schema drops with it. */
  final case class DropSchema(schema: String, ts: Long) extends DdlAction
  final case class AddColumn(schema: String, table: String,
                             column: ColumnDef, ts: Long) extends DdlAction
  final case class DropColumn(schema: String, table: String,
                              name: String, ts: Long) extends DdlAction
  /** ALTER TABLE .. MODIFY COLUMN: retype (and/or re-default) a column
    * in place, position preserved — the most common real-world ALTER
    * after ADD COLUMN. */
  final case class ModifyColumn(schema: String, table: String,
                                column: ColumnDef, ts: Long) extends DdlAction
  /** ALTER TABLE .. CHANGE COLUMN old new type: rename + retype in
    * place. */
  final case class ChangeColumn(schema: String, table: String,
                                oldName: String, column: ColumnDef, ts: Long) extends DdlAction
  /** MySQL-8 ALTER TABLE .. RENAME COLUMN old TO new: rename ONLY —
    * type, default, and position stay (the reference's binlog filter
    * classifies it as its own event class, binlog-filter/filter.go:88). */
  final case class RenameColumn(schema: String, table: String,
                                oldName: String, newName: String, ts: Long) extends DdlAction
  final case class RenameTable(schema: String, table: String,
                               newSchema: String, newTable: String, ts: Long) extends DdlAction
  /** Multi-table RENAME TABLE a TO b, c TO d — one atomic job in the
    * reference (RenameTables :391); applied in statement order. */
  final case class RenameTables(renames: Seq[RenameTable], ts: Long) extends DdlAction
  final case class TruncateTable(schema: String, table: String, ts: Long) extends DdlAction
  final case class DropTable(schema: String, table: String, ts: Long) extends DdlAction
  /** Partition DDLs (:292 Add/Drop, :319 Truncate): row shape is
    * unchanged but the physical span set isn't — a new schema version
    * marks the boundary so scans/sinks re-plan at the right ts, the
    * role the reference's table-trigger event plays. */
  final case class AddTablePartition(schema: String, table: String, ts: Long) extends DdlAction
  final case class DropTablePartition(schema: String, table: String,
                                      partitions: Seq[String], ts: Long) extends DdlAction
  final case class TruncateTablePartition(schema: String, table: String,
                                          partitions: Seq[String], ts: Long) extends DdlAction
  /** EXCHANGE PARTITION (persist_storage_ddl_handlers.go:382): the
    * partitioned table's partition and a standalone table swap
    * physical identity — logically, rows of each name decode with the
    * OTHER's schema from `ts` on. */
  final case class ExchangeTablePartition(schema: String, table: String,
                                          withSchema: String, withTable: String,
                                          ts: Long) extends DdlAction
  /** RECOVER TABLE / FLASHBACK TABLE (ActionRecoverTable, handler
    * persist_storage_ddl_handlers.go:337 = the CreateTable build path;
    * multi_version.go:209-211 resets the store's deleteVersion): a
    * dropped table re-enters the feed with its pre-drop shape from
    * `ts` on. */
  final case class RecoverTable(schema: String, table: String, ts: Long) extends DdlAction
  /** One batch job carrying several independent actions (CREATE
    * TABLES, ActionCreateTables — handler :400 iterates the job's
    * table infos): applied in order under the one finishedTs. */
  final case class BatchActions(actions: Seq[DdlAction], ts: Long) extends DdlAction
  /** One multi-clause ALTER TABLE (ActionMultiSchemaChange, handler
    * :409 iterates the sub-jobs): every clause applies atomically in
    * statement order under the one job's finishedTs. */
  final case class AlterMulti(schema: String, table: String,
                              actions: Seq[DdlAction], ts: Long) extends DdlAction
  /** Partition-set rewrites that keep the logical table: REORGANIZE
    * PARTITION (handler :418). Row shape unchanged; the physical-id
    * membership change lives in [[graft.model.SchemaStore]] membership. */
  final case class ReorganizePartition(schema: String, table: String, ts: Long) extends DdlAction
  /** ALTER TABLE .. PARTITION BY / REMOVE PARTITIONING (handlers :445,
    * :454): the table gets a NEW physical identity (like truncate);
    * logically a version bump here, id membership in the id store. */
  final case class AlterTablePartitioning(schema: String, table: String, ts: Long) extends DdlAction
  final case class RemovePartitioning(schema: String, table: String, ts: Long) extends DdlAction
  /** ALTER TABLE .. ALTER [COLUMN] c SET DEFAULT v / DROP DEFAULT
    * (ActionSetDefaultValue, code 15): the reference stores a NEW
    * TableInfo version for it (updateFullTableInfoForSingleTableDDL,
    * persist_storage_ddl_handlers.go:247-318) — the default text
    * changes what later rows missing the cell decode to. */
  final case class SetDefault(schema: String, table: String, column: String,
                              default: Option[String], ts: Long) extends DdlAction
  /** ALTER TABLE .. CONVERT TO CHARACTER SET cs (ActionModifyTable/
    * ColumnCharsetAndCollate, codes 22/26): a new TableInfo version
    * whose string columns carry the new charset — under the
    * `mysql-native` dialect this changes how subsequent rows
    * TRANSCODE, and what content-compatible canal renders as
    * mysqlType. */
  final case class ConvertCharset(schema: String, table: String,
                                  charset: String, ts: Long) extends DdlAction
}

/** `tombstones` is the drop/recover event log per table (ts → true =
  * dropped, false = recovered) — the deleteVersion mechanism of the
  * reference's versioned store (multi_version.go:216 sets it on
  * delete, :209-211 resets it on RecoverTable). Version chains SURVIVE
  * a drop so as-of reads below the drop still answer and a RECOVER can
  * resurrect the pre-drop shape; `asOf`/`latest` answer None while the
  * table is in a dropped window. */
final case class SchemaRegistry(
    versions: Map[(String, String), TreeMap[Long, TableSchema]] = Map.empty,
    tombstones: Map[(String, String), TreeMap[Long, Boolean]] = Map.empty) {
  import DdlAction._

  private def put(ts: TableSchema): SchemaRegistry = {
    val tm = versions.getOrElse(ts.key, TreeMap.empty[Long, TableSchema])
    copy(versions = versions.updated(ts.key, tm.updated(ts.versionTs, ts)))
  }

  private def mark(key: (String, String), ts: Long, dropped: Boolean): SchemaRegistry = {
    val tm = tombstones.getOrElse(key, TreeMap.empty[Long, Boolean])
    copy(tombstones = tombstones.updated(key, tm.updated(ts, dropped)))
  }

  /** Is the table inside a dropped window at `ts`? (Most recent
    * drop/recover event ≤ ts is a drop.) */
  def droppedAt(schema: String, table: String, ts: Long): Boolean =
    tombstones.get((schema, table))
      .flatMap(_.rangeTo(ts).lastOption).exists(_._2)

  private def droppedNow(key: (String, String)): Boolean =
    tombstones.get(key).flatMap(_.lastOption).exists(_._2)

  /** Greatest version ≤ ts, or None (table unknown — or dropped — at
    * that time). */
  def asOf(schema: String, table: String, ts: Long): Option[TableSchema] =
    if (droppedAt(schema, table, ts)) None
    else versions.get((schema, table)).flatMap(_.rangeTo(ts).lastOption.map(_._2))

  def latest(schema: String, table: String): Option[TableSchema] =
    if (droppedNow((schema, table))) None
    else versions.get((schema, table)).flatMap(_.lastOption.map(_._2))

  /** The census of tables alive NOW — dropped-window tables excluded
    * (bootstrap census, route-conflict validation read this, not the
    * raw chain keyspace which keeps dropped history for as-of reads). */
  def liveTables: Seq[(String, String)] =
    versions.keys.filterNot(droppedNow).toSeq

  /** Place `c` into `cols` honoring its position metadata (FIRST /
    * AFTER x — mysql ALTER placement); the stored ColumnDef is
    * stripped of the statement-level position. */
  private def placed(cols: Seq[ColumnDef], c: ColumnDef): Seq[ColumnDef] = {
    val stored = c.copy(position = None)
    c.position match {
      case Some("first") => stored +: cols
      case Some(p) if p.startsWith("after:") =>
        val i = cols.indexWhere(_.name == p.stripPrefix("after:"))
        if (i < 0) cols :+ stored
        else (cols.take(i + 1) :+ stored) ++ cols.drop(i + 1)
      case _ => cols :+ stored
    }
  }

  /** Apply one DDL — returns the evolved registry (pure). Unknown
    * tables are created implicitly by AddColumn-class DDLs only via
    * CreateTable, matching the reference's strictness. */
  def apply(ddl: DdlAction): SchemaRegistry = ddl match {
    case CreateTable(s, t, cols, ts, pks) =>
      // re-creating a name that sits in a dropped window revives it
      // (drop + create is a fresh table under the same name)
      val created = put(TableSchema(s, t, ts, cols,
        pks.filter(p => cols.exists(_.name == p))))
      if (droppedNow((s, t))) created.mark((s, t), ts, dropped = false) else created
    case CreateSchema(_, _) => this // no table shape yet; tracked by key space
    case DropSchema(s, ts) =>
      versions.keys.filter(_._1 == s).foldLeft(this)((r, k) =>
        if (r.droppedNow(k)) r else r.mark(k, ts, dropped = true))
    case AddColumn(s, t, c, ts) =>
      latest(s, t).map(cur =>
        put(cur.copy(versionTs = ts, columns = placed(cur.columns, c))))
        .getOrElse(this)
    case DropColumn(s, t, n, ts) =>
      latest(s, t).map(cur =>
        put(cur.copy(versionTs = ts, columns = cur.columns.filterNot(_.name == n),
          pks = cur.pks.filterNot(_ == n))))
        .getOrElse(this)
    case ModifyColumn(s, t, c, ts) =>
      // retype in place (relocating when the statement carries a
      // FIRST/AFTER placement); unknown column → version bump only
      // (the job already committed upstream)
      latest(s, t).map { cur =>
        val retyped = cur.columns.map(old =>
          if (old.name == c.name) c.copy(position = None) else old)
        val cols =
          if (c.position.isDefined && cur.columns.exists(_.name == c.name))
            placed(retyped.filterNot(_.name == c.name), c)
          else retyped
        put(cur.copy(versionTs = ts, columns = cols))
      }.getOrElse(this)
    case ChangeColumn(s, t, oldName, c, ts) =>
      latest(s, t).map(cur => put(cur.copy(versionTs = ts,
        columns = cur.columns.map(old => if (old.name == oldName) c else old),
        pks = cur.pks.map(p => if (p == oldName) c.name else p))))
        .getOrElse(this)
    case RenameColumn(s, t, oldName, newName, ts) =>
      latest(s, t).map(cur => put(cur.copy(versionTs = ts,
        columns = cur.columns.map(old =>
          if (old.name == oldName) old.copy(name = newName) else old),
        pks = cur.pks.map(p => if (p == oldName) newName else p))))
        .getOrElse(this)
    case RenameTables(renames, _) =>
      renames.foldLeft(this)(_.apply(_))
    case RenameTable(s, t, ns, nt, ts) =>
      latest(s, t).map { cur =>
        // new identity continues the version chain under the new key;
        // the old chain stays queryable for as-of reads below ts
        // (reference keeps physical-id continuity, row_change.go:29-38)
        put(cur.copy(schema = ns, table = nt, versionTs = ts))
      }.getOrElse(this)
    case TruncateTable(s, t, ts) =>
      latest(s, t).map(cur => put(cur.copy(versionTs = ts))).getOrElse(this)
    case AddTablePartition(s, t, ts) =>
      latest(s, t).map(cur => put(cur.copy(versionTs = ts))).getOrElse(this)
    case DropTablePartition(s, t, _, ts) =>
      latest(s, t).map(cur => put(cur.copy(versionTs = ts))).getOrElse(this)
    case TruncateTablePartition(s, t, _, ts) =>
      latest(s, t).map(cur => put(cur.copy(versionTs = ts))).getOrElse(this)
    case DropTable(s, t, ts) =>
      // tombstone, not erase: the chain keeps answering as-of reads
      // below the drop, and RECOVER TABLE can resurrect it
      if (versions.contains((s, t))) mark((s, t), ts, dropped = true) else this
    case RecoverTable(s, t, ts) =>
      // handler :337 re-ADDS via the CreateTable path with the job's
      // snapshot = the pre-drop shape; multi_version.go:209 clears the
      // delete version. No pre-drop chain → nothing to recover (TiDB
      // itself can only recover within the GC lifetime).
      versions.get((s, t)).flatMap(_.lastOption.map(_._2)) match {
        case Some(pre) if droppedNow((s, t)) =>
          put(pre.copy(versionTs = ts)).mark((s, t), ts, dropped = false)
        case _ => this
      }
    case AlterMulti(_, _, actions, _) =>
      // handler :409: iterate the wrapped sub-jobs in statement order
      actions.foldLeft(this)(_.apply(_))
    case BatchActions(actions, _) =>
      actions.foldLeft(this)(_.apply(_))
    case ReorganizePartition(s, t, ts) =>
      latest(s, t).map(cur => put(cur.copy(versionTs = ts))).getOrElse(this)
    case AlterTablePartitioning(s, t, ts) =>
      latest(s, t).map(cur => put(cur.copy(versionTs = ts))).getOrElse(this)
    case RemovePartitioning(s, t, ts) =>
      latest(s, t).map(cur => put(cur.copy(versionTs = ts))).getOrElse(this)
    case ExchangeTablePartition(s, t, ws, wt, ts) =>
      (latest(s, t), latest(ws, wt)) match {
        case (Some(a), Some(b)) =>
          put(a.copy(versionTs = ts, columns = b.columns))
            .put(b.copy(versionTs = ts, columns = a.columns))
        case _ => this // both sides must exist, like the reference's handler
      }
    case SetDefault(s, t, c, d, ts) =>
      // TableInfo-version-only action: a new version whose named
      // column carries the new default text (handler :247-318)
      latest(s, t).map(cur => put(cur.copy(versionTs = ts,
        columns = cur.columns.map(old =>
          if (old.name == c) old.copy(default = d) else old))))
        .getOrElse(this)
    case ConvertCharset(s, t, cs, ts) =>
      // CONVERT rewrites every string column's charset (numeric and
      // blob-class columns have none); a new version marks the
      // transcode boundary for dialect-gated decodes
      def stringClass(dt: String): Boolean = {
        val b = dt.takeWhile(_ != '(').trim.toLowerCase
        Set("char", "varchar", "text", "tinytext", "mediumtext",
          "longtext", "enum", "set").contains(b)
      }
      latest(s, t).map(cur => put(cur.copy(versionTs = ts,
        columns = cur.columns.map(old =>
          if (stringClass(old.dataType)) old.copy(charset = cs) else old))))
        .getOrElse(this)
  }

  def applyAll(ddls: Seq[DdlAction]): SchemaRegistry =
    ddls.sortBy(_.ts).foldLeft(this)(_.apply(_))

  /** Schema GC — drop versions no as-of read at or above `gcTs` can
    * ever return (the reference's schemastore GC: versions below the
    * resolved gc ts are trimmed, logservice/schemastore
    * multi_version.go gc path). For each table the greatest version
    * ≤ gcTs survives as the floor snapshot (it IS the answer for any
    * read in [gcTs, nextVersion)), plus everything after; `asOf`
    * stays identical for every ts ≥ gcTs, and the per-table version
    * count is bounded by 1 + the number of post-gc DDLs — a year-long
    * feed on a DDL-heavy cluster stays flat once the checkpoint
    * advances. Reads BELOW gcTs are forfeited by contract (the
    * changefeed can never re-emit below its checkpoint). */
  def truncateBelow(gcTs: Long): SchemaRegistry = {
    def floored[V](tm: TreeMap[Long, V]): TreeMap[Long, V] =
      tm.rangeTo(gcTs).lastOption match {
        case Some((floor, _)) => tm.rangeFrom(floor)
        case None => tm
      }
    // a table dropped below the GC horizon with no later event can
    // never be read or recovered again (TiDB recover is bounded by GC
    // lifetime) — its chain and tombstones go entirely
    val dead = versions.keySet.filter { k =>
      droppedAt(k._1, k._2, gcTs) &&
        tombstones.get(k).forall(_.rangeFrom(gcTs + 1).isEmpty)
    }
    copy(
      versions = (versions -- dead).view.mapValues(floored).toMap,
      tombstones = (tombstones -- dead).view.mapValues(floored).toMap)
  }

  /** Total stored versions across tables (GC observability). */
  def versionCount: Int = versions.valuesIterator.map(_.size).sum
}
