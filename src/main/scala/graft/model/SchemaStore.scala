package graft.model

import scala.collection.immutable.TreeMap
import graft.operators.RawKvMounter.{KvColumn, KvTableMeta}

/** The schema-store fold (reference logservice/schemastore): one
  * immutable value that folds Done DDL jobs into
  *
  *  1. the logical [[SchemaRegistry]] (names, column shapes,
  *     drop/recover tombstones),
  *  2. PHYSICAL table-id membership per logical table — which
  *     physical ids' record keys belong to the table at which ts
  *     (partitionMap/tableMap of
  *     persist_storage_ddl_handlers.go:1409-1593: truncate and
  *     ALTER PARTITION BY mint new ids, REORGANIZE swaps partition
  *     ids in place, REMOVE PARTITIONING collapses to a new plain
  *     id, EXCHANGE swaps one partition id with a standalone table),
  *  3. stable column-id assignment (TiDB allocates column ids
  *     monotonically per table and never reuses them — the property
  *     that makes id-keyed decode version-safe across ADD/DROP).
  *
  * From these it emits the versioned [[KvTableMeta]] timelines the
  * byte mounter decodes against ([[physicalPlan]]) — the
  * `GetTableInfo(tableID, ts)` surface (schema_store.go:50-54) in
  * precomputed form, so executors do a pure binary search per entry.
  *
  * Immutable: applying a job returns a new store, so one snapshot per
  * micro-batch broadcasts cleanly while the driver folds further DDLs
  * (the same pattern as [[SchemaRegistry]] / DdlBarrier).
  */
final case class SchemaStore(
    registry: SchemaRegistry = SchemaRegistry(),
    /** (schema, table) → ts → (logicalId, physical partition ids).
      * Plain tables carry an empty partition set: their one physical
      * id IS the logical id. A drop writes an entry with logicalId 0
      * and no ids (nothing mounts in the window). */
    membership: Map[(String, String), TreeMap[Long, (Long, Set[Long])]] = Map.empty,
    /** (schema, table) → column name → stable column id. */
    colIds: Map[(String, String), Map[String, Long]] = Map.empty,
    /** (schema, table) → next column id to allocate. */
    nextColId: Map[(String, String), Long] = Map.empty) {

  import DdlAction._

  private def key(s: String, t: String) = (s, t)

  private def putMember(k: (String, String), ts: Long,
                        ids: (Long, Set[Long])): SchemaStore = {
    val tm = membership.getOrElse(k, TreeMap.empty[Long, (Long, Set[Long])])
    copy(membership = membership.updated(k, tm.updated(ts, ids)))
  }

  /** The table's (logicalId, partitionIds) as of ts, if it is mounted
    * at that time. */
  def idsAsOf(schema: String, table: String, ts: Long): Option[(Long, Set[Long])] =
    membership.get((schema, table)).flatMap(_.rangeTo(ts).lastOption.map(_._2))
      .filter(_._1 != 0L)

  /** All physical ids whose record keys decode as (schema, table) at
    * ts — the partitioned set, or the logical id itself for a plain
    * table. */
  def physicalIdsAsOf(schema: String, table: String, ts: Long): Set[Long] =
    idsAsOf(schema, table, ts) match {
      case Some((lid, parts)) => if (parts.nonEmpty) parts else Set(lid)
      case None => Set.empty
    }

  // ---- the fold ----

  /** Fold one Done job: registry action (from the job's code/query)
    * plus the physical-id membership the job's TableInfo snapshot
    * carries. Jobs that don't classify still update membership when
    * they mint ids (truncate etc. always classify). */
  def applyJob(job: DdlJobParser.DdlJob): SchemaStore = {
    val action = DdlJobParser.toAction(job)
    val ts = job.finishedTs
    val lid = if (job.tableInfoId != 0L) job.tableInfoId else job.tableId
    val parts = job.partitionIds.toSet
    val k = key(job.schemaName, job.tableName)
    val withReg = action.map(applyAction).getOrElse(this)

    import DdlJobParser._
    job.actionType match {
      case ActionCreateTable | ActionRecoverTable =>
        // text-only jobs (applyJobs over a DDL stream without wire ids)
        // carry lid 0 — writing (0, ∅) here would be the DROP sentinel,
        // darkening the table forever. Leave membership absent instead:
        // the table simply has no physical ids to mount yet.
        if (lid == 0L) withReg else withReg.putMember(k, ts, (lid, parts))
      case ActionCreateTables =>
        // one membership entry per created table, keyed by the job's
        // MultipleTableInfos names (handler :400's iteration)
        job.tableInfos.foldLeft(withReg) { case (st, (tid, name, ps)) =>
          if (tid == 0L || name.isEmpty) st
          else st.putMember(key(job.schemaName, name), ts, (tid, ps.toSet))
        }
      case ActionTruncateTable | ActionAlterTablePartitioning =>
        // new logical id + fresh partition set (handlers :211, :445)
        withReg.putMember(k, ts, (lid, parts))
      case ActionRemovePartitioning =>
        // new plain-table id, no partitions (handler :454)
        withReg.putMember(k, ts, (lid, Set.empty))
      case ActionAddTablePartition | ActionDropTablePartition |
           ActionTruncateTablePartition | ActionReorganizePartition =>
        // same logical id; membership = getAllPartitionIDs(TableInfo)
        // wholesale (handler :1550: dropped ids removed, created added)
        val logical = withReg.membership.get(k).flatMap(_.lastOption)
          .map(_._2._1).filter(_ != 0L).getOrElse(lid)
        withReg.putMember(k, ts, (logical, parts))
      case ActionExchangeTablePartition =>
        // TableInfo reflects the partitioned side POST-exchange; the
        // standalone table (named in the query) takes the one id that
        // left the partitioned set (handler :382)
        val prior = withReg.membership.get(k).flatMap(_.lastOption.map(_._2))
        val standalone = action.collect {
          case ExchangeTablePartition(_, _, ws, wt, _) => (ws, wt)
        }
        val swappedOut = prior.map(_._2.diff(parts)).getOrElse(Set.empty)
        val logical = prior.map(_._1).filter(_ != 0L).getOrElse(lid)
        val s1 = withReg.putMember(k, ts, (logical, parts))
        (standalone, swappedOut.toSeq) match {
          case (Some((ws, wt)), Seq(outId)) =>
            s1.putMember(key(ws, wt), ts, (outId, Set.empty))
          case _ => s1
        }
      case ActionDropTable =>
        withReg.putMember(k, ts, (0L, Set.empty))
      case ActionRenameTable | ActionRenameTables =>
        // membership (and colIds, handled in applyAction) follow the
        // rename: continue each renamed chain under its new key
        action.toSeq.flatMap {
          case RenameTable(s, t, ns, nt, _) => Seq((s, t) -> (ns, nt))
          case RenameTables(rs, _) =>
            rs.map(r => (r.schema, r.table) -> (r.newSchema, r.newTable))
          case _ => Nil
        }.foldLeft(withReg) { case (st, (from, to)) =>
          st.membership.get(from).flatMap(_.lastOption.map(_._2)) match {
            case Some(cur) => st.putMember(to, ts, cur)
              .putMember(from, ts, (0L, Set.empty))
            case None => st
          }
        }
      case _ => withReg
    }
  }

  /** Fold one logical action: registry + column-id assignment. Use
    * [[applyJob]] when the job wire form (and so physical ids) is
    * available; this entry point serves text-only DDL streams. */
  def applyAction(a: DdlAction): SchemaStore = {
    val reg = registry.apply(a)
    val st = copy(registry = reg)
    a match {
      case CreateTable(s, t, cols, _, _) =>
        val k = key(s, t)
        val assigned = cols.zipWithIndex.map { case (c, i) => c.name -> (i + 1L) }.toMap
        st.copy(colIds = colIds.updated(k, assigned),
          nextColId = nextColId.updated(k, cols.size + 1L))
      case AddColumn(s, t, c, _) if registry.latest(s, t).isDefined =>
        val k = key(s, t)
        val next = nextColId.getOrElse(k, 1L)
        st.copy(
          colIds = colIds.updated(k, colIds.getOrElse(k, Map.empty).updated(c.name, next)),
          nextColId = nextColId.updated(k, next + 1L))
      case DropColumn(s, t, n, _) =>
        val k = key(s, t)
        st.copy(colIds = colIds.updated(k, colIds.getOrElse(k, Map.empty) - n))
      case ChangeColumn(s, t, oldName, c, _) =>
        val k = key(s, t)
        val m = colIds.getOrElse(k, Map.empty)
        m.get(oldName) match {
          case Some(id) => st.copy(colIds =
            colIds.updated(k, (m - oldName).updated(c.name, id)))
          case None => st
        }
      case RenameColumn(s, t, oldName, newName, _) =>
        val k = key(s, t)
        val m = colIds.getOrElse(k, Map.empty)
        m.get(oldName) match {
          case Some(id) => st.copy(colIds =
            colIds.updated(k, (m - oldName).updated(newName, id)))
          case None => st
        }
      case RenameTable(s, t, ns, nt, _) =>
        val from = key(s, t); val to = key(ns, nt)
        st.copy(
          colIds = (colIds - from).updated(to, colIds.getOrElse(from, Map.empty)),
          nextColId = (nextColId - from).updated(to, nextColId.getOrElse(from, 1L)))
      case RenameTables(rs, _) =>
        rs.foldLeft(this) { (acc, r) => acc.applyAction(r) }
      case AlterMulti(_, _, actions, _) =>
        actions.foldLeft(this)(_.applyAction(_))
      case BatchActions(actions, _) =>
        actions.foldLeft(this)(_.applyAction(_))
      case ExchangeTablePartition(s, t, ws, wt, _) =>
        // column shapes swap (registry handles that); ids swap with them
        val a0 = key(s, t); val b0 = key(ws, wt)
        st.copy(
          colIds = colIds
            .updated(a0, colIds.getOrElse(b0, Map.empty))
            .updated(b0, colIds.getOrElse(a0, Map.empty)),
          nextColId = nextColId
            .updated(a0, nextColId.getOrElse(b0, 1L))
            .updated(b0, nextColId.getOrElse(a0, 1L)))
      case _ => st
    }
  }

  def applyJobs(jobs: Seq[DdlJobParser.DdlJob]): SchemaStore =
    jobs.sortBy(_.finishedTs).foldLeft(this)(_.applyJob(_))

  /** GC (the schemastore gc loop's role): registry versions AND
    * membership entries no as-of read at or above `gcTs` can return
    * are trimmed — per timeline the greatest entry ≤ gcTs survives as
    * the floor. Keeps a year-long feed's store flat once the
    * checkpoint advances; reads below gcTs are forfeited by contract. */
  def truncateBelow(gcTs: Long): SchemaStore =
    copy(
      registry = registry.truncateBelow(gcTs),
      membership = membership.view.mapValues { tm =>
        tm.rangeTo(gcTs).lastOption match {
          case Some((floor, _)) => tm.rangeFrom(floor)
          case None => tm
        }
      }.toMap)

  /** Total stored timeline entries (GC observability). */
  def versionCount: Int =
    registry.versionCount + membership.valuesIterator.map(_.size).sum

  // ---- mount-side emission ----

  /** The table's KvTableMeta as of ts (columns from the registry
    * snapshot — incl. per-column charset after a CONVERT — ids from
    * the stable assignment, physical ids from the membership
    * timeline). None while dropped/unknown. `dialect` is the feed's
    * byte provenance (see [[KvTableMeta]]): under `mysql-native` the
    * per-version column charset drives the transcode, so rows after a
    * CONVERT TO CHARACTER SET decode under the NEW charset. */
  def metaAsOf(schema: String, table: String, ts: Long,
               tz: String = "UTC", dialect: String = "tidb"): Option[KvTableMeta] =
    for {
      sch <- registry.asOf(schema, table, ts)
      (lid, parts) <- idsAsOf(schema, table, ts)
      ids = colIds.getOrElse((schema, table), Map.empty)
      if sch.columns.nonEmpty && sch.columns.forall(c => ids.contains(c.name))
    } yield KvTableMeta(lid, schema, table,
      sch.columns.map(c => KvColumn(ids(c.name), c.name, c.dataType,
        default = c.default, charset = c.charset)),
      handleCol = SchemaStore.intHandleCol(sch).getOrElse(sch.columns.head.name),
      physicalIds = parts.toSeq.sorted,
      tz = tz, dialect = dialect)

  /** Version timeline for one table: every boundary where its schema
    * OR its physical membership changes, with the meta from that ts
    * on (None segments = dropped window). Feed to
    * [[graft.operators.RawKvMounter.mountTableVersioned]] after
    * filtering the Nones, or to [[physicalPlan]] for the exact
    * windowed form. */
  def metaVersions(schema: String, table: String,
                   tz: String = "UTC", dialect: String = "tidb")
      : Seq[(Long, Option[KvTableMeta])] = {
    val k = (schema, table)
    val bounds = (
      registry.versions.getOrElse(k, TreeMap.empty[Long, TableSchema]).keysIterator ++
        registry.tombstones.getOrElse(k, TreeMap.empty[Long, Boolean]).keysIterator ++
        membership.getOrElse(k, TreeMap.empty[Long, (Long, Set[Long])]).keysIterator
      ).toSeq.distinct.sorted
    bounds.map(ts => ts -> metaAsOf(schema, table, ts, tz, dialect))
  }

  /** The executor-side decode plan: physical id → ts-ascending
    * segments of Some(meta to decode with) / None (id not mounted
    * from that ts). Built once on the driver per micro-batch, O(log
    * segments) per entry on executors.
    *
    * `keep` scopes the plan to the changefeed's table filter — the
    * reference scopes its schema view by the feed's filter rules, so
    * an unrelated table on the shared wire (different column shape,
    * excluded by the filter) never reaches the mount. */
  def physicalPlan(tz: String = "UTC",
                   keep: (String, String) => Boolean = (_, _) => true,
                   dialect: String = "tidb")
      : Map[Long, Seq[(Long, Option[KvTableMeta])]] = {
    val tables = (registry.versions.keySet ++ membership.keySet).toSeq
      .filter { case (s, t) => keep(s, t) }
    val segments = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.ArrayBuffer[(Long, Option[KvTableMeta])]]
    tables.foreach { case (s, t) =>
      val vs = metaVersions(s, t, tz, dialect)
      // every physical id this table ever claims
      val everIds = vs.flatMap(_._2).flatMap(_.allIds).distinct
      everIds.foreach { pid =>
        val buf = segments.getOrElseUpdate(pid,
          scala.collection.mutable.ArrayBuffer.empty)
        // emit TRANSITIONS only: a claim whenever this table holds the
        // id at a boundary, a release only when THIS table lets it go —
        // an unrelated table's version bump must not release someone
        // else's claim
        var held = false
        vs.foreach { case (ts, m) =>
          val holds = m.exists(_.allIds.contains(pid))
          if (holds) buf += ts -> m
          else if (held) buf += ts -> None
          held = holds
        }
      }
    }
    // one id can change hands between tables (EXCHANGE): merge each
    // id's transitions ts-ascending, a Some claim beating a None
    // release at the same ts
    segments.view.mapValues { buf =>
      buf.toSeq.groupBy(_._1).toSeq.sortBy(_._1).map { case (ts, xs) =>
        ts -> xs.collectFirst { case (_, Some(m)) => m }
      }
    }.toMap
  }
}

object SchemaStore {
  private val intBases =
    Set("tinyint", "smallint", "mediumint", "int", "integer", "bigint")

  /** TiDB pk-is-handle: a single integer-class PRIMARY KEY column
    * rides the record key, not the row image (rowcodec clustered
    * integer pk) — it is the mount's handle receiver. Composite or
    * non-integer pks keep the _tidb_rowid handle, for which the first
    * column stays the default receiver. */
  private[model] def intHandleCol(sch: TableSchema): Option[String] =
    sch.pks match {
      case Seq(p) =>
        sch.columns.find(_.name == p)
          .filter(c => intBases.contains(c.dataType.takeWhile(_ != '(').trim.toLowerCase))
          .map(_.name)
      case _ => None
    }
}
