package graft

import graft.model._
import graft.model.DdlAction._
import graft.model.DdlJobParser.DdlJob
import org.scalatest.funsuite.AnyFunSuite

/** The schema-store fold: logical registry + physical-id membership +
  * stable column ids, from Done DDL jobs — the
  * logservice/schemastore analog (persist_storage_ddl_handlers.go
  * updateSchemaMetadata* family; multi_version.go delete/recover). */
class SchemaStoreSpec extends AnyFunSuite {

  private def job(tpe: Int, q: String, ts: Long,
                  schema: String = "app", table: String = "t",
                  tableId: Long = 0L, infoId: Long = 0L,
                  parts: Seq[Long] = Nil): DdlJob =
    DdlJob(id = ts, actionType = tpe, schemaName = schema, tableName = table,
      query = q, startTs = ts - 1, finishedTs = ts, schemaVersion = ts,
      tableId = tableId, tableInfoId = infoId, partitionIds = parts)

  private val create = job(3, "CREATE TABLE app.t (id BIGINT, v BIGINT)",
    10L, tableId = 900L, infoId = 900L, parts = Seq(901L, 902L))

  test("REORGANIZE PARTITION: membership becomes getAllPartitionIDs(TableInfo) " +
      "wholesale — new ids join at finishedTs, replaced ids stop (handler :418, :1550)") {
    val st = SchemaStore().applyJobs(Seq(create,
      job(64, "ALTER TABLE app.t REORGANIZE PARTITION p0 INTO (PARTITION p3 VALUES LESS THAN (100))",
        100L, tableId = 900L, infoId = 900L, parts = Seq(903L, 902L))))
    assert(st.physicalIdsAsOf("app", "t", 99L) == Set(901L, 902L))
    assert(st.physicalIdsAsOf("app", "t", 100L) == Set(903L, 902L))
    assert(st.idsAsOf("app", "t", 100L).map(_._1) == Some(900L),
      "the logical table id survives a reorganize")
    // row shape unchanged, but a version boundary exists at the DDL ts
    assert(st.registry.asOf("app", "t", 100L).get.versionTs == 100L)
  }

  test("ALTER TABLE .. PARTITION BY mints a NEW logical id + fresh partition " +
      "set; REMOVE PARTITIONING collapses to a new plain id (handlers :445, :454)") {
    val st = SchemaStore().applyJobs(Seq(create,
      job(70, "ALTER TABLE app.t PARTITION BY HASH(id) PARTITIONS 2",
        100L, tableId = 900L, infoId = 950L, parts = Seq(951L, 952L))))
    assert(st.physicalIdsAsOf("app", "t", 99L) == Set(901L, 902L))
    assert(st.physicalIdsAsOf("app", "t", 100L) == Set(951L, 952L))
    assert(st.idsAsOf("app", "t", 100L) == Some((950L, Set(951L, 952L))))

    val st2 = st.applyJob(job(71, "ALTER TABLE app.t REMOVE PARTITIONING",
      200L, tableId = 950L, infoId = 980L))
    assert(st2.physicalIdsAsOf("app", "t", 199L) == Set(951L, 952L))
    assert(st2.physicalIdsAsOf("app", "t", 200L) == Set(980L),
      "a de-partitioned table's single physical id IS its new logical id")
  }

  test("DROP then RECOVER TABLE: rows vanish in the dropped window and the " +
      "table re-enters with its pre-drop shape and ids (handler :337; " +
      "multi_version.go:209)") {
    val st = SchemaStore().applyJobs(Seq(create,
      job(4, "DROP TABLE app.t", 100L, tableId = 900L),
      job(25, "RECOVER TABLE app.t", 200L,
        tableId = 900L, infoId = 900L, parts = Seq(901L, 902L))))
    assert(st.physicalIdsAsOf("app", "t", 99L) == Set(901L, 902L))
    assert(st.physicalIdsAsOf("app", "t", 150L) == Set.empty,
      "nothing mounts inside the dropped window")
    assert(st.physicalIdsAsOf("app", "t", 200L) == Set(901L, 902L))
    assert(st.registry.asOf("app", "t", 150L).isEmpty)
    val rec = st.registry.asOf("app", "t", 201L)
    assert(rec.map(_.columns.map(_.name)) == Some(Seq("id", "v")),
      "recover restores the pre-drop column shape")
  }

  test("MultiSchemaChange (code 61): every clause of one multi-clause ALTER " +
      "folds in statement order under the job's finishedTs (handler :409)") {
    val st = SchemaStore().applyJobs(Seq(
      job(3, "CREATE TABLE app.t (id BIGINT, a BIGINT, b BIGINT)", 10L,
        tableId = 900L, infoId = 900L),
      job(61, "ALTER TABLE app.t ADD COLUMN c BIGINT DEFAULT 7, DROP COLUMN a, " +
        "MODIFY COLUMN b VARCHAR(16)", 100L, tableId = 900L, infoId = 900L)))
    val after = st.registry.asOf("app", "t", 100L).get
    assert(after.columns.map(_.name) == Seq("id", "b", "c"),
      s"all three clauses must apply: ${after.columns}")
    assert(after.columns.find(_.name == "b").get.dataType == "varchar(16)")
    assert(after.columns.find(_.name == "c").get.default == Some("7"))
    // column-id stability: c allocates a NEW id (4), never reusing a's (2)
    assert(st.colIds(("app", "t")) == Map("id" -> 1L, "b" -> 3L, "c" -> 4L))
  }

  test("column ids allocate monotonically and never recycle across " +
      "DROP + ADD of the same name (TiDB's id-stability contract)") {
    val st = SchemaStore().applyJobs(Seq(
      job(3, "CREATE TABLE app.t (id BIGINT, x BIGINT)", 10L, tableId = 900L, infoId = 900L),
      job(6, "ALTER TABLE app.t DROP COLUMN x", 20L, tableId = 900L),
      job(5, "ALTER TABLE app.t ADD COLUMN x BIGINT", 30L, tableId = 900L)))
    assert(st.colIds(("app", "t"))("x") == 3L,
      "re-added column must take a fresh id, not recycle 2")
  }

  test("EXCHANGE PARTITION at job level: the standalone table claims the " +
      "swapped-out physical id; the partitioned set follows TableInfo") {
    val st = SchemaStore().applyJobs(Seq(create,
      job(3, "CREATE TABLE app.s (id BIGINT, v BIGINT)", 11L,
        schema = "app", table = "s", tableId = 903L, infoId = 903L),
      job(42, "ALTER TABLE app.t EXCHANGE PARTITION p0 WITH TABLE app.s",
        100L, tableId = 900L, infoId = 900L, parts = Seq(903L, 902L))))
    assert(st.physicalIdsAsOf("app", "t", 100L) == Set(903L, 902L))
    assert(st.physicalIdsAsOf("app", "s", 100L) == Set(901L),
      "the standalone takes the id that left the partitioned set")
    assert(st.physicalIdsAsOf("app", "s", 99L) == Set(903L))
  }

  test("physicalPlan: per-physical-id windowed segments — an id claims, " +
      "releases, and can change hands at EXCHANGE boundaries") {
    val st = SchemaStore().applyJobs(Seq(create,
      job(3, "CREATE TABLE app.s (id BIGINT, v BIGINT)", 11L,
        schema = "app", table = "s", tableId = 903L, infoId = 903L),
      job(42, "ALTER TABLE app.t EXCHANGE PARTITION p0 WITH TABLE app.s",
        100L, tableId = 900L, infoId = 900L, parts = Seq(903L, 902L))))
    val plan = st.physicalPlan()
    def metaAt(pid: Long, ts: Long): Option[String] = {
      val segs = plan(pid)
      segs.filter(_._1 <= ts).lastOption.flatMap(_._2).map(m => s"${m.schema}.${m.table}")
    }
    assert(metaAt(901L, 50L) == Some("app.t"))
    assert(metaAt(901L, 100L) == Some("app.s"), "901 changes hands at 100")
    assert(metaAt(903L, 50L) == Some("app.s"))
    assert(metaAt(903L, 100L) == Some("app.t"))
    assert(metaAt(902L, 100L) == Some("app.t"), "untouched partition stays")
  }

  test("RENAME COLUMN keeps the column id (rename-only, no reallocation)") {
    val st = SchemaStore().applyJobs(Seq(
      job(3, "CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L,
        tableId = 900L, infoId = 900L),
      job(12, "ALTER TABLE app.t RENAME COLUMN v TO w", 20L, tableId = 900L)))
    assert(st.colIds(("app", "t")) == Map("id" -> 1L, "w" -> 2L),
      "the renamed column must keep id 2")
    assert(st.registry.asOf("app", "t", 20L).get.columns.map(_.name) ==
      Seq("id", "w"))
  }

  test("CREATE TABLES (code 60, batch create): every table in " +
      "MultipleTableInfos joins membership; the multi-statement query " +
      "folds each CREATE into the registry (handler :400)") {
    val q = "CREATE TABLE app.a (id BIGINT, x BIGINT); " +
      "CREATE TABLE app.b (id BIGINT, y VARCHAR(8))"
    val st = SchemaStore().applyJob(DdlJob(id = 1L, actionType = 60,
      schemaName = "app", tableName = "", query = q,
      startTs = 9L, finishedTs = 10L, schemaVersion = 1L,
      tableInfos = Seq((900L, "a", Nil), (910L, "b", Seq(911L, 912L)))))
    assert(st.physicalIdsAsOf("app", "a", 10L) == Set(900L))
    assert(st.physicalIdsAsOf("app", "b", 10L) == Set(911L, 912L))
    assert(st.registry.asOf("app", "a", 10L).get.columns.map(_.name) ==
      Seq("id", "x"))
    assert(st.registry.asOf("app", "b", 10L).get.columns.map(_.name) ==
      Seq("id", "y"))
    assert(st.colIds(("app", "b")) == Map("id" -> 1L, "y" -> 2L))
  }

  test("physicalPlan scopes by the keep predicate: an out-of-filter table's " +
      "ids never enter the plan (the changefeed-filter schema-view scoping)") {
    val st = SchemaStore().applyJobs(Seq(create,
      job(3, "CREATE TABLE other.x (a VARCHAR(8))", 20L,
        schema = "other", table = "x", tableId = 700L, infoId = 700L)))
    val plan = st.physicalPlan(keep = (s, _) => s == "app")
    assert(plan.contains(901L) && plan.contains(902L))
    assert(!plan.contains(700L),
      "a filtered-out table (any payload shape) must not reach the mount plan")
  }

  test("text-only CREATE/RECOVER (lid 0) leaves membership ABSENT, not the " +
      "drop sentinel: a wire-built table survives a text-only recover fold") {
    val st = SchemaStore().applyJobs(Seq(create,
      // text-only job: no wire ids at all (tableId = tableInfoId = 0)
      job(25, "RECOVER TABLE app.t", 100L)))
    assert(st.physicalIdsAsOf("app", "t", 100L) == Set(901L, 902L),
      "a text-only fold must not darken the wire-established membership")
    // and a purely text-only create simply has no ids to mount yet
    val st2 = SchemaStore().applyJob(job(3, "CREATE TABLE app.u (id BIGINT)",
      10L, table = "u"))
    assert(st2.membership.get(("app", "u")).isEmpty,
      "no membership entry — absent, not (0, empty)")
  }

  test("physicalPlan(tz) threads the timezone into every emitted meta") {
    val st = SchemaStore().applyJob(create)
    val plan = st.physicalPlan(tz = "Asia/Shanghai")
    val metas = plan.values.flatten.flatMap(_._2)
    assert(metas.nonEmpty && metas.forall(_.tz == "Asia/Shanghai"),
      s"metas must carry the requested tz: ${metas.map(_.tz).toSet}")
  }

  test("rename moves membership and column ids to the new name; the old " +
      "name stops mounting") {
    val st = SchemaStore().applyJobs(Seq(create,
      job(14, "RENAME TABLE app.t TO app.u", 100L, tableId = 900L, infoId = 900L,
        table = "u")))
    assert(st.physicalIdsAsOf("app", "u", 100L) == Set(901L, 902L))
    assert(st.physicalIdsAsOf("app", "t", 100L) == Set.empty)
    assert(st.physicalIdsAsOf("app", "t", 99L) == Set(901L, 902L))
    assert(st.colIds(("app", "u")) == Map("id" -> 1L, "v" -> 2L))
  }

  test("SchemaStoreHolder restart: a CreateTables (code 60) job's tableInfos " +
      "survive the JSONL log round trip — batch-created tables keep their " +
      "physical-id membership after a kill-restart re-fold") {
    val dir = java.nio.file.Files.createTempDirectory("holder").toString
    val batchCreate = DdlJob(id = 1L, actionType = 60,
      schemaName = "app", tableName = "",
      query = "CREATE TABLE app.a (id BIGINT, x BIGINT); " +
        "CREATE TABLE app.b (id BIGINT, x BIGINT)",
      startTs = 9L, finishedTs = 10L, schemaVersion = 1L,
      tableInfos = Seq((900L, "a", Nil), (910L, "b", Seq(911L, 912L))))
    val h1 = new graft.streaming.SchemaStoreHolder(SchemaStore(), dir)
    assert(h1.fold(Seq(batchCreate)) == 1)
    // restart: a fresh holder rebuilds the fold from the persisted log
    val h2 = new graft.streaming.SchemaStoreHolder(SchemaStore(), dir)
    val plan = h2.store.physicalPlan()
    assert(plan.contains(900L) && plan.contains(911L) && plan.contains(912L),
      s"replayed fold must still claim the batch-created ids: ${plan.keySet}")
    // the job id entered the dedup set — a re-delivered wire batch
    // offering it again must be a no-op, NOT the only repair path
    assert(h2.fold(Seq(batchCreate)) == 0)
    assert(h2.store.physicalIdsAsOf("app", "b", 10L) == Set(911L, 912L))
  }

  test("control-plane scale: 10k tables x versions compile to a bounded " +
      "physical plan fast enough to rebuild per micro-batch (the 1000-executor " +
      "broadcast-size question)") {
    // a production-sized census: 10k tables, each with a partition set
    // and one later ALTER — 20k jobs total
    val jobs = (0 until 10000).flatMap { i =>
      val tid = 1000L + i * 10L
      Seq(
        job(3, s"CREATE TABLE app.t$i (id BIGINT, v BIGINT)", 10L + i,
          table = s"t$i", tableId = tid, infoId = tid,
          parts = Seq(tid + 1, tid + 2)),
        job(5, s"ALTER TABLE app.t$i ADD COLUMN k BIGINT", 100000L + i,
          table = s"t$i", tableId = tid))
    }
    val t0 = System.nanoTime()
    val st = SchemaStore().applyJobs(jobs)
    val foldMs = (System.nanoTime() - t0) / 1000000L
    val t1 = System.nanoTime()
    val plan = st.physicalPlan()
    val compileMs = (System.nanoTime() - t1) / 1000000L
    // 30k physical ids (logical + 2 partitions per table), <= 2
    // segments each: the executor-side lookup structure stays
    // census-sized, NOT row-count-sized — broadcastable at any corpus
    // scale. (Scalars extracted BEFORE asserting: a failing macro
    // assert would otherwise hand the whole 30k-entry plan to the
    // prettifier.)
    val nIds = plan.size
    val maxSegs = plan.valuesIterator.map(_.size).max
    assert(nIds == 30000, s"plan ids: $nIds")
    assert(maxSegs <= 2, s"max segments per id: $maxSegs")
    assert(foldMs < 30000 && compileMs < 30000,
      s"schema-store control-plane cost must stay per-batch viable: " +
        s"fold ${foldMs}ms, compile ${compileMs}ms")
    // GC keeps it flat: truncating at the ALTER horizon leaves one
    // floor entry per timeline
    val gced = st.truncateBelow(200000L)
    assert(gced.versionCount <= 20000, s"post-GC: ${gced.versionCount}")
    info(s"fold ${foldMs}ms, plan compile ${compileMs}ms, ids ${plan.size}")
  }
}
