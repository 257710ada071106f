package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import com.fasterxml.jackson.databind.ObjectMapper
import graft.model.{DdlJobParser, SchemaStore}
import graft.model.DdlJobParser.DdlJob

/** Driver-held EVOLVING schema store with a persisted DDL-job log —
  * the persist_storage role of the reference's schemastore
  * (logservice/schemastore/persist_storage.go: every handled job is
  * written down so a restarted node rebuilds the same multi-version
  * view before consuming new events).
  *
  * The log is one JSON line per folded job under the changefeed's
  * checkpoint directory, so the schema view and the stream offsets
  * recover TOGETHER: a kill-restart replays the log first (idempotent
  * — jobs dedup by id, the doApplyDDL already-applied skip of
  * multi_version.go:194-201), then re-delivered raw batches re-offer
  * their jobs, which the id set drops.
  *
  * Control-plane sized by construction: one line per DDL ever seen,
  * folded on the driver between micro-batches.
  */
final class SchemaStoreHolder(initial: SchemaStore, logDir: String) {

  @volatile private var current: SchemaStore = initial
  private val applied = scala.collection.mutable.Set.empty[Long]
  private val logFile = Paths.get(logDir, "ddl_jobs.jsonl")
  private val mapper = new ObjectMapper()

  // restart path: rebuild the fold from the persisted log
  locally {
    Files.createDirectories(Paths.get(logDir))
    if (Files.exists(logFile)) {
      val jobs = Files.readAllLines(logFile, StandardCharsets.UTF_8)
      jobs.forEach { line =>
        if (line.nonEmpty) foldOne(fromJson(line), persist = false)
      }
    }
  }

  def store: SchemaStore = current

  /** Fold new jobs (any order; sorted by finishedTs, deduped by job
    * id) and persist the fresh ones. Returns how many were new. */
  def fold(jobs: Seq[DdlJob]): Int = synchronized {
    val fresh = jobs.filterNot(j => applied.contains(j.id)).sortBy(_.finishedTs)
    fresh.foreach(foldOne(_, persist = true))
    fresh.size
  }

  /** GC the store below `gcTs` (the schemastore gc loop) — the log
    * keeps its full history (it is one line per DDL, not per version;
    * compacting it would only save re-fold time on restart). */
  def truncateBelow(gcTs: Long): Unit = synchronized {
    current = current.truncateBelow(gcTs)
  }

  private def foldOne(job: DdlJob, persist: Boolean): Unit = synchronized {
    if (!applied.contains(job.id)) {
      if (persist)
        Files.write(logFile, (toJson(job) + "\n").getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      current = current.applyJob(job)
      applied += job.id
    }
  }

  private def toJson(j: DdlJob): String = {
    val n = mapper.createObjectNode()
    n.put("id", j.id); n.put("actionType", j.actionType)
    n.put("schemaName", j.schemaName); n.put("tableName", j.tableName)
    n.put("query", j.query); n.put("startTs", j.startTs)
    n.put("finishedTs", j.finishedTs); n.put("schemaVersion", j.schemaVersion)
    n.put("tableId", j.tableId); n.put("tableInfoId", j.tableInfoId)
    val arr = n.putArray("partitionIds")
    j.partitionIds.foreach(arr.add)
    // CreateTables (action 60) builds membership from tableInfos — the
    // log must carry them or a restart re-fold leaves the batch-created
    // tables memberless (their job id is deduped, so re-delivered wire
    // batches never repair it) and silently unmountable
    if (j.tableInfos.nonEmpty) {
      val tis = n.putArray("tableInfos")
      j.tableInfos.foreach { case (tid, name, ps) =>
        val t = tis.addObject()
        t.put("id", tid); t.put("name", name)
        val pa = t.putArray("partitionIds")
        ps.foreach(pa.add)
      }
    }
    n.toString
  }

  private def fromJson(line: String): DdlJob = {
    val n = mapper.readTree(line)
    def num(k: String) = n.get(k).asLong(0L)
    val parts = Option(n.get("partitionIds"))
      .map(a => (0 until a.size).map(i => a.get(i).asLong(0L))).getOrElse(Nil)
    val infos = Option(n.get("tableInfos"))
      .map(a => (0 until a.size).map { i =>
        val t = a.get(i)
        (t.get("id").asLong(0L), t.get("name").asText(""),
          Option(t.get("partitionIds"))
            .map(p => (0 until p.size).map(j => p.get(j).asLong(0L)).toSeq)
            .getOrElse(Nil))
      }.toSeq).getOrElse(Nil)
    DdlJob(num("id"), n.get("actionType").asInt(0),
      n.get("schemaName").asText(""), n.get("tableName").asText(""),
      n.get("query").asText(""), num("startTs"), num("finishedTs"),
      num("schemaVersion"), num("tableId"), num("tableInfoId"), parts.toSeq,
      infos)
  }
}

object SchemaStoreHolder {
  /** Extract the Done DDL jobs a matched/raw batch carries on the
    * `mysql.tidb_ddl_job` system table's record keys (ddl_job_fetcher
    * .go:201-215). Distributed parse, control-plane-sized collect. */
  def jobsIn(batch: org.apache.spark.sql.DataFrame): Seq[DdlJob] = {
    val rows = batch
      .select("key", "value", "op_type", "start_ts", "commit_ts")
      .mapPartitions { it =>
        it.flatMap { r =>
          DdlJobParser.parseRawEntry(r.getAs[Array[Byte]](0),
            r.getAs[Array[Byte]](1), r.getString(2), r.getLong(3), r.getLong(4))
        }
      }(org.apache.spark.sql.Encoders.kryo[DdlJob])
      .collect()
    rows.toSeq
  }
}
