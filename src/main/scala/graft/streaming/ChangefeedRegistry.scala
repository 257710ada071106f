package graft.streaming

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import graft.model.ChangefeedConfig

/** Driver-side changefeed lifecycle (SURVEY §2.14; reference
  * coordinator/coordinator.go:379, controller.go:902 and the API v2
  * surface api/v2/api.go:61-73 — create/pause/resume/remove/status).
  *
  * One changefeed = one streaming query; pause stops the query (the
  * streaming checkpoint persists its progress), resume restarts from
  * the checkpoint — exactly the reference's pause/resume semantics
  * where etcd keeps the checkpoint-ts.
  */
class ChangefeedRegistry(spark: SparkSession) {

  final case class Entry(cfg: ChangefeedConfig, sourceDir: String,
                         sinkDir: String, checkpointDir: String,
                         var query: Option[StreamingQuery])

  private val feeds = TrieMap.empty[String, Entry]

  def create(cfg: ChangefeedConfig, sourceDir: String, sinkDir: String,
             checkpointDir: String): StreamingQuery = {
    require(!feeds.contains(cfg.id), s"changefeed ${cfg.id} already exists")
    val q = Changefeed.run(spark, cfg, sourceDir, sinkDir, checkpointDir)
    feeds.put(cfg.id, Entry(cfg, sourceDir, sinkDir, checkpointDir, Some(q)))
    q
  }

  def pause(id: String): Unit = feeds.get(id).foreach { e =>
    e.query.foreach(_.stop())
    e.query = None
  }

  /** Restart from the checkpoint — processed data is not re-emitted. */
  def resume(id: String): StreamingQuery = {
    val e = feeds.getOrElse(id, sys.error(s"no changefeed $id"))
    require(e.query.isEmpty || !e.query.get.isActive, s"$id is running")
    val q = Changefeed.run(spark, e.cfg, e.sourceDir, e.sinkDir, e.checkpointDir)
    e.query = Some(q)
    q
  }

  def remove(id: String): Unit = {
    pause(id)
    feeds.remove(id)
  }

  def list: Seq[String] = feeds.keys.toSeq.sorted

  /** Persist every changefeed's definition — the coordinator's etcd
    * role (ChangeFeedInfo persistence, controller.go:902): one record
    * per feed under `dir`, containing config + paths. Queries
    * themselves are not persisted; their progress lives in each
    * feed's streaming checkpoint. */
  def persist(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    feeds.foreach { case (id, e) =>
      val out = new java.io.ObjectOutputStream(
        java.nio.file.Files.newOutputStream(p.resolve(s"$id.cf")))
      try out.writeObject((e.cfg, e.sourceDir, e.sinkDir, e.checkpointDir))
      finally out.close()
    }
  }

  /** Recover a registry from [[persist]]ed state: every feed comes
    * back PAUSED (its streaming checkpoint holds the progress);
    * `resume` restarts exactly-once from there — the reference's
    * coordinator-failover behavior. */
  def restore(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.isDirectory(p)) {
      java.nio.file.Files.list(p).iterator().forEachRemaining { f =>
        if (f.toString.endsWith(".cf")) {
          val in = new java.io.ObjectInputStream(java.nio.file.Files.newInputStream(f))
          try {
            val (cfg, src, sink, ckpt) = in.readObject()
              .asInstanceOf[(ChangefeedConfig, String, String, String)]
            feeds.putIfAbsent(cfg.id, Entry(cfg, src, sink, ckpt, None))
          } finally in.close()
        }
      }
    }
  }

  /** Synced = the sink has caught up with the source (the reference's
    * checkpointTs ≥ resolvedTs check, api/v2 status/synced): an
    * inactive query is synced by construction (AvailableNow drained to
    * its checkpoint); an active one is synced when its last trigger
    * admitted no new rows. */
  def synced(id: String): Boolean = {
    val e = feeds.getOrElse(id, sys.error(s"no changefeed $id"))
    e.query match {
      case Some(q) if q.isActive => Option(q.lastProgress).exists(_.numInputRows == 0)
      case _ => true
    }
  }

  /** (id, state, emitted-row count) — the status/synced API view. */
  def status(id: String): (String, String, Long) = {
    val e = feeds.getOrElse(id, sys.error(s"no changefeed $id"))
    val state = e.query match {
      case Some(q) if q.isActive => "running"
      case _ => "paused"
    }
    val n = try spark.read.parquet(e.sinkDir).count() catch { case _: Throwable => 0L }
    (id, state, n)
  }
}
