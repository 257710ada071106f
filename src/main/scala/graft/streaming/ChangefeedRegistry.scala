package graft.streaming

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import graft.model.{ChangefeedConfig, DispatchRule, PartitionRule}

/** Driver-side changefeed lifecycle (SURVEY §2.14; reference
  * coordinator/coordinator.go:379, controller.go:902 and the API v2
  * surface api/v2/api.go:61-73 — create/pause/resume/remove/status).
  *
  * One changefeed = one streaming query; pause stops the query (the
  * streaming checkpoint persists its progress), resume restarts from
  * the checkpoint — exactly the reference's pause/resume semantics
  * where etcd keeps the checkpoint-ts.
  */
class ChangefeedRegistry(private[streaming] val spark: SparkSession) {

  final case class Entry(var cfg: ChangefeedConfig, sourceDir: String,
                         sinkDir: String, var checkpointDir: String,
                         var query: Option[StreamingQuery],
                         backoff: FeedBackoff = new FeedBackoff(),
                         var feedState: FeedState = FeedState.Normal,
                         var lastCheckpointTs: Long = 0L,
                         var lastStatusMs: Long = 0L,
                         // physical-ms clocks for the synced decision table
                         // (api/v2/changefeed.go:1634-1730)
                         var sinkCheckpointTsMs: Long = 0L,
                         var lastSyncedTsMs: Long = 0L,
                         var pullerResolvedTsMs: Long = 0L,
                         // auto-balance window: per-table writes since
                         // the last tick + which splits the balancer
                         // owns (census-sized, never row-scaled)
                         var tableWrites: Map[(String, String), Long] = Map.empty,
                         var autoSplit: Set[(String, String)] = Set.empty)

  private val feeds = TrieMap.empty[String, Entry]

  def create(cfg: ChangefeedConfig, sourceDir: String, sinkDir: String,
             checkpointDir: String): StreamingQuery = {
    require(!feeds.contains(cfg.id), s"changefeed ${cfg.id} already exists")
    // the entry registers BEFORE the query starts: the first
    // micro-batch (and so the balance observer) can fire before
    // start() returns. A create that fails at plan build (e.g. an
    // avro feed with no schema-registry) must UNREGISTER the entry —
    // otherwise the id is permanently burned and a retried create
    // with a fixed config 400s with "already exists"
    val e = Entry(cfg, sourceDir, sinkDir, checkpointDir, None)
    feeds.put(cfg.id, e)
    val q =
      try Changefeed.run(spark, cfg, sourceDir, sinkDir, checkpointDir,
        onBatch = balanceObserver(cfg))
      catch { case t: Throwable => feeds.remove(cfg.id); throw t }
    e.query = Some(q)
    gcSafepointDropped = false // owner re-advertises the service safepoint
    q
  }

  /** The per-batch heartbeat the auto-balancer reads: per-table row
    * counts (one census-sized agg — the same shape as the bootstrap
    * cadence counts) fold into the balance window and the tick runs.
    * Free (an ignored no-op closure) unless the scheduler block opts
    * in. */
  private def balanceObserver(cfg: ChangefeedConfig)
      : org.apache.spark.sql.DataFrame => Unit =
    if (!cfg.scheduler.enableTableAcrossNodes ||
        cfg.scheduler.writeKeyThreshold <= 0) _ => ()
    else batch => {
      import org.apache.spark.sql.functions.col
      val counts = batch.groupBy(col("_schema"), col("_table")).count()
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
        .toSeq
      reportTableWrites(cfg.id, counts)
      balanceTick(cfg.id)
    }

  // ---- owner / unsafe ops surface (api/v2 coordinator.go, unsafe.go) ----

  /** Monotone ownership epoch. In the single-capture deployment the
    * capture re-elects itself immediately after resigning
    * (api/v2/coordinator.go:29 ResignOwner) — the observable effect
    * is the epoch bump the reference's new-owner campaign records. */
  private val ownerEpochCtr = new java.util.concurrent.atomic.AtomicLong(1L)
  def ownerEpoch: Long = ownerEpochCtr.get()
  def resignOwner(): Long = ownerEpochCtr.incrementAndGet()

  /** DeleteServiceGcSafePoint (api/v2/unsafe.go:96): drop the service
    * GC safepoint from the placement driver. It stays dropped until
    * the owner loop re-advertises it — here, the next feed create or
    * status report (the coordinator tick that re-registers it). */
  @volatile private var gcSafepointDropped = false
  def deleteServiceGcSafepoint(): Unit = gcSafepointDropped = true

  /** CDCMetaData (api/v2/unsafe.go:29): every coordinator record as
    * etcd-shaped (key, value) pairs — feed definitions, saved
    * checkpoints, and the owner campaign key. */
  def metadataDump: Seq[(String, String)] = {
    val info = feeds.toSeq.sortBy(_._1).map { case (id, e) =>
      s"/tidb/cdc/default/default/changefeed/info/$id" ->
        s"""{"id":"$id","state":"${e.feedState}","sink":"${e.sinkDir}","rules":${
          e.cfg.filter.rules.mkString("[\"", "\",\"", "\"]")}}"""
    }
    val status = feeds.toSeq.sortBy(_._1).map { case (id, e) =>
      s"/tidb/cdc/default/default/changefeed/status/$id" ->
        s"""{"checkpoint-ts":${e.lastCheckpointTs}}"""
    }
    (("/tidb/cdc/default/__cdc_meta__/owner/" + ownerEpoch) -> "capture-0") +:
      (info ++ status)
  }

  def pause(id: String): Unit = feeds.get(id).foreach { e =>
    e.query.foreach(_.stop())
    e.query = None
  }

  /** Restart from the checkpoint — processed data is not re-emitted.
    * An explicit resume also clears a failed/warning retry state (the
    * reference's resume path calls resetErrRetry — a user resume
    * overrides the backoff schedule). */
  def resume(id: String): StreamingQuery = resume(id, None)

  /** Resume, optionally REWRITING the checkpoint (api/v2
    * model.go:90 ResumeChangefeedConfig.OverwriteCheckpointTs +
    * changefeed.go:783-790; the `cli changefeed resume
    * --overwrite-checkpoint-ts` flow): replication restarts from
    * `overwriteCheckpointTs` instead of the saved progress — rows
    * with commit ts above it re-replicate, however far back that
    * reaches. Mechanically: the streaming checkpoint rotates to a
    * fresh directory (the old one IS the old progress; Spark offers
    * no in-place rewind) and the feed's plan gains a commit-ts floor
    * so everything at or below the overwrite stays suppressed.
    * The reference also rejects an overwrite below the upstream GC
    * safepoint (the data may be gone); this engine's parquet
    * change-log never self-destructs, so any ts is accepted. */
  def resume(id: String, overwriteCheckpointTs: Option[Long]): StreamingQuery = {
    val e = feeds.getOrElse(id, sys.error(s"no changefeed $id"))
    require(e.query.isEmpty || !e.query.get.isActive, s"$id is running")
    require(e.feedState != FeedState.Finished,
      s"$id is finished (target-ts reached) and cannot resume")
    e.backoff.resetRetry()
    e.feedState = FeedState.Normal
    overwriteCheckpointTs.foreach { ts =>
      e.checkpointDir = s"${e.checkpointDir.stripSuffix("/")}@$ts"
      e.cfg = e.cfg.copy(replicateFromTs = Some(ts))
      e.lastCheckpointTs = ts
    }
    val q = Changefeed.run(spark, e.cfg, e.sourceDir, e.sinkDir, e.checkpointDir,
      onBatch = balanceObserver(e.cfg))
    e.query = Some(q)
    q
  }

  // ---- error-retry state machine (coordinator/changefeed/backoff.go) ----

  /** Fold a status report (checkpoint ts + errors observed since the
    * last report) into the feed's retry machine. A WARNING verdict
    * stops the query (it restarts via [[retryDue]] once the backoff
    * interval elapses); FAILED stops it until an explicit resume. */
  def reportStatus(id: String, checkpointTs: Long, errs: Seq[FeedError],
                   nowMs: Long): FeedState = {
    val e = entryOf(id)
    gcSafepointDropped = false // owner tick re-registers the safepoint
    e.lastCheckpointTs = math.max(e.lastCheckpointTs, checkpointTs)
    e.lastStatusMs = math.max(e.lastStatusMs, nowMs)
    if (e.cfg.targetTs.exists(t => e.lastCheckpointTs >= t)) {
      // replication goal reached: clean terminal state, no retry path
      e.feedState = FeedState.Finished
      pause(id)
    } else {
      e.feedState = e.backoff.checkStatus(checkpointTs, errs, nowMs)
      if (e.feedState != FeedState.Normal) pause(id)
    }
    e.feedState
  }

  /** Global GC safepoint lower bound (changefeed_db.go:326-343 +
    * NeedBlockGC, pkg/config/changefeed.go:315-325): the min saved
    * checkpoint over every feed that still needs upstream data.
    * Normal, warning, and paused feeds block GC; a FAILED feed blocks
    * too UNLESS it failed because GC already ate its data (then
    * holding the safepoint for it is pointless by definition). None
    * when no feed blocks GC. */
  def gcSafepoint: Option[Long] = {
    if (gcSafepointDropped) None
    else {
      val barriers = gcBarriers
      if (barriers.isEmpty) None else Some(barriers.values.min)
    }
  }

  /** Per-keyspace GC barriers (CalculateKeyspaceGCBarrier,
    * changefeed_db.go:345-368): [[gcSafepoint]] grouped by each
    * feed's upstream keyspace — one barrier per tenant, so an idle
    * tenant's GC never waits on another tenant's laggard feed. */
  def gcBarriers: Map[String, Long] = {
    feeds.values.filter { e =>
      e.feedState match {
        case FeedState.Finished => false
        case FeedState.Failed =>
          !e.backoff.lastError.exists(err =>
            FeedBackoff.gcFastFailCodes.contains(err.code))
        case _ => true
      }
    }.groupBy(_.cfg.keyspace)
      .map { case (ks, es) => ks -> es.map(_.lastCheckpointTs).min }
  }

  /** Scheduling gate: true when the feed is allowed to (re)start at
    * `nowMs` — not failed, backoff interval elapsed, not running. */
  def shouldRun(id: String, nowMs: Long): Boolean = {
    val e = entryOf(id)
    e.backoff.shouldRun(nowMs) && !e.query.exists(_.isActive)
  }

  /** Restart every warning feed whose backoff interval has elapsed —
    * the coordinator's periodic retry scan. Returns restarted ids. */
  def retryDue(nowMs: Long): Seq[String] = {
    val due = feeds.collect {
      case (id, e) if e.feedState == FeedState.Warning &&
        shouldRun(id, nowMs) => id
    }.toSeq.sorted
    due.foreach { id =>
      val e = entryOf(id)
      val q = Changefeed.run(spark, e.cfg, e.sourceDir, e.sinkDir, e.checkpointDir)
      e.query = Some(q)
      // still WARNING: the reference keeps the warning state until the
      // checkpoint actually advances (backoff.go:154-167), not merely
      // until a restart is attempted
    }
    due
  }

  def lastError(id: String): Option[FeedError] = entryOf(id).backoff.lastError

  def remove(id: String): Unit = {
    pause(id)
    feeds.remove(id)
  }

  def list: Seq[String] = feeds.keys.toSeq.sorted

  def exists(id: String): Boolean = feeds.contains(id)

  // ---- span scheduling (api/v2/api.go:76-81: move_table,
  // split_table_by_region_count, merge_table, ListTables) ----
  //
  // A table span's placement is its routing partition rule: move pins
  // the span to one worker partition, split fans it over N
  // sub-partitions (saltedRepartition semantics — per-table order is
  // given up, like a split span), merge restores the default rule.
  // Changes take effect at the feed's next (re)start — the micro-batch
  // boundary is the scheduling fence, the role the reference's barrier
  // ts plays for a move.

  private def entryOf(id: String): Entry =
    feeds.getOrElse(id, sys.error(s"no changefeed $id"))

  private def setSpanRule(id: String, schema: String, table: String,
                          rule: Option[PartitionRule]): Unit = {
    val e = entryOf(id)
    val matcher = Seq(s"$schema.$table")
    val others = e.cfg.sink.dispatch.filterNot(_.matcher == matcher)
    val dispatch = rule.map(r => DispatchRule(matcher, r) +: others).getOrElse(others)
    e.cfg = e.cfg.copy(sink = e.cfg.sink.copy(dispatch = dispatch))
  }

  /** Move a table's span to one target worker partition. */
  def moveTable(id: String, schema: String, table: String, target: Int): Unit = {
    val e = entryOf(id)
    require(target >= 0 && target < e.cfg.sink.numPartitions,
      s"target $target out of range 0..${e.cfg.sink.numPartitions - 1}")
    setSpanRule(id, schema, table, Some(PartitionRule.Fixed(target)))
  }

  /** Split a table's span over `parts` sub-partitions. */
  def splitTable(id: String, schema: String, table: String, parts: Int): Unit = {
    require(parts >= 2, s"split needs >= 2 parts, got $parts")
    // key-sticky split: one handle key keeps one sub-partition, the
    // key-range-span property of the reference's split spans
    setSpanRule(id, schema, table,
      Some(PartitionRule.TableSplit(parts, entryOf(id).cfg.handleKeys)))
  }

  /** Split a table's span AND pin the pieces to chosen workers
    * (api/v2 move_split_table). */
  def moveSplitTable(id: String, schema: String, table: String,
                     targets: Seq[Int]): Unit = {
    val e = entryOf(id)
    require(targets.size >= 2, s"move_split needs >= 2 targets, got $targets")
    require(targets.forall(t => t >= 0 && t < e.cfg.sink.numPartitions),
      s"targets $targets out of range 0..${e.cfg.sink.numPartitions - 1}")
    setSpanRule(id, schema, table, Some(PartitionRule.SplitFixed(targets)))
  }

  /** Merge a split/moved span back to the default table rule. */
  def mergeTable(id: String, schema: String, table: String): Unit =
    setSpanRule(id, schema, table, None)

  // ---- automatic load-based span scheduling (maintainer/scheduler/
  // balance_splits.go; write_bytes_splitter.go:54) ----

  /** Fold one batch's per-table write observation into the feed's
    * balance window — the dispatcher write-bytes heartbeat the
    * reference's splitter reads. Census-sized driver state. */
  def reportTableWrites(id: String,
                        counts: Seq[((String, String), Long)]): Unit = {
    val e = entryOf(id)
    // the window is read-modify-write from the micro-batch thread AND
    // API threads: the Entry is the lock (same monitor as balanceTick,
    // so a tick never interleaves with a half-folded report)
    e.synchronized {
      counts.foreach { case (k, n) =>
        e.tableWrites = e.tableWrites.updated(k, e.tableWrites.getOrElse(k, 0L) + n)
      }
    }
  }

  /** The auto-balance tick: split any table whose windowed writes
    * exceed `scheduler.write-key-threshold` (parts scale with the
    * excess, capped at the worker count; the split is KEY-STICKY —
    * [[splitTable]]'s handle-key salt — so per-key order survives,
    * the reference's key-range-span property), and merge back an
    * AUTO-split table that cooled below half the threshold
    * (hysteresis; manual splits are never auto-merged). Resets the
    * window. Placement changes fence at the next (re)start like every
    * manual op, so running checkpoints stay monotone. No-op unless
    * `enable-table-across-nodes` with a positive threshold
    * (scheduler_config.go gating). Returns the rendered actions. */
  def balanceTick(id: String): Seq[String] = {
    val e = entryOf(id)
    val sc = e.cfg.scheduler
    if (!sc.enableTableAcrossNodes || sc.writeKeyThreshold <= 0) Nil
    else e.synchronized {
      val thr = sc.writeKeyThreshold.toLong
      val actions = scala.collection.mutable.Buffer.empty[String]
      // an auto-split table ABSENT from the window wrote zero rows —
      // it must reach the merge branch, or a table that goes fully
      // idle keeps its split forever (the hysteresis would never fire
      // because only tables that still produce rows appear here)
      val window = e.tableWrites
      (window.keySet ++ e.autoSplit).toSeq.sorted.foreach { case k @ (s, t) =>
        val w = window.getOrElse(k, 0L)
        if (w > thr) {
          val parts = math.min(e.cfg.sink.numPartitions.toLong,
            math.max(2L, (w + thr - 1) / thr)).toInt
          splitTable(id, s, t, parts)
          e.autoSplit += k
          actions += s"split:$s.$t:$parts"
        } else if (e.autoSplit.contains(k) && w < math.max(thr / 2, 1L)) {
          mergeTable(id, s, t)
          e.autoSplit -= k
          actions += s"merge:$s.$t"
        }
      }
      e.tableWrites = Map.empty
      actions.toSeq
    }
  }

  /** Drain a worker partition: every span pinned to `target` (moved
    * or split-moved) is re-pinned to the next partition, across ALL
    * feeds — the coordinator's orderly evacuate-node flow
    * (coordinator/controller_drain.go:139 DrainNode; api v2 drain).
    * Feeds themselves keep running — placement changes fence at the
    * next micro-batch like any move, so checkpoints stay monotone.
    * Returns the number of spans moved; a second call returns 0 (the
    * reference's remaining-count poll converging). */
  def drainNode(target: Int): Int = {
    var moved = 0
    feeds.foreach { case (_, e) =>
      val n = e.cfg.sink.numPartitions
      def substitute(p: Int): Int = if (p == target) (target + 1) % n else p
      val dispatch = e.cfg.sink.dispatch.map { d =>
        d.partition match {
          case PartitionRule.Fixed(p) if p == target =>
            moved += 1; d.copy(partition = PartitionRule.Fixed(substitute(p)))
          case PartitionRule.SplitFixed(ts) if ts.contains(target) =>
            moved += 1
            d.copy(partition = PartitionRule.SplitFixed(ts.map(substitute).distinct match {
              case Seq(single) => Seq(single, (single + 1) % n) // keep >=2 targets
              case many => many
            }))
          case _ => d
        }
      }
      e.cfg = e.cfg.copy(sink = e.cfg.sink.copy(dispatch = dispatch))
    }
    moved
  }

  /** The feed's non-default span placements (ListTables view):
    * (schema.table, rule rendering). */
  def tableSpans(id: String): Seq[(String, String)] =
    entryOf(id).cfg.sink.dispatch.collect {
      case DispatchRule(Seq(m), PartitionRule.Fixed(p), _, _, _) =>
        (m, s"moved:$p")
      case DispatchRule(Seq(m), PartitionRule.TableSplit(n, _), _, _, _) =>
        (m, s"split:$n")
      case DispatchRule(Seq(m), PartitionRule.SplitFixed(ts), _, _, _) =>
        (m, s"split_moved:${ts.mkString("+")}")
    }

  /** 128-bit dispatcher id of one span piece (md5 halves — the
    * DispatcherID analog). */
  private def spanId(feed: String, span: String, part: Int): (Long, Long) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$feed|$span|$part".getBytes("UTF-8"))
    def l(off: Int) = (0 until 8).foldLeft(0L)((a, i) =>
      (a << 8) | (d(off + i) & 0xffL))
    (l(0), l(8))
  }

  /** Per-node EXPECTED dispatcher-set checksums for a feed's current
    * placements (maintainer/node_set_checksum_manager.go: the
    * coordinator's source-of-truth view, recomputed from config so no
    * second mutable copy can itself drift). `tables` is the feed's
    * table census; placement: moved spans at their pin, split-moved
    * pieces at their targets, split pieces round-robin, unpinned
    * tables at hash(span) % numPartitions — the same determinism the
    * data path's partitioner follows. */
  def spanSetChecksums(id: String,
                       tables: Seq[(String, String)]): Map[Int, SetChecksum] = {
    val e = entryOf(id)
    val n = e.cfg.sink.numPartitions
    val placed = scala.collection.mutable.Map.empty[Int, SetChecksum]
      .withDefaultValue(SetChecksum())
    def put(node: Int, idh: (Long, Long)): Unit =
      placed(node) = placed(node).add(idh._1, idh._2)
    tables.foreach { case (s, t) =>
      val span = s"$s.$t"
      // first-match wildcard resolution — the SAME semantics the data
      // path's partitioner uses (Routing.partitionFor via
      // TableMatcher.matchesValue); literal equality here would ignore
      // 'app.*'-style rules and report permanent false drift for them
      val rule = e.cfg.sink.dispatch
        .find(r => graft.operators.TableMatcher.matchesValue(s, t, r.matcher))
        .map(_.partition)
      rule match {
        case Some(PartitionRule.Fixed(p)) => put(p, spanId(id, span, 0))
        case Some(PartitionRule.SplitFixed(ts)) =>
          ts.zipWithIndex.foreach { case (p, i) => put(p, spanId(id, span, i)) }
        case Some(PartitionRule.TableSplit(parts, _)) =>
          (0 until parts).foreach(i => put(i % n, spanId(id, span, i)))
        case _ =>
          put(math.floorMod(span.hashCode, n), spanId(id, span, 0))
      }
    }
    placed.toMap
  }

  /** Drift check: nodes whose REPORTED runtime dispatcher set differs
    * from the expected one (a node missing from `reported` with a
    * non-empty expectation drifts too). The heartbeat-side MATCH /
    * non-match comparison of the reference, order-independent and
    * O(1) per node. */
  def spanDrift(id: String, tables: Seq[(String, String)],
                reported: Map[Int, SetChecksum]): Seq[Int] = {
    val expected = spanSetChecksums(id, tables)
    (expected.keySet ++ reported.keySet).toSeq.sorted.filter { node =>
      expected.getOrElse(node, SetChecksum()) !=
        reported.getOrElse(node, SetChecksum())
    }
  }

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

  /** Fold the maintainer's sync clocks into the feed — the status
    * fields the reference's coordinator keeps per changefeed
    * (LastSyncedTs = commit instant of the newest row the sink wrote,
    * LogCoordinatorResolvedTs = how far the puller has read). All
    * monotone, all physical milliseconds. */
  def reportSyncState(id: String, checkpointTsMs: Long = 0L,
                      lastSyncedTsMs: Long = 0L,
                      pullerResolvedTsMs: Long = 0L): Unit = {
    val e = entryOf(id)
    e.sinkCheckpointTsMs = math.max(e.sinkCheckpointTsMs, checkpointTsMs)
    e.lastSyncedTsMs = math.max(e.lastSyncedTsMs, lastSyncedTsMs)
    e.pullerResolvedTsMs = math.max(e.pullerResolvedTsMs, pullerResolvedTsMs)
  }

  /** The full synced-status decision table
    * (api/v2/changefeed.go:1671-1730; response struct model.go:1374):
    *
    *  - data idle for `syncedCheckInterval` AND checkpoint fresh
    *    within `checkpointInterval` → strictly synced;
    *  - data idle but checkpoint stale → not synced, with the
    *    "check upstream health" hint when the puller-to-checkpoint gap
    *    is itself small (the upstream, not this engine, is stuck);
    *  - data arrived recently → not synced, wait.
    *
    * A live query's progress refreshes lastSynced/checkpoint first, so
    * the API answer tracks reality without an explicit report. */
  def syncedStatus(id: String, nowMs: Long): ChangefeedRegistry.SyncedStatus = {
    val e = entryOf(id)
    // fold live streaming progress in: a batch that admitted rows is a
    // sync event at its trigger instant; any progress is a checkpoint
    e.query.filter(_.isActive).flatMap(q => Option(q.lastProgress)).foreach { p =>
      val triggerMs =
        try java.time.Instant.parse(p.timestamp).toEpochMilli
        catch { case _: Exception => 0L }
      e.sinkCheckpointTsMs = math.max(e.sinkCheckpointTsMs, triggerMs)
      e.pullerResolvedTsMs = math.max(e.pullerResolvedTsMs, triggerMs)
      if (p.numInputRows > 0) e.lastSyncedTsMs = math.max(e.lastSyncedTsMs, triggerMs)
    }
    val cfg = e.cfg.syncedStatus.effective
    val syncedGapMs = cfg.syncedCheckInterval * 1000L
    val ckptGapMs = cfg.checkpointInterval * 1000L
    val dataIdle = nowMs - e.lastSyncedTsMs > syncedGapMs
    val (isSynced, info) =
      if (dataIdle && nowMs - e.sinkCheckpointTsMs < ckptGapMs)
        (true, "The data syncing is finished")
      else if (dataIdle) {
        if (e.pullerResolvedTsMs - e.sinkCheckpointTsMs < ckptGapMs)
          (false, "Please check whether PD is online and TiKV Regions are all available. " +
            "If PD is offline or some TiKV regions are not available, it means that the data syncing process is complete. " +
            "If the gap is large, such as a few minutes, it means that some regions in TiKV are unavailable. " +
            "Otherwise, if the gap is small and PD is online, it means the data syncing is incomplete, so please wait")
        else (false, "The data syncing is not finished, please wait")
      } else (false, "The data syncing is not finished, please wait")
    ChangefeedRegistry.SyncedStatus(isSynced, e.sinkCheckpointTsMs,
      e.pullerResolvedTsMs, e.lastSyncedTsMs, nowMs, info)
  }

  /** Update the feed's table-filter rules (the reference's
    * UpdateChangefeed, api/v2/changefeed.go — allowed only while the
    * feed is not running; the new rules take effect at the next
    * (re)start, the same micro-batch scheduling fence as span
    * moves). */
  def updateFilter(id: String, rules: Seq[String]): Unit = {
    val e = entryOf(id)
    require(e.query.isEmpty || !e.query.get.isActive,
      s"$id must be paused to update")
    e.cfg = e.cfg.copy(filter = e.cfg.filter.copy(rules = rules))
  }

  def filterRules(id: String): Seq[String] = entryOf(id).cfg.filter.rules

  /** Merge a scheduler update onto the stored block — paused-only like
    * every config update; the result passes through
    * FillMissingWithDefaults then ValidateAndAdjust exactly as the
    * reference's update flow does (api/v2 update_changefeed_check_config:
    * a MySQL downstream pins enable-splittable-check on). */
  def updateScheduler(id: String,
                      merge: graft.model.SchedulerConfig => graft.model.SchedulerConfig)
  : graft.model.SchedulerConfig = {
    val e = entryOf(id)
    require(e.query.isEmpty || !e.query.get.isActive,
      s"$id must be paused to update")
    val mysql = e.sinkDir.startsWith("mysql://") || e.sinkDir.startsWith("jdbc:")
    val next = merge(e.cfg.scheduler).fillMissingWithDefaults.validateAndAdjust(mysql)
    e.cfg = e.cfg.copy(scheduler = next)
    next
  }

  /** Atomic rules+scheduler update — VALIDATE-THEN-APPLY like the
    * reference's update flow (update_changefeed_check_config builds
    * and checks the whole new config before storing): the scheduler
    * merge is filled/validated BEFORE either change commits, so a
    * validation failure (→ the API's 400) leaves the stored config
    * fully untouched instead of having already committed the rules
    * half. */
  def updateFilterAndScheduler(id: String, rules: Option[Seq[String]],
                               merge: Option[graft.model.SchedulerConfig =>
                                 graft.model.SchedulerConfig]): Unit = {
    val e = entryOf(id)
    require(e.query.isEmpty || !e.query.get.isActive,
      s"$id must be paused to update")
    val mysql = e.sinkDir.startsWith("mysql://") || e.sinkDir.startsWith("jdbc:")
    val nextSched = merge.map(m =>
      m(e.cfg.scheduler).fillMissingWithDefaults.validateAndAdjust(mysql))
    var cfg = e.cfg
    rules.foreach(r => cfg = cfg.copy(filter = cfg.filter.copy(rules = r)))
    nextSched.foreach(s => cfg = cfg.copy(scheduler = s))
    e.cfg = cfg
  }

  /** The feed's full definition (GetChangeFeed, api/v2/api.go:61). */
  def config(id: String): ChangefeedConfig = entryOf(id).cfg

  /** Changefeeds with an active query — the ListProcessor view (one
    * in-process capture ⇒ processor per running feed). */
  def runningFeeds: Seq[String] =
    feeds.collect { case (id, e) if e.query.exists(_.isActive) => id }
      .toSeq.sorted

  /** Control-plane-only metrics view for the Prometheus scrape: no
    * Spark job runs here (a scraper polls every 15 s; [[status]]'s
    * sink count would launch one per feed per scrape). The state int
    * follows the reference's FeedState.ToInt
    * (pkg/config/changefeed.go:63-83: normal 0, failed 2, stopped 3,
    * finished 4, warning 6). */
  def feedMetrics: Seq[ChangefeedRegistry.FeedMetric] =
    feeds.toSeq.sortBy(_._1).map { case (id, e) =>
      val (name, code) = e.feedState match {
        case FeedState.Failed => ("failed", 2)
        case FeedState.Warning => ("warning", 6)
        case FeedState.Finished => ("finished", 4)
        case FeedState.Normal =>
          if (e.query.exists(_.isActive)) ("normal", 0) else ("stopped", 3)
      }
      ChangefeedRegistry.FeedMetric(id, e.cfg.keyspace, name, code,
        e.lastCheckpointTs, e.lastStatusMs)
    }

  /** (id, state, emitted-row count) — the status/synced API view.
    * Retry states win over the query's run state: a warning feed is
    * "warning" whether its query is mid-restart or waiting out the
    * backoff; a failed feed is "failed" until resumed. */
  def status(id: String): (String, String, Long) = {
    val e = feeds.getOrElse(id, sys.error(s"no changefeed $id"))
    val state = e.feedState match {
      case FeedState.Failed   => "failed"
      case FeedState.Warning  => "warning"
      case FeedState.Finished => "finished"
      case FeedState.Normal => e.query match {
        case Some(q) if q.isActive => "running"
        case _ => "paused"
      }
    }
    val n = try spark.read.parquet(e.sinkDir).count() catch { case _: Throwable => 0L }
    (id, state, n)
  }
}

object ChangefeedRegistry {
  /** One changefeed's control-plane gauge set (the values the
    * reference's coordinator tick pushes into pkg/metrics gauges,
    * coordinator/controller.go:267-355). */
  final case class FeedMetric(id: String, keyspace: String,
                              state: String, stateCode: Int,
                              checkpointTs: Long, lastStatusMs: Long)

  /** GET /changefeeds/{id}/synced response (api/v2 model.go:1374-1382
    * SyncedStatus) — clocks in physical milliseconds; the API layer
    * renders them in the reference's JSONTime text form. */
  final case class SyncedStatus(synced: Boolean, sinkCheckpointTsMs: Long,
                                pullerResolvedTsMs: Long, lastSyncedTsMs: Long,
                                nowMs: Long, info: String)
}
