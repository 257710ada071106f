package graft.streaming

/** Dispatcher-set consistency checksum (reference
  * pkg/set_checksum/set_checksum.go + maintainer/
  * node_set_checksum_manager.go): the coordinator keeps, per worker
  * node, an order-independent incrementally-updatable checksum of the
  * dispatcher (span) ids it EXPECTS that node to run; the node
  * compares against its runtime set and reports MATCH / non-match in
  * its heartbeat. Drift between the scheduler's view and a node's
  * actual set — the bug class behind stuck spans after messy
  * failovers — becomes observable in O(1) state per node instead of
  * O(dispatchers) set exchange.
  *
  * The checksum is (count, xor, sum) over the 128-bit id's halves:
  * commutative, so adds/removes apply in any order, and removal is
  * exact inverse. Not cryptographic; collisions are astronomically
  * unlikely for honest schedulers (set_checksum.go:21-24).
  */
final case class SetChecksum(count: Long = 0L,
                             xorHigh: Long = 0L, xorLow: Long = 0L,
                             sumHigh: Long = 0L, sumLow: Long = 0L) {
  def add(idHigh: Long, idLow: Long): SetChecksum =
    SetChecksum(count + 1, xorHigh ^ idHigh, xorLow ^ idLow,
      sumHigh + idHigh, sumLow + idLow)
  /** Caller guarantees the id is present (set_checksum.go:44-46). */
  def remove(idHigh: Long, idLow: Long): SetChecksum =
    SetChecksum(count - 1, xorHigh ^ idHigh, xorLow ^ idLow,
      sumHigh - idHigh, sumLow - idLow)
  def isEmpty: Boolean = this == SetChecksum()
}

object SetChecksum {
  /** Checksum of a whole id set (order-irrelevant by construction). */
  def of(ids: Iterable[(Long, Long)]): SetChecksum =
    ids.foldLeft(SetChecksum()) { case (c, (h, l)) => c.add(h, l) }
}

/** Coordinator-side manager for per-node expected checksums
  * (maintainer/node_set_checksum_manager.go): tracks which node owns
  * each dispatcher id, marks nodes dirty on assign/move/remove, sends
  * sequence-numbered checksum updates with best-effort RESEND until
  * acked (:36-37 resendInterval throttle, :299 HandleAck), and
  * observes each node's heartbeat checksum state — a node
  * continuously non-MATCH for `warnAfterMs` warns, throttled to one
  * warning per `warnIntervalMs` (:29-34). Deterministic: the caller
  * supplies `nowMs`. */
final class NodeSetChecksumManager(resendIntervalMs: Long = 1000L,
                                   warnAfterMs: Long = 120000L,
                                   warnIntervalMs: Long = 120000L) {

  final case class Update(node: Int, seq: Long, checksum: SetChecksum)

  private final class NodeState {
    var seq: Long = 0L
    var ackedSeq: Long = 0L
    var checksum: SetChecksum = SetChecksum()
    var lastSendAt: Long = Long.MinValue
    // heartbeat observation
    var lastState: String = "match"
    var nonMatchSince: Long = -1L
    var lastWarnAt: Long = -1L
  }

  private val nodes = scala.collection.mutable.Map.empty[Int, NodeState]
  private val dirty = scala.collection.mutable.Set.empty[Int]
  private val owner = scala.collection.mutable.Map.empty[(Long, Long), Int]

  private def state(n: Int): NodeState =
    nodes.getOrElseUpdate(n, new NodeState)

  /** Assign a dispatcher id to a node; a previous owner (a move)
    * loses it — both sides go dirty. Invariant: an id lives in
    * exactly one node's checksum (:58-62). */
  def assign(idHigh: Long, idLow: Long, node: Int): Unit = {
    owner.get((idHigh, idLow)) match {
      case Some(prev) if prev == node => ()
      case Some(prev) =>
        val ps = state(prev)
        ps.checksum = ps.checksum.remove(idHigh, idLow)
        dirty += prev
        val ns = state(node)
        ns.checksum = ns.checksum.add(idHigh, idLow)
        dirty += node
        owner((idHigh, idLow)) = node
      case None =>
        val ns = state(node)
        ns.checksum = ns.checksum.add(idHigh, idLow)
        dirty += node
        owner((idHigh, idLow)) = node
    }
  }

  /** Remove a dispatcher id entirely (table dropped / feed removed). */
  def remove(idHigh: Long, idLow: Long): Unit =
    owner.remove((idHigh, idLow)).foreach { n =>
      val ns = state(n)
      ns.checksum = ns.checksum.remove(idHigh, idLow)
      dirty += n
    }

  def expected(node: Int): SetChecksum = state(node).checksum

  /** Updates due now: every dirty node gets a NEW sequence; an
    * unacked node past the resend throttle gets its latest again
    * (best-effort resend, :36-37, :299). */
  def collectUpdates(nowMs: Long): Seq[Update] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Update]
    dirty.toSeq.sorted.foreach { n =>
      val s = state(n)
      s.seq += 1
      s.lastSendAt = nowMs
      out += Update(n, s.seq, s.checksum)
    }
    dirty.clear()
    nodes.toSeq.sortBy(_._1).foreach { case (n, s) =>
      if (s.ackedSeq < s.seq && nowMs - s.lastSendAt >= resendIntervalMs &&
          !out.exists(_.node == n)) {
        s.lastSendAt = nowMs
        out += Update(n, s.seq, s.checksum)
      }
    }
    out.toSeq
  }

  /** A node acknowledged sequence `seq` (stale acks ignored). */
  def handleAck(node: Int, seq: Long): Unit = {
    val s = state(node)
    if (seq > s.ackedSeq && seq <= s.seq) s.ackedSeq = seq
  }

  /** Observe a node's heartbeat checksum state ("match" | "mismatch"
    * | "unknown" | …). Returns Some(duration) when a throttled
    * warning should fire: the node has been CONTINUOUSLY in one
    * non-match state for ≥ warnAfterMs and ≥ warnIntervalMs has
    * passed since the last warning (observeHeartbeat, :75-107). A
    * MATCH — or a transition between non-match states — resets the
    * clock; only an unbroken run of one state warns. */
  def observeHeartbeat(node: Int, hbState: String, nowMs: Long): Option[Long] = {
    val s = state(node)
    if (hbState == "match") {
      s.lastState = hbState; s.nonMatchSince = -1L; s.lastWarnAt = -1L
      None
    } else {
      if (s.lastState == "match" || s.lastState != hbState ||
          s.nonMatchSince < 0) {
        s.nonMatchSince = nowMs; s.lastWarnAt = -1L
      }
      s.lastState = hbState
      val duration = nowMs - s.nonMatchSince
      val shouldWarn = duration >= warnAfterMs &&
        (s.lastWarnAt < 0 || nowMs - s.lastWarnAt >= warnIntervalMs)
      if (shouldWarn) { s.lastWarnAt = nowMs; Some(duration) } else None
    }
  }
}
