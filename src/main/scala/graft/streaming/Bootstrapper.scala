package graft.streaming

import scala.collection.mutable

/** Simple-protocol bootstrap re-send cadence (reference
  * pkg/sink/codec/bootstraper.go + pkg/config/sink.go:191-200).
  *
  * A consumer joining an MQ topic mid-stream can only decode
  * simple-protocol rows after seeing the table's BOOTSTRAP handshake,
  * so the producer re-sends each active table's schema message once
  * either cadence knob trips:
  *   - the interval since the table's last handshake elapses, or
  *   - `msgCount` row messages have gone out for it since the last one
  * (tableStatistic.shouldSendBootstrapMsg). A table's FIRST appearance
  * sends immediately (bootstraper.go addEvent), and a table inactive
  * past `maxInactiveMs` is forgotten (gcInactiveTables) so a later
  * reappearance handshakes immediately again. Either knob ≤ 0 disables
  * re-sending entirely (the reference's negative-disables rule, and
  * the worker is only built for the simple protocol).
  *
  * Driver-side state only: the decision needs per-table counts, which
  * the micro-batch loop supplies as one small aggregate per trigger —
  * table-count-sized, never row-scaled.
  */
final class Bootstrapper(intervalSec: Long, msgCount: Int,
                         maxInactiveMs: Long = 30L * 60L * 1000L) {

  def enabled: Boolean = intervalSec > 0 && msgCount > 0

  private final class TableState(var lastSentMs: Long) {
    var rowsSinceSent: Long = 0L
    var lastSeenMs: Long = 0L
    /** Schema version the LAST handshake carried
      * (tableStatistic.version, bootstraper.go:259). */
    var version: Long = 0L
  }
  private val tables = mutable.Map.empty[(String, String), TableState]

  /** Fold one micro-batch's per-table row counts; returns the tables
    * whose handshake must be (re-)sent now, sorted for determinism.
    * `versions` carries each table's CURRENT schema version when the
    * feed has an evolving store — a version change re-sends the
    * handshake immediately, regardless of the cadence windows
    * (bootstraper.go:259 `t.version.Load() != row.TableInfo
    * .GetUpdateTS()`), so a consumer sees the new shape within the
    * batch the DDL lands in. */
  def onBatch(counts: Seq[((String, String), Long)],
              nowMs: Long,
              versions: Map[(String, String), Long] = Map.empty)
      : Seq[(String, String)] = {
    if (!enabled) return Nil
    // forget tables with no traffic for maxInactiveDuration
    tables.filterInPlace { case (_, st) =>
      nowMs - st.lastSeenMs <= maxInactiveMs
    }
    val due = mutable.ArrayBuffer.empty[(String, String)]
    counts.foreach { case (key, n) =>
      tables.get(key) match {
        case None =>
          // first appearance: handshake immediately
          val st = new TableState(lastSentMs = nowMs)
          st.lastSeenMs = nowMs
          st.version = versions.getOrElse(key, 0L)
          tables(key) = st
          due += key
        case Some(st) =>
          st.lastSeenMs = nowMs
          st.rowsSinceSent += n
          val v = versions.getOrElse(key, st.version)
          if (v != st.version ||
              nowMs - st.lastSentMs >= intervalSec * 1000L ||
              st.rowsSinceSent >= msgCount) {
            st.lastSentMs = nowMs
            st.rowsSinceSent = 0L
            st.version = v
            due += key
          }
      }
    }
    due.sorted.toSeq
  }

  /** Pre-register tables at changefeed start
    * (send-all-bootstrap-at-start): all handshake immediately on their
    * first [[onBatch]] regardless of traffic — achieved by feeding a
    * zero-count batch. */
  def bootstrapAll(allTables: Seq[(String, String)],
                   nowMs: Long): Seq[(String, String)] =
    onBatch(allTables.map(_ -> 0L), nowMs)
}
