package graft.streaming

/** Changefeed error states (reference config.FeedState: normal /
  * warning / failed are the transitions the retry machine owns). */
sealed trait FeedState
object FeedState {
  case object Normal extends FeedState
  case object Warning extends FeedState
  case object Failed extends FeedState
  /** Checkpoint reached target-ts: clean terminal state (no retry,
    * no GC block). */
  case object Finished extends FeedState
}

/** A reported running error: RFC-style code + message (reference
  * heartbeatpb.RunningError). */
final case class FeedError(code: String, message: String)

/** Changefeed error-retry state machine — the coordinator's Backoff
  * (reference coordinator/changefeed/backoff.go:29-119,:214-265 and
  * pkg/errors/helper.go:67-129):
  *
  *  - errors while the checkpoint is stuck put the feed in WARNING
  *    and schedule a restart after an exponential backoff interval
  *    (10s → 10min, ×2 per attempt);
  *  - a fast-fail / unretryable error code fails the feed
  *    immediately (GC-lost data can never be replicated — retrying
  *    is pointless);
  *  - a retry sequence that has been stuck longer than
  *    `maxElapsedMs` (changefeed-error-stuck-duration, default
  *    30min) fails the feed;
  *  - the moment the checkpoint advances while retrying, the feed
  *    recovers to NORMAL and the backoff fully resets;
  *  - a failed feed only runs again after an explicit resume
  *    ([[resetRetry]]), mirroring the reference's resume path.
  *
  * The clock is always a parameter, so every transition is
  * deterministic and spec-able (the reference adds a 0.1
  * randomization factor purely against thundering herds — scheduling
  * noise, not semantics).
  */
final class FeedBackoff(
    initialMs: Long = 10000L,
    maxIntervalMs: Long = 600000L,
    multiplier: Double = 2.0,
    maxElapsedMs: Long = 1800000L,
    fastFailCodes: Set[String] = FeedBackoff.defaultFastFailCodes) {

  private var checkpointTs: Long = 0L
  private var retrying: Boolean = false
  private var failed: Boolean = false
  private var nextRetryAtMs: Long = Long.MinValue
  private var currentIntervalMs: Long = initialMs
  private var retryStartMs: Long = 0L
  private var lastErr: Option[FeedError] = None

  /** Scheduling gate: a failed feed never runs; a warning feed runs
    * only once its backoff interval has elapsed. */
  def shouldRun(nowMs: Long): Boolean = synchronized {
    !failed && nowMs >= nextRetryAtMs
  }

  def lastError: Option[FeedError] = synchronized(lastErr)

  /** Fold one status report (checkpoint + errors since the last
    * report) into the machine and return the feed state. */
  def checkStatus(ckptTs: Long, errs: Seq[FeedError], nowMs: Long): FeedState =
    synchronized {
      val fastFail = errs.find(e => fastFailCodes.contains(e.code))
      if (failed) FeedState.Failed
      else if (fastFail.isDefined) {
        failed = true
        lastErr = fastFail
        FeedState.Failed
      } else if (ckptTs > checkpointTs) {
        // progress: a retrying feed recovers and the backoff resets
        checkpointTs = ckptTs
        if (retrying) resetRetry()
        FeedState.Normal
      } else if (errs.isEmpty) FeedState.Normal
      else {
        // checkpoint stuck + errors: schedule the next restart
        if (!retrying) {
          resetRetry()
          retrying = true
          retryStartMs = nowMs
        }
        lastErr = Some(errs.last)
        if (nowMs - retryStartMs > maxElapsedMs) {
          failed = true
          FeedState.Failed
        } else {
          nextRetryAtMs = nowMs + currentIntervalMs
          currentIntervalMs =
            math.min((currentIntervalMs * multiplier).toLong, maxIntervalMs)
          FeedState.Warning
        }
      }
    }

  /** Full reset — the resume path (reference resetErrRetry, called
    * when a feed is resumed or recovers). */
  def resetRetry(): Unit = synchronized {
    retrying = false
    failed = false
    nextRetryAtMs = Long.MinValue
    currentIntervalMs = initialMs
    lastErr = None
  }
}

object FeedBackoff {
  /** GC-caused fast-fail codes (ChangeFeedGCFastFailError,
    * pkg/errors/helper.go:71-73): the wanted data no longer exists
    * upstream — these feeds also stop blocking the GC safepoint. */
  val gcFastFailCodes: Set[String] = Set(
    "CDC:ErrGCTTLExceeded", "CDC:ErrSnapshotLostByGC", "CDC:ErrStartTsBeforeGC")

  /** The unretryable set (pkg/errors/helper.go:71-73,:104-128): GC
    * already ate the data, or the config/expression can never work —
    * retrying cannot help, fail immediately. */
  val defaultFastFailCodes: Set[String] = gcFastFailCodes ++ Set(
    "CDC:ErrExpressionColumnNotFound", "CDC:ErrExpressionParseFailed",
    "CDC:ErrSchemaSnapshotNotFound", "CDC:ErrSyncRenameTableFailed",
    "CDC:ErrChangefeedUnretryable", "CDC:ErrCorruptedDataMutation",
    "CDC:ErrSinkURIInvalid", "CDC:ErrKafkaInvalidConfig",
    "CDC:ErrMySQLInvalidConfig", "CDC:ErrStorageSinkInvalidConfig",
    "CDC:ErrInvalidTableRoutingRule", "CDC:ErrTableRoutingFailed",
    "CDC:ErrTableRouteConflict")
}
