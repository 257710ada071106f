package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{FeedBackoff, FeedError, FeedState}

/** The coordinator's error-retry machine (backoff.go semantics):
  * deterministic transitions under an injected clock. */
class FeedBackoffSpec extends AnyFunSuite {

  private val err = FeedError("CDC:ErrMySQLTxnError", "deadlock")

  test("errors with a stuck checkpoint: warning + exponential 10s..10min schedule") {
    val b = new FeedBackoff()
    var now = 1000000L
    assert(b.checkStatus(5L, Nil, now) == FeedState.Normal)
    assert(b.shouldRun(now))
    // first error: warning, next retry 10s out
    assert(b.checkStatus(5L, Seq(err), now) == FeedState.Warning)
    assert(!b.shouldRun(now + 9999))
    assert(b.shouldRun(now + 10000))
    // still stuck: interval doubles 20s, 40s, ... capped at 10min
    now += 10000
    assert(b.checkStatus(5L, Seq(err), now) == FeedState.Warning)
    assert(!b.shouldRun(now + 19999) && b.shouldRun(now + 20000))
    now += 20000
    assert(b.checkStatus(5L, Seq(err), now) == FeedState.Warning)
    assert(!b.shouldRun(now + 39999) && b.shouldRun(now + 40000))
    for (_ <- 0 until 10) { now += 1000; b.checkStatus(5L, Seq(err), now) }
    assert(!b.shouldRun(now + 599999) && b.shouldRun(now + 600000),
      "interval caps at 10min")
    assert(b.lastError.contains(err))
  }

  test("checkpoint advance while retrying recovers to normal and resets the schedule") {
    val b = new FeedBackoff()
    val now = 1000000L
    b.checkStatus(5L, Seq(err), now)
    b.checkStatus(5L, Seq(err), now + 10000)
    assert(b.checkStatus(6L, Nil, now + 15000) == FeedState.Normal)
    assert(b.shouldRun(now + 15000), "recovery clears the backoff gate")
    // next error starts the schedule over at 10s, not where it left off
    assert(b.checkStatus(6L, Seq(err), now + 20000) == FeedState.Warning)
    assert(b.shouldRun(now + 30000) && !b.shouldRun(now + 29999))
  }

  test("fast-fail code fails immediately; stuck past maxElapsed fails; resume resets") {
    val gc = FeedError("CDC:ErrSnapshotLostByGC", "gc'd")
    val b = new FeedBackoff()
    assert(b.checkStatus(5L, Seq(err, gc), 1000L) == FeedState.Failed)
    assert(!b.shouldRun(Long.MaxValue), "failed feeds never self-restart")
    assert(b.lastError.contains(gc), "the fast-fail error is surfaced")
    // even a checkpoint advance does not un-fail
    assert(b.checkStatus(99L, Nil, 2000L) == FeedState.Failed)
    b.resetRetry()
    assert(b.shouldRun(3000L) && b.checkStatus(99L, Nil, 3000L) == FeedState.Normal)

    val b2 = new FeedBackoff(maxElapsedMs = 60000L)
    var now = 0L
    assert(b2.checkStatus(5L, Nil, now) == FeedState.Normal) // checkpoint baseline
    assert(b2.checkStatus(5L, Seq(err), now) == FeedState.Warning)
    now += 30000
    assert(b2.checkStatus(5L, Seq(err), now) == FeedState.Warning)
    now += 31000 // 61s since the retry sequence began
    assert(b2.checkStatus(5L, Seq(err), now) == FeedState.Failed,
      "stuck longer than changefeed-error-stuck-duration fails the feed")
  }
}
