package graft

import java.sql.{Connection, DriverManager, SQLException}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

import graft.sinks.{JdbcApplier, MysqlSink}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bank consistency workload — the single-driver analog of the
  * reference's flagship correctness test
  * (tests/integration_tests/bank/case.go): a seeded random transfer
  * workload over `accounts` (two-row UPDATE transactions that must
  * move money atomically, case.go:209-247) interleaved with a
  * gapless-sequence workload over `accounts_seq` (case.go:97-127),
  * replicated through the txn-atomic MySQL statement stream onto a
  * real JDBC engine, with the reference's two invariants checked at
  * every observable point:
  *
  *   - **sum(balance) is constant** at every committed snapshot
  *     (bankTest.verify, case.go:262-300 "Verify sum of balance
  *     always be the same")
  *   - **the sequence column has no gaps** — consecutive values differ
  *     by 0 or 1 (sequenceTest.verify, case.go:149-199 "Verify no
  *     missing transaction")
  *
  * The reference verifies downstream snapshots with
  * `set @@tidb_snapshot = endTs` where endTs comes from the syncpoint
  * ts-map; Derby has no time-travel reads, so the analog takes
  * SERIALIZABLE read transactions CONCURRENT with the writer — Derby's
  * serializable scans take table-level share locks, so every
  * observation is a true committed snapshot, making the concurrent
  * poller strictly stronger than a between-batches check (it can land
  * between any two txn frames, not just at syncpoint boundaries).
  *
  * The chaos variant kills the writer mid-statement-stream (including
  * MID-FRAME, between a txn's two UPDATEs) and replays the whole
  * chunk at-least-once — the bank-under-failover composition the
  * reference runs by restarting capture nodes under the workload. A
  * mid-frame kill must roll back (connection close without commit),
  * so the half-applied transfer is never visible.
  */
class BankSpec extends SparkFunSuite {

  import BankWorkload._

  private val Accounts = 16
  private val InitBalance = 1000L // case.go:84 initBalance
  private val Txns = 240

  // ---------------------------------------------------------------
  // fixture: seeded workload → envelope change-log + expected state
  // ---------------------------------------------------------------

  private lazy val workload: Workload = generate(seed = 42, Accounts, InitBalance, Txns)

  private def envelopeOf(rows: Seq[BankRow]): DataFrame = {
    import spark.implicits._
    val df = rows.toDF()
    df.select(
      col("rowId").as("_row_id"), lit("bank").as("_schema"),
      col("table").as("_table"), col("op").as("_op"),
      col("commitTs").as("_commit_ts"), col("txnStartTs").as("_start_ts"),
      when(col("op") === "I", lit(null)).otherwise(
        struct(col("id"), col("preBalance").as("balance"),
          col("preSeq").as("seq"), col("preStartts").as("startts"))).as("before"),
      struct(col("id"), col("balance"), col("seq"), col("startts")).as("after"))
  }

  private def newDb(name: String): JdbcApplier = {
    val a = JdbcApplier.inMemory(name)
    Seq("accounts", "accounts_seq").foreach { t =>
      a.createTable("bank", t,
        Seq("id" -> "BIGINT", "balance" -> "BIGINT",
          "seq" -> "BIGINT", "startts" -> "BIGINT"),
        Seq("id"))
    }
    a.ensureMetaTables()
    a
  }

  /** One SERIALIZABLE observation of both invariants. Returns None on
    * lock timeout / deadlock (the reference's verify retries on
    * retryable errors, case.go:197 retry.Do). */
  private def observe(url: String): Option[Observation] = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.setTransactionIsolation(Connection.TRANSACTION_SERIALIZABLE)
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      val rs1 = st.executeQuery("""SELECT SUM("balance"), COUNT(*) FROM "bank"."accounts"""")
      rs1.next()
      val sum = rs1.getLong(1); val n = rs1.getLong(2)
      val rs2 = st.executeQuery(
        """SELECT "seq" FROM "bank"."accounts_seq" WHERE "id" <> 0 ORDER BY "seq"""")
      val seqs = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (rs2.next()) seqs += rs2.getLong(1)
      conn.commit()
      Some(Observation(sum, n, seqs.toSeq))
    } catch {
      case e: SQLException if e.getSQLState == "40XL1" || e.getSQLState == "40001" =>
        try conn.rollback() catch { case _: SQLException => () }
        None
    } finally conn.close()
  }

  /** case.go:184-187: consecutive sequence values differ by 0 or 1
    * once rows have been touched (untouched rows keep seq = 0). */
  private def assertGapless(seqs: Seq[Long]): Unit = {
    val touched = seqs.dropWhile(_ == 0L)
    touched.zip(touched.drop(1)).foreach { case (prev, cur) =>
      assert(cur == prev || cur == prev + 1,
        s"missing sequence between $prev and $cur")
    }
  }

  private def assertFinalState(a: JdbcApplier, w: Workload): Unit = {
    val acct = a.tableRows("bank", "accounts", Seq("id", "balance"))
      .map(r => r(0).asInstanceOf[Number].longValue() ->
        r(1).asInstanceOf[Number].longValue()).toMap
    assert(acct == w.finalBalances, "downstream accounts diverge from the workload model")
    val seq = a.tableRows("bank", "accounts_seq", Seq("id", "seq"))
      .map(r => r(0).asInstanceOf[Number].longValue() ->
        r(1).asInstanceOf[Number].longValue()).toMap
    assert(seq == w.finalSeqs, "downstream accounts_seq diverges from the workload model")
  }

  /** Split on transaction boundaries into `parts` chunks — the
    * micro-batch/syncpoint cut points. */
  private def chunked(rows: Seq[BankRow], parts: Int): Seq[Seq[BankRow]] = {
    val byTxn = rows.groupBy(_.commitTs).toSeq.sortBy(_._1)
    val per = math.max(1, byTxn.size / parts)
    byTxn.grouped(per).map(_.flatMap(_._2)).toSeq
  }

  // ---------------------------------------------------------------

  test("bank: sum(balance) constant and sequence gapless at every concurrent snapshot") {
    val a = newDb("bank_live")
    val chunks = chunked(workload.rows, parts = 6)
    val done = new AtomicBoolean(false)
    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val clean = new AtomicInteger(0)

    val verifier = new Thread(() => {
      while (!done.get()) {
        observe(a.url).foreach { o =>
          if (o.nRows == Accounts && o.sum != Accounts * InitBalance)
            violations.add(s"sum=${o.sum} expected ${Accounts * InitBalance}")
          val touched = o.seqs.dropWhile(_ == 0L)
          touched.zip(touched.drop(1)).foreach { case (p, c) =>
            if (c != p && c != p + 1) violations.add(s"sequence gap $p -> $c")
          }
          clean.incrementAndGet()
        }
        Thread.sleep(2)
      }
    }, "bank-verifier")
    verifier.start()

    try {
      chunks.zipWithIndex.foreach { case (rows, i) =>
        MysqlSink.applyBatchTxnAtomic(envelopeOf(rows), safeMode = true,
          numWorkers = 2, handleKeys = Seq("id"))(JdbcApplier.executeFor(a.url))
        // syncpoint ts-map row at the chunk boundary (the ts the
        // reference's verify would snapshot-read at)
        val upTo = rows.map(_.commitTs).max
        a.execute(Iterator(MysqlSink.syncPointStatement("bank-cf", upTo, upTo + i)))
        // the between-batches check the reference runs via tidb_snapshot
        val o = observe(a.url).getOrElse(fail("boundary observation blocked"))
        assert(o.sum == Accounts * InitBalance, s"boundary $i sum=${o.sum}")
        assertGapless(o.seqs)
      }
    } finally {
      done.set(true)
      verifier.join(10000)
    }

    assert(violations.isEmpty, s"invariant violations: ${violations}")
    assert(clean.get() >= 6, s"verifier got only ${clean.get()} clean snapshots")
    assertFinalState(a, workload)
    // every chunk recorded its syncpoint
    assert(a.tableRows("tidb_cdc", "syncpoint_v1", Seq("primary_ts")).size == chunks.size)
  }

  test("bank under chaos: mid-frame kills roll back; at-least-once replay converges") {
    val a = newDb("bank_chaos")
    val chunks = chunked(workload.rows, parts = 6)
    val rng = new scala.util.Random(7)
    var crashes = 0

    chunks.zipWithIndex.foreach { case (rows, i) =>
      val env = envelopeOf(rows)
      // arm a kill at a random statement index — frames are ~4
      // statements (BEGIN,2×REPLACE,COMMIT), so this lands mid-frame
      // about half the time
      BankCrashSite.arm(rng.nextInt(rows.size + 4) + 1)
      var attempts = 0
      var appliedClean = false
      while (!appliedClean && attempts < 6) {
        attempts += 1
        try {
          MysqlSink.applyBatchTxnAtomic(env, safeMode = true,
            numWorkers = 2, handleKeys = Seq("id"))(BankCrashSite.executeFor(a.url))
          appliedClean = true
        } catch {
          case e: Exception if BankCrashSite.isCrash(e) =>
            crashes += 1
            // immediately after the kill: the half-applied frame must
            // have rolled back — sum invariant holds right now (no
            // rows at all is legal only while the seed-insert frame
            // itself was the one killed)
            val o = observe(a.url).getOrElse(fail("post-crash observation blocked"))
            assert(o.nRows == 0 || o.sum == Accounts * InitBalance,
              s"mid-frame kill leaked a partial transfer: sum=${o.sum} rows=${o.nRows}")
            assertGapless(o.seqs)
          // replay the SAME chunk from the top (at-least-once)
        }
      }
      assert(appliedClean, s"chunk $i never applied cleanly")
      val o = observe(a.url).getOrElse(fail("boundary observation blocked"))
      assert(o.sum == Accounts * InitBalance, s"boundary $i sum=${o.sum}")
      assertGapless(o.seqs)
    }

    assert(crashes >= 3, s"chaos schedule only produced $crashes crashes")
    assertFinalState(a, workload)
  }

  test("bank through the redo log: a dead sink recovers from the WAL alone " +
      "with both invariants intact (consistent_replicate × bank)") {
    import graft.sinks.{RedoApplier, RedoLog}
    val a = newDb("bank_redo")
    val chunks = chunked(workload.rows, parts = 6)
    val redo = java.nio.file.Files.createTempDirectory("graft-bank-redo").toString

    // log-ahead ordering: every chunk reaches the redo WAL first; the
    // sink dies for good after the fourth chunk
    chunks.zipWithIndex.foreach { case (rows, i) =>
      RedoLog.append(envelopeOf(rows), redo)
      if (i <= 3) {
        MysqlSink.applyBatchTxnAtomic(envelopeOf(rows), safeMode = true,
          numWorkers = 2, handleKeys = Seq("id"))(JdbcApplier.executeFor(a.url))
        RedoApplier.advanceCheckpoint(spark, redo, rows.map(_.commitTs).max)
      }
    }

    // at the crash point the applied prefix already satisfies both
    // invariants (txn frames land whole)
    val atCrash = observe(a.url).getOrElse(fail("observation blocked"))
    assert(atCrash.sum == Accounts * InitBalance)
    assertGapless(atCrash.seqs)

    // disaster recovery: the standalone applier replays the
    // (checkpoint, resolved] window as idempotent safe statements
    val (ck, rts) = RedoApplier.replayWindow(spark, redo)
    assert(ck == chunks(3).map(_.commitTs).max)
    assert(rts == workload.rows.map(_.commitTs).max)
    val stmts = RedoApplier.replayStatements(spark, redo,
      handleKeys = Seq("id"), numWorkers = 2)
      .orderBy(col("_apply_order"), col("_row_id"))
      .select("_stmt").collect().map(_.getString(0))
    a.execute(stmts.iterator)

    val recovered = observe(a.url).getOrElse(fail("observation blocked"))
    assert(recovered.sum == Accounts * InitBalance)
    assertGapless(recovered.seqs)
    assertFinalState(a, workload)

    // replaying the window AGAIN must be a no-op (safe-mode idempotence)
    a.execute(stmts.iterator)
    assertFinalState(a, workload)
  }
}

/** Pure workload model (no Spark): the reference's two testcases as a
  * deterministic transaction generator plus the expected final state
  * (the upstream TiDB the integration test diffs against). */
object BankWorkload {

  /** One change-log row. `table` ∈ accounts|accounts_seq; payload is
    * the unified (id, balance, seq, startts) shape — for accounts_seq
    * `balance` carries the reference's `counter` column. */
  case class BankRow(rowId: Long, table: String, op: String,
                     txnStartTs: Long, commitTs: Long,
                     id: Long, balance: Long, seq: Long, startts: Long,
                     preBalance: Long, preSeq: Long, preStartts: Long)

  case class Observation(sum: Long, nRows: Long, seqs: Seq[Long])

  case class Workload(rows: Seq[BankRow], finalBalances: Map[Long, Long],
                      finalSeqs: Map[Long, Long])

  def generate(seed: Int, accounts: Int, initBalance: Long, txns: Int): Workload = {
    val rng = new scala.util.Random(seed)
    val bal = scala.collection.mutable.Map((0 until accounts).map(i => i.toLong -> initBalance): _*)
    val balSeq = scala.collection.mutable.Map((0 until accounts).map(i => i.toLong -> 0L): _*)
    val balTs = scala.collection.mutable.Map((0 until accounts).map(i => i.toLong -> 0L): _*)
    // accounts_seq state: balance column = counter, seq column = sequence
    val sqCnt = scala.collection.mutable.Map((0 until accounts).map(i => i.toLong -> 0L): _*)
    val sqSeq = scala.collection.mutable.Map((0 until accounts).map(i => i.toLong -> 0L): _*)
    val sqTs = scala.collection.mutable.Map((0 until accounts).map(i => i.toLong -> 0L): _*)
    var counter = 0L
    var maxSeq = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[BankRow]
    var rowId = 0L
    def add(r: BankRow): Unit = { out += r; rowId += 1 }

    // seed transactions: one initial-insert txn per table (the
    // prepare step, case.go:128-147)
    val t0 = 1000000L
    (0 until accounts).foreach { i =>
      add(BankRow(rowId, "accounts", "I", t0 - 5, t0, i.toLong, initBalance, 0L, 0L, 0L, 0L, 0L))
      add(BankRow(rowId, "accounts_seq", "I", t0 - 5, t0, i.toLong, 0L, 0L, 0L, 0L, 0L, 0L))
    }

    (1 to txns).foreach { t =>
      val commitTs = t0 + t * 10L
      val startTs = commitTs - 5L
      if (t % 3 == 0) {
        // sequenceTest.workload (case.go:97-127): bump row 0's counter
        // and stamp rows {0, next} with sequence = maxSeq+1
        var next = counter % accounts
        if (next == 0L) { next = 1L; counter += 1 }
        counter += 1
        maxSeq += 1
        Seq(0L, next).foreach { id =>
          add(BankRow(rowId, "accounts_seq", "U", startTs, commitTs,
            id, counter, maxSeq, startTs, sqCnt(id), sqSeq(id), sqTs(id)))
          sqCnt(id) = counter; sqSeq(id) = maxSeq; sqTs(id) = startTs
        }
      } else {
        // bankTest.workload (case.go:209-247): random transfer
        var from = rng.nextInt(accounts).toLong
        var to = rng.nextInt(accounts).toLong
        while (from == to) { to = rng.nextInt(accounts).toLong }
        val amount = rng.nextInt((bal(from) / 2 + 1).toInt).toLong
        Seq(from -> (bal(from) - amount), to -> (bal(to) + amount)).foreach {
          case (id, newBal) =>
            add(BankRow(rowId, "accounts", "U", startTs, commitTs,
              id, newBal, t.toLong, startTs, bal(id), balSeq(id), balTs(id)))
            bal(id) = newBal; balSeq(id) = t.toLong; balTs(id) = startTs
        }
      }
    }
    Workload(out.toSeq, bal.toMap, sqSeq.toMap)
  }
}

/** Serializable crash injector for the chaos test — a static site so
  * executor threads (same JVM in local mode) share the countdown, the
  * statement-stream analog of the reference killing a capture process
  * at an arbitrary point. */
object BankCrashSite {
  private val remaining = new AtomicLong(Long.MaxValue)

  def arm(afterStatements: Long): Unit = remaining.set(afterStatements)

  def isCrash(e: Throwable): Boolean = {
    var c: Throwable = e
    while (c != null) {
      if (c.getMessage != null && c.getMessage.contains("bank-crash")) return true
      c = c.getCause
    }
    false
  }

  /** Like [[JdbcApplier.executeFor]] but decrements the shared fuse
    * per statement and throws once it reaches zero. */
  def executeFor(url: String): Iterator[String] => Unit = {
    val u = url
    (it: Iterator[String]) => {
      val counted = it.map { s =>
        if (remaining.decrementAndGet() == 0L)
          throw new RuntimeException("bank-crash: injected writer kill")
        s
      }
      JdbcApplier.forUrl(u).execute(counted)
    }
  }
}
