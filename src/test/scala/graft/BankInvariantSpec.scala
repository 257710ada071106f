package graft

import org.apache.spark.sql.functions._
import graft.operators.Materialize

/** The reference's bank workload (tests/integration_tests/bank/
  * case.go:248-253; SURVEY §5.3): concurrent balanced transfers, and
  * at every consistency cut the balance sum must be invariant.
  * Here: deterministic transfer log → envelope → materialize at
  * several resolved-ts cuts → SUM(balance) constant.
  */
class BankInvariantSpec extends SparkFunSuite {

  private val nAccounts = 20
  private val initBalance = 1000L
  private val nTransfers = 500

  /** Build the change log: inserts at t0, then balanced transfer txns
    * (debit+credit share one commit-ts = atomic txn). */
  private def changeLog() = {
    import spark.implicits._
    val balances = Array.fill(nAccounts)(initBalance)
    val base = 1000000000000L
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String, Long, Double, Long, Long)]()
    // (rowId, op, userId=account, value=balance, k=seq, commitTs)
    for (a <- 0 until nAccounts)
      rows += ((a.toLong, "I", a.toLong, initBalance.toDouble, 0L, base + a))
    var rid = nAccounts.toLong
    for (i <- 0 until nTransfers) {
      val from = (i * 7 + (i / 3)) % nAccounts
      val to = (from + 1 + i % (nAccounts - 1)) % nAccounts
      val amount = 1L + (i % 50)
      val commit = base + 1000L + i
      balances(from) -= amount
      balances(to) += amount
      rows += ((rid, "U", from.toLong, balances(from).toDouble, (i + 1).toLong, commit)); rid += 1
      rows += ((rid, "U", to.toLong, balances(to).toDouble, (i + 1).toLong, commit)); rid += 1
    }
    val df = rows.toSeq.toDF("_row_id", "_op", "user_id", "value", "k", "_commit_ts")
    val img = struct(col("user_id"), col("value"), col("k"))
    df.select(
      col("_row_id"), lit("bank").as("_schema"), lit("accounts").as("_table"),
      col("_op"), col("_commit_ts"), (col("_commit_ts") - 1L).as("_start_ts"),
      when(col("_op") === "I", lit(null)).otherwise(img).as("before"),
      img.as("after"))
  }

  test("balance sum is invariant at every consistency cut") {
    val log = changeLog()
    val cuts = Seq(1000000000000L + nAccounts, // after inserts
      1000000001000L + 100, 1000000001000L + 333, Long.MaxValue)
    cuts.foreach { cut =>
      val state = Materialize.tableState(log.filter(col("_commit_ts") <= cut))
      val total = state.agg(sum(col("value"))).head().getDouble(0)
      assert(total == nAccounts * initBalance.toDouble,
        s"sum invariant broken at cut $cut: $total")
      assert(state.count() == nAccounts)
    }
  }

  test("replaying the log is idempotent (safe-mode REPLACE semantics)") {
    val log = changeLog()
    val once = Materialize.tableState(log)
      .orderBy("user_id").collect().map(_.toString).toSeq
    val twice = Materialize.tableState(log.unionByName(log))
      .orderBy("user_id").collect().map(_.toString).toSeq
    assert(once == twice, "at-least-once delivery + LWW apply = same state")
  }

  test("per-account sequence is monotone in applied order") {
    val log = changeLog()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("after.user_id")).orderBy(col("_commit_ts"))
    val bad = log.filter(col("_op") === "U")
      .withColumn("prev_seq", lag(col("after.k"), 1).over(w))
      .filter(col("prev_seq").isNotNull && col("after.k") < col("prev_seq"))
    assert(bad.count() == 0)
  }
}
