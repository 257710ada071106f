package graft

import graft.model.MySqlDdl
import graft.operators.Transforms
import graft.sinks.{JdbcApplier, MysqlSink}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The many_pk_or_uk scenario (tests/integration_tests/many_pk_or_uk/
  * main.go:40-117): every integer type family × {PRIMARY KEY, UNIQUE
  * NOT NULL} as the table's only column, driven at its BOUNDARY values
  * (u64 max, i64 min/max, …) through insert → key-changing update →
  * delete, replicated and diffed. The key-changing update is the
  * point: the single column IS the handle key, so the update must
  * split into delete-before-insert
  * (Transforms.updateSplit, the reference's split-update rule) or the
  * downstream UPDATE would strand the old key's row.
  *
  * Asserts, per case: handle-key selection picks the column (pk, or
  * the not-null UK when no pk — table_info_helper.go:660-732),
  * eligibility, the boundary value survives the statement render →
  * real-JDBC execution round trip (u64 max via the DECIMAL(20,0)
  * unsigned-bigint convention), and the final state after the delete
  * is empty with the intermediate states correct.
  */
class ManyPkUkSpec extends SparkFunSuite {

  /** (mysql type, spark payload type, derby column type,
    *  boundary value, updated value) — main.go:45-85's matrix. */
  private val cases: Seq[(String, DataType, String, Any, Any)] = Seq(
    ("bigint unsigned", DecimalType(20, 0), "DECIMAL(20,0)",
      new java.math.BigDecimal("18446744073709551615"),
      new java.math.BigDecimal("18446744073709551614")),
    ("bigint", LongType, "BIGINT", Long.MaxValue, Long.MinValue),
    ("int unsigned", LongType, "BIGINT", 4294967295L, 4294967294L),
    ("int", LongType, "BIGINT", Int.MaxValue.toLong, Int.MinValue.toLong),
    ("smallint unsigned", LongType, "BIGINT", 65535L, 65534L),
    ("smallint", LongType, "BIGINT", 32767L, -32768L),
    ("tinyint unsigned", LongType, "BIGINT", 255L, 254L),
    ("tinyint", LongType, "BIGINT", 127L, 126L))

  private val keyKinds = Seq("PRIMARY KEY", "UNIQUE NOT NULL")

  private def envelopeFor(table: String, dt: DataType,
                          value: Any, update: Any): DataFrame = {
    val payload = StructType(Seq(StructField("id", dt)))
    val schema = StructType(Seq(
      StructField("_row_id", LongType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_op", StringType),
      StructField("_commit_ts", LongType), StructField("_start_ts", LongType),
      StructField("before", payload), StructField("after", payload)))
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row(1L, "test", table, "I", 100L, 99L, null, Row(value)),
      Row(2L, "test", table, "U", 200L, 199L, Row(value), Row(update)),
      Row(3L, "test", table, "D", 300L, 299L, Row(update), null))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  test("handle-key selection and eligibility across the pk/uk matrix") {
    cases.zipWithIndex.foreach { case ((tp, _, _, _, _), i) =>
      keyKinds.zipWithIndex.foreach { case (kind, j) =>
        val ddl = s"CREATE TABLE pk_or_uk_${i}_$j(id ${tp.toUpperCase} $kind)"
        val t = MySqlDdl.parseCreateTable(ddl).getOrElse(fail(s"unparsed: $ddl"))
        assert(t.eligible, s"$ddl must be eligible")
        assert(t.handleKeys == Seq("id"), s"$ddl handle keys: ${t.handleKeys}")
        assert(t.pkIsHandle == (kind == "PRIMARY KEY"), ddl)
      }
    }
  }

  test("boundary values survive insert → key-changing update (split) → delete " +
      "on a real engine") {
    cases.zipWithIndex.foreach { case ((tp, dt, derbyType, value, update), i) =>
      val table = s"pk_or_uk_$i"
      val a = JdbcApplier.inMemory(s"manypk_$i")
      a.createTable("test", table, Seq("id" -> derbyType), Seq("id"))

      val env = envelopeFor(table, dt, value, update)
      // the split rule: an update whose key image changes becomes
      // delete(old key) + insert(new key)
      val split = Transforms.updateSplit(env, Seq("id"))
      val ops = split.orderBy("_commit_ts", "_op").select("_op")
        .collect().map(_.getString(0)).toSeq
      assert(ops == Seq("I", "D", "I", "D"),
        s"$tp: key-changing update must split, got $ops")

      // phase 1: insert + split update → exactly the updated key present
      val phase1 = split.filter(col("_commit_ts") <= 200L)
      MysqlSink.applyBatch(phase1, Seq("id"), numWorkers = 1, safeMode = false)(
        JdbcApplier.executeFor(a.url))
      val mid = a.tableRows("test", table, Seq("id"))
      assert(mid.size == 1, s"$tp: expected one row after update, got $mid")
      val got = mid.head.head
      val expected = update match {
        case d: java.math.BigDecimal => d
        case l: Long => l
      }
      assert(got.asInstanceOf[Number].toString ==
        (expected match {
          case d: java.math.BigDecimal => d.toPlainString
          case other => other.toString
        }), s"$tp: boundary value mangled: $got")

      // phase 2: delete → empty
      MysqlSink.applyBatch(split.filter(col("_commit_ts") > 200L),
        Seq("id"), numWorkers = 1, safeMode = false)(JdbcApplier.executeFor(a.url))
      assert(a.tableRows("test", table, Seq("id")).isEmpty, s"$tp: delete missed")
    }
  }

  test("safe-mode replay of the whole split stream is idempotent per case") {
    val (tp, dt, derbyType, value, update) = cases.head // u64-max worst case
    val a = JdbcApplier.inMemory("manypk_replay")
    a.createTable("test", "t", Seq("id" -> derbyType), Seq("id"))
    val split = Transforms.updateSplit(envelopeFor("t", dt, value, update), Seq("id"))
    // apply twice — at-least-once replay must converge to the same end
    (1 to 2).foreach { _ =>
      MysqlSink.applyBatch(split, Seq("id"), numWorkers = 1, safeMode = true)(
        JdbcApplier.executeFor(a.url))
    }
    assert(a.tableRows("test", "t", Seq("id")).isEmpty, s"$tp replay diverged")
  }
}
