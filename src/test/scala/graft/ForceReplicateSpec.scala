package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Transforms
import graft.sinks.{JdbcApplier, MysqlSink}

/** Force-replicate: tables with no PK and no not-null unique key
  * (tests/integration_tests/force_replicate_table; whereSlice's
  * no-row-id fallback, pkg/sink/mysql/sql_builder.go:388-413). The
  * WHERE covers ALL columns and every DML carries LIMIT 1 — a delete
  * must remove at most ONE of several identical rows, which is the
  * whole reason MySQL DML-LIMIT semantics are load-bearing here. The
  * JDBC tests run the statements on real Derby through the applier's
  * updatable-cursor emulation of DELETE .. LIMIT 1. */
class ForceReplicateSpec extends SparkFunSuite {

  private val payload = StructType(Seq(
    StructField("id", LongType), StructField("a", LongType)))
  private val envSchema = StructType(Seq(
    StructField("_row_id", LongType, nullable = false),
    StructField("_schema", StringType, nullable = false),
    StructField("_table", StringType, nullable = false),
    StructField("_op", StringType, nullable = false),
    StructField("_commit_ts", LongType, nullable = false),
    StructField("_start_ts", LongType, nullable = false),
    StructField("before", payload), StructField("after", payload)))

  /** (rowId, op, before(id,a), after(id,a)) on the no-PK table. */
  private def mkEnv(rows: Seq[(Long, String, Option[(Any, Any)], Option[(Any, Any)])]): DataFrame = {
    val rws = rows.map { case (rid, op, b, a) =>
      def img(o: Option[(Any, Any)]): Row =
        o.map { case (x, y) => Row(x, y) }.orNull
      Row(rid, "app", "nopk", op, 1000L + rid, 999L + rid, img(b), img(a))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rws, 1), envSchema)
  }

  private def statementsOf(env: DataFrame): Seq[String] = {
    val split = Transforms.updateSplit(env, Seq("id", "a"))
    MysqlSink.statements(split, Seq.empty, 1, safeMode = false)
      .orderBy(col("_commit_ts"), graft.model.Envelope.opOrder(col("_op")),
        col("_row_id"))
      .select(col("_stmt")).collect().map(_.getString(0)).toSeq
  }

  test("no-PK statements: all-column WHERE + LIMIT 1, updates pre-split") {
    val stmts = statementsOf(mkEnv(Seq(
      (1L, "I", None, Some((1L, 1L))),
      (2L, "U", Some((1L, 1L)), Some((2L, 5L))),
      (3L, "D", Some((2L, 5L)), None),
      (4L, "I", None, Some((null, 7L))))))
    assert(stmts == Seq(
      "INSERT INTO `app`.`nopk` (`id`,`a`) VALUES (1,1)",
      // the update split into delete-old-row + insert-new-row
      "DELETE FROM `app`.`nopk` WHERE `id` = 1 AND `a` = 1 LIMIT 1",
      "INSERT INTO `app`.`nopk` (`id`,`a`) VALUES (2,5)",
      "DELETE FROM `app`.`nopk` WHERE `id` = 2 AND `a` = 5 LIMIT 1",
      // NULL columns render as NULL / IS NULL, not '= NULL'
      "INSERT INTO `app`.`nopk` (`id`,`a`) VALUES (NULL,7)"))
    // a delete of the NULL-column row WHEREs with IS NULL
    val delNull = statementsOf(mkEnv(Seq(
      (5L, "D", Some((null, 7L)), None))))
    assert(delNull == Seq(
      "DELETE FROM `app`.`nopk` WHERE `id` IS NULL AND `a` = 7 LIMIT 1"))
  }

  test("no-PK partition assignment is table-serial (hash of schema+table only)") {
    val env = mkEnv(Seq(
      (1L, "I", None, Some((1L, 1L))),
      (2L, "I", None, Some((2L, 2L))),
      (3L, "D", Some((1L, 1L)), None)))
    val parts = MysqlSink.statements(env, Seq.empty, 8, safeMode = false)
      .select(col("_partition")).distinct().collect().map(_.getLong(0)).toSeq
    assert(parts.size == 1, s"all rows of one no-PK table must share a partition: $parts")
  }

  private def newDb(name: String): JdbcApplier = {
    val a = JdbcApplier.inMemory(name)
    // no-PK table: empty pk registration (force-replicate shape)
    a.createTable("app", "nopk", Seq("id" -> "BIGINT", "a" -> "BIGINT"), Seq.empty)
    a
  }

  private def rowsOf(a: JdbcApplier): Seq[Seq[Any]] =
    a.tableRows("app", "nopk", Seq("id", "a"))

  test("DELETE LIMIT 1 on Derby removes exactly one of several identical rows") {
    val a = newDb("fr_dup")
    val env = mkEnv(Seq(
      (1L, "I", None, Some((1L, 1L))),
      (2L, "I", None, Some((1L, 1L))), // identical duplicate
      (3L, "D", Some((1L, 1L)), None))) // must kill ONE, not both
    MysqlSink.applyBatch(env, Seq.empty, 1, safeMode = false)(
      JdbcApplier.executeFor(a.url))
    assert(rowsOf(a) == Seq(Seq(1, 1)),
      "one duplicate must survive the LIMIT 1 delete")
  }

  test("no-PK update converges through the split: full I/U/D stream on real JDBC") {
    val a = newDb("fr_conv")
    val env = mkEnv(Seq(
      (1L, "I", None, Some((1L, 1L))),
      (2L, "I", None, Some((1L, 1L))),
      (3L, "U", Some((1L, 1L)), Some((9L, 9L))), // split: D one dup + I new
      (4L, "D", Some((1L, 1L)), None),           // kills the other dup
      (5L, "I", None, Some((null, 7L))),
      (6L, "I", None, Some((null, 7L))),
      (7L, "D", Some((null, 7L)), None)))        // IS NULL predicate path
    val split = Transforms.updateSplit(env, Seq("id", "a"))
    MysqlSink.applyBatch(split, Seq.empty, 1, safeMode = false)(
      JdbcApplier.executeFor(a.url))
    assert(rowsOf(a).map(_.map(String.valueOf)).sortBy(_.toString) ==
      Seq(Seq("9", "9"), Seq("null", "7")).sortBy(_.toString),
      s"got ${rowsOf(a)}")
  }

  test("safe-mode REPLACE on a keyless table degrades to plain INSERT (MySQL semantics)") {
    val a = newDb("fr_replace")
    a.execute(Iterator(
      "REPLACE INTO `app`.`nopk` (`id`,`a`) VALUES (3,3)",
      "REPLACE INTO `app`.`nopk` (`id`,`a`) VALUES (3,3)"))
    // nothing can conflict without a key: duplicates accumulate,
    // exactly as MySQL REPLACE behaves on an unkeyed table
    assert(rowsOf(a) == Seq(Seq(3, 3), Seq(3, 3)))
  }

  test("keyed deletes keep identical semantics through the cursor path") {
    val a = JdbcApplier.inMemory("fr_keyed")
    a.createTable("app", "keyed", Seq("id" -> "BIGINT", "a" -> "BIGINT"), Seq("id"))
    a.execute(Iterator(
      "INSERT INTO `app`.`keyed` (`id`,`a`) VALUES (1,1)",
      "INSERT INTO `app`.`keyed` (`id`,`a`) VALUES (2,2)",
      "DELETE FROM `app`.`keyed` WHERE `id` = 1 LIMIT 1"))
    assert(a.tableRows("app", "keyed", Seq("id", "a")) == Seq(Seq(2, 2)))
  }
}
