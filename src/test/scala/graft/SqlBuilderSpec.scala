// SqlBuilder + MysqlSink statement-shape unit tests (fixtures-as-SQL
// style, SURVEY §5.1)
package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.SqlBuilder._

/** Mirrors the shapes of the reference's sql_builder_test.go. */
class SqlBuilderSpec extends AnyFunSuite {

  test("insert and replace") {
    assert(insert("db", "t", Seq("a", "b"), Seq(1, "x"), replace = false) ==
      "INSERT INTO `db`.`t` (`a`,`b`) VALUES (1,'x')")
    assert(insert("db", "t", Seq("a"), Seq(null), replace = true) ==
      "REPLACE INTO `db`.`t` (`a`) VALUES (NULL)")
  }

  test("multi-row insert batches same-shape ops") {
    assert(insertMulti("db", "t", Seq("a"), Seq(Seq(1), Seq(2)), replace = true) ==
      "REPLACE INTO `db`.`t` (`a`) VALUES (1),(2)")
  }

  test("upsert emits ON DUPLICATE KEY UPDATE") {
    val sql = upsert("db", "t", Seq("a", "b"), Seq(1, 2))
    assert(sql.contains("ON DUPLICATE KEY UPDATE `a`=VALUES(`a`),`b`=VALUES(`b`)"))
  }

  test("delete is null-safe on keys") {
    assert(delete("db", "t", Seq("k1", "k2"), Seq(5, null)) ==
      "DELETE FROM `db`.`t` WHERE `k1` = 5 AND `k2` IS NULL")
  }

  test("batched delete uses tuple IN") {
    assert(deleteMulti("db", "t", Seq("k"), Seq(Seq(1), Seq(2))) ==
      "DELETE FROM `db`.`t` WHERE (`k`) IN ((1),(2))")
  }

  test("update with where key") {
    assert(update("db", "t", Seq("v"), Seq(9), Seq("k"), Seq(1)) ==
      "UPDATE `db`.`t` SET `v` = 9 WHERE `k` = 1")
  }

  test("batched update: per-column CASE WHEN + tuple IN (genUpdateSQLV2)") {
    val sql = updateMulti("db", "t",
      setCols = Seq("v", "w"), setRows = Seq(Seq(9, "a"), Seq(8, "b")),
      keyCols = Seq("k1", "k2"), keyRows = Seq(Seq(1, 2), Seq(3, 4)))
    assert(sql ==
      "UPDATE `db`.`t` SET " +
        "`v` = CASE WHEN `k1` = 1 AND `k2` = 2 THEN 9 WHEN `k1` = 3 AND `k2` = 4 THEN 8 END, " +
        "`w` = CASE WHEN `k1` = 1 AND `k2` = 2 THEN 'a' WHEN `k1` = 3 AND `k2` = 4 THEN 'b' END " +
        "WHERE (`k1`,`k2`) IN ((1,2),(3,4))")
  }

  test("NULL keys refuse the tuple-IN forms (v2 fallback rule)") {
    assert(!canBatchKeys(Seq(Seq(1, null), Seq(2, 3))))
    assert(canBatchKeys(Seq(Seq(1, 2), Seq(2, 3))))
    intercept[IllegalArgumentException] {
      updateMulti("db", "t", Seq("v"), Seq(Seq(1)), Seq("k"), Seq(Seq(null)))
    }
  }

  test("string escaping") {
    assert(literal("it's") == "'it''s'")
    assert(literal("a\\b") == "'a\\\\b'")
    assert(quoteId("we`ird") == "`we``ird`")
  }

  test("lww upsert only overwrites when origin ts newer") {
    val sql = lwwUpsert("db", "t", Seq("v"), Seq(1), "_origin_ts", 42L)
    assert(sql.contains("`v`=IF(IFNULL(`_origin_ts`,0) <= VALUES(`_origin_ts`),VALUES(`v`),`v`)"))
    assert(sql.startsWith("INSERT INTO `db`.`t` (`v`,`_origin_ts`) VALUES (1,42)"))
  }

  test("ddl execution carries idempotent ddl-ts bookkeeping") {
    val stmts = graft.sinks.MysqlSink.ddlStatements("cf-1", 777L,
      "ALTER TABLE t ADD COLUMN k BIGINT")
    assert(stmts.head == "ALTER TABLE t ADD COLUMN k BIGINT")
    assert(stmts(1).startsWith("INSERT INTO `tidb_cdc`.`ddl_ts_v1`"))
    assert(stmts(1).contains("'cf-1',777"))
    assert(stmts(1).endsWith("ON DUPLICATE KEY UPDATE `ddl_ts`=VALUES(`ddl_ts`)"))
  }

  test("sync point rows are insert-ignore ts maps") {
    val sql = graft.sinks.MysqlSink.syncPointStatement("cf-1", 100L, 90L)
    assert(sql.startsWith("INSERT IGNORE INTO `tidb_cdc`.`syncpoint_v1`"))
    assert(sql.contains("100,90"))
  }
}
