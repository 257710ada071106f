package graft

import java.sql.SQLException

import graft.sinks.JdbcApplier
import org.scalatest.funsuite.AnyFunSuite

/** DDL re-execution after a restart must be tolerated — the
  * ddl_reentrant scenario (tests/integration_tests/ddl_reentrant/
  * run.sh:83-115 re-runs each DDL against a downstream where it
  * already took effect and expects "Execute DDL failed, but error can
  * be ignored"): a checkpoint behind an executed DDL replays that DDL
  * on restart, so the sink classifies already-took-effect errors as
  * ignorable (pkg/errors/utils.go:46-67 IsIgnorableMySQLDDLError;
  * mysql_writer_ddl.go:224-231) and continues, while genuinely broken
  * DDL and every DML error still propagate. No Spark session needed —
  * the surface under test is the JDBC applier. */
class DdlReentrantSpec extends AnyFunSuite {

  private def newDb(name: String): JdbcApplier = {
    val a = JdbcApplier.inMemory(name)
    // materializes the "app" schema and the pk registry
    a.createTable("app", "seed", Seq("id" -> "BIGINT"), Seq("id"))
    a
  }

  test("re-executed CREATE TABLE is ignored and the stream continues (ddl_reentrant)") {
    val a = newDb("reentrant_create")
    val create = "CREATE TABLE `app`.`rt` (`a` INT NOT NULL PRIMARY KEY, `b` INT)"
    a.execute(Iterator(create))
    assert(a.ignoredDdlErrors.isEmpty)
    // restart replay: same DDL again, then the DML that follows it —
    // the DDL error is swallowed, the DML lands
    a.execute(Iterator(
      create,
      "INSERT INTO `app`.`rt` (`a`,`b`) VALUES (1,10)"))
    assert(a.ignoredDdlErrors.size == 1,
      s"second CREATE must be ignored, got ${a.ignoredDdlErrors}")
    assert(a.ignoredDdlErrors.peek.startsWith("X0Y32"))
    assert(a.tableRows("app", "rt", Seq("a", "b")) == Seq(Seq(1, 10)))
  }

  test("re-executed DROP TABLE / ADD COLUMN / DROP COLUMN are ignored") {
    val a = newDb("reentrant_alter")
    a.execute(Iterator("CREATE TABLE `app`.`rt2` (`a` INT NOT NULL PRIMARY KEY)"))
    // duplicate ADD COLUMN (ErrColumnExists / Derby X0Y32)
    a.execute(Iterator("ALTER TABLE `app`.`rt2` ADD COLUMN `c` INT"))
    a.execute(Iterator("ALTER TABLE `app`.`rt2` ADD COLUMN `c` INT"))
    // drop of a column that is already gone (ErrCantDropFieldOrKey)
    a.execute(Iterator("ALTER TABLE `app`.`rt2` DROP COLUMN `c`"))
    a.execute(Iterator("ALTER TABLE `app`.`rt2` DROP COLUMN `c`"))
    // drop of a table that is already gone (ErrTableDropExists)
    a.execute(Iterator("DROP TABLE `app`.`rt2`"))
    a.execute(Iterator("DROP TABLE `app`.`rt2`"))
    assert(a.ignoredDdlErrors.size == 3,
      s"expected 3 ignored replays, got ${a.ignoredDdlErrors}")
  }

  test("broken DDL still fails; DML errors never take the ignorable path") {
    val a = newDb("reentrant_broken")
    // syntax error is not ignorable
    intercept[SQLException] {
      a.execute(Iterator("CREATE TABLE `app`.`broken` ("))
    }
    // DML against a missing table propagates even though the
    // SQLState family differs from the ignorable set
    intercept[SQLException] {
      a.execute(Iterator("INSERT INTO `app`.`nope` (`a`) VALUES (1)"))
    }
    // DML duplicate-key propagates (it is the safe-mode trigger, not
    // an ignorable DDL)
    a.execute(Iterator("INSERT INTO `app`.`seed` (`id`) VALUES (7)"))
    intercept[SQLException] {
      a.execute(Iterator("INSERT INTO `app`.`seed` (`id`) VALUES (7)"))
    }
    assert(a.ignoredDdlErrors.isEmpty)
  }

  test("classifier covers the reference's MySQL error-number set") {
    // a real MySQL downstream surfaces these as vendor codes — the
    // exact list of IsIgnorableMySQLDDLError (pkg/errors/utils.go:55-63)
    val ignorable = Seq(1007, 1008, 1050, 1051, 1054, 1060, 1061, 1068,
      1091, 1176, 1507, 1517, 1831)
    ignorable.foreach { code =>
      assert(JdbcApplier.isIgnorableDdlError(
        new SQLException(s"Error $code: it already took effect", "HY000", code)),
        s"code $code must be ignorable")
    }
    // not in the set: lock wait timeout, generic syntax error
    Seq(1205, 1064).foreach { code =>
      assert(!JdbcApplier.isIgnorableDdlError(
        new SQLException(s"Error $code: boom", "HY000", code)))
    }
  }

  test("retype rebuild is crash-convergent: a replay resumes from EVERY " +
      "statement boundary of the rename->add->copy->drop sequence " +
      "(fail_over_ddl on the downstream DDL executor)") {
    import graft.streaming.Changefeed
    val ddl = "ALTER TABLE app.rc MODIFY COLUMN x BIGINT"
    def fresh(name: String): JdbcApplier = {
      val a = newDb(name)
      a.ensureMetaTables()
      a.execute(Iterator(
        "CREATE TABLE `app`.`rc` (`id` BIGINT NOT NULL PRIMARY KEY, `x` INTEGER)",
        "INSERT INTO `app`.`rc` (`id`,`x`) VALUES (1, 41)"))
      a
    }
    def converged(a: JdbcApplier): Unit = {
      assert(a.columnInfo("app", "rc", "x")
        .exists(_._1.equalsIgnoreCase("BIGINT")), "target type in place")
      assert(a.columnInfo("app", "rc", "x__graft_retype").isEmpty,
        "tmp column dropped")
      assert(a.tableRows("app", "rc", Seq("id", "x")) == Seq(Seq(1L, 41L)),
        "the value survives the rebuild")
    }
    // baseline: no crash
    locally {
      val a = fresh("retype_ok")
      Changefeed.executeDdlDownstream(a, "cf", 10L, ddl)
      converged(a)
      // full replay of an already-applied retype is a no-op
      Changefeed.executeDdlDownstream(a, "cf", 10L, ddl)
      converged(a)
    }
    // crash after RENAME: the target column is GONE, values sit under
    // the tmp column — a c.name-only probe would treat the replay as
    // registry-only and every later DML on the table would fail
    locally {
      val a = fresh("retype_crash_rename")
      a.execute(Iterator(
        """RENAME COLUMN "app"."rc"."x" TO "x__graft_retype""""))
      Changefeed.executeDdlDownstream(a, "cf", 10L, ddl)
      converged(a)
    }
    // crash after ADD, before the copy: the target column EXISTS with
    // the target type but every row is NULL — an already-done probe
    // would silently lose the values and strand the tmp column
    locally {
      val a = fresh("retype_crash_add")
      a.execute(Iterator(
        """RENAME COLUMN "app"."rc"."x" TO "x__graft_retype"""",
        """ALTER TABLE "app"."rc" ADD COLUMN "x" BIGINT"""))
      Changefeed.executeDdlDownstream(a, "cf", 10L, ddl)
      converged(a)
    }
    // crash after the copy, before the DROP: re-copy is idempotent
    // (the tmp column is immutable from the rename on), then DROP
    locally {
      val a = fresh("retype_crash_copy")
      a.execute(Iterator(
        """RENAME COLUMN "app"."rc"."x" TO "x__graft_retype"""",
        """ALTER TABLE "app"."rc" ADD COLUMN "x" BIGINT""",
        """UPDATE "app"."rc" SET "x" = CAST("x__graft_retype" AS BIGINT)"""))
      Changefeed.executeDdlDownstream(a, "cf", 10L, ddl)
      converged(a)
    }
  }

  test("verb gate: only schema-shape statements qualify") {
    assert(JdbcApplier.isDdlStatement("CREATE TABLE x (a INT)"))
    assert(JdbcApplier.isDdlStatement("  alter table x add column b int"))
    assert(JdbcApplier.isDdlStatement("DROP TABLE x"))
    assert(JdbcApplier.isDdlStatement("RENAME TABLE a TO b"))
    assert(JdbcApplier.isDdlStatement("TRUNCATE TABLE x"))
    assert(!JdbcApplier.isDdlStatement("INSERT INTO x VALUES (1)"))
    assert(!JdbcApplier.isDdlStatement("UPDATE x SET a = 1"))
    assert(!JdbcApplier.isDdlStatement("DELETE FROM x"))
  }
}
