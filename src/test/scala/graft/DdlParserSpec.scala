package graft

import graft.model.{ColumnDef, DdlParser, SchemaRegistry}
import graft.model.DdlAction._

/** DDL text → registry actions (the ParseDDLJob analog): every
  * supported statement class, defaults, quoting, and the end-to-end
  * fold into the schema registry. */
class DdlParserSpec extends SparkFunSuite {

  test("create table parses columns, types, defaults; skips constraints") {
    val q = """CREATE TABLE app.users (
      |  `id` BIGINT,
      |  name VARCHAR(64) DEFAULT 'anon',
      |  balance DECIMAL(18,2) DEFAULT 0,
      |  PRIMARY KEY (id),
      |  UNIQUE KEY uk_name (name)
      |)""".stripMargin
    val Some(CreateTable(s, t, cols, ts)) = DdlParser.parse(q, 100L)
    assert(s == "app" && t == "users" && ts == 100L)
    assert(cols == Seq(
      ColumnDef("id", "bigint", None),
      ColumnDef("name", "varchar(64)", Some("anon")),
      ColumnDef("balance", "decimal(18,2)", Some("0"))))
  }

  test("alter add/drop column, rename, truncate, drop parse; noise rejected") {
    assert(DdlParser.parse("ALTER TABLE t ADD COLUMN k BIGINT DEFAULT 7", 1) ==
      Some(AddColumn("app", "t", ColumnDef("k", "bigint", Some("7")), 1)))
    assert(DdlParser.parse("ALTER TABLE `db`.`t` ADD v DOUBLE", 2) ==
      Some(AddColumn("db", "t", ColumnDef("v", "double", None), 2)))
    assert(DdlParser.parse("alter table t drop column v", 3) ==
      Some(DropColumn("app", "t", "v", 3)))
    assert(DdlParser.parse("RENAME TABLE a TO b", 4) ==
      Some(RenameTable("app", "a", "app", "b", 4)))
    assert(DdlParser.parse("TRUNCATE TABLE t", 5) == Some(TruncateTable("app", "t", 5)))
    assert(DdlParser.parse("DROP TABLE IF EXISTS t", 6) == Some(DropTable("app", "t", 6)))
    // statements that don't change row shape fall through
    assert(DdlParser.parse("CREATE INDEX idx ON t (k)", 7).isEmpty)
    assert(DdlParser.parse("ANALYZE TABLE t", 8).isEmpty)
  }

  test("text DDL stream folds into the registry end-to-end") {
    val actions = DdlParser.parseAll(Seq(
      (10L, "CREATE TABLE app.t (id BIGINT, v DOUBLE)"),
      (20L, "ALTER TABLE t ADD COLUMN k BIGINT DEFAULT 42"),
      (30L, "ALTER TABLE t DROP COLUMN v"),
      (40L, "CREATE INDEX i ON t (k)"), // no-op for row shape
      (50L, "RENAME TABLE t TO t2")))
    assert(actions.length == 4)
    val reg = SchemaRegistry().applyAll(actions)
    assert(reg.asOf("app", "t", 25L).get.columns.map(_.name) == Seq("id", "v", "k"))
    assert(reg.asOf("app", "t", 25L).get.columns.last.default == Some("42"))
    assert(reg.asOf("app", "t", 35L).get.columns.map(_.name) == Seq("id", "k"))
    assert(reg.latest("app", "t2").isDefined)
  }
}
