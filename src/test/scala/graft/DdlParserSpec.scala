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
    val Some(CreateTable(s, t, cols, ts, _)) = DdlParser.parse(q, 100L)
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

  test("constraint DDLs under ALTER ADD never become phantom AddColumns") {
    // each would capture cName=INDEX/PRIMARY/... without the guard
    assert(DdlParser.parse("ALTER TABLE t ADD INDEX idx (k)", 1).isEmpty)
    assert(DdlParser.parse("ALTER TABLE t ADD PRIMARY KEY (k)", 2).isEmpty)
    assert(DdlParser.parse("ALTER TABLE t ADD UNIQUE KEY uk (k)", 3).isEmpty)
    assert(DdlParser.parse("ALTER TABLE t ADD CONSTRAINT c CHECK (k > 0)", 4).isEmpty)
    assert(DdlParser.parse("ALTER TABLE t ADD FULLTEXT INDEX ft (name)", 5).isEmpty)
    assert(DdlParser.parse("ALTER TABLE t ADD SPATIAL INDEX sp (geom)", 6).isEmpty)
  }

  test("modify/change column parse and retype/rename in place") {
    assert(DdlParser.parse("ALTER TABLE t MODIFY COLUMN v DECIMAL(18,2)", 1) ==
      Some(ModifyColumn("app", "t", ColumnDef("v", "decimal(18,2)", None), 1)))
    assert(DdlParser.parse("ALTER TABLE t MODIFY v BIGINT DEFAULT 9", 2) ==
      Some(ModifyColumn("app", "t", ColumnDef("v", "bigint", Some("9")), 2)))
    assert(DdlParser.parse("ALTER TABLE `db`.`t` CHANGE COLUMN k k2 BIGINT", 3) ==
      Some(ChangeColumn("db", "t", "k", ColumnDef("k2", "bigint", None), 3)))
    val reg = SchemaRegistry().applyAll(DdlParser.parseAll(Seq(
      (10L, "CREATE TABLE t (id BIGINT, v DOUBLE, k BIGINT)"),
      (20L, "ALTER TABLE t MODIFY COLUMN v DECIMAL(18,2)"),
      (30L, "ALTER TABLE t CHANGE COLUMN k k2 BIGINT DEFAULT 5"))))
    assert(reg.asOf("app", "t", 25L).get.columns ==
      Seq(ColumnDef("id", "bigint"), ColumnDef("v", "decimal(18,2)"), ColumnDef("k", "bigint")))
    assert(reg.asOf("app", "t", 35L).get.columns ==
      Seq(ColumnDef("id", "bigint"), ColumnDef("v", "decimal(18,2)"),
        ColumnDef("k2", "bigint", Some("5"))))
  }

  test("partition DDLs and multi-table rename parse") {
    assert(DdlParser.parse(
      "ALTER TABLE t ADD PARTITION (PARTITION p3 VALUES LESS THAN (400))", 1) ==
      Some(AddTablePartition("app", "t", 1)))
    assert(DdlParser.parse("ALTER TABLE t DROP PARTITION p1, p2", 2) ==
      Some(DropTablePartition("app", "t", Seq("p1", "p2"), 2)))
    // partition names that PREFIX a clause head ("add2") or EQUAL one
    // ("add") must glue into the name list, not split off as a bogus
    // clause that silently drops
    assert(DdlParser.parse("ALTER TABLE t DROP PARTITION p1, add2", 2) ==
      Some(DropTablePartition("app", "t", Seq("p1", "add2"), 2)))
    assert(DdlParser.parse("ALTER TABLE t DROP PARTITION p1, add", 2) ==
      Some(DropTablePartition("app", "t", Seq("p1", "add"), 2)))
    // while a REAL second clause still splits
    assert(DdlParser.parse(
      "ALTER TABLE t DROP PARTITION p1, ADD COLUMN c BIGINT", 2) ==
      Some(AlterMulti("app", "t", Seq(
        DropTablePartition("app", "t", Seq("p1"), 2),
        AddColumn("app", "t", ColumnDef("c", "bigint"), 2)), 2)))
    assert(DdlParser.parse("ALTER TABLE t TRUNCATE PARTITION p0", 3) ==
      Some(TruncateTablePartition("app", "t", Seq("p0"), 3)))
    assert(DdlParser.parse("RENAME TABLE a TO b, db.c TO db.d", 4) ==
      Some(RenameTables(Seq(
        RenameTable("app", "a", "app", "b", 4),
        RenameTable("db", "c", "db", "d", 4)), 4)))
    // partition DDLs bump the version without changing the shape
    val reg = SchemaRegistry().applyAll(DdlParser.parseAll(Seq(
      (10L, "CREATE TABLE t (id BIGINT)"),
      (20L, "ALTER TABLE t TRUNCATE PARTITION p0"))))
    assert(reg.asOf("app", "t", 25L).get.versionTs == 20L)
    assert(reg.asOf("app", "t", 25L).get.columns == Seq(ColumnDef("id", "bigint")))
    // multi-rename applies atomically in statement order
    val reg2 = SchemaRegistry().applyAll(DdlParser.parseAll(Seq(
      (10L, "CREATE TABLE a (id BIGINT)"),
      (11L, "CREATE TABLE c (k BIGINT)"),
      (20L, "RENAME TABLE a TO b, c TO d"))))
    assert(reg2.latest("app", "b").isDefined && reg2.latest("app", "d").isDefined)
  }

  test("column placement: ADD/MODIFY with FIRST / AFTER relocate") {
    assert(DdlParser.parse("ALTER TABLE t ADD COLUMN c INT AFTER id", 1) ==
      Some(AddColumn("app", "t", ColumnDef("c", "int", None, Some("after:id")), 1)))
    assert(DdlParser.parse("ALTER TABLE t ADD COLUMN c INT DEFAULT 5 FIRST", 2) ==
      Some(AddColumn("app", "t", ColumnDef("c", "int", Some("5"), Some("first")), 2)))
    // trailing attributes still tolerated, position still found
    assert(DdlParser.parse("ALTER TABLE t ADD COLUMN c INT NOT NULL AFTER `id`", 3) ==
      Some(AddColumn("app", "t", ColumnDef("c", "int", None, Some("after:id")), 3)))
    val reg = SchemaRegistry().applyAll(DdlParser.parseAll(Seq(
      (10L, "CREATE TABLE t (id BIGINT, v DOUBLE)"),
      (20L, "ALTER TABLE t ADD COLUMN a INT FIRST"),
      (30L, "ALTER TABLE t ADD COLUMN b INT AFTER id"),
      (40L, "ALTER TABLE t MODIFY COLUMN v DECIMAL(10,2) AFTER a"))))
    assert(reg.latest("app", "t").get.columns.map(_.name) == Seq("a", "v", "id", "b"))
    assert(reg.latest("app", "t").get.columns.forall(_.position.isEmpty),
      "statement-level placement must not leak into stored schema")
  }

  test("create/drop database parse; drop removes the schema's tables") {
    assert(DdlParser.parse("CREATE DATABASE IF NOT EXISTS shop", 1) ==
      Some(CreateSchema("shop", 1)))
    assert(DdlParser.parse("DROP SCHEMA shop", 2) == Some(DropSchema("shop", 2)))
    val reg = SchemaRegistry().applyAll(DdlParser.parseAll(Seq(
      (10L, "CREATE DATABASE shop"),
      (11L, "CREATE TABLE shop.orders (id BIGINT)"),
      (12L, "CREATE TABLE shop.items (id BIGINT)"),
      (13L, "CREATE TABLE app.keepme (id BIGINT)"),
      (20L, "DROP DATABASE shop"))))
    assert(reg.latest("shop", "orders").isEmpty && reg.latest("shop", "items").isEmpty)
    assert(reg.latest("app", "keepme").isDefined)
  }

  test("lossy ddl classification: narrowings flagged, widenings not") {
    import graft.model.DdlParser.isLossyTypeChange
    // width ladders
    assert(isLossyTypeChange("bigint", "int"))
    assert(!isLossyTypeChange("int", "bigint"))
    assert(isLossyTypeChange("varchar(64)", "varchar(16)"))
    assert(!isLossyTypeChange("varchar(16)", "varchar(64)"))
    assert(isLossyTypeChange("decimal(18,2)", "decimal(10,2)"))
    assert(isLossyTypeChange("decimal(18,4)", "decimal(18,2)"))
    assert(!isLossyTypeChange("decimal(10,2)", "decimal(18,2)"))
    assert(isLossyTypeChange("double", "float"))
    assert(!isLossyTypeChange("float", "double"))
    assert(isLossyTypeChange("bigint", "double"), "2^53 precision cliff")
    assert(!isLossyTypeChange("smallint", "decimal(20,0)"))
    assert(!isLossyTypeChange("varchar(100)", "text"))
    assert(isLossyTypeChange("text", "varchar(100)"))
    assert(isLossyTypeChange("varchar(10)", "int"), "cross-family is lossy")
    // registry-aware: MODIFY narrowing flags, widening doesn't;
    // DROP COLUMN always does
    val reg = SchemaRegistry().applyAll(DdlParser.parseAll(Seq(
      (10L, "CREATE TABLE t (id BIGINT, v DECIMAL(18,2), s VARCHAR(64))"))))
    def lossy(q: String) =
      DdlParser.parse(q, 20L).exists(a => DdlParser.isLossy(a, reg))
    assert(lossy("ALTER TABLE t MODIFY COLUMN v DECIMAL(10,2)"))
    assert(!lossy("ALTER TABLE t MODIFY COLUMN v DECIMAL(20,2)"))
    assert(lossy("ALTER TABLE t CHANGE COLUMN s s2 VARCHAR(8)"))
    assert(lossy("ALTER TABLE t DROP COLUMN s"))
    assert(!lossy("ALTER TABLE t ADD COLUMN w BIGINT"))
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

  test("fuzz: random DDL-shaped text never throws, constraint guard always holds") {
    val rnd = new scala.util.Random(1234)
    val heads = Seq("ALTER TABLE", "CREATE TABLE", "DROP TABLE", "TRUNCATE TABLE",
      "RENAME TABLE", "CREATE DATABASE", "DROP DATABASE", "CREATE INDEX",
      "OPTIMIZE TABLE", "GRANT SELECT ON", "")
    val verbs = Seq("ADD COLUMN", "ADD", "DROP COLUMN", "MODIFY COLUMN",
      "CHANGE COLUMN", "ADD INDEX", "ADD KEY", "ADD PRIMARY KEY",
      "ADD UNIQUE KEY", "ADD CONSTRAINT", "ADD FULLTEXT INDEX",
      "ADD FOREIGN KEY", "ADD PARTITION", "DROP PARTITION", "RENAME TO")
    val tails = Seq("c1 bigint", "c1 varchar(255) DEFAULT 'x'", "idx (k)",
      "pk_1 PRIMARY KEY (id)", "(id bigint, v double)", "c1", "", "fk (a) REFERENCES t2 (b)",
      "c1 c2 bigint FIRST", "c1 bigint AFTER c0", "p0 VALUES LESS THAN (10)")
    def randomCase(s: String) =
      s.map(c => if (rnd.nextBoolean()) c.toUpper else c.toLower)
    for (_ <- 0 until 2000) {
      val stmt = Seq(
        randomCase(heads(rnd.nextInt(heads.size))),
        if (rnd.nextBoolean()) s"t${rnd.nextInt(3)}" else s"db.t${rnd.nextInt(3)}",
        randomCase(verbs(rnd.nextInt(verbs.size))),
        tails(rnd.nextInt(tails.size)))
        .mkString(" " * (1 + rnd.nextInt(3)))
      // never throws, whatever arrives on the DDL stream
      val parsed = DdlParser.parse(stmt, ts = 1L)
      // the constraint-head guard: an ADD INDEX/KEY/CONSTRAINT/...
      // must never surface as a column addition
      val upper = stmt.toUpperCase.replaceAll("\\s+", " ")
      val isConstraintAdd = Seq("ADD INDEX", "ADD KEY", "ADD PRIMARY KEY",
        "ADD UNIQUE KEY", "ADD CONSTRAINT", "ADD FULLTEXT INDEX",
        "ADD FOREIGN KEY").exists(upper.contains)
      parsed match {
        case Some(a: graft.model.DdlAction.AddColumn) =>
          assert(!isConstraintAdd,
            s"constraint ADD must not parse as AddColumn: $stmt -> $a")
        case _ => ()
      }
    }
    // and the registry never throws folding whatever did parse
    val creates = (0 until 3).flatMap(i =>
      DdlParser.parse(s"CREATE TABLE t$i (id bigint)", ts = i.toLong))
    val actions = (0 until 500).flatMap { i =>
      DdlParser.parse(
        s"ALTER TABLE t${i % 3} ADD COLUMN c$i bigint", ts = 10L + i)
    }
    val reg = SchemaRegistry().applyAll(creates ++ actions)
    assert(reg.latest("app", "t0").get.columns.length > 100)
  }

  test("ANSI_QUOTES sql_mode: double-quoted identifiers parse like backticks " +
      "(sql_mode scenario)") {
    // the reference's motivating example (schemastore/utils.go:33-35)
    val a = DdlParser.parse("""alter table "t" add column "c" int default 1""",
      ts = 5L, defaultSchema = "app", sqlMode = "STRICT_TRANS_TABLES,ANSI_QUOTES")
    assert(a.contains(AddColumn("app", "t",
      ColumnDef("c", "int", Some("1")), 5L)))
    // without the mode the double quotes stay string-ish and nothing parses
    assert(DdlParser.parse("""alter table "t" add column "c" int""",
      ts = 5L, defaultSchema = "app", sqlMode = "").isEmpty)
    // single-quoted literals survive untouched, including embedded ""
    assert(DdlParser.normalizeAnsiQuotes(
      """alter table "t" add column "c" varchar(10) default 'say "hi" ''ok'''""") ==
      "alter table `t` add column `c` varchar(10) default 'say \"hi\" ''ok'''")
    // a doubled "" inside an ANSI identifier is an escaped quote
    assert(DdlParser.normalizeAnsiQuotes("""select "a""b" from t""") ==
      "select `a\"b` from t")
  }

  test("handle-key selection: pk wins; else fewest-column not-null UK, " +
      "earliest on ties; nullable UK skipped (many_pk_or_uk)") {
    import graft.model.MySqlDdl
    def t(ddl: String) = MySqlDdl.parseCreateTable(ddl, "test").get

    // 1. a primary key always wins, in INDEX column order
    val pk = t("create table a (x int, y int, z int unique not null, primary key (y, x))")
    assert(pk.handleKeys == Seq("y", "x") && pk.eligible)

    // 2. no pk: the NOT-NULL unique index with the fewest columns
    val uk = t("""create table b (
      |  p bigint not null, q bigint not null, r bigint not null,
      |  unique key u2 (p, q), unique key u1 (r))""".stripMargin)
    assert(uk.handleKeys == Seq("r"))

    // 3. equal width: the earliest-defined index wins
    val tie = t("""create table c (
      |  p bigint not null, q bigint not null,
      |  unique key ua (p), unique key ub (q))""".stripMargin)
    assert(tie.handleKeys == Seq("p"))

    // 4. a unique index over a NULLABLE column is no handle key
    val nullable = t("""create table d (
      |  p bigint, q bigint not null,
      |  unique key ua (p), unique key ub (q, p))""".stripMargin)
    assert(nullable.handleKeys.isEmpty && !nullable.eligible)

    // 5. inline `unique` column attribute counts as a one-column index
    val inline = t("create table e (p bigint not null unique, q bigint not null, unique key u (q, p))")
    assert(inline.handleKeys == Seq("p"))

    // 6. no pk and no uk at all: ineligible
    assert(!t("create table f (p bigint, q varchar(10))").eligible)
  }

  test("unique-index parsing: prefix-length columns, no-space UNIQUE(, " +
      "constraint-named forms (advice r8)") {
    import graft.model.MySqlDdl
    def t(ddl: String) = MySqlDdl.parseCreateTable(ddl, "test").get

    // prefix-length column: the paren body must span the inner parens
    // and the name must strip the (10)
    val plen = t("""create table a (
      |  a varchar(50) not null, b bigint not null,
      |  unique key u (a(10), b))""".stripMargin)
    assert(plen.uniqueIndexes == Seq(Seq("a", "b")), plen.uniqueIndexes)
    assert(plen.handleKeys == Seq("a", "b") && plen.eligible)

    // UNIQUE(p) with no space after UNIQUE
    val nospace = t("create table b (p bigint not null, unique(p))")
    assert(nospace.uniqueIndexes == Seq(Seq("p")) && nospace.handleKeys == Seq("p"))

    // CONSTRAINT name UNIQUE KEY (…) table-level form
    val named = t("create table c (q bigint not null, constraint uq unique key (q))")
    assert(named.uniqueIndexes == Seq(Seq("q")) && named.handleKeys == Seq("q"))
  }

  test("sql_mode combination modes imply ANSI_QUOTES (advice r8)") {
    import graft.model.{DdlAction, DdlParser}
    val q = """CREATE TABLE "app"."t" ("id" INT, "v" VARCHAR(10))"""
    Seq("ANSI", "ansi,STRICT_TRANS_TABLES", "POSTGRESQL", "ANSI_QUOTES").foreach { mode =>
      val parsed = DdlParser.parse(q, 1L, "app", mode)
      assert(parsed.exists {
        case DdlAction.CreateTable("app", "t", cols, _, _) =>
          cols.map(_.name) == Seq("id", "v")
        case _ => false
      }, s"mode $mode must normalize double-quoted identifiers")
    }
    // without an implying mode the double quotes stay string-quotes
    assert(DdlParser.parse(q, 1L, "app", "STRICT_TRANS_TABLES").isEmpty)
  }

  test("DEFAULT CURRENT_TIMESTAMP materializes at the DDL's commit time " +
      "(origin-default semantics, ddl_default_current_timestamp)") {
    // 2020-09-13 12:26:40 UTC = 1.6e9 s, in the ns commit-ts domain
    val ts = 1600000000L * 1000000000L
    Seq("CURRENT_TIMESTAMP", "CURRENT_TIMESTAMP(6)", "NOW()", "now(3)",
      "LOCALTIMESTAMP").foreach { fn =>
      val Some(AddColumn(_, _, col, _)) = DdlParser.parse(
        s"ALTER TABLE app.t ADD COLUMN created DATETIME DEFAULT $fn", ts)
      assert(col.default.contains("2020-09-13 12:26:40"),
        s"$fn → ${col.default}")
    }
    // in CREATE TABLE bodies too
    val Some(CreateTable(_, _, cols, _, _)) = DdlParser.parse(
      "CREATE TABLE app.t2 (id BIGINT, created TIMESTAMP DEFAULT CURRENT_TIMESTAMP)", ts)
    assert(cols.find(_.name == "created").flatMap(_.default)
      .contains("2020-09-13 12:26:40"))
    // a literal default is untouched
    val Some(AddColumn(_, _, lit, _)) = DdlParser.parse(
      "ALTER TABLE app.t ADD COLUMN note VARCHAR(10) DEFAULT 'now()'", ts)
    assert(lit.default.contains("now()"))
  }

  test("typeDesc: unsigned suffix excluded for BIT and YEAR (GetTypeDesc)") {
    import graft.model.MySqlDdl.MySqlCol
    // TiDB sets the unsigned flag on BIT and YEAR implicitly, yet
    // GetTypeDesc never renders their " unsigned" suffix
    assert(MySqlCol("b", "bit", flen = 3, unsigned = true).typeDesc == "bit(3)")
    assert(MySqlCol("y", "year", unsigned = true).typeDesc == "year(4)")
    assert(MySqlCol("u", "int", unsigned = true).typeDesc == "int(10) unsigned")
  }

  test("AUTO_RANDOM: parsed with shard bits, valid only on the " +
      "pk-is-handle bigint column (autorandom scenario)") {
    import graft.model.MySqlDdl
    def t(ddl: String) = MySqlDdl.parseCreateTable(ddl, "test").get

    // default 5 shard bits; the auto_random pk IS the handle
    val ar = t("create table a (id bigint auto_random primary key, v int)")
    val id = ar.cols.find(_.name == "id").get
    assert(id.autoRandom && id.autoRandomBits == 5)
    assert(ar.pkIsHandle && ar.handleKeys == Seq("id") && ar.autoRandomValid)

    // explicit shard bits
    val ar3 = t("create table b (id bigint auto_random(3) primary key, v int)")
    assert(ar3.cols.head.autoRandomBits == 3 && ar3.autoRandomValid)

    // auto_random off the primary key is invalid (TiDB error 8216)
    val offPk = t("create table c (id bigint primary key, r bigint auto_random)")
    assert(offPk.autoRandomCol.exists(_.name == "r") && !offPk.autoRandomValid)

    // a composite pk is not pk-is-handle, so auto_random is invalid
    val comp = t("create table d (id bigint auto_random, v int, primary key (id, v))")
    assert(!comp.pkIsHandle && !comp.autoRandomValid)

    // auto_random cannot combine with auto_increment
    val both = t("create table e (id bigint auto_random auto_increment primary key)")
    assert(!both.autoRandomValid)

    // a plain int pk is pk-is-handle; a varchar pk is not
    assert(t("create table f (id int primary key)").pkIsHandle)
    assert(!t("create table g (id varchar(10) primary key)").pkIsHandle)

    // no auto_random column at all: vacuously valid
    assert(t("create table h (id bigint primary key)").autoRandomValid)
  }

  test("multi-clause ALTER (the ActionMultiSchemaChange statement form) " +
      "parses EVERY shape clause in statement order; partition name lists " +
      "keep their commas") {
    assert(DdlParser.parse(
      "ALTER TABLE t ADD COLUMN c BIGINT DEFAULT 7, DROP COLUMN a, MODIFY COLUMN b VARCHAR(16)",
      9) == Some(AlterMulti("app", "t", Seq(
        AddColumn("app", "t", ColumnDef("c", "bigint", Some("7")), 9),
        DropColumn("app", "t", "a", 9),
        ModifyColumn("app", "t", ColumnDef("b", "varchar(16)"), 9)), 9)))
    // non-shape clauses drop out; a single survivor returns unwrapped
    assert(DdlParser.parse(
      "ALTER TABLE t ADD INDEX idx (k), ADD COLUMN c BIGINT", 10) ==
      Some(AddColumn("app", "t", ColumnDef("c", "bigint"), 10)))
    // commas inside type args and string literals do not split clauses
    assert(DdlParser.parse(
      "ALTER TABLE t MODIFY COLUMN m DECIMAL(18,2), ADD COLUMN n VARCHAR(8) DEFAULT 'a,b'",
      11) == Some(AlterMulti("app", "t", Seq(
        ModifyColumn("app", "t", ColumnDef("m", "decimal(18,2)"), 11),
        AddColumn("app", "t", ColumnDef("n", "varchar(8)", Some("a,b")), 11)), 11)))
    // a partition NAME list is one clause, not many
    assert(DdlParser.parse("ALTER TABLE t DROP PARTITION p1, p2", 12) ==
      Some(DropTablePartition("app", "t", Seq("p1", "p2"), 12)))
  }

  test("RECOVER TABLE / FLASHBACK TABLE parse to RecoverTable " +
      "(codec/common/ddl.go:137 maps both statement forms)") {
    assert(DdlParser.parse("RECOVER TABLE app.t", 13) ==
      Some(RecoverTable("app", "t", 13)))
    assert(DdlParser.parse("FLASHBACK TABLE t", 14) ==
      Some(RecoverTable("app", "t", 14)))
    assert(DdlParser.parse("FLASHBACK TABLE t TO t_restored", 15) ==
      Some(RecoverTable("app", "t", 15)))
  }

  test("ALTER-form renames and parenthesized multi-ADD: RENAME TO / AS, " +
      "RENAME COLUMN (rename-only, binlog-filter event class), " +
      "ADD (a, b) — and RENAME INDEX stays out") {
    assert(DdlParser.parse("ALTER TABLE app.a RENAME TO b", 16) ==
      Some(RenameTable("app", "a", "app", "b", 16)))
    assert(DdlParser.parse("ALTER TABLE a RENAME AS crm.b", 17) ==
      Some(RenameTable("app", "a", "crm", "b", 17)))
    assert(DdlParser.parse("ALTER TABLE a RENAME b", 18) ==
      Some(RenameTable("app", "a", "app", "b", 18)))
    assert(DdlParser.parse("ALTER TABLE t RENAME COLUMN a TO b", 19) ==
      Some(RenameColumn("app", "t", "a", "b", 19)))
    assert(DdlParser.parse("ALTER TABLE t RENAME INDEX i1 TO i2", 20).isEmpty,
      "index renames never reach the registry")
    assert(DdlParser.parse("ALTER TABLE t ADD (a BIGINT, b VARCHAR(8) DEFAULT 'x')", 21) ==
      Some(AlterMulti("app", "t", Seq(
        AddColumn("app", "t", ColumnDef("a", "bigint"), 21),
        AddColumn("app", "t", ColumnDef("b", "varchar(8)", Some("x")), 21)), 21)))
    // single parenthesized column unwraps
    assert(DdlParser.parse("ALTER TABLE t ADD COLUMN (c BIGINT)", 22) ==
      Some(AddColumn("app", "t", ColumnDef("c", "bigint"), 22)))
    // registry: RENAME COLUMN keeps type/default at a new name
    val reg = SchemaRegistry().applyAll(Seq(
      CreateTable("app", "t", Seq(ColumnDef("id", "bigint"),
        ColumnDef("v", "varchar(8)", Some("d"))), 1L),
      RenameColumn("app", "t", "v", "w", 2L)))
    assert(reg.latest("app", "t").get.columns ==
      Seq(ColumnDef("id", "bigint"), ColumnDef("w", "varchar(8)", Some("d"))))
  }

  test("dispatchDdlJob: the driver-side two-level decision table — discard " +
      "unreplicated/other-ddl, ignore by class/regex, emit otherwise; " +
      "renames rewrite or fail the feed; db-level DDLs always pass the " +
      "table match") {
    import graft.model.{DdlJobParser, FilterConfig}
    import graft.streaming.Changefeed.dispatchDdlJob
    val f = FilterConfig(rules = Seq("app.events_*", "!app.events_3"))
    def job(q: String, s: String = "app", t: String = "events_1") =
      DdlJobParser.DdlJob(1L, 0, s, t, q, 1L, 2L, 1L)
    // emit: replicated table, whitelisted class
    assert(dispatchDdlJob(job("ALTER TABLE events_1 ADD COLUMN c INT"), f)
      == Some("ALTER TABLE events_1 ADD COLUMN c INT"))
    // discard: filtered-out table
    assert(dispatchDdlJob(job("DROP TABLE events_3", t = "events_3"), f).isEmpty)
    // discard: never-replicated class even on a replicated table
    assert(dispatchDdlJob(job("ANALYZE TABLE events_1"), f).isEmpty)
    // ignore by class and by regex
    assert(dispatchDdlJob(job("TRUNCATE TABLE events_1"), f,
      ignoreClasses = Seq("truncate table")).isEmpty)
    assert(dispatchDdlJob(job("CREATE INDEX idx ON events_1"), f,
      ignoreSqlRegexps = Seq("^CREATE INDEX")).isEmpty)
    // db-level: emitted regardless of the table matcher
    assert(dispatchDdlJob(job("CREATE DATABASE other", t = ""), f)
      == Some("CREATE DATABASE other"))
    // rename decision table: pairs whose OLD name is replicated emit
    // (out-of-feed targets still execute downstream, then leave the
    // feed); both-filtered pairs are dropped from the rebuilt query
    assert(dispatchDdlJob(job(
      "RENAME TABLE events_1 TO events_2, zzz_1 TO zzz_2"), f)
      == Some("RENAME TABLE `app`.`events_1` TO `app`.`events_2`"))
    val e = intercept[IllegalStateException] {
      dispatchDdlJob(job("RENAME TABLE legacy_x TO events_2"), f)
    }
    assert(e.getMessage.contains("CDC:ErrSyncRenameTableFailed"))
  }
}
