package graft

import java.nio.file.Files
import graft.model._
import graft.operators.Routing
import graft.streaming.{Changefeed, FeedBackoff, FeedError, FeedState}

/** Table-route conflict detection (reference pkg/routing/registry.go:
  * 24-90, router.go:376 ValidateNoConflicts;
  * tests/integration_tests/table_route_conflict_detection): DIFFERENT
  * source tables mapping to the same routed target can never
  * replicate — create rejects the feed statically, and a CREATE TABLE
  * that introduces the collision later fails the running feed with
  * the unretryable ErrTableRouteConflict. */
class RouteConflictSpec extends SparkFunSuite {

  /** The reference test's conf shape: both source schemas funnel into
    * one target schema with `{table}_routed`. */
  private val conflictRoutes = Seq(
    DispatchRule(matcher = Seq("src_a.*"),
      targetSchema = Some("target"), targetTable = Some("{table}_routed")),
    DispatchRule(matcher = Seq("src_b.*"),
      targetSchema = Some("target"), targetTable = Some("{table}_routed")))

  private def tbl(s: String, t: String): DdlAction.CreateTable =
    DdlAction.CreateTable(s, t, Seq(ColumnDef("id", "bigint")), 1L)

  test("static: two sources routing to one target is a conflict; distinct targets are not") {
    // src_a.t and src_b.t → target.t_routed: the static case
    val conflict = Routing.validateRoutes(
      Seq(("src_a", "t"), ("src_b", "t")), conflictRoutes)
    assert(conflict.exists(_.contains("table route conflict")), s"got $conflict")
    assert(conflict.exists(m => m.contains("src_a.t") && m.contains("src_b.t") &&
      m.contains("target.t_routed")))
    // different table names keep distinct routed names: no conflict
    assert(Routing.validateRoutes(
      Seq(("src_a", "t"), ("src_b", "u")), conflictRoutes).isEmpty)
    // no target-carrying rules: validation is a no-op
    assert(Routing.validateRoutes(
      Seq(("src_a", "t"), ("src_b", "t")),
      Seq(DispatchRule(matcher = Seq("*.*")))).isEmpty)
    // first-match parity with the data path: a target-less first rule
    // shields its matches from later renames, exactly like
    // applyTableRoutes' fold
    val shielded = Seq(DispatchRule(matcher = Seq("src_a.*"))) ++ conflictRoutes
    assert(Routing.routedNameOf("src_a", "t", shielded) == ("src_a", "t"))
    assert(Routing.validateRoutes(
      Seq(("src_a", "t"), ("src_b", "t")), shielded).isEmpty)
  }

  test("changefeed create rejects a statically conflicted feed (ErrTableRouteConflict)") {
    val reg = SchemaRegistry().applyAll(Seq(tbl("src_a", "t"), tbl("src_b", "t")))
    val cfg = ChangefeedConfig(id = "cf-route-conflict",
      sink = SinkConfig(dispatch = conflictRoutes))
    val e = intercept[IllegalArgumentException] {
      Changefeed.runMq(spark, cfg, "/nonexistent", "/nonexistent",
        "/nonexistent", registry = Some(reg))
    }
    assert(e.getMessage.contains(Routing.RouteConflictCode))
    // the same feed with only src_a populated creates fine — the
    // reference's create-table case starts exactly like this
    val regA = SchemaRegistry().applyAll(Seq(tbl("src_a", "t")))
    assert(Routing.validateRoutes(regA.versions.keys.toSeq, conflictRoutes).isEmpty)
  }

  test("dynamic: a mid-stream CREATE TABLE introducing the collision fails the feed " +
      "and the error is unretryable in FeedBackoff") {
    val tmp = Files.createTempDirectory("graft-route-conflict").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val cuts = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
      .select("_commit_ts").orderBy("_commit_ts").collect().map(_.getLong(0))
    // feed starts with src_a.t only; mid-stream DDL creates src_b.t
    val initial = SchemaRegistry().applyAll(Seq(tbl("src_a", "t")))
    val routes = conflictRoutes
    val cfg = ChangefeedConfig(id = "cf-route-dyn",
      sink = SinkConfig(dispatch = routes),
      splitUpdateOnKeyChange = false)
    val ddls = Seq(DdlAction.CreateTable("src_b", "t",
      Seq(ColumnDef("id", "bigint")), cuts(cuts.length / 2)))
    val q = Changefeed.runWithDdl(spark, cfg, src, s"$tmp/ckpt", ddls, initial,
      payloadCols = Seq("user_id", "value")) { (_, _) => () }
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(failed).exists(_.contains(Routing.RouteConflictCode)),
      s"feed must fail with the route-conflict code: ${messages(failed)}")

    // the surfaced error is FAST-FAIL: the feed goes FAILED, never Warning
    val backoff = new FeedBackoff()
    val state = backoff.checkStatus(100L,
      Seq(FeedError(Routing.RouteConflictCode, "table route conflict")), nowMs = 0L)
    assert(state == FeedState.Failed)
    assert(!backoff.shouldRun(Long.MaxValue / 2))
  }

  test("routed-DDL rewrite is table-position anchored: string literals, " +
      "same-named columns, and other-schema references stay untouched") {
    import org.apache.spark.sql.functions._
    val routes = Seq(DispatchRule(matcher = Seq("app.orders"),
      targetSchema = Some("tgt"), targetTable = Some("orders_r")))
    def rewrite(q: String): String = {
      val env = spark.createDataFrame(Seq(("app", "orders", q)))
        .toDF("_schema", "_table", "query")
      Routing.applyTableRoutes(env, routes, ddlQueryCol = Some("query"))
        .select("query").head().getString(0)
    }
    // the table's name inside a COMMENT literal and as a COLUMN name
    // must survive; the table position itself rewrites
    val create = rewrite("CREATE TABLE app.orders (" +
      "orders BIGINT COMMENT 'orders table', " +
      "x BIGINT REFERENCES other.orders (id))")
    assert(create.contains("`tgt`.`orders_r`"), create)
    assert(create.contains("orders BIGINT COMMENT 'orders table'"), create)
    assert(create.contains("REFERENCES other.orders (id)"), create)
    // bare-name positions still rewrite: TABLE / INTO / ON / EXISTS
    assert(rewrite("ALTER TABLE orders ADD COLUMN c INT") ==
      "ALTER TABLE `orders_r` ADD COLUMN c INT")
    assert(rewrite("CREATE INDEX idx ON orders (k)") ==
      "CREATE INDEX idx ON `orders_r` (k)")
    assert(rewrite("DROP TABLE IF EXISTS orders") ==
      "DROP TABLE IF EXISTS `orders_r`")
    // a same-schema REFERENCES names the routed table and rewrites
    assert(rewrite("CREATE TABLE app.child (oid BIGINT REFERENCES orders (id))")
      == "CREATE TABLE app.child (oid BIGINT REFERENCES `orders_r` (id))")
    // comma-separated TABLE-NAME lists rewrite every position
    // (DROP/RENAME/TRUNCATE table lists — the r11 ADVICE case) ...
    assert(rewrite("DROP TABLE t1, orders") ==
      "DROP TABLE t1, `orders_r`")
    assert(rewrite("RENAME TABLE a TO b, orders TO d") ==
      "RENAME TABLE a TO b, `orders_r` TO d")
    // ... while COLUMN lists (CREATE/ALTER commas) stay untouched
    assert(rewrite("ALTER TABLE x ADD COLUMN a INT, ADD COLUMN orders BIGINT") ==
      "ALTER TABLE x ADD COLUMN a INT, ADD COLUMN orders BIGINT")
    assert(rewrite("CREATE TABLE app.orders (a INT, orders BIGINT)")
      .contains("(a INT, orders BIGINT)"))
  }
}
