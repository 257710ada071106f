package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.model.Envelope
import graft.operators.Materialize
import graft.sinks.{RedoApplier, RedoLog}

/** Standalone redo applier: crash → replay-from-directory converges
  * to the state the live sink would have produced (reference
  * pkg/applier/redo.go consumeLogs/Apply semantics: meta window,
  * safe-mode re-delivery, update split, DML-before-DDL interleave). */
class RedoApplierSpec extends SparkFunSuite {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("crash replay from the redo dir alone converges to the direct-apply state") {
    val tmp = Files.createTempDirectory("graft-redo-apply").toString
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))

    val cut = env.select("_commit_ts").orderBy("_commit_ts")
      .collect().map(_.getLong(0)).apply(700)
    val applied = env.filter(col("_commit_ts") <= cut)
    // the log holds everything (log-ahead ordering), including a
    // re-appended overlap from a writer crash mid-batch
    RedoLog.append(applied, tmp)
    RedoLog.append(env.filter(col("_commit_ts") > cut)
      .unionByName(applied.orderBy(col("_commit_ts").desc).limit(40)), tmp)
    // the sink flushed only the first batch before the crash
    RedoApplier.advanceCheckpoint(spark, tmp, cut)

    val (ck, rts) = RedoApplier.replayWindow(spark, tmp)
    assert(ck == cut)
    assert(rts == env.agg(max("_commit_ts")).head().getLong(0))

    // replayed window on top of the already-applied prefix == direct
    // full apply: the eventual-consistency contract
    val recovered = Materialize.tableState(
      applied.unionByName(RedoLog.read(spark, tmp, ck, rts)))
    assert(canon(recovered) == canon(Materialize.tableState(env)))

    // window state alone matches the applier's convergence form
    assert(canon(RedoApplier.replayState(spark, tmp)) ==
      canon(Materialize.tableState(env.filter(col("_commit_ts") > cut))))
  }

  test("replay statements are idempotent safe forms over exactly the window") {
    val tmp = Files.createTempDirectory("graft-redo-stmts").toString
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val cut = env.select("_commit_ts").orderBy("_commit_ts")
      .collect().map(_.getLong(0)).apply(500)
    RedoLog.append(env, tmp)
    RedoApplier.advanceCheckpoint(spark, tmp, cut)

    val stmts = RedoApplier.replayStatements(spark, tmp).cache()
    val window = env.filter(col("_commit_ts") > cut)
    // update split may add rows (key-change updates become D+I)
    assert(stmts.count() >= window.count())
    assert(stmts.filter(col("_commit_ts") <= cut).count() == 0,
      "nothing at or below the checkpoint replays")
    // re-delivery must be idempotent: only REPLACE / DELETE forms
    val kinds = stmts.select(
      when(col("_stmt").startsWith("REPLACE INTO"), "replace")
        .when(col("_stmt").startsWith("DELETE FROM"), "delete")
        .otherwise("other").as("kind"))
      .groupBy("kind").count().collect().map(r => r.getString(0)).toSet
    assert(!kinds.contains("other"), "non-idempotent statement in replay")
    stmts.unpersist()
  }

  test("logged DDLs interleave DML-first at equal commit ts") {
    val tmp = Files.createTempDirectory("graft-redo-ddl").toString
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    RedoLog.append(env, tmp)
    // a DDL at an existing DML commit ts, inside the window
    val ddlTs = env.select("_commit_ts").orderBy("_commit_ts")
      .collect().map(_.getLong(0)).apply(300)
    import spark.implicits._
    RedoApplier.appendDdl(
      Seq(("app", "events_0", ddlTs, "ALTER TABLE events_0 ADD COLUMN c INT"))
        .toDF("_schema", "_table", "_commit_ts", "query"), tmp)

    val stmts = RedoApplier.replayStatements(spark, tmp).cache()
    val ddlRows = stmts.filter(col("_op") === "DDL").collect()
    assert(ddlRows.length == 1 &&
      ddlRows.head.getAs[Number]("_partition").longValue == -1L)
    val ddlOrder = ddlRows.head.getAs[Long]("_apply_order")
    val dmlAtTs = stmts.filter(col("_op") =!= "DDL" && col("_commit_ts") === ddlTs)
    assert(dmlAtTs.count() > 0)
    assert(dmlAtTs.agg(max(col("_apply_order"))).head().getLong(0) < ddlOrder,
      "redo replay applies rows at the DDL's commit ts BEFORE the DDL")
    stmts.unpersist()
  }

  test("routed crash replay lands rows AND the rewritten DDL in the ROUTED tables on real JDBC") {
    import graft.model.DispatchRule
    import graft.sinks.{JdbcApplier, MysqlSink}
    import graft.operators.Routing
    val tmp = Files.createTempDirectory("graft-redo-route").toString
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    // overlapping rules: events_1 matches BOTH — first match must win;
    // events_3 stays unrouted (redo_apply_table_route/conf shape)
    val routes = Seq(
      DispatchRule(matcher = Seq("app.events_1"),
        targetSchema = Some("target_db"), targetTable = Some("{table}_first")),
      DispatchRule(matcher = Seq("app.events_*", "!app.events_3"),
        targetSchema = Some("target_db"), targetTable = Some("{table}_routed")))

    val cut = env.select("_commit_ts").orderBy("_commit_ts")
      .collect().map(_.getLong(0)).apply(600)
    RedoLog.append(env, tmp)
    RedoApplier.advanceCheckpoint(spark, tmp, cut)
    // a DDL inside the window whose TEXT still names the source table
    val ddlTs = env.filter(col("_commit_ts") > cut)
      .agg(min("_commit_ts")).head().getLong(0) + 1L
    import spark.implicits._
    RedoApplier.appendDdl(
      Seq(("app", "events_0", ddlTs,
        "ALTER TABLE app.events_0 ADD COLUMN `extra_c` BIGINT"))
        .toDF("_schema", "_table", "_commit_ts", "query"), tmp)

    val a = JdbcApplier.inMemory("redoroute")
    val sinkTables = Seq(
      ("target_db", "events_0_routed"), ("target_db", "events_1_first"),
      ("target_db", "events_2_routed"), ("app", "events_3"))
    sinkTables.foreach { case (s, t) =>
      a.createTable(s, t,
        Seq("user_id" -> "BIGINT", "value" -> "DECIMAL(18,2)", "k" -> "BIGINT"),
        Seq("user_id"))
    }
    // the live (routed) sink had applied the prefix before the crash
    val routedAll = Routing.applyTableRoutes(env, routes)
    MysqlSink.applyBatch(routedAll.filter(col("_commit_ts") <= cut),
      Seq("user_id"), numWorkers = 2, safeMode = true)(JdbcApplier.executeFor(a.url))

    // disaster: replay from the redo dir alone, with the feed's routes
    val stmts = RedoApplier.replayStatements(spark, tmp, routes = routes).cache()
    // every replayed statement targets a routed name (or unrouted events_3)
    assert(stmts.filter(col("_schema") === "app" && col("_table") =!= "events_3").count() == 0)
    // first-match-wins: events_1 rows went to _first, never _routed
    assert(stmts.filter(col("_table") === "events_1_routed").count() == 0)
    assert(stmts.filter(col("_table") === "events_1_first").count() > 0)
    // the routed DDL rewrote BOTH its metadata and its statement text
    val ddlRow = stmts.filter(col("_op") === "DDL").collect()
    assert(ddlRow.length == 1)
    assert(ddlRow.head.getAs[String]("_schema") == "target_db")
    assert(ddlRow.head.getAs[String]("_table") == "events_0_routed")
    assert(ddlRow.head.getAs[String]("_stmt") ==
      "ALTER TABLE `target_db`.`events_0_routed` ADD COLUMN `extra_c` BIGINT")

    // execute the full replay stream in apply order on the real engine
    // apply order: ts first (DDL after DML at its ts via _apply_order),
    // then the sorter's D<U<I tie-break at equal ts, then row id
    val ordered = stmts
      .orderBy(col("_apply_order"), col("_start_ts"),
        when(col("_op") === "D", 1).when(col("_op") === "U", 2).otherwise(3),
        col("_row_id"))
      .select("_stmt").collect().map(_.getString(0))
    a.execute(ordered.iterator)
    stmts.unpersist()

    // the ROUTED downstream equals the routed full-corpus state
    val expected = Materialize.tableState(routedAll).cache()
    sinkTables.foreach { case (s, t) =>
      val exp = expected
        .filter(col("_schema") === s && col("_table") === t)
        .select(col("user_id"), col("value").cast("decimal(18,2)"), col("k"))
        .collect()
        .map(r => (r.getLong(0), BigDecimal(r.getDecimal(1)), Option(r.get(2))))
        .sortBy(_._1).toSeq
      val act = a.tableRows(s, t, Seq("user_id", "value", "k")).map(r =>
        (r(0).asInstanceOf[Number].longValue(),
          BigDecimal(r(1).asInstanceOf[java.math.BigDecimal]),
          Option(r(2)).map(_.asInstanceOf[Number].longValue())))
        .sortBy(_._1)
      assert(act == exp, s"state mismatch in $s.$t")
    }
    expected.unpersist()
    // the rewritten DDL executed for real: the routed table has the column
    assert(a.tableRows("target_db", "events_0_routed", Seq("extra_c"))
      .forall(_.head == null))
  }

  test("applier over an encrypted log renders the same statements as plaintext") {
    import graft.functions.AtRestEncryption
    val plain = Files.createTempDirectory("graft-redo-p").toString
    val encDir = Files.createTempDirectory("graft-redo-s").toString
    val master = AtRestEncryption.newDataKey()
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
      .limit(400)
    RedoLog.append(env, plain)
    RedoLog.appendEncrypted(env, encDir, master)
    val a = RedoApplier.replayStatements(spark, plain)
      .select("_stmt", "_apply_order")
    val b = RedoApplier.replayStatements(spark, encDir, masterKey = Some(master))
      .select("_stmt", "_apply_order")
    assert(canon(a) == canon(b))
    // and the convergence state matches too
    assert(canon(RedoApplier.replayState(spark, encDir, Some(master))) ==
      canon(RedoApplier.replayState(spark, plain)))
  }
}
