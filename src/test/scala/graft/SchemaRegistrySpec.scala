package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.model.DdlAction._
import graft.streaming.DdlBarrier

class SchemaRegistrySpec extends SparkFunSuite {

  private val t0 = 1000L

  test("as-of lookup returns greatest version <= ts across evolutions") {
    val reg = SchemaRegistry().applyAll(Seq(
      CreateTable("app", "t", Seq(ColumnDef("id", "bigint"), ColumnDef("v", "double")), t0),
      AddColumn("app", "t", ColumnDef("k", "bigint", Some("0")), t0 + 100),
      DropColumn("app", "t", "v", t0 + 200)))
    assert(reg.asOf("app", "t", t0 - 1).isEmpty, "before create -> unknown")
    assert(reg.asOf("app", "t", t0).get.columns.map(_.name) == Seq("id", "v"))
    assert(reg.asOf("app", "t", t0 + 150).get.columns.map(_.name) == Seq("id", "v", "k"))
    assert(reg.asOf("app", "t", t0 + 999).get.columns.map(_.name) == Seq("id", "k"))
  }

  test("rename keeps old identity queryable and continues under new key") {
    val reg = SchemaRegistry().applyAll(Seq(
      CreateTable("app", "old", Seq(ColumnDef("id", "bigint")), t0),
      RenameTable("app", "old", "app", "new", t0 + 10)))
    assert(reg.asOf("app", "old", t0 + 5).isDefined)
    assert(reg.latest("app", "new").get.versionTs == t0 + 10)
  }

  test("exchange partition swaps row shapes from ts on; history intact") {
    val reg = SchemaRegistry().applyAll(Seq(
      CreateTable("app", "part_t", Seq(ColumnDef("id", "bigint"), ColumnDef("a", "double")), t0),
      CreateTable("app", "plain_t", Seq(ColumnDef("id", "bigint"), ColumnDef("b", "varchar")), t0),
      ExchangeTablePartition("app", "part_t", "app", "plain_t", t0 + 50)))
    assert(reg.asOf("app", "part_t", t0 + 10).get.columns.map(_.name) == Seq("id", "a"))
    assert(reg.asOf("app", "part_t", t0 + 60).get.columns.map(_.name) == Seq("id", "b"))
    assert(reg.asOf("app", "plain_t", t0 + 60).get.columns.map(_.name) == Seq("id", "a"))
    // parser recognizes the statement
    assert(DdlParser.parse(
      "ALTER TABLE part_t EXCHANGE PARTITION p0 WITH TABLE plain_t", 7L) ==
      Some(ExchangeTablePartition("app", "part_t", "app", "plain_t", 7L)))
  }

  test("drop removes the table; ddl on unknown tables is a no-op") {
    val reg = SchemaRegistry().applyAll(Seq(
      CreateTable("app", "t", Seq(ColumnDef("id", "bigint")), t0),
      DropTable("app", "t", t0 + 1),
      AddColumn("app", "ghost", ColumnDef("x", "int"), t0 + 2)))
    assert(reg.asOf("app", "t", t0 + 99).isEmpty)
    assert(reg.latest("app", "ghost").isEmpty)
  }

  test("barrier plan splits DML at DDL commit-ts with evolving snapshots") {
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val tsCuts = env.select("_commit_ts").orderBy("_commit_ts")
      .collect().map(_.getLong(0))
    val (cut1, cut2) = (tsCuts(300), tsCuts(700))
    val baseCols = Seq(ColumnDef("user_id", "bigint"), ColumnDef("value", "double"))
    val initial = SchemaRegistry().applyAll(
      (0 until 4).map(i => CreateTable("app", s"events_$i", baseCols, 0L)))
    val ddls = Seq[DdlAction](
      AddColumn("app", "events_0", ColumnDef("k", "bigint"), cut1),
      DropTable("app", "events_1", cut2))
    val steps = DdlBarrier.plan(env, ddls, initial)
    assert(steps.length == 3)
    // batches tile the stream exactly
    assert(steps.map(_.batch.count()).sum == env.count())
    assert(steps(0).batch.agg(max("_commit_ts")).head().getLong(0) < cut1)
    // registry evolves per step
    assert(steps(0).registry.latest("app", "events_0").get.columns.size == 2)
    assert(steps(1).registry.latest("app", "events_0").get.columns.size == 3)
    assert(steps(1).registry.latest("app", "events_1").isDefined)
    assert(steps(2).registry.latest("app", "events_1").isEmpty)
    // conform: k is null before its AddColumn, populated after
    val before = DdlBarrier.conform(steps(0), Seq("user_id", "value", "k"))
    assert(before.filter(col("k").isNotNull).count() == 0)
    val after = DdlBarrier.conform(steps(1), Seq("user_id", "value", "k"))
    assert(after.filter(col("_table") === "events_0" &&
      col("_op") =!= "D" && col("k").isNotNull).count() > 0)
  }

  test("conform surfaces AddColumn defaults for columns absent from the data") {
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val initial = SchemaRegistry().applyAll((0 until 4).map(i =>
      CreateTable("app", s"events_$i", Seq(
        ColumnDef("user_id", "bigint"),
        ColumnDef("value", "double"),
        ColumnDef("flag", "bigint", Some("7"))), 0L)))
    val steps = DdlBarrier.plan(env, Seq.empty, initial)
    // data physically carries user_id/value only; flag exists in the
    // schema with default 7 -> every row surfaces it
    val out = DdlBarrier.conform(steps.head, Seq("user_id", "value"))
    assert(out.columns.contains("flag"))
    assert(out.filter(col("flag") =!= 7L).count() == 0)
    assert(out.filter(col("flag") === 7L).count() == out.count())
  }

  test("schema GC: truncateBelow keeps every as-of read at or above gcTs " +
      "identical and bounds the version map (schemastore GC analog)") {
    // a long DDL stream: 200 alternating add/drop versions on one
    // table, plus a second table with sparse history and a third
    // created only after the GC point
    val base = Seq(ColumnDef("user_id", "bigint"), ColumnDef("value", "double"))
    val churn: Seq[DdlAction] =
      CreateTable("app", "hot", base, 100L) +: (1 to 200).map { i =>
        if (i % 2 == 1)
          AddColumn("app", "hot", ColumnDef(s"c$i", "bigint"), 100L + i * 10)
        else DropColumn("app", "hot", s"c${i - 1}", 100L + i * 10)
      }
    val sparse = Seq[DdlAction](
      CreateTable("app", "cold", base, 50L),
      AddColumn("app", "cold", ColumnDef("z", "bigint"), 120L))
    val late = Seq[DdlAction](
      CreateTable("app", "young", base, 5000L))
    val reg = SchemaRegistry().applyAll(churn ++ sparse ++ late)
    val gcTs = 100L + 150 * 10 + 5 // between versions 150 and 151
    val gced = reg.truncateBelow(gcTs)
    // every lookup at or above gcTs is identical, table by table
    val probes = (gcTs to gcTs + 600 by 7) ++ Seq(gcTs, 100L + 200 * 10, 6000L)
    for (t <- Seq("hot", "cold", "young"); ts <- probes)
      assert(gced.asOf("app", t, ts) == reg.asOf("app", t, ts),
        s"asOf($t, $ts) changed across GC")
    // size is bounded: hot keeps 1 floor + 50 post-gc versions
    assert(reg.versions(("app", "hot")).size == 201)
    assert(gced.versions(("app", "hot")).size == 51)
    // cold collapses to its floor snapshot only
    assert(gced.versions(("app", "cold")).size == 1)
    // a table younger than gcTs is untouched
    assert(gced.versions(("app", "young")).size == 1)
    assert(gced.versionCount < reg.versionCount)
    // reads below the floor are forfeited by contract (the changefeed
    // can never re-emit below its checkpoint): cold's pre-floor
    // version is gone, while reads from its floor on still resolve
    assert(gced.asOf("app", "cold", 60L).isEmpty &&
      reg.asOf("app", "cold", 60L).nonEmpty)
    assert(gced.asOf("app", "cold", 130L).get.versionTs == 120L)

    // barrier replay across a truncation stays correct: planning the
    // post-gc stream against the GCed registry gives the same per-step
    // snapshots as against the full registry
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val tsCuts = env.select("_commit_ts").orderBy("_commit_ts")
      .collect().map(_.getLong(0))
    val cut = tsCuts(500)
    val initialFull = SchemaRegistry().applyAll(
      (0 until 4).flatMap(i => Seq[DdlAction](
        CreateTable("app", s"events_$i", base, 0L),
        AddColumn("app", s"events_$i", ColumnDef("k", "bigint"), 10L),
        DropColumn("app", s"events_$i", "k", 20L))))
    val initialGc = initialFull.truncateBelow(tsCuts(0))
    val ddls = Seq[DdlAction](
      AddColumn("app", "events_0", ColumnDef("k", "bigint", Some("42")), cut))
    val stepsFull = DdlBarrier.plan(env, ddls, initialFull)
    val stepsGc = DdlBarrier.plan(env, ddls, initialGc)
    assert(stepsFull.length == stepsGc.length)
    stepsFull.zip(stepsGc).foreach { case (a, b) =>
      assert(a.registry.latest("app", "events_0").map(_.columns) ==
        b.registry.latest("app", "events_0").map(_.columns))
      assert(a.batch.count() == b.batch.count())
    }
  }

  test("barrier compaction at a checkpoint: folded DDLs + GCed registry " +
      "re-plan the remaining stream step-for-step identically") {
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val tsCuts = env.select("_commit_ts").orderBy("_commit_ts")
      .collect().map(_.getLong(0))
    val (cut1, ckpt, cut2) = (tsCuts(200), tsCuts(450), tsCuts(700))
    val base = Seq(ColumnDef("user_id", "bigint"), ColumnDef("value", "double"))
    val initial = SchemaRegistry().applyAll(
      (0 until 4).map(i => CreateTable("app", s"events_$i", base, 0L)))
    val ddls = Seq[DdlAction](
      AddColumn("app", "events_0", ColumnDef("k", "bigint", Some("1")), cut1),
      AddColumn("app", "events_1", ColumnDef("z", "bigint"), cut2))
    // the feed has checkpointed past cut1: compact folds it in and
    // GCs the registry below the checkpoint
    val (initC, ddlsC) = DdlBarrier.compact(initial, ddls, ckpt)
    assert(ddlsC.map(_.ts) == Seq(cut2), "only the pending DDL survives")
    assert(initC.latest("app", "events_0").get.columns.map(_.name) ==
      Seq("user_id", "value", "k"), "folded DDL is in the compacted registry")
    assert(initC.versions(("app", "events_0")).size == 1, "history below ckpt GCed")
    // planning the post-checkpoint stream: identical steps either way
    val remaining = env.filter(col("_commit_ts") > ckpt)
    val full = DdlBarrier.plan(remaining, ddls.filter(_.ts > ckpt),
      initial.applyAll(ddls.filter(_.ts <= ckpt)))
    val compacted = DdlBarrier.plan(remaining, ddlsC, initC)
    assert(full.length == compacted.length)
    full.zip(compacted).foreach { case (a, b) =>
      assert(a.upToTs == b.upToTs)
      assert(a.batch.count() == b.batch.count())
      for (t <- 0 until 4)
        assert(a.registry.latest("app", s"events_$t").map(_.columns) ==
          b.registry.latest("app", s"events_$t").map(_.columns))
      // conformance over a step is byte-identical too
      val ca = DdlBarrier.conform(a, Seq("user_id", "value", "k"))
      val cb = DdlBarrier.conform(b, Seq("user_id", "value", "k"))
      assert(ca.exceptAll(cb).count() == 0 && cb.exceptAll(ca).count() == 0)
    }
  }

  test("DEFAULT CURRENT_TIMESTAMP fills with the schema version's commit ts") {
    // ddl_default_current_timestamp coverage: the reference fills with
    // the DDL execution time; here deterministically the version ts
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val versionTs = 1700000000123456000L
    val initial = SchemaRegistry().applyAll((0 until 4).map(i =>
      CreateTable("app", s"events_$i", Seq(
        ColumnDef("user_id", "bigint"),
        ColumnDef("value", "double"),
        ColumnDef("created_at", "datetime", Some("CURRENT_TIMESTAMP"))), versionTs)))
    val out = DdlBarrier.conform(
      DdlBarrier.plan(env, Seq.empty, initial).head, Seq("user_id", "value"))
    val expected = java.time.Instant.ofEpochSecond(0, versionTs)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    val got = out.select(col("created_at")).distinct().collect().map(_.getString(0))
    assert(got.toSeq == Seq(expected), s"got ${got.toSeq}, want $expected")
  }

  test("drop tombstones (not erases): as-of below the drop still answers, " +
      "RECOVER resurrects the pre-drop shape, liveTables tracks the census " +
      "(multi_version.go:209-216 deleteVersion semantics)") {
    val reg = SchemaRegistry().applyAll(Seq(
      CreateTable("app", "t", Seq(ColumnDef("id", "bigint"),
        ColumnDef("v", "bigint")), 10L),
      DropTable("app", "t", 100L)))
    assert(reg.asOf("app", "t", 50L).isDefined, "pre-drop as-of still answers")
    assert(reg.asOf("app", "t", 150L).isEmpty && reg.latest("app", "t").isEmpty)
    assert(reg.liveTables.isEmpty)
    val rec = reg.apply(RecoverTable("app", "t", 200L))
    assert(rec.asOf("app", "t", 150L).isEmpty, "the dropped window stays dark")
    assert(rec.asOf("app", "t", 250L).map(_.columns.map(_.name)) ==
      Some(Seq("id", "v")))
    assert(rec.liveTables == Seq(("app", "t")))
    // drop + re-CREATE also revives (fresh table under the same name)
    val recreated = reg.apply(
      CreateTable("app", "t", Seq(ColumnDef("k", "bigint")), 300L))
    assert(recreated.latest("app", "t").map(_.columns.map(_.name)) ==
      Some(Seq("k")))
    // recover of a never-dropped or unknown table is a no-op
    assert(reg.apply(RecoverTable("app", "ghost", 400L)).liveTables.isEmpty)
  }

  test("GC removes tables dead below the horizon entirely (drop below gcTs, " +
      "no later event -> unrecoverable, chain and tombstones go)") {
    val reg = SchemaRegistry().applyAll(Seq(
      CreateTable("app", "dead", Seq(ColumnDef("id", "bigint")), 10L),
      DropTable("app", "dead", 20L),
      CreateTable("app", "alive", Seq(ColumnDef("id", "bigint")), 10L),
      CreateTable("app", "back", Seq(ColumnDef("id", "bigint")), 10L),
      DropTable("app", "back", 20L),
      RecoverTable("app", "back", 500L)))
    val gced = reg.truncateBelow(100L)
    assert(!gced.versions.contains(("app", "dead")),
      "dead-below-horizon chains are fully collected")
    assert(gced.asOf("app", "alive", 100L).isDefined)
    // a RECOVER above the horizon keeps the chain alive through GC
    assert(gced.asOf("app", "back", 600L).isDefined)
    assert(gced.asOf("app", "back", 100L).isEmpty, "still dark mid-window")
  }
}
