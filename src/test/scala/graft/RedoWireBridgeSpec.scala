package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.sinks.{JdbcApplier, RedoWire, RedoWireBridge}
import graft.sinks.RedoWire._

/** The redo-wire interop bridge end to end: an envelope window written
  * as a REFERENCE-FORMAT redo directory, then recovered from those
  * bytes alone — decoded, windowed, rendered as the idempotent replay
  * statement stream and applied on real JDBC (what `cdc redo apply`
  * does with the same files: pkg/applier/redo.go). */
class RedoWireBridgeSpec extends SparkFunSuite {

  /** (rowId, op, userId, value, k) — the JdbcApplierSpec fixture
    * shape: tables t0/t1 by user parity, U pre-image = value-1, k-1. */
  private def mkEnv(rows: Seq[(Long, String, Long, Double, Long)]): DataFrame = {
    import spark.implicits._
    val base = rows.toDF("_row_id", "_op", "user_id", "value", "k")
      .withColumn("_schema", lit("app"))
      .withColumn("_table", concat(lit("t"), pmod(col("user_id"), lit(2L))))
      .withColumn("_commit_ts", lit(1000000000L) + col("_row_id") * 1000L)
      .withColumn("_start_ts", col("_commit_ts") - 1L)
    val img = struct(col("user_id"), col("value"), col("k"))
    val pre = struct(col("user_id"), (col("value") - 1.0).as("value"), (col("k") - 1L).as("k"))
    base.select(
      col("_row_id"), col("_schema"), col("_table"), col("_op"),
      col("_commit_ts"), col("_start_ts"),
      when(col("_op") === "I", lit(null)).otherwise(
        when(col("_op") === "D", img).otherwise(pre)).as("before"),
      when(col("_op") === "D", lit(null)).otherwise(img).as("after"))
  }

  test("envelope -> reference-format dir -> records round trip preserves values") {
    val dir = Files.createTempDirectory("graft-wirebridge-rt").toString
    val env = mkEnv(Seq(
      (1L, "I", 2L, 10.5, 100L),
      (2L, "U", 2L, 11.25, 101L),
      (3L, "D", 4L, 7.0, 50L)))
    RedoWireBridge.writeDirFromEnvelope(env, dir, Seq("user_id"),
      checkpointTs = 0L, resolvedTs = Long.MaxValue)
    val (_, _, rdd) = RedoWireBridge.recordsFromDir(spark, dir)
    val recs = rdd.collect().collect { case DmlRecord(d) => d }
      .sortBy(_.commitTs)
    assert(recs.map(_.op).toSeq == Seq("I", "U", "D"))
    val ins = recs(0)
    assert(ins.schema == "app" && ins.table == "t0")
    assert(ins.cols.map(_.name) == Seq("user_id", "value", "k"))
    assert(ins.values.map(_.value) == Seq(2L, 10.5, 100L))
    assert(ins.values.head.handleKey && !ins.values(1).handleKey)
    val upd = recs(1)
    assert(upd.preValues.map(_.value) == Seq(2L, 10.25, 100L))
    assert(upd.values.map(_.value) == Seq(2L, 11.25, 101L))
    val del = recs(2)
    assert(del.values.isEmpty && del.preValues.map(_.value) == Seq(4L, 7.0, 50L))
  }

  test("statement stream from the wire bytes: idempotent forms, window, key-change split") {
    val dir = Files.createTempDirectory("graft-wirebridge-st").toString
    val env = mkEnv(Seq(
      (1L, "I", 2L, 10.0, 100L),   // commit 1000001000 — below ckpt
      (2L, "I", 3L, 20.0, 200L),
      (3L, "U", 3L, 21.0, 201L),
      (4L, "D", 2L, 10.0, 100L),
      (5L, "I", 5L, 50.0, 500L)))  // commit 1000005000 — above resolved
    RedoWireBridge.writeDirFromEnvelope(env, dir, Seq("user_id"),
      checkpointTs = 1000001000L, resolvedTs = 1000004000L)
    val stmts = RedoWireBridge.statementsFromDir(spark, dir, numWorkers = 4)
      .orderBy(col("_apply_order"), col("_commit_ts"), col("_row_id"))
      .collect()
    assert(stmts.length == 3, s"window must keep 3 of 5: ${stmts.mkString("\n")}")
    assert(stmts.forall(r => r.getAs[String]("_stmt").startsWith("REPLACE INTO") ||
      r.getAs[String]("_stmt").startsWith("DELETE FROM")))
    assert(stmts(0).getAs[String]("_stmt") ==
      "REPLACE INTO `app`.`t1` (`user_id`,`value`,`k`) VALUES (3,20.0,200)")
    // same-key update: one REPLACE, no split
    assert(stmts(1).getAs[String]("_stmt") ==
      "REPLACE INTO `app`.`t1` (`user_id`,`value`,`k`) VALUES (3,21.0,201)")
    assert(stmts(2).getAs[String]("_stmt") ==
      "DELETE FROM `app`.`t0` WHERE `user_id` = 2 LIMIT 1")

    // a handle-key-changing update splits into DELETE + REPLACE
    val dir2 = Files.createTempDirectory("graft-wirebridge-split").toString
    val rec = DmlRecord(RedoDml(9L, 10L, "app", "t0", 0L, isPartition = false,
      cols = Seq(RedoCol("user_id", 8), RedoCol("value", 5)),
      values = Seq(RedoColVal(4L, false, HandleKeyFlag), RedoColVal(1.5, false, 0L)),
      preValues = Seq(RedoColVal(2L, false, HandleKeyFlag), RedoColVal(1.0, false, 0L))))
    RedoWire.writeDir(dir2, Seq(rec), checkpointTs = 0L, resolvedTs = 10L)
    val split = RedoWireBridge.statementsFromDir(spark, dir2, numWorkers = 4)
      .orderBy(col("_op")).collect().map(_.getAs[String]("_stmt"))
    assert(split.toSeq == Seq(
      "DELETE FROM `app`.`t0` WHERE `user_id` = 2 LIMIT 1",
      "REPLACE INTO `app`.`t0` (`user_id`,`value`) VALUES (4,1.5)"))
  }

  test("recovery from the wire bytes alone converges real JDBC to the envelope state") {
    val dir = Files.createTempDirectory("graft-wirebridge-jdbc").toString
    val env = mkEnv(Seq(
      (1L, "I", 2L, 10.0, 100L),
      (2L, "I", 3L, 20.0, 200L),
      (3L, "U", 3L, 21.5, 201L),
      (4L, "I", 4L, 40.0, 400L),
      (5L, "D", 4L, 40.0, 400L),
      (6L, "U", 2L, 12.0, 102L)))
    RedoWireBridge.writeDirFromEnvelope(env, dir, Seq("user_id"),
      checkpointTs = 0L, resolvedTs = Long.MaxValue)
    val a = JdbcApplier.inMemory("wirebridge")
    Seq("t0", "t1").foreach { t =>
      a.createTable("app", t,
        Seq("user_id" -> "BIGINT", "value" -> "DOUBLE", "k" -> "BIGINT"),
        Seq("user_id"))
    }
    val stmts = RedoWireBridge.statementsFromDir(spark, dir, numWorkers = 1)
      .orderBy(col("_apply_order"), col("_commit_ts"), col("_row_id"))
      .select("_stmt").collect().map(_.getString(0))
    a.execute(stmts.iterator)
    // the downstream must equal the envelope's materialized state
    val expected = graft.operators.Materialize.tableState(env)
      .select(col("_table"), col("user_id"), col("value"), col("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val actual = Seq("t0", "t1").flatMap { t =>
      a.tableRows("app", t, Seq("user_id", "value", "k")).map { r =>
        (t, r(0).toString.toLong, r(1).toString.toDouble, r(2).toString.toLong)
      }
    }.sortBy(t => (t._1, t._2))
    assert(actual == expected, s"downstream $actual != envelope state $expected")
  }

  test("DDL records ride the statement stream as -1-partition barriers, DML-first at equal ts") {
    val dir = Files.createTempDirectory("graft-wirebridge-ddl").toString
    val cols = Seq(RedoCol("id", 3))
    val dml = DmlRecord(RedoDml(9L, 10L, "app", "t0", 0L, isPartition = false,
      cols, Seq(RedoColVal(1L, false, HandleKeyFlag)), Nil))
    val ddl = DdlRecord(RedoDdl(9L, 10L, "ALTER TABLE app.t0 ADD COLUMN c INT",
      5, "app", "t0"))
    RedoWire.writeDir(dir, Seq(dml, ddl), checkpointTs = 0L, resolvedTs = 10L)
    val rows = RedoWireBridge.statementsFromDir(spark, dir, numWorkers = 4)
      .orderBy(col("_apply_order")).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("_op") != "DDL", "DML applies first at equal ts")
    assert(rows(1).getAs[String]("_op") == "DDL" &&
      rows(1).getAs[Long]("_partition") == -1L)
    assert(rows(1).getAs[String]("_stmt") == "ALTER TABLE app.t0 ADD COLUMN c INT")
  }

  test("randomized 200-op stream: wire-bytes recovery converges JDBC to the model state") {
    val rnd = new scala.util.Random(7)
    // driver-side model of the upstream table: key -> (value, k)
    val state = scala.collection.mutable.Map.empty[Long, (Double, Long)]
    val ops = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Double, Long, Double, Long)]
    var rowId = 1L
    while (ops.length < 200) {
      val choice = rnd.nextInt(3)
      if (choice == 0 || state.isEmpty) { // insert a fresh key
        var key = rnd.nextInt(500).toLong
        while (state.contains(key)) key = rnd.nextInt(500).toLong
        val v = (math.round(rnd.nextDouble() * 1000) / 4.0, rnd.nextInt(1000).toLong)
        state(key) = v
        ops += ((rowId, "I", key, v._1, v._2, 0.0, 0L))
      } else {
        val key = state.keys.toSeq(rnd.nextInt(state.size))
        val (pv, pk) = state(key)
        if (choice == 1) { // update in place (handle key unchanged)
          val v = (math.round(rnd.nextDouble() * 1000) / 4.0, rnd.nextInt(1000).toLong)
          state(key) = v
          ops += ((rowId, "U", key, v._1, v._2, pv, pk))
        } else { // delete
          state.remove(key)
          ops += ((rowId, "D", key, pv, pk, 0.0, 0L))
        }
      }
      rowId += 1
    }
    // envelope with TRUE pre-images from the model
    import org.apache.spark.sql.types._
    val payload = StructType(Seq(StructField("user_id", LongType),
      StructField("value", DoubleType), StructField("k", LongType)))
    val schema = StructType(Seq(
      StructField("_row_id", LongType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_op", StringType),
      StructField("_commit_ts", LongType), StructField("_start_ts", LongType),
      StructField("before", payload), StructField("after", payload)))
    val rows = ops.map { case (id, op, key, v, kk, pv, pk) =>
      val after = if (op == "D") null else Row(key, v, kk)
      val before = op match {
        case "I" => null
        case "D" => Row(key, v, kk)
        case _ => Row(key, pv, pk)
      }
      Row(id, "app", "rt", op, 1000000L + id * 1000L, 999999L + id * 1000L,
        before, after)
    }.toSeq
    val env = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    val dir = Files.createTempDirectory("graft-wirebridge-rand").toString
    RedoWireBridge.writeDirFromEnvelope(env, dir, Seq("user_id"),
      checkpointTs = 0L, resolvedTs = Long.MaxValue)
    val a = JdbcApplier.inMemory("wirebridge_rand")
    a.createTable("app", "rt",
      Seq("user_id" -> "BIGINT", "value" -> "DOUBLE", "k" -> "BIGINT"),
      Seq("user_id"))
    val stmts = RedoWireBridge.statementsFromDir(spark, dir, numWorkers = 1)
      .orderBy(col("_apply_order"), col("_commit_ts"), col("_row_id"))
      .select("_stmt").collect().map(_.getString(0))
    a.execute(stmts.iterator)
    // replaying the same window a second time must be a no-op
    // (idempotent safe-mode forms)
    a.execute(stmts.iterator)
    val actual = a.tableRows("app", "rt", Seq("user_id", "value", "k"))
      .map(r => (r(0).toString.toLong, r(1).toString.toDouble, r(2).toString.toLong))
      .sortBy(_._1)
    val expected = state.toSeq.map { case (key, (v, kk)) => (key, v, kk) }
      .sortBy(_._1)
    assert(actual == expected,
      s"downstream diverged: ${actual.diff(expected)} vs ${expected.diff(actual)}")
  }

  test("DDL export: an appendDdl-shaped frame lands as a wire ddl log file") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-wire-ddlout").toString
    RedoWireBridge.writeDirFromEnvelope(mkEnv(Seq((1L, "I", 2L, 1.0, 1L))),
      dir, Seq("user_id"), 0L, Long.MaxValue)
    RedoWireBridge.writeDdlLog(
      Seq(("app", "t0", 1000002000L, "ALTER TABLE t0 ADD COLUMN c INT"))
        .toDF("_schema", "_table", "_commit_ts", "query"), dir)
    val names = new java.io.File(dir).list().toSeq
    assert(names.exists(_.contains("_ddl_")), s"no ddl log in $names")
    val (_, _, rdd) = RedoWireBridge.recordsFromDir(spark, dir)
    val ddls = rdd.collect().collect { case DdlRecord(d) => d }
    assert(ddls.map(_.query).toSeq == Seq("ALTER TABLE t0 ADD COLUMN c INT"))
    assert(ddls.head.commitTs == 1000002000L && ddls.head.schema == "app")
  }

  test("compressed export: lz4 whole-file logs read back identical to the " +
      "uncompressed export (reader auto-detects by magic)") {
    import spark.implicits._
    val env = mkEnv(Seq(
      (1L, "I", 2L, 10.5, 100L),
      (2L, "U", 2L, 11.25, 101L),
      (3L, "D", 4L, 7.0, 50L),
      (4L, "I", 5L, 3.25, 7L)))
    val ddl = Seq(("app", "t0", 1000002500L, "ALTER TABLE t0 ADD COLUMN c INT"))
      .toDF("_schema", "_table", "_commit_ts", "query")
    def export(compress: Boolean): String = {
      val dir = Files.createTempDirectory(
        s"graft-wire-lz4-$compress").toString
      RedoWireBridge.writeDirFromEnvelope(env, dir, Seq("user_id"),
        checkpointTs = 0L, resolvedTs = Long.MaxValue, compress = compress)
      RedoWireBridge.writeDdlLog(ddl, dir, compress = compress)
      dir
    }
    val plain = export(compress = false)
    val lz4 = export(compress = true)
    // the compressed files really are lz4 frames (magic 0x04224D18)
    val logs = new java.io.File(lz4).listFiles().filter(_.getName.endsWith(".log"))
    assert(logs.nonEmpty)
    logs.foreach { f =>
      val head = java.nio.file.Files.readAllBytes(f.toPath).take(4)
      assert(head.sameElements(Array[Byte](0x04, 0x22, 0x4d, 0x18)),
        s"${f.getName} is not lz4-framed")
    }
    // decoded record streams are identical
    def canon(dir: String): Seq[String] = {
      val (ck, rs, rdd) = RedoWireBridge.recordsFromDir(spark, dir)
      assert(ck == 0L && rs == Long.MaxValue)
      rdd.collect().map {
        case DmlRecord(d) => s"dml|${d.commitTs}|${d.table}|${d.op}|" +
          d.values.map(_.value).mkString(",") + "|" +
          d.preValues.map(_.value).mkString(",")
        case DdlRecord(d) => s"ddl|${d.commitTs}|${d.query}"
      }.sorted.toSeq
    }
    assert(canon(lz4) == canon(plain))
    // and the idempotent statement stream agrees too
    val sPlain = RedoWireBridge.statementsFromDir(spark, plain, numWorkers = 2)
      .select("_stmt").collect().map(_.getString(0)).sorted.toSeq
    val sLz4 = RedoWireBridge.statementsFromDir(spark, lz4, numWorkers = 2)
      .select("_stmt").collect().map(_.getString(0)).sorted.toSeq
    assert(sLz4 == sPlain && sPlain.nonEmpty)
  }

  test("RedoApply auto-detects a reference-format dir vs our parquet layout") {
    val wire = Files.createTempDirectory("graft-wire-detect").toString
    RedoWire.writeDir(wire, Seq(DdlRecord(RedoDdl(1L, 2L, "CREATE TABLE s.t (a INT)",
      3, "s", "t"))), checkpointTs = 0L, resolvedTs = 2L)
    assert(RedoApply.isReferenceFormat(wire))
    val ours = Files.createTempDirectory("graft-ours-detect").toString
    graft.sinks.RedoLog.append(mkEnv(Seq((1L, "I", 2L, 1.0, 1L))), ours)
    assert(!RedoApply.isReferenceFormat(ours))
    assert(!RedoApply.isReferenceFormat(
      Files.createTempDirectory("graft-empty-detect").toString))
  }

  test("unsigned u64 values cross the wire as DECIMAL(20,0) and render full-range") {
    val dir = Files.createTempDirectory("graft-wirebridge-u64").toString
    import org.apache.spark.sql.types._
    val payload = StructType(Seq(StructField("v64", DecimalType(20, 0))))
    val schema = StructType(Seq(
      StructField("_row_id", LongType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_op", StringType),
      StructField("_commit_ts", LongType), StructField("_start_ts", LongType),
      StructField("before", payload), StructField("after", payload)))
    val big = new java.math.BigDecimal("17156792991891826145") // > Long.Max
    val env = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "app", "u", "I", 10L, 9L, null, Row(big))), 1), schema)
    RedoWireBridge.writeDirFromEnvelope(env, dir, Seq("v64"), 0L, 10L)
    val (_, _, rdd) = RedoWireBridge.recordsFromDir(spark, dir)
    val rec = rdd.collect().collect { case DmlRecord(d) => d }.head
    // the wire carries the u64 bit pattern; jvmValue restores the value
    assert(RedoWireBridge.jvmValue(rec.values.head) == big)
    val stmt = RedoWireBridge.statementsFromDir(spark, dir, numWorkers = 1)
      .collect().head.getAs[String]("_stmt")
    assert(stmt == "REPLACE INTO `app`.`u` (`v64`) VALUES (17156792991891826145)")
  }
}
