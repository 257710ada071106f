package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.model.Envelope
import graft.streaming.TxnAssembler

/** Txns spanning micro-batches must assemble exactly once, released
  * when the watermark (resolved-ts) passes their commit time. */
class TxnAssemblerSpec extends SparkFunSuite {

  test("assembles multi-row txns across micro-batches, exactly once") {
    val tmp = Files.createTempDirectory("graft-txn").toString
    // txnify: bucket commits to the minute + user so txns have many
    // rows, then split the log into two files = two micro-batches
    val minuteNs = 60L * 1000L * 1000 * 1000
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
      .filter(col("_op") =!= "D")
      .withColumn("_commit_ts",
        col("_commit_ts") - pmod(col("_commit_ts"), lit(minuteNs)) + col("after.user_id"))
      .withColumn("_start_ts", col("_commit_ts") - 1000L)
    val half = env.count() / 2
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val work = s"$tmp/stage-$name"
      df.coalesce(1).write.parquet(work)
      val part = new java.io.File(work).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
      Files.move(part.toPath, java.nio.file.Paths.get(s"$tmp/src/$name"))
    }
    // deterministic complementary halves: tie-break the heavily-tied
    // commit-ts with the unique _row_id so no boundary row is
    // duplicated or dropped between the two files
    stage(env.orderBy(col("_commit_ts"), col("_row_id")).limit(half.toInt), "f1.parquet")
    stage(env.orderBy(col("_commit_ts").desc, col("_row_id").desc)
      .limit((env.count() - half).toInt), "f2.parquet")

    val schema = spark.read.parquet(s"$tmp/src").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/src")
    val q = TxnAssembler.assemble(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("txns")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)

    val out = spark.table("txns")
    // exactly-once: no duplicate txn keys
    assert(out.groupBy("schema", "table", "startTs", "commitTs")
      .count().filter(col("count") > 1).count() == 0)
    // every emitted txn matches the batch-computed ground truth
    val truth = env.groupBy(
        col("_schema").as("schema"), col("_table").as("table"),
        col("_start_ts").as("startTs"), col("_commit_ts").as("commitTs"))
      .agg(count(lit(1)).cast("int").as("nRows_t"), min("_row_id").as("minRowId_t"))
    val joined = out.join(truth, Seq("schema", "table", "startTs", "commitTs"))
    assert(joined.count() == out.count(), "every emitted txn exists in ground truth")
    assert(joined.filter(col("nRows") =!= col("nRows_t") ||
      col("minRowId") =!= col("minRowId_t")).count() == 0,
      "assembled contents match")
    // txns resolved by the final watermark were emitted (all but the
    // final open commit window)
    assert(out.count() > 0, "state released txns as the watermark advanced")
  }
}
