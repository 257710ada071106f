package graft

import org.apache.spark.sql.functions._
import graft.operators.Sessionize

/** The batch gap-sessionizer must agree with Structured Streaming's
  * native `session_window` (its streaming twin) on real data — same
  * sessions, same starts, same event counts. */
class SessionizeSpec extends SparkFunSuite {

  test("batch sessionize equals native session_window aggregation") {
    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    val events = Tables.events(spark, "/root/testdata/sf0.001")

    val batch = Sessionize.sessions(events, gapNs)
      .select(col("user_id"), expr("session_start div 1000").as("start_us"),
        col("n_events"))

    // native session_window over the same µs-truncated event time
    // (integer division — `/` on longs goes through double and loses
    // 1 µs at epoch-ns magnitudes)
    val tsUs = expr("CAST(ts AS BIGINT) div 1000")
    val native = events
      .select(col("user_id"), timestamp_micros(tsUs).as("__t"), col("value"))
      .groupBy(col("user_id"), session_window(col("__t"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"))

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).sorted.toSeq
    val b = canon(batch)
    assert(b.nonEmpty && b == canon(native),
      "gap sessionizer and session_window must produce identical sessions")
  }

  test("session_window runs in the streaming runtime with a watermark") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val src = s"$tmp/source"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val schema = spark.read.parquet(src).schema
    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    val q = Sessionize.streamingSessions(
        Tables.tsNanos(spark.readStream.schema(schema).parquet(src)),
        gapNs, "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_sessions")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("stream_sessions")
    // watermark-released sessions match the batch sessionizer's closed
    // sessions (the final open window per user may be withheld)
    val batchAll = Sessionize.sessions(
      Tables.events(spark, "/root/testdata/sf0.001"), gapNs)
    assert(streamed.count() > 0, "watermark released sessions")
    assert(streamed.count() <= batchAll.count())
    val streamedSet = streamed
      .select(col("user_id"), unix_micros(col("session_start")).as("su"),
        col("n_events"), col("session_value")).collect().map(_.mkString("|")).toSet
    val batchSet = batchAll
      // integer ns->us division: `/` on longs goes through double and
      // is off by 1 us for epoch-ns magnitudes (the bug the streaming
      // path fixed; the comparison must convert exactly too)
      .select(col("user_id"), expr("session_start div 1000").as("su"),
        col("n_events"), col("session_value")).collect().map(_.mkString("|")).toSet
    assert(streamedSet.subsetOf(batchSet), "every released session is a true session")
  }
}
