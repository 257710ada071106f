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
      .select(col("user_id"), (col("session_start") / 1000L).cast("long").as("start_us"),
        col("n_events"))

    // native session_window over the same µs-truncated event time
    val tsUs = ((col("ts").cast("long") -
      pmod(col("ts").cast("long"), lit(1000L))) / lit(1000L)).cast("long")
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
}
