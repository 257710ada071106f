package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the runtime knobs the reference tunes by hand (flow control,
  * scan batching — SURVEY §2.3/§2.11) with Spark's engine-managed
  * equivalents: AQE, shuffle partition sizing, broadcast thresholds.
  *
  * `local[32]` here; on a real cluster the same builder is used with a
  * cluster master and per-executor memory — nothing below is
  * local-mode-specific except the default master.
  */
object GraftSession {

  /** Configs that must hold on ANY session running graft code (also
    * applied to externally-created sessions via [[tune]]). */
  val runtimeConfs: Map[String, String] = Map(
    // events.parquet carries ns-precision timestamps; read them as raw
    // long nanos so commit-ts arithmetic is exact and engine-portable.
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // the driver's parquet writes timestamps with isAdjustedToUTC=false;
    // without this Spark 4 infers TIMESTAMP_NTZ, which cannot cast to
    // BIGINT and diverges from the UTC-epoch arithmetic every commit-ts
    // expression (and the DuckDB oracle) assumes. Reading them as LTZ
    // under the UTC session zone restores identical epoch values.
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // dims (region/nation/supplier/part at small SF; schema registry;
    // route tables) should broadcast: keep the default 10MB threshold
    // but make the intent explicit.
    "spark.sql.autoBroadcastJoinThreshold" -> (10L * 1024 * 1024).toString,
    "spark.sql.parquet.filterPushdown" -> "true",
    "spark.sql.parquet.aggregatePushdown" -> "true"
  )

  /** Apply runtime confs to an existing session (driver-created
    * sessions included). Safe: all of these are runtime-settable. */
  def tune(spark: SparkSession): SparkSession = {
    runtimeConfs.foreach { case (k, v) =>
      try spark.conf.set(k, v)
      catch { case _: Throwable => () } // static conf on a live session
    }
    spark
  }

  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder = {
    val b = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false")
    runtimeConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
  }

  def local(cores: Int = 32): SparkSession = {
    val s = builder(s"local[$cores]", math.max(cores, 8)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
