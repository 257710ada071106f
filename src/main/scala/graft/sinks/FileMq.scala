package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-process MQ emulation — the broker this sandbox lacks — so the
  * Kafka/Pulsar sink path is verifiable END-TO-END offline: an
  * append-only log per (topic, partition) with monotonic offsets,
  * at-least-once producer semantics, and an offset-ordered consumer
  * view (the guarantees the reference's MQ sinks rely on:
  * per-partition order, replay-safe appends,
  * downstreamadapter/sink/kafka/sink.go).
  *
  * Layout: parquet under `baseDir` partitioned by (topic, partition);
  * an offset is (batch_seq, offset_in_batch) — a producer batch is a
  * segment append. A replayed batch re-appends with its ORIGINAL
  * batch_seq (the streaming checkpoint replays the same batch id), so
  * consumers dedupe replays by distinct offset — exactly-once
  * consumption over at-least-once delivery, the reference's model.
  */
object FileMq {

  /** Append one producer batch of the Kafka contract frame
    * (`topic`, `partition`, `key`, `value`). `orderBy` pins arrival
    * order within each (topic, partition) — the sink feeds rows in
    * per-key commit order, so pass that ordering. */
  def append(prepared: DataFrame, baseDir: String, batchSeq: Long,
             orderBy: Seq[Column]): Unit = {
    val w = Window.partitionBy(col("topic"), col("partition")).orderBy(orderBy: _*)
    prepared
      .withColumn("batch_seq", lit(batchSeq))
      .withColumn("offset_in_batch", row_number().over(w).cast("long"))
      .write.mode("append").partitionBy("topic", "partition").parquet(baseDir)
  }

  /** Consumer view: replay-deduped, offset-ordered log with a dense
    * per-partition `offset`. */
  def read(spark: SparkSession, baseDir: String): DataFrame = {
    val w = Window.partitionBy(col("topic"), col("partition"))
      .orderBy(col("batch_seq"), col("offset_in_batch"))
    spark.read.parquet(baseDir)
      .dropDuplicates("topic", "partition", "batch_seq", "offset_in_batch")
      .withColumn("offset", (row_number().over(w) - 1).cast("long"))
  }
}
