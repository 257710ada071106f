package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-message handling (SURVEY §2.5; reference
  * pkg/config/large_message.go:22-35 — options none /
  * handle-key-only / claim-check, applied in the open & canal
  * encoders; pointer message `ClaimCheckLocation` open/message.go:39).
  */
object LargeMessage {

  /** handle-key-only: oversized messages are re-encoded with only the
    * handle key (the consumer fetches the full row upstream). */
  def handleKeyOnly(encoded: DataFrame, maxBytes: Int): DataFrame = {
    val keyVal = when(col("_op") === "D", col("before.user_id"))
      .otherwise(col("after.user_id"))
    val compact = concat(
      lit("{\"_hk\":true,\"database\":\""), col("_schema"),
      lit("\",\"table\":\""), col("_table"),
      lit("\",\"user_id\":"), coalesce(keyVal.cast("string"), lit("null")),
      lit("}"))
    encoded
      .withColumn("_large", length(col("_value")) > maxBytes)
      .withColumn("_value", when(col("_large"), compact).otherwise(col("_value")))
  }

  /** MQ message batching under max-message-bytes — the encoder-group
    * packing (pkg/sink/codec/encoder_group.go; open-protocol batches
    * several events per MQ message, flushing when the next event
    * would exceed max-message-bytes, pkg/config/sink.go
    * MaxMessageBytes).
    *
    * Deterministic formulation: within each routing partition, events
    * take wire order (commit, start, DMLOrder, row id) and the batch
    * index is floor(exclusive-running-bytes / maxBytes) — a soft cap
    * (a batch may overflow by at most one message) that is
    * expressible identically in any engine, unlike the writer's
    * stateful greedy loop; the batch-count difference vs greedy is at
    * most the overflow messages. One window per partition — the same
    * per-partition sequencing the MQ producer itself needs. */
  def messageBatches(encoded: DataFrame, maxBytes: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_partition"))
      .orderBy(col("_commit_ts"), col("_start_ts"),
        graft.model.Envelope.opOrder(col("_op")), col("_row_id"))
    encoded
      .withColumn("_msg_bytes", length(col("_value")).cast("long"))
      .withColumn("_msg_batch",
        floor((sum(col("_msg_bytes")).over(w) - col("_msg_bytes")) / maxBytes))
  }

  /** Per-message compression of the wire value
    * (`large-message-handle-compression`, large_message.go:33 +
    * pkg/compression): `_value` → compressed `_value_bin` binary with
    * the codec recorded on the row (the consumer reads the codec from
    * sink config / message header, here a column). Compose AFTER
    * handle-key-only / claim-check — the reference compresses whatever
    * payload survives the large-message handling. */
  def compressed(encoded: DataFrame, codec: String): DataFrame =
    encoded
      .withColumn("_codec", lit(codec))
      .withColumn("_value_bin",
        Compression.compressCol(codec)(col("_value").cast("binary")))

  /** Consumer-side inverse of [[compressed]]. */
  def decompressed(msgs: DataFrame, codec: String): DataFrame =
    msgs.withColumn("_value",
      Compression.decompressCol(codec)(col("_value_bin")).cast("string"))

  /** claim-check: oversized payloads go to external storage; the
    * message becomes a pointer. `locationPrefix` is the storage URI
    * prefix; the uploaded object path is deterministic per row. */
  def claimCheck(encoded: DataFrame, maxBytes: Int, locationPrefix: String): DataFrame = {
    val location = concat(lit(locationPrefix), lit("/"), col("_schema"), lit("/"),
      col("_table"), lit("/"), col("_row_id").cast("string"), lit(".json"))
    val pointer = concat(
      lit("{\"claimCheckLocation\":\""), location, lit("\"}"))
    encoded
      .withColumn("_large", length(col("_value")) > maxBytes)
      .withColumn("_claim_location", when(col("_large"), location))
      .withColumn("_value", when(col("_large"), pointer).otherwise(col("_value")))
  }
}
