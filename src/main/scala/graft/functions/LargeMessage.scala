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
