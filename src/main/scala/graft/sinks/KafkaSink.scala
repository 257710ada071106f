package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Kafka sink (SURVEY §2.8; reference
  * downstreamadapter/sink/kafka/sink.go:47,138).
  *
  * Spark's kafka connector consumes a frame with `topic`, `key`,
  * `value` (and optional `partition`) columns — routing and encoding
  * already produced `_topic`/`_partition`/`_value`, so the sink is a
  * projection plus `.format("kafka")`. No broker exists in this
  * environment; [[prepare]] builds the exact frame and [[write]]
  * wires the writer, so the only untested piece is the connector
  * itself.
  */
object KafkaSink {

  /** Project the envelope+routing+encoding output into the kafka
    * writer contract. The message key is the routing key rendering —
    * per-key ordering downstream relies on it hashing to the same
    * Kafka partition, which `_partition` pins explicitly. */
  def prepare(encoded: DataFrame, keyCols: Seq[String],
              carry: Seq[String] = Nil): DataFrame = {
    val keyVals = keyCols.map { f =>
      when(col("_op") === "D", col(s"before.$f")).otherwise(col(s"after.$f"))
    }
    encoded.select(
      col("_topic").as("topic") +:
        col("_partition").cast("int").as("partition") +:
        concat_ws("|", (col("_schema") +: col("_table") +: keyVals)
          .map(_.cast("string")): _*).cast("binary").as("key") +:
        col("_value").cast("binary").as("value") +:
        carry.map(col): _*)
  }

  /** Streaming write (batch variant: `.write` instead). Security
    * (mTLS/SASL) rides as `kafka.`-prefixed client options —
    * [[graft.model.Security.kafkaOptions]] maps the reference's
    * credential + SASL surface (security.protocol, sasl.jaas.config,
    * PEM file options) onto the connector. */
  def write(prepared: DataFrame, bootstrapServers: String,
            checkpointDir: String,
            security: graft.model.Security.SecurityConfig = graft.model.Security.SecurityConfig())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = prepared.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("checkpointLocation", checkpointDir)
    graft.model.Security.kafkaOptions(security)
      .foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
      .start()
  }
}
