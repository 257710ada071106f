package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pulsar sink (SURVEY §2.8; reference downstreamadapter/sink/pulsar/,
  * pkg/sink/pulsar).
  *
  * The pulsar-spark connector consumes a frame with `__topic`,
  * `__key`, `value` (+ optional `__eventTime`) columns. No connector
  * jar or broker exists in this environment — as with [[KafkaSink]],
  * [[prepare]] builds the exact contract frame (tested), [[write]]
  * wires the writer, and only the connector itself is untestable
  * offline.
  *
  * Pulsar-specific routing: the `key` partition rule
  * (eventrouter/partition/key.go:31) dispatches every message with one
  * constant user key — pass `constantKey` to pin it; otherwise the key
  * renders from the routing key columns like Kafka.
  */
object PulsarSink {

  def prepare(encoded: DataFrame, keyCols: Seq[String],
              constantKey: Option[String] = None): DataFrame = {
    val key = constantKey.map(k => lit(k)).getOrElse {
      val keyVals = keyCols.map { f =>
        when(col("_op") === "D", col(s"before.$f")).otherwise(col(s"after.$f"))
      }
      concat_ws("|", (col("_schema") +: col("_table") +: keyVals)
        .map(_.cast("string")): _*)
    }
    encoded.select(
      col("_topic").as("__topic"),
      key.as("__key"),
      (col("_commit_ts") / lit(1000000L)).cast("timestamp").as("__eventTime"),
      col("_value").cast("binary").as("value"))
  }

  /** Streaming write (batch variant: `.write` instead). Client auth
    * (token / token-file / basic / oauth2 / mTLS, factory.go:95
    * setupAuthentication order) and producer tuning ride as
    * `pulsar.client.*` / `pulsar.producer.*` options —
    * [[graft.model.Security.pulsarOptions]] renders the reference's
    * `[sink.pulsar-config]` block onto the connector. */
  def write(prepared: DataFrame, serviceUrl: String, adminUrl: String,
            checkpointDir: String,
            config: graft.model.Security.PulsarConfig = graft.model.Security.PulsarConfig())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = prepared.writeStream
      .format("pulsar")
      .option("service.url", serviceUrl)
      .option("admin.url", adminUrl)
      .option("checkpointLocation", checkpointDir)
    graft.model.Security.pulsarOptions(config)
      .foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
      .start()
  }
}
