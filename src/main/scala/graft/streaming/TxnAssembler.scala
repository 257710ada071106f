package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch transaction assembly (SURVEY §2.3; reference
  * eventservice assembles `DMLEvent` batches per txn and releases them
  * when resolved-ts passes their commit-ts — event_scanner.go:119,
  * txn_scan_strategy.go "atomic" mode; the txn matcher
  * logservice/logpuller/txn_matcher.go plays the same role one layer
  * down).
  *
  * Spark-native: `flatMapGroupsWithState` keyed by txn identity with
  * an EVENT-TIME timeout at the txn's commit time — the watermark IS
  * the resolved-ts, so a txn is emitted exactly when the engine can
  * prove no more of its rows can arrive. A txn whose rows span
  * micro-batches accumulates in the state store (checkpointed,
  * exactly-once) until its timeout fires.
  */
object TxnAssembler {

  case class TxnKey(schema: String, table: String, startTs: Long, commitTs: Long)
  case class EnvRow(schema: String, table: String, startTs: Long, commitTs: Long,
                    rowId: Long, op: String, commitTime: java.sql.Timestamp)
  case class TxnBuffer(rowIds: List[Long], nInsert: Int, nUpdate: Int, nDelete: Int)
  case class AssembledTxn(schema: String, table: String, startTs: Long,
                          commitTs: Long, nRows: Int, nInsert: Int, nUpdate: Int,
                          nDelete: Int, minRowId: Long)

  /** Assemble txns on a streaming envelope. Emits each txn exactly
    * once, when the watermark (resolved-ts) passes its commit time. */
  def assemble(spark: SparkSession, env: DataFrame): Dataset[AssembledTxn] = {
    import spark.implicits._
    val rows = env
      .withColumn("_commit_time", ResolvedTs.commitTime(col("_commit_ts")))
      .withWatermark("_commit_time", "0 seconds")
      .select(
        col("_schema").as("schema"), col("_table").as("table"),
        col("_start_ts").as("startTs"), col("_commit_ts").as("commitTs"),
        col("_row_id").as("rowId"), col("_op").as("op"),
        col("_commit_time").as("commitTime"))
      .as[EnvRow]

    rows
      .groupByKey(r => TxnKey(r.schema, r.table, r.startTs, r.commitTs))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: TxnKey, it: Iterator[EnvRow], state: GroupState[TxnBuffer]) => {
          if (state.hasTimedOut) {
            // resolved-ts passed this txn's commit: release it
            val buf = state.get
            state.remove()
            Iterator.single(AssembledTxn(
              key.schema, key.table, key.startTs, key.commitTs,
              buf.rowIds.size, buf.nInsert, buf.nUpdate, buf.nDelete,
              buf.rowIds.min))
          } else {
            val prev = state.getOption.getOrElse(TxnBuffer(Nil, 0, 0, 0))
            val buf = it.foldLeft(prev) { (b, r) =>
              TxnBuffer(r.rowId :: b.rowIds,
                b.nInsert + (if (r.op == "I") 1 else 0),
                b.nUpdate + (if (r.op == "U") 1 else 0),
                b.nDelete + (if (r.op == "D") 1 else 0))
            }
            state.update(buf)
            // fire when watermark passes the commit time (+1ms so a
            // watermark exactly at commit still means "no more rows")
            state.setTimeoutTimestamp(key.commitTs / 1000000L + 1L)
            Iterator.empty
          }
        })
  }
}
