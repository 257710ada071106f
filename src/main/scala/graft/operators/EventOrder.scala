package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Envelope

/** Event ordering (SURVEY §2.2/§2.12).
  *
  * The reference gets per-table commit-ts order from its LSM sort key
  * `tableID | commitTs | startTs | DMLOrder`
  * (logservice/eventstore/format.go:26-60). Here the same order is a
  * hash-partition by table + in-partition sort — one shuffle, no
  * global sort, scales linearly with table count.
  */
object EventOrder {

  /** Physically order events: co-locate each table's rows, then sort
    * within partitions by the eventstore key. This is the layout the
    * sink pipeline consumes (iteration order == commit order per
    * table). */
  def sortedByTable(env: DataFrame, numPartitions: Int = 32): DataFrame =
    env.repartition(numPartitions, col("_schema"), col("_table"))
      .sortWithinPartitions(
        col("_schema"), col("_table"), col("_commit_ts"), col("_start_ts"),
        Envelope.opOrder(col("_op")), col("_row_id"))

  /** Logical sequence number per table (deterministic, oracle-checkable
    * projection of the same order): rank of each event in its table's
    * commit order. */
  def withSequence(env: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("_schema"), col("_table"))
      .orderBy(col("_commit_ts"), col("_start_ts"),
        Envelope.opOrder(col("_op")), col("_row_id"))
    env.withColumn("_seq", row_number().over(w).cast("long"))
  }

  /** DDL↔DML merge-interleave order (event_scanner.go:617-671): DDL
    * sorts before DML at equal commit-ts. `isDdl` is a boolean column
    * on a unioned control+data frame. */
  def withInterleaveSequence(env: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("_schema"), col("_table"))
      .orderBy(col("_commit_ts"),
        when(col("_event_type") === "ddl", 0).otherwise(1),
        col("_start_ts"), col("_row_id"))
    env.withColumn("_seq", row_number().over(w).cast("long"))
  }
}
