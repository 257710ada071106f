package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.model.Envelope
import graft.operators.Routing

/** MySQL-class sink (SURVEY §2.8).
  *
  * Parallel apply with per-key ordering: instead of the reference's
  * conflict-detection DAG (downstreamadapter/sink/mysql/causality/
  * conflict_detector.go:37-160), rows hash-partition on their conflict
  * key — all statements for one key land in one partition, applied in
  * commit order by the in-partition sort. Equivalent guarantees, no
  * coordination.
  */
object MysqlSink {

  /** Render one envelope row as its MySQL statement (column-expression
    * form of [[SqlBuilder]] for the envelope payload; REPLACE form =
    * safe-mode/idempotent replay, sql_builder.go:154). */
  def statementColumn(safeMode: Boolean): Column = {
    val verb = if (safeMode) "REPLACE" else "INSERT"
    val target = concat(lit("`"), col("_schema"), lit("`.`"), col("_table"), lit("`"))
    def v(c: Column): Column = coalesce(c.cast("string"), lit("NULL"))
    val writeRow = concat(
      lit(s"$verb INTO "), target,
      lit(" (`user_id`,`value`,`k`) VALUES ("),
      v(col("after.user_id")), lit(","),
      v(col("after.value").cast(DecimalType(18, 2))), lit(","),
      v(col("after.k")), lit(")"))
    val deleteRow = concat(
      lit("DELETE FROM "), target,
      lit(" WHERE `user_id` = "), v(col("before.user_id")))
    when(col("_op") === "D", deleteRow).otherwise(writeRow)
  }

  /** Envelope → ordered statement stream: conflict-key partition
    * assignment + commit-order sequence + SQL text. */
  def statements(env: DataFrame, handleKeys: Seq[String], numWorkers: Int,
                 safeMode: Boolean): DataFrame =
    Routing.partitionByKeyColumns(env, handleKeys, numWorkers)
      .withColumn("_stmt", statementColumn(safeMode))
      .select(col("_partition"), col("_row_id"), col("_schema"), col("_table"),
        col("_commit_ts"), col("_start_ts"), col("_op"), col("_stmt"))

  /** Apply a batch: physically co-locate each conflict key's rows,
    * order by commit within the partition, then stream statements to
    * `execute` (a JDBC txn in production; pluggable for tests /
    * blackhole). Called from foreachBatch. */
  def applyBatch(env: DataFrame, handleKeys: Seq[String], numWorkers: Int,
                 safeMode: Boolean)(execute: Iterator[String] => Unit): Unit = {
    import org.apache.spark.sql.Encoders
    statements(env, handleKeys, numWorkers, safeMode)
      .repartition(numWorkers, col("_partition"))
      .sortWithinPartitions(col("_commit_ts"), col("_start_ts"),
        Envelope.opOrder(col("_op")), col("_row_id"))
      .select(col("_stmt"))
      .map(_.getString(0))(Encoders.STRING)
      .foreachPartition(execute)
  }
}
