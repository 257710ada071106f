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
    * form of [[SqlBuilder]] for the envelope payload).
    *
    * Safe mode (the re-delivery window, basic_dispatcher.go:156-162)
    * renders both inserts and updates as REPLACE (sql_builder.go:154);
    * outside it, updates become a real UPDATE .. SET .. WHERE key
    * (sql_builder.go:211) against the PRE-image handle key. Deletes
    * always target the full handle key with null-safe comparison and
    * LIMIT 1 (sql_builder.go:181). */
  def statementColumn(safeMode: Boolean): Column = {
    val target = concat(lit("`"), col("_schema"), lit("`.`"), col("_table"), lit("`"))
    def v(c: Column): Column = coalesce(c.cast("string"), lit("NULL"))
    def money(c: Column): Column = v(c.cast(DecimalType(18, 2)))
    val keyPred = when(col("before.user_id").isNull, lit("`user_id` IS NULL"))
      .otherwise(concat(lit("`user_id` = "), col("before.user_id").cast("string")))
    val writeVerb = if (safeMode) "REPLACE" else "INSERT"
    val insertRow = concat(
      lit(s"$writeVerb INTO "), target,
      lit(" (`user_id`,`value`,`k`) VALUES ("),
      v(col("after.user_id")), lit(","),
      money(col("after.value")), lit(","),
      v(col("after.k")), lit(")"))
    val updateRow =
      if (safeMode) insertRow // REPLACE is the idempotent update during replay
      else concat(
        lit("UPDATE "), target,
        lit(" SET `user_id` = "), v(col("after.user_id")),
        lit(", `value` = "), money(col("after.value")),
        lit(", `k` = "), v(col("after.k")),
        lit(" WHERE "), keyPred, lit(" LIMIT 1"))
    val deleteRow = concat(
      lit("DELETE FROM "), target,
      lit(" WHERE "), keyPred, lit(" LIMIT 1"))
    when(col("_op") === "D", deleteRow)
      .when(col("_op") === "U", updateRow)
      .otherwise(insertRow)
  }

  /** Envelope → ordered statement stream: conflict-key partition
    * assignment + commit-order sequence + SQL text. */
  def statements(env: DataFrame, handleKeys: Seq[String], numWorkers: Int,
                 safeMode: Boolean): DataFrame =
    Routing.partitionByKeyColumns(env, handleKeys, numWorkers)
      .withColumn("_stmt", statementColumn(safeMode))
      .select(col("_partition"), col("_row_id"), col("_schema"), col("_table"),
        col("_commit_ts"), col("_start_ts"), col("_op"), col("_stmt"))

  /** DDL execution statements with async-DDL progress bookkeeping
    * (mysql_writer_ddl.go; ddl-ts table mysql_writer_for_ddl_ts.go:266;
    * table names pkg/filter/filter.go:33-36): the DDL itself followed
    * by the idempotent `tidb_cdc.ddl_ts_v1` upsert that lets a
    * restarted writer skip already-applied DDLs. */
  def ddlStatements(changefeedId: String, ddlTs: Long, query: String): Seq[String] = Seq(
    query,
    "INSERT INTO `tidb_cdc`.`ddl_ts_v1` (`ticdc_cluster_id`,`changefeed`,`ddl_ts`) " +
      s"VALUES ('default','${changefeedId.replace("'", "''")}',$ddlTs) " +
      "ON DUPLICATE KEY UPDATE `ddl_ts`=VALUES(`ddl_ts`)")

  /** Sync-point map rows (mysql_writer_for_syncpoint.go; table
    * `tidb_cdc.syncpoint_v1`): one (primary_ts, secondary_ts) row per
    * consistency window boundary — the downstream snapshot alignment
    * the reference's sync-point feature queries. */
  def syncPointStatement(changefeedId: String, primaryTs: Long, secondaryTs: Long): String =
    "INSERT IGNORE INTO `tidb_cdc`.`syncpoint_v1` " +
      "(`ticdc_cluster_id`,`changefeed`,`primary_ts`,`secondary_ts`) " +
      s"VALUES ('default','${changefeedId.replace("'", "''")}',$primaryTs,$secondaryTs)"

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

  /** Table-level transaction atomicity (AtomicityLevel `table`,
    * pkg/config/sink.go:140; SURVEY §7.4 hard part #1): all txns of a
    * table serialize through one worker partition, and each upstream
    * transaction's statements apply inside one BEGIN/COMMIT frame —
    * an upstream txn is never torn downstream. Row-level mode
    * ([[applyBatch]]) gives per-KEY order with more parallelism;
    * this gives per-TABLE order with txn frames — exactly the
    * reference's atomicity/parallelism trade. */
  def applyBatchTxnAtomic(env: DataFrame, safeMode: Boolean, numWorkers: Int)
                         (execute: Iterator[String] => Unit): Unit = {
    import org.apache.spark.sql.Encoders
    val tupleEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    env
      .withColumn("_stmt", statementColumn(safeMode))
      .withColumn("__txn", concat_ws("|",
        col("_schema"), col("_table"),
        col("_start_ts").cast("string"), col("_commit_ts").cast("string")))
      .repartition(numWorkers, col("_schema"), col("_table"))
      // per-TABLE commit order (the table-level guarantee): tables
      // sharing a worker apply sequentially, txns stay contiguous
      .sortWithinPartitions(col("_schema"), col("_table"),
        col("_commit_ts"), col("_start_ts"),
        Envelope.opOrder(col("_op")), col("_row_id"))
      .select(col("__txn"), col("_stmt"))
      .map(r => (r.getString(0), r.getString(1)))(tupleEnc)
      .foreachPartition { rows: Iterator[(String, String)] =>
        execute(new Iterator[String] {
          private var cur: Option[String] = None
          private var pending: List[String] = Nil
          def hasNext: Boolean = pending.nonEmpty || rows.hasNext || cur.isDefined
          def next(): String = pending match {
            case head :: tail => pending = tail; head
            case Nil if rows.hasNext =>
              val (txn, stmt) = rows.next()
              cur match {
                case Some(`txn`) => stmt
                case Some(_) => // close previous frame, open new one
                  cur = Some(txn); pending = List("BEGIN", stmt); "COMMIT"
                case None =>
                  cur = Some(txn); pending = List(stmt); "BEGIN"
              }
            case Nil => // trailing COMMIT
              cur = None; "COMMIT"
          }
        })
      }
  }
}
