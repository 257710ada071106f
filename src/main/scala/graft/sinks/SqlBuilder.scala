package graft.sinks

/** MySQL-dialect SQL builders — the row→SQL model of the reference
  * (pkg/sink/sqlmodel/row_change.go:86, pkg/sink/mysql/sql_builder.go:
  * buildInsert :155, buildDelete :181, buildUpdate :211, LWW :247-350;
  * batching rules mysql_writer_dml_batch.go:484-645).
  *
  * Pure Scala string builders — no Spark types — used inside
  * foreachBatch JDBC writers and unit-testable in isolation. Values
  * are passed as already-rendered SQL literals (the writer binds
  * parameters in production; literal rendering keeps the builders
  * deterministic for tests).
  */
object SqlBuilder {

  def quoteId(id: String): String = "`" + id.replace("`", "``") + "`"

  def quoteTable(schema: String, table: String): String =
    s"${quoteId(schema)}.${quoteId(table)}"

  def literal(v: Any): String = v match {
    case null               => "NULL"
    case None               => "NULL"
    case Some(x)            => literal(x)
    case s: String          => "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
    case b: Array[Byte]     => "x'" + b.map(x => f"$x%02x").mkString + "'"
    case b: Boolean         => if (b) "1" else "0"
    case d: java.math.BigDecimal => d.toPlainString
    case other              => other.toString
  }

  /** INSERT, or REPLACE when in the re-delivery safe-mode window
    * (sql_builder.go:154-155; safe mode basic_dispatcher.go:156-162). */
  def insert(schema: String, table: String, cols: Seq[String], vals: Seq[Any],
             replace: Boolean): String = {
    val verb = if (replace) "REPLACE" else "INSERT"
    s"$verb INTO ${quoteTable(schema, table)} " +
      s"(${cols.map(quoteId).mkString(",")}) " +
      s"VALUES (${vals.map(literal).mkString(",")})"
  }

  /** Multi-row INSERT/REPLACE — the same-shape batching of
    * mysql_writer_dml_batch.go:484-530. */
  def insertMulti(schema: String, table: String, cols: Seq[String],
                  rows: Seq[Seq[Any]], replace: Boolean): String = {
    val verb = if (replace) "REPLACE" else "INSERT"
    s"$verb INTO ${quoteTable(schema, table)} " +
      s"(${cols.map(quoteId).mkString(",")}) VALUES " +
      rows.map(r => s"(${r.map(literal).mkString(",")})").mkString(",")
  }

  /** Idempotent upsert (INSERT .. ON DUPLICATE KEY UPDATE) — the
    * exactly-once-on-replay form. */
  def upsert(schema: String, table: String, cols: Seq[String], vals: Seq[Any]): String = {
    val sets = cols.map(c => s"${quoteId(c)}=VALUES(${quoteId(c)})").mkString(",")
    insert(schema, table, cols, vals, replace = false) +
      s" ON DUPLICATE KEY UPDATE $sets"
  }

  /** DELETE by handle key (sql_builder.go:181). Null-safe: NULL key
    * columns compare with IS NULL. */
  def delete(schema: String, table: String, keyCols: Seq[String], keyVals: Seq[Any]): String = {
    val conds = keyCols.zip(keyVals).map {
      case (c, null) => s"${quoteId(c)} IS NULL"
      case (c, v)    => s"${quoteId(c)} = ${literal(v)}"
    }
    s"DELETE FROM ${quoteTable(schema, table)} WHERE ${conds.mkString(" AND ")}"
  }

  /** Batched delete: WHERE (k1,k2) IN ((..),(..)) — the multi-row
    * delete shape of mysql_writer_dml_batch.go. */
  def deleteMulti(schema: String, table: String, keyCols: Seq[String],
                  keyRows: Seq[Seq[Any]]): String = {
    val keys = keyCols.map(quoteId).mkString("(", ",", ")")
    val tuples = keyRows.map(r => r.map(literal).mkString("(", ",", ")")).mkString(",")
    s"DELETE FROM ${quoteTable(schema, table)} WHERE $keys IN ($tuples)"
  }

  /** Whether a key batch can use the tuple-IN (v2) forms: SQL tuple
    * IN does not match NULL the way per-column IS NULL predicates do,
    * so any NULL key value falls back to per-row statements
    * (canUseWhereClauseV2, pkg/sink/sqlmodel/multi_row.go:195-224). */
  def canBatchKeys(keyRows: Seq[Seq[Any]]): Boolean =
    keyRows.forall(_.forall(v => v != null && v != None))

  /** Batched UPDATE — the CASE-WHEN form of genUpdateSQLV2
    * (pkg/sink/sqlmodel/multi_row.go:274-350): each column updates
    * through one `col = CASE WHEN <keys = row_i> THEN v_i ... END`,
    * scoped by a trailing tuple-IN over all batched keys. Caller
    * guarantees non-null keys ([[canBatchKeys]]) and one table per
    * batch. */
  def updateMulti(schema: String, table: String,
                  setCols: Seq[String], setRows: Seq[Seq[Any]],
                  keyCols: Seq[String], keyRows: Seq[Seq[Any]]): String = {
    require(setRows.nonEmpty && setRows.length == keyRows.length,
      "one key tuple per set row")
    require(canBatchKeys(keyRows), "NULL keys cannot use the tuple-IN form")
    val whens = keyRows.map { kr =>
      keyCols.zip(kr).map { case (c, v) => s"${quoteId(c)} = ${literal(v)}" }
        .mkString(" WHEN ", " AND ", " THEN ")
    }
    val sets = setCols.zipWithIndex.map { case (c, j) =>
      s"${quoteId(c)} = CASE" +
        whens.zip(setRows).map { case (w, sr) => w + literal(sr(j)) }.mkString +
        " END"
    }
    val keys = keyCols.map(quoteId).mkString("(", ",", ")")
    val tuples = keyRows.map(r => r.map(literal).mkString("(", ",", ")")).mkString(",")
    s"UPDATE ${quoteTable(schema, table)} SET ${sets.mkString(", ")} " +
      s"WHERE $keys IN ($tuples)"
  }

  /** UPDATE .. SET .. WHERE key (sql_builder.go:211). */
  def update(schema: String, table: String, setCols: Seq[String], setVals: Seq[Any],
             keyCols: Seq[String], keyVals: Seq[Any]): String = {
    val sets = setCols.zip(setVals).map { case (c, v) => s"${quoteId(c)} = ${literal(v)}" }
    val conds = keyCols.zip(keyVals).map {
      case (c, null) => s"${quoteId(c)} IS NULL"
      case (c, v)    => s"${quoteId(c)} = ${literal(v)}"
    }
    s"UPDATE ${quoteTable(schema, table)} SET ${sets.mkString(",")} " +
      s"WHERE ${conds.mkString(" AND ")}"
  }

  /** Active-active last-writer-wins upsert (sql_builder.go:247-350,
    * mysql_writer_dml_active_active.go): each column only updates when
    * the incoming origin-ts is newer. */
  def lwwUpsert(schema: String, table: String, cols: Seq[String], vals: Seq[Any],
                originTsCol: String, originTs: Long): String = {
    val allCols = cols :+ originTsCol
    val allVals = vals :+ originTs
    val sets = cols.map { c =>
      s"${quoteId(c)}=IF(IFNULL(${quoteId(originTsCol)},0) <= VALUES(${quoteId(originTsCol)})," +
        s"VALUES(${quoteId(c)}),${quoteId(c)})"
    } :+ (s"${quoteId(originTsCol)}=IF(IFNULL(${quoteId(originTsCol)},0) <= " +
      s"VALUES(${quoteId(originTsCol)}),VALUES(${quoteId(originTsCol)}),${quoteId(originTsCol)})")
    insert(schema, table, allCols, allVals, replace = false) +
      s" ON DUPLICATE KEY UPDATE ${sets.mkString(",")}"
  }
}
