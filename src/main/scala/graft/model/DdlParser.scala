package graft.model

/** DDL statement → [[DdlAction]] parser — the role of the reference's
  * `ParseDDLJob` (pkg/common/event/mounter.go:175) plus the action
  * classification of persist_storage_ddl_handlers.go:121-400, for the
  * row-shape-changing subset our registry models. The reference
  * delegates to TiDB's SQL parser; here a small recognizer over the
  * MySQL DDL surface is enough because only the action and its
  * arguments reach the registry.
  *
  * Supported: CREATE TABLE (column list with optional DEFAULTs),
  * ALTER TABLE ADD/DROP COLUMN, DROP TABLE, TRUNCATE TABLE,
  * RENAME TABLE a TO b. Unqualified table names resolve against
  * `defaultSchema`. Backtick-quoted identifiers are unwrapped.
  */
object DdlParser {
  import DdlAction._

  private val createTable =
    """(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([`\w.]+)\s*\((.*)\)\s*[^)]*$""".r
  private val addColumn =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+ADD\s+(?:COLUMN\s+)?`?(\w+)`?\s+(\w+(?:\(\d+(?:,\d+)?\))?)(?:\s+DEFAULT\s+('[^']*'|\S+))?.*$""".r
  private val dropColumn =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+DROP\s+(?:COLUMN\s+)?`?(\w+)`?\s*$""".r
  private val dropTable =
    """(?is)^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([`\w.]+)\s*$""".r
  private val truncateTable =
    """(?is)^\s*TRUNCATE\s+(?:TABLE\s+)?([`\w.]+)\s*$""".r
  private val renameTable =
    """(?is)^\s*RENAME\s+TABLE\s+([`\w.]+)\s+TO\s+([`\w.]+)\s*$""".r
  private val exchangePartition =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+EXCHANGE\s+PARTITION\s+`?\w+`?\s+WITH\s+TABLE\s+([`\w.]+)\s*$""".r

  private def ident(raw: String, defaultSchema: String): (String, String) = {
    val clean = raw.replace("`", "")
    clean.split('.') match {
      case Array(s, t) => (s, t)
      case Array(t) => (defaultSchema, t)
      case parts => (parts(parts.length - 2), parts.last)
    }
  }

  private def unquote(v: String): String =
    if (v != null && v.startsWith("'") && v.endsWith("'") && v.length >= 2)
      v.substring(1, v.length - 1)
    else v

  /** Column list of a CREATE TABLE body: `name type [DEFAULT v]`,
    * skipping table-level constraint clauses. */
  private[model] def parseColumns(body: String): Seq[ColumnDef] = {
    // split on top-level commas (type args like DECIMAL(18,2) nest)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; val cur = new StringBuilder
    body.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) parts += cur.toString
    val colDef =
      """(?is)^\s*`?(\w+)`?\s+(\w+(?:\(\d+(?:,\d+)?\))?)(?:.*?\bDEFAULT\s+('[^']*'|\S+))?.*$""".r
    val constraintHead =
      Set("primary", "unique", "key", "index", "constraint", "foreign", "check")
    parts.toSeq.flatMap { p =>
      val head = p.trim.takeWhile(c => c.isLetter).toLowerCase
      if (constraintHead.contains(head)) None
      else p match {
        case colDef(name, typ, dflt) =>
          Some(ColumnDef(name, typ.toLowerCase, Option(dflt).map(unquote)))
        case _ => None
      }
    }
  }

  /** Parse one DDL statement; None when the statement doesn't change
    * row shape (the registry ignores it, like the reference's
    * unhandled action types). */
  def parse(query: String, ts: Long, defaultSchema: String = "app"): Option[DdlAction] =
    query match {
      case createTable(name, body) =>
        val (s, t) = ident(name, defaultSchema)
        Some(CreateTable(s, t, parseColumns(body), ts))
      case exchangePartition(name, withName) =>
        val (s, t) = ident(name, defaultSchema)
        val (ws, wt) = ident(withName, defaultSchema)
        Some(ExchangeTablePartition(s, t, ws, wt, ts))
      case addColumn(name, cName, cType, dflt) =>
        val (s, t) = ident(name, defaultSchema)
        Some(AddColumn(s, t, ColumnDef(cName, cType.toLowerCase, Option(dflt).map(unquote)), ts))
      case dropColumn(name, cName) =>
        val (s, t) = ident(name, defaultSchema)
        Some(DropColumn(s, t, cName, ts))
      case renameTable(from, to) =>
        val (s, t) = ident(from, defaultSchema)
        val (ns, nt) = ident(to, defaultSchema)
        Some(RenameTable(s, t, ns, nt, ts))
      case truncateTable(name) =>
        val (s, t) = ident(name, defaultSchema)
        Some(TruncateTable(s, t, ts))
      case dropTable(name) =>
        val (s, t) = ident(name, defaultSchema)
        Some(DropTable(s, t, ts))
      case _ => None
    }

  /** Parse a (ts, query) control stream into ordered actions —
    * unparseable/no-shape-change statements drop out, like DDL classes
    * the schema store doesn't handle. */
  def parseAll(ddls: Seq[(Long, String)], defaultSchema: String = "app"): Seq[DdlAction] =
    ddls.sortBy(_._1).flatMap { case (ts, q) => parse(q, ts, defaultSchema) }
}
