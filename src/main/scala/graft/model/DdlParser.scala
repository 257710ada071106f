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
  * ALTER TABLE ADD/DROP/MODIFY/CHANGE COLUMN, DROP TABLE, TRUNCATE
  * TABLE, RENAME TABLE a TO b[, c TO d...], ALTER TABLE
  * ADD/DROP/TRUNCATE/EXCHANGE PARTITION
  * (persist_storage_ddl_handlers.go:211-400). Unqualified table names
  * resolve against `defaultSchema`. Backtick-quoted identifiers are
  * unwrapped. Constraint DDLs (ADD INDEX / PRIMARY KEY / ...) parse
  * to None — they never become phantom AddColumns.
  */
object DdlParser {
  import DdlAction._

  private val createTable =
    """(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([`\w.]+)\s*\((.*)\)\s*[^)]*$""".r
  /** MySQL-8 `ALTER TABLE t RENAME COLUMN a TO b` (a rename-only
    * change; the reference's binlog filter recognizes it as its own
    * event class, pkg/binlog-filter/filter.go:88). */
  private val renameColumn =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+RENAME\s+COLUMN\s+`?(\w+)`?\s+TO\s+`?(\w+)`?\s*$""".r
  /** `ALTER TABLE a RENAME [TO|AS] b` — TiDB classifies it
    * ActionRenameTable exactly like RENAME TABLE; the lookahead keeps
    * RENAME COLUMN/INDEX/KEY out of this form. */
  private val alterRenameTable =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+RENAME\s+(?:TO\s+|AS\s+)?(?!COLUMN\b|INDEX\b|KEY\b)([`\w.]+)\s*$""".r
  /** Parenthesized multi-add: `ALTER TABLE t ADD [COLUMN] (a INT, b
    * INT)` — one statement, several columns, same CREATE-body column
    * grammar. */
  private val addColumns =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+ADD\s+(?:COLUMN\s+)?\((.*)\)\s*$""".r
  private val addColumn =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+ADD\s+(?:COLUMN\s+)?`?(\w+)`?\s+(\w+(?:\(\d+(?:,\d+)?\))?)(?:\s+DEFAULT\s+('[^']*'|\S+))?.*?(?:\s+(FIRST|AFTER\s+`?\w+`?))?\s*$""".r
  private val modifyColumn =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+MODIFY\s+(?:COLUMN\s+)?`?(\w+)`?\s+(\w+(?:\(\d+(?:,\d+)?\))?)(?:\s+DEFAULT\s+('[^']*'|\S+))?.*?(?:\s+(FIRST|AFTER\s+`?\w+`?))?\s*$""".r
  private val createDatabase =
    """(?is)^\s*CREATE\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+NOT\s+EXISTS\s+)?`?(\w+)`?\s*$""".r
  private val dropDatabase =
    """(?is)^\s*DROP\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+EXISTS\s+)?`?(\w+)`?\s*$""".r
  private val changeColumn =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+CHANGE\s+(?:COLUMN\s+)?`?(\w+)`?\s+`?(\w+)`?\s+(\w+(?:\(\d+(?:,\d+)?\))?)(?:\s+DEFAULT\s+('[^']*'|\S+))?.*$""".r
  private val dropColumn =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+DROP\s+(?:COLUMN\s+)?`?(\w+)`?\s*$""".r
  private val dropTable =
    """(?is)^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([`\w.]+)\s*$""".r
  private val truncateTable =
    """(?is)^\s*TRUNCATE\s+(?:TABLE\s+)?([`\w.]+)\s*$""".r
  private val renameTables =
    """(?is)^\s*RENAME\s+TABLE\s+(.+?)\s*$""".r
  private val renamePair =
    """(?is)^\s*([`\w.]+)\s+TO\s+([`\w.]+)\s*$""".r
  private val exchangePartition =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+EXCHANGE\s+PARTITION\s+`?\w+`?\s+WITH\s+TABLE\s+([`\w.]+)\s*$""".r
  private val addPartition =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+ADD\s+PARTITION\s*\(.*\)\s*$""".r
  private val dropPartition =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+DROP\s+PARTITION\s+([`\w\s,]+?)\s*$""".r
  private val truncatePartition =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+TRUNCATE\s+PARTITION\s+([`\w\s,]+?)\s*$""".r
  /** RECOVER TABLE t / FLASHBACK TABLE t [TO t2] — both map to
    * ActionRecoverTable (codec/common/ddl.go:137). */
  private val recoverTable =
    """(?is)^\s*(?:RECOVER|FLASHBACK)\s+TABLE\s+([`\w.]+)\s*(?:TO\s+[`\w.]+\s*)?$""".r
  /** ALTER TABLE t ALTER [COLUMN] c SET DEFAULT v / DROP DEFAULT
    * (ActionSetDefaultValue, code 15). */
  private val setDefault =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+ALTER\s+(?:COLUMN\s+)?`?(\w+)`?\s+SET\s+DEFAULT\s+('[^']*'|\S+)\s*$""".r
  private val dropDefault =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+ALTER\s+(?:COLUMN\s+)?`?(\w+)`?\s+DROP\s+DEFAULT\s*$""".r
  /** ALTER TABLE t CONVERT TO CHARACTER SET cs [COLLATE ...]
    * (ActionModifyTableCharsetAndCollate, code 22 — the statement
    * that actually TRANSCODES stored data in MySQL). */
  private val convertCharset =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+CONVERT\s+TO\s+(?:CHARACTER\s+SET|CHARSET)\s+`?([\w]+)`?(?:\s+COLLATE\s+\S+)?\s*$""".r

  /** Heads that start a table-level constraint / non-shape clause —
    * shared between CREATE TABLE body parsing and the ALTER .. ADD
    * guard (an `ADD INDEX idx (k)` must NOT become an AddColumn of a
    * phantom `INDEX` column; the reference treats these as unhandled
    * action types). */
  private val constraintHead = Set(
    "primary", "unique", "key", "index", "constraint", "foreign",
    "check", "partition", "fulltext", "spatial")

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

  /** Temporal default FUNCTIONS (`DEFAULT CURRENT_TIMESTAMP[(n)]` and
    * aliases): TiDB materializes the add-column backfill default at
    * DDL evaluation time (the column's "origin default"; the
    * ddl_default_current_timestamp scenario) — resolve them to the
    * DDL's own commit time rendered canonical, so mounter default
    * fill produces a real timestamp, not the function name. */
  private val currentTsFn =
    """(?i)^(?:CURRENT_TIMESTAMP|NOW|LOCALTIME|LOCALTIMESTAMP)(?:\(\d*\))?$""".r

  private def resolveDefault(raw: String, ts: Long): String =
    if (currentTsFn.matches(raw.trim)) {
      val secs = ts / 1000000000L // commit-ts ns domain → seconds
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochSecond(secs))
    } else unquote(raw)

  /** Column list of a CREATE TABLE body: `name type [DEFAULT v]`,
    * skipping table-level constraint clauses. */
  private[model] def parseColumns(body: String): Seq[ColumnDef] = parseColumns(body, 0L)

  private def parseColumns(body: String, ts: Long): Seq[ColumnDef] = {
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
    parts.toSeq.flatMap { p =>
      val head = p.trim.takeWhile(c => c.isLetter).toLowerCase
      if (constraintHead.contains(head)) None
      else p match {
        case colDef(name, typ, dflt) =>
          Some(ColumnDef(name, typ.toLowerCase,
            Option(dflt).map(resolveDefault(_, ts))))
        case _ => None
      }
    }
  }

  /** FIRST / AFTER `x` placement → ColumnDef.position encoding. */
  private def parsePosition(raw: String): Option[String] =
    Option(raw).map(_.trim).collect {
      case p if p.equalsIgnoreCase("first") => "first"
      case p if p.toLowerCase.startsWith("after") =>
        "after:" + p.substring(5).trim.replace("`", "")
    }

  /** Split a comma list at the top level (partition name lists). */
  private def commaList(raw: String): Seq[String] =
    raw.split(',').map(_.trim.replace("`", "")).filter(_.nonEmpty).toSeq

  /** ANSI_QUOTES pre-step (schemastore/utils.go:27-45
    * transformDDLJobQuery: the reference parses each DDL under the
    * job's recorded sql_mode, then restores canonical text — the
    * sql_mode integration scenario): under ANSI_QUOTES, double quotes
    * delimit IDENTIFIERS, not strings, so `alter table "t" add column
    * "c" int` must read like the backtick form. Rewrites
    * double-quoted identifiers to backticks; single-quoted string
    * literals (with '' escapes) pass through untouched; a doubled ""
    * inside an ANSI identifier is an escaped quote. */
  def normalizeAnsiQuotes(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' =>
          out.append('\'')
          i += 1
          var done = false
          while (i < sql.length && !done) {
            val c = sql.charAt(i)
            out.append(c)
            if (c == '\'') {
              if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
                out.append('\''); i += 1
              } else done = true
            }
            i += 1
          }
        case '"' =>
          out.append('`')
          i += 1
          var done = false
          while (i < sql.length && !done) {
            val c = sql.charAt(i)
            if (c == '"') {
              if (i + 1 < sql.length && sql.charAt(i + 1) == '"') {
                out.append('"'); i += 1
              } else { out.append('`'); done = true }
            } else out.append(c)
            i += 1
          }
        case c =>
          out.append(c); i += 1
      }
    }
    out.toString
  }

  /** MySQL combination modes that IMPLY ANSI_QUOTES when listed in
    * sql_mode (sql-mode docs; the reference parses the DDL job's
    * sql_mode with full mode expansion): ANSI itself plus the
    * db-compat combos that include it. */
  private val ansiQuotesImplied =
    Set("ANSI_QUOTES", "ANSI", "POSTGRESQL", "ORACLE", "MSSQL", "DB2", "MAXDB")

  /** Parse one DDL statement under a sql_mode (comma-separated flag
    * list like the MySQL variable; only ANSI_QUOTES — directly or via
    * a combination mode like ANSI — changes parsing here). */
  def parse(query: String, ts: Long, defaultSchema: String,
            sqlMode: String): Option[DdlAction] = {
    val q =
      if (sqlMode.toUpperCase.split(',').map(_.trim).exists(ansiQuotesImplied))
        normalizeAnsiQuotes(query)
      else query
    parse(q, ts, defaultSchema)
  }

  private val alterTableHead =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+(.+)$""".r

  /** First words that BEGIN a new ALTER clause after a top-level
    * comma. Anything else (a bare partition name in `DROP PARTITION
    * p1, p2`, a continuation) glues to the previous clause. */
  private val clauseHeads = Set(
    "add", "drop", "modify", "change", "alter", "rename", "convert",
    "character", "charset", "default", "engine", "auto_increment",
    "comment", "row_format", "partition", "remove", "reorganize",
    "exchange", "truncate", "coalesce", "order", "disable", "enable",
    "lock", "algorithm", "force")

  /** Top-level comma split: parens (type args) nest, single-quoted
    * literals (with '' escapes) pass through. */
  private def splitTopLevel(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inStr = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        cur.append(c)
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') { cur.append('\''); i += 1 }
          else inStr = false
        }
      } else c match {
        case '\'' => inStr = true; cur.append(c)
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; cur.append(c)
        case ',' if depth == 0 => parts += cur.toString; cur.clear()
        case other => cur.append(other)
      }
      i += 1
    }
    if (cur.nonEmpty) parts += cur.toString
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** A multi-clause ALTER TABLE (the statement form TiDB wraps in one
    * ActionMultiSchemaChange job, persist_storage_ddl_handlers.go:409
    * iterating sub-jobs): every shape-changing clause applies in
    * statement order under one ts. Single-clause ALTERs return None
    * here and take the normal path. */
  private def parseMultiAlter(query: String, ts: Long,
                              defaultSchema: String): Option[DdlAction] =
    query match {
      case alterTableHead(name, rest) =>
        // merge pieces that don't start a clause back into the prior
        // one (partition name lists contain top-level commas). A piece
        // starts a clause only when its WHOLE first token is a clause
        // head (`add2` is a partition name, not an ADD) and a
        // continuation follows — a lone head word is a name too
        // (`DROP PARTITION p1, add`); only FORCE stands alone.
        def startsClause(p: String): Boolean = {
          val toks = p.trim.split("\\s+")
          val head = toks.head.toLowerCase
          clauseHeads.contains(head) &&
            (toks.length > 1 || head == "force")
        }
        val clauses = splitTopLevel(rest).foldLeft(Seq.empty[String]) { (acc, p) =>
          if (startsClause(p) || acc.isEmpty) acc :+ p
          else acc.init :+ s"${acc.last}, $p"
        }
        if (clauses.size <= 1) None
        else {
          val sub = clauses.flatMap(c => parse(s"ALTER TABLE $name $c", ts, defaultSchema))
          sub match {
            case Seq() => None
            case Seq(one) => Some(one)
            case many =>
              val (s, t) = ident(name, defaultSchema)
              Some(AlterMulti(s, t, many, ts))
          }
        }
      case _ => None
    }

  /** Parse one DDL statement; None when the statement doesn't change
    * row shape (the registry ignores it, like the reference's
    * unhandled action types). */
  def parse(query: String, ts: Long, defaultSchema: String = "app"): Option[DdlAction] =
    parseMultiAlter(query, ts, defaultSchema).orElse(query match {
      case createTable(name, body) =>
        val (s, t) = ident(name, defaultSchema)
        // the key clauses (table-level PRIMARY KEY (..), inline pk
        // attributes) live in the same body parseColumns skips — read
        // them with the rich MySQL parser so the action carries the
        // true pk (table_info_helper.go builds indices from the same
        // statement)
        val pks = MySqlDdl.parseCreateTable(query, s)
          .filter(mt => mt.schema == s && mt.table == t)
          .map(_.primaryKeys).getOrElse(Nil)
        Some(CreateTable(s, t, parseColumns(body, ts), ts, pks))
      case exchangePartition(name, withName) =>
        val (s, t) = ident(name, defaultSchema)
        val (ws, wt) = ident(withName, defaultSchema)
        Some(ExchangeTablePartition(s, t, ws, wt, ts))
      // partition clauses must precede the column forms: ADD/DROP of a
      // PARTITION would otherwise capture cName="PARTITION"
      case addPartition(name) =>
        val (s, t) = ident(name, defaultSchema)
        Some(AddTablePartition(s, t, ts))
      case truncatePartition(name, parts) =>
        val (s, t) = ident(name, defaultSchema)
        Some(TruncateTablePartition(s, t, commaList(parts), ts))
      case dropPartition(name, parts) =>
        val (s, t) = ident(name, defaultSchema)
        Some(DropTablePartition(s, t, commaList(parts), ts))
      case renameColumn(name, oldName, newName) =>
        val (s, t) = ident(name, defaultSchema)
        Some(RenameColumn(s, t, oldName, newName, ts))
      case addColumns(name, body) =>
        val (s, t) = ident(name, defaultSchema)
        parseColumns(body, ts).map(c => AddColumn(s, t, c, ts)) match {
          case Seq() => None
          case Seq(one) => Some(one)
          case many => Some(AlterMulti(s, t, many, ts))
        }
      case addColumn(name, cName, cType, dflt, pos)
          if !constraintHead.contains(cName.toLowerCase) =>
        val (s, t) = ident(name, defaultSchema)
        Some(AddColumn(s, t, ColumnDef(cName, cType.toLowerCase,
          Option(dflt).map(resolveDefault(_, ts)), parsePosition(pos)), ts))
      case modifyColumn(name, cName, cType, dflt, pos)
          if !constraintHead.contains(cName.toLowerCase) =>
        val (s, t) = ident(name, defaultSchema)
        Some(ModifyColumn(s, t, ColumnDef(cName, cType.toLowerCase,
          Option(dflt).map(resolveDefault(_, ts)), parsePosition(pos)), ts))
      case createDatabase(name) =>
        Some(CreateSchema(name, ts))
      case dropDatabase(name) =>
        Some(DropSchema(name, ts))
      case changeColumn(name, oldName, newName, cType, dflt)
          if !constraintHead.contains(oldName.toLowerCase) =>
        val (s, t) = ident(name, defaultSchema)
        Some(ChangeColumn(s, t, oldName,
          ColumnDef(newName, cType.toLowerCase,
            Option(dflt).map(resolveDefault(_, ts))), ts))
      case dropColumn(name, cName)
          if !constraintHead.contains(cName.toLowerCase) =>
        val (s, t) = ident(name, defaultSchema)
        Some(DropColumn(s, t, cName, ts))
      case alterRenameTable(name, newName) =>
        val (s, t) = ident(name, defaultSchema)
        // an unqualified new name stays in the table's own schema
        val (ns, nt) = ident(newName, s)
        Some(RenameTable(s, t, ns, nt, ts))
      case renameTables(pairList) =>
        // split on commas; identifiers contain no commas
        val raw = pairList.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val parsed = raw.map {
          case renamePair(from, to) =>
            val (s, t) = ident(from, defaultSchema)
            val (ns, nt) = ident(to, defaultSchema)
            Some(RenameTable(s, t, ns, nt, ts))
          case _ => None // malformed pair → not a rename we handle
        }
        if (parsed.isEmpty || parsed.exists(_.isEmpty)) None
        else parsed.flatten match {
          case Seq(single) => Some(single)
          case many        => Some(RenameTables(many, ts))
        }
      case truncateTable(name) =>
        val (s, t) = ident(name, defaultSchema)
        Some(TruncateTable(s, t, ts))
      case dropTable(name) =>
        val (s, t) = ident(name, defaultSchema)
        Some(DropTable(s, t, ts))
      case recoverTable(name) =>
        val (s, t) = ident(name, defaultSchema)
        Some(RecoverTable(s, t, ts))
      case setDefault(name, cName, dflt) =>
        val (s, t) = ident(name, defaultSchema)
        Some(SetDefault(s, t, cName, Some(resolveDefault(dflt, ts)), ts))
      case dropDefault(name, cName) =>
        val (s, t) = ident(name, defaultSchema)
        Some(SetDefault(s, t, cName, None, ts))
      case convertCharset(name, cs) =>
        val (s, t) = ident(name, defaultSchema)
        Some(ConvertCharset(s, t, cs.toLowerCase, ts))
      case _ => None
    })

  /** Parse a (ts, query) control stream into ordered actions —
    * unparseable/no-shape-change statements drop out, like DDL classes
    * the schema store doesn't handle. */
  def parseAll(ddls: Seq[(Long, String)], defaultSchema: String = "app"): Seq[DdlAction] =
    ddls.sortBy(_._1).flatMap { case (ts, q) => parse(q, ts, defaultSchema) }

  // ---- lossy-DDL classification (lossy_ddl coverage; BDR mode
  // refuses type changes that can silently drop data downstream) ----

  private val intRank = Map(
    "tinyint" -> 1, "smallint" -> 2, "mediumint" -> 3, "int" -> 4,
    "integer" -> 4, "bigint" -> 5)
  private val textRank = Map(
    "tinytext" -> 1, "text" -> 2, "mediumtext" -> 3, "longtext" -> 4)

  private def baseOf(t: String): (String, Seq[Int]) = {
    val lower = t.trim.toLowerCase
    val base = lower.takeWhile(c => c.isLetter)
    val args = """\d+""".r.findAllIn(lower).map(_.toInt).toSeq
    (base, args)
  }

  /** Is `from` → `to` a narrowing the downstream could lose data on?
    * Width ladders narrow by rank; sized types (varchar/char/decimal)
    * narrow by argument; numeric→float/double loses precision above
    * 2^53/2^24; cross-family changes are conservatively lossy;
    * widening within a family is not. */
  def isLossyTypeChange(from: String, to: String): Boolean = {
    val (fb, fa) = baseOf(from)
    val (tb, ta) = baseOf(to)
    def arg(a: Seq[Int], i: Int, dflt: Int) = if (a.length > i) a(i) else dflt
    (fb, tb) match {
      case (f, t) if f == t =>
        (fb match {
          case "varchar" | "char" | "binary" | "varbinary" =>
            arg(ta, 0, Int.MaxValue) < arg(fa, 0, Int.MaxValue)
          case "decimal" | "numeric" =>
            arg(ta, 0, 10) < arg(fa, 0, 10) || arg(ta, 1, 0) < arg(fa, 1, 0)
          case _ => false
        })
      case (f, t) if intRank.contains(f) && intRank.contains(t) =>
        intRank(t) < intRank(f)
      case (f, t) if textRank.contains(f) && textRank.contains(t) =>
        textRank(t) < textRank(f)
      case ("float", "double") => false
      case ("double", "float") => true
      case (f, t) if intRank.contains(f) && (t == "float" || t == "double") =>
        intRank(f) >= intRank("int") // > 2^24/2^53 representable range
      case (f, t) if intRank.contains(f) && (t == "decimal" || t == "numeric") =>
        false // decimal is wide enough by default
      case ("varchar" | "char", t) if textRank.contains(t) => false
      case (f, "varchar" | "char") if textRank.contains(f) => true
      case _ => true // cross-family: conservatively lossy
    }
  }

  /** Classify a parsed action as lossy given the current registry
    * state (needs the pre-change column type). */
  def isLossy(action: DdlAction, registry: SchemaRegistry): Boolean = action match {
    case DdlAction.ModifyColumn(s, t, c, _) =>
      registry.latest(s, t).flatMap(_.columns.find(_.name == c.name))
        .exists(old => isLossyTypeChange(old.dataType, c.dataType))
    case DdlAction.ChangeColumn(s, t, oldName, c, _) =>
      registry.latest(s, t).flatMap(_.columns.find(_.name == oldName))
        .exists(old => isLossyTypeChange(old.dataType, c.dataType))
    case DdlAction.DropColumn(_, _, _, _) => true // data gone by definition
    case _ => false
  }
}
