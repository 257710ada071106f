package graft.model

/** Full-fidelity MySQL CREATE TABLE column model — the subset of
  * TiDB's `FieldType` (flen/decimal/flags/elems) that wire codecs need
  * to reproduce reference message bytes (debezium codec.go:163-606,
  * canal builder mysqlType/sqlType maps). [[DdlParser]] stays the
  * registry-facing row-shape parser; this model keeps the type
  * arguments and flags that DdlParser deliberately drops.
  *
  * Also parses the INSERT statements of the reference's codec fixtures
  * (datatype.dml.sql, canal_json_basic/data/data.sql) into raw literal
  * rows so golden specs can replay them through the encoders.
  */
object MySqlDdl {

  /** One column of a CREATE TABLE, MySQL-typed.
    *
    * @param base lowercase base type ("int", "bit", "enum", ...)
    * @param flen display/storage length: BIT width, CHAR/BINARY length,
    *             DECIMAL precision; -1 when unspecified
    * @param dec  DATETIME/TIME/TIMESTAMP fsp or DECIMAL scale; -1 when
    *             unspecified (fsp defaults to 0, DECIMAL scale to 0)
    */
  case class MySqlCol(
      name: String,
      base: String,
      flen: Int = -1,
      dec: Int = -1,
      unsigned: Boolean = false,
      notNull: Boolean = false,
      pk: Boolean = false,
      autoInc: Boolean = false,
      elems: Seq[String] = Nil,
      default: Option[String] = None,
      /** AUTO_RANDOM(shardBits) handle column (TiDB extension;
        * tests/integration_tests/autorandom): implies pk-is-handle,
        * explicit inserts need allow_auto_random_explicit_insert. */
      autoRandom: Boolean = false,
      autoRandomBits: Int = 5) {
    def fsp: Int = if (dec < 0) 0 else dec
    /** Types carrying the MySQL binary flag (bytes, not text). */
    def isBinary: Boolean = base match {
      case "varbinary" | "binary" | "blob" | "tinyblob" | "mediumblob" | "longblob" => true
      case _ => false
    }

    /** Full MySQL type description — TiDB's FieldType compact string
      * (the form `GetMySQLType(col, fullType=true)` renders for the
      * canal content-compatible mode, codec/common/helper.go:38-46):
      * display length (TiDB's signedness-dependent defaults for the
      * integer family when the DDL gave none), decimal (flen,dec),
      * fsp on the time family, enum/set element lists, then the
      * unsigned suffix — which GetTypeDesc excludes for BIT and YEAR
      * (this model does not carry zerofill). */
    def typeDesc: String = {
      def intDesc(dflt: Int, dfltUnsigned: Int) =
        s"$base(${if (flen >= 0) flen else if (unsigned) dfltUnsigned else dflt})"
      val core = base match {
        case "tinyint" => intDesc(4, 3)
        case "smallint" => intDesc(6, 5)
        case "mediumint" => intDesc(9, 8)
        case "int" | "integer" => intDesc(11, 10)
        case "bigint" => intDesc(20, 20)
        case "decimal" | "numeric" =>
          s"$base(${if (flen >= 0) flen else 10},${if (dec >= 0) dec else 0})"
        case "char" | "varchar" | "binary" | "varbinary" if flen >= 0 =>
          s"$base($flen)"
        case "bit" => s"$base(${if (flen >= 0) flen else 1})"
        case "year" => "year(4)"
        case "float" | "double" if flen >= 0 && dec >= 0 => s"$base($flen,$dec)"
        case "datetime" | "timestamp" | "time" if dec > 0 => s"$base($dec)"
        case "enum" | "set" =>
          elems.map(e => "'" + e.replace("'", "''") + "'")
            .mkString(s"$base(", ",", ")")
        case other => other
      }
      core + (if (unsigned && base != "bit" && base != "year") " unsigned" else "")
    }
  }

  case class MySqlTable(schema: String, table: String, cols: Seq[MySqlCol],
                        /** PRIMARY KEY column names in INDEX order (the
                          * table-level clause order when one exists). */
                        primaryOrder: Seq[String] = Nil,
                        /** UNIQUE index column lists in definition order
                          * (inline `unique` attributes and table-level
                          * UNIQUE KEY clauses alike). */
                        uniqueIndexes: Seq[Seq[String]] = Nil) {
    def pkCols: Seq[MySqlCol] = cols.filter(_.pk)

    /** Handle-key selection (table_info_helper.go:660-732
      * initIndexColumns): the primary key wins; otherwise the NOT-NULL
      * unique index with the FEWEST columns (ties → earliest defined);
      * no candidate → no handle key, the table is ineligible without
      * force-replicate (OriginalHasPKOrNotNullUK,
      * table_info.go:505-552 — many_pk_or_uk scenario). */
    /** Declared PRIMARY KEY column names (table-level clause order
      * when one exists, inline attributes otherwise) — the true pk,
      * before the handle-key UK fallback. */
    def primaryKeys: Seq[String] =
      if (primaryOrder.nonEmpty) primaryOrder else pkCols.map(_.name)

    def handleKeys: Seq[String] = {
      val pk = primaryKeys
      if (pk.nonEmpty) pk
      else {
        val notNull = cols.filter(_.notNull).map(_.name).toSet
        uniqueIndexes.zipWithIndex
          .filter { case (ix, _) => ix.nonEmpty && ix.forall(notNull) }
          .sortBy { case (ix, pos) => (ix.length, pos) }
          .headOption.map(_._1).getOrElse(Nil)
      }
    }

    /** A table with no handle key can't replicate consistently
      * (filter.go eligibility; force-replicate overrides). */
    def eligible: Boolean = handleKeys.nonEmpty

    private val intBases = Set("tinyint", "smallint", "mediumint", "int", "bigint")

    /** TiDB pk-is-handle: a single integer-class PRIMARY KEY column —
      * the row handle IS the column value (clustered integer pk). */
    def pkIsHandle: Boolean = {
      val pk = primaryKeys
      pk.length == 1 &&
        cols.find(_.name == pk.head).exists(c => intBases.contains(c.base))
    }

    def autoRandomCol: Option[MySqlCol] = cols.find(_.autoRandom)

    /** AUTO_RANDOM is only legal on the pk-is-handle column (TiDB
      * errors otherwise — "Invalid auto random", ddl error 8216); a
      * valid auto_random table is always eligible through its pk
      * handle, and the sink replays its explicit handle values under
      * allow_auto_random_explicit_insert
      * (tests/integration_tests/autorandom; mysql/helper.go:239-245). */
    def autoRandomValid: Boolean = autoRandomCol.forall { c =>
      pkIsHandle && handleKeys == Seq(c.name) && c.base == "bigint" && !c.autoInc
    }
  }

  /** Split `body` on top-level commas, respecting (), '', "" and ``
    * nesting (ENUM('a','b') and DECIMAL(10, 5) must not split). */
  def splitTopLevel(body: String, sep: Char = ','): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var quote: Char = 0; var inTick = false
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (quote != 0) {
        cur.append(c)
        if (c == quote) {
          // doubled-quote escape inside a string literal
          if (i + 1 < body.length && body.charAt(i + 1) == quote) { cur.append(quote); i += 1 }
          else quote = 0
        } else if (c == '\\' && i + 1 < body.length) { cur.append(body.charAt(i + 1)); i += 1 }
      } else if (inTick) {
        cur.append(c); if (c == '`') inTick = false
      } else c match {
        case '\'' | '"' => quote = c; cur.append(c)
        case '`' => inTick = true; cur.append(c)
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; cur.append(c)
        case `sep` if depth == 0 => parts += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    if (cur.nonEmpty) parts += cur.toString
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("'") && t.endsWith("'"))
      t.substring(1, t.length - 1).replace("''", "'")
    else if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\""))
      t.substring(1, t.length - 1).replace("\"\"", "\"")
    else t.replace("`", "")
  }

  /** Normalize the MySQL binary/bit literal forms to canonical text
    * the encoders interpret: x'HEX' / 0xHEX → "0xHEX"; b'BITS' →
    * unsigned decimal string. Other literals pass through unquoted. */
  private def normalizeLiteral(raw: String): String = {
    val t = raw.trim
    val lower = t.toLowerCase
    if ((lower.startsWith("x'") || lower.startsWith("b'")) && t.endsWith("'")) {
      val body = t.substring(2, t.length - 1)
      if (lower.startsWith("x'")) "0x" + body
      else java.lang.Long.toUnsignedString(java.lang.Long.parseUnsignedLong(body, 2))
    } else if (lower.startsWith("0x") && t.drop(2).forall(c => Character.digit(c, 16) >= 0)) {
      "0x" + t.drop(2)
    } else if (lower == "true") "1" // MySQL TRUE/FALSE are 1/0 literals
    else if (lower == "false") "0"
    else unquote(t)
  }

  private val typeRe =
    """(?is)^\s*([a-z]+)\s*(?:\(\s*(.*?)\s*\))?(.*)$""".r

  private val tableLevel = Set(
    "primary", "unique", "key", "index", "constraint", "foreign",
    "check", "fulltext", "spatial", "partition")

  /** Parse one column definition part ("name TYPE(args) attrs..."). */
  private[model] def parseColDef(part: String): Option[MySqlCol] = {
    val trimmed = part.trim
    val (name, rest0) =
      if (trimmed.startsWith("`")) {
        val end = trimmed.indexOf('`', 1)
        (trimmed.substring(1, end), trimmed.substring(end + 1))
      } else {
        val end = trimmed.indexWhere(c => c.isWhitespace)
        if (end < 0) return None
        (trimmed.substring(0, end), trimmed.substring(end))
      }
    if (tableLevel.contains(name.toLowerCase)) return None
    rest0.trim match {
      case typeRe(rawBase, args, attrs0) =>
        var base = rawBase.toLowerCase
        val attrs = attrs0.toLowerCase
        // synonyms the matrix uses
        base = base match {
          case "integer" => "int"
          case "numeric" | "dec" | "fixed" => "decimal"
          case "bool" | "boolean" => "tinyint" // MySQL BOOL = TINYINT(1)
          case "real" => "double"
          case b => b
        }
        var flen = -1; var dec = -1; var elems = Seq.empty[String]
        if (args != null && args.nonEmpty) {
          if (base == "enum" || base == "set")
            elems = splitTopLevel(args).map(unquote)
          else {
            val nums = splitTopLevel(args).map(_.trim)
            if (nums.nonEmpty && nums.head.forall(_.isDigit)) flen = nums.head.toInt
            if (nums.length > 1 && nums(1).forall(_.isDigit)) dec = nums(1).toInt
          }
        }
        // DATETIME(3)/TIME(3)/TIMESTAMP(3): single arg is the fsp
        if ((base == "datetime" || base == "time" || base == "timestamp") && flen >= 0) {
          dec = flen; flen = -1
        }
        val unsigned = attrs.contains("unsigned")
        val notNull = attrs.contains("not null")
        val pk = attrs.contains("primary key")
        // SERIAL DEFAULT VALUE ≙ NOT NULL AUTO_INCREMENT UNIQUE
        val autoInc = attrs.contains("auto_increment") ||
          attrs.contains("serial default value")
        // AUTO_RANDOM / AUTO_RANDOM(n): TiDB-only column attribute
        // (ddl parser ast ColumnOptionAutoRandom); default 5 shard bits
        val autoRandRe = """(?s).*\bauto_random(?:\s*\(\s*(\d+)\s*\))?.*""".r
        val (autoRand, autoRandBits) = attrs match {
          case autoRandRe(bits) => (true, Option(bits).map(_.toInt).getOrElse(5))
          case _ => (false, 5)
        }
        val dfltRe = """(?is).*\bdefault\s+('(?:[^']|'')*'|[^\s,]+).*""".r
        val dflt = attrs0 match {
          // DEFAULT NULL means "no default"; SERIAL DEFAULT VALUE is
          // the auto-increment shorthand, not a default; binary/bit
          // literal defaults (b'1', x'..') normalize like INSERT
          // literals
          case dfltRe(v) if !v.equalsIgnoreCase("null") &&
              !v.equalsIgnoreCase("value") =>
            Some(normalizeLiteral(v))
          case _ => None
        }
        Some(MySqlCol(name, base, flen, dec, unsigned, notNull || pk, pk,
          autoInc, elems, dflt, autoRand, autoRandBits))
      case _ => None
    }
  }

  /** Possibly-qualified table name: backtick-quoted segments may hold
    * ANY chars (the Debezium zoo names tables `t-1`, `t.2`,
    * `dbz_878_some|test@data`, `dbz5743中文`). */
  private val namePat = """(?:`[^`]+`|[\w$.])+"""

  /** Split a possibly-backtick-quoted qualified name into segments,
    * respecting dots INSIDE quotes (`t.2` is one name). */
  private[model] def splitName(raw: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    raw.foreach {
      case '`' => inQ = !inQ
      case '.' if !inQ => out += sb.toString; sb.clear()
      case c => sb += c
    }
    out += sb.toString
    out.toSeq.filter(_.nonEmpty)
  }
  private[model] def bareName(raw: String): String = splitName(raw).last

  private val createRe =
    ("""(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(""" + namePat +
      """)\s*\((.*)\)\s*[^()]*$""").r

  private val createLikeRe =
    ("""(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(""" + namePat +
      """)\s+LIKE\s+(""" + namePat + """)\s*$""").r

  /** `CREATE TABLE a LIKE b` → (new, source) unqualified names. */
  def parseCreateLike(ddl: String): Option[(String, String)] =
    ddl.trim.stripSuffix(";") match {
      case createLikeRe(a, b) => Some((bareName(a), bareName(b)))
      case _ => None
    }

  /** Parse a CREATE TABLE with the full type matrix. Table-level
    * `PRIMARY KEY (a,b)` / `CONSTRAINT x PRIMARY KEY (a,b)` clauses
    * mark the named columns pk + not-null. */
  def parseCreateTable(ddl: String, defaultSchema: String = "test"): Option[MySqlTable] =
    ddl.trim.stripSuffix(";") match {
      case createRe(rawName, body) =>
        val nameParts = splitName(rawName)
        val (schema, table) =
          if (nameParts.length >= 2) (nameParts(nameParts.length - 2), nameParts.last)
          else (defaultSchema, nameParts.last)
        val parts = splitTopLevel(body)
        val cols = parts.flatMap(parseColDef)
        // table-level pk clause (ordered — the handle key keeps index
        // column order, table_info_helper.go:684-686)
        val pkRe = """(?is).*PRIMARY\s+KEY\s*\(\s*([^)]*)\s*\).*""".r
        val tableClauses = parts.filter { p =>
          val head = p.trim.takeWhile(_.isLetter).toLowerCase
          tableLevel.contains(head)
        }
        val pkOrder: Seq[String] = tableClauses.collectFirst {
          case pkRe(colList) => splitTopLevel(colList).map(unquote)
        }.getOrElse(Nil)
        val pkNames = pkOrder.toSet
        // unique indexes in definition order: inline `unique` column
        // attributes and table-level UNIQUE KEY clauses alike. The
        // paren body is taken by depth-aware scan (not [^)]*) so a
        // prefix-length column `UNIQUE KEY u (a(10), b)` keeps its
        // full list; prefix lengths are then stripped from the names.
        val uniqHeadRe = """(?is)^\s*(?:CONSTRAINT\s+[`\w]*\s+)?UNIQUE\s*(?:KEY|INDEX)?\s*[`\w]*\s*\(""".r
        def parenBody(s: String, open: Int): Option[String] = {
          var depth = 0
          var i = open
          while (i < s.length) {
            s.charAt(i) match {
              case '(' => depth += 1
              case ')' =>
                depth -= 1
                if (depth == 0) return Some(s.substring(open + 1, i))
              case _ =>
            }
            i += 1
          }
          None
        }
        def stripPrefixLen(colSpec: String): String =
          unquote(colSpec.replaceAll("""\(\s*\d+\s*\)\s*$""", "").trim)
        val uniques: Seq[Seq[String]] = parts.flatMap { p =>
          val trimmed = p.trim
          // string literals blinded so a DEFAULT 'unique' can't match
          val blinded = trimmed.replaceAll("'(?:[^']|'')*'", "''").toLowerCase
          val head = trimmed.takeWhile(c => c.isLetter).toLowerCase
          if (tableLevel.contains(head)) {
            if (blinded.matches("(?s).*\\bunique\\b.*") &&
                !blinded.matches("(?s).*\\bprimary\\b.*"))
              uniqHeadRe.findFirstIn(trimmed).flatMap { m =>
                parenBody(trimmed, m.length - 1)
                  .map(body => splitTopLevel(body).map(stripPrefixLen))
              }
            else None
          } else parseColDef(p)
            .filter(_ => blinded.matches("(?s).*\\bunique\\b.*"))
            .map(c => Seq(c.name))
        }
        val withPk = cols.map(c =>
          if (pkNames.contains(c.name)) c.copy(pk = true, notNull = true) else c)
        val pkOrdered =
          if (pkOrder.nonEmpty) pkOrder else withPk.filter(_.pk).map(_.name)
        Some(MySqlTable(schema, table, withPk, pkOrdered, uniques))
      case _ => None
    }

  /** One parsed INSERT: raw literal per named column (None = SQL NULL;
    * unnamed columns absent from the map). */
  case class InsertRow(table: String, values: Map[String, Option[String]])

  private val insertRe =
    ("""(?is)^\s*INSERT\s+INTO\s+(""" + namePat +
      """)\s*(?:\(\s*(.*?)\s*\))?\s*VALUES?\s*(.*)$""").r

  /** Parse INSERT INTO t [(cols)] VALUES (...),(...) into raw literal
    * rows. Literals keep their text form (quotes stripped); NULL →
    * None. */
  def parseInsert(sql: String): Seq[InsertRow] =
    sql.trim.stripSuffix(";") match {
      case insertRe(rawName, colList, valuesPart) =>
        val table = bareName(rawName)
        val names: Option[Seq[String]] =
          Option(colList).map(cl => splitTopLevel(cl).map(unquote)).filter(_.nonEmpty)
        // split "(...),(...)" tuples at top level
        val tuples = splitTopLevel(valuesPart).map(_.trim).filter(_.nonEmpty)
        tuples.map { t =>
          val inner = t.stripPrefix("(").stripSuffix(")")
          val lits = splitTopLevel(inner).map { raw =>
            val v = raw.trim
            if (v.equalsIgnoreCase("null")) None else Some(normalizeLiteral(v))
          }
          val colNames = names.getOrElse(Seq.tabulate(lits.length)(i => s"_$i"))
          InsertRow(table, colNames.zip(lits).toMap)
        }
      case _ => Seq.empty
    }

  /** Strip slash-star block comments outside string literals (the
    * Debezium corpora annotate INSERT values inline, e.g. a
    * "Zero dates" comment between VALUES( and '0000-00-00'). */
  private[model] def stripBlockComments(script: String): String = {
    val out = new StringBuilder
    var i = 0; var quote: Char = 0
    while (i < script.length) {
      val c = script.charAt(i)
      if (quote != 0) {
        out.append(c)
        if (c == quote) quote = 0
        else if (c == '\\' && i + 1 < script.length) {
          out.append(script.charAt(i + 1)); i += 1
        }
        i += 1
      } else if (c == '\'' || c == '"' || c == '`') {
        quote = c; out.append(c); i += 1
      } else if (c == '/' && i + 1 < script.length && script.charAt(i + 1) == '*') {
        val end = script.indexOf("*/", i + 2)
        i = if (end < 0) script.length else end + 2
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Split a .sql script into statements (`;` at top level), dropping
    * `--` comment lines and block comments (comments inside string
    * literals survive: the strip only applies where the prefix has
    * balanced quotes). */
  def splitStatements(script: String): Seq[String] = {
    val noBlocks = stripBlockComments(script)
    val noComments = noBlocks.linesIterator.map { l =>
      val i = l.indexOf("--")
      if (i >= 0 && l.substring(0, i).count(_ == '\'') % 2 == 0) l.substring(0, i) else l
    }.mkString("\n")
    splitTopLevel(noComments, ';').map(_.trim).filter(_.nonEmpty)
  }

  /** One parsed UPDATE: SET assignments + conjunctive equality WHERE
    * (the shape the reference's Debezium behavior corpora use,
    * tests/integration_tests/debezium02-03 sql). Empty `where` = all
    * rows. Values normalized like [[parseInsert]]; None = NULL. */
  case class UpdateStmt(table: String, sets: Seq[(String, Option[String])],
                        where: Seq[(String, Option[String])])

  /** One parsed DELETE with conjunctive equality WHERE (empty = all). */
  case class DeleteStmt(table: String, where: Seq[(String, Option[String])])

  private val updateRe =
    ("""(?is)^\s*UPDATE\s+(""" + namePat +
      """)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$""").r
  private val deleteRe =
    ("""(?is)^\s*DELETE\s+FROM\s+(""" + namePat +
      """)(?:\s+WHERE\s+(.*))?$""").r

  private def eqPair(s: String): Option[(String, Option[String])] = {
    val i = s.indexOf('=')
    if (i <= 0) None
    else {
      val name = s.take(i).trim.replace("`", "")
      val v = s.drop(i + 1).trim
      Some(name ->
        (if (v.equalsIgnoreCase("null")) None else Some(normalizeLiteral(v))))
    }
  }

  private def parseAssignments(s: String): Seq[(String, Option[String])] =
    splitTopLevel(s).flatMap(eqPair)

  private def parseConds(s: String): Seq[(String, Option[String])] =
    s.split("(?i)\\s+AND\\s+").toSeq.map(_.trim).filter(_.nonEmpty)
      .flatMap(eqPair)

  def parseUpdate(sql: String): Option[UpdateStmt] =
    sql.trim.stripSuffix(";") match {
      case updateRe(rawName, sets, where) =>
        Some(UpdateStmt(bareName(rawName),
          parseAssignments(sets),
          Option(where).map(parseConds).getOrElse(Nil)))
      case _ => None
    }

  def parseDelete(sql: String): Option[DeleteStmt] =
    sql.trim.stripSuffix(";") match {
      case deleteRe(rawName, where) =>
        Some(DeleteStmt(bareName(rawName),
          Option(where).map(parseConds).getOrElse(Nil)))
      case _ => None
    }

  // ---- row-shape ALTERs (the Debezium DDL zoo's common forms:
  // ADD/DROP/MODIFY/CHANGE COLUMN + ALTER col SET/DROP DEFAULT —
  // debezium02/03 history-dbz.sql etc.) ----

  /** A parsed row-shape ALTER applied to a table: carries the UPDATED
    * table plus what a row-store replay must do to existing rows. */
  sealed trait TableAlter { def table: MySqlTable }
  object TableAlter {
    /** ADD COLUMN at `index`: existing rows backfill with
      * `col.default` (MySQL semantics: NULL when none). */
    final case class AddCol(table: MySqlTable, index: Int, col: MySqlCol)
        extends TableAlter
    /** DROP COLUMN: existing rows lose slot `index`. */
    final case class DropCol(table: MySqlTable, index: Int) extends TableAlter
    /** MODIFY / CHANGE COLUMN: same slot, new name/type — values keep
      * their positions. */
    final case class Retype(table: MySqlTable) extends TableAlter
    /** ALTER col SET DEFAULT / DROP DEFAULT: metadata only. */
    final case class NewDefault(table: MySqlTable) extends TableAlter
  }

  private val alterHeadRe = """(?is)^\s*ALTER\s+TABLE\s+([`"\w.]+)\s+(.*)$""".r
  private val alterAddRe = """(?is)^ADD\s+(?:COLUMN\s+)?(.+)$""".r
  private val alterDropRe = """(?is)^DROP\s+(?:COLUMN\s+)?[`"]?(\w+)[`"]?\s*$""".r
  private val alterModifyRe = """(?is)^MODIFY\s+(?:COLUMN\s+)?(.+)$""".r
  private val alterChangeRe =
    """(?is)^CHANGE\s+(?:COLUMN\s+)?[`"]?(\w+)[`"]?\s+(.+)$""".r
  private val alterSetDefaultRe =
    """(?is)^ALTER\s+(?:COLUMN\s+)?[`"]?(\w+)[`"]?\s+SET\s+DEFAULT\s+(.+?)\s*$""".r
  private val alterDropDefaultRe =
    """(?is)^ALTER\s+(?:COLUMN\s+)?[`"]?(\w+)[`"]?\s+DROP\s+DEFAULT\s*$""".r
  /** Clause heads that are NOT column definitions. */
  private val alterNonColumn = Set("index", "key", "constraint", "primary",
    "unique", "fulltext", "spatial", "foreign", "partition", "check")
  private val posTailRe = """(?is)^(.*?)\s+(FIRST|AFTER\s+[`"]?\w+[`"]?)\s*$""".r

  /** Parse one row-shape `ALTER TABLE` against the table it targets
    * (`resolve` looks the table up by its unqualified name). None for
    * index/partition/comment/charset ALTERs and unknown tables — the
    * classes that change no row shape. */
  def parseAlterTable(stmt: String,
                      resolve: String => Option[MySqlTable]): Option[TableAlter] =
    stmt.trim.stripSuffix(";") match {
      case alterHeadRe(rawName, rest0) =>
        val tn = rawName.replace("`", "").replace("\"", "").split('.').last
        resolve(tn).flatMap { t =>
          def colIdx(n: String): Option[Int] = {
            val i = t.cols.indexWhere(_.name.equalsIgnoreCase(n))
            if (i < 0) None else Some(i)
          }
          def firstWord(s: String): String =
            s.trim.takeWhile(!_.isWhitespace).toLowerCase.replace("`", "")
          rest0.trim match {
            case alterSetDefaultRe(cn, v) =>
              colIdx(cn).map { i =>
                val c = t.cols(i).copy(default =
                  if (v.equalsIgnoreCase("null")) None
                  else Some(normalizeLiteral(v.trim)))
                TableAlter.NewDefault(t.copy(cols = t.cols.updated(i, c)))
              }
            case alterDropDefaultRe(cn) =>
              colIdx(cn).map { i =>
                TableAlter.NewDefault(t.copy(cols =
                  t.cols.updated(i, t.cols(i).copy(default = None))))
              }
            case alterAddRe(defStr) if !alterNonColumn.contains(firstWord(defStr)) =>
              // FIRST / AFTER x position tail (absent → append)
              val (core, pos) = defStr.trim match {
                case posTailRe(c, p) => (c, Some(p.trim))
                case other => (other, None)
              }
              parseColDef(core).map { col =>
                val idx = pos.map(_.toLowerCase) match {
                  case Some("first") => 0
                  case Some(p) if p.startsWith("after") =>
                    val anchor = p.split("\\s+").last.replace("`", "").replace("\"", "")
                    colIdx(anchor).map(_ + 1).getOrElse(t.cols.length)
                  case _ => t.cols.length
                }
                val (pre, post) = t.cols.splitAt(idx)
                TableAlter.AddCol(t.copy(cols = (pre :+ col) ++ post), idx, col)
              }
            case alterDropRe(cn) if !alterNonColumn.contains(cn.toLowerCase) =>
              colIdx(cn).map { i =>
                TableAlter.DropCol(t.copy(cols =
                  t.cols.take(i) ++ t.cols.drop(i + 1)), i)
              }
            case alterModifyRe(defStr) if !alterNonColumn.contains(firstWord(defStr)) =>
              parseColDef(defStr.trim).flatMap { col =>
                colIdx(col.name).map { i =>
                  // a column's PK membership survives MODIFY
                  val kept = col.copy(pk = t.cols(i).pk,
                    notNull = col.notNull || t.cols(i).pk)
                  TableAlter.Retype(t.copy(cols = t.cols.updated(i, kept)))
                }
              }
            case alterChangeRe(oldName, defStr)
                if !alterNonColumn.contains(oldName.toLowerCase) =>
              parseColDef(defStr.trim).flatMap { col =>
                colIdx(oldName).map { i =>
                  val kept = col.copy(pk = t.cols(i).pk,
                    notNull = col.notNull || t.cols(i).pk)
                  TableAlter.Retype(t.copy(cols = t.cols.updated(i, kept)))
                }
              }
            case _ => None
          }
        }
      case _ => None
    }

  private val renameTableRe = """(?is)^\s*RENAME\s+TABLE\s+(.+)$""".r
  private val renamePairRe =
    """(?is)^([`"\w.]+)\s+TO\s+([`"\w.]+)$""".r

  /** `RENAME TABLE a TO b[, c TO d]` → ((schema, table), (schema,
    * table)) pairs in statement order, unqualified names defaulting to
    * `defaultSchema` (a rename may cross schemas: `RENAME TABLE t TO
    * test2.t`). The schema-qualified form the rename-under-filter
    * decision needs (buildDDLEventForRenameTable(s)). */
  def parseRenameTableQualified(stmt: String, defaultSchema: String)
      : Seq[((String, String), (String, String))] =
    stmt.trim.stripSuffix(";") match {
      case renameTableRe(pairs) =>
        splitTopLevel(pairs).flatMap { p =>
          p.trim match {
            case renamePairRe(from, to) =>
              def qual(s: String): (String, String) = {
                val parts = s.replace("`", "").replace("\"", "").split('.')
                if (parts.length >= 2) (parts(parts.length - 2), parts.last)
                else (defaultSchema, parts.last)
              }
              Some(qual(from) -> qual(to))
            case _ => None
          }
        }
      case _ => Nil
    }

  /** `RENAME TABLE a TO b[, c TO d]` → (from, to) unqualified name
    * pairs, statement order. */
  def parseRenameTable(stmt: String): Seq[(String, String)] =
    stmt.trim.stripSuffix(";") match {
      case renameTableRe(pairs) =>
        splitTopLevel(pairs).flatMap { p =>
          p.trim match {
            case renamePairRe(from, to) =>
              def bare(s: String) =
                s.replace("`", "").replace("\"", "").split('.').last
              Some(bare(from) -> bare(to))
            case _ => None
          }
        }
      case _ => Nil
    }
}
