package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Table allow/deny filter with wildcards and negation.
  *
  * Re-implements the semantics of the reference's table filter
  * (pkg/filter/filter.go:86,105-118, which delegates to TiDB's
  * util/table-filter): rules are `schema.table` glob patterns, `!`
  * prefix negates, LAST matching rule wins, and a leading negative
  * rule implies `*.*` accepted first. Empty rule set matches nothing.
  *
  * Compiled to a single Catalyst `Column` predicate (LIKE chain) — no
  * UDF, fully codegen'd, and pushable into the scan.
  */
object TableMatcher {

  final case class Rule(schemaPat: String, tablePat: String, positive: Boolean)

  def parse(rules: Seq[String]): Seq[Rule] = {
    val parsed = rules.map { raw =>
      val (pos, body) =
        if (raw.startsWith("!")) (false, raw.drop(1)) else (true, raw)
      body.split("\\.", 2) match {
        case Array(s, t) => Rule(s, t, pos)
        case Array(s)    => Rule(s, "*", pos)
      }
    }
    // leading negation implies an initial accept-all (table-filter's
    // documented behavior: ['!a.b'] means "everything except a.b")
    if (parsed.headOption.exists(!_.positive)) Rule("*", "*", positive = true) +: parsed
    else parsed
  }

  /** Glob (`*`, `?`) → SQL LIKE pattern, escaping LIKE metacharacters. */
  def globToLike(glob: String): String =
    glob.flatMap {
      case '*'  => "%"
      case '?'  => "_"
      case '%'  => "\\%"
      case '_'  => "\\_"
      case '\\' => "\\\\"
      case c    => c.toString
    }

  /** Predicate: does (schema, table) pass the rule chain? */
  def matches(schema: Column, table: Column, rules: Seq[String],
              caseSensitive: Boolean = false): Column = {
    val (s, t) = if (caseSensitive) (schema, table) else (lower(schema), lower(table))
    def norm(p: String) = if (caseSensitive) p else p.toLowerCase
    parse(rules).foldLeft(lit(false)) { (acc, r) =>
      val hit = s.like(globToLike(norm(r.schemaPat))) &&
        t.like(globToLike(norm(r.tablePat)))
      when(hit, lit(r.positive)).otherwise(acc)
    }
  }

  /** Plain-Scala evaluation of the rule chain for driver-side values
    * (DDL dispatch and other control-plane checks — same semantics as
    * [[matches]], no Spark involved). */
  def matchesValue(schema: String, table: String, rules: Seq[String],
                   caseSensitive: Boolean = false): Boolean = {
    def norm(x: String) = if (caseSensitive) x else x.toLowerCase
    def globMatch(glob: String, v: String): Boolean = {
      val regex = glob.flatMap {
        case '*' => ".*"
        case '?' => "."
        case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
        case c => c.toString
      }
      v.matches(regex)
    }
    parse(rules).foldLeft(false) { (acc, r) =>
      if (globMatch(norm(r.schemaPat), norm(schema)) &&
        globMatch(norm(r.tablePat), norm(table))) r.positive
      else acc
    }
  }

  /** DuckDB-dialect SQL mirror of [[matches]] for oracle queries. */
  def matchesSql(schemaCol: String, tableCol: String, rules: Seq[String],
                 caseSensitive: Boolean = false): String = {
    val (s, t) =
      if (caseSensitive) (schemaCol, tableCol)
      else (s"lower($schemaCol)", s"lower($tableCol)")
    def norm(p: String) = if (caseSensitive) p else p.toLowerCase
    parse(rules).foldLeft("FALSE") { (acc, r) =>
      val sp = globToLike(norm(r.schemaPat)).replace("'", "''")
      val tp = globToLike(norm(r.tablePat)).replace("'", "''")
      s"CASE WHEN $s LIKE '$sp' ESCAPE '\\' AND $t LIKE '$tp' ESCAPE '\\' " +
        s"THEN ${r.positive.toString.toUpperCase} ELSE $acc END"
    }
  }
}
