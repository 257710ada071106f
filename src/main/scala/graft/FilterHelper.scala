package graft

import java.nio.file.{Files, Paths}
import graft.model.{ConfigToml, DdlParser}
import graft.operators.{Filters, TableMatcher}

/** Filter-rule checker — the reference's cmd/filter-helper/main.go:
  * load a changefeed config, then answer "does this table replicate?"
  * / "is this DDL discarded or ignored?" without running a feed.
  * Output strings mirror main.go:65-93 so operators can diff the two
  * tools directly.
  *
  * Usage:
  * {{{
  *   graft.FilterHelper --config cf.toml --table test.t1
  *   graft.FilterHelper --config cf.toml --table test.t1 --ddl 'DROP TABLE test.t1'
  *   graft.FilterHelper --rules 'test.*,!test.skip' --table test.skip
  * }}}
  */
object FilterHelper {

  final case class Decision(code: Int, text: String)

  /** Testable core. */
  def run(args: Seq[String]): Decision = {
    val (_, flags) = Cli.parseArgs(args)
    val cfg = flags.get("config") match {
      case Some(p) =>
        val text =
          try new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
          catch { case e: Exception => return Decision(ConfigToml.ExitExecuteFailed, s"read config file error: $e") }
        try ConfigToml.toConfig(ConfigToml.parse(text), "filter-helper")
        catch { case e: Exception => return Decision(ConfigToml.ExitDecodeTomlFailed, s"decode config file error: $e") }
      case None => graft.model.ChangefeedConfig("filter-helper")
    }
    val rules = flags.get("rules").map(_.split(",").toSeq).getOrElse(cfg.filter.rules)
    val caseSensitive = cfg.filter.caseSensitive
    val table = flags.getOrElse("table", "")
    val parts = table.split("\\.", 2)
    if (parts.length != 2)
      return Decision(ConfigToml.ExitInvalidFlag,
        s"the input format is invalid, only support {schema}.{table}: $table")
    val (schema, tbl) = (parts(0), parts(1))
    flags.get("ddl") match {
      case None =>
        if (TableMatcher.matchesValue(schema, tbl, rules, caseSensitive))
          Decision(0, s"Table: $table, Matched filter rule")
        else Decision(0, s"Table: $table, Not matched filter rule")
      case Some(ddl) =>
        // discard = table not replicated at all; ignore = dropped by
        // the DDL-class / ignore-sql event filter (filter.go:53-68)
        if (!TableMatcher.matchesValue(schema, tbl, rules, caseSensitive))
          return Decision(0, s"DDL: $ddl, should be discard by event filter rule")
        if (DdlParser.parse(ddl, ts = 0L, defaultSchema = schema).isEmpty)
          return Decision(ConfigToml.ExitExecuteFailed, s"filter ddl error: $ddl, error: unparseable DDL")
        val cls = Filters.ddlClassValue(ddl)
        val ignoredClasses = flags.get("ignore-ddl-classes")
          .map(_.split(",").toSeq).getOrElse(Nil)
        val ignoreSql = flags.get("ignore-sql").map(_.split(",").toSeq).getOrElse(Nil)
        val ignored = ignoredClasses.contains(cls) ||
          ignoreSql.exists(re => re.r.findFirstIn(ddl).isDefined)
        if (ignored) Decision(0, s"DDL: $ddl, should be ignored by event filter rule")
        else Decision(0, s"DDL: $ddl, should not be discard by event filter rule")
    }
  }

  def main(args: Array[String]): Unit = {
    val d = run(args.toSeq)
    if (d.code == 0) println(d.text)
    else { System.err.println(d.text); sys.exit(d.code) }
  }
}
