package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.functions._

/** The changefeed filter pipeline (SURVEY §2.4; reference
  * pkg/filter/filter.go:47-78, config pkg/config/filter.go:21-47).
  *
  * Every filter is a pure `DataFrame => DataFrame` over the envelope
  * (graft.model.Envelope) built from codegen'd Column predicates — the
  * TiDB expression engine's role (pkg/filter/expr_filter.go) is played
  * by Catalyst itself.
  */
object Filters {

  /** schema.table allow/deny with wildcards & negation
    * (filter.go:86,105-118). */
  def tableFilter(env: DataFrame, rules: Seq[String],
                  caseSensitive: Boolean = false): DataFrame =
    env.filter(TableMatcher.matches(col("_schema"), col("_table"), rules, caseSensitive))

  /** Drop DML by event type: ignore list of I/U/D
    * (pkg/filter/sql_event_filter.go:44-110). */
  def eventTypeFilter(env: DataFrame, ignoreOps: Seq[String]): DataFrame =
    if (ignoreOps.isEmpty) env
    else env.filter(!col("_op").isin(ignoreOps: _*))

  /** Drop whole txns whose startTs is listed
    * (filter.go:94-95, config/filter.go:23 IgnoreTxnStartTs). */
  def startTsFilter(env: DataFrame, ignoreStartTs: Seq[Long]): DataFrame =
    if (ignoreStartTs.isEmpty) env
    else env.filter(!col("_start_ts").isin(ignoreStartTs: _*))

  /** BDR loop prevention: drop rows that were WRITTEN by a CDC
    * (marked upstream via the `tidb_cdc_write_source` session
    * variable the other direction's MySQL writer sets —
    * [[graft.sinks.MysqlSink.sessionPrologue]]; reference
    * pkg/sink/mysql/helper.go:65, schemastore CDCWriteSource). A
    * change log without the marker column passes through unchanged
    * (non-BDR topologies don't carry it). Null/0 = user write. */
  def cdcWriteSourceFilter(env: DataFrame,
                           sourceCol: String = "_cdc_write_source"): DataFrame =
    if (!env.columns.contains(sourceCol)) env
    else env.filter(coalesce(col(sourceCol), lit(0L)) === 0L)

  /** Parse a SQL predicate written against bare payload column names
    * and re-scope every attribute under the `before`/`after` struct.
    * This is the Spark analog of the reference compiling
    * `ParseSimpleExprWithTableInfo` per table schema
    * (expr_filter.go:230-249): Catalyst parses once; resolution
    * happens against the envelope schema at analysis time.
    */
  def imageExpr(spark: SparkSession, sql: String, image: String): Column = {
    val parsed = spark.sessionState.sqlParser.parseExpression(sql)
    val scoped = parsed.transformUp {
      case UnresolvedAttribute(parts) if parts.size == 1 =>
        UnresolvedAttribute(image +: parts)
    }
    org.apache.spark.sql.GraftColumnBridge.column(scoped)
  }

  /** Row-value expression filter (expr_filter.go:40-320):
    * `ignoreInsert` over the post-image of inserts, `ignoreDeleteExpr`
    * over the pre-image of deletes, updates dropped when EITHER the
    * old-image or new-image predicate fires (expr_filter.go:251-320).
    * A row is kept when no applicable predicate matches; null
    * predicate results count as no-match (SQL semantics).
    */
  def exprFilter(spark: SparkSession, env: DataFrame,
                 ignoreInsert: Option[String] = None,
                 ignoreUpdateOld: Option[String] = None,
                 ignoreUpdateNew: Option[String] = None,
                 ignoreDelete: Option[String] = None): DataFrame = {
    def pred(sqlOpt: Option[String], image: String): Column =
      sqlOpt.map(s => coalesce(imageExpr(spark, s, image), lit(false)))
        .getOrElse(lit(false))
    val drop =
      (col("_op") === "I" && pred(ignoreInsert, "after")) ||
      (col("_op") === "U" && (pred(ignoreUpdateOld, "before") || pred(ignoreUpdateNew, "after"))) ||
      (col("_op") === "D" && pred(ignoreDelete, "before"))
    env.filter(!drop)
  }

  /** Per-table-matcher expression filter rules (expr_filter.go:40 —
    * each rule scopes its predicates to the tables its matcher hits;
    * multiple rules OR together). */
  final case class ExprFilterRule(
      matcher: Seq[String],
      ignoreInsert: Option[String] = None,
      ignoreUpdateOld: Option[String] = None,
      ignoreUpdateNew: Option[String] = None,
      ignoreDelete: Option[String] = None)

  def exprFilterRules(spark: SparkSession, env: DataFrame,
                      rules: Seq[ExprFilterRule]): DataFrame = {
    if (rules.isEmpty) return env
    def pred(sqlOpt: Option[String], image: String): Column =
      sqlOpt.map(s => coalesce(imageExpr(spark, s, image), lit(false)))
        .getOrElse(lit(false))
    val drop = rules.map { r =>
      TableMatcher.matches(col("_schema"), col("_table"), r.matcher) && (
        (col("_op") === "I" && pred(r.ignoreInsert, "after")) ||
        (col("_op") === "U" &&
          (pred(r.ignoreUpdateOld, "before") || pred(r.ignoreUpdateNew, "after"))) ||
        (col("_op") === "D" && pred(r.ignoreDelete, "before")))
    }.reduce(_ || _)
    env.filter(!drop)
  }

  /** Drop UPDATEs whose changed-column set is a subset of `ignorable`
    * (pkg/filter/update_only_columns_filter.go): i.e. every column NOT
    * in the ignore list is null-safe-equal between before and after.
    */
  def updateOnlyColumnsFilter(env: DataFrame, ignorable: Seq[String]): DataFrame = {
    val payloadFields = env.schema("after").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    val significant = payloadFields.filterNot(ignorable.contains)
    val unchangedOutsideIgnorable = significant
      .map(f => col(s"before.$f") <=> col(s"after.$f"))
      .reduceOption(_ && _).getOrElse(lit(true))
    env.filter(!(col("_op") === "U" && unchangedOutsideIgnorable))
  }

  /** DDL class taxonomy (binlog-filter, pkg/binlog-filter/
    * filter.go:41-86) as DATA — (class, prefix patterns, contains
    * patterns), first rule wins — so the columnar classifier and the
    * driver-side dispatch classifier are generated from ONE source and
    * cannot drift. */
  private val ddlClassRules: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("create table", Seq("create table"), Nil),
    ("drop table", Seq("drop table"), Nil),
    ("truncate table", Seq("truncate table", "truncate "), Nil),
    ("rename table", Seq("rename table"), Nil),
    ("create index", Seq("create index", "create unique index"), Nil),
    ("drop index", Seq("drop index"), Nil),
    ("create database", Seq("create database", "create schema"), Nil),
    ("drop database", Seq("drop database", "drop schema"), Nil),
    ("add column", Nil, Seq("add column", " add ")),
    ("drop column", Nil, Seq("drop column")),
    ("modify column", Nil, Seq("modify column", "modify ")),
    ("change column", Nil, Seq("change column", "change ")),
    ("alter partition", Nil, Seq(" partition")),
    ("alter table", Seq("alter table"), Nil),
    ("create view", Seq("create view"), Nil),
    ("drop view", Seq("drop view"), Nil),
    ("recover table", Seq("recover table"), Nil),
    ("alter database", Seq("alter database", "alter schema"), Nil))

  /** Statement families OUTSIDE the replication whitelist
    * (ddlWhiteListMap, pkg/filter/ddl.go:38-103, and its "Not
    * supported yet" block :138-151 — sequences, savepoints, ANALYZE,
    * GRANT, placement policies, table ATTRIBUTES, bindings, locks).
    * Matched by LEADING VERB (plus the `ALTER TABLE … ATTRIBUTES=`
    * form) BEFORE the contains-pattern class rules run, so
    * 'ANALYZE TABLE t PARTITION p0' cannot misroute to
    * 'alter partition' and replicate. TTL alters are NOT here:
    * ActionAlterTTLInfo/ActionAlterTTLRemove are whitelisted
    * (ddl.go:130-132, the ddl_attributes scenario's TTL half). */
  private val neverReplicatedRes: Seq[String] = Seq(
    "^analyze\\s", "^grant\\s", "^revoke\\s", "^savepoint\\s",
    "^release\\s+savepoint", "^rollback", "^set\\s", "^flush\\s",
    "^admin\\s", "^optimize\\s+table", "^repair\\s+table",
    "^lock\\s+tables?", "^unlock\\s+tables?", "^flashback\\s+cluster",
    "^(create|alter|drop)\\s+sequence\\s",
    "^(create|alter|drop)\\s+placement\\s+policy\\s",
    "^(create|drop)\\s+(global\\s+|session\\s+)?binding",
    "^alter\\s+table\\s.*\\battributes\\s*=").map("(?s)" + _)

  /** DDL event classification: statement text → DDL class (the
    * classes the reference's event filter accepts in `ignore-event`),
    * columnar form. Never-replicated families classify `other ddl`
    * first — the class [[ddlDispatch]] discards. */
  def ddlClass(query: Column): Column = {
    val q = lower(trim(query))
    val blacklisted = neverReplicatedRes
      .map(p => regexp_like(q, lit(p)))
      .reduce(_ || _)
    val classed = ddlClassRules.foldRight(lit("other ddl")) {
      case ((cls, starts, contains), acc) =>
        val cond = (starts.map(s => q.startsWith(s)) ++
          contains.map(c => q.contains(c))).reduce(_ || _)
        when(cond, cls).otherwise(acc)
    }
    when(blacklisted, "other ddl").otherwise(classed)
  }

  /** Driver-side twin of [[ddlClass]] (control-plane dispatch). */
  def ddlClassValue(query: String): String = {
    val q = query.trim.toLowerCase
    if (neverReplicatedRes.exists(p => p.r.findFirstIn(q).isDefined)) "other ddl"
    else ddlClassRules.collectFirst {
      case (cls, starts, contains)
          if starts.exists(q.startsWith) || contains.exists(q.contains) => cls
    }.getOrElse("other ddl")
  }

  /** DDL filter: drop by class (`ignore-event`,
    * sql_event_filter.go:44-110) and/or by query-text regex
    * (`ignore-sql`, sql_event_filter.go:72-76). Frame must carry a
    * `query` column. */
  def ddlFilter(ddl: DataFrame, ignoreClasses: Seq[String],
                ignoreSqlRegexps: Seq[String]): DataFrame = {
    val byClass =
      if (ignoreClasses.isEmpty) lit(false)
      else ddlClass(col("query")).isin(ignoreClasses: _*)
    val byRegex = ignoreSqlRegexps
      .map(p => regexp_like(col("query"), lit(p)))
      .foldLeft(lit(false))(_ || _)
    ddl.filter(!(byClass || byRegex))
  }

  /** Two-level DDL treatment (filter.go:53-68): a DDL on a table the
    * changefeed doesn't replicate is DISCARDED outright — as is any
    * statement class outside the replication whitelist
    * (ddlWhiteListMap, pkg/filter/ddl.go:38-103: sequences,
    * savepoints, ANALYZE, GRANT, placement policies … are never
    * replicated — the ddl_sequence/savepoint integration scenarios);
    * one matched by ignore rules is IGNORED — still applied to the
    * schema registry (the table's shape must stay correct) but not
    * emitted downstream; everything else EMITS. Returns the frame with
    * a `_ddl_action` column so the barrier loop can route each class. */
  def ddlDispatch(ddl: DataFrame, tableRules: Seq[String],
                  ignoreClasses: Seq[String],
                  ignoreSqlRegexps: Seq[String]): DataFrame = {
    val replicated = TableMatcher.matches(col("_schema"), col("_table"), tableRules)
    val cls = ddlClass(col("query"))
    val byClass =
      if (ignoreClasses.isEmpty) lit(false)
      else cls.isin(ignoreClasses: _*)
    val byRegex = ignoreSqlRegexps
      .map(p => regexp_like(col("query"), lit(p)))
      .foldLeft(lit(false))(_ || _)
    ddl.withColumn("_ddl_action",
      when(!replicated || cls === "other ddl", "discard")
        .when(byClass || byRegex, "ignore")
        .otherwise("emit"))
  }

  /** The outcome of a RENAME TABLE under the changefeed's table
    * filter. `query` is rebuilt from the surviving pairs only;
    * `feedDrops` lists tables that LEAVE the feed (renamed to a
    * filtered-out name — the rename still executes downstream, then
    * the feed stops tracking the table). */
  final case class RenameDecision(action: String, query: String,
                                  addNames: Seq[(String, String)] = Nil,
                                  dropNames: Seq[(String, String)] = Nil,
                                  feedDrops: Seq[(String, String)] = Nil)

  /** Rename-under-filter decision table
    * (buildDDLEventForRenameTable/-Tables,
    * logservice/schemastore/persist_storage_ddl_handlers.go:2354-2518,
    * :2792-2900; tests/integration_tests/multi_tables_ddl). Per pair:
    *
    *  - old replicated → new replicated: the pair replicates (drop the
    *    old name, add the new — TableNameChange);
    *  - old replicated → new filtered: the pair's rename still emits
    *    downstream, but the table leaves the feed (NeedDroppedTables);
    *  - old filtered → new replicated: NOT ALLOWED — a table cannot
    *    enter a changefeed through a rename (the docs' documented
    *    limitation); the whole DDL errors with
    *    CDC:ErrSyncRenameTableFailed, which [[graft.streaming
    *    .FeedBackoff]] classifies unretryable;
    *  - both filtered: the pair is skipped.
    *
    * The emitted query keeps only surviving pairs (the reference's
    * resultQuerys rebuild); all pairs skipped → discard. */
  def renameDispatch(query: String, eventSchema: String, tableRules: Seq[String],
                     caseSensitive: Boolean = false): RenameDecision = {
    val pairs = graft.model.MySqlDdl.parseRenameTableQualified(query, eventSchema)
    def m(st: (String, String)): Boolean =
      TableMatcher.matchesValue(st._1, st._2, tableRules, caseSensitive)
    if (pairs.exists { case (o, n) => !m(o) && m(n) })
      return RenameDecision("error", query)
    val kept = pairs.filter { case (o, _) => m(o) }
    if (kept.isEmpty) return RenameDecision("discard", query)
    def q(st: (String, String)) = s"`${st._1}`.`${st._2}`"
    RenameDecision("emit",
      "RENAME TABLE " + kept.map { case (o, n) => s"${q(o)} TO ${q(n)}" }.mkString(", "),
      addNames = kept.collect { case (_, n) if m(n) => n },
      dropNames = kept.map(_._1),
      feedDrops = kept.collect { case (o, n) if !m(n) => o })
  }

  /** [[ddlDispatch]] with the rename decision table applied on top:
    * rename-classed rows re-dispatch through [[renameDispatch]] (their
    * action can be `error`, and their emitted query shrinks to the
    * surviving pairs in `_ddl_query`). DDL streams are control-plane
    * sized, so the per-row parse is a deliberate non-codegen UDF. */
  def ddlDispatchRenameAware(ddl: DataFrame, tableRules: Seq[String],
                             ignoreClasses: Seq[String],
                             ignoreSqlRegexps: Seq[String]): DataFrame = {
    val rules = tableRules
    // ONE struct-returning UDF: the rename parses once per row, not
    // once per consumed field
    val dispatch = udf((q: String, s: String) => {
      val d = renameDispatch(q, s, rules)
      (d.action, d.query)
    })
    val base = ddlDispatch(ddl, tableRules, ignoreClasses, ignoreSqlRegexps)
    val isRename = ddlClass(col("query")) === "rename table"
    base
      .withColumn("_rn",
        when(isRename && col("_ddl_action") =!= "ignore",
          dispatch(col("query"), col("_schema")))) // null otherwise
      .withColumn("_ddl_action",
        coalesce(col("_rn._1"), col("_ddl_action")))
      .withColumn("_ddl_query",
        when(col("_rn._1") === "emit", col("_rn._2"))
          .otherwise(col("query")))
      .drop("_rn")
  }

  /** Evaluate generated/virtual columns into both images before
    * predicate evaluation — the reference builds the row with virtual
    * columns first (expr_filter.go:323 buildRowWithVirtualColumns;
    * generated cols SURVEY §1.3). Expressions are SQL over the bare
    * payload names, resolved per image; a null image stays null. */
  def withVirtualColumns(spark: SparkSession, env: DataFrame,
                         virtuals: Seq[(String, String)]): DataFrame =
    virtuals.foldLeft(env) { case (df, (name, sql)) =>
      // UpdateFields propagates a null struct, so no guard is needed
      df.withColumn("before", col("before").withField(name, imageExpr(spark, sql, "before")))
        .withColumn("after", col("after").withField(name, imageExpr(spark, sql, "after")))
    }

  /** System-schema / eligibility filter (filter.go:33-44,73-74):
    * always-deny schemas, plus ineligible tables (no handle key)
    * unless forceReplicate. Covers both the CDC-private schemas and
    * the TiDB system schemas the reference's IsSysSchema falls through
    * to (pkg/filter/utils.go:28 → TiDB IsSystemSchema). */
  val systemSchemas: Seq[String] = Seq(
    "tidb_cdc", "lightning_task_info", "workload_schema",
    "mysql", "information_schema", "performance_schema", "sys",
    "metrics_schema", "inspection_schema")

  def systemSchemaFilter(env: DataFrame): DataFrame =
    env.filter(!lower(col("_schema")).isin(systemSchemas: _*))

  /** Eligibility (filter.go:73-74 `IsEligibleTable`): a table with no
    * handle key / unique index cannot be replicated safely (updates
    * and deletes have no row identity downstream) — its rows drop
    * unless force-replicate is set. `ineligible` comes from registry
    * metadata (tables whose TableMeta lacks handle keys). */
  def eligibleTableFilter(env: DataFrame, ineligible: Seq[(String, String)],
                          forceReplicate: Boolean = false): DataFrame =
    if (forceReplicate || ineligible.isEmpty) env
    else {
      val keys = ineligible.map { case (s, t) => s"${s.toLowerCase}.${t.toLowerCase}" }
      env.filter(!concat_ws(".", lower(col("_schema")), lower(col("_table")))
        .isin(keys: _*))
    }
}
