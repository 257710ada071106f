package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event routing (SURVEY §2.6; reference
  * downstreamadapter/sink/eventrouter/event_router.go:36-76, partition
  * rules under .../eventrouter/partition/, topic templates under
  * .../eventrouter/topic/expression.go:58-110).
  *
  * Partition assignment uses an md5-derived stable hash rather than
  * Spark's internal murmur3: the partition number is WIRE-VISIBLE
  * state (it decides the Kafka partition and hence per-key ordering),
  * so it must be reproducible by any consumer in any language — and it
  * makes the operator oracle-checkable. The md5 prefix is uniform, so
  * partition skew behavior matches a murmur hash.
  */
object Routing {

  /** Stable 60-bit hash of the given columns: first 15 hex chars of
    * md5 over a '|'-joined rendering. Null renders as empty string.
    * Native md5-prefix kernel (no intermediate hex string), value-
    * identical to `conv(substring(md5(..),1,15),16,10)`. */
  def stableHash(cols: Seq[Column]): Column =
    graft.functions.HashExpressions.md5Prefix64(
      concat_ws("|", cols.map(_.cast("string")): _*), 15)

  /** DuckDB mirror of [[stableHash]]. */
  def stableHashSql(cols: Seq[String]): String =
    s"CAST(('0x' || substring(md5(concat_ws('|', ${cols.map(c => s"CAST($c AS VARCHAR)").mkString(", ")})), 1, 15)) AS BIGINT)"

  /** partition rule "default"/"table": all rows of one table go to one
    * partition (partition/table.go:38). */
  def partitionByTable(env: DataFrame, numPartitions: Int): DataFrame =
    env.withColumn("_partition",
      pmod(stableHash(Seq(col("_schema"), col("_table"))), lit(numPartitions.toLong)))

  /** partition rule "ts" (partition/ts.go:31). */
  def partitionByTs(env: DataFrame, numPartitions: Int): DataFrame =
    env.withColumn("_partition", pmod(col("_commit_ts"), lit(numPartitions.toLong)))

  /** partition rule "index-value"/"columns": hash of key column values
    * — row-level ordering key (partition/index_value.go:42,
    * columns.go:44). Key columns come from the post-image for I/U and
    * the pre-image for D.
    *
    * EMPTY `keyCols` (a no-PK force-replicate table) degrades to
    * hash(schema, table) — the whole table serializes through one
    * worker. That is the conservative stand-in for the reference's
    * whole-row conflict keys (causality genRowKeys hashes every
    * column when there is no index): a whole-ROW hash cannot give
    * per-row ordering here because an update's pre- and post-image
    * hash differently, so table-serial is the partitioning that keeps
    * delete-then-insert order correct. */
  def partitionByKeyColumns(env: DataFrame, keyCols: Seq[String],
                            numPartitions: Int,
                            caseInsensitiveKeys: Boolean = false): DataFrame = {
    val afterType = env.schema("after").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val keyVals = keyCols.map { f =>
      val v = when(col("_op") === "D", col(s"before.$f")).otherwise(col(s"after.$f"))
      // collation-aware canonicalization: ci-collated string keys
      // lowercase before hashing so 'ABC' and 'abc' conflict-order
      // together (genRowKeys, causality/helper.go:129)
      if (caseInsensitiveKeys &&
        afterType(f).dataType == org.apache.spark.sql.types.StringType) lower(v)
      else v
    }
    env.withColumn("_partition",
      pmod(stableHash(col("_schema") +: col("_table") +: keyVals),
        lit(numPartitions.toLong)))
  }

  /** Physically co-locate rows by their assigned partition (the
    * repartition the sink relies on for per-key ordering; at cluster
    * scale this is the only shuffle before the sink). */
  def repartitionByAssignment(env: DataFrame, numPartitions: Int): DataFrame =
    env.repartition(numPartitions, col("_partition"))

  /** Salted repartition for hot keys — the span-split answer to the
    * reference's write-bytes splitter (maintainer/split/splitter.go:
    * 41-65): keys listed in `hotKeys` fan out over `saltFactor`
    * sub-partitions (per-key ordering is intentionally given up for
    * those keys, exactly like a split table span), everything else
    * keeps one partition per key. AQE handles moderate skew on its
    * own; this is for pathological single-key hotspots. */
  def saltedRepartition(env: DataFrame, keyCols: Seq[String], hotKeys: Seq[String],
                        numPartitions: Int, saltFactor: Int): DataFrame = {
    val keyStr = concat_ws("|", keyCols.map(col): _*)
    val salt = when(keyStr.isin(hotKeys: _*),
      pmod(stableHash(Seq(col("_row_id"))), lit(saltFactor.toLong)))
      .otherwise(lit(0L))
    env
      .withColumn("_salt", salt)
      .repartition(numPartitions, keyStr, col("_salt"))
  }

  /** Topic template `[prefix]{schema}[middle][{table}][suffix]`
    * (topic/expression.go:58-110), with the kafka-legal charset rule:
    * illegal chars collapse to '_'. */
  def topicColumn(template: String): Column = {
    val withSchema = regexp_replace(
      regexp_replace(lit(template), lit("\\{schema\\}"), col("_schema")),
      lit("\\{table\\}"), col("_table"))
    regexp_replace(withSchema, lit("[^a-zA-Z0-9\\._\\-]"), lit("_"))
  }

  def routeTopic(env: DataFrame, template: String): DataFrame =
    env.withColumn("_topic", topicColumn(template))

  /** Full event-router dispatch (event_router.go:36-76): rules are
    * tried in order, FIRST matching rule wins, and a default `*.*`
    * table-partition rule is appended (:48-52). Produces `_partition`
    * (+ `_topic`/`_sink_schema`/`_sink_table` when any rule routes
    * them) in one pass of codegen'd conditionals — no per-rule passes
    * over the data. */
  def dispatch(env: DataFrame, rules: Seq[graft.model.DispatchRule],
               numPartitions: Int): DataFrame = {
    import graft.model.{DispatchRule, PartitionRule}
    val all = rules :+ DispatchRule() // default *.* appended
    def matches(r: DispatchRule): Column =
      TableMatcher.matches(col("_schema"), col("_table"), r.matcher)
    def partCol(r: DispatchRule): Column = r.partition match {
      case PartitionRule.Table =>
        pmod(stableHash(Seq(col("_schema"), col("_table"))), lit(numPartitions.toLong))
      case PartitionRule.Ts =>
        pmod(col("_commit_ts"), lit(numPartitions.toLong))
      case PartitionRule.KeyColumns(cols) =>
        val keyVals = cols.map { f =>
          when(col("_op") === "D", col(s"before.$f")).otherwise(col(s"after.$f"))
        }
        pmod(stableHash(col("_schema") +: col("_table") +: keyVals),
          lit(numPartitions.toLong))
      case PartitionRule.Fixed(p) =>
        lit(p.toLong % numPartitions.toLong)
      case PartitionRule.TableSplit(parts, keyCols) =>
        // table anchor + salt bounded by the split count: the table's
        // rows occupy exactly `parts` adjacent hash slots. The salt is
        // the delete-aware handle-key image when keys are known — one
        // key stays in ONE slot, the key-range-span property that
        // preserves per-key order under split tables — else _row_id
        val salt =
          if (keyCols.nonEmpty)
            stableHash(keyCols.map { f =>
              when(col("_op") === "D", col(s"before.$f")).otherwise(col(s"after.$f"))
            })
          else stableHash(Seq(col("_row_id")))
        pmod(stableHash(Seq(col("_schema"), col("_table"))) +
          pmod(salt, lit(parts.toLong)),
          lit(numPartitions.toLong))
      case PartitionRule.SplitFixed(targets) =>
        // row salt picks one of the PINNED target partitions
        val slots = typedLit(targets.map(_.toLong % numPartitions.toLong))
        element_at(slots,
          (pmod(stableHash(Seq(col("_row_id"))), lit(targets.size.toLong)) + 1L)
            .cast("int"))
    }
    def tpl(t: String): Column =
      regexp_replace(
        regexp_replace(lit(t), lit("\\{schema\\}"), col("_schema")),
        lit("\\{table\\}"), col("_table"))
    val partition = all.foldRight(lit(-1L)) { (r, acc) =>
      when(matches(r), partCol(r)).otherwise(acc)
    }
    var out = env.withColumn("_partition", partition)
    if (all.exists(_.topic.isDefined)) {
      val topic = all.foldRight(lit(null).cast("string")) { (r, acc) =>
        when(matches(r),
          r.topic.map(t => topicColumn(t)).getOrElse(lit(null).cast("string")))
          .otherwise(acc)
      }
      out = out.withColumn("_topic", topic)
    }
    if (all.exists(r => r.targetSchema.isDefined || r.targetTable.isDefined)) {
      val ss = all.foldRight(col("_schema")) { (r, acc) =>
        when(matches(r), r.targetSchema.map(tpl).getOrElse(col("_schema"))).otherwise(acc)
      }
      val st = all.foldRight(col("_table")) { (r, acc) =>
        when(matches(r), r.targetTable.map(tpl).getOrElse(col("_table"))).otherwise(acc)
      }
      out = out.withColumn("_sink_schema", ss).withColumn("_sink_table", st)
    }
    out
  }

  /** First-match table routing folded back INTO `_schema`/`_table` —
    * the redo-replay form (pkg/applier/redo.go replays through the
    * sink's own dispatch, so statements render against the ROUTED
    * downstream names; tests/integration_tests/redo_apply_table_route).
    * Rules are tried in order, first match wins, unmatched rows keep
    * their source names. A no-route rule set is the identity.
    *
    * `ddlQueryCol`: a DDL frame's raw query-text column. When given,
    * routed rows ALSO rewrite the table identifiers inside the query
    * text itself (the reference parser-rewrites the statement:
    * pkg/routing/router.go ApplyToDDLEvent →
    * rewriteParserBackedDDLQuery → NewRoutedDDLEvent) — otherwise a
    * replayed `CREATE TABLE users …` would still target the SOURCE
    * name while its metadata claims the routed one. The rewrite
    * replaces the qualified `schema.table` form first, then bare
    * word-bounded `table` references, both case-insensitive and
    * backtick-tolerant (\Q…\E-quoted, so names never inject regex);
    * unrouted rows keep their text byte-identical. */
  def applyTableRoutes(env: DataFrame, rules: Seq[graft.model.DispatchRule],
                       ddlQueryCol: Option[String] = None): DataFrame = {
    if (!rules.exists(r => r.targetSchema.isDefined || r.targetTable.isDefined)) return env
    def matches(r: graft.model.DispatchRule): Column =
      TableMatcher.matches(col("_schema"), col("_table"), r.matcher)
    def tpl(t: String): Column =
      regexp_replace(
        regexp_replace(lit(t), lit("\\{schema\\}"), col("_schema")),
        lit("\\{table\\}"), col("_table"))
    val ss = rules.foldRight(col("_schema")) { (r, acc) =>
      when(matches(r), r.targetSchema.map(tpl).getOrElse(col("_schema"))).otherwise(acc)
    }
    val st = rules.foldRight(col("_table")) { (r, acc) =>
      when(matches(r), r.targetTable.map(tpl).getOrElse(col("_table"))).otherwise(acc)
    }
    def rewriteDdl(q: Column): Column = {
      // replacement-side escape: a routed name's '\' or '$' must not
      // read as a regex group reference
      def repSafe(c: Column): Column =
        regexp_replace(c, lit("([\\\\$])"), lit("\\\\$1"))
      val qualPat = concat(lit("(?i)`?\\Q"), col("_schema"),
        lit("\\E`?\\s*\\.\\s*`?\\Q"), col("_table"), lit("\\E`?"))
      val qualRep = concat(lit("`"), repSafe(ss), lit("`.`"), repSafe(st), lit("`"))
      // bare-name rewrite is KEYWORD-ANCHORED (bounded lookbehind):
      // only a name in table position — after TABLE / INTO / ON /
      // REFERENCES / EXISTS / TRUNCATE / FROM / TO — rewrites, so the
      // table's name inside a string literal (COMMENT 'orders table'),
      // a same-named COLUMN, or a REFERENCES of another schema's
      // same-named table stays untouched (the reference rewrites
      // parser-backed, router.go rewriteParserBackedDDLQuery; this is
      // the regex projection of its table-position rule)
      val barePat = concat(
        lit("(?i)(?<=\\b(?:table|into|on|references|exists|truncate|from|to)\\s{1,10})(?:`\\Q"),
        col("_table"), lit("\\E`|\\Q"), col("_table"), lit("\\E\\b)"))
      val bareRep = concat(lit("`"), repSafe(st), lit("`"))
      // ',' anchors TOO — but only in statements whose comma lists are
      // TABLE NAME lists (DROP/RENAME/TRUNCATE TABLE): 'DROP TABLE t1,
      // t2' and the middle pairs of 'RENAME TABLE a TO b, c TO d' put
      // later names after a comma, not a keyword. CREATE/ALTER comma
      // lists are COLUMN lists, where a same-named column must stay
      // untouched, so they keep keyword-only anchoring.
      val commaPat = concat(
        lit("(?i)(?<=,\\s{0,10})(?:`\\Q"),
        col("_table"), lit("\\E`|\\Q"), col("_table"), lit("\\E\\b)"))
      val tableListStmt = q.rlike("(?is)^\\s*(?:drop|rename|truncate)\\s+table\\b")
      val keywordRouted =
        regexp_replace(regexp_replace(q, qualPat, qualRep), barePat, bareRep)
      val routedText = when(tableListStmt,
        regexp_replace(keywordRouted, commaPat, bareRep))
        .otherwise(keywordRouted)
      when(ss <=> col("_schema") && st <=> col("_table"), q).otherwise(routedText)
    }
    // all rewrites read the ORIGINAL names: materialize them together
    env.select(env.columns.toIndexedSeq.map {
      case "_schema" => ss.as("_schema")
      case "_table" => st.as("_table")
      case other if ddlQueryCol.contains(other) => rewriteDdl(col(other)).as(other)
      case other => col(other)
    }: _*)
  }

  /** Driver-side first-match routed identity of ONE table — the same
    * fold [[applyTableRoutes]] codegens per row, for control-plane
    * callers (validation, census). */
  def routedNameOf(schema: String, table: String,
                   rules: Seq[graft.model.DispatchRule]): (String, String) =
    // the first rule whose MATCHER matches wins, even a target-less
    // one (which routes to the identity) — exactly applyTableRoutes'
    // fold, so control-plane validation and data-path rewrite agree
    rules.find(r => TableMatcher.matchesValue(schema, table, r.matcher)) match {
      case Some(r) =>
        def tpl(t: String): String =
          t.replace("{schema}", schema).replace("{table}", table)
        (r.targetSchema.map(tpl).getOrElse(schema),
          r.targetTable.map(tpl).getOrElse(table))
      case None => (schema, table)
    }

  /** The reference's route-conflict error identity
    * (pkg/errors/error.go:243-245) — already in FeedBackoff's
    * unretryable set: a conflicted feed FAILS, it does not retry. */
  final val RouteConflictCode = "CDC:ErrTableRouteConflict"

  /** Route-conflict validation (pkg/routing/registry.go:24-90
    * `Validation is side-effect free`, router.go:376
    * ValidateNoConflicts; tests/integration_tests/
    * table_route_conflict_detection): DIFFERENT source tables mapping
    * to the SAME routed name is a conflict — the create path must
    * reject it (static case), and a later CREATE TABLE introducing one
    * must fail the feed with ErrTableRouteConflict (dynamic case).
    * Returns the first conflict rendered deterministically, or None. */
  def validateRoutes(tables: Seq[(String, String)],
                     rules: Seq[graft.model.DispatchRule]): Option[String] = {
    if (!rules.exists(r => r.targetSchema.isDefined || r.targetTable.isDefined))
      return None
    tables.distinct
      .map { case st @ (s, t) => (routedNameOf(s, t, rules), st) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .collectFirst {
        case (tgt, srcs) if srcs.map(_._2).distinct.size > 1 =>
          val ss = srcs.map(_._2).distinct.sorted
            .map { case (s, t) => s"$s.$t" }.mkString(", ")
          s"table route conflict: $ss all route to ${tgt._1}.${tgt._2}"
      }
  }

  /** Table routing / rename (pkg/config/sink.go:426-440): rewrite sink
    * schema/table with `{schema}`/`{table}` placeholders. */
  def routeTable(env: DataFrame, targetSchema: String, targetTable: String): DataFrame = {
    def tpl(t: String): Column =
      regexp_replace(
        regexp_replace(lit(t), lit("\\{schema\\}"), col("_schema")),
        lit("\\{table\\}"), col("_table"))
    env
      .withColumn("_sink_schema", tpl(targetSchema))
      .withColumn("_sink_table", tpl(targetTable))
  }
}
