package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Upstream/downstream consistency diff — the reference's sync-diff
  * (pkg/diff/diff.go:129-479, chunk.go) re-expressed relationally.
  *
  * Two phases, exactly like the reference:
  *
  *  1. CHECKSUM: every row hashes to a chunk (stable key hash, so
  *     both sides agree with no coordination) and each side folds an
  *     order-independent per-chunk checksum — one aggregation per
  *     side, `nChunks` rows out. Chunks whose (checksum, count) pairs
  *     match are PROVEN equal and never touched again.
  *  2. ROW COMPARE: only rows in disagreeing chunks join key-to-key
  *     (the disagreeing-chunk list is nChunks-bounded, so it
  *     broadcasts into both scans as a semi-join prune), and each key
  *     classifies as missing downstream / extra downstream / value
  *     mismatch.
  *
  * At 100 TB the checksum pass is scan + one partial agg per side
  * (chunk-count output), and the expensive key join runs only over
  * the chunks that actually drifted — the reference's whole reason
  * for chunking. A clean pair of tables costs two scans and zero
  * joins. */
object TableDiff {

  private def str(c: Column): Column =
    coalesce(c.cast("string"), lit("\u0000null"))

  /** Stable 64-bit row fingerprint over (key ++ value) columns.
    * Both sides compute it with the same expression, so any stable
    * hash works — xxhash64 (native, codegen'd) because this
    * fingerprint never crosses an engine boundary: the oracle
    * compares diff classifications, not hashes. */
  private def rowHash(cols: Seq[String]): Column =
    xxhash64(concat_ws("|", cols.map(c => str(col(c))): _*))

  /** Per-key diff of two same-schema tables. Output: one row per
    * differing key — (keyCols..., diff_kind) with diff_kind in
    * missing_dst / extra_dst / mismatch. */
  def diff(src: DataFrame, dst: DataFrame, keyCols: Seq[String],
           nChunks: Int = 256): DataFrame = {
    require(keyCols.nonEmpty && src.columns.sameElements(dst.columns),
      s"same-schema tables required, got ${src.columns.toSeq} vs ${dst.columns.toSeq}")
    val valCols = src.columns.filterNot(keyCols.contains).toSeq
    val chunk = pmod(rowHash(keyCols), lit(nChunks.toLong)).as("__chunk")
    val fp = rowHash(keyCols ++ valCols).as("__fp")
    val s = src.select(col("*"), chunk, fp)
    val d = dst.select(col("*"), chunk, fp)
    // xor-fold: order-independent and overflow-free under ANSI mode
    // (a 60-bit fp SUM would overflow long); count catches the
    // identical-pair blind spot xor alone would have
    def sums(t: DataFrame) = t.groupBy(col("__chunk"))
      .agg(expr("bit_xor(__fp)").as("__sum"), count(lit(1)).as("__n"))
    // phase 1: chunks whose order-independent checksums disagree
    // (a chunk entirely absent on one side disagrees via the nulls)
    // both chunk-sum frames are (rows/chunkSize)-sized aggregates —
    // data-scaled, estimate-unreliable: hash-partition on the chunk,
    // never broadcast either side
    val bad = sums(s).withColumnRenamed("__sum", "__ssum").withColumnRenamed("__n", "__sn")
      .join(sums(d).withColumnRenamed("__sum", "__dsum").withColumnRenamed("__n", "__dn")
        .hint("shuffle_hash"),
        Seq("__chunk"), "full_outer")
      .filter(!(col("__ssum") <=> col("__dsum")) || !(col("__sn") <=> col("__dn")))
      .select(col("__chunk"))
    // phase 2: row-level compare inside disagreeing chunks only
    val sb = s.join(broadcast(bad), Seq("__chunk"), "left_semi")
      .select(keyCols.map(col) :+ col("__fp").as("__sfp"): _*)
    val db = d.join(broadcast(bad), Seq("__chunk"), "left_semi")
      .select(keyCols.map(col) :+ col("__fp").as("__dfp"): _*)
    sb.join(db, keyCols, "full_outer")
      .withColumn("diff_kind",
        when(col("__dfp").isNull, "missing_dst")
          .when(col("__sfp").isNull, "extra_dst")
          .when(col("__sfp") =!= col("__dfp"), "mismatch"))
      .filter(col("diff_kind").isNotNull)
      .select(keyCols.map(col) :+ col("diff_kind"): _*)
  }

  /** The writeFixSQL role (diff.go:129): downstream statements that
    * reconcile dst to src — REPLACE for missing/mismatched keys (from
    * the src image), DELETE for keys only dst has. Rendering derives
    * from the schema like the sink's generic builder. */
  def fixStatements(src: DataFrame, dst: DataFrame, keyCols: Seq[String],
                    schema: String, table: String,
                    nChunks: Int = 256): DataFrame = {
    val diffs = diff(src, dst, keyCols, nChunks)
    val cols = src.columns.toSeq
    val target = s"`$schema`.`$table`"
    val colList = cols.map(c => s"`$c`").mkString("(", ",", ")")
    val srcImg = src.select(
      keyCols.map(col) :+
        concat_ws(",", cols.map(c => quoteSqlLiteral(col(c))): _*).as("__vals"): _*)
    val keyPred = (k: String) => concat(lit(s"`$k` = "), quoteSqlLiteral(col(k)))
    val pred = keyCols.map(keyPred).reduce((a, b) => concat(a, lit(" AND "), b))
    diffs.join(srcImg, keyCols, "left")
      .select(keyCols.map(col) :+ col("diff_kind") :+
        when(col("diff_kind") === "extra_dst",
          concat(lit(s"DELETE FROM $target WHERE "), pred, lit(" LIMIT 1")))
          .otherwise(concat(lit(s"REPLACE INTO $target $colList VALUES ("),
            col("__vals"), lit(")"))).as("fix_sql"): _*)
  }

  /** MySQL literal rendering for fix SQL (strings quoted with doubled
    * quotes/backslashes, everything else via cast). */
  private def quoteSqlLiteral(c: Column): Column =
    when(c.isNull, lit("NULL")).otherwise(
      concat(lit("'"),
        regexp_replace(regexp_replace(c.cast("string"), "\\\\", "\\\\\\\\"), "'", "''"),
        lit("'")))
}
