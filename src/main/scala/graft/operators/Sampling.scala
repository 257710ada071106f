package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus partitioning for training pipelines:
  * train/val/test splits, per-source quotas, and context-window
  * sequence packing. Everything is a pure function of stable ids —
  * reproducible across runs, engines, and cluster sizes (no RNG
  * state), which is what a 100 TB pipeline needs to resume or re-run
  * any shard independently.
  */
object Sampling {

  private val SplitBuckets = 10000L

  /** Stable per-id bucket in [0, 10000): md5-derived (engine-portable,
    * like Routing.stableHash). */
  def splitBucket(id: Column): Column =
    pmod(graft.functions.HashExpressions.md5Prefix64(id.cast("string"), 15),
      lit(SplitBuckets))

  /** Hash-split into named fractions (e.g. train 0.9 / val 0.05 /
    * test 0.05): assignment is a pure expression over the id — no
    * shuffle, no sampling state, stable under corpus growth (a doc
    * never migrates between splits when OTHER docs are added). */
  def split(docs: DataFrame, fractions: Seq[(String, Double)],
            idCol: String = "doc_id"): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got $fractions")
    val bucket = splitBucket(col(idCol))
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val assignment = fractions.zip(cum).init.foldRight(lit(fractions.last._1)) {
      case (((name, _), hi), acc) =>
        when(bucket < math.round(hi * SplitBuckets), name).otherwise(acc)
    }
    docs.withColumn("split", assignment)
  }

  /** Per-source quota: keep at most `maxPerSource` docs per source in
    * a deterministic preference order (the domain-mixing cap every
    * corpus recipe applies). One shuffle on source; the rank column
    * survives so downstream can audit what was cut. */
  def sourceQuota(docs: DataFrame, maxPerSource: Long,
                  orderBy: Seq[Column] = Seq(col("doc_id"))): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(orderBy: _*)
    docs
      .withColumn("quota_rank", row_number().over(w).cast("long"))
      .withColumn("kept", col("quota_rank") <= maxPerSource)
  }

  /** Stratified (per-source) hash sampling: each source keeps its own
    * fraction (the up/down-sampling knob of every corpus mixing
    * recipe), decided by a pure hash of (source, id) — no RNG state,
    * no shuffle, and a doc's fate never changes as other docs arrive.
    * Hashing source INTO the bucket decorrelates the strata: the same
    * doc id draws an independent bucket in each source. Rows keep a
    * `sampled` flag (+ audit bucket) rather than being filtered, so
    * downstream can count what was cut. */
  def stratifiedSample(docs: DataFrame, fractions: Map[String, Double],
                       default: Double, idCol: String = "doc_id"): DataFrame = {
    val bucket = pmod(graft.functions.HashExpressions.md5Prefix64(
      concat(col("source"), lit(":"), col(idCol).cast("string")), 15),
      lit(SplitBuckets))
    val fracCol = fractions.foldLeft(lit(default)) {
      case (acc, (src, f)) => when(col("source") === src, lit(f)).otherwise(acc)
    }
    docs
      .withColumn("sample_bucket", bucket)
      .withColumn("sampled",
        col("sample_bucket") < (fracCol * SplitBuckets).cast("long"))
  }

  /** Temperature-based mixture sampling (the multilingual-LM source
    * rebalancing rule: weight each source ∝ n^α, α<1 upsampling the
    * tail): per-source keep fraction
    * f_s = min(1, (n_s^α / Σ n^α) · targetFrac·N / n_s), decided
    * per-doc by the same pure (source,id) hash as
    * [[stratifiedSample]]. The source-size table is group-count-sized
    * (broadcast); pow weights round to exact micro units BEFORE the
    * cross-source sum, so fractions are bit-reproducible under any
    * partitioning and engine. */
  def temperatureMix(docs: DataFrame, alpha: Double, targetFrac: Double,
                     idCol: String = "doc_id"): DataFrame = {
    val sizes = docs.groupBy(col("source")).agg(count(lit(1)).as("__n"))
      .withColumn("__pwm",
        round(pow(col("__n").cast("double"), lit(alpha)) * lit(1e6)).cast("long"))
    val tot = sizes.agg(sum(col("__pwm")).as("__sumpw"), sum(col("__n")).as("__total"))
    val frac = sizes.crossJoin(broadcast(tot))
      .withColumn("mix_frac", least(lit(1.0),
        (col("__pwm").cast("double") / col("__sumpw").cast("double"))
          * (lit(targetFrac) * col("__total").cast("double"))
          / col("__n").cast("double")))
      .select(col("source"), col("mix_frac"))
    val bucket = pmod(graft.functions.HashExpressions.md5Prefix64(
      concat(col("source"), lit(":"), col(idCol).cast("string")), 15),
      lit(SplitBuckets))
    docs.join(broadcast(frac), "source")
      .withColumn("sample_bucket", bucket)
      .withColumn("sampled",
        col("sample_bucket") < floor(col("mix_frac") * SplitBuckets).cast("long"))
  }

  /** DSIR-style importance scoring (Xie et al. 2023,
    * arXiv:2302.03169): rank raw documents by how target-like they
    * look under HASHED unigram language models — two dim-bucket
    * distributions (target corpus, raw corpus) with add-one
    * smoothing, each document scored by the mean log-ratio
    * log p_target(b) − log p_raw(b) over its token buckets. Selection
    * is then a pure threshold filter on `avg_logw` (scalable — no
    * global rank needed to pick "more target-like than x").
    *
    * Scale shape: both LM tables are dim-sized (constant, ≪ vocab ≪
    * corpus) so the score join broadcasts by size under AQE; bucket
    * counting is one map-side-combined agg per corpus; per-token
    * log-ratios round to exact micro units BEFORE the per-doc sum, so
    * scores are bit-reproducible under any partitioning. */
  def dsirScores(raw: DataFrame, target: DataFrame, dim: Int): DataFrame = {
    def bucketed(d: DataFrame) = d.select(col("doc_id"),
      explode(org.apache.spark.sql.functions.split(col("text"), " ")).as("tok"))
      .select(col("doc_id"),
        pmod(graft.functions.HashExpressions.md5Prefix64(col("tok"), 15),
          lit(dim.toLong)).as("b"))
    val tCnt = bucketed(target).groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val rCnt = bucketed(raw).groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tTot = tCnt.agg(sum(col("ct")).as("t_total")) // one row
    val rTot = rCnt.agg(sum(col("cr")).as("r_total"))
    // raw-side buckets define the domain (every scored token hits one
    // by construction); target counts left-join on, absent → 0 and
    // add-one smoothing keeps the ratio finite
    val ratio = rCnt
      .join(tCnt, Seq("b"), "left_outer")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("b"),
        round((log((coalesce(col("ct"), lit(0L)) + 1L).cast("double") /
            (col("t_total") + dim).cast("double")) -
          log((col("cr") + 1L).cast("double") /
            (col("r_total") + dim).cast("double"))) * lit(1e6))
          .cast("long").as("logr_micro"))
    bucketed(raw).join(ratio, "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("logr_micro")).as("sum_logw_micro"))
      .withColumn("avg_logw",
        col("sum_logw_micro").cast("double") / col("n_tokens") / lit(1e6))
  }

  /** Context-window sequence packing: assign docs to packs of ≈
    * `windowTokens` tokens, greedy in deterministic (source, doc_id)
    * order — the running-sum formulation of [[graft.functions.
    * LargeMessage.messageBatches]] (soft cap: a pack may overflow by
    * at most one doc, identical in any engine, unlike a stateful
    * packer). One window shuffle per source. */
  /** Deterministic EPOCH SHUFFLE — the training-order permutation,
    * distributed-loader style: example order for epoch `e` derives
    * from `md5(e:doc_id)`; loader shard `w` of `nShards` owns the
    * rows with `key % nShards = w` and reads them in key order. Pure
    * expressions — no RNG state, a different permutation every epoch,
    * bit-identical on re-run/resume, and any shard can compute its
    * own slice without seeing the others. One exchange (the per-shard
    * rank window); per-shard state ≈ n/nShards, so parallelism scales
    * with the loader fleet, never a global single-task sort. */
  def epochShuffle(docs: DataFrame, epoch: Int, nShards: Int,
                   idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val key = graft.functions.HashExpressions.md5Prefix64(
      concat(lit(epoch.toString), lit(":"), col(idCol).cast("string")), 15)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col(idCol))
    docs.select(col(idCol), key.as("shuffle_key"))
      .withColumn("shard", pmod(col("shuffle_key"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  def packSequences(docs: DataFrame, windowTokens: Long): DataFrame = {
    // (object-local `split` shadows functions.split — qualify)
    val nTok = size(org.apache.spark.sql.functions.split(col("text"), " ")).cast("long")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("pack_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / windowTokens))
      .withColumn("pack_offset",
        (sum(col("n_tokens")).over(w) - col("n_tokens")) -
          col("pack_id") * windowTokens)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("pack_id"), col("pack_offset"))
  }

  /** Deterministic fixed-k sample per group — eval-set construction
    * ("25 docs from every source, same ones every run"). Rank inside
    * each group by a pure md5 hash of (source, id): no RNG state, and
    * the chosen set only changes where the corpus itself changed.
    * One window shuffle on the group key; group sizes bound the sort.
    * Complements [[stratifiedSample]] (fraction-based, shuffle-free)
    * when the need is an exact per-group count. */
  def groupSample(docs: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(md5(concat(col("source"), lit(":"), col("doc_id"))).asc,
        col("doc_id").asc)
    docs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("source"), col("rank"))
  }
}
