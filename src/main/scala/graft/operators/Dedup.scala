package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and blocked word-set Jaccard.
  *
  * Scale design: exact and MinHash are the 100 TB paths — both are a
  * constant number of hash/agg passes (shuffle on doc hash / band
  * bucket only). Pairwise Jaccard is quadratic per block and is meant
  * for candidate *verification* after LSH blocking, not full-corpus
  * sweeps. All hashing is md5-derived so results are engine- and
  * language-portable (and oracle-checkable).
  */
object Dedup {

  /** 28-bit stable token hash (fits 16 bands of 31-bit arithmetic
    * without long overflow in any engine) — native md5-prefix kernel,
    * value-identical to `conv(substring(md5(t),1,7),16,10)`. */
  private def tokenHash(t: Column): Column =
    graft.functions.HashExpressions.md5Prefix64(t, 7)

  val MinhashPrime: Long = 2147483647L // 2^31 - 1
  val NumHashes = 16
  val NumBands = 4

  /** Deterministic per-hash-function coefficients (embedded as
    * literals in both the Spark plan and the generated oracle SQL). */
  val hashA: IndexedSeq[Long] =
    (0 until NumHashes).map(i => ((2654435761L * (i + 1)) % MinhashPrime) | 1L)
  val hashB: IndexedSeq[Long] =
    (0 until NumHashes).map(i => (40503L * (i + 7)) % MinhashPrime)

  /** Exact dedup: group identical content by md5, keep the smallest
    * id as keeper. One shuffle on the content hash. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_md5"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Incremental exact dedup: drop new documents whose content
    * already exists in a HISTORICAL corpus — the continuous-ingest
    * scenario (each crawl dedupes against everything kept so far).
    * One hash anti-join on content md5; the corpus side is only its
    * md5 column (in production a pre-computed hash table — scan-less),
    * and AQE picks broadcast vs shuffle by its size. Also dedupes the
    * new batch internally (first occurrence wins), so output is
    * corpus-extendable. */
  def incrementalExact(newDocs: DataFrame, corpus: DataFrame): DataFrame = {
    val corpusHashes = corpus.select(md5(col("text")).as("__seen")).distinct()
    newDocs
      .withColumn("content_md5", md5(col("text")))
      // shuffle-hash pinned: the seen-hash set is CORPUS-sized (an
      // aggregate with unreliable static stats) — it must never be a
      // broadcast build; hash-partitioned anti-join works at any scale
      .join(corpusHashes.hint("shuffle_hash"),
        col("content_md5") === col("__seen"), "left_anti")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("content_md5")).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** [[incrementalExact]] with a Bloom prefilter — the 100 TB shape
    * for continuous-ingest dedup. The plain anti-join shuffles the
    * whole corpus hash set every increment; here the corpus folds
    * once into a Bloom filter (one map-side-combined aggregate, the
    * filter binary is control-plane-sized — ~1.2 GB per 10⁹ docs at
    * 1% fpp), the new batch probes it per-row inside the scan, and
    * ONLY Bloom positives (≈ true duplicates + fpp·batch) enter the
    * exact anti-join. Results are EXACT, not approximate: Bloom
    * negatives are guaranteed-fresh (no false negatives), positives
    * are re-checked exactly — the filter is a pruner, never an
    * oracle. In production the filter is built once and reused across
    * increments; `expectedItems <= 0` sizes it from a corpus count.
    *
    * Spark-native: builds with Catalyst's `BloomFilterAggregate` and
    * probes with `BloomFilterMightContain` on a literal filter — the
    * same machinery AQE runtime filters use, fully codegen-path. */
  def incrementalExactBloom(newDocs: DataFrame, corpus: DataFrame,
                            expectedItems: Long = -1L,
                            fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    val key = xxhash64(md5(col("text")))
    val items = if (expectedItems > 0) expectedItems
                else math.max(1L, corpus.count())
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(items, fpp)
    val bf = column(BloomFilterAggregate(expression(key),
      Literal(items), Literal(numBits), 0, 0).toAggregateExpression())
    val bytes = corpus.select(bf.as("bf")).head().getAs[Array[Byte]]("bf")
    val maybe =
      if (bytes == null) lit(false) // empty corpus: everything fresh
      else column(BloomFilterMightContain(
        Literal(bytes, BinaryType), expression(key)))
    val flagged = newDocs
      .withColumn("content_md5", md5(col("text")))
      .withColumn("__maybe", maybe)
    val corpusHashes = corpus.select(md5(col("text")).as("__seen")).distinct()
    val checked = flagged.filter(col("__maybe"))
      // corpus-sized hash set: never a broadcast build (see
      // incrementalExact)
      .join(corpusHashes.hint("shuffle_hash"),
        col("content_md5") === col("__seen"), "left_anti")
    flagged.filter(!col("__maybe"))
      .unionByName(checked)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("content_md5")).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn", "__maybe")
  }

  /** Default per-task bucket cap for the bucket-collect pair
    * generators: no aggregation task materializes more than ~2·cap
    * elements of one bucket. */
  val DefaultBucketCap = 4096

  /** SALT-TILING: bound the memory of bucket-collect pair generation
    * without a fallback join and without dropping pairs.
    *
    * A bucket of n elements splits into q = ceil(n/cap) sub-buckets by
    * a salt of the element id; every unordered pair {x, y} lands in
    * exactly ONE pair-task (min(sx,sy), max(sx,sy)), so each element
    * replicates to its q tasks and each task collects ≤ ~2·cap
    * elements — the triangle-tiling answer to skewed self-pairing.
    * When every bucket fits the cap, q = 1 and the plan degenerates to
    * the plain single-bucket collect (zero extra replication); a
    * stop-word-grade bucket pays q× input replication instead of
    * collecting the whole posting list into one task's RAM (the
    * scale-killer the plain collect had). As a bonus the window count
    * prunes singleton buckets BEFORE collection.
    *
    * Emits per input row: the bucket columns, `__s` (element salt),
    * and one row per pair-task (`__ti`, `__tj`). Group by
    * (bucket..., __ti, __tj), collect (element, __s), and emit pairs
    * with `a.__s = __ti AND b.__s = __tj AND (ti <> tj OR a < b)`,
    * orienting by least/greatest — each unordered pair appears exactly
    * once. */
  private[graft] def saltTile(df: DataFrame, bucketCols: Seq[String],
                                  elem: Column, cap: Int): DataFrame = {
    // census via a window count on the SAME shuffle the collect needs
    // (no second pass over the input — at 100 TB the input subtree may
    // itself contain joins/aggs, so a broadcast-census re-scan would
    // double real work; measured equal at sf0.1). Singleton buckets
    // prune before collection. Tiles come from a plain
    // explode(sequence) + least/greatest — no lambda/struct-array
    // codegen; q = 1 explodes a single-element sequence. Salts are
    // internal plumbing (never wire-visible), so the cheap engine
    // hash is fine.
    val w = Window.partitionBy(bucketCols.map(col): _*)
    df.withColumn("__bn", count(lit(1)).over(w))
      .filter(col("__bn") > 1)
      .withColumn("__q",
        ceil(col("__bn").cast("double") / lit(cap.toDouble)).cast("int"))
      .withColumn("__s",
        when(col("__q") === 1, lit(0))
          .otherwise(pmod(hash(elem), col("__q")).cast("int")))
      .withColumn("__k", explode(sequence(lit(0), col("__q") - 1)))
      .withColumn("__ti", least(col("__s"), col("__k")))
      .withColumn("__tj", greatest(col("__s"), col("__k")))
      .drop("__k", "__bn", "__q")
  }

  /** Spread collected bucket rows round-robin across every core
    * before their quadratic pair explode. Bucket rows are few
    * (vocab-sized) but each carries n² generate work; left on the
    * collect shuffle's hash partitioning, a handful of tasks own all
    * the heavy buckets and the rest of the cluster idles (measured
    * 2.9 s → 1.4 s on the sf0.1 counting agg). The shuffle itself
    * moves only the collected lists — bucket-count rows, the smallest
    * relation in the plan — and the explicit partition count keeps
    * AQE from coalescing the exchange back into the skew. */
  private def spreadBuckets(buckets: DataFrame): DataFrame =
    buckets.repartition(buckets.sparkSession.sessionState.conf.numShufflePartitions)

  /** The pair-emission predicate for a salt-tiled bucket (see
    * [[saltTile]]): a carries the tile's low salt, b the high salt,
    * same-tile pairs order by the element to avoid double emission. */
  private[operators] def tilePair(aSalt: Column, bSalt: Column,
                                  aElem: Column, bElem: Column): Column =
    aSalt === col("__ti") && bSalt === col("__tj") &&
      (col("__ti") =!= col("__tj") || aElem < bElem)

  /** MinHash signatures: distinct tokens per doc → 16 min-hash lanes →
    * 4 LSH band keys (md5 of each 4-lane slice). Two shuffles total
    * (token distinct, per-doc agg) regardless of corpus size. */
  def minhashSignatures(docs0: DataFrame): DataFrame = {
    // deliberately NOT re-spread: the first post-scan step here is a
    // token explode feeding an aggregation/join exchange, so the plan
    // re-parallelizes one stage later anyway — measured at c32/sf0.1,
    // an up-front round-robin exchange of the full document text costs
    // more than the single-task tokenize it parallelizes (round 17
    // A/B: ngram 3.20→1.82, minhash_pairs 1.17→0.94, fuzzy 2.88→2.49,
    // tfidf 1.28→0.89, lm_bigram 1.35→0.94, bm25 1.30→1.22)
    val docs = docs0
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
    val lanes = (0 until NumHashes).map { i =>
      min(pmod(col("h") * hashA(i) + hashB(i), lit(MinhashPrime))).as(s"m$i")
    }
    val sig = toks.groupBy(col("doc_id")).agg(lanes.head, lanes.tail: _*)
    (0 until NumBands).foldLeft(sig) { (df, b) =>
      val laneCols = (b * 4 until b * 4 + 4).map(i => col(s"m$i").cast("string"))
      df.withColumn(s"band$b", md5(concat_ws(",", laneCols: _*)))
    }
  }

  /** LSH candidate pairs: docs sharing any band key.
    *
    * Runs at SIGNATURE granularity: docs collapse to their unique
    * signature first (on near-duplicate-heavy corpora, orders of
    * magnitude fewer), the band self-join runs over unique signatures,
    * and doc pairs expand back at the end — so join and dedup cost
    * scale with distinct-signature count while the (irreducible)
    * output expansion stays a generate-only stage. Every doc belongs
    * to exactly one signature group, so no global distinct is needed:
    * intra-group pairs and sig-pair expansions are disjoint by
    * construction. */
  def minhashPairs(signatures: DataFrame,
                   maxBucket: Int = DefaultBucketCap): DataFrame = {
    val sigKey = md5(concat_ws(",",
      (0 until NumHashes).map(i => col(s"m$i").cast("string")): _*))
    val groups = signatures
      .groupBy(sigKey.as("sig"),
        col("band0"), col("band1"), col("band2"), col("band3"))
      .agg(collect_list(col("doc_id")).as("members"))

    // all pairs within one signature group (identical signatures
    // trivially share every band). A `members` list is bounded by the
    // byte-identical duplicate-group size; a corpus degenerate enough
    // to overflow it belongs to [[exact]] first.
    val intra = groups.select(col("members"))
      .withColumn("doc_a", explode(col("members")))
      .withColumn("doc_b", explode(col("members")))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))

    // signature pairs sharing >= 1 band: BUCKET-COLLECT instead of a
    // band self-join — one groupBy gathers each band bucket's
    // signatures and pairs explode inside the bucket. A sig pair
    // sharing k bands would surface k times, so each pair is emitted
    // ONLY from its first shared band (a pure expression over the
    // carried band arrays) — no global sig-pair dedup shuffle at all,
    // which was the extra pass the r2 collapse paid. Band buckets are
    // memory-bounded by [[saltTile]]: a degenerate shared-band corpus
    // splits into ≤ ~2·maxBucket-signature tasks.
    val bandArr = array((0 until NumBands).map(b => col(s"band$b")): _*)
    val bands = groups.select(col("sig"), col("members"), bandArr.as("bands"),
      posexplode(bandArr).as(Seq("band_idx", "band")))
    val buckets = saltTile(bands, Seq("band_idx", "band"), col("sig"), maxBucket)
      .groupBy(col("band_idx"), col("band"), col("__ti"), col("__tj"))
      .agg(collect_list(struct(
        col("sig"), col("__s"), col("members"), col("bands"))).as("sigs"))
      .filter(size(col("sigs")) > 1)
    val firstSharedBand = (0 until NumBands).reverse.foldLeft(lit(-1)) {
      (acc, i) => when(col("a.bands")(i) === col("b.bands")(i), lit(i)).otherwise(acc)
    }
    val cross = spreadBuckets(buckets)
      .withColumn("a", explode(col("sigs")))
      .withColumn("b", explode(col("sigs")))
      .filter(tilePair(col("a.__s"), col("b.__s"), col("a.sig"), col("b.sig")) &&
        firstSharedBand === col("band_idx"))
      .withColumn("x", explode(col("a.members")))
      .withColumn("y", explode(col("b.members")))
      .select(least(col("x"), col("y")).as("doc_a"),
        greatest(col("x"), col("y")).as("doc_b"))

    intra.unionByName(cross)
  }

  /** 16-bit SimHash: per bit j, the sign of Σ over tokens of ±1
    * driven by hex digit j of the token's md5. Single explode +
    * per-doc agg. */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("__md5", md5(col("tok")))
    val bitSums = (0 until 16).map { j =>
      sum(when(substring(col("__md5"), j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1L)
        .otherwise(-1L)).as(s"s$j")
    }
    toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash",
        (0 until 16).map(j => when(col(s"s$j") > 0, 1L << j).otherwise(0L))
          .reduce(_ + _))
      .select(col("doc_id"), col("simhash"))
  }

  /** Word-set Jaccard within blocks (`blockCol` — e.g. source, or an
    * LSH band for the scale path): token-level self-join, intersection
    * count, |A∪B| = |A|+|B|-|A∩B|.
    *
    * The token-join formulation is the scale path: on real corpora
    * (large vocab) the join output is sparse and fully shuffle/spill
    * managed, whereas a doc-pair `array_intersect` join pays a
    * quadratic per-pair compute regardless of similarity. (Measured
    * both at sf0.1: token join wins even on this degenerate small
    * vocabulary.) */
  def jaccardPairs(docs0: DataFrame, blockCol: String, threshold: Double,
                   maxBucket: Int = DefaultBucketCap): DataFrame = {
    // deliberately NOT re-spread: the first post-scan step here is a
    // token explode feeding an aggregation/join exchange, so the plan
    // re-parallelizes one stage later anyway — measured at c32/sf0.1,
    // an up-front round-robin exchange of the full document text costs
    // more than the single-task tokenize it parallelizes (round 17
    // A/B: ngram 3.20→1.82, minhash_pairs 1.17→0.94, fuzzy 2.88→2.49,
    // tfidf 1.28→0.89, lm_bigram 1.35→0.94, bm25 1.30→1.22)
    val docs = docs0
    // Candidate generation is BUCKET-COLLECT, not a token self-join:
    // one shuffle gathers each (block, token) posting list, pairs
    // explode in place, and the pair count aggregates — two shuffles
    // instead of the join's three (measured ~30% faster at sf0.1).
    // Posting lists are memory-bounded by [[saltTile]]: a stop-word-
    // grade token splits into ≤ ~2·maxBucket-element pair-tasks
    // instead of collecting a corpus slice into one task's RAM.
    // Sizes join back from the tiny per-doc table afterwards —
    // carrying them through the wide pair stream measured ~10x slower.
    val toks = docs.select(col("doc_id"), col(blockCol).as("__blk"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
    val sizes = docs.select(col("doc_id"),
      size(array_distinct(split(col("text"), " "))).cast("long").as("nd"))
    val inter = spreadBuckets(
      saltTile(toks, Seq("__blk", "tok"), col("doc_id"), maxBucket)
        .groupBy(col("__blk"), col("tok"), col("__ti"), col("__tj"))
        .agg(collect_list(struct(col("doc_id"), col("__s"))).as("__ds"))
        .filter(size(col("__ds")) > 1))
      .withColumn("a", explode(col("__ds")))
      .withColumn("b", explode(col("__ds")))
      .filter(tilePair(col("a.__s"), col("b.__s"), col("a.doc_id"), col("b.doc_id")))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      // shuffle-hash pinned: the pair stream is OUTPUT-sized (shuffling
      // it is linear in true near-dup density) and the per-doc sizes
      // table is corpus-sized — NEITHER side may broadcast. Leaving
      // the choice to static estimates broadcast the misestimated
      // aggregated pair frame at the sf1 soak (a ~2 GB build → OOM);
      // the hint keeps the build side a per-partition slice of sizes
      // at any scale.
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("nd", "nd_a")
        .hint("shuffle_hash"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("nd", "nd_b")
        .hint("shuffle_hash"), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("nd_a") + col("nd_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("nd_a"), col("nd_b"), col("jaccard"))
  }

  /** Containment pairs — the asymmetric complement of
    * [[jaccardPairs]]: |A∩B| / min(|A|,|B|) ≥ threshold catches a
    * short document quoted/subsumed inside a long one, which Jaccard
    * misses by construction (the union is dominated by the long
    * side). Same bucket-collect plan; only the final formula and its
    * direction flag differ. Emits which side is the contained one so
    * the curation policy can keep the superset document.
    */
  def containmentPairs(docs0: DataFrame, blockCol: String, n: Int,
                       threshold: Double,
                       maxBucket: Int = DefaultBucketCap): DataFrame = {
    // input-layout skew guard: re-spread an under-parallel scan before
    // the per-row kernel below (no-op on naturally parallel layouts;
    // see Tables.spreadSmallScan)
    val docs = graft.Tables.spreadSmallScan(docs0)
    // n-gram shingles, distinct per doc: token-set containment is
    // degenerate on low-vocab corpora (everything contains the
    // vocabulary); shingles carry word order, so containment means
    // shared phrasing
    val w = split(col("text"), " ")
    val shingles = transform(sequence(lit(0), size(w) - n),
      i => array_join(slice(w, i + 1, lit(n)), " "))
    val sh = docs.filter(size(w) >= n)
      .select(col("doc_id"), col(blockCol).as("__blk"),
        explode(array_distinct(shingles)).as("tok"))
    val sizes = docs.filter(size(w) >= n)
      .select(col("doc_id"),
        size(array_distinct(shingles)).cast("long").as("nd"))
    val inter = spreadBuckets(
      saltTile(sh, Seq("__blk", "tok"), col("doc_id"), maxBucket)
        .groupBy(col("__blk"), col("tok"), col("__ti"), col("__tj"))
        .agg(collect_list(struct(col("doc_id"), col("__s"))).as("__ds"))
        .filter(size(col("__ds")) > 1))
      .withColumn("a", explode(col("__ds")))
      .withColumn("b", explode(col("__ds")))
      .filter(tilePair(col("a.__s"), col("b.__s"), col("a.doc_id"), col("b.doc_id")))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      // shuffle-hash pinned: the pair stream is OUTPUT-sized (shuffling
      // it is linear in true near-dup density) and the per-doc sizes
      // table is corpus-sized — NEITHER side may broadcast. Leaving
      // the choice to static estimates broadcast the misestimated
      // aggregated pair frame at the sf1 soak (a ~2 GB build → OOM);
      // the hint keeps the build side a per-partition slice of sizes
      // at any scale.
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("nd", "nd_a")
        .hint("shuffle_hash"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("nd", "nd_b")
        .hint("shuffle_hash"), "doc_b")
      .withColumn("containment",
        col("n_inter").cast("double") /
          least(col("nd_a"), col("nd_b")).cast("double"))
      .filter(col("containment") >= threshold)
      .withColumn("contained_doc",
        when(col("nd_a") <= col("nd_b"), col("doc_a")).otherwise(col("doc_b")))
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        col("nd_a"), col("nd_b"), col("containment"), col("contained_doc"))
  }

  /** Winnowing-based duplicate candidates — the MOSS report: pairs of
    * documents sharing at least `minShared` winnowed fingerprints
    * ([[graft.operators.TextOps.winnow]]). Same bucket-collect +
    * [[saltTile]] shape as [[jaccardPairs]], with the posting key
    * being the selected fingerprint — selection has already thinned
    * the posting stream ~2/(w+1)× before the one collect shuffle, so
    * this is the cheapest of the pair generators at equal gram size.
    */
  def winnowPairs(fps: DataFrame, minShared: Long,
                  maxBucket: Int = DefaultBucketCap): DataFrame = {
    // a fingerprint selected at several positions still counts once
    val d = fps.select(col("doc_id"), col("fp")).distinct()
    spreadBuckets(
      saltTile(d, Seq("fp"), col("doc_id"), maxBucket)
        .groupBy(col("fp"), col("__ti"), col("__tj"))
        .agg(collect_list(struct(col("doc_id"), col("__s"))).as("__ds"))
        .filter(size(col("__ds")) > 1))
      .withColumn("a", explode(col("__ds")))
      .withColumn("b", explode(col("__ds")))
      .filter(tilePair(col("a.__s"), col("b.__s"), col("a.doc_id"), col("b.doc_id")))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Near-dup cluster assignment: connected components over the
    * candidate-pair graph by iterative min-label propagation — after
    * pair generation (minhash/LSH/Jaccard), every document needs a
    * canonical cluster id so the pipeline can keep one exemplar per
    * cluster. Each round is one join + one agg shuffle; labels are
    * monotonically non-increasing, so the total-label sum detects the
    * fixpoint. Near-dup graphs have tiny diameters (duplicates
    * cluster around templates), so rounds ≈ 3-5 even at corpus scale;
    * lineage is cut with localCheckpoint per round (the standard
    * iterative-DataFrame pattern).
    *
    * Returns (doc_id, cluster) where cluster = min doc_id reachable.
    * Singletons (docs absent from `pairs`) are not emitted — join
    * back against the corpus with a coalesce-to-self for them. */
  def clusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // LAZY checkpoints throughout: every round already runs one
    // driver action (the convergence sum), and a lazy localCheckpoint
    // materializes its blocks inside that same action — eager
    // checkpoints ran a SEPARATE job per frame per round (2× the job
    // count for the same data work; job fixed costs dominate this
    // control-plane-sized loop).
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .unionByName(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .distinct()
      .localCheckpoint(false)
    // seed with min(self, direct neighbors) — one agg over the edge
    // list; clique-shaped near-dup components (the common case) are
    // already at their fixpoint, so the loop only confirms
    var labels = edges.groupBy(col("a").as("doc_id"))
      .agg(min(col("b")).as("__nmin"))
      .select(col("doc_id"),
        least(col("doc_id"), col("__nmin")).as("cluster"))
      .localCheckpoint(false)
    // this one action materializes edges AND the seed labels
    var prevSum = labels.agg(sum(col("cluster"))).head().getLong(0)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // every frame here is data-sized (edges = pair-output, labels =
      // node count): shuffle-hash pinned so no misestimate can pick a
      // broadcast build at scale
      val neighborMin = edges.join(labels.hint("shuffle_hash"),
          edges("b") === labels("doc_id"))
        .groupBy(edges("a").as("nb_doc"))
        .agg(min(col("cluster")).as("nmin"))
      val propagated = labels.join(neighborMin.hint("shuffle_hash"),
          labels("doc_id") === col("nb_doc"), "left")
        .select(col("doc_id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
      // POINTER JUMP (path doubling): also adopt the label of my
      // label — a node-count-sized self-join that compresses label
      // chains geometrically, so rounds scale with log(diameter)
      // instead of diameter (the classic PRAM shortcut; halves the
      // measured rounds on chain-shaped near-dup graphs)
      labels = propagated.as("x")
        .join(propagated.select(col("doc_id").as("p_doc"),
          col("cluster").as("p_cluster")).hint("shuffle_hash"),
          col("x.cluster") === col("p_doc"), "left")
        .select(col("x.doc_id").as("doc_id"),
          least(col("x.cluster"), coalesce(col("p_cluster"), col("x.cluster"))).as("cluster"))
        .localCheckpoint(false)
      // materializes this round's labels inside the convergence action
      val s = labels.agg(sum(col("cluster"))).head().getLong(0)
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    require(converged, s"label propagation did not converge in $maxIter rounds")
    labels
  }

  /** END-TO-END fuzzy dedup: candidate pairs → connected components →
    * keep the exemplar (min doc id) of every near-dup cluster — the
    * complete "give me a clean corpus" workflow a training pipeline
    * runs, composed from [[jaccardPairs]] + [[clusters]] in one call.
    * Returns every input doc with its cluster id and a 0/1 `kept`
    * flag (singletons keep themselves); filter `kept = 1` for the
    * deduplicated corpus. Swap the candidate generator by passing
    * precomputed pairs to [[fuzzyDedupKeepFrom]] (e.g.
    * [[minhashPairs]] for the approximate scale path — same
    * downstream plan). */
  def fuzzyDedupKeep(docs: DataFrame, blockCol: String,
                     threshold: Double): DataFrame =
    fuzzyDedupKeepFrom(docs, blockCol,
      jaccardPairs(docs, blockCol, threshold))

  /** [[fuzzyDedupKeep]] over an externally supplied candidate-pair
    * frame (doc_a, doc_b). One extra join beyond clustering — the
    * corpus side stays (doc_id, block) columns only. */
  def fuzzyDedupKeepFrom(docs: DataFrame, blockCol: String,
                         pairs: DataFrame): DataFrame = {
    val labels = clusters(pairs)
    docs.select(col("doc_id"), col(blockCol))
      .join(labels.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"), col(blockCol),
        coalesce(col("cluster"), col("doc_id")).as("cluster"),
        (coalesce(col("cluster"), col("doc_id")) === col("doc_id"))
          .cast("long").as("kept"))
  }

  /** Persisted MinHash LSH index — the continuous-crawl companion to
    * [[minhashPairs]]: the historical corpus signatures band-explode
    * ONCE into a parquet table (4 rows per doc, partitioned by band
    * index), and each new crawl probes it with a band-for-band
    * equi-join instead of re-pairing the corpus against itself. Index
    * build is one pass over the corpus; probe cost scales with the
    * NEW batch and its collision density, never with corpus². */
  def buildMinhashIndex(corpus: DataFrame, dir: String): Unit = {
    val bandArr = array((0 until NumBands).map(b => col(s"band$b")): _*)
    minhashSignatures(corpus)
      .select(col("doc_id"), bandArr.as("bands"),
        posexplode(bandArr).as(Seq("band_idx", "band")))
      .write.mode("overwrite").partitionBy("band_idx").parquet(dir)
  }

  /** Candidate (new, historical) near-dup pairs: new docs sharing ≥1
    * LSH band with an indexed doc. Each pair is emitted exactly once
    * — from its FIRST shared band, the same carried-band-array trick
    * as [[minhashPairs]] (no pair-dedup shuffle). */
  def probeMinhashIndex(newDocs: DataFrame, dir: String): DataFrame = {
    val spark = newDocs.sparkSession
    val idx = spark.read.parquet(dir).select(
      col("doc_id").as("doc_old"), col("band_idx").cast("int").as("band_idx"),
      col("band"), col("bands").as("old_bands"))
    val bandArr = array((0 until NumBands).map(b => col(s"band$b")): _*)
    val probe = minhashSignatures(newDocs)
      .select(col("doc_id").as("doc_new"), bandArr.as("new_bands"),
        posexplode(bandArr).as(Seq("band_idx", "band")))
    val firstShared = (0 until NumBands).reverse.foldLeft(lit(-1)) {
      (acc, i) =>
        when(col("new_bands")(i) === col("old_bands")(i), lit(i)).otherwise(acc)
    }
    // both sides are data-sized (index = corpus bands, probe = new
    // batch bands, explode-derived stats): hash-partition on the band,
    // never broadcast either
    probe.join(idx.hint("shuffle_hash"), Seq("band_idx", "band"))
      .filter(firstShared === col("band_idx"))
      .select(col("doc_new"), col("doc_old"),
        col("band_idx").cast("long").as("band_idx"))
  }

  /** Cross-batch EXACT dedup with bounded state — the streaming form
    * of [[exact]]: duplicates arriving within the watermark window
    * collapse to their first occurrence and the dedup state evicts at
    * the watermark (`dropDuplicatesWithinWatermark`), so memory is
    * delay-bounded — the eventstore-GC analog for streaming dedup. */
  def streamingExact(env: DataFrame, keyCols: Seq[String],
                     eventTimeCol: String, delay: String): DataFrame =
    env.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** The 16-lane minhash signature as ONE per-row expression (no
    * explode, no aggregation): lane i = min over distinct tokens of
    * (md5-hash · Aᵢ + Bᵢ) mod P — higher-order functions only, so it
    * composes into streaming plans without a stateful aggregation.
    * Bit-equal to the [[minhashSignatures]] lane columns. */
  def minhashSignatureExpr(text: Column): Column = {
    val hsExpr = transform(array_distinct(split(text, " ")), t => tokenHash(t))
    // evaluate the token-hash array ONCE via a single-element outer
    // transform (its lambda variable is a materialized value): the 16
    // lane transforms below reference the array in their tree, and an
    // inline subtree would re-tokenize+hash the row once per lane
    element_at(transform(array(hsExpr), hs =>
      concat_ws(",", (0 until NumHashes).map { i =>
        array_min(transform(hs, h => pmod(h * hashA(i) + hashB(i), lit(MinhashPrime))))
          .cast("string")
      }: _*)), 1)
  }

  /** Cross-batch NEAR-dup suppression: documents whose full minhash
    * signature collides within the watermark window collapse to the
    * first arrival. The signature is a pure row expression
    * ([[minhashSignatureExpr]]), so the plan has exactly ONE stateful
    * operator and its state evicts at the watermark. Full-signature
    * collision is the conservative end of the LSH family (all 16
    * lanes agree ⇒ very high Jaccard) — band-level recall stays a
    * batch backfill concern ([[minhashPairs]]). */
  def streamingNearDup(env: DataFrame, textCol: String,
                       eventTimeCol: String, delay: String): DataFrame =
    env.withColumn("__minhash_sig", minhashSignatureExpr(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(Seq("__minhash_sig"))

  /** Exact Jaccard pairs with PREFIX FILTERING — the AllPairs/PPJoin
    * candidate-generation rule: under any global total order of
    * tokens, two sets with J(A,B) ≥ t must share a token within their
    * first ⌊(1-t)·|X|⌋+1 tokens. Ordering tokens rarest-first makes
    * those prefix buckets the SMALLEST ones, so candidate pairs scale
    * with rare-token co-occurrence instead of all-token co-occurrence
    * — the property that survives a 100× corpus scale-up. Candidates
    * are then verified exactly (sorted-set intersection), so the
    * output is identical to [[jaccardPairs]].
    *
    * WHEN TO USE WHICH: on realistic corpora (large Zipfian vocab)
    * rare-first prefixes have tiny buckets and candidates ≈ true
    * pairs, so this path wins by orders of magnitude. On a degenerate
    * small-uniform vocabulary (the synthetic fixture) prefixes prune
    * nothing and the extra distinct+verify shuffles make the plain
    * counting join ~2× faster — measured at sf0.1; q_dedup_ngram
    * therefore binds to [[jaccardPairs]] while the equivalence spec
    * pins both paths to identical output.
    *
    * Shuffles: token-freq agg (vocab-sized, broadcast back), one
    * window per doc (token count × 1), prefix self-join, candidate
    * distinct, two joins against the per-doc set table (dict-sized;
    * AQE broadcasts when small). */
  def jaccardPairsPrefix(docs0: DataFrame, blockCol: String, threshold: Double,
                         maxBucket: Int = DefaultBucketCap): DataFrame = {
    // deliberately NOT re-spread: the first post-scan step here is a
    // token explode feeding an aggregation/join exchange, so the plan
    // re-parallelizes one stage later anyway — measured at c32/sf0.1,
    // an up-front round-robin exchange of the full document text costs
    // more than the single-task tokenize it parallelizes (round 17
    // A/B: ngram 3.20→1.82, minhash_pairs 1.17→0.94, fuzzy 2.88→2.49,
    // tfidf 1.28→0.89, lm_bigram 1.35→0.94, bm25 1.30→1.22)
    val docs = docs0
    val distinctToks = array_distinct(split(col("text"), " "))
    val toks = docs.select(col("doc_id"), col(blockCol).as("__blk"),
      explode(distinctToks).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("__f"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("__f"), col("tok"))
    val wSize = Window.partitionBy(col("doc_id"))
    // vocab-sized freq table: NO forced broadcast — AQE broadcasts
    // below the threshold and falls back to a shuffle join on `tok`
    // beyond it (Heaps' law: at 100 TB the distinct-token table is
    // tens of GB — a forced hint would OOM instead of degrading;
    // same rule as [[TextOps.lmScore]])
    val prefix = toks.join(freq, "tok")
      .withColumn("__pos", row_number().over(wDoc))
      .withColumn("__nd", count(lit(1)).over(wSize))
      .filter(col("__pos") <= floor(lit(1.0 - threshold) * col("__nd")) + 1)
      .select(col("doc_id"), col("__blk"), col("tok"))
    // rare-first prefixes bound buckets by construction on realistic
    // corpora; the salt-tiling keeps the degenerate ones bounded too
    val cands = spreadBuckets(
      saltTile(prefix, Seq("__blk", "tok"), col("doc_id"), maxBucket)
        .groupBy(col("__blk"), col("tok"), col("__ti"), col("__tj"))
        .agg(collect_list(struct(col("doc_id"), col("__s"))).as("__ds"))
        .filter(size(col("__ds")) > 1))
      .withColumn("a", explode(col("__ds")))
      .withColumn("b", explode(col("__ds")))
      .filter(tilePair(col("a.__s"), col("b.__s"), col("a.doc_id"), col("b.doc_id")))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    val sets = docs.select(col("doc_id"),
      array_sort(distinctToks).as("__set"),
      size(distinctToks).cast("long").as("nd"))
    cands
      // shuffle-hash pinned for the same reason as jaccardPairs: both
      // sides are data-sized, neither may broadcast
      .join(sets.select(col("doc_id").as("doc_a"),
        col("__set").as("__set_a"), col("nd").as("nd_a"))
        .hint("shuffle_hash"), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"),
        col("__set").as("__set_b"), col("nd").as("nd_b"))
        .hint("shuffle_hash"), "doc_b")
      .withColumn("n_inter",
        size(array_intersect(col("__set_a"), col("__set_b"))).cast("long"))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("nd_a") + col("nd_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("nd_a"), col("nd_b"), col("jaccard"))
  }

  /** Exact duplicate-SPAN detection (token-space substring dedup — the
    * suffix-array "ExactSubstr" operator of Lee et al., *Deduplicating
    * Training Data Makes Language Models Better*, re-expressed
    * relationally): every maximal run of ≥ `minSpan` consecutive
    * tokens shared verbatim between two documents, with its start
    * offset in each.
    *
    * Formulation: positional n-grams → shared-gram position pairs →
    * diagonal grouping. Two matches (pa, pb) and (pa+1, pb+1) lie on
    * the same diagonal d = pa − pb; a maximal shared substring is
    * exactly a maximal run of consecutive pa on one (doc_a, doc_b, d),
    * found with one lag/sum window — no suffix array needed, and every
    * stage is a plain shuffle Spark already knows how to spill.
    *
    * Scale: gram posting lists are the only skew point; [[saltTile]]
    * bounds them exactly as in [[jaccardPairs]] (a boilerplate-header
    * gram pays tile replication instead of collecting a corpus slice
    * into one task). The window+agg run under ONE shuffle on
    * (doc_a, doc_b, diag) — Catalyst reuses the window's hash
    * partitioning for the run aggregation (subset clustering). Runs
    * of n-gram positions over-cover by construction (a run of k grams
    * = k+n−1 shared tokens), so minSpan must be ≥ n. */
  def duplicateSpans(docs0: DataFrame, n: Int, minSpan: Int,
                     maxBucket: Int = DefaultBucketCap): DataFrame = {
    require(minSpan >= n, s"minSpan ($minSpan) must be >= n ($n)")
    // input-layout skew guard: re-spread an under-parallel scan before
    // the per-row kernel below (no-op on naturally parallel layouts;
    // see Tables.spreadSmallScan)
    val docs = graft.Tables.spreadSmallScan(docs0)
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("w")) - n),
          i => concat_ws(" ", slice(col("w"), i + 1, lit(n))))).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("g"))
    // one shuffle on the gram; tilePair keys on (doc_id, pos) so a
    // gram repeated inside one document still pairs across documents
    val matches = spreadBuckets(
      saltTile(grams, Seq("g"), struct(col("doc_id"), col("pos")), maxBucket)
        .groupBy(col("g"), col("__ti"), col("__tj"))
        .agg(collect_list(struct(col("doc_id"), col("pos"), col("__s"))).as("__gs"))
        .filter(size(col("__gs")) > 1))
      .withColumn("a", explode(col("__gs")))
      .withColumn("b", explode(col("__gs")))
      .filter(tilePair(col("a.__s"), col("b.__s"),
        struct(col("a.doc_id"), col("a.pos")), struct(col("b.doc_id"), col("b.pos"))) &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(
        when(col("a.doc_id") < col("b.doc_id"), col("a.doc_id")).otherwise(col("b.doc_id")).as("doc_a"),
        when(col("a.doc_id") < col("b.doc_id"), col("b.doc_id")).otherwise(col("a.doc_id")).as("doc_b"),
        when(col("a.doc_id") < col("b.doc_id"), col("a.pos")).otherwise(col("b.pos")).as("pa"),
        when(col("a.doc_id") < col("b.doc_id"), col("b.pos")).otherwise(col("a.pos")).as("pb"))
      .withColumn("diag", col("pa") - col("pb"))
    val wDiag = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pa"))
    matches
      .withColumn("__brk",
        when(lag(col("pa"), 1).over(wDiag) === col("pa") - 1, 0L).otherwise(1L))
      .withColumn("__run", sum(col("__brk")).over(wDiag))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("__run"))
      .agg(min(col("pa")).as("start_a"), min(col("pb")).as("start_b"),
        (max(col("pa")) - min(col("pa")) + n).as("span_tokens"))
      .filter(col("span_tokens") >= minSpan)
      .select(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"),
        col("span_tokens"))
  }

  /** Edit-distance VERIFICATION of near-dup candidate pairs — the
    * exact-confirm stage after any cheap generator (MinHash / Jaccard
    * / SimHash buckets over-generate by construction; shipping their
    * raw output deletes non-duplicates). Normalized Levenshtein over
    * length-capped text: ratio = distance·1e6 div max(len) in exact
    * integer micro units, confirmed when ≤ maxEditRatio.
    *
    * Scale shape: work is PAIR-sized, never corpus² — two
    * output-pair-sized joins pull the capped texts onto the
    * candidates, and the O(len²) distance kernel (Spark's codegen'd
    * levenshtein) runs on ≤ capLen chars. The cap is the production
    * stance: two near-identical megabyte documents are decided by
    * their first kilobyte, and an UNCAPPED distance would make one
    * skewed pair a straggler task.
    *
    * `perDocBudget` bounds the OTHER explosion axis: a degenerate
    * corpus (tiny shared vocabulary, boilerplate-heavy web text) makes
    * every in-block pair a candidate, and verifying all of them turns
    * the exact stage quadratic again (measured: 445k candidates for
    * 101 real dups at sf0.1 — 100 s of levenshtein). With a budget,
    * each left doc verifies only its `perDocBudget` STRONGEST
    * candidates (by `budgetOrder`, e.g. jaccard desc) — total verify
    * work is corpus-linear whatever the generator emits, and a doc's
    * dedup fate is decided by its best matches, which is where the
    * true duplicates sort. */
  def editVerifiedPairs(docs: DataFrame, pairs: DataFrame,
                        maxEditRatio: Double, capLen: Int = 512,
                        perDocBudget: Int = 0,
                        budgetOrder: Seq[Column] = Nil): DataFrame = {
    val capped = docs.select(col("doc_id"),
      substring(col("text"), 1, capLen).as("__t"))
    val budgeted =
      if (perDocBudget <= 0) pairs
      else {
        val w = Window.partitionBy(col("doc_a")).orderBy(budgetOrder: _*)
        pairs.withColumn("__r", row_number().over(w))
          .filter(col("__r") <= perDocBudget)
      }
    budgeted.select(col("doc_a"), col("doc_b"))
      // shuffle-hash pinned: budgeted pairs are output-sized, capped
      // text is corpus-sized — no broadcast on either side
      .join(capped.select(col("doc_id").as("doc_a"), col("__t").as("__ta"))
        .hint("shuffle_hash"), "doc_a")
      .join(capped.select(col("doc_id").as("doc_b"), col("__t").as("__tb"))
        .hint("shuffle_hash"), "doc_b")
      // spread the pairs across every core BEFORE the O(len²) kernel:
      // the budgeted pair frame is tiny in BYTES, so AQE coalesces its
      // shuffle to ~one partition — and one task then runs the whole
      // corpus's Levenshtein DP serially (measured: a 4.5 s wall /
      // 8 s cpu / 2-task stage of a 7.7 s query). A bare round-robin
      // repartition alone is NOT enough: the optimizer would push the
      // ratio filter (and the levenshtein it references) back below
      // the exchange, re-serializing it. The Generate below pins it:
      // a filter on generator output cannot cross the Generate, and no
      // rule moves a Generate below a repartition — so the kernel runs
      // post-exchange on every core, with no checkpoint (r16 pinned it
      // with a lazy localCheckpoint, which also held every pair block
      // in executor storage memory). The exchange moves only
      // capped-text pairs — output-sized, orders below the kernel work
      // it parallelizes; round-robin is immune to hot-doc_b skew.
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions)
      // the O(len²) kernel runs exactly ONCE per row: behind a Generate
      // (explode of a 1-element array) the ratio filter above cannot be
      // pushed into / duplicated over the levenshtein expression — a
      // plain withColumn had the optimizer evaluating it twice per
      // surviving row (once in the pushed Filter, once in the Project)
      .select(col("doc_a"), col("doc_b"), col("__ta"), col("__tb"),
        explode(array(levenshtein(col("__ta"), col("__tb")).cast("long")))
          .as("edit_dist"))
      .withColumn("edit_ratio_micro",
        expr("edit_dist * 1000000 div greatest(length(__ta), length(__tb), 1)"))
      .filter(col("edit_ratio_micro") <= math.round(maxEditRatio * 1e6))
      .select(col("doc_a"), col("doc_b"), col("edit_dist"), col("edit_ratio_micro"))
  }

  /** APPLY step for [[duplicateSpans]]: remove every reported span
    * from the HIGHER-id document of each pair (keep-earliest-copy, the
    * Lee et al. apply policy), merging overlapping spans first.
    *
    * Interval merge is gaps-and-islands (running max of span end, new
    * island when a span starts past it) — one window per doc_b, no
    * driver state. The per-doc merged-interval list is match-count
    * sized (not doc-length sized) and rebuilds the text with an
    * indexed filter HOF, so the whole apply is two shuffles: the
    * island window and the doc join. Docs without spans pass through
    * untrimmed. */
  def trimSpans(docs0: DataFrame, spans: DataFrame): DataFrame = {
    // input-layout skew guard: re-spread an under-parallel scan before
    // the per-row kernel below (no-op on naturally parallel layouts;
    // see Tables.spreadSmallScan)
    val docs = graft.Tables.spreadSmallScan(docs0)
    val wIsl = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val prevMax = max(col("e")).over(wIsl.rowsBetween(Window.unboundedPreceding, -1))
    val merged = spans
      .select(col("doc_b").as("doc_id"), col("start_b").as("s"),
        (col("start_b") + col("span_tokens")).as("e"))
      .withColumn("__pm", prevMax)
      .withColumn("__isl",
        sum(when(col("s") > coalesce(col("__pm"), lit(-1L)), 1L).otherwise(0L)).over(wIsl))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("s"), col("e"))).as("__iv"))
    docs.join(merged, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(aggregate(col("__iv"), lit(0L),
          (acc, iv) => acc + (iv.getField("e") - iv.getField("s"))), lit(0L))
          .as("n_tokens_removed"),
        when(col("__iv").isNull, col("text")).otherwise(
          array_join(filter(split(col("text"), " "),
            (_, i) => !exists(col("__iv"), iv =>
              i.cast("long") >= iv.getField("s") && i.cast("long") < iv.getField("e"))),
            " ")).as("text"))
  }
}
