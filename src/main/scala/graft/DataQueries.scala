package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Retrieval, Sampling, Similarity, TextOps}

/** Oracle-checked queries for the training-data pipeline operators
  * (SURVEY §7.2 M7): dedup, similarity search, text analysis,
  * multimodal plumbing. DuckDB oracles are generated from the same
  * constants the Spark operators use, so the two sides cannot drift.
  */
object DataQueries {

  // ---- shared fixtures ----
  val topicProfiles: Seq[(String, Seq[String])] = Seq(
    "db" -> Seq("table", "scan", "join", "merge", "sort", "index"),
    "stream" -> Seq("stream", "window", "batch", "watermark"),
    "ml" -> Seq("vector", "embedding", "hash", "model"),
    "en" -> Seq("the", "a", "of"))
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")
  val jaccardThreshold = 0.5
  val clusterThreshold = 0.8
  val annQueries = 5
  val annK = 10
  val lshPlanes = 4
  val lshThreshold = 0.15

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  val decontamNgram = 8
  val splitFractions: Seq[(String, Double)] =
    Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
  val maxPerSource = 80L
  val packWindow = 2048L
  val kmeansK = 8
  // hashed-LM bucket count for DSIR importance scoring
  val dsirDim = 1024
  // within-cell cosine boundary for SemDeDup (fixture embeddings are
  // random: within-cell max ≈0.53, so 0.40 drops a non-trivial set at
  // every SF; nearest rounded cosine sits ≥25 micro-steps away, so the
  // round(·,6) boundary is engine-stable)
  val semDedupThreshold = 0.40
  val pqM = 4
  val pqKsub = 16
  val stratifiedFracs: Seq[(String, Double)] = Seq("src0" -> 0.5, "src1" -> 0.1)
  val stratifiedDefault = 0.25
  val tfidfK = 5
  val chunkWindow = 16
  // duplicate-span detection: 6-token grams, report runs >= 12 tokens
  val dupSpanN = 6
  val dupSpanMin = 12
  // heavy hitters: top-k bigrams per source
  val hhK = 10
  // hashed linear classifier: weight-bucket count
  val clfDim = 256
  // embedding outliers: k farthest vectors per label
  val outlierK = 20

  /** Shared oracle CTE chain producing the `spans` relation (used by
    * q_dup_spans and q_dup_trim — one definition, zero drift). */
  private lazy val dupSpanCtes: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |pos AS (
       |  SELECT doc_id, w,
       |         CAST(unnest(range(0, len(w) - $dupSpanN + 1)) AS BIGINT) AS pos
       |  FROM toks WHERE len(w) >= $dupSpanN),
       |grams AS (
       |  SELECT doc_id, pos,
       |         array_to_string(w[pos + 1:pos + $dupSpanN], ' ') AS g
       |  FROM pos),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
       |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id),
       |runs AS (
       |  SELECT *, pa - pb AS diag,
       |    CASE WHEN lag(pa) OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) = pa - 1
       |         THEN 0 ELSE 1 END AS brk
       |  FROM pairs),
       |grp AS (
       |  SELECT *, SUM(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS run
       |  FROM runs),
       |spans AS (
       |  SELECT doc_a, doc_b,
       |    CAST(MIN(pa) AS BIGINT) AS start_a,
       |    CAST(MIN(pb) AS BIGINT) AS start_b,
       |    CAST(MAX(pa) - MIN(pa) + $dupSpanN AS BIGINT) AS span_tokens
       |  FROM grp GROUP BY doc_a, doc_b, diag, run
       |  HAVING MAX(pa) - MIN(pa) + $dupSpanN >= $dupSpanMin)""".stripMargin
  val mixAlpha = 0.7
  val mixTargetFrac = 0.5
  // BM25 retrieval: literal query set over the synthetic corpus
  // vocabulary; the oracle VALUES list renders from this same Seq.
  // "watermark" appears in no document — a query term with zero
  // postings must contribute nothing on either engine.
  val bm25Queries: Seq[(Long, String)] = Seq(
    0L -> "spark window join",
    1L -> "table scan merge sort",
    2L -> "stream batch watermark",
    3L -> "vector hash model")
  // corpus drift: report the top-50 diverging tokens
  val driftK = 50
  // fixed-k eval sample per source
  val groupSampleK = 25
  // winnowing: 4-token grams, window of 4 (guarantee: any shared run
  // of >= 7 tokens yields a shared fingerprint)
  val winnowGram = 4
  val winnowWindow = 4
  // MOSS pair report: at least this many shared fingerprints
  val winnowMinShared = 2L
  // containment: 3-gram shingles, short side >= 50% contained
  val containShingle = 3
  val containThreshold = 0.5

  /** Shared winnow-selection oracle CTEs (toks → d with blocker
    * distances) — q_winnow and q_winnow_pairs compose on top. */
  private lazy val winnowOracleCtes: String = {
    val k = winnowGram; val w = winnowWindow
    val lags = (1 until w)
      .map(t => s"WHEN lag(h, $t) OVER win < h THEN $t").mkString("\n    ")
    val leads = (1 until w)
      .map(t => s"WHEN lead(h, $t) OVER win <= h THEN $t").mkString("\n    ")
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |eligible AS (SELECT doc_id, w FROM toks WHERE len(w) >= $k + $w - 1),
       |pos AS (
       |  SELECT doc_id, CAST(unnest(range(0, len(w) - $k + 1)) AS BIGINT) AS pos, w
       |  FROM eligible),
       |grams AS (
       |  SELECT doc_id, pos,
       |    CAST(('0x' || substring(md5(array_to_string(w[pos + 1:pos + $k], ' ')), 1, 15)) AS BIGINT) AS h,
       |    CAST(len(w) - $k AS BIGINT) AS maxpos
       |  FROM pos),
       |d AS (
       |  SELECT doc_id, pos, h, maxpos,
       |    CASE $lags
       |    ELSE $w END AS ldist,
       |    CASE $leads
       |    ELSE $w END AS rdist
       |  FROM grams
       |  WINDOW win AS (PARTITION BY doc_id ORDER BY pos))""".stripMargin
  }
  val hashedDim = 64
  // RAG chunker: 64-token windows, stride 48 (16-token overlap)
  val chunkTok = 64
  val chunkStride = 48
  // bigram LM interpolation weight (1−λ rendered at full precision in
  // the oracle so both engines fold the identical double)
  val lmLambda = 0.8
  val budgetTokens = 5000L

  /** Deterministic fixture quantizer/codebook: the `n` lowest-id
    * embeddings (mirrored by `WHERE vec_id < n` in the oracles). */
  private def headVectors(s: SparkSession, d: String, n: Int): Array[(Long, Seq[Float])] =
    emb(s, d).filter(col("vec_id") < n)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)

  /** Shared PQ oracle CTEs (embeddings, codebook, subspaces, codes,
    * per-query ADC lookup tables) — q_pq_adc and q_ivfpq compose on
    * top so the two oracles cannot drift. */
  private lazy val pqCtes: String = {
    val sub = 64 / pqM
    def sl(e: String) = s"list_slice($e, subs.sub * $sub + 1, subs.sub * $sub + $sub)"
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |cb AS (SELECT vec_id AS cid, emb AS c_emb FROM e WHERE vec_id < $pqKsub),
       |subs AS (SELECT unnest(range($pqM)) AS sub),
       |codes AS (
       |  SELECT vec_id, sub, cid AS code FROM (
       |    SELECT e.vec_id, subs.sub, cb.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id, subs.sub ORDER BY
       |        list_dot_product(${sl("e.emb")}, ${sl("e.emb")})
       |          - 2.0 * list_dot_product(${sl("e.emb")}, ${sl("cb.c_emb")})
       |          + list_dot_product(${sl("cb.c_emb")}, ${sl("cb.c_emb")}) ASC,
       |        cb.cid ASC) AS rn
       |    FROM e CROSS JOIN subs CROSS JOIN cb)
       |  WHERE rn = 1),
       |luts AS (
       |  SELECT q.vec_id AS query_id, subs.sub, cb.cid,
       |    CAST(round((list_dot_product(${sl("q.emb")}, ${sl("q.emb")})
       |      - 2.0 * list_dot_product(${sl("q.emb")}, ${sl("cb.c_emb")})
       |      + list_dot_product(${sl("cb.c_emb")}, ${sl("cb.c_emb")}))
       |      * 1000000.0) AS BIGINT) AS d2_micro
       |  FROM e q CROSS JOIN subs CROSS JOIN cb WHERE q.vec_id < $annQueries)""".stripMargin
  }

  private lazy val adcRankSql: String =
    s"""SELECT query_id, rank, neighbor_id, adc_micro FROM (
       |  SELECT query_id, vec_id AS neighbor_id, adc_micro,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adc_micro ASC, vec_id ASC) AS BIGINT) AS rank
       |  FROM scored)
       |WHERE rank <= $annK""".stripMargin

  /** PII fixture: the corpus has no emails/IPs, so inject
    * deterministic ones on a doc_id lattice (mirrored in the oracle). */
  private def piiInjected =
    concat(col("text"),
      when(pmod(col("doc_id"), lit(7L)) === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com now"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(11L)) === 0,
        concat(lit(" from 10.0."), pmod(col("doc_id"), lit(256L)).cast("string"),
          lit(".1 logged"))).otherwise(lit("")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_stats" -> ((s, d) => TextOps.tokenStats(docs(s, d))),

    "q_text_classify" -> ((s, d) => TextOps.classify(docs(s, d), topicProfiles)),

    "q_text_quality" -> ((s, d) => TextOps.qualityScore(docs(s, d), stopwords)),

    // per-source percentile of the quality score (integer milli) —
    // the calibration step before any cross-source threshold
    "q_quality_percentile" -> ((s, d) =>
      TextOps.qualityPercentile(docs(s, d), stopwords)),

    // best ~5000 tokens per source by quality (greedy, audit flag)
    "q_budget_select" -> ((s, d) =>
      TextOps.tokenBudgetSelect(docs(s, d), stopwords, budgetTokens)),

    "q_text_tokens" -> ((s, d) => TextOps.tokenCounts(docs(s, d))),

    "q_text_fingerprint" -> ((s, d) => TextOps.fingerprint(docs(s, d))),

    "q_curation" -> ((s, d) =>
      TextOps.curate(docs(s, d), stopwords, minTokens = 10L, minQuality = 0.6)),

    "q_corpus_stats" -> ((s, d) => TextOps.corpusStats(docs(s, d))),

    "q_decontaminate" -> ((s, d) => {
      val all = docs(s, d)
      // deterministic "benchmark" subset standing in for an eval suite
      TextOps.decontaminate(all, all.filter(pmod(col("doc_id"), lit(50L)) === 0),
        n = decontamNgram)
    }),

    "q_text_redact" -> ((s, d) =>
      TextOps.redactPii(docs(s, d).withColumn("text", piiInjected))),

    "q_text_repetition" -> ((s, d) => TextOps.repetition(docs(s, d))),

    "q_data_split" -> ((s, d) =>
      Sampling.split(docs(s, d), splitFractions)
        .select(col("doc_id"), col("source"), col("split"))),

    "q_source_quota" -> ((s, d) =>
      Sampling.sourceQuota(docs(s, d), maxPerSource)
        .select(col("doc_id"), col("source"), col("quota_rank"), col("kept"))),

    "q_seq_pack" -> ((s, d) => Sampling.packSequences(docs(s, d), packWindow)),

    // corpus bigram census: per-source heavy hitters
    "q_heavy_hitters" -> ((s, d) => TextOps.heavyHitters(docs(s, d), hhK)),

    // markup/control strip + whitespace collapse + lowercase
    "q_text_normalize" -> ((s, d) => TextOps.normalizeText(docs(s, d))),

    // HLL++ distinct-content profile (approximate by design → the
    // driver records the rows-only check; the error bound is
    // spec-verified against exact countDistinct)
    // HLL++ sketch with its accuracy gate folded in: exact fields
    // hash-match the oracle, the boolean bands the estimate (±5%)
    "q_corpus_sketch" -> ((s, d) => TextOps.corpusSketchChecked(docs(s, d))),

    // fastText-style hashed linear quality gate (zero shuffle)
    "q_hash_classifier" -> ((s, d) =>
      TextOps.hashedLinearScore(docs(s, d), clfDim)),

    // embedding-space curation: farthest-from-centroid per label
    "q_embed_outlier" -> ((s, d) =>
      Similarity.embeddingOutliers(emb(s, d), outlierK)),

    // epoch-1 training order over 4 loader shards
    "q_epoch_shuffle" -> ((s, d) =>
      Sampling.epochShuffle(docs(s, d), epoch = 1, nShards = 4)),

    // dataset-card mix table: doc/token volume per (split, source) —
    // split assignment composes with the corpus aggregation in one
    // map-side-combined shuffle
    "q_corpus_mix" -> ((s, d) =>
      Sampling.split(docs(s, d), splitFractions)
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))),

    "q_dedup_exact" -> ((s, d) => Dedup.exact(docs(s, d))),

    // continuous-ingest dedup: the "new crawl" (odd doc ids) against
    // the historical corpus (even doc ids)
    "q_dedup_incremental" -> ((s, d) => {
      val all = docs(s, d)
      Dedup.incrementalExact(
        all.filter(pmod(col("doc_id"), lit(2L)) === 1),
        all.filter(pmod(col("doc_id"), lit(2L)) === 0))
        .select(col("doc_id"), col("source"), col("content_md5"))
    }),

    // Bloom-pruned incremental dedup: EXACT results (the filter only
    // prunes the anti-join), so the oracle is the plain NOT IN
    "q_dedup_bloom" -> ((s, d) => {
      val all = docs(s, d)
      Dedup.incrementalExactBloom(
        all.filter(pmod(col("doc_id"), lit(3L)) =!= 0),
        all.filter(pmod(col("doc_id"), lit(3L)) === 0))
        .select(col("doc_id"), col("source"), col("content_md5"))
    }),

    "q_dedup_minhash" -> ((s, d) => Dedup.minhashSignatures(docs(s, d))),

    "q_dedup_minhash_pairs" -> ((s, d) =>
      Dedup.minhashPairs(Dedup.minhashSignatures(docs(s, d)))),

    // persisted LSH index: build on the historical third, probe the
    // rest — pairs equal a band-join of new sigs against old sigs
    "q_dedup_index" -> ((s, d) => {
      val all = docs(s, d)
      val dir = java.nio.file.Files
        .createTempDirectory("graft-mhidx-q").toString
      Dedup.buildMinhashIndex(all.filter(pmod(col("doc_id"), lit(3L)) === 0), dir)
      Dedup.probeMinhashIndex(all.filter(pmod(col("doc_id"), lit(3L)) =!= 0), dir)
        .select(col("doc_new"), col("doc_old"))
    }),

    "q_dedup_simhash" -> ((s, d) => Dedup.simhash(docs(s, d))),

    // iterative min-label propagation, oracle-checked against a
    // recursive-CTE transitive closure — the cluster ids every dedup
    // pipeline needs to pick one exemplar per near-dup group.
    // Clustering runs on HIGH-CONFIDENCE pairs (the realistic input:
    // you cluster what you'd actually merge), which also keeps the
    // iterative rounds bench-proportionate.
    // The oracle pins ALGORITHM correctness on a fixed-size slice
    // (doc_id < 500 — the full corpus at the correctness SF); pair
    // generation's scale behavior is benched by the pair queries
    // themselves, so the iterative rounds don't dominate the bench.
    "q_dedup_clusters" -> ((s, d) =>
      Dedup.clusters(Dedup.jaccardPairs(
        docs(s, d).filter(col("doc_id") < 500), "source", clusterThreshold))),

    // the complete dedup workflow: pairs -> clusters -> keep exemplar
    "q_dedup_fuzzy" -> ((s, d) =>
      Dedup.fuzzyDedupKeep(
        docs(s, d).filter(col("doc_id") < 500), "source", clusterThreshold)),

    // naive counting join, not the prefix-filtered path: this fixture's
    // ~50-token near-uniform vocabulary gives prefix filtering nothing
    // to prune (bucket sizes stay ~uniform, candidates ≈ answers), so
    // the extra distinct+verify passes only add shuffles — measured 2x
    // slower at sf0.1. Real corpora (Zipfian, large vocab) invert this;
    // see Dedup.jaccardPairsPrefix.
    "q_dedup_ngram" -> ((s, d) =>
      Dedup.jaccardPairs(docs(s, d), "source", jaccardThreshold)),

    // candidate-generation → exact-verify: jaccard candidates
    // confirmed by normalized Levenshtein on length-capped text,
    // under a per-doc verification budget (each doc verifies only its
    // 3 strongest candidates — corpus-linear verify work even when the
    // generator saturates)
    "q_dedup_verified" -> ((s, d) => {
      val dd = docs(s, d)
      Dedup.editVerifiedPairs(dd,
        Dedup.jaccardPairs(dd, "source", jaccardThreshold),
        maxEditRatio = 0.6, capLen = 256,
        perDocBudget = 3,
        budgetOrder = Seq(col("jaccard").desc, col("doc_b")))
    }),

    // exact substring (span) dedup: maximal verbatim token runs
    "q_dup_spans" -> ((s, d) =>
      Dedup.duplicateSpans(docs(s, d), dupSpanN, dupSpanMin)),

    // apply step: spans removed from the higher-id copy
    "q_dup_trim" -> ((s, d) => {
      val dd = docs(s, d)
      Dedup.trimSpans(dd, Dedup.duplicateSpans(dd, dupSpanN, dupSpanMin))
    }),

    "q_token_quantiles" -> ((s, d) => TextOps.tokenQuantiles(docs(s, d))),

    "q_chunk_overlap" -> ((s, d) =>
      TextOps.chunkWithOverlap(docs(s, d), chunkTok, chunkStride)),

    // Output exploded to (vec_id, scale, pos, code) rows: the driver's
    // pandas comparator sorts on column values, and an array column is
    // unhashable there — scalar rows keep the oracle comparable.
    "q_embed_quantize" -> ((s, d) =>
      Similarity.quantizeInt8(emb(s, d))
        .select(col("vec_id"), col("scale"), posexplode(col("codes")))
        .select(col("vec_id"), col("scale"),
          col("pos").cast("long").as("pos"), col("col").as("code"))),

    "q_ann_topk" -> ((s, d) => Similarity.bruteForceTopK(emb(s, d), annQueries, annK)),

    "q_ann_lsh" -> ((s, d) => {
      val planes = emb(s, d).filter(col("vec_id") < lshPlanes)
        .select(col("vec_id").as("plane_id"), col("embedding"))
      Similarity.lshNeighbors(emb(s, d), planes, lshThreshold)
    }),

    "q_multimodal_meta" -> ((s, d) =>
      Multimodal.blobMeta(Multimodal.withBlob(docs(s, d)))),

    // one Lloyd step of the in-engine k-means (IVF quantizer
    // training): cells from the deterministic seed quantizer, then
    // the micro-exact per-dimension mean recompute
    "q_kmeans_step" -> ((s, d) =>
      Similarity.kmeansStep(emb(s, d), headVectors(s, d, kmeansK))),

    // SemDeDup: coarse k-means cells, then within-cell cosine pruning
    // keeping the lowest-id representative of each duplicate pair
    "q_semantic_dedup" -> ((s, d) =>
      Similarity.semanticDedup(emb(s, d), headVectors(s, d, kmeansK),
        semDedupThreshold)),

    "q_pq_codes" -> ((s, d) =>
      Similarity.pqCodes(emb(s, d), headVectors(s, d, pqKsub), pqM)),

    "q_pq_adc" -> ((s, d) =>
      Similarity.pqAdcTopK(emb(s, d), headVectors(s, d, pqKsub), pqM,
        annQueries, annK)),

    // the billion-scale layout: coarse cell probe + ADC rank inside it
    "q_ivfpq" -> ((s, d) =>
      Similarity.ivfPqTopK(emb(s, d), headVectors(s, d, kmeansK),
        headVectors(s, d, pqKsub), pqM, annQueries, annK)),

    "q_lm_score" -> ((s, d) => TextOps.lmScore(docs(s, d))),

    "q_lm_bigram" -> ((s, d) => TextOps.lmScoreBigram(docs(s, d), lmLambda)),

    // DSIR importance scores: how target-like each raw doc is under
    // hashed unigram LMs (target = every 50th doc, as decontaminate)
    "q_dsir" -> ((s, d) => {
      val all = docs(s, d)
      Sampling.dsirScores(all,
        all.filter(pmod(col("doc_id"), lit(50L)) === 0), dsirDim)
    }),

    "q_tfidf" -> ((s, d) => TextOps.tfidfTopTerms(docs(s, d), tfidfK)),

    "q_chunk_dedup" -> ((s, d) => TextOps.chunkDedup(docs(s, d), chunkWindow)),

    "q_hashed_vectors" -> ((s, d) =>
      TextOps.hashedTfidfVectors(docs(s, d), hashedDim)),

    // text → hashed vectors → the ANN stack unchanged: cosine top-k
    // neighbors over documents with no external embedding model.
    // Vectors materialize once (they feed both sides of the
    // brute-force join — without it the whole tf-idf pipeline runs
    // twice, once for the corpus side and once for the probe set)
    "q_text_ann" -> ((s, d) =>
      Similarity.bruteForceTopK(
        Tables.pinTrunk(TextOps.hashedDenseVectors(docs(s, d), hashedDim)
          .select(col("doc_id").as("vec_id"), col("embedding"))),
        annQueries, annK)),

    "q_stratified" -> ((s, d) =>
      Sampling.stratifiedSample(docs(s, d), stratifiedFracs.toMap, stratifiedDefault)
        .select(col("doc_id"), col("source"), col("sample_bucket"), col("sampled"))),

    "q_temperature_mix" -> ((s, d) =>
      Sampling.temperatureMix(docs(s, d), mixAlpha, mixTargetFrac)
        .select(col("doc_id"), col("source"), col("mix_frac"), col("sampled"))),

    "q_bm25" -> ((s, d) => {
      import s.implicits._
      Retrieval.bm25TopK(docs(s, d), bm25Queries.toDF("query_id", "qtext"), annK)
    }),

    // hybrid retrieval: RRF fusion of the BM25 list and the
    // hashed-tf-idf cosine list, doc-as-query over the same corpus
    "q_hybrid_rrf" -> ((s, d) =>
      Retrieval.hybridRrf(docs(s, d), hashedDim, annQueries, annK)),

    // retrieval eval: NDCG@k of the sparse list judged by the dense
    // list, log2 discounts inlined as driver-computed literals
    "q_retrieval_ndcg" -> ((s, d) =>
      Retrieval.ndcgAtK(docs(s, d), hashedDim, annQueries, annK)),

    // fixed-k eval sample per source: hash-ranked, no RNG state
    "q_group_sample" -> ((s, d) =>
      Sampling.groupSample(docs(s, d), groupSampleK)),

    // winnowing fingerprints: rightmost-min of every w-window of
    // k-gram hashes (the MOSS selection), zero-shuffle per-row kernel
    "q_winnow" -> ((s, d) =>
      TextOps.winnow(docs(s, d), winnowGram, winnowWindow)),

    // MOSS duplicate report: pairs sharing >= 2 winnowed fingerprints
    "q_winnow_pairs" -> ((s, d) =>
      Dedup.winnowPairs(
        TextOps.winnow(docs(s, d), winnowGram, winnowWindow), winnowMinShared)),

    // asymmetric (quote/subset) dedup: short doc mostly contained in
    // a long one — the case Jaccard misses by construction
    "q_containment" -> ((s, d) =>
      Dedup.containmentPairs(docs(s, d), "source", containShingle, containThreshold)),

    // drift between two crawls (even/odd doc_id snapshots): top-50
    // tokens by chi-square frequency divergence
    "q_corpus_drift" -> ((s, d) => {
      val all = docs(s, d)
      TextOps.corpusDrift(
        all.filter(pmod(col("doc_id"), lit(2L)) === 0),
        all.filter(pmod(col("doc_id"), lit(2L)) === 1), driftK)
    })
  )

  // ---- DuckDB oracles (generated) ----

  private val toksDistinct =
    "SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents"

  private def inList(items: Seq[String]): String =
    items.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Shared BM25 oracle CTE chain (toks → lexscore). Expects a
    * `queries(query_id, qtext)` CTE defined by the caller. The
    * contribution expression is parenthesized token-for-token like
    * the Spark side ([[Retrieval.bm25TopK]]): IEEE ops are
    * deterministic but not associative, so the SHAPE must match, not
    * just the math. */
  private def bm25OracleCtes(excludeSelf: Boolean): String = {
    import Retrieval.{k1, k1Plus1, b, oneMinusB}
    val self = if (excludeSelf) "\n  WHERE tf.doc_id <> qterms.query_id" else ""
    s"""toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
       |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
       |  FROM dl),
       |idf AS (
       |  SELECT tok,
       |    CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
       |      * 1000000.0) AS BIGINT) AS idf_micro
       |  FROM dfq CROSS JOIN stats),
       |qterms AS (
       |  SELECT DISTINCT query_id, tok
       |  FROM (SELECT query_id, unnest(string_split(qtext, ' ')) AS tok FROM queries)),
       |contrib AS (
       |  SELECT qterms.query_id, tf.doc_id,
       |    CAST(round(((CAST(idf_micro AS DOUBLE) / 1000000.0) *
       |      ((CAST(tf AS DOUBLE) * CAST($k1Plus1 AS DOUBLE)) /
       |        (CAST(tf AS DOUBLE) + CAST($k1 AS DOUBLE) *
       |          (CAST($oneMinusB AS DOUBLE) + CAST($b AS DOUBLE) *
       |            (CAST(dl AS DOUBLE) / avgdl))))) * 1000.0) AS BIGINT) AS contrib_milli
       |  FROM tf
       |  JOIN qterms USING (tok)
       |  JOIN idf USING (tok)
       |  JOIN dl USING (doc_id)
       |  CROSS JOIN stats$self),
       |lexscore AS (
       |  SELECT query_id, doc_id, CAST(SUM(contrib_milli) AS BIGINT) AS score_milli
       |  FROM contrib GROUP BY 1, 2)""".stripMargin
  }

  /** Shared hashed-cosine oracle CTE chain (vidf → vtop): the
    * q_text_ann ranking pipeline over the bm25 chain's tf/dfq/stats,
    * ending in the top-k list per query. Used by q_hybrid_rrf and
    * q_retrieval_ndcg so the two oracles cannot drift. */
  private lazy val hashedCosineCtes: String =
    s"""vidf AS (
       |  SELECT tok,
       |    CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
       |      * 1000000.0) AS BIGINT) AS idf_micro,
       |    CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % $hashedDim AS dim_idx
       |  FROM dfq CROSS JOIN stats),
       |w AS (
       |  SELECT tf.doc_id, vidf.dim_idx,
       |    CAST(SUM(tf.tf * vidf.idf_micro) AS BIGINT) AS w
       |  FROM tf JOIN vidf USING (tok) GROUP BY 1, 2),
       |dense AS (
       |  SELECT d.doc_id, list(CAST(coalesce(w.w, 0) AS DOUBLE) ORDER BY r.d) AS emb
       |  FROM (SELECT DISTINCT doc_id FROM documents) d
       |  CROSS JOIN (SELECT unnest(range($hashedDim)) AS d) r
       |  LEFT JOIN w ON w.doc_id = d.doc_id AND w.dim_idx = r.d
       |  GROUP BY d.doc_id),
       |wc AS (
       |  SELECT doc_id AS vec_id, emb,
       |    sqrt(list_dot_product(emb, emb)) AS nn FROM dense),
       |qv AS (
       |  SELECT vec_id AS query_id, emb AS q_emb, nn AS qn
       |  FROM wc WHERE vec_id < $annQueries),
       |vscored AS (
       |  SELECT qv.query_id, wc.vec_id,
       |    list_dot_product(qv.q_emb, wc.emb) / (qv.qn * wc.nn) AS cos
       |  FROM wc CROSS JOIN qv WHERE wc.vec_id <> qv.query_id),
       |vtop AS (
       |  SELECT query_id, doc_id, rank FROM (
       |    SELECT query_id, vec_id AS doc_id,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
       |    FROM vscored)
       |  WHERE rank <= $annK)""".stripMargin

  private val minhashSigSql: String = {
    val lanes = (0 until Dedup.NumHashes).map { i =>
      s"CAST(MIN((h * ${Dedup.hashA(i)} + ${Dedup.hashB(i)}) % ${Dedup.MinhashPrime}) AS BIGINT) AS m$i"
    }.mkString(",\n    ")
    val bandCols = (0 until Dedup.NumBands).map { b =>
      val ms = (b * 4 until b * 4 + 4).map(i => s"CAST(m$i AS VARCHAR)").mkString(", ")
      s"md5(concat_ws(',', $ms)) AS band$b"
    }.mkString(",\n  ")
    s"""toks AS (
       |  SELECT doc_id, CAST(('0x' || substring(md5(tok), 1, 7)) AS BIGINT) AS h
       |  FROM ($toksDistinct)
       |), sig AS (
       |  SELECT doc_id,
       |    $lanes
       |  FROM toks GROUP BY doc_id
       |), sigb AS (
       |  SELECT *,
       |  $bandCols
       |  FROM sig
       |)""".stripMargin
  }

  private val annScoredSql =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |q AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < $annQueries),
       |scored AS (
       |  SELECT q.query_id, e.vec_id,
       |    list_dot_product(q.qe, e.emb) /
       |      (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(e.emb, e.emb))) AS cos
       |  FROM e JOIN q ON e.vec_id <> q.query_id
       |)""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_text_stats" ->
      """SELECT doc_id,
        |  CAST(len(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |  CAST(len(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
        |FROM documents""".stripMargin,

    "q_text_classify" -> {
      val counts = topicProfiles.map { case (lang, markers) =>
        s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ${inList(markers)})) AS BIGINT) AS n_$lang"
      }.mkString(",\n  ")
      // same argmax/tie-break chain as TextOps.classify
      val names = topicProfiles.map(_._1)
      val pred = names.indices.reverse.foldLeft(s"'${names.head}'") { (acc, i) =>
        val lang = names(i)
        val conds =
          names.take(i).map(l => s"n_$lang > n_$l") ++
            names.drop(i + 1).map(l => s"n_$lang >= n_$l")
        val cond = if (conds.isEmpty) "TRUE" else conds.mkString(" AND ")
        s"CASE WHEN $cond THEN '$lang' ELSE $acc END"
      }
      s"""SELECT doc_id, $counts, $pred AS pred
         |FROM documents""".stripMargin
    },

    "q_curation" -> {
      val qualitySql =
        s"""(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           |     / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.4
           |  + least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0) * 0.3
           |  + (1.0 - CAST(len(list_filter(string_split(text, ' '), t -> t IN ${inList(stopwords)})) AS DOUBLE)
           |       / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.3""".stripMargin
      s"""WITH q AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    $qualitySql AS quality,
         |    MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
         |  FROM documents)
         |SELECT doc_id, n_tokens, quality,
         |  CASE WHEN doc_id <> keeper THEN 'duplicate'
         |       WHEN n_tokens < 10 THEN 'too_short'
         |       WHEN quality < 0.6 THEN 'low_quality'
         |       ELSE 'ok' END AS reason,
         |  (CASE WHEN doc_id <> keeper THEN 'duplicate'
         |       WHEN n_tokens < 10 THEN 'too_short'
         |       WHEN quality < 0.6 THEN 'low_quality'
         |       ELSE 'ok' END) = 'ok' AS keep
         |FROM q""".stripMargin
    },

    "q_corpus_stats" ->
      """SELECT source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  COUNT(DISTINCT md5(text)) AS n_unique,
        |  1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_rate
        |FROM documents GROUP BY 1""".stripMargin,

    "q_text_quality" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS diversity,
         |  1.0 - CAST(len(list_filter(string_split(text, ' '), t -> t IN ${inList(stopwords)})) AS DOUBLE)
         |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS density,
         |  (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |     / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.4
         |  + least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0) * 0.3
         |  + (1.0 - CAST(len(list_filter(string_split(text, ' '), t -> t IN ${inList(stopwords)})) AS DOUBLE)
         |       / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.3 AS quality
         |FROM documents""".stripMargin,

    // rank arithmetic pure integer; `//` floors like Spark's div on
    // the non-negative ranks
    "q_quality_percentile" ->
      s"""WITH q AS (
         |  SELECT doc_id, source,
         |    (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |       / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.4
         |    + least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0) * 0.3
         |    + (1.0 - CAST(len(list_filter(string_split(text, ' '), t -> t IN ${inList(stopwords)})) AS DOUBLE)
         |         / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.3 AS quality
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY quality ASC, doc_id ASC) AS BIGINT) AS r,
         |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
         |  FROM q)
         |SELECT doc_id, source,
         |  CAST(CASE WHEN n = 1 THEN 0
         |       ELSE ((r - 1) * 1000) // (n - 1) END AS BIGINT) AS pr_milli
         |FROM r""".stripMargin,

    // greedy per-source budget: same quality double, window running
    // sum inclusive of the current doc
    "q_budget_select" ->
      s"""WITH q AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |       / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.4
         |    + least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0) * 0.3
         |    + (1.0 - CAST(len(list_filter(string_split(text, ' '), t -> t IN ${inList(stopwords)})) AS DOUBLE)
         |         / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.3 AS quality
         |  FROM documents)
         |SELECT doc_id, source, n_tokens, quality,
         |  CAST(SUM(n_tokens) OVER (PARTITION BY source
         |    ORDER BY quality DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
         |  SUM(n_tokens) OVER (PARTITION BY source
         |    ORDER BY quality DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= $budgetTokens AS selected
         |FROM q""".stripMargin,

    "q_text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_alnum_runs,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |    t -> CAST(ceil(length(t) / 6.0) AS BIGINT))) AS BIGINT) AS est_bpe_tokens
        |FROM documents""".stripMargin,

    "q_text_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_md5,
        |  CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS fp_long,
        |  CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) % 1024 AS fp_bucket
        |FROM documents""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS content_md5, MIN(doc_id) AS keeper_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "q_decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |idx AS (
         |  SELECT doc_id, w,
         |    unnest(generate_series(1, len(w) - ${decontamNgram - 1})) AS i
         |  FROM toks
         |),
         |grams AS (
         |  SELECT DISTINCT doc_id,
         |    array_to_string(w[i:i + ${decontamNgram - 1}], ' ') AS gram
         |  FROM idx
         |),
         |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
         |hits AS (
         |  SELECT doc_id, COUNT(*) AS n_hits
         |  FROM grams JOIN bench USING (gram) GROUP BY 1
         |)
         |SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
         |  COALESCE(h.n_hits, 0) > 0 AS contaminated
         |FROM documents d LEFT JOIN hits h USING (doc_id)""".stripMargin,

    "q_text_redact" -> {
      val email = """[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"""
      val ip = """\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"""
      s"""WITH injected AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 7 = 0
         |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0
         |      THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 logged'
         |      ELSE '' END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ips,
         |  regexp_replace(regexp_replace(text, '$email', '<EMAIL>', 'g'),
         |    '$ip', '<IP>', 'g') AS redacted
         |FROM injected""".stripMargin
    },

    "q_data_split" -> {
      // mirror of Sampling.split: cum fractions 0.9 / 0.95 / 1.0
      """SELECT doc_id, source,
        |  CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < 9000 THEN 'train'
        |       WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < 9500 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin
    },

    "q_corpus_sketch" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
        |  true AS sketch_within_band
        |FROM documents GROUP BY source""".stripMargin,

    "q_corpus_mix" ->
      """WITH s AS (
        |  SELECT source, string_split(text, ' ') AS w,
        |    CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < 9000 THEN 'train'
        |         WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < 9500 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(w)) AS BIGINT) AS n_tokens
        |FROM s GROUP BY 1, 2""".stripMargin,

    "q_source_quota" ->
      s"""SELECT doc_id, source,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS quota_rank,
         |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) <= $maxPerSource AS kept
         |FROM documents""".stripMargin,

    // identical md5-prefix key, mod-shard ownership, in-shard rank
    "q_epoch_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(md5('1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      AS shuffle_key
        |  FROM documents)
        |SELECT doc_id, shuffle_key, shuffle_key % 4 AS shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY shuffle_key % 4
        |    ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
        |FROM k""".stripMargin,

    // same strip→blank-control→collapse→trim→lower chain; DuckDB
    // regexp_replace needs the 'g' flag (Spark replaces all by default)
    "q_text_normalize" ->
      """WITH c AS (
        |  SELECT doc_id, length(text) AS n_raw,
        |    lower(trim(regexp_replace(
        |      regexp_replace(
        |        regexp_replace(text, '<[^>]*>', ' ', 'g'),
        |        '[\x00-\x1F\x7F]', ' ', 'g'),
        |      '\s+', ' ', 'g'))) AS text_clean
        |  FROM documents)
        |SELECT doc_id, CAST(n_raw AS BIGINT) AS n_chars_raw, text_clean,
        |  CAST(length(text_clean) AS BIGINT) AS n_chars_clean
        |FROM c""".stripMargin,

    // bigram census: identical count-desc/gram-asc rank on both sides
    "q_heavy_hitters" ->
      s"""WITH t AS (
         |  SELECT source, string_split(text, ' ') AS w FROM documents),
         |bg AS (
         |  SELECT source,
         |    w[CAST(pos AS INT)] || ' ' || w[CAST(pos AS INT) + 1] AS gram
         |  FROM (SELECT source, w, CAST(unnest(range(1, len(w))) AS BIGINT) AS pos
         |        FROM t WHERE len(w) >= 2)),
         |c AS (
         |  SELECT source, gram, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM bg GROUP BY 1, 2)
         |SELECT source, rank, gram, n FROM (
         |  SELECT source, gram, n,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY n DESC, gram) AS BIGINT) AS rank
         |  FROM c)
         |WHERE rank <= $hhK""".stripMargin,

    // hashed linear scorer: same md5-prefix bucket + Knuth-hash
    // weight, summed per doc (Spark folds per-row; the group-by here
    // is value-identical integer arithmetic)
    "q_hash_classifier" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |sc AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |    CAST(SUM(
         |      ((CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % $clfDim)
         |        * 2654435761 + 1) % 2001 - 1000) AS BIGINT) AS score_micro
         |  FROM toks GROUP BY 1)
         |SELECT doc_id, n_tokens, score_micro, score_micro >= 0 AS accept
         |FROM sc""".stripMargin,

    // centroid-distance outliers: cnt²-scaled exact-integer squared
    // L2 (milli-unit quantization), per-label top-k by ssq desc
    "q_embed_outlier" ->
      s"""WITH vm AS (
         |  SELECT vec_id, label,
         |    list_transform(embedding::DOUBLE[],
         |      v -> CAST(round(v * 1000) AS BIGINT)) AS vm
         |  FROM embeddings),
         |p AS (
         |  SELECT vec_id, label, CAST(pos AS BIGINT) AS d,
         |    vm[CAST(pos AS INT) + 1] AS v
         |  FROM (SELECT vec_id, label, vm,
         |          unnest(range(0, len(vm))) AS pos FROM vm)),
         |st AS (
         |  SELECT label, d, CAST(SUM(v) AS BIGINT) AS s,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM p GROUP BY 1, 2),
         |ssq AS (
         |  SELECT p.vec_id, p.label,
         |    CAST(SUM((st.cnt * p.v - st.s) * (st.cnt * p.v - st.s))
         |      AS BIGINT) AS ssq
         |  FROM p JOIN st ON p.label = st.label AND p.d = st.d
         |  GROUP BY 1, 2)
         |SELECT label, rank, vec_id, ssq FROM (
         |  SELECT label, vec_id, ssq,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY label
         |      ORDER BY ssq DESC, vec_id) AS BIGINT) AS rank
         |  FROM ssq)
         |WHERE rank <= $outlierK""".stripMargin,

    "q_seq_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |r AS (
         |  SELECT *,
         |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) - n_tokens AS prior
         |  FROM t)
         |SELECT doc_id, source, n_tokens,
         |  CAST(prior // $packWindow AS BIGINT) AS pack_id,
         |  CAST(prior - (prior // $packWindow) * $packWindow AS BIGINT) AS pack_offset
         |FROM r""".stripMargin,

    // positional n-grams → shared-gram diagonals → run-length window;
    // the same three-stage shape as the Spark operator, so values are
    // engine-exact (all-integer arithmetic)
    "q_dup_spans" ->
      s"""$dupSpanCtes
         |SELECT doc_a, doc_b, start_a, start_b, span_tokens FROM spans""".stripMargin,

    // apply: merge spans per doc_b (gaps-and-islands), drop covered
    // tokens, rebuild text in position order; untouched docs rebuild
    // to their exact original string (split+join is lossless)
    "q_dup_trim" ->
      s"""$dupSpanCtes,
         |iv AS (
         |  SELECT doc_b AS doc_id, start_b AS s, start_b + span_tokens AS e
         |  FROM spans),
         |pm AS (
         |  SELECT *, MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
         |  FROM iv),
         |isl AS (
         |  SELECT *, SUM(CASE WHEN s > COALESCE(prev_max, -1) THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY doc_id ORDER BY s, e) AS g
         |  FROM pm),
         |m AS (SELECT doc_id, g, MIN(s) AS s, MAX(e) AS e FROM isl GROUP BY 1, 2),
         |removed AS (
         |  SELECT doc_id, CAST(SUM(e - s) AS BIGINT) AS n_tokens_removed
         |  FROM m GROUP BY doc_id),
         |tokpos AS (
         |  SELECT doc_id, w, CAST(unnest(range(0, len(w))) AS BIGINT) AS pos
         |  FROM toks),
         |tok AS (SELECT doc_id, pos, w[pos + 1] AS tok FROM tokpos),
         |kept AS (
         |  SELECT t.doc_id, t.pos, t.tok
         |  FROM tok t LEFT JOIN m
         |    ON m.doc_id = t.doc_id AND t.pos >= m.s AND t.pos < m.e
         |  WHERE m.doc_id IS NULL),
         |rebuilt AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(r.n_tokens_removed, 0) AS n_tokens_removed,
         |  CASE WHEN r.doc_id IS NULL THEN d.text ELSE COALESCE(b.text, '') END AS text
         |FROM documents d
         |LEFT JOIN removed r ON r.doc_id = d.doc_id
         |LEFT JOIN rebuilt b ON b.doc_id = d.doc_id""".stripMargin,

    // discrete quantiles: k-th smallest with k = ceil(p*n) — a data
    // value, no interpolation, so bit-stable in any engine
    "q_token_quantiles" ->
      """WITH t AS (
        |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT source, n_tokens,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tokens) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM t)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN n_tokens END) AS p50_tokens,
        |  MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN n_tokens END) AS p90_tokens,
        |  MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN n_tokens END) AS p99_tokens
        |FROM r GROUP BY source""".stripMargin,

    // window count 1 + max(0, ceil((n-chunk)/stride)): the last
    // window reaches the doc end; list slicing clamps identically in
    // both engines
    "q_chunk_overlap" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS w,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, w, n,
         |    CAST(unnest(range(0, 1 + GREATEST(0, CAST(CEIL(
         |      (n - $chunkTok) / CAST($chunkStride AS DOUBLE)) AS BIGINT))))
         |      AS BIGINT) AS chunk_idx
         |  FROM t)
         |SELECT doc_id, chunk_idx,
         |  chunk_idx * $chunkStride AS start_tok,
         |  LEAST($chunkTok, n - chunk_idx * $chunkStride) AS n_tokens,
         |  array_to_string(
         |    w[chunk_idx * $chunkStride + 1 : chunk_idx * $chunkStride + $chunkTok],
         |    ' ') AS chunk_text
         |FROM c""".stripMargin,

    // d2 = |x|² - 2·x·c + |c|² with the SAME left-assoc shape and
    // left-to-right double folds as the Spark side (VectorDot); the
    // mean recompute sums exact micro units, so the hash is stable
    // under any execution order in either engine.
    "q_kmeans_step" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |c AS (SELECT vec_id AS cid, emb AS c_emb, list_dot_product(emb, emb) AS cc
         |      FROM e WHERE vec_id < $kmeansK),
         |scored AS (
         |  SELECT e.vec_id, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_dot_product(e.emb, e.emb)
         |        - 2.0 * list_dot_product(e.emb, c.c_emb) + c.cc ASC,
         |      c.cid ASC) AS rn
         |  FROM e CROSS JOIN c),
         |cells AS (SELECT vec_id, cid AS cell FROM scored WHERE rn = 1),
         |x AS (
         |  SELECT cells.cell, unnest(e.emb) AS val,
         |    generate_subscripts(e.emb, 1) - 1 AS dim
         |  FROM e JOIN cells USING (vec_id))
         |SELECT cell, CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
         |  CAST(SUM(CAST(round(val * 1000000.0) AS BIGINT)) AS DOUBLE)
         |    / COUNT(*) / 1000000.0 AS mean_val
         |FROM x GROUP BY 1, 2""".stripMargin,

    "q_semantic_dedup" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |c AS (SELECT vec_id AS cid, emb AS c_emb,
         |        list_dot_product(emb, emb) AS cc
         |      FROM e WHERE vec_id < $kmeansK),
         |scored AS (
         |  SELECT e.vec_id, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_dot_product(e.emb, e.emb)
         |        - 2.0 * list_dot_product(e.emb, c.c_emb) + c.cc ASC,
         |      c.cid ASC) AS rn
         |  FROM e CROSS JOIN c),
         |cells AS (
         |  SELECT e.vec_id, e.emb, scored.cid AS cell,
         |    sqrt(list_dot_product(e.emb, e.emb)) AS nrm
         |  FROM e JOIN scored ON e.vec_id = scored.vec_id AND scored.rn = 1),
         |dropped AS (
         |  SELECT DISTINCT b.vec_id AS v
         |  FROM cells a JOIN cells b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6)
         |    >= $semDedupThreshold)
         |SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
         |  d.v IS NULL AS kept
         |FROM cells c LEFT JOIN dropped d ON c.vec_id = d.v""".stripMargin,

    "q_pq_codes" -> {
      val sub = 64 / pqM
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |cb AS (SELECT vec_id AS cid, emb AS c_emb FROM e WHERE vec_id < $pqKsub),
         |subs AS (SELECT unnest(range($pqM)) AS sub),
         |scored AS (
         |  SELECT e.vec_id, subs.sub, cb.cid,
         |    list_dot_product(list_slice(e.emb, subs.sub * $sub + 1, subs.sub * $sub + $sub),
         |                     list_slice(e.emb, subs.sub * $sub + 1, subs.sub * $sub + $sub))
         |      - 2.0 * list_dot_product(list_slice(e.emb, subs.sub * $sub + 1, subs.sub * $sub + $sub),
         |                               list_slice(cb.c_emb, subs.sub * $sub + 1, subs.sub * $sub + $sub))
         |      + list_dot_product(list_slice(cb.c_emb, subs.sub * $sub + 1, subs.sub * $sub + $sub),
         |                         list_slice(cb.c_emb, subs.sub * $sub + 1, subs.sub * $sub + $sub)) AS d2
         |  FROM e CROSS JOIN subs CROSS JOIN cb)
         |SELECT vec_id, CAST(sub AS BIGINT) AS sub, cid AS code FROM (
         |  SELECT vec_id, sub, cid,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |      ORDER BY d2 ASC, cid ASC) AS rn
         |  FROM scored)
         |WHERE rn = 1""".stripMargin
    },

    // ADC search over PQ codes: lookup tables are micro-unit longs
    // (entries reproduce the Spark/Scala fold bit-for-bit), candidate
    // distance = exact integer sum of m table entries
    "q_pq_adc" ->
      s"""WITH $pqCtes,
         |scored AS (
         |  SELECT l.query_id, c.vec_id,
         |    CAST(SUM(l.d2_micro) AS BIGINT) AS adc_micro
         |  FROM codes c JOIN luts l ON c.sub = l.sub AND c.code = l.cid
         |  WHERE c.vec_id <> l.query_id
         |  GROUP BY 1, 2)
         |$adcRankSql""".stripMargin,

    // IVF-PQ: same codes/tables, candidates restricted to the
    // query's coarse cell before ADC ranking
    "q_ivfpq" ->
      s"""WITH $pqCtes,
         |cents AS (SELECT vec_id AS ccid, emb AS ct_emb,
         |            list_dot_product(emb, emb) AS cc
         |          FROM e WHERE vec_id < $kmeansK),
         |cells AS (
         |  SELECT vec_id, ccid AS cell FROM (
         |    SELECT e.vec_id, cents.ccid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |        list_dot_product(e.emb, e.emb)
         |          - 2.0 * list_dot_product(e.emb, cents.ct_emb) + cents.cc ASC,
         |        cents.ccid ASC) AS rn
         |    FROM e CROSS JOIN cents)
         |  WHERE rn = 1),
         |scored AS (
         |  SELECT l.query_id, c.vec_id,
         |    CAST(SUM(l.d2_micro) AS BIGINT) AS adc_micro
         |  FROM codes c JOIN luts l ON c.sub = l.sub AND c.code = l.cid
         |  JOIN cells cand ON cand.vec_id = c.vec_id
         |  JOIN cells qc ON qc.vec_id = l.query_id
         |  WHERE c.vec_id <> l.query_id AND cand.cell = qc.cell
         |  GROUP BY 1, 2)
         |$adcRankSql""".stripMargin,

    // per-token log-probs round to exact micro units BEFORE the
    // per-doc sum (mirrors TextOps.lmScore) — ln() runs once per
    // vocab entry, and both engines' libm agree well inside the
    // 1e-6 granularity
    "q_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |freq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
        |tot AS (SELECT SUM(cnt) AS total FROM freq),
        |lp AS (
        |  SELECT tok,
        |    CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
        |      * 1000000.0) AS BIGINT) AS logp_micro
        |  FROM freq CROSS JOIN tot)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(logp_micro) AS BIGINT) AS sum_logp_micro,
        |  CAST(SUM(logp_micro) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_logp
        |FROM toks JOIN lp USING (tok)
        |GROUP BY doc_id""".stripMargin,

    // the same JM interpolation with the Scala-rendered λ/(1−λ)
    // literals (exact double round-trip) and micro rounding before
    // the doc sum; p_ML denominators are bigram-context counts
    "q_lm_bigram" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    w[CAST(pos AS INT)] AS prev, w[CAST(pos AS INT) + 1] AS cur
         |  FROM (SELECT doc_id, w, CAST(unnest(range(1, len(w))) AS BIGINT) AS pos
         |        FROM t WHERE len(w) >= 2)),
         |cb AS (SELECT prev, cur, COUNT(*) AS c_big FROM bg GROUP BY 1, 2),
         |cctx AS (SELECT prev, COUNT(*) AS c_ctx FROM bg GROUP BY 1),
         |uni AS (SELECT tok, COUNT(*) AS c_uni
         |        FROM (SELECT unnest(w) AS tok FROM t) GROUP BY 1),
         |tot AS (SELECT SUM(c_uni) AS total FROM uni),
         |probs AS (
         |  SELECT cb.prev, cb.cur,
         |    CAST(round(ln(
         |      $lmLambda * (CAST(c_big AS DOUBLE) / CAST(c_ctx AS DOUBLE)) +
         |      ${1.0 - lmLambda} * (CAST(c_uni AS DOUBLE) / CAST(total AS DOUBLE)))
         |      * 1000000.0) AS BIGINT) AS logp_micro
         |  FROM cb
         |  JOIN cctx USING (prev)
         |  JOIN uni ON uni.tok = cb.cur
         |  CROSS JOIN tot)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |  CAST(SUM(logp_micro) AS BIGINT) AS sum_logp_micro,
         |  CAST(SUM(logp_micro) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_logp
         |FROM bg JOIN probs USING (prev, cur)
         |GROUP BY doc_id""".stripMargin,

    // feature-hashing vectorizer: bucket = md5(token) % dim, weight =
    // Σ tf·idf_micro per bucket — exact integer arithmetic after the
    // once-per-vocab idf rounding
    "q_hashed_vectors" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |idf AS (
         |  SELECT tok,
         |    CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
         |      * 1000000.0) AS BIGINT) AS idf_micro,
         |    CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % $hashedDim AS dim_idx
         |  FROM dfq CROSS JOIN n)
         |SELECT tf.doc_id, idf.dim_idx,
         |  CAST(SUM(tf.tf * idf.idf_micro) AS BIGINT) AS weight_micro
         |FROM tf JOIN idf USING (tok)
         |GROUP BY 1, 2""".stripMargin,

    // DSIR hashed-LM importance scores: per-bucket smoothed log-ratio
    // (micro-rounded once per bucket), then exact integer per-doc sums
    "q_dsir" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |b AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % $dsirDim AS b
         |  FROM toks),
         |tb AS (SELECT b, COUNT(*) AS ct FROM b WHERE doc_id % 50 = 0 GROUP BY 1),
         |rb AS (SELECT b, COUNT(*) AS cr FROM b GROUP BY 1),
         |tt AS (SELECT SUM(ct) AS t_total FROM tb),
         |rt AS (SELECT SUM(cr) AS r_total FROM rb),
         |ratio AS (
         |  SELECT rb.b,
         |    CAST(round((ln(CAST(COALESCE(tb.ct, 0) + 1 AS DOUBLE)
         |        / CAST(t_total + $dsirDim AS DOUBLE))
         |      - ln(CAST(rb.cr + 1 AS DOUBLE)
         |        / CAST(r_total + $dsirDim AS DOUBLE))) * 1000000.0) AS BIGINT)
         |      AS logr_micro
         |  FROM rb LEFT JOIN tb USING (b) CROSS JOIN tt CROSS JOIN rt)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM(logr_micro) AS BIGINT) AS sum_logw_micro,
         |  CAST(SUM(logr_micro) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_logw
         |FROM b JOIN ratio USING (b)
         |GROUP BY doc_id""".stripMargin,

    // same exact semantics as q_dedup_incremental (the Bloom filter
    // in the Spark plan is a pruner, never changes the answer)
    "q_dedup_bloom" ->
      """WITH newd AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
        |old AS (SELECT DISTINCT md5(text) AS seen FROM documents WHERE doc_id % 3 = 0),
        |fresh AS (
        |  SELECT doc_id, source, md5(text) AS content_md5 FROM newd
        |  WHERE md5(text) NOT IN (SELECT seen FROM old))
        |SELECT doc_id, source, content_md5 FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY content_md5
        |    ORDER BY doc_id) AS rn FROM fresh)
        |WHERE rn = 1""".stripMargin,

    "q_dedup_incremental" ->
      """WITH newd AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
        |old AS (SELECT DISTINCT md5(text) AS seen FROM documents WHERE doc_id % 2 = 0),
        |fresh AS (
        |  SELECT doc_id, source, md5(text) AS content_md5 FROM newd
        |  WHERE md5(text) NOT IN (SELECT seen FROM old))
        |SELECT doc_id, source, content_md5 FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY content_md5
        |    ORDER BY doc_id) AS rn FROM fresh)
        |WHERE rn = 1""".stripMargin,

    // text ANN: dense micro-weight vectors (exact integer-valued
    // doubles) through the standard cosine top-k oracle pattern
    "q_text_ann" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |idf AS (
         |  SELECT tok,
         |    CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
         |      * 1000000.0) AS BIGINT) AS idf_micro,
         |    CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % $hashedDim AS dim_idx
         |  FROM dfq CROSS JOIN n),
         |w AS (
         |  SELECT tf.doc_id, idf.dim_idx,
         |    CAST(SUM(tf.tf * idf.idf_micro) AS BIGINT) AS w
         |  FROM tf JOIN idf USING (tok) GROUP BY 1, 2),
         |dense AS (
         |  SELECT d.doc_id, list(CAST(coalesce(w.w, 0) AS DOUBLE) ORDER BY r.d) AS emb
         |  FROM (SELECT DISTINCT doc_id FROM documents) d
         |  CROSS JOIN (SELECT unnest(range($hashedDim)) AS d) r
         |  LEFT JOIN w ON w.doc_id = d.doc_id AND w.dim_idx = r.d
         |  GROUP BY d.doc_id),
         |wc AS (
         |  SELECT doc_id AS vec_id, emb,
         |    sqrt(list_dot_product(emb, emb)) AS nn FROM dense),
         |q AS (
         |  SELECT vec_id AS query_id, emb AS q_emb, nn AS qn
         |  FROM wc WHERE vec_id < $annQueries),
         |scored AS (
         |  SELECT q.query_id, wc.vec_id,
         |    list_dot_product(q.q_emb, wc.emb) / (q.qn * wc.nn) AS cos
         |  FROM wc CROSS JOIN q WHERE wc.vec_id <> q.query_id)
         |SELECT query_id, rank, neighbor_id, cos_sim FROM (
         |  SELECT query_id, vec_id AS neighbor_id, round(cos, 6) AS cos_sim,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
         |  FROM scored)
         |WHERE rank <= $annK""".stripMargin,

    // chunk keeper = min (doc_id, chunk_idx) per identical chunk;
    // reassembly is order-by-index string_agg on both sides
    "q_chunk_dedup" -> {
      val w = chunkWindow
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |chunks AS (
         |  SELECT doc_id, unnest(range(CAST(ceil(len(w) / $w.0) AS BIGINT))) AS chunk_idx, w
         |  FROM toks),
         |c2 AS (
         |  SELECT doc_id, chunk_idx,
         |    array_to_string(w[chunk_idx * $w + 1 : chunk_idx * $w + $w], ' ') AS chunk
         |  FROM chunks),
         |marked AS (
         |  SELECT doc_id, chunk_idx, chunk,
         |    ROW_NUMBER() OVER (PARTITION BY md5(chunk)
         |      ORDER BY doc_id, chunk_idx) = 1 AS kept
         |  FROM c2)
         |SELECT doc_id, COUNT(*) AS n_chunks,
         |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  COALESCE(string_agg(CASE WHEN kept THEN chunk END, ' '
         |    ORDER BY chunk_idx), '') AS cleaned_text
         |FROM marked GROUP BY doc_id""".stripMargin
    },

    // idf rounds to micro units once per vocab entry; score = tf ×
    // idf_micro is pure integer arithmetic, so ranking is exact
    "q_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |idf AS (
         |  SELECT tok,
         |    CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
         |      * 1000000.0) AS BIGINT) AS idf_micro
         |  FROM dfq CROSS JOIN n),
         |scored AS (
         |  SELECT tf.doc_id, tf.tok, tf.tf,
         |    tf.tf * idf.idf_micro AS score_micro
         |  FROM tf JOIN idf USING (tok))
         |SELECT doc_id, rank, tok AS term, tf, score_micro FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
         |    ORDER BY score_micro DESC, tok ASC) AS BIGINT) AS rank
         |  FROM scored)
         |WHERE rank <= $tfidfK""".stripMargin,

    // pow weights round to micro units BEFORE the cross-source sum
    // (mirrors Sampling.temperatureMix); every arithmetic step keeps
    // the same left-assoc shape so the fractions compare bit-exact
    "q_temperature_mix" ->
      s"""WITH sizes AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
         |pw AS (
         |  SELECT source, n,
         |    CAST(round(pow(CAST(n AS DOUBLE), $mixAlpha) * 1000000.0) AS BIGINT) AS pwm
         |  FROM sizes),
         |tot AS (
         |  SELECT CAST(SUM(pwm) AS BIGINT) AS sumpw,
         |    CAST(SUM(n) AS BIGINT) AS total FROM pw),
         |fr AS (
         |  SELECT source,
         |    LEAST(1.0, CAST(pwm AS DOUBLE) / CAST(sumpw AS DOUBLE)
         |      * ($mixTargetFrac * CAST(total AS DOUBLE))
         |      / CAST(n AS DOUBLE)) AS mix_frac
         |  FROM pw CROSS JOIN tot)
         |SELECT d.doc_id, d.source, fr.mix_frac,
         |  CAST(('0x' || substring(md5(d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
         |    < CAST(floor(fr.mix_frac * 10000) AS BIGINT) AS sampled
         |FROM documents d JOIN fr USING (source)""".stripMargin,

    "q_stratified" -> {
      val cases = stratifiedFracs.map { case (src, f) =>
        s"WHEN '$src' THEN ${(f * 10000).toLong}"
      }.mkString(" ")
      val dflt = (stratifiedDefault * 10000).toLong
      s"""SELECT doc_id, source,
         |  CAST(('0x' || substring(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS sample_bucket,
         |  CAST(('0x' || substring(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
         |    < CASE source $cases ELSE $dflt END AS sampled
         |FROM documents""".stripMargin
    },

    "q_text_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id,
        |  CAST(list_max(list_transform(list_distinct(w),
        |    t -> len(list_filter(w, x -> x = t)))) AS DOUBLE)
        |    / CAST(len(w) AS DOUBLE) AS top_token_ratio,
        |  CASE WHEN len(w) >= 2 THEN
        |    1.0 - CAST(len(list_distinct(list_transform(
        |        generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i + 1]))) AS DOUBLE)
        |      / CAST(len(w) - 1 AS DOUBLE)
        |  ELSE 0.0 END AS dup_bigram_ratio
        |FROM toks""".stripMargin,

    "q_dedup_minhash" ->
      s"WITH $minhashSigSql\nSELECT * FROM sigb",

    "q_dedup_minhash_pairs" -> {
      val joins = (0 until Dedup.NumBands).map { b =>
        s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           |FROM sigb a JOIN sigb b ON a.band$b = b.band$b AND a.doc_id < b.doc_id""".stripMargin
      }.mkString("\nUNION\n")
      s"WITH $minhashSigSql\n$joins"
    },

    // the probe is a band-join of new against old; UNION dedups the
    // multi-band collisions the Spark side suppresses at emission
    "q_dedup_index" -> {
      val joins = (0 until Dedup.NumBands).map { b =>
        s"""SELECT n.doc_id AS doc_new, o.doc_id AS doc_old
           |FROM newsig n JOIN oldsig o ON n.band$b = o.band$b""".stripMargin
      }.mkString("\nUNION\n")
      s"""WITH $minhashSigSql,
         |oldsig AS (SELECT * FROM sigb WHERE doc_id % 3 = 0),
         |newsig AS (SELECT * FROM sigb WHERE doc_id % 3 <> 0)
         |$joins""".stripMargin
    },

    "q_dedup_simhash" -> {
      val sums = (0 until 16).map { j =>
        s"CAST(SUM(CASE WHEN substring(md5(tok), ${j + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS BIGINT) AS s$j"
      }.mkString(",\n    ")
      val hash = (0 until 16)
        .map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END")
        .mkString(" + ")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
         |), sums AS (
         |  SELECT doc_id,
         |    $sums
         |  FROM toks GROUP BY doc_id
         |)
         |SELECT doc_id, CAST($hash AS BIGINT) AS simhash FROM sums""".stripMargin
    },

    "q_dedup_clusters" ->
      s"""WITH RECURSIVE dset AS (
         |  SELECT * FROM documents WHERE doc_id < 500
         |), toks AS (
         |  SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS tok
         |  FROM dset
         |), sizes AS (
         |  SELECT doc_id, CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS nd
         |  FROM dset
         |), inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
         |  FROM toks a JOIN toks b
         |    ON a.source = b.source AND a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), pairs AS (
         |  SELECT doc_a, doc_b
         |  FROM inter
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE CAST(n_inter AS DOUBLE) / CAST(sa.nd + sb.nd - n_inter AS DOUBLE) >= $clusterThreshold
         |), edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION
         |  SELECT doc_b, doc_a FROM pairs
         |), reach AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
         |)
         |SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster FROM reach GROUP BY a""".stripMargin,

    "q_dedup_fuzzy" ->
      s"""WITH RECURSIVE dset AS (
         |  SELECT * FROM documents WHERE doc_id < 500
         |), toks AS (
         |  SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS tok
         |  FROM dset
         |), sizes AS (
         |  SELECT doc_id, CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS nd
         |  FROM dset
         |), inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
         |  FROM toks a JOIN toks b
         |    ON a.source = b.source AND a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), pairs AS (
         |  SELECT doc_a, doc_b
         |  FROM inter
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE CAST(n_inter AS DOUBLE) / CAST(sa.nd + sb.nd - n_inter AS DOUBLE) >= $clusterThreshold
         |), edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION
         |  SELECT doc_b, doc_a FROM pairs
         |), reach AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
         |), labels AS (
         |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster FROM reach GROUP BY a
         |)
         |SELECT d.doc_id, d.source,
         |  COALESCE(l.cluster, d.doc_id) AS cluster,
         |  CAST(COALESCE(l.cluster, d.doc_id) = d.doc_id AS BIGINT) AS kept
         |FROM dset d LEFT JOIN labels l ON l.doc_id = d.doc_id""".stripMargin,

    "q_dedup_ngram" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS tok
         |  FROM documents
         |), sizes AS (
         |  SELECT doc_id, CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS nd
         |  FROM documents
         |), inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
         |  FROM toks a JOIN toks b
         |    ON a.source = b.source AND a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b, n_inter, sa.nd AS nd_a, sb.nd AS nd_b,
         |  CAST(n_inter AS DOUBLE) / CAST(sa.nd + sb.nd - n_inter AS DOUBLE) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.nd + sb.nd - n_inter AS DOUBLE) >= $jaccardThreshold""".stripMargin,

    "q_dedup_verified" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS tok
         |  FROM documents
         |), sizes AS (
         |  SELECT doc_id, CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS nd
         |  FROM documents
         |), inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
         |  FROM toks a JOIN toks b
         |    ON a.source = b.source AND a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), cand AS (
         |  SELECT doc_a, doc_b,
         |    CAST(n_inter AS DOUBLE) / CAST(sa.nd + sb.nd - n_inter AS DOUBLE) AS j
         |  FROM inter
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE CAST(n_inter AS DOUBLE) / CAST(sa.nd + sb.nd - n_inter AS DOUBLE) >= $jaccardThreshold
         |), budget AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT doc_a, doc_b,
         |      ROW_NUMBER() OVER (PARTITION BY doc_a ORDER BY j DESC, doc_b) AS r
         |    FROM cand) WHERE r <= 3
         |), capped AS (
         |  SELECT doc_id, substring(text, 1, 256) AS t FROM documents
         |)
         |SELECT doc_a, doc_b,
         |  CAST(levenshtein(ca.t, cb.t) AS BIGINT) AS edit_dist,
         |  CAST(levenshtein(ca.t, cb.t) AS BIGINT) * 1000000
         |    // greatest(length(ca.t), length(cb.t), 1) AS edit_ratio_micro
         |FROM budget
         |JOIN capped ca ON ca.doc_id = doc_a
         |JOIN capped cb ON cb.doc_id = doc_b
         |WHERE CAST(levenshtein(ca.t, cb.t) AS BIGINT) * 1000000
         |    // greatest(length(ca.t), length(cb.t), 1) <= 600000""".stripMargin,

    "q_embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb,
        |    CAST(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0
        |      AS DOUBLE) AS scale
        |  FROM embeddings),
        |c AS (
        |  SELECT vec_id, scale,
        |    CASE WHEN scale = 0 THEN list_transform(emb, x -> 0)
        |         ELSE list_transform(emb, x -> CAST(round(x / scale) AS INT)) END AS codes
        |  FROM e)
        |SELECT vec_id, scale,
        |  CAST(unnest(generate_series(0, len(codes) - 1)) AS BIGINT) AS pos,
        |  CAST(unnest(codes) AS INT) AS code
        |FROM c""".stripMargin,

    "q_ann_topk" ->
      s"""WITH $annScoredSql
         |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_sim FROM (
         |  SELECT query_id, vec_id AS neighbor_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
         |  FROM scored)
         |WHERE rank <= $annK""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |p AS (SELECT vec_id AS plane_id, emb AS pe FROM e WHERE vec_id < $lshPlanes),
         |b AS (
         |  SELECT e.vec_id,
         |    CAST(SUM(CASE WHEN list_dot_product(e.emb, p.pe) > 0
         |      THEN (1 << plane_id) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM e CROSS JOIN p GROUP BY 1
         |), wb AS (
         |  SELECT e.vec_id, e.emb, b.bucket FROM e JOIN b USING (vec_id)
         |)
         |SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b, a.bucket,
         |  round(list_dot_product(a.emb, b2.emb) /
         |    (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b2.emb, b2.emb))), 6) AS cos_sim
         |FROM wb a JOIN wb b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
         |WHERE round(list_dot_product(a.emb, b2.emb) /
         |    (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b2.emb, b2.emb))), 6) >= $lshThreshold""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  hex(encode(substring(text, 1, 4))) AS magic,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        |  CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS height,
        |  CAST(octet_length(encode(text)) // 1000 + 1 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,

    // literal query set renders from the same Seq the Spark side uses
    "q_bm25" -> {
      val values = bm25Queries
        .map { case (id, t) => s"($id, '$t')" }.mkString(", ")
      s"""WITH queries AS (
         |  SELECT CAST(query_id AS BIGINT) AS query_id, qtext
         |  FROM (VALUES $values) v(query_id, qtext)),
         |${bm25OracleCtes(excludeSelf = false)}
         |SELECT query_id, rank, doc_id, score_milli FROM (
         |  SELECT query_id, doc_id, score_milli,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rank
         |  FROM lexscore)
         |WHERE rank <= $annK""".stripMargin
    },

    // RRF fusion: lexical chain shares the bm25 CTEs (doc-as-query);
    // vector chain is the q_text_ann hashed-cosine pipeline; fusion
    // is pure integer floor division so any engine agrees exactly
    "q_hybrid_rrf" ->
      s"""WITH queries AS (
         |  SELECT doc_id AS query_id, text AS qtext
         |  FROM documents WHERE doc_id < $annQueries),
         |${bm25OracleCtes(excludeSelf = true)},
         |$hashedCosineCtes,
         |ltop AS (
         |  SELECT query_id, doc_id, rank FROM (
         |    SELECT query_id, doc_id,
         |      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rank
         |    FROM lexscore)
         |  WHERE rank <= $annK),
         |fused AS (
         |  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
         |    COALESCE(l.doc_id, v.doc_id) AS doc_id,
         |    CAST(COALESCE(1000000 // (${Retrieval.rrfK} + l.rank), 0)
         |      + COALESCE(1000000 // (${Retrieval.rrfK} + v.rank), 0) AS BIGINT) AS rrf_ppm
         |  FROM ltop l FULL OUTER JOIN vtop v
         |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
         |SELECT query_id, rank, doc_id, rrf_ppm FROM (
         |  SELECT query_id, doc_id, rrf_ppm,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rrf_ppm DESC, doc_id) AS BIGINT) AS rank
         |  FROM fused)
         |WHERE rank <= $annK""".stripMargin,

    // discounts and idcg are the SAME driver-computed literals the
    // Spark plan inlines — the log2 never runs in either engine
    "q_retrieval_ndcg" -> {
      val disc = Retrieval.ndcgDiscountsPpm(annK)
      val values = disc.zipWithIndex
        .map { case (dp, i) => s"(${i + 1}, $dp)" }.mkString(", ")
      val idcg = (1 to annK).map(i => (annK + 1 - i).toLong * disc(i - 1)).sum
      s"""WITH queries AS (
         |  SELECT doc_id AS query_id, text AS qtext
         |  FROM documents WHERE doc_id < $annQueries),
         |${bm25OracleCtes(excludeSelf = true)},
         |$hashedCosineCtes,
         |ltop AS (
         |  SELECT query_id, doc_id, rank FROM (
         |    SELECT query_id, doc_id,
         |      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rank
         |    FROM lexscore)
         |  WHERE rank <= $annK),
         |disc AS (
         |  SELECT CAST(rank AS BIGINT) AS rank, CAST(disc_ppm AS BIGINT) AS disc_ppm
         |  FROM (VALUES $values) d(rank, disc_ppm)),
         |ndcg_scored AS (
         |  SELECT l.query_id,
         |    COALESCE(${annK + 1} - v.rank, 0) * disc.disc_ppm AS contrib
         |  FROM ltop l
         |  JOIN disc ON disc.rank = l.rank
         |  LEFT JOIN vtop v ON v.query_id = l.query_id AND v.doc_id = l.doc_id)
         |SELECT query_id, CAST(SUM(contrib) AS BIGINT) AS dcg_ppm,
         |  CAST($idcg AS BIGINT) AS idcg_ppm,
         |  CAST((CAST(SUM(contrib) AS BIGINT) * 1000000) // $idcg AS BIGINT) AS ndcg_ppm
         |FROM ndcg_scored GROUP BY query_id""".stripMargin
    },

    // blocker-distance characterization of rightmost-window-min,
    // lag/lead chains unrolled to the same fixed depth as the
    // operator's when-chains; NULL lag/lead falls through like the
    // operator's explicit bounds checks
    "q_winnow" ->
      s"""WITH $winnowOracleCtes
         |SELECT doc_id, pos, h AS fp FROM d
         |WHERE LEAST(ldist - 1, pos) + LEAST(rdist - 1, maxpos - pos) + 1 >= $winnowWindow""".stripMargin,

    // the MOSS report off the same selection chain: shared-fp join,
    // fp counted once per doc
    "q_winnow_pairs" ->
      s"""WITH $winnowOracleCtes,
         |sel AS (
         |  SELECT DISTINCT doc_id, h AS fp FROM d
         |  WHERE LEAST(ldist - 1, pos) + LEAST(rdist - 1, maxpos - pos) + 1 >= $winnowWindow)
         |SELECT doc_a, doc_b, n_shared FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |WHERE n_shared >= $winnowMinShared""".stripMargin,

    "q_containment" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
         |p AS (
         |  SELECT doc_id, source,
         |    CAST(unnest(range(0, len(w) - $containShingle + 1)) AS BIGINT) AS pos, w
         |  FROM t WHERE len(w) >= $containShingle),
         |g AS (
         |  SELECT DISTINCT doc_id, source,
         |    array_to_string(w[pos + 1:pos + $containShingle], ' ') AS sh
         |  FROM p),
         |sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nd FROM g GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(COUNT(*) AS BIGINT) AS n_inter
         |  FROM g a JOIN g b
         |    ON a.source = b.source AND a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_inter, nd_a, nd_b, containment,
         |  CASE WHEN nd_a <= nd_b THEN doc_a ELSE doc_b END AS contained_doc
         |FROM (
         |  SELECT doc_a, doc_b, n_inter, sa.nd AS nd_a, sb.nd AS nd_b,
         |    CAST(n_inter AS DOUBLE) / CAST(LEAST(sa.nd, sb.nd) AS DOUBLE) AS containment
         |  FROM inter
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  JOIN sizes sb ON sb.doc_id = doc_b)
         |WHERE containment >= $containThreshold""".stripMargin,

    "q_group_sample" ->
      s"""SELECT doc_id, source, rank FROM (
         |  SELECT doc_id, source,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id)
         |      AS BIGINT) AS rank
         |  FROM documents)
         |WHERE rank <= $groupSampleK""".stripMargin,

    // expected counts/chi2 mirror TextOps.corpusDrift shape-for-shape
    "q_corpus_drift" ->
      s"""WITH ta AS (
         |  SELECT unnest(string_split(text, ' ')) AS tok
         |  FROM documents WHERE doc_id % 2 = 0),
         |tb AS (
         |  SELECT unnest(string_split(text, ' ')) AS tok
         |  FROM documents WHERE doc_id % 2 = 1),
         |ca AS (SELECT tok, COUNT(*) AS c_a FROM ta GROUP BY 1),
         |cb AS (SELECT tok, COUNT(*) AS c_b FROM tb GROUP BY 1),
         |j AS (
         |  SELECT COALESCE(ca.tok, cb.tok) AS tok,
         |    CAST(COALESCE(c_a, 0) AS BIGINT) AS c_a,
         |    CAST(COALESCE(c_b, 0) AS BIGINT) AS c_b
         |  FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok),
         |tot AS (
         |  SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
         |    CAST(SUM(c_b) AS BIGINT) AS n_b FROM j),
         |e AS (
         |  SELECT tok, c_a, c_b,
         |    CAST(n_a AS DOUBLE) * (CAST(c_a + c_b AS DOUBLE)
         |      / CAST(n_a + n_b AS DOUBLE)) AS ea,
         |    CAST(n_b AS DOUBLE) * (CAST(c_a + c_b AS DOUBLE)
         |      / CAST(n_a + n_b AS DOUBLE)) AS eb
         |  FROM j CROSS JOIN tot),
         |d AS (
         |  SELECT tok, c_a, c_b,
         |    CAST(round((((CAST(c_a AS DOUBLE) - ea) * (CAST(c_a AS DOUBLE) - ea) / ea)
         |      + ((CAST(c_b AS DOUBLE) - eb) * (CAST(c_b AS DOUBLE) - eb) / eb))
         |      * 1000000.0) AS BIGINT) AS drift_micro
         |  FROM e)
         |SELECT rank, tok, c_a, c_b, drift_micro FROM (
         |  SELECT tok, c_a, c_b, drift_micro,
         |    CAST(ROW_NUMBER() OVER (ORDER BY drift_micro DESC, tok) AS BIGINT) AS rank
         |  FROM d)
         |WHERE rank <= $driftK""".stripMargin
  )
}
