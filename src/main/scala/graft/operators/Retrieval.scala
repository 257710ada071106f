package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical retrieval (BM25) and hybrid rank fusion over the documents
  * table — the search/serving side of a curation or RAG pipeline.
  * The reference's closest surface is its expression-filter predicate
  * evaluation (pkg/filter/expr_filter.go:40); full-corpus ranked
  * retrieval is one of the beyond-reference data-pipeline operators
  * (SURVEY §7.2), complementing the vector-ANN stack
  * ([[Similarity]]) with the sparse/lexical ranker and the
  * reciprocal-rank-fusion combiner used by hybrid search systems.
  *
  * Engine portability: idf = ln(N/df) rounds ONCE per vocab entry to
  * micro units (the [[TextOps.tfidfTopTerms]] pattern); each
  * (query, doc, term) BM25 contribution is then a fixed-shape IEEE
  * double expression over exact integers that rounds ONCE to milli
  * units; per-doc scores are exact integer sums, so ranking is
  * deterministic across engines. RRF is integer-only end to end.
  */
object Retrieval {

  /** Robertson/Sparck-Jones BM25 constants. Rendered with these exact
    * decimal strings in both the Spark literals and the DuckDB
    * oracle so the two engines fold identical doubles. k1+1 is kept
    * as its own literal ("2.2") — computing 1.2+1.0 in one engine
    * and parsing "2.2" in the other would NOT give the same double.
    */
  val k1 = "1.2"
  val k1Plus1 = "2.2"
  val b = "0.75"
  val oneMinusB = "0.25"

  /** RRF dampening constant (the k=60 of Cormack et al.). */
  val rrfK = 60L

  /** BM25 top-k retrieval. `queries` must have (query_id: long,
    * qtext: string); query terms are deduplicated (unweighted-query
    * BM25). Documents sharing no term with a query simply never
    * appear — BM25 gives them score 0.
    *
    * Shape at scale: tf/dl are one shuffle over the token stream;
    * idf and corpus stats are vocab-sized / single-row broadcasts;
    * the query-term join is a broadcast of |queries|×|terms| rows.
    * The only corpus-sized shuffle after the token agg is the
    * (query_id, doc_id) score agg, which is bounded by matching
    * postings, not by the cross product.
    */
  def bm25TopK(docs0: DataFrame, queries: DataFrame, k: Int,
      excludeSelf: Boolean = false): DataFrame = {
    // deliberately NOT re-spread: the first post-scan step here is a
    // token explode feeding an aggregation/join exchange, so the plan
    // re-parallelizes one stage later anyway — measured at c32/sf0.1,
    // an up-front round-robin exchange of the full document text costs
    // more than the single-task tokenize it parallelizes (round 17
    // A/B: ngram 3.20→1.82, minhash_pairs 1.17→0.94, fuzzy 2.88→2.49,
    // tfidf 1.28→0.89, lm_bigram 1.35→0.94, bm25 1.30→1.22)
    val docs = docs0
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
    // tf is the trunk of the whole scorer — dl, df and the scoring
    // join all derive from it. Materialized once (LAZY localCheckpoint:
    // blocks fill inside the first consuming job, no extra eager job):
    // unshared, Spark re-tokenizes the corpus for every consumer
    // (measured 4 full scan+explode+agg passes in the q_bm25 plan;
    // interleaved A/B at sf0.1: old 1.85 s min / lazy-ckpt 1.40 s min,
    // identical rows). The checkpoint is per-query-run state
    // (recomputed from parquet each invocation), sized at the postings
    // table — the §8 "decide on the small proxy" shape, far below the
    // text it summarizes.
    val tf = graft.Tables.pinTrunk(toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf")))
    // dl = Σ tf per doc — identical to counting the raw token stream,
    // but derived from the checkpoint instead of a second corpus scan
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // single-row corpus stats: N and avgdl (exact-integer inputs)
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
      .select(col("n_docs"),
        (col("total_tokens").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    val idf = dfT.crossJoin(broadcast(stats))
      .select(col("tok"),
        round(log(col("n_docs").cast("double") / col("df").cast("double"))
          * lit(1e6)).cast("long").as("idf_micro"),
        col("avgdl"))
    val qterms = queries.select(col("query_id"),
      explode(array_distinct(TextOps.tokens(col("qtext")))).as("tok"))
    val matched = tf.join(broadcast(qterms), "tok")
      .join(idf, "tok")
      .join(dl, "doc_id")
    val kept = if (excludeSelf) matched.filter(col("doc_id") =!= col("query_id"))
               else matched
    // fixed-shape IEEE expression; mirrored token-for-token in the oracle
    val contrib = kept.withColumn("contrib_milli",
      round(
        (col("idf_micro").cast("double") / lit(1000000.0)) *
          ((col("tf").cast("double") * expr(s"CAST($k1Plus1 AS DOUBLE)")) /
            (col("tf").cast("double") + expr(s"CAST($k1 AS DOUBLE)") *
              (expr(s"CAST($oneMinusB AS DOUBLE)") +
                expr(s"CAST($b AS DOUBLE)") *
                  (col("dl").cast("double") / col("avgdl"))))) *
          lit(1000.0)).cast("long"))
    val scores = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib_milli")).as("score_milli"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_milli").desc, col("doc_id").asc)
    scores.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_milli"))
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 list and
    * the hashed-tf-idf cosine list, doc-as-query (the first
    * `numQueries` documents query the rest of the corpus, as in the
    * text-ANN operator). Contribution of a list is
    * 1e6 div (60 + rank) for docs it ranked, 0 otherwise — integer
    * arithmetic only, so fusion is exact on any engine.
    */
  def hybridRrf(docs: DataFrame, dim: Int, numQueries: Int, k: Int): DataFrame = {
    val lexQueries = docs.filter(col("doc_id") < numQueries)
      .select(col("doc_id").as("query_id"), col("text").as("qtext"))
    val lex = bm25TopK(docs, lexQueries, k, excludeSelf = true)
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    // the dense vectors feed BOTH sides of the brute-force join
    // (corpus + probe set); materialized once so the tf-idf pipeline
    // does not run twice — doc-count × dim doubles, far smaller than
    // the text it encodes
    val vec = Similarity.bruteForceTopK(
        graft.Tables.pinTrunk(TextOps.hashedDenseVectors(docs, dim)
          .select(col("doc_id").as("vec_id"), col("embedding"))),
        numQueries, k)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("vec_rank"))
    val fused = lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_ppm",
        coalesce(expr(s"1000000L div ($rrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000L div ($rrfK + vec_rank)"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rrf_ppm").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf_ppm"))
  }

  /** NDCG@k discount table: disc_ppm(r) = round(1e6 / log2(r+1)),
    * precomputed on the driver and inlined as LITERALS on both
    * engines — the only transcendental in the metric never runs at
    * query time, so there is nothing for engines to disagree on. */
  def ndcgDiscountsPpm(k: Int): IndexedSeq[Long] =
    (1 to k).map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))

  /** NDCG@k of the BM25 list judged by the dense-ranker truth list
    * (doc-as-query): the retrieval-eval harness with derived
    * judgments — how much of the dense ranking the sparse ranker
    * reproduces, position-discounted. Gain of a lexically-ranked doc
    * is (k+1 − its cosine-truth rank), 0 if outside the truth top-k.
    * The truth list always holds exactly k docs, so IDCG is the
    * per-query constant Σ (k+1−i)·disc(i); dcg sums exact integers
    * and ndcg_ppm = dcg·1e6 div idcg — engine-exact end to end. */
  def ndcgAtK(docs: DataFrame, dim: Int, numQueries: Int, k: Int): DataFrame = {
    val lexQueries = docs.filter(col("doc_id") < numQueries)
      .select(col("doc_id").as("query_id"), col("text").as("qtext"))
    val lex = bm25TopK(docs, lexQueries, k, excludeSelf = true)
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    // same one-materialization as [[hybridRrf]]: the vectors feed
    // both sides of the truth-list join
    val vec = Similarity.bruteForceTopK(
        graft.Tables.pinTrunk(TextOps.hashedDenseVectors(docs, dim)
          .select(col("doc_id").as("vec_id"), col("embedding"))),
        numQueries, k)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("vec_rank"))
    val disc = ndcgDiscountsPpm(k)
    val idcg = (1 to k).map(i => (k + 1 - i).toLong * disc(i - 1)).sum
    lex.join(vec, Seq("query_id", "doc_id"), "left")
      .withColumn("gain", coalesce(lit(k + 1L) - col("vec_rank"), lit(0L)))
      .withColumn("contrib",
        col("gain") * element_at(array(disc.map(lit): _*), col("lex_rank").cast("int")))
      .groupBy(col("query_id"))
      .agg(sum(col("contrib")).as("dcg_ppm"))
      .withColumn("idcg_ppm", lit(idcg))
      .withColumn("ndcg_ppm", expr(s"(dcg_ppm * 1000000L) div ${idcg}L"))
      .select(col("query_id"), col("dcg_ppm"), col("idcg_ppm"), col("ndcg_ppm"))
  }
}
