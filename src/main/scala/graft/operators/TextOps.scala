package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines over the `documents`
  * table: token statistics, heuristic language/topic ID, quality
  * scoring, fingerprinting. All pure Column expressions — codegen'd,
  * no UDFs, shuffle-free (per-row), so they stream through a 100 TB
  * corpus at scan speed.
  */
object TextOps {

  def tokens(text: Column): Column = split(text, " ")

  /** Per-doc token statistics. Total token chars are derived
    * arithmetically (chars - separators) so no second pass over the
    * array is needed. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      ((length(col("text")) - (size(toks) - lit(1))).cast("double") /
        size(toks).cast("double")).as("avg_token_len"))
  }

  /** Heuristic classifier: count marker-token hits per class, predict
    * the argmax (ties broken by profile order). The class can be a
    * language (n-gram/stopword profiles — the classic langid
    * heuristic) or a topic; profiles are data, not code. */
  def classify(docs: DataFrame, profiles: Seq[(String, Seq[String])]): DataFrame = {
    val toks = tokens(col("text"))
    val withCounts = profiles.foldLeft(docs.select(col("doc_id"), toks.as("__toks"))) {
      case (df, (lang, markers)) =>
        df.withColumn(s"n_$lang",
          size(filter(col("__toks"),
            t => markers.map(m => t === m).reduce(_ || _))).cast("long"))
    }
    // argmax with first-profile-wins tie-break: a profile wins if its
    // count is strictly greater than all earlier ones and >= all later
    val pred = profiles.indices.reverse.foldLeft(lit(profiles.head._1)) { (acc, i) =>
      val (lang, _) = profiles(i)
      val beatsEarlier = profiles.take(i)
        .map { case (l, _) => col(s"n_$lang") > col(s"n_$l") }
      val gteLater = profiles.drop(i + 1)
        .map { case (l, _) => col(s"n_$lang") >= col(s"n_$l") }
      val wins = (beatsEarlier ++ gteLater).reduceOption(_ && _).getOrElse(lit(true))
      when(wins, lit(lang)).otherwise(acc)
    }
    withCounts
      .withColumn("pred", pred)
      .drop("__toks")
  }

  /** Composite quality score in [0,1]: lexical diversity, length
    * saturation, and non-stopword density — the standard cheap
    * pre-filter before expensive model-based scoring. Weights are
    * fixed doubles; the arithmetic order is pinned so the score is
    * bit-deterministic. */
  /** Shared quality-term expressions (pinned arithmetic order). */
  private def qualityTerms(stopwords: Seq[String]): (Column, Column, Column) = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nDistinct = size(array_distinct(toks)).cast("double")
    val nStop = size(filter(toks,
      t => stopwords.map(s => t === s).reduce(_ || _))).cast("double")
    val diversity = nDistinct / nTok
    val lengthSat = least(lit(1.0), nTok / lit(100.0))
    val density = lit(1.0) - nStop / nTok
    (diversity, density,
      diversity * lit(0.4) + lengthSat * lit(0.3) + density * lit(0.3))
  }

  def qualityScore(docs: DataFrame, stopwords: Seq[String]): DataFrame = {
    val (diversity, density, quality) = qualityTerms(stopwords)
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      diversity.as("diversity"),
      density.as("density"),
      quality.as("quality"))
  }

  /** Per-source token-budget selection: keep the highest-quality docs
    * of each source until its token budget fills (greedy by quality
    * desc, doc_id tie-break; a doc that would cross the budget line
    * is cut). The corpus-mixing primitive "best N tokens per domain".
    * One window exchange on source — selection is per-source
    * sequential by definition, never a global sort; the `selected`
    * audit flag (not a filter) keeps what was cut inspectable. */
  def tokenBudgetSelect(docs: DataFrame, stopwords: Seq[String],
                        budgetTokens: Long): DataFrame = {
    val (_, _, quality) = qualityTerms(stopwords)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    docs.select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        quality.as("quality"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("selected", col("cum_tokens") <= budgetTokens)
  }

  /** Cross-source quality calibration: percent-rank of the quality
    * score WITHIN each source, in exact milli units. A global
    * threshold over raw scores systematically biases against
    * terse/verbose sources; curation recipes threshold the
    * per-source percentile instead. Rank arithmetic is pure integer
    * — pr_milli = (rank−1)·1000 div (n−1), 0 for singleton sources —
    * so the output is engine-exact; the quality ordering itself is
    * the same IEEE-deterministic double both engines compute from
    * integer token counts. One window shuffle on source. */
  def qualityPercentile(docs: DataFrame, stopwords: Seq[String]): DataFrame = {
    val (_, _, quality) = qualityTerms(stopwords)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").asc, col("doc_id").asc)
    docs.select(col("doc_id"), col("source"), quality.as("quality"))
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col("source"))).cast("long"))
      .withColumn("pr_milli",
        when(col("__n") === 1, 0L)
          .otherwise(expr("((__r - 1) * 1000) div (__n - 1)")))
      .select(col("doc_id"), col("source"), col("pr_milli"))
  }

  /** End-to-end curation decision — the final gate of a training-data
    * pipeline, composing exact-dedup keeper status, length bounds and
    * the quality score into keep/drop WITH REASON (first rule wins:
    * duplicate → too_short → low_quality → ok). One shuffle (content
    * hash for the keeper window); everything else rides the scan. */
  def curate(docs: DataFrame, stopwords: Seq[String],
             minTokens: Long, minQuality: Double): DataFrame = {
    val (_, _, quality) = qualityTerms(stopwords)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
    val reason =
      when(col("doc_id") =!= col("__keeper"), "duplicate")
        .when(col("n_tokens") < minTokens, "too_short")
        .when(col("quality") < minQuality, "low_quality")
        .otherwise("ok")
    docs
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
      .withColumn("quality", quality)
      .withColumn("__keeper", min(col("doc_id")).over(w))
      .withColumn("reason", reason)
      .select(col("doc_id"), col("n_tokens"), col("quality"),
        col("reason"), (col("reason") === "ok").as("keep"))
  }

  /** Per-source corpus statistics (the dataset-card numbers: volume,
    * token counts, exact-duplicate rate). Two-level aggregation —
    * map-side partials, one shuffle on source. */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text")))).cast("long").as("n_tokens"),
        countDistinct(md5(col("text"))).as("n_unique"),
        (lit(1.0) - countDistinct(md5(col("text"))).cast("double") /
          count(lit(1)).cast("double")).as("dup_rate"))

  /** Token counting for LLM-pipeline budgeting: whitespace words,
    * alphanumeric-run count (regex tokenizer), and a BPE-ish subword
    * estimate (≈ one token per 6 chars within each word — the
    * standard cheap approximation when the real tokenizer is too
    * expensive to run at corpus scale). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_words"),
      regexp_count(col("text"), lit("[a-z0-9]+")).cast("long").as("n_alnum_runs"),
      expr("aggregate(transform(split(text, ' '), " +
        "t -> CAST(ceil(length(t) / 6.0) AS BIGINT)), 0L, (acc, x) -> acc + x)")
        .as("est_bpe_tokens"))

  /** Document fingerprint: md5 content hash + a 60-bit numeric
    * projection (Routing.stableHash domain) + shard bucket. */
  def fingerprint(docs: DataFrame, buckets: Int = 1024): DataFrame =
    docs.select(
      col("doc_id"),
      md5(col("text")).as("fp_md5"),
      graft.functions.HashExpressions.md5Prefix64(col("text"), 15).as("fp_long"))
      .withColumn("fp_bucket", pmod(col("fp_long"), lit(buckets.toLong)))

  /** Distinct word-level n-grams per doc: (doc_id, gram). Docs shorter
    * than n contribute nothing. */
  def ngramSet(docs: DataFrame, n: Int): DataFrame = {
    // token array hoisted to an attribute: a slice over the inline
    // split would re-tokenize per gram inside the HOF lambda (see
    // [[lmScoreBigram]])
    val w = col("__w")
    val grams = when(size(w) >= n,
      array_distinct(transform(sequence(lit(1), size(w) - (n - 1)),
        i => array_join(slice(w, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"), tokens(col("text")).as("__w"))
      .select(col("doc_id"), explode(grams).as("gram"))
  }

  /** Benchmark decontamination: flag documents sharing any word-level
    * n-gram with an eval/benchmark set — the standard overlap filter
    * run before training (8-13 grams in practice). The benchmark gram
    * set is bounded by construction (eval suites are tiny next to a
    * 100 TB corpus), so it BROADCASTS; the corpus side explodes grams
    * at scan speed and the only shuffle is the per-doc hit count. */
  def decontaminate(docs: DataFrame, benchDocs: DataFrame, n: Int): DataFrame = {
    val grams = ngramSet(docs, n)
    val bench = broadcast(ngramSet(benchDocs, n).select(col("gram")).distinct())
    val hits = grams.join(bench, Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    docs.select(col("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** PII patterns shared with the DuckDB oracle (RE2/Java-compatible
    * subset, no lookaround). */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** PII redaction before training: emails and IPv4 literals replaced
    * by typed placeholder tags, with per-kind counts for the dataset
    * card. Pure codegen'd regexes — scan speed, no shuffle. */
  def redactPii(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_replace(
        regexp_replace(col("text"), lit(EmailRe), lit("<EMAIL>")),
        lit(Ipv4Re), lit("<IP>")).as("redacted"))

  /** Unigram language-model scoring — the cheapest member of the
    * KenLM-style quality-filter family: train token frequencies on
    * the corpus itself (one vocab-sized aggregation), then score each
    * document by its average token log-probability. Low scores flag
    * gibberish / non-language content; high scores flag boilerplate.
    *
    * Scale: the LM is vocab-sized (≪ corpus — Heaps' law), so the
    * probability join broadcasts; past the broadcast threshold AQE
    * falls back to a shuffle join on `tok`, which is the correct plan
    * at that size. Per-token log-probs are rounded to exact micro
    * units BEFORE the per-doc sum, so document scores are
    * bit-reproducible under any partitioning (a raw double sum would
    * drift with the reduce order). */
  def lmScore(docs0: DataFrame): DataFrame = {
    // deliberately NOT re-spread: the first post-scan step here is a
    // token explode feeding an aggregation/join exchange, so the plan
    // re-parallelizes one stage later anyway — measured at c32/sf0.1,
    // an up-front round-robin exchange of the full document text costs
    // more than the single-task tokenize it parallelizes (round 17
    // A/B: ngram 3.20→1.82, minhash_pairs 1.17→0.94, fuzzy 2.88→2.49,
    // tfidf 1.28→0.89, lm_bigram 1.35→0.94, bm25 1.30→1.22)
    val docs = docs0
    // explode ONCE, reduce to per-doc term frequencies immediately:
    // every downstream agg/join then runs over (doc, term)-distinct
    // rows, not raw occurrences, and the corpus counts fold from tf
    // with map-side partials
    // tf trunk materialized once (lazy checkpoint — the bm25 pattern):
    // the freq chain AND the scoring join both consume it, and unshared
    // each re-tokenized the corpus
    val tf = graft.Tables.pinTrunk(
      docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf")))
    val freq = tf.groupBy(col("tok")).agg(sum(col("tf")).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    val logp = freq.crossJoin(broadcast(total))  // total: literally one row
      .select(col("tok"),
        round(log(col("cnt").cast("double") / col("total").cast("double"))
          * lit(1e6)).cast("long").as("logp_micro"))
    // vocab-sized prob table: NO forced broadcast — AQE broadcasts
    // below the threshold and falls back to a shuffle join on `tok`
    // beyond it (a forced hint would OOM the driver at 100 TB vocab)
    tf.join(logp, "tok")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("logp_micro")).as("sum_logp_micro"))
      .withColumn("avg_logp",
        col("sum_logp_micro").cast("double") / col("n_tokens") / lit(1e6))
  }

  /** Interpolated BIGRAM LM quality scoring — the step up from
    * [[lmScore]]'s unigram model (Jelinek-Mercer smoothing:
    * `p = λ·p_ML(cur|prev) + (1−λ)·p_uni(cur)`, with p_ML over
    * bigram-CONTEXT counts). Bigram generation is per-row list
    * arithmetic over the scan (zero shuffle); the count tables are
    * bigram-vocab-sized (Heaps' law ≪ corpus), so AQE picks
    * broadcast vs shuffle for the probability join. The per-bigram
    * log-prob rounds to exact micro units BEFORE the per-doc sum, so
    * scores are reduce-order-independent and engine-portable. Docs
    * with fewer than two tokens have no bigrams and drop out. */
  def lmScoreBigram(docs0: DataFrame, lambda: Double = 0.8): DataFrame = {
    // deliberately NOT re-spread: the first post-scan step here is a
    // token explode feeding an aggregation/join exchange, so the plan
    // re-parallelizes one stage later anyway — measured at c32/sf0.1,
    // an up-front round-robin exchange of the full document text costs
    // more than the single-task tokenize it parallelizes (round 17
    // A/B: ngram 3.20→1.82, minhash_pairs 1.17→0.94, fuzzy 2.88→2.49,
    // tfidf 1.28→0.89, lm_bigram 1.35→0.94, bm25 1.30→1.22)
    val docs = docs0
    val oneMinus = 1.0 - lambda
    // Materialize the token array ONCE per row before the bigram
    // lambda: the Column DSL inlines subtrees, so an un-hoisted
    // `element_at(split(text), i)` re-runs the split per array
    // element inside the (interpreted, non-codegen) HOF lambda —
    // quadratic re-tokenization, and the bigram subtree is evaluated
    // twice (count tables + final score join). Hoisting to an
    // attribute makes each element_at O(1) (measured 3.8 s → ~1 s at
    // sf0.1).
    // toked + bigrams are multi-consumer trunks (bigrams: count tables
    // AND the score join; toked: bigrams AND the unigram counts) — lazy
    // checkpoints make tokenize and bigram generation run ONCE each
    // instead of 3x/2x
    val toked = graft.Tables.pinTrunk(
      docs.select(col("doc_id"), tokens(col("text")).as("__w")))
    val w = col("__w")
    // bigrams stay in OCCURRENCE form end-to-end: within one doc a
    // bigram almost never repeats (tf ≈ 1), so a per-doc tf pre-agg
    // would add a high-cardinality shuffle and compress nothing
    // (unlike [[lmScore]], where token tf ≫ 1 makes it pay). The
    // final prob join is bigram-vocab-sized on the build side — AQE
    // broadcasts it while it fits, so the occurrence side rides the
    // scan straight into a map-side partial doc agg.
    val bigrams = toked
      .filter(size(w) >= 2) // sequence(1, 0) would count DOWN in Spark
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(w) - 1), i =>
          struct(element_at(w, i).as("prev"),
            element_at(w, i + 1).as("cur")))).as("bg"))
      .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      .transform(graft.Tables.pinTrunk)
    val cBig = bigrams.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("c_big"))
    // context counts fold from the vocab-sized cBig, not occurrences
    val cCtx = cBig.groupBy(col("prev")).agg(sum(col("c_big")).as("c_ctx"))
    val toks = toked.select(explode(w).as("tok"))
    val cUni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c_uni"))
    val total = cUni.agg(sum(col("c_uni")).as("total"))
    val probs = cBig
      .join(cCtx, "prev")
      .join(cUni.withColumnRenamed("tok", "cur"), "cur")
      .crossJoin(broadcast(total)) // total: literally one row
      .select(col("prev"), col("cur"),
        round(log(
          lit(lambda) * (col("c_big").cast("double") / col("c_ctx").cast("double")) +
            lit(oneMinus) * (col("c_uni").cast("double") / col("total").cast("double")))
          * lit(1e6)).cast("long").as("logp_micro"))
    bigrams.join(probs, Seq("prev", "cur"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("logp_micro")).as("sum_logp_micro"))
      .withColumn("avg_logp",
        col("sum_logp_micro").cast("double") / col("n_bigrams") / lit(1e6))
  }

  /** Feature-hashing TF-IDF vectorizer (the "hashing trick"): each
    * document becomes a `dim`-bucket sparse vector — bucket =
    * md5(token) mod dim, weight = Σ tf·idf of the tokens hashing
    * there — giving text a deterministic embedding WITHOUT an
    * external model, ready for the ANN/dedup operators (cosine over
    * sparse buckets). Weights stay in exact micro units end-to-end,
    * so vectors are bit-reproducible. Output is the oracle-safe
    * exploded form (doc_id, dim_idx, weight_micro). */
  def hashedTfidfVectors(docs0: DataFrame, dim: Int): DataFrame = {
    // deliberately NOT re-spread: the first post-scan step here is a
    // token explode feeding an aggregation/join exchange, so the plan
    // re-parallelizes one stage later anyway — measured at c32/sf0.1,
    // an up-front round-robin exchange of the full document text costs
    // more than the single-task tokenize it parallelizes (round 17
    // A/B: ngram 3.20→1.82, minhash_pairs 1.17→0.94, fuzzy 2.88→2.49,
    // tfidf 1.28→0.89, lm_bigram 1.35→0.94, bm25 1.30→1.22)
    val docs = docs0
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    // tf feeds both the idf subtree and the weight join; materialized
    // once so the corpus is tokenized once, not once per consumer
    // (same per-run postings checkpoint as [[Retrieval.bm25TopK]])
    val tf = graft.Tables.pinTrunk(
      toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val idf = df.crossJoin(broadcast(n))
      .select(col("tok"),
        round(log(col("n_docs").cast("double") / col("df").cast("double"))
          * lit(1e6)).cast("long").as("idf_micro"),
        pmod(graft.functions.HashExpressions.md5Prefix64(col("tok"), 15),
          lit(dim.toLong)).as("dim_idx"))
    tf.join(idf, "tok")  // AQE picks the join strategy (vocab-sized)
      .groupBy(col("doc_id"), col("dim_idx"))
      .agg(sum(col("tf") * col("idf_micro")).as("weight_micro"))
  }

  /** Dense form of [[hashedTfidfVectors]]: one `dim`-length
    * array<double> per document (micro-unit weights — integers below
    * 2^53, so the doubles are exact and engine-portable). This is the
    * bridge from text into the ANN stack: the output feeds
    * [[Similarity.bruteForceTopK]]/[[Similarity.lshNeighbors]]/IVF-PQ
    * unchanged — similarity search over text with no external
    * embedding model. */
  def hashedDenseVectors(docs: DataFrame, dim: Int): DataFrame =
    hashedTfidfVectors(docs, dim)
      .groupBy(col("doc_id"))
      .agg(map_from_entries(
        collect_list(struct(col("dim_idx"), col("weight_micro")))).as("__m"))
      .select(col("doc_id"),
        transform(sequence(lit(0L), lit(dim - 1L)),
          d => coalesce(element_at(col("__m"), d), lit(0L)).cast("double"))
          .as("embedding"))

  /** Chunk-level exact dedup (the C4/RefinedWeb line-dedup op at
    * fixed token-window granularity, for corpora without natural line
    * structure): each document splits into consecutive `window`-token
    * chunks; of every set of byte-identical chunks corpus-wide, only
    * the FIRST occurrence (min (doc_id, chunk_idx)) survives, and
    * each document reassembles from its kept chunks in order.
    *
    * Scale: one shuffle keyed on the chunk md5 (never the chunk
    * text), chunk-count-sized; reassembly sorts in-group structs —
    * no window over the corpus, no driver state. */
  def chunkDedup(docs0: DataFrame, window: Int): DataFrame = {
    // deliberately NOT re-spread: the first post-scan step here is a
    // token explode feeding an aggregation/join exchange, so the plan
    // re-parallelizes one stage later anyway — measured at c32/sf0.1,
    // an up-front round-robin exchange of the full document text costs
    // more than the single-task tokenize it parallelizes (round 17
    // A/B: ngram 3.20→1.82, minhash_pairs 1.17→0.94, fuzzy 2.88→2.49,
    // tfidf 1.28→0.89, lm_bigram 1.35→0.94, bm25 1.30→1.22)
    val docs = docs0
    // token array hoisted to an attribute: a slice over the inline
    // split would re-tokenize per chunk inside the HOF lambda (see
    // [[lmScoreBigram]])
    val toks = col("__w")
    val nChunks = ceil(size(toks).cast("double") / window).cast("int")
    val chunks = docs
      .select(col("doc_id"), tokens(col("text")).as("__w"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(toks, i * window + 1, lit(window)), " "))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk"), md5(col("col")).as("__h"))
    val keepers = chunks.groupBy(col("__h"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("__first"))
      .select(col("__h"), col("__first.doc_id").as("__kdoc"),
        col("__first.chunk_idx").as("__kidx"))
    chunks.join(keepers, "__h")
      .withColumn("kept",
        col("doc_id") === col("__kdoc") && col("chunk_idx") === col("__kidx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("kept"), struct(col("chunk_idx"), col("chunk"))))),
            s => s.getField("chunk")),
          " ").as("cleaned_text"))
  }

  /** TF-IDF top-k terms per document — the keyword/feature-extraction
    * step of corpus pipelines (dataset cards, topic routing, dedup
    * blocking keys). tf is the in-doc count; idf = ln(N/df) rounded
    * to exact micro units ONCE per vocab entry; score = tf ×
    * idf_micro stays in pure integers, so the per-doc ranking is
    * deterministic and engine-portable. The df/idf table is
    * vocab-sized (broadcast; AQE shuffles past the threshold, which
    * is then the right plan). */
  def tfidfTopTerms(docs0: DataFrame, k: Int): DataFrame = {
    // deliberately NOT re-spread: the first post-scan step here is a
    // token explode feeding an aggregation/join exchange, so the plan
    // re-parallelizes one stage later anyway — measured at c32/sf0.1,
    // an up-front round-robin exchange of the full document text costs
    // more than the single-task tokenize it parallelizes (round 17
    // A/B: ngram 3.20→1.82, minhash_pairs 1.17→0.94, fuzzy 2.88→2.49,
    // tfidf 1.28→0.89, lm_bigram 1.35→0.94, bm25 1.30→1.22)
    val docs = docs0
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val idf = df.crossJoin(broadcast(n))
      .select(col("tok"),
        round(log(col("n_docs").cast("double") / col("df").cast("double"))
          * lit(1e6)).cast("long").as("idf_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("tok").asc)
    // AQE chooses broadcast vs shuffle for the vocab-sized idf table
    tf.join(idf, "tok")
      .withColumn("score_micro", col("tf") * col("idf_micro"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("tok").as("term"),
        col("tf"), col("score_micro"))
  }

  /** Repetition signals (the cheap boilerplate/spam detectors of the
    * Gopher-style rule set): dominance of the single most frequent
    * token, and the duplicate-bigram fraction. Per-row list
    * arithmetic only. */
  def repetition(docs: DataFrame): DataFrame = {
    // token array hoisted to an attribute: the lambda bodies below
    // reference the array (element_at, nested filter), so an inline
    // split would re-tokenize per element (see [[lmScoreBigram]])
    val w = col("__w")
    // most-frequent-token count in O(n log n): longest equal-run of
    // the SORTED tokens via one aggregate pass — the nested
    // distinct×filter form is O(n·distinct) per row, which a long
    // boilerplate document turns quadratic
    val topCount = aggregate(
      array_sort(w),
      struct(lit(null).cast("string").as("prev"),
        lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x <=> acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val bigrams = transform(sequence(lit(1), size(w) - 1),
      i => concat_ws(" ", element_at(w, i), element_at(w, i + 1)))
    val dupBigram = when(size(w) >= 2,
      lit(1.0) - size(array_distinct(bigrams)).cast("double") /
        size(bigrams).cast("double"))
      .otherwise(lit(0.0))
    docs.select(col("doc_id"), tokens(col("text")).as("__w")).select(
      col("doc_id"),
      (topCount.cast("double") / size(w).cast("double")).as("top_token_ratio"),
      dupBigram.as("dup_bigram_ratio"))
  }

  /** Per-source EXACT discrete length quantiles (corpus profiling for
    * packing-window / truncation-budget decisions). Discrete (k-th
    * smallest, k = ⌈p·n⌉) rather than interpolated: the result is a
    * value from the data, bit-stable across engines — interpolated
    * quantiles differ in the lerp's floating-point shape. One
    * sort-window per source plus a source-sized agg; at 100 TB the
    * per-source sort is the same shuffle a global orderBy-within-key
    * pays, and sources are the natural partition. */
  def tokenQuantiles(docs: DataFrame, ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val nTok = size(tokens(col("text"))).cast("long")
    val w = Window.partitionBy(col("source")).orderBy(col("n_tokens"))
    val wAll = Window.partitionBy(col("source"))
    val ranked = docs.select(col("source"), nTok.as("n_tokens"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    val qCols = ps.map { p =>
      val label = s"p${(p * 100).toInt}_tokens"
      max(when(col("__rn") === ceil(lit(p) * col("__n")).cast("long"),
        col("n_tokens"))).as(label)
    }
    ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), qCols: _*)
      .select(col("source") +: col("n_docs") +: ps.map(p => col(s"p${(p * 100).toInt}_tokens")): _*)
  }

  /** RAG-style sliding-window chunker: fixed windows of `chunkTokens`
    * tokens advancing by `strideTokens` (overlap = chunk − stride).
    * Window count is `1 + max(0, ⌈(n − chunk)/stride⌉)` so the last
    * window always reaches the end of the document and no window is
    * fully contained in an earlier one; a doc shorter than one chunk
    * yields exactly its own text. Chunk identity (doc_id, chunk_idx)
    * is stable under corpus growth — re-chunking new docs never
    * renumbers old chunks. Pure per-row list arithmetic (sequence →
    * transform → posexplode): zero shuffle, output rows ≈ n/stride
    * per doc, scan-speed at any corpus size. */
  def chunkWithOverlap(docs: DataFrame, chunkTokens: Int,
                       strideTokens: Int): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0 && strideTokens <= chunkTokens,
      s"need 0 < stride <= chunk, got chunk=$chunkTokens stride=$strideTokens")
    val chunks = transform(
      sequence(lit(0L), greatest(lit(0L),
        ceil((size(col("__w")).cast("long") - chunkTokens).cast("double") /
          strideTokens).cast("long"))),
      i => struct(
        (i * strideTokens).as("start_tok"),
        least(lit(chunkTokens.toLong),
          size(col("__w")).cast("long") - i * strideTokens).as("n_tokens"),
        concat_ws(" ", slice(col("__w"), (i * strideTokens + 1).cast("int"),
          lit(chunkTokens))).as("chunk_text")))
    docs
      .withColumn("__w", tokens(col("text")))
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "__c")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("__c.start_tok"), col("__c.n_tokens"), col("__c.chunk_text"))
  }

  /** Corpus n-gram census: the k most frequent bigrams per source
    * (heavy hitters), with a deterministic count-desc / gram-asc
    * rank. The count table is bigram-vocab-sized (Heaps' law: vocab
    * ≪ corpus), so the plan is one map-side-combined aggregation over
    * occurrences riding the scan, then a per-source top-k window over
    * the vocab-sized table — the 100 TB shape: occurrence rows never
    * cross the wire un-combined, and the window sorts vocab, not
    * corpus. Token array hoisted to an attribute before the bigram
    * lambda (see [[lmScoreBigram]] — un-hoisted HOFs re-tokenize per
    * element). */
  def heavyHitters(docs: DataFrame, k: Int): DataFrame = {
    val toked = docs.select(col("source"), tokens(col("text")).as("__w"))
    val w = col("__w")
    val grams = toked
      .filter(size(w) >= 2)
      .select(col("source"),
        explode(transform(sequence(lit(1), size(w) - 1), i =>
          concat_ws(" ", element_at(w, i), element_at(w, i + 1)))).as("gram"))
    val counts = grams.groupBy(col("source"), col("gram"))
      .agg(count(lit(1)).as("n"))
    val win = Window.partitionBy(col("source"))
      .orderBy(col("n").desc, col("gram"))
    counts
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("gram"), col("n"))
  }

  /** fastText-style hashed linear document scorer: each token hashes
    * into one of `dim` weight buckets (the md5-prefix bucket used
    * across the repo), and the document score is the sum of bucket
    * weights in exact integer micro-units. Weights derive
    * deterministically from the bucket id — the fixture stands in for
    * a trained weight vector; swapping in real weights is a broadcast
    * lookup with the identical plan. Zero shuffle: the score is a
    * per-row array-aggregate folded inside the scan, so classification
    * runs at scan speed on any corpus size. `accept` is the
    * sign-threshold decision a quality filter would gate on. */
  /** Micro-unit weight of one token: md5-prefix bucket, Knuth-hashed
    * into [-1000, 1000] — pure 64-bit integer arithmetic,
    * engine-exact. Shared by the operator and the `hash_score` SQL
    * function. */
  private[graft] def tokenWeight(t: Column, dim: Long): Column = {
    val b = pmod(graft.functions.HashExpressions.md5Prefix64(t, 15), lit(dim))
    (b * lit(2654435761L) + lit(1L)) % lit(2001L) - lit(1000L)
  }

  /** Per-row fold of [[tokenWeight]] over a token array. */
  private[graft] def hashScoreExpr(w: Column, dim: Long): Column =
    aggregate(w, lit(0L), (acc, t) => acc + tokenWeight(t, dim))

  def hashedLinearScore(docs: DataFrame, dim: Int): DataFrame = {
    val toked = docs.select(col("doc_id"), tokens(col("text")).as("__w"))
    val w = col("__w")
    toked.select(
      col("doc_id"),
      size(w).cast("long").as("n_tokens"),
      hashScoreExpr(w, dim.toLong).as("score_micro"))
      .withColumn("accept", col("score_micro") >= 0L)
  }

  /** Canonical text cleaning — the first stage of every web-corpus
    * pipeline: strip markup tags, blank out control characters,
    * collapse whitespace runs, trim, lowercase. Pure per-row regex
    * expressions (zero shuffle, scan speed); control characters are
    * removed BEFORE whitespace collapsing so engine regex dialects
    * (`\s` differs on vertical tab) can never disagree. Raw/clean lengths
    * ride along as the shrinkage audit. */
  /** The cleaning chain as a reusable Column — shared by the
    * operator and the `text_normalize` SQL function. */
  private[graft] def normalizeExpr(text: Column): Column = {
    val stripped = regexp_replace(text, "<[^>]*>", " ")
    val noCtl = regexp_replace(stripped, "[\\x00-\\x1F\\x7F]", " ")
    lower(trim(regexp_replace(noCtl, "\\s+", " ")))
  }

  def normalizeText(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_raw"),
        normalizeExpr(col("text")).as("text_clean"))
      .withColumn("n_chars_clean", length(col("text_clean")).cast("long"))

  /** Sketch-based corpus profile: per-source doc count and HLL++
    * approximate distinct-content count. The exact version
    * (`countDistinct`) shuffles every content hash; the sketch holds
    * constant memory per source and merges map-side — the only shape
    * that profiles 100 TB in one pass. Approximate by design, so this
    * is spec-verified (error vs exact bounded by the configured rsd),
    * not oracle-hashed. */
  def corpusSketch(docs: DataFrame, rsd: Double = 0.05): DataFrame =
    docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      approx_count_distinct(md5(col("text")), rsd).as("approx_unique"))

  /** [[corpusSketch]] with the accuracy GATE folded into the result:
    * emits the exact distinct count plus a boolean proving the HLL++
    * estimate landed within `band` of it, instead of the
    * engine-specific raw estimate. An exact-comparing oracle can then
    * verify the sketch (exact fields hash-match; the boolean is the
    * tolerance band) — the sketch itself stays the approximate
    * scale-path operator, the exact distinct here is the verify
    * harness's yardstick. */
  def corpusSketchChecked(docs: DataFrame, rsd: Double = 0.05,
                          band: Double = 0.05): DataFrame =
    docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      count_distinct(md5(col("text"))).as("n_unique"),
      approx_count_distinct(md5(col("text")), rsd).as("__approx"))
      .select(col("source"), col("n_docs"), col("n_unique"),
        (abs(col("__approx") - col("n_unique")) <=
          col("n_unique") * band).as("sketch_within_band"))

  /** Winnowing fingerprint selection (Schleimer et al. 2003, the
    * MOSS algorithm): from the k-token-gram hash sequence of each
    * document, keep the rightmost-minimum hash of every w-window —
    * the guaranteed-coverage fingerprint subset that plagiarism /
    * near-dup detectors index instead of every gram.
    *
    * Selection uses the blocker-span characterization (equivalent to
    * sliding the window, but per-row): position i is selected iff
    * its free span — bounded left by the nearest STRICTLY smaller
    * hash, right by the nearest smaller-OR-EQUAL hash (equal right
    * neighbors win the rightmost-min rule), both clipped to w−1 and
    * the array edges — fits a full window: Lfree + Rfree + 1 ≥ w.
    * Blocker scans unroll to fixed when-chains (w is a constant), so
    * the whole operator is per-row codegen over the scan — zero
    * shuffles, like the other fingerprint kernels. Hashes are 60-bit
    * md5 prefixes, so the oracle reproduces them bit-for-bit.
    */
  def winnow(docs: DataFrame, k: Int, w: Int): DataFrame = {
    val toks = col("__w")
    val m = size(toks) - (k - 1) // number of k-grams
    val hs = transform(sequence(lit(0), m - 1),
      i => graft.functions.HashExpressions.md5Prefix64(
        array_join(slice(toks, i + 1, lit(k)), " "), 15))
    val selected = filter(sequence(lit(0), m - 1), i => {
      val h = element_at(col("__hs"), i + 1)
      // distance to nearest left strict blocker (∞ → w), clipped to i
      val lDist = coalesce(
        (1 until w).map(t =>
          when(i - t >= 0 && element_at(col("__hs"), i - t + 1) < h, lit(t))
        ).reduceRight((a, b) => a.otherwise(b)), lit(w))
      val rDist = coalesce(
        (1 until w).map(t =>
          when(i + t <= size(col("__hs")) - 1 &&
            element_at(col("__hs"), i + t + 1) <= h, lit(t))
        ).reduceRight((a, b) => a.otherwise(b)), lit(w))
      val lFree = least(lDist - 1, i)
      val rFree = least(rDist - 1, size(col("__hs")) - 1 - i)
      lFree + rFree + 1 >= w
    })
    docs.select(col("doc_id"), tokens(col("text")).as("__w"))
      .filter(size(col("__w")) >= k + w - 1) // at least one full window
      .withColumn("__hs", hs)
      .select(col("doc_id"), col("__hs"), explode(selected).as("__p"))
      .select(col("doc_id"), col("__p").cast("long").as("pos"),
        element_at(col("__hs"), col("__p") + 1).as("fp"))
  }

  /** Corpus drift report: top-k tokens by chi-square frequency
    * divergence between two corpus snapshots (the distribution-shift
    * alarm a pipeline runs between crawls before retraining on the
    * new data). Token counts are exact integers; expected counts and
    * the chi-square statistic are fixed-shape IEEE doubles over them,
    * rounded ONCE per token to micro units, so the ranking is
    * engine-exact. Both count aggs are vocab-sized; the final rank
    * window sorts vocab, never corpus. */
  def corpusDrift(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    def cnt(df: DataFrame, name: String) =
      df.select(explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as(name))
    val joined = cnt(a, "c_a").join(cnt(b, "c_b"), Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val totals = joined.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
    val p = (col("c_a") + col("c_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val scored = joined.crossJoin(broadcast(totals))
      .withColumn("ea", col("n_a").cast("double") * p)
      .withColumn("eb", col("n_b").cast("double") * p)
      .withColumn("da", col("c_a").cast("double") - col("ea"))
      .withColumn("db", col("c_b").cast("double") - col("eb"))
      .withColumn("drift_micro",
        round((col("da") * col("da") / col("ea")
          + col("db") * col("db") / col("eb")) * lit(1000000.0)).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("drift_micro").desc, col("tok").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("tok"), col("c_a"), col("c_b"), col("drift_micro"))
  }
}
