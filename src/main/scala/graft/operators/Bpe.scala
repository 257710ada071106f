package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: train merges on the corpus, encode
  * documents with them — the real subword surface behind the token
  * counting ops (TextOps counts whitespace tokens; training pipelines
  * budget in SUBWORD tokens, so corpus token budgets need this).
  *
  * Scale design: BPE trains on the WORD VOCABULARY with frequencies,
  * not the corpus — one corpus pass builds (word, freq), and every
  * merge round is a vocab-sized aggregation (pair counts weighted by
  * freq) plus a single-row argmax. k merges = k small jobs; the
  * corpus is touched once for counting and once for encoding. The
  * only driver state is the merge list itself (k pairs —
  * control-plane-sized, like the k-means centroids).
  *
  * Determinism: pair argmax breaks ties by (count desc, left asc,
  * right asc); merge application is the standard greedy
  * left-to-right non-overlapping pass, expressed as an array fold so
  * it runs identically in the trainer, the encoder, and the
  * plain-Scala spec reference.
  */
object Bpe {

  /** Split a word into single-char symbols with the end-of-word
    * marker on the last symbol (the classic Sennrich setup, so
    * merges can distinguish word-final units). */
  private def symbolsExpr(word: Column): Column = {
    val chars = split(word, "")
    transform(chars, (c, i) =>
      when(i === size(chars) - 1, concat(c, lit("</w>"))).otherwise(c))
  }

  /** One greedy left-to-right merge pass of (a,b) → a+b over a
    * symbol array; the merged symbol does not re-participate in the
    * same pass (append-or-merge fold). */
  private def mergePass(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Word vocabulary with frequencies — the one corpus pass. */
  def wordVocab(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Train `numMerges` BPE merges. Returns the ordered merge list.
    * Each round: adjacent-pair counts over the symbolized vocab
    * (weighted by word freq, vocab-sized agg), argmax to the driver
    * (one row), apply the merge to the vocab symbols. */
  def train(docs: DataFrame, numMerges: Int): Seq[(String, String)] = {
    var vocab = wordVocab(docs)
      .select(col("freq"), symbolsExpr(col("word")).as("syms"))
    // cut lineage growth across rounds (k-means-loop precedent)
    vocab = vocab.localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val top = vocab
        .select(col("freq"), col("syms"))
        .withColumn("pair", explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))))
        .groupBy(col("pair.a").as("a"), col("pair.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        vocab = vocab.select(col("freq"), mergePass(col("syms"), a, b).as("syms"))
          .localCheckpoint(true)
        round += 1
      }
    }
    merges.result()
  }

  /** Encode documents with an ordered merge list: per word, fold the
    * merges in training order. Output is one row per doc with the
    * subword and whitespace token counts — the numbers a corpus
    * token budget runs on. */
  def encode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
    val encoded = merges.foldLeft(symbolsExpr(col("word"))) {
      case (syms, (a, b)) => mergePass(syms, a, b)
    }
    words.withColumn("n_sub", size(encoded).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_sub")).as("n_subword_tokens"),
        count(lit(1)).as("n_words"))
  }
}
