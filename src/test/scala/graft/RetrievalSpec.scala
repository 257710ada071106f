package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval
import graft.analytics.Anomaly

/** Operator-level invariants for BM25 retrieval, hybrid RRF fusion,
  * and the z-score anomaly gate (the DuckDB oracle checks full-corpus
  * equivalence; these pin the semantics on hand-computable fixtures).
  */
class RetrievalSpec extends SparkFunSuite {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("bm25: doc matching more query terms outranks equal-length doc with fewer") {
    val docs = docsDf(
      0L -> "spark window join table scan",
      1L -> "spark window merge table scan",
      2L -> "merge sort batch value line")
    val q = Seq((100L, "spark window join")).toDF("query_id", "qtext")
    val got = Retrieval.bm25TopK(docs, q, 10).collect()
      .map(r => (r.getLong(2), r.getLong(1))).toMap
    assert(got(0L) == 1L, "three-term match must rank first")
    assert(got(1L) == 2L, "two-term match second")
    assert(!got.contains(2L), "zero matching terms -> never retrieved")
  }

  test("bm25: length normalization — same tf, shorter doc scores higher") {
    val docs = docsDf(
      0L -> "join value",
      1L -> "join value line merge sort batch scan table window group",
      2L -> "value line merge")
    val q = Seq((0L, "join")).toDF("query_id", "qtext")
    val rows = Retrieval.bm25TopK(docs, q, 10).collect()
      .map(r => (r.getLong(2), r.getLong(3))).toMap
    assert(rows(0L) > rows(1L),
      s"tf=1 in a 2-token doc must beat tf=1 in a 10-token doc: $rows")
  }

  test("bm25: duplicated query terms score once (unweighted-query BM25)") {
    val docs = docsDf(0L -> "join scan", 1L -> "merge scan")
    val q1 = Seq((0L, "join join join")).toDF("query_id", "qtext")
    val q2 = Seq((0L, "join")).toDF("query_id", "qtext")
    val s1 = Retrieval.bm25TopK(docs, q1, 10).collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    val s2 = Retrieval.bm25TopK(docs, q2, 10).collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    assert(s1 == s2, "query-term multiplicity must not change scores")
  }

  test("hybrid RRF: fused score is exactly the sum of the two list contributions") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val k = 10; val nq = 3; val dim = 64
    val lex = Retrieval.bm25TopK(docs,
        docs.filter(col("doc_id") < nq)
          .select(col("doc_id").as("query_id"), col("text").as("qtext")),
        k, excludeSelf = true)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(1))).toMap
    val vec = operators.Similarity.bruteForceTopK(
        operators.TextOps.hashedDenseVectors(docs, dim)
          .select(col("doc_id").as("vec_id"), col("embedding")), nq, k)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(1))).toMap
    val fused = Retrieval.hybridRrf(docs, dim, nq, k).collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      val expect = lex.get(key).map(rk => 1000000L / (60 + rk)).getOrElse(0L) +
        vec.get(key).map(rk => 1000000L / (60 + rk)).getOrElse(0L)
      assert(r.getLong(3) == expect, s"rrf mismatch at $key")
    }
    // fusion actually fuses: some top result must appear in both lists
    assert(fused.exists(r => lex.contains((r.getLong(0), r.getLong(2))) &&
      vec.contains((r.getLong(0), r.getLong(2)))))
  }

  test("ndcg: dcg equals the hand-folded gains over the two collected lists") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val nq = 3; val k = 10; val dim = 64
    val lex = Retrieval.bm25TopK(docs,
        docs.filter(col("doc_id") < nq)
          .select(col("doc_id").as("query_id"), col("text").as("qtext")),
        k, excludeSelf = true)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(1))).toMap
    val vec = operators.Similarity.bruteForceTopK(
        operators.TextOps.hashedDenseVectors(docs, dim)
          .select(col("doc_id").as("vec_id"), col("embedding")), nq, k)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(1))).toMap
    val disc = Retrieval.ndcgDiscountsPpm(k)
    val idcg = (1 to k).map(i => (k + 1 - i).toLong * disc(i - 1)).sum
    val expect = lex.groupBy(_._1._1).map { case (qid, entries) =>
      qid -> entries.map { case ((_, doc), lexRank) =>
        vec.get((qid, doc)).map(vr => (k + 1 - vr) * disc(lexRank.toInt - 1)).getOrElse(0L)
      }.sum
    }
    val got = Retrieval.ndcgAtK(docs, dim, nq, k).collect()
    assert(got.length == nq)
    got.foreach { r =>
      val (qid, dcg, idcgOut, ndcg) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dcg == expect(qid), s"dcg mismatch for query $qid")
      assert(idcgOut == idcg)
      assert(ndcg == dcg * 1000000L / idcg)
      assert(ndcg > 0L && ndcg <= 1000000L)
    }
  }

  test("corpus drift: symmetric fixture is exact, disjoint vocab maxes out") {
    import operators.TextOps
    val a = docsDf(0L -> "x x y")
    val b = docsDf(1L -> "x y y")
    val sym = TextOps.corpusDrift(a, b, 10).collect()
      .map(r => (r.getString(1), r.getLong(4))).toMap
    // chi2 = 2*(0.5^2/1.5) = 1/3 for both tokens
    assert(sym("x") == 333333L && sym("y") == 333333L)
    // disjoint: token only in B with 2x mass drifts harder than
    // the token only in A (chi2 exactly 2.0 vs 1.0)
    val d = TextOps.corpusDrift(docsDf(0L -> "a a"), docsDf(1L -> "b"), 10)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(4)))
    val byTok = d.map(t => t._1 -> t).toMap
    assert(byTok("b")._2 == 1L && byTok("a")._2 == 2L)
    assert(math.abs(byTok("a")._3 - 1000000L) <= 1)
    assert(math.abs(byTok("b")._3 - 2000000L) <= 1)
  }

  test("anomaly: z-score exact on a hand-computed group") {
    // values 10,10,10,10,100 -> milli mean 28000, sd exactly 36000;
    // z(100) = 72000/36000*1000 = 2000, z(10) = -500
    val ev = Seq(
      (1L, "t", 1000L, 10.0), (2L, "t", 2000L, 10.0), (3L, "t", 3000L, 10.0),
      (4L, "t", 4000L, 10.0), (5L, "t", 5000L, 100.0))
      .toDF("event_id", "event_type", "ts", "value")
    val out = Anomaly.zOutliers(ev, 1500L).collect()
    assert(out.length == 1 && out.head.getLong(0) == 5L)
    assert(out.head.getLong(4) == 2000L, s"z_milli: ${out.head.getLong(4)}")
    val all = Anomaly.zOutliers(ev, 0L).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(all(1L) == -500L, "below-mean z must round away from zero consistently")
  }

  test("anomaly: zero-variance groups are dropped, not NaN-ranked") {
    val ev = Seq((1L, "t", 1000L, 5.0), (2L, "t", 2000L, 5.0))
      .toDF("event_id", "event_type", "ts", "value")
    assert(Anomaly.zOutliers(ev, 0L).count() == 0)
  }

  test("anomaly: batch-trained baseline scores a stream identically to batch") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    val stats = Anomaly.momentStats(ev)
    val batch = Anomaly.zOutliersAgainst(ev, stats, 2500L).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toSet
    // the file stream source wants a directory, not one parquet file
    val streamDir = java.nio.file.Files.createTempDirectory("anom_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    // stream with the FILE's schema (ts may be timestamp[us] there),
    // then normalize to the ns-long domain like the batch reader does
    val fileSchema = spark.read.parquet(streamDir.toString).schema
    val stream = Tables.tsNanos(
      spark.readStream.schema(fileSchema).parquet(streamDir.toString))
    val q = Anomaly.zOutliersAgainst(stream, stats, 2500L)
      .writeStream.format("memory").queryName("anom_stream")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("anom_stream").collect()
      .map(r => (r.getLong(0), r.getLong(4))).toSet
    assert(got.nonEmpty && got == batch,
      s"stream/batch divergence: ${got.size} vs ${batch.size}")
  }
}
