package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** In-engine quantizer training (Lloyd's k-means), trained-IVF
  * search, and product-quantization codes.
  *
  * The load-bearing properties:
  *  - training is BIT-reproducible under any partitioning (micro-unit
  *    integer sums — a 100 TB rerun or a resume from checkpoint must
  *    land on the same quantizer);
  *  - inertia is non-increasing in iterations (Lloyd's invariant);
  *  - probing every cell recovers the exact brute-force answer (the
  *    recall knob's boundary condition);
  *  - a codebook vector PQ-codes to itself in every subspace.
  */
class KmeansPqSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sf)

  test("kmeansFit is bit-identical under repartitioning") {
    val a = Similarity.kmeansFit(emb, k = 4, maxIter = 3)
    val b = Similarity.kmeansFit(emb.repartition(7), k = 4, maxIter = 3)
    assert(a.map(_._1).sameElements(b.map(_._1)))
    a.zip(b).foreach { case ((_, va), (_, vb)) => assert(va == vb) }
  }

  test("Lloyd iterations never increase inertia") {
    val i1 = Similarity.kmeansInertia(emb, Similarity.kmeansFit(emb, 4, 1))
    val i3 = Similarity.kmeansInertia(emb, Similarity.kmeansFit(emb, 4, 3))
    val i6 = Similarity.kmeansInertia(emb, Similarity.kmeansFit(emb, 4, 6))
    assert(i3 <= i1 + 1e-6, s"inertia rose after more iterations: $i1 -> $i3")
    assert(i6 <= i3 + 1e-6, s"inertia rose after more iterations: $i3 -> $i6")
  }

  test("empty cells keep their previous centroid (k near corpus size)") {
    val tiny = emb.filter(col("vec_id") < 6)
    val cents = Similarity.kmeansFit(tiny, k = 6, maxIter = 4)
    assert(cents.length == 6)
    cents.foreach { case (_, v) => assert(v.nonEmpty) }
  }

  test("trained IVF with nprobe=k recovers exact brute-force top-k") {
    val k = 4
    val exact = Similarity.bruteForceTopK(emb, numQueries = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val all = Similarity.ivfTrainedTopK(emb, k = k, iters = 2,
        numQueries = 3, topK = 5, nprobe = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all == exact)
  }

  test("trained IVF single-probe returns sane results with nonzero recall") {
    val exact = Similarity.bruteForceTopK(emb, 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.ivfTrainedTopK(emb, k = 4, iters = 2,
        numQueries = 3, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(approx.nonEmpty)
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall > 0.0, s"trained IVF found no true neighbors (recall=$recall)")
  }

  test("codebook vectors PQ-code to themselves") {
    val cb = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val codes = Similarity.pqCodes(emb.filter(col("vec_id") < 8), cb, m = 4)
      .collect()
    assert(codes.length == 8 * 4)
    codes.foreach { r =>
      assert(r.getLong(2) == r.getLong(0),
        s"vec ${r.getLong(0)} sub ${r.getLong(1)} coded to ${r.getLong(2)}")
    }
  }

  test("adc distance to a codebook vector equals its true distance (±m rounding)") {
    // a codebook entry codes to itself in every subspace, so its ADC
    // distance must be the micro-rounded true squared distance, off by
    // at most one rounding unit per subspace
    val m = 4
    val cb = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    def dotd(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
    val queries = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val adc = Similarity.pqAdcTopK(emb, cb, m, numQueries = 2, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    for ((qid, qv) <- queries; (cid, cv) <- cb if cid != qid) {
      val d2 = dotd(qv, qv) - 2.0 * dotd(qv, cv) + dotd(cv, cv)
      val expected = math.round(d2 * 1e6)
      val got = adc((qid, cid))
      assert(math.abs(got - expected) <= m,
        s"ADC(q=$qid, cb=$cid) = $got, true micro distance $expected")
    }
  }

  test("pq training beats an arbitrary codebook and is partition-invariant") {
    val m = 4
    val trained = Similarity.pqTrain(emb, m, ksub = 8, iters = 3)
    val trainedB = Similarity.pqTrain(emb.repartition(5), m, ksub = 8, iters = 3)
    trained.zip(trainedB).foreach { case ((_, a), (_, b)) => assert(a == b) }
    val head = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val eTrained = Similarity.pqError(emb, trained, m)
    val eHead = Similarity.pqError(emb, head, m)
    assert(eTrained <= eHead + 1e-6,
      s"trained codebook error $eTrained worse than arbitrary head vectors $eHead")
    // trained codebook drives the full code/search path
    val codes = Similarity.pqCodes(emb, trained, m)
    assert(codes.filter(col("code") < 0 || col("code") >= 8).count() == 0)
  }

  test("ivf-pq with one coarse cell equals plain ADC; trained models run e2e") {
    val cb = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val oneCell = Array(cb.head)
    val adc = Similarity.pqAdcTopK(emb, cb, m = 4, numQueries = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val ivfpq = Similarity.ivfPqTopK(emb, oneCell, cb, m = 4, numQueries = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(ivfpq == adc, "a single coarse cell must not change ADC ranking")
    // trained quantizer + trained codebook end-to-end
    val cents = Similarity.kmeansFit(emb, k = 4, maxIter = 2)
    val trained = Similarity.pqTrain(emb, m = 4, ksub = 8, iters = 2)
    val out = Similarity.ivfPqTopK(emb, cents, trained, m = 4, numQueries = 3, k = 5)
    assert(out.count() > 0)
    assert(out.filter(col("rank") > 5).count() == 0)
  }

  test("semanticDedup drops the higher id of each near-duplicate pair, per cell") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // two well-separated cells; v1 duplicates v0 (same direction,
    // different norm — cosine 1), v4 duplicates v3; v2/v5 are distinct
    val rows = Seq(
      Row(0L, Seq(1.0f, 0.0f, 0.0f)),
      Row(1L, Seq(2.0f, 0.0f, 0.0f)),
      Row(2L, Seq(0.9f, 0.45f, 0.0f)),
      Row(3L, Seq(0.0f, 0.0f, 1.0f)),
      Row(4L, Seq(0.0f, 0.0f, 3.0f)),
      Row(5L, Seq(0.0f, 0.4f, 0.9f)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val cents: Array[(Long, Seq[Float])] =
      Array((0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.0f, 0.0f, 1.0f)))
    val out = Similarity.semanticDedup(df, cents, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(0L -> true, 1L -> false, 2L -> true,
      3L -> true, 4L -> false, 5L -> true))
    // a tighter corpus under a lower threshold still keeps exactly one
    // representative per cell (all within-cell cosines above it)
    val loose = Similarity.semanticDedup(df, cents, threshold = 0.80)
    assert(loose.filter(col("kept")).count() == 2)
    assert(loose.filter(col("kept")).select("vec_id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 3L))
  }

  test("semanticDedup is invariant to the salt-tile bucket cap") {
    val cents = Similarity.kmeansFit(emb, k = 4, maxIter = 2)
    val wide = Similarity.semanticDedup(emb, cents, 0.40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val tiled = Similarity.semanticDedup(emb, cents, 0.40, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(wide == tiled, "tiling must not change the dedup decision")
  }

  test("pq codes land in the codebook id range") {
    val cb = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val out = Similarity.pqCodes(emb, cb, m = 4)
    val n = emb.count()
    assert(out.count() == n * 4)
    assert(out.filter(col("code") < 0 || col("code") >= 8).count() == 0)
  }

  test("AnnIndex round-trips parquet bit-exactly and serves identical queries") {
    import graft.operators.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    val model = AnnIndex.build(emb, k = 4, m = 4, ksub = 8, iters = 3)
    AnnIndex.save(spark, model, emb, dir)
    val loaded = AnnIndex.load(spark, dir)
    assert(loaded.m == model.m)
    assert(loaded.centroids.map(_._1).sameElements(model.centroids.map(_._1)))
    loaded.centroids.zip(model.centroids).foreach {
      case ((_, a), (_, b)) => assert(a == b, "centroid floats must round-trip") }
    loaded.codebook.zip(model.codebook).foreach {
      case ((_, a), (_, b)) => assert(a == b, "codebook floats must round-trip") }
    def rows(mo: AnnIndex.Model) =
      Similarity.ivfPqTopK(emb, mo.centroids, mo.codebook, mo.m,
        numQueries = 3, k = 5).collect().map(_.toSeq).toSet
    assert(rows(loaded) == rows(model), "loaded index must answer identically")
  }

  test("AnnIndex coded corpus prunes to the probed cells' partitions") {
    import graft.operators.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("annidx2").toString
    val model = AnnIndex.build(emb, k = 4, m = 4, ksub = 8, iters = 3)
    AnnIndex.save(spark, model, emb, dir)
    val all = spark.read.parquet(s"$dir/coded")
    val cells = all.select(col("cell").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(cells.length > 1, "fixture must spread over multiple cells")
    val probe = AnnIndex.codedCells(spark, dir, Seq(cells.head))
    // partition pruning: the cell predicate must plan as a
    // PartitionFilter on the scan (directory-level pruning — no data
    // files outside the probed cells are opened)
    val planStr = probe.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      planStr.replaceAll("\\s+", " ").matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      s"cell predicate must prune partitions, not filter rows:\n$planStr")
    // and the probe returns exactly that cell's rows
    val got = probe.select(col("cell").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(cells.head))
    // and the coded rows cover the corpus exactly once
    assert(all.count() == emb.count())
    assert(all.select("vec_id").distinct().count() == emb.count())
  }
}
