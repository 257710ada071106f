package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.vectorDot

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k is the correctness baseline; sign-LSH
  * bucketing is the scale path (prunes the candidate set to one
  * bucket before the distance pass — at 100 TB the bucket join
  * replaces the full cross join).
  *
  * Distance arithmetic uses the native codegen
  * [[graft.functions.VectorDot]] expression (tight primitive loop, no
  * per-row array allocation) with norms precomputed once per vector —
  * one dot product per candidate pair instead of three. Accumulation
  * is double-domain left-to-right, so scores are deterministic and
  * engine-portable.
  */
object Similarity {

  /** Sequential-fold double-domain dot product (native expression). */
  def dot(a: Column, b: Column): Column = vectorDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k neighbors for each query vector (queries =
    * `vec_id < numQueries` — a broadcast-sized probe set). Rank by
    * cosine desc with vec_id tie-break; scores rounded for output. */
  def bruteForceTopK(emb: DataFrame, numQueries: Int, k: Int): DataFrame = {
    val cand = emb.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("__n"))
    val queries = cand.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("__n").as("__qn"))
    val scored = cand.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        dot(col("q_emb"), col("embedding")) / (col("__qn") * col("__n")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Sign-LSH bucket id: bit i = (dot(v, plane_i) > 0). Planes are a
    * broadcast-sized DataFrame (plane_id, embedding). */
  def lshBucket(emb: DataFrame, planes: DataFrame): DataFrame = {
    val p = planes.select(col("plane_id"), col("embedding").as("p_emb"))
    emb.crossJoin(broadcast(p))
      .withColumn("__bit",
        when(dot(col("embedding"), col("p_emb")) > 0,
          expr("shiftleft(1L, CAST(plane_id AS INT))")).otherwise(0L))
      .groupBy(col("vec_id"))
      .agg(sum(col("__bit")).as("bucket"))
  }

  /** IVF cell assignment: nearest centroid by dot product (centroids
    * are a broadcast-sized DataFrame (centroid_id, embedding) — in
    * production the k-means output; any deterministic sample works as
    * a coarse quantizer). */
  def ivfAssign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val c = centroids.select(col("centroid_id"), col("embedding").as("c_emb"))
    emb.crossJoin(broadcast(c))
      .withColumn("__d", dot(col("embedding"), col("c_emb")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("__d").as("d"), col("centroid_id").as("cid"))).as("__m"))
      .select(col("vec_id"), col("__m.cid").as("cell"))
  }

  /** IVF top-k search: probe only the query's cell (nprobe=1) — the
    * candidate set shrinks by ~|centroids| vs brute force; recall
    * trades off exactly like the reference's vector-index pattern.
    *
    * The coarse quantizer is broadcast state BY DEFINITION (a k-means
    * output, |centroids| bounded at a few thousand), so it lives
    * driver-side and cell assignment is a single inline
    * `greatest(struct(dot_i, cid_i)...)` expression over the scan —
    * no crossJoin+groupBy shuffle, no join back ([[ivfAssign]] remains
    * the distributed form for quantizers too big to inline). */
  def ivfTopK(emb: DataFrame, centroids: DataFrame, numQueries: Int, k: Int,
              nprobe: Int = 1): DataFrame = {
    val cellScores = inlineCellScores(centroids, nprobe)
    val cellExpr = (if (cellScores.length == 1) cellScores.head
                    else greatest(cellScores.toIndexedSeq: _*)).getField("cid")
    val withCell = emb
      .select(col("vec_id"), col("embedding"), cellExpr.as("cell"),
        norm(col("embedding")).as("__n"))
    if (nprobe == 1) {
      // single-probe: plain equi-join against the broadcast probe set
      val queries = withCell.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("cell").as("q_cell"), col("__n").as("__qn"))
      val scored = withCell.join(broadcast(queries),
          col("cell") === col("q_cell") && col("vec_id") =!= col("query_id"))
        .withColumn("cos",
          dot(col("q_emb"), col("embedding")) / (col("__qn") * col("__n")))
      rankTopK(scored, k)
    } else {
      // multi-probe (the recall knob every IVF index ships): each
      // query probes its nprobe nearest cells. Data side still lives
      // in ONE cell; only the broadcast probe set widens, so the
      // candidate count scales with nprobe, not the corpus. Cell
      // ranking desc by (score, cid) matches the single-probe
      // tie-break exactly.
      val sortedCells = reverse(array_sort(array(cellScores.toIndexedSeq: _*)))
      val probes = transform(slice(sortedCells, 1, nprobe), s => s.getField("cid"))
      val queries = emb.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          probes.as("q_cells"), norm(col("embedding")).as("__qn"))
      val scored = withCell.join(broadcast(queries),
          array_contains(col("q_cells"), col("cell")) &&
            col("vec_id") =!= col("query_id"))
        .withColumn("cos",
          dot(col("q_emb"), col("embedding")) / (col("__qn") * col("__n")))
      rankTopK(scored, k)
    }
  }

  /** Driver-side centroid literals → per-centroid `(dot, cid)` score
    * structs for inline cell assignment (shared by [[ivfTopK]] and
    * [[knnJoin]]). Validates `nprobe` against the centroid count. */
  private def inlineCellScores(centroids: DataFrame, nprobe: Int): Array[Column] = {
    val cents: Array[(Long, Seq[Float])] = centroids
      .select(col("centroid_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    require(cents.nonEmpty, "empty coarse quantizer")
    require(nprobe >= 1 && nprobe <= cents.length, s"nprobe $nprobe out of range")
    cents.map { case (cid, vec) =>
      struct(dot(col("embedding"), typedLit(vec)).as("d"), lit(cid).as("cid"))
    }
  }

  /** Big-big k-NN JOIN: top-k corpus neighbors for EVERY query row,
    * with a data-scaled query side — the shape where [[ivfTopK]]'s
    * broadcast probe set no longer fits (corpus×corpus linking, full
    * near-dup graphs). Both sides compute their IVF cell with the
    * same inline quantizer expression and meet in a plain equi-join
    * on `cell`: Spark hash-partitions BOTH sides by cell — no
    * broadcast anywhere — so one task scores one cell's queries
    * against that cell's corpus slice and the candidate count scales
    * with cell size, never corpus². `nprobe` widens only the query
    * side (each query row explodes to its nprobe nearest cells);
    * the corpus side always lives in exactly ONE cell. A skewed
    * (over-full) cell is ordinary join skew — AQE's skew-join split
    * handles it without custom code.
    *
    * Tie-breaks (cell argmax by (dot, cid); rank by cos desc,
    * vec_id) are identical to [[ivfTopK]], so for a broadcast-sized
    * query set the two paths return bit-equal results (spec-pinned).
    */
  def knnJoin(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int = 1): DataFrame = {
    val cellScores = inlineCellScores(centroids, nprobe)
    val cellExpr = (if (cellScores.length == 1) cellScores.head
                    else greatest(cellScores.toIndexedSeq: _*)).getField("cid")
    // query side: nprobe nearest cells desc by (score, cid) — same
    // ordering as the ivfTopK probe list
    val sortedCells = reverse(array_sort(array(cellScores.toIndexedSeq: _*)))
    val probes = transform(slice(sortedCells, 1, nprobe), s => s.getField("cid"))
    // input-layout skew guard: the per-row cell-assignment expressions
    // (|centroids| dot products per vector) otherwise fuse into an
    // under-parallel scan's single task (no-op on naturally parallel
    // layouts; see Tables.spreadSmallScan)
    val corp = graft.Tables.spreadSmallScan(corpus)
      .select(col("vec_id"), col("embedding"),
        cellExpr.as("cell"), norm(col("embedding")).as("__n"))
    val q = graft.Tables.spreadSmallScan(queries)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"), explode(probes).as("cell"),
        norm(col("embedding")).as("__qn"))
    val scored = q.join(corp, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        dot(col("q_emb"), col("embedding")) / (col("__qn") * col("__n")))
    rankTopK(scored, k)
  }

  /** k-NN label classification: each query vector takes the MAJORITY
    * label of its k nearest corpus neighbors (candidates from the
    * big-big [[knnJoin]], so neither side broadcasts). Votes come
    * from a label join on the k·|queries| neighbor rows — output-
    * sized, not corpus-sized. Deterministic tie-break: most votes,
    * then nearest best-ranked neighbor, then smallest label. */
  def knnClassify(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                  k: Int, nprobe: Int = 1): DataFrame = {
    val nn = knnJoin(queries, corpus, centroids, k, nprobe)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    val votes = nn
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("label").cast("long").as("label")), "neighbor_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"), min(col("rank")).as("best_rank"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("best_rank"), col("label"))
    votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("label").as("pred_label"), col("votes"))
  }

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
  }

  /** Symmetric int8 quantization of an embedding column — the storage
    * path a 100 TB embedding corpus needs (4× smaller than float32;
    * IVF/LSH candidate generation runs on codes, exact rerank on the
    * few candidates). Per-vector scale = max|x| / 127; codes =
    * round(x / scale). Pure columnar higher-order functions — no
    * UDF, no shuffle. */
  def quantizeInt8(emb: DataFrame, embCol: String = "embedding"): DataFrame = {
    val absMax = array_max(transform(col(embCol), x => abs(x)))
    val scale = (absMax / lit(127.0d)).cast("double")
    emb
      .withColumn("scale", scale)
      .withColumn("codes",
        when(col("scale") === 0d,
          transform(col(embCol), _ => lit(0).cast("int")))
          .otherwise(transform(col(embCol),
            x => round(x.cast("double") / col("scale")).cast("int"))))
  }

  /** Dequantize + max reconstruction error (quantization QA metric). */
  def dequantizeError(quantized: DataFrame, embCol: String = "embedding"): DataFrame =
    quantized.withColumn("max_err",
      array_max(zip_with(col(embCol), col("codes"),
        (x, c) => abs(x.cast("double") - c.cast("double") * col("scale")))))

  // ---- k-means quantizer training (Lloyd's) ------------------------
  //
  // The IVF coarse quantizer and the PQ codebooks are k-means outputs
  // in every production ANN index; training them IN the engine closes
  // the loop (no external FAISS pass). Design for 100 TB:
  //  - centroids are control-plane-sized (k ≤ thousands): they live
  //    driver-side as literals, so cell assignment is one inline
  //    codegen expression over the scan — no join, no shuffle;
  //  - the update step is ONE map-side-combined aggregation with
  //    `dim` integer sum columns — no posexplode (which would
  //    multiply the shuffle by dim);
  //  - sums are micro-unit integers (round(x*1e6)): exact under any
  //    partitioning / executor count, so training is bit-reproducible
  //    across runs and cluster sizes — the resume/re-run property a
  //    100 TB pipeline needs (a double sum would drift with the
  //    reduce order);
  //  - each iteration collects k centroids and rebuilds the plan from
  //    literals, so lineage stays depth-1 (no checkpoint needed).

  /** Argmin-L2 cell id as one inline expression: least(struct(d2,
    * cid)) — min distance, min cid on ties. d2 = |x|² - 2·x·c + |c|²
    * with |x|² computed once (`xxCol`) and |c|² folded driver-side
    * exactly like [[graft.functions.VectorDot]] (left-to-right double
    * fold), so the value is bit-equal to the oracle's formulation. */
  private[operators] def nearestCellExpr(cents: Array[(Long, Seq[Float])],
                                         xxCol: Column): Column = {
    val scored = cents.map { case (cid, vec) =>
      val cc = vec.foldLeft(0.0)((a, v) => a + v.toDouble * v.toDouble)
      struct((xxCol - lit(2.0) * dot(col("embedding"), typedLit(vec)) + lit(cc))
        .as("d2"), lit(cid).as("cid"))
    }
    (if (scored.length == 1) scored.head
     else least(scored.toIndexedSeq: _*)).getField("cid")
  }

  /** One Lloyd step, aggregation half: per (cell) member count and
    * per-dimension micro-unit sums (`s0..s{dim-1}`). The output is
    * k rows × dim columns — control-plane-sized. */
  def kmeansStepSums(emb: DataFrame, cents: Array[(Long, Seq[Float])]): DataFrame = {
    val dim = cents.head._2.length
    val assigned = emb
      .withColumn("__xx", dot(col("embedding"), col("embedding")))
      .withColumn("cell", nearestCellExpr(cents, col("__xx")))
    val sums = (0 until dim).map { i =>
      sum(round(element_at(col("embedding"), i + 1).cast("double") * lit(1e6))
        .cast("long")).as(s"s$i")
    }
    assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sums: _*)
  }

  /** Oracle-comparable Lloyd step: (cell, dim, n, mean_val) rows —
    * the k×dim result exploded AFTER aggregation (so the explode is
    * over k rows, not the corpus). */
  def kmeansStep(emb: DataFrame, cents: Array[(Long, Seq[Float])]): DataFrame = {
    val dim = cents.head._2.length
    kmeansStepSums(emb, cents)
      .select(col("cell"), col("n"),
        posexplode(array((0 until dim).map(i => col(s"s$i")): _*)))
      .select(col("cell"), col("pos").cast("long").as("dim"), col("n"),
        (col("col").cast("double") / col("n") / lit(1e6)).as("mean_val"))
  }

  /** Full Lloyd training: deterministic hash-spread init (k smallest
    * by md5-bucket of vec_id — spread like a random draw, stable like
    * a sort), then `maxIter` exact micro-domain update steps. Empty
    * cells keep their previous centroid. Returns (cid, centroid). */
  def kmeansFit(emb: DataFrame, k: Int, maxIter: Int): Array[(Long, Seq[Float])] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val seedOrder = pmod(graft.functions.HashExpressions.md5Prefix64(
      col("vec_id").cast("string"), 15), lit(100003L))
    val init = emb.select(col("vec_id").cast("long"), col("embedding"))
      .orderBy(seedOrder, col("vec_id"))
      .limit(k).collect()
      .sortBy(_.getLong(0))
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Float](1)) }
    require(init.length == k,
      s"k-means needs >= k rows: k=$k, corpus has ${init.length}")
    var cents = init
    var it = 0
    var moved = true
    while (it < maxIter && moved) {
      val byCell = kmeansStepSums(emb, cents).collect()
        .map { r =>
          val n = r.getLong(1)
          val mean = cents.head._2.indices
            .map(i => (r.getLong(2 + i).toDouble / n / 1e6).toFloat)
          r.getLong(0) -> mean
        }.toMap
      val next = cents.map { case (cid, old) =>
        cid -> byCell.getOrElse(cid, old).toSeq
      }
      moved = next.zip(cents).exists { case ((_, a), (_, b)) => a != b }
      cents = next
      it += 1
    }
    cents
  }

  /** Within-cluster sum of squared distances (training QA metric). */
  def kmeansInertia(emb: DataFrame, cents: Array[(Long, Seq[Float])]): Double = {
    val d2s = cents.map { case (cid, vec) =>
      val cc = vec.foldLeft(0.0)((a, v) => a + v.toDouble * v.toDouble)
      col("__xx") - lit(2.0) * dot(col("embedding"), typedLit(vec)) + lit(cc)
    }
    emb.withColumn("__xx", dot(col("embedding"), col("embedding")))
      .select(least(d2s.toIndexedSeq: _*).as("d2"))
      .agg(sum(col("d2"))).head().getDouble(0)
  }

  /** IVF search over a quantizer trained in-engine: kmeansFit →
    * ivfTopK. The end-to-end shape of a production vector index
    * build: train (control-plane-sized model) + assign/search (one
    * scan, broadcast quantizer). */
  def ivfTrainedTopK(emb: DataFrame, k: Int, iters: Int,
                     numQueries: Int, topK: Int, nprobe: Int = 1): DataFrame = {
    val cents = kmeansFit(emb, k, iters)
    val spark = emb.sparkSession
    import spark.implicits._
    val cdf = cents.toSeq.toDF("centroid_id", "embedding")
    ivfTopK(emb, cdf, numQueries, topK, nprobe)
  }

  // ---- product quantization --------------------------------------

  /** Product-quantization codes: the embedding splits into `m`
    * subvectors; each is replaced by the id of its nearest codebook
    * entry (argmin L2, min-cid tie-break — same rule as
    * [[kmeansStepSums]]). With ksub=16/m=4 a 64-dim float vector
    * (256 B) compresses to 4 bytes + scale-free exact ADC tables —
    * the memory path that lets a 100 TB embedding corpus fit an
    * in-RAM index. The codebook is control-plane-sized (ksub full
    * vectors, driver-side literals — in production the per-subspace
    * [[kmeansFit]] output), so coding is inline codegen expressions
    * over the scan: no join, no shuffle, no row multiplication.
    * Output: (vec_id, sub, code) — exploded after coding, m rows per
    * vector. */
  /** Wide form of [[pqCodes]]: (vec_id, embedding, __c0..__c{m-1}) —
    * the shape ADC search consumes (codes stay columnar, no
    * explode). */
  def pqCodesWide(emb: DataFrame, codebook: Array[(Long, Seq[Float])], m: Int): DataFrame = {
    val dim = codebook.head._2.length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    val withSubs = (0 until m).foldLeft(emb) { (df, s) =>
      val xs = slice(col("embedding"), s * sub + 1, sub)
      df.withColumn(s"__x$s", xs).withColumn(s"__xx$s", dot(xs, xs))
    }
    val codeCols = (0 until m).map { s =>
      val scored = codebook.map { case (cid, vec) =>
        val cvec = vec.slice(s * sub, (s + 1) * sub)
        val cc = cvec.foldLeft(0.0)((a, v) => a + v.toDouble * v.toDouble)
        struct((col(s"__xx$s") - lit(2.0) * dot(col(s"__x$s"), typedLit(cvec))
          + lit(cc)).as("d2"), lit(cid).as("cid"))
      }
      (if (scored.length == 1) scored.head
       else least(scored.toIndexedSeq: _*)).getField("cid").as(s"__c$s")
    }
    withSubs.select(col("vec_id") +: col("embedding") +: codeCols: _*)
  }

  def pqCodes(emb: DataFrame, codebook: Array[(Long, Seq[Float])], m: Int): DataFrame =
    pqCodesWide(emb, codebook, m)
      .select(col("vec_id"),
        posexplode(array((0 until m).map(s => col(s"__c$s")): _*)))
      .select(col("vec_id"), col("pos").cast("long").as("sub"),
        col("col").as("code"))

  /** Train PQ codebooks in-engine: m INDEPENDENT k-means fits, one
    * per subvector space (the standard PQ training loop). Each fit is
    * the bit-reproducible micro-domain [[kmeansFit]] over the sliced
    * embedding column; the returned codebook stitches the m subspace
    * centroid sets back into ksub full-width vectors (cid j's
    * subvector s = centroid j of subspace s — the usual PQ codebook
    * layout), ready for [[pqCodes]]/[[pqAdcTopK]]. */
  def pqTrain(emb: DataFrame, m: Int, ksub: Int, iters: Int): Array[(Long, Seq[Float])] = {
    val dim = emb.select(col("embedding")).head().getSeq[Float](0).length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    val perSub: Seq[Array[(Long, Seq[Float])]] = (0 until m).map { s =>
      val sliced = emb.select(col("vec_id"),
        slice(col("embedding"), s * sub + 1, sub).as("embedding"))
      kmeansFit(sliced, ksub, iters)
    }
    (0 until ksub).map { j =>
      j.toLong -> perSub.flatMap(cents => cents(j)._2)
    }.toArray
  }

  /** Total squared quantization error of a codebook over the corpus
    * (PQ training QA): sum over subspaces of the distance to the
    * chosen code. */
  def pqError(emb: DataFrame, codebook: Array[(Long, Seq[Float])], m: Int): Double = {
    val dim = codebook.head._2.length
    val sub = dim / m
    val errs = (0 until m).map { s =>
      val xs = slice(col("embedding"), s * sub + 1, sub)
      val d2s = codebook.map { case (_, vec) =>
        val cvec = vec.slice(s * sub, (s + 1) * sub)
        val cc = cvec.foldLeft(0.0)((a, v) => a + v.toDouble * v.toDouble)
        dot(xs, xs) - lit(2.0) * dot(xs, typedLit(cvec)) + lit(cc)
      }
      (if (d2s.length == 1) d2s.head else least(d2s.toIndexedSeq: _*))
    }.reduce(_ + _)
    emb.select(errs.as("e")).agg(sum(col("e"))).head().getDouble(0)
  }

  /** ADC (asymmetric distance) top-k over PQ codes — how a PQ index
    * is actually searched: each query precomputes one lookup table
    * per subspace (ksub distances to the codebook sub-vectors), and a
    * candidate's distance is m TABLE LOOKUPS + adds over its codes —
    * no float math per candidate at all. Tables are micro-unit longs
    * (exact integer sums, engine-portable); queries+tables broadcast;
    * candidates ride the scan. Codebook cids must be its sorted
    * order (table index = rank of cid).
    * Output: (query_id, rank, neighbor_id, adc_micro).
    *
    * ORACLE BASELINE ONLY — un-pruned: the final `row_number` window
    * ranks EVERY coded row per query in one task (O(corpus) per
    * query). At scale use [[ivfPqTopK]], which prunes candidates to
    * the probed IVF cells before ADC and keeps per-task work
    * cell-sized. */
  def pqAdcTopK(emb0: DataFrame, codebook: Array[(Long, Seq[Float])], m: Int,
                numQueries: Int, k: Int): DataFrame = {
    // input-layout skew guard: re-spread an under-parallel scan before
    // the per-row kernel below (no-op on naturally parallel layouts;
    // see Tables.spreadSmallScan)
    val emb = graft.Tables.spreadSmallScan(emb0)
    val dim = codebook.head._2.length
    val sub = dim / m
    val sorted = codebook.sortBy(_._1)
    require(sorted.zipWithIndex.forall { case ((cid, _), i) => cid == i },
      "ADC lookup indexes tables by code: codebook cids must be 0..ksub-1")
    val queries: Array[(Long, Seq[Float])] = emb
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    // lut(q)(s)(j) = micro(||q_s - c_j,s||²), folds exactly as
    // VectorDot / list_dot_product so the oracle reproduces each entry
    def dotd(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
    val lutRows = queries.map { case (qid, qv) =>
      val luts: Seq[Seq[Long]] = (0 until m).map { s =>
        val qs = qv.slice(s * sub, (s + 1) * sub)
        val qq = dotd(qs, qs)
        sorted.toSeq.map { case (_, cv) =>
          val cs = cv.slice(s * sub, (s + 1) * sub)
          val d2 = qq - 2.0 * dotd(qs, cs) + dotd(cs, cs)
          math.round(d2 * 1e6)
        }
      }
      (qid, luts)
    }
    val spark = emb.sparkSession
    import spark.implicits._
    val q = broadcast(lutRows.toSeq.toDF("query_id", "__luts"))
    val adc = (0 until m).map { s =>
      element_at(element_at(col("__luts"), s + 1),
        col(s"__c$s").cast("int") + 1)
    }.reduce(_ + _)
    val scored = pqCodesWide(emb, codebook, m)
      .crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc_micro", adc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc_micro").asc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), col("adc_micro"))
  }

  /** IVF-PQ search — the canonical billion-scale ANN layout (an
    * IndexIVFPQ): the coarse quantizer routes every vector to a cell;
    * a query probes ONLY its cell and ranks the candidates by ADC
    * over their PQ codes. Candidate count scales with cell size (not
    * corpus size), per-candidate cost is m integer lookups (no float
    * math), and both models are driver-side literals — the whole
    * search is one broadcast join over the scan. Query cells are
    * computed driver-side with the same fold/tie-break as the inline
    * expression, so routing is bit-identical. */
  def ivfPqTopK(emb0: DataFrame, centroids: Array[(Long, Seq[Float])],
                codebook: Array[(Long, Seq[Float])], m: Int,
                numQueries: Int, k: Int): DataFrame = {
    // input-layout skew guard: re-spread an under-parallel scan before
    // the per-row kernel below (no-op on naturally parallel layouts;
    // see Tables.spreadSmallScan)
    val emb = graft.Tables.spreadSmallScan(emb0)
    val dim = codebook.head._2.length
    val sub = dim / m
    val sorted = codebook.sortBy(_._1)
    require(sorted.zipWithIndex.forall { case ((cid, _), i) => cid == i },
      "ADC lookup indexes tables by code: codebook cids must be 0..ksub-1")
    def dotd(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
    val queries = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val qRows = queries.map { case (qid, qv) =>
      val xx = dotd(qv, qv)
      // same (d2, cid) lexicographic argmin as nearestCellExpr
      val qCell = centroids.map { case (cid, cv) =>
        (xx - 2.0 * dotd(qv, cv) + dotd(cv, cv), cid)
      }.min._2
      val luts: Seq[Seq[Long]] = (0 until m).map { s =>
        val qs = qv.slice(s * sub, (s + 1) * sub)
        val qq = dotd(qs, qs)
        sorted.toSeq.map { case (_, cv) =>
          val cs = cv.slice(s * sub, (s + 1) * sub)
          math.round((qq - 2.0 * dotd(qs, cs) + dotd(cs, cs)) * 1e6)
        }
      }
      (qid, qCell, luts)
    }
    val spark = emb.sparkSession
    import spark.implicits._
    val q = broadcast(qRows.toSeq.toDF("query_id", "q_cell", "__luts"))
    val adc = (0 until m).map { s =>
      element_at(element_at(col("__luts"), s + 1),
        col(s"__c$s").cast("int") + 1)
    }.reduce(_ + _)
    val withCell = pqCodesWide(emb, codebook, m)
      .withColumn("__xx", dot(col("embedding"), col("embedding")))
      .withColumn("cell", nearestCellExpr(centroids, col("__xx")))
    val scored = withCell
      .join(q, col("cell") === col("q_cell") && col("vec_id") =!= col("query_id"))
      .withColumn("adc_micro", adc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc_micro").asc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), col("adc_micro"))
  }

  /** Bucketed near-neighbor pairs: same LSH bucket + cosine above
    * threshold. Candidate generation is bucket-collect (one groupBy
    * gathering each bucket's vectors, pairs exploding in place)
    * rather than a bucket self-join — half the shuffles, measured
    * ~2x faster at sf0.1. Norms are computed once per vector before
    * collection. Buckets are memory-bounded by [[Dedup.saltTile]]: a
    * hot bucket (few planes, clustered corpus) splits into
    * ≤ ~2·maxBucket-vector pair-tasks instead of collecting a corpus
    * slice of embeddings into one task's RAM. */
  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with the coarse
    * quantizer, then inside each cluster drop every vector whose
    * cosine similarity to a LOWER-id member of the same cluster
    * reaches `threshold` — one representative per semantic-duplicate
    * group survives. Output: (vec_id, cell, kept) for every vector.
    *
    * Scale shape: clustering bounds candidate generation to
    * within-cell pairs (no corpus² pass anywhere); cells are
    * memory-bounded by [[Dedup.saltTile]] exactly like the LSH/minhash
    * buckets, so one hot cell splits into ≤ ~2·maxBucket-vector tiles
    * instead of collecting a corpus slice into one task; the dropped
    * set (duplicate-density-sized) broadcasts back onto the
    * assignment stream. Cell assignment is the same inline
    * `least(struct(d2, cid))` expression the IVF/k-means family uses —
    * zero assignment shuffle. Cosines compare at 6-decimal rounding
    * ([[lshNeighbors]]' engine-portable boundary). */
  def semanticDedup(emb: DataFrame, cents: Array[(Long, Seq[Float])],
                    threshold: Double,
                    maxBucket: Int = Dedup.DefaultBucketCap): DataFrame = {
    val assigned = emb
      .withColumn("__xx", dot(col("embedding"), col("embedding")))
      .withColumn("cell", nearestCellExpr(cents, col("__xx")))
      .select(col("vec_id"), col("embedding"), col("cell"),
        sqrt(col("__xx")).as("__n"))
    val tiles = Dedup.saltTile(assigned, Seq("cell"), col("vec_id"), maxBucket)
      .groupBy(col("cell"), col("__ti"), col("__tj"))
      .agg(collect_list(struct(
        col("vec_id"), col("embedding"), col("__n"), col("__s"))).as("__vs"))
      .filter(size(col("__vs")) > 1)
    val dropped = tiles
      .withColumn("a", explode(col("__vs")))
      .withColumn("b", explode(col("__vs")))
      .filter(Dedup.tilePair(col("a.__s"), col("b.__s"),
        col("a.vec_id"), col("b.vec_id")))
      .withColumn("cos",
        dot(col("a.embedding"), col("b.embedding")) / (col("a.__n") * col("b.__n")))
      .filter(round(col("cos"), 6) >= threshold)
      .select(greatest(col("a.vec_id"), col("b.vec_id")).as("__drop"))
      .distinct()
    assigned.select(col("vec_id"), col("cell"))
      .join(broadcast(dropped), col("vec_id") === col("__drop"), "left_outer")
      .select(col("vec_id"), col("cell"), col("__drop").isNull.as("kept"))
  }

  def lshNeighbors(emb: DataFrame, planes: DataFrame, threshold: Double,
                   maxBucket: Int = Dedup.DefaultBucketCap): DataFrame = {
    val withBucket = emb.join(lshBucket(emb, planes), "vec_id")
      .select(col("vec_id"), col("embedding"), col("bucket"),
        norm(col("embedding")).as("__n"))
    val buckets = Dedup.saltTile(withBucket, Seq("bucket"), col("vec_id"), maxBucket)
      .groupBy(col("bucket"), col("__ti"), col("__tj"))
      .agg(collect_list(struct(
        col("vec_id"), col("embedding"), col("__n"), col("__s"))).as("__vs"))
      .filter(size(col("__vs")) > 1)
    buckets
      .withColumn("a", explode(col("__vs")))
      .withColumn("b", explode(col("__vs")))
      .filter(Dedup.tilePair(col("a.__s"), col("b.__s"),
        col("a.vec_id"), col("b.vec_id")))
      .withColumn("cos",
        dot(col("a.embedding"), col("b.embedding")) / (col("a.__n") * col("b.__n")))
      .filter(round(col("cos"), 6) >= threshold)
      .select(least(col("a.vec_id"), col("b.vec_id")).as("vec_a"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("vec_b"),
        col("bucket"), round(col("cos"), 6).as("cos_sim"))
  }

  /** Embedding-space outlier detection for corpus curation: the k
    * vectors per label farthest (squared L2) from their label's
    * centroid. The far tail of a cluster is where mislabeled /
    * off-distribution training examples live.
    *
    * All arithmetic is exact 64-bit integer so the score is
    * bit-identical at any parallelism and across engines: embeddings
    * quantize to milli-units, and instead of dividing the centroid
    * (sum/cnt — a rational), the distance is scaled by cnt²:
    * `ssq = Σ_d (cnt·v_d − sum_d)²  =  cnt² · ‖v − centroid‖²`,
    * which preserves the per-label ranking. (Magnitude bound:
    * |cnt·v| ≤ 10⁵·10³ at sf0.1 → ssq ≤ ~10¹⁶·dim, inside int64;
    * at petabyte label sizes the milli-quantization drops to
    * centi-units — same plan.)
    *
    * Plan shape: one map-side-combined aggregation producing the
    * label×dim stat table (posexplode combines to label×dim rows per
    * task before the exchange), then the stats collapse to one array
    * row per label and broadcast-join back onto the scan, where the
    * score folds per-row (zip_with + aggregate) — the data side
    * never shuffles. The final top-k window sorts label-count rows,
    * not the corpus... per label only k survive the rank filter. */
  def embeddingOutliers(emb: DataFrame, k: Int): DataFrame = {
    val vm = transform(col("embedding"),
      v => round(v.cast("double") * 1000).cast("long"))
    val base = emb.select(col("vec_id"), col("label"), vm.as("__vm"))
    val stats = base
      .select(col("label"), posexplode(col("__vm")).as(Seq("d", "v")))
      .groupBy(col("label"), col("d"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("cnt"))
      .groupBy(col("label"))
      .agg(max(col("cnt")).as("cnt"),
        transform(array_sort(collect_list(struct(col("d"), col("s")))),
          x => x("s")).as("sums"))
    val diff = (v: Column, sd: Column) => col("cnt") * v - sd
    val scored = base.join(broadcast(stats), "label")
      .select(col("label"), col("vec_id"),
        aggregate(zip_with(col("__vm"), col("sums"),
          (v, sd) => diff(v, sd) * diff(v, sd)), lit(0L), (acc, x) => acc + x)
          .as("ssq"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("ssq").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= k)
      .select(col("label"), col("rank"), col("vec_id"), col("ssq"))
  }
}
