package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale soak (VERDICT r9 task #8): self-replicate the sf0.1
  * documents tenfold and run the five most expensive bench composites
  * plus the MQ stream rig at 1× and 10×, measuring the scaling
  * exponent of each: `exp = log(t10/t1) / log 10`, so 1.0 is linear,
  * <1 sublinear amortization, and anything ≫1 means a plan that would
  * not survive the next 10×.
  *
  * TWO replication regimes (VERDICT r10 task #7):
  *  - `clone` (default): every doc gains 9 byte-identical clones —
  *    the duplicate-HEAVY worst case; pair output grows ~100×, so
  *    wall clock is expected to track OUTPUT and the per-output-pair
  *    cost + largest salt-tile group are recorded alongside.
  *  - `mutated`: every clone has half its tokens replica-salted,
  *    pushing each replica past the LSH/Jaccard thresholds — a 10×
  *    corpus with the SAME true-duplicate mass as 1× (the huge-corpus
  *    few-duplicates regime). Pair WALLS must collapse toward
  *    corpus-linear: a pair wall that stays at its clone-mode level
  *    while output does not grow is a candidate-generation plan bug.
  *
  * Usage: `runMain graft.Soak [sfDir] [clone|mutated]`.
  * Prints one JSON line; a full-detail copy lands in soak_full.json
  * (mutated mode: soak_mutated.json).
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.drop(1).headOption.getOrElse("clone")
    require(mode == "clone" || mode == "mutated", s"unknown soak mode $mode")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Retrieval, TextOps}

    val base = Tables.documents(spark, sfDir).cache()
    val nDocs = base.count()
    // replica 0 keeps the original bytes; in mutated mode replicas 1-9
    // salt every second token with the replica id, so each replica's
    // shingle set shares ~1/3 of a clone's (Jaccard ≈ n/2 over 3n/2)
    // — far below every pair threshold in use
    val cloneText =
      if (mode == "clone") col("text")
      else when(col("id") === 0L, col("text")).otherwise(
        array_join(
          zip_with(
            split(col("text"), " "),
            sequence(lit(0), size(split(col("text"), " ")) - 1),
            (t, i) => when(i % 2 === 0,
              concat(t, lit("_r"), col("id"))).otherwise(t)),
          " "))
    val big = spark.range(10).crossJoin(base)
      .select((col("doc_id") + col("id") * 10000000L).as("doc_id"),
        cloneText.as("text"), col("lang"), col("source"), col("n_chars"))
      .cache()
    big.count()

    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    def exp(t1: Double, t10: Double): Double =
      math.log(t10 / t1) / math.log(10.0)

    // the five most expensive bench composites (BENCH_r10 order),
    // parameterized exactly like their DataQueries entries — but over
    // the replicated frame instead of the doc_id<500 oracle slice
    val composites: Seq[(String, DataFrame => Long)] = Seq(
      "dedup_verified" -> ((d: DataFrame) =>
        Dedup.editVerifiedPairs(d,
          Dedup.jaccardPairs(d, "source", DataQueries.jaccardThreshold),
          maxEditRatio = 0.6, capLen = 256, perDocBudget = 3,
          budgetOrder = Seq(col("jaccard").desc, col("doc_b"))).count()),
      "hybrid_rrf" -> ((d: DataFrame) =>
        Retrieval.hybridRrf(d, DataQueries.hashedDim,
          DataQueries.annQueries, DataQueries.annK).count()),
      "containment" -> ((d: DataFrame) =>
        Dedup.containmentPairs(d, "source", DataQueries.containShingle,
          DataQueries.containThreshold).count()),
      "dedup_fuzzy" -> ((d: DataFrame) =>
        Dedup.fuzzyDedupKeep(d, "source", DataQueries.clusterThreshold).count()),
      "dedup_clusters" -> ((d: DataFrame) =>
        Dedup.clusters(Dedup.jaccardPairs(
          d, "source", DataQueries.clusterThreshold)).count()))

    // JIT warm at the correctness SF (plan shape is scale-invariant)
    val warm = Tables.documents(spark, "/root/testdata/sf0.01")
    composites.foreach { case (_, f) => try f(warm) catch { case _: Throwable => () } }

    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val rows = composites.map { case (name, f) =>
      def safeTimed(d: DataFrame): (Long, Double) =
        try timed(f(d)) catch { case e: Throwable =>
          println(s"[soak] $name FAILED: ${e.getMessage}"); (-1L, -1.0)
        }
      val (n1, t1) = safeTimed(base)
      val (n10, t10) = safeTimed(big)
      val perOut1 = t1 / math.max(n1, 1L)
      val perOut10 = t10 / math.max(n10, 1L)
      val j = s""""$name":{"t1_sec":${r3(t1)},"t10_sec":${r3(t10)},""" +
        s""""out1":$n1,"out10":$n10,"exp":${r3(exp(t1, t10))},""" +
        s""""per_out_ratio":${r3(perOut10 / perOut1)}}"""
      println(s"[soak] $name 1x: $n1 rows in ${r3(t1)}s; 10x: $n10 rows in " +
        s"${r3(t10)}s; exp=${r3(exp(t1, t10))} perOutRatio=${r3(perOut10 / perOut1)}")
      j
    }

    // the salt-tile bound AT sf1 scale: the largest (bucket, tile)
    // group is one pair-task's collect input
    val cap = Dedup.DefaultBucketCap
    val toks = big.select(col("doc_id"), col("source").as("__blk"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
    val maxGroup = Dedup.saltTile(toks, Seq("__blk", "tok"), col("doc_id"), cap)
      .groupBy(col("__blk"), col("tok"), col("__ti"), col("__tj"))
      .count().agg(max("count")).head().getLong(0)

    // the MQ stream rig at 1× (400k) and 10× (4M) rows
    def streamSec(rows: Long): Double = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-soak-stream").toString
      val cfg = graft.model.ChangefeedConfig(id = "soak-stream",
        sink = graft.model.SinkConfig(fixtureRenderer = true))
      val raw = spark.readStream.format("graft.sources.ChangelogGenSource")
        .option("tables", 1000).option("rowsPerBatch", 200000)
        .option("totalRows", rows)
        .option("numPartitions", spark.sparkContext.defaultParallelism)
        .load()
      val t0 = System.nanoTime()
      graft.streaming.Changefeed.runMqStream(spark, cfg,
        graft.model.Envelope.fromFlat(raw), s"$tmp/sink", s"$tmp/ckpt")
        .awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    // the stream rig is duplicate-density-independent: run it only in
    // the clone (default) regime
    val (s1, s10) =
      if (mode == "mutated") (-1.0, -1.0)
      else { streamSec(4000L); (streamSec(400000L), streamSec(4000000L)) }

    val streamJson =
      if (mode == "mutated") "null"
      else s"""{"t400k_sec":${r3(s1)},"t4m_sec":${r3(s10)},""" +
        s""""rps_400k":${r3(400000 / s1)},"rps_4m":${r3(4000000 / s10)},""" +
        s""""exp":${r3(exp(s1, s10))}}"""
    val line = s"""{"metric":"soak","mode":"$mode","sf_dir":"$sfDir",""" +
      s""""docs_1x":$nDocs,""" +
      s""""max_salt_tile_group":$maxGroup,"salt_cap":$cap,""" +
      s""""stream":$streamJson,""" +
      s""""composites":{${rows.mkString(",")}}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        if (mode == "mutated") "soak_mutated.json" else "soak_full.json"),
      line + "\n")
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
