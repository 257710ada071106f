package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.analytics.Bucketing
import graft.model._
import graft.streaming.Changefeed

/** Scale-technique checks: bucketed co-located joins and the protocol
  * matrix of the changefeed pipeline. */
class ScaleSpec extends SparkFunSuite {

  test("bucketed fact tables join without a shuffle") {
    val tmp = Files.createTempDirectory("graft-bucket").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_extendedprice")
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", s"$tmp/li", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_bucketed", s"$tmp/ord", "o_orderkey", 8)
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    assert(!Bucketing.hasShuffle(joined),
      s"bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")
    // and it computes the right thing
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)
    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE ord_bucketed")
  }

  test("knnJoin at 16x corpus with broadcast off: shuffled plan, exact row count") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    // 16× self-replicated corpus (~80k vectors at sf0.01) — both
    // sides data-scaled, broadcast disabled: the 100 TB plan shape
    val base = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val big = spark.range(16).crossJoin(base)
      .select((col("vec_id") * 16 + col("id")).as("vec_id"), col("embedding"))
    val centroids = base.filter(pmod(col("vec_id"), lit(61L)) === 0 && col("vec_id") < 61L * 8)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = Similarity.knnJoin(
        big.filter(pmod(col("vec_id"), lit(64L)) === 0), big, centroids, k = 3)
      val nQueries = big.filter(pmod(col("vec_id"), lit(64L)) === 0).count()
      assert(out.count() == nQueries * 3,
        "every query finds a full top-3 (replicas guarantee neighbors)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("pair generators at 10x corpus: saltTile bound holds, tiling is lossless, wall tracks output") {
    import graft.operators.{Dedup, TextOps}
    // 10× replicated sf0.01 documents: every doc gains 9 clones, so
    // every n-gram bucket grows 10× and pair output grows ~100× — the
    // worst-case (duplicate-heavy) shape for the dedup pair machinery
    val base = Tables.documents(spark, "/root/testdata/sf0.01")
    val nDocs = base.count()
    val big = spark.range(10).crossJoin(base)
      .select((col("doc_id") + col("id") * 1000000L).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))

    // (a) the per-task bound: force heavy tiling with a small cap and
    // measure the largest collected group — each (bucket, tile) group
    // is exactly one pair-task's collect input, so this IS the bound
    val cap = 64
    val toks = big.select(col("doc_id"), col("source").as("__blk"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
    val maxGroup = Dedup.saltTile(toks, Seq("__blk", "tok"), col("doc_id"), cap)
      .groupBy(col("__blk"), col("tok"), col("__ti"), col("__tj"))
      .count().agg(max("count")).head().getLong(0)
    // a (ti,tj) group holds two salt classes of EXPECTED size ≈ cap
    // each; salts are hash-assigned (multinomial), so loads
    // concentrate around cap with ~sqrt(cap·ln buckets) fluctuation —
    // 3·cap is the bound with comfortable headroom, and is what keeps
    // any single task O(cap²) regardless of bucket size
    assert(maxGroup <= 3L * cap,
      s"salt-tiled group of $maxGroup elements exceeds the 3*cap=${3 * cap} bound")

    // (b) tiling is a pure partitioning strategy: the pair set under
    // forced heavy tiling equals the default-cap pair set at 10×
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (n1, w1) = timed(Dedup.jaccardPairs(base, "source", 0.8).count())
    val (n10, w10) = timed(Dedup.jaccardPairs(big, "source", 0.8).count())
    val tiled10 = Dedup.jaccardPairs(big, "source", 0.8, maxBucket = cap)
    assert(tiled10.count() == n10, "forced tiling must not change the pair set size")
    // every doc pairs with its 9 identical clones at jaccard 1.0
    assert(n10 >= nDocs * 45, s"clone pairs must appear: $n10 < ${nDocs * 45}")

    // (c) wall tracks output: at 10× input the output grew ~(n10/n1)×;
    // amortized cost per output pair must not degrade by more than the
    // contention slack (quadratic-in-task behavior would blow this up)
    val perPair1 = w1 / math.max(n1, 1L)
    val perPair10 = w10 / math.max(n10, 1L)
    info(f"jaccardPairs 1x: $n1 pairs in $w1%.2f s; 10x: $n10 pairs in $w10%.2f s " +
      f"(per-pair ${perPair10 / perPair1}%.2fx); max tiled group $maxGroup (cap $cap)")
    assert(perPair10 <= perPair1 * 5.0,
      f"per-output-pair cost degraded ${perPair10 / perPair1}%.1fx at 10x")

    // (d) the sibling pair generators complete at 10× on the same
    // salt-tiled machinery with non-trivial output
    val (nc, wc) = timed(Dedup.containmentPairs(big, "source", 3, 0.6).count())
    val (nw, ww) = timed(Dedup.winnowPairs(
      TextOps.winnow(big, 3, 4), minShared = 2L).count())
    info(f"containmentPairs 10x: $nc rows in $wc%.2f s; winnowPairs 10x: $nw rows in $ww%.2f s")
    assert(nc > 0 && nw > 0)
  }

  test("open-batch packer at 400k events / 8 partitions: lossless, " +
      "order-preserving, per-partition memory is the admission-capped slice") {
    import graft.functions.OpenBatch
    // the packer's unit of memory is ONE Kafka partition's micro-batch
    // slice — at scale, flow control (maxOffsetsPerTrigger) bounds it,
    // and parallelism = partition count. This rig packs a slice ~40×
    // the fixture feed's to show the shape holds at volume.
    val n = 400000L
    val parts = 8
    val msgs = spark.range(n).select(
      pmod(col("id"), lit(parts.toLong)).as("_partition"),
      (lit(1000000000L) + col("id")).as("_commit_ts"),
      col("id").as("_row_id"),
      concat(lit("{\"ts\":"), lit(1000000000L) + col("id"),
        lit(",\"scm\":\"app\",\"tbl\":\"t\",\"t\":1}")).as("_key"),
      concat(lit("{\"u\":{\"id\":"), col("id"), lit("}}")).as("_value"))
    val t0 = System.nanoTime()
    val packed = OpenBatch.packOpenBatches(msgs, maxBatchSize = 16)
      .select(col("_partition"), col("_batch_seq"), col("_batch_rows"),
        length(col("_key_bytes")).as("kl"))
      .cache()
    val stats = packed.agg(
      sum(col("_batch_rows")), max(col("_batch_rows")), count(lit(1))).head()
    val wallMs = (System.nanoTime() - t0) / 1000000L
    assert(stats.getLong(0) == n, "every event framed exactly once")
    assert(stats.getInt(1) <= 16)
    // ceil(50000/16) = 3125 batches per partition
    assert(stats.getLong(2) == parts * 3125L, s"batches: ${stats.getLong(2)}")
    // order preserved: round-trip one partition and check ts monotone
    val un = OpenBatch.unpackOpenBatches(
      OpenBatch.packOpenBatches(msgs.filter(col("_partition") === 0L), 16))
      .select(get_json_object(col("_key"), "$.ts").cast("long").as("ts"),
        col("_batch_seq"), col("_batch_idx"))
      .orderBy(col("_batch_seq"), col("_batch_idx"))
      .select("ts").collect().map(_.getLong(0))
    assert(un.length == n.toInt / parts)
    assert(un.zip(un.tail).forall { case (a, b) => a < b }, "commit order kept")
    packed.unpersist()
    info(s"packed $n events into ${stats.getLong(2)} records in ${wallMs} ms")
  }

  test("every wire protocol flows through the changefeed pipeline") {
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val prefixes = Map[Protocol, String](
      Protocol.CanalJson -> "{\"id\":0,\"database\":",
      Protocol.Open -> "{\"",
      Protocol.Debezium -> "{\"before\":",
      Protocol.Csv -> "\"",
      Protocol.Simple -> "{\"version\":1,\"database\":")
    prefixes.foreach { case (proto, prefix) =>
      val cfg = ChangefeedConfig(id = s"cf-$proto",
        sink = SinkConfig(protocol = proto))
      val out = Changefeed.pipeline(spark, cfg)(env)
      val v = out.select("_value").head().getString(0)
      assert(v.startsWith(prefix), s"$proto => $v")
      assert(out.columns.contains("_partition"))
    }
  }

  test("interval join under a hot bucket: broadcast off, exact pair count") {
    import spark.implicits._
    import graft.operators.IntervalJoin
    // 20k probes piled into ONE bucket (the flash-crowd minute) plus a
    // long tail; 50 intervals cover the hot bucket — the skewed shape
    // AQE splits. Broadcast disabled: the row-to-row join must still
    // produce every qualifying pair exactly once.
    val probes = ((0 until 20000).map(i => (i.toLong, 100L + i % 90)) ++
      (0 until 2000).map(i => (50000L + i, 1000L + i.toLong)))
      .toDF("probe_id", "ts")
    val ivs = (0 until 50).map(i => (90000L + i, 100L + i, 200L + i))
      .toDF("interval_id", "s", "e") // all overlap the hot bucket
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val got = IntervalJoin.containment(probes, "ts", ivs, "s", "e", 100L)
      // expected count: probe ts ∈ {100..189} ×(20000/90 each ≈ 223)
      // against intervals [100+i, 200+i] — count analytically
      val hot = (0 until 20000).map(i => 100L + i % 90)
      val tail = (0 until 2000).map(i => 1000L + i.toLong)
      val expected = (hot ++ tail).map { ts =>
        (0 until 50).count(i => ts >= 100L + i && ts <= 200L + i).toLong
      }.sum
      assert(got.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("bm25 at 16x corpus with broadcast off: stopword-hot postings, full top-k") {
    import spark.implicits._
    import graft.operators.Retrieval
    // 8000 docs; "the" hits nearly every one — the hottest posting
    // list the join can see. Broadcast disabled: the 100 TB shape is
    // a hash join on tok plus the (query,doc) score agg — no
    // cartesian, no driver collect, still exactly k rows per query.
    val base = Tables.documents(spark, "/root/testdata/sf0.01")
    // replicate via explode (a fixture crossJoin would put a
    // CartesianProduct in the plan we assert on)
    val big = base
      .select(explode(sequence(lit(0L), lit(15L))).as("rep"), col("doc_id"), col("text"))
      .select((col("doc_id") * 16 + col("rep")).as("doc_id"), col("text"))
    val q = Seq((0L, "the table scan join"), (1L, "stream batch window"))
      .toDF("query_id", "qtext")
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = Retrieval.bm25TopK(big, q, 10)
      assert(!out.queryExecution.executedPlan.toString.contains("CartesianProduct"))
      val rows = out.collect()
      assert(rows.length == 2 * 10, s"expected full top-10 per query, got ${rows.length}")
      assert(rows.forall(_.getLong(3) > 0L), "BM25 scores must stay positive")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }
}
