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

  test("every wire protocol flows through the changefeed pipeline") {
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val prefixes = Map[Protocol, String](
      Protocol.CanalJson -> "{\"id\":0,\"database\":",
      Protocol.Open -> "{\"",
      Protocol.Debezium -> "{\"before\":",
      Protocol.Csv -> "\"")
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
