package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.model.Envelope
import graft.operators._

/** Operator semantics on hand-built envelopes (the reference's
  * fixtures-as-SQL unit-test style, SURVEY §5.1). */
class OperatorSpec extends SparkFunSuite {

  /** (rowId, op, userId, value, k) → envelope row; U synthesizes a
    * pre-image like Envelope.fromEvents does. */
  private def mkEnv(rows: Seq[(Long, String, Long, Double, Long)]): DataFrame = {
    import spark.implicits._
    val base = rows.toDF("_row_id", "_op", "user_id", "value", "k")
      .withColumn("_schema", lit("app"))
      .withColumn("_table", concat(lit("t"), pmod(col("user_id"), lit(2L))))
      .withColumn("_commit_ts", lit(1000000000L) + col("_row_id") * 1000L)
      .withColumn("_start_ts", col("_commit_ts") - 1L)
    val img = struct(col("user_id"), col("value"), col("k"))
    val pre = struct(col("user_id"), (col("value") - 1.0).as("value"), (col("k") - 1L).as("k"))
    base.select(
      col("_row_id"), col("_schema"), col("_table"), col("_op"),
      col("_commit_ts"), col("_start_ts"),
      when(col("_op") === "I", lit(null)).otherwise(when(col("_op") === "D", img).otherwise(pre)).as("before"),
      when(col("_op") === "D", lit(null)).otherwise(img).as("after"))
  }

  private val sample = mkEnv(Seq(
    (1L, "I", 1L, 10.0, 100L),
    (2L, "U", 1L, 11.0, 101L),
    (3L, "D", 1L, 11.0, 101L),
    (4L, "I", 2L, 20.0, 200L),
    (5L, "U", 2L, 21.0, 201L)))

  test("update split explodes key-changing updates into D+I in order") {
    val out = Transforms.updateSplit(sample, Seq("k"))
    assert(out.count() == 7) // 2 updates -> 4 rows
    val ops = out.filter(col("_row_id") === 2L)
      .orderBy(Envelope.opOrder(col("_op")))
      .select("_op").collect().map(_.getString(0)).toSeq
    assert(ops == Seq("D", "I"))
    // non-key-changing updates stay intact
    val noSplit = Transforms.updateSplit(sample, Seq("user_id"))
    assert(noSplit.count() == 5)
  }

  test("updated-columns-only nulls unchanged fields but keeps handle keys") {
    // craft an update where value is unchanged between images
    val env = mkEnv(Seq((1L, "U", 1L, 10.0, 100L)))
      .withColumn("before", struct(
        col("before.user_id"), col("after.value").as("value"), col("before.k")))
    val out = Transforms.updatedColumnsOnly(env, Seq("user_id"))
    val r = out.select("after.user_id", "after.value", "after.k").head()
    assert(!r.isNullAt(0), "handle key kept")
    assert(r.isNullAt(1), "unchanged value nulled")
    assert(r.getLong(2) == 100L, "changed k kept")
  }

  test("expression filter drops per-op against the right image") {
    val out = Filters.exprFilter(spark, sample,
      ignoreInsert = Some("value >= 20"),
      ignoreDelete = Some("user_id = 1"))
    val kept = out.select("_row_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 5L)) // drops I(4): value 20; D(3): user 1
  }

  test("update-only-columns filter drops noise updates") {
    // updates where only `value` differs are noise when value is ignorable
    val env = mkEnv(Seq((1L, "U", 1L, 10.0, 100L)))
      .withColumn("before", struct(
        col("before.user_id"), col("before.value"), col("after.k").as("k")))
    assert(Filters.updateOnlyColumnsFilter(env, Seq("value")).count() == 0)
    assert(Filters.updateOnlyColumnsFilter(env, Seq("k")).count() == 1)
  }

  test("schema as-of resolves greatest version <= commit ts") {
    import spark.implicits._
    val versions = Seq(
      ("app", "t1", 1000002000L), ("app", "t1", 1000004000L),
      ("app", "t0", 1000001000L))
      .toDF("_schema", "_table", "version_ts")
    val out = SchemaAsOf.resolve(sample, versions)
      .select("_row_id", "_schema_version").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // rows on t1 (user_id=1): commits 1000001000(I,row1), 1000002000(U,row2), 1000003000(D,row3)
    assert(out(1L) == -1L, "before first version -> null")
    assert(out(2L) == 1000002000L)
    assert(out(3L) == 1000002000L)
    // t0 rows (user 2): commits 1000004000, 1000005000 -> version 1000001000
    assert(out(4L) == 1000001000L && out(5L) == 1000001000L)
  }

  test("event order: delete sorts before insert at same commit ts") {
    val env = mkEnv(Seq((1L, "I", 1L, 1.0, 1L), (2L, "D", 1L, 1.0, 1L)))
      .withColumn("_commit_ts", lit(5L)).withColumn("_start_ts", lit(4L))
    val seq = EventOrder.withSequence(env)
      .select("_op", "_seq").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seq("D") == 1L && seq("I") == 2L)
  }

  test("routing: partition stable across runs and within range") {
    val out = Routing.partitionByKeyColumns(sample, Seq("user_id"), 16)
      .select("_partition").collect().map(_.getLong(0))
    assert(out.forall(p => p >= 0 && p < 16))
    val out2 = Routing.partitionByKeyColumns(sample, Seq("user_id"), 16)
      .select("_partition").collect().map(_.getLong(0))
    assert(out.toSeq == out2.toSeq)
  }

  test("mysql sink emits per-key ordered statements") {
    val stmts = graft.sinks.MysqlSink
      .statements(sample, Seq("user_id"), 4, safeMode = true)
      .orderBy(col("_partition"), col("_commit_ts"), col("_start_ts"),
        Envelope.opOrder(col("_op")), col("_row_id"))
      .collect()
    assert(stmts.length == 5)
    val sql = stmts.map(_.getAs[String]("_stmt"))
    assert(sql.exists(_.startsWith("REPLACE INTO `app`.`t1` (`user_id`,`value`,`k`) VALUES (1,")))
    assert(sql.contains("DELETE FROM `app`.`t1` WHERE `user_id` = 1 LIMIT 1"))
    // all statements of one key share a partition => per-key total order
    val perKey = stmts.groupBy(r => r.getAs[String]("_stmt").contains("= 1") ||
      r.getAs[String]("_stmt").contains("(1,"))
    perKey.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("_partition")).toSet.size == 1)
    }
    // applyBatch runs end-to-end (blackhole executor)
    graft.sinks.MysqlSink.applyBatch(sample, Seq("user_id"), 4, safeMode = true)(_ => ())
  }

  test("txn-atomic apply frames each upstream transaction in BEGIN/COMMIT") {
    // bucket rows into multi-row txns (2 rows per (user, minute))
    val txn = sample
      .withColumn("_commit_ts", lit(1000L) + pmod(col("_row_id"), lit(2L)) * 0L)
      .withColumn("_start_ts", col("_commit_ts") - 1L)
    val dir = java.nio.file.Files.createTempDirectory("graft-atomic").toString
    graft.sinks.MysqlSink.applyBatchTxnAtomic(txn, safeMode = true, numWorkers = 2) { it =>
      val stmts = it.toSeq
      if (stmts.nonEmpty)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, java.util.UUID.randomUUID().toString + ".sql"),
          scala.jdk.CollectionConverters.SeqHasAsJava(stmts).asJava)
    }
    val partitions = new java.io.File(dir).listFiles().toSeq
      .map(f => scala.io.Source.fromFile(f).getLines().toSeq)
    val all = partitions.flatten
    assert(all.count(_ == "BEGIN") == all.count(_ == "COMMIT"))
    assert(all.count(_ == "BEGIN") > 0)
    partitions.foreach { stmts =>
      // frames alternate: BEGIN, stmts..., COMMIT, BEGIN, ...
      var open = false
      stmts.foreach {
        case "BEGIN" => assert(!open, "no nested BEGIN"); open = true
        case "COMMIT" => assert(open, "COMMIT only closes an open frame"); open = false
        case s => assert(open, s"statement outside txn frame: $s")
      }
      assert(!open, "every frame closed")
    }
    // each txn's rows are contiguous inside exactly one frame: count
    // frames == distinct (schema, table, start, commit) groups
    val nTxns = txn.select("_schema", "_table", "_start_ts", "_commit_ts")
      .distinct().count()
    assert(all.count(_ == "BEGIN") == nTxns)
  }

  test("composite handle keys: multi-column null-safe WHERE in every statement") {
    // many_pk_or_uk coverage: (user_id, k) as the handle key
    val stmts = graft.sinks.MysqlSink.statements(
      sample, Seq("user_id", "k"), 4, safeMode = false)
      .select("_op", "_stmt").collect().map(r => (r.getString(0), r.getString(1)))
    val deletes = stmts.filter(_._1 == "D").map(_._2)
    assert(deletes.nonEmpty)
    deletes.foreach { s =>
      assert(s.contains("`user_id` = ") && s.contains(" AND `k` = "), s)
      assert(s.endsWith("LIMIT 1"), s)
    }
    val updates = stmts.filter(_._1 == "U").map(_._2)
    updates.foreach { s =>
      assert(s.contains("WHERE `user_id` = ") && s.contains(" AND `k` = "), s)
    }
    // and the conflict partition hashes BOTH key columns: changing k
    // moves the row to a (generally) different partition
    val p1 = Routing.partitionByKeyColumns(sample, Seq("user_id", "k"), 64)
      .select("_row_id", "_partition").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shifted = sample.withColumn("after",
      when(col("after").isNotNull, struct(
        col("after.user_id").as("user_id"), col("after.value").as("value"),
        (col("after.k") + 1000L).as("k"))).otherwise(col("after")))
    val p2 = Routing.partitionByKeyColumns(shifted, Seq("user_id", "k"), 64)
      .select("_row_id", "_partition").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1.keys.exists(id => p1(id) != p2(id)), "k participates in the conflict hash")
  }

  test("generated-column conflict key: virtual column drives the partition hash") {
    // conflict_key_generated_column coverage: vk = value*2+k evaluated
    // into the images, then used as the routing/conflict key
    val withV = Filters.withVirtualColumns(spark, sample, Seq("vk" -> "value * 2 + k"))
    val parts = Routing.partitionByKeyColumns(withV, Seq("vk"), 16)
      .select("_row_id", "_partition").collect()
    assert(parts.nonEmpty && parts.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 16))
    // same vk -> same partition, deterministically
    val again = Routing.partitionByKeyColumns(withV, Seq("vk"), 16)
      .select("_row_id", "_partition").collect()
    assert(parts.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("mysql sink non-safe mode renders real UPDATE against pre-image key") {
    val sql = graft.sinks.MysqlSink
      .statements(sample, Seq("user_id"), 4, safeMode = false)
      .collect().map(_.getAs[String]("_stmt"))
    assert(sql.exists(_.startsWith("INSERT INTO `app`.`t1` (`user_id`,`value`,`k`) VALUES (1,")))
    assert(sql.contains(
      "UPDATE `app`.`t1` SET `user_id` = 1, `value` = 11.00, `k` = 101 WHERE `user_id` = 1 LIMIT 1"))
    assert(sql.forall(s => !s.startsWith("REPLACE")))
  }

  test("prefix-filtered jaccard pairs equal the naive token join exactly") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).sorted.toSeq
    val naive = Dedup.jaccardPairs(docs, "source", 0.5)
    val prefix = Dedup.jaccardPairsPrefix(docs, "source", 0.5)
    assert(naive.count() > 0, "fixture produces pairs")
    assert(canon(prefix) == canon(naive))
    // also at a lower threshold (longer prefixes) and higher (shorter)
    assert(canon(Dedup.jaccardPairsPrefix(docs, "source", 0.8)) ==
      canon(Dedup.jaccardPairs(docs, "source", 0.8)))
  }

  test("salt-tiled pair generation is exact under a degenerate hot-token corpus") {
    // every doc shares token "hot" (a stop-word-grade bucket); with a
    // tiny cap the bucket must split into bounded pair-tasks and still
    // emit exactly the uncapped answer — per-task state stays ~2*cap
    import spark.implicits._
    val docs = (0L until 120L).map { i =>
      (i, "blk", s"hot u$i shared${i % 7} shared${(i + 1) % 7}")
    }.toDF("doc_id", "source", "text")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).sorted.toSeq
    val uncapped = Dedup.jaccardPairs(docs, "source", 0.3, maxBucket = Int.MaxValue)
    val capped = Dedup.jaccardPairs(docs, "source", 0.3, maxBucket = 8)
    assert(uncapped.count() > 0, "fixture produces pairs")
    assert(canon(capped) == canon(uncapped))
    assert(canon(Dedup.jaccardPairsPrefix(docs, "source", 0.3, maxBucket = 8)) ==
      canon(uncapped))

    // minhash band buckets: all docs distinct sigs, shared bands force
    // one hot bucket; capped == uncapped
    val sigs = Dedup.minhashSignatures(docs)
    assert(canon(Dedup.minhashPairs(sigs, maxBucket = 4)) ==
      canon(Dedup.minhashPairs(sigs, maxBucket = Int.MaxValue)))

    // lsh buckets: one plane → two buckets, heavily loaded
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val planes = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 1)
      .select(org.apache.spark.sql.functions.col("vec_id").as("plane_id"),
        org.apache.spark.sql.functions.col("embedding"))
    assert(canon(Similarity.lshNeighbors(emb, planes, 0.1, maxBucket = 16)) ==
      canon(Similarity.lshNeighbors(emb, planes, 0.1, maxBucket = Int.MaxValue)))
  }

  test("ineligible tables drop unless force-replicate") {
    val out = Filters.eligibleTableFilter(sample, Seq(("app", "t1")))
    assert(out.select("_table").distinct().collect().map(_.getString(0)).toSeq == Seq("t0"))
    val forced = Filters.eligibleTableFilter(sample, Seq(("app", "t1")), forceReplicate = true)
    assert(forced.count() == sample.count())
  }

  test("collation-aware conflict keys co-partition ci-collated strings") {
    import spark.implicits._
    val env = Seq(("ABC", 1L), ("abc", 2L)).toDF("name", "_row_id")
      .withColumn("_schema", lit("app")).withColumn("_table", lit("t"))
      .withColumn("_op", lit("I"))
      .withColumn("_commit_ts", lit(10L)).withColumn("_start_ts", lit(9L))
      .withColumn("after", struct(col("name")))
      .withColumn("before", when(lit(false), struct(col("name"))))
      .drop("name")
    def parts(ci: Boolean): Seq[Long] =
      Routing.partitionByKeyColumns(env, Seq("name"), 1024, caseInsensitiveKeys = ci)
        .select("_partition").collect().map(_.getLong(0)).toSeq
    val ci = parts(true)
    assert(ci.distinct.size == 1, "ci collation: ABC and abc share a partition")
    assert(parts(false).distinct.size == 2, "cs collation: they separate")
  }

  test("cluster assignment equals union-find over the pair graph") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = Dedup.minhashPairs(Dedup.minhashSignatures(docs))
    val assigned = Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // ground truth: driver-side union-find over the same pairs
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = assigned.keys.map(d => d -> find(d)).toMap
    assert(assigned.nonEmpty && assigned == truth,
      "every doc labeled with the min reachable doc id")
    // cluster representatives label themselves
    assert(assigned.values.toSet.forall(c => assigned(c) == c))
  }

  test("dedup exact keeps min id per identical text") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y")).toDF("doc_id", "text")
    val out = Dedup.exact(docs).collect()
    assert(out.length == 2)
    val dup = out.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 1L)
  }

  test("simhash: identical docs collide, disjoint docs differ") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark table join merge"), (2L, "spark table join merge"),
      (3L, "completely different words here")).toDF("doc_id", "text")
    val out = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
    assert(out.values.forall(v => v >= 0 && v < 65536))
  }

  test("minhash: near-identical docs share bands; candidates include them") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away today"),
      (2L, "the quick brown fox jumps over the lazy dog and runs far away tonight"),
      (3L, "completely unrelated vocabulary about spark shuffle partitions")).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(Dedup.minhashSignatures(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("ivf multi-probe: nprobe=1 tie-break matches, recall never drops") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(pmod(col("vec_id"), lit(13L)) === 0 && col("vec_id") < 13L * 8)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(Similarity.bruteForceTopK(emb, 5, 10))
    val p1 = hits(Similarity.ivfTopK(emb, centroids, 5, 10, nprobe = 1))
    val p3 = hits(Similarity.ivfTopK(emb, centroids, 5, 10, nprobe = 3))
    // more probes → candidate superset → recall monotonically up
    assert((p3 intersect exact).size >= (p1 intersect exact).size,
      s"recall@10 must not drop with nprobe (1: ${(p1 intersect exact).size}, 3: ${(p3 intersect exact).size})")
    // probing every cell = brute force exactly
    val pAll = hits(Similarity.ivfTopK(emb, centroids, 5, 10, nprobe = 8))
    assert(pAll == exact, "nprobe = #cells recovers the exact top-k")
  }

  test("knnJoin: bit-equal to ivfTopK, and survives with broadcast disabled") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(pmod(col("vec_id"), lit(13L)) === 0 && col("vec_id") < 13L * 8)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // equivalence with the broadcast path, single- and multi-probe
    for (np <- Seq(1, 2)) {
      val bc = rows(Similarity.ivfTopK(emb, centroids, 5, 10, nprobe = np))
      val jn = rows(Similarity.knnJoin(
        emb.filter(col("vec_id") < 5), emb, centroids, 10, nprobe = np))
      assert(jn == bc, s"knnJoin must equal ivfTopK at nprobe=$np")
    }
    // the scale property: with broadcast off entirely, the cell
    // equi-join still runs (shuffled join, both sides partitioned by
    // cell) and results are unchanged
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val full = Similarity.knnJoin(emb, emb, centroids, 5)
      val p = full.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoopJoin"),
        "big-big kNN join must not depend on a broadcast")
      assert(full.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("cosine similarity of orthogonal and identical vectors") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("cos"))
    val cs = df.collect().map(_.getDouble(0))
    assert(math.abs(cs(0) - 1.0) < 1e-12)
    assert(math.abs(cs(1)) < 1e-12)
  }

  test("multimodal decode batch matches expression path") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "abc")).toDF("doc_id", "text")
    val withBlob = Multimodal.withBlob(docs)
    val batch = Multimodal.decodeBatch(spark, withBlob)
      .select("doc_id", "n_bytes", "width").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(batch == Set((1L, 11, 11), (2L, 3, 3)))
  }

  test("multimodal feature extraction is deterministic per blob") {
    import spark.implicits._
    val docs = Seq((1L, "abcd"), (2L, "abcd"), (3L, "zzzz")).toDF("doc_id", "text")
    val feats = Multimodal.featureExtractBatch(Multimodal.withBlob(docs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(feats(1L) == feats(2L))
    assert(feats(1L) != feats(3L))
    assert(feats(1L) == Seq(97L, 98L, 99L, 100L)) // 'a','b','c','d' byte values
  }

  test("bdr loop prevention: cdc-written rows drop, unmarked logs pass through") {
    import spark.implicits._
    val marked = Seq((1L, 0L), (2L, 1L), (3L, 0L))
      .toDF("_row_id", "_cdc_write_source")
      .withColumn("_cdc_write_source",
        when(col("_row_id") === 3L, lit(null)).otherwise(col("_cdc_write_source")))
    val kept = Filters.cdcWriteSourceFilter(marked)
      .select("_row_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), "cdc-sourced row 2 drops; null marker = user write")
    // a log without the marker column is untouched
    assert(Filters.cdcWriteSourceFilter(sample).count() == sample.count())
    // the other half of the handshake: the writer marks its session
    assert(graft.sinks.MysqlSink.sessionPrologue(bdrMode = true) ==
      Seq("SET SESSION tidb_cdc_write_source = 1"))
    assert(graft.sinks.MysqlSink.sessionPrologue(bdrMode = false).isEmpty)
  }

  test("multi-row coalescing: adjacent same-class DMLs merge, order survives") {
    // users 2,4,6 land in table t0; ops arrive I,I,U(safe->REPLACE),D,D
    // then a non-safe update forces a single-statement flush
    val env = mkEnv(Seq(
      (1L, "I", 2L, 10.0, 100L),
      (2L, "I", 4L, 20.0, 200L),
      (3L, "U", 6L, 30.0, 300L),
      (4L, "D", 2L, 10.0, 100L),
      (5L, "D", 4L, 20.0, 200L)))
    def fragments(safeMode: Boolean) = graft.sinks.MysqlSink
      .statementFragments(env, Seq("user_id"), 1, safeMode)
      .orderBy(col("_commit_ts"), col("_start_ts"),
        Envelope.opOrder(col("_op")), col("_row_id"))
      .collect().iterator
      .map(r => (r.getAs[String]("_stmt"), r.getAs[String]("_frag_head"),
        r.getAs[String]("_frag"), r.getAs[String]("_frag_tail")))
    val got = graft.sinks.MysqlSink.coalesceRuns(fragments(true), 256).toList
    assert(got.length == 2, s"expected 2 coalesced statements, got:\n${got.mkString("\n")}")
    assert(got(0) == "REPLACE INTO `app`.`t0` (`user_id`,`value`,`k`) VALUES " +
      "(2,10.00,100),(4,20.00,200),(6,30.00,300)", got(0))
    assert(got(1) == "DELETE FROM `app`.`t0` WHERE (`user_id`) IN ((2),(4))", got(1))

    // non-safe mode: the U is un-batchable and splits the runs
    val got2 = graft.sinks.MysqlSink.coalesceRuns(fragments(false), 256).toList
    assert(got2.length == 3, s"expected I-run, U, D-run:\n${got2.mkString("\n")}")
    assert(got2(0).startsWith("INSERT INTO `app`.`t0`") && got2(0).contains("),("))
    assert(got2(1).startsWith("UPDATE `app`.`t0` SET"))
    assert(got2(2).startsWith("DELETE FROM `app`.`t0` WHERE (`user_id`) IN"))

    // cap bounds run length
    val got3 = graft.sinks.MysqlSink.coalesceRuns(fragments(true), 2).toList
    assert(got3.count(_.startsWith("REPLACE")) == 2, got3.mkString("\n"))

    // end-to-end distributed smoke (blackhole executor)
    graft.sinks.MysqlSink.applyBatchCoalesced(env, Seq("user_id"), 2,
      safeMode = true)(_ => ())
  }

  test("mysql-config writer knobs drive the coalescer (sink.go:710-728): " +
      "max-txn-row caps runs, max-multi-update-row/-size cap UPDATE-class " +
      "rows, enable-batch-dml=false forces per-row statements") {
    import graft.model.MysqlSinkConfig
    val env = mkEnv(Seq(
      (1L, "I", 2L, 10.0, 100L),
      (2L, "I", 4L, 20.0, 200L),
      (3L, "U", 6L, 30.0, 300L),
      (4L, "U", 8L, 40.0, 400L),
      (5L, "U", 10L, 50.0, 500L)))
    def collect(mysql: MysqlSinkConfig,
                maxBatchRows: Int = 256): List[String] = {
      // static probe: the execute closure runs inside foreachPartition
      // (serialized), so a captured local buffer would mutate a copy
      CoalesceProbe.statements.clear()
      graft.sinks.MysqlSink.applyBatchCoalesced(env, Seq("user_id"), 1,
        safeMode = true, maxBatchRows = maxBatchRows, mysql = mysql)(
        it => it.foreach(CoalesceProbe.statements.add))
      import scala.jdk.CollectionConverters._
      CoalesceProbe.statements.iterator().asScala.toList
    }
    // defaults: ONE multi-row REPLACE (all five rows share the head)
    val dflt = collect(MysqlSinkConfig())
    assert(dflt.count(_.startsWith("REPLACE")) == 1, dflt.mkString("\n"))
    assert(dflt.head.count(_ == '(') >= 5, "all five tuples in one run")
    // max-multi-update-row=2: UPDATE-class rows flush every 2 — the
    // knob VISIBLY changes statement batching (I-rows keep the txn cap)
    val capped = collect(MysqlSinkConfig(maxMultiUpdateRow = 2))
    assert(capped.count(_.startsWith("REPLACE")) == 3,
      s"2 I-rows + U-run split at 2 + trailing U:\n${capped.mkString("\n")}")
    // max-multi-update-row-size=1: every U tuple exceeds it → U rows
    // emit alone; the I pair still coalesces
    val sized = collect(MysqlSinkConfig(maxMultiUpdateRowSize = 1))
    assert(sized.count(_.startsWith("REPLACE")) == 4,
      s"I-run + three single Us:\n${sized.mkString("\n")}")
    // enable-batch-dml=false: per-row statements, nothing coalesces
    val off = collect(MysqlSinkConfig(enableBatchDml = false))
    assert(off.length == 5 && off.forall(s => s.count(_ == '(') == 2),
      s"one tuple per statement:\n${off.mkString("\n")}")
    // max-txn-row caps every run (and clamps at the reference limits)
    val txnCapped = collect(MysqlSinkConfig(maxTxnRow = 2))
    assert(txnCapped.count(_.startsWith("REPLACE")) == 3, txnCapped.mkString("\n"))
    assert(MysqlSinkConfig(maxTxnRow = 1 << 20).adjusted.maxTxnRow == 2048)
    assert(MysqlSinkConfig(maxMultiUpdateRow = 999).adjusted.maxMultiUpdateRow == 256)
    intercept[IllegalArgumentException](MysqlSinkConfig(maxTxnRow = 0).adjusted)
  }

  test("asof join: latest build <= probe ts, equal-ts visible, no-match null") {
    import spark.implicits._
    val probe = Seq(
      (100L, 1L, 5L),  // after two builds -> picks ts=4
      (101L, 1L, 2L),  // equal-ts build visible -> ts=2
      (102L, 1L, 1L),  // before any build -> null
      (103L, 2L, 9L)   // key with no builds -> null
    ).toDF("event_id", "user_id", "ts_ns")
    val build = Seq(
      (200L, 1L, 2L, 10.0),
      (201L, 1L, 4L, 20.0)
    ).toDF("event_id", "user_id", "ts_ns", "value")
    val out = AsOfJoin.asof(probe, build, "user_id", "ts_ns",
        payloadCols = Seq("event_id", "value"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4))))).toMap
    assert(out(100L) == Some((201L, 20.0)))
    assert(out(101L) == Some((200L, 10.0)))
    assert(out(102L).isEmpty)
    assert(out(103L).isEmpty)
    // equal-ts build rows: tieBreak picks the highest
    val build2 = Seq((200L, 1L, 2L, 10.0), (202L, 1L, 2L, 30.0))
      .toDF("event_id", "user_id", "ts_ns", "value")
    val tied = AsOfJoin.asof(probe.filter(col("event_id") === 101L), build2,
        "user_id", "ts_ns", payloadCols = Seq("event_id", "value"),
        tieBreak = Seq("event_id"))
      .collect().map(r => (r.getLong(3), r.getDouble(4)))
    assert(tied.toSeq == Seq((202L, 30.0)))
  }

  test("lm score: rarer tokens score lower; identical docs score equal") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the the"), // all common tokens
      (2L, "the the the the"),
      (3L, "xylo qwert zzyzx plurg") // all rare tokens
    ).toDF("doc_id", "text")
    val scored = graft.operators.TextOps.lmScore(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(scored(1L) == scored(2L))
    assert(scored(3L)._3 < scored(1L)._3, "rare-token doc must score lower")
    assert(scored.values.forall(_._3 < 0.0), "log-probs are negative")
    assert(scored(1L)._1 == 4L)
  }

  test("temperature mix: alpha=1 is uniform, alpha<1 upsamples the tail") {
    import spark.implicits._
    // src0 = 160 docs, src1 = 40 docs
    val docs = (0L until 200L).map(i => (i, if (i < 160) "src0" else "src1", "t"))
      .toDF("doc_id", "source", "text")
    val uniform = Sampling.temperatureMix(docs, alpha = 1.0, targetFrac = 0.5)
      .select(col("source"), col("mix_frac")).distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(uniform("src0") - 0.5) < 1e-6)
    assert(math.abs(uniform("src1") - 0.5) < 1e-6)
    val temp = Sampling.temperatureMix(docs, alpha = 0.5, targetFrac = 0.5)
      .select(col("source"), col("mix_frac")).distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(temp("src1") > temp("src0"),
      s"alpha<1 must upsample the small source: $temp")
    // chunk dedup: identical chunk across docs keeps first occurrence
    val dup = Seq(
      (1L, ("a b c d " * 4).trim),                       // chunks: [a b c d ...]x1
      (2L, ("a b c d " * 4).trim + " " + ("x y z w " * 4).trim)
    ).toDF("doc_id", "text")
    val out = TextOps.chunkDedup(dup, window = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L)._2 == 1L, s"doc1 keeps its chunk: ${out(1L)}")
    assert(out(2L)._2 == out(2L)._1 - 1,
      s"doc2 loses the duplicated chunk, keeps the rest: ${out(2L)}")
    assert(!out(2L)._3.contains("a b c d"), "dup chunk removed from doc2")
  }

  test("stratified sample: pure hash — deterministic, boundary fractions exact") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"src${i % 4}", "t"))
      .toDF("doc_id", "source", "text")
    val all = Sampling.stratifiedSample(docs, Map("src0" -> 1.0), 0.0)
    val kept = all.filter(col("sampled")).select(col("source")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("src0"), s"frac 1.0/0.0 must be exact, got $kept")
    val a = Sampling.stratifiedSample(docs, Map("src1" -> 0.3), 0.5)
      .filter(col("sampled")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(docs.repartition(7), Map("src1" -> 0.3), 0.5)
      .filter(col("sampled")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "sampling decision must not depend on partitioning")
  }

  test("dsirScores ranks target-like documents above off-target ones") {
    import spark.implicits._
    // raw corpus: half "code-like", half "prose-like"; target corpus is
    // all code-like — code-like raw docs must score strictly higher
    val raw = ((0L until 20L).map(i => (i, "def fn return class import")) ++
      (20L until 40L).map(i => (i, "the cat sat on the warm mat")))
      .toDF("doc_id", "text")
    val target = (100L until 110L).map(i => (i, "def class import lambda yield"))
      .toDF("doc_id", "text")
    val scores = Sampling.dsirScores(raw, target, dim = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val codey = (0L until 20L).map(scores)
    val prosey = (20L until 40L).map(scores)
    assert(codey.min > prosey.max,
      s"code-like docs must outscore prose: ${codey.min} vs ${prosey.max}")
    // selection by threshold is partitioning-invariant (micro-exact sums)
    val again = Sampling.dsirScores(raw.repartition(7), target, dim = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(again == scores, "scores must be bit-stable under repartitioning")
  }

  test("duplicateSpans finds maximal shared token runs with exact offsets") {
    import spark.implicits._
    // doc 1 and doc 2 share tokens 2..9 of doc 1 (= 0..7 of doc 2);
    // doc 3 shares nothing long enough; doc 4 repeats doc 1 verbatim
    val shared = (0 until 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"x0 x1 $shared x10 x11"),
      (2L, s"$shared y8 y9"),
      (3L, "z0 z1 z2 s0 s1 s2 z6 z7 z8 z9 z10 z11"),
      (4L, s"x0 x1 $shared x10 x11")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, n = 3, minSpan = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // 1↔2: run at (start_a=2, start_b=0, 8 tokens); 1↔4 and 2↔4 mirror
    assert(spans.contains((1L, 2L, 2L, 0L, 8L)), s"got $spans")
    assert(spans.contains((1L, 4L, 0L, 0L, 12L)), s"verbatim copy spans whole doc: $spans")
    assert(spans.contains((2L, 4L, 0L, 2L, 8L)), s"got $spans")
    assert(!spans.exists(s => s._1 == 3L || s._2 == 3L),
      "3-token overlap below minSpan must not surface")
    // tiling exactness: a tiny cap must not change the answer
    val capped = Dedup.duplicateSpans(docs, n = 3, minSpan = 5, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(capped == spans, "salt-tiled pair generation is exact")
  }

  test("trimSpans removes merged spans from the higher-id copy only") {
    import spark.implicits._
    val shared = (0 until 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"x0 x1 $shared x10 x11"),
      (2L, s"$shared y8 y9"),
      (5L, "free standing unrelated document here")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, n = 3, minSpan = 5)
    val out = Dedup.trimSpans(docs, spans)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // doc 1 (lower id) keeps everything; doc 2 loses tokens 0..7
    assert(out(1L) == (0L, s"x0 x1 $shared x10 x11"))
    assert(out(2L) == (8L, "y8 y9"))
    assert(out(5L) == (0L, "free standing unrelated document here"))

    // overlapping spans merge: two overlapping intervals on one doc
    val iv = Seq((1L, 9L, 0L, 10L), (1L, 9L, 5L, 8L)).toDF("doc_a", "doc_b", "start_b", "span_tokens")
      .select(col("doc_a"), col("doc_b"),
        lit(0L).as("start_a"), col("start_b"), col("span_tokens"))
    val base = Seq((9L, (0 until 20).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val trimmed = Dedup.trimSpans(base, iv).collect().head
    // [0,10) ∪ [5,13) merges to [0,13): 13 removed, t13..t19 survive
    assert(trimmed.getLong(1) == 13L)
    assert(trimmed.getString(2) == (13 until 20).map(i => s"t$i").mkString(" "))

    // full-copy pair: the later doc trims to empty
    val copies = Seq((1L, "a b c d e f"), (7L, "a b c d e f")).toDF("doc_id", "text")
    val ct = Dedup.trimSpans(copies, Dedup.duplicateSpans(copies, 3, 5))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(ct(1L) == "a b c d e f" && ct(7L) == "")
  }

  test("chunkWithOverlap covers every token on the real corpus") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val chunks = TextOps.chunkWithOverlap(docs, 64, 48)
    // per doc: first window starts at 0, windows step by exactly the
    // stride, and the last window ends exactly at the doc length —
    // together: every token is inside at least one window
    val bad = chunks.groupBy(col("doc_id"))
      .agg(min(col("start_tok")).as("first"),
        max(col("start_tok") + col("n_tokens")).as("covered_to"),
        max(col("start_tok")).as("last_start"),
        count(lit(1)).as("n"))
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok")), "doc_id")
      .filter(col("first") =!= 0L || col("covered_to") =!= col("n_tok") ||
        col("last_start") =!= (col("n") - 1) * 48)
      .count()
    assert(bad == 0L, "chunk windows must tile every document completely")
  }

  test("chunkWithOverlap: last window reaches the end, short docs intact") {
    import spark.implicits._
    val docs = Seq(
      (1L, (0 until 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                       // shorter than a chunk
      (3L, "a b c d")                                    // exactly one chunk
    ).toDF("doc_id", "text")
    val out = TextOps.chunkWithOverlap(docs, chunkTokens = 4, strideTokens = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // doc 1: ceil((10-4)/3)=2 → 3 windows [0,4) [3,7) [6,10)
    assert(out(1L -> 0L) == (0L, 4L, "t0 t1 t2 t3"))
    assert(out(1L -> 1L) == (3L, 4L, "t3 t4 t5 t6"))
    assert(out(1L -> 2L) == (6L, 4L, "t6 t7 t8 t9"))
    assert(!out.contains(1L -> 3L), "no window past the doc end")
    assert(out(2L -> 0L) == (0L, 2L, "a b") && !out.contains(2L -> 1L))
    assert(out(3L -> 0L) == (0L, 4L, "a b c d") && !out.contains(3L -> 1L))
  }

  test("lmScoreBigram: fluent word order outranks scrambled; sub-bigram docs drop") {
    import spark.implicits._
    val fluent = "the cat sat on the mat"
    val docs = Seq(
      (1L, fluent), (2L, fluent), (3L, fluent),    // corpus pins p(cur|prev)
      (4L, "mat the on sat cat the"),              // same unigrams, scrambled
      (5L, "solo")                                 // no bigrams at all
    ).toDF("doc_id", "text")
    val out = TextOps.lmScoreBigram(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(!out.contains(5L), "a one-token doc has no bigram score")
    assert(out(1L) > out(4L),
      s"fluent order must outscore scrambled (${out(1L)} vs ${out(4L)})")
  }

  test("funnel: conversion only after first entry and inside the window") {
    import spark.implicits._
    val sec = 1000L * 1000 * 1000
    // ts carries the long-ns shape the parquet reader yields
    val ev = Seq(
      (1L, "purchase", 5L * sec),  // BEFORE signup: not a conversion
      (1L, "signup", 10L * sec),
      (1L, "purchase", 15L * sec),
      (1L, "purchase", 12L * sec), // earlier in-window one wins the MIN
      (2L, "signup", 10L * sec),
      (2L, "purchase", 110L * sec), // outside the window
      (3L, "purchase", 10L * sec)   // never signed up: not in funnel
    ).toDF("user_id", "event_type", "ts")
    val out = graft.analytics.Funnel.funnel(ev, "signup", "purchase", 50L * sec)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))).toMap
    assert(out.keySet == Set(1L, 2L), "only signed-up users enter the funnel")
    assert(out(1L)._3 && out(1L)._2 == out(1L)._1 + 2L * sec,
      "earliest in-window purchase wins")
    assert(!out(2L)._3, "outside the window is not a conversion")
  }

  test("streamingFunnel finalizes watermark-closed funnels identical to batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sfun").toString
    val src = s"$tmp/source"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val windowNs = 3L * 24 * 3600 * 1000 * 1000 * 1000
    val schema = spark.read.parquet(src).schema
    val q = graft.analytics.Funnel.streamingFunnel(spark,
        Tables.tsNanos(spark.readStream.schema(schema).parquet(src)),
        "signup", "purchase", windowNs)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_funnel")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("stream_funnel").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
      .toMap
    val batch = graft.analytics.Funnel.funnel(
        Tables.events(spark, "/root/testdata/sf0.001"), "signup", "purchase", windowNs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1) / 1000L, if (r.isNullAt(2)) -1L else r.getLong(2) / 1000L,
          r.getBoolean(3)))
      .toMap
    assert(streamed.nonEmpty, "watermark must close some funnels")
    streamed.foreach { case (u, v) =>
      assert(batch(u) == v, s"user $u: streamed $v vs batch ${batch(u)}")
    }
  }

  test("tableDiff classifies drift and renders reconciling fix SQL") {
    import spark.implicits._
    val src = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val dst = Seq((1L, "alpha"), (2L, "CORRUPT"), (9L, "ghost"))
      .toDF("doc_id", "text")
    val kinds = graft.operators.TableDiff.diff(src, dst, Seq("doc_id"), nChunks = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds == Map(2L -> "mismatch", 3L -> "missing_dst", 9L -> "extra_dst"))
    // identical tables: every chunk checksum agrees, nothing to report
    assert(graft.operators.TableDiff.diff(src, src, Seq("doc_id"), 4).isEmpty)
    val fixes = graft.operators.TableDiff
      .fixStatements(src, dst, Seq("doc_id"), "app", "docs", nChunks = 4)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(fixes(2L) == "REPLACE INTO `app`.`docs` (`doc_id`,`text`) VALUES ('2','beta')")
    assert(fixes(3L) == "REPLACE INTO `app`.`docs` (`doc_id`,`text`) VALUES ('3','gamma')")
    assert(fixes(9L) == "DELETE FROM `app`.`docs` WHERE `doc_id` = '9' LIMIT 1")
  }

  test("epochShuffle: per-epoch permutations differ, re-runs are bit-identical") {
    import spark.implicits._
    val docs = (0L until 64L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    def order(epoch: Int): Seq[(Long, Long, Long)] =
      Sampling.epochShuffle(docs, epoch, nShards = 4)
        .select("doc_id", "shard", "pos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val e1 = order(1)
    assert(e1 == order(1), "same epoch is deterministic across runs")
    assert(e1 != order(2), "different epochs permute differently")
    // every shard holds a contiguous 1..k rank sequence
    val byShard = e1.groupBy(_._2).values
    assert(byShard.forall(s => s.map(_._3).sorted == (1L to s.size).toSeq))
  }

  test("tokenQuantiles returns discrete k-th-smallest values") {
    import spark.implicits._
    // source A: lengths 1..10 → p50 = 5th smallest = 5, p90 = 9, p99 = ceil(9.9) = 10th = 10
    val docs = (1 to 10).map(i =>
      (i.toLong, (1 to i).map(j => s"t$j").mkString(" "), "A"))
      .toDF("doc_id", "text", "source")
    val r = TextOps.tokenQuantiles(docs).collect().head
    assert(r.getAs[Long]("n_docs") == 10L)
    assert(r.getAs[Long]("p50_tokens") == 5L)
    assert(r.getAs[Long]("p90_tokens") == 9L)
    assert(r.getAs[Long]("p99_tokens") == 10L)
  }

  test("heavyHitters ranks bigrams count-desc with gram-asc tie-break") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c d", "s1"), // "a b"×2, "b a", "b c", "c d"
      (2L, "a b c d", "s1"),     // "a b", "b c", "c d"
      (3L, "x y", "s2"),
      (4L, "z", "s2")            // sub-bigram doc contributes nothing
    ).toDF("doc_id", "text", "source")
    val out = TextOps.heavyHitters(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSet == Set(
      ("s1", 1L, "a b", 3L),
      ("s1", 2L, "b c", 2L), // ties "b c"/"c d" at 2 → gram-asc wins
      ("s2", 1L, "x y", 1L)))
  }

  test("hashedLinearScore: deterministic, additive, and shuffle-free") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta", "s"), (2L, "alpha beta alpha beta", "s"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.hashedLinearScore(docs, dim = 256)
    val rows = out.collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("score_micro"), r.getAs[Boolean]("accept"))).toMap
    // doubling the tokens doubles the score exactly (pure sum of
    // per-token weights), and accept tracks the sign
    assert(rows(1L)._1 == 2L && rows(2L)._1 == 4L)
    assert(rows(2L)._2 == 2L * rows(1L)._2)
    assert(rows(1L)._3 == (rows(1L)._2 >= 0))
    // scoring is per-row arithmetic: no exchange in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free scorer:\n$plan")
  }

  test("embeddingOutliers: farthest vector ranks first, ssq = cnt^2 * distance^2") {
    import spark.implicits._
    // label 0: three vectors at 0, one at distance d along dim 0
    val emb = Seq(
      (1L, Array(0f, 0f), 0), (2L, Array(0f, 0f), 0),
      (3L, Array(0f, 0f), 0), (4L, Array(1f, 0f), 0),
      (5L, Array(0f, 2f), 1), (6L, Array(0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingOutliers(emb, k = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // label 0: cnt=4, sums=(1000,0); vec4 ssq=(4*1000-1000)^2=9e6,
    // others (0-1000)^2=1e6 — rank 1 = vec4, rank 2 = vec1 (id tie-break)
    assert(out.toSet == Set(
      (0, 1L, 4L, 9000000L), (0, 2L, 1L, 1000000L),
      (1, 1L, 5L, 4000000L), (1, 2L, 6L, 4000000L)))
  }

  test("incrementalExactBloom is exactly incrementalExact (the filter only prunes)") {
    import spark.implicits._
    // duplicate-rich: 60 distinct contents, corpus holds half of them,
    // new batch repeats corpus content AND repeats within itself
    val corpus = (0 until 30).map(i => (i.toLong, s"content number ${i}", "old"))
      .toDF("doc_id", "text", "source")
    val fresh = (0 until 90).map(i =>
      (100L + i, s"content number ${i % 60}", "new"))
      .toDF("doc_id", "text", "source")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "content_md5").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = canon(Dedup.incrementalExact(fresh, corpus))
    val bloom = canon(Dedup.incrementalExactBloom(fresh, corpus))
    assert(bloom == plain)
    // kept = first occurrence of each of the 30 contents absent from corpus
    assert(bloom.size == 30)
    // empty corpus: everything fresh, first-occurrence-per-content kept
    val none = corpus.filter(col("doc_id") < 0)
    assert(canon(Dedup.incrementalExactBloom(fresh, none)).size == 60)
  }

  test("minhash index probe equals the batch pair generator's cross pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mhidx").toString
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = all.filter(pmod(col("doc_id"), lit(3L)) === 0)
    val fresh = all.filter(pmod(col("doc_id"), lit(3L)) =!= 0)
    Dedup.buildMinhashIndex(corpus, dir)
    val probed = Dedup.probeMinhashIndex(fresh, dir)
      .select("doc_new", "doc_old").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // each probe pair is emitted exactly once
    assert(probed.size == Dedup.probeMinhashIndex(fresh, dir).count())
    // == the batch generator over the union, restricted to cross pairs
    val oldIds = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = Dedup.minhashPairs(Dedup.minhashSignatures(all))
      .select("doc_a", "doc_b").collect()
      .flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        if (oldIds(a) && !oldIds(b)) Some((b, a))
        else if (oldIds(b) && !oldIds(a)) Some((a, b))
        else None
      }.toSet
    assert(probed == batch,
      s"probe must find exactly the batch cross pairs (${probed.size} vs ${batch.size})")
    assert(probed.nonEmpty, "fixture must produce near-dup candidates")
  }

  test("normalizeText strips markup/control chars, collapses space, lowercases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "  Hello <b>World</b>\ttwice  spaced ", "s"),
      (2L, "already clean", "s")
    ).toDF("doc_id", "text", "source")
    val out = TextOps.normalizeText(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(1), r.getLong(3))).toMap
    assert(out(1L)._1 == "hello world twice spaced")
    assert(out(2L)._1 == "already clean")
    assert(out(1L)._2 == 36L && out(1L)._3 == 24L)
  }

  test("corpusSketch HLL distinct count is within the configured error of exact") {
    import spark.implicits._
    val docs = (0 until 3000).map(i =>
      (i.toLong, s"doc content ${i % 700}", s"src${i % 2}"))
      .toDF("doc_id", "text", "source")
    val approx = TextOps.corpusSketch(docs, rsd = 0.02).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = docs.groupBy(col("source"))
      .agg(countDistinct(md5(col("text"))).as("u")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, (nDocs, u)) <- approx) {
      assert(nDocs == 1500L)
      val err = math.abs(u.toDouble - exact(src)) / exact(src)
      assert(err <= 3 * 0.02, s"$src: approx $u vs exact ${exact(src)} (err $err)")
    }
  }

  test("containment catches the quoted-subset pair that Jaccard misses") {
    import spark.implicits._
    import graft.operators.Dedup
    // doc 1 = doc 0 verbatim + a long unrelated tail: containment of
    // the short side is 1.0 while Jaccard stays low
    val quote = "alpha beta gamma delta eps zeta"
    val tail = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, quote, "s"),
      (1L, s"$quote $tail", "s"),
      (2L, "other words entirely here now", "s"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.containmentPairs(docs, "source", n = 3, threshold = 0.9)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) == (0L, 1L))
    assert(r.getDouble(5) == 1.0, "short side fully contained")
    assert(r.getLong(6) == 0L, "the quoted (short) doc is the contained one")
    // the same pair fails symmetric Jaccard at any useful threshold
    val jac = Dedup.jaccardPairs(docs, "source", 0.5).collect()
    assert(!jac.exists(x => x.getLong(0) == 0L && x.getLong(1) == 1L),
      "Jaccard must miss the subset pair (that asymmetry is the point)")
  }

  test("editVerifiedPairs: budget keeps each doc's strongest candidates, " +
      "budgeted output is a subset of unbudgeted") {
    import spark.implicits._
    val docs = Seq(
      (0L, "aa bb cc dd ee ff gg hh"),
      (1L, "aa bb cc dd ee ff gg hh"), // exact dup of 0
      (2L, "aa bb cc dd ee ff gg xx"), // near dup of 0/1
      (3L, "zz yy xx ww vv uu tt ss")  // unrelated
    ).toDF("doc_id", "text")
    // candidate generator output shape: scored pairs, over-generated
    val pairs = Seq(
      (0L, 1L, 1.00), (0L, 2L, 0.78), (0L, 3L, 0.05),
      (1L, 2L, 0.78), (1L, 3L, 0.05), (2L, 3L, 0.10)
    ).toDF("doc_a", "doc_b", "jaccard")
    val order = Seq(col("jaccard").desc, col("doc_b"))
    val unbudgeted = Dedup.editVerifiedPairs(docs, pairs, maxEditRatio = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val budget1 = Dedup.editVerifiedPairs(docs, pairs, maxEditRatio = 0.6,
      perDocBudget = 1, budgetOrder = order)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the strongest candidate per left doc survives the budget; junk
    // pairs never reach the distance kernel
    assert(budget1.subsetOf(unbudgeted))
    assert(budget1.contains((0L, 1L)), s"exact dup must verify: $budget1")
    assert(!budget1.contains((0L, 2L)), "budget 1 verifies only the strongest")
    val budget2 = Dedup.editVerifiedPairs(docs, pairs, maxEditRatio = 0.6,
      perDocBudget = 2, budgetOrder = order)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(budget2 == Set((0L, 1L), (0L, 2L), (1L, 2L)),
      s"budget 2 admits both near-dups, the unrelated doc fails verify: $budget2")
    assert(unbudgeted == budget2, "budget only prunes below-threshold work here")
  }

  test("editVerifiedPairs: the levenshtein kernel evaluates once per row, " +
      "above the round-robin spread") {
    import spark.implicits._
    val docs = Seq((0L, "aa bb cc"), (1L, "aa bb cd"), (2L, "zz yy xx"))
      .toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (0L, 2L)).toDF("doc_a", "doc_b")
    val out = Dedup.editVerifiedPairs(docs, pairs, maxEditRatio = 0.6)
    val plan = out.queryExecution.executedPlan.toString
    // one Generate-hosted evaluation; a pushed-filter copy would show a
    // second occurrence (r16's plan had the DP running twice per
    // surviving row: once in the Filter, once in the Project)
    assert(plan.split("levenshtein", -1).length - 1 == 1,
      s"expected exactly one levenshtein in the plan:\n$plan")
    // the ratio filter must sit ABOVE the round-robin exchange (the
    // Generate pins it): seen bottom-up, the plan string lists the
    // filter before the exchange
    val fi = plan.indexOf("edit_ratio_micro")
    val xi = plan.indexOf("Exchange RoundRobinPartitioning")
    assert(fi >= 0 && xi >= 0 && fi < xi,
      s"ratio filter must stay above the spread exchange:\n$plan")
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 1L)))
  }
}

/** Statement collector for the coalescer knob spec — a top-level
  * object so the foreachPartition closure reaches the SAME instance
  * after serialization (local mode shares the JVM). */
object CoalesceProbe {
  val statements = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}
