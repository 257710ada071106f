package graft

/** Plan-shape regression guards: the performance properties the
  * queries rely on at 100 TB are asserted on the physical plan, so a
  * refactor that silently loses pushdown, pruning, broadcast, or the
  * top-k operator fails CI — not a production run. */
class PlanSpec extends SparkFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q_kv_mount: byte decode rides the scan — encode+mount is one " +
      "shuffle-free map chain") {
    val p = plan("q_kv_mount")
    assert(!p.contains("Exchange"),
      s"the mount must stay a per-partition map over the change-log scan:\n$p")
  }

  test("q1: filter pushed to parquet, columns pruned") {
    val p = plan("q1_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "shipdate predicate must reach the scan")
    assert(!p.contains("l_orderkey"), "unused columns must be pruned from the scan")
  }

  test("q3: dims broadcast, no sort-merge join") {
    val p = plan("q3_shipping")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      "fact side must stream against broadcast dims")
  }

  test("q_topk: TakeOrderedAndProject, not a global sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"orderBy+limit must compile to bounded top-k:\n$p")
  }

  test("q_envelope: single codegen stage, no shuffle") {
    val p = plan("q_envelope")
    assert(!p.contains("Exchange"), "envelope derivation is per-row, shuffle-free")
    assert(p.contains("*(1)"), "codegen stage marker expected")
  }

  test("q_schema_asof: as-of lookup adds no shuffle on the event side") {
    val p = plan("q_schema_asof")
    assert(p.contains("BroadcastHashJoin"), "version table must broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_ann_ivf: inline quantizer adds no shuffle before the probe join") {
    val p = plan("q_ann_ivf")
    // cell assignment is a scan-side expression: the only exchanges
    // are the probe-side broadcast and the final top-k window
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "probe set must broadcast")
    assert(!p.contains("SortMergeJoin"), "no shuffle join in the IVF path")
  }

  test("q_chunk_overlap: chunker is pure per-row work, zero exchange") {
    val p = plan("q_chunk_overlap")
    assert(!p.contains("Exchange"), "sliding-window chunking must not shuffle")
  }

  test("q_knn_join: equi-join on cell, never a nested-loop") {
    val p = plan("q_knn_join")
    // both sides carry the inline quantizer; the meet is a plain hash
    // equi-join on `cell` (broadcast locally under AQE is fine — the
    // OperatorSpec pins that it also runs with broadcast disabled);
    // a BroadcastNestedLoopJoin here would mean the cell key was lost
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"kNN join must stay a cell equi-join:\n$p")
  }

  test("q_table_diff: chunk prune is a broadcast semi-join, no cartesian") {
    val p = plan("q_table_diff")
    assert(p.contains("LeftSemi"), "both scans must prune by the bad-chunk list")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "diff must stay key-equi-joined")
  }

  test("q_txn_chunks_atomic: txn-size table broadcasts back to the fact side") {
    val p = plan("q_txn_chunks_atomic")
    assert(p.contains("BroadcastHashJoin"),
      "chunk assignment must join back via broadcast, not a fact shuffle")
  }

  test("q_lww_state: rank-1 gets WindowGroupLimit, single exchange") {
    val p = plan("q_lww_state")
    assert(p.contains("WindowGroupLimit"), "rank<=1 must push a group limit")
    assert("Exchange".r.findAllIn(p).size <= 2, s"one logical shuffle expected:\n$p")
  }

  test("q_embed_quantize and q_column_select_rules are shuffle-free") {
    Seq("q_embed_quantize", "q_column_select_rules").foreach { q =>
      assert(!plan(q).contains("Exchange"), s"$q must ride the scan")
    }
  }

  test("pre-decode type filter reaches the parquet scan") {
    val p = plan("q_filter_event_type_predecode")
    assert(p.contains("Not(EqualTo(event_type,error))"),
      s"raw type predicate must push to the scan (PushedFilters):\n$p")
  }

  test("pair dedup paths are aggregation-shaped, no shuffle self-joins") {
    // bucket-collect candidate generation: no SortMergeJoin anywhere —
    // that would mean a data-scaled self-join crept back in. The
    // sizes/labels joins are shuffle-hash PINNED (r10): both sides are
    // data-sized (pair output × per-doc table), so neither may
    // broadcast — the sf1 soak showed static misestimates broadcasting
    // the aggregated pair frame (~2 GB build → OOM). Key-partitioned
    // ShuffledHashJoin is the any-scale plan; only genuinely bounded
    // sides (saltTile's oversized-bucket census) still broadcast.
    val minhash = plan("q_dedup_minhash_pairs")
    assert(!minhash.contains("SortMergeJoin"), "minhash pairs must not sort-merge")
    val ngram = plan("q_dedup_ngram")
    assert(!ngram.contains("SortMergeJoin"), "jaccard joins must not sort-merge")
    assert(ngram.contains("ShuffledHashJoin"),
      "jaccard sizes joins must stay shuffle-hash pinned (no broadcast of " +
        "data-sized sides)")
    val lsh = plan("q_ann_lsh")
    assert(!lsh.contains("SortMergeJoin"), "lsh pair path must not shuffle-join")
  }

  test("q_decontaminate: bench grams broadcast into the probe") {
    // the gram-membership probe must be a broadcast (bench sets are
    // bounded); the final doc_id-keyed report join may shuffle — that
    // one is key-partitioned and output-sized
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark gram set must broadcast:\n$p")
  }

  test("q_sqlmodel_generic: statement rendering is shuffle-free codegen") {
    val p = plan("q_sqlmodel_generic")
    assert(!p.contains("Exchange"),
      "generic SQL rendering is per-row column work, no shuffle")
    assert(p.contains("*(1)"), "codegen stage marker expected")
  }

  test("encoders stay inside whole-stage codegen") {
    Seq("q_encode_canal", "q_encode_open", "q_encode_debezium", "q_encode_csv")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("Exchange"), s"$q must be shuffle-free")
        assert(p.contains("*(1)"), s"$q must codegen")
      }
  }

  test("lm/tfidf/mix: AQE broadcasts the vocab/source tables at this scale") {
    // deliberately NO forced broadcast hints on the vocab-sized
    // tables (a hint would OOM the driver at 100 TB vocab) — assert
    // instead that the FINAL adaptive plan picked a broadcast at
    // fixture scale, which is exactly the claimed behavior
    Seq("q_lm_score", "q_tfidf", "q_temperature_mix").foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      // collect() executes THIS Dataset's plan (count() would build
      // its own QueryExecution and leave this one un-finalized)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"$q: AQE plan not finalized:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"$q: AQE should broadcast the model/weight table at sf0.001:\n$p")
    }
  }

  test("jaccardPairsPrefix: the vocab-sized freq join is AQE-chosen " +
      "broadcast at fixture scale — no forced hint (100 TB vocab would OOM)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val df = graft.operators.Dedup.jaccardPairsPrefix(docs, "source", 0.8)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), s"AQE plan not finalized:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"AQE should broadcast the freq table at sf0.001:\n$p")
  }

  test("q_chunk_dedup: one md5-keyed dedup shuffle, no corpus window") {
    val p = plan("q_chunk_dedup")
    assert(!p.contains("Window"), "reassembly must be in-group sort, not a window")
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      s"keeper join should broadcast at fixture scale:\n$p")
  }

  test("q_asof_attrib: as-of join is join-free (union + running window)") {
    val p = plan("q_asof_attrib")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"as-of must not plan a join — the union+window path scales both sides:\n$p")
    assert(p.contains("Window"), "running window expected")
  }

  test("q_semantic_dedup: inline assignment, broadcast-only dropped set") {
    // cell assignment must be the inline quantizer expression (no
    // assignment join/shuffle); the only join is the duplicate-sized
    // dropped set broadcast back onto the assignment stream
    val p = plan("q_semantic_dedup")
    assert(!p.contains("SortMergeJoin"),
      s"dropped-set join must broadcast, not sort-merge:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"kept flag must come from a broadcast join:\n$p")
  }

  test("q_kmeans_step / q_pq_codes: assignment and coding are join-free") {
    // the quantizer/codebook are inline literals: the corpus-side plan
    // must contain no join and (for PQ) no shuffle at all
    val km = plan("q_kmeans_step")
    assert(!km.contains("Join"), s"kmeans assignment must be inline:\n$km")
    val pq = plan("q_pq_codes")
    assert(!pq.contains("Join"), s"pq coding must be inline:\n$pq")
    assert(!pq.contains("Exchange"), s"pq coding must ride the scan:\n$pq")
  }

  test("q_text_normalize / q_hash_classifier: per-row curation is shuffle-free") {
    val n = plan("q_text_normalize")
    assert(!n.contains("Exchange"), s"normalize must ride the scan:\n$n")
    val h = plan("q_hash_classifier")
    assert(!h.contains("Exchange"), s"hashed scorer must ride the scan:\n$h")
  }

  test("q_embed_outlier: stats broadcast back, data side never sort-merges") {
    val p = plan("q_embed_outlier")
    assert(p.contains("BroadcastHashJoin"),
      s"label stats must broadcast onto the scan:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side join must not shuffle both sides:\n$p")
  }

  test("q_interval_join: bucketed equi-join, never a nested loop") {
    val p = plan("q_interval_join")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"containment must hash-join on the bucket:\n$p")
  }

  test("q_dedup_bloom: the Bloom probe is scan-side, dup check broadcasts") {
    // the might_contain probe must sit in a filter over the scan (no
    // join to get the flag), and at this scale AQE broadcasts the
    // corpus-hash side of the positives' anti-join
    val p = plan("q_dedup_bloom")
    assert(p.contains("might_contain"),
      s"bloom probe must be an inline predicate:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"positives anti-join should broadcast at this scale:\n$p")
  }

  test("q_winnow: selection is per-row codegen, zero exchange") {
    val p = plan("q_winnow")
    assert(!p.contains("Exchange"),
      s"winnowing must ride the scan (blocker-span form, no window shuffle):\n$p")
  }

  test("q_resolved_lock: two joinless aggregations, handle decode is codegen") {
    val p = plan("q_resolved_lock")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"lock accounting must be pure aggregation — no prewrite/commit join:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython") && p.contains("HashAggregate"),
      s"the record-key handle must decode natively in the agg projection:\n$p")
  }

  test("q_winnow_pairs: aggregation-shaped, no fingerprint self-join") {
    val p = plan("q_winnow_pairs")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"pair generation must stay bucket-collect, never a posting self-join:\n$p")
  }

  test("q_bm25: query terms broadcast onto the postings, no cross product") {
    val p = plan("q_bm25")
    assert(p.contains("BroadcastHashJoin"),
      s"query-term join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"scoring must stay on matching postings, never corpus x queries:\n$p")
  }

  test("q_anomaly: group moments broadcast back, event stream never sort-merges") {
    val p = plan("q_anomaly")
    assert(p.contains("BroadcastHashJoin"),
      s"per-(type,day) stats must broadcast onto the event scan:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the stats join must not reshuffle the event stream:\n$p")
  }

  test("steady-state 2PC composition: exactly ONE stateful operator, mount " +
      "rides it with no exchange (a per-table self-union would double the " +
      "matcher's state store)") {
    import graft.operators.RawKvMounter
    import graft.operators.RawKvMounter.{KvColumn, KvTableMeta}
    import graft.streaming.TxnMatcher
    val metas = (0 until 4).map { i =>
      KvTableMeta(graft.sources.ChangelogGen.tableIdOf(i.toLong),
        "app", s"events_$i",
        Seq(
          KvColumn(1L, "user_id", "bigint", nullable = false),
          KvColumn(2L, "value", "double"),
          KvColumn(3L, "k", "bigint")),
        handleCol = "user_id")
    }
    val raw = spark.readStream.format("graft.sources.ChangelogGenSource")
      .option("tables", 4).option("totalRows", 100)
      .option("rawKvUncommitted", "true").load()
    val composed = RawKvMounter.mountTables(
      TxnMatcher.matchStream(spark, raw), metas)
    val logical = composed.queryExecution.analyzed
    val stateful = logical.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.FlatMapGroupsWithState => f
    }
    assert(stateful.size == 1,
      s"one matcher, one state store — got ${stateful.size}:\n$logical")
    // nothing between the matcher and the mount repartitions
    assert(!logical.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation => r
    }.exists(_ => true), s"no repartition in the composition:\n$logical")
  }
}
