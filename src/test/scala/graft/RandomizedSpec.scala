package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Sampling}
import graft.sinks.SqlBuilder

/** Seeded randomized checks (fixed seed — deterministic, no flake):
  * the operators whose correctness argument is subtle get compared
  * against brute-force reference implementations on adversarial
  * random inputs (ties, collisions, empty groups). */
class RandomizedSpec extends SparkFunSuite {

  private val rnd = new scala.util.Random(42)

  test("asof join equals the brute-force per-key reference on random data") {
    import spark.implicits._
    // small key/ts domains force heavy collisions (the subtle cases)
    val probes = (0 until 300).map { i =>
      (1000L + i, rnd.nextInt(8).toLong, rnd.nextInt(40).toLong)
    }
    val builds0 = (0 until 150).map { i =>
      (2000L + i, rnd.nextInt(8).toLong, rnd.nextInt(40).toLong, rnd.nextDouble())
    }
    // dedupe build to one row per (key, ts): max event_id (like the
    // fixture query) so the naive reference is unambiguous
    val builds = builds0.groupBy(b => (b._2, b._3)).values
      .map(_.maxBy(_._1)).toSeq
    val probeDf = probes.toDF("event_id", "user_id", "ts_ns")
    val buildDf = builds.toDF("event_id", "user_id", "ts_ns", "value")
    val got = AsOfJoin.asof(probeDf, buildDf, "user_id", "ts_ns",
        payloadCols = Seq("event_id", "value"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    val byKey = builds.groupBy(_._2)
    probes.foreach { case (pid, key, ts) =>
      val expected = byKey.getOrElse(key, Seq.empty)
        .filter(_._3 <= ts)
        .sortBy(b => (b._3, b._1))
        .lastOption.map(_._1)
      assert(got(pid) == expected,
        s"probe $pid key=$key ts=$ts: got ${got(pid)}, want $expected")
    }
  }

  test("knnJoin probing every cell equals brute force on random vectors") {
    import spark.implicits._
    import graft.operators.Similarity
    val dim = 8
    val vecs = (0L until 120L).map { i =>
      (i, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val centroids = emb.filter(col("vec_id") < 6)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    // nprobe = #cells: every query sees every cell -> exact top-k
    val got = Similarity.knnJoin(emb, emb, centroids, k = 5, nprobe = 6)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p.toDouble * q.toDouble }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    vecs.foreach { case (qid, qv) =>
      val want = vecs.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }.take(5).map(_._1)
      val have = (1 to 5).map(r => got((qid, r.toLong)))
      assert(have == want, s"query $qid: got $have want $want")
    }
  }

  test("sql literal escaping: adversarial strings stay single-literal") {
    (0 until 500).foreach { _ =>
      val s = (0 until rnd.nextInt(12)).map(_ =>
        "'\\`\"ab\u0000中%_".charAt(rnd.nextInt(10))).mkString
      val lit = SqlBuilder.literal(s)
      assert(lit.head == '\'' && lit.last == '\'')
      val body = lit.substring(1, lit.length - 1)
      // no lone quote: every ' is doubled (scan outside escapes)
      var i = 0
      var ok = true
      while (i < body.length) {
        body.charAt(i) match {
          case '\\' => i += 2 // backslash escape consumes the next char
          case '\'' =>
            ok = ok && i + 1 < body.length && body.charAt(i + 1) == '\''
            i += 2
          case _ => i += 1
        }
      }
      assert(ok, s"unescaped quote in literal of ${s.toList}")
    }
  }

  test("split buckets: in-range, complete and exclusive assignment") {
    import spark.implicits._
    val ids = (0 until 500).map(_ => rnd.alphanumeric.take(8).mkString)
    val df = ids.toDF("doc_id")
    val buckets = df.select(Sampling.splitBucket(col("doc_id")).as("b"))
      .collect().map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < 10000))
    val split = Sampling.split(df.withColumn("text", lit("t")),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 500, "every row gets exactly one split")
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.getOrElse("train", 0L) > counts.getOrElse("val", 0L),
      s"hash split wildly off: $counts")
  }

  test("bloom incremental dedup equals the plain anti-join on random corpora") {
    import spark.implicits._
    import graft.operators.Dedup
    // small content domain forces heavy cross- and within-batch dups
    def mk(n: Int, idBase: Long, domain: Int) = (0 until n).map { i =>
      (idBase + i, s"sentence ${rnd.nextInt(domain)} of the corpus", "s")
    }.toDF("doc_id", "text", "source")
    for (trial <- 0 until 3) {
      val corpus = mk(200, 0L, 120 + trial * 40)
      val fresh = mk(300, 1000L, 150 + trial * 40)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(canon(Dedup.incrementalExactBloom(fresh, corpus, fpp = 0.05)) ==
        canon(Dedup.incrementalExact(fresh, corpus)), s"trial $trial diverged")
    }
  }

  test("interval containment join equals brute force on random windows") {
    import spark.implicits._
    import graft.operators.IntervalJoin
    // adversarial: zero-length intervals, bucket-boundary endpoints,
    // intervals spanning 0..5 buckets (bucket width 100)
    val probes = (0 until 400).map(i => (i.toLong, rnd.nextInt(1000).toLong))
    val ivs = (0 until 80).map { i =>
      val s = rnd.nextInt(1000).toLong
      val len = rnd.nextInt(6) match {
        case 0 => 0L // zero-length
        case 1 => 100L - s % 100 // ends exactly on a bucket boundary
        case n => rnd.nextInt(n * 100).toLong
      }
      (10000L + i, s, s + len)
    }
    val got = IntervalJoin.containment(
        probes.toDF("probe_id", "ts"), "ts",
        ivs.toDF("interval_id", "s", "e"), "s", "e", bucketNs = 100L)
      .select("probe_id", "interval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (pid, ts) <- probes
      (iid, s, e) <- ivs if ts >= s && ts <= e
    } yield (pid, iid)).toSet
    assert(got == expected)
  }

  test("heavyHitters equals the in-memory census on random token streams") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = (0 until 200).map { i =>
      val toks = Seq.fill(3 + rnd.nextInt(20))(s"w${rnd.nextInt(12)}")
      (i.toLong, toks.mkString(" "), s"src${i % 3}")
    }
    val got = TextOps.heavyHitters(docs.toDF("doc_id", "text", "source"), k = 5)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val expected = docs.groupBy(_._3).flatMap { case (src, ds) =>
      val grams = ds.flatMap(d => d._2.split(" ").sliding(2)
        .filter(_.length == 2).map(_.mkString(" ")))
      val counts = grams.groupBy(identity).view.mapValues(_.size.toLong)
      counts.toSeq.sortBy { case (g, n) => (-n, g) }.take(5).zipWithIndex
        .map { case ((g, n), r) => (src, r + 1L, g, n) }
    }.toSet
    assert(got == expected)
  }

  test("bm25 equals the exact-rounding reference scorer on random corpora") {
    import spark.implicits._
    import graft.operators.Retrieval
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu")
    val docs = (0L until 80L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(28))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // query 4 carries an out-of-vocabulary term (zero postings)
    val queries = (0L until 5L).map { qi =>
      val ts = Seq.fill(1 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size)))
      (qi, (if (qi == 4) ts :+ "zzz" else ts).mkString(" "))
    }
    val k = 7
    val got = Retrieval.bm25TopK(
        docs.toDF("doc_id", "text"), queries.toDF("query_id", "qtext"), k)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // reference mirrors the operator's rounding chain: idf once to
    // micro units, each contribution once to milli, integer sums
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = docs.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n.toDouble
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val expected = queries.flatMap { case (qid, qt) =>
      val terms = qt.split(" ").distinct.filter(dfm.contains)
      val scored = docs.flatMap { case (did, _) =>
        val w = toks(did)
        val tfm = w.groupBy(identity).map { case (t, xs) => t -> xs.size }
        val contribs = terms.flatMap { t =>
          tfm.get(t).map { tf =>
            val idfMicro = math.round(math.log(n.toDouble / dfm(t).toDouble) * 1e6)
            math.round(((idfMicro.toDouble / 1000000.0) *
              ((tf.toDouble * 2.2) /
                (tf.toDouble + 1.2 * (0.25 + 0.75 * (w.size.toDouble / avgdl))))) * 1000.0)
          }
        }
        if (contribs.isEmpty) None else Some(did -> contribs.sum)
      }
      scored.sortBy { case (did, sc) => (-sc, did) }.take(k).zipWithIndex
        .map { case ((did, sc), i) => (qid, i + 1L, did, sc) }
    }.toSet
    assert(got == expected)
  }

  test("winnowing equals brute-force rightmost-window-min on random docs") {
    import spark.implicits._
    import graft.operators.TextOps
    val (k, w) = (3, 4)
    // 4-word vocab forces repeated grams -> the <=/< tie asymmetry
    // (rightmost-min rule) is genuinely exercised
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docs = (0L until 120L).map { i =>
      (i, Seq.fill(2 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = TextOps.winnow(docs.toDF("doc_id", "text"), k, w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.split(" ")
      if (toks.length < k + w - 1) Nil
      else {
        val hs = (0 to toks.length - k).map(p => hash60(toks.slice(p, p + k).mkString(" ")))
        (0 to hs.length - w).flatMap { p =>
          val win = hs.slice(p, p + w)
          val m = win.min
          val rightmost = p + win.lastIndexOf(m)
          Some((id, rightmost.toLong, hs(rightmost)))
        }.toSet
      }
    }.toSet
    assert(got == expected, s"winnow sets diverge: got ${got.size}, want ${expected.size}")
    // the winnowing guarantee: every window holds >= 1 fingerprint
    docs.foreach { case (id, text) =>
      val n = text.split(" ").length
      if (n >= k + w - 1) {
        val sel = got.collect { case (d, p, _) if d == id => p }
        (0L to (n - k - w + 1).toLong).foreach { p =>
          assert(sel.exists(s => s >= p && s < p + w), s"doc $id window $p uncovered")
        }
      }
    }
  }
}
