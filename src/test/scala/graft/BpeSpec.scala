package graft

import graft.operators.Bpe

/** BPE trainer/encoder vs a plain-Scala reference implementation —
  * the merge loop has no SQL-expressible oracle, so the spec carries
  * the correctness argument (fixture + seeded random corpora). */
class BpeSpec extends SparkFunSuite {
  import spark.implicits._

  // ---- reference implementation (same tie-break, same greedy pass) ----
  private def refSymbols(w: String): Vector[String] = {
    val cs = w.map(_.toString).toVector
    cs.init :+ (cs.last + "</w>")
  }
  private def refMergePass(syms: Vector[String], a: String, b: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
      else acc :+ x
    }
  private def refTrain(words: Seq[String], k: Int): Seq[(String, String)] = {
    var vocab = words.filter(_.nonEmpty).groupBy(identity).toSeq
      .map { case (w, xs) => (refSymbols(w), xs.size.toLong) }
    val merges = collection.mutable.Buffer.empty[(String, String)]
    var stop = false
    while (merges.size < k && !stop) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.iterator.sliding(2).withPartial(false).foreach { p =>
          val key = (p.head, p(1))
          counts(key) = counts.getOrElse(key, 0L) + f
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val (pair, _) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        merges += pair
        vocab = vocab.map { case (s, f) => (refMergePass(s, pair._1, pair._2), f) }
      }
    }
    merges.toSeq
  }
  private def refEncodeLen(w: String, merges: Seq[(String, String)]): Long =
    merges.foldLeft(refSymbols(w)) { case (s, (a, b)) => refMergePass(s, a, b) }.size.toLong

  test("classic fixture: merges match the reference trainer") {
    val docs = Seq(
      (0L, "low low low lower lower lowest"),
      (1L, "new newer newest low newer")).toDF("doc_id", "text")
    val words = Seq("low", "low", "low", "lower", "lower", "lowest",
      "new", "newer", "newest", "low", "newer")
    val got = Bpe.train(docs, 6)
    val want = refTrain(words, 6)
    assert(got == want, s"merge lists diverge:\n got=$got\nwant=$want")
  }

  test("random corpora: merges and encoded token counts equal the reference") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd"
    def word() = (0 until 1 + rnd.nextInt(5))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = (0L until 60L).map { i =>
      (i, (0 until 3 + rnd.nextInt(10)).map(_ => word()).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val k = 8
    val got = Bpe.train(df, k)
    val allWords = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
    val want = refTrain(allWords, k)
    assert(got == want, s"merge lists diverge:\n got=$got\nwant=$want")

    val enc = Bpe.encode(df, got).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    docs.foreach { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val expect = ws.map(refEncodeLen(_, got)).sum
      assert(enc(id)._1 == expect, s"doc $id subword count")
      assert(enc(id)._2 == ws.length.toLong)
    }
  }

  test("merges only ever shrink the token stream, floor = one symbol per word") {
    val df = Seq((0L, "aaaa aaaa aa")).toDF("doc_id", "text")
    val none = Bpe.encode(df, Nil).collect().head.getLong(1)
    assert(none == 4L + 4L + 2L, "no merges -> one symbol per char")
    val merges = Bpe.train(df, 4)
    val merged = Bpe.encode(df, merges).collect().head.getLong(1)
    assert(merged < none && merged >= 3L)
  }
}
