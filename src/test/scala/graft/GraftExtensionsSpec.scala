package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** vector_dot must be callable from plain SQL in a session built with
  * `.withExtensions(new GraftExtensions)`. */
class GraftExtensionsSpec extends AnyFunSuite {
  test("vector_dot registered through SparkSessionExtensions") {
    val shared = SparkSpec.spark // ensure the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extended = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val out = extended.sql(
        "SELECT vector_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .head().getDouble(0)
      assert(out == 32.0)
      val cos = extended.sql(
        "SELECT vector_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c," +
          " vector_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS o").head()
      assert(cos.getDouble(0) == 1.0 && cos.getDouble(1) == 0.0)
      // md5_prefix64 == the composable conv(substring(md5)) form,
      // for every digit width and on unicode input
      val hashRows = extended.sql(
        """SELECT s,
          |  md5_prefix64(s, 7) AS h7, md5_prefix64(s) AS h15,
          |  CAST(conv(substring(md5(s), 1, 7), 16, 10) AS BIGINT) AS e7,
          |  CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) AS e15
          |FROM VALUES ('table'), (''), ('中文 数据'), ('a|b|42') AS t(s)""".stripMargin)
        .collect()
      hashRows.foreach { r =>
        assert(r.getLong(1) == r.getLong(3), s"7-digit mismatch for ${r.getString(0)}")
        assert(r.getLong(2) == r.getLong(4), s"15-digit mismatch for ${r.getString(0)}")
      }
      // minhash_sig / split_bucket SQL surface matches the operator kernels
      val sig = extended.sql(
        "SELECT minhash_sig('a b c'), minhash_sig('a b c'), minhash_sig('x y z')")
        .head()
      assert(sig.getString(0) == sig.getString(1))
      assert(sig.getString(0) != sig.getString(2))
      assert(sig.getString(0).split(",").length ==
        graft.operators.Dedup.NumHashes)
      val buckets = extended.sql(
        "SELECT split_bucket(42), split_bucket(42), split_bucket(43)").head()
      assert(buckets.getLong(0) == buckets.getLong(1))
      assert(buckets.getLong(0) >= 0 && buckets.getLong(0) < 10000)
      // SQL registrations are bit-equal to the operator kernels
      val kernelEq = extended.sql(
        "SELECT 'a b c a' AS text, 7 AS id")
        .select(
          org.apache.spark.sql.functions.expr("minhash_sig(text)").as("sqlSig"),
          graft.operators.Dedup.minhashSignatureExpr(
            org.apache.spark.sql.functions.col("text")).as("opSig"),
          org.apache.spark.sql.functions.expr("split_bucket(id)").as("sqlB"),
          graft.operators.Sampling.splitBucket(
            org.apache.spark.sql.functions.col("id")).as("opB"))
        .head()
      assert(kernelEq.getString(0) == kernelEq.getString(1))
      assert(kernelEq.getLong(2) == kernelEq.getLong(3))
      // chunk_spans SQL surface ≡ the chunkWithOverlap operator
      import extended.implicits._
      val docs = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")),
        (2L, "a b")).toDF("doc_id", "text")
      val viaSql = docs.select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.posexplode(
            org.apache.spark.sql.functions.expr("chunk_spans(text, 4, 3)"))
            .as(Seq("chunk_idx", "c")))
        .select("doc_id", "chunk_idx", "c.start_tok", "c.n_tokens", "c.chunk_text")
        .collect().map(_.mkString("|")).sorted.toSeq
      val viaOp = graft.operators.TextOps.chunkWithOverlap(docs, 4, 3)
        .collect().map(_.mkString("|")).sorted.toSeq
      assert(viaSql == viaOp, "SQL chunker must equal the operator")

      // text_normalize / hash_score SQL surfaces ≡ the operators
      val messy = Seq((1L, "  A <i>B</i>\tC  ", "s"), (2L, "x y z", "s"))
        .toDF("doc_id", "text", "source")
      val normSql = messy.selectExpr("doc_id", "text_normalize(text) AS t")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val normOp = graft.operators.TextOps.normalizeText(messy)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(normSql == normOp, "SQL normalize must equal the operator")
      assert(normSql(1L) == "a b c")
      val scoreSql = messy.selectExpr("doc_id", "hash_score(text, 256) AS s")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val scoreOp = graft.operators.TextOps.hashedLinearScore(messy, 256)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micro")).toMap
      assert(scoreSql == scoreOp, "SQL hash score must equal the operator")
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
