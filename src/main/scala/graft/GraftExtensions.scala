package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CanalBlobJson, CharsetDecode, CharsetEncode, Md5PrefixLong, VectorDot}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use, so
  * `spark.sql("SELECT vector_dot(a, b) ...")` works in any session
  * built with `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vector_dot(a, b) takes two arrays")
        VectorDot(children.head, children(1))
      }))
    // cosine composed from the native dot — one SQL surface for the
    // similarity operators (deterministic left-to-right accumulation)
    e.injectFunction((
      new FunctionIdentifier("vector_cosine"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vector_cosine(a, b) takes two arrays")
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        val (a, b) = (children.head, children(1))
        Divide(VectorDot(a, b),
          Multiply(Sqrt(VectorDot(a, a)), Sqrt(VectorDot(b, b))))
      }))
    // the wire-visible stable-hash kernel (routing partitions, token
    // hashes, fingerprints): md5_prefix64(s[, hexDigits]) ==
    // conv(substring(md5(s), 1, hexDigits), 16, 10)
    e.injectFunction((
      new FunctionIdentifier("md5_prefix64"),
      new ExpressionInfo(classOf[Md5PrefixLong].getName, "md5_prefix64"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          "md5_prefix64(s[, hexDigits]) takes one string + optional digit count")
        val digits = if (children.size == 2) {
          val lit = children(1).eval(null)
          require(lit != null, "hexDigits must be a literal")
          lit.toString.toInt
        } else 15
        Md5PrefixLong(children.head, digits)
      }))
    // the dedup/sampling kernels as SQL functions (pure catalyst
    // trees — the Column-built forms carry unresolved nodes that the
    // function registry cannot analyze): the 16-lane minhash
    // signature and the deterministic split/sampling bucket
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[Md5PrefixLong].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "minhash_sig(text) takes one string")
        import org.apache.spark.sql.catalyst.expressions._
        import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
        val tok = NamedLambdaVariable("t", StringType, nullable = true)
        val hashed = ArrayTransform(
          ArrayDistinct(StringSplit(children.head, Literal(" "), Literal(-1))),
          LambdaFunction(Md5PrefixLong(tok, 7), Seq(tok)))
        // evaluate the token-hash array ONCE via a single-element
        // outer transform whose lambda variable is a materialized
        // value — embedding `hashed` in each lane would re-tokenize
        // and re-hash the row once per lane (16×), the same trap
        // Dedup.minhashSignatureExpr avoids
        val hs = NamedLambdaVariable("hs", ArrayType(LongType), nullable = true)
        val lanes: Seq[Expression] = (0 until graft.operators.Dedup.NumHashes).map { i =>
          val h = NamedLambdaVariable(s"h$i", LongType, nullable = true)
          Cast(ArrayMin(ArrayTransform(hs,
            LambdaFunction(
              Pmod(Add(Multiply(h, Literal(graft.operators.Dedup.hashA(i))),
                Literal(graft.operators.Dedup.hashB(i))),
                Literal(graft.operators.Dedup.MinhashPrime)),
              Seq(h)))), StringType)
        }
        ElementAt(
          ArrayTransform(CreateArray(Seq(hashed)),
            LambdaFunction(ConcatWs(Literal(",") +: lanes), Seq(hs))),
          Literal(1))
      }))
    // charset matrix (GBK/GB18030/latin1 mount decode, sink encode,
    // canal BLOB framing — SURVEY §1.3; reference
    // canal_json_encoder.go:32, data_gbk.sql)
    def litString(e: Expression, what: String): String = {
      val v = e.eval(null)
      require(v != null, s"$what must be a literal string")
      v.toString
    }
    e.injectFunction((
      new FunctionIdentifier("charset_decode"),
      new ExpressionInfo(classOf[CharsetDecode].getName, "charset_decode"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "charset_decode(bin, 'GBK') takes two args")
        CharsetDecode(children.head, litString(children(1), "charset name"))
      }))
    e.injectFunction((
      new FunctionIdentifier("charset_encode"),
      new ExpressionInfo(classOf[CharsetEncode].getName, "charset_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "charset_encode(str, 'GBK') takes two args")
        CharsetEncode(children.head, litString(children(1), "charset name"))
      }))
    e.injectFunction((
      new FunctionIdentifier("canal_blob_json"),
      new ExpressionInfo(classOf[CanalBlobJson].getName, "canal_blob_json"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "canal_blob_json(bin) takes one binary arg")
        CanalBlobJson(children.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("split_bucket"),
      new ExpressionInfo(classOf[Md5PrefixLong].getName, "split_bucket"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "split_bucket(id) takes one argument")
        import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Pmod}
        import org.apache.spark.sql.types.StringType
        Pmod(Md5PrefixLong(Cast(children.head, StringType), 15), Literal(10000L))
      }))
    // the RAG chunker as a pure SQL function: chunk_spans(text, chunk,
    // stride) → array<struct<start_tok,n_tokens,chunk_text>> — the
    // same catalyst tree TextOps.chunkWithOverlap builds (windows
    // every `stride` tokens, last window reaches the doc end)
    e.injectFunction((
      new FunctionIdentifier("chunk_spans"),
      new ExpressionInfo(classOf[Md5PrefixLong].getName, "chunk_spans"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "chunk_spans(text, chunkTokens, strideTokens) takes three args")
        import org.apache.spark.sql.catalyst.expressions._
        import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}
        def litLong(e: Expression, what: String): Long = {
          val v = e.eval(null); require(v != null, s"$what must be a literal")
          v.toString.toLong
        }
        val chunk = litLong(children(1), "chunkTokens")
        val stride = litLong(children(2), "strideTokens")
        require(chunk > 0 && stride > 0 && stride <= chunk,
          s"need 0 < stride <= chunk, got chunk=$chunk stride=$stride")
        val w = StringSplit(children.head, Literal(" "), Literal(-1))
        val n = Cast(Size(w), LongType)
        val lastIdx = Greatest(Seq(Literal(0L),
          Cast(Ceil(Divide(Cast(Subtract(n, Literal(chunk)), DoubleType),
            Literal(stride.toDouble))), LongType)))
        val i = NamedLambdaVariable("i", LongType, nullable = false)
        val start = Multiply(i, Literal(stride))
        val body = CreateNamedStruct(Seq(
          Literal("start_tok"), start,
          Literal("n_tokens"), Least(Seq(Literal(chunk), Subtract(n, start))),
          Literal("chunk_text"), ConcatWs(Seq(Literal(" "),
            Slice(w, Cast(Add(start, Literal(1L)), IntegerType),
              Literal(chunk.toInt))))))
        ArrayTransform(new Sequence(Literal(0L), lastIdx, None),
          LambdaFunction(body, Seq(i)))
      }))
    // the text-cleaning kernel (TextOps.normalizeExpr) as SQL:
    // text_normalize(s) — strip markup, blank control chars, collapse
    // whitespace, trim, lower (same catalyst tree as the operator)
    e.injectFunction((
      new FunctionIdentifier("text_normalize"),
      new ExpressionInfo(classOf[Md5PrefixLong].getName, "text_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "text_normalize(text) takes one argument")
        import org.apache.spark.sql.catalyst.expressions._
        val stripped = RegExpReplace(children.head,
          Literal("<[^>]*>"), Literal(" "))
        val noCtl = RegExpReplace(stripped,
          Literal("[\\x00-\\x1F\\x7F]"), Literal(" "))
        Lower(StringTrim(RegExpReplace(noCtl, Literal("\\s+"), Literal(" "))))
      }))
    // the hashed-linear-gate kernel as SQL: hash_score(text, dim) →
    // micro-unit document score (dim must be a literal)
    e.injectFunction((
      new FunctionIdentifier("hash_score"),
      new ExpressionInfo(classOf[Md5PrefixLong].getName, "hash_score"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "hash_score(text, dim) takes two args")
        val dimV = children(1).eval(null)
        require(dimV != null, "dim must be a literal")
        val dim = dimV.toString.toLong
        require(dim > 0, s"dim must be positive, got $dim")
        import org.apache.spark.sql.catalyst.expressions._
        import org.apache.spark.sql.types.{LongType, StringType}
        val w = StringSplit(children.head, Literal(" "), Literal(-1))
        val acc = NamedLambdaVariable("acc", LongType, nullable = true)
        val t = NamedLambdaVariable("t", StringType, nullable = true)
        val bucket = Pmod(Md5PrefixLong(t, 15), Literal(dim))
        val weight = Subtract(
          Pmod(Add(Multiply(bucket, Literal(2654435761L)), Literal(1L)),
            Literal(2001L)),
          Literal(1000L))
        val x = NamedLambdaVariable("x", LongType, nullable = true)
        ArrayAggregate(w, Literal(0L),
          LambdaFunction(Add(acc, weight), Seq(acc, t)),
          LambdaFunction(x, Seq(x)))
      }))
  }
}
