package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{Md5PrefixLong, VectorDot}

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
  }
}
