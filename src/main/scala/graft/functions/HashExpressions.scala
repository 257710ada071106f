package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native `conv(substring(md5(s), 1, n), 16, 10)` — the stable-hash
  * kernel every wire-visible hash in this engine uses (token hashes,
  * routing partitions, fingerprints; SURVEY §2.6). The composable form
  * materializes a 32-char hex string, substrings it, and runs a
  * string base-conversion PER ROW; this expression digests the UTF-8
  * bytes and assembles the first `hexDigits` nibbles into a long
  * directly — same value, no intermediate strings. hexDigits ≤ 15
  * keeps the result non-negative (60 bits), which the oracle's
  * `CAST('0x'||substring(md5(x),1,n) AS BIGINT)` mirror also
  * guarantees.
  */
case class Md5PrefixLong(child: Expression, hexDigits: Int)
    extends UnaryExpression {

  require(hexDigits >= 1 && hexDigits <= 15, s"hexDigits $hexDigits out of [1,15]")

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix64 needs a string column, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Md5PrefixLong.compute(input.asInstanceOf[UTF8String].getBytes, hexDigits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5PrefixLong.compute($c.getBytes(), $hexDigits);")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

object Md5PrefixLong {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `hexDigits` nibbles of md5(bytes) as a long — identical to
    * `conv(substring(md5(x), 1, hexDigits), 16, 10)`. */
  def compute(bytes: Array[Byte], hexDigits: Int): Long = {
    val md = digest.get()
    md.reset()
    val h = md.digest(bytes)
    var acc = 0L
    var i = 0
    while (i < hexDigits) {
      val b = h(i >> 1) & 0xff
      val nibble = if ((i & 1) == 0) b >>> 4 else b & 0xf
      acc = (acc << 4) | nibble
      i += 1
    }
    acc
  }
}

object HashExpressions {
  /** Column API: stable 4·n-bit md5-prefix hash as long. */
  def md5Prefix64(c: Column, hexDigits: Int): Column =
    GraftColumnBridge.column(Md5PrefixLong(
      GraftColumnBridge.expression(c), hexDigits))
}
