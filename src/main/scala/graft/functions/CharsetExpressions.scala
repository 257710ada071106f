package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset / collation matrix (SURVEY §1.3, §2.7).
  *
  * Upstream TiDB columns may be declared `CHARACTER SET gbk`
  * (`gb18030`, `latin1`, `big5`, ...); the stored value bytes are in
  * that charset and the reference's mounter decodes them to UTF-8
  * while building the row image (canal_json GBK integration data:
  * tests/integration_tests/canal_json_basic/data/data_gbk.sql;
  * mounter charset cases pkg/common/event/mounter_test.go). In this
  * engine the same mount-time step is [[CharsetDecode]] — a codegen'd
  * `BINARY → STRING` decode under any JVM charset, with the decoder's
  * REPLACE action (malformed input → U+FFFD) matching the lossy-but-
  * total behavior a replication pipeline needs. [[CharsetEncode]] is
  * the sink-side reverse (e.g. writing back to a GBK downstream).
  *
  * BLOB framing: canal-JSON carries binary column values as the
  * ISO-8859-1 decoding of the raw bytes (one char per byte,
  * reference canal_json_encoder.go:32 `bytesDecoder`), and the
  * consumer re-encodes with ISO-8859-1 to recover the bytes
  * (canal_json_decoder.go:458-459). [[CanalBlobJson]] emits the
  * complete JSON string literal (quotes + escaping) for a byte array
  * in one expression so arbitrary bytes — including control bytes a
  * regexp-based escape would miss — survive the round trip.
  */
object CharsetExpressions {
  /** `BINARY → STRING` under `charsetName` (mount-time decode). */
  def charsetDecode(c: Column, charsetName: String): Column =
    GraftColumnBridge.column(CharsetDecode(
      GraftColumnBridge.expression(c), charsetName))

  /** `STRING → BINARY` under `charsetName` (sink-side encode). */
  def charsetEncode(c: Column, charsetName: String): Column =
    GraftColumnBridge.column(CharsetEncode(
      GraftColumnBridge.expression(c), charsetName))

  /** Canal-JSON wire value for a BLOB column: a complete JSON string
    * literal whose chars are the ISO-8859-1 view of the bytes. */
  def canalBlobJson(c: Column): Column =
    GraftColumnBridge.column(CanalBlobJson(GraftColumnBridge.expression(c)))

  /** Consumer-side reverse of the BLOB framing: the parsed JSON
    * string (already unescaped by the JSON parser) back to bytes. */
  def canalBlobBytes(c: Column): Column = charsetEncode(c, "ISO-8859-1")

  /** Cached charset lookup — `Charset.forName` per row would dominate
    * the decode cost. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, java.nio.charset.Charset]()
  def charsetFor(name: String): java.nio.charset.Charset =
    cache.computeIfAbsent(name, java.nio.charset.Charset.forName(_))

  def decode(bytes: Array[Byte], charsetName: String): UTF8String =
    // String(bytes, cs) uses the REPLACE action for malformed input —
    // total function, like the reference's lossy mounter decode
    UTF8String.fromString(new String(bytes, charsetFor(charsetName)))

  def encode(s: UTF8String, charsetName: String): Array[Byte] =
    s.toString.getBytes(charsetFor(charsetName))

  /** Bytes → `"…"` JSON literal, chars = ISO-8859-1 view, escaping
    * `"`, `\` and control chars (<0x20) as JSON requires. */
  def blobJson(bytes: Array[Byte]): UTF8String = {
    val sb = new java.lang.StringBuilder(bytes.length + 2)
    sb.append('"')
    var i = 0
    while (i < bytes.length) {
      val ch = (bytes(i) & 0xff).toChar
      ch match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    UTF8String.fromString(sb.toString)
  }
}

case class CharsetDecode(child: Expression, charsetName: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"charset_decode needs a binary column, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    CharsetExpressions.decode(input.asInstanceOf[Array[Byte]], charsetName)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("charsetName", charsetName, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharsetExpressions.decode($c, $cs);")
  }
  override protected def withNewChildInternal(newChild: Expression): CharsetDecode =
    copy(child = newChild)
}

case class CharsetEncode(child: Expression, charsetName: String)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"charset_encode needs a string column, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    CharsetExpressions.encode(input.asInstanceOf[UTF8String], charsetName)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("charsetName", charsetName, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharsetExpressions.encode($c, $cs);")
  }
  override protected def withNewChildInternal(newChild: Expression): CharsetEncode =
    copy(child = newChild)
}

case class CanalBlobJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"canal_blob_json needs a binary column, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    CharsetExpressions.blobJson(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharsetExpressions.blobJson($c);")
  override protected def withNewChildInternal(newChild: Expression): CanalBlobJson =
    copy(child = newChild)
}
