package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.vectorDot

/** The native VectorDot expression must be bit-identical to the
  * composable zip_with+aggregate form (same left-to-right double
  * fold) in both codegen and interpreted paths. */
class VectorDotSpec extends SparkFunSuite {
  import spark.implicits._

  private def composable(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("matches composable form bit-for-bit on float arrays") {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(vectorDot(col("embedding"), col("embedding")).as("native"),
        composable(col("embedding"), col("embedding")).as("ref"))
    assert(df.filter(col("native") =!= col("ref")).count() == 0)
  }

  test("handles double arrays and mixed lengths") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0)))
      .toDF("a", "b")
      .select(vectorDot(col("a"), col("b")).as("d"))
    assert(df.head().getDouble(0) == 14.0) // min-length semantics
  }

  test("null array yields null") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(vectorDot(col("a"), col("b")).as("d"))
    assert(df.head().isNullAt(0))
  }

  test("rejects non-array inputs at analysis") {
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(vectorDot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("vector_dot") ||
      e.getMessage.toLowerCase.contains("datatype") ||
      e.getMessage.toLowerCase.contains("data type"))
  }
}
