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
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
