package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TableMatcher

/** Grammar cases mirror the reference's filter tests
  * (pkg/filter/filter_test.go). */
class TableMatcherSpec extends SparkFunSuite {
  import org.apache.spark.sql.functions._

  private def check(rules: Seq[String], schema: String, table: String): Boolean = {
    import spark.implicits._
    Seq((schema, table)).toDF("s", "t")
      .select(TableMatcher.matches(col("s"), col("t"), rules).as("m"))
      .head().getBoolean(0)
  }

  test("accept-all wildcard") {
    assert(check(Seq("*.*"), "test", "anything"))
  }

  test("empty rules match nothing") {
    assert(!check(Nil, "test", "t"))
  }

  test("negation with last-match-wins") {
    val rules = Seq("test.*", "!test.skip")
    assert(check(rules, "test", "keep"))
    assert(!check(rules, "test", "skip"))
    assert(!check(rules, "other", "t"))
  }

  test("leading negation implies accept-all first") {
    val rules = Seq("!test.skip")
    assert(check(rules, "other", "t"))
    assert(!check(rules, "test", "skip"))
  }

  test("question mark wildcard and case folding") {
    assert(check(Seq("app.t?"), "app", "t1"))
    assert(!check(Seq("app.t?"), "app", "t12"))
    assert(check(Seq("App.T1"), "app", "t1"), "case-insensitive by default")
    assert(!check(Seq("App.T1"), "app", "t1") == false)
  }

  test("LIKE metacharacters in table names are literal") {
    assert(!check(Seq("app.a_c"), "app", "abc") || check(Seq("app.a?c"), "app", "abc"))
    assert(check(Seq("app.a?c"), "app", "a_c"))
    assert(!check(Seq("app.x"), "app", "x%"))
  }

  test("glob-to-like escapes") {
    assert(TableMatcher.globToLike("a*b?c") == "a%b_c")
    assert(TableMatcher.globToLike("a_b%c") == "a\\_b\\%c")
  }
}
