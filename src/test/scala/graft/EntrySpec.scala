package graft

/** The driver contract: entry smoke + every query has a runnable
  * plan and every oracle key maps to a declared query. */
class EntrySpec extends SparkFunSuite {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every declared query is oracle-checked (no silent rows-only checks)") {
    // a query missing its oracle must be a conscious decision, not an
    // oversight — approximate-by-design ops are listed here explicitly
    // (their error bounds are spec-verified instead)
    val approximateByDesign = Set("q_corpus_sketch")
    val unchecked = SparkEntry.queries.keySet
      .diff(SparkEntry.oracleSql.keySet).diff(approximateByDesign)
    assert(unchecked.isEmpty, s"queries without oracles: $unchecked")
  }

  test("every query builds an analyzable plan at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.nonEmpty, s"$name has empty schema")
    }
  }
}
