package graft

/** Every registered query must run and (except known-empty ones) return
  * rows at the smoke scale factor; every oracle key must exist in queries. */
class QueriesSpec extends SparkSpec {

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without query impl: $missing")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      assert(fn(spark, sf()).count() > 0)
    }
  }
}
