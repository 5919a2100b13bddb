package graft

/** Every registered query must run on sf0.001 and produce rows, and every
  * oracleSql key must reference a registered query.
  */
class QueriesSpec extends SparkTestBase {

  test("oracleSql keys are a subset of queries keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without query: $orphans")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs and returns rows on sf0.001") {
      val df = fn(spark, sf("sf0.001"))
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
