package graft

/** Every declared query must run green on sf0.001 and return rows —
  * mirrors the driver's t1 smoke gate.
  */
class QueriesSmokeSpec extends SparkSpec {
  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf0001).count() > 0)
    }
  }

  test("every query has an oracle or is documented rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // keep this list tight: rows-only checks are weaker
    assert(noOracle.subsetOf(SparkEntry.rowsOnlyQueries),
      s"queries missing oracle SQL: ${noOracle.mkString(", ")}")
  }
}
