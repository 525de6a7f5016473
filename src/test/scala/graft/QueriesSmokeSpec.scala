package graft

/** Every declared query runs on sf0.001 and the flagship returns rows. */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has oracle SQL or is a documented rows-only check") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only checks are allowed but should stay rare and deliberate
    assert(noOracle.forall(_.startsWith("x_")), s"missing oracle for: $noOracle")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // materialize
    }
  }
}
