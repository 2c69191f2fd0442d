package graft

/** Guards on the driver contract itself: a future round cannot add a
  * query and silently forget its oracle (a missing oracleSql entry
  * downgrades the driver's check to rows-only without anyone noticing).
  */
class ContractSpec extends SparkSpec {

  test("every query has an oracle; every oracle has a query") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      s"mismatch: ${SparkEntry.queries.keySet diff SparkEntry.oracleSql.keySet} " +
        s"without oracle; ${SparkEntry.oracleSql.keySet diff SparkEntry.queries.keySet} " +
        "without query")
  }

  test("entry() is live and returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query executes at sf0.001 with non-empty schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.schema.fields.nonEmpty, s"$name has empty schema")
    }
  }
}
