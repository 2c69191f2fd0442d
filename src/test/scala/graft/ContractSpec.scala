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

  test("every query EXECUTES at sf0.001 (not just analyzes)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.schema.fields.nonEmpty, s"$name has empty schema")
      // actually run the plan — analysis-only checks miss runtime
      // failures (ANSI out-of-bounds, codegen errors, bad casts)
      try df.limit(1).collect()
      catch { case e: Throwable => fail(s"$name failed at runtime: $e") }
    }
  }
}
