package graft

import graft.storage.Bucketing
import graft.functions.Salting
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a crashed prior run can leave the location without the metadata
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(loc)
    }
  }

  test("bucketed tables join with zero exchanges") {
    dropTable("b_orders")
    dropTable("b_lineitem")
    Bucketing.writeBucketed(
      tables.orders.select("o_orderkey", "o_custkey"),
      "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(
      tables.lineitem.select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", 4)
    val joined = Bucketing.coLocatedJoin(spark,
      "b_lineitem", "b_orders", "l_orderkey", "o_orderkey")
    joined.collect() // finalize AQE
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"co-located join must not shuffle:\n$plan")
    // and it is the same row count as the shuffled join
    val expected = tables.lineitem
      .join(tables.orders, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)
  }

  test("q3_bucketed: zero exchanges, same rows as q3_shipping") {
    // clean slate so the entry's own ensureBucketed path is exercised
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    dropTable(s"graft_b_lineitem_$tag")
    dropTable(s"graft_b_orders_$tag")
    val df = Bucketing.q3Bucketed(tables)
    val got = df.collect().map(_.toSeq).toSeq
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed q3 must not shuffle:\n$plan")
    val expected = graft.operators.Relational.q3Shipping(tables)
      .collect().map(_.toSeq).toSeq
    assert(got == expected)
  }

  test("word_count_salted equals word_count, order included") {
    val plain = graft.operators.WordCounts.wordCount(tables)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = graft.operators.WordCounts.wordCountSalted(tables)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(salted == plain)
  }

  test("salted count equals plain groupBy count") {
    val plain = tables.events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedCount(tables.events, "event_type", "event_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
