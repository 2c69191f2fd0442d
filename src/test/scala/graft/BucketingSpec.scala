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
    dropTable("graft_b_lineitem_" + graft.storage.Materialize.corpusTag(
      tables, "lineitem", s"q3|b=${Bucketing.Q3Buckets}"))
    dropTable("graft_b_orders_" + graft.storage.Materialize.corpusTag(
      tables, "orders", s"q3|b=${Bucketing.Q3Buckets}"))
    val df = Bucketing.q3Bucketed(tables)
    val got = df.collect().map(_.toSeq).toSeq
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed q3 must not shuffle:\n$plan")
    val expected = graft.operators.Relational.q3Shipping(tables)
      .collect().map(_.toSeq).toSeq
    assert(got == expected)
  }

  test("q3_bucketed cache tag tracks the source file inventory, not the path") {
    // A corpus REGENERATED at the same path must produce new bucketed
    // tables — a path-keyed tag would silently serve the stale buckets
    // (the staleness mode Materialize.corpusTag exists to close).
    val dir = java.nio.file.Files.createTempDirectory("graft_q3stale").toString
    Seq("lineitem", "orders", "customer").foreach { tb =>
      spark.read.parquet(s"$sfDir/$tb.parquet")
        .write.mode("overwrite").parquet(s"$dir/$tb.parquet")
    }
    val t = Tables(spark, dir)
    def lineitemTables(p: String): Set[String] =
      "graft_b_lineitem_[0-9a-f]+".r.findAllIn(p).toSet
    val r1 = Bucketing.q3Bucketed(t)
    r1.collect()
    val tables1 = lineitemTables(r1.queryExecution.executedPlan.toString)
    assert(tables1.size == 1)
    // regenerate lineitem at the SAME path: same rows, new file inventory
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r2 = Bucketing.q3Bucketed(t)
    val got = r2.collect().map(_.toSeq).toSeq
    val tables2 = lineitemTables(r2.queryExecution.executedPlan.toString)
    assert(tables2.size == 1)
    assert(tables1 != tables2,
      s"stale bucketed table $tables1 served after source rewrite")
    // and the rebuilt table is correct
    val expected = graft.operators.Relational.q3Shipping(t)
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

  test("Materialize.reapStale deletes only exact-prefix stale tags") {
    import graft.storage.Materialize
    val wh = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    def plant(name: String): java.io.File = {
      val d = new java.io.File(wh, name)
      d.mkdirs()
      new java.io.File(d, "_SUCCESS").createNewFile()
      d
    }
    val keep = plant("graft_testreap_aaaaaaaaaaaa")
    val stale = plant("graft_testreap_bbbbbbbbbbbb")
    // prefix-of-a-prefix traps: a LONGER store name sharing the prefix,
    // and a dir whose suffix is not a 12-hex tag — both must survive
    val longer = plant("graft_testreap_keep_cccccccccccc")
    val notATag = plant("graft_testreap_not-a-tag")
    val reaped = Materialize.reapStale(spark, "graft_testreap",
      keep = Set("aaaaaaaaaaaa"))
    assert(reaped == Seq("graft_testreap_bbbbbbbbbbbb"), reaped.toString)
    assert(keep.exists() && longer.exists() && notATag.exists())
    assert(!stale.exists())
  }
}
