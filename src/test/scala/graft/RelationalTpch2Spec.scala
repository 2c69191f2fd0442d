package graft

import graft.operators.RelationalTpch2
import org.apache.spark.sql.functions._

class RelationalTpch2Spec extends SparkSpec {

  test("q6: zero joins, every predicate pushed to the scan") {
    val df = RelationalTpch2.q6ForecastRevenue(tables)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"Q6 must be join-free:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      "PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(plan).isDefined,
      s"shipdate bound must reach the scan:\n$plan")
    assert("PushedFilters: \\[[^\\]]*l_quantity".r.findFirstIn(plan).isDefined,
      s"quantity bound must reach the scan:\n$plan")
    val r = df.collect()(0)
    assert(r.getAs[Long]("n_lines") > 0)
    assert(r.getAs[Double]("revenue") > 0)
  }

  test("q8: share in (0,1]; numerator never exceeds denominator; facts shuffle once") {
    val df = RelationalTpch2.q8MarketShare(tables)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"every dim hop must broadcast (orders join may SMJ-free via shuffle hash):\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nat = r.getAs[Double]("nation_rev")
      val tot = r.getAs[Double]("total_rev")
      val share = r.getAs[Double]("mkt_share6")
      assert(nat >= 0 && nat <= tot)
      assert(share >= 0 && share <= 1)
    }
  }

  test("q19: disjunctive brackets evaluate in one scan+join — no Union of passes") {
    val df = RelationalTpch2.q19BracketRevenue(tables)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"brackets must not split into a union:\n$plan")
    assert("FileScan parquet".r.findAllIn(plan).length == 2,
      s"exactly one lineitem + one part scan:\n$plan")
    val r = df.collect()(0)
    assert(r.getAs[Long]("n_lines") > 0)
    // reconcile against the three brackets summed independently
    val li = tables.lineitem.join(tables.part,
      col("l_partkey") === col("p_partkey"))
    val n = Seq(
      li.filter(col("p_brand") === "Brand#11" &&
        col("l_quantity").between(1, 11) && col("p_size").between(1, 5)),
      li.filter(col("p_brand") === "Brand#22" &&
        col("l_quantity").between(10, 20) && col("p_size").between(1, 10)),
      li.filter(col("p_brand") === "Brand#33" &&
        col("l_quantity").between(20, 30) && col("p_size").between(5, 15))
    ).map(_.count()).sum
    assert(r.getAs[Long]("n_lines") == n,
      "brackets are disjoint (distinct brands) so counts must add up")
  }

  test("q20: every dominant pair holds >2x its fair share; reuses the pair aggregate") {
    val df = RelationalTpch2.q20DominantSupplier(tables)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sq = r.getAs[Double]("supp_qty")
      val pq = r.getAs[Double]("part_qty")
      val n = r.getAs[Long]("n_supp")
      assert(sq * n > 2.0 * pq, "fair-share rule violated")
      assert(r.getAs[Double]("share6") > 0)
    }
    // independent recount of one reported part from raw lineitem
    val pk = rows.head.getAs[Long]("l_partkey")
    val direct = tables.lineitem.filter(col("l_partkey") === pk)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("q")).collect()
    val tot = direct.map(_.getAs[Double]("q")).sum
    val dominant = direct.filter(_.getAs[Double]("q") * direct.length > 2.0 * tot)
      .map(_.getAs[Long]("l_suppkey")).toSet
    val reported = rows.filter(_.getAs[Long]("l_partkey") == pk)
      .map(_.getAs[Long]("s_suppkey")).toSet
    assert(reported == dominant)
  }

  test("q21: blame assignment is sole-offender and order counts reconcile") {
    val df = RelationalTpch2.q21SoleBlame(tables)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("numwait")).sum
    // independent recount through a different formulation (join-based)
    val orders = tables.lineitem
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("ns"))
      .filter(col("ns") >= 2)
    val rOrders = tables.lineitem
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey").as("rk"))
      .agg(countDistinct(col("l_suppkey")).as("nr"))
      .filter(col("nr") === 1)
    val direct = orders.join(rOrders, col("l_orderkey") === col("rk")).count()
    assert(total == direct || rows.length == 100,
      s"numwait total $total must cover all $direct blamed orders (unless truncated at 100 suppliers)")
  }
}
