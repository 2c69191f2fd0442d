package graft

import graft.operators.RelationalTpch
import org.apache.spark.sql.functions._

class RelationalTpchSpec extends SparkSpec {

  test("q4: semi join collapses the probe to keys — no lineitem payload crosses the shuffle") {
    val df = RelationalTpch.q4PriorityExists(tables)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS must compile to a semi join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // reconcile: total == distinct orders in window having an R line
    val total = rows.map(_.getAs[Long]("order_count")).sum
    val direct = tables.orders
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00") &&
        col("o_orderdate") < lit("1996-04-01 00:00:00"))
      .join(tables.lineitem.filter(col("l_returnflag") === "R")
        .select("l_orderkey").distinct(),
        col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(total == direct)
  }

  test("q12: high+low counts partition the joined lines exactly") {
    val rows = RelationalTpch.q12PriorityClass(tables).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r => r.getAs[Long]("high_line_count") +
      r.getAs[Long]("low_line_count")).sum
    val direct = tables.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00"))
      .join(tables.orders, col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(total == direct)
  }

  test("q13: distribution covers every customer exactly once (outer join keeps zero-order custs)") {
    val rows = RelationalTpch.q13OrderDistribution(tables).collect()
    val custs = rows.map(_.getAs[Long]("custdist")).sum
    assert(custs == tables.customer.count(),
      "every customer must appear in exactly one distribution bucket")
    // weighted count sum == filtered order count
    val orders = rows.map(r =>
      r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum
    val direct = tables.orders
      .filter(!col("o_orderpriority").startsWith("4")).count()
    assert(orders == direct)
  }

  test("q15: winners carry the true maximum; max rides a broadcast join not a window") {
    val df = RelationalTpch.q15TopSupplier(tables)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"scalar max must not be a window:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"one-row max must broadcast:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val win = rows.head.getAs[Double]("total_revenue")
    // no supplier in the window beats the reported winner
    val best = tables.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
        col("l_shipdate") < lit("1996-04-01 00:00:00"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1).cast("decimal(12,2)") -
          col("l_discount").cast("decimal(12,2)"))).cast("double").as("r"))
      .agg(max(col("r"))).collect()(0).getDouble(0)
    assert(win == best)
  }

  test("q17: pre-agg + join reuse one partitioning; small-qty lines all sit below their part average") {
    val t = tables
    val df = RelationalTpch.q17SmallQtyRevenue(t)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // recount with an independent window formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_partkey"))
    val direct = t.lineitem
      .withColumn("avgq", sum(col("l_quantity")).over(w) /
        count(lit(1)).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("avgq"))
      .count()
    assert(rows.map(_.getAs[Long]("n_small")).sum == direct)
  }

  test("q22: threshold + anti join — survivors have above-avg balance and no recent order") {
    val df = RelationalTpch.q22ChurnBalance(tables)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"churn gate must be an anti join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("numcust")).sum
    val avgBal = tables.customer.filter(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast("decimal(12,2)")).cast("double") /
        count(lit(1)))).collect()(0).getDouble(0)
    val direct = tables.customer
      .filter(col("c_acctbal").cast("decimal(12,2)").cast("double") > avgBal)
      .join(tables.orders
        .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00"))
        .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(n == direct && n > 0)
  }

  test("q11: every reported part exceeds the fraction of the grand total") {
    val rows = RelationalTpch.q11ImportantParts(tables).collect()
    assert(rows.nonEmpty)
    val total = tables.lineitem
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double"))
      .collect()(0).getDouble(0)
    rows.foreach { r =>
      assert(r.getAs[Double]("value") > 0.001 * total)
    }
    // descending order with partkey tie-break
    val vals = rows.map(_.getAs[Double]("value")).toSeq
    assert(vals == vals.sorted.reverse)
  }

  test("q9: all dims broadcast — the only shuffle is the final groupBy") {
    val df = RelationalTpch.q9ProductProfit(tables)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"dims must broadcast:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3,
      s"part/supplier/nation hops must broadcast:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 2, s"expected only the groupBy exchange(s):\n$plan")
    assert(df.collect().nonEmpty)
  }

  test("q2: argmin is a hash-partitioned window (no global sort); winners are true minima") {
    val df = RelationalTpch.q2MinCostSupplier(tables)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-100 must be a partial top-k:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // winner cost per part == independent min over the link
    val link = tables.lineitem
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
      .groupBy(col("l_partkey")).agg(min(col("cost")).as("mn"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Double]("cost") == link(r.getAs[Long]("p_partkey")))
    }
  }
}
