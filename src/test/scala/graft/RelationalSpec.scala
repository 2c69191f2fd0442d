package graft

import graft.operators.Relational
import org.apache.spark.sql.functions.col

class RelationalSpec extends SparkSpec {
  test("q1_pricing groups and sums") {
    val rows = Relational.q1Pricing(tables).collect()
    assert(rows.nonEmpty)
    val schema = rows.head.schema.fieldNames.toSeq
    assert(schema == Seq("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty",
      "avg_price", "avg_disc", "count_order"))
    // every group's avg*count == sum (exact decimal path)
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val avgQty = r.getAs[Double]("avg_qty")
      val n = r.getAs[Long]("count_order")
      assert(math.abs(avgQty * n - sumQty) < 1e-6)
    }
  }

  test("q7: dims ride broadcast joins; matrix totals reconcile with a direct sum") {
    val df = Relational.q7NationVolume(tables)
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 4,
      s"dimension hops must broadcast:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
    // matrix item total == the filtered fact count (nothing dropped
    // or double-counted across the 4 joins)
    val items = rows.map(_.getAs[Long]("n_items")).sum
    val direct = tables.lineitem
      .filter(org.apache.spark.sql.functions.col("l_shipdate")
        .between("1996-01-01 00:00:00", "1997-12-31 00:00:00")).count()
    assert(items == direct)
  }

  test("q10: top-k compiles to a partial TakeOrderedAndProject, never a global sort") {
    val df = Relational.q10ReturnedCustomers(tables)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no partial top-k:\n$plan")
    val rows = df.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    // descending revenue with custkey tie-break
    val revs = rows.map(_.getAs[Double]("revenue")).toSeq
    assert(revs == revs.sorted.reverse)
  }

  test("q16: distinct-first link, broadcast anti + dim joins, counts reconcile with a direct recount") {
    val t = tables
    val df = Relational.q16SupplierDiversity(t)
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin [^\\n]*LeftAnti".r.findFirstIn(plan).isDefined,
      s"bad-supplier exclusion should be a broadcast ANTI join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"NLJ leaked:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"dims must broadcast:\n$plan")
    val got = df.collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // independent recount: per-(brand,size) distinct good suppliers
    import spark.implicits._
    val bad = t.supplier.filter(col("s_acctbal") < 0)
      .select("s_suppkey").as[Long].collect().toSet
    val dims = t.part.collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getInt(4))).toMap
    val exp = t.lineitem.select("l_partkey", "l_suppkey").distinct()
      .as[(Long, Long)].collect()
      .filter { case (pk, sk) => !bad.contains(sk) &&
        dims.get(pk).exists { case (b, s) =>
          b != Relational.Q16ExcludedBrand &&
            Relational.Q16Sizes.contains(s) } }
      .groupBy { case (pk, _) => dims(pk) }
      .map { case (k, v) => k -> v.map(_._2).distinct.length.toLong }
    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("q14: conditional-aggregate ratio reconciles; part broadcasts; shipdate filter pushed") {
    val t = tables
    val df = Relational.q14PromoShare(t)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"part must broadcast:\n$plan")
    assert(plan.contains("PushedFilters") &&
      "PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_shipdate"
        .r.findFirstIn(plan).isDefined,
      s"shipdate window must reach the scan:\n$plan")
    val rows = df.collect()
      .map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet == (1 to 12).toSet, "full 1996 coverage")
    rows.foreach { case (m, (pr, tr, pct)) =>
      assert(pr >= 0 && pr <= tr, s"month $m promo > total")
      assert(pct >= 0.0 && pct <= 100.0)
      assert(math.abs(pct -
        graft.functions.Portable.round6Double(100.0 * pr / tr)) < 1e-9)
    }
  }
}
