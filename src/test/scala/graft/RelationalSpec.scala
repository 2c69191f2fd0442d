package graft

import graft.operators.Relational

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
}
