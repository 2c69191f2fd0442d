package graft

import graft.ann.Ann

class AnnSpec extends SparkSpec {

  test("embed_topk: k exact neighbors per query, ranks dense") {
    val rows = Ann.embedTopK(tables).collect()
    val perQuery = rows.groupBy(_.getLong(0))
    assert(perQuery.size == Ann.NumQueries)
    perQuery.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to Ann.K))
    }
  }

  test("embed_topk rank is a two-phase WindowGroupLimit (partial before shuffle)") {
    val plan = Ann.embedTopK(tables).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
    assert(plan.contains("Partial"), plan.linesIterator.take(12).mkString("\n"))
  }

  test("embed_ann_lsh never beats brute force and shares its top hit when buckets agree") {
    val exact = Ann.embedTopK(tables).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val approx = Ann.embedAnnLsh(tables).collect()
    // every LSH hit scores <= the exact top hit for that query
    approx.foreach { r =>
      val best = exact((r.getLong(0), 1))._2
      assert(r.getDouble(2) <= best + 1e-9)
    }
    assert(approx.nonEmpty)
  }
}
