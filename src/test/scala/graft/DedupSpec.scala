package graft

import graft.dedup.Dedup

/** The 100 TB contract for the dedup family: candidate generation is
  * always a bucket equi-join — never a corpus cross product — and the
  * planted near-duplicates actually surface.
  */
class DedupSpec extends SparkSpec {

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("no dedup plan contains a cartesian or nested-loop join") {
    val plans = Seq(
      Dedup.dedupExact(tables), Dedup.dedupNgramJaccard(tables),
      Dedup.dedupMinhash(tables), Dedup.dedupSimhash(tables),
      Dedup.dedupEmbedding(tables)).map(physical)
    plans.foreach { p =>
      assert(!p.contains("CartesianProduct"), p.linesIterator.take(5).mkString("\n"))
      assert(!p.contains("BroadcastNestedLoopJoin"), p.linesIterator.take(5).mkString("\n"))
    }
  }

  test("minhash candidates contain the highest-jaccard planted pairs") {
    val jac = Dedup.dedupNgramJaccard(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.dedupMinhash(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.nonEmpty) // planted near-dups exist at sf0.001 too
    // LSH with 4 bands of 2 at jaccard>=0.8: every true pair collides
    // with prob 1-(1-0.8^2)^4 ≈ 0.98; at this sf all of them do
    assert((jac -- cand).isEmpty, s"missed pairs: ${jac -- cand}")
  }

  test("exact dedup keeps one keeper per distinct text") {
    val rows = Dedup.dedupExact(tables).collect()
    val docs = tables.documents.count()
    assert(rows.map(_.getLong(1)).sum == docs) // copies partition the corpus
    assert(rows.forall(_.getLong(1) >= 1))
  }

  test("simhash pairs are within the hamming threshold") {
    val rows = Dedup.dedupSimhash(tables).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(2) <= Dedup.HammingMax))
  }

  test("embedding near-dup cosines are in [CosineMin, 1]") {
    val rows = Dedup.dedupEmbedding(tables).collect()
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= Dedup.CosineMin && c <= 1.0 + 1e-9)
    }
  }
}
