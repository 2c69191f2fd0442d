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

  test("doc_freq cap bounds the posting-list join on a planted stop-shingle") {
    import spark.implicits._
    // 60 docs share one boilerplate shingle; each also has unique filler.
    // Two docs (9000, 9001) are true near-dups through RARE shingles.
    val boiler = "all rights reserved"
    val docs = (0 until 60).map { i =>
      (i.toLong, s"$boiler unique$i filler$i content$i")
    } ++ Seq(
      (9000L, "alpha beta gamma delta epsilon zeta"),
      (9001L, "alpha beta gamma delta epsilon zeta eta"))
    val dir = java.nio.file.Files.createTempDirectory("graft_stopshingle").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val t = Tables(spark, dir)
    // uncapped: every boilerplate doc pairs with every other → C(60,2)
    val uncapped = Dedup.ngramCandidates(t, cap = Int.MaxValue).count()
    assert(uncapped >= 60L * 59 / 2, s"expected quadratic blowup, got $uncapped")
    // capped: the stop-shingle's posting list is dropped; only genuinely
    // similar docs remain candidates
    val capped = Dedup.ngramCandidates(t, cap = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((9000L, 9001L)), s"got $capped")
    // and the rare-shingle near-dup pair still surfaces end to end
    val pairs = Dedup.dedupNgramJaccard(t, cap = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((9000L, 9001L)), s"got $pairs")
  }

  test("minhash_verified = candidates filtered by true full-set jaccard") {
    import org.apache.spark.sql.functions._
    val cand = Dedup.dedupMinhash(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // spec-side truth: full shingle sets of candidate docs only (small)
    val candDocs = cand.flatMap(p => Seq(p._1, p._2)).toSet
    val sets: Map[Long, Set[String]] = tables.documents
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .where(size(col("ts")) >= Dedup.ShingleSize)
      .select(col("doc_id"), explode(expr(
        graft.functions.Portable.shingleExpr(Dedup.ShingleSize))).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter(p => candDocs(p._1))
      .groupMapReduce(_._1)(p => Set(p._2))(_ ++ _)
    def round6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = cand.filter { case (a, b) =>
      val (sa, sb) = (sets(a), sets(b))
      round6((sa & sb).size.toDouble / (sa ++ sb).size) >= Dedup.JaccardMin
    }.toSet
    val got = Dedup.dedupMinhashVerified(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"diff: ${(got -- expected) ++ (expected -- got)}")
    assert(got.nonEmpty) // the planted near-dups survive verification
  }

  test("verified-minhash pairs are a subset of exact ngram-jaccard pairs") {
    // the documented recall relation (Dedup.dedupNgramJaccard scaladoc):
    // minhash_verified = LSH candidates ∩ {full-set jaccard ≥ min};
    // ngram_jaccard = {capped-set jaccard ≥ min}. Where the doc-freq cap
    // doesn't bite (true at test sf), capped = full jaccard, so every
    // verified pair must also surface in the exhaustive exact op —
    // ngram-jaccard is the exact tool, verified-minhash the production
    // path whose misses are LSH misses only.
    val verified = Dedup.dedupMinhashVerified(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.dedupNgramJaccard(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.nonEmpty)
    assert((verified -- exact).isEmpty,
      s"verified pairs missing from exact: ${verified -- exact}")
  }

  test("materialized-shingle verify equals the live plan, never rescans documents") {
    val live = Dedup.dedupMinhashVerified(tables).collect().map(_.toSeq).toSeq
    val mat = Dedup.dedupMinhashVerifiedMat(tables).collect().map(_.toSeq).toSeq
    assert(mat == live)
    // storage amortization actually happened: every shingle consumer
    // reads the materialized store; the raw documents table is gone
    // from the plan entirely
    val plan = Dedup.dedupMinhashVerifiedMat(tables)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      plan.linesIterator.filter(_.contains("documents")).take(3).mkString("\n"))
    assert(plan.contains("graft_shingles_"))
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
