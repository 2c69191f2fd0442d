package graft

import graft.dedup.Dedup
import graft.pipeline.CorpusClean

class PipelineSpec extends SparkSpec {

  test("corpus_clean_neardup = corpus_clean minus minhash pair losers, exactly") {
    val base = CorpusClean.corpusClean(tables).collect()
      .map(_.getLong(0)).toSet
    val losers = Dedup.dedupMinhash(tables).collect()
      .map(_.getLong(1)).toSet
    val got = CorpusClean.corpusCleanNearDup(tables).collect()
      .map(_.getLong(0)).toSet
    assert(got == (base -- losers))
    // the pipeline actually removes something at this sf (planted
    // near-dups that survive the exact-dedup + quality gates)
    assert(got.size < base.size, "near-dup stage removed nothing")
  }

  test("corpus_clean_clustered = corpus_clean minus cluster non-keepers, exactly") {
    val base = CorpusClean.corpusClean(tables).collect()
      .map(_.getLong(0)).toSet
    val nonKeepers = Dedup.nearDupClusters(tables).collect()
      .filter(r => r.getLong(0) != r.getLong(1)).map(_.getLong(0)).toSet
    val got = CorpusClean.corpusCleanClustered(tables).collect()
      .map(_.getLong(0)).toSet
    assert(got == (base -- nonKeepers))
    assert(got.size < base.size, "cluster stage removed nothing")
    // chain correctness: at most one survivor per cluster
    val cluster = Dedup.nearDupClusters(tables).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perCluster = got.toSeq.flatMap(cluster.get).groupBy(identity)
    perCluster.foreach { case (k, docs) =>
      assert(docs.size <= 1, s"cluster $k kept ${docs.size} docs")
    }
  }

  test("near-dup removal is one anti join over the clean plan") {
    val plan = CorpusClean.corpusCleanNearDup(tables)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.linesIterator.take(8).mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
  }
}
