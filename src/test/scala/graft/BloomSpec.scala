package graft

import graft.dedup.Bloom
import org.apache.spark.sql.functions._

/** Bloom membership gate: no false negatives, deterministic false
  * positives, literal-array form ≡ join form, saturation behavior.
  */
class BloomSpec extends SparkSpec {

  test("bloom: no false negatives — every doc whose text is in the prefix hits") {
    val t = tables
    val cutoff = t.documents.agg(max(col("doc_id"))).head.getLong(0) / 2
    val prefixTexts = t.documents.filter(col("doc_id") <= cutoff)
      .select(col("text")).distinct().collect().map(_.getString(0)).toSet
    val mustHit = t.documents
      .select(col("doc_id"), col("text")).collect()
      .filter(r => prefixTexts(r.getString(1))).map(_.getLong(0)).toSet
    val hits = Bloom.bloomDupCandidates(t).collect()
      .filter(_.getInt(1) == 1).map(_.getLong(0)).toSet
    assert(mustHit.subsetOf(hits),
      s"false negatives: ${mustHit -- hits}")
    // and the gate is not vacuous: some non-prefix doc misses
    assert(hits.size < t.documents.count(),
      "filter saturated at the default size — everything hit")
  }

  test("bloom: map-side literal form ≡ join form, bit for bit") {
    val t = tables
    val cutoff = t.documents.agg(max(col("doc_id"))).head.getLong(0) / 2
    val bloom = Bloom.bloomOf(t.documents.filter(col("doc_id") <= cutoff))
    val joinForm = Bloom.bloomProbe(t.documents, bloom).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val arr = Bloom.bloomArray(bloom)
    val litForm = t.documents
      .select(col("doc_id"), Bloom.hitCol(col("text"), arr).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(litForm == joinForm)
  }

  test("bloom: a saturated one-word filter hits everything (FP is a capacity property)") {
    import spark.implicits._
    val t = tables
    // full corpus into 63 bits: every bit set, deterministically
    val tiny = Bloom.bloomOf(t.documents, words = 1)
    val bits = tiny.collect()
    assert(bits.length == 1 && bits.head.getLong(1) == Long.MaxValue,
      s"one-word filter not saturated: ${bits.toSeq}")
    // a text the corpus never contained now false-positives — the
    // documented cascade cost: one extra exact-check, never a wrong drop
    val novel = Seq((999999L, "graft bloom novel text never in corpus"))
      .toDF("doc_id", "text")
    val probed = Bloom.bloomProbe(novel, tiny, words = 1).collect()
    assert(probed.head.getInt(1) == 1)
  }

  test("bloom: a novel text misses at the default size (miss is definitive)") {
    import spark.implicits._
    val t = tables
    val cutoff = t.documents.agg(max(col("doc_id"))).head.getLong(0) / 2
    val bloom = Bloom.bloomOf(t.documents.filter(col("doc_id") <= cutoff))
    val novel = Seq((999999L, "graft bloom novel text never in corpus"))
      .toDF("doc_id", "text")
    assert(Bloom.bloomProbe(novel, bloom).collect().head.getInt(1) == 0)
  }

  test("bloom: probe plan broadcasts the filter and never shuffles the corpus scan") {
    val t = tables
    val cutoff = t.documents.agg(max(col("doc_id"))).head.getLong(0) / 2
    val bloom = Bloom.bloomOf(t.documents.filter(col("doc_id") <= cutoff))
    val plan = Bloom.bloomProbe(t.documents, bloom)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"sort-merge crept in:\n$plan")
  }
}
