package graft

import graft.pipeline.Maintenance
import org.apache.spark.sql.functions._

/** Warehouse maintenance: the incremental rollup's union ≡ the full
  * one-pass aggregation with the history side served from the store
  * (and the delta predicate pushed to the scan), and the compaction
  * plan's greedy packing invariants.
  */
class MaintenanceSpec extends SparkSpec {

  test("event_rollup_incremental: union ≡ full one-pass aggregation bit-for-bit") {
    val full = tables.events
      .groupBy(expr("ts_sec div 86400").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val got = Maintenance.eventRollupIncremental(tables).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == full, "store + delta must reproduce the full rollup exactly")
  }

  test("event_rollup_incremental: history comes from the store, delta bound is pushed to the fact scan") {
    // first call builds the store; the plan under test is the steady
    // state every nightly run sees
    Maintenance.eventRollupIncremental(tables).collect()
    val plan = Maintenance.eventRollupIncremental(tables)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_rollup_base"),
      "base side must read the materialized store")
    // the delta side's literal timestamp bound reaches the parquet
    // reader as a pushed filter on the raw ts column
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"delta bound must push to the scan:\n$plan")
  }

  test("compaction_plan: greedy prefix packing — contiguous groups, bounded volume, full coverage") {
    val rows = Maintenance.compactionPlan(tables).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent recompute of the prefix sums and group ids
    val total = rows.map(_._2).sum
    var cum = 0L
    rows.sortBy(_._1).foreach { case (_, chars, cumBefore, grp) =>
      assert(cumBefore == cum, "exclusive prefix sum")
      assert(grp == cum * Maintenance.CompactionGroups / total, "group id")
      cum += chars
    }
    // groups are contiguous in shard order and within the count budget
    val grps = rows.sortBy(_._1).map(_._4)
    assert(grps.toSeq == grps.sorted.toSeq, "groups contiguous in shard order")
    assert(grps.distinct.length <= Maintenance.CompactionGroups)
    // greedy bound: every group's volume ≤ target + its largest member
    val target = (total + Maintenance.CompactionGroups - 1) /
      Maintenance.CompactionGroups
    rows.groupBy(_._4).foreach { case (g, members) =>
      val vol = members.map(_._2).sum
      assert(vol <= target + members.map(_._2).max,
        s"group $g volume $vol exceeds the greedy bound")
    }
  }

  test("corpus_refresh_merge ≡ JVM set model; all three op classes present") {
    import org.apache.spark.sql.functions._
    val got = Maintenance.corpusRefreshMerge(tables).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))

    val docs = tables.documents.select(col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cut = docs.map(_._1).max / 2
    val base = docs.filter(_._1 <= cut).toMap
    val refresh = docs.filter(_._1 > cut)
      .map { case (id, ch) => (id - cut + cut / 2, ch) }.toMap
    val want = (base.keySet ++ refresh.keySet).toSeq.sorted.map { id =>
      (base.contains(id), refresh.contains(id)) match {
        case (true, true)  => (id, "update", refresh(id), "refresh")
        case (false, true) => (id, "insert", refresh(id), "refresh")
        case _             => (id, "keep", base(id), "base")
      }
    }
    assert(got.toSeq == want, "merge diverges from the JVM set model")
    val ops = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(Set("update", "insert", "keep").subsetOf(ops.keySet),
      s"fixture must exercise all three op classes, got $ops")
  }

  test("corpus_refresh_merge_bucketed ≡ shuffled merge; ZERO exchanges in the join") {
    val plain = Maintenance.corpusRefreshMerge(tables).collect()
      .map(_.toSeq)
    val bucketed = Maintenance.corpusRefreshMergeBucketed(tables)
    assert(bucketed.collect().map(_.toSeq).toSeq == plain.toSeq,
      "bucketed merge must be value-identical to the shuffled one")
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed merge must not shuffle either side:\n$plan")
  }
}
