package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-group DESCENDING order statistics without a per-group
  * single-task sort — the primitive behind boundary-table bucketing
  * (pipeline.Mixing.ccnetBucketBounded).
  *
  * `Window.partitionBy(group).orderBy(value)` ranks correctly but runs
  * each group as ONE task; a real corpus is skewed toward one group
  * (language), so at 100 TB that plan is a single-task sort of most of
  * the corpus. This helper finds the value at a given rank by
  * ITERATIVE HISTOGRAM NARROWING instead: each round is one
  * distributed aggregation (map-side partial, tiny result), the driver
  * walks a ≤`Bins`-row histogram per target to pick the bin holding
  * the rank, and the search range shrinks ~`Bins`× per round — so the
  * value at rank r over n distinct values costs O(log_Bins n) scans
  * and never materializes, sorts, or collects a group. Driver traffic
  * per round is (targets × ≤Bins) aggregate rows — the scalar-count
  * discipline of dedup.Dedup.nearDupClusters, not a data collect.
  *
  * Determinism: bins partition on actual data values (`[lo, hi]` from
  * per-bin min/max), every comparison is plain IEEE double arithmetic,
  * and the answer is an exact data value — the multiset's r-th largest
  * — independent of partitioning, bin count, or iteration order.
  */
object OrderStat {

  val Bins = 1024

  /** One open rank query: the `rank`-th largest `v` (1-based, ties
    * counted by multiplicity) within group `grp`.
    */
  final case class RankTarget(grp: String, rank: Long)

  /** Values at the requested descending ranks. `counts` must be the
    * per-(group, value) multiplicity frame with columns (g: string,
    * v: double, cnt: long) — typically `df.groupBy(g, v).count()`, so
    * heavy ties collapse to one row before the search ever sees them.
    * Each target's rank must be within [1, sum(cnt) of its group].
    */
  def valuesAtDescRanks(counts: DataFrame,
                        targets: Seq[RankTarget]): Map[RankTarget, Double] = {
    require(targets.nonEmpty, "no rank targets")
    withPinned(counts) { pinned =>
      searchPinned(pinned, seedStats(pinned), targets)
    }
  }

  /** [[valuesAtDescRanks]] with the rank targets DERIVED from the
    * per-group totals the seed aggregate already computes: `mkTargets`
    * receives each group's total multiplicity and names the ranks to
    * find. Every threshold op here used to pay a separate count-the-
    * groups pass (`df.groupBy(g).count().collect()` or `df.count()`)
    * before it could even phrase its targets — the same numbers the
    * search's own seed aggregate produces one job later (optimization
    * guide §1.2: remove passes). Returns (totals, values); an empty
    * target list (every group under quota, say) skips the search
    * entirely and returns an empty value map.
    */
  def searchWithTotals(counts: DataFrame)(
      mkTargets: Map[String, Long] => Seq[RankTarget])
      : (Map[String, Long], Map[RankTarget, Double]) =
    withPinned(counts) { pinned =>
      val stats = seedStats(pinned)
      val totals = stats.map { case (g, (n, _, _)) => g -> n }
      val targets = mkTargets(totals)
      (totals,
        if (targets.isEmpty) Map.empty
        else searchPinned(pinned, stats, targets))
    }

  // the multiplicity frame is re-joined every narrowing round (plus
  // the seed aggregate) — persist it for the loop's lifetime so the
  // upstream corpus scan + groupBy runs ONCE, not O(log_Bins n)
  // times (the rankScoresFrom adjacency discipline, Dedup.scala).
  // A frame the CALLER already persisted stays the caller's to
  // manage: unpersisting it here would silently evict their cache
  // mid-use (ADVICE r15), so only a frame this call pinned unpins.
  private def withPinned[A](counts: DataFrame)(f: DataFrame => A): A =
    if (counts.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      f(counts)
    else {
      val pinned = counts.persist()
      try f(pinned)
      finally pinned.unpersist(false)
    }

  /** Seed ranges from one per-group aggregate (also validates ranks). */
  private def seedStats(counts: DataFrame)
      : Map[String, (Long, Double, Double)] =
    counts.groupBy(col("g"))
      .agg(sum(col("cnt")).as("n"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap

  private def searchPinned(counts: DataFrame,
                           stats: Map[String, (Long, Double, Double)],
                           targets: Seq[RankTarget]): Map[RankTarget, Double] = {
    val spark = counts.sparkSession
    import spark.implicits._

    // (target, remaining rank, search range); result once resolved
    var active: Seq[(RankTarget, Long, Double, Double)] = targets.map { tg =>
      val (n, lo, hi) = stats.getOrElse(tg.grp,
        throw new IllegalArgumentException(s"group ${tg.grp} absent"))
      require(tg.rank >= 1 && tg.rank <= n,
        s"rank ${tg.rank} outside [1, $n] for ${tg.grp}")
      (tg, tg.rank, lo, hi)
    }
    val resolved = scala.collection.mutable.Map.empty[RankTarget, Double]

    while (active.nonEmpty) {
      val tdf = broadcast(active.zipWithIndex
        .map { case ((tg, _, lo, hi), i) => (i, tg.grp, lo, hi) }
        .toDF("tid", "tg", "tlo", "thi"))
      // per (target, bin): total multiplicity, distinct-value count,
      // and the actual value bounds inside the bin. bin 0 = highest
      // values (descending ranks walk bins in ascending order).
      val hist = counts
        .join(tdf, col("g") === col("tg") &&
          col("v") >= col("tlo") && col("v") <= col("thi"))
        .withColumn("bin",
          when(col("thi") === col("tlo"), lit(0)).otherwise(least(
            floor((col("thi") - col("v")) / (col("thi") - col("tlo"))
              * lit(Bins.toDouble)).cast("int"), lit(Bins - 1))))
        .groupBy(col("tid"), col("bin"))
        .agg(sum(col("cnt")).as("c"), count(lit(1)).as("nd"),
          min(col("v")).as("bmin"), max(col("v")).as("bmax"))
        .collect()
        .groupBy(_.getInt(0))
      active = active.zipWithIndex.flatMap { case ((tg, rem, _, _), i) =>
        val bins = hist(i).sortBy(_.getInt(1))
        var cum = 0L
        val hit = bins.find { r => cum += r.getLong(2); cum >= rem }.get
        val (c, nd) = (hit.getLong(2), hit.getLong(3))
        val (bmin, bmax) = (hit.getDouble(4), hit.getDouble(5))
        if (nd == 1L) { resolved(tg) = bmax; None }
        else Some((tg, rem - (cum - c), bmin, bmax))
      }
    }
    resolved.toMap
  }
}
