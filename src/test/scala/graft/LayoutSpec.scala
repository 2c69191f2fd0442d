package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: the Morton address against an independent JVM
  * recompute, zone-map completeness, and the pruning claim itself —
  * interleaving must beat both single-dimension sorts on their weak
  * dimension.
  */
class LayoutSpec extends SparkSpec {

  /** Independent JVM Morton interleave — mirrors none of the Column
    * code (works from the raw (u, day) rows and plain bit ops).
    */
  private def mortonOf(un: Long, dn: Long): Long =
    (0 until Layout.ZBits).map { i =>
      (((un >> i) & 1L) << (2 * i + 1)) | (((dn >> i) & 1L) << (2 * i))
    }.sum

  test("zorder: zone maps cover every row; shard budget respected; bounds are genuine min/max") {
    val raw = tables.events
      .select(col("user_id"), expr("ts_sec div 86400").as("day")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val minDay = raw.map(_._2).min
    val maxDay = raw.map(_._2).max
    val maxU = raw.map(_._1).max
    // independent shard assignment from raw rows
    val expectShards = raw.groupBy { case (u, day) =>
      val un = u * (1L << Layout.ZBits) / (maxU + 1)
      val dn = (day - minDay) * (1L << Layout.ZBits) / (maxDay - minDay + 1)
      mortonOf(un, dn) / Layout.ZShardDiv
    }
    val got = Layout.zorderStats(tables).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == expectShards.keySet)
    assert(got.values.map(_._1).sum == raw.length, "zone maps must cover all rows")
    assert(got.keySet.forall(s => s >= 0 &&
      s < (1L << (2 * Layout.ZBits)) / Layout.ZShardDiv))
    expectShards.foreach { case (shard, rows) =>
      val (n, minu, maxu, mind, maxd) = got(shard)
      assert(n == rows.length, s"shard $shard count")
      assert(minu == rows.map(_._1).min && maxu == rows.map(_._1).max,
        s"shard $shard u-bounds")
      val ds = rows.map(_._2 - minDay)
      assert(mind == ds.min && maxd == ds.max, s"shard $shard d-bounds")
    }
  }

  test("zorder: beats both single-dimension sorts on their weak dimension; never the worst on any") {
    val rows = Layout.layoutCompare(tables).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(rows.keySet == Set(
      ("zorder", "day"), ("zorder", "user"),
      ("day_sort", "day"), ("day_sort", "user"),
      ("user_sort", "day"), ("user_sort", "user")))
    rows.values.foreach(f => assert(f > 0.0 && f <= 1.0))
    // a single-dim sort is near-perfect on its own key but ~full-scan
    // on the other; zorder must prune meaningfully on BOTH
    assert(rows(("day_sort", "user")) > 0.9, "day sort can't prune user queries")
    assert(rows(("user_sort", "day")) > 0.9, "user sort can't prune day queries")
    assert(rows(("zorder", "user")) < 0.75 * rows(("day_sort", "user")),
      s"zorder user-dim ${rows(("zorder", "user"))} must beat day_sort")
    assert(rows(("zorder", "day")) < 0.75 * rows(("user_sort", "day")),
      s"zorder day-dim ${rows(("zorder", "day"))} must beat user_sort")
  }

  test("zorder: plan is map-side — one-row range scalars broadcast, no sort-merge join") {
    val plan = Layout.zorderStats(tables).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), "range scalars must broadcast")
  }
}
