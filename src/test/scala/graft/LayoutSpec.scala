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

  test("layout_bloom_skip ≡ JVM bloom model; no false negatives; zone∧bloom is the best read set") {
    val got = Layout.layoutBloomSkip(tables).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap

    // independent JVM model from the raw rows: shard sets, per-shard
    // bloom bits, probe verdicts
    val raw = tables.events
      .select(col("user_id"), expr("ts_sec div 86400").as("day")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val minDay = raw.map(_._2).min; val maxDay = raw.map(_._2).max
    val maxU = raw.map(_._1).max
    def mortonOf(un: Long, dn: Long): Long =
      (0 until Layout.ZBits).map { i =>
        (((un >> i) & 1L) << (2 * i + 1)) | (((dn >> i) & 1L) << (2 * i))
      }.sum
    val shardUsers = raw.groupBy { case (u, day) =>
      val un = u * (1L << Layout.ZBits) / (maxU + 1)
      val dn = (day - minDay) * (1L << Layout.ZBits) / (maxDay - minDay + 1)
      mortonOf(un, dn) / Layout.ZShardDiv
    }.map { case (s, rows) => s -> rows.map(_._1).toSet }
    val m = Layout.LbWords * 63L
    val md = java.security.MessageDigest.getInstance("MD5")
    def positions(u: Long): Seq[Long] = (0 until Layout.LbK).map { i =>
      val hex = md.digest(s"lb$i|$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % m
    }
    val users = raw.map(_._1).distinct
    val blooms = shardUsers.map { case (s, us) =>
      s -> us.flatMap(positions).toSet
    }
    val want = shardUsers.map { case (s, us) =>
      val (minU, maxU2) = (us.min, us.max)
      val zone = users.filter(u => u >= minU && u <= maxU2)
      val bloomPass = users.filter(u => positions(u).forall(blooms(s)))
      val both = zone.filter(u => positions(u).forall(blooms(s)))
      s -> (us.size.toLong, zone.length.toLong, bloomPass.length.toLong,
        both.length.toLong)
    }
    assert(got == want, s"bloom-skip audit diverges: got $got want $want")

    // structural pins: no false negatives, and the combined read set
    // is never worse than either pruner alone
    got.foreach { case (s, (nUsers, zonePass, bloomPass, bothPass)) =>
      assert(nUsers <= bothPass, s"shard $s: bloom dropped a present user")
      assert(bothPass <= math.min(zonePass, bloomPass), s"shard $s: both>min")
    }
    // the driver corpus is DENSE at spec scale (every user inside a
    // shard's range is genuinely present — zone maps are already
    // perfect), so the rejection the op exists for needs a PLANTED
    // sparse corpus. Normalization is un = u·32/(maxU+1), so with
    // maxU = 99 users 0, 10, 20 share the top-2-bit user quadrant:
    // users 0, 20, 99 active every day put [0, 20] in every
    // quadrant-0 shard's zone range, while user 10 exists on day 0
    // only — later-day shards zone-pass 10 (in range) and their
    // Blooms reject it (absent; 4032 bits over ≤3 users makes an FP
    // implausible)
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bloomskip-sparse").toString
    val planted =
      (for (d <- 0L to 9L; u <- Seq(0L, 20L, 99L))
        yield (d * 200 + u, d * 86400L + 1, u)) :+
        (9999L, 1L, 10L)
    planted.toDF("event_id", "ts_sec_in", "user_id")
      .selectExpr("event_id", "ts_sec_in * 1000000000 AS ts", "user_id",
        "'click' AS event_type", "CAST(1.0 AS DOUBLE) AS value",
        "'' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val sparse = Layout.layoutBloomSkip(Tables(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(sparse.exists { case (_, _, zp, _, bp) => bp < zp },
      s"planted absent-user rejection not measured: ${sparse.toSeq}")
    sparse.foreach { case (s, nUsers, zp, blp, bp) =>
      assert(nUsers <= bp && bp <= math.min(zp, blp), s"shard $s bounds")
    }
  }

  test("hilbertIndex is a genuine Hilbert curve: bijective and unit-adjacent") {
    val n = Layout.HGrid
    val cells = (for { x <- 0 until n; y <- 0 until n }
      yield Layout.hilbertIndex(x, y) -> (x, y)).toMap
    assert(cells.size == n * n, "xy→d must be a bijection onto 0..n²−1")
    assert(cells.keySet == (0 until n * n).toSet, "indices must cover the range")
    (0 until n * n - 1).foreach { d =>
      val ((x1, y1), (x2, y2)) = (cells(d), cells(d + 1))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"d=$d: consecutive cells ($x1,$y1)→($x2,$y2) must be neighbors")
    }
    // morton sanity: also bijective (it interleaves 2·ZBits bits)
    val ms = (for { x <- 0 until n; y <- 0 until n }
      yield Layout.mortonIndex(x, y)).toSet
    assert(ms == (0 until n * n).toSet)
  }

  test("layout_hilbert_compare ≡ equal-cut model; every shard budget holds") {
    val got = Layout.layoutHilbertCompare(tables).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.length == 4)
    assert(got.map(r => (r._1, r._2)).toSeq == Seq(
      ("hilbert", "day"), ("hilbert", "user"),
      ("zorder", "day"), ("zorder", "user")))
    got.foreach { case (lay, dim, ns, np, hits, f6) =>
      assert(ns >= 1 && ns <= Layout.HcShards, s"$lay shard budget")
      // every probe hits ≥1 shard (its own) and ≤ all of them
      assert(hits >= np && hits <= np * ns, s"$lay/$dim hits bound")
      val ref = graft.functions.Portable.round6Double(
        hits.toDouble / (np.toDouble * ns))
      assert(f6 == ref, s"$lay/$dim frac must be the round6 quotient")
    }
  }

  test("hilbert isotropy: worst-dimension scan fraction beats zorder's") {
    val got = Layout.layoutHilbertCompare(tables).collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(5)))
    def worst(lay: String) = got.filter(_._1 == lay).map(_._3).max
    // the table's reason to exist: Morton's bit-order asymmetry makes
    // one dimension pay ~0.5 while Hilbert stays ~0.36 on both
    // (measured at sf0.001/0.01/0.1 before pinning)
    assert(worst("hilbert") <= worst("zorder"),
      s"hilbert worst ${worst("hilbert")} vs zorder ${worst("zorder")}")
  }
}
