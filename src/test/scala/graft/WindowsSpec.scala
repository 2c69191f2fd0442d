package graft

import graft.operators.Windows

class WindowsSpec extends SparkSpec {

  test("sessionize_split equals sessionize on the real corpus") {
    val single = Windows.sessionize(tables).collect().map(_.toSeq).toSeq
    val split = Windows.sessionizeSplit(tables).collect().map(_.toSeq).toSeq
    assert(split == single)
  }

  test("event_stats_approx: exact moments, percentile sketch within tolerance") {
    val exact = Windows.eventStats(tables).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Windows.eventStatsApprox(tables).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val e = exact(r.getString(0))
      assert(r.getLong(1) == e.getLong(1))       // n exact
      assert(r.getDouble(2) == e.getDouble(2))   // mean exact (decimal sum)
      assert(r.getDouble(3) == e.getDouble(3))   // min
      assert(r.getDouble(4) == e.getDouble(4))   // max
    }
    // the sketch returns an OBSERVED value (exact `percentile`
    // interpolates), so assert the principled property instead: the
    // returned value's true rank is within 2% of the requested quantile
    val byType = tables.events.select("event_type", "value").collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)) }
    def rankOf(tp: String, v: Double): Double = {
      val vs = byType(tp); vs.count(_ <= v).toDouble / vs.length
    }
    approx.foreach { r =>
      val tp = r.getString(0)
      assert(math.abs(rankOf(tp, r.getDouble(5)) - 0.50) <= 0.02,
        s"$tp p50 rank ${rankOf(tp, r.getDouble(5))}")
      assert(math.abs(rankOf(tp, r.getDouble(6)) - 0.95) <= 0.02,
        s"$tp p95 rank ${rankOf(tp, r.getDouble(6))}")
    }
  }

  test("sessionize_split: planted whale stitches across days; sort is per (user, day)") {
    import spark.implicits._
    val gap = Windows.SessionGapSec
    val day = 86400L
    // whale (user 1): an event every 10 min for 3 straight days — gaps all
    // under 30 min, so the TRUE answer is ONE session spanning 3 days;
    // the day pre-split cuts it into 3 local sessions that phase 2 must
    // stitch back (transitively, across two midnights)
    val whale = (0L until 3 * day by 600L).map(s => (s, 1L))
    // edge (user 2): last event 30 s before midnight, next exactly `gap`
    // later (boundary merge at the ≤-vs-< edge: gap == SessionGapSec merges)
    val edge = Seq((day - 30L, 2L), (day - 30L + gap, 2L))
    // sparse (user 3): two events > gap apart within one day — two sessions
    val sparse = Seq((1000L, 3L), (1000L + gap + 1L, 3L))
    val rows = (whale ++ edge ++ sparse).zipWithIndex.map { case ((s, u), i) =>
      (i.toLong, s * 1000000000L, u, 1.5) // ts as raw nanos, like testdata
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_whale").toString
    rows.toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val t = Tables(spark, dir)

    val split = Windows.sessionizeSplit(t).collect().map(_.toSeq).toSeq
    val single = Windows.sessionize(t).collect().map(_.toSeq).toSeq
    assert(split == single)

    def sessionsOf(u: Long) = split.filter(_.head == u)
    assert(sessionsOf(1L).size == 1, s"whale not stitched: ${sessionsOf(1L)}")
    val whaleSession = sessionsOf(1L).head
    assert(whaleSession(2) == 0L && whaleSession(3) == 3 * day - 600L)
    assert(whaleSession(4) == whale.size.toLong)
    assert(sessionsOf(2L).size == 1, "exact-gap boundary session must merge")
    assert(sessionsOf(3L).size == 2)

    // the whale-safety property itself: the event-level sort partitions
    // by (user_id, day), never by bare user_id
    val plan = Windows.sessionizeSplit(t).queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id#\\d+L?, day#\\d+".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("sessionize_split adversarial whale: phase-2 input obeys the per-day cap") {
    import spark.implicits._
    val gap = Windows.SessionGapSec
    // the residual VERDICT r4 flagged: a user whose events are ALL more
    // than `gap` apart — every event its own session, so phase 1
    // collapses NOTHING. 10_000 single-event sessions, every (gap+1) s.
    val whale = (0 until 10000).map(i => (i.toLong * (gap + 1), 1L))
    val normal = Seq((100L, 2L), (200L, 2L)) // one 2-event session
    val rows = (whale ++ normal).zipWithIndex.map { case ((s, u), i) =>
      (i.toLong, s * 1000000000L, u, 1.5)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_advwhale").toString
    rows.toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val t = Tables(spark, dir)

    // output stays exactly the single-pass answer: 10k one-event sessions
    val split = Windows.sessionizeSplit(t).collect().map(_.toSeq).toSeq
    assert(split == Windows.sessionize(t).collect().map(_.toSeq).toSeq)
    assert(split.count(_.head == 1L) == 10000)
    assert(split.filter(_.head == 1L).forall(_(4) == 1L)) // n_events = 1 each

    // the structural cap: even this whale cannot widen a (user, day)
    // group past floor(86400/gap) + 1 phase-2 rows — it spreads across
    // ~208 days instead. Event volume can NEVER break the cap; only
    // calendar time adds phase-2 rows per user.
    val cap = 86400 / gap + 1
    val perDay = Windows.dailyLocalSessions(t)
      .groupBy("user_id", "day").count().collect()
    assert(perDay.forall(_.getLong(2) <= cap),
      s"a (user, day) exceeded the $cap-row cap: ${perDay.filter(_.getLong(2) > cap).toSeq}")
    assert(perDay.filter(_.getLong(0) == 1L).length >= 200) // really spread out
  }

  test("event_stats_bounded: discrete quantiles exactly the rank-k values; plan has no Window or percentile") {
    import org.apache.spark.sql.functions.col
    // independent recompute: sort each type's values, pick rank ⌈q·n⌉
    val byType = tables.events.select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
      .map { case (ty, rows) => ty -> rows.map(_._2).sorted }
    val got = Windows.eventStatsBounded(tables).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(got.keySet == byType.keySet)
    byType.foreach { case (ty, vs) =>
      val n = vs.length
      def atQ(q: Double) = vs(math.max(1, math.ceil(q * n).toLong).toInt - 1)
      val (gn, gmax, p50, p95) = got(ty)
      assert(gn == n)
      assert(gmax == vs.last)
      assert(p50 == atQ(0.50), s"$ty p50 $p50 vs ${atQ(0.50)}")
      assert(p95 == atQ(0.95), s"$ty p95 $p95 vs ${atQ(0.95)}")
    }
    // the scale pin: no per-group sort (Window) and no percentile
    // aggregate anywhere in the final plan — the quantile search ran
    // outside it (OrderStat histogram narrowing, driver scalars)
    val plan = Windows.eventStatsBounded(tables)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "no per-group sort allowed")
    assert(!plan.toLowerCase.contains("percentile"), "no percentile agg")
  }
}
