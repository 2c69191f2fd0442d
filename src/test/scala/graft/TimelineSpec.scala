package graft

import graft.operators.{Sequences, Timeline}
import org.apache.spark.sql.functions._

/** Value gates for the calendar-timeline family: each op against an
  * independent JVM recompute over the collected sf0.001 events, plus
  * the plan shapes the 100 TB story depends on.
  */
class TimelineSpec extends SparkSpec {

  private val D = Sequences.RetentionBucketSec

  // (user_id, ts_sec, event_id, event_type, value) collected once
  private lazy val evts: Array[(Long, Long, Long, String, Double)] =
    tables.events
      .select(col("user_id"), col("ts_sec"), col("event_id"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))

  test("event_gapfill ≡ JVM calendar model: full span, zeros on silent days") {
    val got = Timeline.eventGapfill(tables).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap

    val byCell = evts.groupBy(e => (e._4, e._2 / D))
    val days = evts.map(_._2 / D)
    val (d0, d1) = (days.min, days.max)
    val types = evts.map(_._4).distinct
    val want = (for { ty <- types; d <- d0 to d1 } yield {
      val cell = byCell.getOrElse((ty, d), Array.empty[(Long, Long, Long, String, Double)])
      // the decimal(12,2) sum convention: cents-exact integer math
      val cents = cell.map(e => BigDecimal(e._5).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum
      (ty, d) -> (cell.length.toLong, cents.toDouble)
    }).toMap

    assert(got.keySet == want.keySet,
      s"spine mismatch: missing ${want.keySet -- got.keySet}, " +
        s"extra ${got.keySet -- want.keySet}")
    got.foreach { case (k, (n, s)) =>
      assert((n, s) == want(k), s"cell $k: got ($n,$s) want ${want(k)}")
    }
  }

  test("event_gapfill zero path: silent days materialize as zero rows") {
    // the driver corpus is DENSE (every type × every day populated at
    // all sfs), so the zero path needs a planted sparse corpus:
    // type a on days 0 and 3 (gap: 1, 2), type b on day 1 only
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-gapfill-sparse").toString
    Seq((1L, 10L, 1L, "a", 1.5), (2L, 86400L * 3 + 20, 1L, "a", 2.0),
      (3L, 86400L + 5, 2L, "b", 4.25))
      .toDF("event_id", "ts_sec_in", "user_id", "event_type", "value")
      .selectExpr("event_id", "ts_sec_in * 1000000000 AS ts", "user_id",
        "event_type", "value", "'' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Timeline.eventGapfill(Tables(spark, dir)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      ("a", 0L, 1L, 1.5), ("a", 1L, 0L, 0.0), ("a", 2L, 0L, 0.0),
      ("a", 3L, 1L, 2.0),
      ("b", 0L, 0L, 0.0), ("b", 1L, 1L, 4.25), ("b", 2L, 0L, 0.0),
      ("b", 3L, 0L, 0.0)), s"sparse gap fill wrong: $got")
  }

  test("event_gapfill plan: ONE fact scan, broadcast join, no shuffle join") {
    val plan = Timeline.eventGapfill(tables).queryExecution.executedPlan.toString
    // span + type list are a bounded driver collect and the spine is
    // literals, so the FINAL plan reads the fact exactly once (the
    // derive-from-one-frame alternative looks shared but Catalyst
    // re-expands it into three separately-pruned fact scans)
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 fact scan, got $scans:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"calendar-sized join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffle join belongs in a calendar-sized frame:\n$plan")
  }

  test("scd2_history ≡ JVM run-length model; intervals tile each user") {
    val got = Timeline.scd2History(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))

    val want = evts.groupBy(_._1).toSeq.flatMap { case (user, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      // collapse consecutive same-type runs
      val runs = sorted.foldLeft(Vector.empty[(String, Long, Long)]) {
        case (acc, e) =>
          if (acc.nonEmpty && acc.last._1 == e._4)
            acc.init :+ ((acc.last._1, acc.last._2, acc.last._3 + 1))
          else acc :+ ((e._4, e._2, 1L))
      }
      runs.zipWithIndex.map { case ((state, from, n), i) =>
        val to = if (i + 1 < runs.length) Some(runs(i + 1)._2) else None
        (user, (i + 1).toLong, state, from, to, n)
      }
    }
    assert(got.sorted.toSeq == want.sorted,
      s"SCD-2 intervals diverge from the JVM model " +
        s"(got ${got.length}, want ${want.length})")

    // structural properties: per user the intervals tile the timeline
    got.groupBy(_._1).foreach { case (user, ivs) =>
      val s = ivs.sortBy(_._2)
      assert(s.init.forall(_._5.isDefined) && s.last._5.isEmpty,
        s"user $user: exactly the last interval must be open")
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $user: intervals must tile")
          assert(a._3 != b._3,
            s"user $user: consecutive intervals must change state")
        case _ => ()
      }
    }
  }

  test("scd2_history_split ≡ scd2_history bit-for-bit on the real corpus") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5))
    val base = Timeline.scd2History(tables).collect().map(key).toSeq
    val split = Timeline.scd2HistorySplit(tables).collect().map(key).toSeq
    assert(split == base,
      s"split plan diverges from the baseline " +
        s"(got ${split.length}, want ${base.length})")
  }

  test("scd2_history_split: midnight-straddling runs merge across days") {
    // planted: user 1 holds "a" across the day0/day1 boundary (must
    // collapse to ONE interval even though the first pass closes runs
    // at midnight), switches to "b" inside day1, holds "b" across the
    // day1/day2 boundary, and user 2 changes state EXACTLY at midnight
    import spark.implicits._
    val D = Sequences.RetentionBucketSec // 86400
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scd2-straddle").toString
    Seq(
      (1L, D - 10, 1L, "a"), (2L, D - 5, 1L, "a"), // day0 tail
      (3L, D + 20, 1L, "a"),                       // day1 head: same run
      (4L, D + 100, 1L, "b"),                      // change inside day1
      (5L, 2 * D - 1, 1L, "b"), (6L, 2 * D + 1, 1L, "b"), // straddle again
      (7L, D - 1, 2L, "x"), (8L, D, 2L, "y")       // change AT midnight
    ).toDF("event_id", "ts_sec_in", "user_id", "event_type")
      .selectExpr("event_id", "ts_sec_in * 1000000000 AS ts", "user_id",
        "event_type", "0.0 AS value", "'' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val t = Tables(spark, dir)
    val got = Timeline.scd2HistorySplit(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
      .toSeq
    val want = Seq(
      (1L, 1L, "a", D - 10, Some(D + 100), 3L),
      (1L, 2L, "b", D + 100, None, 3L),
      (2L, 1L, "x", D - 1, Some(D), 1L),
      (2L, 2L, "y", D, None, 1L))
    assert(got == want, s"straddle merge wrong:\ngot  $got\nwant $want")
    // and the split plan still matches the baseline on this corpus
    val base = Timeline.scd2History(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
      .toSeq
    assert(got == base, "split ≠ baseline on the planted corpus")
  }

  test("scd2_history_split plan: event-level window partitions by (user, day)") {
    val plan = Timeline.scd2HistorySplit(tables)
      .queryExecution.executedPlan.toString
    // the whale guarantee: the ONLY event-sized sort keys on
    // (user_id, day) — a flooded user sorts one day per task; the
    // per-user windows run over the collapsed run frame
    val winSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan.toLowerCase).map(_.group(1)).toSeq
    assert(winSpecs.nonEmpty, s"no window specs found:\n$plan")
    val eventLevel = winSpecs.filter(s =>
      s.contains("user_id") && s.contains("day#") && s.contains("ts_sec"))
    assert(eventLevel.nonEmpty,
      s"event-level window must partition by (user_id, day):\n$plan")
  }

  test("report_equidepth_hist ≡ JVM rank model; depths balanced") {
    val got = graft.pipeline.Reports.equidepthHist(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

    val B = graft.pipeline.Reports.EqdBuckets
    val vs = tables.orders.select(col("o_totalprice"))
      .collect().map(_.getDouble(0)).sorted
    val n = vs.length.toLong
    val bs = (1 until B).map(k => vs((((k.toLong * n + B - 1) / B) - 1).toInt))
    val byBucket = vs.groupBy(v => 1L + bs.count(_ < v))
    val want = byBucket.toSeq.map { case (b, xs) =>
      (b, xs.length.toLong, xs.min, xs.max)
    }.sortBy(_._1)
    assert(got.toSeq == want,
      s"equi-depth cells diverge: got ${got.toSeq} want $want")

    assert(got.map(_._2).sum == n, "bucket depths must sum to the row count")
    // bounds ordered and non-overlapping across buckets
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3,
        s"bucket ranges overlap: ${a._1} hi=${a._4} vs ${b._1} lo=${b._3}")
      case _ => ()
    }
    // equal-height up to ties: every bucket within 2x of the ideal depth
    // (sf0.001 has few heavy ties on o_totalprice)
    got.foreach { case (b, cnt, _, _) =>
      assert(cnt <= 2 * (n / B + 1),
        s"bucket $b depth $cnt vs ideal ${n / B} — not equi-depth")
    }
  }

  test("report_selectivity_est ≡ JVM model; estimate is the conservative bound") {
    import graft.functions.Portable.round6Double
    import graft.pipeline.Reports
    val got = Reports.selectivityEst(tables).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))

    val B = Reports.EqdBuckets
    val vs = tables.orders.select(col("o_totalprice"))
      .collect().map(_.getDouble(0)).sorted
    val n = vs.length.toLong
    val bs = (1 until B).map(k => vs((((k.toLong * n + B - 1) / B) - 1).toInt))
    def mid(i: Int) = (bs(i - 1) + bs(i)) / 2.0
    val want = Reports.SelProbes.zipWithIndex.map { case ((a, b), idx) =>
      val (lo, hi) = (mid(a), mid(b))
      val exact = vs.count(v => v >= lo && v < hi).toLong
      // bucket k covers (b_{k-1}, b_k]; sum depths of intersecting ones
      val est = (1 to B).filter { k =>
        val blo = if (k == 1) -Double.MaxValue else bs(k - 2)
        val bhi = if (k == B) Double.MaxValue else bs(k - 1)
        blo < hi && bhi >= lo
      }.map { k =>
        vs.count { v =>
          (k == 1 || v > bs(k - 2)) && (k == B || v <= bs(k - 1))
        }.toLong
      }.sum
      ((idx + 1).toLong, lo, hi, est, exact,
        round6Double(est.toDouble / exact.toDouble))
    }
    assert(got.toSeq == want, s"selectivity audit diverges:\n$got\n$want")
    got.foreach { case (p, _, _, est, exact, _) =>
      assert(est >= exact, s"probe $p: histogram estimate must over-cover")
      assert(exact > 0, s"probe $p: degenerate fixture — empty range")
    }
  }

  test("report_equidepth_merge ≡ JVM weighted-multiset model; upper-biased, never phantom-narrow") {
    import graft.pipeline.Reports
    val B = Reports.EqdBuckets
    val got = Reports.equidepthMerge(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

    val rows = tables.orders
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val cut = rows.map(_._1).max / 2
    val base = rows.filter(_._1 <= cut).map(_._2).sorted
    val delta = rows.filter(_._1 > cut).map(_._2)
    val nb = base.length.toLong
    val bs = (1 until B).map(k =>
      base((((k.toLong * nb + B - 1) / B) - 1).toInt))
    // base histogram: mass at each assigned bucket's hi value
    val byBucket = base.groupBy(v => 1 + bs.count(_ < v))
    val mass = byBucket.toSeq.flatMap { case (_, vs) =>
      Seq.fill(vs.length)(vs.max)
    }
    val mergedSorted = (mass ++ delta).sorted
    val fullSorted = rows.map(_._2).sorted
    val n = fullSorted.length.toLong
    val want = (1 until B).map { j =>
      val r = (j.toLong * n + B - 1) / B
      (j.toLong, r, mergedSorted((r - 1).toInt), fullSorted((r - 1).toInt))
    }
    assert(got.toSeq == want, s"merge diverges:\ngot  ${got.toSeq}\nwant $want")
    got.foreach { case (j, _, est, exact) =>
      assert(est >= exact,
        s"boundary $j: merge must be upper-biased (est $est < exact $exact)")
    }
  }

  test("equi-depth bounds: ONE persisted ANALYZE store, built once, re-read by hist/selectivity/merge") {
    import graft.pipeline.Reports
    import org.apache.hadoop.fs.Path
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sessionState.newHadoopConf())
    val dir = new Path(wh, s"graft_eqd_bounds_${Reports.EqdBoundsStore.tag(tables)}")
    val stored = Reports.equidepthBounds(tables)
    assert(fs.exists(dir), s"ANALYZE store not persisted at $dir")
    def inventory() = fs.listStatus(dir)
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
      .toSeq.sortBy(_._1)
    val before = inventory()
    // every consumer re-READS the store — no second OrderStat search
    // may rewrite it (VERDICT r13 #3: selectivityEst used to redo the
    // full narrowing per entry)
    Reports.equidepthHist(tables).collect()
    Reports.selectivityEst(tables).collect()
    Reports.equidepthMerge(tables).collect()
    assert(inventory() == before, "a consumer rebuilt the bounds store")
    // store-served bounds ≡ an independent full-sort recompute
    val B = Reports.EqdBuckets
    val vs = tables.orders.select(col("o_totalprice"))
      .collect().map(_.getDouble(0)).sorted
    val n = vs.length.toLong
    val want = (1 until B).map(k => vs((((k.toLong * n + B - 1) / B) - 1).toInt))
    assert(stored == want, s"stored bounds $stored != rank model $want")
  }

  test("report_histogram_drift ≡ JVM model; planted distribution shift flags reanalyze") {
    import graft.pipeline.Reports
    import graft.functions.Portable.round6Double
    val B = Reports.EqdBuckets
    def model(rows: Seq[(Long, Double)]) = {
      val cut = rows.map(_._1).max / 2
      def bounds(vs: Seq[Double]) = {
        val s = vs.sorted; val n = s.length.toLong
        (1 until B).map(k => s((((k.toLong * n + B - 1) / B) - 1).toInt))
      }
      val bb = bounds(rows.filter(_._1 <= cut).map(_._2))
      val bf = bounds(rows.map(_._2))
      val span = bb.last - bb.head
      (1 until B).map { j =>
        val shift = round6Double(
          if (span > 0.0) math.abs(bf(j - 1) - bb(j - 1)) / span else 0.0)
        (j.toLong, bb(j - 1), bf(j - 1), shift,
          shift > Reports.DriftThreshold6)
      }
    }
    val real = tables.orders
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = Reports.histogramDrift(tables).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == model(real),
      s"drift diverges:\ngot  ${got.toSeq}\nwant ${model(real)}")

    // planted shift: the delta half lives 10 spans higher — every
    // boundary must flag
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-drift-shift").toString
    val planted = (1 to 4000).map { i =>
      (i.toLong, if (i <= 2000) (i % 100).toDouble
      else 1000.0 + (i % 100).toDouble)
    }
    planted.toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val shifted = Reports.histogramDrift(Tables(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getBoolean(4)))
    assert(shifted.forall(_._2),
      s"a planted 10-span shift must flag every boundary: ${shifted.toSeq}")
  }

  test("report_equidepth_hist plan: no global sort of the fact") {
    val plan = graft.pipeline.Reports.equidepthHist(tables)
      .queryExecution.executedPlan.toString
    // boundary search runs OUTSIDE the plan (OrderStat, driver
    // scalars); the final plan is agg → literal-comparison bucketing →
    // agg — a global Sort would mean the histogram sorted the corpus
    assert(!plan.contains("Window"), s"no Window belongs here:\n$plan")
  }
}
