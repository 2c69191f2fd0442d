package graft

import graft.operators.Sequences
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence operators: as-of attribution join + funnel.
  * Planted corpora pin the tie/sentinel/gap rules; the real corpus is
  * cross-checked against an INDEPENDENT range-join formulation; the
  * single-Exchange plan shape is pinned (the whole point of the
  * union-and-carry formulation over a range join).
  */
class SequencesSpec extends SparkSpec {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Planted events dir: (event_id, tsSec, user_id, event_type). */
  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_seq").toString
    rows.toDF("event_id", "ts_sec_in", "user_id", "event_type")
      .selectExpr("event_id", "ts_sec_in * 1000000000 AS ts", "user_id",
        "event_type", "CAST(1.0 AS DOUBLE) AS value", "'' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("asof: same-second ref attributes, later refs don't, max id wins a tie, no-ref is -1") {
    val dir = writeEvents(Seq(
      // user 1: two clicks at t=100 (tie -> id 11), purchase at t=100
      (10L, 100L, 1L, "click"),
      (11L, 100L, 1L, "click"),
      (20L, 100L, 1L, "purchase"),
      // purchase BEFORE any click -> unattributed
      (21L, 50L, 1L, "purchase"),
      // later click attributes the later purchase
      (12L, 200L, 1L, "click"),
      (22L, 250L, 1L, "purchase"),
      // user 2: no clicks at all
      (30L, 10L, 2L, "purchase"),
      // noise the op must ignore
      (40L, 99L, 1L, "view")))
    val got = Sequences.eventAsofJoin(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got(20L) == ((100L, 11L, 0L)), "same-second tie -> max id")
    assert(got(21L) == ((-1L, -1L, -1L)), "pre-click purchase")
    assert(got(22L) == ((200L, 12L, 50L)), "latest prior click")
    assert(got(30L) == ((-1L, -1L, -1L)), "user without refs")
  }

  test("asof: real corpus ≡ independent range-join formulation") {
    val t = tables
    val got = Sequences.eventAsofJoin(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4)))
      .toMap
    // independent: max (ref_ts, ref_id) pair per probe via a range join
    val e = t.events
    val probe = e.filter(col("event_type") === Sequences.ProbeType)
      .select(col("event_id"), col("user_id"), col("ts_sec"))
    val ref = e.filter(col("event_type") === Sequences.RefType)
      .select(col("user_id").as("r_user"), col("ts_sec").as("r_ts"),
        col("event_id").as("r_id"))
    val best = probe.join(ref,
        col("user_id") === col("r_user") && col("r_ts") <= col("ts_sec"),
        "left")
      .groupBy(col("event_id"))
      .agg(max(struct(col("r_ts"), col("r_id"))).as("b"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))
        .filter(s => !s.isNullAt(0))
        .map(s => (s.getLong(0), s.getLong(1))).getOrElse((-1L, -1L)))
      .toMap
    assert(got == best)
    assert(got.valuesIterator.exists(_._1 >= 0), "some probe attributed")
    assert(got.valuesIterator.exists(_._1 == -1L), "some probe unattributed")
  }

  test("asof: plan has exactly one hash Exchange (no range join, no pre-collapse shuffle)") {
    val plan = physical(Sequences.eventAsofJoin(tables))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected 1 hash Exchange (+ the output rangepartitioning only), " +
        s"got $exchanges:\n$plan")
  }

  test("funnel: planted users stop at every stage; gap rule enforced; sentinels ride") {
    val g = Sequences.FunnelGapSec
    val dir = writeEvents(Seq(
      // user 1 completes: signup 100, view within gap, purchase within gap
      (1L, 100L, 1L, "signup"), (2L, 100L + g, 1L, "view"),
      (3L, 100L + 2 * g, 1L, "purchase"),
      // user 2: view arrives AFTER the gap -> stage 1 (purchase in time
      // but its anchor never exists)
      (4L, 100L, 2L, "signup"), (5L, 101L + g, 2L, "view"),
      (6L, 102L + g, 2L, "purchase"),
      // user 3: signup + view, purchase too late -> stage 2
      (7L, 100L, 3L, "signup"), (8L, 150L, 3L, "view"),
      (9L, 151L + g, 3L, "purchase"),
      // user 4: never signs up -> stage 0 even with view+purchase
      (10L, 100L, 4L, "view"), (11L, 150L, 4L, "purchase"),
      // user 5: view BEFORE signup doesn't count -> stage 1
      (12L, 50L, 5L, "view"), (13L, 100L, 5L, "signup")))
    val got = Sequences.eventFunnel(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toMap
    assert(got(1L) == ((100L, 100L + g, 100L + 2 * g, 3)))
    assert(got(2L) == ((100L, -1L, -1L, 1)))
    assert(got(3L) == ((100L, 150L, -1L, 2)))
    assert(got(4L) == ((-1L, -1L, -1L, 0)))
    assert(got(5L) == ((100L, -1L, -1L, 1)))
  }

  test("funnel: earliest qualifying step wins (min, not any)") {
    val dir = writeEvents(Seq(
      (1L, 100L, 1L, "signup"), (2L, 50L, 1L, "signup"), // min signup 50
      (3L, 60L, 1L, "view"), (4L, 70L, 1L, "view"),      // min view >= 50
      (5L, 65L, 1L, "purchase")))                        // >= t2=60
    val got = Sequences.eventFunnel(Tables(spark, dir)).collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3),
      got.getInt(4)) == ((50L, 60L, 65L, 3)))
  }

  test("retention: planted cohorts land in the right cells; day-0 cell = cohort size") {
    val dir = writeEvents(Seq(
      // user 1: cohort day 0, active days 0 and 2
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"),
      (3L, 2 * 86400L + 5L, 1L, "view"),
      // user 2: cohort day 1, active days 1 and 3
      (4L, 86400L + 7L, 2L, "view"), (5L, 3 * 86400L + 1L, 2L, "click"),
      // user 3: cohort day 0, active day 0 only
      (6L, 99L, 3L, "error")))
    val got = Sequences.eventRetention(Tables(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L))
  }

  test("retention: real corpus — offset-0 cell is each cohort's max (first day is always active)") {
    val rows = Sequences.eventRetention(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (c, cells) =>
      val day0 = cells.find(_._2 == 0L)
        .getOrElse(fail(s"cohort $c missing offset 0"))._3
      assert(cells.forall(_._3 <= day0), s"cohort $c cell exceeds day-0")
    }
  }

  test("gap stats: planted gaps attribute to the LATER event's type with exact moments") {
    val dir = writeEvents(Seq(
      // user 1 timeline: view@100 -> click@130 (gap 30, type click)
      //                  -> view@190 (gap 60, type view)
      (1L, 100L, 1L, "view"), (2L, 130L, 1L, "click"),
      (3L, 190L, 1L, "view"),
      // user 2: single event -> no gap rows at all
      (4L, 500L, 2L, "click"),
      // user 1 again: same-second tie orders by event_id:
      // click id 5 then view id 6 -> view gap 0
      (5L, 190L, 1L, "click"), (6L, 190L, 1L, "view")))
    val got = Sequences.eventGapStats(Tables(spark, dir)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toMap
    // same-second rows: ...(3,190,view) < (5,190,click) < (6,190,view)
    // by (ts, id) -> click@190 gap 0, view@190 gap 0
    assert(got("click") == ((2L, 15.0, 0L, 30L))) // gaps 30, 0
    assert(got("view") == ((2L, 30.0, 0L, 60L)))  // gaps 60, 0
    assert(!got.contains("error") && got.size == 2)
  }

  test("top paths: overlapping trigram windows counted per user; cross-user never merges") {
    val dir = writeEvents(Seq(
      // user 1: A B C D -> A>B>C, B>C>D (overlap)
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"),
      (3L, 30L, 1L, "view"), (4L, 40L, 1L, "purchase"),
      // user 2: only two events -> no path (windows never span users)
      (5L, 10L, 2L, "click"), (6L, 20L, 2L, "view"),
      // user 3: same trigram as user 1's first -> global count 2
      (7L, 10L, 3L, "view"), (8L, 20L, 3L, "click"),
      (9L, 30L, 3L, "view")))
    val got = Sequences.eventTopPaths(Tables(spark, dir)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("view>click>view" -> 2L, "click>view>purchase" -> 1L))
  }

  test("top paths: real corpus total = Σ max(0, user events − 2); plan ends in TakeOrdered, no global Sort") {
    val t = tables
    val counts = Sequences.eventPathCounts(t)
    val total = counts.agg(sum(col("n"))).collect().head.getLong(0)
    val expected = t.events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(greatest(col("c") - 2, lit(0L)))).collect().head.getLong(0)
    assert(total == expected)
    val plan = physical(Sequences.eventTopPaths(t))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k should be a partial TakeOrderedAndProject:\n$plan")
    assert(!"Sort \\[n".r.findFirstIn(plan).isDefined,
      s"no global sort on the count column:\n$plan")
  }

  test("daily anomaly: constant type pins z=0, spike day scores exactly, single-day type pins z=0") {
    val dir = writeEvents(
      // type "view": 2 events on each of days 0,1,2 -> sd 0 -> z 0
      Seq((1L, 10L, 1L, "view"), (2L, 20L, 2L, "view"),
        (3L, 86400L + 10L, 1L, "view"), (4L, 86400L + 20L, 2L, "view"),
        (5L, 2 * 86400L + 10L, 1L, "view"),
        (6L, 2 * 86400L + 20L, 2L, "view")) ++
      // type "click": days 0,1 have 1, day 2 has 4
      // mu=2, var=((1-2)^2+(1-2)^2+(4-2)^2)/2=3, sd=sqrt(3)
      (Seq(10L -> 0L, 11L -> 86400L).map { case (id, base) =>
        (id, base + 30L, 1L, "click") } ++
       (0 until 4).map(i => (20L + i, 2 * 86400L + 40L + i, 1L, "click"))
         .map(v => (v._1.toLong, v._2, v._3, v._4))) ++
      // type "error": a single day -> no sample variance -> z 0
      Seq((40L, 86400L + 50L, 9L, "error")))
    val got = Sequences.eventDailyAnomaly(Tables(spark, dir)).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("view", 0L)) == ((2L, 0.0)))
    assert(got(("view", 1L)) == ((2L, 0.0)))
    assert(got(("view", 2L)) == ((2L, 0.0)))
    val sd = math.sqrt(3.0)
    def r6(x: Double) = graft.functions.Portable.round6Double(x)
    assert(got(("click", 0L)) == ((1L, r6((1 - 2.0) / sd))))
    assert(got(("click", 2L)) == ((4L, r6((4 - 2.0) / sd))))
    assert(got(("error", 1L)) == ((1L, 0.0)))
  }

  test("daily anomaly robust ≡ JVM median/MAD model; outlier day scores where classical z underreacts") {
    // type "burst": days 0-3 hold 10,11,10,11 events, day 4 holds 40.
    // median 11, MAD 1 (deviations 1,0,1,0,29 -> sorted rank-3 = 1):
    // robust z of the spike = (40-11)/(1*1.4826) ~ 19.6, while the
    // spike's own inflation of mean AND sd caps classical z at ~1.78
    // — the poisoned-baseline failure this op exists to fix
    val rows =
      (0 until 10).map(i => (100L + i, i % 2 * 7L, 1L, "burst")) ++      // day 0: 10
      (0 until 11).map(i => (200L + i, 86400L + i % 3 * 7L, 1L, "burst")) ++
      (0 until 10).map(i => (300L + i, 2 * 86400L + i % 2 * 7L, 1L, "burst")) ++
      (0 until 11).map(i => (400L + i, 3 * 86400L + i % 3 * 7L, 1L, "burst")) ++
      (0 until 40).map(i => (500L + i, 4 * 86400L + i % 5 * 7L, 1L, "burst"))
    val dir = writeEvents(rows.map(v => (v._1.toLong, v._2, v._3, v._4)))
    val t = Tables(spark, dir)
    def r6(x: Double) = graft.functions.Portable.round6Double(x)

    val got = Sequences.eventDailyAnomalyRobust(t).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // JVM model: discrete median at rank ceil(d/2), MAD likewise
    def medOf(xs: Seq[Double]): Double =
      xs.sorted.apply(math.max(1, math.ceil(0.5 * xs.size).toInt) - 1)
    val counts = Map(0L -> 10L, 1L -> 11L, 2L -> 10L, 3L -> 11L, 4L -> 40L)
    val med = medOf(counts.values.map(_.toDouble).toSeq)
    val mad = medOf(counts.values.map(n => math.abs(n - med)).toSeq)
    assert(med == 11.0 && mad == 1.0, s"fixture drift: med=$med mad=$mad")
    counts.foreach { case (d, n) =>
      val want = (n, med, mad, r6((n - med) / (mad * 1.4826)))
      assert(got(("burst", d)) == want,
        s"day $d: got ${got(("burst", d))} want $want")
    }
    // the robustness claim, measured on the same corpus
    val classical = Sequences.eventDailyAnomaly(t).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val zR = got(("burst", 4L))._4
    val zC = classical(("burst", 4L))
    assert(zR > 5 * zC && zC < 2.0,
      s"robust z $zR must dwarf the self-poisoned classical z $zC")

    // zero-MAD guard: a constant type pins zmad = 0
    val dir2 = writeEvents(Seq((1L, 10L, 1L, "flat"), (2L, 86400L + 10L, 1L, "flat")))
    val flat = Sequences.eventDailyAnomalyRobust(Tables(spark, dir2))
      .collect().map(r => r.getDouble(5))
    assert(flat.forall(_ == 0.0), "constant series must score 0 under MAD=0")
  }

  test("daily anomaly: per-type stats join back by broadcast (cells are tiny at any corpus size)") {
    val plan = physical(Sequences.eventDailyAnomaly(tables))
    assert(plan.contains("BroadcastHashJoin"),
      s"stats join should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no SMJ:\n$plan")
  }

  test("transitions: planted matrix counts and normalizes exactly; totals reconcile") {
    val dir = writeEvents(Seq(
      // user 1: A A B -> A>A, A>B ; user 2: A B -> A>B
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "view"),
      (3L, 30L, 1L, "click"),
      (4L, 10L, 2L, "view"), (5L, 20L, 2L, "click")))
    val got = Sequences.eventTransitions(Tables(spark, dir)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    def r6(x: Double) = graft.functions.Portable.round6Double(x)
    assert(got == Map(
      ("view", "view") -> ((1L, r6(1.0 / 3))),
      ("view", "click") -> ((2L, r6(2.0 / 3)))))
  }

  test("transitions: real corpus — Σn = Σ(user events − 1); rows normalize; totals broadcast") {
    val t = tables
    val df = Sequences.eventTransitions(t)
    val rows = df.collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    val expected = t.events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - 1)).collect().head.getLong(0)
    assert(rows.map(_._2).sum == expected)
    rows.groupBy(_._1).foreach { case (from, cells) =>
      assert(math.abs(cells.map(_._3).sum - 1.0) < 1e-4,
        s"row $from must normalize to ~1")
    }
    val plan = physical(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"totals join should broadcast:\n$plan")
  }

  test("funnel: every shuffle in the plan keys on user_id") {
    val plan = physical(Sequences.eventFunnel(tables))
    val hashParts = "hashpartitioning\\(([a-z_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(hashParts.subsetOf(Set("user_id")),
      s"non-user_id shuffle keys: $hashParts\n$plan")
  }

  test("asof native: planted ties/sentinels match the composed op's pinned semantics") {
    // the exact corpus the composed-op planted test uses
    val dir = writeEvents(Seq(
      (10L, 100L, 1L, "click"), (11L, 100L, 1L, "click"),
      (20L, 100L, 1L, "purchase"), // same-second tie -> ref 11, gap 0
      (21L, 50L, 1L, "purchase"),  // pre-click -> -1
      (12L, 200L, 1L, "click"),
      (22L, 250L, 1L, "purchase"), // -> ref 12
      (30L, 10L, 2L, "purchase"))) // user without refs -> -1
    val t = Tables(spark, dir)
    val got = Sequences.eventAsofJoinNative(t).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == Set((20L, 100L, 11L, 0L), (21L, -1L, -1L, -1L),
      (22L, 200L, 12L, 50L), (30L, -1L, -1L, -1L)))
  }

  test("asof native: real corpus ≡ composed union-and-carry op bit-for-bit") {
    val native = Sequences.eventAsofJoinNative(tables).collect()
      .map(r => (0 until 6).map(r.getLong).toList).toSeq
    val composed = Sequences.eventAsofJoin(tables).collect()
      .map(r => (0 until 6).map(r.getLong).toList).toSeq
    assert(native == composed)
  }

  test("asof native: plan is AsofJoinExec over two user_id-clustered sorts — no Window, no Union") {
    val df = Sequences.eventAsofJoinNative(tables)
    val plan = physical(df)
    assert(plan.contains("AsofJoin"), s"native operator must plan:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Union"),
      s"native form must not fall back to the composed shape:\n$plan")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length == 2,
      s"each side shuffles once on user_id:\n$plan")
  }

  test("asof property: random collision-heavy corpora — native ≡ composed ≡ in-memory model") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small user/ts domains force same-second ties, interleaved users,
    // ref-less users, and probe-before-ref orderings
    val corpusGen: Gen[Seq[(Long, Long, Long, String)]] = for {
      nUsers <- Gen.choose(1, 5)
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, nUsers.toLong)
        ts <- Gen.choose(0L, 30L)
        ty <- Gen.oneOf("click", "purchase", "view")
      } yield (u, ts, ty))
    } yield rows.zipWithIndex.map { case ((u, ts, ty), i) =>
      (i + 1L, ts, u, ty)
    }

    def model(rows: Seq[(Long, Long, Long, String)])
        : Map[Long, (Long, Long, Long)] = {
      val refs = rows.filter(_._4 == "click")
      rows.filter(_._4 == "purchase").map { case (pid, pts, pu, _) =>
        val cands = refs.filter(r => r._3 == pu && r._2 <= pts)
        if (cands.isEmpty) pid -> ((-1L, -1L, -1L))
        else {
          val (rid, rts, _, _) = cands.maxBy(r => (r._2, r._1))
          pid -> ((rts, rid, pts - rts))
        }
      }.toMap
    }

    (0 until 6).foreach { k =>
      val rows = corpusGen(Gen.Parameters.default, Seed(k.toLong)).get
      val dir = writeEvents(rows)
      val t = Tables(spark, dir)
      val expect = model(rows)
      for ((name, df) <- Seq("native" -> Sequences.eventAsofJoinNative(t),
        "composed" -> Sequences.eventAsofJoin(t))) {
        val got = df.collect()
          .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4),
            r.getLong(5)))).toMap
        assert(got == expect, s"seed=$k $name diverged from the model: " +
          s"got $got expected $expect over ${rows.size} rows")
      }
    }
  }

  test("interval join property: random corpora — bucketed join ≡ in-memory all-pairs model") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val W = Sequences.IntervalSec
    // ts domain straddles several buckets AND the window boundary
    val corpusGen: Gen[Seq[(Long, Long, Long, String)]] = for {
      nUsers <- Gen.choose(1, 4)
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, nUsers.toLong)
        ts <- Gen.choose(0L, 4 * W)
        ty <- Gen.oneOf("click", "purchase")
      } yield (u, ts, ty))
    } yield rows.zipWithIndex.map { case ((u, ts, ty), i) =>
      (i + 1L, ts, u, ty)
    }
    (0 until 5).foreach { k =>
      val rows = corpusGen(Gen.Parameters.default, Seed(100L + k)).get
      val clicks = rows.filter(_._4 == "click")
      val expect = rows.filter(_._4 == "purchase").flatMap {
        case (pid, pts, pu, _) =>
          clicks.filter(c => c._3 == pu && pts >= c._2 && pts - c._2 <= W)
            .map(c => (pid, c._1))
      }.toSet
      val t = Tables(spark, writeEvents(rows))
      val got = Sequences.eventIntervalJoin(t).collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(got == expect, s"seed=${100 + k} diverged: got $got expected $expect")
      val un = Sequences.eventIntervalUnmatched(t).collect()
        .map(_.getLong(0)).toSet
      val expectUn = rows.filter(_._4 == "purchase").map(_._1).toSet --
        expect.map(_._1)
      assert(un == expectUn)
    }
  }

  test("interval join: planted in-window/cross-bucket/out-of-window pairs resolve exactly") {
    val W = Sequences.IntervalSec // 1800
    val dir = writeEvents(Seq(
      (1L, 100L, 1L, "click"), (4L, 1000L, 1L, "click"),
      (2L, 200L, 1L, "purchase"), // ← click 1 (lag 100)
      (3L, 2500L, 1L, "purchase"), // ← click 4 only (click 1 is 2400 s away)
      (5L, 9000L, 1L, "purchase"), // no click in window
      (6L, 1700L, 2L, "click"), // bucket 0...
      (7L, 1900L, 2L, "purchase"))) // ...purchase in bucket 1: must still pair
    val t = Tables(spark, dir)
    val got = Sequences.eventIntervalJoin(t).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(5))).toSet
    assert(got == Set((2L, 1L, 100L), (3L, 4L, 1500L), (7L, 6L, 200L)))
    val un = Sequences.eventIntervalUnmatched(t).collect()
      .map(_.getLong(0)).toSet
    assert(un == Set(5L))
    assert(W == 1800L)
  }

  test("interval join: real corpus ≡ naive range-join formulation; matched ∪ unmatched partitions purchases") {
    val pairs = Sequences.eventIntervalJoin(tables).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    val naive = tables.events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u"), col("event_id").as("pid"),
        col("ts_sec").as("pt"))
      .join(tables.events.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("event_id").as("cid"),
          col("ts_sec").as("ct")),
        col("u") === col("cu") && col("pt") >= col("ct") &&
          col("pt") - col("ct") <= Sequences.IntervalSec)
      .select(col("pid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == naive)
    val matched = pairs.map(_._1)
    val unmatched = Sequences.eventIntervalUnmatched(tables).collect()
      .map(_.getLong(0)).toSet
    val all = tables.events.filter(col("event_type") === "purchase")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert((matched intersect unmatched).isEmpty)
    assert((matched union unmatched) == all)
  }

  test("interval join: bucketing makes it an equi-join — no NLJ/cartesian; shuffles key on (user, bucket)") {
    val plan = physical(Sequences.eventIntervalJoin(tables))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must ride the bucket equi-join:\n$plan")
    // the join must be an EQUI join keyed on (user_id, bucket) with the
    // range as a residual — broadcast form at small scale, hash shuffle
    // on exactly those keys at large scale
    assert(
      "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[user_id#\\d+L?, bucket"
        .r.findFirstIn(plan).isDefined,
      s"join must key on (user_id, bucket):\n$plan")
  }
}
