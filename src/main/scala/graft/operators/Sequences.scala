package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-SEQUENCE operators — per-user temporal joins the reference's
  * DStream surface implies but never computes declaratively (ref:
  * Top3HotProduct.java / WindowHotWord.java stop at windowed counts;
  * the natural next questions over the same keyed event stream are
  * "which earlier event explains this one" and "how far down the
  * journey did each user get").
  *
  * Both operators shuffle ONCE on `user_id` (the funnel's chained
  * per-user aggregates reuse that partitioning under AQE) and never
  * materialize a cross product: the as-of join is the union-and-carry
  * formulation (no range-join explosion — a probe never meets more
  * than the one ref row the window carry leaves in scope), and the
  * funnel is three chained `min` aggregates.
  *
  * Whale users: the as-of carry runs one window task per user, exactly
  * like [[Windows.sessionize]]; the per-(user, day) pre-split of
  * [[Windows.sessionizeSplit]] applies verbatim if a single user's
  * event count ever dominates a task (carry the last ref of each day
  * forward in a second day-level pass — days per user are bounded).
  */
object Sequences {

  /** Attribution pair: each `purchase` looks back to the latest
    * `click` at or before it.
    */
  val ProbeType = "purchase"
  val RefType = "click"

  /** Max seconds a funnel step may lag the previous one. */
  val FunnelGapSec = 3600L

  private val NoRef = -1L

  /** AS-OF (attribution) join: for every probe event, the most recent
    * ref event by the same user with `ref.ts_sec <= probe.ts_sec` —
    * the operator Spark has no native join type for, composed from a
    * union and one running `last(ignoreNulls)` carry instead of a
    * range join (which would explode to |probe| × |ref in range| rows
    * before filtering).
    *
    * Determinism: the carry order (ts_sec, is_probe, event_id) is a
    * total order — a same-second ref sorts BEFORE the probe it
    * attributes (refs carry is_probe = 0), and among same-second refs
    * the LAST one in order (max event_id) is the carried value, so no
    * pre-collapse aggregation (and its extra shuffle) is needed.
    * Unattributed probes surface as -1 sentinels, not NULLs (portable
    * value hashing — the dedup_clusters_delta rule).
    *
    * Scale: ONE shuffle on user_id (SequencesSpec pins the single
    * Exchange); the window carry is a single linear pass per user
    * partition. The DuckDB oracle is the independent formulation — a
    * native ASOF LEFT JOIN over the (user, second)-collapsed ref side,
    * which is the same max-id-at-latest-ts rule.
    */
  def eventAsofJoin(t: Tables): DataFrame = {
    val e = t.events
    val unioned = e.filter(col("event_type") === RefType)
      .select(col("user_id"), col("ts_sec"), lit(0).as("is_probe"),
        col("event_id"),
        struct(col("ts_sec").as("rts"), col("event_id").as("rid")).as("r"))
      .unionByName(e.filter(col("event_type") === ProbeType)
        .select(col("user_id"), col("ts_sec"), lit(1).as("is_probe"),
          col("event_id"),
          lit(null).cast("struct<rts:bigint,rid:bigint>").as("r")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("is_probe"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("lr", last(col("r"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col("event_id"), col("user_id"), col("ts_sec"),
        coalesce(col("lr.rts"), lit(NoRef)).as("ref_ts_sec"),
        coalesce(col("lr.rid"), lit(NoRef)).as("ref_id"),
        coalesce(col("ts_sec") - col("lr.rts"), lit(NoRef)).as("gap_sec"))
      .orderBy(col("event_id"))
  }

  def eventAsofJoinSql: String =
    s"""WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
       |           FROM events),
       |ref AS (SELECT user_id, ts_sec, MAX(event_id) AS ref_id
       |        FROM e WHERE event_type = '$RefType'
       |        GROUP BY user_id, ts_sec),
       |probe AS (SELECT event_id, user_id, ts_sec FROM e
       |          WHERE event_type = '$ProbeType')
       |SELECT p.event_id, p.user_id, p.ts_sec,
       |  COALESCE(r.ts_sec, $NoRef) AS ref_ts_sec,
       |  COALESCE(r.ref_id, $NoRef) AS ref_id,
       |  COALESCE(p.ts_sec - r.ts_sec, $NoRef) AS gap_sec
       |FROM probe p ASOF LEFT JOIN ref r
       |  ON p.user_id = r.user_id AND p.ts_sec >= r.ts_sec
       |ORDER BY p.event_id""".stripMargin

  /** Conversion FUNNEL: per user, the earliest signup, the earliest
    * view within [[FunnelGapSec]] of it, and the earliest purchase
    * within [[FunnelGapSec]] of that — `stage` = how many steps the
    * user completed (0-3). Three chained `min` aggregates (each step's
    * candidate set filtered by the previous step's timestamp), all
    * keyed on user_id — no window, no sequence materialization; every
    * shuffle in the plan is a user_id equi-shuffle, so the chain
    * co-partitions after the first exchange. Missing steps are -1
    * sentinels.
    */
  def eventFunnel(t: Tables): DataFrame = {
    val e = t.events.select(col("user_id"), col("event_type"), col("ts_sec"))
    val users = e.select(col("user_id")).distinct()
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts_sec")).as("t1"))
    val s2 = e.filter(col("event_type") === "view")
      .join(s1, Seq("user_id"))
      .filter(col("ts_sec") >= col("t1") &&
        col("ts_sec") <= col("t1") + FunnelGapSec)
      .groupBy(col("user_id")).agg(min(col("ts_sec")).as("t2"))
    val s3 = e.filter(col("event_type") === ProbeType)
      .join(s2, Seq("user_id"))
      .filter(col("ts_sec") >= col("t2") &&
        col("ts_sec") <= col("t2") + FunnelGapSec)
      .groupBy(col("user_id")).agg(min(col("ts_sec")).as("t3"))
    users
      .join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(col("t1"), lit(NoRef)).as("t1"),
        coalesce(col("t2"), lit(NoRef)).as("t2"),
        coalesce(col("t3"), lit(NoRef)).as("t3"),
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1)
          .otherwise(0).as("stage"))
      .orderBy(col("user_id"))
  }

  /** Seconds per retention bucket (day granularity — the corpus spans
    * a month, so day cells discriminate where week cells saturate).
    */
  val RetentionBucketSec = 86400L

  /** Cohort RETENTION matrix: users bucketed by the day of their
    * first event (the cohort), each cell (cohort_day, day_offset) =
    * how many of that cohort were active offset days later — the
    * curve behind "day-N retention". Three aggregations, all keyed on
    * user_id or bounded (cohort, offset) pairs: distinct (user, day)
    * activity, min-day cohorts, then the matrix count — the
    * (user, day) distinct bounds every later frame by active-days,
    * not events, so the plan never regroups raw events twice.
    * Day arithmetic is integer floor division (`div`) in both engines
    * — no float boundary can move a midnight event across cells.
    */
  def eventRetention(t: Tables): DataFrame = {
    val act = t.events
      .select(col("user_id"),
        expr(s"ts_sec div $RetentionBucketSec").as("d"))
      .distinct()
    val cohorts = act.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
    act.join(cohorts, Seq("user_id"))
      .groupBy(col("d0").as("cohort_day"),
        (col("d") - col("d0")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  def eventRetentionSql: String =
    s"""WITH e AS (SELECT user_id,
       |             CAST(floor(epoch(ts)) AS BIGINT) // $RetentionBucketSec
       |               AS d
       |           FROM events),
       |act AS (SELECT DISTINCT user_id, d FROM e),
       |fw AS (SELECT user_id, MIN(d) AS d0 FROM act GROUP BY user_id)
       |SELECT fw.d0 AS cohort_day, act.d - fw.d0 AS day_offset,
       |       COUNT(*) AS n_users
       |FROM act JOIN fw USING (user_id)
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** Inter-event GAP distribution per event type: lag each user's
    * timeline once (the [[Windows.sessionize]] per-user window shape —
    * same whale note), attribute each gap to the LATER event's type,
    * then the [[Windows.eventStats]] distribution profile over gaps
    * (exact integer sums; interpolated percentiles shared
    * Spark-percentile ≡ DuckDB-quantile_cont, round6-guarded). The
    * latency/cadence profile behind session-gap and funnel-window
    * tuning — 30 min session gaps and 1 h funnel steps should come
    * FROM this table, not folklore.
    */
  def eventGapStats(t: Tables): DataFrame = {
    import graft.functions.Portable.round6
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    t.events
      .withColumn("prev_ts", lag(col("ts_sec"), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .withColumn("gap", col("ts_sec") - col("prev_ts"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round6(sum(col("gap")).cast("double") / count(lit(1)))
          .as("mean_gap"),
        min(col("gap")).as("min_gap"),
        max(col("gap")).as("max_gap"),
        round6(expr("percentile(gap, 0.5)")).as("p50"),
        round6(expr("percentile(gap, 0.95)")).as("p95"))
      .orderBy(col("event_type"))
  }

  def eventGapStatsSql: String = {
    import graft.functions.Portable.round6Sql
    s"""WITH e AS (SELECT user_id, event_id, event_type,
       |             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
       |           FROM events),
       |g AS (SELECT event_type,
       |        ts_sec - LAG(ts_sec) OVER (PARTITION BY user_id
       |          ORDER BY ts_sec, event_id) AS gap
       |      FROM e)
       |SELECT event_type, COUNT(*) AS n,
       |  ${round6Sql("SUM(gap)::DOUBLE / COUNT(*)")} AS mean_gap,
       |  MIN(gap) AS min_gap, MAX(gap) AS max_gap,
       |  ${round6Sql("quantile_cont(gap, 0.5)")} AS p50,
       |  ${round6Sql("quantile_cont(gap, 0.95)")} AS p95
       |FROM g WHERE gap IS NOT NULL
       |GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** Path length (trigram journeys) and how many top paths to keep. */
  val PathLen = 3
  val PathTopK = 20

  /** FULL path-count table (every user-journey trigram and its global
    * frequency) — the un-truncated form [[eventTopPaths]] ranks and the
    * streaming twin replays against. One per-user window pass (two
    * `lead`s over the same (ts_sec, event_id) order — ONE shuffle on
    * user_id, one sort, both leads share the frame), then a partial
    * (map-side-combined) count over a key space bounded by
    * |event_types|^3, not by |events| — the aggregate output is tiny
    * no matter the corpus size.
    */
  def eventPathCounts(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    t.events
      .select(col("user_id"), col("ts_sec"), col("event_id"),
        col("event_type"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull)
      .groupBy(concat_ws(">", col("event_type"), col("t1"), col("t2"))
        .as("path"))
      .agg(count(lit(1)).as("n"))
  }

  /** TOP-K event-type paths: the [[PathTopK]] most frequent 3-step
    * journeys across all users (windows overlap — an n-event user
    * contributes n-2 paths). The sequence-mining question behind
    * funnel design: [[eventFunnel]]'s signup→view→purchase order is an
    * assumption; this table is where it gets checked against data.
    *
    * Scale: inherits [[eventPathCounts]]'s one-shuffle window + tiny
    * aggregate; the rank is `orderBy(...).limit(k)` so the plan ends
    * in TakeOrderedAndProject (partial top-k per task, pinned in
    * SequencesSpec) — never a global sort. Ties at the cut are broken
    * by path ASC — a total order, so the kept set is deterministic.
    */
  def eventTopPaths(t: Tables): DataFrame =
    eventPathCounts(t)
      .orderBy(col("n").desc, col("path"))
      .limit(PathTopK)

  def eventTopPathsSql: String =
    s"""WITH e AS (SELECT user_id, event_id, event_type,
       |             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
       |           FROM events),
       |s AS (SELECT event_type AS t0,
       |        LEAD(event_type, 1) OVER w AS t1,
       |        LEAD(event_type, 2) OVER w AS t2
       |      FROM e
       |      WINDOW w AS (PARTITION BY user_id
       |                   ORDER BY ts_sec, event_id))
       |SELECT t0 || '>' || t1 || '>' || t2 AS path, COUNT(*) AS n
       |FROM s WHERE t2 IS NOT NULL
       |GROUP BY 1 ORDER BY n DESC, path LIMIT $PathTopK""".stripMargin

  /** DAILY-count anomaly score per event type: each (type, day) cell's
    * z-score against that type's own distribution of daily counts over
    * the days it was observed — the volume-monitoring table behind
    * "errors spiked on day 17". Days with zero events of a type simply
    * don't appear (observed-days semantics, documented on purpose: a
    * type's quiet day is an anomaly you detect as the ABSENT row's
    * neighbours shifting the mean, and densifying would need a
    * calendar spine the corpus doesn't carry).
    *
    * Portability: the moments are EXACT integer sums (count, Σn, Σn²)
    * — the [[Windows.eventStats]] rule — so mean/variance/z are the
    * same IEEE expression over the same exact inputs in both engines;
    * round6 guards the last ulp. Types observed on a single day (no
    * sample variance) and zero-variance types pin z = 0.
    *
    * Scale: daily cells are |types| × |days| regardless of corpus
    * size; the per-type stats table is smaller still, so the join back
    * is a broadcast (pinned) — two tiny aggregates after one
    * (type, day) shuffle of pre-combined partials.
    */
  /** Per-type daily counts — shared by the batch anomaly entry and
    * the streaming twin's spec so the frame cannot drift.
    */
  private[graft] def dailyCounts(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr(s"ts_sec div $RetentionBucketSec").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))

  /** The published per-type (mu, sd) table the z-scores compare
    * against — the boundary-table half of the anomaly op: a periodic
    * batch job republishes it; [[graft.streaming.Jobs.AnomalyStream]]
    * pins the generation at start and scores live counts against it.
    */
  private[graft] def dailyStats(t: Tables): DataFrame =
    dailyCounts(t.events).groupBy(col("event_type"))
      .agg(count(lit(1)).as("d"), sum(col("n")).as("s1"),
        sum(col("n") * col("n")).as("s2"))
      .select(col("event_type"), col("d"),
        (col("s1").cast("double") / col("d")).as("mu"),
        when(col("d") > 1,
          sqrt(greatest(lit(0.0),
            (col("s2").cast("double") -
              col("s1").cast("double") * col("s1") / col("d")) /
              (col("d") - 1))))
          .otherwise(lit(0.0)).as("sd"))

  def eventDailyAnomaly(t: Tables): DataFrame = {
    import graft.functions.Portable.round6
    val daily = dailyCounts(t.events)
    val stats = dailyStats(t)
    daily.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("day"), col("n"),
        round6(when(col("sd") > 0,
          (col("n") - col("mu")) / col("sd")).otherwise(lit(0.0)))
          .as("z"))
      .orderBy(col("event_type"), col("day"))
  }

  def eventDailyAnomalySql: String = {
    import graft.functions.Portable.round6Sql
    s"""WITH daily AS (
       |  SELECT event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) // $RetentionBucketSec AS day,
       |    COUNT(*) AS n
       |  FROM events GROUP BY 1, 2),
       |st AS (
       |  SELECT event_type, COUNT(*) AS d, SUM(n) AS s1,
       |    SUM(n * n) AS s2
       |  FROM daily GROUP BY 1),
       |stats AS (
       |  SELECT event_type, d, CAST(s1 AS DOUBLE) / d AS mu,
       |    CASE WHEN d > 1 THEN
       |      sqrt(greatest(0.0,
       |        (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / d)
       |          / (d - 1)))
       |    ELSE 0.0 END AS sd
       |  FROM st)
       |SELECT daily.event_type, day, n,
       |  ${round6Sql("CASE WHEN sd > 0 THEN (n - mu) / sd ELSE 0.0 END")}
       |    AS z
       |FROM daily JOIN stats USING (event_type)
       |ORDER BY event_type, day""".stripMargin
  }

  /** [[eventDailyAnomaly]]'s ROBUST twin: z-scores against the
    * median/MAD baseline instead of mean/sd. One anomalous day
    * inflates the mean AND the sd, so classical z both flags the
    * outlier less and poisons every other day's score; the median and
    * the median-absolute-deviation ignore up to half the days, which
    * is what a volume monitor wants its baseline to do. The 1.4826
    * factor rescales MAD to sd units (the standard consistency
    * constant for a normal bulk).
    *
    * Discrete medians (the value at rank ⌈d/2⌉ — an actual daily
    * count) found by [[graft.functions.OrderStat]] over the
    * |types|·|days| daily frame: no per-type sort, no percentile
    * aggregate; MAD is a second OrderStat pass over the absolute
    * deviations. Both are data values, so unlike a mean they cross
    * the oracle boundary exactly; z is one guarded round6 division.
    *
    * Scale: the corpus collapses once to daily cells; both rank
    * searches and the med/mad tables are calendar-sized; the join
    * back is a broadcast.
    */
  def eventDailyAnomalyRobust(t: Tables): DataFrame = {
    import graft.functions.{OrderStat, Portable}
    import Portable.round6
    val spark = t.spark
    import spark.implicits._
    val daily = dailyCounts(t.events)
    def medianOf(vals: DataFrame): Map[String, Double] = {
      // vals: (g, v) — value at ascending rank ceil(d/2) per group
      val counts = vals.groupBy(col("g"), col("v"))
        .agg(count(lit(1)).as("cnt"))
      val ds = counts.groupBy(col("g")).agg(sum(col("cnt")).as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def target(g: String) = {
        val d = ds(g)
        val asc = math.max(1L, math.ceil(0.5 * d).toLong)
        OrderStat.RankTarget(g, d - asc + 1)
      }
      val res = OrderStat.valuesAtDescRanks(counts,
        ds.keys.toSeq.sorted.map(target))
      ds.keys.map(g => g -> res(target(g))).toMap
    }
    val med = medianOf(daily.select(col("event_type").as("g"),
      col("n").cast("double").as("v")))
    val medDf = broadcast(med.toSeq.toDF("event_type", "med"))
    val dev = daily.join(medDf, Seq("event_type"))
      .select(col("event_type").as("g"),
        abs(col("n") - col("med")).as("v"))
    val mad = medianOf(dev)
    val madDf = broadcast(mad.toSeq.toDF("event_type", "mad"))
    daily.join(medDf, Seq("event_type")).join(madDf, Seq("event_type"))
      .select(col("event_type"), col("day"), col("n"), col("med"),
        col("mad"),
        round6(when(col("mad") > 0,
          (col("n") - col("med")) / (col("mad") * lit(1.4826)))
          .otherwise(lit(0.0))).as("zmad6"))
      .orderBy(col("event_type"), col("day"))
  }

  def eventDailyAnomalyRobustSql: String = {
    import graft.functions.Portable.round6Sql
    s"""WITH daily AS (
       |  SELECT event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) // $RetentionBucketSec AS day,
       |    COUNT(*) AS n
       |  FROM events GROUP BY 1, 2),
       |r1 AS (
       |  SELECT event_type, n,
       |    row_number() OVER (PARTITION BY event_type ORDER BY n) AS rk,
       |    COUNT(*) OVER (PARTITION BY event_type) AS d
       |  FROM daily),
       |med AS (
       |  SELECT event_type,
       |    MAX(CASE WHEN rk = GREATEST(1, CAST(ceil(0.5 * d) AS BIGINT))
       |        THEN n END)::DOUBLE AS med
       |  FROM r1 GROUP BY 1),
       |dv AS (
       |  SELECT daily.event_type, abs(n - med) AS v
       |  FROM daily JOIN med USING (event_type)),
       |r2 AS (
       |  SELECT event_type, v,
       |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS rk,
       |    COUNT(*) OVER (PARTITION BY event_type) AS d
       |  FROM dv),
       |mad AS (
       |  SELECT event_type,
       |    MAX(CASE WHEN rk = GREATEST(1, CAST(ceil(0.5 * d) AS BIGINT))
       |        THEN v END) AS mad
       |  FROM r2 GROUP BY 1)
       |SELECT daily.event_type, day, n, med, mad,
       |  ${round6Sql(
        "CASE WHEN mad > 0 THEN (n - med) / (mad * 1.4826) ELSE 0.0 END")}
       |    AS zmad6
       |FROM daily JOIN med USING (event_type) JOIN mad USING (event_type)
       |ORDER BY event_type, day""".stripMargin
  }

  /** Markov TRANSITION matrix over event types: P(next | current) on
    * each user's timeline — the model behind [[eventTopPaths]] (a
    * trigram is two transitions) and the empirical prior for funnel
    * step ordering. One `lead` over the same per-user (ts, event_id)
    * window the path op uses (ONE user_id shuffle), then a count over
    * ≤ |types|² cells and a row-normalization against per-from totals
    * — the totals table is ≤ |types| rows, so the join back is a
    * BROADCAST (pinned). n is exact; p6 is one rounded division of
    * exact integers (IEEE-identical both engines).
    */
  def eventTransitions(t: Tables): DataFrame = {
    import graft.functions.Portable.round6
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    val pairs = t.events
      .select(col("user_id"), col("ts_sec"), col("event_id"),
        col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round6(col("n").cast("double") / col("tot").cast("double"))
          .as("p6"))
      .orderBy(col("from_type"), col("to_type"))
  }

  def eventTransitionsSql: String = {
    import graft.functions.Portable.round6Sql
    s"""WITH e AS (SELECT user_id, event_id, event_type,
       |             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
       |           FROM events),
       |p AS (SELECT event_type AS from_type,
       |        LEAD(event_type, 1) OVER (PARTITION BY user_id
       |          ORDER BY ts_sec, event_id) AS to_type
       |      FROM e),
       |c AS (SELECT from_type, to_type, COUNT(*) AS n FROM p
       |      WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |tt AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY 1)
       |SELECT from_type, to_type, n,
       |  ${round6Sql("CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)")} AS p6
       |FROM c JOIN tt USING (from_type)
       |ORDER BY from_type, to_type""".stripMargin
  }

  def eventFunnelSql: String =
    s"""WITH e AS (SELECT user_id, event_type,
       |             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
       |           FROM events),
       |s1 AS (SELECT user_id, MIN(ts_sec) AS t1 FROM e
       |       WHERE event_type = 'signup' GROUP BY user_id),
       |s2 AS (SELECT e.user_id, MIN(e.ts_sec) AS t2
       |       FROM e JOIN s1 ON e.user_id = s1.user_id
       |       WHERE e.event_type = 'view' AND e.ts_sec >= s1.t1
       |         AND e.ts_sec <= s1.t1 + $FunnelGapSec
       |       GROUP BY e.user_id),
       |s3 AS (SELECT e.user_id, MIN(e.ts_sec) AS t3
       |       FROM e JOIN s2 ON e.user_id = s2.user_id
       |       WHERE e.event_type = '$ProbeType' AND e.ts_sec >= s2.t2
       |         AND e.ts_sec <= s2.t2 + $FunnelGapSec
       |       GROUP BY e.user_id)
       |SELECT u.user_id,
       |  COALESCE(s1.t1, $NoRef) AS t1,
       |  COALESCE(s2.t2, $NoRef) AS t2,
       |  COALESCE(s3.t3, $NoRef) AS t3,
       |  CASE WHEN s3.t3 IS NOT NULL THEN 3
       |       WHEN s2.t2 IS NOT NULL THEN 2
       |       WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
       |FROM (SELECT DISTINCT user_id FROM e) u
       |LEFT JOIN s1 USING (user_id)
       |LEFT JOIN s2 USING (user_id)
       |LEFT JOIN s3 USING (user_id)
       |ORDER BY u.user_id""".stripMargin

  /** [[eventAsofJoin]] through the NATIVE operator
    * ([[graft.plans.AsofJoinNode]] → AsofJoinExec, injected by
    * [[graft.GraftExtensions]]): same semantics, same oracle — but the
    * plan is two user_id-clustered exchanges feeding a per-partition
    * two-pointer merge (three longs of carry state), instead of a
    * union shuffle + WindowExec frame. The top-level orderBy is the
    * output contract's, identical to the composed form's.
    */
  def eventAsofJoinNative(t: Tables): DataFrame = {
    val e = t.events
    def side(tpe: String) = e.filter(col("event_type") === tpe)
      .select(col("user_id"), col("ts_sec"), col("event_id"))
    val node = graft.plans.AsofJoinNode(
      side(ProbeType).queryExecution.analyzed,
      side(RefType).queryExecution.analyzed)
    org.apache.spark.sql.graft.Bridge.ofRows(e.sparkSession, node)
      .orderBy(col("event_id"))
  }

  /** Interval-join window: a click attributes to purchases within
    * this many seconds after it.
    */
  val IntervalSec = 1800L

  /** INTERVAL (range) join: ALL same-user (click → purchase) pairs
    * with `0 ≤ purchase.ts − click.ts ≤ IntervalSec` — the all-pairs
    * complement of [[eventAsofJoin]] (which keeps only the latest).
    *
    * Scale: the naive plan is an equi-join on user_id with the range
    * as a residual — whale users make that a per-user cross product.
    * Instead both sides TIME-BUCKET by `floor(ts / IntervalSec)`: a
    * click can only meet purchases in its own or the next bucket, so
    * the click side explodes to exactly 2 (user, bucket) keys and the
    * join becomes a plain equi-join on (user_id, bucket) with the
    * range filter residual. Fan-out is a fixed 2×, and whale users
    * split across their time buckets instead of landing in one task.
    * Each qualifying pair matches in exactly ONE bucket (the
    * purchase's), so no dedup pass is needed.
    */
  def eventIntervalJoin(t: Tables): DataFrame = {
    val e = t.events
    val clicks = e.filter(col("event_type") === RefType)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_sec").as("c_ts"))
      .withColumn("bucket", explode(array(
        floor(col("c_ts") / IntervalSec),
        floor(col("c_ts") / IntervalSec) + 1)))
    val purchases = e.filter(col("event_type") === ProbeType)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_sec").as("p_ts"),
        floor(col("ts_sec") / IntervalSec).as("bucket"))
    purchases
      .join(clicks, Seq("user_id", "bucket"))
      .filter(col("p_ts") >= col("c_ts") &&
        col("p_ts") - col("c_ts") <= IntervalSec)
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("c_ts"),
        (col("p_ts") - col("c_ts")).as("lag_sec"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  def eventIntervalJoinSql: String =
    s"""WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
       |           FROM events)
       |SELECT p.event_id AS purchase_id, p.user_id, p.ts_sec AS p_ts,
       |  c.event_id AS click_id, c.ts_sec AS c_ts,
       |  p.ts_sec - c.ts_sec AS lag_sec
       |FROM e p JOIN e c
       |  ON p.user_id = c.user_id
       |  AND p.ts_sec >= c.ts_sec
       |  AND p.ts_sec - c.ts_sec <= $IntervalSec
       |WHERE p.event_type = '$ProbeType' AND c.event_type = '$RefType'
       |ORDER BY purchase_id, click_id""".stripMargin

  /** The outer complement: purchases NO click explains — same
    * bucketed equi-join, as a LEFT ANTI. The pair with
    * [[eventIntervalJoin]] partitions the purchase set (spec-pinned).
    */
  def eventIntervalUnmatched(t: Tables): DataFrame = {
    val e = t.events
    val clicks = e.filter(col("event_type") === RefType)
      .select(col("user_id").as("c_user"), col("ts_sec").as("c_ts"))
      .withColumn("c_bucket", explode(array(
        floor(col("c_ts") / IntervalSec),
        floor(col("c_ts") / IntervalSec) + 1)))
    val purchases = e.filter(col("event_type") === ProbeType)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_sec").as("p_ts"),
        floor(col("ts_sec") / IntervalSec).as("bucket"))
    purchases
      .join(clicks,
        col("user_id") === col("c_user") && col("bucket") === col("c_bucket") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") - col("c_ts") <= IntervalSec,
        "left_anti")
      .select(col("purchase_id"), col("user_id"), col("p_ts"))
      .orderBy(col("purchase_id"))
  }

  def eventIntervalUnmatchedSql: String =
    s"""WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
       |           FROM events)
       |SELECT p.event_id AS purchase_id, p.user_id, p.ts_sec AS p_ts
       |FROM e p
       |WHERE p.event_type = '$ProbeType'
       |  AND NOT EXISTS (
       |    SELECT 1 FROM e c
       |    WHERE c.event_type = '$RefType'
       |      AND c.user_id = p.user_id
       |      AND p.ts_sec >= c.ts_sec
       |      AND p.ts_sec - c.ts_sec <= $IntervalSec)
       |ORDER BY purchase_id""".stripMargin
}
