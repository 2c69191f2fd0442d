package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowing — the reference's reduceByKeyAndWindow surface
  * (ref: WindowHotWord.java:52-58: 60 s window / 10 s slide;
  * Top3HotProduct.java:50-56) as declarative epoch-arithmetic window
  * assignment. Window starts are epoch-second BIGINTs (portable across
  * engines; epoch-aligned exactly like Spark's `window()` function).
  *
  * Scale: an event expands to at most window/slide = 6 window copies
  * BEFORE partial aggregation, which collapses them map-side to
  * (type, window) pairs — bounded by #types × #windows, not by events.
  * The streaming twin (`streaming.SlidingCounts`) uses the native
  * `window()` + watermark instead, so state is bounded by the lag.
  */
object Windows {

  val WindowSec = 3600L // reference uses 60 s on a seconds-scale demo
  val SlideSec = 600L   // stream; data here spans a month → 1 h / 10 min

  /** Tumbling 1 h counts + exact value sums per event_type. */
  def tumblingCounts(t: Tables): DataFrame =
    t.events
      .withColumn("w_start",
        (col("ts_sec") - pmod(col("ts_sec"), lit(WindowSec))).cast("long"))
      .groupBy(col("event_type"), col("w_start"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))

  def tumblingCountsSql: String =
    """SELECT event_type,
      |  ts_sec - (ts_sec % 3600) AS w_start,
      |  COUNT(*) AS cnt,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events)
      |GROUP BY event_type, w_start""".stripMargin

  /** Sliding-window expansion: each event → its window/slide copies. */
  private def slidingAssign(t: Tables): DataFrame = {
    val copies = (WindowSec / SlideSec).toInt // 6
    t.events
      .withColumn("k", explode(sequence(lit(0), lit(copies - 1))))
      .withColumn("w_start",
        (col("ts_sec") - pmod(col("ts_sec"), lit(SlideSec))
          - col("k") * lit(SlideSec)).cast("long"))
  }

  /** 60 min window / 10 min slide counts per event_type (ref:
    * WindowHotWord.java reduceByKeyAndWindow).
    */
  def slidingCounts(t: Tables): DataFrame =
    slidingAssign(t)
      .groupBy(col("event_type"), col("w_start"))
      .agg(count(lit(1)).as("cnt"))

  private val slidingCountsFrom =
    """FROM (SELECT event_type,
      |        (ts_sec - (ts_sec % 600)) - k * 600 AS w_start
      |      FROM (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      |            FROM events), range(6) t(k))
      |GROUP BY event_type, w_start""".stripMargin

  def slidingCountsSql: String =
    s"SELECT event_type, w_start, COUNT(*) AS cnt\n$slidingCountsFrom"

  /** Per-type value-distribution profile: count, exact decimal mean,
    * min/max, and interpolated p50/p95 (Spark `percentile` and DuckDB
    * `quantile_cont` share the interpolation definition — verified
    * bit-identical; round6 guards the last ulp). Scale: exact
    * percentile materializes each group's values — fine for
    * bounded-cardinality groups like event types; for high-cardinality
    * keys switch to `approx_percentile` (t-digest, mergeable map-side).
    */
  def eventStats(t: Tables): DataFrame = {
    import graft.functions.Portable.round6
    t.events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(12,2)")).cast("double") / count(lit(1)))
          .as("mean_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        round6(expr("percentile(value, 0.5)")).as("p50"),
        round6(expr("percentile(value, 0.95)")).as("p95"))
      .orderBy(col("event_type"))
  }

  def eventStatsSql: String = {
    import graft.functions.Portable.round6Sql
    s"""SELECT event_type, COUNT(*) AS n,
       |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_value,
       |  MIN(value) AS min_value, MAX(value) AS max_value,
       |  ${round6Sql("quantile_cont(value, 0.5)")} AS p50,
       |  ${round6Sql("quantile_cont(value, 0.95)")} AS p95
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** [[eventStats]] for HIGH-cardinality grouping keys: exact
    * `percentile` materializes every group's values in one task, which
    * works for 5 event types and falls over for 50 M user_ids —
    * `approx_percentile` keeps a bounded mergeable sketch per group, so
    * the aggregation stays partial (map-side) at any cardinality.
    * Count/mean/min/max are computed exactly (same formulas as
    * [[eventStats]]). No DuckDB oracle: quantile sketches are
    * engine-specific, so the driver records the weaker rows-only check
    * and WindowsSpec pins the sketch against the exact op's percentiles.
    */
  def eventStatsApprox(t: Tables, accuracy: Int = 10000): DataFrame = {
    import graft.functions.Portable.round6
    t.events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(12,2)")).cast("double") / count(lit(1)))
          .as("mean_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        round6(percentile_approx(col("value"), lit(0.5), lit(accuracy)))
          .as("p50"),
        round6(percentile_approx(col("value"), lit(0.95), lit(accuracy)))
          .as("p95"))
      .orderBy(col("event_type"))
  }

  /** [[eventStats]] with EXACT quantiles at UNBOUNDED group
    * cardinality — the third leg of the stats trio: `event_stats`
    * (exact `percentile`, materializes each group in one task),
    * `event_stats_approx` (t-digest sketch, bounded but approximate),
    * and this — exact DISCRETE quantiles (the value at ascending rank
    * ⌈q·n⌉, an actual data value, no interpolation) found by
    * [[graft.functions.OrderStat]] histogram narrowing: O(log n)
    * distributed aggregations, ≤1024-row driver histograms, NO
    * per-group sort or materialization anywhere (the
    * ccnetBucketBounded discipline applied to event values).
    *
    * The quantile search runs OUTSIDE the final plan (driver scalars,
    * broadcast back as a literal table — WindowsSpec pins no Window
    * node and no `percentile` aggregate in the plan); count/mean/
    * min/max are the shared exact formulas. Discrete ranks make the
    * output portable doubles BY IDENTITY (data values pass through —
    * no float quantile arithmetic crosses the oracle boundary), so
    * unlike the t-digest twin this one is fully hash-checked.
    */
  def eventStatsBounded(t: Tables): DataFrame = {
    import graft.functions.OrderStat
    val spark = t.spark
    val counts = t.events
      .groupBy(col("event_type").as("g"), col("value").as("v"))
      .agg(count(lit(1)).as("cnt"))
    // per-type totals: |types| rows, the bounded scalar collect
    val ns = counts.groupBy(col("g")).agg(sum(col("cnt")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ascRank(q: Double, n: Long): Long =
      math.max(1L, math.ceil(q * n).toLong)
    val targets = ns.keys.toSeq.sorted.flatMap { g =>
      val n = ns(g)
      Seq(OrderStat.RankTarget(g, n - ascRank(0.50, n) + 1),
        OrderStat.RankTarget(g, n - ascRank(0.95, n) + 1))
    }.distinct
    val resolved = OrderStat.valuesAtDescRanks(counts, targets)
    val qRows = ns.keys.toSeq.sorted.map { g =>
      val n = ns(g)
      (g,
        resolved(OrderStat.RankTarget(g, n - ascRank(0.50, n) + 1)),
        resolved(OrderStat.RankTarget(g, n - ascRank(0.95, n) + 1)))
    }
    import spark.implicits._
    val quantiles = qRows.toDF("event_type", "p50", "p95")
    t.events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(12,2)")).cast("double") / count(lit(1)))
          .as("mean_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .join(broadcast(quantiles), Seq("event_type"))
      .orderBy(col("event_type"))
  }

  def eventStatsBoundedSql: String =
    s"""WITH r AS (SELECT event_type, value,
       |             row_number() OVER (PARTITION BY event_type
       |                                ORDER BY value) AS rk,
       |             COUNT(*) OVER (PARTITION BY event_type) AS n
       |           FROM events)
       |SELECT event_type, MAX(n) AS n,
       |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / MAX(n)
       |    AS mean_value,
       |  MIN(value) AS min_value, MAX(value) AS max_value,
       |  MAX(CASE WHEN rk = GREATEST(1, CAST(ceil(0.50 * n) AS BIGINT))
       |      THEN value END) AS p50,
       |  MAX(CASE WHEN rk = GREATEST(1, CAST(ceil(0.95 * n) AS BIGINT))
       |      THEN value END) AS p95
       |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  val SessionGapSec = 1800L // 30 min inactivity closes a session

  /** Per-user sessionization (gaps-and-islands): a session breaks after
    * [[SessionGapSec]] of inactivity; emit one row per session with its
    * bounds, event count, and exact value sum. The third classic window
    * kind next to tumbling/sliding — the reference has no equivalent;
    * the streaming twin is `streaming.Jobs.SessionCounts`
    * (`session_window`, state bounded by the watermark).
    *
    * Scale: both windows partition by user_id — a user's history sorts
    * in one task, bounded by per-user event counts (for whale users,
    * pre-split by (user, day) first — same plan shape). The session
    * aggregation itself is partial as always.
    */
  def sessionize(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    val isNew = when(
      col("ts_sec") - lag(col("ts_sec"), 1).over(byUser) > SessionGapSec ||
        lag(col("ts_sec"), 1).over(byUser).isNull, 1).otherwise(0)
    t.events
      .select(col("event_id"), col("user_id"), col("ts_sec"), col("value"))
      .withColumn("is_new", isNew)
      .withColumn("session_idx", sum(col("is_new")).over(byUser).cast("long"))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts_sec")).as("session_start"),
        max(col("ts_sec")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Whale-safe [[sessionize]]: identical output, but the event-level
    * sort partitions by (user_id, DAY) — a user with a billion events
    * never serializes into one task; each task sorts at most one user-day.
    *
    * Phase 1 sessionizes within each (user, day) and collapses to one
    * summary row per local session (start, end, count, exact decimal
    * sum — kept decimal so the merge stays exact). Phase 2 stitches
    * across day boundaries: a second gaps-and-islands per user over the
    * SESSION summaries (merge when next.start - prev.end ≤ gap), which
    * chains multi-day sessions transitively. Within a day local sessions
    * are > gap apart by construction, so stitching only ever merges
    * boundary-adjacent runs — the result is exactly the single-pass
    * per-user sessionization (WindowsSpec asserts equality; the DuckDB
    * oracle is [[sessionizeSql]], the same one sessionize uses).
    *
    * Phase 2 still partitions by bare user_id, but over per-session rows
    * with a STRUCTURAL cap (see [[dailyLocalSessions]]): at most
    * ⌊86400/gap⌋ + 1 rows per (user, day) regardless of event volume —
    * 49 at the 30-min gap. Even the adversarial whale (every event > gap
    * apart, one session per event) cannot widen a day beyond the cap; it
    * can only add ACTIVE DAYS, so phase-2 per-user input grows with
    * calendar time (≤ ~18k rows/user/year), never with event rate.
    * WindowsSpec pins the cap on a planted 10k-single-event-session
    * whale.
    */
  def sessionizeSplit(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val local = dailyLocalSessions(t)
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("s_start"), col("s_end"))
    val isNewSession = when(
      col("s_start") - lag(col("s_end"), 1).over(byUser) > SessionGapSec ||
        lag(col("s_end"), 1).over(byUser).isNull, 1).otherwise(0)
    local
      .withColumn("is_new", isNewSession)
      .withColumn("session_idx", sum(col("is_new")).over(byUser).cast("long"))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("s_start")).as("session_start"),
        max(col("s_end")).as("session_end"),
        sum(col("n")).cast("long").as("n_events"),
        sum(col("sv")).cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Phase 1 of [[sessionizeSplit]]: one summary row per (user, day,
    * local session), sorted under (user_id, day) partitioning. The
    * output obeys a structural cap: consecutive local sessions in a day
    * are separated by > [[SessionGapSec]], so a (user, day) group emits
    * at most ⌊86400/gap⌋ + 1 rows however many events the user fired
    * that day — the invariant that bounds phase 2's per-user input.
    */
  private[graft] def dailyLocalSessions(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t.events
      .select(col("event_id"), col("user_id"), col("ts_sec"), col("value"))
      .withColumn("day", expr("ts_sec div 86400"))
    val byUserDay = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts_sec"), col("event_id"))
    val isNewLocal = when(
      col("ts_sec") - lag(col("ts_sec"), 1).over(byUserDay) > SessionGapSec ||
        lag(col("ts_sec"), 1).over(byUserDay).isNull, 1).otherwise(0)
    ev
      .withColumn("is_new", isNewLocal)
      .withColumn("l_idx", sum(col("is_new")).over(byUserDay))
      .groupBy(col("user_id"), col("day"), col("l_idx"))
      .agg(min(col("ts_sec")).as("s_start"),
        max(col("ts_sec")).as("s_end"),
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).as("sv"))
  }

  def sessionizeSql: String =
    s"""WITH ev AS (SELECT event_id, user_id,
       |              CAST(floor(epoch(ts)) AS BIGINT) ts_sec, value
       |            FROM events),
       |marked AS (SELECT *,
       |    CASE WHEN ts_sec - lag(ts_sec, 1) OVER
       |             (PARTITION BY user_id ORDER BY ts_sec, event_id)
       |           > $SessionGapSec
       |           OR lag(ts_sec, 1) OVER
       |             (PARTITION BY user_id ORDER BY ts_sec, event_id)
       |           IS NULL
       |         THEN 1 ELSE 0 END is_new
       |  FROM ev),
       |sess AS (SELECT *,
       |    CAST(sum(is_new) OVER
       |      (PARTITION BY user_id ORDER BY ts_sec, event_id) AS BIGINT)
       |      session_idx
       |  FROM marked)
       |SELECT user_id, session_idx,
       |  MIN(ts_sec) AS session_start, MAX(ts_sec) AS session_end,
       |  COUNT(*) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
       |FROM sess GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  /** Top-3 hottest keys per sliding window (ref: WindowHotWord.java:
    * 61-91 — sortByKey + take(3), re-expressed as a rank window so the
    * top-k runs inside the plan, distributed, with no driver collect).
    */
  def windowHotWord(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("w_start"))
      .orderBy(col("cnt").desc, col("event_type"))
    slidingCounts(t)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("w_start", "event_type", "cnt", "rank")
  }

  def windowHotWordSql: String =
    s"""SELECT w_start, event_type, cnt, rank FROM (
      |  SELECT w_start, event_type, cnt,
      |    CAST(row_number() OVER (PARTITION BY w_start ORDER BY cnt DESC, event_type) AS INT) AS rank
      |  FROM (SELECT event_type, w_start, COUNT(*) AS cnt\n$slidingCountsFrom))
      |WHERE rank <= 3""".stripMargin
}
