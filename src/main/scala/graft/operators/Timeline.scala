package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar-timeline operators over the event stream: gap-filled
  * resampling (the missing-day zero rows every monitoring query needs)
  * and SCD type-2 interval compaction (the dimension-history shape a
  * warehouse keeps for every mutable attribute).
  *
  * Both extend the reference's windowed-count family
  * (WindowHotWord.java:47 computes per-window counts but silently
  * OMITS empty windows; a downstream dashboard or anomaly model needs
  * the zeros) to the batch calendar domain.
  */
object Timeline {

  import Sequences.RetentionBucketSec

  /** Per-(event_type, day) event counts and exact value sums with the
    * calendar GAPS FILLED: every type × every day of the corpus span
    * emits a row, zero-filled where nothing happened. The resample op
    * a monitoring/anomaly consumer needs — `event_daily_anomaly`'s
    * daily frame omits silent days entirely, so "no events at all"
    * (the worst anomaly) is invisible there by construction.
    *
    * Scale: ONE (type, day) aggregation of map-side partials collapses
    * the corpus for the join input; the span and type list come from a
    * separate |types|-row driver collect (the eventStatsBounded
    * bounded-scalar discipline — deriving them from the same frame
    * looks free but Catalyst re-expands each subtree into its own
    * pruned fact scan), and the spine is then BUILT AS LITERALS:
    * |types|·|days| rows, a size set by the calendar, not the corpus.
    * Final plan: one fact scan, one broadcast left join, nothing else
    * corpus-sized (single FileScan + no SortMergeJoin spec-pinned).
    * All integers + the decimal(12,2) sum convention; hash-exact both
    * engines.
    */
  def eventGapfill(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val daily = t.events
      .select(col("event_type"),
        expr(s"ts_sec div $RetentionBucketSec").as("day"), col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).as("val_dec"))
    val perType = t.events
      .select(col("event_type"), expr(s"ts_sec div $RetentionBucketSec").as("day"))
      .groupBy(col("event_type"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val d0 = perType.map(_._2).min
    val d1 = perType.map(_._3).max
    // the spine is DRIVER LITERALS — calendar-sized only while the
    // corpus timestamps are sane. One stray far-past/far-future event
    // (or an unbounded type universe) would inflate the literal
    // LocalTableScan without bound, so the bound is ENFORCED, not
    // assumed: fail loudly naming the offender instead of OOMing the
    // driver (ADVICE r13). 50k days ≈ 137 years; 2M rows ≈ tens of MB
    // of literals, far above any sane calendar × type product.
    require(d1 - d0 < 50000L,
      s"eventGapfill spine span ${d1 - d0} days (buckets $d0..$d1) — " +
        "a stray timestamp poisons the calendar; clean ts_sec first")
    require(perType.length.toLong * (d1 - d0 + 1) <= 2000000L,
      s"eventGapfill spine ${perType.length} types x ${d1 - d0 + 1} days " +
        "exceeds the driver-literal budget; gap-fill per type cohort")
    val spine = perType.map(_._1).sorted
      .flatMap(ty => (d0 to d1).map(d => (ty, d)))
      .toSeq.toDF("event_type", "day")
    spine.join(broadcast(daily), Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("val_dec").cast("double"), lit(0.0)).as("val_sum"))
      .orderBy(col("event_type"), col("day"))
  }

  def eventGapfillSql: String =
    s"""WITH daily AS (
       |  SELECT event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) // $RetentionBucketSec AS day,
       |    COUNT(*) AS n, SUM(CAST(value AS DECIMAL(12,2))) AS val_dec
       |  FROM events GROUP BY 1, 2),
       |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
       |ty AS (SELECT DISTINCT event_type FROM daily),
       |spine AS (SELECT event_type, unnest(generate_series(d0, d1)) AS day
       |          FROM ty CROSS JOIN b)
       |SELECT s.event_type, s.day,
       |  COALESCE(n, 0)::BIGINT AS n,
       |  COALESCE(CAST(val_dec AS DOUBLE), 0.0) AS val_sum
       |FROM spine s LEFT JOIN daily d
       |  ON s.event_type = d.event_type AND s.day = d.day
       |ORDER BY 1, 2""".stripMargin

  /** SCD type-2 history compaction of each user's event-type timeline:
    * consecutive same-type runs collapse to ONE versioned interval
    * (user_id, version, state, valid_from, valid_to, n_events), the
    * open current interval carrying `valid_to = NULL` — the
    * dimension-history table (Kimball SCD-2) built from an event log,
    * and the batch twin of CDC compaction: replaying the intervals
    * reproduces every state the user ever held, with event-count
    * evidence per interval.
    *
    * Scale: everything partitions by user_id — one shuffle, then two
    * windows and an aggregation INSIDE each user's partition (ordered
    * by (ts_sec, event_id), a total order, so ROWS framing is
    * deterministic). Per-user history bounds the sort, the whale
    * discipline of `sessionize_split` applies unchanged if a user key
    * floods. The second window runs over the already-collapsed
    * interval frame (≤ runs per user), not the event log.
    */
  def scd2History(t: Tables): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    val flagged = t.events
      .select(col("user_id"), col("ts_sec"), col("event_id"),
        col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(byTime))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val intervals = flagged
      .groupBy(col("user_id"), col("version"))
      .agg(min(col("event_type")).as("state"), // constant within a run
        min(col("ts_sec")).as("valid_from"),
        count(lit(1)).as("n_events"))
    val byVersion = Window.partitionBy(col("user_id"))
      .orderBy(col("version"))
    intervals
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from"), col("valid_to"), col("n_events"))
      .orderBy(col("user_id"), col("version"))
  }

  /** [[scd2History]] with the WHALE discipline applied (the
    * `sessionize_split` pattern): the event-level window partitions by
    * (user_id, DAY) — a flooded user key sorts one day per task, never
    * its whole history — producing per-day state RUNS; a second,
    * run-level pass per user then merges runs across day boundaries
    * (same state on both sides of midnight collapses) and numbers the
    * intervals. The run frame is ≤ one row per state CHANGE plus one
    * per (user, day) — typically orders of magnitude smaller than the
    * event log (adversarial every-event-alternates data degrades it to
    * event-sized, the same documented bound sessionize_split carries).
    *
    * Output ≡ [[scd2History]] bit-for-bit (same oracle SQL; spec pins
    * equality plus a planted midnight-straddling run), so the two
    * entries are interchangeable — this one is the production plan
    * once any user key can flood.
    */
  def scd2HistorySplit(t: Tables): DataFrame = {
    val byTimeInDay = Window
      .partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts_sec"), col("event_id"))
    val runsInDay = t.events
      .select(col("user_id"), col("ts_sec"), col("event_id"),
        col("event_type"),
        expr(s"ts_sec div ${Sequences.RetentionBucketSec}").as("day"))
      .withColumn("prev", lag(col("event_type"), 1).over(byTimeInDay))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run", sum(col("chg")).over(byTimeInDay
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("day"), col("run"))
      .agg(min(col("event_type")).as("state"), // constant within a run
        min(col("ts_sec")).as("from"),
        count(lit(1)).as("n"))
    val byRun = Window.partitionBy(col("user_id"))
      .orderBy(col("day"), col("run"))
    val merged = runsInDay
      .withColumn("pstate", lag(col("state"), 1).over(byRun))
      .withColumn("chg2",
        when(col("pstate").isNull || col("pstate") =!= col("state"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg2")).over(byRun
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("version"))
      .agg(min(col("state")).as("state"),
        min(col("from")).as("valid_from"),
        sum(col("n")).as("n_events"))
    val byVersion = Window.partitionBy(col("user_id"))
      .orderBy(col("version"))
    merged
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from"), col("valid_to"), col("n_events"))
      .orderBy(col("user_id"), col("version"))
  }

  def scd2HistorySql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
      |    event_id, event_type
      |  FROM events),
      |f AS (
      |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
      |v AS (
      |  SELECT *, SUM(chg) OVER (PARTITION BY user_id
      |    ORDER BY ts_sec, event_id ROWS UNBOUNDED PRECEDING)::BIGINT
      |    AS version
      |  FROM f),
      |iv AS (
      |  SELECT user_id, version, MIN(event_type) AS state,
      |    MIN(ts_sec) AS valid_from, COUNT(*)::BIGINT AS n_events
      |  FROM v GROUP BY 1, 2)
      |SELECT user_id, version, state, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |    AS valid_to,
      |  n_events
      |FROM iv ORDER BY user_id, version""".stripMargin
}
