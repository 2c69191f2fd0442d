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
