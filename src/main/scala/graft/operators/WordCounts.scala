package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's wordcount family (ref: WordCount.java,
  * HDFSWordCount.java, PersistWordCount.java), re-expressed as
  * declarative explode/groupBy plans over the `documents` corpus.
  *
  * Scale: tokenization is per-row (map-side, whole-stage codegen);
  * the only shuffle carries (word, partial-count) pairs — vocabulary-
  * sized, not corpus-sized — because hash aggregation is partial by
  * construction.
  */
object WordCounts {

  private def tokens(t: Tables): DataFrame =
    t.documents.select(col("doc_id"), col("source"),
      explode(split(col("text"), " ")).as("word"))

  /** flatMap(split) → count per word (ref: WordCount.java:30-60). */
  def wordCount(t: Tables): DataFrame =
    tokens(t).groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))

  def wordCountSql: String =
    """SELECT word, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word ORDER BY cnt DESC, word""".stripMargin

  /** [[wordCount]] through the salted two-phase aggregation
    * (functions.Salting.saltedCount): counts per (word, salt-of-doc_id)
    * first — a hot key ("the" at 100 TB: billions of rows on one
    * reducer) spreads over n sub-keys/tasks — then merges per word.
    * Identical result; one extra vocabulary-sized shuffle buys an n-way
    * spread of every hot key. This is the shape to reach for when one
    * aggregation key dominates; for uniform keys plain [[wordCount]]'s
    * partial aggregation already collapses map-side and is cheaper.
    */
  def wordCountSalted(t: Tables): DataFrame =
    graft.functions.Salting.saltedCount(tokens(t), "word", "doc_id")
      .orderBy(col("cnt").desc, col("word"))

  def wordCountSaltedSql: String = wordCountSql

  /** Per-source word counts — the file-dir streaming shape (ref:
    * HDFSWordCount.java): each `source` is a landing directory.
    */
  def hdfsWordCount(t: Tables): DataFrame =
    tokens(t)
      .filter(col("source").isin("src0", "src1", "src2", "src3"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("cnt"))

  def hdfsWordCountSql: String =
    """SELECT source, word, COUNT(*) AS cnt
      |FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
      |WHERE source IN ('src0','src1','src2','src3')
      |GROUP BY source, word""".stripMargin

  /** The rows PersistWordCount feeds its JDBC sink (ref:
    * PersistWordCount.java:76-106): materialized counts above a
    * threshold, ordered for idempotent upsert batches.
    */
  def persistWordCount(t: Tables): DataFrame =
    wordCount(t).filter(col("cnt") >= 50)

  def persistWordCountSql: String =
    """SELECT word, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word HAVING COUNT(*) >= 50 ORDER BY cnt DESC, word""".stripMargin

  /** Batch view of updateStateByKey (ref:
    * UpdateStateByKeyWordCount.java:56-81): the running total each key
    * would have had after every event.
    *
    * Two-phase prefix sum, so no task ever sorts a key's full history:
    * phase 1 aggregates per (type, second) — the cumulative window then
    * runs over #distinct-seconds rows per type, not #events; phase 2
    * ranks only within a single second. At 100 TB the widest sort is
    * max(events-per-second-per-type, seconds-per-type), both bounded,
    * vs. the naive single cumulative window's full-history-per-type.
    * (The streaming twin `streaming.RunningCounts` holds one long per
    * key in state instead — this batch form is for replay/backfill.)
    */
  def runningCount(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t.events.select(col("event_id"), col("event_type"), col("ts_sec"))
    // phase 1: per-second totals, then a cumulative count of everything
    // BEFORE each second (small: #types × #distinct-seconds rows)
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("ts_sec"))
    val offsets = ev.groupBy(col("event_type"), col("ts_sec"))
      .agg(count(lit(1)).as("sec_cnt"))
      .withColumn("base", sum(col("sec_cnt")).over(wCum) - col("sec_cnt"))
      .select(col("event_type").as("b_type"), col("ts_sec").as("b_sec"),
        col("base"))
    // phase 2: order only within one second; the (type, sec) hash
    // partitioning is shared by the window and the join (one shuffle)
    val wInSec = Window.partitionBy(col("event_type"), col("ts_sec"))
      .orderBy(col("event_id"))
    ev.withColumn("r", row_number().over(wInSec))
      .join(offsets,
        col("event_type") === col("b_type") && col("ts_sec") === col("b_sec"))
      .select(col("event_id"), col("event_type"),
        (col("base") + col("r")).cast("long").as("running_cnt"))
  }

  def runningCountSql: String =
    """SELECT event_id, event_type,
      |  COUNT(*) OVER (PARTITION BY event_type
      |                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
      |                 ROWS UNBOUNDED PRECEDING) AS running_cnt
      |FROM events""".stripMargin
}
