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
    * would have had after every event, via a cumulative window.
    *
    * Scale note: partitions by event_type (bounded cardinality); at
    * 100 TB the streaming path (`streaming.RunningCounts`) holds only
    * one long per key in state rather than sorting history — this
    * batch form exists for replay/backfill and the oracle.
    */
  def runningCount(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.events.select(col("event_id"), col("event_type"),
      count(lit(1)).over(w).as("running_cnt"))
  }

  def runningCountSql: String =
    """SELECT event_id, event_type,
      |  COUNT(*) OVER (PARTITION BY event_type
      |                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
      |                 ROWS UNBOUNDED PRECEDING) AS running_cnt
      |FROM events""".stripMargin
}
