package graft.pipeline

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The intake pipeline END TO END as one batch decision: which documents
  * does the pipeline ADMIT to the training mix? A doc is admitted iff it
  * clears every gate the intake path runs, in order:
  *
  *   1. exact-dup keeper + quality  — [[CorpusClean.corpusClean]]'s two
  *      rules (lowest doc_id per md5(text), composite ≥ QualityMin);
  *   2. self-repetition             — [[graft.textanalysis.TextAnalysis
  *      .qualityRepetition]]'s keep flag (top/dup bigram fractions);
  *   3. near-dup                    — not the HIGHER id of a minhash LSH
  *      candidate pair ([[CorpusClean.corpusCleanNearDup]]'s drop rule);
  *   4. containment                 — not the HIGHER id of an asymmetric
  *      containment pair ([[graft.dedup.Dedup.dedupContainment]] — the
  *      quote/snippet duplication mode band LSH structurally misses);
  *   5. the CCNet mixing decision   — quality bucket from the broadcast
  *      per-language boundary table ([[Mixing.ccnetBucketBounded]]) and
  *      the identity-hash keep coin at that bucket's [[Mixing.CcnetRates]]
  *      rate (seed `ccn` — the SAME coin as `corpus_sample_ccnet`, so
  *      admission = sample ∩ gates by construction, and corpus growth
  *      never flips a surviving doc's fate).
  *
  * Output: (doc_id, lang, lm_score, bucket, u) for every admitted doc.
  *
  * Scale: every gate is an already-bounded plan (keeper window on
  * md5(text); capped band/posting self-joins; broadcast boundary table);
  * this composition adds only doc_id equi-joins and two left_anti joins
  * against loser id sets — no new shuffle wider than the gates' own.
  * The streaming twin is [[graft.streaming.Jobs.IntakeSamplerStream]]:
  * the same verdict riding one live stream, pinned ≡ this op on a corpus
  * replay (StreamingJobsSpec).
  *
  * Reference scope: composes the reference's filter/dedup/count loops
  * (e.g. BlackListFilter.java, PersistWordCount.java) into the
  * LLM-data-pipeline capstone the brief's training-data mandate asks
  * for; every stage is an existing §2 operator reused verbatim.
  */
object Intake {

  /** The CCNet keep-rate CASE over the bucket column — shared with the
    * streaming twin so the two rate tables cannot drift.
    */
  private[graft] def rateExpr = Mixing.CcnetRates.foldLeft(lit(0.0)) {
    case (acc, (b, r)) => when(col("bucket") === b, lit(r)).otherwise(acc)
  }

  def corpusAdmit(t: Tables): DataFrame = {
    val clean = CorpusClean.corpusClean(t).select(col("doc_id"))
    val rep = graft.textanalysis.TextAnalysis.qualityRepetition(t)
      .filter(col("keep") === 1).select(col("doc_id"))
    val ndLosers = graft.dedup.Dedup.minhashCandidates(t)
      .select(col("doc_b").as("doc_id")).distinct()
    val ctLosers = graft.dedup.Dedup.dedupContainment(t)
      .select(col("doc_b").as("doc_id")).distinct()
    Mixing.ccnetBucketBounded(t)
      .join(clean, Seq("doc_id"))
      .join(rep, Seq("doc_id"))
      .join(ndLosers, Seq("doc_id"), "left_anti")
      .join(ctLosers, Seq("doc_id"), "left_anti")
      .withColumn("u", Mixing.u("ccn", col("doc_id")))
      .filter(col("u") < rateExpr)
      .select(col("doc_id"), col("lang"), col("lm_score"), col("bucket"),
        col("u"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: each gate's published SQL reused as a nested-WITH derived
    * table (DuckDB scopes CTE names per subquery, so the five gates'
    * CTEs cannot collide), composed by the same joins as the Spark
    * plan. The coin and the rate CASE are the `corpus_sample_ccnet`
    * formulas verbatim.
    */
  def corpusAdmitSql: String = {
    val rateCase = Mixing.CcnetRates
      .map { case (b, r) => s"WHEN bb.bucket = '$b' THEN $r" }
      .mkString("CASE ", " ", " ELSE 0.0 END")
    s"""WITH clean AS (SELECT doc_id FROM (${CorpusClean.corpusCleanSql}) c),
       |rep AS (SELECT doc_id FROM (${graft.textanalysis.TextAnalysis.qualityRepetitionSql}) r
       |        WHERE r.keep = 1),
       |ndl AS (SELECT DISTINCT doc_b AS doc_id
       |        FROM (${graft.dedup.Dedup.dedupMinhashSql}) m),
       |ctl AS (SELECT DISTINCT doc_b AS doc_id
       |        FROM (${graft.dedup.Dedup.dedupContainmentSql}) ct),
       |bb AS (SELECT * FROM (${Mixing.ccnetBucketBoundedSql}) b)
       |SELECT bb.doc_id, bb.lang, bb.lm_score, bb.bucket,
       |  ${Mixing.uSql("ccn").replace("doc_id", "bb.doc_id")} AS u
       |FROM bb
       |JOIN clean USING (doc_id)
       |JOIN rep USING (doc_id)
       |WHERE bb.doc_id NOT IN (SELECT doc_id FROM ndl)
       |  AND bb.doc_id NOT IN (SELECT doc_id FROM ctl)
       |  AND ${Mixing.uSql("ccn").replace("doc_id", "bb.doc_id")} < $rateCase
       |ORDER BY bb.doc_id""".stripMargin
  }
}
