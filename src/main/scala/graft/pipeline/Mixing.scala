package graft.pipeline

import graft.Tables
import graft.functions.Portable.round6Sql
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-MIX operators: the deterministic sampling / splitting /
  * quality-bucketing decisions a pipeline makes after cleaning and
  * dedup, when it assembles the actual training distribution.
  *
  * All decisions hash DOCUMENT IDENTITY, never position: `u(doc) =
  * int(md5(seed|doc_id)[0:8]) / 2^32` is reproducible across runs,
  * engines, partitionings and corpus orderings — re-running the
  * pipeline after adding documents never flips an existing doc's
  * sample/split assignment (the property a random() sample silently
  * lacks, and the reason every decision here is oracle-checkable:
  * md5 is the one hash both engines share, and division by 2^32 is
  * exact in doubles). Scale: every op is a map-side projection +
  * filter (sampling, splitting) or one windowed rank per language
  * (bucketing) — nothing shuffles more than the final output sort.
  */
object Mixing {

  /** Per-language keep rates for [[sampleStratified]] — the language
    * rebalancing dial: downsample the dominant language, keep the
    * rest. Rates are part of the operator definition (mirrored in the
    * oracle), not tuning.
    */
  val SampleRates: Seq[(String, Double)] = Seq("en" -> 0.5)
  val DefaultRate = 1.0

  val TrainFrac = 0.8
  val ValFrac = 0.1 // test = remainder

  /** Uniform [0,1) from document identity: first 8 md5 hex digits of
    * `seed|doc_id` over 2^32. Seeds namespace decisions — the sample
    * coin and the split coin are independent.
    */
  private def u(seed: String, id: Column): Column =
    conv(substring(md5(concat(lit(s"$seed|"), id.cast("string"))), 1, 8),
      16, 10).cast("double") / lit(4294967296.0)

  private def uSql(seed: String): String =
    s"(('0x' || substr(md5('$seed|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0)"

  /** Language-stratified downsampling: keep a doc iff its identity
    * coin clears its language's rate. (doc_id, lang, source, u) for
    * kept docs — u rides along so consumers can sub-sample further
    * without a second scan.
    */
  def sampleStratified(t: Tables): DataFrame = {
    val rate = SampleRates.foldLeft(lit(DefaultRate): Column) {
      case (acc, (l, r)) => when(col("lang") === l, lit(r)).otherwise(acc)
    }
    t.documents
      .select(col("doc_id"), col("lang"), col("source"))
      .withColumn("u", u("smp", col("doc_id")))
      .filter(col("u") < rate)
      .orderBy(col("doc_id"))
  }

  def sampleStratifiedSql: String = {
    val rateCase = SampleRates
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString("CASE ", " ", s" ELSE $DefaultRate END")
    s"""SELECT doc_id, lang, source, ${uSql("smp")} AS u
       |FROM documents
       |WHERE ${uSql("smp")} < $rateCase
       |ORDER BY doc_id""".stripMargin
  }

  /** Deterministic train/val/test assignment for EVERY doc:
    * train < [[TrainFrac]] ≤ val < [[TrainFrac]]+[[ValFrac]] ≤ test.
    * Identity-hashed, so the split is stable under corpus growth —
    * adding documents never migrates an old doc across splits (no
    * train/test leakage from re-runs).
    */
  def corpusSplit(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"))
      .withColumn("u", u("spl", col("doc_id")))
      .select(col("doc_id"),
        when(col("u") < TrainFrac, "train")
          .when(col("u") < TrainFrac + ValFrac, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))

  def corpusSplitSql: String =
    s"""SELECT doc_id,
       |  CASE WHEN ${uSql("spl")} < $TrainFrac THEN 'train'
       |       WHEN ${uSql("spl")} < ${TrainFrac + ValFrac} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  /** CCNet-style QUALITY BUCKETS: per-language terciles of the corpus
    * LM score ([[graft.textanalysis.TextAnalysis.lmBigramScore]] — the
    * fluency gate's scoring, reused verbatim so the two can never
    * disagree). head = most fluent third of its language, tail =
    * least; the mixing decision CCNet makes before sampling more from
    * head than tail. ntile is deterministic under the (score desc,
    * doc_id) total order and identical in both engines. Docs under 2
    * tokens carry no LM score and stay out, same as the gate.
    *
    * Scale note (honest): `Window.partitionBy(lang)` sends each
    * language to ONE task, and a real corpus is skewed toward one
    * language — at 100 TB the en partition is a single-task sort and
    * this exact-ntile plan does not survive. The production shape is
    * what CCNet itself does: compute the two per-language score
    * BOUNDARIES first (exact via a distributed per-lang rank at the
    * two cut positions, or approx via percentile sketch), broadcast
    * the ~langs×2 boundary table, and assign buckets with a map-side
    * comparison — same semantics except ties AT a boundary, which the
    * ntile form splits by doc_id and the boundary form groups. The
    * oracle pins the exact-ntile semantics; swap in the boundary
    * assignment when the per-language row count outgrows a task.
    */
  def ccnetBucket(t: Tables): DataFrame = {
    val scored = graft.textanalysis.TextAnalysis.lmBigramScore(t)
      .select(col("doc_id"), col("lm_score"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("lm_score").desc, col("doc_id"))
    scored
      .join(t.documents.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("nt", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("lm_score"),
        when(col("nt") === 1, "head").when(col("nt") === 2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
  }

  def ccnetBucketSql: String =
    s"""WITH lm AS (${graft.textanalysis.TextAnalysis.lmBigramScoreSql}),
       |j AS (SELECT lm.doc_id, d.lang, lm.lm_score
       |      FROM lm JOIN documents d USING (doc_id)),
       |b AS (SELECT doc_id, lang, lm_score,
       |        ntile(3) OVER (PARTITION BY lang
       |                       ORDER BY lm_score DESC, doc_id) nt
       |      FROM j)
       |SELECT doc_id, lang, lm_score,
       |  CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
       |          ELSE 'tail' END AS bucket
       |FROM b ORDER BY doc_id""".stripMargin
}
