package graft.pipeline

import graft.Tables
import graft.textanalysis.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The capstone composite: materialize the CLEANED corpus — what an LLM
  * data pipeline actually ships to tokenization. A document survives iff
  *   1. it is its exact-dup cluster's keeper (lowest doc_id per
  *      md5(text) — `dedup_exact`'s keeper rule), and
  *   2. its quality composite (textanalysis.TextAnalysis.qualityScore's
  *      exact formula) clears [[CorpusClean.QualityMin]].
  *
  * Near-dup removal (minhash/simhash candidate pairs → drop non-keepers)
  * plugs into the same shape as an additional left_anti join against the
  * pair set.
  *
  * Scale: one shuffle on (md5, id) for the keeper window — cluster
  * sizes are bounded by dup multiplicity, so no skew — and one shuffle
  * for the quality aggregation; the join keys are doc_id (unique).
  */
object CorpusClean {

  val QualityMin = 0.5

  def corpusClean(t: Tables): DataFrame = {
    val docs = t.documents
    val keeperRank = row_number().over(
      Window.partitionBy(md5(col("text"))).orderBy(col("doc_id")))
    val quality = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"),
        col("n_chars"))
      .groupBy(col("doc_id"), col("n_chars"))
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("w")).as("n_distinct"))
      .select(col("doc_id"),
        TextAnalysis.qualityExpr(col("n_chars"), col("n_tok"),
          col("n_distinct")).as("quality"))
    docs
      .withColumn("rn", keeperRank)
      .filter(col("rn") === 1)
      .join(quality, Seq("doc_id"))
      .filter(col("quality") >= QualityMin)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("quality"))
      .orderBy(col("doc_id"))
  }

  def corpusCleanSql: String =
    s"""WITH tok AS (SELECT doc_id, n_chars, unnest(string_split(text, ' ')) w
       |             FROM documents),
       |agg AS (SELECT doc_id, n_chars, count(*) n_tok,
       |          count(DISTINCT w) n_distinct
       |        FROM tok GROUP BY doc_id, n_chars),
       |q AS (SELECT doc_id,
       |  ${TextAnalysis.qualityExprSql("n_chars", "n_tok", "n_distinct")} quality
       |  FROM agg),
       |k AS (SELECT doc_id,
       |        row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) rn
       |      FROM documents)
       |SELECT d.doc_id, d.lang, d.source, d.n_chars, q.quality
       |FROM documents d
       |JOIN q ON d.doc_id = q.doc_id
       |JOIN k ON d.doc_id = k.doc_id
       |WHERE k.rn = 1 AND q.quality >= $QualityMin
       |ORDER BY d.doc_id""".stripMargin
}
