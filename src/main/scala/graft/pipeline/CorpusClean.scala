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
  * [[CorpusClean.corpusCleanNearDup]] adds step 3: near-dup removal —
  * every doc appearing as the HIGHER id of a minhash LSH candidate pair
  * (dedup.Dedup.dedupMinhash) is dropped, keeping each near-dup
  * cluster's lowest surviving id. One more left_anti join on doc_id.
  *
  * Scale: ONE shuffle total — on (md5, id) for the keeper window;
  * cluster sizes are bounded by dup multiplicity, so no skew. The
  * quality leg is a per-row projection ([[CorpusClean.qualityCol]]),
  * not an aggregation, so it rides the same scan. The near-dup variant
  * adds the bounded minhash band join; the final join keys are doc_id
  * (unique).
  */
object CorpusClean {

  val QualityMin = 0.5

  /** The quality composite as a PER-ROW expression over (text,
    * n_chars): `size(split)` is the token count and
    * `size(array_distinct(split))` the distinct-token count — exactly
    * what the r20 plan derived with an explode + two-level
    * count/countDistinct aggregation (an Expand doubling every token
    * row, two exchanges, and a join back on doc_id). Token multisets
    * are per-document, so no aggregation was ever required: this
    * projection computes the identical longs inside whole-stage
    * codegen with ZERO shuffles, turning the clean gate's quality leg
    * from the composite's widest shuffle into a scan-side expression
    * (optimization guide §2.3/§2.4 — don't shuffle what a row already
    * knows). `array_distinct` and `count(DISTINCT w)` agree on every
    * split output (no nulls; empty strings count in both).
    */
  private[pipeline] def qualityCol: org.apache.spark.sql.Column = {
    val ts = split(col("text"), " ")
    TextAnalysis.qualityExpr(col("n_chars"),
      size(ts).cast("long"), size(array_distinct(ts)).cast("long"))
  }

  /** (doc_id, quality) for every document — the clean gate's composite,
    * exposed so the verdicts op ([[Intake.corpusAdmitVerdicts]]) scores
    * docs the clean gate rejects too. One projection ([[qualityCol]]).
    */
  private[graft] def qualityPerDoc(t: Tables): DataFrame =
    t.documents.select(col("doc_id"), qualityCol.as("quality"))

  /** The keeper rank: 1 for the lowest doc_id of each md5(text) group. */
  private[pipeline] def keeperRank =
    row_number().over(
      Window.partitionBy(md5(col("text"))).orderBy(col("doc_id")))

  /** Standalone (doc_id, quality) SQL, nestable as a derived table. */
  private[pipeline] def qualityPerDocSql: String =
    s"""WITH ctok AS (SELECT doc_id, n_chars, unnest(string_split(text, ' ')) w
       |             FROM documents),
       |cagg AS (SELECT doc_id, n_chars, count(*) n_tok,
       |           count(DISTINCT w) n_distinct
       |         FROM ctok GROUP BY doc_id, n_chars)
       |SELECT doc_id,
       |  ${TextAnalysis.qualityExprSql("n_chars", "n_tok", "n_distinct")} quality
       |FROM cagg""".stripMargin

  def corpusClean(t: Tables): DataFrame =
    corpusCleanUnsorted(t).orderBy(col("doc_id"))

  /** [[corpusClean]] without the presentation sort — the COMPOSITION
    * form (the `minhashCandidates` pattern): downstream operators that
    * join or re-aggregate this result (`corpus_admit`) compose the
    * unsorted plan, so the no-extra-shuffle claim never depends on
    * Catalyst's `EliminateSorts` dropping a mid-plan global sort
    * (ADVICE r9; PlanSpec pins the composed analyzed plan sort-free).
    */
  def corpusCleanUnsorted(t: Tables): DataFrame =
    // quality is a per-row expression ([[qualityCol]]), so it rides the
    // SAME frame as the keeper window instead of a doc_id self-join:
    // the whole gate is one scan, one (md5-keyed) exchange, one window
    // — the join, the explode and the countDistinct Expand of the r20
    // plan are gone (guide §2.4: two operations keyed the same way
    // share one pass when nothing forces them apart)
    t.documents
      .withColumn("quality", qualityCol)
      .withColumn("rn", keeperRank)
      .filter(col("rn") === 1 && col("quality") >= QualityMin)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("quality"))

  /** Near-dup-free corpus: [[corpusClean]] minus every doc that is the
    * higher id of a minhash LSH candidate pair. The two dedup stages
    * compose cleanly with keeper-routed candidate generation
    * (dedup.Dedup.minhashCandidates runs over one representative per
    * md5(text) group): EXACT copies are removed by step 1's rn=1
    * keeper window, and the band join only ever meets the per-text
    * representatives — so no work is duplicated between the stages and
    * a copy flood cannot reach the self-join. (Dropping all `doc_b`s
    * keeps exactly each cluster's lowest id when the cluster is fully
    * connected — true for near-copies, which collide on every band;
    * chain-shaped clusters may drop an extra member, the standard
    * conservative LSH-dedup trade.)
    */
  def corpusCleanNearDup(t: Tables): DataFrame = {
    // candidates from the BUCKETED band store — pair-identical to the
    // live minhashCandidates derivation (same oracle; DedupSpec pins
    // store ≡ live), but the signature aggregation and band self-join
    // shuffles were paid once at store write (the composition
    // `corpus_admit` already uses; r21 points this composite at the
    // same store instead of re-deriving bands from raw documents)
    val losers = graft.dedup.Dedup.dedupMinhashBucketedUnsorted(t)
      .select(col("doc_b").as("doc_id")).distinct()
    // unsorted composition form — see corpusCleanUnsorted
    corpusCleanUnsorted(t)
      .join(losers, Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  /** Chain-correct near-dup removal: [[corpusClean]] minus every doc
    * that belongs to a verified near-dup CLUSTER but is not its keeper
    * (dedup.Dedup.nearDupClusters — connected components of the
    * verified-pair graph, keeper = min id). Where [[corpusCleanNearDup]]
    * conservatively drops every `doc_b` of a candidate pair — on a
    * chain A~B~C both B and C go — this keeps exactly one doc per
    * transitive cluster. (If a cluster's keeper itself failed the
    * exact-dup or quality gate, the cluster contributes nothing: the
    * keeper rule is graph-global, not survivor-relative — same
    * definition in both engines, noted here because it is a semantic
    * choice, not an accident.)
    */
  def corpusCleanClustered(t: Tables): DataFrame = {
    val nonKeepers = graft.dedup.Dedup.nearDupClusters(t)
      .filter(col("doc_id") =!= col("keeper_id"))
      .select(col("doc_id"))
    // unsorted composition form — see corpusCleanUnsorted
    corpusCleanUnsorted(t)
      .join(nonKeepers, Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  /** Paraphrase-free corpus: [[corpusClean]] minus every doc whose
    * SemDeDup admission verdict is `drop` ([[ChunkSemantic
    * .docSemanticDupFrac]] — half or more of its chunk grid
    * semantically duplicates EARLIER corpus content). The layer the
    * other two dedup composites structurally miss: a lightly-edited
    * rehash shares no md5 class with its source (`corpusClean`'s
    * keeper window never sees it) and can clear the shingle band join
    * (`corpusCleanNearDup`) when the edits land in every band — yet
    * its chunk embeddings barely move. Keep-first orientation is
    * inherited from the verdict: the first holder of any content
    * always survives this gate, so the composite is assignment-stable
    * under corpus growth.
    *
    * Scale: the drop set is the store-routed capped band product's
    * per-doc aggregate — semantic-dup-graph-sized, never corpus-sized —
    * and the composition adds one left_anti on doc_id to the clean
    * plan, the exact [[corpusCleanNearDup]] shape.
    */
  def corpusCleanSemantic(t: Tables): DataFrame = {
    val semLosers = ChunkSemantic.docSemanticDupFracUnsorted(t)
      .filter(col("verdict") === "drop").select(col("doc_id"))
    // unsorted composition form — see corpusCleanUnsorted
    corpusCleanUnsorted(t)
      .join(semLosers, Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  /** `ctok`/`agg`/`q`/`k` CTEs — names disjoint from Dedup's minhash
    * CTEs so the two chains compose in [[corpusCleanNearDupSql]].
    */
  private def cleanCtes: String =
    s"""ctok AS (SELECT doc_id, n_chars, unnest(string_split(text, ' ')) w
       |         FROM documents),
       |agg AS (SELECT doc_id, n_chars, count(*) n_tok,
       |          count(DISTINCT w) n_distinct
       |        FROM ctok GROUP BY doc_id, n_chars),
       |q AS (SELECT doc_id,
       |  ${TextAnalysis.qualityExprSql("n_chars", "n_tok", "n_distinct")} quality
       |  FROM agg),
       |k AS (SELECT doc_id,
       |        row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) rn
       |      FROM documents)""".stripMargin

  private def cleanSelect(extraPred: String): String =
    s"""SELECT d.doc_id, d.lang, d.source, d.n_chars, q.quality
       |FROM documents d
       |JOIN q ON d.doc_id = q.doc_id
       |JOIN k ON d.doc_id = k.doc_id
       |WHERE k.rn = 1 AND q.quality >= $QualityMin$extraPred
       |ORDER BY d.doc_id""".stripMargin

  def corpusCleanSql: String = s"WITH $cleanCtes\n${cleanSelect("")}"

  def corpusCleanNearDupSql: String =
    s"""WITH ${graft.dedup.Dedup.minhashBandsCtes},
       |losers AS (SELECT DISTINCT doc_b AS doc_id FROM cand),
       |$cleanCtes
       |${cleanSelect(
        "\n  AND NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = d.doc_id)")}""".stripMargin

  /** The verdict's published SQL nested as a derived table (DuckDB
    * scopes CTE names per subquery — the [[Intake.corpusAdmitSql]]
    * composition idiom), filtered to the drop set, anti-joined by the
    * same predicate shape as the other composites.
    */
  def corpusCleanSemanticSql: String =
    s"""WITH sml AS (SELECT doc_id
       |        FROM (${ChunkSemantic.docSemanticDupFracSql}) sd
       |        WHERE sd.verdict = 'drop'),
       |$cleanCtes
       |${cleanSelect(
        "\n  AND NOT EXISTS (SELECT 1 FROM sml l WHERE l.doc_id = d.doc_id)")}""".stripMargin

  def corpusCleanClusteredSql: String =
    s"""WITH RECURSIVE ${graft.dedup.Dedup.verifiedPairCtes},
       |${graft.dedup.Dedup.clusterLabCtes},
       |$cleanCtes
       |${cleanSelect(
        "\n  AND NOT EXISTS (SELECT 1 FROM lab l WHERE l.doc_id = d.doc_id" +
          " AND l.keeper_id <> l.doc_id)")}""".stripMargin
}
