package graft.textanalysis

import graft.Tables
import graft.functions.Portable.{round6, round6Sql}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression quality classifier — the model-FIT
  * op a corpus pipeline runs to DISTILL an expensive gate into a
  * linear scorer: the teacher here is the heuristic quality gate
  * ([[TextAnalysis.qualityExpr]] ≥ 0.5), the student a 6-weight
  * logistic model over the same portable count features, fit by IRLS
  * (iteratively reweighted least squares) where each iteration is ONE
  * distributed aggregation (27 map-side-partial sums: the 6×6 upper
  * Hessian + 6-gradient) and a driver-side 6×6 solve — the `ivfFit` /
  * `Opq` fit discipline: corpus-sized work stays declarative, the
  * driver sees only scalar-sized moments.
  *
  * The fitted weights are persisted per corpus
  * ([[graft.storage.Materialize.ensureStore]]) and read back, so every
  * JVM — and the DuckDB oracle, which inlines the stored weights as
  * full-precision literals ([[qualityClassifySql]], the Opq rotation
  * pattern) — scores with the identical model. The SCORING query is
  * then map-side arithmetic in a fixed literal order: bit-portable,
  * fully hash-checked; only the fit (which needs `exp`) stays
  * engine-side, spec-gated.
  */
object QualityModel {

  val Iters = 6
  val Ridge = 1e-6
  val NumFeatures = 6

  /** Per-doc integer count frame shared by fit and scoring. */
  private def counts(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"),
        col("n_chars"))
      .groupBy(col("doc_id"), col("n_chars"))
      .agg(count(lit(1)).as("n_tok"),
        countDistinct(col("w")).as("n_distinct"))

  /** The 6 features, fixed order — scaled count ratios only (every
    * term one cast + one or two divisions, the identical literal
    * sequence in [[featureSqls]]).
    */
  private def features: Seq[Column] = Seq(
    lit(1.0),
    col("n_chars").cast("double") / lit(1000.0),
    col("n_tok").cast("double") / lit(100.0),
    col("n_distinct").cast("double") / lit(100.0),
    col("n_distinct").cast("double") / col("n_tok").cast("double"),
    (col("n_chars").cast("double") / col("n_tok").cast("double"))
      / lit(10.0))

  private def featureSqls: Seq[String] = Seq(
    "1.0",
    "(n_chars::DOUBLE / 1000.0)",
    "(n_tok::DOUBLE / 100.0)",
    "(n_distinct::DOUBLE / 100.0)",
    "(n_distinct::DOUBLE / n_tok::DOUBLE)",
    "((n_chars::DOUBLE / n_tok::DOUBLE) / 10.0)")

  /** w·x in the fixed left-associated order both engines share. */
  private def scoreCol(w: Array[Double]): Column =
    features.zipWithIndex.map { case (f, i) => f * lit(w(i)) }
      .reduce(_ + _)

  private def scoreSql(w: Array[Double]): String =
    featureSqls.zipWithIndex
      // Double.toString round-trips exactly; DuckDB parses to the bit
      .map { case (f, i) => s"($f * ${w(i)})" }
      .mkString(" + ")

  /** Solve (A + ridge·I) x = b for symmetric A — Gaussian elimination
    * with partial pivoting over the 6×6 driver-side system.
    */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = Array.tabulate(n, n + 1)((i, j) =>
      if (j < n) a(i)(j) + (if (i == j) Ridge else 0.0) else b(i))
    for (col <- 0 until n) {
      val piv = (col until n).maxBy(r => math.abs(m(r)(col)))
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      for (r <- col + 1 until n) {
        val f = m(r)(col) / m(col)(col)
        for (c <- col to n) m(r)(c) -= f * m(col)(c)
      }
    }
    val x = new Array[Double](n)
    for (i <- (n - 1) to 0 by -1) {
      var s = m(i)(n)
      for (j <- i + 1 until n) s -= m(i)(j) * x(j)
      x(i) = s / m(i)(i)
    }
    x
  }

  /** IRLS fit against the heuristic teacher. Engine-side `exp` is
    * fine here — the fit never crosses the oracle boundary; only its
    * PERSISTED weights do.
    */
  private[graft] def fit(t: Tables): Array[Double] = {
    val base = counts(t).withColumn("y",
      when(TextAnalysis.qualityExpr(col("n_chars"), col("n_tok"),
        col("n_distinct")) >= 0.5, 1.0).otherwise(0.0))
      .persist()
    var w = Array.fill(NumFeatures)(0.0)
    try {
      for (_ <- 1 to Iters) {
        val s = scoreCol(w)
        val p = lit(1.0) / (lit(1.0) + exp(-s))
        val wt = p * (lit(1.0) - p) + lit(Ridge)
        val aggs =
          (for (i <- 0 until NumFeatures; j <- i until NumFeatures)
            yield sum(wt * features(i) * features(j)).as(s"h_${i}_$j")) ++
            (0 until NumFeatures).map(i =>
              sum((col("y") - p) * features(i)).as(s"g_$i"))
        val row = base.agg(aggs.head, aggs.tail: _*).head()
        val h = Array.ofDim[Double](NumFeatures, NumFeatures)
        var k = 0
        for (i <- 0 until NumFeatures; j <- i until NumFeatures) {
          h(i)(j) = row.getDouble(k); h(j)(i) = row.getDouble(k); k += 1
        }
        val g = (0 until NumFeatures)
          .map(i => row.getDouble(k + i)).toArray
        val dw = solve(h, g)
        w = w.zip(dw).map { case (a, b) => a + b }
      }
      w
    } finally { base.unpersist(); () }
  }

  private def weightsStore = graft.storage.Materialize.StoreDef(
    "graft_quality_lr", "documents", s"iters=$Iters,ridge=$Ridge,v1")

  /** The canonical per-corpus weights: fit once, persisted, read back
    * — every caller (and the oracle literals) sees the STORED doubles.
    */
  private[graft] def storedWeights(t: Tables): Array[Double] = {
    val spark = t.spark
    import spark.implicits._
    graft.storage.Materialize.ensureStore(t, weightsStore, {
        val w = fit(t)
        w.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
          .toDF("idx", "wv")
      })
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
  }

  /** Set by [[qualityClassify]]; consumed by [[qualityClassifySql]]
    * (Verify runs every query before dumping oracle SQL — the Opq
    * `lastFitted` protocol).
    */
  @volatile private var lastWeights: Option[Array[Double]] = None

  /** The distilled gate as a QUERY: per doc, the linear score (round6)
    * and the admit bit (score ≥ 0 on the UNROUNDED value — the same
    * full-precision comparison in both engines). Map-side arithmetic
    * over the count aggregation — at 100 TB this is the cheap
    * classifier the intake stream runs per doc, no bigram tables, no
    * joins.
    */
  def qualityClassify(t: Tables): DataFrame = {
    val w = storedWeights(t)
    lastWeights = Some(w)
    counts(t)
      .select(col("doc_id") +: scoreProjection(w): _*)
      .orderBy(col("doc_id"))
  }

  /** (score6, admit) projection columns over a frame carrying
    * (n_chars, n_tok, n_distinct) — shared by the batch query and the
    * stateless streaming gate so the scoring arithmetic cannot drift.
    */
  private[graft] def scoreProjection(w: Array[Double]): Seq[Column] = {
    val s = scoreCol(w)
    Seq(round6(s).as("score6"),
      when(s >= 0.0, 1).otherwise(0).as("admit"))
  }

  def qualityClassifySql: String = {
    val w = lastWeights.getOrElse(Array.fill(NumFeatures)(0.0))
    val s = scoreSql(w)
    s"""WITH tok AS (SELECT doc_id, n_chars,
       |               unnest(string_split(text, ' ')) w
       |             FROM documents),
       |agg AS (SELECT doc_id, n_chars, count(*) n_tok,
       |          count(DISTINCT w) n_distinct
       |        FROM tok GROUP BY doc_id, n_chars)
       |SELECT doc_id, ${round6Sql(s)} AS score6,
       |  CASE WHEN ($s) >= 0.0 THEN 1 ELSE 0 END AS admit
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** The distillation's acceptance audit — teacher-vs-student
    * confusion matrix as ONE row: (n_docs, tp, fp, fn, tn, agree6),
    * teacher = the heuristic gate ([[TextAnalysis.qualityExpr]] ≥
    * 0.5), student = the stored linear model. The number a rollout
    * reads before swapping the intake gate: counts are exact integers
    * over one count-aggregation pass (both classifiers are map-side
    * expressions over the same frame — no joins), `agree6` one IEEE
    * division. The same audit re-run nightly catches drift: a corpus
    * whose feature distribution moved shows up as falling agreement
    * before it shows up as bad training data.
    */
  def distillConfusion(t: Tables): DataFrame = {
    val w = storedWeights(t)
    lastWeights = Some(w)
    val s = scoreCol(w)
    val teacher = TextAnalysis.qualityExpr(col("n_chars"), col("n_tok"),
      col("n_distinct")) >= 0.5
    val student = s >= 0.0
    counts(t)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(teacher && student, 1L).otherwise(0L)).as("tp"),
        sum(when(!teacher && student, 1L).otherwise(0L)).as("fp"),
        sum(when(teacher && !student, 1L).otherwise(0L)).as("fn"),
        sum(when(!teacher && !student, 1L).otherwise(0L)).as("tn"))
      .select(col("n_docs"), col("tp"), col("fp"), col("fn"), col("tn"),
        round6((col("tp") + col("tn")).cast("double")
          / col("n_docs").cast("double")).as("agree6"))
  }

  def distillConfusionSql: String = {
    val w = lastWeights.getOrElse(Array.fill(NumFeatures)(0.0))
    val s = scoreSql(w)
    val teacher =
      s"(${TextAnalysis.qualityExprSql("n_chars", "n_tok", "n_distinct")}" +
        s" >= 0.5)"
    val student = s"(($s) >= 0.0)"
    s"""WITH tok AS (SELECT doc_id, n_chars,
       |               unnest(string_split(text, ' ')) w
       |             FROM documents),
       |agg AS (SELECT doc_id, n_chars, count(*) n_tok,
       |          count(DISTINCT w) n_distinct
       |        FROM tok GROUP BY doc_id, n_chars)
       |SELECT COUNT(*) AS n_docs,
       |  SUM(CASE WHEN $teacher AND $student THEN 1 ELSE 0 END)::BIGINT AS tp,
       |  SUM(CASE WHEN NOT $teacher AND $student THEN 1 ELSE 0 END)::BIGINT AS fp,
       |  SUM(CASE WHEN $teacher AND NOT $student THEN 1 ELSE 0 END)::BIGINT AS fn,
       |  SUM(CASE WHEN NOT $teacher AND NOT $student THEN 1 ELSE 0 END)::BIGINT AS tn,
       |  ${round6Sql(
        "(SUM(CASE WHEN " + teacher + " = " + student +
          " THEN 1 ELSE 0 END))::DOUBLE / COUNT(*)::DOUBLE")} AS agree6
       |FROM agg""".stripMargin
  }

  /** Score bins for the calibration report. */
  val CalibBins = 8

  /** Set by [[distillCalibration]]; consumed by
    * [[distillCalibrationSql]] (the [[lastWeights]] protocol).
    */
  @volatile private var lastCalibRange: Option[(Double, Double)] = None

  /** The distillation's CALIBRATION audit — the reliability diagram
    * next to [[distillConfusion]]'s single agreement number: student
    * scores split into [[CalibBins]] equal-width bins over the
    * observed [lo, hi] range, and per bin the doc count, the
    * teacher-positive count, and the empirical teacher-positive rate.
    * `distillConfusion` can report 95% agreement while every
    * disagreement hides in one score band; this table shows WHERE the
    * linear student stops ranking like the teacher (a healthy
    * distillation shows pos_rate6 rising with the bin; a flat or
    * non-monotone band is the score region to retrain on).
    *
    * Bin range scalars are a bounded driver collect inlined as
    * full-precision literals into BOTH engines (the stored-weights
    * protocol), so the bin arithmetic is the identical IEEE sequence
    * cross-engine over round6 scores — fully hash-checked. One
    * count-aggregation pass; cells are |bins| rows.
    */
  def distillCalibration(t: Tables): DataFrame = {
    val w = storedWeights(t)
    lastWeights = Some(w)
    val teacher = TextAnalysis.qualityExpr(col("n_chars"), col("n_tok"),
      col("n_distinct")) >= 0.5
    val scored = counts(t)
      .select(round6(scoreCol(w)).as("score6"),
        when(teacher, 1L).otherwise(0L).as("pos"))
    val rngRow = scored.agg(min(col("score6")), max(col("score6"))).head()
    val (lo, hi) = (rngRow.getDouble(0), rngRow.getDouble(1))
    lastCalibRange = Some((lo, hi))
    val denom = hi - lo
    val bin =
      if (denom == 0.0) lit(0L)
      else least(floor((col("score6") - lit(lo)) * lit(CalibBins.toDouble)
        / lit(denom)), lit(CalibBins - 1L)).cast("long")
    scored
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        min(col("score6")).as("lo6"), max(col("score6")).as("hi6"))
      .select(col("bin"), col("n"), col("n_pos"),
        round6(col("n_pos").cast("double") / col("n").cast("double"))
          .as("pos_rate6"),
        col("lo6"), col("hi6"))
      .orderBy(col("bin"))
  }

  def distillCalibrationSql: String = {
    val w = lastWeights.getOrElse(Array.fill(NumFeatures)(0.0))
    val (lo, hi) = lastCalibRange.getOrElse((0.0, 0.0))
    val denom = hi - lo
    val s = scoreSql(w)
    val teacher =
      s"(${TextAnalysis.qualityExprSql("n_chars", "n_tok", "n_distinct")}" +
        s" >= 0.5)"
    val binSql =
      if (denom == 0.0) "0"
      else s"LEAST(FLOOR((score6 - $lo) * ${CalibBins.toDouble} / $denom)," +
        s" ${CalibBins - 1})"
    s"""WITH tok AS (SELECT doc_id, n_chars,
       |               unnest(string_split(text, ' ')) w
       |             FROM documents),
       |agg AS (SELECT doc_id, n_chars, count(*) n_tok,
       |          count(DISTINCT w) n_distinct
       |        FROM tok GROUP BY doc_id, n_chars),
       |sc AS (SELECT ${round6Sql(s)} AS score6,
       |         CASE WHEN $teacher THEN 1 ELSE 0 END AS pos
       |       FROM agg)
       |SELECT ($binSql)::BIGINT AS bin, COUNT(*)::BIGINT AS n,
       |  SUM(pos)::BIGINT AS n_pos,
       |  ${round6Sql("SUM(pos)::DOUBLE / COUNT(*)::DOUBLE")} AS pos_rate6,
       |  MIN(score6) AS lo6, MAX(score6) AS hi6
       |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
