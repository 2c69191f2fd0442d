package graft

import graft.textanalysis.{QualityModel, TextAnalysis}
import org.apache.spark.sql.functions._

/** Distilled quality classifier: the IRLS fit must actually learn the
  * teacher, the stored weights must be the canonical copy every caller
  * sees, and the scoring query must reproduce a JVM recompute of the
  * same literal arithmetic.
  */
class QualityModelSpec extends SparkSpec {

  test("fit learns the teacher: distilled admit agrees with the heuristic gate on >= 85% of docs") {
    val teacher = TextAnalysis.qualityScore(tables).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3) >= 0.5)).toMap
    val student = QualityModel.qualityClassify(tables).collect()
      .map(r => r.getLong(0) -> (r.getInt(2) == 1)).toMap
    assert(student.keySet == teacher.keySet)
    val agree = teacher.count { case (id, y) => student(id) == y }
    val frac = agree.toDouble / teacher.size
    assert(frac >= 0.85, s"distillation agreement $frac below 0.85")
    // both classes must actually occur — a constant classifier can
    // score high agreement on a skewed corpus and learn nothing
    assert(student.values.exists(identity) && student.values.exists(!_),
      "classifier must separate, not emit a constant")
  }

  test("stored weights are canonical: repeated calls read identical doubles; scores ≡ a JVM recompute") {
    val w1 = QualityModel.storedWeights(tables)
    val w2 = QualityModel.storedWeights(tables)
    assert(w1.toSeq == w2.toSeq, "store must serve the same bits")
    assert(w1.length == QualityModel.NumFeatures)
    // independent JVM recompute of score6/admit from raw counts with
    // the same fixed-order arithmetic
    val docs = tables.documents
      .select(col("doc_id"), col("n_chars"), col("text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expect = docs.map { case (id, nChars, text) =>
      val toks = text.split(" ", -1)
      val nTok = toks.length.toDouble
      val nDist = toks.distinct.length.toDouble
      val f = Array(1.0, nChars / 1000.0, nTok / 100.0, nDist / 100.0,
        nDist / nTok, (nChars / nTok) / 10.0)
      var s = 0.0
      for (i <- 0 until QualityModel.NumFeatures) s += f(i) * w1(i)
      id -> ((graft.functions.Portable.round6Double(s), s >= 0.0))
    }.toMap
    val got = QualityModel.qualityClassify(tables).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2) == 1))).toMap
    assert(got == expect, "catalyst scores must equal the JVM recompute")
  }

  test("distill confusion: cells partition the corpus and reconcile with per-doc verdicts") {
    val teacher = TextAnalysis.qualityScore(tables).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3) >= 0.5)).toMap
    val student = QualityModel.qualityClassify(tables).collect()
      .map(r => r.getLong(0) -> (r.getInt(2) == 1)).toMap
    val row = QualityModel.distillConfusion(tables).collect().head
    val (n, tp, fp, fn, tn, agree) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getDouble(5))
    assert(n == teacher.size && tp + fp + fn + tn == n)
    assert(tp == teacher.count { case (id, y) => y && student(id) })
    assert(fp == teacher.count { case (id, y) => !y && student(id) })
    assert(fn == teacher.count { case (id, y) => y && !student(id) })
    assert(agree == graft.functions.Portable.round6Double(
      (tp + tn).toDouble / n.toDouble))
  }

  test("distill calibration: bins ≡ a JVM recompute; cells reconcile with the confusion totals") {
    import graft.functions.Portable.round6Double
    val got = QualityModel.distillCalibration(tables).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap

    // per-doc (score6, teacher) from the already-pinned queries
    val score = QualityModel.qualityClassify(tables).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val teacher = TextAnalysis.qualityScore(tables).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3) >= 0.5)).toMap
    val lo = score.values.min; val hi = score.values.max
    val B = QualityModel.CalibBins
    def binOf(s: Double): Long =
      if (hi == lo) 0L
      else math.min(math.floor((s - lo) * B.toDouble / (hi - lo)).toLong,
        (B - 1).toLong)
    val want = score.toSeq.groupBy { case (_, s) => binOf(s) }
      .map { case (b, docs) =>
        val pos = docs.count { case (id, _) => teacher(id) }
        val ss = docs.map(_._2)
        b -> (docs.size.toLong, pos.toLong,
          round6Double(pos.toDouble / docs.size), ss.min, ss.max)
      }
    assert(got == want, s"calibration cells diverge:\ngot  $got\nwant $want")

    // reconciliation: Σn = n_docs, Σn_pos = teacher positives (tp+fn)
    val conf = QualityModel.distillConfusion(tables).collect().head
    assert(got.values.map(_._1).sum == conf.getLong(0))
    assert(got.values.map(_._2).sum == conf.getLong(1) + conf.getLong(3))
    // bins sit inside their arithmetic edges and don't overlap
    got.toSeq.sortBy(_._1).sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a._5 <= b._4, "bin ranges overlap")
      case _ => ()
    }
  }
}
