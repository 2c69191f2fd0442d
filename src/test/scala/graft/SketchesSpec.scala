package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Count-min sketch: grid bounds, the one-sided error guarantee, and
  * heavy-hitter completeness.
  */
class SketchesSpec extends SparkSpec {

  private def exactCounts: Map[String, Long] =
    tables.documents
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("sketch: grid is bounded by d x w with cells in range") {
    val rows = Sketches.countMinSketch(tables).collect()
    assert(rows.length <= Sketches.CmDepth * Sketches.CmWidth)
    assert(rows.forall(r => r.getInt(0) >= 0 &&
      r.getInt(0) < Sketches.CmDepth))
    assert(rows.forall(r => r.getLong(1) >= 0L &&
      r.getLong(1) < Sketches.CmWidth))
    // every depth row carries the full token mass
    val total = exactCounts.values.sum
    rows.groupBy(_.getInt(0)).foreach { case (j, cells) =>
      assert(cells.map(_.getLong(2)).sum == total, s"row $j mass")
    }
  }

  test("sketch: estimates are one-sided — est >= exact count for every word") {
    val exact = exactCounts
    val sketch = Sketches.countMinSketch(tables).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // independent host-side estimate: min over the d cells a word
    // hashes to (mirrors the md5 cell arithmetic)
    def cell(j: Int, w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cm$j|$w".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % Sketches.CmWidth
    }
    for ((w, c) <- exact) {
      val est = (0 until Sketches.CmDepth)
        .map(j => sketch.getOrElse((j, cell(j, w)), 0L)).min
      assert(est >= c, s"word $w: est $est < exact $c")
    }
  }

  test("sketch: heavy hitters contain every truly-heavy word and respect the bar") {
    val exact = exactCounts
    val total = exact.values.sum
    val got = Sketches.countMinHeavyHitters(tables).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val trulyHeavy = exact.filter(_._2 * Sketches.HeavyFrac >= total).keySet
    assert(trulyHeavy.subsetOf(got.keySet),
      s"missed heavy words: ${trulyHeavy -- got.keySet}")
    // emitted estimates clear the bar and dominate the exact count
    for ((w, est) <- got) {
      assert(est * Sketches.HeavyFrac >= total)
      assert(est >= exact(w))
    }
    assert(got.nonEmpty && got.size < exact.size,
      "bar must discriminate at this sf")
  }
}
