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

  /** Independent JVM recompute of a user's (bucket, rho) from raw md5
    * bytes — mirrors none of the Column code.
    */
  private def hllCellOf(userId: Long): (Long, Int) = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hll|$userId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val bucket = java.lang.Long.parseLong(hex.take(8), 16) % Sketches.HllM
    val w = java.lang.Long.parseLong(hex.slice(8, 21), 16)
    val bits = w.toBinaryString.reverse.padTo(Sketches.HllRhoBits, '0')
      .reverse
    val first = bits.indexOf('1')
    (bucket, if (first < 0) Sketches.HllRhoBits else first + 1)
  }

  test("hll: registers match an independent byte-level recompute; max is idempotent") {
    val t = tables
    val regs = Sketches.hllRegisters(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // brute reference: every (day, user) pair through the JVM hash
    val pairs = t.events
      .selectExpr("ts_sec div 86400 AS day", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val exp = pairs.map { case (d, u) =>
      val (b, rho) = hllCellOf(u); ((d, b), rho)
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    assert(regs == exp)
    // idempotence: a corpus unioned with itself moves no register
    val twice = Sketches.hllCells(t.events.union(t.events))
      .groupBy(col("day"), col("bucket"))
      .agg(max(col("rho")).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(twice == regs)
  }

  test("hll: merged registers ≡ one-pass global sketch (the union property); estimate within 5%") {
    val t = tables
    // merge of per-day registers, bucket for bucket
    val merged = Sketches.hllRegisters(t).collect()
      .map(r => (r.getLong(1), r.getInt(2)))
      .groupBy(_._1).map { case (b, v) => b -> v.map(_._2).max }
    // one-pass sketch over all events (day collapsed before max)
    val onePass = Sketches.hllCells(t.events)
      .groupBy(col("bucket")).agg(max(col("rho")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged == onePass, "register max must commute with day split")
    val row = Sketches.hllMergedUniques(t).collect().head
    val (nExact, vZero, z52) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(vZero == Sketches.HllM - onePass.size)
    val est = Sketches.hllEstimateFromMoments(vZero, z52)
    assert(math.abs(est - nExact) <= 0.05 * nExact,
      s"merged est $est vs exact $nExact drifts > 5%")
  }

  test("hll: estimate entry ≡ the shared moment formula exactly; within 5% of exact uniques") {
    val t = tables
    val est = Sketches.eventDailyUniquesEst(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val uniq = Sketches.eventDailyUniques(t).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(est.keySet == uniq.keySet && est.nonEmpty)
    uniq.foreach { case (day, (nExact, vZero, z52)) =>
      val (nBuckets, est6) = est(day)
      assert(nBuckets == Sketches.HllM - vZero)
      val ref = graft.functions.Portable.round6Double(
        Sketches.hllEstimateFromMoments(vZero, z52))
      assert(est6 == ref, s"day $day: catalyst $est6 vs jvm $ref")
      assert(math.abs(est6 - nExact) <= 0.05 * nExact,
        s"day $day: est $est6 vs exact $nExact drifts > 5%")
    }
  }

  /** Independent JVM recompute of the 60-bit KMV hash from raw md5
    * bytes — mirrors none of the Column code.
    */
  private def kmvHashOf(text: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"kmv|$text".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("kmv: sketch is exactly the k smallest distinct hashes per source") {
    val docs = tables.documents.select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy(_._1).map { case (s, rows) =>
      s -> rows.map(r => kmvHashOf(r._2)).distinct.sorted
        .take(Sketches.KmvK).toSeq
    }
    val got = Sketches.kmvSketch(tables).collect()
      .groupBy(_.getString(0))
      .map { case (s, rows) =>
        s -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }
    assert(got == expect, "two-phase top-k must equal the direct sort")
    // ranks are 1..n with no gaps
    Sketches.kmvSketch(tables).collect().groupBy(_.getString(0))
      .foreach { case (s, rows) =>
        assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length),
          s"source $s rank gap")
      }
  }

  test("kmv: planted-overlap jaccard estimate tracks the exact value; disjoint pair reads zero") {
    import spark.implicits._
    // A: texts 0..299, B: 150..449 (jaccard 150/450 = 1/3), C disjoint
    val docs =
      (0 until 300).map(i => ("srcA", s"kmv overlap text $i")) ++
        (150 until 450).map(i => ("srcB", s"kmv overlap text $i")) ++
        (0 until 300).map(i => ("srcC", s"kmv disjoint text $i"))
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv").toString
    docs.toDF("source", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val t = Tables(spark, dir)
    val got = Sketches.reportSourceOverlap(t).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet ==
      Set(("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")))
    val (kAB, _, jAB) = got(("srcA", "srcB"))
    assert(kAB == Sketches.KmvK, "union sketch must be full here")
    // σ ≈ √(j(1−j)/k) ≈ 0.059 at k=64; 4σ bound (deterministic anyway)
    assert(math.abs(jAB - 1.0 / 3.0) <= 0.25, s"jacc est $jAB vs 1/3")
    assert(got(("srcA", "srcC"))._3 == 0.0 && got(("srcB", "srcC"))._3 == 0.0,
      "disjoint sources must estimate zero overlap")
    // distinct-count estimate: full-sketch branch within 35% of 300
    // (1/√(k−2) ≈ 13% σ), and the n_sketch/kth moments are exact
    val est = Sketches.kmvEstimate(t).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    est.foreach { case (s, (nSketch, e)) =>
      assert(nSketch == Sketches.KmvK, s"$s sketch must fill")
      assert(math.abs(e - 300.0) <= 105.0, s"$s est $e vs 300")
    }
  }

  test("kmv: two-phase plan — phase 1 ranks inside (source, shard) partitions with map-side partial top-k") {
    val plan = Sketches.kmvSketch(tables).queryExecution.executedPlan.toString
    // phase 1's window must partition on TWO keys (source + the pmod
    // shard, projected as _w0): a plan ranking on source alone sorts
    // each source's full distinct set in ONE task — the exact shape
    // this op exists to avoid at 100 TB
    assert("windowspecdefinition\\(source#\\d+, _w0".r
      .findFirstIn(plan).isDefined,
      s"phase-1 shard key missing from the window partitioning:\n$plan")
    assert("hashpartitioning\\(source#\\d+, _w0".r
      .findFirstIn(plan).isDefined,
      s"phase-1 exchange must key on (source, shard):\n$plan")
    // Spark's WindowGroupLimit truncates to k per task BEFORE every
    // exchange — even the phase-2 per-source rank receives <= k rows
    // per upstream task, so no shuffle ever carries a full source
    assert("WindowGroupLimit .*Partial".r.findAllIn(plan).length >= 2,
      s"both phases must pre-truncate map-side:\n$plan")
  }

  test("kmv property: random collision-heavy corpora — sketch and overlap ≡ in-memory model; under-k pairs read exact jaccard") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // tiny text domain forces cross-source overlap, within-source dups,
    // and sources both under and over no sketch bound in one corpus
    val corpusGen: Gen[Seq[(String, String)]] = for {
      nSrc <- Gen.choose(2, 3)
      n <- Gen.choose(5, 90)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0, nSrc - 1)
        w <- Gen.choose(0, 40)
      } yield (s"s$s", s"prop text $w"))
    } yield rows

    def modelSketch(rows: Seq[(String, String)]): Map[String, Seq[Long]] =
      rows.groupBy(_._1).map { case (s, rs) =>
        s -> rs.map(r => kmvHashOf(r._2)).distinct.sorted
          .take(Sketches.KmvK).toSeq
      }

    (0 until 6).foreach { k =>
      val rows = corpusGen(Gen.Parameters.default, Seed(100L + k)).get
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_kmv_prop$k").toString
      rows.toDF("source", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val t = Tables(spark, dir)
      val expect = modelSketch(rows)
      val got = Sketches.kmvSketch(t).collect()
        .groupBy(_.getString(0)).map { case (s, rs) =>
          s -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
        }
      assert(got == expect, s"seed=$k sketch diverged")
      // overlap rows ≡ the union-k model; under-k pairs must read the
      // EXACT jaccard of the distinct-text sets
      val sets = rows.groupBy(_._1).map { case (s, rs) =>
        s -> rs.map(_._2).toSet }
      val overlap = Sketches.reportSourceOverlap(t).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      overlap.foreach { case ((a, b), (kUsed, nBoth, j6)) =>
        val union = (expect(a) ++ expect(b)).distinct.sorted
          .take(Sketches.KmvK)
        val inBoth = union.count(v =>
          expect(a).contains(v) && expect(b).contains(v))
        assert(kUsed == union.length && nBoth == inBoth,
          s"seed=$k ($a,$b) union-k model mismatch")
        // when the DISTINCT union fits inside one sketch, the "estimate"
        // degenerates to the exact jaccard of the hash sets
        val (hA, hB) = (sets(a).map(kmvHashOf), sets(b).map(kmvHashOf))
        if ((hA | hB).size <= Sketches.KmvK) {
          val exact = (hA & hB).size.toDouble / (hA | hB).size.toDouble
          assert(j6 == graft.functions.Portable.round6Double(exact),
            s"seed=$k ($a,$b) under-k estimate must be the exact jaccard")
        }
      }
    }
  }

  test("kmv: under-k source takes the exact branch — estimate equals the distinct count") {
    import spark.implicits._
    val docs = (0 until 20).map(i => ("tiny", s"few text $i")) ++
      (0 until 20).map(i => ("tiny", s"few text $i")) // exact dups collapse
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv_tiny").toString
    docs.toDF("source", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val row = Sketches.kmvEstimate(Tables(spark, dir)).collect().head
    assert(row.getLong(1) == 20L && row.getDouble(3) == 20.0,
      "partial sketch must report the exact distinct count")
  }
}
