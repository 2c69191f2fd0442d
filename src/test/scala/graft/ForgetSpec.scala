package graft

import graft.dedup.Dedup
import graft.pipeline.Forget
import org.apache.spark.sql.functions._

/** Delete propagation: re-election classes against an independent
  * recompute, and the planted-cluster semantics (keeper deleted →
  * survivors relabel; cluster emptied → retraction).
  */
class ForgetSpec extends SparkSpec {

  /** Independent JVM tombstone rule from raw md5 bytes. */
  private def tomb(docId: Long): Boolean =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"forget|$docId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.startsWith("0")

  test("forget_keepers: every touched cluster re-elects exactly the min survivor; untouched clusters stay silent") {
    val labels = Dedup.nearDupClusters(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = labels.groupBy(_._2)
    val expect = byCluster.flatMap { case (cid, members) =>
      val ids = members.map(_._1)
      val dropped = ids.filter(tomb)
      if (dropped.isEmpty) None
      else {
        val left = ids.filterNot(tomb)
        Some(cid -> (if (left.isEmpty) None else Some(left.min),
          dropped.length.toLong, left.length.toLong))
      }
    }
    val got = Forget.forgetKeepers(tables).collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2), r.getLong(3))).toMap
    assert(got == expect, "re-election must match the independent recompute")
  }

  test("forget_keepers: planted clusters hit all three classes — relabel, retraction, thinned") {
    import spark.implicits._
    // Build doc ids around the tombstone rule itself so each class is
    // guaranteed by construction, not by luck.
    val ids = 0L until 4000L
    val dead = ids.filter(tomb)
    val live = ids.filterNot(tomb)
    // cluster A: dead keeper with two live survivors above it
    val firstDead = dead.find(d => live.count(_ > d) >= 2).get
    val liveAfter = live.filter(_ > firstDead)
    // cluster B: two dead ids, disjoint from A
    val deadAfter = dead.filter(d => d != firstDead && d > firstDead)
    // cluster C: LIVE keeper below a DEAD member, ids unused so far
    val used = Set(firstDead, liveAfter(0), liveAfter(1),
      deadAfter(0), deadAfter(1))
    val liveC = live.find(l => !used(l) &&
      dead.exists(d => !used(d) && d > l)).get
    val deadC = dead.find(d => !used(d) && d > liveC).get
    // near-dup members: alternating two-token texts of DIFFERENT repeat
    // counts — distinct texts with IDENTICAL shingle sets, so minhash
    // bands collide by construction (no banding luck) and the exact
    // jaccard verify reads 1.0
    def txt(tag: String, u: Long) =
      (1 to (12 + u.toInt)).map(j =>
        if (j % 2 == 1) s"${tag}x" else s"${tag}y").mkString(" ")
    val docs =
      // cluster A: keeper (min id) dead, two live survivors → relabeled
      Seq((firstDead, txt("aa", 1)), (liveAfter(0), txt("aa", 2)),
        (liveAfter(1), txt("aa", 3))) ++
      // cluster B: both members dead → retracted
      Seq((deadAfter(0), txt("bb", 1)), (deadAfter(1), txt("bb", 2))) ++
      // cluster C: keeper live, one member dead → thinned
      Seq((liveC, txt("cc", 1)), (deadC, txt("cc", 2)))
    val dir = java.nio.file.Files.createTempDirectory("graft_forget").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t = Tables(spark, dir)
    // precondition: the planted members really do cluster
    val labels = Dedup.nearDupClusters(t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels.keySet == docs.map(_._1).toSet,
      s"planted near-dups must all enter the graph: $labels")
    val rows = Forget.forgetKeepers(t).collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2), r.getLong(3))).toMap
    // cluster A (id = firstDead): relabeled to its min live member
    assert(rows(firstDead) == (Some(liveAfter(0)), 1L, 2L),
      s"relabel class: $rows")
    // cluster B (id = deadAfter(0)): fully retracted
    assert(rows(deadAfter(0)) == (None, 2L, 0L), s"retraction class: $rows")
    // cluster C (id = liveC): keeper survives → new_keeper == cluster_id
    assert(rows(liveC) == (Some(liveC), 1L, 1L), s"thinned class: $rows")
    // stats roll the same classes up
    val st = Forget.forgetStats(t).collect().head
    assert(st.getLong(0) == docs.count(d => tomb(d._1)), "n_forgotten")
    assert(st.getLong(1) == docs.count(d => !tomb(d._1)), "n_kept")
    assert(st.getLong(2) == 1L, "clusters_retracted")
    assert(st.getLong(3) == 1L, "clusters_relabeled")
    assert(st.getLong(4) == 1L, "clusters_thinned")
  }

  test("forget_exact_keepers: planted exact-dup classes re-elect; singletons and untouched classes stay out") {
    import spark.implicits._
    val ids = 0L until 4000L
    val dead = ids.filter(tomb)
    val live = ids.filterNot(tomb)
    // class A: dead keeper (min id) + two live copies → relabeled
    // class B: two dead copies → retracted
    // class C: two live copies → untouched (no row)
    // class D: singleton dead → no row (no election needed)
    val firstDead = dead.find(d => live.count(_ > d) >= 2).get
    val liveA = live.filter(_ > firstDead).take(2)
    val deadB = dead.filter(_ != firstDead).take(2)
    val liveC = live.filterNot(liveA.contains).take(2)
    val deadD = dead.filterNot(d => d == firstDead || deadB.contains(d)).head
    val docs =
      Seq(firstDead, liveA(0), liveA(1)).map(id => (id, "exact copy aa")) ++
        deadB.map(id => (id, "exact copy bb")) ++
        liveC.map(id => (id, "exact copy cc")) ++
        Seq((deadD, "exact copy dd"))
    val dir = java.nio.file.Files.createTempDirectory("graft_forget_ex").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Forget.forgetExactKeepers(Tables(spark, dir)).collect()
      .map(r => (r.getLong(1), (
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3), r.getLong(4)))).toMap
    assert(rows.keySet == Set(firstDead, deadB.min),
      s"exactly the touched multi-member classes: $rows")
    assert(rows(firstDead) == ((Some(liveA.min), 1L, 2L)), "relabel class")
    assert(rows(deadB.min) == ((None, 2L, 0L)), "retraction class")
  }
}
