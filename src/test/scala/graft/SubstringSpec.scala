package graft

import graft.dedup.Substring

/** Span-level (exact substring) dedup: planted shared runs surface
  * with exact boundaries, sub-K runs stay silent, overlapping flagged
  * windows merge into ONE maximal span, and the clean pass keeps
  * exactly one canonical copy of every duplicated passage.
  */
class SubstringSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4

  /** Write a (doc_id, text, source) corpus and return its Tables. */
  private def corpus(docs: Seq[(Long, String, String)]): Tables = {
    val dir = java.nio.file.Files.createTempDirectory("graft_substr").toString
    docs.toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  // docA and docB share the 6-token run r0..r5 at different offsets;
  // docC shares only 3 tokens of it (< K); every other token is unique.
  private val run = "r0 r1 r2 r3 r4 r5"
  private val abc = Seq(
    (0L, s"a0 a1 $run a2 a3", "s0"),   // run at pos 2..7
    (1L, s"$run b0 b1 b2 b3", "s1"),   // run at pos 0..5
    (2L, "r0 r1 r2 c0 c1 c2 c3 c4 c5", "s1")) // sub-K prefix only

  test("planted shared run surfaces with exact maximal boundaries; sub-K run is silent") {
    val spans = Substring.substringSpans(corpus(abc), K).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(spans == Set((0L, 2L, 7L, 6L), (1L, 0L, 5L, 6L)), s"got $spans")
  }

  test("flagged windows with an unflagged gap between them merge when coverage touches") {
    // docD: S-run (pos 0) shared with doc 11, T-run (pos 4) shared with
    // doc 12; the bridging windows (pos 1..3 mixing S and T tokens)
    // exist nowhere else. Flagged starts {0, 4}, gap = K → coverage
    // [0,3] ∪ [4,7] is contiguous → ONE span, not two.
    val t = corpus(Seq(
      (10L, "s0 s1 s2 s3 t0 t1 t2 t3", "s0"),
      (11L, "s0 s1 s2 s3 x0 x1 x2 x3", "s0"),
      (12L, "y0 y1 y2 y3 t0 t1 t2 t3", "s0")))
    val d10 = Substring.substringSpans(t, K).collect()
      .filter(_.getLong(0) == 10L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(d10 == Set((0L, 7L, 8L)), s"got $d10")
  }

  test("a run repeated within one doc is flagged only when some OTHER doc holds it") {
    // docF holds the shared run twice (pos 0 and pos 8), docG once;
    // docH repeats its own private run twice but no other doc has it —
    // within-doc repetition alone is quality_repetition's domain.
    val t = corpus(Seq(
      (20L, "q0 q1 q2 q3 f0 f1 f2 f3 q0 q1 q2 q3", "s0"),
      (21L, "q0 q1 q2 q3 g0 g1 g2 g3", "s0"),
      (22L, "p0 p1 p2 p3 h0 h1 h2 h3 p0 p1 p2 p3", "s0")))
    val spans = Substring.substringSpans(t, K).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((20L, 0L, 3L), (20L, 8L, 11L), (21L, 0L, 3L)),
      s"got $spans")
  }

  test("clean keeps exactly one canonical copy and excises every other occurrence") {
    val cleaned = Substring.cleanSubstring(corpus(abc), K).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // doc 0 is the min-doc_id holder of every duplicated window → keeper
    assert(cleaned(0L) == (s"a0 a1 $run a2 a3", 0L))
    // doc 1's occurrence is non-canonical → the whole run is cut
    assert(cleaned(1L) == ("b0 b1 b2 b3", 6L))
    // doc 2 never matched → byte-identical pass-through
    assert(cleaned(2L) == ("r0 r1 r2 c0 c1 c2 c3 c4 c5", 0L))
  }

  test("within one doc the earlier occurrence is canonical; a full-duplicate doc empties") {
    val t = corpus(Seq(
      (20L, "q0 q1 q2 q3 f0 f1 f2 f3 q0 q1 q2 q3", "s0"),
      (21L, "q0 q1 q2 q3", "s0")))
    val cleaned = Substring.cleanSubstring(t, K).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // doc 20 pos 0 is the global first occurrence → kept; its pos-8
    // repeat and doc 21's whole text are later occurrences → cut
    assert(cleaned(20L) == ("q0 q1 q2 q3 f0 f1 f2 f3", 4L))
    assert(cleaned(21L) == ("", 4L))
  }

  test("span stats aggregate symmetric flagging per source with exact token totals") {
    val rows = Substring.spanDupStats(corpus(abc), K).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // s0 = doc 0 alone: 10 tokens, 6 flagged; s1 = docs 1+2: 19 tokens,
    // 6 flagged (doc 2 contributes nothing)
    assert(rows("s0") == (1L, 10L, 6L,
      graft.functions.Portable.round6Double(6.0 / 10.0)))
    assert(rows("s1") == (2L, 19L, 6L,
      graft.functions.Portable.round6Double(6.0 / 19.0)))
  }

  test("decontaminate localizes an eval doc's verbatim train overlap; eval-eval sharing is silent") {
    // eval doc 30 quotes a 6-token train run (k=4 → coverage 6 of 12
    // tokens); eval docs 31+32 share a run with EACH OTHER only (not
    // contamination — nothing in train holds it); eval doc 33 shares
    // 3 < K tokens with train. Train docs never emit.
    val t = corpus(Seq(
      (1L, s"t0 t1 $run t2 t3", "src1"),                    // train host
      (30L, s"e0 e1 e2 $run e3 e4 e5", "src0"),             // quote at 3..8
      (31L, "w0 w1 w2 w3 e6 e7 e8 e9", "src0"),
      (32L, "w0 w1 w2 w3 f0 f1 f2 f3", "src0"),
      (33L, "r0 r1 r2 g0 g1 g2 g3 g4 g5 g6 g7 g8", "src0")))
    val got = Substring.substringDecontaminate(t, K).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set((30L, 12L, 6L,
      graft.functions.Portable.round6Double(6.0 / 12.0))), s"got $got")
  }

  test("materialized-window spans equal the live plan, never rescan documents") {
    val live = Substring.substringSpans(tables).collect().map(_.toSeq).toSet
    val mat = Substring.substringSpansMat(tables).collect().map(_.toSeq).toSet
    assert(mat == live)
    val plan = Substring.substringSpansMat(tables)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      plan.linesIterator.filter(_.contains("documents")).take(3).mkString("\n"))
    assert(plan.contains("graft_substr_wins_"))
  }

  test("clean/stats/decontaminate read the shared window store; documents scanned once, for text/totals only") {
    // at the library K every consumer's window frame is the store —
    // the one remaining documents.parquet scan is the projection-
    // pruned text-rebuild / token-total join, never a re-tokenize
    def docScans(df: org.apache.spark.sql.DataFrame): Int = {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft_substr_wins_"),
        plan.linesIterator.take(6).mkString("\n"))
      "documents\\.parquet".r.findAllIn(plan).length
    }
    assert(docScans(Substring.cleanSubstring(tables)) == 1)
    assert(docScans(Substring.spanDupStats(tables)) == 1)
    assert(docScans(Substring.substringDecontaminate(tables)) == 1)
  }

  test("keeper election is exact past 2^20 token positions (packed-argmin overflow boundary)") {
    // doc 0 holds the run's first occurrence lexicographically — but at
    // a position past 2^20, where the retired packed doc_id·2^20+pos
    // key (0·2^20 + 1048581 = 1048581) ranks ABOVE doc 1's occurrence
    // (1·2^20 + 0 = 1048576) and would mis-elect doc 1, excising the
    // canonical copy. The struct argmin keeps doc 0 intact.
    val pad = (0 until 1048581).map(i => "u" + i).mkString(" ")
    val t = corpus(Seq(
      (0L, s"$pad $run", "s0"),
      (1L, s"$run z0 z1 z2 z3", "s0")))
    val cleaned = Substring.cleanSubstring(t, K).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(cleaned(0L)._2 == 0L, s"canonical copy excised: ${cleaned(0L)._2}")
    assert(cleaned(1L) == ("z0 z1 z2 z3", 6L), s"got ${cleaned(1L)}")
  }

  test("bucketed-store spans equal the live plan; hash-clustered phases run exchange-free") {
    val live = Substring.substringSpans(tables).collect().map(_.toSeq).toSet
    val b = Substring.substringSpansBucketed(tables)
    assert(b.collect().map(_.toSeq).toSet == live)
    val plan = b.queryExecution.executedPlan.toString
    // the dup aggregation and the flagged semi-join cluster on the
    // bucket key — neither may pay an exchange over the store; the
    // per-doc interval merge (doc_id) is the one legitimate shuffle
    assert(!plan.contains("Exchange hashpartitioning(h"),
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(plan.contains("graft_substr_wins_b_"))
  }

  test("real corpus: spans exist at the library K, every span is genuinely cross-doc, plan is join-free of cartesians") {
    val df = Substring.substringSpans(tables)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(8).mkString("\n"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val spans = df.collect()
    assert(spans.nonEmpty)
    // every span's covering text occurs verbatim in at least one OTHER
    // document — independent JVM recheck of the first few spans
    val texts = tables.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    spans.take(10).foreach { r =>
      val (d, s, e) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val toks = texts(d).split(" ", -1)
      // the first K-window of the span is duplicated by construction
      val win = toks.slice(s.toInt, s.toInt + Substring.SpanK).mkString(" ")
      assert(e - s + 1 == r.getLong(3))
      assert(texts.exists { case (od, ot) => od != d && ot.contains(win) },
        s"span ($d,$s,$e) window not found in any other doc")
    }
  }
}
