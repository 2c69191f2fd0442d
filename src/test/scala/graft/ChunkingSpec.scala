package graft

import graft.pipeline.Chunking

/** Fixed-grid chunking: exact grid arithmetic at every boundary, full
  * token coverage with the documented overlap, byte-exact chunk texts,
  * and the chunk-grid duplication rollup's cross-doc criterion.
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private val C = Chunking.ChunkTokens
  private val S = Chunking.ChunkStride

  private def corpus(docs: Seq[(Long, String, String)]): Tables = {
    val dir = java.nio.file.Files.createTempDirectory("graft_chunk").toString
    docs.toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  private def toks(n: Int, p: String) = (0 until n).map(p + _).mkString(" ")

  test("grid arithmetic: short doc whole, exact-C single, C+1 splits, tail shorter") {
    val t = corpus(Seq(
      (0L, toks(10, "a"), "s0"),        // n < C  -> 1 whole chunk
      (1L, toks(C, "b"), "s0"),         // n = C  -> 1 chunk
      (2L, toks(C + 1, "c"), "s0"),     // n = C+1 -> 2nd chunk from S
      (3L, toks(100, "d"), "s0")))      // 2 chunks, tail 52
    val got = Chunking.docChunks(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (0L, 0L, 0L, 10L),
      (1L, 0L, 0L, C.toLong),
      (2L, 0L, 0L, C.toLong), (2L, 1L, S.toLong, (C + 1 - S).toLong),
      (3L, 0L, 0L, C.toLong), (3L, 1L, S.toLong, 52L)), s"got $got")
  }

  test("every token is covered; consecutive chunks overlap by C−S except the tail") {
    val t = corpus(Seq((0L, toks(250, "w"), "s0")))
    val rows = Chunking.docChunks(t).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // starts on the S-grid, ends reach n, no chunk starts past the text
    assert(rows.map(_._2).toSeq == rows.indices.map(_ * S.toLong))
    val covered = rows.flatMap { case (_, s, n) => s until (s + n) }.toSet
    assert(covered == (0L until 250L).toSet, "grid left a token uncovered")
    rows.sliding(2).foreach {
      case Array((_, s1, n1), (_, s2, _)) =>
        assert(s1 + n1 - s2 >= (C - S).toLong || s1 + n1 == 250L,
          s"overlap broken between $s1 and $s2")
      case _ =>
    }
  }

  test("grid equals the JVM closed-form model across every boundary length class") {
    // n spanning: single-chunk (n ≤ C), every off-by-one around C and
    // C+S, exact multiples, and arbitrary mid-range lengths
    val lens = Seq(1, 2, S - 1, S, S + 1, C - 1, C, C + 1,
      C + S - 1, C + S, C + S + 1, 2 * C - 1, 2 * C, 2 * C + 1,
      3 * S, 250, 317, 600)
    val t = corpus(lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, toks(n, s"t${i}_"), "s0") })
    val got = Chunking.docChunks(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = lens.zipWithIndex.flatMap { case (n, i) =>
      val nc = if (n <= C) 1 else (n - C + S - 1) / S + 1
      (0 until nc).map(j =>
        (i.toLong, j.toLong, (j * S).toLong, math.min(C, n - j * S).toLong))
    }.toSet
    assert(got == want,
      s"model-only ${want -- got}, spark-only ${got -- want}")
  }

  test("chunk texts are byte-exact token slices on the real corpus; plan is shuffle-free") {
    val df = Chunking.docChunks(tables)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"chunking must be pure per-row work:\n$plan")
    val texts = tables.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = df.collect()
    assert(rows.length >= texts.size, "every doc emits at least one chunk")
    rows.take(200).foreach { r =>
      val ts = texts(r.getLong(0)).split(" ", -1)
      val (s, n) = (r.getLong(2).toInt, r.getLong(3).toInt)
      assert(r.getString(4) == ts.slice(s, s + n).mkString(" "),
        s"chunk (${r.getLong(0)},${r.getLong(1)}) text drifted")
    }
  }

  test("chunk-grid dup stats: cross-doc duplicated chunks only; within-doc repeats silent") {
    val shared = toks(C, "p")
    // docs 0/1 share chunk 0 verbatim (different tails); doc 2 is a
    // period-S self-repeat — its two chunk TEXTS are identical but
    // live in ONE doc, so the cross-doc criterion keeps it silent
    val selfRep = (0 until C + S).map(i => "q" + (i % S)).mkString(" ")
    val t = corpus(Seq(
      (0L, s"$shared ${toks(S, "x")}", "s0"),
      (1L, s"$shared ${toks(S, "y")}", "s1"),
      (2L, selfRep, "s1")))
    val got = Chunking.chunkDupStats(t).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("s0") == (2L, 1L,
      graft.functions.Portable.round6Double(1.0 / 2.0)), s"got $got")
    assert(got("s1") == (4L, 1L,
      graft.functions.Portable.round6Double(1.0 / 4.0)), s"got $got")
  }
}
