package graft

import graft.pipeline.{Chunking, ChunkSemantic, CorpusClean}
import org.apache.spark.sql.functions._

/** `chunk_dedup_semantic`'s value contract on a PLANTED corpus — the
  * positive case the r18 entry never had (VERDICT r18 #2: a 0≡0 oracle
  * match proves nothing for an operator whose purpose is to FIND
  * something). Plants the exact scenario the operator exists for — a
  * paraphrased chunk at a SHIFTED grid position that exact hashing
  * misses — plus the two negative guards: verbatim copies excluded
  * (the exact pass's province) and a boilerplate flood dropped by the
  * band cap.
  */
class ChunkSemanticSpec extends SparkSpec {

  // ---- the planted corpus ------------------------------------------------
  // doc 1: one 64-token chunk (the original passage)
  // doc 2: 48 junk tokens + the SAME passage with 2 tokens edited — its
  //        chunk 1 (tok_start 48) is a PARAPHRASE of doc 1's chunk 0 at
  //        a shifted grid position; md5 differs, token multiset barely
  //        moves (62/64 shared)
  // docs 3,4: the same 64 tokens VERBATIM — identical md5, so the
  //        semantic entry must stay silent (chunkDupStats' catch)
  // docs 100..135: one 64-token bag in 36 different rotations —
  //        IDENTICAL embeddings (bags equal), distinct md5: a
  //        boilerplate flood sharing every bucket at every width, which
  //        the occupancy ladder cannot split and the cap must drop
  private val paraA = (0 until 64).map(i => s"para$i")
  private val paraB = paraA.updated(10, "ed1a").updated(30, "ed1b")
  private val floodBag = (0 until 64).map(i => s"flood$i")

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_chunksem").toString
    val verb = (0 until 64).map(i => s"verb$i").mkString(" ")
    val rows =
      Seq((1L, "para", paraA.mkString(" ")),
        (2L, "para",
          ((0 until 48).map(i => s"junk$i") ++ paraB).mkString(" ")),
        (3L, "verb", verb), (4L, "verb", verb)) ++
        (0 until 36).map(k =>
          (100L + k, "flood",
            (floodBag.drop(k) ++ floodBag.take(k)).mkString(" ")))
    rows.map { case (id, src, tx) => (id, src, tx, tx.length.toLong) }
      .toDF("doc_id", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }
  private lazy val t = Tables(spark, dir)
  private lazy val out = ChunkSemantic.chunkDedupSemantic(t).collect()

  // independent JVM recompute of the feature-hash embedding — the same
  // published algorithm re-derived from scratch, NOT a call into
  // HashFeatureVec
  private def embed(chunk: String): Array[Double] = {
    val v = new Array[Double](ChunkSemantic.Dims)
    val md = java.security.MessageDigest.getInstance("MD5")
    chunk.split(' ').foreach { w =>
      md.reset()
      val dg = md.digest(w.getBytes("UTF-8"))
      var hv = 0L
      (0 until 4).foreach(b => hv = (hv << 8) | (dg(b) & 0xffL))
      val sgn = if (((dg(4) >> 4) & 1) == 1) 1.0 else -1.0
      v((hv % ChunkSemantic.Dims).toInt) += sgn
    }
    v
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
  }

  test("the planted paraphrase pair is found, at its shifted grid position") {
    assert(out.length == 1, s"expected exactly the planted pair, got " +
      out.map(_.toString).mkString("[", ", ", "]"))
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 0L, 0L, 64L)))
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((2L, 1L, 48L, 64L)), "the match must be doc 2's SHIFTED chunk 1")
  }

  test("cos_sim matches an independent JVM recompute of the embedding cosine") {
    val expected = graft.functions.Portable.round6Double(
      cosine(embed(paraA.mkString(" ")), embed(paraB.mkString(" "))))
    assert(out.head.getDouble(8) == expected)
    assert(expected >= ChunkSemantic.SemCosMin)
  }

  test("exact chunk hashing misses the pair; the verbatim pair is its catch, not ours") {
    val stats = Chunking.chunkDupStats(t).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // the paraphrase: md5-invisible (dup_chunks = 0 for its source) —
    // exactly the blind spot the semantic entry exists to cover
    assert(stats("para") == 0L)
    // the verbatim docs 3,4: the EXACT pass catches them...
    assert(stats("verb") == 2L)
    // ...and the semantic entry excludes them (h_a = h_b)
    assert(!out.exists(r => Set(r.getLong(0), r.getLong(4)) == Set(3L, 4L)))
  }

  test("no join input carries chunk_text — hashes and vectors only cross the shuffle") {
    // the scale contract in the scaladoc: the band join moves
    // (tbl, bkt, ids, h, 64 doubles), never text — at 100 TB the text
    // column dwarfs everything else in the exchange
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val opt = ChunkSemantic.chunkDedupSemantic(t)
      .queryExecution.optimizedPlan
    val joins = opt.collect { case j: Join => j }
    assert(joins.nonEmpty)
    joins.foreach(j => assert(
      !j.children.exists(_.output.exists(_.name == "chunk_text")),
      s"a join input carries chunk_text:\n$j"))
  }

  test("store-routed _mat ≡ live derivation; its plan never scans documents") {
    val mat = ChunkSemantic.chunkDedupSemanticMat(t)
    assert(mat.collect().map(_.toString).toSeq ==
      out.map(_.toString).toSeq)
    // after the store exists, the _mat plan reads ONLY the chunk-vector
    // store — embedding the corpus happens once per corpus, not per query
    val plan = ChunkSemantic.chunkDedupSemanticMat(t)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "the _mat plan re-scanned the corpus")
    assert(plan.contains("graft_chunk_v_gens_"),
      s"the _mat plan does not read the incremental store:\n$plan")
  }

  test("doc_semantic_dup_frac: the paraphrasing doc drops, the source keeps (keep-first)") {
    val rows = ChunkSemantic.docSemanticDupFrac(t).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    // doc 2 = 112 tokens → 2 chunks; its chunk 1 semantically
    // duplicates doc 1's content → frac 0.5, at the threshold → drop
    assert(rows(2L) == ((2L, 1L, 0.5, "drop")), s"doc 2: ${rows(2L)}")
    // doc 1 holds the content FIRST — never marked by its copier
    assert(rows(1L) == ((1L, 0L, 0.0, "keep")))
    // verbatim-identical chunks are the exact pass's province — the
    // semantic verdict does not double-count them
    assert(rows(3L)._4 == "keep" && rows(4L)._4 == "keep")
    // the boilerplate flood was cap-dropped before pair formation
    assert((100L to 135L).forall(d => rows(d) == ((1L, 0L, 0.0, "keep"))))
  }

  // ---- the cross-source paraphrase family --------------------------------
  // (matrix / clusters / clean-semantic consumers of the pair entry)
  // doc 1 (src s1): the original passage
  // doc 2 (src s2): 48 junk tokens + the 2-token-edited paraphrase at a
  //        shifted grid position — the SAME proven-colliding pair shape
  //        as the corpus above
  // doc 3 (src s3): the paraphrase text verbatim as its own doc — its
  //        chunk is TEXT-IDENTICAL to doc 2's chunk 1 (h_a = h_b, so
  //        the direct 2~3 link is the exact pass's province and the
  //        semantic pair set never carries it) but text-distinct from
  //        doc 1's chunk, which it semantically duplicates
  private lazy val dir2: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_chunksem2").toString
    Seq((1L, "s1", paraA.mkString(" ")),
      (2L, "s2", ((0 until 48).map(i => s"junk$i") ++ paraB).mkString(" ")),
      (3L, "s3", paraB.mkString(" ")))
      .map { case (id, src, tx) => (id, tx, "en", src, tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }
  private lazy val t2 = Tables(spark, dir2)

  test("report_semdup_matrix: paraphrase pairs land in lexicographic source cells") {
    val cells = ChunkSemantic.sourceSemanticDupMatrix(t2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // one cross-doc chunk pair per straddled source pair; NO (s2,s3)
    // cell — that link is verbatim (the exact matrix's row), and no
    // diagonal — no within-source paraphrase was planted
    assert(cells == Map(("s1", "s2") -> 1L, ("s1", "s3") -> 1L), s"$cells")
  }

  test("semdup_clusters: the paraphrase family is ONE component, keeper = min id") {
    val rows = ChunkSemantic.semDupClusters(t2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // docs 2 and 3 are joined only TRANSITIVELY through doc 1 (their
    // direct edge is h-identical, excluded from the semantic pair set)
    // — the closure the pairwise drop verdict cannot express
    assert(rows == Map(1L -> ((1L, 3L)), 2L -> ((1L, 3L)), 3L -> ((1L, 3L))),
      s"$rows")
  }

  test("corpus_clean_semantic: later paraphrase holders drop, the first survives") {
    val clean = CorpusClean.corpusClean(t2).collect().map(_.getLong(0)).toSet
    assert(clean == Set(1L, 2L, 3L),
      "all three docs clear the exact-dup + quality gates — the " +
        "paraphrase layer is exactly what those gates miss")
    val sem = CorpusClean.corpusCleanSemantic(t2).collect()
      .map(_.getLong(0)).toSet
    assert(sem == Set(1L),
      s"doc 2 (dup_frac 0.5) and doc 3 (dup_frac 1.0) must drop: $sem")
  }

  test("semdup_matrix plan: source lookups broadcast the pair side, pruned to (doc_id, source)") {
    // the report-sized pair side must broadcast through BOTH source
    // lookups (the sourceNearDupMatrix argument: Catalyst's static
    // size estimate for a join output is corpus-scaled and would pick
    // sort-merge, shuffling the corpus for a report), and the corpus
    // lookup scan must read exactly the two columns it joins/returns
    val plan = ChunkSemantic.sourceSemanticDupMatrix(t2)
      .queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 2, s"source lookups not broadcast:\n$plan")
    assert(plan.contains("struct<doc_id:bigint,source:string>"),
      s"source-lookup scan reads more than (doc_id, source):\n$plan")
  }

  test("semdup_clusters final plan reads checkpointed labels — no pair re-derivation") {
    // the dedup_clusters discipline: the converged frame must source
    // from the last round's localCheckpoint — if it re-derived the
    // semantic pair edges, every consumer would pay the band join +
    // cosine verify again and the fixpoint's rounds were wasted
    val plan = ChunkSemantic.semDupClusters(t2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"),
      s"final cluster plan does not read the checkpointed labels:\n$plan")
    assert(!plan.contains("parquet"),
      s"final cluster plan re-derives its edges from storage:\n$plan")
  }

  test("corpus_clean_semantic composes unsorted gates — one Sort in the ANALYZED plan") {
    // the corpus_admit composition rule (ADVICE r9): the guarantee is
    // structural — the pre-optimizer plan carries exactly ONE Sort,
    // the composite's own output orderBy, with no EliminateSorts
    // reliance on dropping the gates' presentation sorts
    import org.apache.spark.sql.catalyst.plans.logical.Sort
    val analyzed = CorpusClean.corpusCleanSemantic(t2).queryExecution.analyzed
    val sorts = analyzed.collect { case s: Sort => s }
    assert(sorts.length == 1,
      s"expected exactly the output Sort pre-optimization, got " +
        s"${sorts.length}:\n${analyzed.treeString}")
  }

  // ---- semantic decontamination ------------------------------------------
  // doc 1 (src0, EVAL): the benchmark passage paraA — 1 chunk
  // doc 2 (web, TRAIN): 48 junk + paraB (paraA 2-token-edited at a
  //        shifted grid position) — the paraphrased leak; no rare
  //        shingle and no verbatim window survives the edits
  // doc 5 (src0, EVAL): paraC (paraA edited at OTHER positions) — a
  //        HIGHER-id eval doc, so its pair with train doc 2 has the
  //        eval doc on the B side of the entry's pair order (the
  //        second orientation); its pair with doc 1 is eval↔eval and
  //        must be excluded
  // doc 6 (src0, EVAL): paraA ++ 64 unrelated tokens — 3 chunks, only
  //        chunk 0 leaks → 1/3 < 0.5, below the family threshold
  // doc 7 (web, TRAIN): 64 unrelated tokens — no pair at all
  private val paraC = paraA.updated(5, "ed3a").updated(50, "ed3b")
  private lazy val dir3: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_chunksem3").toString
    val other = (0 until 64).map(i => s"other$i")
    Seq((1L, "src0", paraA.mkString(" ")),
      (2L, "web", ((0 until 48).map(i => s"junk$i") ++ paraB).mkString(" ")),
      (5L, "src0", paraC.mkString(" ")),
      (6L, "src0", (paraA ++ other).mkString(" ")),
      (7L, "web", (0 until 64).map(i => s"lone$i").mkString(" ")))
      .map { case (id, src, tx) => (id, tx, "en", src, tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }
  private lazy val t3 = Tables(spark, dir3)

  test("semdup_decontaminate: the paraphrased benchmark leak is flagged, both orientations") {
    val rows = ChunkSemantic.semdupDecontaminate(t3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc 1 (eval, LOWER id than its train match — the A side) and
    // doc 5 (eval, HIGHER id — the B side) both contaminated by train
    // doc 2 over their whole 1-chunk grid
    assert(rows.contains((1L, 2L)) && rows((1L, 2L)) == ((1L, 1L, 1.0)),
      s"$rows")
    assert(rows.contains((5L, 2L)) && rows((5L, 2L)) == ((1L, 1L, 1.0)),
      s"the B-side orientation was lost: $rows")
    // eval↔eval pairs (1~5, 1~6) never flag — within-split redundancy
    // is the dedup entries' domain; and doc 6's 1-of-3-chunk leak sits
    // below the family threshold
    assert(rows.keySet == Set((1L, 2L), (5L, 2L)), s"$rows")
  }

  test("semdup_decontaminate: eval probes broadcast, never shuffle as sort-merge") {
    val plan = ChunkSemantic.semdupDecontaminate(t3)
      .queryExecution.executedPlan.toString
    // the eval suite is tiny at any corpus scale: the membership
    // semi/anti probes AND the eval-band × train-index join must all
    // be broadcast joins
    assert(!plan.contains("SortMergeJoin"),
      s"an eval-side join degraded to sort-merge:\n$plan")
  }

  test("semdup_decontaminate: a MASS leak floods its bucket and is still caught (trim, not drop)") {
    // the failure mode the dedup entries' bucket-DROP cap would create
    // here: a benchmark leaked into 33 train pages (token-reordered
    // copies — order-invariant embeddings are IDENTICAL, md5s all
    // differ, no shared shingle order for the other decontaminate ops)
    // floods every (tbl, bkt) at every width; dropping the bucket
    // would report ZERO contamination for the worst leak. The train
    // index must instead TRIM to the cap's lexicographically smallest
    // members and flag the eval doc against the representatives.
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_chunksem4").toString
    val bag = (0 until 64).map(i => s"leak$i")
    val rows = Seq((1L, "src0", bag.mkString(" "))) ++
      (1 to 33).map(k =>
        (100L + k, "web", (bag.drop(k) ++ bag.take(k)).mkString(" ")))
    rows.map { case (id, src, tx) => (id, tx, "en", src, tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = ChunkSemantic.semdupDecontaminate(Tables(spark, d)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // flagged against exactly the cap smallest train docs — 32 of 33
    // (the documented bounded trade), each over the whole 1-chunk grid
    assert(got.length == ChunkSemantic.ChunkBandCap, s"got ${got.length}")
    assert(got.map(_._2).toSeq ==
      (1 to ChunkSemantic.ChunkBandCap).map(100L + _),
      s"trim must keep the lexicographically smallest train docs: $got")
    assert(got.forall(r => r._1 == 1L && r._3 == 1L && r._4 == 1L &&
      r._5 == 1.0), s"$got")
  }

  test("semdup_decontaminate: a MEGA-flood bucket is trimmed without any Window (salted two-phase min-k)") {
    // the r20 perf-weak mark: the train trim was a row_number window
    // partitioned by (tbl, bkt) — at 100 TB a boilerplate mass-leak
    // concentrates on ONE such key and the window becomes a single
    // task sorting the whole flood. The salted two-phase min-k must
    // return the IDENTICAL trim set (the cap lexicographically
    // smallest members) with NO Window operator anywhere in the plan.
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_chunksem5").toString
    val bag = (0 until 64).map(i => s"mega$i")
    val n = 10000 // ≥10⁴ identical-vector train chunks in one bucket
    val rows = Seq((1L, "src0", bag.mkString(" "))) ++
      (1 to n).map(k =>
        (100L + k, "web",
          (bag.drop(k % 64) ++ bag.take(k % 64)).mkString(" ")))
    rows.map { case (id, src, tx) => (id, tx, "en", src, tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val df = ChunkSemantic.semdupDecontaminate(Tables(spark, d))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"the train trim regressed to a per-bucket window:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4)))
    // trim keeps exactly the cap smallest train docs (101..132); their
    // rotations k=1..32 all differ from the eval text (k%64 ≠ 0), so
    // every representative flags over the whole 1-chunk grid
    assert(got.length == ChunkSemantic.ChunkBandCap, s"got ${got.length}")
    assert(got.map(_._2).toSeq ==
      (1 to ChunkSemantic.ChunkBandCap).map(100L + _),
      s"trim must keep the lexicographically smallest train docs: $got")
    assert(got.forall(r => r._1 == 1L && r._3 == 1L && r._4 == 1L &&
      r._5 == 1.0), s"$got")
  }

  test("the boilerplate flood is dropped by the cap, not paired") {
    // non-vacuity: two flood rotations really are embedding-identical
    // (cosine 1.0 — they'd flood C(36,2) pairs if admitted) and
    // text-distinct (md5 differs, so the h_a ≠ h_b guard alone would
    // NOT exclude them)
    val f0 = floodBag.mkString(" ")
    val f1 = (floodBag.drop(1) ++ floodBag.take(1)).mkString(" ")
    assert(cosine(embed(f0), embed(f1)) == 1.0)
    assert(f0 != f1)
    assert(!out.exists(r => r.getLong(0) >= 100L || r.getLong(4) >= 100L),
      "flood chunks leaked past the band cap")
  }
}
