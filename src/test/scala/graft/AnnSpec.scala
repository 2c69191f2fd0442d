package graft

import graft.ann.Ann

class AnnSpec extends SparkSpec {

  test("embed_topk: k exact neighbors per query, ranks dense") {
    val rows = Ann.embedTopK(tables).collect()
    val perQuery = rows.groupBy(_.getLong(0))
    assert(perQuery.size == Ann.NumQueries)
    perQuery.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to Ann.K))
    }
  }

  test("embed_topk rank is a two-phase WindowGroupLimit (partial before shuffle)") {
    val plan = Ann.embedTopK(tables).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
    assert(plan.contains("Partial"), plan.linesIterator.take(12).mkString("\n"))
  }

  test("multiprobe recall@10 strictly beats single-probe at sf0.01") {
    // Single-probe misses true neighbors whose first-4-dim signs differ
    // from the query's (the near-hyperplane failure mode). Multi-table
    // probing must recover some of them: recall@10 vs the exact top-k
    // strictly above single-probe, and the candidate set a superset
    // (table 0 of the multi index IS the single-probe bucketing).
    val t = Tables(spark, "/root/testdata/sf0.01")
    def hits(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(Ann.embedTopK(t).collect())
    val single = hits(Ann.embedAnnLsh(t).collect())
    val multiTable = hits(Ann.embedAnnMultiprobe(t, hamming1 = false).collect())
    val multi = hits(Ann.embedAnnMultiprobe(t).collect())
    val recallSingle = (single & exact).size
    val recallMultiTable = (multiTable & exact).size
    val recallMulti = (multi & exact).size
    // axis 1: more tables strictly beat one table at this sf
    assert(recallMultiTable > recallSingle,
      s"multi-table recall $recallMultiTable not above single-probe $recallSingle (exact=${exact.size})")
    // axis 2: hamming-1 probes only ever ADD candidates (mask 0 keeps
    // every own-bucket probe), so recall is monotone along this axis too
    assert(recallMulti >= recallMultiTable,
      s"hamming-1 recall $recallMulti below multi-table baseline $recallMultiTable")
  }

  test("embed_ann_ivf: cells partition the corpus; probes bound the scan") {
    val rows = Ann.embedAnnIvf(tables).collect()
    assert(rows.nonEmpty)
    // k dense ranks per query, like every ANN entry
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
      assert(rs.length <= Ann.K)
    }
    // no IVF hit ever beats the exact best (candidates are a subset)
    val topk = Ann.embedTopK(tables).collect()
    val best = topk.filter(_.getInt(3) == 1)
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    rows.foreach(r => assert(r.getDouble(2) <= best(r.getLong(0)) + 1e-9))
    // recall floor at sf0.001: scanning nprobe/centroids = 1/4 of the
    // cells must still recover a solid share of the exact top-k
    val exact = topk.map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall@10 collapsed: $recall")
  }

  test("embed_ann_pq: ADC shortlist re-rank recovers most exact neighbors") {
    val rows = Ann.embedAnnPq(tables).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
      assert(rs.length <= Ann.K)
    }
    val topk = Ann.embedTopK(tables).collect()
    // re-ranked cosines are exact, so no PQ hit beats the exact best
    val best = topk.filter(_.getInt(3) == 1)
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    rows.foreach(r => assert(r.getDouble(2) <= best(r.getLong(0)) + 1e-9))
    // a 50-deep shortlist from 16-codeword × 8-subspace codes must
    // recover a large share of the exact top-10
    val exact = topk.map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"PQ recall@10 collapsed: $recall")
  }

  test("embed_ann_ivf_pq: probe-bounded ADC stays inside the probed cells") {
    val rows = Ann.embedAnnIvfPq(tables).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
    }
    // candidates ⊆ the probed IVF cells: every hit must also be an IVF
    // candidate, so no ivf_pq hit can beat the plain-IVF best for its
    // query (PQ only narrows the scan, never widens it)
    val ivfBest = Ann.embedAnnIvf(tables).collect()
      .filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getDouble(2)).toMap
    rows.foreach(r =>
      assert(r.getDouble(2) <= ivfBest(r.getLong(0)) + 1e-9))
    // and the composition still finds a usable share of the exact top-k
    val exact = Ann.embedTopK(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.25, s"IVF-PQ recall@10 collapsed: $recall")
  }

  test("partitioned IVF index: probes prune to the probed cells only") {
    // identical answers to the recomputed entry (same oracle SQL)
    val part = Ann.embedAnnIvfPartitioned(tables).collect().map(_.toSeq).toSeq
    val live = Ann.embedAnnIvf(tables).collect().map(_.toSeq).toSeq
    assert(part == live)
    // the 100 TB property: the index scan carries a dynamic-partition-
    // pruning filter from the broadcast probe side, so only probed cell
    // directories are read — never the whole index
    val plan = Ann.embedAnnIvfPartitioned(tables)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      plan.linesIterator.take(20).mkString("\n"))
  }

  test("residual IVF-PQ recall is at least raw-vector IVF-PQ recall") {
    val exact = Ann.embedTopK(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(rows: Array[org.apache.spark.sql.Row]) =
      (rows.map(r => (r.getLong(0), r.getLong(1))).toSet & exact).size
    val raw = recall(Ann.embedAnnIvfPq(tables).collect())
    val res = recall(Ann.embedAnnIvfPqResidual(tables).collect())
    // honest pin (see embedAnnIvfPqResidual scaladoc): this synthetic
    // corpus is isotropic, so cells explain no variance and residual
    // encoding CANNOT beat raw here (measured 36 vs 39) — assert the
    // machinery is sound (same ballpark, nonzero recall), not a win
    // the data cannot exhibit
    assert(res >= raw - 8, s"residual recall $res collapsed vs raw $raw")
    assert(res >= exact.size / 4, s"residual recall $res below floor")
  }

  test("IVF generations: drifted ingest re-centers into a new generation; old probes stable") {
    import spark.implicits._
    import graft.storage.IndexMaintenance
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_gen").toString
    // generation 0: the batch build under the sample quantizer
    val g0 = IndexMaintenance.publishGeneration(spark, root,
      Ann.ivfIndex(tables), Ann.ivfCentroidTable(tables))
    assert(g0 == 0L)
    def readIdx(n: Long) = spark.read
      .parquet(IndexMaintenance.indexPath(root, n))
      .select(col("vec_id"), col("v"), col("cid").cast("long").as("cid"))
    // drifted ingest: a tight 60-vector cluster around one direction the
    // sample centroids don't represent, cell-assigned against the gen-0
    // quantizer (IndexIngestStream's rule) and appended into gen 0
    val drifted = (0 until 60).map { i =>
      (100000L + i,
        Seq.tabulate(64)(j => (if (j < 4) 5.0 else 0.05) + 0.01 * ((i + j) % 7)))
    }.toDF("vec_id", "v")
    val cents0 = spark.read.parquet(IndexMaintenance.centsPath(root, 0))
    Ann.assignIndex(drifted, cents0)
      .write.mode("append").partitionBy("cid")
      .parquet(IndexMaintenance.indexPath(root, 0))
    // probes served off the RESOLVED gen-0 path, before any swap
    val before = Ann.probeIndexWith(tables, readIdx(0), cents0)
      .collect().map(_.toSeq).toSeq
    // re-center: fit over gen 0's vectors (corpus + drift), publish gen 1
    val allVecs = readIdx(0).select(col("vec_id"), col("v"))
    val q0 = Ann.quantizerQualityOf(allVecs, cents0)
      .collect().head.getDouble(0)
    val g1 = IndexMaintenance.recenter(spark, root)
    assert(g1 == 1L)
    assert(IndexMaintenance.currentGeneration(root).contains(1L))
    val cents1 = spark.read.parquet(IndexMaintenance.centsPath(root, 1))
    val q1 = Ann.quantizerQualityOf(allVecs, cents1)
      .collect().head.getDouble(0)
    assert(q1 > q0,
      s"re-centering did not improve quantization quality: $q1 vs $q0")
    // mid-swap stability: the old generation is untouched — a reader
    // that resolved gen 0 before the publish gets identical answers
    val after = Ann.probeIndexWith(tables, readIdx(0), cents0)
      .collect().map(_.toSeq).toSeq
    assert(after == before)
    // the new generation holds every vector, one file per cell
    assert(readIdx(1).count() == allVecs.count())
    assert(IndexMaintenance
      .filesPerCell(IndexMaintenance.indexPath(root, 1)).values.forall(_ == 1))
    // retirement keeps the newest generation only
    assert(IndexMaintenance.retireOld(root, keep = 1) == Seq(0L))
    assert(IndexMaintenance.committedGenerations(root) == Seq(1L))
  }

  test("IVF-PQ generations: quantizer and codes swap together; serving ≡ the batch entry") {
    import spark.implicits._
    import graft.storage.IndexMaintenance
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_ivfpq_gen").toString
    // gen 0 from the batch artifacts: serving off the generation must
    // reproduce embed_ann_ivf_pq_res BIT FOR BIT — same quantizer, same
    // codebook, codes re-derived through the same encode definition
    val g0 = IndexMaintenance.publishGenerationPq(spark, root,
      Ann.ivfIndex(tables), Ann.ivfCentroidTable(tables),
      Ann.pqResidualCodebook(tables))
    assert(g0 == 0L)
    val batch = Ann.embedAnnIvfPqResidual(tables).collect().map(_.toSeq).toSeq
    val served0 = Ann.probeIvfPqGeneration(tables, root).collect().map(_.toSeq).toSeq
    assert(served0 == batch, "generation serving drifted from the batch entry")
    // drifted ingest, assigned under the gen-0 quantizer and appended
    // (IndexIngestStream's layout). Arrivals have no codes yet — the PQ
    // serve path ignores them until the next re-center, by design.
    val drifted = (0 until 60).map { i =>
      (200000L + i,
        Seq.tabulate(64)(j => (if (j < 4) 5.0 else 0.05) + 0.01 * ((i + j) % 7)))
    }.toDF("vec_id", "v")
    val cents0 = spark.read.parquet(IndexMaintenance.centsPath(root, 0))
    Ann.assignIndex(drifted, cents0)
      .write.mode("append").partitionBy("cid")
      .parquet(IndexMaintenance.indexPath(root, 0))
    val allVecs = spark.read.parquet(IndexMaintenance.indexPath(root, 0))
      .select(col("vec_id"), col("v"))
    val q0 = Ann.quantizerQualityOf(allVecs, cents0).collect().head.getDouble(0)
    // re-center: quantizer refit AND codebook refit AND codes re-encoded
    val g1 = IndexMaintenance.recenterPq(spark, root)
    assert(g1 == 1L)
    assert(IndexMaintenance.currentPqGeneration(root).contains(1L))
    // mid-swap stability: a reader pinned to gen 0 is untouched
    val served0After = Ann.probeIvfPqGeneration(tables, root, gen = Some(0L))
      .collect().map(_.toSeq).toSeq
    assert(served0After == served0)
    // the new quantizer actually fits the drifted distribution better
    val cents1 = spark.read.parquet(IndexMaintenance.centsPath(root, 1))
    val q1 = Ann.quantizerQualityOf(allVecs, cents1).collect().head.getDouble(0)
    assert(q1 > q0, s"re-centering did not improve assignment quality: $q1 vs $q0")
    // the codebook was REFIT, not carried: gen-1 codewords differ
    val cb0 = spark.read.parquet(IndexMaintenance.pqBookPath(root, 0))
      .collect().map(_.toSeq).toSet
    val cb1df = spark.read.parquet(IndexMaintenance.pqBookPath(root, 1))
    val cb1 = cb1df.collect().map(_.toSeq).toSet
    assert(cb1 != cb0, "residual codebook was not refit with the quantizer")
    // THE swap-together pin: gen-1 stored codes ≡ encoding gen-1's own
    // residuals (index ⊗ gen-1 cents) through gen-1's codebook — no
    // stale-quantizer code can exist in a committed generation
    val idx1 = spark.read.parquet(IndexMaintenance.indexPath(root, 1))
      .select(col("vec_id"), col("v"), col("cid").cast("long").as("cid"))
    val res1 = idx1.join(broadcast(cents1), Seq("cid"))
      .select(col("vec_id"), expr("zip_with(v, cv, (a, b) -> a - b)").as("v"))
    val expected = Ann.pqEncodedWith(res1, cb1df)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val stored = spark.read.parquet(IndexMaintenance.pqCodesPath(root, 1))
      .select(col("vec_id"), col("s"), col("code"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(stored == expected, "gen-1 codes disagree with gen-1 quantizer+codebook")
    // gen-1 serving answers every query (drifted vectors now code-served)
    val served1 = Ann.probeIvfPqGeneration(tables, root)
    assert(served1.select("q_id").distinct().count() == Ann.NumQueries)
  }

  test("ivfFit: Lloyd refinement strictly improves quantization quality") {
    val sample = Ann.quantizerQuality(tables,
      Ann.ivfCentroidTable(tables)).collect().head.getDouble(0)
    val fitted = Ann.quantizerQuality(tables,
      Ann.ivfFit(tables, iters = 2)).collect().head.getDouble(0)
    assert(fitted > sample,
      s"fit did not improve mean assignment cosine: $fitted vs $sample")
    // the quantizer never loses cells: empty cells coalesce to their
    // previous centroid
    assert(Ann.ivfFit(tables, iters = 2).count() == Ann.IvfCentroids)
  }

  test("embed_ann_ivf index build collapses the centroid expansion map-side") {
    val plan = Ann.embedAnnIvf(tables).queryExecution.executedPlan.toString
    // partial aggregation must sit below the assignment shuffle: the
    // x-centroids expansion never crosses the wire
    assert(plan.contains("partial_max") || plan.contains("Partial"),
      plan.linesIterator.take(15).mkString("\n"))
    // probing stays a broadcast equi-join; the corpus never sort-merges
    assert(!plan.contains("SortMergeJoin"))
  }

  test("hamming-1 probing expands only the broadcast query side") {
    val plan = Ann.embedAnnMultiprobe(tables).queryExecution.executedPlan.toString
    // corpus still probed via broadcast hash join — probe fan-out must
    // never push the corpus into a shuffle
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  // Deterministic anisotropic corpus for the OPQ tests: dims 0–7 carry
  // scale 10+j (distinct, so the spectrum has 8 well-separated dominant
  // eigenvalues), dims 8–63 scale 1; values are integer-hash noise, so
  // dims are uncorrelated and eigenvectors are (near-)axis-aligned.
  // Under the POSITIONAL split all 8 dominant dims land in subspace 0 —
  // the exact misallocation OPQ's eigenvalue balancing undoes.
  private def anisotropicN(n: Int) = {
    import spark.implicits._
    Seq.tabulate(n) { i =>
      (i.toLong, Seq.tabulate(64) { j =>
        val scale = if (j < 8) 10.0 + j else 1.0
        scale * (((i * 2654435761L + j * 40503L) % 2001L) - 1000L) / 1000.0
      })
    }.toDF("vec_id", "v")
  }

  private def anisotropic = anisotropicN(300)

  // The recall-test variant: UNIT-NORMALIZED planted vectors with a
  // sharper spectrum. Normalization matters — the ADC shortlist ranks
  // by approximate DOT while ground truth is cosine, and on the raw
  // anisotropic data (norms spanning an order of magnitude) the exact
  // top-10 by dot and by cosine share ZERO entries, so "recall" there
  // measures norm noise, not quantization quality. Unit vectors make
  // dot ≡ cosine (like real embedding corpora) and the metric clean.
  private def anisotropicUnit(n: Int) = {
    import spark.implicits._
    Seq.tabulate(n) { i =>
      val raw = Array.tabulate(64) { j =>
        val scale = if (j < 8) 25.0 + 3 * j else 1.0
        scale * (((i * 2654435761L + j * 40503L) % 2001L) - 1000L) / 1000.0
      }
      val norm = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(_ / norm).toSeq)
    }.toDF("vec_id", "v")
  }

  test("OPQ rotation is orthonormal and dot-preserving") {
    import graft.ann.Opq
    val r = Opq.rotationFor(anisotropic, 64)
    assert(r.length == 64 && r.forall(_.length == 64))
    // R·Rᵀ = I: rows are an orthonormal basis (Jacobi columns)
    for (i <- 0 until 64; j <- i until 64) {
      val dot = (0 until 64).map(k => r(i)(k) * r(j)(k)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"R·Rᵀ[$i][$j] = $dot")
    }
    // and therefore dot-preserving — the property that lets the rotated
    // space serve the unchanged cosine/ADC machinery
    val rows = anisotropic.orderBy("vec_id").limit(2)
      .collect().map(_.getSeq[Double](1).toArray)
    def rot(x: Array[Double]) =
      r.map(row => row.zip(x).map { case (a, b) => a * b }.sum)
    val raw = rows(0).zip(rows(1)).map { case (a, b) => a * b }.sum
    val rotated = rot(rows(0)).zip(rot(rows(1))).map { case (a, b) => a * b }.sum
    assert(math.abs(raw - rotated) < 1e-6 * math.max(1.0, math.abs(raw)))
  }

  test("OPQ strictly reduces PQ quantization MSE on anisotropic data") {
    import graft.ann.Opq
    val mseIdentity = Opq.quantizationMse(anisotropic)
    val r = Opq.rotationFor(anisotropic, 64)
    val mseOpq = Opq.quantizationMse(Opq.rotate(anisotropic, r))
    // each subspace now quantizes one dominant direction instead of
    // subspace 0 eating all eight: a strict, large win
    assert(mseOpq < 0.95 * mseIdentity,
      s"OPQ MSE $mseOpq not below identity MSE $mseIdentity")
  }

  test("OPQ-PQ with identity rotation reproduces embed_ann_pq exactly") {
    import graft.ann.Opq
    val e = tables.embeddings
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding")
          .cast("array<double>").as("v"))
    val identity = Array.tabulate(64, 64)((i, j) => if (i == j) 1.0 else 0.0)
    val viaOpq = Opq.pqTopKWith(e, identity).collect().map(_.toSeq).toSeq
    val plain = Ann.embedAnnPq(tables).collect().map(_.toSeq).toSeq
    // same codebook sample, same encode criterion, same ADC tail — the
    // rotation is the ONLY degree of freedom, so identity must be a
    // bit-exact no-op (the rotate is a real matrix multiply: 1.0*x
    // sums over 63 exact zero terms, exact in IEEE)
    assert(viaOpq == plain)
  }

  test("fitted OPQ strictly beats identity-split PQ recall on anisotropic data") {
    import graft.ann.Opq
    // a corpus deep enough that the 50-deep shortlist can actually
    // miss (a 300-vector corpus is fully recovered by ANY shortlist +
    // exact re-rank, and both recalls saturate at 1.0)
    val planted = anisotropicUnit(2000)
    // ground truth: exact top-K per query, driver-side spec data
    val all = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val truth = (0L until Ann.NumQueries).map { q =>
      q -> all.keys.filter(_ >= Ann.NumQueries)
        .toSeq.sortBy(c => (-cos(all(q), all(c)), c)).take(Ann.K).toSet
    }.toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
      truth.map { case (q, ts) =>
        (ts intersect got.getOrElse(q, Set.empty)).size.toDouble / ts.size
      }.sum / truth.size
    }
    val identity = Array.tabulate(64, 64)((i, j) => if (i == j) 1.0 else 0.0)
    val idRecall = recall(Opq.pqTopKWith(planted, identity))
    val r = Opq.rotationFor(
      planted.filter(org.apache.spark.sql.functions.col("vec_id")
        >= Ann.NumQueries), 64)
    val opqRecall = recall(Opq.pqTopKWith(planted, r))
    // positional split sends all 8 dominant dims into subspace 0 — 16
    // codewords against an 8-D fat blob — while OPQ gives each
    // subspace one dominant direction: the shortlist quality gap must
    // show up as strictly better recall
    assert(opqRecall > idRecall,
      s"OPQ recall $opqRecall not above identity $idRecall")
  }

  test("embed_ann_opq_pq: full per-query output and a recall floor on the corpus") {
    import graft.ann.Opq
    val rows = Opq.embedAnnOpqPq(tables).collect()
    assert(rows.length == Ann.NumQueries * Ann.K)
    assert(rows.map(_.getLong(0)).distinct.length == Ann.NumQueries)
    // honest parity note (cf. the MSE test below): this corpus is
    // isotropic, so OPQ cannot WIN here — but it must not wreck the
    // shortlist either; hold it to the same floor embed_ann_pq clears
    val truth = Ann.embedTopK(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recall = truth.map { case (q, ts) =>
      (ts intersect got.getOrElse(q, Set.empty)).size.toDouble / ts.size
    }.sum / truth.size
    assert(recall >= 0.5, s"OPQ-PQ corpus recall $recall below floor")
  }

  test("OPQ does not hurt on the (isotropic) synthetic corpus") {
    import graft.ann.Opq
    // the honest no-win note (cf. residual IVF-PQ): this corpus is
    // isotropic by construction, so the spectrum is flat and rotation
    // can only shuffle equal-variance dims — parity expected, not a win
    val vecs = tables.embeddings
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding")
          .cast("array<double>").as("v"))
    val mseIdentity = Opq.quantizationMse(vecs)
    val r = Opq.rotationFor(vecs, 64)
    val mseOpq = Opq.quantizationMse(Opq.rotate(vecs, r))
    assert(mseOpq <= 1.10 * mseIdentity,
      s"OPQ regressed MSE on isotropic data: $mseOpq vs $mseIdentity")
  }

  test("embed_margin_mine ≡ an independent JVM model (bucket, top-2, margin rule)") {
    import graft.functions.Portable
    val rows = tables.embeddings
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val bits = Portable.bucketBits(rows.length.toLong,
      Ann.BucketBits, Ann.BucketBitsMax, Ann.BucketTarget)
    def bucket(v: Array[Double]): Int =
      (0 until Ann.BucketBitsMax).map(i =>
        if (v(i) > 0) 1 << (Ann.BucketBitsMax - 1 - i) else 0).sum >>
        (Ann.BucketBitsMax - bits)
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    def cos(a: Array[Double], b: Array[Double]) =
      graft.functions.Portable.round6Double(
        a.zip(b).map { case (x, y) => x * y }.sum / (norm(a) * norm(b)))
    val cands = rows.filter(_._2 % 2 == 1)
    val expect = rows.filter(_._2 % 2 == 0).flatMap { case (aId, _, av) =>
      val inBucket = cands.filter(c => bucket(c._3) == bucket(av))
        .map(c => (cos(av, c._3), c._1))
        .sortBy { case (s, id) => (-s, id) }
      inBucket.headOption.flatMap { case (c1, b1) =>
        val c2 = inBucket.drop(1).headOption.map(_._1).getOrElse(-1.0)
        val margin = c1 - c2
        if (c1 >= Ann.MarginCosMin && margin >= Ann.MarginMin)
          Some(aId -> ((b1, c1, margin)))
        else None
      }
    }.toMap
    val got = Ann.embedMarginMine(tables).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == expect, s"margin mine diverged from the model")
    assert(got.values.forall { case (_, c, m) =>
      c >= Ann.MarginCosMin && m >= Ann.MarginMin })
  }

  test("contrastive_pairs: positives same-label top-1, hard negatives cross-label top-k — ≡ the JVM model") {
    import graft.functions.Portable
    val rows = tables.embeddings
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val bits = Portable.bucketBits(rows.length.toLong,
      Ann.BucketBits, Ann.BucketBitsMax, Ann.BucketTarget)
    def bucket(v: Array[Double]): Int =
      (0 until Ann.BucketBitsMax).map(i =>
        if (v(i) > 0) 1 << (Ann.BucketBitsMax - 1 - i) else 0).sum >>
        (Ann.BucketBitsMax - bits)
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    def cos(a: Array[Double], b: Array[Double]) =
      Portable.round6Double(
        a.zip(b).map { case (x, y) => x * y }.sum / (norm(a) * norm(b)))
    val expect = rows.flatMap { case (aId, aLab, av) =>
      val mates = rows.filter(r => r._1 != aId && bucket(r._3) == bucket(av))
        .map(r => (cos(av, r._3), r._1, r._2))
        .sortBy { case (s, id, _) => (-s, id) }
      val pos = mates.filter(_._3 == aLab).take(1).zipWithIndex
        .map { case ((s, id, _), i) => (aId, "pos", i + 1, id, s) }
      val neg = mates.filter(_._3 != aLab).take(Ann.ContrastiveNegK)
        .zipWithIndex
        .map { case ((s, id, _), i) => (aId, "neg", i + 1, id, s) }
      pos ++ neg
    }.toSet
    val got = Ann.contrastivePairs(tables).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == expect, "pair set must equal the JVM model")
    // every anchor's negative really is cross-label and its positive
    // really shares the label
    val labels = rows.map(r => r._1 -> r._2).toMap
    got.foreach { case (a, role, _, b, _) =>
      if (role == "pos") assert(labels(a) == labels(b))
      else assert(labels(a) != labels(b))
    }
  }

  test("ann_recall_report ≡ an independent set-intersection recount; complete query panel") {
    val report = Ann.annRecallReport(tables).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Ann.embedTopK(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }
    val ivf = Ann.embedAnnIvf(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }
    assert(report.keySet == exact.keySet, "one row per query vector")
    report.foreach { case (q, (hits, rec6)) =>
      val expHits = (exact(q) & ivf.getOrElse(q, Set.empty)).size.toLong
      assert(hits == expHits, s"q $q: $hits vs recount $expHits")
      assert(rec6 == graft.functions.Portable.round6Double(
        hits.toDouble / Ann.K))
    }
    // the panel is useful: some recall below perfect OR all perfect —
    // either way the values are in range and nonempty
    assert(report.nonEmpty &&
      report.values.forall { case (h, r) =>
        h >= 0L && h <= Ann.K && r >= 0.0 && r <= 1.0 })
  }

  test("embed_ann_lsh never beats brute force and shares its top hit when buckets agree") {
    val exact = Ann.embedTopK(tables).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val approx = Ann.embedAnnLsh(tables).collect()
    // every LSH hit scores <= the exact top hit for that query
    approx.foreach { r =>
      val best = exact((r.getLong(0), 1))._2
      assert(r.getDouble(2) <= best + 1e-9)
    }
    assert(approx.nonEmpty)
  }
}
