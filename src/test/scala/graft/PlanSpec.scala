package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Plans must stay scale-shaped: dims broadcast, filters pushed to the
  * scan, aggregation partial. These assertions pin the physical plan so
  * a regression (e.g. a broadcast silently becoming a sort-merge join)
  * fails the build, not the 100 TB run.
  */
class PlanSpec extends SparkSpec {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("q1 pushes the shipdate filter into the parquet scan") {
    val plan = physical(Relational.q1Pricing(tables))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushdown:\n$plan")
  }

  test("q1 prunes to the 8 referenced lineitem columns") {
    val plan = physical(Relational.q1Pricing(tables))
    assert(!plan.contains("l_orderkey"), "scan reads unreferenced columns")
  }

  test("q3/q5/blacklist join dims via broadcast") {
    // Fact-fact joins (lineitem ⋈ orders) MAY shuffle — that is the
    // correct 100 TB shape. What is pinned: dims join via broadcast and
    // no *forced* fact broadcast (no hint on orders in the logical plan).
    for (df <- Seq(Relational.q3Shipping(tables),
      Relational.q5RegionRollup(tables),
      Relational.blacklistFilter(tables))) {
      val plan = physical(df)
      assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    }
  }

  test("q3/q5 carry no broadcast hint on the orders fact table") {
    for (df <- Seq(Relational.q3Shipping(tables),
      Relational.q5RegionRollup(tables))) {
      val hinted = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
      assert(hinted.nonEmpty, "expected dim broadcast hints")
      assert(!hinted.exists(_.toString.contains("o_orderkey")),
        s"orders (a fact) must not be hint-broadcast:\n${hinted.mkString("\n")}")
    }
  }

  test("blacklist is a single anti join (no post-filter pass)") {
    val plan = physical(Relational.blacklistFilter(tables))
    assert(plan.contains("LeftAnti"), plan)
  }

  test("wordcount aggregates partially (map-side) before the shuffle") {
    val plan = physical(WordCounts.wordCount(tables))
    // two HashAggregate levels around one shuffle
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("windowed queries stay in whole-stage codegen") {
    val df = Windows.slidingCounts(tables)
    df.collect() // AQE finalizes the plan (codegen spans) on execution
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark whole-stage-codegen spans; the explode,
    // window assignment and partial agg must share one span.
    assert(plan.contains("*(1) HashAggregate"), plan)
    assert(plan.contains("*(1) Generate explode"), plan)
  }

  test("top3 rank runs over pre-aggregated counts, not raw events") {
    val opt = optimized(Relational.top3PerCategory(tables))
    // Aggregate below the Window in the optimized plan
    val aggIdx = opt.indexOf("Aggregate")
    val winIdx = opt.indexOf("Window")
    assert(aggIdx > winIdx && winIdx >= 0, opt)
  }

  test("dedup document scans prune to doc_id + text") {
    for (df <- Seq(graft.dedup.Dedup.dedupMinhash(tables),
      graft.dedup.Dedup.dedupSimhash(tables),
      graft.textanalysis.TextAnalysis.docFingerprint(tables),
      graft.textanalysis.TextAnalysis.lmBigramScore(tables))) {
      val plan = physical(df)
      // lang/source/n_chars must not reach the scan
      assert(!plan.contains("ReadSchema: struct<doc_id:bigint,text:string,lang"),
        "scan reads unreferenced columns")
      assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
        plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
    }
  }

  test("ann corpus is never shuffled before scoring") {
    // brute force: corpus side feeds a broadcast join directly — the only
    // exchanges are the tiny broadcast and the post-rank orderBy range
    val plan = physical(graft.ann.Ann.embedTopK(tables))
    val shuffles = "Exchange (hash|range)partitioning".r.findAllIn(plan).toList
    assert(shuffles.count(_.contains("hash")) <= 1, plan) // rank shuffle only
  }

  test("ann lsh probes via broadcast bucket join — corpus side unshuffled") {
    val plan = physical(graft.ann.Ann.embedAnnLsh(tables))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("word_count_salted is a genuine two-phase aggregation over (word, salt)") {
    val plan = physical(WordCounts.wordCountSalted(tables))
    // phase 1 shuffles on (word, _salt) — the hot-key spread — phase 2 on word
    assert(plan.contains("Exchange hashpartitioning(word"), plan)
    assert(plan.contains("_salt"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges >= 2, s"expected both aggregation phases to shuffle:\n$plan")
  }

  test("top_ngrams global rank pre-truncates to top-k before the single-partition window") {
    // rank <= k over a GLOBAL window is only scale-safe if upstream tasks
    // pre-truncate: Catalyst rewrites the rank filter into
    // TakeOrderedAndProject(limit=k) below the Window (each task keeps a
    // local top-k heap, the driver merges k rows), so the final
    // single-partition WindowExec sees exactly k rows — never the full
    // distinct-shingle universe. Accept the WindowGroupLimit form too
    // (what Spark emits for PARTITIONed rank limits).
    val plan = physical(graft.textanalysis.TextAnalysis.topNgrams(tables))
    val winIdx = plan.indexOf("Window [row_number")
    val limIdx = plan.indexOf("TakeOrderedAndProject(limit=20")
    val safe = (limIdx > winIdx && winIdx >= 0) || plan.contains("WindowGroupLimit")
    assert(safe, s"window input is not pre-truncated:\n$plan")
  }

  test("no LLM-pipeline plan collects or nests loops over the corpus") {
    for (df <- Seq(graft.dedup.Dedup.dedupNgramJaccard(tables),
      graft.dedup.Dedup.dedupEmbedding(tables),
      graft.ann.Ann.embedAnnLsh(tables),
      graft.textanalysis.TextAnalysis.qualityScore(tables))) {
      val plan = physical(df)
      assert(!plan.contains("CartesianProduct"), plan)
    }
  }

  test("dedup_embedding_mt band join carries ids only — vectors fetched after the distinct") {
    // the (tbl, bucket) candidate self-join must move 3 ints per row;
    // an embedding array riding through it multiplies the dominant
    // shuffle by the vector width (the scaladoc's 100 TB claim)
    val df = graft.dedup.Dedup.dedupEmbeddingMultitable(tables)
    val bandJoins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.exists(_.toString.contains("bucket")) => j
    }
    assert(bandJoins.nonEmpty, "expected the (tbl, bucket) candidate self-join")
    for (j <- bandJoins; side <- Seq(j.left, j.right))
      assert(side.output.forall(a =>
        !a.dataType.typeName.startsWith("array")),
        s"an array column travels through the band join: ${side.output}")
  }

  test("embed_ann_ivf_pq_res probes via broadcast — corpus never shuffled by the probe") {
    val plan = physical(graft.ann.Ann.embedAnnIvfPqResidual(tables))
    // probes and LUT are broadcast; the only legitimate shuffle joins
    // are corpus-side (vec_id, vec_id) equi-joins (index ⋈ codes,
    // shortlist ⋈ re-rank vectors) — a sort-merge on cid or on the
    // (q_id, s, code) LUT keys would mean the probe side shuffled the
    // corpus, the property this test pins
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 2, s"probe/LUT joins not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    val smjKeyed = "SortMergeJoin \\[([a-z_]+)".r.findAllMatchIn(plan)
      .map(_.group(1)).toSet
    assert(smjKeyed.subsetOf(Set("vec_id")),
      s"non-corpus join degraded to sort-merge on $smjKeyed:\n$plan")
  }

  test("rebucket delta joins both boundary tables via broadcast — one score-store scan, no wide shuffle") {
    val bounds = graft.pipeline.Mixing.ccnetBounds(tables)
    val plan = physical(
      graft.pipeline.Mixing.rebucketDeltaBounds(tables, bounds, bounds))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 2, s"boundary tables not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a langs-wide boundary table degraded to sort-merge:\n$plan")
    // the corpus-side score store is scanned exactly once: the whole
    // sweep is scan → two broadcast joins → map-side neq filter → sort
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans <= 1, s"score store scanned $scans times:\n$plan")
  }

  test("corpus_admit composes unsorted gates — one Sort in the ANALYZED plan, no EliminateSorts reliance") {
    // ADVICE r9: the composite used the sorted public gate entries and
    // relied on Catalyst's EliminateSorts to drop their mid-plan global
    // sorts. The guarantee must be structural: the pre-optimizer
    // (analyzed) plan — where no optimizer rule has fired — carries
    // exactly ONE Sort node, the composite's own output orderBy.
    import org.apache.spark.sql.catalyst.plans.logical.Sort
    for (df <- Seq(graft.pipeline.Intake.corpusAdmit(tables),
      graft.pipeline.Intake.corpusAdmitVerdicts(tables))) {
      val sorts = df.queryExecution.analyzed.collect { case s: Sort => s }
      assert(sorts.length == 1,
        s"expected exactly the output Sort pre-optimization, got " +
          s"${sorts.length}:\n${df.queryExecution.analyzed.treeString}")
    }
  }

  test("dedup_clusters final plan reads checkpointed labels — no edge re-derivation") {
    // the convergence loop's output must source from the last round's
    // localCheckpoint: if the final frame re-derived the verified-pair
    // edges, every downstream consumer would pay the full LSH pipeline
    // again and the loop's O(log diameter) rounds were wasted
    val plan = physical(graft.dedup.Dedup.nearDupClusters(tables))
    assert(plan.contains("ExistingRDD"),
      s"final cluster plan does not read the checkpointed labels:\n$plan")
    assert(!plan.contains("parquet"),
      s"final cluster plan re-scans source tables:\n$plan")
  }
}
