package graft

/** Regenerates PLANS.md: curated `.explain("formatted")` output for the
  * headline queries, so the scale-relevant plan properties (pushdown,
  * broadcast, partial aggregation, bucket/partition pruning) are
  * reviewable without running Spark. The same properties are pinned by
  * PlanSpec/AnnSpec/DedupSpec/BucketingSpec — this file is the
  * human-readable evidence, the specs are the regression gate.
  *
  * Usage: `sbt 'runMain graft.PlanDump [sfDir]'` (writes PLANS.md in
  * cwd). `sfDir` defaults to the driver's sf0.001 testdata; pass the
  * data dir explicitly on any other machine/layout.
  */
object PlanDump {

  private val Notes: Seq[(String, String, Tables => org.apache.spark.sql.DataFrame)] = Seq(
    ("q1_pricing",
      "Filter reaches the scan (PushedFilters) and only the 8 referenced " +
        "columns are read (ReadSchema); aggregation is two-phase " +
        "(partial_ before the Exchange).",
      graft.operators.Relational.q1Pricing),
    ("q3_bucketed",
      "Fact-fact join over tables written bucketed+sorted by the order " +
        "key: SortMergeJoin with NO Exchange on either side — the " +
        "shuffle was paid once at write.",
      graft.storage.Bucketing.q3Bucketed),
    ("word_count_salted",
      "Two-phase aggregation over (word, salt): hot keys spread across " +
        "tasks in phase 1, final combine in phase 2 — both Exchanges " +
        "visible, both preceded by partial aggregation.",
      graft.operators.WordCounts.wordCountSalted),
    ("dedup_ngram_jaccard_bucketed",
      "Exact shingle-Jaccard over the shingle store bucketed by `s`: " +
        "the doc-freq cap aggregation, the rare-shingle semi-join and " +
        "the posting-list self-join all cluster on the bucket key — " +
        "NO Exchange keyed on s anywhere; the only shuffles left key " +
        "on docs/pairs, whose keys genuinely differ from storage.",
      graft.dedup.Dedup.dedupNgramJaccardBucketed),
    ("dedup_minhash_verified_mat",
      "The production near-dup pipeline over the materialized shingle " +
        "store: no scan of documents.parquet anywhere — every shingle " +
        "consumer reads the columnar graft_shingles_* table; all joins " +
        "are id/band-key equi-joins, no cartesian products.",
      graft.dedup.Dedup.dedupMinhashVerifiedMat),
    ("dedup_minhash_verified_salted",
      "THE production verify path at scale (beats the unsalted twin " +
        "7.9s vs 14.0s at sf1): star-routed flood keepers are " +
        "STRUCTURAL whales — degree = flood size — and their verify " +
        "join fan-out lands in one task, inside-the-task, where AQE " +
        "skew-split cannot reach. The whale list (tiny by construction) " +
        "joins via BroadcastHashJoin on BOTH the shingle and pair " +
        "sides; whale shingle rows are replicated exactly salts times, " +
        "non-whales once, and each pair probes the single salt chosen " +
        "by hashing its partner id. DedupSpec pins rows identical to " +
        "the unsalted plan, the salts-times replication factor, and " +
        "the broadcast routing.",
      graft.dedup.Dedup.dedupMinhashVerifiedSalted),
    ("embed_ann_ivf_part",
      "Probing the persisted cell-partitioned IVF index: the scan's " +
        "PartitionFilters carry dynamicpruningexpression(cid IN ...) — " +
        "only the probed ~nprobe/centroids cell directories are read.",
      graft.ann.Ann.embedAnnIvfPartitioned),
    ("embed_ann_ivf_pq",
      "IVF probe bounds WHICH vectors are scanned; PQ codes compress " +
        "WHAT the scan reads. Probe sides broadcast; the ADC pivot sum " +
        "is a partial aggregation; the shortlist rank is a " +
        "WindowGroupLimit.",
      graft.ann.Ann.embedAnnIvfPq),
    ("embed_ann_ivf_pq_res",
      "Residual IVF-PQ serving plan: every probe-side join is a " +
        "BroadcastHashJoin (the corpus/code side is never shuffled by " +
        "the probe), the LUT-decomposed ADC distance is a two-phase " +
        "aggregation, and the shortlist rank pre-truncates via " +
        "WindowGroupLimit. PlanSpec pins the broadcast-probe property.",
      graft.ann.Ann.embedAnnIvfPqResidual),
    ("dedup_embedding_mt",
      "Multi-table OR-amplified embedding dedup: the (tbl, bucket) " +
        "candidate self-join carries ONLY (vec_id, tbl, bucket) — no " +
        "embedding array travels through the band join; vectors are " +
        "fetched by id AFTER the distinct. PlanSpec pins the ids-only " +
        "property on the join inputs.",
      graft.dedup.Dedup.dedupEmbeddingMultitable),
    ("dedup_clusters",
      "The FINAL plan after pointer-jumping label propagation " +
        "converges: labels read from the last round's localCheckpoint " +
        "(Scan ExistingRDD) — no re-derivation of the edge list, no " +
        "documents scan; the loop itself ran two equi-joins per round " +
        "with scalar-only driver actions (convergence counts). " +
        "PlanSpec pins the checkpoint-sourced final plan.",
      graft.dedup.Dedup.nearDupClusters),
    ("dedup_decontaminate",
      "Train/test leakage check: the eval/train slices are filters " +
        "over the shingle store joined to a 2-column documents " +
        "projection; the cross-slice posting join keys on the capped " +
        "shingle string, so per-shingle fan-out is bounded and the " +
        "tiny eval side probes the train index.",
      graft.dedup.Dedup.dedupDecontaminate),
    ("corpus_sample_stratified",
      "Identity-hashed stratified sampling: the keep decision is a " +
        "map-side projection + filter over a 3-column scan — the ONLY " +
        "exchange in the plan is the output sort. At 100 TB this is " +
        "one pass, no shuffle, stable under corpus growth.",
      graft.pipeline.Mixing.sampleStratified),
    ("event_asof_join",
      "The as-of join as union-and-carry: ONE hash Exchange on " +
        "user_id feeds a single running-last Window — no range join " +
        "(|probe| x |refs-in-range| expansion) and no pre-collapse " +
        "shuffle; same-second ties resolve inside the carry order. " +
        "SequencesSpec pins the single-Exchange property.",
      graft.operators.Sequences.eventAsofJoin),
    ("corpus_sample_quota",
      "Exactly-min(Q, n_l) per language via the PUBLISHED membership " +
        "rule (lang, thr, cutoff): one BroadcastHashJoin + a map-side " +
        "filter over a 3-column scan — the corpus is never sorted, " +
        "never window-ranked; the OrderStat threshold search paid " +
        "O(log n) scans once, outside this plan. PipelineSpec pins " +
        "result ≡ the naive per-language rank.",
      graft.pipeline.Mixing.sampleQuota),
    ("event_top_paths",
      "Sequence mining without blowup: two leads share ONE per-user " +
        "Window (one hash Exchange + sort), the count key space is " +
        "bounded by |types|^3, and the cut is TakeOrderedAndProject — " +
        "partial top-k in every task, never a global sort. " +
        "SequencesSpec pins both properties.",
      graft.operators.Sequences.eventTopPaths),
    ("q16_supplier_diversity",
      "Distinct-first discipline: the fact collapses to its DISTINCT " +
        "(partkey, suppkey) link set before ANY join (one shuffle of " +
        "pre-combined partials); the excluded-supplier list rides a " +
        "BroadcastHashJoin LeftAnti; the filter-pruned part dim " +
        "broadcasts; count(DISTINCT) runs two-phase over the already-" +
        "distinct link keys. RelationalSpec pins anti-broadcast and " +
        "no SMJ.",
      graft.operators.Relational.q16SupplierDiversity),
    ("corpus_pack_delta",
      "Append-only packing: the shipped corpus appears ONLY as a " +
        "16-row per-shard token-total aggregate — partial-combined " +
        "before its Exchange, so the shuffle carries ~16 rows per " +
        "task, then broadcast back; the distributed-prefix machinery " +
        "(histogram -> driver offsets -> (shard,bucket) Window) runs " +
        "over the DELTA alone. ExportSpec walks every shard's cursor " +
        "gap-free from the shipped totals.",
      graft.pipeline.Export.corpusPackDelta),
    ("event_asof_join_native",
      "The as-of join as a NATIVE operator (AsofJoinNode -> " +
        "AsofJoinStrategy -> AsofJoinExec via injectPlannerStrategy): " +
        "each side shuffles ONCE on user_id, EnsureRequirements " +
        "inserts the spill-able (user, ts, id) partition sorts, and " +
        "the operator itself is a per-partition two-pointer merge " +
        "carrying three longs — no union materialization, no " +
        "WindowExec. Same oracle as the composed form; 22% faster at " +
        "sf0.1. SequencesSpec pins AsofJoinExec + no Window/Union + " +
        "exactly 2 user_id exchanges.",
      graft.operators.Sequences.eventAsofJoinNative),
    ("event_interval_join",
      "The range join rewritten as an equi-join: both sides key on " +
        "(user_id, floor(ts/W)), clicks explode to exactly 2 buckets " +
        "(fixed fan-out), the time range is a residual filter on the " +
        "join — no BroadcastNestedLoopJoin, no per-user cross " +
        "product; whale users split across their time buckets. " +
        "SequencesSpec pins the equi-join keys and cross-checks a " +
        "naive range-join formulation.",
      graft.operators.Sequences.eventIntervalJoin),
    ("q21_sole_blame",
      "The exists/not-exists self-join pair of TPC-H Q21 collapsed " +
        "to ONE aggregation pass over the fact: two predicate-" +
        "filtered COUNT(DISTINCT)s + a MIN recover the sole offender " +
        "per order — no second lineitem scan, no self-join; the " +
        "supplier dim broadcasts onto the per-supplier counts.",
      graft.operators.RelationalTpch2.q21SoleBlame),
    ("report_mix_rollup",
      "GROUPING SETS surface: rollup(source, lang) compiles to a " +
        "single Expand (3 grouping sets) over ONE corpus scan; all " +
        "aggregates are algebraic so partials collapse map-side " +
        "BEFORE the Expanded shuffle. ReportsSpec pins 1 Expand + " +
        "1 FileScan.",
      graft.pipeline.Reports.mixRollup),
    ("sketch_kmv",
      "KMV source sketches via two-phase salted top-k: the distinct " +
        "(source, hv) shuffle carries map-side partials, phase-1 " +
        "row_number partitions on (source, hv % 32) so no task sorts " +
        "a whole source's distinct set, phase 2 ranks the <= 32k " +
        "survivors per source. Output |sources|*k rows — mail-size, " +
        "mergeable; SketchesSpec pins sketch ≡ direct global sort.",
      graft.operators.Sketches.kmvSketch),
    ("event_rollup_incremental",
      "The lambda merge: history reads the materialized " +
        "graft_rollup_base store (<= days*|types| rows) while the " +
        "fact scan carries the LITERAL 7-day bound in PushedFilters " +
        "on raw ts — at 100 TB the same literal prunes date " +
        "partitions, so the nightly cost is one week of data + a " +
        "store read. MaintenanceSpec pins both plan properties and " +
        "union ≡ the full one-pass aggregation bit-for-bit.",
      graft.pipeline.Maintenance.eventRollupIncremental),
    ("layout_zorder_stats",
      "Z-order zone maps: range scalars come from a one-row " +
        "aggregate broadcast back (BroadcastNestedLoopJoin of one " +
        "row — never a shuffle of the fact), the Morton address is " +
        "pure shift/mask projection inside WholeStageCodegen, and " +
        "the zone-map aggregation is two-phase down to 16 shards. " +
        "LayoutSpec pins every bound against a JVM Morton recompute.",
      graft.operators.Layout.zorderStats),
    ("quality_classify",
      "The distilled gate: stored IRLS weights inlined as literals " +
        "into a map-side fixed-order score over the count " +
        "aggregation — no joins, no bigram tables; the expensive " +
        "teacher ran once at fit time, outside this plan.",
      graft.textanalysis.QualityModel.qualityClassify),
    ("token_count_bpe",
      "BPE pricing at vocabulary cost: the M-chained merge-fold HOF " +
        "runs once per DISTINCT word (the small side, broadcast " +
        "back); per-occurrence cost collapses to a join + integer " +
        "multiply. 14.6s -> 1.21s at sf0.1 when re-pointed from " +
        "occurrences to vocab (BENCH_NOTES).",
      graft.functions.Bpe.tokenCountBpe),
    ("event_stats_bounded",
      "Exact discrete quantiles with NO Window and NO percentile " +
        "aggregate anywhere in the plan (both pinned): the OrderStat " +
        "histogram search ran outside as driver scalars, broadcast " +
        "back as a literal quantile table joined to the shared " +
        "count/mean/min/max aggregation.",
      graft.operators.Windows.eventStatsBounded),
    ("event_gapfill",
      "Calendar gap-fill with exactly ONE fact scan (pinned): the " +
        "span/type scalars were a bounded driver collect, the spine " +
        "is a literal LocalTableScan, and the calendar-sized left " +
        "join is a BroadcastHashJoin — Catalyst would otherwise " +
        "re-expand shared subtrees into three pruned fact scans.",
      graft.operators.Timeline.eventGapfill),
    ("corpus_refresh_merge_bucketed",
      "MERGE-INTO over pre-bucketed sides: the full-outer equi-join " +
        "runs as SortMergeJoin with NO Exchange on either side — the " +
        "doc_id shuffle was paid once at landing (inventory-keyed " +
        "bucketed tables), so the nightly merge is shuffle-free. " +
        "MaintenanceSpec pins zero exchanges and value-identity to " +
        "the shuffled twin.",
      graft.pipeline.Maintenance.corpusRefreshMergeBucketed),
    ("corpus_sample_priority",
      "Weighted exactly-N sampling (DLT priority sampling) with no " +
        "corpus sort: the membership rule is two literal scalars in a " +
        "map-side filter over a 4-column scan; the OrderStat " +
        "threshold search paid its O(log n) scans once, outside this " +
        "plan, with the estimator's tau riding the same batch.",
      graft.pipeline.Mixing.samplePriority),
    ("plan_join_decisions",
      "The cost-based join advisor prices every candidate from the " +
        "two persisted ANALYZE stores: its own plan is PURE LITERALS " +
        "— no FileScan anywhere (spec-pinned); the only Exchange is " +
        "the 6-row output sort. At 100 TB this is the entire point: " +
        "strategy decisions from metadata, never from touching the " +
        "data.",
      graft.pipeline.Planner.joinDecisions),
    ("corpus_interleave",
      "Round-robin source interleaving via the distributed-prefix " +
        "rank: ONE Window partitioned on (source, bkt) — 1024 " +
        "balanced groups per source, never a whale-source-sized sort " +
        "task — with the offset and index tables broadcast.",
      graft.pipeline.Export.corpusInterleave),
    ("report_event_freshness",
      "Per-type lag percentiles with NO Window and no per-type sort: " +
        "the plan is the one multiplicity aggregation (map-side " +
        "partial) — the 3x|types| rank targets resolved in the " +
        "grouped OrderStat narrowing OUTSIDE this plan, against the " +
        "persisted frame.",
      graft.pipeline.Reports.eventFreshness),

    ("corpus_clean_substring",
      "The keeper election and the cut set both read the " +
        "graft_substr_wins window store (r16) — documents.parquet " +
        "appears ONCE, in the text-rebuild join only; the corpus " +
        "tokenize+md5 pass was paid at store build, not here.",
      t => graft.dedup.Substring.cleanSubstring(t)),

    ("doc_chunks",
      "Fixed-grid chunking is ONE per-row HOF projection + generate — " +
        "zero Exchange anywhere in the plan; output is linear in " +
        "corpus tokens and the token array is let-bound once per row " +
        "(no per-chunk re-split).",
      graft.pipeline.Chunking.docChunks),

    ("plan_join_order",
      "The join-order advisor prices both association orders from " +
        "the key-stats store: no FileScan in the plan — at 100 TB " +
        "the decision that picks the smaller intermediate must not " +
        "cost a scan.",
      graft.pipeline.Planner.joinOrderDecisions))

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, args.headOption.getOrElse("/root/testdata/sf0.001"))
    val sb = new StringBuilder
    sb ++= "# PLANS — headline physical plans (generated by graft.PlanDump)\n\n"
    sb ++= "Formatted `.explain` output at sf0.001; the properties called\n"
    sb ++= "out per query are pinned by the spec suite (PlanSpec, AnnSpec,\n"
    sb ++= "DedupSpec, BucketingSpec), so plan regressions fail `sbt test`.\n"
    for ((name, note, fn) <- Notes) {
      sb ++= s"\n## $name\n\n$note\n\n```\n"
      sb ++= fn(t).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb ++= "```\n"
    }
    java.nio.file.Files.writeString(
      java.nio.file.Path.of("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${sb.length} chars)")
    spark.stop()
  }
}
