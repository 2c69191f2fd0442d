package graft

import graft.dedup.Dedup
import graft.pipeline.Reports
import org.apache.spark.sql.DataFrame

/** Corpus-audit reports: value checks on planted corpora plus plan
  * pins that keep each report corpus-shuffle-free (the whole point of
  * a nightly report is that it reads the corpus once and shuffles only
  * report-sized rows).
  */
class ReportsSpec extends SparkSpec {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_reports").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("stats_by_source: planted dup fractions and language spreads") {
    val dir = writeDocs(Seq(
      // source a: 3 docs, 2 distinct texts, 2 langs
      (1L, "alpha beta", "en", "a"),
      (2L, "alpha beta", "en", "a"),
      (3L, "gamma", "fr", "a"),
      // source b: no dups, 1 lang
      (4L, "delta", "en", "b"),
      (5L, "epsilon zeta", "en", "b")))
    val rows = Reports.statsBySource(Tables(spark, dir)).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    val a = rows(0)
    assert(a.getLong(1) == 3L, "a.n_docs")
    assert(a.getLong(2) == 2L, "a.n_langs")
    assert(a.getLong(3) == ("alpha beta".length * 2 + "gamma".length).toLong)
    assert(math.abs(a.getDouble(5) - (1.0 - 2.0 / 3.0)) < 1e-6, "a.dup_frac")
    val b = rows(1)
    assert(b.getLong(1) == 2L && b.getLong(2) == 1L)
    assert(b.getDouble(5) == 0.0, "b.dup_frac")
  }

  test("stats_by_source: the distinct-count Expand runs over reduced rows, not the scan") {
    // The 3x Expand (two COUNT DISTINCTs) must sit ABOVE the
    // (source, lang, h) pre-aggregation: expanding the raw corpus scan
    // would triple the 100 TB pass. Plan strings print top-down, so
    // the Expand line must come before (= downstream of) the partial
    // aggregate keyed on the text hash.
    val plan = physical(Reports.statsBySource(tables))
    val expand = plan.indexOf("Expand")
    // the pre-aggregate is the HashAggregate keyed on the md5 text
    // hash; the distinct-agg stages above the Expand key on source
    // (and gid) only, so "keys=[...md5..." identifies it uniquely
    val preAgg = plan.indexOf("md5")
    assert(expand >= 0, s"no Expand in:\n$plan")
    assert(preAgg >= 0, s"no md5 pre-aggregate key in:\n$plan")
    assert(expand < preAgg,
      s"Expand sits below the pre-aggregate (expands the corpus scan):\n$plan")
  }

  test("dup_matrix: shared classes off-diagonal, within-source dup classes on the diagonal") {
    val dir = writeDocs(Seq(
      (1L, "shared one", "en", "a"),
      (2L, "shared one", "en", "b"),  // class in a AND b → (a,b)
      (3L, "shared one", "en", "b"),  // extra copy in b → also (b,b)
      (4L, "only a dup", "en", "a"),
      (5L, "only a dup", "en", "a"),  // within-a dup → (a,a)
      (6L, "unique", "fr", "c"),      // no cell
      (7L, "tri", "en", "a"),
      (8L, "tri", "en", "b"),
      (9L, "tri", "en", "c")))        // class in a,b,c → (a,b),(a,c),(b,c)
    val got = Reports.sourceDupMatrix(Tables(spark, dir)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("a", "a") -> 1L, ("a", "b") -> 2L, ("a", "c") -> 1L,
      ("b", "b") -> 1L, ("b", "c") -> 1L))
  }

  test("neardup_matrix: cells = verified pairs bucketed by unordered source pair") {
    val t = tables
    val pairs = Dedup.dedupMinhashVerifiedMat(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val src = t.documents.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = pairs
      .map { case (a, b) =>
        val (sa, sb) = (src(a), src(b))
        (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Reports.sourceNearDupMatrix(t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    assert(got.values.sum == pairs.length.toLong, "cells must partition the pair list")
    assert(got.nonEmpty, "sf0.001 plants near-dups; matrix must be non-empty")
  }

  test("neardup_matrix: source lookups broadcast the pair side and prune the corpus scan") {
    val plan = physical(Reports.sourceNearDupMatrix(tables))
    // both lookup joins broadcast (pair side is report-sized; the
    // corpus side must never shuffle for a report)
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 2, s"source lookups not broadcast:\n$plan")
    // and the lookup scans read exactly (doc_id, source)
    assert(plan.contains("struct<doc_id:bigint,source:string>"),
      s"source-lookup scan reads more than (doc_id, source):\n$plan")
  }

  test("shard_manifest: shards partition the corpus, deterministically") {
    val t = tables
    val rows = Reports.shardManifest(t).collect()
    val total = t.documents.count()
    assert(rows.map(_.getLong(1)).sum == total, "shards must partition the corpus")
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) < Reports.NumShards))
    assert(rows.forall(r => r.getLong(3) <= r.getLong(4)), "min_doc <= max_doc")
    // deterministic: a repartitioned input yields the identical manifest
    val again = Reports.shardManifest(t).collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("token_histogram: integer log2 buckets land power-of-two counts exactly") {
    // 1, 2, 3, 4, 7, 8 tokens: buckets 0, 1, 1, 2, 2, 3 — the
    // boundary counts (2, 4, 8) are exactly where a float log2 is an
    // ulp away from flipping the bucket
    val dir = writeDocs(Seq(
      (1L, "a", "en", "a"),
      (2L, "a b", "en", "a"),
      (3L, "a b c", "en", "a"),
      (4L, "a b c d", "en", "a"),
      (5L, "a b c d e f g", "en", "a"),
      (6L, "a b c d e f g h", "en", "a")))
    val got = Reports.tokenHistogram(Tables(spark, dir)).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((0, 1L, 1L, 1L), (1, 2L, 2L, 3L),
      (2, 2L, 4L, 7L), (3, 1L, 8L, 8L)))
  }

  test("shard_manifest: assignment is map-side; only the agg and output sort shuffle") {
    val plan = physical(Reports.shardManifest(tables))
    val nExchange = "Exchange".r.findAllIn(plan).length
    assert(nExchange == 2,
      s"expected exactly 2 exchanges (16-group agg + 16-row sort), got $nExchange:\n$plan")
  }

  test("mix_rollup: subtotals and grand total reconcile; ONE Expand, one scan") {
    val dir = writeDocs(Seq(
      (1L, "aa", "en", "a"), (2L, "bbb", "en", "a"),
      (3L, "cccc", "fr", "a"), (4L, "ddddd", "en", "b")))
    val t = Tables(spark, dir)
    val got = Reports.mixRollup(t).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("a", "en")) == ((2L, 5L, 3L)))
    assert(got(("a", "fr")) == ((1L, 4L, 4L)))
    assert(got(("a", "<all>")) == ((3L, 9L, 4L)))
    assert(got(("b", "<all>")) == ((1L, 5L, 5L)))
    assert(got(("<all>", "<all>")) == ((4L, 14L, 5L)))
    assert(got.size == 6) // 3 cells + 2 source subtotals + 1 grand total
    val plan = physical(Reports.mixRollup(tables))
    assert("Expand".r.findAllIn(plan).length == 1,
      s"rollup must be one Expand pass:\n$plan")
    assert("FileScan".r.findAllIn(plan).length == 1,
      s"rollup must read the corpus once:\n$plan")
  }

  test("snapshot_diff: planted add/remove/change/keep classify exactly; a doc is in exactly one class") {
    val prev = writeDocs(Seq(
      (1L, "alpha", "en", "a"),   // unchanged
      (2L, "beta", "en", "a"),    // changed in cur
      (3L, "gamma", "fr", "a"),   // removed
      (10L, "keep", "en", "b")))  // unchanged
    val cur = writeDocs(Seq(
      (1L, "alpha", "en", "a"),
      (2L, "beta v2", "en", "a"),
      (4L, "delta", "en", "a"),   // added
      (10L, "keep", "en", "b")))
    val got = Reports.snapshotDiff(Tables(spark, prev), Tables(spark, cur))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") == ((1L, 1L, 1L, 1L)))
    assert(got("b") == ((0L, 0L, 0L, 1L)))
    // partition property: classes sum to |prev ∪ cur| per source
    assert(got.values.map(v => v._1 + v._2 + v._3 + v._4).sum == 5)
  }

  test("lang_pivot: static schema, cells reconcile with long-format counts, unknown lang lands in other") {
    val dir = writeDocs(Seq(
      (1L, "x", "en", "a"), (2L, "y", "en", "a"), (3L, "z", "zh", "a"),
      (4L, "w", "xx", "b"))) // xx: not in the pinned inventory
    val rows = Reports.langPivot(Tables(spark, dir)).collect()
    assert(rows.head.schema.fieldNames.toSeq ==
      "source" +: Reports.PivotLangs :+ "other")
    val byS = rows.map(r => r.getString(0) -> r).toMap
    assert(byS("a").getAs[Long]("en") == 2L)
    assert(byS("a").getAs[Long]("zh") == 1L)
    assert(byS("a").getAs[Long]("other") == 0L)
    assert(byS("b").getAs[Long]("other") == 1L)
    assert(byS("b").getAs[Long]("en") == 0L)
    // real corpus: pivot cells sum to the per-source doc counts
    val wide = Reports.langPivot(tables).collect()
    val totals = wide.map(r => r.getString(0) ->
      (Reports.PivotLangs :+ "other").map(c => r.getAs[Long](c)).sum).toMap
    val direct = tables.documents.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals == direct)
  }

  test("report_key_skew: top-k ranking matches an independent recompute; shares sum below 1; plan is partial top-k") {
    val events = tables.events.select("user_id").collect().map(_.getLong(0))
    val total = events.length.toDouble
    val expect = events.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case (u, c) => (-c, u) }.take(Reports.KeySkewK)
    val got = Reports.keySkew(tables).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(r => (r._2, r._3)).toSeq == expect,
      "top-k order must match the independent recompute")
    assert(got.map(_._1).toSeq == (1 to got.length), "ranks dense from 1")
    got.foreach { case (_, _, c, share) =>
      val ref = graft.functions.Portable.round6Double(c / total)
      assert(share == ref, s"share6 $share vs jvm $ref")
    }
    assert(got.map(_._4).sum <= 1.0 + 1e-9)
    // the heavy groupBy output is cut by TakeOrderedAndProject, never
    // globally sorted before the limit
    assert(physical(Reports.keySkew(tables)).contains("TakeOrderedAndProject"),
      "top-k must compile to a partial top-k")
  }

  test("report_lang_confusion: cells ≡ a label-joined recompute of lang_id; shares partition each label") {
    import org.apache.spark.sql.functions.col
    val labels = tables.documents.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val preds = graft.textanalysis.TextAnalysis.langId(tables).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val expect = labels.toSeq
      .groupBy { case (id, lang) => (lang, preds(id)) }
      .view.mapValues(_.size.toLong).toMap
    val got = graft.textanalysis.TextAnalysis.langIdConfusion(tables)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expect, "cells must match the per-doc recompute")
    // shares partition each label exactly
    graft.textanalysis.TextAnalysis.langIdConfusion(tables).collect()
      .groupBy(_.getString(0)).foreach { case (lang, rows) =>
        assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-6,
          s"$lang shares must sum to 1")
      }
    assert(got.values.sum == labels.size)
  }

  test("report_join_cardinality: exact side equals the real join size; histogram only over-estimates") {
    val row = Reports.joinCardinality(tables).collect().head
    val (est, act) = (row.getLong(0), row.getLong(1))
    val direct = tables.orders.join(tables.lineitem,
      org.apache.spark.sql.functions.col("o_orderkey") ===
        org.apache.spark.sql.functions.col("l_orderkey")).count()
    assert(act == direct, s"per-key-count product $act vs real join $direct")
    assert(est >= act, "bucketed histograms can only over-estimate")
    val ref = graft.functions.Portable.round6Double(est.toDouble / act.toDouble)
    assert(row.getDouble(3) == ref)
  }

  private type ColStat = (String, Long, Long, Long, Option[Double],
    Option[Double], Option[String], Option[String], Option[Double])

  private def collectColumnStats(t: Tables): Seq[ColStat] =
    Reports.columnStats(t).collect().toSeq.map(r => (
      r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)),
      if (r.isNullAt(5)) None else Some(r.getDouble(5)),
      Option(r.getString(6)), Option(r.getString(7)),
      if (r.isNullAt(8)) None else Some(r.getDouble(8))))

  private def modelColumnStats(
      name: String, vs: Seq[(Option[Double], Option[String])]): ColStat = {
    import graft.functions.Portable.round6Double
    val present = vs.filter(v => v._1.nonEmpty || v._2.nonEmpty)
    val nums = vs.flatMap(_._1)
    val strs = vs.flatMap(_._2)
    (name, vs.length.toLong, (vs.length - present.length).toLong,
      present.distinct.length.toLong,
      if (nums.nonEmpty) Some(nums.min) else None,
      if (nums.nonEmpty) Some(nums.max) else None,
      if (strs.nonEmpty) Some(strs.min) else None,
      if (strs.nonEmpty) Some(strs.max) else None,
      if (strs.nonEmpty)
        Some(round6Double(strs.map(_.length.toLong).sum.toDouble /
          strs.length))
      else None)
  }

  test("report_column_stats ≡ JVM model on the real corpus") {
    val rows = tables.orders.selectExpr("o_orderkey", "o_custkey",
        "o_orderstatus", "o_totalprice",
        "CAST(unix_timestamp(o_orderdate) AS DOUBLE) AS ods",
        "o_orderpriority")
      .collect()
    def num(i: Int) = rows.toSeq.map(r =>
      (if (r.isNullAt(i)) None else Some(r.get(i) match {
        case l: java.lang.Long => l.toDouble
        case d: java.lang.Double => d.doubleValue
      }), Option.empty[String]))
    def str(i: Int) = rows.toSeq.map(r =>
      (Option.empty[Double], Option(r.getString(i))))
    val want = Seq(
      modelColumnStats("o_custkey", num(1)),
      modelColumnStats("o_orderdate", num(4)),
      modelColumnStats("o_orderkey", num(0)),
      modelColumnStats("o_orderpriority", str(5)),
      modelColumnStats("o_orderstatus", str(2)),
      modelColumnStats("o_totalprice", num(3)))
    val got = collectColumnStats(tables)
    assert(got == want, s"column stats diverge:\ngot  $got\nwant $want")
  }

  test("report_column_stats: planted nulls, exact NDV, widths") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_colstats").toString
    Seq(
      (1L, Option(10L), "O", 1.5, "2020-01-01 00:00:00", Option("HIGH")),
      (2L, Option.empty[Long], "O", 2.5, "2020-01-02 00:00:00",
        Option.empty[String]),
      (3L, Option(10L), "F", 1.5, "2020-01-01 00:00:00", Option("LOW")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "od_str", "o_orderpriority")
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "CAST(od_str AS TIMESTAMP) AS o_orderdate",
        "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = collectColumnStats(Tables(spark, dir)).map(s => s._1 -> s).toMap
    // o_custkey: one null, ONE distinct non-null value
    assert(got("o_custkey") ==
      ("o_custkey", 3L, 1L, 1L, Some(10.0), Some(10.0), None, None, None))
    // o_orderpriority: null + HIGH/LOW; width = (4 + 3) / 2
    assert(got("o_orderpriority") == ("o_orderpriority", 3L, 1L, 2L,
      None, None, Some("HIGH"), Some("LOW"), Some(3.5)))
    assert(got("o_orderstatus") == ("o_orderstatus", 3L, 0L, 2L,
      None, None, Some("F"), Some("O"), Some(1.0)))
    assert(got("o_totalprice") == ("o_totalprice", 3L, 0L, 2L,
      Some(1.5), Some(2.5), None, None, None))
    assert(got("o_orderkey")._4 == 3L && got("o_orderdate")._4 == 2L)
  }

  test("report_column_stats plan: map-side stack, two-phase NDV, no Expand") {
    val plan = physical(Reports.columnStats(tables))
    // COUNT(DISTINCT c1..ck) would Expand the fact k-fold through one
    // exchange; the stacked two-phase plan must never contain one
    assert(!plan.contains("Expand"), s"Expand leaked into ANALYZE:\n$plan")
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"ANALYZE must read the fact once, got $scans")
    assert(plan.contains("Generate"),
      s"stack should lower to a map-side Generate:\n$plan")
  }

  test("report_event_freshness ≡ JVM percentile model; no per-type Window in the plan") {
    val got = Reports.eventFreshness(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    import org.apache.spark.sql.functions.col
    val ev = tables.events.select(col("event_type"), col("ts_sec"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val maxTs = ev.map(_._2).max
    val want = ev.groupBy(_._1).toSeq.map { case (ty, rows) =>
      val lags = rows.map(maxTs - _._2).sorted
      val n = lags.length.toLong
      def p(q: Int) = lags((((q * n + 99) / 100) - 1).toInt)
      (ty, n, p(50), p(90), p(99))
    }.sortBy(_._1)
    assert(got.toSeq == want,
      s"freshness diverges:\ngot  ${got.toSeq}\nwant $want")
    got.foreach { case (ty, _, p50, p90, p99) =>
      assert(p50 <= p90 && p90 <= p99, s"$ty percentiles not monotone")
      assert(p99 >= 0, s"$ty negative lag")
    }
    // the whole point: percentiles WITHOUT a per-type sort task
    val plan = physical(Reports.eventFreshness(tables))
    assert(!plan.contains("Window"),
      s"freshness must not rank via Window:\n$plan")
  }
}
