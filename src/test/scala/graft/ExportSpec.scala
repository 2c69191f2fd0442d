package graft

import graft.pipeline.{Export, Reports}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic export order: value checks against the naive
  * per-shard rank (small corpus, where the one-task-per-shard plan is
  * harmless) plus the plan pin that keeps the production rank skew-free
  * — the Window must partition on (shard, bucket), never shard alone.
  */
class ExportSpec extends SparkSpec {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("shuffle order ≡ naive per-shard rank, and reruns are identical") {
    val got = Export.corpusShuffleOrder(tables).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // naive reference: row_number over the whole shard (fine at sf0.001)
    val coin = conv(substring(md5(concat(lit("shuf|"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)
    val naive = tables.documents
      .select(col("doc_id"), Reports.shardOf(col("doc_id")).as("shard"),
        coin.as("coin"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("coin"), col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.sorted.toSeq == naive.sorted.toSeq)
    val again = Export.corpusShuffleOrder(tables).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == again.toSeq, "rerun must be byte-identical")
  }

  test("shuffle order: positions are a 1..n permutation per shard") {
    val rows = Export.corpusShuffleOrder(tables).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(rows.length.toLong == tables.documents.count())
    rows.groupBy(_._1).foreach { case (shard, ps) =>
      val pos = ps.map(_._2).sorted.toSeq
      assert(pos == (1L to ps.length.toLong).toSeq,
        s"shard $shard positions not contiguous from 1: ${pos.take(5)}...")
    }
  }

  test("corpus_pack ≡ naive per-shard running sum; chunk addresses well-formed") {
    import org.apache.spark.sql.Row
    val got = Export.corpusPack(tables).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // naive reference: exclusive cumsum over the whole shard
    val coin = conv(substring(md5(concat(lit("shuf|"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)
    val naive = tables.documents
      .select(col("doc_id"), Reports.shardOf(col("doc_id")).as("shard"),
        coin.as("coin"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .withColumn("cum", coalesce(sum(col("toks")).over(
        Window.partitionBy(col("shard")).orderBy(col("coin"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("shard"),
        floor(col("cum") / lit(Export.PackBudget)).cast("long").as("seq_id"),
        (col("cum") % lit(Export.PackBudget)).cast("long").as("seq_off"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.sorted.toSeq == naive.sorted.toSeq)
    // well-formed addresses: offsets inside the budget; each shard's
    // first doc starts at (0, 0); multiple docs pack into one block
    assert(got.forall { case (_, _, s, o) =>
      s >= 0 && o >= 0 && o < Export.PackBudget })
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.exists { case (_, _, s, o) => s == 0L && o == 0L })
    }
    assert(got.groupBy(r => (r._2, r._3)).values.exists(_.length > 1),
      "expected at least one block packing several docs")
  }

  test("corpus_pack_stats: closed-form n_seqs consistent with the manifest") {
    val stats = Export.corpusPackStats(tables).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    val manifest = Export.corpusPack(tables).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    manifest.groupBy(_._1).foreach { case (shard, rows) =>
      val (_, totalToks, nSeqs, fill) = stats(shard)
      // independent recompute of the closed form
      assert(nSeqs == (totalToks - 1) / Export.PackBudget + 1,
        s"shard $shard n_seqs formula")
      // every manifest block id addresses a real block; block ids miss
      // n_seqs-1 only when a doc straddles into the shard's final
      // block and nothing starts there
      val distinct = rows.map(_._2).distinct.length.toLong
      assert(rows.map(_._2).max <= nSeqs - 1, s"shard $shard seq_id range")
      assert(distinct == nSeqs || distinct == nSeqs - 1,
        s"shard $shard blocks $distinct vs n_seqs $nSeqs")
      assert(fill > 0.0 && fill <= 1.0)
    }
    assert(stats.values.map(_._1).sum == tables.documents.count())
  }

  test("corpus_pack_delta: continues each shipped shard exactly where it ended; old never moves") {
    val t = tables
    val cutoff = t.documents.agg(max(col("doc_id"))).head.getLong(0) / 2
    val toks = t.documents
      .select(col("doc_id"), Reports.shardOf(col("doc_id")).as("shard"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val oldTot = toks.toSeq
      .collect { case (id, (s, tk)) if id <= cutoff => (s, tk) }
      .groupBy(_._1).map { case (s, v) => s -> v.map(_._2).sum }
    val delta = Export.corpusPackDelta(t).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(delta.nonEmpty && delta.forall(_._1 > cutoff),
      "delta carries exactly the new docs")
    // per shard: global token cursor (seq_id·B + seq_off) starts at the
    // shipped total — mid-block when it isn't budget-aligned — and each
    // next doc starts where the previous ended (gap-free concat)
    delta.groupBy(_._2).foreach { case (shard, docs) =>
      val inOrder = docs.sortBy(d => (d._3, d._4, d._1))
      var cursor = oldTot.getOrElse(shard, 0L)
      inOrder.foreach { case (id, _, seqId, seqOff) =>
        assert(seqId * Export.PackBudget + seqOff == cursor,
          s"shard $shard doc $id: cursor $cursor, got ${seqId} * B + $seqOff")
        cursor += toks(id)._2
      }
      assert(oldTot.getOrElse(shard, 0L) % Export.PackBudget == 0L ||
        inOrder.head._4 != 0L || oldTot.getOrElse(shard, 0L) == 0L)
    }
    // the delta is NOT a full repack: a full recompute re-permutes and
    // moves at least one new doc's address (why the delta op exists)
    val full = Export.corpusPack(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(delta.exists { case (id, _, s, o) => full(id) != ((s, o)) },
      "full repack should interleave old+new — delta must differ")
    // both side tables ride broadcast joins; fact never re-shuffles for them
    val plan = physical(Export.corpusPackDelta(t))
    assert(!plan.contains("SortMergeJoin"), s"sides must broadcast:\n$plan")
  }

  test("corpus_pack: the cumsum Window partitions on (shard, bucket), not shard") {
    val plan = physical(Export.corpusPack(tables))
    assert("\\bWindow\\b".r.findAllIn(plan).length == 1,
      s"expected exactly one Window:\n$plan")
    assert("hashpartitioning\\(shard#\\d+, bkt#\\d+"
      .r.findFirstIn(plan).isDefined,
      s"cumsum Exchange not keyed on (shard, bkt):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"offset table not broadcast:\n$plan")
  }

  test("corpus_interleave ≡ naive per-source rank model; round-robin residues; reruns identical") {
    val got = Export.corpusInterleave(tables).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // naive reference: per-source row_number at spec scale
    val coin = conv(substring(md5(concat(lit("shuf|"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)
    val srcs = tables.documents.select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted
    val si = srcs.zipWithIndex.toMap
    val S = srcs.length.toLong
    val naive = tables.documents
      .select(col("doc_id"), col("source"), coin.as("coin"))
      .withColumn("rs", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("coin"), col("doc_id"))).cast("long") - 1L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(3) * S + si(r.getString(1))))
    assert(got.sorted.toSeq == naive.sorted.toSeq)

    // same-source adjacency impossible: pos mod S identifies the
    // source; positions globally unique
    got.foreach { case (_, src, pos) =>
      assert(pos % S == si(src), s"residue broken for $src at $pos") }
    assert(got.map(_._3).distinct.length == got.length)

    val again = Export.corpusInterleave(tables).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == again.toSeq, "rerun must be byte-identical")
  }

  test("corpus_interleave_delta: shipped positions never move; each residue class continues gap-free; novel source refused") {
    import org.apache.spark.sql.functions.{col, max}
    val cut = tables.documents.agg(max(col("doc_id"))).head().getLong(0) / 2
    // the shipped interleave = interleave of the prefix corpus (coin
    // and source are identity functions, so the prefix filter commutes)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-interleave-old").toString
    tables.documents.filter(col("doc_id") <= cut)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val shipped = Export.corpusInterleave(Tables(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val delta = Export.corpusInterleaveDelta(tables).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(delta.nonEmpty && delta.forall(_._1 > cut),
      "delta must address only new docs")
    // no collisions with shipped; union covers the full corpus
    val all = shipped ++ delta
    assert(all.map(_._3).distinct.length == all.length,
      "delta positions collide with shipped")
    assert(all.length.toLong == tables.documents.count())
    // per source: shipped ranks 0..n_old-1, delta continues n_old..
    // gap-free in the same residue class
    val srcs = shipped.map(_._2).distinct.sorted
    val S = srcs.length.toLong
    val si = srcs.zipWithIndex.toMap
    all.groupBy(_._2).foreach { case (src, rows) =>
      val ranks = rows.map(_._3).sorted.map { p =>
        assert(p % S == si(src), s"$src residue broken at $p"); p / S }
      assert(ranks.toSeq == (0L until ranks.length).toSeq,
        s"$src ranks not gap-free: ${ranks.take(5).toSeq}...")
    }
    // a genuinely new source cannot continue a residue class
    import spark.implicits._
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-interleave-novel").toString
    tables.documents
      .withColumn("source",
        org.apache.spark.sql.functions.when(col("doc_id") > cut * 2 - 3,
          org.apache.spark.sql.functions.lit("brand_new_src"))
          .otherwise(col("source")))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      Export.corpusInterleaveDelta(Tables(spark, dir2)).collect()
    }
    assert(e.getMessage.contains("brand_new_src"),
      s"refusal must name the novel source: ${e.getMessage}")
    // the SQL twin refuses too (ADVICE r15: its inner join used to
    // drop novel sources silently) — a novel-joined error() branch,
    // row-driven so it fires even when EVERY delta doc is novel.
    // DuckDB behavior verified by hand (lazy CASE/branch eval); here
    // we pin the guard's presence and its loud message.
    assert(Export.corpusInterleaveDeltaSql.contains(
      "error('sources absent from the shipped interleave: '"),
      "SQL twin lost its novel-source guard")
  }

  test("corpus_interleave: the rank Window partitions on (source, bucket), never source alone") {
    val plan = physical(Export.corpusInterleave(tables))
    assert("\\bWindow\\b".r.findAllIn(plan).length == 1,
      s"expected exactly one Window:\n$plan")
    assert("hashpartitioning\\(source#\\d+, bkt#\\d+"
      .r.findFirstIn(plan).isDefined,
      s"rank Exchange not keyed on (source, bkt):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"offset/index tables not broadcast:\n$plan")
  }

  test("shuffle order: the rank Window partitions on (shard, bucket), not shard") {
    val plan = physical(Export.corpusShuffleOrder(tables))
    // exactly one Window node, and its required distribution (the
    // Exchange feeding it) must key on BOTH shard and bkt — a
    // shard-only partition is the 16-task 100 TB sort this plan exists
    // to avoid
    assert("\\bWindow\\b".r.findAllIn(plan).length == 1,
      s"expected exactly one Window:\n$plan")
    assert("hashpartitioning\\(shard#\\d+, bkt#\\d+"
      .r.findFirstIn(plan).isDefined,
      s"rank Exchange not keyed on (shard, bkt):\n$plan")
    // offsets join stays broadcast (16·1024-row table at most)
    assert(plan.contains("BroadcastHashJoin"),
      s"offset table not broadcast:\n$plan")
  }
}
