package graft.pipeline

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-export ordering — the "global shuffle" a
  * training run wants from its corpus WITHOUT a training-time shuffle
  * buffer: every doc gets a reproducible (shard, pos) address derived
  * from its identity alone, so any two export runs (any partitioning,
  * any cluster size) write byte-identical shard files and a trainer
  * can seek to (shard, pos) deterministically.
  *
  * Reference scope: the reference engine has no export story at all
  * (its jobs end at console/HDFS sinks, e.g. HdfsWordCount.java) —
  * this is part of the training-data surface graft adds on top.
  */
object Export {

  /** Coin-bucket count for the rank computation: the per-shard order
    * statistic is computed per (shard, bucket) — [[ShuffleBuckets]]×
    * more, and correspondingly smaller, sort groups than a per-shard
    * Window.
    */
  val ShuffleBuckets = 1024

  /** The order coin: uniform [0,1) from doc identity in its own seed
    * namespace ([[Mixing.u]] idiom — independent of the sample/split/
    * shard coins, bit-identical in Spark and the oracle).
    */
  private def orderCoin = Mixing.u("shuf", col("doc_id"))

  /** Deterministic export order: (doc_id, shard, pos) where `shard` is
    * [[Reports.shardOf]]'s identity shard and `pos` is the doc's
    * 1-based rank within its shard under (coin, doc_id) ordering — a
    * reproducible random permutation of each shard.
    *
    * The naive plan — `row_number() OVER (PARTITION BY shard ORDER BY
    * coin)` — ranks each shard in ONE task: at 100 TB that is 16 tasks
    * each sorting ~6 TB. Instead the rank is assembled from coin
    * BUCKETS (the [[graft.functions.OrderStat]] discipline applied to
    * ranking): bucket = floor(coin·B) is monotone in coin, so the
    * shard-wide order is the bucket order with intra-bucket (coin,
    * doc_id) order inside it. One count-only aggregation (doc_id-pruned
    * scan) yields the ≤16·B-row (shard, bucket) histogram; the driver
    * prefix-sums it into exclusive offsets (scalar traffic, the
    * OrderStat bound); and the Window that remains partitions by
    * (shard, bucket) — 16·B balanced groups, each ~1/(16·B) of the
    * corpus, running fully parallel. pos = offset + intra-bucket rank.
    *
    * Cost at scale: two doc_id-only scans (count pass + rank pass), one
    * corpus shuffle keyed on (shard, bucket), one broadcast of the
    * offset table. Determinism: coin and shard are identity functions
    * of doc_id; ties in coin break on doc_id — reruns and any input
    * partitioning produce the identical permutation.
    */
  /** The bucketed corpus frame every export op ranks over: (doc_id,
    * shard, coin, bkt) plus any caller columns, where bkt =
    * ⌊coin·B⌋ is monotone in coin — so per-shard (coin, doc_id) order
    * is bucket order with intra-bucket order inside it.
    */
  private def bucketed(t: Tables, extra: Seq[org.apache.spark.sql.Column]): DataFrame =
    t.documents
      .select(col("doc_id") +: extra: _*)
      .withColumn("shard", Reports.shardOf(col("doc_id")))
      .withColumn("coin", orderCoin)
      .withColumn("bkt",
        floor(col("coin") * lit(ShuffleBuckets.toDouble)).cast("int"))

  /** Exclusive per-shard prefix offsets of `valueCol` summed per
    * (shard, bucket): one count-only aggregation (≤16·[[ShuffleBuckets]]
    * rows of three integers to the driver — the OrderStat scalar
    * bound, never data), prefix-summed in bucket order per shard.
    * This is the distributed-prefix primitive: shard-global
    * rank/cumsum = driver offset + intra-bucket Window, with the
    * Window partitioned on (shard, bucket) — 16·B balanced groups
    * instead of 16 shard-sized sort tasks.
    */
  private def bucketOffsets(base: DataFrame,
                            valueCol: org.apache.spark.sql.Column): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val hist = base.groupBy(col("shard"), col("bkt"))
      .agg(sum(valueCol).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    hist.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var acc = 0L
      rows.sortBy(_._2).map { case (s, b, n) =>
        val off = acc; acc += n; (s, b, off)
      }
    }.toDF("shard", "bkt", "off")
  }

  private def intraBucket =
    Window.partitionBy(col("shard"), col("bkt"))
      .orderBy(col("coin"), col("doc_id"))

  def corpusShuffleOrder(t: Tables): DataFrame = {
    val base = bucketed(t, Seq.empty)
    base.join(broadcast(bucketOffsets(base, lit(1L))), Seq("shard", "bkt"))
      .select(col("doc_id"), col("shard"),
        (col("off") + row_number().over(intraBucket)).cast("long").as("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  def corpusShuffleOrderSql: String =
    s"""WITH c AS (SELECT doc_id, ${Reports.shardOfSql} AS shard,
       |             ${Mixing.uSql("shuf")} AS coin
       |           FROM documents)
       |SELECT doc_id, shard,
       |  ROW_NUMBER() OVER (PARTITION BY shard ORDER BY coin, doc_id) AS pos
       |FROM c ORDER BY shard, pos""".stripMargin

  /** Tokens per training sequence for [[corpusPack]]. */
  val PackBudget = 512L

  /** Concat-and-chunk packing manifest — GPT-style pretraining data
    * prep: within each shard, documents are concatenated in the
    * [[corpusShuffleOrder]] permutation and chunked into
    * [[PackBudget]]-token blocks; each doc's address is the block its
    * first token lands in plus its offset inside that block. Output:
    * (doc_id, shard, seq_id, seq_off) — the manifest a packing writer
    * needs to emit fixed-length training sequences without ever
    * holding more than its partition (a doc longer than the budget
    * simply spans blocks; its address is where it starts).
    *
    * seq_id = ⌊cum/B⌋ and seq_off = cum mod B where cum is the
    * EXCLUSIVE prefix sum of whitespace-token counts in shard order —
    * the same distributed-prefix shape as the rank: per-(shard,
    * bucket) token-sum histogram → driver exclusive offsets →
    * intra-bucket running sum over a (shard, bucket)-partitioned
    * Window frame. No shard-sized sort task anywhere; determinism is
    * the permutation's (identity coins, doc_id tiebreak).
    */
  def corpusPack(t: Tables): DataFrame = {
    val base = bucketed(t,
      Seq(size(split(col("text"), " ")).cast("long").as("toks")))
    val cumExcl = col("off") +
      coalesce(sum(col("toks")).over(
        intraBucket.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    base.join(broadcast(bucketOffsets(base, col("toks"))), Seq("shard", "bkt"))
      .select(col("doc_id"), col("shard"),
        floor(cumExcl / lit(PackBudget)).cast("long").as("seq_id"),
        (cumExcl % lit(PackBudget)).cast("long").as("seq_off"))
      .orderBy(col("shard"), col("seq_id"), col("seq_off"), col("doc_id"))
  }

  /** Packing utilization report — the [[corpusPack]] sidecar: per
    * shard, how many [[PackBudget]]-token blocks the export emits and
    * how full they are. n_seqs is closed-form (⌈Σtoks / B⌉ — the
    * concatenation fills blocks contiguously, so no join against the
    * pack manifest is needed; the spec pins the formula against the
    * manifest's distinct seq_ids), fill_frac = Σtoks / (n_seqs·B).
    * One map-side projection + one 16-group aggregation.
    */
  def corpusPackStats(t: Tables): DataFrame = {
    val nSeqs = (floor((col("total_tokens") - lit(1)).cast("double")
      / lit(PackBudget.toDouble)) + lit(1)).cast("long")
    t.documents
      .select(Reports.shardOf(col("doc_id")).as("shard"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("total_tokens"))
      .select(col("shard"), col("n_docs"), col("total_tokens"),
        nSeqs.as("n_seqs"),
        graft.functions.Portable.round6(
          col("total_tokens").cast("double")
            / (nSeqs * lit(PackBudget)).cast("double")).as("fill_frac"))
      .orderBy(col("shard"))
  }

  def corpusPackStatsSql: String =
    s"""WITH c AS (SELECT ${Reports.shardOfSql} AS shard,
       |             len(string_split(text, ' '))::BIGINT AS toks
       |           FROM documents),
       |g AS (SELECT shard, COUNT(*) AS n_docs,
       |        SUM(toks)::BIGINT AS total_tokens
       |      FROM c GROUP BY shard)
       |SELECT shard, n_docs, total_tokens,
       |  ((total_tokens - 1) // $PackBudget + 1) AS n_seqs,
       |  ${graft.functions.Portable.round6Sql(
      s"total_tokens::DOUBLE / (((total_tokens - 1) // $PackBudget + 1) * $PackBudget)::DOUBLE")} AS fill_frac
       |FROM g ORDER BY shard""".stripMargin

  /** Incremental packing — the append-only continuation of
    * [[corpusPack]] for newly-admitted docs: shipped shard files are
    * IMMUTABLE (a trainer may already hold them), so a recompute that
    * re-permutes the whole corpus (new coins interleave into the
    * shuffle order and shift every later doc's address) is not an
    * option. The delta packs ONLY the new docs, per shard, starting
    * exactly where the shipped pack ended — mid-block when the old
    * total isn't budget-aligned (seq_off continuity, spec-pinned).
    *
    * Old/new split is the delta-family rule (doc_id ≤ max/2 — the
    * `lm_rebucket_delta` convention standing in for the previous
    * corpus generation; production passes the shipped generation's
    * doc set).
    *
    * Scale: the old corpus contributes ONE 16-row aggregate (its
    * per-shard token totals — never rescanned beyond a 2-column
    * count pass, never shuffled); the new docs run the same
    * distributed-prefix shape as the full pack (histogram → driver
    * offsets → (shard, bucket) Window), sized by the DELTA, not the
    * corpus. Both side tables broadcast (pinned).
    */
  def corpusPackDelta(t: Tables): DataFrame = {
    val cutoff = t.documents.agg(max(col("doc_id"))).head.getLong(0) / 2
    val base = bucketed(t,
      Seq(size(split(col("text"), " ")).cast("long").as("toks")))
    val newDocs = base.filter(col("doc_id") > cutoff)
    val oldTot = base.filter(col("doc_id") <= cutoff)
      .groupBy(col("shard")).agg(sum(col("toks")).as("old_toks"))
    val cumExcl = coalesce(col("old_toks"), lit(0L)) + col("off") +
      coalesce(sum(col("toks")).over(
        intraBucket.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    newDocs
      .join(broadcast(bucketOffsets(newDocs, col("toks"))),
        Seq("shard", "bkt"))
      .join(broadcast(oldTot), Seq("shard"), "left")
      .select(col("doc_id"), col("shard"),
        floor(cumExcl / lit(PackBudget)).cast("long").as("seq_id"),
        (cumExcl % lit(PackBudget)).cast("long").as("seq_off"))
      .orderBy(col("shard"), col("seq_id"), col("seq_off"), col("doc_id"))
  }

  def corpusPackDeltaSql: String =
    s"""WITH c AS (SELECT doc_id, ${Reports.shardOfSql} AS shard,
       |             ${Mixing.uSql("shuf")} AS coin,
       |             len(string_split(text, ' '))::BIGINT AS toks
       |           FROM documents),
       |cut AS (SELECT max(doc_id) // 2 AS k FROM documents),
       |old AS (SELECT shard, SUM(toks)::BIGINT AS old_toks
       |        FROM c, cut WHERE doc_id <= k GROUP BY shard),
       |nw AS (SELECT c.* FROM c, cut WHERE doc_id > k),
       |s AS (SELECT doc_id, shard,
       |        COALESCE(SUM(toks) OVER (PARTITION BY shard
       |          ORDER BY coin, doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |          0)::BIGINT AS cumn
       |      FROM nw)
       |SELECT s.doc_id, s.shard,
       |  (COALESCE(old_toks, 0) + cumn) // $PackBudget AS seq_id,
       |  (COALESCE(old_toks, 0) + cumn) % $PackBudget AS seq_off
       |FROM s LEFT JOIN old USING (shard)
       |ORDER BY shard, seq_id, seq_off, doc_id""".stripMargin

  def corpusPackSql: String =
    s"""WITH c AS (SELECT doc_id, ${Reports.shardOfSql} AS shard,
       |             ${Mixing.uSql("shuf")} AS coin,
       |             len(string_split(text, ' '))::BIGINT AS toks
       |           FROM documents),
       |s AS (SELECT doc_id, shard,
       |        COALESCE(SUM(toks) OVER (PARTITION BY shard
       |          ORDER BY coin, doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |          0)::BIGINT AS cum
       |      FROM c)
       |SELECT doc_id, shard, cum // $PackBudget AS seq_id,
       |  cum % $PackBudget AS seq_off
       |FROM s ORDER BY shard, seq_id, seq_off, doc_id""".stripMargin

  /** SOURCE-INTERLEAVED training order: a deterministic global
    * position where consecutive positions cycle round-robin through
    * the sources — `pos = rank_in_source · S + source_index` (S =
    * |sources|, index = the source's alphabetical rank). A shuffled
    * order ([[corpusShuffleOrder]]) makes clumps unlikely; this makes
    * same-source adjacency IMPOSSIBLE while every source still
    * streams in its own reproducible shuffled suborder — the
    * curriculum-mixing guarantee (no gradient window dominated by one
    * source) a trainer otherwise approximates with temperature
    * resampling. Positions are globally unique (distinct residues
    * mod S across sources, distinct ranks within); once a short
    * source exhausts, its residue class simply goes vacant —
    * positions stay stable under corpus growth, consumers read in
    * pos order.
    *
    * Scale: the [[corpusShuffleOrder]] distributed-prefix discipline
    * with `source` as the key — rank_in_source assembled from coin
    * buckets (monotone in coin), so the Window partitions on
    * (source, bkt): |sources|·B balanced groups, never a
    * whale-source-sized sort task. The offset histogram is
    * |sources|·B count rows to the driver (bounded, documented —
    * 20·1024 at the corpus' source cardinality), the index table
    * |sources| rows; both broadcast back.
    */
  def corpusInterleave(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val srcs = t.documents.select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted
    val S = srcs.length.toLong
    val idx = srcs.zipWithIndex
      .map { case (s, i) => (s, i.toLong) }.toSeq.toDF("source", "si")
    val base = t.documents
      .select(col("doc_id"), col("source"))
      .withColumn("coin", orderCoin)
      .withColumn("bkt",
        floor(col("coin") * lit(ShuffleBuckets.toDouble)).cast("int"))
    val hist = base.groupBy(col("source"), col("bkt"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val offs = hist.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var acc = 0L
      rows.sortBy(_._2).map { case (s, b, n) =>
        val off = acc; acc += n; (s, b, off)
      }
    }.toDF("source", "bkt", "off")
    val w = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("coin"), col("doc_id"))
    base.join(broadcast(offs), Seq("source", "bkt"))
      .join(broadcast(idx), Seq("source"))
      .select(col("doc_id"), col("source"),
        ((col("off") + row_number().over(w) - 1) * lit(S) + col("si"))
          .cast("long").as("pos"))
      .orderBy(col("doc_id"))
  }

  def corpusInterleaveSql: String =
    s"""WITH s AS (SELECT source,
       |         row_number() OVER (ORDER BY source) - 1 AS si,
       |         COUNT(*) OVER () AS ns
       |       FROM (SELECT DISTINCT source FROM documents)),
       |c AS (SELECT doc_id, source, ${Mixing.uSql("shuf")} AS coin
       |      FROM documents),
       |r AS (SELECT doc_id, source,
       |        row_number() OVER (PARTITION BY source
       |                           ORDER BY coin, doc_id) - 1 AS rs
       |      FROM c)
       |SELECT r.doc_id, r.source, (rs * ns + si)::BIGINT AS pos
       |FROM r JOIN s USING (source) ORDER BY r.doc_id""".stripMargin

  /** APPEND-ONLY interleave continuation (the [[corpusPackDelta]]
    * convention applied to the round-robin order): shipped positions
    * are immutable — a trainer may already hold them — and a full
    * re-interleave re-ranks every source (new coins interleave among
    * old, shifting every later position). The delta therefore assigns
    * positions ONLY to new docs (doc_id > max/2, the delta-family
    * split), continuing each source's residue class right after its
    * shipped rank: pos = (n_old(source) + rank_within_new) · S + si,
    * with S and the source indexes from the SHIPPED source universe.
    *
    * New docs from a source absent at ship time have no residue class
    * to continue — the builder REFUSES them loudly (a silent remap
    * would collide with shipped positions); production ships a new
    * full interleave generation to admit a new source, exactly the
    * BoundsStore generation-roll shape. The SQL twin refuses the same
    * way — a `novel` CTE joined into a UNION ALL branch whose
    * projection calls DuckDB's `error()`: the guard is ROW-driven, so
    * it fires exactly when a novel-source row exists and stays silent
    * otherwise (DuckDB evaluates `error()` per produced row, and the
    * branch produces rows only for novel sources — verified by
    * executing the twin against a doctored novel-source corpus,
    * `tools/oracle_refusal_check.py`; ADVICE r15: the pre-r16 form's
    * inner `JOIN ... USING (source)` dropped novel sources silently,
    * so engine equality held only because Scala threw first — now
    * both engines throw, naming the sources).
    *
    * Scale: the shipped corpus contributes one |sources|-row count
    * aggregate (source-column scan, no shuffle); the prefix machinery
    * runs over the DELTA only; both side tables broadcast.
    */
  def corpusInterleaveDelta(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val cut = t.documents.agg(max(col("doc_id"))).head().getLong(0) / 2
    val oldCounts = t.documents.filter(col("doc_id") <= cut)
      .groupBy(col("source")).agg(count(lit(1)).as("n_old"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val srcs = oldCounts.keys.toSeq.sorted
    val S = srcs.length.toLong
    val si = srcs.zipWithIndex.map { case (s, i) => (s, i.toLong) }.toMap
    val newDocs = t.documents.filter(col("doc_id") > cut)
    val novel = newDocs.select(col("source")).distinct()
      .collect().map(_.getString(0)).filterNot(oldCounts.contains)
    require(novel.isEmpty,
      s"sources absent from the shipped interleave: ${novel.mkString(",")}" +
        " — ship a new interleave generation instead of a delta")
    val base = newDocs
      .select(col("doc_id"), col("source"))
      .withColumn("coin", orderCoin)
      .withColumn("bkt",
        floor(col("coin") * lit(ShuffleBuckets.toDouble)).cast("int"))
    val hist = base.groupBy(col("source"), col("bkt"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val offs = hist.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      var acc = oldCounts(src)
      rows.sortBy(_._2).map { case (s, b, n) =>
        val off = acc; acc += n; (s, b, off, si(s))
      }
    }.toDF("source", "bkt", "off", "si")
    val w = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("coin"), col("doc_id"))
    base.join(broadcast(offs), Seq("source", "bkt"))
      .select(col("doc_id"), col("source"),
        ((col("off") + row_number().over(w) - 1) * lit(S) + col("si"))
          .cast("long").as("pos"))
      .orderBy(col("doc_id"))
  }

  def corpusInterleaveDeltaSql: String =
    s"""WITH cut AS (SELECT MAX(doc_id) // 2 AS k FROM documents),
       |s AS (SELECT source,
       |        row_number() OVER (ORDER BY source) - 1 AS si,
       |        COUNT(*) OVER () AS ns,
       |        n_old
       |      FROM (SELECT source, COUNT(*)::BIGINT AS n_old
       |            FROM documents, cut WHERE doc_id <= k GROUP BY 1)),
       |c AS (SELECT doc_id, source, ${Mixing.uSql("shuf")} AS coin
       |      FROM documents, cut WHERE doc_id > k),
       |novel AS (SELECT DISTINCT c.source FROM c
       |          LEFT JOIN s USING (source) WHERE s.source IS NULL),
       |r AS (SELECT doc_id, source,
       |        row_number() OVER (PARTITION BY source
       |                           ORDER BY coin, doc_id) - 1 AS rs
       |      FROM c)
       |SELECT r.doc_id, r.source,
       |  ((n_old + rs) * ns + si)::BIGINT AS pos
       |FROM r JOIN s USING (source)
       |UNION ALL
       |SELECT r.doc_id, r.source,
       |  error('sources absent from the shipped interleave: ' || r.source)
       |FROM r JOIN novel USING (source)
       |ORDER BY doc_id""".stripMargin
}
