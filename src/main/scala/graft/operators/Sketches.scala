package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch — bounded-memory frequency estimation, the
  * sublinear answer to the reference's running word counts (ref:
  * UpdateStateByKeyWordCount.java keeps one state entry PER KEY —
  * unbounded as vocabulary grows; the sketch holds a fixed d×w grid
  * no matter how many distinct keys arrive).
  *
  * Every hash is md5 in its own `cm<j>` seed namespace (the
  * [[graft.pipeline.Mixing]] coin discipline), so the grid — and
  * therefore every ESTIMATE, including its deterministic
  * over-counts — is identical in Spark and the DuckDB oracle:
  * the sketch is hash-checked cross-engine, not just spec-asserted.
  *
  * Scale: the build shuffles (j, cell) pairs with map-side partial
  * sums — the reduce side is ≤ d·w groups regardless of corpus size;
  * the estimate probe joins the vocabulary against the ≤ d·w-row grid
  * (broadcast). The streaming twin keeps the SAME grid as streaming
  * aggregation state: d·w rows forever, the bounded-state alternative
  * to `RunningCounts` when keys are unbounded.
  */
object Sketches {

  val CmDepth = 4
  val CmWidth = 1024

  /** Heavy-hitter rule: estimate ≥ total/[[HeavyFrac]] (integer
    * arithmetic — `est * HeavyFrac >= total` — portable).
    */
  val HeavyFrac = 64L

  private def tokens(t: Tables): DataFrame =
    t.documents.select(explode(split(col("text"), " ")).as("word"))

  private def cellCol(j: Int, word: Column): Column =
    conv(substring(md5(concat(lit(s"cm$j|"), word)), 1, 8), 16, 10)
      .cast("long") % CmWidth

  /** (word, j, c) cell expansion — shared with the streaming twin so
    * the grid definition cannot drift.
    */
  private[graft] def cells(words: DataFrame): DataFrame =
    words.select(col("word"), explode(array((0 until CmDepth).map(j =>
      struct(lit(j).as("j"), cellCol(j, col("word")).as("c"))): _*))
      .as("rc"))
      .select(col("word"), col("rc.j").as("j"), col("rc.c").as("c"))

  /** The sketch itself: (j, c, cnt) — one occurrence adds 1 to its
    * cell in each of the d rows. ≤ d·w rows out.
    */
  def countMinSketch(t: Tables): DataFrame =
    cells(tokens(t))
      .groupBy(col("j"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("j"), col("c"))

  def countMinSketchSql: String =
    s"""SELECT j, c, COUNT(*) AS cnt FROM (
       |  SELECT t.j,
       |    (('0x' || substr(md5('cm' || t.j || '|' || word), 1, 8))::BIGINT
       |      % $CmWidth) AS c
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word
       |        FROM documents) w, range($CmDepth) t(j))
       |GROUP BY j, c
       |ORDER BY j, c""".stripMargin

  /** Heavy hitters BY THE SKETCH: estimate(word) = min over the d
    * cells it hashes to (≥ true count always — collisions only add),
    * emit words whose estimate clears total/[[HeavyFrac]]. The query
    * set here is the corpus vocabulary (a demo of the estimate path —
    * production probes specific keys against the published grid);
    * over-counted non-heavy words that clear the bar are REAL
    * count-min semantics, deterministic, and oracle-checked.
    */
  def countMinHeavyHitters(t: Tables): DataFrame = {
    val sketch = countMinSketch(t)
    val vocab = tokens(t).distinct()
    val total = tokens(t).count()
    cells(vocab)
      .join(broadcast(sketch), Seq("j", "c"))
      .groupBy(col("word"))
      .agg(min(col("cnt")).as("est"))
      .filter(col("est") * HeavyFrac >= total)
      .orderBy(col("word"))
  }

  def countMinHeavyHittersSql: String =
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS word
       |              FROM documents),
       |sk AS (SELECT j, c, COUNT(*) AS cnt FROM (
       |         SELECT t.j,
       |           (('0x' || substr(md5('cm' || t.j || '|' || word), 1, 8))
       |             ::BIGINT % $CmWidth) AS c
       |         FROM toks, range($CmDepth) t(j))
       |       GROUP BY j, c),
       |vc AS (SELECT DISTINCT word FROM toks),
       |probe AS (SELECT v.word, t.j,
       |            (('0x' || substr(md5('cm' || t.j || '|' || v.word), 1, 8))
       |              ::BIGINT % $CmWidth) AS c
       |          FROM vc v, range($CmDepth) t(j)),
       |est AS (SELECT p.word, MIN(sk.cnt) AS est
       |        FROM probe p JOIN sk ON sk.j = p.j AND sk.c = p.c
       |        GROUP BY p.word)
       |SELECT word, est FROM est
       |WHERE est * $HeavyFrac >= (SELECT COUNT(*) FROM toks)
       |ORDER BY word""".stripMargin

  // -----------------------------------------------------------------
  // HyperLogLog — bounded-memory DISTINCT estimation. The register
  // table is pure integers over md5 bits (the count-min discipline),
  // so the sketch itself is hash-checked cross-engine; only the final
  // float estimate (which needs libm ln for the linear-counting
  // branch) stays engine-side, spec-gated against exact counts.
  // -----------------------------------------------------------------

  /** 2^[[HllP]] registers; ~1.04/√m ≈ 3.3% standard error. */
  val HllP = 10
  val HllM = 1024
  val HllAlpha: Double = 0.7213 / (1.0 + 1.079 / HllM)

  /** Bits drawn for the rho scan (13 md5 hex chars). */
  val HllRhoBits = 52
  private val TwoPow52 = 4503599627370496L

  private def hllHash(u: Column): Column =
    md5(concat(lit("hll|"), u.cast("string")))

  /** Register index: first 8 md5 hex chars mod m. */
  private def hllBucket(u: Column): Column =
    conv(substring(hllHash(u), 1, 8), 16, 10).cast("long") % HllM

  /** rho = 1-based position of the first set bit in the NEXT 52 md5
    * bits (capped at 52 when all-zero — keeps 2^(52−r) an exact
    * integer). The bin/lpad/instr formulation is pure string/integer
    * ops — bit-identical in Spark and DuckDB, no float log anywhere.
    */
  private def hllRho(u: Column): Column = {
    val w = conv(substring(hllHash(u), 9, 13), 16, 10).cast("long")
    val pos = instr(lpad(bin(w), HllRhoBits, "0"), "1")
    when(pos === 0, lit(HllRhoBits)).otherwise(pos).cast("int")
  }

  /** (day, bucket, rho) cell expansion — shared with the streaming
    * twin so the register definition cannot drift.
    */
  private[graft] def hllCells(events: DataFrame): DataFrame =
    events.select(
      expr(s"ts_sec div ${graft.operators.Sequences.RetentionBucketSec}")
        .as("day"),
      hllBucket(col("user_id")).as("bucket"),
      hllRho(col("user_id")).as("rho"))

  /** The per-day register table: (day, bucket, r = max rho). ≤ m rows
    * per day NO MATTER how many events or users arrive — the bounded
    * alternative to a per-day count-distinct shuffle. `max` is
    * idempotent, so replays and duplicate events cannot move a
    * register (spec-pinned).
    */
  def hllRegisters(t: Tables): DataFrame =
    hllCells(t.events)
      .groupBy(col("day"), col("bucket"))
      .agg(max(col("rho")).as("r"))
      .orderBy(col("day"), col("bucket"))

  private def hllCellsSql: String =
    s"""e AS (SELECT user_id,
       |        CAST(floor(epoch(ts)) AS BIGINT)
       |          // ${graft.operators.Sequences.RetentionBucketSec} AS day,
       |        md5('hll|' || CAST(user_id AS VARCHAR)) AS h
       |      FROM events),
       |c AS (SELECT day,
       |        (('0x' || substr(h, 1, 8))::BIGINT % $HllM) AS bucket,
       |        CASE WHEN instr(lpad(bin(('0x' || substr(h, 9, 13))::BIGINT),
       |                        $HllRhoBits, '0'), '1') = 0
       |             THEN $HllRhoBits
       |             ELSE instr(lpad(bin(('0x' || substr(h, 9, 13))::BIGINT),
       |                        $HllRhoBits, '0'), '1') END AS rho
       |      FROM e)""".stripMargin

  def hllRegistersSql: String =
    s"""WITH $hllCellsSql
       |SELECT day, bucket, CAST(MAX(rho) AS INT) AS r
       |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Per-day moments over the register table — everything the HLL
    * estimate needs, as EXACT integers: `v_zero` (untouched
    * registers) and `z52` = 2^52·Z where Z = Σ 2^(−r) (each term
    * 2^(52−r) is an exact integer because r ≤ 52; max total
    * m·2^52 = 2^62 fits a long).
    */
  private def hllMoments(t: Tables): DataFrame =
    hllRegisters(t)
      .groupBy(col("day"))
      .agg((lit(HllM) - count(lit(1))).cast("long").as("v_zero"),
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoBits - r)")) +
          (lit(HllM) - count(lit(1))) * lit(TwoPow52)).as("z52"))

  /** Daily uniques, exact AND sketched: `n_exact` (count-distinct —
    * at audit scale; at 100 TB the register table IS the answer and
    * this column is the reconciliation) beside the portable integer
    * sketch moments. Fully oracle-checked — the float estimate
    * derived from (v_zero, z52) lives in [[eventDailyUniquesEst]].
    */
  def eventDailyUniques(t: Tables): DataFrame = {
    val exact = t.events
      .select(expr(
        s"ts_sec div ${graft.operators.Sequences.RetentionBucketSec}")
        .as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(hllMoments(t), Seq("day")).orderBy(col("day"))
  }

  def eventDailyUniquesSql: String =
    s"""WITH $hllCellsSql,
       |regs AS (SELECT day, bucket, MAX(rho) AS r FROM c GROUP BY 1, 2),
       |mom AS (SELECT day,
       |          CAST($HllM - COUNT(*) AS BIGINT) AS v_zero,
       |          CAST(SUM(CAST(1 AS BIGINT) << ($HllRhoBits - r))
       |            + ($HllM - COUNT(*)) * $TwoPow52 AS BIGINT) AS z52
       |        FROM regs GROUP BY day),
       |ex AS (SELECT day, COUNT(DISTINCT user_id) AS n_exact
       |       FROM e GROUP BY day)
       |SELECT day, n_exact, v_zero, z52
       |FROM ex JOIN mom USING (day) ORDER BY day""".stripMargin

  /** The corrected HLL estimate from exact integer moments — shared
    * by the batch entry, the spec reference, and the streaming twin
    * (same JVM, same expression, same values). Raw
    * αm²·2^52/z52 with the standard linear-counting switch for the
    * small range (raw ≤ 2.5m and empty registers remain).
    */
  private[graft] def hllEstimateFromMoments(vZero: Long, z52: Long): Double = {
    val raw = HllAlpha * HllM * HllM * TwoPow52.toDouble / z52
    if (raw <= 2.5 * HllM && vZero > 0)
      HllM * math.log(HllM.toDouble / vZero)
    else raw
  }

  /** [[hllEstimateFromMoments]] over a full register array. */
  private[graft] def hllEstimate(regs: Array[Int]): Double = {
    var z52 = 0L
    var v = 0L
    regs.foreach { r =>
      if (r == 0) v += 1
      z52 += 1L << (HllRhoBits - r)
    }
    hllEstimateFromMoments(v, z52)
  }

  /** MERGED sketch — the union property that makes HLL operational:
    * register-wise `max` of per-day sketches IS the sketch of the
    * union, so the month's total uniques come from the ≤ days·m-row
    * register table with NO rescan of events (and cross-corpus /
    * cross-cluster merges are the same one-line aggregate — sketches
    * mail well; raw user sets don't). Output: one row of global
    * (n_exact, v_zero, z52) — n_exact is the audit column, the
    * moments are the sketch answer, all exact integers, fully
    * oracle-checked. SketchesSpec pins the union property itself:
    * merged registers ≡ registers built from all events in one pass,
    * bucket for bucket.
    */
  def hllMergedUniques(t: Tables): DataFrame = {
    val merged = hllRegisters(t)
      .groupBy(col("bucket")).agg(max(col("r")).as("r"))
    val mom = merged
      .agg((lit(HllM) - count(lit(1))).cast("long").as("v_zero"),
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoBits - r)")) +
          (lit(HllM) - count(lit(1))) * lit(TwoPow52)).as("z52"))
    t.events.agg(countDistinct(col("user_id")).as("n_exact"))
      .crossJoin(mom)
  }

  def hllMergedUniquesSql: String =
    s"""WITH $hllCellsSql,
       |regs AS (SELECT day, bucket, MAX(rho) AS r FROM c GROUP BY 1, 2),
       |mg AS (SELECT bucket, MAX(r) AS r FROM regs GROUP BY 1),
       |mom AS (SELECT CAST($HllM - COUNT(*) AS BIGINT) AS v_zero,
       |          CAST(SUM(CAST(1 AS BIGINT) << ($HllRhoBits - r))
       |            + ($HllM - COUNT(*)) * $TwoPow52 AS BIGINT) AS z52
       |        FROM mg)
       |SELECT (SELECT COUNT(DISTINCT user_id) FROM e) AS n_exact,
       |  v_zero, z52
       |FROM mom""".stripMargin

  // -----------------------------------------------------------------
  // KMV (k-minimum-values) — bounded-memory set sketches whose UNION
  // and INTERSECTION estimates stay portable integers: the sketch is
  // the k smallest 60-bit md5 values of a source's distinct texts, so
  // Jaccard between sources is counted (not log-estimated) over the
  // union's k smallest — the cross-source overlap planner that never
  // joins corpora pairwise. Unlike HLL (union-only), KMV supports the
  // intersection estimate a dedup planner needs.
  // -----------------------------------------------------------------

  /** Sketch size. 64 keeps the relative error of the distinct-count
    * estimate near 1/√(k−2) ≈ 13% while letting the small-corpus
    * (< k distinct) EXACT branch exercise at sf0.01 and the estimator
    * branch at sf0.1 — both paths oracle-checked.
    */
  val KmvK = 64

  /** Per-source shard fan-out for the two-phase top-k (the
    * word_count_salted discipline): phase 1 takes each shard's k
    * smallest in a (source, hv % [[KmvShards]])-partitioned window —
    * every global top-k value is necessarily in its shard's top-k —
    * phase 2 ranks the ≤ shards·k survivors per source. No window ever
    * sees a full source's distinct set in one task.
    */
  val KmvShards = 32

  private val TwoPow60 = 1152921504606846976L

  /** 60 bits of md5 in the `kmv|` seed namespace (15 hex chars: always
    * positive in a long, identical in DuckDB's `('0x'||…)::BIGINT`).
    * Shared with the streaming twin so the hash cannot drift.
    */
  private[graft] def kmvHashCol(text: Column): Column =
    conv(substring(md5(concat(lit("kmv|"), text)), 1, 15), 16, 10)
      .cast("long")

  /** Distinct (source, hv) pairs over a document set. */
  private[graft] def kmvHashes(docs: DataFrame): DataFrame =
    docs.select(col("source"), kmvHashCol(col("text")).as("hv"))
      .distinct()

  /** The per-source sketch: (source, rk, hv), rk = 1..k over ascending
    * hv. ≤ [[KmvK]] rows per source no matter the corpus size.
    *
    * Scale: the distinct is one corpus shuffle with map-side partials;
    * the top-k is two-phase (see [[KmvShards]]) so no single task sorts
    * a whole source; the output is |sources|·k rows — mail-size, like
    * the HLL register table, and mergeable: the union sketch of two
    * sources is the k smallest of their sketches' union, computed
    * without touching the corpora again ([[reportSourceOverlap]]).
    */
  def kmvSketch(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hv = kmvHashes(t.documents)
    val shardW = Window.partitionBy(col("source"), pmod(col("hv"), lit(KmvShards)))
      .orderBy(col("hv"))
    val srcW = Window.partitionBy(col("source")).orderBy(col("hv"))
    hv.withColumn("srk", row_number().over(shardW))
      .filter(col("srk") <= KmvK)
      .withColumn("rk", row_number().over(srcW))
      .filter(col("rk") <= KmvK)
      .select(col("source"), col("rk"), col("hv"))
      .orderBy(col("source"), col("rk"))
  }

  def kmvSketchSql: String =
    s"""WITH d AS (SELECT DISTINCT source,
       |             ('0x' || substr(md5('kmv|' || text), 1, 15))::BIGINT AS hv
       |           FROM documents),
       |s1 AS (SELECT source, hv,
       |         row_number() OVER (PARTITION BY source, hv % $KmvShards
       |                            ORDER BY hv) AS srk
       |       FROM d)
       |SELECT source, rk, hv FROM (
       |  SELECT source, hv,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY hv) AS INT)
       |      AS rk
       |  FROM s1 WHERE srk <= $KmvK)
       |WHERE rk <= $KmvK
       |ORDER BY source, rk""".stripMargin

  /** Per-source distinct-text estimate FROM the sketch: when the
    * sketch is full, est = (k−1)·2^60 / hv_k (hv_k = the kth minimum);
    * when a source has fewer than k distinct texts the sketch IS the
    * set and the count is exact. (n_sketch, kth_hv) are exact integers;
    * `est6` is one IEEE multiply-divide + round6 — the q14 discipline.
    */
  def kmvEstimate(t: Tables): DataFrame = {
    import graft.functions.Portable.round6
    kmvSketch(t)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sketch"), max(col("hv")).as("kth_hv"))
      .select(col("source"), col("n_sketch"), col("kth_hv"),
        round6(when(col("n_sketch") < KmvK, col("n_sketch").cast("double"))
          .otherwise(lit((KmvK - 1).toDouble) * lit(TwoPow60.toDouble)
            / col("kth_hv").cast("double"))).as("est6"))
      .orderBy(col("source"))
  }

  def kmvEstimateSql: String = {
    import graft.functions.Portable.round6Sql
    s"""WITH sk AS ($kmvSketchSql),
       |ag AS (SELECT source, COUNT(*) AS n_sketch, MAX(hv) AS kth_hv
       |       FROM sk GROUP BY source)
       |SELECT source, n_sketch, kth_hv,
       |  ${round6Sql(
        s"CASE WHEN n_sketch < $KmvK THEN n_sketch::DOUBLE " +
          s"ELSE ${(KmvK - 1).toDouble}::DOUBLE * ${TwoPow60.toDouble}::DOUBLE " +
          s"/ kth_hv::DOUBLE END")} AS est6
       |FROM ag ORDER BY source""".stripMargin
  }

  /** Pairwise cross-source overlap from the sketches ALONE: for every
    * unordered source pair, take the k smallest distinct values of the
    * two sketches' union (a valid KMV sketch of the union set); count
    * how many of those live in BOTH sketches → Jaccard ≈ n_both/k_used.
    * The planner's answer to "which source pairs need a shared dedup
    * pass" at 100 TB: |S|²/2 pairs × k rows of SKETCH data — the
    * corpora themselves are never re-read, never joined.
    *
    * All counting is exact-integer and oracle-checked; `jacc_est6` is
    * one IEEE division + round6.
    */
  def reportSourceOverlap(t: Tables): DataFrame = {
    import graft.functions.Portable.round6
    import org.apache.spark.sql.expressions.Window
    val sk = kmvSketch(t).select(col("source"), col("hv"))
    val srcs = sk.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("src_a"))
      .crossJoin(srcs.select(col("source").as("src_b")))
      .filter(col("src_a") < col("src_b"))
    // tiny × tiny: tag each pair's member rows, dedup values present in
    // both sides, rank the union, keep its k smallest
    val tagged = broadcast(pairs)
      .join(sk, sk("source") === col("src_a") || sk("source") === col("src_b"))
      .groupBy(col("src_a"), col("src_b"), col("hv"))
      .agg(max(when(col("source") === col("src_a"), 1).otherwise(0)).as("in_a"),
        max(when(col("source") === col("src_b"), 1).otherwise(0)).as("in_b"))
    val unionW = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("hv"))
    tagged.withColumn("rk", row_number().over(unionW))
      .filter(col("rk") <= KmvK)
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("k_used"),
        sum(col("in_a") * col("in_b")).as("n_both"))
      .select(col("src_a"), col("src_b"), col("k_used"), col("n_both"),
        round6(col("n_both").cast("double") / col("k_used").cast("double"))
          .as("jacc_est6"))
      .orderBy(col("src_a"), col("src_b"))
  }

  def reportSourceOverlapSql: String = {
    import graft.functions.Portable.round6Sql
    s"""WITH sk AS ($kmvSketchSql),
       |srcs AS (SELECT DISTINCT source FROM sk),
       |pairs AS (SELECT a.source AS src_a, b.source AS src_b
       |          FROM srcs a, srcs b WHERE a.source < b.source),
       |tagged AS (SELECT p.src_a, p.src_b, s.hv,
       |             MAX(CASE WHEN s.source = p.src_a THEN 1 ELSE 0 END) AS in_a,
       |             MAX(CASE WHEN s.source = p.src_b THEN 1 ELSE 0 END) AS in_b
       |           FROM pairs p JOIN sk s
       |             ON s.source = p.src_a OR s.source = p.src_b
       |           GROUP BY 1, 2, 3),
       |rk AS (SELECT src_a, src_b, hv, in_a, in_b,
       |         row_number() OVER (PARTITION BY src_a, src_b
       |                            ORDER BY hv) AS rk
       |       FROM tagged)
       |SELECT src_a, src_b, COUNT(*) AS k_used,
       |  SUM(in_a * in_b)::BIGINT AS n_both,
       |  ${round6Sql("SUM(in_a * in_b)::DOUBLE / COUNT(*)::DOUBLE")} AS jacc_est6
       |FROM rk WHERE rk <= $KmvK
       |GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin
  }

  /** The estimate as a first-class query: (day, n_buckets, est6).
    * Declared rows-only — the linear-counting branch needs `ln`,
    * which is not bit-portable across engines (the tfidf rule);
    * SketchesSpec value-gates it against [[hllEstimateFromMoments]]
    * exactly and against the exact daily uniques within 5%.
    */
  def eventDailyUniquesEst(t: Tables): DataFrame = {
    import graft.functions.Portable.round6
    val k = lit(HllAlpha * HllM * HllM * TwoPow52.toDouble)
    val raw = k / col("z52").cast("double")
    hllMoments(t)
      .select(col("day"),
        (lit(HllM) - col("v_zero")).cast("long").as("n_buckets"),
        round6(when(raw <= lit(2.5 * HllM) && col("v_zero") > 0,
          lit(HllM.toDouble) *
            log(lit(HllM.toDouble) / col("v_zero").cast("double")))
          .otherwise(raw)).as("est6"))
      .orderBy(col("day"))
  }
}
