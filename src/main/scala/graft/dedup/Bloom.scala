package graft.dedup

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter MEMBERSHIP GATE over exact text classes — the
  * sublinear-memory pre-filter in front of exact dedup: an intake
  * stream (or a growth-step batch) asks "possibly already in the
  * corpus?" against a few hundred KB of bits instead of shuffling
  * against the corpus's hash set. Misses are DEFINITIVE (no false
  * negatives — a clean doc skips the expensive dedup join entirely);
  * hits go on to the exact md5 check, so a false positive costs one
  * lookup, never correctness.
  *
  * Everything is portable arithmetic: bit positions are md5-derived
  * (`int(md5("bl<i>|" + text)[0:8]) mod m` — the [[graft.pipeline
  * .Mixing]] coin discipline, one seed namespace per hash function),
  * words hold 63 bits (the sign bit stays unused: DuckDB range-checks
  * `1 << 63`), and the filter itself is a (word_idx, bits) table built
  * by ONE `bit_or` aggregation — so the oracle reproduces the exact
  * same bits, and even the false-positive set is deterministic and
  * hash-checked cross-engine.
  *
  * Scale: the build is one pass + a ≤`words`-group aggregation (the
  * shuffle carries k rows per doc, each 16 bytes); the probe is a
  * broadcast join against the ≤`words`-row filter + a per-doc min —
  * the corpus never shuffles. At 100 TB size `words` for the expected
  * class count (m ≈ 1.44·k·n bits for the target FP rate) and the
  * filter is still MBs — broadcastable — while the hash-set
  * equivalent is the corpus itself.
  */
object Bloom {

  /** 63 usable bits per word — 258048 bits at the default size. */
  val WordBits = 63L
  val BloomWords = 4096
  val BloomK = 4

  /** Bit position of hash function `i` for a text — md5 in its own
    * `bl<i>` seed namespace, mod the filter's bit count.
    */
  private def posCol(i: Int, text: Column, mBits: Long): Column =
    conv(substring(md5(concat(lit(s"bl$i|"), text)), 1, 8), 16, 10)
      .cast("long") % mBits

  private def posArray(text: Column, mBits: Long, k: Int): Column =
    array((0 until k).map(i => posCol(i, text, mBits)): _*)

  /** The filter: (word_idx, bits) rows, one `bit_or` aggregation over
    * k positions per doc. Sparse — absent words are all-zero.
    */
  def bloomOf(docs: DataFrame, words: Int = BloomWords,
              k: Int = BloomK): DataFrame =
    docs
      .select(explode(posArray(col("text"), words * WordBits, k)).as("pos"))
      .select(expr(s"pos div $WordBits").as("word_idx"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $WordBits AS INT))")
          .as("mask"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(mask)").as("bits"))

  /** Membership probe: hit = 1 iff ALL k bits are set (an absent word
    * is all-zero — the left-join null falls to the otherwise(0)
    * branch). The filter side is broadcast; the probe never shuffles
    * the corpus beyond the per-doc min.
    */
  def bloomProbe(docs: DataFrame, bloom: DataFrame,
                 words: Int = BloomWords, k: Int = BloomK): DataFrame =
    docs
      .select(col("doc_id"),
        explode(posArray(col("text"), words * WordBits, k)).as("pos"))
      .select(col("doc_id"), expr(s"pos div $WordBits").as("word_idx"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $WordBits AS INT))")
          .as("mask"))
      .join(broadcast(bloom), Seq("word_idx"), "left")
      .groupBy(col("doc_id"))
      .agg(min(when(expr("bits & mask") === col("mask"), 1).otherwise(0))
        .as("hit"))

  /** The filter as a dense driver-side array (index = word_idx) — a
    * `words`-long bounded collect (32 KB at the default size), the
    * broadcast-literal form the STATELESS streaming gate compiles
    * into its row expression.
    */
  def bloomArray(bloom: DataFrame, words: Int = BloomWords): Seq[Long] = {
    val byIdx = bloom.collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    Seq.tabulate(words)(byIdx.getOrElse(_, 0L))
  }

  /** Fully MAP-SIDE membership column against the literal filter
    * array: no join, no aggregation — the form a stateless streaming
    * gate needs (and bit-identical to [[bloomProbe]], spec-pinned).
    */
  def hitCol(text: Column, bloomArr: Seq[Long], k: Int = BloomK): Column = {
    val words = bloomArr.length
    val arr = typedLit(bloomArr)
    val conds = (0 until k).map { i =>
      val pos = posCol(i, text, words * WordBits)
      val word = element_at(arr,
        call_function("div", pos, lit(WordBits)).cast("int") + 1)
      val mask = call_function("shiftleft", lit(1L),
        (pos % WordBits).cast("int"))
      word.bitwiseAND(mask) === mask
    }
    when(conds.reduce(_ && _), 1).otherwise(0)
  }

  /** `bloom_dup_candidates` — the growth-step dup pre-filter: the
    * filter is built from the FIRST-HALF corpus prefix (doc_id ≤
    * max/2, the [[Dedup.nearDupClustersDelta]] growth convention) and
    * every doc probes it. Prefix docs and exact dups of prefix texts
    * hit by construction (no false negatives — DedupSpec pins it);
    * novel-text hits are the deterministic false-positive set, and
    * the oracle reproduces them bit-for-bit.
    */
  def bloomDupCandidates(t: Tables): DataFrame = {
    val cutoff = t.documents.agg(max(col("doc_id"))).head.getLong(0) / 2
    val bloom = bloomOf(t.documents.filter(col("doc_id") <= cutoff))
    bloomProbe(t.documents, bloom).orderBy(col("doc_id"))
  }

  def bloomDupCandidatesSql: String = {
    val m = BloomWords * WordBits
    def posSql(textExpr: String) =
      s"(('0x' || substr(md5('bl' || i || '|' || $textExpr), 1, 8))::BIGINT % $m)"
    s"""WITH pfx AS (SELECT text FROM documents
       |  WHERE doc_id <= (SELECT max(doc_id) // 2 FROM documents)),
       |bpos AS (SELECT ${posSql("text")} AS pos
       |         FROM pfx, range($BloomK) t(i)),
       |bloom AS (SELECT pos // $WordBits AS word_idx,
       |            bit_or(1::BIGINT << CAST(pos % $WordBits AS INT)) AS bits
       |          FROM bpos GROUP BY 1),
       |ppos AS (SELECT d.doc_id, ${posSql("d.text")} AS pos
       |         FROM documents d, range($BloomK) t(i)),
       |pm AS (SELECT doc_id, pos // $WordBits AS word_idx,
       |         1::BIGINT << CAST(pos % $WordBits AS INT) AS mask
       |       FROM ppos)
       |SELECT pm.doc_id,
       |  MIN(CASE WHEN (b.bits & pm.mask) = pm.mask THEN 1 ELSE 0 END)
       |    AS hit
       |FROM pm LEFT JOIN bloom b USING (word_idx)
       |GROUP BY pm.doc_id
       |ORDER BY pm.doc_id""".stripMargin
  }
}
