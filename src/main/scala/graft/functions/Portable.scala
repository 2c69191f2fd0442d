package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic rounding.
  *
  * Engine `round(x, 6)` implementations disagree at exact `.5e-6`
  * boundaries: Spark rounds the shortest-decimal representation of the
  * double HALF_UP (BigDecimal), DuckDB rounds in double space — e.g.
  * quality = 0.5233125 → 0.523313 (Spark) vs 0.523312 (DuckDB), a real
  * mismatch caught by the sf0.1 self-check. `floor(x * 1e6 + 0.5) / 1e6`
  * is plain IEEE arithmetic; computed with the same literal sequence in
  * both engines it is bit-identical by construction. Ratio-valued
  * outputs (quality weights, jaccard, cosines) hit these boundaries in
  * practice — every 6 dp boundary crossing in graft uses this form.
  */
object Portable {

  /** Half-up round to 6 dp in pure double arithmetic. */
  def round6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** The identical DuckDB expression for [[round6]]. */
  def round6Sql(e: String): String =
    s"floor(($e) * 1000000::DOUBLE + 0.5::DOUBLE) / 1000000::DOUBLE"

  /** [[round6]] as plain JVM double arithmetic — the identical IEEE
    * operation sequence for code outside Catalyst (streaming state
    * logic, spec-side oracles). A threshold compared after THIS rounding
    * is bit-identical to the batch Column form; comparing the raw ratio
    * instead silently shifts the boundary by up to 5e-7
    * (streaming.Jobs.ClusterAssignStream's verify gate pins this).
    */
  def round6Double(x: Double): Double =
    math.floor(x * 1000000.0 + 0.5) / 1000000.0

  /** Word-shingle generator over a token-array column named `ts`:
    * `transform(sequence(...), i -> concat_ws(...))`. The caller must
    * pre-filter `size(ts) >= n` — Spark's `sequence(1, k)` DESCENDS for
    * k < 1 (DuckDB's generate_series is empty), so an unguarded short
    * doc would produce phantom shingles in Spark only. One definition
    * for the three shingle-based ops (minhash/jaccard, fingerprint,
    * top-ngrams).
    */
  def shingleExpr(n: Int, tokensCol: String = "ts"): String =
    s"transform(sequence(1, size($tokensCol) - ${n - 1}), " +
      s"i -> concat_ws(' ', slice($tokensCol, i, $n)))"

  /** Sign-LSH bucket id from `bits` dimensions of a vector column named
    * `v`, starting at dimension `offset`: bit i set iff
    * v[offset + i] > 0. One generator for both engines — the only
    * difference is array indexing base (Spark 0-, DuckDB 1-based), which
    * this encapsulates so the call sites (dedup + ANN single/multi-table,
    * Spark + SQL) cannot drift. `offset` gives each hash table of a
    * multi-table LSH index its own dimension slice.
    */
  def signBucketExpr(bits: Int, oneBasedIndex: Boolean, offset: Int = 0): String =
    (0 until bits).map { i =>
      val idx = offset + i + (if (oneBasedIndex) 1 else 0)
      s"(CASE WHEN v[$idx] > 0 THEN ${1 << (bits - 1 - i)} ELSE 0 END)"
    }.mkString(" + ")

  /** ADAPTIVE sign-LSH width: the bucket-bit count as a pure integer
    * CASE ladder over a corpus-count reference — `bits = k` when
    * `count ≥ target·2^k`, clamped to [minBits, maxBits]. Fixed bits
    * are a scale bug, not a tuning choice: expected bucket occupancy is
    * n/2^bits, so a bucket SELF-join over a constant width grows
    * quadratically with the corpus (the r8 10× bench measured the
    * embedding dedup family at ~100× cost for 10× data). Width must
    * grow with log(n) to hold occupancy ≈ target. Integer comparisons
    * on purpose — a float `floor(log2(n/target))` can flip at boundary
    * counts when two engines' libm differ in the last ulp; a CASE
    * ladder over integer thresholds is bit-free and identical in Spark
    * SQL and DuckDB, so the oracle stays exact at EVERY corpus size.
    */
  def bucketBitsSql(countRef: String, minBits: Int, maxBits: Int,
                    target: Int): String =
    (maxBits to (minBits + 1) by -1)
      .map(k => s"WHEN $countRef >= ${target.toLong << k} THEN $k")
      .mkString("(CASE ", " ", s" ELSE $minBits END)")

  /** Scala twin of [[bucketBitsSql]] — the same integer thresholds, so
    * a plan-build-time literal width and the oracle's data-derived one
    * can never disagree.
    */
  def bucketBits(n: Long, minBits: Int, maxBits: Int, target: Int): Int = {
    var k = minBits
    while (k < maxBits && n >= (target.toLong << (k + 1))) k += 1
    k
  }
}
