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
}
