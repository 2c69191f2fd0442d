package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles.
  *
  * AQE's skew-join handling splits oversized SHUFFLE partitions, but it
  * cannot help a skewed AGGREGATION key or a skewed broadcast-bucket
  * (e.g. one stop-shingle LSH band holding 1% of a 100 TB corpus).
  * Salting fans one hot key out over `n` deterministic sub-keys, paying
  * one extra partial-agg/merge step for an n-way spread of the hot key.
  *
  * The salt is `pmod(hash(idCol), n)` — deterministic (replay-safe, no
  * rand()) and uniform.
  */
object Salting {

  def salt(idCol: Column, n: Int): Column = pmod(hash(idCol), lit(n))

  /** Two-phase salted aggregation: count per (key, salt) — the hot key
    * spreads over n tasks — then merge per key. Result is identical to
    * `df.groupBy(key).count()`; the hot key's first-phase work is
    * parallelized n ways.
    */
  def saltedCount(df: DataFrame, key: String, idCol: String,
                  n: Int = 16): DataFrame =
    saltedCountBy(df, key, col(idCol), n)

  /** [[saltedCount]] with an explicit salt-source expression — for
    * frames with no single natural id column (Planner.applySkew salts
    * on the whole row struct MIXED WITH `monotonically_increasing_id`:
    * row content alone sends fully-identical duplicate rows of a hot
    * key to ONE salt bucket, un-mitigating exactly the duplicate-heavy
    * skew the salt targets — ADVICE r16).
    *
    * CAVEAT (ADVICE r17): a POSITION-based salt source
    * (`monotonically_increasing_id`, `spark_partition_id`) requires
    * deterministic upstream partition ordering — true of scan-rooted
    * frames (parquet splits enumerate deterministically), NOT of
    * post-shuffle frames, where a fetch-failure partial recompute can
    * reassign positions on recomputed map outputs and double-count/
    * drop rows BETWEEN the two aggregation phases. Salt a shuffled
    * frame on row CONTENT (a column set disambiguating the hot key's
    * rows) instead; the position mix is for scan-rooted inputs like
    * applySkew's base tables.
    */
  def saltedCountBy(df: DataFrame, key: String, saltSrc: Column,
                    n: Int): DataFrame =
    df.withColumn("_salt", salt(saltSrc, n))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).cast("long").as("cnt"))
}
