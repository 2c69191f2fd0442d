package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Generation store for the CCNet per-language BOUNDARY TABLE
  * (`pipeline.Mixing.ccnetBounds` — lang, s1, s2), so a long-running
  * intake job (`streaming.Jobs.LmBucketStream`) rolls to fresh terciles
  * as the corpus score distribution shifts, without a batch re-bucket
  * of anything: the periodic batch job recomputes the langs×2 table
  * (cheap — OrderStat histogram search over the materialized score
  * store), publishes it as a generation, and the intake job picks it up
  * on roll. Readers mid-run keep the generation they resolved —
  * generations are immutable until [[retireOld]] — so every doc
  * bucketed by one job incarnation used ONE consistent boundary table,
  * and the generation number in the path records which.
  *
  * Layout and commit semantics are [[Generations]] (shared with
  * [[ClusterStore]]): `<root>/gen=<n>/bounds/` parquet, committed at
  * the `_SUCCESS` rename; current = highest committed.
  */
object BoundsStore {

  private val Artifact = "bounds"

  def boundsPath(root: String, n: Long): String =
    Generations.path(root, n, Artifact)

  def committedGenerations(root: String,
                           conf: Configuration = new Configuration()): Seq[Long] =
    Generations.committed(root, Artifact, conf)

  def currentGeneration(root: String,
                        conf: Configuration = new Configuration()): Option[Long] =
    Generations.current(root, Artifact, conf)

  /** Write `bounds` (lang, s1, s2) as the next generation and return
    * its number.
    */
  def publishGeneration(spark: SparkSession, root: String,
                        bounds: DataFrame): Long =
    Generations.publish(root, Artifact, bounds)

  /** Publish the current batch boundary table for `t`'s corpus. */
  def publishFrom(t: graft.Tables, root: String): Long =
    publishGeneration(t.spark, root, graft.pipeline.Mixing.ccnetBounds(t))

  def readBounds(spark: SparkSession, root: String, n: Long): DataFrame =
    spark.read.parquet(boundsPath(root, n))
      .select(col("lang"), col("s1"), col("s2"))

  def retireOld(root: String, keep: Int = 2,
                conf: Configuration = new Configuration()): Seq[Long] =
    Generations.retireOld(root, Artifact, keep, conf)
}
