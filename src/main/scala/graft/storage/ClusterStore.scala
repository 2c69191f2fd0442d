package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Generation store for near-dup CLUSTER LABELS — the
  * [[IndexMaintenance]] protocol applied to `dedup_clusters` output, so
  * a long-running intake job (`streaming.Jobs.ClusterAssignStream`) can
  * pin its keeper table to a COMMITTED generation the way PQ probes pin
  * to a quantizer generation. Without it the stream memoizes whatever
  * labels existed at job start and never observes a batch recluster;
  * with it, "deploy new clusters" = publish a generation and restart
  * (or roll) the intake job — readers mid-run keep the generation they
  * resolved, because generations are immutable until [[retireOld]].
  *
  * Layout and commit semantics are [[Generations]] (shared with
  * [[BoundsStore]]): `<root>/gen=<n>/labels/` — (doc_id, keeper_id,
  * cluster_size) parquet, committed at the `_SUCCESS` rename; current =
  * highest committed.
  */
object ClusterStore {

  private val Artifact = "labels"

  def labelsPath(root: String, n: Long): String =
    Generations.path(root, n, Artifact)

  def committedGenerations(root: String,
                           conf: Configuration = new Configuration()): Seq[Long] =
    Generations.committed(root, Artifact, conf)

  def currentGeneration(root: String,
                        conf: Configuration = new Configuration()): Option[Long] =
    Generations.current(root, Artifact, conf)

  /** Write `labels` (doc_id, keeper_id, cluster_size) as the next
    * generation and return its number.
    */
  def publishGeneration(spark: SparkSession, root: String,
                        labels: DataFrame): Long =
    Generations.publish(root, Artifact, labels)

  /** Publish the batch `dedup_clusters` labels for `t`'s corpus — the
    * periodic recompute that merges clusters incremental assignment
    * cannot (a bridging doc joins the min-keeper cluster at intake;
    * only the batch fixpoint unifies the two).
    */
  def publishFrom(t: graft.Tables, root: String): Long =
    publishGeneration(t.spark, root, graft.dedup.Dedup.nearDupClusters(t))

  def readLabels(spark: SparkSession, root: String, n: Long): DataFrame =
    spark.read.parquet(labelsPath(root, n))
      .select(col("doc_id"), col("keeper_id"), col("cluster_size"))

  /** Delete all but the newest `keep` generations (run after readers
    * drain — same contract as [[IndexMaintenance.retireOld]]).
    */
  def retireOld(root: String, keep: Int = 2,
                conf: Configuration = new Configuration()): Seq[Long] =
    Generations.retireOld(root, Artifact, keep, conf)
}
