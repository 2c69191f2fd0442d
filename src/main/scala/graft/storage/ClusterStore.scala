package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
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
  * Layout: `<root>/gen=<n>/labels/` — (doc_id, keeper_id,
  * cluster_size) parquet, committed at the `_SUCCESS` rename; current =
  * highest committed, same single-marker atomicity as the index store.
  */
object ClusterStore {

  def labelsPath(root: String, n: Long): String = s"$root/gen=$n/labels"

  def committedGenerations(root: String,
                           conf: Configuration = new Configuration()): Seq[Long] = {
    val r = new Path(root)
    val fs = r.getFileSystem(conf)
    if (!fs.exists(r)) Nil
    else fs.listStatus(r).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
      .filter(n => fs.exists(new Path(r, s"gen=$n/labels/_SUCCESS")))
      .sorted
  }

  def currentGeneration(root: String,
                        conf: Configuration = new Configuration()): Option[Long] =
    committedGenerations(root, conf).lastOption

  /** Write `labels` (doc_id, keeper_id, cluster_size) as the next
    * generation and return its number.
    */
  def publishGeneration(spark: SparkSession, root: String,
                        labels: DataFrame): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val n = committedGenerations(root, conf).lastOption.getOrElse(-1L) + 1
    labels.write.mode("overwrite").parquet(labelsPath(root, n))
    n
  }

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
                conf: Configuration = new Configuration()): Seq[Long] = {
    val gens = committedGenerations(root, conf)
    val retire = gens.dropRight(keep)
    val fs = new Path(root).getFileSystem(conf)
    retire.foreach(n => fs.delete(new Path(s"$root/gen=$n"), true))
    retire
  }
}
