package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** The single-artifact GENERATION protocol shared by every store that
  * rolls one immutable table under a root directory: layout
  * `<root>/gen=<n>/<artifact>/` parquet, committed at the write's
  * `_SUCCESS` marker, current = highest committed, retirement drops
  * whole `gen=<n>` directories oldest-first. One implementation
  * consumed by [[ClusterStore]] (cluster labels) and [[BoundsStore]]
  * (ccnet boundary tables) so the commit/list/retire semantics can
  * never drift between them — the same single-definition discipline as
  * `Materialize.StoreDef`. [[IndexMaintenance]] keeps its own
  * FOUR-artifact single-marker commit (centroids + codebooks + codes +
  * norms must swap atomically); that is a different atomicity contract,
  * deliberately not unified.
  */
private[graft] object Generations {

  def path(root: String, n: Long, artifact: String): String =
    s"$root/gen=$n/$artifact"

  /** Generation numbers with a committed artifact, ascending. */
  def committed(root: String, artifact: String,
                conf: Configuration = new Configuration()): Seq[Long] = {
    val r = new Path(root)
    val fs = r.getFileSystem(conf)
    if (!fs.exists(r)) Nil
    else fs.listStatus(r).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
      .filter(n => fs.exists(new Path(r, s"gen=$n/$artifact/_SUCCESS")))
      .sorted
  }

  def current(root: String, artifact: String,
              conf: Configuration = new Configuration()): Option[Long] =
    committed(root, artifact, conf).lastOption

  /** Write `df` as the next generation's artifact and return its
    * number. The parquet `_SUCCESS` marker IS the commit: a reader
    * listing generations mid-write never sees the new one until the
    * rename lands.
    */
  def publish(root: String, artifact: String, df: DataFrame): Long = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val n = committed(root, artifact, conf).lastOption.getOrElse(-1L) + 1
    df.write.mode("overwrite").parquet(path(root, n, artifact))
    n
  }

  /** Delete all but the newest `keep` committed generations (run after
    * readers drain — a pinned reader holds its generation only because
    * generations are immutable until retired).
    */
  def retireOld(root: String, artifact: String, keep: Int,
                conf: Configuration = new Configuration()): Seq[Long] = {
    val gens = committed(root, artifact, conf)
    val retire = gens.dropRight(keep)
    val fs = new Path(root).getFileSystem(conf)
    retire.foreach(n => fs.delete(new Path(s"$root/gen=$n"), true))
    retire
  }

  /** What [[vacuum]] would delete — the GC audit a long-lived store
    * root needs and [[retireOld]] doesn't cover: committed generations
    * beyond the newest `keep`, PLUS dead uncommitted directories
    * (a crashed write leaves `gen=<n>/` with no `_SUCCESS`; it is
    * provably dead once a HIGHER generation has committed, because
    * [[publish]] numbers strictly above the last committed one — an
    * uncommitted dir at or above the current generation may be a
    * write in flight and is never touched). Returns
    * (gen, wasCommitted) ascending; nothing is deleted.
    */
  def vacuumPlan(root: String, artifact: String, keep: Int,
                 conf: Configuration = new Configuration())
      : Seq[(Long, Boolean)] = {
    val r = new Path(root)
    val fs = r.getFileSystem(conf)
    if (!fs.exists(r)) return Nil
    val all = fs.listStatus(r).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .flatMap(s => s.getPath.getName.stripPrefix("gen=").toLongOption)
    val comm = committed(root, artifact, conf)
    val cur = comm.lastOption.getOrElse(Long.MinValue)
    val retire = comm.dropRight(keep).map(_ -> true)
    val orphans = all.filterNot(comm.contains).filter(_ < cur)
      .map(_ -> false)
    (retire ++ orphans).sortBy(_._1)
  }

  /** Execute [[vacuumPlan]]: delete the planned directories, return
    * the deleted generation numbers. Run after pinned readers drain,
    * like [[retireOld]].
    */
  def vacuum(root: String, artifact: String, keep: Int,
             conf: Configuration = new Configuration()): Seq[Long] = {
    val plan = vacuumPlan(root, artifact, keep, conf)
    val fs = new Path(root).getFileSystem(conf)
    plan.foreach { case (n, _) =>
      fs.delete(new Path(s"$root/gen=$n"), true); ()
    }
    plan.map(_._1)
  }
}
