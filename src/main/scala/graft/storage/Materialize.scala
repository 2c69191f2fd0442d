package graft.storage

import graft.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared ensure-write machinery for per-corpus warehouse caches (the
  * materialized shingle store, the persisted IVF index, ...).
  *
  * The cache key hashes the corpus path AND the source table's file
  * inventory (name, length, mtime) AND a caller-supplied config string
  * (the constants baked into the cached data). A regenerated corpus or
  * a changed constant therefore produces a NEW cache directory instead
  * of silently serving stale data across JVM runs — the staleness mode
  * a bare path hash has.
  */
object Materialize {

  /** A warehouse store's identity — prefix, source table, and the
    * config string of constants baked into its bytes — as ONE shared
    * constant consumed by BOTH the ensure-write site and the reap
    * keep-set (ADVICE r8: the two used to be hand-duplicated strings,
    * so a retag that updated only one side — like r8's `|keep` suffix —
    * would make reap treat the live store as stale and delete it).
    */
  /** `extraTables` lists FURTHER source tables whose file inventories
    * fold into the tag — for stores aggregating several tables (the
    * Planner key-stats store reads six): any one of them regenerating
    * must retag the store, or the advisors serve stale statistics for
    * the tables that changed (ADVICE r15). Folding happens here, in
    * the ONE tag function both the ensure-write site and the reap
    * keep-set call, so the two cannot drift.
    */
  final case class StoreDef(prefix: String, table: String, config: String,
                            extraTables: Seq[String] = Nil) {
    def tag(t: Tables): String = {
      val cfg =
        if (extraTables.isEmpty) config
        else config + "|srcs=" +
          extraTables.map(tb => corpusTag(t, tb, "")).mkString(",")
      corpusTag(t, table, cfg)
    }
  }

  /** [[ensureParquet]] addressed by a [[StoreDef]]. */
  def ensureStore(t: Tables, s: StoreDef, df: => DataFrame,
                  partitionCols: Seq[String] = Nil): DataFrame =
    ensureParquet(t.spark, s.prefix, s.tag(t), df, partitionCols)

  /** Cache tag for `table` under `t.dir` given `config` (constants the
    * cached content depends on — bake in everything that changes the
    * bytes). Inventory listing goes through the Hadoop FileSystem for
    * `t.dir`, so the tag is corpus-change-sensitive on remote storage
    * (hdfs://, s3a://) as well as local paths.
    */
  def corpusTag(t: Tables, table: String, config: String): String = {
    val src = new Path(t.dir, s"$table.parquet")
    val fs = src.getFileSystem(t.spark.sessionState.newHadoopConf())
    val inventory =
      try fs.listStatus(src).sortBy(_.getPath.getName)
        .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
        .mkString(",")
      catch { case _: java.io.FileNotFoundException => "absent" }
    val key = s"${t.dir}|$table|$inventory|$config"
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
  }

  /** Delete every warehouse cache dir of `prefix` whose tag is not in
    * `keep`; returns the reaped dir names. Tag churn (corpus
    * regenerated, constants retuned, a store definition change like r8's
    * `|keep` suffix) orphans the previous `<prefix>_<tag>` dirs — the
    * ensure-write protocol never reads them again, but they hold a full
    * copy of the store each, which at 100 TB is real money. Matching is
    * strict (`<prefix>_` + exactly 12 hex chars), so a prefix that is
    * itself a prefix of another store's name (`graft_shingles` vs
    * `graft_shingles_keep`) can never reap the other store's dirs.
    * Operational maintenance, not a query-path call: run it AFTER
    * consumers of the old tags have drained, same contract as
    * `IndexMaintenance.retireOld`.
    */
  def reapStale(spark: SparkSession, prefix: String,
                keep: Set[String]): Seq[String] = {
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sessionState.newHadoopConf())
    val pat = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(prefix) + "_([0-9a-f]{12})")
    if (!fs.exists(wh)) Nil
    else fs.listStatus(wh).toSeq
      .filter(_.isDirectory)
      .flatMap { s =>
        val m = pat.matcher(s.getPath.getName)
        if (m.matches() && !keep.contains(m.group(1))) Some(s.getPath)
        else None
      }
      .map { p => fs.delete(p, true); p.getName }
  }

  /** Write `df` as parquet under the session warehouse at
    * `<prefix>_<tag>` unless already present; return the read-back
    * frame. `partitionCols` forwards to `partitionBy`.
    *
    * Publication is write-to-temp + single FS rename, so concurrent
    * callers sharing one warehouse (parallel suites, bench + test)
    * never observe a partially-written cache dir: either the rename
    * lands the complete directory, or it fails because another caller
    * already published and this caller's temp dir is discarded. (If a
    * racing rename on a dir-into-dir filesystem nests the temp dir
    * inside the winner's, its dot-prefixed name keeps Spark's file
    * index from ever reading it; the delete below reaps it.)
    */
  def ensureParquet(spark: SparkSession, prefix: String, tag: String,
                    df: => DataFrame,
                    partitionCols: Seq[String] = Nil): DataFrame =
    ensureParquetAt(spark, new Path(
      new Path(spark.conf.get("spark.sql.warehouse.dir")), s"${prefix}_$tag"),
      df, partitionCols)

  /** [[ensureParquet]] at an explicit destination path — for stores
    * whose layout is not `<warehouse>/<prefix>_<tag>` (e.g. the eval
    * corpus dir, which must look like a testdata dir:
    * `<root>/documents.parquet`). Same write-to-temp + rename
    * publication.
    */
  private[graft] def ensureParquetAt(spark: SparkSession, dst: Path,
                                     df: => DataFrame,
                                     partitionCols: Seq[String] = Nil): DataFrame = {
    val fs = dst.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(dst, "_SUCCESS"))) {
      val tmp = new Path(dst.getParent,
        s".${dst.getName}.inprogress-${java.util.UUID.randomUUID()}")
      val w = df.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(tmp.toString)
      if (fs.exists(dst) || !fs.rename(tmp, dst)) fs.delete(tmp, true)
      fs.delete(new Path(dst, tmp.getName), true) // reap a nested loser
    }
    spark.read.parquet(dst.toString)
  }
}
