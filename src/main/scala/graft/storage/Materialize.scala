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

  // ------------------------------------------------- incremental stores
  //
  // The classic ensure protocol above keys the WHOLE store on the
  // source table's file inventory: any corpus change — including pure
  // GROWTH, the normal life of a training corpus — orphans the store
  // and the next reader re-tokenizes every document ever ingested.
  // At 100 TB that is the single biggest recurring cost a per-doc-pure
  // store can waste: the store's rows for unchanged files are already
  // correct, only the new files' rows are missing (VERDICT r16 #1).
  //
  // The INCREMENTAL protocol below fixes exactly that for stores whose
  // rows are a PER-FILE-PURE function of the source (each source file's
  // docs contribute rows independently — window hashes, shingles,
  // chunk hashes; NOT keeper-filtered stores, whose keeper election is
  // corpus-global and can flip on any arrival). Layout:
  //
  //   <warehouse>/<prefix>_gens_<stableTag>/gen=<n>/rows/       segment
  //   <warehouse>/<prefix>_gens_<stableTag>/gen=<n>/inventory/  manifest
  //
  // `stableTag` hashes (corpus dir, table, config) but NOT the file
  // inventory — the root survives growth, which is the whole point.
  // Each generation is a [[Generations]]-committed SEGMENT: gen 0 (and
  // any generation whose manifest says `base = true`) holds a full
  // build; a growth generation holds ONLY the new files' rows, plus a
  // manifest recording the cumulative inventory it covers. Reading the
  // store = one parquet read over the segment paths since the last
  // base — columnar, no merge work. A REWRITE (any previously-recorded
  // file changed or vanished) is not growth: the store re-bases with a
  // fresh full build, because per-file purity says nothing about rows
  // derived from bytes that no longer exist. Publication is
  // write-to-temp + one directory rename with the parquet _SUCCESS
  // inside ([[Generations]]' commit marker), so a concurrent reader
  // never observes a half-written generation.

  /** Data-file inventory of `t.dir/<table>.parquet`: (name, len,
    * mtime) per part file, sorted by name — underscore/dot entries
    * (_SUCCESS, temp dirs) excluded because only data files produce
    * store rows.
    */
  private def dataFiles(t: Tables, table: String)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    val src = new Path(t.dir, s"$table.parquet")
    val fs = src.getFileSystem(t.spark.sessionState.newHadoopConf())
    fs.listStatus(src).toSeq
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
  }

  /** The growth-stable tag of an incremental store: corpus dir + table
    * + config, NO inventory — the root must survive corpus growth.
    */
  private[graft] def stableTag(t: Tables, s: StoreDef): String = {
    val key = s"${t.dir}|${s.table}|${s.config}"
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
  }

  private[graft] def incRootName(t: Tables, s: StoreDef): String =
    s"${s.prefix}_gens_${stableTag(t, s)}"

  private def incRoot(t: Tables, s: StoreDef): Path = new Path(
    new Path(t.spark.conf.get("spark.sql.warehouse.dir")), incRootName(t, s))

  private[storage] val RowsArtifact = "rows"
  private[storage] val InvArtifact = "inventory"

  /** Ensure the incremental store of `s` is current for `t`'s corpus
    * and return it. `buildFrom` maps a frame of SOURCE rows (the whole
    * table on first build / rebase, ONLY the new files on growth) to
    * the store rows those source rows contribute — it must be
    * per-file-pure: `buildFrom(a union b) ≡ buildFrom(a) union
    * buildFrom(b)` row-for-row, which holds exactly when each output
    * row derives from one input row (MaterializeSpec pins appended ≡
    * from-scratch and that the growth build's scan touched only the
    * new files).
    *
    * A build with a per-KEY reduction inside (the shingle store's
    * per-doc `.distinct()`) is per-file-pure only while no key recurs
    * across source files: a growth batch RE-DELIVERING an existing
    * doc_id would emit the doc's rows into a second segment next to
    * the first — duplicate rows a from-scratch build would have
    * collapsed (ADVICE r18). That invariant is the corpus's doc_id
    * primary key, enforced loudly by [[graft.Tables.validateDocuments]]
    * (ContractSpec pins the doctored re-delivery refused with the id
    * named), not re-checked per ensure.
    */
  def ensureIncremental(t: Tables, s: StoreDef,
                        buildFrom: DataFrame => DataFrame): DataFrame =
    ensureIncrementalWithGen(t, s, buildFrom)._2

  /** [[ensureIncremental]] also returning the generation number the
    * frame is pinned at — the handle a LONG-LIVED reader (a streaming
    * job's static side) folds into its cache key, so a RESTARTED job
    * re-resolves to the grown store while the running job keeps
    * serving its immutable pinned chain (VERDICT r16 #4; the
    * `ClusterStore.readLabels` deployment shape).
    */
  def ensureIncrementalWithGen(t: Tables, s: StoreDef,
                               buildFrom: DataFrame => DataFrame)
      : (Long, DataFrame) = {
    val spark = t.spark
    val conf = spark.sessionState.newHadoopConf()
    val root = incRoot(t, s)
    val cur = dataFiles(t, s.table)
    val curKeys = cur.map(f =>
      (f.getPath.getName, f.getLen, f.getModificationTime))

    def readFrom(files: Seq[org.apache.hadoop.fs.FileStatus]): DataFrame =
      spark.read.parquet(files.map(_.getPath.toString): _*)

    def publish(n: Long, rows: DataFrame, base: Boolean,
                inv: Seq[(String, Long, Long)]): Unit = {
      import spark.implicits._
      val fs = root.getFileSystem(conf)
      val tmp = new Path(root,
        s".gen=$n.inprogress-${java.util.UUID.randomUUID()}")
      inv.map { case (f, l, m) => (f, l, m, base) }
        .toDF("file", "len", "mtime", "base")
        .coalesce(1)
        .write.parquet(new Path(tmp, InvArtifact).toString)
      rows.write.parquet(new Path(tmp, RowsArtifact).toString)
      val dst = new Path(root, s"gen=$n")
      // rename-fails-on-existing-destination: the exists pre-check keeps
      // a dir-into-dir filesystem (HDFS) from nesting tmp INSIDE a
      // concurrent winner's committed generation instead of returning
      // false (ADVICE r17)
      val committed = !fs.exists(dst) && fs.rename(tmp, dst)
      if (!committed) {
        fs.delete(tmp, true)
        fs.delete(new Path(dst, tmp.getName), true) // reap a nested loser
        // A failed publish must never be SILENT: either a concurrent
        // writer committed this (or a later) generation — the ensure
        // loop below re-reads ITS manifest and recomputes the pending
        // decision against the locally observed inventory — or the
        // rename genuinely failed and returning would serve a stale
        // store as fresh (the reader contract: rows for every current
        // inventory file).
        val now = Generations.committed(root.toString, RowsArtifact, conf)
        if (!now.exists(_ >= n))
          throw new java.io.IOException(
            s"failed to publish gen=$n under $root and no concurrent " +
              "writer committed it — refusing to serve the stale store")
      }
    }

    def manifest(n: Long): Seq[(String, Long, Long)] = spark.read
      .parquet(Generations.path(root.toString, n, InvArtifact))
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // settled iff the newest committed manifest covers every locally
    // observed inventory file (byte-identically). NOT "a publish
    // happened": a lost race's winner may have listed the source
    // BEFORE files this writer saw arrived — returning then would
    // serve a store missing those files' rows until the next ensure
    // (ADVICE r18). The loop re-reads the winner's manifest and
    // recomputes the pending decision (growth over exactly the files
    // the winner missed / re-base) until coverage holds; bounded —
    // each pass either settles or commits a strictly newer generation.
    def settled(): Boolean = {
      val gens = Generations.committed(root.toString, RowsArtifact, conf)
      gens.nonEmpty && {
        val rec = manifest(gens.last).toSet
        curKeys.forall(rec.contains)
      }
    }

    var attempts = 0
    while (!settled()) {
      attempts += 1
      if (attempts > 4)
        throw new java.io.IOException(
          s"ensure of $root failed to converge after $attempts attempts " +
            "— committed manifests keep missing locally observed files")
      val gens = Generations.committed(root.toString, RowsArtifact, conf)
      if (gens.isEmpty) {
        publish(0L, buildFrom(readFrom(cur)), base = true, curKeys)
      } else {
        val recorded = manifest(gens.last)
        val recordedNames = recorded.map(_._1).toSet
        val growthOnly = recorded.forall(curKeys.contains)
        val newFiles = cur.filterNot(f => recordedNames(f.getPath.getName))
        if (growthOnly) {
          publish(gens.last + 1, buildFrom(readFrom(newFiles)),
            base = false, curKeys)
        } else {
          // rewrite: previously-covered bytes changed — re-base
          publish(gens.last + 1, buildFrom(readFrom(cur)),
            base = true, curKeys)
        }
      }
    }
    val cur2 = Generations.committed(root.toString, RowsArtifact, conf)
    require(cur2.nonEmpty,
      s"no committed generation under $root after ensure — " +
        "publish neither landed nor found a concurrent winner")
    (cur2.last, readIncrementalAt(spark, root.toString, cur2.last))
  }

  /** Current committed generation of an incremental root — the number
    * a long-lived reader PINS at start (generations are immutable
    * until retired, the [[Generations]] contract), so a stream job
    * observes store growth on ROLL (restart re-resolves) instead of
    * memoizing a session-lifetime static side (VERDICT r16 #4; the
    * `ClusterStore.readLabels` deployment shape).
    */
  def currentIncrementalGen(spark: SparkSession, root: String): Option[Long] =
    Generations.current(root, RowsArtifact,
      spark.sessionState.newHadoopConf())

  /** Read an incremental root AT a pinned generation: the segment
    * chain from that generation's last base through it. Every dir in
    * the chain is immutable while committed, so the frame is stable
    * for the reader's lifetime regardless of later growth.
    */
  def readIncrementalAt(spark: SparkSession, root: String,
                        gen: Long): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val gens = Generations.committed(root, RowsArtifact, conf)
      .filter(_ <= gen)
    require(gens.nonEmpty, s"no committed generation <= $gen under $root")
    val since = gens.reverse.find { n =>
      spark.read.parquet(Generations.path(root, n, InvArtifact))
        .select("base").head.getBoolean(0)
    }.getOrElse(0L)
    spark.read.parquet(gens.filter(_ >= since)
      .map(n => Generations.path(root, n, RowsArtifact)): _*)
  }

  /** The files a growth pass would read right now: (new files,
    * isRewrite) — the decision surface MaterializeSpec pins without
    * re-running a build.
    */
  private[graft] def incrementalPending(t: Tables, s: StoreDef)
      : (Seq[String], Boolean) = {
    val conf = t.spark.sessionState.newHadoopConf()
    val root = incRoot(t, s)
    val cur = dataFiles(t, s.table)
    val gens = Generations.committed(root.toString, RowsArtifact, conf)
    if (gens.isEmpty) (cur.map(_.getPath.toString), true)
    else {
      val recorded = t.spark.read
        .parquet(Generations.path(root.toString, gens.last, InvArtifact))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val curKeys = cur.map(f =>
        (f.getPath.getName, f.getLen, f.getModificationTime))
      val rewrite = !recorded.forall(curKeys.contains)
      val names = recorded.map(_._1).toSet
      (cur.filterNot(f => names(f.getPath.getName)).map(_.getPath.toString),
        rewrite)
    }
  }

  /** Retire generations superseded by the newest BASE: segments older
    * than the last full build are dead to every current reader (the
    * read path starts at the base), but a pinned reader may still hold
    * them — run after readers drain, the [[reapStale]] /
    * [[Generations.retireOld]] contract. Returns retired gen numbers.
    */
  def retireRebased(t: Tables, s: StoreDef): Seq[Long] = {
    val conf = t.spark.sessionState.newHadoopConf()
    val root = incRoot(t, s).toString
    val gens = Generations.committed(root, RowsArtifact, conf)
    if (gens.isEmpty) return Nil
    val lastBase = gens.reverse.find { n =>
      t.spark.read.parquet(Generations.path(root, n, InvArtifact))
        .select("base").head.getBoolean(0)
    }.getOrElse(0L)
    val retire = gens.filter(_ < lastBase)
    val fs = new Path(root).getFileSystem(conf)
    retire.foreach(n => fs.delete(new Path(s"$root/gen=$n"), true))
    retire
  }

  /** [[reapStale]] for incremental roots: delete every
    * `<prefix>_gens_<tag>` dir whose stable tag is not in `keep`.
    * Stale roots come from retuned configs or other corpora's temp
    * dirs — never from growth (the stable tag survives it, by design).
    */
  def reapStaleIncremental(spark: SparkSession, prefix: String,
                           keep: Set[String]): Seq[String] = {
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sessionState.newHadoopConf())
    val pat = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(prefix) + "_gens_([0-9a-f]{12})")
    if (!fs.exists(wh)) Nil
    else fs.listStatus(wh).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val m = pat.matcher(st.getPath.getName)
        if (m.matches() && !keep.contains(m.group(1))) Some(st.getPath)
        else None
      }
      .map { p => fs.delete(p, true); p.getName }
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
