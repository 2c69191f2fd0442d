package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Compaction for cell-partitioned index tables (the file-count debt a
  * streaming ingest — `streaming.Jobs.IndexIngestStream` — accrues:
  * one file per cell per micro-batch).
  *
  * Compacts INTO A NEW directory, never in place: the streaming sink's
  * `_spark_metadata` log lists the original files, so rewriting files
  * under a live sink dir breaks its exactly-once manifest for every
  * Spark reader. The table-service pattern applies — compact to a new
  * generation, point readers at it, retire the old one once drained.
  *
  * `repartition(cols)` hash-partitions by the partition column, so all
  * rows of one cell land in one task and `partitionBy` then writes
  * exactly ONE file per cell — scan-friendly (one columnar footer per
  * cell, no small-file metadata storm at 100 TB file counts).
  *
  * All path handling goes through the Hadoop FileSystem resolved from
  * each path's own scheme, so the in-place guard and the file counts
  * hold for hdfs:// / s3a:// index dirs, not just the local FS.
  */
object IndexMaintenance {

  /** `p` made absolute and scheme-qualified by its own FileSystem —
    * the comparable form of a path string.
    */
  private def qualified(p: String, conf: Configuration): Path = {
    val path = new Path(p)
    path.getFileSystem(conf).makeQualified(path)
  }

  /** Rewrite `srcDir` (parquet partitioned by `partCol`) into `dstDir`
    * with one file per partition value. Returns the compacted frame.
    */
  def compactCells(spark: SparkSession, srcDir: String, dstDir: String,
                   partCol: String = "cid"): DataFrame = {
    val hconf = spark.sessionState.newHadoopConf()
    require(
      qualified(srcDir, hconf) != qualified(dstDir, hconf),
      "compactCells never compacts in place: the source's _spark_metadata " +
        "manifest would be broken — compact into a new generation")
    spark.read.parquet(srcDir)
      .repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(dstDir)
    spark.read.parquet(dstDir)
  }

  /** Data files (not metadata) per partition-value directory under an
    * index dir — the observable compaction reduces. `conf` supplies
    * FileSystem bindings for remote schemes; the default reaches the
    * local FS and whatever the Hadoop default FS is configured to.
    */
  def filesPerCell(dir: String, partCol: String = "cid",
                   conf: Configuration = new Configuration()): Map[String, Int] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partCol="))
      .map { d =>
        d.getPath.getName -> fs.listStatus(d.getPath).count { f =>
          val n = f.getPath.getName
          f.isFile && n.endsWith(".parquet") && !n.startsWith("_")
        }
      }.toMap
  }
}
