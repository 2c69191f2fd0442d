package graft.storage

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
  */
object IndexMaintenance {

  /** Rewrite `srcDir` (parquet partitioned by `partCol`) into `dstDir`
    * with one file per partition value. Returns the compacted frame.
    */
  def compactCells(spark: SparkSession, srcDir: String, dstDir: String,
                   partCol: String = "cid"): DataFrame = {
    require(
      new java.io.File(srcDir).getCanonicalPath !=
        new java.io.File(dstDir).getCanonicalPath,
      "compactCells never compacts in place: the source's _spark_metadata " +
        "manifest would be broken — compact into a new generation")
    spark.read.parquet(srcDir)
      .repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(dstDir)
    spark.read.parquet(dstDir)
  }

  /** Data files (not metadata) per partition-value directory under an
    * index dir — the observable compaction reduces.
    */
  def filesPerCell(dir: String, partCol: String = "cid"): Map[String, Int] = {
    val root = new java.io.File(dir)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(s"$partCol="))
      .map { d =>
        d.getName -> d.listFiles().count(f =>
          f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      }.toMap
  }
}
