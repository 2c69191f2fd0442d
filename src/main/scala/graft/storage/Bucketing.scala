package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-storage path for repeated co-located joins.
  *
  * At 100 TB the same fact-fact join (lineitem ⋈ orders on the order
  * key) recurs across queries; shuffling both sides every time is the
  * dominant cost. Writing both tables bucketed (and sorted) by the join
  * key makes every later join a zero-exchange sort-merge: Spark matches
  * bucket files pairwise per task. The shuffle is paid once, at write.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. `buckets` should be
    * sized so one bucket of the LARGER table fits an executor's memory
    * at target scale (e.g. 100 TB / 4096 buckets ≈ 25 GB splits, each
    * read as multiple file splits but one bucket per join task).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — produces a
    * SortMergeJoin with NO Exchange on either side (pinned by
    * BucketingSpec).
    */
  def coLocatedJoin(spark: org.apache.spark.sql.SparkSession,
                    leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
