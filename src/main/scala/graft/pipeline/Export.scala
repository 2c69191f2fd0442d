package graft.pipeline

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-export ordering — the "global shuffle" a
  * training run wants from its corpus WITHOUT a training-time shuffle
  * buffer: every doc gets a reproducible (shard, pos) address derived
  * from its identity alone, so any two export runs (any partitioning,
  * any cluster size) write byte-identical shard files and a trainer
  * can seek to (shard, pos) deterministically.
  *
  * Reference scope: the reference engine has no export story at all
  * (its jobs end at console/HDFS sinks, e.g. HdfsWordCount.java) —
  * this is part of the training-data surface graft adds on top.
  */
object Export {

  /** Coin-bucket count for the rank computation: the per-shard order
    * statistic is computed per (shard, bucket) — [[ShuffleBuckets]]×
    * more, and correspondingly smaller, sort groups than a per-shard
    * Window.
    */
  val ShuffleBuckets = 1024

  /** The order coin: uniform [0,1) from doc identity in its own seed
    * namespace ([[Mixing.u]] idiom — independent of the sample/split/
    * shard coins, bit-identical in Spark and the oracle).
    */
  private def orderCoin = Mixing.u("shuf", col("doc_id"))

  /** Deterministic export order: (doc_id, shard, pos) where `shard` is
    * [[Reports.shardOf]]'s identity shard and `pos` is the doc's
    * 1-based rank within its shard under (coin, doc_id) ordering — a
    * reproducible random permutation of each shard.
    *
    * The naive plan — `row_number() OVER (PARTITION BY shard ORDER BY
    * coin)` — ranks each shard in ONE task: at 100 TB that is 16 tasks
    * each sorting ~6 TB. Instead the rank is assembled from coin
    * BUCKETS (the [[graft.functions.OrderStat]] discipline applied to
    * ranking): bucket = floor(coin·B) is monotone in coin, so the
    * shard-wide order is the bucket order with intra-bucket (coin,
    * doc_id) order inside it. One count-only aggregation (doc_id-pruned
    * scan) yields the ≤16·B-row (shard, bucket) histogram; the driver
    * prefix-sums it into exclusive offsets (scalar traffic, the
    * OrderStat bound); and the Window that remains partitions by
    * (shard, bucket) — 16·B balanced groups, each ~1/(16·B) of the
    * corpus, running fully parallel. pos = offset + intra-bucket rank.
    *
    * Cost at scale: two doc_id-only scans (count pass + rank pass), one
    * corpus shuffle keyed on (shard, bucket), one broadcast of the
    * offset table. Determinism: coin and shard are identity functions
    * of doc_id; ties in coin break on doc_id — reruns and any input
    * partitioning produce the identical permutation.
    */
  def corpusShuffleOrder(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val base = t.documents
      .select(col("doc_id"), Reports.shardOf(col("doc_id")).as("shard"))
      .withColumn("coin", orderCoin)
      .withColumn("bkt",
        floor(col("coin") * lit(ShuffleBuckets.toDouble)).cast("int"))
    // (shard, bucket) histogram → exclusive per-shard prefix offsets.
    // ≤ 16·ShuffleBuckets rows of three integers — driver traffic is
    // the OrderStat scalar bound, never data.
    val hist = base.groupBy(col("shard"), col("bkt"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val offsets = hist.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var acc = 0L
      rows.sortBy(_._2).map { case (s, b, n) =>
        val off = acc; acc += n; (s, b, off)
      }
    }
    val offsetsDf = offsets.toDF("shard", "bkt", "off")
    val intraBucket = Window.partitionBy(col("shard"), col("bkt"))
      .orderBy(col("coin"), col("doc_id"))
    base.join(broadcast(offsetsDf), Seq("shard", "bkt"))
      .select(col("doc_id"), col("shard"),
        (col("off") + row_number().over(intraBucket)).cast("long").as("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  def corpusShuffleOrderSql: String =
    s"""WITH c AS (SELECT doc_id, ${Reports.shardOfSql} AS shard,
       |             ${Mixing.uSql("shuf")} AS coin
       |           FROM documents)
       |SELECT doc_id, shard,
       |  ROW_NUMBER() OVER (PARTITION BY shard ORDER BY coin, doc_id) AS pos
       |FROM c ORDER BY shard, pos""".stripMargin
}
