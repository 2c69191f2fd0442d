package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Typed loaders for the driver's testdata star schema (TESTDATA.md).
  *
  * Scans stay declarative (`spark.read.parquet`) so column pruning and
  * predicate pushdown reach the parquet reader untouched.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** `events` with `ts` surfaced as UTC epoch seconds (`ts_sec`).
    *
    * The raw column is nanosecond-precision; graft reads it as long
    * nanos (see GraftSession) and converts explicitly — the one
    * timestamp representation that hashes identically in every engine.
    */
  def events: DataFrame = {
    val raw = t("events")
    val tsSec = raw.schema("ts").dataType match {
      // integer floor-div — ns longs exceed double's exact range
      case LongType => expr("ts div 1000000000")
      case _        => unix_timestamp(col("ts"))
    }
    raw.withColumn("ts_sec", tsSec.cast(LongType))
  }
}
