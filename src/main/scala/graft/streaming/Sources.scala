package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Streaming ingestion surface — the Structured Streaming twins of the
  * reference's receivers (ref: WordCount.java:30 `socketTextStream`,
  * HDFSWordCount.java:25 `textFileStream`, KafkaReceiverWordCount.java:34 /
  * KafkaDirectWordCount.java:37 Kafka streams).
  *
  * Every source yields a uniform one-string-column `value` line stream, so
  * the jobs in [[Jobs]] compose with any of them. The Kafka connector jar is
  * not present in this zero-egress image, so [[kafkaShaped]] is a
  * line-protocol shim exposing Kafka's (key, value, topic) record schema —
  * the downstream parse/agg plumbing is identical to what the real
  * `format("kafka")` source would feed.
  *
  * Scale: socket/rate are test/demo receivers; the production path is the
  * file-dir source (exactly-once list-and-track, splits across executors)
  * or the real Kafka source (partition-per-topic-partition parallelism).
  */
object Sources {

  val LineSchema: StructType = StructType(Seq(StructField("value", StringType)))

  /** Socket line receiver (ref: WordCount.java:30). Test/demo only — a
    * socket receiver is single-point by nature; it exists for parity with
    * the reference, not the 100 TB path.
    */
  def socketLines(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream
      .format("socket")
      .option("host", host)
      .option("port", port.toString)
      .load()

  /** File-landing-directory source (ref: HDFSWordCount.java:25
    * `textFileStream`). Structured Streaming's file source tracks seen
    * files in the checkpoint (exactly-once), reads new files per
    * micro-batch, and splits large files across executors — the scalable
    * ingestion shape.
    */
  def textDir(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .format("text")
      .schema(LineSchema)
      .load(dir)

  /** Parquet file-landing-directory source — [[textDir]]'s shape for
    * STRUCTURED corpus dumps: a batch job (or an upstream pipeline
    * stage) lands parquet files in `dir`, and the file source picks
    * each one up exactly once (seen-files tracked in the checkpoint),
    * splitting large files across executors. This is the intake
    * BACKFILL path: replaying a corpus dump through the live
    * [[Jobs.IntakeSamplerStream]] plumbing instead of a batch rerun —
    * the reference's HDFS landing-dir pattern (HDFSWordCount.java:25)
    * applied to typed rows. The file source needs the schema up front
    * (no inference on a stream); pass the landing table's.
    */
  def parquetDir(spark: SparkSession, dir: String,
                 schema: StructType): DataFrame =
    spark.readStream
      .format("parquet")
      .schema(schema)
      .load(dir)

  /** Deterministic rate-driven word stream: the rate source's monotonic
    * `value` indexes a vocabulary. Useful for soak/demo runs with no
    * external feeder.
    */
  def rateWords(spark: SparkSession, rowsPerSecond: Int, vocab: Seq[String]): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
      .select(col("timestamp").as("ts"),
        element_at(
          lit(vocab.toArray),
          (pmod(col("value"), lit(vocab.size)) + 1).cast("int")
        ).as("value"))

  /** Kafka-record shim: parse `topic\tkey\tvalue` lines into the
    * (topic, key, value) record schema the real `format("kafka")` source
    * exposes (ref: KafkaDirectWordCount.java:37 consumes such records and
    * word-splits the value). Works over ANY line source above, so the
    * whole downstream pipeline is source-agnostic.
    */
  def kafkaShaped(lines: DataFrame): DataFrame = {
    val parts = split(col("value"), "\t", 3)
    // try_element_at, not element_at: a malformed line (missing tabs)
    // yields nulls instead of killing the query under ANSI mode
    lines.select(
      try_element_at(parts, lit(1)).as("topic"),
      try_element_at(parts, lit(2)).as("key"),
      try_element_at(parts, lit(3)).as("value"))
  }

  /** flatMap(split) tokenization shared by the wordcount jobs
    * (ref: WordCount.java:38-43). Empty tokens (double spaces) dropped.
    */
  def words(lines: DataFrame): DataFrame =
    lines
      .select(explode(split(col("value"), " ")).as("word"))
      .where(length(col("word")) > 0)

  // ------------------------------------------------------------- kafka

  /** Is the Spark Kafka connector (spark-sql-kafka-0-10) on the
    * classpath? The zero-egress build image does not ship it, so
    * [[kafkaTopic]] guards on this instead of failing at `load()` with
    * a cryptic provider-lookup error.
    */
  def kafkaAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  /** Normalize a raw Kafka-source frame (Kafka's native binary
    * key/value) to the string (topic, key, value) record schema that
    * [[kafkaShaped]] emits — ONE record shape for the downstream jobs
    * regardless of whether records arrive from a real broker or the
    * line-protocol shim (SourcesSpec pins schema + value parity).
    */
  private[streaming] def kafkaRecords(raw: DataFrame): DataFrame =
    raw.select(
      col("topic"),
      col("key").cast("string").as("key"),
      col("value").cast("string").as("value"))

  /** Real Kafka topic subscription (ref: KafkaDirectWordCount.java:37
    * direct stream; KafkaReceiverWordCount.java:34 receiver stream —
    * Structured Streaming's Kafka source is the direct approach:
    * one Spark partition per topic partition, offsets tracked in the
    * checkpoint, exactly-once with the file/Delta sinks).
    *
    * Enablement is exactly ONE jar pair on the classpath — no code
    * changes: `spark-sql-kafka-0-10_2.13-<spark-version>.jar` plus its
    * `kafka-clients` dependency (`--packages org.apache.spark:
    * spark-sql-kafka-0-10_2.13:4.1.2` does both). Until then this
    * throws with that instruction, and [[kafkaShaped]] over any line
    * source feeds the identical record schema, so every downstream
    * pipeline is already Kafka-ready.
    */
  def kafkaTopic(spark: SparkSession, brokers: String, topic: String,
                 startingOffsets: String = "latest"): DataFrame = {
    require(kafkaAvailable,
      "Kafka connector not on classpath: add spark-sql-kafka-0-10_2.13 " +
        "and kafka-clients jars (e.g. --packages " +
        "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2)")
    kafkaRecords(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load())
  }
}
