package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (binary-column) surface: media travels as an opaque
  * `binary` payload column + typed metadata, processed per-partition.
  *
  * [[Multimodal.multimodalMeta]] is the oracle-checked metadata pass
  * (byte length, digest, magic-byte sniff — pure codegen'd columns).
  * [[Pipeline]] is the decode/resize/frame-sample plumbing over a typed
  * `Dataset[MediaRecord]`: the Spark side (schema, encoders, partition
  * batching, feature shape) is real and tested; the actual image/audio
  * codec is pluggable and STUBBED here ([[Pipeline.RealDecoder]]) since
  * no media libraries exist in this container — tests run the
  * deterministic fake.
  *
  * Scale: payloads never shuffle — every stage is a per-partition map;
  * metadata extraction and decoding run at scan parallelism. On a real
  * corpus, payload columns live in parquet with
  * `spark.sql.parquet.columnarReaderBatchSize` tuned down for wide
  * binary rows, and features (small) are what downstream joins touch.
  */
object Multimodal {

  /** The testdata ships no media files, so the binary payload is the
    * UTF-8 encoding of `documents.text` — byte-identical in both
    * engines, which is all the metadata pass needs.
    */
  def multimodalMeta(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), col("text").as("txt"),
        col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"),
        // magic-prefix sniff: the dispatch a real pipeline does before
        // handing payloads to a codec. Compared as CHARACTERS (not
        // bytes) because the stand-in payload is text and DuckDB has no
        // blob substring — byte-substring vs char-substr would diverge
        // on multibyte prefixes. On a real binary corpus, switch to
        // substring(payload, 1, 4) against byte literals.
        when(substring(col("txt"), 1, 4) === lit("\u0089PNG"), "image/png")
          .when(substring(col("txt"), 1, 4) === lit("RIFF"), "audio/wav")
          .otherwise("text/plain").as("media_type"))
      .orderBy(col("doc_id"))

  def multimodalMetaSql: String =
    """SELECT doc_id,
      |  octet_length(text::BLOB)::BIGINT AS n_bytes,
      |  md5(text) AS digest,
      |  CASE WHEN substr(text, 1, 4) = chr(137) || 'PNG' THEN 'image/png'
      |       WHEN substr(text, 1, 4) = 'RIFF' THEN 'audio/wav'
      |       ELSE 'text/plain' END AS media_type
      |FROM documents ORDER BY doc_id""".stripMargin

  /** The decode → resize → frame-sample pipeline ORACLE-CHECKED end to
    * end: [[Pipeline.features]] with the deterministic
    * [[Pipeline.FakeDecoder]] over the text-byte stand-in payloads —
    * every derived number (dimension clamps, frame count, stride
    * sampling, sampled-byte mean) is integer/byte arithmetic the
    * DuckDB oracle reproduces formula for formula, so the
    * mapPartitions plumbing (the part a real codec swap keeps) is
    * hash-gated, not just spec-asserted. The byte mean is exact
    * before rounding (≤578 ints summed in doubles — below 2⁵³), so
    * round6 crosses the engine boundary safely. ASCII corpus
    * assumption documented at [[multimodalMeta]].
    */
  def multimodalFeatures(t: Tables): DataFrame =
    featureFrame(Pipeline.features(
      Pipeline.recordsFromDocuments(t), Pipeline.FakeDecoder).toDF())
      .orderBy(col("doc_id"))

  /** Shared output projection — consumed by the batch entry and
    * `streaming.MediaFeaturesStream`, so the surfaced schema cannot
    * drift (unsorted: streams can't sort — the batch entry adds the
    * presentation order). Long-typed frame counts match the oracle's
    * BIGINT len arithmetic.
    */
  private[graft] def featureFrame(features: DataFrame): DataFrame =
    features.select(col("id").as("doc_id"),
      col("nBytes").as("n_bytes"),
      col("width"), col("height"),
      col("nFrames").cast("long").as("n_frames"),
      col("sampledFrames").cast("long").as("sampled_frames"),
      graft.functions.Portable.round6(col("meanByte")).as("mean_byte"))

  def multimodalFeaturesSql: String = {
    val mean6 = graft.functions.Portable.round6Sql("sb::DOUBLE / nb")
    s"""WITH d AS (SELECT doc_id, text, octet_length(text::BLOB) AS len
       |           FROM documents),
       |par AS (SELECT doc_id, text, len,
       |          4 + (ascii(substr(text, 1, 1)) % 8) AS w,
       |          4 + (ascii(substr(text, CAST(len AS INT), 1)) % 8) AS h,
       |          1 + (len % 4) AS n
       |        FROM d),
       |sl AS (SELECT doc_id,
       |          substr(text, CAST(i * (len // n) AS INT) + 1,
       |                 CAST((i + 1) * (len // n) - i * (len // n) AS INT))
       |            AS s
       |       FROM par, range(4) t(i) WHERE i < n AND i % 2 = 0),
       |ch AS (SELECT doc_id, unnest(string_split(s, '')) AS c FROM sl),
       |mb AS (SELECT doc_id, SUM(ascii(c)) AS sb, COUNT(*) AS nb
       |       FROM ch GROUP BY doc_id)
       |SELECT p.doc_id, p.len AS n_bytes,
       |  LEAST(p.w, 8) AS width, LEAST(p.h, 8) AS height,
       |  p.n AS n_frames, ((p.n + 1) // 2) AS sampled_frames,
       |  $mean6 AS mean_byte
       |FROM par p JOIN mb USING (doc_id)
       |ORDER BY p.doc_id""".stripMargin
  }
}

/** Typed decode → resize → frame-sample plumbing. */
object Pipeline {

  final case class MediaRecord(id: Long, mediaType: String, payload: Array[Byte])

  /** Decoded frame grid; frames are raw byte planes. */
  final case class Decoded(width: Int, height: Int, frames: Seq[Array[Byte]])

  final case class MediaFeatures(
      id: Long,
      mediaType: String,
      nBytes: Long,
      width: Int,
      height: Int,
      nFrames: Int,
      sampledFrames: Int,
      meanByte: Double)

  /** Codec boundary. Implementations must be Serializable: one instance
    * ships to every executor and decodes inside mapPartitions.
    */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte]): Decoded
  }

  /** The real codec hook — intentionally unimplemented: this container
    * has no image/audio libraries. Swap in a javax.imageio / ffmpeg
    * backed implementation in a real deployment.
    */
  object RealDecoder extends Decoder {
    def decode(payload: Array[Byte]): Decoded =
      throw new UnsupportedOperationException(
        "no media codec in this environment — use a real Decoder impl")
  }

  /** Deterministic fake: dimensions and frame count derived from the
    * payload bytes, frames are slices of the payload. Makes every
    * downstream stage testable with exact assertions.
    */
  object FakeDecoder extends Decoder {
    def decode(payload: Array[Byte]): Decoded = {
      val w = 4 + math.abs(payload.headOption.getOrElse(0: Byte).toInt) % 8
      val h = 4 + math.abs(payload.lastOption.getOrElse(0: Byte).toInt) % 8
      val n = 1 + payload.length % 4
      val frames = (0 until n).map(i =>
        payload.slice(i * (payload.length / n), (i + 1) * (payload.length / n)))
      Decoded(w, h, frames)
    }
  }

  /** decode → "resize" (dimension clamp — a stand-in for a pixel op) →
    * sample every `frameStride`-th frame → per-record features.
    *
    * mapPartitions (not a per-row UDF) so a real codec can amortize
    * init per partition — the Scala analog of batched mapInPandas.
    */
  def features(records: Dataset[MediaRecord],
               decoder: Decoder,
               maxDim: Int = 8,
               frameStride: Int = 2): Dataset[MediaFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val d = decoder.decode(r.payload)
        val sampled = d.frames.zipWithIndex.collect {
          case (f, i) if i % frameStride == 0 => f
        }
        val bytes = sampled.flatten
        MediaFeatures(
          id = r.id,
          mediaType = r.mediaType,
          nBytes = r.payload.length.toLong,
          width = math.min(d.width, maxDim),
          height = math.min(d.height, maxDim),
          nFrames = d.frames.size,
          sampledFrames = sampled.size,
          meanByte = if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xff).toDouble).sum / bytes.size)
      }
    }
  }

  /** documents → MediaRecord dataset (text bytes as payload). */
  def recordsFromDocuments(t: Tables): Dataset[MediaRecord] = {
    val spark = t.spark
    import spark.implicits._
    t.documents
      .select(col("doc_id").as("id"), lit("text/plain").as("mediaType"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }
}
