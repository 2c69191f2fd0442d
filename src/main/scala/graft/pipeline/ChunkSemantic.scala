package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Portable, TextFunctions, VectorFunctions}

/** Chunk-level SEMANTIC dedup — the chunk→embedding bridge
  * (VERDICT r16 #2): [[Chunking.docChunks]]' grid, embedded per chunk
  * with the deterministic feature-hash vector
  * ([[graft.functions.HashFeatureVec]] — the hashing-trick
  * bag-of-words, the `multimodal_features` determinism discipline
  * applied to text), then banded sign-LSH candidate generation (the
  * `Ann.embedAnnLsh` / `embedAnnMultiprobe` shape at chunk
  * granularity) and an exact-cosine verify. Catches the pair exact
  * chunk hashing ([[Chunking.chunkDupStats]]) is blind to: a
  * PARAPHRASED chunk — most tokens shared, a few edited, possibly at
  * a shifted grid position — whose md5 differs but whose token
  * multiset barely moves (SemDeDup, Abbas et al. 2023: don't embed or
  * train on the chunk you already have in lightly-edited form).
  *
  * Pairs are IDENTICAL-TEXT-EXCLUDED (`h_a ≠ h_b`): verbatim chunk
  * copies are the exact pass's province; this entry surfaces only
  * what semantics adds. Every pair maps back to both sides' span
  * evidence (doc_id, chunk_idx, tok_start, n_tok) — the consumer can
  * excise or dedup at token precision.
  *
  * Scale shape: embeddings are built IN the scan projection (native
  * codegen'd expression, zero shuffle); candidates come from a
  * (tbl, bkt) bucket equi-join — [[NumTables]] independent 8-bit
  * sign-LSH tables, so a pair collides when ANY table's sign byte
  * matches — with per-bucket membership capped at [[ChunkBandCap]]
  * (a verbatim-boilerplate flood lands in ONE bucket and is dropped
  * there, the `ShingleDocFreqCap` rule; its dedup already happened in
  * the exact pass). Per-bucket pair work is ≤ C(cap,2); the join
  * shuffles (tbl, bkt, ids, 32 doubles) — never chunk text. Vector
  * entries are small exact integers in doubles, so dots, norms and
  * cosines are EXACT in both engines regardless of summation order.
  */
object ChunkSemantic {

  /** Independent LSH tables (dimension slices of [[BandBitsMax]]). */
  val NumTables = 4

  /** ADAPTIVE band width (the `Ann.lshBits` ladder): bucket-bit count
    * grows with log(chunk count) to hold occupancy ≈
    * [[ChunkTarget]] — a FIXED width is a scale bug, since bucket
    * occupancy n/2^bits makes the bucket self-join quadratic in
    * corpus growth. Integer CASE-ladder thresholds, bit-identical in
    * both engines (Portable.bucketBits / bucketBitsSql).
    */
  val BandBitsMin = 6
  val BandBitsMax = 16
  val ChunkTarget = 16

  /** Embedding width — each table owns a fixed [[BandBitsMax]]-dim
    * slice (adaptive width is a shiftright REDUCTION of the full
    * slice, never re-hashing), and 64 dims keeps unrelated-pair
    * cosine noise (~1/√64 ≈ 0.125 std) far below [[SemCosMin]].
    */
  val Dims: Int = NumTables * BandBitsMax

  /** Exact-cosine admission threshold for a semantic near-dup pair. */
  val SemCosMin = 0.80

  /** Max chunks per (table, bucket) admitted to pair formation — with
    * the adaptive width this is a FLOOD guard (a verbatim-boilerplate
    * chunk's copies share every bucket at any width), not the steady
    * state: expected occupancy tracks [[ChunkTarget]].
    */
  val ChunkBandCap = 32

  private val bandBitsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Chunk-count-adaptive band width for `t`'s corpus, cached per
    * corpus tag (one count scan at plan build, the `Ann.lshBits`
    * shape).
    */
  private def bandBits(t: Tables): Int =
    bandBitsCache.computeIfAbsent(
      graft.storage.Materialize.corpusTag(t, "documents",
        s"cbits=$BandBitsMin..$BandBitsMax|tgt=$ChunkTarget"),
      _ => Portable.bucketBits(Chunking.docChunks(t).count(),
        BandBitsMin, BandBitsMax, ChunkTarget)).intValue

  /** (doc_id, chunk_idx, tok_start, n_tok, h, v, n2): the chunk grid
    * with md5 text hash, feature-hash embedding, and squared norm.
    * Zero-norm chunks (every bucket cancelled exactly) carry no
    * direction and are excluded — cosine is undefined for them.
    */
  private def chunkVectors(t: Tables): DataFrame = {
    val v = TextFunctions.hashFeatureVec(split(col("c.chunk_text"), " "), Dims)
    t.documents
      .select(col("doc_id"), explode(Chunking.chunkStructs(col("text"))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.tok_start").as("tok_start"), col("c.n_tok").as("n_tok"),
        md5(col("c.chunk_text")).as("h"), v.as("v"))
      .withColumn("n2", VectorFunctions.dot(col("v"), col("v")))
      .where(col("n2") > 0)
  }

  /** Near-dup chunk pairs beyond exact hashing: (doc_a, chunk_a,
    * start_a, ntok_a, doc_b, chunk_b, start_b, ntok_b, cos_sim) with
    * cos_sim ≥ [[SemCosMin]], text-distinct, (doc, chunk)-lexicographic
    * pair order, deduped across tables.
    */
  def chunkDedupSemantic(t: Tables): DataFrame = {
    val bits = bandBits(t)
    val bandStructs = (0 until NumTables).map { j =>
      val full = Portable.signBucketExpr(BandBitsMax, oneBasedIndex = false,
        offset = j * BandBitsMax)
      struct(lit(j).as("tbl"),
        expr(s"shiftright($full, ${BandBitsMax - bits})").as("bkt"))
    }
    val bands = chunkVectors(t)
      .select(col("doc_id"), col("chunk_idx"), col("tok_start"),
        col("n_tok"), col("h"), col("v"),
        explode(array(bandStructs: _*)).as("tb"))
      .select(col("doc_id"), col("chunk_idx"), col("tok_start"),
        col("n_tok"), col("h"), col("v"),
        col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    val ok = bands.groupBy(col("tbl"), col("bkt"))
      .agg(count(lit(1)).as("f"))
      .where(col("f") <= ChunkBandCap)
      .select(col("tbl"), col("bkt"))
    val admitted = bands.join(ok, Seq("tbl", "bkt"), "left_semi")
    admitted.as("a")
      .join(admitted.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt") &&
          struct(col("a.doc_id"), col("a.chunk_idx")) <
            struct(col("b.doc_id"), col("b.chunk_idx")) &&
          col("a.h") =!= col("b.h"))
      .select(
        col("a.doc_id").as("doc_a"), col("a.chunk_idx").as("chunk_a"),
        col("a.tok_start").as("start_a"), col("a.n_tok").as("ntok_a"),
        col("b.doc_id").as("doc_b"), col("b.chunk_idx").as("chunk_b"),
        col("b.tok_start").as("start_b"), col("b.n_tok").as("ntok_b"),
        Portable.round6(
          VectorFunctions.cosineSim(col("a.v"), col("b.v"))).as("cos_sim"))
      .where(col("cos_sim") >= SemCosMin)
      .distinct() // a pair colliding in several tables scores identically
      .orderBy(col("doc_a"), col("chunk_a"), col("doc_b"), col("chunk_b"))
  }

  /** DuckDB md5 hex digit `i` (1-based) as an integer — the
    * [[graft.dedup.Dedup.dedupSimhashSql]] ascii-arithmetic idiom.
    */
  private def hexDigit(i: Int): String =
    s"(ascii(substr(md5(w), $i, 1)) - 48 - 39 * " +
      s"(CASE WHEN ascii(substr(md5(w), $i, 1)) >= 97 THEN 1 ELSE 0 END))"

  def chunkDedupSemanticSql: String = {
    // first 8 hex digits of md5(w) = HashFeatureVec's first 4 digest
    // bytes big-endian; the 9th digit's low bit is the sign
    val hv = (1 to 8)
      .map(i => s"${hexDigit(i)}::BIGINT * ${1L << (4 * (8 - i))}")
      .mkString(" + ")
    val sums = (0 until Dims).map(d =>
      s"SUM(CASE WHEN bucket = $d THEN sgn ELSE 0 END)::DOUBLE AS v$d")
      .mkString(",\n|            ")
    val vlist = (0 until Dims).map(d => s"v$d").mkString(", ")
    val ladder = Portable.bucketBitsSql("(SELECT COUNT(*) FROM ch)",
      BandBitsMin, BandBitsMax, ChunkTarget)
    val tableSelects = (0 until NumTables).map { j =>
      val full = Portable.signBucketExpr(BandBitsMax, oneBasedIndex = true,
        offset = j * BandBitsMax)
      s"SELECT doc_id, chunk_idx, tok_start, n_tok, h, v, $j AS tbl, " +
        s"($full) >> ($BandBitsMax - nb.bits) AS bkt FROM vv, nb"
    }.mkString("\n|  UNION ALL ")
    val cos = Portable.round6Sql(
      "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * " +
        "sqrt(list_dot_product(b.v, b.v)))")
    s"""WITH ${Chunking.chunksSql},
       |tokw AS (SELECT doc_id, chunk_idx, tok_start, n_tok,
       |           md5(chunk_text) AS h,
       |           unnest(string_split(chunk_text, ' ')) AS w
       |         FROM ch),
       |feat AS (SELECT doc_id, chunk_idx, tok_start, n_tok, h,
       |           ($hv) % $Dims AS bucket,
       |           CASE WHEN ${hexDigit(9)} % 2 = 1 THEN 1 ELSE -1 END AS sgn
       |         FROM tokw),
       |vec AS (SELECT doc_id, chunk_idx, tok_start, n_tok, h,
       |            $sums
       |        FROM feat GROUP BY doc_id, chunk_idx, tok_start, n_tok, h),
       |vv AS (SELECT doc_id, chunk_idx, tok_start, n_tok, h,
       |         list_value($vlist) AS v
       |       FROM vec
       |       WHERE list_dot_product(list_value($vlist), list_value($vlist)) > 0),
       |nb AS (SELECT $ladder AS bits),
       |bands AS (
       |  $tableSelects),
       |ok AS (SELECT tbl, bkt FROM bands GROUP BY tbl, bkt
       |       HAVING COUNT(*) <= $ChunkBandCap),
       |adm AS (SELECT bands.* FROM bands JOIN ok USING (tbl, bkt))
       |SELECT DISTINCT
       |  a.doc_id AS doc_a, a.chunk_idx AS chunk_a,
       |  a.tok_start AS start_a, a.n_tok AS ntok_a,
       |  b.doc_id AS doc_b, b.chunk_idx AS chunk_b,
       |  b.tok_start AS start_b, b.n_tok AS ntok_b,
       |  $cos AS cos_sim
       |FROM adm a JOIN adm b
       |  ON a.tbl = b.tbl AND a.bkt = b.bkt
       | AND ROW(a.doc_id, a.chunk_idx) < ROW(b.doc_id, b.chunk_idx)
       | AND a.h <> b.h
       |WHERE $cos >= $SemCosMin
       |ORDER BY doc_a, chunk_a, doc_b, chunk_b""".stripMargin
  }
}
