package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** Fixed-grid token-window CHUNKING — the pre-step every
  * embedding/retrieval pipeline runs before it embeds: split each doc
  * into [[ChunkTokens]]-token windows advancing by [[ChunkStride]]
  * (overlap = ChunkTokens − ChunkStride, so a passage straddling a
  * boundary is whole in at least one chunk), the tail chunk shorter,
  * a doc at-or-under one chunk emitted whole. Chunk identity is
  * (doc_id, chunk_idx) — positions are a pure function of the text,
  * so re-chunking a grown corpus never moves an existing doc's chunks
  * (the append-only discipline of corpus_pack_delta, free here).
  *
  * Reference scope: the reference corpus jobs process whole documents
  * only (no sub-document windowing anywhere under the reference tree);
  * this extends the graft surface the way a production embedding
  * pipeline needs — `embed_*` operators consume per-CHUNK vectors at
  * scale, and chunk-grid dedup ([[chunkDupStats]]) is the cheap
  * prefilter in front of them (SemDeDup-style: don't embed the chunk
  * you've already embedded verbatim).
  *
  * Spark-first shape: chunking is ONE per-row HOF expression — no
  * shuffle, no join, output linear in corpus tokens (×(C/S) overlap
  * factor). The token array is let-bound once per row through a
  * single-element outer lambda (the [[graft.dedup.Substring]] r16
  * lesson: a captured `split(text)` subtree inside an HOF lambda
  * re-evaluates PER ELEMENT — O(tokens²) per doc).
  */
object Chunking {

  /** Chunk size in tokens. Sized like a retrieval-embedding window
    * (small enough that one topic dominates a chunk, large enough to
    * carry context); the synthetic corpus' ~100-600-token docs yield
    * 1-12 chunks each, exercising every branch.
    */
  val ChunkTokens = 64

  /** Grid stride in tokens; overlap = ChunkTokens − ChunkStride = 16
    * (25% of a chunk) so a duplicated passage shorter than the overlap
    * is whole in at least one chunk on each side of every boundary.
    */
  val ChunkStride = 48

  /** The chunk array of a `text` column as ONE per-row HOF expression
    * (shared by the batch entry and `streaming.Jobs.ChunkStream`, so
    * the two grids cannot drift): struct(chunk_idx, tok_start, n_tok,
    * chunk_text) per grid position. Grid: starts at i·S for
    * i ∈ [0, nChunks); nChunks = 1 when n ≤ C else
    * ⌈(n−C)/S⌉ + 1 — the last start is the smallest grid point whose
    * chunk reaches the end, so every token is covered and no chunk
    * starts past the text.
    */
  private[graft] def chunkStructs(text: Column): Column = {
    val C = ChunkTokens
    val S = ChunkStride
    flatten(transform(
      array(split(text, " ")),
      ts => {
        val n = size(ts)
        // integer ceil((n-C)/S)+1; doubles are exact at corpus doc
        // lengths (< 2^31 tokens) and both engines floor identically
        val nChunks = when(n <= C, lit(1)).otherwise(
          floor((n - lit(C) + lit(S - 1)).cast("double") / lit(S.toDouble))
            .cast("int") + 1)
        transform(
          sequence(lit(0), nChunks - 1),
          i => struct(
            i.cast("long").as("chunk_idx"),
            (i * S).cast("long").as("tok_start"),
            least(lit(C), n - i * S).cast("long").as("n_tok"),
            concat_ws(" ", slice(ts, i * S + 1, lit(C))).as("chunk_text")))
      }))
  }

  /** The chunk frame of an arbitrary (doc_id, text, ...) frame — the
    * shared body the batch entry AND the streaming twin
    * (`streaming.Jobs.ChunkStream`) run, so the two cannot drift.
    */
  private[graft] def chunkFrame(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(chunkStructs(col("text"))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.tok_start").as("tok_start"), col("c.n_tok").as("n_tok"),
        col("c.chunk_text").as("chunk_text"))

  /** (doc_id, chunk_idx, tok_start, n_tok, chunk_text): the chunk
    * grid of every document. Pure per-row HOF work — the plan is one
    * projection-pruned scan + generate, zero shuffles (spec-pinned).
    */
  def docChunks(t: Tables): DataFrame = chunkFrame(t.documents)

  /** DuckDB twin of the chunk grid as CTE bodies (`tok`, `ch`) —
    * shared with [[ChunkSemantic]]'s oracle so the two grids cannot
    * drift.
    */
  private[pipeline] def chunksSql: String = {
    val C = ChunkTokens
    val S = ChunkStride
    s"""tok AS (SELECT doc_id, source, string_split(text, ' ') AS ts
       |        FROM documents),
       |g AS (SELECT doc_id, source, ts, len(ts) AS n,
       |        CASE WHEN len(ts) <= $C THEN 1
       |             ELSE (len(ts) - $C + ${S - 1}) // $S + 1 END AS nc
       |      FROM tok),
       |ch AS (SELECT doc_id, source, i::BIGINT AS chunk_idx,
       |              (i * $S)::BIGINT AS tok_start,
       |              LEAST($C, n - i * $S)::BIGINT AS n_tok,
       |              array_to_string(ts[i*$S+1 : i*$S+$C], ' ')
       |                AS chunk_text
       |       FROM g, unnest(generate_series(0, nc - 1)) t(i))"""
      .stripMargin
  }

  def docChunksSql: String =
    s"""WITH $chunksSql
       |SELECT doc_id, chunk_idx, tok_start, n_tok, chunk_text
       |FROM ch""".stripMargin

  /** The per-corpus chunk-hash store (doc_id, chunk_idx, h =
    * md5(chunk_text)) — per-doc-pure (every row derives from one
    * `documents` row), so it builds through the INCREMENTAL ensure
    * protocol: corpus growth chunks+hashes only the new part-files
    * (storage.Materialize.ensureIncremental; the shingle/window-store
    * r18 discipline). Serves the streaming intake gate
    * (`streaming.Jobs.ChunkDupGateStream`) and any batch consumer
    * wanting chunk-grain exact-dup evidence without re-chunking.
    */
  private[graft] lazy val ChunkHashStore = graft.storage.Materialize
    .StoreDef("graft_chunk_h", "documents", s"c=$ChunkTokens|s=$ChunkStride")

  private def chunkHashRowsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(chunkStructs(col("text"))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        md5(col("c.chunk_text")).as("h"))

  /** The corpus side of the streaming chunk-dup gate, PINNED at the
    * store generation current when the job builds: (generation,
    * distinct (ch, corpus_doc)). An arriving doc's chunk is "already
    * in the corpus" iff some corpus doc OTHER than itself holds the
    * hash — the left-semi condition the gate applies (self-exclusion
    * makes a corpus replay reproduce batch verdicts exactly). The
    * generation rides out so the gate's cache key re-resolves on job
    * restart while a running job keeps its immutable pinned chain.
    */
  private[graft] def corpusChunkStorePinned(t: Tables): (Long, DataFrame) = {
    val (gen, rows) = graft.storage.Materialize
      .ensureIncrementalWithGen(t, ChunkHashStore, chunkHashRowsOf)
    (gen, rows.select(col("h").as("ch"), col("doc_id").as("corpus_doc"))
      .distinct())
  }

  /** Per-source CHUNK-GRID duplication exposure: (source, n_chunks,
    * dup_chunks, dup_frac) where a chunk is duplicated iff its full
    * text appears verbatim in ≥ 2 DISTINCT docs — the embedding-cost
    * view of duplication ([[graft.dedup.Substring.spanDupStats]]
    * measures duplicated TOKENS under maximal spans; this measures the
    * chunks an embedding pipeline would redundantly embed, grid
    * exactly [[docChunks]]' so the numbers transfer). `dup_frac` is
    * [[Portable.round6]].
    *
    * Shape: chunks shuffle ONCE on md5(chunk_text) for the distinct-doc
    * count (hash, never the text); the duplicated-hash set joins back
    * as a membership MARKER (distinct on the join key, so no fan-out;
    * AQE broadcasts it when boilerplate is rare) and one
    * |sources|-group conditional rollup produces totals AND dup counts
    * together — the chunk frame is derived exactly twice (the
    * dup-aggregate and the probe, the live-twin floor: Catalyst
    * re-expands shared derived subtrees, the `substringSpans`
    * discipline), never a third time for the totals. Linear in corpus
    * tokens — no pairwise anything.
    */
  def chunkDupStats(t: Tables): DataFrame = {
    val ch = t.documents
      .select(col("doc_id"), col("source"),
        explode(chunkStructs(col("text"))).as("c"))
      .select(col("doc_id"), col("source"),
        md5(col("c.chunk_text")).as("h"))
    val dup = ch.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2)
      .select(col("h"), lit(1L).as("is_dup"))
    ch.join(dup, Seq("h"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce(col("is_dup"), lit(0L))).as("dup_chunks"))
      .select(col("source"), col("n_chunks"), col("dup_chunks"),
        Portable.round6(col("dup_chunks").cast("double") /
          col("n_chunks").cast("double")).as("dup_frac"))
  }

  def chunkDupStatsSql: String =
    s"""WITH $chunksSql,
       |hh AS (SELECT doc_id, source, md5(chunk_text) AS h FROM ch),
       |dup AS (SELECT h FROM hh GROUP BY h
       |        HAVING COUNT(DISTINCT doc_id) >= 2),
       |d AS (SELECT source, COUNT(*)::BIGINT AS dup_chunks FROM hh
       |      WHERE h IN (SELECT h FROM dup) GROUP BY source),
       |n AS (SELECT source, COUNT(*)::BIGINT AS n_chunks FROM hh
       |      GROUP BY source)
       |SELECT n.source, n.n_chunks,
       |  COALESCE(d.dup_chunks, 0)::BIGINT AS dup_chunks,
       |  ${Portable.round6Sql(
      "COALESCE(d.dup_chunks, 0)::DOUBLE / n.n_chunks::DOUBLE")}
       |    AS dup_frac
       |FROM n LEFT JOIN d USING (source)""".stripMargin
}
