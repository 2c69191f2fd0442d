package graft.streaming

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.Row

/** Structured Streaming twins of the reference's DStream programs.
  *
  * Each job is a pure streaming-DataFrame transform (testable with
  * MemoryStream, attachable to any [[Sources]] source) plus, where the
  * reference has sink-side behavior, a `start` wiring. DStream-isms are
  * re-expressed in the Structured model:
  *
  *   - `updateStateByKey` → `flatMapGroupsWithState` (state lives in the
  *     state store, checkpointed per-batch; recovery = restart with the
  *     same checkpoint dir, vs. the reference's
  *     `jssc.checkpoint(...)` at UpdateStateByKeyWordCount.java:32)
  *   - `reduceByKeyAndWindow` → event-time `window()` + watermark (state
  *     bounded by the watermark lag instead of the window length;
  *     processing-time windows become event-time — deterministic on replay)
  *   - `transform` + per-RDD SQL → `foreachBatch` (the micro-batch escape
  *     hatch with the full batch API)
  *
  * Scale: every aggregation below is partial (map-side combine) before its
  * shuffle; state stores shard by key hash across executors; watermarks
  * bound state size. No job collects to the driver.
  */
object Jobs {

  /** Parse a `"<n> <unit>"` watermark lag into millis — the event-time
    * timeout arithmetic the stateful gates share (they must add the SAME
    * lag they passed to `withWatermark`, or state expires early/late).
    */
  private[streaming] def lagMillis(watermarkLag: String): Long =
    watermarkLag.trim.split("\\s+") match {
      case Array(n, u) =>
        val unit = u.toLowerCase.stripSuffix("s")
        n.toLong * (unit match {
          case "millisecond" => 1L
          case "second" => 1000L
          case "minute" => 60000L
          case "hour" => 3600000L
          case other => throw new IllegalArgumentException(
            s"unsupported watermark lag unit: $other")
        })
      case _ => throw new IllegalArgumentException(
        s"watermark lag must be '<n> <unit>', got '$watermarkLag'")
    }

  // ---------------------------------------------------------------------
  // WordCountStream — ref: WordCount.java:30-60 (socket → flatMap →
  // mapToPair → reduceByKey → print).
  // ---------------------------------------------------------------------
  object WordCountStream {

    /** lines(`value`) → (word, cnt). Complete-mode output gives the
      * reference's every-batch full-table print.
      */
    def counts(lines: DataFrame): DataFrame =
      Sources.words(lines)
        .groupBy(col("word"))
        .agg(count(lit(1)).as("cnt"))

    def writer(lines: DataFrame): DataStreamWriter[Row] =
      counts(lines).writeStream.outputMode(OutputMode.Complete())
  }

  // ---------------------------------------------------------------------
  // RunningCounts — ref: UpdateStateByKeyWordCount.java:54-78: global
  // per-word totals across all batches, state checkpointed (line 32).
  // ---------------------------------------------------------------------
  object RunningCounts {

    /** Global running count per word. State = one Long per key in the
      * state store (constant per key — the 100 TB-safe shape; the batch
      * replay equivalent is operators.WordCounts.runningCount). Emits the
      * updated total for every key seen in the micro-batch (update mode),
      * exactly the reference's per-batch updateStateByKey output.
      */
    def counts(lines: DataFrame): Dataset[(String, Long)] = {
      val spark = lines.sparkSession
      import spark.implicits._
      Sources.words(lines)
        .as[String]
        .groupByKey(identity)
        .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
          (word: String, batch: Iterator[String], state: GroupState[Long]) => {
            val total = state.getOption.getOrElse(0L) + batch.size
            state.update(total)
            Iterator((word, total))
          })
        .toDF("word", "total").as[(String, Long)]
    }

    /** Checkpointed update-mode writer — stop + restart with the same
      * `checkpointDir` resumes from persisted state (the reference's
      * `jssc.checkpoint` recovery story).
      */
    def writer(lines: DataFrame, checkpointDir: String): DataStreamWriter[(String, Long)] =
      counts(lines).writeStream
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", checkpointDir)
  }

  // ---------------------------------------------------------------------
  // SlidingCounts — ref: WindowHotWord.java:143-148: reduceByKeyAndWindow
  // over 60 s window / 10 s slide.
  // ---------------------------------------------------------------------
  object SlidingCounts {

    /** Event-time sliding-window counts per word over a (ts, word) stream.
      * Append mode: a window's count is emitted once, when the watermark
      * passes its end — deterministic on replay, state bounded by the
      * watermark lag (the DStream original re-reduced the last 6 batches
      * every slide and kept them all in memory).
      */
    def counts(events: DataFrame,
               windowDur: String = "60 seconds",
               slideDur: String = "10 seconds",
               watermarkLag: String = "30 seconds"): DataFrame =
      events
        .withWatermark("ts", watermarkLag)
        .groupBy(window(col("ts"), windowDur, slideDur), col("word"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("w_start"), col("word"), col("cnt"))

    def writer(events: DataFrame): DataStreamWriter[Row] =
      counts(events).writeStream.outputMode(OutputMode.Append())
  }

  // ---------------------------------------------------------------------
  // BlacklistFilter — ref: TransformBlacklist.java:48-73: per-batch
  // leftOuterJoin against a static blacklist RDD + filter + map.
  // ---------------------------------------------------------------------
  object BlacklistFilter {

    /** Stream-static anti join: the three-step leftOuterJoin → filter →
      * map collapses into ONE broadcast left_anti join — the stream side
      * never shuffles, each executor filters its partitions against the
      * broadcast list. `clicks` needs a `user` column; all its columns
      * pass through.
      */
    def valid(clicks: DataFrame, blacklist: DataFrame): DataFrame =
      clicks.join(broadcast(blacklist.select("user")), Seq("user"), "left_anti")
  }

  // ---------------------------------------------------------------------
  // StreamingDedup — the LLM-pipeline exact dedup (dedup.Dedup.dedupExact)
  // in the streaming model: no reference twin, but the natural companion
  // of a streaming ingest pipeline.
  // ---------------------------------------------------------------------
  object StreamingDedup {

    /** Emit only the first document per content hash; duplicates arriving
      * within the watermark horizon are dropped. State is one (hash, ts)
      * entry per distinct doc inside the lag — bounded by the watermark,
      * unlike a global streaming distinct (which would grow forever).
      * Needs (ts timestamp, doc columns...); rows pass through with the
      * content hash attached.
      */
    def firstSeen(docs: DataFrame, watermarkLag: String = "10 seconds"): DataFrame =
      docs
        .withColumn("text_hash", md5(col("text")))
        .withWatermark("ts", watermarkLag)
        .dropDuplicatesWithinWatermark("text_hash")
  }

  // ---------------------------------------------------------------------
  // CorpusCleanStream — pipeline.CorpusClean on a live document stream:
  // per-row quality gate, then watermarked exact dedup. The full intake
  // path an LLM data pipeline runs as documents land.
  // ---------------------------------------------------------------------
  object CorpusCleanStream {

    /** (ts, doc_id, text) stream → documents that clear the quality
      * threshold AND are first-seen for their content hash. The quality
      * inputs (chars, tokens, distinct tokens) are per-row higher-order
      * functions — no aggregation — so the only state is the dedup
      * store, bounded by the watermark. The formula is
      * textanalysis.TextAnalysis.qualityExpr, the SAME definition the
      * batch op filters on.
      */
    def clean(docs: DataFrame,
              qualityMin: Double = graft.pipeline.CorpusClean.QualityMin,
              watermarkLag: String = "10 seconds"): DataFrame =
      docs
        .withColumn("n_chars", length(col("text")))
        .withColumn("toks", split(col("text"), " "))
        .withColumn("quality", graft.textanalysis.TextAnalysis.qualityExpr(
          col("n_chars"), size(col("toks")),
          size(array_distinct(col("toks")))))
        .filter(col("quality") >= qualityMin)
        .withColumn("text_hash", md5(col("text")))
        .withWatermark("ts", watermarkLag)
        .dropDuplicatesWithinWatermark("text_hash")
        .select(col("ts"), col("doc_id"), col("quality"), col("text_hash"))
  }

  // ---------------------------------------------------------------------
  // RepetitionGateStream — textanalysis.TextAnalysis.qualityRepetition
  // on a live document stream: the self-repetition spam gate of the
  // intake path (quality, REPETITION, dedup, fluency).
  // ---------------------------------------------------------------------
  object RepetitionGateStream {

    /** (ts, doc_id, n_bigrams, top_bigram_frac, dup_bigram_frac, keep)
      * for a (ts, doc_id, text) stream. A document's repetition profile
      * depends on nothing but its own text, and a doc arrives as ONE
      * row — so unlike the batch twin's (doc, bigram) aggregation this
      * is completely STATELESS: codegen'd per-row higher-order
      * functions build the bigram array and count within it. Identical
      * integers into the identical round6 division ⇒ stream ≡ batch
      * EXACTLY (StreamingJobsSpec pins it on the corpus's own docs).
      *
      * Per-row cost is O(distinct × total) bigrams (the `filter` count
      * inside `transform`) — linear-ish for real text, and bounded by
      * one document; cap document length upstream if the intake may
      * carry multi-MB texts.
      */
    /** Max multiplicity of any element of `arr`, LINEARLY: sort, then
      * one `aggregate` pass counting runs — O(n log n) per row. The
      * naive form (`transform(array_distinct, b -> size(filter(...)))`)
      * is O(distinct × total) INSIDE one expression, so a single very
      * long spam document could stall an executor task before any
      * downstream gate applies (ADVICE r9); runs over a sorted copy
      * cost what the sort costs. ONE definition, shared with the batch
      * gate ([[TextAnalysis.maxRunCount]] — the batch op adopted the
      * per-row form in r22), so the count cannot drift.
      */
    private[streaming] def maxRunCount(arr: Column): Column =
      graft.textanalysis.TextAnalysis.maxRunCount(arr)

    /** The keep PREDICATE over a per-row bigram array — the profile's
      * two threshold tests as one reusable Column, so the composed
      * intake sampler ([[IntakeSamplerStream]]) applies the identical
      * gate (same round6, same thresholds) without re-deriving the
      * formula. Top-bigram multiplicity via [[maxRunCount]] — the same
      * integer the batch twin's (doc, bigram) aggregation counts.
      */
    private[streaming] def keepFromBigrams(bgs: Column): Column = {
      val n = size(bgs).cast("long")
      val nd = size(array_distinct(bgs)).cast("long")
      val top = maxRunCount(bgs).cast("long")
      graft.functions.Portable.round6(top.cast("double") / n) <=
        graft.textanalysis.TextAnalysis.TopBigramFracMax &&
        graft.functions.Portable.round6((n - nd).cast("double") / n) <=
          graft.textanalysis.TextAnalysis.DupBigramFracMax
    }

    def profile(docs: DataFrame): DataFrame =
      docs
        .withColumn("rg_ts", split(col("text"), " "))
        .where(size(col("rg_ts")) >= 2)
        .withColumn("bgs", expr(
          """zip_with(slice(rg_ts, 1, size(rg_ts) - 1),
            |  slice(rg_ts, 2, size(rg_ts) - 1),
            |  (a, b) -> concat(a, ' ', b))""".stripMargin))
        .select(col("ts"), col("doc_id"),
          size(col("bgs")).cast("long").as("n_bigrams"),
          expr("size(array_distinct(bgs))").cast("long").as("n_distinct"),
          maxRunCount(col("bgs")).cast("long").as("top_cnt"))
        .select(col("ts"), col("doc_id"), col("n_bigrams"),
          graft.functions.Portable.round6(
            col("top_cnt").cast("double") / col("n_bigrams"))
            .as("top_bigram_frac"),
          graft.functions.Portable.round6(
            (col("n_bigrams") - col("n_distinct")).cast("double")
              / col("n_bigrams")).as("dup_bigram_frac"))
        .withColumn("keep",
          (col("top_bigram_frac") <=
            graft.textanalysis.TextAnalysis.TopBigramFracMax &&
            col("dup_bigram_frac") <=
              graft.textanalysis.TextAnalysis.DupBigramFracMax).cast("int"))
  }

  // ---------------------------------------------------------------------
  // SessionCounts — streaming twin of operators.Windows.sessionize:
  // native session windows (gap-merged), state bounded by the watermark.
  // ---------------------------------------------------------------------
  object SessionCounts {

    /** Per-user session aggregates over a (ts, user) stream: Spark's
      * `session_window` merges events whose gaps are under `gap` into
      * one growing window; a session emits (append) once the watermark
      * passes its close. The batch replay is Windows.sessionize's
      * gaps-and-islands plan.
      */
    def counts(events: DataFrame,
               gap: String = "30 minutes",
               watermarkLag: String = "10 minutes"): DataFrame =
      events
        .withWatermark("ts", watermarkLag)
        .groupBy(session_window(col("ts"), gap), col("user"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"),
          col("user"), col("n_events"))
  }

  // ---------------------------------------------------------------------
  // MinhashCandidates — dedup.Dedup.dedupMinhash in the streaming model:
  // near-dup candidate pairs over a live document stream.
  // ---------------------------------------------------------------------
  object MinhashCandidates {

    import graft.dedup.Dedup.{NumBands, NumPerms, ShingleSize}

    /** Per-ROW minhash band keys — no aggregation, so the downstream
      * stream-stream join stays legal. The usual groupBy-min signature
      * is replaced by `array_min` over per-shingle md5s (min is
      * duplicate-insensitive, so skipping the distinct changes nothing),
      * computed entirely in codegen'd higher-order functions. Emits one
      * row per (doc, band).
      */
    def bandKeys(docs: DataFrame): DataFrame = bandKeysCarrying(docs)

    /** [[bandKeys]] carrying extra per-row columns computed over the
      * shingled frame (each has `sh`, the per-row shingle array, in
      * scope) — ClusterAssignStream keeps the distinct shingle set
      * alongside the band keys without a second source subscription.
      */
    private[streaming] def bandKeysCarrying(
        docs: DataFrame, carry: (String, Column)*): DataFrame = {
      val sigCols = (0 until NumPerms).map(p => expr(
        s"array_min(transform(sh, s -> md5(concat('$p:', s))))").as(s"h$p"))
      val bandStructs = (0 until NumBands).map(b =>
        struct(lit(b).as("band_idx"),
          md5(concat(col(s"h${2 * b}"), lit("|"), col(s"h${2 * b + 1}")))
            .as("band_key")))
      val carried = carry.map { case (n, c) => c.as(n) }
      val carriedRefs = carry.map { case (n, _) => col(n) }
      docs
        .withColumn("ts_toks", split(col("text"), " "))
        .where(size(col("ts_toks")) >= ShingleSize)
        .withColumn("sh", graft.functions.TextFunctions.shingles(
          col("ts_toks"), ShingleSize))
        .select(col("ts") +: col("doc_id") +: (carried ++ sigCols): _*)
        .select(col("ts") +: col("doc_id") +: carriedRefs :+
          explode(array(bandStructs: _*)).as("bk"): _*)
        .select(col("ts") +: col("doc_id") +: carriedRefs :+
          col("bk.band_idx") :+ col("bk.band_key"): _*)
    }

    /** Candidate near-dup pairs from a (ts, doc_id, text) stream: both
      * sides of a watermarked stream-stream self-join on band key,
      * time-bounded to `horizon` so the join state is droppable — the
      * streaming analog of the batch band join, with the watermark
      * playing the corpus-boundary role. Append mode.
      *
      * Output is per-(pair, band), NOT distinct pairs: docs matching on
      * several bands (identical docs match all [[NumBands]]) emit up to
      * NumBands duplicate (doc_a, doc_b) rows — unlike the batch twin's
      * `.distinct()`, which a streaming append sink cannot express
      * without another stateful stage. Downstream consumers dedupe
      * (cheap: candidate volume is LSH-bounded) or keep a ts column and
      * `dropDuplicatesWithinWatermark("doc_a", "doc_b")`.
      *
      * The self-join subscribes to `docs` TWICE (one scan per side), so
      * the source must be replayable — file dir, Kafka, MemoryStream. A
      * non-replayable source like Sources.socketLines hands each scan a
      * different slice and silently loses pairs.
      */
    def candidates(docs: DataFrame,
                   horizon: String = "60 seconds",
                   watermarkLag: String = "30 seconds"): DataFrame = {
      val a = bandKeys(docs).withWatermark("ts", watermarkLag)
        .select(col("ts").as("ts_a"), col("doc_id").as("doc_a"),
          col("band_idx").as("bi_a"), col("band_key").as("bk_a"))
      val b = bandKeys(docs).withWatermark("ts", watermarkLag)
        .select(col("ts").as("ts_b"), col("doc_id").as("doc_b"),
          col("band_idx").as("bi_b"), col("band_key").as("bk_b"))
      a.join(b,
        col("bi_a") === col("bi_b") && col("bk_a") === col("bk_b") &&
          col("doc_a") < col("doc_b") &&
          col("ts_b") >= col("ts_a") - expr(s"INTERVAL $horizon") &&
          col("ts_b") <= col("ts_a") + expr(s"INTERVAL $horizon"))
        .select(col("doc_a"), col("doc_b"))
    }
  }

  // ---------------------------------------------------------------------
  // CorpusNearDupGate — the INTAKE near-dup gate: is a newly-arriving
  // document a near-dup of anything already IN the corpus? Where
  // MinhashCandidates finds pairs WITHIN the live stream (stream-stream,
  // watermark-bounded), this one probes the static corpus band store —
  // the decision a production pipeline makes before admitting a doc.
  // ---------------------------------------------------------------------
  object CorpusNearDupGate {

    /** Band-key matches of a live (ts, doc_id, text) stream against the
      * corpus band table: per-row HOF band keys (the shared
      * [[MinhashCandidates.bandKeys]] definition — stream and batch
      * signatures cannot drift), then a STATELESS stream-static
      * equi-join on (band_idx, band_key). No watermark, no state: each
      * arriving doc either collides with an indexed band or passes.
      *
      * The static side reads the MATERIALIZED shingle store (one
      * columnar scan, memoized + persisted per corpus via
      * [[StaticCache]] — stream-static re-executes the static plan
      * every micro-batch otherwise). At 100 TB the band table is
      * (corpus × NumBands) rows of two hashes — bucket it by band_key
      * and each micro-batch joins co-located.
      *
      * Output is per-(doc, matched corpus doc, band): identical docs
      * match on all bands — downstream gates take `first match wins`
      * per doc (the spec dedupes exactly as a consumer would).
      * StreamingJobsSpec pins: streamed gate over the corpus's own
      * documents ≡ batch dedupMinhash candidate pairs + self-matches.
      */
    def matches(docs: DataFrame, t: Tables): DataFrame = {
      val corpus = StaticCache.of(t, "corpusBands") {
        graft.dedup.Dedup.corpusBands(t)
          .select(col("doc_id").as("corpus_doc"),
            col("band_idx"), col("band_key"))
      }
      MinhashCandidates.bandKeys(docs)
        .join(corpus, Seq("band_idx", "band_key"))
        .select(col("ts"), col("doc_id"), col("corpus_doc"), col("band_idx"))
    }
  }

  // ---------------------------------------------------------------------
  // SubstringGateStream — the INTAKE twin of dedup_substring_spans: which
  // token spans of a newly-arriving document already exist VERBATIM in
  // the corpus? The band gates (CorpusNearDupGate) decide on whole-doc
  // similarity; this one localizes the overlap to exact K-token spans —
  // the "how much of this submission is copied, and which part" answer
  // an admission pipeline attaches to its verdict.
  // ---------------------------------------------------------------------
  object SubstringGateStream {
    import graft.dedup.Substring

    /** Flagged window starts of a live (ts, doc_id, text) stream:
      * positions whose exact K-token window occurs in some corpus doc
      * OTHER than the arriving doc itself. Per-row HOF windows (the
      * shared [[Substring.windowPairs]] definition — stream and batch
      * hashes cannot drift), then one STATELESS stream-static LEFT SEMI
      * join against the materialized corpus window store on the hash —
      * semi, so a window quoted by a thousand corpus docs still emits
      * once and state stays zero. The self-exclusion makes a corpus
      * replay reproduce the batch op exactly (a doc is never "already
      * present" merely because the store indexed the doc itself).
      *
      * The static side is the `graft_substr_wins` INCREMENTAL store
      * resolved to a PINNED generation at job build and cached per
      * (session, corpus, generation) via [[StaticCache]] — a running
      * query serves its immutable pinned segment chain for its whole
      * lifetime, and store growth (a new generation from corpus
      * intake) is observed on ROLL: a restarted gate re-resolves and
      * the gen-keyed cache entry misses (VERDICT r16 #4;
      * StreamingJobsSpec pins verdicts flip only across a restart).
      * At 100 TB bucket it by hash and each micro-batch probes
      * co-located.
      */
    def flagged(docs: DataFrame, t: Tables): DataFrame = {
      val (gen, pinned) = Substring.corpusWindowStorePinned(t)
      val store = StaticCache.at(t, "substrWins", gen)(pinned)
      val wins = docs
        .where(size(split(col("text"), " ")) >= Substring.SpanK)
        .select(col("ts"), col("doc_id"),
          explode(Substring.windowPairs(col("text"), Substring.SpanK)).as("w"))
        .select(col("ts"), col("doc_id"), col("w.pos").as("pos"),
          col("w.h").as("h"))
      wins.join(store,
        wins("h") === store("ch") && store("corpus_doc") =!= wins("doc_id"),
        "left_semi")
    }

    /** Maximal corpus-duplicated spans per arriving doc, append-mode:
      * (win_start, doc_id, spans: array<(span_start, span_end)>,
      * dup_tokens). One watermarked per-(event-window, doc) aggregation
      * collects the flagged starts — state is one in-flight row per doc
      * per event window, position lists bounded by doc length — and the
      * interval merge itself is a per-row HOF fold applying the SAME
      * gap ≤ K rule as the batch `mergeIslands` (all of a doc's windows
      * derive from one input row, so the sorted fold is exact, no
      * second shuffle). Finals emit once the watermark closes the
      * window — immutable, like every append-mode verdict here.
      */
    def spans(docs: DataFrame, t: Tables, watermarkLag: String = "10 seconds",
              windowLen: String = "1 hour"): DataFrame = {
      val k = Substring.SpanK
      val fl = flagged(docs.withWatermark("ts", watermarkLag), t)
      val merge = (acc: Column, p: Column) => {
        val last = element_at(acc, -1)
        when(p - last("l") > k,
          concat(acc, array(struct(p.as("s"), p.as("l")))))
          .otherwise(concat(slice(acc, lit(1), size(acc) - 1),
            array(struct(last("s").as("s"), p.as("l")))))
      }
      fl.groupBy(window(col("ts"), windowLen), col("doc_id"))
        .agg(sort_array(collect_list(col("pos"))).as("ps"))
        .select(
          col("window.start").as("win_start"), col("doc_id"),
          aggregate(
            slice(col("ps"), lit(2), greatest(size(col("ps")) - 1, lit(0))),
            transform(slice(col("ps"), lit(1), lit(1)),
              p => struct(p.as("s"), p.as("l"))),
            merge,
            acc => transform(acc, a => struct(
              a("s").as("span_start"),
              (a("l") + (k - 1)).as("span_end")))).as("spans"))
        .withColumn("dup_tokens",
          aggregate(col("spans"), lit(0L),
            (n, sp) => n + sp("span_end") - sp("span_start") + 1))
    }
  }

  // ---------------------------------------------------------------------
  // ChunkDupGateStream — the INTAKE twin of report_chunk_dup_stats'
  // duplicated-chunk detection: which CHUNKS of a newly-arriving
  // document already exist VERBATIM in the corpus chunk store? Where
  // SubstringGateStream localizes overlap to sliding K-token windows,
  // this gate answers at the embedding pipeline's unit of work — the
  // fixed chunk grid — so an admission pipeline can skip embedding
  // (or admitting) exactly the chunks it already holds (VERDICT r16
  // #3; the SemDeDup intake shape).
  // ---------------------------------------------------------------------
  object ChunkDupGateStream {
    import graft.pipeline.Chunking

    /** Duplicated chunks of a live (ts, doc_id, text) stream:
      * (ts, doc_id, chunk_idx, tok_start, n_tok, h) rows whose exact
      * chunk text (by md5) occurs in some corpus doc OTHER than the
      * arriving doc itself. Per-row HOF chunking (the shared
      * [[Chunking.chunkStructs]] grid — stream and batch chunks cannot
      * drift, the ChunkStream discipline), then one STATELESS
      * stream-static LEFT SEMI join against the corpus chunk-hash
      * store — semi, so a chunk held by a thousand corpus docs emits
      * once and state stays zero. Self-exclusion makes a corpus
      * replay reproduce the batch duplicated-chunk verdicts exactly
      * (StreamingJobsSpec pins it).
      *
      * The static side is the `graft_chunk_h` INCREMENTAL store
      * resolved to a PINNED generation at job build, cached per
      * (session, corpus, generation) — growth is observed on roll,
      * the [[SubstringGateStream]] deployment shape. At 100 TB the
      * store is (corpus chunks) rows of one hash + two ids, bucketed
      * by hash so each micro-batch probes co-located.
      */
    def flagged(docs: DataFrame, t: Tables): DataFrame = {
      val (gen, pinned) = Chunking.corpusChunkStorePinned(t)
      val store = StaticCache.at(t, "chunkHashes", gen)(pinned)
      val ch = docs
        .select(col("ts"), col("doc_id"),
          explode(Chunking.chunkStructs(col("text"))).as("c"))
        .select(col("ts"), col("doc_id"),
          col("c.chunk_idx").as("chunk_idx"),
          col("c.tok_start").as("tok_start"), col("c.n_tok").as("n_tok"),
          md5(col("c.chunk_text")).as("h"))
      ch.join(store,
        ch("h") === store("ch") && store("corpus_doc") =!= ch("doc_id"),
        "left_semi")
    }
  }

  // ---------------------------------------------------------------------
  // ChunkSemanticGateStream — the INTAKE twin of chunk_dedup_semantic:
  // which chunks of a newly-arriving document are SEMANTIC near-dups of
  // corpus chunks? ChunkDupGateStream answers at md5 precision (verbatim
  // copies); this gate catches the paraphrase — most tokens shared, a
  // few edited, md5 different — so an admission pipeline can skip
  // embedding (or admitting) lightly-edited rehashes of content it
  // already holds (the SemDeDup intake shape, at the embedding
  // pipeline's unit of work).
  // ---------------------------------------------------------------------
  object ChunkSemanticGateStream {
    import graft.pipeline.{Chunking, ChunkSemantic}

    /** Semantic near-dup chunks of a live (ts, doc_id, text) stream:
      * (ts, doc_id, chunk_idx, tok_start, n_tok, corpus_doc,
      * corpus_chunk, cos_sim) — one row per (arriving chunk, matching
      * corpus chunk) with `cos_sim ≥ SemCosMin`, verbatim-identical
      * texts EXCLUDED (`h ≠ ch`: those are [[ChunkDupGateStream]]'s
      * verdicts) and the arriving doc's own stored chunks excluded
      * (self-exclusion, so a corpus replay surfaces only what another
      * doc holds — the batch op's pair criterion seen from one side).
      *
      * Shape: per-row chunking + feature-hash embedding + the four SRP
      * sign words (all native codegen'd expressions in the stream
      * projection), then ONE STATELESS stream-static equi-join on
      * (tbl, bkt) against the banded corpus side pinned at a named
      * chunk-vector-store generation ([[ChunkSemantic
      * .corpusVecBandsPinned]]: band width derived from the pinned
      * generation's occupancy, corpus-side flood cap applied at build).
      * A pair colliding in several band tables must emit ONCE without
      * streaming-stateful `dropDuplicates`: both sides carry all four
      * sign words, and the join keeps only the FIRST matching
      * ADMITTED table (`tbl = min{k: words agree at the pinned width
      * AND k ∈ store.adm}` — computed from the carried words plus the
      * store row's admitted-table mask, purely stateless;
      * StreamingJobsSpec pins a permuted verbatim copy, which collides
      * in ALL tables, emitting exactly one row per corpus chunk). The
      * mask term is load-bearing (ADVICE r19): when the width ladder
      * bottoms out at BandBitsMax with a residual non-identical-vector
      * flood, a corpus chunk can be flood-DROPPED at table j yet
      * admitted at table k > j — sign agreement alone would point
      * firstMatch at the dropped table, where no store row exists, and
      * the pair the batch `pairsFrom` emits (any admitted table +
      * distinct) would be silently missed; StreamingJobsSpec plants
      * exactly that store shape and pins the single emission. Exact
      * cosine on the carried vectors gates admission,
      * [[graft.functions.Portable.round6]]-rounded — bit-identical to
      * the batch entry's score. State is ZERO; at 100 TB the corpus
      * side buckets by (tbl, bkt) so each micro-batch probes
      * co-located, and the stream payload is ids + one 64-double
      * vector per chunk, never text.
      */
    def flagged(docs: DataFrame, t: Tables): DataFrame = {
      val (gen, bits, bandsPinned) = ChunkSemantic.corpusVecBandsPinned(t)
      val store = StaticCache.at(t, "chunkVecBands", gen)(bandsPinned)
      flaggedAgainst(docs, bits, store)
    }

    /** The join core against an already-pinned (width, banded-store)
      * pair — split out so the spec can plant a store whose admitted-
      * table mask diverges from sign agreement (the flood shape above)
      * without engineering a 33-chunk full-width flood corpus.
      */
    private[streaming] def flaggedAgainst(docs: DataFrame, bits: Int,
                                          store: DataFrame): DataFrame = {
      val v = graft.functions.TextFunctions
        .hashFeatureVec(split(col("c.chunk_text"), " "), ChunkSemantic.Dims)
      val ch = docs
        .select(col("ts"), col("doc_id"),
          explode(Chunking.chunkStructs(col("text"))).as("c"))
        .select(col("ts"), col("doc_id"),
          col("c.chunk_idx").as("chunk_idx"),
          col("c.tok_start").as("tok_start"), col("c.n_tok").as("n_tok"),
          md5(col("c.chunk_text")).as("h"), v.as("v"))
        .withColumn("n2", graft.functions.VectorFunctions.dot(col("v"), col("v")))
        .where(col("n2") > 0)
        .withColumn("w", array((0 until ChunkSemantic.NumTables).map(j =>
          graft.functions.TextFunctions.srpWord16(col("v"), j)): _*))
        .select(col("ts"), col("doc_id"), col("chunk_idx"),
          col("tok_start"), col("n_tok"), col("h"), col("v"), col("w"),
          explode(array((0 until ChunkSemantic.NumTables).map(j =>
            struct(lit(j).as("tbl"),
              shiftright(col("w")(j),
                ChunkSemantic.BandBitsMax - bits).as("bkt"))): _*)).as("tb"))
        .select(col("ts"), col("doc_id"), col("chunk_idx"),
          col("tok_start"), col("n_tok"), col("h"), col("v"), col("w"),
          col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
      // first matching ADMITTED table between the carried word arrays
      // at the pinned width — the stateless cross-table pair dedup.
      // The adm-mask conjunct skips tables where the corpus chunk's
      // bucket was flood-dropped at store build (no store row exists
      // there, so a firstMatch pointing at it would drop the pair).
      val shift = ChunkSemantic.BandBitsMax - bits
      def agreeAt(k: Int) =
        shiftright(ch("w")(k), shift) === shiftright(store("cw")(k), shift) &&
          array_contains(store("adm"), k)
      val firstMatch = (0 until ChunkSemantic.NumTables).reverse
        .foldLeft(lit(ChunkSemantic.NumTables)) {
          case (acc, k) => when(agreeAt(k), lit(k)).otherwise(acc)
        }
      ch.join(store,
        ch("tbl") === store("tbl") && ch("bkt") === store("bkt") &&
          store("corpus_doc") =!= ch("doc_id") &&
          store("ch") =!= ch("h") &&
          ch("tbl") === firstMatch)
        .select(ch("ts"), ch("doc_id"), ch("chunk_idx"),
          ch("tok_start"), ch("n_tok"),
          col("corpus_doc"), col("corpus_chunk"),
          graft.functions.Portable.round6(
            graft.functions.VectorFunctions.cosineSim(ch("v"), col("cv")))
            .as("cos_sim"))
        .where(col("cos_sim") >= ChunkSemantic.SemCosMin)
    }

    /** The per-DOC admission verdict — `doc_semantic_dup_frac` on live
      * intake, append-mode: (win_start, doc_id, n_chunks, dup_chunks,
      * dup_frac, verdict) with verdict = 'keep' iff round6(dup_chunks
      * / n_chunks) < [[graft.pipeline.ChunkSemantic.SemDupFracMax]].
      * A chunk counts as duplicated only when some STRICTLY EARLIER
      * (corpus_doc, corpus_chunk) — struct-lexicographic, the batch
      * pair order — semantically matches it: the keep-first
      * orientation, so the first holder of any content keeps its place
      * and a verdict never flips retroactively as later docs arrive
      * (new intake can only be marked, never retro-mark the corpus).
      * The denominator is the FULL chunk grid from the doc's token
      * count ([[graft.pipeline.ChunkSemantic.nChunksOf]] — ONE shared
      * definition with the batch op).
      *
      * Shape — the [[SubstringGateStream.spans]] discipline verbatim:
      * the flagged matches plus one per-doc PRESENCE row (so a doc
      * with zero matches still emits its 'keep' verdict) union into
      * ONE watermarked (event-window, doc) aggregation — stateful op
      * #1 and only — whose state per in-flight doc is one counter row
      * bounded by the doc's OWN chunk-grid length (collect_set of
      * flagged chunk_idx; the band cap bounded the match fan-out
      * upstream, and set-dedup collapses multi-corpus-match chunks),
      * the whale argument the batch op's scaladoc makes. Everything
      * after the aggregation is a stateless per-row projection.
      * Finals emit once the watermark closes the window — immutable,
      * like every append-mode verdict here. StreamingJobsSpec pins a
      * corpus replay ≡ the batch `doc_semantic_dup_frac` rows and a
      * planted paraphrasing doc dropped at intake.
      */
    def verdicts(docs: DataFrame, t: Tables,
                 watermarkLag: String = "10 seconds",
                 windowLen: String = "1 hour"): DataFrame = {
      val base = docs.withWatermark("ts", watermarkLag)
      val presence = base.select(col("ts"), col("doc_id"),
        ChunkSemantic.nChunksOf(size(split(col("text"), " ")))
          .as("n_chunks"),
        lit(-1).as("chunk_idx"))
      val hits = flagged(base, t)
        .where(struct(col("corpus_doc").as("d"), col("corpus_chunk").as("c")) <
          struct(col("doc_id").as("d"), col("chunk_idx").as("c")))
        .select(col("ts"), col("doc_id"),
          lit(null).cast("long").as("n_chunks"), col("chunk_idx"))
      val frac = graft.functions.Portable.round6(
        col("dup_chunks").cast("double") / col("n_chunks").cast("double"))
      presence.unionByName(hits)
        .groupBy(window(col("ts"), windowLen), col("doc_id"))
        .agg(max(col("n_chunks")).as("n_chunks"),
          collect_set(col("chunk_idx")).as("hit_set"))
        .select(col("window.start").as("win_start"), col("doc_id"),
          col("n_chunks"),
          size(array_remove(col("hit_set"), -1)).cast("long")
            .as("dup_chunks"))
        .select(col("win_start"), col("doc_id"), col("n_chunks"),
          col("dup_chunks"), frac.as("dup_frac"),
          when(frac < ChunkSemantic.SemDupFracMax, lit("keep"))
            .otherwise(lit("drop")).as("verdict"))
    }
  }

  // ---------------------------------------------------------------------
  // ClusterAssignStream — incremental cluster maintenance: the streaming
  // half of dedup_clusters. A newly-arriving doc is band-probed against
  // the corpus store (CorpusNearDupGate's join), VERIFIED by exact
  // shingle Jaccard against each matched corpus doc (dedup_minhash_
  // verified's criterion, per arriving doc), and assigned a keeper in a
  // flatMapGroupsWithState state store: the min keeper among its
  // verified clusters, or itself when nothing verifies.
  // ---------------------------------------------------------------------
  object ClusterAssignStream {

    /** One verify-join row headed for the state store: a doc's presence
      * (corpusDoc None) or one (matched corpus doc, common shingle)
      * hit. `nA` = the arriving doc's distinct shingle count; `keeper`/
      * `nB` describe the matched corpus doc's cluster and set size.
      * `sHash` is the 64-bit xxhash64 of the common shingle — state
      * only ever counts distinct shingles, so text never enters the
      * store (ADVICE r8); `salt` routes the row to its state shard.
      */
    private[streaming] case class AssignRow(
        ts: java.sql.Timestamp, docId: Long, nA: Int, salt: Int,
        corpusDoc: Option[Long], sHash: Option[Long],
        keeper: Option[Long], nB: Option[Int])

    /** Per-shard accumulator: matched corpus docs with their keeper,
      * set size and the distinct common shingle HASHES seen so far in
      * this shard (kept distinct on merge — multi-band duplicate
      * matches collapse here, where the batch twin uses `.distinct()`).
      */
    private[streaming] case class CorpusAcc(
        keeper: Long, nB: Int, common: Seq[Long])
    private[streaming] case class AssignState(
        tsMs: Long, nA: Int, matches: Map[Long, CorpusAcc])

    /** One salted shard's evidence, emitted at shard timeout; hits =
      * (corpus doc, its keeper, n_b, common-in-shard). Shards hold
      * disjoint shingle subsets, so the merge adds counts.
      */
    private[streaming] case class AssignPartial(
        docId: Long, nA: Int, hits: Seq[(Long, Long, Int, Int)])

    /** Shards per doc key — whale protection, same design and
      * rationale as [[ContainmentGate.Salts]].
      */
    val Salts = 8

    /** The verify gate — IDENTICAL to the batch criterion
      * (dedup.Dedup's `round6(common / (nA + nB − common)) >= JaccardMin`,
      * Portable.round6's IEEE sequence): a ratio inside [0.7999995, 0.8)
      * rounds UP to the threshold and verifies in BOTH engines. An
      * epsilon compare on the raw ratio (the previous form) rejected
      * that window in the stream only — a planted boundary pair would
      * have diverged from batch (StreamingJobsSpec pins the alignment).
      */
    private[streaming] def verifies(common: Int, nA: Int, nB: Int): Boolean =
      graft.functions.Portable.round6Double(
        common.toDouble / (nA + nB - common)) >= graft.dedup.Dedup.JaccardMin

    /** Keeper assignments for a (ts, doc_id, text) intake stream:
      * (doc_id, keeper_id, n_verified). Semantics (StreamingJobsSpec
      * pins them on the corpus's own docs): a doc's verified partners
      * are the corpus docs sharing an LSH band whose EXACT shingle
      * Jaccard clears [[graft.dedup.Dedup.JaccardMin]] — identical
      * criterion to the batch `dedup_minhash_verified` — and its keeper
      * is the min cluster keeper among them ([[graft.dedup.Dedup
      * .nearDupClusters]] labels, a corpus doc outside every cluster
      * being its own keeper), or the doc's own id when nothing
      * verifies. Replaying the corpus through the gate therefore
      * reproduces the batch cluster labels exactly.
      *
      * A new doc bridging TWO clusters joins the min-keeper one — the
      * incremental assignment cannot merge existing clusters; the
      * periodic batch `dedup_clusters` recompute is the compaction that
      * does (the IndexMaintenance generation story, applied to
      * clusters).
      *
      * Shape: per-row HOF band keys + shingle set (one source
      * subscription), stateless stream-static joins against the THREE
      * memoized corpus tables (bands, shingles, keepers), then TWO
      * append-mode stateful operators (the reference's
      * updateStateByKey heritage, salted): a (doc, salt)-keyed shard
      * store accumulating verify hits over disjoint shingle-hash
      * subsets until the event-time timeout passes the doc's ts +
      * watermark lag, and a doc-keyed stateless merge that sums shard
      * counts and emits the assignment ([[Salts]] scaladoc — the
      * whale-salting rationale; all shards of a doc share its event
      * ts, so their partials surface in one micro-batch). Shard state
      * is bounded by (LSH matches × shingles)/Salts and holds 64-bit
      * shingle hashes, never text; identical-doc whales are bounded
      * by the band-collision fan-out, same as the batch verify stage.
      */
    /** `labelsRoot`: when set, the keeper table is resolved from the
      * CURRENT committed generation of a [[graft.storage.ClusterStore]]
      * instead of computed live — the production deployment shape: a
      * periodic batch recluster publishes a generation, and the intake
      * job pins the one it resolved at start (immutable mid-run; a
      * restart or roll picks up the newest). Without it the live
      * `nearDupClusters` memoization is correct for a test session but
      * a days-long intake job would never see recluster results.
      */
    def assignments(docs: DataFrame, t: Tables,
                    watermarkLag: String = "30 seconds",
                    labelsRoot: Option[String] = None): Dataset[(Long, Long, Int)] = {
      val spark = docs.sparkSession
      import spark.implicits._
      saltedPartials(docs, t, watermarkLag, labelsRoot)
        .groupByKey(_.docId)
        .flatMapGroupsWithState(
          OutputMode.Append, GroupStateTimeout.NoTimeout)(
          (docId: Long, partials: Iterator[AssignPartial],
           state: GroupState[AssignState]) => {
            // stateless merge — every shard of a doc times out in the
            // same micro-batch (identical doc ts → identical timeout),
            // so one batch carries all of its partials
            var nA = 0
            val accs = scala.collection.mutable
              .Map.empty[Long, (Long, Int, Int)]
            partials.foreach { p =>
              nA = math.max(nA, p.nA)
              p.hits.foreach { case (cd, keeper, nb, common) =>
                val (k0, n0, c0) = accs.getOrElse(cd, (keeper, nb, 0))
                accs(cd) = (k0, n0, c0 + common)
              }
            }
            val verified = accs.filter { case (_, (_, nb, common)) =>
              verifies(common, nA, nb)
            }
            val keeper =
              if (verified.isEmpty) docId
              else verified.valuesIterator.map(_._1).min
            Iterator((docId, keeper, verified.size))
          })
    }

    /** Stage 1 — the salted shard accumulator ([[Salts]] scaladoc has
      * the whale rationale); exposed to the spec so shard spread is
      * directly observable on a planted whale.
      */
    private[streaming] def saltedPartials(
        docs: DataFrame, t: Tables,
        watermarkLag: String = "30 seconds",
        labelsRoot: Option[String] = None): Dataset[AssignPartial] = {
      val spark = docs.sparkSession
      import spark.implicits._
      val lagMs = lagMillis(watermarkLag)
      val corpusBands = StaticCache.of(t, "corpusBands") {
        graft.dedup.Dedup.corpusBands(t)
          .select(col("doc_id").as("corpus_doc"),
            col("band_idx"), col("band_key"))
      }
      val corpusSh = StaticCache.of(t, "corpusShingles") {
        graft.dedup.Dedup.corpusShingleStore(t)
          .select(col("doc_id").as("corpus_doc"), col("s"))
      }
      val corpusSizes = StaticCache.of(t, "corpusShingleSizes") {
        graft.dedup.Dedup.corpusShingleStore(t)
          .groupBy(col("doc_id").as("corpus_doc"))
          .agg(count(lit(1)).cast("int").as("n_b"))
      }
      val keepers = labelsRoot match {
        case Some(root) =>
          import graft.storage.ClusterStore
          val n = ClusterStore.currentGeneration(root,
            spark.sessionState.newHadoopConf()).getOrElse(
            throw new IllegalStateException(
              s"no committed cluster-label generation under $root"))
          StaticCache.of(t, s"corpusKeepers@$root/gen=$n") {
            ClusterStore.readLabels(spark, root, n)
              .select(col("doc_id").as("corpus_doc"),
                col("keeper_id").as("cluster_keeper"))
          }
        case None => StaticCache.of(t, "corpusKeepers") {
          graft.dedup.Dedup.nearDupClusters(t)
            .select(col("doc_id").as("corpus_doc"),
              col("keeper_id").as("cluster_keeper"))
        }
      }
      val rows = MinhashCandidates
        .bandKeysCarrying(docs,
          "sh_set" -> array_distinct(col("sh")),
          "n_a" -> size(array_distinct(col("sh"))))
        .withWatermark("ts", watermarkLag)
        // band probe; LEFT so a no-match doc still reaches the store
        .join(corpusBands, Seq("band_idx", "band_key"), "left")
        // one row per shingle for matched rows; exactly one null-s row
        // for unmatched ones (explode of a single-null array)
        .select(col("ts"), col("doc_id"), col("n_a"), col("corpus_doc"),
          explode(when(col("corpus_doc").isNull, array(lit(null)))
            .otherwise(col("sh_set"))).as("s"))
        // which of the doc's shingles the matched corpus doc shares —
        // LEFT again: a band match with zero common shingles must not
        // erase the doc's presence row
        .join(corpusSh.select(col("corpus_doc"), col("s"),
          lit(true).as("hit")), Seq("corpus_doc", "s"), "left")
        .join(corpusSizes, Seq("corpus_doc"), "left")
        .join(keepers, Seq("corpus_doc"), "left")
        .select(col("ts"), col("doc_id").as("docId"), col("n_a").as("nA"),
          // presence rows (null s) route to shard 0 so every doc owns
          // at least one shard and always emits an assignment
          coalesce(pmod(xxhash64(col("s")), lit(Salts)).cast("int"),
            lit(0)).as("salt"),
          when(col("hit"), col("corpus_doc")).as("corpusDoc"),
          when(col("hit"), xxhash64(col("s"))).as("sHash"),
          when(col("hit"),
            coalesce(col("cluster_keeper"), col("corpus_doc"))).as("keeper"),
          when(col("hit"), col("n_b")).as("nB"))
        .as[AssignRow]
      rows
        .groupByKey(r => (r.docId, r.salt))
        .flatMapGroupsWithState(
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
          (key: (Long, Int), batch: Iterator[AssignRow],
           state: GroupState[AssignState]) => {
            if (state.hasTimedOut) {
              val st = state.get
              state.remove()
              Iterator(AssignPartial(key._1, st.nA,
                st.matches.iterator.map { case (cd, acc) =>
                  (cd, acc.keeper, acc.nB, acc.common.size)
                }.toSeq))
            } else {
              var st = state.getOption.getOrElse(AssignState(0L, 0, Map.empty))
              batch.foreach { r =>
                st = st.copy(tsMs = math.max(st.tsMs, r.ts.getTime),
                  nA = math.max(st.nA, r.nA))
                for (cd <- r.corpusDoc; sh <- r.sHash) {
                  val acc = st.matches.getOrElse(cd,
                    CorpusAcc(r.keeper.getOrElse(cd), r.nB.getOrElse(0), Nil))
                  if (!acc.common.contains(sh))
                    st = st.copy(matches = st.matches
                      .updated(cd, acc.copy(common = acc.common :+ sh)))
                  else st = st.copy(matches = st.matches.updated(cd, acc))
                }
              }
              state.update(st)
              state.setTimeoutTimestamp(math.max(st.tsMs + lagMs,
                state.getCurrentWatermarkMs() + 1))
              Iterator.empty
            }
          })
    }
  }

  // ---------------------------------------------------------------------
  // ContainmentGate — the INTAKE twin of dedup_containment: is a newly
  // arriving document contained in (or containing) something already IN
  // the corpus? The band gates structurally miss this shape — a small
  // doc quoted inside a 10× larger one almost never shares a minhash
  // band — so the intake quartet gains the posting-list probe: the
  // asymmetric-inclusion decision made BEFORE admitting a doc.
  // ---------------------------------------------------------------------
  object ContainmentGate {

    import graft.dedup.Dedup

    /** One posting-probe row headed for the state store: an arriving
      * doc's capped shingle `s`, and — when some corpus doc holds it —
      * that doc and its capped shingle count.
      */
    private[streaming] case class ContainRow(
        ts: java.sql.Timestamp, docId: Long, salt: Int, sHash: Long,
        corpusDoc: Option[Long], nB: Option[Int])

    private[streaming] case class CorpusHit(nB: Int, common: Seq[Long])
    private[streaming] case class ContainState(
        tsMs: Long, own: Seq[Long], matches: Map[Long, CorpusHit])

    /** One salted shard's accumulated evidence for a doc, emitted at
      * shard timeout: its share of the doc's capped shingle count and,
      * per matched corpus doc, (n_b, common-in-shard). Shingles route
      * to shards by hash, so shard shares are DISJOINT and the final
      * merge is pure addition.
      */
    private[streaming] case class ContainPartial(
        docId: Long, nOwn: Int, hits: Seq[(Long, Int, Int)])

    /** Shards per doc key. Whale protection (VERDICT r8 #2): a doc
      * whose posting probe fans out on MANY shingles used to
      * concentrate its whole accumulation — every (shingle × corpus
      * doc) hit — in ONE state-store partition under the doc key.
      * Salting the stateful pre-aggregation by shingle hash spreads
      * that across [[Salts]] independent state rows (different keys →
      * different state-store partitions), and the doc-keyed merge
      * stage then sees ≤ Salts COUNT rows per corpus doc instead of
      * shingle strings — per-doc state bytes drop from
      * O(shingles × fan-out × strlen) to O(matched docs × 16).
      */
    val Salts = 8

    /** The batch criterion verbatim ([[graft.dedup.Dedup.dedupContainment]]:
      * round6(common / min(nA, nB)) ≥ ContainmentMin, both sides at
      * least ContainmentMinShingles capped shingles) — Portable.round6's
      * IEEE sequence so boundary ratios verify in both engines.
      */
    private[streaming] def contains(common: Int, nA: Int, nB: Int): Boolean =
      nA >= Dedup.ContainmentMinShingles &&
        nB >= Dedup.ContainmentMinShingles &&
        graft.functions.Portable.round6Double(
          common.toDouble / math.min(nA, nB)) >= Dedup.ContainmentMin

    /** (doc_id, corpus_doc, containment) for every arriving doc whose
      * capped-shingle overlap with a corpus doc clears the containment
      * threshold — replaying a corpus-resident doc reproduces its batch
      * [[graft.dedup.Dedup.dedupContainment]] partners exactly, both
      * orientations, plus the trivial self-match (StreamingJobsSpec
      * pins it).
      *
      * Shape: per-row HOF shingling (the shared batch definition), an
      * anti-join against the memoized FLOODED vocabulary (so `nA`
      * counts exactly the batch op's capped shingles — novel shingles
      * the corpus never saw stay in, boilerplate stays out), a LEFT
      * join against the capped posting list (s → corpus_doc, n_b), then
      * TWO stateful operators, both append-mode: a ([[Salts]]-way)
      * SALTED accumulation stage whose shards hold disjoint shingle-
      * hash sets, and a doc-keyed merge stage that adds up shard
      * COUNTS and applies the batch criterion. The posting list is
      * doc-freq-capped — no row of it exceeds [[graft.dedup.Dedup
      * .ShingleDocFreqCap]] corpus docs — so a boilerplate flood
      * cannot blow up the join, and the salting ([[Salts]] scaladoc)
      * keeps even a max-fan-out whale doc from concentrating its
      * accumulation in one state-store partition (StreamingJobsSpec
      * plants one and pins shard spread + unchanged results). State
      * holds 64-bit xxhash64 shingle hashes, never shingle text — only
      * set SIZES enter the containment decision (ADVICE r8).
      *
      * Timing invariant the merge stage leans on: every shard of a doc
      * sees the same event ts (one source row, exploded) and sets the
      * identical timeout, so all of a doc's partials surface in the
      * SAME micro-batch and the merge stage needs no state of its own.
      */
    def matches(docs: DataFrame, t: Tables,
                watermarkLag: String = "30 seconds"): Dataset[(Long, Long, Double)] = {
      val spark = docs.sparkSession
      import spark.implicits._
      saltedPartials(docs, t, watermarkLag)
        .groupByKey(_.docId)
        .flatMapGroupsWithState(
          OutputMode.Append, GroupStateTimeout.NoTimeout)(
          (docId: Long, partials: Iterator[ContainPartial],
           state: GroupState[ContainState]) => {
            // stateless merge: all shards of a doc time out together
            // (see the timing invariant above), so one batch holds
            // every partial — nothing is ever stored
            var nA = 0
            val hits = scala.collection.mutable.Map.empty[Long, (Int, Int)]
            partials.foreach { p =>
              nA += p.nOwn
              p.hits.foreach { case (cd, nb, common) =>
                val (n0, c0) = hits.getOrElse(cd, (nb, 0))
                hits(cd) = (n0, c0 + common)
              }
            }
            hits.iterator.collect {
              case (cd, (nb, common)) if contains(common, nA, nb) =>
                (docId, cd, graft.functions.Portable.round6Double(
                  common.toDouble / math.min(nA, nb)))
            }
          })
    }

    /** Stage 1 — the salted shard accumulator; exposed to the spec so
      * shard spread is directly observable.
      */
    private[streaming] def saltedPartials(
        docs: DataFrame, t: Tables,
        watermarkLag: String = "30 seconds"): Dataset[ContainPartial] = {
      val spark = docs.sparkSession
      import spark.implicits._
      val lagMs = lagMillis(watermarkLag)
      val flooded = StaticCache.of(t, "containFlooded") {
        Dedup.floodedShingleVocab(t)
      }
      val posting = StaticCache.of(t, "containPosting") {
        Dedup.containmentCorpusPosting(t)
      }
      val rows = docs
        .withColumn("toks", split(col("text"), " "))
        .where(size(col("toks")) >= Dedup.ShingleSize)
        .withColumn("sh", graft.functions.TextFunctions.shingles(
          col("toks"), Dedup.ShingleSize))
        .select(col("ts"), col("doc_id"),
          explode(array_distinct(col("sh"))).as("s"))
        .withWatermark("ts", watermarkLag)
        .join(flooded, Seq("s"), "left_anti")
        .join(posting, Seq("s"), "left")
        .select(col("ts"), col("doc_id").as("docId"),
          pmod(xxhash64(col("s")), lit(Salts)).cast("int").as("salt"),
          xxhash64(col("s")).as("sHash"),
          col("corpus_doc").as("corpusDoc"), col("n_b").as("nB"))
        .as[ContainRow]
      rows
        .groupByKey(r => (r.docId, r.salt))
        .flatMapGroupsWithState(
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
          (key: (Long, Int), batch: Iterator[ContainRow],
           state: GroupState[ContainState]) => {
            if (state.hasTimedOut) {
              val st = state.get
              state.remove()
              Iterator(ContainPartial(key._1, st.own.size,
                st.matches.iterator.map { case (cd, h) =>
                  (cd, h.nB, h.common.size)
                }.toSeq))
            } else {
              // set-based accumulation: the posting join fans each
              // shingle out once per matching corpus doc, so a
              // Seq.contains dedupe would be O(shingles × fan-out) per
              // micro-batch — linear sets, serialized back to Seqs for
              // the state encoder
              val st0 = state.getOption
                .getOrElse(ContainState(0L, Nil, Map.empty))
              var tsMs = st0.tsMs
              val own = scala.collection.mutable.Set(st0.own: _*)
              val hits = scala.collection.mutable.Map.empty[
                Long, (Int, scala.collection.mutable.Set[Long])]
              st0.matches.foreach { case (cd, h) =>
                hits(cd) = (h.nB, scala.collection.mutable.Set(h.common: _*))
              }
              batch.foreach { r =>
                tsMs = math.max(tsMs, r.ts.getTime)
                own += r.sHash
                for (cd <- r.corpusDoc; nb <- r.nB)
                  hits.getOrElseUpdate(
                    cd, (nb, scala.collection.mutable.Set.empty[Long]))
                    ._2 += r.sHash
              }
              val st = ContainState(tsMs, own.toSeq,
                hits.iterator.map { case (cd, (nb, set)) =>
                  cd -> CorpusHit(nb, set.toSeq)
                }.toMap)
              state.update(st)
              state.setTimeoutTimestamp(math.max(st.tsMs + lagMs,
                state.getCurrentWatermarkMs() + 1))
              Iterator.empty
            }
          })
    }
  }

  // ---------------------------------------------------------------------
  // LmScoreStream — textanalysis.TextAnalysis.lmBigramScore on a live
  // intake stream: score arriving documents against the STATIC
  // corpus-trained bigram model. Completes the intake trio —
  // CorpusCleanStream (quality gate), CorpusNearDupGate (dedup gate),
  // LmScoreStream (LM fluency gate).
  // ---------------------------------------------------------------------
  object LmScoreStream {

    import graft.textanalysis.TextAnalysis

    /** (ts, doc_id, n_bigrams, lm_score) for a (ts, doc_id, text)
      * stream: per-row HOF bigram explosion (the batch definition,
      * shared), two stateless stream-static lookup joins against the
      * memoized model tables plus the one-row vocab broadcast, then a
      * watermarked (ts, doc_id) aggregation in append mode — the sum
      * crosses the same fixed-point BIGINT as the batch plan, so
      * per-doc scores are EXACTLY the batch scores (StreamingJobsSpec
      * pins stream ≡ batch on the corpus's own documents). Bigrams the
      * model never saw (possible on a live stream, impossible in
      * batch) smooth to (0 + 1) / (c1 + V) via the shared coalesce.
      */
    def scores(docs: DataFrame, t: Tables,
               watermarkLag: String = "30 seconds"): DataFrame = {
      val big = StaticCache.of(t, "lmBig")(TextAnalysis.lmModelBig(t))
      val uni = StaticCache.of(t, "lmUni")(TextAnalysis.lmModelUni(t))
      val voc = StaticCache.of(t, "lmVocab")(TextAnalysis.lmVocab(t))
      val bi = TextAnalysis.bigramsOf(
        docs.select(col("ts"), col("doc_id"), col("text")))
        .withWatermark("ts", watermarkLag)
      TextAnalysis.lmScoredBigrams(bi, big, uni, voc)
        .groupBy(col("ts"), col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("p12")).as("sp"))
        .select(col("ts"), col("doc_id"), col("n_bigrams"),
          TextAnalysis.lmScoreExpr)
    }
  }

  // ---------------------------------------------------------------------
  // LmBucketStream — pipeline.Mixing.ccnetBucketBounded on live intake:
  // score an arriving (ts, doc_id, lang, text) document against the
  // static corpus bigram model and assign its CCNet quality bucket from
  // the corpus's per-language boundary table. The intake pipeline's
  // MIXING stage: downstream samplers read the bucket straight off the
  // stream instead of waiting for a batch re-bucket.
  // ---------------------------------------------------------------------
  object LmBucketStream {

    import graft.textanalysis.TextAnalysis
    import graft.pipeline.Mixing

    /** (ts, doc_id, lang, lm_score, bucket) for a (ts, doc_id, lang,
      * text) stream. The score path is [[LmScoreStream]] with `lang`
      * carried through the aggregation key (constant per doc — the key
      * is still (ts, doc_id) in effect); the bucket is one stateless
      * LEFT join against the memoized langs×2 boundary table
      * (`Mixing.ccnetBounds` — the identical cut values the batch twin
      * broadcasts) plus the shared bucket CASE, so replaying a corpus
      * doc reproduces its batch `lm_ccnet_bucket_bounded` bucket
      * EXACTLY (StreamingJobsSpec pins it — fixed-point scores make
      * stream ≡ batch bit-for-bit, and the boundary rule reads only
      * the score). A language the corpus has no boundaries for (novel
      * at intake) emits bucket `unbucketed` rather than guessing —
      * the batch recompute picks it up once the corpus has the
      * language (spec plants one).
      *
      * `boundsRoot` pins the boundary table to the current COMMITTED
      * `storage.BoundsStore` generation instead of computing it live —
      * the maintenance story: as intake shifts the score distribution,
      * the periodic batch job publishes fresh terciles (langs×2 rows,
      * cheap) and the intake job observes them on roll, exactly the
      * `ClusterAssignStream.labelsRoot` protocol (spec drives a
      * doctored gen-1 swap end to end).
      */
    def buckets(docs: DataFrame, t: Tables,
                watermarkLag: String = "30 seconds",
                boundsRoot: Option[String] = None): DataFrame = {
      val big = StaticCache.of(t, "lmBig")(TextAnalysis.lmModelBig(t))
      val uni = StaticCache.of(t, "lmUni")(TextAnalysis.lmModelUni(t))
      val voc = StaticCache.of(t, "lmVocab")(TextAnalysis.lmVocab(t))
      val bounds = boundsRoot match {
        case Some(root) =>
          import graft.storage.BoundsStore
          val spark = docs.sparkSession
          val n = BoundsStore.currentGeneration(root,
            spark.sessionState.newHadoopConf()).getOrElse(
            throw new IllegalStateException(
              s"no committed bounds generation under $root"))
          StaticCache.of(t, s"ccnetBounds@$root/gen=$n") {
            BoundsStore.readBounds(spark, root, n)
          }
        case None => StaticCache.of(t, "ccnetBounds")(Mixing.ccnetBounds(t))
      }
      val bi = TextAnalysis.bigramsOf(
        docs.select(col("ts"), col("doc_id"), col("lang"), col("text")))
        .withWatermark("ts", watermarkLag)
      TextAnalysis.lmScoredBigrams(bi, big, uni, voc)
        .groupBy(col("ts"), col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("p12")).as("sp"))
        .select(col("ts"), col("doc_id"), col("lang"),
          TextAnalysis.lmScoreExpr)
        .join(bounds, Seq("lang"), "left")
        .select(col("ts"), col("doc_id"), col("lang"), col("lm_score"),
          when(col("s1").isNull, lit("unbucketed"))
            .otherwise(Mixing.bucketExpr).as("bucket"))
    }
  }

  // ---------------------------------------------------------------------
  // IntakeSamplerStream — pipeline.Intake.corpusAdmit on live intake:
  // the WHOLE admit/drop verdict riding one streaming query. First-seen
  // marker → quality → repetition → near-dup → containment → semantic
  // chunk dup → CCNet bucket → keep coin; admissions() emits each clearing doc once with
  // its bucket and coin, verdicts() emits EVERY doc with its first
  // failing gate (the corpus_admit_verdicts observability twin).
  // ---------------------------------------------------------------------
  object IntakeSamplerStream {

    import graft.dedup.Dedup
    import graft.pipeline.{CorpusClean, Intake, Mixing}
    import graft.textanalysis.TextAnalysis

    /** One intake row headed for the first-seen marker store. */
    private[streaming] case class IntakeRow(
        ts: java.sql.Timestamp, docId: Long, lang: String, text: String,
        textHash: String, nChars: Int)

    /** Marker output: the row plus its exact-dup flag. */
    private[streaming] case class MarkedRow(
        ts: java.sql.Timestamp, docId: Long, lang: String, text: String,
        textHash: String, nChars: Int, dup: Int)

    private[streaming] case class SeenState(tsMs: Long)

    /** (ts, doc_id, lang, lm_score, bucket, u, text_hash) for every
      * ADMITTED doc of a (ts, doc_id, lang, text[, n_chars]) intake
      * stream — the streaming twin of [[graft.pipeline.Intake
      * .corpusAdmit]], one emitted row per admission (StreamingJobsSpec
      * pins replayed-corpus admissions ≡ the batch op exactly).
      * `text_hash` (md5(text), the dedup-store key) rides the output so
      * downstream reconciliation can map a stream-chosen representative
      * to the batch keeper of the same duplicate class (ADVICE r9).
      *
      * KEEPER RULE (VERDICT r9 #3, spec-pinned): the batch keeper is
      * the LOWEST doc_id per md5(text); the stream elects the lowest
      * doc_id WITHIN THE EARLIEST MICRO-BATCH that carries the hash.
      * Any replay that lands each duplicate class's batch keeper no
      * later than its dups — one big batch, keepers-first feeding, or
      * doc_id-ordered intake — reproduces the batch choice exactly;
      * genuinely out-of-order arrival admits the first-arriving doc of
      * the class instead, whose own doc_id drives its own ccn coin (the
      * divergence is per-class representative identity, never a
      * duplicate admission — and `text_hash` makes it reconcilable
      * against a batch recompute; `Intake.reconcileAdmissions`
      * computes exactly that join). A
      * redelivered copy of an already-marked row is marked `dup`; it
      * merges into the keeper's (ts, doc_id) aggregation group, where
      * the min() dup reduction discards the redundant mark — the doc
      * is admitted exactly once, neither twice (the copy never wins)
      * nor zero times (the copy cannot poison the keeper; ADVICE r10,
      * spec-pinned on an in-watermark redelivery replay).
      *
      * `boundsRoot` (VERDICT r9 #4): pins the ccnet boundary table to
      * the current committed [[graft.storage.BoundsStore]] generation
      * at stream start, exactly [[LmBucketStream.buckets]]' protocol —
      * a days-long intake job restarts its query on roll and observes
      * republished terciles instead of a session-lifetime memo.
      */
    def admissions(docs: DataFrame, t: Tables,
                   watermarkLag: String = "30 seconds",
                   boundsRoot: Option[String] = None): DataFrame =
      verdictCore(docs, t, watermarkLag, boundsRoot)
        .filter(col("verdict") === "admitted")
        .select(col("ts"), col("doc_id"), col("lang"), col("lm_score"),
          col("bucket"), col("u"), col("text_hash"))

    /** The OBSERVABILITY twin (VERDICT r9 #7): (ts, doc_id, lang,
      * verdict) for EVERY doc of the intake stream — `admitted` or the
      * first failing gate, in [[graft.pipeline.Intake
      * .corpusAdmitVerdicts]]' pipeline order (`dup` → `quality` →
      * `too_short` → `repetition` → `neardup` → `containment` →
      * `semdup` → `coin`). Same single query shape as [[admissions]] — the verdict
      * column is computed either way; this entry just keeps every row.
      * StreamingJobsSpec pins streamed verdicts ≡ the batch op on a
      * keeper-first replay.
      *
      * GRANULARITY (ADVICE r10): output is one row per (ts, doc_id)
      * group, not strictly one per doc_id — a redelivered copy whose
      * ts DIFFERS from the keeper's forms its own group and emits an
      * extra `dup` verdict row (an exact redelivery, same ts, merges
      * into the keeper's group and emits nothing extra). Consumers
      * diffing stream vs batch verdicts should take the first verdict
      * per doc_id; `Intake.reconcileAdmissions` does so.
      */
    def verdicts(docs: DataFrame, t: Tables,
                 watermarkLag: String = "30 seconds",
                 boundsRoot: Option[String] = None): DataFrame =
      verdictCore(docs, t, watermarkLag, boundsRoot)
        .select(col("ts"), col("doc_id"), col("lang"), col("verdict"))

    /** The shared core: every intake doc → (ts, doc_id, lang, text_hash,
      * lm_score, bucket, u, verdict).
      *
      * Shape — exactly TWO stateful operators, however many gates:
      *
      *   1. The first-seen MARKER (stateful op #1): an append-mode
      *      `flatMapGroupsWithState` keyed on md5(text) that emits
      *      EVERY row tagged `dup` 0/1 instead of dropping duplicates
      *      (the verdicts twin needs the dropped rows' verdicts). One
      *      row per (hash, first batch) is elected keeper — the LOWEST
      *      doc_id in that batch, see the keeper rule on
      *      [[admissions]] — and state is just a seen marker evicted at
      *      first-seen ts + lag, `dropDuplicatesWithinWatermark`'s
      *      retention. Aggregations after append-mode fMGWS are a
      *      supported Structured Streaming chain.
      *   2. The PER-DOC gates are stateless FLAG COLUMNS (never
      *      filters: the only predicates ahead of the evidence
      *      aggregation reference generated columns, so nothing can be
      *      pushed below a watermark node and stall event time —
      *      the hazard the r9 builder hit with pre-dedup filters):
      *      `q_fail` — [[TextAnalysis.qualityExpr]] over the STORED
      *      n_chars when the stream carries one (the batch gate's
      *      input; ADVICE r9 — length(text) only as a fallback for
      *      schemas without it), `too_short` (< 2 tokens), `rep_fail` —
      *      [[RepetitionGateStream.keepFromBigrams]] (the shared
      *      predicate, linear top-bigram count).
      *   3. Every corpus-relative gate becomes stateless EVIDENCE ROWS
      *      against a static store, unioned into ONE watermarked
      *      (ts, doc_id, lang, text_hash) aggregation (stateful op #2):
      *      one `meta` row per doc (so rejected docs still emit their
      *      verdict); `bg` rows — scored bigrams (the LM model joins of
      *      [[LmScoreStream]]); `sh` rows — the doc's capped shingles
      *      (anti-join vs the flooded vocab) counting n_a; `nd` rows —
      *      corpus band-key matches with corpus_doc < doc_id (the
      *      batch candidate-pair drop rule, star-routing included —
      *      [[graft.dedup.Dedup.corpusBands]] keeps only the min-doc
      *      row of a flooded key, which IS the batch star pair); `ct`
      *      rows — capped-posting matches (corpus_doc < doc_id)
      *      carrying a PER-ROW common count: the arriving doc's full
      *      shingle-hash array `array_intersect`ed with the matched
      *      corpus doc's capped set ([[graft.dedup.Dedup
      *      .containmentCorpusDocSets]]). The capped static side makes
      *      the row-wise intersect exact — flooded shingles are absent
      *      from the corpus array, so they never count as common.
      *      `sc` rows — the SemDeDup gate (VERDICT r19 #1): one entry
      *      per (non-zero-norm chunk, band table) carrying the chunk's
      *      md5, feature-hash vector and bucket at the PINNED
      *      chunk-vector-store width ([[graft.pipeline.ChunkSemantic
      *      .corpusVecBandsPinned]] — the [[ChunkSemanticGateStream]]
      *      corpus side, same cache role), joined left against the
      *      cap-admitted banded store; a match counts when the corpus
      *      (doc, chunk) is strictly EARLIER (the batch keep-first
      *      pair order), text-distinct and round6-cosine ≥ the batch
      *      threshold.
      *      A rejected doc's heavy arrays are empty by construction
      *      (conditional on the flags), so spam costs one meta row,
      *      not a bigram/shingle explosion.
      *   4. The aggregation reduces each gate to conditional
      *      sums/maxes; containment collects the DISTINCT (corpus_doc,
      *      n_b, common) structs — bounded by matched corpus docs (the
      *      posting fan-out collapses: every row of a pair carries the
      *      identical struct), the same per-doc state bound as the
      *      salted [[ContainmentGate]].
      *   5. Post-aggregation, everything is stateless again: the batch
      *      containment criterion per collected struct, the broadcast
      *      boundary-table bucket, the identity-hash coin against
      *      [[graft.pipeline.Intake.rateExpr]] (the literal batch
      *      CASE), and the verdict CASE in the batch pipeline order. A
      *      novel-language doc buckets `unbucketed` → rate 0 →
      *      verdict `coin`; the batch recompute admits it once its
      *      language has boundaries.
      *
      * Scale: state is the marker store (watermark-bounded, one seen
      * marker per in-flight hash) plus one agg row per in-flight doc
      * holding counters and ≤ matched-docs structs; all joins are
      * stream-static against capped, memoized stores; the shuffle
      * fan-out per doc is bounded by bigrams + capped shingles ×
      * capped posting lists. The own-hash array rides the containment
      * join rows (micro-batch shuffle, never state) — the price of
      * computing `common` without per-pair state. The sc fan-out is
      * (own chunks × band tables × ≤ChunkBandCap store matches), each
      * row ids + one 64-double vector, and the collected set is ≤ the
      * doc's own grid length — the whale bound the batch verdict's
      * scaladoc argues.
      */
    private def verdictCore(docs: DataFrame, t: Tables,
                            watermarkLag: String,
                            boundsRoot: Option[String]): DataFrame = {
      val spark = docs.sparkSession
      import spark.implicits._
      val lagMs = lagMillis(watermarkLag)
      val big = StaticCache.of(t, "lmBig")(TextAnalysis.lmModelBig(t))
      val uni = StaticCache.of(t, "lmUni")(TextAnalysis.lmModelUni(t))
      val voc = StaticCache.of(t, "lmVocab")(TextAnalysis.lmVocab(t))
      val bounds = boundsRoot match {
        case Some(root) =>
          import graft.storage.BoundsStore
          val n = BoundsStore.currentGeneration(root,
            spark.sessionState.newHadoopConf()).getOrElse(
            throw new IllegalStateException(
              s"no committed bounds generation under $root"))
          StaticCache.of(t, s"ccnetBounds@$root/gen=$n") {
            BoundsStore.readBounds(spark, root, n)
          }
        case None => StaticCache.of(t, "ccnetBounds")(Mixing.ccnetBounds(t))
      }
      // band keys reduced to ONE row per key (min corpus doc): the nd
      // drop rule is `∃ corpus doc < mine on a shared band` ⟺
      // `min corpus doc on the key < mine`, so the lookup is a
      // unique-key left join — no row multiplication, and star-routing
      // falls out (the min doc IS the batch star center)
      val bandsMin = StaticCache.of(t, "corpusBandsMin") {
        Dedup.corpusBands(t)
          .groupBy(col("band_idx"), col("band_key"))
          .agg(min(col("doc_id")).as("min_corpus_doc"))
      }
      val flooded = StaticCache.of(t, "containFlooded") {
        Dedup.floodedShingleVocab(t)
      }
      val posting = StaticCache.of(t, "containPosting") {
        Dedup.containmentCorpusPosting(t)
      }
      val docSets = StaticCache.of(t, "containDocSets") {
        Dedup.containmentCorpusDocSets(t).select(col("corpus_doc"), col("hs"))
      }
      // the SemDeDup gate's corpus side: the banded chunk-vector store
      // pinned at the generation current at job build (the
      // ChunkSemanticGateStream deployment shape — same cache role, so
      // an intake job and a chunk gate on one session share the frame),
      // renamed sc_* to keep the containment join's corpus_doc free
      val (scGen, scBits, scBandsPinned) =
        graft.pipeline.ChunkSemantic.corpusVecBandsPinned(t)
      val scStore = StaticCache.at(t, "chunkVecBands", scGen)(scBandsPinned)
        .select(col("corpus_doc").as("sc_doc"),
          col("corpus_chunk").as("sc_chunk"), col("ch").as("sc_ch"),
          col("cv").as("sc_cv"), col("tbl").as("sc_stbl"),
          col("bkt").as("sc_sbkt"))
      val scShift = graft.pipeline.ChunkSemantic.BandBitsMax - scBits

      // stage 1: the first-seen MARKER — every row survives, tagged
      // dup 0/1 (the verdicts twin needs the non-keepers' rows). The
      // input watermark drives the marker's state eviction; the marker
      // output is re-watermarked on the same ts for the evidence
      // aggregation (its own event-time tag does not survive fMGWS),
      // and every marker output row passes that node, so event time
      // can never stall on a batch of gate-rejected docs.
      val nCharsCol =
        if (docs.columns.contains("n_chars")) col("n_chars").cast("int")
        else length(col("text"))
      val marked = docs
        .withWatermark("ts", watermarkLag)
        .select(col("ts"), col("doc_id").as("docId"), col("lang"),
          col("text"), md5(col("text")).as("textHash"),
          nCharsCol.as("nChars"))
        .as[IntakeRow]
        .groupByKey(_.textHash)
        .flatMapGroupsWithState(
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
          (_: String, batch: Iterator[IntakeRow],
           state: GroupState[SeenState]) => {
            if (state.hasTimedOut) { state.remove(); Iterator.empty }
            else {
              val rows = batch.toVector
              val seen = state.exists
              // keeper = lowest doc_id of the hash's EARLIEST batch;
              // exactly one row is elected even if the batch carries
              // redelivered copies of the same doc_id
              val keeperIdx =
                if (seen) -1 else rows.indices.minBy(i => rows(i).docId)
              if (!seen) {
                val ts0 = rows(keeperIdx).ts.getTime
                state.update(SeenState(ts0))
                // dropDuplicatesWithinWatermark's retention: first-seen
                // ts + lag (clamped above the current watermark — Spark
                // rejects timeouts at or below it)
                state.setTimeoutTimestamp(math.max(ts0 + lagMs,
                  state.getCurrentWatermarkMs() + 1))
              }
              rows.iterator.zipWithIndex.map { case (r, i) =>
                MarkedRow(r.ts, r.docId, r.lang, r.text, r.textHash,
                  r.nChars, if (i == keeperIdx) 0 else 1)
              }
            }
          })
        .select(col("ts"), col("docId").as("doc_id"), col("lang"),
          col("text"), col("textHash").as("text_hash"),
          col("nChars").as("n_chars"), col("dup"))
        .withWatermark("ts", watermarkLag)

      // stage 1b: the stateless per-doc gates as FLAG columns (the
      // batch CASE order needs every flag, not a filtered survivor
      // set). q_fail reads the carried n_chars — the batch gate's
      // stored column — not a re-derived length (ADVICE r9).
      val flagged = marked
        .withColumn("toks", split(col("text"), " "))
        .withColumn("too_short", (size(col("toks")) < 2).cast("int"))
        .withColumn("q_fail", (TextAnalysis.qualityExpr(col("n_chars"),
          size(col("toks")), size(array_distinct(col("toks"))))
          < CorpusClean.QualityMin).cast("int"))
        .withColumn("rep_fail", when(col("too_short") === 1, lit(0))
          .otherwise((!RepetitionGateStream.keepFromBigrams(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat(a, lit(" "), b)))).cast("int")))
        .withColumn("rejected", greatest(col("dup"), col("too_short"),
          col("q_fail"), col("rep_fail")))
        // semdup denominator: the doc's FULL chunk-grid length — the
        // shared batch definition, constant per doc (rides the agg as
        // a flag column)
        .withColumn("n_chunks",
          graft.pipeline.ChunkSemantic.nChunksOf(size(col("toks"))))

      // stage 2: ONE evidence explode — every gate's lookups ride the
      // same exploded stream (a union of per-gate branches would
      // replicate the marker subtree, and its state, once per branch).
      // Per doc: one `meta` entry (presence — a rejected doc's verdict
      // needs a row through the aggregation), then for unrejected docs
      // `bg` entries (bigrams), `nd` entries (the doc's band keys),
      // `sh`/`ct` entries (distinct shingles — `sh` counts n_a, `ct`
      // probes the posting list via its separate `s_probe` key so the
      // capped fan-out never multiplies the `sh` rows). A rejected
      // doc's bg/sh arrays are EMPTY by construction, so spam pays one
      // meta row, never an explosion.
      val nullS = lit(null).cast("string")
      val nullI = lit(null).cast("int")
      def ev(kind: String, w1: Column = nullS, w2: Column = nullS,
             bandIdx: Column = lit(null).cast("int"),
             bandKey: Column = nullS, s: Column = nullS,
             sProbe: Column = nullS, scTbl: Column = nullI,
             scBkt: Column = lit(null).cast("long"), scIdx: Column = nullI,
             scH: Column = nullS,
             scV: Column = lit(null).cast("array<double>")) =
        struct(lit(kind).as("kind"), w1.as("w1"), w2.as("w2"),
          bandIdx.as("band_idx"), bandKey.as("band_key"), s.as("s"),
          sProbe.as("s_probe"), scTbl.as("sc_tbl"), scBkt.as("sc_bkt"),
          scIdx.as("sc_idx"), scH.as("sc_h"), scV.as("sc_v"))
      val mins = (0 until Dedup.NumPerms).map(p =>
        array_min(transform(col("sh_arr"),
          s => md5(concat(lit(s"$p:"), s)))).as(s"h$p"))
      val bandEntries = array((0 until Dedup.NumBands).map(b =>
        ev("nd", bandIdx = lit(b), bandKey =
          md5(concat(col(s"h${2 * b}"), lit("|"), col(s"h${2 * b + 1}"))))): _*)
      val flagCols = Seq(col("text_hash"), col("dup"), col("too_short"),
        col("q_fail"), col("rep_fail"), col("rejected"), col("n_chunks"))

      val evidence = flagged
        .withColumn("bg_arr", when(col("rejected") === 1,
          expr("CAST(array() AS array<struct<w1:string,w2:string>>)"))
          .otherwise(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))))
        .withColumn("sh_arr", when(col("rejected") === 1,
          expr("CAST(array() AS array<string>)"))
          .otherwise(array_distinct(
            graft.functions.TextFunctions.shingles(
              col("toks"), Dedup.ShingleSize))))
        // semdup evidence seeds: the doc's non-zero-norm chunk grid
        // with md5 + feature-hash vector (the batch chunkVectorRowsOf
        // projection, per row) — empty for rejected docs, so spam pays
        // one meta row here too
        .withColumn("sc_arr", when(col("rejected") === 1,
          expr("CAST(array() AS " +
            "array<struct<ci:int,h:string,v:array<double>>>)"))
          .otherwise(org.apache.spark.sql.functions.filter(
            transform(graft.pipeline.Chunking.chunkStructs(col("text")),
              c => struct(c.getField("chunk_idx").as("ci"),
                md5(c.getField("chunk_text")).as("h"),
                graft.functions.TextFunctions.hashFeatureVec(
                  split(c.getField("chunk_text"), " "),
                  graft.pipeline.ChunkSemantic.Dims).as("v"))),
            s => graft.functions.VectorFunctions.dot(
              s.getField("v"), s.getField("v")) > 0)))
        .withColumn("hs_own", transform(col("sh_arr"), s => xxhash64(s)))
        .select(Seq(col("ts"), col("doc_id"), col("lang"), col("hs_own"),
          col("sh_arr"), col("bg_arr"), col("sc_arr")) ++ flagCols ++ mins: _*)
        .select(Seq(col("ts"), col("doc_id"), col("lang"), col("hs_own"),
          explode(concat(
            array(ev("meta")),
            transform(col("bg_arr"),
              b => ev("bg", w1 = b.getField("w1"), w2 = b.getField("w2"))),
            bandEntries,
            transform(col("sh_arr"), s => ev("sh", s = s)),
            transform(col("sh_arr"), s => ev("ct", s = s, sProbe = s)),
            // one sc entry per (chunk, band table): the stream side of
            // the banded chunk join, bkt at the pinned width
            flatten(transform(col("sc_arr"), s =>
              array((0 until graft.pipeline.ChunkSemantic.NumTables)
                .map(j => ev("sc", scTbl = lit(j),
                  scBkt = shiftright(
                    graft.functions.TextFunctions.srpWord16(
                      s.getField("v"), j), scShift),
                  scIdx = s.getField("ci"), scH = s.getField("h"),
                  scV = s.getField("v"))): _*)))))
            .as("e")) ++ flagCols: _*)
        // a rejected doc's band entries ride null min-hashes (its
        // sh_arr is empty) — only its meta row matters downstream
        .filter(col("rejected") === 0 || col("e.kind") === "meta")
        .select(Seq(col("ts"), col("doc_id"), col("lang"), col("hs_own"),
          col("e.kind").as("kind"), col("e.w1").as("w1"),
          col("e.w2").as("w2"), col("e.band_idx").as("band_idx"),
          col("e.band_key").as("band_key"), col("e.s").as("s"),
          col("e.s_probe").as("s_probe"),
          col("e.sc_tbl").as("sc_tbl"), col("e.sc_bkt").as("sc_bkt"),
          col("e.sc_idx").as("sc_idx"), col("e.sc_h").as("sc_h"),
          col("e.sc_v").as("sc_v")) ++ flagCols: _*)

      // stateless stream-static lookups: every join key is unique on
      // the static side except the posting probe, whose fan-out is
      // doc-freq-capped
      val looked = evidence
        .join(flooded.withColumn("fl", lit(1)), Seq("s"), "left")
        .filter(col("fl").isNull || !col("kind").isin("sh", "ct"))
        .join(big, Seq("w1", "w2"), "left")
        .join(uni, Seq("w1"), "left")
        .crossJoin(broadcast(voc))
        .withColumn("p12", when(col("kind") === "bg", floor(
          (expr("CAST(coalesce(c12, 0) + 1 AS DOUBLE)")
            / expr("CAST(coalesce(c1, 0) + v AS DOUBLE)")) * lit(1e12)
            + lit(0.5)).cast("long")))
        .join(bandsMin, Seq("band_idx", "band_key"), "left")
        .join(posting.withColumnRenamed("s", "s_probe"),
          Seq("s_probe"), "left")
        .join(docSets, Seq("corpus_doc"), "left")
        // semdup bucket probe: ≤ ChunkBandCap matches per sc row (the
        // corpus-side flood cap was applied at store build); non-sc
        // rows carry null keys and pass through unmatched
        .join(scStore, col("sc_tbl") === col("sc_stbl") &&
          col("sc_bkt") === col("sc_sbkt"), "left")

      // stage 3: ONE aggregation reduces every gate's evidence. The
      // text-derived flags are constant per doc, so max() carries them
      // through — but `dup` is NOT constant under at-least-once
      // redelivery: a redelivered copy of the KEEPER (same ts/doc_id/
      // text_hash) is marked dup=1 by the first-seen store and merges
      // into the keeper's still-open group, so max() would flip the
      // verdict and the doc would be admitted ZERO times (ADVICE r10).
      // min() is the correct reduction: a genuine duplicate (its own
      // doc_id, its own group) carries dup=1 on EVERY one of its rows,
      // so min keeps 1; a redelivered keeper copy contributes only a
      // dup=1 meta row (rejected=1 ⇒ empty bg/sh arrays, band rows
      // filtered) into a group whose keeper rows carry 0, so min
      // restores 0 without double-counting any evidence.
      val agged = looked
        .groupBy(col("ts"), col("doc_id"), col("lang"), col("text_hash"))
        .agg(
          min(col("dup")).as("dup"),
          max(col("too_short")).as("too_short"),
          max(col("q_fail")).as("q_fail"),
          max(col("rep_fail")).as("rep_fail"),
          sum(when(col("kind") === "bg", 1).otherwise(0)).as("n_bigrams"),
          sum(when(col("kind") === "bg", col("p12"))).as("sp"),
          sum(when(col("kind") === "sh", 1).otherwise(0))
            .cast("int").as("n_a"),
          max(when(col("kind") === "nd" &&
            col("min_corpus_doc") < col("doc_id"), 1).otherwise(0))
            .as("nd_hit"),
          collect_set(when(col("kind") === "ct" &&
            col("corpus_doc") < col("doc_id"),
            struct(col("corpus_doc"), col("n_b"),
              size(array_intersect(col("hs_own"), col("hs")))
                .cast("int").as("common"))))
            .as("ct_hits"),
          // semdup: the doc's DISTINCT duplicated chunk indices — a
          // chunk counts when some strictly EARLIER (corpus doc,
          // chunk) — the batch pair order, keep-first — matches it
          // semantically (text-distinct, exact round6 cosine ≥ the
          // batch threshold); set-dedup collapses the ≤cap×tables
          // match fan-out, so state per doc is bounded by its own grid
          max(col("n_chunks")).as("n_chunks"),
          collect_set(when(col("kind") === "sc" &&
            col("sc_doc").isNotNull &&
            col("sc_doc") =!= col("doc_id") &&
            struct(col("sc_doc").as("d"), col("sc_chunk").as("c")) <
              struct(col("doc_id").as("d"), col("sc_idx").as("c")) &&
            col("sc_ch") =!= col("sc_h") &&
            graft.functions.Portable.round6(
              graft.functions.VectorFunctions.cosineSim(
                col("sc_v"), col("sc_cv")))
              >= graft.pipeline.ChunkSemantic.SemCosMin,
            col("sc_idx"))).as("sm_hits"))

      // stage 4: stateless verdict — the batch CASE in pipeline order
      // (Intake.corpusAdmitVerdicts). lm_score is null for a doc with
      // no bigram evidence (rejected or too short) — such a doc's
      // verdict resolves before any score-dependent gate.
      agged
        .withColumn("ct_hit",
          when(col("n_a") >= Dedup.ContainmentMinShingles &&
            exists(col("ct_hits"), h =>
              graft.functions.Portable.round6(
                h.getField("common").cast("double") /
                  least(col("n_a"), h.getField("n_b")))
                >= Dedup.ContainmentMin), 1).otherwise(0))
        .withColumn("sm_hit",
          when(graft.functions.Portable.round6(
            size(col("sm_hits")).cast("double") /
              col("n_chunks").cast("double"))
            >= graft.pipeline.ChunkSemantic.SemDupFracMax, 1).otherwise(0))
        .select(col("ts"), col("doc_id"), col("lang"), col("text_hash"),
          col("dup"), col("too_short"), col("q_fail"), col("rep_fail"),
          col("nd_hit"), col("ct_hit"), col("sm_hit"),
          TextAnalysis.lmScoreExpr)
        .join(bounds, Seq("lang"), "left")
        .select(col("ts"), col("doc_id"), col("lang"), col("text_hash"),
          col("dup"), col("too_short"), col("q_fail"), col("rep_fail"),
          col("nd_hit"), col("ct_hit"), col("sm_hit"), col("lm_score"),
          when(col("s1").isNull, lit("unbucketed"))
            .otherwise(Mixing.bucketExpr).as("bucket"))
        .withColumn("u", Mixing.u("ccn", col("doc_id")))
        .withColumn("verdict",
          when(col("dup") === 1, "dup")
            .when(col("q_fail") === 1, "quality")
            .when(col("too_short") === 1, "too_short")
            .when(col("rep_fail") === 1, "repetition")
            .when(col("nd_hit") === 1, "neardup")
            .when(col("ct_hit") === 1, "containment")
            .when(col("sm_hit") === 1, "semdup")
            .when(col("u") >= Intake.rateExpr, "coin")
            .otherwise("admitted"))
    }
  }

  // ---------------------------------------------------------------------
  // AnnProbeStream — ann.Ann.embedAnnIvf's probe phase on a live query
  // stream: embedding lookups as they arrive, against the static IVF
  // index. The serving half of the ANN story (the index is batch-built).
  // ---------------------------------------------------------------------
  /** Shared per-row centroid machinery for the streaming ANN jobs: the
    * centroid table collapsed to one broadcastable array row, and the
    * HOF expression ranking centroids per row by round6 cosine with the
    * lowest-cid tie-break — ONE definition, so the probe side
    * ([[AnnProbeStream]]) and the ingest side ([[IndexIngestStream]])
    * cannot drift from each other or from the batch argmax they must
    * reproduce bit-for-bit.
    */
  /** Memoized persisted static frames for the serving jobs.
    *
    * Stream-static plans re-execute the static side every micro-batch,
    * so each serving job persists its static frame — but a long-lived
    * session launches MANY jobs (tests, rolling restarts), and a fresh
    * `.persist()` per launch leaks cached blocks. One persisted frame
    * per (tables, role) for the session's life instead; `Tables` is a
    * case class over (session, dir), so the key is exactly the data
    * identity and a different corpus or session gets its own entry.
    */
  private object StaticCache {
    private val frames =
      new java.util.concurrent.ConcurrentHashMap[(Tables, String), (Long, DataFrame)]()

    /** Session-lifetime static side for ungenerationed roles. */
    def of(t: Tables, role: String)(build: => DataFrame): DataFrame =
      at(t, role, 0L)(build)

    /** Generation-PINNED static side: the newest requested generation
      * owns the (corpus, role) slot, and the displaced generation's
      * frame is unpersisted on roll — a days-long session rolling its
      * stores no longer accumulates one persisted corpus-side frame
      * per generation (ADVICE r18; a still-running query holding the
      * displaced frame stays CORRECT — committed segment chains are
      * immutable, so recompute reproduces identical data, it just
      * loses cache locality). A request for an OLDER generation than
      * the cached one builds uncached rather than evicting the newer —
      * a restarted gate only ever resolves forward.
      */
    def at(t: Tables, role: String, gen: Long)(build: => DataFrame): DataFrame = {
      var evicted: DataFrame = null
      val cur = frames.compute((t, role), (_, old) =>
        if (old == null || old._1 < gen) {
          if (old != null) evicted = old._2
          (gen, build.persist())
        } else old)
      if (evicted != null) evicted.unpersist()
      if (cur._1 == gen) cur._2 else build
    }
  }

  private object CentroidHof {

    /** One-row (cents: array<struct<cid, cv, cnorm>>) frame, persisted
      * once per (session, corpus) via [[StaticCache]]: identical across
      * micro-batches AND across job launches.
      */
    def centArray(t: Tables): DataFrame =
      StaticCache.of(t, "centArray") {
        graft.ann.Ann.ivfCentroidTable(t)
          .withColumn("cnorm", graft.functions.VectorFunctions.norm(col("cv")))
          .agg(collect_list(struct(col("cid"), col("cv"), col("cnorm")))
            .as("cents"))
      }

    /** Centroid structs sorted best-first for a row with columns
      * (v, qnorm, cents): ascending (−round6(cos), cid) — exactly the
      * batch row_number ORDER BY ccos DESC, cid pick. The literal
      * `floor(x * 1000000.0 + 0.5) / 1000000.0` is Portable.round6.
      */
    val rankedStructs: String = {
      val dotVK = "aggregate(zip_with(v, k.cv, (p, q) -> p * q), " +
        "CAST(0 AS DOUBLE), (acc, z) -> acc + z)"
      s"""array_sort(transform(cents, k -> named_struct(
         |  'nc', -(floor(($dotVK / (qnorm * k.cnorm)) * 1000000.0 + 0.5)
         |          / 1000000.0),
         |  'cid', k.cid)))""".stripMargin
    }
  }

  object AnnProbeStream {

    import graft.ann.Ann

    /** Scored candidates for a (q_id, v: array<double>) query stream.
      *
      * Probe-cell selection is PER-ROW higher-order-function work — a
      * stream cannot run the batch plan's row_number window before the
      * sink, so the top-nprobe centroids come from sorting a per-row
      * array of (−cos, cid) structs: identical rounding (portable
      * round6) and tie-break (lowest cid) as the batch probe, so the
      * selected cells are exactly [[Ann.embedAnnIvf]]'s
      * (StreamingJobsSpec pins stream ≡ batch end to end). The
      * centroid table collapses to one broadcast array row; each
      * streamed query pays centroids × dim interpreted flops — fine,
      * queries are the small side by definition.
      *
      * Candidate scoring is then a stateless stream-static equi-join
      * on cell id against the built index — at scale the static side
      * is the 100 TB corpus index bucketed by cid, so each micro-batch
      * joins co-located and the stream side never holds state (no
      * watermark needed: nothing aggregates before the sink).
      */
    def scored(queries: DataFrame, t: Tables): DataFrame = {
      val probeCells =
        s"transform(slice(${CentroidHof.rankedStructs}, 1, ${Ann.IvfNProbe})," +
          " p -> p.cid)"
      // the static index is identical every micro-batch — persisted
      // once per (session, corpus), shared across job launches
      val idx = StaticCache.of(t, "ivfIndex") {
        Ann.ivfIndex(t)
          .select(col("vec_id"), col("v").as("cv2"), col("cid"))
      }
      queries
        .crossJoin(CentroidHof.centArray(t)) // one-row broadcast side
        .withColumn("qnorm", graft.functions.VectorFunctions.norm(col("v")))
        .select(col("q_id"), col("v"), explode(expr(probeCells)).as("cid"))
        .join(idx, Seq("cid"))
        .select(col("q_id"), col("vec_id"),
          graft.functions.Portable.round6(
            graft.functions.VectorFunctions.cosineSim(col("v"), col("cv2")))
            .as("cos_sim"))
    }

    /** Full serving job: scored candidates → foreachBatch top-k rank
      * (the same batch-API escape hatch as [[TopKPerCategory]] — a
      * global per-query rank is not expressible pre-sink on a stream).
      */
    def start(queries: DataFrame, t: Tables, k: Int, checkpointDir: String)
             (sink: (DataFrame, Long) => Unit): StreamingQuery =
      scored(queries, t).writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy(col("q_id"))
            .orderBy(col("cos_sim").desc, col("vec_id"))
          sink(batch.withColumn("rank", row_number().over(w))
            .filter(col("rank") <= k), id)
        }
        .start()
  }

  // ---------------------------------------------------------------------
  // IndexIngestStream — the write half of the ANN serving story: new
  // corpus vectors land as a stream, get cell-assigned per row, and
  // append into the SAME cell-partitioned parquet layout the batch
  // probes (embed_ann_ivf_part) read — a living index.
  // ---------------------------------------------------------------------
  object IndexIngestStream {

    /** (vec_id, v) stream → (vec_id, v, cid): per-row nearest-centroid
      * assignment against the broadcast centroid array. Same
      * HOF-sort-take-1 trick as [[AnnProbeStream]] (a stream cannot run
      * the batch build's argmax aggregation pre-sink), with the batch
      * assignment's exact rounding and lowest-cid tie-break — so a
      * vector ingested live lands in the SAME cell the batch build
      * would put it in (StreamingJobsSpec pins index equality).
      */
    def assigned(vectors: DataFrame, t: Tables): DataFrame =
      vectors
        .crossJoin(CentroidHof.centArray(t))
        .withColumn("qnorm", graft.functions.VectorFunctions.norm(col("v")))
        .select(col("vec_id"), col("v"),
          expr(s"${CentroidHof.rankedStructs}[0].cid").as("cid"))

    /** Append the assigned stream into a cell-partitioned parquet index
      * dir — the same layout (and exactly-once `_spark_metadata`
      * discipline, see [[Sinks.parquetAppend]]) that
      * `Ann.embedAnnIvfPartitioned`'s probe side reads with dynamic
      * partition pruning. Ingest is stateless per row; the index grows
      * per committed batch with no compaction debt beyond the file
      * counts a production table service would compact anyway.
      */
    def start(vectors: DataFrame, t: Tables, indexDir: String,
              checkpointDir: String): StreamingQuery =
      assigned(vectors, t).writeStream
        .outputMode(OutputMode.Append())
        .partitionBy("cid")
        .format("parquet")
        .option("path", indexDir)
        .option("checkpointLocation", checkpointDir)
        .start()
  }

  // ---------------------------------------------------------------------
  // PqProbeStream — ann.Ann.embedAnnPq's probe phase on a live query
  // stream: the compressed-scan serving path next to AnnProbeStream's
  // cell-probed one.
  // ---------------------------------------------------------------------
  object PqProbeStream {

    import graft.ann.Ann

    /** ADC parts for a (q_id, v: array<double>) query stream: the
      * streamed queries go through the BATCH LUT definition
      * (`Ann.pqLutFrom` — one definition, stream and batch cannot
      * drift), then the parts join the static code index stream-static
      * on (subspace, codeword). No stream state, no watermark: nothing
      * aggregates before the sink. At scale the static side is the
      * compressed code table — the 100 TB scan this path exists for.
      */
    def parts(queries: DataFrame, t: Tables): DataFrame = {
      // the code index is identical every micro-batch — persisted once
      // per (session, corpus), shared across job launches
      val codes = StaticCache.of(t, "pqEncoded")(Ann.pqEncoded(t))
      Ann.pqLutFrom(t, queries.select(col("q_id").as("vec_id"), col("v")))
        .as("l")
        .join(codes.as("x"),
          col("l.s") === col("x.s") && col("l.k") === col("x.code"))
        .select(col("q_id"), col("vec_id"), col("l.s").as("s"), col("part"))
    }

    /** Full serving job: streamed parts → foreachBatch ADC tail (the
      * batch op's exact pivot-sum, shortlist, and exact re-rank —
      * StreamingJobsSpec pins stream ≡ batch bit for bit).
      */
    def start(queries: DataFrame, t: Tables, checkpointDir: String)
             (sink: (DataFrame, Long) => Unit): StreamingQuery =
      parts(queries, t).writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          sink(Ann.adcTail(batch, t), id)
        }
        .start()
  }

  // ---------------------------------------------------------------------
  // SimhashCandidates — dedup.Dedup.dedupSimhash in the streaming model:
  // hamming-close near-dup pairs over a live document stream. Completes
  // the streaming dedup matrix next to StreamingDedup (exact) and
  // MinhashCandidates (jaccard-LSH).
  // ---------------------------------------------------------------------
  object SimhashCandidates {

    import graft.dedup.Dedup.{HammingMax, SimhashBits}

    /** Per-ROW 48-bit simhash — no aggregation, so the downstream
      * stream-stream band join stays legal. Shares the native
      * [[graft.functions.SimHash48]] expression with the batch
      * signature (one definition, cannot drift); per-occurrence ±1
      * sums ≡ the count-weighted groupBy form, which the batch DuckDB
      * oracle still computes and pins.
      */
    def signatures(docs: DataFrame): DataFrame =
      docs.select(col("ts"), col("doc_id"),
        graft.functions.TextFunctions.simhash48(split(col("text"), " "))
          .as("simhash"))

    /** Hamming ≤ [[HammingMax]] pairs from a (ts, doc_id, text) stream:
      * watermarked stream-stream self-join on the batch op's chunk-pair
      * band keys, time-bounded to `horizon` (same caveats as
      * [[MinhashCandidates]]: per-(pair, band) output, replayable
      * source required).
      */
    def candidates(docs: DataFrame,
                   horizon: String = "60 seconds",
                   watermarkLag: String = "30 seconds"): DataFrame = {
      def bands(side: String) =
        signatures(docs).withWatermark("ts", watermarkLag)
          .select(col("ts"), col("doc_id"), col("simhash"),
            explode(array(graft.dedup.Dedup.simhashBandStructs: _*)).as("bk"))
          .select(col("ts").as(s"ts_$side"), col("doc_id").as(s"doc_$side"),
            col("simhash").as(s"sh_$side"),
            col("bk.band_idx").as(s"bi_$side"),
            col("bk.band_key").as(s"bk_$side"))
      bands("a").join(bands("b"),
        col("bi_a") === col("bi_b") && col("bk_a") === col("bk_b") &&
          col("doc_a") < col("doc_b") &&
          col("ts_b") >= col("ts_a") - expr(s"INTERVAL $horizon") &&
          col("ts_b") <= col("ts_a") + expr(s"INTERVAL $horizon"))
        .select(col("doc_a"), col("doc_b"),
          expr("bit_count(sh_a ^ sh_b)").cast("int").as("hamming"))
        .filter(col("hamming") <= HammingMax)
    }
  }

  // ---------------------------------------------------------------------
  // TopKPerCategory — ref: Top3HotProduct.java:139-196: window counts,
  // then per-RDD HiveContext SQL row_number rank ≤ 3.
  // ---------------------------------------------------------------------
  object TopKPerCategory {

    /** Sliding-window click counts per (category, product) — the
      * reduceByKeyAndWindow half (Top3HotProduct.java:139-144).
      */
    def windowedCounts(clicks: DataFrame,
                       windowDur: String = "60 seconds",
                       slideDur: String = "10 seconds",
                       watermarkLag: String = "30 seconds"): DataFrame =
      clicks
        .withWatermark("ts", watermarkLag)
        .groupBy(window(col("ts"), windowDur, slideDur),
          col("category"), col("product"))
        .agg(count(lit(1)).as("click_count"))
        .select(col("window.start").as("w_start"),
          col("category"), col("product"), col("click_count"))

    /** The per-batch rank the reference runs via HiveContext SQL
      * (Top3HotProduct.java:179-190) — row_number per (window, category),
      * keep ≤ k. Runs inside foreachBatch with the full batch API.
      */
    def topK(windowCounts: DataFrame, k: Int = 3): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("w_start"), col("category"))
        .orderBy(col("click_count").desc, col("product"))
      windowCounts
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
    }

    /** Full job: windowed counts → foreachBatch(rank → sink). Append mode,
      * so each window's rank is computed once, on finalized counts.
      */
    def start(clicks: DataFrame, k: Int, checkpointDir: String)
             (sink: (DataFrame, Long) => Unit): StreamingQuery =
      windowedCounts(clicks).writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", checkpointDir)
        .foreachBatch((batch: DataFrame, id: Long) => sink(topK(batch, k), id))
        .start()
  }

  // ---------------------------------------------------------------------
  // StatsBySourceStream — pipeline.Reports.statsBySource as a RUNNING
  // report: the per-source corpus-mix table (docs, langs, chars, exact-
  // dup fraction) maintained live as documents land, instead of
  // recomputed nightly. The observability twin of the report family,
  // the same way IntakeSamplerStream.verdicts twins corpus_admit.
  // ---------------------------------------------------------------------
  object StatsBySourceStream {

    /** Stage-1 emission: one event per arriving doc, carrying its
      * source/lang/chars and whether it was the FIRST arrival of its
      * (source, text) class.
      */
    final case class StatsEvent(source: String, lang: String,
                                chars: Long, first: Int)

    /** Running per-source mix report over a (doc_id, text, lang,
      * source) stream — columns ≡ [[graft.pipeline.Reports
      * .statsBySource]], values ≡ the batch report over the docs
      * delivered so far (any order: every aggregate here is
      * order-independent, spec-pinned on a shuffled replay).
      *
      * Batch needs two aggregation levels (the distinct-text counts);
      * streaming forbids chained aggregations, so the first level is
      * the codebase's marker-state idiom instead: an append-mode
      * `flatMapGroupsWithState` keyed on (source, md5(text)) whose
      * state is one boolean marker per distinct (source, text) class —
      * each doc passes through tagged `first` ∈ {0,1}, and
      * ∑first = COUNT(DISTINCT h) per source exactly. The one real
      * aggregation then folds (count, Σchars, Σfirst, collect_set
      * (lang)) per source. n_langs via collect_set is exact and
      * bounded: languages are an enum-sized set, so per-source state is
      * a handful of strings.
      *
      * State honesty at 100 TB: the marker store is one empty-payload
      * entry per distinct (source, text) class — the same cardinality
      * the batch report's first-level shuffle materializes per run,
      * held resident instead of recomputed (that is what "running
      * report" means — no free lunch, but no text in state either:
      * the key is the 128-bit hash). Redelivery: at-least-once inputs
      * double-count `n_docs`/`chars` (first stays exactly-once by the
      * marker); feed from [[StreamingDedup.firstSeen]] when the
      * transport can redeliver, as the intake path does.
      */
    def stats(docs: DataFrame): DataFrame = {
      val spark = docs.sparkSession
      import spark.implicits._
      val flagged = docs
        .select(col("source"), col("lang"),
          length(col("text")).cast("long").as("chars"),
          md5(col("text")).as("h"))
        .as[(String, String, Long, String)]
        .groupByKey { case (source, _, _, h) => (source, h) }
        .flatMapGroupsWithState(
          OutputMode.Append, GroupStateTimeout.NoTimeout)(
          (_: (String, String), rows: Iterator[(String, String, Long, String)],
           state: GroupState[Boolean]) => {
            var first = !state.exists
            if (first) state.update(true)
            rows.map { case (source, lang, chars, _) =>
              val f = if (first) 1 else 0
              first = false
              StatsEvent(source, lang, chars, f)
            }
          })
      flagged.toDF()
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          size(collect_set(col("lang"))).cast("long").as("n_langs"),
          sum(col("chars")).as("total_chars"),
          sum(col("first")).as("n_texts"))
        .select(col("source"), col("n_docs"), col("n_langs"),
          col("total_chars"),
          graft.functions.Portable.round6(
            col("total_chars").cast("double") / col("n_docs").cast("double"))
            .as("avg_chars"),
          graft.functions.Portable.round6(
            lit(1.0) - col("n_texts").cast("double")
              / col("n_docs").cast("double")).as("dup_frac"))
    }

    /** Running length profile — [[graft.pipeline.Reports
      * .tokenHistogram]] live: stateless integer-log₂ bucket column
      * (the same binary-digit-count form — no float log near
      * power-of-two boundaries), then one aggregation whose state is
      * ≤ |sources|·64 rows. Columns ≡ batch; values ≡ batch over docs
      * delivered so far.
      */
    def tokenHistogram(docs: DataFrame): DataFrame =
      docs
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("bucket",
          (length(conv(col("n_tokens"), 10, 2)) - lit(1)).cast("int"))
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_tokens")).as("min_tokens"),
          max(col("n_tokens")).as("max_tokens"))

    /** Running shard manifest — [[graft.pipeline.Reports
      * .shardManifest]] maintained live: the export sidecar updated as
      * docs land instead of recomputed per publish. Stateless identity
      * shard column + ONE streaming aggregation whose state is
      * [[graft.pipeline.Reports.NumShards]] rows of four longs —
      * constant state at any corpus size, the cheapest running report
      * there is. Columns ≡ the batch manifest; values ≡ batch over the
      * docs delivered so far (all aggregates order-independent).
      */
    def shardManifest(docs: DataFrame): DataFrame =
      docs
        .select(
          graft.pipeline.Reports.shardOf(col("doc_id")).as("shard"),
          col("doc_id"), length(col("text")).cast("long").as("n_chars"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
  }

  // ---------------------------------------------------------------------
  // SampleTemperatureStream — pipeline.Mixing.sampleTemperature on a
  // live stream: the temperature-resampling decision applied as docs
  // land, against a PUBLISHED per-language rate table.
  // ---------------------------------------------------------------------
  object SampleTemperatureStream {

    /** Keep a streamed doc iff its identity coin clears its language's
      * published rate — the batch sampler's exact coin and comparison
      * (`Mixing.u("tmp", ·) < rate`), so replaying a corpus through
      * this gate with the rates the batch run published reproduces the
      * batch sample EXACTLY (spec-pinned). Stateless: one broadcast
      * stream-static join + a filter.
      *
      * `rates` is the published (lang, rate) table, not computed here
      * — rates depend on corpus-wide language shares, which a stream
      * cannot see; the deployment shape is the boundary-table one
      * (BoundsStore/IntakeSamplerStream): a periodic batch recompute
      * publishes the rate generation, the stream pins it at start, a
      * roll republishes. A language absent from the table drops at
      * rate 0 — the novel-language convention of the ccnet bucketing.
      */
    def sample(docs: DataFrame, rates: DataFrame): DataFrame =
      docs
        .withColumn("u", graft.pipeline.Mixing.u("tmp", col("doc_id")))
        .join(org.apache.spark.sql.functions.broadcast(rates), Seq("lang"))
        .filter(col("u") < col("rate"))
        .select(col("doc_id"), col("lang"), col("u"), col("rate"))
  }

  // ---------------------------------------------------------------------
  // PiiScrubStream — textanalysis.Pii on a live document stream: the
  // redaction pass of the intake path (after the dedup/quality gates,
  // before the sink).
  // ---------------------------------------------------------------------
  object PiiScrubStream {

    /** STATELESS per-row scrub — the same `withPiiColumns` fold the
      * batch op runs, so the definitions cannot drift; each doc passes
      * through scrubbed, with its per-type match counts riding along.
      */
    def scrub(docs: DataFrame): DataFrame =
      graft.textanalysis.Pii.withPiiColumns(docs)
        .select(col("doc_id"), col("n_email"), col("n_ip"), col("n_num"),
          col("scrubbed"))
  }

  // ---------------------------------------------------------------------
  // AsOfEnrichStream — operators.Sequences.eventAsofJoin as a live
  // enrichment: each probe event attributed to the latest same-user ref
  // AT ARRIVAL time.
  // ---------------------------------------------------------------------
  object AsOfEnrichStream {

    /** Per-user as-of enrichment: state = the single latest-(ts_sec,
      * event_id) ref seen so far per user (two longs — constant per
      * key, the 100 TB-safe shape), probes emit (probe, latest ref ≤
      * probe ts) as they arrive. Within a micro-batch rows are
      * processed in the batch operator's carry order (ts_sec, refs
      * before probes, event_id), so an IN-ORDER replay reproduces
      * `event_asof_join` exactly (spec-pinned). Semantics under
      * disorder are AT-ARRIVAL and documented: a ref arriving after a
      * probe it would have attributed cannot retro-attach the
      * already-emitted row (the nightly `event_asof_join` recompute is
      * the reconciliation, the reconcileAdmissions shape); a ref ahead
      * of a probe's event time is held in state but never attributed
      * backward (the `_1 <= ts` guard).
      *
      * Input: (event_id, ts_sec, user_id, event_type) rows.
      */
    def enriched(events: DataFrame): DataFrame = {
      val spark = events.sparkSession
      import spark.implicits._
      import graft.operators.Sequences.{ProbeType, RefType}
      events
        .select(col("user_id"), col("ts_sec"), col("event_type"),
          col("event_id"))
        .as[(Long, Long, String, Long)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout)(
          (user: Long, it: Iterator[(Long, Long, String, Long)],
           state: GroupState[(Long, Long)]) => {
            val rows = it.toVector
              .sortBy(r => (r._2, r._3 == ProbeType, r._4))
            var st = state.getOption
            val out = Vector.newBuilder[(Long, Long, Long, Long, Long, Long)]
            rows.foreach { case (_, ts, tpe, id) =>
              if (tpe == RefType) {
                if (st.forall(s => s._1 < ts || (s._1 == ts && s._2 < id)))
                  st = Some((ts, id))
              } else if (tpe == ProbeType) {
                val (rts, rid) = st.filter(_._1 <= ts).getOrElse((-1L, -1L))
                out += ((id, user, ts, rts, rid,
                  if (rts >= 0L) ts - rts else -1L))
              }
            }
            st.foreach(state.update)
            out.result().iterator
          })
        .toDF("event_id", "user_id", "ts_sec", "ref_ts_sec", "ref_id",
          "gap_sec")
    }
  }

  // ---------------------------------------------------------------------
  // FunnelStream — operators.Sequences.eventFunnel as a live per-user
  // state machine: emits a row each time a user ADVANCES a stage.
  // ---------------------------------------------------------------------
  object FunnelStream {

    /** Per-user funnel progression: state = (t1, t2, t3) (-1 = not
      * reached; three longs, constant per key), one output row per
      * stage ADVANCE — `(user_id, stage, ts_sec)` when the user's
      * earliest qualifying signup/view/purchase lands. Within a batch,
      * rows process in (ts_sec, funnel-stage-rank) order — at an equal
      * second a signup anchors the view that anchors the purchase,
      * exactly the batch `>=` chain — so an in-order replay's final
      * stage per user ≡ `event_funnel` (spec-pinned; the batch op's
      * min-ts semantics are the first-qualifying-arrival semantics
      * in order). Gap rule shared: a step qualifies only within
      * [[graft.operators.Sequences.FunnelGapSec]] of its anchor.
      */
    def stages(events: DataFrame): DataFrame = {
      val spark = events.sparkSession
      import spark.implicits._
      import graft.operators.Sequences.{FunnelGapSec, ProbeType}
      val rank = Map("signup" -> 0, "view" -> 1, ProbeType -> 2)
      events
        .select(col("user_id"), col("ts_sec"), col("event_type"))
        .as[(Long, Long, String)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout)(
          (user: Long, it: Iterator[(Long, Long, String)],
           state: GroupState[(Long, Long, Long)]) => {
            var (t1, t2, t3) = state.getOption.getOrElse((-1L, -1L, -1L))
            val rows = it.toVector.filter(r => rank.contains(r._3))
              .sortBy(r => (r._2, rank(r._3)))
            val out = Vector.newBuilder[(Long, Int, Long)]
            rows.foreach { case (_, ts, tpe) =>
              tpe match {
                case "signup" if t1 < 0L =>
                  t1 = ts; out += ((user, 1, ts))
                case "view" if t1 >= 0L && t2 < 0L &&
                  ts >= t1 && ts <= t1 + FunnelGapSec =>
                  t2 = ts; out += ((user, 2, ts))
                case ProbeType if t2 >= 0L && t3 < 0L &&
                  ts >= t2 && ts <= t2 + FunnelGapSec =>
                  t3 = ts; out += ((user, 3, ts))
                case _ => ()
              }
            }
            state.update((t1, t2, t3))
            out.result().iterator
          })
        .toDF("user_id", "stage", "ts_sec")
    }
  }

  // ---------------------------------------------------------------------
  // SampleQuotaStream — pipeline.Mixing.sampleQuota on a live stream:
  // the exact-quota membership decision applied as docs land, against
  // the PUBLISHED (lang, thr, cutoff) threshold table.
  // ---------------------------------------------------------------------
  object SampleQuotaStream {

    /** Keep a streamed doc iff the published membership rule admits it
      * — literally [[graft.pipeline.Mixing.quotaKeep]], the same
      * broadcast-join-plus-filter the batch entry runs, so replaying
      * the corpus through this gate with the thresholds the batch run
      * published reproduces `corpus_sample_quota` EXACTLY in any
      * arrival order (stateless — spec-pinned). `thresholds` is
      * `Mixing.quotaThresholds`' output or a later generation of it
      * (the boundary-table deployment shape: batch recompute
      * publishes, stream pins at start, roll republishes); a language
      * absent from the table drops at rate 0.
      */
    def sample(docs: DataFrame, thresholds: DataFrame): DataFrame =
      graft.pipeline.Mixing.quotaKeep(docs, thresholds)
        .select(col("doc_id"), col("lang"), col("u"))
  }

  // ---------------------------------------------------------------------
  // SamplePriorityStream — pipeline.Mixing.samplePriority as an intake
  // gate: the weighted-membership rule published by the batch run,
  // applied stateless per arriving doc.
  // ---------------------------------------------------------------------
  object SamplePriorityStream {

    /** Keep a streamed doc iff the PUBLISHED priority rule admits it —
      * literally [[graft.pipeline.Mixing.priorityKeep]] (the batch
      * entry's own membership + DLT-estimate projection), compiled
      * against the (thr, cutoff, τ) scalars a batch
      * `Mixing.priorityThreshold` run published (the boundary-table
      * deployment shape: batch recompute publishes, stream pins at
      * start, roll republishes). Pure map-side — no join, no state;
      * replaying the corpus reproduces `corpus_sample_priority`
      * bit-for-bit in any arrival order (spec-pinned).
      */
    def sample(docs: DataFrame, thr: Double, cutoff: Long,
               tau: Double): DataFrame =
      graft.pipeline.Mixing.priorityKeep(docs, thr, cutoff, tau)
        .select(col("doc_id"), col("n_chars"), col("prio"), col("est6"))
  }

  // ---------------------------------------------------------------------
  // FixedSampleStream — pipeline.Mixing.sampleFixed as an intake gate:
  // the published exactly-N membership rule applied stateless per
  // arriving doc.
  // ---------------------------------------------------------------------
  object FixedSampleStream {

    /** Keep a streamed doc iff the PUBLISHED fixed-sample rule admits
      * it — literally [[graft.pipeline.Mixing.fixedKeep]], compiled
      * against the (thr, cutoff) scalars a batch
      * `Mixing.fixedThreshold` run published (the boundary-table
      * deployment shape: batch derives the N-th-coin threshold +
      * tie cutoff, stream pins the generation at start, roll
      * republishes). Pure map-side — no join, no state; replaying the
      * corpus the rule was derived on reproduces `corpus_sample_fixed`
      * bit-for-bit in any arrival order (spec-pinned).
      */
    def sample(docs: DataFrame, thr: Double, cutoff: Long): DataFrame =
      graft.pipeline.Mixing.fixedKeep(docs, (thr, cutoff))
  }

  // ---------------------------------------------------------------------
  // BlockSampleStream — the production block-sampling predicate from
  // pipeline.Mixing.sampleBlock's audit, as an intake gate.
  // ---------------------------------------------------------------------
  object BlockSampleStream {

    /** Keep a streamed doc iff its shard's identity coin clears the
      * block rate — literally [[graft.pipeline.Mixing.blockKeep]]
      * (the predicate the `corpus_sample_block` audit prices), with
      * the exact-integer Horvitz-Thompson weight attached. A pure
      * function of doc_id: NO published table, no join, no state —
      * membership is whole-shard by construction and permanent across
      * corpus growth (new docs route to shards whose verdict is
      * already determined), so this gate never needs a generation
      * roll at all (spec-pinned: any-order replay ≡ the JVM shard
      * model; per shard, all-or-nothing).
      */
    def sample(docs: DataFrame): DataFrame =
      graft.pipeline.Mixing.blockKeep(docs)
  }

  // ---------------------------------------------------------------------
  // ChunkStream — pipeline.Chunking.docChunks at intake speed: an
  // arriving doc chunked on the SAME fixed grid the batch pipeline
  // embeds, before it reaches the embedding stage.
  // ---------------------------------------------------------------------
  object ChunkStream {

    /** Chunk an arriving doc — literally
      * [[graft.pipeline.Chunking.chunkFrame]], the batch entry's own
      * body, so the stream and batch grids cannot drift. Pure per-row
      * HOF work: no join, no state, no watermark; replaying the corpus
      * reproduces `doc_chunks` bit-for-bit in any arrival order
      * (spec-pinned). Chunk identity (doc_id, chunk_idx) is a pure
      * function of the text, so a duplicated delivery re-emits
      * identical rows — the idempotent-upsert sink key.
      */
    def chunks(docs: DataFrame): DataFrame =
      graft.pipeline.Chunking.chunkFrame(docs)
  }

  // ---------------------------------------------------------------------
  // WaterfillSampleStream — pipeline.Mixing.sampleWaterfill as an
  // intake gate: the solver's published per-source rates applied
  // stateless per arriving doc.
  // ---------------------------------------------------------------------
  object WaterfillSampleStream {

    /** Keep a streamed doc iff the PUBLISHED water-fill rule admits it
      * — literally [[graft.pipeline.Mixing.waterfillKeep]], compiled
      * against the (source, rate6) scalars a batch
      * [[graft.pipeline.Mixing.mixSolver]] run published (the
      * boundary-table deployment shape: batch solves the mix, stream
      * pins the rates at start, roll republishes). Pure map-side — the
      * rates fold into ONE case expression, no join, no state;
      * replaying the corpus reproduces `corpus_sample_waterfill`
      * bit-for-bit in any arrival order (spec-pinned). A source absent
      * from the published table has no residue in the solved mix — it
      * drops at rate 0 (spec-pinned).
      */
    def sample(docs: DataFrame, rates: Seq[(String, Double)]): DataFrame =
      graft.pipeline.Mixing.waterfillKeep(docs, rates)
  }

  // ---------------------------------------------------------------------
  // BloomGateStream — dedup.Bloom as the intake PRE-FILTER: the
  // sublinear-memory "possibly seen before?" gate in front of the
  // exact-dedup stage.
  // ---------------------------------------------------------------------
  object BloomGateStream {

    /** STATELESS membership gate: `Bloom.hitCol` compiled against the
      * published literal filter array (`Bloom.bloomArray` of the batch
      * build — the boundary-table deployment shape: a periodic batch
      * job republishes the filter as the corpus grows, the stream pins
      * the generation at start). Pure map-side — no join, no state; a
      * miss is DEFINITIVE (skip the dedup join), a hit goes on to the
      * exact md5 check. Replay ≡ batch `bloom_dup_candidates`
      * bit-for-bit in any order (spec-pinned — even the
      * false-positive set is deterministic).
      */
    def hits(docs: DataFrame, bloomArr: Seq[Long]): DataFrame =
      docs.select(col("doc_id"),
        graft.dedup.Bloom.hitCol(col("text"), bloomArr).as("hit"))
  }

  // ---------------------------------------------------------------------
  // AnomalyStream — operators.Sequences.eventDailyAnomaly LIVE: the
  // volume monitor that pages before a day closes, scored against the
  // published per-type baseline.
  // ---------------------------------------------------------------------
  object AnomalyStream {

    /** Running per-(type, day) z-scores: fMGWS state = one running
      * count per (type, day) — bounded by |types|·|days in flight|,
      * the retention-matrix discipline — scored on every update
      * against the PUBLISHED (mu, sd) baseline (`Sequences.dailyStats`
      * collected by the caller — the boundary-table shape: a periodic
      * batch job republishes the baseline, the stream pins its
      * generation at start; types absent from the baseline score 0,
      * same rule as the batch `sd > 0` guard). The z arithmetic is
      * [[graft.functions.Portable.round6Double]] over the identical
      * IEEE sequence the batch Column computes, so once all of a day's
      * events are delivered the final emission per (type, day) equals
      * the batch `event_daily_anomaly` row bit-for-bit (spec-pinned
      * on a shuffled two-batch replay).
      *
      * Input: (event_type, ts_sec) rows; `stats`: type → (mu, sd).
      */
    def zscores(events: DataFrame,
                stats: Map[String, (Double, Double)]): DataFrame = {
      val spark = events.sparkSession
      import spark.implicits._
      import graft.functions.Portable.round6Double
      events.select(col("event_type"),
        expr(s"ts_sec div ${graft.operators.Sequences.RetentionBucketSec}")
          .as("day"))
        .as[(String, Long)]
        .groupByKey(identity)
        .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.NoTimeout)(
          (key: (String, Long), it: Iterator[(String, Long)],
           state: GroupState[Long]) => {
            val n = state.getOption.getOrElse(0L) + it.size
            state.update(n)
            val z = stats.get(key._1) match {
              case Some((mu, sd)) if sd > 0 => round6Double((n - mu) / sd)
              case _ => 0.0
            }
            Iterator((key._1, key._2, n, z))
          })
        .toDF("event_type", "day", "n", "z")
    }
  }

  // ---------------------------------------------------------------------
  // QualityGateStream — textanalysis.QualityModel's distilled linear
  // gate at intake speed: published weights, zero joins, zero state.
  // ---------------------------------------------------------------------
  object QualityGateStream {

    /** STATELESS distilled-quality verdicts: the per-doc count
      * features come from pure array projections (`size(split(...))` /
      * `size(array_distinct(...))` — value-identical to the batch
      * explode+groupBy, with no per-doc aggregation state), and the
      * score is [[graft.textanalysis.QualityModel.scoreProjection]]
      * compiled against the PUBLISHED weight generation (the
      * BloomGateStream boundary-table shape: a periodic batch refit
      * republishes weights, the stream pins the generation at start).
      * Pure map-side ⇒ replay ≡ batch `quality_classify` bit-for-bit
      * in any order (spec-pinned). This is why the distillation
      * exists: the full teacher gate needs per-doc bigram tables; this
      * runs per arriving doc at wire speed.
      *
      * Input: (doc_id, text, n_chars) rows.
      */
    def verdicts(docs: DataFrame, w: Array[Double]): DataFrame = {
      val toks = split(col("text"), " ")
      docs
        .withColumn("n_tok", size(toks).cast("long"))
        .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
        .select(col("doc_id") +:
          graft.textanalysis.QualityModel.scoreProjection(w): _*)
    }
  }

  // ---------------------------------------------------------------------
  // CountMinStream — operators.Sketches' grid as RUNNING STATE: the
  // bounded-memory alternative to RunningCounts when keys are
  // unbounded (the reference's updateStateByKey holds one state entry
  // per key forever; this holds d×w cells no matter what arrives).
  // ---------------------------------------------------------------------
  object CountMinStream {

    /** The running sketch: per-row cell expansion (the batch
      * [[graft.operators.Sketches]] hash definitions by import — they
      * cannot drift) into ONE update-mode streaming aggregation keyed
      * on (j, c). State = at most d·w = 4096 count cells forever —
      * vocabulary growth never grows state, the whole point. Each
      * micro-batch emits the updated cells; the latest emission per
      * cell IS the batch sketch of everything delivered (spec-pinned
      * on a shuffled two-batch corpus replay). Estimates are then
      * served map-side against the published grid exactly as in batch.
      *
      * Input: (text) rows (any doc stream — tokenization shared with
      * the batch word counts: whitespace split).
      */
    def sketch(docs: DataFrame): DataFrame =
      graft.operators.Sketches.cells(
        docs.select(explode(split(col("text"), " ")).as("word")))
        .groupBy(col("j"), col("c"))
        .agg(count(lit(1)).as("cnt"))
  }

  // ---------------------------------------------------------------------
  // ForgetStream — pipeline.Forget's keeper re-election LIVE: deletion
  // requests land as a stream and each touched cluster's verdict
  // updates per micro-batch, against the published cluster store.
  // ---------------------------------------------------------------------
  object ForgetStream {

    /** Running keeper re-election for a live tombstone stream: each
      * request (doc_id) joins the PUBLISHED cluster label table (a
      * stream-static equi-join on doc_id — non-clustered docs need no
      * re-election and drop out, exactly the batch op's domain), then
      * per-CLUSTER fMGWS state accumulates the dropped-member set and
      * re-emits (cluster_id, new_keeper, n_dropped, n_left) — the same
      * verdict row [[graft.pipeline.Forget.forgetKeepers]] computes in
      * batch. Set union is idempotent and order-insensitive, so
      * any-order replay with duplicate delivery of a deletion batch
      * converges to the batch rows exactly (spec-pinned).
      *
      * Scale honesty: the label table is deliberately NOT broadcast-
      * hinted — it is graph-sized (a vanishing fraction of the corpus,
      * but at 100 TB still potentially too large for executor heaps);
      * the join keys on doc_id so Spark picks broadcast only when the
      * persisted table actually fits, and the membership array it
      * carries is band-cap bounded per cluster (≤ cap² bytes per
      * member row in the worst case — the same bound every verify
      * join in [[graft.dedup.Dedup]] rides). State is one dropped-id
      * set per TOUCHED cluster only. Update mode — the latest emission
      * per cluster IS the current verdict, and a NULL new_keeper is a
      * full retraction the consumer replays downstream (the
      * `ClusterStore.relabelDelta` shape).
      */
    def reelections(tombstones: DataFrame, t: Tables): DataFrame = {
      val spark = tombstones.sparkSession
      import spark.implicits._
      val labels = StaticCache.of(t, "forgetLabels") {
        val l = graft.dedup.Dedup.nearDupClusters(t)
          .select(col("doc_id"), col("keeper_id").as("cluster_id"))
        l.join(l.groupBy(col("cluster_id"))
          .agg(collect_list(col("doc_id")).as("members")), Seq("cluster_id"))
          .select(col("doc_id"), col("cluster_id"), col("members"))
      }
      tombstones.select(col("doc_id"))
        .join(labels, Seq("doc_id"))
        .as[(Long, Long, Seq[Long])]
        .groupByKey(_._2)
        .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.NoTimeout)(
          (cid: Long, it: Iterator[(Long, Long, Seq[Long])],
           state: GroupState[Set[Long]]) => {
            var dropped = state.getOption.getOrElse(Set.empty[Long])
            var members: Seq[Long] = Nil
            it.foreach { case (d, _, m) => dropped += d; members = m }
            state.update(dropped)
            val left = members.filterNot(dropped)
            Iterator((cid,
              if (left.isEmpty) None else Some(left.min),
              dropped.size.toLong, left.size.toLong))
          })
        .toDF("cluster_id", "new_keeper", "n_dropped", "n_left")
    }
  }

  // ---------------------------------------------------------------------
  // KmvSketchStream — operators.Sketches' KMV source sketches as live
  // bounded state: one ≤ k sorted-hash array per source, the overlap
  // planner's input maintained at ingest instead of by corpus rescans.
  // ---------------------------------------------------------------------
  object KmvSketchStream {

    /** Running per-source KMV sketches: per-SOURCE fMGWS state = the
      * ≤ k smallest distinct 60-bit hashes seen (a sorted long array —
      * CONSTANT size per source no matter how many docs arrive). The
      * hash is [[graft.operators.Sketches.kmvHashCol]] — the identical
      * md5 expression the batch sketch ranks — and the state merge
      * (distinct-insert, truncate to k) is idempotent AND
      * order-insensitive, so any-order replay with duplicate delivery
      * converges to the batch `sketch_kmv` rows exactly (spec-pinned).
      * Each micro-batch emits the source's full refreshed sketch as
      * (source, rk, hv) rows, update mode — the latest emission per
      * source IS the publishable sketch, and pairwise overlap is then
      * [[graft.operators.Sketches.reportSourceOverlap]]'s k-row math
      * against the published table, never a corpus join.
      *
      * Input: (source, text) rows.
      */
    def sketches(docs: DataFrame): DataFrame = {
      val spark = docs.sparkSession
      import spark.implicits._
      import graft.operators.Sketches
      docs.select(col("source"),
        Sketches.kmvHashCol(col("text")).as("hv"))
        .as[(String, Long)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.NoTimeout)(
          (source: String, it: Iterator[(String, Long)],
           state: GroupState[Array[Long]]) => {
            val prev = state.getOption.getOrElse(Array.empty[Long])
            val merged = (prev.toSet ++ it.map(_._2)).toArray
            java.util.Arrays.sort(merged)
            val kept = merged.take(Sketches.KmvK)
            state.update(kept)
            kept.iterator.zipWithIndex
              .map { case (hv, i) => (source, i + 1, hv) }
          })
        .toDF("source", "rk", "hv")
    }
  }

  // ---------------------------------------------------------------------
  // MediaFeaturesStream — multimodal.Pipeline.features on a live
  // media stream: decode → resize → frame-sample per arriving record.
  // ---------------------------------------------------------------------
  object MediaFeaturesStream {

    /** STATELESS per-record decode: the SAME `Pipeline.features`
      * mapPartitions stage the batch entry runs (codec init amortizes
      * per partition exactly as in batch), surfaced through the shared
      * `Multimodal.featureFrame` projection — definitions cannot
      * drift, so replaying a corpus reproduces `multimodal_features`
      * per doc in any order (spec-pinned, fake decoder). Swap
      * [[graft.multimodal.Pipeline.RealDecoder]] in deployment; the
      * streaming plumbing is unchanged.
      *
      * Input: (doc_id, text) rows — the text-byte stand-in payloads of
      * the batch surface.
      */
    def features(docs: DataFrame): DataFrame = {
      val spark = docs.sparkSession
      import spark.implicits._
      import graft.multimodal.{Multimodal, Pipeline}
      val recs = docs.select(col("doc_id").as("id"),
        lit("text/plain").as("mediaType"),
        col("text").cast("binary").as("payload")).as[Pipeline.MediaRecord]
      Multimodal.featureFrame(
        Pipeline.features(recs, Pipeline.FakeDecoder).toDF())
    }
  }

  // ---------------------------------------------------------------------
  // RetentionStream — operators.Sequences.eventRetention as a RUNNING
  // matrix: cohort cells maintained live as events land.
  // ---------------------------------------------------------------------
  object RetentionStream {

    /** Running cohort retention: per-user fMGWS state = (cohort day,
      * seen-day set) — bytes bounded by the user's ACTIVE DAYS over
      * the analysis span (the marker-state honesty of
      * StatsBySourceStream: exactly what the batch op's distinct
      * materializes per run, held resident per user), emitting one
      * (cohort_day, day_offset) marker per first-seen (user, day);
      * then ONE update-mode aggregation counts markers per cell —
      * state ≤ cells (span², tiny). Two stateful operators, the
      * IntakeSamplerStream discipline.
      *
      * In-order replay ≡ batch `event_retention` (spec-pinned across
      * a batch split). At-arrival semantics under disorder documented:
      * a day older than the known cohort day re-anchors FUTURE
      * emissions only — the nightly batch recompute reconciles,
      * exactly the AsOfEnrichStream rule.
      */
    def cells(events: DataFrame): DataFrame = {
      val spark = events.sparkSession
      import spark.implicits._
      import graft.operators.Sequences.RetentionBucketSec
      events
        .select(col("user_id"),
          expr(s"ts_sec div $RetentionBucketSec").as("d"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout)(
          (user: Long, it: Iterator[(Long, Long)],
           state: GroupState[(Long, Seq[Long])]) => {
            var (d0, seen) = state.getOption
              .getOrElse((Long.MaxValue, Seq.empty[Long]))
            val days = it.map(_._2).toVector.distinct.sorted
            val out = Vector.newBuilder[(Long, Long)]
            days.foreach { d =>
              if (!seen.contains(d)) {
                if (d < d0) d0 = d
                seen = seen :+ d
                out += ((d0, d - d0))
              }
            }
            state.update((d0, seen))
            out.result().iterator
          })
        .toDF("cohort_day", "day_offset")
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
    }
  }

  // ---------------------------------------------------------------------
  // PathCountStream — operators.Sequences.eventPathCounts as a running
  // table: per-user trigram emission + one update-mode count.
  // ---------------------------------------------------------------------
  object PathCountStream {

    /** Running journey-path counts: per-user fMGWS state = the last
      * TWO event types on the user's timeline (two short strings —
      * constant per key, the AsOfEnrichStream shape); each arriving
      * event that completes a trigram emits its path marker, then ONE
      * update-mode aggregation counts markers per path — aggregation
      * state bounded by |event_types|³ cells, not by events. Two
      * stateful ops, the IntakeSamplerStream discipline. The ranked
      * [[graft.operators.Sequences.eventTopPaths]] cut stays a batch
      * question over this running table (top-k of a tiny table is a
      * read-side concern, not streaming state).
      *
      * Within a micro-batch rows process in (ts_sec, event_id) order —
      * the batch window's order — so an IN-ORDER replay's final counts
      * ≡ `eventPathCounts` exactly (spec-pinned across a batch split,
      * which also pins that a trigram window CROSSES the boundary
      * through state). At-arrival semantics under disorder documented:
      * a late event splices into the path at arrival position, not
      * timeline position — the nightly batch recompute reconciles
      * (the AsOfEnrichStream rule).
      */
    def counts(events: DataFrame): DataFrame = {
      val spark = events.sparkSession
      import spark.implicits._
      events
        .select(col("user_id"), col("ts_sec"), col("event_id"),
          col("event_type"))
        .as[(Long, Long, Long, String)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout)(
          (_: Long, it: Iterator[(Long, Long, Long, String)],
           state: GroupState[(String, String)]) => {
            var (p2, p1) = state.getOption.getOrElse(("", ""))
            val out = Vector.newBuilder[String]
            it.toVector.sortBy(r => (r._2, r._3)).foreach { r =>
              val t = r._4
              if (p2.nonEmpty) out += s"$p2>$p1>$t"
              p2 = p1; p1 = t
            }
            state.update((p2, p1))
            out.result().iterator
          })
        .toDF("path")
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n"))
    }
  }

  // ---------------------------------------------------------------------
  // HllUniquesStream — operators.Sketches' daily-uniques HLL as live
  // bounded state: one m-register array per day, estimates at arrival.
  // ---------------------------------------------------------------------
  object HllUniquesStream {

    /** Running daily-unique estimates: per-DAY fMGWS state = the m
      * HLL registers (1024 small ints — CONSTANT per day no matter
      * how many events or users arrive, the CountMinStream answer to
      * "distinct users today" where a per-user set would grow without
      * bound). Cells come from [[graft.operators.Sketches.hllCells]]
      * — the identical md5 bucket/rho expressions the batch register
      * table aggregates — and register update is `max`, so the stream
      * is ORDER-INSENSITIVE and replay-idempotent: any-order replay
      * converges to the batch registers exactly, and every emitted
      * estimate is [[graft.operators.Sketches.hllEstimateFromMoments]]
      * over those registers — the same JVM expression the batch
      * `event_daily_uniques_est` entry evaluates (spec pins final
      * stream estimates ≡ batch est6 bit-for-bit, plus duplicate
      * delivery moving nothing).
      *
      * Emits (day, n_buckets, est6) per touched day per micro-batch,
      * update mode.
      */
    def estimates(events: DataFrame): DataFrame = {
      val spark = events.sparkSession
      import spark.implicits._
      import graft.operators.Sketches
      import graft.functions.Portable.round6Double
      Sketches.hllCells(events)
        .as[(Long, Long, Int)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.NoTimeout)(
          (day: Long, it: Iterator[(Long, Long, Int)],
           state: GroupState[Array[Int]]) => {
            val regs = state.getOption.getOrElse(Array.fill(Sketches.HllM)(0))
            it.foreach { case (_, b, r) =>
              val i = b.toInt
              if (r > regs(i)) regs(i) = r
            }
            state.update(regs)
            Iterator((day, regs.count(_ > 0).toLong,
              round6Double(Sketches.hllEstimate(regs))))
          })
        .toDF("day", "n_buckets", "est6")
    }
  }

  // ---------------------------------------------------------------------
  // IntervalJoinStream — operators.Sequences.eventIntervalJoin live: the
  // watermarked stream-stream INTERVAL join between two DIFFERENT event
  // substreams (clicks ↔ purchases). MinhashCandidates exercises the
  // self-join form; this is the two-sided attribution form, including
  // the LEFT OUTER variant whose null rows the watermark releases.
  // ---------------------------------------------------------------------
  object IntervalJoinStream {

    import graft.operators.Sequences.{IntervalSec, ProbeType, RefType}

    private def sides(events: DataFrame): (DataFrame, DataFrame) = {
      // two filters over ONE source subscription per side; the engine
      // requires a watermark on both inputs to bound the join state
      val clicks = events.filter(col("event_type") === RefType)
        .select(col("ts").as("c_time"), col("user_id").as("c_user"),
          col("event_id").as("click_id"))
        .withWatermark("c_time", "30 seconds")
      val purchases = events.filter(col("event_type") === ProbeType)
        .select(col("ts").as("p_time"), col("user_id"),
          col("event_id").as("purchase_id"))
        .withWatermark("p_time", "30 seconds")
      (clicks, purchases)
    }

    private val joinCond =
      col("user_id") === col("c_user") &&
        col("p_time") >= col("c_time") &&
        col("p_time") <= col("c_time") + expr(s"INTERVAL $IntervalSec seconds")

    /** All attributed (click → purchase) pairs from a live
      * (ts, user_id, event_type, event_id) stream — replay of the
      * events table ≡ the batch [[graft.operators.Sequences
      * .eventIntervalJoin]] row set (spec-pinned, modulo the batch
      * op's output ordering).
      *
      * State stays bounded: the event-time range condition lets the
      * engine drop click state once the watermark passes
      * `c_time + IntervalSec` and purchase state at `p_time` — neither
      * side is keyed state that lives forever. Append mode.
      */
    def pairs(events: DataFrame): DataFrame = {
      val (clicks, purchases) = sides(events)
      purchases.join(clicks, joinCond)
        .select(col("purchase_id"), col("user_id"),
          unix_timestamp(col("p_time")).as("p_ts"),
          col("click_id"),
          unix_timestamp(col("c_time")).as("c_ts"),
          (unix_timestamp(col("p_time")) - unix_timestamp(col("c_time")))
            .as("lag_sec"))
    }

    /** LEFT OUTER variant: every purchase, attributed or not — the
      * unmatched ones surface with null click columns only once the
      * watermark proves no in-window click can still arrive (the
      * streaming analog of [[graft.operators.Sequences
      * .eventIntervalUnmatched]]'s anti join). Append mode.
      */
    def pairsOuter(events: DataFrame): DataFrame = {
      val (clicks, purchases) = sides(events)
      purchases.join(clicks, joinCond, "left_outer")
        .select(col("purchase_id"), col("user_id"),
          unix_timestamp(col("p_time")).as("p_ts"),
          col("click_id"),
          unix_timestamp(col("c_time")).as("c_ts"))
    }
  }

  // ---------------------------------------------------------------------
  // GapfillStream — operators.Timeline.eventGapfill LIVE: final daily
  // rows per type INCLUDING the zeros, via event-time timers. The
  // no-data-no-row blindness is structural in streaming aggregation —
  // a silent day produces no row anywhere downstream — and "type X
  // went silent" is the one alert a volume monitor must not miss.
  // ---------------------------------------------------------------------
  object GapfillStream {

    private val DayMs = 86400000L

    /** Per-type gap-fill state: the last day already emitted as final,
      * and in-flight counts for still-open days.
      */
    final case class GapState(lastClosed: Long, counts: Map[Long, Long])

    /** One micro-batch's event fold for a type — ORDER-INDEPENDENT.
      * fMGWS gives no within-group iteration order, so the spine
      * start must come from the batch MINIMUM day, never the
      * first-iterated event (a {5,3} batch iterating 5 first would
      * otherwise pin lastClosed=4 and silently drop day 3's events —
      * above the watermark, so invisible to the ledger too).
      *
      * Re-open rule: `lastClosed >= wmDay` can only be an
      * event-pinned INIT sitting ahead of the watermark (a closure
      * always sets `wmDay' - 1`, and every engine-accepted event has
      * d >= wmDay >= wmDay', so closure-set values sit strictly below
      * any accepted day) — a future-skewed first event must not
      * swallow later legitimate arrivals, so such an init is lowered
      * to the new batch minimum. After the adjustment every day in
      * the batch is provably > lastClosed: either lastClosed =
      * minDay - 1 (< every d here) or it came from a closure at
      * wmDay' - 1 with d >= wmDay >= wmDay' for engine-accepted rows
      * — so counting is unconditional, nothing is dropped.
      */
    private[streaming] def foldDays(st0: GapState, days: Iterator[Long],
                                    wmDay: Long): GapState = {
      // bounded buffer: one group's slice of one micro-batch
      val ds = days.toArray
      if (ds.isEmpty) st0
      else {
        val minDay = ds.min
        var st = st0
        if (st.lastClosed == Long.MinValue ||
            (minDay - 1 < st.lastClosed && st.lastClosed >= wmDay))
          st = st.copy(lastClosed = minDay - 1)
        var counts = st.counts
        ds.foreach(d => counts = counts.updated(d, counts.getOrElse(d, 0L) + 1L))
        st.copy(counts = counts)
      }
    }

    /** FINAL (event_type, day, n) rows — one per type per day once the
      * watermark proves the day complete, n = 0 for silent days. State
      * per type = open-day counts only (bounded by days-in-flight);
      * closing is driven by data AND by event-time TIMERS, so a type
      * that stops sending still emits its zeros as long as anything
      * advances the watermark — the alert case. A type's spine starts
      * at its own first observed day (a stream cannot know a type
      * exists before its first event — the batch twin's global spine
      * needs the corpus). Arrivals for an already-closed day never
      * reach this operator at all: `FlatMapGroupsWithStateExec` drops
      * watermark-late rows before the function runs, which is exactly
      * what keeps the final rows immutable — run [[lateLedger]]
      * alongside to OBSERVE those rejections. Append mode.
      */
    def dailyFinal(events: DataFrame,
                   watermarkLag: String = "0 seconds"): DataFrame = {
      val spark = events.sparkSession
      import spark.implicits._
      events
        .withWatermark("ts", watermarkLag)
        .select(col("event_type"), col("ts"))
        .as[(String, java.sql.Timestamp)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
          (ty: String, it: Iterator[(String, java.sql.Timestamp)],
           state: GroupState[GapState]) => {
            val wmDay = state.getCurrentWatermarkMs() / DayMs
            var st = state.getOption.getOrElse(GapState(Long.MinValue, Map.empty))
            if (!state.hasTimedOut)
              st = foldDays(st, it.map(_._2.getTime / DayMs), wmDay)
            // close every day the watermark has completed
            val out = if (st.lastClosed == Long.MinValue) Iterator.empty
            else {
              val closable = (st.lastClosed + 1) until wmDay
              val rows = closable.map(d =>
                (ty, d, st.counts.getOrElse(d, 0L))).iterator
              if (closable.nonEmpty)
                st = st.copy(lastClosed = wmDay - 1,
                  counts = st.counts.filter(_._1 >= wmDay))
              rows
            }
            state.update(st)
            // wake when the watermark completes the next open day
            if (st.lastClosed != Long.MinValue)
              state.setTimeoutTimestamp(math.max(
                (st.lastClosed + 2) * DayMs,
                state.getCurrentWatermarkMs() + 1))
            out
          })
        .toDF("event_type", "day", "n")
    }

    /** The LATE-DATA ledger [[dailyFinal]] cannot keep itself (the
      * engine drops its late rows pre-operator): per micro-batch, a
      * DELTA row (event_type, day, n_late) for every arrival whose
      * day [[dailyFinal]] has already closed — consumers sum deltas
      * per (type, day). The observability an exactly-once daily
      * pipeline needs before trusting its zeros: a zero day with a
      * nonzero ledger means wrong, not silent.
      *
      * Mechanics: a SECOND subscription over the same source whose
      * watermark lags `slackDays` behind, so rows the main operator's
      * watermark already rejected still reach this one; the main
      * closure threshold is reconstructed as
      * `ledger watermark + slack` (both derive from the same max
      * event time). Rows later than the slack horizon are lost to the
      * ledger too — the horizon is the documented audit window.
      *
      * KNOWN BOUNDARY SKEW (accepted): the two subscriptions are
      * independent queries whose watermarks advance on their own
      * batch cadence, so within one batch of the closure boundary an
      * arrival can be double-counted (accepted by main, yet ledgered
      * late because the ledger's reconstruction already moved) or
      * missed by both (rejected by main, skipped by the ledger whose
      * reconstruction lags). The skew window is exactly the
      * watermark delta between the queries' last batches — one
      * micro-batch of boundary days, not a growing error. An
      * exactly-once boundary would need both operators to read ONE
      * published watermark (a `BoundsStore`-style side table the
      * batch layer owns) instead of each deriving its own; this
      * ledger deliberately stays self-contained and pays the
      * one-batch fuzz, which reconciliation sums over (type, day)
      * absorb for any day not at the live boundary.
      * Append mode, no timers, trivial state.
      */
    def lateLedger(events: DataFrame, slackDays: Int = 10,
                   mainLagMs: Long = 0L): DataFrame = {
      val spark = events.sparkSession
      import spark.implicits._
      val slackMs = slackDays * DayMs
      events
        .withWatermark("ts", s"$slackDays days")
        .select(col("event_type"), col("ts"))
        .as[(String, java.sql.Timestamp)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(
          OutputMode.Append, GroupStateTimeout.NoTimeout)(
          (ty: String, it: Iterator[(String, java.sql.Timestamp)],
           state: GroupState[Long]) => {
            // main watermark = ledger watermark + slack − main lag.
            // A reported 0 means the lagged watermark is still unset
            // (or clamped: event times within slackDays of the epoch
            // — impossible for real data) → nothing is closed yet.
            val wm = state.getCurrentWatermarkMs()
            val mainWmDay =
              if (wm == 0L) Long.MinValue
              else (wm + slackMs - mainLagMs) / DayMs
            val late = scala.collection.mutable.Map.empty[Long, Long]
            it.foreach { case (_, ts) =>
              val d = ts.getTime / DayMs
              if (d < mainWmDay) late(d) = late.getOrElse(d, 0L) + 1L
            }
            late.toSeq.sorted.map { case (d, n) => (ty, d, n) }.iterator
          })
        .toDF("event_type", "day", "n_late")
    }
  }

  // ---------------------------------------------------------------------
  // FreshnessStream — pipeline.Reports.eventFreshness's LIVE half: the
  // batch entry audits lag percentiles nightly; this tracks last-seen
  // per type as events land, so "type X stopped arriving" pages in
  // minutes, not at the next nightly report.
  // ---------------------------------------------------------------------
  object FreshnessStream {

    /** Per-type (last_ts, n_events), Update mode — one aggregation,
      * state = one (max, count) pair per type (bounded by |types|, the
      * 100 TB-safe shape). A consumer diffs last_ts against wall clock
      * for the live lag; the percentile audit stays the batch entry's
      * job (order statistics need the corpus — the boundary the
      * report/monitor split always has). Replay ≡ batch max/count per
      * type in any arrival order (spec-pinned).
      */
    def lastSeen(events: DataFrame): DataFrame =
      events
        .select(col("event_type"), unix_timestamp(col("ts")).as("ts_sec"))
        .groupBy(col("event_type"))
        .agg(max(col("ts_sec")).as("last_ts"),
          count(lit(1)).as("n_events"))
  }

  // ---------------------------------------------------------------------
  // InterleaveStream — pipeline.Export.corpusInterleaveDelta LIVE: new
  // docs get their round-robin training position AT INTAKE, continuing
  // each source's residue class from the shipped interleave.
  // ---------------------------------------------------------------------
  object InterleaveStream {

    /** One shipped-interleave boundary row: the source's alphabetical
      * index and its shipped rank count.
      */
    final case class SourceCursor(si: Long, nOld: Long)

    /** Live position assignment: pos = (n_old + arrivals so far) · S
      * + si, state = ONE Long counter per source (bounded by
      * |sources|). The boundary table (S, per-source si/n_old) is the
      * published artifact of the shipped interleave — the BoundsStore
      * generation shape; rolling a new interleave generation swaps
      * the table.
      *
      * Semantics are ARRIVAL-ORDER by design: a stream cannot rank by
      * the batch coin without seeing the whole delta, and intake
      * order is the order a live trainer would consume anyway. The
      * invariants shipped positions rely on hold identically
      * (spec-pinned): residues mod S identify the source, positions
      * are globally unique, and each source's ranks continue gap-free
      * from n_old. A source ABSENT from the boundary table cannot
      * continue a residue class — its docs emit pos = −1 (the
      * dead-letter sentinel; the batch twin refuses loudly, a stream
      * must not kill the query per bad row) for reconciliation to
      * route to the next generation ship. Append mode, no timers.
      */
    def positions(docs: DataFrame,
                  boundary: Map[String, SourceCursor]): DataFrame = {
      val spark = docs.sparkSession
      import spark.implicits._
      val s = boundary.size.toLong
      docs
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .groupByKey(_._2)
        .flatMapGroupsWithState(
          OutputMode.Append, GroupStateTimeout.NoTimeout)(
          (src: String, it: Iterator[(Long, String)],
           state: GroupState[Long]) => {
            boundary.get(src) match {
              case None =>
                it.map { case (id, _) => (id, src, -1L) }
              case Some(cur) =>
                var c = state.getOption.getOrElse(0L)
                val out = it.map { case (id, _) =>
                  val pos = (cur.nOld + c) * s + cur.si
                  c += 1
                  (id, src, pos)
                }.toVector
                state.update(c)
                out.iterator
            }
          })
        .toDF("doc_id", "source", "pos")
    }
  }

  // ---------------------------------------------------------------------
  // Scd2Stream — operators.Timeline.scd2History LIVE: CDC-style
  // dimension-history compaction as events arrive, one open interval of
  // state per user no matter how long the history grows.
  // ---------------------------------------------------------------------
  object Scd2Stream {

    /** The one open interval fMGWS keeps per user. */
    final case class OpenInterval(state: String, version: Long,
                                  validFrom: Long, nEvents: Long)

    /** SCD type-2 intervals from a live (user_id, ts_sec, event_id,
      * event_type) stream: per-user fMGWS state = ONLY the current
      * open interval (constant per user — history lives in the sink,
      * not in state). A state change CLOSES the previous interval
      * (emitted once, final, `valid_to` set) and re-emits the new open
      * interval (`valid_to` null, Update mode — last write per
      * (user, version) wins in an upserting sink). Same-state events
      * just advance the open interval's count.
      *
      * Ordering contract (the CDC assumption, documented not hidden):
      * per-user delivery must be event-time ordered ACROSS batches —
      * the op sorts within each batch's group iterator by
      * (ts_sec, event_id), but an event older than the open interval's
      * start would need the closed history rewritten, which no
      * bounded-state stream can do. Under that contract the final
      * emission per (user, version) ≡ batch
      * [[graft.operators.Timeline.scd2History]] bit-for-bit
      * (spec-pinned on a two-batch replay of the corpus).
      */
    def intervals(events: DataFrame): DataFrame = {
      val spark = events.sparkSession
      import spark.implicits._
      events
        .select(col("user_id"), col("ts_sec"), col("event_id"),
          col("event_type"))
        .as[(Long, Long, Long, String)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.NoTimeout)(
          (user: Long, it: Iterator[(Long, Long, Long, String)],
           st: GroupState[OpenInterval]) => {
            val sorted = it.toArray.sortBy(e => (e._2, e._3))
            val out = scala.collection.mutable.Buffer
              .empty[(Long, Long, String, Long, Option[Long], Long)]
            var cur = st.getOption.orNull
            sorted.foreach { case (_, ts, _, ty) =>
              cur match {
                case null =>
                  cur = OpenInterval(ty, 1L, ts, 1L)
                case c if c.state == ty =>
                  cur = c.copy(nEvents = c.nEvents + 1)
                case c =>
                  out += ((user, c.version, c.state, c.validFrom,
                    Some(ts), c.nEvents))
                  cur = OpenInterval(ty, c.version + 1, ts, 1L)
              }
            }
            if (cur != null) {
              st.update(cur)
              // the (possibly grown) open interval, re-emitted so the
              // sink's last write always shows the live row
              out += ((user, cur.version, cur.state, cur.validFrom,
                None, cur.nEvents))
            }
            out.iterator
          })
        .toDF("user_id", "version", "state", "valid_from", "valid_to",
          "n_events")
    }
  }
}
