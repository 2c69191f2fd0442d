package graft.textanalysis

import graft.Tables
import graft.functions.Portable.{round6, round6Sql}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` — the per-document scoring
  * pass of an LLM data pipeline (language ID, quality, token counting,
  * fingerprinting).
  *
  * Everything is a per-row column formula (whole-stage codegen, no UDF,
  * no shuffle except where a groupBy is the semantics) with a
  * bit-identical DuckDB oracle: identical arithmetic order, doubles
  * rounded to 6 dp at the boundary, md5 as the only hash.
  *
  * Scale: per-row transforms are embarrassingly parallel — these run at
  * scan speed on any corpus size; the only aggregations group by doc_id
  * (never global).
  */
object TextAnalysis {

  /** English-profile stopwords present in the corpus vocabulary. */
  val Stopwords = Seq("the", "a")
  val StopRatioEn = 0.05 // >= → 'en'

  // BPE-ish lexer classes: letter runs, digit runs, single non-alnum
  private val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Whitespace vs BPE-ish token counts per doc. */
  def tokenCount(t: Tables): DataFrame =
    t.documents.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit(TokenPattern), lit(0)))
        .cast("long").as("bpe_tokens"))
      .orderBy(col("doc_id"))

  def tokenCountSql: String =
    s"""SELECT doc_id,
       |  len(string_split(text, ' '))::BIGINT AS ws_tokens,
       |  len(regexp_extract_all(text, '$TokenPattern'))::BIGINT AS bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  /** N-gram-profile language ID: the fraction of tokens in an
    * English-stopword profile decides en vs other. (A real pipeline
    * scores several language profiles the same way — per-token set
    * membership + one groupBy — this is the deterministic single-profile
    * form; the lang column in the testdata is a label, not derivable
    * from its synthetic text.)
    */
  /** The language-ID frame, optionally carrying the stored `lang`
    * label in the same single-scan aggregation (no join) — shared by
    * [[langId]] and [[langIdConfusion]] so the predictor cannot drift.
    */
  private[graft] def langPredFrame(t: Tables, carryLang: Boolean): DataFrame = {
    val isStop = Stopwords.map(w => col("w") === w).reduce(_ || _)
    val keys =
      if (carryLang) Seq(col("doc_id"), col("lang")) else Seq(col("doc_id"))
    t.documents
      .select(keys :+ explode(split(col("text"), " ")).as("w"): _*)
      .groupBy(keys: _*)
      .agg(round6(sum(when(isStop, 1).otherwise(0)).cast("double")
        / count(lit(1))).as("stop_ratio"))
      .withColumn("lang_pred",
        when(col("stop_ratio") >= StopRatioEn, "en").otherwise("other"))
  }

  def langId(t: Tables): DataFrame =
    langPredFrame(t, carryLang = false).orderBy(col("doc_id"))

  /** Language-ID validation — predictor-vs-label confusion cells: per
    * (lang, lang_pred), the doc count and its share of that label's
    * docs. The acceptance audit for the n-gram/stopword predictor (the
    * `report_distill_confusion` discipline applied to language ID):
    * run per corpus snapshot, falling `en`→`en` share flags predictor
    * or corpus drift. ONE scan — the label rides the same aggregation
    * as the prediction, no join back to documents; cells are
    * |langs|·2 rows, totals a broadcast of a tiny re-aggregate.
    */
  def langIdConfusion(t: Tables): DataFrame = {
    val cells = langPredFrame(t, carryLang = true)
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("lang")).agg(sum(col("n")).as("tot"))
    cells.join(broadcast(totals), Seq("lang"))
      .select(col("lang"), col("lang_pred"), col("n"),
        round6(col("n").cast("double") / col("tot").cast("double"))
          .as("share6"))
      .orderBy(col("lang"), col("lang_pred"))
  }

  def langIdConfusionSql: String = {
    val set = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH tok AS (SELECT doc_id, lang,
       |               unnest(string_split(text, ' ')) w
       |             FROM documents),
       |r AS (SELECT doc_id, lang,
       |    ${round6Sql("sum(CASE WHEN w IN (" + set + ") THEN 1 ELSE 0 END)::DOUBLE / count(*)")} stop_ratio
       |  FROM tok GROUP BY doc_id, lang),
       |p AS (SELECT lang,
       |        CASE WHEN stop_ratio >= $StopRatioEn
       |             THEN 'en' ELSE 'other' END AS lang_pred
       |      FROM r),
       |cells AS (SELECT lang, lang_pred, COUNT(*) AS n
       |          FROM p GROUP BY 1, 2),
       |tot AS (SELECT lang, SUM(n) AS t FROM cells GROUP BY 1)
       |SELECT c.lang, c.lang_pred, c.n,
       |  ${round6Sql("c.n::DOUBLE / tot.t::DOUBLE")} AS share6
       |FROM cells c JOIN tot USING (lang)
       |ORDER BY c.lang, c.lang_pred""".stripMargin
  }

  def langIdSql: String = {
    val set = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) w FROM documents),
       |r AS (SELECT doc_id,
       |    ${round6Sql("sum(CASE WHEN w IN (" + set + ") THEN 1 ELSE 0 END)::DOUBLE / count(*)")} stop_ratio
       |  FROM tok GROUP BY doc_id)
       |SELECT doc_id, stop_ratio,
       |  CASE WHEN stop_ratio >= $StopRatioEn THEN 'en' ELSE 'other' END AS lang_pred
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** THE quality composite — single definition shared by qualityScore
    * and pipeline.CorpusClean so the formulas cannot drift. Inputs are
    * (n_chars, n_tok, n_distinct) columns.
    */
  def qualityExpr(nChars: org.apache.spark.sql.Column,
                  nTok: org.apache.spark.sql.Column,
                  nDistinct: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round6(
      least(nChars.cast("double") / 500.0, lit(1.0)) * 0.5
        + (nDistinct.cast("double") / nTok) * 0.3
        + least((nChars.cast("double") / nTok) / 8.0, lit(1.0)) * 0.2)

  /** DuckDB twin of [[qualityExpr]]; args are SQL fragments. */
  def qualityExprSql(nChars: String, nTok: String, nDistinct: String): String =
    round6Sql(
      s"least($nChars::DOUBLE / 500.0, 1.0) * 0.5"
        + s" + ($nDistinct::DOUBLE / $nTok) * 0.3"
        + s" + least(($nChars::DOUBLE / $nTok) / 8.0, 1.0) * 0.2")

  /** Composite quality score: length saturation + type-token ratio
    * (lexical diversity) + mean-token-length saturation, identical
    * weighted formula both sides. Components surfaced for debuggability.
    */
  def qualityScore(t: Tables): DataFrame =
    // token and distinct-token counts are per-row facts of `text`
    // (`size(split)` / `size(array_distinct(split))` — identical longs
    // to the r20 explode + count/countDistinct aggregation, which paid
    // an Expand over every token row plus two exchanges for what a
    // single codegen'd projection computes): the whole score is now
    // scan-side, and the only exchange left is the output sort
    // (optimization guide §2.3/§2.4)
    t.documents
      .select(col("doc_id"), col("n_chars"),
        split(col("text"), " ").as("ts"))
      .select(col("doc_id"), size(col("ts")).cast("long").as("n_tok"),
        size(array_distinct(col("ts"))).cast("long").as("n_distinct"),
        col("n_chars"))
      .select(col("doc_id"),
        round6(col("n_distinct").cast("double") / col("n_tok")).as("ttr"),
        round6(col("n_chars").cast("double") / col("n_tok"))
          .as("mean_tok_len"),
        qualityExpr(col("n_chars"), col("n_tok"), col("n_distinct"))
          .as("quality"))
      .orderBy(col("doc_id"))

  def qualityScoreSql: String =
    s"""WITH tok AS (SELECT doc_id, n_chars, unnest(string_split(text, ' ')) w
       |             FROM documents),
       |agg AS (SELECT doc_id, n_chars, count(*) n_tok,
       |          count(DISTINCT w) n_distinct
       |        FROM tok GROUP BY doc_id, n_chars)
       |SELECT doc_id,
       |  ${round6Sql("n_distinct::DOUBLE / n_tok")} AS ttr,
       |  ${round6Sql("n_chars::DOUBLE / n_tok")} AS mean_tok_len,
       |  ${qualityExprSql("n_chars", "n_tok", "n_distinct")} AS quality
       |FROM agg ORDER BY doc_id""".stripMargin

  /** Repetition-frac thresholds for [[qualityRepetition]]'s keep flag.
    * Gopher-inspired (Rae et al. 2021 use character fractions of the
    * top/duplicated 2-grams; these are the token-count analogs, which
    * keep the formula integer-exact across engines): a doc whose single
    * most frequent bigram covers more than 20% of its bigram stream, or
    * whose repeated bigrams cover more than 40%, is template/spam text.
    */
  val TopBigramFracMax = 0.2
  val DupBigramFracMax = 0.4

  /** Per-document REPETITION profile — the dedup-adjacent quality gate
    * exact/near-dup ops don't cover: a document that is boilerplate
    * repeated against ITSELF ("buy now buy now buy now ...") is unique
    * corpus-wide yet worthless for training. Emits per doc the bigram
    * stream size, the top-bigram fraction, the duplicated-bigram
    * fraction (occurrences beyond each bigram's first), and keep =
    * both under [[TopBigramFracMax]]/[[DupBigramFracMax]].
    *
    * Shares [[bigramsOf]] with the LM scorer so the bigram definition
    * cannot drift. Scale: one (doc, bigram) shuffle with map-side
    * partial counts, then a per-doc aggregation — the same two-phase
    * shape as word_count; docs with < 2 tokens have no bigrams and
    * drop out (same rule both engines).
    */
  def qualityRepetition(t: Tables): DataFrame =
    qualityRepetitionUnsorted(t).orderBy(col("doc_id"))

  /** Max multiplicity of any element of `arr`, LINEARLY: sort, then
    * one `aggregate` pass counting runs — O(n log n) per row, inside
    * whole-stage codegen. Null elements count as a run of their own:
    * the comparison is null-safe (`<=>`), and the null-prev sentinel
    * is safe because `run` starts at 0 — a leading null element
    * increments 0→1, exactly its multiplicity so far (array_sort
    * groups nulls, so the run stays contiguous). Shared by the batch
    * repetition gate and the streaming twin
    * (streaming.Jobs.RepetitionGateStream) so the count cannot drift.
    */
  private[graft] def maxRunCount(arr: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val zero = struct(lit(null).cast("string").as("prev"),
      lit(0L).as("run"), lit(0L).as("best"))
    aggregate(array_sort(arr), zero, (acc, x) => {
      val run = when(x <=> acc.getField("prev"),
        acc.getField("run") + 1).otherwise(lit(1L))
      struct(x.as("prev"), run.as("run"),
        greatest(acc.getField("best"), run).as("best"))
    }, acc => acc.getField("best"))
  }

  /** [[qualityRepetition]] without the presentation sort — the
    * composition form consumed by `corpus_admit` (the
    * `minhashCandidates` pattern: composed plans must not rely on
    * `EliminateSorts` to stay shuffle-clean).
    *
    * A doc's repetition profile depends on nothing but its own text —
    * the streaming twin (streaming.Jobs.RepetitionGateStream, pinned
    * stream ≡ batch by StreamingJobsSpec) has always computed it
    * per-row — so the batch op is a PROJECTION too: the bigram array
    * rides one codegen'd zip_with, `n_bigrams` = size, `n_distinct` =
    * size∘array_distinct, `top_cnt` = [[maxRunCount]]. The r21 plan
    * shuffled every (doc, bigram) occurrence through a two-level
    * aggregation — two exchanges for per-row facts (optimization guide
    * §2.3/§2.4, the same rewrite as the r21 quality gate: identical
    * integers into the identical round6 division, so rows are
    * bit-equal; bigram strings are injective because split-on-space
    * tokens carry no spaces).
    */
  def qualityRepetitionUnsorted(t: Tables): DataFrame =
    t.documents
      .withColumn("qr_ts", split(col("text"), " "))
      .where(size(col("qr_ts")) >= 2)
      .withColumn("bgs", expr(
        """zip_with(slice(qr_ts, 1, size(qr_ts) - 1),
          |  slice(qr_ts, 2, size(qr_ts) - 1),
          |  (a, b) -> concat(a, ' ', b))""".stripMargin))
      .select(col("doc_id"),
        size(col("bgs")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bgs"))).cast("long").as("n_distinct"),
        maxRunCount(col("bgs")).cast("long").as("top_cnt"))
      .select(col("doc_id"), col("n_bigrams"),
        round6(col("top_cnt").cast("double") / col("n_bigrams"))
          .as("top_bigram_frac"),
        round6((col("n_bigrams") - col("n_distinct")).cast("double")
          / col("n_bigrams")).as("dup_bigram_frac"))
      .withColumn("keep",
        (col("top_bigram_frac") <= TopBigramFracMax &&
          col("dup_bigram_frac") <= DupBigramFracMax).cast("int"))

  def qualityRepetitionSql: String =
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') ts FROM documents
       |             WHERE len(string_split(text, ' ')) >= 2),
       |bg AS (SELECT doc_id, ts[i] w1, ts[i+1] w2
       |       FROM tok, unnest(generate_series(1, len(ts) - 1)) t(i)),
       |pb AS (SELECT doc_id, w1, w2, COUNT(*) cnt FROM bg
       |       GROUP BY doc_id, w1, w2),
       |agg AS (SELECT doc_id, SUM(cnt)::BIGINT n_bigrams,
       |          COUNT(*) n_distinct, MAX(cnt) top_cnt
       |        FROM pb GROUP BY doc_id)
       |SELECT doc_id, n_bigrams,
       |  ${round6Sql("top_cnt::DOUBLE / n_bigrams")} AS top_bigram_frac,
       |  ${round6Sql("(n_bigrams - n_distinct)::DOUBLE / n_bigrams")} AS dup_bigram_frac,
       |  CASE WHEN ${round6Sql("top_cnt::DOUBLE / n_bigrams")} <= $TopBigramFracMax
       |        AND ${round6Sql("(n_bigrams - n_distinct)::DOUBLE / n_bigrams")} <= $DupBigramFracMax
       |       THEN 1 ELSE 0 END AS keep
       |FROM agg ORDER BY doc_id""".stripMargin

  /** Corpus n-gram statistics: the top 3-grams by document frequency —
    * the profile pass a pipeline runs to find boilerplate/stop-phrases
    * worth stripping before dedup. Document frequency (distinct docs per
    * shingle), not raw count, so one spammy doc cannot dominate; top-k
    * via rank with a shingle tiebreak (deterministic across engines).
    * Scale: shuffle carries (shingle, doc_id) pairs; the rank runs over
    * one row per distinct shingle.
    */
  def topNgrams(t: Tables, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = t.documents
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .where(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(
        graft.functions.TextFunctions.shingles(col("ts"), 3)).as("ngram"))
      .distinct()
    sh.groupBy(col("ngram"))
      .agg(count(lit(1)).as("doc_freq"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("doc_freq").desc, col("ngram"))))
      .filter(col("rank") <= k)
      .select(col("ngram"), col("doc_freq"), col("rank"))
  }

  def topNgramsSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') ts FROM documents
      |             WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] ngram
      |       FROM tok, unnest(generate_series(1, len(ts) - 2)) t(i)),
      |df AS (SELECT ngram, COUNT(*) doc_freq FROM sh GROUP BY ngram)
      |SELECT ngram, doc_freq, CAST(rank AS INT) AS rank FROM (
      |  SELECT ngram, doc_freq,
      |    row_number() OVER (ORDER BY doc_freq DESC, ngram) rank FROM df)
      |WHERE rank <= 20""".stripMargin

  /** Top-k characteristic terms per document by rarity-weighted
    * frequency — the keyword/topic extraction pass of a corpus
    * pipeline. Score = round6(tf / df): term frequency in the doc over
    * corpus document frequency. This is the LOG-FREE tf-idf variant,
    * deliberately: libm `ln`/`log` is not bit-portable across engines
    * (the lm_bigram_score precedent), while tf and df are exact
    * integers and one rounded division hashes identically everywhere.
    * Same rarity ordering for fixed tf (monotone in 1/df), same
    * frequency ordering for fixed df. Rank ties break by term
    * (deterministic both engines).
    *
    * Scale: (doc, term) shuffle with map-side partial counts, a
    * vocab-keyed df aggregation, one equi-join on term (AQE handles
    * stop-word skew; the df side is vocab-sized), and a per-doc top-k
    * window over ≤ vocab-per-doc rows.
    */
  val TfidfTopK = 3

  def tfidfTopTerms(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = t.documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round6(col("tf").cast("double") / col("df")).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))))
      .filter(col("rank") <= TfidfTopK)
      .orderBy(col("doc_id"), col("rank"))
  }

  def tfidfTopTermsSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) term
       |             FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) tf FROM tok
       |       GROUP BY doc_id, term),
       |dfreq AS (SELECT term, COUNT(*) df FROM tf GROUP BY term),
       |scored AS (SELECT doc_id, term, tf, df,
       |    ${round6Sql("tf::DOUBLE / df")} score
       |  FROM tf JOIN dfreq USING (term))
       |SELECT doc_id, term, tf, df, score, CAST(rank AS INT) AS rank FROM (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY doc_id ORDER BY score DESC, term) rank
       |  FROM scored)
       |WHERE rank <= $TfidfTopK ORDER BY doc_id, rank""".stripMargin

  /** Winnowing-style fingerprint: the minimum md5 over a doc's word
    * 3-shingles (stable under local edits — the basis of near-dup
    * clustering) plus the exact md5 of the full text.
    */
  def docFingerprint(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), md5(col("text")).as("full_md5"),
        split(col("text"), " ").as("ts"))
      .where(size(col("ts")) >= 3)
      .select(col("doc_id"), col("full_md5"), explode(
        graft.functions.TextFunctions.shingles(col("ts"), 3)).as("s"))
      .groupBy(col("doc_id"), col("full_md5"))
      .agg(min(md5(col("s"))).as("min_shingle_md5"))
      .select(col("doc_id"), col("min_shingle_md5"), col("full_md5"))
      .orderBy(col("doc_id"))

  def docFingerprintSql: String =
    """WITH tok AS (SELECT doc_id, md5(text) full_md5,
      |               string_split(text, ' ') ts FROM documents
      |             WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT doc_id, full_md5, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] s
      |       FROM tok, unnest(generate_series(1, len(ts) - 2)) t(i))
      |SELECT doc_id, min(md5(s)) AS min_shingle_md5, full_md5
      |FROM sh GROUP BY doc_id, full_md5 ORDER BY doc_id""".stripMargin

  /** Bigram language-model fluency score per document — the LM-based
    * quality filter of CCNet-style pipelines (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", 2020): train a cheap LM on the corpus, score each document
    * by how well the model predicts it, filter the tail. Here the LM
    * is an add-one-smoothed bigram model trained on the corpus itself:
    * p(w₂|w₁) = (c(w₁,w₂) + 1) / (c(w₁) + V), and a document's score
    * is its mean bigram probability.
    *
    * Two deliberate portability choices (SURVEY §6):
    * - PROBABILITY space, not log space: libm `ln` is not exactly
    *   rounded and differs in the last ulp across engines, so a
    *   log-perplexity would not hash-match. Mean probability is a
    *   monotone-equivalent fluency signal per position and every op in
    *   it (integer counts, one double division, exactly-rounded) is
    *   bit-identical.
    * - The per-doc mean crosses a FIXED-POINT integer: each p is
    *   floored to 1e-12 units (identical double → identical BIGINT),
    *   summed as integers (exact, ORDER-INDEPENDENT — a double sum
    *   over a group is partition-order-sensitive and would break the
    *   oracle), divided back out in a fixed sequence.
    *
    * Scale (100 TB): the model tables are corpus-global aggregations
    * on token keys (map-side partial counts collapse the hot-word
    * skew); scoring is two lookup equi-joins — the model sides are
    * vocabulary-sized (≪ corpus, broadcastable in practice; at
    * web-corpus bigram cardinality AQE picks the shuffle join and the
    * per-doc aggregation stays partial). Documents with < 2 tokens
    * have no bigrams and drop out — same rule both engines.
    */
  /** Per-row bigram explosion of any (..., text) frame — carries every
    * column of `df` plus (w1, w2) per bigram occurrence. Shared by the
    * batch op and the streaming twin (streaming.Jobs.LmScoreStream) so
    * the bigram definition cannot drift.
    */
  private[graft] def bigramsOf(df: DataFrame): DataFrame =
    df.withColumn("lm_ts_toks", split(col("text"), " "))
      .where(size(col("lm_ts_toks")) >= 2)
      .withColumn("bg", explode(expr(
        """zip_with(slice(lm_ts_toks, 1, size(lm_ts_toks) - 1),
          |  slice(lm_ts_toks, 2, size(lm_ts_toks) - 1),
          |  (a, b) -> named_struct('w1', a, 'w2', b))""".stripMargin)))
      .withColumn("w1", col("bg.w1")).withColumn("w2", col("bg.w2"))
      .drop("lm_ts_toks", "bg", "text")

  /** (w1, w2, c12) — corpus bigram counts, the model's numerator table. */
  private[graft] def lmModelBig(t: Tables): DataFrame =
    bigramsOf(t.documents.select(col("doc_id"), col("text")))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))

  /** (w1, c1) — corpus unigram counts, the smoothing denominator. */
  private[graft] def lmModelUni(t: Tables): DataFrame =
    t.documents.select(explode(split(col("text"), " ")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))

  /** One-row (v) — corpus vocabulary size. */
  private[graft] def lmVocab(t: Tables): DataFrame =
    t.documents.select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w")).as("v"))

  /** (doc_id/..., w1, w2) scored: `p12` = the smoothed bigram
    * probability in 1e-12 fixed-point units. `coalesce` handles
    * model-unseen bigrams/prefixes (a STREAMED doc may contain them;
    * batch corpus docs never do, so the batch plan is unaffected).
    */
  private[graft] def lmScoredBigrams(bi: DataFrame, big: DataFrame,
                                     uni: DataFrame, vocab: DataFrame): DataFrame =
    bi.join(big, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("p12", floor(
        (expr("CAST(coalesce(c12, 0) + 1 AS DOUBLE)")
          / expr("CAST(coalesce(c1, 0) + v AS DOUBLE)")) * lit(1e12)
          + lit(0.5)).cast("long"))

  /** (n_bigrams, sp) → the rounded mean-probability column. */
  private[graft] def lmScoreExpr: org.apache.spark.sql.Column =
    round6((col("sp").cast("double") / col("n_bigrams").cast("double"))
      / lit(1e12)).as("lm_score")

  def lmBigramScore(t: Tables): DataFrame = {
    val bi = bigramsOf(t.documents.select(col("doc_id"), col("text")))
    lmScoredBigrams(bi, lmModelBig(t), lmModelUni(t), lmVocab(t))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p12")).as("sp"))
      .select(col("doc_id"), col("n_bigrams"), lmScoreExpr)
      .orderBy(col("doc_id"))
  }

  def lmBigramScoreSql: String =
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') ts FROM documents
       |             WHERE len(string_split(text, ' ')) >= 2),
       |bi AS (SELECT doc_id, ts[i] w1, ts[i+1] w2
       |       FROM tok, unnest(generate_series(1, len(ts) - 1)) t(i)),
       |alltok AS (SELECT unnest(string_split(text, ' ')) w FROM documents),
       |uni AS (SELECT w, COUNT(*) c1 FROM alltok GROUP BY w),
       |vocab AS (SELECT COUNT(DISTINCT w) v FROM alltok),
       |p AS (SELECT doc_id,
       |        CAST(floor((CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE))
       |               * 1000000000000.0 + 0.5) AS BIGINT) p12
       |      FROM bi
       |      JOIN (SELECT w1, w2, COUNT(*) c12 FROM bi GROUP BY w1, w2) big
       |        USING (w1, w2)
       |      JOIN uni ON bi.w1 = uni.w
       |      CROSS JOIN vocab)
       |SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
       |  ${round6Sql("(CAST(SUM(p12) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 1000000000000.0")} AS lm_score
       |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Collocation extraction floor and cut. */
  val CollocMinPairCount = 3L
  val CollocTopK = 50

  /** Top-k COLLOCATIONS: word pairs that co-occur far above chance —
    * the phrase-mining pass (multi-word entities, boilerplate idioms,
    * tokenizer-merge candidates) over the same bigram/unigram model
    * tables the LM score reuses. Ranked by `lift6`, the fixed-point
    * PMI argument `c12·N_uni² / (N_bi·c1·c2)` (log-free ON PURPOSE —
    * log is monotone so the ranking is identical, and libm `ln` is
    * not bit-portable across engines; the tfidf_top_terms precedent).
    * All inputs are EXACT integer counts, so the one double expression
    * is IEEE-identical in both engines before its fixed-point floor.
    *
    * Scale: bigram counts shuffle once on (w1, w2); the `c12 ≥ 3`
    * rarity floor prunes the long singleton tail BEFORE the two
    * unigram joins (each a plain equi-shuffle — vocab is unbounded at
    * corpus scale, so neither side is broadcast-hinted; AQE may still
    * choose broadcast when small); totals ride a broadcast cross of
    * two one-row aggregates; the cut is `orderBy().limit()` →
    * TakeOrderedAndProject (partial top-k, (lift, w1, w2) total order
    * — deterministic at the boundary).
    */
  def textCollocations(t: Tables): DataFrame = {
    val big = lmModelBig(t).filter(col("c12") >= CollocMinPairCount)
    val uni = lmModelUni(t)
    val totals = lmModelBig(t).agg(sum(col("c12")).as("nbi"))
      .crossJoin(t.documents
        .select(explode(split(col("text"), " ")).as("w"))
        .agg(count(lit(1)).as("nu")))
    big
      .join(uni.select(col("w1"), col("c1").as("c1a")), Seq("w1"))
      .join(uni.select(col("w1").as("w2"), col("c1").as("c1b")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c12"),
        floor((col("c12").cast("double") * col("nu") * col("nu") /
          (col("nbi").cast("double") * col("c1a") * col("c1b"))) *
          lit(1000000.0) + lit(0.5)).cast("long").as("lift6"))
      .orderBy(col("lift6").desc, col("w1"), col("w2"))
      .limit(CollocTopK)
  }

  def textCollocationsSql: String =
    s"""WITH tok AS (SELECT string_split(text, ' ') ts FROM documents
       |             WHERE len(string_split(text, ' ')) >= 2),
       |bi AS (SELECT ts[i] w1, ts[i+1] w2
       |       FROM tok, unnest(generate_series(1, len(ts) - 1)) t(i)),
       |big AS (SELECT w1, w2, COUNT(*) c12 FROM bi GROUP BY 1, 2),
       |alltok AS (SELECT unnest(string_split(text, ' ')) w
       |           FROM documents),
       |uni AS (SELECT w, COUNT(*) c1 FROM alltok GROUP BY 1),
       |tot AS (SELECT (SELECT SUM(c12) FROM big) nbi,
       |               (SELECT COUNT(*) FROM alltok) nu)
       |SELECT w1, w2, c12,
       |  CAST(floor((CAST(c12 AS DOUBLE) * nu * nu
       |      / (CAST(nbi AS DOUBLE) * ua.c1 * ub.c1))
       |    * 1000000.0 + 0.5) AS BIGINT) AS lift6
       |FROM big
       |JOIN uni ua ON big.w1 = ua.w
       |JOIN uni ub ON big.w2 = ub.w
       |CROSS JOIN tot
       |WHERE c12 >= $CollocMinPairCount
       |ORDER BY lift6 DESC, w1, w2 LIMIT $CollocTopK""".stripMargin
}
