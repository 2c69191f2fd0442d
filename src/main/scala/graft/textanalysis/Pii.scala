package graft.textanalysis

import graft.Tables
import graft.functions.Portable.{round6, round6Sql}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass a training-data pipeline runs
  * before export: emails, IPv4 addresses, and long digit runs
  * (phone/account-number shaped) replaced with typed placeholder
  * tokens, plus per-doc and per-source incidence reporting.
  *
  * Pattern portability is the load-bearing constraint: Spark compiles
  * `regexp_replace` with java.util.regex, the oracle (DuckDB) uses
  * RE2. The three patterns below stay inside the intersection both
  * engines implement with identical leftmost-first greedy semantics —
  * character classes, bounded/unbounded repetition, `\b`, `\d` (both
  * ASCII-only by default). No lookaround (RE2 has none), no
  * backreferences, no Unicode classes.
  *
  * Scrub order is part of the semantics and is identical in both
  * engines: emails first (they contain digits and dots that the later
  * patterns would half-match), then IPv4 (dotted digits the digit-run
  * pattern would swallow), then bare digit runs. Each count is taken
  * on the text AS THE PREVIOUS PASS LEFT IT, so counts and scrub
  * compose into one well-defined sequential semantics; placeholder
  * tokens contain no digits, so no pass can match inside another's
  * replacement.
  *
  * Reference scope: the reference has no scrubbing pass; this extends
  * the text-analysis family (lang_id / quality_score siblings).
  */
object Pii {

  /** Email: local part, `@`, dotted domain, ≥2-alpha TLD. */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** IPv4: four 1-3 digit octets, word-bounded (no lookaround in RE2,
    * so `\b` is the shared anchor both engines support).
    */
  val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Long digit run (≥9 digits): phone/account/SSN-shaped. Runs with
    * internal separators are left alone on purpose — a separator-
    * tolerant pattern false-positives on numeric tables, and the
    * high-precision rule is the one a corpus build can apply blindly.
    */
  val DigitRunPat = "\\b\\d{9,}\\b"

  private val Passes: Seq[(String, String, String)] = Seq(
    (EmailPat, "<EMAIL>", "n_email"),
    (Ipv4Pat, "<IP>", "n_ip"),
    (DigitRunPat, "<NUM>", "n_num"))

  /** Appends (n_email, n_ip, n_num, scrubbed) to ANY frame with a
    * `text` column — the sequential count-then-replace fold over
    * [[Passes]]. Pure map-side column work — no shuffle, no state, so
    * the same definition serves the batch ops and the streaming scrub
    * ([[graft.streaming.Jobs.PiiScrubStream]]) unchanged; at 100 TB
    * this pass rides the export scan for free.
    */
  private[graft] def withPiiColumns(docs: DataFrame): DataFrame = {
    val (scrubbed, counts) =
      Passes.foldLeft((col("text"), Seq.empty[Column])) {
        case ((txt, acc), (pat, tok, name)) =>
          (regexp_replace(txt, pat, tok),
            acc :+ regexp_count(txt, lit(pat)).cast("long").as(name))
      }
    docs.select(
      col("*") +: counts :+ scrubbed.as("scrubbed"): _*)
  }

  /** Per-doc (doc_id, source, n_email, n_ip, n_num, scrubbed). */
  private def piiCounts(t: Tables): DataFrame =
    withPiiColumns(t.documents)
      .select(col("doc_id"), col("source"), col("n_email"), col("n_ip"),
        col("n_num"), col("scrubbed"))

  /** The CTE chain computing the same sequential fold in DuckDB —
    * `'g'` flag required (DuckDB replaces first-match-only by
    * default; Spark replaces all).
    */
  private def piiCtes: String =
    s"""p0 AS (SELECT doc_id, source, text,
       |         len(regexp_extract_all(text, '$EmailPat'))::BIGINT AS n_email,
       |         regexp_replace(text, '$EmailPat', '<EMAIL>', 'g') AS t1
       |       FROM documents),
       |p1 AS (SELECT *, len(regexp_extract_all(t1, '$Ipv4Pat'))::BIGINT AS n_ip,
       |         regexp_replace(t1, '$Ipv4Pat', '<IP>', 'g') AS t2
       |       FROM p0),
       |p2 AS (SELECT doc_id, source, n_email, n_ip,
       |         len(regexp_extract_all(t2, '$DigitRunPat'))::BIGINT AS n_num,
       |         regexp_replace(t2, '$DigitRunPat', '<NUM>', 'g') AS scrubbed
       |       FROM p1)""".stripMargin

  /** Redaction pass: every doc, PII replaced with typed tokens, with
    * per-type match counts riding along (the audit columns a scrub job
    * logs). Output is corpus-sized by design — this IS the export
    * transform, not a report.
    */
  def piiScrub(t: Tables): DataFrame =
    piiCounts(t)
      .select(col("doc_id"), col("n_email"), col("n_ip"), col("n_num"),
        col("scrubbed"))
      .orderBy(col("doc_id"))

  def piiScrubSql: String =
    s"""WITH $piiCtes
       |SELECT doc_id, n_email, n_ip, n_num, scrubbed
       |FROM p2 ORDER BY doc_id""".stripMargin

  /** Per-source PII incidence report (the corpus-audit companion of
    * [[graft.pipeline.Reports.statsBySource]]): match volumes per type
    * and the fraction of docs carrying any PII — the table that
    * decides which sources need a stricter scrub or exclusion. One
    * aggregation over the map-side counts; output is |sources| rows.
    */
  def piiStats(t: Tables): DataFrame =
    piiCounts(t)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_email")).as("n_email"),
        sum(col("n_ip")).as("n_ip"),
        sum(col("n_num")).as("n_num"),
        round6(
          sum(when(col("n_email") + col("n_ip") + col("n_num") > 0, 1L)
            .otherwise(0L)).cast("double")
            / count(lit(1)).cast("double")).as("pii_doc_frac"))
      .orderBy(col("source"))

  def piiStatsSql: String =
    s"""WITH $piiCtes
       |SELECT source, COUNT(*) AS n_docs,
       |  SUM(n_email)::BIGINT AS n_email, SUM(n_ip)::BIGINT AS n_ip,
       |  SUM(n_num)::BIGINT AS n_num,
       |  ${round6Sql(
      "SUM(CASE WHEN n_email + n_ip + n_num > 0 THEN 1 ELSE 0 END)::DOUBLE" +
        " / COUNT(*)::DOUBLE")} AS pii_doc_frac
       |FROM p2 GROUP BY source ORDER BY source""".stripMargin
}
