package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch — bounded-memory frequency estimation, the
  * sublinear answer to the reference's running word counts (ref:
  * UpdateStateByKeyWordCount.java keeps one state entry PER KEY —
  * unbounded as vocabulary grows; the sketch holds a fixed d×w grid
  * no matter how many distinct keys arrive).
  *
  * Every hash is md5 in its own `cm<j>` seed namespace (the
  * [[graft.pipeline.Mixing]] coin discipline), so the grid — and
  * therefore every ESTIMATE, including its deterministic
  * over-counts — is identical in Spark and the DuckDB oracle:
  * the sketch is hash-checked cross-engine, not just spec-asserted.
  *
  * Scale: the build shuffles (j, cell) pairs with map-side partial
  * sums — the reduce side is ≤ d·w groups regardless of corpus size;
  * the estimate probe joins the vocabulary against the ≤ d·w-row grid
  * (broadcast). The streaming twin keeps the SAME grid as streaming
  * aggregation state: d·w rows forever, the bounded-state alternative
  * to `RunningCounts` when keys are unbounded.
  */
object Sketches {

  val CmDepth = 4
  val CmWidth = 1024

  /** Heavy-hitter rule: estimate ≥ total/[[HeavyFrac]] (integer
    * arithmetic — `est * HeavyFrac >= total` — portable).
    */
  val HeavyFrac = 64L

  private def tokens(t: Tables): DataFrame =
    t.documents.select(explode(split(col("text"), " ")).as("word"))

  private def cellCol(j: Int, word: Column): Column =
    conv(substring(md5(concat(lit(s"cm$j|"), word)), 1, 8), 16, 10)
      .cast("long") % CmWidth

  /** (word, j, c) cell expansion — shared with the streaming twin so
    * the grid definition cannot drift.
    */
  private[graft] def cells(words: DataFrame): DataFrame =
    words.select(col("word"), explode(array((0 until CmDepth).map(j =>
      struct(lit(j).as("j"), cellCol(j, col("word")).as("c"))): _*))
      .as("rc"))
      .select(col("word"), col("rc.j").as("j"), col("rc.c").as("c"))

  /** The sketch itself: (j, c, cnt) — one occurrence adds 1 to its
    * cell in each of the d rows. ≤ d·w rows out.
    */
  def countMinSketch(t: Tables): DataFrame =
    cells(tokens(t))
      .groupBy(col("j"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("j"), col("c"))

  def countMinSketchSql: String =
    s"""SELECT j, c, COUNT(*) AS cnt FROM (
       |  SELECT t.j,
       |    (('0x' || substr(md5('cm' || t.j || '|' || word), 1, 8))::BIGINT
       |      % $CmWidth) AS c
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word
       |        FROM documents) w, range($CmDepth) t(j))
       |GROUP BY j, c
       |ORDER BY j, c""".stripMargin

  /** Heavy hitters BY THE SKETCH: estimate(word) = min over the d
    * cells it hashes to (≥ true count always — collisions only add),
    * emit words whose estimate clears total/[[HeavyFrac]]. The query
    * set here is the corpus vocabulary (a demo of the estimate path —
    * production probes specific keys against the published grid);
    * over-counted non-heavy words that clear the bar are REAL
    * count-min semantics, deterministic, and oracle-checked.
    */
  def countMinHeavyHitters(t: Tables): DataFrame = {
    val sketch = countMinSketch(t)
    val vocab = tokens(t).distinct()
    val total = tokens(t).count()
    cells(vocab)
      .join(broadcast(sketch), Seq("j", "c"))
      .groupBy(col("word"))
      .agg(min(col("cnt")).as("est"))
      .filter(col("est") * HeavyFrac >= total)
      .orderBy(col("word"))
  }

  def countMinHeavyHittersSql: String =
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS word
       |              FROM documents),
       |sk AS (SELECT j, c, COUNT(*) AS cnt FROM (
       |         SELECT t.j,
       |           (('0x' || substr(md5('cm' || t.j || '|' || word), 1, 8))
       |             ::BIGINT % $CmWidth) AS c
       |         FROM toks, range($CmDepth) t(j))
       |       GROUP BY j, c),
       |vc AS (SELECT DISTINCT word FROM toks),
       |probe AS (SELECT v.word, t.j,
       |            (('0x' || substr(md5('cm' || t.j || '|' || v.word), 1, 8))
       |              ::BIGINT % $CmWidth) AS c
       |          FROM vc v, range($CmDepth) t(j)),
       |est AS (SELECT p.word, MIN(sk.cnt) AS est
       |        FROM probe p JOIN sk ON sk.j = p.j AND sk.c = p.c
       |        GROUP BY p.word)
       |SELECT word, est FROM est
       |WHERE est * $HeavyFrac >= (SELECT COUNT(*) FROM toks)
       |ORDER BY word""".stripMargin
}
