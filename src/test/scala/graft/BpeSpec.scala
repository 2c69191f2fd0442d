package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** BPE fit: the distributed merge table against a byte-identical JVM
  * reference (same greedy semantics, same tie-break), chained merges
  * on a planted corpus, and the token-count query against a full JVM
  * re-tokenization.
  */
class BpeSpec extends SparkSpec {

  /** Reference greedy left-to-right single-rule pass. */
  private def applyRule(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var acc = Vector.empty[String]
    syms.foreach { x =>
      if (acc.nonEmpty && acc.last == l && x == r)
        acc = acc.init :+ (l + r)
      else acc = acc :+ x
    }
    out ++= acc
    out.result()
  }

  private def applyAll(word: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.split("").filter(_.nonEmpty).toVector) {
      case (s, (l, r)) => applyRule(s, l, r)
    }

  /** Reference fit over a (word → count) vocabulary. */
  private def jvmFit(wc: Map[String, Long]): Seq[(String, String)] = {
    var merges = Vector.empty[(String, String)]
    var done = false
    while (merges.length < Bpe.NumMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      wc.foreach { case (w, cnt) =>
        val syms = applyAll(w, merges)
        syms.zip(syms.drop(1)).foreach(p =>
          pairs(p) = pairs.getOrElse(p, 0L) + cnt)
      }
      if (pairs.isEmpty) done = true
      else {
        val best = pairs.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        if (best._2 < Bpe.MinPairCount) done = true
        else merges :+= best._1
      }
    }
    merges
  }

  test("fit ≡ the JVM reference merge sequence on the real corpus") {
    val wc = tables.documents
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Bpe.fit(tables)
    val ref = jvmFit(wc)
    assert(got == ref, s"distributed fit diverged:\n got $got\n ref $ref")
    assert(got.length == Bpe.NumMerges, "corpus must fill the table")
  }

  test("chained merges on a planted corpus: (a,a) then (aa,aa)") {
    import spark.implicits._
    val docs = Seq.fill(20)((1L, "aaaa aaaa aaaa")).zipWithIndex
      .map { case ((_, t), i) => (i.toLong, t) }
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t = Tables(spark, dir)
    val merges = Bpe.fit(t)
    assert(merges.take(2) == Seq(("a", "a"), ("aa", "aa")),
      s"expected chained merges, got $merges")
    // "aaaa" tokenizes to ONE symbol under the fitted table
    val rows = Bpe.tokenCountBpe(t).collect()
    assert(rows.forall(r => r.getLong(3) == 3L),
      "each 3-word doc must pack to 3 bpe tokens")
    assert(rows.forall(r => r.getLong(2) == 12L), "4 chars x 3 words")
  }

  test("token_count_bpe ≡ a full JVM re-tokenization; compression is real") {
    val merges = Bpe.storedMerges(tables)
    val docs = tables.documents.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      val chars = ws.map(w => w.split("").count(_.nonEmpty).toLong).sum
      val bpe = ws.map(w => applyAll(w, merges).length.toLong).sum
      id -> ((ws.length.toLong, chars, bpe))
    }.toMap
    val got = Bpe.tokenCountBpe(tables).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect, "query must equal the reference tokenizer")
    // merges must actually compress the corpus
    val totalChars = expect.values.map(_._2).sum
    val totalBpe = expect.values.map(_._3).sum
    assert(totalBpe < totalChars, "fitted merges must reduce token count")
    got.values.foreach { case (_, nc, nb) => assert(nb <= nc) }
  }
}
