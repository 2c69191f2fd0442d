package graft

import graft.textanalysis.Pii

/** PII scrub semantics on planted texts: each pattern family, the
  * sequential pass order (emails before IPs before digit runs), and
  * the no-rematch property of the placeholder tokens.
  */
class PiiSpec extends SparkSpec {

  private def scrubOne(text: String): (Long, Long, Long, String) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pii").toString
    Seq((1L, text, "en", "a"))
      .toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Pii.piiScrub(Tables(spark, dir)).collect()(0)
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
  }

  test("emails are scrubbed and counted") {
    val (e, ip, num, s) =
      scrubOne("mail bob.smith+x@corp.example.org and a@b.io now")
    assert((e, ip, num) == (2L, 0L, 0L))
    assert(s == "mail <EMAIL> and <EMAIL> now")
  }

  test("ipv4 scrubbed; dotted digits do not leak into the digit-run pass") {
    val (e, ip, num, s) = scrubOne("host 10.0.255.1 and 192.168.0.12 up")
    assert((e, ip, num) == (0L, 2L, 0L))
    assert(s == "host <IP> and <IP> up")
  }

  test("digit runs ≥9 scrubbed; short runs kept") {
    val (e, ip, num, s) = scrubOne("call 5551234567 ext 12345 code 123456789")
    assert((e, ip, num) == (0L, 0L, 2L))
    assert(s == "call <NUM> ext 12345 code <NUM>")
  }

  test("pass order: an email's digits/dots are gone before ip/num run") {
    // the email local part contains a 10-digit run and the domain is
    // dotted-digit-shaped; scrubbed first, neither later pass fires
    val (e, ip, num, s) = scrubOne("from 5551234567x@mail99.example.com sent")
    assert((e, ip, num) == (1L, 0L, 0L))
    assert(s == "from <EMAIL> sent")
  }

  test("mixed doc counts every family once, tokens never rematch") {
    val (e, ip, num, s) =
      scrubOne("a@b.co at 1.2.3.4 acct 123456789012")
    assert((e, ip, num) == (1L, 1L, 1L))
    assert(s == "<EMAIL> at <IP> acct <NUM>")
  }

  test("pii plans: scrub is map-side up to the output sort; stats aggregates partially") {
    val scrubPlan = Pii.piiScrub(tables).queryExecution.executedPlan.toString
    // the only exchange is the deterministic output sort's range
    // partitioning — the scrub itself never shuffles
    assert("Exchange".r.findAllIn(scrubPlan).length == 1, s"scrub shuffles:\n$scrubPlan")
    assert(scrubPlan.contains("rangepartitioning"), s"unexpected exchange kind:\n$scrubPlan")
    val statsPlan = Pii.piiStats(tables).queryExecution.executedPlan.toString
    // per-source aggregation with map-side partials: two HashAggregates
    // around one source-keyed exchange
    assert("hashpartitioning\\(source#\\d+".r.findFirstIn(statsPlan).isDefined,
      s"stats not keyed on source:\n$statsPlan")
  }

  test("pii_stats aggregates per source over the real corpus") {
    val stats = Pii.piiStats(tables).collect()
    val nDocs = tables.documents.count()
    assert(stats.map(_.getLong(1)).sum == nDocs)
    assert(stats.forall { r =>
      val f = r.getDouble(5); f >= 0.0 && f <= 1.0
    })
  }
}
