package graft

class ExtensionsSpec extends SparkSpec {

  test("vec_dot is callable from SQL via GraftExtensions") {
    // GraftSession.tuned sets spark.sql.extensions=graft.GraftExtensions;
    // the shared test session goes through GraftSession.local
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r == 32.0)
  }

  test("vec_dot over the embeddings table in pure SQL") {
    tables.embeddings.createOrReplaceTempView("emb")
    val n = spark.sql(
      """SELECT vec_id,
        |  vec_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS sq_norm
        |FROM emb""".stripMargin)
      .filter("sq_norm > 0.99 AND sq_norm < 1.01").count()
    assert(n == tables.embeddings.count()) // unit-norm vectors
  }

  test("cosine_sim is callable from SQL and auto-casts float arrays") {
    tables.embeddings.createOrReplaceTempView("emb")
    // exact value on literals: 32 / (sqrt(14) * sqrt(77))
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS c")
      .collect().head.getDouble(0)
    assert(r == 32.0 / (math.sqrt(14.0) * math.sqrt(77.0)))
    // self-cosine of any non-zero vector is 1 up to rounding; no
    // explicit CAST — the registered builder casts array<float>
    val n = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb")
      .filter("c > 0.999999 AND c < 1.000001").count()
    assert(n == tables.embeddings.count())
  }

  test("vec_dot auto-casts raw float arrays (the obvious SQL call is correct)") {
    tables.embeddings.createOrReplaceTempView("emb")
    // no explicit CAST: the registered builder casts array<float> →
    // array<double>; without it getDouble over float elements reads garbage
    val n = spark.sql(
      "SELECT vec_dot(embedding, embedding) AS sq_norm FROM emb")
      .filter("sq_norm > 0.99 AND sq_norm < 1.01").count()
    assert(n == tables.embeddings.count())
  }
}
