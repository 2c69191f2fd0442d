package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  test("DotProduct is bit-identical to the sequential HOF fold") {
    val e = tables.embeddings.limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("x").crossJoin(e.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id"))
    val both = pairs.select(
      VectorFunctions.dot(col("x.v"), col("y.v")).as("native"),
      expr("aggregate(zip_with(x.v, y.v, (p, q) -> p * q), CAST(0 AS DOUBLE), (acc, z) -> acc + z)")
        .as("hof"))
    // exact ==, not tolerance: same fold order must give the same bits
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
  }

  test("DotProduct interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import graft.functions.DotProduct
    val a = Literal.create(Seq(1.0, 2.0, 3.0),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    val b = Literal.create(Seq(4.0, 5.0, 6.0),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    assert(DotProduct(a, b).eval(null) == 32.0)
  }

  test("cosine scoring is the native expression, not interpreted lambdas") {
    val plan = graft.ann.Ann.embedTopK(tables)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction"))
    assert(plan.contains("vec_dot"))
  }

  test("CosineSim is bit-identical to the cosineFromNorms composition") {
    val e = tables.embeddings.limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", VectorFunctions.norm(col("v")))
    val pairs = e.as("x").crossJoin(e.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id"))
    val both = pairs.select(
      VectorFunctions.cosineSim(col("x.v"), col("y.v")).as("fused"),
      VectorFunctions.cosineFromNorms(
        col("x.v"), col("y.v"), col("x.norm"), col("y.norm")).as("composed"))
    // exact ==, not tolerance: same folds, exactly-rounded sqrt/mul/div
    // — the oracle-parity argument for swapping one in for the other
    assert(both.filter(col("fused") =!= col("composed")).count() == 0)
    assert(both.count() > 0)
  }

  test("CosineSim interpreted eval matches codegen and hand math") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.CosineSim
    val at = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    val a = Literal.create(Seq(1.0, 2.0, 3.0), at)
    val b = Literal.create(Seq(4.0, 5.0, 6.0), at)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    // interpreted path (eval); the codegen path is exercised by the
    // DataFrame-level bit-identity test above
    assert(CosineSim(a, b).eval(null) == expected)
  }

  test("CosineSim unequal lengths: norms cover each full array (≡ composition)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.{CosineSim, DotProduct}
    val at = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    val a = Literal.create(Seq(1.0, 2.0, 3.0, 4.0), at)
    val b = Literal.create(Seq(5.0, 6.0), at)
    // the documented contract: vec_dot(a,b) / (sqrt(vec_dot(a,a)) * sqrt(vec_dot(b,b)))
    val composed = DotProduct(a, b).eval(null).asInstanceOf[Double] /
      (math.sqrt(DotProduct(a, a).eval(null).asInstanceOf[Double]) *
        math.sqrt(DotProduct(b, b).eval(null).asInstanceOf[Double]))
    assert(CosineSim(a, b).eval(null) == composed)
    assert(CosineSim(b, a).eval(null) == composed)
    // and via the DataFrame/codegen path too
    val df = spark.range(1).select(
      graft.functions.VectorFunctions.cosineSim(
        array(lit(1.0), lit(2.0), lit(3.0), lit(4.0)),
        array(lit(5.0), lit(6.0))).as("c"))
    assert(df.head.getDouble(0) == composed)
  }

  test("bucketed ANN probe payload carries no precomputed norm column") {
    // the fused-cosine paths should let Catalyst prune the norm away:
    // no sqrt anywhere in the LSH plan
    val plan = graft.ann.Ann.embedAnnLsh(tables)
      .queryExecution.executedPlan.toString
    assert(plan.contains("cosine_sim"))
    assert(!plan.toLowerCase.contains("sqrt"))
  }

  test("WordShingles is byte-identical to the HOF shingle form") {
    val docs = tables.documents
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .where(size(col("ts")) >= 3)
    val both = docs.select(
      graft.functions.TextFunctions.shingles(col("ts"), 3).as("native"),
      expr(graft.functions.Portable.shingleExpr(3)).as("hof"))
    // exact array equality on every document — the swap-in argument
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
  }

  test("WordShingles edge cases: short input empty, exact window count") {
    import spark.implicits._
    val rows = Seq("a b c d", "a b", "x").toDF("text")
      .select(graft.functions.TextFunctions.shingles(
        split(col("text"), " "), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1) == Seq.empty) // size < n: empty, no phantom windows
    assert(rows(2) == Seq.empty)
  }

  test("shingle projection stays in whole-stage codegen (no HOF lambda)") {
    val plan = graft.dedup.Dedup.dedupMinhash(tables)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction"),
      plan.linesIterator.filter(_.contains("lambda")).take(3).mkString("\n"))
    assert(plan.contains("word_shingles"))
  }

  test("SimHash48 equals the count-weighted groupBy signature on real docs") {
    // the definitional form the DuckDB oracle still computes: tokenize,
    // count per (doc, token), hex-parse md5, 48 count-weighted bit
    // sums, sign-pack — rebuilt here verbatim as the reference
    val bits = graft.dedup.Dedup.SimhashBits
    val nHex = bits / 4
    def hexDigit(i: Int) =
      s"(ascii(substring(h, $i, 1)) - 48 - 39 * " +
        s"(CASE WHEN ascii(substring(h, $i, 1)) >= 97 THEN 1 ELSE 0 END))"
    val hv = (1 to nHex).map(i => s"${hexDigit(i)} * ${1L << (4 * (nHex - i))}L")
      .mkString(" + ")
    val sumCols = (0 until bits).map(i => expr(
      s"sum(cnt * (CASE WHEN (hv div ${1L << i}L) % 2 = 1 THEN 1 ELSE -1 END)) AS s$i"))
    val simhash = (0 until bits).map(i =>
      s"(CASE WHEN s$i > 0 THEN ${1L << i}L ELSE 0L END)").mkString(" + ")
    val reference = tables.documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", md5(col("w")))
      .withColumn("hv", expr(hv))
      .groupBy(col("doc_id"))
      .agg(sumCols.head, sumCols.tail: _*)
      .select(col("doc_id"), expr(s"CAST($simhash AS BIGINT)").as("ref"))
    val native = graft.dedup.Dedup.simhashSignatures(tables)
    val joined = native.join(reference, Seq("doc_id"))
    assert(joined.count() == tables.documents.count())
    assert(joined.filter(col("simhash") =!= col("ref")).count() == 0)
  }

  test("SimHash48 interpreted eval matches codegen; signature plan has no shuffle") {
    import spark.implicits._
    val df = Seq("a b a c", "x", "").toDF("text")
      .select(graft.functions.TextFunctions.simhash48(
        split(col("text"), " ")).as("sig"))
    val codegen = df.collect().map(_.getLong(0))
    val interpreted = df.collect().map { _ => 0L } // placeholder replaced below
    val rows = Seq("a b a c", "x", "").map { text =>
      val toks = text.split(" ")
      graft.functions.SimHash48.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          toks.map(org.apache.spark.unsafe.types.UTF8String.fromString)))
    }
    assert(codegen.toSeq == rows)
    // the 100 TB property: the signature is a scan-side projection —
    // zero exchanges anywhere below the band join's store
    val plan = graft.dedup.Dedup.simhashSignatures(tables)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      plan.linesIterator.filter(_.contains("Exchange")).take(3).mkString("\n"))
    assert(plan.contains("simhash48"))
  }

  test("dedup_embedding self-join payload carries no precomputed norm either") {
    val plan = graft.dedup.Dedup.dedupEmbedding(tables)
      .queryExecution.executedPlan.toString
    assert(plan.contains("cosine_sim"))
    assert(!plan.toLowerCase.contains("sqrt"))
  }

  test("WindowHashes is byte-identical to the definitional HOF window form") {
    import graft.dedup.Substring
    val k = Substring.SpanK
    val docs = tables.documents
      .where(size(split(col("text"), " ")) >= k).limit(300)
    val both = docs.select(
      Substring.windowPairs(col("text"), k).as("native"),
      Substring.windowPairsHof(col("text"), k).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
  }

  test("WindowHashes interpreted eval matches codegen and hand md5; short input empty") {
    import graft.functions.WindowHashes
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val toks = Literal.create(Seq("a", "b", "c"), ArrayType(StringType))
    val r = WindowHashes(toks, 2).eval(null).asInstanceOf[ArrayData]
    assert(r.numElements() == 2)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val row0 = r.getStruct(0, 2)
    assert(row0.getLong(0) == 0L)
    assert(row0.getUTF8String(1).toString == md5hex("a b"))
    val row1 = r.getStruct(1, 2)
    assert(row1.getLong(0) == 1L)
    assert(row1.getUTF8String(1).toString == md5hex("b c"))
    val short = WindowHashes(toks, 4).eval(null).asInstanceOf[ArrayData]
    assert(short.numElements() == 0)
  }

  test("WindowHashes null tokens: no NPE, byte-identical to concat_ws's null-skip") {
    // windowHashes is a general Column API whose declared input type
    // allows containsNull = true; a null element must hash exactly as
    // the HOF reference form does — concat_ws skips nulls AND their
    // separator (ADVICE r16: the native loop used to NPE)
    import graft.functions.WindowHashes
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = Literal.create(Seq("a", null, "c", "d"),
      ArrayType(StringType, containsNull = true))
    val r = WindowHashes(toks, 3).eval(null).asInstanceOf[ArrayData]
    assert(r.numElements() == 2)
    assert(r.getStruct(0, 2).getUTF8String(1).toString == md5hex("a c"))
    assert(r.getStruct(1, 2).getUTF8String(1).toString == md5hex("c d"))
    // and through the Column API against the HOF form, codegen path
    val df = spark.range(1).select(
      array(lit("a"), lit(null).cast("string"), lit("c"), lit("d")).as("ts"))
    val native = df.select(
      graft.functions.TextFunctions.windowHashes(col("ts"), 3).as("w"))
      .head.getSeq[org.apache.spark.sql.Row](0)
    val hof = df.select(flatten(transform(array(col("ts")),
      ts => transform(sequence(lit(0), size(ts) - 3),
        i => struct(i.cast("long").as("pos"),
          md5(concat_ws(" ", slice(ts, i + lit(1), lit(3)))).as("h")))))
      .as("w")).head.getSeq[org.apache.spark.sql.Row](0)
    assert(native == hof, s"native $native vs hof $hof")
  }

  test("span plans run the native window expression, no interpreted lambda") {
    val plan = graft.dedup.Substring.substringSpans(tables)
      .queryExecution.executedPlan.toString
    assert(plan.contains("window_hashes"), "native expression missing")
    assert(!plan.contains("lambdafunction"),
      "interpreted HOF lambda back on the span path")
  }

  test("HashFeatureVec: interpreted eval ≡ codegen ≡ hand md5; null skipped; dims boundary") {
    import graft.functions.HashFeatureVec
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val dims = 8
    // hand model: bucket = first 4 md5 bytes big-endian mod dims,
    // sign = 9th hex digit's (byte 4 high nibble's) low bit
    def hand(tokens: Seq[String]): Seq[Double] = {
      val v = new Array[Double](dims)
      tokens.filter(_ != null).foreach { w =>
        val dg = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8"))
        var hv = 0L
        (0 until 4).foreach(b => hv = (hv << 8) | (dg(b) & 0xffL))
        v((hv % dims).toInt) += (if (((dg(4) >> 4) & 1) == 1) 1.0 else -1.0)
      }
      v.toSeq
    }
    val toks = Seq("alpha", null, "beta", "alpha")
    // interpreted eval (null element skipped, no NPE)
    val lit0 = Literal.create(toks, ArrayType(StringType, containsNull = true))
    val ev = HashFeatureVec(lit0, dims).eval(null).asInstanceOf[ArrayData]
    assert(ev.toDoubleArray().toSeq == hand(toks))
    // codegen path through the Column API — byte-identical to eval
    val viaDf = spark.range(1).select(
      graft.functions.TextFunctions.hashFeatureVec(
        array(lit("alpha"), lit(null).cast("string"), lit("beta"),
          lit("alpha")), dims).as("v"))
      .head.getSeq[Double](0)
    assert(viaDf == hand(toks))
    // dims boundary: every bucket index lands inside [0, dims) even at
    // dims = 1 (all mass in one cell), and the cell sums signs
    val one = HashFeatureVec(lit0, 1).eval(null).asInstanceOf[ArrayData]
    assert(one.numElements() == 1)
    assert(one.getDouble(0) == hand(toks).sum)
  }

  test("SrpWord16: interpreted eval ≡ codegen ≡ JVM hyperplane recompute") {
    import graft.functions.{SrpMatrix, SrpWord16}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val dims = 64
    val v = (0 until dims).map(d => ((d * 7) % 5 - 2).toDouble)
    // hand model straight off the matrix definition
    def hand(table: Int): Long = {
      var word = 0L
      (0 until SrpWord16.Bits).foreach { i =>
        val s = (0 until dims)
          .map(d => SrpMatrix.entry(table, i, d) * v(d)).sum
        word = (word << 1) | (if (s > 0) 1L else 0L)
      }
      word
    }
    val lit0 = Literal.create(v, ArrayType(DoubleType, containsNull = false))
    (0 until 4).foreach { j =>
      assert(SrpWord16(lit0, j).eval(null) == hand(j), s"table $j eval")
    }
    // codegen path through the Column API
    val row = spark.range(1)
      .select(array(v.map(lit): _*).as("v"))
      .select((0 until 4).map(j =>
        graft.functions.TextFunctions.srpWord16(col("v"), j).as(s"w$j")): _*)
      .head
    (0 until 4).foreach(j => assert(row.getLong(j) == hand(j), s"table $j codegen"))
    // distinct tables use distinct hyperplanes (the OR-amplification
    // premise): at least one word differs across tables for this v
    assert((0 until 4).map(hand).distinct.size > 1)
  }

  test("OrderStat leaves a caller-persisted counts frame cached; pins only its own") {
    import spark.implicits._
    import graft.functions.OrderStat
    import org.apache.spark.storage.StorageLevel
    val counts = (1 to 100).map(i => ("g", i.toDouble, 1L))
      .toDF("g", "v", "cnt")
    val target = OrderStat.RankTarget("g", 10)

    // caller-persisted: the call must answer AND leave the cache alive
    val mine = counts.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      assert(OrderStat.valuesAtDescRanks(mine, Seq(target))(target) == 91.0)
      assert(mine.storageLevel == StorageLevel.MEMORY_AND_DISK,
        "the caller's cache was evicted mid-lifetime")
    } finally mine.unpersist()

    // unpersisted input: the loop's own pin is released after the call
    val fresh = (1 to 100).map(i => ("g", i.toDouble, 1L))
      .toDF("g", "v", "cnt")
    assert(OrderStat.valuesAtDescRanks(fresh, Seq(target))(target) == 91.0)
    assert(fresh.storageLevel == StorageLevel.NONE,
      "OrderStat leaked its internal pin")
  }

  test("OrderStat.searchWithTotals: totals ≡ seed sums, values ≡ plain search, empty targets skip") {
    import spark.implicits._
    import graft.functions.OrderStat
    val counts = ((1 to 100).map(i => ("a", i.toDouble, 2L)) ++
      (1 to 5).map(i => ("b", i.toDouble, 1L)))
      .toDF("g", "v", "cnt")
    val (totals, vals) = OrderStat.searchWithTotals(counts) { ns =>
      assert(ns == Map("a" -> 200L, "b" -> 5L))
      Seq(OrderStat.RankTarget("a", 20), OrderStat.RankTarget("b", 1))
    }
    assert(totals == Map("a" -> 200L, "b" -> 5L))
    // rank 20 of 200 descending with multiplicity 2 per value → value 91
    assert(vals(OrderStat.RankTarget("a", 20)) == 91.0)
    assert(vals(OrderStat.RankTarget("b", 1)) == 5.0)
    // empty target list: totals still come back, no search runs
    val (t2, v2) = OrderStat.searchWithTotals(counts)(_ => Seq.empty)
    assert(t2("a") == 200L && v2.isEmpty)
  }

  test("BoundedMinK ≡ slice(array_sort(collect_list), 1, k) on structs with vector payloads") {
    import spark.implicits._
    import graft.functions.BoundedMinK.boundedMinK
    // groups larger and smaller than k; struct members carry an
    // array<double> payload exactly like the semdup trim's (h, v); the
    // shuffle between partial and final aggregation exercises the
    // buffer serialize/deserialize round trip
    val rows = (1 to 500).map { i =>
      (s"g${i % 3}", i.toLong, i % 7, s"h$i", Seq(i.toDouble, -i.toDouble))
    } ++ Seq(("tiny", 1L, 0, "x", Seq(0.0)))
    val df = rows.toDF("g", "doc_id", "chunk_idx", "h", "v")
      .repartition(7)
    val mem = struct(col("doc_id"), col("chunk_idx"), col("h"), col("v"))
    val both = df.groupBy(col("g")).agg(
      slice(array_sort(collect_list(mem)), 1, 32).as("ref"),
      boundedMinK(mem, 32).as("got"))
    assert(both.filter(not(col("ref") <=> col("got"))).count() == 0)
    assert(both.count() == 4)
    // strings too (the pair-evidence sample shape), incl. k > group
    val s = Seq(("a", "zz"), ("a", "aa"), ("a", "mm"), ("b", "q"))
      .toDF("g", "s")
    val r = s.groupBy(col("g")).agg(
      slice(sort_array(collect_list(col("s"))), 1, 2).as("ref"),
      boundedMinK(col("s"), 2).as("got"))
    assert(r.filter(not(col("ref") <=> col("got"))).count() == 0)
    // null inputs are skipped like collect_list
    val n = Seq(("a", Some("x")), ("a", None), ("b", None))
      .toDF("g", "s")
    val rn = n.groupBy(col("g")).agg(
      slice(sort_array(collect_list(col("s"))), 1, 2).as("ref"),
      boundedMinK(col("s"), 2).as("got"))
    assert(rn.filter(not(col("ref") <=> col("got"))).count() == 0)
  }
}
