package graft

import graft.dedup.Dedup
import graft.pipeline.CorpusClean

class PipelineSpec extends SparkSpec {

  test("corpus_clean_neardup = corpus_clean minus minhash pair losers, exactly") {
    val base = CorpusClean.corpusClean(tables).collect()
      .map(_.getLong(0)).toSet
    val losers = Dedup.dedupMinhash(tables).collect()
      .map(_.getLong(1)).toSet
    val got = CorpusClean.corpusCleanNearDup(tables).collect()
      .map(_.getLong(0)).toSet
    assert(got == (base -- losers))
    // the pipeline actually removes something at this sf (planted
    // near-dups that survive the exact-dedup + quality gates)
    assert(got.size < base.size, "near-dup stage removed nothing")
  }

  test("corpus_clean_clustered = corpus_clean minus cluster non-keepers, exactly") {
    val base = CorpusClean.corpusClean(tables).collect()
      .map(_.getLong(0)).toSet
    val nonKeepers = Dedup.nearDupClusters(tables).collect()
      .filter(r => r.getLong(0) != r.getLong(1)).map(_.getLong(0)).toSet
    val got = CorpusClean.corpusCleanClustered(tables).collect()
      .map(_.getLong(0)).toSet
    assert(got == (base -- nonKeepers))
    assert(got.size < base.size, "cluster stage removed nothing")
    // chain correctness: at most one survivor per cluster
    val cluster = Dedup.nearDupClusters(tables).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perCluster = got.toSeq.flatMap(cluster.get).groupBy(identity)
    perCluster.foreach { case (k, docs) =>
      assert(docs.size <= 1, s"cluster $k kept ${docs.size} docs")
    }
  }

  test("quality_repetition flags planted self-repetitive docs, keeps normal text") {
    import spark.implicits._
    import graft.textanalysis.TextAnalysis
    val docs = Seq(
      // "buy now" × 12: top bigram ("now buy"/"buy now") covers ~half
      // the stream; dup fraction near 1 — both gates trip
      (1L, Seq.fill(12)("buy now").mkString(" ")),
      // all-distinct bigrams: fractions at their floors — keeps
      (2L, "the quick brown fox jumps over a lazy dog"),
      (3L, "one two")) // single bigram: top frac 1.0 — trips
    val dir = java.nio.file.Files.createTempDirectory("graft_rep").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.qualityRepetition(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(4))).toMap
    // doc 1: 23 bigrams, "buy now" ×12, "now buy" ×11 → top 12/23,
    // dup (23-2)/23; both over threshold → keep 0
    assert(rows(1L)._1 == 23L)
    assert(rows(1L)._2 == math.floor(12.0 / 23 * 1e6 + 0.5) / 1e6)
    assert(rows(1L)._4 == 0)
    // doc 2: 8 distinct bigrams of 8 → top 1/8 = 0.125, dup 0 → keep 1
    assert(rows(2L) == ((8L, 0.125, 0.0, 1)))
    // doc 3: one bigram → top frac 1.0 → keep 0
    assert(rows(3L) == ((1L, 1.0, 0.0, 0)))
  }

  test("tfidf_top_terms surfaces a doc's planted rare term over stop words") {
    import spark.implicits._
    import graft.textanalysis.TextAnalysis
    // "the" appears in every doc (df 3, high tf) — a term unique to one
    // doc (df 1) must outrank it for that doc even at lower tf
    val docs = Seq(
      (1L, "the cat and the dog and the cat zygote"),
      (2L, "the cat and the dog"),
      (3L, "the dog and the dog"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tfidf").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.tfidfTopTerms(Tables(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getInt(5)) -> (r.getString(1), r.getDouble(4)))
      .toMap
    // doc 1: zygote tf=1 df=1 → 1.0 beats the tf=3 df=3 → 1.0? tie →
    // term tiebreak puts "the" first... check actual: cat tf=2 df=2 →
    // 1.0 too. ties broken by term asc: (cat, the, zygote) all 1.0
    assert(rows((1L, 1))._2 == 1.0)
    val doc1Terms = (1 to 3).map(k => rows((1L, k))._1).toSet
    assert(doc1Terms == Set("cat", "the", "zygote"))
    // doc 3: "dog" tf=2 df=3 → 0.666667; "the" tf=2 df=3 tie; "and"
    // tf=1 df=3 → 0.333333: rank1 dog (term asc beats the), rank3 and
    assert(rows((3L, 1)) == (("dog", math.floor(2.0 / 3 * 1e6 + 0.5) / 1e6)))
    assert(rows((3L, 2))._1 == "the")
    assert(rows((3L, 3))._1 == "and")
  }

  test("text_collocations: planted phrase lifts compute exactly; sub-floor pairs are cut") {
    import spark.implicits._
    import graft.textanalysis.TextAnalysis
    // corpus: nu=15 tokens, nbi=13 bigrams; every unigram count is 3
    // pairs at the c12>=3 floor: new>york, a>b, b>c (york>new and c>a
    // are 2 — cut); lift = 3·15²/(13·3·3) = 675/117 for all three
    val docs = Seq(
      (1L, "new york new york new york"),
      (2L, "a b c a b c a b c"))
    val dir = java.nio.file.Files.createTempDirectory("graft_colloc").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.textCollocations(Tables(spark, dir)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val lift = math.floor(675.0 / 117.0 * 1e6 + 0.5).toLong
    assert(rows.toSeq == Seq(
      ("a", "b", 3L, lift), ("b", "c", 3L, lift),
      ("new", "york", 3L, lift)),
      s"got ${rows.toSeq}")
  }

  test("text_collocations: real corpus — partial top-k plan, floor respected, ranked") {
    import graft.textanalysis.TextAnalysis
    val df = TextAnalysis.textCollocations(tables)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no partial top-k:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= TextAnalysis.CollocTopK)
    assert(rows.forall(_.getLong(2) >= TextAnalysis.CollocMinPairCount))
    val lifts = rows.map(_.getLong(3)).toSeq
    assert(lifts == lifts.sorted.reverse)
  }

  test("near-dup removal is one anti join over the clean plan") {
    val plan = CorpusClean.corpusCleanNearDup(tables)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.linesIterator.take(8).mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("mix: stratified sample keeps non-en whole and en partial, deterministically") {
    import graft.pipeline.Mixing
    val s1 = Mixing.sampleStratified(tables).collect()
    val s2 = Mixing.sampleStratified(tables).collect()
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq) // identity hash, no RNG
    val total = tables.documents.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = s1.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    for ((l, n) <- total if l != "en")
      assert(kept.getOrElse(l, 0L) == n, s"non-en lang $l was sampled")
    assert(kept("en") < total("en"), "en not downsampled")
    assert(kept("en") > 0L)
  }

  test("mix: split covers every doc and is stable under corpus growth") {
    import graft.pipeline.Mixing
    import spark.implicits._
    val full = Mixing.corpusSplit(tables).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(full.length == tables.documents.count())
    val trainFrac = full.count(_._2 == "train").toDouble / full.length
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train frac $trainFrac")
    assert(full.map(_._2).toSet == Set("train", "val", "test"))
    // the leakage property: a HALF corpus assigns the same splits to
    // the docs it shares with the full corpus — adding data later can
    // never migrate an old doc into (or out of) the test set
    val half = tables.documents.select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).take(full.length / 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_mixhalf").toString
    half.toSeq.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val halfSplit = Mixing.corpusSplit(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    full.filter(p => halfSplit.contains(p._1)).foreach { case (id, s) =>
      assert(halfSplit(id) == s, s"doc $id migrated: ${halfSplit(id)} vs $s")
    }
  }

  test("mix: bounded ccnet = ntile away from boundary ties; no per-lang window in plan") {
    import graft.pipeline.Mixing
    val nt = Mixing.ccnetBucket(tables).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getString(3)))
    val bd = Mixing.ccnetBucketBounded(tables).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getString(3)))
      .toMap
    assert(nt.length == bd.size)
    // the cut VALUES, from first principles: per lang, sort scores
    // desc, read positions c1 and c12
    val cuts = nt.groupBy(_._2._1).map { case (lang, rs) =>
      val scores = rs.map(_._2._2).sorted(Ordering[Double].reverse)
      val (c1, c12) = Mixing.tercileCuts(scores.length.toLong)
      lang -> ((scores(c1.toInt - 1), scores(c12.toInt - 1)))
    }
    var away = 0
    nt.foreach { case (id, (lang, score, bucket)) =>
      val (s1, s2) = cuts(lang)
      assert(bd(id)._1 == lang && bd(id)._2 == score)
      if (score != s1 && score != s2) { // away from both boundaries
        assert(bd(id)._3 == bucket, s"doc $id: bounded ${bd(id)._3} vs ntile $bucket")
        away += 1
      } else {
        // AT a boundary: ties group UP (>= comparison)
        val want = if (score >= s1) "head" else "middle"
        assert(bd(id)._3 == want, s"doc $id at boundary: ${bd(id)._3} vs $want")
      }
    }
    assert(away > nt.length / 2, "test degenerate: most docs sat on a boundary")
    // the scale property the twin exists for: no per-language window
    // (single-task sort) anywhere in the bounded plan
    val plan = Mixing.ccnetBucketBounded(tables)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), plan.linesIterator.take(8).mkString("\n"))
  }

  test("mix: bounded ccnet groups a planted boundary tie into the higher bucket") {
    import graft.pipeline.Mixing
    import spark.implicits._
    // one lang, 5 docs: 4 identical + 1 distinct. The 4 copies occupy
    // 4 consecutive ranks of 5, so both ntile cuts (ranks 2 and 4)
    // land INSIDE the tie group wherever the distinct doc sorts —
    // ntile must split the copies, bounded must keep them together.
    val tie = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, "aa", tie), (2L, "aa", tie), (3L, "aa", tie), (4L, "aa", tie),
      (5L, "aa", "completely different words make another bigram profile"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ccnet_tie").toString
    docs.toDF("doc_id", "lang", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val tt = Tables(spark, dir)
    val nt = Mixing.ccnetBucket(tt).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val bd = Mixing.ccnetBucketBounded(tt).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val copies = Seq(1L, 2L, 3L, 4L)
    assert(nt.values.toSet.size > 1) // ntile split SOMETHING
    assert(copies.map(nt).toSet.size > 1, "ntile kept the tie group whole — test degenerate")
    assert(copies.map(bd).toSet.size == 1, s"bounded split a tie group: $bd")
    // ties take the HIGHER bucket; the distinct doc keeps a bucket
    // consistent with its side of the boundary
    val tieBucket = bd(copies.head)
    val other = bd(5L)
    assert(Set("head", "middle", "tail")(tieBucket) && Set("head", "middle", "tail")(other))
    assert(tieBucket != other || nt(5L) == tieBucket)
  }

  test("mix: ccnet weighted sample keeps all of head, thins the tail, deterministically") {
    import graft.pipeline.Mixing
    val buckets = Mixing.ccnetBucketBounded(tables).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val s1 = Mixing.sampleCcnet(tables).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val s2 = Mixing.sampleCcnet(tables).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(s1.toSeq == s2.toSeq) // identity hash, no RNG
    val kept = s1.map(_._1).toSet
    // rate 1.0: every head doc survives; the sampled bucket column
    // matches the bucketing op exactly
    val headDocs = buckets.collect { case (id, "head") => id }.toSet
    assert(headDocs.subsetOf(kept), s"head docs dropped: ${headDocs -- kept}")
    s1.foreach { case (id, b) => assert(buckets(id) == b, s"doc $id bucket drift") }
    // tail is genuinely thinned (rate 0.3 over enough docs)
    val tailDocs = buckets.collect { case (id, "tail") => id }.toSet
    assert((tailDocs & kept).size < tailDocs.size, "tail not downsampled")
    assert((tailDocs & kept).nonEmpty, "tail entirely dropped")
  }

  test("mix: temperature sample keeps the rarest language whole, thins by share, deterministically") {
    import graft.pipeline.Mixing
    val shares = tables.documents.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s1 = Mixing.sampleTemperature(tables).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getString(r.fieldIndex("lang")),
        r.getDouble(r.fieldIndex("rate"))))
    val s2 = Mixing.sampleTemperature(tables).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")))
    assert(s1.map(_._1).toSeq == s2.toSeq) // identity hash, no RNG
    // rarest language: rate exactly 1.0, every doc kept
    val rarest = shares.minBy(r => (r._2, r._1))._1
    val rateOf = s1.map(r => r._2 -> r._3).toMap
    assert(rateOf(rarest) == 1.0, s"rarest lang $rarest rate ${rateOf(rarest)}")
    assert(s1.count(_._2 == rarest).toLong == shares(rarest))
    // monotone: a more common language never gets a higher rate
    val langs = rateOf.keys.toSeq
    for (a <- langs; b <- langs if shares(a) < shares(b))
      assert(rateOf(a) >= rateOf(b), s"rate($a) < rate($b) despite smaller share")
    // dominant language genuinely thinned
    val top = shares.maxBy(_._2)._1
    assert(s1.count(_._2 == top).toLong < shares(top), "top lang not thinned")
  }

  test("mix: quality deciles = ntile(10) away from boundary ties; ties take the higher bucket") {
    import graft.pipeline.Mixing
    val rows = Mixing.qualityDecile(tables).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, _, d) => d >= 1 && d <= 10 })
    // first-principles cuts: per lang, sort scores desc, read the 9
    // ntile cut positions; then replay both the ntile assignment and
    // the ties-up boundary rule
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val desc = rs.map(_._3).sorted(Ordering[Double].reverse)
      val n = desc.length.toLong
      val cuts = Mixing.quantileCutRanks(n, 10).map(r => desc(r.toInt - 1))
      // ntile decile by rank under (score desc, doc_id)
      val ranked = rs.sortBy(t => (-t._3, t._1)).zipWithIndex
      val ntOf = ranked.map { case ((id, _, _, _), idx) =>
        val rank = idx + 1L
        id -> (1L + Mixing.quantileCutRanks(n, 10).count(_ < rank))
      }.toMap
      rs.foreach { case (id, _, score, dec) =>
        val want = 1L + cuts.count(score < _)
        assert(dec == want, s"doc $id: decile $dec vs boundary-rule $want")
        if (!cuts.contains(score)) // away from every boundary: ≡ ntile
          assert(dec == ntOf(id), s"doc $id: decile $dec vs ntile ${ntOf(id)}")
      }
      // deciles are score-ordered: every doc in a better decile scores
      // at least as high as any doc in a worse one
      val byDec = rs.groupBy(_._4)
      byDec.keys.toSeq.sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(byDec(a).map(_._3).min >= byDec(b).map(_._3).max)
        case _ =>
      }
    }
    // scale property: no per-language window sort in the plan
    val plan = Mixing.qualityDecile(tables).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "decile plan contains a Window sort")
  }

  test("mix: ccnet terciles are balanced per language and ordered by score") {
    import graft.pipeline.Mixing
    val rows = Mixing.ccnetBucket(tables).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_._4).view.mapValues(_.size).toMap
      val counts = Seq("head", "middle", "tail").map(sizes.getOrElse(_, 0))
      assert(counts.max - counts.min <= 1,
        s"$lang terciles unbalanced: $sizes")
      // bucket boundaries respect the score order (ties may straddle)
      def scores(b: String) = rs.filter(_._4 == b).map(_._3)
      if (scores("head").nonEmpty && scores("middle").nonEmpty)
        assert(scores("head").min >= scores("middle").max - 1e-9, lang)
      if (scores("middle").nonEmpty && scores("tail").nonEmpty)
        assert(scores("middle").min >= scores("tail").max - 1e-9, lang)
    }
  }

  test("mix: rebucket delta emits ONLY the moved language's docs; unchanged boundaries emit zero rows") {
    import org.apache.spark.sql.functions._
    import graft.pipeline.Mixing
    val bounds = Mixing.ccnetBounds(tables).cache()
    // identical old and new → no doc moved, by definition
    assert(Mixing.rebucketDeltaBounds(tables, bounds, bounds).isEmpty)
    // doctor exactly ONE language: s1 pushed above every score, so its
    // former head docs all become middle — every other language's
    // boundary rows are byte-identical and must emit NOTHING
    val langs = bounds.select("lang").collect().map(_.getString(0)).sorted
    assert(langs.length >= 2, "need >=2 languages for the zero-rows pin")
    val moved = langs.head
    val doctored = bounds.withColumn("s1",
      when(col("lang") === moved, lit(1e18)).otherwise(col("s1")))
    val delta = Mixing.rebucketDeltaBounds(tables, bounds, doctored)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(3), r.getString(4)))
    assert(delta.nonEmpty, s"no $moved doc moved under an s1 above every score")
    assert(delta.forall(_._2 == moved),
      s"unchanged-boundary language emitted rows: ${delta.filter(_._2 != moved).take(3).toSeq}")
    // the moves are exactly head → middle (s1 unreachable, s2 kept)
    delta.foreach { case (id, _, o, n) =>
      assert(o == "head" && n == "middle", s"doc $id moved $o→$n")
    }
    // and they are exactly the language's former head set
    val formerHead = Mixing.ccnetBucketBounded(tables).collect()
      .filter(r => r.getString(1) == moved && r.getString(3) == "head")
      .map(_.getLong(0)).toSet
    assert(delta.map(_._1).toSet == formerHead)
    bounds.unpersist()
  }

  test("mix: rebucket delta between BoundsStore generations ≡ the bounds form; novel language moves from unbucketed") {
    import org.apache.spark.sql.functions._
    import graft.pipeline.Mixing
    import graft.storage.BoundsStore
    val root = java.nio.file.Files.createTempDirectory("graft_rebucket_gens")
      .toString
    val bounds = Mixing.ccnetBounds(tables)
    val langs = bounds.select("lang").collect().map(_.getString(0)).sorted
    // gen 0 MISSES one language (the pre-growth corpus had none of its
    // docs); gen 1 is the full batch table
    val novel = langs.last
    assert(BoundsStore.publishGeneration(spark, root,
      bounds.filter(col("lang") =!= novel)) == 0L)
    assert(BoundsStore.publishFrom(tables, root) == 1L)
    val viaGens = Mixing.rebucketDeltaGens(tables, root, 0L, 1L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3), r.getString(4)))
    val viaBounds = Mixing.rebucketDeltaBounds(tables,
      BoundsStore.readBounds(spark, root, 0L),
      BoundsStore.readBounds(spark, root, 1L)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3), r.getString(4)))
    assert(viaGens.toSeq == viaBounds.toSeq)
    // the delta is exactly the novel language's docs, unbucketed → a
    // real bucket: the docs the sampler must now coin for the first time
    assert(viaGens.nonEmpty && viaGens.forall(_._2 == novel))
    viaGens.foreach { case (id, _, o, n) =>
      assert(o == "unbucketed" && Set("head", "middle", "tail")(n),
        s"doc $id moved $o→$n")
    }
    val novelDocs = Mixing.ccnetBucketBounded(tables).collect()
      .filter(_.getString(1) == novel).map(_.getLong(0)).toSet
    assert(viaGens.map(_._1).toSet == novelDocs)
  }

  test("mix: re-coining exactly the rebucket-delta docs reproduces the full new-bounds sample") {
    import org.apache.spark.sql.functions._
    import graft.pipeline.Mixing
    // old sample decision per doc under OLD bounds (prefix-half), new
    // under NEW (full) — the incremental update the delta exists for:
    // patch only the moved docs' decisions, leave the rest untouched
    val scores = Mixing.ccnetBucketBounded(tables)
      .select(col("doc_id"), col("lang"), col("lm_score")).cache()
    val cutoff = tables.documents.agg(max(col("doc_id"))).head.getLong(0) / 2
    val oldBounds = Mixing.ccnetBoundsOf(scores.filter(col("doc_id") <= cutoff))
    def sampleUnder(bounds: org.apache.spark.sql.DataFrame): Set[Long] = {
      val rate = Mixing.CcnetRates.foldLeft(lit(0.0): org.apache.spark.sql.Column) {
        case (acc, (b, r)) => when(col("bucket") === b, lit(r)).otherwise(acc)
      }
      scores.join(broadcast(bounds), Seq("lang"), "left")
        .select(col("doc_id"),
          Mixing.bucketExprOn(col("s1"), col("s2")).as("bucket"))
        .withColumn("u", Mixing.u("ccn", col("doc_id")))
        .filter(col("u") < rate)
        .collect().map(_.getLong(0)).toSet
    }
    val oldKeep = sampleUnder(oldBounds)
    val newKeep = sampleUnder(Mixing.ccnetBounds(tables))
    val delta = Mixing.rebucketDelta(tables).collect()
      .map(r => (r.getLong(0), r.getString(4))).toMap
    assert(delta.nonEmpty, "prefix-half vs full bounds moved no doc at this sf")
    val rates = Mixing.CcnetRates.toMap
    val patched = (oldKeep -- delta.keySet) ++ delta.collect {
      case (id, bNew) if ccnUnder(id) < rates.getOrElse(bNew, 0.0) => id
    }
    assert(patched == newKeep,
      s"patched-only-moved-docs drifted: extra ${patched -- newKeep}, missing ${newKeep -- patched}")
    scores.unpersist()
  }

  /** The ccn identity coin, host-side (mirrors Mixing.u). */
  private def ccnUnder(id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"ccn|$id".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  test("mix: fixed sample = exactly N docs ≡ the naive global sort-limit, without paying it") {
    import graft.pipeline.Mixing
    import org.apache.spark.sql.functions._
    val got = Mixing.sampleFixed(tables).collect()
    assert(got.length.toLong == Mixing.SampleFixedN, s"got ${got.length}")
    // bit-identical to the naive ORDER BY (u, doc_id) LIMIT N
    val naive = tables.documents
      .select(col("doc_id"), col("lang"), col("source"))
      .withColumn("u", Mixing.u("fix", col("doc_id")))
      .orderBy(col("u"), col("doc_id")).limit(Mixing.SampleFixedN.toInt)
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_.getLong(0)).toSet == naive)
    // deterministic rerun
    val again = Mixing.sampleFixed(tables).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // the corpus-wide top-N sort the OrderStat threshold exists to
    // avoid never appears: no full-N TakeOrderedAndProject in the plan
    // (the tie branch's limit is the residual quota — a handful)
    val plan = Mixing.sampleFixed(tables)
      .queryExecution.executedPlan.toString
    assert(!plan.contains(s"limit=${Mixing.SampleFixedN}"),
      s"full-N sort-limit in plan:\n$plan")
  }

  test("mix: quota sample = exactly min(Q, n_l) docs per language ≡ the naive per-lang rank") {
    import graft.pipeline.Mixing
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = Mixing.sampleQuota(tables).collect()
    val perLang = tables.documents.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotByLang = got.groupBy(_.getString(1))
      .view.mapValues(_.length.toLong).toMap
    for ((l, n) <- perLang)
      assert(gotByLang.getOrElse(l, 0L) == math.min(Mixing.QuotaN, n),
        s"lang $l: ${gotByLang.getOrElse(l, 0L)} != min(Q, $n)")
    // both branches exercised at this sf: en over quota, others whole
    assert(perLang("en") > Mixing.QuotaN, "fixture drift: en under quota")
    assert(perLang.exists(_._2 <= Mixing.QuotaN), "fixture drift")
    // ≡ the naive per-language row_number rank
    val naive = tables.documents
      .select(col("doc_id"), col("lang"))
      .withColumn("u", Mixing.u("qta", col("doc_id")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("u"), col("doc_id"))))
      .filter(col("rn") <= Mixing.QuotaN)
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_.getLong(0)).toSet == naive)
    // deterministic rerun
    val again = Mixing.sampleQuota(tables).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("mix: priority sample = N smallest u/w with the DLT estimator; heavy docs overrepresented") {
    import graft.pipeline.Mixing
    import graft.functions.Portable.round6Double
    import org.apache.spark.sql.functions._
    val got = Mixing.samplePriority(tables).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(got.length.toLong == Mixing.PriorityN, s"got ${got.length}")

    // JVM model: md5 coin / weight, N smallest by (prio, doc_id),
    // est = round6(max(w, 1/q_{N+1}))
    val docs = tables.documents
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def coin(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"pri|$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(8), 16).toDouble / 4294967296.0
    }
    val prios = docs.map { case (id, w) => (id, w, coin(id) / w.toDouble) }
      .sortBy(p => (p._3, p._1))
    val tau = 1.0 / prios(Mixing.PriorityN.toInt)._3
    val want = prios.take(Mixing.PriorityN.toInt).map { case (id, w, p) =>
      (id, w, p, round6Double(math.max(w.toDouble, tau)))
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq,
      s"priority sample diverges from the JVM model")

    // the DLT property: the 20-doc sample's Σest estimates the CORPUS
    // char total (loose 2x band — N is small by design)
    val totalChars = docs.map(_._2).sum.toDouble
    val est = got.map(_._4).sum
    assert(est > totalChars / 2 && est < totalChars * 2,
      s"DLT estimate $est vs corpus $totalChars outside the 2x band")

    // inclusion ∝ weight: the weighted sample's mean doc must be
    // heavier than the corpus mean (deterministic for the fixed coins)
    val meanSample = got.map(_._2).sum.toDouble / got.length
    val meanCorpus = totalChars / docs.length
    assert(meanSample > meanCorpus,
      s"weighting had no effect: sample mean $meanSample vs $meanCorpus")
  }

  test("mix: block sample audit ≡ JVM cluster model; weights exact integers") {
    import graft.pipeline.Mixing
    import graft.functions.Portable.round6Double
    import org.apache.spark.sql.functions._
    val got = Mixing.sampleBlock(tables).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7),
        r.getDouble(8)))

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def shardOf(id: Long): Int =
      Integer.parseInt(md5hex(s"shard|$id").take(1), 16)
    def shardSel(s: Int): Boolean =
      java.lang.Long.parseLong(md5hex(s"blk|$s").take(8), 16).toDouble /
        4294967296.0 < 1.0 / Mixing.BlockDiv
    val selSet = (0 until graft.pipeline.Reports.NumShards)
      .filter(shardSel).toSet
    // the whole point of an identity coin: the kept shard set is a
    // GLOBAL constant, not per-source — every source reads the same ~¼
    assert(selSet.nonEmpty &&
      selSet.size < graft.pipeline.Reports.NumShards,
      s"degenerate shard selection $selSet")

    val docs = tables.documents
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, ds) =>
      val cells = ds.groupBy(d => shardOf(d._1))
      val selCells = cells.filter(c => selSet.contains(c._1))
      val (sn, sc) = (selCells.values.map(_.length.toLong).sum,
        selCells.values.map(_.map(_._3).sum).sum)
      val (en, ec) = (ds.length.toLong, ds.map(_._3).sum)
      (src, selCells.size.toLong, sn, sn * Mixing.BlockDiv, en,
        sc * Mixing.BlockDiv, ec,
        round6Double(sn.toDouble * Mixing.BlockDiv / en.toDouble),
        round6Double(sc.toDouble * Mixing.BlockDiv / ec.toDouble))
    }
    assert(got.toSeq == want, s"block audit diverges:\ngot  ${got.toSeq}\nwant $want")
    // estimator sanity: per-source ratios live in [0, BlockDiv] by
    // construction (a tiny source CAN land 0.48 or 1.6 — that spread
    // IS the cluster-variance penalty the scaladoc documents); the
    // POOLED corpus estimate is what must land near 1
    got.foreach { case (src, _, _, _, _, _, _, dr, _) =>
      assert(dr >= 0.0 && dr <= Mixing.BlockDiv.toDouble,
        s"$src doc ratio $dr outside the possible range")
    }
    val pooled = got.map(_._4).sum.toDouble / got.map(_._5).sum.toDouble
    assert(pooled > 0.5 && pooled < 2.0,
      s"pooled corpus estimate ratio $pooled outside the 2x band")
  }

  test("mix: block sample plan — one scan, no Expand, no Window") {
    val plan = graft.pipeline.Mixing.sampleBlock(tables)
      .queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"audit must read the corpus once, got $scans")
    assert(!plan.contains("Expand"),
      s"shard counting must not need a distinct Expand:\n$plan")
    assert(!plan.contains("Window"), s"no Window belongs here:\n$plan")
  }

  test("mix: water-fill solver ≡ JVM model; level is the exact feasibility frontier") {
    import org.apache.spark.sql.functions._
    import graft.pipeline.Mixing
    val got = Mixing.mixSolver(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4), r.getLong(5)))
    // independent model: per-source token sums from raw text
    val caps = tables.documents
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
      .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }
    val n = caps.values.sum * Mixing.WaterfillBudgetNum /
      Mixing.WaterfillBudgetDen
    def f(lam: Long) = caps.values.map(c => math.min(c, lam)).sum
    val lamGot = got.head._6
    assert(got.forall(_._6 == lamGot))
    // λ is the exact frontier: feasible at λ, infeasible at λ+1
    assert(f(lamGot) <= n && f(lamGot + 1) > n,
      s"water level $lamGot not maximal: f=${f(lamGot)}, " +
        s"f+1=${f(lamGot + 1)}, n=$n")
    got.foreach { case (src, cap, alloc, sat, rate6, _) =>
      assert(cap == caps(src), s"$src capacity wrong")
      assert(alloc == math.min(cap, lamGot))
      assert(sat == (cap <= lamGot))
      assert(rate6 == graft.functions.Portable.round6Double(
        alloc.toDouble / cap.toDouble))
    }
    // the near-uniform test corpus never saturates at the 1/2 budget
    // (all rates equal-ish) — both decision branches are pinned on a
    // planted skewed corpus below
  }

  test("mix: water-fill on a planted skewed corpus — tiny source saturates whole, whale thins; sampler honors both") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.pipeline.Mixing
    val dir = java.nio.file.Files
      .createTempDirectory("graft-waterfill-skew").toString
    // whale: 900 docs x 10 tokens; tiny: 10 docs x 10 tokens.
    // N = (9000+100)/2 = 4550; candidates: k=0: 2275, k=1:
    // (4550-100)/1 = 4450 -> lam = 4450: tiny (100) saturates, whale
    // allocates 4450/9000
    val docs = (1 to 900).map(i =>
      (i.toLong, Seq.fill(10)("w").mkString(" "), "en", "whale")) ++
      (1 to 10).map(i =>
        (900L + i, Seq.fill(10)("t").mkString(" "), "en", "tiny"))
    docs.toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t = Tables(spark, dir)
    val got = Mixing.mixSolver(t).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("tiny", 100L, 100L, true, 1.0, 4450L),
      ("whale", 9000L, 4450L, false,
        graft.functions.Portable.round6Double(4450.0 / 9000.0), 4450L)),
      s"planted water-fill wrong: $got")
    val kept = Mixing.sampleWaterfill(t).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(kept.count(_._2 == "tiny") == 10,
      "saturated source must keep every doc")
    val whaleKept = kept.count(_._2 == "whale")
    // Bernoulli at rate .494x over 900 identity coins — a fixed
    // deterministic count; the band just guards gross rate breakage
    assert(whaleKept > 300 && whaleKept < 600, s"whale kept $whaleKept")
  }

  test("mix: water-fill sampler keeps everything from saturated sources, thins the rest toward alloc") {
    import org.apache.spark.sql.functions._
    import graft.pipeline.Mixing
    val solver = Mixing.mixSolver(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4))).toSeq
    val kept = Mixing.sampleWaterfill(tables).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val keptBySrc = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val docs = tables.documents
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    solver.foreach { case (src, _, _, sat, rate6) =>
      val ids = docs.filter(_._2 == src).map(_._1)
      if (sat)
        assert(keptBySrc.getOrElse(src, Set.empty) == ids.toSet,
          s"saturated $src must keep every doc")
      else {
        // the exact identity-coin rule, recomputed per doc
        val want = ids.filter { id =>
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(s"wfill|$id".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(8)
          java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 < rate6
        }.toSet
        assert(keptBySrc.getOrElse(src, Set.empty) == want,
          s"$src sample diverges from the identity coin rule")
      }
    }
  }
}
