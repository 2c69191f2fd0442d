package graft.ann

import graft.Tables
import graft.functions.VectorFunctions
import graft.functions.Portable
import graft.functions.Portable.{round6, round6Sql}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors): a brute-force cosine top-k baseline and the
  * sign-LSH bucketed variant that is the 100 TB path.
  *
  * Query set = `vec_id < 10`; corpus = the rest. Cosines are computed as
  * sequential double folds (portable summation order), rounded to 6 dp
  * BEFORE ranking — ranking on the rounded value with a vec_id tiebreak
  * is what makes top-k deterministic across engines (a 1e-17 float
  * difference can otherwise flip near-ties).
  */
object Ann {

  val K = 10
  val NumQueries = 10
  val BucketBits = 4 // 16 buckets; at 100 TB: more bits + multiple tables
  val NumTables = 4 // multiprobe: hash tables over disjoint dim slices
  val IvfCentroids = 16 // coarse-quantizer cells; at 100 TB: ~sqrt(corpus)
  val IvfNProbe = 4 // cells a query scans; the IVF recall/cost dial

  /** (vec_id, v double[], norm, bucket) — norms once per vector, never
    * inside the scoring join.
    */
  private def prepared(t: Tables): DataFrame = {
    val bucketExpr = Portable.signBucketExpr(BucketBits, oneBasedIndex = false)
    t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", VectorFunctions.norm(col("v")))
      .withColumn("bucket", expr(bucketExpr))
  }

  // native codegen'd dot (graft.functions.DotProduct) — same sequential
  // fold as the HOF form, minus the per-element lambda interpreter.
  // Precomputed-norm form: right for the brute-force path, where every
  // corpus vector scores against EVERY query (high fan-in — 1 FMA per
  // element per pair instead of the fused form's 3).
  private val cosine: Column = round6(
    VectorFunctions.cosineFromNorms(
      col("q.v"), col("c.v"), col("q.norm"), col("c.norm")))

  // fused one-pass cosine (graft.functions.CosineSim) — bit-identical
  // to the composition above (FunctionsSpec pins it). Right for the
  // bucketed paths, where a corpus vector meets only the queries that
  // share its bucket (sparse fan-in): the norm column disappears from
  // the probe payload and the scan needs no separate norm pass.
  private val fusedCosine: Column = round6(
    VectorFunctions.cosineSim(col("q.v"), col("c.v")))

  /** Brute-force cosine top-k: the tiny query side broadcasts (a
    * BroadcastNestedLoopJoin over ALL corpus rows — intentionally; that
    * is what "brute force" means) and the corpus never shuffles. The
    * rank ≤ k filter becomes a two-phase WindowGroupLimit (Partial
    * before the shuffle, Final after — AnnSpec pins it): every scan
    * task keeps only its own top-k per query, so the shuffle carries
    * ≤ k × tasks rows per query and no task ever sorts a query's whole
    * score list, even with few distinct queries at 100 TB corpus scale.
    */
  def embedTopK(t: Tables): DataFrame = {
    val p = prepared(t)
    val queries = p.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v"), col("norm"))
    val corpus = p.filter(col("vec_id") >= NumQueries)
      .select(col("vec_id"), col("v"), col("norm"))
    corpus.as("c")
      .crossJoin(broadcast(queries.as("q")))
      .select(col("q.q_id").as("q_id"), col("c.vec_id").as("vec_id"),
        cosine.as("cos_sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= K)
      .orderBy(col("q_id"), col("rank"))
  }

  def embedTopKSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v,
       |             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) norm
       |           FROM embeddings),
       |scored AS (SELECT q.vec_id q_id, c.vec_id vec_id,
       |    ${round6Sql("list_dot_product(q.v, c.v) / (q.norm * c.norm)")} cos_sim
       |  FROM e q JOIN e c ON q.vec_id < $NumQueries AND c.vec_id >= $NumQueries)
       |SELECT q_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) rank
       |  FROM scored)
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin

  /** Sign-LSH bucketed ANN: the corpus is bucketed by the sign bits of
    * its first [[BucketBits]] dimensions; a query scores ONLY its own
    * bucket (~1/2^bits of the corpus). The join is a bucket equi-join —
    * at 100 TB the corpus shuffles once on bucket (or is written
    * bucket-partitioned and never shuffles again), and per-bucket top-k
    * is a partial rank, not a global sort.
    */
  def embedAnnLsh(t: Tables): DataFrame = {
    val p = prepared(t)
    // no norm column: the fused CosineSim computes both norms in the
    // same pass as the dot (bit-identical to the composition), so the
    // probe payload is just (id, v, bucket) — Catalyst prunes the
    // prepared norm away entirely
    val queries = p.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v"), col("bucket"))
    val corpus = p.filter(col("vec_id") >= NumQueries)
      .select(col("vec_id"), col("v"), col("bucket"))
    corpus.as("c")
      .join(broadcast(queries.as("q")), col("q.bucket") === col("c.bucket"))
      .select(col("q.q_id").as("q_id"), col("c.vec_id").as("vec_id"),
        fusedCosine.as("cos_sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("vec_id"), col("cos_sim"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** (vec_id, v, tbl, bkt) — one row per hash table: table j
    * sign-buckets dimensions [j·bits, (j+1)·bits). The ×NumTables row
    * expansion carries only (ids, vector, bucket) — it is the standard
    * multi-table LSH storage trade (L indexes for L× recall).
    */
  private def multiBuckets(df: DataFrame): DataFrame = {
    val tables = (0 until NumTables).map { j =>
      struct(lit(j).as("tbl"),
        expr(Portable.signBucketExpr(BucketBits, oneBasedIndex = false,
          offset = j * BucketBits)).as("bkt"))
    }
    df.select(col("vec_id"), col("v"), explode(array(tables: _*)).as("tb"))
      .select(col("vec_id"), col("v"),
        col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
  }

  /** Query-side hamming-1 probe expansion: for each hash table, the
    * query probes its own bucket AND the [[BucketBits]] buckets one
    * sign-flip away. A query sitting ε from a hyperplane hashes to the
    * wrong side of ONE bit with probability ~1/2 — exactly the bucket
    * its hamming-1 neighbor probe covers. Expansion is QUERY-side only
    * (the broadcast small side: queries × tables × (bits+1) rows); the
    * corpus keeps one row per table, so corpus storage and the join
    * shape are unchanged.
    */
  private def probeBuckets(df: DataFrame): DataFrame = {
    val masks = 0 +: (0 until BucketBits).map(1 << _)
    multiBuckets(df)
      .select(col("vec_id"), col("v"), col("tbl"),
        explode(array(masks.map(m =>
          col("bkt").bitwiseXOR(lit(m))): _*)).as("bkt"))
  }

  /** Multi-table sign-LSH ANN: [[NumTables]] independent hash tables,
    * each bucketing a different dimension slice, PLUS within-table
    * hamming-1 probing ([[probeBuckets]]) — the two standard multiprobe
    * axes composed. A query near one hyperplane boundary (the
    * single-probe failure mode) collides with its true neighbors in the
    * other tables AND in the adjacent bucket of the same table;
    * candidates are the UNION over all probes, deduped, then re-ranked
    * by exact cosine. Table 0's own-bucket probe is exactly
    * [[embedAnnLsh]]'s bucketing, so the candidate set is a strict
    * superset of single-probe, and with `hamming1 = false` (the
    * multi-table-only baseline) a subset of the default — recall can
    * only go up along both axes; AnnSpec asserts both at sf0.01.
    *
    * Scale: same bucket equi-join shape as single-probe ×NumTables; the
    * corpus side still never shuffles (queries broadcast — probe
    * expansion multiplies only the broadcast side), and per-pair dedup +
    * rank stay partial per q_id. The probe count (bits+1 per table) is
    * the recall/cost dial: each probe scans ~corpus/2^bits more
    * candidates, the classic multiprobe trade vs adding whole tables
    * (which cost corpus storage, not probe fan-out).
    */
  def embedAnnMultiprobe(t: Tables, hamming1: Boolean = true): DataFrame = {
    val p = prepared(t)
    val qside = p.filter(col("vec_id") < NumQueries)
      .select(col("vec_id"), col("v"))
    val queries = (if (hamming1) probeBuckets(qside) else multiBuckets(qside))
      .select(col("vec_id").as("q_id"), col("v"), col("tbl"), col("bkt"))
    val corpus = multiBuckets(
      p.filter(col("vec_id") >= NumQueries)
        .select(col("vec_id"), col("v")))
    corpus.as("c")
      .join(broadcast(queries.as("q")),
        col("q.tbl") === col("c.tbl") && col("q.bkt") === col("c.bkt"))
      .select(col("q.q_id").as("q_id"), col("c.vec_id").as("vec_id"),
        fusedCosine.as("cos_sim"))
      .distinct() // a pair matching in several tables scores identically
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("vec_id"), col("cos_sim"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  def embedAnnMultiprobeSql: String = {
    val tableSelects = (0 until NumTables).map { j =>
      val bucketExpr = Portable.signBucketExpr(BucketBits,
        oneBasedIndex = true, offset = j * BucketBits)
      s"SELECT vec_id, v, norm, $j tbl, $bucketExpr AS bkt FROM e"
    }.mkString(" UNION ALL ")
    // query-side hamming-1 probe masks: own bucket (0) + one flip per bit
    val masks = (0 +: (0 until BucketBits).map(1 << _).toList)
      .map(m => s"($m)").mkString(",")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v,
       |             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) norm
       |           FROM embeddings),
       |b AS ($tableSelects),
       |probes AS (SELECT vec_id, v, norm, tbl, xor(bkt, m.m) AS bkt
       |           FROM b, (VALUES $masks) m(m)
       |           WHERE vec_id < $NumQueries),
       |scored AS (SELECT DISTINCT q.vec_id q_id, c.vec_id vec_id,
       |    ${round6Sql("list_dot_product(q.v, c.v) / (q.norm * c.norm)")} cos_sim
       |  FROM probes q JOIN b c ON q.tbl = c.tbl AND q.bkt = c.bkt
       |   AND c.vec_id >= $NumQueries)
       |SELECT q_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) rank
       |  FROM scored)
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path next to
    * the LSH family: the corpus is partitioned into [[IvfCentroids]]
    * cells by nearest centroid; a query scans only its [[IvfNProbe]]
    * nearest cells, re-ranked by exact cosine.
    *
    * Centroids are a deterministic sample (the [[IvfCentroids]] lowest
    * corpus vec_ids) — a kmeans-free quantizer both engines can compute
    * bit-identically; production swaps in Lloyd-iterated centroids and
    * every plan below is unchanged (the quantizer is pluggable data,
    * not plan structure).
    *
    * Scale (100 TB): the centroid table broadcasts everywhere it is
    * used. The index build expands each corpus row ×centroids MAP-SIDE
    * (broadcast nested-loop — intentional: assignment is by definition
    * all-centroids-per-vector), and partial aggregation collapses the
    * expansion back to one row per vector BEFORE its single shuffle —
    * the index build's one corpus pass, persisted bucketed-by-cell in
    * production so probing never reshuffles the corpus. Probing is a
    * broadcast equi-join on cell id: queries × nprobe rows probe the
    * cell-local corpus, ~nprobe/centroids of the data, and the top-k
    * rank is partial per q_id. Unlike sign-LSH, cell population adapts
    * to the data distribution — dense regions split across cells instead
    * of piling into one hyperoctant.
    */
  /** The IVF coarse-quantizer table: (cid, cv) — the [[IvfCentroids]]
    * lowest corpus vec_ids (deterministic, kmeans-free; see
    * [[embedAnnIvf]]).
    */
  private[graft] def ivfCentroidTable(t: Tables): DataFrame =
    t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") >= NumQueries &&
        col("vec_id") < NumQueries + IvfCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

  /** Nearest-centroid assignment of `vecs` (vec_id, v) to `cents`
    * (cid, cv): (vec_id, v, cid, ccos). Argmax over centroids expressed
    * as a lexicographic struct max — highest cosine, lowest cid on ties
    * (matches the oracle's row_number ORDER BY ccos DESC, cid);
    * map-side combine collapses the ×centroids expansion before the
    * single shuffle.
    */
  private def assignTo(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val ccos = round6(VectorFunctions.cosineSim(col("v"), col("cv"))).as("ccos")
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cid"), ccos)
      .groupBy(col("vec_id"))
      .agg(max(struct(col("ccos").as("cc"), (-col("cid")).as("nc"))).as("m"),
        first(col("v")).as("v"))
      .select(col("vec_id"), col("v"), (-col("m.nc")).as("cid"),
        col("m.cc").as("ccos"))
  }

  private def corpusVecs(t: Tables): DataFrame =
    t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") >= NumQueries)

  /** The built IVF index: (vec_id, v, cid) — every corpus vector tagged
    * with its nearest-centroid cell. Shared by the batch probe
    * ([[embedAnnIvf]]) and the streaming probe
    * (`streaming.Jobs.AnnProbeStream`) so the two cannot drift.
    */
  private[graft] def ivfIndex(t: Tables): DataFrame =
    assignTo(corpusVecs(t), ivfCentroidTable(t))
      .select(col("vec_id"), col("v"), col("cid"))

  /** Lloyd refinement of the IVF quantizer: iterate assign → per-cell
    * element-wise mean. This is the production `fit` step the shipped
    * [[embedAnnIvf]] entry deliberately does NOT use — distributed
    * double summation makes kmeans means partition-order-sensitive, so
    * fitted centroids are not oracle-portable; the entry stays on the
    * deterministic sample quantizer and a deployment feeds fitted
    * centroids in as data (the plans take ANY (cid, cv) table).
    *
    * Scale: per iteration, one ×centroids map-side assignment collapsed
    * by partial agg (as the index build), then the mean shuffle carries
    * (cid, pos, x) triples — dim × corpus rows of 3 scalars, with
    * map-side partial sums making the per-(cid, pos) groups tiny. Empty
    * cells keep their previous centroid (coalesce), so the quantizer
    * never loses cells. AnnSpec asserts the refinement strictly improves
    * mean assignment cosine over the sample quantizer at test sf.
    */
  def ivfFit(t: Tables, iters: Int = 2): DataFrame = {
    val corpus = corpusVecs(t)
    var cents = ivfCentroidTable(t)
    for (_ <- 0 until iters) {
      val means = assignTo(corpus, cents)
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
          .as("cv"))
      cents = cents.select(col("cid"), col("cv").as("old_cv"))
        .join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("cv"), col("old_cv")).as("cv"))
    }
    cents
  }

  /** Mean best-assignment cosine of the corpus under quantizer `cents` —
    * the quantization-quality scalar [[ivfFit]] optimizes (1 row).
    */
  private[graft] def quantizerQuality(t: Tables, cents: DataFrame): DataFrame =
    assignTo(corpusVecs(t), cents).agg(avg(col("ccos")).as("mean_ccos"))

  def embedAnnIvf(t: Tables): DataFrame = {
    val e = t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val centroids = ivfCentroidTable(t)
    val ccos = round6(VectorFunctions.cosineSim(col("v"), col("cv"))).as("ccos")
    val assigned = ivfIndex(t)
    val qprobes = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v"))
      .crossJoin(broadcast(centroids))
      .select(col("q_id"), col("v"), col("cid"), ccos)
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("ccos").desc, col("cid"))))
      .filter(col("pr") <= IvfNProbe)
      .select(col("q_id"), col("v"), col("cid"))
    assigned.as("c")
      .join(broadcast(qprobes.as("q")), col("q.cid") === col("c.cid"))
      .select(col("q.q_id").as("q_id"), col("c.vec_id").as("vec_id"),
        fusedCosine.as("cos_sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("vec_id"), col("cos_sim"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  def embedAnnIvfSql: String = {
    val cos = (a: String, b: String) => round6Sql(
      s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
       |k AS (SELECT vec_id cid, v cv FROM e
       |      WHERE vec_id >= $NumQueries
       |        AND vec_id < ${NumQueries + IvfCentroids}),
       |ac AS (SELECT c.vec_id, c.v, k.cid, ${cos("c.v", "k.cv")} ccos
       |       FROM e c, k WHERE c.vec_id >= $NumQueries),
       |a AS (SELECT vec_id, v, cid FROM (
       |        SELECT *, row_number() OVER
       |          (PARTITION BY vec_id ORDER BY ccos DESC, cid) rn FROM ac)
       |      WHERE rn = 1),
       |qc AS (SELECT q.vec_id q_id, q.v, k.cid, ${cos("q.v", "k.cv")} ccos
       |       FROM e q, k WHERE q.vec_id < $NumQueries),
       |qp AS (SELECT q_id, v, cid FROM (
       |        SELECT *, row_number() OVER
       |          (PARTITION BY q_id ORDER BY ccos DESC, cid) rn FROM qc)
       |      WHERE rn <= $IvfNProbe),
       |scored AS (SELECT q.q_id, a.vec_id, ${cos("q.v", "a.v")} cos_sim
       |           FROM qp q JOIN a ON q.cid = a.cid)
       |SELECT q_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) rank
       |  FROM scored)
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin
  }

  def embedAnnLshSql: String = {
    val bucketExpr = Portable.signBucketExpr(BucketBits, oneBasedIndex = true)
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v,
       |             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) norm
       |           FROM embeddings),
       |b AS (SELECT vec_id, v, norm, $bucketExpr AS bucket FROM e),
       |scored AS (SELECT q.vec_id q_id, c.vec_id vec_id,
       |    ${round6Sql("list_dot_product(q.v, c.v) / (q.norm * c.norm)")} cos_sim
       |  FROM b q JOIN b c ON q.bucket = c.bucket
       |   AND q.vec_id < $NumQueries AND c.vec_id >= $NumQueries)
       |SELECT q_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) rank
       |  FROM scored)
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin
  }
}
