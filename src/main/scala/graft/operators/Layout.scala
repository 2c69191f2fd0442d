package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional file
  * clustering for scan pruning, the write-side half of the 100 TB
  * story: every query family here prunes with partition filters or
  * pushed predicates, and WHICH files a predicate can skip is decided
  * by how rows were laid out at write. A single-dimension sort gives
  * perfect zone maps on its sort key and useless ones on every other
  * column; interleaving the bits of two normalized keys (the public
  * Morton/Z-curve construction, as in Delta/Iceberg `OPTIMIZE ZORDER`)
  * spreads locality across BOTH, so min/max zone maps prune ~√S of S
  * shards per dimension instead of S on one and 1 on the other.
  *
  * Everything is integer arithmetic (normalize → interleave → shard),
  * identical in DuckDB — the layouts, zone maps, and pruning counts
  * are all hash-checked cross-engine; the only double is the final
  * scan-fraction ratio (round6, the q14 discipline).
  *
  * Scale: shard assignment is a map-side expression on the write path
  * (no shuffle beyond the write's own partitioning); zone maps are one
  * partial aggregation to |shards| rows; the pruning report joins
  * |probes| × |shards| — metadata-sized, never the fact table.
  */
object Layout {

  /** Bits per dimension after range normalization (32 cells). */
  val ZBits = 5

  /** Shards per layout: 2^(2·[[ZBits]]) z-cells / 64 → 16 shards, the
    * same shard count for all three compared layouts so scan fractions
    * are directly comparable.
    */
  val ZShardDiv = 64
  val LinShardDiv = 2

  /** Morton interleave of two [[ZBits]]-bit ints: u takes odd bits,
    * d even. Pure shift/mask arithmetic — codegen'd, no UDF.
    */
  private def zInterleave(un: Column, dn: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(un, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(dn, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  private def zInterleaveSql(un: String, dn: String): String =
    (0 until ZBits).map { i =>
      s"((($un >> $i) & 1) << ${2 * i + 1}) + ((($dn >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  /** The (u, d, un, dn, z) frame: raw user/day dims, range-normalized
    * [[ZBits]]-bit coordinates, and the Morton address. Range scalars
    * come from ONE one-row aggregate broadcast back (the q22
    * discipline) — normalization adapts to any corpus span.
    */
  private def zFrame(t: Tables): DataFrame = {
    val dims = t.events.select(col("user_id").as("u"),
      expr("ts_sec div 86400").as("day"))
    val scal = dims.agg(min(col("day")).as("min_day"),
      max(col("day")).as("max_day"), max(col("u")).as("max_u"))
    dims.crossJoin(broadcast(scal))
      .select(col("u"), (col("day") - col("min_day")).as("d"),
        expr(s"(u * ${1 << ZBits}) div (max_u + 1)").as("un"),
        expr(s"((day - min_day) * ${1 << ZBits}) " +
          s"div (max_day - min_day + 1)").as("dn"))
      .withColumn("z", zInterleave(col("un"), col("dn")))
  }

  private def zFrameSql: String =
    s"""dm AS (SELECT user_id AS u,
       |         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
       |       FROM events),
       |sc AS (SELECT MIN(day) AS min_day, MAX(day) AS max_day,
       |         MAX(u) AS max_u FROM dm),
       |zf AS (SELECT u, (day - min_day) AS d,
       |         ((u * ${1 << ZBits}) // (max_u + 1)) AS un,
       |         (((day - min_day) * ${1 << ZBits})
       |           // (max_day - min_day + 1)) AS dn
       |       FROM dm, sc),
       |z AS (SELECT u, d, un, dn,
       |        ${zInterleaveSql("un", "dn")} AS z
       |      FROM zf)""".stripMargin

  /** Zone maps of the Z-ordered layout: per shard, row count and
    * min/max of BOTH dimensions — the file-skipping index a reader
    * consults before opening a shard. The interesting property (spec-
    * pinned, and visible in the output): every shard is tight on both
    * u and d, where a day-sorted layout is tight on d only.
    */
  def zorderStats(t: Tables): DataFrame =
    zFrame(t)
      .groupBy(expr(s"z div $ZShardDiv").as("shard"))
      .agg(count(lit(1)).as("n"),
        min(col("u")).as("min_u"), max(col("u")).as("max_u"),
        min(col("d")).as("min_d"), max(col("d")).as("max_d"))
      .orderBy(col("shard"))

  def zorderStatsSql: String =
    s"""WITH $zFrameSql
       |SELECT z // $ZShardDiv AS shard, COUNT(*) AS n,
       |  MIN(u) AS min_u, MAX(u) AS max_u,
       |  MIN(d) AS min_d, MAX(d) AS max_d
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin

  /** The layout bake-off: for three candidate layouts over the SAME
    * rows — Z-order, day-sorted, user-sorted, equal shard budgets —
    * simulate a point query on each dimension against each layout's
    * zone maps and report the fraction of shards a reader must open
    * (probes = every distinct value present, so the number is the
    * corpus-wide average, not a cherry-picked key). The table that
    * justifies paying the Z-order write: one-dimension sorts score ~1.0
    * on their non-sort dimension; Z-order scores ~√(1/S) on both.
    *
    * Output: (layout, dim, n_shards, n_probes, hits, scan_frac6).
    */
  def layoutCompare(t: Tables): DataFrame = {
    import graft.functions.Portable.round6
    val zf = zFrame(t)
    def zoneMap(tag: String, shard: Column): DataFrame =
      zf.groupBy(shard.as("shard"))
        .agg(min(col("u")).as("min_u"), max(col("u")).as("max_u"),
          min(col("d")).as("min_d"), max(col("d")).as("max_d"))
        .select(lit(tag).as("layout"), col("shard"), col("min_u"),
          col("max_u"), col("min_d"), col("max_d"))
    val zm = zoneMap("zorder", expr(s"z div $ZShardDiv"))
      .unionAll(zoneMap("day_sort", expr(s"dn div $LinShardDiv")))
      .unionAll(zoneMap("user_sort", expr(s"un div $LinShardDiv")))
    def side(dim: String, probes: DataFrame, lo: String, hi: String) = {
      val nProbes = probes.count()
      zm.join(broadcast(probes),
          col("p") >= col(lo) && col("p") <= col(hi))
        .groupBy(col("layout"))
        .agg(count(lit(1)).as("hits"))
        .join(zm.groupBy(col("layout")).agg(count(lit(1)).as("n_shards")),
          Seq("layout"))
        .select(col("layout"), lit(dim).as("dim"), col("n_shards"),
          lit(nProbes).as("n_probes"), col("hits"),
          round6(col("hits").cast("double") /
            (lit(nProbes).cast("double") * col("n_shards").cast("double")))
            .as("scan_frac6"))
    }
    val pu = zf.select(col("u").as("p")).distinct()
    val pd = zf.select(col("d").as("p")).distinct()
    side("day", pd, "min_d", "max_d")
      .unionAll(side("user", pu, "min_u", "max_u"))
      .orderBy(col("layout"), col("dim"))
  }

  def layoutCompareSql: String = {
    import graft.functions.Portable.round6Sql
    s"""WITH $zFrameSql,
       |zm AS (
       |  SELECT 'zorder' AS layout, z // $ZShardDiv AS shard,
       |    MIN(u) min_u, MAX(u) max_u, MIN(d) min_d, MAX(d) max_d
       |  FROM z GROUP BY 2
       |  UNION ALL
       |  SELECT 'day_sort', dn // $LinShardDiv,
       |    MIN(u), MAX(u), MIN(d), MAX(d) FROM z GROUP BY 2
       |  UNION ALL
       |  SELECT 'user_sort', un // $LinShardDiv,
       |    MIN(u), MAX(u), MIN(d), MAX(d) FROM z GROUP BY 2),
       |ns AS (SELECT layout, COUNT(*) AS n_shards FROM zm GROUP BY 1),
       |pu AS (SELECT DISTINCT u AS p FROM z),
       |pd AS (SELECT DISTINCT d AS p FROM z),
       |cu AS (SELECT layout, COUNT(*) AS hits FROM zm
       |       JOIN pu ON pu.p BETWEEN zm.min_u AND zm.max_u GROUP BY 1),
       |cd AS (SELECT layout, COUNT(*) AS hits FROM zm
       |       JOIN pd ON pd.p BETWEEN zm.min_d AND zm.max_d GROUP BY 1)
       |SELECT layout, 'day' AS dim, n_shards,
       |  (SELECT COUNT(*) FROM pd) AS n_probes, hits,
       |  ${round6Sql(
        "hits::DOUBLE / ((SELECT COUNT(*) FROM pd)::DOUBLE * n_shards::DOUBLE)")}
       |    AS scan_frac6
       |FROM cd JOIN ns USING (layout)
       |UNION ALL
       |SELECT layout, 'user' AS dim, n_shards,
       |  (SELECT COUNT(*) FROM pu) AS n_probes, hits,
       |  ${round6Sql(
        "hits::DOUBLE / ((SELECT COUNT(*) FROM pu)::DOUBLE * n_shards::DOUBLE)")}
       |    AS scan_frac6
       |FROM cu JOIN ns USING (layout)
       |ORDER BY layout, dim""".stripMargin
  }
}
