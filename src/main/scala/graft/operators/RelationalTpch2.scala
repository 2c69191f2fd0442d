package graft.operators

import graft.Tables
import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TPC-H shapes Q6/Q8/Q19/Q20/Q21 — with [[Relational]] and
  * [[RelationalTpch]] this completes the full 22-query plan-shape
  * vocabulary (each adapted to this star schema, see RelationalTpch's
  * header for the adaptation rules).
  *
  * What each one adds that no earlier query exercises:
  *  - Q6: the pure scan — every predicate pushed to parquet, zero joins.
  *  - Q8: nested ratio-of-conditional-aggregates across a 6-table star.
  *  - Q19: OR-of-ANDs disjunctive predicate kept in ONE scan+join pass.
  *  - Q20: per-GROUP fraction threshold (vs Q11's global fraction).
  *  - Q21: two distinct-counts with different predicates over one pass.
  */
object RelationalTpch2 {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  private val one = lit(1).cast("decimal(12,2)")

  // ---------------------------------------------------------------- Q6

  /** Forecast revenue change (TPC-H Q6 shape): the pure-scan aggregate —
    * no join, no window; all three predicates reach the parquet scan as
    * PushedFilters and the whole query is one map-side partial + a
    * one-row merge. The 100 TB story: I/O-bound at scan speed, zero
    * shuffle bytes.
    *
    * Discounts here are 0.00–0.10 in cents, so the band is the exact
    * decimal [0.05, 0.07] — compared as decimals, not doubles.
    */
  def q6ForecastRevenue(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00") &&
        dec(col("l_discount")).between(lit("0.05").cast("decimal(12,2)"),
          lit("0.07").cast("decimal(12,2)")) &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  def q6ForecastRevenueSql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |  * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND CAST(l_discount AS DECIMAL(12,2))
      |    BETWEEN CAST('0.05' AS DECIMAL(12,2))
      |        AND CAST('0.07' AS DECIMAL(12,2))
      |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- Q8

  /** National market share inside a region (TPC-H Q8 shape): of the
    * revenue ASIA's customers generated each year, what share was
    * supplied from NATION_2? The numerator is a `when` inside the SAME
    * aggregate as the denominator — one fact pass, the nested
    * conditional-ratio shape.
    *
    * Scale: lineitem↔orders is the one data shuffle; customer,
    * supplier, and both nation hops broadcast; the region filter prunes
    * the customer-nation broadcast BEFORE the join. Numerator and
    * denominator are exact decimals; the share is one IEEE division,
    * round6.
    */
  def q8MarketShare(t: Tables): DataFrame = {
    val rev = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    val custNations = t.nation
      .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val suppNations = t.nation
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNations), col("c_nationkey") === col("cn_key"))
      .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNations), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("l_shipdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_2", rev)
          .otherwise(lit(0).cast("decimal(12,2)"))).as("nat"),
        sum(rev).as("tot"))
      .select(col("o_year"),
        col("nat").cast("double").as("nation_rev"),
        col("tot").cast("double").as("total_rev"),
        Portable.round6(col("nat").cast("double") / col("tot").cast("double"))
          .as("mkt_share6"))
      .orderBy(col("o_year"))
  }

  def q8MarketShareSql: String = {
    val rev = "CAST(l_extendedprice AS DECIMAL(12,2)) " +
      "* (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"
    s"""WITH g AS (
       |  SELECT year(l_shipdate) AS o_year,
       |    SUM(CASE WHEN sn.n_name = 'NATION_2' THEN $rev
       |        ELSE CAST(0 AS DECIMAL(12,2)) END) AS nat,
       |    SUM($rev) AS tot
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation cn ON c_nationkey = cn.n_nationkey
       |  JOIN region ON cn.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation sn ON s_nationkey = sn.n_nationkey
       |  WHERE r_name = 'ASIA'
       |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |  GROUP BY 1)
       |SELECT o_year, CAST(nat AS DOUBLE) AS nation_rev,
       |  CAST(tot AS DOUBLE) AS total_rev,
       |  ${Portable.round6Sql(
      "CAST(nat AS DOUBLE) / CAST(tot AS DOUBLE)")} AS mkt_share6
       |FROM g ORDER BY o_year""".stripMargin
  }

  // --------------------------------------------------------------- Q19

  /** Bracketed-deal revenue (TPC-H Q19 shape): the disjunctive
    * predicate — three (brand, quantity-band, size-band) brackets
    * OR'd together. The point of the shape: ONE scan and ONE broadcast
    * join evaluate all three brackets (never a UNION of three passes),
    * and the disjunction still prunes — the common sub-predicates
    * (p_size bounds) are pushed to the part scan.
    */
  def q19BracketRevenue(t: Tables): DataFrame = {
    val b1 = col("p_brand") === "Brand#11" &&
      col("l_quantity").between(1, 11) && col("p_size").between(1, 5)
    val b2 = col("p_brand") === "Brand#22" &&
      col("l_quantity").between(10, 20) && col("p_size").between(1, 10)
    val b3 = col("p_brand") === "Brand#33" &&
      col("l_quantity").between(20, 30) && col("p_size").between(5, 15)
    t.lineitem
      .join(broadcast(t.part.select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(b1 || b2 || b3)
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  }

  def q19BracketRevenueSql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |  * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
      |  AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#11' AND l_quantity BETWEEN 1 AND 11
      |       AND p_size BETWEEN 1 AND 5)
      |   OR (p_brand = 'Brand#22' AND l_quantity BETWEEN 10 AND 20
      |       AND p_size BETWEEN 1 AND 10)
      |   OR (p_brand = 'Brand#33' AND l_quantity BETWEEN 20 AND 30
      |       AND p_size BETWEEN 5 AND 15)""".stripMargin

  // --------------------------------------------------------------- Q20

  /** Dominant suppliers (TPC-H Q20 shape, inverted to this schema):
    * supplier×part pairs shipping MORE than 2× their FAIR share of the
    * part's quantity (fair share = part total ÷ supplier count) — the
    * per-GROUP relative threshold (Q11 does the global one). A fixed
    * absolute share (e.g. >50%) dies at scale: more data means more
    * suppliers per part and every share shrinks toward 1/n; the
    * fair-share multiple stays meaningful at any corpus size.
    *
    * Scale shape: the part totals re-aggregate the PAIR aggregate
    * (never a second corpus pass), both sides hash on l_partkey so the
    * threshold join reuses the exchange; the predicate is the
    * multiplication form `supp_qty × n_supp > 2 × part_qty` (exact —
    * integer-valued doubles, no division); the reported share is the
    * only division, round6. Supplier names ride a broadcast.
    */
  def q20DominantSupplier(t: Tables): DataFrame = {
    val perPair = t.lineitem
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("supp_qty"))
    val perPart = perPair
      .groupBy(col("l_partkey").as("p_key"))
      .agg(sum(col("supp_qty")).as("part_qty"),
        count(lit(1)).as("n_supp"))
    perPair
      .join(perPart, col("l_partkey") === col("p_key"))
      .filter(col("supp_qty") * col("n_supp") > lit(2.0) * col("part_qty"))
      .join(broadcast(t.supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("s_suppkey"), col("s_name"),
        col("supp_qty"), col("part_qty"), col("n_supp"),
        Portable.round6(col("supp_qty") / col("part_qty")).as("share6"))
      .orderBy(col("l_partkey"), col("s_suppkey"))
  }

  def q20DominantSupplierSql: String =
    s"""WITH pair AS (SELECT l_partkey, l_suppkey,
       |                SUM(l_quantity) AS supp_qty
       |              FROM lineitem GROUP BY 1, 2),
       |part_tot AS (SELECT l_partkey AS p_key, SUM(supp_qty) AS part_qty,
       |               COUNT(*) AS n_supp
       |             FROM pair GROUP BY 1)
       |SELECT l_partkey, s_suppkey, s_name, supp_qty, part_qty, n_supp,
       |  ${Portable.round6Sql("supp_qty / part_qty")} AS share6
       |FROM pair
       |JOIN part_tot ON l_partkey = p_key
       |JOIN supplier ON l_suppkey = s_suppkey
       |WHERE supp_qty * n_supp > 2.0 * part_qty
       |ORDER BY l_partkey, s_suppkey""".stripMargin

  // --------------------------------------------------------------- Q21

  /** Suppliers solely to blame for returned multi-supplier orders
    * (TPC-H Q21 shape): orders involving ≥2 distinct suppliers where
    * EXACTLY ONE supplier's lines were returned — blame them. The
    * classic exists/not-exists self-join pair collapses to ONE
    * aggregation pass: two distinct-counts with different predicates
    * plus a min to recover the sole offender (min = max when the
    * distinct count is 1 — no second scan).
    */
  def q21SoleBlame(t: Tables): DataFrame = {
    // two COUNT(DISTINCT)s in one aggregate compile to an Expand that
    // triples the fact through the exchange; pre-aggregating to the
    // (order, supplier) grid first makes both counts plain aggregates
    // over ~the same row count with NO Expand — bit-equal results
    // (optimization guide §2.3: shuffle fewer bytes)
    val perOS = t.lineitem
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("ret"))
    val blamed = perOS
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        sum(col("ret")).as("n_r_supp"),
        min(when(col("ret") === 1, col("l_suppkey"))).as("blame_key"))
      .filter(col("n_supp") >= 2 && col("n_r_supp") === 1)
    blamed
      .groupBy(col("blame_key"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(t.supplier.select("s_suppkey", "s_name")),
        col("blame_key") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(100)
  }

  def q21SoleBlameSql: String =
    """WITH blamed AS (
      |  SELECT l_orderkey,
      |    COUNT(DISTINCT l_suppkey) AS n_supp,
      |    COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
      |          THEN l_suppkey END) AS n_r_supp,
      |    MIN(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS blame_key
      |  FROM lineitem GROUP BY 1)
      |SELECT s_suppkey, s_name, COUNT(*) AS numwait
      |FROM blamed JOIN supplier ON blame_key = s_suppkey
      |WHERE n_supp >= 2 AND n_r_supp = 1
      |GROUP BY 1, 2
      |ORDER BY numwait DESC, s_suppkey LIMIT 100""".stripMargin
}
