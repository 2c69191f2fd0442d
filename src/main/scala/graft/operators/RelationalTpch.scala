package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The remaining classic TPC-H plan shapes, adapted to this star schema
  * (no partsupp table — the part↔supplier link is derived from
  * `lineitem`; no commit/receipt dates — "late" is `l_returnflag = 'R'`).
  *
  * The reference engine (ref: Top3HotProduct.java:95-107 is its whole
  * SQL surface) never exercises these shapes; they are the coverage a
  * user graduating from it to a real warehouse needs first: EXISTS
  * semi-joins, scalar-subquery thresholds, outer-join distributions,
  * argmin-per-group, and global-fraction filters.
  *
  * Same numeric policy as [[Relational]]: money through DECIMAL (exact,
  * associative → distributed partials ≡ single-threaded oracle), cast
  * to double only at output; doubles cross the oracle boundary only
  * when the value is integer-valued (quantity sums) or produced by one
  * identical IEEE op both sides (a single division/multiply).
  */
object RelationalTpch {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  private val one = lit(1).cast("decimal(12,2)")

  // ---------------------------------------------------------------- Q4

  /** Order-priority count with an EXISTS gate (TPC-H Q4 shape): orders
    * placed in a quarter that had at least one returned line.
    *
    * Scale shape: the probe side collapses to DISTINCT orderkeys
    * map-side BEFORE the semi join (Spark rewrites left_semi on a
    * distinct-able probe to an aggregate exchange of keys only); the
    * result is one shuffle of keys + one of 5 groups — the fact table's
    * payload columns never move.
    */
  def q4PriorityExists(t: Tables): DataFrame =
    t.orders
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00") &&
        col("o_orderdate") < lit("1996-04-01 00:00:00"))
      .join(t.lineitem.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  def q4PriorityExistsSql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- Q12

  /** Priority mix per return class (TPC-H Q12 shape): one fact↔fact
    * join, then a conditional aggregate splitting urgent from normal
    * priorities — never two scans, never a self-join. The shipdate
    * window is a pushed filter; the orders join is the one shuffle.
    */
  def q12PriorityClass(t: Tables): DataFrame = {
    val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  def q12PriorityClassSql: String =
    """SELECT l_returnflag,
      |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
      |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 0 ELSE 1 END)::BIGINT AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- Q13

  /** Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER
    * join so customers whose orders are all filtered out still count
    * (order_count = 0), then the distribution-of-counts re-aggregate.
    *
    * Scale shape: shuffle join on custkey (both sides partial-free —
    * outer joins can't pre-aggregate the probe), first groupBy reuses
    * the join's partitioning (no second exchange on custkey), second
    * groupBy moves |distinct counts| rows.
    */
  def q13OrderDistribution(t: Tables): DataFrame = {
    val counted = t.customer
      .join(t.orders.filter(!col("o_orderpriority").startsWith("4")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    counted
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  def q13OrderDistributionSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey
      |        AND o_orderpriority NOT LIKE '4%'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --------------------------------------------------------------- Q15

  /** Top supplier by quarter revenue (TPC-H Q15 shape): the
    * scalar-subquery-max pattern. Revenue per supplier is an EXACT
    * decimal sum, so `rev = MAX(rev)` is a portable equality — the max
    * rides back as a BROADCAST single-row equi-join, never a global
    * sort and never a window over one partition.
    */
  def q15TopSupplier(t: Tables): DataFrame = {
    val rev = t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
        col("l_shipdate") < lit("1996-04-01 00:00:00"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .as("rev"))
    val mx = rev.agg(max(col("rev")).as("mxrev"))
    rev
      .join(broadcast(mx), col("rev") === col("mxrev"))
      .join(broadcast(t.supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  def q15TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev = (SELECT MAX(rev) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // --------------------------------------------------------------- Q17

  /** Small-quantity revenue per brand (TPC-H Q17 shape): the
    * correlated-average filter — lines whose quantity is below 20% of
    * their part's average. Pre-aggregate per part, join back on
    * partkey, filter, re-aggregate per brand.
    *
    * Portability: l_quantity is integer-valued (1..50), so its sum is
    * exact in double and `sum/count` is one identical IEEE division
    * both engines; `0.2 * avgq` is one identical multiply.
    *
    * Scale shape: both the pre-aggregate and the join shuffle hash on
    * l_partkey, so the join reuses the aggregate's exchange (one
    * data-sized shuffle total); the part dim rides a broadcast.
    */
  def q17SmallQtyRevenue(t: Tables): DataFrame = {
    val avgq = t.lineitem
      .groupBy(col("l_partkey").as("a_partkey"))
      .agg((sum(col("l_quantity")) / count(lit(1))).as("avgq"))
    t.lineitem
      .join(avgq, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avgq"))
      .join(broadcast(t.part.select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        (sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0))
          .as("avg_yearly"),
        count(lit(1)).as("n_small"))
      .orderBy(col("p_brand"))
  }

  def q17SmallQtyRevenueSql: String =
    """WITH a AS (SELECT l_partkey AS a_partkey,
      |             SUM(l_quantity) / COUNT(*) AS avgq
      |           FROM lineitem GROUP BY 1)
      |SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
      |    AS avg_yearly,
      |  COUNT(*) AS n_small
      |FROM lineitem
      |JOIN a ON l_partkey = a_partkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_quantity < 0.2 * avgq
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- Q22

  /** Churned high-balance customers per nation (TPC-H Q22 shape):
    * customers above the average positive balance with NO orders in the
    * recent window — the scalar-subquery threshold + ANTI join pair.
    * (Every customer here has SOME order, so "churned" means none since
    * 2000-01-01 — same plan shape, non-empty answer.)
    *
    * Scale shape: the average is a one-row broadcast (cross join of a
    * scalar, never a shuffle); the no-recent-orders gate is an anti
    * join shuffled on custkey — the recent-orders side collapses to
    * DISTINCT custkeys map-side first.
    */
  def q22ChurnBalance(t: Tables): DataFrame = {
    val avgBal = t.customer
      .filter(col("c_acctbal") > 0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
        .as("avg_bal"))
    val recent = t.orders
      .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00"))
      .select(col("o_custkey"))
    t.customer
      .crossJoin(broadcast(avgBal))
      .filter(dec(col("c_acctbal")).cast("double") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  def q22ChurnBalanceSql: String =
    """SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) >
      |    (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
      |       / COUNT(*)
      |     FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- Q11

  /** Parts holding an outsized share of inventory value (TPC-H Q11
    * shape): per-part value vs a fraction of the GLOBAL total — the
    * global-scalar-threshold filter. The total re-aggregates the
    * already-grouped per-part values (tiny), and rides back as a
    * broadcast one-row cross join.
    */
  def q11ImportantParts(t: Tables): DataFrame = {
    val perPart = t.lineitem
      .groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("value"))
    val total = perPart.agg(sum(col("value")).cast("double").as("total"))
    perPart
      .crossJoin(broadcast(total))
      .filter(col("value").cast("double") > lit(0.001) * col("total"))
      .select(col("l_partkey"), col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  def q11ImportantPartsSql: String =
    """WITH pp AS (SELECT l_partkey,
      |              SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value
      |            FROM lineitem GROUP BY 1)
      |SELECT l_partkey, CAST(value AS DOUBLE) AS value
      |FROM pp
      |WHERE CAST(value AS DOUBLE) >
      |  0.001 * (SELECT CAST(SUM(value) AS DOUBLE) FROM pp)
      |ORDER BY value DESC, l_partkey""".stripMargin

  // ---------------------------------------------------------------- Q9

  /** Product-line profit by supplier nation and year (TPC-H Q9 shape):
    * profit = revenue − cost, where cost is retailprice×quantity (this
    * schema's stand-in for ps_supplycost). Every dimension hop (part
    * filtered on name, supplier, nation) is a broadcast; the single
    * shuffle is the final (nation, year) groupBy of exact decimals.
    */
  def q9ProductProfit(t: Tables): DataFrame = {
    val amount =
      dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) -
        dec(col("p_retailprice")) * dec(col("l_quantity"))
    t.lineitem
      .join(broadcast(t.part.filter(col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  def q9ProductProfitSql: String =
    """SELECT n_name AS nation, year(l_shipdate) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
      |    - CAST(p_retailprice AS DECIMAL(12,2))
      |    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY 1, 2
      |ORDER BY 1, 2 DESC""".stripMargin

  // ---------------------------------------------------------------- Q2

  /** Cheapest supplier per part (TPC-H Q2 shape): the argmin-per-group
    * correlated subquery, over the lineitem-derived link. Unit cost is
    * min(extendedprice/quantity) per (part, supplier) — one identical
    * IEEE division per row both engines, min is order-free.
    *
    * Scale shape: the link pre-aggregates on (partkey, suppkey)
    * map-side; the argmin is a row_number window partitioned on
    * partkey (hash shuffle, no global sort) with a suppkey tie-break;
    * part/supplier/nation dims ride broadcasts; final top-100 is a
    * TakeOrderedAndProject.
    */
  def q2MinCostSupplier(t: Tables): DataFrame = {
    val link = t.lineitem
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("cost"), col("l_suppkey"))
    link
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(t.part.filter(col("p_type") === "ECONOMY")
        .select("p_partkey", "p_name")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(t.supplier.select("s_suppkey", "s_name",
        "s_nationkey")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"),
        col("n_name"), col("cost"))
      .orderBy(col("cost").desc, col("p_partkey"))
      .limit(100)
  }

  def q2MinCostSupplierSql: String =
    """WITH link AS (
      |  SELECT l_partkey, l_suppkey,
      |    MIN(l_extendedprice / l_quantity) AS cost
      |  FROM lineitem GROUP BY 1, 2),
      |ranked AS (
      |  SELECT *, row_number() OVER
      |    (PARTITION BY l_partkey ORDER BY cost, l_suppkey) AS rn
      |  FROM link)
      |SELECT p_partkey, p_name, s_name, n_name, cost
      |FROM ranked
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE rn = 1 AND p_type = 'ECONOMY'
      |ORDER BY cost DESC, p_partkey LIMIT 100""".stripMargin
}
