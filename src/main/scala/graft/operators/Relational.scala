package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core relational plans — the engine surface the reference drives via
  * its embedded SQL (ref: Top3HotProduct.java:95-107) plus the classic
  * scan→filter→agg / star-join shapes any analytics engine needs.
  *
  * Numeric policy: money math goes through DECIMAL (exact, associative,
  * so a distributed partial-aggregate tree and a single-threaded oracle
  * produce bit-identical results) and is cast to double only at output.
  */
object Relational {

  /** Exact 2-dp decimal view of a double money column. */
  private def dec(c: Column): Column = c.cast("decimal(12,2)")

  /** Pricing summary: scan → pushed filter → groupBy agg (TPC-H Q1 shape).
    *
    * Partial aggregation collapses everything map-side; the shuffle
    * carries 4 groups regardless of input scale.
    */
  def q1Pricing(t: Tables): DataFrame = {
    val one = lit(1).cast("decimal(12,2)")
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
          * (one + dec(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)))
          .as("avg_price"),
        (sum(dec(col("l_discount"))).cast("double") / count(lit(1)))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Shipping-priority revenue (TPC-H Q3 shape): one selective dim
    * joined to two facts, agg, top-10.
    *
    * Only the true dimension (`customer`) carries a broadcast hint.
    * lineitem ⋈ orders is fact-fact: its date filter keeps most of
    * `orders`, so at cluster scale it must shuffle on the order key
    * (AQE picks broadcast anyway when a filtered side happens to be
    * small — a size decision made at runtime, never forced).
    */
  def q3Shipping(t: Tables): DataFrame =
    q3Body(t.lineitem, t.orders, t.customer)

  /** q3 plan body over explicit fact inputs — shared by [[q3Shipping]]
    * (raw parquet scans, fact-fact join shuffles) and
    * storage.Bucketing.q3Bucketed (pre-bucketed facts, zero-exchange
    * join). One definition so the two entries cannot drift.
    */
  def q3Body(lineitem: DataFrame, orders: DataFrame,
             customer: DataFrame): DataFrame = {
    val one = lit(1).cast("decimal(12,2)")
    val cust = customer
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = orders
      .filter(col("o_orderdate") < lit("1999-01-01 00:00:00"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    lineitem
      .filter(col("l_shipdate") > lit("1997-01-01 00:00:00"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_orderdate_sec"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  def q3ShippingSql: String =
    """SELECT l_orderkey,
      |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_sec,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate_sec
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Regional supplier revenue rollup (TPC-H Q5 shape): a 6-table star
    * join. True dimensions (customer⋈nation⋈region, supplier)
    * broadcast; lineitem ⋈ orders is fact-fact and shuffles on the
    * order key (the 2-year date filter keeps most of `orders` — a
    * forced broadcast would OOM at cluster scale).
    */
  def q5RegionRollup(t: Tables): DataFrame = {
    val one = lit(1).cast("decimal(12,2)")
    val dims = t.customer
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .join(t.region.filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "c_nationkey", "n_name")
    val sup = t.supplier.select("s_suppkey", "s_nationkey")
    val ord = t.orders
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00") &&
        col("o_orderdate") < lit("1998-01-01 00:00:00"))
      .select("o_orderkey", "o_custkey")
    t.lineitem
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  def q5RegionRollupSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Per-category top-3 products by click count — the reference's
    * Top3HotProduct (ref: Top3HotProduct.java:95-107, row_number over
    * partition) on `events`: category=event_type, product=user_id.
    *
    * The heavy step is the pre-aggregation (groupBy collapses map-side);
    * the rank window then runs over one row per (category, product),
    * not per click.
    */
  def top3PerCategory(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = t.events
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("click_count"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("click_count").desc, col("user_id"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("event_type", "user_id", "click_count", "rank")
  }

  def top3PerCategorySql: String =
    """SELECT event_type, user_id, click_count, rank FROM (
      |  SELECT event_type, user_id, click_count,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY click_count DESC, user_id) AS INT) AS rank
      |  FROM (SELECT event_type, user_id, COUNT(*) AS click_count
      |        FROM events GROUP BY event_type, user_id))
      |WHERE rank <= 3""".stripMargin

  /** Blacklist filtering — the reference's TransformBlacklist (ref:
    * TransformBlacklist.java:49-77: leftOuterJoin + filter + map).
    *
    * Re-expressed as ONE broadcast left_anti join: no shuffle of the
    * event stream, no post-filter pass, and Catalyst can still push
    * the projection into the scan.
    */
  def blacklistFilter(t: Tables): DataFrame = {
    val blacklist = t.customer
      .filter(col("c_acctbal") < 0).select("c_custkey")
    t.events
      .join(broadcast(blacklist), col("user_id") === col("c_custkey"),
        "left_anti")
      .select("event_id", "user_id", "event_type")
  }

  def blacklistFilterSql: String =
    """SELECT event_id, user_id, event_type FROM events
      |WHERE NOT EXISTS (SELECT 1 FROM customer
      |                  WHERE c_acctbal < 0 AND c_custkey = user_id)""".stripMargin

  /** Large-order report (TPC-H Q18 shape): aggregate the fact, filter on
    * the aggregate (HAVING), then join the survivors back to the
    * dimensions. The scale shape: the heavy groupBy collapses map-side;
    * the HAVING filter shrinks the result to a sliver, which then joins
    * back as the SMALL side — at 100 TB the join back to orders/customer
    * broadcasts the survivors, never the facts.
    */
  def q18LargeOrders(t: Tables): DataFrame = {
    val bigOrders = t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 300)
      .select(col("l_orderkey"), col("qty").cast("double").as("sum_qty"))
    t.orders
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t.customer.select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_orderdate_sec"),
        dec(col("o_totalprice")).cast("double").as("o_totalprice"),
        col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  def q18LargeOrdersSql: String =
    """SELECT c_custkey, c_name, o_orderkey,
      |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_sec,
      |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
      |  sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey,
      |        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) sum_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300) big
      |  ON o_orderkey = big.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Kafka-shaped key extraction + count: the reference's Kafka word
    * counts consume (key,value) records (ref: KafkaDirectWordCount.java);
    * here the payload is the events `props` JSON and the key is pulled
    * with a codegen'd regexp — no UDF, no JSON parser on the hot path.
    */
  def kvExtractCount(t: Tables): DataFrame =
    t.events
      .select(regexp_extract(col("props"), "\"k\": (\\d+)", 1)
        .cast("int").as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("k"))

  def kvExtractCountSql: String =
    """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k,
      |  COUNT(*) AS cnt
      |FROM events GROUP BY k ORDER BY k""".stripMargin

  /** Cross-nation trade volume by year (TPC-H Q7 shape, all pairs):
    * supplier-nation × customer-nation revenue matrix over a two-year
    * shipping window. Two facts join on their keys (shuffle), every
    * dimension hop (supplier, customer, nation×2) is an explicit
    * broadcast — the fact side is never shuffled by a dim. Exact
    * decimal revenue sums (the q1 discipline); year extraction is
    * integer `year()` in both engines.
    */
  def q7NationVolume(t: Tables): DataFrame = {
    val one = lit(1).cast("decimal(12,2)")
    val li = t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
        col("l_shipdate") <= lit("1997-12-31 00:00:00"))
    val n1 = t.nation.select(col("n_nationkey").as("s_nk"),
      col("n_name").as("supp_nation"))
    val n2 = t.nation.select(col("n_nationkey").as("c_nk"),
      col("n_name").as("cust_nation"))
    li
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  def q7NationVolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
      |    AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <= TIMESTAMP '1997-12-31 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  /** Returned-item revenue, top customers (TPC-H Q10 shape): which
    * customers returned the most value in a quarter? Facts join and
    * aggregate BEFORE the top-k (TakeOrderedAndProject — partial
    * top-k in every task, never a global sort of customers); revenue
    * is an exact decimal sum so the DESC order (custkey tie-break) is
    * cross-engine deterministic.
    */
  def q10ReturnedCustomers(t: Tables): DataFrame = {
    val one = lit(1).cast("decimal(12,2)")
    t.lineitem
      .filter(col("l_returnflag") === "R")
      .join(t.orders
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00") &&
          col("o_orderdate") < lit("1996-04-01 00:00:00")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  def q10ReturnedCustomersSql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
      |    AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Q16's target sizes (TPC-H picks 8 of the 50). */
  val Q16Sizes: Seq[Int] = Seq(3, 9, 14, 19, 23, 36, 45, 49)
  val Q16ExcludedBrand = "Brand#21"

  /** Supplier-diversity per part segment (TPC-H Q16 shape, adapted to
    * this star schema: `lineitem` is the part↔supplier link — the
    * schema has no partsupp table — and the excluded-supplier
    * predicate is `s_acctbal < 0`, ref: sotowang's relational demos
    * never leave 2-table joins, this is the multi-predicate
    * count-distinct shape they'd grow into). For each surviving
    * (p_brand, p_size): how many DISTINCT suppliers ship it.
    *
    * Scale shape, in plan order (pinned in RelationalSpec):
    * 1. the link dedups on (l_partkey, l_suppkey) FIRST — one shuffle
    *    of pre-combined partials, collapsing the fact table to the
    *    ~|part|×avg-suppliers link set before any join;
    * 2. the bad-supplier exclusion is a BROADCAST anti join (the
    *    NOT IN list is |suppliers| at most — never a shuffle);
    * 3. the part filter (`p_brand <>`, `p_size IN`) prunes the dim
    *    BEFORE its broadcast hash join (PushedFilters reach the scan);
    * 4. count(DISTINCT supplier) per (brand, size) runs as Spark's
    *    two-phase distinct-aggregate — partials on the already-distinct
    *    link keys, so no third full shuffle of raw facts.
    */
  def q16SupplierDiversity(t: Tables): DataFrame = {
    val link = t.lineitem
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val badSupp = t.supplier.filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val parts = t.part
      .filter(col("p_brand") =!= Q16ExcludedBrand &&
        col("p_size").isin(Q16Sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    link
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  /** Promo revenue share per 1996 month (TPC-H Q14 shape): the
    * conditional-aggregate ratio — one fact pass, the part dim rides a
    * BROADCAST hash join, promo/total split by a `when` inside the
    * same aggregate (never two scans, never a self-join). Numerators
    * and denominators are EXACT decimal sums; the percentage is the
    * only double (one identical IEEE division both engines, round6).
    * The shipdate window is a pushed filter (PushedFilters reach the
    * scan — pinned).
    */
  def q14PromoShare(t: Tables): DataFrame = {
    val one = lit(1).cast("decimal(12,2)")
    val rev = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00"))
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .groupBy(month(col("l_shipdate")).as("mon"))
      .agg(
        sum(when(col("p_type").startsWith("PROMO"), rev)
          .otherwise(lit(0).cast("decimal(12,2)"))).as("pr"),
        sum(rev).as("tr"))
      .select(col("mon"),
        col("pr").cast("double").as("promo_rev"),
        col("tr").cast("double").as("total_rev"),
        graft.functions.Portable.round6(
          lit(100.0) * col("pr").cast("double") / col("tr").cast("double"))
          .as("promo_pct6"))
      .orderBy(col("mon"))
  }

  def q14PromoShareSql: String = {
    val rev = "CAST(l_extendedprice AS DECIMAL(12,2)) " +
      "* (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"
    s"""WITH g AS (
       |  SELECT CAST(month(l_shipdate) AS INT) AS mon,
       |    SUM(CASE WHEN p_type LIKE 'PROMO%' THEN $rev
       |        ELSE CAST(0 AS DECIMAL(12,2)) END) AS pr,
       |    SUM($rev) AS tr
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  GROUP BY 1)
       |SELECT mon, CAST(pr AS DOUBLE) AS promo_rev,
       |  CAST(tr AS DOUBLE) AS total_rev,
       |  ${graft.functions.Portable.round6Sql(
      "100.0 * CAST(pr AS DOUBLE) / CAST(tr AS DOUBLE)")} AS promo_pct6
       |FROM g ORDER BY mon""".stripMargin
  }

  def q16SupplierDiversitySql: String =
    s"""SELECT p_brand, p_size,
       |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
       |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) link
       |JOIN part ON l_partkey = p_partkey
       |WHERE p_brand <> '$Q16ExcludedBrand'
       |  AND p_size IN (${Q16Sizes.mkString(", ")})
       |  AND l_suppkey NOT IN
       |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY 1, 2
       |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin
}
