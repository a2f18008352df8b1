package graft.analytics

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Third analytics battery: the REMAINING TPC-H query shapes (q2, q7, q8,
  * q9, q11, q13, q15–q22), adapted to the harness star schema (no
  * partsupp table — lineitem is the part↔supplier bridge; no
  * commit/receipt dates — lateness is shipdate vs orderdate+90d, the same
  * adaptation q4/q12 use). Together with CoreQueries/TpchQueries this
  * completes all 22 TPC-H query SHAPES: correlated scalar subqueries
  * (q2/q17), scalar-threshold joins (q11/q15/q22), EXISTS + NOT EXISTS
  * double correlation (q21), NOT IN (q16), disjunctive join predicates
  * (q19), outer-join distributions (q13), and multi-dimension nation
  * joins (q7/q8/q9).
  *
  * Scale notes (the 100 TB shapes):
  *  - every scalar subquery is a 1-row aggregate crossJoin(broadcast(..)) —
  *    no per-row subquery execution, no driver collect;
  *  - nation/region (25/5 rows) carry the only broadcast hints; all
  *    fact-fact joins are left to AQE;
  *  - thresholds compare DECIMAL-exact (or single-division doubles) so the
  *    DuckDB oracle hash-matches bit-for-bit.
  */
object TpchFullQueries {

  private def rev = dec(col("l_extendedprice")) *
    (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
  private val oRev =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"

  def all: Seq[CatalogQuery] = Seq(

    // q2 shape: cheapest source per part — the correlated min subquery.
    // Spark side computes the per-part min ONCE (groupBy) and joins back
    // (two shuffles on l_partkey, AQE-coalesced) instead of running a
    // subquery per row; the oracle keeps the correlated form.
    CatalogQuery("q2_min_cost_supplier", (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
          dec(col("l_extendedprice")).as("cost"))
      val minCost = li.groupBy(col("l_partkey"))
        .agg(min(col("cost")).as("min_cost"))
      li.join(minCost,
          li("l_partkey") === minCost("l_partkey") &&
            col("cost") === col("min_cost"))
        .drop(minCost("l_partkey"))
        .join(Tables.part(s, d).filter(col("p_size") < 10 && col("p_type") === "SMALL"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
          col("min_cost").cast("double").as("min_price"))
        .distinct()
    }, Some(
      """SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name,
        |  CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS min_price
        |FROM lineitem l
        |JOIN part ON p_partkey = l.l_partkey AND p_size < 10 AND p_type = 'SMALL'
        |JOIN supplier ON s_suppkey = l.l_suppkey
        |WHERE CAST(l.l_extendedprice AS DECIMAL(12,2)) = (
        |  SELECT min(CAST(l2.l_extendedprice AS DECIMAL(12,2)))
        |  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin)),

    // q7 shape: shipping volume between two nations by year (supplier
    // nation ↔ customer nation, both directions)
    CatalogQuery("q7_nation_volume_shipping", (s, d) => {
      val n1 = Tables.nation(s, d).select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d).select(col("n_nationkey").as("c_nk"),
        col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("2000-01-01").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(rev).cast("double").as("volume"))
    }, Some(
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year, CAST(sum($oRev) AS DOUBLE) AS volume
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '2000-01-01'
         |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |GROUP BY 1, 2, 3""".stripMargin)),

    // q8 shape: one nation's market share inside a region's PROMO-part
    // orders, by order year (conditional share of exact decimal sums)
    CatalogQuery("q8_market_share", (s, d) => {
      val ns = Tables.nation(s, d).select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      val nc = Tables.nation(s, d).select(col("n_nationkey").as("c_nk"),
        col("n_regionkey").as("c_rk"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_type") === "PROMO"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nc), col("c_nationkey") === col("c_nk"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("c_rk") === col("r_regionkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(ns), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_3", rev)
          .otherwise(lit(0).cast("decimal(25,4)"))).cast("double") /
          sum(rev).cast("double")).as("mkt_share"))
    }, Some(
      s"""SELECT year(o_orderdate) AS o_year,
         |  CAST(sum(CASE WHEN n1.n_name = 'NATION_3' THEN $oRev
         |    ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE) /
         |  CAST(sum($oRev) AS DOUBLE) AS mkt_share
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |GROUP BY 1""".stripMargin)),

    // q9 shape: profit by supplier nation and year. No partsupp ⇒ cost
    // proxy = 10% of retail price × quantity (decimal-exact both engines).
    CatalogQuery("q9_profit_by_nation_year", (s, d) => {
      val profit = rev - dec(col("p_retailprice")) * dec(col("l_quantity")) *
        lit(0.10).cast("decimal(4,2)")
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").contains("red")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(profit).cast("double").as("profit"))
    }, Some(
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
         |  CAST(sum($oRev
         |    - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))
         |      * CAST(0.10 AS DECIMAL(4,2))) AS DOUBLE) AS profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY 1, 2""".stripMargin), bench = true),

    // q11 shape: parts whose total value exceeds a global threshold — the
    // scalar-aggregate-in-HAVING pattern. Threshold is a 1-row broadcast
    // crossJoin; the comparison stays decimal-exact.
    CatalogQuery("q11_important_parts", (s, d) => {
      val li = Tables.lineitem(s, d)
      val vals = li.groupBy(col("l_partkey"))
        .agg(sum(dec(col("l_extendedprice"))).as("value"))
      val thresh = li.agg((sum(dec(col("l_extendedprice"))) *
        lit(0.0006).cast("decimal(7,4)")).as("thresh"))
      vals.crossJoin(broadcast(thresh))
        .filter(col("value") > col("thresh"))
        .select(col("l_partkey"), col("value").cast("double").as("part_value"))
    }, Some(
      """SELECT l_partkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS part_value
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING sum(CAST(l_extendedprice AS DECIMAL(12,2))) > (
        |  SELECT sum(CAST(l_extendedprice AS DECIMAL(12,2))) * CAST(0.0006 AS DECIMAL(7,4))
        |  FROM lineitem)""".stripMargin)),

    // q13 shape: customer order-count distribution — the filter lives in
    // the OUTER JOIN condition (not WHERE), so zero-order customers count
    CatalogQuery("q13_customer_distribution", (s, d) => {
      val o = Tables.orders(s, d)
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT", "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }, Some(
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count""".stripMargin)),

    // q15 shape: supplier(s) achieving the maximum quarterly revenue —
    // max as a 1-row broadcast, equality compared on exact decimals
    CatalogQuery("q15_top_supplier", (s, d) => {
      val revBySupp = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(rev).as("total_rev"))
      val mx = revBySupp.agg(max(col("total_rev")).as("mx"))
      revBySupp.crossJoin(broadcast(mx))
        .filter(col("total_rev") === col("mx"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
    }, Some(
      s"""WITH revenue AS (
         |  SELECT l_suppkey, sum($oRev) AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_shipdate < TIMESTAMP '1999-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
         |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_rev = (SELECT max(total_rev) FROM revenue)""".stripMargin)),

    // q16 shape: distinct supplier count per (brand, type, size), with a
    // NOT IN exclusion list (negative-balance suppliers). s_suppkey is
    // non-null so NOT IN ≡ left_anti.
    CatalogQuery("q16_part_supplier_counts", (s, d) => {
      val bad = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("bad_suppkey"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 5, 9, 13, 17, 21, 25)),
          col("l_partkey") === col("p_partkey"))
        .join(bad, col("l_suppkey") === col("bad_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }, Some(
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin)),

    // q17 shape: revenue from small-quantity lines — quantity below 20% of
    // the part's average, the correlated-average pattern. Per-part averages
    // are one groupBy joined back (shuffle on l_partkey), not a subquery
    // per row; the double threshold is computed with the identical
    // operation order on both engines.
    CatalogQuery("q17_small_qty_revenue", (s, d) => {
      val avgq = Tables.lineitem(s, d).groupBy(col("l_partkey").as("ap_partkey"))
        .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_brand") === "Brand#3"),
          col("l_partkey") === col("p_partkey"))
        .join(avgq, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0)).as("avg_yearly"))
    }, Some(
      """SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem l JOIN part ON l.l_partkey = p_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND l.l_quantity < 0.2 * (
        |    SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin)),

    // q18 shape: large-volume orders (group-HAVING on summed quantity,
    // then customer/order enrichment) — a headline bench heavy: full
    // lineitem groupBy + two fact joins, all AQE-planned
    CatalogQuery("q18_large_volume_customers", (s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
        .filter(col("sum_qty") > 150)
      big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("sum_qty").cast("double").as("total_qty"))
    }, Some(
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(t.sum_qty AS DOUBLE) AS total_qty
        |FROM (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150) t
        |JOIN orders ON t.l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin), bench = true),

    // q19 shape: disjunctive join predicates (brand × size × quantity
    // ranges OR-ed) — exercises Catalyst's common-condition extraction so
    // the equi-join key still drives the join with the OR as a post-filter
    CatalogQuery("q19_disjunctive_revenue", (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d),
          col("l_partkey") === col("p_partkey") &&
            ((col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
             (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
               col("l_quantity").between(10, 20)) ||
             (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
               col("l_quantity").between(20, 30))))
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_lines")),
      Some(
        s"""SELECT CAST(sum($oRev) AS DOUBLE) AS revenue, count(*) AS n_lines
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
           |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
           |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // q20 shape: dominant suppliers of a name-filtered part family (>1/8
    // of a part's shipped volume — with ~100 suppliers per part an even
    // spread is ~1%, so 12.5% marks concentration) — two aggregations over
    // the same filtered join, compared decimal-exact; the inner join to
    // supplier both restricts to existing suppliers and fetches s_name
    CatalogQuery("q20_dominant_volume_suppliers", (s, d) => {
      val redLi = Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").startsWith("red")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      val perSupp = redLi.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(dec(col("l_quantity"))).as("supp_qty"))
      val perPart = redLi.groupBy(col("l_partkey").as("tp_partkey"))
        .agg(sum(dec(col("l_quantity"))).as("part_qty"))
      perSupp.join(perPart, col("l_partkey") === col("tp_partkey"))
        .filter(col("supp_qty") * 8 > col("part_qty"))
        .select(col("l_suppkey").as("s_suppkey")).distinct()
        .join(Tables.supplier(s, d), Seq("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"))
    }, Some(
      """WITH red_li AS (
        |  SELECT l_partkey, l_suppkey, l_quantity
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'red%'),
        |per_supp AS (
        |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS supp_qty
        |  FROM red_li GROUP BY 1, 2),
        |per_part AS (
        |  SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS part_qty
        |  FROM red_li GROUP BY 1)
        |SELECT DISTINCT s_suppkey, s_name
        |FROM per_supp JOIN per_part USING (l_partkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE supp_qty * 8 > part_qty""".stripMargin)),

    // q21 shape: suppliers who alone were late in a multi-supplier
    // finalized order — EXISTS(other supplier) + NOT EXISTS(other late
    // supplier), computed as one per-order distinct-count aggregation
    // instead of two correlated probes per row
    CatalogQuery("q21_waiting_suppliers", (s, d) => {
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")
      val li0 = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"), late.as("is_late"))
      val grp = li0.groupBy(col("l_orderkey").as("g_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("is_late"), col("l_suppkey"))).as("n_late_supp"))
      li0.filter(col("is_late"))
        .join(grp, col("l_orderkey") === col("g_orderkey"))
        .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    }, Some(
      """SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_suppkey, s_name""".stripMargin)),

    // q22 shape: above-average-balance customers with no RECENT orders
    // (none since 2000 ≙ the reference query's "no orders in 7 years") —
    // scalar average threshold (single-division double) + filtered anti join
    CatalogQuery("q22_prospect_customers", (s, d) => {
      val thresh = Tables.customer(s, d).filter(col("c_acctbal") > 0)
        .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      Tables.customer(s, d)
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY", "FURNITURE"))
        .crossJoin(broadcast(thresh))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
    }, Some(
      s"""SELECT c_mktsegment, count(*) AS numcust, ${oSum("c_acctbal")} AS totacctbal
         |FROM customer
         |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'FURNITURE')
         |  AND c_acctbal > (
         |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
         |    FROM customer WHERE c_acctbal > 0)
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |    AND o_orderdate >= TIMESTAMP '2000-01-01')
         |GROUP BY c_mktsegment""".stripMargin))
  )
}
