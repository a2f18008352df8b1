package graft.analytics

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** The analytic operator battery over the replicated tables — the user-level
  * operator surface SURVEY.md §2.8 commits to: filters/projections, joins
  * (broadcast / shuffle, semi / anti), aggregations (hash agg, rollup, cube,
  * distinct), window functions, top-k, set ops, JSON extraction.
  *
  * Scale notes (100 TB thinking):
  *   - only bounded dimensions (region, nation) carry `broadcast(...)`
  *     hints; anything that scales with the data (orders, customer,
  *     supplier, part) is left to AQE, which broadcasts while it fits
  *     autoBroadcastJoinThreshold and shuffles (with skew splitting) when
  *     it doesn't — a forced broadcast of a fact table is an OOM at 100x;
  *   - every aggregate is a partial (map-side) hash agg by construction —
  *     no `collect`, no driver loops;
  *   - filters/projections sit directly on the parquet scan so pushdown +
  *     column pruning reach the reader.
  */
object CoreQueries {

  def all: Seq[CatalogQuery] = Seq(
    // ---- scans: projection + predicate pushdown --------------------------
    CatalogQuery("scan_projection_pushdown", scanProjection, Some(
      """SELECT l_orderkey, CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-06-01'""".stripMargin)),

    // ---- q1: hash aggregation, decimal-exact -----------------------------
    CatalogQuery("q1_pricing_summary", q1, Some(
      s"""SELECT l_returnflag, l_linestatus,
         |  ${oSum("l_quantity")} AS sum_qty,
         |  ${oSum("l_extendedprice")} AS sum_base_price,
         |  CAST(sum(${oDec("l_extendedprice")} * (1 - ${oDec("l_discount")})) AS DOUBLE) AS sum_disc_price,
         |  CAST(sum(${oDec("l_extendedprice")} * (1 - ${oDec("l_discount")}) * (1 + ${oDec("l_tax")})) AS DOUBLE) AS sum_charge,
         |  ${oAvg("l_quantity")} AS avg_qty,
         |  ${oAvg("l_extendedprice")} AS avg_price,
         |  ${oAvg("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin), bench = true),

    // ---- q3: join + agg + top-k ------------------------------------------
    CatalogQuery("q3_shipping_priority", q3, Some(
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01' AND l_shipdate > TIMESTAMP '1999-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin), bench = true),

    // ---- q5: multi-way broadcast join ------------------------------------
    CatalogQuery("q5_region_revenue", q5, Some(
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY n_name""".stripMargin), bench = true),

    // ---- semi / anti joins (orphan detection, SURVEY §2.9 verifier) ------
    CatalogQuery("join_semi_customers_with_orders", semiJoin, Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin)),
    CatalogQuery("join_anti_parts_never_shipped", antiJoin, Some(
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey AND l_quantity >= 48)""".stripMargin)),

    // ---- distinct aggregation -------------------------------------------
    CatalogQuery("agg_distinct_counts", distinctAgg, Some(
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // ---- rollup / cube ---------------------------------------------------
    CatalogQuery("agg_rollup_nation_status", rollupAgg, Some(
      """SELECT n_name, o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, o_orderstatus)""".stripMargin)),
    CatalogQuery("agg_cube_flags", cubeAgg, Some(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)),

    // ---- window functions ------------------------------------------------
    CatalogQuery("win_top3_parts_per_brand", winRank, Some(
      """SELECT p_brand, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) t WHERE rn <= 3""".stripMargin)),
    CatalogQuery("win_running_customer_spend", winRunning, Some(
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_spend
        |FROM orders""".stripMargin)),
    CatalogQuery("win_lag_order_gap_days", winLag, Some(
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day',
        |    lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |    o_orderdate) AS BIGINT) AS gap_days
        |FROM orders""".stripMargin)),

    // ---- top-k global ----------------------------------------------------
    CatalogQuery("topk_orders_by_value", topk, Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin)),

    // ---- set operations --------------------------------------------------
    CatalogQuery("set_union_except_keys", setOps, Some(
      """SELECT k FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT
        |  SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0) t""".stripMargin)),

    // ---- outer joins ------------------------------------------------------
    CatalogQuery("join_full_outer_customer_orders", fullOuter, Some(
      """SELECT c_custkey, c_name, n_orders FROM (
        |  SELECT c.c_custkey, c.c_name, o.n_orders
        |  FROM customer c FULL OUTER JOIN (
        |    SELECT o_custkey, count(*) AS n_orders FROM orders
        |    WHERE o_totalprice > 400000 GROUP BY o_custkey) o
        |  ON c.c_custkey = o.o_custkey) t""".stripMargin)),
    CatalogQuery("join_cross_region_priority", crossJoin, Some(
      """SELECT r_name, o_orderpriority FROM region
        |CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p""".stripMargin)),

    // ---- bag semantics: EXCEPT ALL / INTERSECT ALL -----------------------
    CatalogQuery("set_except_all_multiplicity", setAllOps, Some(
      """SELECT k FROM (
        |  SELECT l_orderkey AS k FROM lineitem
        |  EXCEPT ALL
        |  SELECT o_orderkey AS k FROM orders) t""".stripMargin)),

    // ---- explicit null ordering (engine defaults differ: Spark ASC is
    // NULLS FIRST, DuckDB ASC is NULLS LAST — always spell it out) --------
    CatalogQuery("win_lag_with_null_ordering", nullOrdering, Some(
      """SELECT o_custkey, o_orderkey, prev_key FROM (
        |  SELECT o_custkey, o_orderkey,
        |    lag(o_orderkey) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey) AS prev_key
        |  FROM orders) t""".stripMargin)),

    // ---- JSON extraction (events.props) ----------------------------------
    CatalogQuery("json_extract_event_props", jsonExtract, Some(
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin)),

    // ---- null-aware anti join (NOT IN with NULLs) ------------------------
    // NOT IN over a subquery containing NULL matches NOTHING (three-valued
    // logic) — Spark plans a dedicated null-aware anti join for it; both
    // engines must agree on the clean count and on the empty NULL case
    CatalogQuery("join_null_aware_anti", (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("naaj_customer")
      Tables.orders(s, d).createOrReplaceTempView("naaj_orders")
      s.sql(
        """SELECT
          |  (SELECT count(*) FROM naaj_customer WHERE c_custkey NOT IN
          |    (SELECT o_custkey FROM naaj_orders WHERE o_totalprice > 300000)) AS n_clean,
          |  (SELECT count(*) FROM naaj_customer WHERE c_custkey NOT IN
          |    (SELECT CASE WHEN o_orderkey % 1000 = 1 THEN NULL ELSE o_custkey END
          |     FROM naaj_orders WHERE o_totalprice > 300000)) AS n_with_nulls""".stripMargin)
    }, Some(
      """SELECT
        |  (SELECT count(*) FROM customer WHERE c_custkey NOT IN
        |    (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)) AS n_clean,
        |  (SELECT count(*) FROM customer WHERE c_custkey NOT IN
        |    (SELECT CASE WHEN o_orderkey % 1000 = 1 THEN NULL ELSE o_custkey END
        |     FROM orders WHERE o_totalprice > 300000)) AS n_with_nulls""".stripMargin)),

    // ---- grouped string agg / collect ------------------------------------
    CatalogQuery("agg_nation_names_per_region", collectAgg, Some(
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin))
  )

  // ---- implementations ----------------------------------------------------

  // decimal inside, DOUBLE at the edge — raw DECIMAL(12,2) output hashes
  // differently from the oracle's in the driver's pandas comparator
  private def scanProjection(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("2001-06-01").cast("timestamp"))
      .select(col("l_orderkey"), dec(col("l_extendedprice")).cast("double").as("price"))

  private def q1(s: SparkSession, d: String): DataFrame = {
    val one = lit(1).cast("decimal(12,2)")
    // single-row-group input: spread the filtered, projected scan so the
    // decimal partial aggregation parallelizes (identity on real input;
    // filter + pruning stay on the scan below the repartition)
    Tables.spread(Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))).cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) * (one + dec(col("l_tax")))).cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  // No broadcast hints on orders/customer: both scale with the data (a
  // forced broadcast of filtered orders OOMs at 100x). AQE broadcasts them
  // automatically while they fit autoBroadcastJoinThreshold and falls back
  // to shuffle join with skew splitting when they don't.
  private def q3(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d).filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private def q5(s: SparkSession, d: String): DataFrame = {
    val one = lit(1).cast("decimal(12,2)")
    val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(s, d)
    val ord = Tables.orders(s, d).filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
    // broadcast() only the bounded dims (nation 25, region 5); orders/
    // customer/supplier scale with SF — AQE decides those join strategies
    Tables.lineitem(s, d)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))).cast("double").as("revenue"))
  }

  private def semiJoin(s: SparkSession, d: String): DataFrame = {
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
    Tables.customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Anti-join over a FILTERED right side ("never shipped in bulk"):
    * every part has some lineitem at harness scale, so the unfiltered
    * variant would prove itself only on an empty set — the weakest
    * possible oracle evidence. The qty >= 48 restriction leaves a
    * non-trivial surviving set at every scale factor while keeping the
    * anti-join mechanics (null-safe build side, no output dup) identical.
    */
  private def antiJoin(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 48),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"))

  private def distinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total"))

  private def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))

  private def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))

  private def winRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
  }

  private def winRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_spend"))
  }

  private def winLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).cast("long").as("gap_days"))
  }

  private def topk(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  private def setOps(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
    val op = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k"))
    val neg = Tables.customer(s, d).filter(col("c_acctbal") < 0).select(col("c_custkey").as("k"))
    f.intersect(op).except(neg)
  }

  private def fullOuter(s: SparkSession, d: String): DataFrame = {
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    Tables.customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(col("c_custkey"), col("c_name"), col("n_orders"))
  }

  private def crossJoin(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).select(col("r_name"))
      .crossJoin(Tables.orders(s, d).select(col("o_orderpriority")).distinct())

  private def setAllOps(s: SparkSession, d: String): DataFrame = {
    // lineitem orderkeys minus orders keys, bag semantics: each lineitem
    // key keeps (multiplicity - 1) copies since orders has each key once
    val li = Tables.lineitem(s, d).select(col("l_orderkey").as("k"))
    val o = Tables.orders(s, d).select(col("o_orderkey").as("k"))
    li.exceptAll(o)
  }

  private def nullOrdering(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc_nulls_first, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"))
  }

  private def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))

  private def collectAgg(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"))
}
