package graft.analytics

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Second analytics battery: TPC-H-shaped queries adapted to the harness
  * schema plus scalar-function coverage (string/date/conditional) —
  * every entry DuckDB-oracled with the decimal-exact aggregation scheme.
  */
object TpchQueries {

  def all: Seq[CatalogQuery] = Seq(

    // q4: orders having at least one late-shipped lineitem (semi join + agg)
    CatalogQuery("q4_priority_with_late_items", (s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count")),
      Some(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin), bench = true),

    // q6: single-scan forecast revenue (all predicates pushed to parquet)
    CatalogQuery("q6_forecast_revenue", (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("2001-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n")),
      Some(
        """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
          |  count(*) AS n
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2001-01-01'
          |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin), bench = true),

    // q10: top-20 customers by return-flagged revenue
    CatalogQuery("q10_returned_item_customers", (s, d) => {
      // orders/customer are fact-scale: no forced broadcast (AQE decides);
      // nation (25 rows) stays hinted
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      li.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }, Some(
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin), bench = true),

    // q12-like: shipping-delay buckets by line status (conditional agg)
    CatalogQuery("q12_ship_delay_buckets", (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1)
            .otherwise(0)).as("late_count"),
          sum(when(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1)
            .otherwise(0)).as("ontime_count")),
      Some(
        """SELECT l_linestatus,
          |  CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
          |  CAST(sum(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS BIGINT) AS ontime_count
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY l_linestatus""".stripMargin)),

    // q14-like: promo revenue share (single double division at the end)
    CatalogQuery("q14_promo_revenue_share", (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .agg(
          (sum(when(col("p_type") === "PROMO",
            dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
            .otherwise(lit(0).cast("decimal(25,4)"))).cast("double") * 100.0 /
            sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
              .cast("double")).as("promo_share")),
      Some(
        """SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
          |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
          |    ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE) * 100.0 /
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
          |  AS promo_share
          |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin)),

    // explicit GROUPING SETS (beyond rollup/cube)
    CatalogQuery("agg_grouping_sets", (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())""".stripMargin)
    }, Some(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())""".stripMargin)),

    // HAVING + correlated-style aggregation
    CatalogQuery("agg_frequent_customers", (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") >= 15),
      Some(
        s"""SELECT o_custkey, count(*) AS n_orders, ${oSum("o_totalprice")} AS spend
           |FROM orders GROUP BY o_custkey HAVING count(*) >= 15""".stripMargin)),

    // scalar-subquery pattern: parts above their brand's average price
    // (window-based formulation — one shuffle, no per-row subquery)
    CatalogQuery("win_parts_above_brand_avg", (s, d) => {
      val w = Window.partitionBy(col("p_brand"))
      Tables.part(s, d)
        .withColumn("brand_avg",
          (sum(dec(col("p_retailprice"))).over(w).cast("double") /
            count(lit(1)).over(w)))
        .filter(col("p_retailprice") > col("brand_avg"))
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
    }, Some(
      """SELECT p_partkey, p_brand, p_retailprice FROM (
        |  SELECT *, CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) OVER (PARTITION BY p_brand) AS DOUBLE)
        |      / count(*) OVER (PARTITION BY p_brand) AS brand_avg
        |  FROM part) t
        |WHERE p_retailprice > brand_avg""".stripMargin)),

    // string function battery
    CatalogQuery("fn_string_battery", (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          upper(col("c_mktsegment")).as("seg_upper"),
          lower(col("c_name")).as("name_lower"),
          substring(col("c_name"), 10, 9).as("cust_num"),
          length(col("c_name")).cast("long").as("name_len"),
          regexp_replace(col("c_name"), "0+", "0").as("name_squeezed"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          reverse(col("c_name")).as("reversed"),
          levenshtein(col("c_name"), reverse(col("c_name"))).cast("long").as("lev_rev"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"),
          repeat(substring(col("c_mktsegment"), 1, 2), 2).as("repeated")),
      Some(
        """SELECT c_custkey,
          |  upper(c_mktsegment) AS seg_upper,
          |  lower(c_name) AS name_lower,
          |  substring(c_name, 10, 9) AS cust_num,
          |  length(c_name) AS name_len,
          |  regexp_replace(c_name, '0+', '0', 'g') AS name_squeezed,
          |  c_mktsegment || '|' || c_name AS joined,
          |  lpad(c_custkey::VARCHAR, 8, '0') AS padded,
          |  reverse(c_name) AS reversed,
          |  CAST(levenshtein(c_name, reverse(c_name)) AS BIGINT) AS lev_rev,
          |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
          |  repeat(substring(c_mktsegment, 1, 2), 2) AS repeated
          |FROM customer""".stripMargin)),

    // date/time function battery
    CatalogQuery("fn_date_battery", (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow_sun0"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          trunc(col("o_orderdate"), "month").as("month_start"), // DATE on both engines
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30")),
      Some(
        """SELECT o_orderkey,
          |  year(o_orderdate) AS y,
          |  month(o_orderdate) AS m,
          |  dayofmonth(o_orderdate) AS dom,
          |  dayofweek(o_orderdate) AS dow_sun0,
          |  quarter(o_orderdate) AS q,
          |  date_trunc('month', o_orderdate) AS month_start,
          |  o_orderdate + INTERVAL 30 DAY AS plus30
          |FROM orders""".stripMargin)),

    // grouped top-k via bounded-heap Aggregator: ships k-row states through
    // the shuffle instead of window-sorting every group's full row set
    CatalogQuery("agg_topk_per_brand_heap", (s, d) => {
      import s.implicits._
      val agg = graft.functions.TopKAggregator(3)
      Tables.part(s, d)
        .select(col("p_brand"), col("p_retailprice"), col("p_partkey"))
        .as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues(t => (t._2, t._3))
        .agg(agg.toColumn.name("ids"))
        .toDF("p_brand", "ids")
        .select(col("p_brand"), posexplode(col("ids")))
        .select(col("p_brand"), (col("pos") + 1).cast("long").as("rank"),
          col("col").as("p_partkey"))
    }, Some(
      """SELECT p_brand, rn AS rank, p_partkey FROM (
        |  SELECT p_brand, p_partkey,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) t WHERE rn <= 3""".stripMargin)),

    // array explode with position (lateral unnest)
    CatalogQuery("arr_explode_embedding_dims", (s, d) =>
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 50)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").cast("long").as("dim_idx"),
          col("col").cast("double").as("component")),
      Some(
        """SELECT vec_id, i AS dim_idx, embedding[CAST(i + 1 AS INT)]::DOUBLE AS component
          |FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i) u
          |WHERE vec_id < 50""".stripMargin)),

    // array function battery (slice/transform/array_max/array_min exercised;
    // outputs are scalar — the driver's comparator cannot sort array columns)
    CatalogQuery("arr_function_battery", (s, d) => {
      val first4 = slice(transform(col("embedding"), x => x.cast("double")), 1, 4)
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("n_dims"),
          element_at(first4, 1).as("f1"),
          element_at(first4, 2).as("f2"),
          element_at(first4, 3).as("f3"),
          element_at(first4, 4).as("f4"),
          array_max(transform(col("embedding"), x => x.cast("double"))).as("vmax"),
          array_min(transform(col("embedding"), x => x.cast("double"))).as("vmin"))
    }, Some(
      """SELECT vec_id,
        |  len(embedding) AS n_dims,
        |  ((embedding[1:4])::DOUBLE[])[1] AS f1,
        |  ((embedding[1:4])::DOUBLE[])[2] AS f2,
        |  ((embedding[1:4])::DOUBLE[])[3] AS f3,
        |  ((embedding[1:4])::DOUBLE[])[4] AS f4,
        |  list_max(embedding::DOUBLE[]) AS vmax,
        |  list_min(embedding::DOUBLE[]) AS vmin
        |FROM embeddings""".stripMargin)),

    // skew toolkit, gated: two-phase (salted) aggregation over a 3-value
    // hot key must equal the direct GROUP BY — the explicit lever for
    // skewed agg keys AQE cannot split (operators.Scale)
    CatalogQuery("agg_two_phase_skew", (s, d) =>
      graft.operators.Scale.twoPhaseAgg(Tables.lineitem(s, d),
        Seq(col("l_returnflag")),
        Seq(col("l_orderkey"), col("l_linenumber")), 16)(
        partial = _.agg(count(lit(1)).as("c"), sum(dec(col("l_quantity"))).as("q")),
        fin = _.agg(sum(col("c")).as("n_rows"),
          sum(col("q")).cast("double").as("total_qty"))),
      Some(
        """SELECT l_returnflag, count(*) AS n_rows,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
          |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // salted join, gated: a 5-value ultra-hot join key spread over salt
    // buckets (small side replicated per salt) must produce exactly the
    // rows of the plain join
    CatalogQuery("join_salted_hot_key", (s, d) => {
      val o = Tables.orders(s, d)
      val dim = o.select(col("o_orderpriority")).distinct()
        .withColumn("prio_tag", concat(lit("P:"), col("o_orderpriority")))
      graft.operators.Scale.saltedJoin(o, dim, "o_orderpriority",
          buckets = 8, entropy = Seq(col("o_orderkey")))
        .groupBy(col("o_orderpriority"), col("prio_tag"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
    }, Some(
      s"""SELECT o_orderpriority, 'P:' || o_orderpriority AS prio_tag,
         |  count(*) AS n, ${oSum("o_totalprice")} AS total
         |FROM orders GROUP BY 1, 2""".stripMargin)),

    // ranking-function battery: dense_rank / percent_rank / cume_dist /
    // ntile — one window, four ranking semantics, exact cross-engine
    CatalogQuery("win_rank_battery", (s, d) => {
      val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice"), col("p_partkey"))
      Tables.part(s, d)
        .filter(col("p_partkey") <= 500)
        .select(col("p_partkey"), col("p_brand"),
          dense_rank().over(w).cast("long").as("drank"),
          percent_rank().over(w).as("prank"),
          cume_dist().over(w).as("cdist"),
          ntile(4).over(w).cast("long").as("quartile"))
    }, Some(
      """SELECT p_partkey, p_brand,
        |  dense_rank() OVER w AS drank,
        |  percent_rank() OVER w AS prank,
        |  cume_dist() OVER w AS cdist,
        |  ntile(4) OVER w AS quartile
        |FROM part WHERE p_partkey <= 500
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)""".stripMargin)),

    // RANGE-frame window: value-based frame bounds (not row counts) —
    // running revenue of each customer's orders within the trailing
    // 10000 order-key range
    CatalogQuery("win_range_frame_sum", (s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rangeBetween(-10000L, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("trailing_total"))
    }, Some(
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderkey
        |    RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_total
        |FROM orders""".stripMargin)),

    // INTERSECT ALL: bag-semantics intersection (multiplicity = min) —
    // completes the set-op family next to EXCEPT ALL
    CatalogQuery("set_intersect_all_multiplicity", (s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey").as("k"))
      val o = Tables.orders(s, d).select(col("o_orderkey").as("k"))
      li.intersectAll(o)
    }, Some(
      """SELECT k FROM (
        |  SELECT l_orderkey AS k FROM lineitem
        |  INTERSECT ALL
        |  SELECT o_orderkey AS k FROM orders) t""".stripMargin)),

    // exact percentiles (linear interpolation — both engines implement the
    // same continuous-quantile definition over sorted values)
    CatalogQuery("agg_exact_percentiles", (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile(o_orderkey, 0.25)").as("p25"),
          expr("percentile(o_orderkey, 0.5)").as("p50"),
          expr("percentile(o_orderkey, 0.75)").as("p75")),
      Some(
        """SELECT o_orderpriority,
          |  quantile_cont(o_orderkey, 0.25) AS p25,
          |  quantile_cont(o_orderkey, 0.5) AS p50,
          |  quantile_cont(o_orderkey, 0.75) AS p75
          |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // math-function battery — only IEEE-exact ops: sqrt is required
    // correctly-rounded, so it hash-matches bit-for-bit; exp/ln are NOT
    // (JDK vs libm differ by 1 ulp) and stay out of gated outputs
    CatalogQuery("fn_math_battery", (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          abs(col("c_acctbal")).as("aabs"),
          round(col("c_acctbal"), 1).as("around"),
          floor(col("c_acctbal")).cast("long").as("afloor"),
          ceil(col("c_acctbal")).cast("long").as("aceil"),
          sqrt(abs(col("c_acctbal"))).as("asqrt"),
          pow(col("c_custkey") % 7, 2).as("apow"),
          signum(col("c_acctbal")).cast("long").as("asign"),
          (col("c_custkey") % 97).as("amod")),
      Some(
        """SELECT c_custkey,
          |  abs(c_acctbal) AS aabs,
          |  round(c_acctbal, 1) AS around,
          |  CAST(floor(c_acctbal) AS BIGINT) AS afloor,
          |  CAST(ceil(c_acctbal) AS BIGINT) AS aceil,
          |  sqrt(abs(c_acctbal)) AS asqrt,
          |  pow(c_custkey % 7, 2) AS apow,
          |  CAST(sign(c_acctbal) AS BIGINT) AS asign,
          |  c_custkey % 97 AS amod
          |FROM customer""".stripMargin)),

    // unpivot / melt: wide metrics to long (metric, value) rows — the
    // inverse of pivot, completing the reshaping pair
    CatalogQuery("reshape_unpivot_metrics", (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_custkey") <= 200)
        .select(col("c_custkey"),
          col("c_acctbal").cast("double").as("acctbal"),
          col("c_nationkey").cast("double").as("nationkey"))
        .unpivot(Array(col("c_custkey")),
          Array(col("acctbal"), col("nationkey")), "metric", "val"),
      Some(
        """SELECT c_custkey, metric, val FROM (
          |  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
          |    CAST(c_nationkey AS DOUBLE) AS nationkey
          |  FROM customer WHERE c_custkey <= 200) t
          |UNPIVOT (val FOR metric IN (acctbal, nationkey))""".stripMargin)),

    // deterministic arg-max via lexicographic struct ordering: the row
    // attribute at the group's maximum, ties broken by the key itself
    // (max_by alone is nondeterministic under value ties)
    CatalogQuery("agg_argmax_struct", (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(max(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")))
          .getField("k").as("top_order"),
          max(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")))
            .getField("p").cast("double").as("top_price")),
      Some(
        """SELECT o_orderpriority,
          |  max(struct_pack(p := o_totalprice, k := o_orderkey)).k AS top_order,
          |  CAST(max(struct_pack(p := o_totalprice, k := o_orderkey)).p AS DOUBLE) AS top_price
          |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // conditional expressions battery
    CatalogQuery("fn_conditional_battery", (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 1000, "low").otherwise("high").as("bal_class"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(default)")).as("seg_nb"),
          greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
          (col("c_custkey") % 2 === 0).as("even_key")),
      Some(
        """SELECT c_custkey,
          |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
          |       WHEN c_acctbal < 1000 THEN 'low' ELSE 'high' END AS bal_class,
          |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(default)') AS seg_nb,
          |  greatest(c_acctbal, 0.0) AS bal_floor,
          |  c_custkey % 2 = 0 AS even_key
          |FROM customer""".stripMargin))
  )
}
