package graft.analytics

import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality / expectation operators (Deequ-style) — the audit pass a
  * training pipeline runs over every ingested batch before it reaches the
  * corpus. All single-scan shapes: a column profile is one aggregate over
  * the table (the multi-distinct expand is Spark's exact-distinct plan),
  * drift and outlier checks are one groupBy + one self-join-free window
  * or broadcast of per-group bounds. The reference's analogue is the
  * consistency checker (/root/reference cmd/verifier, pkg/position_repos)
  * — these generalize "did replication corrupt the data" to "is the data
  * itself healthy".
  */
object QualityQueries {

  def all: Seq[CatalogQuery] = Seq(

    // ---- per-column profile (completeness / cardinality / numeric range) --
    // One scan computes every column's null count, exact distinct count,
    // and numeric min/max. At 100 TB: nulls and min/max are map-side
    // partials; the exact multi-column distinct is the one genuinely
    // shuffle-heavy metric (Spark expands one row per distinct-column),
    // which is the honest cost of EXACT profiles — approx_count_distinct
    // is the documented lever when ±2% is acceptable.
    CatalogQuery("qa_column_profile", (s, d) => {
      val o = Tables.orders(s, d)
      def numProf(c: String) = struct(lit(c).as("col_name"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("double").as("min_num"),
        max(col(c)).cast("double").as("max_num"))
      def strProf(c: String) = struct(lit(c).as("col_name"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"))
      o.agg(array(
        numProf("o_orderkey"), numProf("o_custkey"), numProf("o_totalprice"),
        strProf("o_orderstatus"), strProf("o_orderpriority")).as("profiles"))
        .select(explode(col("profiles")).as("p"))
        .select(col("p.col_name"), col("p.n_nulls"), col("p.n_distinct"),
          col("p.min_num"), col("p.max_num"))
    }, Some(
      """SELECT 'o_orderkey' AS col_name, count(*) - count(o_orderkey) AS n_nulls,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(min(o_orderkey) AS DOUBLE) AS min_num, CAST(max(o_orderkey) AS DOUBLE) AS max_num
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*) - count(o_custkey), count(DISTINCT o_custkey),
        |  CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE) FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*) - count(o_totalprice), count(DISTINCT o_totalprice),
        |  CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE) FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*) - count(o_orderstatus), count(DISTINCT o_orderstatus),
        |  NULL::DOUBLE, NULL::DOUBLE FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*) - count(o_orderpriority), count(DISTINCT o_orderpriority),
        |  NULL::DOUBLE, NULL::DOUBLE FROM orders""".stripMargin)),

    // ---- drift: new-entity onboarding curve -------------------------------
    // Entities (users) first seen per day — the batch-over-batch drift
    // signal that catches an upstream id-space change (a re-keyed source
    // suddenly makes EVERY user "new"). min-per-key then count-per-day:
    // two map-side-partial aggregations, no join.
    CatalogQuery("qa_new_entities_per_day", (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("first_day"))
        .groupBy(col("first_day"))
        .agg(count(lit(1)).as("n_new_users")),
      Some(
        """SELECT first_day, count(*) AS n_new_users FROM (
          |  SELECT user_id, min(CAST(ts AS DATE)) AS first_day
          |  FROM events GROUP BY 1) t
          |GROUP BY 1""".stripMargin)),

    // ---- 3-sigma outliers with engine-stable arithmetic -------------------
    // Per-type mean/variance from EXACT decimal sums (order-independent),
    // then identical IEEE double steps on both engines: the threshold and
    // the comparison are bit-reproducible, so the outlier SET is gated,
    // not just its size. The per-type bounds are a tiny aggregate joined
    // back broadcast-style — one scan + one broadcast join at any scale.
    CatalogQuery("qa_value_outliers", (s, d) => {
      val e = Tables.events(s, d)
      val stats = e.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(Q.dec(col("value"))).as("s1"),
        sum(Q.dec(col("value")) * Q.dec(col("value"))).as("s2"))
        .select(col("event_type"),
          (col("s1").cast("double") / col("n")).as("mean_v"),
          // IEEE cancellation can push a ~0 variance fractionally negative:
          // Spark's sqrt would return NaN but DuckDB ERRORS — clamp on
          // both sides so near-constant groups degrade identically
          sqrt(greatest(col("s2").cast("double") / col("n") -
            (col("s1").cast("double") / col("n")) * (col("s1").cast("double") / col("n")),
            lit(0.0)))
            .as("sd_v"))
      e.join(stats, Seq("event_type"))
        .filter(col("value") > col("mean_v") + lit(3.0) * col("sd_v"))
        .select(col("event_id"), col("event_type"), col("value"))
    }, Some(
      s"""WITH stats AS (
         |  SELECT event_type,
         |    CAST(sum(${Q.oDec("value")}) AS DOUBLE) / count(*) AS mean_v,
         |    sqrt(greatest(CAST(sum(${Q.oDec("value")} * ${Q.oDec("value")}) AS DOUBLE) / count(*)
         |      - (CAST(sum(${Q.oDec("value")}) AS DOUBLE) / count(*))
         |        * (CAST(sum(${Q.oDec("value")}) AS DOUBLE) / count(*)), 0.0)) AS sd_v
         |  FROM events GROUP BY 1)
         |SELECT e.event_id, e.event_type, e.value
         |FROM events e JOIN stats s USING (event_type)
         |WHERE e.value > s.mean_v + 3.0 * s.sd_v""".stripMargin)),

    // ---- referential-integrity audit --------------------------------------
    // FK orphan counts across the star schema's two load-bearing edges,
    // via anti-joins (each a broadcast- or shuffle-pruned semi shape, no
    // full materialization of the violating rows). The replication
    // verifier's (/root/reference cmd/verifier) relational cousin: after
    // replicating N tables, prove the keys still line up.
    CatalogQuery("qa_referential_integrity", (s, d) => {
      val orphanLineitems = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
      val orphanOrders = Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
      orphanLineitems.agg(count(lit(1)).as("n_violations"))
        .withColumn("fk_edge", lit("lineitem->orders"))
        .unionByName(orphanOrders.agg(count(lit(1)).as("n_violations"))
          .withColumn("fk_edge", lit("orders->customer")))
        .select(col("fk_edge"), col("n_violations"))
    }, Some(
      """SELECT 'lineitem->orders' AS fk_edge, count(*) AS n_violations
        |FROM lineitem WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |UNION ALL
        |SELECT 'orders->customer', count(*)
        |FROM orders WHERE NOT EXISTS (
        |  SELECT 1 FROM customer WHERE c_custkey = o_custkey)""".stripMargin)),

    // ---- retention cohorts -------------------------------------------------
    // The canonical product-analytics matrix: users grouped by first-seen
    // day (cohort), counted distinct on each later activity day offset.
    // Two aggregations, both keyed on user_id then (cohort, offset) — no
    // self-join of the events table against itself.
    CatalogQuery("evt_retention_cohorts", (s, d) => {
      val firstDay = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("cohort_day"))
      Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("active_day"))
        .distinct()
        .join(firstDay, Seq("user_id"))
        .groupBy(col("cohort_day"),
          datediff(col("active_day"), col("cohort_day")).cast("long").as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    }, Some(
      """WITH fd AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |  FROM events GROUP BY 1),
        |act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events)
        |SELECT cohort_day, date_diff('day', cohort_day, active_day) AS day_offset,
        |  count(DISTINCT user_id) AS n_active
        |FROM act JOIN fd USING (user_id)
        |GROUP BY 1, 2""".stripMargin)),

    // ---- RFM segmentation --------------------------------------------------
    // Recency/frequency/monetary quartiles per user over purchase events —
    // the standard audience-segmentation op. Exact ntile quartiles over
    // the per-user aggregate (15k rows per 10M events: the windowed stage
    // runs on the REDUCED table, the wide stage is one keyed agg).
    // Deterministic: every ntile orders by (metric, user_id).
    CatalogQuery("evt_rfm_segmentation", (s, d) => {
      // the as-of day stays IN-PLAN as a broadcast 1-row aggregate (the
      // same scalar-subquery shape the oracle uses) — no eager driver
      // action, the whole entry remains one lazy plan
      val maxDay = Tables.events(s, d).agg(max(to_date(col("ts"))).as("max_day"))
      val perUser = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(to_date(col("ts"))).as("last_day"),
          count(lit(1)).as("frequency"),
          Q.dsum(col("value")).as("monetary"))
        .crossJoin(broadcast(maxDay))
        .select(col("user_id"),
          datediff(col("max_day"), col("last_day")).cast("long").as("recency_days"),
          col("frequency"), col("monetary"))
      perUser
        .withColumn("r_q", ntile(4).over(
          Window.orderBy(col("recency_days"), col("user_id"))).cast("long"))
        .withColumn("f_q", ntile(4).over(
          Window.orderBy(col("frequency").desc, col("user_id"))).cast("long"))
        .withColumn("m_q", ntile(4).over(
          Window.orderBy(col("monetary").desc, col("user_id"))).cast("long"))
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary"), col("r_q"), col("f_q"), col("m_q"))
    }, Some(
      """WITH mx AS (SELECT CAST(max(ts) AS DATE) AS max_day FROM events),
        |per_user AS (
        |  SELECT user_id,
        |    date_diff('day', max(CAST(ts AS DATE)), (SELECT max_day FROM mx)) AS recency_days,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS monetary
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT user_id, recency_days, frequency, monetary,
        |  ntile(4) OVER (ORDER BY recency_days, user_id) AS r_q,
        |  ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_q,
        |  ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m_q
        |FROM per_user""".stripMargin)),

    // ---- language-ID confusion matrix --------------------------------------
    // Declared label vs detected language cross-tab with per-cell share of
    // the declared label's row mass — the eval that tells you whether the
    // lang column upstream can be trusted before you filter 100 TB on it.
    // One scan + one two-key aggregate + a window over the tiny cross-tab.
    CatalogQuery("txt_langid_confusion", (s, d) => {
      val pred = graft.functions.TextAnalysis.predLangEnish(col("text"))
      val cells = Tables.documents(s, d)
        .select(col("lang").as("declared"), pred.as("detected"))
        .groupBy(col("declared"), col("detected"))
        .agg(count(lit(1)).as("n"))
      cells.withColumn("share_of_declared",
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("declared"))).cast("double"))
    }, Some(
      """WITH cells AS (
        |  SELECT lang AS declared,
        |    CASE WHEN CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE)
        |      / len(string_split(text, ' ')) >= 0.08 THEN 'enish' ELSE 'other' END AS detected,
        |    count(*) AS n
        |  FROM documents GROUP BY 1, 2)
        |SELECT declared, detected, n,
        |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY declared) AS DOUBLE)
        |    AS share_of_declared
        |FROM cells""".stripMargin)),

    // ---- parse-and-quarantine routing -------------------------------------
    // The ingest pattern for dirty data: rows whose payload fails to parse
    // are routed to a quarantine label instead of poisoning the batch (or
    // silently vanishing). Corruption is planted deterministically
    // (event_id % 17 truncates the JSON), parse success is the route key.
    CatalogQuery("qa_parse_quarantine", (s, d) => {
      val e = Tables.events(s, d)
        .withColumn("raw", when(col("event_id") % 17 === 0, lit("{"))
          .otherwise(col("props")))
      // PERMISSIVE from_json yields a struct of nulls for malformed input
      // (never a null struct), so failure is detected the supported way:
      // the corrupt-record side channel captures the unparseable payload
      e.withColumn("parsed", from_json(col("raw"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, _corrupt STRING"),
          Map("columnNameOfCorruptRecord" -> "_corrupt")))
        .select(col("event_id"),
          when(col("parsed._corrupt").isNotNull, lit("quarantine"))
            .otherwise(lit("ok")).as("route"),
          when(col("parsed._corrupt").isNull, col("parsed.k")).as("k"))
    }, Some(
      """SELECT event_id,
        |  CASE WHEN raw_ok THEN 'ok' ELSE 'quarantine' END AS route,
        |  CASE WHEN raw_ok
        |    THEN CAST(json_extract(CASE WHEN event_id % 17 = 0 THEN '{' ELSE props END, '$.k') AS BIGINT)
        |  END AS k
        |FROM (
        |  SELECT event_id, props,
        |    json_valid(CASE WHEN event_id % 17 = 0 THEN '{' ELSE props END) AS raw_ok
        |  FROM events) t""".stripMargin))
  )
}
