package graft.analytics

import graft.core.Tables
import org.apache.spark.sql.DataFrame
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
      // quartiles via Q.exactNtile — range-repartition + partition-offset
      // ranks, never `ntile().over(Window.orderBy(...))`'s single-partition
      // global sort (10⁸-user table in one task at 100 TB); bit-identical
      // to the oracle's ntile(4) because each key list is a total order
      val q1 = Q.exactNtile(perUser,
        Seq(col("recency_days"), col("user_id")), 4, "r_q")
      val q2 = Q.exactNtile(q1,
        Seq(col("frequency").desc, col("user_id")), 4, "f_q")
      val q3 = Q.exactNtile(q2,
        Seq(col("monetary").desc, col("user_id")), 4, "m_q")
      q3.select(col("user_id"), col("recency_days"), col("frequency"),
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
        |  FROM events) t""".stripMargin)),

    // ---- schema / distribution drift between replica epochs --------------
    // The monitoring op a continuously-replicated table needs: profile
    // epoch A vs epoch B per column (null rate as an exact ppm integer,
    // distinct count, values new in B) and raise typed drift verdicts.
    // Drift is INJECTED deterministically so every verdict fires: lang
    // nulled on doc_id%10 (null-rate drift), source rewritten to a new
    // category on %13 (domain drift), n_chars shifted on %7 (distinct /
    // domain shift on a numeric). Scale shape: each epoch's profile is
    // ONE single-pass multi-metric aggregate (1 row — the crossJoins are
    // all scalar-bounded, auditor-proof), and the new-value diffs are
    // per-column anti-joins over column-pruned DISTINCT sets — map-side
    // partial distinct bounds the shuffle by column cardinality, never
    // corpus size. The 3-row report assembles via explode of a literal
    // struct array.
    CatalogQuery("qa_schema_drift_detect", (s, d) => {
      val a = Tables.documents(s, d)
      val b = a
        .withColumn("lang",
          when(col("doc_id") % 10 === 0, lit(null: String)).otherwise(col("lang")))
        .withColumn("source",
          when(col("doc_id") % 13 === 0, lit("src_new")).otherwise(col("source")))
        .withColumn("n_chars",
          when(col("doc_id") % 7 === 0, col("n_chars") + 500).otherwise(col("n_chars")))
      def profile(df: DataFrame, tag: String): DataFrame = df.agg(
        count(lit(1)).as(s"cnt_$tag"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as(s"nl_lang_$tag"),
        sum(when(col("source").isNull, 1L).otherwise(0L)).as(s"nl_source_$tag"),
        sum(when(col("n_chars").isNull, 1L).otherwise(0L)).as(s"nl_n_chars_$tag"),
        countDistinct(col("lang")).as(s"d_lang_$tag"),
        countDistinct(col("source")).as(s"d_source_$tag"),
        countDistinct(col("n_chars")).as(s"d_n_chars_$tag"))
      def newValues(c: String): DataFrame = {
        val da = a.select(col(c).cast("string").as("v"))
          .filter(col("v").isNotNull).distinct()
        val db = b.select(col(c).cast("string").as("v"))
          .filter(col("v").isNotNull).distinct()
        db.join(da, Seq("v"), "left_anti")
          .agg(count(lit(1)).as(s"nv_$c"))
      }
      val one = profile(a, "a").crossJoin(profile(b, "b"))
        .crossJoin(newValues("lang")).crossJoin(newValues("source"))
        .crossJoin(newValues("n_chars"))
      val rows = one.select(explode(array(Seq("lang", "source", "n_chars").map(c =>
        struct(lit(c).as("col_name"),
          expr(s"(1000000 * nl_${c}_a) div cnt_a").as("null_ppm_a"),
          expr(s"(1000000 * nl_${c}_b) div cnt_b").as("null_ppm_b"),
          col(s"d_${c}_a").as("distinct_a"), col(s"d_${c}_b").as("distinct_b"),
          col(s"nv_$c").as("new_values"))): _*)).as("r"))
      rows.select(col("r.*"))
        .withColumn("null_drift",
          abs(col("null_ppm_b") - col("null_ppm_a")) > 10000L)
        .withColumn("domain_drift",
          col("new_values") > 0L || col("distinct_b") =!= col("distinct_a"))
    }, Some(
      """WITH b AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0 THEN NULL ELSE lang END AS lang,
        |    CASE WHEN doc_id % 13 = 0 THEN 'src_new' ELSE source END AS source,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 500 ELSE n_chars END AS n_chars
        |  FROM documents),
        |pa AS (
        |  SELECT count(*)::BIGINT AS cnt_a,
        |    sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT AS nl_lang_a,
        |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT AS nl_source_a,
        |    sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::BIGINT AS nl_n_chars_a,
        |    count(DISTINCT lang)::BIGINT AS d_lang_a,
        |    count(DISTINCT source)::BIGINT AS d_source_a,
        |    count(DISTINCT n_chars)::BIGINT AS d_n_chars_a
        |  FROM documents),
        |pb AS (
        |  SELECT count(*)::BIGINT AS cnt_b,
        |    sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT AS nl_lang_b,
        |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT AS nl_source_b,
        |    sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::BIGINT AS nl_n_chars_b,
        |    count(DISTINCT lang)::BIGINT AS d_lang_b,
        |    count(DISTINCT source)::BIGINT AS d_source_b,
        |    count(DISTINCT n_chars)::BIGINT AS d_n_chars_b
        |  FROM b),
        |nv AS (
        |  SELECT
        |    (SELECT count(*) FROM (SELECT DISTINCT lang::VARCHAR AS v FROM b WHERE lang IS NOT NULL) x
        |      WHERE v NOT IN (SELECT DISTINCT lang::VARCHAR FROM documents WHERE lang IS NOT NULL))::BIGINT AS nv_lang,
        |    (SELECT count(*) FROM (SELECT DISTINCT source::VARCHAR AS v FROM b WHERE source IS NOT NULL) x
        |      WHERE v NOT IN (SELECT DISTINCT source::VARCHAR FROM documents WHERE source IS NOT NULL))::BIGINT AS nv_source,
        |    (SELECT count(*) FROM (SELECT DISTINCT n_chars::VARCHAR AS v FROM b WHERE n_chars IS NOT NULL) x
        |      WHERE v NOT IN (SELECT DISTINCT n_chars::VARCHAR FROM documents WHERE n_chars IS NOT NULL))::BIGINT AS nv_n_chars),
        |rep AS (
        |  SELECT 'lang' AS col_name,
        |    (1000000 * nl_lang_a) // cnt_a AS null_ppm_a,
        |    (1000000 * nl_lang_b) // cnt_b AS null_ppm_b,
        |    d_lang_a AS distinct_a, d_lang_b AS distinct_b, nv_lang AS new_values
        |  FROM pa, pb, nv
        |  UNION ALL
        |  SELECT 'source',
        |    (1000000 * nl_source_a) // cnt_a, (1000000 * nl_source_b) // cnt_b,
        |    d_source_a, d_source_b, nv_source
        |  FROM pa, pb, nv
        |  UNION ALL
        |  SELECT 'n_chars',
        |    (1000000 * nl_n_chars_a) // cnt_a, (1000000 * nl_n_chars_b) // cnt_b,
        |    d_n_chars_a, d_n_chars_b, nv_n_chars
        |  FROM pa, pb, nv)
        |SELECT col_name, null_ppm_a, null_ppm_b, distinct_a, distinct_b,
        |  new_values,
        |  abs(null_ppm_b - null_ppm_a) > 10000 AS null_drift,
        |  new_values > 0 OR distinct_b <> distinct_a AS domain_drift
        |FROM rep""".stripMargin)),

    // ---- exact ROC-AUC of a quality score (Mann-Whitney rank form) ------
    // Classifier-eval plumbing for quality gates: how well does a score
    // (here n_chars) rank the positive class (lang = 'en')? AUC is
    // computed EXACTLY via the Mann-Whitney identity with midrank tie
    // handling, doubled so every intermediate stays an integer:
    //   2U = Σ_pos(2·minrank + ties − 1) − P(P+1),  AUC = U / (P·N).
    // Scale shape: the per-ROW rank never materializes — scores
    // aggregate to SCORE-LEVEL rows first (distinct-score cardinality,
    // bounded like a histogram), the cumulative window runs over that
    // bounded table, and Σ_pos·midrank is one weighted sum — the same
    // two-level discipline as the drift/histogram entries. A global
    // per-row rank() would be the 100 TB anti-pattern.
    CatalogQuery("qa_auc_ranking", (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("n_chars").cast("long").as("score"),
          (col("lang") === "en").cast("long").as("pos"))
      val byScore = docs.groupBy(col("score"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
      val w = Window.orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = byScore
        .withColumn("below", coalesce(sum(col("n")).over(w), lit(0L)))
        // 2·midrank = 2·(below + 1) + (n − 1)
        .withColumn("mid2", lit(2L) * (col("below") + 1L) + col("n") - 1L)
      ranked.agg(
          sum(col("n_pos")).as("p"),
          sum(col("n") - col("n_pos")).as("nn"),
          sum(col("n_pos") * col("mid2")).as("sum_mid2"))
        .select(col("p").as("n_pos"), col("nn").as("n_neg"),
          // degenerate-corpus tripwire: with zero positives or zero
          // negatives AUC is undefined, and the engines would otherwise
          // disagree on the failure mode (Spark div → NULL, DuckDB // →
          // error) — fail loudly and identically on both sides instead
          (expr("(sum_mid2 - p * (p + 1)) * 1000000 div (2 * p * nn)")
            + coalesce(assert_true(col("p") > 0 && col("nn") > 0,
                lit("qa_auc_ranking: degenerate corpus (zero positives or zero negatives) — AUC undefined")
              ).cast("bigint"), lit(0L)))
            .as("auc_e6"))
    }, Some(
      """WITH d AS (
        |  SELECT CAST(n_chars AS BIGINT) AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM documents),
        |by_score AS (
        |  SELECT score, count(*)::BIGINT AS n, sum(pos)::BIGINT AS n_pos
        |  FROM d GROUP BY 1),
        |ranked AS (
        |  SELECT *, coalesce(sum(n) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS below
        |  FROM by_score),
        |agg AS (
        |  SELECT sum(n_pos)::BIGINT AS p, sum(n - n_pos)::BIGINT AS nn,
        |    sum(n_pos * (2 * (below + 1) + n - 1))::BIGINT AS sum_mid2
        |  FROM ranked)
        |SELECT p AS n_pos, nn AS n_neg,
        |  CASE WHEN p > 0 AND nn > 0
        |    THEN CAST((sum_mid2 - p * (p + 1)) * 1000000 // (2 * p * nn) AS BIGINT)
        |    ELSE error('qa_auc_ranking: degenerate corpus - AUC undefined')::BIGINT
        |  END AS auc_e6
        |FROM agg""".stripMargin)),

    // ---- n-gram diversity profile (distinct-n) --------------------------
    // The corpus diversity telemetry (the distinct-1/2/3 family used to
    // audit generation diversity and template-heavy scrapes): per source
    // and n ∈ {1,2,3}, total n-grams, distinct n-grams, and the
    // distinct/total ratio as ppm — a template-dominated source shows a
    // collapsing distinct-3 ratio long before exact dedup fires. Pure
    // hash aggregations (one explode per n), no pairwise stage; at
    // 100 TB exact countDistinct becomes the HLL sketch rung with the
    // same report shape.
    CatalogQuery("qa_ngram_diversity", (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"), split(col("text"), " ").as("tk"))
      def grams(n: Int): DataFrame = toks
        .filter(size(col("tk")) >= n)
        .select(col("source"), lit(n.toLong).as("n"), explode(expr(
          s"""transform(sequence(1, size(tk) - ${n - 1}), i ->
             | concat_ws(' ', slice(tk, CAST(i AS INT), $n)))""".stripMargin))
          .as("g"))
      grams(1).unionByName(grams(2)).unionByName(grams(3))
        .groupBy(col("source"), col("n"))
        .agg(count(lit(1)).as("total_ngrams"),
          countDistinct(col("g")).as("distinct_ngrams"))
        .withColumn("diversity_ppm",
          expr("distinct_ngrams * 1000000 div total_ngrams"))
    }, Some(
      """WITH toks AS (
        |  SELECT source, string_split(text, ' ') AS tk FROM documents),
        |g1 AS (
        |  SELECT source, 1 AS n, unnest(tk) AS g FROM toks WHERE len(tk) >= 1),
        |g2 AS (
        |  SELECT source, 2 AS n, array_to_string(tk[i : i + 1], ' ') AS g
        |  FROM toks CROSS JOIN LATERAL (
        |    SELECT unnest(range(1, len(tk))) AS i) v
        |  WHERE len(tk) >= 2),
        |g3 AS (
        |  SELECT source, 3 AS n, array_to_string(tk[i : i + 2], ' ') AS g
        |  FROM toks CROSS JOIN LATERAL (
        |    SELECT unnest(range(1, len(tk) - 1)) AS i) v
        |  WHERE len(tk) >= 3),
        |grams AS (
        |  SELECT * FROM g1 UNION ALL SELECT * FROM g2 UNION ALL SELECT * FROM g3)
        |SELECT source, CAST(n AS BIGINT) AS n,
        |  count(*)::BIGINT AS total_ngrams,
        |  count(DISTINCT g)::BIGINT AS distinct_ngrams,
        |  CAST(count(DISTINCT g) * 1000000 // count(*) AS BIGINT) AS diversity_ppm
        |FROM grams GROUP BY 1, 2""".stripMargin)),

    // ---- calibration bins (the reliability-diagram / ECE input) ---------
    // The companion eval to AUC: a classifier's CONFIDENCE must match its
    // ACCURACY per confidence bin. The "prediction" is a deterministic
    // pseudo-probability (rolling hash of the text, scaled to e6 — the
    // harness stand-in for a model score, reproducible on both engines),
    // the label is lang = 'en', and each decile bin reports count,
    // positives, mean confidence and the |accuracy − confidence| gap as
    // scaled integers — the per-bin inputs of ECE, minus the final
    // weighted sum the caller applies. One scan + a 10-row aggregate.
    CatalogQuery("qa_calibration_bins", (s, d) => {
      val scored = Tables.documents(s, d)
        .select((graft.functions.GraftFunctions.rolling_hash(col("text")) % 1000000L)
          .as("p_e6"),
          (col("lang") === "en").cast("long").as("pos"))
      scored
        .withColumn("bin", expr("p_e6 div 100000"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
          sum(col("p_e6")).as("conf_sum"))
        .withColumn("acc_e6", expr("n_pos * 1000000 div n"))
        .withColumn("conf_e6", expr("conf_sum div n"))
        .withColumn("gap_e6", abs(col("acc_e6") - col("conf_e6")))
        .select(col("bin"), col("n"), col("n_pos"),
          col("acc_e6"), col("conf_e6"), col("gap_e6"))
    }, Some(
      s"""WITH scored AS (
         |  SELECT ${graft.functions.Similarity.rollingHashDuck("text")} % 1000000 AS p_e6,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
         |  FROM documents),
         |b AS (
         |  SELECT p_e6 // 100000 AS bin, count(*)::BIGINT AS n,
         |    sum(pos)::BIGINT AS n_pos, sum(p_e6)::BIGINT AS conf_sum
         |  FROM scored GROUP BY 1)
         |SELECT bin, n, n_pos,
         |  CAST(n_pos * 1000000 // n AS BIGINT) AS acc_e6,
         |  CAST(conf_sum // n AS BIGINT) AS conf_e6,
         |  CAST(abs(n_pos * 1000000 // n - conf_sum // n) AS BIGINT) AS gap_e6
         |FROM b""".stripMargin))
  )
}
