package graft.analytics

import graft.SparkSpec

/** Bit-determinism across runs for the float-heavy queries: the driver
  * hashes values, so a result that varies with partitioning/reduction
  * order (raw double sums, unstable ties) would flake the gate even when
  * "approximately" right. Two independent executions must collect
  * identical rows.
  */
class DeterminismSpec extends SparkSpec {

  private val floatHeavy = Seq(
    "q1_pricing_summary",          // decimal-exact aggregation scheme
    "q14_promo_revenue_share",     // double division at the edge
    "sim_lsh_ann_topk",            // window ranks over cosine scores
    "ddp_embed_cosine_pairs",      // LSH candidates + rounded cosine
    "evt_session_windows",         // session assembly + decimal sums
    "agg_two_phase_skew",          // salted partial aggregation
    "agg_exact_percentiles",       // interpolated quantiles
    "qa_value_outliers",           // sqrt-derived 3-sigma threshold compare
    "sim_ivf_kmeans_refined",      // integer Lloyd loop, window tie-breaks
    "idx_cdc_maintained_bm25")     // double BM25 scores + rank ties over
                                   // state rebuilt in a fresh scratch sink
                                   // per invocation

  test("float-heavy queries collect identical results across independent runs") {
    floatHeavy.foreach { name =>
      val fn = Catalog.queries(name)
      // sorted multiset, not a Set: runs differing only in duplicate-row
      // multiplicity must fail too (the driver hashes the full result)
      def snapshot(): Seq[String] =
        fn(spark, sf0001).collect().map(_.toString).toSeq.sorted
      val a = snapshot()
      val b = snapshot()
      assert(a == b, s"$name differed between runs")
      assert(a.nonEmpty, name)
    }
  }
}
