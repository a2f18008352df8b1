package graft.tools

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class ExplainAuditSpec extends SparkSpec {

  test("AuditSeam: probe sees reported inner frames; uninstalled seam is a pass-through") {
    import graft.core.AuditSeam
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    AuditSeam.install((site, df) => { seen += s"$site:${df.columns.mkString(",")}"; () })
    try {
      val df = Tables.nation(spark, sf0001).select(col("n_nationkey"))
      val out = AuditSeam.report("x/stage", df)
      assert(out eq df, "report must be a pass-through")
      assert(seen.toSeq == Seq("x/stage:n_nationkey"))
      // a poison inner frame — partitionless window over an unbounded scan,
      // the class the seam exists to catch — is visible to the probe and
      // flagged by the same structural check the entry-level audit uses
      val poison = Tables.orders(spark, sf0001).withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("o_orderkey"))))
      AuditSeam.report("x/poison", poison)
      assert(seen.size == 2)
      assert(ExplainAudit.unboundedGlobalWindows(
        poison.queryExecution.executedPlan).nonEmpty)
    } finally AuditSeam.uninstall()
    seen.clear()
    AuditSeam.report("y", Tables.nation(spark, sf0001))
    assert(seen.isEmpty, "uninstalled seam must not fire")
  }

  test("every foreachBatch body in the catalog reports through the seam") {
    // run one representative streaming entry and one pipeline entry; the
    // full per-site clean sweep is the ExplainAudit main run (SURVEY §8)
    import graft.core.AuditSeam
    val sites = scala.collection.mutable.LinkedHashSet.empty[String]
    AuditSeam.install((site, _) => { sites += site; () })
    try graft.analytics.Catalog.queries("idx_stream_serve_bm25")(spark, sf0001).collect()
    finally AuditSeam.uninstall()
    assert(sites.contains("idx_stream_serve_bm25/postings") &&
      sites.contains("idx_stream_serve_bm25/serve"), s"got $sites")
  }

  test("forcedFactBroadcasts flags a broadcast hint over a fact scan") {
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    val bad = li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
    assert(ExplainAudit.forcedFactBroadcasts(bad.queryExecution.optimizedPlan)
      .contains("orders"))
  }

  test("forcedFactBroadcasts ignores dim broadcasts and unhinted joins") {
    val o = Tables.orders(spark, sf0001)
    val c = Tables.customer(spark, sf0001)
    val n = Tables.nation(spark, sf0001)
    val ok = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
    assert(ExplainAudit.forcedFactBroadcasts(ok.queryExecution.optimizedPlan).isEmpty)
  }

  test("a broadcast 1-row aggregate over a fact table is scalar-bounded, not flagged") {
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    val thresh = li.agg(max(col("l_extendedprice")).as("mx"))
    val ok = o.crossJoin(broadcast(thresh)).filter(col("o_totalprice") > col("mx"))
    assert(ExplainAudit.forcedFactBroadcasts(ok.queryExecution.optimizedPlan).isEmpty)
    // but a grouped aggregate (unbounded row count) over a fact still flags
    val grouped = li.groupBy(col("l_orderkey")).agg(max(col("l_extendedprice")).as("mx"))
    val bad = o.join(broadcast(grouped), col("o_orderkey") === col("l_orderkey"))
    assert(ExplainAudit.forcedFactBroadcasts(bad.queryExecution.optimizedPlan)
      .contains("lineitem"))
  }

  test("unexplainedCrossJoins flags a fact×fact cartesian") {
    val li = Tables.lineitem(spark, sf0001).select(col("l_orderkey"))
    val o = Tables.orders(spark, sf0001).select(col("o_orderkey"))
    val bad = o.crossJoin(li)
    assert(ExplainAudit.unexplainedCrossJoins(bad.queryExecution.executedPlan).nonEmpty)
  }

  test("unexplainedCrossJoins passes a scalar-threshold cross") {
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    val thresh = li.agg(max(col("l_extendedprice")).as("mx"))
    val ok = o.crossJoin(thresh).filter(col("o_totalprice") > col("mx"))
    assert(ExplainAudit.unexplainedCrossJoins(ok.queryExecution.executedPlan).isEmpty)
  }

  test("a scalar-bounded equi-join elsewhere cannot cover a separate fact cross") {
    // the count-based blind spot: a scalar-bounded join that compiles to a
    // hash join "paid for" an unrelated cartesian under bnljCount <= scalarJoins
    val li = Tables.lineitem(spark, sf0001).select(col("l_orderkey"))
    val o = Tables.orders(spark, sf0001)
    val thresh = li.agg(max(col("l_orderkey")).as("mx"))
    val mixed = o.join(broadcast(thresh), col("o_orderkey") === col("mx"))
      .crossJoin(li.as("li2"))
    assert(ExplainAudit.unexplainedCrossJoins(mixed.queryExecution.executedPlan).nonEmpty)
  }

  test("a limit(1) argmax pick is a bounded cross side; limit(2) is not") {
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    val pick1 = li.orderBy(col("l_extendedprice").desc).limit(1)
    val ok = o.crossJoin(broadcast(pick1))
    assert(ExplainAudit.unexplainedCrossJoins(ok.queryExecution.executedPlan).isEmpty)
    val pick2 = li.orderBy(col("l_extendedprice").desc).limit(2)
    val bad = o.crossJoin(broadcast(pick2))
    assert(ExplainAudit.unexplainedCrossJoins(bad.queryExecution.executedPlan).nonEmpty)
  }

  test("factTables covers the corpus tables") {
    assert(Set("documents", "embeddings", "events")
      .subsetOf(ExplainAudit.factTables))
  }

  test("no catalog query forces a fact-table broadcast") {
    graft.analytics.Catalog.all.foreach { q =>
      val plan = q.spark(spark, sf0001).queryExecution.optimizedPlan
      val bc = ExplainAudit.forcedFactBroadcasts(plan)
      assert(bc.isEmpty, s"${q.name} forces broadcast of $bc")
    }
  }

  test("unboundedGlobalWindows flags a partitionless window over a fact") {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, sf0001)
    val bad = o.withColumn("rk",
      row_number().over(Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
    assert(ExplainAudit.unboundedGlobalWindows(bad.queryExecution.executedPlan).nonEmpty)
  }

  test("unboundedGlobalWindows passes rank-pushdown, limited, and scalar inputs") {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, sf0001)
    // rank <= k filter → InferWindowGroupLimit cuts the window input to
    // ≤ k rows per partition before the single-partition final sort
    val pushed = o.withColumn("rk",
        row_number().over(Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
      .filter(col("rk") <= 10)
    assert(ExplainAudit.unboundedGlobalWindows(pushed.queryExecution.executedPlan).isEmpty)
    // an explicit global limit below the window is equally bounded
    val limited = o.orderBy(col("o_totalprice")).limit(64)
      .withColumn("cum", sum(col("o_totalprice")).over(
        Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
    assert(ExplainAudit.unboundedGlobalWindows(limited.queryExecution.executedPlan).isEmpty)
    // a partitioned window is never flagged regardless of input size
    val partitioned = o.withColumn("rk",
      row_number().over(Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))))
    assert(ExplainAudit.unboundedGlobalWindows(partitioned.queryExecution.executedPlan).isEmpty)
  }

  test("no catalog query has a single-partition global window outside the allowlist") {
    val bad = graft.analytics.Catalog.all
      .filterNot(q => ExplainAudit.boundedGlobalWindows.contains(q.name))
      .flatMap { q =>
        val hits = ExplainAudit.unboundedGlobalWindows(
          q.spark(spark, sf0001).queryExecution.executedPlan)
        if (hits.isEmpty) Nil else Seq(q.name -> hits)
      }
    assert(bad.isEmpty, s"single-partition global windows: $bad")
  }

  test("no catalog query has an unexplained cross join outside the allowlist") {
    graft.analytics.Catalog.all
      .filterNot(q => ExplainAudit.intentionalCrossProducts.contains(q.name))
      .foreach { q =>
        val bad = ExplainAudit.unexplainedCrossJoins(
          q.spark(spark, sf0001).queryExecution.executedPlan)
        assert(bad.isEmpty, s"${q.name} has unexplained cross join(s): $bad")
      }
  }
}
