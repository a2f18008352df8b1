package graft.tools

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class ExplainAuditSpec extends SparkSpec {

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

  test("no catalog query forces a fact-table broadcast") {
    graft.analytics.Catalog.all.foreach { q =>
      val plan = q.spark(spark, sf0001).queryExecution.optimizedPlan
      val bc = ExplainAudit.forcedFactBroadcasts(plan)
      assert(bc.isEmpty, s"${q.name} forces broadcast of $bc")
    }
  }
}
