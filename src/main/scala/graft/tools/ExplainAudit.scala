package graft.tools

import graft.analytics.Catalog
import graft.core.Engine

/** Plan auditor: prints the formatted physical plan for named catalog
  * queries (default: the bench set) and flags the scale smells the build
  * guide calls out — missing parquet pushdown, unexpected
  * BroadcastNestedLoopJoin / CartesianProduct, and narrow
  * WholeStageCodegen coverage.
  *
  * Usage: runMain graft.tools.ExplainAudit [sfDir] [query ...]
  */
object ExplainAudit {

  /** Tables whose size scales with the data — a *forced* broadcast of any
    * of these is an OOM at 100x even when it happens to fit today. The
    * corpus tables (documents/embeddings/events) scale exactly like the
    * TPC-H facts; the scalarBounded exemption keeps 1-row aggregates over
    * them from false-positive flagging.
    */
  private[graft] val factTables =
    Set("lineitem", "orders", "part", "customer", "supplier",
      "documents", "embeddings", "events")

  /** Queries whose cross product is the algorithm, with a bounded small
    * side the auditor cannot PROVE bounded: the brute-force baseline
    * (labeled small-N baseline) and the CROSS JOIN semantics entry
    * (region 5 × priorities 5). The IVF centroid scorer and the recall
    * report used to live here too — both now reduce their small side to a
    * provable 1-row aggregate, so the structural bound covers them.
    */
  private[graft] val intentionalCrossProducts =
    Set("sim_cosine_topk_bruteforce", "join_cross_region_priority",
      // embeds the brute-force baseline as its ground truth (twice: once
      // for the truth count, once for the hit semi-join), so its plan
      // carries that query's documented non-equi BNLJ; its OWN final
      // cross is two 1-row aggregates and needs no exemption
      "sim_lsh_recall",
      // retrieval-quality evals: ground truth is BY DEFINITION the exact
      // brute-force ranking (queries × corpus, the
      // sim_cosine_topk_bruteforce regime — production draws queries
      // from a bounded eval set, and an eval harness that pruned its
      // own ground truth would measure nothing)
      "sim_quantized_mrr_eval", "emb_matryoshka_eval")
      // sim_pq_adc_topk left this list in round 7: its query batch now
      // collapses to a provable 1-row aggregate before the broadcast, so
      // the structural bound covers it — and the composed
      // sim_ivfpq_adc_topk replaces the flat scan with an equi-join on
      // probed cells (no cross anywhere)

  /** Parquet table names scanned anywhere under a logical subtree. */
  private def scannedTables(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Set[String] =
    p.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.getName.stripSuffix(".parquet")).toSeq
          case _ => Seq.empty[String]
        }
    }.flatten.toSet

  /** A join side whose optimized `maxRows` is provably ≤ 1 — a global
    * aggregate (scalar threshold / max / average). Broadcasting such a
    * side is correct at ANY scale regardless of which tables feed it:
    * the aggregation reduces the fact scan to one row before the
    * exchange. Catalyst derives maxRows structurally (Aggregate with no
    * grouping keys → Some(1)), so this is a proof, not a size estimate.
    */
  private[graft] def scalarBounded(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    p.maxRows.exists(_ <= 1L)

  /** Walk a physical plan crossing AQE node boundaries: AdaptiveSparkPlanExec
    * and QueryStageExec are leaf-like (their subtree hangs off a field, not
    * `children`), so a plain `plan.collect` stops at them.
    */
  private[graft] def collectPhysical[T](p: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case other                    => other.children
    }
    pf.lift(p).toSeq ++ kids.flatMap(collectPhysical(_)(pf))
  }

  /** Unwrap the row-count-preserving spine (exchanges, stages, codegen
    * wrappers, project/filter/sort — none of these can GROW the row
    * count) down to the first node that can change cardinality.
    */
  @annotation.tailrec
  private[graft] def spine(
      x: org.apache.spark.sql.execution.SparkPlan): org.apache.spark.sql.execution.SparkPlan = {
    import org.apache.spark.sql.execution.{FilterExec, InputAdapter, ProjectExec, SortExec, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
    x match {
      case a: AdaptiveSparkPlanExec  => spine(a.executedPlan)
      case q: QueryStageExec         => spine(q.plan)
      case r: ReusedExchangeExec     => spine(r.child)
      case e: Exchange               => spine(e.child)
      case w: WholeStageCodegenExec  => spine(w.child)
      case i: InputAdapter           => spine(i.child)
      case pr: ProjectExec           => spine(pr.child)
      case f: FilterExec             => spine(f.child)
      case s: SortExec               => spine(s.child)
      case other                     => other
    }
  }

  /** A physical join side that provably produces ≤ 1 row: walk the spine
    * and check whether it bottoms out at a global aggregate (no grouping
    * keys → one row). This ties the proof to the NODE's own input, unlike
    * a plan-global count of scalar joins, so a genuine fact×fact cartesian
    * elsewhere in the same plan cannot hide behind it.
    */
  private[graft] def boundedPhysicalSide(
      p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    spine(p) match {
      // a global aggregate (final or complete mode included — partial-only
      // would still be ≤ numPartitions rows, so require empty grouping
      // which makes every mode collapse to one row after the final step;
      // the spine above the final agg is what the join actually reads)
      case agg: BaseAggregateExec => agg.groupingExpressions.isEmpty
      // a GLOBAL limit ≤ 1 is exactly as provable: whatever the child
      // produces, at most one row crosses it (argmax-style picks —
      // orderBy.limit(1) compiles to TakeOrderedAndProject)
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec =>
        t.limit <= 1
      case g: org.apache.spark.sql.execution.GlobalLimitExec =>
        g.limit <= 1
      case c: org.apache.spark.sql.execution.CollectLimitExec =>
        c.limit <= 1
      case _ => false
    }
  }

  /** Queries whose partitionless window runs over an input that is
    * bounded by CONSTRUCTION but not structurally provable to the spine
    * walk — every entry here must carry a comment at the window site
    * stating the bound. (A partitionless `Window.orderBy` over an
    * unbounded input is the driver-side-sort scale-killer class: the
    * whole input lands in ONE task. Provably-bounded inputs — a global
    * limit, a rank-pushdown WindowGroupLimit, a 1-row aggregate — pass
    * the structural check and never need listing.)
    */
  private[graft] val boundedGlobalWindows: Set[String] = Set(
    // per-SOURCE mixture/apportionment: every window input is the
    // per-source aggregate — source count is config-bounded (a mixture
    // has a handful of named sources), never data-bounded
    "mix_source_alpha_weights", "mix_token_budget_apportion",
    "mix_budget_enforce_selection", "mix_temperature_weights",
    // per-SHARD largest-remainder apportionment: window input is the
    // 8-row shard aggregate
    "mix_dsir_resample_budget",
    // frequency-band profile: window input is the ≤6-row band aggregate
    "skw_key_distribution_profile",
    // per-day cumulative: window input is the day-level aggregate
    // (calendar-bounded)
    "evt_cumulative_unique_users",
    // two-level prefix sum: the global window runs over SHARD cardinality
    // (corpus/64) — documented at the site; a third level bounds it
    // further if shards outgrow one task
    "smp_weighted_systematic",
    // merge-plan rank: the global window runs over segment METADATA
    // (corpus/1000 rows — the scale Lucene's merge policy plans at on
    // one node); a shard-level pre-pack bounds it further if needed
    "idx_cdc_segment_compaction",
    // documented bound: the curriculum ramp is a one-off planning query
    // over the per-doc token counts; the site carries the 100 TB
    // alternative in comments (PrepQueries)
    "prep_length_curriculum",
    // score-level rank: input is the distinct-quantized-score aggregate
    // (score domain is quantized → config-bounded), the exact-AUC shape
    // that avoids the per-row global rank anti-pattern
    "qa_auc_ranking",
    // Q.exactNtile offset table: its prefix-sum window input is
    // ≤ spark.sql.shuffle.partitions rows by construction
    "evt_rfm_segmentation", "txt_perplexity_buckets")

  /** Partitionless WindowExec nodes whose input is not provably bounded:
    * a global limit (any constant), a rank-pushdown WindowGroupLimit
    * (the optimizer already cut the input to ≤ limit rows per partition),
    * or a global aggregate all bound the single task's input; anything
    * else sorts the full input in one task and is flagged.
    */
  private[graft] def unboundedGlobalWindows(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    def boundedInput(c: org.apache.spark.sql.execution.SparkPlan): Boolean =
      spine(c) match {
        case agg: BaseAggregateExec => agg.groupingExpressions.isEmpty
        case _: WindowGroupLimitExec => true
        case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
        case _: org.apache.spark.sql.execution.GlobalLimitExec => true
        case _: org.apache.spark.sql.execution.CollectLimitExec => true
        case _ => false
      }
    collectPhysical(p) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.collect { case w if !boundedInput(w.child) => w.nodeName }
  }

  /** BNLJ/cartesian nodes in the executed plan where NEITHER side is
    * provably 1-row-bounded — each physical node is judged on its own
    * children (structural), not covered by a count of scalar joins
    * elsewhere in the plan.
    */
  private[graft] def unexplainedCrossJoins(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    collectPhysical(p) {
      case j: BroadcastNestedLoopJoinExec => (j.nodeName, Seq(j.left, j.right))
      case j: CartesianProductExec        => (j.nodeName, Seq(j.left, j.right))
    }.collect { case (name, sides) if !sides.exists(boundedPhysicalSide) => name }
  }

  /** Fact tables under an explicit BROADCAST hint in the optimized plan.
    * This looks at logical hints, not runtime BroadcastExchanges: an AQE
    * runtime broadcast is size-gated (safe — it degrades to shuffle at
    * scale), while a hint forces the broadcast at any scale. Sides that
    * are scalar-bounded (1-row aggregates over a fact) are exempt.
    */
  private[graft] def forcedFactBroadcasts(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Set[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
    plan.collect {
      case j: Join =>
        Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).collect {
          case (Some(h), side)
              if h.strategy.contains(BROADCAST) && !scalarBounded(side) =>
            scannedTables(side).intersect(factTables)
        }.flatten
    }.flatten.toSet
  }

  /** Structural checks on one foreachBatch inner frame — the same three
    * scale classes the entry-level audit flags (single-partition windows
    * over unbounded input, BNLJ/cartesian with no provable 1-row side,
    * forced fact broadcasts). Runs SYNCHRONOUSLY inside the probe: the
    * frame's lazy plan can reference snapshot generations a later merge
    * garbage-collects.
    */
  private def auditInnerFrame(site: String,
      df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.queryExecution.executedPlan.execute().foreachPartition(_ => ())
    val badCross = unexplainedCrossJoins(df.queryExecution.executedPlan)
    val badWin = unboundedGlobalWindows(df.queryExecution.executedPlan)
    val factBc = forcedFactBroadcasts(df.queryExecution.optimizedPlan)
    Seq(
      s"unbounded cross join(s) ${badCross.mkString(",")}" -> badCross.nonEmpty,
      "single-partition global window(s) over unbounded input" -> badWin.nonEmpty,
      s"forced broadcast of fact table(s) ${factBc.mkString(",")}" -> factBc.nonEmpty
    ).collect { case (s, true) => s }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Catalog.benchNames
    val spark = Engine.local("explain-audit", cores = 4)
    names.foreach { n =>
      // foreachBatch seam: audit the FIRST micro-batch frame per site as
      // the stream runs during entry construction — inner serving/merge
      // plans are otherwise invisible to the entry-level audit below
      val innerResults =
        scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
      graft.core.AuditSeam.install { (site, bdf) =>
        if (!innerResults.contains(site))
          innerResults(site) = auditInnerFrame(site, bdf)
      }
      val df = try Catalog.queries(n)(spark, sfDir)
        finally graft.core.AuditSeam.uninstall()
      // execute THIS plan instance so its AQE finalizes (df.count()/write
      // build a fresh QueryExecution and leave this one isFinalPlan=false)
      df.queryExecution.executedPlan.execute().foreachPartition(_ => ())
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // codegen spans show as `*(n)` in the executed plan's simple form
      val simple = df.queryExecution.executedPlan.toString
      println(s"\n========== $n ==========")
      println(plan)
      val factBc = forcedFactBroadcasts(df.queryExecution.optimizedPlan)
      // each physical BNLJ/cartesian is judged on its OWN sides: allowed
      // only if one side is a provable 1-row aggregate, or the query is on
      // the documented bounded-side allowlist. A scalar-bounded join
      // elsewhere in the plan cannot cover an unrelated fact×fact cross.
      val crossNodes = collectPhysical(df.queryExecution.executedPlan) {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j.nodeName
        case j: org.apache.spark.sql.execution.joins.CartesianProductExec        => j.nodeName
      }
      val badCross =
        if (intentionalCrossProducts.contains(n)) Seq.empty
        else unexplainedCrossJoins(df.queryExecution.executedPlan)
      val badWin =
        if (boundedGlobalWindows.contains(n)) Seq.empty
        else unboundedGlobalWindows(df.queryExecution.executedPlan)
      val smells = Seq(
        s"unbounded cross join(s) ${badCross.mkString(",")}" -> badCross.nonEmpty,
        s"single-partition global window(s) over unbounded input" -> badWin.nonEmpty,
        "no WholeStageCodegen" -> !simple.contains("*("),
        "scan without pushed filters" ->
          (plan.contains("PushedFilters: []") && plan.contains("Filter (")),
        s"forced broadcast of fact table(s) ${factBc.mkString(",")}" -> factBc.nonEmpty
      ).collect { case (s, true) => s }
      val note =
        if (crossNodes.nonEmpty && badCross.isEmpty &&
            !intentionalCrossProducts.contains(n))
          " (scalar-bounded cross: 1-row aggregate side)"
        else if (crossNodes.nonEmpty && intentionalCrossProducts.contains(n))
          " (bounded-side cross product: documented intentional)"
        else ""
      println(if (smells.isEmpty) s"[audit] $n: clean$note"
        else s"[audit] $n: SMELLS: ${smells.mkString(", ")}")
      innerResults.foreach { case (site, inner) =>
        println(if (inner.isEmpty) s"[audit] $n [$site]: clean"
          else s"[audit] $n [$site]: SMELLS: ${inner.mkString(", ")}")
      }
    }
    spark.stop()
  }
}
