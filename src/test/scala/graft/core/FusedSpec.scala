package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FusedSpec extends SparkSpec {

  test("checkpointCount returns the frame's rows and the exact count in one job") {
    import spark.implicits._
    val df = Seq(1, 2, 3, 4, 5).toDF("x").filter(col("x") > 1)
    val (out, n) = Fused.checkpointCount(df, count(lit(1)))
    assert(n == 4)
    assert(out.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3, 4, 5))
    // the CollectMetrics node must not survive the checkpoint: downstream
    // plans see a plain checkpointed leaf
    assert(!out.queryExecution.optimizedPlan.toString.contains("CollectMetrics"))
  }

  test("checkpointCount is 0 on an empty frame (count is defined on empty)") {
    import spark.implicits._
    val df = Seq(1).toDF("x").filter(col("x") > 99)
    val (out, n) = Fused.checkpointCount(df, count(lit(1)))
    assert(n == 0)
    assert(out.isEmpty)
  }

  test("checkpointIntSet returns the exact distinct set in one job") {
    import spark.implicits._
    val df = Seq(1, 2, 3, 4, 5, 5, 4).toDF("x")
    val (out, s) = Fused.checkpointIntSet(df, pmod(col("x"), lit(3)).cast("int"))
    assert(s == Set(0, 1, 2))
    assert(out.count() == 7, "the checkpointed frame keeps all rows")
    val (_, empty) = Fused.checkpointIntSet(df.filter(col("x") > 99), col("x"))
    assert(empty == Set.empty[Int], "collect_set over zero rows is the empty set")
  }

  test("conditional count(when(...)) matches a filter-then-count on the same frame") {
    import spark.implicits._
    val df = Seq((1, true), (2, false), (3, true), (4, false), (5, false))
      .toDF("x", "chg")
    val (out, n) = Fused.checkpointCount(df, count(when(col("chg"), lit(1))))
    assert(n == out.filter(col("chg")).count())
    assert(n == 2)
    assert(out.count() == 5, "the checkpointed frame keeps ALL rows, not just matches")
  }
}
