package graft.plans

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def nativeAsOf() = {
    val ev = Tables.events(spark, sf0001)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts"))
    val signups = Tables.events(spark, sf0001) // fresh scan: distinct attr ids
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("su_user"), col("ts").as("signup_ts"))
    AsOf.join(errors, signups,
      Seq("user_id"), Seq("su_user"), "ts", "signup_ts")
      .select(col("error_id"), col("user_id"), col("signup_ts"))
  }

  test("native as-of join matches the union-carry-forward formulation") {
    val native = nativeAsOf()
      .as[(Long, Long, Option[java.time.LocalDateTime])].collect().toSet
    val ev = Tables.events(spark, sf0001)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("is_err"))
    val carried = ev.filter(col("event_type").isin("signup", "error"))
      .withColumn("is_err", when(col("event_type") === "error", 1).otherwise(0))
      .withColumn("signup_ts",
        last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("signup_ts"))
      .as[(Long, Long, Option[java.time.LocalDateTime])].collect().toSet
    assert(native == carried)
    assert(native.nonEmpty)
  }

  test("the physical plan is the custom exec, not a window or generic join") {
    val qe = nativeAsOf().queryExecution
    val execs = graft.tools.ExplainAudit.collectPhysical(qe.executedPlan) {
      case a: AsOfJoinExec => a
    }
    assert(execs.size == 1)
    val txt = qe.executedPlan.toString
    assert(!txt.contains("SortMergeJoin") && !txt.contains("Window"))
  }

  test("latest-at-or-before semantics, strict ordering, and null on no match") {
    val left = Seq((1L, 100L), (1L, 200L), (2L, 50L), (3L, 10L))
      .toDF("k", "t")
    val right = spark.createDataFrame(Seq(
      (1L, 90L, "a"), (1L, 100L, "b"), (1L, 150L, "c"), (2L, 60L, "d")))
      .toDF("rk", "rt", "v")
    val got = AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select(col("k"), col("t"), col("v"))
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got == Set(
      (1L, 100L, Some("b")),  // ties (rt == t) match; latest of 90/100 wins
      (1L, 200L, Some("c")),  // 150 is the newest <= 200
      (2L, 50L, None),        // right exists but only at rt=60 > 50
      (3L, 10L, None)))       // no right key at all
  }

  test("randomized: native as-of equals brute-force max-at-or-before on 500 rows") {
    val rnd = new scala.util.Random(20260812)
    val lRows = Seq.fill(500)((rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong))
    val rRows = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, s"v$k-$t") }
    val left = lRows.toDF("k", "t")
    val right = rRows.toDF("rk", "rt", "v")
    val got = AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select(col("k"), col("t"), col("rt")).as[(Long, Long, Option[Long])]
      .collect().sorted.toSeq
    // brute force on the driver: newest right at-or-before, else None
    val byKey = rRows.groupBy(_._1)
    val want = lRows.map { case (k, t) =>
      val m = byKey.getOrElse(k, Nil).filter(_._2 <= t)
      (k, t, if (m.isEmpty) None else Some(m.map(_._2).max))
    }.sorted
    assert(got == want)
  }

  test("multiple keys per partition do not bleed held state across keys") {
    // single shuffle partition forces every key through ONE merge pass
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val left = Seq((1L, 10L), (2L, 5L), (3L, 10L)).toDF("k", "t")
      val right = Seq((1L, 1L, "x"), (3L, 20L, "y")).toDF("rk", "rt", "v")
      val got = AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
        .select(col("k"), col("v")).as[(Long, Option[String])].collect().toSet
      // key 2 must NOT inherit key 1's held row; key 3's row is too new
      assert(got == Set((1L, Some("x")), (2L, None), (3L, None)))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
