package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private def skewed() =
    ((1 to 900).map(i => ("hot", i.toLong, 1.0)) ++
      (1 to 100).map(i => (s"k$i", i.toLong, 2.0)))
      .toDF("k", "id", "v")

  test("two-phase salted aggregation equals direct aggregation") {
    val df = skewed()
    val direct = df.groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("c"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Scale.twoPhaseAgg(df, Seq($"k"), Seq($"id"), 16)(
      _.agg(sum($"v").as("s"), count(lit(1)).as("c")),
      _.agg(sum($"s").as("s"), sum($"c").as("c")))
      .as[(String, Double, Long)].collect().toSet
    assert(salted == direct)
  }

  test("salted join equals plain join") {
    val big = skewed()
    val small = Seq(("hot", "HOT"), ("k1", "K1"), ("k2", "K2")).toDF("k", "label")
    val plain = big.join(small, Seq("k")).select($"id", $"label")
      .as[(Long, String)].collect().sorted.toSeq
    val salted = Scale.saltedJoin(big, small, "k", 8, Seq($"id"))
      .select($"id", $"label").as[(Long, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("salt is deterministic and bounded") {
    val df = Seq(1L, 2L, 3L).toDF("id")
    val a = df.select(Scale.salt(Seq($"id"), 16)).as[Long].collect().toSeq
    val b = df.select(Scale.salt(Seq($"id"), 16)).as[Long].collect().toSeq
    assert(a == b && a.forall(s => s >= 0 && s < 16))
  }

  test("bucketed write enables shuffle-free join on bucket keys") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS li_agg_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val li = graft.core.Tables.lineitem(spark, sf0001)
        .select($"l_orderkey", $"l_quantity")
      Scale.writeBucketed(li, "li_bucketed", Seq("l_orderkey"), 8)
      Scale.writeBucketed(li.groupBy($"l_orderkey").agg(sum(Q_dec($"l_quantity")).as("q")),
        "li_agg_bucketed", Seq("l_orderkey"), 8)

      val joined = spark.table("li_bucketed")
        .join(spark.table("li_agg_bucketed"), Seq("l_orderkey"))
      joined.queryExecution.executedPlan.execute().foreachPartition(_ => ())
      val plan = joined.queryExecution.executedPlan.toString
      // both sides pre-bucketed on the key: the join needs no shuffle
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS li_agg_bucketed")
    }
  }

  private def Q_dec(c: org.apache.spark.sql.Column) =
    c.cast(org.apache.spark.sql.types.DecimalType(12, 2))
}
