package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  test("flagship config pipeline: kill mid-stream, restart, both sinks converge") {
    val state = PipelineE2E.run(spark)
      .select("tgt_table", "id", "v").as[(String, Long, String)].collect().toSet

    // independent expectation straight from the generator's contract
    // (CdcRateSource.rowFor): last op per (db, id) wins, deletes drop
    val expected = spark.range(0, 2000).select(
      col("id").as("seq"),
      when(col("id") % 10 === 7 || col("id") % 10 === 8, "update")
        .when(col("id") % 10 === 9, "delete").otherwise("insert").as("op"),
      concat(lit("db"), col("id") % 2).as("db"),
      (col("id") % 101).as("k"),
      upper(concat(lit("v"), col("id"))).as("v"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("db", "k").orderBy(col("seq").desc)))
      .filter(col("rn") === 1 && col("op") =!= "delete")
      .select(
        when(col("db") === "db0", "t_a").otherwise("t_b").as("tgt_table"),
        col("k").as("id"), col("v"))
      .as[(String, Long, String)].collect().toSet

    assert(expected.nonEmpty)
    assert(state == expected)
    // the same id value must appear under BOTH targets somewhere — the
    // per-(target, pk) compaction key is what this asserts
    val ids = state.groupBy(_._2).view.mapValues(_.map(_._1).size)
    assert(ids.exists(_._2 == 2), "expected at least one id routed to both targets")
  }
}
