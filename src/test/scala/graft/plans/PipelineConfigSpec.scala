package graft.plans

import graft.SparkSpec
import graft.operators.TransformChain
import org.apache.spark.sql.functions._

class PipelineConfigSpec extends SparkSpec {
  import spark.implicits._

  private val config =
    """{
      |  "name": "orders-replication",
      |  "filters": [
      |    {"type": "accept", "match-schema": "db*", "match-dml-op": ["insert", "update"]},
      |    {"type": "rename-columns", "from": ["amt"], "to": ["amount"]},
      |    {"type": "expr", "column": "amount_cents", "sql": "CAST(amount * 100 AS BIGINT)"}
      |  ],
      |  "routes": [
      |    {"match-schema": "db0", "target-schema": "cold", "target-table": "orders_cold"},
      |    {"match-schema": "db*", "target-schema": "hot", "target-table": "*"}
      |  ],
      |  "pk": ["id"],
      |  "checkpoint": "/tmp/ckpt-cfg"
      |}""".stripMargin

  test("json config compiles to a runnable plan") {
    val plan = PipelineConfig.parse(config)
    assert(plan.name == "orders-replication")
    assert(plan.pkCols == Seq("id"))
    assert(plan.transforms.size == 3)
    assert(plan.router.isDefined)

    val env = Seq(
      ("db0", "orders", "insert", 1L, 10.5),
      ("db1", "orders", "delete", 2L, 99.0), // dropped by accept
      ("db1", "orders", "update", 3L, 20.0),
      ("zz", "orders", "insert", 4L, 1.0)) // dropped by accept
      .toDF("database", "table", "op", "id", "amt")

    val out = plan.router.get.assign(TransformChain(plan.transforms)(env))
    val rows = out.select("id", "amount_cents", "tgt_schema", "tgt_table")
      .as[(Long, Long, String, String)].collect().toSet
    assert(rows == Set(
      (1L, 1050L, "cold", "orders_cold"),
      (3L, 2000L, "hot", "orders")))
  }

  test("missing required fields fail loudly") {
    intercept[IllegalArgumentException](PipelineConfig.parse("""{"name": "x"}"""))
    intercept[IllegalArgumentException](
      PipelineConfig.parse("""{"name":"x","pk":["id"],"filters":[{"type":"nope"}]}"""))
  }
}
