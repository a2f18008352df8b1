package graft.analytics

import graft.SparkSpec
import graft.SparkEntry

class CatalogSpec extends SparkSpec {

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("catalog names are unique") {
    val names = Catalog.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every catalog query executes at sf0.001 and returns a schema") {
    Catalog.all.foreach { q =>
      val df = q.spark(spark, sf0001)
      assert(df.schema.nonEmpty, q.name)
      assert(df.count() >= 0, q.name)
    }
  }

  test("bench subset is non-empty and all present in catalog") {
    assert(Catalog.benchNames.nonEmpty)
    assert(Catalog.benchNames.toSet.subsetOf(Catalog.queries.keySet))
  }

  test("SQL front door: registerAll exposes every table and graft functions to spark.sql") {
    graft.core.Tables.registerAll(spark, sf0001)
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
    assert(spark.sql(
      "SELECT o_orderstatus, count(*) FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1")
      .count() > 0)
    assert(spark.sql("SELECT rolling_hash(text) FROM documents LIMIT 1").count() == 1)
    assert(spark.sql("SELECT count(*) FROM events WHERE ts IS NOT NULL").head().getLong(0) > 0)
  }
}
