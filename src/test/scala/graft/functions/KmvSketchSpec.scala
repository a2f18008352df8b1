package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The KMV TypedImperativeAggregate's algebra, driven through real
  * Spark aggregation (32 partitions force the partial → merge path)
  * and at the buffer level (serde, merge-vs-rebuild equivalence).
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def kSmallestDistinct(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  test("distributed sketch = k smallest distinct, independent of partitioning") {
    val rng = new scala.util.Random(7)
    val xs = Seq.fill(5000)(rng.nextLong() % 1000) // heavy duplication
    val df = xs.toDF("h").repartition(32)
    val got = df.agg(GraftFunctions.kmv_sketch(col("h"), 32).as("s"))
      .head.getSeq[Long](0)
    assert(got == kSmallestDistinct(xs, 32))
  }

  test("grouped sketches + SQL registration; nulls ignored") {
    val rows = (0 until 1000).map(i => (s"g${i % 3}", (i * 2654435761L) % 10000))
    val df = rows.toDF("g", "h")
      .withColumn("h", when(col("h") % 97 === 0, lit(null)).otherwise(col("h")))
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      "SELECT g, kmv_sketch(h, 8) AS s FROM kmv_in GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val vals = grp.map(_._2).filter(_ % 97 != 0)
      assert(viaSql(g) == kSmallestDistinct(vals, 8), s"group $g")
    }
    // arity guard
    val e = intercept[Exception] {
      spark.sql("SELECT kmv_sketch(h) FROM kmv_in").collect()
    }
    assert(e.getMessage.contains("kmv_sketch"))
  }

  test("buffer algebra: merge equals rebuild; serde round-trips; trim keeps k") {
    val agg = KmvSketch(org.apache.spark.sql.GraftShims.expression(col("x")), 5)
    def sketchOf(xs: Seq[Long]) = {
      val b = agg.createAggregationBuffer()
      val one = KmvSketch(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.LongType, nullable = false), 5)
      xs.foreach { v =>
        one.update(b, org.apache.spark.sql.catalyst.InternalRow(v))
      }
      b
    }
    val a = sketchOf(Seq(10L, 3L, 7L, 3L, 99L, 5L, 1L))
    val c = sketchOf(Seq(2L, 8L, 1L, 50L, 4L))
    val merged = agg.merge(agg.deserialize(agg.serialize(a)),
      agg.deserialize(agg.serialize(c)))
    val rebuilt = sketchOf(Seq(10L, 3L, 7L, 3L, 99L, 5L, 1L, 2L, 8L, 1L, 50L, 4L))
    import scala.jdk.CollectionConverters._
    assert(merged.asScala.toSeq == rebuilt.asScala.toSeq)
    assert(merged.size == 5)
    assert(merged.asScala.toSeq ==
      kSmallestDistinct(Seq(10L, 3L, 7L, 99L, 5L, 1L, 2L, 8L, 50L, 4L), 5)
        .map(java.lang.Long.valueOf))
  }

  test("type check refuses non-bigint input") {
    val bad = KmvSketch(org.apache.spark.sql.GraftShims.expression(lit("abc")), 4)
    assert(bad.checkInputDataTypes().isFailure)
  }
}
