package graft

import graft.analytics.Catalog
import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (Catalog.benchNames) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop write forces full materialization of every output column
    // (count() can shortcut scans/projections)
    def run(name: String): Unit =
      Catalog.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val names = if (Catalog.benchNames.nonEmpty) Catalog.benchNames else Catalog.queries.keys.toSeq
    // one warm-up pass so JIT/codegen/file-listing don't dominate timings
    names.foreach { n => try run(n) catch { case _: Throwable => () } }
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try run(name) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
