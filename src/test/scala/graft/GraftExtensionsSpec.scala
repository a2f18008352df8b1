package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions wires rolling_hash into SQL") {
    // extensions bind at session construction: retire any shared session
    // first (suites run sequentially; later suites lazily rebuild)
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      val got = spark.sql("SELECT rolling_hash('abc') AS h").as[Long].head()
      val want = "abc".getBytes("UTF-8")
        .foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % (1L << 31))
      assert(got == want)
      // all four native expressions resolve through the extensions path
      assert(spark.sql("SELECT size(lsh_buckets(array(CAST(0.5 AS FLOAT)), 8, 4))")
        .as[Int].head() == 8)
      assert(spark.sql("SELECT simhash32(array('a','b'))").as[Long].head() ==
        graft.functions.SimHash32.compute(
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
            Array(org.apache.spark.unsafe.types.UTF8String.fromString("a"),
              org.apache.spark.unsafe.types.UTF8String.fromString("b")))))
      assert(spark.sql("SELECT size(minhash_hex(array('s1','s2'), 9))")
        .as[Int].head() == 9)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
