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
      // wrong arity surfaces as the standard WRONG_NUM_ARGS analysis
      // error for every registered function — 2-arg AND 1-arg shapes
      // (a bare children(1)/children.head would throw IndexOutOfBounds/
      // NoSuchElement, and extra args would be silently discarded)
      for (sql <- Seq(
          "SELECT cosine_sim(array(CAST(1.0 AS FLOAT)))", // 1 of 2
          "SELECT zorder2(1)", // 1 of 2
          "SELECT normalize_text()", // 0 of 1
          "SELECT rolling_hash('a', 'b')", // 2 of 1
          "SELECT simhash32(array('a'), 1)")) { // 2 of 1
        val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(sql).collect())
        assert(e.getErrorClass == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION", s"$sql -> ${e.getMessage}")
      }
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
