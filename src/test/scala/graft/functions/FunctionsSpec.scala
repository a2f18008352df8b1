package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("rolling_hash matches the reference fold, via codegen path") {
    val df = Seq("abc", "", "the quick brown fox").toDF("text")
    val got = df.select(GraftFunctions.rolling_hash($"text")).as[Long].collect().toSeq
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % (1L << 31))
    assert(got == Seq(ref("abc"), ref(""), ref("the quick brown fox")))
  }

  test("rolling_hash registers for SQL use") {
    GraftFunctions.register(spark)
    val n = spark.sql("SELECT rolling_hash('abc') AS h").as[Long].head()
    assert(n == "abc".getBytes.foldLeft(0L)((a, b) => (a * 31 + b) % (1L << 31)))
  }

  test("text analysis primitives") {
    val df = Seq("the cat sat on the mat").toDF("text")
    val r = df.select(
      size(TextAnalysis.tokens($"text")).as("n"),
      TextAnalysis.stopwordRatio($"text", Seq("the")).as("sr"),
      TextAnalysis.typeTokenRatio(TextAnalysis.tokens($"text")).as("ttr"),
      TextAnalysis.bpeishCount($"text").as("bpe")).head()
    assert(r.getAs[Int]("n") == 6)
    assert(math.abs(r.getAs[Double]("sr") - 2.0 / 6) < 1e-12)
    assert(math.abs(r.getAs[Double]("ttr") - 5.0 / 6) < 1e-12)
    assert(r.getAs[Int]("bpe") == 6)
  }

  test("minhash signatures collide for identical docs, differ for different docs") {
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "z y x w v u t s"))
      .toDF("doc_id", "text")
    val sigs = df.select($"doc_id", expr(Similarity.minhashSpark("text", 9)).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sigs(1L) == sigs(2L) && sigs(1L) != sigs(3L))
  }

  test("lsh bucket is deterministic and within bit range") {
    val df = Seq((1L, Array.fill(64)(0.1f)), (2L, Array.fill(64)(0.1f)))
      .toDF("vec_id", "embedding")
    val b = df.select(expr(Similarity.lshBucketSpark("embedding", 8, 64)).as("b"))
      .as[Long].collect().toSeq
    assert(b(0) == b(1) && b(0) >= 0 && b(0) < 256)
  }

  test("native lsh_buckets matches the SQL-unrolled formulation") {
    val df = Seq((1L, Array.tabulate(64)(i => (math.sin(i + 1) / 2).toFloat)),
      (2L, Array.tabulate(64)(i => (math.cos(i * 3) / 2).toFloat)))
      .toDF("vec_id", "embedding")
    val native = df.select(GraftFunctions.lsh_buckets($"embedding", 8, 4).as("b"))
      .as[Seq[Long]].collect().toSeq
    val unrolled = df.select(expr(Similarity.lshTableBucketsLiteral("embedding", 8, 4, 64)).as("b"))
      .as[Seq[Long]].collect().toSeq
    assert(native == unrolled)
    assert(native.forall(_.forall(b => b >= 0 && b < 16)))
  }

  test("native cosine_sim is bit-identical to the zip_with/aggregate HOF twin") {
    val rnd = new scala.util.Random(42)
    val df = (1 to 50).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f), Array.fill(64)(rnd.nextFloat() - 0.5f)))
      .toDF("id", "a", "b")
    val native = df.select($"id", GraftFunctions.cosine_sim($"a", $"b").as("c"))
      .as[(Long, Double)].collect().toMap
    val hof = df.select($"id", expr(Similarity.cosineSpark("a", "b")).as("c"))
      .as[(Long, Double)].collect().toMap
    // exact equality on the raw doubles — same fold order, same IEEE ops
    assert(native == hof)
  }

  test("native adc_dist is bit-identical to the aggregate-HOF formulation") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() - 0.5),
        rnd.nextInt().toLong & 0xffffffffL, rnd.nextInt().toLong & 0xffffffffL)
    }.toDF("id", "qv", "lo", "hi")
    val native = df.select($"id", GraftFunctions.adc_dist($"qv", $"lo", $"hi").as("d"))
      .as[(Long, Double)].collect().toMap
    // null element propagates to a null distance, same as the HOF fold
    val withNull = Seq((Array[java.lang.Double](1.0, null, 2.0), 5L, 9L)).toDF("qv", "lo", "hi")
    assert(withNull.select(GraftFunctions.adc_dist($"qv", $"lo", $"hi")).head().isNullAt(0))
    val cent =
      """CASE WHEN (CASE WHEN k < 32 THEN shiftright(lo, CAST(k AS INT))
        |     ELSE shiftright(hi, CAST(k - 32 AS INT)) END) % 2 = 1
        |   THEN 0.25D ELSE -0.25D END""".stripMargin
    val hof = df.select($"id", expr(
      s"""aggregate(sequence(0, 63), CAST(0 AS DOUBLE), (acc, k) ->
         | acc + (element_at(qv, CAST(k + 1 AS INT)) - $cent)
         |     * (element_at(qv, CAST(k + 1 AS INT)) - $cent))""".stripMargin).as("d"))
      .as[(Long, Double)].collect().toMap
    // exact equality on the raw doubles — same fold order, same IEEE ops
    assert(native == hof)
  }

  test("cosine_sim handles double arrays and mixed float/double sides") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0, 2.0, 3.0))).toDF("f", "d")
    val c = df.select(GraftFunctions.cosine_sim($"f", $"d").as("c")).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-15)
    val cd = df.select(GraftFunctions.cosine_sim($"d", $"d").as("c")).as[Double].head()
    assert(cd == 1.0)
  }

  test("lsh_buckets registers for SQL with literal args") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT size(lsh_buckets(array(CAST(0.1 AS FLOAT), CAST(-0.2 AS FLOAT)), 8, 4)) AS n")
      .as[Int].head()
    assert(n == 8)
    intercept[Exception](spark.sql("SELECT lsh_buckets(array(CAST(1.0 AS FLOAT)))").collect())
  }

  test("native simhash32 is bit-identical to the SQL-HOF formulation") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "a completely different document with other words entirely"),
      (4L, "x"),
      (5L, "")).toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("toks"))
      // a NULL token must hash like the SQL twin (poisons to 0)
      .unionByName(Seq(6L).toDF("doc_id")
        .withColumn("toks", array(lit("a"), lit(null).cast("string"))))
    val native = docs.select($"doc_id", GraftFunctions.simhash32($"toks").as("h"))
      .as[(Long, Long)].collect().toMap
    val sql = docs.select($"doc_id", expr(Similarity.simhashFromToks("toks")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(native == sql)
    assert(native(1L) == native(2L) && native(1L) != native(3L))
    // SQL registration works too
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("sh_docs")
    assert(spark.sql("SELECT simhash32(toks) FROM sh_docs WHERE doc_id = 1")
      .as[Long].head() == native(1L))
  }

  test("native minhash_hex is bit-identical to the SQL-HOF formulation") {
    val docs = Seq(
      (1L, "one two three four five six seven"),
      (2L, "one two three four five six seven"),
      (3L, "totally different words in this particular document here"))
      .toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", expr(Similarity.shinglesFromToks("toks")).as("sh"))
    val native = docs.select($"doc_id", GraftFunctions.minhash_hex($"sh", 9).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    val sql = docs.select($"doc_id", expr(Similarity.minhashFromShingles("sh", 9)).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    assert(native == sql)
    assert(native(1L) == native(2L) && native(1L) != native(3L))
    assert(native(1L).size == 9 && native(1L).forall(_.length == 32))
  }

  test("hyperplane signs extend past 128 dims (block-chained md5, stable below)") {
    // below 128: unchanged derivation (oracle compatibility)
    assert((0 until 128).forall(k =>
      Similarity.hyperplaneSign(3, k) == Similarity.hyperplaneSign(3, k)))
    // at/after 128: defined, deterministic, ±1, and not a copy of block 0
    val hi = (0 until 256).map(k => Similarity.hyperplaneSign(3, k))
    assert(hi.forall(s => s == 1 || s == -1))
    assert(hi.take(128) != hi.drop(128))
    // a 256-dim embedding flows through the native expression end to end
    val df = Seq((1L, Array.tabulate(256)(i => (math.sin(i + 1) / 2).toFloat)))
      .toDF("vec_id", "embedding")
    val b = df.select(GraftFunctions.lsh_buckets($"embedding", 8, 4).as("b"))
      .as[Seq[Long]].head()
    assert(b.size == 8 && b.forall(x => x >= 0 && x < 16))
  }

  test("normalize_text: ascii fast path lowercases, accents fold, nulls pass") {
    val df = Seq(
      Some("Hello WORLD"),      // pure-ASCII fast path
      Some("\u00c1r\u00e9\u00e1 \u00ce\u0303"), // precomposed + combining tilde
      Some(""),
      None).toDF("t")
    val got = df.select(GraftFunctions.normalize_text($"t")).as[Option[String]]
      .collect().toSeq
    assert(got == Seq(Some("hello world"), Some("area i"), Some(""), None))
  }

  test("normalize_text: codegen and interpreted paths agree, SQL name registers") {
    GraftFunctions.register(spark)
    val sql = spark.sql("SELECT normalize_text('\u00c7a Va Tr\u00e8s Bien') AS n")
      .as[String].head()
    assert(sql == "ca va tres bien")
    // interpreted path (eval through a filter that defeats codegen is
    // brittle; call the static helper directly instead)
    val direct = graft.functions.NormalizeText.normalize(
      org.apache.spark.unsafe.types.UTF8String.fromString("\u00c7a Va Tr\u00e8s Bien"))
    assert(direct.toString == "ca va tres bien")
  }
  test("zorder2: randomized bit-by-bit reference agreement + monotone box bound") {
    import org.scalacheck.Gen
    def reference(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val gen = for {
      x <- Gen.choose(0L, 65535L); y <- Gen.choose(0L, 65535L)
    } yield (x, y)
    val seed = org.scalacheck.rng.Seed(42L)
    Iterator.iterate((seed, 0)) { case (sd, n) => (sd.next, n + 1) }
      .take(500).foreach { case (sd, _) =>
        val (x, y) = gen.pureApply(org.scalacheck.Gen.Parameters.default, sd)
        assert(ZOrder2.interleave(x, y) == reference(x, y), s"($x, $y)")
        // box bound: both coords < 2^k  =>  z < 2^(2k)
        val k = 64 - java.lang.Long.numberOfLeadingZeros(math.max(x, y) | 1L)
        assert(ZOrder2.interleave(x, y) < (1L << (2 * k)), s"box bound ($x, $y)")
      }
  }

}
