package graft.functions

import graft.SparkSpec
import graft.analytics.Catalog
import org.apache.spark.sql.functions._

/** The general token-array BPE expression vs an independent driver-side
  * reimplementation — randomized tables INCLUDING boundary-colliding and
  * multi-char rules (the cases the global-replace form cannot replay),
  * SQL registration, malformed-rule failure, and the learned-table
  * catalog entry re-derived end-to-end at sf0.001.
  */
class BpeApplySpec extends SparkSpec {
  import spark.implicits._

  /** Reference apply: for each rule in rank order, one left-to-right
    * sweep merging adjacent (l, r) — written against Vectors, not the
    * expression's in-place array walk.
    */
  private def ref(tokens: Vector[String], merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(tokens) { case (toks, (a, b)) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += toks(i); i += 1 }
      }
      out.result()
    }

  private def applyViaExpr(tokens: Seq[Vector[String]],
      merges: Seq[(String, String)]): Seq[Vector[String]] = {
    val mArr = typedLit(merges.map { case (a, b) => Seq(a, b) })
    tokens.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "toks")
      .repartition(4)
      .select(col("id"), GraftFunctions.bpe_apply(col("toks"), mArr).as("enc"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector)
      .sortBy(_._1).map(_._2)
  }

  test("randomized tables (collision-prone, multi-char rules) match the reference") {
    val rng = new scala.util.Random(42)
    val alphabet = "abcd"
    (0 until 30).foreach { trial =>
      // random words as char arrays
      val words = Vector.fill(20)(
        Vector.fill(1 + rng.nextInt(12))(alphabet(rng.nextInt(4)).toString))
      // random merge table built incrementally so later rules can
      // reference EARLIER MERGE OUTPUTS (multi-char left/right sides)
      var vocab = alphabet.map(_.toString).toVector
      val merges = (0 until 6).map { _ =>
        val l = vocab(rng.nextInt(vocab.length))
        val r = vocab(rng.nextInt(vocab.length))
        vocab :+= (l + r)
        (l, r)
      }
      val got = applyViaExpr(words, merges)
      words.zip(got).foreach { case (w, g) =>
        assert(g == ref(w, merges), s"trial $trial word $w merges $merges")
      }
    }
  }

  test("the curated-table entry's semantics reproduce through the expression") {
    // the collision-free table must give identical results either way
    val merges = graft.analytics.CurationQueries.BpeMerges.map { m =>
      val Array(a, b) = m._1.split(" "); (a, b)
    }
    val words = Seq("theatre", "inthe", "andthe", "thinned", "ssll", "rethread")
      .map(_.map(_.toString).toVector)
    assert(applyViaExpr(words, merges) == words.map(ref(_, merges)))
    // and a COLLIDING table diverges from naive global replaces — the
    // reason the expression exists (after 't o'->'to', 'a t' must not
    // steal the t out of 'to')
    val colliding = Seq("t" -> "o", "a" -> "t")
    val w = "ato".map(_.toString).toVector
    assert(ref(w, colliding) == Vector("a", "to"))
    assert(applyViaExpr(Seq(w), colliding).head == Vector("a", "to"))
    val naive = colliding.foldLeft(w.mkString(" ")) { case (acc, (a, b)) =>
      acc.replace(s"$a $b", a + b)
    }
    assert(naive.split(" ").toVector != Vector("a", "to"),
      "global replace should corrupt this table; if not, the test is vacuous")
  }

  test("SQL registration + malformed rules fail loudly") {
    GraftFunctions.register(spark)
    val got = Seq((1L, Seq("t", "h", "e"))).toDF("id", "toks")
      .selectExpr("bpe_apply(toks, array(array('t', 'h'), array('th', 'e'))) AS enc")
      .head.getSeq[String](0)
    assert(got == Seq("the"))
    val e = intercept[Exception] {
      Seq((1L, Seq("a"))).toDF("id", "toks")
        .selectExpr("bpe_apply(toks, array(array('a')))").collect()
    }
    assert(e.getMessage.contains("bpe_apply") ||
      e.getCause != null && e.getCause.getMessage.contains("bpe_apply"))
  }

  test("bpe_decode(bpe_apply(toks, m), m) is the identity — planted multibyte") {
    // ß (2 UTF-8 bytes), 中 (3), 𝄞 (4, a surrogate PAIR in UTF-16) force
    // the byte-vs-char paths; numChars must treat each as ONE character
    val alphabet = Vector("a", "b", "ß", "中", "𝄞")
    val rng = new scala.util.Random(9)
    (0 until 15).foreach { trial =>
      var vocab = alphabet
      val merges = (0 until 5).map { _ =>
        val l = vocab(rng.nextInt(vocab.length))
        val r = vocab(rng.nextInt(vocab.length))
        vocab :+= (l + r)
        (l, r)
      }
      val words = Vector.fill(12)(
        Vector.fill(1 + rng.nextInt(10))(alphabet(rng.nextInt(alphabet.length))))
      val mArr = typedLit(merges.map { case (a, b) => Seq(a, b) })
      val rows = words.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "toks")
        .repartition(3)
        .select(col("id"), col("toks"),
          GraftFunctions.bpe_decode(
            GraftFunctions.bpe_apply(col("toks"), mArr), mArr).as("dec"))
        .as[(Long, Seq[String], String)].collect().sortBy(_._1)
      rows.foreach { case (i, toks, dec) =>
        assert(dec == toks.mkString(""), s"trial $trial word $i")
      }
    }
  }

  test("bpe_decode rejects corrupt streams and malformed tables loudly") {
    val m = typedLit(Seq(Seq("t", "h"), Seq("th", "e")))
    // 'he' is not a product of this table — a corrupt stream
    val e1 = intercept[Exception] {
      Seq((1L, Seq("t", "he"))).toDF("id", "toks")
        .select(GraftFunctions.bpe_decode(col("toks"), m)).collect()
    }
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage).getOrElse(""))
      .contains("corrupt stream"))
    // a table whose rank-2 rule references a never-built token
    val bad = typedLit(Seq(Seq("t", "h"), Seq("xy", "e")))
    val e2 = intercept[Exception] {
      Seq((1L, Seq("t"))).toDF("id", "toks")
        .select(GraftFunctions.bpe_decode(col("toks"), bad)).collect()
    }
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse(""))
      .contains("constructible"))
    // SQL registration
    GraftFunctions.register(spark)
    val got = Seq((1L, Seq("th", "e", "|", "c"))).toDF("id", "toks")
      .selectExpr("bpe_decode(toks, array(array('t','h'))) AS s")
      .head.getString(0)
    assert(got == "the|c")
  }

  test("bpe_decode legal-set cache keys on table VALUE: interleaved tables stay correct") {
    // two different tables alternate row-by-row in ONE partition (one
    // executor thread), so the per-thread closure cache must miss on every
    // switch — a fingerprint collision or stale hit would either accept a
    // corrupt stream or reject a legal one
    val tA = Seq(Seq("t", "h")) // closure {th}
    val tB = Seq(Seq("h", "e")) // closure {he}
    val got = Seq(
      (1L, Seq("th"), tA), (2L, Seq("he"), tB),
      (3L, Seq("th"), tA), (4L, Seq("he"), tB)
    ).toDF("id", "toks", "m").coalesce(1)
      .select(col("id"), GraftFunctions.bpe_decode(col("toks"), col("m")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "th", 2L -> "he", 3L -> "th", 4L -> "he"))
    // a corrupt token still throws on the row AFTER a cached hit of the
    // same table (the cached closure must be the one consulted)
    val e = intercept[Exception] {
      Seq((1L, Seq("th"), tA), (2L, Seq("he"), tA)).toDF("id", "toks", "m")
        .coalesce(1)
        .select(GraftFunctions.bpe_decode(col("toks"), col("m"))).collect()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("corrupt stream"))
  }

  test("txt_bpe_roundtrip at sf0.001: every doc round-trips, merges fired") {
    val rows = Catalog.queries("txt_bpe_roundtrip")(spark, sf0001)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._4), "every document must decode back to its normal form")
    assert(rows.exists(_._3 > 0), "at least one document must contain merged tokens")
    // n_tokens + n_merged re-derive: merged tokens each absorbed one
    // extra char, so n_chars(norm incl sentinels) = n_tokens + n_merged
    val norms = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.toLowerCase.replaceAll("[^a-z ]", "").replaceAll(" +", " ").trim
      }.filter(_._2.nonEmpty).toMap
    rows.foreach { case (id, nTok, nMerged, _) =>
      val norm = norms(id)
      val nonSentinel = norm.count(_ != ' ')
      assert(nTok + nMerged == nonSentinel, s"doc $id")
    }
  }

  test("txt_bpe_encode_learned at sf0.001 matches a full driver-side re-derivation") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val norms = docs.map { case (id, t) =>
      id -> t.toLowerCase.replaceAll("[^a-z ]", "").replaceAll(" +", " ").trim
    }.filter(_._2.nonEmpty)
    // learn: char-pair counts weighted by word frequency, top-8
    val wc = norms.flatMap(_._2.split(" ")).filter(_.length >= 2)
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val pairCounts = wc.toSeq.flatMap { case (w, c) =>
      (0 until w.length - 1).map(i => w.substring(i, i + 2) -> c)
    }.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    val learned = pairCounts.toSeq.sortBy { case (p, n) => (-n, p) }.take(8)
      .map { case (p, _) => (p.substring(0, 1), p.substring(1, 2)) }
    // apply: char tokens with '|' word sentinels
    val exp = norms.map { case (id, norm) =>
      val toks = norm.replace(' ', '|').map(_.toString).toVector
      val enc = ref(toks, learned).filter(_ != "|")
      id -> ((enc.length.toLong, enc.mkString(" ")))
    }.toMap
    val got = Catalog.queries("txt_bpe_encode_learned")(spark, sf0001)
      .as[(Long, Long, String)].collect()
      .map { case (id, n, s) => id -> ((n, s)) }.toMap
    assert(got == exp)
  }
}
