package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side re-derivations for the curation wave — each oracle entry
  * also has an independent reimplementation here (token-array BPE,
  * Cholesky PSD, exhaustive merge-table safety), the CdcQueries spec
  * discipline.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = graft.core.Engine.local("curation-spec", cores = 4)
  private val sf = "/root/testdata/sf0.001"

  /** Reference BPE apply on the token ARRAY: each merge in rank order,
    * one sweep left-to-right replacing adjacent pairs — the semantics
    * the string-replace chain must match.
    */
  private def bpeArray(word: String): Vector[String] = {
    var toks = word.map(_.toString).toVector
    CurationQueries.BpeMerges.foreach { case (from, to) =>
      val Array(a, b) = from.split(" ")
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += to; i += 2
        } else { out += toks(i); i += 1 }
      }
      toks = out.result()
    }
    toks
  }

  test("BPE merge table is boundary-collision-free at every rank") {
    // invariant: when merge k applies, no token producible by merges
    // 0..k-1 (or a single char) other than the pattern's own left part
    // ends with that left part's last char sequence in a way that a
    // string replace could false-match. Exhaustively: for every rank k
    // and every pair (L, R) of then-existing tokens, the spaced string
    // "L R" must contain the pattern "a b" ONLY IF (L, R) == (a, b).
    val merges = CurationQueries.BpeMerges
    merges.zipWithIndex.foreach { case ((from, to), k) =>
      val existing = ("abcdefghijklmnopqrstuvwxyz".map(_.toString) ++
        merges.take(k).map(_._2)).toVector
      val Array(a, b) = from.split(" ")
      for (l <- existing; r <- existing) {
        val joined = s"$l $r"
        if (joined.contains(from))
          assert((l, r) == ((a, b)),
            s"rank $k '$from'->'$to' false-matches across tokens ('$l','$r')")
      }
      // and the merged token must not itself contain a space
      assert(!to.contains(" "))
    }
  }

  test("string-replace BPE equals token-array BPE on the corpus' words") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("text")).as[String].collect()
    val corpus = docs.flatMap(_.toLowerCase.replaceAll("[^a-z ]", "")
      .split(" +")).filter(_.nonEmpty).distinct
    // plus adversarial words exercising overlapping / repeated / nested
    // merge sites beyond what the corpus vocabulary happens to contain
    val words = (corpus ++ Seq("thende", "anand", "thethe", "ssll",
      "android", "theatre", "thinned", "ononon", "rethread", "landlord",
      "ssssss", "inthe", "andthe", "rere", "llll")).distinct
    assert(words.length > 40)
    words.foreach { w =>
      val spaced = w.map(_.toString).mkString(" ")
      val viaReplace = CurationQueries.BpeMerges
        .foldLeft(spaced) { case (acc, (f, t)) => acc.replace(f, t) }
      assert(viaReplace.split(" ").toVector == bpeArray(w),
        s"divergence on word '$w'")
    }
  }

  test("txt_bpe_encode: token counts match a per-doc array re-derivation") {
    import spark.implicits._
    val got = Catalog.queries("txt_bpe_encode")(spark, sf)
      .select("doc_id", "n_tokens", "n_chars")
      .as[(Long, Long, Long)].collect()
      .map { case (k, v, c) => k -> ((v, c)) }.toMap
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    docs.foreach { case (id, text) =>
      val norm = text.toLowerCase.replaceAll("[^a-z ]", "")
        .replaceAll(" +", " ").trim
      if (norm.nonEmpty) {
        val expTokens = norm.split(" ").map(w => bpeArray(w).length.toLong).sum
        val expChars = norm.replace(" ", "").length.toLong
        assert(got(id) == ((expTokens, expChars)), s"doc $id")
      } else assert(!got.contains(id))
    }
  }

  test("emb_covariance_gram: assembled matrix is symmetric-complete and PSD") {
    val rows = Catalog.queries("emb_covariance_gram")(spark, sf).collect()
    assert(rows.length == 64 * 65 / 2)
    val n = rows.head.getAs[Long]("n").toDouble
    // cov[i][j] = cov_num / n^2 (the n·Σxy − ΣxΣy sum form)
    val cov = Array.ofDim[Double](64, 64)
    rows.foreach { r =>
      val (i, j) = (r.getAs[Long]("i").toInt, r.getAs[Long]("j").toInt)
      val v = r.getAs[Long]("cov_num").toDouble / (n * n)
      cov(i)(j) = v; cov(j)(i) = v
    }
    // PSD check: x^T C x >= 0 for a batch of pseudo-random x (a true
    // covariance matrix is PSD by construction; a sign slip in the
    // n·Σxy − ΣxΣy assembly would break it immediately)
    val rng = new scala.util.Random(42)
    (0 until 32).foreach { _ =>
      val x = Array.fill(64)(rng.nextDouble() - 0.5)
      val q = (0 until 64).map(i =>
        x(i) * (0 until 64).map(j => cov(i)(j) * x(j)).sum).sum
      assert(q >= -1e-6, s"covariance not PSD: quadratic form $q")
    }
  }

  test("er_record_linkage: every variant resolves to its own master at distance 1") {
    import spark.implicits._
    val rows = Catalog.queries("er_record_linkage")(spark, sf)
      .select("record_id", "canonical_id", "match_dist")
      .as[(Long, Long, Long)].collect()
    val (masters, variants) = rows.partition(_._1 < 1000000L)
    assert(masters.forall { case (r, c, d) => r == c && d == 0L })
    assert(variants.nonEmpty)
    variants.foreach { case (r, c, d) =>
      assert(c == r - 1000000L, s"variant $r linked to $c")
      assert(d == 1L, s"variant $r matched at distance $d")
    }
    assert(variants.length == masters.length)
  }

  test("sim_pq_train_codebooks: full subspace coverage, members conserved") {
    val rows = Catalog.queries("sim_pq_train_codebooks")(spark, sf).collect()
    val bySub = rows.groupBy(_.getAs[Long]("subspace"))
    assert(bySub.keySet == (0L to 7L).toSet)
    val nVecs = graft.core.Tables.embeddings(spark, sf).count()
    bySub.foreach { case (m, rs) =>
      // every surviving code carries exactly 8 dims; membership over the
      // subspace's codes partitions the vector set
      rs.groupBy(_.getAs[Long]("code")).foreach { case (code, dims) =>
        assert(dims.map(_.getAs[Long]("dim")).toSet == (0L to 7L).toSet,
          s"subspace $m code $code dims")
        assert(dims.map(_.getAs[Long]("n_members")).distinct.length == 1)
      }
      val members = rs.groupBy(_.getAs[Long]("code"))
        .map(_._2.head.getAs[Long]("n_members")).sum
      assert(members == nVecs, s"subspace $m members $members != $nVecs")
    }
  }

  test("sim_trained_adc_topk matches a full driver-side train→encode→ADC re-derivation") {
    import spark.implicits._
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .sortBy(_._1)
    val q = vecs.map { case (id, e) =>
      id -> e.map(x => math.floor(x.toDouble * 64.0 + 0.5).toLong) }.toMap
    def sub(v: Array[Long], m: Int): Array[Long] = v.slice(m * 8, m * 8 + 8)
    def d2(a: Array[Long], b: Array[Long], s: Long): Long =
      a.indices.map(k => { val d = s * a(k) - b(k); d * d }).sum
    // train: seed codes 0..15, one assignment, 1/256-lattice refine
    val codebook = (0 until 8).map { m =>
      val seeds = (0L until 16L).map(c => c -> sub(q(c), m)).toMap
      val assign = q.keys.map { id =>
        id -> seeds.minBy { case (c, cv) => (d2(sub(q(id), m), cv, 1L), c) }._1
      }.toMap
      val cb = assign.groupBy(_._2).map { case (code, members) =>
        val qs = members.keys.map(id => sub(q(id), m)).toVector
        val n = qs.length.toLong
        code -> (0 until 8).map { k =>
          val s = qs.map(_(k)).sum
          val num = 256L * s
          (num - (((num % n) + n) % n)) / n
        }.toArray
      }
      m -> cb
    }.toMap
    // encode at the refined scale; ADC vs vec 0's exact subvectors
    val dists = q.keys.map { id =>
      id -> (0 until 8).map { m =>
        val code = codebook(m).minBy { case (c, cv) =>
          (d2(sub(q(id), m), cv, 256L), c) }._1
        d2(sub(q(0L), m), codebook(m)(code), 256L)
      }.sum
    }.toMap
    val expected = dists.toSeq.sortBy { case (id, dd) => (dd, id) }.take(10)
      .zipWithIndex.map { case ((id, dd), i) => (id, dd, (i + 1).toLong) }
    val got = Catalog.queries("sim_trained_adc_topk")(spark, sf)
      .select("vec_id", "adc_dist", "rank").as[(Long, Long, Long)]
      .collect().sortBy(_._3).toSeq
    assert(got == expected)
  }

  test("gph_min_label_components matches 4-round min propagation on the collected graph") {
    import spark.implicits._
    val co = graft.core.Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .join(graft.core.Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey"),
        org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .select(org.apache.spark.sql.functions.expr("o_custkey * 2").as("a"),
        org.apache.spark.sql.functions.expr("l_suppkey * 2 + 1").as("b"))
      .distinct().as[(Long, Long)].collect()
    val adj = (co ++ co.map(_.swap)).groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).toSet }
    var lbl = adj.keys.map(v => v -> v).toMap
    (1 to 4).foreach { _ =>
      lbl = lbl.map { case (v, l) =>
        v -> math.min(l, adj(v).map(lbl).min)
      }
    }
    val expected = lbl.map { case (v, l) =>
      val node = if (v % 2 == 0) s"c${v / 2}" else s"s${(v - 1) / 2}"
      node -> l
    }
    val got = Catalog.queries("gph_min_label_components")(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(got == expected)
    // the undirected co-occurrence graph is near-fully connected: after
    // 4 rounds the dominant label must cover almost everything
    val top = got.values.groupBy(identity).map(_._2.size).max
    assert(top > got.size / 2)
  }

  test("gph_label_propagation_communities matches 3-round synchronous majority propagation") {
    import spark.implicits._
    val co = graft.core.Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .join(graft.core.Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey"),
        org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .select(org.apache.spark.sql.functions.expr("o_custkey * 2").as("a"),
        org.apache.spark.sql.functions.expr("l_suppkey * 2 + 1").as("b"))
      .distinct().as[(Long, Long)].collect()
    val adj = (co ++ co.map(_.swap)).groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).toSeq }
    var lbl = adj.keys.map(v => v -> v).toMap
    (1 to 3).foreach { _ =>
      val prev = lbl
      lbl = prev.map { case (v, l) =>
        // most-frequent neighbor label, ties broken by the SMALLER label —
        // the same total order the entry and its oracle rank by
        val counts = adj(v).map(prev).groupBy(identity)
          .map { case (k, g) => (k, g.size) }
        v -> counts.toSeq.sortBy { case (k, c) => (-c, k) }.head._1
      }
    }
    val expected = lbl.map { case (v, l) =>
      (if (v % 2 == 0) s"c${v / 2}" else s"s${(v - 1) / 2}") -> l }
    val got = Catalog.queries("gph_label_propagation_communities")(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(got == expected)
    // majority propagation finds COMMUNITY structure: more than one label
    // survives (where min-label would drain toward one component min)
    assert(got.values.toSet.size > 1)
  }

  test("ddp_containment_pairs: planted excerpts score 1.0; scores equal the set ratio") {
    import spark.implicits._
    val got = Catalog.queries("ddp_containment_pairs")(spark, sf)
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got.nonEmpty)
    // re-derive the shingle sets incl. the planted excerpts, quadratic
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "lang", "source", "text")
      .as[(Long, String, String, String)].collect()
    val plus = docs ++ docs.filter(_._1 % 10 == 0).map(d => d.copy(_1 = d._1 + 1000000L))
    val withExc = plus ++ plus.collect {
      case (id, lang, src, text) if id % 37 == 0 && text.split(" ", -1).length >= 10 =>
        val toks = text.split(" ", -1)
        (id + 5000000L, lang, src, toks.take(3 * toks.length / 5).mkString(" "))
    }
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      (0 until math.max(0, toks.length - 2))
        .map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
    }
    val sh = withExc.map(d => (d._1, d._2, d._3, shingles(d._4))).filter(_._4.nonEmpty)
    val exp = (for {
      a <- sh; b <- sh
      if a._1 != b._1 && a._2 == b._2 && a._3 == b._3
      c = (a._4 & b._4).size.toDouble / a._4.size
      if c >= 0.9
    } yield (a._1, b._1) -> c).toMap
    assert(got == exp, "containment pairs must equal the quadratic recompute")
    // the planted excerpt twins are found with containment exactly 1.0
    val planted = got.filter { case ((a, b), _) => a >= 5000000L && a - 5000000L == b }
    assert(planted.nonEmpty && planted.values.forall(_ == 1.0),
      "every planted excerpt must be contained in its source at 1.0")
  }

  test("smp_kcenter_diversity matches a driver-side greedy farthest-point re-derivation") {
    import spark.implicits._
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val q = vecs.map { case (id, e) =>
      id -> e.map(x => math.floor(x.toDouble * 64.0 + 0.5).toLong) }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(k => { val d = a(k) - b(k); d * d }).sum
    var md = q.map { case (id, v) => id -> d2(v, q(0L)) }
    val expected = Seq.newBuilder[(Long, Long, Long)]
    expected += ((1L, 0L, 0L))
    (2 to 4).foreach { rank =>
      val (pick, dist) = md.toSeq.maxBy { case (id, m) => (m, -id) }
      expected += ((rank.toLong, pick, dist))
      md = md.map { case (id, m) => id -> math.min(m, d2(q(id), q(pick))) }
    }
    val got = Catalog.queries("smp_kcenter_diversity")(spark, sf)
      .select("sel_rank", "vec_id", "sep_dist").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == expected.result())
    // selections are genuinely spread: each new pick was farther than
    // zero from everything before it
    assert(got.drop(1).forall(_._3 > 0))
  }

  test("txt_html_strip round-trips every document; perplexity buckets partition the corpus") {
    val strip = Catalog.queries("txt_html_strip")(spark, sf).collect()
    assert(strip.nonEmpty && strip.forall(_.getAs[Boolean]("round_trip_ok")))
    val buckets = Catalog.queries("txt_perplexity_buckets")(spark, sf).collect()
    assert(buckets.map(_.getAs[Long]("bucket")).sorted.toSeq == Seq(1L, 2L, 3L))
    val total = buckets.map(_.getAs[Long]("n_docs")).sum
    val scored = graft.core.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.expr("size(split(text, ' ')) >= 2")).count()
    assert(total == scored)
    // buckets are ordered head -> tail by score
    val byBucket = buckets.map(r =>
      r.getAs[Long]("bucket") -> (r.getAs[Long]("min_p_e9"), r.getAs[Long]("max_p_e9"))).toMap
    assert(byBucket(1L)._1 >= byBucket(2L)._2 || byBucket(1L)._2 >= byBucket(2L)._1)
    assert(byBucket(2L)._1 >= byBucket(3L)._2 || byBucket(2L)._2 >= byBucket(3L)._1)
  }

  test("emb_int8_quantize_calibrated matches a driver re-derivation; codes in range") {
    val got = Catalog.queries("emb_int8_quantize_calibrated")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 64.0 + 0.5).toLong).toVector)
    val lo = (0 until 64).map(k => vecs.map(_._2(k)).min)
    val hi = (0 until 64).map(k => vecs.map(_._2(k)).max)
    val exp = vecs.map { case (id, q) =>
      val cs = (0 until 64).map { k =>
        if (hi(k) > lo(k)) (q(k) - lo(k)) * 255 / (hi(k) - lo(k)) else 0L }
      val errs = (0 until 64).map { k =>
        val deq = if (hi(k) > lo(k)) lo(k) + (cs(k) * (hi(k) - lo(k)) + 127) / 255
                  else lo(k)
        math.abs(q(k) - deq) }
      id -> ((cs.zipWithIndex.map { case (c, k) => (k + 1) * c }.sum,
        errs.sum, errs.max, 0L))
    }.toMap
    assert(got == exp)
    // every code in [0,255] (gated oob = 0) and the codebook is used
    // broadly, not collapsed to a corner
    assert(got.values.forall(_._4 == 0L))
    assert(vecs.flatMap { case (_, q) => (0 until 64).map { k =>
      if (hi(k) > lo(k)) (q(k) - lo(k)) * 255 / (hi(k) - lo(k)) else 0L } }
      .distinct.length > 32, "codes must span the int8 range")
  }

  test("txt_kneser_ney_bigram matches a driver re-derivation; backoff mass flows") {
    val got = Catalog.queries("txt_kneser_ney_bigram")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val bg = texts.flatMap { t =>
      val tk = t.split(" ", -1)
      if (tk.length < 2) Nil else tk.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val cb = bg.groupBy(identity).map { case (p, g) => p -> g.length.toLong }
    val c1 = cb.toSeq.groupBy(_._1._1).map { case (w, g) => w -> g.map(_._2).sum }
    val n1l = cb.toSeq.groupBy(_._1._1).map { case (w, g) => w -> g.size.toLong }
    val n1r = cb.toSeq.groupBy(_._1._2).map { case (w, g) => w -> g.size.toLong }
    val nt = cb.size.toLong
    val exp = cb.map { case ((w1, w2), c) =>
      val t1 = math.max(4 * c - 3, 0L) * 1000000000L / (4 * c1(w1))
      val t2 = 3 * n1l(w1) * (n1r(w2) * 1000000000L / nt) / (4 * c1(w1))
      (w1, w2) -> ((c, t1 + t2))
    }
    assert(got == exp)
    // the KN structure is real: probabilities are proper (≤ 1e9), and
    // the continuation term contributes for singleton bigrams (where the
    // discounted MLE term is max(4·1−3,0)/4c1 — tiny)
    assert(got.values.forall(_._2 <= 1000000000L))
    val singleton = exp.collectFirst { case (k, (c, p)) if c == 1 && p > 0 => k }
    assert(singleton.isDefined, "singleton bigrams must carry backoff mass")
  }

  /** Pure replica of the relational star rounds (same emit rules). */
  private def largeStarRef(e: Set[(Long, Long)]): Set[(Long, Long)] = {
    val adj = e ++ e.map(_.swap)
    adj.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val vs = es.map(_._2)
      val m = math.min(u, vs.min)
      vs.filter(_ > u).map(v => (v, m))
    }.filter(p => p._1 != p._2).toSet
  }

  private def smallStarRef(e: Set[(Long, Long)]): Set[(Long, Long)] = {
    val dir = e.map(p => (math.max(p._1, p._2), math.min(p._1, p._2)))
    dir.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val vs = es.map(_._2)
      val m = vs.min
      vs.toSeq.map(v => (v, m)) :+ ((u, m))
    }.filter(p => p._1 != p._2).toSet
  }

  test("unigram Viterbi tokenization matches an independent driver DP") {
    import spark.implicits._
    val got = Catalog.queries("txt_unigram_viterbi_tokenize")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val words = graft.core.Tables.documents(spark, sf)
      .select("text").as[String].collect()
      .flatMap(_.split(" ", -1)).filter(w => w.length >= 2 && w.length <= 12)
    val wfreq = words.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val pfreq = wfreq.keys.toSeq
      .flatMap(w => for {
        l <- 1 to 4; if l <= w.length
        p <- 0 to (w.length - l)
      } yield w.substring(p, p + l))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val vocab = pfreq.collect {
      case (p, f) if f >= 3 || p.length == 1 => p -> 1000000L / f
    }
    val exp = wfreq.map { case (w, f) =>
      val dp = Array.fill(w.length + 1)(Long.MaxValue)
      dp(0) = 0L
      for (i <- 1 to w.length; j <- math.max(0, i - 4) until i) {
        vocab.get(w.substring(j, i)).foreach { c =>
          if (dp(j) != Long.MaxValue)
            dp(i) = math.min(dp(i), dp(j) + c * 17 + 1)
        }
      }
      w -> (f, dp(w.length) / 17, dp(w.length) % 17)
    }
    assert(got == exp, s"got ${got.size} words, expected ${exp.size}")
    // the vocabulary must genuinely compress: some word segments into
    // fewer pieces than characters, and nothing segments into zero
    assert(got.exists { case (w, (_, _, np)) => np < w.length },
      "some word must use a multi-char piece")
    assert(got.values.forall(_._3 >= 1))
  }

  test("unigram EM learn: full hard-EM replay matches; pruning drops genuinely-redundant pieces") {
    import spark.implicits._
    val got = Catalog.queries("txt_unigram_em_learn")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val wordsArr = graft.core.Tables.documents(spark, sf)
      .select("text").as[String].collect()
      .flatMap(_.split(" ", -1)).filter(w => w.length >= 2 && w.length <= 8)
    val wfreq = wordsArr.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val pfreq = wfreq.keys.toSeq
      .flatMap(w => for { l <- 1 to 4; if l <= w.length; p <- 0 to (w.length - l) }
        yield w.substring(p, p + l))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val vocab0 = pfreq.collect {
      case (p, f) if f >= 3 || p.length == 1 => p -> 1000000L / f
    }.toMap
    def dpOf(w: String, vocab: Map[String, Long]): Array[Long] = {
      val dp = Array.fill(w.length + 1)(Long.MaxValue)
      dp(0) = 0L
      for (i <- 1 to w.length; j <- math.max(0, i - 4) until i)
        vocab.get(w.substring(j, i)).foreach { c =>
          if (dp(j) != Long.MaxValue) dp(i) = math.min(dp(i), dp(j) + c * 17 + 1)
        }
      dp
    }
    // the entry's backtrack rule: at each position the chosen edge is the
    // MIN-J edge satisfying the Viterbi optimality equation
    def chosenPath(w: String, vocab: Map[String, Long]): Seq[String] = {
      val dp = dpOf(w, vocab)
      var i = w.length
      val out = Seq.newBuilder[String]
      while (i > 0) {
        val j = (math.max(0, i - 4) until i).find { j =>
          vocab.get(w.substring(j, i))
            .exists(c => dp(j) != Long.MaxValue && dp(j) + c * 17 + 1 == dp(i))
        }.get
        out += w.substring(j, i)
        i = j
      }
      out.result()
    }
    def usageOf(vocab: Map[String, Long]): Map[String, Long] =
      wfreq.toSeq.flatMap { case (w, f) => chosenPath(w, vocab).map(_ -> f) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    def mstep(vocab: Map[String, Long], usage: Map[String, Long]): Map[String, Long] = {
      val u = vocab.keys.map(p => p -> usage.getOrElse(p, 0L)).toMap
      val multi = u.filter(_._1.length >= 2).toSeq
        .sortBy { case (p, us) => (-us, p) }
      val kept = multi.take(multi.size * 4 / 5) ++ u.filter(_._1.length == 1)
      kept.map { case (p, us) => p -> 1000000L / (us + 1) }.toMap
    }
    val u1 = usageOf(vocab0)
    val vocab1 = mstep(vocab0, u1)
    val vocab2 = mstep(vocab1, usageOf(vocab1))
    val exp = wfreq.map { case (w, f) =>
      val m = dpOf(w, vocab2)(w.length)
      w -> (f, m / 17, m % 17)
    }
    assert(got == exp, s"got ${got.size} words, expected ${exp.size}")
    // the pruning pin: round 1 must drop a piece that is corpus-frequent
    // (it EARNED a vocab0 slot, pfreq >= 3) yet never chosen by any
    // optimal segmentation — the genuinely-redundant case EM exists for
    val pruned = vocab0.keySet.filter(_.length >= 2) -- vocab1.keySet
    assert(pruned.nonEmpty, "EM round 1 must prune some multi-char piece")
    assert(pruned.exists(p => u1.getOrElse(p, 0L) == 0L && pfreq(p) >= 3),
      "some pruned piece must be corpus-frequent but never used")
    // and feasibility survives pruning: every word still segments
    assert(got.values.forall(_._3 >= 1))
  }

  test("large-star/small-star CC: true components; chain converges in O(log^2) rounds") {
    import spark.implicits._
    // ground truth by union-find over the full co-occurrence graph
    val co = graft.core.Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .join(graft.core.Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey"),
        org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .select(org.apache.spark.sql.functions.expr("o_custkey * 2").as("a"),
        org.apache.spark.sql.functions.expr("l_suppkey * 2 + 1").as("b"))
      .distinct().as[(Long, Long)].collect()
    val m = MiningQueries.mergeGroups(co.toSeq)
    val verts = co.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = verts.map { v =>
      val node = if (v % 2 == 0) s"c${v / 2}" else s"s${(v - 1) / 2}"
      node -> m.getOrElse(v, v)
    }.toMap
    val got = Catalog.queries("gph_largestar_smallstar_cc")(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(got == expected, s"got ${got.size} nodes, expected ${expected.size}")
    // the round-count claim the entry rests on: a 40-edge path converges
    // in a handful of star rounds where synchronous min-label needs 40
    val chain = (0L until 40L).map(i => (i, i + 1)).toSet
    var e = chain; var rounds = 0
    while ({
      val next = smallStarRef(largeStarRef(e)); val ch = next != e; e = next
      rounds += 1; ch
    }) ()
    assert(e == (1L to 40L).map(v => (v, 0L)).toSet, s"fixpoint must be a 0-rooted star: $e")
    assert(rounds <= 8, s"star rounds on the 40-chain must be O(log^2 n), got $rounds")
    // synchronous min-label on the same chain is still unconverged at 8 rounds
    val adj = (chain ++ chain.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
    var lbl = adj.keys.map(v => v -> v).toMap
    (1 to 8).foreach { _ =>
      lbl = lbl.map { case (v, l) => v -> math.min(l, adj(v).map(lbl).min) }
    }
    assert(lbl.values.toSet.size > 1, "min-label must still be unconverged at 8 rounds")
  }
}
