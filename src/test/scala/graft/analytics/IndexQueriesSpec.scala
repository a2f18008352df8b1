package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants for the indexing/diagnostics battery — the exact
  * values are gated by the DuckDB oracle; these specs pin the properties
  * that survive data changes.
  */
class IndexQueriesSpec extends SparkSpec {

  test("tfidf: exactly one top term per doc, positive score") {
    val r = Catalog.queries("txt_tfidf_top_terms")(spark, sf0001)
    val n = r.count()
    assert(n == r.select("doc_id").distinct().count())
    assert(r.filter(col("score") <= 0).count() == 0)
  }

  test("inverted index: df bounds, postings only for df<=8 and sorted") {
    val r = Catalog.queries("txt_inverted_index_shingles")(spark, sf0001)
    assert(r.filter(col("df") < 2).count() == 0)
    assert(r.filter(col("df") > 8 && col("postings").isNotNull).count() == 0)
    assert(r.filter(col("df") <= 8 && col("postings").isNull).count() == 0)
    val bad = r.filter(col("postings").isNotNull).filter(
      size(split(col("postings"), ",")) =!= col("df")).count()
    assert(bad == 0, "postings length must equal df")
  }

  test("gap-fill: spine is dense per user, observed rows keep their value") {
    val r = Catalog.queries("evt_gapfill_linear_interpolation")(spark, sf0001)
    // dense spine: row count per user == hours between min and max + 1
    val spans = r.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      ((unix_timestamp(max("h")) - unix_timestamp(min("h"))) / 3600 + 1)
        .cast("long").as("expect"))
    assert(spans.filter(col("n") =!= col("expect")).count() == 0)
    // every row has a filled value (spine is bracketed by observations)
    assert(r.filter(col("v_filled").isNull).count() == 0)
    // interpolated values stay within the neighboring observed bounds is
    // not generally true (avg per hour), but observed rows echo v exactly:
    assert(r.filter(col("observed") && col("v_filled").isNull).count() == 0)
  }

  test("pagerank: rank mass conserved within damping rounding, all nodes positive") {
    val r = Catalog.queries("gph_pagerank_fixed_point")(spark, sf0001)
    val n = r.count()
    val total = r.agg(sum("rank_fp")).head().getLong(0)
    // each iteration floors at most 1 unit per node per div; 3 iterations
    // keep total within n * (3 + slack) of n * SCALE below, never above
    assert(total <= n * 1000000L)
    assert(total >= n * 1000000L - n * 200L)
    assert(r.filter(col("rank_fp") <= 0).count() == 0)
  }

  test("hll union: estimate bound flag is true and exact matches countDistinct") {
    val r = Catalog.queries("agg_hll_sketch_union")(spark, sf0001).head()
    assert(r.getAs[Boolean]("within_bound"))
    val exact = graft.core.Tables.customer(spark, sf0001)
      .select(countDistinct(col("c_custkey"))).head().getLong(0)
    assert(r.getAs[Long]("exact_keys") == exact)
  }

  test("skew profile: row shares sum to 1, masses add up") {
    val r = Catalog.queries("skw_key_distribution_profile")(spark, sf0001)
    val tot = graft.core.Tables.orders(spark, sf0001).count()
    assert(r.agg(sum("n_rows")).head().getLong(0) == tot)
    val share = r.agg(sum("row_share")).head().getDouble(0)
    assert(math.abs(share - 1.0) < 1e-9)
  }

  test("chunk dedup: kept <= before, rebuilt token count equals 8*(kept-1)..8*kept") {
    val r = Catalog.queries("ddp_chunk_dedup_rebuild")(spark, sf0001)
    assert(r.filter(col("n_kept") > col("n_chunks")).count() == 0)
    val bad = r.filter(col("rebuilt").isNotNull).filter(
      size(split(col("rebuilt"), " ")) > col("n_kept") * 8).count()
    assert(bad == 0)
    // dedup actually fires on the corpus (organic chunk collisions)
    assert(r.filter(col("n_kept") < col("n_chunks")).count() > 0)
  }

  test("filtered ANN: every neighbor satisfies the metadata predicate") {
    val r = Catalog.queries("sim_filtered_ann_topk")(spark, sf0001)
    val emb = graft.core.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"))
    val offLabel = r.join(emb, r("neighbor_id") === emb("vec_id"))
      .filter(col("label") =!= 2).count()
    assert(offLabel == 0)
    assert(r.filter(col("rank") > 3).count() == 0)
  }

  test("winsorized stats: wmean within [p25, p75], clip counts partition n") {
    val r = Catalog.queries("agg_winsorized_stats")(spark, sf0001)
    assert(r.filter(col("wmean") < col("p25") || col("wmean") > col("p75"))
      .count() == 0)
    assert(r.filter(col("n_low") + col("n_high") >= col("n")).count() == 0)
  }

  test("canonical selection: members >= 2, canonical kept, token split consistent") {
    val r = Catalog.queries("ddp_canonical_doc_selection")(spark, sf0001)
    assert(r.filter(col("n_members") < 2).count() == 0)
    assert(r.filter(col("canonical_doc").isNull).count() == 0)
    assert(r.filter(col("tokens_kept") <= 0).count() == 0)
    // cluster ids come from the CC labels; canonical must be a member doc
    val comps = Catalog.queries("ddp_near_dup_components")(spark, sf0001)
    val orphans = r.join(comps,
      r("canonical_doc") === comps("doc_id") &&
        r("cluster_id") === comps("cluster_id"), "left_anti").count()
    assert(orphans == 0)
  }

  test("bm25: matches a driver-side brute-force scorer exactly") {
    val r = Catalog.queries("txt_bm25_topk")(spark, sf0001)
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getLong(2)))
    // independent reimplementation with plain Scala collections — same
    // rational formula, so doubles must agree BIT-exactly
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(x => (x.getLong(0), x.getString(1).split(" ").toSeq))
    val qterms = Seq("spark", "customer", "window")
    val nDocs = docs.size.toLong
    val totLen = docs.map(_._2.size.toLong).sum
    val dfm = qterms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val scores = docs.flatMap { case (id, toks) =>
      val len = toks.size.toLong
      val s = qterms.map { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) 0.0
        else {
          val df = dfm(t)
          ((2 * nDocs - 2 * df + 1).toDouble / (2 * df + 1)) *
            ((22 * tf * totLen).toDouble /
              (10 * tf * totLen + 3 * totLen + 9 * len * nDocs))
        }
      }.sum
      if (s > 0.0) Some((id, s)) else None
    }
    val expected = scores.sortBy { case (id, s) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, s), i) => (id, s, (i + 1).toLong) }
    assert(r.sortBy(_._3).toSeq == expected.toSeq)
  }

  test("winnowing: guarantee holds vs a brute-force reimplementation") {
    val r = Catalog.queries("txt_winnowing_candidates")(spark, sf0001)
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(x => (x.getLong(0),
        (x.getString(1) + " ß中" + (x.getLong(0) % 5)).split(" ").toSeq))
    // byte-level fold over UTF-8 bytes — the RollingHash contract (a
    // per-char fold would diverge on the planted multibyte token)
    def hash(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 2147483648L)
    val k = 4; val w = 4
    val fps = docs.map { case (id, toks) =>
      val hs = toks.sliding(k).map(g => hash(g.mkString(" "))).toVector
      id -> (0 to hs.size - w).map(i => hs.slice(i, i + w).min).toSet
    }.filter(_._2.nonEmpty).toMap
    val dfm = fps.toSeq.flatMap { case (_, s) => s.toSeq }
      .groupBy(identity).map { case (h, xs) => h -> xs.size }
    val expected = (for {
      (a, fa) <- fps.toSeq; (b, fb) <- fps.toSeq if a < b
      shared = (fa intersect fb).filter(h => dfm(h) >= 2 && dfm(h) <= 8)
      if shared.size >= 2
    } yield ((a, b), shared.size.toLong)).toMap
    assert(r == expected)
  }

  test("semdedup: dup classification is exactly the within-cell epsilon rule") {
    val r = Catalog.queries("ddp_semdedup_embeddings")(spark, sf0001)
      .collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getString(2), x.getLong(3))))
      .toMap
    val vecs = graft.core.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(x => (x.getLong(0),
        x.getSeq[Float](1).map(v => math.floor(v.toDouble * 64.0 + 0.5).toLong).toVector))
    def d2(a: Vector[Long], b: Vector[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seeds = vecs.filter(_._1 < 16)
    val cellOf = vecs.map { case (id, q) =>
      id -> seeds.map { case (c, cv) => (d2(q, cv), c) }.min._2
    }.toMap
    val qOf = vecs.toMap
    vecs.foreach { case (id, q) =>
      val (cell, status, canon) = r(id)
      assert(cell == cellOf(id), s"cell mismatch for $id")
      val lower = vecs.filter { case (o, oq) =>
        o < id && cellOf(o) == cell && d2(oq, q) <= 5500L
      }.map(_._1)
      if (lower.isEmpty) assert(status == "kept" && canon == id)
      else assert(status == "dup" && canon == lower.min)
    }
    assert(r.values.count(_._2 == "dup") > 0, "tau must flag some dups at sf0.001")
  }

  test("shared spans: every planted 2m/2m+1 pair surfaces with span >= 6 tokens") {
    val r = Catalog.queries("ddp_maximal_shared_spans")(spark, sf0001)
      .collect()
      .map(x => ((x.getLong(0), x.getLong(1)),
        (x.getLong(2), x.getLong(3), x.getLong(4))))
      .toMap
    val maxId = graft.core.Tables.documents(spark, sf0001)
      .agg(max(col("doc_id"))).head.getLong(0)
    // each even/odd pair shares a planted 6-token tail unique to the pair:
    // 3 consecutive 4-shingles → one run of 3 → span 3 + 4 - 1 = 6
    (0L to maxId by 2).filter(_ + 1 <= maxId).foreach { a =>
      val got = r.get((a, a + 1))
      assert(got.isDefined, s"planted pair ($a, ${a + 1}) missing")
      val (nSpans, maxSpan, dupTokens) = got.get
      assert(maxSpan >= 6, s"pair ($a, ${a + 1}) max span $maxSpan < 6")
      assert(nSpans >= 1 && dupTokens >= maxSpan)
    }
    // structural sanity on every reported pair
    r.foreach { case ((a, b), (nSpans, maxSpan, dupTokens)) =>
      assert(a < b)
      assert(maxSpan >= 5, "runs >= 2 certify spans >= k+1 = 5 tokens")
      assert(dupTokens >= maxSpan && nSpans >= 1)
    }
  }

  test("CDC-maintained postings equal a full driver-side rebuild; revisions reindex") {
    val got = Catalog.queries("idx_cdc_maintained_postings")(spark, sf0001)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // replay the change rules → LWW final doc state
    val state = scala.collection.mutable.Map.empty[Long, String]
    base.foreach { case (id, t) => state(id) = t }
    (1 to 3).foreach { b =>
      base.foreach { case (id, t) =>
        if (id % 10 == b) state(id) = s"$t rev$b"
        else if (id % 17 == b) state.remove(id)
        if (id % 23 == b) state(id + 1000000L * b) = s"$t ins$b"
      }
    }
    // postings from the final state, doc-sorted
    val exp = state.toSeq.flatMap { case (id, t) =>
      t.split(" ", -1).groupBy(identity).map { case (w, g) => (w, id, g.length.toLong) }
    }.groupBy(_._1).map { case (term, es) =>
      val sorted = es.sortBy(_._2)
      term -> ((sorted.size.toLong, sorted.map(e => s"${e._2}:${e._3}").mkString(",")))
    }
    assert(got == exp, "maintained postings must equal the rebuild")
    // the maintenance actually reindexed: revision terms exist (rev1..3),
    // inserted docs appear in lists, and a deleted doc appears in none
    (1 to 3).foreach(b => assert(got.contains(s"rev$b") && got.contains(s"ins$b")))
    assert(got.keys.nonEmpty && got("rev1")._1 > 0)
    val deleted = base.collectFirst {
      case (id, _) if id % 17 == 1 && id % 10 != 1 && id % 10 != 2 && id % 10 != 3 => id }
    deleted.foreach { id =>
      assert(!got.values.exists(_._2.split(",").exists(_.startsWith(s"$id:"))),
        s"deleted doc $id must vanish from every posting list") }
  }

  test("BM25 served from the maintained index equals a driver recompute; planted terms rank") {
    val got = Catalog.queries("idx_cdc_maintained_bm25")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.nonEmpty && got.map(_._3).toSeq == (1L to got.length.toLong))
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val state = scala.collection.mutable.Map.empty[Long, String]
    base.foreach { case (id, t) => state(id) = t }
    (1 to 3).foreach { b =>
      base.foreach { case (id, t) =>
        if (id % 10 == b) state(id) = s"$t rev$b"
        else if (id % 17 == b) state.remove(id)
        if (id % 23 == b) state(id + 1000000L * b) = s"$t ins$b"
      }
    }
    val qterms = Seq("spark", "rev1", "ins2")
    val toks = state.toSeq.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val n = toks.size.toLong
    val totLen = toks.map(_._2.length.toLong).sum
    val dfm = qterms.map(q => q -> toks.count(_._2.contains(q)).toLong).toMap
    val scores = toks.map { case (id, ts) =>
      val len = ts.length.toLong
      id -> qterms.map { q =>
        val tf = ts.count(_ == q).toLong
        if (tf == 0 || dfm(q) == 0) 0.0
        else ((2.0 * n - 2 * dfm(q) + 1) / (2 * dfm(q) + 1)) *
          (22.0 * tf * totLen /
            (10 * tf * totLen + 3 * totLen + 9 * len * n))
      }.sum
    }.filter(_._2 > 0.0)
    val expTop = scores.sortBy { case (id, sc) => (-sc, id) }.take(10)
    assert(got.map(t => (t._1, t._2)).toSeq ==
      expTop.map { case (id, sc) => (id, sc) }.toSeq,
      "served top-10 must equal the driver recompute")
    // the maintenance-planted terms genuinely contribute: some top doc
    // contains rev1 or ins2
    assert(got.exists { case (id, _, _) =>
      val t = state(id); t.contains("rev1") || t.contains("ins2") })
  }

  test("streaming BM25 serving: every batch's answers equal the as-of driver recompute") {
    val got = Catalog.queries("idx_stream_serve_bm25")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L),
      "one answer set per micro-batch")
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // the serving loop folds terms in sorted order — the recompute must too
    val qterms = Seq("ins2", "rev1", "spark")
    (0 to 3).foreach { qb =>
      // as-of state: only batches <= qb have landed when qb's queries serve
      val state = scala.collection.mutable.Map.empty[Long, String]
      base.foreach { case (id, t) => state(id) = t }
      (1 to qb).foreach { b =>
        base.foreach { case (id, t) =>
          if (id % 10 == b) state(id) = s"$t rev$b"
          else if (id % 17 == b) state.remove(id)
          if (id % 23 == b) state(id + 1000000L * b) = s"$t ins$b"
        }
      }
      val toks = state.toSeq.map { case (id, t) => id -> t.split(" ", -1).toSeq }
      val n = toks.size.toLong
      val totLen = toks.map(_._2.length.toLong).sum
      val dfm = qterms.map(q => q -> toks.count(_._2.contains(q)).toLong).toMap
      val scores = toks.map { case (id, ts) =>
        val len = ts.length.toLong
        id -> qterms.map { q =>
          val tf = ts.count(_ == q).toLong
          if (tf == 0 || dfm(q) == 0) 0.0
          else ((2.0 * n - 2 * dfm(q) + 1) / (2 * dfm(q) + 1)) *
            (22.0 * tf * totLen /
              (10 * tf * totLen + 3 * totLen + 9 * len * n))
        }.sum
      }.filter(_._2 > 0.0)
      val expTop = scores.sortBy { case (id, sc) => (-sc, id) }.take(10)
      val gb = got.filter(_._1 == qb).sortBy(_._4)
      assert(gb.map(_._4).toSeq == (1L to gb.length.toLong), s"qb=$qb ranks")
      assert(gb.map(t => (t._2, t._3)).toSeq == expTop.toSeq,
        s"qb=$qb served answers must equal the as-of recompute")
    }
    // the SAME query set gets different answers as the index evolves: the
    // planted rev1/ins2 terms only score once their batches have merged
    val s0 = got.filter(_._1 == 0L).map(t => (t._2, t._3)).toSet
    val s3 = got.filter(_._1 == 3L).map(t => (t._2, t._3)).toSet
    assert(s0 != s3, "answers must evolve with the index")
  }

  test("CDC-maintained LSH buckets equal a driver rebuild; inserts pair, deletes vanish") {
    val got = Catalog.queries("ddp_cdc_maintained_lsh")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val state = scala.collection.mutable.Map.empty[Long, String]
    base.foreach { case (id, t) => state(id) = t }
    (1 to 3).foreach { b =>
      base.foreach { case (id, t) =>
        if (id % 10 == b) state(id) = s"$t rev$b"
        else if (id % 17 == b) state.remove(id)
        if (id % 23 == b) state(id + 1000000L * b) = t // unchanged copy
      }
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(x => f"$x%02x").mkString
    // pure-Scala minhash: sig[i] = min md5("i|" + shingle); 3x3 bands
    def bandsOf(t: String): Seq[(Int, String)] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Nil
      else {
        val sh = toks.sliding(3).map(_.mkString(" ")).toVector
        val sig = (0 until 9).map(i => sh.map(s => md5hex(s"$i|$s")).min)
        (0 until 3).map(j => j -> md5hex(sig(3 * j) + sig(3 * j + 1) + sig(3 * j + 2)))
      }
    }
    val bands = state.toSeq.flatMap { case (id, t) =>
      bandsOf(t).map { case (b, k) => (b, k, id) } }
    val exp = bands.groupBy(t => (t._1, t._2)).values.flatMap { g =>
      val ids = g.map(_._3).sorted
      for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
    }.toSet
    assert(got == exp, "maintained buckets must reproduce the rebuilt candidates")
    // the planted structure: an inserted unchanged copy pairs with its
    // surviving, un-revised source; and no pair references a deleted doc
    val planted = base.collectFirst { case (id, _)
      if id % 23 == 2 && id % 10 != 1 && id % 10 != 2 && id % 10 != 3 &&
        !(id % 17 == 1 || id % 17 == 2 || id % 17 == 3) &&
        state.contains(id) && base.find(_._1 == id).exists(_._2.split(" ").length >= 3) => id }
    planted.foreach { id =>
      assert(got.contains((id, id + 2000000L)), s"planted copy pair for $id missing") }
    val gone = base.map(_._1).filterNot(state.contains).toSet
    assert(got.forall { case (a, b) => !gone(a) && !gone(b) },
      "deleted docs must vanish from every candidate pair")
    assert(got.nonEmpty)
  }

  test("cdc_ivm_maintained_topk: buffer fold equals the replay; a delete-underflow refill fires exactly once") {
    val got = Catalog.queries("cdc_ivm_maintained_topk")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // driver replay of the full buffer fold (state chain + valid-prefix
    // truncation + refill rule)
    val base = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("CAST(o_orderkey AS BIGINT) AS k",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS p")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ord = Ordering.by[(Long, Long), (Long, Long)] { case (k, p) => (-p, k) }
    def topB(rows: Iterable[(Long, Long)]): Seq[(Long, Long)] =
      rows.toSeq.sorted(ord).take(30)
    val st1 = base.map { case (k, p) => (k, if (k % 7 == 1) p / 2 else p) }
    val dl2 = st1.filter { case (k, p) => p > 40000000L && k % 8 != 3 }.map(_._1).toSet
    val st2 = st1.filterNot(r => dl2(r._1))
    val in3 = base.collect { case (k, p) if k % 11 == 2 => (k + 1000000L, p * 3 / 4) }
    val st3 = st2 ++ in3
    var refills = 0
    def step(buf: Seq[(Long, Long)], keys: Set[Long], live: Seq[(Long, Long)],
        state: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      val (k0, p0) = buf.minBy { case (k, p) => (p, -k) }
      val cand = buf.filterNot(r => keys(r._1)) ++ live
      val valid = cand.filter { case (k, p) => p > p0 || (p == p0 && k <= k0) }
      val nb = topB(valid)
      if (nb.size < 10) { refills += 1; topB(state) } else nb
    }
    var buf = topB(base.toSeq)
    buf = step(buf, base.collect { case (k, _) if k % 7 == 1 => k }.toSet,
      st1.filter(_._1 % 7 == 1).toSeq, st1.toSeq)
    buf = step(buf, dl2, Nil, st2.toSeq)
    buf = step(buf, in3.map(_._1).toSet, in3.toSeq, st3.toSeq)
    val exp = buf.take(10).zipWithIndex.map { case ((k, p), i) =>
      (i + 1L, k, p, refills.toLong) }
    assert(got.sortBy(_._1).toSeq == exp, s"got ${got.toSeq}")
    // the planted shape: exactly ONE refill (the batch-2 delete wipes the
    // top price band past the buffer's coverage), and the maintained
    // answer equals the true top-10 of the FINAL state — the correctness
    // a buffer without refill would lose
    assert(refills == 1, s"expected exactly one refill, got $refills")
    val truth = topB(st3.toSeq).take(10)
    assert(got.sortBy(_._1).map(r => (r._2, r._3)).toSeq == truth,
      "maintained top-k must equal the true top-k of the final state")
  }

  test("cdc_ivm_maintained_aggs equals a full driver-side recompute; group moves happen") {
    val got = Catalog.queries("cdc_ivm_maintained_aggs")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val base = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val state = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    base.foreach { case (k, c, v) => state(k) = (c % 50, v) }
    var moved = false
    (1 to 3).foreach { b =>
      base.foreach { case (k, c, v) =>
        if (k % 10 == b) {
          if (state.get(k).exists(_._1 != (c + b) % 50)) moved = true
          state(k) = ((c + b) % 50, v + 100000L * b)
        } else if (k % 17 == b) state.remove(k)
        if (k % 23 == b) state(k + 1000000L * b) = ((c + 7 * b) % 50, v + b)
      }
    }
    val exp = state.values.groupBy(_._1).map { case (g, vs) =>
      g -> ((vs.size.toLong, vs.map(_._2).sum)) }
    assert(got == exp, "maintained aggregate must equal the recompute")
    assert(moved, "the change stream must contain group-moving updates")
    assert(got.values.map(_._1).sum == state.size)
  }

  test("cdc_ivm_maintained_join equals the recompute; dimension changes fan out via the index") {
    val got = Catalog.queries("cdc_ivm_maintained_join")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getString(4), r.getLong(5)))).toMap
    // replay both logs
    val obase = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents", "o_orderstatus")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val cbase = spark.read.parquet(s"$sf0001/customer.parquet")
      .selectExpr("c_custkey", "c_name", "CAST(c_nationkey AS BIGINT) AS c_nationkey")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ost = scala.collection.mutable.Map.empty[Long, (Long, Long, String)]
    obase.foreach { case (k, c, v, st) => ost(k) = (c, v, st) }
    val cst = scala.collection.mutable.Map.empty[Long, (String, Long)]
    cbase.foreach { case (k, n, nk) => cst(k) = (n, nk) }
    (1 to 3).foreach { b =>
      obase.foreach { case (k, c, v, st) =>
        if (k % 10 == b) ost(k) = (c, v + 100000L * b, s"U$b")
        else if (k % 17 == b) ost.remove(k)
        if (k % 23 == b) ost(k + 1000000L * b) = (c, v + b, st)
      }
      cbase.foreach { case (k, n, nk) =>
        if (k % 7 == b) cst(k) = (s"$n up$b", nk)
        else if (k % 29 == b) cst.remove(k)
      }
    }
    val exp = ost.flatMap { case (ok, (ck, cents, st)) =>
      cst.get(ck).map { case (nm, nk) => ok -> ((cents, st, ck, nm, nk)) }
    }.toMap
    assert(got == exp, "maintained join view must equal the recompute")
    // the planted dimension-side effects genuinely fired:
    // (a) a customer UPDATE propagated to every one of its orders' rows
    val updCust = cst.collectFirst {
      case (k, (n, _)) if n.contains(" up") && ost.values.exists(_._1 == k) => k }
    updCust.foreach { ck =>
      val rows = got.filter(_._2._3 == ck)
      assert(rows.nonEmpty && rows.values.forall(_._4.contains(" up")),
        "customer update must reach all its orders' view rows")
    }
    // (b) a deleted customer orphans its orders — none of them in the view
    val delCust = cbase.collectFirst {
      case (k, _, _) if !cst.contains(k) && obase.exists(o => o._2 == k) => k }
    delCust.foreach { ck =>
      assert(!got.values.exists(_._3 == ck),
        "orders of a deleted customer must vanish from the view")
    }
    // (c) deleted orders are gone even when their customer is live
    val delOrd = obase.collectFirst {
      case (k, c, _, _) if !ost.contains(k) && cst.contains(c) => k }
    delOrd.foreach(ok => assert(!got.contains(ok)))
  }

  /** Final LWW doc state of the 4-batch maintained-index change stream,
    * replayed driver-side (the docChangeBatch rules).
    */
  private def finalDocs: Map[Long, String] = {
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val st = scala.collection.mutable.Map.empty[Long, String]
    base.foreach { case (id, t) => st(id) = t }
    (1 to 3).foreach { b => base.foreach { case (id, t) =>
      if (id % 10 == b) st(id) = s"$t rev$b"
      else if (id % 17 == b) st.remove(id)
      if (id % 23 == b) st(id + 1000000L * b) = s"$t ins$b"
    } }
    st.toMap
  }

  test("segment compaction: equals the policy replay, preserves postings, packs <=8") {
    val got = Catalog.queries("idx_cdc_segment_compaction")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    // replay: tf per (term, doc), segment stats, merge plan, regroup
    val tf = finalDocs.toSeq.flatMap { case (id, t) =>
      t.split(" ").groupBy(identity).map { case (w, g) => (w, id, g.length.toLong) } }
    val segOf = (id: Long) => id / 1000L
    val segLive = tf.map(e => (segOf(e._2), e._2)).distinct
      .groupBy(_._1).map { case (s0, g) => s0 -> g.size.toLong }
    val small = segLive.filter(_._2 < 500).toSeq
      .sortBy { case (s0, n) => (n, s0) }.map(_._1).zipWithIndex
      .map { case (s0, i) => s0 -> (1000000L + i / 8) }.toMap
    val exp = tf.groupBy { case (w, id, _) =>
      (w, small.getOrElse(segOf(id), segOf(id))) }
      .map { case ((w, s0), g) =>
        val sorted = g.sortBy(_._2)
        (w, s0) -> ((g.size.toLong,
          sorted.map(e => s"${e._2}:${e._3}").mkString(",")))
      }
    assert(got == exp, "compacted index must equal the policy replay")
    // postings preserved: the (term, doc, tf) multiset survives compaction
    val gotPostings = got.toSeq.flatMap { case ((w, _), (_, pl)) =>
      pl.split(",").map { e =>
        val Array(d0, t0) = e.split(":"); (w, d0.toLong, t0.toLong) } }.sorted
    assert(gotPostings == tf.sorted, "no posting may be lost or duplicated")
    // the merge plan packs at most 8 source segments per tier
    small.groupBy(_._2).foreach { case (tier, members) =>
      assert(members.size <= 8, s"tier $tier exceeds maxMergeAtOnce") }
    // compaction reduced the segment count (small segments existed)
    assert(small.nonEmpty, "sf0.001 must have merge-eligible segments")
    assert(got.keySet.map(_._2).size < segLive.size + small.values.toSet.size,
      "merged tiers must replace their member segments")
  }

  test("phrase search: equals a driver-side positional-postings evaluation") {
    val got = Catalog.queries("idx_phrase_search_positional")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toVector)
    val bigrams = docs.flatMap { case (_, tk) => tk.zip(tk.tail) }
    val (w1, w2) = bigrams.groupBy(identity)
      .map { case (bg, g) => (bg, g.length) }.toSeq
      .minBy { case ((a, b), n) => (-n, a, b) }._1
    val exp = docs.flatMap { case (id, tk) =>
      val n = tk.zip(tk.tail).count { case (a, b) => a == w1 && b == w2 }
      if (n > 0) Some((id, n.toLong)) else None
    }.sortBy { case (id, n) => (-n, id) }.take(100)
      .map { case (id, n) => (w1, w2, id, n) }
    assert(got.toSeq == exp.toSeq, "phrase matches must equal the positional replay")
    assert(got.nonEmpty && got.map(_._3).distinct.size > 1,
      "the top bigram must match in more than one document")
  }

  test("count-min sketch matches a driver rebuild; estimates never undercount") {
    val got = Catalog.queries("agg_count_min_sketch")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    def cell(j: Int, k: Long): (Long, Long) =
      (j.toLong, java.lang.Long.parseLong(md5hex(s"$k|$j").take(8), 16) % 64)
    val keys = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_partkey").cast("long")).collect().map(_.getLong(0))
    val cells = keys.flatMap(k => (0 to 3).map(j => cell(j, k)))
      .groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    val exact = keys.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val exp = exact.keys.filter(_ % 97 == 0).map { k =>
      val est = (0 to 3).map(j => cells(cell(j, k))).min
      k -> (exact(k), est, est >= exact(k))
    }.toMap
    assert(got == exp, s"got ${got.size} probes, expected ${exp.size}")
    assert(got.nonEmpty && got.values.forall(_._3), "CMS must never undercount")
    // the sketch is lossy by design: with ~hundreds of keys in 64 cells,
    // at least one probe must show a genuine collision overestimate
    assert(got.values.exists { case (ex, est, _) => est > ex },
      "expected at least one collision overestimate at this density")
  }

  test("bitmap overlap equals plain set intersection; repeat customers produce overlap") {
    val got = Catalog.queries("agg_bitmap_overlap")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("CAST(year(o_orderdate) AS BIGINT) AS yr",
        "CAST(o_custkey AS BIGINT) AS c").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byYear = rows.groupBy(_._1).map { case (y, xs) => y -> xs.map(_._2).toSet }
    val years = byYear.keys.toSeq.sorted
    val exp = (for {
      i <- years.indices; j <- (i + 1) until years.length
      (a, b) = (years(i), years(j))
      ov = byYear(a).intersect(byYear(b)).size.toLong
    } yield (a, b) -> (byYear(a).size.toLong, byYear(b).size.toLong, ov,
      ov * 1000000L / (byYear(a).size + byYear(b).size - ov))).toMap
    assert(got == exp, s"got ${got.size} pairs, expected ${exp.size}")
    assert(got.values.exists(_._3 > 0), "repeat customers must produce overlap")
  }

  test("streaming CMS serving: per-batch estimates equal cumulative replay and grow") {
    val got = Catalog.queries("agg_stream_serve_cms")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    def cell(j: Int, k: Long): (Long, Long) =
      (j.toLong, java.lang.Long.parseLong(md5hex(s"$k|$j").take(8), 16) % 64)
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("CAST(l_partkey AS BIGINT) AS k", "CAST(l_quantity AS BIGINT) AS q")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val probes = li.map(_._1).distinct.filter(_ % 97 == 0)
    val exp = (0 to 3).flatMap { qb =>
      val evs = li.filter { case (_, q) => q >= 1 && q < 41 && (q - 1) / 10 <= qb }
      val cells = evs.flatMap { case (k, _) => (0 to 3).map(j => cell(j, k)) }
        .groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
      probes.map { k =>
        (qb.toLong, k) -> (0 to 3).map(j => cells.getOrElse(cell(j, k), 0L)).min
      }
    }.toMap
    assert(got == exp, s"got ${got.size} rows, expected ${exp.size}")
    // the serving signal: estimates are non-decreasing in stream time
    // (additive state never shrinks) and some probe's estimate GROWS
    probes.foreach { k =>
      (1 to 3).foreach(qb =>
        assert(got((qb.toLong, k)) >= got((qb - 1L, k)), s"probe $k shrank at $qb"))
    }
    assert(probes.exists(k => got((3L, k)) > got((0L, k))),
      "some probe's count must grow as batches land")
  }

  test("compacting maintenance: per-batch postings multiset invariance; segment count stays bounded") {
    import org.apache.spark.sql.functions.{col, explode}
    val work = graft.analytics.Q.scratch("cmpidxspec")
    val postings = new graft.sinks.SnapshotSink(spark, s"$work/idx",
      Seq("term", "seg"), bucketBy = Seq("seg"))
    val segCounts = (0 to 3).map { b =>
      val ch = IndexQueries.docChangeBatch(spark, sf0001, b)
      val (n, _) = IndexQueries.maintainCompactingBatch(postings, ch,
        b.toLong, "idx_cdc_compacted_postings_spec")
      // invariance: whatever compaction moved around, the MULTISET of
      // (term, doc_id, tf) postings equals a fresh derivation from the
      // live doc state — compaction changes layout, never content (the
      // doc state now lives IN the same sink under the "@doc" key space,
      // committed by the SAME manifest rename as the postings)
      val stored = postings.read().filter(col("seg") >= 0)
        .select(col("term"), explode(col("plist")).as("p"))
        .select(col("term"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(identity).map { case (k, v) => k -> v.length }
      val fresh = postings.read()
        .filter(col("term") === "@doc" && col("seg") < 0)
        .select((-col("seg") - 1).as("doc_id"),
          explode(org.apache.spark.sql.functions
            .split(col("text"), " ")).as("term"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .groupBy(identity).map { case ((doc, term), v) => (term, doc, v.length.toLong) }
        .toSeq.groupBy(identity).map { case (k, v) => k -> v.size }
      assert(stored == fresh, s"batch $b: postings multiset diverged from doc state")
      n
    }
    // the bound the loop exists for: compaction fired (merged segment ids
    // present) and the per-batch segment count never exceeded the gate
    assert(segCounts.max <= 16, s"segment counts $segCounts exceed the bound")
    assert(segCounts.last < segCounts.max,
      s"compaction must REDUCE segment count at some batch: $segCounts")
    val finalSegs = postings.read().filter(col("seg") >= 0)
      .select("seg").distinct().collect().map(_.getLong(0))
    assert(finalSegs.exists(_ >= 1000000L), "some merged segment must exist")
  }

  test("compacting maintenance: an emptied birth segment loses its remap; a refill is born fresh, not at the retired target") {
    import org.apache.spark.sql.functions.{col, explode, lit, when, size, split}
    import spark.implicits._
    val work = graft.analytics.Q.scratch("cmpremapspec")
    val postings = new graft.sinks.SnapshotSink(spark, s"$work/idx",
      Seq("term", "seg"), bucketBy = Seq("seg"))
    def ch(rows: Seq[(Long, String, String)], seq: Long) =
      rows.toDF("doc_id", "text", "op").withColumn("seq", lit(seq))
        .withColumn("n_tok",
          when(col("text").isNotNull, size(split(col("text"), " ")).cast("long")))
    val I = graft.core.ChangeLog.Insert
    val D = graft.core.ChangeLog.Delete
    // batch 0: 8 birth segments x 10 docs, all under thrLive=40 — the
    // trigger (6) fires immediately; every orig remaps to one merged seg
    val b0 = for { o <- 0L to 7L; i <- 0L until 10L }
      yield (o * 100 + i, s"tok${o}_$i common", I)
    IndexQueries.maintainCompactingBatch(postings, ch(b0, 0L), 0L,
      "remapspec")
    def remapRow(): Map[Long, Long] = postings.read()
      .filter(col("term") === "@segremap" && col("seg") === -1L)
      .select(explode(col("plist")).as("p"))
      .select(col("p.doc_id").as("orig"), col("p.tf").as("cur"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sent0 = remapRow()
    assert(sent0.keySet == (0L to 7L).toSet, s"all 8 origins must remap: $sent0")
    assert(sent0(3L) >= 1000000L, s"orig 3 must map to a merged target: $sent0")
    // batch 1: delete EVERY doc of orig 3 — its mapping must drop from
    // the metadata row in the same commit (the oracle's remap is
    // live-doc-derived; an emptied orig has no entry there)
    val b1 = (0L until 10L).map(i => (300L + i, null: String, D))
    IndexQueries.maintainCompactingBatch(postings, ch(b1, 1L), 1L,
      "remapspec")
    val sent1 = remapRow().keySet
    assert(sent1 == (0L to 7L).toSet - 3L,
      s"emptied orig 3 must lose its mapping, others keep theirs: $sent1")
    // batch 2: orig 3 refills — the new docs are born at seg 3 (fresh
    // identity), NOT at the retired merge target the stale sentinel named
    val b2 = (0L until 6L).map(i => (300L + i, s"fresh_$i common", I))
    IndexQueries.maintainCompactingBatch(postings, ch(b2, 2L), 2L,
      "remapspec")
    val segsOfRefill = postings.read().filter(col("seg") >= 0)
      .select(col("seg"), explode(col("plist")).as("p"))
      .select(col("seg"), col("p.doc_id").as("doc_id"))
      .filter(col("doc_id") >= 300L && col("doc_id") < 306L)
      .collect().map(_.getLong(0)).toSet
    assert(segsOfRefill == Set(3L),
      s"refilled docs must be born at orig seg 3, got $segsOfRefill")
  }

  test("cmsTtlBatch: a crash on either side of the commit neither loses nor double-exports") {
    import spark.implicits._
    val work = graft.analytics.Q.scratch("cmsttlcrash")
    val sink = new graft.sinks.SnapshotSink(spark, s"$work/cells",
      Seq("hrow", "cell"))
    val exp = s"$work/export"
    def inc(rows: (Long, Long, Long)*) = rows.toSeq.toDF("hrow", "cell", "dn")
    def exportRows(b: Long): Set[(Long, Long)] =
      spark.read.parquet(s"$exp/b$b").select("hrow", "cell")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def state(): Map[(Long, Long), Long] = sink.read()
      .select("hrow", "cell", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    IndexQueries.cmsTtlBatch(spark, sink, exp, inc((0, 0, 1), (0, 1, 2), (0, 2, 4)), 0)
    assert(state() == Map((0L, 0L) -> 1L, (0L, 1L) -> 2L, (0L, 2L) -> 4L))
    assert(exportRows(0).isEmpty, "nothing dies on the first batch")
    // batch 1 increments only cell (0,1): cell (0,0) decays 1 -> 0 and
    // must export. Crash BEFORE the commit: export durable, state not
    val base = state()
    sink.faultHook = pt => if (pt == "before-commit") sys.error("injected crash")
    intercept[Exception] {
      IndexQueries.cmsTtlBatch(spark, sink, exp, inc((0, 1, 3)), 1)
    }
    sink.faultHook = _ => ()
    assert(!sink.applied(1) && state() == base,
      "pre-commit crash must leave the sink unchanged")
    assert(exportRows(1) == Set((0L, 0L)),
      "the export is already durable — and correct, since state is unchanged")
    // the retry replays against UNCHANGED inputs: identical export, commit
    IndexQueries.cmsTtlBatch(spark, sink, exp, inc((0, 1, 3)), 1)
    assert(sink.applied(1) && exportRows(1) == Set((0L, 0L)))
    assert(state() == Map((0L, 1L) -> 4L, (0L, 2L) -> 2L))
    // batch 2: crash AFTER the commit, then a POISONED replay (the
    // recompute-against-advanced-state case) — the applied-id gate must
    // cut it off before it touches the export or the sink
    sink.faultHook = pt => if (pt == "after-commit") sys.error("injected crash")
    intercept[Exception] {
      IndexQueries.cmsTtlBatch(spark, sink, exp, inc((0, 9, 5)), 2)
    }
    sink.faultHook = _ => ()
    assert(sink.applied(2), "the commit landed before the crash")
    val committed = state()
    val exported2 = exportRows(2)
    IndexQueries.cmsTtlBatch(spark, sink, exp, inc((0, 42, 1)), 2)
    assert(state() == committed && exportRows(2) == exported2,
      "a replayed committed batch must not recompute state or exports")
  }

  test("TTL CMS serving: exports equal value transitions; live = final nonzero; probes match the fold") {
    val rows = Catalog.queries("agg_stream_serve_cms_ttl")(spark, sf0001).collect()
    val gotProbe = rows.filter(_.getString(0) == "probe")
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(4)).toMap
    val gotExport = rows.filter(_.getString(0) == "export")
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val gotLive = rows.filter(_.getString(0) == "live")
      .map(r => (r.getLong(2), r.getLong(3)) -> r.getLong(4)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    def cell(j: Int, k: Long): (Long, Long) =
      (j.toLong, java.lang.Long.parseLong(md5hex(s"$k|$j").take(8), 16) % 128)
    val ks = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("CAST(l_partkey AS BIGINT) AS k").collect().map(_.getLong(0))
    val probes = ks.distinct.filter(_ % 97 == 0)
    var state = Map.empty[(Long, Long), Long]
    val expExport = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    val expProbe = scala.collection.mutable.Map.empty[(Long, Long), Long]
    (0 to 3).foreach { b =>
      val inc =
        if (b == 3) Map.empty[(Long, Long), Long]
        else ks.distinct.filter(_ % 11 == b)
          .flatMap(k => (0 to 3).map(j => cell(j, k)))
          .groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
      val next = (state.keySet ++ inc.keySet).map(c =>
        c -> (state.getOrElse(c, 0L) / 2 + inc.getOrElse(c, 0L))).toMap
      expExport ++= next.collect {
        case (c, 0L) if state.getOrElse(c, 0L) > 0 => (b.toLong, c._1, c._2)
      }
      state = next.filter(_._2 > 0)
      probes.foreach { k =>
        expProbe((b.toLong, k)) =
          (0 to 3).map(j => state.getOrElse(cell(j, k), 0L)).min
      }
    }
    assert(gotProbe == expProbe.toMap,
      s"probes: got ${gotProbe.size}, expected ${expProbe.size}")
    assert(gotExport == expExport.toSet,
      s"exports: got ${gotExport.size}, expected ${expExport.size}")
    assert(gotLive == state, s"live: got ${gotLive.size}, expected ${state.size}")
    // the signals the entry exists for: cells genuinely die mid-stream
    // AND after the idle batch, and at least one exported cell is REBORN
    // by a later increment (the re-export-able case)
    assert(expExport.exists(_._1 < 3) && expExport.exists(_._1 == 3L),
      "deaths must occur both mid-stream and through the idle window")
    val reborn = expExport.exists { case (b, hrow, c) =>
      b < 3 && (gotLive.contains((hrow, c)) ||
        expExport.exists(e => e._1 > b && e._2 == hrow && e._3 == c))
    }
    assert(reborn, "some exported cell must be re-born by a later increment")
  }

  test("time-decayed CMS serving: per-batch estimates equal the decay-fold replay and shrink when idle") {
    val got = Catalog.queries("agg_stream_serve_cms_decay")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    def cell(j: Int, k: Long): (Long, Long) =
      (j.toLong, java.lang.Long.parseLong(md5hex(s"$k|$j").take(8), 16) % 64)
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("CAST(l_partkey AS BIGINT) AS k", "CAST(l_quantity AS BIGINT) AS q")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val probes = li.map(_._1).distinct.filter(_ % 97 == 0)
    // the independent decay fold: state_b = (state_{b-1} div 2) + inc_b,
    // batch 3 increment-free — exactly the entry's per-batch algebra
    var state = Map.empty[(Long, Long), Long]
    val exp = (0 to 3).flatMap { qb =>
      val inc =
        if (qb == 3) Map.empty[(Long, Long), Long]
        else li.filter { case (_, q) => q >= 1 && q < 31 && (q - 1) / 10 == qb }
          .flatMap { case (k, _) => (0 to 3).map(j => cell(j, k)) }
          .groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
      state = (state.keySet ++ inc.keySet).map(c =>
        c -> (state.getOrElse(c, 0L) / 2 + inc.getOrElse(c, 0L))).toMap
      probes.map { k =>
        (qb.toLong, k) -> (0 to 3).map(j => state.getOrElse(cell(j, k), 0L)).min
      }
    }.toMap
    assert(got == exp, s"got ${got.size} rows, expected ${exp.size}")
    // the decay signal: after the idle batch every probe's estimate is at
    // most half its previous answer, and some nonzero probe genuinely DROPS
    probes.foreach { k =>
      assert(got((3L, k)) <= got((2L, k)) / 2,
        s"probe $k must decay through the idle window")
    }
    assert(probes.exists(k => got((2L, k)) > 0 && got((3L, k)) < got((2L, k))),
      "some live probe's estimate must decrease after the idle window")
  }

  // The compacting loop's merge plan is driven entirely by the MAINTAINED
  // per-origin live stats (batch arithmetic — never a recount), and the
  // directed tests plus the oracle's 4-batch harness pin only those
  // compositions. A seeded random walk of mixed insert/update/delete
  // batches pins, after EVERY batch: the returned live count and the
  // persisted @seglive row against a true recount (a drift here silently
  // mis-plans compaction without breaking any layout invariant), the
  // remap's live-targets discipline (every live doc's postings live in
  // exactly fold(origin, remap); emptied origins lose their mapping so a
  // refill births fresh), and the postings-multiset ≡ doc-state
  // invariance. Seed printed in every clue; override via GRAFT_CMP_SEED
  // to replay a failing walk.
  test("randomized compacting walk: maintained live stats equal a recount; " +
      "remap targets hold; postings multiset invariant") {
    import spark.implicits._
    val seed = sys.env.get("GRAFT_CMP_SEED").map(_.toLong).getOrElse(20260817L)
    val rnd = new scala.util.Random(seed)
    def clue(s: String) = s"seed=$seed: $s"
    val work = graft.analytics.Q.scratch("cmpidxrand")
    val postings = new graft.sinks.SnapshotSink(spark, s"$work/idx",
      Seq("term", "seg"), bucketBy = Seq("seg"))
    val I = graft.core.ChangeLog.Insert
    val D = graft.core.ChangeLog.Delete
    val vocab = (0 until 24).map(i => s"w$i")
    def text(): String =
      (0 until 3 + rnd.nextInt(6)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // ids scatter across origins (doc_id div 100) with bounded slots per
    // origin, so origins stay under thrLive=40 and the merge trigger can
    // fire; deletes may empty an origin (the remap-drop + fresh-refill path)
    val slots = scala.collection.mutable.Map.empty[Long, Long]
    def freshId(): Long = {
      val o = rnd.nextInt(12).toLong
      val s0 = slots.getOrElse(o, 0L); slots(o) = s0 + 1
      o * 100 + s0
    }
    var live = Map.empty[Long, String]
    var sawMerged = false
    (0 to 7).foreach { b =>
      val ins = (0 until (1 + rnd.nextInt(24))).map(_ => freshId() -> text())
      val liveIds = rnd.shuffle(live.keys.toSeq.sorted)
      val nUpd = if (liveIds.isEmpty) 0 else rnd.nextInt(1 + liveIds.size / 3)
      val nDel = if (liveIds.isEmpty) 0
        else rnd.nextInt(1 + (liveIds.size - nUpd) / 3)
      val upd = liveIds.take(nUpd).map(id => id -> text())
      val del = liveIds.slice(nUpd, nUpd + nDel)
      val ch = ((ins ++ upd).map { case (id, t) => (id, t, I) } ++
          del.map(id => (id, null: String, D)))
        .toDF("doc_id", "text", "op")
        .withColumn("seq", lit(b.toLong))
        .withColumn("n_tok", when(col("text").isNotNull,
          size(split(col("text"), " ")).cast("long")))
      live = live ++ ins ++ upd -- del
      val (_, nLive) = IndexQueries.maintainCompactingBatch(postings, ch,
        b.toLong, "cmpidxrandspec")
      assert(nLive == live.size.toLong,
        clue(s"batch $b returned live count $nLive != true ${live.size}"))
      def metaRow(term: String): Map[Long, Long] = postings.read()
        .filter(col("term") === term && col("seg") === -1L)
        .select(explode(col("plist")).as("p"))
        .select(col("p.doc_id"), col("p.tf"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val statsRow = metaRow("@seglive")
      val recount = live.keys.groupBy(_ / 100)
        .map { case (o, xs) => o -> xs.size.toLong }
      assert(statsRow == recount,
        clue(s"batch $b @seglive drifted from the recount"))
      val remapRow = metaRow("@segremap")
      assert(remapRow.keySet.subsetOf(recount.keySet) &&
          remapRow.forall { case (o, c) => o != c },
        clue(s"batch $b remap must map only live origins, non-identity"))
      // every live doc's postings rows live in exactly its remapped segment
      val stored = postings.read().filter(col("seg") >= 0)
        .select(col("term"), col("seg"), explode(col("plist")).as("p"))
        .select(col("term"), col("seg"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      if (stored.exists(_._2 >= 1000000L)) sawMerged = true
      val segsByDoc = stored.groupBy(_._3).map { case (d, xs) => d -> xs.map(_._2).toSet }
      live.keys.foreach { d =>
        val expSeg = remapRow.getOrElse(d / 100, d / 100)
        assert(segsByDoc.get(d).contains(Set(expSeg)),
          clue(s"batch $b doc $d postings at ${segsByDoc.get(d)}, expected seg $expSeg"))
      }
      assert(segsByDoc.keySet == live.keySet,
        clue(s"batch $b stored postings cover ${segsByDoc.size} docs, live ${live.size}"))
      // multiset invariance vs the live doc texts (driver-side truth)
      val gotM = stored.map { case (t, _, d, tf) => (t, d, tf) }
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val expM = live.toSeq.flatMap { case (d, tx) =>
        tx.split(" ").groupBy(identity).map { case (t, xs) => (t, d, xs.length.toLong) }
      }.groupBy(identity).map { case (k, v) => k -> v.size }
      assert(gotM == expM, clue(s"batch $b postings multiset diverged"))
    }
    assert(sawMerged, clue("the walk never fired compaction — re-tune batch sizes"))
  }
}
