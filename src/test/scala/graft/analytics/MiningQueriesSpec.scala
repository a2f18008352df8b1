package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent driver-side re-derivations for the mining/assembly wave —
  * each entry is additionally oracle-gated through Verify/DuckDB; these
  * specs pin the SEMANTICS against brute-force reimplementations the way
  * the BM25/winnowing/DSIR specs do.
  */
class MiningQueriesSpec extends SparkSpec {

  private def q(name: String, d: String = sf0001) =
    Catalog.queries(name)(spark, d)

  test("triangle count matches a brute-force recount") {
    val row = q("gph_triangle_count").head
    val (nEdges, nWedges, nTri) = (row.getLong(0), row.getLong(1), row.getLong(2))

    // brute force: rebuild the edge set in Scala, count triangles naively
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_quantity") >= 25)
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.toSet
    assert(nEdges == edges.size.toLong)
    val adj = edges.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val bruteTri = edges.toSeq.map { case (u, v) =>
      adj(u).intersect(adj(v)).count(w => w > v) // u < v < w ordering
    }.sum
    // orientation-independent truth: every triangle {a<b<c} counted once
    val allTri = edges.toSeq.map { case (u, v) =>
      adj(u).intersect(adj(v)).size
    }.sum / 3 * 1 // each triangle seen from 3 edges
    assert(nTri == allTri.toLong, s"expected $allTri (one-sided $bruteTri)")
    assert(nWedges >= nTri)
  }

  test("weighted systematic sampling: exactly 50 picks, monotone, exact ranks") {
    val rows = q("smp_weighted_systematic")
      .orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Long]("n_picks")).sum == 50L)
    val firstPicks = rows.map(_.getAs[Long]("first_pick"))
    assert(firstPicks.toSeq == firstPicks.toSeq.sorted)
    // re-derive from the raw table: cumulative weights + step arithmetic
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("n_chars")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = docs.map(_._2).sum
    val step = total / 50
    var cum = 0L
    val expected = docs.flatMap { case (id, w) =>
      val before = cum; cum += w
      val n = cum / step - before / step
      if (n > 0) Some((id, w, cum, before / step + 1, n)) else None
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == expected.toSeq)
  }

  test("chunk overlap: stride/window re-derivation for every doc") {
    val got = q("prep_chunk_overlap").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        (r.getAs[Long]("n_chunk_tokens"), r.getAs[String]("chunk_text"))).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    var checked = 0
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val n = toks.length
      val nChunks = 1 + (math.max(n - 50, 0) + 39) / 40
      (0 until nChunks).foreach { i =>
        val chunk = toks.slice(i * 40, i * 40 + 50)
        val (ct, cx) = got((id, i.toLong))
        assert(ct == chunk.length.toLong && cx == chunk.mkString(" "),
          s"doc $id chunk $i")
        checked += 1
      }
    }
    assert(checked == got.size, "no extra chunks beyond the formula")
  }

  test("markov transitions: counts re-derived, probabilities floor-sum to <= 1") {
    val got = q("evt_markov_transitions").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // the canonical loader (nanos-long → micros NTZ); the re-derivation
    // here is of the TRANSITION logic, not the parquet decode
    val ev = graft.core.Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime]("ts"),
        r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).values.flatMap { g =>
      val seq = g.sortBy(e =>
        (e._2.toEpochSecond(java.time.ZoneOffset.UTC), e._2.getNano, e._3))
        .map(_._4)
      seq.zip(seq.tail)
    }.toSeq
    val cnt = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val totals = trans.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    assert(got.keySet == cnt.keySet)
    cnt.foreach { case (k, n) =>
      val (gn, gt, gp) = got(k)
      assert(gn == n && gt == totals(k._1) && gp == n * 1000000L / totals(k._1), s"$k")
    }
    got.groupBy(_._1._1).foreach { case (prev, m) =>
      val psum = m.values.map(_._3).sum
      assert(psum <= 1000000L && psum > 1000000L - m.size, s"prev=$prev")
    }
  }

  test("span excision: keep-first — later doc loses the planted span, first keeps it") {
    val rebuilt = q("ddp_span_excision_rebuild").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens_before"), r.getAs[Long]("n_tokens_after"),
          r.getAs[String]("rebuilt"))).toMap
    // the staged pairs are (2m, 2m+1) sharing a 12-token planted suffix
    val pairs = rebuilt.keys.filter(id => id % 2 == 0 && rebuilt.contains(id + 1))
    assert(pairs.nonEmpty)
    var excisedPairs = 0
    pairs.foreach { m2 =>
      val m = m2 / 2
      val (bA, aA, txtA) = rebuilt(m2)
      val (bB, aB, txtB) = rebuilt(m2 + 1)
      assert(txtA.contains(s"sp$m "), s"first doc $m2 must KEEP its span")
      if (!txtB.contains(s"sp$m")) {
        assert(bB - aB >= 6, s"doc ${m2 + 1} excised fewer than the 6 planted tokens")
        excisedPairs += 1
      }
      assert(aA <= bA && aB <= bB)
    }
    // the planted suffix guarantees detection wherever the df guard
    // admits it — most pairs must actually excise
    assert(excisedPairs > pairs.size / 2,
      s"only $excisedPairs of ${pairs.size} pairs excised")
  }

  test("split leakage (sf0.01): every leaked pair is a genuine near-dup across the split") {
    val d = "/root/testdata/sf0.01"
    val leaks = q("qa_split_leakage", d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(leaks.nonEmpty)
    def isTest(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "0123456789abcdef".indexOf(f"${md(0) & 0xff}%02x".charAt(0)) < 2
    }
    val texts = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def textOf(id: Long): String =
      if (id >= 1000000L) texts(id - 1000000L) else texts(id)
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    leaks.foreach { case (tr, te) =>
      assert(!isTest(tr) && isTest(te), s"($tr,$te) split sides")
      val (sa, sb) = (shingles(textOf(tr)), shingles(textOf(te)))
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size.max(1)
      assert(j > 0.3, s"pair ($tr,$te) jaccard $j not a near-dup")
    }
    // the planted replicas (id+1000000) straddling the split must be found
    val planted = texts.keys.filter(id => id % 10 == 0)
      .map(id => (id, id + 1000000L))
      .filter { case (a, b) => isTest(a) != isTest(b) }
      .map { case (a, b) => if (isTest(a)) (b, a) else (a, b) }.toSet
    assert(planted.subsetOf(leaks.toSet),
      s"missed planted leaks: ${planted -- leaks.toSet}")
  }

  test("hybrid RRF: fused ranks consistent with leg ranks") {
    val rows = q("sim_hybrid_rrf").orderBy("rank").collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val rrfs = rows.map(_.getAs[Long]("rrf_e6"))
    assert(rrfs.toSeq == rrfs.toSeq.sortBy(-_))
    rows.foreach { r =>
      val rs = Option(r.getAs[java.lang.Long]("rank_s")).map(_.toLong)
      val rd = Option(r.getAs[java.lang.Long]("rank_d")).map(_.toLong)
      val expected = rs.map(x => 1000000L / (60 + x)).getOrElse(0L) +
        rd.map(x => 1000000L / (60 + x)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_e6") == expected)
      assert(rs.nonEmpty || rd.nonEmpty)
    }
  }

  test("packed attention mask: cu_seqlens parse, close, and agree with the pack layout") {
    val masks = q("prep_packed_attention_mask").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[String]("cu_seqlens"))).toMap
    val pack = q("prep_pack_sequences").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(masks.keySet == pack.keySet)
    masks.foreach { case (key, (nDocs, nToks, cu)) =>
      val bounds = cu.split(",").map(_.toLong)
      assert(bounds.head == 0L && bounds.last == nToks, s"bin $key endpoints")
      assert(bounds.length == nDocs + 1, s"bin $key boundary count")
      assert(bounds.toSeq == bounds.toSeq.sorted, s"bin $key monotone")
      assert(bounds.toSeq.distinct.size == bounds.length, s"bin $key empty doc")
      assert(pack(key) == (nDocs, nToks), s"bin $key pack agreement")
    }
  }

  test("label-noise kNN vote re-derived from hyperplane signs and integer dots") {
    val got = q("qa_label_noise_knn").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("own_label"), r.getAs[Long]("vote_label"),
          r.getAs[Long]("n_votes"), r.getAs[Boolean]("suspect"))).toMap
    val raw = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2).toLong))
    // kNN dots run on the 1/64 lattice; BUCKETS hash the raw floats (the
    // lsh_buckets expression's input) — quantizing first would flip
    // near-zero hyperplane signs
    val vecs = raw.map { case (id, fs, l) =>
      (id, fs.map(f => math.floor(f.toDouble * 64.0 + 0.5).toLong), l)
    }
    def buckets(v: Array[Float]): Seq[(Int, Int)] = (0 until 8).map { t =>
      val b = (0 until 8).map { j =>
        val dot = v.indices.map(k =>
          graft.functions.Similarity.hyperplaneSign(t * 8 + j, k) * v(k).toDouble).sum
        if (dot > 0) 1 else 0
      }.foldLeft(0)((a, x) => 2 * a + x)
      (t, b)
    }
    val bk = raw.map(v => v._1 -> buckets(v._2)).toMap
    val byId = vecs.map(v => v._1 -> v).toMap
    vecs.foreach { case (vid, vq, own) =>
      val cands = vecs.filter(o => o._1 != vid &&
        bk(o._1).toSet.intersect(bk(vid).toSet).nonEmpty).map(_._1)
      if (cands.isEmpty) assert(!got.contains(vid), s"vec $vid has no candidates")
      else {
        val top5 = cands.map { nid =>
          val nv = byId(nid)._2
          (vq.indices.map(k => vq(k) * nv(k)).sum, nid)
        }.sortBy { case (dot, nid) => (-dot, nid) }.take(5)
        val counts = top5.groupBy(p => byId(p._2)._3)
          .map { case (l, g) => (l, g.size.toLong) }
        val (voteLabel, nVotes) =
          counts.toSeq.sortBy { case (l, c) => (-c, l) }.head
        assert(got(vid) == (own, voteLabel, nVotes, voteLabel != own), s"vec $vid")
      }
    }
  }

  test("MAD anomalies re-derived with discrete medians") {
    val got = q("evt_anomaly_mad").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("med_cents"),
        r.getAs[Long]("mad_cents"), r.getAs[Long]("n_anomalies"),
        r.getAs[Long]("max_dev"))).toMap
    val ev = graft.core.Tables.events(spark, sf0001)
      .filter(col("value").isNotNull)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> math.floor(r.getDouble(1) * 100.0 + 0.5).toLong)
    def discMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((math.ceil(0.5 * xs.size) - 1).toInt)
    }
    ev.groupBy(_._1).foreach { case (t, g) =>
      val vs = g.map(_._2).toSeq
      val med = discMedian(vs)
      val devs = vs.map(v => math.abs(v - med))
      val mad = discMedian(devs)
      val expected = (vs.size.toLong, med, mad,
        devs.count(_ > 3 * mad).toLong, devs.max)
      assert(got(t) == expected, s"type $t")
    }
  }

  test("k-core peeling re-derived: survivors and residual degrees match") {
    val got = q("gph_kcore_decomposition").collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Long]("degree")).toMap
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_quantity") >= 45)
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.toSet
    for (_ <- 1 to 4) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val keep = deg.filter(_._2 >= 3).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
    }
    val expected = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == expected)
    assert(got.nonEmpty, "peeling emptied the core — threshold lost its bite")
  }

  test("held-out perplexity: train-only statistics, OOV counted, no test leakage") {
    val rows = q("qa_heldout_perplexity").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_oov"),
          r.getAs[Long]("avg_p_e9"))).toMap
    assert(rows.nonEmpty)
    def isTest(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "0123456789abcdef".indexOf(f"${md(0) & 0xff}%02x".charAt(0)) < 2
    }
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= 2)
    assert(rows.keySet == docs.filter(d => isTest(d._1)).map(_._1).toSet)
    val trainBg = docs.filterNot(d => isTest(d._1))
      .flatMap(d => d._2.zip(d._2.tail))
    val cntAb = trainBg.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cntA = trainBg.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    docs.filter(d => isTest(d._1)).foreach { case (id, toks) =>
      val bgs = toks.zip(toks.tail)
      val oov = bgs.count(b => !cntAb.contains(b)).toLong
      val pSum = bgs.map(b => cntAb.get(b)
        .map(ab => ab * 1000000000L / cntA(b._1)).getOrElse(0L)).sum
      assert(rows(id) == (bgs.length.toLong, oov, pSum / bgs.length), s"doc $id")
    }
  }

  test("3-step path mining re-derived from per-user ordered sequences") {
    val got = q("evt_path_mining_3step").orderBy("rank").collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n"), r.getAs[Long]("rank")))
    val ev = graft.core.Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime]("ts"),
        r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(_._1).values.flatMap { g =>
      val seq = g.sortBy(e =>
        (e._2.toEpochSecond(java.time.ZoneOffset.UTC), e._2.getNano, e._3))
        .map(_._4)
      seq.sliding(3).filter(_.size == 3).map(_.mkString(">"))
    }.toSeq
    val expected = paths.groupBy(identity)
      .map { case (p, v) => (p, v.size.toLong) }.toSeq
      .sortBy { case (p, n) => (-n, p) }.take(15)
      .zipWithIndex.map { case ((p, n), i) => (p, n, (i + 1).toLong) }
    assert(got.toSeq == expected)
  }

  test("RAKE keywords re-derived: degree/frequency scores and ranking") {
    val got = q("txt_keyword_rake").orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("phrase"),
        r.getAs[Long]("cnt"), r.getAs[Long]("rake_e6")))
    val stop = Set("the", "and", "of", "a", "in", "on", "to", "is", "for",
      "with", "that", "this", "it", "as", "are", "was", "at", "by")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val phrases = docs.flatMap { t =>
      t.toLowerCase.split(" ", -1)
        .map(w => if (stop(w) || w.isEmpty) "|" else w)
        .mkString(" ").split("\\|").map(_.trim).filter(_.nonEmpty)
    }
    val occ = phrases.groupBy(identity).map { case (p, v) =>
      (p, v.size.toLong, p.split(" ").length.toLong)
    }
    val wordFreq = scala.collection.mutable.Map.empty[String, Long]
    val wordDeg = scala.collection.mutable.Map.empty[String, Long]
    occ.foreach { case (p, cnt, len) =>
      p.split(" ").foreach { w =>
        wordFreq(w) = wordFreq.getOrElse(w, 0L) + cnt
        wordDeg(w) = wordDeg.getOrElse(w, 0L) + cnt * len
      }
    }
    val expected = occ.map { case (p, cnt, _) =>
      val score = p.split(" ").map(w => wordDeg(w) * 1000000L / wordFreq(w)).sum
      (p, cnt, score)
    }.toSeq.sortBy { case (p, _, s) => (-s, p) }.take(20)
      .zipWithIndex.map { case ((p, c, s), i) => ((i + 1).toLong, p, c, s) }
    assert(got.toSeq == expected)
  }

  test("Benford profile: e9 constants match log10, shares re-derived") {
    val got = q("qa_benford_profile").collect()
      .map(r => r.getAs[Long]("digit") ->
        (r.getAs[Long]("n"), r.getAs[Long]("observed_e9"),
          r.getAs[Long]("expected_e9"), r.getAs[Long]("abs_dev_e9"))).toMap
    (1 to 9).foreach { d =>
      val exact = math.round(1e9 * math.log10(1.0 + 1.0 / d))
      assert(got(d.toLong)._3 == exact, s"digit $d constant")
    }
    val prices = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_totalprice").collect()
      .map(r => BigDecimal(r.getDouble(0)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toString.head.asDigit.toLong)
    val total = prices.length.toLong
    prices.groupBy(identity).foreach { case (d, v) =>
      val n = v.length.toLong
      val obs = n * 1000000000L / total
      assert(got(d) == (n, obs, got(d)._3, math.abs(obs - got(d)._3)), s"digit $d")
    }
  }

  test("SQL front-door compaction equals the DataFrame-path compaction") {
    val viaSql = q("sql_changelog_compact")
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val viaScala = q("cdc_compact_snapshot")
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(viaSql == viaScala)
    assert(viaSql.nonEmpty)
  }

  test("deterministic random walks re-derived hop by hop") {
    val got = q("gph_random_walks").collect()
      .map(r => r.getAs[Long]("walk_id") ->
        (r.getAs[String]("path"), r.getAs[Long]("end_node"))).toMap
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_quantity") >= 45)
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (n, v) => n -> v.map(_._2).sorted }
    def hashIdx(walkId: Long, step: Int, deg: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$walkId|$step".getBytes("UTF-8"))
      val hex = md.take(3).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % deg).toInt
    }
    assert(got.keySet == adj.keySet)
    adj.keys.foreach { start =>
      var cur = start
      var path = start.toString
      (1 to 3).foreach { s =>
        val nbrs = adj(cur)
        cur = nbrs(hashIdx(start, s, nbrs.size))
        path += s">$cur"
      }
      assert(got(start) == (path, cur), s"walk $start")
    }
  }

  test("skip-gram pairs re-derived from the walk corpus") {
    val got = q("gph_walk_skipgram_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val paths = q("gph_random_walks").collect().map(_.getAs[String]("path"))
    val expected = paths.flatMap { p =>
      val ns = p.split(">").map(_.toLong)
      for (i <- ns.indices; w <- 1 to 2 if i + w < ns.length)
        yield (ns(i), ns(i + w))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == expected)
  }

  test("content-defined chunks: boundaries re-derived, shared flags correct") {
    val got = q("ddp_content_defined_chunks").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx")) ->
        (r.getAs[Long]("n_chunk_toks"), r.getAs[String]("chunk_hash"),
          r.getAs[Boolean]("shared"))).toMap
    def rollingHash(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 2147483648L)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val expected = docs.flatMap { case (id, toks) =>
      val flags = toks.map(t => rollingHash(t) % 4 == 0)
      val idxs = flags.scanLeft(0L)((acc, f) => acc + (if (f) 1 else 0)).init
      toks.zip(idxs).groupBy(_._2).map { case (ci, grp) =>
        val text = grp.map(_._1).mkString(" ")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (id, ci) -> (grp.length.toLong, md)
      }
    }.toMap
    assert(got.keySet == expected.keySet)
    val dfByHash = expected.toSeq.groupBy(_._2._2)
      .map { case (h, v) => h -> v.map(_._1._1).distinct.size }
    expected.foreach { case (key, (n, h)) =>
      assert(got(key) == (n, h, dfByHash(h) > 1), s"chunk $key")
    }
    // the content-defined property: at least one chunk is shared across
    // docs (the corpus has replicated text), and boundary positions are
    // content-local (spot-check: inserting a token into one doc's head
    // leaves later chunk hashes present in the original chunk set)
    assert(expected.values.exists { case (_, h) => dfByHash(h) > 1 })
  }

  test("histogram drift: baseline-decile invariants and planted-drift direction") {
    val rows = q("qa_histogram_drift").orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"),
        Option(r.getAs[java.lang.Long]("ratio_e6")).map(_.toLong)))
    // baseline deciles: 10 buckets, each holding ~10% of period A
    val totalA = rows.map(_._2).sum
    val aBuckets = rows.filter(_._2 > 0)
    assert(aBuckets.length == 10, s"expected 10 baseline buckets: $rows")
    aBuckets.foreach { case (bk, na, _, _) =>
      assert(math.abs(na - totalA / 10.0) <= totalA * 0.02 + 2,
        s"bucket $bk not a decile: $na of $totalA")
    }
    // planted +10% drift: mass leaves the lowest buckets and piles at
    // the top (ratio rises with bucket index at the extremes)
    val first = rows.head._4.get
    val last = rows.filter(_._2 > 0).last._4.get
    assert(first < 1000000L, s"bottom bucket should lose mass: $first")
    assert(last > 1000000L, s"top bucket should gain mass: $last")
    assert(rows.map(_._3).sum > 0)
  }

  test("Matryoshka eval re-derived: truncated-vs-full top-10 overlap per query") {
    val got = q("emb_matryoshka_eval").collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_overlap_top10"), r.getAs[Boolean]("top1_agrees"))).toMap
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(f => math.floor(f.toDouble * 64.0 + 0.5).toLong).toArray))
    val byId = vecs.toMap
    val queries = vecs.map(_._1).filter(_ % 50 == 0)
    assert(got.keySet == queries.toSet)
    queries.foreach { qid =>
      val qq = byId(qid)
      def top10(dims: Int): Seq[Long] = vecs.filter(_._1 != qid)
        .map { case (vid, vq) =>
          ((0 until dims).map(k => qq(k) * vq(k)).sum, vid)
        }.sortBy { case (dot, vid) => (-dot, vid) }.take(10).map(_._2)
      val (full, trunc) = (top10(64), top10(16))
      val overlap = full.toSet.intersect(trunc.toSet).size.toLong
      assert(got(qid) == (overlap, full.head == trunc.head), s"query $qid")
    }
  }

  test("cumulative unique users re-derived from first-seen days") {
    val got = q("evt_cumulative_unique_users").orderBy("day").collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("n_new"), r.getAs[Long]("cum_users")))
    val ev = graft.core.Tables.events(spark, sf0001)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime]("ts")))
    val firstSeen = ev.groupBy(_._1).map { case (u, g) =>
      u -> g.map(_._2).min(Ordering.by((t: java.time.LocalDateTime) =>
        (t.toEpochSecond(java.time.ZoneOffset.UTC), t.getNano)))
    }
    val daily = firstSeen.values.map(_.toLocalDate.toString).toSeq
      .groupBy(identity).map { case (d, v) => d -> v.size.toLong }
      .toSeq.sortBy(_._1)
    var cum = 0L
    val expected = daily.map { case (d, n) => cum += n; (d, n, cum) }
    assert(got.toSeq == expected)
    assert(got.last._3 == firstSeen.size.toLong)
  }

  test("dataset card: every per-source stat re-derived") {
    val got = q("prep_dataset_card").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars"),
          r.getAs[Long]("n_langs"), r.getAs[String]("top_lang"),
          r.getAs[Long]("median_chars"), r.getAs[Long]("n_dup_docs"),
          r.getAs[Long]("dup_rate_e6"))).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "lang", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(got.keySet == docs.map(_._1).toSet)
    docs.groupBy(_._1).foreach { case (src, g) =>
      val nDocs = g.length.toLong
      val chars = g.map(_._3)
      val median = chars.sorted.apply((math.ceil(0.5 * chars.length) - 1).toInt)
      val topLang = g.groupBy(_._2).map { case (l, v) => (l, v.size) }
        .toSeq.sortBy { case (l, n) => (-n, l) }.head._1
      val dupDocs = g.groupBy(_._4).valuesIterator
        .map(_.size).filter(_ > 1).sum.toLong
      assert(got(src) == (nDocs, chars.sum, g.map(_._2).distinct.length.toLong,
        topLang, median, dupDocs, dupDocs * 1000000L / nDocs), s"source $src")
    }
  }

  test("quantized MRR: reciprocal ranks well-formed, exact-NN self-consistent") {
    val rows = q("sim_quantized_mrr_eval").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rank = r.getAs[Long]("cand_rank")
      assert(rank >= 1)
      assert(r.getAs[Long]("rr_e9") == 1000000000L / rank)
      assert(r.getAs[Long]("query_id") != r.getAs[Long]("true_nn"))
    }
    // every query id appears exactly once
    val qs = rows.map(_.getAs[Long]("query_id"))
    assert(qs.distinct.length == qs.length)
  }

  test("2-hop neighborhood: seeded ball sizes match a BFS recount") {
    val got = q("gph_2hop_neighborhood").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val co = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (co ++ co.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val seeds = adj.keySet.filter(_ % 40 == 0)
    assert(got.keySet == seeds, "one row per seed")
    seeds.foreach { s =>
      val h1 = adj(s)
      val h2 = h1.flatMap(adj(_))
      val ball = (h1 ++ h2) - s
      assert(got(s) == ((h1.size.toLong, ball.size.toLong)), s"seed $s")
    }
  }

  test("FIM split: parts are non-empty, partition the doc, and PSM-render") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val rows = q("prep_fim_split").collect()
    assert(rows.nonEmpty)
    val seen = rows.map(_.getLong(0)).toSet
    assert(seen == docs.filter(_._2.size >= 8).keySet)
    rows.foreach { r =>
      val (id, n, p, m, sfx) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val toks = docs(id)
      assert(n == toks.size && p >= 1 && m >= 1 && sfx >= 1 && p + m + sfx == n)
      val a = n / 3
      assert(p == id % a + 1 && sfx == id * 31 % a + 1)
      val exp = "<PRE> " + toks.take(p.toInt).mkString(" ") +
        " <SUF> " + toks.drop((n - sfx).toInt).mkString(" ") +
        " <MID> " + toks.slice(p.toInt, (n - sfx).toInt).mkString(" ")
      assert(r.getString(5) == exp, s"doc $id")
    }
  }

  test("spell variants: SymSpell blocking finds EXACTLY the brute-force d<=1 pairs") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val vocab = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap { r =>
        val t = r.getString(1) + (if (r.getLong(0) % 37 == 0)
          " x" + r.getString(1).split(" ", -1).head else "")
        t.toLowerCase.replaceAll("[^a-z ]", "").split(" +")
      }.filter(_.length >= 4).distinct.sorted
    val exp = (for {
      i <- vocab.indices; j <- (i + 1) until vocab.length
      if math.abs(vocab(i).length - vocab(j).length) <= 1 &&
        lev(vocab(i), vocab(j)) <= 1
    } yield ((vocab(i), vocab(j)), lev(vocab(i), vocab(j)).toLong)).toMap
    val got = q("txt_spell_variant_pairs").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == exp, s"got ${got.size} pairs, expected ${exp.size}")
    assert(exp.nonEmpty, "corpus must contain at least one d<=1 variant pair")
  }

  test("AUC: the rank form equals brute-force pairwise wins + half-ties") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("CAST(n_chars AS BIGINT) AS s", "lang = 'en' AS p").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val pos = docs.filter(_._2).map(_._1)
    val neg = docs.filterNot(_._2).map(_._1)
    val num2 = (for (a <- pos; b <- neg) yield
      if (a > b) 2L else if (a == b) 1L else 0L).sum // 2·(wins + ties/2)
    val expAuc = num2 * 1000000L / (2L * pos.length * neg.length)
    val row = q("qa_auc_ranking").head
    assert(row.getLong(0) == pos.length && row.getLong(1) == neg.length)
    assert(row.getLong(2) == expAuc,
      s"rank-form AUC ${row.getLong(2)} != pairwise $expAuc")
  }

  test("calibration bins: per-bin stats match a driver-side recount") {
    def rh(s: String): Long = {
      var acc = 0L
      s.getBytes("UTF-8").foreach(b => acc = (acc * 31 + (b & 0xff)) % (1L << 31))
      acc
    }
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text", "lang").collect()
      .map(r => (rh(r.getString(0)) % 1000000L, r.getString(1) == "en"))
    val exp = docs.groupBy(_._1 / 100000).map { case (bin, xs) =>
      val n = xs.length.toLong
      val pos = xs.count(_._2).toLong
      val confSum = xs.map(_._1).sum
      val acc = pos * 1000000L / n
      val conf = confSum / n
      bin -> ((n, pos, acc, conf, math.abs(acc - conf)))
    }
    val got = q("qa_calibration_bins").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == exp)
    assert(got.values.map(_._1).sum == docs.length.toLong)
  }

  test("vocab coverage: OOV rates match a driver-side recount") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val freq = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, xs) => w -> xs.length }
    val vocab = freq.toSeq.sortBy { case (w, n) => (-n, w) }.take(64)
      .map(_._1).toSet
    val got = q("txt_vocab_coverage").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    docs.foreach { case (id, toks) =>
      val oov = toks.count(!vocab(_)).toLong
      assert(got(id) == ((toks.size.toLong, oov, oov * 1000000L / toks.size)),
        s"doc $id")
    }
  }

  test("qa_ngram_diversity matches a driver re-derivation; diversity rises with n") {
    val got = q("qa_ngram_diversity").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val exp = (for {
      n <- 1 to 3
      (src, grams) <- docs.groupBy(_._1).map { case (s0, g) =>
        s0 -> g.flatMap { case (_, t) =>
          val tk = t.split(" ", -1)
          if (tk.length < n) Nil
          else tk.sliding(n).map(_.mkString(" ")).toSeq
        } }
    } yield (src, n.toLong) -> ((grams.size.toLong, grams.distinct.size.toLong,
      grams.distinct.size.toLong * 1000000L / grams.size))).toMap
    assert(got == exp)
    // longer n-grams are strictly more diverse on natural-ish text
    got.keys.map(_._1).foreach { src =>
      assert(got((src, 1L))._3 <= got((src, 2L))._3 &&
        got((src, 2L))._3 <= got((src, 3L))._3, src)
    }
  }

  test("attributedClosures: multi-delta-edge triangles counted exactly once") {
    import spark.implicits._
    // K4 on {1,2,3,4}: four triangles. Delta = {(1,2),(1,3),(2,3),(3,4)}:
    //  {1,2,3} holds THREE delta edges -> attributed to (1,2) only
    //  {1,3,4} holds (1,3),(3,4)       -> attributed to (1,3) only
    //  {2,3,4} holds (2,3),(3,4)       -> attributed to (2,3) only
    //  {1,2,4} holds (1,2)             -> attributed to (1,2)
    val ctx0 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val ctx = (ctx0 ++ ctx0.map(_.swap)).toDF("x", "y")
    val delta = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val got = MiningQueries.attributedClosures(delta, ctx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 4, got.toSeq.toString)
    val byTri = got.map { case (u, v, w) => (Seq(u, v, w).sorted, (u, v)) }.toMap
    assert(byTri(Seq(1L, 2L, 3L)) == ((1L, 2L)))
    assert(byTri(Seq(1L, 3L, 4L)) == ((1L, 3L)))
    assert(byTri(Seq(2L, 3L, 4L)) == ((2L, 3L)))
    assert(byTri(Seq(1L, 2L, 4L)) == ((1L, 2L)))
    // a delta set disjoint from any triangle edge yields nothing
    val far = Seq((9L, 10L)).toDF("u", "v")
    assert(MiningQueries.attributedClosures(far, ctx).isEmpty)
  }

  test("maintained per-vertex triangle counts converge to a final-graph recount") {
    val got = q("gph_cdc_maintained_triangles").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replay the batch set algebra driver-side, then recount from scratch
    def pairs(qlo: Int, qhi: Int): Set[(Long, Long)] = {
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .filter(col("l_quantity") >= qlo && col("l_quantity") < qhi)
        .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      li.groupBy(_._1).values.flatMap { grp =>
        val ps = grp.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
      }.toSet
    }
    val cand = pairs(20, 25)
    var g = pairs(25, 1000)
    (1 to 3).foreach { b =>
      g = g.filterNot { case (u, v) => (u * 31 + v) % 17 == b } ++
        cand.filter { case (u, v) => (u * 31 + v) % 3 == b - 1 }
    }
    val adj = g.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val exp = g.toSeq
      .flatMap { case (u, v) => adj(u).intersect(adj(v)).toSeq.flatMap(w => Seq(u, v, w)) }
      .groupBy(identity).map { case (k, vs) => k -> vs.size.toLong / 3 }
      .filter(_._2 > 0L)
    assert(got == exp, s"got ${got.size} vertices, expected ${exp.size}")
  }

  test("mergeGroups: chained merges resolve to group minima, identities omitted") {
    // chain 9-5-3 via (5,9),(9,3); disjoint pair (7,8); singleton identity
    val m = MiningQueries.mergeGroups(Seq((5L, 9L), (9L, 3L), (7L, 8L), (4L, 4L)))
    assert(m == Map(5L -> 3L, 9L -> 3L, 8L -> 7L), m.toString)
    // order independence: reversed pair order, same roots
    val m2 = MiningQueries.mergeGroups(Seq((9L, 3L), (7L, 8L), (5L, 9L)))
    assert(m2 == m, m2.toString)
    assert(MiningQueries.mergeGroups(Nil).isEmpty)
  }

  test("maintained components equal a from-scratch union-find; batches genuinely merge") {
    val got = q("gph_cdc_maintained_components").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def pairs(t: Int): Set[(Long, Long)] = {
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .filter(col("l_quantity") >= t)
        .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      li.groupBy(_._1).values.flatMap { grp =>
        val ps = grp.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
      }.toSet
    }
    def components(es: Set[(Long, Long)]): Map[Long, Long] = {
      val verts = es.flatMap(e => Seq(e._1, e._2))
      val m = MiningQueries.mergeGroups(es.toSeq)
      verts.map(v => v -> m.getOrElse(v, v)).toMap
    }
    val exp = components(pairs(41))
    assert(got == exp, s"got ${got.size} vertices, expected ${exp.size}")
    // incrementality signal: the widened bands must actually merge base
    // components (otherwise the maintenance path was never exercised)
    val baseCc = components(pairs(47))
    val mergedSomething = baseCc.exists { case (v, lbl) => exp(v) != lbl }
    assert(mergedSomething, "later batches must merge at least one base component")
    // and must add genuinely-new vertices
    assert(exp.keySet.diff(baseCc.keySet).nonEmpty, "batches must add new vertices")
  }

  test("streaming component serving: per-batch answers equal as-of recomputation and evolve") {
    val got = q("gph_stream_serve_components").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def pairs(t: Int): Set[(Long, Long)] = {
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .filter(col("l_quantity") >= t)
        .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      li.groupBy(_._1).values.flatMap { grp =>
        val ps = grp.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
      }.toSet
    }
    val exp = (0 to 3).flatMap { qb =>
      val es = pairs(47 - 2 * qb)
      val verts = es.flatMap(e => Seq(e._1, e._2))
      val m = MiningQueries.mergeGroups(es.toSeq)
      verts.filter(_ % 13 == 0).map(v => (qb.toLong, v) -> m.getOrElse(v, v))
    }.toMap
    assert(got == exp, s"got ${got.size} rows, expected ${exp.size}")
    // the serving signal: at least one probe's component must CHANGE
    // across batches (a merge landed) and at least one probe must APPEAR
    // mid-stream (its vertex entered the graph after batch 0)
    val probes = got.keys.map(_._2).toSet
    assert(probes.exists(v =>
      got.contains((0L, v)) && got.contains((3L, v)) && got((0L, v)) != got((3L, v))),
      "some probe must change component as edges arrive")
    assert(probes.exists(v => !got.contains((0L, v)) && got.contains((3L, v))),
      "some probe must appear mid-stream")
  }

  test("event-pattern regex: traces and Kleene-closure counts match a driver scan") {
    val got = q("evt_pattern_match_regex").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val evs = graft.core.Tables.events(spark, sf0001)
      .selectExpr("user_id", "CAST(ts AS STRING) AS ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val exp = evs.groupBy(_._1).map { case (uid, rows) =>
      // ISO timestamp strings sort identically to the timestamps
      val trace = rows.sortBy(r => (r._2, r._3))
        .map(_._4.head).mkString
      def cnt(p: String): Long =
        p.r.findAllMatchIn(trace).length.toLong
      val runs = "v+".r.findAllIn(trace).map(_.length.toLong).toSeq
      uid -> (trace, cnt("s[cv]*p"), cnt("e[cv]*e"),
        if (runs.isEmpty) 0L else runs.max)
    }
    assert(got == exp, s"got ${got.size} users, expected ${exp.size}")
    // natural signal: some user completed the funnel, some had a view run
    assert(got.values.exists(_._2 > 0), "some funnel match expected")
    assert(got.values.exists(_._4 >= 2), "some multi-view run expected")
  }

  test("maintained components under deletes: scoped star rebuild serves true post-split answers") {
    def pairs(t: Int): Set[(Long, Long)] = {
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .filter(col("l_quantity") >= t)
        .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      li.groupBy(_._1).values.flatMap { grp =>
        val ps = grp.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
      }.toSet
    }
    val e43 = pairs(43)
    val e41 = pairs(41)
    val deleted = e43.filter { case (u, v) => (u * 31 + v) % 3 == 0 }
    val fin = e41 -- deleted
    val allv = e41.flatMap(e => Seq(e._1, e._2))
    def components(es: Set[(Long, Long)], vs: Set[Long]): Map[Long, Long] = {
      val m = MiningQueries.mergeGroups(es.toSeq)
      vs.map(v => v -> m.getOrElse(v, v)).toMap
    }
    val exp = components(fin, allv)
    val got = Catalog.queries("gph_cdc_components_with_deletes")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp, s"got ${got.size} vertices, expected ${exp.size}")
    // the data genuinely exercises a SPLIT: deleting the %3 edges from
    // the batch-1 graph increases its component count, and some pair of
    // vertices shares a component before the delete but not after
    val before = components(e43, e43.flatMap(e => Seq(e._1, e._2)))
    val after43 = components(e43 -- deleted, e43.flatMap(e => Seq(e._1, e._2)))
    assert(after43.values.toSet.size > before.values.toSet.size,
      "the delete batch must split at least one component")
    val splitPair = before.keys.toSeq.sorted.combinations(2).take(2000000).find { p =>
      before(p(0)) == before(p(1)) && after43(p(0)) != after43(p(1))
    }
    assert(splitPair.isDefined, "some vertex pair must be separated by the delete")
    // vertices stranded edgeless by the delete survive as self-labeled
    // singletons (unless batch 3 re-attaches them)
    val finVerts = fin.flatMap(e => Seq(e._1, e._2))
    val stranded = allv -- finVerts
    assert(stranded.nonEmpty && stranded.forall(v => got(v) == v),
      "stranded vertices must be self-labeled singletons")
  }

  test("boruvkaForest: forced picks on a triangle; random graphs get spanning acyclic forests") {
    import spark.implicits._
    // triangle 1-2-3: comp minima pick (1,2) twice and (1,3); (2,3) is
    // the non-tree edge — the deterministic choice the cut relies on
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    val fTri = MiningQueries.boruvkaForest(tri).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fTri == Set((1L, 2L), (1L, 3L)), s"triangle forest: $fTri")
    // randomized law: forest ⊆ edges, same components, and exactly
    // (non-isolated vertices − components) edges — i.e. acyclic + spanning
    val rnd = new scala.util.Random(42)
    (0 until 4).foreach { trial =>
      val n = 30 + trial * 17
      val edges = (0 until (n * 2)).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val verts = edges.flatMap(e => Seq(e._1, e._2)).toSet
      def comps(es: Iterable[(Long, Long)]): Map[Long, Long] = {
        val m = MiningQueries.mergeGroups(es.toSeq)
        verts.map(v => v -> m.getOrElse(v, v)).toMap
      }
      val cg = comps(edges)
      val nComps = cg.values.toSet.size
      // the same laws hold for BOTH builders (Borůvka = the log-round
      // guarantee; hook-and-compress = the hot path, labels included)
      val fB = MiningQueries.boruvkaForest(edges.toDF("u", "v")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val (lblDf, fDf) = MiningQueries.hookForest(edges.toDF("u", "v"))
      val fM = fDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((name, f) <- Seq(("boruvka", fB), ("hook", fM))) {
        assert(f.subsetOf(edges.toSet), s"trial $trial/$name: forest must be ⊆ edges")
        assert(comps(f) == cg, s"trial $trial/$name: forest must span every component")
        assert(f.size == verts.size - nComps,
          s"trial $trial/$name: |forest|=${f.size} != ${verts.size} - $nComps (acyclic)")
      }
      val lbls = lblDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lbls == cg, s"trial $trial: hookForest labels must be component minima")
    }
    // min-label triangle picks match the cut spec's forced expectations
    val (lt, ft) = MiningQueries.hookForest(tri)
    assert(ft.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (1L, 3L)))
    assert(lt.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("forest cut: a planted non-tree delete skips the rebuild; a tree delete splits; re-insert re-merges") {
    import spark.implicits._
    val m = new MiningQueries.ForestCutCC(spark, graft.analytics.Q.scratch("fccspec"))
    // triangle {1,2,3} + far pair {10,11}
    m.init(Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)).toDF("u", "v"))
    def labs(): Map[Long, Long] = m.components.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    assert(labs() == full)
    assert(m.forest.read().select("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (1L, 3L), (10L, 11L)), "certificate must be the Borůvka picks")
    // non-tree delete: (2,3) misses the forest — MUST skip, labels frozen
    val fired1 = m.delete(1L, Seq((2L, 3L)).toDF("u", "v"))
    assert(!fired1 && m.nSkipped == 1 && m.nRebuilds == 0,
      "a non-tree delete must take the free path")
    assert(labs() == full, "a skipped batch must not move any label")
    // tree delete: (1,2) is a certificate edge — rebuild fires, 2 strands
    val fired2 = m.delete(2L, Seq((1L, 2L)).toDF("u", "v"))
    assert(fired2 && m.nRebuilds == 1, "a tree delete must fire the scoped rebuild")
    assert(labs() == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 10L -> 10L, 11L -> 10L),
      s"split must strand vertex 2: ${labs()}")
    // the far component was never in scope — its tree edge survives
    val f2 = m.forest.read().select("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(f2 == Set((1L, 3L), (10L, 11L)), s"post-rebuild forest: $f2")
    // re-insert re-merges and extends the certificate
    m.insert(3L, Seq((2L, 3L)).toDF("u", "v"))
    assert(labs() == full, "re-insert must re-merge the split component")
    assert(m.forest.read().select("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet.contains((2L, 3L)),
      "the merging edge must join the certificate")
  }

  // The deletion fast path's whole argument rests on one invariant: after
  // ANY interleaving of inserts, skips, and scoped rebuilds, the
  // maintained forest is still a spanning forest of the live graph (a
  // non-tree delete can then never split a component). The directed test
  // above drives one planted schedule; this seeded walk drives ten random
  // batches and re-proves, after EVERY batch: labels ≡ a min-label
  // recompute of the surviving graph (isolated vertices self-labeled),
  // the certificate ⊆ live edges + spans exactly the live components +
  // is acyclic (|F| = |touched V| − #components), the lbl-keyed postings
  // mirror the labels, and each deletion batch took exactly the path its
  // forest membership predicts. Seed in every clue (GRAFT_FCC_SEED
  // replays).
  test("randomized forest-cut walk: certificate stays a spanning forest; " +
      "labels track the recompute; skip/rebuild classified exactly") {
    import spark.implicits._
    val seed = sys.env.get("GRAFT_FCC_SEED").map(_.toLong).getOrElse(20260817L)
    val rnd = new scala.util.Random(seed)
    def clue(s: String) = s"seed=$seed: $s"
    val m = new MiningQueries.ForestCutCC(spark, graft.analytics.Q.scratch("fccrand"))
    // a DENSE pool (24 vertices, ~60 initial edges) keeps a healthy
    // non-tree fraction so random deletes land on both paths
    def pair(): (Long, Long) = {
      val u = 1L + rnd.nextInt(24); var v = 1L + rnd.nextInt(24)
      while (v == u) v = 1L + rnd.nextInt(24)
      if (u < v) (u, v) else (v, u)
    }
    var liveE = Set.empty[(Long, Long)]
    var verts = Set.empty[Long]
    val initE = Iterator.continually(pair()).take(150).toSet.take(60)
    liveE = initE; verts = initE.flatMap(e => Set(e._1, e._2))
    m.init(initE.toSeq.toDF("u", "v"))
    def comps(edges: Set[(Long, Long)], vs: Set[Long]): Map[Long, Set[Long]] = {
      val mm = MiningQueries.mergeGroups(edges.toSeq)
      vs.groupBy(v => mm.getOrElse(v, v))
    }
    def checkAll(b: Int): Unit = {
      val labs = m.components.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val mm = MiningQueries.mergeGroups(liveE.toSeq)
      val exp = verts.map(v => v -> mm.getOrElse(v, v)).toMap
      assert(labs == exp, clue(s"batch $b labels diverge from the recompute"))
      val f = m.forest.read().select("u", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(f.subsetOf(liveE), clue(s"batch $b forest carries dead edges: ${f -- liveE}"))
      assert(comps(f, verts) == comps(liveE, verts),
        clue(s"batch $b forest does not span the live components"))
      val vE = liveE.flatMap(e => Set(e._1, e._2))
      val nComp = comps(liveE, vE).size
      assert(f.size == vE.size - nComp,
        clue(s"batch $b |F|=${f.size} != ${vE.size} - $nComp (acyclic spanning)"))
      val post = m.postings.read().select("lbl", "vtx").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(post == labs.toSeq.map { case (v, l) => (l, v) }.toSet,
        clue(s"batch $b postings diverge from labels"))
    }
    checkAll(0)
    (1 to 10).foreach { b =>
      if (rnd.nextBoolean() || liveE.size < 5) {
        val add = Iterator.continually(pair()).filterNot(liveE)
          .take(1 + rnd.nextInt(6)).toSet
        liveE ++= add; verts ++= add.flatMap(e => Set(e._1, e._2))
        m.insert(b.toLong, add.toSeq.toDF("u", "v"))
      } else {
        val dels = rnd.shuffle(liveE.toSeq).take(1 + rnd.nextInt(4)).toSet
        val fNow = m.forest.read().select("u", "v").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val expectFire = dels.exists(fNow)
        liveE --= dels
        val fired = m.delete(b.toLong, dels.toSeq.toDF("u", "v"))
        assert(fired == expectFire,
          clue(s"batch $b: fired=$fired but forest membership predicts $expectFire"))
      }
      checkAll(b)
    }
    // coverage backstop: whichever delete path the random walk missed is
    // driven once deterministically (a known non-tree edge must skip, a
    // known certificate edge must fire), so every seed proves both paths
    val fEnd = m.forest.read().select("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    if (m.nSkipped == 0) {
      val nt = (liveE -- fEnd).head
      liveE -= nt
      assert(!m.delete(90L, Seq(nt).toDF("u", "v")),
        clue(s"deleting non-tree $nt must skip"))
      checkAll(90)
    }
    if (m.nRebuilds == 0) {
      val te = fEnd.head
      liveE -= te
      assert(m.delete(91L, Seq(te).toDF("u", "v")),
        clue(s"deleting certificate edge $te must fire the rebuild"))
      checkAll(91)
    }
    assert(m.nSkipped >= 1 && m.nRebuilds >= 1,
      clue(s"both delete paths must be exercised " +
        s"(skipped=${m.nSkipped} rebuilds=${m.nRebuilds})"))
  }

  test("forest-cut entry: final labels equal a from-scratch recompute of the surviving graph") {
    def pairs(t: Int): Set[(Long, Long)] = {
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .filter(col("l_quantity") >= t)
        .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      li.groupBy(_._1).values.flatMap { grp =>
        val ps = grp.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
      }.toSet
    }
    val e43 = pairs(43)
    val e41 = pairs(41)
    val deleted = e43.filter { case (u, v) => (u * 31 + v) % 3 == 0 }
    val fin = e41 -- deleted
    val allv = e41.flatMap(e => Seq(e._1, e._2))
    val mm = MiningQueries.mergeGroups(fin.toSeq)
    val exp = allv.map(v => v -> mm.getOrElse(v, v)).toMap
    val got = Catalog.queries("gph_cdc_forest_cut_components")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp, s"got ${got.size} vertices, expected ${exp.size}")
  }

  test("session-bounded event-pattern matching: gap cut + per-session Kleene counts match a driver fold") {
    val got = q("evt_pattern_match_sessions")
      .selectExpr("user_id", "CAST(session_start AS STRING) AS ss", "trace",
        "n_funnel", "n_error_retry", "longest_view_run")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val evs = graft.core.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us", "CAST(ts AS STRING) AS tss",
        "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getString(4)))
    val exp = evs.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._4)) // (micros, event_id)
      // 10-minute-gap session fold — the independent re-derivation of the cut
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long, String, Long, String)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._2 - cur.head._2 <= 600000000L => (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }.map(_.reverse).reverse
      sessions.map { sess =>
        val trace = sess.map(_._5.head).mkString
        def cnt(p: String): Long = p.r.findAllMatchIn(trace).length.toLong
        val runs = "v+".r.findAllIn(trace).map(_.length.toLong).toSeq
        (uid, sess.head._3) -> (trace, cnt("s[cv]*p"), cnt("e[cv]*e"),
          if (runs.isEmpty) 0L else runs.max)
      }
    }.toMap
    assert(got == exp, s"got ${got.size} sessions, expected ${exp.size}")
    // the bound is REAL: sessionization must split at least one user's
    // lifetime trace (more sessions than users), and signal survives the
    // cut (some in-session funnel match)
    val users = exp.keys.map(_._1).toSet
    assert(exp.size > users.size, "the 10-minute gap must split some user's trace")
    assert(got.values.exists(_._2 > 0), "some in-session funnel match expected")
  }

  test("cepTtlBatch: a crash on either side of the commit neither loses nor double-archives sessions") {
    import spark.implicits._
    val work = graft.analytics.Q.scratch("cepttlcrash")
    val sink = new graft.sinks.SnapshotSink(spark, s"$work/sess",
      Seq("user_id", "session_start"))
    val exp = s"$work/export"
    def batch(rows: (Long, Long, Long, String)*) =
      rows.toSeq.toDF("user_id", "us", "event_id", "ini")
    def state(): Map[(Long, Long), (String, Long)] = sink.read()
      .select("user_id", "session_start", "trace", "qbatch").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3))).toMap
    def exported(b: Long): Set[(Long, Long, Long)] = spark.read.parquet(s"$exp/b$b")
      .select("user_id", "session_start", "qbatch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val M = 600000000L // the 10-minute session gap in micros
    // batch 0: user 1 has two gap-separated sessions — the first closes
    StreamingQueries.cepTtlBatch(spark, sink, exp,
      batch((1, 0, 1, "s"), (1, 2 * M, 2, "p")), 0)
    assert(state() == Map((1L, 0L) -> ("s", 0L), (1L, 2 * M) -> ("p", 99L)))
    assert(exported(0).isEmpty, "nothing is old enough to archive at batch 0")
    // batch 1: the open session closes (gap), a new one opens; the
    // batch-0 closure is only 1 batch old — still under the horizon
    StreamingQueries.cepTtlBatch(spark, sink, exp, batch((1, 4 * M, 3, "c")), 1)
    assert(state() == Map((1L, 0L) -> ("s", 0L), (1L, 2 * M) -> ("p", 1L),
      (1L, 4 * M) -> ("c", 99L)))
    assert(exported(1).isEmpty)
    // batch 2: the batch-0 closure ages out. Crash BEFORE the commit:
    // archive durable, sink unchanged
    val base = state()
    sink.faultHook = pt => if (pt == "before-commit") sys.error("injected crash")
    intercept[Exception] {
      StreamingQueries.cepTtlBatch(spark, sink, exp, batch((2, 9 * M, 4, "e")), 2)
    }
    sink.faultHook = _ => ()
    assert(!sink.applied(2) && state() == base,
      "pre-commit crash must leave the sink unchanged")
    assert(exported(2) == Set((1L, 0L, 0L)),
      "the archive is already durable — and correct, since state is unchanged")
    // the retry replays against UNCHANGED inputs: identical archive, commit
    StreamingQueries.cepTtlBatch(spark, sink, exp, batch((2, 9 * M, 4, "e")), 2)
    assert(sink.applied(2) && exported(2) == Set((1L, 0L, 0L)))
    assert(!state().contains((1L, 0L)), "the aged closure left the sink")
    assert(state()((2L, 9 * M)) == ("e", 99L))
    // batch 3: crash AFTER the commit, then a POISONED replay — the
    // applied-id gate must cut it off before it touches archive or sink
    sink.faultHook = pt => if (pt == "after-commit") sys.error("injected crash")
    intercept[Exception] {
      StreamingQueries.cepTtlBatch(spark, sink, exp, batch((2, 11 * M, 5, "v")), 3)
    }
    sink.faultHook = _ => ()
    assert(sink.applied(3), "the commit landed before the crash")
    val committed = state()
    val e3 = exported(3)
    assert(e3 == Set((1L, 2 * M, 1L)), "the batch-1 closure archived at 3")
    StreamingQueries.cepTtlBatch(spark, sink, exp, batch((9, 1, 9, "x")), 3)
    assert(state() == committed && exported(3) == e3,
      "a replayed committed batch must not recompute state or archives")
  }

  test("streaming sessionized CEP: closures land in their closing batch; open sessions carry across batches") {
    val got = q("evt_stream_sessionized_cep").collect()
      .map(r => (r.getLong(1), r.getLong(2)) ->
        (r.getLong(0), r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val evs = graft.core.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3).head.toString))
    // ntile(4) replay over the global (us, event_id, user_id) order:
    // first n%4 buckets get ceil(n/4) rows — the staging quartiles
    val sortedAll = evs.sortBy(e => (e._2, e._3, e._1))
    val n = sortedAll.length
    val (qq, rr) = (n / 4, n % 4)
    val batchOf = sortedAll.zipWithIndex.map { case (e, i) =>
      val b = if (i < rr * (qq + 1)) i / (qq + 1) else rr + (i - rr * (qq + 1)) / qq
      (e._1, e._2, e._3) -> b.toLong
    }.toMap
    val exp = evs.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Long, String)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._2 - cur.head._2 <= 600000000L => (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }.map(_.reverse).reverse
      sessions.zipWithIndex.map { case (sess, i) =>
        val trace = sess.map(_._4).mkString
        def cnt(p: String): Long = p.r.findAllMatchIn(trace).length.toLong
        val runs = "v+".r.findAllIn(trace).map(_.length.toLong).toSeq
        val qbatch =
          if (i + 1 < sessions.size) {
            val nx = sessions(i + 1).head
            batchOf((nx._1, nx._2, nx._3))
          } else 99L
        (uid, sess.head._2) -> ((qbatch, trace, cnt("s[cv]*p"), cnt("e[cv]*e"),
          if (runs.isEmpty) 0L else runs.max))
      }
    }.toMap
    assert(got == exp, s"got ${got.size} sessions, expected ${exp.size}")
    // serving signals: closures land in real batches AND at the end some
    // sessions are still open; some closure is CROSS-batch (its session's
    // last event sits in an earlier batch than the successor that closes
    // it), proving the carried-open-state (pseudo-row) path ran
    val qbs = got.values.map(_._1).toSet
    assert(qbs.contains(99L) && (qbs - 99L).nonEmpty, s"qbatches: $qbs")
    val crossBatchClose = evs.groupBy(_._1).exists { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Long, String)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._2 - cur.head._2 <= 600000000L => (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }.map(_.reverse).reverse
      sessions.zip(sessions.drop(1)).exists { case (a, b) =>
        val last = a.last
        val nxt = b.head
        batchOf((last._1, last._2, last._3)) < batchOf((nxt._1, nxt._2, nxt._3))
      }
    }
    assert(crossBatchClose,
      "some closure must happen in a later batch than its session's last event")
  }
}
