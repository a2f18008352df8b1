package graft.analytics

import graft.SparkSpec
import graft.core.Tables

/** Semantic invariants for the prep/mixture battery; exact values are
  * gated by the DuckDB oracle, these specs re-derive the math
  * independently driver-side.
  */
class PrepQueriesSpec extends SparkSpec {

  test("dsir: scores and selection match an independent integer reimplementation") {
    // full re-derivation of the linearized importance weight from the raw
    // table — same hash, same smoothing, same integer scaling, different
    // code path (plain Scala, no Spark/DuckDB)
    def rh(s: String): Long = {
      var acc = 0L
      s.getBytes("UTF-8").foreach(b => acc = (acc * 31 + (b & 0xff)) % (1L << 31))
      acc
    }
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text").collect()
      // split limit -1: Java's default drops trailing empty tokens,
      // Spark's split()/DuckDB's string_split keep them; the ß中 suffix
      // mirrors the entry's planted multibyte token (UTF-8 byte-hash gate)
      .map(x => (x.getLong(0), x.getString(1),
        (x.getString(2) + " ß中" + (x.getLong(0) % 5)).split(" ", -1).toSeq))
      .filter(_._3.size >= 2)
    val bigrams = docs.map { case (id, lang, toks) =>
      (id, lang, toks.sliding(2).map(p => rh(p.mkString(" ")) % 64).toSeq)
    }
    val ct = Array.fill(64)(0L)
    val cr = Array.fill(64)(0L)
    var nt = 0L; var nr = 0L
    bigrams.foreach { case (_, lang, bs) =>
      bs.foreach { b =>
        cr(b.toInt) += 1; nr += 1
        if (lang == "en") { ct(b.toInt) += 1; nt += 1 }
      }
    }
    val r = (0 until 64).map { b =>
      val pt = (1000000000L * (ct(b) + 1)) / (nt + 64)
      val pr = (1000000000L * (cr(b) + 1)) / (nr + 64)
      math.min((1000000L * pt) / math.max(pr, 1L), 1000000000L)
    }
    val expScore = bigrams.map { case (id, _, bs) =>
      id -> bs.map(b => r(b.toInt)).sum
    }.toMap
    val thr = expScore.values.sum / expScore.size
    val got = Catalog.queries("mix_dsir_importance_select")(spark, sf0001)
      .collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getBoolean(2)))).toMap
    assert(got.keySet == expScore.keySet)
    expScore.foreach { case (id, s) =>
      assert(got(id) == ((s, s > thr)), s"doc $id: ${got(id)} != ($s, ${s > thr})")
    }
    // the gate must actually split the corpus, and the target slice must
    // carry higher PER-BIGRAM importance than the rest (the whole point
    // of DSIR; per-doc means would be confounded by document length,
    // since the score sums over bigram occurrences)
    val sel = got.values.count(_._2)
    assert(sel > 0 && sel < got.size)
    val perBigram = bigrams.map { case (id, lang, bs) =>
      (lang, expScore(id), bs.size.toLong)
    }
    def ratio(p: (String, Long, Long) => Boolean): Double = {
      val xs = perBigram.filter(t => p(t._1, t._2, t._3))
      xs.map(_._2).sum.toDouble / xs.map(_._3).sum
    }
    assert(ratio((l, _, _) => l == "en") > ratio((l, _, _) => l != "en"),
      "target-language bigrams must carry higher mean importance")
  }

  test("dsir resample: budgets sum EXACTLY to B globally and per shard, cover all selected docs") {
    val budget = 1000000L
    val sel = Catalog.queries("mix_dsir_importance_select")(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("selected"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = Catalog.queries("mix_dsir_resample_budget")(spark, sf0001)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(rows.map(_._1).toSet == sel, "exactly the selected docs get budgets")
    assert(rows.map(_._3).sum == budget,
      s"global sum ${rows.map(_._3).sum} != $budget — largest-remainder exactness broken")
    // per-shard sums must each be a fixed integer (level-1 apportionment):
    // re-derive level 1 from the shard masses and compare
    val scores = Catalog.queries("mix_dsir_importance_select")(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("selected"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    def shardOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rs|$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString
      ("0123456789abcdef".indexOf(hex.charAt(0)) % 8).toLong
    }
    val mass = scores.toSeq.groupBy { case (id, _) => shardOf(id) }
      .map { case (sh, xs) => sh -> xs.map(_._2).sum }
    val den = mass.values.sum
    val base = mass.map { case (sh, m) => sh -> budget * m / den }
    val lo = budget - base.values.sum
    val order = mass.toSeq.map { case (sh, m) => ((-(budget * m % den), sh), sh) }
      .sortBy(_._1).map(_._2)
    val expShard = base ++ order.take(lo.toInt).map(sh => sh -> (base(sh) + 1L))
    val gotShard = rows.groupBy(_._2).map { case (sh, xs) => sh -> xs.map(_._3).sum }
    assert(gotShard == expShard, s"per-shard budgets $gotShard != $expShard")
    assert(rows.forall(_._3 >= 0))
  }

  test("incremental shard export equals a plain-Scala CDC replay") {
    val got = Catalog.queries("cdc_incremental_shard_export")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val base = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val state = scala.collection.mutable.Map.empty[Long, String]
    base.foreach { case (id, t) => state(id) = t }
    (1 to 3).foreach { b =>
      base.foreach { case (id, t) =>
        if (id % 10 == b) state(id) = t + s" rev$b"
        else if (id % 17 == b) state.remove(id)
        if (id % 23 == b) state(id + 1000000L * b) = t + s" ins$b"
      }
    }
    val exp = state.map { case (id, t) =>
      val bts = t.getBytes("UTF-8")
      val md = java.security.MessageDigest.getInstance("MD5").digest(bts)
        .map(x => f"$x%02x").mkString
      id -> ((id / 100, bts.length.toLong, md))
    }.toMap
    assert(got == exp, "published members must equal the replayed final state")
    // the CDC semantics all fired: a delete absent, an insert present,
    // a revision's checksum differs from the base text's
    assert(base.exists { case (id, _) =>
      id % 17 == 1 && id % 10 != 1 && !got.contains(id) })
    assert(got.keys.exists(_ > 1000000L))
    val revised = base.find { case (id, _) =>
      id % 10 == 1 && id % 17 != 2 && id % 17 != 3 }.get
    val baseMd = java.security.MessageDigest.getInstance("MD5")
      .digest(revised._2.getBytes("UTF-8")).map(x => f"$x%02x").mkString
    assert(got(revised._1)._3 != baseMd)
  }

  test("budget-enforcing selection: within allocation, maximal, and re-derivable") {
    val got = Catalog.queries("mix_budget_enforce_selection")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "source", "CAST(size(split(text, ' ')) AS LONG) AS n_tok")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(x => f"$x%02x").mkString
    // apportion (largest remainder over sqrt weights)
    val budget = 1000000L
    val bySrc = docs.groupBy(_._2).map { case (src, g) => src -> g.map(_._3).sum }
    val pw = bySrc.map { case (s0, n) =>
      s0 -> math.floor(math.sqrt(n.toDouble) * 1000000d + 0.5d).toLong }
    val den = pw.values.sum
    val base = pw.map { case (s0, p) => s0 -> budget * p / den }
    val rem = pw.map { case (s0, p) => s0 -> budget * p % den }
    val leftover = budget - base.values.sum
    val ranked = rem.toSeq.sortBy { case (s0, r) => (-r, s0) }.map(_._1).zipWithIndex
    val alloc = ranked.map { case (s0, i) =>
      s0 -> (base(s0) + (if (i + 1 <= leftover) 1L else 0L)) }.toMap
    // selection: per source, md5 order, take while cum <= alloc
    val exp = docs.groupBy(_._2).map { case (src, g) =>
      val ordered = g.sortBy(t => (md5hex(s"sel|${t._1}"), t._1))
      val cums = ordered.map(_._3).scanLeft(0L)(_ + _).tail
      val taken = ordered.zip(cums).takeWhile(_._2 <= alloc(src))
      src -> ((taken.size.toLong, taken.map(_._1._3).sum, alloc(src),
        taken.map(_._1._3).sum * 1000000L / alloc(src)))
    }
    assert(got == exp)
    // spend is within allocation and MAXIMAL in the shuffle order: the
    // next doc (if any) would overspend
    got.foreach { case (src, (nSel, spent, al, _)) =>
      assert(spent <= al, s"$src overspent")
      val ordered = docs.filter(_._2 == src)
        .sortBy(t => (md5hex(s"sel|${t._1}"), t._1))
      if (nSel < ordered.size)
        assert(spent + ordered(nSel.toInt)._3 > al, s"$src not maximal")
    }
  }

  test("temperature weights: exact nested-isqrt replay, ppm-exact, flattening") {
    val got = Catalog.queries("mix_temperature_weights")(spark, sf0001)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("source", "CAST(size(split(text, ' ')) AS LONG) AS n_tok")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def isqrt(x: Long): Long = {
      // independent exact integer sqrt (Newton), no double involved
      var g = math.max(1L, math.sqrt(x.toDouble).toLong)
      while (g * g > x) g = (g + x / g) / 2
      while ((g + 1) * (g + 1) <= x) g += 1
      g
    }
    val bySrc = docs.groupBy(_._1).map { case (s0, g) => s0 -> g.map(_._2).sum }
    val pw = bySrc.map { case (s0, n) => s0 -> isqrt(isqrt(n * 1000000L) * 1000000L) }
    val den = pw.values.sum
    val base = pw.map { case (s0, p) => s0 -> 1000000L * p / den }
    val rem = pw.map { case (s0, p) => s0 -> 1000000L * p % den }
    val leftover = 1000000L - base.values.sum
    val ranked = rem.toSeq.sortBy { case (s0, r) => (-r, s0) }.map(_._1).zipWithIndex
    val exp = ranked.map { case (s0, i) =>
      s0 -> ((bySrc(s0), base(s0) + (if (i + 1 <= leftover) 1L else 0L))) }.toMap
    assert(got == exp, "weights must equal the exact-isqrt replay")
    // normalization is EXACT: ppm weights sum to 1e6
    assert(got.values.map(_._2).sum == 1000000L, "ppm must sum exactly to 1e6")
    // the temperature property: T=4 flattens the mixture — the smallest
    // source's weight EXCEEDS its proportional token share, the largest
    // source's falls below it (this is why temperature sampling exists)
    val totTok = bySrc.values.sum
    val smallest = bySrc.minBy(_._2)._1
    val largest = bySrc.maxBy(_._2)._1
    assert(bySrc(smallest) < bySrc(largest), "need distinct source sizes")
    assert(got(smallest)._2 > bySrc(smallest) * 1000000L / totTok,
      "low-resource source must be upsampled past proportional")
    assert(got(largest)._2 < bySrc(largest) * 1000000L / totTok,
      "high-resource source must be downsampled below proportional")
  }

  test("DPO pairs: best-vs-worst pairing matches a driver replay, margins positive") {
    val got = Catalog.queries("prep_dpo_pairs")(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "lang", "text").collect()
      .map { r =>
        val toks = r.getString(3).split(" ", -1)
        val score = toks.distinct.length.toLong * 1000 / toks.length +
          math.min(toks.length.toLong, 100)
        (r.getString(1), r.getString(2)) -> (r.getLong(0), score)
      }
    val exp = docs.groupBy(_._1).flatMap { case ((src, lang), grp) =>
      val pool = grp.map(_._2)
      val best = pool.sortBy { case (id, sc) => (-sc, id) }
      val worst = pool.sortBy { case (id, sc) => (sc, -id) }
      (0 until pool.length / 2).flatMap { i =>
        val (cd, cs) = best(i); val (rd, rs) = worst(i)
        if (cs > rs) Some((src, lang, i + 1L) -> (cd, rd, cs, rs, cs - rs))
        else None
      }
    }
    assert(got == exp, s"got ${got.size} pairs, expected ${exp.size}")
    assert(got.nonEmpty, "plant failure: no preference pairs produced")
    // structural properties: positive margins; a doc never chosen AND
    // rejected in the same pool at the same rank against itself
    got.foreach { case ((src, lang, _), (cd, rd, cs, rs, m)) =>
      assert(m > 0 && cs - rs == m && cd != rd, s"($src,$lang): $cd vs $rd")
    }
  }

  test("group k-fold: entity-pure folds matching a driver replay, every fold populated") {
    val got = Catalog.queries("smp_group_kfold")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("CAST(o_custkey AS BIGINT)").collect().map(_.getLong(0))
    val folds = rows.map(c => c -> java.lang.Long.parseLong(
      md5hex(s"fold3|$c").take(8), 16) % 5)
    val nTot = rows.length.toLong
    val exp = folds.groupBy(_._2).map { case (f, xs) =>
      f -> (xs.map(_._1).distinct.length.toLong, xs.length.toLong,
        xs.length.toLong * 1000000L / nTot, true)
    }
    assert(got == exp, s"got $got")
    assert(got.keySet == (0L until 5L).toSet, "every fold must be populated")
    assert(got.values.forall(_._4), "row-level leak check must pass")
  }
}
