package graft.analytics

import graft.SparkSpec
import graft.core.Tables
import graft.functions.Similarity

/** Semantic invariants for the corpus-ops battery. */
class CorpusOpsQueriesSpec extends SparkSpec {

  test("hard negatives: exactly the most-similar opposite-label LSH candidate") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding", "label").collect()
      .map(x => (x.getLong(0), x.getSeq[Float](1).map(_.toDouble).toVector,
        x.getInt(2)))
    // re-derive the 8-table x 4-bit buckets from the md5 hyperplane signs
    def buckets(v: Vector[Double]): Seq[(Int, Long)] =
      (0 until 8).map { t =>
        val b = (0 until 4).foldLeft(0L) { (acc, j) =>
          val dot = v.indices.foldLeft(0.0)((a, k) =>
            a + Similarity.hyperplaneSign(t * 4 + j, k) * v(k))
          if (dot > 0) acc + (1L << j) else acc
        }
        (t, b)
      }
    def cos(a: Vector[Double], b: Vector[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var k = 0
      while (k < a.size) { d += a(k) * b(k); na += a(k) * a(k); nb += b(k) * b(k); k += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val bk = vecs.map { case (id, v, l) => (id, v, l, buckets(v).toSet) }
    val got = Catalog.queries("emb_hard_negative_mining")(spark, sf0001)
      .collect()
      .map(x => (x.getLong(0), (x.getInt(1), x.getLong(2), x.getInt(3), x.getDouble(4))))
      .toMap
    val anchors = bk.filter(_._1 % 25 == 0)
    anchors.foreach { case (aid, av, al, ab) =>
      val cands = bk.filter { case (id, _, l, b) =>
        l != al && b.intersect(ab).nonEmpty
      }
      if (cands.isEmpty) assert(!got.contains(aid))
      else {
        val best = cands.map { case (id, v, l, _) => ((-cos(av, v), id), (id, l)) }
          .minBy(_._1)._2
        val (gl, gid, gnl, gcos) = got(aid)
        assert(gl == al && gid == best._1 && gnl == best._2,
          s"anchor $aid: got ($gid, $gnl), expected $best")
        assert(math.abs(gcos - cos(av, bk.find(_._1 == gid).get._2)) < 1e-3)
        assert(gnl != al, "negative must carry a different label")
      }
    }
    assert(got.nonEmpty, "mining must produce pairs at sf0.001")
  }

  test("sparse cosine: planted pairs carry exact rational cos² values") {
    val rows = graft.analytics.Catalog.queries("sim_sparse_cosine_pairs")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1) + " uq" + r.getLong(0))).toMap
    def tf(t: String): Map[String, Long] =
      t.split(" ", -1).groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    // exact copies: cos² must be exactly 1e6
    docs.keys.filter(_ % 10 == 0).foreach { id =>
      val got = rows.get((id, id + 1000000L))
      assert(got.isDefined, s"exact dup pair for $id missing")
      assert(got.get._2 == 1000000L, s"exact dup $id cos2 ${got.get._2}")
    }
    // near copies: re-derive dot and cos² against the drifted text
    docs.keys.filter(_ % 15 == 0).take(10).foreach { id =>
      val a = tf(docs(id))
      val b = tf(docs(id) + " drifta driftb driftc")
      val dot = a.keysIterator.filter(b.contains).map(w => a(w) * b(w)).sum
      val na2 = a.values.map(v => v * v).sum
      val nb2 = b.values.map(v => v * v).sum
      val cos2 = dot * dot * 1000000L / (na2 * nb2)
      val got = rows.get((id, id + 2000000L))
      assert(got.isDefined && got.get == ((dot, cos2)), s"near dup $id: $got")
      assert(cos2 < 1000000L, "drift must pull cos2 below exact")
    }
  }

  test("boilerplate prefix: min/max LCP equals the LCP over ALL documents") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), s"[${r.getString(0)}] ${r.getString(1)}"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
    def lcp2(a: String, b: String): Int = {
      var i = 0
      while (i < math.min(a.length, b.length) && a(i) == b(i)) i += 1
      i
    }
    val got = graft.analytics.Catalog.queries("txt_boilerplate_prefix")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    docs.foreach { case (src, texts) =>
      // ground truth the EXPENSIVE way: fold LCP over every doc
      val full = texts.reduce((a, b) => a.take(lcp2(a, b)))
      assert(got(src) == ((texts.size.toLong, full.length.toLong, full)),
        s"source $src: min/max identity must equal the full fold")
      assert(full.startsWith(s"[$src] "), "planted header must be detected")
    }
  }
}
