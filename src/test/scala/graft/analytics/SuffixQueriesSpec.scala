package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the distributed suffix array: the entry's SA + LCP must equal
  * a driver-side brute force on the SAME stream (suffix order by direct
  * token-sequence comparison, LCP by direct prefix scan) — the strongest
  * possible gate, since every rank and every lcp value is pinned, not
  * just aggregates. The excision entry pins the planted first-occurrence
  * semantics.
  */
class SuffixQueriesSpec extends SparkSpec {

  /** The entry's stream, rebuilt independently with plain Scala. */
  private def bruteStream(): Vector[(Long, Long, String)] = {
    val planted = (0 to 9).map(i => s"xrep$i").mkString(" ")
    val docs = graft.core.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 4 === 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        if (r.getLong(0) % 28 == 0) r.getString(1) + " " + planted
        else r.getString(1)))
      .sortBy(_._1)
    docs.toVector.flatMap { case (id, text) =>
      val toks = text.split(" ", -1).toVector
      toks.zipWithIndex.map { case (t, i) => (id, i.toLong, t) } :+
        ((id, toks.size.toLong, "\u0001" + id))
    }
  }

  test("suffix array + LCP equal a driver-side brute force exactly") {
    val stream = bruteStream()
    val toks = stream.map(_._3)
    val n = toks.size
    // token order must be UTF-8 BINARY (what Spark and DuckDB both sort
    // by) — String.compareTo is UTF-16 code-unit order, which diverges on
    // supplementary-plane characters, so compare encoded bytes
    def tokCmp(x: String, y: String): Int = {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < a.length && i < b.length) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
    // suffix order by direct token-sequence comparison (prefix < extension)
    def cmp(a: Int, b: Int): Boolean = {
      var i = a; var j = b
      while (i < n && j < n) {
        val c = tokCmp(toks(i), toks(j))
        if (c != 0) return c < 0
        i += 1; j += 1
      }
      i == n && j < n // shorter suffix (ran off the end) sorts first
    }
    val sa = (0 until n).sortWith(cmp)
    val rankOf = new Array[Long](n)
    sa.zipWithIndex.foreach { case (pos, k) => rankOf(pos) = k + 1L }
    def lcp(a: Int, b: Int): Long = {
      var l = 0
      while (a + l < n && b + l < n && toks(a + l) == toks(b + l)) l += 1
      l.toLong
    }
    val lcpNext = sa.zipWithIndex.map { case (pos, k) =>
      pos -> (if (k == n - 1) 0L else lcp(pos, sa(k + 1)))
    }.toMap
    val got = Catalog.queries("txt_suffix_array_lcp")(spark, sf0001)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val expected = stream.zipWithIndex.collect {
      case ((doc, _, tok), pos) if !tok.startsWith("\u0001") =>
        pos.toLong -> ((doc, rankOf(pos), lcpNext(pos)))
    }.toMap
    assert(got.size == expected.size,
      s"row count ${got.size} != brute ${expected.size}")
    val diff = expected.collect {
      case (pos, e) if got.get(pos) != Some(e) => (pos, e, got.get(pos))
    }
    assert(diff.isEmpty, s"first divergences: ${diff.take(5)}")
  }

  test("excision: every planted doc except the first occurrence excises the planted span") {
    val r = Catalog.queries("ddp_suffix_repeat_excision")(spark, sf0001)
      .collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    val planted = r.keys.filter(id => id % 28 == 0).toSeq.sorted
    assert(planted.size >= 3, s"need several planted docs, got $planted")
    // doc 0 carries the corpus-first occurrence (minimum global position)
    // and is the run keeper; every other planted doc excises an interval
    // covering its planted 10-token span
    planted.filter(_ != planted.min).foreach { id =>
      val (_, _, dup, maxSpan) = r(id)
      assert(dup >= 10L, s"planted doc $id must excise >= 10 tokens, got $dup")
      assert(maxSpan >= 10L, s"planted doc $id max span $maxSpan < 10")
    }
    // conservation: excised intervals live inside the doc
    r.foreach { case (id, (nTok, nSpans, dup, maxSpan)) =>
      assert(dup <= nTok, s"doc $id dup $dup > tokens $nTok")
      assert(maxSpan <= dup, s"doc $id maxSpan $maxSpan > dup $dup")
      assert((nSpans == 0) == (dup == 0), s"doc $id spans/dup inconsistent")
    }
  }

  test("applied excision: the planted paragraph survives in exactly the minimum-position doc") {
    val phrase = (0 to 9).map(i => s"xrep$i").mkString(" ")
    val rows = Catalog.queries("ddp_suffix_excise_apply")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val report = Catalog.queries("ddp_suffix_repeat_excision")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val planted = rows.map(_._1).filter(_ % 28 == 0).sorted
    assert(planted.size >= 3, s"need several planted docs, got ${planted.toSeq}")
    val carriers = rows.collect { case (id, _, t) if t.contains(phrase) => id }
    // keep-first: the doc at the minimum corpus position (min doc_id of
    // the planted set) keeps the paragraph; every other planted doc had
    // it excised from the rendered text
    assert(carriers.toSet == Set(planted.min),
      s"planted phrase must survive only in doc ${planted.min}, got ${carriers.toSeq}")
    // conservation against the report: n_kept = n_tokens − dup_tokens
    rows.foreach { case (id, kept, text) =>
      val (nTok, dup) = report(id)
      assert(kept == nTok - dup, s"doc $id kept $kept != $nTok - $dup")
      val rendered = if (text.isEmpty) 0 else text.split(" ", -1).length
      assert(rendered.toLong == kept, s"doc $id rendered $rendered != kept $kept")
    }
  }

  test("corpus dup stats are consistent with the per-doc excision report") {
    val s = Catalog.queries("txt_corpus_dup_stats")(spark, sf0001).head()
    val (nPos, cov, groups, maxRep, ppm) =
      (s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3), s.getLong(4))
    assert(cov <= nPos && cov > 0, s"covered $cov out of range of $nPos")
    assert(groups >= 1, "the planted paragraph alone forms a repeat group")
    assert(maxRep >= 10L, s"planted 10-token repeat bounds max_repeat_len, got $maxRep")
    assert(ppm == cov * 1000000L / nPos, "ppm must be the integer ratio")
    val perDoc = Catalog.queries("ddp_suffix_repeat_excision")(spark, sf0001)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(perDoc == nPos, s"token universe mismatch: $perDoc vs $nPos")
  }

  test("globalRowNumber equals a single-partition row_number over the same order") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(5000)(rnd.nextLong()).distinct.map(x => (x, ()))
      .map(_._1).toDF("k").repartition(16)
    val got = Q.globalRowNumber(rows, Seq(col("k")), "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = got.keys.toSeq.sorted.zipWithIndex
      .map { case (k, i) => k -> (i + 1L) }.toMap
    assert(got == expected)
  }
}
