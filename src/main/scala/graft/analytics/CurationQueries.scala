package graft.analytics

import graft.core.Tables
import graft.functions.Similarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a production training-data pipeline runs
  * between raw ingestion and packing: tokenizer application (BPE merge
  * replay), perplexity-based quality bucketing (the CCNet shape), HTML
  * boilerplate stripping, entity resolution (blocked record linkage),
  * product-quantization codebook TRAINING (per-subspace k-means — the
  * sibling of the sim_pq_adc_topk SCAN, which consumes codebooks this
  * op produces), and the covariance Gramian that feeds PCA whitening.
  *
  * All oracle-gated: arithmetic stays integer/exact wherever an
  * aggregate crosses engines (the sim_ivf_kmeans_refined lattice
  * discipline).
  */
object CurationQueries {

  /** BPE merge table, rank order. Applying merges as sequential global
    * string replaces over a space-separated token string is only
    * equivalent to the token-array algorithm when no pattern can match
    * ACROSS a token boundary — i.e. at each rank, no then-existing token
    * (other than the pattern's own left part) ends with the pattern's
    * left string, and none starts with its right string. This table is
    * chosen to satisfy that invariant at every rank (checked exhaustively
    * by CurationSpec against a driver-side token-array reimplementation);
    * an arbitrary learned table goes through the token-array
    * `functions.BpeApply` expression instead (`txt_bpe_encode_learned`).
    */
  val BpeMerges: Seq[(String, String)] = Seq(
    "t h" -> "th", "th e" -> "the", "i n" -> "in", "o n" -> "on",
    "a n" -> "an", "an d" -> "and", "r e" -> "re", "l l" -> "ll",
    "s s" -> "ss")

  /** Rank-ordered whole-token replace chain over the double-spaced
    * wrapped string `s0` (oracle side), robust to learned tables SHORTER
    * than n ranks: every scalar-subquery leg is coalesced to chr(1) — a
    * control char the a-z/| normal form can never contain — so a missing
    * rank becomes a never-matching no-op pattern instead of a NULL that
    * would collapse the whole encoded string (the r08 ADVICE divergence
    * on tiny corpora).
    */
  private def bpeApplyChainSql(n: Int): String =
    (1 to n).foldLeft("s0") { (acc, r) =>
      val l = s"coalesce((SELECT substring(pair, 1, 1) FROM ranked WHERE rank = $r), chr(1))"
      val rr = s"coalesce((SELECT substring(pair, 2, 1) FROM ranked WHERE rank = $r), chr(1))"
      val p = s"coalesce((SELECT pair FROM ranked WHERE rank = $r), chr(1))"
      s"replace($acc, ' ' || $l || '  ' || $rr || ' ', ' ' || $p || ' ')"
    }

  /** 0-9a-z-only lowercase normal form, single-spaced (Spark side). */
  private def normExpr: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z ]', ''), ' +', ' '))"

  private def oracleNorm: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +', ' ', 'g'))"

  def all: Seq[CatalogQuery] = Seq(

    // ---- BPE encode: replay a merge table over the corpus ---------------
    // The APPLY half of tokenizer training (txt_bpe_merge_candidates is
    // the LEARN half): chars spaced out, word boundaries pinned as '|'
    // sentinels (merge patterns are letter-only, so they can never cross
    // one), merges replayed in rank order as global replaces — each one
    // a codegen'd string op, no UDF, linear in corpus bytes. 100 TB: a
    // pure map stage; the merge table is a broadcast-sized constant.
    CatalogQuery("txt_bpe_encode", (s, d) => {
      val spaced = "rtrim(regexp_replace(replace(norm, ' ', '|'), '(.)', '$1 '))"
      val merged = BpeMerges.foldLeft("spaced") { case (acc, (from, to)) =>
        s"replace($acc, '$from', '$to')"
      }
      Tables.documents(s, d)
        .withColumn("norm", expr(normExpr))
        .filter(length(col("norm")) > 0)
        .withColumn("spaced", expr(spaced))
        .withColumn("enc", expr(merged))
        .select(col("doc_id"),
          expr("CAST(size(filter(split(enc, ' '), x -> x != '|')) AS BIGINT)")
            .as("n_tokens"),
          expr("CAST(length(replace(norm, ' ', '')) AS BIGINT)").as("n_chars"))
    }, Some {
      val merged = BpeMerges.foldLeft("spaced") { case (acc, (from, to)) =>
        s"replace($acc, '$from', '$to')"
      }
      s"""WITH n AS (
         |  SELECT doc_id, $oracleNorm AS norm FROM documents),
         |sp AS (
         |  SELECT doc_id, norm,
         |    rtrim(regexp_replace(replace(norm, ' ', '|'), '(.)', '\\1 ', 'g')) AS spaced
         |  FROM n WHERE len(norm) > 0),
         |enc AS (SELECT doc_id, norm, $merged AS enc FROM sp)
         |SELECT doc_id,
         |  CAST(len(list_filter(str_split(enc, ' '), x -> x != '|')) AS BIGINT) AS n_tokens,
         |  CAST(len(replace(norm, ' ', '')) AS BIGINT) AS n_chars
         |FROM enc""".stripMargin
    }),

    // ---- BPE learn→apply round trip via the token-array expression ------
    // The composition a real tokenizer pipeline needs: the merge table is
    // LEARNED from this corpus at runtime (top-8 character-pair
    // candidates, the txt_bpe_merge_candidates arithmetic on the
    // normalized corpus) and applied by the general token-array
    // `bpe_apply` expression — rank-ordered greedy passes over whole
    // tokens, valid for ARBITRARY tables including the boundary-colliding
    // ones the curated global-replace entry cannot touch (e.g. 'th' and
    // 'he' both learned). The oracle replays the same algorithm as
    // chained whole-token-wrapped replaces (' a  b ' patterns can only
    // match complete tokens) with the rules pulled from the same learn
    // CTE. Gated on the full encoded token STRING, not just counts.
    // 100 TB: learn = one bounded aggregate (vocabulary-sized), apply =
    // pure map with a broadcast 1-row merge table.
    // ---- unigram-LM Viterbi tokenization ----------------------------------
    // The OTHER major subword algorithm (SentencePiece unigram; BPE's
    // learn/apply/decode siblings live above): per word, the min-cost
    // segmentation over a corpus-derived piece vocabulary by Viterbi DP.
    // Pieces are all substrings of length ≤4 of the (2..12-char) word
    // set; vocabulary keeps pieces seen ≥3 times plus ALL single chars
    // (feasibility: every word segments into chars), cost = 1e6 div
    // freq (integer, both engines identical). The DP is a fixed
    // 12-position unroll — each position joins the ≤4 incoming edges
    // against the table of already-solved prefixes, so the plan depth
    // is the max word length, NOT data-dependent — and the value is the
    // single integer m = cost·17 + pieces (pieces ≤ 12 < 17, so the
    // lexicographic (cost, pieces) order is additive and min(m) IS the
    // Viterbi optimum with fewest-pieces tie-break; no backtrack state).
    // Shape at 100 TB: everything is vocabulary-sized after the first
    // distinct-word aggregate; the unroll is 12 joins over
    // (word, position) tables with lineage truncated per step.
    CatalogQuery("txt_unigram_viterbi_tokenize", (s, d) => {
      val words = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")).between(2, 12))
        .groupBy(col("word")).agg(count(lit(1)).as("wfreq"))
        .localCheckpoint()
      val vocab = words.select(col("word"))
        .select(explode(expr(
          """flatten(transform(filter(sequence(1, 4), L -> L <= length(word)),
            |  L -> transform(sequence(1, length(word) - L + 1),
            |    p -> substring(word, p, L))))""".stripMargin)).as("piece"))
        .groupBy(col("piece")).agg(count(lit(1)).as("pfreq"))
        .filter(col("pfreq") >= 3 || length(col("piece")) === 1)
        .select(col("piece"), expr("1000000 div pfreq").as("cost"))
      val edges = words.select(col("word"))
        .select(col("word"), explode(expr(
          """flatten(transform(sequence(0, length(word) - 1), j ->
            |  transform(sequence(j + 1, least(j + 4, length(word))), i ->
            |    named_struct('j', j, 'i', i,
            |      'piece', substring(word, j + 1, i - j)))))""".stripMargin)).as("e"))
        .select(col("word"), col("e.j").as("j"), col("e.i").as("i"),
          col("e.piece").as("piece"))
        .join(vocab, Seq("piece"))
        .select(col("word"), col("j"), col("i"), col("cost"))
        .localCheckpoint()
      var dp = words.select(col("word"))
        .withColumn("i", lit(0)).withColumn("m", lit(0L)).localCheckpoint()
      (1 to 12).foreach { i =>
        val nxt = edges.filter(col("i") === i).as("e")
          .join(dp.select(col("word"), col("i").as("j"), col("m")).as("p"),
            col("e.word") === col("p.word") && col("e.j") === col("p.j"))
          .groupBy(col("e.word").as("word"))
          .agg(min(col("p.m") + col("e.cost") * 17 + 1).as("m"))
          .withColumn("i", lit(i))
        dp = dp.unionByName(nxt.select(col("word"), col("i"), col("m")))
          .localCheckpoint()
      }
      dp.join(words, Seq("word"))
        .filter(col("i") === length(col("word")))
        .select(col("word"), col("wfreq"),
          expr("m div 17").as("min_cost"),
          expr("CAST(m % 17 AS BIGINT)").as("n_pieces"))
    }, Some {
      // MATERIALIZED is load-bearing: each dp level is referenced by the
      // next four, and inlined CTEs would expand 4^12-fold
      def dpCte(i: Int): String = {
        val js = (math.max(0, i - 4) until i)
          .map(j => s"SELECT word, $j AS j, m FROM dp$j")
          .mkString("\n    UNION ALL ")
        s"""dp$i AS MATERIALIZED (
           |  SELECT e.word, min(p.m + e.cost * 17 + 1) AS m
           |  FROM edges e JOIN (
           |    $js) p
           |    ON p.word = e.word AND e.j = p.j
           |  WHERE e.i = $i GROUP BY 1)""".stripMargin
      }
      val res = (2 to 12)
        .map(l => s"SELECT w.word, w.wfreq, d.m FROM words w JOIN dp$l d ON d.word = w.word AND length(w.word) = $l")
        .mkString("\n  UNION ALL ")
      s"""WITH words AS MATERIALIZED (
         |  SELECT word, count(*)::BIGINT AS wfreq FROM (
         |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
         |  WHERE length(word) BETWEEN 2 AND 12 GROUP BY 1),
         |pieces AS (
         |  SELECT piece, count(*)::BIGINT AS pfreq FROM (
         |    SELECT unnest(flatten(list_transform(
         |      list_filter(range(1, 5), L -> L <= length(word)),
         |      L -> list_transform(range(1, length(word) - L + 2),
         |        p -> substring(word, CAST(p AS INT), CAST(L AS INT)))))) AS piece
         |    FROM words) t GROUP BY 1),
         |vocab AS (
         |  SELECT piece, 1000000 // pfreq AS cost FROM pieces
         |  WHERE pfreq >= 3 OR length(piece) = 1),
         |edges AS MATERIALIZED (
         |  SELECT t.word, t.e.j AS j, t.e.i AS i, v.cost FROM (
         |    SELECT word, unnest(flatten(list_transform(range(0, length(word)), j ->
         |      list_transform(range(j + 1, least(j + 4, length(word)) + 1), i ->
         |        struct_pack(j := j, i := i,
         |          piece := substring(word, CAST(j + 1 AS INT), CAST(i - j AS INT))))))) AS e
         |    FROM words) t JOIN vocab v ON v.piece = t.e.piece),
         |dp0 AS MATERIALIZED (SELECT word, 0::BIGINT AS m FROM words),
         |${(1 to 12).map(dpCte).mkString(",\n")},
         |res AS (
         |  $res)
         |SELECT word, wfreq, m // 17 AS min_cost, CAST(m % 17 AS BIGINT) AS n_pieces
         |FROM res""".stripMargin
    }),

    // ---- unigram-LM EM trainer (the SentencePiece learn side) -------------
    // txt_unigram_viterbi_tokenize consumes a frequency-derived vocabulary;
    // this entry LEARNS one — hard-EM (Viterbi-EM), the integer-exact
    // variant of the SentencePiece trainer: E-step = Viterbi-segment every
    // word under current piece costs and count wfreq-weighted piece USAGE
    // along the chosen path; M-step = re-cost kept pieces at
    // 1e6 div (usage + 1) and PRUNE the bottom 20% of multi-char pieces by
    // (usage desc, piece) rank (single chars always survive — feasibility).
    // Two EM rounds, then tokenize with the LEARNED table. Every step is
    // integer arithmetic with deterministic tie-breaks, so the oracle
    // replays the ENTIRE EM algebra and the final segmentation hash-gates
    // every intermediate (a drifted usage count or pruning rank changes
    // costs, hence segmentations). Backtracking without per-row state: the
    // chosen edge into position i is the min-j edge satisfying the Viterbi
    // optimality equation dp[j] + w = dp[i] (both engines see identical
    // integers, so identical paths), and the backward walk is a fixed
    // 8-step unroll, like the forward DP. Word domain 2..8 chars keeps the
    // unroll at 8; pieces ≤ 4 chars as in the apply entry. 100 TB:
    // everything after the first distinct-word aggregate is
    // vocabulary-sized; EM rounds are a CONSTANT number of bounded joins —
    // corpus size only enters through wfreq weights.
    CatalogQuery("txt_unigram_em_learn", (s, d) => {
      val words = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")).between(2, 8))
        .groupBy(col("word")).agg(count(lit(1)).as("wfreq"))
        .localCheckpoint()
      val vocab0 = words.select(col("word"))
        .select(explode(expr(
          """flatten(transform(filter(sequence(1, 4), L -> L <= length(word)),
            |  L -> transform(sequence(1, length(word) - L + 1),
            |    p -> substring(word, p, L))))""".stripMargin)).as("piece"))
        .groupBy(col("piece")).agg(count(lit(1)).as("pfreq"))
        .filter(col("pfreq") >= 3 || length(col("piece")) === 1)
        .select(col("piece"), expr("1000000 div pfreq").as("cost"))
        .localCheckpoint()
      val allEdges = words.select(col("word"))
        .select(col("word"), explode(expr(
          """flatten(transform(sequence(0, length(word) - 1), j ->
            |  transform(sequence(j + 1, least(j + 4, length(word))), i ->
            |    named_struct('j', j, 'i', i,
            |      'piece', substring(word, j + 1, i - j)))))""".stripMargin)).as("e"))
        .select(col("word"), col("e.j").as("j"), col("e.i").as("i"),
          col("e.piece").as("piece"))
        .localCheckpoint()
      def viterbi(edges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        var dp = words.select(col("word"))
          .withColumn("i", lit(0)).withColumn("m", lit(0L)).localCheckpoint()
        (1 to 8).foreach { i =>
          val nxt = edges.filter(col("i") === i).as("e")
            .join(dp.select(col("word"), col("i").as("j"), col("m")).as("p"),
              col("e.word") === col("p.word") && col("e.j") === col("p.j"))
            .groupBy(col("e.word").as("word"))
            .agg(min(col("p.m") + col("e.cost") * 17 + 1).as("m"))
            .withColumn("i", lit(i))
          dp = dp.unionByName(nxt.select(col("word"), col("i"), col("m")))
            .localCheckpoint()
        }
        dp
      }
      // wfreq-weighted usage along each word's chosen (min-j) optimal path
      def usageOf(edges: org.apache.spark.sql.DataFrame,
          dp: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val chosen = edges.as("e")
          .join(dp.select(col("word"), col("i").as("j"), col("m").as("mj")).as("pj"),
            col("e.word") === col("pj.word") && col("e.j") === col("pj.j"))
          .join(dp.select(col("word"), col("i"), col("m").as("mi")).as("pi"),
            col("e.word") === col("pi.word") && col("e.i") === col("pi.i"))
          .filter(col("mj") + col("e.cost") * 17 + 1 === col("mi"))
          .groupBy(col("e.word").as("word"), col("e.i").as("i"))
          .agg(min(col("e.j")).as("j"))
          .join(edges, Seq("word", "j", "i"))
          .select(col("word"), col("j"), col("i"), col("piece"))
          .localCheckpoint()
        var sel = words.select(col("word"), lit("").as("piece")).limit(0)
          .localCheckpoint()
        var onpath = words
          .select(col("word"), length(col("word")).cast("int").as("i"))
          .localCheckpoint()
        (1 to 8).reverse.foreach { i =>
          val hit = onpath.filter(col("i") === i)
            .join(chosen.filter(col("i") === i), Seq("word", "i"))
          sel = sel.unionByName(hit.select(col("word"), col("piece"))).localCheckpoint()
          onpath = onpath.unionByName(
            hit.filter(col("j") > 0).select(col("word"), col("j").cast("int").as("i")))
            .localCheckpoint()
        }
        sel.join(words, Seq("word"))
          .groupBy(col("piece")).agg(sum(col("wfreq")).as("usage"))
      }
      // re-cost + prune: single chars always kept; multi-char pieces keep
      // the top floor(0.8 n) by (usage desc, piece) — 5*rnk <= 4*tot is
      // the integer form, identical in both engines
      def mstep(vocab: org.apache.spark.sql.DataFrame,
          usage: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val wEm = Window.partitionBy(expr("length(piece) = 1"))
        vocab.select(col("piece")).join(usage, Seq("piece"), "left")
          .select(col("piece"), coalesce(col("usage"), lit(0L)).as("usage"))
          .withColumn("rnk",
            row_number().over(wEm.orderBy(col("usage").desc, col("piece"))).cast("long"))
          .withColumn("tot", count(lit(1)).over(wEm).cast("long"))
          .filter(length(col("piece")) === 1 || col("rnk") * 5 <= col("tot") * 4)
          .select(col("piece"), expr("1000000 div (usage + 1)").as("cost"))
          .localCheckpoint()
      }
      def withCosts(vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        allEdges.join(vocab, Seq("piece"))
          .select(col("word"), col("j"), col("i"), col("piece"), col("cost"))
          .localCheckpoint()
      val e0 = withCosts(vocab0)
      val vocab1 = mstep(vocab0, usageOf(e0, viterbi(e0)))
      val e1 = withCosts(vocab1)
      val vocab2 = mstep(vocab1, usageOf(e1, viterbi(e1)))
      val dpF = viterbi(withCosts(vocab2))
      dpF.join(words, Seq("word"))
        .filter(col("i") === length(col("word")))
        .select(col("word"), col("wfreq"),
          expr("m div 17").as("min_cost"),
          expr("CAST(m % 17 AS BIGINT)").as("n_pieces"))
    }, Some {
      // the full EM algebra replayed: three Viterbi chains (8 materialized
      // levels each — inlining would expand 4^8-fold per chain), two
      // backward walks, two M-steps. Every tie-break is the entry's.
      def dpChain(tag: String, et: String): String = {
        def lvl(i: Int): String = {
          val js = (math.max(0, i - 4) until i)
            .map(j => s"SELECT word, $j AS j, m FROM d${tag}_$j")
            .mkString("\n    UNION ALL ")
          s"""d${tag}_$i AS MATERIALIZED (
             |  SELECT e.word, min(p.m + e.cost * 17 + 1) AS m
             |  FROM $et e JOIN (
             |    $js) p
             |    ON p.word = e.word AND e.j = p.j
             |  WHERE e.i = $i GROUP BY 1)""".stripMargin
        }
        s"""d${tag}_0 AS MATERIALIZED (SELECT word, 0::BIGINT AS m FROM words),
           |${(1 to 8).map(lvl).mkString(",\n")},
           |dp$tag AS MATERIALIZED (
           |  ${(0 to 8).map(i => s"SELECT word, $i AS i, m FROM d${tag}_$i")
                .mkString("\n  UNION ALL ")})""".stripMargin
      }
      def walk(tag: String, et: String): String = {
        val sels = (1 to 8).reverse.map { i =>
          val src =
            if (i == 8) s"SELECT word, 8 AS i FROM words WHERE length(word) = 8"
            else
              s"""SELECT word, $i AS i FROM words WHERE length(word) = $i
                 |    UNION ALL ${((i + 1) to 8).map(k =>
                      s"SELECT word, $i FROM sel${tag}_$k WHERE j = $i")
                      .mkString("\n    UNION ALL ")}""".stripMargin
          s"""sel${tag}_$i AS MATERIALIZED (
             |  SELECT o.word, c.j, c.piece FROM (
             |    $src) o JOIN chp$tag c ON c.word = o.word AND c.i = $i)""".stripMargin
        }
        s"""ch$tag AS MATERIALIZED (
           |  SELECT e.word, e.i, min(e.j) AS j
           |  FROM $et e
           |  JOIN dp$tag pj ON pj.word = e.word AND pj.i = e.j
           |  JOIN dp$tag pi ON pi.word = e.word AND pi.i = e.i
           |  WHERE pj.m + e.cost * 17 + 1 = pi.m
           |  GROUP BY 1, 2),
           |chp$tag AS MATERIALIZED (
           |  SELECT c.word, c.j, c.i, e.piece
           |  FROM ch$tag c JOIN $et e
           |    ON e.word = c.word AND e.j = c.j AND e.i = c.i),
           |${sels.mkString(",\n")},
           |usage$tag AS MATERIALIZED (
           |  SELECT piece, CAST(sum(wfreq) AS BIGINT) AS usage FROM (
           |    ${(1 to 8).map(i => s"SELECT word, piece FROM sel${tag}_$i")
                  .mkString("\n    UNION ALL ")}) s
           |  JOIN words USING (word) GROUP BY 1)""".stripMargin
      }
      def mstepSql(out: String, vin: String, utag: String): String =
        s"""$out AS MATERIALIZED (
           |  SELECT piece, 1000000 // (usage + 1) AS cost FROM (
           |    SELECT v.piece, coalesce(u.usage, 0) AS usage,
           |      row_number() OVER (PARTITION BY (length(v.piece) = 1)
           |        ORDER BY coalesce(u.usage, 0) DESC, v.piece) AS rnk,
           |      count(*) OVER (PARTITION BY (length(v.piece) = 1)) AS tot
           |    FROM $vin v LEFT JOIN usage$utag u ON u.piece = v.piece) t
           |  WHERE length(piece) = 1 OR rnk * 5 <= tot * 4)""".stripMargin
      def edgesSql(out: String, vin: String): String =
        s"""$out AS MATERIALIZED (
           |  SELECT a.word, a.j, a.i, a.piece, v.cost
           |  FROM alledges a JOIN $vin v USING (piece))""".stripMargin
      val res = (2 to 8)
        .map(l => s"SELECT w.word, w.wfreq, d.m FROM words w JOIN dF_$l d ON d.word = w.word AND length(w.word) = $l")
        .mkString("\n  UNION ALL ")
      s"""WITH words AS MATERIALIZED (
         |  SELECT word, count(*)::BIGINT AS wfreq FROM (
         |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
         |  WHERE length(word) BETWEEN 2 AND 8 GROUP BY 1),
         |pieces AS (
         |  SELECT piece, count(*)::BIGINT AS pfreq FROM (
         |    SELECT unnest(flatten(list_transform(
         |      list_filter(range(1, 5), L -> L <= length(word)),
         |      L -> list_transform(range(1, length(word) - L + 2),
         |        p -> substring(word, CAST(p AS INT), CAST(L AS INT)))))) AS piece
         |    FROM words) t GROUP BY 1),
         |vocab0 AS MATERIALIZED (
         |  SELECT piece, 1000000 // pfreq AS cost FROM pieces
         |  WHERE pfreq >= 3 OR length(piece) = 1),
         |alledges AS MATERIALIZED (
         |  SELECT t.word, t.e.j AS j, t.e.i AS i, t.e.piece AS piece FROM (
         |    SELECT word, unnest(flatten(list_transform(range(0, length(word)), j ->
         |      list_transform(range(j + 1, least(j + 4, length(word)) + 1), i ->
         |        struct_pack(j := j, i := i,
         |          piece := substring(word, CAST(j + 1 AS INT), CAST(i - j AS INT))))))) AS e
         |    FROM words) t),
         |${edgesSql("e0", "vocab0")},
         |${dpChain("0", "e0")},
         |${walk("0", "e0")},
         |${mstepSql("vocab1", "vocab0", "0")},
         |${edgesSql("e1", "vocab1")},
         |${dpChain("1", "e1")},
         |${walk("1", "e1")},
         |${mstepSql("vocab2", "vocab1", "1")},
         |${edgesSql("eF", "vocab2")},
         |${dpChain("F", "eF")},
         |res AS (
         |  $res)
         |SELECT word, wfreq, m // 17 AS min_cost, CAST(m % 17 AS BIGINT) AS n_pieces
         |FROM res""".stripMargin
    }),

    CatalogQuery("txt_bpe_encode_learned", (s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("norm", expr(normExpr))
        .filter(length(col("norm")) > 0)
      val pairs = docs
        .select(explode(split(col("norm"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy(col("w")).agg(count(lit(1)).as("wc"))
        .select(col("wc"), explode(expr(
          """transform(sequence(1, length(w) - 1),
            | i -> substr(w, CAST(i AS INT), 2))""".stripMargin)).as("pair"))
        .groupBy(col("pair")).agg(sum(col("wc")).as("n"))
      val wr = Window.orderBy(col("n").desc, col("pair"))
      val learned = pairs
        .withColumn("rank", row_number().over(wr)).filter(col("rank") <= 8)
        .agg(sort_array(collect_list(struct(col("rank").as("rank"),
          col("pair").as("pair")))).as("ms")) // 1-row aggregate: provably broadcastable
        .select(lit(1).as("qkey"), expr(
          "transform(ms, m -> array(substring(m.pair, 1, 1), substring(m.pair, 2, 1)))")
          .as("merges"))
      val spaced = "rtrim(regexp_replace(replace(norm, ' ', '|'), '(.)', '$1 '))"
      docs
        .withColumn("toks", split(expr(spaced), " "))
        .withColumn("qkey", lit(1))
        .join(broadcast(learned), Seq("qkey"))
        .withColumn("enc", graft.functions.GraftFunctions.bpe_apply(
          col("toks"), col("merges")))
        .select(col("doc_id"),
          expr("CAST(size(filter(enc, x -> x != '|')) AS BIGINT)").as("n_tokens"),
          expr("array_join(filter(enc, x -> x != '|'), ' ')").as("enc_str"))
    }, Some {
      // whole-token-wrapped replay: every token carries its own flanking
      // spaces (' t ' each, so '  ' between tokens), and rank r's pattern
      // ' l  r ' can only match complete adjacent tokens — the same
      // greedy left-to-right pass the token-array expression runs
      val applyChain = bpeApplyChainSql(8)
      s"""WITH n AS (
         |  SELECT doc_id, $oracleNorm AS norm FROM documents),
         |nn AS (SELECT doc_id, norm FROM n WHERE len(norm) > 0),
         |words AS (
         |  SELECT w, count(*)::BIGINT AS wc FROM (
         |    SELECT unnest(string_split(norm, ' ')) AS w FROM nn) t
         |  WHERE len(w) >= 2 GROUP BY 1),
         |pairs AS (
         |  SELECT substring(w, i, 2) AS pair, sum(wc)::BIGINT AS n
         |  FROM words CROSS JOIN LATERAL (
         |    SELECT unnest(range(1, len(w))) AS i) u
         |  GROUP BY 1),
         |ranked AS (
         |  SELECT pair, row_number() OVER (ORDER BY n DESC, pair) AS rank
         |  FROM pairs QUALIFY rank <= 8),
         |wrapped AS (
         |  SELECT doc_id,
         |    ' ' || replace(rtrim(regexp_replace(replace(norm, ' ', '|'), '(.)', '\\1 ', 'g')), ' ', '  ') || ' ' AS s0
         |  FROM nn),
         |enc AS (SELECT doc_id, $applyChain AS s FROM wrapped)
         |SELECT doc_id,
         |  CAST(len(list_filter(string_split(trim(replace(s, '  ', ' ')), ' '),
         |    x -> x != '|')) AS BIGINT) AS n_tokens,
         |  array_to_string(list_filter(string_split(trim(replace(s, '  ', ' ')), ' '),
         |    x -> x != '|'), ' ') AS enc_str
         |FROM enc""".stripMargin
    }),

    // ---- BPE round trip: decode(encode(text)) = text --------------------
    // The inverse gate a tokenizer pipeline ships with: encode through
    // the runtime-LEARNED table (same learn CTE as txt_bpe_encode_learned),
    // then detokenize through the validating `bpe_decode` expression —
    // which first derives the legal-token closure from the table and
    // fails loudly on any token outside it, so a corrupt stream can
    // never silently "decode" — and gate the decoded string against the
    // original normal form. `roundtrip_ok` is re-derived INDEPENDENTLY by
    // the oracle (its own replace-chain encode + strip), so a one-sided
    // encoder bug shows as a hash mismatch, not a matched `false`.
    // n_merged > 0 rows prove merges actually fired (no 0-signal gate).
    // 100 TB: learn is one vocabulary-bounded aggregate; encode+decode
    // are a single map stage over a broadcast 1-row merge table.
    CatalogQuery("txt_bpe_roundtrip", (s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("norm", expr(normExpr))
        .filter(length(col("norm")) > 0)
      val pairs = docs
        .select(explode(split(col("norm"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy(col("w")).agg(count(lit(1)).as("wc"))
        .select(col("wc"), explode(expr(
          """transform(sequence(1, length(w) - 1),
            | i -> substr(w, CAST(i AS INT), 2))""".stripMargin)).as("pair"))
        .groupBy(col("pair")).agg(sum(col("wc")).as("n"))
      val wr = Window.orderBy(col("n").desc, col("pair"))
      val learned = pairs
        .withColumn("rank", row_number().over(wr)).filter(col("rank") <= 8)
        .agg(sort_array(collect_list(struct(col("rank").as("rank"),
          col("pair").as("pair")))).as("ms"))
        .select(lit(1).as("qkey"), expr(
          "transform(ms, m -> array(substring(m.pair, 1, 1), substring(m.pair, 2, 1)))")
          .as("merges"))
      val spaced = "rtrim(regexp_replace(replace(norm, ' ', '|'), '(.)', '$1 '))"
      docs
        .withColumn("toks", split(expr(spaced), " "))
        .withColumn("qkey", lit(1))
        .join(broadcast(learned), Seq("qkey"))
        .withColumn("enc", graft.functions.GraftFunctions.bpe_apply(
          col("toks"), col("merges")))
        .withColumn("dec", graft.functions.GraftFunctions.bpe_decode(
          col("enc"), col("merges")))
        .select(col("doc_id"),
          expr("CAST(size(filter(enc, x -> x != '|')) AS BIGINT)").as("n_tokens"),
          expr("CAST(size(filter(enc, x -> length(x) >= 2)) AS BIGINT)").as("n_merged"),
          (replace(col("dec"), lit("|"), lit(" ")) === col("norm")).as("roundtrip_ok"))
    }, Some {
      val applyChain = bpeApplyChainSql(8)
      s"""WITH n AS (
         |  SELECT doc_id, $oracleNorm AS norm FROM documents),
         |nn AS (SELECT doc_id, norm FROM n WHERE len(norm) > 0),
         |words AS (
         |  SELECT w, count(*)::BIGINT AS wc FROM (
         |    SELECT unnest(string_split(norm, ' ')) AS w FROM nn) t
         |  WHERE len(w) >= 2 GROUP BY 1),
         |pairs AS (
         |  SELECT substring(w, i, 2) AS pair, sum(wc)::BIGINT AS n
         |  FROM words CROSS JOIN LATERAL (
         |    SELECT unnest(range(1, len(w))) AS i) u
         |  GROUP BY 1),
         |ranked AS (
         |  SELECT pair, row_number() OVER (ORDER BY n DESC, pair) AS rank
         |  FROM pairs QUALIFY rank <= 8),
         |wrapped AS (
         |  SELECT doc_id, norm,
         |    ' ' || replace(rtrim(regexp_replace(replace(norm, ' ', '|'), '(.)', '\\1 ', 'g')), ' ', '  ') || ' ' AS s0
         |  FROM nn),
         |enc AS (SELECT doc_id, norm, $applyChain AS s FROM wrapped)
         |SELECT doc_id,
         |  CAST(len(list_filter(string_split(trim(replace(s, '  ', ' ')), ' '),
         |    x -> x != '|')) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(string_split(trim(replace(s, '  ', ' ')), ' '),
         |    x -> len(x) >= 2)) AS BIGINT) AS n_merged,
         |  replace(replace(s, ' ', ''), '|', ' ') = norm AS roundtrip_ok
         |FROM enc""".stripMargin
    }),

    // ---- CCNet-style perplexity buckets ---------------------------------
    // Per-doc bigram-LM predictability (integer-scaled probabilities, the
    // txt_bigram_predictability arithmetic) bucketed head/middle/tail by
    // exact terciles. The terciles come from Q.exactNtile (range-
    // -repartition + partition-offset ranks) — never a single-partition
    // global sort of the doc-level table.
    CatalogQuery("txt_perplexity_buckets", (s, d) => {
      val bg = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(toks) - 1),
            | i -> struct(element_at(toks, CAST(i AS INT)) AS a,
            |             element_at(toks, CAST(i + 1 AS INT)) AS b))""".stripMargin))
          .as("bg"))
        .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
      val cntAb = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cnt_ab"))
      val cntA = bg.groupBy(col("a")).agg(count(lit(1)).as("cnt_a"))
      val perDoc = bg.join(cntAb, Seq("a", "b")).join(cntA, Seq("a"))
        // overflow tripwire: cnt_ab·1e9 wraps BIGINT past cnt_ab ≈ 9.2e9
        // (corpus-scale bigram counts) — fail loudly where DuckDB would
        .withColumn("p_e9", expr("cnt_ab * 1000000000L div cnt_a")
          + Q.overflowGuard(col("cnt_ab"), 9000000000L, "txt_perplexity_buckets cnt_ab"))
        .groupBy(col("doc_id"))
        .agg(expr("sum(p_e9) div count(1)").as("avg_p_e9"))
      Q.exactNtile(perDoc,
          Seq(col("avg_p_e9").desc, col("doc_id")), 3, "bucket")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("avg_p_e9")).as("min_p_e9"),
          max(col("avg_p_e9")).as("max_p_e9"))
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT doc_id, t[i] AS a, t[i + 1] AS b
        |  FROM toks CROSS JOIN LATERAL (
        |    SELECT unnest(range(1, len(t))) AS i) u),
        |cnt_ab AS (SELECT a, b, count(*)::BIGINT AS cnt_ab FROM bg GROUP BY 1, 2),
        |cnt_a AS (SELECT a, count(*)::BIGINT AS cnt_a FROM bg GROUP BY 1),
        |per_doc AS (
        |  SELECT doc_id,
        |    (sum((cnt_ab * 1000000000) // cnt_a) // count(*))::BIGINT AS avg_p_e9
        |  FROM bg JOIN cnt_ab USING (a, b) JOIN cnt_a USING (a)
        |  GROUP BY 1),
        |bucketed AS (
        |  SELECT CAST(ntile(3) OVER (ORDER BY avg_p_e9 DESC, doc_id) AS BIGINT)
        |    AS bucket, avg_p_e9
        |  FROM per_doc)
        |SELECT bucket, count(*)::BIGINT AS n_docs,
        |  min(avg_p_e9) AS min_p_e9, max(avg_p_e9) AS max_p_e9
        |FROM bucketed GROUP BY 1""".stripMargin)),

    // ---- HTML boilerplate strip -----------------------------------------
    // Web-crawl cleaning: drop script/style blocks wholesale, then tags,
    // then collapse whitespace — codegen'd regex chain, no UDF, a pure
    // map stage at any scale. The harness wraps the synthetic docs in a
    // deterministic page skeleton so the round-trip (strip(wrap(text)) ==
    // text) is itself the checked output.
    CatalogQuery("txt_html_strip", (s, d) => {
      Tables.documents(s, d)
        .withColumn("html", concat(
          lit("<html><head><style>p{color:red}</style></head><body><h1>"),
          col("source"), lit("</h1><div class=\"doc\"><p>"), col("text"),
          lit("</p></div><script>var t=1;</script></body></html>")))
        .withColumn("stripped", expr(
          """trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
            |  '<script>.*?</script>', ''),
            |  '<style>.*?</style>', ''),
            |  '<[^>]*>', ' '),
            |  ' +', ' '))""".stripMargin))
        .select(col("doc_id"),
          expr("CAST(length(html) AS BIGINT)").as("n_chars_html"),
          expr("CAST(length(stripped) AS BIGINT)").as("n_chars_clean"),
          expr("CAST(stripped = concat(source, ' ', trim(regexp_replace(text, ' +', ' '))) AS BOOLEAN)")
            .as("round_trip_ok"))
    }, Some(
      """WITH h AS (
        |  SELECT doc_id, source, text,
        |    '<html><head><style>p{color:red}</style></head><body><h1>' || source ||
        |    '</h1><div class="doc"><p>' || text ||
        |    '</p></div><script>var t=1;</script></body></html>' AS html
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, source, text, html,
        |    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |      '<script>.*?</script>', '', 'g'),
        |      '<style>.*?</style>', '', 'g'),
        |      '<[^>]*>', ' ', 'g'),
        |      ' +', ' ', 'g')) AS stripped
        |  FROM h)
        |SELECT doc_id, CAST(len(html) AS BIGINT) AS n_chars_html,
        |  CAST(len(stripped) AS BIGINT) AS n_chars_clean,
        |  stripped = (source || ' ' || trim(regexp_replace(text, ' +', ' ', 'g')))
        |    AS round_trip_ok
        |FROM st""".stripMargin)),

    // ---- entity resolution: blocked record linkage ----------------------
    // The master-vs-dirty incremental linkage shape: a variant feed
    // (deterministic single-edit corruptions of customer names) is
    // linked back to the master by (a) BLOCKING on a stable key — the
    // first 7 digits of the name's numeric part, which every edit
    // preserves — so candidate pairs are per-block, never corpus²;
    // (b) edit-distance scoring inside the block; (c) best-match
    // resolution (min distance, then min master id). 100 TB: the block
    // join shuffles on the key, block sizes bound the quadratic term —
    // the same discipline as the LSH band joins.
    CatalogQuery("er_record_linkage", (s, d) => {
      val master = Tables.customer(s, d)
        .select(col("c_custkey").cast("long").as("id"), col("c_name").as("name"))
      val variants = master
        .withColumn("vname", expr(
          """CASE WHEN id % 3 = 0 THEN replace(name, '#', '')
            |     WHEN id % 3 = 1 THEN concat(name, 'x')
            |     ELSE replace(name, 'Customer', 'Custmer') END""".stripMargin))
        .select((col("id") + 1000000L).as("id"), col("vname").as("name"))
      def blk(c: Column): Column =
        substring(regexp_replace(c, "[^0-9]", ""), 1, 7)
      val cand = master.withColumn("blk", blk(col("name")))
        .withColumnRenamed("id", "mid").withColumnRenamed("name", "mname")
        .join(variants.withColumn("blk", blk(col("name"))), Seq("blk"))
        .withColumn("dist", levenshtein(col("mname"), col("name")))
        .filter(col("dist") <= 2)
      val w = Window.partitionBy(col("id")).orderBy(col("dist"), col("mid"))
      val linked = cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id").as("record_id"), col("mid").as("canonical_id"),
          col("dist").cast("long").as("match_dist"))
      master.select(col("id").as("record_id"), col("id").as("canonical_id"),
        lit(0L).as("match_dist"))
        .unionByName(linked)
    }, Some(
      """WITH master AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name FROM customer),
        |variants AS (
        |  SELECT id + 1000000 AS id,
        |    CASE WHEN id % 3 = 0 THEN replace(name, '#', '')
        |         WHEN id % 3 = 1 THEN name || 'x'
        |         ELSE replace(name, 'Customer', 'Custmer') END AS name
        |  FROM master),
        |cand AS (
        |  SELECT v.id, m.id AS mid,
        |    levenshtein(m.name, v.name) AS dist
        |  FROM master m JOIN variants v
        |    ON substr(regexp_replace(m.name, '[^0-9]', '', 'g'), 1, 7)
        |     = substr(regexp_replace(v.name, '[^0-9]', '', 'g'), 1, 7)
        |  WHERE levenshtein(m.name, v.name) <= 2),
        |linked AS (
        |  SELECT id AS record_id, mid AS canonical_id,
        |    CAST(dist AS BIGINT) AS match_dist
        |  FROM (SELECT *, row_number() OVER (
        |          PARTITION BY id ORDER BY dist, mid) AS rn FROM cand) t
        |  WHERE rn = 1)
        |SELECT id AS record_id, id AS canonical_id, CAST(0 AS BIGINT) AS match_dist
        |FROM master
        |UNION ALL SELECT * FROM linked""".stripMargin)),

    // ---- PQ codebook training: per-subspace k-means ---------------------
    // The TRAINING half of product quantization (sim_pq_adc_topk /
    // sim_ivfpq_adc_topk consume codebooks; this produces them): the
    // 64-dim space splits into 8 subspaces of 8 dims, each trained by
    // one Lloyd round over the integer lattice (seed codes from the
    // first 16 vectors, exact integer distances, refined centroids on
    // the 1/256 lattice — the sim_ivf_kmeans_refined arithmetic, applied
    // per subspace). Scale: assignment is a linear scan against a
    // broadcast 8×16 codebook; the refine is one groupBy (subspace,
    // code, dim) — M independent small k-means, never a pairwise join.
    CatalogQuery("sim_pq_train_codebooks", (s, d) => {
      val quant = Tables.embeddings(s, d).select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5) AS BIGINT))")
          .as("q"))
      val sub = quant.select(col("vec_id"), explode(expr(
        "transform(sequence(0, 7), m -> struct(m AS m, slice(q, m * 8 + 1, 8) AS qs))"))
        .as("s"))
        .select(col("vec_id"), col("s.m").as("m"), col("s.qs").as("qs"))
      val seeds = sub.filter(col("vec_id") < 16)
        .select(col("m"), col("vec_id").as("code"), col("qs").as("cv"))
      // collapsed to ONE row pre-broadcast (the sim_ivf_kmeans_refined
      // shape): the cross is against a provable maxRows = 1 side, so the
      // plan auditor's structural bound covers it — a broadcast of the
      // grouped form would be a fact-derived broadcast it cannot bound
      val seedsOne = seeds
        .agg(collect_list(struct(col("m").as("sm"), col("code"), col("cv"))).as("cs"))
      val w = Window.partitionBy(col("vec_id"), col("m"))
        .orderBy(col("dist"), col("code"))
      val a1 = sub.crossJoin(broadcast(seedsOne))
        .select(col("vec_id"), col("m"), col("qs"), explode(col("cs")).as("c"))
        .filter(col("c.sm") === col("m"))
        .select(col("vec_id"), col("m"), col("qs"),
          col("c.code").as("code"), col("c.cv").as("cv"))
        .withColumn("dist", expr(
          """aggregate(zip_with(qs, cv, (a, b) -> (a - b) * (a - b)),
            | CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("m"), col("qs"), col("code"))
      a1.select(col("m"), col("code"), posexplode(col("qs")).as(Seq("dim", "v")))
        .groupBy(col("m"), col("code"), col("dim"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n_members"))
        .select(col("m").cast("long").as("subspace"), col("code"),
          col("dim").cast("long").as("dim"),
          expr("(256 * sv - pmod(256 * sv, n_members)) div n_members")
            .as("centroid_q"),
          col("n_members"))
    }, Some(
      """WITH quant AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5) AS BIGINT)) AS q
        |  FROM embeddings),
        |sub AS (
        |  SELECT vec_id, m, q[m * 8 + 1 : m * 8 + 8] AS qs
        |  FROM quant CROSS JOIN range(0, 8) r(m)),
        |seeds AS (SELECT m, vec_id AS code, qs AS cv FROM sub WHERE vec_id < 16),
        |d1 AS (
        |  SELECT v.vec_id, v.m, v.qs, s.code,
        |    CAST(list_sum(list_transform(range(1, 9),
        |      k -> (v.qs[k] - s.cv[k]) * (v.qs[k] - s.cv[k]))) AS BIGINT) AS dist
        |  FROM sub v JOIN seeds s ON v.m = s.m),
        |a1 AS (
        |  SELECT vec_id, m, qs, code FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY vec_id, m ORDER BY dist, code) AS rn
        |    FROM d1) t WHERE rn = 1)
        |SELECT CAST(m AS BIGINT) AS subspace, code, CAST(i AS BIGINT) AS dim,
        |  CAST((256 * sum(qs[i + 1]) - ((256 * sum(qs[i + 1]) % count(*)) + count(*)) % count(*))
        |    // count(*) AS BIGINT) AS centroid_q,
        |  count(*) AS n_members
        |FROM a1 CROSS JOIN range(0, 8) r(i)
        |GROUP BY 1, 2, 3""".stripMargin)),

    // ---- trained-codebook ADC retrieval ---------------------------------
    // Completes the PQ pipeline: TRAIN (sim_pq_train_codebooks) → ENCODE
    // (assign every vector's subvectors to the trained centroids) → ADC
    // top-k (query's exact subvector vs each vector's centroid, summed
    // over subspaces). All arithmetic on the integer lattice so the
    // whole train→encode→score chain crosses engines exactly. Scale:
    // encode is a linear scan against a broadcast 8×16 codebook; the
    // scoring join is (vec, subspace) × codebook equi-join — the memory
    // win of PQ (8 bytes/vector) with no pairwise stage anywhere.
    CatalogQuery("sim_trained_adc_topk", (s, d) => {
      val quant = Tables.embeddings(s, d).select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5) AS BIGINT))")
          .as("q"))
      val sub = quant.select(col("vec_id"), explode(expr(
        "transform(sequence(0, 7), m -> struct(m AS m, slice(q, m * 8 + 1, 8) AS qs))"))
        .as("s"))
        .select(col("vec_id"), col("s.m").as("m"), col("s.qs").as("qs"))
      val seeds = sub.filter(col("vec_id") < 16)
        .select(col("m"), col("vec_id").as("code"), col("qs").as("cv"))
      // every broadcast side in this query collapses to a 1-row
      // aggregate first (the sim_ivf_kmeans_refined shape) so the plan
      // auditor's structural bound covers the crosses
      val seedsOne = seeds
        .agg(collect_list(struct(col("m").as("sm"), col("code"), col("cv"))).as("cs"))
      val w1 = Window.partitionBy(col("vec_id"), col("m"))
        .orderBy(col("dist"), col("code"))
      val a1 = sub.crossJoin(broadcast(seedsOne))
        .select(col("vec_id"), col("m"), col("qs"), explode(col("cs")).as("c"))
        .filter(col("c.sm") === col("m"))
        .select(col("vec_id"), col("m"), col("qs"),
          col("c.code").as("code"), col("c.cv").as("cv"))
        .withColumn("dist", expr(
          """aggregate(zip_with(qs, cv, (a, b) -> (a - b) * (a - b)),
            | CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin))
        .withColumn("rn", row_number().over(w1)).filter(col("rn") === 1)
        .select(col("vec_id"), col("m"), col("qs"), col("code"))
      // trained codebook on the 1/256 lattice, as ordered arrays
      val cb = a1.select(col("m"), col("code"), posexplode(col("qs")).as(Seq("dim", "v")))
        .groupBy(col("m"), col("code"), col("dim"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("nm"))
        .select(col("m"), col("code"), col("dim"),
          expr("(256 * sv - pmod(256 * sv, nm)) div nm").as("cq"))
        .groupBy(col("m"), col("code"))
        .agg(expr("transform(array_sort(collect_list(struct(dim, cq))), p -> p.cq)").as("cv"))
      // ENCODE against the trained centroids (×256 to the refined lattice)
      val w2 = Window.partitionBy(col("vec_id"), col("m"))
        .orderBy(col("dist"), col("code"))
      val cbOne = cb
        .agg(collect_list(struct(col("m").as("cm"), col("code"), col("cv"))).as("cs"))
      val enc = sub.crossJoin(broadcast(cbOne))
        .select(col("vec_id"), col("m"), col("qs"), explode(col("cs")).as("c"))
        .filter(col("c.cm") === col("m"))
        .select(col("vec_id"), col("m"), col("qs"),
          col("c.code").as("code"), col("c.cv").as("cv"))
        .withColumn("dist", expr(
          """aggregate(zip_with(qs, cv, (a, b) -> (256 * a - b) * (256 * a - b)),
            | CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin))
        .withColumn("rn", row_number().over(w2)).filter(col("rn") === 1)
        .select(col("vec_id"), col("m"), col("code"))
      // ADC: query vec 0's exact subvectors vs each vector's centroid
      val qOne = sub.filter(col("vec_id") === 0)
        .agg(collect_list(struct(col("m").as("qm"), col("qs").as("qq"))).as("qsl"))
      val scored = enc.join(cb, Seq("m", "code"))
        .crossJoin(broadcast(qOne))
        .select(col("vec_id"), col("m"), col("cv"), explode(col("qsl")).as("qrow"))
        .filter(col("qrow.qm") === col("m"))
        .select(col("vec_id"), col("cv"), col("qrow.qq").as("qq"))
        .withColumn("dm", expr(
          """aggregate(zip_with(qq, cv, (a, b) -> (256 * a - b) * (256 * a - b)),
            | CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin))
        .groupBy(col("vec_id"))
        .agg(sum(col("dm")).as("adc_dist"))
      val wr = Window.orderBy(col("adc_dist"), col("vec_id"))
      scored.orderBy(col("adc_dist"), col("vec_id")).limit(10)
        .withColumn("rank", row_number().over(wr).cast("long"))
    }, Some(
      """WITH quant AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5) AS BIGINT)) AS q
        |  FROM embeddings),
        |sub AS (
        |  SELECT vec_id, m, q[m * 8 + 1 : m * 8 + 8] AS qs
        |  FROM quant CROSS JOIN range(0, 8) r(m)),
        |seeds AS (SELECT m, vec_id AS code, qs AS cv FROM sub WHERE vec_id < 16),
        |d1 AS (
        |  SELECT v.vec_id, v.m, v.qs, s.code,
        |    CAST(list_sum(list_transform(range(1, 9),
        |      k -> (v.qs[k] - s.cv[k]) * (v.qs[k] - s.cv[k]))) AS BIGINT) AS dist
        |  FROM sub v JOIN seeds s ON v.m = s.m),
        |a1 AS (
        |  SELECT vec_id, m, qs, code FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY vec_id, m ORDER BY dist, code) AS rn
        |    FROM d1) t WHERE rn = 1),
        |cbdims AS (
        |  SELECT m, code, i AS dim,
        |    CAST((256 * sum(qs[i + 1]) - ((256 * sum(qs[i + 1]) % count(*)) + count(*)) % count(*))
        |      // count(*) AS BIGINT) AS cq
        |  FROM a1 CROSS JOIN range(0, 8) r(i)
        |  GROUP BY 1, 2, 3),
        |cb AS (SELECT m, code, list(cq ORDER BY dim) AS cv FROM cbdims GROUP BY 1, 2),
        |d2 AS (
        |  SELECT v.vec_id, v.m, c.code,
        |    CAST(list_sum(list_transform(range(1, 9),
        |      k -> (256 * v.qs[k] - c.cv[k]) * (256 * v.qs[k] - c.cv[k]))) AS BIGINT) AS dist
        |  FROM sub v JOIN cb c ON v.m = c.m),
        |enc AS (
        |  SELECT vec_id, m, code FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY vec_id, m ORDER BY dist, code) AS rn
        |    FROM d2) t WHERE rn = 1),
        |qsub AS (SELECT m, qs AS qq FROM sub WHERE vec_id = 0),
        |scored AS (
        |  SELECT e.vec_id,
        |    CAST(sum(CAST(list_sum(list_transform(range(1, 9),
        |      k -> (256 * q.qq[k] - c.cv[k]) * (256 * q.qq[k] - c.cv[k]))) AS BIGINT)) AS BIGINT)
        |      AS adc_dist
        |  FROM enc e JOIN cb c ON e.m = c.m AND e.code = c.code
        |  JOIN qsub q ON e.m = q.m
        |  GROUP BY 1)
        |SELECT vec_id, adc_dist,
        |  CAST(row_number() OVER (ORDER BY adc_dist, vec_id) AS BIGINT) AS rank
        |FROM scored ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin)),

    // ---- bounded-round min-label components -----------------------------
    // Label propagation on the customer–supplier co-occurrence graph
    // (gph_pagerank_fixed_point's edge set): every node starts labeled
    // with its own id and takes the min of its neighborhood each round
    // — after k rounds, labels agree within radius-k; run to diameter
    // and it IS connected components. Fixed 4 rounds keep the oracle
    // exact; production iterates to fixpoint with the same per-round
    // shape (one join + one agg, lineage truncated per round — the
    // PageRank discipline; large-star/small-star is the documented
    // lever when diameters are large).
    CatalogQuery("gph_min_label_components", (s, d) => {
      val co = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = co.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(co.select(col("b").as("src"), col("a").as("dst")))
        .persist()
      var state = edges.select(col("src").as("v")).distinct()
        .withColumn("lbl", col("v"))
        .localCheckpoint()
      for (_ <- 1 to 4) {
        val nb = edges.join(state, edges("src") === state("v"))
          .groupBy(col("dst")).agg(min(col("lbl")).as("m"))
        state = state.join(nb, state("v") === nb("dst"), "left")
          .select(col("v"), least(col("lbl"), coalesce(col("m"), col("lbl"))).as("lbl"))
          .localCheckpoint()
      }
      edges.unpersist(false)
      state.select(
        when(col("v") % 2 === 0, concat(lit("c"), (col("v") / 2).cast("long").cast("string")))
          .otherwise(concat(lit("s"), ((col("v") - 1) / 2).cast("long").cast("string")))
          .as("node"),
        col("lbl").as("component"))
    }, Some(
      """WITH co AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT a AS src, b AS dst FROM co
        |          UNION ALL SELECT b AS src, a AS dst FROM co),
        |l0 AS (SELECT DISTINCT src AS v, src AS lbl FROM edges),
        |l1 AS (
        |  SELECT l.v, least(l.lbl, coalesce(nb.m, l.lbl)) AS lbl
        |  FROM l0 l LEFT JOIN (
        |    SELECT e.dst AS v, min(l.lbl) AS m
        |    FROM edges e JOIN l0 l ON e.src = l.v GROUP BY 1) nb USING (v)),
        |l2 AS (
        |  SELECT l.v, least(l.lbl, coalesce(nb.m, l.lbl)) AS lbl
        |  FROM l1 l LEFT JOIN (
        |    SELECT e.dst AS v, min(l.lbl) AS m
        |    FROM edges e JOIN l1 l ON e.src = l.v GROUP BY 1) nb USING (v)),
        |l3 AS (
        |  SELECT l.v, least(l.lbl, coalesce(nb.m, l.lbl)) AS lbl
        |  FROM l2 l LEFT JOIN (
        |    SELECT e.dst AS v, min(l.lbl) AS m
        |    FROM edges e JOIN l2 l ON e.src = l.v GROUP BY 1) nb USING (v)),
        |l4 AS (
        |  SELECT l.v, least(l.lbl, coalesce(nb.m, l.lbl)) AS lbl
        |  FROM l3 l LEFT JOIN (
        |    SELECT e.dst AS v, min(l.lbl) AS m
        |    FROM edges e JOIN l3 l ON e.src = l.v GROUP BY 1) nb USING (v))
        |SELECT CASE WHEN v % 2 = 0 THEN 'c' || CAST(v // 2 AS VARCHAR)
        |            ELSE 's' || CAST((v - 1) // 2 AS VARCHAR) END AS node,
        |  lbl AS component
        |FROM l4""".stripMargin)),

    // ---- large-star / small-star connected components ---------------------
    // The at-scale CC algorithm gph_min_label_components' scaladoc names
    // as the lever when diameters are large (Kiveris et al., "Connected
    // Components in MapReduce and Beyond"): alternate LARGE-STAR (every
    // strictly-larger neighbor of u re-links to min(Γ⁺(u))) and
    // SMALL-STAR (every ≤-neighbor re-links to the same min) until the
    // edge set reaches a fixpoint — stars with component-min roots —
    // in O(log² n) rounds regardless of diameter (min-label needs
    // diameter rounds; a 100 TB web graph has diameter in the hundreds).
    // Each round is two grouped mins + re-link joins, all key-partitioned
    // on u, lineage truncated per round; convergence is an explicit
    // edge-set-delta check (two anti-join counts), not a guessed round
    // count. Output = per-node component label (root id = component min,
    // roots label themselves). The oracle computes ground truth from
    // scratch (recursive min-label fixpoint in SQL), so the star
    // algebra's convergence to true components is hash-gated; the spec
    // additionally union-finds the graph driver-side and pins a
    // long-chain case where bounded-round min-label would still be
    // unconverged but star rounds are done.
    CatalogQuery("gph_largestar_smallstar_cc", (s, d) => {
      val co = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
        .distinct()
      // the star machinery is shared with the maintained-components
      // deletion-rebuild path — see MiningQueries.starFixpoint
      val lbl = MiningQueries.starFixpoint(co)
        .select(col("vtx"), col("lbl").as("component"))
      lbl.select(
        when(col("vtx") % 2 === 0, concat(lit("c"), (col("vtx") / 2).cast("long").cast("string")))
          .otherwise(concat(lit("s"), ((col("vtx") - 1) / 2).cast("long").cast("string")))
          .as("node"),
        col("component"))
    }, Some(
      """WITH RECURSIVE co AS (
        |  SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |ue AS (SELECT u AS src, v AS dst FROM co
        |       UNION ALL SELECT v AS src, u AS dst FROM co),
        |lp AS (
        |  SELECT src AS vtx, src AS lbl FROM ue
        |  UNION
        |  SELECT e2.dst AS vtx, l.lbl AS lbl
        |  FROM lp l JOIN ue e2 ON e2.src = l.vtx
        |  WHERE l.lbl < e2.dst)
        |SELECT CASE WHEN vtx % 2 = 0 THEN 'c' || CAST(vtx // 2 AS VARCHAR)
        |            ELSE 's' || CAST((vtx - 1) // 2 AS VARCHAR) END AS node,
        |  CAST(min(lbl) AS BIGINT) AS component
        |FROM lp GROUP BY 1""".stripMargin)),

    // ---- synchronous label-propagation communities -----------------------
    // The MAJORITY twin of gph_min_label_components on the same
    // customer–supplier co-occurrence edges: min-label converges to
    // connected COMPONENTS; taking each node's most-frequent neighbor
    // label instead (ties: count desc, then smaller label — a total
    // order, so every round is deterministic) is synchronous label
    // propagation, the classic community-detection baseline — dense
    // neighborhoods agree on a label long before the whole component
    // does. Fixed 3 rounds keep the oracle exact (production iterates
    // to label stability with the same per-round shape). Per round: one
    // equi-join + a (node, label)-grouped count + a PARTITIONED
    // row_number — no global window, lineage truncated per round via
    // localCheckpoint (the PageRank discipline).
    CatalogQuery("gph_label_propagation_communities", (s, d) => {
      val co = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = co.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(co.select(col("b").as("src"), col("a").as("dst")))
        .persist()
      var state = edges.select(col("src").as("v")).distinct()
        .withColumn("lbl", col("v"))
        .localCheckpoint()
      val w = Window.partitionBy(col("dst")).orderBy(col("c").desc, col("lbl").asc)
      for (_ <- 1 to 3) {
        val mode = edges.join(state, edges("src") === state("v"))
          .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("dst"), col("lbl").as("m"))
        state = state.join(mode, state("v") === mode("dst"), "left")
          .select(col("v"), coalesce(col("m"), col("lbl")).as("lbl"))
          .localCheckpoint()
      }
      edges.unpersist(false)
      state.select(
        when(col("v") % 2 === 0, concat(lit("c"), (col("v") / 2).cast("long").cast("string")))
          .otherwise(concat(lit("s"), ((col("v") - 1) / 2).cast("long").cast("string")))
          .as("node"),
        col("lbl").as("community"))
    }, Some(
      """WITH co AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT a AS src, b AS dst FROM co
        |          UNION ALL SELECT b AS src, a AS dst FROM co),
        |l0 AS (SELECT DISTINCT src AS v, src AS lbl FROM edges),
        |m1 AS (
        |  SELECT v, lbl FROM (
        |    SELECT e.dst AS v, l.lbl, count(*) AS c,
        |      row_number() OVER (PARTITION BY e.dst ORDER BY count(*) DESC, l.lbl) AS rn
        |    FROM edges e JOIN l0 l ON e.src = l.v GROUP BY e.dst, l.lbl) t
        |  WHERE rn = 1),
        |l1 AS (
        |  SELECT l.v, coalesce(m.lbl, l.lbl) AS lbl
        |  FROM l0 l LEFT JOIN m1 m USING (v)),
        |m2 AS (
        |  SELECT v, lbl FROM (
        |    SELECT e.dst AS v, l.lbl, count(*) AS c,
        |      row_number() OVER (PARTITION BY e.dst ORDER BY count(*) DESC, l.lbl) AS rn
        |    FROM edges e JOIN l1 l ON e.src = l.v GROUP BY e.dst, l.lbl) t
        |  WHERE rn = 1),
        |l2 AS (
        |  SELECT l.v, coalesce(m.lbl, l.lbl) AS lbl
        |  FROM l1 l LEFT JOIN m2 m USING (v)),
        |m3 AS (
        |  SELECT v, lbl FROM (
        |    SELECT e.dst AS v, l.lbl, count(*) AS c,
        |      row_number() OVER (PARTITION BY e.dst ORDER BY count(*) DESC, l.lbl) AS rn
        |    FROM edges e JOIN l2 l ON e.src = l.v GROUP BY e.dst, l.lbl) t
        |  WHERE rn = 1),
        |l3 AS (
        |  SELECT l.v, coalesce(m.lbl, l.lbl) AS lbl
        |  FROM l2 l LEFT JOIN m3 m USING (v))
        |SELECT CASE WHEN v % 2 = 0 THEN 'c' || CAST(v // 2 AS VARCHAR)
        |            ELSE 's' || CAST((v - 1) // 2 AS VARCHAR) END AS node,
        |  lbl AS community
        |FROM l3""".stripMargin)),

    // ---- k-center diversity selection ------------------------------------
    // Greedy farthest-point selection (the diversity-sampling / coreset
    // seed shape): start from vector 0, then k−1 rounds of "pick the
    // vector farthest from everything selected so far" (max min-dist,
    // ties to the smaller id). Every pick is a `limit(1)` — a provable
    // 1-row side, so each round is one linear scan + one bounded
    // broadcast, never pairwise; integer lattice distances keep the
    // argmax exact across engines. Production runs the same per-round
    // shape with k ∝ sample budget.
    CatalogQuery("smp_kcenter_diversity", (s, d) => {
      val quant = Tables.embeddings(s, d).select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5) AS BIGINT))")
          .as("q"))
      val distTo = (qcol: String) => expr(
        s"""aggregate(zip_with(q, $qcol, (a, b) -> (a - b) * (a - b)),
           | CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin)
      val seed = quant.filter(col("vec_id") === 0)
        .agg(collect_list(col("q")).as("qs"))
        .select(element_at(col("qs"), 1).as("pq")) // 1-row, auditor-bounded
      var dists = quant.crossJoin(broadcast(seed))
        .select(col("vec_id"), col("q"), distTo("pq").as("md"))
      val picks = (2 to 4).map { rank =>
        val p = dists.orderBy(col("md").desc, col("vec_id")).limit(1)
        val pick = p.select(lit(rank.toLong).as("sel_rank"),
          col("vec_id"), col("md").as("sep_dist"))
        // the picked vector's own min-dist collapses to 0, so it can
        // never win a later round — no explicit exclusion needed
        dists = dists.crossJoin(broadcast(p.select(col("q").as("pq"))))
          .select(col("vec_id"), col("q"),
            least(col("md"), distTo("pq")).as("md"))
        pick
      }
      val seedRow = quant.filter(col("vec_id") === 0)
        .select(lit(1L).as("sel_rank"), col("vec_id"), lit(0L).as("sep_dist"))
      picks.foldLeft(seedRow)(_ unionByName _)
    }, Some(
      """WITH quant AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5) AS BIGINT)) AS q
        |  FROM embeddings),
        |q0 AS (SELECT q AS pq FROM quant WHERE vec_id = 0),
        |d1 AS (
        |  SELECT v.vec_id, v.q,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      k -> (v.q[k] - s.pq[k]) * (v.q[k] - s.pq[k]))) AS BIGINT) AS md
        |  FROM quant v CROSS JOIN q0 s),
        |p2 AS (SELECT vec_id, q, md FROM d1 ORDER BY md DESC, vec_id LIMIT 1),
        |d2 AS (
        |  SELECT v.vec_id, v.q,
        |    least(v.md, CAST(list_sum(list_transform(range(1, 65),
        |      k -> (v.q[k] - p.q[k]) * (v.q[k] - p.q[k]))) AS BIGINT)) AS md
        |  FROM d1 v CROSS JOIN p2 p),
        |p3 AS (SELECT vec_id, q, md FROM d2 ORDER BY md DESC, vec_id LIMIT 1),
        |d3 AS (
        |  SELECT v.vec_id, v.q,
        |    least(v.md, CAST(list_sum(list_transform(range(1, 65),
        |      k -> (v.q[k] - p.q[k]) * (v.q[k] - p.q[k]))) AS BIGINT)) AS md
        |  FROM d2 v CROSS JOIN p3 p),
        |p4 AS (SELECT vec_id, q, md FROM d3 ORDER BY md DESC, vec_id LIMIT 1)
        |SELECT CAST(1 AS BIGINT) AS sel_rank, vec_id, CAST(0 AS BIGINT) AS sep_dist
        |FROM quant WHERE vec_id = 0
        |UNION ALL SELECT 2, vec_id, md FROM p2
        |UNION ALL SELECT 3, vec_id, md FROM p3
        |UNION ALL SELECT 4, vec_id, md FROM p4""".stripMargin)),

    // ---- corpus overlap via KMV sketches ---------------------------------
    // Source-pair overlap estimation with the k-minimum-values sketch
    // (graft.functions.KmvSketch — a mergeable TypedImperativeAggregate,
    // O(k) state per group, map-side combinable): one scan builds a
    // sketch per source, then all pairwise set algebra runs on ≤ k-long
    // arrays. At 100 TB this replaces an exact distinct-intersection
    // (a corpus-sized shuffle per pair) with one aggregate pass; the
    // hash is the md5-prefix bigint both engines reproduce, so the
    // oracle rebuilds the identical sketches exactly.
    CatalogQuery("ddp_corpus_overlap_kmv", (s, d) => {
      import graft.functions.GraftFunctions
      val h = Tables.documents(s, d).select(col("source"),
        expr("CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)").as("h"))
      val sk = h.groupBy(col("source"))
        .agg(GraftFunctions.kmv_sketch(col("h"), 16).as("kmv"))
      // sketches collapse to ONE row (sources × k values — tiny), then
      // pair via double explode: no join at all, auditor-bounded
      val one = sk.agg(collect_list(struct(col("source"), col("kmv"))).as("ss"))
      one.select(explode(col("ss")).as("a"), col("ss"))
        .select(col("a.source").as("source_a"), col("a.kmv").as("ka"),
          explode(col("ss")).as("b"))
        .filter(col("source_a") < col("b.source"))
        .select(col("source_a"), col("b.source").as("source_b"),
          col("ka"), col("b.kmv").as("kb"))
        .withColumn("uk", expr("slice(array_sort(array_distinct(concat(ka, kb))), 1, 16)"))
        .select(col("source_a"), col("source_b"),
          expr("element_at(uk, size(uk))").as("kth_min"),
          expr("CAST(size(filter(uk, v -> array_contains(ka, v) AND array_contains(kb, v))) AS BIGINT)")
            .as("inter_count"),
          expr("CAST(size(uk) AS BIGINT)").as("union_size"))
    }, Some(
      """WITH h AS (
        |  SELECT source, ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
        |  FROM documents),
        |sk AS (
        |  SELECT source, list_sort(list(DISTINCT h))[1:16] AS kmv
        |  FROM h GROUP BY 1),
        |p AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    a.kmv AS ka, b.kmv AS kb
        |  FROM sk a JOIN sk b ON a.source < b.source),
        |u AS (
        |  SELECT source_a, source_b, ka, kb,
        |    list_sort(list_distinct(list_concat(ka, kb)))[1:16] AS uk
        |  FROM p)
        |SELECT source_a, source_b,
        |  uk[len(uk)] AS kth_min,
        |  CAST(len(list_filter(uk, v -> list_contains(ka, v) AND list_contains(kb, v))) AS BIGINT)
        |    AS inter_count,
        |  CAST(len(uk) AS BIGINT) AS union_size
        |FROM u""".stripMargin)),

    // ---- SQL front door --------------------------------------------------
    // The full Spark SQL surface over the replicated tables: registerAll
    // publishes every table as a temp view plus graft's registered SQL
    // functions, and the query exercises a custom codegen'd function
    // (rolling_hash), a partitioned window and a rank filter purely
    // through `spark.sql` — what a SQL-first user of the engine writes.
    CatalogQuery("sql_front_door", (s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT lang, doc_id, fingerprint, CAST(rank AS BIGINT) AS rank
          |FROM (
          |  SELECT lang, doc_id, rolling_hash(text) AS fingerprint,
          |    row_number() OVER (
          |      PARTITION BY lang ORDER BY rolling_hash(text), doc_id) AS rank
          |  FROM documents)
          |WHERE rank <= 5""".stripMargin)
    }, Some(
      s"""SELECT lang, doc_id, fingerprint, CAST(rank AS BIGINT) AS rank
        |FROM (
        |  SELECT lang, doc_id,
        |    ${Similarity.rollingHashDuck("text")} AS fingerprint,
        |    row_number() OVER (
        |      PARTITION BY lang ORDER BY
        |        ${Similarity.rollingHashDuck("text")}, doc_id) AS rank
        |  FROM documents) t
        |WHERE rank <= 5""".stripMargin)),

    // ---- SQL front door: correlated LATERAL subquery --------------------
    // The second SQL-surface probe: a correlated LATERAL top-k ("best 2
    // nations per region by order volume") — the SQL-standard form of
    // per-group top-k that Catalyst plans as a DomainJoin rewrite into a
    // windowed rank, so the declarative text gets the same physical plan
    // as the .withColumn(row_number) form. Identical SQL runs on both
    // engines.
    CatalogQuery("sql_lateral_topk", (s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT r.r_name, t.n_name, t.total
          |FROM region r, LATERAL (
          |  SELECT n.n_name, CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
          |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
          |  JOIN orders o ON o.o_custkey = c.c_custkey
          |  WHERE n.n_regionkey = r.r_regionkey
          |  GROUP BY n.n_name ORDER BY total DESC, n.n_name LIMIT 2) t""".stripMargin)
    }, Some(
      """SELECT r.r_name, t.n_name, t.total
        |FROM region r, LATERAL (
        |  SELECT n.n_name, CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        |  JOIN orders o ON o.o_custkey = c.c_custkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n.n_name ORDER BY total DESC, n.n_name LIMIT 2) t""".stripMargin)),

    // ---- multi-format scan round-trip -----------------------------------
    // Source-format breadth: the same table written and read back through
    // Spark's CSV (header + quoting), JSON-lines, and ORC readers, with
    // identical content stats required per format — the "switch a feed
    // from parquet to X" path. The oracle reads the parquet once and
    // expects the same stats for every format tag.
    CatalogQuery("scan_multiformat_roundtrip", (s, d) => {
      val n = Tables.nation(s, d)
      // one fixed scratch dir per sf (overwrite mode) — a fresh
      // createTempDirectory per invocation would leak a dir every run
      // (the returned frame reads these files lazily, so they cannot be
      // deleted before the caller consumes it)
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-formats-" +
        Integer.toHexString(d.hashCode)
      n.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
      n.write.mode("overwrite").json(s"$dir/json")
      n.write.mode("overwrite").orc(s"$dir/orc")
      val back = Seq(
        "csv" -> s.read.schema(n.schema).option("header", "true").csv(s"$dir/csv"),
        "json" -> s.read.schema(n.schema).json(s"$dir/json"),
        "orc" -> s.read.orc(s"$dir/orc"))
      back.map { case (fmt, df) =>
        df.select(lit(fmt).as("format"), col("n_nationkey"), col("n_name"))
      }.reduce(_ unionByName _)
        .groupBy(col("format"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("n_nationkey")).as("key_sum"),
          sum(length(col("n_name")).cast("long")).as("name_chars"))
    }, Some(
      """SELECT f.format, count(*)::BIGINT AS n_rows,
        |  CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
        |  CAST(sum(length(n_name)) AS BIGINT) AS name_chars
        |FROM nation CROSS JOIN (VALUES ('csv'), ('json'), ('orc')) f(format)
        |GROUP BY 1""".stripMargin)),

    // ---- covariance Gramian (the PCA-whitening input) -------------------
    // The d×d second-moment matrix over quantized embeddings, in the
    // sum form n·Σxy − Σx·Σy so every aggregate is an exact integer —
    // the distributed half of PCA whitening (the d×d eigendecomposition
    // is driver-sized at any corpus scale; CurationSpec checks symmetry
    // + PSD on the assembled matrix). 100 TB: one scan, map-side partial
    // aggregation into d(d+1)/2 cells — the textbook Gramian shape.
    CatalogQuery("emb_covariance_gram", (s, d) => {
      val quant = Tables.embeddings(s, d).select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5) AS BIGINT))")
          .as("q"))
      quant.select(explode(expr(
        """flatten(transform(sequence(0, 63), i ->
          |  transform(sequence(i, 63), j -> struct(i AS i, j AS j,
          |    element_at(q, CAST(i + 1 AS INT)) AS x,
          |    element_at(q, CAST(j + 1 AS INT)) AS y))))""".stripMargin)).as("p"))
        .select(col("p.i").as("i"), col("p.j").as("j"),
          col("p.x").as("x"), col("p.y").as("y"))
        .groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(expr("x * y")).as("sxy"))
        .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
          col("n"), col("sxy"),
          expr("n * sxy - sx * sy").as("cov_num"))
    }, Some(
      """WITH quant AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5) AS BIGINT)) AS q
        |  FROM embeddings),
        |pairs AS (
        |  SELECT vec_id, i, j, q[i + 1] AS x, q[j + 1] AS y
        |  FROM quant CROSS JOIN range(0, 64) a(i) CROSS JOIN range(0, 64) b(j)
        |  WHERE i <= j)
        |SELECT i, j, count(*)::BIGINT AS n, CAST(sum(x * y) AS BIGINT) AS sxy,
        |  CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS cov_num
        |FROM pairs GROUP BY 1, 2""".stripMargin)),

    // ---- int8 embedding quantization with per-dim calibration -----------
    // The CALIBRATED post-training-quantization shape (the complement of
    // sim_embed_quantize_int8's per-VECTOR symmetric abs-max scale):
    // per-DIMENSION (min, max) calibration over the whole corpus — one
    // 64-row aggregate, the pass a PTQ calibration run makes — then
    // affine int8 codes
    //   c = (v − lo)·255 div (hi − lo)
    // and the round-trip reconstruction error per vector, all on the
    // integer lattice (non-negative div operands, so truncation crosses
    // engines). Constant dimensions (hi = lo) pin c = 0 via CASE on both
    // sides — Spark's div-by-zero NULL and DuckDB's error never fire.
    // The gated `oob` column proves every code fits [0, 255] rather than
    // assuming it. 100 TB: calibration is a map-side-combinable 64-row
    // aggregate; encode is one scan joined to the broadcast-sized
    // calibration table; nothing pairwise anywhere.
    CatalogQuery("emb_int8_quantize_calibrated", (s, d) => {
      val q = Tables.embeddings(s, d).select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5) AS BIGINT))")
          .as("q"))
      val dims = q.select(col("vec_id"), posexplode(col("q")).as(Seq("k", "v")))
        .select(col("vec_id"), col("k").cast("long").as("k"), col("v"))
      val cal = dims.groupBy(col("k"))
        .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      dims.join(cal, Seq("k")) // 64-row side; AQE broadcasts unhinted
        .withColumn("c", expr(
          "CASE WHEN hi > lo THEN (v - lo) * 255 div (hi - lo) ELSE CAST(0 AS BIGINT) END"))
        .withColumn("err", expr(
          "abs(v - (CASE WHEN hi > lo THEN lo + (c * (hi - lo) + 127) div 255 ELSE lo END))"))
        .groupBy(col("vec_id"))
        .agg(sum(expr("(k + 1) * c")).as("code_chk"),
          sum(col("err")).as("abs_err_sum"),
          max(col("err")).as("max_err"),
          sum(expr("CASE WHEN c < 0 OR c > 255 THEN 1 ELSE 0 END")).as("oob"))
    }, Some(
      """WITH quant AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5) AS BIGINT)) AS q
        |  FROM embeddings),
        |dims AS (
        |  SELECT vec_id, k, q[k + 1] AS v
        |  FROM quant CROSS JOIN range(0, 64) r(k)),
        |cal AS (SELECT k, min(v) AS lo, max(v) AS hi FROM dims GROUP BY 1),
        |cd AS (
        |  SELECT vec_id, k, v, lo, hi,
        |    CASE WHEN hi > lo THEN (v - lo) * 255 // (hi - lo) ELSE 0 END AS c
        |  FROM dims JOIN cal USING (k)),
        |ce AS (
        |  SELECT vec_id, k, c,
        |    abs(v - (CASE WHEN hi > lo THEN lo + (c * (hi - lo) + 127) // 255 ELSE lo END)) AS err
        |  FROM cd)
        |SELECT vec_id, CAST(sum((k + 1) * c) AS BIGINT) AS code_chk,
        |  CAST(sum(err) AS BIGINT) AS abs_err_sum,
        |  CAST(max(err) AS BIGINT) AS max_err,
        |  CAST(sum(CASE WHEN c < 0 OR c > 255 THEN 1 ELSE 0 END) AS BIGINT) AS oob
        |FROM ce GROUP BY 1""".stripMargin)),

    // ---- Kneser-Ney smoothed bigram LM ----------------------------------
    // The classic interpolated-KN estimate with absolute discount
    // D = 3/4, in the all-integer rational form (×4 clears the discount,
    // ×1e9 scales the probability):
    //   P_KN(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
    //               + D·N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)
    // — the continuation-probability backoff that plain MLE bigrams
    // (txt_bigram_predictability) lack, and the reason "francisco" gets
    // low unigram-continuation mass despite high raw frequency. Every
    // operand is a non-negative BIGINT, so the stacked `div` truncations
    // replay identically on both engines; overflow guards on cb, n1l and
    // n1r trip loudly before 4·cb·1e9, 3·n1l·1e9 or n1r·1e9 could wrap
    // at larger scale. 100 TB: three
    // hash aggregations over the bigram table + one 1-row type count —
    // no window, no pairwise stage.
    CatalogQuery("txt_kneser_ney_bigram", (s, d) => {
      val bg = Tables.documents(s, d)
        .select(split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(toks) - 1),
            | i -> struct(element_at(toks, CAST(i AS INT)) AS w1,
            |             element_at(toks, CAST(i + 1 AS INT)) AS w2))""".stripMargin))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      val lft = cb.groupBy(col("w1"))
        .agg(sum(col("cb")).as("c1"), count(lit(1)).as("n1l"))
      val rgt = cb.groupBy(col("w2")).agg(count(lit(1)).as("n1r"))
      val ntOne = cb.agg(count(lit(1)).as("nt")) // 1-row: total bigram types
      cb.join(lft, Seq("w1")).join(rgt, Seq("w2")).crossJoin(broadcast(ntOne))
        .withColumn("pkn_e9",
          expr("greatest(4 * cb - 3, CAST(0 AS BIGINT)) * 1000000000 div (4 * c1)" +
            " + 3 * n1l * (n1r * 1000000000 div nt) div (4 * c1)")
            + Q.overflowGuard(col("cb"), 2000000000L, "txt_kneser_ney_bigram cb")
            // the continuation term 3·n1l·(n1r·1e9 div nt): the inner div
            // is ≤1e9 (n1r ≤ nt), so 3·n1l·1e9 wraps past n1l ≈ 3.07e9
            // and n1r·1e9 itself wraps past n1r ≈ 9.2e9 — guard both at
            // the same discipline as cb
            + Q.overflowGuard(col("n1l"), 3000000000L, "txt_kneser_ney_bigram n1l")
            + Q.overflowGuard(col("n1r"), 9000000000L, "txt_kneser_ney_bigram n1r"))
        .select(col("w1"), col("w2"), col("cb"), col("pkn_e9"))
    }, Some(
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS tk FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT tk[i] AS w1, tk[i + 1] AS w2
        |  FROM t CROSS JOIN LATERAL (
        |    SELECT unnest(range(1, len(tk))) AS i) u),
        |cbt AS (SELECT w1, w2, count(*)::BIGINT AS cb FROM bg GROUP BY 1, 2),
        |lft AS (
        |  SELECT w1, CAST(sum(cb) AS BIGINT) AS c1, count(*)::BIGINT AS n1l
        |  FROM cbt GROUP BY 1),
        |rgt AS (SELECT w2, count(*)::BIGINT AS n1r FROM cbt GROUP BY 1),
        |nt AS (SELECT count(*)::BIGINT AS nt FROM cbt)
        |SELECT w1, w2, cb,
        |  CAST(greatest(4 * cb - 3, 0) * 1000000000 // (4 * c1)
        |    + 3 * n1l * (n1r * 1000000000 // nt) // (4 * c1) AS BIGINT) AS pkn_e9
        |FROM cbt JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN nt""".stripMargin))
  )
}
