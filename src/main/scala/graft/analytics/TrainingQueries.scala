package graft.analytics

import graft.core.Tables
import graft.functions.{AudioCodec, GraftFunctions, ImageCodec, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over documents + embeddings: the
  * dedup suite (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
  * cosine), similarity search (brute-force baseline + LSH-bucketed scale
  * path), text analysis (language-ID, quality, token stats, fingerprint),
  * and the multimodal binary plumbing.
  *
  * The harness corpus has no natural duplicates, so a deterministic dup
  * set is unioned in (every 10th doc / 20th vector copied under
  * id + 1_000_000) — both engines build the same view, so every operator
  * has a non-trivial, exactly-checkable answer.
  */
object TrainingQueries {

  // ---- shared synthetic-dup views ---------------------------------------

  private def docsPlus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // the corpus arrives as one small file => one input split; spread it
    // before the CPU-heavy hashing stages (at real scale the source is
    // many splits and this shuffle is a no-op to remove)
    docs.unionByName(
      docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
      .repartition(s.sessionState.conf.numShufflePartitions)
  }

  private val duckDocsPlus =
    """SELECT * FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
      |FROM documents WHERE doc_id % 10 = 0""".stripMargin

  private def embPlus(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    emb.unionByName(
      emb.filter(col("vec_id") % 20 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L))
  }

  private val duckEmbPlus =
    """SELECT * FROM embeddings
      |UNION ALL
      |SELECT vec_id + 1000000 AS vec_id, embedding, label
      |FROM embeddings WHERE vec_id % 20 = 0""".stripMargin

  def all: Seq[CatalogQuery] = Seq(

    // ---- exact dedup (hash-groupBy) -------------------------------------
    CatalogQuery("ddp_exact_dup_groups", (s, d) =>
      docsPlus(s, d)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
        .filter(col("n_copies") > 1),
      Some(
        s"""SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_id
           |FROM ($duckDocsPlus) dp GROUP BY 1 HAVING count(*) > 1""".stripMargin)),

    CatalogQuery("ddp_exact_dedup_keep_first", (s, d) => {
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      docsPlus(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("source"))
    }, Some(
      s"""SELECT doc_id, lang, source FROM (
         |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |  FROM ($duckDocsPlus) dp) t WHERE rn = 1""".stripMargin), bench = true),

    // ---- MinHash + LSH near-dup candidates ------------------------------
    // signature k=9, bands=3x3; band join shuffles only (doc_id, band_key)
    CatalogQuery("ddp_minhash_lsh_pairs", (s, d) => {
      // materialize tokens then shingles then signature: each stage
      // evaluates once per row (inline nesting re-runs split per element)
      val sigs = docsPlus(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), expr(Similarity.shinglesFromToks("toks")).as("sh"))
        // native expression streams shingle bytes into one digest per
        // (permutation, shingle) — no concat/lambda churn; bit-identical
        // to minhashFromShingles/minhashDuck
        .select(col("doc_id"), GraftFunctions.minhash_hex(col("sh"), 9).as("sig"))
      val bands = sigs.select(col("doc_id"),
        posexplode(expr(
          """transform(sequence(0, 2), j -> md5(concat(
            | element_at(sig, 3 * CAST(j AS INT) + 1),
            | element_at(sig, 3 * CAST(j AS INT) + 2),
            | element_at(sig, 3 * CAST(j AS INT) + 3))))""".stripMargin)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    }, Some(
      s"""WITH dp AS ($duckDocsPlus),
         |sigs AS (SELECT doc_id, ${Similarity.minhashDuck("text", 9)} AS sig FROM dp),
         |bands AS (SELECT doc_id, j AS band,
         |    md5(sig[3*j+1] || sig[3*j+2] || sig[3*j+3]) AS band_key
         |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2]) AS j) u)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id""".stripMargin),
      bench = true),

    // ---- CDC-maintained MinHash-LSH dedup index -------------------------
    // The dedup family joins the maintained-state axis: the LSH bucket
    // index FOLLOWS a document change stream instead of being rebuilt
    // per scan. Buckets are keyed (band, band_key) in a SnapshotSink;
    // per batch, the changed docs' OLD bands (row-state lookup,
    // pre-merge) and NEW bands form the touched set, each touched bucket
    // rebuilds as old-members − changed-docs + new-bands, and emptied
    // buckets tombstone — a revision moves its doc between buckets, a
    // delete vanishes from all of them. Inserted keys carry their source
    // doc's UNCHANGED text, so the planted near-dup pairs exist ONLY
    // because maintenance indexed the inserts; candidate pairs serve
    // straight from the maintained buckets (band-key equi-join, the
    // ddp_minhash_lsh_pairs shape). Oracle: signatures + bands over the
    // from-scratch LWW final state. 100 TB: per-batch cost = changed
    // docs' signatures + touched buckets; the serve join never re-reads
    // the corpus.
    CatalogQuery("ddp_cdc_maintained_lsh", (s, d) => {
      val work = Q.scratch("lshidx")
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      def batch(b: Int): DataFrame =
        if (b == 0)
          docs.select(col("doc_id"), col("text"),
            lit(graft.core.ChangeLog.Insert).as("op"), lit(0L).as("seq"))
        else {
          val ups = docs.filter(col("doc_id") % 10 === b)
            .select(col("doc_id"), concat(col("text"), lit(s" rev$b")).as("text"))
          val ins = docs.filter(col("doc_id") % 23 === b)
            .select((col("doc_id") + lit(1000000L * b)).as("doc_id"), col("text"))
          val dels = docs.filter(col("doc_id") % 17 === b && col("doc_id") % 10 =!= b)
            .select(col("doc_id"), lit(null).cast("string").as("text"))
          ups.unionByName(ins)
            .withColumn("op", lit(graft.core.ChangeLog.Update))
            .unionByName(dels.withColumn("op", lit(graft.core.ChangeLog.Delete)))
            .withColumn("seq", lit(b.toLong))
        }
      def bandsOf(df: DataFrame): DataFrame = df
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), expr(Similarity.shinglesFromToks("toks")).as("sh"))
        .select(col("doc_id"), GraftFunctions.minhash_hex(col("sh"), 9).as("sig"))
        .select(col("doc_id"), posexplode(expr(
          """transform(sequence(0, 2), j -> md5(concat(
            | element_at(sig, 3 * CAST(j AS INT) + 1),
            | element_at(sig, 3 * CAST(j AS INT) + 2),
            | element_at(sig, 3 * CAST(j AS INT) + 3))))""".stripMargin)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
        .filter(col("band_key").isNotNull) // < 3-token docs have no bands
        .select(col("band").cast("long").as("band"), col("band_key"), col("doc_id"))
      val docState = new graft.sinks.SnapshotSink(s, s"$work/docs", Seq("doc_id"))
      val buckets = new graft.sinks.SnapshotSink(s, s"$work/buckets",
        Seq("band", "band_key"))
      (0 to 3).foreach { b =>
        val ch = batch(b)
        val newBands = bandsOf(ch.filter(col("op") =!= graft.core.ChangeLog.Delete))
        val (touched, carried) =
          if (b == 0) (newBands.select("band", "band_key").distinct(), newBands)
          else {
            // both pre-merge lookups are bucket point reads: the changed
            // docs' own doc-state buckets, then the touched band keys'
            // bucket-sink buckets — never a state scan
            val keys = ch.select(col("doc_id")).distinct().localCheckpoint()
            val oldBands = bandsOf(docState.readBuckets(keys)
              .join(keys, Seq("doc_id")))
            val t = newBands.select("band", "band_key")
              .unionByName(oldBands.select("band", "band_key")).distinct()
              .localCheckpoint()
            val old = buckets.readBuckets(t).join(t, Seq("band", "band_key"))
              .select(col("band"), col("band_key"),
                explode(col("members")).as("doc_id"))
              .join(keys, Seq("doc_id"), "left_anti")
              .select(col("band"), col("band_key"), col("doc_id"))
            (t, old.unionByName(newBands.select("band", "band_key", "doc_id")))
          }
        val rebuilt = carried.groupBy(col("band"), col("band_key"))
          .agg(expr("sort_array(collect_list(doc_id))").as("members"))
        val dropped = touched.join(rebuilt.select("band", "band_key"),
            Seq("band", "band_key"), "left_anti")
          .select(col("band"), col("band_key"),
            lit(null).cast("array<bigint>").as("members"),
            lit(graft.core.ChangeLog.Delete).as("op"))
        buckets.merge(rebuilt
          .withColumn("op", lit(graft.core.ChangeLog.Update))
          .unionByName(dropped)
          .withColumn("seq", lit(b.toLong)))
        docState.merge(ch)
      }
      val m = buckets.read()
        .select(col("band"), col("band_key"), explode(col("members")).as("doc_id"))
      m.as("a").join(m.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    }, Some(
      s"""WITH b3 AS (SELECT unnest(range(1, 4)) AS b),
         |base AS (SELECT doc_id, text, 0::BIGINT AS seq, 0 AS del FROM documents),
         |ups AS (
         |  SELECT doc_id, text || ' rev' || b::VARCHAR, b::BIGINT, 0
         |  FROM documents CROSS JOIN b3 WHERE doc_id % 10 = b),
         |ins AS (
         |  SELECT doc_id + 1000000 * b, text, b::BIGINT, 0
         |  FROM documents CROSS JOIN b3 WHERE doc_id % 23 = b),
         |dels AS (
         |  SELECT doc_id, CAST(NULL AS VARCHAR), b::BIGINT, 1
         |  FROM documents CROSS JOIN b3 WHERE doc_id % 17 = b AND doc_id % 10 <> b),
         |log AS (
         |  SELECT * FROM base UNION ALL SELECT * FROM ups
         |  UNION ALL SELECT * FROM ins UNION ALL SELECT * FROM dels),
         |fin AS (
         |  SELECT doc_id, text FROM (
         |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
         |    FROM log) t
         |  WHERE rn = 1 AND del = 0),
         |sigs AS (SELECT doc_id, ${Similarity.minhashDuck("text", 9)} AS sig FROM fin),
         |bands AS (SELECT doc_id, j AS band,
         |    md5(sig[3*j+1] || sig[3*j+2] || sig[3*j+3]) AS band_key
         |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2]) AS j) u)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id""".stripMargin)),

    // ---- sketch-quality evaluation: estimated vs exact Jaccard ----------
    // MinHash's whole point is estimating Jaccard from k component
    // agreements without touching the shingle sets — this gates the
    // estimator itself on the LSH candidates: est = (matching sig
    // positions)/k next to the exact set Jaccard, plus the absolute
    // error. The dedup-threshold calibration harness (pick k and t from
    // measured error) as a first-class query.
    CatalogQuery("ddp_minhash_jaccard_estimate", (s, d) => {
      val base = docsPlus(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), expr(Similarity.shinglesFromToks("toks")).as("sh"))
        .select(col("doc_id"),
          expr("array_distinct(sh)").as("shd"),
          GraftFunctions.minhash_hex(col("sh"), 9).as("sig"))
      val cand = Catalog.queries("ddp_minhash_lsh_pairs")(s, d)
      cand
        .join(base.select(col("doc_id").as("doc_a"),
          col("shd").as("sha"), col("sig").as("siga")), "doc_a")
        .join(base.select(col("doc_id").as("doc_b"),
          col("shd").as("shb"), col("sig").as("sigb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (expr("size(filter(zip_with(siga, sigb, (x, y) -> x = y), m -> m))")
            .cast("double") / 9).as("est_jaccard"),
          (size(array_intersect(col("sha"), col("shb"))).cast("double") /
            size(array_union(col("sha"), col("shb")))).as("exact_jaccard"))
        .withColumn("abs_err", abs(col("est_jaccard") - col("exact_jaccard")))
    }, Some(
      s"""WITH dp AS ($duckDocsPlus),
         |sigs AS (SELECT doc_id, ${Similarity.minhashDuck("text", 9)} AS sig FROM dp),
         |bands AS (SELECT doc_id, j AS band,
         |    md5(sig[3*j+1] || sig[3*j+2] || sig[3*j+3]) AS band_key
         |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2]) AS j) u),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |sh AS (SELECT doc_id, list_distinct(${Similarity.shinglesDuck("text")}) AS sh FROM dp)
         |SELECT doc_a, doc_b,
         |  CAST(list_sum(list_transform(range(1, 10),
         |    i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 9
         |    AS est_jaccard,
         |  CAST(len(list_intersect(ha.sh, hb.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(ha.sh, hb.sh))) AS exact_jaccard,
         |  abs(CAST(list_sum(list_transform(range(1, 10),
         |    i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 9
         |    - CAST(len(list_intersect(ha.sh, hb.sh)) AS DOUBLE)
         |      / len(list_distinct(list_concat(ha.sh, hb.sh)))) AS abs_err
         |FROM cand
         |  JOIN sigs sa ON sa.doc_id = doc_a
         |  JOIN sigs sb ON sb.doc_id = doc_b
         |  JOIN sh ha ON ha.doc_id = doc_a
         |  JOIN sh hb ON hb.doc_id = doc_b""".stripMargin)),

    // ---- n-gram Jaccard via prefix-filter similarity join ----------------
    // Exact set-similarity self-join (AllPairs/PPJoin prefix filtering):
    // under a global shingle order, any pair with J >= t shares its
    // smallest common shingle within each side's first
    // |x| - ceil(t*|x|) + 1 shingles, so candidates come from an equi-join
    // on prefix shingles — never an all-pairs block. Lossless: identical
    // answer to the oracle's quadratic formulation, but the Spark plan is
    // O(candidates) instead of O(n^2 / #(lang,source) blocks). ceil(t*n)
    // is computed in integer math ((4n+4) div 5) — double ceil(0.8*n)
    // rounds up on exact multiples and would shorten the prefix.
    CatalogQuery("ddp_ngram_jaccard_pairs", (s, d) => {
      val sh = docsPlus(s, d)
        .select(col("doc_id"), col("lang"), col("source"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("lang"), col("source"),
          expr(s"array_sort(array_distinct(${Similarity.shinglesFromToks("toks")}))").as("sh"))
      val prefixes = sh.select(col("doc_id"), col("lang"), col("source"),
        explode(expr(
          "slice(sh, 1, size(sh) - CAST((4 * size(sh) + 4) div 5 AS INT) + 1)")).as("tok"))
      val cand = prefixes.as("a").join(prefixes.as("b"),
          col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
            col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (size(array_intersect(col("sha"), col("shb"))).cast("double") /
            size(array_union(col("sha"), col("shb")))).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
    }, Some(
      s"""WITH sh AS (SELECT doc_id, lang, source,
         |    list_distinct(${Similarity.shinglesDuck("text")}) AS sh
         |  FROM ($duckDocsPlus) dp)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |      len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
         |  FROM sh a JOIN sh b
         |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id) t
         |WHERE jaccard >= 0.8""".stripMargin)),

    // ---- asymmetric containment pairs (excerpt / quote detection) --------
    // The directed twin of the Jaccard join: C(A→B) = |sh(A)∩sh(B)| /
    // |sh(A)| catches a document CONTAINED in a much larger one — the
    // excerpt/quote dup class where Jaccard collapses (J ≈ |A|/|B|).
    // Planted signal: every doc_id % 37 == 0 with ≥ 10 tokens gains an
    // excerpt twin (+5e6 id) carrying its first 3n/5 tokens, whose
    // token-prefix shingles are a subset of the original's → containment
    // 1.0. Candidates are lossless prefix-filtered ON THE CONTAINED SIDE
    // only (if C ≥ t, one of A's first |A| − ⌈t|A|⌉ + 1 shingles in the
    // global order must hit B — the containing side joins through its
    // FULL shingle postings, since no |B|-based prefix bound exists for
    // containment), blocked by (lang, source). Integer-exact: ⌈0.9n⌉ =
    // (9n+9) div 10; the score is an int/int IEEE division. 100 TB: the
    // posting-list join shuffles (shingle, doc_id) only; heavy-shingle
    // skew is the documented lever (df-ascending global order shortens
    // prefixes exactly where lists are long, plus AQE skew-join).
    CatalogQuery("ddp_containment_pairs", (s, d) => {
      val base = docsPlus(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
      val exc = base
        .filter(col("doc_id") % 37 === 0 && size(split(col("text"), " ")) >= 10)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("lang"), col("source"),
          expr("""array_join(slice(split(text, ' '), 1,
            | CAST((3 * size(split(text, ' '))) div 5 AS INT)), ' ')""".stripMargin)
            .as("text"))
      val all = base.unionByName(exc)
      val sh = all
        .select(col("doc_id"), col("lang"), col("source"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("lang"), col("source"),
          expr(s"array_sort(array_distinct(${Similarity.shinglesFromToks("toks")}))").as("sh"))
        .filter(size(col("sh")) > 0)
      val prefixes = sh.select(col("doc_id"), col("lang"), col("source"),
        explode(expr(
          "slice(sh, 1, size(sh) - CAST((9 * size(sh) + 9) div 10 AS INT) + 1)")).as("tok"))
      val full = sh.select(col("doc_id").as("doc_b"), col("lang"), col("source"),
        explode(col("sh")).as("tok"))
      val cand = prefixes.join(full, Seq("lang", "source", "tok"))
        .filter(col("doc_id") =!= col("doc_b"))
        .select(col("doc_id").as("contained"), col("doc_b").as("container"))
        .distinct()
      cand
        .join(sh.select(col("doc_id").as("contained"), col("sh").as("sha")), "contained")
        .join(sh.select(col("doc_id").as("container"), col("sh").as("shb")), "container")
        .select(col("contained"), col("container"),
          (size(array_intersect(col("sha"), col("shb"))).cast("double") /
            size(col("sha"))).as("containment"))
        .filter(col("containment") >= 0.9)
    }, Some(
      s"""WITH dp AS ($duckDocsPlus),
         |exc AS (
         |  SELECT doc_id + 5000000 AS doc_id, lang, source,
         |    array_to_string(
         |      string_split(text, ' ')[1:(3 * len(string_split(text, ' '))) // 5],
         |      ' ') AS text
         |  FROM dp WHERE doc_id % 37 = 0 AND len(string_split(text, ' ')) >= 10),
         |alldocs AS (
         |  SELECT doc_id, lang, source, text FROM dp
         |  UNION ALL SELECT doc_id, lang, source, text FROM exc),
         |sh AS (
         |  SELECT doc_id, lang, source,
         |    list_distinct(${Similarity.shinglesDuck("text")}) AS sh
         |  FROM alldocs),
         |shf AS (SELECT * FROM sh WHERE len(sh) > 0)
         |SELECT contained, container, containment FROM (
         |  SELECT a.doc_id AS contained, b.doc_id AS container,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) AS containment
         |  FROM shf a JOIN shf b
         |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id) t
         |WHERE containment >= 0.9""".stripMargin)),

    // ---- SimHash dup groups ---------------------------------------------
    CatalogQuery("ddp_simhash_groups", (s, d) =>
      docsPlus(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        // native expression: ONE md5 per token (the HOF form re-evaluates
        // md5(t) inside the per-bit lambda — 32 digests per token);
        // bit-identical to simhashFromToks/simhashDuck
        .select(col("doc_id"), GraftFunctions.simhash32(col("toks")).as("simhash"))
        .groupBy(col("simhash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
        .filter(col("n_docs") > 1),
      Some(
        s"""SELECT simhash, count(*) AS n_docs, min(doc_id) AS keep_id
           |FROM (SELECT doc_id, CAST(${Similarity.simhashDuck("text")} AS BIGINT) AS simhash
           |      FROM ($duckDocsPlus) dp) t
           |GROUP BY simhash HAVING count(*) > 1""".stripMargin)),

    // SimHash near-dup pairs by Hamming distance via banded equi-join:
    // the 32-bit simhash splits into 8 4-bit bands; a pair at distance
    // <= 4 differs in at most 4 bands so it must agree on at least one
    // (pigeonhole, 8 > 4) — candidates come from an equi-join on
    // (lang, band, value), then the exact bit_count verifies. Lossless,
    // and the join shuffles only (doc_id, simhash, band key), never text.
    CatalogQuery("ddp_simhash_hamming_pairs", (s, d) => {
      val sh = docsPlus(s, d)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("lang"),
          GraftFunctions.simhash32(col("toks")).as("simhash"))
      val bands = sh.select(col("doc_id"), col("lang"), col("simhash"),
        posexplode(expr(
          "transform(sequence(0, 7), b -> shiftright(simhash, 4 * CAST(b AS INT)) % 16)")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_val")
      bands.as("a").join(bands.as("b"),
          col("a.lang") === col("b.lang") && col("a.band") === col("b.band") &&
            col("a.band_val") === col("b.band_val") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.simhash").as("sha"), col("b.simhash").as("shb"))
        .distinct()
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sha").bitwiseXOR(col("shb"))).cast("long").as("hamming"))
        .filter(col("hamming") <= 4)
    }, Some(
      s"""WITH sh AS (
         |  SELECT doc_id, lang, ${Similarity.simhashDuck("text")} AS simhash
         |  FROM ($duckDocsPlus) dp)
         |SELECT doc_a, doc_b, hamming FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id) t
         |WHERE hamming <= 4""".stripMargin)),

    // ---- embedding-cosine near-dup via LSH bucket candidates -------------
    // Candidates come from the multi-table hyperplane LSH (8 tables x
    // 4 bits, same buckets as sim_lsh_ann_topk): a cos >= 0.99 pair
    // collides in a given table w.p. (1 - acos(.99)/pi)^4 ≈ 0.83, in at
    // least one of 8 w.p. 1 - 0.17^8 ≈ 1 - 7e-7 — and exact duplicates
    // (identical vectors) always collide in every table. The candidate
    // distinct is on id pairs only (no 64-dim vectors through that
    // shuffle); vectors re-join afterwards for the exact cosine verify.
    CatalogQuery("ddp_embed_cosine_pairs", (s, d) => {
      val e = embPlus(s, d).repartition(s.sessionState.conf.numShufflePartitions)
      val b = e.withColumn("buckets", GraftFunctions.lsh_buckets(col("embedding"), 8, 4))
        .select(col("vec_id"), col("label"), posexplode(col("buckets")))
        .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
      val cand = b.as("a").join(b.as("b"),
          col("a.label") === col("b.label") && col("a.tbl") === col("b.tbl") &&
            col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
        .distinct()
      val vecs = e.select(col("vec_id"), col("embedding"))
      cand
        .join(vecs.select(col("vec_id").as("va"), col("embedding").as("ea")), "va")
        .join(vecs.select(col("vec_id").as("vb"), col("embedding").as("eb")), "vb")
        .withColumn("cos_sim", GraftFunctions.cosine_sim(col("ea"), col("eb")))
        .filter(col("cos_sim") >= 0.99)
        .select(col("va"), col("vb"), round(col("cos_sim"), 4).as("cos_sim"))
    }, Some(
      s"""WITH ep AS ($duckEmbPlus)
         |SELECT va, vb, round(cos_sim, 4) AS cos_sim FROM (
         |  SELECT a.vec_id AS va, b.vec_id AS vb,
         |    ${Similarity.cosineDuck("a.embedding", "b.embedding", 64)} AS cos_sim
         |  FROM ep a JOIN ep b ON a.label = b.label AND a.vec_id < b.vec_id) t
         |WHERE cos_sim >= 0.99""".stripMargin)),

    // ---- semantic dedup at quantization granularity ----------------------
    // SemDeDup-style exact grouping in quantized embedding space: vectors
    // that collapse to the same int-lattice point (64 steps per unit) are
    // semantic duplicates; keep the lowest id. One hash-groupBy on a
    // 16-byte signature — shuffles digests, never vectors, and needs no
    // pair enumeration at all: the cheapest rung of the dedup ladder,
    // below cosine-pair LSH (exact quantized match vs near-match).
    CatalogQuery("ddp_embed_quantized_dedup", (s, d) => {
      val sig = md5(concat_ws(",",
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5) AS BIGINT))")))
      embPlus(s, d)
        .select(col("vec_id"), sig.as("qsig"))
        .groupBy(col("qsig"))
        .agg(min(col("vec_id")).as("keep_id"), count(lit(1)).as("n_members"))
        .filter(col("n_members") > 1)
    }, Some(
      s"""WITH ep AS ($duckEmbPlus)
         |SELECT md5(array_to_string(list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5) AS BIGINT)), ',')) AS qsig,
         |  min(vec_id) AS keep_id, count(*) AS n_members
         |FROM ep GROUP BY 1 HAVING count(*) > 1""".stripMargin)),

    // ---- dedup-threshold calibration sweep -------------------------------
    // Band the LSH candidate pairs by cosine (<0.90 / 0.90 / 0.95 /
    // 0.99+) in one pass — the measurement that picks the semantic-dedup
    // threshold before a production run. Unlike ddp_embed_cosine_pairs
    // (whose 0.99 threshold is lossless over the candidates), the sweep
    // REPORTS ON the candidate set itself, so the oracle reproduces the
    // same 8×4-bit bucket join in SQL rather than enumerating all pairs.
    CatalogQuery("ddp_cosine_threshold_sweep", (s, d) => {
      val e = embPlus(s, d).repartition(s.sessionState.conf.numShufflePartitions)
      val b = e.withColumn("buckets", GraftFunctions.lsh_buckets(col("embedding"), 8, 4))
        .select(col("vec_id"), col("label"), posexplode(col("buckets")))
        .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
      val cand = b.as("a").join(b.as("b"),
          col("a.label") === col("b.label") && col("a.tbl") === col("b.tbl") &&
            col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
        .distinct()
      val vecs = e.select(col("vec_id"), col("embedding"))
      cand
        .join(vecs.select(col("vec_id").as("va"), col("embedding").as("ea")), "va")
        .join(vecs.select(col("vec_id").as("vb"), col("embedding").as("eb")), "vb")
        .withColumn("cos_sim", GraftFunctions.cosine_sim(col("ea"), col("eb")))
        .withColumn("band",
          when(col("cos_sim") >= 0.99, "0.99+")
            .when(col("cos_sim") >= 0.95, "0.95")
            .when(col("cos_sim") >= 0.90, "0.90")
            .otherwise("<0.90"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_pairs"))
    }, Some(
      s"""WITH ep AS ($duckEmbPlus),
         |b AS (
         |  SELECT vec_id, label, embedding, t.tbl,
         |    ${Similarity.lshBucketDuckOffset("embedding", 4, 64, "t.tbl * 4")} AS bucket
         |  FROM ep CROSS JOIN (SELECT unnest(range(0, 8)) AS tbl) t),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
         |  FROM b a JOIN b b ON a.label = b.label AND a.tbl = b.tbl
         |    AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |sc AS (
         |  SELECT ${Similarity.cosineDuck("ea.embedding", "eb.embedding", 64)} AS cos_sim
         |  FROM cand JOIN ep ea ON cand.va = ea.vec_id
         |            JOIN ep eb ON cand.vb = eb.vec_id)
         |SELECT CASE WHEN cos_sim >= 0.99 THEN '0.99+'
         |            WHEN cos_sim >= 0.95 THEN '0.95'
         |            WHEN cos_sim >= 0.90 THEN '0.90'
         |            ELSE '<0.90' END AS band,
         |  count(*)::BIGINT AS n_pairs
         |FROM sc GROUP BY 1""".stripMargin)),

    // ---- per-source quality gate (groupwise median filter) ---------------
    // Keep documents at or above their SOURCE's median token count — the
    // groupwise-relative quality filter (an absolute cutoff over mixed
    // sources just deletes the short-form sources). Exact median per
    // source (midpoint interpolation of two ints is IEEE-exact); at
    // 100 TB the median table is source-vocabulary-bounded and the gate
    // is one broadcast-joined scan.
    CatalogQuery("txt_per_source_quality_gate", (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      val med = docs.groupBy(col("source"))
        .agg(expr("percentile(n_tok, 0.5D)").as("med_tok"))
      docs.join(med, Seq("source"))
        .groupBy(col("source"), col("med_tok"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_tok") >= col("med_tok"), 1L).otherwise(0L)).as("n_kept"))
        .select(col("source"), col("n_docs"), col("n_kept"), col("med_tok"))
    }, Some(
      """WITH t AS (
        |  SELECT source, len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
        |med AS (
        |  SELECT source, quantile_cont(n_tok, 0.5) AS med_tok FROM t GROUP BY 1)
        |SELECT t.source, count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN t.n_tok >= med.med_tok THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  med.med_tok
        |FROM t JOIN med ON t.source = med.source
        |GROUP BY t.source, med.med_tok""".stripMargin)),

    // ---- similarity search: brute-force baseline -------------------------
    CatalogQuery("sim_cosine_topk_bruteforce", (s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos_raw").desc, col("vec_id"))
      // no broadcast hint: the query side is a corpus FRACTION (%50), so
      // forcing it would OOM at scale; the planner broadcasts the smaller
      // side on its own, and a production run draws queries from a bounded
      // query set. The BNLJ itself is the documented brute-force baseline.
      e.join(q, col("query_id") =!= col("vec_id"))
        .withColumn("cos_raw", GraftFunctions.cosine_sim(col("qv"), col("embedding")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id").as("neighbor_id"), round(col("cos_raw"), 4).as("cos_sim"))
    }, Some(
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0)
         |SELECT query_id, rank, neighbor_id, round(cos_raw, 4) AS cos_sim FROM (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |    ${Similarity.cosineDuck("q.qv", "e.embedding", 64)} AS cos_raw,
         |    row_number() OVER (PARTITION BY q.query_id
         |      ORDER BY ${Similarity.cosineDuck("q.qv", "e.embedding", 64)} DESC, e.vec_id) AS rank
         |  FROM q JOIN embeddings e ON q.query_id <> e.vec_id) t
         |WHERE rank <= 5""".stripMargin)),

    // ---- similarity search: multi-table LSH scale path -------------------
    // 8 tables x 4-bit hyperplane buckets: a pair is a candidate if it
    // collides in ANY table (recall ≈ 1-(1-p^4)^8 vs p^8 single-table —
    // measured 0 -> ~0.7 on these embeddings). Candidates meet only inside
    // (table, bucket) equi-join partitions — the shape that survives 100 TB.
    CatalogQuery("sim_lsh_ann_topk", (s, d) => {
      val e0 = Tables.embeddings(s, d)
        .repartition(s.sessionState.conf.numShufflePartitions)
      // bucket join + candidate distinct carry only ids and bucket keys —
      // the 64-dim vectors re-join after dedup (shuffling vectors through
      // the distinct costs ~10x the bytes for nothing)
      val b = e0.withColumn("buckets", GraftFunctions.lsh_buckets(col("embedding"), 8, 4))
        .select(col("vec_id"), posexplode(col("buckets")))
        .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
      val q = b.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("tbl"), col("bucket"))
      val candIds = b.join(q, Seq("tbl", "bucket"))
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id"))
        .distinct()
      val vecs = e0.select(col("vec_id"), col("embedding"))
      val candidates = candIds
        .join(vecs.select(col("vec_id").as("query_id"), col("embedding").as("qv")), "query_id")
        .join(vecs, "vec_id")
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos_raw").desc, col("vec_id"))
      candidates
        .withColumn("cos_raw", GraftFunctions.cosine_sim(col("qv"), col("embedding")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id").as("neighbor_id"))
    }, Some(
      s"""WITH b AS (
         |  SELECT vec_id, embedding, t.tbl,
         |    ${Similarity.lshBucketDuckOffset("embedding", 4, 64, "t.tbl * 4")} AS bucket
         |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 8)) AS tbl) t),
         |q AS (SELECT vec_id AS query_id, embedding AS qv, tbl, bucket FROM b WHERE vec_id % 50 = 0),
         |cand AS (SELECT DISTINCT q.query_id, q.qv, b.vec_id, b.embedding
         |  FROM q JOIN b ON q.tbl = b.tbl AND q.bucket = b.bucket AND q.query_id <> b.vec_id)
         |SELECT query_id, rank, neighbor_id FROM (
         |  SELECT query_id, vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY ${Similarity.cosineDuck("qv", "embedding", 64)} DESC, vec_id) AS rank
         |  FROM cand) t
         |WHERE rank <= 3""".stripMargin), bench = true),

    // ---- similarity search: IVF variant ----------------------------------
    // Coarse quantizer: 16 deterministic centroids (the vectors with
    // vec_id < 16 — reproducible across engines and scale factors);
    // every vector is assigned to its nearest centroid's cell, queries
    // probe their nprobe=2 nearest cells, and the exact cosine ranks only
    // the probed cells' members. 100 TB shape: centroids broadcast
    // (bounded C), assignment is one linear scan, and the candidate join
    // is an equi-join on cell — the IVF pruning that replaces all-pairs.
    // Sizing: per-cell occupancy is N/C, so production picks C ≈ sqrt(N)
    // (kmeans-trained); C is fixed at 16 here so the oracle stays exact.
    CatalogQuery("sim_ivf_ann_topk", (s, d) => {
      val e = Tables.embeddings(s, d)
        .repartition(s.sessionState.conf.numShufflePartitions)
      // The C=16 centroid set is collapsed to ONE row (global collect_list
      // aggregate) before the broadcast and re-exploded after: the scoring
      // cross product is then against a PROVABLY 1-row side (Catalyst
      // maxRows = 1), so the plan auditor's structural bound covers it —
      // no by-name exemption needed. Broadcast payload = C vectors, bounded
      // by config, never by the corpus.
      val centsOne = e.filter(col("vec_id") < 16)
        .agg(collect_list(struct(col("vec_id").as("cell"),
          col("embedding").as("cv"))).as("cs"))
      val scored = e.crossJoin(broadcast(centsOne))
        .select(col("vec_id"), col("embedding"), explode(col("cs")).as("c"))
        .select(col("vec_id"), col("embedding"),
          col("c.cell").as("cell"), col("c.cv").as("cv"))
        .withColumn("cos_c", GraftFunctions.cosine_sim(col("embedding"), col("cv")))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos_c").desc, col("cell"))
      val assigned = scored
        .withColumn("rn", row_number().over(wAssign)).filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("cell"))
      val qcells = scored.filter(col("vec_id") % 50 === 0)
        .withColumn("rn", row_number().over(wAssign)).filter(col("rn") <= 2)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("cell"))
      val wRank = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_raw").desc, col("vec_id"))
      assigned.join(qcells, Seq("cell"))
        .filter(col("query_id") =!= col("vec_id"))
        .withColumn("cos_raw", GraftFunctions.cosine_sim(col("qv"), col("embedding")))
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id").as("neighbor_id"))
    }, Some(
      s"""WITH cents AS (SELECT vec_id AS cell, embedding AS cv FROM embeddings WHERE vec_id < 16),
         |scored AS (
         |  SELECT e.vec_id, e.embedding, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${Similarity.cosineDuck("e.embedding", "c.cv", 64)} DESC, c.cell) AS rn
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (SELECT vec_id, embedding, cell FROM scored WHERE rn = 1),
         |qcells AS (SELECT vec_id AS query_id, embedding AS qv, cell
         |  FROM scored WHERE vec_id % 50 = 0 AND rn <= 2)
         |SELECT query_id, rank, neighbor_id FROM (
         |  SELECT q.query_id, a.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.query_id
         |      ORDER BY ${Similarity.cosineDuck("q.qv", "a.embedding", 64)} DESC, a.vec_id) AS rank
         |  FROM qcells q JOIN assigned a ON q.cell = a.cell AND q.query_id <> a.vec_id) t
         |WHERE rank <= 3""".stripMargin)),

    // ---- ANN quality: recall of LSH against the brute-force truth --------
    CatalogQuery("sim_lsh_recall", (s, d) => {
      val bf = Catalog.queries("sim_cosine_topk_bruteforce")(s, d)
        .filter(col("rank") <= 3).select(col("query_id"), col("neighbor_id"))
      val lsh = Catalog.queries("sim_lsh_ann_topk")(s, d)
        .select(col("query_id").as("q2"), col("neighbor_id").as("n2"))
      val hits = bf.join(lsh,
        col("query_id") === col("q2") && col("neighbor_id") === col("n2"), "left_semi")
      bf.agg(count(lit(1)).as("truth_pairs"))
        .crossJoin(hits.agg(count(lit(1)).as("found_pairs")))
        .withColumn("recall",
          col("found_pairs").cast("double") / col("truth_pairs"))
    }, Some(
      s"""WITH b AS (
         |  SELECT vec_id, embedding, t.tbl,
         |    ${Similarity.lshBucketDuckOffset("embedding", 4, 64, "t.tbl * 4")} AS bucket
         |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 8)) AS tbl) t),
         |q0 AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
         |qb AS (SELECT vec_id AS query_id, embedding AS qv, tbl, bucket FROM b WHERE vec_id % 50 = 0),
         |bf AS (SELECT query_id, neighbor_id FROM (
         |  SELECT q0.query_id, e2.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q0.query_id
         |      ORDER BY ${Similarity.cosineDuck("q0.qv", "e2.embedding", 64)} DESC, e2.vec_id) AS rank
         |  FROM q0 JOIN embeddings e2 ON q0.query_id <> e2.vec_id) t WHERE rank <= 3),
         |cand AS (SELECT DISTINCT qb.query_id, qb.qv, b.vec_id, b.embedding
         |  FROM qb JOIN b ON qb.tbl = b.tbl AND qb.bucket = b.bucket AND qb.query_id <> b.vec_id),
         |lsh AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY ${Similarity.cosineDuck("qv", "embedding", 64)} DESC, vec_id) AS rank
         |  FROM cand) t WHERE rank <= 3)
         |SELECT (SELECT count(*) FROM bf) AS truth_pairs,
         |  (SELECT count(*) FROM bf JOIN lsh USING (query_id, neighbor_id)) AS found_pairs,
         |  CAST((SELECT count(*) FROM bf JOIN lsh USING (query_id, neighbor_id)) AS DOUBLE)
         |    / (SELECT count(*) FROM bf) AS recall""".stripMargin)),

    // ---- end-to-end near-dup pipeline: LSH candidates -> Jaccard verify --
    CatalogQuery("ddp_near_dup_end2end", (s, d) => {
      val candidates = Catalog.queries("ddp_minhash_lsh_pairs")(s, d)
      val sh = docsPlus(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          expr(s"array_distinct(${Similarity.shinglesFromToks("toks")})").as("sh"))
      candidates
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
        .withColumn("jaccard",
          size(array_intersect(col("sha"), col("shb"))).cast("double") /
            size(array_union(col("sha"), col("shb"))))
        .filter(col("jaccard") >= 0.9)
        .select(col("doc_a"), col("doc_b"))
    }, Some(
      s"""WITH dp AS ($duckDocsPlus),
         |sigs AS (SELECT doc_id, ${Similarity.minhashDuck("text", 9)} AS sig FROM dp),
         |bands AS (SELECT doc_id, j AS band,
         |    md5(sig[3*j+1] || sig[3*j+2] || sig[3*j+3]) AS band_key
         |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2]) AS j) u),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |sh AS (SELECT doc_id, list_distinct(${Similarity.shinglesDuck("text")}) AS sh FROM dp)
         |SELECT doc_a, doc_b FROM cand
         |  JOIN sh sa ON sa.doc_id = doc_a
         |  JOIN sh sb ON sb.doc_id = doc_b
         |WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.9""".stripMargin)),

    // ---- STREAMING near-dup pipeline, oracle-gated -----------------------
    // The transformWithState band-bucket dedup (streaming.StreamingDedup,
    // previously spec-gated only) as a full oracle entry: documents
    // arrive over a REAL multi-micro-batch file stream (4-way split,
    // maxFilesPerTrigger=1), candidate pairs accumulate across batches
    // through per-bucket member state, and the cumulative candidate set
    // -> exact Jaccard>=0.9 verify must hash-match the SAME DuckDB
    // oracle as the batch band self-join — the incremental operator
    // computes the batch answer independent of how the stream is
    // micro-batched.
    CatalogQuery("ddp_streaming_minhash_dedup", (s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val work = Q.scratch("sdd")
      val docs = docsPlus(s, d).select(col("doc_id"), col("text"))
      docs.repartition(4).write.mode("overwrite").parquet(s"$work/in")
      // transformWithState needs the multi-column-family state store;
      // the provider + changelog-checkpointing overrides live on a CLONED
      // session so nothing concurrent inherits them (the StreamingQueries
      // scoping discipline)
      val s2 = s.newSession()
      s2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      s2.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      val stream = s2.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$work/in")
      val pairs = graft.streaming.StreamingDedup.candidatePairs(stream)
        .toDF("doc_a", "doc_b")
      val q = pairs.writeStream
        .foreachBatch((b: DataFrame, _: Long) =>
          graft.core.AuditSeam.report("ddp_streaming_minhash_dedup/batch", b)
            .write.mode("append").parquet(s"$work/out"))
        .outputMode("update")
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val candidates = s.read.parquet(s"$work/out").distinct()
      val sh = docsPlus(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          expr(s"array_distinct(${Similarity.shinglesFromToks("toks")})").as("sh"))
      candidates
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
        .withColumn("jaccard",
          size(array_intersect(col("sha"), col("shb"))).cast("double") /
            size(array_union(col("sha"), col("shb"))))
        .filter(col("jaccard") >= 0.9)
        .select(col("doc_a"), col("doc_b"))
    }, Some(
      s"""WITH dp AS ($duckDocsPlus),
         |sigs AS (SELECT doc_id, ${Similarity.minhashDuck("text", 9)} AS sig FROM dp),
         |bands AS (SELECT doc_id, j AS band,
         |    md5(sig[3*j+1] || sig[3*j+2] || sig[3*j+3]) AS band_key
         |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2]) AS j) u),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |sh AS (SELECT doc_id, list_distinct(${Similarity.shinglesDuck("text")}) AS sh FROM dp)
         |SELECT doc_a, doc_b FROM cand
         |  JOIN sh sa ON sa.doc_id = doc_a
         |  JOIN sh sb ON sb.doc_id = doc_b
         |WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.9""".stripMargin)),

    // ---- dedup-pipeline evaluation against the planted ground truth ------
    // The harness KNOWS which near-dup pairs exist (every 10th doc is
    // re-inserted under id+1e6), so the whole LSH→verify pipeline gets an
    // eval harness: recall = recovered planted pairs / planted pairs,
    // plus the extra-pair count (organic near-dups surfaced beyond the
    // planted set — not false positives, every output pair passed the
    // exact Jaccard≥0.9 verify). The eval a production dedup run does
    // against a labeled sample before trusting the pipeline on 100 TB.
    CatalogQuery("ddp_dedup_eval", (s, d) => {
      // ONE pass over the expensive LSH->verify chain: flag each output
      // pair as planted-or-not via a left join, count both in one agg
      val recovered = Catalog.queries("ddp_near_dup_end2end")(s, d)
      val planted = docsPlus(s, d)
        .filter(col("doc_id") >= 1000000L)
        .select((col("doc_id") - 1000000L).as("doc_a"), col("doc_id").as("doc_b"))
      val counted = recovered
        .join(planted.withColumn("is_planted", lit(1L)), Seq("doc_a", "doc_b"), "left")
        // outer coalesce: sum over ZERO pairs is NULL, but the oracle's
        // scalar-subquery counts report 0 — the degenerate empty-pipeline
        // case must read n_recovered=0, recall=0.0, not NULL (advice r05)
        .agg(coalesce(sum(coalesce(col("is_planted"), lit(0L))), lit(0L)).as("n_recovered"),
          count(lit(1)).as("n_output_pairs"))
      planted.agg(count(lit(1)).as("n_planted"))
        .crossJoin(counted)
        .select(col("n_planted"), col("n_recovered"), col("n_output_pairs"),
          (col("n_recovered").cast("double") / col("n_planted")).as("recall"))
    }, Some(
      s"""WITH dp AS ($duckDocsPlus),
         |sigs AS (SELECT doc_id, ${Similarity.minhashDuck("text", 9)} AS sig FROM dp),
         |bands AS (SELECT doc_id, j AS band,
         |    md5(sig[3*j+1] || sig[3*j+2] || sig[3*j+3]) AS band_key
         |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2]) AS j) u),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |sh AS (SELECT doc_id, list_distinct(${Similarity.shinglesDuck("text")}) AS sh FROM dp),
         |recovered AS (
         |  SELECT doc_a, doc_b FROM cand
         |    JOIN sh sa ON sa.doc_id = doc_a
         |    JOIN sh sb ON sb.doc_id = doc_b
         |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |      / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.9),
         |planted AS (
         |  SELECT doc_id - 1000000 AS doc_a, doc_id AS doc_b FROM dp
         |  WHERE doc_id >= 1000000)
         |SELECT
         |  (SELECT count(*) FROM planted) AS n_planted,
         |  (SELECT count(*) FROM recovered r
         |     WHERE EXISTS (SELECT 1 FROM planted p
         |       WHERE p.doc_a = r.doc_a AND p.doc_b = r.doc_b)) AS n_recovered,
         |  (SELECT count(*) FROM recovered) AS n_output_pairs,
         |  CAST((SELECT count(*) FROM recovered r
         |     WHERE EXISTS (SELECT 1 FROM planted p
         |       WHERE p.doc_a = r.doc_a AND p.doc_b = r.doc_b)) AS DOUBLE)
         |    / (SELECT count(*) FROM planted) AS recall""".stripMargin)),

    // ---- near-dup clustering: connected components over candidate pairs --
    // Dedup pipelines need CLUSTERS, not pairs: each component of the
    // near-dup graph keeps one representative. Spark side = iterative
    // min-label propagation (each round: one equi-join + min-agg; rounds
    // bounded by component diameter — near-dup components are tiny), the
    // distributed CC shape that scales where union-find cannot; the
    // oracle is the declarative spec (recursive-CTE reachability).
    CatalogQuery("ddp_near_dup_components", (s, d) => {
      val pairs = Catalog.queries("ddp_minhash_lsh_pairs")(s, d)
      val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .cache()
      var labels = edges.select(col("src").as("v")).distinct()
        .withColumn("lbl", col("v")).cache()
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < 20) {
        val prop = edges.join(labels, col("dst") === col("v"))
          .groupBy(col("src")).agg(min(col("lbl")).as("nlbl"))
        // carry the changed flag INSIDE the iteration frame: one count()
        // both materializes the cache and measures convergence — a second
        // join-against-previous action would pay the propagation twice
        val next = labels.join(prop, col("v") === col("src"), "left")
          .select(col("v"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
            (coalesce(col("nlbl"), col("lbl")) < col("lbl")).as("__chg"))
          .cache()
        changed = next.filter(col("__chg")).count()
        labels.unpersist() // superseded iteration state must not pin storage
        labels = next
        iter += 1
      }
      edges.unpersist() // converged: candidate edges must not pin storage
      labels.select(col("v").as("doc_id"), col("lbl").as("cluster_id"))
    }, Some(
      s"""WITH dp AS ($duckDocsPlus),
         |sigs AS (SELECT doc_id, ${Similarity.minhashDuck("text", 9)} AS sig FROM dp),
         |bands AS (SELECT doc_id, j AS band,
         |    md5(sig[3*j+1] || sig[3*j+2] || sig[3*j+3]) AS band_key
         |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2]) AS j) u),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
         |  UNION ALL SELECT doc_b, doc_a FROM cand),
         |reach AS (
         |  WITH RECURSIVE r(src, dst) AS (
         |    SELECT src, dst FROM edges
         |    UNION
         |    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src)
         |  SELECT * FROM r)
         |SELECT v.src AS doc_id, least(v.src, min(r.dst)) AS cluster_id
         |FROM (SELECT DISTINCT src FROM edges) v
         |JOIN reach r ON r.src = v.src
         |GROUP BY v.src""".stripMargin)),

    // Dedup RETENTION policy on top of the components: per near-dup
    // cluster keep the best document (longest by n_chars, doc_id as the
    // deterministic tie-break) and account the token cost of dropping the
    // rest — the decision step a pipeline actually executes after
    // clustering (reference analogue: none — gravity replicates rows, it
    // never curates them; this is the training-data extension surface).
    // Scale shape: reuses the CC labels (already bucketed), one join to
    // doc stats, one window per cluster — all partitioned by cluster_id.
    CatalogQuery("ddp_canonical_doc_selection", (s, d) => {
      val comps = Catalog.queries("ddp_near_dup_components")(s, d)
      val stats = docsPlus(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        col("n_chars"))
      val w = Window.partitionBy("cluster_id")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      comps.join(stats, "doc_id")
        .withColumn("rn", row_number().over(w))
        .groupBy("cluster_id").agg(
          count(lit(1)).as("n_members"),
          max(when(col("rn") === 1, col("doc_id"))).as("canonical_doc"),
          sum(when(col("rn") === 1, col("n_tok")).otherwise(lit(0L)))
            .as("tokens_kept"),
          sum(when(col("rn") =!= 1, col("n_tok")).otherwise(lit(0L)))
            .as("tokens_dropped"))
    }, Some(
      s"""WITH dp AS ($duckDocsPlus),
         |sigs AS (SELECT doc_id, ${Similarity.minhashDuck("text", 9)} AS sig FROM dp),
         |bands AS (SELECT doc_id, j AS band,
         |    md5(sig[3*j+1] || sig[3*j+2] || sig[3*j+3]) AS band_key
         |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2]) AS j) u),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
         |  UNION ALL SELECT doc_b, doc_a FROM cand),
         |reach AS (
         |  WITH RECURSIVE r(src, dst) AS (
         |    SELECT src, dst FROM edges
         |    UNION
         |    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src)
         |  SELECT * FROM r),
         |comp AS (
         |  SELECT v.src AS doc_id, least(v.src, min(r.dst)) AS cluster_id
         |  FROM (SELECT DISTINCT src FROM edges) v
         |  JOIN reach r ON r.src = v.src
         |  GROUP BY v.src),
         |stats AS (
         |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok, n_chars
         |  FROM dp),
         |m AS (
         |  SELECT c.cluster_id, c.doc_id, st.n_tok,
         |    row_number() OVER (PARTITION BY c.cluster_id
         |      ORDER BY st.n_chars DESC, c.doc_id) AS rn
         |  FROM comp c JOIN stats st USING (doc_id))
         |SELECT cluster_id, count(*)::BIGINT AS n_members,
         |  max(CASE WHEN rn = 1 THEN doc_id END) AS canonical_doc,
         |  CAST(sum(CASE WHEN rn = 1 THEN n_tok ELSE 0 END) AS BIGINT)
         |    AS tokens_kept,
         |  CAST(sum(CASE WHEN rn <> 1 THEN n_tok ELSE 0 END) AS BIGINT)
         |    AS tokens_dropped
         |FROM m GROUP BY 1""".stripMargin)),

    // ---- text analysis ---------------------------------------------------
    CatalogQuery("txt_language_id", (s, d) => {
      val t = TextAnalysis.tokens(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"),
        size(t).cast("long").as("n_tokens"),
        TextAnalysis.stopwordRatio(col("text"), TextAnalysis.enishStopwords)
          .as("stop_ratio"),
        // the one shipped detector definition — txt_langid_confusion
        // scores exactly this predicate
        TextAnalysis.predLangEnish(col("text")).as("pred_lang"))
    }, Some(
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS stop_ratio,
        |  CASE WHEN CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE)
        |    / len(string_split(text, ' ')) >= 0.08 THEN 'enish' ELSE 'other' END AS pred_lang
        |FROM documents""".stripMargin)),

    // n-gram-profile language-ID (textcat style): score each doc's char
    // trigrams against per-language profiles, argmax wins. The profiles
    // here are tiny fixed lists (the harness corpus is synthetic); swap in
    // real top-k profiles per language in production — the scoring shape
    // (trigram explode → profile hit ratio → argmax) is the real part.
    CatalogQuery("txt_language_trigram", (s, d) => {
      val en = Seq("the", "he ", " th", "ing", "nd ", "er ", " a ", "on ", "at ")
      val zz = Seq("zzz", "qqq", "xxj")
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.trigramProfileScore(col("text"), en).as("en_score"),
        TextAnalysis.trigramProfileScore(col("text"), zz).as("zz_score"))
        .withColumn("pred_lang",
          when(col("en_score") > col("zz_score"), lit("en")).otherwise(lit("other")))
    }, Some(
      """WITH tg AS (
        |  SELECT doc_id,
        |    list_transform(range(1, length(text) - 1), i -> substring(text, CAST(i AS INT), 3)) AS tgs
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(tgs, t -> t IN ('the','he ',' th','ing','nd ','er ',' a ','on ','at '))) AS DOUBLE)
        |    / len(tgs) AS en_score,
        |  CAST(len(list_filter(tgs, t -> t IN ('zzz','qqq','xxj'))) AS DOUBLE)
        |    / len(tgs) AS zz_score,
        |  CASE WHEN CAST(len(list_filter(tgs, t -> t IN ('the','he ',' th','ing','nd ','er ',' a ','on ','at '))) AS DOUBLE) / len(tgs)
        |         > CAST(len(list_filter(tgs, t -> t IN ('zzz','qqq','xxj'))) AS DOUBLE) / len(tgs)
        |       THEN 'en' ELSE 'other' END AS pred_lang
        |FROM tg""".stripMargin)),

    CatalogQuery("txt_quality_scores", (s, d) => {
      val t = TextAnalysis.tokens(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.typeTokenRatio(t).as("ttr"),
        TextAnalysis.meanTokenLen(t).as("mean_tok_len"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
    }, Some(
      """SELECT doc_id,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS ttr,
        |  CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS mean_tok_len,
        |  0.3 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / len(string_split(text, ' ')))
        |  + 0.7 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0) AS quality
        |FROM documents""".stripMargin)),

    // ---- DPO preference-pair assembly ------------------------------------
    // Preference-pair mining, the data-assembly step DPO/RLHF reward
    // training consumes: within each candidate pool (source, lang) — the
    // "same prompt" grouping — rank documents by an integer quality
    // score (scaled type-token ratio + capped length; all-BIGINT so both
    // engines rank bit-identically, doc_id total-order ties), then pair
    // best-vs-worst: rank-i from the top against rank-i from the bottom
    // (mirrored tie-breaks so an odd pool's middle element never pairs
    // with itself), keep only pairs with strictly positive margin — the
    // degenerate all-equal pool yields nothing rather than zero-signal
    // pairs. Shape at 100 TB: one shuffle on the pool key, two
    // PARTITIONED rank windows, and a rank equi-join — no global window,
    // no cross product; pools scale independently.
    CatalogQuery("prep_dpo_pairs", (s, d) => {
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"),
          split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("source"), col("lang"),
          expr("""CAST(size(array_distinct(toks)) AS BIGINT) * 1000
                 |  div CAST(size(toks) AS BIGINT)
                 |  + least(CAST(size(toks) AS BIGINT), 100)""".stripMargin)
            .as("score"))
      val top = row_number().over(Window.partitionBy(col("source"), col("lang"))
        .orderBy(col("score").desc, col("doc_id").asc))
      val bot = row_number().over(Window.partitionBy(col("source"), col("lang"))
        .orderBy(col("score").asc, col("doc_id").desc))
      val a = scored.withColumn("pair_id", top.cast("long"))
        .select(col("source"), col("lang"), col("pair_id"),
          col("doc_id").as("chosen_doc"), col("score").as("chosen_score"))
      val b = scored.withColumn("pair_id", bot.cast("long"))
        .select(col("source"), col("lang"), col("pair_id"),
          col("doc_id").as("rejected_doc"), col("score").as("rejected_score"))
      val n = scored.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_pool"))
      a.join(b, Seq("source", "lang", "pair_id"))
        .join(n, Seq("source", "lang"))
        .filter(col("pair_id") <= expr("n_pool div 2") &&
          col("chosen_score") > col("rejected_score"))
        .select(col("source"), col("lang"), col("pair_id"),
          col("chosen_doc"), col("rejected_doc"), col("chosen_score"),
          col("rejected_score"),
          (col("chosen_score") - col("rejected_score")).as("margin"))
    }, Some(
      """WITH scored AS (
        |  SELECT doc_id, source, lang,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 1000
        |      // CAST(len(string_split(text, ' ')) AS BIGINT)
        |      + least(CAST(len(string_split(text, ' ')) AS BIGINT), 100) AS score
        |  FROM documents),
        |a AS (
        |  SELECT source, lang,
        |    CAST(row_number() OVER (PARTITION BY source, lang
        |      ORDER BY score DESC, doc_id ASC) AS BIGINT) AS pair_id,
        |    doc_id AS chosen_doc, score AS chosen_score
        |  FROM scored),
        |b AS (
        |  SELECT source, lang,
        |    CAST(row_number() OVER (PARTITION BY source, lang
        |      ORDER BY score ASC, doc_id DESC) AS BIGINT) AS pair_id,
        |    doc_id AS rejected_doc, score AS rejected_score
        |  FROM scored),
        |n AS (
        |  SELECT source, lang, count(*)::BIGINT AS n_pool
        |  FROM scored GROUP BY 1, 2)
        |SELECT source, lang, pair_id, chosen_doc, rejected_doc,
        |  chosen_score, rejected_score,
        |  chosen_score - rejected_score AS margin
        |FROM a JOIN b USING (source, lang, pair_id) JOIN n USING (source, lang)
        |WHERE pair_id <= n_pool // 2 AND chosen_score > rejected_score""".stripMargin)),

    // repetition filter (Gopher-style): fraction of DUPLICATE word
    // trigrams per doc — boilerplate/spam detection for pretraining
    // corpora. Short docs (< 3 tokens) score 1.0 (nothing to repeat);
    // the Spark side guards because sequence(1, n) runs DESCENDING for
    // n < 1 (DuckDB's range is already empty there).
    CatalogQuery("txt_repetition_score", (s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      base.select(
        col("doc_id"),
        expr(
          s"""CASE WHEN size(toks) >= 3 THEN
             |  CAST(size(array_distinct(${Similarity.shinglesFromToks("toks")})) AS DOUBLE)
             |    / (size(toks) - 2)
             |ELSE 1.0 END""".stripMargin).as("uniq_trigram_ratio"))
        .withColumn("repetitive", col("uniq_trigram_ratio") < 0.7)
    }, Some(
      s"""SELECT doc_id,
         |  CASE WHEN len(string_split(text, ' ')) >= 3 THEN
         |    CAST(len(list_distinct(${Similarity.shinglesDuck("text")})) AS DOUBLE)
         |      / (len(string_split(text, ' ')) - 2)
         |  ELSE 1.0 END AS uniq_trigram_ratio,
         |  CASE WHEN len(string_split(text, ' ')) >= 3 THEN
         |    CAST(len(list_distinct(${Similarity.shinglesDuck("text")})) AS DOUBLE)
         |      / (len(string_split(text, ' ')) - 2)
         |  ELSE 1.0 END < 0.7 AS repetitive
         |FROM documents""".stripMargin)),

    // PII scrub: redact emails and bare URLs before training (the
    // standard corpus-cleaning pass). The regexes stay in the common
    // Java-regex/RE2 subset so Spark and DuckDB agree byte-for-byte;
    // emails are planted deterministically on doc_id % 10 == 0 so the
    // scrub provably fires. Entirely codegen'd regexp_replace — at
    // 100 TB this is a projection, no shuffle.
    CatalogQuery("txt_pii_scrub", (s, d) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val urlRe = "https?://[^ ]+"
      val planted = when(col("doc_id") % 10 === 0,
        concat(col("text"), lit(" contact bob.smith+x@example.org or https://ex.org/a?b=1 now")))
        .otherwise(col("text"))
      Tables.documents(s, d).select(col("doc_id"), planted.as("raw"))
        .select(col("doc_id"),
          regexp_replace(regexp_replace(col("raw"), emailRe, "<EMAIL>"),
            urlRe, "<URL>").as("clean"))
        .withColumn("was_scrubbed", col("clean").contains("<EMAIL>") || col("clean").contains("<URL>"))
    }, Some(
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0
        |      THEN text || ' contact bob.smith+x@example.org or https://ex.org/a?b=1 now'
        |      ELSE text END AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^ ]+', '<URL>', 'g') AS clean,
        |  (regexp_replace(regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^ ]+', '<URL>', 'g') LIKE '%<EMAIL>%'
        |   OR regexp_replace(regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^ ]+', '<URL>', 'g') LIKE '%<URL>%') AS was_scrubbed
        |FROM planted""".stripMargin)),

    CatalogQuery("txt_token_stats", (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("ws_tokens"),
        TextAnalysis.bpeishCount(col("text")).cast("long").as("bpeish_tokens"),
        length(col("text")).cast("long").as("n_chars_txt")),
      Some(
        """SELECT doc_id,
          |  len(string_split(text, ' ')) AS ws_tokens,
          |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpeish_tokens,
          |  length(text) AS n_chars_txt
          |FROM documents""".stripMargin)),

    // ---- the corpus-cleaning pipeline as ONE composition -----------------
    // What a pretraining data engineer actually runs: exact dedup
    // (keep-first) -> language gate -> repetition gate -> length gate,
    // emitting survivors with their quality measurements. Every predicate
    // reuses the exact expression shape of its standalone gated entry, so
    // the composition's oracle is the same CTE chain — this gates that
    // the operators COMPOSE, not just that each works alone.
    CatalogQuery("txt_corpus_clean_pipeline", (s, d) => {
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val deduped = docsPlus(s, d)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      val toks = split(col("text"), " ")
      val measured = deduped.select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        TextAnalysis.stopwordRatio(col("text"), Seq("the", "a")).as("stop_ratio"),
        toks.as("toks"))
        .withColumn("uniq_trigram_ratio", expr(
          s"""CASE WHEN size(toks) >= 3 THEN
             |  CAST(size(array_distinct(${Similarity.shinglesFromToks("toks")})) AS DOUBLE)
             |    / (size(toks) - 2)
             |ELSE 1.0 END""".stripMargin))
        .drop("toks")
      measured
        .filter(col("stop_ratio") >= 0.08) // language gate (enish)
        .filter(col("uniq_trigram_ratio") >= 0.7) // repetition gate
        .filter(col("n_tokens") >= 5 && col("n_tokens") <= 100000) // length gate
    }, Some(
      s"""WITH dp AS ($duckDocsPlus),
         |deduped AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM dp) t WHERE rn = 1),
         |measured AS (
         |  SELECT doc_id,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS stop_ratio,
         |    CASE WHEN len(string_split(text, ' ')) >= 3 THEN
         |      CAST(len(list_distinct(${Similarity.shinglesDuck("text")})) AS DOUBLE)
         |        / (len(string_split(text, ' ')) - 2)
         |    ELSE 1.0 END AS uniq_trigram_ratio
         |  FROM deduped)
         |SELECT doc_id, n_tokens, stop_ratio, uniq_trigram_ratio
         |FROM measured
         |WHERE stop_ratio >= 0.08
         |  AND uniq_trigram_ratio >= 0.7
         |  AND n_tokens BETWEEN 5 AND 100000""".stripMargin)),

    // rolling-hash fingerprint — graft's custom codegen Expression. The
    // oracle folds the same UTF-8 BYTES (Similarity.rollingHashDuck), and
    // the planted multibyte suffix proves the byte-exactness is gated,
    // not assumed.
    CatalogQuery("txt_fingerprint_rolling", (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        GraftFunctions.rolling_hash(concat(col("text"), lit(" ß中é"),
          (col("doc_id") % 7).cast("string"))).as("fingerprint")),
      Some(
        s"""SELECT doc_id,
          |  ${Similarity.rollingHashDuck("text || ' ß中é' || (doc_id % 7)::VARCHAR")} AS fingerprint
          |FROM documents""".stripMargin)),

    // ---- deterministic sampling (the 100 TB-safe method) -----------------
    // consistent hash-mod sampling: reproducible across runs/engines, no
    // coordination, stable under re-partitioning — unlike rand() sampling
    CatalogQuery("smp_hash_sample_12pct", (s, d) =>
      Tables.documents(s, d)
        .filter( // first md5 hex digit < 2 => 2/16 = 12.5% deterministic sample
          expr("instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1 < 2"))
        .select(col("doc_id"), col("lang"), col("n_chars")),
      Some(
        """SELECT doc_id, lang, n_chars FROM documents
          |WHERE strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR), 1, 1)) - 1 < 2""".stripMargin)),

    // stratified deterministic sample: first 10 docs per language by hash
    // order (reproducible stratified sampling for training mixes)
    CatalogQuery("smp_stratified_per_lang", (s, d) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .select(col("lang"), col("doc_id"))
    }, Some(
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
        |  FROM documents) t WHERE rn <= 10""".stripMargin)),

    // histogram of document lengths (data-quality profile op)
    CatalogQuery("txt_length_histogram", (s, d) =>
      Tables.documents(s, d)
        .groupBy((col("n_chars") / 100).cast("long").as("bucket_100"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars")),
      Some(
        """SELECT CAST(n_chars // 100 AS BIGINT) AS bucket_100, count(*) AS n_docs,
          |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
          |FROM documents GROUP BY 1""".stripMargin)),

    // ---- multimodal: image pipeline (REAL decode + exact resize) ---------
    // Genuinely decoded pixels: the staged binary column holds real PNGs
    // (javax.imageio), the decode stage reads them back through the real
    // codec, resizes nearest-neighbor, and the oracle re-derives the
    // SAME stats from the closed-form pixel source in pure SQL — an
    // encode bug, a decode bug, or a non-exact resize all hash-mismatch.
    CatalogQuery("mm_image_resize", mmImageResize, Some(
      """WITH dims AS (
        |  SELECT doc_id, n_chars % 48 + 8 AS w, n_chars % 32 + 8 AS h,
        |    (n_chars % 32 + 8) * 16 // (n_chars % 48 + 8) AS oh
        |  FROM documents)
        |SELECT doc_id, CAST(w AS BIGINT) AS src_w, CAST(h AS BIGINT) AS src_h,
        |  CAST(16 AS BIGINT) AS out_w, CAST(oh AS BIGINT) AS out_h,
        |  CAST(list_sum(list_transform(range(0, 16 * oh),
        |    p -> (doc_id * 31 + ((p % 16) * w // 16) * 7 + ((p // 16) * h // oh) * 13) % 256)) AS BIGINT) AS r_sum,
        |  CAST(list_sum(list_transform(range(0, 16 * oh),
        |    p -> (doc_id * 17 + ((p % 16) * w // 16) * 11 + ((p // 16) * h // oh) * 5) % 256)) AS BIGINT) AS g_sum,
        |  CAST(list_sum(list_transform(range(0, 16 * oh),
        |    p -> (doc_id * 29 + ((p % 16) * w // 16) * 3 + ((p // 16) * h // oh) * 19) % 256)) AS BIGINT) AS b_sum
        |FROM dims""".stripMargin)),

    // ---- multimodal: video frame sampling (container demux + decode) -----
    // "Video" = a length-prefixed container of real PNG frames; the demux
    // parses the container, SKIPS frames off-stride without decoding them
    // (the selective-decode shape of real keyframe extraction), and
    // decodes every 3rd frame through javax.imageio.
    CatalogQuery("mm_frame_sample", mmFrameSample, Some(
      """SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(list_sum(list_transform(range(0, 64),
        |    p -> (doc_id * 31 + f * 41 + (p % 8) * 7 + (p // 8) * 13) % 256)) AS BIGINT) AS r_sum,
        |  CAST(list_sum(list_transform(range(0, 64),
        |    p -> (doc_id * 17 + f * 23 + (p % 8) * 11 + (p // 8) * 5) % 256)) AS BIGINT) AS g_sum,
        |  CAST(list_sum(list_transform(range(0, 64),
        |    p -> (doc_id * 29 + f * 37 + (p % 8) * 3 + (p // 8) * 19) % 256)) AS BIGINT) AS b_sum
        |FROM documents
        |CROSS JOIN (SELECT unnest(range(0, 10000)) AS f) u
        |WHERE f < n_chars % 24 + 4 AND f % 3 = 0""".stripMargin)),

    // ---- multimodal: audio pipeline (REAL WAV decode) --------------------
    // The audio twin of the PNG battery: staged binary column of genuine
    // RIFF/WAVE bytes (deterministic integer PCM source →
    // javax.sound.sampled encoder), decoded back through the real JDK
    // codec in partition batches; the oracle evaluates the closed-form
    // sample source independently, so a lossy encode, a wrong container
    // parse, or a sample-order bug all hash-mismatch.
    CatalogQuery("mm_audio_features", mmAudio, Some(
      """SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(n_chars % 2000 + 100 AS BIGINT) AS n_samples,
        |  CAST(list_sum(list_transform(range(0, n_chars % 2000 + 100),
        |    i -> (doc_id * 73 + i * 131) % 65536 - 32768)) AS BIGINT) AS sum_s,
        |  CAST(list_sum(list_transform(range(0, n_chars % 2000 + 100),
        |    i -> abs((doc_id * 73 + i * 131) % 65536 - 32768))) AS BIGINT) AS sum_abs,
        |  CAST(list_max(list_transform(range(0, n_chars % 2000 + 100),
        |    i -> abs((doc_id * 73 + i * 131) % 65536 - 32768))) AS BIGINT) AS peak
        |FROM documents""".stripMargin)),

    // ---- multimodal binary features (real PNG round-trip) ----------------
    CatalogQuery("mm_binary_features", mmBinary, Some(
      """SELECT doc_id,
        |  CAST(n_chars % 48 + 8 AS BIGINT) AS width,
        |  CAST(n_chars % 32 + 8 AS BIGINT) AS height,
        |  CAST(list_sum(list_transform(range(0, (n_chars % 48 + 8) * (n_chars % 32 + 8)),
        |    p -> (doc_id * 31 + (p % (n_chars % 48 + 8)) * 7 + (p // (n_chars % 48 + 8)) * 13) % 256)) AS BIGINT) AS r_sum,
        |  CAST(list_sum(list_transform(range(0, (n_chars % 48 + 8) * (n_chars % 32 + 8)),
        |    p -> (doc_id * 17 + (p % (n_chars % 48 + 8)) * 11 + (p // (n_chars % 48 + 8)) * 5) % 256)) AS BIGINT) AS g_sum,
        |  CAST(list_sum(list_transform(range(0, (n_chars % 48 + 8) * (n_chars % 32 + 8)),
        |    p -> (doc_id * 29 + (p % (n_chars % 48 + 8)) * 3 + (p // (n_chars % 48 + 8)) * 19) % 256)) AS BIGINT) AS b_sum
        |FROM documents""".stripMargin), bench = true),

    // ---- VLM sample assembly (interleaved image-text packing) ------------
    // The multimodal capstone: every document becomes an interleaved
    // training sample — an image span of <img> + one placeholder token
    // per 4×4 ViT patch + </img>, followed by its text tokens — and the
    // samples pack into fixed 2048-token sequences (prep_pack_sequences'
    // shard/bin contiguous fill, seeded md5 order). Per (shard, bin) the
    // entry emits cu_seqlens (cumulative segment offsets, leading 0) and
    // the modality of every span — the attention-layout artifact a VLM
    // trainer consumes (cross-doc attention masked at cu boundaries,
    // image spans routed to the vision tower). The patch count derives
    // from the REAL decoded PNG dims (javax.imageio over the staged
    // binary column) while the oracle re-derives it from the closed-form
    // dims — a decode bug breaks the hash. 100 TB: decode is the batched
    // mapPartitions codec seam; packing is the per-shard prefix sum (no
    // partition sees more than 1/K of the corpus); the per-bin windows
    // are partitioned by (shard, bin).
    CatalogQuery("prep_vlm_pack", (s, d) => {
      import s.implicits._
      val dims = stagedPngs(s, d).as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.grouped(64).flatMap(_.map { case (id, png) =>
            val img = ImageCodec.decodePng(png)
            (id, img.getWidth.toLong, img.getHeight.toLong)
          })
        }.toDF("doc_id", "w", "h")
      val segs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_text"))
        .join(dims, "doc_id")
        .withColumn("n_img", expr("((w + 3) div 4) * ((h + 3) div 4) + 2"))
        .withColumn("total", col("n_img") + col("n_text"))
        .withColumn("k", md5(concat(lit("vlm|"), col("doc_id").cast("string"))))
        .withColumn("shard",
          ((expr("instr('0123456789abcdef', substr(k, 1, 1))") - 1) % 8)
            .cast("long"))
      val wPack = Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val binned = segs
        .withColumn("cum_before", coalesce(sum(col("total")).over(wPack), lit(0L)))
        .withColumn("bin", expr("cum_before div 2048"))
      val exploded = binned.select(col("shard"), col("bin"), col("k"),
          col("doc_id"), explode(expr(
            """array(struct(CAST(0 AS INT) AS seg, n_img AS len),
              |      struct(CAST(1 AS INT) AS seg, n_text AS len))""".stripMargin))
            .as("sg"))
        .select(col("shard"), col("bin"), col("k"), col("doc_id"),
          col("sg.seg").as("seg"), col("sg.len").as("len"))
      val wCu = Window.partitionBy(col("shard"), col("bin"))
        .orderBy(col("k"), col("doc_id"), col("seg"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      exploded.withColumn("cu", sum(col("len")).over(wCu))
        .groupBy(col("shard"), col("bin"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          sum(col("len")).as("n_tokens"),
          concat(lit("0,"), array_join(expr(
            "transform(array_sort(collect_list(struct(k, doc_id, seg, cu))), p -> CAST(p.cu AS STRING))"),
            ",")).as("cu_seqlens"),
          array_join(expr(
            """transform(array_sort(collect_list(struct(k, doc_id, seg,
              |  CASE WHEN seg = 0 THEN 'img' ELSE 'txt' END AS m))), p -> p.m)""".stripMargin),
            ",").as("modalities"))
    }, Some(
      """WITH dims AS (
        |  SELECT doc_id, n_chars % 48 + 8 AS w, n_chars % 32 + 8 AS h,
        |    len(string_split(text, ' '))::BIGINT AS n_text
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, n_text,
        |    CAST(((w + 3) // 4) * ((h + 3) // 4) + 2 AS BIGINT) AS n_img,
        |    md5('vlm|' || doc_id::VARCHAR) AS k,
        |    ((strpos('0123456789abcdef', substring(md5('vlm|' || doc_id::VARCHAR), 1, 1)) - 1) % 8)::BIGINT AS shard
        |  FROM dims),
        |c AS (
        |  SELECT *, coalesce(sum(n_img + n_text) OVER (PARTITION BY shard
        |      ORDER BY k, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
        |  FROM sh),
        |b AS (SELECT *, cum_before // 2048 AS bin FROM c),
        |segs AS (
        |  SELECT shard, bin, k, doc_id, u.seg,
        |    CASE WHEN u.seg = 0 THEN n_img ELSE n_text END AS len
        |  FROM b CROSS JOIN (SELECT unnest(range(0, 2)) AS seg) u),
        |cu AS (
        |  SELECT shard, bin, k, doc_id, seg, len,
        |    CAST(sum(len) OVER (PARTITION BY shard, bin ORDER BY k, doc_id, seg
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cu
        |  FROM segs)
        |SELECT shard, bin, count(DISTINCT doc_id)::BIGINT AS n_docs,
        |  CAST(sum(len) AS BIGINT) AS n_tokens,
        |  '0,' || string_agg(cu::VARCHAR, ',' ORDER BY k, doc_id, seg) AS cu_seqlens,
        |  string_agg(CASE WHEN seg = 0 THEN 'img' ELSE 'txt' END, ','
        |    ORDER BY k, doc_id, seg) AS modalities
        |FROM cu GROUP BY 1, 2""".stripMargin))
  )

  /** Opaque-binary pipeline, REAL codec: documents are staged as a binary
    * column holding genuine PNG bytes (deterministic pixel source →
    * javax.imageio encoder), then a SEPARATE decode stage reads the
    * column back through ImageIO and derives stats from the decoded
    * pixels. Nothing flows from synthesis to stats except the bytes: a
    * lossy encode, a wrong decode, or a drifted resize all diverge from
    * the oracle's closed-form re-derivation. Decode runs in fixed-size
    * batches inside mapPartitions — the seam where a vectorized /
    * hardware codec sits at 100 TB (per-task codec reuse, no driver
    * bytes, partition-parallel).
    */
  private def stagedPngs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // single-row-group input: spread the scan before the codec work so
    // encode/decode parallelizes (identity on any multi-split input)
    Tables.spread(Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars").cast("int").as("nc")))
      .as[(Long, Int)]
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.map { case (id, nc) =>
          val w = nc % 48 + 8
          val h = nc % 32 + 8
          (id, ImageCodec.encodePng(ImageCodec.synthImage(id, 0L, w, h)))
        })
      }
      .toDF("doc_id", "payload") // the opaque multimodal binary column
  }

  private def mmImageResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    stagedPngs(s, d).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.map { case (id, png) =>
          val img = ImageCodec.decodePng(png)
          val (w, h) = (img.getWidth, img.getHeight)
          val outW = 16
          val outH = h * outW / w // aspect-preserving, floor
          val (r, g, b) =
            ImageCodec.channelSums(ImageCodec.resizeNearest(img, outW, outH))
          (id, w.toLong, h.toLong, outW.toLong, outH.toLong, r, g, b)
        })
      }
      .toDF("doc_id", "src_w", "src_h", "out_w", "out_h",
        "r_sum", "g_sum", "b_sum")
  }

  /** Frame sampling over the toy length-prefixed PNG container: the demux
    * walks the length prefixes (never decoding skipped frames) and
    * ImageIO-decodes every 3rd frame — real container parsing + real
    * selective decode.
    */
  private def mmFrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val staged = Tables.spread(Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars").cast("int").as("nc")))
      .as[(Long, Int)]
      .mapPartitions { it =>
        it.map { case (id, nc) =>
          val nFrames = nc % 24 + 4
          (id, ImageCodec.packFrames((0 until nFrames).map(f =>
            ImageCodec.encodePng(ImageCodec.synthImage(id, f.toLong, 8, 8)))))
        }
      }
      .toDF("doc_id", "payload")
    staged.as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        ImageCodec.unpackFrames(payload).collect {
          case (f, png) if f % 3 == 0 =>
            val (r, g, b) = ImageCodec.channelSums(ImageCodec.decodePng(png))
            (id, f.toLong, r, g, b)
        }
      }
      .toDF("doc_id", "frame_idx", "r_sum", "g_sum", "b_sum")
  }

  private def mmAudio(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val staged = Tables.spread(Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars").cast("int").as("nc")))
      .as[(Long, Int)]
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.map { case (id, nc) =>
          val n = nc % 2000 + 100
          (id, AudioCodec.encodeWav(
            Array.tabulate(n)(i => AudioCodec.synthSample(id, i))))
        })
      }
      .toDF("doc_id", "payload") // opaque audio binary column
    staged.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.map { case (id, wav) =>
          val (rate, ss) = AudioCodec.decodeWav(wav)
          var sum = 0L
          var sabs = 0L
          var peak = 0L
          ss.foreach { v =>
            sum += v
            val a = math.abs(v.toLong)
            sabs += a
            if (a > peak) peak = a
          }
          (id, rate.toLong, ss.length.toLong, sum, sabs, peak)
        })
      }
      .toDF("doc_id", "sample_rate", "n_samples", "sum_s", "sum_abs", "peak")
  }

  private def mmBinary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    stagedPngs(s, d).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.map { case (id, png) =>
          val img = ImageCodec.decodePng(png)
          val (r, g, b) = ImageCodec.channelSums(img)
          (id, img.getWidth.toLong, img.getHeight.toLong, r, g, b)
        })
      }
      .toDF("doc_id", "width", "height", "r_sum", "g_sum", "b_sum")
  }
}
