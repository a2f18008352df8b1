package graft.analytics

import graft.core.Tables
import graft.functions.{GraftFunctions, Similarity, TarArchive}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifth training-data battery: the batch-prep operators that turn a
  * cleaned corpus into a training run's actual input — sequence packing
  * into fixed token budgets, leakage-safe train/val splitting (split at
  * dedup-cluster granularity so a duplicate can never straddle the
  * boundary), deterministic seeded shuffling, mixture reweighting
  * (sample-proportional-to-size^alpha), a corpus bigram language model
  * scoring per-document predictability (the classic boilerplate /
  * gibberish filter), per-label embedding centroid outlier detection,
  * and an ordered event funnel.
  *
  * Scale shapes, in order: packing is a windowed prefix sum PARTITIONED
  * BY SHARD (the md5 shard key bounds every window partition to 1/K of
  * the corpus — never a global single-partition sort); the split and the
  * shuffle are pure projections on md5 keys; mixture weights aggregate to
  * one row per source (bounded by the source vocabulary, not the corpus);
  * the bigram LM's count tables are bounded by vocabulary squared, so at
  * 100 TB they stay broadcast-sized while the corpus side is one linear
  * scan (no hint — AQE size-gates); centroids are an explode → groupBy
  * (label, dim) linear shuffle, and the centroid table (labels × dims) is
  * again vocabulary-bounded; the funnel is three conditional min-
  * aggregations over the same scan, joined per user on the grouping key.
  *
  * Cross-engine determinism: every output column is integer, string, or
  * an integer-scaled ratio (`x * 10^9 div y` — exact integer division on
  * both engines); the only doubles are IEEE-exact operations (division,
  * sqrt, exact-midpoint percentile interpolation) rounded once at the
  * end, the same discipline as the rest of the catalog.
  */
object PrepQueries {

  /** Same synthetic-dup view as TrainingQueries: every 10th doc unioned
    * back under id + 1_000_000 so dedup-shaped ops have real duplicates.
    */
  private def docsPlus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
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

  def all: Seq[CatalogQuery] = Seq(

    // ---- sequence packing ------------------------------------------------
    // Pack documents into fixed 2048-token training sequences: shuffle
    // order comes from a seeded md5 key, the key's first hex digit picks
    // one of 8 independent packing shards, and within a shard a document
    // lands in bin floor(tokens-before-it / budget) — the standard
    // contiguous-fill approximation of first-fit (exactly reproducible,
    // no sequential bin state). The window prefix sum is PER SHARD, so no
    // single ordered partition ever sees more than 1/K of the corpus.
    // K = 8 here so the oracle stays small; it is pure config — a
    // production run sets K to a multiple of the executor count so each
    // packer partition stays at a bounded fraction of the data.
    CatalogQuery("prep_pack_sequences", (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          md5(concat(lit("pack|"), col("doc_id").cast("string"))).as("k"))
        .withColumn("shard",
          ((expr("instr('0123456789abcdef', substr(k, 1, 1))") - 1) % 8)
            .cast("long"))
      val w = Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs
        .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("bin", expr("cum_before div 2048"))
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    }, Some(
      """WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok,
        |    md5('pack|' || doc_id::VARCHAR) AS k
        |  FROM documents),
        |sh AS (
        |  SELECT *, ((strpos('0123456789abcdef', substring(k, 1, 1)) - 1) % 8)::BIGINT AS shard
        |  FROM t),
        |c AS (
        |  SELECT shard, n_tok,
        |    coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY k, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
        |  FROM sh)
        |SELECT shard, cum_before // 2048 AS bin,
        |  count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens
        |FROM c GROUP BY 1, 2""".stripMargin)),

    // ---- capstone: CDC-replicated corpus → training batch ----------------
    // The whole engine in one entry: a documents CHANGE LOG (inserts +
    // duplicate-copy inserts + text revisions + deletes) is LWW-compacted
    // per key (the CDC scheduler semantics), exact-deduped keep-first,
    // length-gated, and packed into 2048-token shard/bin sequences — CDC
    // replication feeding the training-batch prep as one dataflow, gated
    // by one CTE-chain oracle. Every stage keeps the scale shape of its
    // standalone entry (hash shuffles on doc_id / md5(text) / shard).
    CatalogQuery("cdc_corpus_training_batch", (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val log = docs
        .select((col("doc_id") * 10).as("seq"), lit("insert").as("op"),
          col("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") * 10).as("seq"), lit("insert").as("op"),
            (col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") * 10 + 1).as("seq"), lit("update").as("op"),
            col("doc_id"), concat(col("text"), lit(" updated revision")).as("text")))
        .unionByName(docs.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") * 10 + 2).as("seq"), lit("delete").as("op"),
            col("doc_id"), col("text")))
      val wLww = Window.partitionBy(col("doc_id")).orderBy(col("seq").desc)
      val live = log.withColumn("rn", row_number().over(wLww))
        .filter(col("rn") === 1 && col("op") =!= "delete")
        .select(col("doc_id"), col("text"))
      val wDedup = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val deduped = live.withColumn("rn", row_number().over(wDedup))
        .filter(col("rn") === 1)
      val gated = deduped
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          md5(concat(lit("pack|"), col("doc_id").cast("string"))).as("k"))
        .filter(col("n_tok") >= 5)
        .withColumn("shard",
          ((expr("instr('0123456789abcdef', substr(k, 1, 1))") - 1) % 8)
            .cast("long"))
      val wPack = Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      gated
        .withColumn("cum_before", coalesce(sum(col("n_tok")).over(wPack), lit(0L)))
        .withColumn("bin", expr("cum_before div 2048"))
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    }, Some(
      """WITH log AS (
        |  SELECT doc_id*10 AS seq, 'insert' AS op, doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id*10, 'insert', doc_id + 1000000, text
        |  FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id*10+1, 'update', doc_id, text || ' updated revision'
        |  FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id*10+2, 'delete', doc_id, text
        |  FROM documents WHERE doc_id % 13 = 0),
        |live AS (
        |  SELECT doc_id, text FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
        |    FROM log) t
        |  WHERE rn = 1 AND op <> 'delete'),
        |deduped AS (
        |  SELECT doc_id, text FROM (
        |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM live) t
        |  WHERE rn = 1),
        |gated AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok,
        |    md5('pack|' || doc_id::VARCHAR) AS k
        |  FROM deduped
        |  WHERE len(string_split(text, ' ')) >= 5),
        |sh AS (
        |  SELECT *, ((strpos('0123456789abcdef', substring(k, 1, 1)) - 1) % 8)::BIGINT AS shard
        |  FROM gated),
        |c AS (
        |  SELECT shard, n_tok,
        |    coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY k, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
        |  FROM sh)
        |SELECT shard, cum_before // 2048 AS bin,
        |  count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens
        |FROM c GROUP BY 1, 2""".stripMargin)),

    // ---- training-batch manifest checksums ------------------------------
    // The reproducibility artifact for a packed batch: per (shard, bin),
    // an md5 over the ORDERED doc-id list. Re-running the pipeline on any
    // cluster size must reproduce these exactly (the whole point of the
    // deterministic shuffle + packing); a checksum mismatch pinpoints the
    // first divergent bin. Aggregation state is one bin's doc list —
    // bounded by the token budget, never the corpus.
    CatalogQuery("prep_bin_manifest_checksums", (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          md5(concat(lit("pack|"), col("doc_id").cast("string"))).as("k"))
        .withColumn("shard",
          ((expr("instr('0123456789abcdef', substr(k, 1, 1))") - 1) % 8)
            .cast("long"))
      val w = Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs
        .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("bin", expr("cum_before div 2048"))
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          collect_list(struct(col("k"), col("doc_id"))).as("members"))
        .select(col("shard"), col("bin"), col("n_docs"),
          md5(array_join(
            expr("transform(array_sort(members), x -> CAST(x.doc_id AS STRING))"),
            ",")).as("manifest_md5"))
    }, Some(
      """WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok,
        |    md5('pack|' || doc_id::VARCHAR) AS k
        |  FROM documents),
        |sh AS (
        |  SELECT *, ((strpos('0123456789abcdef', substring(k, 1, 1)) - 1) % 8)::BIGINT AS shard
        |  FROM t),
        |c AS (
        |  SELECT shard, doc_id, k, n_tok,
        |    coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY k, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
        |  FROM sh)
        |SELECT shard, cum_before // 2048 AS bin, count(*)::BIGINT AS n_docs,
        |  md5(string_agg(doc_id::VARCHAR, ',' ORDER BY k, doc_id)) AS manifest_md5
        |FROM c GROUP BY 1, 2""".stripMargin)),

    // ---- leakage-safe split ---------------------------------------------
    // Train/val split decided PER DEDUP CLUSTER (md5(text)), not per row:
    // exact duplicates always land on the same side, so the val set can
    // never leak training text. Runs over the dup-augmented view so the
    // property is exercised (n_docs > n_clusters on both sides). The
    // split hash is seeded independently of the cluster key (md5 of
    // 'split|' + cluster) — re-seeding reshuffles the split without
    // touching cluster identity. 13/16 ≈ 81% train.
    CatalogQuery("smp_cluster_safe_split", (s, d) =>
      docsPlus(s, d)
        .withColumn("cluster", md5(col("text")))
        .withColumn("split",
          when(expr("instr('0123456789abcdef', substr(md5(concat('split|', cluster)), 1, 1)) - 1") < 13,
            lit("train")).otherwise(lit("val")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster")).as("n_clusters")),
      Some(
        s"""WITH dp AS ($duckDocsPlus),
           |cl AS (
           |  SELECT CASE WHEN strpos('0123456789abcdef',
           |      substring(md5('split|' || md5(text)), 1, 1)) - 1 < 13
           |    THEN 'train' ELSE 'val' END AS split,
           |    md5(text) AS cluster
           |  FROM dp)
           |SELECT split, count(*)::BIGINT AS n_docs,
           |  count(DISTINCT cluster)::BIGINT AS n_clusters
           |FROM cl GROUP BY 1""".stripMargin)),

    // ---- entity-grouped k-fold assignment --------------------------------
    // The CONSTRUCTION side of the leakage pair (qa_split_leakage detects;
    // this builds): cross-validation folds decided per ENTITY (customer),
    // never per row, so all of an entity's rows land in one fold and no
    // fold ever trains on a validation entity's siblings. Fold = keyed
    // md5 of the group key mod k (re-seeding via the 'fold3|' prefix
    // reshuffles folds without touching group identity, the
    // smp_cluster_safe_split discipline). The leak check is computed at
    // ROW level and gated in the output — a bug that hashed the row key
    // instead of the group key would flip leak_free, not just skew
    // counts. Shape: one groupBy on the group key + one on fold; the two
    // 1-row aggregates broadcast (documented bounded crosses).
    CatalogQuery("smp_group_kfold", (s, d) => {
      val rows = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"))
        .withColumn("fold", expr(
          "pmod(CAST(conv(substr(md5(concat('fold3|', CAST(o_custkey AS STRING))), 1, 8), 16, 10) AS BIGINT), 5)"))
      val tot = rows.agg(count(lit(1)).as("n_tot"))
      val leakFree = rows.groupBy(col("o_custkey"))
        .agg(countDistinct(col("fold")).as("nf"))
        .agg((max(col("nf")) === 1).as("leak_free"))
      rows.groupBy(col("fold"))
        .agg(countDistinct(col("o_custkey")).as("n_groups"),
          count(lit(1)).as("n_rows"))
        .crossJoin(tot).crossJoin(leakFree)
        .select(col("fold"), col("n_groups"), col("n_rows"),
          expr("n_rows * 1000000 div n_tot").as("row_ppm"), col("leak_free"))
    }, Some(
      """WITH r AS (
        |  SELECT o_orderkey, o_custkey,
        |    ('0x' || substr(md5('fold3|' || CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT % 5 AS fold
        |  FROM orders),
        |tot AS (SELECT count(*)::BIGINT AS n_tot FROM r),
        |lf AS (
        |  SELECT max(nf) = 1 AS leak_free FROM (
        |    SELECT o_custkey, count(DISTINCT fold) AS nf FROM r GROUP BY 1) t)
        |SELECT fold, count(DISTINCT o_custkey)::BIGINT AS n_groups,
        |  count(*)::BIGINT AS n_rows,
        |  count(*)::BIGINT * 1000000 // n_tot AS row_ppm,
        |  leak_free
        |FROM r CROSS JOIN tot CROSS JOIN lf
        |GROUP BY fold, n_tot, leak_free""".stripMargin)),

    // ---- deterministic seeded shuffle -----------------------------------
    // Global training order as a pure function of (seed, doc_id): shard =
    // first hex digit of the keyed md5 mod 16, position = rank within the
    // shard by the same key. Changing the seed string reshuffles
    // everything; same seed replays the identical order on any cluster
    // size (the property that makes a training run resumable). Checked on
    // the first 3 positions of every shard.
    CatalogQuery("smp_deterministic_shuffle", (s, d) => {
      val keyed = Tables.documents(s, d)
        .withColumn("k", md5(concat(lit("shuf7|"), col("doc_id").cast("string"))))
        .withColumn("shard",
          ((expr("instr('0123456789abcdef', substr(k, 1, 1))") - 1) % 16)
            .cast("long"))
      val w = Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
      keyed.withColumn("pos", row_number().over(w).cast("long"))
        .filter(col("pos") <= 3)
        .select(col("shard"), col("pos"), col("doc_id"))
    }, Some(
      """WITH keyed AS (
        |  SELECT doc_id, md5('shuf7|' || doc_id::VARCHAR) AS k FROM documents),
        |sh AS (
        |  SELECT doc_id, k,
        |    ((strpos('0123456789abcdef', substring(k, 1, 1)) - 1) % 16)::BIGINT AS shard
        |  FROM keyed)
        |SELECT shard, pos, doc_id FROM (
        |  SELECT shard, doc_id,
        |    row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)::BIGINT AS pos
        |  FROM sh) t
        |WHERE pos <= 3""".stripMargin)),

    // ---- mixture reweighting (size^alpha) -------------------------------
    // Per-source sampling weights proportional to token_count^0.5 — the
    // standard alpha-smoothed mixture that keeps big web crawls from
    // drowning small high-quality sources. sqrt is IEEE-exact, each term
    // is rounded once into a decimal, the denominator is an exact decimal
    // sum, and only the final normalized ratio is a (deterministic IEEE)
    // double division, rounded once.
    CatalogQuery("mix_source_alpha_weights", (s, d) => {
      val bySrc = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
        .withColumn("pw", round(sqrt(col("n_tokens")), 6).cast("decimal(28,6)"))
      // global windows here run over the per-SOURCE aggregate (config-
      // -bounded row count), never the document table
      bySrc
        .withColumn("den", sum(col("pw")).over(Window.partitionBy()))
        .withColumn("weight",
          round(col("pw").cast("double") / col("den").cast("double"), 6))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"))
    }, Some(
      """WITH bysrc AS (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |    sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY 1),
        |pwt AS (
        |  SELECT *, round(sqrt(n_tokens), 6)::DECIMAL(28,6) AS pw FROM bysrc)
        |SELECT source, n_docs, n_tokens,
        |  round(pw::DOUBLE / (sum(pw) OVER ())::DOUBLE, 6) AS weight
        |FROM pwt""".stripMargin)),

    // ---- token budget apportionment -------------------------------------
    // Turn the alpha-smoothed mixture into an INTEGER per-source token
    // budget that sums exactly to the global budget (1M here): the
    // largest-remainder method. sqrt weights are scaled to integers with
    // the engine-neutral floor(x*s + 0.5) half-up, then base share =
    // B*pw div den, and the B - sum(base) leftover tokens go to the
    // largest remainders (source-name tiebreak). Everything after the
    // one sqrt is integer div/mod — bit-exact on both engines. At real
    // budgets (1e12+ tokens) the B*pw product needs DECIMAL(38,0)
    // accumulators; the shape is unchanged.
    CatalogQuery("mix_token_budget_apportion", (s, d) => {
      val budget = 1000000L
      val bySrc = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
        .withColumn("pw",
          floor(sqrt(col("n_tokens")) * 1000000d + 0.5d).cast("long"))
      // global windows run over the per-SOURCE aggregate (config-bounded)
      val w = Window.partitionBy()
      val based = bySrc
        .withColumn("den", sum(col("pw")).over(w))
        .withColumn("base", expr(s"$budget * pw div den"))
        .withColumn("rem", expr(s"($budget * pw) % den"))
      based
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("source"))).cast("long"))
        .withColumn("leftover", lit(budget) - sum(col("base")).over(w))
        .select(col("source"), col("n_tokens"),
          (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .as("alloc_tokens"))
    }, Some(
      """WITH bysrc AS (
        |  SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY 1),
        |pwt AS (
        |  SELECT source, n_tokens,
        |    CAST(floor(sqrt(n_tokens) * 1000000 + 0.5) AS BIGINT) AS pw
        |  FROM bysrc),
        |tot AS (SELECT *, (sum(pw) OVER ())::BIGINT AS den FROM pwt),
        |based AS (
        |  SELECT source, n_tokens, pw, den,
        |    (1000000 * pw) // den AS base, (1000000 * pw) % den AS rem
        |  FROM tot),
        |ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, source)::BIGINT AS rk,
        |    (1000000 - sum(base) OVER ())::BIGINT AS leftover
        |  FROM based)
        |SELECT source, n_tokens,
        |  (base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT AS alloc_tokens
        |FROM ranked""".stripMargin)),

    // ---- temperature-scaled sampling weights -----------------------------
    // The multilingual-sampling classic (mBERT/XLM-R style): sampling
    // weight ∝ n_i^(1/T). T=4 here — the heavy low-resource-upsampling
    // regime that a plain sqrt (mix_source_alpha_weights' α=0.5) can't
    // express. All-integer determinism: the fourth root is two nested
    // EXACT integer square roots (floor(sqrt(floor(sqrt(n·1e6))·1e6)) =
    // a ×~31623-scaled n^(1/4); the double-sqrt candidate is adjusted
    // ±1 against the exact integer square, so both engines agree
    // bit-for-bit at any magnitude), then weights normalize to EXACTLY
    // 1e6 ppm by the largest-remainder method. Q.overflowGuard pins the
    // n·1e6 product to the BIGINT-exact regime (9e12 tokens per source
    // — beyond it, widen to DECIMAL(38,0)). 100 TB: one hash aggregate
    // to the per-source table; every window runs over the config-
    // bounded source list (the mix_* allowlist class).
    CatalogQuery("mix_temperature_weights", (s, d) => {
      def isqrt(x: Column): Column = {
        val c0 = floor(sqrt(x.cast("double"))).cast("long")
        val c1 = c0 - when(c0 * c0 > x, 1L).otherwise(0L)
        c1 + when((c1 + lit(1L)) * (c1 + lit(1L)) <= x, 1L).otherwise(0L)
      }
      val bySrc = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
        .withColumn("n_tokens", col("n_tokens") +
          Q.overflowGuard(col("n_tokens"), 9000000000000L, "mix_temperature_weights"))
      val w = Window.partitionBy()
      val based = bySrc
        .withColumn("r2", isqrt(col("n_tokens") * lit(1000000L)))
        .withColumn("pw", isqrt(col("r2") * lit(1000000L)))
        .withColumn("den", sum(col("pw")).over(w))
        .withColumn("base", expr("1000000 * pw div den"))
        .withColumn("rem", expr("(1000000 * pw) % den"))
      based
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("source"))).cast("long"))
        .withColumn("leftover", lit(1000000L) - sum(col("base")).over(w))
        .select(col("source"), col("n_tokens"),
          (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .as("weight_ppm"))
    }, Some(
      """WITH bysrc AS (
        |  SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY 1),
        |r2c AS (
        |  SELECT source, n_tokens,
        |    CAST(floor(sqrt(CAST(n_tokens * 1000000 AS DOUBLE))) AS BIGINT) AS c0
        |  FROM bysrc),
        |r2a AS (
        |  SELECT *, c0 - CASE WHEN c0 * c0 > n_tokens * 1000000 THEN 1 ELSE 0 END AS c1
        |  FROM r2c),
        |r2 AS (
        |  SELECT source, n_tokens,
        |    c1 + CASE WHEN (c1 + 1) * (c1 + 1) <= n_tokens * 1000000 THEN 1 ELSE 0 END AS r2
        |  FROM r2a),
        |pwc AS (
        |  SELECT source, n_tokens, r2,
        |    CAST(floor(sqrt(CAST(r2 * 1000000 AS DOUBLE))) AS BIGINT) AS c0
        |  FROM r2),
        |pwa AS (
        |  SELECT *, c0 - CASE WHEN c0 * c0 > r2 * 1000000 THEN 1 ELSE 0 END AS c1
        |  FROM pwc),
        |pwt AS (
        |  SELECT source, n_tokens,
        |    c1 + CASE WHEN (c1 + 1) * (c1 + 1) <= r2 * 1000000 THEN 1 ELSE 0 END AS pw
        |  FROM pwa),
        |tot AS (SELECT *, (sum(pw) OVER ())::BIGINT AS den FROM pwt),
        |based AS (
        |  SELECT source, n_tokens, pw, den,
        |    (1000000 * pw) // den AS base, (1000000 * pw) % den AS rem
        |  FROM tot),
        |ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, source)::BIGINT AS rk,
        |    (1000000 - sum(base) OVER ())::BIGINT AS leftover
        |  FROM based)
        |SELECT source, n_tokens,
        |  (base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT AS weight_ppm
        |FROM ranked""".stripMargin)),

    // ---- budget-enforcing mixture selection ------------------------------
    // The step that turns mix_token_budget_apportion's INTEGER budgets
    // into the actual training-mix document list: within each source,
    // docs order by a seeded md5 shuffle key and are taken while the
    // RUNNING token total stays within the source's allocation — the
    // deterministic, coordination-free materialization of a mixture plan
    // (re-runnable to the same list on any cluster). The cumulative sum
    // is a PARTITIONED window (per source); the only global windows are
    // the apportionment's own, over the per-source aggregate
    // (config-bounded, the mix_token_budget_apportion allowlist class).
    // Output is the per-source selection report: docs taken, tokens
    // spent, and utilization of the allocation in ppm.
    CatalogQuery("mix_budget_enforce_selection", (s, d) => {
      val budget = 1000000L
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val bySrc = docs.groupBy(col("source"))
        .agg(sum(col("n_tok")).as("n_tokens"))
        .withColumn("pw",
          floor(sqrt(col("n_tokens")) * 1000000d + 0.5d).cast("long"))
      // global windows run over the per-SOURCE aggregate (config-bounded)
      val w = Window.partitionBy()
      val based = bySrc
        .withColumn("den", sum(col("pw")).over(w))
        .withColumn("base", expr(s"$budget * pw div den"))
        .withColumn("rem", expr(s"($budget * pw) % den"))
      val alloc = based
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("source"))).cast("long"))
        .withColumn("leftover", lit(budget) - sum(col("base")).over(w))
        .select(col("source"),
          (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .as("alloc_tokens"))
      val wSel = Window.partitionBy(col("source"))
        .orderBy(md5(concat(lit("sel|"), col("doc_id").cast("string"))), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs
        .withColumn("cum", sum(col("n_tok")).over(wSel))
        .join(alloc, Seq("source"))
        .filter(col("cum") <= col("alloc_tokens"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs_selected"),
          sum(col("n_tok")).as("tokens_selected"),
          max(col("alloc_tokens")).as("alloc_tokens"))
        .withColumn("util_ppm",
          expr("tokens_selected * 1000000 div alloc_tokens"))
    }, Some(
      """WITH docs AS (
        |  SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS n_tok
        |  FROM documents),
        |bysrc AS (
        |  SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM docs GROUP BY 1),
        |pwt AS (
        |  SELECT source, n_tokens,
        |    CAST(floor(sqrt(n_tokens) * 1000000 + 0.5) AS BIGINT) AS pw
        |  FROM bysrc),
        |tot AS (SELECT *, (sum(pw) OVER ())::BIGINT AS den FROM pwt),
        |based AS (
        |  SELECT source, pw, den,
        |    (1000000 * pw) // den AS base, (1000000 * pw) % den AS rem
        |  FROM tot),
        |ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, source)::BIGINT AS rk,
        |    (1000000 - sum(base) OVER ())::BIGINT AS leftover
        |  FROM based),
        |alloc AS (
        |  SELECT source,
        |    (base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT AS alloc_tokens
        |  FROM ranked),
        |sel AS (
        |  SELECT d.source, d.n_tok, a.alloc_tokens,
        |    CAST(sum(d.n_tok) OVER (PARTITION BY d.source
        |      ORDER BY md5('sel|' || d.doc_id::VARCHAR), d.doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM docs d JOIN alloc a USING (source))
        |SELECT source, count(*)::BIGINT AS n_docs_selected,
        |  CAST(sum(n_tok) AS BIGINT) AS tokens_selected,
        |  max(alloc_tokens) AS alloc_tokens,
        |  CAST(sum(n_tok) * 1000000 // max(alloc_tokens) AS BIGINT) AS util_ppm
        |FROM sel WHERE cum <= alloc_tokens
        |GROUP BY 1""".stripMargin)),

    // ---- corpus bigram LM scoring ---------------------------------------
    // Train a bigram model ON the corpus, score each document's average
    // next-token predictability under it: boilerplate scores high,
    // gibberish low — the cheap statistical cousin of perplexity
    // filtering. All arithmetic is integer: each bigram's conditional
    // probability is scaled to parts-per-1e9 by exact integer division,
    // and the per-doc average divides once more — no transcendental
    // functions, so both engines agree to the last bit. The count tables
    // are bounded by vocabulary^2 (not corpus size), so at scale they
    // broadcast while the corpus side stays one linear scan.
    CatalogQuery("txt_bigram_predictability", (s, d) => {
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
      bg.join(cntAb, Seq("a", "b")).join(cntA, Seq("a"))
        // overflow tripwire: cnt_ab·1e9 wraps BIGINT past cnt_ab ≈ 9.2e9
        .withColumn("p_e9", expr("cnt_ab * 1000000000L div cnt_a")
          + Q.overflowGuard(col("cnt_ab"), 9000000000L, "txt_bigram_predictability cnt_ab"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          expr("sum(p_e9) div count(1)").as("avg_p_e9"))
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT doc_id, t[i] AS a, t[i + 1] AS b
        |  FROM toks CROSS JOIN LATERAL (
        |    SELECT unnest(range(1, len(t))) AS i) u),
        |cnt_ab AS (SELECT a, b, count(*)::BIGINT AS cnt_ab FROM bg GROUP BY 1, 2),
        |cnt_a AS (SELECT a, count(*)::BIGINT AS cnt_a FROM bg GROUP BY 1)
        |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |  (sum((cnt_ab * 1000000000) // cnt_a) // count(*))::BIGINT AS avg_p_e9
        |FROM bg JOIN cnt_ab USING (a, b) JOIN cnt_a USING (a)
        |GROUP BY 1""".stripMargin)),

    // ---- embedding centroid outliers ------------------------------------
    // Per-label robust centroid (per-dimension exact median — midpoint
    // interpolation of two floats is IEEE-exact in double, so both
    // engines produce the identical centroid) and the top-3 vectors
    // farthest from their label's centroid by squared L2 — the standard
    // label-noise / outlier sweep before contrastive training. The
    // explode → groupBy (label, dim) shuffle is linear in data; the
    // centroid table is labels × dims (vocabulary-bounded, broadcasts).
    // SCALE NOTE: exact percentile buffers each (label, dim) group's
    // values (N/labels doubles) on one executor — fine into the billions
    // of rows, but the 100 TB path swaps in approx_percentile (mergeable
    // sketch, constant memory) or a fixed-point search; exact median is
    // kept here because the cross-engine oracle needs bit-equality.
    CatalogQuery("emb_label_centroid_outliers", (s, d) => {
      val e = Tables.embeddings(s, d)
      val med = e
        .select(col("label"), posexplode(col("embedding")))
        .select(col("label"), col("pos").as("dim"),
          col("col").cast("double").as("v"))
        .groupBy(col("label"), col("dim"))
        .agg(expr("percentile(v, 0.5D)").as("m"))
      val cent = med.groupBy(col("label"))
        .agg(collect_list(struct(col("dim"), col("m"))).as("dm"))
        .select(col("label"),
          expr("transform(array_sort(dm), x -> x.m)").as("cv"))
      val w = Window.partitionBy(col("label"))
        .orderBy(col("dist2").desc, col("vec_id"))
      e.join(cent, Seq("label"))
        .withColumn("dist2", expr(
          """aggregate(zip_with(embedding, cv,
            |  (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
            |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("label"), col("rank"), col("vec_id"),
          round(col("dist2"), 4).as("dist2"))
    }, Some(
      """WITH ex AS (
        |  SELECT label, dim, embedding[dim + 1]::DOUBLE AS v
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) u),
        |med AS (
        |  SELECT label, dim, quantile_cont(v, 0.5) AS m
        |  FROM ex GROUP BY 1, 2),
        |cent AS (
        |  SELECT label, list(m ORDER BY dim) AS cv FROM med GROUP BY 1),
        |scored AS (
        |  SELECT e.label, e.vec_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (e.embedding[i]::DOUBLE - c.cv[i]) * (e.embedding[i]::DOUBLE - c.cv[i]))) AS d2
        |  FROM embeddings e JOIN cent c ON e.label = c.label)
        |SELECT label, rank, vec_id, round(d2, 4) AS dist2 FROM (
        |  SELECT label, vec_id, d2,
        |    row_number() OVER (PARTITION BY label ORDER BY d2 DESC, vec_id)::BIGINT AS rank
        |  FROM scored) t
        |WHERE rank <= 3""".stripMargin)),

    // ---- BPE merge candidates -------------------------------------------
    // The first step of byte-pair-encoding tokenizer training: count
    // adjacent character pairs across the corpus (weighted by word
    // frequency) and rank the top merge candidates. The expensive
    // aggregation collapses to the DISTINCT WORD vocabulary first —
    // vocabulary-bounded, not corpus-bounded, so at 100 TB the pair
    // explosion runs over a small table while the corpus contributes only
    // a word-count groupBy (one linear shuffle).
    CatalogQuery("txt_bpe_merge_candidates", (s, d) => {
      val words = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      val pairs = words
        .select(col("wc"), explode(expr(
          """transform(sequence(1, length(w) - 1),
            | i -> substr(w, CAST(i AS INT), 2))""".stripMargin)).as("pair"))
        .groupBy(col("pair")).agg(sum(col("wc")).as("n"))
      val w = Window.orderBy(col("n").desc, col("pair"))
      pairs.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 20)
        .select(col("rank"), col("pair"), col("n"))
    }, Some(
      """WITH words AS (
        |  SELECT w, count(*)::BIGINT AS wc FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE len(w) >= 2 GROUP BY 1),
        |pairs AS (
        |  SELECT substring(w, i, 2) AS pair, sum(wc)::BIGINT AS n
        |  FROM words CROSS JOIN LATERAL (
        |    SELECT unnest(range(1, len(w))) AS i) u
        |  GROUP BY 1)
        |SELECT rank, pair, n FROM (
        |  SELECT pair, n,
        |    row_number() OVER (ORDER BY n DESC, pair)::BIGINT AS rank
        |  FROM pairs) t
        |WHERE rank <= 20""".stripMargin)),

    // ---- length curriculum staging --------------------------------------
    // Curriculum learning's simplest schedule: short documents first.
    // Documents are ranked by token count (doc_id tiebreak) and cut into
    // 4 equal stages with ntile; per-stage doc and token totals verify
    // the staging. SCALE NOTE: a global window ntile runs in ONE ordered
    // partition in Spark — fine here, but the 100 TB path computes the
    // 3 stage BOUNDARIES first (exact percentiles over (n_tok, doc_id) —
    // a distributed aggregate) and assigns stages by range comparison;
    // the window form is kept because the oracle requires ntile's exact
    // equal-count tie handling and the aggregated output (4 rows) is
    // identical either way.
    CatalogQuery("prep_length_curriculum", (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val w = Window.orderBy(col("n_tok"), col("doc_id"))
      docs.withColumn("stage", ntile(4).over(w).cast("long"))
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"))
    }, Some(
      """WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok
        |  FROM documents),
        |st AS (
        |  SELECT n_tok, ntile(4) OVER (ORDER BY n_tok, doc_id)::BIGINT AS stage
        |  FROM t)
        |SELECT stage, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
        |  min(n_tok) AS min_tok, max(n_tok) AS max_tok
        |FROM st GROUP BY 1""".stripMargin)),

    // ---- ordered event funnel -------------------------------------------
    // view → click → purchase, each step strictly after the previous
    // one's FIRST occurrence and within a 24-hour conversion window
    // (without a window the funnel saturates — every active user
    // eventually does everything): three conditional min-aggregations
    // over the same events scan, joined on user_id (the grouping key, so
    // the joins co-partition), counted by deepest stage reached. The
    // canonical product-analytics funnel as a batch operator.
    CatalogQuery("evt_funnel_stages", (s, d) => {
      val ev = Tables.events(s, d)
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, Seq("user_id"))
        .filter(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, Seq("user_id"))
        .filter(col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      ev.select(col("user_id")).distinct()
        .join(t1.select(col("user_id"), lit(1).as("s1")), Seq("user_id"), "left")
        .join(t2.select(col("user_id"), lit(1).as("s2")), Seq("user_id"), "left")
        .join(t3.select(col("user_id"), lit(1).as("s3")), Seq("user_id"), "left")
        .withColumn("stage",
          (coalesce(col("s1"), lit(0)) + coalesce(col("s2"), lit(0)) +
            coalesce(col("s3"), lit(0))).cast("long"))
        .groupBy(col("stage"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }, Some(
      """WITH t1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
        |    AND e.ts <= t1.t1 + INTERVAL 24 HOUR
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |t3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
        |    AND e.ts <= t2.t2 + INTERVAL 24 HOUR
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |st AS (
        |  SELECT u.user_id,
        |    (CASE WHEN t1.user_id IS NULL THEN 0 ELSE 1 END +
        |     CASE WHEN t2.user_id IS NULL THEN 0 ELSE 1 END +
        |     CASE WHEN t3.user_id IS NULL THEN 0 ELSE 1 END)::BIGINT AS stage
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  LEFT JOIN t1 ON u.user_id = t1.user_id
        |  LEFT JOIN t2 ON u.user_id = t2.user_id
        |  LEFT JOIN t3 ON u.user_id = t3.user_id)
        |SELECT stage, count(DISTINCT user_id)::BIGINT AS n_users
        |FROM st GROUP BY 1""".stripMargin)),

    // ---- DSIR-style importance selection --------------------------------
    // Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
    // score each raw document by how much more likely its hashed-n-gram
    // features are under a TARGET distribution (here: the English slice)
    // than under the RAW pool, then keep the high-importance documents.
    // Features are word bigrams hashed into B=64 buckets (the paper's
    // hashed n-gram trick — the feature space stays config-bounded no
    // matter the corpus); both bucket distributions get Laplace +1
    // smoothing. The textbook score is sum_b n_b·log(p_t(b)/p_r(b));
    // log is NOT bit-portable across engines, so the ratio is carried as
    // an integer-scaled rational instead: with per-1e9 integer
    // probabilities pt = (1e9·(ct+1)) div (nt+B) and pr likewise, the
    // bucket ratio r_b = least((1e6·pt) div max(pr,1), 1e9) is pure int64
    // arithmetic, and the document score sum_b n_b·r_b is an exact
    // integer aggregate — a linearized importance weight, monotone in the
    // per-bucket probability ratios (the cap keeps n_b·r_b far from
    // overflow; int64 holds until the corpus exceeds ~9e9 bigrams, after
    // which the same shape runs in DECIMAL(38,0)).
    //
    // Scale shape: one bigram explode feeds three aggregates — the
    // per-doc bucket counts (linear shuffle on doc_id,b) and the two
    // 64-row bucket tables (map-side partial agg collapses them before
    // the shuffle). The ratio table is B rows — always a broadcast — and
    // the selection gate compares against the corpus-mean score (one
    // 1-row global agg, broadcast back): no global sort/row_number at any
    // point, so nothing here has a 100 TB choke point. DSIR's final
    // gumbel-top-k draw is a weighted sample; the deterministic
    // above-mean gate stands in for it so the oracle can replay the
    // selection exactly.
    // The oracle hashes the SAME UTF-8 bytes as RollingHash
    // (Similarity.rollingHashDuck), so bucket assignment is byte-exact on
    // any corpus; the planted multibyte token proves the gate exercises
    // the non-ASCII path.
    CatalogQuery("mix_dsir_importance_select", (s, d) => {
      val nBuckets = 64
      val planted = concat(col("text"), lit(" ß中"),
        (col("doc_id") % 5).cast("string"))
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), split(planted, " ").as("toks"))
        .filter(size(col("toks")) >= 2)
      val bg = docs.select(col("doc_id"), col("lang"),
        explode(expr(
          """transform(sequence(1, size(toks) - 1),
            | i -> concat_ws(' ', element_at(toks, CAST(i AS INT)),
            |   element_at(toks, CAST(i + 1 AS INT))))""".stripMargin)).as("bigram"))
        .withColumn("b", GraftFunctions.rolling_hash(col("bigram")) % nBuckets)
      // ONE corpus explode: the per-(doc, bucket) count table is
      // materialized (localCheckpoint — the PageRank discipline) and
      // every downstream distribution derives from it; without this the
      // four aggregate branches + the threshold's second reference each
      // re-explode the corpus (8 scans at 100 TB). lang rides along for
      // free — it is functionally dependent on doc_id, so (doc_id, b)
      // stays the grouping grain.
      val perDocLang = bg.groupBy(col("doc_id"), col("lang"), col("b"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val tgt = perDocLang.filter(col("lang") === "en")
        .groupBy(col("b")).agg(sum(col("n")).as("ct"))
      val raw = perDocLang.groupBy(col("b")).agg(sum(col("n")).as("cr"))
      val tot = perDocLang.agg(
        sum(when(col("lang") === "en", col("n")).otherwise(0L)).as("nt"),
        sum(col("n")).as("nr"))
      val perDoc = perDocLang.select(col("doc_id"), col("b"), col("n"))
      val ratio = raw.join(tgt, Seq("b"), "left").crossJoin(broadcast(tot))
        .withColumn("pt", expr(s"(1000000000L * (coalesce(ct, 0L) + 1)) div (nt + $nBuckets)"))
        .withColumn("pr", expr(s"(1000000000L * (cr + 1)) div (nr + $nBuckets)"))
        .withColumn("r", least(expr("(1000000L * pt) div greatest(pr, 1L)"), lit(1000000000L)))
        .select(col("b"), col("r"))
      // no broadcast hint on the 64-row ratio table: the auditor can't
      // structurally bound a groupBy's cardinality, and AQE broadcasts a
      // 64-row side on its own (the hint would force-broadcast a plan
      // subtree rooted at a fact scan — the exact anti-pattern the audit
      // exists to catch, even when the human knows the domain is tiny)
      val scores = perDoc.join(ratio, "b")
        .groupBy(col("doc_id")).agg(sum(col("n") * col("r")).as("score"))
        .localCheckpoint() // read twice: threshold agg + output rows
      val thr = scores.agg(expr("sum(score) div count(*)").as("thr"))
      scores.crossJoin(broadcast(thr))
        .select(col("doc_id"), col("score"), (col("score") > col("thr")).as("selected"))
    }, Some(
      s"""WITH docs AS (
        |  SELECT doc_id, lang,
        |    string_split(text || ' ß中' || (doc_id % 5)::VARCHAR, ' ') AS t
        |  FROM documents
        |  WHERE len(string_split(text || ' ß中' || (doc_id % 5)::VARCHAR, ' ')) >= 2),
        |bg AS (
        |  SELECT doc_id, lang,
        |    ${Similarity.rollingHashDuck("bigram")} % 64 AS b
        |  FROM (
        |    SELECT doc_id, lang,
        |      unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bigram
        |    FROM docs)),
        |per_doc AS (SELECT doc_id, b, count(*)::BIGINT AS n FROM bg GROUP BY 1, 2),
        |tgt AS (SELECT b, count(*)::BIGINT AS ct FROM bg WHERE lang = 'en' GROUP BY 1),
        |raw AS (SELECT b, count(*)::BIGINT AS cr FROM bg GROUP BY 1),
        |tot AS (
        |  SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS nt,
        |    count(*)::BIGINT AS nr
        |  FROM bg),
        |ratio AS (
        |  SELECT raw.b,
        |    least((1000000 * ((1000000000 * (coalesce(ct, 0) + 1)) // (nt + 64)))
        |      // greatest((1000000000 * (cr + 1)) // (nr + 64), 1), 1000000000) AS r
        |  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot),
        |scores AS (
        |  SELECT doc_id, sum(n * r)::BIGINT AS score
        |  FROM per_doc JOIN ratio ON per_doc.b = ratio.b GROUP BY 1),
        |thr AS (SELECT sum(score) // count(*) AS thr FROM scores)
        |SELECT doc_id, score, score > thr AS selected
        |FROM scores CROSS JOIN thr""".stripMargin)),

    // ---- DSIR resampling budget (two-level exact apportionment) ----------
    // Complete the DSIR pipeline: the selected docs get an INTEGER token
    // budget proportional to importance that sums EXACTLY to the global
    // budget — with NO global sort. The classic largest-remainder method
    // needs a total order over remainders; ranking a 100 TB corpus
    // globally is the anti-pattern, so the apportionment runs TWICE:
    // level 1 splits the budget over 8 md5 shards proportional to shard
    // score mass (8-row window — trivially exact), level 2 splits each
    // shard's budget over its docs (windows PARTITIONED BY SHARD — the
    // same 1/K-bounded ordered-partition discipline as
    // prep_pack_sequences). Both levels are integer div/mod + a bounded
    // row_number, so Σ doc budgets = shard budget and Σ shard budgets =
    // B hold by construction (PrepQueriesSpec asserts both); everything
    // is bit-exact on both engines. The B·mass / budget·score products
    // run in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): with r_b scaled
    // ~1e6, shard mass passes 2^63/B at only ~1e7 bigrams per shard —
    // barely above the oracle scale — so int64 would be a cliff (ANSI
    // Spark throws, DuckDB silently promotes); 128-bit intermediates
    // keep both engines exact and identical at any corpus size.
    CatalogQuery("mix_dsir_resample_budget", (s, d) => {
      val budget = 1000000L
      val sel = Catalog.queries("mix_dsir_importance_select")(s, d)
        .filter(col("selected"))
      val sh = sel
        .withColumn("k", md5(concat(lit("rs|"), col("doc_id").cast("string"))))
        .withColumn("shard",
          ((expr("instr('0123456789abcdef', substr(k, 1, 1))") - 1) % 8)
            .cast("long"))
      val w8 = Window.partitionBy()
      val l1 = sh.groupBy(col("shard")).agg(sum(col("score")).as("mass"))
        .withColumn("den", sum(col("mass")).over(w8))
        .withColumn("base",
          expr(s"CAST((CAST($budget AS DECIMAL(38,0)) * mass) div den AS BIGINT)"))
        .withColumn("rem", expr(s"(CAST($budget AS DECIMAL(38,0)) * mass) % den"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("shard"))).cast("long"))
        .withColumn("leftover", lit(budget) - sum(col("base")).over(w8))
        .select(col("shard"),
          (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .as("shard_budget"))
      val wSh = Window.partitionBy(col("shard"))
      sh.join(l1, "shard")
        .withColumn("den", sum(col("score")).over(wSh))
        .withColumn("base",
          expr("CAST((CAST(shard_budget AS DECIMAL(38,0)) * score) div den AS BIGINT)"))
        .withColumn("rem", expr("(CAST(shard_budget AS DECIMAL(38,0)) * score) % den"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("shard"))
            .orderBy(col("rem").desc, col("doc_id"))).cast("long"))
        .withColumn("leftover", col("shard_budget") - sum(col("base")).over(wSh))
        .select(col("doc_id"), col("shard"),
          (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .as("token_budget"))
    }, Some(
      s"""WITH docs AS (
        |  SELECT doc_id, lang,
        |    string_split(text || ' ß中' || (doc_id % 5)::VARCHAR, ' ') AS t
        |  FROM documents
        |  WHERE len(string_split(text || ' ß中' || (doc_id % 5)::VARCHAR, ' ')) >= 2),
        |bg AS (
        |  SELECT doc_id, lang,
        |    ${Similarity.rollingHashDuck("bigram")} % 64 AS b
        |  FROM (
        |    SELECT doc_id, lang,
        |      unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bigram
        |    FROM docs)),
        |per_doc AS (SELECT doc_id, b, count(*)::BIGINT AS n FROM bg GROUP BY 1, 2),
        |tgt AS (SELECT b, count(*)::BIGINT AS ct FROM bg WHERE lang = 'en' GROUP BY 1),
        |raw AS (SELECT b, count(*)::BIGINT AS cr FROM bg GROUP BY 1),
        |tot AS (
        |  SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS nt,
        |    count(*)::BIGINT AS nr
        |  FROM bg),
        |ratio AS (
        |  SELECT raw.b,
        |    least((1000000 * ((1000000000 * (coalesce(ct, 0) + 1)) // (nt + 64)))
        |      // greatest((1000000000 * (cr + 1)) // (nr + 64), 1), 1000000000) AS r
        |  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot),
        |scores AS (
        |  SELECT doc_id, sum(n * r)::BIGINT AS score
        |  FROM per_doc JOIN ratio ON per_doc.b = ratio.b GROUP BY 1),
        |thr AS (SELECT sum(score) // count(*) AS thr FROM scores),
        |sel AS (
        |  SELECT doc_id, score,
        |    ((strpos('0123456789abcdef',
        |        substring(md5('rs|' || doc_id::VARCHAR), 1, 1)) - 1) % 8)::BIGINT AS shard
        |  FROM scores CROSS JOIN thr WHERE score > thr),
        |l1a AS (
        |  SELECT shard, mass, sum(mass) OVER () AS den
        |  FROM (SELECT shard, sum(score)::BIGINT AS mass FROM sel GROUP BY 1) m),
        |l1b AS (
        |  SELECT shard, (1000000::HUGEINT * mass) // den AS base,
        |    (1000000::HUGEINT * mass) % den AS rem
        |  FROM l1a),
        |l1 AS (
        |  SELECT shard, base, rem, 1000000 - sum(base) OVER () AS lo FROM l1b),
        |sb AS (
        |  SELECT shard,
        |    (base + CASE WHEN row_number() OVER (ORDER BY rem DESC, shard) <= lo
        |       THEN 1 ELSE 0 END)::BIGINT AS shard_budget
        |  FROM l1),
        |l2 AS (
        |  SELECT doc_id, sel.shard, shard_budget, score,
        |    sum(score) OVER (PARTITION BY sel.shard) AS den
        |  FROM sel JOIN sb ON sel.shard = sb.shard)
        |SELECT doc_id, shard,
        |  ((shard_budget::HUGEINT * score) // den
        |    + CASE WHEN row_number() OVER (PARTITION BY shard
        |        ORDER BY (shard_budget::HUGEINT * score) % den DESC, doc_id)
        |      <= shard_budget - sum((shard_budget::HUGEINT * score) // den)
        |           OVER (PARTITION BY shard)
        |      THEN 1 ELSE 0 END)::BIGINT AS token_budget
        |FROM l2""".stripMargin)),

    // ---- WebDataset-style tar shard export + re-ingest ------------------
    // The training-data delivery format: bounded member groups (shard =
    // doc_id div 100 — shard COUNT grows with the corpus, shard SIZE
    // stays bounded) rendered as real POSIX ustar archives per group
    // (functions.TarArchive, hand-rolled to spec and cross-checked
    // against GNU tar in TarArchiveSpec), then UNPACKED again through
    // the validating parser. The oracle gates per-member name/size/md5
    // against the source table, so a header-layout, padding, or
    // round-trip bug hash-mismatches. 100 TB: one shuffle on shard id,
    // per-task memory bounded by shard size, export and ingest both
    // embarrassingly parallel.
    CatalogQuery("prep_tar_shards", (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
        .select(expr("doc_id div 100").as("shard"), col("doc_id"), col("text"))
        .as[(Long, Long, String)]
      val shards = docs.groupByKey(_._1)
        .mapGroups { (shard, it) =>
          val members = it.toArray.sortBy(_._2).toSeq
            .map { case (_, id, text) => (s"doc$id.txt", text.getBytes("UTF-8")) }
          (shard, TarArchive.pack(members))
        }
      shards.flatMap { case (shard, tar) =>
        TarArchive.unpack(tar).map { case (name, data) =>
          val md = java.security.MessageDigest.getInstance("MD5").digest(data)
          (name.stripPrefix("doc").stripSuffix(".txt").toLong, shard,
            data.length.toLong,
            md.map(b => f"$b%02x").mkString)
        }
      }.toDF("doc_id", "shard", "n_bytes", "content_md5")
    }, Some(
      """SELECT doc_id, doc_id // 100 AS shard,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5
        |FROM documents""".stripMargin)),

    // ---- incremental dataset publishing: CDC-maintained tar shards ------
    // The export twin of ann_cdc_incremental_index: a 4-batch document
    // change stream (rev-updates / tombstones / new-key inserts) is
    // LWW-compacted into a doc-state SnapshotSink, and per batch ONLY
    // the shards containing changed keys re-render their tar archive
    // into a second, shard-keyed sink (a shard emptied of members is
    // tombstoned). The published shard set is then re-INGESTED through
    // the validating parser, and the oracle rebuilds the final document
    // state from the full log in SQL — so incremental publishing must
    // converge to the from-scratch export. 100 TB: per-batch cost =
    // changed docs (state merge) + touched shards (render), never the
    // corpus; untouched shards' bytes are never rewritten (the sink's
    // touched-bucket property).
    CatalogQuery("cdc_incremental_shard_export", (s, d) => {
      import s.implicits._
      val work = Q.scratch("cdcshard")
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      def batch(b: Int): DataFrame = {
        if (b == 0)
          docs.select(col("doc_id"), col("text"),
            lit(graft.core.ChangeLog.Insert).as("op"), lit(0L).as("seq"))
        else {
          val ups = docs.filter(col("doc_id") % 10 === b)
            .select(col("doc_id"), concat(col("text"), lit(s" rev$b")).as("text"))
          val ins = docs.filter(col("doc_id") % 23 === b)
            .select((col("doc_id") + lit(1000000L * b)).as("doc_id"),
              concat(col("text"), lit(s" ins$b")).as("text"))
          val dels = docs.filter(col("doc_id") % 17 === b && col("doc_id") % 10 =!= b)
            .select(col("doc_id"), lit(null).cast("string").as("text"))
          ups.unionByName(ins)
            .withColumn("op", lit(graft.core.ChangeLog.Update))
            .unionByName(dels.withColumn("op", lit(graft.core.ChangeLog.Delete)))
            .withColumn("seq", lit(b.toLong))
        }
      }
      val docState = new graft.sinks.SnapshotSink(s, s"$work/docs", Seq("doc_id"))
      val shardSink = new graft.sinks.SnapshotSink(s, s"$work/shards", Seq("shard"))
      (0 to 3).foreach { b =>
        val ch = batch(b)
        docState.merge(ch)
        val touched = ch.select(expr("doc_id div 100").as("shard")).distinct()
        val rendered = docState.read()
          .withColumn("shard", expr("doc_id div 100"))
          .join(touched, "shard") // touched is batch-bounded; AQE broadcasts
          .select(col("shard"), col("doc_id"), col("text"))
          .as[(Long, Long, String)]
          .groupByKey(_._1)
          .mapGroups { (shard, it) =>
            val members = it.toArray.sortBy(_._2).toSeq
              .map { case (_, id, t) => (s"doc$id.txt", t.getBytes("UTF-8")) }
            (shard, TarArchive.pack(members))
          }
          .toDF("shard", "tar")
        val emptied = touched.join(rendered.select("shard"), Seq("shard"), "left_anti")
          .select(col("shard"), lit(null).cast("binary").as("tar"),
            lit(graft.core.ChangeLog.Delete).as("op"))
        shardSink.merge(rendered
          .withColumn("op", lit(graft.core.ChangeLog.Update))
          .unionByName(emptied)
          .withColumn("seq", lit(b.toLong)))
      }
      shardSink.read().select(col("shard"), col("tar")).as[(Long, Array[Byte])]
        .flatMap { case (shard, tar) =>
          TarArchive.unpack(tar).map { case (name, data) =>
            val md = java.security.MessageDigest.getInstance("MD5").digest(data)
            (name.stripPrefix("doc").stripSuffix(".txt").toLong, shard,
              data.length.toLong, md.map(x => f"$x%02x").mkString)
          }
        }
        .toDF("doc_id", "shard", "n_bytes", "content_md5")
    }, Some(
      """WITH b3 AS (SELECT unnest(range(1, 4)) AS b),
        |base AS (SELECT doc_id, text, 0::BIGINT AS seq, 0 AS del FROM documents),
        |ups AS (
        |  SELECT doc_id, text || ' rev' || b::VARCHAR AS text, b::BIGINT AS seq, 0 AS del
        |  FROM documents CROSS JOIN b3 WHERE doc_id % 10 = b),
        |ins AS (
        |  SELECT doc_id + 1000000 * b AS doc_id, text || ' ins' || b::VARCHAR AS text,
        |    b::BIGINT AS seq, 0 AS del
        |  FROM documents CROSS JOIN b3 WHERE doc_id % 23 = b),
        |dels AS (
        |  SELECT doc_id, CAST(NULL AS VARCHAR) AS text, b::BIGINT AS seq, 1 AS del
        |  FROM documents CROSS JOIN b3 WHERE doc_id % 17 = b AND doc_id % 10 <> b),
        |log AS (
        |  SELECT * FROM base UNION ALL SELECT * FROM ups
        |  UNION ALL SELECT * FROM ins UNION ALL SELECT * FROM dels),
        |fin AS (
        |  SELECT doc_id, text FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
        |    FROM log) t
        |  WHERE rn = 1 AND del = 0)
        |SELECT doc_id, doc_id // 100 AS shard,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5
        |FROM fin""".stripMargin))
  )
}
