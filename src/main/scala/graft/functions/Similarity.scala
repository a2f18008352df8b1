package graft.functions

/** Cross-engine SQL builders for the similarity / dedup primitives.
  *
  * Each primitive is emitted twice from one parameterization: once as
  * Spark SQL (higher-order functions — codegen'd, distributed) and once as
  * DuckDB SQL for the oracle. Hashing uses md5 (identical lowercase hex in
  * both engines); "min over hex strings" is a valid MinHash because the
  * fixed-length hex ordering equals the 128-bit integer ordering.
  *
  * Scale notes: MinHash/LSH and SimHash are linear scans with per-row
  * array work — they shard perfectly. The LSH band join is an equi-join on
  * (band, key): at 100 TB it shuffles only (doc_id, band_key) pairs, never
  * document text. Brute-force cosine exists as the small-N baseline; the
  * bucketed LSH variant is the scale path (candidates meet only within a
  * bucket).
  */
object Similarity {

  // ---- shingling ---------------------------------------------------------

  /** Word 3-shingles, Spark SQL.
    *
    * PERF: `text` should be a materialized token-array column reference
    * (`split` the text into a column first). An inline `split(...)` here
    * re-evaluates per lambda element access — measured 60x slowdown at
    * sf0.1 before shingles/tokens were materialized step-wise.
    */
  def shinglesSpark(text: String): String =
    s"""transform(sequence(1, size(split($text, ' ')) - 2),
       | i -> concat_ws(' ',
       |   element_at(split($text, ' '), CAST(i AS INT)),
       |   element_at(split($text, ' '), CAST(i + 1 AS INT)),
       |   element_at(split($text, ' '), CAST(i + 2 AS INT))))""".stripMargin

  /** Word 3-shingles over a materialized token-array column. */
  def shinglesFromToks(toks: String): String =
    s"""transform(sequence(1, size($toks) - 2),
       | i -> concat_ws(' ',
       |   element_at($toks, CAST(i AS INT)),
       |   element_at($toks, CAST(i + 1 AS INT)),
       |   element_at($toks, CAST(i + 2 AS INT))))""".stripMargin

  /** MinHash signature over a materialized shingle-array column. */
  def minhashFromShingles(sh: String, k: Int): String =
    s"""transform(sequence(0, ${k - 1}),
       | i -> array_min(transform($sh, s -> md5(concat(CAST(i AS STRING), '|', s)))))""".stripMargin

  /** 32-bit SimHash over a materialized token-array column. */
  def simhashFromToks(toks: String): String =
    s"""aggregate(
       | transform(sequence(0, 31), j ->
       |   CASE WHEN aggregate($toks, CAST(0 AS BIGINT), (acc, t) ->
       |     acc + 2 * (shiftright(
       |         instr('0123456789abcdef', substr(md5(t), CAST(j div 4 + 1 AS INT), 1)) - 1,
       |         CAST(j % 4 AS INT)) % 2) - 1) > 0
       |   THEN shiftleft(CAST(1 AS BIGINT), CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END),
       | CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin

  /** Deterministic ±1 hyperplane component for (plane j, dim k) — the
    * driver-side twin of the in-SQL md5 formula (lshBucketDuck).
    *
    * One md5 yields 128 sign bits; dims beyond 128 chain further digests
    * (block b ≥ 1 seeds `hp<j>|<b>`). Block 0 keeps the original `hp<j>`
    * seed so buckets for dim ≤ 128 (and every oracle) are unchanged.
    */
  def hyperplaneSign(j: Int, k: Int): Int = {
    require(k >= 0, s"dim index must be >= 0, got $k")
    val block = k / 128
    val seed = if (block == 0) s"hp$j" else s"hp$j|$block"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString
    val kk = k % 128
    val d = Integer.parseInt(hex.charAt(kk / 4).toString, 16)
    2 * ((d >> (kk % 4)) & 1) - 1
  }

  /** LSH bucket as flat constant-folded arithmetic: hyperplanes are
    * precomputed driver-side, so the expression is `bits` sign tests over
    * straight-line +/- chains — no per-row md5, fully codegen'd. Produces
    * identical buckets to lshBucketDuck (same md5-derived signs).
    * `planeOffset` selects which hyperplanes to use (for multi-table LSH,
    * table t uses planes [t*bits, (t+1)*bits)).
    */
  def lshBucketLiteral(v: String, bits: Int, dim: Int, planeOffset: Int = 0): String = {
    require(dim <= 128,
      s"lshBucketLiteral unrolls per-dim terms; use the native lsh_buckets expression for dim > 128 (got $dim)")
    val bitTerms = (0 until bits).map { j =>
      val dot = (0 until dim).map { k =>
        val sign = if (hyperplaneSign(planeOffset + j, k) > 0) "+" else "-"
        s"$sign CAST(element_at($v, ${k + 1}) AS DOUBLE)"
      }.mkString(" ")
      s"(CASE WHEN (0.0D $dot) > 0 THEN ${1L << j}L ELSE 0L END)"
    }
    bitTerms.mkString("(", " + ", ")")
  }

  /** Array of `tables` multi-table LSH buckets (table t = `bits` planes at
    * offset t*bits). A pair is a candidate if it collides in ANY table —
    * the standard recall lever for hyperplane LSH: recall ≈
    * 1-(1-p^bits)^tables instead of p^bits.
    */
  def lshTableBucketsLiteral(v: String, tables: Int, bits: Int, dim: Int): String =
    (0 until tables)
      .map(t => lshBucketLiteral(v, bits, dim, t * bits))
      .mkString("array(", ", ", ")")

  /** DuckDB twin of lshBucketLiteral with a plane-offset SQL expression.
    * The in-SQL derivation reads one hex digit of a single md5, so it
    * covers dim <= 128 only (the harness corpus is 64-dim); larger dims go
    * through the literal/native path, which chains digest blocks.
    */
  def lshBucketDuckOffset(v: String, bits: Int, dim: Int, offset: String): String = {
    require(dim <= 128, s"in-SQL LSH bucket derivation covers dim <= 128, got $dim")
    s"""list_sum(list_transform(range(0, $bits), j ->
       | CASE WHEN
       |   list_sum(list_transform(range(0, $dim), k ->
       |     (2 * (((strpos('0123456789abcdef',
       |         substring(md5('hp' || ($offset + j)::VARCHAR), (k // 4) + 1, 1)) - 1) >> (k % 4)) & 1) - 1)
       |       * $v[k + 1]::DOUBLE)) > 0
       | THEN (1::BIGINT << j) ELSE 0::BIGINT END))""".stripMargin
  }

  /** Byte-exact DuckDB twin of `functions.RollingHash`: expand each code
    * point to its UTF-8 bytes (1–4, the RFC 3629 ranges) and fold
    * (acc·31 + byte) mod 2³¹ — bit-identical to the Spark expression's
    * raw-byte fold on ANY text, not just ASCII. (DuckDB's ascii() returns
    * the code point, so a per-character fold silently diverges on
    * multibyte input; this closes the winnowing/DSIR/spans oracles'
    * former ASCII bound.)
    */
  def rollingHashDuck(e: String): String =
    s"""list_reduce(list_prepend(0::BIGINT, flatten(list_transform(
       |  list_transform(range(1, length($e) + 1), i -> ascii(substring($e, i, 1))::BIGINT),
       |  u -> CASE WHEN u < 128 THEN [u]
       |            WHEN u < 2048 THEN [192 + u // 64, 128 + u % 64]
       |            WHEN u < 65536 THEN [224 + u // 4096, 128 + (u // 64) % 64, 128 + u % 64]
       |            ELSE [240 + u // 262144, 128 + (u // 4096) % 64,
       |                  128 + (u // 64) % 64, 128 + u % 64] END))),
       |  (a, c) -> (a * 31 + c) % 2147483648)""".stripMargin

  /** Word 3-shingles, DuckDB SQL. */
  def shinglesDuck(text: String): String =
    s"""list_transform(range(1, len(string_split($text, ' ')) - 1),
       | i -> string_split($text, ' ')[i] || ' ' ||
       |       string_split($text, ' ')[i+1] || ' ' ||
       |       string_split($text, ' ')[i+2])""".stripMargin

  // ---- MinHash -----------------------------------------------------------

  /** k-permutation MinHash signature (array of k hex-string minima), Spark. */
  def minhashSpark(text: String, k: Int): String =
    s"""transform(sequence(0, ${k - 1}),
       | i -> array_min(transform(${shinglesSpark(text)},
       |   s -> md5(concat(CAST(i AS STRING), '|', s)))))""".stripMargin

  /** Same signature, DuckDB. */
  def minhashDuck(text: String, k: Int): String =
    s"""list_transform(range(0, $k),
       | i -> list_min(list_transform(${shinglesDuck(text)},
       |   s -> md5(i::VARCHAR || '|' || s))))""".stripMargin

  // ---- SimHash -----------------------------------------------------------

  /** 32-bit SimHash over whitespace tokens (bit j from md5 hex digit
    * j/4, bit j%4), Spark SQL.
    */
  def simhashSpark(text: String): String =
    s"""aggregate(
       | transform(sequence(0, 31), j ->
       |   CASE WHEN aggregate(split($text, ' '), CAST(0 AS BIGINT), (acc, t) ->
       |     acc + 2 * (shiftright(
       |         instr('0123456789abcdef', substr(md5(t), CAST(j div 4 + 1 AS INT), 1)) - 1,
       |         CAST(j % 4 AS INT)) % 2) - 1) > 0
       |   THEN shiftleft(CAST(1 AS BIGINT), CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END),
       | CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin

  /** Same, DuckDB SQL. */
  def simhashDuck(text: String): String =
    s"""list_sum(list_transform(range(0, 32), j ->
       | CASE WHEN list_sum(list_transform(string_split($text, ' '), t ->
       |   2 * (((strpos('0123456789abcdef', substring(md5(t), (j // 4) + 1, 1)) - 1) >> (j % 4)) & 1) - 1)) > 0
       | THEN (1::BIGINT << j) ELSE 0::BIGINT END))""".stripMargin

  // ---- cosine ------------------------------------------------------------

  /** Sequential-order double dot product of two float arrays, Spark SQL. */
  def dotSpark(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  /** Same, DuckDB SQL (index-ordered to match Spark's fold order). */
  def dotDuck(a: String, b: String, dim: Int): String =
    s"list_sum(list_transform(range(1, ${dim + 1}), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"

  def cosineSpark(a: String, b: String): String =
    s"${dotSpark(a, b)} / (sqrt(${dotSpark(a, a)}) * sqrt(${dotSpark(b, b)}))"

  def cosineDuck(a: String, b: String, dim: Int): String =
    s"${dotDuck(a, b, dim)} / (sqrt(${dotDuck(a, a, dim)}) * sqrt(${dotDuck(b, b, dim)}))"

  // ---- random-hyperplane LSH --------------------------------------------

  /** `bits`-bit hyperplane-sign bucket id for a `dim`-dim float array.
    * Hyperplane components are deterministic ±1 derived from md5("hp"+j).
    */
  def lshBucketSpark(v: String, bits: Int, dim: Int): String =
    s"""aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (acc, j) ->
       | acc + CASE WHEN
       |   aggregate(sequence(0, ${dim - 1}), CAST(0 AS DOUBLE), (a2, k) ->
       |     a2 + (2 * (shiftright(
       |         instr('0123456789abcdef',
       |           substr(md5(concat('hp', CAST(j AS STRING))), CAST(k div 4 + 1 AS INT), 1)) - 1,
       |         CAST(k % 4 AS INT)) % 2) - 1)
       |       * CAST(element_at($v, CAST(k + 1 AS INT)) AS DOUBLE)) > 0
       | THEN shiftleft(CAST(1 AS BIGINT), CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END)""".stripMargin

  def lshBucketDuck(v: String, bits: Int, dim: Int): String =
    s"""list_sum(list_transform(range(0, $bits), j ->
       | CASE WHEN
       |   list_sum(list_transform(range(0, $dim), k ->
       |     (2 * (((strpos('0123456789abcdef',
       |         substring(md5('hp' || j::VARCHAR), (k // 4) + 1, 1)) - 1) >> (k % 4)) & 1) - 1)
       |       * $v[k + 1]::DOUBLE)) > 0
       | THEN (1::BIGINT << j) ELSE 0::BIGINT END))""".stripMargin
}
