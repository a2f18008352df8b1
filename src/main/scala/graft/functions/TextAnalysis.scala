package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: tokenization,
  * shingling, language-ID heuristics, quality scoring, token statistics.
  *
  * Everything is built from Catalyst higher-order functions (`transform`,
  * `aggregate`, `filter`) over split tokens — codegen'd, no UDFs, fully
  * distributed, and expressible 1:1 in the DuckDB oracle SQL.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word 3-shingles of the string column named `colName` (SQL-expression
    * form — kept as SQL so the DuckDB oracle mirrors it term for term).
    * Requires >= 3 tokens (harness docs have >= 10).
    */
  def shingles3Sql(colName: String): String =
    s"""transform(sequence(1, size(split($colName, ' ')) - 2),
       |  i -> concat_ws(' ',
       |    element_at(split($colName, ' '), CAST(i AS INT)),
       |    element_at(split($colName, ' '), CAST(i + 1 AS INT)),
       |    element_at(split($colName, ' '), CAST(i + 2 AS INT))))""".stripMargin

  /** Count of tokens that belong to `set`. */
  def stopwordCount(toks: Column, set: Seq[String]): Column = {
    val arr = array(set.map(lit): _*)
    size(filter(toks, t => array_contains(arr, t)))
  }

  /** Heuristic language score: stopword-hit ratio for a candidate
    * stopword list — the classic cheap n-gram/stopword language-ID signal.
    */
  def stopwordRatio(text: Column, set: Seq[String]): Column = {
    val t = tokens(text)
    stopwordCount(t, set).cast("double") / size(t)
  }

  /** THE shipped stopword language detector ('enish' vs 'other') — the
    * single definition both the language-ID entry and its confusion-matrix
    * eval score, so threshold/list changes cannot diverge them.
    */
  val enishStopwords: Seq[String] = Seq("the", "a")
  val enishThreshold = 0.08
  def predLangEnish(text: Column): Column =
    when(stopwordRatio(text, enishStopwords) >= enishThreshold, lit("enish"))
      .otherwise(lit("other"))

  /** Mean token length (exact int arithmetic, one double division). */
  def meanTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks)

  /** Type-token ratio — distinct/total tokens, a repetition signal. */
  def typeTokenRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks)

  /** Composite quality score in [0,1]: favors longer docs (capped at 100
    * tokens) with low repetition. Fixed expression shape → deterministic.
    */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    lit(0.3) * typeTokenRatio(t) +
      lit(0.7) * least(lit(1.0), size(t).cast("double") / 100.0)
  }

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * other non-space chars — the standard cheap token-count proxy.
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Character trigrams — the n-gram unit of classic language-ID.
    * Texts shorter than 3 chars yield an empty array (a bare
    * sequence(1, length-2) would run DESCENDING for them).
    */
  def charTrigrams(text: Column): Column =
    when(length(text) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(text) - 2),
        i => text.substr(i.cast("int"), lit(3))))

  /** Fraction of the doc's char trigrams found in a language profile —
    * the textcat/n-gram-profile language-ID score (higher = closer).
    */
  def trigramProfileScore(text: Column, profile: Seq[String]): Column = {
    val tg = charTrigrams(text)
    val prof = array(profile.map(lit): _*)
    size(filter(tg, t => array_contains(prof, t))).cast("double") / size(tg)
  }
}
