package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew and co-location tools for cluster-scale runs.
  *
  * AQE's skew-join splitting handles most skew at runtime; these are the
  * explicit levers for the cases it can't see — skewed aggregation keys
  * and repeated joins worth pre-bucketing. All deterministic (salt derives
  * from the row's own key via xxhash64, not from random()), so results
  * stay reproducible and retry-safe.
  */
object Scale {

  /** Deterministic salt in [0, buckets) derived from extra entropy
    * columns (e.g. a unique id) so one hot key spreads across buckets.
    */
  def salt(entropyCols: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(entropyCols: _*), lit(buckets))

  /** Two-phase skew-safe aggregation: partial-aggregate by (key, salt),
    * then final-aggregate by key. Works for any commutative re-aggregable
    * map of partial columns (sum/count/min/max).
    *
    * {{{
    * twoPhaseAgg(df, Seq($"k"), Seq($"id"), 16)(
    *   partial = _.agg(sum($"v").as("s"), count(lit(1)).as("c")),
    *   fin     = _.agg(sum($"s").as("s"), sum($"c").as("c")))
    * }}}
    */
  def twoPhaseAgg(df: DataFrame, keys: Seq[Column], entropy: Seq[Column], buckets: Int)(
      partial: org.apache.spark.sql.RelationalGroupedDataset => DataFrame,
      fin: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): DataFrame = {
    val salted = df.withColumn("__salt", salt(entropy, buckets))
    val part = partial(salted.groupBy(keys :+ col("__salt"): _*))
    fin(part.groupBy(keys: _*))
  }

  /** Salted join for one hot build side: the skewed (big) side gets a
    * deterministic salt; the small side is replicated across all salt
    * values; the join key becomes (key, salt). Equivalent rows, skew
    * spread over `buckets` tasks.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int,
      entropy: Seq[Column], joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(entropy, buckets))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<bigint>")))
    saltedBig.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write a table bucketed+sorted by join keys so repeated equi-joins and
    * aggregations on those keys skip the shuffle entirely (bucket pruning
    * + sort-merge without exchange). The standard prep for fact tables
    * that join on the same key constantly.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.drop(1): _*)
      .sortBy(keys.head, keys.drop(1): _*)
      .format("parquet")
      .saveAsTable(table)
}
