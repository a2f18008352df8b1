package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source↔target consistency checking — the reference ships this as
  * separate programs: `cmd/verifier` (row-by-row compare,
  * /root/reference cmd/verifier/main.go) and `dcp` (stream consistency
  * profiler, dcp/checker/checker.go:11-150). On Spark both collapse into
  * relational compares over snapshots.
  */
object Consistency {

  /** Order-independent table checksum: sum of per-row xxhash64 over all
    * columns — the distributed analogue of the reference's
    * `CHECKSUM TABLE` equality gate (pkg/mysql_test/generator.go:257-282).
    */
  def checksum(df: DataFrame): java.math.BigDecimal = {
    // decimal accumulation: a long sum would overflow under ANSI mode
    val h = xxhash64(df.columns.sorted.map(col): _*).cast("decimal(38,0)")
    df.select(sum(h)).head().getDecimal(0)
  }

  /** Row-level diff via full outer join on the key: returns rows present
    * on one side only or differing in any non-key column, with a
    * per-side payload hash for quick triage.
    */
  def diff(src: DataFrame, tgt: DataFrame, pkCols: Seq[String]): DataFrame = {
    val dataCols = src.columns.filterNot(pkCols.contains).sorted
    def hashed(df: DataFrame, side: String) =
      df.select(pkCols.map(col) :+
        xxhash64(dataCols.map(col): _*).as(s"${side}_hash"): _*)
    hashed(src, "src").join(hashed(tgt, "tgt"), pkCols, "full_outer")
      .withColumn("status",
        when(col("tgt_hash").isNull, "missing_in_target")
          .when(col("src_hash").isNull, "missing_in_source")
          .when(col("src_hash") =!= col("tgt_hash"), "mismatch")
          .otherwise("ok"))
      .filter(col("status") =!= "ok")
  }

  /** Symmetric difference by full row (EXCEPT both ways) — exact but
    * heavier; use `diff` for keyed tables.
    */
  def symmetricExcept(src: DataFrame, tgt: DataFrame): (DataFrame, DataFrame) =
    (src.except(tgt), tgt.except(src))
}
