package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's bytes:
  *
  *   h = fold(bytes, 0) { (acc, b) => (acc * 31 + (b & 0xff)) mod 2^31 }
  *
  * Document fingerprinting primitive (content-defined chunking / shingle
  * fingerprints). Implemented as a native Catalyst expression with
  * `doGenCode` so it participates in whole-stage codegen — the preferred
  * extension point over a Scala UDF (boxed, opaque to the optimizer).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Mod = 1L << 31

  /** Static entry shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    acc
  }

}

/** Column-level entry points for graft's custom expressions. */
object GraftFunctions {
  import org.apache.spark.sql.GraftShims

  def rolling_hash(c: Column): Column =
    GraftShims.column(RollingHash(GraftShims.expression(c)))

  /** Multi-table hyperplane LSH bucket ids (see HyperplaneLshBuckets). */
  def lsh_buckets(c: Column, tables: Int, bits: Int): Column =
    GraftShims.column(HyperplaneLshBuckets(GraftShims.expression(c), tables, bits))

  /** 32-bit SimHash of a token array (see SimHash32). */
  def simhash32(c: Column): Column =
    GraftShims.column(SimHash32(GraftShims.expression(c)))

  /** k-permutation MinHash signature of a shingle array (see MinHashHex). */
  def minhash_hex(c: Column, k: Int): Column =
    GraftShims.column(MinHashHex(GraftShims.expression(c), k))

  /** Fused-loop cosine similarity of two vectors (see CosineSim). */
  def cosine_sim(a: Column, b: Column): Column =
    GraftShims.column(CosineSim(GraftShims.expression(a), GraftShims.expression(b)))

  /** PQ/ADC lattice distance of a query vector vs a sign code (see AdcDist). */
  def adc_dist(qv: Column, lo: Column, hi: Column): Column =
    GraftShims.column(AdcDist(GraftShims.expression(qv),
      GraftShims.expression(lo), GraftShims.expression(hi)))

  /** Unicode canonicalization: NFD → strip marks → NFC → lowercase. */
  def normalize_text(c: Column): Column =
    GraftShims.column(NormalizeText(GraftShims.expression(c)))

  /** Morton interleave of two keys' low 16 bits (see ZOrder2). */
  def zorder2(a: Column, b: Column): Column =
    GraftShims.column(ZOrder2(GraftShims.expression(a), GraftShims.expression(b)))

  /** General token-array BPE apply: merges in rank order, one greedy
    * left-to-right pass each (see BpeApply — arbitrary learned tables,
    * unlike the collision-free-only global-replace form).
    */
  def bpe_apply(tokens: Column, merges: Column): Column =
    GraftShims.column(BpeApply(GraftShims.expression(tokens),
      GraftShims.expression(merges)))

  /** Validating BPE detokenization: concat of the token stream after
    * checking every multi-char token is a product of the merge table
    * (see BpeDecode — `bpe_decode(bpe_apply(t, m), m)` is the identity).
    */
  def bpe_decode(tokens: Column, merges: Column): Column =
    GraftShims.column(BpeDecode(GraftShims.expression(tokens),
      GraftShims.expression(merges)))

  /** KMV distinct sketch: k smallest distinct hashes, mergeable (see
    * KmvSketch — a TypedImperativeAggregate, used like any agg column).
    */
  def kmv_sketch(c: Column, k: Int): Column =
    GraftShims.column(
      KmvSketch(GraftShims.expression(c), k).toAggregateExpression())

  /** Mergeable KLL-style quantile sketch: discrete quantiles at `probes`
    * (see QuantileSketch — exact when k ≥ group size, ε-rank-bounded
    * O(k·log(n/k)) state otherwise).
    */
  def quantile_sketch(c: Column, k: Int, probes: Seq[Double]): Column =
    GraftShims.column(
      QuantileSketch(GraftShims.expression(c), k, probes).toAggregateExpression())

  /** Register SQL names so `expr("rolling_hash(text)")` /
    * `expr("lsh_buckets(v, 8, 4)")` work too.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => graft.GraftExtensions.arity("rolling_hash", 1, exprs) {
        case Seq(c) => RollingHash(c)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_buckets", exprs => lshBucketsFromExprs(exprs), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash32", exprs => graft.GraftExtensions.arity("simhash32", 1, exprs) {
        case Seq(c) => SimHash32(c)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_hex", exprs => minhashHexFromExprs(exprs), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => graft.GraftExtensions.arity("cosine_sim", 2, exprs) {
        case Seq(a, b) => CosineSim(a, b)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "adc_dist", exprs => graft.GraftExtensions.arity("adc_dist", 3, exprs) {
        case Seq(q, lo, hi) => AdcDist(q, lo, hi)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_text", exprs => graft.GraftExtensions.arity("normalize_text", 1, exprs) {
        case Seq(c) => NormalizeText(c)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder2", exprs => graft.GraftExtensions.arity("zorder2", 2, exprs) {
        case Seq(a, b) => ZOrder2(a, b)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_apply", exprs => graft.GraftExtensions.arity("bpe_apply", 2, exprs) {
        case Seq(t, m) => BpeApply(t, m)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_decode", exprs => graft.GraftExtensions.arity("bpe_decode", 2, exprs) {
        case Seq(t, m) => BpeDecode(t, m)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch", exprs => kmvFromExprs(exprs), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantile_sketch", exprs => quantileSketchFromExprs(exprs), "built-in")
  }

  private[graft] def quantileSketchFromExprs(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
    (exprs: @unchecked) match {
      case Seq(c, Literal(k: Int, _), CreateArray(ps, _))
          if ps.forall(_.isInstanceOf[Literal]) =>
        QuantileSketch(c, k, ps.map {
          case Literal(d: Double, _) => d
          case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
          case other => throw new IllegalArgumentException(
            s"quantile_sketch: probe must be a double literal, got $other")
        }).toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "quantile_sketch(value: bigint, k: int literal, array(probe literals))")
    }
  }

  private[graft] def kmvFromExprs(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    (exprs: @unchecked) match {
      case Seq(c, Literal(k: Int, _)) => KmvSketch(c, k).toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "kmv_sketch(hash: bigint, k: int literal)")
    }
  }

  private[graft] def minhashHexFromExprs(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): MinHashHex = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    (exprs: @unchecked) match {
      case Seq(c, Literal(k: Int, _)) => MinHashHex(c, k)
      case _ => throw new IllegalArgumentException(
        "minhash_hex(shingles, k: int literal)")
    }
  }

  private[graft] def lshBucketsFromExprs(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): HyperplaneLshBuckets = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    (exprs: @unchecked) match {
      case Seq(c, Literal(t: Int, _), Literal(b: Int, _)) => HyperplaneLshBuckets(c, t, b)
      case _ => throw new IllegalArgumentException(
        "lsh_buckets(vector, tables: int literal, bits: int literal)")
    }
  }
}
