package graft

import graft.functions.{CosineSim, GraftFunctions, HyperplaneLshBuckets, MinHashHex, NormalizeText, RollingHash, SimHash32, ZOrder2}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: registers graft's custom Catalyst expressions into
  * the function registry, so a cluster deployment gets them with
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (the idiomatic extension path — SparkSessionExtensions.injectFunction —
  * instead of per-session manual registration).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.arity

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => arity("rolling_hash", 1, children) {
        case Seq(c) => RollingHash(c)
      }))
    ext.injectFunction((
      new FunctionIdentifier("lsh_buckets"),
      new ExpressionInfo(classOf[HyperplaneLshBuckets].getName, "lsh_buckets"),
      (children: Seq[Expression]) => GraftFunctions.lshBucketsFromExprs(children)))
    ext.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (children: Seq[Expression]) => arity("simhash32", 1, children) {
        case Seq(c) => SimHash32(c)
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_hex"),
      new ExpressionInfo(classOf[MinHashHex].getName, "minhash_hex"),
      (children: Seq[Expression]) => GraftFunctions.minhashHexFromExprs(children)))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => arity("cosine_sim", 2, children) {
        case Seq(a, b) => CosineSim(a, b)
      }))
    ext.injectFunction((
      new FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      (children: Seq[Expression]) => arity("normalize_text", 1, children) {
        case Seq(c) => NormalizeText(c)
      }))
    ext.injectFunction((
      new FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[ZOrder2].getName, "zorder2"),
      (children: Seq[Expression]) => arity("zorder2", 2, children) {
        case Seq(a, b) => ZOrder2(a, b)
      }))
  }
}

object GraftExtensions {
  /** Wrong-arity SQL calls fail with the standard WRONG_NUM_ARGS
    * AnalysisException (what every built-in raises), not an
    * IndexOutOfBoundsException from a bare `children(1)`.
    */
  private[graft] def arity(fn: String, expected: Int, children: Seq[Expression])(
      build: PartialFunction[Seq[Expression], Expression]): Expression =
    build.applyOrElse(children, (cs: Seq[Expression]) =>
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map(
          "functionName" -> s"`$fn`",
          "expectedNum" -> expected.toString,
          "actualNum" -> cs.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest")))
}
