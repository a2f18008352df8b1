package graft

import graft.functions.{GraftFunctions, HyperplaneLshBuckets, RollingHash}
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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHash(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("lsh_buckets"),
      new ExpressionInfo(classOf[HyperplaneLshBuckets].getName, "lsh_buckets"),
      (children: Seq[Expression]) => GraftFunctions.lshBucketsFromExprs(children)))
  }
}
