package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Multi-table random-hyperplane LSH buckets as a native Catalyst
  * expression: returns `tables` bucket ids (each `bits` sign bits) for a
  * float/double vector. Hyperplane signs are the md5-derived ±1 matrix
  * (same formula as Similarity.hyperplaneSign / lshBucketDuckOffset, so
  * the DuckDB oracle reproduces buckets exactly), precomputed once per
  * (planes, dim) and shared.
  *
  * Why an Expression: unrolling tables*bits*dim (=2048) terms into SQL
  * made janino compile multi-second generated methods per stage; a lambda
  * HOF stays interpreted. A compiled loop with a cached sign matrix is
  * ~µs/row and keeps the surrounding plan in whole-stage codegen.
  *
  * Sizing: with fixed `bits`, bucket occupancy (and candidate pairs) grows
  * linearly with corpus size — production deployments should pick
  * bits ≈ log2(N / targetBucketSize) so buckets stay bounded.
  */
case class HyperplaneLshBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"lsh_buckets requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    HyperplaneLshBuckets.compute(input.asInstanceOf[ArrayData], tables, bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneLshBuckets.compute($c, $tables, $bits, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshBuckets =
    copy(child = newChild)

  override def prettyName: String = "lsh_buckets"
}

object HyperplaneLshBuckets {
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  /** ±1 sign matrix for `planes` hyperplanes over `dim` dims. */
  def signs(planes: Int, dim: Int): Array[Array[Double]] =
    signCache.computeIfAbsent((planes, dim), { _ =>
      Array.tabulate(planes, dim)((j, k) => Similarity.hyperplaneSign(j, k).toDouble)
    })

  def compute(a: ArrayData, tables: Int, bits: Int, isFloat: Boolean): ArrayData = {
    val dim = a.numElements()
    val s = signs(tables * bits, dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val plane = s(t * bits + j)
        var dot = 0.0
        var k = 0
        while (k < dim) {
          val v = if (isFloat) a.getFloat(k).toDouble else a.getDouble(k)
          dot += plane(k) * v
          k += 1
        }
        if (dot > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
