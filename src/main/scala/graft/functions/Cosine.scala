package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity of two float/double vectors as a native Catalyst
  * expression — the compiled twin of `Similarity.cosineSpark`'s
  * zip_with/aggregate formulation.
  *
  * Bit-compatibility: the HOF form folds `acc + a_i*b_i` left-to-right
  * for each of the three dot products (a·b, a·a, b·b) and combines them
  * as `ab / (sqrt(aa) * sqrt(bb))`. This loop keeps three accumulators
  * with the SAME per-index add order, so every intermediate double is
  * identical and the DuckDB oracle (`Similarity.cosineDuck`, index-
  * ordered list_sum) needs no change.
  *
  * Why an Expression: the HOF pair allocates two lambda frames and an
  * intermediate array per evaluation and stays interpreted inside
  * codegen'd stages; this is a single fused loop (one pass, no
  * allocation) that keeps the surrounding plan in whole-stage codegen —
  * the same rationale as MinHashHex/HyperplaneLshBuckets, measured 2x+
  * on the ANN candidate-scoring stages.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def sideIsFloat(e: Expression, name: String): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"cosine_sim $name side requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }
  private lazy val leftIsFloat = sideIsFloat(left, "left")
  private lazy val rightIsFloat = sideIsFloat(right, "right")

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSim.compute($a, $b, $leftIsFloat, $rightIsFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  def compute(a: ArrayData, b: ArrayData,
      aIsFloat: Boolean, bIsFloat: Boolean): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"cosine_sim dimension mismatch: $n vs ${b.numElements()}")
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }
}
