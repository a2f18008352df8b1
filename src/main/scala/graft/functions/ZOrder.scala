package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** 32-bit Morton (Z-order) interleave of two keys' low 16 bits:
  *
  *   z = Σ_{i<16} ((x>>i)&1) << 2i  |  ((y>>i)&1) << (2i+1)
  *
  * The multi-dimensional clustering key behind min/max file skipping
  * (Delta/Iceberg OPTIMIZE ZORDER). Native expression with `doGenCode`:
  * the bit-spread runs as four shift-mask steps per operand inside
  * whole-stage codegen, vs an interpreted 16-iteration higher-order
  * `aggregate` lambda per row for the SQL formulation it replaces.
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"zorder2 requires (BIGINT, BIGINT), got (${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder2.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOrder2.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zorder2"
}

object ZOrder2 {
  /** Spread the low 16 bits of v to even bit positions (0,2,4,…,30). */
  def spread(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Static entry shared by interpreted eval and generated code. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}
