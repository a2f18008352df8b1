package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 32-bit SimHash over a token array as a native Catalyst expression.
  *
  * Produces EXACTLY the value of the SQL formulation
  * (Similarity.simhashFromToks / simhashDuck — bit j from md5 hex digit
  * j/4, bit j%4; bit set iff the signed token-vote sum is positive), so
  * the DuckDB oracle reproduces it unchanged.
  *
  * Why an Expression: the HOF form re-evaluates `md5(t)` inside the
  * per-bit lambda — 32 digests per token (plus instr/substr churn). This
  * computes ONE digest per token and folds all 32 bit-votes from its
  * first 4 bytes in a tight loop; one ThreadLocal MessageDigest, zero
  * per-row allocation beyond the digest output.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash32 requires ARRAY<STRING>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)

  override def prettyName: String = "simhash32"
}

object SimHash32 {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(toks: ArrayData): Long = {
    val votes = new Array[Int](32)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      // a NULL token poisons every per-bit aggregate to NULL in the SQL
      // twin (md5(NULL) propagates), making all 32 `NULL > 0` tests false
      // — the whole hash is 0. Match that exactly.
      if (toks.isNullAt(i)) return 0L
      val d = md5.get()
      d.reset()
      val digest = d.digest(toks.getUTF8String(i).getBytes)
      // bit j reads hex digit j/4 of the lowercase hex rendering: hex
      // char p is the high nibble of byte p/2 when p is even, low when
      // odd — only the first 8 hex chars (4 bytes) feed 32 bits
      var j = 0
      while (j < 32) {
        val p = j / 4
        val b = digest(p / 2) & 0xff
        val digit = if (p % 2 == 0) (b >> 4) & 0xf else b & 0xf
        votes(j) += 2 * ((digit >> (j % 4)) & 1) - 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}
