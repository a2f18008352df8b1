package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for corpus preprocessing: NFD decompose,
  * strip combining marks (accent removal), NFC re-compose, lowercase.
  *
  * This is the standard first normalization pass of a web-corpus pipeline
  * (reference keeps bytes opaque end-to-end — pkg/core/msg.go treats string
  * columns as raw values — so normalization is a new analytics-side op, not
  * a ported one). Implemented as a native Catalyst expression with
  * `doGenCode` so the pass stays inside whole-stage codegen; the JDK
  * `java.text.Normalizer` is the only dependency.
  *
  * Fast path: pure-ASCII inputs (the overwhelming majority of a real
  * corpus after language filtering) skip the Normalizer machinery entirely
  * and lowercase bytes in place — at 100 TB the non-ASCII slow path runs
  * on a small fraction of rows.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"normalize_text requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def prettyName: String = "normalize_text"
}

object NormalizeText {
  /** Static entry shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) {
      // ASCII fast path: lowercase bytes without decoding to String
      val out = new Array[Byte](bytes.length)
      var j = 0
      while (j < bytes.length) {
        val b = bytes(j)
        out(j) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        j += 1
      }
      UTF8String.fromBytes(out)
    } else {
      val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var k = 0
      while (k < nfd.length) {
        val c = nfd.charAt(k)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        k += 1
      }
      val recomposed = Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
      UTF8String.fromString(recomposed.toLowerCase(java.util.Locale.ROOT))
    }
  }
}
