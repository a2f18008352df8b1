package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** General token-array BPE apply as a native expression: for each merge
  * rule [left, right] IN RANK ORDER, one greedy left-to-right pass over
  * the token array replaces every adjacent (left, right) pair with
  * left||right. A single pass per rank is a fixpoint: a merge's output
  * token equals neither the rule's left nor right side (both are proper
  * prefixes/suffixes of it), so no new in-rule pair can appear behind
  * the scan head.
  *
  * This is the algorithm the global-string-replace formulation
  * (`txt_bpe_encode`'s curated table) only approximates: replaces on a
  * single-space token string can match ACROSS token boundaries (after
  * "t h"→"th", the string "th e" contains "h e"), so that form is
  * restricted to boundary-collision-free tables. Operating on the token
  * ARRAY makes every comparison whole-token, so ARBITRARY learned
  * tables — including collision-prone ones — round-trip learn→apply.
  *
  * `doGenCode` delegates to the static compute (the MinHashHex pattern)
  * so the pass stays inside whole-stage codegen. Cost O(ranks · tokens)
  * per row, zero shuffle — a pure map stage at 100 TB; the merge table
  * rides a broadcast-joined 1-row aggregate.
  */
case class BpeApply(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(ArrayType(StringType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_apply requires (ARRAY<STRING>, ARRAY<ARRAY<STRING>>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(tokens: Any, merges: Any): Any =
    BpeApply.compute(tokens.asInstanceOf[ArrayData], merges.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) => s"graft.functions.BpeApply.compute($t, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeApply =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bpe_apply"
}

/** BPE detokenization with stream validation: for the whole-token
  * formulation a token IS its character string, so decode is
  * concatenation — but a decoder that concatenates blindly would also
  * "decode" a corrupt stream. This one first derives the legal-token
  * closure from the merge table (a token is legal iff it is a single
  * character or the product `left||right` of a rule whose sides are
  * themselves legal — checkable in one rank-ordered pass, since BPE
  * builds strictly bottom-up) and fails loudly on any token outside it.
  *
  * `decode(bpe_apply(toks, merges), merges)` is the identity on the
  * joined input: bpe_apply only ever replaces adjacent (l, r) with
  * l||r, which preserves the concatenation. Pure map stage at 100 TB;
  * the table rides the same broadcast row as the encoder's.
  */
case class BpeDecode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(ArrayType(StringType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_decode requires (ARRAY<STRING>, ARRAY<ARRAY<STRING>>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(tokens: Any, merges: Any): Any =
    BpeDecode.compute(tokens.asInstanceOf[ArrayData], merges.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) => s"graft.functions.BpeDecode.compute($t, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeDecode =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bpe_decode"
}

object BpeDecode {

  /** One-entry per-thread cache of the derived legal-token closure. The
    * merge table is row-invariant (it rides a broadcast 1-row aggregate),
    * but codegen hands `compute` a FRESH ArrayData view per row — so
    * without a cache the closure is rebuilt per row and decode degrades
    * to O(rows × vocabulary). The cache key is a defensive `copy()` of
    * the table (an incoming view may alias a reused column buffer; the
    * stored key must not), compared by value; the cached set's entries
    * are all `UTF8String.concat` products, i.e. freshly allocated, so
    * they cannot alias a reused buffer either. A value-compare is
    * O(table bytes) with zero allocation — the rebuild it replaces was
    * O(table) hashing plus a full HashSet allocation per row.
    */
  private final class TableCache {
    var key: ArrayData = _
    var legal: java.util.HashSet[UTF8String] = _
  }
  private val cache = new ThreadLocal[TableCache] {
    override def initialValue(): TableCache = new TableCache
  }

  private def sameTable(a: ArrayData, b: ArrayData): Boolean = {
    if (a eq b) return true
    (a, b) match {
      case (x: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData,
            y: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData) =>
        x.equals(y) // bytewise memcmp over the unsafe buffers
      case _ =>
        val n = a.numElements()
        if (n != b.numElements()) return false
        var i = 0
        while (i < n) {
          if (a.isNullAt(i) != b.isNullAt(i)) return false
          if (!a.isNullAt(i)) {
            val ra = a.getArray(i)
            val rb = b.getArray(i)
            val m = ra.numElements()
            if (m != rb.numElements()) return false
            var j = 0
            while (j < m) {
              if (ra.isNullAt(j) != rb.isNullAt(j)) return false
              if (!ra.isNullAt(j) &&
                  !ra.getUTF8String(j).equals(rb.getUTF8String(j))) return false
              j += 1
            }
          }
          i += 1
        }
        true
    }
  }

  private def buildLegal(merges: ArrayData): java.util.HashSet[UTF8String] = {
    val legal = new java.util.HashSet[UTF8String]()
    val nm = merges.numElements()
    var m = 0
    while (m < nm) {
      if (merges.isNullAt(m))
        throw new IllegalArgumentException(s"bpe_decode: null merge at rank ${m + 1}")
      val rule = merges.getArray(m)
      if (rule.numElements() != 2 || rule.isNullAt(0) || rule.isNullAt(1))
        throw new IllegalArgumentException(
          s"bpe_decode: merge at rank ${m + 1} must be [left, right]")
      val l = rule.getUTF8String(0)
      val r = rule.getUTF8String(1)
      if ((l.numChars() != 1 && !legal.contains(l)) ||
          (r.numChars() != 1 && !legal.contains(r)))
        throw new IllegalArgumentException(
          s"bpe_decode: merge rank ${m + 1} ('$l','$r') is not constructible " +
            "from single characters and earlier ranks — malformed table")
      legal.add(UTF8String.concat(l, r))
      m += 1
    }
    legal
  }

  def compute(tokens: ArrayData, merges: ArrayData): UTF8String = {
    val c = cache.get()
    val legal =
      if (c.key != null && sameTable(c.key, merges)) c.legal
      else {
        val s = buildLegal(merges)
        c.key = merges.copy()
        c.legal = s
        s
      }
    val n = tokens.numElements()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i))
        throw new IllegalArgumentException(s"bpe_decode: null token at index $i")
      val t = tokens.getUTF8String(i)
      if (t.numChars() > 1 && !legal.contains(t))
        throw new IllegalArgumentException(
          s"bpe_decode: token '$t' at index $i is not a product of the " +
            "merge table — corrupt stream")
      parts(i) = t
      i += 1
    }
    UTF8String.concat(parts: _*)
  }
}

object BpeApply {
  def compute(tokens: ArrayData, merges: ArrayData): ArrayData = {
    var n = tokens.numElements()
    var cur = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      cur(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      i += 1
    }
    val nm = merges.numElements()
    var m = 0
    while (m < nm) {
      if (merges.isNullAt(m))
        throw new IllegalArgumentException(s"bpe_apply: null merge at rank ${m + 1}")
      val rule = merges.getArray(m)
      if (rule.numElements() != 2 || rule.isNullAt(0) || rule.isNullAt(1))
        throw new IllegalArgumentException(
          s"bpe_apply: merge at rank ${m + 1} must be [left, right]")
      val l = rule.getUTF8String(0)
      val r = rule.getUTF8String(1)
      val lr = UTF8String.concat(l, r)
      // greedy left-to-right pass, writing compacted output in place
      var w = 0 // write head: cur[0, w) is this pass's output so far
      var j = 0
      while (j < n) {
        val t = cur(j)
        if (w > 0 && t != null && cur(w - 1) != null &&
            cur(w - 1).equals(l) && t.equals(r)) {
          cur(w - 1) = lr
        } else {
          cur(w) = t
          w += 1
        }
        j += 1
      }
      n = w
      m += 1
    }
    if (n == cur.length) new GenericArrayData(cur)
    else new GenericArrayData(java.util.Arrays.copyOf(
      cur.asInstanceOf[Array[AnyRef]], n))
  }
}
