package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** k-permutation MinHash signature as a native Catalyst expression —
  * bit-identical to the SQL formulation (Similarity.minhashFromShingles /
  * minhashDuck: permutation i's hash of shingle s is md5(i || '|' || s),
  * the signature element is the MINIMUM hex string), so the DuckDB oracle
  * is unchanged: hex rendering preserves unsigned byte order, so the
  * minimum is taken over raw digests and hex-encoded once at the end.
  *
  * Why an Expression: the HOF form concatenates i|'|'|s into a fresh
  * string and routes through interpreted lambdas per (permutation,
  * shingle); this streams the two byte chunks straight into one
  * ThreadLocal digest and keeps k running minima.
  */
case class MinHashHex(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_hex requires ARRAY<STRING>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashHex.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashHex.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashHex =
    copy(child = newChild)

  override def prettyName: String = "minhash_hex"
}

object MinHashHex {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val hexChars = "0123456789abcdef".toCharArray
  // permutation prefixes depend only on k — never rebuild them per row
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def prefixesFor(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(k,
      kk => Array.tabulate(kk)(i => s"$i|".getBytes("UTF-8")))

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(bytes(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val minima = new Array[Array[Byte]](k)
    val prefixes = prefixesFor(k)
    val n = shingles.numElements()
    var s = 0
    while (s < n) {
      if (!shingles.isNullAt(s)) {
        val sb = shingles.getUTF8String(s).getBytes
        var i = 0
        while (i < k) {
          val d = md5.get()
          d.reset()
          d.update(prefixes(i))
          val digest = d.digest(sb)
          if (minima(i) == null || unsignedLess(digest, minima(i))) minima(i) = digest
          i += 1
        }
      }
      s += 1
    }
    // empty/all-null shingle arrays yield null elements, matching
    // array_min over an empty transform in the SQL formulation
    new GenericArrayData(minima.map(m => if (m == null) null else hex(m)))
  }
}
