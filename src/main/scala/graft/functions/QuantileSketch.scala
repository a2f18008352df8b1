package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable rank/quantile sketch (the KLL compactor scheme, made
  * deterministic): values live in levels, level h carrying weight 2^h;
  * a level past `k` items sorts and keeps alternate items (promoting
  * them one level up), with a per-sketch parity bit alternating which
  * offset survives — deterministic compaction instead of KLL's coin
  * flip, the same ε·n rank-error envelope with a slightly worse
  * constant (Karnin/Lang/Liberty, FOCS'16 analyze exactly this
  * derandomization as "sweep" compaction).
  *
  * Contract split (the KmvSketch precedent):
  *  - k ≥ group cardinality → NO compaction ever fires, the sketch IS
  *    the exact multiset, quantiles are exact discrete quantiles
  *    (min value whose rank ≥ ⌈q·n⌉) — bit-stable across engines and
  *    merge orders, which is the regime the DuckDB oracle gates.
  *  - k < n → O(k·log(n/k)) state per group at ANY group size (the
  *    property exact percentile aggregation lacks — its sort is
  *    group-sized); answers carry the ε rank-error bound, and the
  *    result may depend on Spark's partition merge order WITHIN that
  *    bound (the spec drives this regime and asserts the bound, not
  *    equality).
  *
  * Reference seat: gravity has no aggregation operators at all
  * (SURVEY §2.8); this is part of the analytics surface the Spark
  * engine adds — per-source latency/length percentiles over 100 TB
  * without a per-group sort.
  */
final class QSketchBuf(val k: Int) {
  // levels(h) = unsorted values with weight 2^h
  var levels: scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Long]] =
    scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer.empty[Long])
  var parity: Boolean = false
  var count: Long = 0L

  def insert(v: Long): Unit = {
    levels(0) += v
    count += 1
    compactIfNeeded()
  }

  def mergeIn(other: QSketchBuf): Unit = {
    while (levels.size < other.levels.size)
      levels += scala.collection.mutable.ArrayBuffer.empty[Long]
    var h = 0
    while (h < other.levels.size) {
      levels(h) ++= other.levels(h)
      h += 1
    }
    count += other.count
    // XOR the parities so merge order perturbs, never biases, the sweep
    parity ^= other.parity
    compactIfNeeded()
  }

  private def compactIfNeeded(): Unit = {
    var h = 0
    while (h < levels.size) {
      if (levels(h).size > k) {
        val sorted = levels(h).sorted
        // compact an EVEN count only — an odd item would break weight
        // conservation (2·⌈n/2⌉·w ≠ n·w); the largest stays behind at
        // this level, exactly the KLL leftover rule
        val even = sorted.size - (sorted.size % 2)
        val keepOdd = parity
        parity = !parity
        val promoted = scala.collection.mutable.ArrayBuffer.empty[Long]
        var i = if (keepOdd) 1 else 0
        while (i < even) { promoted += sorted(i); i += 2 }
        val leftover = scala.collection.mutable.ArrayBuffer.empty[Long]
        if (even < sorted.size) leftover += sorted.last
        levels(h) = leftover
        if (h + 1 >= levels.size)
          levels += scala.collection.mutable.ArrayBuffer.empty[Long]
        levels(h + 1) ++= promoted
      }
      h += 1
    }
  }

  /** Σ level sizes · 2^h — equals `count` exactly (weight conservation,
    * spec-asserted); the quantile scan normalizes against this. */
  def totalWeight: Long = {
    var w = 0L
    var h = 0
    while (h < levels.size) { w += levels(h).size.toLong << h; h += 1 }
    w
  }

  /** Discrete quantile: min value v with weightedRank(v) ≥ ⌈q·W⌉.
    * Returns null on an empty sketch (no non-null input ever arrived) so
    * the aggregate matches upstream percentile_approx semantics — a
    * global aggregation over an empty relation yields NULL, not a crash. */
  def quantiles(probes: Seq[Double]): Array[Long] = {
    val items = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var h = 0
    while (h < levels.size) {
      val w = 1L << h
      levels(h).foreach(v => items += ((v, w)))
      h += 1
    }
    if (items.isEmpty) return null
    val sorted = items.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    probes.map { q =>
      val target = math.max(1L, math.ceil(q * total).toLong)
      var cum = 0L
      var i = 0
      var res = sorted.last._1
      var found = false
      while (i < sorted.size && !found) {
        cum += sorted(i)._2
        if (cum >= target) { res = sorted(i)._1; found = true }
        i += 1
      }
      res
    }.toArray
  }
}

object QSketchBuf {
  /** Wire form shared by the aggregate's partial-buffer exchange and the
    * streaming processor's ValueState: parity, count, then per-level
    * value runs. */
  def toBytes(buf: QSketchBuf): Array[Byte] = {
    val n = buf.levels.iterator.map(_.size).sum
    val bb = java.nio.ByteBuffer.allocate(1 + 8 + 4 + buf.levels.size * 4 + 8 * n)
    bb.put(if (buf.parity) 1.toByte else 0.toByte)
    bb.putLong(buf.count)
    bb.putInt(buf.levels.size)
    buf.levels.foreach { lvl =>
      bb.putInt(lvl.size)
      lvl.foreach(bb.putLong)
    }
    bb.array()
  }

  def fromBytes(k: Int, bytes: Array[Byte]): QSketchBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new QSketchBuf(k)
    buf.parity = bb.get() == 1
    buf.count = bb.getLong
    val nLevels = bb.getInt
    require(nLevels >= 1 && nLevels <= 64,
      s"quantile_sketch: corrupt buffer ($nLevels levels)")
    buf.levels = scala.collection.mutable.ArrayBuffer.fill(nLevels)(
      scala.collection.mutable.ArrayBuffer.empty[Long])
    var h = 0
    while (h < nLevels) {
      val sz = bb.getInt
      require(sz >= 0 && sz <= 2 * k + 1,
        s"quantile_sketch: corrupt buffer (level $h size $sz, k $k)")
      var i = 0
      while (i < sz) { buf.levels(h) += bb.getLong; i += 1 }
      h += 1
    }
    buf
  }
}

case class QuantileSketch(child: Expression, k: Int, probes: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketchBuf] {

  require(k >= 8 && k <= (1 << 20),
    s"quantile_sketch: k must be in [8, ${1 << 20}], got $k")
  require(probes.nonEmpty && probes.forall(p => p > 0.0 && p <= 1.0),
    s"quantile_sketch: probes must be in (0, 1], got $probes")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // NULL on an empty group / all-NULL input (percentile_approx parity);
  // the array's own elements are never null.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch requires BIGINT, got ${other.sql}")
    }

  override def createAggregationBuffer(): QSketchBuf = new QSketchBuf(k)

  override def update(buf: QSketchBuf, input: InternalRow): QSketchBuf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: QSketchBuf, other: QSketchBuf): QSketchBuf = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: QSketchBuf): Any = {
    val qs = buf.quantiles(probes)
    if (qs == null) null else new GenericArrayData(qs)
  }

  override def serialize(buf: QSketchBuf): Array[Byte] =
    QSketchBuf.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): QSketchBuf =
    QSketchBuf.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketch =
    copy(child = newChildren.head)

  override def prettyName: String = "quantile_sketch"
}
