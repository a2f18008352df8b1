package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the full custom-operator ladder: a LogicalPlan
  * node, a SparkStrategy, and a SparkPlan doing a co-partitioned
  * single-pass sort-merge.
  *
  * Semantics (left as-of): every left row joins the LATEST right row with
  * an equal key and right.time <= left.time, or nulls when none exists —
  * the point-in-time lookup every CDC/temporal pipeline needs (reference
  * analogue: resolving a row against the newest snapshot at or before its
  * binlog position).
  *
  * Why a custom operator instead of composition: the union-carry-forward
  * formulation (StreamingQueries `evt_asof_last_signup_before_error`)
  * works but interleaves both tables through ONE window sort and carries
  * right columns through `last(ignoreNulls)` — one extra wide sort and a
  * carried column per payload field. This operator expresses the exact
  * physical intent: hash-partition both sides by key, sort each by
  * (key, time) — both Exchange and Sort are inserted by
  * EnsureRequirements from the declared requirements, so AQE still
  * controls partition counts — then one linear zipped merge per
  * partition. At 100 TB: one shuffle per side, no window state, memory
  * O(1) per partition (a single held right row), and the merge streams.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinNode → AsOfJoinExec. Injected via
  * GraftExtensions (injectPlannerStrategy) or session-locally through
  * spark.experimental.extraStrategies (AsOf.ensureRegistered).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinNode =>
      AsOfJoinExec(j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the key: EnsureRequirements inserts
  // compatible hash exchanges (same rule set that serves sort-merge join)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // each side sorted by (key..., time): the merge below is then one pass
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val keyTypes = lKeys.map(_.dataType)
    val timeType = lTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val timeOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(timeType))
      // bind by position over the joined (left ++ right) layout, but take
      // nullability from the JOIN's output: every right column is nullable
      // here even when the child attribute is not, or the projection would
      // skip null checks and read the null-padding row as zeros
      val resultProj = UnsafeProjection.create(
        (leftOut ++ rightOut).zipWithIndex.map { case (a, i) =>
          org.apache.spark.sql.catalyst.expressions.BoundReference(
            i, a.dataType, nullable = i >= leftOut.size || a.nullable)
        })
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var held: UnsafeRow = _        // newest right row matching the current key window
        private var heldKey: UnsafeRow = _
        private var lookahead: InternalRow = _ // next right row, read but not consumed

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTimeProj(l)
          if (held != null && keyOrd.compare(heldKey, lk) != 0) { held = null; heldKey = null }
          var done = false
          while (!done) {
            if (lookahead == null) {
              if (rIter.hasNext) lookahead = rIter.next() else done = true
            }
            if (!done) {
              val rk = rKeyProj(lookahead)
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0) {
                // right key already below every remaining left key (left
                // is sorted): this right row can never match again
                lookahead = null
              } else if (cmp > 0) {
                done = true
              } else {
                val rt = rTimeProj(lookahead)
                if (timeOrd.compare(rt, lt) <= 0) {
                  held = lookahead.asInstanceOf[UnsafeRow].copy()
                  heldKey = rk.copy()
                  lookahead = null
                } else done = true
              }
            }
          }
          resultProj(joined(l, if (held != null) held else nullRight))
        }
      }
    }
  }
}

/** User-facing entry: `AsOf.join(left, right, keys, keys, "lt", "rt")`.
  * Columns are resolved BY NAME against each side's analyzed plan (no
  * cross-side ambiguity even when both sides share column names).
  */
object AsOf {
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  def join(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lp = GraftShims.analyzed(left)
    val rp = GraftShims.analyzed(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"as-of join: no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    require(left.queryExecution.analyzed.outputSet
      .intersect(right.queryExecution.analyzed.outputSet).isEmpty,
      "as-of join sides share attribute ids — re-read one side (self-join needs fresh scans)")
    GraftShims.ofRows(spark, AsOfJoinNode(lp, rp,
      leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
      attr(lp, leftTime), attr(rp, rightTime)))
  }
}
