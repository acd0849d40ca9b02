package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The (c)-tier custom operator (SURVEY §7.3, guide preference order): a
  * whole-operator backward as-of join as a first-class Catalyst citizen —
  * logical node, planner strategy (registered by [[graft.GraftExtensions]]),
  * and a sort-merge physical operator.
  *
  * Where the composed union-sentinel version ([[graft.operators.TemporalJoins
  * .asOfJoinBackward]], the (a)-tier) shuffles the UNION of both sides and
  * runs a running-`last` window, this operator asks Catalyst for
  * co-partitioned, co-sorted children (EnsureRequirements inserts the
  * exchanges/sorts) and then streams one merge pass per partition: O(1)
  * state per key, no window buffering, no union materialization — the plan
  * a native engine would run, with the same single-shuffle cost.
  *
  * Semantics are identical to the composed version (equivalence-tested and
  * oracle-checked by q53): most recent right row with rTime ≤ lTime per
  * key, optional tolerance, right rows with null time ignored, null keys
  * grouping together (window-partition semantics, not join-equality).
  */
object AsOfJoinNative {

  /** Logical node. `asofOutput` are the fresh output attributes
    * (`asof_<col>`, nullable) resolved at construction time.
    */
  final case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                                leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                                lTime: Attribute, rTime: Attribute,
                                rightValues: Seq[Attribute],
                                asofOutput: Seq[Attribute],
                                toleranceUs: Option[Long]) extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ asofOutput
    // asof_* attributes are minted by this operator, not read from children
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(asofOutput)
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: one physical candidate, children planned lazily. */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lk, rk, lt, rt, rv, out, tol) =>
        AsOfJoinExec(lk, rk, lt, rt, rv, out, tol, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Sort-merge as-of physical operator. */
  final case class AsOfJoinExec(leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                                lTime: Attribute, rTime: Attribute,
                                rightValues: Seq[Attribute],
                                asofOutput: Seq[Attribute],
                                toleranceUs: Option[Long],
                                left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

    override def output: Seq[Attribute] = left.output ++ asofOutput

    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(asofOutput)

    override def requiredChildDistribution: Seq[Distribution] =
      if (leftKeys.isEmpty) Seq(AllTuples, AllTuples)
      else Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

    // The right side additionally sorts by its value columns so the LAST row
    // among equal (key, time) is deterministic — matching the composed
    // version's ascending-struct tie-break (max values win). Without it the
    // surviving candidate would follow shuffle-fetch order.
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      (leftKeys :+ lTime).map(a => SortOrder(a, Ascending)),
      ((rightKeys :+ rTime) ++ rightValues).map(a => SortOrder(a, Ascending)))

    override def outputOrdering: Seq[SortOrder] =
      (leftKeys :+ lTime).map(a => SortOrder(a, Ascending))

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val lTimeIdx = lOut.indexWhere(_.exprId == lTime.exprId)
      val rTimeIdx = rOut.indexWhere(_.exprId == rTime.exprId)
      val keyTypes = leftKeys.map(_.dataType)
      val nVals = rightValues.size
      val tol = toleranceUs
      val lKeyExprs: Seq[Expression] = leftKeys
      val rKeyExprs: Seq[Expression] = rightKeys
      val rValExprs: Seq[Expression] = rightValues
      val outAttrs = output
      val lAttrs = lOut
      val asofAttrs = asofOutput
      left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
        val lKeyProj = UnsafeProjection.create(lKeyExprs, lAttrs)
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
        val rValProj = UnsafeProjection.create(rValExprs, rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val resultProj = UnsafeProjection.create(outAttrs, lAttrs ++ asofAttrs)
        val nullVals = new GenericInternalRow(nVals)
        val joined = new JoinedRow
        val rBuf = rIt.buffered

        var candKey: InternalRow = null
        var candTime: Long = 0L
        var candVals: InternalRow = null

        lIt.map { lRow =>
          val lKey = lKeyProj(lRow)
          val lNull = lTimeIdx >= 0 && lRow.isNullAt(lTimeIdx)
          val lT = if (lNull) Long.MinValue else lRow.getLong(lTimeIdx)
          // advance right while (rKey < lKey) or (rKey == lKey && rT <= lT);
          // each consumed row with non-null time becomes the candidate
          var advance = true
          while (advance && rBuf.hasNext) {
            val rHead = rBuf.head
            val rNullT = rHead.isNullAt(rTimeIdx)
            val rk = rKeyProj(rHead)
            val cmp = keyOrd.compare(rk, lKey)
            // null right times sort first; consume-and-skip them
            if (cmp < 0 || (cmp == 0 && (rNullT || (!lNull && rHead.getLong(rTimeIdx) <= lT)))) {
              val r = rBuf.next()
              if (!rNullT) {
                candKey = rKeyProj(r).copy()
                candTime = r.getLong(rTimeIdx)
                candVals = rValProj(r).copy()
              }
            } else advance = false
          }
          val matched = candKey != null && !lNull &&
            keyOrd.compare(candKey.asInstanceOf[InternalRow], lKey) == 0 &&
            tol.forall(t => lT - candTime <= t)
          resultProj(joined(lRow, if (matched) candVals else nullVals))
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
      copy(left = newLeft, right = newRight)
  }

  /** DataFrame-level API: same contract as
    * [[graft.operators.TemporalJoins.asOfJoinBackward]].
    */
  def asOfJoin(left: DataFrame, lTimeCol: String,
               right: DataFrame, rTimeCol: String,
               keys: Seq[String], rightValueCols: Seq[String],
               toleranceSeconds: Option[Long] = None): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    // re-alias the right side so a self-join never shares expression ids
    val rAliased = Project(
      right.queryExecution.analyzed.output.map(a => Alias(a, a.name)()),
      right.queryExecution.analyzed)
    val rPlan: LogicalPlan = rAliased
    val rOut = rAliased.output.map(_.asInstanceOf[Attribute])
    def lAttr(n: String): Attribute = lPlan.output.find(_.name == n)
      .getOrElse(sys.error(s"left column not found: $n"))
    def rAttr(n: String): Attribute = rOut.find(_.name == n)
      .getOrElse(sys.error(s"right column not found: $n"))
    val rightValues = rightValueCols.map(rAttr)
    val asofOutput = rightValues.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    GraftBridge.ofRows(left.sparkSession, AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(lAttr), keys.map(rAttr),
      lAttr(lTimeCol), rAttr(rTimeCol),
      rightValues, asofOutput,
      toleranceSeconds.map(_ * 1000000L)))
  }
}
