package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Physical AS-OF join: a single streaming merge pass per co-located
  * partition pair.
  *
  * The operator does NOT schedule its own data movement — it declares
  * `ClusteredDistribution(keys)` and `(keys, ts)` child ordering and
  * lets EnsureRequirements plan the exchanges and sorts (and AQE
  * re-plan them), exactly like SortMergeJoinExec. At 1000 executors
  * the cost is therefore one keyed shuffle + sort per side; the merge
  * itself holds O(1) state per partition: the current left key and
  * one buffered candidate right row — never a per-key group, so a hot
  * key degrades to a longer sorted run, not memory pressure.
  *
  * Matching: last right row (in (keys, ts, tiebreak) order) with equal
  * keys and rightTs <= leftTs, within `toleranceUs` when given;
  * unmatched left rows emit null values (left outer). Null keys never
  * match (SQL semantics); null timestamps never match.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightValues: Seq[Expression],
    valueAttrs: Seq[AttributeReference],
    rightTiebreak: Seq[Expression],
    toleranceUs: Option[Long],
    direction: AsOfDirection,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ valueAttrs

  // valueAttrs are born here, not read from a child (see AsOfJoin)
  override def producedAttributes: AttributeSet = AttributeSet(valueAttrs)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTs +: rightTiebreak)).map(SortOrder(_, Ascending)))

  // left rows pass through in order, so partitioning and ordering are
  // inherited — a downstream per-key operator reuses the exchange
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val tol = toleranceUs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
      val rValProj = UnsafeProjection.create(rightValues, right.output)
      val joiner = UnsafeProjection.create(output, left.output ++ valueAttrs)
      val joined = new JoinedRow
      val nullValues = new GenericInternalRow(valueAttrs.size)
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        // candidate = best (latest-ts) right row consumed for prevLKey;
        // O(1) state: two copied key/value rows + a long
        private var prevLKey: UnsafeRow = _
        private var candVal: UnsafeRow = _
        private var candTs: Long = Long.MinValue

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lrow = lIter.next()
          val lkey = lKeyProj(lrow)
          val lTsRow = lTsProj(lrow)
          val matchable = !lkey.anyNull && !lTsRow.isNullAt(0)
          val lts = if (matchable) lTsRow.getLong(0) else Long.MinValue

          if (prevLKey == null || keyOrd.compare(prevLKey, lkey) != 0) {
            prevLKey = lkey.copy()
            candVal = null
            candTs = Long.MinValue
          }
          // backward/nearest consume equal-ts rows into the backward
          // candidate (last in tiebreak order wins); forward leaves
          // them buffered so the FIRST equal-ts row is the match
          val consumeEq = direction != AsOfForward
          if (matchable) {
            // consume right rows strictly useless for this and every
            // later left row, so each right row is touched once
            var advance = true
            while (advance && rBuf.hasNext) {
              val rkey = rKeyProj(rBuf.head)
              if (rkey.anyNull) rBuf.next() // null keys never match
              else {
                val cmp = keyOrd.compare(rkey, lkey)
                if (cmp < 0) rBuf.next()
                else if (cmp > 0) advance = false
                else {
                  val rTsRow = rTsProj(rBuf.head)
                  if (rTsRow.isNullAt(0)) rBuf.next() // null ts never matches
                  else {
                    val rts = rTsRow.getLong(0)
                    if (rts < lts || (consumeEq && rts == lts)) {
                      if (direction != AsOfForward) {
                        // (keys, ts, tiebreak) order makes the LAST
                        // consumed row the winner at equal ts
                        candVal = rValProj(rBuf.head).copy()
                        candTs = rts
                      }
                      rBuf.next()
                    } else advance = false
                  }
                }
              }
            }
          }
          // forward candidate: the buffered head, NOT consumed — later
          // left rows at this key may need the same at-or-after row
          var fwdVal: InternalRow = null
          var fwdTs = Long.MaxValue
          if (direction != AsOfBackward && matchable && rBuf.hasNext) {
            val rkey = rKeyProj(rBuf.head)
            if (!rkey.anyNull && keyOrd.compare(rkey, lkey) == 0) {
              val rTsRow = rTsProj(rBuf.head)
              if (!rTsRow.isNullAt(0)) {
                fwdTs = rTsRow.getLong(0)
                fwdVal = rValProj(rBuf.head)
              }
            }
          }
          val bOk = matchable && candVal != null && tol.forall(t => lts - candTs <= t)
          val fOk = matchable && fwdVal != null && tol.forall(t => fwdTs - lts <= t)
          val (hit, hitVal) = direction match {
            case AsOfBackward => (bOk, candVal)
            case AsOfForward => (fOk, fwdVal)
            case AsOfNearest => // equal distance prefers backward
              if (bOk && (!fOk || (lts - candTs) <= (fwdTs - lts))) (true, candVal)
              else if (fOk) (true, fwdVal)
              else (false, null)
          }
          if (hit) numMatched += 1
          numOutputRows += 1
          joiner(joined(lrow, if (hit) hitVal else nullValues))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] to [[AsOfJoinExec]]. Registered both via
  * `GraftExtensions.injectPlannerStrategy` and idempotently per-session
  * by [[graft.operators.AsOfJoinOps]] (PlanBridge.ensureStrategy).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(j.leftKeys, j.rightKeys, j.leftTs, j.rightTs,
        j.rightValues, j.valueAttrs, j.rightTiebreak, j.toleranceUs,
        j.direction, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}
