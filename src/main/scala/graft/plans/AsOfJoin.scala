package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Statistics}

/** Matching direction (pandas merge_asof parity):
  *   - [[AsOfBackward]] — greatest right ts AT-OR-BEFORE the left ts
  *     (the default; equal-ts ties go to the LAST row in tiebreak order)
  *   - [[AsOfForward]]  — smallest right ts AT-OR-AFTER the left ts
  *     (equal-ts ties go to the FIRST row in tiebreak order)
  *   - [[AsOfNearest]]  — whichever of the two is closer in |Δts|;
  *     equal distance prefers the backward match
  * Tolerance bounds the chosen side's |Δts| in every mode.
  */
sealed trait AsOfDirection extends Serializable
case object AsOfBackward extends AsOfDirection
case object AsOfForward extends AsOfDirection
case object AsOfNearest extends AsOfDirection

/** AS-OF join as a first-class logical operator: for every left row,
  * the single right row with equal join keys and the greatest event
  * time at-or-before the left row's event time (optionally within
  * `toleranceUs`), left-outer semantics. This is the point-in-time
  * lookup behind feature backfills — reference-side users express it
  * with a window over a union (cc-pyspark has no counterpart; the
  * composed route is registered as `j6_asof_join`); here it is the
  * whole-operator form the builder-prompt ladder reserves for
  * semantics worth a LogicalPlan + Strategy + SparkPlan.
  *
  * Scale shape: the physical operator declares clustered distribution
  * on the keys and (keys, ts) ordering for both children, so Catalyst
  * plans ONE hash exchange + sort per side and the join itself is a
  * single streaming merge pass per partition with O(1) state — no
  * window materialization of the union, no per-key buffering, no
  * inequality-join blowup. Skew bound = rows per key, identical to any
  * keyed operator.
  *
  * Construction contract (enforced by [[graft.operators.AsOfJoinOps]]):
  * children are ANALYZED plans; `leftTs`/`rightTs` are LongType (the
  * µs normal form from `Tables.tsMicros`); `valueAttrs` are FRESH
  * output attributes (never right-child pass-throughs), so output
  * exprIds stay unique even when both children read the same relation
  * (the self-join case that makes pass-through outputs ambiguous).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightValues: Seq[Expression],
    valueAttrs: Seq[AttributeReference],
    rightTiebreak: Seq[Expression],
    toleranceUs: Option[Long],
    direction: AsOfDirection = AsOfBackward) extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "as-of join needs at least one equi-key and matching key arity")
  // the exec builds its key ordering from LEFT key types and compares
  // rows projected with RIGHT-side types — a silent type mismatch would
  // produce garbage comparisons, so fail analysis loudly instead
  require(!(leftKeys ++ rightKeys ++ Seq(leftTs, rightTs)).forall(_.resolved) ||
      (leftKeys.map(_.dataType) == rightKeys.map(_.dataType) &&
        leftTs.dataType == rightTs.dataType),
    s"as-of join key/ts types must match pairwise between sides")
  require(rightValues.size == valueAttrs.size,
    "one output attribute per emitted right-side value")

  override def output: Seq[Attribute] = left.output ++ valueAttrs

  /** valueAttrs are born here (fresh exprIds), not consumed from a
    * child — without this, CheckAnalysis counts them missing input.
    */
  override def producedAttributes: AttributeSet = AttributeSet(valueAttrs)

  override lazy val resolved: Boolean =
    childrenResolved && expressions.forall(_.resolved)

  /** Row count is the left side's (left-outer: one output row per left
    * row); bytes are additive. Without this override the generic stats
    * visitor multiplies child sizes as if this were an unconstrained
    * join, which would veto legitimate broadcasts above the node.
    */
  override def stats: Statistics = {
    val l = left.stats
    Statistics(sizeInBytes = l.sizeInBytes + right.stats.sizeInBytes,
      rowCount = l.rowCount)
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}
