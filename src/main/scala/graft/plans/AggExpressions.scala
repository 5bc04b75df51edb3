package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, Greatest, If, IsNull, Least, Literal, Or}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Second-smallest value of a group in ONE aggregation pass
  * (`graft_min2`) — a [[DeclarativeAggregate]], so it partial-
  * aggregates map-side and merges like `min` itself: no window, no
  * sort, no second pass over the input, and therefore immune to the
  * skewed-group trap of a `row_number` formulation (a window group
  * cannot be split by AQE; a hot key serializes — measured 2.2×
  * WORSE on simhash's 22k-doc signature families, see
  * OPTIMIZATION_r17.md §11.2).
  *
  * Semantics: the second element of the group's multiset in ascending
  * order — on DISTINCT inputs (the dedup pipelines' unique doc ids)
  * exactly "the smallest value ≠ min", the old two-pass
  * join+filter+groupBy's answer; on inputs containing duplicates of
  * the minimum it returns that duplicate (multiset rank 2). NULL for
  * groups with fewer than two non-null values; null inputs are
  * ignored like every builtin aggregate.
  *
  * The buffer is (m1, m2) in the child's own type; update/merge are
  * pure Least/Greatest/If trees, so the whole aggregate stays inside
  * whole-stage codegen for any ordering-capable input type.
  */
case class MinTwo(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  override def prettyName: String = "graft_min2"
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  private lazy val m1 = AttributeReference("m1", child.dataType)()
  private lazy val m2 = AttributeReference("m2", child.dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(m1, m2)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, child.dataType),
    Literal.create(null, child.dataType))

  // Least/Greatest skip nulls, so the only cases needing guards are
  // "ignore a null input row" and "the buffer is still empty" (m1
  // null ⇒ m2 must stay null rather than absorb the first value).
  // Both update expressions read the OLD buffer (Spark evaluates the
  // row before storing), so m2's Greatest(m1, child) sees pre-update
  // m1: the value pushed out of (or bouncing off) the minimum slot.
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), m1, Least(Seq(m1, child))),
    If(Or(IsNull(child), IsNull(m1)), m2,
      Least(Seq(m2, Greatest(Seq(m1, child))))))

  // Merging two buffers: the combined second-smallest is the least of
  // both m2s and the LARGER of the two m1s (the smaller m1 wins the
  // minimum slot; the other m1 re-enters the race for second). An
  // empty side contributes nothing — take the other side's m2 as-is.
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Least(Seq(m1.left, m1.right)),
    If(IsNull(m1.left), m2.right,
      If(IsNull(m1.right), m2.left,
        Least(Seq(m2.left, m2.right, Greatest(Seq(m1.left, m1.right)))))))

  override lazy val evaluateExpression: Expression = m2

  override protected def withNewChildInternal(newChild: Expression): MinTwo =
    copy(child = newChild)
}
