package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo,
  Expression, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression,
  RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule — the tier-(c) `Rule[LogicalPlan]` arm next to
  * [[TopKPerKeyStrategy]]'s planner arm: rewrite the ubiquitous
  * `Filter(row_number() <= k)` rank-limit idiom to pre-cut its input with
  * [[TopKPerKey]].
  *
  * {{{ Filter(rn <= k, Window(rn := row_number() over (P, O), child)) }}}
  * becomes
  * {{{ Filter(rn <= k, Window(rn := ..., TopKPerKey(P, O, k, child))) }}}
  *
  * Soundness: the filter keeps exactly the rows the window ranks 1..k per
  * partition, i.e. a k-minimal set under O — precisely the set TopKPerKey
  * retains (same partition keys, same sort order, same k). The window and
  * filter stay in place, so the visible output (including the rn column,
  * when projected) is unchanged; the window now sorts ≤ k rows per key
  * instead of the full partition, and the partial heaps cut the exchange
  * map-side. Where O carries ties at the boundary, row_number's choice
  * among tied rows is already execution-dependent — the rewrite picks an
  * equally valid set (the same caveat as Spark's own
  * `InferWindowGroupLimit`, which this rule strengthens: that rule still
  * sorts each partition; the heap cut never sorts the stream).
  *
  * Guards (all required): exactly ONE window expression and it is a bare
  * `row_number()` (any other function — rank with gaps, aggregates over
  * the partition — must see the FULL partition, so no cut is legal); the
  * filter compares that rn attribute to an integer literal via <=, < or
  * =; the window has a non-empty order; the child is not already cut.
  * An EMPTY partitionSpec is eligible (global top-k): TopKPerKey(Nil,...)
  * plans with an AllTuples final stage — partial heaps cut each partition
  * to ≤ k rows before the single-partition gather.
  * Conjunctions are handled by extracting the rn bound and keeping the
  * remaining predicates in the filter (they run over the rewound rows
  * unchanged).
  *
  * Not registered by default: rides `GraftExtensions`
  * (`injectOptimizerRule`) or `spark.experimental.extraOptimizations` —
  * the same opt-in surfaces as the strategy.
  */
object InferTopKFromRankFilter extends Rule[LogicalPlan] {

  /** The k bound a comparison places on `rn`, if it is one. */
  private def bound(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case EqualTo(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case And(l, r) =>
      val lb = bound(l, rn); val rb = bound(r, rn)
      (lb, rb) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case (s @ Some(_), None) => s
        case (None, s) => s
      }
    case _ => None
  }

  private def isBareRowNumber(ne: NamedExpression): Boolean = ne match {
    case Alias(WindowExpression(RowNumber(), _), _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(rnExpr), part, order, child, _))
        if isBareRowNumber(rnExpr) && order.nonEmpty &&
          !child.isInstanceOf[TopKPerKey] && child.resolved =>
      bound(cond, rnExpr.toAttribute) match {
        case Some(k) if k > 0 =>
          f.copy(child = w.copy(child = TopKPerKey(part, order, k, child)))
        case Some(_) => // rn <= 0: the filter is empty; leave it alone
          f
        case None => f
      }
  }
}
