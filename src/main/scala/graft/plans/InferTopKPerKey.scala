package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, PredicateHelper, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Optimizer rule (the `Rule[LogicalPlan]` tier of the extension
 * ladder, injected via
 * `SparkSessionExtensions.injectOptimizerRule` in
 * [[graft.functions.GraftExtensions]]): rewrites the ubiquitous
 *
 * {{{
 *   SELECT <cols without rn> FROM (
 *     SELECT *, row_number() OVER (PARTITION BY g ORDER BY s) rn FROM t)
 *   WHERE rn <= k [AND p]
 * }}}
 *
 * into [[TopKPerKeyNode]]. The window formulation shuffles every
 * row of `t` and fully sorts each reducer partition; the rewritten
 * operator keeps a k-row heap per key on the map side, so the exchange
 * moves at most k rows per (key, input partition) and no reducer sort
 * runs at all — the difference between moving 10^11 rows and ~k·|keys|
 * at 100 TB. (Spark's own InferWindowGroupLimit bounds the window's
 * input the same way but still plans the window exec and its sort;
 * discarding the rank lets the whole window disappear.)
 *
 * Semantics are preserved exactly:
 *  - only `row_number` rewrites — `rank`/`dense_rank` keep >k rows on
 *    ties, which a k-bounded heap cannot represent;
 *  - residual conjuncts not referencing the rank column are re-applied
 *    above the operator (row_number is computed independently of them,
 *    so filtering before/after top-k selection commutes);
 *  - under order ties both formulations are tie-arbitrary in the same
 *    way (callers wanting determinism pass a total order, q94's
 *    documented contract);
 *  - a SURVIVING rank column rewrites too: the node re-exposes the
 *    window's own rank attribute (same exprId, same type), materialized
 *    by the final-phase heap as it drains — the k survivors of a key
 *    under a total order are exactly the rows row_number would have
 *    numbered 1..k, so the emitted ranks are identical and everything
 *    above the filter resolves unchanged.
 */
object InferTopKPerKey extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(_, Filter(cond, w: Window)) if supported(w) =>
      val rnAttr = w.windowExpressions.head.toAttribute
      // if the projection still needs the rank, the node emits it under
      // the window's own attribute (exprId-stable, so the projection
      // above resolves without rewriting)
      val rank = if (p.references.contains(rnAttr)) Some(rnAttr) else None
      rewrite(w, cond, rank).map(t => p.copy(child = t)).getOrElse(p)

    // no projection above the rank filter: the rank column is part of
    // the query result by construction, so emit it from the node
    case f @ Filter(cond, w: Window) if supported(w) =>
      rewrite(w, cond, Some(w.windowExpressions.head.toAttribute)).getOrElse(f)
  }

  private def supported(w: Window): Boolean =
    w.windowExpressions.size == 1 && w.partitionSpec.nonEmpty &&
      w.orderSpec.nonEmpty && isRowNumber(w.windowExpressions.head)

  /** The [[TopKPerKeyNode]] (plus any residual filter) replacing
    * `Filter(cond, w)`, or None when the rank conjunct isn't a
    * supported top-k shape. */
  private def rewrite(w: Window, cond: Expression,
      rank: Option[Attribute]): Option[LogicalPlan] = {
    val rnAttr = w.windowExpressions.head.toAttribute
    val (rnConds, rest) = splitConjunctivePredicates(cond)
      .partition(_.references.contains(rnAttr))
    rnConds.flatMap(limitOf(_, rnAttr)) match {
      case Seq(k) if rnConds.size == 1 && k > 0 =>
        // Spark's InferWindowGroupLimit may already have inserted a
        // WindowGroupLimit below the window from the same rank
        // filter; the heap operator subsumes it, so unwrap a
        // matching one instead of stacking redundant passes
        val child = w.child match {
          case wgl: WindowGroupLimit
              if wgl.limit >= k &&
                wgl.partitionSpec == w.partitionSpec &&
                wgl.orderSpec == w.orderSpec => wgl.child
          case c => c
        }
        val topk = TopKPerKeyNode(w.partitionSpec, w.orderSpec, k, child, rank)
        Some(if (rest.isEmpty) topk else Filter(rest.reduce(And), topk))
      case _ => None
    }
  }

  private def isRowNumber(e: Expression): Boolean = e match {
    case Alias(WindowExpression(RowNumber(), _), _) => true
    case _ => false
  }

  /** The k implied by one conjunct over the rank attribute, if the
    * conjunct is a supported shape. */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) && k == 1 => Some(1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }
}
