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
 * into [[TopKPerKeyNode]] whenever the rank column itself is discarded
 * by the enclosing projection. The window formulation shuffles every
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
 *  - the rank column must be dead above the filter — if it survives,
 *    the window must run to produce it, and the plan is left alone.
 */
object InferTopKPerKey extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(_, Filter(cond, w: Window))
        if w.windowExpressions.size == 1 && w.partitionSpec.nonEmpty &&
          w.orderSpec.nonEmpty && isRowNumber(w.windowExpressions.head) =>
      val rnAttr = w.windowExpressions.head.toAttribute
      if (p.references.contains(rnAttr)) p
      else {
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
            val topk = TopKPerKeyNode(w.partitionSpec, w.orderSpec, k, child)
            p.copy(child = if (rest.isEmpty) topk else Filter(rest.reduce(And), topk))
          case _ => p
        }
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
