package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule for the classic top-k scale-killer: `row_number()` over
  * a GLOBAL (unpartitioned) order, filtered to `rank <= k`. That plan
  * funnels the ENTIRE input through one window task — a SinglePartition
  * exchange whose wall time is the full dataset's sort on one core, no
  * matter how many executors the cluster has.
  *
  * The engine's own gates avoid the pattern by hand (`orderBy(...)
  * .limit(k)` first, then rank the k survivors — see vocab_topk,
  * bm25TopK); this rule applies the same rewrite to ANY user query:
  *
  *   Filter(rank <= k, Window(row_number over (ORDER BY o), input))
  *   ==> Filter(rank <= k, Window(..., Limit(k, Sort(o, input))))
  *
  * Sort+Limit plans as TakeOrderedAndProject (parallel per-partition
  * top-k + an O(k) driver merge) for k under
  * spark.sql.execution.topKSortFallbackThreshold, and as a distributed
  * sort + limit above it — both strictly better than the single-task
  * window, which now ranks only k rows. Row-identical whenever the window
  * order is total (the deterministic-tiebreak discipline every graft gate
  * follows); with ties, both the original and rewritten plan pick
  * arbitrary tie members, so the rewrite does not change the semantics
  * class.
  *
  * Conservative by construction: fires only on an unpartitioned
  * single-expression row_number window under a conjunct that bounds the
  * rank by a literal (`<=`, `<`, `=`, and their flipped forms), skips
  * bounds over [[MaxK]], and leaves the Filter + Window in place so
  * emitted rank values and schema are untouched. The GlobalLimit child
  * guard stops the fixed-point batch from re-wrapping its own rewrite.
  *
  * Injected by [[graft.GraftExtensions]] (`injectOptimizerRule`) or via
  * `GraftExtensions.register` (`spark.experimental.extraOptimizations`)
  * for sessions built elsewhere.
  */
object GlobalWindowTopK extends Rule[LogicalPlan] with PredicateHelper {

  /** Above this the rewrite stops paying: TakeOrdered falls back to a
    * distributed sort anyway and a huge k suggests the filter is not a
    * top-k at all. */
  private val MaxK = 10000000L

  private def litLong(x: Expression): Option[Long] = x match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case _ => None
  }

  /** The upper bound `k` a single conjunct puts on `rank`, if any. */
  private def boundOf(e: Expression, rank: Attribute): Option[Long] =
    e match {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rank) =>
        litLong(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rank) =>
        litLong(l).map(_ - 1)
      case EqualTo(a: Attribute, l) if a.semanticEquals(rank) => litLong(l)
      case EqualTo(l, a: Attribute) if a.semanticEquals(rank) => litLong(l)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rank) =>
        litLong(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rank) =>
        litLong(l).map(_ - 1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, w: Window)
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.size == 1 &&
          !w.child.isInstanceOf[GlobalLimit] =>
      w.windowExpressions.head match {
        case a @ Alias(
            WindowExpression(_: RowNumber, WindowSpecDefinition(Seq(), _, _)),
            _) =>
          val ks = splitConjunctivePredicates(cond)
            .flatMap(boundOf(_, a.toAttribute))
          ks.minOption match {
            case Some(k) if k > 0 && k <= MaxK =>
              f.copy(child = w.copy(child =
                Limit(Literal(k.toInt), Sort(w.orderSpec, global = true,
                  w.child))))
            case _ => f
          }
        case _ => f
      }
  }
}
