package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, ArrayDistinct, ArrayIntersect, ArraySort, Expression, GreaterThan, If, IntegerLiteral, IsNull, LambdaFunction, LessThan, MapKeys, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.TextExpressions.SortedIntersectCount

/** Optimizer rule: `size(array_intersect(x, y))` → the codegen
  * merge-scan `sorted_intersect_count(x, y)` when both sides are
  * provably sorted ascending, duplicate-free, non-null `array<bigint>`
  * — i.e. written as `array_sort(array_distinct(...))`, the shape the
  * dedup operators (and any SQL user following their pattern) produce.
  *
  * Why: `array_intersect` builds a hash set and MATERIALIZES the
  * intersection array per row, only for `size` to immediately reduce
  * it to an int. On a pairwise-similarity join emitting millions of
  * candidate pairs, that is an allocation per pair on the hottest
  * path. The merge scan allocates nothing and stays inside
  * whole-stage codegen ([[graft.functions.TextExpressions.SortedIntersectCount]]).
  *
  * Safety gates (all must hold, otherwise the expression is left
  * untouched):
  *   - `size` in non-legacy mode (`size(NULL) = NULL`, matching the
  *     null-intolerant merge scan);
  *   - both inputs typed `array<bigint>` with `containsNull = false`
  *     (`getLong` cannot see a null element);
  *   - both inputs are `array_sort` over a provably duplicate-free
  *     producer (`array_distinct`, `map_keys`) — `array_intersect`
  *     dedups its output, the merge scan does not, so distinctness
  *     must come from the input;
  *   - the sort comparator is the DEFAULT ascending one. The matcher
  *     accepts both the raw `ArraySort.defaultComparator` shape and
  *     its null-branch-folded form (the optimizer strips the IsNull
  *     arms once elements are non-nullable). A custom lambda
  *     comparator — which may sort descending — never matches.
  *
  * Injected session-wide by [[graft.core.GraftExtensions]]; also
  * usable ad hoc via `spark.experimental.extraOptimizations`.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(a, b), false)
        if sortedDistinctNonNullLongs(a) && sortedDistinctNonNullLongs(b) =>
      SortedIntersectCount(a, b)
  }

  private def sortedDistinctNonNullLongs(e: Expression): Boolean = e match {
    case ArraySort(inner, f, _) =>
      e.dataType == ArrayType(LongType, containsNull = false) &&
        producesDistinct(inner) && isDefaultAscending(f)
    case _ => false
  }

  /** Producers whose output provably has no duplicate elements. */
  private def producesDistinct(e: Expression): Boolean = e match {
    case _: ArrayDistinct => true
    case _: MapKeys => true
    case _ => false
  }

  private def isDefaultAscending(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(l, r), _) => ascendingCore(body, l, r)
    case _ => false
  }

  /** Matches the body of `ArraySort.defaultComparator` bound to lambda
    * variables `l`/`r`. The IsNull prefix arms are dead code for
    * non-nullable elements (the only case we rewrite) and may or may
    * not have been folded away already, so they are skipped
    * structurally; the load-bearing part is the ascending
    * `If(l < r, -1, If(l > r, 1, 0))` core. Anything else → false.
    */
  @annotation.tailrec
  private def ascendingCore(e: Expression, l: Expression, r: Expression): Boolean = e match {
    case If(And(IsNull(a), IsNull(b)), IntegerLiteral(0), rest)
        if a.semanticEquals(l) && b.semanticEquals(r) =>
      ascendingCore(rest, l, r)
    case If(IsNull(a), IntegerLiteral(_), rest)
        if a.semanticEquals(l) || a.semanticEquals(r) =>
      ascendingCore(rest, l, r)
    case If(LessThan(a, b), IntegerLiteral(-1),
          If(GreaterThan(c, d), IntegerLiteral(1), IntegerLiteral(0)))
        if a.semanticEquals(l) && b.semanticEquals(r) &&
          c.semanticEquals(l) && d.semanticEquals(r) =>
      true
    case _ => false
  }
}
