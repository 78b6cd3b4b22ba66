package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the "latest record per key" window idiom
  *
  * {{{ filter(row_number().over(partitionBy(k).orderBy(o.desc)) === 1) }}}
  *
  * into a `max_by`/`min_by` aggregate over an ordering struct.
  *
  * Why an engine rule and not a library helper: the window form is what
  * users (and 53 of the reference's 54 source queries — e.g. `Load HTS
  * Clients/src/main/resources/LoadHtsClients.sql:26-34`) naturally
  * write, but a window function cannot split a partition — every row of
  * a hot key sorts in ONE task no matter the cluster size, a serial
  * O(n log n) bottleneck that grows linearly with the hot key at 100 TB.
  * The aggregate form combines map-side (partial aggregation): each
  * input partition pre-collapses to one candidate row per key, so the
  * shuffle carries ~|tasks| rows per key instead of all of them. The
  * measured gap on a 99%-hot-key frame at sf0.1 is ~3x wall-clock
  * (`skew_latest_rank` strawman vs `skew_latest_window` in the bench),
  * unbounded as the hot key grows. Spark's own InferWindowGroupLimit
  * (3.5+) prunes rows entering the window sort but keeps the
  * sort-exchange-sort shape; this rewrite removes the sort entirely.
  *
  * Fires only when ALL of the following hold (else the plan is left
  * untouched):
  *  - the Window node computes exactly one expression, a `row_number()`;
  *  - the filter keeps exactly rank 1 (`= 1`, `<= 1`, `< 2`, possibly
  *    AND-ed with other predicates, which are preserved above the
  *    rewrite; an inferred `IsNotNull(rn)` is dropped — rn is now the
  *    literal 1);
  *  - every sort key is Ascending+NullsFirst (rewrites to `min_by`) or
  *    every key is Descending+NullsLast (rewrites to `max_by`). These
  *    are the two defaults (`.orderBy(c)` / `.orderBy(c.desc)`), and
  *    exactly the cases where Catalyst's struct ordering (null field
  *    sorts first/smallest) agrees with the window's SortOrder, so the
  *    rewrite is observation-equivalent even with NULL sort keys.
  *    Mixed directions or explicit NULLS LAST-on-asc bail out;
  *  - partition and sort expressions are deterministic.
  *
  * On sort-key ties both forms keep one arbitrary row (row_number ties
  * are already nondeterministic under Spark's unstable partition sort),
  * so determinism is unchanged: total order in, total order out.
  *
  * The rewritten subtree reproduces the original output attributes
  * (same exprIds, same order) with the rank column as literal 1, so
  * downstream references — including to the rank column itself — stay
  * valid.
  *
  * Disable with `SET spark.graft.rewriteRankOne=false`.
  */
object RankOneToAggregate extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rewriteRankOne"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").toBoolean) plan
    else plan.transformUp {
      case f @ Filter(cond, w: Window) => tryRewrite(cond, w).getOrElse(f)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** Predicate forms equivalent to `rank = 1` for a 1-based dense
    * positive rank (plus the IsNotNull the optimizer infers from them). */
  private def keepsRankOne(p: Expression, rank: Attribute): Boolean = p match {
    case EqualTo(r: Attribute, IntegerLiteral(1)) => r.semanticEquals(rank)
    case EqualTo(IntegerLiteral(1), r: Attribute) => r.semanticEquals(rank)
    case LessThanOrEqual(r: Attribute, IntegerLiteral(1)) => r.semanticEquals(rank)
    case LessThan(r: Attribute, IntegerLiteral(2)) => r.semanticEquals(rank)
    case GreaterThanOrEqual(IntegerLiteral(1), r: Attribute) => r.semanticEquals(rank)
    case GreaterThan(IntegerLiteral(2), r: Attribute) => r.semanticEquals(rank)
    case IsNotNull(r: Attribute) => r.semanticEquals(rank)
    case _ => false
  }

  private def isNotNullOnly(p: Expression): Boolean = p.isInstanceOf[IsNotNull]

  private def tryRewrite(cond: Expression, w: Window): Option[LogicalPlan] =
    w.windowExpressions match {
      case Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _))
          if w.orderSpec.nonEmpty &&
            w.partitionSpec.forall(_.deterministic) &&
            w.orderSpec.forall(_.child.deterministic) =>
        val rank = alias.toAttribute
        val (rankPreds, rest) =
          splitConjuncts(cond).partition(_.references.contains(rank))
        val rankOneOk = rankPreds.forall(keepsRankOne(_, rank)) &&
          rankPreds.exists(p => !isNotNullOnly(p))
        val allAsc = w.orderSpec.forall(s =>
          s.direction == Ascending && s.nullOrdering == NullsFirst)
        val allDesc = w.orderSpec.forall(s =>
          s.direction == Descending && s.nullOrdering == NullsLast)
        if (!rankOneOk || !(allAsc || allDesc)) None
        else {
          val childOut = w.child.output
          val payload = CreateStruct(childOut)
          val orderKey = CreateStruct(w.orderSpec.map(_.child))
          val aggFn =
            if (allAsc) MinBy(payload, orderKey) else MaxBy(payload, orderKey)
          val best = Alias(
            AggregateExpression(aggFn, Complete, isDistinct = false), "__best")()
          val agg = Aggregate(w.partitionSpec, Seq(best), w.child)
          val bestRef = best.toAttribute
          // A GLOBAL aggregate (empty partitionSpec) over empty input
          // still emits one row — max_by/min_by returns null there. The
          // original window form returns zero rows on empty input, so
          // drop that spurious row. (Grouped aggregates emit no rows on
          // empty input; no guard needed, and adding one would cost a
          // per-row predicate.)
          val guarded: LogicalPlan =
            if (w.partitionSpec.isEmpty) Filter(IsNotNull(bestRef), agg)
            else agg
          val restored: Seq[NamedExpression] = childOut.zipWithIndex.map {
            case (a, i) =>
              Alias(GetStructField(bestRef, i, Some(a.name)), a.name)(
                exprId = a.exprId, qualifier = a.qualifier)
          }
          val rankOut = Alias(Literal(1), alias.name)(
            exprId = rank.exprId, qualifier = rank.qualifier)
          val proj = Project(restored :+ rankOut, guarded)
          Some(if (rest.isEmpty) proj else Filter(rest.reduce(And), proj))
        }
      case _ => None
    }
}
