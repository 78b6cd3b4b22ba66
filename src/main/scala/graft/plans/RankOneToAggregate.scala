package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the "top-k records per key" window idiom
  *
  * {{{ filter(row_number().over(partitionBy(k).orderBy(o.desc)) === 1) }}}
  * {{{ filter(row_number().over(partitionBy(k).orderBy(o.desc)) <= n) }}}
  *
  * into a `max_by`/`min_by` aggregate over an ordering struct (rank 1)
  * or a bounded-heap [[TopKByAgg]] aggregate + posexplode (rank <= n).
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
  *  - the filter keeps exactly a rank PREFIX 1..k (`= 1`, `<= k`,
  *    `< k+1`, possibly AND-ed with other predicates, which are
  *    preserved above the rewrite; an inferred `IsNotNull(rn)` is
  *    dropped — rn is reconstructed exactly). Several rank bounds
  *    AND-ed together take the tightest. k = 1 rewrites to
  *    `max_by`/`min_by` (single-row buffer, no array); 1 < k <=
  *    `spark.graft.rewriteTopKMaxK` (default 1024) rewrites to
  *    [[TopKByAgg]] + posexplode, whose per-group state is O(k) —
  *    beyond the cap the window plan is kept (a giant k makes the
  *    bounded heap itself the memory hazard);
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
  val MaxKKey = "spark.graft.rewriteTopKMaxK"

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

  /** The upper bound a predicate places on a 1-based positive rank if it
    * keeps exactly the prefix 1..k: Some(k) for `rank <= k` and
    * equivalents, Some(1) for `rank = 1`, Some(MaxValue) for the
    * no-information IsNotNull the optimizer infers, None for anything
    * else (e.g. `rank = 2`, which keeps a non-prefix slice). */
  private def impliedK(p: Expression, rank: Attribute): Option[Int] = p match {
    case EqualTo(r: Attribute, IntegerLiteral(1)) if r.semanticEquals(rank) => Some(1)
    case EqualTo(IntegerLiteral(1), r: Attribute) if r.semanticEquals(rank) => Some(1)
    case LessThanOrEqual(r: Attribute, IntegerLiteral(k))
        if r.semanticEquals(rank) && k >= 1 => Some(k)
    case LessThan(r: Attribute, IntegerLiteral(k))
        if r.semanticEquals(rank) && k >= 2 => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), r: Attribute)
        if r.semanticEquals(rank) && k >= 1 => Some(k)
    case GreaterThan(IntegerLiteral(k), r: Attribute)
        if r.semanticEquals(rank) && k >= 2 => Some(k - 1)
    case IsNotNull(r: Attribute) if r.semanticEquals(rank) => Some(Int.MaxValue)
    case _ => None
  }

  private def tryRewrite(cond: Expression, w: Window): Option[LogicalPlan] =
    w.windowExpressions match {
      case Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _))
          if w.orderSpec.nonEmpty &&
            w.partitionSpec.forall(_.deterministic) &&
            w.orderSpec.forall(_.child.deterministic) =>
        val rank = alias.toAttribute
        val (rankPreds, rest) =
          splitConjuncts(cond).partition(_.references.contains(rank))
        val bounds = rankPreds.map(impliedK(_, rank))
        val k = if (bounds.isEmpty || bounds.contains(None)) None
          else bounds.flatten.reduceOption(math.min).filter(_ < Int.MaxValue)
        val maxK = conf.getConfString(MaxKKey, "1024").toInt
        val allAsc = w.orderSpec.forall(s =>
          s.direction == Ascending && s.nullOrdering == NullsFirst)
        val allDesc = w.orderSpec.forall(s =>
          s.direction == Descending && s.nullOrdering == NullsLast)
        if (k.isEmpty || k.get > maxK || !(allAsc || allDesc)) None
        else {
          val childOut = w.child.output
          val payload = CreateStruct(childOut)
          val orderKey = CreateStruct(w.orderSpec.map(_.child))
          val rewritten =
            if (k.get == 1) rankOnePlan(w, alias, rank, payload, orderKey, allAsc)
            else topKPlan(w, alias, rank, payload, orderKey, allAsc, k.get)
          Some(if (rest.isEmpty) rewritten else Filter(rest.reduce(And), rewritten))
        }
      case _ => None
    }

  /** k = 1: one `max_by`/`min_by` over the payload struct — a
    * single-row buffer per group, no array materialization. */
  private def rankOnePlan(w: Window, alias: Alias, rank: Attribute,
      payload: CreateNamedStruct, orderKey: CreateNamedStruct,
      allAsc: Boolean): LogicalPlan = {
    val childOut = w.child.output
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
    Project(restored :+ rankOut, guarded)
  }

  /** 1 < k: bounded-heap [[TopKByAgg]] per group (rank-ordered
    * `array<payload>`), exploded back to rows with the rank
    * reconstructed from the array position. Empty input needs no
    * guard in either grouping mode: a global aggregate's one output
    * row carries an EMPTY array, and the non-outer explode drops it. */
  private def topKPlan(w: Window, alias: Alias, rank: Attribute,
      payload: CreateNamedStruct, orderKey: CreateNamedStruct,
      allAsc: Boolean, k: Int): LogicalPlan = {
    val childOut = w.child.output
    val topk = Alias(AggregateExpression(
      TopKByAgg(payload, orderKey, k, asc = allAsc),
      Complete, isDistinct = false), "__topk")()
    val agg = Aggregate(w.partitionSpec, Seq(topk), w.child)
    val topkRef = topk.toAttribute
    val posAttr = AttributeReference("__pos", IntegerType, nullable = false)()
    val elemAttr = AttributeReference("__elem", payload.dataType,
      nullable = false)()
    val gen = Generate(PosExplode(topkRef), unrequiredChildIndex = Seq(0),
      outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, elemAttr), agg)
    val restored: Seq[NamedExpression] = childOut.zipWithIndex.map {
      case (a, i) =>
        Alias(GetStructField(elemAttr, i, Some(a.name)), a.name)(
          exprId = a.exprId, qualifier = a.qualifier)
    }
    // posexplode is 0-based; row_number is 1-based.
    val rankOut = Alias(Add(posAttr, Literal(1)), alias.name)(
      exprId = rank.exprId, qualifier = rank.qualifier)
    Project(restored :+ rankOut, gen)
  }
}
