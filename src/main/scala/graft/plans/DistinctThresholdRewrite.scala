package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a `HAVING count(DISTINCT x) >= 2` threshold
  * into `min(x) <> max(x)` — the q95 doctrine (STRESS_r11) made
  * automatic, so the natural TPC-DS spelling of "at least two distinct
  * suppliers/warehouses/stores per group" stops paying for an exact
  * distinct count it immediately collapses to a boolean.
  *
  * Why it matters at scale: a single distinct aggregate plans as the
  * two-level (group ∪ distinct-key) aggregation — the shuffle carries
  * one row per (group, DISTINCT VALUE) and every partial buffer hashes
  * the value set. `min`/`max` carry two fixed-width partials per group:
  * one row per group on the wire, plain map-side combine, no per-value
  * state. Semantics are exactly preserved, nulls included:
  * count(DISTINCT x) ignores nulls, and so do min/max — a group of all
  * nulls gives count=0 (fails >= 2) and NULL <> NULL (null ⇒ filter
  * drops); one distinct non-null value gives min = max ⇒ false.
  *
  * Matches `Project(Filter(Aggregate))` — the shape the analyzer emits
  * for a HAVING whose count is NOT selected — and only rewrites a
  * count-distinct alias that (a) the Project does not reference, and
  * (b) appears in the Filter condition ONLY as `c >= 2` / `c > 1`
  * (or the mirrored literal-first forms): the one threshold min/max can
  * answer. Floating-point children are excluded (distinct-hashing and
  * ordering disagree on NaN/-0.0); `count(DISTINCT a, b)` and FILTERed
  * aggregates are left alone. The rewritten plan contains no distinct
  * aggregate, so the rule is idempotent under fixed-point.
  *
  * OFF by default: fires only when `spark.graft.rewriteDistinctThreshold`
  * is `true`. Install per-session via
  * `spark.experimental.extraOptimizations :+= DistinctThresholdRewrite`
  * or the [[GraftExtensions]] plug-in.
  */
object DistinctThresholdRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.rewriteDistinctThreshold"

  private def enabled: Boolean =
    SQLConf.get.getConfString(EnabledKey, "false").toBoolean

  /** Types where "two distinct values exist" ⟺ "min <> max": total
    * order consistent with equality. Float/double excluded — distinct
    * canonicalizes NaN and -0.0 differently from binary comparison.
    */
  private def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | BooleanType |
        StringType | DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** The alias's count-distinct child, if this aggregate expression is a
    * rewritable `count(DISTINCT x)`. */
  private def countDistinctChild(ne: NamedExpression): Option[Expression] =
    ne match {
      case Alias(AggregateExpression(Count(Seq(x)), _, true, None, _), _)
          if supported(x.dataType) && x.deterministic =>
        Some(x)
      case _ => None
    }

  /** Is this comparison `c >= 2` (in any of its four spellings)? */
  private def isThresholdOf(cmp: Expression, c: Attribute): Boolean =
    cmp match {
      case GreaterThanOrEqual(a: Attribute, Literal(v, _)) =>
        a.exprId == c.exprId && v != null && v.toString == "2"
      case GreaterThan(a: Attribute, Literal(v, _)) =>
        a.exprId == c.exprId && v != null && v.toString == "1"
      case LessThanOrEqual(Literal(v, _), a: Attribute) =>
        a.exprId == c.exprId && v != null && v.toString == "2"
      case LessThan(Literal(v, _), a: Attribute) =>
        a.exprId == c.exprId && v != null && v.toString == "1"
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case p @ Project(projList,
          Filter(cond, agg @ Aggregate(group, aggExprs, child, hint))) =>
        // Candidates: count(DISTINCT x) aliases the Project drops.
        val projRefs = AttributeSet(projList.flatMap(_.references))
        val candidates = aggExprs.flatMap { ne =>
          countDistinctChild(ne) match {
            case Some(x) if !projRefs.contains(ne.toAttribute) =>
              Some(ne.toAttribute -> x)
            case _ => None
          }
        }.filter { case (c, _) =>
          // Every reference to c in the condition must be one of the
          // rewritable threshold comparisons — no other usage.
          val total = cond.collect {
            case a: Attribute if a.exprId == c.exprId => a
          }.size
          val inThresholds = cond.collect {
            case cmp if isThresholdOf(cmp, c) => cmp
          }.size
          total > 0 && total == inThresholds
        }
        if (candidates.isEmpty) p
        else {
          val byId = candidates.toMap
          val minMax: Map[ExprId, (NamedExpression, NamedExpression)] =
            candidates.map { case (c, x) =>
              c.exprId -> (
                Alias(Min(x).toAggregateExpression(), "_dt_min")(),
                Alias(Max(x).toAggregateExpression(), "_dt_max")())
            }.toMap
          val dropped = candidates.map(_._1.exprId).toSet
          val newAggExprs = aggExprs.filterNot(ne =>
            dropped.contains(ne.toAttribute.exprId)) ++
            minMax.values.flatMap { case (mn, mx) => Seq(mn, mx) }
          val newCond = cond.transform {
            case cmp: Expression if byId.keys.exists(c => isThresholdOf(cmp, c)) =>
              val c = byId.keys.find(a => isThresholdOf(cmp, a)).get
              val (mn, mx) = minMax(c.exprId)
              Not(EqualTo(mn.toAttribute, mx.toAttribute))
          }
          Project(projList,
            Filter(newCond, Aggregate(group, newAggExprs, child, hint)))
        }
    }
  }
}
