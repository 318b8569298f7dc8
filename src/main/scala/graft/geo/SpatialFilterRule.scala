package graft.geo

import org.apache.spark.sql.catalyst.expressions.{And, Expression, GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: `st_contains_point(<literal polygon>, x, y)` gains the
  * polygon's (precomputed, constant) envelope as ordinary range
  * predicates:
  *
  * {{{ x >= minx AND x <= maxx AND y >= miny AND y <= maxy AND exact }}}
  *
  * The payoff is not just short-circuiting the ray cast — the range
  * predicates are plain comparisons on data columns, so Catalyst pushes
  * them into the Parquet scan (min/max row-group skipping, PushedFilters)
  * where the opaque spatial predicate could never go. This is the
  * engine-level version of the reference's `prep(bbox)` prefilter
  * (SURVEY.md §4 "spatial index + prepared geometry").
  *
  * Idempotence: the rewritten [[ContainsPoint]] carries a fourth marker
  * child (`Literal(true)`) so the fixpoint optimizer doesn't re-wrap it.
  */
object SpatialFilterRule extends Rule[LogicalPlan] {

  private def envelope(geom: Literal): Option[(Double, Double, Double, Double)] = {
    geom.value match {
      case arr: ArrayData if arr.numElements() > 0 =>
        val ring = arr.getArray(0)
        val n = ring.numElements()
        if (n == 0) return None
        var minx = Double.MaxValue; var maxx = Double.MinValue
        var miny = Double.MaxValue; var maxy = Double.MinValue
        var i = 0
        while (i < n) {
          val p = ring.getArray(i)
          val x = p.getDouble(0); val y = p.getDouble(1)
          if (x < minx) minx = x; if (x > maxx) maxx = x
          if (y < miny) miny = y; if (y > maxy) maxy = y
          i += 1
        }
        Some((minx, miny, maxx, maxy))
      case _ => None
    }
  }

  /** The AND-envelope rewrite changes null semantics (null AND false =
    * false, where the bare predicate would stay null), which is only
    * equivalent where null and false are treated alike — i.e. in
    * Filter/Join conditions. So the rewrite is applied ONLY there, never
    * in projections or other expression contexts.
    */
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transform {
      case f @ Filter(cond, _) => f.copy(condition = rewrite(cond))
      case j @ Join(_, _, _, Some(cond), _) =>
        j.copy(condition = Some(rewrite(cond)))
    }

  private def rewrite(e: Expression): Expression =
    e.transform {
      case cp @ ContainsPoint(Seq(geom: Literal, x, y)) if geom.value != null =>
        envelope(geom) match {
          case Some((minx, miny, maxx, maxy)) =>
            val marked = ContainsPoint(Seq(geom, x, y, Literal(true)))
            And(
              And(
                And(GreaterThanOrEqual(x, Literal(minx, DoubleType)),
                  LessThanOrEqual(x, Literal(maxx, DoubleType))),
                And(GreaterThanOrEqual(y, Literal(miny, DoubleType)),
                  LessThanOrEqual(y, Literal(maxy, DoubleType)))),
              marked)
          case None => cp
        }
    }
}
