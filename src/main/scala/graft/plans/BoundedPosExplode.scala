package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PosExplode, Slice}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Bounded-explode rewrite: `Filter(pos < k, Generate(posexplode(arr)))`
  * becomes `Filter(pos < k, Generate(posexplode(slice(arr, 1, k))))` — the
  * generator materializes only the k rows the filter keeps instead of one
  * row per array element. For a "first k tokens per document" query over a
  * 100 TB corpus this is the difference between generating ~5 rows/doc and
  * generating |tokens| rows/doc then discarding all but 5.
  *
  * Safety: the original Filter is kept (the slice makes it a no-op, not a
  * semantics carrier), the array expression must be deterministic, and the
  * rewrite only fires for non-`outer` generates with a conjunct of the
  * exact shape `pos < k` / `pos <= k` (or mirrored) on the generator's own
  * ordinal output — `posexplode(slice(arr, 1, k))` yields exactly the
  * pairs `(0..k-1, arr[1..k])`, identical to the filtered original.
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule` (the
  * SURVEY §2.12 / §4 extension point for whole-plan rewrites); user rules
  * run after the main operator-optimization batch, by which time pushdown
  * has already parked the filter directly above the Generate.
  */
object BoundedPosExplode extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Smallest exclusive upper bound on `pos` provable from `cond`. */
  private def bound(cond: Expression, pos: Attribute): Option[Int] = {
    val ks = conjuncts(cond).collect {
      case LessThan(p: Attribute, Literal(k: Int, IntegerType)) if p.semanticEquals(pos) => k
      case LessThanOrEqual(p: Attribute, Literal(k: Int, IntegerType)) if p.semanticEquals(pos) => k + 1
      case GreaterThan(Literal(k: Int, IntegerType), p: Attribute) if p.semanticEquals(pos) => k
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), p: Attribute) if p.semanticEquals(pos) => k + 1
    }
    if (ks.isEmpty) None else Some(ks.min)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, g @ Generate(PosExplode(arr), _, false, _, out, _))
        if arr.deterministic && out.size == 2 && !arr.isInstanceOf[Slice] =>
      bound(cond, out.head) match {
        case Some(k) if k >= 0 =>
          f.copy(child = g.copy(generator =
            PosExplode(Slice(arr, Literal(1), Literal(math.max(k, 0))))))
        case _ => f
      }
  }
}
