package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrites the composable top-k idiom
  *
  *   Filter(rn <= k, Window(rn := row_number() over (partition p order o)))
  *
  * into [[TopKPerGroupPlan]] — transparent acceleration: users keep
  * writing the standard window pattern and get the bounded-heap exec
  * (one exchange, no partition sort) when the rewrite is safe:
  *
  *  - the rank column must not be consumed downstream (the rewrite
  *    drops it, so a Project pruning it away must sit directly above,
  *    or the filter's output is only the child columns);
  *  - the filter must be `rn <= k` / `rn < k` / `rn = 1` on a literal.
  *
  * OFF by default (`spark.graft.topk.rewrite=true` enables): Spark's
  * own WindowGroupLimit already prunes rows per group pre-shuffle, and
  * swapping a built-in plan under every existing query silently is not
  * this library's call to make — the flag is the user's opt-in, and
  * TopKRewriteSpec pins both the rewrite and result parity.
  */
case class TopKRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.topk.rewrite").contains("true")

  private object RowNumberWindow {
    /** Matches Window(... rn := row_number() over spec ...) producing
      * exactly one window expression; yields (rn attr, spec, child). */
    def unapply(p: LogicalPlan): Option[(Attribute, WindowSpecDefinition, LogicalPlan)] =
      p match {
        case w: Window if w.windowExpressions.size == 1 =>
          w.windowExpressions.head match {
            case a @ Alias(WindowExpression(_: RowNumber, spec), _) =>
              Some((a.toAttribute, spec, w.child))
            case _ => None
          }
        case _ => None
      }
  }

  private def boundOf(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(r: Attribute, IntegerLiteral(k)) if r.semanticEquals(rn) => Some(k)
      case LessThan(r: Attribute, IntegerLiteral(k)) if r.semanticEquals(rn) => Some(k - 1)
      case EqualTo(r: Attribute, IntegerLiteral(1)) if r.semanticEquals(rn) => Some(1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      // Project that drops the rank column, directly above the filter.
      case Project(projectList, Filter(cond, RowNumberWindow(rn, spec, child)))
          if !projectList.exists(_.exists(_.semanticEquals(rn)))
            && projectList.forall(_.isInstanceOf[Attribute])
            && spec.partitionSpec.forall(_.isInstanceOf[Attribute])
            && boundOf(cond, rn).exists(_ > 0) =>
        Project(projectList,
          TopKPerGroupPlan(spec.partitionSpec, spec.orderSpec,
            boundOf(cond, rn).get, child))
    }
}
