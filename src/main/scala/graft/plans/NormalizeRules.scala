package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.UnicodeNormalize

/** Injected optimizer rule — the fourth and last extension point the
  * engine exercises (expression codegen, SQL function registration,
  * planner strategy, and now a Rule[LogicalPlan] in the operator-
  * optimization batch). Unicode normalization is idempotent per form
  * (Normalizer.normalize(normalize(s, F), F) == normalize(s, F) by the
  * UAX#15 stability contract), and nested calls arise naturally when
  * composed pipelines each defensively normalize their input — e.g. a
  * dedup stage normalizing text a quality stage already normalized.
  * Collapsing the inner call removes a full per-row NFC pass from the
  * generated code; the rewrite fires wherever the expression tree
  * appears (projections, filters, join keys).
  *
  * The reference's optimizer is likewise a fixed batch of expression-
  * level canonicalization rules (doradb-plan/src/rule/expr_simplify.rs);
  * this is the Spark-native way to add one: Catalyst applies it to
  * fixpoint alongside the built-ins, and every operator that embeds the
  * expression benefits without changing a line of operator code. */
object CollapseNormalize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case UnicodeNormalize(UnicodeNormalize(inner, f1), f2) if f1 == f2 =>
        UnicodeNormalize(inner, f2)
    }
}

object NormalizeRules {
  val inject: SparkSessionExtensions => Unit =
    _.injectOptimizerRule(_ => CollapseNormalize)
}
