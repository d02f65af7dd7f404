package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the dense dot product over
  * array<double> — the one kernel where the built-in surface is not
  * enough (SURVEY §7.3 tier (b)): `aggregate`/`zip_with` higher-order
  * functions are interpreted per element and allocate an intermediate
  * array per row, which dominates O(n·q) similarity scans. This
  * expression participates in whole-stage codegen with a primitive
  * double loop — same ascending-index multiply/add order as
  * [[Vectors.dot]] and the DuckDB oracle, so results are bit-identical.
  *
  * Registered as SQL function `graft_dot` via [[DotProduct.register]]
  * (the SparkSessionExtensions route, usable with
  * `spark.sql.extensions=graft.functions.GraftExtensions`).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  /** NULL on length mismatch or a null element — the same contract as
    * the declarative `Vectors.dot` (null-padded zip_with), which this
    * expression is documented bit-identical to. Truncating to
    * min(length) would score corrupt embeddings as plausible numbers
    * instead of surfacing them as nulls. */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val fnName = "graft_dot"

  private val info = new ExpressionInfo(classOf[DotProduct].getName, fnName)

  private val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotProduct(a, b)
    case other => throw new IllegalArgumentException(
      s"$fnName expects 2 arguments, got ${other.size}")
  }

  /** Injection point for `spark.sql.extensions`. */
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier(fnName), info, builder))

  /** Imperative registration for sessions not built through
    * [[graft.Session]] (e.g. a harness-owned session): idempotent. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(fnName)
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
  }
}

/** `spark.sql.extensions` entry class registering the FULL engine
  * surface — expressions, the as-of planner strategy, and the optimizer
  * rule — so a conf-configured session plans everything
  * [[graft.Session]]-built sessions can (previously this route missed
  * the strategy and AsOfJoinNode died with "no plan for"). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    DotProduct.inject(ext)
    Bloom.inject(ext)
    UnicodeNormalize.inject(ext)
    graft.plans.AsOfJoinNative.inject(ext)
    graft.plans.NormalizeRules.inject(ext)
  }
}
