package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.internal.SQLConf

/** Automatic rewrite onto a stored JOIN view — [[MvRewrite]]'s
  * discipline applied to the other expensive plan family: a query that
  * inner-joins the registered fact and dimension tables on the view's
  * equi-key, projecting only view columns, is redirected to the
  * pre-joined parquet artifact. At 100 TB this removes the dominant
  * shuffle of every such query (the fact-side exchange); together with
  * `dml_mv_join_delta` (incremental maintenance) it completes the join
  * MV's lifecycle: build once, maintain by delta, answer automatically.
  *
  * Match discipline (all-or-nothing, fail closed — the
  * [[MvRewrite]] contract):
  *  - the join must be INNER with exactly the recorded equi-condition
  *    (`o_custkey = c_custkey`, either operand order);
  *  - both children must be the registered base relations (path-pinned
  *    via conf, suffix-compared like MvRewrite), possibly under
  *    attribute-only projections — any Filter between vetoes (the view
  *    stores no predicate, so pushing one through would need predicate
  *    re-derivation this rule does not claim);
  *  - every projected expression's references must be view columns;
  *    the expressions themselves pass through re-bound (scalar work on
  *    view columns is answerable — the aggFree convention).
  * Output names and exprIds are preserved, so parent operators are
  * untouched. Rewritten plans scan ONLY the view artifact (spec-pinned
  * by scan paths).
  */
object MvJoinRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "graft.mvjoin.enabled"
  val PathKey = "graft.mvjoin.path"
  val FactKey = "graft.mvjoin.fact"
  val DimKey = "graft.mvjoin.dim"

  /** The view's column set: fact keys + the dimension payload. */
  val ViewCols: Set[String] =
    Set("o_orderkey", "o_custkey", "o_totalprice", "c_nationkey")

  private val built = new Memo[String, String]
  private val mvPlans = new Memo[String, LogicalPlan]

  /** Build (once per dir) the stored join view over RAW columns and
    * point the rule at it. Session-scoped enable, the MvRewrite
    * rationale: eligibility is exact by construction, so a rewritten
    * query can only get faster, never different. */
  def ensure(s: SparkSession, dir: String): Unit = {
    val path = built.once(dir) {
      val p = java.nio.file.Files.createTempDirectory("graft_mvjoin_")
        .toString + "/mv_orders_customer"
      graft.Tables.df(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .join(graft.Tables.df(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("c_nationkey"))
        .write.mode("overwrite").parquet(p)
      p
    }
    s.conf.set(PathKey, path)
    s.conf.set(FactKey, s"$dir/orders.parquet")
    s.conf.set(DimKey, s"$dir/customer.parquet")
    s.conf.set(EnabledKey, "true")
  }

  private def conf(key: String): String =
    SQLConf.get.getConfString(key, "")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf(EnabledKey) != "true" || conf(PathKey).isEmpty) plan
    else plan.transform {
      case p @ Project(_, j: Join) =>
        tryRewrite(p, j).getOrElse(p)
    }

  /** The named base relation under attribute-only projections. */
  private def isRel(p: LogicalPlan, srcConf: String): Boolean = p match {
    case Project(pl, ch) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      isRel(ch, srcConf)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          val src = conf(srcConf)
          src.nonEmpty &&
            fs.location.rootPaths.exists(_.toString.endsWith(src))
        case _ => false
      }
    case _ => false
  }

  private def tryRewrite(p: Project, j: Join): Option[LogicalPlan] = {
    if (j.joinType != Inner) return None
    val keyPair = j.condition match {
      case Some(EqualTo(a: AttributeReference, b: AttributeReference)) =>
        Set(a.name, b.name)
      case _ => return None
    }
    if (keyPair != Set("o_custkey", "c_custkey")) return None
    val sidesOk =
      (isRel(j.left, FactKey) && isRel(j.right, DimKey)) ||
        (isRel(j.left, DimKey) && isRel(j.right, FactKey))
    if (!sidesOk) return None
    // the join key equality makes c_custkey ≡ o_custkey in the view
    def viewName(n: String): String =
      if (n == "c_custkey") "o_custkey" else n
    if (!p.projectList.forall(_.references.forall(r =>
        ViewCols.contains(viewName(r.name))))) return None
    val mvCached = mvPlans.once(conf(PathKey))(
      SparkSession.active.read.parquet(conf(PathKey))
        .queryExecution.analyzed)
    val mv = mvCached match {
      case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
        m.newInstance()
      case other => other
    }
    def mvAttr(n: String): Attribute =
      mv.output.find(_.name == viewName(n)).get
    val rebound: Seq[NamedExpression] = p.projectList.map {
      case a: AttributeReference =>
        Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(child, name) =>
        Alias(child.transform {
          case a: AttributeReference => mvAttr(a.name)
        }, name)(exprId = al.exprId)
      case _ => return None
    }
    Some(Project(rebound, mv))
  }

  val inject: SparkSessionExtensions => Unit =
    _.injectOptimizerRule(_ => MvJoinRewrite)
}
