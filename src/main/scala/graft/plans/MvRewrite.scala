package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
import org.apache.spark.sql.internal.SQLConf

/** Materialized-view AUTOMATIC REWRITE — the optimizer capability that
  * makes MVs useful without queries opting in: an aggregate over the
  * BASE table is redirected to a pre-aggregated summary when (and only
  * when) the summary can answer it exactly. The MV here is lineitem
  * rolled up by (l_returnflag, l_linestatus, l_shipdate) carrying a row
  * count and exact DECIMAL sums; a matching query may group by any
  * SUBSET of those dimensions — the rewrite re-aggregates the partials
  * (count → Sum(cnt), sum → Sum(partial sum), decimal addition is
  * associative so the roll-up is bit-exact, the reason the MV stores
  * Money-cast decimals rather than raw doubles).
  *
  * Match discipline (all-or-nothing, fail closed):
  *  - the aggregate's child must be the registered base relation —
  *    the scan's root path is compared against the conf-recorded
  *    source, so an MV built from one fixture dir can never answer
  *    another dir's query; any Filter in between blocks the rewrite
  *    (a predicate on a non-dimension column is not answerable);
  *  - every grouping key must be an MV dimension;
  *  - every aggregate must be one of the recognized forms
  *    (`count(1)`, or `sum`/`min`/`max` over EXACTLY the Money-cast of
  *    a measure, with no DISTINCT and no FILTER clause; no grouping at
  *    all also vetoes — Sum over an empty MV is NULL where count must
  *    be 0). One unrecognized expression vetoes the whole rewrite — a
  *    partial rewrite would read both tables.
  * Output names, exprIds, and types are preserved (the decimal
  * roll-up's widened precision is cast back), so the parent plan is
  * untouched.
  *
  * At 100 TB this is the difference between a 600-billion-row scan and
  * a dimension-cardinality one; the MV itself is one shuffle to build
  * and incrementally maintainable (`dml_incremental_rollup` is the
  * maintenance pattern). The reference's optimizer is a rule pipeline
  * over its own plan IR (doradb-plan/src/rule/mod.rs); this is the
  * Spark-native extension point for adding such a rule —
  * injectOptimizerRule, applied to fixpoint with the built-ins. */
object MvRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "graft.mv.enabled"
  val PathKey = "graft.mv.path"
  val SrcKey = "graft.mv.src"

  /** Build fingerprint of the base relation's files at ensure() time
    * (the MvJoinRewrite freshness discipline): re-checked at match
    * time, so a base-table change can silence the rule but never serve
    * stale partials. */
  val SrcFpKey = "graft.mv.srcfp"

  /** MV dimensions (grouping keys the summary can serve). */
  val Dims: Seq[String] = Seq("l_returnflag", "l_linestatus", "l_shipdate")

  /** Base measure columns with MV partials (`sum_`/`min_`/`max_`
    * prefixed columns per measure, plus the shared `cnt`). */
  private val Measures = Set("l_quantity", "l_extendedprice")

  /** The measure name iff `e` is EXACTLY the Money-cast of one: a
    * differently-scaled decimal rounds per ROW before aggregating,
    * which no post-hoc transform of the partials can reproduce —
    * answering it from the MV would be silently wrong, so it vetoes. */
  private def moneyMeasure(e: Expression): Option[String] = e match {
    case c: Cast if c.dataType == graft.functions.Money.M =>
      c.child match {
        case a: AttributeReference if Measures.contains(a.name) =>
          Some(a.name)
        case _ => None
      }
    case _ => None
  }

  /** dir -> built MV path (at most one build per fixture dir). */
  private val mvBuilt = new Memo[String, String]

  /** MV path -> analyzed scan plan (stable exprIds per session). */
  private val mvPlans = new Memo[String, LogicalPlan]

  /** The MV's partial-aggregate projection — ONE builder serves the
    * full build and the incremental refresh so the schemas can never
    * diverge. Counts and decimal sums re-aggregate by Sum; min/max
    * partials re-aggregate by Min/Max (self-mergeable, no widening). */
  private def mvPartials(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import graft.functions.Money.m
    df.groupBy(Dims.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(m(col("l_quantity"))).as("sum_l_quantity"),
        sum(m(col("l_extendedprice"))).as("sum_l_extendedprice"),
        min(m(col("l_quantity"))).as("min_l_quantity"),
        max(m(col("l_quantity"))).as("max_l_quantity"),
        min(m(col("l_extendedprice"))).as("min_l_extendedprice"),
        max(m(col("l_extendedprice"))).as("max_l_extendedprice"))
  }

  /** Build the MV parquet for `dir`'s lineitem (once) and point the
    * rule at it.
    *
    * The enable is deliberately SESSION-scoped and never reset: an MV
    * exists precisely so every later eligible query benefits without
    * opting in. That is safe because eligibility is bit-exact by
    * construction — the match requires the exact Money decimal type
    * (per-row rounding under any other scale cannot be reproduced from
    * partials and vetoes), non-empty grouping, and the pinned source —
    * so a rewritten query can never answer differently, only faster. */
  def ensure(s: SparkSession, dir: String): Unit = {
    val path = mvBuilt.once(dir) {
      val p = java.nio.file.Files.createTempDirectory("graft_mv_")
        .toString + "/mv_lineitem_agg"
      mvPartials(graft.Tables.df(s, dir, "lineitem"))
        .write.mode("overwrite").parquet(p)
      p
    }
    s.conf.set(PathKey, path)
    s.conf.set(SrcKey, s"$dir/lineitem.parquet")
    s.conf.set(SrcFpKey,
      MvJoinRewrite.fingerprint(s, s"$dir/lineitem.parquet"))
    s.conf.set(EnabledKey, "true")
  }

  /** dir -> incrementally-refreshed MV path. */
  private val mvIncBuilt = new Memo[String, String]

  /** The full MV LIFECYCLE composed: build the summary from a BASE
    * slice of lineitem, then MERGE a delta batch's partials in — the
    * refresh touches only stored-MV ∪ delta keys, never re-scanning
    * the base slice (the `dml_incremental_rollup` maintenance shape
    * applied to this MV) — and point the rewrite at the refreshed
    * artifact so a FULL-table query is answered from it. Decimal
    * partials re-aggregate exactly; the widened sum precision is cast
    * back so the refreshed MV keeps the canonical schema. */
  def ensureIncremental(s: SparkSession, dir: String): Unit = {
    val path = mvIncBuilt.once(dir) {
      val root = java.nio.file.Files.createTempDirectory("graft_mv_")
        .toString
      val li = graft.Tables.df(s, dir, "lineitem")
      mvPartials(li.filter(col("l_orderkey") % 10 =!= 9))
        .write.parquet(s"$root/base")
      val stored = s.read.parquet(s"$root/base")
      val sumType = stored.schema("sum_l_quantity").dataType
      val delta = mvPartials(li.filter(col("l_orderkey") % 10 === 9))
      stored.unionByName(delta)
        .groupBy(Dims.map(col): _*)
        .agg(sum(col("cnt")).as("cnt"),
          sum(col("sum_l_quantity")).cast(sumType).as("sum_l_quantity"),
          sum(col("sum_l_extendedprice")).cast(sumType)
            .as("sum_l_extendedprice"),
          min(col("min_l_quantity")).as("min_l_quantity"),
          max(col("max_l_quantity")).as("max_l_quantity"),
          min(col("min_l_extendedprice")).as("min_l_extendedprice"),
          max(col("max_l_extendedprice")).as("max_l_extendedprice"))
        .write.parquet(s"$root/mv_lineitem_agg")
      s"$root/mv_lineitem_agg"
    }
    s.conf.set(PathKey, path)
    s.conf.set(SrcKey, s"$dir/lineitem.parquet")
    s.conf.set(SrcFpKey,
      MvJoinRewrite.fingerprint(s, s"$dir/lineitem.parquet"))
    s.conf.set(EnabledKey, "true")
  }

  private def conf(key: String): String =
    SQLConf.get.getConfString(key, "")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf(EnabledKey) != "true" || conf(PathKey).isEmpty) plan
    else {
      // one freshness listing per base per rule invocation (the fpOnce
      // contract) — candidate relations share it instead of re-listing
      val look = MvJoinRewrite.fpOnce(SparkSession.active)
      plan.transform {
        case agg: Aggregate if isBase(agg.child, look) =>
          tryRewrite(agg).getOrElse(agg)
      }
    }

  /** The registered base relation, possibly under an attribute-only
    * projection (column pruning). rootPaths compared by exact PATH
    * (the scan reports file:-qualified roots; the URI path strips the
    * scheme — no nested-dir suffix false-positives), and the file
    * inventory must still match the ensure()-time fingerprint. */
  private def isBase(p: LogicalPlan, look: String => String): Boolean =
    p match {
      case Project(pl, ch) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        isBase(ch, look)
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            val src = conf(SrcKey)
            src.nonEmpty &&
              fs.location.rootPaths.exists(_.toUri.getPath == src) &&
              look(src) == conf(SrcFpKey)
          case _ => false
        }
      case _ => false
    }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference => a.name
      case _ => return None
    }
    // a GLOBAL aggregate (no grouping) is vetoed: Sum over an empty MV
    // yields NULL where count must yield 0, and the nullability flip
    // would leak into the parent schema
    if (groupNames.isEmpty || !groupNames.forall(Dims.contains)) return None
    val mvPath = conf(PathKey)
    // The analyzed scan is cached per path (schema inference once per
    // session), but every rewrite splices a FRESH instance: a query
    // containing two eligible aggregates (self-join / union of
    // roll-ups) would otherwise share one plan object's exprIds AFTER
    // DeduplicateRelations has already run, mis-binding join/union
    // attributes. newInstance() re-mints the relation's output ids.
    val mvCached = mvPlans.once(mvPath)(
      SparkSession.active.read.parquet(mvPath).queryExecution.analyzed)
    val mv = mvCached match {
      case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
        m.newInstance()
      case other => other
    }
    def mvAttr(n: String): Attribute = mv.output.find(_.name == n).get

    def rollup(e: Expression): Option[Expression] = e match {
      // a scalar cast OVER the aggregate (the Money convention's final
      // cast-to-double) passes through: the inner rewrite preserves
      // the aggregate's type, so the outer cast stays valid
      case c: Cast =>
        rollup(c.child).map(r => c.withNewChildren(Seq(r)))
      case ae: AggregateExpression
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case c: Count if c.children == Seq(Literal(1)) =>
            // Count is non-nullable; Sum is nullable. Coalesce with 0
            // restores the original attribute's nullability so the
            // rewritten output schema matches what the parent operators
            // were resolved against (values agree regardless — grouping
            // is non-empty, so the Sum never actually yields NULL).
            Some(Coalesce(Seq(
              Sum(mvAttr("cnt")).toAggregateExpression(), Literal(0L))))
          case s: Sum =>
            moneyMeasure(s.child).map { a =>
              // Sum over the already-widened partial widens again;
              // cast back to the original result type (lossless —
              // the values are the same sums)
              Cast(Sum(mvAttr("sum_" + a)).toAggregateExpression(),
                ae.dataType)
            }
          case mn: Min =>
            // min of per-group mins IS the min — self-mergeable, no
            // precision widening, no cast needed
            moneyMeasure(mn.child).map(a =>
              Min(mvAttr("min_" + a)).toAggregateExpression())
          case mx: Max =>
            moneyMeasure(mx.child).map(a =>
              Max(mvAttr("max_" + a)).toAggregateExpression())
          case _ => None
        }
      case _ => None
    }

    val newAggs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupNames.contains(a.name) =>
        Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(child, name) =>
        rollup(child) match {
          case Some(r) => Alias(r, name)(exprId = al.exprId)
          case None =>
            // Aggregate-free scalar expressions over grouping dims (and
            // literals CollapseProject folded into the aggregate list —
            // e.g. `.withColumn("tag", lit(..))` above a roll-up) are
            // answerable: re-bind their dimension refs to the MV scan.
            val aggFree = child.collectFirst {
              case ae: AggregateExpression => ae }.isEmpty
            if (aggFree &&
                child.references.forall(r => groupNames.contains(r.name)))
              Alias(child.transform {
                case a: AttributeReference => mvAttr(a.name)
              }, name)(exprId = al.exprId)
            else return None
        }
      case _ => return None
    }
    Some(Aggregate(groupNames.map(n => mvAttr(n)), newAggs, mv, None))
  }

  val inject: SparkSessionExtensions => Unit =
    _.injectOptimizerRule(_ => MvRewrite)
}
