package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native AS-OF join as a WHOLE-OPERATOR Spark extension — the (c) tier
  * of SURVEY §7.3's decision ladder (custom LogicalPlan + planner
  * Strategy + SparkPlan via SparkSessionExtensions), demonstrated on the
  * operator where it pays: backward as-of matching is a single ordered
  * merge per co-partition, while the composed form
  * ([[graft.operators.Temporal.asofJoin]]) pays a union + full window
  * materialization of both sides through one state machine.
  *
  * Physical contract (the piece Catalyst supplies for free once the
  * requirements are declared): EnsureRequirements co-hash-partitions
  * both children on the user key and sorts them (left by (user, ts),
  * right by (user, ts, tie)), after which [[AsOfJoinExec]] streams the
  * two sorted iterators with one buffered right row and one retained
  * match per user — O(1) state per partition, no per-key
  * materialization, no window buffer. Exactly a sort-merge join whose
  * "match" is `latest right with r.ts <= l.ts` (ties → greatest tie
  * column, because ascending order leaves it consumed last).
  *
  * Scope restrictions (asserted at construction): key/time/tie columns
  * are LongType (or TimestampType, internally int64 micros) with
  * PAIRWISE-matching types across sides, and the two sides carry
  * disjoint attribute ids and names — the caller aliases its columns
  * (fresh exprIds) exactly like any self-join. Rows whose key or time
  * IS NULL are excluded from either side by [[AsOfJoinNative.join]]
  * before the node is built (null never equals anything — the SQL
  * equi-join rule; without the filter the unsafe getLong would read a
  * null as 0 and silently match user/epoch 0). */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    lUser: Attribute, lTs: Attribute,
    rUser: Attribute, rTs: Attribute, rTie: Attribute)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    lUser: Attribute, lTs: Attribute,
    rUser: Attribute, rTs: Attribute, rTie: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both children clustered on the user key: EnsureRequirements
    * inserts compatible hash exchanges (or reuses existing ones), the
    * same way it provisions a shuffled join. */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(lUser)), ClusteredDistribution(Seq(rUser)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(lUser, Ascending), SortOrder(lTs, Ascending)),
    Seq(SortOrder(rUser, Ascending), SortOrder(rTs, Ascending),
      SortOrder(rTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(lUser, Ascending), SortOrder(lTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val luIdx = lOut.indexWhere(_.exprId == lUser.exprId)
    val ltIdx = lOut.indexWhere(_.exprId == lTs.exprId)
    val ruIdx = rOut.indexWhere(_.exprId == rUser.exprId)
    val rtIdx = rOut.indexWhere(_.exprId == rTs.exprId)
    val rArity = rOut.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val rBuf = rIt.buffered
      val nullRight = new GenericInternalRow(rArity)
      val joiner = new JoinedRow
      // Bind against the NULLABLE output attributes (not the children's
      // raw schemas): BindReferences takes nullability from the input
      // schema, and a non-nullable bound reference skips the null check
      // — the all-null unmatched right row would read back as zeros.
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      // O(1) merge state: the single retained candidate for the user
      // currently being probed. Iterator rows are reused buffers, so
      // the retained match is copy()'d once per update.
      var matchRow: InternalRow = null
      var matchUser: Long = 0L
      lIt.map { l =>
        val lu = l.getLong(luIdx)
        val lt = l.getLong(ltIdx)
        var advance = true
        while (advance && rBuf.hasNext) {
          val ru = rBuf.head.getLong(ruIdx)
          if (ru < lu ||
              (ru == lu && rBuf.head.getLong(rtIdx) <= lt)) {
            val consumed = rBuf.next()
            if (ru == lu) { matchRow = consumed.copy(); matchUser = lu }
          } else advance = false
        }
        val m =
          if (matchRow != null && matchUser == lu) matchRow else nullRight
        proj(joiner(l, m))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy lowering the logical node 1:1 onto the exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lu, lt, ru, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lu, lt, ru, rt, tie) :: Nil
    case _ => Nil
  }
}

object AsOfJoinNative {

  val inject: SparkSessionExtensions => Unit =
    _.injectPlannerStrategy(_ => AsOfJoinStrategy)

  private def keyTypeOk(a: Attribute): Boolean = a.dataType match {
    case LongType | TimestampType => true
    case _ => false
  }

  /** Backward as-of join of `left` (probe) against `right` (quote):
    * for each left row, the latest right row of the same user with
    * r.ts <= l.ts (ties by greatest `rTie`), right columns null when
    * no such row exists. Column names (and therefore attribute ids —
    * aliases mint fresh ones) must be disjoint across the two sides. */
  def join(left: DataFrame, right: DataFrame,
      lUser: String, lTs: String,
      rUser: String, rTs: String, rTie: String): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    require(
      lPlan.output.map(_.name).intersect(rPlan.output.map(_.name)).isEmpty,
      "as-of sides must carry disjoint column names (alias before joining)")
    require(
      lPlan.output.map(_.exprId).intersect(rPlan.output.map(_.exprId)).isEmpty,
      "as-of sides must carry disjoint attribute ids (alias both sides)")
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output}"))
    val (lu, lt) = (attr(lPlan, lUser), attr(lPlan, lTs))
    val (ru, rt, tie) = (attr(rPlan, rUser), attr(rPlan, rTs),
      attr(rPlan, rTie))
    require(Seq(lu, lt, ru, rt, tie).forall(keyTypeOk),
      "as-of key/time/tie columns must be LongType or TimestampType")
    // the two sides must agree PAIRWISE: checking each column alone
    // would accept long-seconds vs timestamp-micros and silently
    // compare raw longs across units
    require(lu.dataType == ru.dataType && lt.dataType == rt.dataType,
      s"as-of key/time types must match across sides: " +
        s"${lu.dataType}/${ru.dataType}, ${lt.dataType}/${rt.dataType}")
    // null keys/times never match (SQL equi-join rule). Filter BEFORE
    // building the node: the merge exec reads key/time via getLong,
    // which would silently decode a null as user 0 / epoch 0.
    val lf = left.filter(left(lUser).isNotNull && left(lTs).isNotNull)
    val rf = right.filter(
      right(rUser).isNotNull && right(rTs).isNotNull
        && right(rTie).isNotNull)
    org.apache.spark.sql.graftshim.Shim.ofRows(left.sparkSession,
      AsOfJoinNode(lf.queryExecution.analyzed, rf.queryExecution.analyzed,
        lu, lt, ru, rt, tie))
  }
}
