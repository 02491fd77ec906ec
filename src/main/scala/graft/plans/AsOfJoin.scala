package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BaseOrdering, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the full custom-operator stack (builder-brief case
  * (c)): LogicalPlan → SparkStrategy → SparkPlan, exposed as a DataFrame
  * function.
  *
  * Semantics (backward as-of, strict): for each left row, attach the right
  * row with the greatest `rightTime < leftTime` within the same key group;
  * rows with no prior right row are dropped (inner backward as-of — exactly
  * the reference-shaped `q_r7` query: latest signup strictly before each
  * purchase).
  *
  * Why a custom operator is justified here: Spark has no as-of join; the
  * compositional encodings either window over a union (materializes
  * left+right in ONE sort and carries null-padded columns of both sides
  * through the window) or use a range join (quadratic candidates). The
  * native exec is the textbook formulation: co-partition both sides by key,
  * sort each by (key, time) — exchanges and sorts planned by
  * EnsureRequirements like any join — then a single O(n_l + n_r) forward
  * merge per partition with ONE buffered right row. At 100 TB it shuffles
  * each side once (same as sort-merge join) and holds O(1) state per key.
  *
  * The planner rule is injected two public ways: per-session
  * `spark.experimental.extraStrategies` (done by [[AsOfJoin.ensureInjected]])
  * or config `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Session-extensions entry point (`spark.sql.extensions=graft.plans.GraftExtensions`). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // co-partition both sides on the key (EnsureRequirements inserts the
  // exchanges and checks cross-child compatibility, same as sort-merge join)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // per-partition sort by (key, time) — the merge's only precondition
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val keyOrd: BaseOrdering =
        RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(output, left.output ++ right.output)
      val joined = new JoinedRow
      val rBuf = rIt.buffered

      // ONE buffered candidate: the latest right row seen for `candKey`
      var candKey: InternalRow = null
      var cand: InternalRow = null

      lIt.flatMap { lRow =>
        val lKey = lKeyProj(lRow)
        val lT = lTimeProj(lRow).getLong(0)
        // advance the right side through everything strictly before (key, t)
        var continue = rBuf.hasNext
        while (continue) {
          val rRow = rBuf.head
          val rKey = rKeyProj(rRow)
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0 || (c == 0 && rTimeProj(rRow).getLong(0) < lT)) {
            if (c == 0) { candKey = rKey.copy(); cand = rRow.copy() }
            rBuf.next()
            continue = rBuf.hasNext
          } else continue = false
        }
        if (cand != null && keyOrd.compare(candKey, lKey) == 0)
          Some(resultProj(joined(lRow, cand)))
        else None
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** Install the strategy into the session's planner (idempotent). */
  def ensureInjected(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** DataFrame-level entry: backward-strict as-of join of `left` with
    * `right` on equal key columns, `right(timeCol) < left(timeCol)` (Long
    * epoch-ms times), keeping the latest prior right row. Output = left
    * columns ++ right columns; names must not collide. */
  def asof(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    ensureInjected(spark)
    val lPlan = GraftSqlShims.logicalPlan(left)
    val rPlan = GraftSqlShims.logicalPlan(right)
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    GraftSqlShims.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      Seq(resolve(lPlan, leftKey)), Seq(resolve(rPlan, rightKey)),
      resolve(lPlan, leftTime), resolve(rPlan, rightTime)))
  }
}
