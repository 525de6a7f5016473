package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.operators.AsOf

/** Declarative AS-OF join — the (c)-tier Catalyst integration for the one
  * operator Spark lacks natively (SURVEY §4): a custom `LogicalPlan` node
  * that a resolution `Rule` expands into the tolerance-bucketed equi-join
  * rewrite of `operators.AsOf`, registered through `SparkSessionExtensions`.
  *
  * The expansion happens at ANALYSIS time (not planning), so downstream
  * operators bind to the rewritten plan's attributes normally and every later
  * optimizer phase (pushdown, AQE) sees plain joins/windows — the rewrite is
  * invisible to the rest of Catalyst, exactly like a built-in.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    key: String,
    leftTs: String,
    rightTs: String,
    toleranceMs: Long,
    leftId: String,
    rightValueCols: Seq[String]) extends BinaryNode {
  // Unresolved until the injected rule rewrites it.
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Expands [[AsOfJoinNode]] into the bucketed rewrite. */
case class ResolveAsOfJoin(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case AsOfJoinNode(l, r, key, lts, rts, tol, lid, cols) =>
      AsOf
        .nearest(
          ColumnBridge.ofRows(spark, l), ColumnBridge.ofRows(spark, r),
          key, lts, rts, tol, lid, cols)
        .queryExecution.analyzed
  }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` enables the
  * declarative node (and is where future graft strategies/rules register).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(session => ResolveAsOfJoin(session))
    e.injectPlannerStrategy(_ => AsOfMergeJoinStrategy)
  }
}

/** DataFrame-level DSL over the node. Works on any session: the rule is
  * applied eagerly here, and sessions built with [[GraftExtensions]] also
  * resolve the node wherever it appears in a plan.
  */
object AsOfDsl {
  /** Name the right side's timestamp arrives under in every as-of output. */
  val RightTs: String = "__right_ts"

  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      toleranceMs: Long,
      leftId: String,
      rightValueCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    val node = AsOfJoinNode(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      key, leftTs, rightTs, toleranceMs, leftId, rightValueCols)
    ColumnBridge.ofRows(spark, ResolveAsOfJoin(spark)(node))
  }
}
