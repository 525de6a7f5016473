package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

/** Whole-operator Catalyst integration for the as-of join — the (c)-tier of
  * SURVEY §4's preference order: a resolved logical node planned by an
  * injected `SparkStrategy` into a dedicated physical operator that merges
  * the two key-clustered, time-sorted children in ONE streaming pass.
  *
  * Versus the tolerance-bucketed equi-join rewrite (`operators.AsOf`, the
  * (a)-tier form both j1/j1b run through), this physical plan:
  *   - shuffles each side exactly once on the key — no 2-3x right-side
  *     bucket replication (`explode(array(b-1, b, b+1))`);
  *   - needs no `row_number()` dedup window after the join, so no second
  *     sort and no fan-out of |L|x(rows-per-bucket) intermediate matches;
  *   - holds only the rows inside one tolerance window in memory per key —
  *     the same bound the bucket rewrite pays as join fan-out.
  * At 100 TB both shapes scale, but the merge pass moves ~3x less data.
  *
  * Semantics (matches `AsOf.nearest` / `AsOf.backward`, reference
  * `RDS_SCHEMA.md:703-756`): for each left row, the right row minimizing
  * |rightTs - leftTs| within tolerance (ties -> earlier right ts), or for
  * `backward = true` the latest right row with rightTs <= leftTs within
  * tolerance (ties -> largest `rightTieBreak`). Inner: unmatched left rows
  * are dropped, like the rewrite's equi-join form.
  */
case class AsOfMergeJoinNode(
    left: LogicalPlan,
    right: LogicalPlan, // pre-projected to (key, __right_ts, value cols...)
    key: String,
    leftTs: String,
    toleranceMs: Long,
    backward: Boolean,
    rightTieBreak: Option[String]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.filterNot(_.name == key)
  // The join columns are named by String, not held as Expressions, so the
  // default (expression-derived) references are EMPTY and ColumnPruning
  // would strip key/ts/tie-break out of the children before planning.
  // Declaring them here keeps pruning correct: unused VALUE columns still
  // prune all the way to the scan, but the merge columns survive.
  override def references: AttributeSet = AttributeSet(
    left.output.filter(a => a.name == key || a.name == leftTs) ++
      right.output.filter(a =>
        a.name == key || a.name == AsOfDsl.RightTs ||
          rightTieBreak.contains(a.name)))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfMergeJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfMergeJoinNode]] → [[AsOfMergeJoinExec]]. Registered per
  * session via `spark.experimental.extraStrategies` (see [[AsOfDsl]]) or
  * globally via [[GraftExtensions]].
  */
object AsOfMergeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfMergeJoinNode =>
      AsOfMergeJoinExec(
        n.key, n.leftTs, n.toleranceMs, n.backward, n.rightTieBreak,
        n.output, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Single-pass sorted-merge as-of join.
  *
  * Required layout (declared, so `EnsureRequirements` inserts the exchanges
  * and sorts, and AQE re-plans them like any built-in join): both children
  * clustered on `key` and sorted by (key, ts[, tieBreak]). Each partition is
  * then merged with a sliding window of right rows per key — O(|L| + |R|)
  * plus the in-window nearest scan, no intermediate fan-out.
  */
case class AsOfMergeJoinExec(
    keyName: String,
    leftTsName: String,
    toleranceMs: Long,
    backward: Boolean,
    rightTieBreak: Option[String],
    output: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  private def attr(side: SparkPlan, name: String): Attribute =
    side.output.find(_.name == name).getOrElse(
      throw new IllegalStateException(
        s"as-of child is missing column $name; has ${side.output.map(_.name).mkString(",")}"))

  private def keyL = attr(left, keyName)
  private def tsL = attr(left, leftTsName)
  private def keyR = attr(right, keyName)
  private def tsR = attr(right, AsOfDsl.RightTs)

  override lazy val metrics: Map[String, SQLMetric] =
    Map("numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(keyL)) :: ClusteredDistribution(Seq(keyR)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(keyL, Ascending), SortOrder(tsL, Ascending)),
    Seq(SortOrder(keyR, Ascending), SortOrder(tsR, Ascending)) ++
      rightTieBreak.map(n => SortOrder(attr(right, n), Ascending)))

  // Matched left rows stream out in the left child's (key, ts) order, still
  // hash-clustered on the key — downstream per-key aggregates reuse both.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    require(tsL.dataType == LongType && tsR.dataType == LongType,
      "as-of timestamps must be epoch-millis LongType")
    // One interpreted ordering (built from the LEFT key type) reads and
    // compares BOTH sides' key slots; a type mismatch would mis-read slots
    // (an int slot read as long returns garbage for negatives) and merge in
    // a corrupted order — silently dropped matches. Fail loudly instead.
    require(keyL.dataType == keyR.dataType,
      s"as-of key types must match: left=${keyL.dataType} right=${keyR.dataType}")
    val numOutputRows = longMetric("numOutputRows")
    val kIdxL = left.output.indexWhere(_.name == keyName)
    val tIdxL = left.output.indexWhere(_.name == leftTsName)
    val kIdxR = right.output.indexWhere(_.name == keyName)
    val tIdxR = right.output.indexWhere(_.name == AsOfDsl.RightTs)
    val keyType = keyL.dataType
    val tol = toleranceMs
    val back = backward
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val proj = UnsafeProjection.create(outAttrs, leftOut ++ rightOut)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // Right rows of the current key within the active tolerance window,
        // ts-ascending. Rows are copied when buffered (upstream iterators
        // reuse row objects); eviction keeps the buffer bounded by the rows
        // inside one 2*tol window — the operator's only state.
        private val buf = new java.util.ArrayDeque[InternalRow]()
        private var bufKey: Any = null
        private var rNext: InternalRow = _
        private var pendL: InternalRow = _
        private var pendR: InternalRow = _
        private var ready = false

        advanceRight()

        private def advanceRight(): Unit = {
          rNext = null
          while (rNext == null && rIter.hasNext) {
            val r = rIter.next()
            if (!r.isNullAt(kIdxR) && !r.isNullAt(tIdxR)) rNext = r.copy()
          }
        }

        // findNext only LOCATES the next (left, best-right) pair; the shared
        // UnsafeProjection buffer is applied in next(). Projecting inside
        // hasNext() would overwrite the row handed out by the previous
        // next() while the consumer may still hold it — Spark's row-reuse
        // contract is "valid until the next next()", not "until hasNext".
        // pendL needs no copy: lIter does not advance again until the next
        // findNext call; pendR is already a buffered copy.
        private def findNext(): Unit = {
          pendL = null; pendR = null
          while (pendL == null && lIter.hasNext) {
            val l = lIter.next()
            if (!l.isNullAt(kIdxL) && !l.isNullAt(tIdxL)) {
              val k = l.get(kIdxL, keyType)
              val t = l.getLong(tIdxL)
              if (bufKey != null && keyOrd.compare(bufKey, k) != 0) {
                buf.clear(); bufKey = null
              }
              while (rNext != null && keyOrd.compare(rNext.get(kIdxR, keyType), k) < 0)
                advanceRight()
              val hi = if (back) t else t + tol
              while (rNext != null && keyOrd.compare(rNext.get(kIdxR, keyType), k) == 0 &&
                  rNext.getLong(tIdxR) <= hi) {
                // rNext is a copy — its key value stays valid as bufKey.
                bufKey = rNext.get(kIdxR, keyType)
                buf.addLast(rNext)
                advanceRight()
              }
              while (!buf.isEmpty && buf.peekFirst.getLong(tIdxR) < t - tol)
                buf.removeFirst()
              val best =
                if (back) buf.peekLast // latest ts <= t; sort puts max tieBreak last
                else {
                  var b: InternalRow = null
                  var bestD = Long.MaxValue
                  val it = buf.iterator()
                  while (it.hasNext) {
                    val r = it.next()
                    val d = math.abs(r.getLong(tIdxR) - t)
                    if (d < bestD) { bestD = d; b = r } // tie -> earlier ts wins
                  }
                  b
                }
              if (best != null) {
                numOutputRows += 1
                pendL = l
                pendR = best
              }
            }
          }
        }

        override def hasNext: Boolean = {
          if (!ready) { findNext(); ready = true }
          pendL != null
        }

        override def next(): InternalRow = {
          if (!ready) findNext()
          ready = false
          if (pendL == null) null else proj(joined(pendL, pendR))
        }
      }
    }
  }
}

/** DataFrame DSL over the physical node. Self-registers the strategy on the
  * calling session (idempotently), so it works on any session, not just ones
  * built with [[GraftExtensions]].
  */
object AsOfMergeDsl {
  val RightTs: String = AsOfDsl.RightTs

  private def build(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      toleranceMs: Long,
      rightValueCols: Seq[String],
      backward: Boolean,
      rightTieBreak: Option[String]): DataFrame = {
    // The node's output drops the right side's key BY NAME, so a value
    // column sharing that name (or the reserved right-ts name) would vanish
    // silently — reject it loudly; alias the column beforehand instead.
    require(!rightValueCols.contains(key) && !rightValueCols.contains(AsOfDsl.RightTs),
      s"rightValueCols may not contain the join key '$key' or the reserved " +
        s"'${AsOfDsl.RightTs}' name — alias the column on the right side first")
    val spark = left.sparkSession
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(AsOfMergeJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfMergeJoinStrategy
    // Aliases mint fresh exprIds on every right-side column so the node's
    // output never collides with the left side, even on self-joins.
    val rightProj = right.select(
      (col(key).as(key) +: col(rightTs).as(AsOfDsl.RightTs) +:
        rightValueCols.map(c => col(c).as(c))): _*)
    val node = AsOfMergeJoinNode(
      left.queryExecution.analyzed, rightProj.queryExecution.analyzed,
      key, leftTs, toleranceMs, backward, rightTieBreak)
    ColumnBridge.ofRows(spark, node)
  }

  /** Physical-plan form of [[graft.operators.AsOf.nearest]]. */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      toleranceMs: Long,
      rightValueCols: Seq[String]): DataFrame =
    build(left, right, key, leftTs, rightTs, toleranceMs, rightValueCols,
      backward = false, rightTieBreak = None)

  /** Physical-plan form of [[graft.operators.AsOf.backward]]. */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      toleranceMs: Long,
      rightValueCols: Seq[String],
      rightTieBreak: String): DataFrame =
    build(left, right, key, leftTs, rightTs, toleranceMs, rightValueCols,
      backward = true, rightTieBreak = Some(rightTieBreak))
}
