package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of / nearest-neighbor-in-time join — SURVEY §2.3 J1, the reference's
  * prediction-outcome update (`docs/schemas/RDS_SCHEMA.md:703-756`): match each
  * left row to the right row minimizing |rightTs - leftTs| within a tolerance.
  *
  * Scale shape (the part Spark lacks natively): a naive formulation is a range
  * join, which Catalyst executes as a broadcast-nested-loop or a cartesian —
  * O(|L|·|R|) per key. Instead both sides are bucketed on
  * `ts div tolerance`; a right row can only be within tolerance of left rows
  * in its own or the two adjacent buckets, so the right side is replicated
  * 3× into (key, bucket) cells and the join becomes an equi-join Catalyst
  * can hash-partition. Cost: one shuffle of 3|R| + |L| rows, fan-out bounded
  * by rows-per-bucket — survives 100 TB inputs where a range join would not.
  */
object AsOf {

  /** Backward as-of join: for each left row, the LATEST right row with
    * `rightTs <= leftTs` within `toleranceMs` (the classic "state as of this
    * event" lookup — J3 stream-static enrichment: each trade gets the most
    * recent quote's mid). Same bucket trick, right side replicated 2×; ties
    * on `__right_ts` break toward the largest `rightTieBreak`.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      toleranceMs: Long,
      leftId: String,
      rightValueCols: Seq[String],
      rightTieBreak: String): DataFrame = {
    require(toleranceMs > 0, s"toleranceMs must be positive, got $toleranceMs" +
      " (the bucket width divides by it; 0 would be an ANSI divide-by-zero)")
    val rb = expr(s"__right_ts div $toleranceMs")
    val r = right
      .select((col(key) +: col(rightTs).as("__right_ts") +: rightValueCols.map(col)): _*)
      .withColumn("__b", explode(array(rb, rb + 1)))
    val l = left.withColumn("__b", expr(s"$leftTs div $toleranceMs"))
    val joined = l
      .join(r, Seq(key, "__b"))
      .filter(col("__right_ts") <= col(leftTs) &&
        col(leftTs) - col("__right_ts") <= toleranceMs)
    val w = Window
      .partitionBy(col(key), col(leftId))
      .orderBy(col("__right_ts").desc, col(rightTieBreak).desc)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__b")
  }

  /** Nearest-within-tolerance join (both directions in time).
    *
    * @param leftId   column uniquely identifying a left row (rank partition).
    * @param rightValueCols right columns to carry; right's ts arrives as
    *                 `__right_ts`. Ties on |Δt| break toward the earlier
    *                 right timestamp, then by `rightValueCols` in order —
    *                 so two right rows sharing (key, ts) still resolve
    *                 deterministically under any partitioning.
    * Result: inner — left rows with no right row within tolerance are absent
    * (callers needing outer semantics left-join the result back, see J1).
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      toleranceMs: Long,
      leftId: String,
      rightValueCols: Seq[String]): DataFrame = {
    require(toleranceMs > 0, s"toleranceMs must be positive, got $toleranceMs" +
      " (the bucket width divides by it; 0 would be an ANSI divide-by-zero)")
    val rb = expr(s"__right_ts div $toleranceMs")
    val r = right
      .select((col(key) +: col(rightTs).as("__right_ts") +: rightValueCols.map(col)): _*)
      .withColumn("__b", explode(array(rb - 1, rb, rb + 1)))
    val l = left.withColumn("__b", expr(s"$leftTs div $toleranceMs"))
    val joined = l
      .join(r, Seq(key, "__b"))
      .filter(abs(col("__right_ts") - col(leftTs)) <= toleranceMs)
    // tie columns are r-qualified: the left side may carry same-named
    // columns, and a bare col(name) would be ambiguous after the join
    val w = Window
      .partitionBy(col(key), col(leftId))
      .orderBy(
        abs(col("__right_ts") - col(leftTs)) +: col("__right_ts") +:
          rightValueCols.map(r(_)): _*)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__b")
  }
}
