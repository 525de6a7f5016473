package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization — groups a per-entity event stream into
  * sessions split at inactivity gaps (the batch twin of Structured
  * Streaming's `session_window`, reference analog: the per-user activity
  * rollups the analytics layer derives from the event stream;
  * `transformer.py`'s per-symbol batch windows are the same island pattern
  * with a fixed grid instead of a gap rule).
  *
  * Shape: ONE shuffle on the entity key; the session-boundary lag, the
  * running island sum, and the final per-session aggregate all share that
  * partitioning, so Catalyst plans a single Exchange followed by local
  * sorts. Parallelism scales with entity cardinality (users), not with
  * session count — the 100 TB shape for clickstream sessionization.
  *
  * The island id is computed with an explicit running sum over
  * `(ts, tieBreak)` order instead of `session_window` so the SAME algorithm
  * is expressible in ANSI SQL for the cross-engine oracle, and so ties are
  * deterministic.
  */
object Sessionize {

  /** Each input row tagged with its `session_seq` (1-based per key, in time
    * order).
    */
  def tagged(
      events: DataFrame,
      key: Column,
      tsMs: Column,
      tieBreak: Column,
      gapMs: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tsMs, tieBreak)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev_ts", lag(tsMs, 1).over(w))
      .withColumn(
        "__new_session",
        when(col("__prev_ts").isNull || tsMs - col("__prev_ts") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("__new_session")).over(run))
      .drop("__prev_ts", "__new_session")
  }

  /** One row per (key, session): bounds, size, and value rollup. */
  def sessions(
      events: DataFrame,
      key: Column,
      tsMs: Column,
      tieBreak: Column,
      value: Column,
      gapMs: Long): DataFrame = {
    val base = events.select(
      key.as("key"), tsMs.as("__ts"), tieBreak.as("__tie"), value.as("__v"))
    tagged(base, col("key"), col("__ts"), col("__tie"), gapMs)
      .groupBy(col("key"), col("session_seq"))
      .agg(
        min(col("__ts")).as("session_start"),
        max(col("__ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(col("__ts")) - min(col("__ts"))).as("duration_ms"),
        TradeAggregates.exactSum(col("__v")).as("total_value"))
  }
}
