package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the second operator family Spark lacks
  * natively (alongside as-of): match each point row `ts` to the interval
  * rows whose `[start, end]` contains it, per key. Naive Spark plans this as
  * a BroadcastNestedLoopJoin (or a cartesian) because the containment
  * predicate is not an equi-join — quadratic and cluster-fatal at scale.
  *
  * Spark-first rewrite (same family as [[AsOf]]'s bucketed tier): bucket the
  * time axis into `chunkMs` cells; points land in exactly ONE cell, each
  * interval is replicated to the cells it overlaps (`sequence(start div c,
  * end div c)` — replication factor = interval span / chunkMs, bounded and
  * chosen by the caller), then an ordinary equi-join on (key, cell) + the
  * exact containment filter. Catalyst plans a hash join: shuffle volume is
  * O(points + interval-replicas), nothing quadratic, AQE handles cell skew.
  *
  * Matching is inclusive on both bounds. A point matching k overlapping
  * intervals emits k rows (standard range-join semantics); dedup on the
  * (cell) replication is unnecessary because a point exists in one cell
  * only.
  */
object Interval {

  /** Join `points` to the containing rows of `intervals`.
    *
    * @param points     must expose `pointKey` and `ts`
    * @param intervals  must expose `intervalKey`, `start`, `end` (ms, end >= start)
    * @param chunkMs    time-cell width; pick >= the typical interval span so
    *                   the replication factor stays near 2
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointKey: Column,
      ts: Column,
      intervalKey: Column,
      start: Column,
      end: Column,
      chunkMs: Long): DataFrame = {
    require(chunkMs > 0, s"chunkMs must be positive, got $chunkMs")
    val p = points
      .withColumn("__k", pointKey)
      .withColumn("__ts", ts)
      .withColumn("__cell", graft.functions.TimeUnits.bucketIndex(ts, chunkMs))
    val i = intervals
      .withColumn("__k", intervalKey)
      .withColumn("__start", start)
      .withColumn("__end", end)
      .withColumn(
        "__cell",
        explode(sequence(
          graft.functions.TimeUnits.bucketIndex(col("__start"), chunkMs),
          graft.functions.TimeUnits.bucketIndex(col("__end"), chunkMs))))
    p.join(i, Seq("__k", "__cell"))
      .filter(col("__ts") >= col("__start") && col("__ts") <= col("__end"))
      .drop("__cell", "__k", "__ts", "__start", "__end")
  }
}
