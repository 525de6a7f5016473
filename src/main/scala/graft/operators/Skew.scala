package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (scale EXTENSION, SURVEY §7.2.10 — no reference
  * counterpart; the reference runs one symbol on one node). WHEN salting
  * actually pays, stated precisely: for simple decomposable aggregates
  * (sum/count/min/max) Spark's map-side partial aggregation already bounds
  * a hot key's reducer input to one pre-combined row per map task, so a
  * plain groupBy handles ROW skew and salting only adds a second exchange.
  * Salting earns its shuffle when the PARTIAL state itself is the problem:
  * aggregation buffers that grow with group size (collect_list/collect_set,
  * exact percentile buffers, large decimal/object state under
  * ObjectHashAggregate) or when the fallback to sort-based aggregation on
  * one giant reducer group dominates. The two-phase shape here is that
  * pattern, demonstrated on basic stats because their merge algebra is
  * oracle-checkable; AQE's skew handling covers joins.
  *
  * Only algebraically decomposable aggregates participate; non-mergeable
  * ones (exact percentile) should aggregate unsalted or switch to sketches.
  *
  * Contract: `keys` must be bare column references (`col("name")`) — phase
  * 2 re-groups the phase-1 OUTPUT by the same expressions, so a computed
  * key (e.g. `upper(col("x"))`) would not resolve there; alias computed
  * keys into real columns first.
  */
object Skew {

  /** Deterministic salt derived from a tie-break column (not `rand()` — keeps
    * results reproducible and retry-safe).
    */
  def salt(tieBreak: Column, buckets: Int): Column = pmod(hash(tieBreak), lit(buckets))

  /** Two-phase salted aggregation. `partials` defines phase-1 aggregates per
    * (keys, salt); `merges` defines how phase 2 combines them per key.
    * E.g. sum -> (sum, sum), count -> (count, sum), min -> (min, min).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[Column],
      tieBreak: Column,
      buckets: Int,
      partials: Seq[Column], // aliased phase-1 agg columns
      merges: Seq[Column] // aliased phase-2 agg columns over phase-1 names
  ): DataFrame = {
    val phase1 = df
      .withColumn("__salt", salt(tieBreak, buckets))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(keys: _*).agg(merges.head, merges.tail: _*)
  }

  /** Convenience: salted count/sum/min/max over one value column. */
  def saltedBasicStats(
      df: DataFrame,
      keys: Seq[Column],
      value: Column,
      tieBreak: Column,
      buckets: Int = 32): DataFrame =
    saltedAgg(
      df, keys, tieBreak, buckets,
      partials = Seq(
        count(lit(1)).as("__n"),
        sum(value.cast("decimal(27,8)")).as("__s"),
        min(value).as("__mn"),
        max(value).as("__mx")),
      merges = Seq(
        sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("total"),
        min(col("__mn")).as("min_value"),
        max(col("__mx")).as("max_value")))
}
