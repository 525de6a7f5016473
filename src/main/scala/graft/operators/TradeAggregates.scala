package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch trade aggregates — the reference's `FeatureBuilder` trade-batch
  * stats (SURVEY §2.4 A1; reference `services/aggregator/src/feature_builder.py:88-185`):
  * per group — count, volume, min/max/mean price, VWAP, price stddev, buy/sell
  * volume split on the buyer-maker flag (maker-sell convention,
  * `feature_builder.py:119-123`), volume imbalance, price change first->last.
  *
  * Spark-first shape: a single hash aggregate with conditional sums. Partial
  * (map-side) aggregation means one shuffle of pre-combined state per group —
  * at 100 TB the shuffle volume is O(groups), not O(rows).
  *
  * Determinism note: double sums are accumulated in DECIMAL(20,8)/(30,10) and
  * cast back to double so results are bit-identical regardless of partition
  * order / engine (a plain double sum is order-dependent).
  */
object TradeAggregates {

  /** Exact, order-independent sum of a double column: accumulate as decimal,
    * cast back to double.
    */
  def exactSum(c: Column, scale: Int = 8): Column =
    sum(c.cast(s"decimal(27,$scale)")).cast("double")

  /** Packed total-order key: `(ts << tieBits) | tie` as ONE long. `min_by`/
    * `max_by` over a struct ordering plans as SortAggregate (the struct
    * buffer is not hash-aggregable); the packed long restores HashAggregate,
    * eliminating the per-partition sort before the partial aggregate
    * (SCALE.md "known limits").
    *
    * CALLER CONTRACT (unchecked at runtime — a violation silently corrupts
    * the ordering and every min_by/max_by built on it):
    * `0 <= tie < 2^tieBits` and `0 <= ts < 2^(63-tieBits)`. At the default
    * tieBits=21 the ts bound is 2^42 ms ≈ year 2109; epoch-ms data through
    * 2039 also fits the stricter 2^41 bound, leaving a spare headroom bit.
    * Data with larger ids (or far-future timestamps) must lower/raise
    * tieBits accordingly — or use [[tradeBatchStats]], whose struct ordering
    * has no packing bound.
    */
  def packedOrder(tsMs: Column, tieBreak: Column, tieBits: Int = 21): Column = {
    require(tieBits > 0 && tieBits < 63, s"tieBits must be in (0, 63), got $tieBits")
    shiftleft(tsMs, tieBits) + tieBreak
  }

  /** A1: one row per `keys` group with the reference's trade-batch features.
    *
    * @param isSell   boolean column; true means the aggressor sold (the
    *                 reference's `is_buyer_maker=true` => sell volume).
    */
  def tradeBatchStats(
      trades: DataFrame,
      keys: Seq[Column],
      price: Column,
      qty: Column,
      isSell: Column,
      tsMs: Column,
      tieBreak: Column): DataFrame =
    statsWithOrder(trades, keys, price, qty, isSell, struct(tsMs, tieBreak))

  /** [[tradeBatchStats]] with the packed-long ordering fast path — identical
    * results when the tiebreak fits `tieBits`, but the open/close picks
    * hash-aggregate instead of sort-aggregating (matters on wide cluster
    * partitions; measured identical locally where the decimal sums dominate).
    */
  def tradeBatchStatsPacked(
      trades: DataFrame,
      keys: Seq[Column],
      price: Column,
      qty: Column,
      isSell: Column,
      tsMs: Column,
      tieBreak: Column,
      tieBits: Int = 21): DataFrame =
    statsWithOrder(trades, keys, price, qty, isSell, packedOrder(tsMs, tieBreak, tieBits))

  private def statsWithOrder(
      trades: DataFrame,
      keys: Seq[Column],
      price: Column,
      qty: Column,
      isSell: Column,
      ord: Column): DataFrame = {
    trades
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("trade_count"),
        exactSum(qty).as("total_volume"),
        min(price).as("min_price"),
        max(price).as("max_price"),
        round(avg(price), 4).as("avg_price"),
        // Whole-relation decimal sums overflow double's 53-bit mantissa when
        // scaled, so the decimal->double CAST itself rounds (engines differ at
        // 1 ulp) — round the quotient; its long expansion makes the .5-boundary
        // hazard negligible (unlike small-group quotients, which stay unrounded).
        round(exactSum(price * qty, 10) / nullif(exactSum(qty), lit(0.0)), 6).as("vwap"),
        round(stddev_samp(price), 4).as("price_std"),
        exactSum(when(!isSell, qty).otherwise(lit(0.0))).as("buy_volume"),
        exactSum(when(isSell, qty).otherwise(lit(0.0))).as("sell_volume"),
        min_by(price, ord).as("first_price"),
        max_by(price, ord).as("last_price")
      )
      .withColumn(
        "volume_imbalance",
        (col("buy_volume") - col("sell_volume")) / nullif(col("total_volume"), lit(0.0)))
      .withColumn("price_change", round(col("last_price") - col("first_price"), 8))
      .withColumn(
        "price_change_pct",
        (col("last_price") - col("first_price")) / nullif(col("first_price"), lit(0.0)) * 100)
  }
}
