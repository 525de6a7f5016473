package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TradeAggregates.exactSum

/** Time-bucketed OHLCV bars — the reference's silver 1-minute bar layer
  * (SURVEY §2.4 A4, `docs/schemas/S3_SCHEMA.md:316-392`) and daily trading
  * summaries (A6, `docs/schemas/RDS_SCHEMA.md:446-497`).
  *
  * Scale shape: one hash aggregate keyed by (symbol, bucket). Map-side partial
  * aggregation collapses each input partition to O(distinct buckets) before
  * the shuffle; bucket count grows with time span, not row count, so the
  * shuffle stays small at 100 TB. Open/close are `min_by`/`max_by` over a
  * (ts, tiebreak) struct — no window pass and deterministic under ties;
  * note the struct ordering makes Spark plan a SortAggregate (per-partition
  * sort before the partial phase — see SCALE.md "known limits" and
  * TradeAggregates.packedOrder for the hash-aggregate fast path).
  */
object Bars {

  /** A4: OHLCV(+VWAP) bars of width `barMs` per `symbol`.
    *
    * Output columns (FIXTURES.md §5 subset): `open_time_ms`, OHLC, `volume`,
    * `notional`, `trade_count`, `vwap`, `price_range`, `price_change`.
    */
  def ohlcv(
      trades: DataFrame,
      symbol: Column,
      tsMs: Column,
      price: Column,
      qty: Column,
      tieBreak: Column,
      barMs: Long = 60000L): DataFrame = {
    val ord = struct(tsMs, tieBreak)
    trades
      .groupBy(
        symbol.as("symbol"),
        graft.functions.TimeUnits.bucketStartMs(tsMs, barMs).as("open_time_ms"))
      .agg(
        min_by(price, ord).as("open_price"),
        max_by(price, ord).as("close_price"),
        max(price).as("high_price"),
        min(price).as("low_price"),
        exactSum(qty).as("volume"),
        exactSum(price * qty, 10).as("notional"),
        count(lit(1)).as("trade_count"))
      .withColumn("vwap", col("notional") / nullif(col("volume"), lit(0.0)))
      .withColumn("price_range", round(col("high_price") - col("low_price"), 8))
      .withColumn("price_change", round(col("close_price") - col("open_price"), 8))
  }

  /** A6: daily trading summary per symbol — OHLC, totals, largest trade,
    * volatility (`RDS_SCHEMA.md:446-497`).
    */
  def dailySummary(
      trades: DataFrame,
      symbol: Column,
      tsMs: Column,
      price: Column,
      qty: Column,
      tieBreak: Column): DataFrame = {
    val day = date_format(timestamp_millis(tsMs), "yyyy-MM-dd")
    val ord = struct(tsMs, tieBreak)
    trades
      .groupBy(symbol.as("symbol"), day.as("trading_date"))
      .agg(
        min_by(price, ord).as("open_price"),
        max_by(price, ord).as("close_price"),
        max(price).as("high_price"),
        min(price).as("low_price"),
        count(lit(1)).as("total_trades"),
        exactSum(qty).as("total_volume"),
        max(qty).as("largest_trade"),
        round(avg(qty), 6).as("avg_trade_size"),
        round(stddev_samp(price), 4).as("volatility"),
        round(exactSum(price * qty, 10) / nullif(exactSum(qty), lit(0.0)), 6).as("vwap"))
      .withColumn(
        "daily_change_pct",
        (col("close_price") - col("open_price")) / nullif(col("open_price"), lit(0.0)) * 100)
      .withColumn("price_range", round(col("high_price") - col("low_price"), 8))
  }
}
