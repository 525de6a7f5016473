package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TradeAggregates.exactSum

/** Best-bid/ask and order-book-depth feature aggregates — SURVEY §2.4 A2
  * (`feature_builder.py:187-286`) and A3 (`feature_builder.py:288-354`).
  *
  * A2 fixes the reference's `latest_bid_size` NameError (SURVEY §7.5.5): the
  * latest sizes are real `max_by` aggregates here.
  *
  * A3 consumes a nested `array<struct<price,qty>>` book; per-level math runs
  * as higher-order array functions (slice/transform/aggregate) on the LAST
  * snapshot per group (`max_by(struct(...))`) — one hash aggregate, no
  * explode, no second shuffle.
  */
object QuoteAggregates {

  /** A2: per-group BBA features: latest quote, spread/mid stats, size
    * imbalance, mid change first->last.
    */
  def bbaStats(
      quotes: DataFrame, // symbol, ts_ms, bid_px, ask_px, bid_sz, ask_sz, quote_id
      groupCols: Seq[Column]): DataFrame = {
    val spread = col("ask_px") - col("bid_px")
    val mid = (col("ask_px") + col("bid_px")) / 2.0
    val ord = struct(col("ts_ms"), col("quote_id"))
    quotes
      .groupBy(groupCols: _*)
      .agg(
        count(lit(1)).as("n_quotes"),
        max_by(col("bid_px"), ord).as("latest_bid"),
        max_by(col("ask_px"), ord).as("latest_ask"),
        max_by(col("bid_sz"), ord).as("latest_bid_size"),
        max_by(col("ask_sz"), ord).as("latest_ask_size"),
        round(avg(spread), 6).as("avg_spread"),
        min(spread).as("min_spread"),
        max(spread).as("max_spread"),
        round(stddev_samp(spread), 4).as("spread_std"),
        round(avg(mid), 6).as("avg_mid"),
        exactSum(col("bid_sz")).as("total_bid_size"),
        exactSum(col("ask_sz")).as("total_ask_size"),
        min_by(mid, ord).as("first_mid"),
        max_by(mid, ord).as("last_mid"))
      .withColumn(
        "size_imbalance",
        (col("total_bid_size") - col("total_ask_size")) /
          nullif(col("total_bid_size") + col("total_ask_size"), lit(0.0)))
      .withColumn("mid_change", col("last_mid") - col("first_mid"))
  }

  /** A3: features of the LAST book snapshot per group. `bids`/`asks` are
    * `array<struct<price double, qty double>>`, bids sorted desc / asks asc
    * by price (FIXTURES.md §3).
    */
  def depthSnapshotStats(
      books: DataFrame, // symbol, ts_ms, snap_id, bids, asks
      groupCols: Seq[Column],
      topN: Int = 5): DataFrame = {
    val ord = struct(col("ts_ms"), col("snap_id"))
    val latest = books
      .groupBy(groupCols: _*)
      .agg(
        max_by(col("bids"), ord).as("bids"),
        max_by(col("asks"), ord).as("asks"),
        max(col("ts_ms")).as("snapshot_ts"))

    def qtySum(arr: Column): Column =
      aggregate(transform(slice(arr, 1, topN), l => l.getField("qty")), lit(0.0), (a, x) => a + x)
    def notionalSum(arr: Column): Column =
      aggregate(
        transform(slice(arr, 1, topN), l => l.getField("price") * l.getField("qty")),
        lit(0.0), (a, x) => a + x)

    latest
      .withColumn("best_bid", element_at(col("bids"), 1).getField("price"))
      .withColumn("best_ask", element_at(col("asks"), 1).getField("price"))
      .withColumn("spread", col("best_ask") - col("best_bid"))
      .withColumn("mid", (col("best_ask") + col("best_bid")) / 2.0)
      .withColumn("bid_depth", qtySum(col("bids")))
      .withColumn("ask_depth", qtySum(col("asks")))
      .withColumn(
        "depth_imbalance",
        (col("bid_depth") - col("ask_depth")) /
          nullif(col("bid_depth") + col("ask_depth"), lit(0.0)))
      .withColumn(
        "bid_vwap_top",
        notionalSum(col("bids")) / nullif(qtySum(col("bids")), lit(0.0)))
      .withColumn(
        "ask_vwap_top",
        notionalSum(col("asks")) / nullif(qtySum(col("asks")), lit(0.0)))
      .withColumn("bid_levels", size(col("bids")).cast("long"))
      .withColumn("ask_levels", size(col("asks")).cast("long"))
      .drop("bids", "asks")
  }
}
