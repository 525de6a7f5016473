package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-book reconstruction from depth DELTAS — the reference's hot path
  * maintains per-symbol top-10 book state by applying `DepthDelta` updates
  * (`docs/architecture/DATA_PIPELINE.md:84-95`: the `ob:{symbol}` hash with
  * bid1..10/ask1..10 levels, value sums, imbalance, weighted mid;
  * `DepthDelta.avsc` carries `[price, qty]` pairs where qty replaces the
  * level and qty = 0 deletes it). The streaming twin is
  * [[graft.streaming.BookState]]; this operator is the BATCH replay of the
  * same semantics — audit/backfill of the book at the end of a delta log.
  *
  * Spark-first shape: "apply deltas in sequence" collapses to "last write
  * per (symbol, side, price) wins" — one `row_number` window keyed by the
  * level, not a sequential fold. That is the whole trick: the reference's
  * O(events) per-symbol loop becomes two shuffles total (latest-per-level,
  * then per-side rank), both keyed fine-grained enough to parallelize —
  * (symbol, side, price) has FAR higher cardinality than symbol, and the
  * rank window only sees the pruned LIVE level set, which real books bound
  * at thousands of levels (the exchange's price grid), not the event count.
  */
object BookReplay {

  /** The book's surviving top-`depth` levels after replaying every delta:
    * one row per (symbol, side, level) with `level` = 1-based rank from the
    * touch (bids descending by price, asks ascending), `price`, `qty` (the
    * level's last written quantity) and `value` = price·qty.
    *
    * `updateId` is the total application order (the reference validates
    * `last_update_id` monotonicity; ties are impossible on a real feed and
    * resolved here by the larger qty for determinism).
    */
  def levels(
      deltas: DataFrame,
      symbol: Column,
      updateId: Column,
      side: Column, // "bid" | "ask"
      price: Column,
      qty: Column,
      depth: Int = 10): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    val keyed = deltas.select(
      symbol.as("symbol"), updateId.as("__uid"), side.as("side"),
      price.as("price"), qty.as("qty"))
    val wLevel = Window
      .partitionBy(col("symbol"), col("side"), col("price"))
      .orderBy(col("__uid").desc, col("qty").desc)
    // bids rank best-first by DESCENDING price, asks by ascending: one
    // window with a side-signed sort key instead of a per-side union
    val wRank = Window
      .partitionBy(col("symbol"), col("side"))
      .orderBy(
        when(col("side") === "bid", -col("price")).otherwise(col("price")))
    keyed
      .withColumn("__rn", row_number().over(wLevel))
      .filter(col("__rn") === 1 && col("qty") > 0)
      .withColumn("level", row_number().over(wRank).cast("long"))
      .filter(col("level") <= depth)
      .withColumn("value", col("price") * col("qty"))
      .select("symbol", "side", "level", "price", "qty", "value")
  }

  /** The `ob:{symbol}` metric row derived from [[levels]]: best bid/ask,
    * spread (+ basis points), top-`depth` value sums, value imbalance, and
    * the size-weighted mid (microprice) — the fields the reference's Redis
    * book hash serves to inference (`DATA_PIPELINE.md:84-120`).
    */
  def metrics(
      deltas: DataFrame,
      symbol: Column,
      updateId: Column,
      side: Column,
      price: Column,
      qty: Column,
      depth: Int = 10): DataFrame = {
    val lv = levels(deltas, symbol, updateId, side, price, qty, depth)
    val best = (s: String, c: String) =>
      max(when(col("side") === s && col("level") === 1, col(c)))
    lv.groupBy("symbol")
      .agg(
        best("bid", "price").as("best_bid"),
        best("ask", "price").as("best_ask"),
        best("bid", "qty").as("best_bid_qty"),
        best("ask", "qty").as("best_ask_qty"),
        // decimal-accumulated: exact under any partial-agg order, so the
        // sums (and the imbalance derived from them) are engine-portable
        sum(when(col("side") === "bid", col("value")).otherwise(0.0)
          .cast("decimal(27,8)")).cast("double").as("bid_value_sum"),
        sum(when(col("side") === "ask", col("value")).otherwise(0.0)
          .cast("decimal(27,8)")).cast("double").as("ask_value_sum"),
        count(when(col("side") === "bid", 1)).as("bid_levels"),
        count(when(col("side") === "ask", 1)).as("ask_levels"))
      .withColumn("spread", col("best_ask") - col("best_bid"))
      .withColumn(
        "spread_bp",
        round(col("spread") / ((col("best_ask") + col("best_bid")) / 2.0) * 10000.0, 4))
      .withColumn(
        "ob_imbalance",
        round(
          (col("bid_value_sum") - col("ask_value_sum")) /
            nullif(col("bid_value_sum") + col("ask_value_sum"), lit(0.0)),
          6))
      .withColumn(
        "weighted_mid",
        round(
          (col("best_bid") * col("best_ask_qty") + col("best_ask") * col("best_bid_qty")) /
            nullif(col("best_bid_qty") + col("best_ask_qty"), lit(0.0)),
          6))
      .drop("best_bid_qty", "best_ask_qty")
  }
}
