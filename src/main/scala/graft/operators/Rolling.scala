package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time rolling (range-frame) statistics — the reference's 1 s/5 s
  * sliding trade stats (SURVEY §2.4 A5, `docs/architecture/DATA_PIPELINE.md:109-157`)
  * and the forward path-stats used for 10 s-ahead labels (W5,
  * `docs/schemas/S3_SCHEMA.md:648-653`).
  *
  * Scale shape: window functions shuffle once on the partition key (symbol)
  * and then run a single ordered scan per partition — O(rows log rows) local
  * sort, no self-join. Range frames on the epoch-ms long axis express
  * "last N seconds" exactly (event-time, not row-count).
  *
  * Per SURVEY §7.5.5 the reference's `trades_per_second` floors the time span
  * at 1 s, underestimating sub-second intensity; here intensity uses the true
  * window span with a small epsilon.
  */
object Rolling {

  /** A5: per-row trailing-window trade stats over `windowMs`.
    *
    * Adds: `n_w` (count), `vol_w` (exact sum), `vwap_w`, `price_std_w`,
    * `price_range_w`, `interarrival_ms` (this row vs previous),
    * `trade_intensity_w` (trades/sec over true span).
    */
  def trailingStats(
      trades: DataFrame,
      symbol: Column,
      tsMs: Column,
      price: Column,
      qty: Column,
      tieBreak: Column,
      windowMs: Long = 5000L): DataFrame = {
    val wRange = Window.partitionBy(symbol).orderBy(tsMs).rangeBetween(-windowMs, 0)
    val wSeq = Window.partitionBy(symbol).orderBy(tsMs, tieBreak)
    val spanSec = (tsMs - min(tsMs).over(wRange)).cast("double") / 1000.0
    trades
      .withColumn("n_w", count(lit(1)).over(wRange))
      .withColumn("vol_w", sum(qty.cast("decimal(27,8)")).over(wRange).cast("double"))
      .withColumn(
        "vwap_w",
        sum((price * qty).cast("decimal(27,10)")).over(wRange).cast("double") /
          nullif(col("vol_w"), lit(0.0)))
      .withColumn("price_std_w", round(stddev_samp(price).over(wRange), 4))
      .withColumn(
        "price_range_w",
        round(max(price).over(wRange) - min(price).over(wRange), 8))
      .withColumn("interarrival_ms", tsMs - lag(tsMs, 1).over(wSeq))
      // Interarrival mean/variance from EXACT integer power sums: windowed
      // var_samp differs across engines at ~1e-6 relative (segment-tree vs
      // streaming accumulation), which no output rounding survives. Integer
      // Σx and Σx² are exact everywhere; the textbook formula then runs in
      // deterministic double arithmetic. (Σx² stays in int64 for gaps up to
      // ~34 days per key.)
      .withColumn("__ia_n", count(col("interarrival_ms")).over(wRange))
      .withColumn("__ia_s1", sum(col("interarrival_ms")).over(wRange).cast("double"))
      .withColumn(
        "__ia_s2",
        sum(col("interarrival_ms") * col("interarrival_ms")).over(wRange).cast("double"))
      // No rounding here: the values are already bit-deterministic (pure
      // double arithmetic over exact integer sums), and round() itself is
      // the non-portable part — integer-derived ratios sit exactly on .5
      // boundaries where Spark's BigDecimal rounding and a scaled-multiply
      // rounding disagree.
      .withColumn(
        "interarrival_mean_s_w",
        col("__ia_s1") / col("__ia_n") / 1000.0)
      .withColumn(
        "interarrival_var_s_w",
        when(
          col("__ia_n") >= 2,
          (col("__ia_s2") - col("__ia_s1") * col("__ia_s1") / col("__ia_n")) /
            (col("__ia_n") - 1) / 1.0e6))
      .drop("__ia_n", "__ia_s1", "__ia_s2")
      .withColumn(
        "trade_intensity_w",
        col("n_w").cast("double") / greatest(spanSec, lit(0.001)))
  }

  /** A5 at firehose scale: [[trailingStats]] partitions by `symbol`, so its
    * parallelism collapses to the key cardinality — the reference streams ONE
    * symbol, the classic single-hot-partition window. This variant
    * pre-buckets by (symbol, time-chunk) and stitches the chunk boundaries,
    * producing BIT-IDENTICAL output to [[trailingStats]] (same oracle) with
    * parallelism = symbols × chunks:
    *
    *   1. interarrival: chunk-local `lag`, then the first row of each chunk
    *      is stitched from a per-chunk boundary summary (one row per
    *      non-empty chunk — the only per-symbol window runs on THAT tiny
    *      table, not the stream).
    *   2. trailing range frames: every row whose trailing `windowMs` window
    *      can be seen from the next chunk (the boundary band) is replicated
    *      into it as a non-owned context row; frames then compute
    *      chunk-locally and context rows are dropped.
    *
    * Requires `chunkMs >= windowMs` so context only ever comes from the
    * immediately-previous chunk. Duplication factor = windowMs / chunkMs.
    */
  def trailingStatsBucketed(
      trades: DataFrame,
      symbol: Column,
      tsMs: Column,
      price: Column,
      qty: Column,
      tieBreak: Column,
      windowMs: Long = 5000L,
      chunkMs: Long = 60000L): DataFrame = {
    require(chunkMs >= windowMs, s"chunkMs ($chunkMs) must be >= windowMs ($windowMs)")
    val base = trades
      .withColumn("__sym", symbol)
      .withColumn("__ts", tsMs)
      .withColumn("__tie", tieBreak)
      .withColumn("__chunk", graft.functions.TimeUnits.bucketIndex(tsMs, chunkMs))

    // 1 — exact interarrival: chunk-local lag + boundary stitch. The only
    // per-symbol window runs over the per-chunk summary (one row per
    // non-empty chunk), not the stream; it is derived from the already
    // (symbol, chunk)-partitioned side so its aggregate reuses that exchange.
    val wSeqChunk = Window
      .partitionBy(col("__sym"), col("__chunk"))
      .orderBy(col("__ts"), col("__tie"))
    val local = base.withColumn("__ia_local", col("__ts") - lag(col("__ts"), 1).over(wSeqChunk))
    val wChunks = Window.partitionBy(col("__sym")).orderBy(col("__chunk"))
    val prevBounds = local
      .groupBy(col("__sym"), col("__chunk"))
      .agg(max(col("__ts")).as("__chunk_last_ts"))
      .withColumn("__prev_last_ts", lag(col("__chunk_last_ts"), 1).over(wChunks))
      .select(col("__sym"), col("__chunk"), col("__prev_last_ts"))
    val withIa = local
      .join(prevBounds, Seq("__sym", "__chunk"))
      .withColumn(
        "interarrival_ms",
        coalesce(col("__ia_local"), col("__ts") - col("__prev_last_ts")))
      .drop("__ia_local", "__prev_last_ts")

    // 2 — trailing frames over (symbol, chunk) with boundary-band context:
    // a row in chunk c sees back to ts - windowMs >= c*chunkMs - windowMs,
    // all of which lives in chunk c-1's trailing band. Context rows are
    // produced by a single explode (one pass over phase 1), not a
    // self-union (which would execute the phase-1 lineage twice).
    val all = withIa
      .withColumn(
        "__dests",
        when(
          col("__ts") >= (col("__chunk") + 1) * chunkMs - windowMs,
          array(col("__chunk"), col("__chunk") + 1))
          .otherwise(array(col("__chunk"))))
      .withColumn("__home", col("__chunk"))
      .withColumn("__chunk", explode(col("__dests")))
      .withColumn("__owner", col("__chunk") === col("__home"))
      .drop("__dests", "__home")
    val wRange = Window
      .partitionBy(col("__sym"), col("__chunk"))
      .orderBy(col("__ts"))
      .rangeBetween(-windowMs, 0)
    val spanSec = (col("__ts") - min(col("__ts")).over(wRange)).cast("double") / 1000.0
    all
      .withColumn("n_w", count(lit(1)).over(wRange))
      .withColumn("vol_w", sum(qty.cast("decimal(27,8)")).over(wRange).cast("double"))
      .withColumn(
        "vwap_w",
        sum((price * qty).cast("decimal(27,10)")).over(wRange).cast("double") /
          nullif(col("vol_w"), lit(0.0)))
      .withColumn("price_std_w", round(stddev_samp(price).over(wRange), 4))
      .withColumn(
        "price_range_w",
        round(max(price).over(wRange) - min(price).over(wRange), 8))
      .withColumn("__ia_n", count(col("interarrival_ms")).over(wRange))
      .withColumn("__ia_s1", sum(col("interarrival_ms")).over(wRange).cast("double"))
      .withColumn(
        "__ia_s2",
        sum(col("interarrival_ms") * col("interarrival_ms")).over(wRange).cast("double"))
      .withColumn(
        "interarrival_mean_s_w",
        col("__ia_s1") / col("__ia_n") / 1000.0)
      .withColumn(
        "interarrival_var_s_w",
        when(
          col("__ia_n") >= 2,
          (col("__ia_s2") - col("__ia_s1") * col("__ia_s1") / col("__ia_n")) /
            (col("__ia_n") - 1) / 1.0e6))
      .withColumn(
        "trade_intensity_w",
        col("n_w").cast("double") / greatest(spanSec, lit(0.001)))
      .filter(col("__owner"))
      .drop("__ia_n", "__ia_s1", "__ia_s2", "__owner", "__chunk", "__tie", "__sym", "__ts")
  }

  /** W5: forward path stats over `(t, t + horizonMs]` — the label-side
    * max/min/range/volume/count of the 10 s window after each feature tick.
    */
  def forwardPathStats(
      rows: DataFrame,
      symbol: Column,
      tsMs: Column,
      price: Column,
      qty: Column,
      horizonMs: Long = 10000L): DataFrame = {
    // (t, t+h]: exclude the current instant, include the horizon end.
    val w = Window.partitionBy(symbol).orderBy(tsMs).rangeBetween(1, horizonMs)
    rows
      .withColumn("path_max", max(price).over(w))
      .withColumn("path_min", min(price).over(w))
      .withColumn("path_range", round(col("path_max") - col("path_min"), 8))
      .withColumn("path_volume", sum(qty.cast("decimal(27,8)")).over(w).cast("double"))
      .withColumn("path_trades", count(price).over(w))
  }

  /** W6: momentum / acceleration — differences of lagged rolling means
    * (`S3_SCHEMA.md:569-578`). `momentum` = current trailing mean minus the
    * trailing mean one row earlier; `acceleration` = diff of momentum.
    */
  def momentum(
      rows: DataFrame,
      symbol: Column,
      tsMs: Column,
      price: Column,
      tieBreak: Column,
      windowMs: Long = 5000L): DataFrame = {
    val wRange = Window.partitionBy(symbol).orderBy(tsMs).rangeBetween(-windowMs, 0)
    val wSeq = Window.partitionBy(symbol).orderBy(tsMs, tieBreak)
    // Decimal-accumulated mean: exact under any evaluation order, so the
    // momentum diffs are engine- and partition-order-independent.
    val maExact =
      sum(price.cast("decimal(27,8)")).over(wRange).cast("double") /
        count(lit(1)).over(wRange)
    rows
      .withColumn("ma_w", maExact)
      .withColumn("momentum", col("ma_w") - lag(col("ma_w"), 1).over(wSeq))
      .withColumn("acceleration", col("momentum") - lag(col("momentum"), 1).over(wSeq))
  }
}
