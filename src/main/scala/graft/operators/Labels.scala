package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Horizon-ahead label generation — SURVEY §2.3 J2, the reference's gold
  * layer (`docs/schemas/S3_SCHEMA.md:623-682`): features at grid tick `t`
  * joined to the price at `t + horizon`, plus log return and direction.
  *
  * Spark-first shape: snap both sides to the feature grid (the reference's
  * 2 s cadence), reducing the "future price" lookup to an **equi-join** on
  * (symbol, bucket + k). No range join, no window over the whole stream —
  * the join hash-partitions on the grid key and scales linearly.
  */
object Labels {

  /** Grid-snapped last price per (symbol, bucket). */
  def gridPrices(
      trades: DataFrame,
      symbol: Column,
      tsMs: Column,
      price: Column,
      tieBreak: Column,
      gridMs: Long): DataFrame =
    trades
      .groupBy(symbol.as("symbol"), graft.functions.TimeUnits.bucketIndex(tsMs, gridMs).as("bucket"))
      .agg(max_by(price, struct(tsMs, tieBreak)).as("px"))

  /** J2: per grid tick — current price, price `horizonBuckets` ahead,
    * `log_return`, integer `direction`, and `is_valid` (future tick exists,
    * `S3_SCHEMA.md:664-668`). Left join keeps unlabeled ticks.
    */
  def horizonLabels(grid: DataFrame, horizonBuckets: Int, gridMs: Long): DataFrame = {
    val future = grid.select(
      col("symbol"),
      (col("bucket") - horizonBuckets).as("bucket"),
      col("px").as("future_price"))
    grid
      .join(future, Seq("symbol", "bucket"), "left")
      .select(
        col("symbol"),
        (col("bucket") * gridMs).as("feature_ts"),
        col("px").as("current_price"),
        col("future_price"),
        when(col("px") > 0 && col("future_price") > 0,
          graft.functions.Num.nz(round(log(col("future_price") / col("px")), 8))).as("log_return"),
        when(col("future_price") > col("px"), 1)
          .when(col("future_price") < col("px"), -1)
          .when(col("future_price").isNotNull, 0)
          .as("direction"),
        col("future_price").isNotNull.as("is_valid"))
  }
}
