package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num.nz
import graft.functions.TimeUnits
import graft.operators.TradeAggregates.exactSum

/** Gold-layer feature vectors — the reference's per-tick wide feature row
  * (SURVEY §1 "Feature vectors", `docs/schemas/S3_SCHEMA.md:520-609`): one row
  * per (symbol, grid tick) combining trade-window stats, price-change lag
  * features, cyclical time encodings and session flags; plus the training
  * record shape (`S3_SCHEMA.md:713-723`) with `features: array<double>` +
  * `feature_names`.
  *
  * Composition shape: ONE grid aggregation produces the per-tick stats, lag
  * features ride a window over the same partitioning, and the label join
  * (Labels.horizonLabels) is a grid equi-join — three operators, two
  * shuffles total (groupBy grid; window reuses the grid partitioning).
  */
object FeatureVectors {

  val featureNames: Seq[String] = Seq(
    "trade_count", "volume", "vwap", "price_min", "price_max", "price_last",
    "price_change", "price_change_pct", "hour_sin", "hour_cos", "is_us_hours")

  /** Per-(symbol, tick) feature row on a `gridMs` grid. */
  def assemble(
      trades: DataFrame,
      symbol: Column,
      tsMs: Column,
      price: Column,
      qty: Column,
      tieBreak: Column,
      gridMs: Long): DataFrame = {
    val ticks = trades
      .groupBy(symbol.as("symbol"), TimeUnits.bucketStartMs(tsMs, gridMs).as("feature_ts"))
      .agg(
        count(lit(1)).as("trade_count"),
        exactSum(qty).as("volume"),
        (exactSum(price * qty, 10) / nullif(exactSum(qty), lit(0.0))).as("vwap"),
        min(price).as("price_min"),
        max(price).as("price_max"),
        max_by(price, struct(tsMs, tieBreak)).as("price_last"))
    val w = Window.partitionBy(col("symbol")).orderBy(col("feature_ts"))
    val hour = (TimeUnits.bucketIndex(col("feature_ts"), 3600000L) % 24).cast("double")
    ticks
      .withColumn("prev_last", lag(col("price_last"), 1).over(w))
      .withColumn("price_change", col("price_last") - col("prev_last"))
      .withColumn(
        "price_change_pct",
        (col("price_last") - col("prev_last")) / nullif(col("prev_last"), lit(0.0)) * 100)
      .withColumn("hour_sin", nz(round(sin(hour * (2.0 * math.Pi) / 24.0), 6)))
      .withColumn("hour_cos", nz(round(cos(hour * (2.0 * math.Pi) / 24.0), 6)))
      .withColumn(
        "is_us_hours",
        (TimeUnits.bucketIndex(col("feature_ts"), 3600000L) % 24).between(13, 21))
      .drop("prev_last")
  }

  /** Training records: features packed as `array<double>` (+ names, so the
    * row is self-describing like the reference's manifest), joined to the
    * horizon label.
    */
  def trainingRecords(features: DataFrame, gridMs: Long, horizonBuckets: Int): DataFrame = {
    // vwap is null for zero-volume ticks; packed vectors must be null-free
    // (a null element nulls Spark's fold-sum while DuckDB's list_sum skips
    // it — and a model can't consume nulls anyway): fall back to last price.
    val fv = array(
      col("trade_count").cast("double"), col("volume"),
      coalesce(col("vwap"), col("price_last")),
      col("price_min"), col("price_max"), col("price_last"),
      coalesce(col("price_change"), lit(0.0)),
      coalesce(col("price_change_pct"), lit(0.0)),
      col("hour_sin"), col("hour_cos"),
      when(col("is_us_hours"), 1.0).otherwise(0.0))
    val future = features.select(
      col("symbol"),
      (col("feature_ts") - gridMs * horizonBuckets).as("feature_ts"),
      col("price_last").as("future_price"))
    features
      .join(future, Seq("symbol", "feature_ts"), "left")
      .select(
        col("symbol"),
        col("feature_ts"),
        fv.as("features"),
        typedLit(featureNames).as("feature_names"),
        col("price_last").as("current_price"),
        col("future_price"),
        when(col("price_last") > 0 && col("future_price") > 0,
          nz(round(log(col("future_price") / col("price_last")), 8))).as("label_return"),
        col("future_price").isNotNull.as("is_valid"))
  }
}
