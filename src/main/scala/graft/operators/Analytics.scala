package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The curated SQL analytics layer — Spark ports of the reference's Postgres
  * views (SURVEY §2.4 A7/A8/A10, §2.2 P10; `docs/schemas/RDS_SCHEMA.md:573-769`).
  * All are single hash aggregates (partial agg before the shuffle); exact
  * percentiles use Spark's `percentile`, matching Postgres/DuckDB
  * `PERCENTILE_CONT` linear interpolation. At 100 TB, swap `percentile` for
  * `approx_percentile` per group if the per-group value lists outgrow memory —
  * semantics documented, default stays exact like the reference.
  */
object Analytics {

  /** A7: prediction-performance rollup (`RDS_SCHEMA.md:610-628`) — count,
    * MAE, RMSE, directional accuracy via AVG(CASE), p95/p99 latency.
    */
  def predictionRollup(
      rows: DataFrame,
      key: Column,
      error: Column,
      directionOk: Column,
      latency: Column): DataFrame =
    rows
      .groupBy(key.as("model_version"))
      .agg(
        count(lit(1)).as("n_predictions"),
        round(avg(abs(error)), 6).as("avg_abs_error"),
        round(sqrt(avg(error * error)), 6).as("rmse"),
        round(avg(when(directionOk, 1.0).otherwise(0.0)), 6).as("directional_accuracy"),
        round(percentile(latency, lit(0.95)), 4).as("p95_latency"),
        round(percentile(latency, lit(0.99)), 4).as("p99_latency"))

  /** A8: per-model grouped stats (`RDS_SCHEMA.md:635-661`). */
  def perModelStats(
      rows: DataFrame,
      model: Column,
      value: Column,
      tsMs: Column,
      entity: Column): DataFrame =
    rows
      .groupBy(model.as("model_version"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(value), 4).as("avg_value"),
        min(tsMs).as("first_ts"),
        max(tsMs).as("last_ts"),
        countDistinct(entity).as("n_entities"))

  /** A10: high-watermark lookups — `MAX(timestamp)`/`COUNT(*)` per key
    * (`db_writer.py:287-320`), the batch checkpoint primitive (K7).
    */
  def watermarks(rows: DataFrame, key: Column, tsMs: Column): DataFrame =
    rows.groupBy(key.as("key")).agg(
      max(tsMs).as("max_ts"),
      min(tsMs).as("min_ts"),
      count(lit(1)).as("n_records"))

  /** P10: CASE bucketing (`RDS_SCHEMA.md:682-691`, trade-size buckets at
    * `S3_SCHEMA.md:488`).
    */
  /** Time-weighted average price per key — each tick weighted by its holding
    * time (to the next tick; the last tick of a key carries no weight). The
    * standard bar/valuation feature the plain `avg` mis-states under
    * irregular tick spacing. One shuffle: the lead window and the final
    * aggregate share the key partitioning. `price*dt` accumulates in DECIMAL
    * so the sum is order-independent and cross-engine exact.
    */
  def twap(
      rows: DataFrame,
      key: Column,
      tsMs: Column,
      price: Column,
      tieBreak: Column): DataFrame = {
    rows
      .select(key.as("key"), tsMs.as("__ts"), price.as("__p"), tieBreak.as("__tie"))
      .withColumn("__dt", lead(col("__ts"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("key")).orderBy(col("__ts"), col("__tie"))) - col("__ts"))
      .filter(col("__dt").isNotNull)
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_ticks"),
        sum(col("__dt")).as("total_ms"),
        graft.functions.Num.nz(round(
          sum((col("__p") * col("__dt")).cast("decimal(38,8)")).cast("double") /
            sum(col("__dt")),
          6)).as("twap"))
  }

  def sizeBucket(v: Column, small: Double, large: Double): Column =
    when(v < small, "small").when(v < large, "medium").otherwise("large")
}
