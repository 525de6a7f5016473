package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling of a keyed time series: materialize every step of
  * the per-key [min, max] grid, flag the holes, forward-fill, and
  * linear-interpolate — the gap repair a feature pipeline runs between
  * bar aggregation and model features (silent minutes otherwise become
  * missing rows that downstream rolling windows misread as instant jumps).
  * Extension op; the reference's gap handling stops at detection (W4) and
  * overlap re-reads (T7).
  *
  * Scale shape: the grid is built from a per-key min/max aggregate (one
  * map-side-combined shuffle) and `sequence()` explode — O(span/step) rows
  * per key, no driver involvement; the fill pass is two ordered windows per
  * key (the same per-key-window shape as the rolling family — keys
  * partition the work, no global window). Interpolation arithmetic is
  * plain doubles with engine-portable 6-dp rounding —
  * `floor(x*1e6 + 0.5)/1e6` computed in double on both engines (see the
  * note at the interpolation site): half-ties round toward +infinity, so
  * a NEGATIVE value exactly on a tie rounds differently from BigDecimal
  * HALF_UP (away from zero) — the price of bit-identical cross-engine
  * results, and only observable at exact 0.5e-6 ties.
  */
object Resample {

  /** One row per (key, grid step) over each key's observed span:
    * `v` = the observed value (null in gaps), `is_gap`, `v_ffill` =
    * last-observation-carried-forward, `v_interp` = linear interpolation
    * between the neighboring observations (exact `v` on observed rows; LOCF
    * at a trailing edge — though edges cannot be gaps here, the grid spans
    * observed endpoints). Input contract: at most one row per (key, ts),
    * and every observation's ts must sit ON the key's min-anchored grid
    * (`(ts − min) % step == 0`) — an off-grid observation FAILS the job
    * (full-outer orphan check below) instead of silently vanishing from
    * the joined series.
    */
  def fillGrid(
      df: DataFrame,
      key: Column,
      tsMs: Column,
      value: Column,
      stepMs: Long): DataFrame = {
    require(stepMs > 0, s"stepMs must be positive, got $stepMs")
    val base = df.select(key.as("key"), tsMs.as("ts_ms"), value.as("v"))
    val grid = base.groupBy("key")
      .agg(min(col("ts_ms")).as("mn"), max(col("ts_ms")).as("mx"))
      .select(col("key"), explode(sequence(col("mn"), col("mx"), lit(stepMs))).as("ts_ms"))
    val wb = Window.partitionBy("key").orderBy("ts_ms")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("key").orderBy("ts_ms")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsTs = when(col("v").isNotNull, col("ts_ms"))
    // Full outer, not left: an observation whose ts misses the grid would
    // silently drop out of a left join (and pull the fill toward LOCF as if
    // it never existed). Here it surfaces as a row with no grid marker and
    // fails loudly.
    grid.withColumn("__on_grid", lit(true))
      .join(base, Seq("key", "ts_ms"), "full")
      .withColumn(
        "v",
        when(
          col("__on_grid").isNull,
          raise_error(format_string(
            "fillGrid: observation off the min-anchored step grid (key=%s, ts=%s)",
            col("key").cast("string"), col("ts_ms").cast("string"))))
          .otherwise(col("v")))
      .drop("__on_grid")
      .withColumn("ffill", last(col("v"), ignoreNulls = true).over(wb))
      .withColumn("bfill", first(col("v"), ignoreNulls = true).over(wf))
      .withColumn("prev_ts", last(obsTs, ignoreNulls = true).over(wb))
      .withColumn("next_ts", first(obsTs, ignoreNulls = true).over(wf))
      .withColumn("is_gap", col("v").isNull)
      .withColumn(
        "v_interp",
        when(col("v").isNotNull, col("v"))
          .when(col("ffill").isNull, col("bfill"))
          .when(col("bfill").isNull, col("ffill"))
          .otherwise {
            // engine-portable 6-dp rounding: floor(x*1e6 + 0.5)/1e6 in
            // DOUBLE on both engines — round(x, 6) disagrees by one ulp at
            // representation boundaries (Spark rounds the exact binary
            // value via BigDecimal HALF_UP, DuckDB rounds the *1e6 double)
            val x = col("ffill") + (col("bfill") - col("ffill")) *
              ((col("ts_ms") - col("prev_ts")).cast("double") /
                (col("next_ts") - col("prev_ts")).cast("double"))
            floor(x * 1e6 + 0.5) / 1e6
          })
      .select(
        col("key"), col("ts_ms"), col("v"), col("is_gap"),
        col("ffill").as("v_ffill"), col("v_interp"))
  }
}
