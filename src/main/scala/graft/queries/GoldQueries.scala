package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.FeatureVectors

/** Gold-layer queries: the wide per-tick feature vector and the packed
  * training record (S3_SCHEMA.md:520-609, :713-723). The 2 s grid / 10 s
  * horizon scale to 2 min / 10 min on the sparse events table.
  */
object GoldQueries {
  private val T = Tables.tradesOracleCte

  private def features(s: SparkSession, dir: String): DataFrame =
    FeatureVectors.assemble(
      Tables.trades(s, dir),
      symbol = col("symbol"), tsMs = col("ts_ms"), price = col("price"),
      qty = col("qty"), tieBreak = col("trade_id"), gridMs = 120000L)

  private val ticksCte =
    """ticks AS (
      |  SELECT symbol, (ts_ms // 120000) * 120000 AS feature_ts,
      |    count(*) AS trade_count,
      |    CAST(sum(CAST(qty AS DECIMAL(27,8))) AS DOUBLE) AS volume,
      |    CAST(sum(CAST(price * qty AS DECIMAL(27,10))) AS DOUBLE)
      |      / nullif(CAST(sum(CAST(qty AS DECIMAL(27,8))) AS DOUBLE), 0.0) AS vwap,
      |    min(price) AS price_min,
      |    max(price) AS price_max,
      |    last(price ORDER BY ts_ms, trade_id) AS price_last
      |  FROM t GROUP BY 1, 2),
      |fv AS (
      |  SELECT symbol, feature_ts, trade_count, volume, vwap, price_min, price_max, price_last,
      |    price_last - lag(price_last, 1) OVER w AS price_change,
      |    (price_last - lag(price_last, 1) OVER w) / nullif(lag(price_last, 1) OVER w, 0.0) * 100 AS price_change_pct,
      |    round(sin(((feature_ts // 3600000) % 24) * (2.0 * pi()) / 24.0), 6) + 0.0 AS hour_sin,
      |    round(cos(((feature_ts // 3600000) % 24) * (2.0 * pi()) / 24.0), 6) + 0.0 AS hour_cos,
      |    ((feature_ts // 3600000) % 24) BETWEEN 13 AND 21 AS is_us_hours
      |  FROM ticks
      |  WINDOW w AS (PARTITION BY symbol ORDER BY feature_ts))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G1 — wide per-tick feature vector (gold layer).
    "g1_feature_vectors" -> { (s, dir) => features(s, dir) },
    // G2 — packed training record: features array + names + horizon label.
    // The array itself is verified via length + deterministic sequential sum
    // (raw list columns hash differently across parquet/pandas readers).
    "g2_training_records" -> { (s, dir) =>
      FeatureVectors
        .trainingRecords(features(s, dir), gridMs = 120000L, horizonBuckets = 5)
        .select(
          col("symbol"), col("feature_ts"),
          size(col("features")).cast("long").as("n_features"),
          aggregate(col("features"), lit(0.0), (a, x) => a + x).as("feat_sum"),
          col("current_price"), col("future_price"), col("label_return"),
          col("is_valid"))
    }
  )

  val oracle: Map[String, String] = Map(
    "g1_feature_vectors" ->
      s"""WITH t AS ($T),
         |$ticksCte
         |SELECT * FROM fv""".stripMargin,
    "g2_training_records" ->
      s"""WITH t AS ($T),
         |$ticksCte,
         |packed AS (
         |  SELECT symbol, feature_ts,
         |    [CAST(trade_count AS DOUBLE), volume, coalesce(vwap, price_last), price_min, price_max, price_last,
         |     coalesce(price_change, 0.0), coalesce(price_change_pct, 0.0),
         |     hour_sin, hour_cos, CASE WHEN is_us_hours THEN 1.0 ELSE 0.0 END] AS features,
         |    price_last
         |  FROM fv)
         |SELECT p.symbol, p.feature_ts,
         |  len(p.features) AS n_features,
         |  list_sum(p.features) AS feat_sum,
         |  p.price_last AS current_price,
         |  f.price_last AS future_price,
         |  CASE WHEN p.price_last > 0 AND f.price_last > 0 THEN round(ln(f.price_last / p.price_last), 8) + 0.0 END AS label_return,
         |  f.price_last IS NOT NULL AS is_valid
         |FROM packed p
         |LEFT JOIN packed f
         |  ON f.symbol = p.symbol AND f.feature_ts = p.feature_ts + 600000""".stripMargin
  )
}
