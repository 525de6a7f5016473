package graft.schemas

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Typed data model — SURVEY §7.2 item 1: case classes for the reference's
  * entities (FIXTURES.md §§1-7), giving `Dataset[T]` APIs with compile-time
  * field checks where the schema is fixed. DataFrames remain the norm where
  * schemas are dynamic (bronze boundary).
  *
  * Field names/types follow the Avro + schema docs cited in FIXTURES.md;
  * epoch fields are milliseconds throughout (TimeUnits normalizes earlier).
  */
object Schemas {

  /** MarketTrade.avsc / binance_rest.py:235-244 */
  final case class Trade(
      symbol: String,
      event_ts: Long,
      ingest_ts: Long,
      trade_id: Long,
      price: Double,
      qty: Double,
      is_buyer_maker: Boolean,
      source: String)

  /** BestBidAsk.avsc */
  final case class BestBidAsk(
      symbol: String,
      event_ts: Long,
      ingest_ts: Long,
      bid_px: Double,
      bid_sz: Double,
      ask_px: Double,
      ask_sz: Double,
      source: String)

  final case class BookLevel(price: Double, qty: Double)

  /** DepthDelta.avsc + S3_SCHEMA.md:155-190 (numeric levels, not strings —
    * SURVEY P6 verdict: keep numeric).
    */
  final case class DepthDelta(
      symbol: String,
      event_ts: Long,
      ingest_ts: Long,
      first_update_id: Long,
      final_update_id: Long,
      bids: Seq[BookLevel],
      asks: Seq[BookLevel],
      source: String)

  /** Silver 1-minute bar, S3_SCHEMA.md:316-392 (core subset). */
  final case class Bar1m(
      symbol: String,
      open_time_ms: Long,
      open_price: Double,
      high_price: Double,
      low_price: Double,
      close_price: Double,
      volume: Double,
      notional: Double,
      trade_count: Long,
      vwap: Double)

  /** Prediction log row, RDS_SCHEMA.md:171-241 (as-of join input). */
  final case class Prediction(
      prediction_id: String,
      symbol: String,
      model_version: String,
      prediction_ts: Long,
      target_ts: Long,
      current_price: Double,
      predicted_price: Double,
      confidence: Double)

  implicit val tradeEnc: Encoder[Trade] = Encoders.product[Trade]
  implicit val bbaEnc: Encoder[BestBidAsk] = Encoders.product[BestBidAsk]
  implicit val depthEnc: Encoder[DepthDelta] = Encoders.product[DepthDelta]
  implicit val barEnc: Encoder[Bar1m] = Encoders.product[Bar1m]
  implicit val predEnc: Encoder[Prediction] = Encoders.product[Prediction]

  /** The testdata trade view as a typed Dataset. */
  def trades(spark: SparkSession, dir: String): Dataset[Trade] = {
    import org.apache.spark.sql.functions._
    graft.Tables
      .trades(spark, dir)
      .select(
        col("symbol"),
        col("ts_ms").as("event_ts"),
        col("ts_ms").as("ingest_ts"),
        col("trade_id"),
        col("price"),
        coalesce(col("qty"), lit(0.0)).as("qty"),
        (col("trade_id") % 2 === 0).as("is_buyer_maker"),
        lit("rest").as("source"))
      .as[Trade]
  }
}
