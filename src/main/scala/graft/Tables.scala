package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md) plus the
  * column-normalized "trade stream" view used by the market-data operators.
  *
  * The reference's entities map onto the synthetic tables as documented in
  * FIXTURES.md §8: `events` stands in for the trade/quote stream, `lineitem`/
  * `orders` for the curated analytics layer, and the small dimensions for
  * broadcast joins.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events` normalized to the trade-stream shape the reference's feature
    * builder consumes (FIXTURES.md §1): epoch-ms event time, a "symbol" key,
    * a price, and a stable tie-break id. Timestamps are reduced to epoch ms
    * exactly once here (SURVEY §7.5.7 "timestamp unit chaos" — one
    * normalization point).
    */
  /** The events table's `ts` is nanosecond-precision parquet, which Spark only
    * reads with `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    * [[GraftSession]], Verify and Bench) — it then surfaces as a nanos LONG.
    * Handle both shapes so the driver's own session config also works.
    * `ts div 1000000` is integral division (a double division would lose
    * precision above 2^53 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    val tsMs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case _ => graft.functions.TimeUnits.asMillis(col("ts"))
    }
    raw.withColumn("ts_ms", tsMs)
  }

  /** `events` projected to the normalized trade shape (P1/P7 boundary
    * normalization): symbol = event_type, price = value, qty pulled out of the
    * JSON props (covers the reference's from_json surface, SURVEY §2.8), and
    * event_id as the stable trade id / tie-break.
    */
  def trades(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_type").as("symbol"),
      col("ts_ms"),
      col("value").as("price"),
      get_json_object(col("props"), "$.k").cast("double").as("qty"),
      col("event_id").as("trade_id"),
      col("user_id"))

  /** DuckDB-side equivalent of [[trades]], used as a CTE in oracle SQL. */
  val tradesOracleCte: String =
    """SELECT event_type AS symbol, epoch_ms(ts) AS ts_ms, value AS price,
      |       CAST(props->>'$.k' AS DOUBLE) AS qty, event_id AS trade_id, user_id
      |FROM events""".stripMargin
}
