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
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts_ms", graft.functions.TimeUnits.asMillis(col("ts")))
}
