package graft

import org.apache.spark.sql.functions._

import graft.schemas.Schemas
import graft.schemas.Schemas._

class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("Dataset[Trade] typed pipeline: filter + groupByKey aggregation compiles and runs") {
    val ds = Schemas.trades(spark, sf)
    val perSymbol = ds
      .filter(t => t.price > 0 && t.qty >= 0)
      .groupByKey(_.symbol)
      .mapGroups { (sym, it) =>
        val xs = it.toSeq
        (sym, xs.length, xs.map(_.qty).sum)
      }
      .toDF("symbol", "n", "total_qty")
    assert(perSymbol.count() === 5)
    assert(perSymbol.agg(sum($"n")).as[Long].collect()(0) === 1000L)
  }

  test("typed Bar1m roundtrips through the bars operator") {
    val bars = operators.Bars
      .ohlcv(Tables.trades(spark, sf), $"symbol", $"ts_ms", $"price",
        coalesce($"qty", lit(0.0)), $"trade_id", 60000L)
      .select($"symbol", $"open_time_ms", $"open_price", $"high_price",
        $"low_price", $"close_price", $"volume", $"notional", $"trade_count",
        coalesce($"vwap", $"close_price").as("vwap"))
      .as[Bar1m]
    val b = bars.head()
    assert(b.high_price >= math.max(b.open_price, b.close_price))
  }

  test("SQL surface: registered sbe_decode_trade works in spark.sql") {
    GraftFunctions.register(spark)
    Seq((1704067200123456L, 7L, 12345L, -2, false, "BTCUSDT"))
      .toDF("us", "id", "m", "e", "mk", "s")
      .select(functions.Sbe.encodeTrade($"us", $"id", $"m", $"e", $"mk", $"s").as("frame"))
      .createOrReplaceTempView("frames")
    val out = spark.sql(
      "SELECT sbe_decode_trade(frame).trade_id AS tid, sbe_decode_trade(frame).price AS px FROM frames")
      .collect()(0)
    assert(out.getAs[Long]("tid") === 7L)
    assert(math.abs(out.getAs[Double]("px") - 123.45) < 1e-9)
  }
}
