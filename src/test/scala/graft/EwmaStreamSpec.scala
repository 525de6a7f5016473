package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EwmaStream
import graft.streaming.EwmaStream.{Feat, Px}

/** The streaming EWMA/MACD (hot-path online form of w9): bit-identical to
  * the batch op on in-order input, stale rows dropped and counted.
  */
class EwmaStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming features are bit-identical to batch ewmaFeatures across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic multi-key feed, in (ts, tie) order per key, split across
    // micro-batches at awkward points (mid-frame for every key)
    val rnd = new scala.util.Random(11)
    val feed = (1 to 300).map { i =>
      Px("S" + (i % 3), 1000L + i * 40, i.toLong, 100.0 + rnd.nextInt(500) / 100.0)
    }
    val mem = MemoryStream[Px]
    val q = EwmaStream.features(mem.toDS(), lookback = 8)
      .writeStream.outputMode("append").format("memory").queryName("ewma_stream")
      .start()
    try {
      feed.grouped(77).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("ewma_stream").as[Feat].collect()
        .map(f => (f.symbol, f.ts_ms, f.trade_id) ->
          (f.price, f.ewma_fast, f.ewma_slow, f.macd)).toMap
      val batch = graft.operators.Rolling
        .ewmaFeatures(
          feed.toDF("symbol", "ts_ms", "trade_id", "price"),
          symbol = col("symbol"), tsMs = col("ts_ms"), price = col("price"),
          tieBreak = col("trade_id"), lookback = 8)
        .collect()
        .map(r => (r.getAs[String]("symbol"), r.getAs[Long]("ts_ms"), r.getAs[Long]("trade_id")) ->
          (r.getAs[Double]("price"), r.getAs[Double]("ewma_fast"),
            r.getAs[Double]("ewma_slow"), r.getAs[Double]("macd")))
        .toMap
      assert(streamed.size === batch.size)
      assert(streamed === batch) // bit-for-bit, every row
      assert(spark.table("ewma_stream").as[Feat].collect().forall(_.late_dropped === 0L))
    } finally q.stop()
  }

  test("a cross-batch regression is dropped and counted, not silently folded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Px]
    val q = EwmaStream.features(mem.toDS(), lookback = 4)
      .writeStream.outputMode("append").format("memory").queryName("ewma_late")
      .start()
    try {
      mem.addData(Px("A", 1000L, 1L, 10.0), Px("A", 2000L, 2L, 20.0))
      q.processAllAvailable()
      // a replayed old tick (ts 1500 < frontier 2000) must not shift the frame
      mem.addData(Px("A", 1500L, 3L, 99.0), Px("A", 3000L, 4L, 30.0))
      q.processAllAvailable()
      val rows = spark.table("ewma_late").as[Feat].collect().sortBy(_.ts_ms)
      assert(rows.map(_.ts_ms).toSeq === Seq(1000L, 2000L, 3000L))
      val last = rows.last
      assert(last.late_dropped === 1L)
      // frame is (10, 20, 30): the 99.0 never entered the recurrence
      // fast fold (alpha .25): seed 10 -> 0.75*10+0.25*20 = 12.5 -> 0.75*12.5+0.25*30 = 16.875
      assert(last.ewma_fast === 16.875)
    } finally q.stop()
  }
}
