package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.BookState
import graft.streaming.BookState.{Delta, Snapshot}

/** Order-book maintenance from depth deltas (`DATA_PIPELINE.md:84-120`):
  * the streaming `flatMapGroupsWithState` book and its batch replay twin
  * must agree on the end state from the same delta log.
  */
class BookStateSpec extends SparkSpec {
  import spark.implicits._

  test("book state applies set/update/delete deltas across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Delta]
    val q = BookState.maintain(mem.toDS(), depth = 3)
      .writeStream.outputMode("append").format("memory").queryName("book").start()

    // trigger 1: establish two bid levels + two ask levels
    mem.addData(
      Delta("BTC", 1L, 1000L, "bid", 100.0, 1.5),
      Delta("BTC", 2L, 1000L, "bid", 99.0, 2.0),
      Delta("BTC", 3L, 1001L, "ask", 101.0, 1.0),
      Delta("BTC", 4L, 1001L, "ask", 102.0, 3.0))
    q.processAllAvailable()
    val s1 = spark.table("book").as[Snapshot].collect().last
    assert(s1.best_bid.contains(100.0) && s1.best_ask.contains(101.0))
    assert(s1.spread.contains(1.0) && s1.last_update_id === 4L)
    assert(s1.bids === Seq((100.0, 1.5), (99.0, 2.0)))

    // trigger 2: cross-batch state — update one level, DELETE the best bid
    // (qty=0), add a better ask; the book must remember trigger 1's levels
    mem.addData(
      Delta("BTC", 5L, 2000L, "bid", 100.0, 0.0), // delete best bid
      Delta("BTC", 6L, 2000L, "ask", 100.5, 0.7), // new best ask
      Delta("BTC", 7L, 2001L, "bid", 99.0, 4.0)) // update surviving level
    q.processAllAvailable()
    val s2 = spark.table("book").as[Snapshot].collect().last
    assert(s2.best_bid.contains(99.0) && s2.best_ask.contains(100.5))
    assert(s2.bids === Seq((99.0, 4.0)))
    assert(s2.asks === Seq((100.5, 0.7), (101.0, 1.0), (102.0, 3.0)))
    assert(s2.last_update_id === 7L)

    // trigger 3: a replayed stale delta (id <= frontier) must be a no-op —
    // the at-least-once guard; no snapshot row is emitted for it
    val before = spark.table("book").count()
    mem.addData(Delta("BTC", 5L, 2500L, "bid", 100.0, 9.9))
    q.processAllAvailable()
    assert(spark.table("book").count() === before)
    q.stop()
  }

  test("depth truncation keeps only top-N per side, full level count reported") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Delta]
    val q = BookState.maintain(mem.toDS(), depth = 2)
      .writeStream.outputMode("append").format("memory").queryName("book_depth").start()
    mem.addData((1 to 5).map(i =>
      Delta("ETH", i.toLong, 1000L + i, "bid", 100.0 - i, 1.0)): _*)
    q.processAllAvailable()
    val s = spark.table("book_depth").as[Snapshot].collect().last
    assert(s.bids === Seq((99.0, 1.0), (98.0, 1.0))) // best two only
    assert(s.bid_levels === 5) // but the live map keeps all levels
    q.stop()
  }

  test("streaming end state equals the batch replay of the same delta log") {
    // a generated log with genuine collisions, deletions and two symbols,
    // split across three micro-batches at awkward boundaries
    val log = (1 to 90).map { i =>
      val sym = if (i % 3 == 0) "ETH" else "BTC"
      val side = if (i % 2 == 0) "bid" else "ask"
      val price = 100.0 + (i % 7) * (if (side == "bid") -1 else 1)
      val qty = if (i % 17 == 0) 0.0 else 1.0 + (i % 5)
      Delta(sym, i.toLong, 1000L + i, side, price, qty)
    }
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Delta]
    val q = BookState.maintain(mem.toDS(), depth = 10)
      .writeStream.outputMode("append").format("memory").queryName("book_replay").start()
    log.grouped(37).foreach { batch => mem.addData(batch: _*); q.processAllAvailable() }
    val streamed = spark.table("book_replay").as[Snapshot].collect()
      .groupBy(_.symbol).map { case (s, snaps) => s -> snaps.maxBy(_.last_update_id) }
    q.stop()

    val batch = graft.operators.BookReplay.levels(
      log.toDF(), symbol = col("symbol"), updateId = col("update_id"),
      side = col("side"), price = col("price"), qty = col("qty"), depth = 10)
      .collect()
      .map(r => (r.getAs[String]("symbol"), r.getAs[String]("side"),
        r.getAs[Long]("level"), r.getAs[Double]("price"), r.getAs[Double]("qty")))
      .toSet
    val streamedLevels = streamed.values.flatMap { s =>
      s.bids.zipWithIndex.map { case ((p, v), i) => (s.symbol, "bid", (i + 1).toLong, p, v) } ++
        s.asks.zipWithIndex.map { case ((p, v), i) => (s.symbol, "ask", (i + 1).toLong, p, v) }
    }.toSet
    assert(streamedLevels === batch)
  }
}
