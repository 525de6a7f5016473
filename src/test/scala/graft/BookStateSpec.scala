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
    assert(s.live_bid_levels === 5) // but the live map keeps all levels
    q.stop()
  }

  test("book timeline: validity carries levels across quiet chunks, deletions terminate") {
    val deltas = Seq(
      ("S", 1L, 10L, "bid", 100.0, 5.0), // chunk 0: set 100 → 5
      ("S", 2L, 150L, "bid", 99.0, 2.0), // chunk 1: set 99 → 2
      ("S", 3L, 320L, "bid", 100.0, 0.0), // chunk 3: DELETE 100
      ("S", 4L, 550L, "ask", 101.0, 1.0) // chunk 5: set ask (also the max chunk)
    ).toDF("symbol", "uid", "ts_ms", "side", "price", "qty")
    val out = graft.operators.BookReplay.timeline(
      deltas, symbol = col("symbol"), updateId = col("uid"), tsMs = col("ts_ms"),
      side = col("side"), price = col("price"), qty = col("qty"),
      chunkMs = 100L, depth = 10)
      .collect()
      .map(r => (r.getAs[Long]("snapshot_ts") / 100 - 1, r.getAs[String]("side"),
        r.getAs[Double]("price"), r.getAs[Double]("qty")))
      .toSet
    val expected: Set[(Long, String, Double, Double)] =
      // bid 100@5: live at chunk ends 0,1,2 — the chunk-3 deletion ends it
      (0L to 2L).map(c => (c, "bid", 100.0, 5.0)).toSet ++
        // bid 99@2: set in chunk 1, never touched again → carries to max chunk 5
        (1L to 5L).map(c => (c, "bid", 99.0, 2.0)).toSet +
        ((5L, "ask", 101.0, 1.0))
    assert(out === expected)
  }

  test("snapshot compaction: identical replay, validity spans bounded by K") {
    // a long sparse log: levels written once early, then silence for many
    // chunks — exactly the shape whose validity spans blow up untreated
    val log = Seq(
      ("S", 0L, 10L, "bid", 100.0, 5.0), // chunk 0
      ("S", 1L, 120L, "ask", 101.0, 1.0), // chunk 1
      ("S", 2L, 1510L, "bid", 99.0, 2.0), // chunk 15
      ("S", 3L, 2020L, "bid", 100.0, 0.0), // chunk 20: delete 100
      ("S", 4L, 3170L, "ask", 101.0, 3.0) // chunk 31: update ask (max chunk)
    ).toDF("symbol", "uid", "ts_ms", "side", "price", "qty")
    def args = (col("symbol"), col("uid"), col("ts_ms"), col("side"), col("price"), col("qty"))
    val (s, u, t, sd, p, q) = args
    val compacted = graft.operators.BookReplay.compact(
      log, s, u, t, sd, p, q, chunkMs = 100L, everyChunks = 8)
    // 1 — the timeline over the compacted log is byte-identical
    val tlA = graft.operators.BookReplay.timeline(
      log, s, u, t, sd, p, q, chunkMs = 100L, depth = 10)
    val tlB = graft.operators.BookReplay.timeline(
      compacted, s, u, t, sd, p, q, chunkMs = 100L, depth = 10)
    assert(tlB.count() === tlA.count())
    assert(tlB.exceptAll(tlA).isEmpty && tlA.exceptAll(tlB).isEmpty)
    // 2 — end-state levels are byte-identical too
    val lvA = graft.operators.BookReplay.levels(log, s, u, sd, p, q)
    val lvB = graft.operators.BookReplay.levels(compacted, s, u, sd, p, q)
    assert(lvB.exceptAll(lvA).isEmpty && lvA.exceptAll(lvB).isEmpty)
    // 3 — every level's gap between consecutive touches is now <= K, so a
    // segment-local timeline never explodes more than K chunks per level
    val gaps = compacted
      .withColumn("__chunk", (col("ts_ms") / 100).cast("long"))
      .select(col("symbol"), col("side"), col("price"), col("__chunk"))
      .distinct()
      .withColumn(
        "__gap",
        col("__chunk") - lag(col("__chunk"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("symbol", "side", "price").orderBy("__chunk")))
    assert(gaps.filter(col("__gap") > 8).count() === 0)
    // 4 — and the untreated log genuinely had the pathology (sanity)
    assert(log.count() === 5 && compacted.count() > 5)
  }

  test("eviction -> partial replay -> snapshot re-anchor -> book bit-equal to full batch replay") {
    // The full re-anchor lifecycle (re_anchor_service/README.md:36-60):
    // an idle symbol's book is EVICTED to a frontier tombstone; deltas
    // arriving after eviction rebuild only the levels they touch (PARTIAL
    // by the delta-feed contract); a REST-style snapshot re-anchors it;
    // the final streamed book must equal BookReplay.levels of the whole
    // log as if eviction never happened.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Delta]
    // watermark 1 s + idle timeout 1 s so "A" evicts as soon as another
    // symbol's event time advances the global watermark past it
    val q = BookState.maintain(
      mem.toDS(), depth = 10, watermarkDelay = "1 second", idleTimeoutMs = 1000L)
      .writeStream.outputMode("append").format("memory").queryName("book_anchor").start()
    try {
      // phase 1: A's initial book (4 levels) + a B heartbeat
      val p1 = Seq(
        Delta("A", 1L, 1000L, "bid", 100.0, 1.0),
        Delta("A", 2L, 1000L, "bid", 99.0, 2.0),
        Delta("A", 3L, 1500L, "ask", 101.0, 3.0),
        Delta("A", 4L, 2000L, "ask", 102.0, 4.0),
        Delta("B", 1L, 1000L, "bid", 50.0, 1.0))
      mem.addData(p1: _*)
      q.processAllAvailable()
      // phase 2: B jumps far ahead in event time -> watermark passes A's
      // idle timeout; the NEXT batch fires A's timeout (eviction)
      mem.addData(Delta("B", 2L, 5000000L, "bid", 50.0, 2.0))
      q.processAllAvailable()
      mem.addData(Delta("B", 3L, 5000100L, "bid", 50.0, 3.0)) // trigger the timeout sweep
      q.processAllAvailable()
      // phase 3: post-eviction deltas touch ONE level -> snapshot is
      // PARTIAL (the documented limitation this lifecycle exists to fix)
      val p3 = Seq(Delta("A", 20L, 5000200L, "bid", 100.0, 5.0))
      mem.addData(p3: _*)
      q.processAllAvailable()
      val partial = spark.table("book_anchor").as[Snapshot].collect()
        .filter(_.symbol == "A").maxBy(_.last_update_id)
      assert(partial.bids === Seq((100.0, 5.0)), "expected a PARTIAL rebuilt book")
      assert(partial.asks.isEmpty && partial.last_update_id === 20L)

      // phase 4: re-anchor — the snapshot the REST fetch would return IS
      // the batch replay of everything so far (the audit-path identity)
      val soFar = (p1.filter(_.symbol == "A") ++ p3).toDF()
      val snap = graft.operators.BookReplay.levels(
        soFar, symbol = col("symbol"), updateId = col("update_id"),
        side = col("side"), price = col("price"), qty = col("qty"), depth = 10)
        .collect()
        .map(r => (r.getAs[String]("side"), r.getAs[Long]("level"),
          r.getAs[Double]("price"), r.getAs[Double]("qty")))
      def side(s: String) = snap.filter(_._1 == s).sortBy(_._2).map(x => (x._3, x._4)).toSeq
      val anchor = BookState.snapshotDeltas(
        "A", bids = side("bid"), asks = side("ask"), asOfUpdateId = 30L, tsMs = 5000300L)
      mem.addData(anchor: _*)
      q.processAllAvailable()
      // phase 5: live deltas continue past the snapshot
      val tail = Seq(
        Delta("A", 40L, 5000400L, "ask", 101.0, 7.0), // update a snapshot level
        Delta("A", 41L, 5000400L, "bid", 99.0, 0.0), // delete one
        Delta("A", 42L, 5000500L, "bid", 98.0, 9.0)) // add a new one
      mem.addData(tail: _*)
      q.processAllAvailable()

      val end = spark.table("book_anchor").as[Snapshot].collect()
        .filter(_.symbol == "A").maxBy(_.last_update_id)
      val streamedLevels = (end.bids.zipWithIndex.map { case ((p, v), i) =>
        ("bid", (i + 1).toLong, p, v)
      } ++ end.asks.zipWithIndex.map { case ((p, v), i) =>
        ("ask", (i + 1).toLong, p, v)
      }).toSet
      // ground truth: batch replay of the FULL log with NO eviction and NO
      // snapshot rows — the book as if state had never been dropped
      val truth = graft.operators.BookReplay.levels(
        (p1.filter(_.symbol == "A") ++ p3 ++ tail).toDF(),
        symbol = col("symbol"), updateId = col("update_id"),
        side = col("side"), price = col("price"), qty = col("qty"), depth = 10)
        .collect()
        .map(r => (r.getAs[String]("side"), r.getAs[Long]("level"),
          r.getAs[Double]("price"), r.getAs[Double]("qty")))
        .toSet
      assert(streamedLevels === truth, "re-anchored book diverges from the full batch replay")
      assert(end.last_update_id === 42L)
    } finally q.stop()
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

    // the ob:{symbol} metric fields agree bit-for-bit across the surfaces
    val batchMetrics = graft.operators.BookReplay.metrics(
      log.toDF(), symbol = col("symbol"), updateId = col("update_id"),
      side = col("side"), price = col("price"), qty = col("qty"), depth = 10)
      .collect().map(r => r.getAs[String]("symbol") -> r).toMap
    streamed.foreach { case (sym, s) =>
      val m = batchMetrics(sym)
      assert(s.best_bid.contains(m.getAs[Double]("best_bid")), sym)
      assert(s.best_ask.contains(m.getAs[Double]("best_ask")), sym)
      assert(s.spread_bp.contains(m.getAs[Double]("spread_bp")), sym)
      assert(s.bid_value_sum === m.getAs[Double]("bid_value_sum"), sym)
      assert(s.ask_value_sum === m.getAs[Double]("ask_value_sum"), sym)
      assert(s.ob_imbalance.contains(m.getAs[Double]("ob_imbalance")), sym)
      assert(s.weighted_mid.contains(m.getAs[Double]("weighted_mid")), sym)
      // level counts: batch counts within top-depth; live counts the full
      // map — min(live, depth) is the declared batch-comparable projection
      assert(math.min(s.live_bid_levels, 10).toLong === m.getAs[Long]("bid_levels"), sym)
      assert(math.min(s.live_ask_levels, 10).toLong === m.getAs[Long]("ask_levels"), sym)
    }
  }
}
