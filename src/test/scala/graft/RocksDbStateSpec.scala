package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{BookState, EwmaStream}
import graft.streaming.BookState.{Delta, Snapshot}

/** The stateful ops under the RocksDB state store — the 100 TB setting
  * ([[GraftSession.withRocksDbStateStore]]): identical results to the
  * default on-heap provider, with the provider swap PROVEN from the
  * query's own progress metrics, not assumed from the conf. The reference
  * keeps the same hot state off-heap in Redis (`DATA_PIPELINE.md:61-213`);
  * RocksDB is Spark's native analog — state in native memory + local SSTs,
  * executor heap out of the equation.
  */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  /** RocksDB-only custom metrics in the operator progress are the proof the
    * provider actually served the state (an ignored conf would fall back
    * on-heap and emit none).
    */
  private def assertRocksDbServed(q: StreamingQuery): Unit = {
    val metricKeys = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq)
      .flatMap(_.customMetrics.keySet.asScala)
    assert(
      metricKeys.exists(_.toLowerCase.contains("rocksdb")),
      s"no rocksdb metrics in progress — provider swap did not take (saw: ${metricKeys.distinct})")
  }

  private def withRocksDb[A](body: => A): A = {
    val keys = Seq(
      "spark.sql.streaming.stateStore.providerClass",
      "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage",
      "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    GraftSession.configureRocksDbState(spark, maxMemoryMB = 256)
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("book replay scenario under RocksDB: cross-batch state, stale-delta no-op, provider proven") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Delta]
      val q = BookState.maintain(mem.toDS(), depth = 3)
        .writeStream.outputMode("append").format("memory").queryName("book_rocks").start()
      try {
        mem.addData(
          Delta("BTC", 1L, 1000L, "bid", 100.0, 1.5),
          Delta("BTC", 2L, 1000L, "bid", 99.0, 2.0),
          Delta("BTC", 3L, 1001L, "ask", 101.0, 1.0),
          Delta("BTC", 4L, 1001L, "ask", 102.0, 3.0))
        q.processAllAvailable()

        // cross-batch: the RocksDB store must hand batch 1's book back
        mem.addData(
          Delta("BTC", 5L, 2000L, "bid", 100.0, 0.0), // delete best bid
          Delta("BTC", 6L, 2000L, "ask", 100.5, 0.7), // new best ask
          Delta("BTC", 7L, 2001L, "bid", 99.0, 4.0)) // update survivor
        q.processAllAvailable()
        val s = spark.table("book_rocks").as[Snapshot].collect().last
        assert(s.best_bid.contains(99.0) && s.best_ask.contains(100.5))
        assert(s.bids === Seq((99.0, 4.0)))
        assert(s.asks === Seq((100.5, 0.7), (101.0, 1.0), (102.0, 3.0)))
        assert(s.last_update_id === 7L)

        // at-least-once guard: a replayed stale id is a no-op through the
        // RocksDB-held frontier too
        val before = spark.table("book_rocks").count()
        mem.addData(Delta("BTC", 5L, 2500L, "bid", 100.0, 9.9))
        q.processAllAvailable()
        assert(spark.table("book_rocks").count() === before)

        assertRocksDbServed(q)
      } finally q.stop()
    }
  }

  test("restart from checkpoint under RocksDB recovers the book AND the replay frontier") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("graft_rocks_restart_").toString
      val mem = MemoryStream[Delta]
      // the memory sink refuses checkpoint recovery; foreachBatch supports
      // it, and a shared buffer observes exactly what each incarnation emits
      val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Snapshot]()
      def start() = BookState.maintain(mem.toDS(), depth = 3)
        .writeStream.outputMode("append")
        .foreachBatch((batch: org.apache.spark.sql.Dataset[Snapshot], _: Long) =>
          batch.collect().foreach(emitted.add))
        .option("checkpointLocation", ckpt).start()

      val q1 = start()
      try {
        mem.addData(
          Delta("BTC", 1L, 1000L, "bid", 100.0, 1.5),
          Delta("BTC", 2L, 1000L, "bid", 99.0, 2.0),
          Delta("BTC", 3L, 1001L, "ask", 101.0, 1.0))
        q1.processAllAvailable()
      } finally q1.stop()
      emitted.clear()

      // A NEW query instance on the SAME checkpoint: state must come back
      // from the RocksDB snapshot + changelog, not from anything in-heap.
      val q2 = start()
      try {
        mem.addData(
          Delta("BTC", 4L, 2000L, "bid", 100.0, 0.0), // deletes a level only a RECOVERED book has
          Delta("BTC", 5L, 2000L, "ask", 100.5, 0.7))
        q2.processAllAvailable()
        val snaps = emitted.iterator().asScala.toSeq
        assert(snaps.nonEmpty, "restarted query emitted nothing")
        val s = snaps.last
        assert(s.bids === Seq((99.0, 2.0)), "pre-restart bid level lost across recovery")
        assert(s.asks === Seq((100.5, 0.7), (101.0, 1.0)))
        assert(s.last_update_id === 5L)

        // the update-id frontier must survive recovery too: a replay of a
        // PRE-restart id through the restarted query is a no-op
        val before = emitted.size()
        mem.addData(Delta("BTC", 2L, 2500L, "bid", 98.0, 9.9))
        q2.processAllAvailable()
        assert(emitted.size() === before,
          "stale pre-restart update id was re-applied after recovery")
        assertRocksDbServed(q2)
      } finally q2.stop()
    }
  }

  test("ewma features under RocksDB match the default-provider sequence bit-for-bit") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[EwmaStream.Px]
      val q = EwmaStream.features(mem.toDS(), lookback = 4)
        .writeStream.outputMode("append").format("memory").queryName("ewma_rocks").start()
      try {
        // two micro-batches so the frame crosses a store round-trip
        mem.addData((1 to 3).map(i =>
          EwmaStream.Px("BTC", 1000L * i, i.toLong, 100.0 + i)): _*)
        q.processAllAvailable()
        mem.addData((4 to 6).map(i =>
          EwmaStream.Px("BTC", 1000L * i, i.toLong, 100.0 + i)): _*)
        q.processAllAvailable()
        val streamed = spark.table("ewma_rocks").as[EwmaStream.Feat].collect()
          .sortBy(_.trade_id).map(f => (f.trade_id, f.ewma_fast, f.ewma_slow, f.macd))

        // oracle: the batch fold over the same ticks (Rolling's constants),
        // which EwmaStreamSpec already proved equal to the DEFAULT provider
        // — transitively, RocksDB == on-heap == batch
        val batch = graft.operators.Rolling.ewmaFeatures(
          (1 to 6).map(i => ("BTC", 1000L * i, i.toLong, 100.0 + i))
            .toDF("symbol", "ts_ms", "trade_id", "price"),
          symbol = org.apache.spark.sql.functions.col("symbol"),
          tsMs = org.apache.spark.sql.functions.col("ts_ms"),
          price = org.apache.spark.sql.functions.col("price"),
          tieBreak = org.apache.spark.sql.functions.col("trade_id"),
          lookback = 4)
          .orderBy("trade_id")
          .select("trade_id", "ewma_fast", "ewma_slow", "macd")
          .collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        assert(streamed.toSeq === batch.toSeq)
        assertRocksDbServed(q)
      } finally q.stop()
    }
  }
}
