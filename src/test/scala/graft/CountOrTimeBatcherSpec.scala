package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.CountOrTimeBatcher
import graft.streaming.CountOrTimeBatcher.{Batch, Buffer, Item}

/** NOTE: with ProcessingTimeTimeout the micro-batch engine always schedules
  * another batch (so timeouts can fire), which means `processAllAvailable`
  * never reaches quiescence — these specs poll the sink table instead.
  */
class CountOrTimeBatcherSpec extends SparkSpec {
  import spark.implicits._

  private def awaitCount(table: String, n: Long, timeoutMs: Long = 60000L): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (spark.table(table).count() < n && System.currentTimeMillis < deadline)
      Thread.sleep(100)
    assert(spark.table(table).count() >= n, s"$table never reached $n rows")
  }

  test("count-or-time batcher: flushes full batches on count, per key, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Item]
    val q = CountOrTimeBatcher
      .batches(mem.toDS(), maxCount = 3, maxDelayMs = 1000000000L) // time never fires
      .writeStream.outputMode("append").format("memory").queryName("cot_count")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()

    mem.addData((1 to 7).map(i => Item("BTC", i * 1000L, s"p$i")): _*)
    mem.addData(Item("ETH", 1000L, "e1"))
    // 7 BTC items -> two full count-batches of 3, one item buffered; ETH buffered
    awaitCount("cot_count", 2)
    val b1 = spark.table("cot_count").as[Batch].collect()
    assert(b1.length === 2)
    assert(b1.forall(b => b.key == "BTC" && b.n == 3 && b.flush_reason == "count"))
    // ids seed from the epoch's first event time (1000) and increment
    assert(b1.map(_.batch_id).sorted.toSeq === Seq(1000L, 1001L))
    assert(b1.find(_.batch_id == 1000L).get.payloads === Seq("p1", "p2", "p3"))

    // 2 more BTC items join the 1 buffered -> exactly one more full batch
    mem.addData(Item("BTC", 8000L, "p8"), Item("BTC", 9000L, "p9"))
    awaitCount("cot_count", 3)
    val b2 = spark.table("cot_count").as[Batch].collect()
    q.stop()
    assert(b2.length === 3)
    val third = b2.find(_.batch_id == 1002L).get
    assert(third.payloads === Seq("p7", "p8", "p9") && third.flush_reason == "count")
  }

  test("deadline anchors to the first buffered item, not the latest arrival") {
    val empty = Buffer(Nil, 0L, 0L)
    // first item at t=1000 -> deadline 1000 + 5000
    val (out1, Some(b1)) = CountOrTimeBatcher.onInput(
      "K", empty, Seq(Item("K", 10L, "a")), nowMs = 1000L, maxCount = 3, maxDelayMs = 5000L): @unchecked
    assert(out1.isEmpty && b1.deadlineMs === 6000L)
    // steady sub-threshold trickle at t=2000, t=3000: deadline must NOT move
    val (out2, Some(b2)) = CountOrTimeBatcher.onInput(
      "K", b1, Seq(Item("K", 20L, "b")), nowMs = 2000L, maxCount = 3, maxDelayMs = 5000L): @unchecked
    val (out3, Some(b3)) = CountOrTimeBatcher.onInput(
      "K", b2, Seq(Item("K", 5L, "c0")), nowMs = 3000L, maxCount = 4, maxDelayMs = 5000L): @unchecked
    assert(out2.isEmpty && out3.isEmpty)
    assert(b2.deadlineMs === 6000L && b3.deadlineMs === 6000L)
    // a count-flush resets the staleness clock for the remainder
    val (out4, Some(b4)) = CountOrTimeBatcher.onInput(
      "K", b3, Seq(Item("K", 30L, "d")), nowMs = 4000L, maxCount = 3, maxDelayMs = 5000L): @unchecked
    assert(out4.length === 1 && out4.head.flush_reason === "count")
    assert(b4.items.length === 1 && b4.deadlineMs === 9000L)
    // an exact multiple empties the buffer entirely -> state removed
    val (out5, none) = CountOrTimeBatcher.onInput(
      "K", b4, Seq(Item("K", 40L, "e"), Item("K", 50L, "f")),
      nowMs = 4500L, maxCount = 3, maxDelayMs = 5000L)
    assert(out5.length === 1 && none.isEmpty)
  }

  test("count-or-time batcher: a straggler remainder flushes on the time path") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Item]
    val q = CountOrTimeBatcher
      .batches(mem.toDS(), maxCount = 100, maxDelayMs = 300L)
      .writeStream.outputMode("append").format("memory").queryName("cot_time")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()

    mem.addData(Item("BTC", 1000L, "p1"), Item("BTC", 2000L, "p2"))
    // below the count threshold: only the matured processing-time timeout
    // can flush these (the engine keeps running batches for exactly that)
    awaitCount("cot_time", 1)
    val out = spark.table("cot_time").as[Batch].collect()
    q.stop()
    assert(out.length === 1)
    val b = out.head
    assert(b.key === "BTC" && b.n === 2 && b.flush_reason === "time")
    assert(b.payloads === Seq("p1", "p2"))
  }
}
