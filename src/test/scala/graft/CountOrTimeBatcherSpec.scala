package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.CountOrTimeBatcher
import graft.streaming.CountOrTimeBatcher.{Batch, Item}

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
    assert(b1.map(_.batch_id).sorted.toSeq === Seq(0L, 1L))
    assert(b1.find(_.batch_id == 0L).get.payloads === Seq("p1", "p2", "p3"))

    // 2 more BTC items join the 1 buffered -> exactly one more full batch
    mem.addData(Item("BTC", 8000L, "p8"), Item("BTC", 9000L, "p9"))
    awaitCount("cot_count", 3)
    val b2 = spark.table("cot_count").as[Batch].collect()
    q.stop()
    assert(b2.length === 3)
    val third = b2.find(_.batch_id == 2L).get
    assert(third.payloads === Seq("p7", "p8", "p9") && third.flush_reason == "count")
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
