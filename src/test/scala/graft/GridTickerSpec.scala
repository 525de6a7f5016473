package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.GridTicker
import graft.streaming.GridTicker.{Obs, Tick}

/** The streaming fixed-cadence LOCF ticker (the reference's every-2 s
  * feature emission): ticks are watermark-finalized, quiet keys keep
  * ticking off other keys' watermark progress, and values carry forward
  * through gaps.
  */
class GridTickerSpec extends SparkSpec {
  import spark.implicits._

  test("ticks drain on watermark advance with LOCF through quiet periods") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Obs]
    val q = GridTicker.ticks(mem.toDS(), stepMs = 2000L, watermarkDelay = "10 seconds")
      .writeStream.outputMode("append").format("memory").queryName("ticks").start()
    def collected(): Seq[Tick] =
      spark.table("ticks").as[Tick].collect().toSeq.sortBy(t => (t.symbol, t.grid_ts))
    try {
      // two observations for A; watermark still at 0 → nothing finalized
      mem.addData(Obs("A", 1000L, 10.0), Obs("A", 3500L, 11.0))
      q.processAllAvailable()
      assert(collected().isEmpty)

      // B's traffic pushes the GLOBAL watermark to 40000; the next trigger
      // fires A's event-time timeout with no A input at all — the quiet-key
      // drain is the point of the op
      mem.addData(Obs("B", 50000L, 1.0))
      q.processAllAvailable()
      mem.addData(Obs("B", 50001L, 1.0))
      q.processAllAvailable()
      val a = collected().filter(_.symbol == "A")
      // anchor 1000, step 2000, finalized through wm=40000 → 1000..39000
      assert(a.map(_.grid_ts) === (1000L to 39000L by 2000L))
      assert(a.head === Tick("A", 1000L, 10.0, fresh = true)) // obs 1000 backs it
      assert(a(1) === Tick("A", 3000L, 10.0, fresh = false)) // pure carry
      assert(a(2) === Tick("A", 5000L, 11.0, fresh = true)) // obs 3500 lands here
      // everything after is the 11.0 carry
      assert(a.drop(3).forall(t => t.price === 11.0 && !t.fresh))

      // a late-but-admissible observation updates the NEXT finalized ticks
      mem.addData(Obs("A", 41000L, 12.0))
      q.processAllAvailable()
      mem.addData(Obs("B", 60000L, 1.0))
      q.processAllAvailable()
      mem.addData(Obs("B", 60001L, 1.0))
      q.processAllAvailable()
      val a2 = collected().filter(_.symbol == "A")
      // wm now 50000 → grids through 49000; 41000 applies at its own tick
      assert(a2.map(_.grid_ts) === (1000L to 49000L by 2000L))
      assert(a2.find(_.grid_ts == 41000L).get === Tick("A", 41000L, 12.0, fresh = true))
      assert(a2.filter(_.grid_ts > 41000L).forall(t => t.price === 12.0 && !t.fresh))
    } finally q.stop()
  }
}
