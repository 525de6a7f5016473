package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.GapDetector
import graft.streaming.GapDetector.{GapEvent, SeqEvent}

class GapDetectorSpec extends SparkSpec {
  import spark.implicits._

  test("streaming gap detector: state persists across micro-batches, emits gaps and regressions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SeqEvent]
    val q = GapDetector
      .detect(mem.toDS(), tolerance = 1L)
      .writeStream.outputMode("append").format("memory").queryName("gaps").start()

    mem.addData(SeqEvent("BTC", 1, 1000), SeqEvent("BTC", 2, 2000))
    q.processAllAvailable()
    assert(spark.table("gaps").count() === 0) // contiguous

    mem.addData(SeqEvent("BTC", 10, 3000)) // jump of 8 ACROSS batches
    mem.addData(SeqEvent("ETH", 5, 3500)) // first event for key: no gap
    q.processAllAvailable()
    val g1 = spark.table("gaps").as[GapEvent].collect()
    assert(g1.length === 1)
    assert(g1(0).key === "BTC" && g1(0).prev_seq === 2 && g1(0).seq === 10 && g1(0).gap === 8)
    assert(g1(0).kind === "gap")

    mem.addData(SeqEvent("BTC", 4, 4000)) // replayed old id -> regression
    q.processAllAvailable()
    val g2 = spark.table("gaps").as[GapEvent].collect()
    q.stop()
    assert(g2.length === 2)
    val reg = g2.find(_.kind === "regression").get
    assert(reg.prev_seq === 10 && reg.seq === 4)
  }

  test("streaming gap detector: idle keys are evicted once the watermark passes their timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SeqEvent]
    val q = GapDetector
      .detect(mem.toDS(), tolerance = 1L, watermarkDelay = "1 second", idleTimeoutMs = 10000L)
      .writeStream.outputMode("append").format("memory").queryName("gaps_evict").start()

    mem.addData(SeqEvent("BTC", 100, 1000))
    q.processAllAvailable()
    // advance the watermark far beyond BTC's idle timeout (1000 + 10000)
    mem.addData(SeqEvent("ETH", 1, 10000000))
    q.processAllAvailable()
    // one more batch so the timed-out BTC state is actually evicted
    mem.addData(SeqEvent("ETH", 2, 10001000))
    q.processAllAvailable()

    // BTC seq regressed vs its old state (1 < 100) — but the state was
    // evicted, so this is treated as a first-seen key: NO regression event
    mem.addData(SeqEvent("BTC", 1, 10002000))
    q.processAllAvailable()
    val out = spark.table("gaps_evict").as[GapEvent].collect()
    q.stop()
    assert(out.isEmpty, out.mkString(", "))
  }

  test("streaming gap detector: live keys keep state while others are evicted") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SeqEvent]
    val q = GapDetector
      .detect(mem.toDS(), tolerance = 1L, watermarkDelay = "1 second", idleTimeoutMs = 1000000000L)
      .writeStream.outputMode("append").format("memory").queryName("gaps_live").start()
    mem.addData(SeqEvent("BTC", 100, 1000))
    q.processAllAvailable()
    mem.addData(SeqEvent("BTC", 1, 2000)) // regression against live state
    q.processAllAvailable()
    val out = spark.table("gaps_live").as[GapEvent].collect()
    q.stop()
    assert(out.length === 1 && out(0).kind === "regression")
  }

  test("IVF ANN: cell-probed top-k returns same-cell neighbors, subset check vs brute force") {
    import org.apache.spark.sql.functions._
    import graft.operators.VectorOps
    val rnd = new scala.util.Random(21L)
    // two well-separated clusters so IVF cells align with ground truth
    val a = (0 until 30).map(i => (i.toLong, Array.fill(8)(1.0f + rnd.nextFloat() * 0.1f)))
    val b = (0 until 30).map(i => (100L + i, Array.fill(8)(-1.0f - rnd.nextFloat() * 0.1f)))
    val df = (a ++ b).toDF("id", "embedding")
    val topk = VectorOps.annTopKIvf(df, queryIds = Seq(0L, 100L), k = 3, nCells = 2)
    val rows = topk.collect()
    assert(rows.length === 6)
    // query 0 (cluster A) must only see cluster-A neighbors; same for 100
    assert(rows.filter(_.getAs[Long]("query_id") == 0L).forall(_.getAs[Long]("vec_id") < 100L))
    assert(rows.filter(_.getAs[Long]("query_id") == 100L).forall(_.getAs[Long]("vec_id") >= 100L))
    assert(rows.forall(_.getAs[Double]("cos_sim") > 0.9))
  }

  test("SRP multi-probe near-dup: hamming-0 candidates equal the exact-bucket pairs") {
    import org.apache.spark.sql.functions._
    import graft.operators.VectorOps
    val e = Tables.embeddings(spark, sf).select(col("vec_id").as("id"), col("embedding"))
    val exact = VectorOps.nearDupLsh(e, dim = 64, threshold = 0.35, nBits = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = VectorOps.nearDupLshMultiProbe(e, dim = 64, threshold = 0.35, nBits = 8)
    val h0 = multi.filter(col("hamming") === 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(h0 === exact)
    assert(multi.count() >= exact.size) // probing only widens the candidate set
  }

  test("IVF multi-probe recall dominates single-probe per query") {
    import graft.operators.VectorOps
    val rnd = new scala.util.Random(33L)
    val df = (0 until 80)
      .map(i => (i.toLong, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
      .toDF("id", "embedding")
    def topSims(nProbe: Int): Map[Long, Double] =
      VectorOps.annTopKIvf(df, queryIds = Seq(0L, 1L, 2L), k = 3, nCells = 6, nProbe = nProbe)
        .collect()
        .groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Double]("cos_sim")).sum).toMap
    val p1 = topSims(1)
    val p2 = topSims(2)
    // probing more cells only widens the candidate set, so per-query top-k
    // similarity mass cannot decrease
    p1.foreach { case (q, s1) => assert(p2.getOrElse(q, -1e9) >= s1 - 1e-9, s"query $q") }
  }
}
