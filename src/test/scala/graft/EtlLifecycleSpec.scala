package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, SetOps, Windows}
import graft.sources.Bronze

/** End-to-end batch ETL (SURVEY §3.3): bronze partitioned parquet →
  * incremental discovery → validate/cast/derive → dedup → curated partitioned
  * write → analytics views — the reference's data_connector +
  * Postgres-views path as one declarative pipeline.
  */
class EtlLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("bronze -> curated -> analytics lifecycle with incremental second cycle") {
    val root = Files.createTempDirectory("etl").toString
    val bronzePath = s"$root/bronze"
    val curatedPath = s"$root/curated"
    val wmPath = s"$root/watermark"
    val day0 = 1704067200000L

    // cycle 1: bronze landing with a duplicate trade_id and an invalid row
    val batch1 = Seq(
      ("BTC", day0 + 1000, 100.0, 1.0, 1L),
      ("BTC", day0 + 1000, 100.0, 1.0, 1L), // exact duplicate
      ("BTC", day0 + 2000, -5.0, 1.0, 2L), // invalid price
      ("ETH", day0 + 3000, 10.0, 2.0, 3L)
    ).toDF("symbol", "ts_ms", "price", "qty", "trade_id")
    Bronze.writePartitioned(batch1, col("ts_ms"), bronzePath)

    def runCycle(): Long = {
      val wm = Bronze.loadWatermark(spark, wmPath, "trades").getOrElse(0L)
      val raw = Bronze.readIncremental(spark, bronzePath, "ts_ms", wm, overlapMs = 60000L)
      val validated = raw
        .filter($"price".isNotNull && $"price" > 0 && $"qty" > 0)
        .withColumn("price_dec", expr("try_cast(price AS DECIMAL(20,8))"))
        .withColumn("notional", $"price" * $"qty")
      val dedupedInBatch = SetOps.dedupFirst(
        validated, Seq($"symbol", $"trade_id"), $"ts_ms", $"trade_id")
      // T7: the overlap re-read intentionally re-surfaces already-processed
      // rows; K5/U2 "skip if seen" against the curated layer absorbs them
      val deduped =
        if (new java.io.File(curatedPath).exists()) {
          val seen = spark.read.parquet(curatedPath + "/*").select("symbol", "trade_id")
          SetOps.exceptSeen(dedupedInBatch, seen, Seq("symbol", "trade_id"))
        } else dedupedInBatch
      val curated = Windows.lagFeatures(deduped, $"symbol", $"ts_ms", $"price", $"trade_id")
      // idempotent write per cycle partition + advance watermark
      curated.write.mode("overwrite").parquet(s"$curatedPath/cycle_ts=$wm")
      val newWm = deduped.agg(max($"ts_ms")).as[Long].collect()(0)
      Bronze.saveWatermark(spark, wmPath, "trades", newWm)
      spark.read.parquet(curatedPath + "/*").count()
    }

    assert(runCycle() === 2L) // dup collapsed, invalid dropped

    // cycle 2: new bronze files arrive later (later partition)
    val batch2 = Seq(
      ("BTC", day0 + 90000000L, 110.0, 1.0, 4L),
      ("ETH", day0 + 90001000L, 11.0, 1.0, 5L)
    ).toDF("symbol", "ts_ms", "price", "qty", "trade_id")
    // the landing helper itself: dynamic partition overwrite means this
    // second landing replaces only ITS calendar partitions — batch 1's
    // partitions must survive (regression: static mode truncated the path)
    Bronze.writePartitioned(batch2, $"ts_ms", bronzePath)

    assert(runCycle() === 4L) // only the 2 new rows processed and appended

    // analytics views over the curated layer
    val curated = spark.read.parquet(curatedPath + "/*")
    val latest = Windows.latestPerKey(curated, $"symbol", $"ts_ms", $"trade_id")
    assert(latest.count() === 2)
    assert(
      latest.filter($"symbol" === "BTC").select("price").as[Double].collect()(0) === 110.0)
    val wms = Analytics.watermarks(curated, $"symbol", $"ts_ms")
    assert(wms.filter($"key" === "ETH").select("n_records").as[Long].collect()(0) === 2L)
  }

  test("gap detection triggers the atomic hot-state re-anchor (reliability path composed)") {
    // The reference's reliability path as ONE flow (gap_detector/README.md +
    // re_anchor_service/README.md, ARCHITECTURE.md:191-231): the hot path's
    // KV state was built from a feed that dropped a seq range; the streaming
    // gap detector surfaces it; recovery replays the AUTHORITATIVE bronze
    // into a rebuilt latest-per-key state and atomically re-anchors; readers
    // then resolve the rebuilt version. A gap-free feed re-anchors nothing.
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("reanchor_flow").toString
    val statePath = s"$root/hot_state"
    val day0 = 1704067200000L
    // authoritative bronze: seqs 1..100 for two symbols
    val bronze = (1 to 100).flatMap(i => Seq(
      ("BTC", day0 + i * 1000L, 100.0 + i, i.toLong),
      ("ETH", day0 + i * 1000L, 10.0 + i, i.toLong)))
      .toDF("symbol", "ts_ms", "price", "seq")
    // the hot feed DROPPED seqs 41..60 — its latest-per-key state is built
    // from what arrived, and the drop is invisible to the state itself
    val corruptFeed = bronze.filter(!$"seq".between(41, 60))
    val v1 = Bronze.reAnchor(
      spark, statePath,
      Windows.latestPerKey(corruptFeed, $"symbol", $"ts_ms", $"seq"))
    // streaming gap detection over the same corrupt feed
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.GapDetector.SeqEvent]
    val q = graft.streaming.GapDetector.detect(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("reanchor_gaps")
      .start()
    try {
      mem.addData(corruptFeed.orderBy("seq", "symbol").collect().map(r =>
        graft.streaming.GapDetector.SeqEvent(
          r.getAs[String]("symbol"), r.getAs[Long]("seq"), r.getAs[Long]("ts_ms"))): _*)
      q.processAllAvailable()
      val gaps = spark.table("reanchor_gaps")
        .as[graft.streaming.GapDetector.GapEvent].collect()
      // both symbols report the 41..60 hole exactly once: prev 40 → next 61
      assert(gaps.length === 2)
      assert(gaps.forall(g => g.prev_seq === 40L && g.seq === 61L && g.kind === "gap"))

      // recovery: rebuild from authoritative bronze, atomic pointer swap
      val v2 = Bronze.reAnchor(
        spark, statePath,
        Windows.latestPerKey(bronze, $"symbol", $"ts_ms", $"seq"))
      assert(v2 === v1 + 1)
      val cur = Bronze.readCurrent(spark, statePath).get
      assert(cur.count() === 2)
      assert(cur.filter($"symbol" === "BTC").select("seq").as[Long].head() === 100L)

      // a gap-free continuation produces NO gap events → nothing re-anchors
      val before = spark.table("reanchor_gaps").count()
      mem.addData((101 to 120).flatMap(i => Seq(
        graft.streaming.GapDetector.SeqEvent("BTC", i.toLong, day0 + i * 1000L),
        graft.streaming.GapDetector.SeqEvent("ETH", i.toLong, day0 + i * 1000L))): _*)
      q.processAllAvailable()
      assert(spark.table("reanchor_gaps").count() === before)
      assert(Bronze.readCurrent(spark, statePath).isDefined) // pointer untouched
    } finally q.stop()
  }

  test("rest-pages connector feeds the backfill lifecycle across two cycles") {
    // SURVEY §3.2 composed end-to-end (reference `scheduler.py:62-129`):
    // live REST connector → bronze partitioned landing → watermark advance →
    // overlap re-read → curated dedup — each piece is tested alone
    // (RestPagesSourceSpec, the lifecycle test above); this drives them as
    // ONE pipeline against the live local HTTP fixture, twice, with the
    // second cycle re-reading the overlap band and absorbing it.
    val day0 = 1704067200000L
    def rec(i: Int): String =
      s"""{"symbol":"BTC","ts_ms":${day0 + i * 1000L},"price":${100.0 + i},"qty":1.5,"trade_id":$i}"""
    @volatile var records: Vector[String] = (0 until 120).map(rec).toVector
    val fx = new graft.sources.JsonlPageServer(() => records)
    try {
      val root = Files.createTempDirectory("rest_etl").toString
      val bronzePath = s"$root/bronze"
      val curatedPath = s"$root/curated"
      val wmPath = s"$root/watermark"

      def runCycle(): Long = {
        val wm = Bronze.loadWatermark(spark, wmPath, "rest_trades").getOrElse(0L)
        // connector pull: the REST page scan is the reference's fromId poll;
        // the watermark−overlap predicate is the connector-side incremental
        // filter (re-fetching the overlap band is the at-least-once side of
        // the contract — the curated layer dedups it below)
        val fetched = spark.read.format("rest-pages")
          .option("url", fx.url)
          .option("pageSize", "50")
          .option("recordsPerPartition", "100")
          .option("maxRecords", "100000")
          .load()
          .select(
            get_json_object($"record", "$.symbol").as("symbol"),
            get_json_object($"record", "$.ts_ms").cast("long").as("ts_ms"),
            get_json_object($"record", "$.price").cast("double").as("price"),
            get_json_object($"record", "$.qty").cast("double").as("qty"),
            get_json_object($"record", "$.trade_id").cast("long").as("trade_id"))
          .filter($"ts_ms" > wm - 60000L)
        // bronze landing (hive yyyy/mm/dd/hh partitions, dynamic overwrite)
        Bronze.writePartitioned(fetched, $"ts_ms", bronzePath)
        // batch ETL: incremental bronze read from the same watermark, dedup
        // against the curated layer (T7 overlap absorb), append, advance
        val raw = Bronze.readIncremental(spark, bronzePath, "ts_ms", wm, overlapMs = 60000L)
        val inBatch = SetOps.dedupFirst(raw, Seq($"symbol", $"trade_id"), $"ts_ms", $"trade_id")
        val fresh =
          if (new java.io.File(curatedPath).exists()) {
            val seen = spark.read.parquet(curatedPath + "/*").select("symbol", "trade_id")
            SetOps.exceptSeen(inBatch, seen, Seq("symbol", "trade_id"))
          } else inBatch
        fresh.write.mode("overwrite").parquet(s"$curatedPath/cycle_ts=$wm")
        val newWm = fresh.agg(max($"ts_ms")).collect()(0).getLong(0)
        Bronze.saveWatermark(spark, wmPath, "rest_trades", newWm)
        spark.read.parquet(curatedPath + "/*").count()
      }

      assert(runCycle() === 120L)
      assert(Bronze.loadWatermark(spark, wmPath, "rest_trades").contains(day0 + 119000L))

      // cycle 2: 40 new records appear at the live endpoint; the connector
      // re-fetches the 60 s overlap band (60 old rows) + the 40 new ones,
      // and the curated layer must end at exactly 160 — overlap absorbed,
      // nothing skipped
      records = records ++ (120 until 160).map(rec)
      assert(runCycle() === 160L)
      assert(Bronze.loadWatermark(spark, wmPath, "rest_trades").contains(day0 + 159000L))
      val curated = spark.read.parquet(curatedPath + "/*")
      assert(curated.select("trade_id").distinct.count() === 160L)
      // the second cycle landed rows ONLY in its own cycle partition
      assert(
        spark.read.parquet(s"$curatedPath/cycle_ts=${day0 + 119000L}")
          .agg(min($"trade_id")).collect()(0).getLong(0) === 120L)
    } finally fx.close()
  }
}
