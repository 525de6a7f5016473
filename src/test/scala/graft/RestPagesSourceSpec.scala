package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.sources.{RestPagesOffset, RestPagesSource}

/** The `rest-pages` source against a live local HTTP server: offset
  * pagination, parallel range fetches with early stop, retry/backoff on
  * 5xx, fail-fast on 4xx, and the streaming cursor tail — the engine-side
  * contract of the reference's REST backfill client (retry + rate limiting
  * + fromId pagination).
  */
class RestPagesSourceSpec extends SparkSpec {
  import spark.implicits._

  /** Serves `records` as JSONL pages under /data?offset=X&limit=N. */
  private final class Fixture(initial: Seq[String]) extends AutoCloseable {
    @volatile var records: Vector[String] = initial.toVector
    val requests = new AtomicLong(0)
    val failNext = new AtomicInteger(0) // next N requests answer 503
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data", (ex: HttpExchange) => {
      requests.incrementAndGet()
      if (failNext.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        ex.sendResponseHeaders(503, -1); ex.close()
      } else {
        val params = Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
          .filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2); k -> v
          }.toMap
        val off = params.getOrElse("offset", "0").toInt
        val lim = params.getOrElse("limit", "1000").toInt
        val slice = records.slice(off, math.min(off.toLong + lim, records.length.toLong).toInt)
        val body = slice.mkString("\n").getBytes(UTF_8)
        ex.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length.toLong)
        if (body.nonEmpty) ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/data"
    override def close(): Unit = server.stop(0)
  }

  private def recs(n: Int, from: Int = 0): Seq[String] =
    (from until from + n).map(i => s"""{"i":$i}""")

  test("batch: parallel range fetches reassemble the full sequence with offsets") {
    val fx = new Fixture(recs(2500))
    try {
      val df = spark.read.format("rest-pages")
        .option("url", fx.url)
        .option("pageSize", "100")
        .option("recordsPerPartition", "1000")
        .option("maxRecords", "100000")
        .load()
      val rows = df.select(col("record_offset"),
          get_json_object(col("record"), "$.i").cast("long").as("i"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(rows.length === 2500)
      assert(rows.head === ((0L, 0L)) && rows.last === ((2499L, 2499L)))
      // every record's offset equals its payload index — no page misaligned
      assert(rows.forall { case (o, i) => o == i })
      // ranges past the end of data cost one probe each, not a page walk:
      // 100 partitions planned (100000/1000), 3 carry data (25 pages + a
      // short one), 97 probe once
      assert(fx.requests.get() <= 140, s"request count exploded: ${fx.requests.get()}")
    } finally fx.close()
  }

  test("retry with backoff rides out transient 5xx; fail-fast without retries") {
    val fx = new Fixture(recs(50))
    try {
      fx.failNext.set(2)
      val n = spark.read.format("rest-pages")
        .option("url", fx.url)
        .option("pageSize", "100")
        .option("recordsPerPartition", "100000")
        .option("maxRecords", "100000")
        .option("retryBackoffMs", "10")
        .load().count()
      assert(n === 50)
      fx.failNext.set(2)
      val e = intercept[org.apache.spark.SparkException] {
        spark.read.format("rest-pages")
          .option("url", fx.url)
          .option("pageSize", "100")
          .option("recordsPerPartition", "100000")
          .option("maxRecords", "100000")
          .option("retries", "0")
          .load().count()
      }
      assert(e.getMessage.contains("HTTP 503") || e.getCause != null)
    } finally fx.close()
  }

  test("a non-retryable 4xx fails immediately (bad requests do not heal)") {
    val fx = new Fixture(recs(10))
    try {
      val before = fx.requests.get()
      val e = intercept[org.apache.spark.SparkException] {
        spark.read.format("rest-pages")
          .option("url", fx.url.replace("/data", "/missing"))
          .option("recordsPerPartition", "100000")
          .option("maxRecords", "1000")
          .load().count()
      }
      assert(e.getMessage.contains("HTTP 404") ||
        Option(e.getCause).exists(_.getMessage.contains("HTTP 404")))
      assert(fx.requests.get() === before) // /missing never reached /data's counter
    } finally fx.close()
  }

  test("streaming: cursor tail picks up appended records exactly once") {
    val fx = new Fixture(recs(250))
    try {
      val q = spark.readStream.format("rest-pages")
        .option("url", fx.url)
        .option("pageSize", "100")
        .option("recordsPerPartition", "100")
        .load()
        .select(get_json_object(col("record"), "$.i").cast("long").as("i"))
        .writeStream.outputMode("append").format("memory").queryName("rest_tail")
        .start()
      try {
        q.processAllAvailable()
        assert(spark.table("rest_tail").count() === 250)
        fx.records = fx.records ++ recs(100, from = 250) // upstream appends
        q.processAllAvailable()
        val ids = spark.table("rest_tail").collect().map(_.getLong(0)).sorted
        assert(ids.length === 350)
        assert(ids.toSeq === (0L until 350L)) // no skips, no duplicates
      } finally q.stop()
    } finally fx.close()
  }

  test("maxRecordsPerTrigger bounds each micro-batch (catch-up = N batches)") {
    val fx = new Fixture(recs(500))
    try {
      val q = spark.readStream.format("rest-pages")
        .option("url", fx.url)
        .option("pageSize", "100")
        .option("maxRecordsPerTrigger", "200")
        .load()
        .writeStream.outputMode("append").format("memory").queryName("rest_bounded")
        .start()
      try {
        q.processAllAvailable()
        assert(spark.table("rest_bounded").count() === 500)
        val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
        assert(nonEmpty >= 3, s"expected >=3 bounded batches, saw $nonEmpty")
      } finally q.stop()
    } finally fx.close()
  }

  test("an unrecognized checkpoint offset fails the restart loudly") {
    val fx = new Fixture(recs(10))
    try {
      val table = new graft.sources.RestPagesTable(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of("url", fx.url)))
      val stream = table
        .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
        .build().toMicroBatchStream("/tmp/unused")
      assert(stream.deserializeOffset("""{"next":42}""") === RestPagesOffset(42L))
      intercept[IllegalArgumentException](stream.deserializeOffset("""{"files":3}"""))
    } finally fx.close()
  }

  test("per-task politeness interval spaces requests") {
    val fx = new Fixture(recs(300))
    try {
      val t0 = System.currentTimeMillis()
      val n = spark.read.format("rest-pages")
        .option("url", fx.url)
        .option("pageSize", "100")
        .option("recordsPerPartition", "100000")
        .option("maxRecords", "1000")
        .option("minRequestIntervalMs", "50")
        .load().count()
      assert(n === 300)
      // 4 fetches (3 full pages + the short tail) with >=50ms between
      // successive requests from the single range task
      assert(System.currentTimeMillis() - t0 >= 150,
        "interval not enforced between page fetches")
    } finally fx.close()
  }
}
