package graft

import org.apache.spark.sql.functions._

import graft.sources.{JsonlPageServer, RestPagesOffset, RestPagesSource}

/** The `rest-pages` source against a live local HTTP server (the shared
  * [[JsonlPageServer]] contract implementation): offset pagination with a
  * plan-time frontier pin, parallel range fetches, retry/backoff on 5xx,
  * fail-fast on 4xx, and the streaming cursor tail — the engine-side
  * contract of the reference's REST backfill client (retry + rate limiting
  * + fromId pagination).
  */
class RestPagesSourceSpec extends SparkSpec {
  import spark.implicits._

  private def recs(n: Int, from: Int = 0): IndexedSeq[String] =
    (from until from + n).map(i => s"""{"i":$i}""")

  /** All messages down an exception's cause chain (Spark wraps task
    * failures in several layers).
    */
  private def causeMessages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ causeMessages(t.getCause)

  private def fixture(initial: IndexedSeq[String]): (JsonlPageServer, () => Vector[String], Vector[String] => Unit) = {
    @volatile var records: Vector[String] = initial.toVector
    val server = new JsonlPageServer(() => records)
    (server, () => records, v => records = v)
  }

  test("batch: parallel range fetches reassemble the full sequence with offsets") {
    val (fx, _, _) = fixture(recs(2500))
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
      // plan-time frontier pin: ~2·log2(2500) one-record probes find the
      // end, then 3 partitions fetch exactly 25 full pages + 1 short one —
      // nothing walks the record bound
      assert(fx.requests.get() <= 60, s"request count exploded: ${fx.requests.get()}")
    } finally fx.close()
  }

  test("frontier probe pins exact boundaries at awkward sizes") {
    for (n <- Seq(0, 1, 63, 64, 65, 640)) {
      val (fx, _, _) = fixture(recs(n))
      try {
        val cnt = spark.read.format("rest-pages")
          .option("url", fx.url)
          .option("pageSize", "64")
          .option("recordsPerPartition", "64")
          .option("maxRecords", "100000")
          .load().count()
        assert(cnt === n, s"size $n read $cnt")
      } finally fx.close()
    }
  }

  test("retry with backoff rides out transient 5xx; fail-fast without retries") {
    val (fx, _, _) = fixture(recs(50))
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
      val e = intercept[Exception] {
        spark.read.format("rest-pages")
          .option("url", fx.url)
          .option("pageSize", "100")
          .option("recordsPerPartition", "100000")
          .option("maxRecords", "100000")
          .option("retries", "0")
          .load().count()
      }
      assert(causeMessages(e).exists(_.contains("HTTP 503")), causeMessages(e).mkString("; "))
    } finally fx.close()
  }

  test("a non-retryable 4xx fails immediately (bad requests do not heal)") {
    val (fx, _, _) = fixture(recs(10))
    try {
      val before = fx.requests.get()
      val e = intercept[Exception] {
        spark.read.format("rest-pages")
          .option("url", fx.url.replace("/data", "/missing"))
          .option("recordsPerPartition", "100000")
          .option("maxRecords", "1000")
          .load().count()
      }
      assert(causeMessages(e).exists(_.contains("HTTP 404")), causeMessages(e).mkString("; "))
      assert(fx.requests.get() === before) // /missing never reached /data's counter
    } finally fx.close()
  }

  test("streaming: cursor tail picks up appended records exactly once") {
    val (fx, get, set) = fixture(recs(250))
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
        set(get() ++ recs(100, from = 250)) // upstream appends
        q.processAllAvailable()
        val ids = spark.table("rest_tail").collect().map(_.getLong(0)).sorted
        assert(ids.length === 350)
        assert(ids.toSeq === (0L until 350L)) // no skips, no duplicates
      } finally q.stop()
    } finally fx.close()
  }

  test("maxRecordsPerTrigger bounds each micro-batch (catch-up = N batches)") {
    val (fx, _, _) = fixture(recs(500))
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

  test("checkpointed restart resumes from the cursor — no duplicates, no skips") {
    val (fx, get, set) = fixture(recs(150))
    val ckpt = java.nio.file.Files.createTempDirectory("rest_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("rest_ckpt_out").toString
    def run(): Unit = {
      val q = spark.readStream.format("rest-pages")
        .option("url", fx.url)
        .option("pageSize", "64")
        .load()
        .select(get_json_object(col("record"), "$.i").cast("long").as("i"))
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      run()
      assert(spark.read.parquet(out).count() === 150)
      set(get() ++ recs(70, from = 150)) // appended while the query is DOWN
      run() // restart against the same checkpoint
      val ids = spark.read.parquet(out).select("i").as[Long].collect().sorted
      assert(ids.toSeq === (0L until 220L), "restart duplicated or skipped records")
    } finally fx.close()
  }

  test("an unrecognized checkpoint offset fails the restart loudly") {
    val (fx, _, _) = fixture(recs(10))
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
    val (fx, _, _) = fixture(recs(300))
    try {
      val t0 = System.currentTimeMillis()
      val n = spark.read.format("rest-pages")
        .option("url", fx.url)
        .option("pageSize", "100")
        .option("recordsPerPartition", "100000")
        .option("maxRecords", "1000")
        .option("minRequestIntervalMs", "20")
        .load().count()
      assert(n === 300)
      // 3 data pages from the single range task with >=20ms between its
      // successive requests (plus throttled frontier probes before them)
      assert(System.currentTimeMillis() - t0 >= 60,
        "interval not enforced between page fetches")
    } finally fx.close()
  }

  test("the DEFAULT record cap refuses silent truncation; an explicit bound truncates as asked") {
    // a virtual sequence longer than the default 2^20 cap — O(1) memory
    val n = (1 << 20) + 5
    val virtual: IndexedSeq[String] = new scala.collection.immutable.IndexedSeq[String] {
      def length: Int = n
      def apply(i: Int): String = s"""{"i":$i}"""
    }
    val fx = new JsonlPageServer(() => virtual)
    try {
      val e = intercept[Exception] {
        spark.read.format("rest-pages").option("url", fx.url)
          .option("pageSize", "4096").option("recordsPerPartition", "1000000")
          .load().count()
      }
      assert(causeMessages(e).exists(_.contains("maxRecords")), causeMessages(e).mkString("; "))
      // explicit maxRecords = LIMIT semantics: truncation is a stated choice
      val cnt = spark.read.format("rest-pages").option("url", fx.url)
        .option("pageSize", "4096").option("recordsPerPartition", "1000000")
        .option("maxRecords", "1000").load().count()
      assert(cnt === 1000)
    } finally fx.close()
  }

  test("zero or negative bounds are rejected at scan construction") {
    val (fx, _, _) = fixture(recs(5))
    try {
      def table(opts: java.util.Map[String, String]) =
        new graft.sources.RestPagesTable(
          new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts))
      intercept[IllegalArgumentException](
        table(java.util.Map.of("url", fx.url, "maxRecords", "0"))
          .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()))
      // a zero trigger cap would make every trigger a no-op: stream stalls forever
      intercept[IllegalArgumentException](
        table(java.util.Map.of("url", fx.url, "maxRecordsPerTrigger", "0"))
          .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()))
    } finally fx.close()
  }

  test("frontier: direct unit check at exact and off-by-one ends") {
    val (fx, _, _) = fixture(recs(129))
    try {
      val cfg = RestPagesSource.config(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of("url", fx.url)))
      assert(RestPagesSource.frontier(cfg, 0L, 1000000L) === 129L)
      assert(RestPagesSource.frontier(cfg, 129L, 1000000L) === 129L) // at the end
      assert(RestPagesSource.frontier(cfg, 0L, 100L) === 100L) // bound clamps
      assert(RestPagesSource.frontier(cfg, 64L, 1000000L) === 129L) // mid-start
    } finally fx.close()
  }
}
