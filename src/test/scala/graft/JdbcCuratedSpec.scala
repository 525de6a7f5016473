package graft

import org.apache.spark.sql.functions._

/** K5 — the curated JDBC sink's duplicate-skip contract against a REAL
  * database (embedded Derby, shipped with the Spark distribution): the
  * reference's writer treats a unique-violation as "skip and continue"
  * (`db_writer.py:187-225`); here the same observable semantics come from an
  * anti-join + one distributed append.
  */
class JdbcCuratedSpec extends SparkSpec {

  private lazy val dbRoot = {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby")
    // Derby writes derby.log into the CWD unless told otherwise — keep the
    // repo clean.
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    dir
  }
  private def freshUrl(name: String): String =
    s"jdbc:derby:$dbRoot/$name;create=true"

  private def curatedBatch(ids: Range) = {
    import spark.implicits._
    ids.map { i =>
      ("BTCUSDT", 1700000000000L + i * 1000L, BigDecimal(50000) + BigDecimal(i) / 100,
        BigDecimal(i % 7 + 1), i.toLong, "rest", "trade")
    }.toDF("symbol", "timestamp", "price", "volume", "trade_id", "source", "data_type")
      .select(
        col("symbol"), col("timestamp"),
        col("price").cast("decimal(20,8)").as("price"),
        col("volume").cast("decimal(20,8)").as("volume"),
        col("trade_id"), col("source"), col("data_type"))
  }
  private val keys = Seq("symbol", "timestamp", "data_type")

  test("first write creates the table and inserts every row") {
    val url = freshUrl("first")
    val n = graft.sources.JdbcCurated.writeDedup(curatedBatch(0 until 100), url, "market_data", keys)
    assert(n === 100)
    val back = spark.read.jdbc(url, "market_data", new java.util.Properties())
    assert(back.count() === 100)
    // decimal fidelity through the dialect round-trip (DECIMAL(20,8) column)
    val p = back.filter(col("trade_id") === 42).select("price").head.getDecimal(0)
    assert(p.compareTo(new java.math.BigDecimal("50000.42")) === 0)
  }

  test("re-delivering the same batch inserts zero rows (idempotent re-run)") {
    val url = freshUrl("rerun")
    val batch = curatedBatch(0 until 80)
    assert(graft.sources.JdbcCurated.writeDedup(batch, url, "market_data", keys) === 80)
    assert(graft.sources.JdbcCurated.writeDedup(batch, url, "market_data", keys) === 0)
    assert(
      spark.read.jdbc(url, "market_data", new java.util.Properties()).count() === 80)
  }

  test("an overlapping batch inserts only its new keys") {
    val url = freshUrl("overlap")
    assert(graft.sources.JdbcCurated.writeDedup(curatedBatch(0 until 60), url, "market_data", keys) === 60)
    // 40 old keys + 40 new keys
    assert(graft.sources.JdbcCurated.writeDedup(curatedBatch(20 until 100), url, "market_data", keys) === 40)
    val back = spark.read.jdbc(url, "market_data", new java.util.Properties())
    assert(back.count() === 100)
    assert(back.select("timestamp").distinct.count() === 100)
  }

  test("the unique key index bounces writes that bypass the dedup path") {
    // the anti-join cannot see a RETRIED task's already-committed inserts
    // (or a concurrent writer); the key index is that line of defense —
    // duplicates bounce loudly instead of corrupting the table silently
    val url = freshUrl("constraint")
    assert(graft.sources.JdbcCurated.writeDedup(curatedBatch(0 until 20), url, "market_data", keys) === 20)
    val e = intercept[Exception] {
      curatedBatch(5 until 6).write.mode("append")
        .jdbc(url, "market_data", new java.util.Properties())
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.toLowerCase.contains("duplicate key")), msgs(e).mkString(" | "))
    // the table is uncorrupted and the idempotent path still converges
    assert(graft.sources.JdbcCurated.writeDedup(curatedBatch(0 until 25), url, "market_data", keys) === 5)
    assert(spark.read.jdbc(url, "market_data", new java.util.Properties()).count() === 25)
  }

  test("foreachBatch streaming sink into Derby is idempotent under replay") {
    // K1+K5+T4 composed: micro-batches land through the same dup-skip path,
    // so an at-least-once REPLAY of a whole micro-batch (the failure mode
    // foreachBatch actually has) inserts zero rows — exactly-once results
    // from a real database without two-phase commit.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val url = freshUrl("streaming")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    val q = mem.toDS().toDF("trade_id", "price")
      .select(
        lit("BTCUSDT").as("symbol"),
        (lit(1700000000000L) + col("trade_id") * 1000L).as("timestamp"),
        col("price").cast("decimal(20,8)").as("price"),
        lit(java.math.BigDecimal.ONE).cast("decimal(20,8)").as("volume"),
        col("trade_id"), lit("ws").as("source"), lit("trade").as("data_type"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.sources.JdbcCurated.writeDedup(batch, url, "market_data", keys): Unit
      }
      .start()
    try {
      mem.addData((0L until 30L).map(i => (i, 100.0 + i)): _*)
      q.processAllAvailable()
      // replay: the SAME records delivered again in a later micro-batch
      mem.addData((0L until 30L).map(i => (i, 100.0 + i)): _*)
      // plus genuinely new ones interleaved
      mem.addData((30L until 40L).map(i => (i, 100.0 + i)): _*)
      q.processAllAvailable()
      val back = spark.read.jdbc(url, "market_data", new java.util.Properties())
      assert(back.count() === 40)
      assert(back.select("trade_id").distinct.count() === 40)
    } finally q.stop()
  }

  test("within-batch duplicates compose with SetOps.dedupFirst (first wins)") {
    val url = freshUrl("withinbatch")
    // the same key delivered twice in one batch — arrival order encoded in
    // trade_id; the reference's constraint keeps the FIRST insert
    val dup = curatedBatch(0 until 10)
      .union(curatedBatch(0 until 10).withColumn("trade_id", col("trade_id") + 1000))
    val deduped = graft.operators.SetOps.dedupFirst(
      dup, keys = keys.map(col), tsMs = col("timestamp"), tieBreak = col("trade_id"))
    assert(graft.sources.JdbcCurated.writeDedup(deduped, url, "market_data", keys) === 10)
    val back = spark.read.jdbc(url, "market_data", new java.util.Properties())
    assert(back.count() === 10)
    // first-arrival won: every surviving trade_id is from the original batch
    assert(back.filter(col("trade_id") >= 1000).count() === 0)
  }
}
