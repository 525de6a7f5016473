package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming sessionization — the built-in `session_window` as the
  * streaming twin of w7's batch gaps-and-islands (T5's session flavor):
  * sessions close when the watermark passes their gap, each emitted exactly
  * once in append mode, and the closed sessions agree with the batch
  * operator on the same data.
  */
class StreamingSessionSpec extends SparkSpec {
  import spark.implicits._

  test("session_window closes sessions at the gap and matches the batch islands") {
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 60000L // 1-minute inactivity gap
    val base = 1704067200000L
    // user u1: two sessions (burst, 5-min silence, burst); u2: one session
    val events = Seq(
      ("u1", base + 0L, 10.0), ("u1", base + 10000L, 11.0), ("u1", base + 30000L, 12.0),
      ("u1", base + 330000L, 13.0), ("u1", base + 340000L, 14.0),
      ("u2", base + 5000L, 20.0), ("u2", base + 50000L, 21.0))
    val mem = MemoryStream[(String, Long, Double)]
    val q = mem.toDS().toDF("user_id", "ts_ms", "price")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "10 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "1 minute").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("price").cast("decimal(27,8)")).cast("double").as("total_value"))
      .select(
        col("user_id"), unix_millis(col("w.start")).as("start_ms"),
        col("n_events"), col("total_value"))
      .writeStream.outputMode("append").format("memory").queryName("sessions")
      .start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      // push the watermark far past every session's gap so all finalize
      mem.addData(("wm", base + 10000000L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sessions")
        .filter(col("user_id") =!= "wm")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      // batch twin on the same rows: w7's island operator, gap = 1 minute
      val batch = graft.operators.Sessionize.sessions(
        events.toDF("user_id", "ts_ms", "price"),
        key = col("user_id"), tsMs = col("ts_ms"), tieBreak = col("ts_ms"),
        value = col("price"), gapMs = gapMs)
        .collect()
        .map(r => (r.getAs[String]("key"),
          r.getAs[Long]("session_start"), // session_window starts AT the first event
          r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
        .toSet
      assert(streamed.size === 3) // u1 x2 + u2 x1
      assert(streamed.map(s => (s._1, s._3, s._4)) === batch.map(b => (b._1, b._3, b._4)))
      // and the session starts line up with the batch islands' first events
      assert(streamed.map(s => (s._1, s._2)) === batch.map(b => (b._1, b._2)))
    } finally q.stop()
  }
}
