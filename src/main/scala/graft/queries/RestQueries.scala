package graft.queries

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.sources.JsonlPageServer

/** S3 — the REST paginated backfill, driven end-to-end through the
  * `rest-pages` DataSource V2 against a LIVE local HTTP server (the same
  * live-fixture discipline as the s1 socket-capture queries: the declared
  * query exercises real connector plumbing, not a staged-file stand-in).
  *
  * The fixture serves the `events` table (event_id < 2000, ordered by
  * event_id) as offset-paginated JSONL — the reference's
  * `aggTrades?fromId=X&limit=N` shape (`binance_rest.py:94-199`) — and the
  * query fetches it through parallel page-range partitions, decodes each
  * record with `from_json` (P1's REST-field projection surface), and
  * emits both the transport offset and the decoded id so the oracle's
  * hash check proves page alignment record-by-record, not just row
  * counts. The DuckDB oracle reads the same rows straight from parquet —
  * if pagination skipped, duplicated, or misaligned anything, the hash
  * diverges.
  */
object RestQueries {

  private val RecordSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_ms", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** One JVM-lifetime fixture server per (sf dir, content stamp): the bench
    * loop re-invokes the query builder, so the server and its JSONL
    * snapshot are memoized exactly like the s1 capture fixtures. The server
    * is the shared [[JsonlPageServer]] contract implementation (the same
    * one the connector specs drive, so the query and the tests cannot drift
    * apart); its dispatcher thread is non-daemon, so it is stopped on
    * application end (Spark listener) — otherwise a finished Verify/Bench
    * JVM would hang waiting on it.
    */
  private object Fixture {
    private val cache = scala.collection.concurrent.TrieMap.empty[String, String]
    def url(s: SparkSession, sfDir: String): String = {
      val key = FixtureKey.of(sfDir, "events.parquet")
      cache.getOrElseUpdate(key, {
        // Deterministic JSONL snapshot: one line per event in event_id
        // order; to_json renders doubles with Java's shortest round-trip
        // representation, so from_json on the consumer side reproduces the
        // exact parquet double the oracle compares against.
        val lines: IndexedSeq[String] = Tables.events(s, sfDir)
          .filter(col("event_id") < 2000)
          .select(
            col("event_id"),
            to_json(struct(
              col("event_id"), col("ts_ms"), col("user_id"),
              col("event_type"), col("value"))).as("j"))
          .orderBy("event_id")
          .collect().map(_.getString(1)).toIndexedSeq
        val server = new JsonlPageServer(() => lines, contextPath = "/events")
        s.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit =
            server.stop()
        })
        server.url
      })
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S3 — paginated REST backfill through the rest-pages connector: 8
    // parallel 256-record ranges, 64-record pages (so every range spans
    // multiple fetches and the last one exercises the short-page stop),
    // from_json decode downstream of the transport, offset↔id alignment
    // hash-checked by the oracle.
    "s3_rest_backfill" -> { (s, dir) =>
      s.read.format("rest-pages")
        .option("url", Fixture.url(s, dir))
        .option("pageSize", "64")
        .option("recordsPerPartition", "256")
        .option("maxRecords", "2048")
        .load()
        .select(col("record_offset"), from_json(col("record"), RecordSchema).as("r"))
        .select(
          col("record_offset"),
          col("r.event_id").as("event_id"),
          col("r.ts_ms").as("ts_ms"),
          col("r.user_id").as("user_id"),
          col("r.event_type").as("event_type"),
          col("r.value").as("value"))
    }
  )

  val oracle: Map[String, String] = Map(
    // The fixture serves events in event_id order, so the transport offset
    // IS the event id — emitting both makes the hash prove alignment.
    "s3_rest_backfill" ->
      """SELECT event_id AS record_offset, event_id, epoch_ms(ts) AS ts_ms,
        |  user_id, event_type, value
        |FROM events WHERE event_id < 2000""".stripMargin
  )
}
