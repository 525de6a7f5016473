package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Single normalization point for the reference's "timestamp unit chaos"
  * (SURVEY §7.5.7: µs on the SBE wire, ms on Kinesis/Avro/Postgres, s for
  * feature_ts). Everything in the engine runs on epoch **milliseconds** as
  * BIGINT; convert exactly once at the boundary.
  *
  * The session timezone is pinned to UTC, so NTZ and LTZ timestamps coincide
  * and `asMillis` is safe on either (parquet files commonly surface as
  * TIMESTAMP_NTZ in Spark 4).
  */
object TimeUnits {

  /** Epoch milliseconds from any timestamp flavor (floor, like the reference's
    * µs→ms conversion at `sbe_decoder.cpp:134-136`).
    */
  def asMillis(ts: Column): Column = unix_millis(ts.cast("timestamp"))

  def microsToMillis(us: Column): Column = floor(us / 1000L).cast("long")
  def secondsToMillis(s: Column): Column = (s * 1000L).cast("long")
  def millisToTimestamp(ms: Column): Column = timestamp_millis(ms.cast("long"))

  /** Tumbling-bucket index, computed exactly in integer arithmetic.
    * (`floor(ts / width)` via double division can round across a bucket
    * boundary once quotients get large; `(ts - ts % width) / width` divides
    * an exact multiple, which doubles represent exactly below 2^53.)
    */
  def bucketIndex(tsMs: Column, widthMs: Long): Column =
    ((tsMs.cast("long") - pmod(tsMs.cast("long"), lit(widthMs))) / widthMs).cast("long")

  /** Tumbling-bucket start for a given window width, on the ms axis. */
  def bucketStartMs(tsMs: Column, widthMs: Long): Column =
    tsMs.cast("long") - pmod(tsMs.cast("long"), lit(widthMs))

  /** Hive-style partition columns from epoch ms — the reference's
    * `bronze/{sym}/{type}/yyyy=/mm=/dd=/hh=` key layout
    * (`s3_writer.py:216-230`, SURVEY §2.1 K2/S8).
    */
  def partitionCols(tsMs: Column): Seq[(String, Column)] = {
    val t = millisToTimestamp(tsMs)
    Seq(
      "yyyy" -> date_format(t, "yyyy"),
      "mm" -> date_format(t, "MM"),
      "dd" -> date_format(t, "dd"),
      "hh" -> date_format(t, "HH"))
  }
}
