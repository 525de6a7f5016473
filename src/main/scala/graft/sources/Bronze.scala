package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TimeUnits

/** Bronze-layer IO — the reference's partitioned object store
  * (SURVEY §2.1 K2/S6/S7/S8/K7, §2.9 T7).
  *
  * - Hive-style `yyyy=/mm=/dd=/hh=` partition layout (`s3_writer.py:216-230`)
  *   becomes `partitionBy` columns: partition pruning is then free — a
  *   time-range predicate touches only matching directories, the 100 TB
  *   replacement for the reference's manual key-prefix listing.
  * - Incremental consumption becomes a high-watermark predicate with a
  *   re-read overlap (`scheduler.py:72-81`) + downstream dedup, instead of
  *   LastModified bookkeeping.
  * - The JSON checkpoint file (`checkpoint.py`) becomes a one-row parquet
  *   watermark table.
  */
object Bronze {

  /** P7: tolerant alias normalization at the bronze boundary — for each
    * target column, coalesce over its known aliases (`qty`|`volume`,
    * `bid_px`|`bid_price`, `feature_builder.py:110,209-212`).
    */
  def normalizeAliases(df: DataFrame, aliases: Map[String, Seq[String]]): DataFrame =
    aliases.foldLeft(df) { case (d, (target, names)) =>
      val present = names.filter(d.columns.contains)
      if (present.isEmpty) d
      else d.withColumn(target, coalesce(present.map(col): _*))
    }

  /** K2: partitioned write with derived calendar partition columns. */
  def writePartitioned(df: DataFrame, tsMs: Column, path: String): Unit = {
    val withParts = TimeUnits.partitionCols(tsMs).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    withParts.write
      .mode("overwrite")
      .partitionBy("yyyy", "mm", "dd", "hh")
      .parquet(path)
  }

  /** S6/T7: incremental read — everything after (watermark - overlap).
    * The predicate lands on the partition columns first (directory pruning)
    * and then on the row timestamp.
    */
  def readIncremental(
      spark: SparkSession,
      path: String,
      tsMsCol: String,
      watermarkMs: Long,
      overlapMs: Long): DataFrame = {
    val cutoff = watermarkMs - overlapMs
    val cutoffDay = TimeUnits.millisToTimestamp(lit(cutoff)).cast("date")
    spark.read
      .parquet(path)
      // partition-level prune (yyyy/mm/dd are strings; compare lexicographically via a derived date)
      .filter(
        to_date(concat_ws("-", col("yyyy"), col("mm"), col("dd"))) >= cutoffDay)
      .filter(col(tsMsCol) > cutoff)
  }

  /** Bucketed table write — pre-shuffles once at write time so every later
    * equi-join/aggregation on the bucket key is exchange-free (the 100 TB
    * answer to "this join shuffles the fact table every day"). Requires the
    * table catalog (`saveAsTable`); bucket counts should match downstream
    * parallelism (SCALE.md).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int,
      sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }

  /** T6: re-anchor — rebuild state offline, then swap atomically
    * (the reference writes `*:new:*` Redis keys and RENAMEs,
    * `ARCHITECTURE.md:191-231`). Here: write the rebuilt state to a fresh
    * versioned directory, then flip a one-row pointer file; readers resolve
    * the pointer first, so they always see a complete version.
    */
  def reAnchor(spark: SparkSession, basePath: String, newState: DataFrame): Long = {
    import spark.implicits._
    val version = loadWatermark(spark, s"$basePath/_current", "version").getOrElse(0L) + 1L
    newState.write.mode("overwrite").parquet(s"$basePath/v$version")
    saveWatermark(spark, s"$basePath/_current", "version", version)
    version
  }

  def readCurrent(spark: SparkSession, basePath: String): Option[DataFrame] =
    loadWatermark(spark, s"$basePath/_current", "version")
      .map(v => spark.read.parquet(s"$basePath/v$v"))

  /** K7: durable watermark (one-row parquet). */
  def saveWatermark(spark: SparkSession, path: String, key: String, valueMs: Long): Unit = {
    import spark.implicits._
    Seq((key, valueMs)).toDF("key", "watermark_ms").write.mode("overwrite").parquet(path)
  }

  def loadWatermark(spark: SparkSession, path: String, key: String): Option[Long] =
    try {
      spark.read.parquet(path).filter(col("key") === key)
        .select("watermark_ms").collect().headOption.map(_.getLong(0))
    } catch { case _: Exception => None }
}
