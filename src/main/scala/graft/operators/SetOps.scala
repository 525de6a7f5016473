package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TimeUnits

/** Set operations — SBE+REST source union with provenance resolution
  * (SURVEY §2.7 U1 / §2.3 J4, `S3_SCHEMA.md:352` `source_mix`) and the
  * anti-join-shaped dedup (U2, `deduplication.py:55-104`).
  */
object SetOps {

  /** U1/J4: union two tagged streams of the same entity and resolve per
    * (symbol, bucket) provenance: 'sbe' | 'rest' | 'mixed'. `unionByName`
    * tolerates asymmetric schemas at the bronze boundary; counting flags in
    * one aggregate avoids a `collect_set` (no per-group array state).
    */
  def sourceMix(
      a: DataFrame,
      b: DataFrame,
      symbol: String,
      tsMs: String,
      bucketMs: Long): DataFrame = {
    val u = a.unionByName(b, allowMissingColumns = true)
    u.groupBy(
        col(symbol).as("symbol"),
        TimeUnits.bucketStartMs(col(tsMs), bucketMs).as("bucket_ms"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("source") === "sbe", 1L).otherwise(0L)).as("n_sbe"),
        sum(when(col("source") === "rest", 1L).otherwise(0L)).as("n_rest"))
      .withColumn(
        "source_mix",
        when(col("n_sbe") > 0 && col("n_rest") > 0, "mixed")
          .when(col("n_sbe") > 0, "sbe")
          .otherwise("rest"))
  }

  /** U2: records in `rows` whose key is absent from `seen` — left anti join,
    * the scalable form of "skip if key already processed". Broadcast when
    * `seen` is small; hash-shuffle otherwise (Catalyst picks via AQE).
    */
  def exceptSeen(rows: DataFrame, seen: DataFrame, keys: Seq[String]): DataFrame =
    rows.join(seen.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** Exact dedup keeping the first row per key in (ts, tiebreak) order —
    * `dropDuplicates` semantics but deterministic (SURVEY §7.5.6: the
    * reference's uniqueness key is (symbol, timestamp, data_type, trade_id)).
    * One shuffle on the key; no sort of the whole relation.
    */
  def dedupFirst(rows: DataFrame, keys: Seq[Column], tsMs: Column, tieBreak: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*)
      .orderBy(tsMs, tieBreak)
    rows.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
