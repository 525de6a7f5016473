package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the per-column data-quality summary (row count, null
  * count, distinct cardinality, range, moments, string lengths) an ingest
  * pipeline runs over every new partition before it is admitted to training
  * (the reference's validation layer stops at per-row required-field checks,
  * `transformer.py:71-76`; this is its dataset-level complement).
  *
  * Scale design: the input is unpivoted into (col_name, value) entries — one
  * `explode` of a k-element struct array per row — and aggregated
  * `groupBy(col_name)`. That keeps the whole computation a single shuffle
  * keyed by column name (k groups, two-phase distinct underneath), instead
  * of either k separate scans or one global scalar aggregate funneling into
  * a single partition. Row amplification is ×k but each exploded entry is a
  * name tag plus one value — at 100 TB the scan still dominates and the
  * shuffle carries only partial aggregates per (col_name, value).
  *
  * Distinct counts are EXACT (count-distinct over the exploded layout) so
  * the result is oracle-checkable; at deployment scale swap in
  * `approxDistinct = true` (HyperLogLog++, no distinct sub-shuffle) — same
  * plan shape minus the distinct expansion, the standard trade the x_a12
  * sketch family documents.
  */
object Profile {

  /** One output row per profiled column:
    * `col_name, n_rows, n_present, n_distinct` for every column;
    * `min_num, max_num, mean, std` for numeric columns (null on string
    * rows); `min_str, max_str, avg_len` for string columns (null on numeric
    * rows). Numeric mean comes from an exact DECIMAL(27,8) sum so it is
    * evaluation-order independent; std is stddev_samp rounded to 4 (the
    * repo-wide cross-engine contract for variance-family floats).
    */
  def columns(
      df: DataFrame,
      numericCols: Seq[String],
      stringCols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(
      numericCols.nonEmpty || stringCols.nonEmpty,
      "at least one column to profile")
    val overlap = numericCols.toSet.intersect(stringCols.toSet)
    require(overlap.isEmpty, s"columns listed as both numeric and string: $overlap")
    val entries =
      numericCols.map(c =>
        struct(
          lit(c).as("col_name"),
          col(c).cast("double").as("xd"),
          lit(null).cast("string").as("xs"))) ++
        stringCols.map(c =>
          struct(
            lit(c).as("col_name"),
            lit(null).cast("double").as("xd"),
            col(c).as("xs")))
    // Per column exactly one of xd/xs is ever non-null, so the two typed
    // distinct counts never both contribute — their sum is THE column's
    // cardinality with no cross-type string formatting involved.
    val distinctCount =
      if (approxDistinct)
        (approx_count_distinct(col("xd")) + approx_count_distinct(col("xs"))).as("n_distinct")
      else
        (countDistinct(col("xd")) + countDistinct(col("xs"))).as("n_distinct")
    df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_name"), col("e.xd"), col("e.xs"))
      .groupBy("col_name")
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("xd").isNotNull || col("xs").isNotNull, 1)).as("n_present"),
        distinctCount,
        min(col("xd")).as("min_num"),
        max(col("xd")).as("max_num"),
        (sum(col("xd").cast("decimal(27,8)")).cast("double") /
          when(count(col("xd")) > 0, count(col("xd")))).as("__mean_raw"),
        round(stddev_samp(col("xd")), 4).as("std"),
        min(col("xs")).as("min_str"),
        max(col("xs")).as("max_str"),
        (sum(length(col("xs")).cast("long")).cast("double") /
          when(count(col("xs")) > 0, count(col("xs")))).as("__avg_len_raw"))
      .withColumn("mean", round(col("__mean_raw"), 6))
      .withColumn("avg_len", round(col("__avg_len_raw"), 6))
      .select(
        "col_name", "n_rows", "n_present", "n_distinct", "min_num", "max_num",
        "mean", "std", "min_str", "max_str", "avg_len")
  }
}
