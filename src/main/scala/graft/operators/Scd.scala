package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history assembly — turns a per-key
  * change stream into validity intervals `[valid_from, valid_to)` with an
  * `is_current` flag. The reference's RDS upsert path (`db_writer.py`,
  * `RDS_SCHEMA.md:703-756` as-of outcome updates) keeps only the latest row
  * per key; SCD2 is the lakehouse-native generalization that keeps the full
  * history queryable — the shape warehouse loads use for dimension tables at
  * scale.
  *
  * No-op compression (classic SCD2): change-stream rows whose attribute
  * tuple equals their predecessor's open no new interval — they're dropped
  * BEFORE the lead pass, so consecutive identical states collapse into one
  * `[first_seen, next_change)` interval instead of one interval per source
  * row. The compare is a null-safe `<=>` on the attr struct (a lag over the
  * same window), so the whole operator is still one shuffle on the key with
  * one local sort — the filter sits between two window passes that share
  * partitioning AND ordering, so Catalyst plans a single Exchange and the
  * second window reuses the sort. No self-join (the naive "join each row to
  * its successor" doubles the shuffle).
  *
  * `valid_to` is exclusive (equal to the NEXT CHANGE's `valid_from`), so
  * intervals tile the timeline without overlap and an as-of lookup is
  * `valid_from <= t AND (valid_to IS NULL OR t < valid_to)`.
  */
object Scd {

  def history(
      changes: DataFrame,
      key: Column,
      tsMs: Column,
      tieBreak: Column,
      attrs: Seq[(String, Column)]): DataFrame = {
    val base = changes.select(
      (key.as("key") +: tsMs.as("valid_from") +: tieBreak.as("__tie") +:
        attrs.map { case (n, c) => c.as(n) }): _*)
    val w = Window.partitionBy(col("key")).orderBy(col("valid_from"), col("__tie"))
    val cur = struct(attrs.map { case (n, _) => col(n) }: _*)
    base
      // lag(struct) is null only for the first row per key; `cur` is itself
      // never null, so !(prev <=> cur) alone keeps first rows AND changes.
      .withColumn("__changed", !(lag(cur, 1).over(w) <=> cur))
      .filter(col("__changed"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__tie", "__changed")
  }

  /** MERGE-style upsert — the lakehouse `MERGE INTO target USING updates`
    * primitive as a plain full-outer reconciliation: for every key in
    * either side the result carries the NEW state when an update exists
    * (latest update by (ts, tie) wins within the batch), the base state
    * otherwise, plus the `merge_op` classification (`insert` = new key,
    * `update` = key replaced, `keep` = untouched) a writer uses to split
    * the commit. One shuffle per side on the key; the updates side is
    * usually the small delta — broadcast it upstream when it fits.
    *
    * Both sides share the (key, ts, tie, attrs) shape; `attrs` name the
    * carried state columns identically on both.
    */
  def mergeUpsert(
      base: DataFrame,
      updates: DataFrame,
      key: Column,
      tsMs: Column,
      tieBreak: Column,
      attrs: Seq[String]): DataFrame = {
    def latest(df: DataFrame, side: String): DataFrame = {
      val w = Window.partitionBy(col("key"))
        .orderBy(col("__ts").desc, col("__tie").desc)
      df.select(
        (key.as("key") +: tsMs.as("__ts") +: tieBreak.as("__tie") +:
          attrs.map(col)): _*)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(
          // explicit presence flag, NOT "ts is null": a legitimate update
          // row with a null timestamp must still count as an update — a
          // null-ts sentinel would silently reclassify it as 'keep'
          (col("key") +: lit(true).as(s"${side}_present") +:
            col("__ts").as(s"${side}_ts") +:
            attrs.map(n => col(n).as(s"${side}_$n"))): _*)
    }
    val b = latest(base, "base")
    val u = latest(updates, "upd")
    val hasUpd = col("upd_present").isNotNull // null ⇔ no updates row joined
    val hasBase = col("base_present").isNotNull
    b.join(u, Seq("key"), "full")
      .select(
        (col("key") +:
          when(hasUpd, col("upd_ts")).otherwise(col("base_ts")).as("ts_ms") +:
          // side-pick on presence, NOT per-attr coalesce: an update whose
          // attr is legitimately null must null the target, not leak the
          // stale base value through
          attrs.map(n =>
            when(hasUpd, col(s"upd_$n"))
              .otherwise(col(s"base_$n")).as(n)) :+
          when(!hasBase, lit("insert"))
            .when(!hasUpd, lit("keep"))
            .otherwise(lit("update")).as("merge_op")): _*)
  }
}
