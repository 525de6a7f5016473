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
  * Shape: one shuffle on the key, one local sort, one `lead` pass — no
  * self-join (the naive "join each row to its successor" doubles the
  * shuffle). `valid_to` is exclusive (equal to the successor's
  * `valid_from`), so intervals tile the timeline without overlap and an
  * as-of lookup is `valid_from <= t AND (valid_to IS NULL OR t < valid_to)`.
  */
object Scd {

  def history(
      changes: DataFrame,
      key: Column,
      tsMs: Column,
      tieBreak: Column,
      attrs: Seq[(String, Column)]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tsMs, tieBreak)
    val base = changes.select(
      (key.as("key") +: tsMs.as("valid_from") +: tieBreak.as("__tie") +:
        attrs.map { case (n, c) => c.as(n) }): _*)
    base
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy(col("key")).orderBy(col("valid_from"), col("__tie"))))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__tie")
  }
}
