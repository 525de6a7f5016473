package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal-column queries: binary payload + typed metadata plumbing.
  * (The mapPartitions feature-extraction path is exercised in ScalaTest; the
  * metadata derivation is oracle-checked here.)
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M1 — opaque binary payloads with deterministic (stub) decoded metadata.
    "m1_multimodal_meta" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id").as("id"), col("text").cast("binary").as("content"))
        .select(col("id"), Multimodal.fakeDecode(col("content")).as("m"))
        .select(
          col("id"), col("m.width").as("width"), col("m.height").as("height"),
          col("m.format").as("format"), col("m.n_bytes").as("n_bytes"))
    },
    // M2 — frame sampling: each payload split into n equal byte slices (the
    // video every-k-th-frame shape); per-frame length + content hash are the
    // oracle-checkable surface. The payload itself is never shuffled — the
    // explode carries only the slices.
    "m2_frame_sample" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id").as("id"), col("text").cast("binary").as("content"))
        .select(
          col("id"),
          posexplode(Multimodal.frameSample(col("content"), 4)).as(Seq("frame_idx", "frame")))
        .select(
          col("id"),
          col("frame_idx"),
          length(col("frame")).cast("long").as("frame_len"),
          md5(col("frame")).as("frame_md5"))
    },
    // M3 — resize/downsample: every 7th byte of the payload (thumbnail
    // shape); sampled length + content hash are the checkable surface.
    "m3_resize" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id").as("id"), col("text").cast("binary").as("content"))
        .select(col("id"), Multimodal.resize(col("content"), 7).as("thumb"))
        .select(
          col("id"),
          length(col("thumb")).cast("long").as("thumb_len"),
          md5(col("thumb")).as("thumb_md5"))
    }
  )

  val oracle: Map[String, String] = Map(
    "m1_multimodal_meta" ->
      """WITH h AS (
        |  SELECT doc_id AS id, text,
        |    CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS hv
        |  FROM documents)
        |SELECT id,
        |  CAST(hv % 1920 + 1 AS INT) AS width,
        |  CAST(hv % 1080 + 1 AS INT) AS height,
        |  CASE hv % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
        |  CAST(length(text) AS BIGINT) AS n_bytes
        |FROM h""".stripMargin,
    "m2_frame_sample" ->
      """WITH d AS (SELECT doc_id AS id, text, length(text) AS len FROM documents),
        |s0 AS (
        |  SELECT id, text, len // 4 AS step,
        |         unnest(generate_series(0, 3)) AS i
        |  FROM d)
        |SELECT id, CAST(i AS INT) AS frame_idx,
        |  CAST(length(substr(text, CAST(i * step + 1 AS INT), CAST(greatest(step, 1) AS INT))) AS BIGINT) AS frame_len,
        |  md5(substr(text, CAST(i * step + 1 AS INT), CAST(greatest(step, 1) AS INT))) AS frame_md5
        |FROM s0""".stripMargin,
    "m3_resize" ->
      """WITH t AS (
        |  SELECT doc_id AS id,
        |    array_to_string(
        |      list_transform(generate_series(0, CAST(ceil(length(text) / 7.0) AS BIGINT) - 1),
        |                     i -> substr(text, CAST(i * 7 + 1 AS INT), 1)),
        |      '') AS thumb
        |  FROM documents)
        |SELECT id, CAST(length(thumb) AS BIGINT) AS thumb_len, md5(thumb) AS thumb_md5
        |FROM t""".stripMargin
  )
}
