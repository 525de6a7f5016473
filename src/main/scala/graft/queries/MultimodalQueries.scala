package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Multimodal, ScanFill}

/** Multimodal-column queries: binary payload + typed metadata plumbing.
  * (The mapPartitions feature-extraction path is exercised in ScalaTest; the
  * metadata derivation is oracle-checked here.)
  */
object MultimodalQueries {

  /** Deterministic real-image fixture: doc_id-derived dims and alternating
    * PNG/JPEG, encoded as ACTUAL image bytes by the ImageIO fixture udf —
    * so the decode half ([[Multimodal.imageMeta]]) parses real headers and
    * the DuckDB oracle predicts the metadata from the same doc_id formula.
    */
  private def realImages(s: SparkSession, dir: String): DataFrame =
    // ScanFill (r17 opt): the ImageIO encode (and each consumer's decode)
    // is codec work at ~0.2 ms/row — orders of magnitude above the byte
    // cost of the 8-48 px payloads — and it all runs inside the scan stage
    // (m4 diag: 1.0 s task CPU at ~0.9-way on 32 cores). Work expansion
    // 128 ≈ measured codec cost over compressed input bytes.
    ScanFill.fill(Tables.documents(s, dir), 128L, col("doc_id"))
      .select(
        col("doc_id").as("id"),
        (col("doc_id") % 31 + 8).cast("int").as("w0"),
        (col("doc_id") % 17 + 8).cast("int").as("h0"),
        when(col("doc_id") % 2 === 0, lit("png")).otherwise(lit("jpg")).as("f0"))
      .select(
        col("id"),
        Multimodal.encodeImageUdf(col("id"), col("w0"), col("h0"), col("f0")).as("content"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M1 — REAL image metadata: actual PNG/JPEG payloads, header-only
    // javax.imageio decode; the oracle re-derives the dims from doc_id.
    "m1_multimodal_meta" -> { (s, dir) =>
      realImages(s, dir)
        .select(col("id"), Multimodal.imageMeta(col("content")).as("m"))
        .select(
          col("id"), col("m.width").as("width"), col("m.height").as("height"),
          col("m.format").as("format"))
    },
    // M4 — REAL image downscale: bilinear 1/2-scale thumbnail re-encoded as
    // PNG, then header decode of the RESULT — verifies the pixel-touching
    // path end-to-end (thumb dims are the halved originals).
    "m4_image_thumb" -> { (s, dir) =>
      realImages(s, dir)
        .select(col("id"), Multimodal.imageThumbnail(col("content"), 2).as("thumb"))
        .select(col("id"), Multimodal.imageMeta(col("thumb")).as("m"))
        .select(
          col("id"), col("m.width").as("thumb_width"),
          col("m.height").as("thumb_height"), col("m.format").as("thumb_format"))
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
    // the oracle predicts the REAL decoded header values from the same
    // doc_id formula the fixture encoder used — an actual round-trip check
    // (encode real bytes -> parse real headers -> match the formula)
    "m1_multimodal_meta" ->
      """SELECT doc_id AS id,
        |  CAST(doc_id % 31 + 8 AS INT) AS width,
        |  CAST(doc_id % 17 + 8 AS INT) AS height,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
        |FROM documents""".stripMargin,
    "m4_image_thumb" ->
      """SELECT doc_id AS id,
        |  CAST(greatest((doc_id % 31 + 8) // 2, 1) AS INT) AS thumb_width,
        |  CAST(greatest((doc_id % 17 + 8) // 2, 1) AS INT) AS thumb_height,
        |  'png' AS thumb_format
        |FROM documents""".stripMargin,
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
