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
        |FROM h""".stripMargin
  )
}
