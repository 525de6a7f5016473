package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.VectorOps

/** Similarity-search queries over the embeddings table. */
object VectorQueries {

  /** DuckDB cosine between two DOUBLE lists, sequential accumulation. */
  private def duckCos(a: String, b: String): String =
    s"""(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i]))
       | / (sqrt(list_sum(list_transform($a, x -> x * x)))
       |    * sqrt(list_sum(list_transform($b, x -> x * x)))))""".stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // V1 — brute-force cosine top-3 per query vector (vec_id < 10 as the
    // query set, broadcast against the corpus).
    "v1_ann_topk" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      VectorOps.annTopK(
        queries = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding")),
        corpus = e.filter(col("vec_id") >= 10),
        k = 3)
    },
    // V3 — scale-path ANN: sign-random-projection LSH buckets instead of
    // label blocking. No SQL oracle (the deterministic hyperplanes are not
    // practically expressible in DuckDB); driver records rows-only, and the
    // golden test asserts the pairs are a subset of brute-force truth.
    "x_v3_ann_lsh_neardup" -> { (s, dir) =>
      VectorOps.nearDupLsh(
        Tables.embeddings(s, dir)
          .select(col("vec_id").as("id"), col("embedding")),
        dim = 64, threshold = 0.35, nBits = 8)
    },
    // V4 — IVF-cell-probed ANN (scale path #2). Rows-only: k-means centroid
    // means are partition-order-sensitive doubles, so no cross-engine oracle;
    // the spec asserts cluster-structure properties instead.
    "x_v4_ann_ivf" -> { (s, dir) =>
      VectorOps.annTopKIvf(
        Tables.embeddings(s, dir).select(col("vec_id").as("id"), col("embedding")),
        queryIds = (0L until 10L).toSeq, k = 3, nCells = 8)
    },
    // V2 — embedding-cosine near-dup pairs blocked by label.
    "v2_cosine_neardup" -> { (s, dir) =>
      VectorOps.nearDupPairs(
        Tables.embeddings(s, dir)
          .select(col("vec_id").as("id"), col("embedding"), col("label").as("block")),
        threshold = 0.35)
    }
  )

  val oracle: Map[String, String] = Map(
    "v1_ann_topk" -> {
      val cos = duckCos("q.v", "c.v")
      s"""WITH e AS (SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 10),
         |c AS (SELECT vec_id, v FROM e WHERE vec_id >= 10),
         |sims AS (
         |  SELECT q.query_id, c.vec_id, round($cos, 6) + 0.0 AS cos_sim
         |  FROM c CROSS JOIN q),
         |r AS (
         |  SELECT query_id, vec_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank
         |  FROM sims)
         |SELECT query_id, vec_id, cos_sim, rank FROM r WHERE rank <= 3""".stripMargin
    },
    "v2_cosine_neardup" -> {
      val cos = duckCos("a.v", "b.v")
      s"""WITH e AS (SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
         |SELECT a.label AS block, a.vec_id AS id_a, b.vec_id AS id_b,
         |  round($cos, 6) + 0.0 AS cos_sim
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE round($cos, 6) >= 0.35""".stripMargin
    }
  )
}
