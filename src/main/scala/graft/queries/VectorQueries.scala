package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{TextDedup, VectorIndex, VectorOps}

/** Similarity-search queries over the embeddings table. */
object VectorQueries {

  /** x_v12's index directory: one per (process, sf dir), overwritten per
    * invocation — each run pays the full train+save+load+search lifecycle
    * (that IS the measured surface), without leaking a temp dir per run.
    */
  private object IndexDir {
    private val cache = scala.collection.concurrent.TrieMap.empty[String, String]
    // one dir per (sf dir, consumer query): x_v12 and x_v13 write identical
    // index content, but sharing a dir would let one query's overwrite race
    // a still-lazy DataFrame the other returned (the k9 lesson)
    def of(sfDir: String, variant: String): String = {
      val key = FixtureKey.of(sfDir, "embeddings.parquet", variant = s"ivfpq_index_$variant")
      cache.getOrElseUpdate(key, {
        val d = java.nio.file.Files.createTempDirectory(s"graft_ivfpq_${variant}_").toFile
        d.deleteOnExit()
        d.toString
      })
    }
  }

  /** x_v14's SERVING index: trained + saved ONCE per (process, sf dir) and
    * never overwritten (content-fingerprint key, so a regenerated sf dir
    * still re-trains). x_v12/x_v13 deliberately pay the full
    * train+save+load lifecycle per invocation — that is their losslessness
    * proof — but a 100 TB serving job trains offline and only ever pays
    * load+search, so the bench needs a row where the measured surface is
    * exactly that. Same oracle as x_v13: the index content is identical,
    * memoization only moves WHEN it is built.
    */
  private object ServeIndex {
    private val cache = scala.collection.concurrent.TrieMap.empty[String, String]
    def of(s: SparkSession, sfDir: String): String = {
      val key = FixtureKey.of(sfDir, "embeddings.parquet", variant = "ivfpq_index_serve")
      cache.getOrElseUpdate(key, {
        val e = Tables.embeddings(s, sfDir).select(col("vec_id").as("id"), col("embedding"))
        val (model, codes) = VectorOps.ivfPqTrain(
          e, nCells = 8, dim = 64, m = 4, ks = 8,
          coarseIterations = 2, pqIterations = 2, trainModulus = 4)
        val d = java.nio.file.Files.createTempDirectory("graft_ivfpq_serve_").toFile
        VectorIndex.save(model, codes, d.toString)
        FixtureCleanup.registerTree(d)
        d.toString
      })
    }
  }

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
    // label blocking. The hyperplane signs are md5-derived constants shared
    // with the oracle builder, so the DuckDB SQL embeds the identical ±1
    // pattern and reproduces the bucketing bit-for-bit.
    "x_v3_ann_lsh_neardup" -> { (s, dir) =>
      VectorOps.nearDupLsh(
        Tables.embeddings(s, dir)
          .select(col("vec_id").as("id"), col("embedding")),
        dim = 64, threshold = 0.35, nBits = 8)
    },
    // V4 — IVF-cell-probed ANN (scale path #2). The Lloyd iteration is fully
    // deterministic (first-k seed, fixed iteration count, id-ordered mean
    // folds), so the oracle unrolls the same 3 iterations in DuckDB CTEs.
    "x_v4_ann_ivf" -> { (s, dir) =>
      VectorOps.annTopKIvf(
        Tables.embeddings(s, dir).select(col("vec_id").as("id"), col("embedding")),
        queryIds = (0L until 10L).toSeq, k = 3, nCells = 8)
    },
    // V4-fast — the PRODUCTION IVF shape: exactMeans=false swaps the
    // id-ordered mean fold for order-free fixed-point LONG power sums
    // (floor(x·1e8 + 0.5), the engine-portable rounding), cutting
    // centroid-update shuffle volume from O(rows × dims) to O(cells × dims)
    // via map-side partial aggregation. Integer addition is exact, so the
    // result is deterministic under ANY partitioning (unlike the avg() this
    // replaced) — which is what lets this row carry a full rows+schema+hash
    // DuckDB oracle (the same unrolled Lloyd SQL as x_v4 with a fixed-point
    // update step) instead of the previous rows-only gate. Recall
    // equivalence with the exact fold is additionally spec-asserted
    // (ExtensionOpsSpec "ivf fast-means path").
    "x_v4_fast" -> { (s, dir) =>
      VectorOps.annTopKIvf(
        Tables.embeddings(s, dir).select(col("vec_id").as("id"), col("embedding")),
        queryIds = (0L until 10L).toSeq, k = 3, nCells = 8, exactMeans = false)
    },
    // V5 — IVF with multi-probe (nProbe=2): queries search their 2 nearest
    // cells, the recall dial of the IVF family. Same unrolled-Lloyd oracle
    // with a ranked probe CTE.
    "x_v5_ann_ivf_probe2" -> { (s, dir) =>
      VectorOps.annTopKIvf(
        Tables.embeddings(s, dir).select(col("vec_id").as("id"), col("embedding")),
        queryIds = (0L until 10L).toSeq, k = 3, nCells = 8, nProbe = 2)
    },
    // V9 — product-quantization ADC top-k (scale path #3, the billion-vector
    // layout): 4 subspaces × 16 dims, 8-centroid codebooks per subspace
    // trained by the same deterministic fixed-point Lloyd as x_v4_fast on a
    // 1/4 id-modulus corpus sample (the standard bounded-sample PQ training,
    // and the lever that keeps training O(sample) at any corpus size), the
    // corpus reduced to 4 codes a row, queries carrying cid→d2 ADC tables.
    // Fully deterministic ⇒ the oracle unrolls all 4 per-subspace Lloyd runs
    // in DuckDB CTEs and hash-matches the ranked output.
    "x_v9_pq_adc" -> { (s, dir) =>
      VectorOps.annTopKPq(
        Tables.embeddings(s, dir).select(col("vec_id").as("id"), col("embedding")),
        queryIds = (0L until 10L).toSeq, k = 3, dim = 64, m = 4, ks = 8,
        trainModulus = 4)
    },
    // V10 — two-stage PQ retrieval: x_v9's ADC shortlist (10 deep) exact
    // cosine re-ranked to top-3 over only the shortlisted rows — the
    // standard production pipeline (quantized recall, exact precision on a
    // bounded set). Same unrolled training oracle plus a re-rank CTE.
    "x_v10_pq_rerank" -> { (s, dir) =>
      VectorOps.annTopKPqRerank(
        Tables.embeddings(s, dir).select(col("vec_id").as("id"), col("embedding")),
        queryIds = (0L until 10L).toSeq, k = 3, shortlist = 10,
        dim = 64, m = 4, ks = 8, trainModulus = 4)
    },
    // V11 — IVF-PQ (the FAISS IVFx,PQy layout, scale path #4): 8 coarse
    // cells × (4 subspaces × 8-centroid codebooks) over RESIDUALS
    // (v − own-cell centroid), queries probing their 2 nearest cells with
    // per-(query, cell) ADC tables — the IVFADC estimator. Both quantizer
    // levels train with the order-free fixed-point Lloyd, so the composed
    // pipeline still hash-matches a fully unrolled DuckDB oracle.
    "x_v11_ivfpq" -> { (s, dir) =>
      VectorOps.annTopKIvfPq(
        Tables.embeddings(s, dir).select(col("vec_id").as("id"), col("embedding")),
        queryIds = (0L until 10L).toSeq, k = 3, nCells = 8,
        dim = 64, m = 4, ks = 8, coarseIterations = 2, pqIterations = 2,
        nProbe = 2, trainModulus = 4)
    },
    // V12 — the index LIFECYCLE: train the same IVF-PQ as x_v11, SAVE it as
    // parquet (params/centroids/books/codes), LOAD it back, and search with
    // the loaded state. Parquet round-trips doubles bit-exactly, so this
    // must hash-match the identical oracle as x_v11 — the proof that a
    // serving job can reuse a persisted index without retraining and lose
    // nothing.
    "x_v12_ivfpq_index" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir).select(col("vec_id").as("id"), col("embedding"))
      val (model, codes) = VectorOps.ivfPqTrain(
        e, nCells = 8, dim = 64, m = 4, ks = 8,
        coarseIterations = 2, pqIterations = 2, trainModulus = 4)
      val idx = IndexDir.of(dir, "v12")
      VectorIndex.save(model, codes, idx)
      FixtureCleanup.registerTree(new java.io.File(idx))
      val (loaded, loadedCodes) = VectorIndex.load(s, idx)
      VectorOps.ivfPqSearch(
        loaded, loadedCodes, e, queryIds = (0L until 10L).toSeq, k = 3, nProbe = 2)
    },
    // V13 — the END-TO-END production retrieval pipeline: persisted-index
    // lifecycle (train → save → load, as x_v12) producing a 10-deep ADC
    // shortlist over 2 probed cells, exact cosine re-ranked to top-3 over
    // only the shortlisted rows (as x_v10). Quantized recall, exact
    // precision, zero retraining at query time.
    "x_v13_index_rerank" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir).select(col("vec_id").as("id"), col("embedding"))
      val (model, codes) = VectorOps.ivfPqTrain(
        e, nCells = 8, dim = 64, m = 4, ks = 8,
        coarseIterations = 2, pqIterations = 2, trainModulus = 4)
      val idx = IndexDir.of(dir, "v13")
      VectorIndex.save(model, codes, idx)
      FixtureCleanup.registerTree(new java.io.File(idx))
      val (loaded, loadedCodes) = VectorIndex.load(s, idx)
      VectorOps.ivfPqSearchRerank(
        loaded, loadedCodes, e, queryIds = (0L until 10L).toSeq,
        k = 3, shortlist = 10, nProbe = 2)
    },
    // V14 — the SERVING path in isolation: the same persisted-index
    // shortlist + exact re-rank as x_v13, but against a memoized index
    // (trained+saved once per process, like the S1Feed capture fixtures) so
    // the measured surface is load + 2-cell ADC shortlist + re-rank ONLY —
    // the per-query cost a 100 TB operator actually serves, with training
    // amortized offline where it belongs. Hash-matches x_v13's oracle.
    "x_v14_index_serve" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir).select(col("vec_id").as("id"), col("embedding"))
      val (loaded, loadedCodes) = VectorIndex.load(s, ServeIndex.of(s, dir))
      VectorOps.ivfPqSearchRerank(
        loaded, loadedCodes, e, queryIds = (0L until 10L).toSeq,
        k = 3, shortlist = 10, nProbe = 2)
    },
    // V6 — multi-probe SRP near-dup: candidates within hamming<=1 of each
    // other's bucket (the SRP recall dial, complementing x_v5's IVF nProbe).
    "x_v6_ann_lsh_multiprobe" -> { (s, dir) =>
      VectorOps.nearDupLshMultiProbe(
        Tables.embeddings(s, dir)
          .select(col("vec_id").as("id"), col("embedding")),
        dim = 64, threshold = 0.35, nBits = 8)
    },
    // V15 — SEMANTIC dedup (SemDeDup-style), the modern training-data pass
    // this engine exists for: embedding near-dup PAIRS (x_v3's SRP-LSH
    // blocking — no all-pairs) → connected CLUSTERS (t10's bounded
    // min-label BSP) → keep ONE representative per cluster (the min id,
    // which IS the converged cluster label). Output: every corpus vector
    // with its cluster id and the keep decision — `filter(keep)` is the
    // deduplicated corpus. All three stages are the already-proven
    // scale shapes; the composition adds zero new shuffles beyond them.
    "v15_semantic_dedup" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir).select(col("vec_id").as("id"), col("embedding"))
      val pairs = VectorOps.nearDupLsh(e, dim = 64, threshold = 0.35, nBits = 8)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      val labels = TextDedup.neardupClusters(pairs, iterations = 3)
        .withColumnRenamed("doc_id", "vec_id")
      e.select(col("id").as("vec_id"))
        .join(labels, Seq("vec_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("vec_id")))
        .withColumn("keep", col("cluster_id") === col("vec_id"))
    },
    // V2 — embedding-cosine near-dup pairs blocked by label.
    "v2_cosine_neardup" -> { (s, dir) =>
      VectorOps.nearDupPairs(
        Tables.embeddings(s, dir)
          .select(col("vec_id").as("id"), col("embedding"), col("label").as("block")),
        threshold = 0.35)
    },
    // V8 — per-dimension z-score standardization across the corpus (the
    // feature-scaling pass before quantization / clustering).
    "v8_embed_standardize" -> { (s, dir) =>
      VectorOps.perDimStandardize(
        Tables.embeddings(s, dir), col("vec_id"), col("embedding"))
    },
    // V7 — absmax int8 quantization + reconstruction error (the embedding
    // compression step before storage/serving). The operator returns the
    // real `array<long>` quantized vector; the DECLARED query canonicalizes
    // it to a CSV string + length because the driver's pandas checker cannot
    // sort array-typed columns (same trick as the decimal canonical strings
    // in c1/c2) — the array content is still fully hash-checked via the CSV.
    "v7_quantize_int8" -> { (s, dir) =>
      VectorOps.quantizeInt8(Tables.embeddings(s, dir), col("vec_id"), col("embedding"))
        .select(
          col("vec_id"),
          col("scale"),
          // null elements render as a literal NULL token (concat_ws would
          // silently SKIP them, and DuckDB's array_to_string does the same —
          // both engines would agree on a csv that dropped data). A null here
          // can only come from a bug, so make it a visible hash mismatch.
          concat_ws(",", transform(col("q"), x => coalesce(x.cast("string"), lit("NULL"))))
            .as("q_csv"),
          size(col("q")).cast("long").as("q_len"),
          col("recon_mse"))
    }
  )

  /** DuckDB SQL for the SRP bucket id — the same md5-derived ±1 hyperplane
    * components as [[VectorOps.srpBucket]], inlined as literals (left-to-right
    * addition matches Spark's fold order, so the projection doubles are
    * bit-identical).
    */
  private def srpBucketSql(v: String, dim: Int, nBits: Int): String =
    (0 until nBits)
      .map { bit =>
        val proj = (0 until dim)
          .map(d => s"$v[${d + 1}] * ${VectorOps.srpSign(bit, d)}")
          .mkString(" + ")
        s"(CASE WHEN ($proj) > 0 THEN ${1L << bit} ELSE 0 END)"
      }
      .mkString(" + ")

  /** DuckDB unroll of [[VectorOps.ivfAssign]] + [[VectorOps.annTopKIvf]]:
    * same first-k seed, the same `iterations` assign→update rounds, then the
    * cell-probed top-k. The mean update mirrors the Spark mode:
    * `fixedPointMeans = false` (exact path) is the id-ordered sequential fold
    * (`list_sum(list(x ORDER BY id))` is a left fold, verified bit-identical
    * to Spark's `aggregate`); `fixedPointMeans = true` (the x_v4_fast
    * production path) is the order-free fixed-point LONG power sum
    * (`floor(x·1e8 + 0.5)` — both engines floor in double, sum as
    * integers, divide back identically).
    */
  private def ivfOracleSql(
      k: Int, dim: Int, iterations: Int, nQueries: Int, topK: Int,
      nProbe: Int = 1, fixedPointMeans: Boolean = false): String = {
    def d2(v: String, c: String) =
      s"list_sum(list_transform(generate_series(1, $dim), i -> ($v[i] - $c[i]) * ($v[i] - $c[i])))"
    def assign(name: String, cPrev: String) =
      s"""$name AS (
         |  SELECT id, v, cid FROM (
         |    SELECT id, v, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM (
         |      SELECT e.id, e.v, c.cid, ${d2("e.v", "c.c")} AS d2
         |      FROM e CROSS JOIN $cPrev c) dd) rr
         |  WHERE rn = 1)""".stripMargin
    val meanExpr =
      if (fixedPointMeans)
        "CAST(sum(CAST(floor(x * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0 / count(*)"
      else "list_sum(list(x ORDER BY id)) / count(*)"
    def update(name: String, aPrev: String) =
      s"""$name AS (
         |  SELECT cid, list(m ORDER BY dim) AS c FROM (
         |    SELECT cid, dim, $meanExpr AS m FROM (
         |      SELECT a.cid, a.id, g.i AS dim, a.v[g.i] AS x
         |      FROM $aPrev a CROSS JOIN generate_series(1, $dim) g(i)) xx
         |    GROUP BY cid, dim) mm
         |  GROUP BY cid)""".stripMargin
    val rounds = (1 to iterations)
      .flatMap(i => Seq(assign(s"a$i", s"c${i - 1}"), update(s"c$i", s"a$i")))
      .mkString(",\n")
    val cos = duckCos("q.qv", "cor.cv")
    s"""WITH e AS (SELECT vec_id AS id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS cid, v AS c
       |  FROM (SELECT id, v FROM e ORDER BY id LIMIT $k) s0),
       |$rounds,
       |${assign("af", s"c$iterations")},
       |qp AS (
       |  SELECT id, v, cid FROM (
       |    SELECT id, v, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM (
       |      SELECT e.id, e.v, c.cid, ${d2("e.v", "c.c")} AS d2
       |      FROM e CROSS JOIN c$iterations c WHERE e.id < $nQueries) dd) rr
       |  WHERE rn <= $nProbe),
       |q AS (SELECT id AS query_id, v AS qv, cid FROM qp),
       |cor AS (SELECT id AS vec_id, v AS cv, cid FROM af WHERE id >= $nQueries),
       |sims AS (
       |  SELECT q.query_id, cor.vec_id, round($cos, 6) + 0.0 AS cos_sim
       |  FROM cor JOIN q USING (cid)),
       |r AS (
       |  SELECT query_id, vec_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank
       |  FROM sims)
       |SELECT query_id, vec_id, cos_sim, rank FROM r WHERE rank <= $topK""".stripMargin
  }

  /** DuckDB unroll of [[VectorOps.pqTrain]] + [[VectorOps.annTopKPq]]: per
    * subspace s, the sliced corpus `e_s`, the first-ks seed codebook, and
    * `iterations` assign→update rounds with the fixed-point mean (identical
    * to [[ivfOracleSql]]'s `fixedPointMeans = true` step); then the m-way
    * code join reconstructs each corpus row's approx d2 as the SAME
    * left-to-right sum of per-subspace d2 folds Spark computes through its
    * ADC tables.
    */
  private def pqOracleSql(
      dim: Int, m: Int, ks: Int, iterations: Int, nQueries: Int, topK: Int,
      trainModulus: Int = 1, rerankTo: Int = 0): String = {
    val sub = dim / m
    def d2sub(vs: String, c: String) =
      s"list_sum(list_transform(generate_series(1, $sub), i -> ($vs[i] - $c[i]) * ($vs[i] - $c[i])))"
    // d2 of the query's s-th subvector (offset into the FULL vector) against
    // a codebook entry — same element order as the sliced fold above.
    def d2off(v: String, off: Int, c: String) =
      s"list_sum(list_transform(generate_series(1, $sub), i -> ($v[$off + i] - $c[i]) * ($v[$off + i] - $c[i])))"
    val meanExpr =
      "CAST(sum(CAST(floor(x * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0 / count(*)"
    def assign(src: String, name: String, cPrev: String) =
      s"""$name AS (
         |  SELECT id, vs, cid FROM (
         |    SELECT id, vs, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM (
         |      SELECT e.id, e.vs, c.cid, ${d2sub("e.vs", "c.c")} AS d2
         |      FROM $src e CROSS JOIN $cPrev c) dd) rr
         |  WHERE rn = 1)""".stripMargin
    def update(name: String, aPrev: String) =
      s"""$name AS (
         |  SELECT cid, list(mn ORDER BY sd) AS c FROM (
         |    SELECT cid, sd, $meanExpr AS mn FROM (
         |      SELECT a.cid, a.id, g.i AS sd, a.vs[g.i] AS x
         |      FROM $aPrev a CROSS JOIN generate_series(1, $sub) g(i)) xx
         |    GROUP BY cid, sd) mm
         |  GROUP BY cid)""".stripMargin
    // Training reads the sampled slice tables (et_s); the final encode
    // assign (af_s) reads the FULL slice tables — mirroring Spark, where
    // only codebook training is sampled and every corpus row gets a code.
    val trainWhere = if (trainModulus > 1) s" WHERE id % $trainModulus = 0" else ""
    val perSubspace = (0 until m).map { s =>
      val lo = s * sub + 1
      val hi = (s + 1) * sub
      val slices =
        s"""e$s AS (SELECT id, v[$lo:$hi] AS vs FROM e),
           |et$s AS (SELECT id, vs FROM e$s$trainWhere),
           |c${s}_0 AS (
           |  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS cid, v[$lo:$hi] AS c
           |  FROM (SELECT id, v FROM e$trainWhere ORDER BY id LIMIT $ks) s0)""".stripMargin
      val rounds = (1 to iterations)
        .flatMap(i => Seq(
          assign(s"et$s", s"a${s}_$i", s"c${s}_${i - 1}"),
          update(s"c${s}_$i", s"a${s}_$i")))
        .mkString(",\n")
      s"$slices,\n$rounds,\n${assign(s"e$s", s"af$s", s"c${s}_$iterations")}"
    }.mkString(",\n")
    val codeJoin = (0 until m)
      .map(s => s"JOIN c${s}_$iterations c$s ON c$s.cid = x.k$s")
      .mkString("\n  ")
    val approx = (0 until m).map(s => d2off("q.v", s * sub, s"c$s.c")).mkString(" + ")
    s"""WITH e AS (SELECT vec_id AS id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |$perSubspace,
       |codes AS (
       |  SELECT af0.id, ${(0 until m).map(s => s"af$s.cid AS k$s").mkString(", ")}
       |  FROM af0 ${(1 until m).map(s => s"JOIN af$s USING (id)").mkString(" ")}),
       |q AS (SELECT id AS query_id, v FROM e WHERE id < $nQueries),
       |sims AS (
       |  SELECT q.query_id, x.id AS vec_id, round($approx, 6) + 0.0 AS approx_d2
       |  FROM codes x
       |  $codeJoin
       |  CROSS JOIN q
       |  WHERE x.id >= $nQueries),
       |r AS (
       |  SELECT query_id, vec_id, approx_d2,
       |    row_number() OVER (PARTITION BY query_id ORDER BY approx_d2, vec_id) AS rank
       |  FROM sims)
       |${if (rerankTo <= 0)
           s"""SELECT query_id, vec_id, approx_d2, CAST(rank AS BIGINT) AS rank
              |FROM r WHERE rank <= $topK""".stripMargin
         else
           s""",sl AS (SELECT query_id, vec_id FROM r WHERE rank <= $topK),
              |ex AS (
              |  SELECT sl.query_id, sl.vec_id, round(${duckCos("q.v", "c.v")}, 6) + 0.0 AS cos_sim
              |  FROM sl JOIN e c ON c.id = sl.vec_id JOIN q ON q.query_id = sl.query_id),
              |rr AS (
              |  SELECT query_id, vec_id, cos_sim,
              |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank
              |  FROM ex)
              |SELECT query_id, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank
              |FROM rr WHERE rank <= $rerankTo""".stripMargin}""".stripMargin
  }

  /** DuckDB unroll of [[VectorOps.annTopKIvfPq]] — the two quantization
    * levels composed: the coarse fixed-point Lloyd of [[ivfOracleSql]]
    * (`fixedPointMeans = true`), a residual CTE (v − own-cell centroid,
    * exact element-wise subtraction in both engines), [[pqOracleSql]]'s
    * per-subspace training rounds re-rooted at the residual slices, and an
    * ADC scoring join where each query's distance table comes from its
    * residual against the PROBED cell (qv − that cell's centroid) — the
    * IVFADC estimator. All arithmetic is the same left-to-right double
    * folds / exact integer sums as the Spark side, so the final ranking
    * hash-matches.
    */
  private def ivfPqOracleSql(
      nCells: Int, dim: Int, m: Int, ks: Int, coarseIterations: Int,
      pqIterations: Int, nQueries: Int, topK: Int, nProbe: Int,
      trainModulus: Int, rerankTo: Int = 0): String = {
    val sub = dim / m
    val meanExpr =
      "CAST(sum(CAST(floor(x * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0 / count(*)"
    // -- coarse level (full vectors, column v) --
    def d2full(v: String, c: String) =
      s"list_sum(list_transform(generate_series(1, $dim), i -> ($v[i] - $c[i]) * ($v[i] - $c[i])))"
    def cAssign(name: String, cPrev: String) =
      s"""$name AS (
         |  SELECT id, v, cid FROM (
         |    SELECT id, v, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM (
         |      SELECT e.id, e.v, c.cid, ${d2full("e.v", "c.c")} AS d2
         |      FROM e CROSS JOIN $cPrev c) dd) rr
         |  WHERE rn = 1)""".stripMargin
    def cUpdate(name: String, aPrev: String) =
      s"""$name AS (
         |  SELECT cid, list(m ORDER BY dim) AS c FROM (
         |    SELECT cid, dim, $meanExpr AS m FROM (
         |      SELECT a.cid, a.id, g.i AS dim, a.v[g.i] AS x
         |      FROM $aPrev a CROSS JOIN generate_series(1, $dim) g(i)) xx
         |    GROUP BY cid, dim) mm
         |  GROUP BY cid)""".stripMargin
    val coarse = (1 to coarseIterations)
      .flatMap(i => Seq(cAssign(s"a$i", s"c${i - 1}"), cUpdate(s"c$i", s"a$i")))
      .mkString(",\n")
    val cFinal = s"c$coarseIterations"
    // -- PQ level (residual slices, column vs) --
    def d2sub(vs: String, c: String) =
      s"list_sum(list_transform(generate_series(1, $sub), i -> ($vs[i] - $c[i]) * ($vs[i] - $c[i])))"
    def d2off(v: String, off: Int, c: String) =
      s"list_sum(list_transform(generate_series(1, $sub), i -> ($v[$off + i] - $c[i]) * ($v[$off + i] - $c[i])))"
    def pAssign(src: String, name: String, cPrev: String) =
      s"""$name AS (
         |  SELECT id, vs, cid FROM (
         |    SELECT id, vs, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM (
         |      SELECT e.id, e.vs, c.cid, ${d2sub("e.vs", "c.c")} AS d2
         |      FROM $src e CROSS JOIN $cPrev c) dd) rr
         |  WHERE rn = 1)""".stripMargin
    def pUpdate(name: String, aPrev: String) =
      s"""$name AS (
         |  SELECT cid, list(mn ORDER BY sd) AS c FROM (
         |    SELECT cid, sd, $meanExpr AS mn FROM (
         |      SELECT a.cid, a.id, g.i AS sd, a.vs[g.i] AS x
         |      FROM $aPrev a CROSS JOIN generate_series(1, $sub) g(i)) xx
         |    GROUP BY cid, sd) mm
         |  GROUP BY cid)""".stripMargin
    val trainWhere = if (trainModulus > 1) s" WHERE id % $trainModulus = 0" else ""
    val perSubspace = (0 until m).map { s =>
      val lo = s * sub + 1
      val hi = (s + 1) * sub
      val slices =
        s"""rs$s AS (SELECT id, rv[$lo:$hi] AS vs FROM r),
           |rt$s AS (SELECT id, vs FROM rs$s$trainWhere),
           |cb${s}_0 AS (
           |  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS cid, rv[$lo:$hi] AS c
           |  FROM (SELECT id, rv FROM r$trainWhere ORDER BY id LIMIT $ks) s0)""".stripMargin
      val rounds = (1 to pqIterations)
        .flatMap(i => Seq(
          pAssign(s"rt$s", s"pa${s}_$i", s"cb${s}_${i - 1}"),
          pUpdate(s"cb${s}_$i", s"pa${s}_$i")))
        .mkString(",\n")
      s"$slices,\n$rounds,\n${pAssign(s"rs$s", s"paf$s", s"cb${s}_$pqIterations")}"
    }.mkString(",\n")
    val codeJoin = (0 until m)
      .map(s => s"JOIN cb${s}_$pqIterations b$s ON b$s.cid = x.k$s")
      .mkString("\n  ")
    val approx = (0 until m).map(s => d2off("qr.qrv", s * sub, s"b$s.c")).mkString(" + ")
    s"""WITH e AS (SELECT vec_id AS id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS cid, v AS c
       |  FROM (SELECT id, v FROM e ORDER BY id LIMIT $nCells) s0),
       |$coarse,
       |${cAssign("af", cFinal)},
       |r AS (
       |  SELECT af.id, af.cid,
       |    list_transform(generate_series(1, $dim), i -> af.v[i] - c.c[i]) AS rv
       |  FROM af JOIN $cFinal c USING (cid)),
       |$perSubspace,
       |codes AS (
       |  SELECT paf0.id, r.cid, ${(0 until m).map(s => s"paf$s.cid AS k$s").mkString(", ")}
       |  FROM paf0 ${(1 until m).map(s => s"JOIN paf$s ON paf$s.id = paf0.id").mkString(" ")}
       |  JOIN r ON r.id = paf0.id),
       |qp AS (
       |  SELECT id, v, cid FROM (
       |    SELECT id, v, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM (
       |      SELECT e.id, e.v, c.cid, ${d2full("e.v", "c.c")} AS d2
       |      FROM e CROSS JOIN $cFinal c WHERE e.id < $nQueries) dd) rr
       |  WHERE rn <= $nProbe),
       |qr AS (
       |  SELECT qp.id AS query_id, qp.cid,
       |    list_transform(generate_series(1, $dim), i -> qp.v[i] - c.c[i]) AS qrv
       |  FROM qp JOIN $cFinal c USING (cid)),
       |sims AS (
       |  SELECT qr.query_id, x.id AS vec_id, round($approx, 6) + 0.0 AS approx_d2
       |  FROM codes x
       |  $codeJoin
       |  JOIN qr ON qr.cid = x.cid
       |  WHERE x.id >= $nQueries),
       |rk AS (
       |  SELECT query_id, vec_id, approx_d2,
       |    row_number() OVER (PARTITION BY query_id ORDER BY approx_d2, vec_id) AS rank
       |  FROM sims)
       |${if (rerankTo <= 0)
           s"""SELECT query_id, vec_id, approx_d2, CAST(rank AS BIGINT) AS rank
              |FROM rk WHERE rank <= $topK""".stripMargin
         else
           s""",sl AS (SELECT query_id, vec_id FROM rk WHERE rank <= $topK),
              |exq AS (SELECT id AS query_id, v FROM e WHERE id < $nQueries),
              |ex AS (
              |  SELECT sl.query_id, sl.vec_id, round(${duckCos("q.v", "c.v")}, 6) + 0.0 AS cos_sim
              |  FROM sl JOIN e c ON c.id = sl.vec_id JOIN exq q ON q.query_id = sl.query_id),
              |rr AS (
              |  SELECT query_id, vec_id, cos_sim,
              |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank
              |  FROM ex)
              |SELECT query_id, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank
              |FROM rr WHERE rank <= $rerankTo""".stripMargin}""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "x_v11_ivfpq" -> ivfPqOracleSql(
      nCells = 8, dim = 64, m = 4, ks = 8, coarseIterations = 2,
      pqIterations = 2, nQueries = 10, topK = 3, nProbe = 2,
      trainModulus = 4),
    // Same oracle as x_v11 BY DESIGN: the save/load round-trip must be
    // lossless, so the persisted-index search has the same answer.
    "x_v12_ivfpq_index" -> ivfPqOracleSql(
      nCells = 8, dim = 64, m = 4, ks = 8, coarseIterations = 2,
      pqIterations = 2, nQueries = 10, topK = 3, nProbe = 2,
      trainModulus = 4),
    "x_v13_index_rerank" -> ivfPqOracleSql(
      nCells = 8, dim = 64, m = 4, ks = 8, coarseIterations = 2,
      pqIterations = 2, nQueries = 10, topK = 10, nProbe = 2,
      trainModulus = 4, rerankTo = 3),
    // Same oracle as x_v13 BY DESIGN: memoizing the trained index changes
    // when training runs, not what the search answers.
    "x_v14_index_serve" -> ivfPqOracleSql(
      nCells = 8, dim = 64, m = 4, ks = 8, coarseIterations = 2,
      pqIterations = 2, nQueries = 10, topK = 10, nProbe = 2,
      trainModulus = 4, rerankTo = 3),
    "x_v9_pq_adc" -> pqOracleSql(
      dim = 64, m = 4, ks = 8, iterations = 2, nQueries = 10, topK = 3,
      trainModulus = 4),
    "x_v10_pq_rerank" -> pqOracleSql(
      dim = 64, m = 4, ks = 8, iterations = 2, nQueries = 10, topK = 10,
      trainModulus = 4, rerankTo = 3),
    "x_v3_ann_lsh_neardup" -> {
      val cos = duckCos("a.v", "b.v")
      s"""WITH e AS (SELECT vec_id AS id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |bk AS (SELECT id, v, CAST(${srpBucketSql("v", 64, 8)} AS BIGINT) AS block FROM e)
         |SELECT a.block, a.id AS id_a, b.id AS id_b, round($cos, 6) + 0.0 AS cos_sim
         |FROM bk a JOIN bk b ON a.block = b.block AND a.id < b.id
         |WHERE round($cos, 6) >= 0.35""".stripMargin
    },
    // x_v3's pair CTEs composed with t10's 3-round min-label propagation —
    // the same bounded-BSP unroll, over embedding-space edges.
    "v15_semantic_dedup" -> {
      val cos = duckCos("a.v", "b.v")
      val rounds = (1 to 3).map { j =>
        s"""l$j AS (
           |  SELECT doc_id, min(cluster_id) AS cluster_id FROM (
           |    SELECT doc_id, cluster_id FROM l${j - 1}
           |    UNION ALL
           |    SELECT ed.src AS doc_id, l.cluster_id
           |    FROM edges ed JOIN l${j - 1} l ON l.doc_id = ed.dst)
           |  GROUP BY doc_id)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id AS id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |bk AS (SELECT id, v, CAST(${srpBucketSql("v", 64, 8)} AS BIGINT) AS block FROM e),
         |pairs AS (
         |  SELECT a.id AS doc_a, b.id AS doc_b
         |  FROM bk a JOIN bk b ON a.block = b.block AND a.id < b.id
         |  WHERE round($cos, 6) >= 0.35),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |l0 AS (SELECT DISTINCT src AS doc_id, src AS cluster_id FROM edges),
         |$rounds
         |SELECT e.id AS vec_id,
         |  coalesce(l3.cluster_id, e.id) AS cluster_id,
         |  coalesce(l3.cluster_id, e.id) = e.id AS keep
         |FROM e LEFT JOIN l3 ON l3.doc_id = e.id""".stripMargin
    },
    "x_v6_ann_lsh_multiprobe" -> {
      val cos = duckCos("a.v", "b.v")
      s"""WITH e AS (SELECT vec_id AS id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |bk AS (SELECT id, v, CAST(${srpBucketSql("v", 64, 8)} AS BIGINT) AS b0 FROM e),
         |flips AS (
         |  SELECT CAST(0 AS BIGINT) AS f
         |  UNION ALL SELECT CAST(1 AS BIGINT) << j FROM generate_series(0, 7) g(j)),
         |pr AS (SELECT id, v, b0, xor(b0, f) AS block FROM bk CROSS JOIN flips)
         |SELECT a.id AS id_a, b.id AS id_b,
         |  CAST(bit_count(xor(a.b0, b.b0)) AS INT) AS hamming,
         |  round($cos, 6) + 0.0 AS cos_sim
         |FROM bk a JOIN pr b ON a.b0 = b.block AND a.id < b.id
         |WHERE round($cos, 6) >= 0.35""".stripMargin
    },
    "x_v4_ann_ivf" -> ivfOracleSql(k = 8, dim = 64, iterations = 3, nQueries = 10, topK = 3),
    "x_v4_fast" -> ivfOracleSql(
      k = 8, dim = 64, iterations = 3, nQueries = 10, topK = 3, fixedPointMeans = true),
    "x_v5_ann_ivf_probe2" ->
      ivfOracleSql(k = 8, dim = 64, iterations = 3, nQueries = 10, topK = 3, nProbe = 2),
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
    },
    "v8_embed_standardize" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |ex AS (
        |  SELECT vec_id, g.i - 1 AS dim, v[g.i] AS x
        |  FROM e CROSS JOIN generate_series(1, 64) g(i)),
        |st AS (
        |  SELECT dim, count(*) AS n,
        |    CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx
        |  FROM ex GROUP BY dim),
        |m AS (
        |  SELECT dim, sx / n AS mean,
        |    nullif(sqrt(greatest((sxx - sx * sx / n) / n, 0.0)), 0.0) AS sd
        |  FROM st)
        |SELECT vec_id, dim, round((x - mean) / sd, 6) + 0.0 AS x_norm
        |FROM ex JOIN m USING (dim)""".stripMargin,
    "v7_quantize_int8" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |  CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
        |       ELSE list_max(list_transform(v, x -> abs(x))) / 127.0 END AS scale
        |  FROM e)
        |SELECT vec_id, scale,
        |  array_to_string(list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)), ',') AS q_csv,
        |  CAST(len(v) AS BIGINT) AS q_len,
        |  round(list_sum(list_transform(v,
        |      x -> (x - floor(x / scale + 0.5) * scale) * (x - floor(x / scale + 0.5) * scale)))
        |    / len(v), 12) + 0.0 AS recon_mse
        |FROM s""".stripMargin
  )
}
