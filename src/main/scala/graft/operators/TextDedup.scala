package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document deduplication for training-data pipelines: exact (content hash),
  * MinHash+LSH near-dup, and n-gram Jaccard verification.
  *
  * Scale design: signatures and shingle sets are per-row expressions (no
  * shuffle). LSH banding turns the quadratic candidate problem into an
  * equi-join on (band, band_hash) — each document is replicated `bands`
  * times, candidate generation shuffles O(bands·N) rows, and only candidate
  * pairs (a vanishing fraction at 100 TB) reach the exact Jaccard verify.
  * The final verify joins the pair list back to the shingle sets twice —
  * both joins are equi-joins on doc_id that AQE can broadcast when the
  * candidate list is small.
  */
object TextDedup {

  /** Exact content dedup: keep the smallest id per identical content hash.
    * Two-phase at scale: the groupBy partial-aggregates map-side, so the
    * shuffle carries one (hash, min_id, count) triple per distinct content
    * per partition.
    */
  def exactByContent(docs: DataFrame, id: Column, content: Column): DataFrame =
    docs
      .groupBy(md5(content).as("content_md5"))
      .agg(min(id).as("doc_id"), count(lit(1)).as("n_copies"))

  /** Per-document minhash signature columns sig_0..sig_{k-1} plus the
    * distinct shingle set (kept for downstream verification).
    */
  def minhashSignatures(docs: DataFrame, id: Column, text: Column, k: Int = 16): DataFrame = {
    val withSh = docs.select(id.as("doc_id"), shingles(text).as("sh"))
    minhashParams(k).zipWithIndex.foldLeft(withSh) { case (df, ((a, b), j)) =>
      df.withColumn(s"sig_$j", minhashSig(col("sh"), a, b))
    }
  }

  /** LSH candidate pairs: documents sharing at least one band hash.
    * `rowsPerBand` signature values concatenate into one band hash.
    */
  def lshCandidates(sigs: DataFrame, k: Int = 16, rowsPerBand: Int = 2): DataFrame = {
    val nBands = k / rowsPerBand
    val bandStructs = (0 until nBands).map { bIdx =>
      val bh = (0 until rowsPerBand)
        .map(r => col(s"sig_${bIdx * rowsPerBand + r}"))
        .reduce((acc, s) => acc * 1000003L + s)
      struct(lit(bIdx).as("band"), bh.as("bh"))
    }
    val bands = sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val x = bands.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
    val y = bands.select(col("band"), col("bh"), col("doc_id").as("doc_b"))
    x.join(y, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Exact shingle-Jaccard verification of candidate pairs; keeps pairs with
    * jaccard >= threshold. Returns doc_a, doc_b, n_common, jaccard.
    */
  def verifyJaccard(
      candidates: DataFrame,
      docsWithShingles: DataFrame, // doc_id, sh
      threshold: Double): DataFrame = {
    val a = docsWithShingles.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docsWithShingles.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    candidates
      .join(a, Seq("doc_a"))
      .join(b, Seq("doc_b"))
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn(
        "jaccard",
        round(
          col("n_common").cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - col("n_common")),
          6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_common", "jaccard")
  }

  /** Full MinHash-LSH near-dup pipeline. */
  def nearDuplicates(
      docs: DataFrame,
      id: Column,
      text: Column,
      k: Int = 16,
      rowsPerBand: Int = 2,
      threshold: Double = 0.3): DataFrame = {
    val sigs = minhashSignatures(docs, id, text, k).cache()
    val cands = lshCandidates(sigs, k, rowsPerBand)
    verifyJaccard(cands, sigs.select(col("doc_id"), col("sh")), threshold)
  }
}
