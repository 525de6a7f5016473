package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring over a document corpus — the retrieval-side text
  * operator a training-data pipeline uses for quality-weighted sampling and
  * query-based corpus slicing (no reference counterpart; extension per the
  * LLM-pipeline mandate, same family as [[TextDedup]]).
  *
  * Scale shape, in order:
  *  1. doc lengths come from `size(split(...))` per row — narrow column, no
  *     token explode, no shuffle;
  *  2. the token stream is filtered to the QUERY terms before any
  *     aggregation, so the (doc, term) tf aggregate shuffles O(matches), not
  *     O(tokens);
  *  3. document frequencies are an aggregate of the tf table (tf already has
  *     one row per (doc, term)) — k rows out, broadcast back;
  *  4. corpus stats (N, avgdl) are a 1-row aggregate, broadcast;
  *  5. the per-doc total folds per-term scores in the FIXED query-term order
  *     (max-when pivot), so double addition order is deterministic and
  *     cross-engine reproducible.
  *
  * The only O(corpus) shuffle is tf joining doc-lengths on doc_id.
  */
object TextRank {

  /** One row per document matching ≥1 query term: `bm25` (rounded 6dp) and
    * `n_terms` matched. Okapi BM25 with the standard `ln(1 + (N-df+0.5)/
    * (df+0.5))` idf.
    */
  def bm25(
      docs: DataFrame,
      id: Column,
      text: Column,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    // duplicate query terms would double-count their score in the per-doc
    // fold (tf/df dedupe via groupBy, the fold does not) — dedupe up-front
    val terms = queryTerms.distinct
    val toks = docs.select(
      id.as("doc_id"),
      explode(filter(split(text, " "), t => t =!= lit(""))).as("term"))
    val dls = docs.select(
      id.as("doc_id"),
      size(filter(split(text, " "), t => t =!= lit(""))).cast("long").as("dl"))
    val stats = dls.agg(
      (sum(col("dl").cast("decimal(27,8)")).cast("double") / count(lit(1)))
        .as("avgdl"),
      count(lit(1)).as("n_docs"))
    val tf = toks
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(dls, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn(
        "s",
        idf * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl"))))
    val perTerm = terms.map(t =>
      coalesce(max(when(col("term") === t, col("s"))), lit(0.0)))
    scored
      .groupBy(col("doc_id"))
      .agg(
        graft.functions.Num.nz(round(perTerm.reduce(_ + _), 6)).as("bm25"),
        count(lit(1)).as("n_terms"))
  }
}
