package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level lexical statistics — the vocabulary/collocation passes of a
  * training-data pipeline (tokenizer vocab seeding, stopword discovery,
  * collocation mining for phrase-aware tokenization). No reference
  * counterpart; scale extension alongside the text-quality family.
  *
  * Scale shape: both ops are explode → hash-aggregate with map-side partial
  * combine (shuffle volume O(vocab), not O(tokens)), and the final top-N is
  * `orderBy(...).limit(n)` — Spark plans that as TakeOrderedAndProject
  * (per-partition heap + driver merge of n·partitions rows), never a global
  * sort of the vocabulary.
  */
object Vocab {

  /** Frequency-rank vocab ids over a one-column `token` frame: (token,
    * n_occurrences, token_id) with ids by (count desc, token) — the ONE
    * definition of the BPE id space, shared by the t14c/t14d/t14h vocab
    * queries, the t14e encode, and [[graft.TrainBpe]]'s artifact emission
    * so every surface resolves ids in the same space by construction. The
    * rank window runs over the AGGREGATED vocab — bounded by alphabet +
    * merge table, not corpus rows — so the single partition it implies is
    * a dimension-table sort, never a corpus sort.
    */
  def frequencyRankVocab(tokens: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    tokens
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"))
      .withColumn(
        "token_id",
        row_number()
          .over(Window.orderBy(col("n_occurrences").desc, col("token")))
          .cast("long"))
  }

  /** Token vocabulary: term frequency (total occurrences) and document
    * frequency per token, top `n` by (tf desc, token) — a total order, so
    * the cut is deterministic. Tokenization is the pipeline-wide whitespace
    * [[TextFunctions.tokens]]; null-text docs contribute nothing (explode of
    * a null array emits no rows, same as SQL unnest).
    */
  def vocabTopK(docs: DataFrame, docId: Column, text: Column, n: Int): DataFrame =
    docs
      .select(docId.as("doc_id"), explode(TextFunctions.tokens(text)).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(n)

  /** Per-document bigram-LM cross-entropy — the KenLM-style quality signal:
    * estimate `p(w2|w1)` from the corpus's own bigram counts (MLE: bigram
    * count over continuations of w1), score each document by the average
    * negative log-likelihood of its adjacent bigrams, and report
    * `ppl = exp(avg_nll)`. Low-perplexity docs read like the corpus; the
    * high tail is boilerplate/garbage — the standard LM-based filter pass.
    *
    * Determinism: each bigram's −ln(p) is rounded to 9 dp (the cross-engine
    * parity point, same ln contract as BM25), then the per-doc mean runs as
    * a DECIMAL(38,12) exact sum — double addition is order-dependent across
    * shuffle merges, decimal addition is not. Docs with <2 tokens (no
    * bigrams) stay in the output with n_bigrams = 0 and null scores (LEFT
    * join, the t18 lesson).
    *
    * Scale shape: the count tables shuffle O(vocab); the scoring join is
    * bigram-keyed equi-join of the exploded doc stream against them; the
    * per-doc mean is one map-side-combined aggregate.
    */
  def bigramPerplexity(docs: DataFrame, docId: Column, text: Column): DataFrame = {
    // Materialize the tokenized stream ONCE (r17 opt): this plan consumes
    // `tk` in four branches (bigram source twice, via cb/cw; the scoring
    // join; the doc roster), and without a materialization point each
    // branch re-evaluates the upstream text projection per scan — for the
    // t21 corpus that is the ~6x doc_id-seeded enrichment expression, the
    // dominant CPU, evaluated FOUR times (one even inside the roster
    // scan's isnotnull DataFilter). Same Materialize.cached contract as
    // t10's BSP rounds: compute-once, lineage-preserving, ContextCleaner-
    // reclaimed, no CacheManager pinning.
    val tk = Materialize.cached(
      docs.filter(text.isNotNull)
        .select(docId.as("doc_id"), TextFunctions.tokens(text).as("tk")),
      eager = false)
    val bi = tk.select(col("doc_id"), explode(
        zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val cb = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cxy"))
    // continuations of w1 (bigram-start mass), NOT the raw unigram count —
    // a doc-final token has no continuation and must not dilute p(w2|w1)
    val cw = cb.groupBy("w1").agg(sum(col("cxy")).as("cx"))
    val scored = bi.join(cb, Seq("w1", "w2")).join(cw, Seq("w1"))
      .select(
        col("doc_id"),
        round(-log(col("cxy") / col("cx")), 9).as("nll"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        (sum(col("nll").cast("decimal(38,12)")).cast("double") /
          count(lit(1))).as("raw_nll"))
    tk.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("raw_nll"), 6).as("avg_nll"),
        round(exp(col("raw_nll")), 6).as("ppl"))
  }

  /** Adjacent-bigram collocations with pointwise mutual information:
    * pmi = ln( p(w1 w2) / (p(w1)·p(w2)) ) with probabilities estimated from
    * corpus counts (bigram mass over total bigrams, unigram mass over total
    * tokens). Top `n` bigrams by (count desc, w1, w2). The two 1-row totals
    * broadcast; the unigram join shuffles O(vocab) only. ln/round(6) parity
    * between engines is the same contract BM25 (t16) already pins.
    */
  def bigramPmi(docs: DataFrame, text: Column, n: Int): DataFrame = {
    // NOT materialized (r17 opt, measured): only two branches consume `tk`
    // here, and the cache write+read balanced the saved recompute exactly
    // (0.97x) — unlike bigramPerplexity's four-branch plan below
    val tk = docs.filter(text.isNotNull).select(TextFunctions.tokens(text).as("tk"))
    val uni = tk.select(explode(col("tk")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cx"))
    val totalUni = uni.agg(sum(col("cx")).as("tu"))
    val bi = tk.select(explode(
        zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_bigram"))
    val totalBi = bi.agg(sum(col("c_bigram")).as("tb"))
    bi
      .join(uni.select(col("token").as("w1"), col("cx")), Seq("w1"))
      .join(uni.select(col("token").as("w2"), col("cx").as("cy")), Seq("w2"))
      .crossJoin(broadcast(totalUni))
      .crossJoin(broadcast(totalBi))
      .withColumn(
        "pmi",
        round(
          log((col("c_bigram") / col("tb")) /
            ((col("cx") / col("tu")) * (col("cy") / col("tu")))),
          6))
      .orderBy(col("c_bigram").desc, col("w1"), col("w2"))
      .limit(n)
      .select("w1", "w2", "c_bigram", "pmi")
  }
}
