package graft

import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
import org.apache.spark.sql.DataFrame

import graft.operators.Corpus

/** Pins the char-span STAGE partition pin (r15, TODO #1 — the
  * "when a heavy shuffle's volume is known, PIN that stage" rule from
  * SCALE.md applied by the operator that knows the volume).
  *
  * Two surfaces: the pure sizing function ([[Corpus.spanEngageFor]] —
  * the 40 MB/partition rule engaging at max(cores, sized) past the
  * measured 10 MiB knee, with a 128-waves/core cap), and the plan effect (a forced pin inserts
  * REPARTITION_BY_NUM exchanges — which AQE never coalesces — on exactly
  * the set-build and merge-join stages, while small inputs and the
  * `0` override leave today's adaptive plans bit-identical).
  */
class SpanPinSpec extends SparkSpec {
  import spark.implicits._

  private val MB = BigInt(1024L * 1024)

  private def docs =
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely unrelated text with no repeats whatsoever here")
    ).toDF("doc_id", "text")

  /** Pin placement is asserted on the ANALYZED plan: sizeAwareSetJoin
    * persists the repeated set, so by optimizedPlan time the CacheManager
    * has folded the set-build subtree (and its pin) into an
    * InMemoryRelation — the pinned exchange still executes (the cached
    * plan compiles from the pinned logical plan) but is invisible to a
    * collect over the outer tree. The join-side pin is additionally
    * asserted post-optimizer below, proving the node survives
    * optimization rather than being collapsed away.
    */
  private def repartitions(df: DataFrame): Seq[RepartitionByExpression] =
    df.queryExecution.analyzed.collect { case r: RepartitionByExpression => r }

  private def optimizedRepartitions(df: DataFrame): Seq[RepartitionByExpression] =
    df.queryExecution.optimizedPlan.collect { case r: RepartitionByExpression => r }

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  // ------------------------------------------------------- sizing function

  test("spanEngageFor: off (None) below the measured 10 MiB knee") {
    // spec/verify-SF regime: tiny estimates keep plans adaptive and
    // bit-identical to the pre-pin rounds
    assert(Corpus.spanEngageFor(9 * MB, 32) === None)
    assert(Corpus.spanEngageFor(BigInt(0), 32) === None)
    assert(Corpus.spanEngageFor(BigInt(-1), 32) === None)
    // the r17 bisection's lowest winning cell (x4, est ~11 MB) engages:
    // tokenknee_bisect.json measured 1.17-1.28x there, which the r16
    // 16 MiB bracket pick left on the table
    assert(Corpus.spanEngageFor(11 * MB, 32) === Some(32))
  }

  test("spanEngageFor: ENGAGES at max(cores, sized) past the knee") {
    // past the knee but under one partition per core: engage AT cores —
    // both knee sweeps measured the repartition-first SHAPE (deleted
    // partial agg) as the win, not the partition count
    assert(Corpus.spanEngageFor(50 * MB, 32) === Some(32))
    assert(Corpus.spanEngageFor(27 * MB, 4) === Some(4))
    // past one per core the rule is numerically identical to the r15
    // floor — the committed x30/x100 char records' counts reproduce
    assert(Corpus.spanEngageFor(32 * 40 * MB + 1, 32) === Some(33))
    val p = Corpus.spanEngageFor(5500 * MB, 32).get
    assert(p >= 128 && p <= 160, s"x100-sized pin out of band: $p")
  }

  test("spanEngageFor: capped at 128 waves per core, saturating for huge inputs") {
    assert(Corpus.spanEngageFor(BigInt(Long.MaxValue) * 16, 32) === Some(32 * 128))
    assert(Corpus.spanEngageFor(BigInt(10).pow(18), 4) === Some(4 * 128))
  }

  // ----------------------------------------------------------- plan effect

  test("default: small corpus stats leave the plan free of repartitions") {
    // the shared-session conf is unset here -> auto sizing; a 3-row local
    // relation prices far under the 10 MiB knee
    val out = Corpus.repeatedCharSpans(docs, $"doc_id", $"text", l = 10, minDocs = 2L)
    assert(repartitions(out).isEmpty)
  }

  test("forced pin places REPARTITION_BY_NUM exchanges on set-build AND merge join") {
    withConf(
      Corpus.SpanPartitionsConf -> "6",
      // force the merge branch so the join-side pin is exercised too
      Corpus.BroadcastBudgetConf -> "1") {
      val out = Corpus.repeatedCharSpans(docs, $"doc_id", $"text", l = 10, minDocs = 2L)
      val reps = repartitions(out)
      assert(reps.size === 2, s"expected set-build + join pins, got ${reps.size}")
      assert(reps.forall(_.optNumPartitions.contains(6)))
      // the join-side pin survives the optimizer (not collapsed/removed)
      val opt = optimizedRepartitions(out)
      assert(opt.size === 1 && opt.head.optNumPartitions.contains(6))
    }
  }

  test("broadcast fast path pins only the set-build stage (big side never shuffles)") {
    withConf(Corpus.SpanPartitionsConf -> "6") {
      val out = Corpus.repeatedCharSpans(docs, $"doc_id", $"text", l = 10, minDocs = 2L)
      assert(repartitions(out).size === 1)
    }
  }

  test("'0' turns the stage pin OFF (session-pinned sweep mode)") {
    withConf(Corpus.SpanPartitionsConf -> "0", Corpus.BroadcastBudgetConf -> "1") {
      val out = Corpus.repeatedCharSpans(docs, $"doc_id", $"text", l = 10, minDocs = 2L)
      assert(repartitions(out).isEmpty)
    }
  }

  test("pinned and unpinned plans produce identical spans") {
    val unpinned = Corpus.repeatedCharSpans(docs, $"doc_id", $"text", l = 10, minDocs = 2L)
      .orderBy("doc_id", "span_start").collect().toSeq
    val pinned = withConf(
      Corpus.SpanPartitionsConf -> "6",
      Corpus.BroadcastBudgetConf -> "1") {
      Corpus.repeatedCharSpans(docs, $"doc_id", $"text", l = 10, minDocs = 2L)
        .orderBy("doc_id", "span_start").collect().toSeq
    }
    assert(unpinned.nonEmpty && pinned === unpinned)
  }

  test("winnowed form pins too, with the sampling-density-scaled estimate") {
    // forced-pin path: the conf short-circuits sizing for every char form
    withConf(Corpus.SpanPartitionsConf -> "6", Corpus.BroadcastBudgetConf -> "1") {
      val out = Corpus.winnowedCharSpans(docs, $"doc_id", $"text", l = 8, w = 4, minDocs = 2L)
      assert(repartitions(out).size === 2)
    }
    // auto path: small stats x (2/(w+1) of the measured expansion) stays off
    val auto = Corpus.winnowedCharSpans(docs, $"doc_id", $"text", l = 8, w = 4, minDocs = 2L)
    assert(repartitions(auto).isEmpty)
  }

  test("token family pins too: forced conf places set-build AND join pins") {
    withConf(Corpus.SpanPartitionsConf -> "6", Corpus.BroadcastBudgetConf -> "1") {
      val out = Corpus.repeatedSpans(docs, $"doc_id", $"text", n = 3, minDocs = 2L)
      val reps = repartitions(out)
      assert(reps.size === 2, s"expected set-build + join pins, got ${reps.size}")
      assert(reps.forall(_.optNumPartitions.contains(6)))
    }
  }

  test("token family auto: small corpus stats stay below the knee — no pins") {
    // the measured token expansion (~5x) prices a 3-row corpus far under
    // MinSpanPinBytes, so sf0.1-and-below token plans are bit-identical
    // to the pre-pin rounds by construction
    val out = Corpus.repeatedSpans(docs, $"doc_id", $"text", n = 3, minDocs = 2L)
    assert(repartitions(out).isEmpty)
  }

  test("token family auto ENGAGES past the knee (plan-level)") {
    // the auto pin prices PLAN STATISTICS, which only file-backed scans
    // report from real bytes (a LocalRelation estimates strings at 20 B
    // regardless of content) — so write an incompressible corpus to
    // parquet and read it back; assertions are plan-only, nothing heavy
    // executes
    val rnd = new scala.util.Random(7)
    val dir = java.nio.file.Files.createTempDirectory("graft_fatdocs_").toString
    Seq.tabulate(4)(i => (i.toLong,
      Seq.fill(200000)(java.lang.Long.toString(rnd.nextLong(), 36)).mkString(" ")))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val fat = spark.read.parquet(dir)
    val stats = fat.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats * Corpus.TokenSpanShuffleExpansion >= BigInt(Corpus.MinSpanPinBytes),
      s"precondition: fat corpus est too small ($stats)")
    withConf(Corpus.BroadcastBudgetConf -> "1") {
      val out = Corpus.repeatedSpans(fat, $"doc_id", $"text", n = 3, minDocs = 2L)
      val reps = repartitions(out)
      assert(reps.size === 2, s"expected engaged set-build + join pins, got ${reps.size}")
      // 4-core test session, sized under cores -> engage AT the core count
      assert(reps.forall(_.optNumPartitions.contains(
        spark.sparkContext.defaultParallelism)))
    }
  }

  test("token family: pinned and unpinned plans produce identical spans") {
    val unpinned = Corpus.repeatedSpans(docs, $"doc_id", $"text", n = 3, minDocs = 2L)
      .orderBy("doc_id", "span_start").collect().toSeq
    val pinned = withConf(
      Corpus.SpanPartitionsConf -> "6",
      Corpus.BroadcastBudgetConf -> "1") {
      Corpus.repeatedSpans(docs, $"doc_id", $"text", n = 3, minDocs = 2L)
        .orderBy("doc_id", "span_start").collect().toSeq
    }
    assert(unpinned.nonEmpty && pinned === unpinned)
  }

  test("auto pin stands down on sentinel statistics (non-file-backed input)") {
    // a LogicalRDD (createDataFrame-from-RDD) reports
    // spark.sql.defaultSizeInBytes — Long.MaxValue — as its size; trusting
    // it would saturate the sizing at the cores*128 cap and force
    // thousands-of-partition shuffles on a 3-row corpus (r15 ADVICE)
    val rows = docs.collect().toSeq
    val rdd = spark.sparkContext.parallelize(rows, 2)
    val rddDocs = spark.createDataFrame(rdd, docs.schema)
    val stats = rddDocs.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats >= BigInt(Long.MaxValue), s"precondition: sentinel stats, got $stats")
    val char = Corpus.repeatedCharSpans(rddDocs, $"doc_id", $"text", l = 10, minDocs = 2L)
    val token = Corpus.repeatedSpans(rddDocs, $"doc_id", $"text", n = 3, minDocs = 2L)
    assert(repartitions(char).isEmpty && repartitions(token).isEmpty)
  }

  test("auto pin stands down on RATIO-SCALED sentinel statistics (r16 ADVICE)") {
    // a Project/Filter over a statless leaf reports the sentinel SCALED by
    // column-width/selectivity ratios — below the raw sentinel but equally
    // meaningless; the r16 guard (stats >= sentinel only) passed it and the
    // pin could saturate at cores*128 on a 3-row corpus. The r17 guard walks
    // the leaves: any leaf at the sentinel stands the auto pin down.
    val wide = docs
      .withColumn("pad1", $"text").withColumn("pad2", $"text")
      .withColumn("pad3", $"text").withColumn("pad4", $"text")
    val rdd = spark.sparkContext.parallelize(wide.collect().toSeq, 2)
    val rddWide = spark.createDataFrame(rdd, wide.schema)
    val projected = rddWide.select($"doc_id", $"text").filter($"doc_id" > 0)
    val stats = projected.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats < BigInt(Long.MaxValue) / 2,
      s"precondition: derived stats must land BELOW the r16 guard's line, got $stats")
    val char = Corpus.repeatedCharSpans(projected, $"doc_id", $"text", l = 10, minDocs = 2L)
    val token = Corpus.repeatedSpans(projected, $"doc_id", $"text", n = 3, minDocs = 2L)
    assert(repartitions(char).isEmpty && repartitions(token).isEmpty)
  }
}
