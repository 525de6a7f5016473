package graft

/** Physical-plan regression guards — the scale-critical plan shapes from
  * SCALE.md, asserted so a future refactor can't silently regress them.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("j5 star join broadcasts every dimension (no sort-merge, no cartesian)") {
    val p = plan("j5_star_join_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(500))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("j1 as-of join is an equi-join, never a cartesian/range join") {
    val p = plan("j1_asof_outcomes")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("t3 LSH candidate generation never degenerates to a cartesian") {
    val p = plan("t3_lsh_neardup_pairs")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("p1 projection pushes filters into the parquet scan") {
    val p = plan("p1_projection_validation")
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(800))
  }

  test("j5 scan prunes to the referenced lineitem columns only") {
    val p = plan("j5_star_join_revenue")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_extendedprice"))
    assert(!read.contains("l_shipdate") && !read.contains("l_comment"))
  }

  test("a5b bucketed rolling window partitions by (symbol, chunk), not symbol alone") {
    val p = plan("a5b_rolling_stats_bucketed")
    // the heavy per-row windows must carry the chunk key in their partition
    // spec so parallelism = symbols × chunks, not the symbol cardinality
    assert(p.contains("__chunk"), p.take(800))
    assert("hashpartitioning\\([^)]*__chunk".r.findFirstIn(p).nonEmpty, p.take(800))
    // and the chunked key space is genuinely wider than the symbol space
    val t = Tables.trades(spark, sf)
    val nSym = t.select("symbol").distinct.count()
    val nParts = t
      .select(
        org.apache.spark.sql.functions.col("symbol"),
        graft.functions.TimeUnits.bucketIndex(
          org.apache.spark.sql.functions.col("ts_ms"), 3600000L))
      .distinct.count()
    assert(nParts > nSym, s"chunking added no parallelism: $nParts vs $nSym")
  }

  test("a5b bucketed rolling window output equals the per-symbol a5 window") {
    val a5 = SparkEntry.queries("a5_rolling_stats")(spark, sf)
    val a5b = SparkEntry.queries("a5b_rolling_stats_bucketed")(spark, sf)
    assert(a5b.count() === a5.count())
    assert(a5b.exceptAll(a5).isEmpty && a5.exceptAll(a5b).isEmpty)
  }

  test("a1b packed-ordering open/close picks hash-aggregate, not sort-aggregate") {
    val p = plan("a1b_trade_stats_packed")
    assert(p.contains("partial_min_by"), p.take(500))
    assert(!p.contains("SortAggregate"), "packed ordering should restore HashAggregate")
    assert(p.contains("HashAggregate"))
  }

  test("a4 bars aggregate partially before its single shuffle") {
    val p = plan("a4_bars_1m")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(500))
    // min_by(struct ordering) plans as SortAggregate (see SCALE.md); the
    // invariant that matters is partial-before-shuffle, not the agg flavor.
    assert(p.contains("partial_min_by"))
  }
}
