package graft

import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ScanFill

/** Pins the scan-underfill correction (r17 optimization round): the rule's
  * engage/stand-down behavior, the conf overrides, and — the property every
  * consumer rests on — that a forced fill never changes results, only row
  * placement.
  */
class ScanFillSpec extends SparkSpec {
  import spark.implicits._

  private def rows = (1L to 500L).map(i => (i, i % 7, s"v$i")).toDF("id", "k", "s")

  private def fills(df: DataFrame): Seq[RepartitionByExpression] =
    df.queryExecution.analyzed.collect { case r: RepartitionByExpression => r }

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("auto mode stands down below the byte floor (verify-SF regime)") {
    // a 500-row local frame prices far below MinFillBytes
    assert(fills(ScanFill.fill(rows, col("id"))).isEmpty)
  }

  test("work expansion can engage a small kernel-dense relation; raw-byte underfill still gates") {
    val small = rows // a few KB; x (MinFillBytes) expansion crosses the floor
    val engaged = ScanFill.fill(small, ScanFill.MinFillBytes, col("id"))
    assert(fills(engaged).nonEmpty)
    val r = fills(engaged).head
    assert(r.optNumPartitions.contains(spark.sparkContext.defaultParallelism))
  }

  test("conf 0 forces OFF even where auto would engage") {
    withConf(ScanFill.FillPartitionsConf -> "0") {
      assert(fills(ScanFill.fill(rows, ScanFill.MinFillBytes, col("id"))).isEmpty)
    }
  }

  test("conf > 0 forces that partition count") {
    withConf(ScanFill.FillPartitionsConf -> "7") {
      val r = fills(ScanFill.fill(rows, col("id")))
      assert(r.nonEmpty && r.head.optNumPartitions.contains(7))
    }
  }

  test("a relation already wide enough to fill the box stands down") {
    // fake "already parallel" by shrinking maxPartitionBytes so the split
    // estimate reaches the core count
    withConf("spark.sql.files.maxPartitionBytes" -> "1") {
      assert(fills(ScanFill.fill(rows, ScanFill.MinFillBytes, col("id"))).isEmpty)
    }
  }

  test("forced fill is placement-only: grouped aggregates are bit-identical") {
    def agg(df: DataFrame) =
      df.groupBy("k")
        .agg(
          count(lit(1)).as("n"),
          sum(col("id")).as("s"),
          min_by(col("s"), col("id")).as("first_s"))
        .orderBy("k")
        .collect()
        .toSeq
    val base = agg(rows)
    val filled = withConf(ScanFill.FillPartitionsConf -> "32")(agg(ScanFill.fill(rows, col("id"))))
    assert(base === filled)
  }

  test("a1's filled plan hash-matches its unfilled twin on real data") {
    val dir = "/root/testdata/sf0.001"
    def run(conf: String) = withConf(ScanFill.FillPartitionsConf -> conf) {
      SparkEntry.queries("a1_trade_batch_stats")(spark, dir)
        .orderBy("l_returnflag", "l_linestatus")
        .collect()
        .toSeq
    }
    assert(run("0") === run("32"))
  }
}
