package graft

/** Plan-inspection main: print a declared query's plan at a given SF dir —
  * `runMain graft.Explain <query> <sfDir> [exec]`. With `exec` the query's
  * OWN QueryExecution is executed to completion first (its top plan's RDD is
  * materialized), so the printed tree is the FINAL AQE-re-planned physical
  * plan (`isFinalPlan=true` — join-strategy switches, coalesced partitions);
  * a `df.write` would NOT do: the writer builds a separate QueryExecution
  * and the DataFrame's own AdaptiveSparkPlanExec would print un-executed at
  * `isFinalPlan=false` (caught by the r14 review). Without `exec`, the
  * static plan Catalyst chose from file stats. The session comes from the
  * SAME builder as the bench (Bench.buildSession — honors
  * SPARK_GRAFT_CPUS/MASTER/SHUFFLE_PARTITIONS), so the inspected plan is
  * the plan the committed records measured, not a config-drifted cousin.
  * Built r14 to attribute the t21 100×-point plan switch (shuffle bytes
  * 12 MB → 1.09 GB across one size decade) from evidence instead of
  * theory; kept because "explain the plan and iterate" is the working
  * method here.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <query> <sfDir> [exec]")
    val (name, dir) = (args(0), args(1))
    val withExec = args.length > 2 && args(2) == "exec"
    val spark = Bench.buildSession()
    val fn = SparkEntry.queries.getOrElse(
      name, sys.error(s"unknown query '$name' (${SparkEntry.queries.size} declared)"))
    val df = fn(spark, dir)
    if (withExec) {
      val qe = df.queryExecution
      // materialize THIS QueryExecution's plan: AQE re-plans as stages
      // complete, and afterwards the same tree prints isFinalPlan=true
      qe.executedPlan.execute().foreach(_ => ())
      println(s"=== $name @ $dir — FINAL (post-AQE, executed) plan ===")
      println(qe.executedPlan.toString)
    } else {
      println(s"=== $name @ $dir — static plan ===")
      df.explain("formatted")
    }
    spark.stop()
  }
}
