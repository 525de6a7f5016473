package graft

/** Plan-inspection main: print a declared query's plan at a given SF dir —
  * `runMain graft.Explain <query> <sfDir> [exec]`. With `exec` the query is
  * first written to the noop sink so the printed plan is the FINAL
  * AQE-re-planned physical plan (join-strategy switches, coalesced
  * partitions); without it, the static plan Catalyst chose from file stats.
  * Built r14 to attribute the t21 100×-point plan switch (shuffle bytes
  * 12 MB → 1.09 GB across one size decade) from evidence instead of theory;
  * kept because "explain the plan and iterate" is the working method here.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <query> <sfDir> [exec]")
    val (name, dir) = (args(0), args(1))
    val withExec = args.length > 2 && args(2) == "exec"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(
      name, sys.error(s"unknown query '$name' (${SparkEntry.queries.size} declared)"))
    val df = fn(spark, dir)
    if (withExec) {
      df.write.format("noop").mode("overwrite").save()
      // after execution the AQE plan is final — print the executed plan tree
      println(s"=== $name @ $dir — FINAL (post-AQE) plan ===")
      println(df.queryExecution.executedPlan.toString)
    } else {
      println(s"=== $name @ $dir — static plan ===")
      df.explain("formatted")
    }
    spark.stop()
  }
}
