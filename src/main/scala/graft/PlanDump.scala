package graft

/** Batch plan dumper for the optimization-round deliverables: write
  * `explain("formatted")` for a list of declared queries into
  * `<outDir>/<query>_<tag>.txt`, one session for all of them (a per-query
  * `graft.Explain` run pays a JVM+session spin-up each). Session comes
  * from the SAME builder as the bench (honors SPARK_GRAFT_CPUS/SF_DIR), so
  * the captured plan is the plan the committed records measure.
  *
  * usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: PlanDump <sfDir> <outDir> <tag> <q1,q2,...>")
    val Array(dir, outDir, tag, qcsv) = args
    val spark = Bench.buildSession()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- qcsv.split(",").map(_.trim).filter(_.nonEmpty)) {
      val df = SparkEntry.queries.getOrElse(
        name, sys.error(s"unknown query '$name'"))(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[plandump] wrote $name ($tag)")
    }
    spark.stop()
  }
}
