package graft
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (name <- args) {
      println(s"===== $name")
      val p = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      println("exchanges: " + "Exchange hashpartitioning".r.findAllIn(p).size)
      "Exchange hashpartitioning\\([^)]*\\)".r.findAllIn(p).toSeq.distinct.foreach(e => println("  " + e.take(120)))
      println("windows: " + "Window ".r.findAllIn(p).size + ", sorts: " + "Sort ".r.findAllIn(p).size)
    }
    spark.stop()
  }
}
