package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-aware defaults.
  *
  * Local runs use `local[N]` with `spark.sql.shuffle.partitions` sized to the
  * core count (not the 200 default, which thrashes a single node). On a real
  * cluster the same builder holds: AQE coalesces post-shuffle partitions and
  * re-plans skewed joins at runtime, so the static partition number only needs
  * to be a sane upper bound (2-3x total cores).
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // testdata events.parquet carries TIMESTAMP(NANOS) — read as nanos long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // ~100 distinct queries x several codegen stages in one JVM (Verify,
      // the test suite) overflow the default 100-entry generated-code
      // cache and recompile constantly; a production job running few
      // queries repeatedly never hits this. Static conf — applies to the
      // first session built in the JVM.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", math.max(cores, 8)).getOrCreate()
}
