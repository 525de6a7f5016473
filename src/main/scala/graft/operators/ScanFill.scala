package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-underfill correction (r17 optimization round) — the missing twin of
  * the session shuffle sizing ([[graft.GraftSession.sizedShufflePartitions]])
  * and the span-stage engage rule ([[Corpus]] spanPin): those size SHUFFLE
  * stages, but work that runs INSIDE the scan stage (partial aggregation,
  * per-row kernels, broadcast-join probes) inherits the file-split
  * parallelism, and the bench corpus ships single-row-group parquet — every
  * scan is ONE task no matter how many cores the box has. The committed
  * bench diag shows the cost directly: a1's 1.8 s of task CPU runs at
  * ~0.9-way parallelism on 32 cores, a7's 3.4 s likewise.
  *
  * `fill` repartitions the relation by caller-chosen high-cardinality keys
  * to one partition per core, exactly when BOTH hold:
  *   - the relation is big enough that the exchange pays for itself
  *     ([[MinFillBytes]], measured — see the constant's doc), and
  *   - the scan would otherwise underfill the box: its estimated split
  *     count (plan-stats bytes / `spark.sql.files.maxPartitionBytes`, the
  *     same quantity Spark's own split planner divides) is below the core
  *     count. At 100 TB a scan is thousands of splits and the rule STANDS
  *     DOWN — production-scale plans are unchanged by construction; this
  *     engages only where the input is too small to fill the machine yet
  *     carries enough per-row work to matter.
  *
  * Keyed repartition, not round-robin: `repartition(n)` without keys pays a
  * local sort of the input first (`spark.sql.execution.sortBeforeRepartition`,
  * needed for deterministic retries) — a SERIAL sort here, since the whole
  * point is that the input is one partition. Hash partitioning on existing
  * high-cardinality keys is deterministic without the sort, and when the
  * keys are also downstream join/group keys the exchange is REUSED rather
  * than added.
  *
  * Same statistics hygiene as the span pin: the auto rule only trusts
  * plan-stats whose leaves carry real size estimates; any leaf at the
  * `spark.sql.defaultSizeInBytes` sentinel stands the rule down (a derived
  * estimate over a statless leaf is the sentinel times size-independent
  * ratios — meaningless at any magnitude).
  */
object ScanFill {

  /** Session conf: unset → auto (the underfill rule); `0` → OFF (plans
    * exactly as before this round); `> 0` → forced partition count (tests,
    * sweeps).
    */
  val FillPartitionsConf = "spark.graft.scan.fillPartitions"

  /** Engage floor, measured at the bench SFs (kneeapply discipline): at
    * sf0.01 the relations this rule targets (lineitem ~1 MB compressed)
    * carry ~100 ms of scan-stage work — the exchange's fixed cost (~50 ms
    * barrier + task launch) eats the win, and the verify SFs must stay
    * sub-second — while at sf0.1 (lineitem 10.8 MB, a1 1.8 s / a7 3.4 s of
    * serial task CPU) the measured wins are 1.5-2.3x (OPTIMIZATION_r17.md,
    * scanfill records). 4 MiB sits between those measured regimes.
    */
  val MinFillBytes: Long = 4L * 1024 * 1024

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** `df` repartitioned to one partition per core when the underfill rule
    * engages; `df` unchanged otherwise. `keys` must be deterministic
    * existing columns with cardinality well above the core count (order
    * keys, doc ids) — they only decide row placement, never results: every
    * consumer of this helper is aggregation/join work whose output is
    * partitioning-independent (the property clusterverify re-proves at
    * every round HEAD).
    */
  def fill(df: DataFrame, keys: Column*): DataFrame =
    fill(df, 1L, keys: _*)

  /** [[fill]] with a WORK-expansion factor for kernel-dense relations, the
    * span pin's expansion-constant idea applied to scan-stage CPU: the
    * engage floor compares `stats × expansion` against [[MinFillBytes]], so
    * a small relation whose per-row work is orders of magnitude above its
    * byte cost (image codecs at ~1 s per compressed MB, BPE tokenization)
    * still fills the box, while plain columnar work keeps the measured
    * byte floor. The underfill test itself stays on RAW bytes — split
    * planning divides file bytes, not work.
    */
  def fill(df: DataFrame, expansion: Long, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "fill needs at least one deterministic key column")
    require(expansion >= 1L, s"expansion must be >= 1, got $expansion")
    val spark = df.sparkSession
    spark.conf.getOption(FillPartitionsConf).map(_.trim.toInt) match {
      case Some(0) => df
      case Some(p) =>
        require(p > 0, s"$FillPartitionsConf must be >= 0, got $p")
        df.repartition(p, keys: _*)
      case None =>
        val plan = df.queryExecution.optimizedPlan
        val stats = plan.stats.sizeInBytes
        val sentinel = BigInt(
          org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            spark.conf.get("spark.sql.defaultSizeInBytes", Long.MaxValue.toString)))
        val statless = stats >= sentinel ||
          plan.collectLeaves().exists(_.stats.sizeInBytes >= sentinel)
        if (statless) {
          log.warn(
            "graft scan fill: plan statistics carry no size estimate " +
              s"(sizeInBytes=$stats) — auto fill OFF, plan unchanged; set " +
              s"$FillPartitionsConf to force")
          df
        } else {
          val cores = spark.sparkContext.defaultParallelism
          val maxSplit = BigInt(
            org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
              spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")))
          val estSplits = (stats + maxSplit - 1) / maxSplit
          if (stats * expansion < BigInt(MinFillBytes) || estSplits >= BigInt(cores)) df
          else {
            log.warn(
              s"graft scan fill ENGAGED: $cores partitions (input stats " +
                s"$stats B x work expansion $expansion, ~ $estSplits splits " +
                s"< $cores cores); set $FillPartitionsConf=0 to disable")
            df.repartition(cores, keys: _*)
          }
        }
    }
  }
}
