package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.storage.StorageLevel

/** Fault-tolerance-aware materialization of a shared or iterated stage.
  *
  * A stage consumed more than once (w6b's windowed stage feeding output +
  * tails) or iterated over (t10's BSP label rounds, where the plan doubles
  * per round if lineage is never cut) must be computed once. HOW it is
  * stored decides what an executor loss costs, and every obvious Spark
  * primitive has a sharp edge:
  *
  *   - `Dataset.persist` pins an entry in the session-global CacheManager
  *     that is never GC-reclaimed — measured (r5) degrading UNRELATED
  *     queries in the same JVM. Disqualified.
  *   - `localCheckpoint` stores executor-local blocks with lineage
  *     TRUNCATED: compute-once, ContextCleaner-reclaimed, but an executor
  *     loss fails the query. Fine in one-JVM local mode, fragile on a
  *     1000-node cluster with churn.
  *   - reliable `checkpoint(dir)` survives anything, at the price of a
  *     write to shared storage — the long-cluster-job shape.
  *
  * [[stage]] picks per environment: an explicit `checkpointDir` wins
  * (reliable); otherwise local mode uses `localCheckpoint`; otherwise
  * (cluster, no dir) it falls back to [[cached]] — an RDD-level cache:
  * `queryExecution.toRdd.map(_.copy()).persist(MEMORY_AND_DISK)` wrapped
  * back into a DataFrame. The RDD cache is computed once, recomputes FROM
  * LINEAGE on executor loss (the RDD keeps its parent chain, unlike
  * localCheckpoint), and is registered with the ContextCleaner so the
  * blocks free when the RDD is GC'd — no CacheManager pinning. The
  * `copy()` is mandatory: scan operators reuse mutable UnsafeRow buffers,
  * and caching live references would alias every row to the last buffer
  * state.
  *
  * The wrapped result scans an `ExistingRDD`, so Catalyst cannot push
  * projections/filters below the materialization point — project the input
  * down before materializing (the callers do).
  */
object Materialize {

  /** Materialize `df` once for multi-consumer / iterative reuse.
    *
    * @param checkpointDir reliable checkpoint directory; set on real
    *                      clusters for long jobs
    * @param eager         force computation NOW (BSP rounds need this so
    *                      each round's plan is bounded); lazy otherwise
    */
  def stage(df: DataFrame, checkpointDir: Option[String], eager: Boolean): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        df.sparkSession.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None if df.sparkSession.sparkContext.isLocal =>
        df.localCheckpoint(eager)
      case None => cached(df, eager)
    }

  /** RDD-level cache of `df`: compute-once, lineage-preserving (executor
    * loss → recompute, not failure), ContextCleaner-managed. See class doc.
    * No multi-executor environment exists in-sandbox to kill a real
    * executor; the closest analog — evicting the persisted blocks
    * mid-consumption and asserting the result recomputes unchanged — is
    * exercised by ExtensionOpsSpec "survives simulated block loss".
    */
  def cached(df: DataFrame, eager: Boolean): DataFrame = {
    val rdd = df.queryExecution.toRdd.map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (eager) rdd.count()
    ColumnBridge.internalCreateDataFrame(df.sparkSession, rdd, df.schema)
  }
}
