package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Fixed-cadence tick emission with LOCF — the reference's hot path emits a
  * feature vector every 2 s per symbol whether or not trades arrived
  * (`README.md:7` "every 2 s"; `feat:{symbol}` refresh in
  * `DATA_PIPELINE.md:124-161`), carrying the last known values through
  * quiet periods. The batch twin is [[graft.operators.Resample.fillGrid]]
  * (grid + LOCF over a closed span); this is the STREAMING form: per key,
  * emit one tick per `stepMs` boundary once the watermark has passed it —
  * watermark-finalized, so a tick is emitted exactly once with all
  * admissible observations applied, regardless of micro-batch boundaries.
  *
  * Grid anchor = the key's first observed ts (the same min-anchored
  * convention as fillGrid). A tick's value is the newest observation at or
  * before the tick instant (LOCF); `fresh` distinguishes ticks backed by an
  * observation in their own step from pure carries.
  *
  * Mechanics worth naming: quiet keys still tick. Emission is driven by
  * EventTimeTimeout — each invocation re-arms the timeout at the next
  * pending grid instant, so when the GLOBAL watermark advances past it
  * (other keys' traffic), the key wakes with no input and drains its due
  * ticks. State is the pending-observation buffer above the last emitted
  * tick, bounded by rate × watermark delay, plus one (price, anchor)
  * pair — O(in-flight window), not O(history).
  */
object GridTicker {

  final case class Obs(symbol: String, ts_ms: Long, price: Double)
  final case class TickerState(
      anchorTs: Long,
      nextGridTs: Long,
      lastPrice: Option[Double],
      lastObsTs: Long,
      pending: List[Obs])
  final case class Tick(
      symbol: String,
      grid_ts: Long,
      price: Double,
      fresh: Boolean)

  /** @param idleTimeoutMs a key with no NEW observation for this long (event
    *                       time) stops ticking and drops its state — without
    *                       the cap, a delisted symbol would carry its stale
    *                       LOCF price forever and state would grow with
    *                       every key ever seen. A later observation restarts
    *                       the key with a fresh anchor.
    */
  def ticks(
      obs: Dataset[Obs],
      stepMs: Long = 2000L,
      watermarkDelay: String = "10 seconds",
      idleTimeoutMs: Long = 3600000L): Dataset[Tick] = {
    require(stepMs > 0, s"stepMs must be positive, got $stepMs")
    require(idleTimeoutMs > 0, s"idleTimeoutMs must be positive, got $idleTimeoutMs")
    import obs.sparkSession.implicits._
    obs
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", watermarkDelay)
      .as[Obs]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (symbol: String, it: Iterator[Obs], state: GroupState[TickerState]) => {
          val wm = state.getCurrentWatermarkMs()
          val incoming = it.toList
          // `pending` is kept sorted by (ts_ms, price) as a state invariant,
          // so only the incoming slice needs sorting; a linear merge
          // replaces the r17 full re-sort of the whole buffer every
          // micro-batch (guide §1.2 step 2 — per-task work). Ties prefer
          // the pending side, exactly what the stable sortBy over
          // pending ++ incoming produced.
          def merge(a: List[Obs], b: List[Obs]): List[Obs] = {
            val out = List.newBuilder[Obs]
            var x = a
            var y = b
            while (x.nonEmpty && y.nonEmpty) {
              val xa = x.head
              val yb = y.head
              if (xa.ts_ms < yb.ts_ms || (xa.ts_ms == yb.ts_ms && xa.price <= yb.price)) {
                out += xa; x = x.tail
              } else { out += yb; y = y.tail }
            }
            out ++= x
            out ++= y
            out.result()
          }
          val prev = state.getOption match {
            case Some(s) => s.copy(
              lastObsTs = incoming.foldLeft(s.lastObsTs)((m, o) => math.max(m, o.ts_ms)),
              pending = merge(s.pending, incoming.sortBy(o => (o.ts_ms, o.price))))
            case None =>
              val sorted = incoming.sortBy(o => (o.ts_ms, o.price))
              // anchor at the first observation ever seen for the key
              val anchor = sorted.head.ts_ms
              TickerState(anchor, anchor, None, sorted.map(_.ts_ms).max, sorted)
          }
          // the idle cap bounds BOTH state and carry output: no tick is
          // ever emitted past lastObs + idleTimeout, and once the watermark
          // confirms nothing newer can arrive, the key's state drops
          val tickCeiling = math.min(wm, prev.lastObsTs + idleTimeoutMs)
          var nextGrid = prev.nextGridTs
          var lastPrice = prev.lastPrice
          var pending = prev.pending
          val out = scala.collection.mutable.ArrayBuffer.empty[Tick]
          // drain every grid instant the watermark has finalized: no
          // admissible observation at or before it can still arrive
          while (nextGrid <= tickCeiling) {
            var fresh = false
            while (pending.nonEmpty && pending.head.ts_ms <= nextGrid) {
              lastPrice = Some(pending.head.price)
              if (pending.head.ts_ms > nextGrid - stepMs) fresh = true
              pending = pending.tail
            }
            lastPrice.foreach(p => out += Tick(symbol, nextGrid, p, fresh))
            nextGrid += stepMs
          }
          if (wm > prev.lastObsTs + idleTimeoutMs) {
            // idle past the cap and fully drained: a later observation
            // restarts the key like a first-seen one (fresh anchor)
            state.remove()
          } else {
            state.update(TickerState(
              prev.anchorTs, nextGrid, lastPrice, prev.lastObsTs, pending))
            // wake when the watermark passes the next due tick (or the idle
            // cap), even if this key sees no further input (timeout must
            // sit above the watermark)
            state.setTimeoutTimestamp(
              math.max(math.min(nextGrid, prev.lastObsTs + idleTimeoutMs + 1), wm + 1))
          }
          out.iterator
        })
  }
}
