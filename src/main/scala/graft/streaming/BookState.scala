package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming order-book maintenance from depth deltas — the reference's hot
  * path applies `DepthDelta` updates to a per-symbol book and serves the
  * top-10 levels + metrics from the `ob:{symbol}` Redis hash
  * (`docs/architecture/DATA_PIPELINE.md:84-120`; ingest validates
  * `last_update_id` monotonicity). Implemented with
  * `flatMapGroupsWithState`: keyed state is the live level map (price→qty
  * per side) plus the last applied update id, so state is O(live levels per
  * symbol) — the exchange's price grid, not the event count — and stale or
  * replayed deltas (update id ≤ last applied) are dropped exactly as the
  * reference's sequence validation does. One snapshot row is emitted per
  * (symbol, micro-batch) that touched the book — the streaming analog of a
  * Redis HSET per batch, idempotent under at-least-once replay because a
  * replayed delta is a no-op on the id guard.
  *
  * The batch replay twin ([[graft.operators.BookReplay]]) produces the
  * identical end state from the same delta log (spec-asserted), which is
  * the audit path: state can be rebuilt from bronze at any time.
  */
object BookState {

  final case class Delta(
      symbol: String,
      update_id: Long,
      ts_ms: Long,
      side: String, // "bid" | "ask"
      price: Double,
      qty: Double) // replaces the level; 0 deletes it

  final case class Book(
      bids: Map[Double, Double],
      asks: Map[Double, Double],
      lastUpdateId: Long,
      lastTsMs: Long)

  final case class Snapshot(
      symbol: String,
      ts_ms: Long,
      last_update_id: Long,
      best_bid: Option[Double],
      best_ask: Option[Double],
      spread: Option[Double],
      spread_bp: Option[Double], // vs the simple mid, 4 dp
      // INTENTIONAL divergence from the batch surface: these count the FULL
      // live map (state-size observability — how much book a symbol holds),
      // while BookReplay.metrics' bid_levels/ask_levels count only levels
      // within top-`depth`. The `live_` prefix marks the difference; the
      // batch-comparable value is min(live_*_levels, depth), asserted in
      // BookStateSpec's parity test.
      live_bid_levels: Int,
      live_ask_levels: Int,
      bid_value_sum: Double, // Σ price·qty over the emitted top-N
      ask_value_sum: Double,
      ob_imbalance: Option[Double], // value imbalance over the top-N, 6 dp
      weighted_mid: Option[Double], // size-weighted mid (microprice), 6 dp
      bids: Seq[(Double, Double)], // top-N best-first (price, qty)
      asks: Seq[(Double, Double)])

  /** A depth SNAPSHOT — the re-anchor service's REST fetch
    * (`re_anchor_service/README.md:36-60`: on a gap, fetch the full book +
    * its lastUpdateId, then resume applying deltas newer than it) — as
    * synthetic deltas feedable through [[maintain]]: level i carries
    * `update_id = asOfUpdateId - n + 1 + i`, so the whole snapshot applies
    * in order and leaves the frontier EXACTLY at `asOfUpdateId`; real
    * deltas with id > asOfUpdateId then apply on top, and replayed older
    * ones stay no-ops. This is how a post-eviction PARTIAL book (the
    * documented delta-feed limitation: deltas cannot reconstruct levels
    * they never touch) becomes provably complete again — composed
    * end-to-end in BookStateSpec against [[graft.operators.BookReplay]].
    *
    * Preconditions (both from the Binance contract, both loud in the spec):
    * `asOfUpdateId - (bids.size + asks.size)` ≥ the already-applied
    * frontier (the snapshot must be newer than everything applied), and
    * any level the partial book holds must appear in the snapshot (sets
    * cannot delete; on a feed where post-gap deltas may touch levels the
    * snapshot no longer has, re-anchor into a FRESH query instead).
    */
  def snapshotDeltas(
      symbol: String,
      bids: Seq[(Double, Double)],
      asks: Seq[(Double, Double)],
      asOfUpdateId: Long,
      tsMs: Long): Seq[Delta] = {
    val all = bids.map(l => ("bid", l)) ++ asks.map(l => ("ask", l))
    require(all.nonEmpty, "empty snapshot")
    val base = asOfUpdateId - all.size
    all.zipWithIndex.map { case ((side, (price, qty)), i) =>
      Delta(symbol, base + 1 + i, tsMs, side, price, qty)
    }
  }

  def maintain(
      deltas: Dataset[Delta],
      depth: Int = 10,
      watermarkDelay: String = "10 minutes",
      idleTimeoutMs: Long = 3600000L): Dataset[Snapshot] = {
    import deltas.sparkSession.implicits._
    deltas
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", watermarkDelay)
      .as[Delta]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (symbol: String, it: Iterator[Delta], state: GroupState[Book]) => {
          if (state.hasTimedOut) {
            // evict the BULK of an idle symbol's state (the level maps) but
            // keep the update-id frontier as a ~32-byte tombstone — a full
            // remove() would reset the frontier and let an at-least-once
            // source REPLAY pre-eviction deltas into the empty book,
            // breaking the documented no-op guard. No new timeout is armed,
            // so the tombstone costs nothing further. NOTE a post-eviction
            // book rebuilt from deltas alone is PARTIAL until a snapshot
            // re-anchor (the reference's re_anchor_service flow, composed
            // in EtlLifecycleSpec) — deltas cannot reconstruct levels they
            // never touch, which is true of any delta-feed consumer.
            state.getOption.foreach(prev =>
              state.update(Book(Map.empty, Map.empty, prev.lastUpdateId, prev.lastTsMs)))
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(Book(Map.empty, Map.empty, Long.MinValue, 0L))
            // per-batch MUTABLE level maps (r18, guide §1.2 step 2): the
            // immutable `updated`/`-` forms allocated a fresh HAMT path per
            // DELTA; one copy-in/copy-out per batch bounds the immutable
            // work by the level count instead of the delta count. Content
            // (and therefore every emitted metric) is identical.
            val bidsM = scala.collection.mutable.HashMap.empty[Double, Double]
            bidsM ++= prev.bids
            val asksM = scala.collection.mutable.HashMap.empty[Double, Double]
            asksM ++= prev.asks
            var lastId = prev.lastUpdateId
            var lastTs = prev.lastTsMs
            var touched = false
            // total update-id order WITHIN the batch; ids at or below the
            // already-applied frontier are replays/stale — dropped, so a
            // re-delivered micro-batch cannot corrupt the book
            it.toSeq.sortBy(_.update_id).foreach { d =>
              if (d.update_id > lastId) {
                val applied =
                  if (d.side == "bid")
                    { if (d.qty > 0) bidsM(d.price) = d.qty else bidsM.remove(d.price); true }
                  else if (d.side == "ask")
                    { if (d.qty > 0) asksM(d.price) = d.qty else asksM.remove(d.price); true }
                  else false
                if (applied) {
                  lastId = d.update_id
                  lastTs = math.max(lastTs, d.ts_ms)
                  touched = true
                }
              }
            }
            if (touched) {
              val bids = bidsM.toMap
              val asks = asksM.toMap
              state.update(Book(bids, asks, lastId, lastTs))
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, lastTs + idleTimeoutMs))
              val topBids = bids.toSeq.sortBy(-_._1).take(depth)
              val topAsks = asks.toSeq.sortBy(_._1).take(depth)
              val bb = topBids.headOption.map(_._1)
              val ba = topAsks.headOption.map(_._1)
              // the ob:{symbol} metric fields (DATA_PIPELINE.md:96-120),
              // same formulas + rounding as the batch BookReplay.metrics so
              // the two surfaces are comparable row-for-row (except the
              // live_*_levels pair — full-map counts by design, see Snapshot)
              def rnd(x: Double, dp: Int): Double =
                BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
              // per-element 8-dp decimal rounding then exact decimal sum —
              // the same value DECIMAL(27,8) accumulation produces in batch,
              // so sums are order-free and bit-comparable across surfaces
              def valueSum(side: Seq[(Double, Double)]): Double =
                side.iterator.map { case (p, v) =>
                  BigDecimal(p * v).setScale(8, BigDecimal.RoundingMode.HALF_UP)
                }.foldLeft(BigDecimal(0))(_ + _).toDouble
              val bv = valueSum(topBids)
              val av = valueSum(topAsks)
              val spread = for (b <- bb; a <- ba) yield a - b
              val spreadBp = for (b <- bb; a <- ba)
                yield rnd((a - b) / ((a + b) / 2.0) * 10000.0, 4)
              val imb =
                if (bv + av == 0.0) None else Some(rnd((bv - av) / (bv + av), 6))
              val wMid = for {
                (bp, bq) <- topBids.headOption
                (ap, aq) <- topAsks.headOption
                if bq + aq != 0.0
              } yield rnd((bp * aq + ap * bq) / (bq + aq), 6)
              Iterator.single(Snapshot(
                symbol, lastTs, lastId, bb, ba, spread, spreadBp,
                bids.size, asks.size, bv, av, imb, wMid, topBids, topAsks))
            } else Iterator.empty
          }
        })
  }
}
