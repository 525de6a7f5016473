package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming bounded-lookback EWMA/MACD — the ONLINE form of
  * [[graft.operators.Rolling.ewmaFeatures]] (w9), the smoothing the
  * reference's feature builder maintains per tick on the hot path
  * (`S3_SCHEMA.md:569-586` momentum family; the every-2 s `feat:` refresh).
  * Keyed state is the trailing `lookback−1` prices — a few hundred bytes
  * per live symbol — and each event emits its feature row immediately.
  *
  * Exactness contract: the fold is the identical IEEE double sequence the
  * batch op's `aggregate` HOF executes (seed = oldest frame price, left
  * fold of `acc·(1−α) + x·α`, HALF_UP rounding at 6 dp), so on in-order
  * input the streaming output is BIT-IDENTICAL to the batch op — the
  * parity spec asserts it row for row.
  *
  * Ordering contract: events must arrive in (ts, tieBreak) order PER KEY
  * across micro-batches — true of the journal-tailing sources, whose
  * offsets replay in capture order. Within a micro-batch the group sorts;
  * a cross-batch regression (an older tick after a newer one) restarts
  * nothing silently — the row is DROPPED and the count surfaces in the
  * emitted `late_dropped` field of the next row, mirroring the
  * last_update_id guard of [[BookState]].
  */
object EwmaStream {

  final case class Px(symbol: String, ts_ms: Long, trade_id: Long, price: Double)
  final case class EwmaState(
      frame: List[Double], // trailing <= lookback−1 prices, oldest first
      lastTs: Long,
      lastTie: Long,
      dropped: Long)
  final case class Feat(
      symbol: String,
      ts_ms: Long,
      trade_id: Long,
      price: Double,
      ewma_fast: Double,
      ewma_slow: Double,
      macd: Double,
      late_dropped: Long)

  private def rnd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  def features(
      ticks: Dataset[Px],
      fastAlpha: Double = graft.operators.Rolling.EwmaFastAlpha,
      slowAlpha: Double = graft.operators.Rolling.EwmaSlowAlpha,
      lookback: Int = graft.operators.Rolling.EwmaLookback,
      watermarkDelay: String = "10 minutes",
      idleTimeoutMs: Long = 3600000L): Dataset[Feat] = {
    require(lookback >= 1, s"lookback must be >= 1, got $lookback")
    import ticks.sparkSession.implicits._
    ticks
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", watermarkDelay)
      .as[Px]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (symbol: String, it: Iterator[Px], state: GroupState[EwmaState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(
              EwmaState(Nil, Long.MinValue, Long.MinValue, 0L))
            // The trailing frame as a primitive ring (r18, guide §1.2 step 2
            // per-task work): the List form rebuilt the whole frame per
            // EVENT (append + takeRight, both O(lookback)) and ran the two
            // folds over boxed doubles. The ring holds the identical
            // trailing window and foldRing walks it oldest-first with the
            // identical IEEE op sequence (seed = oldest, acc·(1−α) + x·α),
            // so every emitted value is bit-equal to the List fold — the
            // batch-parity spec still pins it against Rolling.ewmaFeatures.
            val cap = lookback
            val buf = new Array[Double](cap)
            var rStart = 0 // ring slot of the oldest frame element
            var rCount = 0
            prev.frame.foreach { v => buf((rStart + rCount) % cap) = v; rCount += 1 }
            def push(x: Double): Unit =
              if (rCount == cap) { buf(rStart) = x; rStart = (rStart + 1) % cap }
              else { buf((rStart + rCount) % cap) = x; rCount += 1 }
            def foldRing(alpha: Double): Double = {
              val decay = 1.0 - alpha
              var acc = buf(rStart)
              var i = 1
              while (i < rCount) {
                acc = acc * decay + buf((rStart + i) % cap) * alpha
                i += 1
              }
              rnd6(acc)
            }
            var lastTs = prev.lastTs
            var lastTie = prev.lastTie
            var dropped = prev.dropped
            val out = scala.collection.mutable.ArrayBuffer.empty[Feat]
            it.toSeq.sortBy(p => (p.ts_ms, p.trade_id)).foreach { p =>
              val stale =
                p.ts_ms < lastTs || (p.ts_ms == lastTs && p.trade_id <= lastTie)
              if (stale) dropped += 1
              else {
                push(p.price)
                val fast = foldRing(fastAlpha)
                val slow = foldRing(slowAlpha)
                out += Feat(
                  symbol, p.ts_ms, p.trade_id, p.price,
                  fast, slow, rnd6(fast - slow), dropped)
                lastTs = p.ts_ms
                lastTie = p.trade_id
              }
            }
            if (out.nonEmpty || dropped != prev.dropped) {
              // last lookback−1 frame elements, oldest first — what
              // frame.takeRight(lookback − 1) kept on the List path
              val keep = math.min(rCount, lookback - 1)
              var kept = List.empty[Double]
              var idx = rCount - 1
              while (idx >= rCount - keep) {
                kept = buf((rStart + idx) % cap) :: kept
                idx -= 1
              }
              state.update(EwmaState(kept, lastTs, lastTie, dropped))
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1,
                  math.max(lastTs, 0L) + idleTimeoutMs))
            }
            out.iterator
          }
        })
  }
}
