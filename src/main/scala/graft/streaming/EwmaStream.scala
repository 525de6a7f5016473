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

  /** The batch ewmaFold's exact double sequence: seed = frame head, left
    * fold over the rest.
    */
  private def fold(frame: List[Double], alpha: Double): Double = {
    val decay = 1.0 - alpha
    rnd6(frame.tail.foldLeft(frame.head)((acc, x) => acc * decay + x * alpha))
  }

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
            var frame = prev.frame
            var lastTs = prev.lastTs
            var lastTie = prev.lastTie
            var dropped = prev.dropped
            val out = scala.collection.mutable.ArrayBuffer.empty[Feat]
            it.toSeq.sortBy(p => (p.ts_ms, p.trade_id)).foreach { p =>
              val stale =
                p.ts_ms < lastTs || (p.ts_ms == lastTs && p.trade_id <= lastTie)
              if (stale) dropped += 1
              else {
                frame = (frame :+ p.price).takeRight(lookback)
                val fast = fold(frame, fastAlpha)
                val slow = fold(frame, slowAlpha)
                out += Feat(
                  symbol, p.ts_ms, p.trade_id, p.price,
                  fast, slow, rnd6(fast - slow), dropped)
                lastTs = p.ts_ms
                lastTie = p.trade_id
              }
            }
            if (out.nonEmpty || dropped != prev.dropped) {
              state.update(EwmaState(frame.takeRight(lookback - 1), lastTs, lastTie, dropped))
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1,
                  math.max(lastTs, 0L) + idleTimeoutMs))
            }
            out.iterator
          }
        })
  }
}
