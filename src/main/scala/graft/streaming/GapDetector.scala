package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence-gap detection — the reference's gap_detector service
  * (SURVEY §2.5 W4, `services/gap_detector/README.md:24-38`): per key, track
  * the last seen sequence id and emit a gap event when the next id jumps by
  * more than the tolerance (dropped updates) or regresses (replay).
  *
  * Implemented with `flatMapGroupsWithState` — keyed state is one (seq, ts)
  * pair per key, so state size is O(live keys) regardless of throughput, and
  * `EventTimeTimeout` evicts keys idle past `idleTimeoutMs` as the watermark
  * passes them: on a keyspace that churns (instruments, users), state stays
  * bounded by the ACTIVE key set instead of growing forever. At-least-once
  * replays re-emit the same gap events (idempotent downstream via the gap
  * key). The batch analog is `operators.Windows.sequenceGaps`.
  */
object GapDetector {

  final case class SeqEvent(key: String, seq: Long, ts_ms: Long)
  final case class SeqState(lastSeq: Long, lastTsMs: Long)
  final case class GapEvent(
      key: String,
      prev_seq: Long,
      seq: Long,
      gap: Long,
      kind: String, // "gap" | "regression"
      ts_ms: Long)

  /** @param watermarkDelay how long to admit late events (event time)
    * @param idleTimeoutMs  a key whose newest event is older than the
    *                       watermark by this much is evicted; a later event
    *                       for it starts from fresh state (no gap emitted,
    *                       same as a first-seen key)
    */
  def detect(
      events: Dataset[SeqEvent],
      tolerance: Long = 1L,
      watermarkDelay: String = "10 minutes",
      idleTimeoutMs: Long = 3600000L): Dataset[GapEvent] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", watermarkDelay)
      .as[SeqEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, it: Iterator[SeqEvent], state: GroupState[SeqState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // EVENT-TIME order (matching the batch analog's window ordering):
            // a replayed old id arriving after newer events must surface as a
            // regression even when both land in one micro-batch — seq-order
            // sorting would silently launder it into forward progress, and
            // the emitted events would depend on micro-batch boundaries.
            val sorted = it.toSeq.sortBy(e => (e.ts_ms, e.seq))
            val out = scala.collection.mutable.ArrayBuffer.empty[GapEvent]
            var last = state.getOption.map(_.lastSeq)
            sorted.foreach { e =>
              last.foreach { prev =>
                val jump = e.seq - prev
                if (jump > tolerance)
                  out += GapEvent(key, prev, e.seq, jump, "gap", e.ts_ms)
                else if (jump < 0)
                  out += GapEvent(key, prev, e.seq, jump, "regression", e.ts_ms)
              }
              last = Some(math.max(e.seq, last.getOrElse(Long.MinValue)))
            }
            val maxTs = sorted.iterator.map(_.ts_ms).max
            last.foreach(s => state.update(SeqState(s, maxTs)))
            // timeout must sit strictly above the current watermark
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1, maxTs + idleTimeoutMs))
            out.iterator
          }
        })
  }
}
