package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence-gap detection — the reference's gap_detector service
  * (SURVEY §2.5 W4, `services/gap_detector/README.md:24-38`): per key, track
  * the last seen sequence id and emit a gap event when the next id jumps by
  * more than the tolerance (dropped updates) or regresses (replay).
  *
  * Implemented with `flatMapGroupsWithState` — keyed state is ONE long per
  * key, so state size is O(keys) regardless of throughput; at-least-once
  * replays re-emit the same gap events (idempotent downstream via the gap
  * key). The batch analog is `operators.Windows.sequenceGaps`.
  */
object GapDetector {

  final case class SeqEvent(key: String, seq: Long, ts_ms: Long)
  final case class GapEvent(
      key: String,
      prev_seq: Long,
      seq: Long,
      gap: Long,
      kind: String, // "gap" | "regression"
      ts_ms: Long)

  def detect(
      events: Dataset[SeqEvent],
      tolerance: Long = 1L): Dataset[GapEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[SeqEvent], state: GroupState[Long]) => {
          val sorted = it.toSeq.sortBy(e => (e.seq, e.ts_ms))
          val out = scala.collection.mutable.ArrayBuffer.empty[GapEvent]
          var last = if (state.exists) Some(state.get) else None
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
          last.foreach(state.update)
          out.iterator
        })
  }
}
