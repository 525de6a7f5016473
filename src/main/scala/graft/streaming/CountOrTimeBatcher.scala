package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Count-OR-time micro-batching — SURVEY §2.4 A11, the reference's producer
  * buffer (flush when `count >= N` OR `T` elapsed,
  * `stream_aggregator.py:142-171` and the batched Kinesis producer K1).
  *
  * Spark's trigger model batches the whole QUERY by time; the reference's
  * contract is per-key: a hot key must flush on count without waiting for
  * the interval, a cold key must flush on time without reaching the count.
  * That per-key semantics is exactly keyed state: `flatMapGroupsWithState`
  * buffers per key and emits a [[Batch]] when the count threshold is hit
  * in-batch, or on a `ProcessingTimeTimeout` for stragglers.
  *
  * State is O(live keys × maxCount) items; an idle key's remainder flushes
  * on its timeout and the state is removed, so idle keys cost nothing.
  * Replays re-emit deterministic count-flush batches (items are ordered by
  * (ts, payload) before slicing); time-flush batches are as deterministic
  * as wall-clock flushes can be — same contract as the reference.
  */
object CountOrTimeBatcher {

  final case class Item(key: String, ts_ms: Long, payload: String)
  final case class Buffer(items: List[Item], nextBatchId: Long)
  final case class Batch(
      key: String,
      batch_id: Long,
      n: Int,
      first_ts: Long,
      last_ts: Long,
      payloads: Seq[String],
      flush_reason: String) // "count" | "time"

  private def mk(key: String, id: Long, items: Seq[Item], reason: String): Batch =
    Batch(
      key, id, items.length,
      items.iterator.map(_.ts_ms).min, items.iterator.map(_.ts_ms).max,
      items.map(_.payload), reason)

  def batches(
      items: Dataset[Item],
      maxCount: Int = 10,
      maxDelayMs: Long = 5000L): Dataset[Batch] = {
    import items.sparkSession.implicits._
    items
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (key: String, it: Iterator[Item], state: GroupState[Buffer]) => {
          if (state.hasTimedOut) {
            val buf = state.get
            state.remove()
            if (buf.items.nonEmpty)
              Iterator.single(mk(key, buf.nextBatchId, buf.items, "time"))
            else Iterator.empty
          } else {
            val buf0 = state.getOption.getOrElse(Buffer(Nil, 0L))
            var pending = buf0.items ++ it.toSeq.sortBy(e => (e.ts_ms, e.payload))
            var nextId = buf0.nextBatchId
            val out = scala.collection.mutable.ArrayBuffer.empty[Batch]
            while (pending.lengthCompare(maxCount) >= 0) {
              val (full, rest) = pending.splitAt(maxCount)
              out += mk(key, nextId, full, "count")
              nextId += 1
              pending = rest
            }
            if (pending.nonEmpty) {
              state.update(Buffer(pending, nextId))
              state.setTimeoutDuration(maxDelayMs)
            } else {
              state.remove()
            }
            out.iterator
          }
        })
  }
}
