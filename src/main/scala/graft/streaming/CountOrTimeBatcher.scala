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
  * The whole pending set (carried buffer + new arrivals) is ordered by
  * (ts, payload) before slicing, so count-flush contents don't depend on
  * how arrivals were split across micro-batches; time-flush batches are as
  * deterministic as wall-clock flushes can be — same contract as the
  * reference. `batch_id` is seeded from the epoch's first event time and
  * increments per flush, so a re-created epoch (after a drained/idle key's
  * state is removed) resumes from a larger id than the old epoch's seed —
  * BEST-EFFORT uniqueness, not a guarantee: it holds only while the new
  * epoch's first `ts_ms` exceeds the old epoch's seed plus its flush count,
  * so a key that drains and re-forms within a few milliseconds, or replayed
  * event times, can reuse ids. Sinks that need a true per-key unique key
  * should use (key, batch_id, first_ts) or an idempotent upsert on content.
  */
object CountOrTimeBatcher {

  final case class Item(key: String, ts_ms: Long, payload: String)

  /** `deadlineMs` is the processing-time instant by which the buffered
    * remainder must time-flush. It is set when the buffer (re)starts — first
    * item after empty, or the remainder left behind by a count-flush — and
    * PRESERVED across micro-batches that merely append to a non-empty
    * buffer. The reference (`stream_aggregator.py` `_aggregation_loop`)
    * bounds staleness from the last flush, not the last arrival; re-arming
    * from each arrival would let a steady sub-threshold trickle defer the
    * oldest item by up to (maxCount-1) inter-arrival gaps.
    */
  final case class Buffer(items: List[Item], nextBatchId: Long, deadlineMs: Long)

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

  /** Pure per-key transition: fold `newItems` into `buf0` at processing time
    * `nowMs`, emitting full count-batches and the surviving buffer (None =
    * state should be removed). Factored out of the stateful closure so the
    * deadline algebra is unit-testable without a streaming query.
    */
  private[graft] def onInput(
      key: String,
      buf0: Buffer,
      newItems: Seq[Item],
      nowMs: Long,
      maxCount: Int,
      maxDelayMs: Long): (Seq[Batch], Option[Buffer]) = {
    var pending = (buf0.items ++ newItems).sortBy(e => (e.ts_ms, e.payload))
    var nextId = buf0.nextBatchId
    val out = scala.collection.mutable.ArrayBuffer.empty[Batch]
    while (pending.lengthCompare(maxCount) >= 0) {
      val (full, rest) = pending.splitAt(maxCount)
      out += mk(key, nextId, full, "count")
      nextId += 1
      pending = rest
    }
    if (pending.isEmpty) (out.toSeq, None)
    else {
      // Keep the existing deadline only if the buffer was non-empty and no
      // flush happened this batch; a count-flush resets the staleness clock
      // (the remainder was just "flushed past"), same as the reference.
      val deadline =
        if (buf0.items.nonEmpty && out.isEmpty) buf0.deadlineMs
        else nowMs + maxDelayMs
      (out.toSeq, Some(Buffer(pending, nextId, deadline)))
    }
  }

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
            val now = state.getCurrentProcessingTimeMs()
            val newItems = it.toSeq
            // fresh epoch: seed the id sequence from the earliest event time
            // so ids never restart at 0 after a drained key's state expires
            val buf0 = state.getOption.getOrElse(
              Buffer(Nil, if (newItems.isEmpty) 0L else newItems.map(_.ts_ms).min, 0L))
            val (out, next) = onInput(key, buf0, newItems, now, maxCount, maxDelayMs)
            next match {
              case Some(b) =>
                state.update(b)
                // Spark clears a group's timeout on every invocation, so
                // re-arm with the REMAINING time to the stored deadline —
                // not a fresh maxDelayMs from this arrival.
                state.setTimeoutDuration(math.max(1L, b.deadlineMs - now))
              case None =>
                state.remove()
            }
            out.iterator
          }
        })
  }
}
