package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` schema. Batch and
  * stream share plan shapes: `windowedTypeCounts` runs unchanged on a
  * static DataFrame or a `readStream` source (watermark applied only when
  * streaming), and `sessionize` is the streaming counterpart of the
  * `e2_sessionize` batch query (same 30-minute-gap semantics, expressed as
  * `flatMapGroupsWithState` because an unbounded stream can't use a global
  * window sort).
  *
  * Scale: state is per-user and O(1) per key (one open session), the
  * watermark bounds state retention, and the shuffle key is `user_id` —
  * the same partitioning a 1000-executor cluster would use. No collect,
  * no driver state.
  */
object EventStreams {

  case class Event(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long,
      sum_value: Double)

  /** One buffered event in [[sessionize]] keyed state. Public: Spark's
    * generated state encoder calls accessors from compiled bytecode, which
    * a Scala-private class hides from Janino.
    */
  case class BufferedEvent(tsMs: Long, eventId: Long, value: Double)

  /** Keyed state for [[sessionize]]: events not yet sealed by the
    * watermark. Bounded — the flush emits and discards everything more
    * than one gap behind the watermark.
    */
  case class SessionBuffer(events: Seq[BufferedEvent])

  /** Tumbling 1-hour counts and sums per event type. On a streaming input
    * the watermark lets Spark finalize windows and bound state; on a batch
    * input the identical plan runs without it.
    */
  def windowedTypeCounts(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Streaming exact dedup: drop events whose `event_id` was already seen,
    * with state bounded by the watermark (an id older than the watermark
    * can no longer collide with an on-time arrival, so its state entry is
    * dropped). The streaming counterpart of `Dedup.exact` — at-least-once
    * sources become effectively-once sinks.
    */
  def dedupStream(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming sessionization: a session closes after `gapSeconds` of
    * user inactivity. Events are BUFFERED in keyed state until the
    * watermark seals them — a session is only emitted once the watermark
    * has passed its end + gap, at which point no admissible (on-time)
    * event can extend or split it. This keeps streaming output identical
    * to the batch `e2_sessionize` window SQL even for out-of-order arrival
    * across micro-batches; state per user is bounded by the watermark
    * horizon. Emits closed sessions only (Append mode).
    *
    * The input must already carry a watermark on `ts`.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuffer, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user, batch, state) => updateUser(user, batch, state, gapSeconds * 1000L))
  }

  private def updateUser(
      user: Long,
      batch: Iterator[Event],
      state: GroupState[SessionBuffer],
      gapMs: Long): Iterator[Session] = {
    val buffered = state.getOption.map(_.events).getOrElse(Seq.empty)
    val incoming = batch.map(e => BufferedEvent(e.ts.getTime, e.event_id, e.value)).toVector
    val all = (buffered ++ incoming).sortBy(e => (e.tsMs, e.eventId))
    if (all.isEmpty) { state.remove(); return Iterator.empty }

    // group into gap-delimited sessions over the full (sorted) buffer
    val sessions = all.foldLeft(Vector.empty[Vector[BufferedEvent]]) { (acc, e) =>
      if (acc.nonEmpty && e.tsMs - acc.last.last.tsMs <= gapMs)
        acc.init :+ (acc.last :+ e)
      else acc :+ Vector(e)
    }
    val wm = state.getCurrentWatermarkMs()
    // sessions are time-ordered and disjoint by > gap, so the sealed ones
    // (watermark beyond end + gap: nothing on-time can extend them) form a
    // prefix
    val (closed, open) = sessions.partition(s => wm > s.last.tsMs + gapMs)
    if (open.isEmpty) state.remove()
    else {
      state.update(SessionBuffer(open.flatten))
      // wake when the earliest open session becomes sealable
      state.setTimeoutTimestamp(math.max(open.head.last.tsMs + gapMs + 1, wm + 1))
    }
    closed.iterator.map { s =>
      Session(user, new java.sql.Timestamp(s.head.tsMs), new java.sql.Timestamp(s.last.tsMs),
        s.size.toLong, s.map(_.value).sum)
    }
  }
}
