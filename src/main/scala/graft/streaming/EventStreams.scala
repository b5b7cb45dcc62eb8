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

  /** Keyed state for [[sessionize]]. Public: Spark's generated state
    * encoder calls the field accessors from compiled bytecode, which a
    * Scala-private class hides from Janino.
    */
  case class OpenSession(startMs: Long, lastMs: Long, n: Long, total: Double)

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
    * user inactivity. Open sessions live in keyed state; the event-time
    * timeout (driven by the watermark) flushes a session once no on-time
    * event can extend it. Emits only closed sessions (Append mode).
    *
    * The input must already carry a watermark on `ts`.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user, batch, state) => updateUser(user, batch, state, gapSeconds * 1000L))
  }

  private def toSession(user: Long, s: OpenSession): Session =
    Session(user, new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs),
      s.n, s.total)

  private def updateUser(
      user: Long,
      batch: Iterator[Event],
      state: GroupState[OpenSession],
      gapMs: Long): Iterator[Session] = {
    if (batch.isEmpty && state.hasTimedOut) {
      // watermark passed last-event + gap: the open session can't grow
      val closed = state.getOption.map(toSession(user, _))
      state.remove()
      return closed.iterator
    }
    // within one micro-batch, order by event time (iterator order is not)
    val evs = batch.toVector.sortBy(e => (e.ts.getTime, e.event_id))
    val out = Vector.newBuilder[Session]
    var cur = state.getOption
    evs.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.lastMs <= gapMs =>
          cur = Some(OpenSession(s.startMs, math.max(s.lastMs, t), s.n + 1, s.total + e.value))
        case Some(s) =>
          out += toSession(user, s)
          cur = Some(OpenSession(t, t, 1, e.value))
        case None =>
          cur = Some(OpenSession(t, t, 1, e.value))
      }
    }
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.lastMs + gapMs)
    }
    out.result().iterator
  }
}
