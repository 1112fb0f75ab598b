package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization with EXPLICIT keyed state — the
  * `flatMapGroupsWithState` + event-time-timer re-expression of Spark's
  * native `session_window` (EventStreams.sessionCents), built for shapes
  * the built-in cannot carry (per-session custom payloads, mid-session
  * emission policies, cross-session features). Semantics are pinned to the
  * built-in's merge rule, verified empirically and in SessionizerSpec:
  * an event MERGES into a session when its distance from the session
  * interval is ≤ gap (boundary inclusive — an event at exactly
  * `last + gap` extends the session), and a closed session's end is
  * `last event time + gap`.
  *
  * State per key is the OPEN SESSION SET — a sorted list of disjoint
  * event-interval summaries `(startUs, lastUs, n, cents)` — exactly the
  * state Spark's MergingSessions operator keeps, so a late-but-admitted
  * event that lands BETWEEN two open sessions bridges them into one
  * (interval merge), not just extends the latest. A session closes only
  * when the WATERMARK proves no admissible event can still reach it
  * (`lastUs + gap ≤ watermark`): emission happens exclusively in the
  * event-time-timeout branch, never on within-batch evidence, because a
  * future batch may legally deliver a bridging event for any session the
  * watermark has not yet passed.
  *
  * Timer discipline: one armed deadline per key = the EARLIEST open
  * session's close time (`min(lastUs) + gap`), re-armed on every data
  * batch and on every partial close; clamped strictly ahead of the current
  * watermark (Spark rejects a deadline at or behind it). A timeout firing
  * early on the ms-truncated clock is harmless — the branch re-checks each
  * session against the µs watermark and re-arms for the remainder.
  *
  * Scale notes: state is hash-partitioned by key across
  * `spark.sql.shuffle.partitions`; per-key state is O(open sessions), gap-
  * and watermark-bounded, independent of history length. Event times ride
  * as explicit MICROSECOND longs (`us`) next to the watermark TIMESTAMP
  * column: `GroupState`'s clock surface is ms-granular, but session bounds
  * must be exact to the stored µs for the DuckDB oracle to hash-match.
  */
object Sessionizer {

  /** Input row: `ts` carries the watermark; `us` is the SAME instant as an
    * exact epoch-µs long (the state arithmetic never touches ms-truncated
    * `Timestamp.getTime`).
    */
  final case class SessionEvent(ts: java.sql.Timestamp, us: Long, user_id: Long, cents: Long)

  /** One open session: event-interval summary. `lastUs` is the latest
    * event's time (close = `lastUs + gap`), NOT the session end.
    */
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long, cents: Long)

  /** A closed session, bounds in epoch-µs (callers render timestamps with
    * `timestamp_micros`).
    */
  final case class SessionRow(user_id: Long, start_us: Long, end_us: Long, n_events: Long, cents: Long)

  /** Fold `e` into the sorted disjoint session list: every session within
    * gap of the event (boundary inclusive on BOTH sides — the built-in's
    * merge rule) collapses with it into one. List stays sorted & disjoint.
    */
  private[streaming] def insert(open: List[OpenSession], e: SessionEvent, gapUs: Long): List[OpenSession] = {
    val (touch, rest) = open.partition(s => e.us >= s.startUs - gapUs && e.us <= s.lastUs + gapUs)
    val merged = touch.foldLeft(OpenSession(e.us, e.us, 1L, e.cents)) { (acc, s) =>
      OpenSession(math.min(acc.startUs, s.startUs), math.max(acc.lastUs, s.lastUs), acc.n + s.n, acc.cents + s.cents)
    }
    (merged :: rest).sortBy(_.startUs)
  }

  /** Per-key gap sessions over an event-time stream. Run with
    * `outputMode(Append)`; rows emit when the watermark closes a session.
    *
    * @param lateness watermark delay — events older than
    *                 `max(ts) − lateness` may be dropped by the engine;
    *                 the bounded-replay callers set it wide enough that
    *                 nothing is ever late.
    */
  def sessions(
      events: Dataset[SessionEvent],
      gap: java.time.Duration,
      lateness: java.time.Duration = java.time.Duration.ZERO
  ): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    val gapUs = gap.toMillis * 1000L
    events
      .withWatermark("ts", s"${lateness.toMillis} milliseconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[OpenSession], SessionRow](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (uid: Long, evs: Iterator[SessionEvent], state: GroupState[List[OpenSession]]) =>
        val wmMs = state.getCurrentWatermarkMs
        if (state.hasTimedOut) {
          // close every session the µs watermark has passed; keep the rest
          val wmUs             = wmMs * 1000L
          val open             = state.getOption.getOrElse(Nil)
          val (closed, stillOpen) = open.partition(s => s.lastUs + gapUs <= wmUs)
          if (stillOpen.isEmpty) state.remove()
          else {
            state.update(stillOpen)
            state.setTimeoutTimestamp(
              math.max(stillOpen.map(_.lastUs + gapUs).min / 1000L, wmMs + 1L))
          }
          closed.sortBy(_.startUs).iterator
            .map(s => SessionRow(uid, s.startUs, s.lastUs + gapUs, s.n, s.cents))
        } else {
          // merge the batch's events into the open set; emit nothing — only
          // the watermark may close a session
          val open = evs.foldLeft(state.getOption.getOrElse(Nil))((acc, e) => insert(acc, e, gapUs))
          state.update(open)
          state.setTimeoutTimestamp(
            math.max(open.map(_.lastUs + gapUs).min / 1000L, wmMs + 1L))
          Iterator.empty
        }
      }
  }
}
