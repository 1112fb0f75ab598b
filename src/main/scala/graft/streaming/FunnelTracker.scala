package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The q191 sequential conversion funnel (view → click → purchase, each
  * stage strictly after the previous and within a step bound, completion
  * within a horizon of the first view) as a STATEFUL STREAM —
  * `flatMapGroupsWithState` + event-time timers, the Sessionizer machinery
  * applied to ordered-pattern state instead of interval-merge state. The
  * batch build (`EventQueries` q191) is a cascade of key-shuffled
  * re-aggregations; here each user carries a tiny state record and emits
  * exactly one row when the WATERMARK proves the funnel can no longer
  * change.
  *
  * Finality rule: t2 ∈ (t1, t1+step] and t3 ∈ (t2, t2+step], so every
  * event that can influence the user's row is ≤ t1 + 2·step. The row is
  * emitted (and the state dropped) on the first timeout firing with
  * watermark strictly past t1 + 2·step — by then the watermark contract
  * says every qualifying event has been folded in.
  *
  * Out-of-order safety (the reason the state buffers candidate stage
  * events instead of greedily resolving t2/t3): t1 = min view time can
  * only DECREASE while the funnel is open, and each decrease shifts the
  * click window (t1, t1+step] LEFT — so a click discarded against an early
  * t1 estimate could become qualifying, and one kept could fall out. The
  * state therefore keeps every click/purchase that could still qualify
  * under ANY reachable final t1 and resolves the chain once, at emission.
  * [[prune]] keeps that buffer bounded: `floor = min(t1, watermark)` is a
  * lower bound on the final t1 (any view still in flight is at/after the
  * watermark), so events at/below it can never strictly follow t1, and
  * events past the (only-tightening) step bounds can never qualify —
  * steady-state buffered span per user ≤ 2·step of events, independent of
  * history length, the per-key state bound a 100 TB deployment sizes for.
  *
  * Scale notes: state is hash-partitioned by user across
  * `spark.sql.shuffle.partitions`; non-funnel event types are filtered at
  * the SOURCE (before the key shuffle) by the caller. Event times ride as
  * exact epoch-µs longs next to the watermark TIMESTAMP column —
  * `GroupState`'s clock is ms-granular, but stage bounds must be µs-exact
  * for the DuckDB oracle to hash-match (the Sessionizer discipline).
  */
object FunnelTracker {

  /** Input row: `ts` carries the watermark; `us` is the same instant as an
    * exact epoch-µs long.
    */
  final case class FunnelEvent(ts: java.sql.Timestamp, us: Long, user_id: Long, event_type: String)

  /** Per-user open funnel. `t1` = Long.MaxValue until the first view
    * arrives; `clicks`/`purchases` buffer the still-qualifiable candidate
    * stage times (see class doc). `done` = the row has emitted: the state
    * becomes an empty TOMBSTONE so a view arriving after emission (always
    * later than t1 — it passed the watermark that closed the funnel)
    * cannot re-enter the user and emit a second row; q191's one-row-per-
    * entrant/global-min-t1 contract holds under ANY batch delivery, not
    * just the single-batch bounded run. Tombstones are user-dimension
    * state — the irreducible memory of "first view EVER" semantics; the
    * `tombstoneTtlUs` parameter of [[funnels]] bounds them with an
    * entrant TTL (event-time: the tombstone is dropped once the watermark
    * passes close-deadline + TTL, after which a new view re-enters the
    * user as a fresh entrant — "first view ever" relaxes to "first view
    * within TTL", the standard production bound). Results within the TTL
    * horizon are byte-identical to the unbounded run (q199's gate).
    */
  final case class FunnelState(t1: Long, clicks: List[Long], purchases: List[Long], done: Boolean = false) {
    def isEmpty: Boolean = t1 == Long.MaxValue && clicks.isEmpty && purchases.isEmpty && !done
  }

  private[streaming] val NoView = Long.MaxValue

  /** Emitted funnel row, times in epoch-µs; 0 = the stage was not reached
    * (the q191 epoch-0 sentinel).
    */
  final case class FunnelRow(user_id: Long, t1_us: Long, t2_us: Long, t3_us: Long, stage: Long, completed: Long)

  /** Fold one event into the state. Bound checks against the CURRENT t1
    * are admission filters only (t1 may still decrease — final
    * qualification happens in [[resolve]]); they are safe because t1 only
    * decreases and both windows only move left.
    */
  private[streaming] def fold(st: FunnelState, e: FunnelEvent, stepUs: Long): FunnelState =
    e.event_type match {
      case "view" =>
        st.copy(t1 = math.min(st.t1, e.us))
      case "click" =>
        if (st.t1 == NoView || e.us <= st.t1 + stepUs) st.copy(clicks = e.us :: st.clicks) else st
      case "purchase" =>
        if (st.t1 == NoView || e.us <= st.t1 + 2 * stepUs) st.copy(purchases = e.us :: st.purchases) else st
      case _ => st // sentinel / non-funnel types never touch state
    }

  /** Drop buffered events that can never qualify under any reachable final
    * t1 (see class doc for the floor argument).
    */
  private[streaming] def prune(st: FunnelState, wmUs: Long, stepUs: Long): FunnelState = {
    val floor = math.min(st.t1, wmUs)
    FunnelState(
      st.t1,
      st.clicks.filter(c => c > floor && (st.t1 == NoView || c <= st.t1 + stepUs)),
      st.purchases.filter(p => p > floor && (st.t1 == NoView || p <= st.t1 + 2 * stepUs)),
      st.done)
  }

  /** Resolve the final funnel row from a closed state: first qualifying
    * click after t1, first qualifying purchase after that, q191's exact
    * bounds (strict `>` between stages, inclusive step/horizon bounds).
    * None when the user never viewed (never entered the funnel).
    */
  private[streaming] def resolve(
      uid: Long, st: FunnelState, stepUs: Long, horizonUs: Long): Option[FunnelRow] =
    if (st.t1 == NoView) None
    else {
      val t1 = st.t1
      val t2 = st.clicks.filter(c => c > t1 && c - t1 <= stepUs).minOption
      val t3 = t2.flatMap(t => st.purchases.filter(p => p > t && p - t <= stepUs).minOption)
      val stage = 1L + t2.size + t3.size
      val completed = if (t3.exists(_ - t1 <= horizonUs)) 1L else 0L
      Some(FunnelRow(uid, t1, t2.getOrElse(0L), t3.getOrElse(0L), stage, completed))
    }

  /** Saturating add for event-time deadlines (TTL = Long.MaxValue must
    * read as "never", not wrap negative).
    */
  private[streaming] def satAdd(a: Long, b: Long): Long = {
    val s = a + b
    if (((a ^ s) & (b ^ s)) < 0L) Long.MaxValue else s
  }

  /** Per-user funnel rows over an event-time stream; run with
    * `outputMode(Append)`. One row per user with ≥1 view, emitted when the
    * watermark passes `t1 + 2·step`.
    *
    * @param tombstoneTtlUs entrant TTL: once the watermark passes
    *        close-deadline (t1 + 2·step) + TTL, the emitted entrant's
    *        tombstone is REMOVED — state per key returns to zero — and a
    *        later view re-enters the user as a fresh entrant (a second
    *        row). Long.MaxValue (the default) keeps the exact
    *        one-row-per-entrant-EVER semantics at one tombstone per
    *        entrant of state. Any event at-or-before close+TTL is folded
    *        identically under both settings, so in-TTL results are
    *        byte-identical to the unbounded run.
    */
  def funnels(
      events: Dataset[FunnelEvent],
      stepUs: Long,
      horizonUs: Long,
      tombstoneTtlUs: Long = Long.MaxValue): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (uid: Long, evs: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
        val wmMs = state.getCurrentWatermarkMs
        val wmUs = wmMs * 1000L
        // Timer discipline (the Sessionizer's): deadline = funnel close
        // when t1 is known, else the earliest buffered event (so the
        // watermark's passage retires never-viewed buffers); clamped
        // strictly ahead of the ms watermark. An early fire on the
        // ms-truncated clock re-checks against the µs bound and re-arms.
        def arm(st: FunnelState): Unit = {
          val deadlineUs =
            if (st.t1 != NoView) st.t1 + 2 * stepUs
            else (st.clicks ++ st.purchases).min
          state.setTimeoutTimestamp(math.max(deadlineUs / 1000L + 1L, wmMs + 1L))
        }
        // The tombstone's event-time expiry (close-deadline + TTL); armTtl
        // re-arms it on every invocation that keeps the tombstone — the
        // Sessionizer timer discipline, clamped strictly past the ms clock.
        def ttlEndUs(st: FunnelState): Long = satAdd(st.t1 + 2 * stepUs, tombstoneTtlUs)
        def armTtl(st: FunnelState): Unit =
          if (tombstoneTtlUs != Long.MaxValue)
            state.setTimeoutTimestamp(math.max(ttlEndUs(st) / 1000L + 1L, wmMs + 1L))
        if (state.hasTimedOut) {
          val st = prune(state.get, wmUs, stepUs)
          if (st.done) {
            // tombstone: expire it once the watermark proves no in-TTL
            // event can still arrive; an early ms-clock fire re-arms
            if (tombstoneTtlUs != Long.MaxValue && wmUs > ttlEndUs(st)) state.remove()
            else armTtl(st)
            Iterator.empty
          } else if (st.t1 != NoView && wmUs > st.t1 + 2 * stepUs) {
            // final: every event ≤ t1 + 2·step has arrived (wm is strictly
            // past it, and the µs watermark is ≥ the ms-truncated wmUs).
            // Leave a tombstone, not remove(): a post-emission view (its
            // ts passed this watermark, so it is later than t1 and changes
            // nothing in q191's global-min semantics) must not re-open the
            // funnel and emit a duplicate row. With a finite TTL the
            // tombstone carries its own expiry timer.
            val tomb = FunnelState(st.t1, Nil, Nil, done = true)
            state.update(tomb)
            armTtl(tomb)
            resolve(uid, st, stepUs, horizonUs).iterator
          } else if (st.isEmpty) {
            state.remove()
            Iterator.empty
          } else {
            state.update(st); arm(st)
            Iterator.empty
          }
        } else {
          val st0 = state.getOption.getOrElse(FunnelState(NoView, Nil, Nil))
          val st =
            if (st0.done) st0 // emitted: ignore stragglers, keep the tombstone
            else prune(evs.foldLeft(st0)((a, e) => fold(a, e, stepUs)), wmUs, stepUs)
          if (st.isEmpty) { if (state.exists) state.remove() }
          else { state.update(st); if (!st.done) arm(st) else armTtl(st) }
          Iterator.empty
        }
      }
  }
}
