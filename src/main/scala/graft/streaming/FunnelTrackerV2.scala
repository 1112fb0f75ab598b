package graft.streaming

import graft.streaming.FunnelTracker.{FunnelEvent, FunnelRow, FunnelState, NoView}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo,
  ListState,
  OutputMode,
  StatefulProcessor,
  TTLConfig,
  TimeMode,
  TimerValues,
  ValueState
}

/** The q191 sequential conversion funnel on Spark 4's `transformWithState`
  * (state API v2, RocksDB provider) — the same contract as
  * [[FunnelTracker.funnels]] (one row per entrant, emitted when the
  * watermark strictly passes t1 + 2·step; post-emission tombstone;
  * optional event-time entrant TTL), the q203/q204 cross-proof discipline
  * applied to the LAST v1-only custom-state family: the q207/q208 board
  * rows byte-gate this implementation against q191's EXACT oracle at
  * 3 SFs across the two-epoch checkpoint split, so every custom-state
  * operator the engine owns is now proven on both state APIs.
  *
  * The kernel (fold admission bounds / prune floor / resolve chain and
  * their out-of-order-safety proofs) is SHARED with the v1 operator —
  * only the state machinery differs:
  *
  *   - GRANULAR TYPED STATE instead of one re-serialized blob: the
  *     candidate click/purchase buffers are `ListState[Long]` (appends
  *     merge into the store without rewriting the whole buffer — v1
  *     re-serializes the full `FunnelState` product on every fold), t1
  *     and the tombstone flag are `ValueState`s. The RocksDB batching
  *     rule (HotKeyStressSpec's measured superlinear-append pathology)
  *     applies verbatim: `handleInputRows` buffers each invocation's
  *     arrivals and writes ONE `appendList` per stage list per trigger.
  *   - RESOLUTION ONLY ON TIMERS: input handling does pure admission
  *     (the fold bounds checked against the invocation-final t1 — safe
  *     because t1 only decreases, so a reject against a SMALLER t1 is a
  *     reject against every reachable final t1; the floor half of
  *     [[FunnelTracker.prune]] is deferred to the timer pass, harmless
  *     because [[FunnelTracker.resolve]] re-checks `c > t1` itself) and
  *     keeps at most ONE armed timer per key, moved earlier only.
  *     `handleExpiredTimer` prunes, emits the funnel row once the
  *     watermark proves the close deadline passed, flips the state to
  *     the TOMBSTONE (t1 retained — it anchors the TTL deadline; the
  *     buffers clear), and under a finite TTL re-arms the tombstone's
  *     own expiry timer, after which the key holds ZERO bytes.
  *
  * State bound: identical to v1 (≤ 2·step of candidate events per open
  * funnel; one tombstone per emitted entrant, zero past close + TTL),
  * because the pruning kernel is identical.
  */
object FunnelTrackerV2 {

  /** At-most-one-armed-timer sentinel ([[AsofStreamV2]]'s NoTimer rule). */
  private val NoTimer = Long.MinValue

  final class FunnelProcessor(stepUs: Long, horizonUs: Long, tombstoneTtlUs: Long)
      extends StatefulProcessor[Long, FunnelEvent, FunnelRow] {

    @transient private var t1: ValueState[Long]         = _
    @transient private var clicks: ListState[Long]      = _
    @transient private var purchases: ListState[Long]   = _
    @transient private var done: ValueState[Boolean]    = _
    @transient private var armed: ValueState[Long]      = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      t1 = getHandle.getValueState[Long]("t1", Encoders.scalaLong, TTLConfig.NONE)
      clicks = getHandle.getListState[Long]("clicks", Encoders.scalaLong, TTLConfig.NONE)
      purchases = getHandle.getListState[Long]("purchases", Encoders.scalaLong, TTLConfig.NONE)
      done = getHandle.getValueState[Boolean]("done", Encoders.scalaBoolean, TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
    }

    /** One armed timer per key, moved EARLIER only (the firing pass
      * re-arms from the full remaining-deadline set, so a late deadline
      * can wait; an early one must not miss its proof instant).
      */
    private def arm(deadlineUs: Long, wmMs: Long): Unit = {
      val at  = math.max(deadlineUs / 1000L + 1L, wmMs + 1L)
      val cur = if (armed.exists()) armed.get() else NoTimer
      if (cur == NoTimer || at < cur) {
        if (cur != NoTimer) getHandle.deleteTimer(cur)
        getHandle.registerTimer(at)
        armed.update(at)
      }
    }

    /** The tombstone's event-time expiry (close-deadline + TTL). */
    private def ttlEndUs(t1Us: Long): Long =
      FunnelTracker.satAdd(t1Us + 2 * stepUs, tombstoneTtlUs)

    /** Pure admission — the v1 fold bounds against the invocation-final
      * t1, written as ONE `appendList` per stage list (the RocksDB
      * batching rule). A tombstoned key ignores stragglers entirely
      * (they passed the watermark that closed the funnel, so they are
      * later than t1 and change nothing — v1's exact rule).
      */
    override def handleInputRows(
        key: Long,
        rows: Iterator[FunnelEvent],
        timers: TimerValues
    ): Iterator[FunnelRow] = {
      if (done.exists() && done.get()) return Iterator.empty
      val cur = if (t1.exists()) t1.get() else NoView
      val vs  = scala.collection.mutable.ArrayBuffer.empty[Long]
      val cs  = scala.collection.mutable.ArrayBuffer.empty[Long]
      val ps  = scala.collection.mutable.ArrayBuffer.empty[Long]
      rows.foreach { e =>
        e.event_type match {
          case "view"     => vs += e.us
          case "click"    => cs += e.us
          case "purchase" => ps += e.us
          case _          => () // sentinel / non-funnel types never touch state
        }
      }
      val newT1 = math.min(cur, vs.minOption.getOrElse(NoView))
      val csAdm = cs.filter(c => newT1 == NoView || c <= newT1 + stepUs)
      val psAdm = ps.filter(p => newT1 == NoView || p <= newT1 + 2 * stepUs)
      if (newT1 != cur) t1.update(newT1)
      if (csAdm.nonEmpty) clicks.appendList(csAdm.toArray)
      if (psAdm.nonEmpty) purchases.appendList(psAdm.toArray)
      // v1's deadline rule: the funnel close when t1 is known, else the
      // earliest buffered arrival (its passage retires never-viewed
      // buffers); this invocation's contribution can only move it earlier
      val dMin =
        if (newT1 != NoView) newT1 + 2 * stepUs
        else (csAdm ++ psAdm).minOption.getOrElse(Long.MaxValue)
      if (dMin != Long.MaxValue) arm(dMin, timers.getCurrentWatermarkInMs)
      Iterator.empty
    }

    /** The shared v1 kernel pass: prune against the floor, emit the
      * funnel row once the watermark strictly passes t1 + 2·step, flip
      * to the tombstone, expire the tombstone past close + TTL.
      * Idempotent — an early ms-clock firing re-checks the µs bound and
      * re-arms.
      */
    override def handleExpiredTimer(
        key: Long,
        timers: TimerValues,
        expired: ExpiredTimerInfo
    ): Iterator[FunnelRow] = {
      armed.clear()
      val wmMs = timers.getCurrentWatermarkInMs
      val wmUs = wmMs * 1000L
      if (done.exists() && done.get()) {
        val t1Us = t1.get()
        if (tombstoneTtlUs != Long.MaxValue && wmUs > ttlEndUs(t1Us)) {
          t1.clear(); done.clear(); armed.clear()
        } else if (tombstoneTtlUs != Long.MaxValue) arm(ttlEndUs(t1Us), wmMs)
        Iterator.empty
      } else {
        val st0 = FunnelState(
          if (t1.exists()) t1.get() else NoView,
          clicks.get().toList,
          purchases.get().toList)
        val st = FunnelTracker.prune(st0, wmUs, stepUs)
        if (st.t1 != NoView && wmUs > st.t1 + 2 * stepUs) {
          // final: every event ≤ t1 + 2·step has arrived. Tombstone, not
          // clear: a post-emission view must not re-enter the user
          // (unless the TTL later retires the tombstone — q199's bound).
          clicks.clear(); purchases.clear()
          done.update(true)
          if (tombstoneTtlUs != Long.MaxValue) arm(ttlEndUs(st.t1), wmMs)
          FunnelTracker.resolve(key, st, stepUs, horizonUs).iterator
        } else if (st.isEmpty) {
          t1.clear(); clicks.clear(); purchases.clear(); done.clear(); armed.clear()
          Iterator.empty
        } else {
          clicks.clear()
          if (st.clicks.nonEmpty) clicks.appendList(st.clicks.toArray)
          purchases.clear()
          if (st.purchases.nonEmpty) purchases.appendList(st.purchases.toArray)
          val dMin =
            if (st.t1 != NoView) st.t1 + 2 * stepUs
            else (st.clicks ++ st.purchases).min
          arm(dMin, wmMs)
          Iterator.empty
        }
      }
    }
  }

  /** [[FunnelTracker.funnels]] on the v2 state API. Run with
    * `outputMode(Append)` and the RocksDB state-store provider (v2's
    * required provider).
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
      .transformWithState(
        new FunnelProcessor(stepUs, horizonUs, tombstoneTtlUs),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
