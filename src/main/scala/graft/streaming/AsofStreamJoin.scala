package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAM-STREAM AS-OF JOIN — the classic trades×quotes shape with BOTH
  * sides live: for every trade, the latest quote at-or-before the trade's
  * event time on the same key (ties at one quote timestamp resolve to the
  * highest event_id — last-write-wins, the SCD discipline). Spark has no
  * native stream-stream as-of operator (its interval join needs a
  * two-sided bound and emits ALL matches, not the latest), so this runs
  * on the custom-state machinery the engine already owns (the
  * Sessionizer/FunnelTracker `flatMapGroupsWithState` + event-time-timer
  * discipline): both sides arrive as one union-tagged stream keyed by the
  * join key, each key carries a small buffer, and a trade's row is
  * emitted exactly once — when the WATERMARK proves no earlier-or-equal
  * quote can still arrive. The batch twin is the custom as-of merge node
  * (`plans/AsofJoin`, q195's operator); the q198 board row byte-gates
  * this stream against the same independent SQL oracle.
  *
  * The operator is GENERIC in the join key `K` and the quote payload `P`
  * (matching the batch node's schema-genericity): the board rows
  * instantiate `K = Long, P = Long` (user ids carrying cents), and the
  * spec proves a `String`-keyed, multi-column-payload instantiation on
  * the same kernel. Ordering/semantic columns (`us`, `event_id`) stay
  * explicit — the argmax is over (us, event_id) regardless of payload.
  *
  * Finality rule: a trade at `t` resolves once the watermark is strictly
  * past `t` — any later-arriving quote has `ts ≥ watermark > t`, so it
  * cannot be at-or-before the trade. Resolution happens on timer firings
  * only (never on within-batch evidence: a same-batch quote may still be
  * folded before the timer's watermark proof).
  *
  * State bound (the 100 TB sizing argument): pending trades are those at
  * or above the watermark (bounded by the in-flight window); quotes
  * compact to ONE ANCHOR — the floor is `min(watermark, earliest pending
  * trade)`, every future or pending trade is at-or-after it, so among
  * quotes at-or-below the floor only the greatest (ts, event_id) can ever
  * win an argmax and the rest are dropped. Steady state per key = one
  * anchor quote + the in-flight window, independent of history length.
  * The anchor itself is dimension-sized state (one row per key — the
  * irreducible memory of "latest quote EVER at-or-before"); a deployment
  * that can tolerate bounded lookback adds a quote TTL exactly like
  * [[FunnelTracker]]'s entrant TTL.
  */
object AsofStreamJoin {

  /** Union-tagged input row: `side` = "q" (quote, `payload` meaningful)
    * or "t" (trade); anything else (the watermark sentinel) never forms
    * state. `ts` carries the watermark; `us` is the same instant in exact
    * epoch-µs (GroupState's clock is ms-granular — the Sessionizer
    * discipline).
    */
  final case class SideEvent[K, P](
      ts: java.sql.Timestamp, us: Long, key: K, side: String, event_id: Long, payload: P)

  final case class Quote[P](us: Long, event_id: Long, payload: P)
  final case class Trade(us: Long, event_id: Long)

  /** Per-key buffers: `anchor` = the single surviving quote at-or-below
    * the prune floor; `quotes` = quotes above the floor (still
    * individually addressable by pending/future trades); `trades` =
    * unresolved trades (at-or-above the watermark).
    */
  final case class JoinState[P](
      anchor: Option[Quote[P]], quotes: List[Quote[P]], trades: List[Trade]) {
    def isEmpty: Boolean = anchor.isEmpty && quotes.isEmpty && trades.isEmpty
  }

  /** Emitted row: `matched` = 0 ⇒ the trade had no in-window quote
    * (`q_payload` = None and the q columns carry the 0 sentinel — the
    * caller maps them to SQL NULLs).
    */
  final case class AsofRow[K, P](
      event_id: Long, key: K, t_us: Long, q_us: Long, q_eid: Long,
      q_payload: Option[P], matched: Long)

  private def better[P](a: Quote[P], b: Quote[P]): Quote[P] =
    if (a.us > b.us || (a.us == b.us && a.event_id >= b.event_id)) a else b

  private[streaming] def fold[P](st: JoinState[P], e: SideEvent[_, P]): JoinState[P] =
    e.side match {
      case "q" => st.copy(quotes = Quote(e.us, e.event_id, e.payload) :: st.quotes)
      case "t" => st.copy(trades = Trade(e.us, e.event_id) :: st.trades)
      case _   => st // sentinel: advances the watermark, never forms state
    }

  private[streaming] def emptyState[P]: JoinState[P] = JoinState[P](None, Nil, Nil)

  private def unmatched[K, P](key: K, t: Trade): AsofRow[K, P] =
    AsofRow(t.event_id, key, t.us, 0L, 0L, None, 0L)

  /** Latest at-or-before quote for a trade within the lookback tolerance
    * — the argmax by (us, event_id) over the anchor and the buffered
    * quotes in the trade's window.
    */
  private[streaming] def resolve[K, P](
      key: K, t: Trade, st: JoinState[P], tolUs: Long = Long.MaxValue): AsofRow[K, P] = {
    val cands = (st.anchor.toList ++ st.quotes)
      .filter(q => q.us <= t.us && t.us - q.us <= tolUs)
    cands.reduceOption(better[P]) match {
      case Some(q) => AsofRow(t.event_id, key, t.us, q.us, q.event_id, Some(q.payload), 1L)
      case None    => unmatched(key, t)
    }
  }

  /** Compact quotes at-or-below `floor` into the single dominating anchor
    * (see class doc for why the argmax is preserved). Under a finite
    * lookback tolerance the anchor itself EXPIRES once every future or
    * pending trade's window has moved past it (`floor - anchor.us > tol`)
    * — per-key state then goes to zero for quote-only keys, the bounded
    * variant the unbounded join's scaladoc promises.
    */
  private[streaming] def prune[P](
      st: JoinState[P], floor: Long, tolUs: Long = Long.MaxValue): JoinState[P] = {
    val (below, above) = st.quotes.partition(_.us <= floor)
    val anchor = (st.anchor.toList ++ below).reduceOption(better[P])
      .filter(a => floor - a.us <= tolUs)
    JoinState(anchor, above, st.trades)
  }

  private def earlier[P](a: Quote[P], b: Quote[P]): Quote[P] =
    if (a.us < b.us || (a.us == b.us && a.event_id <= b.event_id)) a else b

  /** Saturating add (FunnelTracker.satAdd's rule) for window deadlines. */
  private[streaming] def satAdd(a: Long, b: Long): Long = FunnelTracker.satAdd(a, b)

  /** EARLIEST quote at-or-after the trade within the window — the FORWARD
    * direction (argmin by (us, event_id) over `[t, t + tol]`), the
    * streaming twin of the batch q105/q112/q113 flavors.
    */
  private[streaming] def resolveForward[K, P](
      key: K, t: Trade, st: JoinState[P], tolUs: Long): AsofRow[K, P] = {
    val cands = st.quotes.filter(q => q.us >= t.us && q.us - t.us <= tolUs)
    cands.reduceOption(earlier[P]) match {
      case Some(q) => AsofRow(t.event_id, key, t.us, q.us, q.event_id, Some(q.payload), 1L)
      case None    => unmatched(key, t)
    }
  }

  /** Forward pruning needs NO anchor at all: a reachable trade sits at or
    * after `floor`, and a forward window only looks ahead — a quote
    * strictly below the floor precedes every reachable trade and can
    * never serve one again. Per-key steady state = the quotes inside the
    * in-flight window + pending trades; a retired key holds ZERO bytes.
    */
  private[streaming] def pruneForward[P](st: JoinState[P], floor: Long): JoinState[P] =
    JoinState(None, st.quotes.filter(_.us >= floor), st.trades)

  /** FORWARD stream-stream as-of: one row per trade — the earliest quote
    * at-or-after it within `toleranceUs` — emitted when the watermark
    * proves the window closed (wm strictly past t + tolerance; only then
    * can no in-window quote still arrive). The tolerance is REQUIRED
    * finite: an unbounded forward join could never prove a quote-less
    * trade final (the qualifying quote may forever be "still coming").
    */
  def joinedForward[K, P](events: Dataset[SideEvent[K, P]], toleranceUs: Long)(
      implicit kEnc: Encoder[K],
      stEnc: Encoder[JoinState[P]],
      outEnc: Encoder[AsofRow[K, P]]): Dataset[AsofRow[K, P]] = {
    require(toleranceUs < Long.MaxValue, "forward as-of needs a finite tolerance to ever finalize")
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.key)
      .flatMapGroupsWithState[JoinState[P], AsofRow[K, P]](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (key: K, evs: Iterator[SideEvent[K, P]], state: GroupState[JoinState[P]]) =>
        val wmMs = state.getCurrentWatermarkMs
        val wmUs = wmMs * 1000L
        val st0 = evs.foldLeft(state.getOption.getOrElse(emptyState[P]))(fold[P])
        // a trade is final when the watermark is strictly past its WINDOW
        // END (any later quote has ts ≥ wm > t + tol — out of window)
        val (ripe, pending) = st0.trades.partition(t => satAdd(t.us, toleranceUs) < wmUs)
        val rows = ripe.sortBy(t => (t.us, t.event_id)).map(t => resolveForward(key, t, st0, toleranceUs))
        val floor = (wmUs :: pending.map(_.us)).min
        val st = pruneForward(st0.copy(trades = pending), floor)
        if (st.isEmpty) { if (state.exists) state.remove() }
        else {
          state.update(st)
          // earliest instant more work becomes final: a pending trade's
          // window end, or the newest quote's own ts (whose passage lets
          // the floor retire a trade-less quote buffer)
          val deadlines = pending.map(t => satAdd(t.us, toleranceUs)) ++ st.quotes.map(_.us).maxOption.toList
          deadlines.minOption.foreach { d =>
            state.setTimeoutTimestamp(math.max(d / 1000L + 1L, wmMs + 1L))
          }
        }
        rows.iterator
      }
  }

  /** The NEAREST candidate rule — the custom batch merge node's exact
    * tie chain (q106/q114): least |Δ|, then backward-first, then
    * greatest-backward-key / least-forward-key.
    */
  private def nearer[P](t: Long)(a: Quote[P], b: Quote[P]): Quote[P] = {
    val (da, db) = (math.abs(a.us - t), math.abs(b.us - t))
    if (da != db) { if (da < db) a else b }
    else {
      val (ba, bb) = (a.us <= t, b.us <= t)
      if (ba != bb) { if (ba) a else b }
      else if (ba) { if (a.event_id >= b.event_id) a else b }
      else { if (a.event_id <= b.event_id) a else b }
    }
  }

  /** Nearest quote within ±tolerance of the trade (q106/q114's direction,
    * streamed): min microsecond distance, ties backward-first then the
    * batch node's key rules.
    */
  private[streaming] def resolveNearest[K, P](
      key: K, t: Trade, st: JoinState[P], tolUs: Long): AsofRow[K, P] = {
    val cands = st.quotes.filter(q => math.abs(q.us - t.us) <= tolUs)
    cands.reduceOption(nearer[P](t.us)) match {
      case Some(q) => AsofRow(t.event_id, key, t.us, q.us, q.event_id, Some(q.payload), 1L)
      case None    => unmatched(key, t)
    }
  }

  /** Nearest pruning: a reachable trade sits at-or-after `floor`, and its
    * two-sided window reaches back at most `tol` — quotes strictly below
    * `floor − tol` are out of every reachable window. No anchor (each
    * trade's nearest depends on its own position, but the window bounds
    * the buffer to tol + in-flight span); retired keys hold zero bytes.
    */
  private[streaming] def pruneNearest[P](st: JoinState[P], floor: Long, tolUs: Long): JoinState[P] =
    JoinState(None, st.quotes.filter(q => floor - q.us <= tolUs), st.trades)

  /** NEAREST stream-stream as-of: one row per trade — the quote with the
    * least |ts − trade ts| within ±tolerance (ties: the batch merge
    * node's backward-first/key rules) — emitted when the watermark
    * clears the trade's FORWARD half-window (wm strictly past t + tol;
    * the backward half was final at the trade's own instant). Tolerance
    * required finite, as for [[joinedForward]].
    */
  def joinedNearest[K, P](events: Dataset[SideEvent[K, P]], toleranceUs: Long)(
      implicit kEnc: Encoder[K],
      stEnc: Encoder[JoinState[P]],
      outEnc: Encoder[AsofRow[K, P]]): Dataset[AsofRow[K, P]] = {
    require(toleranceUs < Long.MaxValue, "nearest as-of needs a finite tolerance to ever finalize")
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.key)
      .flatMapGroupsWithState[JoinState[P], AsofRow[K, P]](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (key: K, evs: Iterator[SideEvent[K, P]], state: GroupState[JoinState[P]]) =>
        val wmMs = state.getCurrentWatermarkMs
        val wmUs = wmMs * 1000L
        val st0 = evs.foldLeft(state.getOption.getOrElse(emptyState[P]))(fold[P])
        val (ripe, pending) = st0.trades.partition(t => satAdd(t.us, toleranceUs) < wmUs)
        val rows = ripe.sortBy(t => (t.us, t.event_id)).map(t => resolveNearest(key, t, st0, toleranceUs))
        val floor = (wmUs :: pending.map(_.us)).min
        val st = pruneNearest(st0.copy(trades = pending), floor, toleranceUs)
        if (st.isEmpty) { if (state.exists) state.remove() }
        else {
          state.update(st)
          // earliest instant more work becomes final: a pending trade's
          // forward half-window end, or the newest quote's window end
          // (whose passage retires a trade-less buffer to zero)
          val deadlines =
            pending.map(t => satAdd(t.us, toleranceUs)) ++
              st.quotes.map(_.us).maxOption.map(satAdd(_, toleranceUs)).toList
          deadlines.minOption.foreach { d =>
            state.setTimeoutTimestamp(math.max(d / 1000L + 1L, wmMs + 1L))
          }
        }
        rows.iterator
      }
  }

  /** Per-trade as-of rows over an event-time stream of union-tagged
    * quotes and trades; run with `outputMode(Append)`. Exactly one row
    * per trade, emitted when the watermark passes the trade's timestamp.
    *
    * @param toleranceUs bounded lookback (the batch family's
    *        q89/q112/q114 tolerance flavor, streamed): a trade matches
    *        only quotes with `t.us − q.us ≤ tolerance`; a stale anchor
    *        expires once every reachable trade's window has moved past
    *        it, so quote-only keys hold ZERO steady state.
    *        Long.MaxValue (default) = the unbounded latest-ever join
    *        with its one-anchor-per-key floor.
    */
  def joined[K, P](events: Dataset[SideEvent[K, P]], toleranceUs: Long = Long.MaxValue)(
      implicit kEnc: Encoder[K],
      stEnc: Encoder[JoinState[P]],
      outEnc: Encoder[AsofRow[K, P]]): Dataset[AsofRow[K, P]] = {
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.key)
      .flatMapGroupsWithState[JoinState[P], AsofRow[K, P]](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (key: K, evs: Iterator[SideEvent[K, P]], state: GroupState[JoinState[P]]) =>
        val wmMs = state.getCurrentWatermarkMs
        val wmUs = wmMs * 1000L
        // Fold new arrivals (a no-op on timer firings), then resolve every
        // trade the watermark has finalized, then compact the quote buffer.
        val st0 = evs.foldLeft(state.getOption.getOrElse(emptyState[P]))(fold[P])
        val (ripe, pending) = st0.trades.partition(_.us < wmUs)
        // emission order is deterministic for the byte gate's sake only in
        // aggregate (the sink re-sorts by event_id); resolve against the
        // PRE-prune buffers so an equal-floor quote is still addressable
        val rows = ripe.sortBy(t => (t.us, t.event_id)).map(t => resolve(key, t, st0, toleranceUs))
        val floor = (wmUs :: pending.map(_.us)).min
        val st = prune(st0.copy(trades = pending), floor, toleranceUs)
        if (st.isEmpty) { if (state.exists) state.remove() }
        else {
          state.update(st)
          // Timer discipline: fire at the earliest instant more work
          // becomes final — the earliest pending trade, or the newest
          // buffered quote (whose passage compacts the buffer to the
          // anchor). Under the UNBOUNDED join anchor-only state carries no
          // timer (the anchor is the irreducible one-row memory; nothing
          // ever retires it). Under a FINITE tolerance the anchor itself
          // has a deadline — the instant every reachable trade's window
          // has moved past it (anchor.us + tol; [[prune]] then drops it) —
          // so a key that never sees traffic again STILL goes to zero
          // state, the bound the tolerance flavor promises.
          val anchorExpiry =
            if (toleranceUs < Long.MaxValue) st.anchor.map(a => satAdd(a.us, toleranceUs)).toList
            else Nil
          val deadlines = pending.map(_.us) ++ st.quotes.map(_.us).maxOption.toList ++ anchorExpiry
          deadlines.minOption.foreach { d =>
            state.setTimeoutTimestamp(math.max(d / 1000L + 1L, wmMs + 1L))
          }
        }
        rows.iterator
      }
  }
}
