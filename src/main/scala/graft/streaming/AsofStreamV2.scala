package graft.streaming

import graft.streaming.AsofStreamJoin.{AsofRow, JoinState, Quote, SideEvent, Trade}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
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

/** The stream-stream as-of join family on Spark 4's `transformWithState`
  * (state API v2, RocksDB provider) — ALL THREE directions of the same
  * contract as the v1 operators ([[AsofStreamJoin.joined]] /
  * [[AsofStreamJoin.joinedForward]] / [[AsofStreamJoin.joinedNearest]]),
  * the q178/q179 cross-proof discipline applied to the engine's newest
  * operator family: the q203/q204 board rows byte-gate the BACKWARD
  * (unbounded and 48 h-tolerance) runs against q198's/q200's EXACT
  * oracles, and q205/q206 gate the FORWARD and NEAREST runs against
  * q201's/q202's — all at 3 SFs across the same two-epoch checkpoint
  * split, so the v1/v2 machineries are proven interchangeable on real
  * bytes across the full 3-direction × 2-API matrix (the spec additionally
  * proves anchor compaction, the forward no-anchor discipline, and the
  * nearest ±window buffer each survive a checkpoint restore on crafted
  * fixtures).
  *
  * The kernel (fold / resolve / prune and their argmax/argmin proofs) is
  * SHARED with the v1 operators — only the state machinery differs. What
  * v2 changes, and why it is the long-term API for this operator:
  *
  *   - GRANULAR TYPED STATE instead of one re-serialized blob:
  *     `ListState` buffers for quotes and trades, a `ValueState` anchor
  *     (backward mode only — forward/nearest provably need none, see the
  *     v1 `pruneForward`/`pruneNearest` proofs) — appends merge into the
  *     store without rewriting the key's whole buffer (v1 re-serializes
  *     the full `JoinState` product on every fold). MEASURED discipline
  *     (HotKeyStressSpec, SCALE.md §hot-key): per-ARRIVAL `appendValue`
  *     is superlinear in Spark 4.1.2's RocksDB merge path (a 16k
  *     single-key single-batch burst took 736 s), so `handleInputRows`
  *     buffers each invocation's arrivals and writes ONE `appendList`
  *     per side per trigger — the same burst lands in ~4 s, matching
  *     v1's fold envelope, while steady traffic keeps the
  *     no-blob-rewrite advantage.
  *   - RESOLUTION ONLY ON TIMERS: `handleInputRows` does pure appends and
  *     keeps at most ONE armed timer per key (re-armed earlier when a new
  *     event's deadline precedes it; Spark fires input before expired
  *     timers within a micro-batch, so a same-batch quote is always
  *     folded before the timer's watermark proof — v1's exact ordering
  *     rule). `handleExpiredTimer` runs the shared resolve/prune pass,
  *     emits ripe trades, compacts the buffers (the one place the lists
  *     ARE rewritten — bounded by the in-flight window, not by arrival
  *     count), and re-arms at the earliest remaining deadline. The
  *     per-mode deadline algebra mirrors v1's exactly: backward = a
  *     pending trade's own instant / the newest quote / the anchor's
  *     tolerance expiry; forward = a pending trade's window END
  *     (t + tol — only then is "no in-window quote can still arrive"
  *     provable) / the newest quote's own instant (whose passage lets
  *     the floor retire a trade-less buffer); nearest = a pending
  *     trade's forward half-window end / the newest quote's window end
  *     (q.us + tol, after which no reachable trade's ±window can cover
  *     it).
  *
  * State bound: identical to v1 per mode (backward: one anchor + the
  * in-flight window per key, zero under a finite tolerance once every
  * reachable window has passed; forward/nearest: the tolerance window's
  * span of quotes + pending trades, zero for retired keys), because the
  * pruning kernel is identical.
  */
object AsofStreamV2 {

  /** At-most-one-armed-timer sentinel ([[StateV2Balances]]' NoTimer rule). */
  private val NoTimer = Long.MinValue

  private[streaming] final val Backward = "backward"
  private[streaming] final val Forward  = "forward"
  private[streaming] final val Nearest  = "nearest"

  final class AsofProcessor[K, P](
      mode: String,
      toleranceUs: Long,
      quoteEnc: Encoder[Quote[P]],
      outEnc: Encoder[AsofRow[K, P]] // carried for the caller; keeps the ctor total
  ) extends StatefulProcessor[K, SideEvent[K, P], AsofRow[K, P]] {

    /** Runtime array tag for Quote[P] — erasure makes every instantiation
      * a plain Quote[], which is exactly what the store's appendList needs.
      */
    private val quoteTag: scala.reflect.ClassTag[Quote[P]] =
      scala.reflect.ClassTag[Quote[P]](classOf[Quote[_]])

    @transient private var quotes: ListState[Quote[P]] = _
    @transient private var trades: ListState[Trade]    = _
    @transient private var anchor: ValueState[Quote[P]] = _
    @transient private var armed: ValueState[Long]      = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      quotes = getHandle.getListState[Quote[P]]("quotes", quoteEnc, TTLConfig.NONE)
      trades = getHandle.getListState[Trade]("trades", Encoders.product[Trade], TTLConfig.NONE)
      anchor = getHandle.getValueState[Quote[P]]("anchor", quoteEnc, TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
    }

    /** Keep exactly one armed timer per key, moving it EARLIER only: a
      * new deadline after the armed one can wait (the firing pass re-arms
      * from the full remaining-deadline set), but a new deadline before
      * it must not miss its proof instant.
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

    /** The instant at which an arrival can first make work final (or let
      * the buffer compact) — the v1 deadline algebra, applied per event at
      * admission so the single armed timer can only ever be EARLY (the
      * firing pass is idempotent and re-arms from the full remaining set).
      */
    private def deadlineOf(side: String, us: Long): Long = (mode, side) match {
      case (Backward, _)   => us // trade final / quote compactable at its own instant
      case (Forward, "q")  => us // its passage lets the floor retire the buffer
      case (Forward, _)    => AsofStreamJoin.satAdd(us, toleranceUs) // look-AHEAD window end
      case (Nearest, _)    => AsofStreamJoin.satAdd(us, toleranceUs) // ± half-window end
      case _               => us
    }

    /** Pure appends — buffered per invocation and written as ONE
      * `appendList` merge per side (a key's whole micro-batch burst costs
      * one RocksDB merge write, not one per arrival — the batching that
      * keeps the per-event store overhead off the hot path). No
      * resolution here (v1's rule: never on within-batch evidence).
      */
    override def handleInputRows(
        key: K,
        rows: Iterator[SideEvent[K, P]],
        timers: TimerValues
    ): Iterator[AsofRow[K, P]] = {
      val qs   = scala.collection.mutable.ArrayBuffer.empty[Quote[P]]
      val ts   = scala.collection.mutable.ArrayBuffer.empty[Trade]
      var dMin = Long.MaxValue
      rows.foreach { e =>
        e.side match {
          case "q" =>
            qs += Quote(e.us, e.event_id, e.payload)
            dMin = math.min(dMin, deadlineOf("q", e.us))
          case "t" =>
            ts += Trade(e.us, e.event_id)
            dMin = math.min(dMin, deadlineOf("t", e.us))
          case _ => () // sentinel: advances the watermark, never forms state
        }
      }
      if (qs.nonEmpty) quotes.appendList(qs.toArray(quoteTag))
      if (ts.nonEmpty) trades.appendList(ts.toArray)
      if (dMin != Long.MaxValue) arm(dMin, timers.getCurrentWatermarkInMs)
      Iterator.empty
    }

    /** The shared v1 kernel pass: resolve every watermark-proven trade,
      * compact/retire the quote buffer per the mode's prune proof, expire
      * a stale backward anchor under a finite tolerance, re-arm for the
      * earliest remaining deadline. Idempotent — an early or duplicate
      * firing just re-runs the pass against the same watermark and
      * changes nothing.
      */
    override def handleExpiredTimer(
        key: K,
        timers: TimerValues,
        expired: ExpiredTimerInfo
    ): Iterator[AsofRow[K, P]] = {
      armed.clear() // the fired timer is gone; anything below re-arms fresh
      val wmUs = timers.getCurrentWatermarkInMs * 1000L
      val st0 = JoinState[P](
        if (anchor.exists()) Some(anchor.get()) else None,
        quotes.get().toList,
        trades.get().toList)
      // finality per mode: backward proves at the trade's own instant;
      // forward/nearest only once the look-ahead window has closed
      val (ripe, pending) = mode match {
        case Backward => st0.trades.partition(_.us < wmUs)
        case _        => st0.trades.partition(t => AsofStreamJoin.satAdd(t.us, toleranceUs) < wmUs)
      }
      val rows = ripe.sortBy(t => (t.us, t.event_id)).map { t =>
        mode match {
          case Backward => AsofStreamJoin.resolve(key, t, st0, toleranceUs)
          case Forward  => AsofStreamJoin.resolveForward(key, t, st0, toleranceUs)
          case _        => AsofStreamJoin.resolveNearest(key, t, st0, toleranceUs)
        }
      }
      val floor = (wmUs :: pending.map(_.us)).min
      val st = mode match {
        case Backward => AsofStreamJoin.prune(st0.copy(trades = pending), floor, toleranceUs)
        case Forward  => AsofStreamJoin.pruneForward(st0.copy(trades = pending), floor)
        case _        => AsofStreamJoin.pruneNearest(st0.copy(trades = pending), floor, toleranceUs)
      }
      if (st.isEmpty) { quotes.clear(); trades.clear(); anchor.clear(); armed.clear() }
      else {
        if (st.anchor != st0.anchor) st.anchor match {
          case Some(a) => anchor.update(a)
          case None    => anchor.clear()
        }
        // AMORTIZED COMPACTION (the r14 variance fix): the pruned view is a
        // pure SUBSET of the stored buffer, and every resolve provably
        // ignores a below-floor quote (backward: dominated by the anchor
        // `better` fold or outside the tolerance once the anchor expires;
        // forward: the `q.us >= t.us` window filter; nearest: out of every
        // reachable trade's ±window) — so retaining pruned quotes in the
        // store is semantically inert and the rewrite is pure maintenance.
        // That inertness assumes every reachable trade arrives at-or-after
        // the floor — the no-late-rows contract that transformWithState's
        // event-time late-row filtering enforces at our 0s watermark. An
        // (impossible in-contract) late trade below the prior floor could
        // otherwise resolve against a retained pruned quote v1 discarded.
        // Rewriting BOTH lists on EVERY firing was the board's widest
        // variance source (q206's 1.85x swing on identical 100x chains):
        // each firing re-serialized the whole two-sided ±window buffer into
        // RocksDB, and that write amplification drove unpredictable
        // background compaction. Rewrite only when the prune sheds more
        // than 1/4 of the stored list: each entry is then rewritten O(1)
        // amortized times, and the stored buffer never exceeds 4/3 of the
        // live window (stale fraction is bounded by the threshold). The
        // next firing re-reads the stale-inclusive list and re-prunes —
        // the kernel is idempotent, so compaction is only ever deferred.
        val shed = st0.quotes.size - st.quotes.size
        if (shed * 4 > st0.quotes.size) {
          quotes.clear()
          if (st.quotes.nonEmpty) quotes.appendList(st.quotes.toArray(quoteTag))
        }
        // resolved trades MUST leave the store (a retained ripe trade would
        // re-resolve and re-emit on the next firing); when nothing ripened,
        // pending == the stored list and the rewrite is skipped entirely.
        if (ripe.nonEmpty) {
          trades.clear()
          if (st.trades.nonEmpty) trades.appendList(st.trades.toArray)
        }
        // earliest remaining deadline — v1's per-mode algebra verbatim
        val deadlines = mode match {
          case Backward =>
            val anchorExpiry =
              if (toleranceUs < Long.MaxValue)
                st.anchor.map(a => AsofStreamJoin.satAdd(a.us, toleranceUs)).toList
              else Nil
            pending.map(_.us) ++ st.quotes.map(_.us).maxOption.toList ++ anchorExpiry
          case Forward =>
            pending.map(t => AsofStreamJoin.satAdd(t.us, toleranceUs)) ++
              st.quotes.map(_.us).maxOption.toList
          case _ =>
            pending.map(t => AsofStreamJoin.satAdd(t.us, toleranceUs)) ++
              st.quotes.map(_.us).maxOption.map(AsofStreamJoin.satAdd(_, toleranceUs)).toList
        }
        deadlines.minOption.foreach(d => arm(d, timers.getCurrentWatermarkInMs))
      }
      rows.iterator
    }
  }

  private def run[K, P](events: Dataset[SideEvent[K, P]], mode: String, toleranceUs: Long)(
      implicit kEnc: Encoder[K],
      qEnc: Encoder[Quote[P]],
      outEnc: Encoder[AsofRow[K, P]]): Dataset[AsofRow[K, P]] =
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.key)
      .transformWithState(
        new AsofProcessor[K, P](mode, toleranceUs, qEnc, outEnc),
        TimeMode.EventTime(),
        OutputMode.Append())

  /** [[AsofStreamJoin.joined]] (BACKWARD: latest at-or-before) on the v2
    * state API. Run with `outputMode(Append)` and the RocksDB state-store
    * provider (v2's required provider).
    */
  def joined[K, P](events: Dataset[SideEvent[K, P]], toleranceUs: Long = Long.MaxValue)(
      implicit kEnc: Encoder[K],
      qEnc: Encoder[Quote[P]],
      outEnc: Encoder[AsofRow[K, P]]): Dataset[AsofRow[K, P]] =
    run(events, Backward, toleranceUs)

  /** [[AsofStreamJoin.joinedForward]] (earliest at-or-after within the
    * window) on the v2 state API — no anchor ever forms (the v1
    * `pruneForward` proof), and a trade is final only when the watermark
    * clears its look-AHEAD window end.
    */
  def joinedForward[K, P](events: Dataset[SideEvent[K, P]], toleranceUs: Long)(
      implicit kEnc: Encoder[K],
      qEnc: Encoder[Quote[P]],
      outEnc: Encoder[AsofRow[K, P]]): Dataset[AsofRow[K, P]] = {
    require(toleranceUs < Long.MaxValue, "forward as-of needs a finite tolerance to ever finalize")
    run(events, Forward, toleranceUs)
  }

  /** [[AsofStreamJoin.joinedNearest]] (least |Δ| within ±tolerance, the
    * batch merge node's tie chain) on the v2 state API — the quote buffer
    * is bounded to the ±window around the floor, retired keys hold zero
    * bytes.
    */
  def joinedNearest[K, P](events: Dataset[SideEvent[K, P]], toleranceUs: Long)(
      implicit kEnc: Encoder[K],
      qEnc: Encoder[Quote[P]],
      outEnc: Encoder[AsofRow[K, P]]): Dataset[AsofRow[K, P]] = {
    require(toleranceUs < Long.MaxValue, "nearest as-of needs a finite tolerance to ever finalize")
    run(events, Nearest, toleranceUs)
  }
}
