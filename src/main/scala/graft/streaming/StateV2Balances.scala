package graft.streaming

import graft.streaming.StatefulBalances.{BalanceUpdate, TimedPayment}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo,
  OutputMode,
  StatefulProcessor,
  TTLConfig,
  TimeMode,
  TimerValues,
  ValueState
}

/** The TTL'd running-balance operator on Spark 4's `transformWithState`
  * (state API v2) — the successor to `flatMapGroupsWithState` that a new
  * deployment should reach for first. Same contract as
  * [[StatefulBalances.runningBalancesTtl]] (per-account running sums,
  * sliding EVENT-time TTL, silent eviction, changed-keys-only emission),
  * re-expressed with the v2 primitives:
  *
  *   - explicit named `ValueState` with a typed encoder (v2 supports
  *     several independent states per key; one product-encoded state is
  *     enough here);
  *   - EVICTION VIA TIMERS: `registerTimer(deadline)` +
  *     `handleExpiredTimer` replace the GroupState timeout — one armed
  *     timer per key, re-armed (old timer deleted) whenever fresh data
  *     moves the deadline;
  *   - `TimeMode.EventTime` so timers fire off the watermark — data-clock
  *     eviction, deterministic under replay/backfill, exactly like the v1
  *     twin (wall-clock timers would also keep `processAllAvailable` from
  *     ever seeing a quiescent stream).
  *
  * The deadline is `max(event time EVER seen) + ttl`, held in state (a
  * late-but-admitted event must not move it backward — regression spec
  * shared with the v1 operator). v2 requires the RocksDB state-store
  * provider — the large-key-space configuration a 100 TB deployment runs
  * anyway; state is partitioned by the group key across
  * `spark.sql.shuffle.partitions` tasks exactly as in v1.
  */
object StateV2Balances {

  /** Per-key state: running balance, max event time ever seen (the TTL
    * anchor), and the currently armed timer (so re-arming can delete it).
    */
  final case class V2State(balance: Long, maxSeenMs: Long, deadlineMs: Long)

  private val NoTimer = Long.MinValue

  final class TtlBalanceProcessor(ttlMs: Long)
      extends StatefulProcessor[String, TimedPayment, BalanceUpdate] {

    @transient private var state: ValueState[V2State] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[V2State]("balance", Encoders.product[V2State], TTLConfig.NONE)

    override def handleInputRows(
        account: String,
        rows: Iterator[TimedPayment],
        timers: TimerValues
    ): Iterator[BalanceUpdate] = {
      val fresh = !state.exists()
      val prior = if (fresh) V2State(0L, Long.MinValue, NoTimer) else state.get()
      var next     = prior.balance
      var lastSeen = prior.maxSeenMs
      rows.foreach { tp =>
        next += tp.payment.amount // Initializer = 0L, Aggregator = agg + value
        lastSeen = math.max(lastSeen, tp.ts.getTime)
      }
      // deadline strictly ahead of the watermark (a key fed only late data
      // still gets evict-at-next-advance rather than an already-past timer)
      val deadline = math.max(lastSeen + ttlMs, timers.getCurrentWatermarkInMs + 1L)
      if (deadline != prior.deadlineMs) {
        if (prior.deadlineMs != NoTimer) getHandle.deleteTimer(prior.deadlineMs)
        getHandle.registerTimer(deadline)
      }
      state.update(V2State(next, lastSeen, deadline))
      if (next != prior.balance || fresh) Iterator.single(BalanceUpdate(account, next))
      else Iterator.empty
    }

    override def handleExpiredTimer(
        account: String,
        timers: TimerValues,
        expired: ExpiredTimerInfo
    ): Iterator[BalanceUpdate] = {
      // only the CURRENT deadline evicts — a stale timer (deleted logically
      // but delivered anyway) must not clear a re-armed key
      if (state.exists() && expired.getExpiryTimeInMs() >= state.get().deadlineMs) state.clear()
      Iterator.empty // silent eviction: absence reads as 404, no tombstone
    }
  }

  /** [[StatefulBalances.runningBalancesTtl]] on the v2 state API. Run with
    * `outputMode(Update)` and the RocksDB state-store provider.
    */
  def runningBalancesTtl(
      payments: Dataset[TimedPayment],
      ttl: java.time.Duration,
      lateness: java.time.Duration = java.time.Duration.ZERO
  ): Dataset[BalanceUpdate] = {
    import payments.sparkSession.implicits._
    payments
      .withWatermark("ts", s"${lateness.toMillis} milliseconds")
      .groupByKey(_.payment.fromAccount)
      .transformWithState(new TtlBalanceProcessor(ttl.toMillis), TimeMode.EventTime(), OutputMode.Update())
  }
}
