package graft.streaming

import graft.model.PaymentEvent
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming operators via `flatMapGroupsWithState` — the
  * escape hatch for stateful shapes `groupBy.agg` cannot express. Two are
  * provided:
  *
  *   - [[runningBalances]]: the reference's balance KTable re-expressed with
  *     explicit per-key state (`KeyValueStore<String,Long>` ↔ `GroupState
  *     [Long]`), emitting one update per changed key per micro-batch — the
  *     literal Kafka Streams `aggregate` contract
  *     (`PaymentTopology.java:78-88`). [[PaymentOps.balances]] in update
  *     mode is the preferred declarative equivalent; this variant exists for
  *     shapes that need arbitrary state transitions.
  *   - [[streamingDedup]]: exact streaming deduplication by key with
  *     unbounded state — first occurrence passes, replays are dropped
  *     (the streaming twin of the batch exact-dedup q40).
  *
  * Scale notes: state is partitioned by group key across the shuffle; use
  * the RocksDB state-store provider for large key spaces, and prefer
  * timeout-based TTL (`GroupStateTimeout`) when keys churn — unbounded
  * no-TTL state here is faithful to the reference.
  */
object StatefulBalances {

  final case class BalanceUpdate(fromAccount: String, balance: Long)

  /** Per-account running sums with explicit state. Run with
    * `outputMode(Update)`.
    */
  def runningBalances(payments: Dataset[PaymentEvent]): Dataset[BalanceUpdate] = {
    import payments.sparkSession.implicits._
    payments
      .groupByKey(_.fromAccount)
      .flatMapGroupsWithState[Long, BalanceUpdate](
        OutputMode.Update(),
        GroupStateTimeout.NoTimeout()
      ) { (account: String, events: Iterator[PaymentEvent], state: GroupState[Long]) =>
        val prior = state.getOption.getOrElse(0L) // Initializer = 0L
        val next  = events.foldLeft(prior)((agg, p) => agg + p.amount) // Aggregator = agg + value
        if (next != prior || !state.exists) {
          state.update(next)
          Iterator.single(BalanceUpdate(account, next))
        } else Iterator.empty
      }
  }

  final case class SeenKey(key: String)

  /** Exact streaming dedup: pass each key's FIRST record, drop replays.
    * State per key is a single boolean-shaped marker (smallest possible);
    * at 100 TB of keys use RocksDB + TTL timeouts.
    */
  def streamingDedup(payments: Dataset[PaymentEvent]): Dataset[PaymentEvent] = {
    import payments.sparkSession.implicits._
    payments
      .groupByKey(_.paymentId)
      .flatMapGroupsWithState[Boolean, PaymentEvent](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (_: String, events: Iterator[PaymentEvent], state: GroupState[Boolean]) =>
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          events.take(1)
        }
      }
  }

  /** Convenience: wire [[runningBalances]] to a memory sink for interactive
    * inspection (test/debug surface).
    */
  def startToMemory(
      spark: SparkSession,
      payments: Dataset[PaymentEvent],
      queryName: String,
      checkpointDir: String
  ): org.apache.spark.sql.streaming.StreamingQuery =
    runningBalances(payments).writeStream
      .queryName(queryName)
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .format("memory")
      .start()
}
