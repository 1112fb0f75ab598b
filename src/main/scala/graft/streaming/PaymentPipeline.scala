package graft.streaming

import graft.model.PaymentSerde
import graft.operators.PaymentOps
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Structured-Streaming twin of the reference's runtime
  * (`processor/PaymentTopology.java:39-98` wired by
  * `KafkaStreamsDemoConfiguration.java:34-48`): the same operator chain
  * [[PaymentOps.topology]] applied to an unbounded source, with
  *   - the balance KTable as a `groupBy.sum` in **update** output mode
  *     (each micro-batch emits only the keys whose sum changed — exactly the
  *     KTable changelog contract, `PaymentTopology.java:78-88`);
  *   - queryable state ([[BalanceStore]]) maintained by a `foreachBatch`
  *     upsert, standing in for the reference's interactive-query store
  *     (`controller/BalanceController.java:24-33`) — SURVEY.md §7.4 Hard #1;
  *   - sink routing for the FOO/BAR outbound topics as ONE tagged stream
  *     written per-branch in a single pass (`PaymentTopology.java:90-97`).
  *
  * Scale notes (100 TB/day stream): state is per-`fromAccount` running sums —
  * Spark's streaming state store partitions it by the shuffle hash of the
  * group key across `spark.sql.shuffle.partitions` tasks; for wide key spaces
  * use the RocksDB provider
  * (`spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider`)
  * exactly as the reference leans on RocksDB. The foreachBatch upsert below
  * collects ONLY the per-batch changelog (keys that changed in the batch, not
  * the full state), so driver traffic is proportional to update rate, not to
  * key cardinality; a production deployment would swap the in-memory map for
  * a Delta/JDBC upsert with the same contract.
  */
object PaymentPipeline {

  /** Queryable per-account balance snapshot — the Spark stand-in for
    * `kafkaStreams.store("balance", keyValueStore())`. Thread-safe; readable
    * while the stream runs (same eventual-consistency window the reference
    * tests tolerate, `KafkaStreamsPaymentIntegrationTest.java:185-188`).
    */
  final class BalanceStore {
    private val state = new ConcurrentHashMap[String, Long]()

    /** `GET /balance/{account}`: None ⇒ the reference's HTTP 404
      * (`BalanceController.java:29-33`).
      */
    def get(account: String): Option[Long] = Option(state.get(account))

    def snapshot: Map[String, Long] = state.asScala.toMap

    private[streaming] def upsert(rows: Array[Row]): Unit =
      rows.foreach(r => state.put(r.getString(0), r.getLong(1)))

    /** Add per-batch deltas (the single-pass variant's merge step). */
    private[streaming] def merge(rows: Array[Row]): Unit =
      rows.foreach(r => state.merge(r.getString(0), r.getLong(1), (a, b) => a + b))
  }

  /** Handles to the running topology: the two branch queries' shared writer,
    * the balance query, and the queryable store.
    */
  final case class RunningTopology(
      routing: StreamingQuery,
      balance: StreamingQuery,
      store: BalanceStore
  ) {
    def processAllAvailable(): Unit = {
      routing.processAllAvailable()
      balance.processAllAvailable()
    }
    def stop(): Unit = {
      routing.stop()
      balance.stop()
    }
  }

  /** Wire the full reference topology over a streaming payment DataFrame
    * (from [[fromKafka]], a MemoryStream, or any streaming source with the
    * payment schema).
    *
    * @param sinkDir  rows routed to the FOO/BAR "topics" land in
    *                 `sinkDir/topic=rails-foo-topic/` etc. as parquet —
    *                 one partitioned write per micro-batch (single pass over
    *                 the tagged union, no per-branch re-scan).
    */
  def start(payments: DataFrame, checkpointDir: String, sinkDir: String): RunningTopology = {
    val store = new BalanceStore

    val supported     = PaymentOps.railsFilter(payments)
    val Seq(gbp, usd) = PaymentOps.branchByCurrency(supported)
    val merged        = PaymentOps.merge(gbp, PaymentOps.fxConvert(usd))

    // O10+O11 — one tagged stream, partitioned write = both sinks in one pass.
    val routed = PaymentOps.branchFirstMatch(
      merged,
      "topic",
      Seq(
        "rails-foo-topic" -> (col("rails") === "BANK_RAILS_FOO"),
        "rails-bar-topic" -> (col("rails") === "BANK_RAILS_BAR")
      )
    )
    val routing = routed.writeStream
      .queryName("graft-sink-routing")
      .option("checkpointLocation", s"$checkpointDir/routing")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.write.mode("append").partitionBy("topic").parquet(sinkDir)
        ()
      }
      .start()

    // O8+O9 — update-mode grouped sum; foreachBatch receives exactly the
    // changed keys per batch (the KTable changelog) and upserts the store.
    val balance = PaymentOps
      .balances(merged)
      .writeStream
      .queryName("graft-balance")
      .outputMode("update")
      .option("checkpointLocation", s"$checkpointDir/balance")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        store.upsert(batch.select(col("fromAccount"), col("balance")).collect())
        ()
      }
      .start()

    RunningTopology(routing, balance, store)
  }

  /** Single-pass alternative to [[start]]: ONE streaming query reads the
    * source once per micro-batch, writes both sink branches (partitioned
    * write) AND folds the batch's per-account deltas into the store — the
    * reference's actual execution shape (one topology, one consumer).
    *
    * Trade-off vs [[start]]: half the source reads and one set of
    * checkpoints, but balance state lives in the store (delta-merged), so a
    * replayed batch after a crash would double-count — [[start]]'s
    * update-mode aggregation keeps state in Spark's checkpointed store and
    * re-emits idempotent totals. Use this form when the sink is idempotent
    * per batchId or the source is effectively-once.
    */
  def startSinglePass(payments: DataFrame, checkpointDir: String, sinkDir: String): (StreamingQuery, BalanceStore) = {
    val store = new BalanceStore

    val supported     = PaymentOps.railsFilter(payments)
    val Seq(gbp, usd) = PaymentOps.branchByCurrency(supported)
    val merged        = PaymentOps.merge(gbp, PaymentOps.fxConvert(usd))
    val routed = PaymentOps.branchFirstMatch(
      merged,
      "topic",
      Seq(
        "rails-foo-topic" -> (col("rails") === "BANK_RAILS_FOO"),
        "rails-bar-topic" -> (col("rails") === "BANK_RAILS_BAR")
      )
    )

    val query = routed.writeStream
      .queryName("graft-single-pass")
      .option("checkpointLocation", s"$checkpointDir/single")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.persist()
        batch.write.mode("append").partitionBy("topic").parquet(sinkDir)
        store.merge(
          batch
            .groupBy(col("fromAccount"))
            .agg(sum(col("amount")).as("delta"))
            .collect()
        )
        batch.unpersist()
        ()
      }
      .start()
    (query, store)
  }

  /** O1 — the Kafka source decoded to payment columns (requires the
    * spark-sql-kafka connector on the classpath at deploy time; the codec
    * itself is pure columns and tested without a broker).
    */
  def fromKafka(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    PaymentSerde.decodeKafka(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .load()
    )

  /** O13 — topology introspection: the analyzed + physical plan as text,
    * the Spark twin of `Topology#describe`
    * (`controller/TopologyController.java:20-23`).
    */
  def describe(df: DataFrame): String =
    df.queryExecution.toString
}
