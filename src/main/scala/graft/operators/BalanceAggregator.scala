package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF mirroring the reference's `Initializer`/`Aggregator` pair
  * exactly (`PaymentTopology.java:78-87`): initializer = 0L, aggregator =
  * agg + value. Spark's `Aggregator[IN, BUF, OUT]` adds `merge` — the
  * map-side partial-combine step Kafka Streams does not have (its state
  * lives per-partition, no two-level combine) — which is what makes the
  * same aggregation shuffle only partial sums at 100 TB.
  *
  * `sum(amount)` is equivalent and preferred in untyped plans
  * ([[PaymentOps.balances]]); this demonstrates the custom-aggregate
  * surface for shapes `sum` cannot express.
  */
object BalanceAggregator extends Aggregator[Long, Long, Long] {
  override def zero: Long = 0L // Initializer (PaymentTopology.java:78-82)
  override def reduce(agg: Long, value: Long): Long = agg + value // Aggregator (:83-87)
  override def merge(a: Long, b: Long): Long = a + b // partial combine (Spark-only)
  override def finish(agg: Long): Long = agg
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
