package graft.streaming

import graft.SparkSpec
import graft.model.PaymentEvent
import graft.operators.PaymentOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O2 (peek) done the Spark way: the reference's `.peek` log taps
  * (`PaymentTopology.java:43,47,72`) are side-effect observation points —
  * Spark's equivalent is `Dataset.observe`, which attaches named aggregate
  * metrics to a point in the plan and reports them per micro-batch through
  * `StreamingQueryProgress.observedMetrics`, WITHOUT materializing or
  * forking the stream (a `CollectMetrics` node rides the existing pass).
  * This pins the contract: counts/sums observed BETWEEN operators match
  * what the operators actually saw, per batch.
  */
class ObserveSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("observe() reports per-batch record counts at topology tap points") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PaymentEvent]
    // tap 1: post-source (reference peek @43); tap 2: post-filter (@47)
    val tapped = PaymentOps
      .railsFilter(input.toDF().observe("pre_filter", count(lit(1)).as("n_in")))
      .observe("post_filter", count(lit(1)).as("n_kept"), sum(col("amount")).as("amount_kept"))
    val query = tapped.writeStream
      .format("memory")
      .queryName("observed")
      .outputMode("append")
      .start()

    input.addData(
      PaymentEvent("p1", 100L, "GBP", "DEF", "ABC", "BANK_RAILS_FOO"),
      PaymentEvent("p2", 50L, "GBP", "DEF", "ABC", "BANK_RAILS_FOO"),
      PaymentEvent("p3", 1200L, "GBP", "DEF", "ABC", "BANK_RAILS_XXX") // filtered out
    )
    query.processAllAvailable()

    val metrics = query.recentProgress
      .flatMap(p => Option(p.observedMetrics))
      .flatMap(m => Seq(Option(m.get("pre_filter")), Option(m.get("post_filter"))).flatten)
    val pre  = metrics.find(_.schema.fieldNames.contains("n_in"))
    val post = metrics.find(_.schema.fieldNames.contains("n_kept"))
    assert(pre.exists(_.getAs[Long]("n_in") == 3L), s"pre-filter tap: $pre")
    assert(post.exists(r => r.getAs[Long]("n_kept") == 2L && r.getAs[Long]("amount_kept") == 150L),
      s"post-filter tap: $post")
    // and the data-plane result is untouched by the taps
    assert(spark.table("observed").count() == 2)
    query.stop()
  }
}
