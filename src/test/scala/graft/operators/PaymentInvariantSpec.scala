package graft.operators

import graft.SparkSpec
import graft.model.PaymentEvent
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tier mirroring the reference's randomized component test
  * (`component/KafkaStreamsCT.java:136-192`): batches of random payments
  * (amount ∈ [10,10000], currency ∈ {GBP,USD}, rails ∈ {FOO,BAR,XXX}) must
  * (a) split across the two sinks with nothing lost or duplicated, and
  * (b) produce balances equal to an independently-computed expected total.
  * Seeded ScalaCheck generators keep runs reproducible.
  */
class PaymentInvariantSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val genPayment: Gen[PaymentEvent] = for {
    id     <- Gen.uuid.map(_.toString)
    amount <- Gen.chooseNum(10L, 10000L)
    cur    <- Gen.oneOf("GBP", "USD")
    from   <- Gen.oneOf((1 to 20).map(i => s"acct$i"))
    rails  <- Gen.oneOf("BANK_RAILS_FOO", "BANK_RAILS_BAR", "BANK_RAILS_XXX")
  } yield PaymentEvent(id, amount, cur, "SINK", from, rails)

  private val genBatch: Gen[List[PaymentEvent]] = Gen.listOfN(200, genPayment)

  test("randomized batches: routing conserves records and balances match the independent sum") {
    for (seed <- 1L to 5L) {
      val batch = genBatch.pureApply(Gen.Parameters.default, Seed(seed))
      val topo  = PaymentOps.topology(batch.toDF())

      // Expected values computed independently in plain Scala (the test's
      // own "consumer-side" bookkeeping, KafkaStreamsCT.java:154,172-177).
      val kept = batch.filter(p => Set("BANK_RAILS_FOO", "BANK_RAILS_BAR").contains(p.rails))
      val gbpAmount: PaymentEvent => Long =
        p => if (p.currency == "USD") Math.round(p.amount * 0.8) else p.amount

      val fooIds = topo.foo.select("paymentId").as[String].collect().toSet
      val barIds = topo.bar.select("paymentId").as[String].collect().toSet
      assert(fooIds.intersect(barIds).isEmpty, s"seed=$seed: a record must route to exactly one sink")
      assert(
        fooIds.size + barIds.size == kept.size,
        s"seed=$seed: count split across both topics must sum to the kept total (KafkaStreamsCT.java:184-186)"
      )

      val expected = kept.groupBy(_.fromAccount).map { case (a, ps) => a -> ps.map(gbpAmount).sum }
      val actual   = topo.balances.as[(String, Long)].collect().toMap
      assert(actual == expected, s"seed=$seed: balances must equal the independently-computed totals")
    }
  }
}
