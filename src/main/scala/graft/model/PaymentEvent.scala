package graft.model

import org.apache.spark.sql.types._

/** The reference engine's single value type — a fixed-schema payment event.
  *
  * Mirrors `event/PaymentEvent.java:12-25` in the reference
  * (lydtechconsulting/kafka-streams): six fields, `String`/`Long` only.
  * The Kafka record key is `paymentId` (reference tests pipe
  * `payment.getPaymentId()` as key — `PaymentTopologyTest.java:87`).
  *
  * In Spark this is both the `Encoder` source for typed `Dataset[PaymentEvent]`
  * work and the `StructType` used by the JSON serde ([[PaymentSerde]]).
  */
final case class PaymentEvent(
    paymentId: String,
    amount: Long,
    currency: String,
    toAccount: String,
    fromAccount: String,
    rails: String
)

object PaymentEvent {

  /** Catalyst schema equivalent of the POJO (SURVEY.md §1.2). */
  val schema: StructType = StructType(
    Seq(
      StructField("paymentId", StringType),
      StructField("amount", LongType),
      StructField("currency", StringType),
      StructField("toAccount", StringType),
      StructField("fromAccount", StringType),
      StructField("rails", StringType)
    )
  )

  /** Currency enum values — reference `processor/Currency.java:3-6`. */
  object Currency {
    val GBP = "GBP"
    val USD = "USD"
  }

  /** Rails enum values — reference `processor/Rails.java:3-7`. */
  object Rails {
    val Foo = "BANK_RAILS_FOO"
    val Bar = "BANK_RAILS_BAR"
    val Xxx = "BANK_RAILS_XXX"
  }
}
