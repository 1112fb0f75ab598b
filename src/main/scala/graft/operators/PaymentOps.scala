package graft.operators

import graft.model.PaymentEvent.{Currency, Rails}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The reference topology's operators (SURVEY.md §2, O3–O10), each a pure
  * `DataFrame => DataFrame` so the SAME function runs in batch (parquet in →
  * parquet out, the driver's DuckDB-verified path) and in Structured
  * Streaming (MemoryStream/Kafka in).
  *
  * Scale notes (100 TB): every operator here is a narrow, stateless,
  * whole-stage-codegen-friendly transformation — filters and projections that
  * Catalyst pushes into the parquet scan, a `when`-chain tag for branching
  * (one pass, no re-scan per branch), and a `unionByName` that adds no
  * shuffle. The only shuffle in the whole topology is the one the semantics
  * require: the groupBy in [[balances]] (the reference's repartition topic,
  * `PaymentTopology.java:76-77`).
  */
object PaymentOps {

  /** Whitelist built at reference `PaymentTopology.java:33`. */
  val SupportedRails: Seq[String] = Seq(Rails.Foo, Rails.Bar)

  /** Hard-coded USD→GBP rate — reference `PaymentTopology.java:58`. */
  val UsdToGbpRate: Double = 0.8

  /** O3 — keep records whose rails is in the whitelist; `BANK_RAILS_XXX`
    * dropped. Reference `PaymentTopology.java:45-46`. Catalyst pushes the
    * `IN` predicate into the parquet scan in batch mode.
    */
  def railsFilter(df: DataFrame, supported: Seq[String] = SupportedRails): DataFrame =
    df.filter(col("rails").isin(supported: _*))

  /** Kafka Streams first-match branch semantics (`KStream#branch`): a record
    * goes to the FIRST predicate it matches, and records matching none are
    * SILENTLY DROPPED (reference `PaymentTopology.java:49-53,90-93`; SURVEY.md
    * §7.4 Hard #2). Implemented as a single-pass `when`-chain tag column —
    * with overlapping predicates, two plain filters would duplicate records;
    * the tag keeps routing exclusive and costs one scan regardless of the
    * branch count.
    *
    * @return the input plus `tagCol` holding the branch name; no-match rows
    *         are dropped (tag would be null).
    */
  def branchFirstMatch(df: DataFrame, tagCol: String, branches: Seq[(String, Column)]): DataFrame = {
    require(branches.nonEmpty, "branchFirstMatch needs at least one branch")
    val tag = branches.tail
      .foldLeft(when(branches.head._2, lit(branches.head._1))) { case (acc, (name, pred)) =>
        acc.when(pred, lit(name))
      }
    df.withColumn(tagCol, tag).filter(col(tagCol).isNotNull)
  }

  /** Materialize the tagged branches as separate DataFrames (the reference's
    * `KStream[]` shape). Prefer consuming the single tagged frame (one scan,
    * e.g. a partitioned write); use this only when branches truly diverge.
    */
  def splitBranches(df: DataFrame, tagCol: String, branches: Seq[(String, Column)]): Seq[DataFrame] = {
    val tagged = branchFirstMatch(df, tagCol, branches)
    branches.map { case (name, _) => tagged.filter(col(tagCol) === name).drop(tagCol) }
  }

  /** O4 — branch by currency: branch 0 = GBP, branch 1 = USD; anything else
    * dropped (only GBP/USD exist in `Currency.java:3-6`, but O3 does not
    * check currency, so the drop rule is part of the contract). Reference
    * `PaymentTopology.java:49-53`.
    */
  def branchByCurrency(df: DataFrame): Seq[DataFrame] =
    splitBranches(
      df,
      "currencyBranch",
      Seq(Currency.GBP -> (col("currency") === Currency.GBP),
          Currency.USD -> (col("currency") === Currency.USD))
    )

  /** O5 — FX conversion on the USD branch: `amount = Math.round(amount*0.8)`,
    * `currency = "GBP"`, all other fields (and the record key) unchanged.
    * Reference `PaymentTopology.java:54-68`.
    *
    * Rounding parity is EXACT on the full double range: `Math.round(double)`
    * is floor(x + 0.5) in EXACT real arithmetic, which the naive IEEE
    * `floor(x + 0.5)` does NOT compute — the addition itself rounds, so
    * x = 0.49999999999999994 gives floor(1.0) = 1 while Math.round
    * (post-JDK-6430675) correctly returns 0, and odd integers in
    * [2^52, 2^53) bump to even. The exact form used here is
    * `floor(x) + [x - floor(x) >= 0.5]`: for |x| < 2^52 the fractional
    * part `x - floor(x)` is computed exactly in IEEE (both operands
    * representable, difference < 1), and for |x| >= 2^52 x is already an
    * integer so the correction term is 0 — Math.round semantics at every
    * double. (Spark's `round(_, 0)` HALF_UP additionally disagrees at
    * negative exact-.5 points: Math.round(-2.5) = -2, HALF_UP gives -3.
    * See PaymentOpsSpec for both boundary regressions.)
    */
  def fxConvert(df: DataFrame, rate: Double = UsdToGbpRate): DataFrame = {
    val x = col("amount") * lit(rate)
    val f = floor(x) // LongType
    df.withColumn(
        "amount",
        (f + when(x - f.cast("double") >= 0.5, lit(1L)).otherwise(lit(0L))).cast(LongType))
      .withColumn("currency", lit(Currency.GBP))
  }

  /** O6 — merge (UNION ALL, order-free, no dedup). Reference
    * `PaymentTopology.java:70-72`. `unionByName` so column order in the
    * branches cannot silently mis-zip.
    */
  def merge(dfs: DataFrame*): DataFrame = dfs.reduce(_.unionByName(_))

  /** O7 — re-key projection `(paymentId, event) → (fromAccount, amount)`.
    * Reference `PaymentTopology.java:76`. In Kafka Streams the key change
    * forces a repartition topic; in Spark the equivalent shuffle is fused
    * into the downstream groupBy ([[balances]]) — Catalyst prunes every
    * other column from the scan.
    */
  def rekeyToAccountAmount(df: DataFrame): DataFrame =
    df.select(col("fromAccount"), col("amount"))

  /** O8+O9 — grouped running balance: `fromAccount → Σ amount`, the
    * reference's `"balance"` KTable (`PaymentTopology.java:75-88`:
    * initializer 0L, aggregator agg+value, no window, no TTL).
    *
    * Batch: a plain hash aggregate (partial map-side combine + one shuffle).
    * Streaming: run with `outputMode("update")` — each micro-batch emits the
    * updated per-key sums exactly like the KTable changelog.
    */
  def balances(df: DataFrame): DataFrame =
    rekeyToAccountAmount(df)
      .groupBy(col("fromAccount"))
      .agg(sum(col("amount")).as("balance"))

  /** Skew-resistant variant of [[balances]]: two-level salted aggregation.
    * A hot `fromAccount` (one key receiving a large fraction of the stream)
    * would funnel into a single reduce task; salting spreads it across
    * `saltBuckets` partial sums, and the second (tiny) aggregation folds
    * the partials. Sum is associative+commutative, so the result is
    * IDENTICAL to [[balances]] — asserted in PaymentOpsSpec.
    *
    * At 100 TB prefer AQE's skew-join/agg handling first; explicit salting
    * is for known-pathological keys. The salt is `pmod(hash(paymentId), n)`
    * — deterministic per record, uniform across buckets.
    */
  def balancesSalted(df: DataFrame, saltBuckets: Int = 16): DataFrame =
    df.select(col("fromAccount"), col("amount"), pmod(hash(col("paymentId")), lit(saltBuckets)).as("salt"))
      .groupBy(col("fromAccount"), col("salt"))
      .agg(sum(col("amount")).as("partial"))
      .groupBy(col("fromAccount"))
      .agg(sum(col("partial")).as("balance"))

  /** O10 — branch by rails on the merged stream: FOO / BAR (nothing can miss
    * both, O3 guaranteed the whitelist). Reference `PaymentTopology.java:90-93`.
    */
  def branchByRails(df: DataFrame): Seq[DataFrame] =
    splitBranches(
      df,
      "railsBranch",
      Seq(Rails.Foo -> (col("rails") === Rails.Foo),
          Rails.Bar -> (col("rails") === Rails.Bar))
    )

  /** The full reference dataflow O3→O10 on a payment-shaped DataFrame,
    * returning (foo-sink stream, bar-sink stream, balance table) — the three
    * outputs of `PaymentTopology.buildPipeline` (`PaymentTopology.java:39-98`).
    */
  def topology(payments: DataFrame): PaymentTopology = {
    val supported        = railsFilter(payments)
    val Seq(gbp, usd)    = branchByCurrency(supported)
    val merged           = merge(gbp, fxConvert(usd))
    val Seq(foo, bar)    = branchByRails(merged)
    PaymentTopology(foo, bar, balances(merged), merged)
  }
}

/** Outputs of the reference topology: two outbound record streams and the
  * queryable balance changelog (reference topics `rails-foo-topic`,
  * `rails-bar-topic`, store `"balance"` — `application.yml:13-15`,
  * `PaymentTopology.java:88,95-97`).
  */
final case class PaymentTopology(foo: DataFrame, bar: DataFrame, balances: DataFrame, merged: DataFrame)
