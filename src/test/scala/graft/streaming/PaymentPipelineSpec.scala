package graft.streaming

import graft.SparkSpec
import graft.model.{PaymentEvent, PaymentSerde}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Tier-2 streaming parity — the reference's integration scenario
  * (`KafkaStreamsPaymentIntegrationTest.java:150-204`) run through
  * Structured Streaming with a MemoryStream standing in for the broker:
  * same five golden payments, asserts outbound routing totals and the
  * queryable balance store's 200/404 contract, then a SECOND batch to prove
  * update-mode accumulation (the KTable changelog semantics).
  */
class PaymentPipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def golden = Seq(
    PaymentEvent("p1", 100L, "GBP", "DEF", "ABC", "BANK_RAILS_FOO"),
    PaymentEvent("p2", 50L, "GBP", "DEF", "ABC", "BANK_RAILS_FOO"),
    PaymentEvent("p3", 60L, "GBP", "DEF", "ABC", "BANK_RAILS_FOO"),
    PaymentEvent("p4", 1200L, "GBP", "DEF", "ABC", "BANK_RAILS_XXX"),
    PaymentEvent("p5", 1000L, "USD", "DEF", "XYZ", "BANK_RAILS_BAR")
  )

  test("streaming topology: routing + balances + 404 contract, two batches") {
    implicit val sqlCtx = spark.sqlContext
    val input   = MemoryStream[PaymentEvent]
    val tmp     = Files.createTempDirectory("graft-stream").toString
    val topo    = PaymentPipeline.start(input.toDF(), s"$tmp/ckpt", s"$tmp/sink")

    input.addData(golden: _*)
    topo.processAllAvailable()

    // Balance store: ABC=210, XYZ=800, DEF never sends -> None (HTTP 404).
    assert(topo.store.get("ABC").contains(210L))
    assert(topo.store.get("XYZ").contains(800L))
    assert(topo.store.get("DEF").isEmpty)

    // Outbound "topics": FOO got p1-p3, BAR got the FX-converted p5 (800 GBP).
    val sunk = spark.read.parquet(s"$tmp/sink")
    val foo  = sunk.filter($"topic" === "rails-foo-topic")
    val bar  = sunk.filter($"topic" === "rails-bar-topic")
    assert(foo.select("paymentId").as[String].collect().toSet == Set("p1", "p2", "p3"))
    assert(bar.select("paymentId", "amount", "currency").as[(String, Long, String)].collect().toSeq
      == Seq(("p5", 800L, "GBP")))

    // Second batch: update-mode accumulation — ABC grows, XYZ untouched.
    input.addData(PaymentEvent("p6", 40L, "GBP", "DEF", "ABC", "BANK_RAILS_FOO"))
    topo.processAllAvailable()
    assert(topo.store.get("ABC").contains(250L))
    assert(topo.store.get("XYZ").contains(800L))

    topo.stop()
  }

  test("restart from checkpoint recovers state and does not re-emit committed batches") {
    // The reference gets this from Kafka Streams' changelog-topic restore
    // (RocksDB state rebuilt on rebalance/restart); the Spark twin is
    // checkpoint recovery: offsets + state-store versions. Same source
    // instance, same checkpoint — stop, restart, feed more data.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PaymentEvent]
    val tmp   = Files.createTempDirectory("graft-restart").toString

    val run1 = PaymentPipeline.start(input.toDF(), s"$tmp/ckpt", s"$tmp/sink")
    input.addData(golden: _*)
    run1.processAllAvailable()
    assert(run1.store.get("ABC").contains(210L))
    run1.stop()

    val run2 = PaymentPipeline.start(input.toDF(), s"$tmp/ckpt", s"$tmp/sink")
    input.addData(PaymentEvent("p7", 30L, "GBP", "DEF", "ABC", "BANK_RAILS_FOO"))
    run2.processAllAvailable()
    // State recovered: 210 from before the restart + 30 — NOT 30 from zero.
    assert(run2.store.get("ABC").contains(240L), s"got ${run2.store.get("ABC")}")
    assert(run2.store.get("XYZ").contains(800L), "untouched key lost across restart")

    // Committed batches are not re-emitted: p1 still routed exactly once.
    val foo = spark.read.parquet(s"$tmp/sink").filter($"topic" === "rails-foo-topic")
    assert(foo.filter($"paymentId" === "p1").count() == 1, "committed batch replayed into the sink")
    assert(foo.select("paymentId").as[String].collect().toSet == Set("p1", "p2", "p3", "p7"))
    run2.stop()
  }

  test("single-pass pipeline: one query feeds both sinks and the balance store") {
    implicit val sqlCtx = spark.sqlContext
    val input          = MemoryStream[PaymentEvent]
    val tmp            = Files.createTempDirectory("graft-single").toString
    val (query, store) = PaymentPipeline.startSinglePass(input.toDF(), s"$tmp/ckpt", s"$tmp/sink")

    input.addData(golden: _*)
    query.processAllAvailable()
    input.addData(PaymentEvent("p6", 40L, "GBP", "DEF", "ABC", "BANK_RAILS_FOO"))
    query.processAllAvailable()

    assert(store.get("ABC").contains(250L) && store.get("XYZ").contains(800L) && store.get("DEF").isEmpty)
    val sunk = spark.read.parquet(s"$tmp/sink")
    assert(sunk.count() == 5) // p1-p3, p5 FX'd, p6; p4 dropped
    query.stop()
  }

  test("changelog stores are idempotent to crash-replayed batches (same batch_id re-appended)") {
    val tmp   = Files.createTempDirectory("graft-replay").toString
    val total = new PaymentPipeline.BalanceStore(spark, s"$tmp/totals")
    val batch = Seq(("ABC", 210L)).toDF("fromAccount", "balance")
    total.append(batch, 0L)
    total.append(batch, 0L) // replay: identical rows, same batch_id
    total.append(Seq(("ABC", 250L)).toDF("fromAccount", "balance"), 1L)
    assert(total.get("ABC").contains(250L), "last-wins read must ignore the replay")

    val delta = new PaymentPipeline.DeltaBalanceStore(spark, s"$tmp/deltas")
    val d0    = Seq(("XYZ", 800L)).toDF("fromAccount", "delta")
    delta.append(d0, 0L)
    delta.append(d0, 0L) // replay must NOT double-count
    delta.append(Seq(("XYZ", 40L)).toDF("fromAccount", "delta"), 1L)
    assert(delta.get("XYZ").contains(840L))
    assert(delta.get("NOPE").isEmpty)
  }

  test("changelog compaction bounds the store's read path across many batches") {
    // 13 direct appends (exactly what the stream's foreachBatch issues) with
    // compaction every 4 batches: correctness must survive each rewrite and
    // the data-file count must be bounded by the cadence, not batch count.
    val tmp   = Files.createTempDirectory("graft-compact").toString
    val store = new PaymentPipeline.BalanceStore(spark, s"$tmp/totals", compactEvery = 4L)
    val accounts = Seq("ABC", "XYZ", "DEF")
    (0L to 12L).foreach { b =>
      // rotate accounts so compactions interleave touched and untouched keys
      val acct = accounts((b % 3).toInt)
      store.append(Seq((acct, 100L * (b + 1))).toDF("fromAccount", "balance"), b)
    }
    // latest per key: ABC last wrote at b=12 (1300), XYZ at b=10 (1100), DEF at b=11 (1200)
    assert(store.get("ABC").contains(1300L))
    assert(store.get("XYZ").contains(1100L))
    assert(store.get("DEF").contains(1200L))
    assert(store.get("NOPE").isEmpty, "404 contract must survive compaction")
    // last append was batch 12 -> compaction just ran: exactly the compacted
    // file(s) remain. Without compaction this directory would hold 13 appends.
    assert(store.dataFileCount <= 2, s"unbounded changelog: ${store.dataFileCount} files")

    // And through the actual stream: 7 micro-batches, compactEvery=3.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PaymentEvent]
    val topo  = PaymentPipeline.start(input.toDF(), s"$tmp/ckpt", s"$tmp/sink", compactEvery = 3L)
    (1 to 7).foreach { i =>
      input.addData(PaymentEvent(s"s$i", 10L * i, "GBP", "DEF", "ACC", "BANK_RAILS_FOO"))
      topo.processAllAvailable()
    }
    assert(topo.store.get("ACC").contains((1 to 7).map(10L * _).sum), "balance wrong after streamed compactions")
    assert(topo.store.dataFileCount <= 4, s"stream changelog unbounded: ${topo.store.dataFileCount} files")
    topo.stop()
  }

  test("parallel compaction (compactPartitions > 1): same logical table, bounded files") {
    // the read path must be unchanged by HOW the rewrite is parallelized:
    // a 4-way key-hash repartitioned compact serves the exact snapshot the
    // single-file compact would, with at most compactPartitions data files
    val tmp = Files.createTempDirectory("graft-compact-par").toString
    val store = new PaymentPipeline.BalanceStore(
      spark, s"$tmp/totals", compactEvery = 0L, compactPartitions = 4)
    (0L to 9L).foreach { b =>
      store.append(Seq((s"A$b", 10L * b), ("SHARED", 100L * b)).toDF("fromAccount", "balance"), b)
    }
    val before = store.snapshot
    assert(store.dataFileCount > 4, s"fixture must start un-compacted, got ${store.dataFileCount}")
    store.compact()
    assert(store.dataFileCount <= 4, s"expected <= 4 files, got ${store.dataFileCount}")
    assert(store.snapshot == before, "parallel compaction must not change the logical table")
    assert(store.get("SHARED").contains(900L) && store.get("A3").contains(30L))
  }

  test("delta-store compaction: cutoff rides in the base tag, every mixed state reads correctly") {
    val tmp   = Files.createTempDirectory("graft-delta-compact").toString
    val store = new PaymentPipeline.DeltaBalanceStore(spark, s"$tmp/deltas")
    (0L to 9L).foreach { b =>
      store.append(Seq(("ABC", 10L), ("XYZ", 5L)).toDF("fromAccount", "delta"), b)
    }
    store.append(Seq(("ABC", 10L), ("XYZ", 5L)).toDF("fromAccount", "delta"), 3L) // replay pre-cutoff
    store.compact(5L)
    assert(store.get("ABC").contains(100L), "sum must survive compaction (and the replay)")
    assert(store.dataFileCount <= 2, s"unbounded: ${store.dataFileCount}")
    // replay of a KEPT batch after compaction must still dedup
    store.append(Seq(("ABC", 10L), ("XYZ", 5L)).toDF("fromAccount", "delta"), 7L)
    assert(store.get("XYZ").contains(50L), "post-compaction replay double-counted")
    // the crash window: a stale pre-cutoff row lingering NEXT TO the base
    // (compaction appended but not yet deleted) must be ignored by reads —
    // the winning base's cutoff filter is what guarantees it
    store.append(Seq(("ABC", 999L)).toDF("fromAccount", "delta"), 2L)
    assert(store.get("ABC").contains(100L), "stale pre-cutoff row was double-counted")
    // recompaction with the stale row present stays correct and re-bounds files
    store.compact(9L)
    assert(store.get("ABC").contains(100L) && store.get("XYZ").contains(50L))
    assert(store.dataFileCount <= 2, s"recompaction unbounded: ${store.dataFileCount}")

    // through the stream: 7 batches, compactEvery=3 -> bounded files, right sum
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PaymentEvent]
    val (query, s2) = PaymentPipeline.startSinglePass(input.toDF(), s"$tmp/ckpt", s"$tmp/sink", compactEvery = 3L)
    (1 to 7).foreach { i =>
      input.addData(PaymentEvent(s"d$i", 10L * i, "GBP", "DEF", "ACC", "BANK_RAILS_FOO"))
      query.processAllAvailable()
    }
    assert(s2.get("ACC").contains((1 to 7).map(10L * _).sum), "delta balance wrong after streamed compactions")
    assert(s2.dataFileCount <= 4, s"stream delta changelog unbounded: ${s2.dataFileCount} files")
    query.stop()
  }

  test("kafka codec round-trip: encode -> decode preserves the record (O1/O11/O14/O15)") {
    val df      = golden.toDF()
    val encoded = PaymentSerde.encodeKafka(df) // (key, value) wire shape
    assert(encoded.columns.toSeq == Seq("key", "value"))
    val decoded = PaymentSerde.decodeKafka(encoded)
    val back    = decoded.drop("kafkaKey").as[PaymentEvent].collect().toSet
    assert(back == golden.toSet)
    // key = paymentId (the reference's record-key contract)
    assert(decoded.select("kafkaKey").as[String].collect().toSet == golden.map(_.paymentId).toSet)
  }

  test("serde leniency: unknown fields ignored, missing -> null, corrupt -> null row") {
    val raw = Seq(
      """{"paymentId":"x1","amount":7,"currency":"GBP","toAccount":"t","fromAccount":"f","rails":"BANK_RAILS_FOO","extra":"IGNORED"}""",
      """{"paymentId":"x2"}""",
      """not-json"""
    ).toDF("value")
    val parsed = raw.select(PaymentSerde.fromJson($"value").as("p")).select("p.*")
    val rows   = parsed.collect()
    assert(rows(0).getString(0) == "x1" && rows(0).getLong(1) == 7L)
    assert(rows(1).getString(0) == "x2" && rows(1).isNullAt(1), "missing fields -> null")
    assert(rows(2).isNullAt(0), "corrupt json -> null row (PERMISSIVE)")
  }

  test("null payload bytes decode to a null record over binary wire columns (JsonDeserializer.java:24-25)") {
    // The kafka source yields BinaryType key/value; a tombstone has value=null.
    val wire = Seq(
      ("p1".getBytes("UTF-8"),
       """{"paymentId":"p1","amount":5,"currency":"GBP","toAccount":"t","fromAccount":"f","rails":"BANK_RAILS_FOO"}"""
         .getBytes("UTF-8")),
      ("p2".getBytes("UTF-8"), null: Array[Byte])
    ).toDF("key", "value")
    val decoded = PaymentSerde.decodeKafka(wire).collect()
    assert(decoded(0).getString(0) == "p1" && decoded(0).getString(1) == "p1")
    // null payload -> null record: every payment field null, key still present
    assert(decoded(1).getString(0) == "p2")
    (1 until decoded(1).length).foreach(i => assert(decoded(1).isNullAt(i), s"field $i"))
  }

  test("strict serde throws on malformed JSON (reference fail-fast, JsonDeserializer.java:27-31)") {
    val raw = Seq("""not-json""").toDF("value")
    val ex = intercept[Exception] {
      raw.select(PaymentSerde.fromJsonStrict($"value").as("p")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") || ex.getCause != null)
  }

  test("describe returns a non-empty plan mentioning the aggregation (O13)") {
    val plan = PaymentPipeline.describe(
      graft.operators.PaymentOps.topology(golden.toDF()).balances)
    assert(plan.nonEmpty && plan.contains("Aggregate"))
  }
}
