package graft.streaming

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Real-socket checks of the interactive-query HTTP surface — mirrors the
  * reference's integration assertions: 200 with the balance for a present
  * account, 404 for an absent one, and a topology body naming the source
  * (`KafkaStreamsPaymentIntegrationTest.java:195-220`).
  */
class RestServiceSpec extends AnyFunSuite with SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString()
    )

  /** Raw-socket GET for request lines java.net.URI itself refuses to
    * build (malformed percent escapes) — the server must still answer
    * them with a clean status. Returns the status code.
    */
  private def rawGet(port: Int, path: String): Int = {
    val sock = new java.net.Socket("localhost", port)
    try {
      val out = sock.getOutputStream
      out.write(s"GET $path HTTP/1.1\r\nHost: localhost\r\nConnection: close\r\n\r\n".getBytes("US-ASCII"))
      out.flush()
      val line = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "US-ASCII")).readLine()
      line.split(" ")(1).toInt
    } finally sock.close()
  }

  test("balance endpoint: 200 + Long body for present accounts, 404 for absent (BalanceController contract)") {
    val balances = Map("ABC" -> 210L, "XYZ" -> 800L)
    val svc = new RestService(balances.get, () => "plan").start()
    try {
      val ok = get(svc.boundPort, "/v1/kafka-streams/balance/ABC")
      assert(ok.statusCode() == 200 && ok.body() == "210")
      val fx = get(svc.boundPort, "/v1/kafka-streams/balance/XYZ")
      assert(fx.statusCode() == 200 && fx.body() == "800")
      // DEF never SENT a payment -> no state -> 404 (the reference's null case)
      val absent = get(svc.boundPort, "/v1/kafka-streams/balance/DEF")
      assert(absent.statusCode() == 404 && absent.body().isEmpty)
    } finally svc.stop()
  }

  test("topology endpoint returns the plan text (TopologyController contract)") {
    val plan = PaymentPipeline.describe(
      graft.operators.PaymentOps.topology(
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          graft.model.PaymentEvent.schema)).balances)
    val svc = new RestService(_ => None, () => plan).start()
    try {
      val r = get(svc.boundPort, "/v1/kafka-streams/topology")
      // the reference asserts its source topic appears in the describe body;
      // ours names the aggregation the topology materializes
      assert(r.statusCode() == 200 && r.body().contains("Aggregate"))
    } finally svc.stop()
  }

  test("handler exception yields a generic 500 and the server survives") {
    val svc = new RestService(
      acct => if (acct == "BOOM") throw new RuntimeException("secret internal detail") else Some(1L),
      () => "plan"
    ).start()
    try {
      val boom = get(svc.boundPort, "/v1/kafka-streams/balance/BOOM")
      assert(boom.statusCode() == 500)
      assert(!boom.body().contains("secret"), "exception message must not leak into the body")
      // the service keeps serving after a handler failure
      val ok = get(svc.boundPort, "/v1/kafka-streams/balance/OK")
      assert(ok.statusCode() == 200 && ok.body() == "1")
    } finally svc.stop()
  }

  test("dim endpoint: 200 + version-at-T JSON, 404 for absent/pre-history, 400 for malformed (BalanceController contract on the SCD tier)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-rest-dim")
    graft.sources.SessionMemo.deleteOnExit(tmp)
    val store = new ScdStore(spark, s"$tmp/store", graft.queries.EventQueries.ScdOpenEnd)
    store.merge(
      Seq(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L, 100L),
        (1L, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 11L, 250L))
        .toDF("user_id", "ts", "event_id", "cents"),
      0L)
    val svc = new RestService(_ => None, () => "plan", getDimAt = RestService.dimLookup(store)).start()
    try {
      // epoch-µs instant inside v1's interval
      val usAt = java.sql.Timestamp.valueOf("2024-01-02 00:00:00").getTime * 1000L
      val r1 = get(svc.boundPort, s"/v1/kafka-streams/dim/1?at=$usAt")
      assert(r1.statusCode() == 200 && r1.body().contains("\"version\":1")
        && r1.body().contains("\"cents\":100"), r1.body())
      // timestamp-literal instant (URL-encoded) inside the open v2
      val r2 = get(svc.boundPort, "/v1/kafka-streams/dim/1?at=2024-01-03%2012:00:00")
      assert(r2.statusCode() == 200 && r2.body().contains("\"version\":2")
        && r2.body().contains("\"cents\":250"), r2.body())
      // unknown user and pre-history instant are the reference's null→404
      assert(get(svc.boundPort, s"/v1/kafka-streams/dim/999?at=$usAt").statusCode() == 404)
      assert(get(svc.boundPort, "/v1/kafka-streams/dim/1?at=2023-01-01%2000:00:00").statusCode() == 404)
      // malformed user / missing or unparseable instant
      assert(get(svc.boundPort, s"/v1/kafka-streams/dim/zap?at=$usAt").statusCode() == 400)
      assert(get(svc.boundPort, "/v1/kafka-streams/dim/1").statusCode() == 400)
      assert(get(svc.boundPort, "/v1/kafka-streams/dim/1?at=whenever").statusCode() == 400)
      // a MALFORMED percent escape is the route's documented 400, not a
      // 500 from a decode throw (the raw query is decoded exactly once,
      // inside a Try); sent over a raw socket — java.net.URI refuses to
      // even build these
      assert(rawGet(svc.boundPort, "/v1/kafka-streams/dim/1?at=2024%") == 400)
      assert(rawGet(svc.boundPort, "/v1/kafka-streams/dim/1?at=%zz") == 400)
      // '+'-encoded space (the other standard form-encoding of the
      // timestamp literal) decodes once to the same instant as %20
      val r3 = get(svc.boundPort, "/v1/kafka-streams/dim/1?at=2024-01-03+12:00:00")
      assert(r3.statusCode() == 200 && r3.body().contains("\"version\":2"), r3.body())
    } finally svc.stop()
  }

  test("end-to-end: HTTP reads see the streaming store's state as batches commit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.model.PaymentEvent]
    val tmp   = java.nio.file.Files.createTempDirectory("graft-rest").toString
    val t     = PaymentPipeline.start(input.toDF(), s"$tmp/ckpt", s"$tmp/sink")
    val svc   = RestService.forTopology(t, "plan").start()
    try {
      input.addData(
        graft.model.PaymentEvent("p1", 100, "GBP", "SINK", "ABC", "BANK_RAILS_FOO"),
        graft.model.PaymentEvent("p2", 110, "GBP", "SINK", "ABC", "BANK_RAILS_FOO"))
      t.processAllAvailable()
      val r1 = get(svc.boundPort, "/v1/kafka-streams/balance/ABC")
      assert(r1.statusCode() == 200 && r1.body() == "210")
      assert(get(svc.boundPort, "/v1/kafka-streams/balance/NOPE").statusCode() == 404)
      // a later batch is visible to subsequent reads (eventual consistency)
      input.addData(graft.model.PaymentEvent("p3", 40, "GBP", "SINK", "ABC", "BANK_RAILS_FOO"))
      t.processAllAvailable()
      assert(get(svc.boundPort, "/v1/kafka-streams/balance/ABC").body() == "250")
    } finally { svc.stop(); t.stop() }
  }
}
