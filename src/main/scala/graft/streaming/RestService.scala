package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** The reference's interactive-query HTTP surface, re-expressed over the
  * streaming state this engine maintains:
  *
  *   - `GET /v1/kafka-streams/balance/{account}` — point lookup against the
  *     [[PaymentPipeline.BalanceStore]] changelog; absent key ⇒ HTTP 404,
  *     present ⇒ 200 with the Long balance as the body. Twin of
  *     `controller/BalanceController.java:22-35` (store `get`, null→404).
  *   - `GET /v1/kafka-streams/topology` — the current plan text, twin of
  *     `controller/TopologyController.java:20-23` (`Topology#describe`).
  *
  * Built on the JDK's `com.sun.net.httpserver` so the library adds no HTTP
  * dependency; a production deployment would front the same two functions
  * with its own stack. The handler thread only runs the store's point-lookup
  * SQL (a pushed-down parquet filter) — the same worker-thread-reads-
  * streams-thread-state shape (and eventual-consistency window) the
  * reference's integration test tolerates
  * (`KafkaStreamsPaymentIntegrationTest.java:185-204`).
  */
final class RestService(
    getBalance: String => Option[Long],
    describeTopology: () => String,
    port: Int = 0 // 0 = ephemeral (tests); fixed port in deployment
) {

  private val server: HttpServer = HttpServer.create(new InetSocketAddress(port), 0)

  private val BalancePath = "/v1/kafka-streams/balance/"

  server.createContext(
    BalancePath,
    (ex: HttpExchange) => respondWith(ex) {
      val account = ex.getRequestURI.getPath.stripPrefix(BalancePath)
      getBalance(account) match {
        case Some(balance) => (200, balance.toString) // HTTP 200 + Long body
        case None          => (404, "")               // null ⇒ NOT_FOUND
      }
    }
  )

  server.createContext(
    "/v1/kafka-streams/topology",
    (ex: HttpExchange) => respondWith(ex)((200, describeTopology()))
  )

  private def respondWith(ex: HttpExchange)(body: => (Int, String)): Unit =
    try {
      val (status, text) =
        try body
        catch { case e: Throwable => (500, Option(e.getMessage).getOrElse(e.getClass.getName)) }
      val bytes          = text.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
      // contract quirk: a 404 with -1 means empty body (HttpServer API)
      ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length.toLong)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    } finally ex.close()

  def start(): RestService = { server.start(); this }

  /** Bound port (after start; useful with port=0). */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)
}

object RestService {

  /** Wire the service straight onto a running topology. */
  def forTopology(running: PaymentPipeline.RunningTopology, planText: String, port: Int = 0): RestService =
    new RestService(running.store.get, () => planText, port)
}
