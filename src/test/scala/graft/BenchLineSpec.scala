package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Replay of the driver's bench capture (r16 verdict directive #1): the
  * harness keeps only the LAST 2000 chars of stdout and json-parses the
  * metric line. Round 16's board went unparsed when a StateStore
  * maintenance thread raced `spark.stop()` and dumped a ~1.1 KB WARN +
  * stack trace AFTER the line — together with sbt's "[success]" footer it
  * evicted the line head from the window. The fix is two-fold: Bench now
  * stops streams + state stores + Spark BEFORE printing (so shutdown noise
  * precedes the line), and the default line budget dropped 1850 → 1500 so
  * post-line headroom absorbs a stray trailing WARN plus the footer. This
  * spec replays the capture against a full-board-sized line under both the
  * fixed shapes and the r16 failure shape (which must still fail — proving
  * the replay is faithful, not vacuous).
  */
class BenchLineSpec extends AnyFunSuite {

  private val TailWindow = 2000
  private val mapper     = new ObjectMapper()

  /** A board the size of the current registry (219 rows), realistic name
    * lengths, deterministic times.
    */
  private val names: Seq[String] =
    (1 to 219).map(i => f"q$i%d_some_realistically_long_query_name")
  private val results: Map[String, Double] =
    names.zipWithIndex.map { case (n, i) => n -> (0.13 + i * 0.037) }.toMap

  /** The harness's parse: last [[TailWindow]] chars, find the metric line,
    * strict JSON parse. A truncated head never starts with the marker, so
    * eviction surfaces as None.
    */
  private def parseTail(stdout: String): Option[com.fasterxml.jackson.databind.JsonNode] =
    stdout.takeRight(TailWindow).linesIterator
      .find(_.startsWith("{\"metric\""))
      .flatMap(l => try Some(mapper.readTree(l)) catch { case _: Exception => None })

  // the r16 trailer, reconstructed at its observed size: a WARN header +
  // multi-frame stack trace from the maintenance thread
  private val shutdownWarn: String =
    "25/08/16 22:14:03 WARN StateStore: Error running maintenance thread\n" +
      "java.lang.IllegalStateException: SparkEnv not active, cannot do maintenance on StateStores\n" +
      (1 to 12).map(i =>
        s"\tat org.apache.spark.sql.execution.streaming.state.StateStore$$.anonfun$$maintenance$$$i(StateStore.scala:${600 + i})").mkString("\n")
  private val sbtFooter = "\n[success] Total time: 1234 s (20:34), completed Aug 16, 2026, 10:14:03 PM\n"

  test("board-sized line fits the default budget with tail-window headroom") {
    val line = Bench.buildLine(results, Nil, names, "sf0.1", 1500)
    assert(line.length <= 1500, s"line must respect the budget, got ${line.length}")
    // headroom invariant: line + footer + a stray 400-char trailing WARN
    // still fit the window — the margin the 1850 → 1500 cut buys
    assert(line.length + sbtFooter.length + 400 + 2 <= TailWindow,
      s"budget leaves no post-line headroom: ${line.length}")
    val node = mapper.readTree(line) // the full line is strict JSON
    assert(node.get("metric").asText == "total")
    assert(node.get("n_queries").asInt == 219)
    assert(node.get("n_failed").asInt == 0)
    // the slowest rows survive the budget-driven omission
    assert(node.get("queries").has("q219"), "slowest entries must survive the cap")
  }

  test("fixed shutdown order: the 1.1 KB maintenance WARN lands BEFORE the line and the tail parses") {
    assert(shutdownWarn.length >= 1000, s"replay trailer must be ~1.1 KB, got ${shutdownWarn.length}")
    val line   = Bench.buildLine(results, Nil, names, "sf0.1", 1500)
    val stdout = "[bench] warm-up done\n" + ("noise line\n" * 200) +
      shutdownWarn + "\n" + line + sbtFooter
    val node = parseTail(stdout).getOrElse(fail("metric line must survive the tail window"))
    assert(node.get("metric").asText == "total" && node.get("n_queries").asInt == 219)
  }

  test("post-line headroom: a stray 400-char trailing WARN plus the sbt footer cannot evict the line") {
    val line   = Bench.buildLine(results, Nil, names, "sf0.1", 1500)
    val stray  = "25/08/16 22:14:04 WARN SomeDaemon: late message " + ("x" * 352)
    val stdout = ("noise line\n" * 200) + line + "\n" + stray + sbtFooter
    val node = parseTail(stdout).getOrElse(fail("line must survive a stray post-line WARN"))
    assert(node.get("n_queries").asInt == 219)
  }

  test("r16 failure shape replays faithfully: old budget + post-line 1.1 KB trailer evicts the line") {
    val line   = Bench.buildLine(results, Nil, names, "sf0.1", 1850) // the old default
    val stdout = ("noise line\n" * 200) + line + "\n" + shutdownWarn + sbtFooter
    assert(parseTail(stdout).isEmpty,
      "the r16 shape must fail in this replay — otherwise the replay proves nothing")
  }

  test("failure list stays capped and the line parses with failures present") {
    val failed = (1 to 35).map(i => f"q$i%d_some_realistically_long_query_name")
    val ok     = results -- failed
    val line   = Bench.buildLine(ok, failed, names, "sf0.1", 1500)
    assert(line.length <= 1500)
    val node = mapper.readTree(line)
    assert(node.get("n_failed").asInt == 35) // true count survives the cap
    assert(node.get("failed").size == 8)     // printed list capped (round-7 lesson)
  }
}
