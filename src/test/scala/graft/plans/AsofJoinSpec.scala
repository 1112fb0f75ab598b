package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** The custom as-of join (logical node + strategy + merge exec) must match
  * the composed range-join+struct-max formulation on every edge: ties on
  * time (greatest tie-break wins), left rows with no match (dropped —
  * inner), multiple keys interleaved, and matches exactly AT the left time
  * (<= is inclusive). Plus plan-shape assertions: the strategy plans the
  * node, and EnsureRequirements inserts the exchanges/sorts the declared
  * requirements ask for.
  */
class AsofJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private val events = Seq(
    (1L, 10L, ts(100)), // u10: one order before -> matches
    (2L, 10L, ts(200)), // u10: two orders <= 200, one AT 200 -> inclusive, latest wins
    (3L, 20L, ts(50)),  // u20: no order at-or-before -> dropped (inner)
    (4L, 20L, ts(500)), // u20: tie on order time -> greatest orderkey wins
    (5L, 30L, ts(10))   // u30: no orders at all -> dropped
  ).toDF("event_id", "user_id", "ts")

  private val orders = Seq(
    (10L, 101L, ts(90)),
    (10L, 102L, ts(200)), // equal to event 2's time -> inclusive match
    (20L, 201L, ts(400)),
    (20L, 202L, ts(400)), // tie: same time, higher key must win
    (20L, 203L, ts(600))  // after event 4 -> ignored
  ).toDF("o_custkey", "o_orderkey", "o_ts")

  private def custom() =
    AsofJoinOps
      .asof(events, orders,
        events.col("user_id"), events.col("ts"),
        orders.col("o_custkey"), orders.col("o_ts"), orders.col("o_orderkey"))
      .select(col("event_id"), col("user_id"), col("o_orderkey").as("last_orderkey"))
      .orderBy(col("event_id"))

  test("crafted edges: inclusive <=, tie-break by greatest key, inner drop of unmatched") {
    val rows = custom().as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 10L, 101L), (2L, 10L, 102L), (4L, 20L, 202L)), rows.toString)
  }

  test("parity with the composed range-join + struct-max formulation") {
    val composed = events
      .join(orders, col("user_id") === col("o_custkey") && col("o_ts") <= col("ts"))
      .groupBy(col("event_id"), col("user_id"))
      .agg(max(struct(col("o_ts"), col("o_orderkey"))).as("m"))
      .select(col("event_id"), col("user_id"), col("m.o_orderkey").as("last_orderkey"))
      .orderBy(col("event_id"))
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    assert(custom().as[(Long, Long, Long)].collect().toSeq == composed)
  }

  test("tolerance bounds the backward search: out-of-window best match is dropped") {
    def run(tolSec: Long) =
      AsofJoinOps
        .asof(events, orders,
          events.col("user_id"), events.col("ts"),
          orders.col("o_custkey"), orders.col("o_ts"), orders.col("o_orderkey"),
          tolerance = Some(tolSec * 1000000L)) // timestamps surface as micros
        .select(col("event_id"), col("o_orderkey"))
        .as[(Long, Long)]
        .collect()
        .toMap
    // event 4 (t=500) best-matches order 202 (t=400): gap 100s
    assert(run(200L).get(4L).contains(202L), "in-window match must survive")
    assert(!run(50L).contains(4L), "out-of-window match must drop (inner)")
    // event 2 matches AT its own time (gap 0) — any tolerance keeps it
    assert(run(0L).get(2L).contains(102L))
  }

  test("null keys/times follow join semantics: never match, never crash") {
    val e = Seq(
      (1L, Option(10L), Option(ts(100))),
      (2L, None, Option(ts(100))),      // null key -> dropped
      (3L, Option(10L), None)           // null time -> dropped
    ).toDF("event_id", "user_id", "ts")
    val o = Seq(
      (Option(10L), 101L, Option(ts(90))),
      (None, 999L, Option(ts(90))),     // null right key -> matches nothing
      (Option(10L), 998L, None)         // null right time -> matches nothing
    ).toDF("o_custkey", "o_orderkey", "o_ts")
    val rows = AsofJoinOps
      .asof(e, o, e.col("user_id"), e.col("ts"), o.col("o_custkey"), o.col("o_ts"), o.col("o_orderkey"))
      .select(col("event_id"), col("o_orderkey"))
      .as[(Long, Long)]
      .collect()
      .toSeq
    assert(rows == Seq((1L, 101L)), rows.toString)
  }

  test("shared-lineage self-join is rejected fast instead of silently mis-binding") {
    val err = intercept[IllegalArgumentException] {
      AsofJoinOps.asof(events, events,
        events.col("user_id"), events.col("ts"),
        events.col("user_id"), events.col("ts"), events.col("event_id"))
    }
    assert(err.getMessage.contains("re-alias"), err.getMessage)
  }

  test("the strategy plans AsofJoinExec and the planner inserts hash exchanges + sorts") {
    val plan = custom().queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(800)) // SparkPlan.nodeName strips the Exec suffix
    assert(plan.contains("Exchange hashpartitioning"), "missing co-partition exchange:\n" + plan.take(800))
    assert(plan.contains("Sort ["), "missing merge-order sort:\n" + plan.take(800))
  }

  test("forward direction: inclusive >=, tie-break by LEAST key, shared match not consumed") {
    // forward contract on the same crafted data:
    //   event 1 (u10, t=100) -> first order at/after 100 is 102 (t=200)
    //   event 2 (u10, t=200) -> order 102 AT 200 (inclusive)
    //   event 3 (u20, t=50)  -> first future order tie at t=400: LEAST key 201
    //   event 4 (u20, t=500) -> order 203 (t=600)
    //   event 5 (u30, t=10)  -> no orders at all -> dropped
    val rows = AsofJoinOps
      .asof(events, orders,
        events.col("user_id"), events.col("ts"),
        orders.col("o_custkey"), orders.col("o_ts"), orders.col("o_orderkey"),
        direction = AsofDirection.Forward)
      .select(col("event_id"), col("o_orderkey"))
      .orderBy(col("event_id"))
      .as[(Long, Long)]
      .collect()
      .toSeq
    assert(rows == Seq((1L, 102L), (2L, 102L), (3L, 201L), (4L, 203L)), rows.toString)
    // events 1 and 2 BOTH matched order 102 — the head row serves multiple
    // left rows (forward matches are not consumed)
  }

  test("forward tolerance bounds the future search window") {
    def run(tolSec: Long) =
      AsofJoinOps
        .asof(events, orders,
          events.col("user_id"), events.col("ts"),
          orders.col("o_custkey"), orders.col("o_ts"), orders.col("o_orderkey"),
          tolerance = Some(tolSec * 1000000L),
          direction = AsofDirection.Forward)
        .select(col("event_id"), col("o_orderkey"))
        .as[(Long, Long)]
        .collect()
        .toMap
    // event 1 (t=100) -> order 102 (t=200): gap 100s
    assert(run(150L).get(1L).contains(102L))
    assert(!run(50L).contains(1L), "future match beyond tolerance must drop")
    // event 2 matches AT its own time (gap 0) — survives any tolerance
    assert(run(0L).get(2L).contains(102L))
  }

  test("nearest direction: closer candidate wins, distance tie prefers backward") {
    // event 1 (u10, t=100): backward 101@90 (d=10) vs forward 102@200 (d=100) -> 101
    // event 2 (u10, t=200): backward 102 AT 200 (d=0) -> 102
    // event 3 (u20, t=50):  no backward; forward 201@400 (d=350) -> 201
    // event 4 (u20, t=500): backward 202@400 (d=100) TIES forward 203@600 (d=100) -> backward 202
    // event 5 (u30, t=10):  no orders -> dropped
    def run(tol: Option[Long]) =
      AsofJoinOps
        .asof(events, orders,
          events.col("user_id"), events.col("ts"),
          orders.col("o_custkey"), orders.col("o_ts"), orders.col("o_orderkey"),
          tolerance = tol.map(_ * 1000000L),
          direction = AsofDirection.Nearest)
        .select(col("event_id"), col("o_orderkey"))
        .as[(Long, Long)]
        .collect()
        .toMap
    assert(run(None) == Map(1L -> 101L, 2L -> 102L, 3L -> 201L, 4L -> 202L))
    // tolerance applies to the CHOSEN candidate's distance
    val bounded = run(Some(50L))
    assert(bounded == Map(1L -> 101L, 2L -> 102L), bounded.toString)
  }

  test("left-outer keeps unmatched and null-key left rows with a null right side") {
    val rows = AsofJoinOps
      .asof(events, orders,
        events.col("user_id"), events.col("ts"),
        orders.col("o_custkey"), orders.col("o_ts"), orders.col("o_orderkey"),
        leftOuter = true)
      .select(col("event_id"), col("o_orderkey"))
      .orderBy(col("event_id"))
      .as[(Long, Option[Long])]
      .collect()
      .toSeq
    // matched rows identical to inner; events 3 (no prior order) and 5 (no
    // orders at all) survive with null
    assert(rows == Seq(
      1L -> Some(101L), 2L -> Some(102L), 3L -> None, 4L -> Some(202L), 5L -> None
    ), rows.toString)
    // the right-side output attribute is marked nullable in outer mode
    val outerDf = AsofJoinOps.asof(events, orders,
      events.col("user_id"), events.col("ts"),
      orders.col("o_custkey"), orders.col("o_ts"), orders.col("o_orderkey"),
      leftOuter = true)
    assert(outerDf.schema("o_orderkey").nullable)
  }

  test("forward parity with the composed min-struct formulation on real data") {
    val dir = "/root/testdata/sf0.001"
    // q105's orientation: orders -> earliest same-customer event at-or-after
    val composed = {
      val o = graft.sources.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_ts"))
      val e = graft.sources.Tables.events(spark, dir).select(col("user_id"), col("ts"), col("event_id"))
      o.join(e, col("o_custkey") === col("user_id") && col("ts") >= col("o_ts"))
        .groupBy(col("o_orderkey"), col("o_custkey"))
        .agg(min(struct(col("ts"), col("event_id"))).as("m"))
        .select(col("o_orderkey"), col("o_custkey"), col("m.event_id").as("next_event_id"))
        .orderBy(col("o_orderkey"))
        .as[(Long, Long, Long)]
        .collect()
        .toSeq
    }
    val viaNode = graft.SparkEntry
      .queries("q105_asof_forward")(spark, dir)
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    assert(composed.nonEmpty, "the forward gate must be non-vacuous at sf0.001")
    assert(viaNode == composed, s"custom=${viaNode.take(5)}... composed=${composed.take(5)}...")
  }

  test("adversarial time ranges cannot overflow tolerance/nearest arithmetic") {
    // Times spanning nearly the full Long range: rTime - lTime wraps
    // negative without the saturating distance. Forward with a tight
    // tolerance must NOT match (a wrapped difference would pass <= tol).
    val l = Seq((1L, 7L, Long.MinValue + 1)).toDF("lid", "k", "lt")
    val r = Seq((91L, 7L, Long.MaxValue - 1)).toDF("rid", "k2", "rt")
    val fwd = AsofJoinOps
      .asof(l, r, l.col("k"), l.col("lt"), r.col("k2"), r.col("rt"), r.col("rid"),
        tolerance = Some(10L), direction = AsofDirection.Forward)
      .select(col("lid"), col("rid"))
    assert(fwd.count() == 0L, "wrapped forward distance must not satisfy the tolerance")
    // Nearest: backward candidate at a distance that overflows, forward
    // candidate genuinely near — the near one must win (a wrapped backward
    // distance would spuriously look closest).
    val l2 = Seq((1L, 7L, Long.MaxValue - 100)).toDF("lid", "k", "lt")
    val r2 = Seq(
      (91L, 7L, Long.MinValue + 2), // backward, true distance ~2^64: wraps
      (92L, 7L, Long.MaxValue - 50) // forward, distance 50
    ).toDF("rid", "k2", "rt")
    val near = AsofJoinOps
      .asof(l2, r2, l2.col("k"), l2.col("lt"), r2.col("k2"), r2.col("rt"), r2.col("rid"),
        direction = AsofDirection.Nearest)
      .select(col("rid"))
      .as[Long]
      .collect()
      .toSeq
    assert(near == Seq(92L), s"nearest must pick the true-near forward row, got $near")
  }

  test("parity on real data: custom node equals q80's composition at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val composed = graft.SparkEntry
      .queries("q80_asof_join")(spark, dir)
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    val viaNode = graft.SparkEntry
      .queries("q88_asof_custom")(spark, dir)
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    assert(viaNode == composed, s"custom=${viaNode.take(5)}... composed=${composed.take(5)}...")
  }
}
