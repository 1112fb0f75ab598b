package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins, composed from existing
  * ops (preference (a) of the custom-operator ladder — no custom plan node
  * needed because the compositions carry the exact semantics):
  *
  *   - **as-of join** (q80): each event matched to the latest order at or
  *     before its timestamp for the same user. Composed as a range join +
  *     `max(struct(time, key))` per event — the struct max gives a total
  *     order (latest date, then highest key), so ties are deterministic.
  *     At 100 TB the range join's fan-out is bounded by per-key history
  *     length; for long histories the union-window formulation **q82** (sort
  *     both sides once per key, running `last` over the interleaving)
  *     replaces the join without changing results — the driver verifies q82
  *     against q80's own oracle.
  *   - **range join** (q81): same-customer order pairs within a bounded
  *     time band (repeat purchases). At scale this wants time-bucketing on
  *     both sides (join on coarse bucket, filter exact range) so the join
  *     key is equi-joinable — the composed form here expresses the
  *     semantics with the equi-key (customer) carrying the join.
  */
object TemporalJoinQueries {

  private val RangeDays = 7

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of join: latest order at-or-before each event, per user.
    "q80_asof_join" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("event_id"), col("ts"), col("user_id"))
      val o = Tables
        .orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      e.join(o, col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"))
        .groupBy(col("event_id"), col("user_id"))
        .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
        .select(col("event_id"), col("user_id"), col("m.o_orderkey").as("last_orderkey"))
        .orderBy(col("event_id"))
    }),

    // As-of join, union-window formulation: SAME result set as q80 (the
    // driver checks it against q80's oracle), different physical shape.
    // Both sides are tagged and unioned, sorted once per user by
    // (time, orders-before-events, orderkey), and each event reads the
    // running `last(order key)` over the interleaving. Work is
    // O((events + orders) log) per key with NO event×history fan-out —
    // the form that wins when per-key histories are long (q80's range join
    // materializes every (event, prior-order) pair before aggregating).
    // Determinism: ties inside the frame only ever tie between events,
    // which carry null order keys and are ignored by last(ignoreNulls).
    "q82_asof_union_window" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(
        col("user_id"),
        col("ts").as("t"),
        lit(1).as("kind"), // events AFTER orders at the same instant: <= is inclusive
        col("event_id"),
        lit(null).cast("long").as("ok")
      )
      val o = Tables.orders(s, dir).select(
        col("o_custkey").as("user_id"),
        col("o_orderdate").cast("timestamp").as("t"), // same coercion the q80 join predicate uses
        lit(0).as("kind"),
        lit(null).cast("long").as("event_id"),
        col("o_orderkey").as("ok")
      )
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("t"), col("kind"), col("ok")) // orderkey asc ⇒ running last = max at equal dates
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.unionByName(o)
        .withColumn("last_ok", last(col("ok"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1 && col("last_ok").isNotNull)
        .select(col("event_id"), col("user_id"), col("last_ok").as("last_orderkey"))
        .orderBy(col("event_id"))
    }),

    // As-of join through the CUSTOM PLAN NODE (graft.plans.AsofJoin:
    // logical node + strategy + single-pass merge exec) — same result set
    // as q80/q82, verified against q80's own oracle. The physical shape is
    // the one a 100 TB run wants: co-partition on the key, sort (key,
    // time), merge with one buffered row of state — no event×history
    // fan-out (q80's range join) and no window buffer (q82).
    "q88_asof_custom" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("event_id"), col("ts"), col("user_id"))
      val o = Tables
        .orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate").cast("timestamp").as("o_ts"))
      graft.plans.AsofJoinOps
        .asof(e, o, e.col("user_id"), e.col("ts"), o.col("o_custkey"), o.col("o_ts"), o.col("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("o_orderkey").as("last_orderkey"))
        .orderBy(col("event_id"))
    }),

    // The custom node with a TOLERANCE bound (pandas merge_asof parity):
    // only orders within the last 9000 days of the event qualify (the
    // harness corpora are epochs apart — 9000 days drops ~3% of matches,
    // so the bound demonstrably discriminates). The form a
    // feature-engineering pipeline ships ("most recent purchase, but only
    // if recent enough"). Same merge, one extra comparison at emit.
    "q89_asof_tolerance" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("event_id"), col("ts"), col("user_id"))
      val o = Tables
        .orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate").cast("timestamp").as("o_ts"))
      graft.plans.AsofJoinOps
        .asof(e, o, e.col("user_id"), e.col("ts"), o.col("o_custkey"), o.col("o_ts"), o.col("o_orderkey"),
          tolerance = Some(9000L * 86400L * 1000000L)) // 9000 days in micros
        .select(col("event_id"), col("user_id"), col("o_orderkey").as("last_orderkey"))
        .orderBy(col("event_id"))
    }),

    // FORWARD as-of through the custom node: the EARLIEST order at-or-after
    // each event per user — the "time-to-next-purchase" feature twin of
    // q88's backward lookup (pandas merge_asof direction='forward'). Ties
    // resolve to the least orderkey (the merge's first-row-wins), which the
    // independent oracle mirrors with an ASC/ASC row_number pick.
    "q105_asof_forward" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("event_id"), col("ts"), col("user_id"))
      val o = Tables
        .orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate").cast("timestamp").as("o_ts"))
      graft.plans.AsofJoinOps
        .asof(e, o, e.col("user_id"), e.col("ts"), o.col("o_custkey"), o.col("o_ts"), o.col("o_orderkey"),
          direction = graft.plans.AsofDirection.Forward)
        .select(col("event_id"), col("user_id"), col("o_orderkey").as("next_orderkey"))
        .orderBy(col("event_id"))
    }),

    // LEFT OUTER as-of (pandas merge_asof's own join type): every event
    // survives; those with no prior order carry a null orderkey. The
    // enrichment shape a feature pipeline actually ships — rows without
    // history must reach the model with the feature absent, not vanish.
    "q109_asof_outer" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("event_id"), col("ts"), col("user_id"))
      val o = Tables
        .orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate").cast("timestamp").as("o_ts"))
      graft.plans.AsofJoinOps
        .asof(e, o, e.col("user_id"), e.col("ts"), o.col("o_custkey"), o.col("o_ts"), o.col("o_orderkey"),
          leftOuter = true)
        .select(col("event_id"), col("user_id"), col("o_orderkey").as("last_orderkey"))
        .orderBy(col("event_id"))
    }),

    // NEAREST as-of: whichever order is closest in time to the event,
    // before or after (distance ties prefer the backward candidate —
    // pandas merge_asof direction='nearest'). The merge holds both
    // candidates anyway (buffered backward best + cursor head), so this is
    // one extra comparison per left row, not a second pass.
    "q106_asof_nearest" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("event_id"), col("ts"), col("user_id"))
      val o = Tables
        .orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate").cast("timestamp").as("o_ts"))
      graft.plans.AsofJoinOps
        .asof(e, o, e.col("user_id"), e.col("ts"), o.col("o_custkey"), o.col("o_ts"), o.col("o_orderkey"),
          direction = graft.plans.AsofDirection.Nearest)
        .select(col("event_id"), col("user_id"), col("o_orderkey").as("near_orderkey"))
        .orderBy(col("event_id"))
    }),

    // Range join: same-customer order pairs placed within a week of each
    // other (repeat-purchase detection — bounded-band temporal self-join).
    "q81_range_join" -> ((s, dir) => {
      val a = Tables.orders(s, dir)
        .select(col("o_custkey").as("ck"), col("o_orderkey").as("k1"), col("o_orderdate").as("d1"))
      val b = Tables.orders(s, dir)
        .select(col("o_custkey").as("ck"), col("o_orderkey").as("k2"),
          col("o_orderdate").as("d2"), col("o_totalprice").as("p2"))
      a.join(
          b,
          Seq("ck")
        )
        .filter(col("d2") > col("d1") && col("d2") <= col("d1") + expr(s"INTERVAL $RangeDays DAYS"))
        .groupBy(col("ck"))
        .agg(
          count(lit(1)).as("n_pairs"),
          (sum(round(col("p2") * 100).cast("long")).cast("double") / 100.0).as("followup_total")
        )
        .orderBy(col("ck"))
    })
  )

  val oracles: Map[String, String] = Map(
    // Independent formulation: DuckDB's row_number pick of the latest
    // (date, key) — must equal the Spark struct-max composition.
    "q80_asof_join" ->
      """SELECT event_id, user_id, o_orderkey AS last_orderkey FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    // Same oracle as q80 on purpose: the union-window form must reproduce
    // the range-join+struct-max result exactly.
    "q82_asof_union_window" ->
      """SELECT event_id, user_id, o_orderkey AS last_orderkey FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    // Same oracle as q80/q82 on purpose: the custom merge plan node must
    // reproduce the composed result exactly.
    "q88_asof_custom" ->
      """SELECT event_id, user_id, o_orderkey AS last_orderkey FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    // The latest in-window match equals "latest overall, if in window":
    // eligible rows ordered by time have the in-window ones as a suffix.
    "q89_asof_tolerance" ->
      """SELECT event_id, user_id, o_orderkey AS last_orderkey FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |    AND o.o_orderdate >= e.ts - INTERVAL 9000 DAYS)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    // Independent formulation of the forward contract: earliest
    // (date, key) pick per event over the future-orders join.
    "q105_asof_forward" ->
      """SELECT event_id, user_id, o_orderkey AS next_orderkey FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
        |  FROM events e JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    // The q80 pick as a LEFT join: unmatched events surface one null row.
    "q109_asof_outer" ->
      """SELECT event_id, user_id, o_orderkey AS last_orderkey FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    // Independent nearest formulation: rank all same-user orders by micro-
    // second distance (event ts truncated to micros, the same coercion the
    // node sees), then backward-first / greatest-backward-key /
    // least-forward-key — exactly the merge's candidate rules.
    "q106_asof_nearest" ->
      """SELECT event_id, user_id, o_orderkey AS near_orderkey FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY abs(epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))) ASC,
        |               (o.o_orderdate <= CAST(e.ts AS TIMESTAMP)) DESC,
        |               CASE WHEN o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
        |                    THEN -o.o_orderkey ELSE o.o_orderkey END ASC) AS rn
        |  FROM events e JOIN orders o ON e.user_id = o.o_custkey)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q81_range_join" ->
      s"""SELECT a.o_custkey AS ck, count(*) AS n_pairs,
         |  CAST(sum(CAST(round(b.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS followup_total
         |FROM orders a JOIN orders b
         |  ON a.o_custkey = b.o_custkey
         |  AND b.o_orderdate > a.o_orderdate
         |  AND b.o_orderdate <= a.o_orderdate + INTERVAL $RangeDays DAYS
         |GROUP BY a.o_custkey ORDER BY ck""".stripMargin
  )
}
