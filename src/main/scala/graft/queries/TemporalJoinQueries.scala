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
  private val HeavyQty           = 45 // q130 left-side selectivity (~12% of lineitem)
  private val OverlapWindowDays  = 14 // q130 urgent-order attention window
  private val OverlapBucketDays  = 32 // q130 blocking width (~typical interval length)

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

    // FORWARD as-of through the custom node: the EARLIEST event at-or-after
    // each order per customer — "time-to-first-activity-after-purchase"
    // (pandas merge_asof direction='forward'). Orders-left/events-right is
    // the NON-VACUOUS orientation on this corpus (orders 1995–2001, events
    // 2024): the reverse direction matches nothing at any SF, and a 0=0
    // oracle hash proves nothing. ~10% of orders have a same-customer
    // future event (132 / 1,436 / 15,060 rows at sf0.001/0.01/0.1). Ties
    // resolve to the least event_id (the merge's first-row-wins), which the
    // independent oracle mirrors with an ASC/ASC row_number pick.
    "q105_asof_forward" -> ((s, dir) => {
      val o = Tables
        .orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_ts"))
      val e = Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_id"))
      graft.plans.AsofJoinOps
        .asof(o, e, o.col("o_custkey"), o.col("o_ts"), e.col("user_id"), e.col("ts"), e.col("event_id"),
          direction = graft.plans.AsofDirection.Forward)
        .select(col("o_orderkey"), col("o_custkey"), col("event_id").as("next_event_id"))
        .orderBy(col("o_orderkey"))
    }),

    // FORWARD + TOLERANCE: the next event counts only if it lands within
    // 9,400 days of the order — a bound that demonstrably discriminates on
    // this corpus (the forward-distance median is ~9,350–9,420 days, so
    // roughly half the q105 matches survive at every SF). Exercises the
    // forward branch's in-merge tolerance comparison under the driver gate
    // (previously spec-only).
    "q112_asof_fwd_tolerance" -> ((s, dir) => {
      val o = Tables
        .orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_ts"))
      val e = Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_id"))
      graft.plans.AsofJoinOps
        .asof(o, e, o.col("o_custkey"), o.col("o_ts"), e.col("user_id"), e.col("ts"), e.col("event_id"),
          tolerance = Some(9400L * 86400L * 1000000L), // 9,400 days in micros
          direction = graft.plans.AsofDirection.Forward)
        .select(col("o_orderkey"), col("o_custkey"), col("event_id").as("next_event_id"))
        .orderBy(col("o_orderkey"))
    }),

    // FORWARD + LEFT OUTER: every order survives; the ~90% with no
    // same-customer future event carry a null event id — non-vacuous on
    // BOTH branches (matched and null-padded) at every SF. Exercises the
    // forward+outer combination under the driver gate (previously
    // spec-only).
    "q113_asof_fwd_outer" -> ((s, dir) => {
      val o = Tables
        .orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_ts"))
      val e = Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_id"))
      graft.plans.AsofJoinOps
        .asof(o, e, o.col("o_custkey"), o.col("o_ts"), e.col("user_id"), e.col("ts"), e.col("event_id"),
          direction = graft.plans.AsofDirection.Forward, leftOuter = true)
        .select(col("o_orderkey"), col("o_custkey"), col("event_id").as("next_event_id"))
        .orderBy(col("o_orderkey"))
    }),

    // NEAREST + TOLERANCE, genuinely two-sided: each non-urgent order seeks
    // the nearest same-customer URGENT order within 90 days, before or
    // after. Unlike the events⋈orders orientation (where all orders precede
    // all events, collapsing nearest to one direction), urgent orders are
    // interleaved with the rest, so BOTH candidates compete — and the
    // corpus contains exact two-sided distance ties (2 at sf0.01, 30 at
    // sf0.1), putting the backward-preference rule itself under the driver
    // gate. Self-as-of: the right side re-aliases every column (fresh
    // attribute ids), satisfying the node's disjoint-lineage contract.
    "q114_asof_nearest_tolerance" -> ((s, dir) => {
      val base = Tables.orders(s, dir)
      val l = base
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_ts"))
      val r = base
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(
          col("o_custkey").as("u_custkey"),
          col("o_orderdate").cast("timestamp").as("u_ts"),
          col("o_orderkey").as("u_orderkey"))
      graft.plans.AsofJoinOps
        .asof(l, r, l.col("o_custkey"), l.col("o_ts"), r.col("u_custkey"), r.col("u_ts"), r.col("u_orderkey"),
          tolerance = Some(90L * 86400L * 1000000L), // 90 days in micros
          direction = graft.plans.AsofDirection.Nearest)
        .select(col("o_orderkey"), col("o_custkey"), col("u_orderkey").as("near_urgent_orderkey"))
        .orderBy(col("o_orderkey"))
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
    }),

    // UNKEYED interval-overlap join at scale: heavy-quantity shipments in
    // transit [shipdate, receiptdate] × urgent-order attention windows
    // [orderdate, +14d] — no shared key, so a naive plan is the full cross
    // product under a range predicate (nested loop). IntervalOps buckets
    // both interval sets into 32-day blocks and equi-joins on the block
    // id, counting each overlapping pair exactly once in the bucket where
    // the overlap starts (no distinct). Output: per urgent order, how many
    // heavy shipments were in transit during its window and the summed
    // overlap days — the "what was competing for logistics attention"
    // report.
    "q130_interval_overlap_join" -> ((s, dir) => {
      val li = Tables
        .lineitem(s, dir)
        .filter(col("l_quantity") >= HeavyQty)
        .select(
          unix_date(to_date(col("l_shipdate"))).cast("long").as("ls"),
          // the harness lineitem carries no receiptdate — transit length is
          // a deterministic linenumber formula (5–29 days), oracle-mirrored
          (unix_date(to_date(col("l_shipdate"))) + lit(1) + col("l_linenumber") * 4)
            .cast("long").as("le"))
      val ord = Tables
        .orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(
          col("o_orderkey"),
          unix_date(to_date(col("o_orderdate"))).cast("long").as("rs"),
          (unix_date(to_date(col("o_orderdate"))) + OverlapWindowDays).cast("long").as("re"))
      graft.operators.IntervalOps
        .overlapJoin(li, "ls", "le", ord, "rs", "re", width = OverlapBucketDays)
        .groupBy(col("o_orderkey"))
        .agg(
          count(lit(1)).as("n_transit"),
          sum(least(col("le"), col("re")) - greatest(col("ls"), col("rs")) + 1).as("overlap_days"))
        .orderBy(col("o_orderkey"))
    }),

    // The SECOND aggregate consumer of the interval join — a carried
    // MEASURE (revenue cents) instead of a derived overlap length, proving
    // the aggregation-below-pairs shape holds for arbitrary payload
    // columns riding through IntervalOps: per urgent order, the exact
    // revenue of heavy shipments in transit during its window. Same plan
    // contract as q130 (partial agg inside the join stage — pairs never
    // cross an exchange as rows), gated in PlanQualitySpec.
    "q142_interval_transit_revenue" -> ((s, dir) => {
      val li = Tables
        .lineitem(s, dir)
        .filter(col("l_quantity") >= HeavyQty)
        .select(
          unix_date(to_date(col("l_shipdate"))).cast("long").as("ls"),
          (unix_date(to_date(col("l_shipdate"))) + lit(1) + col("l_linenumber") * 4)
            .cast("long").as("le"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val ord = Tables
        .orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(
          col("o_orderkey"),
          unix_date(to_date(col("o_orderdate"))).cast("long").as("rs"),
          (unix_date(to_date(col("o_orderdate"))) + OverlapWindowDays).cast("long").as("re"))
      graft.operators.IntervalOps
        .overlapJoin(li, "ls", "le", ord, "rs", "re", width = OverlapBucketDays)
        .groupBy(col("o_orderkey"))
        .agg(
          count(lit(1)).as("n_transit"),
          (sum(col("cents")).cast("double") / 100.0).as("transit_revenue"))
        .orderBy(col("o_orderkey"))
    }),

    // SWEEP/PREFIX-SUM INTERVAL AGGREGATION — q142's report computed with
    // ZERO pair enumeration. The overlap join is pair-OUTPUT-bound (both
    // sides grow k× ⇒ true pairs grow ~k²×; SCALE.md measures the wall
    // following that curve), but when the consumer is an AGGREGATE the
    // pairs never need to exist: for order i,
    //   n(i)     = |{j : ls_j ≤ re_i}| − |{j : le_j < rs_i}|
    //   cents(i) = Σ cents_j·[ls_j ≤ re_i] − Σ cents_j·[le_j < rs_i]
    // (subtracting the too-early-enders from the started-in-time set
    // leaves exactly the overlap set, since ls ≤ le always). Each term is
    // a point lookup into a CUMULATIVE PER-DAY series — built by one
    // day-keyed aggregate, densified over the day domain, and prefix-
    // summed by RankOps.globalRunningSums (two-phase: per-partition
    // running sums + broadcast partition offsets, never a single-task
    // window). The lookup is then a plain EQUI JOIN on the day: the
    // series size is bounded by the TIME DOMAIN, not the corpus — it
    // broadcasts at any data scale, and total cost is two day-keyed
    // aggregations + two broadcast joins: O(n), flat where q142 is
    // quadratic. Same oracle as q142 (third independent formulation of
    // the same truth); exact integer cents throughout.
    "q146_interval_sweep_revenue" -> ((s, dir) => {
      val li = Tables
        .lineitem(s, dir)
        .filter(col("l_quantity") >= HeavyQty)
        .select(
          unix_date(to_date(col("l_shipdate"))).cast("long").as("ls"),
          (unix_date(to_date(col("l_shipdate"))) + lit(1) + col("l_linenumber") * 4)
            .cast("long").as("le"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val ord = Tables
        .orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(
          col("o_orderkey"),
          unix_date(to_date(col("o_orderdate"))).cast("long").as("rs"),
          (unix_date(to_date(col("o_orderdate"))) + OverlapWindowDays).cast("long").as("re"))
      // cumulative (count, cents) of transit intervals whose `dayCol` is
      // at-or-before each day of the dense day domain
      def cumSeries(dayCol: String): DataFrame = {
        val perDay = li
          .groupBy(col(dayCol).as("d"))
          .agg(count(lit(1)).as("dn"), sum(col("cents")).as("dc"))
        val days = perDay
          .agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"))).as("d"))
        val dense = days
          .join(perDay, Seq("d"), "left")
          .select(
            col("d"),
            coalesce(col("dn"), lit(0L)).as("dn"),
            coalesce(col("dc"), lit(0L)).as("dc"))
        graft.operators.RankOps
          .globalRunningSums(dense, Seq(col("d")), Seq("dn", "dc"))
          .select(col("d"), col("cum_dn"), col("cum_dc"))
      }
      val aSer = cumSeries("ls") // transits STARTED at-or-before day d
      val bSer = cumSeries("le") // transits ENDED at-or-before day d
      // clamp each lookup to its series' upper bound (a later lookup sees
      // the full total); below-domain lookups miss the left join and
      // coalesce to zero — both directions exact
      val aHi = aSer.agg(max(col("d")).as("a_hi"))
      val bHi = bSer.agg(max(col("d")).as("b_hi"))
      ord
        .crossJoin(broadcast(aHi))
        .crossJoin(broadcast(bHi))
        .withColumn("ka", least(col("re"), col("a_hi")))
        .withColumn("kb", least(col("rs") - 1, col("b_hi")))
        .join(
          broadcast(aSer.select(col("d").as("ka"), col("cum_dn").as("na"), col("cum_dc").as("ca"))),
          Seq("ka"), "left")
        .join(
          broadcast(bSer.select(col("d").as("kb"), col("cum_dn").as("nb"), col("cum_dc").as("cb"))),
          Seq("kb"), "left")
        .select(
          col("o_orderkey"),
          (coalesce(col("na"), lit(0L)) - coalesce(col("nb"), lit(0L))).as("n_transit"),
          ((coalesce(col("ca"), lit(0L)) - coalesce(col("cb"), lit(0L))).cast("double") / 100.0)
            .as("transit_revenue"))
        .filter(col("n_transit") > 0)
        .orderBy(col("o_orderkey"))
    }),

    // SECOND-ORDER SWEEP — q130's FULL report (count + overlap DAYS)
    // pair-free. The length measure looks pair-bound (min(le,re) −
    // max(ls,rs) + 1 mixes both sides), but it factors per DAY:
    //   overlap_days(i) = Σ_j |[ls_j, le_j] ∩ [rs_i, re_i]|
    //                   = Σ_{d = rs_i}^{re_i} active(d)
    // where active(d) = transits covering day d. So it is a PREFIX SUM OF
    // A PREFIX SUM: delta(d) = starts(d) − ends_at(d) (ends keyed le+1,
    // the day a transit stops being active), active = Σ delta, cum_active
    // = Σ active — two chained globalRunningSums over the dense day
    // domain. Then per order, with both lookups on the SAME clamped keys:
    //   n_transit    = cum_starts(re) − cum_ends_at(rs)      [le ≤ rs−1]
    //   overlap_days = cum_active(re) − (cum_active(rs) − active(rs))
    // (the rs-row identity CumActive(rs−1) = cum_active(rs) − active(rs)
    // avoids a third lookup key). Domain runs to max(le)+1 so clamped
    // above-domain lookups read the flat totals; below-domain lookups
    // miss the left join and coalesce to zero. Same oracle as q130 —
    // third formulation, zero pairs, flat at every corpus scale.
    "q147_interval_sweep_days" -> ((s, dir) => {
      val li = Tables
        .lineitem(s, dir)
        .filter(col("l_quantity") >= HeavyQty)
        .select(
          unix_date(to_date(col("l_shipdate"))).cast("long").as("ls"),
          (unix_date(to_date(col("l_shipdate"))) + lit(1) + col("l_linenumber") * 4)
            .cast("long").as("le"))
      val ord = Tables
        .orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(
          col("o_orderkey"),
          unix_date(to_date(col("o_orderdate"))).cast("long").as("rs"),
          (unix_date(to_date(col("o_orderdate"))) + OverlapWindowDays).cast("long").as("re"))
      val starts = li.groupBy(col("ls").as("d")).agg(count(lit(1)).as("sn"))
      val endsAt = li.groupBy((col("le") + 1).as("d")).agg(count(lit(1)).as("en"))
      val dense = li
        .agg(min(col("ls")).as("lo"), (max(col("le")) + 1).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("d"))
        .join(starts, Seq("d"), "left")
        .join(endsAt, Seq("d"), "left")
        .select(
          col("d"),
          coalesce(col("sn"), lit(0L)).as("sn"),
          coalesce(col("en"), lit(0L)).as("en"))
        .withColumn("delta", col("sn") - col("en"))
      val firstOrder = graft.operators.RankOps
        .globalRunningSums(dense, Seq(col("d")), Seq("sn", "en", "delta"))
        .withColumnRenamed("cum_delta", "active")
      val series = graft.operators.RankOps
        .globalRunningSums(firstOrder, Seq(col("d")), Seq("active"))
        .select(col("d"), col("cum_sn"), col("cum_en"), col("active"), col("cum_active"))
      val hi = series.agg(max(col("d")).as("hi"))
      ord
        .crossJoin(broadcast(hi))
        .withColumn("ka", least(col("re"), col("hi")))
        .withColumn("kb", least(col("rs"), col("hi")))
        .join(
          broadcast(series.select(
            col("d").as("ka"), col("cum_sn").as("na"), col("cum_active").as("da"))),
          Seq("ka"), "left")
        .join(
          broadcast(series.select(
            col("d").as("kb"), col("cum_en").as("nb"),
            (col("cum_active") - col("active")).as("db"))),
          Seq("kb"), "left")
        .select(
          col("o_orderkey"),
          (coalesce(col("na"), lit(0L)) - coalesce(col("nb"), lit(0L))).as("n_transit"),
          (coalesce(col("da"), lit(0L)) - coalesce(col("db"), lit(0L))).as("overlap_days"))
        .filter(col("n_transit") > 0)
        .orderBy(col("o_orderkey"))
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
    // (ts, event_id) pick per order over the future-events join.
    "q105_asof_forward" ->
      """SELECT o_orderkey, o_custkey, event_id AS next_event_id FROM (
        |  SELECT o.o_orderkey, o.o_custkey, e.event_id,
        |    row_number() OVER (PARTITION BY o.o_orderkey
        |      ORDER BY e.ts ASC, e.event_id ASC) AS rn
        |  FROM orders o JOIN events e
        |    ON o.o_custkey = e.user_id AND e.ts >= CAST(o.o_orderdate AS TIMESTAMP))
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    // The earliest in-window match equals "earliest overall, if in window":
    // eligible rows ordered by time have the in-window ones as a prefix.
    "q112_asof_fwd_tolerance" ->
      """SELECT o_orderkey, o_custkey, event_id AS next_event_id FROM (
        |  SELECT o.o_orderkey, o.o_custkey, e.event_id,
        |    row_number() OVER (PARTITION BY o.o_orderkey
        |      ORDER BY e.ts ASC, e.event_id ASC) AS rn
        |  FROM orders o JOIN events e
        |    ON o.o_custkey = e.user_id AND e.ts >= CAST(o.o_orderdate AS TIMESTAMP)
        |    AND e.ts <= CAST(o.o_orderdate AS TIMESTAMP) + INTERVAL 9400 DAYS)
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    // The q105 pick as a LEFT join: orders with no future event surface one
    // null row each.
    "q113_asof_fwd_outer" ->
      """SELECT o_orderkey, o_custkey, event_id AS next_event_id FROM (
        |  SELECT o.o_orderkey, o.o_custkey, e.event_id,
        |    row_number() OVER (PARTITION BY o.o_orderkey
        |      ORDER BY e.ts ASC, e.event_id ASC) AS rn
        |  FROM orders o LEFT JOIN events e
        |    ON o.o_custkey = e.user_id AND e.ts >= CAST(o.o_orderdate AS TIMESTAMP))
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    // Independent nearest-with-tolerance formulation: rank all in-tolerance
    // same-customer urgent orders by microsecond distance, then
    // backward-first / greatest-backward-key / least-forward-key — exactly
    // the merge's candidate rules (same pattern as q106's oracle, plus the
    // tolerance predicate in the join).
    "q114_asof_nearest_tolerance" ->
      """SELECT o_orderkey, o_custkey, u_orderkey AS near_urgent_orderkey FROM (
        |  SELECT l.o_orderkey, l.o_custkey, r.o_orderkey AS u_orderkey,
        |    row_number() OVER (PARTITION BY l.o_orderkey
        |      ORDER BY abs(epoch_us(CAST(l.o_orderdate AS TIMESTAMP)) - epoch_us(CAST(r.o_orderdate AS TIMESTAMP))) ASC,
        |               (r.o_orderdate <= l.o_orderdate) DESC,
        |               CASE WHEN r.o_orderdate <= l.o_orderdate
        |                    THEN -r.o_orderkey ELSE r.o_orderkey END ASC) AS rn
        |  FROM orders l JOIN orders r
        |    ON l.o_custkey = r.o_custkey
        |    AND l.o_orderpriority <> '1-URGENT' AND r.o_orderpriority = '1-URGENT'
        |    AND abs(epoch_us(CAST(l.o_orderdate AS TIMESTAMP)) - epoch_us(CAST(r.o_orderdate AS TIMESTAMP)))
        |        <= CAST(90 AS BIGINT) * 86400 * 1000000)
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
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
         |GROUP BY a.o_custkey ORDER BY ck""".stripMargin,
    // Independent formulation: the plain overlap predicate join (DuckDB
    // plans it as an IEJoin) — the bucketed Spark plan must reproduce the
    // exactly-once pair semantics or counts drift.
    "q130_interval_overlap_join" ->
      s"""WITH l AS (
         |  SELECT (l_shipdate::DATE - DATE '1970-01-01')::BIGINT AS ls,
         |         (l_shipdate::DATE - DATE '1970-01-01')::BIGINT + 1 + l_linenumber * 4 AS le
         |  FROM lineitem WHERE l_quantity >= $HeavyQty),
         | r AS (
         |  SELECT o_orderkey,
         |         (o_orderdate::DATE - DATE '1970-01-01')::BIGINT AS rs,
         |         (o_orderdate::DATE - DATE '1970-01-01')::BIGINT + $OverlapWindowDays AS re
         |  FROM orders WHERE o_orderpriority = '1-URGENT')
         |SELECT o_orderkey, count(*) AS n_transit,
         |  CAST(sum(least(le, re) - greatest(ls, rs) + 1) AS BIGINT) AS overlap_days
         |FROM l JOIN r ON ls <= re AND rs <= le
         |GROUP BY 1 ORDER BY o_orderkey""".stripMargin,
    // Same independent plain-predicate formulation, carried-measure form.
    "q142_interval_transit_revenue" ->
      s"""WITH l AS (
         |  SELECT (l_shipdate::DATE - DATE '1970-01-01')::BIGINT AS ls,
         |         (l_shipdate::DATE - DATE '1970-01-01')::BIGINT + 1 + l_linenumber * 4 AS le,
         |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
         |  FROM lineitem WHERE l_quantity >= $HeavyQty),
         | r AS (
         |  SELECT o_orderkey,
         |         (o_orderdate::DATE - DATE '1970-01-01')::BIGINT AS rs,
         |         (o_orderdate::DATE - DATE '1970-01-01')::BIGINT + $OverlapWindowDays AS re
         |  FROM orders WHERE o_orderpriority = '1-URGENT')
         |SELECT o_orderkey, count(*) AS n_transit,
         |  CAST(sum(cents) AS BIGINT)::DOUBLE / 100 AS transit_revenue
         |FROM l JOIN r ON ls <= re AND rs <= le
         |GROUP BY 1 ORDER BY o_orderkey""".stripMargin,
    // Same oracle as q142 on purpose: the sweep/prefix-sum decomposition
    // (no pair ever enumerated) must reproduce the pair-join aggregate
    // exactly — a wrong clamp, an off-by-one in the strict/non-strict
    // bounds, or a lost day in the dense domain shifts a count and the
    // hash fails.
    "q146_interval_sweep_revenue" ->
      s"""WITH l AS (
         |  SELECT (l_shipdate::DATE - DATE '1970-01-01')::BIGINT AS ls,
         |         (l_shipdate::DATE - DATE '1970-01-01')::BIGINT + 1 + l_linenumber * 4 AS le,
         |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
         |  FROM lineitem WHERE l_quantity >= $HeavyQty),
         | r AS (
         |  SELECT o_orderkey,
         |         (o_orderdate::DATE - DATE '1970-01-01')::BIGINT AS rs,
         |         (o_orderdate::DATE - DATE '1970-01-01')::BIGINT + $OverlapWindowDays AS re
         |  FROM orders WHERE o_orderpriority = '1-URGENT')
         |SELECT o_orderkey, count(*) AS n_transit,
         |  CAST(sum(cents) AS BIGINT)::DOUBLE / 100 AS transit_revenue
         |FROM l JOIN r ON ls <= re AND rs <= le
         |GROUP BY 1 ORDER BY o_orderkey""".stripMargin,
    // Same oracle as q130 on purpose: the second-order sweep (active-count
    // prefix sums, no pair stream) must reproduce the pair join's count
    // AND length-sum exactly — any error in the day factorization, the
    // le+1 end keying, or the rs-row CumActive identity shifts a day and
    // fails the hash.
    "q147_interval_sweep_days" ->
      s"""WITH l AS (
         |  SELECT (l_shipdate::DATE - DATE '1970-01-01')::BIGINT AS ls,
         |         (l_shipdate::DATE - DATE '1970-01-01')::BIGINT + 1 + l_linenumber * 4 AS le
         |  FROM lineitem WHERE l_quantity >= $HeavyQty),
         | r AS (
         |  SELECT o_orderkey,
         |         (o_orderdate::DATE - DATE '1970-01-01')::BIGINT AS rs,
         |         (o_orderdate::DATE - DATE '1970-01-01')::BIGINT + $OverlapWindowDays AS re
         |  FROM orders WHERE o_orderpriority = '1-URGENT')
         |SELECT o_orderkey, count(*) AS n_transit,
         |  CAST(sum(least(le, re) - greatest(ls, rs) + 1) AS BIGINT) AS overlap_days
         |FROM l JOIN r ON ls <= re AND rs <= le
         |GROUP BY 1 ORDER BY o_orderkey""".stripMargin
  )
}
