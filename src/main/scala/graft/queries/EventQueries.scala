package graft.queries

import graft.sources.Tables
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch queries beyond the reference's surface: JSON property
  * extraction, set operations, grouping-set rollups, and gap-based
  * sessionization (the batch twin of `session_window`). Each has an exact
  * DuckDB oracle.
  */
object EventQueries {

  /** q191: each funnel step must follow the previous within this bound
    * (the per-step conversion window every funnel product defines), and
    * the whole chain must complete within [[FunnelHorizonHours]] of the
    * first view for `completed` = 1 (`private[graft]` — the spec reads
    * them).
    */
  private[graft] val FunnelStepHours    = 24L
  private[graft] val FunnelHorizonHours = 36L
  private[graft] val FunnelStepUs       = FunnelStepHours * 3600L * 1000000L
  private[graft] val FunnelHorizonUs    = FunnelHorizonHours * 3600L * 1000000L

  /** q192/q193: the open-interval end sentinel for the current version (a
    * bare NULL would be dtype-unstable under the driver's string-hash
    * compare). NOT 9999-12-31: the compare path reads parquet via
    * pyarrow→pandas, whose datetime64[ns] tops out at 2262-04-11 — a
    * year-9999 value silently WRAPS there (round-10 driver red).
    * 2200-01-01 is above any corpus timestamp yet ns-representable.
    */
  private[graft] val ScdOpenEnd = "2200-01-01 00:00:00"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Scalar JSON property extraction from the props payload (the
    // get_json_object path — no schema needed, unlike q02's from_json).
    "q13_json_props" -> ((s, dir) =>
      Tables
        .events(s, dir)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(round(avg(col("k")), 4).as("avg_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    // INTERSECT — users who both clicked and purchased.
    "q14_intersect" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.filter(col("event_type") === "click")
        .select(col("user_id"))
        .intersect(e.filter(col("event_type") === "purchase").select(col("user_id")))
        .orderBy(col("user_id"))
    }),

    // EXCEPT — (user, day) pairs with a click but no purchase that day.
    // Day granularity keeps the difference provably NON-EMPTY at every SF
    // (user-level EXCEPT is vacuously empty on this corpus: every clicker
    // also purchases — a 0=0 oracle match verifies nothing), so the
    // distinct-set semantics are exercised with real surviving rows.
    "q15_except" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.filter(col("event_type") === "click")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .except(
          e.filter(col("event_type") === "purchase")
            .select(col("user_id"), date_trunc("day", col("ts")).as("day")))
        .orderBy(col("user_id"), col("day"))
    }),

    // Gap-based sessionization (30-minute inactivity gap) — session count
    // and size distribution per user. Batch twin of session_window.
    "q28_sessions" -> ((s, dir) =>
      EventStreams
        .sessionize(Tables.events(s, dir), gapMinutes = 30)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("session_idx"))),

    // Pivot: per-user-bucket event-type counts as columns (explicit value
    // list, so the plan is a single CASE-based aggregate — no extra pass to
    // discover pivot values).
    "q16_pivot" -> ((s, dir) =>
      Tables
        .events(s, dir)
        .withColumn("user_bucket", (col("user_id") % 10).cast("long"))
        .groupBy(col("user_bucket"))
        .pivot("event_type", Seq("click", "purchase", "view", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_bucket"))),

    // ROLLUP over (event_type, hour-of-day): subtotal + grand-total rows.
    "q29_rollup" -> ((s, dir) =>
      Tables
        .events(s, dir)
        .withColumn("hod", hour(col("ts")).cast("long"))
        .rollup(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy(col("event_type").asc_nulls_first, col("hod").asc_nulls_first)),

    // EXCEPT ALL — multiset difference: each user's click rows minus one
    // row per purchase (q15 is the DISTINCT form; ALL preserves
    // multiplicity, which Spark plans as a count-balancing aggregate +
    // generate, not a distinct-ifying set op). Aggregated per user so the
    // result is order-free.
    "q104_except_all" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.filter(col("event_type") === "click")
        .select(col("user_id"))
        .exceptAll(e.filter(col("event_type") === "purchase").select(col("user_id")))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_surplus_clicks"))
        .orderBy(col("user_id"))
    }),

    // TIME-SERIES SIMILARITY — which users' daily activity series are
    // closest to a reference user's (the streaming-similarity-search shape
    // of EDBT'19, batch form)? Euclidean distance over the day-aligned
    // count series WITHOUT a full outer join: with integer day counts,
    // dist²(u) = Σn_u² − 2·Σ n_u·n_ref (inner join on shared days only)
    // + Σn_ref², so each user needs one self-term aggregate and one
    // inner-join cross term against the (broadcast-tiny) reference series
    // — the dot-product decomposition that makes all-pairs similarity
    // tractable at scale. Exact int64 arithmetic end to end; one sqrt +
    // round at the finish.
    "q111_series_similarity" -> ((s, dir) => {
      val RefUser = 1L
      val daily = Tables
        .events(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val ref = daily.filter(col("user_id") === RefUser).select(col("day"), col("n").as("rn"))
      val refSelf = ref.agg(sum(col("rn") * col("rn")).as("sr2")) // 1-row scalar
      val userSelf = daily
        .filter(col("user_id") =!= RefUser)
        .groupBy(col("user_id"))
        .agg(sum(col("n") * col("n")).as("su2"))
      val cross = daily
        .filter(col("user_id") =!= RefUser)
        .join(broadcast(ref), Seq("day"))
        .groupBy(col("user_id"))
        .agg(sum(col("n") * col("rn")).as("cx"))
      userSelf
        .join(cross, Seq("user_id"), "left") // users sharing NO day: cross term 0
        .crossJoin(broadcast(refSelf))
        .select(
          col("user_id"),
          round(
            sqrt((col("su2") - lit(2) * coalesce(col("cx"), lit(0L)) + col("sr2")).cast("double")),
            4
          ).as("dist")
        )
        .orderBy(col("dist"), col("user_id"))
        .limit(10)
    }),

    // RETENTION COHORTS — the product-analytics staple: users grouped by
    // their first-activity week (cohort), distinct actives counted per
    // (cohort, weeks-since-cohort) cell. Both dates are week-truncated
    // (Monday start in Spark AND DuckDB), so the day difference is an exact
    // multiple of 7 and the offset division is exact. Two shuffles by
    // nature: the per-user min (cohort assignment, map-side combined) and
    // the cohort-cell distinct count.
    "q101_retention_cohorts" -> ((s, dir) => {
      val e = Tables
        .events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val cohort = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      e.join(cohort, Seq("user_id"))
        .groupBy(
          col("cohort_wk"),
          (datediff(col("wk"), col("cohort_wk")) / lit(7)).cast("long").as("week_no")
        )
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_wk"), col("week_no"))
    }),

    // SEQUENTIAL CONVERSION FUNNEL — the ordered multi-stage pattern
    // (view → click → purchase, each stage STRICTLY after the previous
    // and within [[FunnelStepHours]] of it): per user, t1 = first view,
    // t2 = first qualifying click, t3 = first qualifying purchase;
    // completion additionally requires the whole chain inside
    // [[FunnelHorizonHours]] of t1. This is dependent aggregation —
    // each stage's filter references the previous stage's result — which
    // a plain groupBy cannot express; the cascade of equi-join + min
    // re-aggregations IS the scale shape: after stage one every frame is
    // user-dimension-sized (one row per funnel entrant), each stage is a
    // partial-agg min behind a key shuffle, and no per-user event array
    // is ever materialized (the MATCH_RECOGNIZE-style sort-and-scan
    // alternative holds a user's whole history in one task). Strict `>`
    // between stages makes the chain deterministic under timestamp ties;
    // users with no view never entered the funnel and are absent.
    "q191_funnel" -> ((s, dir) => {
      // v and c each feed two consumers (the next stage's filter and the
      // final join), so the independent subtrees re-derive them — six
      // filter-pushed, column-pruned fact scans in one job. MEASURED
      // against the CacheScope alternative (persist v/c, three scans,
      // three serialized jobs): the cache costs 2× wall at every probe
      // scale (0.37 s → 0.81 s at sf0.1, 1.47 s → 3.19 s at 100×) — the
      // concurrent re-scans are cheaper than materializing and barriering
      // the stage frames, and at a real 100 TB the user-dimension frames
      // are themselves billions of rows, so the recompute cascade stands.
      val e = Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_type"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("t1") &&
          unix_micros(col("ts")) - unix_micros(col("t1")) <= FunnelStepUs)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts") > col("t2") &&
          unix_micros(col("ts")) - unix_micros(col("t2")) <= FunnelStepUs)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(
          col("user_id"),
          col("t1"),
          coalesce(col("t2"), timestamp_seconds(lit(0))).as("t2"),
          coalesce(col("t3"), timestamp_seconds(lit(0))).as("t3"),
          (lit(1L) + when(col("t2").isNotNull, 1L).otherwise(0L)
            + when(col("t3").isNotNull, 1L).otherwise(0L)).as("stage"),
          when(
            col("t3").isNotNull &&
              unix_micros(col("t3")) - unix_micros(col("t1")) <= FunnelHorizonUs,
            1L).otherwise(0L).as("completed"))
        .orderBy(col("user_id"))
    }),

    // SCD TYPE-2 DIMENSION HISTORY BUILD (q192) — the table the as-of family
    // (q105-q114) consumes, built from a raw change feed: per user, the
    // integer-cents attribute's CHANGE POINTS (consecutive duplicates
    // collapsed — the no-op-update dedup every SCD build needs), each
    // carrying a [valid_from, valid_to) interval (next change, or the
    // open-interval [[ScdOpenEnd]] sentinel) and a version number.
    // Equal-timestamp change points collapse to the LAST event_id first
    // (last-write-wins at a shared ts), so valid_from is strictly
    // increasing per user and no zero-width [from,to) version — dead
    // weight to any half-open as-of consumer — is ever emitted. One hash
    // shuffle on the key; the tie-collapse, the change-point filter and
    // both interval windows share the same partitioning AND ordering, so
    // Catalyst reuses one exchange + one sort for the whole build.
    "q192_scd2_history" -> ((s, dir) =>
      scdHistory(s, dir).orderBy(col("user_id"), col("version"))),

    // POINT-IN-TIME ENRICHMENT (q195) — the half-open consumer the SCD
    // table exists for (and the leakage-safe feature join every training
    // pipeline needs: each example sees the dimension value AS OF its own
    // event time, never a later one): every event picks up its user's
    // version with valid_from ≤ ts < valid_to. Executed through the
    // custom as-of merge node (plans/AsofJoin, backward on valid_from):
    // the intervals TILE each user's timeline from the first event on, so
    // "latest valid_from at-or-before ts" IS the containing interval —
    // one single-pass merge per key partition instead of an
    // interval-predicate pair join, and exactly one row per event (the
    // strictly-positive interval widths from the equal-ts collapse make
    // zero-width swallow-ups impossible). The dimension side re-aliases
    // its key (d_user) — fresh attribute ids, the node's self-join guard.
    "q195_pit_enrich" -> ((s, dir) =>
      pitEnrich(
        Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_id")),
        scdHistory(s, dir))
        .orderBy(col("event_id"))),

    // TIME-TRAVEL SNAPSHOT (q197) — the dimension AS OF one instant (the
    // other half-open read every SCD consumer needs: q195 reads at each
    // event's own time, this reconstructs the whole table at a fixed T —
    // the "what did the dimension look like last Tuesday" audit query).
    // T is DATA-DERIVED (corpus min + 14 days, exact µs arithmetic in
    // both engines — never a wall-clock literal that silently empties on
    // a shifted corpus) and rides a 1-row broadcast scalar onto the
    // history; at most one version per user survives the containment
    // filter. Users whose history starts after T are correctly absent
    // (the dimension did not know them yet).
    "q197_scd2_snapshot" -> ((s, dir) => {
      val t0 = Tables.events(s, dir).agg(
        timestamp_micros(min(unix_micros(col("ts"))) + lit(14L * 86400L * 1000000L)).as("t0"))
      scdHistory(s, dir)
        .crossJoin(broadcast(t0)) // 1-row scalar
        .filter(col("valid_from") <= col("t0") && col("t0") < col("valid_to"))
        .select(
          col("user_id"), col("version"), col("cents"), col("valid_from"),
          col("t0").as("snapshot_ts"))
        .orderBy(col("user_id"))
    }),

    // UNPIVOT/MELT — q16's inverse reshape, through Spark's native
    // `Dataset.unpivot` (one scan + an Expand operator, never N
    // self-unions). Wide lineitem metrics melt to (flag, metric, value)
    // rows and aggregate as exact scaled-integer sums; the oracle is the
    // UNION ALL formulation, so the reshape semantics — row multiplicity,
    // column naming, value pairing — are what the hash checks.
    "q137_unpivot_metrics" -> ((s, dir) => {
      Tables
        .lineitem(s, dir)
        .select(
          col("l_returnflag"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_extendedprice").cast("double").as("extendedprice"),
          col("l_discount").cast("double").as("discount"),
          col("l_tax").cast("double").as("tax"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("quantity"), col("extendedprice"), col("discount"), col("tax")),
          "metric",
          "value")
        .groupBy(col("l_returnflag"), col("metric"))
        .agg(
          count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("sum_cents"))
        .orderBy(col("l_returnflag"), col("metric"))
    }),

    // PER-GROUP OLS REGRESSION (value-vs-day trend per event type) from
    // EXACT integer sufficient statistics: x centered at the corpus epoch
    // (2024-01-01 = day 19723 — keeps n·Σxy far from Long range), y
    // scaled to 1e-4 ticks, and the five sums (n, Σx, Σy, Σx², Σxy)
    // accumulated as BIGINTs — order-independent, so both engines reach
    // bit-identical statistics; slope/intercept then derive through an
    // IDENTICALLY-WRITTEN double expression. One map-side-combined
    // aggregate: the regression costs what a count(*) costs at any scale.
    "q134_group_regression" -> ((s, dir) => {
      val e = Tables
        .events(s, dir)
        .select(
          col("event_type"),
          (unix_date(to_date(col("ts"))) - lit(19723)).cast("long").as("x"),
          floor(col("value") * 10000).cast("long").as("ys"))
      val agg = e
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("ys")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("ys")).as("sxy"))
      // the derived products (n·Σxy, Σx·Σy) outgrow BIGINT around n ~ 1e6
      // with this corpus's |x|/|y| ranges — and Spark would wrap silently
      // where DuckDB raises. Form them in DECIMAL(38,0) (exact integer
      // arithmetic, mirrored by HUGEINT in the oracle); the double
      // conversion of an exact integer is the same IEEE round-to-nearest
      // on both engines, so the derivation stays bit-identical.
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val denI     = dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))
      val num      = (dec(col("n")) * dec(col("sxy")) - dec(col("sx")) * dec(col("sy"))).cast("double")
      val slopeRaw = num / denI.cast("double")
      // a degenerate group (all events on one day) has zero x-variance:
      // pin the contract to NULL on both engines instead of letting
      // Spark's Infinity/NaN race DuckDB's div-by-zero representation
      agg
        .select(
          col("event_type"),
          col("n"),
          when(denI =!= 0, round(slopeRaw / 10000.0, 6)).as("slope"),
          when(denI =!= 0,
            round(
              (col("sy").cast("double") / col("n") - slopeRaw * (col("sx").cast("double") / col("n"))) / 10000.0,
              6)).as("intercept"))
        .orderBy(col("event_type"))
    }),

    // JOIN-KEY SKEW AUDIT — the pre-shuffle report that decides salting
    // and AQE skew thresholds at 100 TB: for each prospective join/group
    // key, the exact fanout histogram (how many keys occur c times) —
    // two-level aggregation, both map-side combined, the exchange carries
    // keys then histogram cells, never rows. A 1000-executor shuffle plan
    // reads this to find the keys that would pin a task (the histogram
    // tail IS the skew); the same shape feeds broadcast-threshold and
    // bucketing decisions.
    "q165_key_skew" -> ((s, dir) => {
      def fanoutHist(df: DataFrame, rel: String, key: org.apache.spark.sql.Column): DataFrame =
        df.groupBy(key.as("k"))
          .agg(count(lit(1)).as("fanout"))
          .groupBy(col("fanout"))
          .agg(count(lit(1)).as("n_keys"))
          .select(lit(rel).as("rel"), col("fanout"), col("n_keys"))
      fanoutHist(Tables.lineitem(s, dir), "lineitem.l_orderkey", col("l_orderkey"))
        .unionByName(fanoutHist(Tables.events(s, dir), "events.user_id", col("user_id")))
        .unionByName(fanoutHist(Tables.orders(s, dir), "orders.o_custkey", col("o_custkey")))
        .orderBy(col("rel"), col("fanout"))
    }),

    // ROBUST OUTLIER DETECTION (median/MAD) — the data-quality screen a
    // metrics ingest runs per group: median and median-absolute-deviation
    // are immune to the very outliers they hunt (mean/stddev are not),
    // flag |v − med| > 3·1.4826·MAD (the normal-consistent robust
    // z-score). Portability: the group median is ROUNDED to 4 decimals
    // BEFORE deviations derive from it, the MAD likewise before the
    // threshold, and the flag compares two round-4 values — no raw-double
    // boundary can flip between engines. Exact interpolated percentiles
    // are the oracle-able stand-in here (the q36 contract); at 100 TB the
    // same report runs on q133's mergeable quantile sketch.
    "q170_mad_outliers" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("event_type"), col("value"))
      val med = e.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 4).as("med"))
      val dev = e
        .join(broadcast(med), Seq("event_type"))
        .withColumn("d", abs(col("value") - col("med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(round(expr("percentile(d, 0.5)"), 4).as("mad"))
      dev
        .join(broadcast(mad), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          min(col("med")).as("med"),
          min(col("mad")).as("mad"),
          sum((round(col("d"), 4) > round(lit(4.4478) * col("mad"), 4)).cast("long"))
            .as("n_outliers"))
        .select(col("event_type"), col("n"), col("med"), col("mad"), col("n_outliers"),
          round(col("n_outliers").cast("double") / col("n"), 6).as("outlier_ratio"))
        .orderBy(col("event_type"))
    })
  )

  /** The q192 SCD-2 build, un-ordered (q192 orders it for the gate; q195
    * consumes it as the as-of dimension side). One hash shuffle on the
    * key; the equal-ts tie collapse, the change-point filter and both
    * interval windows share the same partitioning AND ordering, so
    * Catalyst reuses one exchange + one sort for the whole build.
    */
  private[graft] def scdHistory(s: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("nxt_ts", lead(col("ts"), 1).over(byKey))
      .filter(col("nxt_ts").isNull || col("nxt_ts") =!= col("ts"))
      .drop("nxt_ts")
      .withColumn("prev", lag(col("cents"), 1).over(byKey))
      .filter(col("prev").isNull || col("cents") =!= col("prev"))
      .select(
        col("user_id"),
        row_number().over(byKey).cast("long").as("version"),
        col("cents"),
        col("ts").as("valid_from"),
        coalesce(lead(col("ts"), 1).over(byKey), lit(ScdOpenEnd).cast("timestamp")).as("valid_to"))
      .withColumn(
        "is_current",
        when(col("valid_to") === lit(ScdOpenEnd).cast("timestamp"), 1L).otherwise(0L))
  }

  /** The q192/q195 shared oracle CTE chain (through `scd`): equal-ts
    * last-write-wins collapse, lag-dedup change points, lead interval
    * ends, the ns-representable open sentinel.
    */
  private def scdOracleCtes: String =
    s"""WITH e AS (
       |  SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
       | d AS (
       |  SELECT user_id, ts, event_id, cents,
       |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
       |  FROM e),
       | dd AS (SELECT user_id, ts, event_id, cents FROM d WHERE nxt IS NULL OR nxt <> ts),
       | l AS (
       |  SELECT user_id, ts, event_id, cents,
       |    lag(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM dd),
       | ch AS (SELECT user_id, ts, event_id, cents FROM l WHERE prev IS NULL OR cents <> prev),
       | scd AS (
       |  SELECT user_id,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
       |    cents, ts AS valid_from,
       |    coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
       |             TIMESTAMP '$ScdOpenEnd') AS valid_to,
       |    CAST(CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |              THEN 1 ELSE 0 END AS BIGINT) AS is_current
       |  FROM ch)""".stripMargin

  /** The q195/q196 shared enrichment: a probe frame (`user_id, ts,
    * event_id`) against an SCD frame (q192's schema) through the custom
    * as-of merge node — backward on `valid_from`, so with tiled intervals
    * "latest at-or-before" IS interval containment. One definition keeps
    * the batch row and the per-micro-batch streaming row semantically
    * identical, which is what makes their shared oracle a valid
    * cross-proof.
    */
  private[graft] def pitEnrich(probe: DataFrame, scd: DataFrame): DataFrame = {
    val dim = scd.select(
      col("user_id").as("d_user"),
      col("version"),
      col("cents").as("cents_asof"),
      col("valid_from"))
    graft.plans.AsofJoinOps
      .asof(
        probe, dim,
        probe.col("user_id"), probe.col("ts"),
        dim.col("d_user"), dim.col("valid_from"), dim.col("version"),
        direction = graft.plans.AsofDirection.Backward)
      .select(col("event_id"), col("user_id"), col("version"), col("cents_asof"))
  }

  val oracles: Map[String, String] = Map(
    // Identical dependent-aggregation cascade: first view, first click
    // strictly after it, first purchase strictly after that; the horizon
    // bound in integer microseconds, outer nulls as the epoch sentinel.
    "q191_funnel" ->
      s"""WITH v AS (
         |  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
         | c AS (
         |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
         |  WHERE e.event_type = 'click' AND e.ts > v.t1
         |    AND epoch_us(e.ts) - epoch_us(v.t1) <= ${FunnelStepHours * 3600L * 1000000L}
         |  GROUP BY e.user_id),
         | p AS (
         |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
         |  WHERE e.event_type = 'purchase' AND e.ts > c.t2
         |    AND epoch_us(e.ts) - epoch_us(c.t2) <= ${FunnelStepHours * 3600L * 1000000L}
         |  GROUP BY e.user_id)
         |SELECT v.user_id, v.t1,
         |  coalesce(c.t2, make_timestamp(0)) AS t2,
         |  coalesce(p.t3, make_timestamp(0)) AS t3,
         |  CAST(1 + CASE WHEN c.t2 IS NOT NULL THEN 1 ELSE 0 END
         |         + CASE WHEN p.t3 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
         |  CAST(CASE WHEN p.t3 IS NOT NULL
         |              AND epoch_us(p.t3) - epoch_us(v.t1) <= ${FunnelHorizonHours * 3600L * 1000000L}
         |            THEN 1 ELSE 0 END AS BIGINT) AS completed
         |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
         |ORDER BY user_id""".stripMargin,

    // The shared chain (scdOracleCtes): equal-ts last-write-wins collapse,
    // lag-dedup on the (ts, event_id) total order, lead for the interval
    // end, the ns-representable open sentinel.
    "q192_scd2_history" ->
      s"""$scdOracleCtes
         |SELECT user_id, version, cents, valid_from, valid_to, is_current
         |FROM scd ORDER BY user_id, version""".stripMargin,

    // The INDEPENDENT formulation of the as-of: an explicit half-open
    // interval join. Every event joins exactly one version (the intervals
    // tile each user's timeline from their first event), so the custom
    // merge node's "latest valid_from at-or-before ts" must reproduce
    // this row-for-row — including events AT a change point (they belong
    // to the version the change opened) and tie-collapsed boundaries.
    "q195_pit_enrich" ->
      s"""$scdOracleCtes
         |SELECT p.event_id, p.user_id, s.version, s.cents AS cents_asof
         |FROM events p JOIN scd s
         |  ON p.user_id = s.user_id AND p.ts >= s.valid_from AND p.ts < s.valid_to
         |ORDER BY p.event_id""".stripMargin,

    // The same data-derived instant (corpus min + 14 days, exact µs
    // arithmetic) and the same half-open containment.
    "q197_scd2_snapshot" ->
      s"""$scdOracleCtes,
         | t AS (SELECT min(ts) + INTERVAL 14 DAY AS t0 FROM events)
         |SELECT s.user_id, s.version, s.cents, s.valid_from, t.t0 AS snapshot_ts
         |FROM scd s, t
         |WHERE s.valid_from <= t.t0 AND t.t0 < s.valid_to
         |ORDER BY s.user_id""".stripMargin,

    // The same two-level count-of-counts per key column.
    "q165_key_skew" ->
      """WITH l AS (SELECT 'lineitem.l_orderkey' AS rel, fanout, count(*)::BIGINT AS n_keys FROM (
        |    SELECT l_orderkey, count(*)::BIGINT AS fanout FROM lineitem GROUP BY 1) GROUP BY 1, 2),
        | e AS (SELECT 'events.user_id' AS rel, fanout, count(*)::BIGINT AS n_keys FROM (
        |    SELECT user_id, count(*)::BIGINT AS fanout FROM events GROUP BY 1) GROUP BY 1, 2),
        | o AS (SELECT 'orders.o_custkey' AS rel, fanout, count(*)::BIGINT AS n_keys FROM (
        |    SELECT o_custkey, count(*)::BIGINT AS fanout FROM orders GROUP BY 1) GROUP BY 1, 2)
        |SELECT * FROM l UNION ALL SELECT * FROM e UNION ALL SELECT * FROM o
        |ORDER BY rel, fanout""".stripMargin,

    // The same round-4-fenced median/MAD chain and robust z-flag.
    "q170_mad_outliers" ->
      """WITH med AS (SELECT event_type, round(quantile_cont(value, 0.5), 4) AS med
        |             FROM events GROUP BY 1),
        | dev AS (SELECT e.event_type, abs(e.value - m.med) AS d, m.med
        |         FROM events e JOIN med m USING (event_type)),
        | mad AS (SELECT event_type, round(quantile_cont(d, 0.5), 4) AS mad FROM dev GROUP BY 1)
        |SELECT dev.event_type, count(*)::BIGINT AS n, min(dev.med) AS med, min(mad.mad) AS mad,
        |  CAST(sum(CASE WHEN round(dev.d, 4) > round(4.4478 * mad.mad, 4) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(CAST(sum(CASE WHEN round(dev.d, 4) > round(4.4478 * mad.mad, 4) THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS outlier_ratio
        |FROM dev JOIN mad USING (event_type) GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_json_props" ->
      """SELECT event_type, round(avg(CAST(props->>'$.k' AS BIGINT)), 4) AS avg_k,
        |  max(CAST(props->>'$.k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q14_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,
    "q15_except" ->
      """SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        |FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, day""".stripMargin,
    "q16_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'view') AS view,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin,
    "q28_sessions" ->
      """WITH lagged AS (
        |  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events),
        | flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM lagged),
        | sess AS (
        |  SELECT user_id, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx, count(*) AS n_events
        |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,
    "q29_rollup" ->
      """SELECT event_type, hod, count(*) AS n, round(sum(value), 2) AS total
        |FROM (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod, value FROM events)
        |GROUP BY ROLLUP (event_type, hod)
        |ORDER BY event_type ASC NULLS FIRST, hod ASC NULLS FIRST""".stripMargin,
    "q111_series_similarity" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        | ref AS (SELECT day, n AS rn FROM daily WHERE user_id = 1),
        | ref_self AS (SELECT sum(rn * rn) AS sr2 FROM ref),
        | user_self AS (
        |  SELECT user_id, sum(n * n) AS su2 FROM daily WHERE user_id <> 1 GROUP BY 1),
        | cx AS (
        |  SELECT d.user_id, sum(d.n * r.rn) AS cx
        |  FROM daily d JOIN ref r USING (day) WHERE d.user_id <> 1 GROUP BY 1)
        |SELECT u.user_id,
        |  round(sqrt(CAST(u.su2 - 2 * coalesce(cx.cx, 0) + rs.sr2 AS DOUBLE)), 4) AS dist
        |FROM user_self u LEFT JOIN cx USING (user_id), ref_self rs
        |ORDER BY dist, user_id LIMIT 10""".stripMargin,
    "q104_except_all" ->
      """SELECT user_id, count(*) AS n_surplus_clicks FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT ALL
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q101_retention_cohorts" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk FROM events),
        | cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id)
        |SELECT cohort_wk,
        |  date_diff('day', cohort_wk, wk) // 7 AS week_no,
        |  count(DISTINCT e.user_id) AS n_active
        |FROM e JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_wk, week_no""".stripMargin,
    // The UNION ALL formulation of the same melt — independent of any
    // unpivot machinery, so the reshape itself is under the gate.
    "q137_unpivot_metrics" ->
      """WITH u AS (
        |  SELECT l_returnflag, 'quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'discount', l_discount FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'tax', l_tax FROM lineitem)
        |SELECT l_returnflag, metric, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM u GROUP BY 1, 2 ORDER BY l_returnflag, metric""".stripMargin,
    // Identical integer sufficient statistics, identically-written double
    // derivation — bit-equal slope/intercept or the hash gate fails. The
    // determinant/numerator products form in HUGEINT (the Spark side's
    // DECIMAL(38,0)) so neither engine wraps or raises at large n.
    "q134_group_regression" ->
      """WITH e AS (
        |  SELECT event_type,
        |    (ts::DATE - DATE '1970-01-01')::BIGINT - 19723 AS x,
        |    CAST(floor(value * 10000) AS BIGINT) AS ys
        |  FROM events),
        | a AS (
        |  SELECT event_type, count(*)::BIGINT AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(ys) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * ys) AS BIGINT) AS sxy
        |  FROM e GROUP BY 1),
        | d AS (
        |  SELECT event_type, n, sx, sy,
        |    n::HUGEINT * sxx::HUGEINT - sx::HUGEINT * sx::HUGEINT AS den,
        |    n::HUGEINT * sxy::HUGEINT - sx::HUGEINT * sy::HUGEINT AS num
        |  FROM a)
        |SELECT event_type, n,
        |  CASE WHEN den = 0 THEN NULL ELSE
        |    round((num::DOUBLE / den::DOUBLE) / 10000.0, 6)
        |  END AS slope,
        |  CASE WHEN den = 0 THEN NULL ELSE
        |    round((sy::DOUBLE / n - (num::DOUBLE / den::DOUBLE)
        |           * (sx::DOUBLE / n)) / 10000.0, 6)
        |  END AS intercept
        |FROM d ORDER BY event_type""".stripMargin
  )
}
