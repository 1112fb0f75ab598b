package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytical headline queries over the TPC-H-ish corpus — the scale
  * workout for the engine (joins, grouped aggregates, window functions,
  * semi/anti joins, event-time buckets). These exercise the capabilities a
  * user of the reference would reach for next, and they are the queries the
  * per-round BENCH times at sf0.1.
  *
  * Scale design notes:
  *   - Dimension joins (`nation`, `region`, `part`, `customer`) are
  *     explicitly `broadcast()` — at 100 TB the fact table never shuffles
  *     for a dimension lookup.
  *   - Aggregates are partial (map-side combine) by construction; the single
  *     shuffle per query is on the grouping key.
  *   - Filters sit directly on scan columns so they push into parquet
  *     (`PushedFilters` in explain).
  *   - Rounding follows the data's decimal granularity (price×(1−disc) is a
  *     4-decimal rational, ×(1+tax) a 6-decimal rational) so round() yields
  *     the exact rational on both engines regardless of accumulation order.
  */
object TpchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 — pricing summary report (scan-heavy grouped aggregate).
    // Exact-integer arithmetic: every input is a 2-decimal rational, so all
    // sums are computed on scaled BIGINTs (order-independent, overflow-safe
    // in int64) and converted to double by ONE division at the end —
    // bit-identical across engines and partitionings. Rounding a raw double
    // sum instead is wrong at scale: at sf0.1 the accumulated fp error of a
    // 4.5e9-magnitude sum exceeds the 1e-6 rounding step.
    "q20_pricing_summary" -> ((s, dir) =>
      Tables
        .lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .select(
          col("l_returnflag"),
          col("l_linestatus"),
          round(col("l_quantity") * 100).cast("long").as("q2"),
          round(col("l_extendedprice") * 100).cast("long").as("p2"),
          round(col("l_discount") * 100).cast("long").as("d2"),
          round(col("l_tax") * 100).cast("long").as("t2")
        )
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(col("q2")).cast("double") / 100.0).as("sum_qty"),
          (sum(col("p2")).cast("double") / 100.0).as("sum_base_price"),
          (sum(col("p2") * (lit(100L) - col("d2"))).cast("double") / 1e4).as("sum_disc_price"),
          (sum(col("p2") * (lit(100L) - col("d2")) * (lit(100L) + col("t2"))).cast("double") / 1e6)
            .as("sum_charge"),
          (sum(col("q2")).cast("double") / (count(lit(1)) * 100L).cast("double")).as("avg_qty"),
          (sum(col("p2")).cast("double") / (count(lit(1)) * 100L).cast("double")).as("avg_price"),
          (sum(col("d2")).cast("double") / (count(lit(1)) * 100L).cast("double")).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // TPC-H Q3 — shipping priority: 3-way join + top-10 by revenue.
    "q21_top_orders" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord  = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li   = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      li.join(broadcast(ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-style — revenue per nation through the region→nation→customer
    // dimension chain; all dims broadcast, fact shuffles once on n_name.
    "q22_nation_revenue" -> ((s, dir) => {
      val nat  = Tables.nation(s, dir)
      val cust = Tables.customer(s, dir)
      val ord  = Tables.orders(s, dir)
      val li   = Tables.lineitem(s, dir)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        // exact integer cents: nation-level sums reach 1e8+ where rounding
        // a double accumulation is within fp error of the 1e-4 boundary
        .select(
          col("n_name"),
          (round(col("l_extendedprice") * 100).cast("long") * (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev4")
        )
        .groupBy(col("n_name"))
        .agg((sum(col("rev4")).cast("double") / 1e4).as("revenue"))
        .orderBy(col("n_name"))
    }),

    // Window function — top-3 parts by revenue within each brand. The rank
    // is computed over the ROUNDED revenue with the part key as tiebreak, so
    // ordering is deterministic across engines.
    "q23_top_parts_per_brand" -> ((s, dir) => {
      val li   = Tables.lineitem(s, dir)
      val part = Tables.part(s, dir)
      val rev = li
        .join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      val w = Window.partitionBy(col("p_brand")).orderBy(col("revenue").desc, col("p_partkey"))
      rev.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("p_brand"), col("p_partkey"), col("revenue"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("p_brand"), col("rnk"))
    }),

    // Semi-join — order-priority counts for orders having a high-quantity
    // line item (left_semi: no duplication, no distinct needed).
    "q24_priority_semi" -> ((s, dir) => {
      val bigLines = Tables.lineitem(s, dir).filter(col("l_quantity") > 30).select(col("l_orderkey"))
      Tables
        .orders(s, dir)
        .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // Anti-join — customers with no high-value order (>450k).
    "q25_customers_no_orders" -> ((s, dir) => {
      val ord = Tables.orders(s, dir).filter(col("o_totalprice") > 450000).select(col("o_custkey"))
      Tables
        .customer(s, dir)
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Distinct aggregation — distinct customers per order status.
    "q26_distinct_customers" -> ((s, dir) =>
      Tables
        .orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus"))),

    // TPC-H Q17-style — correlated scalar subquery (small-quantity orders
    // below 20% of the per-part average). Expressed as a join against the
    // pre-aggregated per-part averages: the decorrelated form Catalyst
    // would rewrite to anyway, and the only form that scales (the
    // correlated subquery is a re-scan per row in a naive engine).
    "q70_small_qty_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val brandParts = Tables.part(s, dir).filter(col("p_brand") === "Brand#1").select(col("p_partkey"))
      val avgQty = li
        .groupBy(col("l_partkey"))
        .agg(avg(col("l_quantity")).as("aq"))
      li.join(broadcast(brandParts), li("l_partkey") === brandParts("p_partkey"))
        .join(avgQty.withColumnRenamed("l_partkey", "a_partkey"), col("l_partkey") === col("a_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("aq"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 4).as("avg_yearly"))
    }),

    // TPC-H Q18-style — large orders (HAVING over a grouped sum), joined
    // back to customer for the report.
    "q71_large_orders" -> ((s, dir) => {
      val big = Tables
        .lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
        .filter(col("total_qty") > 120)
      Tables
        .orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(20)
    }),

    // Scalar-function coverage: date parts, string ops, conditional logic —
    // one pass over orders, every function mirrored in the oracle.
    "q72_scalar_functions" -> ((s, dir) =>
      Tables
        .orders(s, dir)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mth"),
          upper(substring(col("o_orderpriority"), 1, 8)).as("prio_u"),
          length(col("o_orderstatus")).cast("long").as("st_len"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low")
            .as("bucket"),
          round(col("o_totalprice") % 1000, 2).as("price_mod"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("tag")
        )
        .orderBy(col("o_orderkey"))),

    // TPC-H Q6 — forecasting revenue change: pure filter + global aggregate
    // (every predicate pushes into the scan; no shuffle at all beyond the
    // final single-row combine). Exact cents.
    "q78_forecast_revenue" -> ((s, dir) =>
      Tables
        .lineitem(s, dir)
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
            col("l_quantity") < 24
        )
        .select(
          (round(col("l_extendedprice") * 100).cast("long") *
            round(col("l_discount") * 100).cast("long")).as("rev4")
        )
        .agg((sum(col("rev4")).cast("double") / 1e4).as("revenue"))),

    // TPC-H Q10-style — top-20 customers by returned-item revenue.
    "q79_returned_revenue" -> ((s, dir) => {
      val li = Tables
        .lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(
          col("l_orderkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev4")
        )
      li.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg((sum(col("rev4")).cast("double") / 1e4).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q21 shape: suppliers solely to blame for a return on a
    // multi-supplier order — EXISTS (another supplier on the order) as a
    // LeftSemi and NOT EXISTS (another supplier with a return) as a
    // LeftAnti, both equi self-joins on the fact table. The dimension join
    // (supplier names) broadcasts; the semi/anti joins shuffle on orderkey
    // and never duplicate fact rows (Catalyst keeps them semi/anti — the
    // inner-join + distinct rewrite would).
    "q83_blamed_suppliers" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      val returned = l.filter(col("l_returnflag") === "R").select(col("l_orderkey"), col("l_suppkey"))
      val others = l.select(col("l_orderkey").as("o_ok"), col("l_suppkey").as("o_sk"))
      val otherReturns = returned.select(col("l_orderkey").as("r_ok"), col("l_suppkey").as("r_sk"))
      returned
        .join(others, col("l_orderkey") === col("o_ok") && col("l_suppkey") =!= col("o_sk"), "left_semi")
        .join(otherReturns, col("l_orderkey") === col("r_ok") && col("l_suppkey") =!= col("r_sk"), "left_anti")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // TPC-H Q12-style — OR-of-ANDs predicate classes (complex boolean
    // pushdown) with grouped counts.
    "q76_or_predicates" -> ((s, dir) =>
      Tables
        .lineitem(s, dir)
        .filter(
          (col("l_returnflag") === "A" && col("l_quantity") > 25) ||
            (col("l_returnflag") === "N" && col("l_discount") < 0.03)
        )
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_linestatus"))),

    // TPC-H Q14-style — promo revenue share: conditional aggregation with a
    // LIKE predicate over the joined part type, exact integer cents.
    "q77_promo_share" -> ((s, dir) => {
      val li   = Tables.lineitem(s, dir)
      val part = Tables.part(s, dir)
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .select(
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev4"),
          col("p_type").like("PROMO%").as("is_promo")
        )
        .agg(
          // both sums are exact int64 < 2^53 → cast-to-double is exact and
          // the (a/b)*1e4 chain is one deterministic IEEE sequence
          (sum(when(col("is_promo"), col("rev4")).otherwise(0L)).cast("double")
            / sum(col("rev4")).cast("double") * 10000.0).as("promo_share_bp")
        )
    }),

    // Region → nation → supplier dimension chain (covers the two remaining
    // tables): supplier counts and account balances per region.
    "q75_region_suppliers" -> ((s, dir) => {
      val reg = Tables.region(s, dir)
      val nat = Tables.nation(s, dir)
      val sup = Tables.supplier(s, dir)
      sup
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("n_suppliers"),
          (sum(round(col("s_acctbal") * 100).cast("long")).cast("double") / 100.0).as("total_acctbal")
        )
        .orderBy(col("r_name"))
    }),

    // Analytic window-function sweep: ranking, offsets, and distribution
    // functions over each customer's order history in one pass.
    "q73_analytic_functions" -> ((s, dir) => {
      val w  = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wp = Window.partitionBy(col("o_custkey"))
      Tables
        .orders(s, dir)
        // exact integer cents: "price - partition avg" computed as
        // (cents*n - Σcents) / (100n) — integer numerator, so the value is
        // engine-order-independent (a double Σ would differ in the last ulp
        // and flip the rounded digit).
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          row_number().over(w).cast("long").as("seq"),
          rank().over(Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey")))
            .cast("long").as("price_rank"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          ntile(4).over(w).cast("long").as("quartile"),
          // no rounding: exact-integer numerator / small denominator is one
          // IEEE division — bit-identical on every engine (rounding would
          // hit .xxx25 half-way boundaries where engines disagree)
          ((col("cents") * count(lit(1)).over(wp) - sum(col("cents")).over(wp)).cast("double")
            / (count(lit(1)).over(wp) * 100).cast("double")).as("diff_from_avg")
        )
        .orderBy(col("o_custkey"), col("seq"))
    }),

    // CUBE over (status, priority): all grouping-set combinations.
    "q74_cube" -> ((s, dir) =>
      Tables
        .orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        // grand total ~1e10: sum exact cents, divide once (see q20 note)
        .agg(
          count(lit(1)).as("n"),
          (sum(round(col("o_totalprice") * 100).cast("long")).cast("double") / 100.0).as("total")
        )
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    // Event-time tumbling window — the batch twin of the streaming windowed
    // aggregate (window().start == DuckDB time_bucket on UTC timestamps).
    "q27_event_time_windows" -> ((s, dir) =>
      Tables
        .events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .select(
          col("window.start").as("window_start"),
          col("event_type"),
          col("n"),
          col("total")
        )
        .orderBy(col("window_start"), col("event_type"))),

    // TPC-H Q2 shape — correlated MIN subquery (cheapest line per part),
    // decorrelated to group-min + join-back on (key, min): the rewrite
    // Catalyst produces for a correlated scalar subquery and the only form
    // that scales (no per-row re-scan). Price compared in exact cents.
    "q84_cheapest_line_per_part" -> ((s, dir) => {
      val li = Tables
        .lineitem(s, dir)
        .select(
          col("l_partkey"),
          col("l_suppkey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents")
        )
      val minCents = li.groupBy(col("l_partkey").as("m_partkey")).agg(min(col("cents")).as("min_cents"))
      li.join(minCents, col("l_partkey") === col("m_partkey") && col("cents") === col("min_cents"))
        .join(broadcast(Tables.part(s, dir).filter(col("p_size") < 10)), col("l_partkey") === col("p_partkey"))
        .select(
          col("p_partkey"),
          col("p_name"),
          col("l_suppkey"),
          (col("cents").cast("double") / 100.0).as("min_price")
        )
        .orderBy(col("p_partkey"), col("l_suppkey"))
    }),

    // TPC-H Q13 — customer order-count distribution: LEFT OUTER join so
    // zero-order customers survive, count(non-null) per customer, then a
    // second aggregation over the counts. Two shuffles (custkey, c_count) —
    // both on the natural keys, no row explosion anywhere.
    "q85_order_count_distribution" -> ((s, dir) => {
      val ord = Tables.orders(s, dir).filter(col("o_orderpriority") =!= "1-URGENT")
      Tables
        .customer(s, dir)
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count")) // count(col) skips nulls
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q15 — top supplier(s) by period revenue: the aggregated view
    // + scalar-max subquery, expressed as a 1-row broadcast cross join
    // (the q56/q51 tiny-crossJoin pattern). Revenue in exact 1e-4 units so
    // the max-equality join cannot be split by float noise.
    "q86_top_supplier" -> ((s, dir) => {
      val rev = Tables
        .lineitem(s, dir)
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp")
        )
        .groupBy(col("l_suppkey"))
        .agg(
          sum(
            round(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - round(col("l_discount") * 100).cast("long"))
          ).as("rev4")
        )
      val top = rev.agg(max(col("rev4")).as("max4"))
      rev
        .join(broadcast(top), col("rev4") === col("max4"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), (col("rev4").cast("double") / 1e4).as("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // RANGE-frame window: per customer, trailing-30-day revenue at each
    // order — the VALUE-based frame (ties share a frame; deterministic by
    // construction, unlike ROWS on a tied sort). Ordered on epoch seconds
    // because Spark's rangeBetween takes numeric offsets; the oracle
    // mirrors the same numeric frame. Exact cents inside the frame sum.
    "q90_trailing_revenue" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("sec"))
        .rangeBetween(-30L * 86400L, 0L)
      Tables
        .orders(s, dir)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("sec"),
          round(col("o_totalprice") * 100).cast("long").as("cents")
        )
        .withColumn("trail30", (sum(col("cents")).over(w).cast("double") / 100.0))
        .select(col("o_custkey"), col("o_orderkey"), col("trail30").as("trailing_30d_revenue"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Explicit GROUPING SETS (status totals, priority totals, grand total)
    // with grouping_id disambiguating the null-vs-subtotal rows — the
    // grouping-sets surface beyond q29's ROLLUP and q74's CUBE, through
    // Spark 4's Dataset#groupingSets API.
    "q91_grouping_sets" -> ((s, dir) =>
      Tables
        .orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderstatus"),
          col("o_orderpriority")
        )
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          (sum(round(col("o_totalprice") * 100).cast("long")).cast("double") / 100.0).as("total")
        )
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    // String-function sweep beyond q72: regex extraction, split_part,
    // translate, padding, edit distance — each mirrored 1:1 in the oracle
    // (portable subset only; e.g. substring_index is NOT split_part and is
    // deliberately absent).
    "q92_string_functions" -> ((s, dir) =>
      Tables
        .customer(s, dir)
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "#(\\d+)$", 1).as("digits"),
          split_part(col("c_name"), lit("#"), lit(1)).as("prefix"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_lower_vowels"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          levenshtein(col("c_mktsegment"), lit("BUILDING")).cast("long").as("seg_dist"),
          reverse(col("c_name")).as("rev")
        )
        .orderBy(col("c_custkey"))),

    // Date/time-function sweep: truncation, month-end, component extracts,
    // day arithmetic. Portability notes encoded in the expressions:
    // dayofweek is 1=Sunday in Spark but 0=Sunday in DuckDB (normalized to
    // 0-based here), and datediff(end, start) = DuckDB
    // date_diff('day', start, end).
    "q93_date_functions" -> ((s, dir) =>
      Tables
        .orders(s, dir)
        .select(
          col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow0"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).cast("long").as("days_since_epoch0")
        )
        .orderBy(col("o_orderkey"))),

    // FUNNEL: signup -> view -> purchase per user, each stage's first
    // event at-or-after the previous stage's. Three conditional-min
    // aggregations chained by per-user joins (the decorrelated form);
    // output is the single funnel row a dashboard reads.
    "q94_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
      val s1 = ev
        .filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("t_signup"))
      val s2 = ev
        .filter(col("event_type") === "view")
        .join(s1, Seq("user_id"))
        .filter(col("ts") >= col("t_signup"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("t_view"))
      val s3 = ev
        .filter(col("event_type") === "purchase")
        .join(s2, Seq("user_id"))
        .filter(col("ts") >= col("t_view"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("t_purchase"))
      s1.agg(count(lit(1)).as("n_signup"))
        .crossJoin(broadcast(s2.agg(count(lit(1)).as("n_view_after"))))
        .crossJoin(broadcast(s3.agg(count(lit(1)).as("n_purchase_after"))))
    }),

    // TPC-H Q22 shape — "pending" wealthy customers: above-average account
    // balance (scalar AVG subquery) and no RECENT orders (anti join against
    // the date-filtered fact), grouped by the segment initial (the
    // cntrycode-substring analogue). The above-average filter is EXACT:
    // cents*n > total_cents compares the rational avg by
    // cross-multiplication — no double roundoff at the boundary, so the
    // row set is engine- and order-independent.
    "q87_pending_customers" -> ((s, dir) => {
      val cust = Tables
        .customer(s, dir)
        .select(
          col("c_custkey"),
          substring(col("c_mktsegment"), 1, 1).as("seg"),
          round(col("c_acctbal") * 100).cast("long").as("cents")
        )
      val pos = cust.filter(col("cents") > 0)
      val stats = broadcast(pos.agg(sum(col("cents")).as("total_cents"), count(lit(1)).as("n_pos")))
      pos
        .crossJoin(stats) // 1 row, broadcast — every executor gets the scalar
        .filter(col("cents") * col("n_pos") > col("total_cents"))
        .join(
          Tables
            .orders(s, dir)
            .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"),
          "left_anti"
        )
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n_cust"), (sum(col("cents")).cast("double") / 100.0).as("total_bal"))
        .orderBy(col("seg"))
    }),

    // TPC-H Q7 — volume shipping between a nation PAIR, both directions,
    // per ship year. Physical shape: each fact is REDUCED before the
    // fact-fact join — lineitem drops to the 2-nation supplier slice via a
    // broadcast of the (filtered) supplier dim, orders drops to the
    // 2-nation customer slice the same way — and only then do the two
    // reduced facts shuffle on orderkey. The cross-pair condition
    // (supp ≠ cust) is a residual filter after the join; with both sides
    // already restricted to the two nations it is exactly the
    // (A,B)/(B,A) disjunction of the spec.
    //
    // Scale note: nation is fixed-size (safe to force-broadcast forever);
    // the 2-nation CUSTOMER slice scales with the data — the explicit hint
    // is right while it fits (8% of a dimension), and dropping it lets
    // AQE choose broadcast-vs-shuffle from the runtime size when it
    // doesn't.
    "q95_volume_shipping" -> ((s, dir) => {
      val pair = Seq("NATION_1", "NATION_2")
      val nat  = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
      val sup = Tables
        .supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables
        .customer(s, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ord = Tables
        .orders(s, dir)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("cust_nation"))
      Tables
        .lineitem(s, dir)
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp")
        )
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(
          col("supp_nation"),
          col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year")
        )
        .agg(
          (sum(
            round(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - round(col("l_discount") * 100).cast("long"))
          ).cast("double") / 1e4).as("revenue")
        )
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // TPC-H Q8 — market share: of all PROMO-part revenue sold into the
    // EUROPE customer market per order year, what fraction came from
    // NATION_3 suppliers? The share is a ratio of two EXACT scaled-integer
    // sums (conditional numerator via CASE inside the same aggregate), so
    // one double division at the end is the only inexact step — engine- and
    // order-independent. All four dims (part, supplier+nation, customer+
    // nation+region) broadcast; the only exchanges are the lineitem⋈orders
    // orderkey shuffle and the final year-keyed aggregate.
    "q96_market_share" -> ((s, dir) => {
      val part = Tables.part(s, dir).filter(col("p_type") === "PROMO").select(col("p_partkey"))
      val supNation = Tables
        .supplier(s, dir)
        .join(
          broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey")
        )
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val eurCust = Tables
        .customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(
          broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey")
        )
        .select(col("c_custkey"))
      val ord = Tables
        .orders(s, dir)
        .filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")
        )
        .join(broadcast(eurCust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
      Tables
        .lineitem(s, dir)
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(
          col("o_year"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("vol4"),
          col("supp_nation")
        )
        .groupBy(col("o_year"))
        .agg(
          round(
            sum(when(col("supp_nation") === "NATION_3", col("vol4")).otherwise(0L)).cast("double") /
              sum(col("vol4")).cast("double"),
            6
          ).as("mkt_share")
        )
        .orderBy(col("o_year"))
    }),

    // TPC-H Q9 — product-type profit per supplier nation per year, for
    // parts matching a name pattern. No partsupp table in this corpus, so
    // supply cost is the deterministic surrogate retailprice/2; profit =
    // extprice·(1−disc) − qty·retailprice/2, carried as TWO int64 sums
    // (scale 1e4 each) and combined by one double division — exact
    // cross-engine regardless of accumulation order (the magnitudes that
    // break rounded double sums at sf0.1, see q20's note). Part and
    // supplier+nation broadcast; lineitem⋈orders shuffles on orderkey (year
    // comes from o_orderdate, so the orders side is irreducible here).
    "q97_product_profit" -> ((s, dir) => {
      val part = Tables
        .part(s, dir)
        .filter(col("p_name").like("%bolt%"))
        .select(col("p_partkey"), round(col("p_retailprice") * 100).cast("long").as("r2"))
      val supNation = Tables
        .supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val ord = Tables
        .orders(s, dir)
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
      Tables
        .lineitem(s, dir)
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(
          col("nation"),
          col("o_year"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev4"),
          (round(col("l_quantity") * 100).cast("long") * col("r2")).as("cost4")
        )
        .groupBy(col("nation"), col("o_year"))
        .agg(
          ((sum(col("rev4")) * 2 - sum(col("cost4"))).cast("double") / 2e4).as("profit")
        )
        .orderBy(col("nation"), col("o_year"))
    }),

    // FULL OUTER reconciliation — per-nation customer count vs supplier
    // count, keeping nations that have only one side (the "what's missing
    // from either ledger" report; the one outer-join flavor nothing else
    // in the registry exercises). Both inputs are pre-aggregated to
    // nation-key cardinality BEFORE the outer join, so the join touches
    // dim-sized frames no matter how large the base tables are.
    "q103_nation_reconciliation" -> ((s, dir) => {
      val custN = Tables
        .customer(s, dir)
        .filter(col("c_acctbal") > 7500)
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val supN = Tables
        .supplier(s, dir)
        .filter(col("s_acctbal") > 7500)
        .groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      custN
        .join(supN, Seq("nationkey"), "full_outer")
        .join(broadcast(Tables.nation(s, dir)), col("nationkey") === col("n_nationkey"))
        .select(
          col("n_name"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          (coalesce(col("n_cust"), lit(0L)) - coalesce(col("n_supp"), lit(0L))).as("gap")
        )
        .orderBy(col("n_name"))
    }),

    // TPC-H Q19 — disjunctive multi-attribute join predicate: revenue from
    // three (brand, size-range, quantity-range) classes OR'd together. The
    // equi key (partkey) is extracted by Catalyst; the OR-of-ANDs spanning
    // BOTH tables stays as the join residual. The brand disjunction's
    // common superset (brand ∈ {1,2,3}) is applied on the part side before
    // the join, so the broadcast dim carries only candidate parts and the
    // scan prunes on the pushed-down brand filter.
    "q98_disjunctive_join" -> ((s, dir) => {
      val part = Tables
        .part(s, dir)
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val classes =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity").between(15, 35)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity").between(25, 50))
      Tables
        .lineitem(s, dir)
        .join(broadcast(part), col("l_partkey") === col("p_partkey") && classes)
        .agg(
          (sum(
            round(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - round(col("l_discount") * 100).cast("long"))
          ).cast("double") / 1e4).as("revenue"),
          count(lit(1)).as("n_lines")
        )
    })
  )

  val oracles: Map[String, String] = Map(
    "q20_pricing_summary" ->
      """WITH li AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS q2,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p2,
        |    CAST(round(l_discount * 100) AS BIGINT) AS d2,
        |    CAST(round(l_tax * 100) AS BIGINT) AS t2
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01')
        |SELECT l_returnflag, l_linestatus,
        |  CAST(sum(q2) AS DOUBLE) / 100.0 AS sum_qty,
        |  CAST(sum(p2) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(sum(p2 * (100 - d2)) AS DOUBLE) / 1e4 AS sum_disc_price,
        |  CAST(sum(p2 * (100 - d2) * (100 + t2)) AS DOUBLE) / 1e6 AS sum_charge,
        |  CAST(sum(q2) AS DOUBLE) / CAST(count(*) * 100 AS DOUBLE) AS avg_qty,
        |  CAST(sum(p2) AS DOUBLE) / CAST(count(*) * 100 AS DOUBLE) AS avg_price,
        |  CAST(sum(d2) AS DOUBLE) / CAST(count(*) * 100 AS DOUBLE) AS avg_disc,
        |  count(*) AS count_order
        |FROM li GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q21_top_orders" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q22_nation_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 1e4 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q23_top_parts_per_brand" ->
      """WITH rev AS (
        |  SELECT p_brand, p_partkey,
        |    round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_partkey)
        |SELECT p_brand, p_partkey, revenue, rnk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rnk
        |  FROM rev) WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,
    "q24_priority_semi" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 30)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q25_customers_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "q26_distinct_customers" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q27_event_time_windows" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q70_small_qty_revenue" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,
    "q71_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty FROM (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 120) big
        |JOIN orders ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin,
    "q72_scalar_functions" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mth,
        |  upper(substr(o_orderpriority, 1, 8)) AS prio_u,
        |  CAST(length(o_orderstatus) AS BIGINT) AS st_len,
        |  CASE WHEN o_totalprice > 300000 THEN 'high'
        |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS bucket,
        |  round(o_totalprice % 1000, 2) AS price_mod,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS tag
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q78_forecast_revenue" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 1e4 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.02 AND l_discount <= 0.04 AND l_quantity < 24""".stripMargin,
    "q79_returned_revenue" ->
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 1e4 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q83_blamed_suppliers" ->
      """SELECT s_name, numwait FROM (
        |  SELECT r.l_suppkey, count(*) AS numwait
        |  FROM lineitem r
        |  WHERE r.l_returnflag = 'R'
        |    AND EXISTS (SELECT 1 FROM lineitem o
        |                WHERE o.l_orderkey = r.l_orderkey AND o.l_suppkey <> r.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM lineitem o2
        |                    WHERE o2.l_orderkey = r.l_orderkey AND o2.l_suppkey <> r.l_suppkey
        |                      AND o2.l_returnflag = 'R')
        |  GROUP BY r.l_suppkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q76_or_predicates" ->
      """SELECT l_linestatus, count(*) AS n FROM lineitem
        |WHERE (l_returnflag = 'A' AND l_quantity > 25)
        |   OR (l_returnflag = 'N' AND l_discount < 0.03)
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q77_promo_share" ->
      """WITH r AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev4,
        |         p_type LIKE 'PROMO%' AS is_promo
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT CAST(sum(CASE WHEN is_promo THEN rev4 ELSE 0 END) AS DOUBLE)
        |       / CAST(sum(rev4) AS DOUBLE) * 10000.0 AS promo_share_bp
        |FROM r""".stripMargin,
    "q75_region_suppliers" ->
      """SELECT r_name, count(*) AS n_suppliers,
        |  CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q73_analytic_functions" ->
      """WITH o AS (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER w AS BIGINT) AS seq,
        |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  CAST(cents * (count(*) OVER p) - (sum(cents) OVER p) AS DOUBLE)
        |        / CAST((count(*) OVER p) * 100 AS DOUBLE) AS diff_from_avg
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |       p AS (PARTITION BY o_custkey)
        |ORDER BY o_custkey, seq""".stripMargin,
    "q74_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q84_cheapest_line_per_part" ->
      """WITH li AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        | mn AS (SELECT l_partkey, min(cents) AS min_cents FROM li GROUP BY 1)
        |SELECT p_partkey, p_name, l_suppkey,
        |  CAST(min_cents AS DOUBLE) / 100.0 AS min_price
        |FROM li JOIN mn USING (l_partkey) JOIN part ON l_partkey = p_partkey
        |WHERE cents = min_cents AND p_size < 10
        |ORDER BY p_partkey, l_suppkey""".stripMargin,
    "q85_order_count_distribution" ->
      """WITH c_orders AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM c_orders GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q86_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(rev4 AS DOUBLE) / 1e4 AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev4 = (SELECT max(rev4) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q92_string_functions" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, '#(\d+)$', 1) AS digits,
        |  split_part(c_name, '#', 1) AS prefix,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels,
        |  lpad(c_custkey::VARCHAR, 8, '0') AS padded,
        |  levenshtein(c_mktsegment, 'BUILDING')::BIGINT AS seg_dist,
        |  reverse(c_name) AS rev
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q93_date_functions" ->
      """SELECT o_orderkey,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(last_day(o_orderdate::DATE) AS TIMESTAMP) AS month_end,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow0,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch0
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q94_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t_signup FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        | s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t_view FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'view' AND e.ts >= s1.t_signup GROUP BY e.user_id),
        | s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t_view GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM s1) AS n_signup,
        |       (SELECT count(*) FROM s2) AS n_view_after,
        |       (SELECT count(*) FROM s3) AS n_purchase_after""".stripMargin,
    "q90_trailing_revenue" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
        |    PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
        |    AS trailing_30d_revenue
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q91_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q87_pending_customers" ->
      """WITH cust AS (
        |  SELECT c_custkey, substr(c_mktsegment, 1, 1) AS seg,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        | pos AS (SELECT * FROM cust WHERE cents > 0),
        | stats AS (SELECT sum(cents) AS total_cents, count(*) AS n_pos FROM pos)
        |SELECT seg, count(*) AS n_cust, CAST(sum(cents) AS DOUBLE) / 100.0 AS total_bal
        |FROM pos, stats
        |WHERE cents * n_pos > total_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '1998-01-01')
        |GROUP BY seg ORDER BY seg""".stripMargin,
    "q103_nation_reconciliation" ->
      """WITH custN AS (
        |  SELECT c_nationkey AS nationkey, count(*) AS n_cust
        |  FROM customer WHERE c_acctbal > 7500 GROUP BY 1),
        | supN AS (
        |  SELECT s_nationkey AS nationkey, count(*) AS n_supp
        |  FROM supplier WHERE s_acctbal > 7500 GROUP BY 1)
        |SELECT n_name, coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp,
        |  coalesce(n_cust, 0) - coalesce(n_supp, 0) AS gap
        |FROM custN FULL OUTER JOIN supN USING (nationkey)
        |JOIN nation ON nationkey = n_nationkey
        |ORDER BY n_name""".stripMargin,
    "q95_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 1e4 AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q96_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  round(
        |    CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
        |                  THEN CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |                  ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE),
        |    6) AS mkt_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  JOIN region ON n2.n_regionkey = r_regionkey
        |WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q97_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) * 2
        |     - sum(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(p_retailprice * 100) AS BIGINT)) AS DOUBLE) / 2e4 AS profit
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%bolt%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q98_disjunctive_join" ->
      """SELECT
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 1e4 AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 15 AND 35)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 25 AND 50)""".stripMargin
  )
}
