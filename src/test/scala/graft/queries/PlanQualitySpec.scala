package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regressions: the scale properties (predicate pushdown,
  * column pruning, broadcast dimension joins) are asserted on the optimized
  * plans, so a refactor that silently de-optimizes a query fails CI — the
  * 100 TB design is enforced, not just documented.
  */
class PlanQualitySpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q20 pushes the shipdate filter into the parquet scan and prunes columns") {
    val df   = SparkEntry.queries("q20_pricing_summary")(spark, dir)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("PushedFilters") && scan.contains("l_shipdate"), scan.take(500))
    // Column pruning: the scan schema must NOT include unused l_partkey.
    assert(!scan.contains("l_partkey"), "scan reads columns the query never uses")
  }

  test("q22 joins every dimension via broadcast (fact table never shuffles for dims)") {
    val plan = executedPlan("q22_nation_revenue")
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("SortMergeJoin"), "dimension join fell back to SMJ:\n" + plan.take(800))
  }

  test("q24 semi-join stays a semi-join (no duplicating inner join + distinct)") {
    val plan = executedPlan("q24_priority_semi")
    assert(plan.contains("LeftSemi"), plan.take(500))
  }

  test("q83 keeps EXISTS/NOT-EXISTS as semi/anti joins; supplier dim broadcasts") {
    val plan = executedPlan("q83_blamed_suppliers")
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin"), "supplier dim join must broadcast:\n" + plan.take(800))
  }

  test("flagship balance query is a two-phase aggregate (map-side partial combine)") {
    val plan = executedPlan("q09_balance")
    // partial_sum before the exchange, final sum after — one shuffle total.
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"), plan.take(500))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2, "unexpected extra shuffles")
  }

  test("LSH candidate generation never materializes buckets into rows (no collect_list)") {
    // The minhash band pipeline and q52 (SRP signatures) generate pairs
    // via equi self-joins: a collect_list of a bucket puts an unbounded
    // doc list into ONE row and its pair expansion into ONE task — the
    // classic skewed-bucket OOM at 100 TB. The dedup family now reads the
    // memoized tables, so the gate targets the MEMO BUILD pipeline (the
    // DAG that actually computes candidates) plus q52, which stays live.
    val build = DedupQueries.memoBuildPlan(spark, dir).queryExecution.optimizedPlan.toString
    assert(!build.contains("collect_list"), "memo build materializes buckets:\n" + build.take(800))
    val q52 = SparkEntry.queries("q52_srp_lsh")(spark, dir).queryExecution.optimizedPlan.toString
    assert(!q52.contains("collect_list"), "q52 materializes buckets:\n" + q52.take(800))
  }


  test("q48 simhash blocking ships the production shape: wide bands, pair expansion via self-join") {
    val plan = SparkEntry.queries("q48_simhash_neardup")(spark, dir).queryExecution.optimizedPlan.toString
    // candidates are an equi self-join on (band, band-value) — a collect_list
    // of a bucket would put its whole pair expansion into one task
    assert(!plan.contains("collect_list"), s"q48 materializes buckets:\n" + plan.take(800))
    // the 15-bit band extraction (% 32768 = 2^15 buckets/band) — the 256-
    // bucket 8-bit shape grows candidates quadratically with corpus size
    assert(plan.contains("32768"), "band width regressed from the 15-bit production shape:\n" + plan.take(800))
  }

  test("q51 centroids aggregate per-dimension scalars, never whole clusters") {
    // The coarse quantizer must shuffle (label, pos, value) scalars — a
    // collect_list over (vec_id, embedding) puts an entire cluster into one
    // row. The only collect_list allowed is the Dim-bounded (pos, c)
    // re-assembly.
    val plan = SparkEntry.queries("q51_ann_ivf")(spark, dir).queryExecution.optimizedPlan.toString
    assert(plan.contains("posexplode"), plan.take(800))
    assert(!plan.contains("collect_list(struct(vec_id"), "whole-cluster rows:\n" + plan.take(800))
  }

  test("q52 signatures are constant-folded plane dots (no plane crossJoin, no signature shuffle)") {
    val plan = SparkEntry.queries("q52_srp_lsh")(spark, dir).queryExecution.optimizedPlan.toString
    assert(plan.contains("vector_dot"), plan.take(800))
    // planes embedded as folded literals — no join against a plane relation
    assert(!plan.contains("CartesianProduct") && !plan.contains("md5"), plan.take(800))
  }

  test("q41 minhash signatures are narrow folds: no aggregation, no shingle explode") {
    // Signatures are per-row array folds (minhashCol). The only permitted
    // exchanges are the small-scan spread (REPARTITION_BY_COL — the
    // documented harness shim, Tables.spread) and the output sort; the
    // only Generate is the bounded stack unpivot, never a shingle explode.
    val plan = executedPlan("q41_minhash_sig")
    assert(!plan.contains("HashAggregate"), "signature generation acquired an aggregation:\n" + plan.take(800))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges <= 1, s"$hashExchanges hash exchanges (only the spread shim is allowed):\n" + plan.take(800))
    assert("Generate ".r.findAllIn(plan).size == 1 && plan.contains("Generate stack"),
      "unexpected explode in the signature path:\n" + plan.take(800))
  }

  test("q185 repetition signals are per-row work: no shuffle except the output sort") {
    // The argmax-n-gram and every fraction run INSIDE the row (higher-order
    // functions over the document's own grams) — a groupBy/explode
    // formulation would shuffle every n-gram occurrence corpus-wide at
    // 100 TB. Only the final orderBy's range exchange is allowed.
    val plan = executedPlan("q185_gopher_repetition")
    assert(!plan.contains("Exchange hashpartitioning"), "per-row op acquired a hash shuffle:\n" + plan.take(800))
    assert(!plan.contains("Generate explode"), "n-grams exploded into rows:\n" + plan.take(800))
  }

  test("q192 SCD build: one key exchange, one window sort reused by all three windows") {
    // The change filter and the lag/lead/row_number windows all share
    // (user_id) partitioning and (ts, event_id) ordering — the plan must
    // carry exactly ONE hash exchange and at most two sorts (the shared
    // window sort + the output orderBy); a second key exchange or a
    // re-sort between windows would double the shuffle at 100 TB.
    val plan  = executedPlan("q192_scd2_history")
    val exchs = "Exchange hashpartitioning".r.findAllIn(plan).size
    val sorts = "Sort \\[".r.findAllIn(plan).size
    assert(exchs == 1, s"$exchs key exchanges (window reuse lost):\n" + plan.take(800))
    assert(sorts <= 2, s"$sorts sorts (window sort not reused):\n" + plan.take(800))
  }

  test("q193 ScdStore.mergeRows: one batch-side key exchange; the windows and the open-version join share it") {
    // The merge's scale claim: per batch, ONE key shuffle of the change
    // batch — the tie-collapse window, the open-version join, the
    // lag-dedup and the numbering/lead windows all run on (user_id)
    // partitioning with (ts, event_id) ordering, so the batch side must
    // plan exactly one hash exchange (the union's two branches re-derive
    // the frame — Spark plans each branch independently, so the gate
    // bounds exchanges PER BRANCH: ≤ 1 on any path from a batch scan).
    // The store's seed side aggregates the changelog (its own exchange,
    // dimension-sized input) — counted separately.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val tmp   = java.nio.file.Files.createTempDirectory("graft-scd-plan")
    graft.sources.SessionMemo.deleteOnExit(tmp)
    val store = new graft.streaming.ScdStore(spark, s"$tmp/store", EventQueries.ScdOpenEnd)
    def batch(id: Long) = Seq((1L, java.sql.Timestamp.valueOf(s"2024-01-0$id 00:00:00"), id, id * 100L))
      .toDF("user_id", "ts", "event_id", "cents")
    store.merge(batch(1L), 0L) // so the seed side is non-empty and planned for real
    val frame = store.mergeRows(batch(2L), 1L)
    // the physical answer must not degenerate
    val plan = frame.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "merge degenerated to a nested loop:\n" + plan.take(800))
    // per-branch exchange bound: newRows and closes each re-derive `ch`,
    // so the whole-plan count is ≤ 2 batch-side + 2 seed-side exchanges;
    // a lost window/join reuse would add a third per branch
    val exchs = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchs <= 5, s"$exchs hash exchanges — batch-side partitioning reuse lost:\n" + plan.take(1200))
    // the result must still be the right rows (v2 appended, v1 closed)
    val got = frame.select(col("user_id"), col("version"), col("is_current"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (1L, 1L, 0L)), s"got $got")
  }

  test("q195 PIT enrichment runs through the custom as-of merge node, never an interval pair join") {
    // The scale claim: one single-pass merge per key partition. A lost
    // strategy registration would fall back to... nothing (AsofJoin has no
    // built-in lowering) or a caller rewrite to a range-predicate join —
    // both must fail here.
    val plan = executedPlan("q195_pit_enrich")
    assert(plan.contains("AsofJoin "), "custom as-of node missing:\n" + plan.take(800)) // AsofJoinExec renders as "AsofJoin"
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "PIT enrichment degenerated to a pair join:\n" + plan.take(800))
    // the dimension side must ride the SCD build's OWN key exchange into
    // the merge (same user_id partitioning) — probe + build + output sort
    val exchs = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchs <= 2, s"$exchs hash exchanges — the dim side re-shuffled for the merge:\n" + plan.take(1200))
  }

  test("q191 funnel stages join hash-equi, never nested-loop") {
    val plan = executedPlan("q191_funnel")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "a funnel stage degenerated to a nested loop:\n" + plan.take(800))
  }

  test("q190 rank fill is a partial top-k; mixture math stays on the dimension") {
    // The foldable budget bound must engage WindowGroupLimit so each
    // partition forwards at most MixBudget rows per language to the rank
    // exchange — without it the whole corpus sorts through the window at
    // 100 TB. The allocation side joins back as a broadcast (dim-sized).
    val plan = executedPlan("q190_temperature_mix")
    assert(plan.contains("WindowGroupLimit"), "rank fill lost the partial top-k:\n" + plan.take(800))
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      "allocation no longer broadcasts:\n" + plan.take(800))
  }

  test("q55 quantization is a narrow pass: no shuffle except the output sort") {
    // Codes/errors never leave their row — the only exchange in the plan is
    // the final orderBy's range partitioning. A groupBy or join sneaking in
    // would shuffle the whole embedding corpus at 100 TB.
    val plan = executedPlan("q55_quantize_int8")
    assert(!plan.contains("Exchange hashpartitioning"), "per-row op acquired a hash shuffle:\n" + plan.take(800))
  }

  test("q56 tf-idf broadcasts only the 1-row corpus count; tf-df joins shuffle on term") {
    val plan = executedPlan("q56_tfidf")
    // N is a broadcast scalar (vocab-sized df is NOT broadcast: it scales)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), "corpus-size join fell back to cartesian")
  }

  test("q50 top-k is pushed below the shuffle (partial WindowGroupLimit) and scores with vector_cosine") {
    val plan = executedPlan("q50_cosine_topk")
    assert(plan.contains("vector_cosine"), plan.take(500))
    // rank<=k prunes per-partition BEFORE the exchange — each partition
    // ships at most k rows per query instead of the full scored corpus.
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"), plan.take(800))
    // and the query set side is broadcast, never shuffling the corpus
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q84 correlated min stays decorrelated: group-min + equi join, part dim broadcasts") {
    val plan = executedPlan("q84_cheapest_line_per_part")
    assert(plan.contains("BroadcastHashJoin"), "part dim join must broadcast:\n" + plan.take(800))
    // the min side is a partial-aggregated frame joined by equality — never
    // a per-row correlated re-scan (no nested-loop against the fact)
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q86 scalar max is a 1-row broadcast, supplier dim broadcasts") {
    val plan = executedPlan("q86_top_supplier")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), "scalar/dim join fell back to SMJ:\n" + plan.take(800))
  }

  test("q87 keeps the anti join and broadcasts the 1-row stats scalar") {
    val plan = executedPlan("q87_pending_customers")
    assert(plan.contains("LeftAnti"), plan.take(800))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), "stats scalar fell back to cartesian:\n" + plan.take(800))
  }

  test("q95/q96/q97 reduce facts via broadcast dims before any fact-fact join") {
    Seq("q95_volume_shipping", "q96_market_share", "q97_product_profit").foreach { q =>
      val plan = executedPlan(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q: dims must broadcast:\n" + plan.take(800))
      assert(!plan.contains("CartesianProduct"), s"$q: cartesian crept in:\n" + plan.take(800))
    }
  }

  test("q98 extracts the equi key from the disjunctive join predicate (hash join, not NL)") {
    // The OR-of-ANDs spans both tables; Catalyst must still pull
    // l_partkey = p_partkey out as the hash key and keep the disjunction as
    // the join residual — a nested-loop here is a corpus×parts scan at scale.
    val plan = executedPlan("q98_disjunctive_join")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "disjunctive predicate demoted the join to nested-loop:\n" + plan.take(800))
  }

  test("q102 scores inside mapPartitions: no join operator, queries ride a broadcast variable") {
    // The whole corpus-vs-query scoring happens in the partition loop; the
    // only plan operators are the object map, the spread shim, and the
    // final candidate window — a join exec node here would mean the corpus
    // is being shuffled or nested-looped against the query set. Asserted on
    // the PLAN TREE (collect of BaseJoinExec), not the plan string, so an
    // unrelated operator label containing "Join" can't trip the gate.
    val exec = SparkEntry.queries("q102_topk_mappartitions")(spark, dir).queryExecution.executedPlan
    assert(exec.toString.contains("MapPartitions"), exec.toString.take(800))
    val joins = exec.collect { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.isEmpty, "corpus joined instead of partition-scored:\n" + joins.mkString("\n"))
  }

  test("q125 global rank never funnels rows through a single-partition window") {
    // the scalable two-phase rank: every Window node in the plan must be
    // partitioned (by the range-partition id) — an empty partition spec
    // would mean all rows in one task. Asserted on the plan text because
    // AdaptiveSparkPlanExec does not expose its inner tree to collect().
    val plan = SparkEntry.queries("q125_global_rank")(spark, dir).queryExecution.executedPlan.toString
    val windowLines = plan.split('\n').filter(_.contains("Window ["))
    assert(windowLines.nonEmpty, "expected the per-partition numbering window:\n" + plan.take(600))
    windowLines.foreach { l =>
      assert(l.contains("], [_pid"),
        "window without the _pid partition spec = single-task global window:\n" + l.take(400))
    }
  }

  test("q99/q100/q107 candidate machinery stays bucket-row-free (no collect_list)") {
    Seq("q99_canonical_docs", "q100_minhash_estimate", "q107_boilerplate_ngrams").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan.toString
      assert(!plan.contains("collect_list"), s"$q materializes buckets:\n" + plan.take(800))
    }
  }

  test("q103 keeps full-outer semantics over pre-aggregated (dim-sized) inputs") {
    val plan = executedPlan("q103_nation_reconciliation")
    assert(plan.contains("FullOuter"), plan.take(800))
    // both inputs aggregate BEFORE the outer join: two partial/final pairs
    // feed it, so the join touches nation-key cardinality, not base rows
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan.take(800))
  }

  test("q108 sketch cells aggregate map-side (the shuffle carries 256 cells, not tokens)") {
    val plan = executedPlan("q108_countmin_topk")
    // partial aggregation on (d, bucket) before the exchange — the property
    // that makes the sketch fixed-size at any corpus scale
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"), plan.take(800))
    assert(!plan.contains("collect_list"), plan.take(800))
  }

  test("q130 interval overlap joins on the bucket id (equi join, never a nested loop)") {
    // the raw overlap predicate has no equi key — an unbucketed plan would
    // be BroadcastNestedLoopJoin/CartesianProduct over |L|x|R|; the bucket
    // blocking must surface as a hash/sort-merge equi join
    val plan = executedPlan("q130_interval_overlap_join")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(plan.contains("_bucket"), "bucket key missing from the join:\n" + plan.take(800))
  }

  test("q130 aggregation sits BELOW the pair stream (partial agg before the key exchange)") {
    // the scale claim: the overlap join is output-bound (true pairs grow
    // ~quadratically when both sides grow), but an aggregate consumer
    // never materializes the pair stream across an exchange — pairs
    // collapse to per-order partials INSIDE the join stage, and only the
    // partials cross the hashpartitioning(o_orderkey) shuffle. The plan
    // prints root-first, so "deeper" means a LARGER string index.
    for (q <- Seq("q130_interval_overlap_join", "q142_interval_transit_revenue")) {
      val plan = executedPlan(q)
      val finalExchange = plan.indexOf("Exchange hashpartitioning(o_orderkey")
      val partialAgg    = plan.indexOf("partial_count")
      val joinIdx = plan.split('\n').indexWhere(l => l.contains("Join") && l.contains("_bucket"))
      assert(finalExchange >= 0, s"$q: no o_orderkey exchange:\n" + plan.take(800))
      assert(partialAgg >= 0, s"$q: no partial aggregation:\n" + plan.take(800))
      assert(joinIdx >= 0, s"$q: no bucket join:\n" + plan.take(800))
      // partial agg is deeper than the key exchange…
      assert(partialAgg > finalExchange,
        s"$q: partial aggregation not below the o_orderkey exchange:\n" + plan.take(1200))
      // …and the pair-producing bucket join is deeper than the partial agg
      val partialLine = plan.split('\n').indexWhere(_.contains("partial_count"))
      assert(joinIdx > partialLine,
        s"$q: bucket join not below the partial aggregation:\n" + plan.take(1200))
      // the partial agg aggregates the measure itself (pairs never survive
      // to the exchange as rows)
      assert(plan.contains("partial_sum"), s"$q:\n" + plan.take(1200))
    }
  }

  test("q140 prefix-filter join: candidates via shingle equi join, never all-pairs") {
    val plan = executedPlan("q140_prefix_filter_join")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    // the per-doc prefix windows must stay keyed (no single-task window)
    val windowLines = plan.split('\n').filter(_.contains("Window ["))
    windowLines.foreach { l =>
      assert(l.contains("doc_id"), "window without doc_id partitioning:\n" + l.take(300))
    }
  }

  test("q209 exact quantiles: corpus collapses to value-frequencies before any sort") {
    val plan  = executedPlan("q209_exact_quantiles")
    val lines = plan.split('\n')
    // map-side combine: the corpus scan feeds a partial count aggregate
    assert(plan.contains("partial_count"), plan.take(800))
    // the ONLY sorts sit ABOVE the deepest (partial) aggregate — i.e. they
    // order frequency rows, never raw document rows (tree strings print
    // parents first, so "above" = smaller line index)
    val deepestAgg = lines.lastIndexWhere(_.contains("HashAggregate"))
    val sortIdxs   = lines.zipWithIndex.filter(_._1.contains("Sort ")).map(_._2)
    assert(deepestAgg >= 0, plan.take(800))
    sortIdxs.foreach(i =>
      assert(i < deepestAgg, s"sort below the frequency aggregate (raw-row sort):\n$plan"))
    // the CDF window is per-lang, never a single global partition
    lines.filter(_.contains("Window [")).foreach(l =>
      assert(l.contains("lang"), "window without lang partitioning:\n" + l.take(300)))
  }

  test("q210 ks drift: pair join is an equi join on the value; ECDF windows keyed by source") {
    val plan  = executedPlan("q210_ks_drift")
    val lines = plan.split('\n')
    assert(plan.contains("partial_count"), plan.take(800))
    // the source_a × source_b comparison joins on v — an equi join, so the
    // |values|·|sources|² volume comes from bucketed matches, not a
    // corpus-scale cartesian (the only non-equi join allowed is the tiny
    // domain-grid cross of two aggregated sides)
    assert(
      lines.exists(l =>
        (l.contains("HashJoin") || l.contains("SortMergeJoin")) && l.contains("v#")),
      "no equi join on v:\n" + plan.take(1200))
    lines.filter(_.contains("Window [")).foreach(l =>
      assert(l.contains("source"), "window without source partitioning:\n" + l.take(300)))
    // freq feeds multiple consumers with NO keep() (a persist measured
    // 2.3x SLOWER at sf0.1 — cache materialization costs more than it
    // saves on a domain-bounded aggregate). The build-once guarantee is
    // AQE stage reuse, which the final plan prints as ONE ShuffleQueryStage
    // id referenced from several points of the tree (never as a
    // ReusedExchange node): execute, then assert some shuffle stage really
    // is consumed more than once.
    val df = SparkEntry.queries("q210_ks_drift")(spark, dir)
    df.collect() // count() would plan a SEPARATE QueryExecution; collect finalizes THIS one
    val finalPlan = df.queryExecution.executedPlan.toString
    val stageUse = "ShuffleQueryStage [0-9]+".r.findAllIn(finalPlan).toList
      .groupBy(identity).map(_._2.size)
    assert(stageUse.nonEmpty && stageUse.max >= 2,
      s"corpus frequency shuffle must be stage-reused across its consumers (got $stageUse):\n" +
        finalPlan.take(2000))
  }

  test("q212 psi drift: corpus collapses to the (source, lang) frequency table; NO window anywhere") {
    val plan  = executedPlan("q212_psi_drift")
    val lines = plan.split('\n')
    // map-side combine: the corpus scan feeds a partial count aggregate
    assert(plan.contains("partial_count"), plan.take(800))
    // PSI needs no cumulative at all — any Window operator would mean a
    // sort crept into what is a pure grid-bounded aggregate chain
    assert(!plan.contains("Window ["), "PSI must not need a window:\n" + plan.take(1200))
    // the only sort is the display ORDER BY over ≤|sources| rows — above
    // the deepest (partial) aggregate, never over raw document rows
    val deepestAgg = lines.lastIndexWhere(_.contains("HashAggregate"))
    assert(deepestAgg >= 0, plan.take(800))
    lines.zipWithIndex.filter(_._1.contains("Sort ")).map(_._2).foreach(i =>
      assert(i < deepestAgg, s"sort below the frequency aggregate (raw-row sort):\n$plan"))
  }

  test("q215 mi association: melted corpus aggregate built ONCE (keep), consumers read the memo; no window") {
    val plan = executedPlan("q215_mi_association")
    assert(plan.contains("partial_count"), plan.take(800))
    assert(!plan.contains("Window ["), "MI must not need a window:\n" + plan.take(1200))
    // the contingency table's four consumers need DIFFERENT partitionings,
    // so AQE stage reuse cannot dedupe the corpus scan (measured: nine
    // single-use stages without keep) — the persist is load-bearing here,
    // unlike q210: every consumer must read the InMemoryRelation, never
    // re-scan parquet outside the one cached build
    assert(plan.contains("InMemoryTableScan"),
      "contingency consumers must read the cached build:\n" + plan.take(1500))
  }

  test("q129 adaptive SemDeDup prunes via equi joins only (no all-pairs anywhere)") {
    // the registered query (memoized assignment + pair prune): candidate
    // pairs come from an equi self-join on the learned cluster — a
    // cartesian/NL join here would be the quadratic this query exists to
    // avoid
    val plan = executedPlan("q129_semantic_dedup_adaptive")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("adaptive k-means build: probe assign — broadcast CELL table, equi candidate join") {
    // the assign step must never be the dense n×k crossJoin (k = ceil(n/B)
    // grows with the corpus): each vector crossJoins only the BROADCAST
    // cell-centroid table (~√k rows), and the candidate step is an EQUI
    // join on the cell id — shuffle-able by key, never corpus × centroids
    val plan = SimilarityQueries
      .adaptiveBuildPlan(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    val nl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nl >= 1, "expected the broadcast cell-centroid crossJoin:\n" + plan.take(800))
    // every nested-loop input is a broadcast exchange (cell centroids), so
    // the stream side scans the corpus exactly once per Lloyd round
    assert("BroadcastExchange".r.findAllIn(plan).size >= nl, plan.take(800))
    // the probe-candidate join is keyed on _cell (equi, not nested-loop)
    val equiCellJoin = plan.split('\n').exists { l =>
      (l.contains("HashJoin") || l.contains("SortMergeJoin")) && l.contains("_cell")
    }
    assert(equiCellJoin, "probe-candidate equi join on _cell missing:\n" + plan.take(1200))
    // the top-p cell probe survives as a keyed window (WindowGroupLimit
    // collapses the fan-out map-side before any exchange)
    assert(plan.contains("WindowGroupLimit"), "probe top-p not group-limited:\n" + plan.take(1200))
  }

  test("q144 bloom prune runs below the exact-verify semi join") {
    val plan = executedPlan("q144_bloom_decontaminate")
    // the codegen'd probe is in the plan at all…
    val might = plan.indexOf("might_contain")
    assert(might >= 0, "bloom might_contain probe missing:\n" + plan.take(1200))
    // …and the exact verify is a semi join (bloom FPs die there)
    val semi = plan.indexOf("LeftSemi")
    assert(semi >= 0, "exact-verify semi join missing:\n" + plan.take(1200))
    // root-first print: the prune must be DEEPER than the semi join — the
    // corpus is filtered before rows reach the join's exchange, which is
    // the entire point of the bloom at 100 TB
    assert(might > semi, "bloom probe not below the semi join:\n" + plan.take(1600))
  }

  test("q147 second-order sweep never enumerates overlap pairs") {
    val plan = executedPlan("q147_interval_sweep_days")
    assert(!plan.contains("_bucket"), "sweep fell back to the pair join:\n" + plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin"), "day lookup not broadcast:\n" + plan.take(1200))
    val windowLines = plan.split('\n').filter(_.contains("Window ["))
    windowLines.foreach { l =>
      assert(l.contains("_pid"), "window not the two-phase running sum:\n" + l.take(300))
    }
  }

  test("q146 sweep aggregation never enumerates overlap pairs") {
    val plan = executedPlan("q146_interval_sweep_revenue")
    // not the bucketed pair machinery — the whole point is that no pair
    // stream exists anywhere in the plan
    assert(!plan.contains("_bucket"), "sweep fell back to the pair join:\n" + plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // the day-series lookups are broadcast equi joins (series bounded by
    // the time domain, not the corpus)
    assert(plan.contains("BroadcastHashJoin"), "day lookup not broadcast:\n" + plan.take(1200))
    // orders are scanned, never windowed: the only windows are the
    // per-partition running sums over the day series
    val windowLines = plan.split('\n').filter(_.contains("Window ["))
    windowLines.foreach { l =>
      assert(l.contains("_pid"), "window not the two-phase running sum:\n" + l.take(300))
    }
  }

  test("q145 incremental ingest recomputes signatures for the increment only") {
    val plan = executedPlan("q145_incremental_neardup")
    // exactly ONE scan of the raw documents table (the new batch); the
    // corpus side must ride the memoized signature/shingle snapshots
    val docScans = plan.split('\n').count(l =>
      l.contains("documents.parquet") && l.contains("Scan"))
    assert(docScans == 1,
      s"expected 1 documents scan (increment only), got $docScans:\n" + plan.take(1600))
    // candidates via the equi band join — never any all-pairs shape
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("q172 stream input build is a single events scan (sentinel rides an observed metric)") {
    // the memoBuildPlan treatment: the registered query streams from the
    // session memo, so the one-scan claim gates the BUILD frame — max(ts)
    // for the sentinel must be a CollectMetrics observation ON the data
    // write, never a second driver-side pass over events
    val (observed, _) = StreamQueries.observedEventsInput(spark, dir)
    val build = observed.queryExecution.executedPlan.toString
    val eventScans = build.split('\n').count(l => l.contains("events.parquet") && l.contains("Scan"))
    assert(eventScans == 1, s"expected 1 events scan in the build, got $eventScans:\n" + build.take(1200))
    assert(build.contains("CollectMetrics"), "sentinel max(ts) must ride the write as an observation:\n" +
      build.take(1200))
    // and the registered query itself never re-reads events: its returned
    // frame is a pure function of the bounded sink parquet
    val plan = executedPlan("q172_event_windows_stream")
    assert(!plan.contains("events.parquet"),
      "q172's returned frame must read only the stream sink:\n" + plan.take(1200))
  }

  test("q148 packing cumulates through _pid-partitioned windows (never one task)") {
    val plan = executedPlan("q148_seq_packing")
    val windowLines = plan.split('\n').filter(_.contains("Window ["))
    assert(windowLines.nonEmpty, plan.take(600))
    windowLines.foreach { l =>
      assert(l.contains("_pid"), "window not the two-phase running sum:\n" + l.take(300))
    }
  }

  test("q149 DSIR log-ratio dimension broadcasts onto the bigram stream") {
    val plan = executedPlan("q149_dsir_weights")
    // the 256-row dim rides a broadcast hash join; the corpus-sized gram
    // stream must never shuffle to meet it (no SMJ, no cartesian)
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q150 threshold selection windows only the histogram and the boundary slice") {
    val plan = executedPlan("q150_adaptive_quality")
    // every window partitions by lang (histogram cumsum / boundary rank) —
    // an empty partition spec would be the corpus-wide single-task sort
    // this query exists to avoid
    val windowLines = plan.split('\n').filter(_.contains("Window ["))
    assert(windowLines.nonEmpty, plan.take(600))
    windowLines.foreach(l => assert(l.contains("lang"), l.take(300)))
    // and the threshold frame reaches the corpus via broadcast
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("q152 fertility: trained piece map broadcasts onto the per-lang vocabulary") {
    val plan = executedPlan("q152_bpe_fertility")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q154/q155 PCA: scatter cells aggregate map-side, projection dim broadcasts") {
    // the registered queries read the session memo, so the scatter gate
    // runs on the BUILD plan (the memoBuildPlan treatment): the d²
    // aggregation must partially combine before its exchange — the
    // property that keeps the shuffle dimension-sized
    val train = SimilarityQueries.pcaScatterPlan(spark, dir)
      .queryExecution.executedPlan.toString
    assert(train.contains("partial"), train.take(800))
    assert(!train.contains("CartesianProduct"), train.take(800))
    val apply = executedPlan("q155_pca_project")
    // the 64-row eigenvector reaches the (vec_id, d, xq) stream broadcast
    assert(apply.contains("BroadcastHashJoin"), apply.take(800))
    // exactly one corpus scan: the projection pass (the direction comes
    // off the memo, never a re-train)
    assert(apply.split('\n').count(l => l.contains("embeddings.parquet") && l.contains("Scan")) == 1,
      apply.take(800))
  }

  test("q156 epoch shuffle ranks through _pid-partitioned windows (never one task)") {
    val plan = executedPlan("q156_epoch_shuffle")
    val windowLines = plan.split('\n').filter(_.contains("Window ["))
    assert(windowLines.nonEmpty, plan.take(600))
    windowLines.foreach(l => assert(l.contains("_pid"), l.take(300)))
  }

  test("q158 drift dimensions broadcast onto the bucket-count tables") {
    val plan = executedPlan("q158_vocab_drift")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q153 split reads the memoized components only (no shingle recompute)") {
    val plan = executedPlan("q153_split_by_cluster")
    // the registered query is a pure function of the materialized comp
    // table: one memo scan, zero raw-document scans, no joins at all
    assert(!plan.contains("documents.parquet"), plan.take(800))
    assert(plan.split('\n').count(_.contains("Scan parquet")) == 1, plan.take(800))
  }

  test("q167 fold assignment reads the memoized components only (no shingle recompute)") {
    val plan = executedPlan("q167_kfold_by_cluster")
    assert(!plan.contains("documents.parquet"), plan.take(800))
    assert(plan.split('\n').count(_.contains("Scan parquet")) == 1, plan.take(800))
  }

  test("q161 AUC windows only the histogram, never the corpus") {
    // every Window in the optimized plan must sit above an Aggregate (the
    // per-(source, score) histogram) — a window whose subtree reaches the
    // scan without aggregating is the corpus-wide rank this query avoids
    val plan = SparkEntry.queries("q161_auc_quality")(spark, dir).queryExecution.optimizedPlan
    val windows = plan.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.nonEmpty, plan.toString.take(600))
    windows.foreach { w =>
      val aggBelow = w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggBelow.nonEmpty, "window over un-aggregated rows:\n" + w.toString.take(400))
    }
  }

  test("q164 schedule windows are per-language or _pid-partitioned (never one task)") {
    val plan = executedPlan("q164_curriculum_interleave")
    val windowLines = plan.split('\n').filter(_.contains("Window ["))
    assert(windowLines.nonEmpty, plan.take(600))
    windowLines.foreach(l =>
      assert(l.contains("_pid") || l.contains("partitionBy") || l.contains("lang"),
        "unpartitioned global window:\n" + l.take(300)))
  }

  test("q160 perceptron reuses one persisted feature table across all rounds") {
    val plan = executedPlan("q160_perceptron_lid")
    // six reads (margins + update, three rounds) must hit the cache
    assert(plan.split('\n').count(_.contains("InMemoryTableScan")) >= 6, plan.take(800))
    // the ≤ B+1-row weight vector broadcasts onto the features each round
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q168 batching windows are per-bucket strata (never one task)") {
    val plan = executedPlan("q168_length_batching")
    val windowLines = plan.split('\n').filter(_.contains("Window ["))
    assert(windowLines.nonEmpty, plan.take(600))
    windowLines.foreach(l =>
      assert(l.contains("bucket"), "unpartitioned global window:\n" + l.take(300)))
  }

  test("q169 nDCG never cartesians corpus-sized inputs; ideal rides the histogram") {
    val plan = executedPlan("q169_ndcg")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // the ideal-DCG side touches a 10-cell histogram joined to a 10-row
    // position dim — the corpus reaches it only through an Aggregate
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(800))
  }

  test("q159 fusion never cartesians; corpus scoring rides broadcasts") {
    val plan = executedPlan("q159_rrf_fusion")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // lexical side: query terms and corpus stats broadcast (q136 shape);
    // vector side: the 5-row query set broadcasts under the ≠ predicate
    assert(plan.contains("BroadcastHashJoin") && plan.contains("BroadcastNestedLoopJoin"),
      plan.take(800))
  }

  test("q162 exact overlap rides the trigram equi join (inverted index, no corpus cartesian)") {
    val plan = executedPlan("q162_source_overlap")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // the only nested-loop join allowed is the sources²-bounded pair
    // domain (sizes × sizes under src_a < src_b) — corpus-sized relations
    // must meet on the tok/h equi keys
    assert(plan.contains("tok"), plan.take(800))
    assert(!plan.contains("collect_list"), "per-pair set materialization:\n" + plan.take(800))
  }
}
