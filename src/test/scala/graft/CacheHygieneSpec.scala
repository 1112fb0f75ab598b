package graft

import org.apache.spark.sql.GraftTestInterop
import org.scalatest.funsuite.AnyFunSuite

/** CACHE HYGIENE — a long-lived session (notebook, service, multi-corpus
  * curation run) must not accumulate cached tables from operators that
  * persist intermediates internally. The harness happens to clearCache()
  * between queries; a user session does not, so every session-lived
  * operator (the dedup memo build, the k-means assignment memo, two-phase
  * global ranking) must release — or never register — its cache entries,
  * and every QUERY-LOCAL persist (a shared intermediate feeding multiple
  * branches of one returned plan) must be scoped to the consuming action
  * via [[graft.plans.CacheScope]], not left for the session.
  *
  * globalRowNumber pins its range partitioning via eager localCheckpoint
  * (no CacheManager entry at all; blocks are freed by the ContextCleaner
  * when the frame goes unreferenced); the memo builds persist their
  * intermediates and unpersist them once the memo tables are written;
  * CacheScope releases a query's registered persists when the first action
  * over the query's frame completes (on the listener bus — shortly after
  * the action returns, hence the brief poll below).
  */
class CacheHygieneSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The listener-bus release runs asynchronously just after the action
    * returns — poll briefly instead of asserting instantly.
    */
  private def assertCacheDrains(label: String): Unit = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (!GraftTestInterop.cacheIsEmpty(spark) && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(
      GraftTestInterop.cacheIsEmpty(spark),
      s"$label left cached tables registered after its action completed")
  }

  test("memo builds and global ranking leave the cache manager empty") {
    spark.catalog.clearCache()
    // memo-backed families: the first consumer in the session pays the
    // build (which persists intermediates and must release them); later
    // consumers read the materialized parquet
    SparkEntry.queries("q47_dedup_components")(spark, dir).collect()
    SparkEntry.queries("q42_minhash_lsh")(spark, dir).collect()
    SparkEntry.queries("q116_kmeans_refine")(spark, dir).collect()
    SparkEntry.queries("q124_semantic_dedup")(spark, dir).collect()
    // two-phase global rank: ranged frame pinned without a cache entry
    SparkEntry.queries("q125_global_rank")(spark, dir).collect()
    assertCacheDrains("a session-lived operator")
  }

  test("every CacheScope query drains its persists without harness help") {
    // the full set of queries whose returned plan reads a persisted
    // intermediate from more than one branch — each must leave the cache
    // empty after ITS OWN action, with no clearCache() in between
    val scoped = Seq(
      "q108_countmin_topk",
      "q126_hll_registers",
      "q117_charlm_quality",
      "q149_dsir_weights",
      "q158_vocab_drift",
      "q151_bpe_merges",
      "q152_bpe_fertility",
      "q52_srp_lsh",
      "q119_substring_overlap",
      "q122_fuzzy_names",
      "q48_simhash_neardup",
      "q150_adaptive_quality",
      "q160_perceptron_lid",
      "q140_prefix_filter_join",
      "q43_ngram_jaccard",
      "q68_decontaminate",
      "q139_kmv_setops"
    )
    spark.catalog.clearCache()
    scoped.foreach { name =>
      SparkEntry.queries(name)(spark, dir).collect()
      assertCacheDrains(name)
    }
  }

  test("CacheScope releases when the frame is consumed inside a subquery") {
    import org.apache.spark.sql.functions._
    spark.catalog.clearCache()
    val scoped = graft.plans.CacheScope.scoped(spark) { keep =>
      val docs = keep(
        graft.sources.Tables.documents(spark, dir).select(col("doc_id"), col("lang")))
      docs.filter(col("lang") === "en")
    }
    scoped.createOrReplaceTempView("cache_scope_subq_v")
    // the scoped plan appears only inside the IN-subquery of this query's
    // plan — the release must still trigger on the action
    graft.sources.Tables.documents(spark, dir).createOrReplaceTempView("docs_v")
    spark
      .sql("SELECT count(*) FROM docs_v WHERE doc_id IN (SELECT doc_id FROM cache_scope_subq_v)")
      .collect()
    assertCacheDrains("subquery-consumed CacheScope frame")
  }

  test("an abandoned eager-build scope (q151/q152) leaves no cache") {
    // q151/q152's build runs eager actions internally (the per-round
    // localCheckpoints), so its persists materialize at CONSTRUCTION —
    // CacheScope must release them at build end (the returned plans read
    // only the checkpoints), not wait for a consuming action that may
    // never come. Build both frames and NEVER act on them.
    spark.catalog.clearCache()
    SparkEntry.queries("q151_bpe_merges")(spark, dir)
    assertCacheDrains("abandoned q151_bpe_merges frame")
    SparkEntry.queries("q152_bpe_fertility")(spark, dir)
    assertCacheDrains("abandoned q152_bpe_fertility frame")
  }

  test("a CacheScope frame stays correct on a second action (recompute, uncached)") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q108_countmin_topk")(spark, dir)
    val first = df.collect()
    assertCacheDrains("q108_countmin_topk")
    // the scope released after action one; action two recomputes the
    // intermediates un-cached and must produce identical rows
    val second = df.collect()
    assert(first.toSeq == second.toSeq, "post-release recompute changed the result")
    assertCacheDrains("q108_countmin_topk (second action)")
  }
}
