package graft

import org.apache.spark.sql.GraftTestInterop
import org.scalatest.funsuite.AnyFunSuite

/** CACHE HYGIENE — a long-lived session (notebook, service, multi-corpus
  * curation run) must not accumulate cached tables from operators that
  * persist intermediates internally. The harness happens to clearCache()
  * between queries; a user session does not, so every session-lived
  * operator (the dedup memo build, the k-means assignment memo, two-phase
  * global ranking) must release — or never register — its cache entries.
  *
  * globalRowNumber pins its range partitioning via eager localCheckpoint
  * (no CacheManager entry at all; blocks are freed by the ContextCleaner
  * when the frame goes unreferenced); the memo builds persist their
  * intermediates and unpersist them once the memo tables are written.
  */
class CacheHygieneSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

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
    assert(
      GraftTestInterop.cacheIsEmpty(spark),
      "a session-lived operator registered a cached table it never released")
  }
}
