package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** ScdStore's incremental MERGE must reconstruct the one-shot q192 build
  * exactly under ANY time-ordered batch split — the q193 byte gate proves
  * it for the two-epoch range split at 3 SFs; this spec pins the
  * mechanisms the gate can't isolate: the open-version seed across the
  * boundary (carried cents for the no-op dedup, carried version numbers,
  * the close row's interval stitching), equal-ts ties inside a batch,
  * crash-replay idempotence, and compaction boundedness.
  */
class ScdStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val OpenEnd = graft.queries.EventQueries.ScdOpenEnd // the production sentinel, never a stale copy

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** (event_id, ts, user_id, value) → the store's batch projection. */
  private def batchDf(rows: Seq[(Long, String, Long, Double)]): DataFrame =
    rows.map { case (e, t, u, v) => (u, ts(t), e, math.round(v * 100)) }
      .toDF("user_id", "ts", "event_id", "cents")

  private def freshStore(): ScdStore = {
    val tmp = Files.createTempDirectory("graft-scd-store")
    graft.sources.SessionMemo.deleteOnExit(tmp)
    new ScdStore(spark, s"$tmp/store", OpenEnd)
  }

  private def snap(store: ScdStore): Seq[(Long, Long, Long, String, String, Long)] =
    store.snapshotDf
      .select(
        col("user_id"), col("version"), col("cents"),
        col("valid_from").cast("string"), col("valid_to").cast("string"), col("is_current"))
      .as[(Long, Long, Long, String, String, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2))

  // The shared fixture: user 1 changes straddle the batch boundary with a
  // cross-boundary NO-OP (batch 2 opens with the cents batch 1 closed on);
  // user 2's batch-2 tie resolves last-write-wins to a no-op; user 3 is
  // batch-2-only (pure insert).
  private val Batch1 = Seq(
    (10L, "2024-01-01 00:00:00", 1L, 1.00),
    (11L, "2024-01-02 00:00:00", 1L, 2.00),
    (20L, "2024-01-01 12:00:00", 2L, 5.00))
  private val Batch2 = Seq(
    (12L, "2024-01-03 00:00:00", 1L, 2.00), // no-op vs the carried open cents — must NOT version
    (13L, "2024-01-04 00:00:00", 1L, 3.00),
    (21L, "2024-01-03 06:00:00", 2L, 7.00), // tie, loses to 22
    (22L, "2024-01-03 06:00:00", 2L, 5.00), // tie winner — no-op vs open v1
    (30L, "2024-01-03 09:00:00", 3L, 9.00))

  private def expectedOneShot: Seq[(Long, Long, Long, String, String, Long)] = {
    // the one-shot q192 build over the combined feed, run on a temp corpus
    val tmp = Files.createTempDirectory("graft-scd-oneshot")
    graft.sources.SessionMemo.deleteOnExit(tmp)
    (Batch1 ++ Batch2)
      .map { case (e, t, u, v) => (e, ts(t), u, "update", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    SparkEntry.queries("q192_scd2_history")(spark, tmp.toString)
      .select(
        col("user_id"), col("version"), col("cents"),
        col("valid_from").cast("string"), col("valid_to").cast("string"), col("is_current"))
      .as[(Long, Long, Long, String, String, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
  }

  test("two-batch merge == the one-shot q192 build (open-version seed, tie collapse, cross-boundary no-op)") {
    val store = freshStore()
    store.merge(batchDf(Batch1), 0L)
    // mid-state sanity: user 1's v2 is OPEN after batch 1
    val mid = snap(store)
    assert(mid.filter(r => r._1 == 1L && r._6 == 1L).map(_._2) == Seq(2L), s"mid: $mid")
    store.merge(batchDf(Batch2), 1L)
    val got = snap(store)
    assert(got == expectedOneShot, s"incremental != one-shot:\n got $got\n exp $expectedOneShot")
    // the cross-boundary no-op really was exercised: user 1 has exactly 3
    // versions (1.00, 2.00, 3.00), not 4
    assert(got.count(_._1 == 1L) == 3)
    // and the close row stitched the boundary: v2's valid_to = batch 2's
    // first real change point
    val v2 = got.find(r => r._1 == 1L && r._2 == 2L).get
    assert(v2._5 == "2024-01-04 00:00:00" && v2._6 == 0L, s"v2: $v2")
  }

  test("crash replay: re-merging the same batch id appends byte-identical rows the read dedups") {
    val store = freshStore()
    store.merge(batchDf(Batch1), 0L)
    store.merge(batchDf(Batch2), 1L)
    val before = snap(store)
    store.merge(batchDf(Batch2), 1L) // foreachBatch redelivery after a crash-before-commit
    assert(snap(store) == before, "replay must be invisible to readers")
  }

  test("compact: bounded files, snapshot unchanged, still merge-able after") {
    val store = freshStore()
    store.merge(batchDf(Batch1), 0L)
    store.merge(batchDf(Batch2), 1L)
    val before = snap(store)
    assert(store.dataFileCount > 1)
    store.compact()
    // the PARALLEL rewrite (repartition on the user-hash bucket) is bounded
    // by the bucket count, never by history or by parallelism settings
    assert(store.dataFileCount <= 8, s"compaction must leave <= buckets files, got ${store.dataFileCount}")
    assert(snap(store) == before, "compaction must not change the logical table")
    // a post-compaction batch still seeds correctly (batch_ids survive)
    store.merge(batchDf(Seq((40L, "2024-01-05 00:00:00", 1L, 4.00))), 2L)
    val after = snap(store)
    assert(after.count(_._1 == 1L) == 4 &&
      after.filter(r => r._1 == 1L && r._6 == 1L).map(_._3) == Seq(400L))
  }

  test("seed scan prunes to the batch's buckets (partition filter, plan-gated) and stays correct") {
    // Many users spread across all 4 buckets in batch 1; batch 2 touches
    // ONE user — the open-version seed scan must list only that user's
    // bucket directory (a PartitionFilters prune, visible in the scan),
    // and the merge result must be identical to the unpruned semantics.
    val tmp = Files.createTempDirectory("graft-scd-prune")
    graft.sources.SessionMemo.deleteOnExit(tmp)
    val store = new ScdStore(spark, s"$tmp/store", OpenEnd, buckets = 4)
    val wide = (1L to 32L).map(u => (100L + u, "2024-01-01 00:00:00", u, u.toDouble))
    store.merge(batchDf(wide), 0L)
    // the layout really is hive-bucketed on the user hash
    val bucketDirs = new java.io.File(s"$tmp/store").listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("bucket=")).toSeq.sorted
    assert(bucketDirs.size == 4, s"expected 4 bucket dirs, got $bucketDirs")
    val one = batchDf(Seq((200L, "2024-01-02 00:00:00", 7L, 7.50)))
    val rows = store.mergeRows(one, 1L)
    val scans = rows.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    // the filter is a real prune, not decoration: the store scan's
    // PartitionFilters names the bucket column with ONE value (a
    // single-element isin folds to an equality — accept both spellings)
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(scans).map(_.group(1)).filter(_.contains("bucket")).toSeq
    assert(pf.nonEmpty, "seed scan must carry a bucket partition filter:\n" + scans.take(1200))
    val pruned = "bucket#\\d+ (?:= \\d+|IN \\(\\d+\\))".r
    assert(pf.exists(f => pruned.findFirstIn(f).isDefined),
      s"expected a single-bucket partition filter, got $pf")
    store.merge(one, 1L)
    val got = snap(store).filter(_._1 == 7L)
    assert(got.map(r => (r._2, r._3, r._6)) == Seq((1L, 700L, 0L), (2L, 750L, 1L)),
      s"pruned merge produced wrong history: $got")
    // untouched users' open versions are intact
    assert(snap(store).count(_._6 == 1L) == 32)
    // the pruned per-batch snapshot (q196's enrich read) carries the same
    // partition filter and returns exactly the touched bucket's users
    val snapPruned = store.snapshotDfFor(one)
    val snapScans = snapPruned.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(pruned.findFirstIn(snapScans).isDefined,
      s"snapshotDfFor must prune to the key frame's bucket:\n${snapScans.take(800)}")
    val prunedUsers = snapPruned.select("user_id").distinct()
      .as[Long].collect().toSet
    assert(prunedUsers.contains(7L), "the touched user's versions must be in the pruned snapshot")
    assert(prunedUsers.subsetOf((1L to 32L).toSet))
  }

  test("as-of point lookup: interval boundaries, absent user, pre-history instant, open version") {
    val store = freshStore()
    store.merge(batchDf(Batch1), 0L)
    store.merge(batchDf(Batch2), 1L)
    // user 1's history: v1 [01-01, 01-02) 100c, v2 [01-02, 01-04) 200c, v3 [01-04, open) 300c
    def at(s: String) = store.lookup(1L, ts(s)).map(v => (v.version, v.cents))
    assert(at("2024-01-01 00:00:00") == Some((1L, 100L)), "valid_from is INCLUSIVE")
    assert(at("2024-01-01 23:59:59") == Some((1L, 100L)))
    assert(at("2024-01-02 00:00:00") == Some((2L, 200L)), "valid_to is EXCLUSIVE — the next version owns it")
    assert(at("2024-01-03 12:00:00") == Some((2L, 200L)),
      "the cross-boundary no-op must not split v2's interval")
    assert(at("2024-01-04 00:00:00") == Some((3L, 300L)))
    assert(at("2199-12-31 00:00:00") == Some((3L, 300L)), "the open version serves any future instant")
    assert(at("2023-12-31 23:59:59") == None, "an instant before the first version is a 404")
    assert(store.lookup(999L, ts("2024-01-02 00:00:00")) == None, "an unknown user is a 404")
    // the REST body carries the version's full interval
    val j = store.lookup(1L, ts("2024-01-02 12:00:00")).get.toJson(1L)
    assert(j.contains("\"version\":2") && j.contains("\"cents\":200")
      && j.contains("2024-01-02 00:00:00") && j.contains("2024-01-04 00:00:00"), j)
  }

  test("as-of lookup is a POINT read: one-bucket partition prune + pushed user_id (plan gate)") {
    val tmp = Files.createTempDirectory("graft-scd-lookup")
    graft.sources.SessionMemo.deleteOnExit(tmp)
    val store = new ScdStore(spark, s"$tmp/store", OpenEnd, buckets = 4)
    val wide  = (1L to 32L).map(u => (100L + u, "2024-01-01 00:00:00", u, u.toDouble))
    store.merge(batchDf(wide), 0L)
    val df = store.lookupDf(7L, ts("2024-06-01 00:00:00")).get
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    // the foldable bucketOf(lit(7)) must have constant-folded into a
    // single-literal partition filter — ONE bucket directory listed
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(scans).map(_.group(1)).filter(_.contains("bucket")).toSeq
    assert(pf.nonEmpty, "lookup scan must carry a bucket partition filter:\n" + scans.take(1200))
    assert(pf.exists("bucket#\\d+ = \\d+".r.findFirstIn(_).isDefined),
      s"the bucket predicate must fold to a literal equality, got $pf")
    // and the key equality reaches the parquet reader
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(user_id,7\\)".r.findFirstIn(scans).isDefined,
      "user_id = 7 must push into the scan:\n" + scans.take(1200))
    assert(store.lookup(7L, ts("2024-06-01 00:00:00")).map(_.cents) == Some(700L))
  }

  test("a legacy flat-layout store fails fast instead of silently dropping every open version") {
    // A store directory written by the pre-bucketed (flat) layout reads
    // `bucket` as NULL through the partitioned schema, so the seed scan's
    // partition filter would silently drop every open version and a merge
    // would renumber users from version 1 — the store must REFUSE the
    // layout instead.
    val tmp = Files.createTempDirectory("graft-scd-flat")
    graft.sources.SessionMemo.deleteOnExit(tmp)
    // fabricate the legacy layout: data files at the store ROOT
    Seq((1L, 1L, 100L, ts("2024-01-01 00:00:00"), ts(OpenEnd), 1L, 0L))
      .toDF("user_id", "version", "cents", "valid_from", "valid_to", "is_current", "batch_id")
      .write.parquet(s"$tmp/store")
    val store = new ScdStore(spark, s"$tmp/store", OpenEnd)
    val e = intercept[IllegalStateException](store.snapshotDf)
    assert(e.getMessage.contains("outside bucket=N/"), e.getMessage)
    val e2 = intercept[IllegalStateException](
      store.merge(batchDf(Seq((10L, "2024-01-02 00:00:00", 1L, 2.00))), 1L))
    assert(e2.getMessage.contains("flat-layout"), e2.getMessage)
  }

  test("compact with a replay cutoff: a batch at/above the cutoff can still redeliver correctly") {
    // The crash window: batch 1's write landed, its checkpoint commit did
    // not, and compaction ran in between. With the cutoff at the last
    // COMMITTED batch (1 ⇒ only batch 0's rows compact), batch 1's
    // superseded pre-state survives verbatim, so the redelivery seeds from
    // the exact pre-batch-1 state and re-appends byte-identical rows. A
    // full compact here would erase the superseded open version and the
    // replay would renumber user 1 from version 1.
    val store = freshStore()
    store.merge(batchDf(Batch1), 0L)
    store.merge(batchDf(Batch2), 1L)
    val before = snap(store)
    store.compact(safeBelowBatch = 1L)
    assert(snap(store) == before, "cutoff compaction must not change the logical table")
    store.merge(batchDf(Batch2), 1L) // the redelivery
    assert(snap(store) == before, "replay after cutoff compaction must be invisible")
    assert(snap(store) == expectedOneShot)
  }
}
