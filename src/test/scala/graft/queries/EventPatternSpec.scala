package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q191 (sequential funnel) and q192 (SCD-2 history build): the oracles
  * prove cross-engine value parity; these specs pin the SEMANTIC invariants
  * the hash can't articulate — strict stage ordering inside the step
  * bounds, stage/sentinel consistency, fixture coverage of every branch,
  * and the SCD interval algebra (contiguity, one open version per key, no
  * no-op versions).
  */
class EventPatternSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private val Epoch = java.sql.Timestamp.from(java.time.Instant.EPOCH)

  test("q191 funnel: strict ordered stages within the step bound; flags consistent; all branches hit") {
    val rows = SparkEntry.queries("q191_funnel")(spark, dir)
      .select("user_id", "t1", "t2", "t3", "stage", "completed")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, java.sql.Timestamp, Long, Long)]
      .collect()
    assert(rows.nonEmpty)
    val stepUs    = EventQueries.FunnelStepHours * 3600L * 1000000L
    val horizonUs = EventQueries.FunnelHorizonHours * 3600L * 1000000L
    def us(t: java.sql.Timestamp) = t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    rows.foreach { case (u, t1, t2, t3, stage, completed) =>
      assert(stage >= 1 && stage <= 3, s"user $u stage $stage")
      // sentinel iff the stage was not reached
      assert((t2 == Epoch) == (stage < 2), s"user $u t2/stage inconsistent")
      assert((t3 == Epoch) == (stage < 3), s"user $u t3/stage inconsistent")
      if (stage >= 2) assert(us(t2) > us(t1) && us(t2) - us(t1) <= stepUs, s"user $u click out of bound")
      if (stage == 3) assert(us(t3) > us(t2) && us(t3) - us(t2) <= stepUs, s"user $u purchase out of bound")
      val expectCompleted = stage == 3 && us(t3) - us(t1) <= horizonUs
      assert(completed == (if (expectCompleted) 1L else 0L), s"user $u completed flag")
    }
    // one row per funnel entrant; entrants = users with at least one view
    val entrants = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "view").select("user_id").distinct().count()
    assert(rows.length.toLong == entrants, "funnel must emit exactly one row per entrant")
    // the fixture exercises every stage and both completion outcomes
    assert(Set(1L, 2L, 3L).subsetOf(rows.map(_._5).toSet), s"stages hit: ${rows.map(_._5).toSet}")
    assert(rows.exists(_._6 == 1L) && rows.exists(r => r._5 == 3L && r._6 == 0L),
      "fixture should include both completed and horizon-missed stage-3 users")
  }

  test("q192 SCD-2: contiguous intervals, one open version per key, no no-op versions") {
    // sf0.1, not the suite default: it is the one fixture where the
    // change-point filter actually collapses duplicate updates, so the
    // no-op invariant below is exercised rather than vacuously true
    val scdDir = "/root/testdata/sf0.1"
    val rows = SparkEntry.queries("q192_scd2_history")(spark, scdDir)
      .select("user_id", "version", "cents", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect()
    assert(rows.nonEmpty)
    // non-vacuity: the dedup branch must have dropped at least one no-op
    // update (delete the lag filter and this count goes to zero)
    val feed = graft.sources.Tables.events(spark, scdDir).count()
    assert(feed - rows.length > 0,
      s"fixture has no duplicate updates to collapse ($feed events, ${rows.length} versions)")
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val hist = rs.sortBy(_._2)
      // versions are contiguous from 1
      assert(hist.map(_._2).toSeq == (1L to hist.length), s"user $u versions not contiguous")
      // exactly one open (current) version, and it is the last
      assert(hist.count(_._6 == 1L) == 1 && hist.last._6 == 1L, s"user $u current-version rule")
      hist.sliding(2).foreach {
        case Array(a, b) =>
          // intervals tile the timeline: next valid_from == this valid_to
          assert(a._5 == b._4, s"user $u gap/overlap between v${a._2} and v${b._2}")
          // consecutive versions always change the tracked attribute
          assert(a._3 != b._3, s"user $u no-op version v${b._2}")
        case _ =>
      }
      // every closed interval is strictly positive-width: the equal-ts
      // last-write-wins collapse means a half-open [from,to) consumer can
      // select every version (no dead zero-width rows — ADVICE r10)
      hist.init.foreach(h => assert(h._5.after(h._4), s"user $u non-positive interval v${h._2}"))
    }
    // the open sentinel is ns-representable (pyarrow datetime64[ns] tops
    // out at 2262-04-11; round-10's 9999-12-31 sentinel wrapped there)
    // yet above every real timestamp in the corpus
    val open   = rows.filter(_._6 == 1L).map(_._5).distinct
    val closed = rows.filter(_._6 == 0L).map(_._5)
    assert(open.length == 1, s"open versions must share one sentinel, got ${open.toSeq}")
    assert(closed.nonEmpty, "fixture must include closed versions or the sentinel checks are vacuous")
    assert(open.head.toInstant.isBefore(java.time.Instant.parse("2262-04-11T00:00:00Z")))
    assert(open.head.after(closed.max), "sentinel must exceed every real valid_to")
    // reconstruction: the latest version's cents equals the last event's
    // cents per user (the SCD build must end on the live value)
    val last = graft.sources.Tables.events(spark, scdDir)
      .select(
        col("user_id"),
        struct(col("ts"), col("event_id"), expr("CAST(round(value * 100) AS BIGINT)").as("cents")).as("s"))
      .groupBy("user_id").agg(max(col("s")).as("m"))
      .select(col("user_id"), col("m.cents"))
      .as[(Long, Long)].collect().toMap
    rows.filter(_._6 == 1L).foreach { case (u, _, cents, _, _, _) =>
      assert(cents == last(u), s"user $u current version != last event value")
    }
  }

  test("q192 SCD-2: equal-ts change points collapse last-write-wins (synthetic ties)") {
    // The shipped corpora carry no (user_id, ts) ties, so the collapse
    // branch needs its own fixture: two users whose change feeds tie at a
    // shared timestamp, one where the winner CHANGES the attribute and one
    // where the winner makes the tie a no-op against the prior version.
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-scd-tie")
    graft.sources.SessionMemo.deleteOnExit(tmpDir)
    val tmp = tmpDir.toString
    Seq(
      // user 1: tie at Jan-1 (1.00 then 2.00) — event_id 11 wins; Jan-2 changes again
      (10L, ts("2024-01-01 00:00:00"), 1L, "update", 1.00, "{}"),
      (11L, ts("2024-01-01 00:00:00"), 1L, "update", 2.00, "{}"),
      (12L, ts("2024-01-02 00:00:00"), 1L, "update", 3.00, "{}"),
      // user 2: Jan-3 tie resolves to 5.00 — a no-op vs the open v1, so the
      // tie must produce NO new version at all
      (20L, ts("2024-01-01 00:00:00"), 2L, "update", 5.00, "{}"),
      (21L, ts("2024-01-03 00:00:00"), 2L, "update", 7.00, "{}"),
      (22L, ts("2024-01-03 00:00:00"), 2L, "update", 5.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val hist = SparkEntry.queries("q192_scd2_history")(spark, tmp)
      .select("user_id", "version", "cents", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(hist.map(r => (r._1, r._2, r._3, r._6)) == Seq(
      (1L, 1L, 200L, 0L), // the tie's LAST event_id won, not the first
      (1L, 2L, 300L, 1L),
      (2L, 1L, 500L, 1L)), // the tie collapsed to a no-op: single version
      s"got $hist")
    // strictly positive closed intervals — the zero-width artifact is gone
    hist.filter(_._6 == 0L).foreach(h => assert(h._5.after(h._4)))
    assert(hist.head._4 == ts("2024-01-01 00:00:00") && hist.head._5 == ts("2024-01-02 00:00:00"))

    // q195 over the same fixture: the half-open boundary rule. Every event
    // enriches 1:1; an event AT a change point sees the version the change
    // OPENED (half-open [from,to)), and the tie-losing event still lands
    // in the version its winning twin defined.
    val pit = SparkEntry.queries("q195_pit_enrich")(spark, tmp)
      .select("event_id", "user_id", "version", "cents_asof")
      .as[(Long, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(pit.map(_._1) == Seq(10L, 11L, 12L, 20L, 21L, 22L), s"1:1 coverage broken: $pit")
    val byEvent = pit.map(r => r._1 -> (r._3, r._4)).toMap
    assert(byEvent(10L) == ((1L, 200L)), "tie loser at the v1 boundary must see v1 (the tie winner's value)")
    assert(byEvent(11L) == ((1L, 200L)))
    assert(byEvent(12L) == ((2L, 300L)), "the change-point event itself opens the NEW version")
    assert(byEvent(21L) == ((1L, 500L)) && byEvent(22L) == ((1L, 500L)),
      "a tie that collapsed to a no-op keeps both events in the standing version")
  }

  test("q197 snapshot: at most one version per user, T strictly inside every returned interval") {
    val rows = SparkEntry.queries("q197_scd2_snapshot")(spark, dir)
      .select("user_id", "version", "valid_from", "snapshot_ts")
      .as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "a snapshot is one version per user")
    val t0s = rows.map(_._4).distinct
    assert(t0s.length == 1, s"one shared snapshot instant, got ${t0s.length}")
    rows.foreach { case (u, _, from, t0) => assert(!from.after(t0), s"user $u valid_from > T") }
    // every snapshotted user must exist in the history (the snapshot is a
    // filter of it), and T must catch at least one user mid-history or the
    // time-travel is vacuous. On the shipped corpora every user's history
    // starts before T (verified: first_ts > min+14d has zero users at all
    // 3 SFs), so the ABSENT-user branch gets its own synthetic fixture
    // below rather than a vacuous disjunction here.
    val hist = SparkEntry.queries("q192_scd2_history")(spark, dir)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(rows.map(_._1).toSet.subsetOf(hist.keySet), "snapshot users must come from the history")
    val finalVersions = SparkEntry.queries("q192_scd2_history")(spark, dir)
      .filter(col("is_current") === 1L)
      .select("user_id", "version").as[(Long, Long)].collect().toMap
    assert(rows.exists { case (u, v, _, _) => finalVersions.get(u).exists(_ != v) },
      "T must catch at least one user mid-history or the time-travel is vacuous")
  }

  test("q197 snapshot: a user whose history starts after T is absent (synthetic)") {
    // T is data-derived (corpus min + 14 days): user 1 anchors the corpus
    // min and stays present across T; user 2's first event is 20 days in —
    // the dimension did not know them at T, so the snapshot must omit them.
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-scd-absent")
    graft.sources.SessionMemo.deleteOnExit(tmpDir)
    val tmp = tmpDir.toString
    Seq(
      (10L, ts("2024-01-01 00:00:00"), 1L, "update", 1.00, "{}"),
      (11L, ts("2024-01-10 00:00:00"), 1L, "update", 2.00, "{}"),
      (12L, ts("2024-01-20 00:00:00"), 1L, "update", 3.00, "{}"),
      (20L, ts("2024-01-21 00:00:00"), 2L, "update", 5.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val rows = SparkEntry.queries("q197_scd2_snapshot")(spark, tmp)
      .select("user_id", "version", "cents")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // T = Jan-15: user 1 is on v2 (the Jan-10 change), user 2 is absent
    assert(rows == Seq((1L, 2L, 200L)), s"got $rows")
  }

  test("q196 streaming CDC enrichment row-for-row equals the one-shot q195 PIT join") {
    // The direct cross-proof (the oracle proves it against DuckDB; this
    // proves it Spark-vs-Spark with full row identity): per-batch as-of
    // against the evolving store == the batch interval join over the
    // final history. A staleness bug (enriching before the merge) or a
    // future-leak (a batch seeing versions it shouldn't) breaks version
    // numbers or cents here.
    val stream = SparkEntry.queries("q196_cdc_pit_stream")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val oneShot = SparkEntry.queries("q195_pit_enrich")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(stream.nonEmpty && stream == oneShot,
      s"stream/batch PIT divergence: ${stream.diff(oneShot).take(3)} vs ${oneShot.diff(stream).take(3)}")
  }
}
