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
      // every closed interval is well-formed (equal-ts change points allowed)
      hist.init.foreach(h => assert(!h._5.before(h._4), s"user $u inverted interval v${h._2}"))
    }
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
}
