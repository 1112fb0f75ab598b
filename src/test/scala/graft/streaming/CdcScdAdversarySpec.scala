package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

/** RANDOMIZED adversary for the CDC/SCD machinery (the r15 verdict's
  * directive #2): ScdStoreSpec pins the known-hard corners with crafted
  * batches (cross-boundary no-ops, tie collapse, the crash-window
  * compaction cutoff), but crafted cases only refute the failure modes
  * their author imagined. This suite generates seeded-random change feeds —
  * duplicate-timestamp tie chains on a coarse lattice, frequent no-op
  * updates (values from a 3-element set), key churn (users entering and
  * leaving the feed at random instants) — then drives q193/q196's exact
  * foreachBatch body (shared-bucket merge, then per-batch PIT enrich
  * against the pruned snapshot) over RANDOM batch cuts, RANDOM crash
  * replays (same-batch redelivery, including redelivery AFTER a
  * cutoff-bounded compaction — the crash window), and RANDOM compaction
  * points, asserting on every scenario the full triangle:
  *
  *   incremental ScdStore state  ≡  one-shot q192 build  ≡  brute force
  *   union of per-batch enriches ≡  one-shot q195 join   ≡  brute force
  *
  * Batch cuts fall only between DISTINCT instants of the globally
  * ts-sorted feed, so the store's CDC contract (per-user time-ordered
  * batches, equal-ts ties never straddling a boundary) holds by
  * construction — exactly what a range-partitioned epoch layout or a
  * per-partition-ordered Kafka source guarantees in production.
  *
  * Why the brute-force oracles are trustworthy: they are the SCD
  * change-point definition computed the naive way over the full per-user
  * multiset — sort, collapse equal-ts runs to the last event_id, drop
  * consecutive duplicate cents, number the survivors — and, for the
  * enrich, a linear scan for the containing [valid_from, valid_to)
  * interval per event. No batching, no seeding, no pruning, no windows.
  */
class CdcScdAdversarySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val OpenEnd = graft.queries.EventQueries.ScdOpenEnd
  private val Base    = Timestamp.valueOf("2024-03-01 00:00:00").getTime
  private val StepMs  = 15L * 60L * 1000L // 15-min lattice — ties constant
  private val Users   = 50                // generated histories (the verdict's floor)

  private def latTs(k: Long): Timestamp = new Timestamp(Base + k * StepMs)

  /** One change event: lattice instant, cents payload, globally-unique id
    * assigned AFTER generation (generation order is random relative to
    * event time, so equal-ts tie chains resolve by an id uncorrelated
    * with the draw).
    */
  private case class Ev(uid: Long, k: Long, cents: Long, eid: Long) {
    def ts: Timestamp = latTs(k)
  }

  /** Per-user history: 1-8 events on a 25-instant lattice, cents from a
    * 3-value set (no-op updates and equal-ts collisions are frequent by
    * construction); a random lattice OFFSET per user makes some users
    * enter the feed only in late batches (key churn).
    */
  private val genHistory: Gen[Seq[(Long, Long)]] = for {
    n    <- Gen.chooseNum(1, 8)
    base <- Gen.chooseNum(0L, 12L)
    evs  <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0L, 12L)
      c <- Gen.oneOf(100L, 200L, 300L)
    } yield (base + k, c))
  } yield evs

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // ---- the generated feed (shared by every scenario) ---------------------

  private lazy val events: Seq[Ev] = {
    val histories = sample(genHistory, Users, seed = 0xCDC5CD2L)
    var nextEid = 1L
    histories.zipWithIndex.flatMap { case (evs, i) =>
      evs.map { case (k, c) =>
        val e = nextEid; nextEid += 1
        Ev(i + 1L, k, c, e)
      }
    }
  }

  /** The one-shot corpus — the combined feed as an `events` table, written
    * once; q192/q195 run over it through the REGISTERED query surface.
    */
  private lazy val corpusDir: String = {
    val tmp = Files.createTempDirectory("graft-cdc-adv-corpus")
    graft.sources.SessionMemo.deleteOnExit(tmp)
    events
      .map(e => (e.eid, e.ts, e.uid, "update", e.cents / 100.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp.toString
  }

  private type ScdRow = (Long, Long, Long, String, String, Long)
  private type PitRow = (Long, Long, Long, Long)

  private lazy val oneShot192: Seq[ScdRow] =
    SparkEntry.queries("q192_scd2_history")(spark, corpusDir)
      .select(
        col("user_id"), col("version"), col("cents"),
        col("valid_from").cast("string"), col("valid_to").cast("string"), col("is_current"))
      .as[ScdRow].collect().toSeq.sortBy(r => (r._1, r._2))

  private lazy val oneShot195: Seq[PitRow] =
    SparkEntry.queries("q195_pit_enrich")(spark, corpusDir)
      .select(col("event_id"), col("user_id"), col("version"), col("cents_asof"))
      .as[PitRow].collect().toSeq.sortBy(_._1)

  // ---- brute-force oracles (the trust anchor) ----------------------------

  /** Spark's `cast(ts AS string)` form — no trailing `.0` at whole
    * seconds (every lattice instant is whole-second).
    */
  private def fmt(t: Timestamp): String = t.toString.stripSuffix(".0")

  /** The SCD-2 change-point chain per user, the naive way. */
  private lazy val brute192: Seq[ScdRow] =
    events.groupBy(_.uid).toSeq.flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e.k, e.eid))
      // equal-ts last-write-wins: the last event_id of each equal-ts run
      val collapsed = sorted.zipWithIndex.collect {
        case (e, i) if i + 1 == sorted.size || sorted(i + 1).k != e.k => e
      }
      // no-op-update dedup: drop consecutive duplicate cents
      val ch = collapsed.foldLeft(Vector.empty[Ev]) { (acc, e) =>
        if (acc.lastOption.exists(_.cents == e.cents)) acc else acc :+ e
      }
      ch.zipWithIndex.map { case (e, i) =>
        val open = i + 1 == ch.size
        (uid, i + 1L, e.cents, fmt(e.ts),
          if (open) OpenEnd else fmt(ch(i + 1).ts),
          if (open) 1L else 0L)
      }
    }.sortBy(r => (r._1, r._2))

  /** Containing-interval scan per event (EVERY raw event enriches — tie
    * losers and no-ops included; each sits at-or-after its user's first
    * change point, so exactly one version contains it).
    */
  private lazy val brute195: Seq[PitRow] = {
    val byUser = brute192.groupBy(_._1)
    events.map { e =>
      val v = byUser(e.uid)
        .find(r => Timestamp.valueOf(r._4).getTime <= e.ts.getTime &&
          e.ts.getTime < Timestamp.valueOf(r._5).getTime)
        .getOrElse(sys.error(s"no containing version for $e"))
      (e.eid, e.uid, v._2, v._3)
    }.sortBy(_._1)
  }

  // ---- the incremental harness (q193/q196's foreachBatch body) -----------

  private def batchDf(rows: Seq[Ev]): DataFrame =
    rows.map(e => (e.uid, e.ts, e.eid, e.cents)).toDF("user_id", "ts", "event_id", "cents")

  private def snap(store: ScdStore): Seq[ScdRow] =
    store.snapshotDf
      .select(
        col("user_id"), col("version"), col("cents"),
        col("valid_from").cast("string"), col("valid_to").cast("string"), col("is_current"))
      .as[ScdRow].collect().toSeq.sortBy(r => (r._1, r._2))

  /** The q196 per-trigger body: shared bucket pass, merge, enrich the
    * batch's own events against the PRUNED snapshot.
    */
  private def mergeAndEnrich(store: ScdStore, df: DataFrame, id: Long): Seq[PitRow] = {
    df.persist()
    try {
      val touched = store.bucketsOf(df)
      store.merge(df, id, Some(touched))
      graft.queries.EventQueries
        .pitEnrich(df.select(col("user_id"), col("ts"), col("event_id")),
          store.snapshotDfFor(touched))
        .select(col("event_id"), col("user_id"), col("version"), col("cents_asof"))
        .as[PitRow].collect().toSeq.sortBy(_._1)
    } finally { df.unpersist(); () }
  }

  /** Chop the globally ts-sorted feed into batches, cutting only between
    * distinct lattice instants (the CDC contract) — at least 3 cuts so
    * every scenario really is incremental.
    */
  private def randomBatches(rng: scala.util.Random): Seq[Seq[Ev]] = {
    val sorted   = events.sortBy(e => (e.k, e.eid))
    val instants = sorted.map(_.k).distinct
    val cuts = {
      var c = instants.drop(1).filter(_ => rng.nextDouble() < 0.3).toSet
      while (c.size < 3) c = c + instants(1 + rng.nextInt(instants.size - 1))
      c
    }
    val out = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer.empty[Ev])
    sorted.foreach { e =>
      if (out.last.nonEmpty && cuts(e.k) && out.last.last.k < e.k)
        out += scala.collection.mutable.ArrayBuffer.empty[Ev]
      out.last += e
    }
    out.filter(_.nonEmpty).map(c => rng.shuffle(c.toSeq)).toSeq
  }

  private def runScenario(scenarioSeed: Long, buckets: Int): Unit = {
    val rng     = new scala.util.Random(scenarioSeed)
    val batches = randomBatches(rng)
    val tmp     = Files.createTempDirectory(s"graft-cdc-adv-$scenarioSeed")
    graft.sources.SessionMemo.deleteOnExit(tmp)
    val store = new ScdStore(spark, s"$tmp/store", OpenEnd, buckets)
    val enriched = scala.collection.mutable.Map.empty[Int, Seq[PitRow]]
    var compactions = 0
    var replays     = 0
    batches.zipWithIndex.foreach { case (b, i) =>
      val df    = batchDf(b)
      val first = mergeAndEnrich(store, df, i.toLong)
      enriched(i) = first
      rng.nextDouble() match {
        case r if r < 0.2 =>
          // the crash window: the batch's write landed, its checkpoint
          // commit did not, compaction ran in between (cutoff = the last
          // COMMITTED batch id = i), then the batch redelivers
          store.compact(safeBelowBatch = i.toLong); compactions += 1
          val again = mergeAndEnrich(store, batchDf(b), i.toLong)
          assert(again == first,
            s"[seed=$scenarioSeed] post-compaction replay of batch $i diverged")
          enriched(i) = again; replays += 1
        case r if r < 0.4 =>
          // plain redelivery (crash after write, before commit)
          val again = mergeAndEnrich(store, batchDf(b), i.toLong)
          assert(again == first, s"[seed=$scenarioSeed] replay of batch $i diverged")
          enriched(i) = again; replays += 1
        case _ => ()
      }
      if (rng.nextDouble() < 0.25) {
        // a random safe compaction point: every batch ≤ i is committed by
        // now, so any cutoff up to i+1 preserves replay-ability of nothing
        // we still redeliver
        store.compact(safeBelowBatch = rng.nextInt(i + 2).toLong); compactions += 1
      }
    }
    if (rng.nextBoolean()) { store.compact(); compactions += 1 }
    assert(compactions > 0, s"[seed=$scenarioSeed] scenario never compacted — weaken the dice")
    assert(replays > 0, s"[seed=$scenarioSeed] scenario never replayed — weaken the dice")
    val got = snap(store)
    assert(got == oneShot192,
      s"[seed=$scenarioSeed] incremental != one-shot q192 over ${batches.size} batches " +
        s"($replays replays, $compactions compactions)\n got ${got.take(8)}…\n exp ${oneShot192.take(8)}…")
    val gotPit = enriched.toSeq.sortBy(_._1).flatMap(_._2).sortBy(_._1)
    assert(gotPit == oneShot195,
      s"[seed=$scenarioSeed] per-batch enrich != one-shot q195\n got ${gotPit.take(8)}…\n exp ${oneShot195.take(8)}…")
  }

  test("generated feed is genuinely adversarial (ties, no-ops, churn) and the one-shot builds match brute force") {
    // fixture honesty: the generator must keep producing the hard shapes
    val byUserTs = events.groupBy(e => (e.uid, e.k))
    assert(byUserTs.exists(_._2.size > 1), "no equal-ts tie chain generated")
    val hasNoOp = events.groupBy(_.uid).exists { case (_, evs) =>
      val sorted = evs.sortBy(e => (e.k, e.eid))
      val collapsed = sorted.zipWithIndex.collect {
        case (e, i) if i + 1 == sorted.size || sorted(i + 1).k != e.k => e
      }
      collapsed.sliding(2).exists(p => p.size == 2 && p(0).cents == p(1).cents)
    }
    assert(hasNoOp, "no consecutive no-op update generated")
    val firstK = events.groupBy(_.uid).view.mapValues(_.map(_.k).min).values.toSeq
    assert(firstK.max - firstK.min >= 6, "no key churn — users all enter at the same epoch")
    // the trust anchor: both registered one-shot queries == brute force
    assert(oneShot192 == brute192, s"q192 != brute force\n q192 ${oneShot192.take(8)}…\n br ${brute192.take(8)}…")
    assert(oneShot195 == brute195, s"q195 != brute force\n q195 ${oneShot195.take(8)}…\n br ${brute195.take(8)}…")
  }

  test(s"CDC adversary: incremental == one-shot on $Users random histories x 3 batching/replay/compaction scenarios") {
    runScenario(0xA11CEL, buckets = 4)
    runScenario(0xB0B5EEDL, buckets = 2)
    runScenario(0xCAFE16L, buckets = 8)
  }
}
