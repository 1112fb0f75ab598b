package graft.streaming

import graft.SparkSpec
import graft.streaming.Sessionizer.{OpenSession, SessionEvent, SessionRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The custom-state sessionizer must reproduce `session_window`'s exact
  * semantics (the q178/q179 cross-proof depends on it):
  *   - merge boundary INCLUSIVE: an event at exactly `last + gap` extends
  *     the session; one µs beyond starts a new one (pinned against the
  *     built-in empirically — see q178's registered-query comment);
  *   - a late-but-admitted event BETWEEN two open sessions bridges them
  *     into one (interval merge, not append-to-latest);
  *   - emission only when the watermark proves closure (event-time
  *     timeout), with the session end = last event + gap.
  */
class SessionizerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val GapUs = 30L * 60L * 1000000L // 30 minutes in µs
  private val Gap   = java.time.Duration.ofMinutes(30)

  private def ev(uid: Long, us: Long, cents: Long = 1L): SessionEvent = {
    val ts = new java.sql.Timestamp(us / 1000L)
    ts.setNanos(((us % 1000000L) * 1000L).toInt)
    SessionEvent(ts, us, uid, cents)
  }

  // ---- insert(): the pure interval-merge kernel

  test("insert: boundary-inclusive merge on both sides, split one µs beyond") {
    val base = List(OpenSession(1000000L, 1000000L, 1L, 5L))
    // exactly gap after the last event: merges
    val merged = Sessionizer.insert(base, ev(1, 1000000L + GapUs), GapUs)
    assert(merged == List(OpenSession(1000000L, 1000000L + GapUs, 2L, 6L)))
    // one µs beyond: a second session
    val split = Sessionizer.insert(base, ev(1, 1000000L + GapUs + 1L), GapUs)
    assert(split.length == 2 && split.head.n == 1L && split.last.startUs == 1000000L + GapUs + 1L)
    // exactly gap BEFORE the session start: merges backward, start moves
    val back = Sessionizer.insert(base, ev(1, 1000000L - GapUs), GapUs)
    assert(back == List(OpenSession(1000000L - GapUs, 1000000L, 2L, 6L)))
  }

  test("insert: a bridging event collapses BOTH adjacent sessions into one") {
    val two = List(OpenSession(0L, 0L, 1L, 1L), OpenSession(50L * 60000000L, 50L * 60000000L, 1L, 1L))
    // 25 min sits within gap of both → one session spanning [0, 50 min]
    val one = Sessionizer.insert(two, ev(1, 25L * 60000000L), GapUs)
    assert(one == List(OpenSession(0L, 50L * 60000000L, 3L, 3L)))
  }

  // ---- end-to-end via MemoryStream: cross-batch state, timeout emission

  private def runStream(batches: Seq[Seq[SessionEvent]], lateness: java.time.Duration): Seq[SessionRow] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val tmp   = Files.createTempDirectory("graft-sess-spec")
    graft.sources.SessionMemo.deleteOnExit(tmp)
    val name = s"sess_spec_${System.nanoTime()}"
    val q = Sessionizer
      .sessions(input.toDS(), Gap, lateness)
      .writeStream
      .queryName(name)
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory")
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[SessionRow].collect().toSeq
  }

  test("cross-batch bridge: an admitted out-of-order event merges two open sessions; timeout emits once") {
    val t0 = 1700000000L * 1000000L // some epoch-µs base
    val out = runStream(
      Seq(
        Seq(ev(1, t0), ev(1, t0 + 50L * 60000000L)), // two sessions, 50 min apart
        Seq(ev(1, t0 + 25L * 60000000L)),            // bridge, 25 min — older than max seen
        // sentinel key: watermark → past every real session close
        Seq(ev(99, t0 + 50L * 60000000L + GapUs + 8L * 3600L * 1000000L))
      ),
      lateness = java.time.Duration.ofHours(2) // admits the bridge
    )
    val real = out.filter(_.user_id == 1L)
    assert(real == Seq(SessionRow(1L, t0, t0 + 50L * 60000000L + GapUs, 3L, 3L)),
      s"bridged session wrong: $real")
    assert(!out.exists(_.user_id == 99L), "the sentinel key's session must never close")
  }

  test("gap boundary end-to-end: exactly-gap merges, gap+1µs splits; ends are last+gap to the µs") {
    val t0 = 1700000000L * 1000000L + 123456L // non-ms-aligned µs
    val out = runStream(
      Seq(
        Seq(ev(1, t0), ev(1, t0 + GapUs), ev(2, t0), ev(2, t0 + GapUs + 1L)),
        Seq(ev(99, t0 + 2L * GapUs + 8L * 3600L * 1000000L))
      ),
      lateness = java.time.Duration.ZERO
    )
    assert(out.filter(_.user_id == 1L) == Seq(SessionRow(1L, t0, t0 + 2L * GapUs, 2L, 2L)))
    assert(out.filter(_.user_id == 2L) == Seq(
      SessionRow(2L, t0, t0 + GapUs, 1L, 1L),
      SessionRow(2L, t0 + GapUs + 1L, t0 + 2L * GapUs + 1L, 1L, 1L)))
  }

  test("partial close: the watermark closes only the sessions it has passed; the rest stay open") {
    val t0 = 1700000000L * 1000000L
    val h  = 3600L * 1000000L
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val tmp   = Files.createTempDirectory("graft-sess-spec")
    graft.sources.SessionMemo.deleteOnExit(tmp)
    val name = s"sess_spec_${System.nanoTime()}"
    val q = Sessionizer
      .sessions(input.toDS(), Gap, java.time.Duration.ZERO)
      .writeStream
      .queryName(name)
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory")
      .start()
    try {
      // user 1: an early session and one 10 h later. With lateness 0 the
      // post-batch watermark is t0+10h — past the EARLY session's close
      // (t0+gap) but before the late one's (t0+10h+gap): the finalization
      // batch must emit exactly the early session.
      input.addData(ev(1, t0), ev(1, t0 + 10L * h))
      q.processAllAvailable()
      val mid = spark.table(name).as[SessionRow].collect().toSeq
      assert(mid == Seq(SessionRow(1L, t0, t0 + GapUs, 1L, 1L)),
        s"only the early session may close at wm=t0+10h: $mid")
      // advance past the late session's close → it emits too, exactly once
      input.addData(ev(99, t0 + 24L * h))
      q.processAllAvailable()
      val fin = spark.table(name).as[SessionRow].collect().toSeq.filter(_.user_id == 1L)
      assert(fin.sortBy(_.start_us) == Seq(
        SessionRow(1L, t0, t0 + GapUs, 1L, 1L),
        SessionRow(1L, t0 + 10L * h, t0 + 10L * h + GapUs, 1L, 1L)),
        s"the late session must close exactly once after the advance: $fin")
    } finally q.stop()
  }

  test("NATIVE session_window at the exact boundary: last+gap merges, +1µs splits (the pin the cross-proof rests on)") {
    // The q178/q179 cross-proof claims the custom sessionizer reproduces
    // the BUILT-IN's boundary rule, but the corpus fixtures carry random
    // microseconds that essentially never produce an exact last+gap tie —
    // so this drives the native operator itself (EventStreams.sessionCents,
    // the exact frame q178 streams) with deterministic tie data, mirroring
    // the `insert:` boundary test above. If Spark's rule were exclusive,
    // user 1 would emit TWO sessions here and the byte-identity claim
    // would be dead.
    import org.apache.spark.sql.functions.{col, unix_micros}
    val t0 = 1700000000L * 1000000L + 123456L // non-ms-aligned µs
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val tmp   = Files.createTempDirectory("graft-sess-native")
    graft.sources.SessionMemo.deleteOnExit(tmp)
    val name = s"sess_native_${System.nanoTime()}"
    val q = EventStreams
      .sessionCents(input.toDS().toDF(), gapMinutes = 30, watermark = Some("0 seconds"))
      .writeStream
      .queryName(name)
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory")
      .start()
    try {
      input.addData(ev(1, t0), ev(1, t0 + GapUs), ev(2, t0), ev(2, t0 + GapUs + 1L))
      q.processAllAvailable()
      input.addData(ev(99, t0 + 2L * GapUs + 8L * 3600L * 1000000L)) // watermark past every close
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name)
      .select(
        col("user_id"),
        unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"),
        col("n_events"), col("cents"))
      .as[(Long, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    assert(rows.filter(_._1 == 1L) == Seq((1L, t0, t0 + 2L * GapUs, 2L, 2L)),
      s"native rule must be boundary-INCLUSIVE (merge at exactly last+gap): $rows")
    assert(rows.filter(_._1 == 2L) == Seq(
      (2L, t0, t0 + GapUs, 1L, 1L),
      (2L, t0 + GapUs + 1L, t0 + 2L * GapUs + 1L, 1L, 1L)),
      s"native rule must SPLIT one µs beyond the gap: $rows")
  }
}
