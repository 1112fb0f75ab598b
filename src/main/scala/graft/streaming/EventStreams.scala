package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time stream processing — the windowed/watermarked capability layer
  * the reference lacks (SURVEY.md §2: "no windows, no watermarks") but any
  * user scaling it up needs next. All transforms are `DataFrame =>
  * DataFrame` and run identically in batch (the driver-verified twin,
  * q27) and Structured Streaming.
  *
  * Scale notes: tumbling-window aggregation shuffles once on (window, key);
  * watermarks bound state size — without one, per-window state never
  * expires. Late rows beyond the watermark are dropped (appendix contract
  * tested in EventStreamsSpec).
  */
object EventStreams {

  /** Tumbling event-time windows: per (window, event_type) counts + sums.
    * Batch twin of the streaming aggregate — same call works on a streaming
    * frame when `watermark` is set.
    */
  def windowedStats(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermark: Option[String] = None
  ): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total"))
  }

  /** TRENDING TERMS: top-k tokens per finalized event-time window — the
    * streaming leaderboard shape (finalize → rank → publish). Counting is
    * the streaming windowed aggregate in APPEND mode (a (window, token)
    * count emits exactly once, when the watermark closes its window);
    * RANKING runs inside `foreachBatch` on the finalized rows — window
    * functions are not allowed on unbounded streams, and they don't need
    * to be: a closed window is a bounded batch, so the rank is ordinary
    * batch work. State is ∝ (open windows × distinct tokens in them),
    * watermark-bounded.
    *
    * @param docs  streaming frame with (ts TIMESTAMP, text STRING)
    * @param sink  receives the finalized top-k rows per batch
    *              (window_start, token, n, rank) — write to your store
    * @return the started query (caller stops it)
    */
  def trendingTerms(
      docs: DataFrame,
      windowLength: String,
      watermark: String,
      k: Int,
      checkpointDir: String
  )(sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withWatermark("ts", watermark)
      .select(window(col("ts"), windowLength).as("w"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      // split(trim(""), "\s+") yields [""] — a blank/whitespace-only doc
      // must not put the empty token on the leaderboard
      .filter(col("token") =!= "")
      .groupBy(col("w"), col("token"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("append") // rows arrive here only once their window closes
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rank = Window.partitionBy(col("w")).orderBy(col("n").desc, col("token"))
        sink(
          batch
            .withColumn("rank", row_number().over(rank).cast("long"))
            .filter(col("rank") <= k)
            .select(col("w.start").as("window_start"), col("token"), col("n"), col("rank"))
        )
        ()
      }
      .start()
  }

  /** Sliding windows (length, slide) — each event lands in length/slide
    * windows; otherwise identical contract to [[windowedStats]].
    */
  def slidingStats(
      events: DataFrame,
      windowLength: String,
      slide: String,
      watermark: Option[String] = None
  ): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      .groupBy(window(col("ts"), windowLength, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
  }

  /** Batch sessionization: gap-based sessions per user (a new session starts
    * when the gap to the previous event exceeds `gapMinutes`). Expressed
    * with window functions — lag → boundary flag → running session index —
    * so it is exactly mirrorable in the DuckDB oracle. The streaming twin is
    * `session_window(col("ts"), gap)` (state-store backed).
    */
  /** Session-window aggregation via Spark's native `session_window` — the
    * streaming-capable twin of [[sessionize]] (state-store backed when run
    * on a streaming frame with a watermark). Returns per (key, session)
    * bounds and event counts.
    */
  def sessionStats(
      events: DataFrame,
      gapMinutes: Int,
      keyCol: Column = col("user_id"),
      watermark: Option[String] = None
  ): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"), keyCol)
      .agg(count(lit(1)).as("n_events"))
      .select(
        keyCol,
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events")
      )
  }

  /** [[sessionStats]] with the exact integer-cents value sum (the q141
    * rounding treatment) — the transform behind the q178 streaming
    * byte gate. Merging-session state when run on a streaming frame;
    * the same call is the batch twin.
    */
  def sessionCents(
      events: DataFrame,
      gapMinutes: Int,
      watermark: Option[String] = None
  ): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"),
        col("cents")
      )
  }

  def sessionize(events: DataFrame, gapMinutes: Int, keyCol: Column = col("user_id")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(keyCol).orderBy(col("ts"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(
          col("prev_ts").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L),
          1L
        ).otherwise(0L)
      )
      .withColumn(
        "session_idx",
        // explicit ROWS frame: identical tie semantics to the oracle's
        // ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
  }
}
