package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming joins — the enrichment layer for unbounded payment/event
  * streams:
  *
  *   - [[enrich]]: stream–static join against a (broadcastable) dimension
  *     table. No state: each micro-batch hash-joins against the static side;
  *     at 100 TB/day the dimension is broadcast once per batch and the
  *     stream never shuffles.
  *   - [[intervalJoin]]: stream–stream inner join bounded by event-time
  *     watermarks + an interval condition — Spark buffers both sides in the
  *     state store and expires rows past the watermark, which is what makes
  *     an unbounded join finite. Without the time bound the state grows
  *     forever (Spark rejects it in append mode).
  */
object StreamJoins {

  /** Stream–static enrichment on an equi-key (e.g. payments × account dim). */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Stream–stream inner join: rows match when keys are equal and the right
    * event lands within [0, withinSeconds] after the left event. Both sides
    * must carry `ts` event-time columns; watermarks bound the buffered
    * state.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      withinSeconds: Long,
      watermark: String = "1 minute"
  ): DataFrame =
    intervalJoinType(left, right, key, withinSeconds, watermark, "inner")

  /** Stream–stream LEFT OUTER interval join — the "did a matching event
    * ever arrive in the window?" shape (e.g. payment × confirmation,
    * unconfirmed payments surface with null right columns). The outer
    * semantics are WATERMARK-DRIVEN: a left row's null-padded result can
    * only emit once the watermark proves no matching right row can still
    * arrive (state for its interval has expired) — so unmatched results
    * trail matched ones by the watermark delay. That delayed emission is
    * exactly what the spec pins down.
    */
  def intervalJoinLeftOuter(
      left: DataFrame,
      right: DataFrame,
      key: String,
      withinSeconds: Long,
      watermark: String = "1 minute"
  ): DataFrame =
    intervalJoinType(left, right, key, withinSeconds, watermark, "left_outer")

  /** Stream–static AS-OF enrichment: each streaming row picks up the
    * latest static row at-or-before its event time for its key, through
    * the custom merge node ([[graft.plans.AsofJoin]]) applied per
    * micro-batch inside `foreachBatch` — the standard way to run a
    * batch-only operator over a stream when its semantics are per-batch
    * (enrichment against a SLOWLY-CHANGING static side needs no
    * cross-batch state; each row's answer depends only on itself and the
    * static table). Returns the started query; enriched batches land in
    * `sink` as parquet, one `batch_id=N` partition directory per
    * micro-batch written with OVERWRITE — a retried batch rewrites its own
    * directory instead of appending a duplicate, so the sink is IDEMPOTENT
    * per batch id (the standard foreachBatch exactly-once recipe; readers
    * of the final directory see each batch once). A production run with a
    * transactional sink uses that sink's own commit protocol instead.
    *
    * CROSS-BATCH / WATERMARK CONTRACT (spec-pinned): there is NO watermark
    * and no cross-batch state — each stream row's answer is a pure
    * function of (row, static snapshot), so stream rows arriving LATE
    * (event times older than rows already processed in earlier batches)
    * still enrich correctly whenever they arrive; nothing is dropped for
    * lateness. `static` is BY-NAME and re-resolved at every batch, so a
    * slowly-changing static side (new history files landing between
    * batches) takes effect from the next batch onward — pass
    * `spark.read.parquet(dir)` and each batch re-lists the directory.
    * Already-written batches are never retroactively updated; note the
    * flip side: a batch REPLAYED from the checkpoint after a static
    * update recomputes against the current snapshot (per-batch-id
    * overwrite keeps the sink consistent either way). A run that needs
    * frozen history passes an immutable snapshot instead.
    */
  def asofEnrich(
      stream: DataFrame,
      static: => DataFrame,
      streamKey: String,
      streamTime: String,
      staticKey: String,
      staticTime: String,
      staticTie: String,
      sink: String,
      checkpoint: String,
      leftOuter: Boolean = true
  ): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b  = batch.toDF()
        val st = static // re-resolve the slowly-changing side once per batch
        graft.plans.AsofJoinOps
          .asof(b, st,
            b.col(streamKey), b.col(streamTime),
            st.col(staticKey), st.col(staticTime), st.col(staticTie),
            leftOuter = leftOuter)
          // the join key appears on both sides; drop the static one BY
          // EXPRESSION ID (name-based drop would be ambiguous). Any other
          // name collision is the caller's to alias, as in asof itself.
          .drop(st.col(staticKey))
          // idempotent sink: overwrite THIS batch's partition directory —
          // a mid-write failure + retry replaces the partial output
          // instead of double-appending it
          .write.mode("overwrite").parquet(s"$sink/batch_id=$batchId")
        ()
      }
      .start()

  private def intervalJoinType(
      left: DataFrame,
      right: DataFrame,
      key: String,
      withinSeconds: Long,
      watermark: String,
      joinType: String
  ): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right
      .withColumnRenamed("ts", "r_ts")
      .withColumnRenamed(key, s"r_$key")
      .withWatermark("r_ts", watermark)
    l.join(
      r,
      col(key) === col(s"r_$key") &&
        col("r_ts") >= col("ts") &&
        col("r_ts") <= col("ts") + expr(s"INTERVAL $withinSeconds SECONDS"),
      joinType
    ).drop(s"r_$key")
  }
}
