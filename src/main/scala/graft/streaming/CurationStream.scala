package graft.streaming

import graft.functions.TextFunctions.qualityScore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the batch curation pipeline (q40/q46 family): a
  * continuous document stream is quality-gated and exactly-deduplicated on
  * its content fingerprint — the ingest shape of a training-data pipeline
  * that curates as data arrives instead of in nightly batches.
  *
  * Dedup state is BOUNDED by the watermark (`dropDuplicatesWithinWatermark`):
  * a duplicate arriving within `lateness` of the original is dropped; state
  * for fingerprints older than the watermark horizon is evicted, so live
  * state is proportional to the ingest window, not corpus history — the only
  * stance that survives an unbounded 100 TB stream. (Exact forever-dedup is
  * the batch q40 / [[StatefulBalances.streamingDedup]] contract; this
  * operator trades horizon for bounded state, the standard production
  * compromise.)
  *
  * The fingerprint is md5 over the NORMALIZED text (lower/trim — the same
  * normalization as batch q40), computed as a narrow column expression; the
  * quality gate runs BEFORE dedup so junk never occupies state. md5's 128
  * bits matter here: dedup treats equal fingerprints as equal CONTENT, and a
  * short hash (e.g. the 31-bit Karp–Rabin fingerprint of q33) would silently
  * drop distinct documents on collision — by the birthday bound a 31-bit
  * space reaches ~50% collision odds at only ~54k live fingerprints, whereas
  * 128 bits stay collision-free at any realistic ingest volume.
  */
object CurationStream {

  /** @param docs     streaming frame with (doc_id LONG, ts TIMESTAMP,
    *                 text STRING) columns
    * @param lateness watermark delay = the dedup horizon
    */
  def curate(
      docs: DataFrame,
      lateness: java.time.Duration,
      minQuality: Double = 0.5
  ): DataFrame =
    docs
      .filter(qualityScore(col("text")) >= minQuality)
      .withColumn("fp", md5(lower(trim(col("text")))))
      .withWatermark("ts", s"${lateness.toMillis} milliseconds")
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")
}
