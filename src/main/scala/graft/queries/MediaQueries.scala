package graft.queries

import graft.multimodal.MediaPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: the decode pipeline end-to-end (typed Dataset
  * + batched mapPartitions) and a metadata-only aggregate. Because the
  * decode STUB is a pure byte formula (see
  * [[graft.multimodal.MediaPipeline]]), q60 is oracle-checked in SQL even
  * though the Spark side runs through typed `mapPartitions` — proving the
  * plumbing (encoders, batching, schema) preserves values exactly.
  */
object MediaQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full decode path: binary content -> features via batched mapPartitions.
    "q60_media_features" -> ((s, dir) =>
      MediaPipeline
        .extractFeatures(MediaPipeline.mediaFromDocuments(s, dir))
        .toDF()
        .select(
          col("media_id"),
          col("kind"),
          col("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"),
          col("feature_hash")
        )
        .orderBy(col("media_id"))),

    // Metadata-only aggregate — never touches the binary column (parquet
    // column pruning keeps the bytes unread).
    "q61_media_meta" -> ((s, dir) =>
      MediaPipeline
        .mediaFromDocuments(s, dir)
        .toDF()
        .groupBy(col("kind"), col("mime"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("kind")))
  )

  val oracles: Map[String, String] = Map(
    "q60_media_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    text, octet_length(encode(text)) AS n_bytes,
        |    ord(substr(text, 1, 1)) AS first_b,
        |    ord(substr(text, length(text), 1)) AS last_b
        |  FROM documents)
        |SELECT media_id, kind, n_bytes,
        |  (64 + first_b % 64)::BIGINT AS width,
        |  (64 + last_b % 64)::BIGINT AS height,
        |  (CASE WHEN kind = 'video' THEN 1 + n_bytes % 30 ELSE 1 END)::BIGINT AS n_frames,
        |  list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(text)+1), i -> ord(substr(text, i::INT, 1))::BIGINT)),
        |              (a, c) -> (a * 31 + c) % 2147483647) AS feature_hash
        |FROM m ORDER BY media_id""".stripMargin,
    "q61_media_meta" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
        |  count(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY kind""".stripMargin
  )
}
