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
          col("sample_rate").cast("long").as("sample_rate"),
          col("n_channels").cast("long").as("n_channels"),
          col("n_frames").cast("long").as("n_frames"),
          col("duration_ms"),
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
        .orderBy(col("kind"), col("mime"))),

    // Frame sampling end-to-end: every 10th fixed-size "frame" of each
    // video's byte stream (the container-parse STUB boundary — the
    // byte-slicing plumbing, flatMap fan-out and schema are real). Frames
    // are compared BY VALUE: the bytes decode as UTF-8 text (video payloads
    // are text bytes in the harness; ASCII asserted by MediaPipelineSpec),
    // so the oracle slices the same windows with substr.
    "q65_frame_sample" -> ((s, dir) =>
      MediaPipeline
        .sampleFrames(MediaPipeline.mediaFromDocuments(s, dir))
        .select(
          col("media_id"),
          col("frame_no").cast("long").as("frame_no"),
          length(col("frame_bytes")).cast("long").as("frame_len"),
          col("frame_bytes").cast("string").as("frame_text")
        )
        .orderBy(col("media_id"), col("frame_no"))),

    // REAL PIXEL PATH end to end: the corpus rows are complete PNG/BMP
    // files (real zlib IDAT with row filters 0-4, BMP both row orders),
    // decoded by PixelCodec (inflate + unfilter / padded BGR row reads),
    // fit into 8px and resampled nearest-neighbor — and the RESAMPLED RGB
    // BYTES are value-checked: the oracle replays the pixel formula through
    // the same integer index map and hashes the identical byte sequence.
    // A wrong unfilter branch, row order, BGR swap, or resample index
    // changes px_hash.
    "q115_resize_pixels" -> ((s, dir) =>
      MediaPipeline
        .resizePixels(MediaPipeline.mediaWithPixels(s, dir), maxSide = 8)
        .select(
          col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("out_width").cast("long").as("out_width"),
          col("out_height").cast("long").as("out_height"),
          col("out_len").cast("long").as("out_len"),
          col("px_hash")
        )
        .orderBy(col("media_id"))),

    // Windowed PCM features off the REAL WAV parse: per-window exact sum
    // of squared samples + zero-crossing count, and the RMS via IEEE-exact
    // sqrt. The oracle rebuilds the identical little-endian signed-16
    // samples from the synthetic payload bytes.
    "q123_audio_energy" -> ((s, dir) =>
      MediaPipeline
        .audioFeatures(MediaPipeline.mediaFromDocuments(s, dir))
        .select(
          col("media_id"),
          col("window_no").cast("long").as("window_no"),
          col("n_samples").cast("long").as("n_samples"),
          col("sum_sq"),
          col("n_crossings"),
          round(sqrt(col("sum_sq").cast("double") / col("n_samples")), 4).as("rms")
        )
        .orderBy(col("media_id"), col("window_no"))),

    // REAL VIDEO-PIXEL PATH end to end: the corpus rows are complete
    // raw-DIB RIFF/AVI files (real avih/strh/strf headers, bottom-up
    // padded BGR frame chunks), container-walked and frame-decoded by
    // AviCodec, each frame fit into 8px and resampled nearest-neighbor —
    // and the RESAMPLED FRAME BYTES are value-checked: the oracle replays
    // the per-frame pixel formula through the same integer index map and
    // hashes the identical byte sequence. A wrong stride unpad, row order,
    // BGR swap, frame order, or avih cadence changes the output.
    "q128_video_pixels" -> ((s, dir) =>
      MediaPipeline
        .videoFramePixels(MediaPipeline.mediaWithVideoFrames(s, dir), maxSide = 8)
        .select(
          col("media_id"),
          col("frame_no").cast("long").as("frame_no"),
          col("n_frames").cast("long").as("n_frames"),
          col("us_per_frame").cast("long").as("us_per_frame"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("out_width").cast("long").as("out_width"),
          col("out_height").cast("long").as("out_height"),
          col("out_len").cast("long").as("out_len"),
          col("px_hash")
        )
        .orderBy(col("media_id"), col("frame_no"))),

    // MP4 SAMPLE DECODE end to end: the corpus rows are complete MJPEG
    // MP4s with FULL sample tables (stsd 'jpeg', stts, run-length stsc,
    // per-sample stsz, absolute stco). Each sample span is recovered by
    // the real ISO-BMFF table walk, Huffman-decoded by the JDK JPEG codec,
    // fit into 8px — and the RESAMPLED PIXELS are value-checked: frames
    // are flat grayscale (DC-only blocks round-trip JPEG bit-exactly), so
    // the oracle replays the gray formula through the same index map. A
    // wrong stsc expansion, stco offset, or stsz size slices a non-JPEG
    // span and the row DROPS (count mismatch); a wrong decode or gray→RGB
    // mapping changes px_hash.
    "q143_mp4_frames" -> ((s, dir) =>
      MediaPipeline
        .videoFramePixels(MediaPipeline.mediaWithMp4Frames(s, dir), maxSide = 8)
        .select(
          col("media_id"),
          col("frame_no").cast("long").as("frame_no"),
          col("n_frames").cast("long").as("n_frames"),
          col("us_per_frame").cast("long").as("us_per_frame"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("out_width").cast("long").as("out_width"),
          col("out_height").cast("long").as("out_height"),
          col("out_len").cast("long").as("out_len"),
          col("px_hash")
        )
        .orderBy(col("media_id"), col("frame_no"))),

    // EXIF METADATA EXTRACTION end to end: real APP1/TIFF blocks in BOTH
    // byte orders (even ids MM big-endian, odd II little-endian), the
    // Make string offset-addressed past the IFD the way cameras write it,
    // and dims read by the INDEPENDENT SOF walk, which must skip the EXIF
    // segment by declared length to reach the frame header. A wrong
    // endian read, offset deref, or segment skip changes the output.
    "q138_exif_meta" -> ((s, dir) =>
      MediaPipeline
        .exifMeta(MediaPipeline.mediaWithExif(s, dir))
        .select(
          col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("orientation").cast("long").as("orientation"),
          col("make")
        )
        .orderBy(col("media_id"))),

    // AUDIO DOWNSAMPLING end to end: every WAV row decimated 2x frame-wise
    // (channel-aligned) and re-encoded as a complete new WAV whose FILE
    // bytes are hashed -- a wrong header field, stride, kept-frame set, or
    // dropped partial frame changes file_hash. The oracle rebuilds the
    // identical 44-byte header at rate/2 and the identical kept byte
    // positions from the synthetic payload.
    "q135_audio_downsample" -> ((s, dir) =>
      MediaPipeline
        .downsampleAudio(MediaPipeline.mediaFromDocuments(s, dir), factor = 2)
        .select(
          col("media_id"),
          col("rate_in").cast("long").as("rate_in"),
          col("rate_out").cast("long").as("rate_out"),
          col("n_frames_in").cast("long").as("n_frames_in"),
          col("n_frames_out").cast("long").as("n_frames_out"),
          col("out_bytes").cast("long").as("out_bytes"),
          col("file_hash")
        )
        .orderBy(col("media_id"))),

    // UNIFIED resize stage, BOTH paths gated BY VALUE: the corpus mixes
    // complete real-pixel files (mediaWithPixels — PNG/BMP rows that
    // decode, fit, and resample through PixelCodec; real_decode=1) with
    // header-only containers (mediaFromDocuments images — no pixel data,
    // so the stage falls back to the every-k-th-byte stub; real_decode=0).
    // The oracle replays the pixel formula through the same fit+resample
    // index map for the real rows AND the header byte lists through the
    // same subsample for the stub rows, hashing both payloads. maxSide=10
    // (not q115's 8) so the real rows exercise a DIFFERENT resample grid
    // than q115.
    "q67_media_resize" -> ((s, dir) =>
      MediaPipeline
        .resizeImages(
          MediaPipeline
            .mediaWithPixels(s, dir)
            .union(MediaPipeline.mediaFromDocuments(s, dir).filter(_.kind == "image")),
          maxSide = 10)
        .select(
          col("media_id"),
          col("real_decode"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("out_width").cast("long").as("out_width"),
          col("out_height").cast("long").as("out_height"),
          col("out_bytes"),
          col("px_hash")
        )
        .orderBy(col("media_id"), col("real_decode")))
  )

  // The oracle rebuilds the exact bytes the Spark side synthesizes —
  // PNG/BMP/JPEG headers as integer lists (a pure doc_id formula), text
  // bytes via ord() — then applies the same feature formulas, so the REAL
  // header parse is what gets cross-checked. ds uses strlen() (BYTE length,
  // matching Spark's getBytes("UTF-8").length in the WAV header); the
  // ord()-per-character byte list additionally assumes the synthetic corpus
  // is ASCII (asserted by MediaPipelineSpec's corpus-is-ascii test —
  // non-ASCII text would need a per-byte UTF-8 encoder in SQL).
  val oracles: Map[String, String] = Map(
    "q60_media_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    text, 1 + doc_id % 512 AS w, 1 + (doc_id * 7) % 512 AS h,
        |    (doc_id % 12 = 0) AS is_png, (doc_id % 12 = 6) AS is_gif, (doc_id % 12 = 3) AS is_jpeg,
        |    8000 + (doc_id % 8) * 1000 AS rate, 1 + doc_id % 2 AS ch, strlen(text) AS ds,
        |    16 * (1 + doc_id % 40) AS vw, 16 * (1 + (doc_id * 3) % 40) AS vh,
        |    1000 + doc_id % 9000 AS dur, 10 + doc_id % 290 AS ns
        |  FROM documents),
        | b AS (
        |  SELECT media_id, kind, w, h, rate, ch, ds, vw, vh, dur, ns,
        |    CASE
        |      WHEN kind = 'image' AND is_png THEN
        |        [137,80,78,71,13,10,26,10, 0,0,0,13, 73,72,68,82,
        |         w // 16777216 % 256, w // 65536 % 256, w // 256 % 256, w % 256,
        |         h // 16777216 % 256, h // 65536 % 256, h // 256 % 256, h % 256,
        |         8,2,0,0,0]
        |      WHEN kind = 'image' AND is_gif THEN
        |        [71,73,70,56,57,97, w % 256, w // 256 % 256, h % 256, h // 256 % 256, 247,0,0]
        |      WHEN kind = 'image' AND is_jpeg THEN
        |        [255,216, 255,224,0,16, 74,70,73,70,0, 1,1, 0, 0,1, 0,1, 0,0,
        |         255,192,0,17,8, h // 256 % 256, h % 256, w // 256 % 256, w % 256,
        |         3, 1,34,0, 2,17,1, 3,17,1]
        |      WHEN kind = 'image' THEN
        |        [66,77, 54,0,0,0, 0,0,0,0, 54,0,0,0, 40,0,0,0,
        |         w % 256, w // 256 % 256, 0, 0,
        |         h % 256, h // 256 % 256, 0, 0,
        |         1,0,24,0] || [0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0]
        |      WHEN kind = 'audio' THEN
        |        [82,73,70,70, (36+ds) % 256, (36+ds) // 256 % 256, (36+ds) // 65536 % 256, (36+ds) // 16777216 % 256,
        |         87,65,86,69, 102,109,116,32, 16,0,0,0, 1,0, ch % 256, ch // 256 % 256,
        |         rate % 256, rate // 256 % 256, rate // 65536 % 256, rate // 16777216 % 256,
        |         (rate*ch*2) % 256, (rate*ch*2) // 256 % 256, (rate*ch*2) // 65536 % 256, (rate*ch*2) // 16777216 % 256,
        |         (ch*2) % 256, (ch*2) // 256 % 256, 16,0, 100,97,116,97,
        |         ds % 256, ds // 256 % 256, ds // 65536 % 256, ds // 16777216 % 256]
        |        || list_transform(range(1, length(text)+1), i -> ord(substr(text, i::INT, 1))::BIGINT)
        |      ELSE
        |        [0,0,0,16, 102,116,121,112, 105,115,111,109, 0,0,2,0,
        |         0,0,1,73, 109,111,111,118,
        |         0,0,0,108, 109,118,104,100, 0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,3,232,
        |         dur // 16777216 % 256, dur // 65536 % 256, dur // 256 % 256, dur % 256,
        |         0,1,0,0, 1,0,0,0, 0,0,0,0,0,0,0,0,
        |         0,1,0,0, 0,0,0,0,0,0,0,0,0,0,0,0, 0,1,0,0, 0,0,0,0,0,0,0,0,0,0,0,0, 64,0,0,0,
        |         0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0, 0,0,0,2,
        |         0,0,0,213, 116,114,97,107,
        |         0,0,0,92, 116,107,104,100, 0,0,0,7, 0,0,0,0, 0,0,0,0, 0,0,0,1, 0,0,0,0,
        |         dur // 16777216 % 256, dur // 65536 % 256, dur // 256 % 256, dur % 256,
        |         0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,
        |         0,1,0,0, 0,0,0,0,0,0,0,0,0,0,0,0, 0,1,0,0, 0,0,0,0,0,0,0,0,0,0,0,0, 64,0,0,0,
        |         vw // 256 % 256, vw % 256, 0, 0, vh // 256 % 256, vh % 256, 0, 0,
        |         0,0,0,113, 109,100,105,97,
        |         0,0,0,32, 109,100,104,100, 0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,3,232,
        |         dur // 16777216 % 256, dur // 65536 % 256, dur // 256 % 256, dur % 256,
        |         85,196,0,0,
        |         0,0,0,33, 104,100,108,114, 0,0,0,0, 0,0,0,0, 118,105,100,101,
        |         0,0,0,0,0,0,0,0,0,0,0,0, 0,
        |         0,0,0,40, 109,105,110,102,
        |         0,0,0,32, 115,116,98,108,
        |         0,0,0,24, 115,116,116,115, 0,0,0,0, 0,0,0,1,
        |         ns // 16777216 % 256, ns // 65536 % 256, ns // 256 % 256, ns % 256,
        |         0,0,0,100,
        |         (8+ds) // 16777216 % 256, (8+ds) // 65536 % 256, (8+ds) // 256 % 256, (8+ds) % 256,
        |         109,100,97,116]
        |        || list_transform(range(1, length(text)+1), i -> ord(substr(text, i::INT, 1))::BIGINT)
        |    END AS bl
        |  FROM m)
        |SELECT media_id, kind, len(bl)::BIGINT AS n_bytes,
        |  (CASE WHEN kind = 'image' THEN w WHEN kind = 'audio' THEN 0 ELSE vw END)::BIGINT AS width,
        |  (CASE WHEN kind = 'image' THEN h WHEN kind = 'audio' THEN 0 ELSE vh END)::BIGINT AS height,
        |  (CASE WHEN kind = 'audio' THEN rate ELSE 0 END)::BIGINT AS sample_rate,
        |  (CASE WHEN kind = 'audio' THEN ch ELSE 0 END)::BIGINT AS n_channels,
        |  (CASE WHEN kind = 'video' THEN ns
        |        WHEN kind = 'audio' THEN ds // (ch*2) ELSE 1 END)::BIGINT AS n_frames,
        |  (CASE WHEN kind = 'video' THEN dur
        |        WHEN kind = 'audio' THEN (ds // (ch*2)) * 1000 // rate ELSE 0 END)::BIGINT AS duration_ms,
        |  list_reduce(list_prepend(0::BIGINT, list_transform(bl, x -> x::BIGINT)),
        |              (a, c) -> (a * 31 + c) % 2147483647) AS feature_hash
        |FROM b ORDER BY media_id""".stripMargin,
    "q61_media_meta" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CASE WHEN doc_id % 12 = 0 THEN 'image/png' WHEN doc_id % 12 = 6 THEN 'image/gif'
        |       WHEN doc_id % 12 = 3 THEN 'image/jpeg'
        |       WHEN doc_id % 3 = 0 THEN 'image/bmp'
        |       WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
        |  count(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY kind, mime""".stripMargin,
    "q65_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 2),
        | f AS (
        |  SELECT media_id, text,
        |    unnest(range(0, CAST(ceil(strlen(text) / 10.0) AS BIGINT))) AS frame_no
        |  FROM v)
        |SELECT media_id, frame_no,
        |  CAST(strlen(substr(text, CAST(frame_no * 10 + 1 AS INT), 10)) AS BIGINT) AS frame_len,
        |  substr(text, CAST(frame_no * 10 + 1 AS INT), 10) AS frame_text
        |FROM f WHERE frame_no % 10 = 0
        |ORDER BY media_id, frame_no""".stripMargin,
    // The real-pixel gate: rebuild the formula pixels, apply the SAME
    // integer fit + nearest-neighbor index map (src = dst*srcDim//dstDim),
    // and hash the resampled byte sequence — the Spark side must recover
    // exactly these bytes from the real PNG/BMP containers to match.
    "q115_resize_pixels" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, 3 + doc_id % 14 AS w, 3 + (doc_id * 7) % 14 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        | s AS (SELECT media_id, w, h, greatest(w, h) AS longest FROM m),
        | d AS (
        |  SELECT media_id, w, h,
        |    CASE WHEN longest <= 8 THEN w ELSE greatest(1, (w * 8 + longest - 1) // longest) END AS w2,
        |    CASE WHEN longest <= 8 THEN h ELSE greatest(1, (h * 8 + longest - 1) // longest) END AS h2
        |  FROM s),
        | p AS (
        |  SELECT media_id, w, h, w2, h2,
        |    flatten(list_transform(range(0, h2), y2 ->
        |      flatten(list_transform(range(0, w2), x2 ->
        |        list_transform(range(0, 3), c ->
        |          ((media_id * 31 + ((x2 * w) // w2) * 7 + ((y2 * h) // h2) * 13 + c * 5) % 256)::BIGINT))))) AS bl
        |  FROM d)
        |SELECT media_id, w::BIGINT AS width, h::BIGINT AS height,
        |  w2::BIGINT AS out_width, h2::BIGINT AS out_height,
        |  (w2 * h2 * 3)::BIGINT AS out_len,
        |  list_reduce(list_prepend(0::BIGINT, bl), (a, c) -> (a * 31 + c) % 2147483647) AS px_hash
        |FROM p ORDER BY media_id""".stripMargin,
    // The same LE signed-16 sample reconstruction, windowing, and exact
    // integer aggregates; rms via the IEEE-correctly-rounded sqrt.
    "q123_audio_energy" ->
      """WITH a AS (
        |  SELECT doc_id AS media_id, text, strlen(text) // 2 AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        | idx AS (SELECT media_id, text, unnest(range(n)) AS j FROM a),
        | sg AS (
        |  SELECT media_id, j, j // 100 AS wno,
        |    (SELECT CASE WHEN r >= 32768 THEN r - 65536 ELSE r END FROM (
        |      SELECT ord(substr(text, (2*j+1)::INT, 1)) + 256 * ord(substr(text, (2*j+2)::INT, 1)) AS r)) AS smp
        |  FROM idx),
        | lagd AS (
        |  SELECT media_id, wno, j, smp,
        |    lag(smp) OVER (PARTITION BY media_id ORDER BY j) AS prev,
        |    lag(j) OVER (PARTITION BY media_id ORDER BY j) AS prevj
        |  FROM sg)
        |SELECT media_id, wno AS window_no, count(*) AS n_samples,
        |  CAST(sum(smp * smp) AS BIGINT) AS sum_sq,
        |  CAST(sum(CASE WHEN prevj IS NOT NULL AND prevj // 100 = wno
        |                AND ((prev >= 0) <> (smp >= 0)) THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings,
        |  round(sqrt(CAST(sum(smp * smp) AS DOUBLE) / count(*)), 4) AS rms
        |FROM lagd GROUP BY media_id, wno ORDER BY media_id, window_no""".stripMargin,
    // The EXIF gate: the parsed fields must equal the formula the
    // synthesizer wrote into the TIFF block (trust model of q60/q115:
    // Spark REALLY parses bytes; the oracle replays the formula).
    "q138_exif_meta" ->
      """SELECT doc_id AS media_id,
        |  (8 + doc_id % 64)::BIGINT AS width,
        |  (8 + (doc_id * 3) % 64)::BIGINT AS height,
        |  (1 + doc_id % 8)::BIGINT AS orientation,
        |  'cam' || CAST(doc_id % 5 AS VARCHAR) AS make
        |FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id""".stripMargin,
    // The downsample gate: identical kept-frame byte positions, identical
    // 44-byte header at rate/2, one polynomial fold over the whole file.
    "q135_audio_downsample" ->
      """WITH a AS (
        |  SELECT doc_id AS media_id, text, strlen(text) AS ds,
        |         1 + doc_id % 2 AS ch, 8000 + (doc_id % 8) * 1000 AS rate
        |  FROM documents WHERE doc_id % 3 = 1),
        | p AS (
        |  SELECT media_id, text, ch, rate, 2 * ch AS bpf, ds // (2 * ch) AS nf FROM a),
        | q AS (
        |  SELECT media_id, ch, rate, bpf, nf, (nf + 1) // 2 AS nk, rate // 2 AS rate2 FROM p),
        | pay AS (
        |  SELECT media_id,
        |    flatten(list_transform(range(0, nf, 2), j ->
        |      list_transform(range(0, bpf), t ->
        |        ord(substr(text, (j * bpf + t + 1)::INT, 1))::BIGINT))) AS pb
        |  FROM p),
        | f AS (
        |  SELECT q.media_id, q.rate, q.rate2, q.nf, q.nk,
        |    q.nk * q.bpf AS ds2, q.rate2 * q.ch * 2 AS br, q.ch AS ch, pay.pb AS pb
        |  FROM q JOIN pay USING (media_id)),
        | b AS (
        |  SELECT media_id, rate, rate2, nf, nk, ds2,
        |    [82,73,70,70,
        |     (36+ds2) % 256, (36+ds2) // 256 % 256, (36+ds2) // 65536 % 256, (36+ds2) // 16777216 % 256,
        |     87,65,86,69, 102,109,116,32, 16,0,0,0, 1,0, ch % 256, ch // 256 % 256,
        |     rate2 % 256, rate2 // 256 % 256, rate2 // 65536 % 256, rate2 // 16777216 % 256,
        |     br % 256, br // 256 % 256, br // 65536 % 256, br // 16777216 % 256,
        |     (ch*2) % 256, (ch*2) // 256 % 256, 16,0, 100,97,116,97,
        |     ds2 % 256, ds2 // 256 % 256, ds2 // 65536 % 256, ds2 // 16777216 % 256] || pb AS fb
        |  FROM f)
        |SELECT media_id, rate::BIGINT AS rate_in, rate2::BIGINT AS rate_out,
        |  nf::BIGINT AS n_frames_in, nk::BIGINT AS n_frames_out,
        |  (44 + ds2)::BIGINT AS out_bytes,
        |  list_reduce(list_prepend(0::BIGINT, list_transform(fb, x -> x::BIGINT)),
        |              (a, c) -> (a * 31 + c) % 2147483647) AS file_hash
        |FROM b ORDER BY media_id""".stripMargin,
    // The video gate: rebuild each frame's formula pixels, apply the SAME
    // integer fit + nearest-neighbor index map as q115, and hash the
    // resampled byte sequence per frame — the Spark side must recover
    // exactly these bytes from the real AVI containers (stride unpad, BGR
    // swap, bottom-up flip, frame-chunk order) to match.
    "q128_video_pixels" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, 3 + doc_id % 14 AS w, 3 + (doc_id * 5) % 14 AS h,
        |         2 + doc_id % 4 AS nf, 1000000 // (5 + doc_id % 10) AS uspf
        |  FROM documents WHERE doc_id % 3 = 2),
        | s AS (SELECT media_id, w, h, nf, uspf, greatest(w, h) AS longest FROM m),
        | d AS (
        |  SELECT media_id, w, h, nf, uspf,
        |    CASE WHEN longest <= 8 THEN w ELSE greatest(1, (w * 8 + longest - 1) // longest) END AS w2,
        |    CASE WHEN longest <= 8 THEN h ELSE greatest(1, (h * 8 + longest - 1) // longest) END AS h2
        |  FROM s),
        | f AS (SELECT media_id, w, h, nf, uspf, w2, h2, unnest(range(0, nf)) AS fno FROM d),
        | p AS (
        |  SELECT media_id, fno, nf, uspf, w, h, w2, h2,
        |    flatten(list_transform(range(0, h2), y2 ->
        |      flatten(list_transform(range(0, w2), x2 ->
        |        list_transform(range(0, 3), c ->
        |          ((media_id * 31 + fno * 17 + ((x2 * w) // w2) * 7 + ((y2 * h) // h2) * 13 + c * 5) % 256)::BIGINT))))) AS bl
        |  FROM f)
        |SELECT media_id, fno::BIGINT AS frame_no, nf::BIGINT AS n_frames,
        |  uspf::BIGINT AS us_per_frame,
        |  w::BIGINT AS width, h::BIGINT AS height,
        |  w2::BIGINT AS out_width, h2::BIGINT AS out_height,
        |  (w2 * h2 * 3)::BIGINT AS out_len,
        |  list_reduce(list_prepend(0::BIGINT, bl), (a, c) -> (a * 31 + c) % 2147483647) AS px_hash
        |FROM p ORDER BY media_id, frame_no""".stripMargin,
    // Decoded MP4-MJPEG frames are FLAT gray (doc_id*31 + f*17) % 256, so
    // the resampled raster is that byte repeated out_w*out_h*3 times and
    // the polynomial fold is replayable without any pixel formula — the
    // exactness comes from DC-only JPEG blocks, proven by Mp4CodecSpec.
    "q143_mp4_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, 3 + doc_id % 14 AS w, 3 + (doc_id * 5) % 14 AS h,
        |         2 + doc_id % 4 AS nf, 1000000 // (5 + doc_id % 10) AS uspf
        |  FROM documents WHERE doc_id % 3 = 1),
        | s AS (SELECT media_id, w, h, nf, uspf, greatest(w, h) AS longest FROM m),
        | d AS (
        |  SELECT media_id, w, h, nf, uspf,
        |    CASE WHEN longest <= 8 THEN w ELSE greatest(1, (w * 8 + longest - 1) // longest) END AS w2,
        |    CASE WHEN longest <= 8 THEN h ELSE greatest(1, (h * 8 + longest - 1) // longest) END AS h2
        |  FROM s),
        | f AS (SELECT media_id, w, h, nf, uspf, w2, h2, unnest(range(0, nf)) AS fno FROM d),
        | p AS (
        |  SELECT media_id, fno, nf, uspf, w, h, w2, h2,
        |    list_transform(range(0, w2 * h2 * 3), i ->
        |      ((media_id * 31 + fno * 17) % 256)::BIGINT) AS bl
        |  FROM f)
        |SELECT media_id, fno::BIGINT AS frame_no, nf::BIGINT AS n_frames,
        |  uspf::BIGINT AS us_per_frame,
        |  w::BIGINT AS width, h::BIGINT AS height,
        |  w2::BIGINT AS out_width, h2::BIGINT AS out_height,
        |  (w2 * h2 * 3)::BIGINT AS out_len,
        |  list_reduce(list_prepend(0::BIGINT, bl), (a, c) -> (a * 31 + c) % 2147483647) AS px_hash
        |FROM p ORDER BY media_id, frame_no""".stripMargin,
    // Real rows: the q115 formula-pixel replay at maxSide=10. Stub rows:
    // the q60 header byte lists (PNG 29, GIF 13, JPEG 39, BMP 50 bytes)
    // subsampled every k-th byte; both payloads hashed with the shared
    // polynomial fold. All math is integer — no float boundary anywhere.
    "q67_media_resize" ->
      """WITH rm AS (
        |  SELECT doc_id AS media_id, 3 + doc_id % 14 AS w, 3 + (doc_id * 7) % 14 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        | rs AS (SELECT media_id, w, h, greatest(w, h) AS longest FROM rm),
        | rd AS (
        |  SELECT media_id, w, h,
        |    CASE WHEN longest <= 10 THEN w ELSE greatest(1, (w * 10 + longest - 1) // longest) END AS w2,
        |    CASE WHEN longest <= 10 THEN h ELSE greatest(1, (h * 10 + longest - 1) // longest) END AS h2
        |  FROM rs),
        | rp AS (
        |  SELECT media_id, w, h, w2, h2,
        |    flatten(list_transform(range(0, h2), y2 ->
        |      flatten(list_transform(range(0, w2), x2 ->
        |        list_transform(range(0, 3), c ->
        |          ((media_id * 31 + ((x2 * w) // w2) * 7 + ((y2 * h) // h2) * 13 + c * 5) % 256)::BIGINT))))) AS bl
        |  FROM rd),
        | realrows AS (
        |  SELECT media_id, 1::BIGINT AS real_decode, w::BIGINT AS width, h::BIGINT AS height,
        |    w2::BIGINT AS out_width, h2::BIGINT AS out_height, (w2 * h2 * 3)::BIGINT AS out_bytes,
        |    list_reduce(list_prepend(0::BIGINT, bl), (a, c) -> (a * 31 + c) % 2147483647) AS px_hash
        |  FROM rp),
        | hm AS (
        |  SELECT doc_id AS media_id, 1 + doc_id % 512 AS w, 1 + (doc_id * 7) % 512 AS h,
        |    (doc_id % 12 = 0) AS is_png, (doc_id % 12 = 6) AS is_gif, (doc_id % 12 = 3) AS is_jpeg
        |  FROM documents WHERE doc_id % 3 = 0),
        | hb AS (
        |  SELECT media_id, w, h,
        |    CASE
        |      WHEN is_png THEN
        |        [137,80,78,71,13,10,26,10, 0,0,0,13, 73,72,68,82,
        |         w // 16777216 % 256, w // 65536 % 256, w // 256 % 256, w % 256,
        |         h // 16777216 % 256, h // 65536 % 256, h // 256 % 256, h % 256,
        |         8,2,0,0,0]
        |      WHEN is_gif THEN
        |        [71,73,70,56,57,97, w % 256, w // 256 % 256, h % 256, h // 256 % 256, 247,0,0]
        |      WHEN is_jpeg THEN
        |        [255,216, 255,224,0,16, 74,70,73,70,0, 1,1, 0, 0,1, 0,1, 0,0,
        |         255,192,0,17,8, h // 256 % 256, h % 256, w // 256 % 256, w % 256,
        |         3, 1,34,0, 2,17,1, 3,17,1]
        |      ELSE
        |        [66,77, 54,0,0,0, 0,0,0,0, 54,0,0,0, 40,0,0,0,
        |         w % 256, w // 256 % 256, 0, 0,
        |         h % 256, h // 256 % 256, 0, 0,
        |         1,0,24,0] || [0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0]
        |    END AS bl
        |  FROM hm),
        | hs AS (SELECT media_id, w, h, bl, greatest(w, h) AS longest FROM hb),
        | hf AS (
        |  SELECT media_id, w, h, bl,
        |    CASE WHEN longest <= 10 THEN w ELSE greatest(1, (w * 10 + longest - 1) // longest) END AS w2,
        |    CASE WHEN longest <= 10 THEN h ELSE greatest(1, (h * 10 + longest - 1) // longest) END AS h2
        |  FROM hs),
        | hk AS (SELECT media_id, w, h, w2, h2, bl,
        |          greatest(1, (w * h) // (w2 * h2)) AS kk FROM hf),
        | hsub AS (
        |  SELECT media_id, w, h, w2, h2,
        |    list_transform(range(0, (len(bl) + kk - 1) // kk), j -> bl[(1 + j * kk)::INT]::BIGINT) AS sb
        |  FROM hk),
        | stubrows AS (
        |  SELECT media_id, 0::BIGINT AS real_decode, w::BIGINT AS width, h::BIGINT AS height,
        |    w2::BIGINT AS out_width, h2::BIGINT AS out_height, len(sb)::BIGINT AS out_bytes,
        |    list_reduce(list_prepend(0::BIGINT, sb), (a, c) -> (a * 31 + c) % 2147483647) AS px_hash
        |  FROM hsub)
        |SELECT * FROM (SELECT * FROM realrows UNION ALL SELECT * FROM stubrows)
        |ORDER BY media_id, real_decode""".stripMargin
  )
}
