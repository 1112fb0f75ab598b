package graft.multimodal

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque `content` bytes + typed metadata — the
  * multimodal-column pattern for training-data pipelines (image/audio/video
  * as `binary`, schema'd metadata alongside).
  */
final case class MediaRecord(
    media_id: Long,
    kind: String, // image | audio | video
    mime: String,
    content: Array[Byte]
)

/** Decoded per-object features (the output schema of the decode stage).
  * Fields are kind-specific where noted: `width`/`height` are image
  * dimensions (0 for audio), `sample_rate`/`n_channels` are audio PCM
  * parameters (0 for image/video), `n_frames` is video frames or audio
  * sample frames (1 for images).
  */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    sample_rate: Int,
    n_channels: Int,
    n_frames: Int,
    duration_ms: Long, // media duration: mvhd for video, frames/rate for audio, 0 for images
    feature_hash: Long
)

/** Multimodal column processing: binary content + typed metadata in, decoded
  * features out, via batched `mapPartitions` over a typed Dataset — the
  * Scala analogue of `mapInPandas` (records stream through in bounded
  * batches; a real decoder would hand each batch to native code).
  *
  * ===== STUB BOUNDARY (shrunk again in round 7: MP4 SAMPLE decode is
  * REAL now too — [[Mp4Codec]] recovers per-sample byte spans through the
  * full stsd/stsc/stsz/stco tables and decodes MJPEG samples through the
  * JDK ImageIO codec, value-gated by q143 on flat-gray DC-only frames;
  * MP4/ISO-BMFF container METADATA was already REAL via [[mp4Meta]]'s box
  * walk — video dims, duration, stts frame count, mdat payload span — the
  * resize stage dispatches real pixels through [[PixelCodec]], and AVI
  * VIDEO PIXELS are REAL via [[AviCodec]]: RIFF/AVI container walk +
  * lossless raw-DIB frame decode (value-gated by q128) + MJPEG frames.
  * What remains stubbed is inter-frame codec territory only — H.264/VP9
  * SAMPLE decode, which needs a codec library by any standard — plus the
  * dims fallback for container-less bytes) =====
  * IMAGE dimensions are decoded FOR REAL: [[decodeOne]] dispatches on the
  * container magic and reads PNG IHDR width/height (big-endian at offsets
  * 16/20 after the 8-byte signature + IHDR chunk header), BMP
  * BITMAPINFOHEADER width/height (little-endian at offsets 18/22; negative
  * height = top-down rows ⇒ abs), GIF87a/89a logical-screen dims
  * (little-endian at offsets 6/8), and JPEG SOF0–SOF15 height/width via
  * the standard marker-segment walk ([[jpegDims]] — skips APP/EXIF/comment
  * segments by declared length, no codec needed, works on any real
  * baseline or progressive JPEG). AUDIO is decoded for real too:
  * the synthetic audio rows carry a genuine 44-byte canonical RIFF/WAVE
  * PCM header ([[wavHeader]]) ahead of the payload, and [[decodeOne]]
  * parses channels (LE16 @22), sample rate (LE32 @24), bit depth (LE16
  * @34) and data size (LE32 @40) — the standard fmt/data layout any real
  * PCM WAV file carries — deriving the sample-frame count from
  * `dataSize / (channels * bits/8)`. VIDEO container metadata is decoded
  * for real: the synthetic video rows carry a genuine minimal ISO-BMFF
  * tree ([[mp4Header]]) and [[mp4Meta]] walks ftyp/moov/mvhd/trak/tkhd/
  * mdia/hdlr/stbl/stts — both box versions, vide-handler track selection,
  * 16.16 dims, timescale-normalized duration, stts sample count, mdat
  * span — and BOTH video containers decode to real FRAMES:
  * [[AviCodec.decodeAvi]] for RIFF/AVI and [[Mp4Codec.decodeMp4]] for
  * MJPEG samples addressed through the real stsc/stsz/stco tables (the
  * q60 corpus keeps header-only MP4s, so q65's fixed-size mdat windows
  * remain the documented fallback for containers WITHOUT sample tables).
  * What REMAINS stubbed: inter-frame codec samples (H.264/VP9) and the
  * dims fallback for container-less bytes.
  * Everything around the boundary —
  * schema, encoders, batching shape, partition parallelism, the query
  * surface — is real, and every path is a pure byte function so the driver
  * oracle-checks the whole pipeline in SQL.
  *
  * Scale notes: decode is embarrassingly parallel and CPU-bound — at 100 TB
  * you repartition by size (`maxPartitionBytes`) not by row count, keep
  * batches small enough for decoder memory, and never collect. The binary
  * column rides parquet as-is; parquet page-level column pruning means
  * metadata-only queries never read the bytes.
  */
object MediaPipeline {

  /** Batch size for the decode stage (the `mapInPandas` arrow-batch twin):
    * bounds decoder memory per task regardless of partition size.
    */
  val DecodeBatchSize = 64

  private val Kinds = Seq("image", "audio", "video")

  /** Synthesize a media table from `documents`. Image rows (doc_id % 3 == 0)
    * carry GENUINE container headers — PNG (doc_id % 12 == 0), GIF
    * (doc_id % 12 == 6), JPEG (doc_id % 12 == 3) or BMP (otherwise) with
    * dimensions derived from doc_id, so the real header parsers in
    * [[decodeOne]] are what the oracle checks. Audio/video rows carry the
    * UTF-8 text bytes (the only payload bytes available in the harness),
    * treated as opaque.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        Kinds((id % 3).toInt) match {
          case "image" =>
            val w = (1 + id % 512).toInt
            val h = (1 + (id * 7) % 512).toInt
            if (id % 12 == 0) MediaRecord(id, "image", "image/png", pngHeader(w, h))
            else if (id % 12 == 6) MediaRecord(id, "image", "image/gif", gifHeader(w, h))
            else if (id % 12 == 3) MediaRecord(id, "image", "image/jpeg", jpegHeader(w, h))
            else MediaRecord(id, "image", "image/bmp", bmpHeader(w, h))
          case "audio" =>
            val data = text.getBytes("UTF-8")
            val rate = 8000 + (id % 8).toInt * 1000
            val ch   = 1 + (id % 2).toInt
            MediaRecord(id, "audio", "audio/wav", wavHeader(rate, ch, 16, data.length) ++ data)
          case "video" =>
            // a REAL (minimal) ISO-BMFF container: ftyp + moov(mvhd +
            // trak(tkhd + mdia(mdhd + hdlr + minf(stbl(stts))))) + mdat,
            // with the text bytes as the mdat payload — the box walk in
            // [[mp4Meta]] is what the oracle checks
            val data = text.getBytes("UTF-8")
            val vw   = 16 * (1 + id % 40).toInt
            val vh   = 16 * (1 + (id * 3) % 40).toInt
            val dur  = (1000 + id % 9000).toInt
            val ns   = (10 + id % 290).toInt
            MediaRecord(id, "video", "video/mp4", mp4Header(vw, vh, dur, ns, data.length) ++ data)
        }
      }
  }

  /** A second synthetic corpus whose image rows are COMPLETE, REAL files —
    * pixels included — for the real-pixel decode path ([[PixelCodec]]):
    * PNG (doc_id % 6 == 0; every encoder row filter 0–4 appears, so the
    * decoder's unfilter branches all run), bottom-up BMP (doc_id % 12 ==
    * 3) and top-down BMP (doc_id % 12 == 9). Dimensions are kept small
    * (3–16 px) so the per-byte SQL oracle stays cheap; the PIXELS are a
    * pure (doc_id, x, y, channel) formula, which is what lets the driver
    * check the decoded-and-resampled bytes BY VALUE even though the PNG
    * container bytes themselves are zlib output no SQL oracle could
    * rebuild.
    */
  def mediaWithPixels(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables
      .documents(spark, sfDir)
      .select(col("doc_id"))
      .as[Long]
      .filter(_ % 3 == 0)
      .map { id =>
        val w   = (3 + id % 14).toInt
        val h   = (3 + (id * 7) % 14).toInt
        val rgb = formulaPixels(id, w, h)
        if (id % 6 == 0) MediaRecord(id, "image", "image/png", PixelCodec.encodePng(w, h, rgb))
        else if (id % 12 == 3)
          MediaRecord(id, "image", "image/bmp", PixelCodec.encodeBmp(w, h, rgb, topDown = false))
        else MediaRecord(id, "image", "image/bmp", PixelCodec.encodeBmp(w, h, rgb, topDown = true))
      }
  }

  /** The deterministic pixel formula behind [[mediaWithPixels]] — mirrored
    * verbatim by q115's DuckDB oracle.
    */
  def formulaPixels(id: Long, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3) { i =>
      val c = i % 3
      val x = (i / 3) % w
      val y = i / (3 * w)
      ((id * 31 + x * 7 + y * 13 + c * 5) % 256).toByte
    }

  /** Per-FRAME pixel formula behind [[mediaWithVideoFrames]] — the q115
    * formula with a frame term, mirrored verbatim by q128's DuckDB oracle.
    */
  def videoFormulaPixels(id: Long, f: Int, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3) { i =>
      val c = i % 3
      val x = (i / 3) % w
      val y = i / (3 * w)
      ((id * 31 + f * 17 + x * 7 + y * 13 + c * 5) % 256).toByte
    }

  /** A VIDEO corpus whose rows are COMPLETE, REAL files — frames included:
    * raw-DIB RIFF/AVI containers ([[AviCodec.encodeAvi]] — 'vids' stream
    * header, BITMAPINFOHEADER, bottom-up padded BGR '00db' frame chunks).
    * Raw-DIB is lossless, so q128 value-checks the decoded-and-resampled
    * frame bytes the way q115 does for images; dims stay small (3–16 px,
    * 2–5 frames) so the per-byte SQL oracle stays cheap. The PIXELS are a
    * pure (doc_id, frame, x, y, channel) formula
    * ([[videoFormulaPixels]]) — what lets the driver check real container
    * decode BY VALUE even though the AVI bytes carry stride padding and
    * BGR order no naive oracle would guess.
    */
  def mediaWithVideoFrames(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables
      .documents(spark, sfDir)
      .select(col("doc_id"))
      .as[Long]
      .filter(_ % 3 == 2)
      .map { id =>
        val w      = (3 + id % 14).toInt
        val h      = (3 + (id * 5) % 14).toInt
        val nf     = (2 + id % 4).toInt
        val fps    = (5 + id % 10).toInt
        val frames = (0 until nf).map(f => videoFormulaPixels(id, f, w, h))
        MediaRecord(id, "video", "video/x-msvideo", AviCodec.encodeAvi(w, h, fps, frames))
      }
  }

  /** A VIDEO corpus whose rows are COMPLETE, REAL MP4 files — MJPEG
    * samples addressed through FULL sample tables
    * ([[Mp4Codec.encodeMp4Mjpeg]]: stsd 'jpeg' entry, stts, run-length
    * stsc, per-sample stsz, absolute stco offsets). Frames are FLAT
    * grayscale — gray `(doc_id·31 + f·17) % 256` — because a flat 8×8
    * block is DC-only and survives the lossy JPEG round-trip bit-exactly
    * (Mp4CodecSpec proves it at all 256 levels), which is what lets q143
    * value-check DECODED MJPEG sample pixels in SQL: a wrong stsc/stsz/
    * stco walk slices a non-JPEG byte span (row drops ⇒ count mismatch), a
    * wrong decode or resample changes the hash. `samplesPerChunk` varies
    * by row so single-chunk, uniform, and short-last-chunk stsc maps all
    * occur in the corpus.
    */
  def mediaWithMp4Frames(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables
      .documents(spark, sfDir)
      .select(col("doc_id"))
      .as[Long]
      .filter(_ % 3 == 1)
      .map { id =>
        val w   = (3 + id % 14).toInt
        val h   = (3 + (id * 5) % 14).toInt
        val nf  = (2 + id % 4).toInt
        val fps = (5 + id % 10).toInt
        val spc = (1 + id % 3).toInt
        val samples = (0 until nf).map { f =>
          val g = ((id * 31 + f * 17) % 256).toByte
          PixelCodec.encodeGrayJpeg(w, h, Array.fill(w * h)(g))
        }
        MediaRecord(id, "video", "video/mp4", Mp4Codec.encodeMp4Mjpeg(w, h, fps, samples, spc))
      }
  }

  /** REAL video-pixel path, end to end: container walk + frame decode —
    * dispatched on the container magic to [[AviCodec.decodeAvi]] (DIB rows
    * or ImageIO MJPEG) or [[Mp4Codec.decodeMp4]] (MJPEG samples addressed
    * through the real stsc/stsz/stco tables) — then per-frame
    * aspect-preserving fit + nearest resample, and the polynomial hash of
    * each frame's resampled RGB bytes. Rows that don't decode are DROPPED
    * (flatMap) so a lost container surfaces as an oracle row-count
    * mismatch. Same batched-mapPartitions shape — and therefore the same
    * 100 TB behavior — as [[extractFeatures]].
    */
  def videoFramePixels(media: Dataset[MediaRecord], maxSide: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap {
          _.flatMap { m =>
            val video: Option[(Long, Vector[PixelImage])] =
              if (AviCodec.isAvi(m.content))
                AviCodec.decodeAvi(m.content).map(v => (v.usPerFrame, v.frames))
              else if (Mp4Codec.isMp4(m.content))
                Mp4Codec.decodeMp4(m.content).map(v => (v.usPerFrame, v.frames))
              else None
            video.toSeq.flatMap { case (uspf, frames) =>
              frames.zipWithIndex.map { case (img, f) =>
                val out = PixelCodec.fitNearest(img, maxSide)
                (m.media_id, f, frames.size, uspf, img.width, img.height,
                  out.width, out.height, out.rgb.length, polyHash(out.rgb))
              }
            }
          }
        }
      }
      .toDF("media_id", "frame_no", "n_frames", "us_per_frame", "width", "height",
        "out_width", "out_height", "out_len", "px_hash")
  }

  /** The one byte-sequence hash every value gate uses (feature hash, q115
    * pixel hash, q67 payload hash): a mod-2^31−1 polynomial fold the SQL
    * oracles replay with `list_reduce`.
    */
  private[multimodal] def polyHash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 2147483647L; i += 1 }
    h
  }

  /** REAL pixel path, end to end: decode ([[PixelCodec.decodePixels]] —
    * PNG inflate+unfilter / BMP row reads), aspect-preserving fit, REAL
    * nearest-neighbor resample, and a polynomial hash of the resampled RGB
    * bytes so the result is value-checkable. Rows whose content doesn't
    * decode are DROPPED (flatMap) — on the [[mediaWithPixels]] corpus every
    * row decodes, so a lost row surfaces as an oracle row-count mismatch
    * rather than passing silently. Same batched-mapPartitions shape (and
    * therefore the same 100 TB behavior) as [[extractFeatures]].
    */
  def resizePixels(media: Dataset[MediaRecord], maxSide: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap {
          _.flatMap { m =>
            PixelCodec.decodePixels(m.content).map { img =>
              val out = PixelCodec.fitNearest(img, maxSide)
              (m.media_id, img.width, img.height, out.width, out.height, out.rgb.length,
                polyHash(out.rgb))
            }
          }
        }
      }
      .toDF("media_id", "width", "height", "out_width", "out_height", "out_len", "px_hash")
  }

  /** PNG signature + IHDR chunk data (length, type, width/height big-endian,
    * bit depth 8, truecolor, deflate, adaptive filter, no interlace) — the
    * 29-byte prefix every valid PNG starts with; the IHDR CRC and pixel data
    * are omitted (dimension decode never reads them).
    */
  def pngHeader(w: Int, h: Int): Array[Byte] =
    (Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 0, 0, 0, 13, 'I', 'H', 'D', 'R')
      .map(_.toByte)
      ++ beBytes(w) ++ beBytes(h) ++ Array[Byte](8, 2, 0, 0, 0))

  /** BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes) with
    * width/height little-endian at offsets 18/22 — the standard 54-byte BMP
    * preamble; pixel array omitted.
    */
  def bmpHeader(w: Int, h: Int): Array[Byte] =
    (Array('B'.toByte, 'M'.toByte) ++ leBytes(54) ++ leBytes(0) ++ leBytes(54) ++ leBytes(40)
      ++ leBytes(w) ++ leBytes(h)
      ++ Array[Byte](1, 0, 24, 0) ++ Array.fill[Byte](20)(0))

  /** Canonical 44-byte RIFF/WAVE PCM header: RIFF chunk (size = 36 + data),
    * `fmt ` subchunk (PCM, channels/rate/byte-rate/block-align/bits), `data`
    * subchunk header. Exactly the layout `ffmpeg -f wav` or any recorder
    * emits for plain PCM.
    */
  def wavHeader(sampleRate: Int, channels: Int, bits: Int, dataSize: Int): Array[Byte] = {
    val byteRate   = sampleRate * channels * bits / 8
    val blockAlign = channels * bits / 8
    ("RIFF".getBytes("US-ASCII") ++ leBytes(36 + dataSize)
      ++ "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++ leBytes(16)
      ++ Array[Byte](1, 0) ++ Array[Byte](channels.toByte, (channels >>> 8).toByte)
      ++ leBytes(sampleRate) ++ leBytes(byteRate)
      ++ Array[Byte](blockAlign.toByte, (blockAlign >>> 8).toByte)
      ++ Array[Byte](bits.toByte, (bits >>> 8).toByte)
      ++ "data".getBytes("US-ASCII") ++ leBytes(dataSize))
  }

  /** Minimal-but-real JPEG/JFIF prefix: SOI, an APP0/JFIF segment (so the
    * dimension walk must actually SKIP a marker segment by its declared
    * length before reaching the frame header), then a baseline SOF0 with
    * height/width big-endian and three components — byte-for-byte the
    * layout every camera/encoder emits; entropy-coded data is omitted
    * (dimension decode stops at SOF).
    */
  def jpegHeader(w: Int, h: Int): Array[Byte] =
    (Array(0xff, 0xd8)                                        // SOI
      ++ Array(0xff, 0xe0, 0x00, 0x10)                        // APP0, length 16
      ++ "JFIF".getBytes("US-ASCII").map(_.toInt)
      ++ Array(0x00, 0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00)
      ++ Array(0xff, 0xc0, 0x00, 0x11, 0x08,                  // SOF0, length 17, 8-bit
        (h >>> 8) & 0xff, h & 0xff, (w >>> 8) & 0xff, w & 0xff,
        0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01))
      .map(_.toByte)

  /** Minimal-but-REAL ISO-BMFF (MP4) container prefix: `ftyp`, then a
    * `moov` holding `mvhd` (timescale 1000 ⇒ duration field is
    * milliseconds) and one video `trak` — `tkhd` with 16.16 fixed-point
    * width/height, `mdia/mdhd`, `mdia/hdlr` declaring the `vide` handler,
    * and `mdia/minf/stbl/stts` with one (sample_count, delta) entry —
    * then the `mdat` header (caller appends the payload). Every box is a
    * length-prefixed big-endian struct at its standards-defined offsets,
    * so [[mp4Meta]]'s generic box walk (not offset guessing) is what gets
    * exercised. 353 bytes before the payload.
    */
  def mp4Header(w: Int, h: Int, durMs: Int, nSamples: Int, dataSize: Int): Array[Byte] = {
    def ascii(s: String)    = s.getBytes("US-ASCII")
    def box(t: String, body: Array[Byte]) = beBytes(8 + body.length) ++ ascii(t) ++ body
    // unity transform matrix (16.16 / 2.30 fixed): diag(1, 1, 1)
    val matrix = beBytes(0x10000) ++ Array.fill[Byte](12)(0) ++ beBytes(0x10000) ++
      Array.fill[Byte](12)(0) ++ beBytes(0x40000000)
    val mvhd = box("mvhd",
      beBytes(0) ++ beBytes(0) ++ beBytes(0) ++ beBytes(1000) ++ beBytes(durMs) ++
        beBytes(0x10000) ++ Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](8)(0) ++ matrix ++
        Array.fill[Byte](24)(0) ++ beBytes(2))
    val tkhd = box("tkhd",
      Array[Byte](0, 0, 0, 7) ++ beBytes(0) ++ beBytes(0) ++ beBytes(1) ++ beBytes(0) ++
        beBytes(durMs) ++ Array.fill[Byte](16)(0) ++ matrix ++
        Array[Byte]((w >>> 8).toByte, w.toByte, 0, 0, (h >>> 8).toByte, h.toByte, 0, 0))
    val mdhd = box("mdhd",
      beBytes(0) ++ beBytes(0) ++ beBytes(0) ++ beBytes(1000) ++ beBytes(durMs) ++
        Array[Byte](0x55, 0xc4.toByte, 0, 0))
    val hdlr = box("hdlr",
      beBytes(0) ++ beBytes(0) ++ ascii("vide") ++ Array.fill[Byte](12)(0) ++ Array[Byte](0))
    val stts = box("stts", beBytes(0) ++ beBytes(1) ++ beBytes(nSamples) ++ beBytes(100))
    val moov = box("moov", mvhd ++ box("trak", tkhd ++ box("mdia", mdhd ++ hdlr ++
      box("minf", box("stbl", stts)))))
    val ftyp = box("ftyp", ascii("isom") ++ beBytes(0x200))
    ftyp ++ moov ++ beBytes(8 + dataSize) ++ ascii("mdat")
  }

  /** Parsed MP4 metadata: presentation dims from the video track's `tkhd`,
    * duration from `mvhd` (normalized to ms via its own timescale), sample
    * (frame) count from `stts`, and the `mdat` payload span.
    */
  private[multimodal] final case class Mp4Meta(
      width: Int,
      height: Int,
      durationMs: Long,
      nSamples: Long,
      mdatOff: Int,
      mdatLen: Int
  )

  /** REAL ISO-BMFF metadata walk — the standard length-prefixed box
    * traversal every MP4 tool performs, JDK-only: top-level boxes (64-bit
    * `largesize` and size-0 run-to-end handled), `moov/mvhd` version 0 AND
    * 1 layouts for timescale/duration, per-`trak` `tkhd` (v0/v1) for the
    * 16.16 width/height, `mdia/hdlr` to pick the `vide` track when several
    * tracks exist, `stbl/stts` sample-count sum for the frame count, and
    * the `mdat` span for payload access. Returns None — callers fall back
    * to the stub — on anything malformed: no leading `ftyp`, a box
    * overrunning its parent, no `moov`, or no usable video dims. What
    * remains codec territory is SAMPLE decode (video pixels); the
    * container structure is plain struct walking, the same family as the
    * PNG/GIF/WAV parses.
    */
  private[multimodal] def mp4Meta(b: Array[Byte]): Option[Mp4Meta] = {
    if (b.length < 16) return None
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    def beLong(off: Int): Long =
      ((beInt(b, off).toLong & 0xffffffffL) << 32) | (beInt(b, off + 4).toLong & 0xffffffffL)
    def beUInt(off: Int): Long = beInt(b, off).toLong & 0xffffffffL
    // walk boxes in [off0, end); false on structural corruption
    def boxes(off0: Int, end: Int)(f: (String, Int, Int) => Unit): Boolean = {
      var off = off0
      while (off + 8 <= end) {
        val size32 = beInt(b, off)
        var hdr    = 8
        val size: Long =
          if (size32 == 1) { if (off + 16 > end) return false; hdr = 16; beLong(off + 8) }
          else if (size32 == 0) (end - off).toLong
          else size32.toLong
        if (size < hdr || off + size > end) return false
        f(new String(b, off + 4, 4, "US-ASCII"), off + hdr, (off + size).toInt)
        off = (off + size).toInt
      }
      off == end
    }
    var w = 0; var hgt = 0
    var durMs    = -1L
    var frames   = 0L
    var mdatOff  = -1
    var mdatLen  = 0
    var sawMoov  = false
    val ok = boxes(0, b.length) { (t, s, e) =>
      if (t == "mdat" && mdatOff < 0) { mdatOff = s; mdatLen = e - s }
      if (t == "moov" && !sawMoov) {
        sawMoov = true
        boxes(s, e) { (t2, s2, e2) =>
          if (t2 == "mvhd" && e2 - s2 >= 20) {
            val v1 = (b(s2) & 0xff) == 1
            val ts = if (v1) beUInt(s2 + 20) else beUInt(s2 + 12)
            val du = if (v1 && e2 - s2 >= 32) beLong(s2 + 24) else beUInt(s2 + 16)
            if (ts > 0) durMs = du * 1000L / ts
          }
          if (t2 == "trak" && w == 0) {
            var tw = 0; var th = 0; var handler = ""; var cnt = 0L
            boxes(s2, e2) { (t3, s3, e3) =>
              if (t3 == "tkhd") {
                // width/height sit after ver/flags + times/ids + reserved +
                // layer/group/volume + matrix; v1 widens the three times
                val base = s3 + 4 + (if ((b(s3) & 0xff) == 1) 32 else 20) + 16 + 36
                if (base + 8 <= e3) { tw = beShort(b, base); th = beShort(b, base + 4) }
              }
              if (t3 == "mdia") boxes(s3, e3) { (t4, s4, e4) =>
                if (t4 == "hdlr" && s4 + 12 <= e4)
                  handler = new String(b, s4 + 8, 4, "US-ASCII")
                if (t4 == "minf") boxes(s4, e4) { (t5, s5, e5) =>
                  if (t5 == "stbl") boxes(s5, e5) { (t6, s6, e6) =>
                    if (t6 == "stts" && s6 + 8 <= e6) {
                      val n   = beInt(b, s6 + 4)
                      var i   = 0
                      var tot = 0L
                      while (i < n && s6 + 8 + 8 * i + 4 <= e6) {
                        tot += beUInt(s6 + 8 + 8 * i); i += 1
                      }
                      cnt = tot
                    }
                  }
                }
              }
            }
            // a non-video track (e.g. an audio trak listed first) must not
            // claim the dims: require the vide handler, or no handler box
            // at all (header-only test containers) with real dims
            if ((handler == "vide" || handler.isEmpty) && tw > 0 && th > 0) {
              w = tw; hgt = th; frames = cnt
            }
          }
        }
      }
    }
    if (!ok || !sawMoov || w <= 0 || hgt <= 0) None
    else Some(Mp4Meta(w, hgt, math.max(0L, durMs), frames, mdatOff, mdatLen))
  }

  /** GIF89a header + logical screen descriptor: 6-byte signature, canvas
    * width/height little-endian at offsets 6/8, then the packed flags /
    * background / aspect bytes — the 13-byte prefix every GIF file starts
    * with (image data sub-blocks omitted; dimension decode never reads
    * them).
    */
  def gifHeader(w: Int, h: Int): Array[Byte] =
    ("GIF89a".getBytes("US-ASCII")
      ++ Array[Byte](w.toByte, (w >>> 8).toByte, h.toByte, (h >>> 8).toByte)
      ++ Array[Byte](0xf7.toByte, 0, 0))

  private def beBytes(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def leBytes(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 &&
      b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 26 && b(0) == 'B' && b(1) == 'M'

  /** GIF87a or GIF89a signature — both carry the canvas dims at 6/8. */
  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 &&
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** True only for the canonical 44-byte PCM layout this parser reads:
    * RIFF/WAVE magics AND the `fmt ` subchunk at offset 12 AND the `data`
    * subchunk header at offset 36. Non-canonical real-world WAVs
    * (WAVE_FORMAT_EXTENSIBLE's 40-byte fmt, LIST/INFO chunks before
    * `data`) put other bytes at those offsets; reading them as PCM params
    * would yield garbage, so they take the stub fallback instead. A full
    * decoder walks the chunk list — that is codec-library territory.
    */
  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E' &&
      b(12) == 'f' && b(13) == 'm' && b(14) == 't' && b(15) == ' ' &&
      leInt(b, 16) == 16 && // PCM fmt chunk size — extensible (40) falls back
      b(36) == 'd' && b(37) == 'a' && b(38) == 't' && b(39) == 'a'

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def beShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** JPEG height/width via the standard marker-segment walk — a pure byte
    * scan, no codec: from SOI, skip each segment by its declared big-endian
    * length (APP0/EXIF/quant tables/comments — whatever the encoder wrote)
    * until a frame header SOF0–SOF15 (excluding DHT 0xC4, JPG 0xC8, DAC
    * 0xCC, which reuse the 0xC? range but aren't frames), then read
    * height (BE16 @ payload+3) and width (BE16 @ payload+5). Works on
    * baseline AND progressive (SOF2) files. Returns None — caller falls
    * back to the stub — on anything malformed: no SOI, a non-marker byte
    * where a marker belongs, SOS/EOI before any SOF, or truncation.
    */
  private[multimodal] def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      var j = i
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // marker + fill bytes
      if (j >= b.length) return None
      val m = b(j) & 0xff
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
        return if (j + 8 <= b.length) Some((beShort(b, j + 6), beShort(b, j + 4))) else None
      if (m == 0xda || m == 0xd9) return None // SOS/EOI reached without a frame header
      if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) i = j + 1 // standalone markers: no length field
      else {
        if (j + 3 > b.length) return None
        i = j + 1 + beShort(b, j + 1) // skip segment: length includes its own 2 bytes
      }
    }
    None
  }

  /** JPEG + EXIF APP1 segment: SOI, then an APP1 carrying a REAL TIFF
    * block — byte-order mark (II little-endian or MM big-endian), 42
    * magic, IFD0 with an Orientation SHORT entry (tag 0x0112, inline
    * value) and a Make ASCII entry (tag 0x010F, value stored at an offset
    * past the IFD, NUL-terminated — the out-of-line layout every camera
    * uses for strings), then the standard JFIF APP0 + SOF0 tail so the
    * dimension walk ([[jpegDims]]) must skip the EXIF segment by its
    * declared length on the way to the frame header.
    */
  def exifHeader(w: Int, h: Int, orientation: Int, make: String, bigEndian: Boolean): Array[Byte] = {
    def u16(v: Int): Array[Byte] =
      if (bigEndian) Array((v >>> 8).toByte, v.toByte) else Array(v.toByte, (v >>> 8).toByte)
    def u32(v: Int): Array[Byte] =
      if (bigEndian) Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      else Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    val makeBytes = make.getBytes("US-ASCII") :+ 0.toByte
    // TIFF value rule: a value that fits the 4-byte field is stored
    // INLINE (zero-padded); otherwise the field holds an offset from the
    // TIFF base. header(8) + count(2) + 2 entries(24) + next-IFD(4) = 38.
    val bom    = if (bigEndian) Array[Byte](0x4d, 0x4d) else Array[Byte](0x49, 0x49)
    val inline = makeBytes.length <= 4
    val makeField =
      if (inline) makeBytes ++ Array.fill[Byte](4 - makeBytes.length)(0) else u32(38)
    val tiff = bom ++ u16(42) ++ u32(8) ++
      u16(2) ++
      (u16(0x010f) ++ u16(2) ++ u32(makeBytes.length) ++ makeField) ++
      (u16(0x0112) ++ u16(3) ++ u32(1) ++ (u16(orientation) ++ Array[Byte](0, 0))) ++
      u32(0) ++ (if (inline) Array.emptyByteArray else makeBytes)
    val exifBody = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val app1 = Array(0xff.toByte, 0xe1.toByte,
      (((exifBody.length + 2) >>> 8) & 0xff).toByte, ((exifBody.length + 2) & 0xff).toByte) ++ exifBody
    // SOI + APP1 + the standard JFIF/SOF0 tail (jpegHeader minus its SOI)
    Array(0xff.toByte, 0xd8.toByte) ++ app1 ++ jpegHeader(w, h).drop(2)
  }

  /** REAL EXIF walk — the TIFF IFD traversal every metadata tool performs,
    * JDK-only and endian-correct: locate the APP1/Exif segment via the
    * standard marker walk, honor the II/MM byte-order mark and 42 magic,
    * follow the IFD0 offset, and read Orientation (SHORT, inline value)
    * and Make (ASCII, inline when count ≤ 4 else offset-addressed,
    * trailing NUL dropped). Returns None — callers fall back — on
    * anything malformed: no APP1, wrong BOM/magic, an entry or string
    * overrunning the segment.
    */
  private[multimodal] def jpegExif(b: Array[Byte]): Option[(Int, String)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    // marker walk to APP1 "Exif\0\0"
    var i = 2
    var tOff = -1; var tEnd = -1
    while (i + 3 < b.length && tOff < 0) {
      if ((b(i) & 0xff) != 0xff) return None
      val m   = b(i + 1) & 0xff
      if (m == 0xda || m == 0xd9) return None // image data / end: no EXIF
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (i + 2 + len > b.length) return None
      if (m == 0xe1 && len >= 16 &&
        b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' && b(i + 7) == 'f' &&
        b(i + 8) == 0 && b(i + 9) == 0) { tOff = i + 10; tEnd = i + 2 + len }
      i += 2 + len
    }
    if (tOff < 0) return None
    val be = (b(tOff) & 0xff) == 0x4d && (b(tOff + 1) & 0xff) == 0x4d
    if (!be && !((b(tOff) & 0xff) == 0x49 && (b(tOff + 1) & 0xff) == 0x49)) return None
    def r16(o: Int): Int =
      if (be) ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
      else ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
    def r32(o: Int): Int =
      if (be) ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
      else ((b(o + 3) & 0xff) << 24) | ((b(o + 2) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
    if (r16(tOff + 2) != 42) return None
    val ifd0 = tOff + r32(tOff + 4)
    if (ifd0 + 2 > tEnd) return None
    val n = r16(ifd0)
    var orientation = -1
    var make: String = null
    var e = 0
    while (e < n) {
      val o = ifd0 + 2 + 12 * e
      if (o + 12 > tEnd) return None
      val tag = r16(o)
      if (tag == 0x0112 && r16(o + 2) == 3) orientation = r16(o + 8)
      if (tag == 0x010f && r16(o + 2) == 2) {
        val cnt = r32(o + 4)
        val s   = if (cnt <= 4) o + 8 else tOff + r32(o + 8)
        if (cnt < 1 || s + cnt > tEnd) return None
        make = new String(b, s, cnt - 1, "US-ASCII") // drop the trailing NUL
      }
      e += 1
    }
    if (orientation < 0 || make == null) None else Some((orientation, make))
  }

  /** A JPEG+EXIF corpus (image ids): real APP1/TIFF blocks, BOTH byte
    * orders (even ids MM, odd II), formula-derived orientation/make the
    * q138 oracle replays.
    */
  def mediaWithExif(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables
      .documents(spark, sfDir)
      .select(col("doc_id"))
      .as[Long]
      .filter(_ % 3 == 0)
      .map { id =>
        val w = (8 + id % 64).toInt
        val h = (8 + (id * 3) % 64).toInt
        MediaRecord(id, "image", "image/jpeg",
          exifHeader(w, h, (1 + id % 8).toInt, s"cam${id % 5}", bigEndian = id % 2 == 0))
      }
  }

  /** EXIF extraction stage: real marker walk + TIFF IFD read per record,
    * dims via the independent [[jpegDims]] walk (which must skip the EXIF
    * segment correctly to reach SOF0). Undecodable rows drop (flatMap).
    */
  def exifMeta(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap {
          _.flatMap { m =>
            for {
              (ori, make) <- jpegExif(m.content)
              (ww, hh)    <- jpegDims(m.content) // jpegDims yields (width, height)
            } yield (m.media_id, ww, hh, ori, make)
          }
        }
      }
      .toDF("media_id", "width", "height", "orientation", "make")
  }

  /** Decode one record. Image dimensions, WAV PCM parameters, AND MP4
    * container metadata are REAL header reads (PNG IHDR big-endian, BMP
    * info-header little-endian with top-down negative-height handling,
    * JPEG SOF marker walk, RIFF/WAVE little-endian fmt/data fields,
    * ISO-BMFF box walk — [[mp4Meta]] — for video dims/duration/frame
    * count). ===== STUB ===== only for content no container parser
    * recognizes: dimensions fall back to a deterministic byte formula.
    * Every path is a pure byte function, which is what keeps the whole
    * pipeline SQL-oracle-checkable.
    */
  private[multimodal] def decodeOne(m: MediaRecord): MediaFeatures = {
    val bytes = m.content
    val n     = bytes.length.toLong
    var (width, height, rate, channels) = (0, 0, 0, 0)
    var frames = 1
    var durMs  = 0L
    lazy val jpegDim = jpegDims(bytes) // None unless a well-formed SOF is found
    lazy val mp4     = mp4Meta(bytes)  // None unless a well-formed moov/tkhd is found
    // None unless a well-formed hdrl with a vids stream is found
    lazy val avi = if (AviCodec.isAvi(bytes)) AviCodec.meta(bytes) else None
    if (isPng(bytes)) { width = beInt(bytes, 16); height = beInt(bytes, 20) }
    else if (isBmp(bytes)) { width = leInt(bytes, 18); height = math.abs(leInt(bytes, 22)) }
    else if (isGif(bytes)) { width = leShort(bytes, 6); height = leShort(bytes, 8) }
    else if (isWav(bytes)) {
      channels = leShort(bytes, 22)
      rate = leInt(bytes, 24)
      val bits     = leShort(bytes, 34)
      val dataSize = leInt(bytes, 40)
      val bytesPerFrame = math.max(1, channels * bits / 8)
      // clamp to the actual payload (data starts at 44 in the canonical
      // layout): a truncated or lying header must not inflate — or negate —
      // the frame count
      frames = math.max(0, math.min(dataSize, bytes.length - 44)) / bytesPerFrame
      if (rate > 0) durMs = frames.toLong * 1000L / rate
    } else if (avi.isDefined) {
      val v = avi.get
      width = v.width
      height = v.height
      frames = v.nFrames
      durMs = v.durationMs
    } else if (mp4.isDefined) {
      val v = mp4.get
      width = v.width
      height = v.height
      frames = v.nSamples.toInt
      durMs = v.durationMs
    } else if (jpegDim.isDefined) {
      width = jpegDim.get._1
      height = jpegDim.get._2
    } else {
      val first = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val last  = if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else 0
      width = 64 + (first % 64) // STUB fallback — no container recognized
      height = 64 + (last % 64)
      if (m.kind == "video") frames = (1 + n % 30).toInt
    }
    MediaFeatures(m.media_id, m.kind, n, width, height, rate, channels, frames, durMs,
      polyHash(bytes))
  }

  /** Decode stage: batched mapPartitions (each task pulls
    * [[DecodeBatchSize]] records at a time — the decoder-memory contract of
    * `mapInPandas` — and maps them through [[decodeOne]]).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch => batch.map(decodeOne) }
    }
  }

  /** SIGNAL-LEVEL AUDIO FEATURES — windowed RMS energy and zero-crossing
    * rate over the 16-bit PCM sample stream of each WAV row (the cheap
    * "is this silence / noise / speech-like" triage a corpus pipeline runs
    * before an expensive audio model). The channel-interleaved stream is
    * treated as a flat sample sequence (standard for corpus-stat triage).
    * All window aggregates are EXACT integers — sum of squared samples
    * (BIGINT) and crossing counts — so the whole stage is SQL-oracle-able;
    * the only float is the final `sqrt`, which IEEE specifies correctly
    * rounded, so both engines agree bit-for-bit. Rows without the
    * canonical PCM layout are dropped (same contract as [[resizePixels]]).
    * Batched mapPartitions, embarrassingly parallel — the decode-stage
    * scale shape.
    */
  def audioFeatures(media: Dataset[MediaRecord], windowSamples: Int = 100): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter(_.kind == "audio")
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap {
          _.flatMap { m =>
            val b = m.content
            if (!isWav(b)) Iterator.empty
            else {
              val dataSize = leInt(b, 40)
              val nBytes   = math.max(0, math.min(dataSize, b.length - 44))
              val n        = nBytes / 2 // 16-bit samples
              def sample(j: Int): Int = {
                val raw = (b(44 + 2 * j) & 0xff) | ((b(44 + 2 * j + 1) & 0xff) << 8)
                if (raw >= 32768) raw - 65536 else raw
              }
              val nWin = (n + windowSamples - 1) / windowSamples
              (0 until nWin).iterator.map { w =>
                val lo = w * windowSamples
                val hi = math.min(n, lo + windowSamples)
                var ssq  = 0L
                var zc   = 0L
                var j    = lo
                var prev = 0 // carried: each sample decodes exactly once
                while (j < hi) {
                  val s = sample(j)
                  ssq += s.toLong * s
                  // crossing = sign change between adjacent samples of the
                  // SAME window (zero counts as non-negative)
                  if (j > lo && ((prev >= 0) != (s >= 0))) zc += 1
                  prev = s
                  j += 1
                }
                (m.media_id, w, hi - lo, ssq, zc)
              }
            }
          }
        }
      }
      .toDF("media_id", "window_no", "n_samples", "sum_sq", "n_crossings")
  }

  /** AUDIO DOWNSAMPLING by integer-factor decimation — the sample-rate
    * reduction a speech-corpus pipeline runs before feature extraction
    * (16 kHz models over 44.1/48 kHz sources). Channel-aware: whole FRAMES
    * (one sample per channel) are kept every `factor`-th, so interleaved
    * stereo stays aligned; a trailing partial frame is dropped. The output
    * is a complete, REAL new WAV (canonical 44-byte header at rate/factor
    * + the kept frame bytes) and its FILE bytes are hashed, so q135 value-
    * gates the re-encode as well as the decimation. Same batched
    * mapPartitions shape as every decode stage.
    */
  def downsampleAudio(media: Dataset[MediaRecord], factor: Int = 2): DataFrame = {
    require(factor >= 1, s"decimation factor must be >= 1, got $factor")
    import media.sparkSession.implicits._
    media
      .filter(_.kind == "audio")
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap {
          _.flatMap { m =>
            val b = m.content
            // a lying header (0 channels / 0 rate) must fall back like
            // every other decode path, not crash the task on div-by-zero
            if (!isWav(b) || leShort(b, 22) <= 0 || leInt(b, 24) <= 0) None
            else {
              val ch       = leShort(b, 22)
              val rate     = leInt(b, 24)
              val dataSize = leInt(b, 40)
              val nBytes   = math.max(0, math.min(dataSize, b.length - 44))
              val bpf      = ch * 2 // 16-bit samples
              val nf       = nBytes / bpf
              val kept     = 0 until nf by factor
              val payload  = new Array[Byte](kept.size * bpf)
              var o = 0
              kept.foreach { j =>
                System.arraycopy(b, 44 + j * bpf, payload, o, bpf); o += bpf
              }
              val out = wavHeader(rate / factor, ch, 16, payload.length) ++ payload
              Some((m.media_id, rate, rate / factor, nf, kept.size, out.length, polyHash(out)))
            }
          }
        }
      }
      .toDF("media_id", "rate_in", "rate_out", "n_frames_in", "n_frames_out", "out_bytes",
        "file_hash")
  }

  /** Frame sampling for video content: the MEDIA DATA stream — the `mdat`
    * payload located by the real container walk ([[mp4Meta]]); the whole
    * byte stream only when no container parses — is cut into fixed-size
    * "frames" (fixed-size windows — the documented ===== STUB ===== shape
    * for containers WITHOUT sample tables, like the q60 header-only
    * corpus; containers WITH them get real per-sample extraction + pixel
    * decode via [[Mp4Codec]]/q143) and every `everyN`-th frame is
    * kept; returns (media_id, frame_no, frame_bytes) with `frame_no` the
    * original frame index.
    *
    * Memory bound: `grouped` materializes one frame at a time but the input
    * record's full byte array is already in memory (a parquet binary cell),
    * so max media size per ROW is the operative limit — cap it at ingest
    * (e.g. ≤ a few hundred MB) or store large media as chunked rows; a
    * frame row is ≤ `frameSize` bytes regardless.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameSize: Int = 10, everyN: Int = 10): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter(_.kind == "video")
      .flatMap { m =>
        val payload = mp4Meta(m.content) match {
          case Some(v) if v.mdatOff >= 0 => m.content.slice(v.mdatOff, v.mdatOff + v.mdatLen)
          case _                         => m.content
        }
        payload.grouped(frameSize).zipWithIndex.collect {
          case (frame, idx) if idx % everyN == 0 => (m.media_id, idx, frame)
        }
      }
      .toDF("media_id", "frame_no", "frame_bytes")
  }

  /** UNIFIED resize stage for image content — one stage, two paths,
    * dispatched per record on whether the bytes actually decode:
    *
    *   - REAL PIXELS (PNG/BMP via [[PixelCodec]]'s inflate+unfilter / row
    *     reads, JPEG via the JDK's own ImageIO codec): aspect-preserving
    *     fit into `maxSide`, REAL nearest-neighbor resample, and the
    *     resampled RGB payload hashed for the value gate. `real_decode=1`.
    *   - ===== STUB ===== fallback for content no codec reads (header-only
    *     containers, video frames): header dims via [[decodeOne]], the same
    *     fit math, and a deterministic every-k-th-byte subsample of the
    *     content (k = inverse area ratio) standing in for the pixel step —
    *     the subsampled bytes are materialized and hashed under the same
    *     contract, so even the fallback is value-checked. `real_decode=0`.
    *
    * Both paths emit (dims, payload size, payload hash); only the hash of
    * the payload transits the exchange, never the payload itself. Runs
    * through the same batched mapPartitions shape as [[extractFeatures]]
    * (decoder-memory contract). q67 gates BOTH paths by value over a
    * corpus mixing complete files with header-only ones.
    */
  def resizeImages(media: Dataset[MediaRecord], maxSide: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter(_.kind == "image")
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          batch.map { m =>
            PixelCodec.decodePixels(m.content) match {
              case Some(img) =>
                val out = PixelCodec.fitNearest(img, maxSide)
                (m.media_id, 1L, img.width, img.height, out.width, out.height,
                  out.rgb.length.toLong, polyHash(out.rgb))
              case None =>
                val f = decodeOne(m)
                // aspect-preserving fit: scale = maxSide / longest side
                // (never upscale); ceil keeps 1 <= side <= maxSide
                val longest = math.max(f.width, f.height)
                val (w2, h2) =
                  if (longest <= maxSide) (f.width, f.height)
                  else (
                    math.max(1, (f.width.toLong * maxSide + longest - 1) / longest).toInt,
                    math.max(1, (f.height.toLong * maxSide + longest - 1) / longest).toInt
                  )
                val k = math.max(
                  1L,
                  (f.width.toLong * f.height) / math.max(1L, w2.toLong * h2)
                ).toInt
                val sub = Array.range(0, m.content.length, k).map(m.content(_))
                (m.media_id, 0L, f.width, f.height, w2, h2, sub.length.toLong, polyHash(sub))
            }
          }
        }
      }
      .toDF("media_id", "real_decode", "width", "height", "out_width", "out_height",
        "out_bytes", "px_hash")
  }
}
