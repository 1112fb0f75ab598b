package graft.multimodal

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class MediaPipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rec(id: Long, kind: String, bytes: Array[Byte]) =
    MediaRecord(id, kind, s"$kind/x", bytes)

  test("decode stub is deterministic and schema-complete through mapPartitions") {
    val media = Seq(
      rec(1, "image", "hello world".getBytes("UTF-8")),
      rec(2, "video", Array.tabulate(100)(_.toByte))
    ).toDS()
    val feats = MediaPipeline.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L))
    val img = feats(0)
    assert(img.n_bytes == 11 && img.n_frames == 1)
    assert(img.width == 64 + 'h' % 64 && img.height == 64 + 'd' % 64)
    val vid = feats(1)
    assert(vid.n_frames == (1 + 100 % 30))
    // determinism: re-running yields identical features
    assert(MediaPipeline.extractFeatures(media).collect().sortBy(_.media_id).toSeq == feats.toSeq)
  }

  test("PNG header decode: IHDR width/height read big-endian, any real PNG header shape") {
    // crafted: full 33-byte signature+IHDR for 1920x1080 and for widths
    // crossing byte boundaries (257 needs the second BE byte, 70000 the third)
    Seq((1920, 1080), (257, 3), (70000, 65536), (1, 1)).foreach { case (w, h) =>
      val f = MediaPipeline.decodeOne(rec(1, "image", MediaPipeline.pngHeader(w, h)))
      assert(f.width == w && f.height == h, s"($w,$h) decoded as (${f.width},${f.height})")
    }
    // bytes after IHDR (pixel data) must not affect the parse
    val withData = MediaPipeline.pngHeader(640, 480) ++ Array.tabulate(100)(_.toByte)
    val f        = MediaPipeline.decodeOne(rec(2, "image", withData))
    assert(f.width == 640 && f.height == 480 && f.n_bytes == 29 + 100)
  }

  test("BMP header decode: little-endian dims; negative height (top-down) yields abs") {
    Seq((800, 600), (257, 511), (1, 1)).foreach { case (w, h) =>
      val f = MediaPipeline.decodeOne(rec(1, "image", MediaPipeline.bmpHeader(w, h)))
      assert(f.width == w && f.height == h, s"($w,$h) decoded as (${f.width},${f.height})")
    }
    val topDown = MediaPipeline.decodeOne(rec(2, "image", MediaPipeline.bmpHeader(320, -240)))
    assert(topDown.width == 320 && topDown.height == 240)
  }

  test("unrecognized magic falls back to the stub formula (video boundary)") {
    val f = MediaPipeline.decodeOne(rec(1, "video", "hello world".getBytes("UTF-8")))
    assert(f.width == 64 + 'h' % 64 && f.height == 64 + 'd' % 64)
    // a 'BM' prefix shorter than the info header must not be parsed as BMP
    val tiny = MediaPipeline.decodeOne(rec(2, "video", "BM tiny".getBytes("UTF-8")))
    assert(tiny.width == 64 + 'B' % 64 && tiny.height == 64 + 'y' % 64)
  }

  test("WAV header decode: PCM params read little-endian at fmt/data offsets, any real header shape") {
    // CD stereo, 8k mono telephony, 48k/24-bit surround-ish — and rates
    // crossing the 16-bit boundary (48000 and 96000 need the third LE byte)
    Seq((44100, 2, 16, 1000), (8000, 1, 16, 11), (48000, 6, 24, 7200), (96000, 1, 8, 3)).foreach {
      case (rate, ch, bits, ds) =>
        val f = MediaPipeline.decodeOne(
          rec(1, "audio", MediaPipeline.wavHeader(rate, ch, bits, ds) ++ Array.fill[Byte](ds)(7)))
        assert(f.sample_rate == rate && f.n_channels == ch, s"($rate,$ch) → (${f.sample_rate},${f.n_channels})")
        assert(f.n_frames == ds / (ch * bits / 8), s"frames ${f.n_frames}")
        assert(f.width == 0 && f.height == 0, "image fields must stay zero for audio")
    }
    // a 'RIFF' prefix shorter than the 44-byte header must not be parsed as WAV
    val tiny = MediaPipeline.decodeOne(rec(2, "audio", "RIFFxxxxWAVE".getBytes("UTF-8")))
    assert(tiny.sample_rate == 0 && tiny.width == 64 + 'R' % 64)
    // WAVE_FORMAT_EXTENSIBLE-shaped header (fmt chunk size 40): offsets 36/40
    // hold fmt-extension bytes, not the data header — must fall back to the
    // stub, not parse garbage PCM params
    val ext = MediaPipeline.wavHeader(44100, 2, 16, 100)
    ext(16) = 40 // fmt chunk size -> extensible
    val fExt = MediaPipeline.decodeOne(rec(3, "audio", ext ++ Array.fill[Byte](100)(1)))
    assert(fExt.sample_rate == 0 && fExt.n_channels == 0, "extensible WAV parsed as canonical PCM")
  }

  test("batched decode handles partitions larger than the batch size") {
    val many  = (1L to 1000L).map(i => rec(i, "audio", Array.fill(8)(i.toByte))).toDS().repartition(2)
    val feats = MediaPipeline.extractFeatures(many)
    assert(feats.count() == 1000)
    assert(feats.filter(_.n_bytes != 8).count() == 0)
  }

  test("frame sampling only touches video and is deterministic") {
    val media = Seq(
      rec(1, "image", Array.fill(50)(1.toByte)),
      rec(2, "video", Array.tabulate(200)(_.toByte))
    ).toDS()
    val frames = MediaPipeline.sampleFrames(media, frameSize = 10, everyN = 10)
    assert(frames.select("media_id").distinct().as[Long].collect().toSeq == Seq(2L))
    assert(frames.count() == 2) // slices 0 and 10 of 20 ten-byte slices
  }
}
