package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Crafted-container coverage for the REAL RIFF/AVI codec: lossless
  * raw-DIB round-trips (stride padding, bottom-up flip, BGR swap), MJPEG
  * frames through the JDK's own ImageIO codec, the avih/strh metadata
  * walk, RIFF WORD padding, and the malformed-input fallbacks.
  */
class AviCodecSpec extends AnyFunSuite {

  private def px(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 131 + seed * 17 + (i * i) % 97) % 256).toByte)

  test("raw-DIB round-trip recovers exact pixels, dims, cadence, frame order") {
    // w = 5 -> stride 16 (non-trivial row padding); 3 distinct frames
    val (w, h) = (5, 4)
    val frames = (0 until 3).map(f => px(w, h, f))
    val avi    = AviCodec.encodeAvi(w, h, fps = 10, frames)
    val dec    = AviCodec.decodeAvi(avi)
    assert(dec.isDefined)
    val v = dec.get
    assert(v.width == w && v.height == h)
    assert(v.usPerFrame == 100000L)
    assert(v.frames.size == 3)
    for (f <- 0 until 3) {
      assert(v.frames(f).width == w && v.frames(f).height == h)
      assert(v.frames(f).rgb.toSeq == frames(f).toSeq, s"frame $f pixels")
    }
  }

  test("width multiple of 4 (zero row padding) round-trips too") {
    val (w, h) = (8, 3)
    val frames = Seq(px(w, h, 7))
    val v      = AviCodec.decodeAvi(AviCodec.encodeAvi(w, h, 5, frames))
    assert(v.isDefined && v.get.frames.head.rgb.toSeq == frames.head.toSeq)
  }

  test("odd-length frame chunks honor RIFF WORD padding (MJPEG path)") {
    // JPEG payload lengths are arbitrary — odd lengths force the pad-byte
    // rule; a walker that ignores it desynchronizes after the first frame.
    // Smooth gradient frames: JPEG quantization keeps these near-exact
    // (the px() noise pattern is adversarial for a DCT codec by design)
    val (w, h) = (16, 12)
    def grad(f: Int): Array[Byte] = Array.tabulate(w * h * 3) { i =>
      val c = i % 3; val x = (i / 3) % w; val y = i / (3 * w)
      (40 * f + x * 6 + y * 4 + c * 3).toByte
    }
    val frames = (0 until 4).map(grad)
    val avi    = AviCodec.encodeAvi(w, h, fps = 8, frames, mjpeg = true)
    val dec    = AviCodec.decodeAvi(avi)
    assert(dec.isDefined, "MJPEG container failed to decode")
    val v = dec.get
    assert(v.width == w && v.height == h && v.frames.size == 4)
    // lossy codec: every decoded frame matches its source within JPEG
    // quantization tolerance, and frames stay distinguishable (in order)
    def meanAbsErr(a: Array[Byte], b: Array[Byte]): Double =
      a.zip(b).map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)) }.sum.toDouble / a.length
    for (f <- 0 until 4) {
      val err = meanAbsErr(v.frames(f).rgb, frames(f))
      assert(err < 24.0, s"frame $f mean abs error $err exceeds JPEG tolerance")
      val crossErr = meanAbsErr(v.frames(f).rgb, frames((f + 1) % 4))
      assert(err < crossErr, s"frame $f closer to a different source frame")
    }
  }

  test("a raw-DIB frame whose payload starts FF D8 decodes as DIB, not JPEG") {
    // bottom-left pixel B=0xFF, G=0xD8 puts the JPEG SOI marker at the
    // start of the DIB payload — tag dispatch ('db' = uncompressed by
    // definition) must not payload-sniff it into ImageIO
    val (w, h) = (4, 3)
    val rgb    = px(w, h, 9)
    rgb((h - 1) * w * 3 + 2) = 0xff.toByte // B of bottom-left (first payload byte)
    rgb((h - 1) * w * 3 + 1) = 0xd8.toByte // G (second payload byte)
    val v = AviCodec.decodeAvi(AviCodec.encodeAvi(w, h, 10, Seq(rgb)))
    assert(v.isDefined, "valid raw AVI rejected")
    assert(v.get.frames.head.rgb.toSeq == rgb.toSeq, "DIB frame misrouted or corrupted")
  }

  test("meta reads avih without touching frame payloads") {
    val avi = AviCodec.encodeAvi(6, 9, fps = 4, (0 until 5).map(f => px(6, 9, f)))
    val m   = AviCodec.meta(avi)
    assert(m.contains(AviMeta(6, 9, 5, 250000L * 5 / 1000)))
  }

  test("decodeOne reports real AVI dims, frame count, duration") {
    val avi = AviCodec.encodeAvi(12, 7, fps = 10, (0 until 3).map(f => px(12, 7, f)))
    val ft  = MediaPipeline.decodeOne(MediaRecord(1L, "video", "video/x-msvideo", avi))
    assert(ft.width == 12 && ft.height == 7)
    assert(ft.n_frames == 3)
    assert(ft.duration_ms == 300L) // 3 frames at 100000 us
  }

  test("malformed containers fall back to None") {
    val good = AviCodec.encodeAvi(4, 4, 10, Seq(px(4, 4, 1)))
    // wrong form type
    val wav = good.clone(); wav(8) = 'W'; wav(9) = 'A'; wav(10) = 'V'; wav(11) = 'E'
    assert(AviCodec.decodeAvi(wav).isEmpty && AviCodec.meta(wav).isEmpty)
    // truncated mid-movi
    assert(AviCodec.decodeAvi(good.take(good.length - 10)).isEmpty)
    // a chunk length overrunning its parent
    val overrun = good.clone()
    // find the first '00db' tag and corrupt its length field
    val idx = good.indices.find(i =>
      i + 4 <= good.length - 4 && good(i) == '0' && good(i + 1) == '0' &&
        good(i + 2) == 'd' && good(i + 3) == 'b').get
    overrun(idx + 4) = 0xff.toByte; overrun(idx + 5) = 0xff.toByte
    overrun(idx + 6) = 0xff.toByte; overrun(idx + 7) = 0x7f.toByte
    assert(AviCodec.decodeAvi(overrun).isEmpty)
    // not RIFF at all
    assert(AviCodec.decodeAvi("not an avi at all, sorry".getBytes).isEmpty)
  }

  test("a DIB frame chunk shorter than the declared raster drops the container") {
    val good = AviCodec.encodeAvi(4, 4, 10, Seq(px(4, 4, 1), px(4, 4, 2)))
    val idx = good.indices.find(i =>
      i + 4 <= good.length - 4 && good(i) == '0' && good(i + 1) == '0' &&
        good(i + 2) == 'd' && good(i + 3) == 'b').get
    // shrink the first frame chunk's declared length below the raster size:
    // the walk stays structurally valid only if we also splice bytes out —
    // simplest equivalent: declare length 8 and truncate the file there,
    // which breaks the parent length -> overrun -> None
    val bad = good.clone()
    bad(idx + 4) = 8; bad(idx + 5) = 0; bad(idx + 6) = 0; bad(idx + 7) = 0
    // walker now reads the tail of frame 1 as garbage sibling chunks and
    // overruns or mis-tags; either way the container must not decode to
    // two intact frames
    val dec = AviCodec.decodeAvi(bad)
    assert(dec.isEmpty || dec.get.frames.size < 2)
  }
}
