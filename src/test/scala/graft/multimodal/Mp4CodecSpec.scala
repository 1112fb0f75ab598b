package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Crafted-container coverage for the REAL ISO-BMFF sample codec: the
  * flat-gray JPEG exactness theorem q143's value gate rests on (all 256
  * levels), sample-span recovery through stsc/stsz/stco (single-chunk,
  * uniform multi-chunk, and short-last-chunk run-length maps), byte-exact
  * sample extraction, full MJPEG decode, and the malformed-table
  * fallbacks.
  */
class Mp4CodecSpec extends AnyFunSuite {

  private def flatJpeg(w: Int, h: Int, g: Int): Array[Byte] =
    PixelCodec.encodeGrayJpeg(w, h, Array.fill(w * h)(g.toByte))

  test("flat grayscale JPEG round-trips bit-exactly at every level 0-255") {
    // The exactness claim the q143 SQL gate rests on: a flat image is
    // DC-only in every 8x8 block (edge-replicated padding included — dims
    // deliberately not multiples of 8), and the DC coefficient survives
    // quantize -> dequantize -> IDCT unchanged.
    for (g <- 0 until 256) {
      val dec = PixelCodec.decodeJpeg(flatJpeg(11, 7, g))
      assert(dec.isDefined, s"gray $g failed to decode")
      val img = dec.get
      assert(img.width == 11 && img.height == 7)
      assert(img.rgb.forall(_ == g.toByte), s"gray $g not exact after round-trip")
    }
  }

  test("grayscale JPEG decodes to (g,g,g), not the sRGB-mapped getRGB value") {
    // getRGB on a linear-gray raster would map 1 -> 13, 2 -> 22, ...; the
    // raster read must bypass that color management.
    val img = PixelCodec.decodeJpeg(flatJpeg(8, 8, 1)).get
    assert(img.rgb.forall(_ == 1.toByte))
  }

  test("MJPEG MP4 round-trip: dims, cadence, frame order, exact flat pixels") {
    val (w, h) = (10, 6)
    val grays  = Seq(17, 200, 3, 250, 128)
    val mp4 = Mp4Codec.encodeMp4Mjpeg(w, h, fps = 8, grays.map(flatJpeg(w, h, _)), samplesPerChunk = 2)
    val dec = Mp4Codec.decodeMp4(mp4)
    assert(dec.isDefined)
    val v = dec.get
    assert(v.width == w && v.height == h)
    assert(v.usPerFrame == 125000L)
    assert(v.frames.size == 5)
    for ((g, f) <- grays.zipWithIndex) {
      assert(v.frames(f).width == w && v.frames(f).height == h)
      assert(v.frames(f).rgb.forall(_ == g.toByte), s"frame $f gray $g")
    }
  }

  test("sample spans are byte-exact for every stsc shape") {
    // 5 samples at 1, 2 (short last chunk), and 5 (single chunk) per
    // chunk; the recovered spans must slice back the EXACT input JPEGs.
    val samples = (0 until 5).map(f => flatJpeg(9, 5, 40 * f + 7))
    for (spc <- Seq(1, 2, 5)) {
      val mp4 = Mp4Codec.encodeMp4Mjpeg(9, 5, 10, samples, spc)
      val st  = Mp4Codec.sampleTable(mp4)
      assert(st.isDefined, s"spc=$spc")
      assert(st.get.codec == "jpeg" && st.get.samples.size == 5)
      for ((sample, (off, len)) <- samples.zip(st.get.samples)) {
        assert(len == sample.length, s"spc=$spc length")
        assert(java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(mp4, off, off + len), sample), s"spc=$spc bytes")
      }
    }
  }

  test("the metadata walk still reads the sampled container (q60 contract)") {
    val mp4 = Mp4Codec.encodeMp4Mjpeg(12, 8, 5, (0 until 3).map(flatJpeg(12, 8, _)), 2)
    val meta = MediaPipeline.mp4Meta(mp4)
    assert(meta.isDefined)
    assert(meta.get.width == 12 && meta.get.height == 8)
    assert(meta.get.nSamples == 3)
    assert(meta.get.durationMs == 600L) // 3 samples / 5 fps
  }

  test("corrupt sample tables fall back to None, not a wrong decode") {
    val samples = (0 until 4).map(f => flatJpeg(8, 8, 60 * f + 10))
    val good    = Mp4Codec.encodeMp4Mjpeg(8, 8, 10, samples, 2)

    // shift the first stco offset by one byte: the slice is no longer a
    // JPEG (no SOI) so the container must drop, not emit garbage frames
    val stcoAt = {
      var i = 0; var at = -1
      while (at < 0 && i + 4 <= good.length) {
        if (good(i) == 's' && good(i + 1) == 't' && good(i + 2) == 'c' && good(i + 3) == 'o') at = i
        i += 1
      }
      at
    }
    assert(stcoAt > 0)
    val shifted = good.clone()
    // first chunk offset = 4-byte fourcc + ver/flags(4) + count(4) later
    val offPos = stcoAt + 4 + 4 + 4
    shifted(offPos + 3) = (shifted(offPos + 3) + 1).toByte
    assert(Mp4Codec.decodeMp4(shifted).isEmpty)

    // truncate the file inside mdat: the last span overruns
    assert(Mp4Codec.decodeMp4(good.dropRight(5)).isEmpty)

    // a non-JPEG codec fourcc must not reach ImageIO
    val avc = good.clone()
    var j = 0
    var found = false
    while (!found && j + 4 <= avc.length) {
      if (avc(j) == 'j' && avc(j + 1) == 'p' && avc(j + 2) == 'e' && avc(j + 3) == 'g') {
        avc(j) = 'a'; avc(j + 1) = 'v'; avc(j + 2) = 'c'; avc(j + 3) = '1'
        found = true
      }
      j += 1
    }
    assert(found)
    assert(Mp4Codec.decodeMp4(avc).isEmpty)
    // ... while the metadata walk still works on it (codec-agnostic)
    assert(MediaPipeline.mp4Meta(avc).isDefined)
  }

  test("header-only containers (no sample tables) stay metadata-only") {
    // the q60 corpus shape: mp4Header writes stts but no stsd/stsz/stco
    val hdr = MediaPipeline.mp4Header(64, 48, 2000, 20, 10) ++ Array.fill[Byte](10)(7)
    assert(MediaPipeline.mp4Meta(hdr).isDefined)
    assert(Mp4Codec.decodeMp4(hdr).isEmpty)
  }
}
