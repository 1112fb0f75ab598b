package graft.multimodal

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Crafted-pixel coverage for the REAL PNG/BMP codec paths: round-trips
  * through every PNG row filter, both BMP row orders and stride paddings,
  * independent validation against the JDK's own ImageIO decoder, the exact
  * nearest-neighbor index map, and the malformed-input fallbacks.
  */
class PixelCodecSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // deterministic but non-trivial pixels: no symmetry, all byte ranges
  private def px(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 131 + seed * 17 + (i * i) % 97) % 256).toByte)

  test("PNG round-trip recovers exact pixels through every row filter (0-4)") {
    // h = 7 > 5: filters 0,1,2,3,4 all appear (y % 5); w = 5 exercises the
    // left/upper-left predictors past the first pixel
    val (w, h) = (5, 7)
    val rgb    = px(w, h, 1)
    val decoded = PixelCodec.decodePng(PixelCodec.encodePng(w, h, rgb))
    assert(decoded.isDefined)
    assert(decoded.get.width == w && decoded.get.height == h)
    assert(decoded.get.rgb.toSeq == rgb.toSeq)
  }

  test("PNG encoder emits standards-valid files: the JDK's ImageIO decodes identical pixels") {
    val (w, h) = (6, 9)
    val rgb    = px(w, h, 2)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(PixelCodec.encodePng(w, h, rgb)))
    assert(img != null, "ImageIO rejected our PNG")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val o    = (y * w + x) * 3
      assert(((argb >> 16) & 0xff) == (rgb(o) & 0xff), s"R at ($x,$y)")
      assert(((argb >> 8) & 0xff) == (rgb(o + 1) & 0xff), s"G at ($x,$y)")
      assert((argb & 0xff) == (rgb(o + 2) & 0xff), s"B at ($x,$y)")
    }
  }

  test("PNG decode handles RGBA (color type 6), dropping alpha after unfiltering") {
    // hand-build an RGBA PNG: filter 2 (Up) on every row so the unfilter
    // runs at the 4-byte pixel stride
    val (w, h) = (3, 4)
    val rgba   = Array.tabulate(w * h * 4)(i => ((i * 37 + 11) % 256).toByte)
    val stride = w * 4
    val raw    = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      raw(y * (1 + stride)) = 2 // Up
      for (i <- 0 until stride) {
        val cur = rgba(y * stride + i) & 0xff
        val up  = if (y > 0) rgba((y - 1) * stride + i) & 0xff else 0
        raw(y * (1 + stride) + 1 + i) = ((cur - up) & 0xff).toByte
      }
    }
    def chunk(name: String, data: Array[Byte]): Array[Byte] = {
      val tag = name.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(tag); crc.update(data)
      def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      be(data.length) ++ tag ++ data ++ be(crc.getValue.toInt)
    }
    val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
    val zOut = new java.io.ByteArrayOutputStream(); val buf = new Array[Byte](4096)
    while (!d.finished()) zOut.write(buf, 0, d.deflate(buf))
    def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", be(w) ++ be(h) ++ Array[Byte](8, 6, 0, 0, 0)) ++
      chunk("IDAT", zOut.toByteArray) ++ chunk("IEND", Array.emptyByteArray)
    val decoded = PixelCodec.decodePng(png)
    assert(decoded.isDefined)
    val expected = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val c = i % 3; rgba(p * 4 + c)
    }
    assert(decoded.get.rgb.toSeq == expected.toSeq)
  }

  test("BMP round-trip: both row orders, padded (w=3) and unpadded (w=4) strides") {
    for (topDown <- Seq(false, true); w <- Seq(3, 4)) {
      val h   = 5
      val rgb = px(w, h, if (topDown) 3 else 4)
      val dec = PixelCodec.decodeBmp(PixelCodec.encodeBmp(w, h, rgb, topDown))
      assert(dec.isDefined, s"topDown=$topDown w=$w")
      assert(dec.get.width == w && dec.get.height == h)
      assert(dec.get.rgb.toSeq == rgb.toSeq, s"topDown=$topDown w=$w")
    }
  }

  test("BMP encoder emits standards-valid files: ImageIO decodes identical pixels") {
    val (w, h) = (5, 4)
    val rgb    = px(w, h, 5)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(PixelCodec.encodeBmp(w, h, rgb, topDown = false)))
    assert(img != null, "ImageIO rejected our BMP")
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val o    = (y * w + x) * 3
      assert(((argb >> 16) & 0xff) == (rgb(o) & 0xff) &&
        ((argb >> 8) & 0xff) == (rgb(o + 1) & 0xff) && (argb & 0xff) == (rgb(o + 2) & 0xff),
        s"pixel at ($x,$y)")
    }
  }

  test("nearest-neighbor resample uses src = dst*srcDim/dstDim exactly") {
    // 4x2 -> 2x1: rows pick y=0, cols pick x=0 and x=2
    val rgb = Array.tabulate(4 * 2 * 3)(_.toByte)
    val out = PixelCodec.resizeNearest(PixelImage(4, 2, rgb), 2, 1)
    val expected = Seq(0, 1, 2, 6, 7, 8).map(_.toByte) // pixels (0,0) and (2,0)
    assert(out.rgb.toSeq == expected)
  }

  test("fitNearest never upscales and preserves aspect via ceil division") {
    val small = PixelImage(3, 5, px(3, 5, 6))
    assert(PixelCodec.fitNearest(small, 8) eq small) // <= maxSide: untouched
    val out = PixelCodec.fitNearest(PixelImage(16, 10, px(16, 10, 7)), 8)
    assert(out.width == 8 && out.height == 5) // ceil(10*8/16) = 5
  }

  test("malformed inputs fall back to None, never throw") {
    assert(PixelCodec.decodePixels("not an image".getBytes("UTF-8")).isEmpty)
    // header-only PNG (the q60 corpus shape): no IDAT
    assert(PixelCodec.decodePixels(MediaPipeline.pngHeader(4, 4)).isEmpty)
    // header-only BMP: declared pixel data missing
    assert(PixelCodec.decodePixels(MediaPipeline.bmpHeader(4, 4)).isEmpty)
    // unsupported layout: 16-bit depth PNG
    val deep = PixelCodec.encodePng(2, 2, px(2, 2, 8))
    deep(8 + 8 + 8) = 16 // IHDR bit-depth byte
    assert(PixelCodec.decodePng(deep).isEmpty)
    // truncated IDAT: valid chunk framing, lying zlib stream
    val good = PixelCodec.encodePng(4, 4, px(4, 4, 9))
    assert(PixelCodec.decodePng(good.dropRight(20)).isEmpty)
  }

  test("adversarial containers return None: FDICT zlib, overflowing dims, Int.MinValue BMP height") {
    // 1) zlib stream with the (PNG-forbidden) FDICT flag: Inflater returns
    // 0 forever with needsDictionary — must be detected, not spin.
    def chunk(name: String, data: Array[Byte]): Array[Byte] = {
      val tag = name.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(tag); crc.update(data)
      def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      be(data.length) ++ tag ++ data ++ be(crc.getValue.toInt)
    }
    def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    // CMF=0x78, FLG=0x20: FDICT bit set and (0x7820 % 31) == 0 (valid check)
    val fdictIdat = Array(0x78, 0x20, 1, 2, 3, 4, 5, 6, 7, 8).map(_.toByte)
    val fdictPng = sig ++ chunk("IHDR", be(1) ++ be(1) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("IDAT", fdictIdat) ++ chunk("IEND", Array.emptyByteArray)
    assert(PixelCodec.decodePng(fdictPng).isEmpty, "FDICT stream must fail, not hang")
    // 2) IHDR dims whose raster size overflows Int: w=2^29, h=4
    val overflow = PixelCodec.encodePng(2, 2, px(2, 2, 11))
    overflow(16) = 0x20; overflow(17) = 0; overflow(18) = 0; overflow(19) = 0 // w = 0x20000000
    overflow(20) = 0; overflow(21) = 0; overflow(22) = 0; overflow(23) = 4   // h = 4
    assert(PixelCodec.decodePng(overflow).isEmpty, "overflowing raster must fail, not allocate negative")
    // 3) chunk length near Int.MaxValue: the bounds check must not wrap
    val hugeLen = sig ++ Array(0x7f, 0xff, 0xff, 0xf0).map(_.toByte) ++ "IHDR".getBytes("US-ASCII") ++
      Array.fill[Byte](20)(0)
    assert(PixelCodec.decodePng(hugeLen).isEmpty)
    // 4) BMP height = Int.MinValue: abs() stays negative — must reject
    val bmp = PixelCodec.encodeBmp(2, 2, px(2, 2, 12), topDown = false)
    bmp(22) = 0; bmp(23) = 0; bmp(24) = 0; bmp(25) = 0x80.toByte
    assert(PixelCodec.decodeBmp(bmp).isEmpty, "Int.MinValue height must fail, not allocate negative")
  }

  test("mediaWithPixels corpus decodes back to the formula pixels (all three container paths)") {
    for (id <- Seq(0L, 3L, 6L, 9L, 12L, 15L, 21L)) {
      val w   = (3 + id % 14).toInt
      val h   = (3 + (id * 7) % 14).toInt
      val rgb = MediaPipeline.formulaPixels(id, w, h)
      val bytes =
        if (id % 6 == 0) PixelCodec.encodePng(w, h, rgb)
        else if (id % 12 == 3) PixelCodec.encodeBmp(w, h, rgb, topDown = false)
        else PixelCodec.encodeBmp(w, h, rgb, topDown = true)
      val dec = PixelCodec.decodePixels(bytes)
      assert(dec.isDefined && dec.get.rgb.toSeq == rgb.toSeq, s"id=$id")
    }
  }

  test("property: PNG and BMP round-trip ANY pixel content at ANY dimension (seeded ScalaCheck)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genImg: Gen[(Int, Int, Array[Byte])] = for {
      w     <- Gen.chooseNum(1, 24)
      h     <- Gen.chooseNum(1, 24)
      bytes <- Gen.listOfN(w * h * 3, Gen.chooseNum(0, 255))
    } yield (w, h, bytes.map(_.toByte).toArray)
    for (seed <- 1L to 40L) {
      val (w, h, rgb) = genImg.pureApply(Gen.Parameters.default, Seed(seed))
      assert(PixelCodec.decodePng(PixelCodec.encodePng(w, h, rgb)).get.rgb.toSeq == rgb.toSeq,
        s"PNG seed=$seed ${w}x$h")
      for (topDown <- Seq(false, true))
        assert(PixelCodec.decodeBmp(PixelCodec.encodeBmp(w, h, rgb, topDown)).get.rgb.toSeq == rgb.toSeq,
          s"BMP topDown=$topDown seed=$seed ${w}x$h")
    }
  }

  test("property: nearest-neighbor resample picks an existing source pixel for every output pixel") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      w  <- Gen.chooseNum(1, 24); h <- Gen.chooseNum(1, 24)
      w2 <- Gen.chooseNum(1, 24); h2 <- Gen.chooseNum(1, 24)
    } yield (w, h, w2, h2)
    for (seed <- 1L to 40L) {
      val (w, h, w2, h2) = gen.pureApply(Gen.Parameters.default, Seed(seed))
      val img = PixelImage(w, h, px(w, h, seed.toInt))
      val out = PixelCodec.resizeNearest(img, w2, h2)
      assert(out.rgb.length == w2 * h2 * 3)
      for (y2 <- 0 until h2; x2 <- 0 until w2; c <- 0 until 3) {
        val sx = (x2.toLong * w / w2).toInt; val sy = (y2.toLong * h / h2).toInt
        assert(out.rgb((y2 * w2 + x2) * 3 + c) == img.rgb((sy * w + sx) * 3 + c),
          s"seed=$seed out($x2,$y2,$c) != src($sx,$sy,$c)")
      }
    }
  }

  test("JPEG pixels decode via the JDK's ImageIO codec within quantization tolerance") {
    // A smooth gradient (JPEG's best case) round-tripped through the JDK's
    // own encoder: dimensions must be exact, pixels within lossy-codec
    // tolerance. Proves the JPEG pixel path needs no external codec.
    val (w, h) = (16, 12)
    val rgb = Array.tabulate(w * h * 3) { i =>
      val x = (i / 3) % w; val y = i / (3 * w)
      (((x * 255) / (w - 1) + (y * 255) / (h - 1)) / 2).toByte
    }
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      src.setRGB(x, y, ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff))
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpg", out))
    val dec = PixelCodec.decodePixels(out.toByteArray) // dispatches on the SOI magic
    assert(dec.isDefined, "JPEG failed to decode")
    assert(dec.get.width == w && dec.get.height == h)
    val meanErr = dec.get.rgb.zip(rgb).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / rgb.length
    assert(meanErr < 8.0, s"lossy round-trip error too high: $meanErr")
    // malformed JPEG: SOI magic but garbage body -> None, never a throw
    assert(PixelCodec.decodeJpeg(Array(0xff, 0xd8, 0x00, 0x01, 0x02).map(_.toByte)).isEmpty)
  }

  test("resizePixels Spark stage matches the local codec computation") {
    val ids = Seq(0L, 3L, 9L, 30L)
    val recs = ids.map { id =>
      val w   = (3 + id % 14).toInt
      val h   = (3 + (id * 7) % 14).toInt
      val rgb = MediaPipeline.formulaPixels(id, w, h)
      MediaRecord(id, "image", "image/x",
        if (id % 2 == 0) PixelCodec.encodePng(w, h, rgb)
        else PixelCodec.encodeBmp(w, h, rgb, topDown = true))
    }
    val got = MediaPipeline
      .resizePixels(recs.toDS(), maxSide = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getLong(6)))
      .sortBy(_._1)
    val want = recs.map { m =>
      val img = PixelCodec.decodePixels(m.content).get
      val out = PixelCodec.fitNearest(img, 8)
      var hsh = 0L
      out.rgb.foreach(b => hsh = (hsh * 31 + (b & 0xff)) % 2147483647L)
      (m.media_id, img.width, img.height, out.width, out.height, out.rgb.length, hsh)
    }.sortBy(_._1)
    assert(got.toSeq == want)
  }
}
