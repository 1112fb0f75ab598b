package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** A decoded raster: row-major, top-down, 3 bytes per pixel (RGB). */
final case class PixelImage(width: Int, height: Int, rgb: Array[Byte])

/** REAL pixel codecs for the two container formats that need no external
  * codec library — everything here is JDK-only byte work, closing the
  * round-4 stub boundary for PNG and BMP (JPEG entropy decode and video
  * remain stubbed in [[MediaPipeline]]: those genuinely need codec libs).
  *
  *   - PNG: full chunk walk (ancillary chunks skipped, multiple IDATs
  *     concatenated), zlib inflate via `java.util.zip.Inflater`, and
  *     scanline UNFILTERING for all five filter types (None/Sub/Up/
  *     Average/Paeth — the spec'd reconstruction functions), for 8-bit
  *     truecolor (color type 2) and truecolor+alpha (type 6, alpha
  *     dropped). Anything else (palette, 16-bit, interlaced) returns None
  *     and the caller falls back — that tail is codec-library territory.
  *   - BMP: BITMAPINFOHEADER 24-bit uncompressed pixels, honoring the
  *     header's data offset, 4-byte row stride padding, BGR byte order,
  *     and BOTH row orders (positive height = bottom-up, negative =
  *     top-down).
  *   - Nearest-neighbor resample: the real index-mapped resample
  *     (`src = (dst * srcDim) / dstDim`, exact integer math) behind the
  *     aspect-preserving fit that [[MediaPipeline.resizeImages]] computes.
  *
  * The encoders exist so the synthetic corpus carries REAL files: the PNG
  * encoder cycles the row filter 0→4 (so decoding the corpus exercises
  * every unfilter branch), and the BMP encoder emits both row orders.
  * Decode is embarrassingly parallel per row — the 100 TB shape is
  * unchanged from [[MediaPipeline.extractFeatures]] (batched
  * mapPartitions, no shuffle, binary column pruned unless read).
  */
object PixelCodec {

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  // ---------- shared byte helpers ----------

  private def beInt(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def beIntAt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** PNG Paeth predictor (the spec's exact tie rules: left, then up). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p  = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ---------- PNG ----------

  private def crcChunk(name: String, data: Array[Byte]): Array[Byte] = {
    val tag = name.getBytes("US-ASCII")
    val crc = new CRC32
    crc.update(tag)
    crc.update(data)
    beInt(data.length) ++ tag ++ data ++ beInt(crc.getValue.toInt)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(z: Array[Byte], expected: Int): Option[Array[Byte]] = {
    if (expected < 0) return None // caller's size math overflowed: malformed header
    val inf = new Inflater()
    inf.setInput(z)
    val out = new Array[Byte](expected)
    try {
      var done = 0
      while (done < expected && !inf.finished()) {
        val n = inf.inflate(out, done, expected - done)
        // n == 0 without progress: truncated stream (needsInput) or a
        // preset-dictionary stream (needsDictionary — inflate would return
        // 0 forever; PNG forbids FDICT, so treat it as malformed)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        done += n
      }
      if (done == expected) Some(out) else None
    } catch { case _: java.util.zip.DataFormatException => None }
    finally inf.end()
  }

  /** Encode a REAL, standards-valid RGB8 PNG (any decoder reads it). The
    * row filter cycles 0→4 with `y % 5`, so a corpus of height ≥ 5 puts
    * every unfilter branch of [[decodePng]] under its oracle.
    */
  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} RGB bytes, got ${rgb.length}")
    val stride = w * 3
    val raw    = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val f  = y % 5
      val ro = y * (1 + stride)
      raw(ro) = f.toByte
      var i = 0
      while (i < stride) {
        val cur  = rgb(y * stride + i) & 0xff
        val left = if (i >= 3) rgb(y * stride + i - 3) & 0xff else 0
        val up   = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
        val ul   = if (y > 0 && i >= 3) rgb((y - 1) * stride + i - 3) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(ro + 1 + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    PngSig ++ crcChunk("IHDR", beInt(w) ++ beInt(h) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      crcChunk("IDAT", deflate(raw)) ++ crcChunk("IEND", Array.emptyByteArray)
  }

  /** Decode a PNG: chunk walk (multiple IDATs concatenated, ancillary
    * chunks skipped), inflate, unfilter. Supports 8-bit color types 2
    * (RGB) and 6 (RGBA — alpha dropped after unfiltering, which runs at
    * the file's own 4-byte pixel stride), non-interlaced. Returns None on
    * any other layout or malformed/truncated input.
    */
  def decodePng(b: Array[Byte]): Option[PixelImage] = {
    if (b.length < 8 + 25 || !PngSig.indices.forall(i => b(i) == PngSig(i))) return None
    var w = 0; var h = 0; var colorType = -1
    var sawIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var off  = 8
    var done = false
    while (!done && off + 8 <= b.length) {
      val len  = beIntAt(b, off)
      val name = new String(b, off + 4, 4, "US-ASCII")
      // Long arithmetic: a crafted len near Int.MaxValue must not wrap the
      // bound check and reach idat.write with an out-of-range length
      if (len < 0 || off.toLong + 12L + len > b.length) return None // lying length
      name match {
        case "IHDR" =>
          if (len != 13) return None
          w = beIntAt(b, off + 8)
          h = beIntAt(b, off + 12)
          val depth     = b(off + 16) & 0xff
          colorType = b(off + 17) & 0xff
          val interlace = b(off + 20) & 0xff
          if (depth != 8 || (colorType != 2 && colorType != 6) || interlace != 0) return None
          sawIhdr = true
        case "IDAT" => idat.write(b, off + 8, len)
        case "IEND" => done = true
        case _      => () // ancillary chunk: skip
      }
      off += 12 + len
    }
    if (!sawIhdr || w <= 0 || h <= 0 || idat.size == 0) return None
    val bpp = if (colorType == 2) 3 else 4
    // raster-size math in Long: crafted dims like w=2^29 pass the sign
    // checks but overflow Int in h*(1+w*bpp), which would reach a negative
    // array allocation — cap the raster at the sane decode bound instead
    if (h.toLong * (1L + w.toLong * bpp) > Int.MaxValue || w.toLong * h * 3 > Int.MaxValue) return None
    val stride = w * bpp
    inflate(idat.toByteArray, h * (1 + stride)).flatMap { raw =>
      val px    = new Array[Byte](h * stride) // unfiltered, at file bpp
      var valid = true
      var y     = 0
      while (valid && y < h) {
        val f  = raw(y * (1 + stride)) & 0xff
        if (f > 4) valid = false
        val ro = y * (1 + stride) + 1
        var i = 0
        while (valid && i < stride) {
          val cur  = raw(ro + i) & 0xff
          val left = if (i >= bpp) px(y * stride + i - bpp) & 0xff else 0
          val up   = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
          val ul   = if (y > 0 && i >= bpp) px((y - 1) * stride + i - bpp) & 0xff else 0
          val v = f match {
            case 0 => cur
            case 1 => cur + left
            case 2 => cur + up
            case 3 => cur + (left + up) / 2
            case 4 => cur + paeth(left, up, ul)
          }
          px(y * stride + i) = (v & 0xff).toByte
          i += 1
        }
        y += 1
      }
      if (!valid) None
      else {
      val rgb =
        if (bpp == 3) px
        else { // drop alpha
          val out = new Array[Byte](w * h * 3)
          var p = 0
          while (p < w * h) {
            out(p * 3) = px(p * 4); out(p * 3 + 1) = px(p * 4 + 1); out(p * 3 + 2) = px(p * 4 + 2)
            p += 1
          }
          out
        }
      Some(PixelImage(w, h, rgb))
      }
    }
  }

  // ---------- BMP ----------

  private def bmpStride(w: Int): Int = ((w * 3 + 3) / 4) * 4

  /** Encode a REAL 24-bit uncompressed BMP: BGR byte order, 4-byte row
    * padding, bottom-up rows (or top-down via negative height when
    * `topDown`) — the two layouts real files use.
    */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte], topDown: Boolean): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} RGB bytes, got ${rgb.length}")
    val stride = bmpStride(w)
    val size   = 54 + stride * h
    val out    = new Array[Byte](size)
    def putLe(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe(2, size); putLe(10, 54); putLe(14, 40)
    putLe(18, w); putLe(22, if (topDown) -h else h)
    out(26) = 1; out(28) = 24
    var y = 0
    while (y < h) {
      val fileRow = if (topDown) y else h - 1 - y // row y of the image, in file order
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 3
        val d = 54 + fileRow * stride + x * 3
        out(d) = rgb(s + 2); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s) // BGR
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24-bit uncompressed BMP, honoring the header's pixel-data
    * offset, row padding, BGR order, and both row orders. Returns None for
    * other bit depths / compressions (palette and RLE BMPs are rare in
    * training corpora; a codec lib covers them).
    */
  def decodeBmp(b: Array[Byte]): Option[PixelImage] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = leInt(b, 10)
    val hdrSize = leInt(b, 14)
    if (hdrSize < 40) return None
    val w    = leInt(b, 18)
    val rawH = leInt(b, 22)
    val topDown = rawH < 0
    val h       = math.abs(rawH) // abs(Int.MinValue) stays negative — caught below
    if (w <= 0 || h <= 0) return None
    // raster/stride math in Long: crafted dims must not wrap Int and reach
    // a negative allocation or a false bounds pass
    if (w.toLong * 3 + 3 > Int.MaxValue || w.toLong * h * 3 > Int.MaxValue) return None
    if (leShort(b, 26) != 1 || leShort(b, 28) != 24 || leInt(b, 30) != 0) return None
    val stride = bmpStride(w)
    if (dataOff < 54 || dataOff.toLong + stride.toLong * h > b.length) return None
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val fileRow = if (topDown) y else h - 1 - y
      var x = 0
      while (x < w) {
        val s = dataOff + fileRow * stride + x * 3
        val d = (y * w + x) * 3
        rgb(d) = b(s + 2); rgb(d + 1) = b(s + 1); rgb(d + 2) = b(s) // BGR → RGB
        x += 1
      }
      y += 1
    }
    Some(PixelImage(w, h, rgb))
  }

  /** JPEG pixels via the JDK's OWN ImageIO decoder — `javax.imageio`
    * ships a baseline+progressive JPEG codec in every JDK, so this path is
    * still genuinely codec-library-free. A lossy codec's output cannot in
    * general be replayed by a SQL oracle; color JPEG is SPEC-verified
    * instead (decoding a JDK-encoded JPEG recovers the source pixels
    * within quantization tolerance — PixelCodecSpec), while flat-block
    * GRAYSCALE JPEG round-trips bit-exactly (DC-only blocks), which q143
    * exploits for a SQL value gate on MP4 sample decode. A single-component
    * (grayscale) JPEG is read off the raster directly — gray g maps to
    * (g,g,g), the convention every mainstream tool follows — NOT through
    * `getRGB`, whose linear-gray→sRGB color management would distort the
    * sample values (1 → 13). Returns None on malformed input or a non-JPEG
    * signature.
    */
  def decodeJpeg(b: Array[Byte]): Option[PixelImage] =
    if (b.length < 3 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) None
    else
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        if (img == null) None
        else {
          val w   = img.getWidth
          val h   = img.getHeight
          val rgb = new Array[Byte](w * h * 3)
          if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val g = raster.getSample(x, y, 0).toByte
                val d = (y * w + x) * 3
                rgb(d) = g; rgb(d + 1) = g; rgb(d + 2) = g
                x += 1
              }
              y += 1
            }
          } else {
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val argb = img.getRGB(x, y)
                val d    = (y * w + x) * 3
                rgb(d) = ((argb >> 16) & 0xff).toByte
                rgb(d + 1) = ((argb >> 8) & 0xff).toByte
                rgb(d + 2) = (argb & 0xff).toByte
                x += 1
              }
              y += 1
            }
          }
          Some(PixelImage(w, h, rgb))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Encode a GRAYSCALE baseline JPEG through the JDK's ImageIO writer —
    * deterministic bytes for a given raster (same encoder tables every
    * run), and, for FLAT images, bit-exact on round-trip: a flat 8×8 block
    * has only a DC coefficient, which survives quantize→dequantize→IDCT
    * unchanged at every level 0–255 (verified exhaustively by
    * Mp4CodecSpec). `gray` is a top-down w×h raster, one byte per pixel.
    */
  def encodeGrayJpeg(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h, s"gray raster must be w*h bytes, got ${gray.length}")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.getRaster.setSample(x, y, 0, gray(y * w + x) & 0xff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Container dispatch on the magic bytes. */
  def decodePixels(b: Array[Byte]): Option[PixelImage] =
    if (b.length >= 8 && b(0) == 0x89.toByte && b(1) == 'P') decodePng(b)
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) decodeJpeg(b)
    else None

  /** REAL nearest-neighbor resample to exact target dimensions: source
    * index = `(dst * srcDim) / dstDim` (floor, exact integer math — the
    * formula a SQL oracle can replay).
    */
  def resizeNearest(img: PixelImage, outW: Int, outH: Int): PixelImage = {
    require(outW > 0 && outH > 0)
    val out = new Array[Byte](outW * outH * 3)
    var y2 = 0
    while (y2 < outH) {
      val sy = ((y2.toLong * img.height) / outH).toInt
      var x2 = 0
      while (x2 < outW) {
        val sx = ((x2.toLong * img.width) / outW).toInt
        val s  = (sy * img.width + sx) * 3
        val d  = (y2 * outW + x2) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x2 += 1
      }
      y2 += 1
    }
    PixelImage(outW, outH, out)
  }

  /** Aspect-preserving fit into `maxSide` (identical ceil math to
    * [[MediaPipeline.resizeImages]] — never upscales), then the real
    * nearest-neighbor resample.
    */
  def fitNearest(img: PixelImage, maxSide: Int): PixelImage = {
    val longest = math.max(img.width, img.height)
    if (longest <= maxSide) img
    else {
      val w2 = math.max(1L, (img.width.toLong * maxSide + longest - 1) / longest).toInt
      val h2 = math.max(1L, (img.height.toLong * maxSide + longest - 1) / longest).toInt
      resizeNearest(img, w2, h2)
    }
  }
}
