package graft.multimodal

/** A decoded AVI: stream dims, frame cadence, and every video frame as a
  * top-down RGB raster.
  */
final case class AviVideo(
    width: Int,
    height: Int,
    usPerFrame: Long,
    frames: Vector[PixelImage]
)

/** Container-level AVI metadata (the `avih` main header + stream length) —
  * what [[MediaPipeline.decodeOne]] reports for video rows without touching
  * frame payloads.
  */
final case class AviMeta(width: Int, height: Int, nFrames: Int, durationMs: Long)

/** REAL RIFF/AVI codec — JDK-only, same family as the PNG/BMP/WAV/MP4
  * parses, and the piece that closes the video-PIXEL stub boundary:
  *
  *   - Container: the standard RIFF chunk walk ('RIFF' size 'AVI ', then
  *     LIST('hdrl'){ avih + LIST('strl'){ strh + strf } } and
  *     LIST('movi'){ '##db'/'##dc' frame chunks }), with WORD (2-byte)
  *     chunk padding honored and every chunk length validated against its
  *     parent — anything overrunning, missing 'hdrl'/'movi', or without a
  *     'vids' stream returns None and callers fall back.
  *   - Uncompressed DIB frames ('##db', biCompression=0, 24-bit): the
  *     classic `ffmpeg -c:v rawvideo -pix_fmt bgr24` payload — bottom-up
  *     BGR rows with 4-byte stride padding, exactly the BMP pixel-array
  *     layout [[PixelCodec.decodeBmp]] reads. Lossless, so the per-frame
  *     pixel bytes are SQL-oracle-checkable end to end (q128).
  *   - MJPEG frames ('##dc', handler 'MJPG'): each chunk is a complete
  *     baseline JPEG, decoded through the JDK's own ImageIO codec
  *     ([[PixelCodec.decodeJpeg]]) — Motion-JPEG is precisely "a JPEG per
  *     frame", which is why it's the one compressed video codec a
  *     zero-dependency engine can really decode. Lossy ⇒ spec-verified
  *     (round-trip within quantization tolerance), not SQL-hashed.
  *
  * What remains genuinely out of scope is inter-frame codec territory
  * (H.264/VP9 entropy + motion compensation inside MP4/MKV) — dims,
  * duration and frame counts for those stay real via [[MediaPipeline.mp4Meta]];
  * their SAMPLES need a codec library by any standard.
  *
  * Scale shape: decode is per-row CPU work inside batched mapPartitions —
  * no shuffle, embarrassingly parallel, binary column pruned unless read
  * (identical to [[MediaPipeline.extractFeatures]]).
  */
object AviCodec {

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) |
      ((b(off + 3) & 0xff) << 24)

  private def leBytes(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def fourcc(b: Array[Byte], off: Int): String = new String(b, off, 4, "US-ASCII")

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** 'RIFF' magic + 'AVI ' form type. */
  def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  // ---------------------------------------------------------------- encode

  /** One RIFF chunk: fourcc + LE32 length + data + pad byte to WORD
    * alignment (the RIFF rule real muxers follow — odd-length MJPEG chunks
    * exercise it).
    */
  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val pad = if ((data.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray
    ascii(tag) ++ leBytes(data.length) ++ data ++ pad
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", ascii(listType) ++ body)

  /** Bottom-up padded BGR rows from a top-down RGB raster — the DIB frame
    * payload (and the BMP pixel array; one layout, two containers).
    */
  private def dibPayload(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val out    = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val src = (h - 1 - y) * w * 3 // bottom-up: output row y is source row h-1-y
      var x = 0
      while (x < w) {
        out(y * stride + x * 3) = rgb(src + x * 3 + 2)     // B
        out(y * stride + x * 3 + 1) = rgb(src + x * 3 + 1) // G
        out(y * stride + x * 3 + 2) = rgb(src + x * 3)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode a standards-valid AVI: raw-DIB ('DIB ' handler, '00db' chunks)
    * when `mjpeg` is false, Motion-JPEG ('MJPG', '00dc' chunks of
    * ImageIO-encoded baseline JPEGs) when true. `frames` are top-down RGB
    * rasters of identical `w`×`h`.
    */
  def encodeAvi(w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]], mjpeg: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && fps > 0, s"bad AVI params w=$w h=$h fps=$fps")
    require(frames.forall(_.length == w * h * 3), "every frame must be w*h*3 RGB bytes")
    val usPerFrame = 1000000 / fps
    val stride     = (w * 3 + 3) & ~3

    val payloads: Seq[Array[Byte]] =
      if (!mjpeg) frames.map(dibPayload(w, h, _))
      else
        frames.map { rgb =>
          val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val s = (y * w + x) * 3
              img.setRGB(x, y,
                ((rgb(s) & 0xff) << 16) | ((rgb(s + 1) & 0xff) << 8) | (rgb(s + 2) & 0xff))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", bos)
          bos.toByteArray
        }
    val maxBuf = if (payloads.isEmpty) 0 else payloads.map(_.length).max
    // dwMaxBytesPerSec is advisory; clamp so a large frame × fps cannot
    // wrap negative in the header field
    val maxRate = math.min(maxBuf.toLong * fps, Int.MaxValue.toLong).toInt

    // MainAVIHeader (56 bytes)
    val avih = chunk("avih",
      leBytes(usPerFrame) ++ leBytes(maxRate) ++ leBytes(0) ++ leBytes(0x10) /* HASINDEX off, INTERLEAVED */ ++
        leBytes(frames.length) ++ leBytes(0) ++ leBytes(1) ++ leBytes(maxBuf) ++
        leBytes(w) ++ leBytes(h) ++ Array.fill[Byte](16)(0))

    // AVIStreamHeader (56 bytes): vids + handler, rate/scale = fps/1
    val handler = if (mjpeg) "MJPG" else "DIB "
    val strh = chunk("strh",
      ascii("vids") ++ ascii(handler) ++ leBytes(0) ++ Array[Byte](0, 0, 0, 0) /* prio+lang */ ++
        leBytes(0) ++ leBytes(1) ++ leBytes(fps) ++ leBytes(0) ++ leBytes(frames.length) ++
        leBytes(maxBuf) ++ leBytes(-1) ++ leBytes(if (mjpeg) 0 else stride * h) ++
        Array[Byte](0, 0, 0, 0, w.toByte, (w >>> 8).toByte, h.toByte, (h >>> 8).toByte))

    // BITMAPINFOHEADER (40 bytes): biCompression 0 (BI_RGB) or 'MJPG'
    val compression = if (mjpeg) ascii("MJPG") else leBytes(0)
    val strf = chunk("strf",
      leBytes(40) ++ leBytes(w) ++ leBytes(h) ++ Array[Byte](1, 0, 24, 0) ++
        compression ++ leBytes(stride * h) ++ Array.fill[Byte](16)(0))

    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val tag  = if (mjpeg) "00dc" else "00db"
    val movi = list("movi", payloads.flatMap(chunk(tag, _)).toArray)
    val body = ascii("AVI ") ++ hdrl ++ movi
    ascii("RIFF") ++ leBytes(body.length) ++ body
  }

  // ---------------------------------------------------------------- decode

  /** Walk sibling chunks in [off0, end); `f(tag, dataStart, dataEnd)`.
    * False on structural corruption (a chunk overrunning its parent).
    */
  private def chunks(b: Array[Byte], off0: Int, end: Int)(f: (String, Int, Int) => Unit): Boolean = {
    // Long arithmetic throughout: RIFF lengths are unsigned 32-bit, and an
    // adversarial length near 2^31 would wrap `off + 8 + len` negative in
    // Int math, slipping past the overrun check into an OOB read
    var off = off0.toLong
    while (off + 8 <= end) {
      val tag = fourcc(b, off.toInt)
      val len = leInt(b, off.toInt + 4).toLong & 0xffffffffL
      if (off + 8 + len > end) return false
      f(tag, (off + 8).toInt, (off + 8 + len).toInt)
      off += 8 + len + (len & 1) // RIFF WORD padding
    }
    true
  }

  private final case class StreamInfo(
      width: Int, height: Int, usPerFrame: Long, nFrames: Int,
      bitCount: Int, compression: Int, streamNo: Int)

  /** Parse `hdrl` for the main header + the FIRST 'vids' stream's
    * strh/strf — remembering that stream's ORDINAL: movi chunk tags carry
    * the two-digit stream number ('01db' belongs to stream 1), so a
    * video stream listed after an audio one must not claim stream 0's
    * frames.
    */
  private def parseHdrl(b: Array[Byte], s: Int, e: Int): Option[StreamInfo] = {
    var usPf    = 0L
    var total   = 0
    var w       = 0
    var h       = 0
    var strlIdx = -1
    var strlOk  = true
    var found: Option[StreamInfo] = None
    val ok = chunks(b, s, e) { (t, cs, ce) =>
      if (t == "avih" && ce - cs >= 40) {
        usPf = leInt(b, cs).toLong & 0xffffffffL
        total = leInt(b, cs + 16)
        w = leInt(b, cs + 32)
        h = leInt(b, cs + 36)
      }
      if (t == "LIST" && ce - cs >= 4 && fourcc(b, cs) == "strl") {
        strlIdx += 1 // every stream advances the ordinal, vids or not
        if (found.isEmpty) {
          var vids  = false
          var bits  = 0
          var compr = 0
          // a structurally corrupt strl body must fail the whole parse:
          // a partially-read strh/strf would report bogus dims/cadence as
          // real metadata even though frame decode would later reject it
          val inner = chunks(b, cs + 4, ce) { (t2, s2, e2) =>
            if (t2 == "strh" && e2 - s2 >= 8) vids = fourcc(b, s2) == "vids"
            if (t2 == "strf" && e2 - s2 >= 20) {
              bits = (b(s2 + 14) & 0xff) | ((b(s2 + 15) & 0xff) << 8)
              compr = leInt(b, s2 + 16)
            }
          }
          if (!inner) strlOk = false
          if (vids) found = Some(StreamInfo(w, h, usPf, total, bits, compr, strlIdx))
        }
      }
    }
    if (!ok || !strlOk) None else found.filter(si => si.width > 0 && si.height > 0)
  }

  /** Container metadata only — no frame payloads touched. */
  def meta(b: Array[Byte]): Option[AviMeta] = header(b).map { case (si, _, _) =>
    AviMeta(si.width, si.height, si.nFrames, si.usPerFrame * si.nFrames / 1000L)
  }

  /** Shared header walk: the stream info + the movi span. */
  private def header(b: Array[Byte]): Option[(StreamInfo, Int, Int)] = {
    if (!isAvi(b)) return None
    val riffLen = leInt(b, 4).toLong & 0xffffffffL
    val end     = math.min(b.length.toLong, 8L + riffLen).toInt
    var si: Option[StreamInfo] = None
    var moviS = -1
    var moviE = -1
    val ok = chunks(b, 12, end) { (t, s, e) =>
      if (t == "LIST" && e - s >= 4) {
        val lt = fourcc(b, s)
        if (lt == "hdrl" && si.isEmpty) si = parseHdrl(b, s + 4, e)
        if (lt == "movi" && moviS < 0) { moviS = s + 4; moviE = e }
      }
    }
    if (!ok || si.isEmpty || moviS < 0) None else Some((si.get, moviS, moviE))
  }

  /** One DIB frame payload → top-down RGB (inverse of [[dibPayload]]);
    * None when the payload is shorter than the declared raster.
    */
  private def dibFrame(b: Array[Byte], s: Int, e: Int, w: Int, h: Int): Option[PixelImage] = {
    val stride = (w * 3 + 3) & ~3
    if (e - s < stride * h) return None
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val row = s + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        rgb((y * w + x) * 3) = b(row + x * 3 + 2)
        rgb((y * w + x) * 3 + 1) = b(row + x * 3 + 1)
        rgb((y * w + x) * 3 + 2) = b(row + x * 3)
        x += 1
      }
      y += 1
    }
    Some(PixelImage(w, h, rgb))
  }

  /** Full decode: the selected stream's '##db'/'##dc' frames in stream
    * order, including frames nested inside LIST('rec ') interleave groups
    * (common muxer output). Dispatch is by CHUNK TAG, not payload
    * sniffing: '##db' is uncompressed by definition and always reads as
    * DIB (a raw frame whose first bytes happen to be FF D8 must not be
    * misrouted to ImageIO); only '##dc' sniffs the JPEG SOI marker.
    * Chunks of OTHER streams (different two-digit prefix) are skipped. A
    * frame that fails to decode — or a container whose declared frame
    * count has no frames at all — drops the whole container to None: a
    * half-decoded video must not pass as complete.
    */
  def decodeAvi(b: Array[Byte]): Option[AviVideo] = header(b).flatMap { case (si, ms, me) =>
    val tagPrefix = f"${si.streamNo}%02d"
    val frames    = Vector.newBuilder[Option[PixelImage]]
    var recOk     = true
    def walk(s0: Int, e0: Int): Boolean = chunks(b, s0, e0) { (t, s, e) =>
      if (t == "LIST" && e - s >= 4 && fourcc(b, s) == "rec ") {
        if (!walk(s + 4, e)) recOk = false
      } else if (t.startsWith(tagPrefix)) {
        val dib = si.compression == 0 && si.bitCount == 24
        t.substring(2) match {
          case "db" =>
            frames += (if (dib) dibFrame(b, s, e, si.width, si.height) else None)
          case "dc" =>
            val isJpeg = e - s >= 2 && (b(s) & 0xff) == 0xff && (b(s + 1) & 0xff) == 0xd8
            frames += (if (isJpeg) PixelCodec.decodeJpeg(java.util.Arrays.copyOfRange(b, s, e))
                       else if (dib) dibFrame(b, s, e, si.width, si.height)
                       else None)
          case _ => () // e.g. '00tx' subtitles, '00wb' audio of a same-numbered stream
        }
      }
    }
    val ok = walk(ms, me) && recOk
    val fs = frames.result()
    if (!ok || fs.exists(_.isEmpty)) None
    else if (fs.isEmpty && si.nFrames > 0) None // declared frames, none found
    else Some(AviVideo(si.width, si.height, si.usPerFrame, fs.flatten))
  }
}
