package graft.multimodal

/** A decoded MP4 video track: presentation dims, frame cadence, and every
  * sample decoded to a top-down RGB raster.
  */
final case class Mp4Video(
    width: Int,
    height: Int,
    usPerFrame: Long,
    frames: Vector[PixelImage]
)

/** The per-sample layout of an MP4 video track, recovered from the REAL
  * sample tables: codec fourcc from `stsd`, media timescale from `mdhd`,
  * the first `stts` delta, and every sample's absolute byte span in the
  * file (the `stsc` chunk map expanded against `stco` chunk offsets and
  * `stsz` sizes — the walk every MP4 demuxer performs).
  */
final case class Mp4SampleTable(
    codec: String,
    mediaTimescale: Long,
    sampleDelta: Long,
    samples: Vector[(Int, Int)] // (absolute offset, length)
)

/** REAL ISO-BMFF (MP4) SAMPLE codec — JDK-only, the piece that shrinks the
  * video stub boundary to inter-frame codecs only:
  *
  *   - Container: [[MediaPipeline.mp4Meta]] already walks
  *     ftyp/moov/mvhd/trak/tkhd/mdia/hdlr/stbl/stts for dims, duration and
  *     frame count. This module adds the SAMPLE side of the standard —
  *     `stsd` (codec fourcc + VisualSampleEntry), `stsz` (per-sample or
  *     uniform sizes), `stco`/`co64` (chunk offsets), and the `stsc`
  *     sample-to-chunk run-length map, expanded exactly the way the spec
  *     (ISO/IEC 14496-12 §8.7) defines: entry i's samples-per-chunk applies
  *     from its first_chunk until the next entry's. Every recovered sample
  *     span is validated against the file length; a count mismatch between
  *     the expanded map and `stsz`, an overrunning span, or a missing table
  *     returns None and callers fall back to metadata-only.
  *   - MJPEG samples (`jpeg`/`mjpa` sample entries): each sample is a
  *     complete baseline JPEG — Motion-JPEG in an MP4 is the same
  *     "a JPEG per frame" contract as in AVI ('MJPG'), decoded through the
  *     JDK's own ImageIO codec ([[PixelCodec.decodeJpeg]]). Flat-block
  *     GRAYSCALE JPEG round-trips bit-exactly through ImageIO (DC-only
  *     blocks; verified over all 256 levels by Mp4CodecSpec), which is what
  *     lets q143 value-check decoded MP4 frame pixels in SQL even though
  *     JPEG is lossy in general.
  *
  * What remains genuinely out of scope is inter-frame codec territory —
  * H.264/VP9 entropy + motion compensation; their dims/duration/counts stay
  * real via the metadata walk, their samples need a codec library by any
  * standard.
  *
  * Scale shape: identical to [[AviCodec]] — per-row CPU work inside batched
  * mapPartitions, no shuffle, binary column pruned unless read.
  */
object Mp4Codec {

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def beUInt(b: Array[Byte], off: Int): Long = beInt(b, off).toLong & 0xffffffffL

  private def beLong(b: Array[Byte], off: Int): Long =
    (beUInt(b, off) << 32) | beUInt(b, off + 4)

  private def beBytes(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** `ftyp` magic at offset 4 — the dispatch test callers use. */
  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  // ---------------------------------------------------------------- encode

  private def box(t: String, body: Array[Byte]): Array[Byte] =
    beBytes(8 + body.length) ++ ascii(t) ++ body

  /** Encode a standards-valid MJPEG MP4 with FULL sample tables: one video
    * track whose `stsd` declares a `jpeg` VisualSampleEntry, `stts` one
    * (count, delta) run, `stsc` a uniform `samplesPerChunk` map (two
    * entries when the last chunk is short — the run-length form real
    * muxers emit), per-sample `stsz`, and `stco` holding REAL absolute
    * chunk offsets (moov is laid out twice: once to learn its length, once
    * with the offsets filled — the classic two-pass mux). `samples` are
    * complete JPEG files; media timescale is `fps`·100 with delta 100 so
    * the per-frame cadence is exactly 10⁶/fps µs.
    */
  def encodeMp4Mjpeg(
      w: Int,
      h: Int,
      fps: Int,
      samples: Seq[Array[Byte]],
      samplesPerChunk: Int = 2
  ): Array[Byte] = {
    require(fps > 0 && samplesPerChunk > 0 && samples.nonEmpty)
    val n       = samples.length
    val spc     = math.min(samplesPerChunk, n)
    val nChunks = (n + spc - 1) / spc
    val rem     = n - (nChunks - 1) * spc // samples in the last chunk
    val ts      = fps * 100
    val durMed  = n.toLong * 100          // media-timescale duration
    val durMs   = (durMed * 1000 / ts).toInt

    def moov(chunkOffsets: Seq[Int]): Array[Byte] = {
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
        beBytes(0) ++ beBytes(0) ++ beBytes(0) ++ beBytes(ts) ++ beBytes(durMed.toInt) ++
          Array[Byte](0x55, 0xc4.toByte, 0, 0))
      val hdlr = box("hdlr",
        beBytes(0) ++ beBytes(0) ++ ascii("vide") ++ Array.fill[Byte](12)(0) ++ Array[Byte](0))
      val vmhd = box("vmhd", Array[Byte](0, 0, 0, 1) ++ Array.fill[Byte](8)(0))
      // VisualSampleEntry (ISO 14496-12 §12.1.3): 78-byte body after the
      // 8-byte box header — reserved(6) + data_ref_index(2) + pre/reserved
      // (16) + dims(4) + 72dpi resolutions(8) + reserved(4) + frame_count
      // (2) + 32-byte compressorname + depth(2) + pre_defined(-1)
      val sampleEntry = box("jpeg",
        Array.fill[Byte](6)(0) ++ Array[Byte](0, 1) ++ Array.fill[Byte](16)(0) ++
          Array[Byte]((w >>> 8).toByte, w.toByte, (h >>> 8).toByte, h.toByte) ++
          beBytes(0x480000) ++ beBytes(0x480000) ++ beBytes(0) ++ Array[Byte](0, 1) ++
          Array.fill[Byte](32)(0) ++ Array[Byte](0, 24) ++ Array[Byte](-1, -1))
      val stsd = box("stsd", beBytes(0) ++ beBytes(1) ++ sampleEntry)
      val stts = box("stts", beBytes(0) ++ beBytes(1) ++ beBytes(n) ++ beBytes(100))
      val stscEntries =
        if (nChunks > 1 && rem != spc)
          beBytes(2) ++ beBytes(1) ++ beBytes(spc) ++ beBytes(1) ++
            beBytes(nChunks) ++ beBytes(rem) ++ beBytes(1)
        else beBytes(1) ++ beBytes(1) ++ beBytes(spc) ++ beBytes(1)
      val stsc = box("stsc", beBytes(0) ++ stscEntries)
      val stsz = box("stsz",
        beBytes(0) ++ beBytes(0) ++ beBytes(n) ++ samples.flatMap(s => beBytes(s.length)))
      val stco = box("stco",
        beBytes(0) ++ beBytes(nChunks) ++ chunkOffsets.flatMap(beBytes))
      box("moov", mvhd ++ box("trak", tkhd ++ box("mdia", mdhd ++ hdlr ++
        box("minf", vmhd ++ box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)))))
    }

    val ftyp    = box("ftyp", ascii("isom") ++ beBytes(0x200) ++ ascii("isom") ++ ascii("mp41"))
    val moovLen = moov(Seq.fill(nChunks)(0)).length
    val mdatOff = ftyp.length + moovLen + 8 // first sample byte of the mdat payload
    val offsets = {
      val sizes = samples.map(_.length)
      val out   = new Array[Int](nChunks)
      var off   = mdatOff
      var s     = 0
      var c     = 0
      while (c < nChunks) {
        out(c) = off
        val inChunk = if (c == nChunks - 1) rem else spc
        var i = 0
        while (i < inChunk) { off += sizes(s); s += 1; i += 1 }
        c += 1
      }
      out.toSeq
    }
    val payload = samples.flatten.toArray
    ftyp ++ moov(offsets) ++ beBytes(8 + payload.length) ++ ascii("mdat") ++ payload
  }

  // ---------------------------------------------------------------- decode

  /** Box walk in `[off0, end)` — the same length-prefixed traversal as
    * [[MediaPipeline.mp4Meta]] (64-bit `largesize` and size-0 run-to-end
    * handled); false on structural corruption.
    */
  private def boxes(b: Array[Byte], off0: Int, end: Int)(f: (String, Int, Int) => Unit): Boolean = {
    var off = off0
    while (off + 8 <= end) {
      val size32 = beInt(b, off)
      var hdr    = 8
      val size: Long =
        if (size32 == 1) { if (off + 16 > end) return false; hdr = 16; beLong(b, off + 8) }
        else if (size32 == 0) (end - off).toLong
        else size32.toLong
      if (size < hdr || off + size > end) return false
      f(new String(b, off + 4, 4, "US-ASCII"), off + hdr, (off + size).toInt)
      off = (off + size).toInt
    }
    off == end
  }

  /** Recover the first video track's per-sample byte spans from the REAL
    * sample tables. None on any structural corruption: missing table,
    * `stsc` expansion disagreeing with the `stsz` count (too many or too
    * few chunks for the samples), or a span outside the file.
    */
  private[multimodal] def sampleTable(b: Array[Byte]): Option[Mp4SampleTable] = {
    if (!isMp4(b)) return None
    var codec = ""
    var ts    = 0L
    var delta = 0L
    var sizes: Array[Int]   = null
    var chunks: Array[Long] = null
    var stsc: Array[(Long, Int)] = null // (first_chunk 1-based, samples_per_chunk)
    var found = false
    val ok = boxes(b, 0, b.length) { (t, s, e) =>
      if (t == "moov") boxes(b, s, e) { (t2, s2, e2) =>
        if (t2 == "trak" && !found) {
          var handler = ""
          var cCodec  = ""
          var cTs     = 0L
          var cDelta  = 0L
          var cSizes: Array[Int]       = null
          var cChunks: Array[Long]     = null
          var cStsc: Array[(Long, Int)] = null
          boxes(b, s2, e2) { (t3, s3, e3) =>
            if (t3 == "mdia") boxes(b, s3, e3) { (t4, s4, e4) =>
              if (t4 == "mdhd" && e4 - s4 >= 16) {
                val v1 = (b(s4) & 0xff) == 1
                cTs = if (v1 && e4 - s4 >= 24) beUInt(b, s4 + 20) else beUInt(b, s4 + 12)
              }
              if (t4 == "hdlr" && s4 + 12 <= e4)
                handler = new String(b, s4 + 8, 4, "US-ASCII")
              if (t4 == "minf") boxes(b, s4, e4) { (t5, s5, e5) =>
                if (t5 == "stbl") boxes(b, s5, e5) { (t6, s6, e6) =>
                  t6 match {
                    case "stsd" if s6 + 16 <= e6 =>
                      // first sample entry's fourcc sits after ver/flags +
                      // entry_count + the entry's own 4-byte size
                      cCodec = new String(b, s6 + 12, 4, "US-ASCII")
                    case "stts" if s6 + 16 <= e6 =>
                      cDelta = beUInt(b, s6 + 12) // first run's delta
                    case "stsz" if s6 + 12 <= e6 =>
                      val uniform = beInt(b, s6 + 4)
                      val n       = beInt(b, s6 + 8)
                      if (n >= 0 && (uniform != 0 || s6 + 12 + 4L * n <= e6)) {
                        cSizes = Array.tabulate(n) { i =>
                          if (uniform != 0) uniform else beInt(b, s6 + 12 + 4 * i)
                        }
                      }
                    case "stco" if s6 + 8 <= e6 =>
                      val n = beInt(b, s6 + 4)
                      if (n >= 0 && s6 + 8 + 4L * n <= e6)
                        cChunks = Array.tabulate(n)(i => beUInt(b, s6 + 8 + 4 * i))
                    case "co64" if s6 + 8 <= e6 =>
                      val n = beInt(b, s6 + 4)
                      if (n >= 0 && s6 + 8 + 8L * n <= e6)
                        cChunks = Array.tabulate(n)(i => beLong(b, s6 + 8 + 8 * i))
                    case "stsc" if s6 + 8 <= e6 =>
                      val n = beInt(b, s6 + 4)
                      if (n >= 0 && s6 + 8 + 12L * n <= e6)
                        cStsc = Array.tabulate(n) { i =>
                          (beUInt(b, s6 + 8 + 12 * i), beInt(b, s6 + 12 + 12 * i))
                        }
                    case _ => ()
                  }
                }
              }
            }
          }
          if (handler == "vide" && cSizes != null && cChunks != null && cStsc != null) {
            found = true
            codec = cCodec; ts = cTs; delta = cDelta
            sizes = cSizes; chunks = cChunks; stsc = cStsc
          }
        }
      }
    }
    if (!ok || !found || sizes == null || chunks == null || stsc == null) return None
    if (stsc.isEmpty || chunks.isEmpty || sizes.isEmpty) return None
    // expand the stsc run-length map: entry i applies to chunks
    // [first_chunk_i, first_chunk_{i+1}) — 1-based, must start at 1 and
    // be strictly increasing
    if (stsc.head._1 != 1L) return None
    var i = 0
    while (i + 1 < stsc.length) {
      if (stsc(i + 1)._1 <= stsc(i)._1) return None
      i += 1
    }
    val spans  = Vector.newBuilder[(Int, Int)]
    var sample = 0
    var c      = 0 // 0-based chunk index
    var si     = 0 // stsc entry index
    while (c < chunks.length) {
      while (si + 1 < stsc.length && stsc(si + 1)._1 <= c + 1) si += 1
      val spc = stsc(si)._2
      if (spc <= 0) return None
      var k = 0
      var off = chunks(c)
      while (k < spc) {
        if (sample >= sizes.length) return None // stsc maps more samples than stsz has
        val len = sizes(sample)
        if (len < 0 || off < 0 || off + len > b.length) return None
        spans += ((off.toInt, len))
        off += len
        sample += 1
        k += 1
      }
      c += 1
    }
    if (sample != sizes.length) return None // chunks ended before all samples placed
    Some(Mp4SampleTable(codec, ts, delta, spans.result()))
  }

  private val JpegCodecs = Set("jpeg", "mjpa", "mjpb", "MJPG", "AVDJ")

  /** Full decode: container metadata via [[MediaPipeline.mp4Meta]], sample
    * spans via [[sampleTable]], and every MJPEG sample through the JDK
    * ImageIO codec. A sample that fails to decode — or a non-JPEG codec, or
    * a track with no samples — drops the whole container to None: a
    * half-decoded video must not pass as complete (same contract as
    * [[AviCodec.decodeAvi]]).
    */
  def decodeMp4(b: Array[Byte]): Option[Mp4Video] =
    for {
      meta <- MediaPipeline.mp4Meta(b)
      st   <- sampleTable(b)
      if JpegCodecs.contains(st.codec) && st.samples.nonEmpty && st.mediaTimescale > 0
      decoded = st.samples.map { case (off, len) =>
        if (len >= 2 && (b(off) & 0xff) == 0xff && (b(off + 1) & 0xff) == 0xd8)
          PixelCodec.decodeJpeg(java.util.Arrays.copyOfRange(b, off, off + len))
        else None
      }
      if decoded.forall(_.isDefined)
    } yield Mp4Video(
      meta.width,
      meta.height,
      st.sampleDelta * 1000000L / st.mediaTimescale,
      decoded.flatten.toVector
    )
}
