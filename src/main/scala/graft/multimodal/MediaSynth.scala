package graft.multimodal

/** Deterministic REAL media payloads for the gate corpus — the piece
  * that makes the `mm_*` hash gates exercise the production decoders
  * instead of only the stub fallback: half of each kind's rows
  * ([[isReal]]: `(doc_id / 3) % 2 == 0`) carry a genuinely decodable
  * file whose every parameter is a CLOSED FORM of `doc_id`, so the
  * DuckDB oracle re-derives the decoded features from `doc_id`
  * arithmetic alone. The gate then passes ONLY if
  * [[Multimodal.decodeHeaders]] / [[ImageDedup.decodeQoiPixels]] /
  * [[AudioFeatures.decodeWavPcm]] parse the real container correctly
  * — a wrong byte order, a misplaced box, an off-by-one in the chunk
  * walk all become hash mismatches. The other half keeps the text
  * bytes (undecodable), pinning the stub fallback in the same gate.
  *
  * Formats synthesized (all public specs, all already decoded by the
  * pure-JVM decoders):
  *  - image rows (`doc_id % 3 == 0`): QOI (qoiformat.org) — header +
  *    one QOI_OP_RGB per pixel + 8-byte end marker; gray gradient
  *    pixels `(doc_id·7 + y·31 + x·13) mod 256`;
  *  - audio rows (`doc_id % 3 == 1`): canonical PCM WAV — RIFF/fmt/
  *    data, 8 kHz 16-bit mono, samples
  *    `(doc_id·31 + i·97) mod 4001 − 2000`;
  *  - video rows (`doc_id % 3 == 2`): ISO-BMFF MP4 — ftyp +
  *    moov(mvhd v0, trak(tkhd v0 16.16 dims, mdia/minf/stbl/stts)).
  *
  * Every payload length is itself a closed form ([[realByteLen]]), so
  * metadata-only rollups stay oracle-expressible without touching the
  * binary column.
  */
object MediaSynth {

  /** Which corpus rows carry a real payload: exactly half of each
    * kind (kind is `doc_id % 3`, so `doc_id / 3` alternates within a
    * kind). */
  def isReal(docId: Long): Boolean = (docId / 3) % 2 == 0

  // ── closed-form parameters (the oracle re-derives all of these) ───

  def qoiWidth(docId: Long): Int = 8 + (docId % 9).toInt
  def qoiHeight(docId: Long): Int = 8 + (docId % 7).toInt
  def qoiGray(docId: Long, x: Int, y: Int): Int =
    ((docId * 7 + y * 31 + x * 13) % 256).toInt

  def wavFrames(docId: Long): Int = 64 + (docId % 192).toInt
  def wavSample(docId: Long, i: Int): Short =
    ((docId * 31 + i * 97) % 4001 - 2000).toShort
  val WavRate = 8000

  def mp4Width(docId: Long): Int = 320 + (docId % 17).toInt * 16
  def mp4Height(docId: Long): Int = 240 + (docId % 13).toInt * 8
  def mp4DurationMs(docId: Long): Long = 1000L + docId % 5000
  def mp4Frames(docId: Long): Long = 10L + docId % 50
  /** ftyp(16) + moov(8 + mvhd(108) + trak(8 + tkhd(92) + mdia(8 +
    * minf(8 + stbl(8 + stts(24)))))) — constant by construction. */
  val Mp4ByteLen = 280

  /** Payload length without synthesizing (the `byte_len` oracle). */
  def realByteLen(docId: Long): Long = (docId % 3) match {
    case 0 => 22L + 4L * qoiWidth(docId) * qoiHeight(docId)
    case 1 => 44L + 2L * wavFrames(docId)
    case _ => Mp4ByteLen.toLong
  }

  /** [[realByteLen]] as a SQL CASE over `doc_id` — the ONE textual
    * twin of the closed forms, shared by the Spark-declarative
    * metadata path ([[Multimodal.mediaMeta]]) and the DuckDB oracle
    * (SparkEntry interpolates this same string), so a payload-writer
    * change can no longer silently desync one of three hand-written
    * copies. Dialect-neutral (integer CASE, %, + and multiply only);
    * MultimodalSpec pins it equal to [[realByteLen]] over an id
    * range. */
  val realByteLenSql: String =
    s"CASE doc_id % 3 WHEN 0 THEN 22 + 4 * (8 + doc_id % 9) * (8 + doc_id % 7)" +
      s" WHEN 1 THEN 44 + 2 * (64 + doc_id % 192) ELSE $Mp4ByteLen END"

  /** The corpus payload: a real decodable file for [[isReal]] rows,
    * the raw text bytes (stub fallback) otherwise. */
  def payload(docId: Long, text: String): Array[Byte] =
    if (!isReal(docId)) text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    else (docId % 3) match {
      case 0 => qoi(docId)
      case 1 => wav(docId)
      case _ => mp4(docId)
    }

  // ── byte-level writers ────────────────────────────────────────────

  private def be32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }
  private def le32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }
  private def le16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  /** QOI: 14-byte header, one QOI_OP_RGB (0xfe r g b) per pixel in
    * row-major order, the spec's 8-byte end marker. Uncompressed by
    * choice (RGB ops are always legal), so the length is exact. */
  def qoi(docId: Long): Array[Byte] = {
    // one QOI writer per engine: ImageResize's canonical encoder
    // (byte-identical layout; any divergence breaks the mm gates)
    val w = qoiWidth(docId); val h = qoiHeight(docId)
    ImageResize.qoiEncode(w, h, Array.tabulate(w * h) { i =>
      val v = qoiGray(docId, i % w, i / w)
      (0xff << 24) | (v << 16) | (v << 8) | v
    })
  }

  /** Canonical PCM WAV: RIFF(WAVE) + fmt(16, PCM, mono, 8 kHz,
    * 16-bit) + data(2·frames), little-endian samples. */
  def wav(docId: Long): Array[Byte] = {
    // one WAV writer per engine: AudioResample's canonical encoder
    // (byte-identical layout; any divergence breaks the mm gates)
    AudioResample.wavEncode(WavRate,
      Array.tabulate(wavFrames(docId))(i => wavSample(docId, i)))
  }

  private def box(tpe: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(8 + body.length)
    be32(out, 8 + body.length)
    tpe.foreach(c => out.write(c))
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** ISO-BMFF MP4: ftyp + moov(mvhd v0 [timescale 1000, duration =
    * duration_ms], trak(tkhd v0 [16.16 fixed dims],
    * mdia/minf/stbl/stts [one entry: mp4Frames samples])). Full-size
    * boxes (complete mvhd/tkhd field layouts), no mdat — the decoder
    * never reads samples and a real demuxer would stop at the missing
    * media data, exactly the honesty boundary the stub banner draws. */
  def mp4(docId: Long): Array[Byte] = {
    val mvhdBody = new java.io.ByteArrayOutputStream(100)
    be32(mvhdBody, 0)                       // version 0 + flags
    be32(mvhdBody, 0); be32(mvhdBody, 0)    // ctime, mtime
    be32(mvhdBody, 1000)                    // timescale
    be32(mvhdBody, mp4DurationMs(docId).toInt) // duration (ticks = ms)
    be32(mvhdBody, 0x00010000)              // rate 1.0
    mvhdBody.write(1); mvhdBody.write(0)    // volume 1.0
    var i = 0
    while (i < 10 + 36 + 24) { mvhdBody.write(0); i += 1 } // reserved+matrix+predef
    be32(mvhdBody, 2)                       // next track id
    val tkhdBody = new java.io.ByteArrayOutputStream(84)
    be32(tkhdBody, 7)                       // version 0, flags enabled
    be32(tkhdBody, 0); be32(tkhdBody, 0)    // ctime, mtime
    be32(tkhdBody, 1)                       // track id
    be32(tkhdBody, 0)                       // reserved
    be32(tkhdBody, mp4DurationMs(docId).toInt)
    i = 0
    while (i < 8 + 8 + 36) { tkhdBody.write(0); i += 1 } // reserved+layer…+matrix
    be32(tkhdBody, mp4Width(docId) << 16)   // 16.16 fixed
    be32(tkhdBody, mp4Height(docId) << 16)
    val sttsBody = new java.io.ByteArrayOutputStream(16)
    be32(sttsBody, 0)                       // version + flags
    be32(sttsBody, 1)                       // entry count
    be32(sttsBody, mp4Frames(docId).toInt)  // sample count
    be32(sttsBody, 1)                       // sample delta
    val trak = box("trak", box("tkhd", tkhdBody.toByteArray) ++
      box("mdia", box("minf", box("stbl", box("stts", sttsBody.toByteArray)))))
    val moov = box("moov", box("mvhd", mvhdBody.toByteArray) ++ trak)
    val ftypBody = new java.io.ByteArrayOutputStream(8)
    "isom".foreach(c => ftypBody.write(c))
    be32(ftypBody, 0)
    box("ftyp", ftypBody.toByteArray) ++ moov
  }

  // ── uncompressed AVI (real FRAME PIXELS — the video twin of the
  //    QOI/WAV payloads; public RIFF AVI layout, 24-bit DIB frames) ──

  def aviWidth(docId: Long): Int = 8 + (docId % 5).toInt
  def aviHeight(docId: Long): Int = 8 + (docId % 3).toInt
  def aviFrames(docId: Long): Int = 3 + (docId % 4).toInt
  def aviGray(docId: Long, f: Int, x: Int, y: Int): Int =
    ((docId * 5 + f * 17 + y * 29 + x * 11) % 256).toInt

  private def leChunk(out: java.io.ByteArrayOutputStream, id: String,
      body: Array[Byte]): Unit = {
    id.foreach(c => out.write(c))
    le32(out, body.length)
    out.write(body, 0, body.length)
    if ((body.length & 1) == 1) out.write(0) // RIFF chunks are word-aligned
  }

  private def leList(kind: String, fourcc: String,
      body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + 12)
    kind.foreach(c => out.write(c))
    le32(out, body.length + 4)
    fourcc.foreach(c => out.write(c))
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** Canonical uncompressed AVI: RIFF('AVI ') { LIST('hdrl'){ avih,
    * LIST('strl'){ strh('vids'/'DIB '), strf(BITMAPINFOHEADER 24bpp
    * BI_RGB) } }, LIST('movi'){ '00db' raw bottom-up BGR frames × n } }.
    * Every frame pixel is the closed form [[aviGray]], so an oracle
    * re-derives full frame CONTENT from doc_id — unlike the MP4 rows,
    * whose honest boundary stops at headers. */
  def avi(docId: Long): Array[Byte] = {
    val w = aviWidth(docId); val h = aviHeight(docId); val n = aviFrames(docId)
    val rowSize = ((24 * w + 31) / 32) * 4
    val avih = new java.io.ByteArrayOutputStream(56)
    le32(avih, 100000)          // microseconds per frame (10 fps)
    le32(avih, rowSize * h * 10) // max bytes per sec
    le32(avih, 0); le32(avih, 0) // padding, flags
    le32(avih, n)               // total frames
    le32(avih, 0); le32(avih, 1) // initial frames, streams
    le32(avih, rowSize * h)     // suggested buffer
    le32(avih, w); le32(avih, h)
    var i = 0
    while (i < 16) { avih.write(0); i += 1 } // reserved[4]
    val strh = new java.io.ByteArrayOutputStream(56)
    "vids".foreach(c => strh.write(c)); "DIB ".foreach(c => strh.write(c))
    le32(strh, 0); le32(strh, 0); le32(strh, 0) // flags, prio+lang, initial
    le32(strh, 1); le32(strh, 10) // scale, rate (10 fps)
    le32(strh, 0); le32(strh, n)  // start, length
    le32(strh, rowSize * h); le32(strh, 0xffffffff.toInt); le32(strh, 0) // buf, quality, sampleSize
    le32(strh, 0); le32(strh, (h << 16) | w) // rcFrame
    val strf = new java.io.ByteArrayOutputStream(40)
    le32(strf, 40); le32(strf, w); le32(strf, h)
    strf.write(1); strf.write(0); strf.write(24); strf.write(0) // planes, bpp
    le32(strf, 0); le32(strf, rowSize * h) // BI_RGB, sizeImage
    le32(strf, 0); le32(strf, 0); le32(strf, 0); le32(strf, 0)
    val strlBody = new java.io.ByteArrayOutputStream(120)
    leChunk(strlBody, "strh", strh.toByteArray)
    leChunk(strlBody, "strf", strf.toByteArray)
    val hdrlBody = new java.io.ByteArrayOutputStream(200)
    leChunk(hdrlBody, "avih", avih.toByteArray)
    hdrlBody.write(leList("LIST", "strl", strlBody.toByteArray))
    val moviBody = new java.io.ByteArrayOutputStream(n * rowSize * h + 16 * n)
    var f = 0
    while (f < n) {
      val frame = new Array[Byte](rowSize * h)
      var row = 0
      while (row < h) {
        val y = h - 1 - row // bottom-up storage like BMP
        var x = 0
        while (x < w) {
          val v = aviGray(docId, f, x, y)
          val p = row * rowSize + x * 3
          frame(p) = v.toByte; frame(p + 1) = v.toByte; frame(p + 2) = v.toByte
          x += 1
        }
        row += 1
      }
      leChunk(moviBody, "00db", frame)
      f += 1
    }
    val riffBody = new java.io.ByteArrayOutputStream(1024)
    riffBody.write(leList("LIST", "hdrl", hdrlBody.toByteArray))
    riffBody.write(leList("LIST", "movi", moviBody.toByteArray))
    leList("RIFF", "AVI ", riffBody.toByteArray)
  }

  // ── extended WAV (stereo / 8-bit; [[AudioFeatures]] downmixes) ───

  def wavExtChannels(docId: Long): Int = 1 + (docId % 2).toInt
  /** IEEE-float class (doc_id % 9 == 5, overriding the % 4 format
    * cycle): format 3, 32-bit floats s16 / 32768 — EXACT in binary
    * (|s16| < 2^12), so the decoder's rint(f · 32768) projection
    * reproduces [[wavExtSample16]] and the oracle's 16-bit closed
    * form covers the class unchanged. */
  def wavExtFloat(docId: Long): Boolean = docId % 9 == 5
  /** 24-bit PCM class (doc_id % 9 == 7 override): samples are
    * s16 · 256 + an even low byte — the 24-bit FLAC construction —
    * so the decoder's floor `>> 8` projection reproduces
    * [[wavExtSample16]] exactly. */
  def wavExtPcm24(docId: Long): Boolean = docId % 9 == 7
  /** Format class by doc_id % 4: PCM16 / PCM8 / µ-law / A-law;
    * the % 9 == 5 override is IEEE float (format 3), % 9 == 7
    * 24-bit PCM. */
  def wavExtFormat(docId: Long): Int =
    if (wavExtFloat(docId)) 3
    else if (wavExtPcm24(docId)) 1
    else (docId % 4) match {
      case 0 => 1; case 1 => 1; case 2 => 7; case _ => 6
    }
  def wavExtBits(docId: Long): Int =
    if (wavExtFloat(docId)) 32
    else if (wavExtPcm24(docId)) 24
    else if (docId % 4 == 0) 16 else 8
  /** The 24-bit class's low byte (even — shared convention with
    * [[flacLow]]). */
  def wavExtLow(docId: Long, ch: Int, i: Int): Int =
    ((docId * 17 + i * 11 + ch * 5) % 128).toInt * 2
  def wavExtFrames(docId: Long): Int = 32 + (docId % 64).toInt
  def wavExtRate(docId: Long): Int = 8000 + 525 * (docId % 4).toInt

  /** Closed-form per-channel samples: 16-bit signed, 8-bit raw
    * unsigned (decodes as (raw−128)·256) — the `mm_audio_features_ext`
    * oracle re-synthesizes the exact downmixed stream from these. */
  def wavExtSample16(docId: Long, ch: Int, i: Int): Int =
    ((docId * 31 + i * 97 + ch * 53) % 4001 - 2000).toInt
  def wavExtByte8(docId: Long, ch: Int, i: Int): Int =
    ((docId * 13 + i * 29 + ch * 7) % 256).toInt

  /** A real WAV in the EXTENDED profile: mono/stereo by doc_id
    * parity; PCM16 / PCM8 / G.711 µ-law / A-law by doc_id % 4 (the
    * telephony formats carry [[wavExtByte8]] raw codewords the
    * decoder expands through the canonical CCITT arithmetic); varying
    * sample rate — the fixture behind the downmix + widening +
    * companding gate. */
  def wavExt(docId: Long): Array[Byte] = {
    val c = wavExtChannels(docId); val bits = wavExtBits(docId)
    val fmt = wavExtFormat(docId)
    val n = wavExtFrames(docId); val rate = wavExtRate(docId)
    val bps = bits / 8
    val dataLen = n * c * bps
    val out = new java.io.ByteArrayOutputStream(44 + dataLen + 1)
    "RIFF".foreach(ch0 => out.write(ch0))
    le32(out, 4 + 24 + 8 + dataLen + (dataLen & 1))
    "WAVE".foreach(ch0 => out.write(ch0))
    "fmt ".foreach(ch0 => out.write(ch0))
    le32(out, 16); le16(out, fmt); le16(out, c)
    le32(out, rate); le32(out, rate * c * bps)
    le16(out, c * bps); le16(out, bits)
    "data".foreach(ch0 => out.write(ch0))
    le32(out, dataLen)
    var i = 0
    while (i < n) {
      var ch = 0
      while (ch < c) {
        if (fmt == 3)
          le32(out, java.lang.Float.floatToIntBits(
            wavExtSample16(docId, ch, i) / 32768.0f))
        else if (bits == 24) {
          val v = wavExtSample16(docId, ch, i) * 256 +
            wavExtLow(docId, ch, i)
          out.write(v & 0xff); out.write((v >> 8) & 0xff)
          out.write((v >> 16) & 0xff)
        }
        else if (bits == 16) le16(out, wavExtSample16(docId, ch, i) & 0xffff)
        else out.write(wavExtByte8(docId, ch, i))
        ch += 1
      }
      i += 1
    }
    if ((dataLen & 1) == 1) out.write(0) // RIFF word alignment
    out.toByteArray
  }

  // ── GIF (closed-form indexed pixels over LZW; [[Gif]] decodes) ───

  def gifW(docId: Long): Int = 8 + (docId % 10).toInt
  def gifH(docId: Long): Int = 8 + (docId % 7).toInt

  /** Per-pixel closed-form palette index (= gray; the palette maps
    * g → (g, (g+85)%256, (g+170)%256), the shared channel
    * derivation). LZW is lossless, so the `mm_gif_decode` oracle
    * recomputes pixel sums verbatim. */
  def gifGray(docId: Long, x: Int, y: Int): Int =
    (((docId * 19 + x * 23 + y * 41) % 256 + 256) % 256).toInt

  /** A real GIF89a stream for the doc: logical screen descriptor,
    * 256-entry global color table, image descriptor (docs with
    * docId % 6 == 2 ROW-INTERLACED — lossless reordering, same
    * closed forms), and a genuinely LZW-coded index stream: CLEAR
    * before every literal keeps the dictionary empty so the code
    * width stays fixed — a legal (if unambitious) LZW encoding the
    * decoder must handle exactly like an optimal one. */
  def gif(docId: Long): Array[Byte] =
    gifOf(gifW(docId), gifH(docId), (x, y) => gifGray(docId, x, y),
      interlaced = docId % 6 == 2)

  /** The generalized writer (dims + per-pixel index + interlace). */
  def gifOf(w: Int, h: Int, gray: (Int, Int) => Int,
      interlaced: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(w * h * 3)
    "GIF89a".foreach(c => out.write(c))
    le16(out, w); le16(out, h)
    out.write(0xf7) // global table, 256 entries, 8-bit color resolution
    out.write(0); out.write(0) // background, aspect
    var g = 0
    while (g < 256) { // palette entry g -> the shared channel derivation
      out.write(g); out.write((g + 85) % 256); out.write((g + 170) % 256)
      g += 1
    }
    out.write(0x2c) // image descriptor
    le16(out, 0); le16(out, 0); le16(out, w); le16(out, h)
    out.write(if (interlaced) 0x40 else 0)
    // LZW payload: minCodeSize 8 -> 9-bit codes, LSB-first
    out.write(8)
    val clear = 256; val end = 257
    val bits = new java.io.ByteArrayOutputStream(w * h * 3)
    var acc = 0L; var n = 0
    def put(v: Int): Unit = {
      acc |= v.toLong << n; n += 9
      while (n >= 8) { bits.write((acc & 0xff).toInt); acc >>>= 8; n -= 8 }
    }
    val rows: Seq[Int] =
      if (!interlaced) 0 until h
      else (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++
        (1 until h by 2)
    rows.foreach { y =>
      var x = 0
      while (x < w) { put(clear); put(gray(x, y)); x += 1 }
    }
    put(end)
    if (n > 0) bits.write((acc & 0xff).toInt)
    val data = bits.toByteArray
    var p = 0
    while (p < data.length) { // <= 255-byte sub-blocks
      val sz = math.min(255, data.length - p)
      out.write(sz)
      out.write(data, p, sz)
      p += sz
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ── MJPEG-in-AVI (block-constant JPEG frames; [[VideoFrames]] +
  //    [[Jpeg]] decode by composition) ────────────────────────────

  def mjpegNbx(docId: Long): Int = 1 + (docId % 3).toInt
  def mjpegNby(docId: Long): Int = 1 + (docId % 2).toInt

  /** Per-frame per-BLOCK solid gray (same closed-form family as
    * [[aviGray]], at block granularity — block-constant content is
    * what keeps the lossy per-frame codec gate-exact, the
    * [[jpegGray]] argument lifted to the time axis). */
  def mjpegGray(docId: Long, f: Int, bx: Int, by: Int): Int =
    (((docId * 5 + f * 17 + by * 29 + bx * 11) % 256 + 256) % 256).toInt

  /** An MJPEG AVI for the doc: the [[avi]] container with
    * biCompression 'MJPG' and one complete baseline JPEG
    * ([[jpegOf]]) per '00dc' chunk. Frame count matches [[avi]]'s
    * ([[aviFrames]]). */
  def aviMjpeg(docId: Long): Array[Byte] =
    aviMjpegOf(mjpegNbx(docId), mjpegNby(docId), aviFrames(docId),
      (f, bx, by) => mjpegGray(docId, f, bx, by))

  /** The generalized MJPEG writer (block grid, frame count, per-frame
    * per-block gray) — the near-dup gate plants twins by re-encoding
    * a neighbor's frames with one block of one frame perturbed. */
  def aviMjpegOf(nbx: Int, nby: Int, n: Int,
      gray: (Int, Int, Int) => Int,
      progressiveFrames: Boolean = false): Array[Byte] = {
    val w = 8 * nbx; val h = 8 * nby
    val frames = Array.tabulate(n) { f =>
      if (progressiveFrames) jpegProgressiveOf(nbx, nby,
        (bx, by) => gray(f, bx, by))
      else jpegOf(nbx, nby, (bx, by) => gray(f, bx, by))
    }
    val maxFrame = frames.map(_.length).max
    val avih = new java.io.ByteArrayOutputStream(56)
    le32(avih, 100000)           // microseconds per frame (10 fps)
    le32(avih, maxFrame * 10)    // max bytes per sec
    le32(avih, 0); le32(avih, 0) // padding, flags
    le32(avih, n)                // total frames
    le32(avih, 0); le32(avih, 1) // initial frames, streams
    le32(avih, maxFrame)         // suggested buffer
    le32(avih, w); le32(avih, h)
    var i = 0
    while (i < 16) { avih.write(0); i += 1 } // reserved[4]
    val strh = new java.io.ByteArrayOutputStream(56)
    "vids".foreach(c => strh.write(c)); "MJPG".foreach(c => strh.write(c))
    le32(strh, 0); le32(strh, 0); le32(strh, 0) // flags, prio+lang, initial
    le32(strh, 1); le32(strh, 10) // scale, rate (10 fps)
    le32(strh, 0); le32(strh, n)  // start, length
    le32(strh, maxFrame); le32(strh, 0xffffffff.toInt); le32(strh, 0)
    le32(strh, 0); le32(strh, (h << 16) | w) // rcFrame
    val strf = new java.io.ByteArrayOutputStream(40)
    le32(strf, 40); le32(strf, w); le32(strf, h)
    strf.write(1); strf.write(0); strf.write(24); strf.write(0) // planes, bpp
    "MJPG".foreach(c => strf.write(c)) // biCompression fourcc
    le32(strf, maxFrame) // sizeImage (nominal for compressed streams)
    le32(strf, 0); le32(strf, 0); le32(strf, 0); le32(strf, 0)
    val strlBody = new java.io.ByteArrayOutputStream(120)
    leChunk(strlBody, "strh", strh.toByteArray)
    leChunk(strlBody, "strf", strf.toByteArray)
    val hdrlBody = new java.io.ByteArrayOutputStream(200)
    leChunk(hdrlBody, "avih", avih.toByteArray)
    hdrlBody.write(leList("LIST", "strl", strlBody.toByteArray))
    val moviBody = new java.io.ByteArrayOutputStream(
      frames.map(_.length + 16).sum)
    frames.foreach(fr => leChunk(moviBody, "00dc", fr))
    val riffBody = new java.io.ByteArrayOutputStream(1024)
    riffBody.write(leList("LIST", "hdrl", hdrlBody.toByteArray))
    riffBody.write(leList("LIST", "movi", moviBody.toByteArray))
    leList("RIFF", "AVI ", riffBody.toByteArray)
  }

  // ── PNG (closed-form pixels, all five filters; [[Png]] decodes) ──

  def pngW(docId: Long): Int = 8 + (docId % 11).toInt
  def pngH(docId: Long): Int = 8 + (docId % 6).toInt

  /** Per-pixel closed-form gray — the `mm_png_decode` oracle
    * recomputes pixel sums from this in DuckDB (DEFLATE is lossless,
    * so unlike JPEG no block-constant trick is needed; every pixel
    * survives verbatim). */
  def pngGray(docId: Long, x: Int, y: Int): Int =
    (((docId * 13 + x * 29 + y * 17) % 256 + 256) % 256).toInt

  /** Color type cycles through the five supported profiles:
    * grayscale / truecolor / RGBA / gray+alpha, with HALF the
    * truecolor class (docId % 8 == 1) emitted INDEXED (type 3) over a
    * 256-entry palette whose entry g is exactly the truecolor channel
    * derivation (g, (g+85)%256, (g+170)%256) — byte-identical pixels
    * to type 2, so the `mm_png_decode` oracle's color-type arithmetic
    * is untouched while the PLTE path is hash-pinned. The SUB-BYTE
    * classes (docId % 13 ∈ {5, 9, 11} → 1/2/4-bit grayscale,
    * docId % 13 == 3 → 4-bit indexed over a 16-entry palette) take
    * precedence — low-bit paletted/gray PNGs (icons, early-web) are
    * common in crawls (r13 "What's missing #4"). */
  def pngColorType(docId: Long): Int = (docId % 13) match {
    case 5 | 9 | 11 => 0
    case 3 => 3
    case _ => (docId % 8) match {
      case 1 => 3
      case _ => (docId % 4) match {
        case 0 => 0; case 1 => 2; case 2 => 6; case _ => 4
      }
    }
  }

  /** Bit depth per doc: the sub-byte classes (4/2/1-bit gray,
    * 4-bit indexed), the 16-bit class (docId % 11 == 6, non-indexed),
    * 8-bit otherwise. */
  def pngDepth(docId: Long): Int = (docId % 13) match {
    case 5 | 3 => 4
    case 9 => 2
    case 11 => 1
    case _ => if (docId % 11 == 6 && pngColorType(docId) != 3) 16 else 8
  }

  /** The STORED sample for a pixel: the closed-form gray quantized to
    * the doc's bit depth (right-shift — so the decoded 8-bit value is
    * `(gray >> (8-d)) * 255/(2^d-1)`, which the oracle recomputes).
    * 8/16-bit docs store the gray verbatim (16-bit as gray·257, the
    * exact 8-bit-preserving encoding). */
  def pngSample(docId: Long, x: Int, y: Int): Int =
    pngGray(docId, x, y) >> (8 - math.min(8, pngDepth(docId)))

  /** A real PNG stream for the doc: signature, CRC'd IHDR, the
    * filtered scanlines deflated with `java.util.zip.Deflater` and
    * split across TWO IDAT chunks (the multi-IDAT concat path is part
    * of the spec), IEND. The filter type cycles (docId + y) % 5 per
    * row, so None/Sub/Up/Average/Paeth are all exercised on every
    * image taller than 4 rows. Non-gray color types derive
    * G = (gray+85)%256, B = (gray+170)%256, alpha = (gray+31)%256
    * from the same closed form. Docs with docId % 9 == 7 are ADAM7
    * INTERLACED — interlacing is a lossless pixel reordering, so the
    * `mm_png_decode` closed-form oracle pins the seven-pass path
    * without changing a line of SQL. */
  def png(docId: Long): Array[Byte] =
    pngOf(pngW(docId), pngH(docId), pngColorType(docId),
      (x, y) => pngSample(docId, x, y), y => ((docId + y) % 5).toInt,
      interlaced = docId % 9 == 7,
      depth = pngDepth(docId))

  /** The generalized writer (dims + color type + per-pixel SAMPLE +
    * per-row filter + optional Adam7) — the near-dup gate plants
    * twins by re-rendering a neighbor's frame with a perturbed
    * region. Interlaced output serializes the seven RFC 2083 §2.6
    * passes as independent sub-images (own scanline widths, own
    * filter history, `filterOf` keyed on the pass-local row) into the
    * one zlib stream. `gray` yields the STORED sample at the given
    * depth: for sub-byte depths the caller pre-quantizes (values in
    * [0, 2^d)); 16-bit samples are emitted as s·257 (low byte = high
    * byte — the exact 8-bit-preserving 16-bit encoding, so proper
    * 16→8 scaling round-trips the closed form). Sub-byte rows pack
    * samples MSB-first with row-final padding bits zero (RFC 2083
    * §2.3); the filter stride for depth < 8 is one byte. */
  def pngOf(w: Int, h: Int, colorType: Int, gray: (Int, Int) => Int,
      filterOf: Int => Int, interlaced: Boolean = false,
      depth: Int = 8): Array[Byte] = {
    val channels = colorType match { case 0 => 1; case 2 => 3; case 3 => 1
      case 4 => 2; case 6 => 4
      case _ => sys.error(s"unsupported color type $colorType") }
    require(depth >= 8 || channels == 1, "sub-byte is gray/indexed only")
    val bps = math.max(1, depth / 8)
    val bpp = channels * bps // filter stride in BYTES (min 1)
    // full-frame unfiltered 8-bit channel samples (the filters
    // reference the BYTE stream, built below)
    val ch = Array.tabulate(h, w * channels) { (y, i) =>
      val g = gray(i / channels, y)
      (i % channels, colorType) match {
        case (0, _) => g
        case (1, 2) | (1, 6) => (g + 85) % 256
        case (2, 2) | (2, 6) => (g + 170) % 256
        case (1, 4) | (3, 6) => (g + 31) % 256
        case _ => g
      }
    }
    val layout = (if (!interlaced) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)))
      .map { case (x0, y0, dx, dy) =>
        (x0, y0, dx, dy,
          if (w > x0) (w - x0 + dx - 1) / dx else 0,
          if (h > y0) (h - y0 + dy - 1) / dy else 0)
      }
      .filter(t => t._5 > 0 && t._6 > 0)
    val rawOut = new java.io.ByteArrayOutputStream(h * (1 + w * bpp))
    layout.foreach { case (x0, y0, dx, dy, wp, hp) =>
      // the pass's own unfiltered scanline BYTES: >= 8-bit depths lay
      // samples out big-endian (16-bit as s·257); sub-byte depths
      // pack wp samples MSB-first into ceil(wp·depth/8) bytes
      val rowLen = if (depth >= 8) wp * bpp else (wp * depth + 7) / 8
      val sub = Array.ofDim[Byte](hp, rowLen)
      var yy = 0
      while (yy < hp) {
        if (depth >= 8) {
          var i = 0
          while (i < wp * bpp) {
            val s = ch(yy * dy + y0)((x0 + (i / bpp) * dx) * channels +
              (i % bpp) / bps)
            sub(yy)(i) = s.toByte // s*257 high byte == low byte == s
            i += 1
          }
        } else {
          var x = 0
          while (x < wp) {
            val s = ch(yy * dy + y0)(x0 + x * dx) & ((1 << depth) - 1)
            val bit = x * depth
            sub(yy)(bit / 8) =
              (sub(yy)(bit / 8) | (s << (8 - depth - bit % 8))).toByte
            x += 1
          }
        }
        yy += 1
      }
      var y = 0
      while (y < hp) {
        val ft = filterOf(y)
        rawOut.write(ft)
        var x = 0
        while (x < rowLen) {
          val v = sub(y)(x) & 0xff
          val a = if (x >= bpp) sub(y)(x - bpp) & 0xff else 0
          val b = if (y > 0) sub(y - 1)(x) & 0xff else 0
          val c = if (y > 0 && x >= bpp) sub(y - 1)(x - bpp) & 0xff else 0
          val pred = ft match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) >> 1
            case _ =>
              val pp = a + b - c
              val pa = math.abs(pp - a); val pb = math.abs(pp - b)
              val pc = math.abs(pp - c)
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          }
          rawOut.write((v - pred) & 0xff)
          x += 1
        }
        y += 1
      }
    }
    val raw = rawOut.toByteArray
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val tmp = new Array[Byte](4096)
      while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
      d.end()
      buf.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream(deflated.length + 64)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    def chunk(tpe: String, body: Array[Byte]): Unit = {
      be32(out, body.length)
      val tb = tpe.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(body)
      out.write(tb, 0, 4)
      out.write(body, 0, body.length)
      be32(out, crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream(13)
    be32(ihdr, w); be32(ihdr, h)
    ihdr.write(depth); ihdr.write(colorType); ihdr.write(0); ihdr.write(0)
    ihdr.write(if (interlaced) 1 else 0)
    chunk("IHDR", ihdr.toByteArray)
    if (colorType == 3) {
      // palette entry i -> the truecolor derivation of the SCALED
      // index (scale = 255/(2^d−1): 1 for 8-bit, 17 for the 4-bit
      // class — so a 4-bit index i decodes to the same channels as an
      // 8-bit index i·17, and one oracle arithmetic covers both)
      val n = if (depth < 8) 1 << depth else 256
      val scale = if (depth < 8) 255 / ((1 << depth) - 1) else 1
      chunk("PLTE", Array.tabulate(3 * n) { i =>
        val g = (i / 3) * scale
        (i % 3 match {
          case 0 => g; case 1 => (g + 85) % 256; case _ => (g + 170) % 256
        }).toByte
      })
    }
    val split = deflated.length / 2
    chunk("IDAT", java.util.Arrays.copyOfRange(deflated, 0, split))
    chunk("IDAT", java.util.Arrays.copyOfRange(deflated, split, deflated.length))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ── TIFF (baseline profile, closed-form pixels; [[Tiff]] decodes) ─

  def tiffW(docId: Long): Int = 8 + (docId % 9).toInt
  def tiffH(docId: Long): Int = 8 + (docId % 6).toInt

  /** Per-pixel closed-form gray — TIFF baseline is lossless, so the
    * `mm_tiff_decode` oracle recomputes pixel sums from this. */
  def tiffGray(docId: Long, x: Int, y: Int): Int =
    (((docId * 29 + x * 37 + y * 53) % 256 + 256) % 256).toInt

  /** Photometric class: 1 BlackIsZero gray, 2 RGB (spp 4 with alpha
    * on the id % 8 == 1 half), 3 palette, 0 WhiteIsZero (samples
    * STORED inverted, so decode returns the same closed form). */
  def tiffPhotometric(docId: Long): Int = (docId % 4) match {
    case 0 => 1; case 1 => 2; case 2 => 3; case _ => 0
  }

  /** A real baseline TIFF for the doc: byte order by parity (`II`
    * even, `MM` odd), 4-row strips, PackBits on the id % 3 == 1
    * class, LZW on the id % 3 == 2 class (with the
    * horizontal-differencing Predictor, tag 317 = 2, on its
    * id % 6 == 2 half — the pairing archival TIFFs actually use),
    * the photometric classes above, 16-bit ColorMap entries
    * v·257 so the high-byte projection is exact. The writer never
    * emits the 0x80 control: TIFF 6.0 defines it as a no-op but
    * real decoders disagree (the JDK's PackBits treats it as a
    * repeat — measured in ImageIoDifferentialSpec's development),
    * which is exactly why conforming encoders avoid it; OUR decoder
    * keeps the spec's skip semantics, pinned by a hand-built strip
    * in TiffSpec. */
  def tiff(docId: Long): Array[Byte] =
    tiffOf(docId, tiffW(docId), tiffH(docId))

  /** [[tiff]] at explicit dims — lets specs build LARGE strips whose
    * LZW code stream crosses every width boundary (9→12) and the
    * 4094-entry Clear against the JDK's own TIFF reader. */
  private[multimodal] def tiffOf(docId: Long, w: Int, h: Int): Array[Byte] = {
    val le = docId % 2 == 0
    val photometric = tiffPhotometric(docId)
    val spp = if (photometric == 2) (if (docId % 8 == 1) 4 else 3) else 1
    val packbits = docId % 3 == 1
    val lzw = docId % 3 == 2
    val predictor2 = lzw && docId % 6 == 2 && docId % 19 != 13
    val tiled = docId % 11 == 7 // tags 322-325; 16x16 edge-padded tiles
    val rowsPerStrip = 4
    // separate sample planes (tag 284 = 2), strips only
    val planar2 = docId % 13 == 9 && !tiled &&
      (if (photometric == 2) true else false)
    // 16-bit class (strips only, no palette/predictor): samples are
    // v*257 = (v, v) in EITHER byte order, so the decoder's
    // round(v16*255/65535) scale-back is exact and the oracle holds
    val bits16 = docId % 19 == 13 && photometric != 3 && !tiled && !planar2

    // post-photometric stored bytes
    val data = new Array[Byte](w * h * spp)
    for (y <- 0 until h; x <- 0 until w) {
      val g = tiffGray(docId, x, y)
      val q = (y * w + x) * spp
      photometric match {
        case 0 => data(q) = (255 - g).toByte // WhiteIsZero stores inverted
        case 1 => data(q) = g.toByte
        case 3 => data(q) = g.toByte // palette index
        case _ =>
          data(q) = g.toByte
          data(q + 1) = ((g + 85) % 256).toByte
          data(q + 2) = ((g + 170) % 256).toByte
          if (spp == 4) data(q + 3) = ((g + 31) % 256).toByte
      }
    }
    // 16-bit expansion: each stored byte v becomes the two bytes of
    // v*257 — identical in both byte orders (hi = lo = v)
    val (data16, sampleBytes) =
      if (!bits16) (data, 1)
      else {
        val d = new Array[Byte](data.length * 2)
        var i = 0
        while (i < data.length) {
          d(2 * i) = data(i); d(2 * i + 1) = data(i); i += 1
        }
        (d, 2)
      }

    val tileW = 16; val tileH = 16
    val tilesAcross = (w + tileW - 1) / tileW
    val rawSegs: Seq[(Array[Byte], Int)] = // (segment bytes, row bytes)
      if (tiled) {
        val down = (h + tileH - 1) / tileH
        for (ty <- 0 until down; tx <- 0 until tilesAcross) yield {
          // full-size tile, zero-padded past the image edge
          val tile = new Array[Byte](tileW * tileH * spp)
          val copyW = math.min(tileW, w - tx * tileW) * spp
          val copyH = math.min(tileH, h - ty * tileH)
          for (y <- 0 until copyH)
            System.arraycopy(data, ((ty * tileH + y) * w + tx * tileW) * spp,
              tile, y * tileW * spp, copyW)
          (tile, tileW * spp)
        }
      } else if (planar2) {
        // plane-major strip runs: all of sample 0's strips, then 1's…
        for (c <- 0 until spp; y0 <- 0 until h by rowsPerStrip) yield {
          val rows = math.min(rowsPerStrip, h - y0)
          val seg = new Array[Byte](rows * w)
          for (y <- 0 until rows; x <- 0 until w)
            seg(y * w + x) = data(((y0 + y) * w + x) * spp + c)
          (seg, w)
        }
      } else (0 until h by rowsPerStrip).map { y0 =>
        val rowB = w * spp * sampleBytes
        (java.util.Arrays.copyOfRange(data16, y0 * rowB,
          math.min(h, y0 + rowsPerStrip) * rowB), rowB)
      }
    val strips = rawSegs.map { case (raw0, rowB) =>
      val raw =
        if (!predictor2) raw0
        else { // horizontal differencing, per row, per channel
          // a planar segment holds ONE channel, so its per-pixel
          // stride is 1, not spp (ADVICE r15 — the classes are
          // disjoint today, docId%6==2 is even while planar2 needs
          // docId%4==1 odd, but the stride must be right per segment
          // if they ever co-occur)
          val stride = if (planar2) 1 else spp
          val d = raw0.clone()
          for (y <- 0 until raw0.length / rowB; q <- (rowB - 1) to stride by -1)
            d(y * rowB + q) = (d(y * rowB + q) - d(y * rowB + q - stride)).toByte
          d
        }
      if (lzw) tiffLzw(raw)
      else if (!packbits) raw
      else {
        val out = new java.io.ByteArrayOutputStream(raw.length + 16)
        var i = 0
        while (i < raw.length) {
          var run = 1
          while (i + run < raw.length && raw(i + run) == raw(i) && run < 128)
            run += 1
          if (run >= 2) { out.write(1 - run); out.write(raw(i)); i += run }
          else {
            var j = i + 1
            while (j < raw.length && j - i < 128 &&
              !(j + 2 < raw.length && raw(j) == raw(j + 1) &&
                raw(j) == raw(j + 2))) j += 1
            out.write(j - i - 1); out.write(raw, i, j - i); i = j
          }
        }
        out.toByteArray
      }
    }

    val out = new java.io.ByteArrayOutputStream(data.length + 512)
    def w16(v: Int): Unit =
      if (le) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Int): Unit =
      if (le) { out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
      else { out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
        out.write((v >> 8) & 0xff); out.write(v & 0xff) }

    // [header][strip data][pad][IFD][aux values]
    out.write(if (le) 'I' else 'M'); out.write(if (le) 'I' else 'M')
    w16(42)
    val stripOffsets = strips.scanLeft(8)(_ + _.length).init
    val dataEnd = 8 + strips.map(_.length).sum
    val ifdOff = dataEnd + (dataEnd & 1) // IFDs sit at even offsets
    w32(ifdOff)
    strips.foreach(s => out.write(s, 0, s.length))
    if ((dataEnd & 1) == 1) out.write(0)

    case class Entry(tag: Int, tpe: Int, count: Int,
      inline: Option[Int], aux: Seq[Int])
    val multiStrip = strips.length > 1
    val entries = Seq(
      Entry(256, 3, 1, Some(w), Nil),
      Entry(257, 3, 1, Some(h), Nil),
      if (spp == 1) Entry(258, 3, 1, Some(if (bits16) 16 else 8), Nil)
      else Entry(258, 3, spp, None, Seq.fill(spp)(if (bits16) 16 else 8)),
      Entry(259, 3, 1,
        Some(if (packbits) 32773 else if (lzw) 5 else 1), Nil),
      Entry(262, 3, 1, Some(photometric), Nil),
      if (tiled) Entry(277, 3, 1, Some(spp), Nil)
      else if (multiStrip) Entry(273, 4, strips.length, None, stripOffsets)
      else Entry(273, 4, 1, Some(stripOffsets.head), Nil)) ++
      (if (tiled) Nil
      else Seq(Entry(277, 3, 1, Some(spp), Nil),
        Entry(278, 3, 1, Some(rowsPerStrip), Nil),
        if (multiStrip) Entry(279, 4, strips.length, None,
          strips.map(_.length))
        else Entry(279, 4, 1, Some(strips.head.length), Nil))) ++
      Seq(Entry(284, 3, 1, Some(if (planar2) 2 else 1), Nil)) ++
      // IFD entries stay tag-sorted: 317 between 284 and 320
      (if (predictor2) Seq(Entry(317, 3, 1, Some(2), Nil)) else Nil) ++
      (if (photometric == 3)
        Seq(Entry(320, 3, 768, None,
          // entry i: the truecolor derivation of i, as v*257
          (0 until 256).map(i => i * 257) ++
            (0 until 256).map(i => ((i + 85) % 256) * 257) ++
            (0 until 256).map(i => ((i + 170) % 256) * 257)))
      else Nil) ++
      // tile geometry + segments (tag-sorted after 320)
      (if (tiled) Seq(
        Entry(322, 3, 1, Some(tileW), Nil),
        Entry(323, 3, 1, Some(tileH), Nil),
        if (strips.length > 1) Entry(324, 4, strips.length, None, stripOffsets)
        else Entry(324, 4, 1, Some(stripOffsets.head), Nil),
        if (strips.length > 1) Entry(325, 4, strips.length, None,
          strips.map(_.length))
        else Entry(325, 4, 1, Some(strips.head.length), Nil))
      else Nil) ++
      // the 4th sample is declared unassociated alpha (tag 338) so
      // foreign readers agree with our interpretation
      (if (spp == 4) Seq(Entry(338, 3, 1, Some(2), Nil)) else Nil)

    w16(entries.length)
    var auxOff = ifdOff + 2 + entries.length * 12 + 4
    entries.foreach { en =>
      w16(en.tag); w16(en.tpe); w32(en.count)
      en.inline match {
        case Some(v) =>
          // a SHORT value occupies the slot's first two bytes in the
          // file's byte order; a LONG fills it
          if (en.tpe == 3) { w16(v); w16(0) } else w32(v)
        case None =>
          w32(auxOff)
          auxOff += en.aux.length * (if (en.tpe == 3) 2 else 4)
      }
    }
    w32(0) // no next IFD
    entries.foreach { en =>
      if (en.inline.isEmpty)
        en.aux.foreach(v => if (en.tpe == 3) w16(v) else w32(v))
    }
    out.toByteArray
  }

  /** TIFF-variant LZW encoder (TIFF 6.0 §13): MSB-first code
    * packing, widths 9→12 bumping at the early-change boundary
    * (next entry index == 2^width - 1), a leading Clear, a Clear
    * when the table reaches entry 4094 (the libtiff convention),
    * EOI last. The exact mirror of [[Tiff.lzwStrip]] — TiffLzwSpec
    * roundtrips both across every width boundary. */
  private[multimodal] def tiffLzw(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 16)
    var acc = 0L; var nbits = 0
    var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code; nbits += width
      while (nbits >= 8) {
        out.write(((acc >>> (nbits - 8)) & 0xff).toInt); nbits -= 8
      }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var next = 258
    put(256) // leading Clear
    var omega = -1
    var i = 0
    while (i < raw.length) {
      val k = raw(i) & 0xff
      if (omega < 0) omega = k
      else {
        val key = Integer.valueOf((omega << 8) | k)
        val hit = dict.get(key)
        if (hit != null) omega = hit.intValue()
        else {
          put(omega)
          dict.put(key, Integer.valueOf(next)); next += 1
          // the encoder bumps one entry LATER than the decoder
          // ((1<<w) vs (1<<w)-1, the libtiff pair): the decoder's
          // add count runs one code behind, and this asymmetry is
          // exactly the "early change" the TIFF spec describes
          if (width < 12 && next == (1 << width)) width += 1
          if (next == 4094) { // table nearly full: clear and restart
            put(256)
            dict.clear(); next = 258; width = 9
          }
          omega = k
        }
      }
      i += 1
    }
    if (omega >= 0) put(omega)
    // the decoder performs one more add while PROCESSING the flush
    // code above (the encoder has no paired add for it), so when that
    // phantom add lands exactly on the decoder's early-change
    // boundary the EOI must be written one bit wider — without this,
    // a strip whose dictionary ends exactly at 510/1022/2046 entries
    // desyncs on the EOI read (code-review r15)
    if (width < 12 && next == (1 << width) - 1) width += 1
    put(257) // EOI
    if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xff).toInt)
    out.toByteArray
  }

  // ── FLAC (lossless closed-form samples; [[Flac]] decodes) ────────

  def flacChannels(docId: Long): Int = 1 + (docId % 2).toInt
  def flacFrames(docId: Long): Int = 64 + (docId % 96).toInt
  def flacRate(docId: Long): Int = 8000 + 525 * (docId % 4).toInt

  /** Source sample closed form — the wasted-bits class (id % 13 == 6)
    * uses even samples, so every subframe stores s >> 1 behind one
    * wasted bit and reconstructs losslessly. */
  def flacSample(docId: Long, ch: Int, i: Int): Int =
    if (docId % 13 == 6)
      (((docId * 37 + i * 101 + ch * 59) % 2001).toInt - 1000) * 2
    else ((docId * 37 + i * 101 + ch * 59) % 4001).toInt - 2000

  /** Effective sample: blocks where (id + i/64) % 5 == 0 are CONSTANT
    * (every sample equals the block-start closed form) so the
    * CONSTANT subframe class is honestly exercised; the oracle
    * mirrors the CASE. */
  def flacEffSample(docId: Long, ch: Int, i: Int): Int =
    if ((docId + i / 64) % 5 == 0) flacSample(docId, ch, (i / 64) * 64)
    else flacSample(docId, ch, i)

  /** Stream sample size: the id % 7 == 2 class carries REAL 24-bit
    * streams (r14 ask #7). Their samples are the 16-bit closed form
    * shifted up with a non-trivial low byte ([[flacLow]]), so the
    * decoder's explicit `>> (bps - 16)` projection into the 16-bit
    * fingerprint domain reproduces [[flacEffSample]] exactly — the
    * `mm_flac_decode` oracle and every fingerprint gate are
    * byte-for-byte unchanged while the streams themselves exercise
    * the 24-bit subframe/residual paths. */
  def flacBps(docId: Long): Int = if (docId % 7 == 2) 24 else 16

  /** 24-bit class low byte — EVEN, so the wasted-bits class
    * (id % 13 == 6) keeps its shared factor of 2. */
  def flacLow(docId: Long, ch: Int, i: Int): Int =
    ((docId * 13 + i * 7 + ch * 3) % 128).toInt * 2

  /** Effective sample in the STREAM's bit depth (what flacOf
    * encodes): the 24-bit class is s16 * 256 + low, floor-shifting
    * back to s16 under the decoder's projection since low ∈ [0, 256). */
  def flacEffStreamSample(docId: Long, ch: Int, i: Int): Int = {
    val j = if ((docId + i / 64) % 5 == 0) (i / 64) * 64 else i
    if (flacBps(docId) == 24)
      flacSample(docId, ch, j) * 256 + flacLow(docId, ch, j)
    else flacSample(docId, ch, j)
  }

  def flac(docId: Long): Array[Byte] = flacOf(docId, docId.toInt)

  /** MSB-first bit sink (FLAC bit order) with byte-level access for
    * the in-stream CRCs. */
  private final class BitWMsb {
    private var buf = new Array[Byte](256)
    private var nBytes = 0
    private var cur = 0
    private var nb = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); nb += 1
      if (nb == 8) {
        if (nBytes == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        buf(nBytes) = cur.toByte; nBytes += 1; cur = 0; nb = 0
      }
    }
    def bits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit((v >> i) & 1); i -= 1 }
    }
    def bitsLong(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1).toInt); i -= 1 }
    }
    def signed(v: Int, n: Int): Unit = bits(v & ((1 << n) - 1), n)
    def unaryZeros(q: Int): Unit = {
      var i = 0
      while (i < q) { bit(0); i += 1 }
      bit(1)
    }
    def align(): Unit = while (nb != 0) bit(0)
    def size: Int = { require(nb == 0); nBytes }
    def crc8Over(from: Int): Int = Flac.crc8(buf, from, nBytes)
    def crc16Over(from: Int): Int = Flac.crc16(buf, from, nBytes)
    def toBytes: Array[Byte] = { require(nb == 0)
      java.util.Arrays.copyOf(buf, nBytes) }
  }

  /** A real FLAC stream for the doc: fLaC marker, STREAMINFO, then
    * 64-sample blocks whose encode choices all cycle on `seed` —
    * subframe types (CONSTANT on the constant blocks, else VERBATIM /
    * FIXED-1 / FIXED-2 / LPC-2 per channel), stereo channel
    * assignments (independent / left-side / right-side / mid-side;
    * the wasted-bits class stays independent so mid stays integral),
    * Rice vs Rice2 residual methods, a partitioned+ESCAPED residual
    * class, 8- vs 16-bit blocksize header codes, the sample-rate
    * table code where the rate allows it, STREAMINFO-deferred vs
    * explicit sample-size codes, and fixed- vs variable-blocking
    * UTF-8 numbers (the variable class crosses the multi-byte
    * encoding). Same samples re-encode to a completely different
    * byte stream under a different `seed` — the lossless re-encode
    * twin of `mm_audio_dedup_flac`. */
  def flacOf(docId: Long, seed: Int, forceTpe: Int = -2): Array[Byte] = {
    val nCh = flacChannels(docId)
    val n = flacFrames(docId)
    val rate = flacRate(docId)
    val bps = flacBps(docId)
    val wasted = if (docId % 13 == 6) 1 else 0
    val B = 64
    val bw = new BitWMsb
    // fLaC + STREAMINFO (last-block flag set, type 0, length 34)
    bw.bits('f', 8); bw.bits('L', 8); bw.bits('a', 8); bw.bits('C', 8)
    bw.bits(0x80, 8); bw.bits(34, 24)
    bw.bits(B, 16); bw.bits(B, 16) // min/max blocksize
    bw.bits(0, 24); bw.bits(0, 24) // min/max framesize unknown
    bw.bits(rate, 20)
    bw.bits(nCh - 1, 3)
    bw.bits(bps - 1, 5)
    bw.bitsLong(n.toLong, 36)
    for (_ <- 0 until 16) bw.bits(0, 8) // MD5 unavailable

    val variableBlocking = docId % 11 == 4
    var b = 0
    var off = 0
    while (off < n) {
      val bs = math.min(B, n - off)
      val frameStart = bw.size
      // channel assignment for this frame
      val assign =
        if (nCh == 1) 0
        else if (wasted > 0) Seq(0, 8, 9)((seed / 2 + b) % 3)
        else Seq(0, 8, 9, 10)((seed / 2 + b) % 4)
      // header
      bw.bits(0x3ffe, 14)
      bw.bit(0)
      bw.bit(if (variableBlocking) 1 else 0)
      val bsCode = if ((seed + b) % 9 == 2) 7 else 6
      bw.bits(bsCode, 4)
      val rateCode = if (rate == 8000 && (seed + b) % 2 == 0) 4 else 0
      bw.bits(rateCode, 4)
      bw.bits(if (assign == 0) nCh - 1 else assign, 4)
      // bps code: deferred to STREAMINFO or explicit (4 = 16-bit,
      // 6 = 24-bit)
      bw.bits(if ((seed + b) % 2 == 1) 0 else if (bps == 24) 6 else 4, 3)
      bw.bit(0)
      // UTF-8 coded number (frame index, or first-sample index for
      // the variable-blocking class — the latter crosses 2 bytes)
      val num = if (variableBlocking) off else b
      if (num < 0x80) bw.bits(num, 8)
      else { bw.bits(0xc0 | (num >> 6), 8); bw.bits(0x80 | (num & 0x3f), 8) }
      if (bsCode == 6) bw.bits(bs - 1, 8) else bw.bits(bs - 1, 16)
      bw.bits(bw.crc8Over(frameStart), 8)

      // channel-transformed sequences
      val src = Array.tabulate(nCh, bs)((c, k) =>
        flacEffStreamSample(docId, c, off + k))
      val chans: Array[Array[Int]] = assign match {
        case 8 => Array(src(0), Array.tabulate(bs)(k => src(0)(k) - src(1)(k)))
        case 9 => Array(Array.tabulate(bs)(k => src(0)(k) - src(1)(k)), src(1))
        case 10 => Array(
          Array.tabulate(bs)(k => (src(0)(k) + src(1)(k)) >> 1),
          Array.tabulate(bs)(k => src(0)(k) - src(1)(k)))
        case _ => src
      }
      val constant = (docId + b) % 5 == 0
      var c = 0
      while (c < chans.length) {
        val extra = assign match {
          case 8 | 10 => if (c == 1) 1 else 0
          case 9 => if (c == 0) 1 else 0
          case _ => 0
        }
        // blocks shorter than the predictor warmup fall to VERBATIM;
        // the cycle covers VERBATIM, FIXED 0/1/2/3 and LPC-2.
        // FIXED-4 stays off the corpus cycle (side-channel residuals
        // could reach ±64000, past the escape range) but is reachable
        // via forceTpe = 6 on MONO docs — FlacSpec drives it
        writeFlacSubframe(bw, chans(c), bps + extra, wasted,
          if (forceTpe != -2 && bs > 4) forceTpe
          else if (constant) -1
          else if (bs <= 3) 0
          else (seed + b + c) % 6, seed + b)
        c += 1
      }
      bw.align()
      bw.bits(bw.crc16Over(frameStart), 16)
      b += 1
      off += bs
    }
    bw.toBytes
  }

  /** One subframe: `tpe` -1 CONSTANT, 0 VERBATIM, 1/2 FIXED order,
    * 3 LPC-2 (coefs 3, -2, shift 1, precision 4), 4 FIXED-0,
    * 5 FIXED-3. Residual methods cycle Rice/Rice2 on `resSeed`;
    * resSeed % 7 == 3 blocks use a 2-partition layout with the
    * second partition ESCAPED (raw 16-bit — covers FIXED-3's ±16000
    * residual range). */
  private def writeFlacSubframe(bw: BitWMsb, vals: Array[Int], bps: Int,
      wasted: Int, tpe: Int, resSeed: Int): Unit = {
    val n = vals.length
    bw.bit(0)
    val w = if (wasted == 0) vals else vals.map(_ >> wasted)
    val eb = bps - wasted
    def writeWasted(): Unit =
      if (wasted > 0) { bw.bit(1); bw.unaryZeros(wasted - 1) } else bw.bit(0)
    def writeResiduals(res: Array[Int], order: Int): Unit = {
      // the 24-bit domain's residuals run ~2^8 larger, so its Rice
      // parameter is 21 — past the 4-bit field's 14 cap, forcing
      // Rice2 — and its escape width 25 (FIXED-3 side residuals
      // bound at 8 * 2^20 < 2^24)
      val wide = bps > 17
      val rice2 = resSeed % 3 == 1 || wide
      bw.bits(if (rice2) 1 else 0, 2)
      val paramBits = if (rice2) 5 else 4
      val rawW = if (wide) 25 else 16
      val escaped = resSeed % 7 == 3 && n % 2 == 0 && n / 2 >= order
      bw.bits(if (escaped) 1 else 0, 4) // partition order
      val parts = if (escaped) 2 else 1
      var i = order
      var part = 0
      while (part < parts) {
        val count = (n / parts) - (if (part == 0) order else 0)
        if (part == 1) { // ESCAPE: raw signed rawW-bit
          bw.bits((1 << paramBits) - 1, paramBits)
          bw.bits(rawW, 5)
          var k = 0
          while (k < count) { bw.signed(res(i), rawW); i += 1; k += 1 }
        } else {
          val param = if (wide) 21 else 13
          bw.bits(param, paramBits)
          var k = 0
          while (k < count) {
            val v = (res(i) << 1) ^ (res(i) >> 31) // zigzag
            bw.unaryZeros(v >>> param)
            bw.bits(v & ((1 << param) - 1), param)
            i += 1; k += 1
          }
        }
        part += 1
      }
    }
    // FIXED residual at `order` over the (wasted-shifted) samples
    def fixedRes(order: Int): Array[Int] =
      Array.fill(order)(0) ++ Array.tabulate(n - order) { k =>
        val i = k + order
        order match {
          case 0 => w(i)
          case 1 => w(i) - w(i - 1)
          case 2 => w(i) - (2 * w(i - 1) - w(i - 2))
          case 3 => w(i) - (3 * w(i - 1) - 3 * w(i - 2) + w(i - 3))
          case _ => w(i) - (4 * w(i - 1) - 6 * w(i - 2) + 4 * w(i - 3) -
            w(i - 4))
        }
      }
    def writeFixed(order: Int): Unit = {
      bw.bits(8 + order, 6); writeWasted()
      for (i <- 0 until order) bw.signed(w(i), eb)
      writeResiduals(fixedRes(order), order)
    }
    tpe match {
      case -1 =>
        bw.bits(0, 6); writeWasted()
        bw.signed(w(0), eb)
      case 0 =>
        bw.bits(1, 6); writeWasted()
        w.foreach(bw.signed(_, eb))
      case 1 | 2 => writeFixed(tpe)
      case 4 => writeFixed(0)
      case 5 => writeFixed(3)
      case 6 => writeFixed(4)
      case _ =>
        bw.bits(32 + 1, 6); writeWasted() // LPC order 2 -> type 33
        bw.signed(w(0), eb); bw.signed(w(1), eb)
        bw.bits(3, 4) // precision - 1
        bw.signed(1, 5) // shift
        bw.signed(3, 4); bw.signed(-2, 4) // coefficients
        val res = Array.fill(2)(0) ++ Array.tabulate(n - 2) { k =>
          val i = k + 2
          w(i) - ((3L * w(i - 1) - 2L * w(i - 2)) >> 1).toInt
        }
        writeResiduals(res, 2)
    }
  }

  // ── WebP / VP8L (lossless closed-form pixels; [[Webp]] decodes) ──

  def webpW(docId: Long): Int = 8 + (docId % 8).toInt
  def webpH(docId: Long): Int = 8 + (docId % 5).toInt

  /** Per-pixel closed-form gray — VP8L is lossless, so the
    * `mm_webp_decode` oracle recomputes pixel sums from this (the
    * palette variant quantizes to 32 levels: (gray >> 3) * 8). */
  def webpGray(docId: Long, x: Int, y: Int): Int =
    (((docId * 23 + x * 31 + y * 43) % 256 + 256) % 256).toInt

  /** Which VP8L feature the doc's stream exercises — the corpus
    * cycles the WHOLE spec surface: 0 plain literals, 1
    * subtract-green, 2 color-indexing (32-entry palette), 3 color
    * cache + LZ77 runs, 4 predictor transform (modes cycling through
    * all 14), 5 color transform, 6 meta prefix codes (2 groups). */
  def webpVariant(docId: Long): Int = (docId % 7).toInt

  /** The variant-aware effective gray: variant 2 (palette) quantizes
    * to 32 levels; variant 3 (cache + LZ77) PLATEAUS the gradient
    * (4-px horizontal runs, rows repeating every 3) so the encoder
    * genuinely emits backward references AND color-cache hits — a
    * smooth gradient never repeats a pixel, which would leave the
    * decoder's LZ77/cache branches outside the hash gate. */
  def webpEffGray(docId: Long, x: Int, y: Int): Int = {
    val v = webpVariant(docId)
    val g0 =
      if (v == 3) webpGray(docId, x - x % 4, y % 3)
      else webpGray(docId, x, y)
    if (v == 2) (g0 >> 3) * 8 else g0
  }

  /** The decoded ARGB pixel the oracle expects: channel derivation
    * (g, (g+85)%256, (g+170)%256) over the effective gray, alpha
    * 255. */
  def webpPixel(docId: Long, x: Int, y: Int): Int = {
    val g = webpEffGray(docId, x, y)
    0xff000000 | (g << 16) | (((g + 85) % 256) << 8) | ((g + 170) % 256)
  }

  def webp(docId: Long): Array[Byte] =
    webpOf(webpW(docId), webpH(docId), webpVariant(docId), docId.toInt,
      (x, y) => webpPixel(docId, x, y))

  // ── VP8L bit-level writer machinery (mirrors [[Webp]]'s reader) ───

  /** LSB-first bit sink (VP8L bit order; RFC 9649 §"RIFF Header"). */
  private final class BitW {
    private val out = new java.io.ByteArrayOutputStream(256)
    private var cur = 0
    private var n = 0
    def bit(v: Int): Unit = {
      cur |= (v & 1) << n; n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 }
    }
    /** fixed-width field, LSB first. */
    def bits(v: Int, w: Int): Unit = {
      var i = 0
      while (i < w) { bit((v >> i) & 1); i += 1 }
    }
    /** prefix code, MSB of the code first. */
    def code(c: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bit((c >> i) & 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (n > 0) { out.write(cur); cur = 0; n = 0 }
      out.toByteArray
    }
  }

  /** Canonical code assignment (the DEFLATE rule the decoder
    * inverts): codes numbered in (length, symbol) order. */
  private def canonicalCodes(lens: Array[Int]): Array[Int] = {
    val maxLen = lens.max
    val count = new Array[Int](maxLen + 1)
    lens.foreach(l => if (l > 0) count(l) += 1)
    val next = new Array[Int](maxLen + 2)
    var c = 0
    for (l <- 1 to maxLen) { next(l) = c; c = (c + count(l)) << 1 }
    val codes = new Array[Int](lens.length)
    for (s <- lens.indices if lens(s) > 0) {
      codes(s) = next(lens(s)); next(lens(s)) += 1
    }
    codes
  }

  /** Complete uniform-ish code lengths over the used symbol set: with
    * n >= 3 used symbols and L = ceil(log2 n), the first 2^L - n get
    * length L-1 and the rest L (Kraft-complete by construction). */
  private def uniformLens(alphabet: Int, used: Seq[Int]): Array[Int] = {
    val lens = new Array[Int](alphabet)
    val n = used.size
    if (n == 1) { // degenerate single-symbol code (0-bit reads)
      lens(used.head) = 1
      return lens
    }
    var l = 1
    while ((1 << l) < n) l += 1
    val short = (1 << l) - n
    used.sorted.zipWithIndex.foreach { case (s, i) =>
      lens(s) = if (i < short) l - 1 else l
    }
    lens
  }

  /** Write one prefix code (simple form for <= 2 used symbols, the
    * normal code-length-coded form with a max_symbol cap otherwise)
    * and return per-symbol (code, len) for emission. */
  private def writeCode(bw: BitW, alphabet: Int,
      used0: Seq[Int]): (Array[Int], Array[Int]) = {
    val used = used0.distinct.sorted
    require(used.nonEmpty && used.last < alphabet, s"bad used set")
    // the simple form carries symbols in at most 8 bits — length/
    // cache symbols (>= 256 in the green alphabet) need normal codes
    if (used.size <= 2 && used.last < 256) {
      bw.bit(1) // simple
      bw.bit(used.size - 1)
      val s0 = used.head
      if (s0 <= 1) { bw.bit(0); bw.bit(s0) }
      else { bw.bit(1); bw.bits(s0, 8) }
      if (used.size == 2) bw.bits(used(1), 8)
      val lens = new Array[Int](alphabet)
      // single-symbol codes read zero bits; two-symbol codes one bit
      if (used.size == 2) used.foreach(lens(_) = 1)
      (canonicalCodes(lens), lens)
    } else {
      bw.bit(0) // normal
      val lens = uniformLens(alphabet, used)
      val maxUsed = used.last
      // code-length code over the DISTINCT lens values present in
      // [0, maxUsed] (0 for the gaps) — emitted literally, no repeats
      val clUsed = (0 to maxUsed).map(lens(_)).distinct.sorted
      val clLens = new Array[Int](19)
      if (clUsed.size == 1) clLens(clUsed.head) = 1
      else if (clUsed.size == 2) clUsed.foreach(clLens(_) = 1)
      else { // {0, L-1, L}: 1 + 2 + 2 bits, Kraft-complete
        clLens(clUsed.head) = 1
        clLens(clUsed(1)) = 2; clLens(clUsed(2)) = 2
      }
      val order = graft.multimodal.Webp.ClOrder
      val nCl = (0 until 19).filter(i => clLens(order(i)) > 0).max + 1
      bw.bits(nCl - 4, 4)
      for (i <- 0 until nCl) bw.bits(clLens(order(i)), 3)
      val clCodes = canonicalCodes(clLens)
      val clSingle = clUsed.size == 1
      // cap reads at maxUsed+1 via the max_symbol mechanism
      bw.bit(1)
      val value = maxUsed + 1 - 2
      var k = 0
      while ((1 << (2 + 2 * k)) <= value) k += 1
      bw.bits(k, 3)
      bw.bits(value, 2 + 2 * k)
      for (s <- 0 to maxUsed)
        if (!clSingle) bw.code(clCodes(lens(s)), clLens(lens(s)))
      (canonicalCodes(lens), lens)
    }
  }

  /** Inverse of the LZ77 prefix-value mapping: value -> (symbol,
    * extra-bit count, extra bits). */
  private def invPrefix(v: Int): (Int, Int, Int) = {
    require(v >= 1)
    if (v <= 4) (v - 1, 0, 0)
    else {
      var sym = 4
      while (true) {
        val eb = (sym - 2) >> 1
        val offset = (2 + (sym & 1)) << eb
        if (v >= offset + 1 && v <= offset + (1 << eb))
          return (sym, eb, v - offset - 1)
        sym += 1
      }
      sys.error("unreachable")
    }
  }

  /** One coded op in the image-data stream. */
  private[multimodal] sealed trait Vop { def group: Int }
  private[multimodal] final case class VLit(group: Int, px: Int) extends Vop
  private[multimodal] final case class VCache(group: Int, idx: Int) extends Vop
  private[multimodal] final case class VRef(group: Int, len: Int, distCode: Int) extends Vop

  /** The variant-3 op builder (exposed for WebpSpec's op-census):
    * greedy detection of horizontal runs (distance 1), the corpus'
    * three-row vertical period (distance 3·w — plane code (0,3)), and
    * color-cache hits; distances alternate between their 2D plane
    * code and the plain 120+d form so both decode paths stay on the
    * gate. Cache state mirrors the decoder exactly (insert on
    * literals and copied pixels, not on hits). */
  private[multimodal] def lz77Ops(px: Array[Int], w: Int,
      cacheBits: Int): Seq[Vop] = {
    val cache = new Array[Int](1 << cacheBits)
    def slot(p: Int): Int = (0x1e35a7bd * p) >>> (32 - cacheBits)
    val vDist = 3 * w
    val vCode = graft.multimodal.Webp.PlaneCodes.indexOf((0, 3)) + 1
    val ops = scala.collection.mutable.ArrayBuffer.empty[Vop]
    var i = 0
    var refParity = 0
    while (i < px.length) {
      var run = 0
      if (i > 0)
        while (i + run < px.length && px(i + run) == px(i - 1)) run += 1
      var vrun = 0
      if (i >= vDist)
        while (i + vrun < px.length && px(i + vrun) == px(i + vrun - vDist))
          vrun += 1
      val (len, dist, dc2d) =
        if (vrun > run) (vrun, vDist, vCode) else (run, 1, 2)
      if (len >= 3) {
        val dc = if (refParity == 0) dc2d else 120 + dist
        refParity ^= 1
        ops += VRef(0, len, dc)
        var j = 0
        while (j < len) { cache(slot(px(i + j))) = px(i + j); j += 1 }
        i += len
      } else if (cache(slot(px(i))) == px(i)) {
        ops += VCache(0, slot(px(i)))
        i += 1
      } else {
        cache(slot(px(i))) = px(i)
        ops += VLit(0, px(i))
        i += 1
      }
    }
    ops.toSeq
  }

  /** Emit an op stream: per-group code sets (green/red/blue/alpha/
    * distance over each group's used symbols), then the ops. */
  private def writeImageData(bw: BitW, ops: Seq[Vop], nGroups: Int,
      cacheBits: Int): Unit = {
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val greens = Array.fill(nGroups)(scala.collection.mutable.SortedSet.empty[Int])
    val reds = Array.fill(nGroups)(scala.collection.mutable.SortedSet.empty[Int])
    val blues = Array.fill(nGroups)(scala.collection.mutable.SortedSet.empty[Int])
    val alphas = Array.fill(nGroups)(scala.collection.mutable.SortedSet.empty[Int])
    val dists = Array.fill(nGroups)(scala.collection.mutable.SortedSet.empty[Int])
    ops.foreach {
      case VLit(g, px) =>
        greens(g) += (px >> 8) & 0xff
        reds(g) += (px >> 16) & 0xff
        blues(g) += px & 0xff
        alphas(g) += (px >>> 24)
      case VCache(g, idx) => greens(g) += 256 + 24 + idx
      case VRef(g, len, dc) =>
        greens(g) += 256 + invPrefix(len)._1
        dists(g) += invPrefix(dc)._1
    }
    val codes = (0 until nGroups).map { g =>
      val gr = writeCode(bw, 256 + 24 + cacheSize,
        if (greens(g).isEmpty) Seq(0) else greens(g).toSeq)
      val re = writeCode(bw, 256, if (reds(g).isEmpty) Seq(0) else reds(g).toSeq)
      val bl = writeCode(bw, 256, if (blues(g).isEmpty) Seq(0) else blues(g).toSeq)
      val al = writeCode(bw, 256, if (alphas(g).isEmpty) Seq(0) else alphas(g).toSeq)
      val di = writeCode(bw, 40, if (dists(g).isEmpty) Seq(0) else dists(g).toSeq)
      (gr, re, bl, al, di)
    }
    def put(ct: (Array[Int], Array[Int]), sym: Int): Unit =
      bw.code(ct._1(sym), ct._2(sym))
    ops.foreach {
      case VLit(g, px) =>
        val (gr, re, bl, al, _) = codes(g)
        put(gr, (px >> 8) & 0xff)
        put(re, (px >> 16) & 0xff)
        put(bl, px & 0xff)
        put(al, px >>> 24)
      case VCache(g, idx) =>
        put(codes(g)._1, 256 + 24 + idx)
      case VRef(g, len, dc) =>
        val (gr, _, _, _, di) = codes(g)
        val (ls, leb, lex) = invPrefix(len)
        put(gr, 256 + ls)
        bw.bits(lex, leb)
        val (ds, deb, dex) = invPrefix(dc)
        put(di, ds)
        bw.bits(dex, deb)
    }
  }

  /** Entropy-code a sub-image (transform data, entropy image,
    * palette): all-literal, no cache; `isMain` adds the meta bit the
    * level-0 reader expects. */
  private def writeEntropyLiteral(bw: BitW, px: Array[Int],
      isMain: Boolean): Unit = {
    bw.bit(0) // no color cache
    if (isMain) bw.bit(0) // no meta prefix codes
    writeImageData(bw, px.map(VLit(0, _)).toSeq, 1, 0)
  }

  /** Componentwise pixel subtract (mod 256 per channel) — the guard
    * bits at 8/24 stop a low-lane borrow from decrementing the high
    * lane. */
  private def subPx(a: Int, b: Int): Int = {
    val ag = ((((a >>> 8) & 0x00ff00ff) | 0x01000100) -
      ((b >>> 8) & 0x00ff00ff)) & 0x00ff00ff
    val rb = (((a & 0x00ff00ff) | 0x01000100) -
      (b & 0x00ff00ff)) & 0x00ff00ff
    (ag << 8) | rb
  }

  /** A real RIFF/WEBP/VP8L stream for `pixels` exercising `variant`
    * (see [[webpVariant]]); `seed` varies the per-block predictor
    * modes / color-transform elements across the corpus. Every
    * variant is LOSSLESS: [[Webp.decodePixels]] must return `pixelOf`
    * verbatim. */
  def webpOf(w: Int, h: Int, variant: Int, seed: Int,
      pixelOf: (Int, Int) => Int): Array[Byte] = {
    val px = Array.tabulate(h, w)((y, x) => pixelOf(x, y)).flatten
    val bw = new BitW
    bw.bits(0x2f, 8)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bit(0) // alpha hint
    bw.bits(0, 3) // version

    variant match {
      case 1 => // subtract-green
        bw.bit(1); bw.bits(2, 2)
        bw.bit(0)
        val res = px.map { v =>
          val g = (v >> 8) & 0xff
          val r = (((v >> 16) & 0xff) - g) & 0xff
          val b = ((v & 0xff) - g) & 0xff
          (v & 0xff00ff00) | (r << 16) | b
        }
        bw.bit(0); bw.bit(0) // no cache, no meta
        writeImageData(bw, res.map(VLit(0, _)).toSeq, 1, 0)

      case 2 => // color-indexing, 32-entry palette (no bundling)
        val palette = Array.tabulate(32) { i =>
          val g = i * 8
          0xff000000 | (g << 16) | (((g + 85) % 256) << 8) | ((g + 170) % 256)
        }
        val lookup = palette.zipWithIndex.toMap
        bw.bit(1); bw.bits(3, 2)
        bw.bits(palette.length - 1, 8)
        val deltas = palette.indices.map(i =>
          if (i == 0) palette(0) else subPx(palette(i), palette(i - 1)))
        writeEntropyLiteral(bw, deltas.toArray, isMain = false)
        bw.bit(0)
        val idxPx = px.map(p => 0xff000000 | (lookup(p) << 8))
        bw.bit(0); bw.bit(0)
        writeImageData(bw, idxPx.map(VLit(0, _)).toSeq, 1, 0)

      case 3 => // color cache + LZ77 runs
        bw.bit(0) // no transform
        val cacheBits = 6
        bw.bit(1); bw.bits(cacheBits, 4) // color cache
        bw.bit(0) // no meta
        writeImageData(bw, lz77Ops(px, w, cacheBits), 1, cacheBits)

      case 4 => // predictor transform, modes cycling through all 14
        val bits = 3
        val subW = (w + 7) >> 3; val subH = (h + 7) >> 3
        def mode(bx: Int, by: Int): Int = (bx + by * 3 + seed) % 14
        bw.bit(1); bw.bits(0, 2)
        bw.bits(bits - 2, 3) // field stores (bits - 2), RFC 9649 §4.1
        val sub = Array.tabulate(subH, subW)((by, bx) =>
          0xff000000 | (mode(bx, by) << 8)).flatten
        writeEntropyLiteral(bw, sub, isMain = false)
        bw.bit(0)
        val res = new Array[Int](px.length)
        var p = 0; var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val pred =
              if (p == 0) 0xff000000
              else if (y == 0) px(p - 1)
              else if (x == 0) px(p - w)
              else Webp.predict(mode(x >> bits, y >> bits),
                px(p - 1), px(p - w), px(p - w - 1), px(p - w + 1))
            res(p) = subPx(px(p), pred)
            p += 1; x += 1
          }
          y += 1
        }
        bw.bit(0); bw.bit(0)
        writeImageData(bw, res.map(VLit(0, _)).toSeq, 1, 0)

      case 5 => // color transform, per-block elements from the seed
        val bits = 3
        val subW = (w + 7) >> 3; val subH = (h + 7) >> 3
        def elem(bx: Int, by: Int): Int = {
          val g2r = (bx * 47 + by * 13 + seed) & 0xff
          val g2b = (bx * 29 + by * 71 + seed * 3) & 0xff
          val r2b = (bx * 17 + by * 101 + seed * 7) & 0xff
          0xff000000 | (r2b << 16) | (g2b << 8) | g2r
        }
        bw.bit(1); bw.bits(1, 2)
        bw.bits(bits - 2, 3) // field stores (bits - 2), RFC 9649 §4.1
        val sub = Array.tabulate(subH, subW)((by, bx) => elem(bx, by)).flatten
        writeEntropyLiteral(bw, sub, isMain = false)
        bw.bit(0)
        def delta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
        val res = new Array[Int](px.length)
        var p = 0; var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val e = elem(x >> bits, y >> bits)
            val v = px(p)
            val g = (v >> 8) & 0xff
            val r0 = (v >> 16) & 0xff
            val r = (r0 - delta(e & 0xff, g)) & 0xff
            val b = ((v & 0xff) - delta((e >> 8) & 0xff, g) -
              delta((e >> 16) & 0xff, r0)) & 0xff
            res(p) = (v & 0xff00ff00) | (r << 16) | b
            p += 1; x += 1
          }
          y += 1
        }
        bw.bit(0); bw.bit(0)
        writeImageData(bw, res.map(VLit(0, _)).toSeq, 1, 0)

      case 6 => // meta prefix codes: two groups split by block parity
        bw.bit(0) // no transform
        val metaBits = 2
        val metaW = (w + 3) >> 2; val metaH = (h + 3) >> 2
        def group(bx: Int, by: Int): Int = (bx + by) & 1
        bw.bit(0) // no cache
        bw.bit(1) // meta prefix codes
        bw.bits(metaBits - 2, 3)
        val meta = Array.tabulate(metaH, metaW)((by, bx) =>
          0xff000000 | (group(bx, by) << 8)).flatten
        writeEntropyLiteral(bw, meta, isMain = false)
        val ops = new Array[Vop](px.length)
        var p = 0; var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            ops(p) = VLit(group(x >> metaBits, y >> metaBits), px(p))
            p += 1; x += 1
          }
          y += 1
        }
        writeImageData(bw, ops.toSeq, 2, 0)

      case _ => // plain literals
        bw.bit(0)
        bw.bit(0); bw.bit(0)
        writeImageData(bw, px.map(VLit(0, _)).toSeq, 1, 0)
    }

    // RIFF container (even-padded VP8L chunk)
    val payload = bw.toBytes
    val out = new java.io.ByteArrayOutputStream(payload.length + 24)
    def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    def le32o(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    val padded = payload.length + (payload.length & 1)
    fourcc("RIFF"); le32o(4 + 8 + padded); fourcc("WEBP")
    fourcc("VP8L"); le32o(payload.length)
    out.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** Small-palette writer (2/4/16 entries) exercising the sub-byte
    * pixel-BUNDLING path: indices packed LSB-first into the green
    * channel at the reduced width. Palette entry i carries the
    * truecolor derivation of i * (255/(n-1))-ish scaled grays so
    * entries stay distinct. */
  def webpBundledOf(w: Int, h: Int, paletteSize: Int,
      idxOf: (Int, Int) => Int): Array[Byte] = {
    require(Set(2, 4, 16)(paletteSize))
    val scale = 255 / (paletteSize - 1)
    val palette = Array.tabulate(paletteSize) { i =>
      val g = i * scale
      0xff000000 | (g << 16) | (((g + 85) % 256) << 8) | ((g + 170) % 256)
    }
    val bw = new BitW
    bw.bits(0x2f, 8)
    bw.bits(w - 1, 14); bw.bits(h - 1, 14)
    bw.bit(0); bw.bits(0, 3)
    bw.bit(1); bw.bits(3, 2)
    bw.bits(paletteSize - 1, 8)
    val deltas = palette.indices.map(i =>
      if (i == 0) palette(0) else subPx(palette(i), palette(i - 1)))
    writeEntropyLiteral(bw, deltas.toArray, isMain = false)
    bw.bit(0)
    val xbits = if (paletteSize <= 2) 3 else if (paletteSize <= 4) 2 else 1
    val perByte = 1 << xbits
    val bitsPer = 8 >> xbits
    val packedW = (w + perByte - 1) >> xbits
    val packed = Array.tabulate(h, packedW) { (y, bx) =>
      var v = 0
      var j = 0
      while (j < perByte) {
        val x = (bx << xbits) + j
        if (x < w) v |= (idxOf(x, y) & ((1 << bitsPer) - 1)) << (bitsPer * j)
        j += 1
      }
      0xff000000 | (v << 8)
    }.flatten
    bw.bit(0); bw.bit(0)
    writeImageData(bw, packed.map(VLit(0, _)).toSeq, 1, 0)
    val payload = bw.toBytes
    val out = new java.io.ByteArrayOutputStream(payload.length + 24)
    def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    def le32o(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    val padded = payload.length + (payload.length & 1)
    fourcc("RIFF"); le32o(4 + 8 + padded); fourcc("WEBP")
    fourcc("VP8L"); le32o(payload.length)
    out.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  // ── baseline JPEG (grayscale, block-constant; [[Jpeg]] decodes) ───

  /** JPEG block grid — width/height are multiples of 8 by
    * construction (the cropped-dims decode path is spec-covered with
    * a patched SOF instead). */
  def jpegNbx(docId: Long): Int = 2 + (docId % 6).toInt
  def jpegNby(docId: Long): Int = 2 + (docId % 5).toInt

  /** Per-BLOCK solid gray. Block-constant content is what makes the
    * lossy format gate-exact: a solid block's DCT has ONLY the DC
    * coefficient (8·(g−128)), the all-ones quant table keeps it
    * verbatim, and the IDCT reconstructs exactly g — so the decoded
    * pixels are a closed form of doc_id even though the codec is
    * real baseline JPEG end to end. */
  def jpegGray(docId: Long, bx: Int, by: Int): Int =
    (((docId * 11 + bx * 37 + by * 59) % 256 + 256) % 256).toInt

  /** Big-endian-bit writer for the entropy-coded segment: MSB-first,
    * 0xFF bytes stuffed with 0x00, final byte padded with 1s. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { put(0xff, 8 - n); () }
  }

  /** A real baseline-JPEG stream for the doc: SOI, all-ones DQT,
    * SOF0 (8-bit grayscale), our own canonical DHT pair (DC: twelve
    * 4-bit category codes; AC: one 2-bit EOB code — any valid
    * canonical table is legal JPEG, and the decoder must read DHT
    * generally either way), SOS, DC-difference-coded scan (blocks are
    * DC-only so each block is category+magnitude+EOB), EOI.
    * `restartEvery > 0` adds a DRI segment and RSTn markers with DC
    * predictor resets every that-many MCUs (spec-exercised; the gate
    * uses the plain form). */
  def jpeg(docId: Long, restartEvery: Int = 0): Array[Byte] =
    jpegOf(jpegNbx(docId), jpegNby(docId),
      (bx, by) => jpegGray(docId, bx, by), restartEvery)

  /** The generalized writer: any block grid, any per-block gray —
    * the near-dup gate plants twins by reusing a neighbor's grid
    * with one block perturbed. */
  def jpegOf(nbx: Int, nby: Int, gray: (Int, Int) => Int,
      restartEvery: Int = 0): Array[Byte] = {
    val w = 8 * nbx; val h = 8 * nby
    val out = new java.io.ByteArrayOutputStream(256)
    def marker(m: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xdb, 0 +: Array.fill(64)(1)) // DQT slot 0, all ones
    marker(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff,
      w & 0xff, 1, 1, 0x11, 0)) // SOF0: 1 component, h=v=1, Tq=0
    marker(0xc4, // DHT DC slot 0: 12 categories, all 4-bit codes
      Array(0x00) ++ Array(0, 0, 0, 12) ++ Array.fill(12)(0) ++
        (0 to 11).toArray)
    marker(0xc4, // DHT AC slot 0: a single 2-bit EOB code
      Array(0x10, 0, 1) ++ Array.fill(14)(0) ++ Array(0x00))
    if (restartEvery > 0)
      marker(0xdd, Array((restartEvery >> 8) & 0xff, restartEvery & 0xff))
    marker(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    var bw = new BitWriter(out)
    var pred = 0
    var mcu = 0
    var by = 0
    while (by < nby) {
      var bx = 0
      while (bx < nbx) {
        if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + ((mcu / restartEvery - 1) % 8))
          bw = new BitWriter(out)
          pred = 0
        }
        val dc = 8 * (gray(bx, by) - 128)
        val diff = dc - pred
        pred = dc
        val s = if (diff == 0) 0
          else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        bw.put(s, 4) // DC category code == category value in our table
        if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        bw.put(0, 2) // EOB
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** A real PROGRESSIVE (SOF2) stream for the doc — same pixels as
    * [[jpeg]], so the `mm_jpeg_decode` closed-form oracle is
    * unchanged while the decode path exercised is T.81 §G end to
    * end: a DC-first scan at Al=4, four DC successive-approximation
    * refinement scans (Al 3→0; the block-constant DC = 8·(g−128) has
    * a live bit at position 3, so the refinements carry real 1-bits,
    * not a degenerate all-zero ladder), then an AC-first scan over
    * the whole 1..63 band at Al=1 coded as a single EOB run per
    * restart segment, and an AC refinement scan (Ah=1→Al=0) over the
    * same band — every coefficient is recovered exactly, so the
    * decoded frame is byte-identical to the baseline one. */
  def jpegProgressive(docId: Long, restartEvery: Int = 0): Array[Byte] =
    jpegProgressiveOf(jpegNbx(docId), jpegNby(docId),
      (bx, by) => jpegGray(docId, bx, by), restartEvery)

  /** The generalized progressive writer (grid + per-block gray), the
    * [[jpegOf]] twin. */
  def jpegProgressiveOf(nbx: Int, nby: Int, gray: (Int, Int) => Int,
      restartEvery: Int = 0): Array[Byte] = {
    val w = 8 * nbx; val h = 8 * nby
    val nBlocks = nbx * nby
    val out = new java.io.ByteArrayOutputStream(512)
    def marker(m: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(out.write)
    }
    def dcOf(bx: Int, by: Int): Int = 8 * (gray(bx, by) - 128)
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xdb, 0 +: Array.fill(64)(1)) // DQT slot 0, all ones
    marker(0xc2, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff,
      w & 0xff, 1, 1, 0x11, 0)) // SOF2: 1 component, h=v=1, Tq=0
    marker(0xc4, // DHT DC slot 0: 12 categories, all 4-bit codes
      Array(0x00) ++ Array(0, 0, 0, 12) ++ Array.fill(12)(0) ++
        (0 to 11).toArray)
    marker(0xc4, // DHT AC slot 0: the 15 EOBn symbols (r<<4), 4-bit codes
      Array(0x10) ++ Array(0, 0, 0, 15) ++ Array.fill(12)(0) ++
        (0 to 14).map(_ << 4).toArray)
    if (restartEvery > 0)
      marker(0xdd, Array((restartEvery >> 8) & 0xff, restartEvery & 0xff))

    // one scan's entropy segment: per-block emit via `body`, RSTn +
    // state reset every restartEvery blocks
    def scan(sos: Array[Int])(body: (BitWriter, Int, Int) => Unit): Unit = {
      marker(0xda, sos)
      var bw = new BitWriter(out)
      var blk = 0
      var by = 0
      while (by < nby) {
        var bx = 0
        while (bx < nbx) {
          if (restartEvery > 0 && blk > 0 && blk % restartEvery == 0) {
            bw.flush()
            out.write(0xff); out.write(0xd0 + ((blk / restartEvery - 1) % 8))
            bw = new BitWriter(out)
          }
          body(bw, bx, by)
          blk += 1
          bx += 1
        }
        by += 1
      }
      bw.flush()
    }

    // scan 1: DC first, Al=4 — diff-code DC >> 4
    locally {
      var pred = 0
      scan(Array(1, 1, 0x00, 0, 0, 4)) { (bw, bx, by) =>
        val blk = by * nbx + bx
        if (restartEvery > 0 && blk > 0 && blk % restartEvery == 0)
          pred = 0 // the scan helper just emitted RSTn before this block
        val v = dcOf(bx, by) >> 4
        val diff = v - pred
        pred = v
        val s = if (diff == 0) 0
          else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        bw.put(s, 4)
        if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      }
    }
    // scans 2..5: DC refinement, Ah=k+1 Al=k — one raw bit per block
    for (k <- 3 to 0 by -1)
      scan(Array(1, 1, 0x00, 0, 0, ((k + 1) << 4) | k)) { (bw, bx, by) =>
        bw.put((dcOf(bx, by) >> k) & 1, 1)
      }
    // AC scans: the whole 1..63 band is zero (block-constant blocks),
    // coded as one EOBn covering each restart segment's blocks
    def emitEob(bw: BitWriter, n: Int): Unit = {
      // EOBn: symbol (r<<4, size 0) + r extra bits, covers 2^r+extra
      // blocks; our canonical AC table assigns the 4-bit codes 0..14
      // to symbols 0x00,0x10,..,0xE0 in order, so code(symbol r<<4)=r
      val r = 31 - Integer.numberOfLeadingZeros(n)
      bw.put(r, 4)
      if (r > 0) bw.put(n - (1 << r), r)
    }
    def acScan(ahal: Int): Unit = {
      marker(0xda, Array(1, 1, 0x00, 1, 63, ahal))
      var bw = new BitWriter(out)
      var done = 0
      var seg = 0
      while (done < nBlocks) {
        val segLen = if (restartEvery > 0)
          math.min(restartEvery, nBlocks - done) else nBlocks
        if (seg > 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + ((seg - 1) % 8))
          bw = new BitWriter(out)
        }
        emitEob(bw, segLen)
        done += segLen
        seg += 1
      }
      bw.flush()
    }
    acScan(0x01) // AC first: Ss=1 Se=63 Ah=0 Al=1
    acScan(0x10) // AC refine: Ah=1 Al=0 (zero history: no correction bits)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
