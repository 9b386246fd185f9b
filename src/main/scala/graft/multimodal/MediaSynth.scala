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
    val w = qoiWidth(docId); val h = qoiHeight(docId)
    val out = new java.io.ByteArrayOutputStream(22 + 4 * w * h)
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    be32(out, w); be32(out, h)
    out.write(3); out.write(0) // RGB channels, sRGB
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = qoiGray(docId, x, y)
        out.write(0xfe); out.write(v); out.write(v); out.write(v)
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < 7) { out.write(0); i += 1 }
    out.write(1)
    out.toByteArray
  }

  /** Canonical PCM WAV: RIFF(WAVE) + fmt(16, PCM, mono, 8 kHz,
    * 16-bit) + data(2·frames), little-endian samples. */
  def wav(docId: Long): Array[Byte] = {
    val n = wavFrames(docId)
    val dataLen = 2 * n
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    le32(out, 36 + dataLen)
    out.write('W'); out.write('A'); out.write('V'); out.write('E')
    out.write('f'); out.write('m'); out.write('t'); out.write(' ')
    le32(out, 16)
    le16(out, 1)           // PCM
    le16(out, 1)           // mono
    le32(out, WavRate)
    le32(out, WavRate * 2) // byte rate
    le16(out, 2)           // block align
    le16(out, 16)          // bits
    out.write('d'); out.write('a'); out.write('t'); out.write('a')
    le32(out, dataLen)
    var i = 0
    while (i < n) {
      le16(out, wavSample(docId, i) & 0xffff)
      i += 1
    }
    out.toByteArray
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
}
