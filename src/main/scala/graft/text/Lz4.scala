package graft.text

/** LZ4 codec — pure JVM, public spec (the LZ4 block + frame format
  * specifications, lz4.org): the compression Kafka topics, Hadoop
  * sequence files and `.jsonl.lz4` shards actually carry. Fully
  * GENERATIVE (token nibbles + LSIC length extension + 16-bit
  * offsets — no normative tables), so unlike MP3/VP8 it is buildable
  * and VERIFIABLE here: the reference implementation (lz4-java)
  * ships on the Spark classpath and Lz4Spec differentials both
  * directions — their frames through our decoder byte-exact, our
  * frames through their `LZ4FrameInputStream`.
  *
  * Scope:
  *  - block format: token literal/match nibbles, 255-terminated
  *    length extension bytes, 16-bit little-endian offsets,
  *    overlap-safe match copy, the literals-only last sequence;
  *  - frame format v1: magic, FLG/BD descriptor (version 01, block
  *    independence AND block-linked modes — linked blocks reach back
  *    across block boundaries through the frame window), optional
  *    content size, optional dictionary ID (nonzero → the documented
  *    None), header checksum (XXH32 >> 8), per-block uncompressed
  *    flag (bit 31), optional block checksums, EndMark, optional
  *    content checksum — both checksums VERIFIED when present;
  *  - skippable frames (0x184D2A50-5F) and multi-frame
  *    concatenation; the pre-frame "legacy" format (0x184C2102) is
  *    the documented None.
  *
  * The compressor emits conforming frames (block-independent, greedy
  * hash-table match search honoring the end-of-block rules: last 5
  * bytes literal, no match starting within the last 12) with content
  * size + content checksum. Same decode-or-reject totality contract
  * as [[Zstd]] (Lz4Spec fuzzes it); 64 MiB bomb guard. */
object Lz4 {

  private val MaxBytes = 64 * 1024 * 1024

  private final class Malformed extends RuntimeException(null, null, false, false)

  def decompress(b: Array[Byte], maxLen: Int = MaxBytes): Option[Array[Byte]] =
    try Some(decode0(b, maxLen))
    catch { case _: Malformed | _: ArrayIndexOutOfBoundsException |
      _: NegativeArraySizeException => None }

  private def u8(b: Array[Byte], p: Int): Int = {
    if (p >= b.length) throw new Malformed
    b(p) & 0xff
  }
  private def u32(b: Array[Byte], p: Int): Long =
    u8(b, p) | (u8(b, p + 1).toLong << 8) | (u8(b, p + 2).toLong << 16) |
      (u8(b, p + 3).toLong << 24)

  /** Growable output with bomb guard (the [[Zstd]] Out shape). */
  private final class Out(maxLen: Int) {
    var buf = new Array[Byte](8192)
    var n = 0
    def ensure(extra: Int): Unit = {
      if (extra < 0 || n + extra > maxLen) throw new Malformed
      if (n + extra > buf.length) {
        var cap = buf.length
        while (cap < n + extra) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, math.min(cap, maxLen).max(n + extra))
      }
    }
    def append(b: Array[Byte], off: Int, len: Int): Unit = {
      if (len < 0 || off < 0 || off + len > b.length) throw new Malformed
      ensure(len)
      System.arraycopy(b, off, buf, n, len)
      n += len
    }
    def copyMatch(offset: Int, len: Int, windowStart: Int): Unit = {
      if (offset <= 0 || offset > n - windowStart) throw new Malformed
      ensure(len)
      var i = 0
      val src = n - offset
      while (i < len) { buf(n + i) = buf(src + i); i += 1 }
      n += len
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, n)
  }

  /** Decode one LZ4 block from [p0, end) into out; matches may reach
    * back to `windowStart` (the frame start for linked blocks, the
    * block start for independent ones). */
  private def block(b: Array[Byte], p0: Int, end: Int, out: Out,
      windowStart: Int): Unit = {
    // every read is bounded by the DECLARED block end, not the whole
    // buffer: a corrupt block must never consume the next block's
    // bytes and terminate cleanly with garbage (code-review r15)
    def u8e(p: Int): Int = {
      if (p >= end) throw new Malformed
      b(p) & 0xff
    }
    var p = p0
    while (p < end) {
      val token = u8e(p); p += 1
      var litLen = token >>> 4
      if (litLen == 15) {
        var x = 255
        while (x == 255) { x = u8e(p); p += 1; litLen += x
          if (litLen > MaxBytes) throw new Malformed }
      }
      if (p + litLen > end) throw new Malformed
      out.append(b, p, litLen)
      p += litLen
      if (p < end) { // a match follows (the last sequence has none)
        val offset = u8e(p) | (u8e(p + 1) << 8); p += 2
        var mLen = (token & 15) + 4
        if ((token & 15) == 15) {
          var x = 255
          while (x == 255) { x = u8e(p); p += 1; mLen += x
            if (mLen > MaxBytes) throw new Malformed }
        }
        out.copyMatch(offset, mLen, windowStart)
      }
    }
  }

  private def decode0(b: Array[Byte], maxLen: Int): Array[Byte] = {
    if (b.length == 0) throw new Malformed
    val out = new Out(maxLen)
    var p = 0
    while (p < b.length) {
      val magic = u32(b, p)
      if ((magic & 0xfffffff0L) == 0x184d2a50L) { // skippable
        val size = u32(b, p + 4)
        if (size > Int.MaxValue - 8 || p + 8 + size > b.length)
          throw new Malformed
        p += 8 + size.toInt
      } else if (magic == 0x184d2204L) {
        p = frame(b, p + 4, out, maxLen)
      } else throw new Malformed // incl. the legacy 0x184C2102 format
    }
    out.toArray
  }

  private def frame(b: Array[Byte], p0: Int, out: Out, maxLen: Int): Int = {
    var p = p0
    val hdrStart = p
    val flg = u8(b, p); p += 1
    if ((flg >>> 6) != 1) throw new Malformed // version must be 01
    if ((flg & 2) != 0) throw new Malformed // reserved bit
    val independent = (flg & 0x20) != 0
    val blockChecksum = (flg & 0x10) != 0
    val hasContentSize = (flg & 0x08) != 0
    val contentChecksum = (flg & 0x04) != 0
    val hasDictId = (flg & 0x01) != 0
    val bd = u8(b, p); p += 1
    if ((bd & 0x8f) != 0) throw new Malformed // reserved bits
    val bsCode = (bd >>> 4) & 7
    if (bsCode < 4) throw new Malformed
    val blockMax = 1 << (8 + 2 * bsCode) // 4→64KB … 7→4MB
    var contentSize = -1L
    if (hasContentSize) {
      contentSize = 0
      var i = 0
      while (i < 8) { contentSize |= u8(b, p).toLong << (8 * i); p += 1; i += 1 }
      if (contentSize > maxLen) throw new Malformed
    }
    if (hasDictId) {
      val did = u32(b, p); p += 4
      if (did != 0) throw new Malformed // dictionaries: documented None
    }
    val hc = u8(b, p); p += 1
    if (((Xxh32.hash(b, hdrStart, p - 1 - hdrStart, 0) >>> 8) & 0xff) != hc)
      throw new Malformed
    val frameStart = out.n
    var done = false
    while (!done) {
      val bsize = u32(b, p); p += 4
      if (bsize == 0) done = true // EndMark
      else {
        val raw = (bsize & 0x80000000L) != 0
        val len = (bsize & 0x7fffffffL).toInt
        if (len > blockMax + 16 || p + len > b.length) throw new Malformed
        if (blockChecksum) {
          val want = u32(b, p + len)
          if ((Xxh32.hash(b, p, len, 0) & 0xffffffffL) != want)
            throw new Malformed
        }
        if (raw) out.append(b, p, len)
        else {
          val before = out.n
          block(b, p, p + len, out,
            if (independent) before else frameStart)
          if (out.n - before > blockMax) throw new Malformed
        }
        p += len + (if (blockChecksum) 4 else 0)
      }
    }
    if (contentSize >= 0 && (out.n - frameStart).toLong != contentSize)
      throw new Malformed
    if (contentChecksum) {
      val want = u32(b, p); p += 4
      if ((Xxh32.hash(out.buf, frameStart, out.n - frameStart, 0) &
        0xffffffffL) != want) throw new Malformed
    }
    p
  }

  // ════════════════════════════ encoder ═══════════════════════════

  /** One conforming frame: block-independent 64 KiB blocks, content
    * size + content checksum, greedy hash-table matches honoring the
    * end-of-block rules. lz4-java's LZ4FrameInputStream decodes these
    * byte-exact (Lz4Spec). */
  def compress(content: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(content.length / 2 + 64)
    def le32(v: Long): Unit =
      for (i <- 0 until 4) out.write(((v >> (8 * i)) & 0xff).toInt)
    le32(0x184d2204L)
    val hdr = new java.io.ByteArrayOutputStream(16)
    hdr.write(0x40 | 0x20 | 0x08 | 0x04) // v01, independent, csize, cchk
    hdr.write(4 << 4) // 64 KiB block max
    for (i <- 0 until 8)
      hdr.write(((content.length.toLong >> (8 * i)) & 0xff).toInt)
    val hb = hdr.toByteArray
    out.write(hb, 0, hb.length)
    out.write(((Xxh32.hash(hb, 0, hb.length, 0) >>> 8) & 0xff).toInt)
    var off = 0
    while (off < content.length) {
      val end = math.min(off + 65536, content.length)
      val body = compressBlock(content, off, end)
      if (body == null || body.length >= end - off) { // raw block wins
        le32((end - off).toLong | 0x80000000L)
        out.write(content, off, end - off)
      } else {
        le32(body.length.toLong)
        out.write(body, 0, body.length)
      }
      off = end
    }
    le32(0L) // EndMark
    le32(Xxh32.hash(content, 0, content.length, 0) & 0xffffffffL)
    out.toByteArray
  }

  /** Greedy block compress over content[off, end) or null when
    * incompressible; spec end rules: the last 5 bytes are literals
    * and no match starts within the last 12. */
  private def compressBlock(c: Array[Byte], off: Int, end: Int): Array[Byte] = {
    val n = end - off
    if (n < 13) return null // too small for any legal match
    val out = new java.io.ByteArrayOutputStream(n / 2 + 16)
    val table = new Array[Int](1 << 14)
    def hash4(p: Int): Int = {
      val v = (c(p) & 0xff) | ((c(p + 1) & 0xff) << 8) |
        ((c(p + 2) & 0xff) << 16) | ((c(p + 3) & 0xff) << 24)
      (v * 0x9e3779b1) >>> 18
    }
    def writeLen(extra: Int): Unit = {
      var r = extra
      while (r >= 255) { out.write(255); r -= 255 }
      out.write(r)
    }
    def emit(litFrom: Int, litLen: Int, mLen: Int, offset: Int): Unit = {
      val litNib = math.min(litLen, 15)
      val matNib = if (mLen == 0) 0 else math.min(mLen - 4, 15)
      out.write((litNib << 4) | matNib)
      if (litNib == 15) writeLen(litLen - 15)
      out.write(c, litFrom, litLen)
      if (mLen > 0) {
        out.write(offset & 0xff); out.write((offset >> 8) & 0xff)
        if (matNib == 15) writeLen(mLen - 4 - 15)
      }
    }
    val mflimit = end - 12 // no match STARTS past here
    val matchEndLimit = end - 5 // the last 5 bytes stay literal
    var anchor = off
    var p = off
    while (p < mflimit) {
      val h = hash4(p)
      val cand = table(h) - 1
      table(h) = p + 1
      if (cand >= off && cand < p && p - cand <= 65535 &&
        c(cand) == c(p) && c(cand + 1) == c(p + 1) &&
        c(cand + 2) == c(p + 2) && c(cand + 3) == c(p + 3)) {
        var mLen = 4
        while (p + mLen < matchEndLimit && c(cand + mLen) == c(p + mLen))
          mLen += 1
        emit(anchor, p - anchor, mLen, p - cand)
        p += mLen
        anchor = p
      } else p += 1
    }
    emit(anchor, end - anchor, 0, 0) // literals-only last sequence
    out.toByteArray
  }
}

/** XXH32 (public algorithm, Yann Collet) — the LZ4 frame format's
  * header/block/content checksums. */
private[text] object Xxh32 {
  private val P1 = 0x9e3779b1
  private val P2 = 0x85ebca77
  private val P3 = 0xc2b2ae3d
  private val P4 = 0x27d4eb2f
  private val P5 = 0x165667b1

  /** Returns the checksum as an UNSIGNED value in a Long. */
  def hash(b: Array[Byte], off: Int, len: Int, seed: Int): Long = {
    def u32le(p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16) | (b(p + 3) << 24)
    def rotl(x: Int, r: Int): Int = (x << r) | (x >>> (32 - r))
    var p = off
    val end = off + len
    var h =
      if (len >= 16) {
        var a1 = seed + P1 + P2
        var a2 = seed + P2
        var a3 = seed
        var a4 = seed - P1
        while (p + 16 <= end) {
          a1 = rotl(a1 + u32le(p) * P2, 13) * P1
          a2 = rotl(a2 + u32le(p + 4) * P2, 13) * P1
          a3 = rotl(a3 + u32le(p + 8) * P2, 13) * P1
          a4 = rotl(a4 + u32le(p + 12) * P2, 13) * P1
          p += 16
        }
        rotl(a1, 1) + rotl(a2, 7) + rotl(a3, 12) + rotl(a4, 18)
      } else seed + P5
    h += len
    while (p + 4 <= end) {
      h = rotl(h + u32le(p) * P3, 17) * P4
      p += 4
    }
    while (p < end) {
      h = rotl(h + (b(p) & 0xff) * P5, 11) * P1
      p += 1
    }
    h ^= h >>> 15
    h *= P2
    h ^= h >>> 13
    h *= P3
    h ^= h >>> 16
    h & 0xffffffffL
  }
}
