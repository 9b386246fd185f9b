package graft.multimodal

/** Baseline TIFF pixel decode — pure JVM, public spec (TIFF 6.0):
  * the scan/dataset interchange format onto the real pixel path.
  * Scope (the baseline-TIFF profile):
  *
  *  - both byte orders (`II` little-endian, `MM` big-endian), the
  *    42 magic, first-IFD walk with inline-vs-offset values
  *    (BYTE/SHORT/LONG entry types);
  *  - photometric interpretations 0 (WhiteIsZero — samples inverted
  *    on decode), 1 (BlackIsZero), 2 (RGB, 3 or 4 samples — the 4th
  *    treated as alpha) and 3 (palette-color through the 16-bit
  *    ColorMap, high byte);
  *  - 8-bit samples, chunky planar configuration, multi-strip images
  *    (StripOffsets/StripByteCounts/RowsPerStrip), compression 1
  *    (none), 5 (LZW — the dominant archival-TIFF compression:
  *    MSB-first code packing, 9-12 bit widths with the EARLY-CHANGE
  *    rule, per-strip Clear/EOI; same algorithm family as [[Gif]]'s
  *    LZW, different packing convention and width boundary) and
  *    32773 (PackBits, decoded per strip with the -128 no-op rule);
  *  - the horizontal-differencing Predictor (tag 317, value 2) LZW
  *    pairs with in practice, undone row-wise after decompression;
  *  - TILED images (tags 322-325): per-tile decompression with the
  *    same codec set, edge tiles padded to the full tile grid and
  *    cropped on the blit, predictor undone per tile row;
  *  - planar configuration 2 (separate sample planes, strips only):
  *    per-plane strip runs interleaved after decode, the predictor's
  *    row stride dropping to one channel.
  *
  *  - 16-bit samples (gray/RGB/RGBA, strips, plain or
  *    LZW/PackBits): scaled round(v·255/65535) into the 8-bit
  *    domain — the PNG 16-bit convention, and exactly the JDK
  *    raster scaling ImageIoDifferentialSpec compares against;
  *    16-bit with predictor/tiles/planar-2/palette stays None.
  *
  * Everything else (bilevel, JPEG-in-TIFF, tiled planar-2)
  * returns None — the documented boundary; the format's long tail
  * is endless, and this profile covers the bulk of scanned/exported
  * corpora. Independent pins: the closed-form gate oracle AND
  * ImageIoDifferentialSpec (the JDK ships its own TIFF reader).
  * Same totality contract as every decoder (DecoderFuzzSpec). */
object Tiff {

  private val MaxPixels = 16L * 1024 * 1024

  private final class Malformed extends RuntimeException(null, null, false, false)

  def decodePixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try decode0(b)
    catch { case _: Malformed | _: ArrayIndexOutOfBoundsException |
      _: NegativeArraySizeException => None }

  private def decode0(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 8) return None
    val le = if (b(0) == 'I' && b(1) == 'I') true
      else if (b(0) == 'M' && b(1) == 'M') false
      else return None
    def u16(p: Int): Int = {
      if (p + 2 > b.length) throw new Malformed
      if (le) (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
      else ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
    }
    def u32(p: Int): Long = {
      if (p + 4 > b.length) throw new Malformed
      if (le) (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
      else ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    }
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = u16(ifd.toInt)
    var width = 0; var height = 0
    var bits = Array(1) // BitsPerSample defaults to 1 per spec
    var compression = 1
    var photometric = -1
    var spp = 1
    var rowsPerStrip = Long.MaxValue
    var stripOffsets: Array[Long] = null
    var stripCounts: Array[Long] = null
    var colorMap: Array[Int] = null // 3 * 2^bits SHORT values
    var planar = 1
    var predictor = 1
    var tileW = 0; var tileH = 0
    var tileOffsets: Array[Long] = null
    var tileCounts: Array[Long] = null

    var e = 0
    while (e < n) {
      val p = ifd.toInt + 2 + e * 12
      if (p + 12 > b.length) return None
      val tag = u16(p)
      val tpe = u16(p + 2)
      val count = u32(p + 4)
      if (count < 0 || count > (1 << 20)) throw new Malformed
      val elemSize = tpe match {
        case 1 | 2 | 6 | 7 => 1 // BYTE/ASCII/SBYTE/UNDEFINED
        case 3 | 8 => 2 // SHORT
        case 4 | 9 => 4 // LONG
        case 5 | 10 => 8 // RATIONAL
        case _ => 0
      }
      // values live inline when they fit the 4-byte slot
      val valAt =
        if (elemSize > 0 && elemSize * count <= 4) p + 8
        else u32(p + 8).toInt
      def ints(i: Int): Long = tpe match {
        case 1 => if (valAt + i >= b.length) throw new Malformed
          else b(valAt + i) & 0xffL
        case 3 => u16(valAt + 2 * i).toLong
        case 4 => u32(valAt + 4 * i)
        case _ => throw new Malformed
      }
      tag match {
        case 256 => width = ints(0).toInt
        case 257 => height = ints(0).toInt
        case 258 => bits = Array.tabulate(count.toInt)(ints(_).toInt)
        case 259 => compression = ints(0).toInt
        case 262 => photometric = ints(0).toInt
        case 273 => stripOffsets = Array.tabulate(count.toInt)(ints)
        case 277 => spp = ints(0).toInt
        case 278 => rowsPerStrip = ints(0)
        case 279 => stripCounts = Array.tabulate(count.toInt)(ints)
        case 284 => planar = ints(0).toInt
        case 317 => predictor = ints(0).toInt
        case 320 => colorMap = Array.tabulate(count.toInt)(ints(_).toInt)
        case 322 => tileW = ints(0).toInt
        case 323 => tileH = ints(0).toInt
        case 324 => tileOffsets = Array.tabulate(count.toInt)(ints)
        case 325 => tileCounts = Array.tabulate(count.toInt)(ints)
        case _ => // ancillary tags skipped
      }
      e += 1
    }

    // the supported profile
    if (width <= 0 || height <= 0 ||
      width.toLong * height > MaxPixels) return None
    if (planar != 1 && planar != 2) return None
    if (compression != 1 && compression != 5 && compression != 32773)
      return None
    if (predictor != 1 && predictor != 2) return None
    val bps =
      if (bits.forall(_ == 8)) 8
      else if (bits.forall(_ == 16)) 16
      else return None
    val channels = photometric match {
      case 0 | 1 => 1
      case 2 => if (spp == 3 || spp == 4) spp else return None
      case 3 => 1
      case _ => return None
    }
    if (photometric != 2 && spp != channels) return None
    if (photometric == 3 &&
      (colorMap == null || colorMap.length < 3 * 256)) return None
    // the 16-bit profile: strips only, no predictor, no palette
    if (bps == 16 && (photometric == 3 || predictor == 2 ||
      tileOffsets != null || (planar == 2 && channels > 1))) return None

    /** Decompress one strip/tile segment into dst(got until limit);
      * returns the new fill point or -1 on a malformed segment. */
    def segment(off: Long, len: Long, dst: Array[Byte], got0: Int,
        limit: Int): Int = {
      if (off < 0 || len < 0 || off + len > b.length) return -1
      var got = got0
      if (compression == 1) {
        val take = math.min(len, (limit - got).toLong).toInt
        System.arraycopy(b, off.toInt, dst, got, take)
        got + take
      } else if (compression == 5) { // LZW
        lzwStrip(b, off.toInt, (off + len).toInt, dst, got, limit)
      } else { // PackBits
        var p = off.toInt
        val end = (off + len).toInt
        while (p < end && got < limit) {
          val ctl = b(p); p += 1
          if (ctl >= 0) { // literal run of ctl+1 bytes
            val cnt = math.min(ctl + 1, limit - got)
            if (p + ctl + 1 > end) return -1
            System.arraycopy(b, p, dst, got, cnt)
            got += cnt; p += ctl + 1
          } else if (ctl != -128) { // repeat next byte 1-ctl times
            if (p >= end) return -1
            val cnt = math.min(1 - ctl, limit - got)
            java.util.Arrays.fill(dst, got, got + cnt, b(p))
            got += cnt; p += 1
          } // -128: no-op
        }
        got
      }
    }

    /** Undo horizontal differencing row-wise (TIFF 6.0 §14). */
    def undoPredictor(dst: Array[Byte], rowB: Int, rows: Int): Unit =
      if (predictor == 2) {
        var y = 0
        while (y < rows) {
          var q = y * rowB + channels
          val rowEnd = (y + 1) * rowB
          while (q < rowEnd) {
            dst(q) = (dst(q) + dst(q - channels)).toByte
            q += 1
          }
          y += 1
        }
      }

    val rowBytes = width * channels * (bps / 8)
    val data = new Array[Byte](rowBytes * height)
    if (tileOffsets != null) {
      // ── tiled layout: full-size edge-padded tiles, cropped blit ──
      if (stripOffsets != null) return None // exactly one layout
      if (planar == 2 && channels > 1) return None // documented boundary
      if (tileW <= 0 || tileH <= 0 || tileW % 16 != 0 || tileH % 16 != 0)
        return None
      if (tileCounts == null ||
        tileCounts.length != tileOffsets.length) return None
      val across = (width + tileW - 1) / tileW
      val down = (height + tileH - 1) / tileH
      if (tileOffsets.length != across * down) return None
      val tileRowB = tileW * channels
      val tileBuf = new Array[Byte](tileRowB * tileH)
      var t = 0
      while (t < tileOffsets.length) {
        val got = segment(tileOffsets(t), tileCounts(t), tileBuf, 0,
          tileBuf.length)
        if (got < tileBuf.length) return None
        undoPredictor(tileBuf, tileRowB, tileH)
        val tx = (t % across) * tileW
        val ty = (t / across) * tileH
        val copyW = math.min(tileW, width - tx) * channels
        val copyH = math.min(tileH, height - ty)
        var y = 0
        while (y < copyH) {
          System.arraycopy(tileBuf, y * tileRowB, data,
            (ty + y) * rowBytes + tx * channels, copyW)
          y += 1
        }
        t += 1
      }
    } else if (planar == 2 && channels > 1) {
      // ── separate planes: one strip run per sample, interleave ──
      if (stripOffsets == null || stripCounts == null) return None
      if (stripOffsets.length % channels != 0) return None
      val perPlane = stripOffsets.length / channels
      val plane = new Array[Byte](width * height)
      var c = 0
      while (c < channels) {
        var got = 0
        var s = 0
        while (s < perPlane && got < plane.length) {
          val k = c * perPlane + s
          got = segment(stripOffsets(k), stripCounts(k), plane, got,
            plane.length)
          if (got < 0) return None
          s += 1
        }
        if (got < plane.length) return None
        // planar predictor differences within ONE channel: stride 1
        if (predictor == 2) {
          var y = 0
          while (y < height) {
            var q = y * width + 1
            val rowEnd = (y + 1) * width
            while (q < rowEnd) {
              plane(q) = (plane(q) + plane(q - 1)).toByte
              q += 1
            }
            y += 1
          }
        }
        var i = 0
        while (i < plane.length) {
          data(i * channels + c) = plane(i)
          i += 1
        }
        c += 1
      }
    } else {
      if (stripOffsets == null) return None
      val counts =
        if (stripCounts != null) stripCounts
        else if (compression == 1 && stripOffsets.length == 1)
          Array(rowBytes.toLong * height) // spec allows omission
        else return None
      if (counts.length != stripOffsets.length) return None
      var got = 0
      var s = 0
      while (s < stripOffsets.length && got < data.length) {
        got = segment(stripOffsets(s), counts(s), data, got, data.length)
        if (got < 0) return None
        s += 1
      }
      if (got < data.length) return None
      undoPredictor(data, rowBytes, height)
    }

    // 16-bit samples scale into the 8-bit domain once, up front
    val data8 =
      if (bps == 8) data
      else {
        val d8 = new Array[Byte](width * height * channels)
        var sI = 0
        while (sI < d8.length) {
          val q = sI * 2
          val v =
            if (le) (data(q) & 0xff) | ((data(q + 1) & 0xff) << 8)
            else ((data(q) & 0xff) << 8) | (data(q + 1) & 0xff)
          d8(sI) = ((v * 255 + 32767) / 65535).toByte
          sI += 1
        }
        d8
      }

    val out = new Array[Int](width * height)
    var i = 0
    while (i < out.length) {
      val q = i * channels
      out(i) = photometric match {
        case 0 =>
          val g = 255 - (data8(q) & 0xff) // WhiteIsZero
          0xff000000 | (g << 16) | (g << 8) | g
        case 1 =>
          val g = data8(q) & 0xff
          0xff000000 | (g << 16) | (g << 8) | g
        case 3 =>
          val idx = data8(q) & 0xff
          // ColorMap entries are 16-bit; the 8-bit projection is the
          // high byte (entries here are v*257 so this is exact)
          0xff000000 | ((colorMap(idx) >> 8) << 16) |
            ((colorMap(256 + idx) >> 8) << 8) | (colorMap(512 + idx) >> 8)
        case _ =>
          val a = if (channels == 4) data8(q + 3) & 0xff else 255
          (a << 24) | ((data8(q) & 0xff) << 16) |
            ((data8(q + 1) & 0xff) << 8) | (data8(q + 2) & 0xff)
      }
      i += 1
    }
    Some((width, height, out))
  }

  /** TIFF-variant LZW strip decode (TIFF 6.0 §13): 8-bit roots,
    * Clear 256, EOI 257, first table entry 258, codes packed
    * MSB-first, widths 9-12 bumping at the EARLY-CHANGE boundary
    * (next entry index == 2^width - 1 — one code earlier than GIF's
    * convention). Writes into dst(got until limit); returns the new
    * fill point; Malformed on truncation, a non-root first code, or
    * an out-of-range code. */
  private[multimodal] def lzwStrip(b: Array[Byte], off: Int, end: Int,
      dst: Array[Byte], got0: Int, limit: Int): Int = {
    val Clear = 256; val Eoi = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val seq = new Array[Byte](4096)
    var next = 258; var width = 9
    var prev = -1
    var got = got0
    var acc = 0L; var nbits = 0; var p = off
    def emit(code0: Int): Unit = {
      var n = 0; var c = code0
      while (c > Eoi) {
        if (n >= seq.length) throw new Malformed
        seq(n) = suffix(c); n += 1; c = prefix(c)
      }
      if (c >= 256) throw new Malformed // a chain must root in a byte
      if (got + n + 1 > limit) throw new Malformed
      dst(got) = c.toByte; got += 1
      var i = n - 1
      while (i >= 0) { dst(got) = seq(i); got += 1; i -= 1 }
    }
    def firstByte(code0: Int): Int = {
      var c = code0
      while (c > Eoi) c = prefix(c)
      c
    }
    var done = false
    while (!done) {
      while (nbits < width && p < end) {
        acc = (acc << 8) | (b(p) & 0xffL); nbits += 8; p += 1
      }
      if (nbits < width) throw new Malformed // truncated strip
      val code = ((acc >>> (nbits - width)) & ((1 << width) - 1)).toInt
      nbits -= width
      if (code == Clear) { next = 258; width = 9; prev = -1 }
      else if (code == Eoi) done = true
      else if (prev < 0) {
        if (code >= 256) throw new Malformed // first must be a root
        emit(code); prev = code
      } else {
        if (code > next || (code == next && next >= 4096))
          throw new Malformed
        if (code == next) { // the self-referential case
          prefix(next) = prev; suffix(next) = firstByte(prev).toByte
          next += 1
          emit(code)
        } else {
          if (next < 4096) {
            prefix(next) = prev; suffix(next) = firstByte(code).toByte
            next += 1
          }
          emit(code)
        }
        prev = code
        if (width < 12 && next == (1 << width) - 1) width += 1
      }
      if (got >= limit) done = true // strip filled; trailing EOI optional
    }
    got
  }

  /** Gate surface (`mm_tiff_decode`): synthesize a real TIFF per
    * document ([[MediaSynth.tiff]] — byte order by parity,
    * photometric class by doc_id % 4 with the WhiteIsZero class
    * storing inverted samples so every class decodes to the same
    * closed forms, PackBits on the doc_id % 3 == 1 class,
    * multi-strip throughout), decode through the full production
    * path, and report the pixel statistics the oracle recomputes
    * from doc_id closed forms. Rows with doc_id % 5 == 3 get a
    * TRUNCATED stream and owe the (-1,-1,-1,-1) fallback. */
  def decodeReport(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").as[Long]
      .map { id =>
        val full = MediaSynth.tiff(id)
        val payload = if (id % 5 == 3) full.take(16) else full
        decodePixels(payload) match {
          case Some((w, h, px)) =>
            var sum = 0L; var wsum = 0L
            var i = 0
            while (i < px.length) {
              val rgb = ((px(i) >> 16) & 0xff) + ((px(i) >> 8) & 0xff) +
                (px(i) & 0xff)
              val x = i % w; val y = i / w
              sum += rgb
              wsum += rgb.toLong * (1L + x + w.toLong * y)
              i += 1
            }
            (id, w.toLong, h.toLong, sum, wsum)
          case None => (id, -1L, -1L, -1L, -1L)
        }
      }
      .toDF("doc_id", "w", "h", "pix_sum", "pix_wsum")
  }
}
