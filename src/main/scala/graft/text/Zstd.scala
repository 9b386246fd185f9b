package graft.text

/** Zstandard frame decode — pure JVM, public spec (RFC 8878):
  * `.jsonl.zst` is the de-facto LLM-corpus distribution format and
  * `content-encoding: zstd` is spreading through crawls, and both
  * fell off the decode path entirely (r14 "What's missing #3" — the
  * JDK ships no zstd codec). Scope — the full single-threaded frame
  * format:
  *
  *  - frame header walk: magic, descriptor (content-size flag,
  *    single-segment, checksum, dictionary-ID), window descriptor
  *    (exponent/mantissa), all four content-size widths, SKIPPABLE
  *    frames (magic 0x184D2A50-5F), multi-frame concatenation;
  *  - blocks: raw, RLE, compressed, the 3-byte little-endian header;
  *  - literals: raw, RLE, Huffman-compressed and treeless (the
  *    within-frame table reuse), all four size formats, 1-stream and
  *    4-stream (jump table) layouts; Huffman tree descriptions both
  *    direct (4-bit packed weights) and FSE-compressed (two
  *    interleaved states over a backward bitstream), the implied
  *    last weight, the 11-bit code-length ceiling;
  *  - FSE: the forward-bitstream normalized-count header (threshold
  *    descent + 2-bit zero-repeat flags), table spread (lowprob
  *    symbols at the high end, the (5/8·size + 3) step), decode
  *    tables up to the per-category accuracy ceilings (LL 9, OF 8,
  *    ML 9, weights 6);
  *  - sequences: predefined / RLE / FSE-compressed / repeat table
  *    modes for each of the three alphabets (the RFC's predefined
  *    distributions are embedded and checksummed against 2^AL), the
  *    backward bitstream with LL→OF→ML state init, OF→ML→LL
  *    extra-bit reads, LL→ML→OF state updates, the code→(baseline,
  *    bits) expansions derived generatively from their cumulative
  *    structure, and the full three-slot repeat-offset history with
  *    the literals-length-0 rotation;
  *  - sequence execution against the in-frame window (overlap-safe
  *    byte copy, offset bounded by frame position and window size);
  *  - the XXH64-based content checksum, verified when present.
  *
  * Dictionaries (RFC 8878 §5): [[parseDictionary]] reads the full
  * format (entropy tables seeding Treeless/Repeat modes, initial
  * repcodes, content prefix for match offsets), the decompress
  * overload resolves frames by Dictionary_ID, [[buildDictionary]]
  * emits valid dictionaries, and the compress overload produces
  * frames that reference one — ZstdDictSpec pins BOTH directions
  * against the reference CLI (its trained dictionary + `-D` frames
  * decode byte-exact here; it decodes ours). An unresolvable ID
  * declines. Decode-or-reject totality ([[ZstdSpec]] fuzzes it):
  * a 64 MiB bomb guard, every malformed shape declines, never a
  * throw. Foreign pins: `src/test/resources/zstd_vectors/` holds
  * frames produced by the REAL zstd CLI (v1.5.7) at levels 1/3/19
  * over seven payload shapes — a conforming encoder this decoder
  * must agree with byte-for-byte, which a mirrored self-roundtrip
  * can never prove. */
object Zstd {

  private val MaxBytes = 64 * 1024 * 1024
  private val MaxWindow = 128L * 1024 * 1024

  private final class Malformed extends RuntimeException(null, null, false, false)

  /** Decompress a complete zstd stream (one or more frames,
    * skippable frames allowed) or None. Frames that reference a
    * dictionary decline — use the dictionary overload. */
  def decompress(b: Array[Byte], maxLen: Int = MaxBytes): Option[Array[Byte]] =
    decompress(b, maxLen, Map.empty[Long, Dict])

  /** [[decompress]] with dictionary resolution: a frame whose header
    * carries a Dictionary_ID looks it up here (RFC 8878 §5) — its
    * entropy tables seed the Treeless/Repeat modes, its repcodes the
    * initial recent offsets, and its content the virtual past match
    * offsets may reach into. An ID the map lacks declines. */
  def decompress(b: Array[Byte], maxLen: Int,
      dicts: Map[Long, Dict]): Option[Array[Byte]] =
    try Some(decode0(b, maxLen, dicts))
    catch { case _: Malformed | _: ArrayIndexOutOfBoundsException |
      _: NegativeArraySizeException | _: OutOfBoundsException => None }

  private final class OutOfBoundsException extends RuntimeException

  // ── little-endian scalar reads ────────────────────────────────────
  private def u8(b: Array[Byte], p: Int): Int = {
    if (p >= b.length) throw new Malformed
    b(p) & 0xff
  }
  private def u16(b: Array[Byte], p: Int): Int = u8(b, p) | (u8(b, p + 1) << 8)
  private def u24(b: Array[Byte], p: Int): Int = u16(b, p) | (u8(b, p + 2) << 16)
  private def u32(b: Array[Byte], p: Int): Long = u24(b, p) | (u8(b, p + 3).toLong << 24)

  // ── forward bitstream (FSE normalized-count headers) ─────────────
  private final class FwdBits(b: Array[Byte], var pos: Int, val end: Int) {
    private var acc = 0L
    private var nbits = 0
    def read(n: Int): Int = {
      while (nbits < n) {
        acc |= (if (pos < end) (b(pos) & 0xffL) else throw new Malformed) << nbits
        pos += 1; nbits += 8
      }
      val v = (acc & ((1L << n) - 1)).toInt
      acc >>>= n; nbits -= n
      v
    }
    /** Byte position just past the last consumed bit (aligned up). */
    def bytePos: Int = pos - (nbits >> 3)
  }

  // ── backward bitstream (FSE/Huffman payload streams) ─────────────
  /** Reads bits from the END of [start, end): the last byte's highest
    * set bit is the sentinel; reads return the highest remaining bits
    * first. Reads past the start zero-pad and drive bitsLeft
    * negative — the overflow marker the weight-stream termination
    * uses; sequence/Huffman decode REJECTS a negative balance. */
  private final class BackBits(b: Array[Byte], start: Int, end: Int) {
    if (end <= start) throw new Malformed
    private val lastByte = b(end - 1) & 0xff
    if (lastByte == 0) throw new Malformed // no sentinel
    var bitsLeft: Int = (end - start - 1) * 8 +
      (31 - Integer.numberOfLeadingZeros(lastByte))
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        bitsLeft -= 1
        val bit =
          if (bitsLeft < 0) 0
          else (b(start + (bitsLeft >> 3)) >> (bitsLeft & 7)) & 1
        v = (v << 1) | bit
        i += 1
      }
      v
    }
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      var bl = bitsLeft
      while (i < n) {
        bl -= 1
        val bit =
          if (bl < 0) 0
          else (b(start + (bl >> 3)) >> (bl & 7)) & 1
        v = (v << 1) | bit
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = bitsLeft -= n
  }

  // ── FSE ──────────────────────────────────────────────────────────
  /** A decode table: per state cell, the symbol, the bit count of the
    * update read, and the new-state baseline. */
  private[text] final class FseTable(val accuracyLog: Int, val symbol: Array[Int],
    val nbBits: Array[Int], val baseline: Array[Int]) extends Serializable

  /** Parse a normalized-count header (forward bitstream, RFC 8878
    * §4.1.1) and return (counts, accuracyLog, bytesConsumed). */
  private def readNCount(b: Array[Byte], p0: Int, end: Int,
      maxSymbol: Int, maxLog: Int): (Array[Int], Int, Int) = {
    val fr = new FwdBits(b, p0, end)
    val al = 5 + fr.read(4)
    if (al > maxLog) throw new Malformed
    var remaining = (1 << al) + 1
    var threshold = 1 << al
    var nbBits = al + 1
    val counts = new Array[Int](maxSymbol + 1)
    var sym = 0
    var prev0 = false
    while (remaining > 1) {
      if (sym > maxSymbol) throw new Malformed
      if (prev0) {
        var rep = fr.read(2)
        while (rep == 3) {
          sym += 3
          if (sym > maxSymbol + 1) throw new Malformed
          rep = fr.read(2)
        }
        sym += rep
        if (sym > maxSymbol) throw new Malformed
        prev0 = false
      }
      val max = (2 * threshold - 1) - remaining
      val small = fr.read(nbBits - 1)
      val count =
        if (small < max) small
        else {
          val full = small | (fr.read(1) << (nbBits - 1))
          if (full >= threshold) full - max else full
        }
      val c = count - 1 // -1 encodes the "less than 1" probability
      remaining -= (if (c < 0) -c else c)
      counts(sym) = c
      sym += 1
      prev0 = c == 0
      while (remaining < threshold) { nbBits -= 1; threshold >>= 1 }
    }
    if (remaining != 1) throw new Malformed
    (counts, al, fr.bytePos - p0)
  }

  /** Build the decode table from normalized counts (RFC 8878 §4.1.1:
    * lowprob symbols fill from the top; the (size/2 + size/8 + 3)
    * step spreads the rest; baselines from per-symbol counters). */
  private def buildFse(counts: Array[Int], al: Int): FseTable = {
    val size = 1 << al
    val symbol = new Array[Int](size)
    val nbBits = new Array[Int](size)
    val baseline = new Array[Int](size)
    var highThreshold = size - 1
    var s = 0
    while (s < counts.length) {
      if (counts(s) == -1) {
        symbol(highThreshold) = s; highThreshold -= 1
        if (highThreshold < -1) throw new Malformed
      }
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    var pos = 0
    s = 0
    while (s < counts.length) {
      var i = 0
      while (i < counts(s)) {
        symbol(pos) = s
        pos = (pos + step) & (size - 1)
        while (pos > highThreshold) pos = (pos + step) & (size - 1)
        i += 1
      }
      s += 1
    }
    if (pos != 0) throw new Malformed
    val next = new Array[Int](counts.length)
    s = 0
    while (s < counts.length) {
      next(s) = if (counts(s) == -1) 1 else counts(s)
      s += 1
    }
    var u = 0
    while (u < size) {
      val sy = symbol(u)
      val x = next(sy); next(sy) += 1
      val nb = al - (31 - Integer.numberOfLeadingZeros(x))
      if (nb < 0 || nb > al) throw new Malformed
      nbBits(u) = nb
      baseline(u) = (x << nb) - size
      u += 1
    }
    new FseTable(al, symbol, nbBits, baseline)
  }

  /** A single-symbol table (RLE sequence mode): 0-bit updates. */
  private def rleFse(sym: Int): FseTable =
    new FseTable(0, Array(sym), Array(0), Array(0))

  // ── Huffman ──────────────────────────────────────────────────────
  private[text] final class HufTable(val tableLog: Int, val symbol: Array[Int],
    val length: Array[Int]) extends Serializable

  /** Weights → canonical table: the implied last weight completes the
    * 2^k sum; table filled by (weight asc, symbol asc) — the zstd X1
    * layout a top-bits peek indexes directly. */
  private def buildHuf(weights: Array[Int]): HufTable = {
    var total = 0L
    var i = 0
    while (i < weights.length) {
      if (weights(i) > 11) throw new Malformed
      if (weights(i) > 0) total += 1L << (weights(i) - 1)
      i += 1
    }
    if (total == 0) throw new Malformed
    val tableLog = 64 - java.lang.Long.numberOfLeadingZeros(total) // log2(next pow2 > total)
    if (tableLog > 11) throw new Malformed
    val rest = (1L << tableLog) - total
    // rest must itself be a power of two: it IS the implied weight
    if (rest <= 0 || (rest & (rest - 1)) != 0) throw new Malformed
    val lastWeight = java.lang.Long.numberOfTrailingZeros(rest).toInt + 1
    val all = weights :+ lastWeight
    val size = 1 << tableLog.toInt
    val symbol = new Array[Int](size)
    val length = new Array[Int](size)
    var u = 0
    var w = 1
    while (w <= tableLog) {
      var sy = 0
      while (sy < all.length) {
        if (all(sy) == w) {
          val span = 1 << (w - 1)
          val len = tableLog.toInt + 1 - w
          var k = 0
          while (k < span) {
            if (u >= size) throw new Malformed
            symbol(u) = sy; length(u) = len; u += 1; k += 1
          }
        }
        sy += 1
      }
      w += 1
    }
    if (u != size) throw new Malformed
    new HufTable(tableLog.toInt, symbol, length)
  }

  /** Huffman tree description at p: returns (table, bytesConsumed). */
  private def readHufDesc(b: Array[Byte], p: Int, end: Int): (HufTable, Int) = {
    val hb = u8(b, p)
    if (hb < 128) {
      // FSE-compressed weights: ncount header (forward) then a
      // backward bitstream with two interleaved states
      val cEnd = p + 1 + hb
      if (cEnd > end) throw new Malformed
      val (counts, al, nBytes) = readNCount(b, p + 1, cEnd, 15, 6)
      val table = buildFse(counts, al)
      val br = new BackBits(b, p + 1 + nBytes, cEnd)
      var s1 = br.read(al)
      var s2 = br.read(al)
      val ws = new scala.collection.mutable.ArrayBuffer[Int](64)
      def emitAndUpdate(st: Int): Int = {
        ws += table.symbol(st)
        table.baseline(st) + br.read(table.nbBits(st))
      }
      var done = false
      while (!done) {
        if (ws.length > 254) throw new Malformed
        s1 = emitAndUpdate(s1)
        if (br.bitsLeft < 0) { ws += table.symbol(s2); done = true }
        else {
          s2 = emitAndUpdate(s2)
          if (br.bitsLeft < 0) { ws += table.symbol(s1); done = true }
        }
      }
      (buildHuf(ws.toArray), 1 + hb)
    } else {
      val n = hb - 127
      val ws = new Array[Int](n)
      var i = 0
      while (i < n) {
        val byte = u8(b, p + 1 + (i >> 1))
        ws(i) = if ((i & 1) == 0) byte >> 4 else byte & 0xf
        i += 1
      }
      (buildHuf(ws), 1 + (n + 1) / 2)
    }
  }

  /** Decode exactly n symbols from one backward Huffman stream; the
    * stream must be consumed exactly. */
  private def hufStream(table: HufTable, b: Array[Byte], start: Int,
      end: Int, dst: Array[Byte], d0: Int, n: Int): Unit = {
    val br = new BackBits(b, start, end)
    var d = d0
    var i = 0
    while (i < n) {
      val idx = br.peek(table.tableLog)
      dst(d) = table.symbol(idx).toByte
      br.skip(table.length(idx))
      if (br.bitsLeft < 0) throw new Malformed
      d += 1; i += 1
    }
    if (br.bitsLeft != 0) throw new Malformed
  }

  // ── sequence code expansions (generative: cumulative baselines) ──
  private val LlBits: Array[Int] =
    Array.fill(16)(0) ++ Array(1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9,
      10, 11, 12, 13, 14, 15, 16)
  private val LlBase: Array[Int] = {
    val base = new Array[Int](36)
    var acc = 0
    for (c <- 0 until 36) {
      base(c) = if (c < 16) c else acc
      if (c < 16) acc = c + 1 else acc += 1 << LlBits(c)
    }
    base
  }
  private val MlBits: Array[Int] =
    Array.fill(32)(0) ++ Array(1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8,
      9, 10, 11, 12, 13, 14, 15, 16)
  private val MlBase: Array[Int] = {
    val base = new Array[Int](53)
    var acc = 3
    for (c <- 0 until 53) { base(c) = acc; acc += 1 << MlBits(c) }
    base
  }

  // ── predefined FSE distributions (RFC 8878 §3.1.1.3.2.2) ─────────
  private val LlDefault = Array(4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val MlDefault = Array(1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val OfDefault = Array(1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)
  require(LlDefault.map(c => math.max(c, 1)).sum == 64 &&
    MlDefault.map(c => math.max(c, 1)).sum == 64 &&
    OfDefault.map(c => math.max(c, 1)).sum == 32,
    "predefined distributions must sum to 2^AL exactly")
  private lazy val LlPredef = buildFse(LlDefault, 6)
  private lazy val MlPredef = buildFse(MlDefault, 6)
  private lazy val OfPredef = buildFse(OfDefault, 5)

  // ── dictionaries (RFC 8878 §5) ────────────────────────────────────
  // A zstd dictionary = magic 0xEC30A437, Dictionary_ID, entropy
  // tables (Huffman literals table, then FSE tables in OF, ML, LL
  // order — these seed the frame's Treeless/Repeat modes), three
  // 4-byte initial repcodes, then raw content that acts as the
  // frame's virtual past for match offsets ("content prefixing").
  // `.jsonl.zst` shard sets with shared dictionaries are a real
  // distribution shape (r15 verdict Next-round #4).

  /** A parsed dictionary. Opaque: obtain via [[parseDictionary]] (or
    * [[buildDictionary]] + parse); pass to the decompress/compress
    * dictionary overloads. Serializable so a broadcast dictionary
    * reaches executor tasks on a real cluster. */
  final class Dict private[text] (
      private[text] val id: Long,
      private[text] val huf: HufTable,
      private[text] val ofT: FseTable,
      private[text] val mlT: FseTable,
      private[text] val llT: FseTable,
      private[text] val reps: Array[Long],
      private[text] val content: Array[Byte]) extends Serializable {
    def dictId: Long = id
    def contentSize: Int = content.length
  }

  /** Parse a serialized dictionary; None on anything malformed
    * (wrong magic, zero ID, truncated or invalid entropy tables,
    * out-of-range repcodes). */
  def parseDictionary(b: Array[Byte]): Option[Dict] =
    try Some(parseDict0(b))
    catch { case _: Malformed | _: ArrayIndexOutOfBoundsException |
      _: NegativeArraySizeException | _: OutOfBoundsException => None }

  private def parseDict0(b: Array[Byte]): Dict = {
    if (b.length < 8 || u32(b, 0) != 0xec30a437L) throw new Malformed
    val id = u32(b, 4)
    if (id == 0) throw new Malformed // ID 0 means "no dictionary"
    var p = 8
    val (huf, hufBytes) = readHufDesc(b, p, b.length); p += hufBytes
    // FSE tables in stream order OF, ML, LL (same maxima as blocks)
    val (ofC, ofAl, n1) = readNCount(b, p, b.length, 31, 8); p += n1
    val ofT = buildFse(ofC, ofAl)
    val (mlC, mlAl, n2) = readNCount(b, p, b.length, 52, 9); p += n2
    val mlT = buildFse(mlC, mlAl)
    val (llC, llAl, n3) = readNCount(b, p, b.length, 35, 9); p += n3
    val llT = buildFse(llC, llAl)
    if (p + 12 > b.length) throw new Malformed
    val reps = new Array[Long](3)
    var i = 0
    while (i < 3) { reps(i) = u32(b, p); p += 4; i += 1 }
    val content = java.util.Arrays.copyOfRange(b, p, b.length)
    // each recent offset must be non-zero and within the content
    for (r <- reps) if (r == 0 || r > content.length) throw new Malformed
    new Dict(id, huf, ofT, mlT, llT, reps, content)
  }

  /** Serialize a normalized-count header — the exact inverse of
    * [[readNCount]] (forward bitstream, threshold-folded values,
    * 2-bit zero-run repeats, zero-padded to the byte). */
  private def writeNCount(counts: Array[Int], al: Int): Array[Byte] = {
    val bw = new FwdBitW
    bw.bits((al - 5).toLong, 4)
    var remaining = (1 << al) + 1
    var threshold = 1 << al
    var nbBits = al + 1
    var sym = 0
    var prev0 = false
    while (remaining > 1) {
      if (prev0) {
        // count the zero run from sym and emit its 2-bit repeats
        var z = 0
        while (sym + z < counts.length && counts(sym + z) == 0) z += 1
        while (z >= 3) { bw.bits(3, 2); z -= 3; sym += 3 }
        bw.bits(z.toLong, 2); sym += z
        prev0 = false
      }
      val c = if (sym < counts.length) counts(sym) else 0
      val count = c + 1 // -1 (low-prob) encodes as 0
      val max = (2 * threshold - 1) - remaining
      if (count < max) bw.bits(count.toLong, nbBits - 1)
      else if (count < threshold) bw.bits(count.toLong, nbBits)
      else bw.bits((count + max).toLong, nbBits)
      remaining -= (if (c < 0) -c else c)
      sym += 1
      prev0 = c == 0
      while (remaining < threshold) { nbBits -= 1; threshold >>= 1 }
    }
    bw.closePlain()
  }

  /** Build a conforming serialized dictionary from sample content: a
    * Huffman literals table from the samples' byte histogram, the
    * RFC's predefined FSE distributions re-serialized as explicit
    * NCount tables, default repcodes {1,4,8}, and the concatenated
    * samples (tail-capped at 64 KiB — recent context is the valuable
    * end) as content. Not a zstd-CLI-quality trainer, but a VALID
    * dictionary the reference CLI accepts via `-D` (ZstdDictSpec
    * pins that), which is what the gate and library surface need. */
  def buildDictionary(samples: Seq[Array[Byte]], id: Long): Array[Byte] = {
    require(id != 0 && id <= 0xffffffffL, "dictionary ID must be a nonzero u32")
    val cat = new java.io.ByteArrayOutputStream(1 << 16)
    samples.foreach(s => cat.write(s, 0, s.length))
    val all = cat.toByteArray
    val content =
      if (all.length <= (1 << 16)) all
      else java.util.Arrays.copyOfRange(all, all.length - (1 << 16), all.length)
    require(content.length >= 8, "dictionary content too small")
    // FLAT presence histogram, not frequencies: the table only has to
    // be VALID (frames referencing the dictionary self-describe their
    // literals; the table matters solely for Treeless mode, which our
    // encoder never emits) — equal weights bound the code depth at
    // ceil(log2(#symbols)) ≤ 8, inside the format's 11-bit ceiling,
    // where a skewed real histogram could blow past it (the encoder
    // has no length-limiting pass). Bytes ≥ 128 are skipped: the
    // direct-weight description caps at 128 symbols.
    val hist = new Array[Int](256)
    content.foreach(b => if ((b & 0xff) < 128) hist(b & 0xff) = 1)
    hist(0) = 1; hist(1) = 1 // ≥ 2 symbols, always
    val huf = buildHufEncoder(hist).getOrElse(
      throw new IllegalArgumentException("sample histogram not Huffman-codable"))
    val out = new java.io.ByteArrayOutputStream(content.length + 256)
    def le32(v: Long): Unit =
      for (i <- 0 until 4) out.write(((v >> (8 * i)) & 0xff).toInt)
    le32(0xec30a437L)
    le32(id)
    out.write(huf.desc, 0, huf.desc.length)
    out.write(writeNCount(OfDefault, 5))
    out.write(writeNCount(MlDefault, 6))
    out.write(writeNCount(LlDefault, 6))
    le32(1L); le32(4L); le32(8L) // default repcodes
    out.write(content, 0, content.length)
    out.toByteArray
  }

  // ── frame state carried across blocks ────────────────────────────
  private final class FrameState {
    var huf: HufTable = null
    var llT: FseTable = null
    var ofT: FseTable = null
    var mlT: FseTable = null
    val reps: Array[Long] = Array(1L, 4L, 8L)
  }

  /** Growable per-stream output with frame-window match copy. */
  private final class Out(maxLen: Int) {
    var buf = new Array[Byte](8192)
    var n = 0
    private def ensure(extra: Int): Unit = {
      if (n + extra > maxLen) throw new Malformed // bomb guard
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
    def fill(v: Byte, len: Int): Unit = {
      ensure(len)
      java.util.Arrays.fill(buf, n, n + len, v)
      n += len
    }
    /** Overlap-safe match copy from `offset` bytes back; with a
      * dictionary, offsets past the frame's own history reach into
      * the dictionary content — the frame's virtual past (RFC 8878
      * §5 content prefixing) — and a copy may cross from dictionary
      * bytes into frame bytes. */
    def copyMatch(offset: Long, len: Int, frameStart: Int, window: Long,
        dict: Array[Byte]): Unit = {
      val hist = (n - frameStart).toLong
      val dictLen = if (dict == null) 0L else dict.length.toLong
      if (offset <= 0 || offset > hist + dictLen || offset > window + dictLen)
        throw new Malformed
      ensure(len)
      if (offset <= hist) {
        var i = 0
        val src = (n - offset).toInt
        while (i < len) { buf(n + i) = buf(src + i); i += 1 }
        n += len
      } else {
        var i = 0
        var srcD = (dictLen - (offset - hist)).toInt
        while (i < len && srcD < dict.length) {
          buf(n + i) = dict(srcD); i += 1; srcD += 1
        }
        var src = frameStart // the copy crossed into the frame's output
        while (i < len) { buf(n + i) = buf(src); i += 1; src += 1 }
        n += len
      }
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, n)
  }

  // ════════════════════════════ encoder ═══════════════════════════
  // A real zstd COMPRESSOR — single-segment checksummed frames,
  // greedy hash-table LZ with repcode-1 reuse, Huffman-coded literals
  // (direct-weight descriptions, 1- and 4-stream layouts), sequences
  // FSE-coded against the RFC's predefined distributions. Simple but
  // CONFORMING: ZstdSpec roundtrips it through [[decompress]] and,
  // when the reference CLI is on the box, through the real `unzstd`.
  // Fixture writer for `text_zstd_ingest` and a usable library
  // surface for `.zst` output.

  /** Forward bit sink, LSB-first within bytes (the layout the
    * backward readers consume); close() appends the sentinel bit. */
  private final class FwdBitW {
    private val out = new java.io.ByteArrayOutputStream(256)
    private var acc = 0L
    private var nbits = 0
    def bits(v: Long, n: Int): Unit = {
      acc |= (v & ((1L << n) - 1)) << nbits
      nbits += n
      while (nbits >= 8) {
        out.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8
      }
    }
    def close(): Array[Byte] = {
      bits(1, 1) // sentinel
      closePlain()
    }
    /** Flush with zero padding and NO sentinel (NCount headers). */
    def closePlain(): Array[Byte] = {
      if (nbits > 0) { out.write((acc & 0xff).toInt); acc = 0; nbits = 0 }
      out.toByteArray
    }
  }

  /** Per-symbol state→cell inverse of an FSE decode table: the
    * encoder walks transitions backward through it. */
  private def fseInverse(t: FseTable, nSymbols: Int): Array[Array[Int]] = {
    val size = t.symbol.length
    val inv = Array.fill(nSymbols)(null: Array[Int])
    var u = 0
    while (u < size) {
      val s = t.symbol(u)
      if (inv(s) == null) inv(s) = new Array[Int](size)
      var x = t.baseline(u)
      val hi = t.baseline(u) + (1 << t.nbBits(u))
      while (x < hi) { inv(s)(x) = u; x += 1 }
      u += 1
    }
    inv
  }
  private lazy val LlInv = fseInverse(LlPredef, 36)
  private lazy val OfInv = fseInverse(OfPredef, 32)
  private lazy val MlInv = fseInverse(MlPredef, 53)

  private def llCodeOf(ll: Int): Int =
    if (ll < 16) ll
    else { var c = 35; while (LlBase(c) > ll) c -= 1; c }
  private def mlCodeOf(ml: Int): Int = {
    var c = 52; while (MlBase(c) > ml) c -= 1; c
  }

  private final case class Seq0(ll: Int, ml: Int, offValue: Long)

  /** Compress `content` into one conforming zstd frame
    * (single-segment, content size declared, xxh64 checksum). */
  def compress(content: Array[Byte]): Array[Byte] =
    compress0(content, 0, 0L, 1L)

  /** Compress `content` into a frame REFERENCING `dict` (RFC 8878
    * §5): the header carries the Dictionary_ID, the initial repcode
    * comes from the dictionary, and the LZ match search runs over
    * the dictionary content as the frame's virtual past — matches
    * may reach into it, so only a decoder holding the same
    * dictionary can reproduce the content (ZstdDictSpec pins the
    * reference CLI doing exactly that via `-D`). Entropy stays
    * predefined/self-described — conforming: the dictionary's own
    * tables are only one OPTION for a frame that references it. */
  def compress(content: Array[Byte], dict: Dict): Array[Byte] = {
    val virt = new Array[Byte](dict.content.length + content.length)
    System.arraycopy(dict.content, 0, virt, 0, dict.content.length)
    System.arraycopy(content, 0, virt, dict.content.length, content.length)
    compress0(virt, dict.content.length, dict.id, dict.reps(0))
  }

  /** One frame over virt[base, virt.length): bytes before `base` are
    * the virtual past (dictionary content) — searchable, never
    * emitted. */
  private def compress0(virt: Array[Byte], base: Int, dictId: Long,
      rep1Init: Long): Array[Byte] = {
    val len = virt.length - base
    val out = new java.io.ByteArrayOutputStream(len / 2 + 128)
    def le32(v: Long): Unit =
      for (i <- 0 until 4) out.write(((v >> (8 * i)) & 0xff).toInt)
    le32(0xfd2fb528L)
    val fcsFlag =
      if (len < 256) 0
      else if (len < 65536 + 256) 1 else 2
    val didFlag = if (dictId == 0) 0 else 3 // 4-byte ID: always legal
    out.write((fcsFlag << 6) | 0x20 | 0x04 | didFlag) // single-seg + checksum
    if (didFlag == 3) le32(dictId)
    fcsFlag match {
      case 0 => out.write(len)
      case 1 =>
        val v = len - 256
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
      case _ => le32(len.toLong)
    }
    if (len == 0) {
      out.write(1); out.write(0); out.write(0) // last raw block, size 0
    } else {
      val ChunkMax = 65536
      var off = base
      var rep1 = rep1Init // repcodes are FRAME-scoped: thread across blocks
      while (off < virt.length) {
        val end = math.min(off + ChunkMax, virt.length)
        val (body, rep1Out) = encodeBlock(virt, off, end, rep1)
        val last = end == virt.length
        val useRaw = body == null || body.length >= end - off
        if (!useRaw) rep1 = rep1Out // raw blocks leave reps untouched
        val (btype, payloadLen) =
          if (useRaw) (0, end - off) else (2, body.length)
        val bh = (if (last) 1 else 0) | (btype << 1) | (payloadLen << 3)
        out.write(bh & 0xff); out.write((bh >> 8) & 0xff)
        out.write((bh >> 16) & 0xff)
        if (useRaw) out.write(virt, off, end - off)
        else out.write(body, 0, body.length)
        off = end
      }
    }
    le32(Xxh64.hash(virt, base, len, 0L) & 0xffffffffL)
    out.toByteArray
  }

  /** One compressed-block body over content[off, end), or null when
    * the shape can't be expressed profitably (caller falls back to a
    * raw block). Matches may reach back across earlier chunks of the
    * same frame (single-segment window). */
  private def encodeBlock(c: Array[Byte], off: Int, end: Int,
      rep1In: Long): (Array[Byte], Long) = {
    // ── greedy LZ over the chunk (hash of 4 bytes, whole-frame window)
    val seqs = new scala.collection.mutable.ArrayBuffer[Seq0](64)
    val litBuf = new java.io.ByteArrayOutputStream(end - off)
    val table = new Array[Int](1 << 15)
    def hash4(p: Int): Int = {
      val v = (c(p) & 0xff) | ((c(p + 1) & 0xff) << 8) |
        ((c(p + 2) & 0xff) << 16) | ((c(p + 3) & 0xff) << 24)
      (v * 0x9e3779b1) >>> 17
    }
    // seed the table with the frame prefix so cross-chunk matches fire
    var p = math.max(0, off - 32768)
    while (p + 4 <= off) { table(hash4(p)) = p + 1; p += 1 }
    var rep1 = rep1In
    var anchor = off
    p = off
    while (p + 4 <= end) {
      val h = hash4(p)
      val cand = table(h) - 1
      table(h) = p + 1
      var ml = 0
      if (cand >= 0 && cand < p &&
        c(cand) == c(p) && c(cand + 1) == c(p + 1) &&
        c(cand + 2) == c(p + 2) && c(cand + 3) == c(p + 3)) {
        ml = 4
        while (p + ml < end && c(cand + ml) == c(p + ml) && ml < 65000) ml += 1
      }
      // predefined OF table tops out at code 28; farther matches
      // aren't expressible against it — treat as literals
      if (ml >= 4 && (p - cand).toLong < (1L << 28)) {
        val ll = p - anchor
        litBuf.write(c, anchor, ll)
        val offset = (p - cand).toLong
        // repcode 1: reusing the live offset with literals in front
        val offValue =
          if (offset == rep1 && ll != 0) 1L
          else { rep1 = offset; offset + 3 }
        seqs += Seq0(ll, ml, offValue)
        // index the matched span so later repeats are found
        var q = p + 1
        val stop = math.min(p + ml, end - 4)
        while (q <= stop) { table(hash4(q)) = q + 1; q += 1 }
        p += ml
        anchor = p
      } else p += 1
    }
    litBuf.write(c, anchor, end - anchor)
    val lits = litBuf.toByteArray
    if (seqs.isEmpty && lits.length < 32) return (null, rep1In) // raw wins

    val body = new java.io.ByteArrayOutputStream(lits.length + 64)
    if (!writeLiterals(body, lits)) return (null, rep1In)
    writeSequences(body, seqs.toSeq)
    (body.toByteArray, rep1)
  }

  /** Literals section: RLE when constant, Huffman (direct weights,
    * 1- or 4-stream) when legal, raw otherwise. Returns false only
    * when even raw can't express it (never at chunk sizes). */
  private def writeLiterals(out: java.io.ByteArrayOutputStream,
      lits: Array[Byte]): Boolean = {
    val rs = lits.length
    def rawHeader(tpe: Int): Unit = {
      if (rs <= 31) out.write(tpe | (rs << 3))
      else if (rs <= 4095) {
        out.write(tpe | (1 << 2) | ((rs & 15) << 4)); out.write(rs >> 4)
      } else {
        out.write(tpe | (3 << 2) | ((rs & 15) << 4))
        out.write((rs >> 4) & 0xff); out.write(rs >> 12)
      }
    }
    if (rs == 0) { rawHeader(0); return true }
    val hist = new Array[Int](256)
    lits.foreach(b => hist(b & 0xff) += 1)
    val distinct = hist.count(_ > 0)
    if (distinct == 1) { rawHeader(1); out.write(lits(0)); return true }
    val huf = buildHufEncoder(hist)
    val encoded = huf.map(h => hufEncodeStreams(h, lits))
    encoded match {
      case Some((desc, streams, fourStream)) =>
        val cs = desc.length + streams.length
        if (!fourStream && rs <= 1023 && cs <= 1023) {
          // SF0, 1 stream, 3-byte header
          out.write(2 | ((rs & 15) << 4))
          out.write((rs >> 4) | ((cs & 3) << 6))
          out.write(cs >> 2)
        } else if (fourStream) {
          // SF3, 4 streams, 5-byte header (18-bit sizes fit anything)
          out.write(2 | (3 << 2) | ((rs & 15) << 4))
          out.write((rs >> 4) & 0xff)
          out.write(((rs >> 12) & 0x3f) | ((cs & 3) << 6))
          out.write((cs >> 2) & 0xff)
          out.write(cs >> 10)
        } else { rawHeader(0); out.write(lits, 0, rs); return true }
        out.write(desc, 0, desc.length)
        out.write(streams, 0, streams.length)
      case None =>
        rawHeader(0); out.write(lits, 0, rs)
    }
    true
  }

  /** Huffman encoder state: per-symbol (code, length) plus the
    * serialized direct-weight tree description. None when the
    * alphabet can't use direct weights (maxSymbol ≥ 128) or depths
    * exceed the format's 11-bit ceiling. */
  private final case class HufEnc(code: Array[Int], len: Array[Int],
    desc: Array[Byte])

  private def buildHufEncoder(hist: Array[Int]): Option[HufEnc] = {
    val maxSym = 255 - hist.reverseIterator.takeWhile(_ == 0).length
    if (maxSym >= 128) return None // direct weights cap; raw fallback
    // plain heap Huffman over present symbols
    case class Node(freq: Long, sym: Int, l: Node, r: Node)
    val ord = Ordering.by[Node, (Long, Int)](n => (n.freq, n.sym))
    val pq = new scala.collection.mutable.PriorityQueue[Node]()(ord.reverse)
    for (s <- 0 to maxSym if hist(s) > 0) pq.enqueue(Node(hist(s), s, null, null))
    if (pq.size < 2) return None
    while (pq.size > 1) {
      val a = pq.dequeue(); val b = pq.dequeue()
      pq.enqueue(Node(a.freq + b.freq, math.min(a.sym, b.sym), a, b))
    }
    val len = new Array[Int](maxSym + 1)
    var maxLen = 0
    def walk(n: Node, d: Int): Unit =
      if (n.l == null) { len(n.sym) = math.max(d, 1); maxLen = math.max(maxLen, math.max(d, 1)) }
      else { walk(n.l, d + 1); walk(n.r, d + 1) }
    walk(pq.dequeue(), 0)
    if (maxLen > 11) return None // format ceiling; raw fallback
    // weights w = maxLen + 1 - len; zero for absent symbols
    val weights = Array.tabulate(maxSym + 1)(s =>
      if (len(s) == 0) 0 else maxLen + 1 - len(s))
    // canonical code values from the decoder's (weight asc, symbol
    // asc) table layout: code = startIndex >> (tableLog - len)
    val code = new Array[Int](maxSym + 1)
    var u = 0
    for (w <- 1 to maxLen; s <- 0 to maxSym if weights(s) == w) {
      code(s) = u >> (maxLen - len(s))
      u += 1 << (w - 1)
    }
    if (u != (1 << maxLen)) return None // incomplete code (can't happen)
    // direct description: weights for symbols 0..maxSym-1, last implied
    val desc = new java.io.ByteArrayOutputStream(1 + maxSym / 2)
    desc.write(127 + maxSym)
    var i = 0
    while (i < maxSym) {
      val hi = weights(i)
      val lo = if (i + 1 < maxSym) weights(i + 1) else 0
      desc.write((hi << 4) | lo)
      i += 2
    }
    Some(HufEnc(code, len, desc.toByteArray))
  }

  /** Encode the literal stream(s); returns (treeDesc, streamBytes,
    * fourStream). Symbols are written in reverse (backward-read
    * streams). */
  private def hufEncodeStreams(h: HufEnc, lits: Array[Byte])
      : (Array[Byte], Array[Byte], Boolean) = {
    def one(from: Int, until: Int): Array[Byte] = {
      val bw = new FwdBitW
      var i = until - 1
      while (i >= from) {
        val s = lits(i) & 0xff
        bw.bits(h.code(s), h.len(s))
        i -= 1
      }
      bw.close()
    }
    val rs = lits.length
    if (rs <= 1023) (h.desc, one(0, rs), false)
    else {
      val per = (rs + 3) / 4
      val s1 = one(0, per)
      val s2 = one(per, 2 * per)
      val s3 = one(2 * per, 3 * per)
      val s4 = one(3 * per, rs)
      val outB = new java.io.ByteArrayOutputStream(
        6 + s1.length + s2.length + s3.length + s4.length)
      def le16(v: Int): Unit = { outB.write(v & 0xff); outB.write(v >> 8) }
      le16(s1.length); le16(s2.length); le16(s3.length)
      outB.write(s1, 0, s1.length); outB.write(s2, 0, s2.length)
      outB.write(s3, 0, s3.length); outB.write(s4, 0, s4.length)
      (h.desc, outB.toByteArray, true)
    }
  }

  /** Sequences section: count, modes byte (all predefined), and the
    * backward-convention bitstream — written forward in exact
    * reverse of the decoder's read order (extras ll/ml/of per
    * sequence descending, transition updates of/ml/ll, init states
    * ml/of/ll last). */
  private def writeSequences(out: java.io.ByteArrayOutputStream,
      seqs: Seq[Seq0]): Unit = {
    val n = seqs.length
    if (n < 128) out.write(n)
    else if (n < 0x7f00) { out.write((n >> 8) + 128); out.write(n & 0xff) }
    else { out.write(255); out.write((n - 0x7f00) & 0xff)
      out.write((n - 0x7f00) >> 8) }
    if (n == 0) return
    out.write(0) // modes: all predefined
    val bw = new FwdBitW
    def ofCodeOf(v: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(v)
    // final states: any cell carrying the last sequence's symbols
    var sLl = LlInv(llCodeOf(seqs(n - 1).ll))(0)
    var sOf = OfInv(ofCodeOf(seqs(n - 1).offValue))(0)
    var sMl = MlInv(mlCodeOf(seqs(n - 1).ml))(0)
    var i = n - 1
    while (i >= 0) {
      val s = seqs(i)
      val llC = llCodeOf(s.ll); val mlC = mlCodeOf(s.ml)
      val ofC = ofCodeOf(s.offValue)
      bw.bits(s.ll - LlBase(llC), LlBits(llC))
      bw.bits(s.ml - MlBase(mlC), MlBits(mlC))
      bw.bits(s.offValue - (1L << ofC), ofC)
      if (i > 0) {
        val prev = seqs(i - 1)
        def step(inv: Array[Array[Int]], t: FseTable, sym: Int,
            cur: Int): Int = {
          val cell = inv(sym)(cur)
          bw.bits(cur - t.baseline(cell), t.nbBits(cell))
          cell
        }
        // update write order: OF, ML, LL (reads reverse to LL, ML, OF)
        sOf = step(OfInv, OfPredef, ofCodeOf(prev.offValue), sOf)
        sMl = step(MlInv, MlPredef, mlCodeOf(prev.ml), sMl)
        sLl = step(LlInv, LlPredef, llCodeOf(prev.ll), sLl)
      }
      i -= 1
    }
    // init writes: ML, OF, LL (reads reverse to LL, OF, ML)
    bw.bits(sMl, MlPredef.accuracyLog)
    bw.bits(sOf, OfPredef.accuracyLog)
    bw.bits(sLl, LlPredef.accuracyLog)
    val stream = bw.close()
    out.write(stream, 0, stream.length)
  }

  private def decode0(b: Array[Byte], maxLen: Int,
      dicts: Map[Long, Dict]): Array[Byte] = {
    if (b.length == 0) throw new Malformed // zero frames ≠ empty payload
    val out = new Out(maxLen)
    var p = 0
    while (p < b.length) {
      if (p + 4 > b.length) throw new Malformed
      val magic = u32(b, p)
      if ((magic & 0xfffffff0L) == 0x184d2a50L) { // skippable frame
        val size = u32(b, p + 4)
        if (size > Int.MaxValue - 8 || p + 8 + size > b.length)
          throw new Malformed
        p += 8 + size.toInt
      } else if (magic == 0xfd2fb528L) {
        p = decodeFrame(b, p + 4, out, maxLen, dicts)
      } else throw new Malformed
    }
    out.toArray
  }

  private def decodeFrame(b: Array[Byte], p0: Int, out: Out,
      maxLen: Int, dicts: Map[Long, Dict]): Int = {
    var p = p0
    val fhd = u8(b, p); p += 1
    val fcsFlag = (fhd >> 6) & 3
    val singleSeg = ((fhd >> 5) & 1) == 1
    if (((fhd >> 3) & 1) != 0) throw new Malformed // reserved bit
    val hasChecksum = ((fhd >> 2) & 1) == 1
    val didFlag = fhd & 3
    var window = 0L
    if (!singleSeg) {
      val wd = u8(b, p); p += 1
      val base = 1L << (10 + (wd >>> 3))
      window = base + (base >>> 3) * (wd & 7)
    }
    val didBytes = didFlag match {
      case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
    }
    var did = 0L
    var i = 0
    while (i < didBytes) { did |= u8(b, p).toLong << (8 * i); p += 1; i += 1 }
    // dictionary resolution: an unresolvable ID declines (decode-or-
    // reject totality — never guess a dictionary)
    val dict: Dict =
      if (did == 0) null
      else dicts.getOrElse(did, throw new Malformed)
    val fcsBytes = fcsFlag match {
      case 0 => if (singleSeg) 1 else 0
      case 1 => 2; case 2 => 4; case _ => 8
    }
    var fcs = -1L
    if (fcsBytes > 0) {
      fcs = 0
      i = 0
      while (i < fcsBytes) { fcs |= u8(b, p).toLong << (8 * i); p += 1; i += 1 }
      if (fcsBytes == 2) fcs += 256
    }
    if (singleSeg) window = fcs
    if (window > MaxWindow) throw new Malformed
    if (fcs >= 0 && fcs > maxLen) throw new Malformed

    // Block_Maximum_Size = min(Window_Size, 128 KB) — RFC 8878 §3.1.1:
    // raw/RLE block sizes ARE regenerated sizes and compressed blocks
    // may not regenerate past it either (ADVICE r15: the decoder
    // previously accepted some nonconforming streams the reference
    // rejects; memory was already bounded by the maxLen guard)
    val blockMax =
      math.min(if (window > 0) window else 1L << 17, 1L << 17).toInt
    val st = new FrameState
    if (dict != null) {
      // the dictionary seeds Treeless/Repeat entropy modes and the
      // initial recent offsets (RFC 8878 §5)
      st.huf = dict.huf
      st.llT = dict.llT; st.ofT = dict.ofT; st.mlT = dict.mlT
      st.reps(0) = dict.reps(0); st.reps(1) = dict.reps(1)
      st.reps(2) = dict.reps(2)
    }
    val dictContent = if (dict != null) dict.content else null
    val frameStart = out.n
    var last = false
    while (!last) {
      val bh = u24(b, p); p += 3
      last = (bh & 1) == 1
      val btype = (bh >> 1) & 3
      val bsize = bh >>> 3
      btype match {
        case 0 =>
          if (bsize > blockMax) throw new Malformed
          out.append(b, p, bsize); p += bsize
        case 1 =>
          if (bsize > blockMax) throw new Malformed
          out.fill(b(p), bsize); p += 1
        case 2 =>
          if (bsize > (1 << 17) || p + bsize > b.length)
            throw new Malformed
          val before = out.n
          decodeBlock(b, p, p + bsize, out, st, frameStart,
            if (window > 0) window else Long.MaxValue, dictContent)
          if (out.n - before > blockMax) throw new Malformed
          p += bsize
        case _ => throw new Malformed
      }
    }
    if (fcs >= 0 && (out.n - frameStart).toLong != fcs) throw new Malformed
    if (hasChecksum) {
      val want = u32(b, p); p += 4
      val got = Xxh64.hash(out.buf, frameStart, out.n - frameStart, 0L) &
        0xffffffffL
      if (got != want) throw new Malformed
    }
    p
  }

  private def decodeBlock(b: Array[Byte], p0: Int, end: Int, out: Out,
      st: FrameState, frameStart: Int, window: Long,
      dictContent: Array[Byte]): Unit = {
    var p = p0
    // ── literals section ──
    val h0 = u8(b, p)
    val litType = h0 & 3
    val sizeFormat = (h0 >> 2) & 3
    var lits: Array[Byte] = null
    var litOff = 0
    var litLen = 0
    if (litType <= 1) { // Raw / RLE
      val rs =
        if ((sizeFormat & 1) == 0) { p += 1; h0 >>> 3 }
        else if (sizeFormat == 1) { val v = (h0 >>> 4) | (u8(b, p + 1) << 4); p += 2; v }
        else { val v = (h0 >>> 4) | (u8(b, p + 1) << 4) | (u8(b, p + 2) << 12); p += 3; v }
      if (litType == 0) {
        if (p + rs > end) throw new Malformed
        lits = b; litOff = p; litLen = rs; p += rs
      } else {
        lits = new Array[Byte](rs)
        java.util.Arrays.fill(lits, b(p)); p += 1; litLen = rs
      }
    } else { // Compressed / Treeless
      var rs = 0; var cs = 0; var streams = 4
      sizeFormat match {
        case 0 =>
          streams = 1
          rs = (h0 >>> 4) | ((u8(b, p + 1) & 0x3f) << 4)
          cs = (u8(b, p + 1) >>> 6) | (u8(b, p + 2) << 2)
          p += 3
        case 1 =>
          rs = (h0 >>> 4) | ((u8(b, p + 1) & 0x3f) << 4)
          cs = (u8(b, p + 1) >>> 6) | (u8(b, p + 2) << 2)
          p += 3
        case 2 =>
          rs = (h0 >>> 4) | (u8(b, p + 1) << 4) | ((u8(b, p + 2) & 3) << 12)
          cs = (u8(b, p + 2) >>> 2) | (u8(b, p + 3) << 6)
          p += 4
        case _ =>
          rs = (h0 >>> 4) | (u8(b, p + 1) << 4) | ((u8(b, p + 2) & 0x3f) << 12)
          cs = (u8(b, p + 2) >>> 6) | (u8(b, p + 3) << 2) | (u8(b, p + 4) << 10)
          p += 5
      }
      if (rs > (1 << 17) + 8) throw new Malformed
      var streamsP = p
      var streamsLen = cs
      if (litType == 2) {
        val (table, consumed) = readHufDesc(b, p, end)
        st.huf = table
        streamsP = p + consumed
        streamsLen = cs - consumed
        if (streamsLen < 0) throw new Malformed
      } else if (st.huf == null) throw new Malformed // treeless, no table
      p += cs
      if (streamsP + streamsLen > end) throw new Malformed
      lits = new Array[Byte](rs); litLen = rs
      if (streams == 1) {
        hufStream(st.huf, b, streamsP, streamsP + streamsLen, lits, 0, rs)
      } else {
        if (streamsLen < 6) throw new Malformed
        val s1 = u16(b, streamsP)
        val s2 = u16(b, streamsP + 2)
        val s3 = u16(b, streamsP + 4)
        val q = streamsP + 6
        val s4 = streamsLen - 6 - s1 - s2 - s3
        if (s4 < 0) throw new Malformed
        val per = (rs + 3) / 4
        val rest = rs - 3 * per
        if (rest < 0) throw new Malformed
        hufStream(st.huf, b, q, q + s1, lits, 0, per)
        hufStream(st.huf, b, q + s1, q + s1 + s2, lits, per, per)
        hufStream(st.huf, b, q + s1 + s2, q + s1 + s2 + s3, lits, 2 * per, per)
        hufStream(st.huf, b, q + s1 + s2 + s3, streamsP + streamsLen,
          lits, 3 * per, rest)
      }
      litOff = 0
    }

    // ── sequences section ──
    if (p >= end) throw new Malformed
    val s0 = u8(b, p); p += 1
    val nbSeq =
      if (s0 == 0) 0
      else if (s0 < 128) s0
      else if (s0 < 255) { val v = ((s0 - 128) << 8) + u8(b, p); p += 1; v }
      else { val v = u8(b, p) + (u8(b, p + 1) << 8) + 0x7f00; p += 2; v }
    if (nbSeq == 0) {
      if (p != end) throw new Malformed
      out.append(lits, litOff, litLen)
      return
    }
    val modes = u8(b, p); p += 1
    if ((modes & 3) != 0) throw new Malformed // reserved
    def pickTable(mode: Int, predef: => FseTable, prev: FseTable,
        maxSymbol: Int, maxLog: Int): FseTable = mode match {
      case 0 => predef
      case 1 =>
        val sym = u8(b, p); p += 1
        if (sym > maxSymbol) throw new Malformed
        rleFse(sym)
      case 2 =>
        val (counts, al, n) = readNCount(b, p, end, maxSymbol, maxLog)
        p += n
        buildFse(counts, al)
      case _ =>
        if (prev == null) throw new Malformed
        prev
    }
    // table order in the stream: LL, OF, ML
    val llT = pickTable((modes >> 6) & 3, LlPredef, st.llT, 35, 9)
    val ofT = pickTable((modes >> 4) & 3, OfPredef, st.ofT, 31, 8)
    val mlT = pickTable((modes >> 2) & 3, MlPredef, st.mlT, 52, 9)
    st.llT = llT; st.ofT = ofT; st.mlT = mlT

    val br = new BackBits(b, p, end)
    // state init order: LL, OF, ML
    var llS = br.read(llT.accuracyLog)
    var ofS = br.read(ofT.accuracyLog)
    var mlS = br.read(mlT.accuracyLog)
    var litP = litOff
    var litRemaining = litLen
    var i = 0
    while (i < nbSeq) {
      val ofCode = ofT.symbol(ofS)
      val mlCode = mlT.symbol(mlS)
      val llCode = llT.symbol(llS)
      if (ofCode > 31 || mlCode > 52 || llCode > 35) throw new Malformed
      // extra-bit read order: OF, ML, LL
      val offValue = (1L << ofCode) + (if (ofCode > 0) {
        var v = 0L; var k = ofCode
        while (k > 24) { v = (v << 24) | br.read(24); k -= 24 }
        (v << k) | br.read(k)
      } else 0L)
      val ml = MlBase(mlCode) + br.read(MlBits(mlCode))
      val ll = LlBase(llCode) + br.read(LlBits(llCode))
      if (br.bitsLeft < 0) throw new Malformed
      // repeat-offset resolution (RFC 8878 §3.1.1.5)
      val reps = st.reps
      val offset: Long =
        if (offValue > 3) {
          val o = offValue - 3
          reps(2) = reps(1); reps(1) = reps(0); reps(0) = o
          o
        } else {
          val idx = if (ll != 0) offValue.toInt - 1 else offValue.toInt
          if (idx == 0) reps(0)
          else if (idx <= 2) {
            val o = reps(idx)
            if (idx == 2) reps(2) = reps(1)
            reps(1) = reps(0); reps(0) = o
            o
          } else { // ll == 0, offValue == 3: rep1 - 1
            val o = reps(0) - 1
            if (o <= 0) throw new Malformed
            reps(2) = reps(1); reps(1) = reps(0); reps(0) = o
            o
          }
        }
      if (ll > litRemaining) throw new Malformed
      out.append(lits, litP, ll)
      litP += ll; litRemaining -= ll
      out.copyMatch(offset, ml, frameStart, window, dictContent)
      i += 1
      if (i < nbSeq) {
        // state update order: LL, ML, OF
        llS = llT.baseline(llS) + br.read(llT.nbBits(llS))
        mlS = mlT.baseline(mlS) + br.read(mlT.nbBits(mlS))
        ofS = ofT.baseline(ofS) + br.read(ofT.nbBits(ofS))
        if (br.bitsLeft < 0) throw new Malformed
      }
    }
    if (br.bitsLeft != 0) throw new Malformed // exact consumption
    out.append(lits, litP, litRemaining)
  }
}

/** XXH64 (the xxHash 64-bit variant zstd's content checksum uses;
  * public algorithm, Yann Collet). */
private[text] object Xxh64 {
  private val P1 = 0x9e3779b185ebca87L
  private val P2 = 0xc2b2ae3d27d4eb4fL
  private val P3 = 0x165667b19e3779f9L
  private val P4 = 0x85ebca77c2b2ae63L
  private val P5 = 0x27d4eb2f165667c5L

  def hash(b: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    def u64(p: Int): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    def u32le(p: Int): Long = {
      var v = 0L; var i = 0
      while (i < 4) { v |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))
    def round(acc: Long, lane: Long): Long = rotl(acc + lane * P2, 31) * P1
    var p = off
    val end = off + len
    var h =
      if (len >= 32) {
        var a1 = seed + P1 + P2
        var a2 = seed + P2
        var a3 = seed
        var a4 = seed - P1
        while (p + 32 <= end) {
          a1 = round(a1, u64(p)); a2 = round(a2, u64(p + 8))
          a3 = round(a3, u64(p + 16)); a4 = round(a4, u64(p + 24))
          p += 32
        }
        var x = rotl(a1, 1) + rotl(a2, 7) + rotl(a3, 12) + rotl(a4, 18)
        x = (x ^ round(0, a1)) * P1 + P4
        x = (x ^ round(0, a2)) * P1 + P4
        x = (x ^ round(0, a3)) * P1 + P4
        x = (x ^ round(0, a4)) * P1 + P4
        x
      } else seed + P5
    h += len
    while (p + 8 <= end) {
      h = rotl(h ^ round(0, u64(p)), 27) * P1 + P4
      p += 8
    }
    if (p + 4 <= end) {
      h = rotl(h ^ (u32le(p) * P1), 23) * P2 + P3
      p += 4
    }
    while (p < end) {
      h = rotl(h ^ ((b(p) & 0xffL) * P5), 11) * P1
      p += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }
}
