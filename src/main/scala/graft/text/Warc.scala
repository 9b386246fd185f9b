package graft.text

/** WARC (Web ARChive, ISO 28500) record ingest — the container web
  * crawls actually ship in: CommonCrawl distributes `.warc.gz` files
  * holding one gzip member PER RECORD, each record a version line
  * (`WARC/1.0`), `Name: value` headers, an empty line, then
  * `Content-Length` octets of block, then CRLF CRLF. Response
  * records carry an HTTP message whose payload starts after the HTTP
  * header's empty line.
  *
  * Scope:
  *  - [[records]]: parse a concatenated stream of records from plain
  *    WARC bytes OR per-record-gzip bytes (sniffed by the 1f 8b
  *    magic; the JDK's GZIPInputStream already concatenates members,
  *    so the gzip path is decode-then-parse);
  *  - header parsing: case-insensitive names, the version line,
  *    Content-Length-driven block extraction (no guessing), strict
  *    CRLF CRLF record terminators;
  *  - [[httpPayload]]: split an HTTP message block at the first
  *    CRLF CRLF — the response-body extraction step between "crawl
  *    record" and "document text";
  *  - totality: None on malformed version lines, non-numeric or
  *    out-of-range lengths, truncation anywhere (WarcSpec fuzzes).
  *
  * Scale posture: map-only over a binary column (one WARC slice per
  * row — the WET/WARC-slice shape upstream splitters emit), bounded
  * by [[CompressedIngest.MaxBytes]] through the gzip path. */
object Warc {

  /** One record. `headers` is last-wins per (lowercased) name — the
    * repeatable fields ISO 28500 allows (WARC-Concurrent-To) collapse;
    * none of this module's consumers read them, and the full-fidelity
    * form would be Map[String, Seq[String]] when one does. */
  final case class Record(headers: Map[String, String], block: Array[Byte]) {
    def warcType: String = headers.getOrElse("warc-type", "")
    def targetUri: String = headers.getOrElse("warc-target-uri", "")
  }

  /** Parse all records; gzip-sniffing. None on any malformed record. */
  def records(b: Array[Byte]): Option[Seq[Record]] = {
    val plain =
      if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b)
        CompressedIngest.gunzip(b) match {
          case Some(x) => x
          case None => return None
        }
      else b
    parse(plain)
  }

  private def parse(b: Array[Byte]): Option[Seq[Record]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Record]
    var p = 0
    while (p < b.length) {
      // version line
      val vEnd = lineEnd(b, p)
      if (vEnd < 0) return None
      val version = ascii(b, p, vEnd)
      if (!version.startsWith("WARC/")) return None
      p = vEnd + 2
      // headers until the empty line; values are UTF-8 per ISO 28500
      // (URIs may carry non-ASCII); folded continuation lines
      // (leading SP/HT) extend the previous value
      val hdrs = scala.collection.mutable.Map.empty[String, String]
      var lastName: String = null
      var done = false
      while (!done) {
        val e = lineEnd(b, p)
        if (e < 0) return None
        if (e == p) { done = true; p += 2 }
        else {
          val line = utf8(b, p, e)
          if (line.head == ' ' || line.head == '\t') {
            if (lastName == null) return None
            hdrs(lastName) = hdrs(lastName) + " " + line.trim
          } else {
            val c = line.indexOf(':')
            if (c <= 0) return None
            lastName = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
            hdrs(lastName) = line.substring(c + 1).trim
          }
          p = e + 2
        }
      }
      val len = hdrs.get("content-length") match {
        case Some(v) if v.nonEmpty && v.forall(_.isDigit) &&
          v.length <= 10 => v.toLong
        case _ => return None
      }
      if (len > Int.MaxValue - 8 || p + len + 4 > b.length) return None
      val block = java.util.Arrays.copyOfRange(b, p, p + len.toInt)
      p += len.toInt
      // the record terminator: CRLF CRLF
      if (b(p) != '\r' || b(p + 1) != '\n' || b(p + 2) != '\r' ||
        b(p + 3) != '\n') return None
      p += 4
      out += Record(hdrs.toMap, block)
    }
    if (out.isEmpty) None else Some(out.toSeq)
  }

  /** One HTTP header value from a response record's block (case-
    * insensitive name, first occurrence), without touching the
    * payload — the Content-Type lookup charset resolution needs.
    * None when the block is not an HTTP message or the header is
    * absent. */
  def httpHeader(block: Array[Byte], name: String): Option[String] = {
    if (block.length < 5 || !ascii(block, 0, 5).startsWith("HTTP/")) return None
    var p = lineEnd(block, 0)
    if (p < 0) return None
    p += 2
    while (p < block.length) {
      val e = lineEnd(block, p)
      if (e < 0 || e == p) return None // payload separator / truncation
      val line = utf8(block, p, e)
      val c = line.indexOf(':')
      if (c > 0 && line.substring(0, c).trim.equalsIgnoreCase(name))
        return Some(line.substring(c + 1).trim)
      p = e + 2
    }
    None
  }

  /** The HTTP payload of a response record's block: the bytes after
    * the first CRLF CRLF (the HTTP header separator); None when the
    * block is not an HTTP message. */
  def httpPayload(block: Array[Byte]): Option[Array[Byte]] = {
    if (block.length < 4 || !ascii(block, 0,
      math.min(block.length, 5)).startsWith("HTTP/")) return None
    var i = 0
    while (i + 3 < block.length) {
      if (block(i) == '\r' && block(i + 1) == '\n' &&
        block(i + 2) == '\r' && block(i + 3) == '\n')
        return Some(java.util.Arrays.copyOfRange(block, i + 4, block.length))
      i += 1
    }
    None
  }

  /** RFC 9112 §7.1 chunked transfer decoding — the crawl chain's
    * first real-crawl stumbling block (r16 verdict #1): wget-produced
    * WARCs and a real fraction of CommonCrawl response records store
    * the body AS TRANSMITTED, chunk-size lines and all; without
    * de-chunking, Content-Encoding decode sees `1a3\r\n…` interleaved
    * with the payload and the record silently drops.
    *
    * Grammar implemented exactly: `chunk-size [;chunk-ext] CRLF
    * chunk-data CRLF` repeated, `0 [;chunk-ext] CRLF`, then an
    * optional trailer section (`field-line CRLF` each) closed by a
    * final CRLF. Chunk extensions and trailer fields are consumed
    * and ignored (the spec permits both). STRICT None on truncation,
    * a non-hex size line, a missing chunk-data CRLF, or a missing
    * trailer terminator — a partial body must not silently pass as
    * whole. Total output is bomb-guarded at `maxLen`. */
  def dechunk(b: Array[Byte],
      maxLen: Int = CompressedIngest.MaxBytes): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(math.min(b.length, 1 << 16))
    var p = 0
    while (true) {
      val e = lineEnd(b, p)
      if (e < 0) return None
      val line = ascii(b, p, e)
      val semi = line.indexOf(';')
      val rawSize = (if (semi >= 0) line.substring(0, semi) else line).trim
      // chunk-size = 1*HEXDIG — leading zeros are valid ("0000001a"),
      // so strip them BEFORE the overflow cap (keeping one '0' so the
      // all-zero last-chunk line survives); the 7-digit cap then
      // bounds the true magnitude, not the padded spelling.
      val sizeStr = {
        val s = rawSize.dropWhile(_ == '0')
        if (s.isEmpty && rawSize.nonEmpty) "0" else s
      }
      if (rawSize.isEmpty || sizeStr.length > 7 ||
        !sizeStr.forall(c => (c >= '0' && c <= '9') ||
          (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))) return None
      val size = java.lang.Integer.parseInt(sizeStr, 16)
      p = e + 2
      if (size == 0) {
        // trailer section: field lines until the closing empty line
        var done = false
        while (!done) {
          val t = lineEnd(b, p)
          if (t < 0) return None
          if (t == p) { done = true } else p = t + 2
        }
        // trailing garbage after the terminator is a framing error
        if (p + 2 != b.length) return None
        return Some(out.toByteArray)
      }
      if (out.size() + size > maxLen) return None // bomb guard
      if (p + size + 2 > b.length) return None // truncated chunk-data
      out.write(b, p, size)
      p += size
      if (b(p) != '\r' || b(p + 1) != '\n') return None
      p += 2
    }
    None // unreachable
  }

  /** Apply a `Transfer-Encoding` header value (RFC 9112 §6.1): the
    * listed codings were applied in order by the sender, so the
    * recipient reverses them — `gzip, chunked` means de-chunk FIRST,
    * then gunzip. `chunked`/`identity` and the compression codings
    * gzip/x-gzip/deflate map to their decoders; an unknown coding
    * declines — never guess past an explicit label. */
  def transferDecode(te: String, b: Array[Byte],
      maxLen: Int = CompressedIngest.MaxBytes): Option[Array[Byte]] = {
    val codings = te.split(',').map(
      _.trim.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)
    codings.reverseIterator.foldLeft(Option(b)) { (acc, coding) =>
      acc.flatMap { bytes =>
        coding match {
          case "chunked" => dechunk(bytes, maxLen)
          case "identity" => Some(bytes)
          case "gzip" | "x-gzip" => CompressedIngest.gunzip(bytes, maxLen)
          case "deflate" => CompressedIngest.inflate(bytes, maxLen)
          case _ => None
        }
      }
    }
  }

  /** The chunked serialization of `body` for fixtures and the
    * dechunk≡identity spec: fixed-size chunks, a chunk extension on
    * the first chunk and a trailer field after the last — the
    * optional grammar the decoder must consume and ignore. */
  def chunked(body: Array[Byte], chunkSize: Int): Array[Byte] = {
    require(chunkSize > 0)
    val out = new java.io.ByteArrayOutputStream(body.length + 64)
    def put(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII), 0,
        s.length)
    var p = 0
    var first = true
    while (p < body.length) {
      val len = math.min(chunkSize, body.length - p)
      put(java.lang.Integer.toHexString(len) +
        (if (first) ";graft=ext" else "") + "\r\n")
      out.write(body, p, len)
      put("\r\n")
      p += len
      first = false
    }
    put("0\r\nX-Graft-Trailer: done\r\n\r\n")
    out.toByteArray
  }

  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      if (b(i) == '\n') return -1 // bare LF: malformed per ISO 28500
      i += 1
    }
    -1
  }
  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.US_ASCII)
  private def utf8(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.UTF_8)

  // ── shard → slice splitting (gzip member boundaries) ─────────────

  /** Split a multi-member `.warc.gz` SHARD into per-member slices by
    * RFC 1952 member boundaries — the random-access property the
    * CommonCrawl per-record-gzip convention exists for, and the
    * missing link (r15 verdict #2b) between "a real ~1 GB crawl file"
    * and the one-slice-per-row posture everything downstream assumes.
    *
    * Returns (offset, length) views into the compressed shard, one
    * per member. Bounded memory: each member's deflate stream is
    * inflated through a fixed 8 KiB buffer purely to locate its end
    * and verify its CRC32 + ISIZE trailer — output bytes are counted
    * into the checksum and DISCARDED, never buffered, so the peak
    * footprint is the buffer regardless of member size. STRICT:
    * trailing garbage, a truncated final member, a bad trailer, or
    * reserved FLG bits → None — a partial shard must not silently
    * pass as whole (callers that want salvage cut the shard first).
    *
    * WarcSplitSpec proves shard-parse ≡ concatenated per-slice parse
    * on multi-member fixtures and totality under truncation at every
    * prefix. */
  def memberBounds(b: Array[Byte]): Option[Seq[(Int, Int)]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var p = 0
    while (p < b.length) {
      val start = p
      // RFC 1952 member header
      if (p + 10 > b.length || (b(p) & 0xff) != 0x1f ||
        (b(p + 1) & 0xff) != 0x8b || (b(p + 2) & 0xff) != 8) return None
      val flg = b(p + 3) & 0xff
      if ((flg & 0xe0) != 0) return None // reserved bits
      p += 10
      if ((flg & 4) != 0) { // FEXTRA
        if (p + 2 > b.length) return None
        val xlen = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
        p += 2 + xlen
        if (p > b.length) return None
      }
      if ((flg & 8) != 0) { // FNAME, zero-terminated
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) return None
        p += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) return None
        p += 1
      }
      if ((flg & 2) != 0) { // FHCRC
        p += 2
        if (p > b.length) return None
      }
      // deflate body: inflate-and-discard to find the member end
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(b, p, b.length - p)
        val crc = new java.util.zip.CRC32
        val buf = new Array[Byte](8192)
        var size = 0L
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException => return None }
          if (n == 0 && !inf.finished() && inf.needsInput())
            return None // truncated deflate stream
          crc.update(buf, 0, n)
          size += n
        }
        p += inf.getBytesRead.toInt
        // trailer: CRC32 + ISIZE, both LE
        if (p + 8 > b.length) return None
        def le32(q: Int): Long =
          (b(q) & 0xffL) | ((b(q + 1) & 0xffL) << 8) |
            ((b(q + 2) & 0xffL) << 16) | ((b(q + 3) & 0xffL) << 24)
        if (le32(p) != crc.getValue || le32(p + 4) != (size & 0xffffffffL))
          return None
        p += 8
      } finally inf.end() // release native zlib state
      out += ((start, p - start))
    }
    if (out.isEmpty) None else Some(out.toSeq)
  }

  /** [[memberBounds]] materialized: the per-member compressed slices
    * themselves — each independently decodable by [[records]]. */
  def memberSlices(b: Array[Byte]): Option[Seq[Array[Byte]]] =
    memberBounds(b).map(_.map { case (off, len) =>
      java.util.Arrays.copyOfRange(b, off, off + len)
    })

  // ── fixture writer (the CommonCrawl per-record-gzip shape) ───────

  /** Serialize records; `gzipPerRecord` emits one gzip member per
    * record — the CommonCrawl convention whose member boundaries
    * allow random access into a shard. */
  def write(recs: Seq[(Seq[(String, String)], Array[Byte])],
      gzipPerRecord: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    recs.foreach { case (hdrs, block) =>
      val r = new java.io.ByteArrayOutputStream(block.length + 256)
      def line(s: String): Unit = {
        // header lines are UTF-8 per ISO 28500 (URIs may be non-ASCII)
        r.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        r.write('\r'); r.write('\n')
      }
      line("WARC/1.0")
      hdrs.foreach { case (k, v) => line(s"$k: $v") }
      line(s"Content-Length: ${block.length}")
      line("")
      r.write(block, 0, block.length)
      line(""); line("")
      val bytes = r.toByteArray
      if (gzipPerRecord) {
        val gz = CompressedIngest.gzip(bytes)
        out.write(gz, 0, gz.length)
      } else out.write(bytes, 0, bytes.length)
    }
    out.toByteArray
  }
}
