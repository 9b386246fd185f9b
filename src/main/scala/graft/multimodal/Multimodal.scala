package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-local
  * batches — the Spark-side shape a training-data pipeline needs
  * (schema, partitioning, batch signature) with the codec itself
  * STUBBED (no media libraries in this environment).
  *
  * ══════════════════ STUB BOUNDARY ══════════════════
  * Header formats whose metadata is stored UNCOMPRESSED are decoded
  * FOR REAL in pure JVM: [[decodeHeaders]] sniffs the payload magic
  * and parses BMP dimensions (BITMAPINFO/CORE headers), WAV sample
  * rate / channels / duration (RIFF chunk walk), PNG dimensions
  * (the IHDR chunk — always first, never compressed, big-endian),
  * GIF dimensions (the logical screen descriptor), QOI dimensions
  * (14-byte uncompressed header), JPEG dimensions + EXIF orientation
  * (the SOFn frame header and the APP1/TIFF IFD0 tag, both found by
  * a marker walk — frame geometry and EXIF metadata precede the
  * entropy-coded scan and are never compressed), and MP4/ISO-BMFF
  * dimensions + duration + frame count (the `moov/mvhd`,
  * `moov/trak/tkhd` and `…/stbl/stts` boxes — plain big-endian
  * fields, no codec involved) —
  * MultimodalSpec feeds it real synthesized files and asserts exact
  * values. PIXEL data is decoded FOR REAL where no codec is needed:
  * [[ImageDedup.decodeQoiPixels]] (the full QOI op set — RLE, not a
  * media codec) and [[ImageDedup.decodeBmpPixels]] (uncompressed
  * 24-bit rows) feed a real 8×8 perceptual hash. `decodeStub`
  * remains the deterministic FAKE for exactly one thing:
  * codec-compressed pixel/sample PAYLOADS (PNG IDAT inflate, JPEG
  * entropy-coded scans, MP4 sample data), which genuinely need
  * media libraries this environment does not have. A real deployment
  * replaces ONLY the stub fallback with an actual codec (JNI/FFI,
  * or `mapInPandas` with PIL/torchaudio on PySpark); every other
  * moving part — the media schema, binary column handling,
  * partition-local batched iteration, feature schema — is real
  * and tested.
  * ═══════════════════════════════════════════════════
  *
  * Scale notes: media bytes never leave their scan partition (decode
  * is map-only, no shuffle); batches bound peak memory the way Arrow
  * record batches do for Pandas UDFs; metadata-only queries prune the
  * binary column at the parquet reader (columnar layout keeps payload
  * IO out of the metadata path).
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, media: Array[Byte],
      mime: String, byte_len: Long)
  final case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
      width: Long, height: Long, n_frames: Long, duration_ms: Long,
      orientation: Long)

  /** Synthesize a media table from `documents`: deterministic kinds by
    * doc_id; HALF of each kind's rows carry a REAL decodable payload
    * (QOI / PCM WAV / MP4 moov, [[MediaSynth]]) whose parameters are
    * closed forms of doc_id, the other half carry the raw text bytes
    * (undecodable → the stub fallback) — so every `mm_*` hash gate
    * crosses BOTH the real decoders and the stub in one run. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val mime =
          if (MediaSynth.isReal(id)) (id % 3) match {
            case 0 => "image/qoi"; case 1 => "audio/wav"; case _ => "video/mp4"
          }
          else (id % 3) match {
            case 0 => "image/png"; case 1 => "audio/wav"; case _ => "video/mp4"
          }
        val payload = MediaSynth.payload(id, text)
        // payload size recorded as METADATA at ingest so size rollups
        // never have to touch the binary column ([[mediaMeta]])
        MediaRow(id, kind, payload, mime, payload.length.toLong)
      }
  }

  /** INGEST-TIME METADATA as a declarative frame — (media_id, kind,
    * byte_len) with every value a Catalyst expression (real rows'
    * lengths are [[MediaSynth.realByteLen]]'s closed form; fake rows'
    * the text byte length), so metadata rollups never materialize the
    * payload and column pruning reaches the scan. MultimodalSpec pins
    * equality with [[mediaTable]]'s per-row metadata. */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        expr("element_at(array('image','audio','video'), cast(doc_id % 3 AS int) + 1)").as("kind"),
        // real rows: MediaSynth's ONE shared SQL twin of the closed
        // forms (the DuckDB oracle interpolates the same string)
        expr(s"""CASE WHEN (doc_id DIV 3) % 2 = 0
                 THEN ${MediaSynth.realByteLenSql}
                 ELSE octet_length(text) END""").cast("long").as("byte_len"))

  /** STUB decode (see class doc): features from byte length only, so an
    * arithmetic SQL oracle can verify the full pipeline around it.
    * Orientation is always 0 ("unknown") — the stub cannot have seen
    * an EXIF tag, and faking one would be a lie the oracle then has
    * to co-fake. */
  private[multimodal] def decodeStub(kind: String, bytes: Array[Byte]): (Long, Long, Long, Long, Long) = {
    val n = bytes.length.toLong
    val width = 64L + (n * 7919L) % 1856L
    val height = 64L + (n * 104729L) % 1016L
    val frames = if (kind == "video") 1L + n % 240L else 1L
    val durationMs = kind match {
      case "audio" => n * 8L
      case "video" => frames * 40L
      case _       => 0L
    }
    (width, height, frames, durationMs, 0L)
  }

  /** REAL header decode for the uncompressed formats — content-sniffed
    * (magic bytes), so a payload that IS a BMP or WAV file decodes
    * truthfully whatever its declared mime. Returns the
    * [[MediaFeatures]] tail (width, height, n_frames, duration_ms):
    * BMP → (|width|, |height|, 1, 0) from the BITMAPINFOHEADER (or
    * the 12-byte BITMAPCOREHEADER); GIF87a/89a → (width, height, 1, 0)
    * from the logical screen descriptor (uncompressed little-endian
    * u16 at offsets 6/8); QOI → (width, height, 1, 0) from its
    * 14-byte big-endian header; PNG → (width, height, 1, 0) from
    * the IHDR chunk (the spec pins it as the FIRST chunk after the
    * 8-byte signature, 13 data bytes, big-endian dims — dimensions
    * are header metadata, not part of the compressed IDAT stream);
    * WAV → (0, 0, 1, data_bytes ×
    * 1000 / byte_rate) from a proper RIFF chunk walk (chunks are
    * 2-byte aligned; fmt and data may appear in any order);
    * JPEG → (width, height, 1, 0) from the first SOFn marker segment
    * (a marker walk over the uncompressed header stream — C0–CF
    * except the non-frame C4/C8/CC — stopping unsatisfied at SOS/EOI:
    * frame geometry always precedes the entropy-coded scan);
    * MP4/ISO-BMFF (sniffed by the `ftyp` box) → (width, height,
    * n_frames, duration × 1000 / timescale) from `moov/mvhd`
    * (version 0 and 1 layouts), the first video `moov/trak/tkhd`
    * (16.16 fixed-point dims; audio tracks carry 0×0, so an
    * audio-only MP4 yields WAV-style (0, 0, …) with a real duration)
    * and that trak's `stbl/stts` sample-count sum when present
    * (sample TIMING is uncompressed metadata; the samples are not).
    * The 5th field is ORIENTATION: the EXIF 0x0112 value for a JPEG
    * carrying one ([[jpegExifOrientation]]), 1 (EXIF "upright") for
    * every other successfully decoded still image, 0 (not
    * applicable/unknown) for audio, video and the stub. None for
    * anything else — including truncated or malformed headers, which
    * fall back to the stub rather than throwing mid-pipeline. */
  private[multimodal] def decodeHeaders(b: Array[Byte]): Option[(Long, Long, Long, Long, Long)] = {
    def leInt(p: Int): Long = java.nio.ByteBuffer.wrap(b, p, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong
    def leShort(p: Int): Int = java.nio.ByteBuffer.wrap(b, p, 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort & 0xffff
    def beInt(p: Int): Long = java.nio.ByteBuffer.wrap(b, p, 4)
      .order(java.nio.ByteOrder.BIG_ENDIAN).getInt.toLong
    def tag(p: Int): String =
      if (b.length < p + 4) "" else new String(b, p, 4, "US-ASCII")
    val pngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (b.length >= 14 && tag(0) == "qoif") {
      // QOI: 14-byte uncompressed header — big-endian u32 dims,
      // channels (3|4), colorspace (0|1)
      val w = beInt(4); val h = beInt(8)
      val ch = b(12); val cs = b(13)
      if (w > 0 && h > 0 && (ch == 3 || ch == 4) && (cs == 0 || cs == 1))
        Some((w, h, 1L, 0L, 1L))
      else None
    } else if (b.length >= 10 && (tag(0) == "GIF8") &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      // GIF87a/89a: logical screen descriptor, little-endian u16 dims
      val w = leShort(6).toLong; val h = leShort(8).toLong
      if (w > 0 && h > 0) Some((w, h, 1L, 0L, 1L)) else None
    } else if (b.length >= 33 && b.take(8).sameElements(pngSig)) {
      // sig(8) + length(4) + "IHDR"(4) + 13 data + CRC(4) = 33 bytes
      val w = beInt(16); val h = beInt(20)
      if (beInt(8) == 13L && tag(12) == "IHDR" && w > 0 && h > 0)
        Some((w, h, 1L, 0L, 1L))
      else None
    } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val hdr = leInt(14)
      if (hdr >= 40L && b.length >= 54)
        Some((math.abs(leInt(18)), math.abs(leInt(22)), 1L, 0L, 1L))
      else if (hdr == 12L) // BITMAPCOREHEADER: 16-bit unsigned dims
        Some((leShort(18).toLong, leShort(20).toLong, 1L, 0L, 1L))
      else None
    } else if (b.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE") {
      var p = 12
      var byteRate = -1L
      var dataLen = -1L
      while (p + 8 <= b.length && (byteRate < 0 || dataLen < 0)) {
        val id = tag(p)
        val size = leInt(p + 4)
        if (size < 0 || size > b.length.toLong) return None // malformed
        if (id == "fmt " && size >= 16 && p + 24 <= b.length)
          byteRate = leInt(p + 16)
        else if (id == "data")
          dataLen = size
        p += 8 + size.toInt + (size.toInt & 1) // chunks 2-byte aligned
      }
      if (byteRate > 0 && dataLen >= 0)
        Some((0L, 0L, 1L, dataLen * 1000L / byteRate, 0L))
      else None
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      decodeJpegSof(b)
    } else if (b.length >= 20 && tag(0) == "RIFF" && tag(8) == "WEBP") {
      // WebP: VP8L dims are the two 14-bit LSB-first fields after the
      // 0x2f signature byte; lossy VP8 dims are in the keyframe
      // header (RFC 6386 §9.1: 3-byte frame tag, 0x9d012a start code,
      // two LE u16s masked to 14 bits) — header-only support for the
      // lossy format ([[Webp.decodePixels]] documents the pixel
      // boundary)
      var p = 12
      var res: Option[(Long, Long, Long, Long, Long)] = None
      while (res.isEmpty && p + 8 <= b.length) {
        val size = leInt(p + 4)
        if (size < 0 || p + 8 + size > b.length) return None
        tag(p) match {
          case "VP8L" if size >= 5 && (b(p + 8) & 0xff) == 0x2f =>
            val w = 1L + ((b(p + 9) & 0xff) | ((b(p + 10) & 0x3f) << 8))
            val h = 1L + (((b(p + 10) & 0xff) >> 6) |
              ((b(p + 11) & 0xff) << 2) | ((b(p + 12) & 0x0f) << 10))
            res = Some((w, h, 1L, 0L, 1L))
          case "VP8 " if size >= 10 && (b(p + 8) & 1) == 0 &&
              (b(p + 11) & 0xff) == 0x9d && (b(p + 12) & 0xff) == 0x01 &&
              (b(p + 13) & 0xff) == 0x2a =>
            val w = (leShort(p + 14) & 0x3fff).toLong
            val h = (leShort(p + 16) & 0x3fff).toLong
            if (w > 0 && h > 0) res = Some((w, h, 1L, 0L, 1L))
          case _ =>
        }
        p += 8 + size.toInt + (size.toInt & 1)
      }
      res
    } else if (b.length >= 12 && tag(4) == "ftyp") {
      decodeMp4Moov(b)
    } else None
  }

  private def beShortAt(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  /** JPEG SOFn marker walk. The JPEG header is a sequence of
    * FF-prefixed marker segments, each with an uncompressed big-endian
    * payload length (inclusive of the 2 length bytes); the SOFn
    * segment — any of C0–CF except C4 (DHT), C8 (JPG extension) and
    * CC (DAC) — carries precision(1), height(2), width(2) in the
    * clear. Entropy-coded data starts only after SOS (DA), so a valid
    * image's geometry is always reachable by this walk; hitting
    * SOS/EOI first, a misaligned marker, a segment overrunning the
    * buffer, or a DNL-deferred height of 0 falls back to the stub. */
  /** Lazy (marker, contentStart, contentEnd) over a JPEG's length-
    * bearing header segments — fill bytes and standalone markers
    * skipped; iteration ENDS at SOS/EOI or the first malformed
    * structure. One walk definition for geometry AND orientation
    * (both callers treat "not found" and "malformed" identically —
    * fall back to the stub/default — so ending the iteration encodes
    * every abort case of the previous duplicated walks). */
  private def jpegSegments(b: Array[Byte]): Iterator[(Int, Int, Int)] =
    new Iterator[(Int, Int, Int)] {
      private var p = 2
      private var nextSeg: (Int, Int, Int) = null
      private var done = false
      private def advance(): Unit = {
        nextSeg = null
        while (nextSeg == null && !done) {
          if (p + 4 > b.length) { done = true; return }
          if ((b(p) & 0xff) != 0xff) { done = true; return } // misalignment
          var q = p + 1
          while (q < b.length && (b(q) & 0xff) == 0xff) q += 1 // fill bytes
          if (q >= b.length) { done = true; return }
          val m = b(q) & 0xff
          if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
            p = q + 1 // standalone marker, no payload
          } else if (m == 0xd9 || m == 0xda) {
            done = true // EOI / start-of-scan: header area ends
          } else {
            if (q + 3 > b.length) { done = true; return }
            val len = beShortAt(b, q + 1)
            if (len < 2 || q + 1 + len > b.length) { done = true; return }
            nextSeg = (m, q + 3, q + 1 + len)
            p = q + 1 + len
          }
        }
      }
      advance()
      def hasNext: Boolean = nextSeg != null
      def next(): (Int, Int, Int) = {
        val r = nextSeg; advance(); r
      }
    }

  private def decodeJpegSof(b: Array[Byte]): Option[(Long, Long, Long, Long, Long)] =
    jpegSegments(b).collectFirst {
      case (m, s, e) if m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
        // SOFn payload: precision(1), height(2), width(2)
        if (e - s >= 5) {
          val h = beShortAt(b, s + 1).toLong
          val w = beShortAt(b, s + 3).toLong
          if (w > 0 && h > 0)
            Some((w, h, 1L, 0L, jpegExifOrientation(b).getOrElse(1L)))
          else None
        } else None
    }.flatten

  /** EXIF orientation (tag 0x0112) from a JPEG's APP1 segment — TIFF
    * IFD0 walk in the segment's own byte order (II/MM), all of it
    * uncompressed header metadata. The APP1 payload starts
    * "Exif\0\0", then a TIFF header (byte-order mark, magic 42, IFD0
    * offset relative to the TIFF base); IFD0 is a u16 entry count and
    * 12-byte entries (tag, type, count, value) — orientation is a
    * SHORT (type 3) whose value sits inline in the first 2 value
    * bytes. Returns values 1–8 only; anything malformed, absent, or
    * out of range → None (caller defaults to 1, EXIF's "upright"). */
  private[multimodal] def jpegExifOrientation(b: Array[Byte]): Option[Long] =
    jpegSegments(b).collectFirst {
      case (0xe1, s, end) if end - s >= 14 &&
          new String(b, s, 4, "US-ASCII") == "Exif" &&
          b(s + 4) == 0 && b(s + 5) == 0 =>
        parseTiffOrientation(b, s + 6, end)
    }.flatten

  /** TIFF IFD0 walk for the orientation tag inside [base, end). */
  private def parseTiffOrientation(b: Array[Byte], base: Int,
      end: Int): Option[Long] = {
    if (base + 8 > end) return None
    val little = b(base) == 'I' && b(base + 1) == 'I'
    val big = b(base) == 'M' && b(base + 1) == 'M'
    if (!little && !big) return None
    def u16(at: Int): Int =
      if (little) ((b(at + 1) & 0xff) << 8) | (b(at) & 0xff)
      else ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)
    def u32(at: Int): Long =
      if (little) (u16(at + 2).toLong << 16) | u16(at).toLong
      else (u16(at).toLong << 16) | u16(at + 2).toLong
    if (u16(base + 2) != 42) return None
    val ifd0 = base + u32(base + 4)
    if (ifd0 < base || ifd0 + 2 > end) return None
    val entries = u16(ifd0.toInt)
    var e = 0
    while (e < entries) {
      val at = ifd0.toInt + 2 + e * 12
      if (at + 12 > end) return None
      if (u16(at) == 0x0112 && u16(at + 2) == 3 && u32(at + 4) == 1L) {
        val v = u16(at + 8).toLong
        return if (v >= 1L && v <= 8L) Some(v) else None
      }
      e += 1
    }
    None // APP1/EXIF present, orientation tag absent
  }

  /** MP4 (ISO base media) box walk: `moov/mvhd` for duration (both
    * version-0 and version-1 layouts), first video `moov/trak/tkhd`
    * for dimensions (16.16 fixed point — presentation size in the
    * clear; the compressed samples in `mdat` are never touched).
    * Handles 64-bit `largesize` (size == 1) and to-end-of-file
    * (size == 0) boxes; any malformed size aborts to the stub. */
  private def decodeMp4Moov(b: Array[Byte]): Option[(Long, Long, Long, Long, Long)] = {
    def beIntAt(p: Int): Long = java.nio.ByteBuffer.wrap(b, p, 4)
      .order(java.nio.ByteOrder.BIG_ENDIAN).getInt.toLong & 0xffffffffL
    def beLongAt(p: Int): Long = java.nio.ByteBuffer.wrap(b, p, 8)
      .order(java.nio.ByteOrder.BIG_ENDIAN).getLong
    def typeAt(p: Int): String = new String(b, p + 4, 4, "US-ASCII")
    // (type, contentStart, boxEnd) for each box in [start, end)
    def boxes(start: Int, end: Int): List[(String, Int, Int)] = {
      val out = List.newBuilder[(String, Int, Int)]
      var p = start
      while (p + 8 <= end) {
        val sz0 = beIntAt(p)
        val (size, hdr) =
          if (sz0 == 1L && p + 16 <= end) (beLongAt(p + 8), 16)
          else if (sz0 == 0L) ((end - p).toLong, 8)
          else (sz0, 8)
        if (size < hdr || p + size > end) return out.result() // malformed tail
        out += ((typeAt(p), p + hdr, p + size.toInt))
        p += size.toInt
      }
      out.result()
    }
    val top = boxes(0, b.length)
    top.find(_._1 == "moov").flatMap { case (_, ms, me) =>
      val kids = boxes(ms, me)
      val durMs = kids.find(_._1 == "mvhd").flatMap { case (_, cs, ce) =>
        if (cs >= ce) None
        else {
          val v = b(cs) & 0xff
          // version+flags(4) then v0: c(4) m(4) scale(4) dur(4)
          //                       v1: c(8) m(8) scale(4) dur(8)
          if (v == 0 && cs + 20 <= ce) {
            val scale = beIntAt(cs + 12); val dur = beIntAt(cs + 16)
            if (scale > 0) Some(dur * 1000L / scale) else None
          } else if (v == 1 && cs + 32 <= ce) {
            val scale = beIntAt(cs + 20); val dur = beLongAt(cs + 24)
            if (scale > 0 && dur >= 0) Some(dur * 1000L / scale) else None
          } else None
        }
      }
      val dims = kids.iterator.filter(_._1 == "trak").flatMap { case (_, ts, te) =>
        boxes(ts, te).find(_._1 == "tkhd").flatMap { case (_, cs, ce) =>
          if (cs >= ce) None
          else {
            val v = b(cs) & 0xff
            // width/height: 16.16 fixed, after version+flags, times,
            // track id, reserved, duration, reserved(8), layer/alt/
            // volume/reserved(8 total), matrix(36)
            val off = if (v == 1) 88 else 76
            if (cs + off + 8 <= ce) {
              val w = beIntAt(cs + off) >> 16
              val h = beIntAt(cs + off + 4) >> 16
              // n_frames: the same trak's stbl/stts sample-count sum —
              // sample timing tables are plain big-endian metadata,
              // never compressed (the samples themselves live in mdat)
              if (w > 0 && h > 0) {
                val frames = boxes(ts, te).find(_._1 == "mdia").flatMap {
                  case (_, ds, de) => boxes(ds, de).find(_._1 == "minf") }.flatMap {
                  case (_, fs, fe) => boxes(fs, fe).find(_._1 == "stbl") }.flatMap {
                  case (_, ss, se) => boxes(ss, se).find(_._1 == "stts") }.flatMap {
                  case (_, cs2, ce2) =>
                    // version+flags(4), entry_count(4), then
                    // entry_count x (sample_count(4), sample_delta(4))
                    if (cs2 + 8 > ce2) None
                    else {
                      val n = beIntAt(cs2 + 4)
                      if (n < 0 || cs2 + 8 + n * 8 > ce2) None
                      else {
                        var total = 0L; var e = 0
                        while (e < n) { total += beIntAt(cs2 + 8 + e * 8); e += 1 }
                        if (total > 0) Some(total) else None
                      }
                    }
                }
                Some((w, h, frames.getOrElse(1L)))
              } else None
            } else None
          }
        }
      }.toSeq.headOption
      durMs.map { d =>
        val (w, h, f) = dims.getOrElse((0L, 0L, 1L))
        (w, h, f, d, 0L)
      }
    }
  }

  /** Batched feature extraction: partition-local, `batchSize` rows per
    * decode call — the exact shape a vectorized (Arrow/Pandas) decode
    * would use, so swapping the stub fallback for a real batch codec
    * is a drop-in change. Real header formats ([[decodeHeaders]])
    * decode truthfully; everything else takes the stub. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real codec would decode `batch` as one vectorized call
        batch.iterator.map { r =>
          val (w, h, f, d, o) = decodeHeaders(r.media)
            .getOrElse(decodeStub(r.kind, r.media))
          MediaFeatures(r.media_id, r.kind, r.media.length.toLong, w, h, f, d, o)
        }
      }
    }
  }

  /** End-to-end query: synthesize → decode (stub) → typed features. */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(spark, sfDir)).toDF()

  /** Frame sampling for video rows: up to `maxFrames` evenly-strided
    * frame indices per video (stride = ceil(n_frames / maxFrames)),
    * each with a per-frame feature — the decode-side shape of a
    * vision-language ingest. Rows whose payload DECODES
    * ([[VideoFrames.decodeAviFrames]] — uncompressed AVI) stride off
    * the REAL frame count and report the REAL frame feature (mean
    * gray = Σ red channel / (w·h), integer division; channels are
    * equal on gray frames); undecodable rows stride off the header
    * frame count where headers parse (MP4 moov) and take the stub
    * luma formula (a real codec replaces exactly that fallback, like
    * [[decodeStub]]). Map-only: per-row decode, ≤ n_frames output
    * rows, never a shuffle. */
  def frameSampleOf(media: Dataset[MediaRow], maxFrames: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      VideoFrames.decodeAviFrames(r.media) match {
        // a frameless decode must emit zero rows, never a `by 0`
        // stride (decodeAviFrames currently returns None for an empty
        // movi list — this pins the no-rows behavior if that contract
        // ever loosens, same hazard ADVICE r11 flagged below)
        case Some((_, _, frames)) if frames.isEmpty => Seq.empty
        case Some((w, h, frames)) =>
          val stride = (frames.length + maxFrames - 1) / maxFrames
          (0 until frames.length by stride).map { f =>
            val px = frames(f)
            var s = 0L; var i = 0
            while (i < px.length) { s += (px(i) >>> 16) & 0xff; i += 1 }
            (r.media_id, f.toLong, s / (w.toLong * h))
          }
        case None =>
          val (_, _, nf, _, _) = decodeHeaders(r.media)
            .getOrElse(decodeStub(r.kind, r.media))
          // a parsed-but-frameless header (e.g. an MP4 with an empty
          // stts) yields n_frames = 0 → emit no rows; the unguarded
          // stride would be 0 and `by 0` throws (ADVICE r11)
          if (nf <= 0L) Seq.empty
          else {
            val stride = (nf + maxFrames - 1) / maxFrames
            (0L until nf by stride).map { f =>
              (r.media_id, f, (r.media_id * 31 + f * 7) % 256)
            }
          }
      }
    }.toDF("media_id", "frame_idx", "luma")
  }

  /** Gate surface (`mm_frames`): frame sampling over the video table
    * whose real rows carry DECODABLE frames ([[VideoFrames.aviTable]]
    * — closed-form pixels, so the oracle recomputes each sampled
    * frame's mean from doc_id); fake rows pin the stub fallback in
    * the same gate. The MP4 header-only surfaces (mm_features,
    * mm_kind_summary) stay on [[mediaTable]] untouched. */
  def frameSample(spark: SparkSession, sfDir: String, maxFrames: Int = 8): DataFrame =
    frameSampleOf(VideoFrames.aviTable(spark, sfDir), maxFrames)

  /** Metadata-only rollup: aggregates ONLY ingest-time metadata columns
    * (kind, byte_len) via [[mediaMeta]], so the payload is never even
    * an expression in the plan — asserted in MultimodalSpec. Feature
    * rollups that need decoded values (width etc.) go through
    * [[features]] and pay the payload IO by construction. */
  def kindSummary(spark: SparkSession, sfDir: String): DataFrame =
    mediaMeta(spark, sfDir)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"), sum(col("byte_len")).as("total_bytes"))
}
