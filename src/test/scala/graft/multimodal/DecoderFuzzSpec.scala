package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Mix

/** Deterministic fuzz over the pure-JVM media decoders — the one
  * class of engine code that parses ARBITRARY UNTRUSTED BYTES from a
  * corpus (the round-9 review's QOI w·h overflow was exactly this
  * surface). The contract under fuzz is total: every decoder either
  * returns a value or None — it NEVER throws, never allocates from an
  * attacker-controlled size, and the hash composites always land in
  * their documented fallback. All inputs derive from splitmix64, so a
  * failure reproduces from the printed (shape, index) alone. */
class DecoderFuzzSpec extends AnyFunSuite {

  private def bytes(seed: Long, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    var i = 0
    while (i < len) {
      out(i) = (Mix.splitmix64(seed * 0x100000001b3L + i) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Every decoder entry point the engine exposes to corpus bytes. */
  private val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "qoiPixels" -> (b => ImageDedup.decodeQoiPixels(b)),
    "bmpPixels" -> (b => ImageDedup.decodeBmpPixels(b)),
    "wavPcm" -> (b => AudioFeatures.decodeWavPcm(b)),
    "headers" -> (b => Multimodal.decodeHeaders(b)),
    "exif" -> (b => Multimodal.jpegExifOrientation(b)),
    "imageHash" -> (b => ImageDedup.imageHash(b)),
    "clipHash" -> (b => AudioDedup.clipHash(b)),
    "aviFrames" -> (b => VideoFrames.decodeAviFrames(b)),
    "jpegPixels" -> (b => Jpeg.decodePixels(b)),
    "pngPixels" -> (b => Png.decodePixels(b)),
    "gifPixels" -> (b => Gif.decodePixels(b)),
    "webpPixels" -> (b => Webp.decodePixels(b)),
    "flacPcm" -> (b => Flac.decodePcm(b)),
    "tiffPixels" -> (b => Tiff.decodePixels(b)))

  private def assertTotal(label: String, payload: Array[Byte]): Unit =
    decoders.foreach { case (name, f) =>
      try f(payload)
      catch {
        case e: Throwable =>
          fail(s"$name threw on $label (len=${payload.length}): $e")
      }
    }

  test("random blobs: every decoder is total (returns or None, never throws)") {
    for (i <- 0 until 200) {
      val len = (Mix.splitmix64(i * 7919L).abs % 4096L).toInt
      assertTotal(s"blob#$i", bytes(i + 1L, len))
    }
  }

  test("magic-prefixed garbage: a plausible header never buys a crash") {
    val magics = Seq[(String, Array[Byte])](
      "qoif" -> "qoif".getBytes,
      "bm" -> "BM".getBytes,
      "riff-wave" -> ("RIFF".getBytes ++ Array[Byte](0x10, 0, 0, 0) ++
        "WAVE".getBytes),
      "png" -> Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
        0x0d, 0x0a, 0x1a, 0x0a),
      "gif" -> "GIF89a".getBytes,
      "jpeg" -> Array(0xff.toByte, 0xd8.toByte, 0xff.toByte),
      "ftyp" -> (Array[Byte](0, 0, 0, 0x14) ++ "ftypisom".getBytes),
      "riff-avi" -> ("RIFF".getBytes ++ Array[Byte](0x10, 0, 0, 0) ++
        "AVI ".getBytes),
      "riff-webp" -> ("RIFF".getBytes ++ Array[Byte](0x10, 0, 0, 0) ++
        "WEBPVP8L".getBytes ++ Array[Byte](8, 0, 0, 0, 0x2f)),
      "flac" -> "fLaC".getBytes,
      "tiff-ii" -> Array[Byte]('I', 'I', 42, 0),
      "tiff-mm" -> Array[Byte]('M', 'M', 0, 42))
    for ((tag, magic) <- magics; i <- 0 until 60) {
      val len = (Mix.splitmix64(i * 104729L + tag.hashCode).abs % 512L).toInt
      assertTotal(s"$tag#$i", magic ++ bytes(i + 31L, len))
    }
  }

  test("single-byte mutations of real payloads decode or fall back, never throw") {
    val reals = Seq[(String, Array[Byte])](
      "qoi" -> MediaSynth.qoi(7L), "wav" -> MediaSynth.wav(13L),
      "mp4" -> MediaSynth.mp4(20L), "avi" -> MediaSynth.avi(11L),
      "jpeg" -> MediaSynth.jpeg(9L),
      "jpeg-prog" -> MediaSynth.jpegProgressive(9L),
      "png" -> MediaSynth.png(9L),
      "gif" -> MediaSynth.gif(9L),
      "wav-ext" -> MediaSynth.wavExt(9L), // stereo PCM8
      "wav-ulaw" -> MediaSynth.wavExt(18L), // 18 % 4 == 2 -> u-law
      "wav-float" -> MediaSynth.wavExt(14L), // 14 % 9 == 5 -> IEEE float
      "wav-24bit" -> MediaSynth.wavExt(16L), // 16 % 9 == 7 -> 24-bit PCM
      "png-interlaced" -> MediaSynth.png(7L),
      "png-indexed" -> MediaSynth.png(17L),
      "png-16bit" -> MediaSynth.png(6L),
      "png-4bit" -> MediaSynth.png(5L), // 5 % 13 == 5
      "png-4bit-indexed" -> MediaSynth.png(29L), // 29 % 13 == 3
      "gif-interlaced" -> MediaSynth.gif(2L),
      "avi-mjpeg" -> MediaSynth.aviMjpeg(9L),
      "webp-plain" -> MediaSynth.webp(0L),
      "webp-palette" -> MediaSynth.webp(2L),
      "webp-cache-lz77" -> MediaSynth.webp(3L),
      "webp-predictor" -> MediaSynth.webp(4L),
      "webp-meta" -> MediaSynth.webp(6L),
      "webp-bundled" -> MediaSynth.webpBundledOf(9, 7, 4, (x, y) => (x + y) % 4),
      "flac-mono" -> MediaSynth.flac(4L),
      "flac-stereo" -> MediaSynth.flac(9L),
      "flac-wasted" -> MediaSynth.flac(6L), // 6 % 13 == 6
      "flac-24bit" -> MediaSynth.flac(16L), // 16 % 7 == 2
      "flac-24bit-wasted" -> MediaSynth.flac(58L), // 58: 24-bit + wasted
      "flac-variable" -> MediaSynth.flac(15L), // 15 % 11 == 4
      "tiff-packbits" -> MediaSynth.tiff(1L),
      "tiff-lzw-predictor" -> MediaSynth.tiff(2L), // 2 % 6 == 2
      "tiff-lzw" -> MediaSynth.tiff(5L),
      "tiff-palette" -> MediaSynth.tiff(14L))
    for ((tag, real) <- reals) {
      // flip one byte at a time — every offset for the small payloads,
      // a prime stride over the qoi pixel stream
      val stride = math.max(1, real.length / 97)
      var p = 0
      while (p < real.length) {
        val m = real.clone()
        m(p) = (m(p) ^ (1 + (Mix.splitmix64(p.toLong) & 0x7f)).toInt).toByte
        assertTotal(s"$tag@+$p", m)
        p += stride
      }
    }
  }

  test("every truncation prefix of a real payload is handled") {
    val reals = Seq[(String, Array[Byte])](
      "qoi" -> MediaSynth.qoi(19L), "wav" -> MediaSynth.wav(25L),
      "mp4" -> MediaSynth.mp4(14L), "avi" -> MediaSynth.avi(17L),
      "jpeg" -> MediaSynth.jpeg(23L),
      "jpeg-prog" -> MediaSynth.jpegProgressive(23L),
      "png" -> MediaSynth.png(23L),
      "gif" -> MediaSynth.gif(23L),
      "wav-ext" -> MediaSynth.wavExt(23L), // 23 % 4 == 3 -> A-law
      "png-interlaced" -> MediaSynth.png(25L), // 25 % 9 == 7
      "png-indexed" -> MediaSynth.png(33L), // 33 % 8 == 1
      "png-1bit" -> MediaSynth.png(24L), // 24 % 13 == 11
      "gif-interlaced" -> MediaSynth.gif(14L),
      "avi-mjpeg" -> MediaSynth.aviMjpeg(23L),
      "webp-subgreen" -> MediaSynth.webp(22L), // 22 % 7 == 1
      "webp-color-transform" -> MediaSynth.webp(19L), // 19 % 7 == 5
      "webp-meta" -> MediaSynth.webp(27L), // 27 % 7 == 6
      "flac-stereo" -> MediaSynth.flac(17L),
      "flac-escape" -> MediaSynth.flac(3L),
      "tiff-white-zero" -> MediaSynth.tiff(3L))
    for ((tag, real) <- reals) {
      val stride = math.max(1, real.length / 127)
      var n = 0
      while (n <= real.length) {
        assertTotal(s"$tag[0,$n)", java.util.Arrays.copyOf(real, n))
        n += stride
      }
    }
  }

  test("adversarial QOI dimensions: huge and overflowing w*h decline, never allocate") {
    def qoiHeader(w: Long, h: Long): Array[Byte] = {
      def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      "qoif".getBytes ++ be32(w) ++ be32(h) ++ Array[Byte](3, 0) ++ bytes(5L, 64)
    }
    // the r9 review's crafted-payload shapes: each unsigned-32 extreme,
    // and the pair whose product wraps past 2^63
    val dims = Seq((0xffffffffL, 0xffffffffL), (0x80000000L, 0x80000000L),
      (0xffffffffL, 2L), (1L, 0xffffffffL), (5000000L, 5000000L), (0L, 10L))
    dims.foreach { case (w, h) =>
      assert(ImageDedup.decodeQoiPixels(qoiHeader(w, h)).isEmpty,
        s"dims ($w,$h) must decline")
    }
  }
}
