package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.multimodal.Multimodal.MediaRow

/** Audio feature extraction with REAL pure-JVM sample decode for the
  * one audio container whose samples need no codec: PCM WAV (RIFF
  * `fmt `/`data` chunk walk, 16-bit little-endian samples read
  * directly — the audio twin of [[ImageDedup]]'s QOI/BMP pixel
  * work). Features are INTEGER-EXACT over the mean-downmixed stream (no
  * mixing arithmetic, no floats):
  *
  *  - `n_samples`: frames in the data chunk;
  *  - `peak_abs`: max |sample|;
  *  - `zero_crossings`: strict sign changes between consecutive
  *    samples (zeros break a run — no crossing through silence);
  *  - `energy`: Σ sample² (Long; 16-bit samples bound it at
  *    ~2³¹ per million frames, far inside Long).
  *
  * Payloads the decoder cannot read (compressed audio, text bytes)
  * take the documented deterministic STUB — arithmetic on byte
  * length, the [[Multimodal.decodeStub]] honesty contract. The gate
  * corpus carries REAL PCM WAV payloads on half its audio rows
  * ([[MediaSynth]]), so the hash gate crosses the RIFF walk + 16-bit
  * sample decode (the oracle re-synthesizes the exact sample stream
  * and refolds the features in SQL) and the stub in one run;
  * AudioFeaturesSpec additionally pins edge cases on synthesized
  * files.
  *
  * Scale: map-only over the media table, binary column read once,
  * no shuffle — the same posture as `mm_features`.
  */
object AudioFeatures {

  /** Frame-count ceiling (executor safety: 8 MB of 16-bit mono). */
  private[multimodal] val MaxFrames = 4 * 1024 * 1024

  /** Decode a WAV payload to (sampleRate, channels, samples):
    * PCM (format 1) at 16-bit signed or 8-bit unsigned (widened by
    * ×256 about the 128 center — the standard lossless embedding),
    * plus the G.711 telephony codings — µ-law (format 7) and A-law
    * (format 6), both 8-bit, expanded through the canonical CCITT
    * decode arithmetic ([[ulaw]]/[[alaw]] — integer-exact, mirrored
    * verbatim in the gate's SQL), IEEE float (format 3, 32-bit),
    * projected rint(f · 32768) clamped into the 16-bit domain (exact
    * on any float that IS a 16-bit sample; NaN reads as silence),
    * and 24-bit PCM, floor-projected `>> 8` per channel before the
    * downmix (the 24-bit FLAC projection). Any channel count; multichannel
    * frames MEAN-DOWNMIX per frame (truncating integer division —
    * exactly mirrorable in SQL; r13: the previous first-channel
    * projection made a channel-swapped stereo re-export hash
    * differently from its source, which is wrong for near-dup).
    * None for any other flavor. */
  private[graft] def decodeWavPcm(b: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (b.length < 44) return None
    def tag(p: Int): String =
      if (b.length < p + 4) "" else new String(b, p, 4, "US-ASCII")
    def leInt(p: Int): Long = java.nio.ByteBuffer.wrap(b, p, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong
    def leShort(p: Int): Int = java.nio.ByteBuffer.wrap(b, p, 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort & 0xffff
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var p = 12
    var fmtOk = false
    var channels = 0
    var rate = 0
    var bits = 0
    var fmt = 0
    var dataStart = -1
    var dataLen = -1L
    while (p + 8 <= b.length && (!fmtOk || dataStart < 0)) {
      val id = tag(p)
      val size = leInt(p + 4)
      if (size < 0 || p + 8 + size > b.length) return None
      if (id == "fmt " && size >= 16) {
        fmt = leShort(p + 8)
        channels = leShort(p + 10)
        rate = leInt(p + 12).toInt
        bits = leShort(p + 22)
        val ok = (fmt == 1 && (bits == 16 || bits == 8 || bits == 24)) ||
          ((fmt == 6 || fmt == 7) && bits == 8) ||
          (fmt == 3 && bits == 32)
        if (!ok || channels < 1) return None
        fmtOk = true
      } else if (id == "data") {
        dataStart = p + 8
        dataLen = size
      }
      p += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataStart < 0) return None
    val sampleBytes = bits / 8
    val frameBytes = sampleBytes * channels
    val frames = (dataLen / frameBytes).toInt
    if (frames <= 0 || frames > MaxFrames) return None
    val out = new Array[Short](frames)
    var f = 0
    while (f < frames) {
      val at = dataStart + f * frameBytes
      var sum = 0
      var c = 0
      while (c < channels) {
        val q = at + c * sampleBytes
        sum += (fmt match {
          case 1 =>
            if (bits == 16) (b(q) & 0xff) | (b(q + 1) << 8)
            else if (bits == 24) // floor >> 8 into the 16-bit domain
              (((b(q) & 0xff) | ((b(q + 1) & 0xff) << 8) |
                (b(q + 2) << 16)) >> 8)
            else ((b(q) & 0xff) - 128) * 256
          case 3 =>
            val f0 = java.lang.Float.intBitsToFloat(
              (b(q) & 0xff) | ((b(q + 1) & 0xff) << 8) |
                ((b(q + 2) & 0xff) << 16) | (b(q + 3) << 24))
            if (java.lang.Float.isNaN(f0)) 0
            else math.max(-32768, math.min(32767,
              math.rint(f0 * 32768.0).toInt))
          case 7 => ulaw(b(q) & 0xff)
          case _ => alaw(b(q) & 0xff) // 6
        })
        c += 1
      }
      out(f) = (sum / channels).toShort // mean downmix, truncating
      f += 1
    }
    Some((rate, channels, out))
  }

  /** Canonical G.711 µ-law expansion (CCITT): complement, expand the
    * 4-bit mantissa at the 3-bit exponent around the 0x84 bias, sign
    * from bit 7. Range ±32124 (the textbook table's endpoints). */
  private[multimodal] def ulaw(r: Int): Int = {
    val u = ~r & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** Canonical G.711 A-law expansion (CCITT): xor 0x55, segment 0
    * adds the half-step 8, segment 1 the 0x108 offset, higher
    * segments shift; sign from bit 7. Range ±32256. */
  private[multimodal] def alaw(r: Int): Int = {
    val a = r ^ 0x55
    val seg = (a >> 4) & 7
    val t0 = (a & 0x0f) << 4
    val t = seg match {
      case 0 => t0 + 8
      case 1 => t0 + 0x108
      case _ => (t0 + 0x108) << (seg - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  /** (n_samples, peak_abs, zero_crossings, energy) — integer-exact. */
  private[multimodal] def featuresOf(samples: Array[Short]): (Long, Long, Long, Long) = {
    var peak = 0L; var crossings = 0L; var energy = 0L
    var prevSign = 0
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toLong
      val a = math.abs(s)
      if (a > peak) peak = a
      energy += s * s
      val sign = java.lang.Long.signum(s)
      if (sign != 0) {
        if (prevSign != 0 && sign != prevSign) crossings += 1
        prevSign = sign
      } else prevSign = 0 // silence breaks a run
      i += 1
    }
    (samples.length.toLong, peak, crossings, energy)
  }

  /** Documented deterministic stub for undecodable payloads —
    * arithmetic on byte length only, so the DuckDB oracle derives it
    * from `octet_length(text)`. */
  private[multimodal] def stubFeatures(byteLen: Long): (Long, Long, Long, Long) =
    (byteLen * 2L, byteLen % 32768L, byteLen % 1000L, byteLen * 12345L)

  /** Per-audio-row features: real PCM decode when possible, stub
    * otherwise. */
  def audioFeaturesOf(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio")
      .map { m =>
        val (n, peak, zc, energy) = decodeWavPcm(m.media) match {
          case Some((_, _, samples)) => featuresOf(samples)
          case None                  => stubFeatures(m.media.length.toLong)
        }
        (m.media_id, n, peak, zc, energy)
      }
      .toDF("media_id", "n_samples", "peak_abs", "zero_crossings", "energy")
  }

  /** Gate surface over the synthesized media table: real PCM decode
    * on [[MediaSynth.isReal]] rows (oracle re-synthesizes the sample
    * stream), stub arithmetic on the rest. */
  def audioFeatures(spark: SparkSession, sfDir: String): DataFrame =
    audioFeaturesOf(Multimodal.mediaTable(spark, sfDir))

  /** Gate surface (`mm_audio_features_ext`): the EXTENDED-profile WAV
    * path — mono/stereo by doc_id parity (stereo frames mean-
    * downmixed with truncating division), 16-bit/8-bit by doc_id % 4
    * (8-bit widened ×256 about the 128 center), varying sample rate —
    * all re-synthesized by the oracle from the
    * [[MediaSynth.wavExtSample16]]/[[MediaSynth.wavExtByte8]] closed
    * forms and refolded in SQL (rate and channel count are reported,
    * so a misread fmt chunk cannot hide). Rows with doc_id % 5 == 3
    * get a TRUNCATED stream and owe the all-(-1) fallback. Map-only
    * over documents. */
  def extFeatureReport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").as[Long]
      .map { id =>
        val full = MediaSynth.wavExt(id)
        val payload = if (id % 5 == 3) full.take(24) else full
        decodeWavPcm(payload) match {
          case Some((rate, ch, samples)) =>
            val (n, peak, zc, energy) = featuresOf(samples)
            (id, rate.toLong, ch.toLong, n, peak, zc, energy)
          case None => (id, -1L, -1L, -1L, -1L, -1L, -1L)
        }
      }
      .toDF("doc_id", "rate", "channels", "n_samples", "peak_abs",
        "zero_crossings", "energy")
  }
}
