package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.multimodal.Multimodal.MediaRow

/** Audio RESAMPLE (integer-factor decimation) — the acoustic twin of
  * [[ImageResize]] and the sample-rate-conversion step an audio
  * pipeline runs before feature extraction or storage. Complete
  * windows of `factor` samples collapse to their mean with TRUNCATING
  * integer division (Java `/` and DuckDB `//` agree on negatives —
  * both truncate toward zero — so the arithmetic is exactly
  * reproducible across engines); the trailing partial window is
  * dropped — a resampler must not invent a mean over shorter support.
  * Box-mean decimation is the crudest correct anti-alias filter
  * (averaging IS a low-pass over the decimation window).
  *
  * The transform re-encodes resampled PCM as a canonical mono 16-bit
  * WAV at rate/factor, so the output is itself a decodable payload
  * downstream stages (features, fingerprints, further resampling)
  * consume unchanged. Undecodable payloads pass through untouched —
  * the [[ImageResize]] honesty contract.
  *
  * Scale: map-only, output payloads shrink by ~factor. Gate story
  * (`mm_resample`): real WAV rows have closed-form samples
  * ([[MediaSynth.wavSample]]), so DuckDB recomputes the full decode →
  * window-mean → re-encode → re-decode SAMPLE arithmetic from doc_id
  * alone — the same strongest-oracle shape as `mm_resize`.
  */
object AudioResample {

  /** Decimate by `factor` via complete-window means (truncating
    * division; the tail partial window is dropped). */
  private[multimodal] def resample(samples: Array[Short], factor: Int): Array[Short] = {
    require(factor >= 1, "factor must be >= 1")
    val n = samples.length / factor
    val out = new Array[Short](n)
    var j = 0
    while (j < n) {
      var s = 0L
      var i = j * factor
      val end = i + factor
      while (i < end) { s += samples(i); i += 1 }
      // window mean stays within Short range (mean of Short values)
      out(j) = (s / factor).toShort
      j += 1
    }
    out
  }

  /** Canonical mono 16-bit PCM WAV writer (RIFF + fmt + data, the
    * [[MediaSynth]] container shape); [[AudioFeatures.decodeWavPcm]]
    * round-trips it exactly. */
  private[multimodal] def wavEncode(rate: Int, samples: Array[Short]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(44 + 2 * samples.length)
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    le32(36 + 2 * samples.length)
    out.write('W'); out.write('A'); out.write('V'); out.write('E')
    out.write('f'); out.write('m'); out.write('t'); out.write(' ')
    le32(16); le16(1); le16(1); le32(rate); le32(rate * 2); le16(2); le16(16)
    out.write('d'); out.write('a'); out.write('t'); out.write('a')
    le32(2 * samples.length)
    var i = 0
    while (i < samples.length) { le16(samples(i) & 0xffff); i += 1 }
    out.toByteArray
  }

  /** The corpus transform: audio rows with decodable PCM are replaced
    * by their rate/factor re-encoding; everything else passes
    * through unchanged. */
  def resampleMedia(media: Dataset[MediaRow], factor: Int = 4): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.kind != "audio") m
      else AudioFeatures.decodeWavPcm(m.media) match {
        case Some((rate, _, samples)) if rate >= factor =>
          val enc = wavEncode(rate / factor, resample(samples, factor))
          m.copy(media = enc, byte_len = enc.length.toLong)
        case _ => m
      }
    }
  }

  /** Gate surface (`mm_resample`): per audio row, the resample
    * pipeline's integer digests — decoded flag, source rate and
    * sample count, output rate / count / byte length, and `samp_sum`
    * = Σ samples of the DE-CODED re-encoding (decode → window-mean →
    * encode → decode all inside the gate arithmetic). Undecodable
    * rows report decoded = 0, zeros, and the passthrough byte
    * length. */
  def resampleReport(spark: SparkSession, sfDir: String,
      factor: Int = 4): DataFrame = {
    val media = Multimodal.mediaTable(spark, sfDir)
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").map { m =>
      AudioFeatures.decodeWavPcm(m.media) match {
        case Some((rate, _, samples)) if rate >= factor =>
          val enc = wavEncode(rate / factor, resample(samples, factor))
          val digest = AudioFeatures.decodeWavPcm(enc) match {
            case Some((_, _, back)) =>
              var s = 0L; var i = 0
              while (i < back.length) { s += back(i); i += 1 }
              s
            case None => Long.MinValue // unreachable: wavEncode round-trips
          }
          (m.media_id, 1L, rate.toLong, samples.length.toLong,
            (rate / factor).toLong, (samples.length / factor).toLong,
            enc.length.toLong, digest)
        case _ =>
          (m.media_id, 0L, 0L, 0L, 0L, 0L, m.media.length.toLong, 0L)
      }
    }.toDF("media_id", "decoded", "src_rate", "src_n", "out_rate", "out_n",
      "out_bytes", "samp_sum")
  }
}
