package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal.MediaRow

class AudioResampleSpec extends SparkSpec {

  test("decimation: window means, truncation toward zero, tail dropped") {
    val s = Array[Short](10, 20, 30, 40, -7, -7, -7, 0, 99, 99, 99)
    val out = AudioResample.resample(s, 4)
    assert(out.length === 2, "the 3-sample tail must be dropped")
    assert(out(0) === 25.toShort) // (10+20+30+40)/4
    // (-7-7-7+0)/4 = -21/4 truncates toward zero = -5 (matches DuckDB //)
    assert(out(1) === -5.toShort)
    // factor 1 is the identity
    assert(AudioResample.resample(s, 1).toSeq === s.toSeq)
  }

  test("WAV re-encode round-trips exactly at the decimated rate") {
    val samples = Array.tabulate[Short](50)(i => ((i * 997) % 4001 - 2000).toShort)
    val enc = AudioResample.wavEncode(2000, samples)
    val Some((rate, ch, back)) = AudioFeatures.decodeWavPcm(enc)
    assert((rate, ch) === ((2000, 1)))
    assert(back.toSeq === samples.toSeq)
    assert(enc.length === 44 + 2 * 50)
  }

  test("resampleMedia: decodable audio shrinks ~4x, everything else passes through") {
    import spark.implicits._
    val wav = MediaSynth.wav(7L) // 64 + 7%192 = 71 samples at 8 kHz
    val rows = Seq(
      MediaRow(0L, "audio", wav, "audio/wav", wav.length.toLong),
      MediaRow(1L, "audio", Array[Byte](5, 5), "audio/wav", 2L),
      MediaRow(2L, "image", Array[Byte](1), "image/qoi", 1L))
    val out = AudioResample.resampleMedia(rows.toDS(), 4).collect()
      .map(m => m.media_id -> m).toMap
    val Some((rate, _, back)) = AudioFeatures.decodeWavPcm(out(0L).media)
    assert(rate === 2000)
    assert(back.length === 71 / 4)
    // the resampled stream is the window means of the source
    val Some((_, _, src)) = AudioFeatures.decodeWavPcm(wav)
    val want = AudioResample.resample(src, 4)
    assert(back.toSeq === want.toSeq)
    // undecodable audio and the image row untouched
    assert(out(1L).media.toSeq === Seq[Byte](5, 5))
    assert(out(2L).media.toSeq === Seq[Byte](1))
  }

  test("gate surface: real rows cross the PCM pipeline, fakes report passthrough") {
    val rep = AudioResample.resampleReport(spark, sf()).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(5), r.getLong(6)))).toMap
    val clips = Multimodal.mediaTable(spark, sf())
      .filter(_.kind == "audio").collect()
    assert(rep.size === clips.length)
    clips.foreach { m =>
      val (decoded, srcN, outN, ob) = rep(m.media_id)
      if (MediaSynth.isReal(m.media_id)) {
        assert(decoded === 1L)
        assert(srcN === MediaSynth.wavFrames(m.media_id).toLong)
        assert(outN === srcN / 4)
        assert(ob === 44L + 2 * outN)
      } else {
        assert(decoded === 0L)
        assert(ob === m.media.length.toLong)
      }
    }
  }
}
