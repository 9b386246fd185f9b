package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal.MediaRow

class AudioFeaturesSpec extends SparkSpec {

  // spec-side PCM WAV encoder: RIFF + fmt (PCM, 16-bit) + data
  private def wav(rate: Int, channels: Int,
      frames: Seq[Seq[Int]]): Array[Byte] = {
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val data = frames.flatMap(f => f.flatMap(le16)).toArray
    val byteRate = rate * channels * 2
    "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(byteRate) ++ le16(channels * 2) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data
  }

  test("PCM decode: mono square wave — exact frames, peak, crossings, energy") {
    val n = 100
    val frames = (0 until n).map(i => Seq(if (i % 2 == 0) 1000 else -1000))
    val Some((rate, ch, samples)) = AudioFeatures.decodeWavPcm(wav(8000, 1, frames))
    assert((rate, ch) === ((8000, 1)))
    assert(samples.length === n)
    val (ns, peak, zc, energy) = AudioFeatures.featuresOf(samples)
    assert(ns === n.toLong)
    assert(peak === 1000L)
    assert(zc === (n - 1).toLong, "alternating signs cross every step")
    assert(energy === n.toLong * 1000L * 1000L)
  }

  test("stereo: frames MEAN-downmix (truncating); silence breaks crossing runs") {
    // per-frame mean of the two channels, integer division truncating
    // toward zero: (5+5)/2=5, (-5-5)/2=-5, (1-1)/2=0, (7+8)/2=7,
    // (-7-8)/2=-7 (Java semantics; the SQL twin uses //)
    val frames = Seq(Seq(5, 5), Seq(-5, -5), Seq(1, -1),
      Seq(7, 8), Seq(-7, -8))
    val Some((_, ch, samples)) = AudioFeatures.decodeWavPcm(wav(44100, 2, frames))
    assert(ch === 2)
    assert(samples.toSeq === Seq[Short](5, -5, 0, 7, -7))
    val (ns, peak, zc, energy) = AudioFeatures.featuresOf(samples)
    assert(ns === 5L)
    assert(peak === 7L)
    // 5→-5 crosses; -5→0 silence; 0→7 restarts a run; 7→-7 crosses
    assert(zc === 2L)
    assert(energy === (25L + 25L + 0L + 49L + 49L))
    // a CHANNEL-SWAPPED re-export decodes to the identical stream —
    // the near-dup property the first-channel projection broke
    val swapped = AudioFeatures.decodeWavPcm(wav(44100, 2, frames.map(_.reverse)))
    assert(swapped.map(_._3.toSeq) === Some(samples.toSeq))
  }

  test("8-bit PCM: unsigned samples widen x256 about the 128 center") {
    // hand-build an 8-bit mono WAV: fmt bits=8, one byte per frame
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val samples8 = Array[Int](128, 0, 255, 129, 127)
    val data = samples8.map(_.toByte)
    val body = "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8) ++
      "data".getBytes ++ le32(data.length) ++ data ++
      (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val bytes = "RIFF".getBytes ++ le32(body.length) ++ body
    val Some((rate, ch, s)) = AudioFeatures.decodeWavPcm(bytes)
    assert((rate, ch) === ((8000, 1)))
    assert(s.toSeq === Seq[Short](0, -32768, 32512, 256, -256))
  }

  test("negative samples decode correctly (LE sign extension)") {
    val Some((_, _, s)) = AudioFeatures.decodeWavPcm(
      wav(8000, 1, Seq(Seq(-32768), Seq(32767), Seq(-1))))
    assert(s.toSeq === Seq[Short](-32768, 32767, -1))
  }

  test("G.711 expansion: canonical table endpoints and signs") {
    // u-law: 0xFF/0x7F are +0/-0, 0x00 is the negative extreme -32124,
    // 0x80 the positive extreme +32124 (CCITT table endpoints)
    assert(AudioFeatures.ulaw(0xff) === 0)
    assert(AudioFeatures.ulaw(0x7f) === 0)
    assert(AudioFeatures.ulaw(0x00) === -32124)
    assert(AudioFeatures.ulaw(0x80) === 32124)
    // A-law: 0x55/0xD5 are the -8/+8 half-steps, 0x2A/0xAA the
    // extremes -32256/+32256
    assert(AudioFeatures.alaw(0x55) === -8)
    assert(AudioFeatures.alaw(0xd5) === 8)
    assert(AudioFeatures.alaw(0x2a) === -32256)
    assert(AudioFeatures.alaw(0xaa) === 32256)
    // a telephony WAV (format 7, 8-bit) decodes through the expansion
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val data = Array[Int](0xff, 0x00, 0x80, 0x7f).map(_.toByte)
    val body = "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(7) ++ le16(1) ++
      le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8) ++
      "data".getBytes ++ le32(data.length) ++ data
    val bytes = "RIFF".getBytes ++ le32(body.length) ++ body
    val Some((_, _, s)) = AudioFeatures.decodeWavPcm(bytes)
    assert(s.toSeq === Seq[Short](0, -32124, 32124, 0))
  }

  test("IEEE-float WAV (format 3): rint projection reproduces the 16-bit closed form") {
    // id % 9 == 5 overrides the % 4 cycle with 32-bit float streams;
    // 5: mono, 14: stereo (mean downmix over projected channels),
    // 32: mono at a different rate class
    for (id <- Seq(5L, 14L, 32L)) {
      assert(MediaSynth.wavExtFormat(id) === 3)
      val got = AudioFeatures.decodeWavPcm(MediaSynth.wavExt(id))
      assert(got.isDefined, s"id=$id")
      val (rate, c, samples) = got.get
      assert(rate === MediaSynth.wavExtRate(id))
      assert(c === MediaSynth.wavExtChannels(id))
      val want = (0 until MediaSynth.wavExtFrames(id)).map { i =>
        var sum = 0
        for (ch <- 0 until c) sum += MediaSynth.wavExtSample16(id, ch, i)
        (sum / c).toShort
      }
      assert(samples.toSeq === want, s"id=$id")
    }
    // NaN lanes read as silence, infinities clamp — totality, not garbage
    val base = MediaSynth.wavExt(5L)
    val m = base.clone()
    // first float sample starts at byte 44 (header is exactly 44 here)
    m(44) = 0; m(45) = 0; m(46) = 0xc0.toByte; m(47) = 0x7f.toByte // NaN
    val Some((_, _, mut)) = AudioFeatures.decodeWavPcm(m)
    // id 5 is STEREO: the NaN lane contributes silence, the intact
    // channel its closed-form sample — the mean downmix of the pair
    assert(mut(0) ===
      ((0 + MediaSynth.wavExtSample16(5L, 1, 0)) / 2).toShort)
  }

  test("24-bit PCM WAV: floor >> 8 projection reproduces the 16-bit closed form") {
    // id % 9 == 7 overrides with 24-bit PCM (s16*256 + even low byte)
    for (id <- Seq(7L, 16L, 25L)) {
      assert(MediaSynth.wavExtBits(id) === 24)
      val got = AudioFeatures.decodeWavPcm(MediaSynth.wavExt(id))
      assert(got.isDefined, s"id=$id")
      val (rate, c, samples) = got.get
      assert(rate === MediaSynth.wavExtRate(id))
      assert(c === MediaSynth.wavExtChannels(id))
      val want = (0 until MediaSynth.wavExtFrames(id)).map { i =>
        var sum = 0
        for (ch <- 0 until c) sum += MediaSynth.wavExtSample16(id, ch, i)
        (sum / c).toShort
      }
      assert(samples.toSeq === want, s"id=$id")
      // low bytes are non-trivial: the streams are NOT s16 << 8
      assert((0 until 8).exists(i => MediaSynth.wavExtLow(id, 0, i) != 0))
    }
  }

  test("non-PCM, odd-depth, truncated and fake payloads fall back to the stub") {
    val good = wav(8000, 1, Seq(Seq(1), Seq(2)))
    // non-PCM audioFormat (format 3 requires 32-bit; 16-bit floats
    // don't exist in WAV — declines)
    val nonPcm = good.clone(); nonPcm(20) = 3
    assert(AudioFeatures.decodeWavPcm(nonPcm).isEmpty)
    // unsupported depth (8/16/24 PCM decode; 20 does not)
    val deep = good.clone(); deep(34) = 20
    assert(AudioFeatures.decodeWavPcm(deep).isEmpty)
    // truncated data chunk
    assert(AudioFeatures.decodeWavPcm(good.dropRight(1)).isEmpty)
    // arbitrary bytes
    assert(AudioFeatures.decodeWavPcm("not audio at all".getBytes).isEmpty)
  }

  test("the distributed pipeline takes the real path for real WAVs, the stub for fakes") {
    import spark.implicits._
    val real = wav(8000, 1, (0 until 10).map(i => Seq(i * 100)))
    val fake = "pretend this is compressed audio".getBytes
    val rows = Seq(
      MediaRow(0L, "audio", real, "audio/wav", real.length.toLong),
      MediaRow(1L, "audio", fake, "audio/mp3", fake.length.toLong),
      MediaRow(2L, "image", real, "image/png", real.length.toLong)) // wrong kind
    val out = AudioFeatures.audioFeaturesOf(rows.toDS()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out.keySet === Set(0L, 1L), "audio rows only")
    assert(out(0L)._1 === 10L, "real decode: 10 frames, not the stub arithmetic")
    assert(out(1L) === AudioFeatures.stubFeatures(fake.length.toLong))
  }

  test("gate corpus: real rows decode the synthesized PCM exactly, fakes take the stub") {
    val out = AudioFeatures.audioFeatures(spark, sf()).collect()
    assert(out.nonEmpty)
    var nReal = 0; var nFake = 0
    out.foreach { r =>
      val id = r.getLong(0)
      assert(id % 3 === 1L, "audio kind is doc_id % 3 == 1")
      val got = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      if (MediaSynth.isReal(id)) {
        nReal += 1
        val n = MediaSynth.wavFrames(id)
        val samples = Array.tabulate(n)(i => MediaSynth.wavSample(id, i))
        assert(got === AudioFeatures.featuresOf(samples),
          s"real row $id must carry features of the exact synthesized samples")
        assert(got._1 === n.toLong)
      } else nFake += 1 // stub arithmetic checked against byte_len below
    }
    assert(nReal >= nFake && nFake > 0,
      s"gate must cross both paths: real=$nReal fake=$nFake")
    // fake rows: stub arithmetic over the text byte length, verified
    // against the media table's recorded metadata
    val lens = Multimodal.mediaTable(spark, sf()).collect()
      .map(m => m.media_id -> m.byte_len).toMap
    out.filter(r => !MediaSynth.isReal(r.getLong(0))).foreach { r =>
      val id = r.getLong(0)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        === AudioFeatures.stubFeatures(lens(id)))
    }
  }
}
