package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** FLAC decoder: writer→decoder LOSSLESS roundtrip across subframe
  * types (CONSTANT/VERBATIM/FIXED/LPC), channel assignments
  * (independent, left/side, right/side, mid/side), wasted bits,
  * Rice/Rice2/escape residuals, blocking strategies and header code
  * variants; CRC-8/CRC-16 rejection; the lossless re-encode twin;
  * and totality. Pure JVM — no Spark session needed. */
class FlacSpec extends AnyFunSuite {

  private def expectedMix(id: Long): Seq[Short] = {
    val c = MediaSynth.flacChannels(id)
    val n = MediaSynth.flacFrames(id)
    (0 until n).map { i =>
      var sum = 0
      for (ch <- 0 until c) sum += MediaSynth.flacEffSample(id, ch, i)
      (sum / c).toShort
    }
  }

  test("writer->decoder roundtrip is sample-exact across the corpus classes") {
    // 5 * 2 * 13 * 11 interplay: 0..129 covers every class combo the
    // corpus cycles (constant blocks, wasted bits, variable blocking,
    // stereo assignments, both residual methods, escapes)
    for (id <- 0L until 130L) {
      val got = Flac.decodePcm(MediaSynth.flac(id))
      assert(got.isDefined, s"id=$id")
      val (rate, ch, samples) = got.get
      assert(rate === MediaSynth.flacRate(id), s"id=$id rate")
      assert(ch === MediaSynth.flacChannels(id), s"id=$id channels")
      assert(samples.toSeq === expectedMix(id), s"id=$id samples")
    }
  }

  test("FIXED order 4 (decoder-only corpus path) roundtrips via the forced encoder") {
    // mono docs only (side channels could push F4 residuals past the
    // escape range); seed 4 keeps (seed+b) % 7 off the escape class
    for (id <- Seq(8L, 20L, 64L)) {
      assert(MediaSynth.flacChannels(id) === 1)
      val got = Flac.decodePcm(MediaSynth.flacOf(id, 4, forceTpe = 6))
      assert(got.isDefined, s"id=$id")
      assert(got.get._3.toSeq === expectedMix(id), s"id=$id")
    }
  }

  test("lossless re-encode: a different seed changes every byte region but no sample") {
    for (id <- Seq(0L, 1L, 2L, 7L, 32L, 58L)) {
      val a = MediaSynth.flacOf(id, id.toInt)
      val b = MediaSynth.flacOf(id, id.toInt + 3)
      assert(!java.util.Arrays.equals(a, b), s"id=$id streams must differ")
      val da = Flac.decodePcm(a).map(t => (t._1, t._2, t._3.toSeq))
      val db = Flac.decodePcm(b).map(t => (t._1, t._2, t._3.toSeq))
      assert(da.isDefined && da === db, s"id=$id")
      // and the fingerprints collide exactly (the dedup property)
      assert(AudioDedup.clipHash(a) === AudioDedup.clipHash(b), s"id=$id")
    }
  }

  test("CRC-8 catches a corrupted frame header; CRC-16 a corrupted subframe byte") {
    val bytes = MediaSynth.flac(9L)
    // locate the first frame: after fLaC(4) + header(4) + STREAMINFO(34)
    val frame = 42
    assert(((bytes(frame) & 0xff) << 6 | (bytes(frame + 1) & 0xff) >> 2)
      === 0x3ffe, "frame sync where expected")
    val m1 = bytes.clone()
    m1(frame + 2) = (m1(frame + 2) ^ 0x10).toByte // header field
    assert(Flac.decodePcm(m1) === None)
    val m2 = bytes.clone()
    m2(frame + 12) = (m2(frame + 12) ^ 0x01).toByte // subframe region
    assert(Flac.decodePcm(m2) === None)
  }

  test("corrupting any single byte either decodes or returns None, never throws") {
    for (id <- Seq(4L, 6L, 15L, 17L)) { // wasted-bits + variable classes
      val bytes = MediaSynth.flac(id)
      for (i <- bytes.indices) {
        val mut = bytes.clone(); mut(i) = (mut(i) ^ 0x40).toByte
        Flac.decodePcm(mut) // totality
      }
    }
  }

  test("truncation at every prefix length returns None, never throws") {
    // STREAMINFO declares the total sample count, so ANY truncated
    // prefix is an incomplete stream — None, unlike the WebP pad case
    val bytes = MediaSynth.flac(13L)
    for (n <- 0 until bytes.length)
      assert(Flac.decodePcm(bytes.take(n)) === None, s"prefix $n")
  }

  test("clipHash dispatch: FLAC payloads take the real sample path, not the stub") {
    val bytes = MediaSynth.flac(8L)
    val wav = {
      // the same mean-downmixed samples as a PCM WAV must fingerprint
      // IDENTICALLY — the hash is over samples, not bytes
      val Some((rate, _, samples)) = Flac.decodePcm(bytes)
      val out = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      out.write("RIFF".getBytes); le32(36 + samples.length * 2)
      out.write("WAVE".getBytes); out.write("fmt ".getBytes); le32(16)
      le16(1); le16(1); le32(rate); le32(rate * 2); le16(2); le16(16)
      out.write("data".getBytes); le32(samples.length * 2)
      samples.foreach(s => le16(s & 0xffff))
      out.toByteArray
    }
    assert(AudioDedup.clipHash(bytes) === AudioDedup.clipHash(wav))
    // near-dup fixture: re-encoded twins collide, truncated rows stub
    assert(AudioDedup.clipHash(Flac.dedupPayload(8L))
      === AudioDedup.clipHash(Flac.dedupPayload(9L)))
    assert(Flac.decodePcm(Flac.dedupPayload(5L)) === None) // 5 % 9 == 5
  }

  test("unsupported shapes decline: >24-bit streams, bad sync, empty") {
    assert(Flac.decodePcm(Array.emptyByteArray) === None)
    assert(Flac.decodePcm("fLaC".getBytes) === None)
    // patch STREAMINFO bps-1 from 15 to 31 (32-bit): documented None
    // (id 3 is a 16-bit doc — 3 % 7 != 2)
    val bytes = MediaSynth.flac(3L)
    val m = bytes.clone()
    // bps-1 is 5 bits straddling bytes 20-21 of the stream
    // (fLaC(4) + hdr(4) + 10 bytes sizes + 20 bits rate + 3 bits ch):
    // rate(20)+ch(3) end 7 bits into byte 20; bps-1's top bit is the
    // last bit of byte 20, low 4 bits the top of byte 21
    m(20) = (m(20) | 0x01).toByte // was 0 (15 = 0b01111), make 0b11111=31 -> bps 32
    assert(Flac.decodePcm(m) === None)
  }

  test("24-bit class (r14 ask #7): real 24-bit streams project exactly into the 16-bit domain") {
    // id % 7 == 2 docs carry true 24-bit streams whose samples are
    // s16 * 256 + an even non-trivial low byte; the decoder's
    // per-channel >> 8 projection must reproduce the 16-bit closed
    // form, so expectedMix (the fingerprint-domain oracle) holds
    // unchanged. ids cross mono (16), stereo (9, 23), the
    // wasted-bits interplay (58 = 6 mod 13), variable blocking
    // (37 = 4 mod 11) and a constant-block doc (100 = 0 mod 5).
    for (id <- Seq(2L, 9L, 16L, 23L, 37L, 58L, 100L)) {
      assert(MediaSynth.flacBps(id) === 24, s"id=$id must be 24-bit")
      // low byte non-trivial: the raw stream samples are NOT s16<<8
      assert((0 until 8).exists(i => MediaSynth.flacLow(id, 0, i) != 0))
      val bytes = MediaSynth.flac(id)
      val got = Flac.decodePcm(bytes)
      assert(got.isDefined, s"id=$id")
      val (rate, ch, samples) = got.get
      assert(rate === MediaSynth.flacRate(id))
      assert(ch === MediaSynth.flacChannels(id))
      assert(samples.toSeq === expectedMix(id), s"id=$id projection")
      // lossless re-encode twin still collides at Hamming 0
      val twin = MediaSynth.flacOf(id, id.toInt + 3)
      assert(!java.util.Arrays.equals(bytes, twin))
      assert(AudioDedup.clipHash(bytes) === AudioDedup.clipHash(twin))
    }
  }
}
