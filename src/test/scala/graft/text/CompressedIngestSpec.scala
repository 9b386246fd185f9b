package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Gzip text ingestion: roundtrip, truncation totality, the
  * decompression-bomb ceiling, non-gzip rejection, and multi-member
  * concatenation. Pure JVM — no Spark session needed. */
class CompressedIngestSpec extends AnyFunSuite {

  test("roundtrip is byte-exact, including empty and high-codepoint text") {
    for (s <- Seq("", "hello world", "a" * 100000,
      "café 你好 😀")) {
      val b = s.getBytes("UTF-8")
      assert(CompressedIngest.gunzip(CompressedIngest.gzip(b))
        .map(new String(_, "UTF-8")) === Some(s))
    }
  }

  test("truncation at every prefix length returns None, never throws") {
    val full = CompressedIngest.gzip("the quick brown fox".getBytes("UTF-8"))
    for (n <- 0 until full.length)
      assert(CompressedIngest.gunzip(full.take(n)) === None, s"prefix $n")
  }

  test("single-byte corruptions decode or decline, never throw; CRC catches payload flips") {
    val full = CompressedIngest.gzip(("lorem ipsum " * 50).getBytes("UTF-8"))
    for (i <- full.indices) {
      val m = full.clone(); m(i) = (m(i) ^ 0x11).toByte
      CompressedIngest.gunzip(m) // totality
    }
  }

  test("decompression bomb: output past the ceiling declines instead of allocating") {
    // 4 MiB of zeros compresses to ~4 KiB; a 1 KiB ceiling must refuse
    val bomb = CompressedIngest.gzip(new Array[Byte](4 * 1024 * 1024))
    assert(bomb.length < 16 * 1024, "fixture sanity: the bomb is small")
    assert(CompressedIngest.gunzip(bomb, maxLen = 1024) === None)
    assert(CompressedIngest.gunzip(bomb).isDefined, "default ceiling admits 4 MiB")
  }

  test("non-gzip bytes decline") {
    assert(CompressedIngest.gunzip("plainly not gzip".getBytes) === None)
    assert(CompressedIngest.gunzip(Array[Byte](0x1f, 0x8b.toByte)) === None)
    assert(CompressedIngest.gunzip(Array.empty[Byte]) === None)
  }

  test("concatenated members decode as the concatenated payload (WARC-slice shape)") {
    val a = CompressedIngest.gzip("first doc ".getBytes("UTF-8"))
    val b = CompressedIngest.gzip("second doc".getBytes("UTF-8"))
    assert(CompressedIngest.gunzip(a ++ b).map(new String(_, "UTF-8"))
      === Some("first doc second doc"))
  }
  test("deflate: both wild flavors (zlib-wrapped and raw) roundtrip through one sniff") {
    for (text <- Seq("", "hello deflate world", "\u00e9\u4e2d\ud83d\ude00 mixed",
        ("token " * 500).trim)) {
      val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      for (enc <- Seq(CompressedIngest.zlib(raw), CompressedIngest.rawDeflate(raw)))
        assert(CompressedIngest.inflate(enc).map(
          new String(_, java.nio.charset.StandardCharsets.UTF_8)) === Some(text))
    }
  }

  test("deflate: truncation prefixes and the bomb guard decline, never throw") {
    val raw = ("word " * 200).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    for (enc <- Seq(CompressedIngest.zlib(raw), CompressedIngest.rawDeflate(raw))) {
      for (n <- 0 until enc.length) {
        val got = CompressedIngest.inflate(enc.take(n))
        // a prefix either declines or (raw-retry pathology) yields
        // SOMETHING -- it must never equal the full payload or throw
        assert(got.forall(_.length < raw.length), s"prefix $n")
      }
      assert(CompressedIngest.inflate(enc, maxLen = 10) === None, "bomb guard")
    }
  }


  test("decodeAny: one sniff dispatches gzip/zstd/lz4/framed-snappy/deflate") {
    val data = ("sniff me " * 50).getBytes
    val shapes = Seq(
      "gzip" -> CompressedIngest.gzip(data),
      "zstd" -> Zstd.compress(data),
      "lz4" -> Lz4.compress(data),
      "snappy-framed" -> Snappy.compressFramed(data),
      "zlib" -> CompressedIngest.zlib(data),
      "raw-deflate" -> CompressedIngest.rawDeflate(data))
    for ((name, payload) <- shapes) {
      val got = CompressedIngest.decodeAny(payload)
      assert(got.isDefined, s"$name must sniff-decode")
      assert(java.util.Arrays.equals(got.get, data), s"$name content")
    }
    // a leading skippable frame still lands on the right codec
    def skippable(magic: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le32(v: Long): Unit =
        for (i <- 0 until 4) out.write(((v >> (8 * i)) & 0xff).toInt)
      le32(magic); le32(4L); out.write(Array[Byte](1, 2, 3, 4), 0, 4)
      out.toByteArray
    }
    assert(java.util.Arrays.equals(
      CompressedIngest.decodeAny(skippable(0x184d2a53L) ++ Zstd.compress(data)).get, data))
    assert(java.util.Arrays.equals(
      CompressedIngest.decodeAny(skippable(0x184d2a51L) ++ Lz4.compress(data)).get, data))
    assert(CompressedIngest.decodeAny("garbage bytes that are nothing".getBytes).isEmpty)
  }
}
