package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** LZ4 codec vs the REFERENCE implementation (lz4-java, on the Spark
  * classpath): their frames through our decoder byte-exact, our
  * frames through their LZ4FrameInputStream — both directions, over
  * randomized payload shapes — plus block-level differentials,
  * skippable/multi-frame handling, checksum rejection and totality. */
class Lz4Spec extends AnyFunSuite {

  private def lcg(n: Int, seed0: Long = 777L): Array[Byte] = {
    var x = seed0
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) & 0xff).toByte
    }
  }

  private def payloads: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "tiny" -> "lz4!".getBytes,
    "fox" -> ("the quick brown fox jumps over the lazy dog. " * 120).getBytes,
    "rand" -> lcg(9000),
    "period" -> Array.tabulate(20000)(i => ((i * 5) % 26 + 97).toByte),
    "big" -> ("abcdefgh" * 30000).getBytes, // crosses the 64 KiB block size
    "words" -> (0 until 4000).map(i => "w" + (i % 41) + " ").mkString.getBytes)

  private def foreignFrame(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val os = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
    os.write(data); os.close()
    bos.toByteArray
  }

  private def foreignDecode(z: Array[Byte]): Array[Byte] = {
    val is = new net.jpountz.lz4.LZ4FrameInputStream(
      new java.io.ByteArrayInputStream(z))
    try is.readAllBytes() finally is.close()
  }

  test("reference frames (lz4-java) decode byte-exact") {
    for ((name, data) <- payloads) {
      val got = Lz4.decompress(foreignFrame(data))
      assert(got.isDefined, s"$name must decode")
      assert(java.util.Arrays.equals(got.get, data), s"$name content")
    }
  }

  test("our frames decode byte-exact under the reference LZ4FrameInputStream") {
    for ((name, data) <- payloads) {
      val ours = Lz4.compress(data)
      assert(java.util.Arrays.equals(Lz4.decompress(ours).get, data),
        s"$name self roundtrip")
      assert(java.util.Arrays.equals(foreignDecode(ours), data),
        s"$name: reference decoder disagrees on our frame")
    }
  }

  test("block-level differential: reference-compressed blocks decode; randomized shapes") {
    val factory = net.jpountz.lz4.LZ4Factory.fastestJavaInstance()
    for (i <- 0 until 40) {
      val data = (i % 3) match {
        case 0 => lcg(64 + i * 131, i + 1L)
        case 1 => Array.tabulate(300 + i * 53)(k => ((k * (1 + i % 5)) % 26 + 97).toByte)
        case _ => (0 until 100 + i * 7).map(k => "s" + ((k + i) % 29)).mkString(" ").getBytes
      }
      // wrap the reference BLOCK in a minimal frame of our own header
      // shape by decoding through the reference frame writer instead:
      // (block-only APIs carry no framing, so differential through
      // the frame pair again at randomized shapes + high compression)
      val hc = factory.highCompressor()
      val max = factory.fastCompressor().maxCompressedLength(data.length)
      val buf = new Array[Byte](max)
      val clen = hc.compress(data, 0, data.length, buf, 0, max)
      val out = new Array[Byte](data.length)
      // sanity: reference roundtrip (keeps the differential honest)
      factory.fastDecompressor().decompress(buf, 0, out, 0, data.length)
      assert(java.util.Arrays.equals(out, data))
      // our FRAME path over the same data survives the reference reader
      assert(java.util.Arrays.equals(foreignDecode(Lz4.compress(data)), data))
      // and reference frames at this shape decode under us
      assert(java.util.Arrays.equals(
        Lz4.decompress(foreignFrame(data)).get, data))
    }
  }

  test("skippable frames and multi-frame concatenation") {
    def skippable(n: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le32(v: Long): Unit =
        for (i <- 0 until 4) out.write(((v >> (8 * i)) & 0xff).toInt)
      le32(0x184d2a51L); le32(n)
      for (i <- 0 until n) out.write(i)
      out.toByteArray
    }
    val a = Lz4.compress("first frame ".getBytes)
    val b = Lz4.compress("second".getBytes)
    val got = Lz4.decompress(skippable(4) ++ a ++ skippable(0) ++ b)
    assert(got.isDefined)
    assert(new String(got.get) === "first frame second")
  }

  test("checksums: flipped content and header bytes are caught") {
    val z = Lz4.compress(lcg(5000))
    var caught = 0; var total = 0
    val stride = math.max(1, z.length / 97)
    var p = 4 // past magic (a flipped magic is trivially None)
    while (p < z.length) {
      val m = z.clone(); m(p) = (m(p) ^ 0x21).toByte
      total += 1
      Lz4.decompress(m) match {
        case None => caught += 1
        case Some(out) => // a surviving flip must still be the truth
          assert(java.util.Arrays.equals(out, Lz4.decompress(z).get),
            s"flip@$p silently corrupted the payload")
      }
      p += stride
    }
    assert(caught > total * 3 / 4, s"checksums must catch most flips: $caught/$total")
  }

  test("truncation at every prefix length returns None, never throws") {
    val z = Lz4.compress(("prefix " * 400).getBytes)
    for (n <- 0 until z.length)
      assert(Lz4.decompress(java.util.Arrays.copyOf(z, n)).isEmpty, s"prefix $n")
  }

  test("random blobs, magic-prefixed garbage and the legacy magic are total") {
    val magic = Array[Byte](0x04, 0x22, 0x4d, 0x18)
    val legacy = Array[Byte](0x02, 0x21, 0x4c, 0x18)
    for (i <- 0 until 150) {
      val blob = lcg(1 + (i * 89) % 512, i + 3L)
      Lz4.decompress(blob)
      Lz4.decompress(magic ++ blob)
      assert(Lz4.decompress(legacy ++ blob).isEmpty, "legacy format is the documented None")
    }
  }

  test("a corrupt block never reads past its declared end (code-review r15)") {
    // hand-built frame, NO checksums/content-size: one block whose
    // last token declares a match but truncates before the full
    // offset — the old decoder consumed the EndMark bytes as the
    // offset and returned garbage; it must be None
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit =
      for (i <- 0 until 4) out.write(((v >> (8 * i)) & 0xff).toInt)
    le32(0x184d2204L)
    val hdr = Array[Byte](0x60, 0x40) // v01 + independent, 64 KiB
    out.write(hdr, 0, 2)
    out.write(((Xxh32.hash(hdr, 0, 2, 0) >>> 8) & 0xff).toInt)
    le32(3L) // compressed block, 3 bytes
    out.write(0x14); out.write('A'); out.write(0x05) // truncated match
    le32(0L) // EndMark
    assert(Lz4.decompress(out.toByteArray).isEmpty)
  }

  test("bomb guard and XXH32 vectors") {
    assert(Lz4.decompress(Lz4.compress(("x" * 100000).getBytes),
      maxLen = 1024).isEmpty)
    // known XXH32 vectors (seed 0): empty and 'a' (public test values)
    assert(Xxh32.hash(Array.emptyByteArray, 0, 0, 0) === 0x02cc5d05L)
    assert(Xxh32.hash("a".getBytes, 0, 1, 0) === 0x550d7456L)
  }
}
