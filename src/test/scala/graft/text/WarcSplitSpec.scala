package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** WARC shard → slice splitting by RFC 1952 gzip member boundaries:
  * shard-parse ≡ concatenated per-slice parse, all optional header
  * fields (FEXTRA/FNAME/FCOMMENT/FHCRC) handled, trailers verified,
  * strictness under truncation and corruption. */
class WarcSplitSpec extends AnyFunSuite {

  private def record(i: Int): (Seq[(String, String)], Array[Byte]) =
    Seq("WARC-Type" -> "resource",
      "WARC-Target-URI" -> s"https://example.org/r/$i") ->
      (s"payload $i " * (i + 1)).getBytes("UTF-8")

  private def shard(n: Int): Array[Byte] =
    Warc.write((0 until n).map(record), gzipPerRecord = true)

  test("member bounds tile the shard exactly; slices parse ≡ whole parse") {
    for (n <- Seq(1, 3, 7)) {
      val b = shard(n)
      val bounds = Warc.memberBounds(b)
      assert(bounds.isDefined, s"n=$n")
      assert(bounds.get.length === n)
      // bounds tile [0, length) with no gaps or overlap
      var expect = 0
      for ((off, len) <- bounds.get) {
        assert(off === expect); assert(len > 0); expect = off + len
      }
      assert(expect === b.length)
      // the equivalence the splitter exists for
      val whole = Warc.records(b).get
      val viaSlices = Warc.memberSlices(b).get.flatMap(s => Warc.records(s).get)
      assert(whole.map(_.targetUri) === viaSlices.map(_.targetUri))
      assert(whole.map(_.block.toSeq) === viaSlices.map(_.block.toSeq))
    }
  }

  /** Hand-assemble a gzip member with the optional header fields the
    * JDK writer never emits (FNAME + FCOMMENT + FEXTRA + FHCRC). */
  private def fancyMember(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x1f); out.write(0x8b); out.write(8)
    out.write(2 | 4 | 8 | 16) // FHCRC | FEXTRA | FNAME | FCOMMENT
    for (_ <- 0 until 6) out.write(0) // mtime/xfl/os
    out.write(4); out.write(0) // XLEN = 4
    out.write(Array[Byte]('A', 'B', 2, 7)) // extra field
    out.write("name.warc".getBytes); out.write(0)
    out.write("a comment".getBytes); out.write(0)
    // FHCRC: crc16 of the header so far
    val crc = new java.util.zip.CRC32
    crc.update(out.toByteArray)
    out.write((crc.getValue & 0xff).toInt)
    out.write(((crc.getValue >> 8) & 0xff).toInt)
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(payload); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val pcrc = new java.util.zip.CRC32
    pcrc.update(payload)
    def le32(v: Long): Unit =
      for (i <- 0 until 4) out.write(((v >> (8 * i)) & 0xff).toInt)
    le32(pcrc.getValue); le32(payload.length.toLong)
    out.toByteArray
  }

  test("optional gzip header fields (FEXTRA/FNAME/FCOMMENT/FHCRC) are walked") {
    val rec = Warc.write(Seq(record(0)), gzipPerRecord = false)
    val plain = CompressedIngest.gzip(rec)
    val fancy = fancyMember(rec)
    val b = plain ++ fancy ++ plain
    val bounds = Warc.memberBounds(b)
    assert(bounds.isDefined && bounds.get.length === 3)
    assert(bounds.get(1) === ((plain.length, fancy.length)))
    // the fancy slice still parses as a WARC record
    val slice = Warc.memberSlices(b).get(1)
    assert(Warc.records(slice).get.head.targetUri === "https://example.org/r/0")
  }

  test("strictness: truncation yields None or a clean member-boundary prefix") {
    val b = shard(4)
    val bounds = Warc.memberBounds(b).get
    val boundarySet = bounds.map { case (off, len) => off + len }.toSet
    for (n <- 0 until b.length) {
      Warc.memberBounds(java.util.Arrays.copyOf(b, n)) match {
        case None => // a partial member must not pass
        case Some(got) =>
          // only an exact member boundary may parse — and then it is
          // exactly the complete leading members
          assert(boundarySet.contains(n), s"prefix $n accepted off-boundary")
          assert(got === bounds.takeWhile { case (o, l) => o + l <= n })
      }
    }
  }

  test("corruption: trailer CRC/ISIZE flips and reserved FLG bits decline") {
    val b = shard(2)
    val (off, len) = Warc.memberBounds(b).get.head
    // flip a byte in the first member's CRC32 trailer
    val m1 = b.clone(); m1(off + len - 6) = (m1(off + len - 6) ^ 0x5a).toByte
    assert(Warc.memberBounds(m1) === None)
    // flip a byte in ISIZE
    val m2 = b.clone(); m2(off + len - 2) = (m2(off + len - 2) ^ 0x5a).toByte
    assert(Warc.memberBounds(m2) === None)
    // reserved FLG bit
    val m3 = b.clone(); m3(3) = (m3(3) | 0x20).toByte
    assert(Warc.memberBounds(m3) === None)
    // non-gzip and empty inputs
    assert(Warc.memberBounds("not gzip at all".getBytes) === None)
    assert(Warc.memberBounds(Array.empty[Byte]) === None)
  }

  test("single-byte corruption anywhere declines or re-tiles, never throws") {
    val b = shard(2)
    for (i <- b.indices) {
      val m = b.clone(); m(i) = (m(i) ^ 0x11).toByte
      Warc.memberBounds(m) // totality
    }
  }
}
