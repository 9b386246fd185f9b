package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Baseline TIFF decoder: writer→decoder roundtrip across byte
  * orders, photometric classes (BlackIsZero / RGB / RGBA / palette /
  * WhiteIsZero), PackBits (incl. the -128 no-op), multi-strip
  * layouts, the profile boundary, and totality. Pure JVM. */
class TiffSpec extends AnyFunSuite {

  test("writer->decoder roundtrip is pixel-exact across byte orders and photometric classes") {
    // 48 ids = 12 cycles of the %4 photometric classes under both
    // byte orders, both compressions, the RGBA half, the no-op class
    for (id <- 0L until 48L) {
      val got = Tiff.decodePixels(MediaSynth.tiff(id))
      assert(got.isDefined, s"id=$id pm=${MediaSynth.tiffPhotometric(id)}")
      val (w, h, px) = got.get
      assert((w, h) === ((MediaSynth.tiffW(id), MediaSynth.tiffH(id))), s"id=$id")
      for (y <- 0 until h; x <- 0 until w) {
        val g = MediaSynth.tiffGray(id, x, y)
        val p = px(y * w + x)
        val (er, eg, eb) = MediaSynth.tiffPhotometric(id) match {
          case 0 | 1 => (g, g, g)
          case _ => (g, (g + 85) % 256, (g + 170) % 256)
        }
        val ea = if (id % 8 == 1) (g + 31) % 256 else 255
        assert(((p >>> 24), (p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
          === ((ea, er, eg, eb)),
          s"id=$id px($x,$y) pm=${MediaSynth.tiffPhotometric(id)}")
      }
    }
  }

  test("PackBits 0x80 control is a no-op per TIFF 6.0 (hand-built strip; the JDK disagrees, so the writer never emits it)") {
    // 4x2 gray, one PackBits strip: [noop][repeat 10 x4][noop]
    // [literal 20 30 40 50]
    val strip = Array[Byte](-128, -3, 10, -128, 3, 20, 30, 40, 50)
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    out.write('I'); out.write('I'); w16(42)
    val ifdOff = 8 + strip.length + (strip.length & 1)
    w32(ifdOff)
    out.write(strip, 0, strip.length)
    if ((strip.length & 1) == 1) out.write(0)
    val entries = Seq( // (tag, type, count, inlineValue)
      (256, 3, 1, 4), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 32773),
      (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 3, 1, 2),
      (279, 4, 1, strip.length), (284, 3, 1, 1))
    w16(entries.length)
    entries.foreach { case (tag, tpe, count, v) =>
      w16(tag); w16(tpe); w32(count)
      if (tpe == 3) { w16(v); w16(0) } else w32(v)
    }
    w32(0)
    val Some((w, h, px)) = Tiff.decodePixels(out.toByteArray)
    assert((w, h) === ((4, 2)))
    assert(px.map(_ & 0xff).toSeq === Seq(10, 10, 10, 10, 20, 30, 40, 50))
  }

  test("truncation at every prefix length returns None, never throws") {
    for (id <- Seq(1L, 4L)) { // PackBits+MM and none+II classes
      val bytes = MediaSynth.tiff(id)
      for (n <- 0 until bytes.length)
        assert(Tiff.decodePixels(bytes.take(n)) === None, s"id=$id prefix $n")
    }
  }

  test("corrupting any single byte either decodes or returns None, never throws") {
    for (id <- Seq(0L, 1L, 2L, 3L)) {
      val bytes = MediaSynth.tiff(id)
      for (i <- bytes.indices) {
        val mut = bytes.clone(); mut(i) = (mut(i) ^ 0x40).toByte
        Tiff.decodePixels(mut) // totality
      }
    }
  }

  test("LZW roundtrip: corpus classes decode pixel-exact, with and without the predictor") {
    // id % 3 == 2 docs are LZW; id % 6 == 2 adds horizontal
    // differencing (tag 317 = 2) — both must reproduce the same
    // closed-form pixels as their uncompressed twins
    for (id <- Seq(2L, 5L, 8L, 11L, 14L, 17L, 20L, 23L, 26L, 38L, 44L)) {
      assert(id % 3 === 2)
      val got = Tiff.decodePixels(MediaSynth.tiff(id))
      assert(got.isDefined, s"id=$id")
      val (w, h, px) = got.get
      assert((w, h) === ((MediaSynth.tiffW(id), MediaSynth.tiffH(id))))
      // gray/palette/WhiteIsZero classes: green channel carries the
      // derivation of the closed-form gray; check a full-pixel probe
      // against the uncompressed same-photometric twin id' = id + 3k
      // with identical (w, h)? Simpler: decode is self-consistent
      // with the photometric derivation below
      for (y <- 0 until h; x <- 0 until w) {
        val g = MediaSynth.tiffGray(id, x, y)
        val want = MediaSynth.tiffPhotometric(id) match {
          case 0 | 1 => 0xff000000 | (g << 16) | (g << 8) | g
          case 3 => 0xff000000 | (g << 16) | (((g + 85) % 256) << 8) |
            ((g + 170) % 256)
          case _ =>
            val a = if (id % 8 == 1) (g + 31) % 256 else 255
            (a << 24) | (g << 16) | (((g + 85) % 256) << 8) |
              ((g + 170) % 256)
        }
        assert(px(y * w + x) === want, s"id=$id ($x,$y)")
      }
    }
  }

  test("LZW strip codec: every width boundary (9-12), the early change, and the 4094 Clear") {
    // pseudo-random bytes build ~1 dictionary entry per input byte:
    // 12k bytes cross 511 -> 1023 -> 2047 (early-change bumps) and
    // the 4094-entry Clear/reset, then keep going on a fresh table
    var seed = 12345L
    val raw = Array.fill(12288) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) & 0xff).toByte
    }
    val enc = MediaSynth.tiffLzw(raw)
    assert(enc.length > 0 && enc.length < raw.length * 2)
    val dst = new Array[Byte](raw.length)
    val got = Tiff.lzwStrip(enc, 0, enc.length, dst, 0, dst.length)
    assert(got === raw.length)
    assert(dst.toSeq === raw.toSeq)
    // and a high-redundancy stream (long runs -> deep chains + the
    // self-referential code case)
    val runs = Array.tabulate(4096)(i => ((i / 97) & 0xff).toByte)
    val enc2 = MediaSynth.tiffLzw(runs)
    assert(enc2.length < runs.length / 2, "runs must actually compress")
    val dst2 = new Array[Byte](runs.length)
    assert(Tiff.lzwStrip(enc2, 0, enc2.length, dst2, 0,
      dst2.length) === runs.length)
    assert(dst2.toSeq === runs.toSeq)
  }

  test("LZW flush at the early-change boundary: every stream length 1-600 roundtrips (code-review r15)") {
    // the decoder performs one phantom add while processing the FLUSH
    // code; when that add lands exactly on the 510/1022/2046 boundary
    // the EOI must be written one bit wider. Sweeping lengths crosses
    // the exact boundary strips the old encoder desynced on.
    var seed = 424242L
    def rnd(): Byte = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) & 0xff).toByte
    }
    for (len <- 1 to 600) {
      val raw = Array.fill(len)(rnd())
      val enc = MediaSynth.tiffLzw(raw)
      val dst = new Array[Byte](len)
      assert(Tiff.lzwStrip(enc, 0, enc.length, dst, 0, len) === len,
        s"len=$len")
      assert(dst.toSeq === raw.toSeq, s"len=$len")
    }
  }

  test("profile boundary: JPEG-in-TIFF/planar-3/bilevel decline; imageHash dispatches TIFF") {
    val base = MediaSynth.tiff(0L) // II, uncompressed gray
    // patch the Compression entry (tag 259) to LZW (5): entries are
    // 12 bytes from IFD+2; find the tag by scan
    def patched(tag: Int, newVal: Int): Array[Byte] = {
      val m = base.clone()
      def u16(p: Int): Int = (m(p) & 0xff) | ((m(p + 1) & 0xff) << 8)
      val ifd = (m(4) & 0xff) | ((m(5) & 0xff) << 8) |
        ((m(6) & 0xff) << 16) | ((m(7) & 0xff) << 24)
      val n = u16(ifd)
      for (e <- 0 until n) {
        val p = ifd + 2 + e * 12
        if (u16(p) == tag) { m(p + 8) = (newVal & 0xff).toByte
          m(p + 9) = ((newVal >> 8) & 0xff).toByte }
      }
      m
    }
    assert(Tiff.decodePixels(patched(259, 7)) === None, "JPEG-in-TIFF declines")
    // compression 5 over UNCOMPRESSED strip bytes is a malformed LZW
    // stream: None, never a throw (raw gray bytes read as codes)
    assert(Tiff.decodePixels(patched(259, 5)) === None)
    // planar-2 on a SINGLE-sample image is planar-1 by definition
    // (TIFF 6.0: the field is irrelevant when spp = 1) — still decodes
    assert(Tiff.decodePixels(patched(284, 2)).isDefined)
    assert(Tiff.decodePixels(patched(284, 3)) === None, "planar-3 declines")
    assert(Tiff.decodePixels(patched(258, 1)) === None, "bilevel declines")
    assert(Tiff.decodePixels(base).isDefined, "patch harness sanity")
    // dispatch: the TIFF path feeds the real aHash, not the stub
    val Some((w, h, px)) = Tiff.decodePixels(base)
    assert(ImageDedup.imageHash(base) === ImageDedup.aHash64(w, h, px).get)
  }
}
