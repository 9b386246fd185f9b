package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** WebP/VP8L decoder: writer→decoder roundtrip exactness across the
  * seven corpus variants (plain, subtract-green, palette,
  * cache+LZ77, predictor, color transform, meta prefix codes),
  * sub-byte palette bundling, the generatively derived 2D
  * distance-code table pinned against the spec's published prefix,
  * all 14 predictor modes, the lossy-VP8 boundary, and totality.
  * Pure JVM — no Spark session needed. */
class WebpSpec extends AnyFunSuite {

  private def expected(id: Long): (Int, Int, Seq[Int]) = {
    val w = MediaSynth.webpW(id); val h = MediaSynth.webpH(id)
    (w, h,
      Array.tabulate(h, w)((y, x) => MediaSynth.webpPixel(id, x, y))
        .flatten.toSeq)
  }

  test("writer->decoder roundtrip is pixel-exact across all seven variants") {
    // 140 ids = 20 full variant cycles, all (w, h) classes
    for (id <- 0L until 140L) {
      val got = Webp.decodePixels(MediaSynth.webp(id))
      assert(got.isDefined, s"id=$id v=${MediaSynth.webpVariant(id)}")
      val (w, h, want) = expected(id)
      val (dw, dh, px) = got.get
      assert((dw, dh) === ((w, h)), s"id=$id dims")
      assert(px.toSeq === want, s"id=$id v=${MediaSynth.webpVariant(id)}")
    }
  }

  test("2D distance codes: the derived table matches the spec's published prefix") {
    // RFC 9649's distance-mapping list begins (0,1),(1,0),(1,1),
    // (-1,1),(0,2),(2,0),(1,2),(-1,2),(2,1),(-2,1),(2,2),(-2,2),
    // (0,3),(3,0) — codes 1..14; a drifted sort rule cannot pass
    val want = Seq((0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
      (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0))
    assert(Webp.PlaneCodes.take(14).toSeq === want)
    assert(Webp.PlaneCodes.length === 120)
    assert(Webp.PlaneCodes.distinct.length === 120)
    // every offset maps to a positive linear distance at any width
    for ((dx, dy) <- Webp.PlaneCodes; w <- Seq(8, 64))
      assert(math.max(1, dy * w + dx) >= 1)
  }

  test("transform size_bits field carries (blockBits - 2) in the raw bitstream (ADVICE r14)") {
    // RFC 9649 §4.1/§4.2: `size_bits = ReadBits(3); block_size =
    // 1 << (size_bits + 2)` — the field stores (bits - 2), NOT the
    // (bits - 3) bias both sides carried through r14 (an encoder+
    // decoder pair that drift TOGETHER still roundtrip, so this pin
    // reads the raw bits with its own LSB reader, independent of
    // Webp.Br and MediaSynth.BitW). Variants 4 (predictor) and 5
    // (color transform) both encode 8-px blocks (bits = 3).
    for (variant <- Seq(4, 5)) {
      val bytes = MediaSynth.webpOf(24, 16, variant, 7,
        (x, y) => 0xff000000 | ((x * 31 + y * 57) % 256) << 8)
      // RIFF(12) + "VP8L" + size(8) = 20-byte offset to the 0x2f tag
      assert(bytes(20) === 0x2f.toByte)
      var pos = 21 * 8 // bit cursor, LSB-first within each byte
      def rd(n: Int): Int = {
        var v = 0
        for (i <- 0 until n) {
          v |= ((bytes(pos >> 3) >> (pos & 7)) & 1) << i
          pos += 1
        }
        v
      }
      assert(rd(14) === 23, "width-1")
      assert(rd(14) === 15, "height-1")
      rd(1); assert(rd(3) === 0, "version")
      assert(rd(1) === 1, "transform present")
      assert(rd(2) === (if (variant == 4) 0 else 1), "transform type")
      assert(rd(3) === 3 - 2,
        s"variant $variant: size_bits field must store blockBits - 2")
    }
  }

  test("all 14 predictor modes roundtrip on a multi-block image") {
    // 40x24 with 8-px blocks = 5x3 = 15 blocks -> every mode appears
    val w = 40; val h = 24
    val pix = (x: Int, y: Int) =>
      0xff000000 | (((x * 37 + y * 11) % 256) << 16) |
        (((x * 5 + y * 73) % 256) << 8) | ((x * 97 + y * 3) % 256)
    val bytes = MediaSynth.webpOf(w, h, 4, 0, pix)
    val Some((dw, dh, px)) = Webp.decodePixels(bytes)
    assert((dw, dh) === ((w, h)))
    for (y <- 0 until h; x <- 0 until w)
      assert(px(y * w + x) === pix(x, y), s"($x,$y)")
  }

  test("color transform: per-block elements roundtrip exactly") {
    val w = 33; val h = 17
    val pix = (x: Int, y: Int) =>
      0xff000000 | (((x * 7 + y * 31) % 256) << 16) |
        (((x * 13 + y * 3) % 256) << 8) | ((x * 61 + y * 19) % 256)
    for (seed <- Seq(0, 5, 77)) {
      val Some((dw, dh, px)) =
        Webp.decodePixels(MediaSynth.webpOf(w, h, 5, seed, pix))
      assert((dw, dh) === ((w, h)))
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) === pix(x, y), s"seed=$seed ($x,$y)")
    }
  }

  test("cache+LZ77 variant really emits refs and cache hits (stream shrinks; constant image runs)") {
    // the plateaued variant-3 pixels must compress: the same pixels
    // encoded literal-only (variant 0) are strictly longer — the
    // proof that backrefs/cache symbols are actually in the stream
    // (and therefore that the decoder's LZ77/cache branches are on
    // the gate path, not dead code)
    for (id <- Seq(3L, 10L, 17L, 31L)) {
      assert(MediaSynth.webpVariant(id) === 3, s"id=$id")
      val w = MediaSynth.webpW(id); val h = MediaSynth.webpH(id)
      val pix = (x: Int, y: Int) => MediaSynth.webpPixel(id, x, y)
      val withRefs = MediaSynth.webpOf(w, h, 3, id.toInt, pix)
      val literal = MediaSynth.webpOf(w, h, 0, id.toInt, pix)
      assert(withRefs.length < literal.length,
        s"id=$id: ${withRefs.length} !< ${literal.length}")
      val a = Webp.decodePixels(withRefs).map(t => (t._1, t._2, t._3.toSeq))
      val b = Webp.decodePixels(literal).map(t => (t._1, t._2, t._3.toSeq))
      assert(a.isDefined && a === b, s"id=$id")
    }
    // a constant image through variant 3: one literal + one long run
    val const = MediaSynth.webpOf(16, 12, 3, 0, (_, _) => 0xff204060)
    val Some((w, h, px)) = Webp.decodePixels(const)
    assert((w, h) === ((16, 12)))
    assert(px.forall(_ == 0xff204060))
    // one literal + one 191-px run + code tables + RIFF overhead:
    // anything near the 192-literal size (~700 B) means no run fired
    assert(const.length < 120, s"constant image must be tiny, got ${const.length}")
  }

  test("op census: corpus variant-3 docs emit literals, cache hits, horizontal AND vertical refs in both distance forms") {
    var lits = 0; var caches = 0
    var h2d = 0; var hPlain = 0; var v2d = 0; var vPlain = 0
    for (id <- 0L until 500L if MediaSynth.webpVariant(id) == 3) {
      val wI = MediaSynth.webpW(id); val hI = MediaSynth.webpH(id)
      val pxs = Array.tabulate(hI, wI)((y, x) =>
        MediaSynth.webpPixel(id, x, y)).flatten
      MediaSynth.lz77Ops(pxs, wI, 6).foreach {
        case MediaSynth.VLit(_, _) => lits += 1
        case MediaSynth.VCache(_, _) => caches += 1
        case MediaSynth.VRef(_, _, dc) =>
          if (dc == 2) h2d += 1
          else if (dc == 121) hPlain += 1
          else if (dc > 120) vPlain += 1
          else v2d += 1
      }
    }
    // every decoder branch the variant claims must actually occur in
    // the gate corpus — a zero here means a formally-registered but
    // unexercised path (the bug this test was added to prevent)
    assert(lits > 0, "no literals")
    assert(caches > 0, "no color-cache hits in the corpus")
    assert(h2d > 0 && hPlain > 0, s"horizontal refs missing a form: 2d=$h2d plain=$hPlain")
    assert(v2d > 0 && vPlain > 0, s"vertical refs missing a form: 2d=$v2d plain=$vPlain")
  }

  test("sub-byte palette bundling: 2/4/16-entry palettes pack 8/4/2 indices per byte") {
    for (n <- Seq(2, 4, 16); (w, h) <- Seq((8, 8), (13, 5), (9, 11))) {
      val scale = 255 / (n - 1)
      val idx = (x: Int, y: Int) => (x * 3 + y * 5 + n) % n
      val Some((dw, dh, px)) =
        Webp.decodePixels(MediaSynth.webpBundledOf(w, h, n, idx))
      assert((dw, dh) === ((w, h)), s"n=$n")
      for (y <- 0 until h; x <- 0 until w) {
        val g = idx(x, y) * scale
        val want = 0xff000000 | (g << 16) |
          (((g + 85) % 256) << 8) | ((g + 170) % 256)
        assert(px(y * w + x) === want, s"n=$n ($x,$y)")
      }
    }
  }

  test("lossy VP8 and non-WebP RIFF payloads return None (documented boundary)") {
    val vp8 = new java.io.ByteArrayOutputStream()
    def fourcc(s: String): Unit = vp8.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      vp8.write(v & 0xff); vp8.write((v >> 8) & 0xff)
      vp8.write((v >> 16) & 0xff); vp8.write((v >> 24) & 0xff)
    }
    fourcc("RIFF"); le32(16); fourcc("WEBP"); fourcc("VP8 "); le32(4)
    vp8.write(Array[Byte](1, 2, 3, 4))
    assert(Webp.decodePixels(vp8.toByteArray) === None)
    // a RIFF that is a WAV, not a WebP
    assert(Webp.decodePixels(MediaSynth.wav(1L)) === None)
    assert(Webp.decodePixels(Array.emptyByteArray) === None)
  }

  test("corrupting any single byte either decodes or returns None, never throws") {
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L)) { // one per variant
      val bytes = MediaSynth.webp(id)
      for (i <- bytes.indices) {
        val mut = bytes.clone(); mut(i) = (mut(i) ^ 0x40).toByte
        Webp.decodePixels(mut) // totality
      }
    }
  }

  test("truncation at every prefix length returns None or the exact image, never throws") {
    // unlike PNG (which requires IEND), a prefix that still contains
    // the complete VP8L chunk (e.g. only the RIFF pad byte cut) is a
    // valid file — so a successful prefix decode must be EXACT
    for (id <- Seq(3L, 6L)) { // cache+LZ77 and meta-group variants
      val bytes = MediaSynth.webp(id)
      val (w, h, want) = expected(id)
      for (n <- 0 until bytes.length) {
        val got = Webp.decodePixels(bytes.take(n))
          .map { case (dw, dh, px) => (dw, dh, px.toSeq) }
        assert(got.isEmpty || got === Some((w, h, want)), s"id=$id prefix $n")
      }
    }
  }

  test("near-dup fixture: twins land within the probe radius; stub rows diverge") {
    // evens chosen so neither side hits the id % 9 == 5 stub class
    for (even <- Seq(0L, 2L, 8L, 16L)) {
      val he = ImageDedup.imageHash(Webp.dedupPayload(even))
      val ho = ImageDedup.imageHash(Webp.dedupPayload(even + 1))
      assert(java.lang.Long.bitCount(he ^ ho) <= 15, s"pair ($even,${even + 1})")
    }
    val t = 5L // 5 % 9 == 5 -> truncated
    assert(Webp.decodePixels(Webp.dedupPayload(t)) === None)
  }

  test("decodeHeaders: VP8L bit-packed dims and lossy-VP8 keyframe dims parse") {
    for (id <- Seq(0L, 3L, 11L, 26L)) {
      val got = Multimodal.decodeHeaders(MediaSynth.webp(id))
      assert(got === Some((MediaSynth.webpW(id).toLong,
        MediaSynth.webpH(id).toLong, 1L, 0L, 1L)), s"id=$id")
    }
    // a minimal lossy VP8 keyframe header (RFC 6386 §9.1): dims
    // decode header-only even though pixels are a documented boundary
    val out = new java.io.ByteArrayOutputStream()
    def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    fourcc("RIFF"); le32(22); fourcc("WEBP"); fourcc("VP8 "); le32(10)
    out.write(Array[Byte](0x00, 0x00, 0x00)) // keyframe tag
    out.write(Array(0x9d, 0x01, 0x2a).map(_.toByte)) // start code
    out.write(Array[Byte](0x40, 0x01, 0x20, 0x03)) // 320 x 800 LE
    val b = out.toByteArray
    assert(Multimodal.decodeHeaders(b) === Some((320L, 800L, 1L, 0L, 1L)))
    assert(Webp.decodePixels(b) === None) // pixel boundary holds
  }

  test("imageHash dispatch: WebP payloads take the real pixel path, not the stub") {
    // the stub hash of the BYTES differs from the aHash of the PIXELS
    // — equality with the decode-then-aHash value pins the dispatch
    val bytes = MediaSynth.webp(8L)
    val Some((w, h, px)) = Webp.decodePixels(bytes)
    val direct = ImageDedup.aHash64(w, h, px)
    assert(direct.isDefined)
    assert(ImageDedup.imageHash(bytes) === direct.get)
  }
}
