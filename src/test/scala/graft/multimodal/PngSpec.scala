package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** PNG decoder: writer→decoder roundtrip exactness across all five
  * supported color types (incl. indexed w/ PLTE + tRNS) and all five
  * scanline filters, sequential AND Adam7-interlaced, multi-IDAT
  * reassembly, CRC rejection, the honesty boundary (depth /
  * palette-less indexed / unknown interlace), near-dup twin behavior,
  * and totality. Pure JVM — no Spark session needed. */
class PngSpec extends AnyFunSuite {

  test("writer->decoder roundtrip is pixel-exact across color types and filters") {
    // ids cover doc_id % 4 = 0,1,2,3 (gray, truecolor, RGBA,
    // gray+alpha), the sub-byte depth classes (id % 13 = 5/9/11/3),
    // and enough rows that (id + y) % 5 hits all filters
    for (id <- Seq(0L, 1L, 2L, 3L, 17L, 58L, 123L, 456L, 5L, 9L, 11L, 29L)) {
      val Some((w, h, px)) = Png.decodePixels(MediaSynth.png(id))
      assert(w === MediaSynth.pngW(id) && h === MediaSynth.pngH(id), s"id=$id")
      val ct = MediaSynth.pngColorType(id)
      val d = MediaSynth.pngDepth(id)
      for (y <- 0 until h; x <- 0 until w) {
        // the decoded 8-bit gray: the depth-quantized closed form,
        // scaled back by 255/(2^d-1) (identity for d = 8/16)
        val g0 = MediaSynth.pngGray(id, x, y)
        val g = if (d < 8) (g0 >> (8 - d)) * (255 / ((1 << d) - 1)) else g0
        val p = px(y * w + x)
        val (ea, er, eg, eb) = ct match {
          case 0 => (255, g, g, g)
          // indexed (3) uses the palette carrying the type-2 derivation
          case 2 | 3 => (255, g, (g + 85) % 256, (g + 170) % 256)
          case 4 => ((g + 31) % 256, g, g, g)
          case _ => ((g + 31) % 256, g, (g + 85) % 256, (g + 170) % 256)
        }
        assert(((p >>> 24), (p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
          === ((ea, er, eg, eb)), s"id=$id px($x,$y) ct=$ct d=$d")
      }
    }
  }

  test("sub-byte depths: 1/2/4-bit gray and 4-bit indexed roundtrip, sequential and Adam7") {
    // explicit dims exercising row-padding bits (w not a multiple of
    // the samples-per-byte count) and the interlaced sub-image packing
    for (d <- Seq(1, 2, 4); (w, h) <- Seq((8, 8), (9, 5), (13, 7), (3, 2));
         interlaced <- Seq(false, true)) {
      val scale = 255 / ((1 << d) - 1)
      val sample = (x: Int, y: Int) => (x * 29 + y * 17 + d) % (1 << d)
      val got = Png.decodePixels(MediaSynth.pngOf(w, h, 0, sample,
        y => y % 5, interlaced, depth = d))
      assert(got.isDefined, s"d=$d ($w x $h) interlaced=$interlaced")
      val (dw, dh, px) = got.get
      assert((dw, dh) === ((w, h)))
      for (y <- 0 until h; x <- 0 until w)
        assert(((px(y * w + x) >> 16) & 0xff) === sample(x, y) * scale,
          s"d=$d ($x,$y) interlaced=$interlaced")
    }
    // 4-bit INDEXED gate class (id % 13 == 3): palette entry i
    // carries the truecolor derivation of i*17
    val id = 29L
    assert(id % 13 === 3 && MediaSynth.pngColorType(id) === 3 &&
      MediaSynth.pngDepth(id) === 4)
    val Some((w, h, px)) = Png.decodePixels(MediaSynth.png(id))
    for (y <- 0 until h; x <- 0 until w) {
      val base = (MediaSynth.pngGray(id, x, y) >> 4) * 17
      val p = px(y * w + x)
      assert((((p >> 16) & 0xff), ((p >> 8) & 0xff), (p & 0xff))
        === ((base, (base + 85) % 256, (base + 170) % 256)), s"($x,$y)")
    }
    // sub-byte truecolor is illegal per RFC 2083 §4.1.1 and must
    // decline (patch the 4-bit gray gate class' IHDR to type 2)
    val m = MediaSynth.png(5L).clone()
    assert(MediaSynth.pngDepth(5L) === 4)
    m(25) = 2
    val crc = new java.util.zip.CRC32
    crc.update(m, 12, 17)
    val cv = crc.getValue
    m(29) = ((cv >> 24) & 0xff).toByte; m(30) = ((cv >> 16) & 0xff).toByte
    m(31) = ((cv >> 8) & 0xff).toByte; m(32) = (cv & 0xff).toByte
    assert(Png.decodePixels(m) === None)
  }

  test("every single filter type decodes exactly (fixed-filter renders)") {
    for (ft <- 0 to 4) {
      val bytes = MediaSynth.pngOf(11, 7, 2,
        (x, y) => (x * 29 + y * 17 + ft * 7) % 256, _ => ft)
      val Some((w, h, px)) = Png.decodePixels(bytes)
      assert((w, h) === ((11, 7)))
      for (y <- 0 until h; x <- 0 until w) {
        val g = (x * 29 + y * 17 + ft * 7) % 256
        assert(((px(y * w + x) >> 16) & 0xff) === g, s"ft=$ft ($x,$y)")
      }
    }
  }

  test("corrupting any single byte either decodes or returns None - and CRC catches payload bytes") {
    val bytes = MediaSynth.png(7L)
    for (i <- 8 until bytes.length) {
      val mut = bytes.clone(); mut(i) = (mut(i) ^ 0x40).toByte
      Png.decodePixels(mut) // totality
    }
    // a flipped bit inside the IDAT payload must be caught by the CRC
    // (locate the first IDAT chunk's data region and corrupt it)
    var p = 8
    var idatData = -1
    while (idatData < 0) {
      val len = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      val tpe = new String(bytes, p + 4, 4, "US-ASCII")
      if (tpe == "IDAT" && len > 0) idatData = p + 8
      else p += 12 + len
    }
    val mut = bytes.clone()
    mut(idatData) = (mut(idatData) ^ 0x01).toByte
    assert(Png.decodePixels(mut) === None)
  }

  test("truncation at every prefix length returns None, never throws") {
    val bytes = MediaSynth.png(13L)
    for (n <- 0 until bytes.length)
      assert(Png.decodePixels(bytes.take(n)) === None, s"prefix $n")
  }

  test("malformed streams return None: depth/length mismatch, palette-less indexed, unknown interlace") {
    val base = MediaSynth.png(4L)
    // IHDR data starts at offset 16: w(4) h(4) depth ct comp filt interlace
    def patched(off: Int, v: Byte): Array[Byte] = {
      val m = base.clone()
      m(off) = v
      // re-CRC the IHDR chunk (type at 12, data 13 bytes)
      val crc = new java.util.zip.CRC32
      crc.update(m, 12, 4 + 13)
      val cv = crc.getValue
      m(29) = ((cv >> 24) & 0xff).toByte; m(30) = ((cv >> 16) & 0xff).toByte
      m(31) = ((cv >> 8) & 0xff).toByte; m(32) = (cv & 0xff).toByte
      m
    }
    // depth patched to 16 on an 8-bit stream: the inflated scanline
    // length no longer matches the claimed layout — rejected
    assert(Png.decodePixels(patched(24, 16)) === None, "depth/stream mismatch")
    assert(Png.decodePixels(patched(24, 3)) === None, "illegal depth 3")
    assert(Png.decodePixels(patched(25, 3)) === None,
      "indexed claim without a PLTE")
    assert(Png.decodePixels(patched(28, 2)) === None, "unknown interlace method")
    // a SEQUENTIAL stream mislabeled Adam7 has the wrong total
    // scanline length for the seven-pass layout — rejected, not
    // misread (12x12: sequential 12·(1+12·bpp) vs Adam7's per-pass sum)
    assert(Png.decodePixels(patched(28, 1)) === None, "mislabeled Adam7")
    assert(Png.decodePixels(base).isDefined, "patch harness sanity")
  }

  test("Adam7: interlaced writer->decoder roundtrip is pixel-identical to sequential") {
    // 7L % 9 == 7: the gate corpus' interlaced class; plus explicit
    // dims that exercise empty and single-pixel passes
    for ((w, h) <- Seq((8, 8), (9, 10), (1, 1), (3, 2), (16, 13), (5, 9));
         ct <- Seq(0, 2, 6, 4)) {
      val gray = (x: Int, y: Int) => (x * 29 + y * 17 + 11) % 256
      val seqPx = Png.decodePixels(
        MediaSynth.pngOf(w, h, ct, gray, y => y % 5))
        .map { case (dw, dh, px) => (dw, dh, px.toSeq) }
      val intPx = Png.decodePixels(
        MediaSynth.pngOf(w, h, ct, gray, y => y % 5, interlaced = true))
        .map { case (dw, dh, px) => (dw, dh, px.toSeq) }
      assert(intPx.isDefined && intPx === seqPx, s"($w x $h ct=$ct)")
    }
    // and the gate corpus' own interlaced doc class decodes
    val id = 7L
    assert(id % 9 === 7)
    val Some((w, h, px)) = Png.decodePixels(MediaSynth.png(id))
    assert(w === MediaSynth.pngW(id) && h === MediaSynth.pngH(id))
    for (y <- 0 until h; x <- 0 until w)
      assert(((px(y * w + x) >> 16) & 0xff) === MediaSynth.pngGray(id, x, y))
  }

  test("indexed color: gate-class roundtrip, tRNS alphas honored, missing PLTE rejected") {
    // 1 % 8 == 1 and 17 % 8 == 1: indexed gate classes (covered by the
    // roundtrip test above); here the tRNS and malformed legs
    val bytes = MediaSynth.png(17L)
    assert(MediaSynth.pngColorType(17L) === 3)
    // splice a tRNS chunk right after PLTE: entries 0..2 get alphas
    // 10, 20, 30; all other entries keep 255
    val chunks = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var p = 8
    while (p < bytes.length) {
      val len = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      chunks += ((new String(bytes, p + 4, 4, "US-ASCII"),
        java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + len)))
      p += 12 + len
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, 8)
    def emit(tpe: String, body: Array[Byte]): Unit = {
      val len = body.length
      out.write((len >> 24) & 0xff); out.write((len >> 16) & 0xff)
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      val tb = tpe.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(body)
      out.write(tb); out.write(body)
      val cv = crc.getValue
      out.write(((cv >> 24) & 0xff).toInt); out.write(((cv >> 16) & 0xff).toInt)
      out.write(((cv >> 8) & 0xff).toInt); out.write((cv & 0xff).toInt)
    }
    chunks.foreach {
      case ("PLTE", b) =>
        emit("PLTE", b); emit("tRNS", Array[Byte](10, 20, 30))
      case (t, b) => emit(t, b)
    }
    val Some((w, h, px)) = Png.decodePixels(out.toByteArray)
    for (y <- 0 until h; x <- 0 until w) {
      val g = MediaSynth.pngGray(17L, x, y)
      val ea = if (g <= 2) (g + 1) * 10 else 255
      assert((px(y * w + x) >>> 24) === ea, s"alpha ($x,$y) g=$g")
      assert(((px(y * w + x) >> 16) & 0xff) === g)
    }
    // indexed stream with the PLTE chunk REMOVED: rejected at IDAT
    val noPlte = new java.io.ByteArrayOutputStream()
    noPlte.write(bytes, 0, 8)
    chunks.foreach { case (t, b) => if (t != "PLTE") emit2(noPlte, t, b) }
    assert(Png.decodePixels(noPlte.toByteArray) === None)
  }

  private def emit2(out: java.io.ByteArrayOutputStream, tpe: String,
      body: Array[Byte]): Unit = {
    val len = body.length
    out.write((len >> 24) & 0xff); out.write((len >> 16) & 0xff)
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    val tb = tpe.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(tb); crc.update(body)
    out.write(tb); out.write(body)
    val cv = crc.getValue
    out.write(((cv >> 24) & 0xff).toInt); out.write(((cv >> 16) & 0xff).toInt)
    out.write(((cv >> 8) & 0xff).toInt); out.write((cv & 0xff).toInt)
  }

  test("16-bit depth: s*257 samples scale back to the 8-bit closed form exactly") {
    for (ct <- Seq(0, 2, 6, 4); interlaced <- Seq(false, true)) {
      val gray = (x: Int, y: Int) => (x * 29 + y * 17 + 3) % 256
      val got = Png.decodePixels(
        MediaSynth.pngOf(9, 7, ct, gray, y => y % 5, interlaced, depth = 16))
        .map { case (w, h, px) => (w, h, px.toSeq) }
      val want = Png.decodePixels(
        MediaSynth.pngOf(9, 7, ct, gray, y => y % 5, interlaced))
        .map { case (w, h, px) => (w, h, px.toSeq) }
      assert(got.isDefined && got === want, s"ct=$ct interlaced=$interlaced")
    }
    // the gate corpus' 16-bit class (id % 11 == 6, non-indexed)
    val id = 6L
    assert(id % 11 === 6)
    assert(MediaSynth.pngColorType(id) !== 3)
    val Some((w, h, px)) = Png.decodePixels(MediaSynth.png(id))
    assert(w === MediaSynth.pngW(id))
    for (y <- 0 until h; x <- 0 until w)
      assert(((px(y * w + x) >> 16) & 0xff) === MediaSynth.pngGray(id, x, y))
    // indexed 16-bit is illegal per spec and must decline
    val base = MediaSynth.png(17L) // indexed class
    val m = base.clone(); m(24) = 16
    val crc = new java.util.zip.CRC32
    crc.update(m, 12, 17)
    val cv = crc.getValue
    m(29) = ((cv >> 24) & 0xff).toByte; m(30) = ((cv >> 16) & 0xff).toByte
    m(31) = ((cv >> 8) & 0xff).toByte; m(32) = (cv & 0xff).toByte
    assert(Png.decodePixels(m) === None)
  }

  test("Adam7: truncation at every prefix length returns None, never throws") {
    val bytes = MediaSynth.png(7L) // interlaced class
    for (n <- 0 until bytes.length)
      assert(Png.decodePixels(bytes.take(n)) === None, s"prefix $n")
  }

  test("near-dup fixture: twins land within the probe radius; stub rows diverge") {
    // even/odd neighbors: re-rendered with a brightened 8x8 region —
    // aHash must stay within the Hamming budget used by the gate
    for (even <- Seq(0L, 2L, 8L, 16L)) {
      val he = ImageDedup.imageHash(Png.dedupPayload(even))
      val ho = ImageDedup.imageHash(Png.dedupPayload(even + 1))
      assert(java.lang.Long.bitCount(he ^ ho) <= 15, s"pair ($even,${even + 1})")
    }
    // truncated rows take the stub path: far from their twin
    val t = 5L // 5 % 7 == 5 -> truncated
    assert(Png.decodePixels(Png.dedupPayload(t)) === None)
  }

  test("multi-IDAT: single-chunk and split streams decode identically") {
    // decode the standard (two-IDAT) stream, then re-pack the same
    // deflated bytes as ONE IDAT chunk and compare
    val bytes = MediaSynth.png(9L)
    val chunks = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var p = 8
    while (p < bytes.length) {
      val len = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      val tpe = new String(bytes, p + 4, 4, "US-ASCII")
      chunks += ((tpe, java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + len)))
      p += 12 + len
    }
    assert(chunks.count(_._1 == "IDAT") === 2, "writer emits two IDATs")
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, 8)
    def emit(tpe: String, body: Array[Byte]): Unit = {
      val len = body.length
      out.write((len >> 24) & 0xff); out.write((len >> 16) & 0xff)
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      val tb = tpe.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(body)
      out.write(tb); out.write(body)
      val cv = crc.getValue
      out.write(((cv >> 24) & 0xff).toInt); out.write(((cv >> 16) & 0xff).toInt)
      out.write(((cv >> 8) & 0xff).toInt); out.write((cv & 0xff).toInt)
    }
    val idat = chunks.filter(_._1 == "IDAT").map(_._2).reduce(_ ++ _)
    chunks.foreach {
      case ("IDAT", _) => // replaced by the single merged chunk below
      case ("IEND", b) => emit("IDAT", idat); emit("IEND", b)
      case (t, b) => emit(t, b)
    }
    val one = Png.decodePixels(out.toByteArray)
      .map { case (w, h, px) => (w, h, px.toSeq) }
    val two = Png.decodePixels(bytes)
      .map { case (w, h, px) => (w, h, px.toSeq) }
    assert(one.isDefined && one === two)
  }
}
