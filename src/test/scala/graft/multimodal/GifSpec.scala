package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** GIF decoder: writer→decoder roundtrip (sequential + row-interlace),
  * a REAL compressing LZW stream (dictionary growth, width bumps, the
  * self-referential code), transparency, truncation totality, and the
  * trailer/malformed boundaries. Pure JVM — no Spark session. */
class GifSpec extends AnyFunSuite {

  test("writer->decoder roundtrip is pixel-exact, sequential and interlaced") {
    for (id <- Seq(0L, 2L, 7L, 14L, 59L, 123L)) { // 2, 14 interlaced
      val Some((w, h, px)) = Gif.decodePixels(MediaSynth.gif(id))
      assert(w === MediaSynth.gifW(id) && h === MediaSynth.gifH(id), s"id=$id")
      for (y <- 0 until h; x <- 0 until w) {
        val g = MediaSynth.gifGray(id, x, y)
        val p = px(y * w + x)
        assert(((p >>> 24), (p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
          === ((255, g, (g + 85) % 256, (g + 170) % 256)), s"id=$id ($x,$y)")
      }
    }
  }

  test("a genuinely compressing LZW stream decodes: growth, width bumps, code==next") {
    // hand-encode with a REAL dictionary (the writer's clear-per-
    // literal scheme never grows one): repeat-heavy data forces the
    // self-referential code==next case and a 9->10 bit width bump
    val w = 64; val h = 32
    // head: high-entropy bytes (one table addition per ~1 emitted
    // code — forces dictionary growth past 512 and the 9->10->...
    // width bumps); tail: a long "ab" alternation (the decoder sees
    // just-added codes — the code==next branch, repeatedly)
    val idx = Array.tabulate(w * h)(i =>
      if (i < 1500) (i * 37 + (i >> 3) * 11) % 251
      else if (i % 2 == 0) 5 else 9)
    val out = new java.io.ByteArrayOutputStream()
    "GIF89a".foreach(c => out.write(c))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0xf7); out.write(0); out.write(0)
    for (g <- 0 until 256) { out.write(g); out.write(g); out.write(g) }
    out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0)
    out.write(8) // min code size
    // reference LZW encoder (string table keyed by (prefix, byte))
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nb = 0; var width = 9
    def put(v: Int): Unit = {
      acc |= v.toLong << nb; nb += width
      while (nb >= 8) { bits.write((acc & 0xff).toInt); acc >>>= 8; nb -= 8 }
    }
    val table = scala.collection.mutable.Map.empty[(Int, Int), Int]
    var next = 258
    put(256) // CLEAR
    var prev = idx(0)
    for (i <- 1 until idx.length) {
      val c = idx(i)
      table.get((prev, c)) match {
        case Some(code) => prev = code
        case None =>
          put(prev)
          table((prev, c)) = next
          next += 1
          // the DECODER grows width when its next == 2^width; the
          // encoder must bump in lockstep
          if (next - 1 == (1 << width) && width < 12) width += 1
          prev = c
      }
    }
    put(prev); put(257) // END
    if (nb > 0) bits.write((acc & 0xff).toInt)
    val data = bits.toByteArray
    var p = 0
    while (p < data.length) {
      val sz = math.min(255, data.length - p)
      out.write(sz); out.write(data, p, sz); p += sz
    }
    out.write(0); out.write(0x3b)
    assert(next > 512, "fixture must force a width bump")
    val Some((dw, dh, px)) = Gif.decodePixels(out.toByteArray)
    assert((dw, dh) === ((w, h)))
    for (i <- 0 until w * h)
      assert((px(i) & 0xff) === idx(i), s"pixel $i")
  }

  test("GIF89a transparency: the graphic-control index decodes with alpha 0") {
    val base = MediaSynth.gif(3L)
    // splice a graphic-control extension before the image descriptor
    // (structural offset: 13-byte header + 768-byte palette — a byte
    // SCAN for 0x2C would land inside the palette):
    // transparent flag set, transparent index = gifGray(3, 0, 0)
    val at = 13 + 768
    assert((base(at) & 0xff) === 0x2c)
    val tIdx = MediaSynth.gifGray(3L, 0, 0)
    val gce = Array(0x21, 0xf9, 4, 0x01, 0, 0, tIdx, 0).map(_.toByte)
    val spliced = base.take(at) ++ gce ++ base.drop(at)
    val Some((w, h, px)) = Gif.decodePixels(spliced)
    for (y <- 0 until h; x <- 0 until w) {
      val g = MediaSynth.gifGray(3L, x, y)
      assert((px(y * w + x) >>> 24) === (if (g == tIdx) 0 else 255),
        s"alpha ($x,$y)")
    }
  }

  test("near-dup fixture: twins land within the probe radius; stub rows diverge") {
    // evens whose odd twin is NOT the truncated class (id % 7 == 5)
    for (even <- Seq(0L, 2L, 8L, 16L)) {
      val he = ImageDedup.imageHash(Gif.dedupPayload(even))
      val ho = ImageDedup.imageHash(Gif.dedupPayload(even + 1))
      assert(java.lang.Long.bitCount(he ^ ho) <= 15, s"pair ($even,${even + 1})")
    }
    assert(Gif.decodePixels(Gif.dedupPayload(5L)) === None) // 5 % 7 == 5
  }

  test("truncation at every prefix length returns None, never throws") {
    val bytes = MediaSynth.gif(11L)
    for (n <- 0 until bytes.length)
      assert(Gif.decodePixels(bytes.take(n)) === None, s"prefix $n")
    // interlaced class too
    val in = MediaSynth.gif(2L)
    for (n <- 0 until in.length)
      assert(Gif.decodePixels(in.take(n)) === None, s"interlaced prefix $n")
  }

  test("malformed streams decline: bad magic, trailer-first, palette-less frame") {
    assert(Gif.decodePixels("GIF90a rest".getBytes) === None)
    val base = MediaSynth.gif(4L)
    // trailer immediately after the screen descriptor + palette
    val at = 13 + 768
    assert((base(at) & 0xff) === 0x2c)
    assert(Gif.decodePixels(base.take(at) :+ 0x3b.toByte) === None)
    // drop the global-palette flag: frame has no palette at all
    val m = base.clone(); m(10) = (m(10) & 0x7f).toByte
    // (screen descriptor now claims no global table, but the table
    // bytes follow — the walk misparses them as blocks and must
    // decline, not throw)
    Gif.decodePixels(m)
    // single-byte corruptions stay total
    for (i <- 6 until base.length) {
      val c = base.clone(); c(i) = (c(i) ^ 0x55).toByte
      Gif.decodePixels(c)
    }
  }
}
