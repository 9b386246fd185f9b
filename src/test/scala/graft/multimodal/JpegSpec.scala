package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Baseline-JPEG decoder: gate-fixture roundtrip exactness, cropped
  * (non-multiple-of-8) dims, restart intervals, general AC
  * coefficients against an independent reference IDCT, 4:4:4 and
  * 4:2:0 color, and malformed-stream totality. Pure JVM — no Spark
  * session needed. */
class JpegSpec extends AnyFunSuite {

  test("encoder->decoder roundtrip is pixel-exact on block-constant fixtures") {
    for (id <- Seq(0L, 1L, 7L, 59L, 123L, 456L)) {
      val Some((w, h, px)) = Jpeg.decodePixels(MediaSynth.jpeg(id))
      assert(w === 8 * MediaSynth.jpegNbx(id))
      assert(h === 8 * MediaSynth.jpegNby(id))
      for (y <- 0 until h; x <- 0 until w) {
        val expect = MediaSynth.jpegGray(id, x / 8, y / 8)
        val got = px(y * w + x) & 0xff
        assert(got === expect, s"id=$id px($x,$y)")
        // grayscale output: all three channels equal
        assert(((px(y * w + x) >> 8) & 0xff) === got)
      }
    }
  }

  test("TEM marker (standalone, no length segment) is skipped, not mis-parsed") {
    val id = 7L
    val bytes = MediaSynth.jpeg(id)
    // splice FF 01 right after SOI — a valid position for the
    // standalone TEM marker (ADVICE r12: the length-skip default case
    // rejected such streams)
    val patched = Array[Byte](bytes(0), bytes(1), 0xff.toByte, 0x01.toByte) ++
      bytes.drop(2)
    val plain = Jpeg.decodePixels(bytes).map { case (w, h, px) => (w, h, px.toSeq) }
    val tem = Jpeg.decodePixels(patched).map { case (w, h, px) => (w, h, px.toSeq) }
    assert(tem.isDefined && tem === plain)
  }

  test("restart intervals: DRI + RSTn with predictor resets decode identically") {
    for (id <- Seq(3L, 10L); every <- Seq(1, 2, 5)) {
      val plain = Jpeg.decodePixels(MediaSynth.jpeg(id))
        .map { case (w, h, px) => (w, h, px.toSeq) }
      val rst = Jpeg.decodePixels(MediaSynth.jpeg(id, restartEvery = every))
        .map { case (w, h, px) => (w, h, px.toSeq) }
      assert(rst.isDefined && rst === plain, s"id=$id restartEvery=$every")
    }
  }

  test("cropped dims: SOF smaller than the MCU grid crops the padded blocks") {
    // patch the SOF dims of a real stream: the decoder must decode
    // the full MCU grid but emit only w x h pixels
    val id = 4L
    val bytes = MediaSynth.jpeg(id)
    val w0 = 8 * MediaSynth.jpegNbx(id); val h0 = 8 * MediaSynth.jpegNby(id)
    val w1 = w0 - 3; val h1 = h0 - 5
    // SOF0 starts after SOI(2) + DQT(2+2+67-2=69)... locate FFC0
    var sof = -1
    var i = 2
    while (sof < 0 && i + 1 < bytes.length) {
      if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc0) sof = i
      i += 1
    }
    assert(sof > 0)
    val patched = bytes.clone()
    patched(sof + 5) = ((h1 >> 8) & 0xff).toByte
    patched(sof + 6) = (h1 & 0xff).toByte
    patched(sof + 7) = ((w1 >> 8) & 0xff).toByte
    patched(sof + 8) = (w1 & 0xff).toByte
    val Some((w, h, px)) = Jpeg.decodePixels(patched)
    assert(w === w1 && h === h1)
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) === MediaSynth.jpegGray(id, x / 8, y / 8))
  }

  // ── spec-side generalized encoder (constant-value components, any
  //    sampling factors; same canonical tables as MediaSynth) ────────
  private def beLen(body: Seq[Int]): Seq[Int] = {
    val len = body.length + 2
    Seq((len >> 8) & 0xff, len & 0xff) ++ body
  }
  private def colorJpeg(w: Int, h: Int, yv: Int, cbv: Int, crv: Int,
      ySamp: (Int, Int)): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def emit(xs: Seq[Int]): Unit = xs.foreach(out.write)
    emit(Seq(0xff, 0xd8))
    emit(Seq(0xff, 0xdb) ++ beLen(0 +: Seq.fill(64)(1)))
    emit(Seq(0xff, 0xc0) ++ beLen(Seq(8, (h >> 8) & 0xff, h & 0xff,
      (w >> 8) & 0xff, w & 0xff, 3,
      1, (ySamp._1 << 4) | ySamp._2, 0, 2, 0x11, 0, 3, 0x11, 0)))
    emit(Seq(0xff, 0xc4) ++ beLen(Seq(0x00, 0, 0, 0, 12) ++
      Seq.fill(12)(0) ++ (0 to 11)))
    emit(Seq(0xff, 0xc4) ++ beLen(Seq(0x10, 0, 1) ++ Seq.fill(14)(0) ++
      Seq(0x00)))
    emit(Seq(0xff, 0xda) ++ beLen(Seq(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0)))
    // entropy: one MCU stream; constant components -> first block of
    // each component carries its DC, later blocks diff 0
    val bits = new StringBuilder
    def putDc(diff: Int): Unit = {
      val s = if (diff == 0) 0
        else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      bits.append(("0000" + s.toBinaryString).takeRight(4))
      if (s > 0) {
        val v = if (diff < 0) diff + (1 << s) - 1 else diff
        bits.append((("0" * s) + v.toBinaryString).takeRight(s))
      }
      bits.append("00") // EOB
    }
    val (hy, vy) = ySamp
    val mcusX = (w + 8 * hy - 1) / (8 * hy)
    val mcusY = (h + 8 * vy - 1) / (8 * vy)
    val preds = Array(0, 0, 0)
    val dcs = Array(8 * (yv - 128), 8 * (cbv - 128), 8 * (crv - 128))
    for (_ <- 0 until mcusX * mcusY) {
      for (_ <- 0 until hy * vy) { putDc(dcs(0) - preds(0)); preds(0) = dcs(0) }
      putDc(dcs(1) - preds(1)); preds(1) = dcs(1)
      putDc(dcs(2) - preds(2)); preds(2) = dcs(2)
    }
    while (bits.length % 8 != 0) bits.append("1")
    bits.toString.grouped(8).foreach { byte =>
      val v = Integer.parseInt(byte, 2)
      out.write(v)
      if (v == 0xff) out.write(0x00)
    }
    emit(Seq(0xff, 0xd9))
    out.toByteArray
  }

  private def jfifRgb(yv: Int, cbv: Int, crv: Int): (Int, Int, Int) = {
    def cl(d: Double) = math.max(0, math.min(255, math.round(d).toInt))
    (cl(yv + 1.402 * (crv - 128)),
      cl(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128)),
      cl(yv + 1.772 * (cbv - 128)))
  }

  test("color: 4:4:4 and 4:2:0 constant components decode to the JFIF RGB") {
    for ((samp, w, h) <- Seq(((1, 1), 8, 8), ((2, 2), 16, 16))) {
      val (yv, cbv, crv) = (90, 60, 190)
      val Some((dw, dh, px)) =
        Jpeg.decodePixels(colorJpeg(w, h, yv, cbv, crv, samp))
      assert((dw, dh) === ((w, h)))
      val (r, g, b) = jfifRgb(yv, cbv, crv)
      for (p <- px) {
        assert(((p >> 16) & 0xff) === r)
        assert(((p >> 8) & 0xff) === g)
        assert((p & 0xff) === b)
      }
    }
  }

  test("general AC coefficients: decode matches an independent reference IDCT within T.81 accuracy") {
    // hand-build a single-block grayscale stream with three nonzero
    // ACs through a custom AC table carrying exactly the needed
    // (run,size) symbols, then compare against a from-scratch IDCT
    // decoded spectrum (zigzag idx -> value): {0:64, 1:30, 3:-17, 7:7}
    // — derived from the (run,size) symbols written below
    val out = new java.io.ByteArrayOutputStream()
    def emit(xs: Seq[Int]): Unit = xs.foreach(out.write)
    emit(Seq(0xff, 0xd8))
    emit(Seq(0xff, 0xdb) ++ beLen(0 +: Seq.fill(64)(1)))
    emit(Seq(0xff, 0xc0) ++ beLen(Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0)))
    emit(Seq(0xff, 0xc4) ++ beLen(Seq(0x00, 0, 0, 0, 12) ++
      Seq.fill(12)(0) ++ (0 to 11)))
    // AC table: symbols {0x05 (r0,s5), 0x15 (r1,s5), 0x33 (r3,s3), 0x00 EOB}
    // all as 3-bit codes (canonical: 000,001,010,011)
    emit(Seq(0xff, 0xc4) ++ beLen(Seq(0x10, 0, 0, 4) ++ Seq.fill(13)(0) ++
      Seq(0x05, 0x15, 0x33, 0x00)))
    emit(Seq(0xff, 0xda) ++ beLen(Seq(1, 1, 0x00, 0, 63, 0)))
    val bits = new StringBuilder
    def mag(v: Int, s: Int): String = {
      val m = if (v < 0) v + (1 << s) - 1 else v
      (("0" * s) + m.toBinaryString).takeRight(s)
    }
    bits.append("0111").append(mag(64, 7)) // DC: category 7, value 64
    bits.append("000").append(mag(30, 5)) // (r0,s5) -> zz1
    bits.append("001").append(mag(-17, 5)) // (r1,s5): skip zz2 -> zz3
    bits.append("010").append(mag(7, 3)) // (r3,s3): skip zz4..6 -> zz7
    bits.append("011") // EOB
    while (bits.length % 8 != 0) bits.append("1")
    bits.toString.grouped(8).foreach { b =>
      val v = Integer.parseInt(b, 2); out.write(v)
      if (v == 0xff) out.write(0x00)
    }
    emit(Seq(0xff, 0xd9))
    val Some((w, h, px)) = Jpeg.decodePixels(out.toByteArray)
    assert((w, h) === ((8, 8)))
    // reference: place the coefficients via an independent zigzag and
    // run the textbook IDCT
    def zigzagNat(i: Int): Int = {
      // independent zigzag derivation: walk anti-diagonals
      val order = scala.collection.mutable.ArrayBuffer.empty[Int]
      for (s <- 0 until 15) {
        val cells = (0 to s).map(k => (k, s - k)).filter {
          case (x, y) => x < 8 && y < 8 }
        val diag = if (s % 2 == 0) cells.map { case (x, y) => (y, x) }
          else cells
        diag.foreach { case (y, x) => order += y * 8 + x }
      }
      order(i)
    }
    val f = new Array[Int](64)
    // T.81 placement of the symbols above: k=1 (r0,s5) -> zz1=30;
    // k=2 (r1,s5) skips zz2 -> zz3=-17; k=4 (r3,s3) skips zz4..6
    // -> zz7=7; EOB. Spectrum: zz{0,1,3,7}.
    f(0) = 64
    f(zigzagNat(1)) = 30
    f(zigzagNat(3)) = -17
    f(zigzagNat(7)) = 7
    def refIdct(fx: Array[Int]): Array[Int] = {
      val o = new Array[Int](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        var s = 0.0
        for (v <- 0 until 8; u <- 0 until 8) {
          val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
          val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
          s += 0.25 * cu * cv * fx(v * 8 + u) *
            math.cos((2 * x + 1) * u * math.Pi / 16) *
            math.cos((2 * y + 1) * v * math.Pi / 16)
        }
        val p = math.round(s).toInt + 128
        o(y * 8 + x) = math.max(0, math.min(255, p))
      }
      o
    }
    val ref = refIdct(f)
    for (i <- 0 until 64) {
      val got = px(i) & 0xff
      assert(math.abs(got - ref(i)) <= 1,
        s"pixel $i: got $got ref ${ref(i)}")
    }
  }

  test("near-dup fixture: twins land within the probe radius; stub rows diverge") {
    // every decodable odd doc's image is its even neighbor's with one
    // block +8 — the aHash must stay within Hamming 15 (the gate's
    // multi-probe pigeonhole reach), and usually much closer
    for (id <- 0L until 60L by 2 if id % 7 != 5 && (id + 1) % 7 != 5) {
      val a = ImageDedup.imageHash(Jpeg.dedupPayload(id))
      val b = ImageDedup.imageHash(Jpeg.dedupPayload(id + 1))
      assert(java.lang.Long.bitCount(a ^ b) <= 15,
        s"twin pair ($id, ${id + 1}) outside the probe radius")
    }
    // a truncated row takes the stub path: its hash must differ from
    // the real decode's (or the gate would pass without decoding)
    val realHash = ImageDedup.imageHash(MediaSynth.jpeg(5L))
    val stubHash = ImageDedup.imageHash(Jpeg.dedupPayload(5L))
    assert(realHash !== stubHash)
  }

  test("totality: truncation at every prefix length returns None, never throws") {
    val bytes = MediaSynth.jpeg(11L)
    for (n <- 0 until bytes.length)
      Jpeg.decodePixels(bytes.take(n)) // must not throw
    // flipped marker bytes must not throw either
    for (i <- 2 until math.min(bytes.length, 64)) {
      val mut = bytes.clone(); mut(i) = (mut(i) ^ 0x81).toByte
      Jpeg.decodePixels(mut)
    }
    assert(Jpeg.decodePixels(Array[Byte]()) === None)
    assert(Jpeg.decodePixels("not a jpeg".getBytes) === None)
  }

  test("honesty boundary: arithmetic, 12-bit, and malformed-SOF2 streams return None") {
    val bytes = MediaSynth.jpeg(2L)
    var sof = -1
    var i = 2
    while (sof < 0 && i + 1 < bytes.length) {
      if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc0) sof = i
      i += 1
    }
    val arith = bytes.clone(); arith(sof + 1) = 0xc9.toByte // SOF9
    assert(Jpeg.decodePixels(arith) === None)
    val deep = bytes.clone(); deep(sof + 4) = 12.toByte // 12-bit precision
    assert(Jpeg.decodePixels(deep) === None)
    // a baseline stream mislabeled SOF2 carries an Ss=0/Se=63 scan —
    // not a legal progressive band split — and must be rejected, not
    // guessed at
    val prog = bytes.clone(); prog(sof + 1) = 0xc2.toByte
    assert(Jpeg.decodePixels(prog) === None)
  }

  test("progressive: full successive-approximation ladder decodes pixel-identical to baseline") {
    for (id <- Seq(0L, 1L, 7L, 59L, 123L, 456L)) {
      val base = Jpeg.decodePixels(MediaSynth.jpeg(id))
        .map { case (w, h, px) => (w, h, px.toSeq) }
      val prog = Jpeg.decodePixels(MediaSynth.jpegProgressive(id))
        .map { case (w, h, px) => (w, h, px.toSeq) }
      assert(prog.isDefined && prog === base, s"id=$id")
    }
  }

  test("progressive: restart intervals reset DC predictors and EOB runs") {
    for (id <- Seq(3L, 10L); every <- Seq(1, 2, 5)) {
      val plain = Jpeg.decodePixels(MediaSynth.jpegProgressive(id))
        .map { case (w, h, px) => (w, h, px.toSeq) }
      val rst = Jpeg.decodePixels(MediaSynth.jpegProgressive(id, restartEvery = every))
        .map { case (w, h, px) => (w, h, px.toSeq) }
      assert(rst.isDefined && rst === plain, s"id=$id restartEvery=$every")
    }
  }

  test("progressive general AC: spectral bands + refinement corrections and a birth match the reference IDCT") {
    // hand-build a single-block grayscale SOF2 stream whose final
    // spectrum is zz{0:64, 1:30, 3:-17, 4:-1, 7:7}, assembled across
    // four scans: DC first (Al=0); AC first over band 1..5 at Al=1
    // (zz1=15, zz3=-8 in the shifted domain); AC refinement of that
    // band (correction bit 0 for zz1, correction bit 1 for -16→-17,
    // and the BIRTH of zz4=-1 behind one zero-history skip); AC first
    // over band 6..63 (zz7=7) — every §G.1.2 branch with nonzero
    // coefficients in one fixture
    val out = new java.io.ByteArrayOutputStream()
    def emit(xs: Seq[Int]): Unit = xs.foreach(out.write)
    emit(Seq(0xff, 0xd8))
    emit(Seq(0xff, 0xdb) ++ beLen(0 +: Seq.fill(64)(1)))
    emit(Seq(0xff, 0xc2) ++ beLen(Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0)))
    emit(Seq(0xff, 0xc4) ++ beLen(Seq(0x00, 0, 0, 0, 12) ++
      Seq.fill(12)(0) ++ (0 to 11)))
    // AC table: symbols {0x04 (r0,s4), 0x14 (r1,s4), 0x11 (r1,s1),
    // 0x13 (r1,s3), 0x00 EOB} as 3-bit codes 000..100
    emit(Seq(0xff, 0xc4) ++ beLen(Seq(0x10, 0, 0, 5) ++ Seq.fill(13)(0) ++
      Seq(0x04, 0x14, 0x11, 0x13, 0x00)))
    def mag(v: Int, s: Int): String = {
      val m = if (v < 0) v + (1 << s) - 1 else v
      (("0" * s) + m.toBinaryString).takeRight(s)
    }
    def scan(sos: Seq[Int], bitstr: String): Unit = {
      emit(Seq(0xff, 0xda) ++ beLen(sos))
      var s = bitstr
      while (s.length % 8 != 0) s += "1"
      s.grouped(8).foreach { b =>
        val v = Integer.parseInt(b, 2); out.write(v)
        if (v == 0xff) out.write(0x00)
      }
    }
    scan(Seq(1, 1, 0x00, 0, 0, 0x00), "0111" + mag(64, 7))
    scan(Seq(1, 1, 0x00, 1, 5, 0x01),
      "000" + mag(15, 4) + // (r0,s4) -> zz1 = 15<<1 = 30
      "001" + mag(-8, 4) + // (r1,s4): skip zz2 -> zz3 = -8<<1 = -16
      "100") // EOB
    scan(Seq(1, 1, 0x00, 1, 5, 0x10),
      "010" + // (r1,s1): birth after one zero-history skip (zz2)
      "0" + // sign bit: negative birth (-1)
      "0" + // correction bit for zz1 (30 stays 30)
      "1" + // correction bit for zz3 (-16 -> -17); birth lands at zz4
      "100") // EOB: remainder zz5 has zero history, no bits
    scan(Seq(1, 1, 0x00, 6, 63, 0x00),
      "011" + mag(7, 3) + // (r1,s3): skip zz6 -> zz7 = 7
      "100") // EOB
    emit(Seq(0xff, 0xd9))
    val Some((w, h, px)) = Jpeg.decodePixels(out.toByteArray)
    assert((w, h) === ((8, 8)))
    def zigzagNat(i: Int): Int = {
      val order = scala.collection.mutable.ArrayBuffer.empty[Int]
      for (s <- 0 until 15) {
        val cells = (0 to s).map(k => (k, s - k)).filter {
          case (x, y) => x < 8 && y < 8 }
        val diag = if (s % 2 == 0) cells.map { case (x, y) => (y, x) }
          else cells
        diag.foreach { case (y, x) => order += y * 8 + x }
      }
      order(i)
    }
    val f = new Array[Int](64)
    f(0) = 64
    f(zigzagNat(1)) = 30
    f(zigzagNat(3)) = -17
    f(zigzagNat(4)) = -1
    f(zigzagNat(7)) = 7
    val ref = {
      val o = new Array[Int](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        var s = 0.0
        for (v <- 0 until 8; u <- 0 until 8) {
          val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
          val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
          s += 0.25 * cu * cv * f(v * 8 + u) *
            math.cos((2 * x + 1) * u * math.Pi / 16) *
            math.cos((2 * y + 1) * v * math.Pi / 16)
        }
        val p = math.round(s).toInt + 128
        o(y * 8 + x) = math.max(0, math.min(255, p))
      }
      o
    }
    for (i <- 0 until 64) {
      val got = px(i) & 0xff
      assert(math.abs(got - ref(i)) <= 1, s"pixel $i: got $got ref ${ref(i)}")
    }
  }

  test("progressive color 4:2:0: interleaved DC scan + per-component AC grids decode to the JFIF RGB") {
    // 16x16, Y sampled 2x2, Cb/Cr 1x1: the interleaved multi-component
    // DC walk (per-component predictors, Y's 4 blocks per MCU) and the
    // NON-interleaved AC scans over each component's own ceil-block
    // grid (Y: 2x2 blocks, chroma: 1x1) — the code paths grayscale
    // fixtures never touch
    val (yv, cbv, crv) = (90, 60, 190)
    val out = new java.io.ByteArrayOutputStream()
    def emit(xs: Seq[Int]): Unit = xs.foreach(out.write)
    emit(Seq(0xff, 0xd8))
    emit(Seq(0xff, 0xdb) ++ beLen(0 +: Seq.fill(64)(1)))
    emit(Seq(0xff, 0xc2) ++ beLen(Seq(8, 0, 16, 0, 16, 3,
      1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0)))
    emit(Seq(0xff, 0xc4) ++ beLen(Seq(0x00, 0, 0, 0, 12) ++
      Seq.fill(12)(0) ++ (0 to 11)))
    // AC table: the single EOB symbol as a 2-bit code
    emit(Seq(0xff, 0xc4) ++ beLen(Seq(0x10, 0, 1) ++ Seq.fill(14)(0) ++
      Seq(0x00)))
    def mag(v: Int, s: Int): String = {
      val m = if (v < 0) v + (1 << s) - 1 else v
      (("0" * s) + m.toBinaryString).takeRight(s)
    }
    def cat(v: Int): Int =
      if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def dcBits(diff: Int): String = {
      val s = cat(diff)
      f"${s.toBinaryString}%4s".replace(' ', '0') + (if (s > 0) mag(diff, s) else "")
    }
    def scan(sos: Seq[Int], bitstr: String): Unit = {
      emit(Seq(0xff, 0xda) ++ beLen(sos))
      var s = bitstr
      while (s.length % 8 != 0) s += "1"
      s.grouped(8).foreach { b =>
        val v = Integer.parseInt(b, 2); out.write(v)
        if (v == 0xff) out.write(0x00)
      }
    }
    val (dcY, dcCb, dcCr) = (8 * (yv - 128), 8 * (cbv - 128), 8 * (crv - 128))
    // interleaved DC-first scan: one MCU = Y's 4 blocks (predictor
    // runs within the component: first diff carries the value, the
    // rest are 0) then Cb, then Cr — each with its OWN predictor
    scan(Seq(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0),
      dcBits(dcY) + dcBits(0) + dcBits(0) + dcBits(0) +
        dcBits(dcCb) + dcBits(dcCr))
    // per-component AC scans over the components' own block grids:
    // Y has ceil(16/8)^2 = 4 blocks, each chroma ceil(8/8)^2 = 1
    scan(Seq(1, 1, 0x00, 1, 63, 0), "00" * 4)
    scan(Seq(1, 2, 0x00, 1, 63, 0), "00")
    scan(Seq(1, 3, 0x00, 1, 63, 0), "00")
    emit(Seq(0xff, 0xd9))
    val Some((w, h, px)) = Jpeg.decodePixels(out.toByteArray)
    assert((w, h) === ((16, 16)))
    val (er, eg, eb) = jfifRgb(yv, cbv, crv)
    for (p <- px) {
      assert(((p >> 16) & 0xff) === er)
      assert(((p >> 8) & 0xff) === eg)
      assert((p & 0xff) === eb)
    }
  }

  test("progressive: truncation at every prefix length returns None, never throws") {
    val bytes = MediaSynth.jpegProgressive(11L)
    for (n <- 0 until bytes.length)
      assert(Jpeg.decodePixels(bytes.take(n)) === None, s"prefix $n")
    // and single-byte corruptions stay total
    for (i <- 2 until bytes.length) {
      val mut = bytes.clone(); mut(i) = (mut(i) ^ 0x81).toByte
      Jpeg.decodePixels(mut)
    }
  }
}
