package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** INDEPENDENT-DECODER differential: the JDK ships its own PNG and
  * GIF decoders (javax.imageio — a codebase sharing nothing with
  * ours), and both formats are LOSSLESS, so on every synthetic
  * fixture the two decoders must agree ARGB-for-ARGB. This is the
  * cross-check a writer→reader round-trip cannot provide: a
  * mirrored convention (bit order, filter sign, palette layout)
  * passes a round-trip on both sides but cannot fool a foreign
  * implementation. (WebP/FLAC/QOI have no JDK twin; their
  * independent pins are the spec-table/closed-form oracles.) */
class ImageIoDifferentialSpec extends AnyFunSuite {

  /** ImageIO's decoded pixels WITHOUT Java2D color-space conversion:
    * getRGB pushes gray images through a CS_GRAY -> sRGB transform
    * (a gamma lift — a Java2D rendering choice, not PNG decoding), so
    * component-model images are read from the RASTER and scaled
    * per-band by round(s*255/(2^depth-1)); indexed images keep
    * getRGB (IndexColorModel lookup is identity in sRGB). */
  private def viaImageIo(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val px = new Array[Int](w * h)
      img.getColorModel match {
        case _: java.awt.image.IndexColorModel =>
          img.getRGB(0, 0, w, h, px, 0, w)
        case cm =>
          val raster = img.getRaster
          val nb = raster.getNumBands
          def scaled(x: Int, y: Int, b: Int): Int = {
            val bits = cm.getComponentSize(b)
            val s = raster.getSample(x, y, b)
            if (bits == 8) s
            else (s * 255 + ((1 << bits) - 1) / 2) / ((1 << bits) - 1)
          }
          for (y <- 0 until h; x <- 0 until w) {
            val (r, g, b, a) = nb match {
              case 1 =>
                val v = scaled(x, y, 0); (v, v, v, 255)
              case 2 =>
                val v = scaled(x, y, 0); (v, v, v, scaled(x, y, 1))
              case 3 =>
                (scaled(x, y, 0), scaled(x, y, 1), scaled(x, y, 2), 255)
              case _ =>
                (scaled(x, y, 0), scaled(x, y, 1), scaled(x, y, 2),
                  scaled(x, y, 3))
            }
            px(y * w + x) = (a << 24) | (r << 16) | (g << 8) | b
          }
      }
      Some((w, h, px))
    }
  }

  private def same(tag: String, ours: Option[(Int, Int, Array[Int])],
      jdk: Option[(Int, Int, Array[Int])]): Unit = {
    assert(ours.isDefined, s"$tag: our decoder declined")
    assert(jdk.isDefined, s"$tag: ImageIO declined")
    val (w, h, a) = ours.get
    val (jw, jh, b) = jdk.get
    assert((w, h) === ((jw, jh)), s"$tag dims")
    for (i <- a.indices)
      assert(a(i) === b(i), s"$tag px(${i % w},${i / w}): " +
        f"ours=0x${a(i)}%08x jdk=0x${b(i)}%08x")
  }

  test("PNG: every corpus depth/color/filter/interlace class matches javax.imageio exactly") {
    // 60 ids cover doc_id % 4 color types, % 8 indexed, % 13 sub-byte
    // classes, % 9 interlace, % 11 16-bit, all five filters
    for (id <- 0L until 60L)
      same(s"png id=$id ct=${MediaSynth.pngColorType(id)} d=${MediaSynth.pngDepth(id)}",
        Png.decodePixels(MediaSynth.png(id)),
        viaImageIo(MediaSynth.png(id)))
  }

  test("PNG: sub-byte gray and indexed fixtures (explicit dims incl. padded rows) match") {
    for (d <- Seq(1, 2, 4); (w, h) <- Seq((9, 5), (13, 7)); il <- Seq(false, true)) {
      val sample = (x: Int, y: Int) => (x * 29 + y * 17 + d) % (1 << d)
      val bytes = MediaSynth.pngOf(w, h, 0, sample, y => y % 5, il, depth = d)
      same(s"png sub-byte d=$d ${w}x$h il=$il",
        Png.decodePixels(bytes), viaImageIo(bytes))
    }
  }

  test("GIF: sequential and interlaced corpus classes match javax.imageio exactly") {
    for (id <- 0L until 40L)
      same(s"gif id=$id", Gif.decodePixels(MediaSynth.gif(id)),
        viaImageIo(MediaSynth.gif(id)))
  }

  test("TIFF: byte orders, photometric classes and PackBits match javax.imageio exactly") {
    // 48 ids cover II/MM, gray/RGB/RGBA/palette/WhiteIsZero,
    // uncompressed/PackBits, the -128 no-op class, multi-strip
    for (id <- 0L until 48L)
      same(s"tiff id=$id pm=${MediaSynth.tiffPhotometric(id)}",
        Tiff.decodePixels(MediaSynth.tiff(id)),
        viaImageIo(MediaSynth.tiff(id)))
  }

  test("TIFF LZW: corpus classes and a deep-width stream match javax.imageio exactly") {
    // id % 3 == 2 (LZW) and id % 6 == 2 (LZW + predictor 2): the JDK
    // TIFF plugin decodes both, so the code packing, early-change
    // boundaries and the differencing direction get a foreign pin
    for (id <- Seq(2L, 5L, 8L, 11L, 14L, 20L, 26L, 32L, 38L, 44L))
      same(s"tiff-lzw id=$id pred=${id % 6 == 2}",
        Tiff.decodePixels(MediaSynth.tiff(id)),
        viaImageIo(MediaSynth.tiff(id)))
    // a 128x96 single-channel LZW image: ~12k dictionary entries
    // cross EVERY width boundary (511 -> 1023 -> 2047) and the
    // 4094-entry Clear — the deep-width conventions against a
    // decoder that shares no code with ours
    for (id <- Seq(2L, 8L)) { // predictor-2 and plain LZW classes
      val big = MediaSynth.tiffOf(id, 128, 96)
      same(s"tiff-lzw-big id=$id", Tiff.decodePixels(big), viaImageIo(big))
    }
  }

  test("TIFF tiles: multi-tile grids with edge padding match javax.imageio exactly") {
    // id % 11 == 7 docs are tiled (16x16, tags 322-325); at 48x40 the
    // grid is 3x3 with padded right/bottom edges. 18: uncompressed MM
    // RGB; 29: LZW; 62: LZW + predictor-2 (the full pairing)
    for (id <- Seq(18L, 29L, 62L)) {
      assert(id % 11 === 7)
      val big = MediaSynth.tiffOf(id, 48, 40)
      same(s"tiff-tiled id=$id", Tiff.decodePixels(big), viaImageIo(big))
      // and the corpus-dims variant (single padded tile)
      same(s"tiff-tiled-small id=$id",
        Tiff.decodePixels(MediaSynth.tiff(id)), viaImageIo(MediaSynth.tiff(id)))
    }
  }

  test("TIFF planar-2: separate sample planes match javax.imageio exactly") {
    // spp > 1 docs with id % 13 == 9 store plane-major strip runs;
    // 9: RGBA uncompressed, 61: RGB (61 % 3 == 1 -> PackBits planes),
    // 113: RGBA LZW planes (113 % 3 == 2)
    for (id <- Seq(9L, 61L, 113L)) {
      assert(id % 13 === 9 && MediaSynth.tiffPhotometric(id) === 2)
      same(s"tiff-planar2 id=$id", Tiff.decodePixels(MediaSynth.tiff(id)),
        viaImageIo(MediaSynth.tiff(id)))
      val big = MediaSynth.tiffOf(id, 40, 24) // multi-strip planes
      same(s"tiff-planar2-big id=$id", Tiff.decodePixels(big), viaImageIo(big))
    }
  }

  test("TIFF 16-bit: gray and RGB samples match javax.imageio exactly") {
    // id % 19 == 13 docs carry 16-bit samples (v*257); 13: RGB
    // PackBits MM, 32: gray LZW II, 51: WhiteIsZero uncompressed MM
    // (inverted 16-bit storage), 89: RGBA LZW MM
    for (id <- Seq(13L, 32L, 51L, 89L)) {
      assert(id % 19 === 13 && MediaSynth.tiffPhotometric(id) != 3)
      same(s"tiff-16bit id=$id pm=${MediaSynth.tiffPhotometric(id)}",
        Tiff.decodePixels(MediaSynth.tiff(id)),
        viaImageIo(MediaSynth.tiff(id)))
      val big = MediaSynth.tiffOf(id, 40, 24)
      same(s"tiff-16bit-big id=$id", Tiff.decodePixels(big), viaImageIo(big))
    }
  }

  test("BMP: the dedup fixture payloads match javax.imageio exactly") {
    // ImageDedup's BMP decoder vs the JDK's on the synthetic 24-bit
    // fixtures (bottom-up rows, padding)
    for (id <- Seq(0L, 7L, 13L, 29L)) {
      val w = 8 + (id % 5).toInt; val h = 8 + (id % 3).toInt
      val bytes = {
        // minimal BITMAPINFOHEADER 24-bit bottom-up BMP
        val rowPad = (4 - (w * 3) % 4) % 4
        val dataLen = (w * 3 + rowPad) * h
        val out = new java.io.ByteArrayOutputStream()
        def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
          out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
        def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
        out.write('B'); out.write('M'); le32(54 + dataLen); le32(0); le32(54)
        le32(40); le32(w); le32(h); le16(1); le16(24); le32(0); le32(dataLen)
        le32(2835); le32(2835); le32(0); le32(0)
        for (y <- h - 1 to 0 by -1) {
          for (x <- 0 until w) {
            val g = ((id * 7 + x * 13 + y * 31) % 256).toInt
            out.write((g + 170) % 256); out.write((g + 85) % 256); out.write(g)
          }
          for (_ <- 0 until rowPad) out.write(0)
        }
        out.toByteArray
      }
      same(s"bmp id=$id", ImageDedup.decodeBmpPixels(bytes), viaImageIo(bytes))
    }
  }
}
