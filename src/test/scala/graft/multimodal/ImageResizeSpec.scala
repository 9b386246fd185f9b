package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal.MediaRow

class ImageResizeSpec extends SparkSpec {

  private def gray(v: Int): Int = (0xff << 24) | (v << 16) | (v << 8) | v

  test("box-average: exact integer means, truncating division") {
    // 4×4 → 2×2: each output cell is the mean of a 2×2 block
    val px = Array(
      10, 20, 100, 200,
      30, 40, 110, 210,
      0, 0, 255, 255,
      2, 2, 255, 251).map(gray)
    val out = ImageResize.resizePixels(4, 4, px, 2, 2)
    assert((out(0) & 0xff) === 25) // (10+20+30+40)/4
    assert((out(1) & 0xff) === 155) // (100+200+110+210)/4
    assert((out(2) & 0xff) === 1) // (0+0+2+2)/4
    assert((out(3) & 0xff) === 254) // (255+255+255+251)/4 = 1016/4
    // truncation, not rounding: (10+20+30+41)/4 = 101/4 = 25
    val px2 = px.clone(); px2(5) = gray(41)
    assert((ImageResize.resizePixels(4, 4, px2, 2, 2)(0) & 0xff) === 25)
    // all channels resized independently, alpha carried
    assert((out(0) >>> 24) === 0xff)
  }

  test("non-divisible dims use the aHash cell bounds; upscale takes nearest") {
    // 5×3 → 2×2: x cells [0,2),[2,5); y cells [0,1),[1,3)
    val px = Array.tabulate(15)(i => gray(i % 5 + 10 * (i / 5)))
    val out = ImageResize.resizePixels(5, 3, px, 2, 2)
    assert((out(0) & 0xff) === ((0 + 1) / 2)) // row 0, x 0-1
    assert((out(1) & 0xff) === ((2 + 3 + 4) / 3))
    assert((out(2) & 0xff) === ((10 + 11 + 20 + 21) / 4))
    assert((out(3) & 0xff) === ((12 + 13 + 14 + 22 + 23 + 24) / 6))
    // 2×2 → 4×4 upscale: empty regions replicate the nearest pixel
    val small = Array(gray(1), gray(2), gray(3), gray(4))
    val up = ImageResize.resizePixels(2, 2, small, 4, 4)
    assert(up.map(_ & 0xff).toSeq ===
      Seq(1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
  }

  test("resize composes with the perceptual hash: aHash survives downsampling") {
    // half-dark / half-bright 32×32 → resize to 16×16 → same aHash
    val w = 32; val h = 32
    val px = Array.tabulate(w * h) { i =>
      if (i % w < w / 2) gray(20) else gray(235)
    }
    val Some(orig) = ImageDedup.aHash64(w, h, px)
    val down = ImageResize.resizePixels(w, h, px, 16, 16)
    val Some(small) = ImageDedup.aHash64(16, 16, down)
    assert(java.lang.Long.bitCount(orig ^ small) === 0,
      "box-average downsampling must preserve the cell-mean structure")
    // oversized targets fail loudly instead of attempting the alloc
    intercept[IllegalArgumentException] {
      ImageResize.resizePixels(w, h, px, 100000, 100000)
    }
  }

  test("QOI re-encode round-trips exactly (alpha pinned to 255)") {
    val px = Array.tabulate(12)(i => gray((i * 37) % 256))
    val enc = ImageResize.qoiEncode(4, 3, px)
    val Some((w, h, back)) = ImageDedup.decodeQoiPixels(enc)
    assert((w, h) === ((4, 3)))
    assert(back.toSeq === px.toSeq)
    assert(enc.length === 14 + 4 * 12 + 8)
  }

  test("resizeMedia: decodable images shrink, everything else passes through") {
    import spark.implicits._
    val qoi = MediaSynth.qoi(6L) // real 14×9... dims from closed form
    val rows = Seq(
      MediaRow(0L, "image", qoi, "image/qoi", qoi.length.toLong),
      MediaRow(1L, "image", Array[Byte](9, 9, 9), "image/qoi", 3L),
      MediaRow(2L, "audio", Array[Byte](1, 2), "audio/wav", 2L))
    val out = ImageResize.resizeMedia(rows.toDS(), 4, 4).collect()
      .map(m => m.media_id -> m).toMap
    // the decodable image is now a 4×4 QOI payload
    val Some((w, h, _)) = ImageDedup.decodeQoiPixels(out(0L).media)
    assert((w, h) === ((4, 4)))
    assert(out(0L).byte_len === 86L)
    // undecodable image and audio rows untouched
    assert(out(1L).media.toSeq === Seq[Byte](9, 9, 9))
    assert(out(2L).media.toSeq === Seq[Byte](1, 2))
  }

  test("gate surface: real rows cross the pixel pipeline, fakes report passthrough") {
    val rep = ImageResize.resizeReport(spark, sf()).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(5), r.getLong(6)))).toMap
    val images = Multimodal.mediaTable(spark, sf())
      .filter(_.kind == "image").collect()
    assert(rep.size === images.length)
    images.foreach { m =>
      val (sw, sh, ob, ps) = rep(m.media_id)
      if (MediaSynth.isReal(m.media_id)) {
        assert((sw, sh) === ((MediaSynth.qoiWidth(m.media_id).toLong,
          MediaSynth.qoiHeight(m.media_id).toLong)))
        assert(ob === 86L)
        // px_sum is a genuine pixel digest: gray means in [0, 255]
        assert(ps >= 0L && ps <= 3L * 255 * 16, s"px_sum $ps out of range")
      } else {
        assert((sw, sh) === ((0L, 0L)))
        assert(ob === m.media.length.toLong)
        assert(ps === -1L)
      }
    }
  }
}
