package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.multimodal.Multimodal.MediaRow

/** Image RESIZE — the corpus transform between decode and
  * feature-extract in a multimodal pipeline (downsample to the model's
  * input resolution before feature extraction or storage). Box-filter
  * area averaging, INTEGER-EXACT: output channel = ⌊channel sum /
  * count⌋ over the source region [cx·w/tw, (cx+1)·w/tw) ×
  * [cy·h/th, (cy+1)·h/th) — the same integer cell partitioning the
  * aHash uses, so the arithmetic is exactly reproducible in any
  * engine (no floating-point kernels, no rounding modes). Upscale
  * cells with an empty source region take the nearest source pixel.
  *
  * The transform re-encodes resized pixels as a canonical QOI stream
  * (one QOI_OP_RGB per pixel — valid per the public spec, not
  * size-optimal), so the output is itself a decodable media payload
  * the rest of the pipeline (hashing, feature extraction, further
  * resizing) consumes unchanged. Payloads the pure-JVM decoders
  * cannot read pass through untouched — the same honesty contract as
  * [[ImageDedup]]'s stub hash.
  *
  * Scale: map-only over the media table, output payloads are
  * O(tw·th) regardless of source size — a resize pass SHRINKS the
  * corpus. Gate story (`mm_resize`): the gate corpus' real QOI rows
  * have closed-form pixels ([[MediaSynth.qoiGray]]), so DuckDB
  * re-derives the full decode → box-average → re-encode → re-decode
  * pixel arithmetic from doc_id alone — the one multimodal gate whose
  * oracle recomputes actual pixel values rather than trusting a dump.
  */
object ImageResize {

  /** Area-average resize of ARGB pixels (per-channel integer mean,
    * truncating division). */
  private[multimodal] def resizePixels(w: Int, h: Int, argb: Array[Int],
      tw: Int, th: Int): Array[Int] = {
    require(tw > 0 && th > 0, "target dims must be positive")
    // bound the OUTPUT allocation like the decoders bound their input:
    // a caller-supplied target is config, not corpus bytes, but a typo'd
    // 1e5 x 1e5 must fail loudly here, not as a negative-size alloc
    require(tw.toLong * th <= ImageDedup.MaxPixels,
      s"target $tw x $th exceeds MaxPixels")
    val out = new Array[Int](tw * th)
    var cy = 0
    while (cy < th) {
      val y0 = (cy.toLong * h / th).toInt
      val y1 = ((cy + 1).toLong * h / th).toInt
      var cx = 0
      while (cx < tw) {
        val x0 = (cx.toLong * w / tw).toInt
        val x1 = ((cx + 1).toLong * w / tw).toInt
        var sa = 0L; var sr = 0L; var sg = 0L; var sb = 0L; var cnt = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = argb(y * w + x)
            sa += (p >>> 24) & 0xff; sr += (p >>> 16) & 0xff
            sg += (p >>> 8) & 0xff; sb += p & 0xff
            cnt += 1
            x += 1
          }
          y += 1
        }
        out(cy * tw + cx) =
          if (cnt == 0) // upscale: empty region, take the nearest pixel
            argb(math.min(y0, h - 1) * w + math.min(x0, w - 1))
          else
            ((sa / cnt).toInt << 24) | ((sr / cnt).toInt << 16) |
              ((sg / cnt).toInt << 8) | (sb / cnt).toInt
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** Minimal canonical QOI encoder: header + one QOI_OP_RGB per pixel
    * (alpha is dropped — the 3-channel header says so) + the spec's
    * end marker. Always a valid stream; [[ImageDedup.decodeQoiPixels]]
    * round-trips it exactly with a = 255. */
  private[multimodal] def qoiEncode(w: Int, h: Int, argb: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(22 + 4 * w * h)
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    be32(w); be32(h)
    out.write(3); out.write(0)
    var i = 0
    while (i < argb.length) {
      val p = argb(i)
      out.write(0xfe)
      out.write((p >>> 16) & 0xff); out.write((p >>> 8) & 0xff); out.write(p & 0xff)
      i += 1
    }
    i = 0
    while (i < 7) { out.write(0); i += 1 }
    out.write(1)
    out.toByteArray
  }

  private def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    ImageDedup.decodeQoiPixels(bytes).orElse(ImageDedup.decodeBmpPixels(bytes))
      .orElse(Jpeg.decodePixels(bytes)) // baseline JPEG, r12

  /** The corpus transform: image rows with decodable payloads are
    * replaced by their (tw × th) QOI re-encoding; everything else
    * (other kinds, undecodable images) passes through unchanged. */
  def resizeMedia(media: Dataset[MediaRow], tw: Int = 64, th: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.kind != "image") m
      else decode(m.media) match {
        case Some((w, h, px)) =>
          val enc = qoiEncode(tw, th, resizePixels(w, h, px, tw, th))
          m.copy(media = enc, byte_len = enc.length.toLong)
        case None => m
      }
    }
  }

  /** Gate surface (`mm_resize`): per image row, the resize pipeline's
    * integer digests — source dims, output dims and byte length, and
    * `px_sum` = Σ(r+g+b) over the pixels of the DE-CODED re-encoding
    * (so decode → resize → encode → decode all sit inside the gate
    * arithmetic). Undecodable rows report (0, 0) dims, the passthrough
    * byte length, and px_sum = -1. */
  def resizeReport(spark: SparkSession, sfDir: String, tw: Int = 4,
      th: Int = 4): DataFrame = {
    val media = Multimodal.mediaTable(spark, sfDir)
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").map { m =>
      decode(m.media) match {
        case Some((w, h, px)) =>
          val enc = qoiEncode(tw, th, resizePixels(w, h, px, tw, th))
          val ps = ImageDedup.decodeQoiPixels(enc).map { case (_, _, p2) =>
            var s = 0L; var i = 0
            while (i < p2.length) {
              val p = p2(i)
              s += ((p >>> 16) & 0xff) + ((p >>> 8) & 0xff) + (p & 0xff)
              i += 1
            }
            s
          }.getOrElse(-2L)
          (m.media_id, w.toLong, h.toLong, tw.toLong, th.toLong,
            enc.length.toLong, ps)
        case None =>
          (m.media_id, 0L, 0L, 0L, 0L, m.media.length.toLong, -1L)
      }
    }.toDF("media_id", "src_w", "src_h", "out_w", "out_h", "out_bytes", "px_sum")
  }
}
