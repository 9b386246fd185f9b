package graft.sim

import org.apache.spark.sql.SparkSession

/** Scale rehearsal for the r14 decode families — the measured-walls
  * discipline every new decoder has followed (BENCH_NOTES "133×
  * decode-gate walls"): synthesize + fully decode N WebP (VP8L, all
  * seven variant classes) and N FLAC (all subframe/assignment/
  * residual classes) payloads map-only and report the walls plus a
  * correctness spot-check, so the per-document decode cost at crawl
  * scale is a measured number, not an extrapolation.
  *
  * Run: `sbt "runMain graft.sim.DecodeScaleBench [nDocs]"` (default
  * 500000 — the 133× point of the r12/r13 rehearsals). */
object DecodeScaleBench {

  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toInt).getOrElse(500000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[decode-scale] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s (checksum $r)")
    }

    // map-only: synthesize on the executor, decode through the full
    // production path, fold a pixel/sample checksum (so nothing is
    // optimized away and a wrong decode changes the printed value)
    timed(s"webp encode+decode x $nDocs") {
      spark.range(0, nDocs.toLong).as[Long]
        .map { id =>
          graft.multimodal.Webp.decodePixels(graft.multimodal.MediaSynth.webp(id))
            .map { case (w, h, px) =>
              var s = 0L; var i = 0
              while (i < px.length) { s += px(i) & 0xff; i += 1 }
              s + w + h
            }.getOrElse(-1L)
        }.reduce(_ + _)
    }
    timed(s"flac encode+decode x $nDocs") {
      spark.range(0, nDocs.toLong).as[Long]
        .map { id =>
          graft.multimodal.Flac.decodePcm(graft.multimodal.MediaSynth.flac(id))
            .map { case (rate, ch, samples) =>
              var s = 0L; var i = 0
              while (i < samples.length) { s += samples(i); i += 1 }
              s + rate + ch
            }.getOrElse(-1L)
        }.reduce(_ + _)
    }

    timed(s"tiff encode+decode x $nDocs") {
      spark.range(0, nDocs.toLong).as[Long]
        .map { id =>
          graft.multimodal.Tiff.decodePixels(graft.multimodal.MediaSynth.tiff(id))
            .map { case (w, h, px) =>
              var s = 0L; var i = 0
              while (i < px.length) { s += px(i) & 0xff; i += 1 }
              s + w + h
            }.getOrElse(-1L)
        }.reduce(_ + _)
    }
    // zstd round-trip at a crawl-document shape: ~2 KB text per doc
    // through compress + the full decode path (Huffman literals, FSE
    // sequences, repcodes, checksum)
    timed(s"zstd compress+decompress x $nDocs") {
      spark.range(0, nDocs.toLong).as[Long]
        .map { id =>
          val text = new StringBuilder(2048)
          var i = 0
          while (i < 80) { text.append("w").append((id + i * 7) % 211).append(' '); i += 1 }
          text.append("tail of document ").append(id)
          val raw = text.toString.getBytes("UTF-8")
          graft.text.Zstd.decompress(graft.text.Zstd.compress(raw))
            .map { out =>
              var s = 0L; var k = 0
              while (k < out.length) { s += out(k); k += 1 }
              s
            }.getOrElse(-1L)
        }.reduce(_ + _)
    }

    // spot-check: the decode really is the closed form at scale ids
    val ids = Seq(0L, nDocs / 2L, nDocs - 1L)
    ids.foreach { id =>
      val Some((w, h, px)) =
        graft.multimodal.Webp.decodePixels(graft.multimodal.MediaSynth.webp(id))
      require(w == graft.multimodal.MediaSynth.webpW(id) &&
        h == graft.multimodal.MediaSynth.webpH(id) &&
        px(0) == graft.multimodal.MediaSynth.webpPixel(id, 0, 0),
        s"webp closed-form drift at id=$id")
      val Some((_, _, samples)) =
        graft.multimodal.Flac.decodePcm(graft.multimodal.MediaSynth.flac(id))
      val c = graft.multimodal.MediaSynth.flacChannels(id)
      var sum = 0
      for (ch <- 0 until c) sum += graft.multimodal.MediaSynth.flacEffSample(id, ch, 0)
      require(samples(0) == (sum / c).toShort, s"flac closed-form drift at id=$id")
    }
    println(s"[decode-scale] spot-check OK at ids ${ids.mkString(",")}")
    spark.stop()
  }
}
