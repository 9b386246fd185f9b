package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media table: binary payload round-trips the source bytes") {
    val m = Multimodal.mediaTable(spark, sf()).collect()
    val texts = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    m.take(20).foreach { r =>
      assert(new String(r.media, "UTF-8") === texts(r.media_id))
      assert(Set("image", "audio", "video").contains(r.kind))
    }
  }

  test("feature extraction is batch-size invariant (vectorized-call shape)") {
    val a = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf()), batchSize = 1)
      .collect().sortBy(_.media_id).toSeq
    val b = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf()), batchSize = 500)
      .collect().sortBy(_.media_id).toSeq
    assert(a === b)
  }

  test("stub decode: deterministic, kind-consistent features") {
    Multimodal.features(spark, sf()).collect().foreach { r =>
      val kind = r.getAs[String]("kind")
      val frames = r.getAs[Long]("n_frames")
      val dur = r.getAs[Long]("duration_ms")
      if (kind == "image") assert(frames === 1L && dur === 0L)
      if (kind == "video") assert(frames >= 1L && dur === frames * 40L)
      if (kind == "audio") assert(dur === r.getAs[Long]("byte_len") * 8L)
      assert(r.getAs[Long]("width") >= 64L && r.getAs[Long]("height") >= 64L)
    }
  }

  test("frame sampling: videos only, <= 8 evenly-strided frames, full span") {
    val frames = Multimodal.frameSample(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(frames.nonEmpty)
    val nFrames = Multimodal.features(spark, sf())
      .filter(col("kind") === "video").collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("n_frames")).toMap
    val byVideo = frames.groupBy(_._1)
    assert(byVideo.keySet === nFrames.keySet) // every video sampled, nothing else
    byVideo.foreach { case (id, fs) =>
      val n = nFrames(id)
      val stride = (n + 7) / 8
      val idx = fs.map(_._2).sorted.toSeq
      assert(idx === (0L until n by stride).toSeq)
      assert(idx.size <= 8)
      fs.foreach { case (_, i, luma) =>
        assert(luma === (id * 31 + i * 7) % 256)
      }
    }
  }

  test("real WAV/BMP/PNG headers decode truthfully; corpus payloads still take the stub") {
    import spark.implicits._
    // a real canonical PCM WAV: 8 kHz, 16-bit mono (byteRate 16000),
    // 32000 data bytes -> exactly 2000 ms
    def leInt(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def leShort(v: Int): Array[Byte] =
      Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val dataLen = 32000
    val wav: Array[Byte] =
      "RIFF".getBytes ++ leInt(36 + dataLen) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ leInt(16) ++ leShort(1) ++ leShort(1) ++
      leInt(8000) ++ leInt(16000) ++ leShort(2) ++ leShort(16) ++
      "data".getBytes ++ leInt(dataLen) ++ Array.fill(dataLen)(0x5a.toByte)
    // a real 24-bit BMP header: 640 × -480 (top-down; |height| = 480)
    val bmp: Array[Byte] =
      "BM".getBytes ++ leInt(54) ++ leInt(0) ++ leInt(54) ++
      leInt(40) ++ leInt(640) ++ leInt(-480) ++ leShort(1) ++ leShort(24) ++
      leInt(0) ++ leInt(0) ++ leInt(0) ++ leInt(0) ++ leInt(0) ++ leInt(0)
    // a real PNG signature + IHDR chunk: 1920 × 1080, 8-bit RGBA
    def beInt(v: Int): Array[Byte] = Array[Byte](
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val png: Array[Byte] =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      beInt(13) ++ "IHDR".getBytes ++ beInt(1920) ++ beInt(1080) ++
      Array[Byte](8, 6, 0, 0, 0) ++ beInt(0) /* CRC not verified */ ++
      beInt(0) ++ "IDAT".getBytes // compressed pixel data would follow
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", wav, "audio/wav", wav.length.toLong),
      Multimodal.MediaRow(2L, "image", bmp, "image/bmp", bmp.length.toLong),
      // declared mime lies — content sniffing must still win
      Multimodal.MediaRow(3L, "image", wav, "image/png", wav.length.toLong),
      Multimodal.MediaRow(4L, "image", png, "image/png", png.length.toLong)
    ).toDS()
    val got = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert((got(1L).width, got(1L).height, got(1L).n_frames, got(1L).duration_ms)
      === ((0L, 0L, 1L, 2000L)), "WAV: 32000 bytes / 16000 B/s = 2000 ms")
    assert((got(2L).width, got(2L).height, got(2L).n_frames, got(2L).duration_ms)
      === ((640L, 480L, 1L, 0L)), "BMP: 640x480 from the header, top-down abs")
    assert(got(3L).duration_ms === 2000L, "sniffing beats the declared mime")
    assert((got(4L).width, got(4L).height, got(4L).n_frames, got(4L).duration_ms)
      === ((1920L, 1080L, 1L, 0L)), "PNG: 1920x1080 from the IHDR chunk")
    // the gate corpus carries text bytes, not media magic: every row
    // must fall back to the stub (mm_features' oracle arithmetic)
    val corpus = Multimodal.mediaTable(spark, sf()).collect()
    assert(corpus.forall(r => Multimodal.decodeHeaders(r.media).isEmpty),
      "no corpus payload may accidentally sniff as real media")
    // malformed/truncated headers fall back instead of throwing
    assert(Multimodal.decodeHeaders("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.decodeHeaders("BM".getBytes).isEmpty)
    assert(Multimodal.decodeHeaders(wav.take(40)).isEmpty)
    assert(Multimodal.decodeHeaders(png.take(20)).isEmpty,
      "truncated PNG (signature but no full IHDR) must fall back")
    val notIhdrFirst = png.clone()
    System.arraycopy("gAMA".getBytes, 0, notIhdrFirst, 12, 4)
    assert(Multimodal.decodeHeaders(notIhdrFirst).isEmpty,
      "PNG whose first chunk is not IHDR is malformed → stub")
    val zeroDim = png.clone()
    System.arraycopy(beInt(0), 0, zeroDim, 16, 4)
    assert(Multimodal.decodeHeaders(zeroDim).isEmpty,
      "zero-width PNG is malformed → stub")
  }

  test("metadata rollup covers all kinds and never touches the payload") {
    val df = Multimodal.kindSummary(spark, sf())
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSet === Set("image", "audio", "video"))
    assert(rows.map(_.getAs[Long]("n")).sum ===
      spark.read.parquet(s"${sf()}/documents.parquet").count())
    // the binary column must be pruned out of the plan entirely
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("AS media"), s"payload column not pruned:\n$plan")
  }
}
