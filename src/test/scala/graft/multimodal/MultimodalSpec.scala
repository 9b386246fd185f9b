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
