package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming media ingest: the per-batch decode+hash landing replayed
  * through the delta-log (with its mid-stream staged compaction) must
  * reassemble to EXACTLY the one-shot signature frame, and the pair
  * set must equal the one-shot gate's. */
class MediaStreamSpec extends SparkSpec {

  test("stream-landed index == one-shot signatures; pairs == the one-shot gate") {
    import spark.implicits._
    val streamPairs = MediaStream.imageDedupStream(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShotPairs = graft.multimodal.Jpeg.imageDedupJpeg(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamPairs === oneShotPairs)
    assert(streamPairs.nonEmpty)
    // the streamed dump IS the one-shot signature frame, row for row
    val streamed = spark.read.parquet(
        graft.streaming.MediaStream.dumpPath(
          graft.streaming.MediaStream.lastBase))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id").as[Long]
      .map(id => (id, graft.multimodal.ImageDedup.imageHash(
        graft.multimodal.Jpeg.dedupPayload(id))))
      .collect().toSet
    assert(streamed === oneShot)
    // (the compaction protocol itself — staged _SUCCESS commit, crash
    // roll-forward — is pinned by the DriftStreamSpec family; here the
    // mid-stream compact sits INSIDE the replay whose frame equality
    // was just asserted)
  }

  test("batch-count invariance: 2 and 5 batches land the identical pair set") {
    val p2 = MediaStream.imageDedupStream(spark, sf(), nBatches = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p5 = MediaStream.imageDedupStream(spark, sf(), nBatches = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2 === p5)
  }
}
