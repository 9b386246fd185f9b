package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming zstd ingest: the delta-log replay must reproduce the
  * one-shot batch report exactly (including mid-stream compaction),
  * and the zstd → clean → dedup → pack composition must equal the
  * batch corpus pipeline over every consumed prefix — [[GzipStream]]'s
  * contract carried onto the RFC 8878 codec. */
class ZstdStreamSpec extends SparkSpec {

  private val base = 86400000L

  test("delta-log replay equals the one-shot batch report; compaction really folded") {
    val got = ZstdStream.ingestStream(spark, sf(), nBatches = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = graft.text.CompressedIngest.zstdIngestReport(spark, sf())
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === want)
    val idx = graft.core.SessionScratch.path(spark, sf(), "graft_zstd_stream")
    val parts = DeltaIndex.listBatches(spark, idx)
    assert(parts.exists(_.contains("/c")), s"no compacted fold in $parts")
    assert(!parts.exists(p => p.endsWith("/b0") || p.endsWith("/b1")),
      s"folded batches still listed: $parts")
  }

  test("zstd -> prepareStream composition equals the batch pipeline on every prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1).take(120).toVector
    // a truncated frame mid-stream: the decode stage must DROP it
    val rows = corpus.map { case (id, text) =>
      val z = graft.text.Zstd.compress(
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (id, if (id % 37 == 11) z.take(z.length / 2) else z,
        new Timestamp(base + id * 1000L))
    }

    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val stream = StreamingCorpusPipeline.prepareStream(
      ZstdStream.decoded(input.toDF().toDF("doc_id", "zst", "t")))
    val q = stream.toDF().writeStream.outputMode("append")
      .format("memory").queryName("zstdstream").start()
    try {
      var consumed = Vector.empty[(Long, Array[Byte], Timestamp)]
      for (chunk <- rows.grouped((rows.length / 3) + 1)) {
        input.addData(chunk)
        q.processAllAvailable()
        consumed ++= chunk
        val decodable = consumed.filter { case (id, _, _) => id % 37 != 11 }
          .map { case (id, _, _) => (id, corpus.find(_._1 == id).get._2) }
        val batchTwin = graft.text.CorpusPipeline.prepareDf(
          decodable.toDF("doc_id", "text"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        val got = spark.table("zstdstream")
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        assert(got === batchTwin, s"prefix of ${consumed.size} members")
      }
    } finally q.stop()
  }
}
