package graft.streaming

import graft.SparkSpec
import graft.text.CorpusPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream ≡ batch for the flagship corpus-prep pipeline: the streaming
  * query (watermarked dedup + single-cursor packing) must assign every
  * document the same pack as the batch pipeline run over the consumed
  * prefix, after EVERY micro-batch. Delivery is in doc_id order, which
  * aligns the stream's keep-first-arrival dedup with the batch
  * min-doc_id rule; synthetic duplicate docs (injected with later ids)
  * exercise the dedup stage since the corpus has no exact dups. */
class StreamingCorpusPipelineSpec extends SparkSpec {

  private val base = 86400000L // epoch + 1 day: watermarking drops epoch-0 rows

  test("streaming pipeline equals the batch pipeline on every prefix (with dups)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1).toVector
    // inject exact duplicates of early docs, with LATER doc_ids: batch
    // dedup keeps the min-id copy, the stream keeps the first arrival —
    // same answer under in-order delivery
    val maxId = corpus.last._1
    val dups = corpus.take(5).zipWithIndex.map { case ((_, text), i) =>
      (maxId + 1 + i, text)
    }
    val rows = (corpus ++ dups).map { case (id, text) =>
      (id, text, new Timestamp(base + id * 1000L))
    }

    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = StreamingCorpusPipeline.prepareStream(
      input.toDF().toDF("doc_id", "text", "t"))
    val q = stream.toDF().writeStream.outputMode("append")
      .format("memory").queryName("packstream").start()
    try {
      var consumed = Vector.empty[(Long, String, Timestamp)]
      for (chunk <- rows.grouped((rows.length / 3) + 1)) {
        input.addData(chunk)
        q.processAllAvailable()
        consumed ++= chunk
        val batchTwin = CorpusPipeline.prepareDf(
          consumed.map { case (id, text, _) => (id, text) }
            .toDF("doc_id", "text"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        val got = spark.table("packstream")
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        assert(got === batchTwin, s"prefix of ${consumed.size} docs")
      }
      // the duplicates were really dropped by the STREAM's dedup state
      val ids = spark.table("packstream").select("doc_id")
        .as[Long].collect().toSet
      assert(dups.forall { case (id, _) => !ids.contains(id) },
        "a duplicate document survived the streaming dedup")
    } finally q.stop()
  }

  test("packStream cursor is continuous across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[graft.text.SequencePacking.DocTokens]
    val q = StreamingCorpusPipeline.packStream(input.toDS(), budget = 10L)
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("cursor").start()
    try {
      input.addData(Seq(
        graft.text.SequencePacking.DocTokens(1L, 6L),
        graft.text.SequencePacking.DocTokens(2L, 6L))) // crosses into pack 1
      q.processAllAvailable()
      input.addData(Seq(
        graft.text.SequencePacking.DocTokens(3L, 9L))) // state carries 12 → pack 1
      q.processAllAvailable()
      val got = spark.table("cursor")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
    } finally q.stop()
  }
}
