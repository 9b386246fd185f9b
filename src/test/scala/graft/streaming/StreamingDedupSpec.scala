package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact dedup — documents arriving as a stream are emitted
  * once per fingerprint, with a watermark bounding the dedup state
  * (the unbounded-state mitigation for continuous ingestion). */
class StreamingDedupSpec extends SparkSpec {

  final case class Doc(doc_id: Long, fp: String, t: Timestamp)
  private def ts(min: Long): Timestamp = new Timestamp((1000000L + min) * 60000)

  test("dropDuplicates over a stream: one row per fingerprint across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = input.toDS().toDF("doc_id", "fp", "t")
      .withWatermark("t", "10 minutes")
      .dropDuplicates("fp")
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup").start()
    try {
      input.addData(Seq((1L, "A", ts(0)), (2L, "B", ts(1)), (3L, "A", ts(2))))
      q.processAllAvailable()
      // same fingerprints replayed in a later batch: suppressed
      input.addData(Seq((4L, "A", ts(3)), (5L, "B", ts(4)), (6L, "C", ts(5))))
      q.processAllAvailable()
      val rows = spark.table("sdedup").select("fp", "doc_id").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows.keySet === Set("A", "B", "C"))
      assert(rows("A") === 1L && rows("B") === 2L && rows("C") === 6L,
        s"first-seen doc must win: $rows")
    } finally q.stop()
  }

  test("streaming dedup matches batch dedup on the documents fingerprints") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.text.TextAnalysis.fingerprint(spark, sf())
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = input.toDS().toDF("doc_id", "fp", "t")
      .withWatermark("t", "10 minutes")
      .dropDuplicates("fp")
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup2").start()
    try {
      val (h1, h2) = docs.splitAt(docs.length / 2)
      input.addData(h1.map { case (id, fp) => (id, fp, ts(id)) })
      q.processAllAvailable()
      input.addData(h2.map { case (id, fp) => (id, fp, ts(id)) })
      q.processAllAvailable()
      val streamed = spark.table("sdedup2").count()
      val batch = docs.map(_._2).distinct.length.toLong
      assert(streamed === batch)
    } finally q.stop()
  }
}
