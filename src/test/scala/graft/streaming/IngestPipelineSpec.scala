package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class IngestPipelineSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp((1000000L + min) * 60000)

  test("clean -> fingerprint -> dedup -> idempotent sink, end to end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = "/tmp/graft_ingest_out"
    val ckpt = "/tmp/graft_ingest_ckpt"
    for (d <- Seq(out, ckpt)) {
      val f = new java.io.File(d)
      if (f.exists()) { scala.reflect.io.Directory(f).deleteRecursively() }
    }
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = IngestPipeline.start(
      input.toDS().toDF("doc_id", "text", "t"), out, ckpt)
    try {
      // batch 0: whitespace variants + distinct URLs that scrub to the
      // same cleaned text — all one fingerprint; plus one clean doc
      input.addData(Seq(
        (1L, "visit https://a.example/x now", ts(0)),
        (2L, "visit   https://b.example/y \t now", ts(1)),
        (3L, "plain words only", ts(2))))
      q.processAllAvailable()
      // batch 1: replay of the same content under new ids — suppressed
      input.addData(Seq(
        (4L, "visit https://c.example/z now", ts(3)),
        (5L, "plain  words   only", ts(4)),
        (6L, "fresh document", ts(5))))
      q.processAllAvailable()
      val landed = spark.read.parquet(s"$out/batch=*")
        .select("doc_id", "fp", "clean_text").collect()
        .map(r => (r.getLong(0), r.getString(2)))
      // exactly one row per distinct cleaned text, first-seen id wins
      assert(landed.toMap.values.toSet ===
        Set("visit <url> now", "plain words only", "fresh document"))
      assert(landed.map(_._1).sorted.toSeq === Seq(1L, 3L, 6L))
      // batch dirs are the idempotent-sink layout
      val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("batch="))
      assert(dirs.nonEmpty)
    } finally q.stop()
  }

  test("pipeline equals the batch formulation on the corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String, Timestamp)]
    // delay covering the fixture's whole event-time span: within the
    // watermark the within-watermark dedup equals global distinct
    val streamed = IngestPipeline.cleaned(
        input.toDS().toDF("doc_id", "text", "t"), watermarkDelay = "600 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("ingest_eq").start()
    try {
      val (h1, h2) = docs.splitAt(docs.length / 2)
      input.addData(h1.map { case (id, tx) => (id, tx, ts(id)) })
      streamed.processAllAvailable()
      input.addData(h2.map { case (id, tx) => (id, tx, ts(id)) })
      streamed.processAllAvailable()
      val got = spark.table("ingest_eq").count()
      val batch = docs.toSeq.toDF("doc_id", "text")
        .select(graft.text.Cleaning.scrub(col("text")).as("c"))
        .select(md5(col("c"))).distinct().count()
      assert(got === batch)
    } finally streamed.stop()
  }
}
