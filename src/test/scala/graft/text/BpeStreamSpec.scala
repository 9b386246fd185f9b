package graft.text

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** BPE apply over a live document stream: same broadcast merge table,
  * same map-only pass — per-doc token counts must match the batch
  * encode exactly, batch by batch. */
class BpeStreamSpec extends SparkSpec {

  test("streaming BPE encode equals batch encode on every micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val merges = Bpe.trainMerges(spark, sf(), k = 8).map(m => (m._1, m._2))
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).toVector

    val input = MemoryStream[(Long, String)]
    val q = Bpe.encodeDocs(input.toDF().toDF("doc_id", "text"), merges)
      .writeStream.outputMode("append").format("memory")
      .queryName("bpestream").start()
    try {
      var consumed = Vector.empty[(Long, String)]
      for (chunk <- docs.grouped((docs.length / 3) + 1)) {
        input.addData(chunk)
        q.processAllAvailable()
        consumed ++= chunk
        val batch = Bpe.encodeDocs(consumed.toDF("doc_id", "text"), merges)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val got = spark.table("bpestream")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === batch, s"prefix of ${consumed.size} docs")
      }
      assert(spark.table("bpestream").count() === docs.length.toLong)
    } finally q.stop()
  }

  test("streaming token-id encode equals batch ids on every micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val merges = Bpe.trainMerges(spark, sf(), k = 8).map(m => (m._1, m._2))
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
      .take(120).toVector
    val input = MemoryStream[(Long, String)]
    val q = Bpe.encodeIdsDocs(input.toDF().toDF("doc_id", "text"), merges)
      .writeStream.outputMode("append").format("memory")
      .queryName("bpeidstream").start()
    try {
      var consumed = Vector.empty[(Long, String)]
      for (chunk <- docs.grouped((docs.length / 3) + 1)) {
        input.addData(chunk)
        q.processAllAvailable()
        consumed ++= chunk
        val batch = Bpe.encodeIdsDocs(consumed.toDF("doc_id", "text"), merges)
          .as[(Long, Seq[Int])].collect().toMap
        val got = spark.table("bpeidstream")
          .as[(Long, Seq[Int])].collect().toMap
        assert(got === batch, s"prefix of ${consumed.size} docs")
      }
    } finally q.stop()
  }
}
