package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LshIndexSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"lshidx_$name")
    d.toFile.deleteOnExit()
    s"$d/idx"
  }

  test("probe equals the one-shot LSH operator restricted to batch pairs") {
    val all = Dedup.docShingles(spark, sf())
    val path = tmp("full")
    LshIndex.build(all.filter(col("doc_id") % 10 =!= 0), path)
    val got = pairs(LshIndex.probe(spark, sf(), path,
      all.filter(col("doc_id") % 10 === 0)))
    val oneShot = pairs(Dedup.minhashLsh(spark, sf()))
      .filter { case (i, j) => i % 10 == 0 || j % 10 == 0 }
    assert(got === oneShot)
    // and no index-internal pair leaks through
    got.foreach { case (i, j) =>
      assert(i % 10 == 0 || j % 10 == 0, s"index-internal pair ($i, $j)")
    }
  }

  test("incremental append: build(A) + append(B) probes like build(A ∪ B)") {
    val all = Dedup.docShingles(spark, sf())
    val idxDocs = all.filter(col("doc_id") % 10 =!= 0)
    val batch = all.filter(col("doc_id") % 10 === 0)
    val pInc = tmp("inc"); val pFull = tmp("oneshot")
    LshIndex.build(idxDocs.filter(col("doc_id") % 2 === 1), pInc)
    LshIndex.append(idxDocs.filter(col("doc_id") % 2 === 0), pInc)
    LshIndex.build(idxDocs, pFull)
    assert(pairs(LshIndex.probe(spark, sf(), pInc, batch)) ===
      pairs(LshIndex.probe(spark, sf(), pFull, batch)))
  }

  test("gate query is deterministic and reuses the session index") {
    val a = pairs(LshIndex.dedupIncremental(spark, sf()))
    val b = pairs(LshIndex.dedupIncremental(spark, sf()))
    assert(a === b)
    assert(a.nonEmpty, "planted near-dups should cross the batch split")
  }

  test("streaming ingestion: foreachBatch append grows the index probe-exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = Dedup.docShingles(spark, sf())
    val idxDocs = all.filter(col("doc_id") % 10 =!= 0)
    val batch = all.filter(col("doc_id") % 10 === 0)
    // seed build on a backfill slice, stream the rest in micro-batches
    val pStream = tmp("stream"); val pBatch = tmp("batchref")
    LshIndex.build(idxDocs.filter(col("doc_id") < 250), pStream)
    val live = idxDocs.filter(col("doc_id") >= 250)
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    val input = MemoryStream[(Long, Seq[String])]
    val q = input.toDS().toDF("doc_id", "sh").writeStream
      .foreachBatch { (ds: org.apache.spark.sql.DataFrame, _: Long) =>
        LshIndex.append(ds, pStream); ()
      }.start()
    try {
      live.grouped(100).foreach { chunk => input.addData(chunk.toSeq); q.processAllAvailable() }
    } finally q.stop()
    LshIndex.build(idxDocs, pBatch)
    assert(pairs(LshIndex.probe(spark, sf(), pStream, batch)) ===
      pairs(LshIndex.probe(spark, sf(), pBatch, batch)))
  }

  test("index stores fixed-size keys, not shingles (16 rows per doc)") {
    val all = Dedup.docShingles(spark, sf())
    val path = tmp("shape")
    LshIndex.build(all.filter(col("doc_id") % 10 =!= 0), path)
    val idx = spark.read.parquet(path)
    assert(idx.columns.toSet === Set("doc_id", "band", "h"))
    val perDoc = idx.groupBy(col("doc_id")).count()
      .agg(min(col("count")), max(col("count"))).head()
    assert(perDoc.getLong(0) === 16L)
    assert(perDoc.getLong(1) === 16L)
  }
}
