package graft.streaming

import graft.SparkSpec
import graft.dedup.SemIndex
import graft.sim.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The registered streaming chunk → embed → probe gate
  * (`dedup_semantic_stream`): (1) the gate's ordered doc_id-range
  * replay equals the SAME batches driven through real Structured
  * Streaming machinery (MemoryStream + foreachBatch) — the probe loop
  * is batching-SENSITIVE (within-batch priority is part of the rule),
  * so the pin is engine-equality at the gate's batching, while the
  * arbitrary-batching crawl loop stays pinned against the sequential
  * oracle in ChunkStreamSpec; (2) the verdict mix is real; (3) the
  * τ-tie audit behind [[SemStream.Tau]]'s choice: every pairwise
  * chunk-vector cosine on the gate fixture keeps a real gap from τ,
  * so a 1-ulp cross-engine cosine difference can never flip a
  * verdict. */
class SemStreamSpec extends SparkSpec {

  test("gate replay equals the same batches under MemoryStream + foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = sf()
    val expected = SemStream.chunkProbeStream(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq

    // identical index construction at a fresh path
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_semstream_spec").toString
    val vecs = SemStream.chunkVecs(spark, dir).localCheckpoint()
    SemIndex.build(vecs.filter(v => (v.vec_id >> 32) % 10 != 0), idxPath,
      trainer = graft.sim.Kmeans.trainOrdered)

    // the gate's four doc_id-range batches, through the real stream
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val maxId = docs.map(_._1).max
    val step = maxId / 4 + 1
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Boolean)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (ds: DataFrame, _: Long) =>
        val batch = SemStream.chunkVecsOf(ds)
          .filter(v => (v.vec_id >> 32) % 10 == 0)
        val out = SemStream.probeAppendBatch(spark, vecs, idxPath, batch,
          SemStream.Tau).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
        acc.synchronized { acc ++= out }
        ()
      }.start()
    try {
      (0 until 4).foreach { b =>
        val g = docs.filter(d => d._1 >= b * step && d._1 < (b + 1) * step)
        input.addData(g.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    assert(acc.sortBy(_._1).toSeq === expected,
      "foreachBatch execution must equal the registered replay surface")
  }

  test("gate fixture exercises both verdicts and the index side is populated") {
    val out = SemStream.chunkProbeStream(spark, sf("sf0.01")).collect()
    val kept = out.count(_.getBoolean(3))
    assert(kept > 0 && kept < out.length,
      s"need a kept/dropped mix, got $kept/${out.length} kept")
  }

  test("no compared cosine can tie tau: pairwise gap is real on the fixtures") {
    // superset audit: ALL pairwise cosines among the corpus' chunk
    // vectors (the rule only compares within cells and against
    // centroids-assigned slices — every compared pair is in here)
    for (d <- Seq("sf0.001", "sf0.01")) {
      val vs = SemStream.chunkVecs(spark, sf(d)).collect()
      var minGap = Double.MaxValue
      var i = 0
      while (i < vs.length) {
        var j = i + 1
        while (j < vs.length) {
          val g = math.abs(Similarity.cosine(vs(i), vs(j)) - SemStream.Tau)
          if (g < minGap) minGap = g
          j += 1
        }
        i += 1
      }
      assert(minGap > 1e-9,
        s"$d: a chunk-pair cosine sits $minGap from tau — verdict could flip")
    }
  }
}
