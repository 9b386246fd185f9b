package graft.streaming

import graft.SparkSpec
import graft.dedup.SemIndex
import graft.sim.{CentroidIndex, Kmeans, Similarity}
import graft.sim.Similarity.Vec
import graft.text.{Embed, SequencePacking}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The chunk-stream ingest flagship: documents arrive as micro-batches,
  * get chunked, then (a) packed into fixed token budgets continuing the
  * global prefix sum — stream ≡ the one-shot batch operator exactly —
  * and (b) embedded and probed against the persisted semantic index in
  * a probe-then-append crawl loop, matched against a sequential
  * driver-side oracle of the probe rule. */
class ChunkStreamSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_chunkstream_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("streaming chunk-pack ingest equals the one-shot batch pack") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val packer = new ChunkIngest.StreamPacker(budget = 256L)
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (ds: DataFrame, _: Long) =>
        acc.synchronized {
          acc ++= packer.packBatch(ds).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        }
        ()
      }.start()
    try {
      docs.grouped(120).foreach { g =>
        input.addData(g.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val batch = SequencePacking.packChunks(spark, sf(), 256L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(acc.sorted.toSeq === batch,
      "micro-batched chunk packing must equal the one-shot pack")
    assert(packer.total === batch.map(_._3).sum,
      "carried token total must equal the corpus token sum")
    assert(batch.map(_._4).distinct.length > 1, "fixture spans several packs")
  }

  private val enc = new Embed.HashEncoder(16)

  /** Mirror of [[Similarity.loadVectors]]' float round-trip over an
    * in-flight embedding column, so stream-side vectors are bit-equal
    * to the ones the index re-fetches from the corpus table. */
  private def toVecs(df: DataFrame): Dataset[Vec] = {
    import spark.implicits._
    df.select(col("vec_id"),
        expr("transform(embedding, x -> cast(cast(x AS float) AS double))").as("v"))
      .select(col("vec_id"), col("v"),
        expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))").as("nrm"))
      .as[Vec]
  }

  test("chunk -> embed -> semantic probe/append crawl loop matches a sequential oracle") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tau = 0.9
    val corpusDir = tmp("semchunk") // plays the sfDir role for the index
    val idxPath = tmp("semchunk_idx")
    val docsDf = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id", "text")
    // every chunk's embedding becomes the corpus embeddings table
    // (vec_id = doc_id * 1024 + chunk_id, float-typed like the fixture)
    val emb = Embed.embedChunks(docsDf, enc)
      .select((col("doc_id") * 1024 + col("chunk_id")).as("vec_id"),
        expr("transform(embedding, x -> cast(x AS float))").as("embedding"))
    emb.write.mode("overwrite").parquet(s"$corpusDir/embeddings.parquet")
    val all = Similarity.loadVectors(spark, corpusDir)
    val allVecs = all.collect()
    assert(allVecs.forall(v => v.vec_id % 1024 < 1024), "chunk ids fit the id scheme")
    val cut = 250L * 1024
    SemIndex.build(all.filter(v => v.vec_id < cut), idxPath, k = 8, iters = 2)

    // ── stream: chunk + embed each doc micro-batch, probe, append kept
    val batchDocs = docsDf.as[(Long, String)].collect()
      .filter(_._1 >= 250L).sortBy(_._1)
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Boolean)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (ds: DataFrame, _: Long) =>
        val vecs = toVecs(Embed.embedChunks(ds, enc)
          .select((col("doc_id") * 1024 + col("chunk_id")).as("vec_id"),
            col("embedding")))
        val out = SemIndex.probe(spark, corpusDir, idxPath, vecs, tau).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
        val keptIds = out.filter(_._4).map(_._1).toSet
        acc.synchronized { acc ++= out }
        SemIndex.append(spark, idxPath, vecs.filter(v => keptIds.contains(v.vec_id)))
        ()
      }.start()
    try {
      batchDocs.grouped(100).foreach { g =>
        input.addData(g.toSeq); q.processAllAvailable()
      }
    } finally q.stop()

    // ── sequential driver oracle of the probe rule, same batch order
    val cents = spark.read.parquet(s"$idxPath/cents").collect()
      .map(r => Kmeans.Centroid(r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_.cell)
    val idx = CentroidIndex.build(cents)
    val centVecs = cents.map(c =>
      Vec(-1L, c.v, math.sqrt(c.v.map(x => x * x).sum)))
    def assign(v: Vec): (Int, Double) = {
      val cell = idx.nearest(v)
      (cell, Similarity.cosine(v, centVecs(cell)))
    }
    val members = scala.collection.mutable.Map.empty[Int,
      scala.collection.mutable.ArrayBuffer[Vec]]
    allVecs.filter(_.vec_id < cut).foreach { v =>
      members.getOrElseUpdate(assign(v)._1,
        scala.collection.mutable.ArrayBuffer.empty[Vec]) += v
    }
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double, Boolean)]
    batchDocs.grouped(100).foreach { g =>
      val ids = g.map(_._1).toSet
      val bvecs = allVecs.filter(v => ids.contains(v.vec_id / 1024))
      bvecs.map { v => val (c, s) = assign(v); (c, s, v) }
        .groupBy(_._1).foreach { case (cell, ms0) =>
          val ms = ms0.sortBy { case (_, s, v) => (s, v.vec_id) }
          val idxMembers = members.getOrElse(cell,
            scala.collection.mutable.ArrayBuffer.empty[Vec])
          val dropped = new Array[Boolean](ms.length)
          for (i <- ms.indices) {
            val x = ms(i)._3
            var hit = idxMembers.exists(m => Similarity.cosine(x, m) >= tau)
            var j = 0
            while (j < i && !hit) {
              if (Similarity.cosine(x, ms(j)._3) >= tau) hit = true
              j += 1
            }
            dropped(i) = hit
          }
          for (i <- ms.indices) {
            val (c, s, v) = ms(i)
            expected += ((v.vec_id, c, s, !dropped(i)))
            if (!dropped(i))
              members.getOrElseUpdate(c,
                scala.collection.mutable.ArrayBuffer.empty[Vec]) += v
          }
        }
    }
    val got = acc.sortBy(_._1).toSeq
    val exp = expected.sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._2, t._4)) ===
      exp.map(t => (t._1, t._2, t._4)),
      "stream crawl-loop verdicts must equal the sequential oracle")
    got.zip(exp).foreach { case ((id, _, micro, _), (_, _, s, _)) =>
      assert(math.abs(micro - math.round(s * 1e6)) <= 1L,
        s"cent_sim_micro drifted for vec $id")
    }
    assert(got.exists(_._4) && got.exists(!_._4),
      "fixture must exercise both kept and dropped verdicts")
  }

  test("stream-pack gate surface: an empty corpus yields an empty frame, not an NPE") {
    import spark.implicits._
    val dir = "/tmp/graft_empty_corpus"
    Seq.empty[(Long, String)].toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("text_chunk_pack_stream")(spark, dir)
    assert(out.count() === 0L, "the registry-wide empty-corpus contract")
  }
}
