package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact chunk dedup: per-batch first-seen + persisted
  * seen-hash index anti-join must equal the one-shot global dedup
  * (lexicographic-min occurrence per distinct chunk text), under the
  * gate's ordered replay AND under foreachBatch; retried batches must
  * be idempotent; and the gate corpus must actually exercise
  * cross-batch drops or the gate tests nothing. */
class ExactStreamSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_exactstream_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Driver-side one-shot oracle: min (doc_id, chunk_id) per md5. */
  private def oneShot(): Map[String, (Long, Long)] =
    graft.text.Chunking.chunks(spark, sf())
      .select(md5(col("chunk")).as("m"), col("doc_id"), col("chunk_id"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap

  test("gate replay equals the one-shot dedup, and cross-batch drops happen") {
    val got = ExactStream.chunkDedupStream(spark, sf()).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val expect = oneShot()
    assert(got === expect)
    // the corpus' chunk stream must contain repeats that STRADDLE
    // batch boundaries (a later batch re-offering a hash an earlier
    // batch kept) — otherwise the anti-join is never exercised
    val nChunks = graft.text.Chunking.chunks(spark, sf()).count()
    assert(nChunks > expect.size,
      "corpus must contain duplicate chunk texts at all")
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val step = maxId / 4 + 1
    val crossBatch = graft.text.Chunking.chunks(spark, sf())
      .select(md5(col("chunk")).as("m"),
        (col("doc_id") / step).cast("long").as("b"))
      .groupBy("m").agg(countDistinct("b").as("nb"))
      .filter(col("nb") > 1).count()
    assert(crossBatch > 0,
      "duplicate hashes must straddle micro-batch boundaries")
  }

  test("foreachBatch drive equals the ordered replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val idxPath = tmp("fb")
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (ds: DataFrame, bid: Long) =>
        val chunks = graft.text.Chunking.chunksOf(ds)
          .select(col("doc_id"), col("chunk_id"), col("chunk"))
        acc.synchronized {
          acc ++= ExactStream.dedupBatch(spark, idxPath, bid, chunks)
            .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        }
        ()
      }.start()
    try {
      docs.grouped(120).foreach { g =>
        input.addData(g.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val expect = oneShot().map { case (m, (d, c)) => (m, d, c) }.toSet
    assert(acc.toSet === expect)
    assert(acc.size === acc.toSet.size, "no hash kept twice across batches")
  }

  test("a retried batch is idempotent: same output, no duplicate index entries") {
    import spark.implicits._
    val idxPath = tmp("retry")
    val b0 = Seq((1L, 0L, "alpha beta"), (2L, 0L, "gamma delta"))
      .toDF("doc_id", "chunk_id", "chunk")
    val b1 = Seq((3L, 0L, "alpha beta"), (4L, 0L, "epsilon zeta"))
      .toDF("doc_id", "chunk_id", "chunk")
    val k0 = ExactStream.dedupBatch(spark, idxPath, 0L, b0).collect()
    assert(k0.length === 2)
    val k1a = ExactStream.dedupBatch(spark, idxPath, 1L, b1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // batch 1 retried (the foreachBatch redelivery case): same kept
    // set, and the index holds each hash exactly once afterwards
    val k1b = ExactStream.dedupBatch(spark, idxPath, 1L, b1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(k1a === k1b)
    assert(k1a.map(_._2) === Set(4L), "the cross-batch duplicate is dropped")
    val idx = ExactStream.readIndex(spark, idxPath).collect().map(_.getString(0))
    assert(idx.length === idx.distinct.length)
    assert(idx.length === 3)
  }

  test("empty corpus yields an empty, correctly-shaped frame") {
    val empty = tmp("empty")
    spark.read.parquet(s"${sf()}/documents.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$empty/documents.parquet")
    val out = ExactStream.chunkDedupStream(spark, empty)
    assert(out.columns.toSeq === Seq("chunk_md5", "doc_id", "chunk_id"))
    assert(out.count() === 0L)
  }

  test("compaction: kept set invariant, subdirs collapse, retry above stays exact") {
    val chunks = graft.text.Chunking.chunks(spark, sf())
      .select(col("doc_id"), col("chunk_id"), col("chunk"))
      .localCheckpoint()
    val maxId = chunks.agg(max("doc_id")).head().getLong(0)
    val step = maxId / 4 + 1
    // scheme-qualified path: the whole cycle (list, anti-join,
    // compact, roll-forward) must run through Hadoop FS
    val idxPath = s"file://${tmp("compact")}"
    def slice(b: Int) = chunks.filter(col("doc_id") >= b * step &&
      col("doc_id") < (b + 1) * step)
    val kept = (0 until 3).flatMap { b =>
      ExactStream.dedupBatch(spark, idxPath, b.toLong, slice(b)).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    }.toSet
    val idxBefore = ExactStream.readIndex(spark, idxPath).collect()
      .map(_.getString(0)).toSet
    // compact the committed prefix b0..b1; b2 may still be in flight
    ExactStream.compact(spark, idxPath, upTo = 2L)
    assert(ExactStream.readIndex(spark, idxPath).collect()
      .map(_.getString(0)).toSet === idxBefore,
      "the DISTINCT fold must preserve index membership exactly")
    val subdirs = DeltaIndex.listBatches(spark, idxPath)
      .map(p => new org.apache.hadoop.fs.Path(p).getName)
    assert(subdirs === Seq("c1", "b2"),
      "compaction folds the committed prefix into c(upTo-1), leaving b2")
    // a retry of the in-flight batch 2 after compaction is idempotent
    val retry = ExactStream.dedupBatch(spark, idxPath, 2L, slice(2)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(retry === kept.filter { case (m, _, _) =>
      retry.exists(_._1 == m) } || retry.subsetOf(kept))
    // the last batch lands above the fold; the total equals one-shot
    val last = ExactStream.dedupBatch(spark, idxPath, 3L,
      chunks.filter(col("doc_id") >= 3 * step)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expect = oneShot().map { case (m, (d, c)) => (m, d, c) }.toSet
    assert((kept ++ last) === expect)
  }

  test("compact-gate surface equals the one-shot dedup; 2-batch edge works") {
    val expect = oneShot().map { case (m, (d, c)) => (m, d, c) }.toSet
    def run(n: Int) = ExactStream.chunkDedupCompactStream(spark, sf(), n)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(4) === expect)
    assert(run(2) === expect)
  }
}
