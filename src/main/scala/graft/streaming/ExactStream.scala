package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING EXACT DEDUP — the crawl-loop twin of `Dedup.exact`,
  * keyed at the CHUNK level where the corpus actually repeats
  * content (whole-document texts are near-dups, their token windows
  * are often byte-identical): each micro-batch's chunks are keyed by
  * md5, reduced to their first occurrence within the batch, anti-
  * joined against the PERSISTED seen-hash index, and the survivors'
  * hashes appended before the next batch arrives. This is the dedup
  * step a crawl ingest runs before paying for embedding/indexing a
  * chunk it has already seen.
  *
  * Cross-batch state is the INDEX ITSELF (a parquet directory of
  * 16-byte hashes, one subdir per batch) — nothing driver-side grows
  * with the stream, and the per-batch append is an OVERWRITE of that
  * batch's own subdir, so a retried foreachBatch re-lands the same
  * files instead of duplicating them (the exactly-once ledger
  * discipline; the read side globs whatever subdirs exist, so a
  * replayed batch is idempotent end to end).
  *
  * Stream ≡ batch: micro-batches arrive in doc_id order and chunking
  * is per-document, so "first batch that saw the hash, first
  * (doc_id, chunk_id) within that batch" is exactly the GLOBAL
  * lexicographic min (doc_id, chunk_id) per hash — the one-shot
  * batch dedup the oracle computes (ExactStreamSpec pins the
  * decomposition, including under foreachBatch).
  *
  * Scale posture: the anti-join shuffles both sides on the 16-byte
  * hash; per batch the stream side is batch-sized and the index side
  * is corpus-sized but touched once — at production scale the index
  * would be written BUCKETED by hash so each batch's anti-join
  * co-locates against existing index buckets without reshuffling
  * them (the repo's bucketed-layout convention); the parquet-subdir
  * form here keeps the same query shape with the layout swap left
  * declarative. */
object ExactStream {

  /** Read the seen-hash index: every batch subdir written so far
    * (empty frame before the first append). `before` restricts to
    * batch ids strictly below it — the committed PREFIX a retried
    * batch must be judged against (never its own earlier, possibly
    * partial, append). */
  def readIndex(spark: SparkSession, idxPath: String,
      before: Long = Long.MaxValue): DataFrame = {
    val dir = new java.io.File(idxPath)
    val parts = Option(dir.listFiles())
      .map(_.filter(f => f.isDirectory && f.getName.startsWith("b") &&
          f.getName.drop(1).toLongOption.exists(_ < before))
        .map(_.getAbsolutePath).sorted)
      .getOrElse(Array.empty[String])
    if (parts.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("chunk_md5 STRING"))
    else spark.read.parquet(parts.toIndexedSeq: _*)
  }

  /** One micro-batch: `chunks` is (doc_id, chunk_id, chunk). Returns
    * the KEPT rows (chunk_md5, doc_id, chunk_id) — first occurrence
    * of each hash across the stream so far — EAGERLY materialized
    * before the index append mutates the set they were judged
    * against (the [[ChunkIngest.StreamPacker]] discipline). */
  def dedupBatch(spark: SparkSession, idxPath: String, batchId: Long,
      chunks: DataFrame): DataFrame = {
    val firstInBatch = chunks
      .select(md5(col("chunk")).as("chunk_md5"),
        col("doc_id"), col("chunk_id"))
      .groupBy(col("chunk_md5"))
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("f"))
      .select(col("chunk_md5"), col("f.doc_id"), col("f.chunk_id"))
    val kept = firstInBatch
      .join(readIndex(spark, idxPath, before = batchId),
        Seq("chunk_md5"), "left_anti")
      .localCheckpoint()
    kept.select(col("chunk_md5"))
      .write.mode("overwrite").parquet(s"$idxPath/b$batchId")
    kept
  }

  /** Fresh index path per gate run: the gate APPENDS mid-run, so a
    * session-cached index would replay against the previous run's
    * members and drift (the [[SemStream]] convention). */
  private val runSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Gate surface (`dedup_exact_stream`): the corpus' chunk stream
    * replayed as `nBatches` contiguous doc_id-range micro-batches in
    * stream order, each deduped against the accumulated index.
    * Output: the kept (chunk_md5, doc_id, chunk_id) rows — globally,
    * the lexicographic-min occurrence of every distinct chunk text. */
  def chunkDedupStream(spark: SparkSession, sfDir: String,
      nBatches: Int = 4): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxId = docs.agg(coalesce(max(col("doc_id")), lit(-1L)))
      .head().getLong(0)
    if (maxId < 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "chunk_md5 STRING, doc_id BIGINT, chunk_id BIGINT"))
    val step = maxId / nBatches + 1
    val chunks = graft.text.Chunking.chunksOf(docs)
      .select(col("doc_id"), col("chunk_id"), col("chunk"))
      .localCheckpoint()
    val idxPath = graft.core.SessionScratch.path(spark, sfDir,
      s"graft_exactstream${runSeq.incrementAndGet()}")
    (0 until nBatches).map { b =>
      dedupBatch(spark, idxPath, b.toLong,
        chunks.filter(col("doc_id") >= b * step &&
          col("doc_id") < (b + 1) * step))
    }.reduce(_ unionByName _)
  }
}
