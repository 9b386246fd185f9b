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
    * partial, append). Listing goes through [[DeltaIndex]] (Hadoop
    * FS — on HDFS/S3 a `java.io.File` listing would return null and
    * this read would silently claim an empty index, waving every
    * already-seen chunk through). */
  def readIndex(spark: SparkSession, idxPath: String,
      before: Long = Long.MaxValue): DataFrame =
    readParts(spark, DeltaIndex.listBatches(spark, idxPath, before))

  private def readParts(spark: SparkSession, parts: Seq[String]): DataFrame =
    if (parts.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("chunk_md5 STRING"))
    else spark.read.parquet(parts: _*)

  /** COMPACTION for the seen-hash delta log: fold the COMMITTED batch
    * subdirs (ids strictly below `upTo` — the caller's checkpoint
    * watermark, same contract as [[DriftStream.compact]]) into one
    * DISTINCT subdir `b(upTo-1)`. The anti-join is invariant under
    * the fold (membership is membership), so a crawl that appends one
    * subdir per micro-batch forever can periodically collapse its
    * small-files tail; [[DeltaIndex.compact]]'s staging + roll-forward
    * protocol keeps a durable on-disk copy of the prefix at every
    * moment. */
  def compact(spark: SparkSession, idxPath: String, upTo: Long): Unit =
    DeltaIndex.compact(spark, idxPath, upTo)(parts =>
      readParts(spark, parts).distinct())

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
    val kept = graft.core.Materialize.frame(firstInBatch
      .join(readIndex(spark, idxPath, before = batchId),
        Seq("chunk_md5"), "left_anti"), "exactstream_kept")
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
      nBatches: Int = 4): DataFrame =
    chunkDedupReplay(spark, sfDir, nBatches, compactMidStream = false)

  /** Gate surface (`dedup_exact_stream_compact`): the same replay
    * with a mid-stream COMPACTION — batches 0..n-2 land, the
    * committed prefix folds into one DISTINCT subdir, the last batch
    * dedups against the compacted index — and the kept set must
    * STILL equal the one-shot oracle verbatim (the
    * `text_source_drift_compact` treatment: a compaction bug is a
    * hash mismatch, not a spec-only finding). */
  def chunkDedupCompactStream(spark: SparkSession, sfDir: String,
      nBatches: Int = 4): DataFrame = {
    require(nBatches >= 2, "compaction mid-stream needs at least 2 batches")
    chunkDedupReplay(spark, sfDir, nBatches, compactMidStream = true)
  }

  private def chunkDedupReplay(spark: SparkSession, sfDir: String,
      nBatches: Int, compactMidStream: Boolean): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxId = docs.agg(coalesce(max(col("doc_id")), lit(-1L)))
      .head().getLong(0)
    if (maxId < 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "chunk_md5 STRING, doc_id BIGINT, chunk_id BIGINT"))
    val step = maxId / nBatches + 1
    val chunks = graft.core.Materialize.frame(
      graft.text.Chunking.chunksOf(docs)
        .select(col("doc_id"), col("chunk_id"), col("chunk")),
      "exactstream_chunks")
    val idxPath = graft.core.SessionScratch.path(spark, sfDir,
      s"graft_exactstream${runSeq.incrementAndGet()}")
    (0 until nBatches).map { b =>
      if (compactMidStream && b == nBatches - 1)
        compact(spark, idxPath, upTo = b.toLong)
      dedupBatch(spark, idxPath, b.toLong,
        chunks.filter(col("doc_id") >= b * step &&
          col("doc_id") < (b + 1) * step))
    }.reduce(_ unionByName _)
  }
}
