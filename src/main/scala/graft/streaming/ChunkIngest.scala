package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.{Chunking, SequencePacking}

/** CHUNK-STREAM INGEST — the missing step between the chunker and the
  * crawl-loop indexes: documents arrive as a stream (micro-batches in
  * doc order), each batch is chunked ([[Chunking.chunksOf]], stateless
  * per document) and its chunks packed into fixed token budgets
  * CONTINUING the global prefix sum across batches — so the packed
  * stream is EXACTLY the one-shot [[SequencePacking.packChunks]]
  * result (ChunkStreamSpec pins stream ≡ batch).
  *
  * The only cross-batch state is ONE DRIVER-SIDE LONG: the running
  * token total ([[StreamPacker.total]]), threaded into
  * [[SequencePacking.packPrefixSum]] as its start offset. The global
  * prefix sum decomposes exactly over ordered batches
  * (Σ_before(row) = carried + Σ_before_within_batch(row)), which is
  * what makes the streaming twin equal to the batch operator rather
  * than merely similar — the same decomposition argument the
  * partition-offset pass inside packPrefixSum itself uses, lifted one
  * level up to micro-batches.
  *
  * Scale posture: per batch the work is the batch packer's (narrow
  * two-pass over the batch's chunks, numPartitions longs on the
  * driver); state does not grow with the stream. At 100 TB ingest the
  * batch boundary is the natural backpressure unit and the carried
  * offset is checkpointable alongside the sink (a foreachBatch sink
  * persists it transactionally with the output, the
  * [[graft.streaming]] exactly-once ledger pattern).
  */
object ChunkIngest {

  /** Stateful stream-side packer: call [[packBatch]] once per
    * micro-batch of (doc_id, text) rows, IN STREAM ORDER (each call
    * materializes its output before advancing the carried total, so a
    * retried foreachBatch must re-call with the same batch — align
    * `total` with the sink's committed offset for exactly-once). */
  final class StreamPacker(budget: Long = 256L, window: Int = 64,
      stride: Int = 48, partitions: Int = 32) {
    private var carried = 0L

    /** Tokens packed so far — the checkpointable cross-batch state. */
    def total: Long = carried

    /** Restore state from a sink's committed offset (recovery). */
    def reset(toTotal: Long): Unit = { carried = toTotal }

    /** (doc_id, chunk_id, n_tokens, pack_id) for this batch's chunks,
      * pack ids continuing the global sequence. EAGER: the result is
      * localCheckpoint-materialized so the carried total it advanced
      * by is final (a lazy frame re-evaluated later must not race a
      * later batch's offset). */
    def packBatch(docs: DataFrame): DataFrame = {
      val chunks = Chunking.chunksOf(docs, window, stride)
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"))
      val packed = SequencePacking.packPrefixSum(chunks,
        Seq(col("doc_id"), col("chunk_id")), "n_tokens", budget,
        partitions, startOffset = carried).localCheckpoint()
      val batchTokens = packed.agg(coalesce(sum("n_tokens"), lit(0L)))
        .collect()(0).getLong(0)
      carried += batchTokens
      packed
    }
  }
}
