package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** End-to-end streaming ingest for a document corpus: scrub →
  * fingerprint → cross-batch exact dedup → idempotent batched sink.
  * The composition every continuous training-data pipeline runs:
  *
  *   raw stream ─ map-only clean (no shuffle)
  *              ─ fingerprint (md5 of cleaned text)
  *              ─ dropDuplicates(fp) with watermark-bounded state
  *              ─ foreachBatch idempotent append (exactly-once per
  *                batch id under re-delivery — IdempotentSink)
  *
  * Scale notes: the only stateful stage is the dedup, keyed by the
  * 16-byte fingerprint, state bounded by the watermark (duplicates
  * arriving later than the delay are passed through rather than
  * buffered forever — at 100 TB/day an unbounded exact-dedup ledger
  * is not a thing; periodic BATCH dedup over the landed output
  * catches stragglers). */
object IngestPipeline {

  /** Streaming transform: input must carry (doc_id, text, t).
    *
    * dropDuplicatesWithinWatermark, NOT dropDuplicates(fp): with only
    * the fingerprint in the key set, Spark never evicts dedup state
    * (eviction requires the event-time column among the keys) and the
    * store grows one entry per distinct document forever. The
    * within-watermark variant keys on fp but expires entries once the
    * watermark passes them — bounded state, duplicates beyond the
    * delay fall through to the periodic batch dedup. */
  def cleaned(docs: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .select(col("doc_id"), col("t"),
        graft.text.Cleaning.scrub(col("text")).as("clean_text"))
      .withColumn("fp", md5(col("clean_text")))
      .withWatermark("t", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /** Start the pipeline into `outDir` (one subdir per micro-batch,
    * exactly once per batch id) with checkpointing at `checkpointDir`. */
  def start(docs: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    cleaned(docs)
      .select(col("doc_id"), col("fp"), col("clean_text"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(IdempotentSink.appendOnce(outDir) _)
      .start()
}
