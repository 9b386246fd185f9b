package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING SOURCE-DRIFT MONITOR — the crawl-loop twin of
  * `TextAnalysis.sourceDrift`: as document micro-batches land, keep
  * per-(source, token) occurrence counts, and report at any batch
  * boundary which tokens each source is over/under-emitting vs the
  * rest of everything ingested so far. This is corpus monitoring the
  * way a crawl actually needs it — "did the new slice shift the
  * distribution" answered continuously, not by re-scanning the
  * corpus per question.
  *
  * Cross-batch state is the COUNTS INDEX (a parquet directory, one
  * subdir per batch holding THAT batch's (source, tok, c_src) rows).
  * Token counts are ADDITIVE, so the decomposition is exact: sum of
  * per-batch counts ≡ counts of the concatenated corpus, hence
  * report-after-batch-k ≡ the one-shot report over batches 0..k —
  * the stream ≡ batch equality the gate pins against the
  * `text_source_drift` oracle verbatim. A batch subdir is written by
  * OVERWRITE of that batch's own path and derived from the batch's
  * rows alone (never from prior state), so a retried foreachBatch
  * re-lands identical files — the exactly-once ledger discipline
  * ([[ExactStream]]); the read side globs whatever subdirs exist.
  *
  * Scale posture: per batch, one batch-sized explode + partial-
  * aggregated groupBy; the index grows with DISTINCT (source, token)
  * pairs, not with the stream (an already-seen token only changes a
  * count next compaction — per-batch subdirs ARE the delta log, and
  * a periodic groupBy-sum rewrite is the compaction, same convention
  * as the KV ledger's compacting twin). Nothing driver-side grows. */
object DriftStream {

  /** Read accumulated counts: every batch subdir written so far,
    * summed into one (source, tok, c_src) frame. `before` restricts
    * to batch ids strictly below it — the committed PREFIX a retried
    * batch must be judged against. */
  def readCounts(spark: SparkSession, idxPath: String,
      before: Long = Long.MaxValue): DataFrame =
    foldParts(spark, DeltaIndex.listBatches(spark, idxPath, before))

  /** Sum a set of batch subdirs into one counts frame. Listing and
    * deletion go through [[DeltaIndex]] (Hadoop FS): on HDFS/S3 a
    * `java.io.File` listing would return null and the monitor would
    * silently treat every token as a first sighting. */
  private def foldParts(spark: SparkSession, parts: Seq[String]): DataFrame =
    if (parts.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "source STRING, tok STRING, c_src BIGINT"))
    else spark.read.parquet(parts: _*)
      .groupBy(col("source"), col("tok"))
      .agg(sum(col("c_src")).as("c_src"))

  /** One micro-batch: count `docs`' (source, token) occurrences and
    * land them as this batch's subdir. Derived from the batch alone —
    * a retry overwrites with identical content. */
  def countBatch(spark: SparkSession, idxPath: String, batchId: Long,
      docs: DataFrame): Unit =
    graft.text.TextAnalysis.sourceTokenCounts(docs)
      .write.mode("overwrite").parquet(s"$idxPath/b$batchId")

  /** Drift report over everything ingested so far (optionally: over
    * the committed prefix below `before`). */
  def reportSoFar(spark: SparkSession, idxPath: String, k: Int = 3,
      before: Long = Long.MaxValue): DataFrame =
    graft.text.TextAnalysis.driftReport(
      readCounts(spark, idxPath, before), k)

  /** COMPACTION: fold the COMMITTED batch subdirs (ids strictly below
    * `upTo`) into one summed subdir named `b(upTo-1)`. Reports are
    * invariant under compaction — counts are additive — which is what
    * lets the delta log stay per-batch small while the corpus grows.
    *
    * `upTo` is explicit, not inferred: the highest landed subdir may
    * belong to an IN-FLIGHT batch whose foreachBatch can still retry,
    * and a retry overwrites its own subdir — if compaction had folded
    * a partial landing into the sum, the retry would double-count it.
    * Only the caller's checkpoint knows the committed watermark, so
    * the caller states it; subdirs at or above `upTo` are untouched
    * and keep composing.
    *
    * Durability is [[DeltaIndex.compact]]'s staging protocol: the
    * folded sum lands as a hidden `_SUCCESS`-marked subdir BEFORE any
    * input is deleted (the previous in-place form held the fold only
    * as executor localCheckpoint state across the deletes — a crash
    * there lost the whole committed prefix; ADVICE r11), and a crash
    * between the deletes and the rename rolls forward at the next
    * read. */
  def compact(spark: SparkSession, idxPath: String, upTo: Long): Unit =
    DeltaIndex.compact(spark, idxPath, upTo)(parts =>
      foldParts(spark, parts))

  /** Fresh index path per gate run ([[SemStream]] convention). */
  private val runSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Gate surface (`text_source_drift_compact`): the same replay with
    * a mid-stream COMPACTION — batches 0..2 land, the committed
    * prefix (upTo = 3) folds into one subdir, the last batch lands
    * ABOVE it, and the report must STILL equal the one-shot oracle
    * verbatim (the `k_replay_compact` treatment: the gate forces the
    * compacted-index read path through the same oracle, so a
    * compaction bug is a hash mismatch, not a spec-only finding). */
  def sourceDriftCompactStream(spark: SparkSession, sfDir: String,
      nBatches: Int = 4, k: Int = 3): DataFrame = {
    require(nBatches >= 2, "compaction mid-stream needs at least 2 batches")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val maxId = docs.agg(coalesce(max(col("doc_id")), lit(-1L)))
      .head().getLong(0)
    val idxPath = graft.core.SessionScratch.path(spark, sfDir,
      s"graft_driftcompact${runSeq.incrementAndGet()}")
    if (maxId >= 0L) {
      val step = maxId / nBatches + 1
      (0 until nBatches - 1).foreach { b =>
        countBatch(spark, idxPath, b.toLong,
          docs.filter(col("doc_id") >= b * step &&
            col("doc_id") < (b + 1) * step))
      }
      compact(spark, idxPath, upTo = (nBatches - 1).toLong)
      countBatch(spark, idxPath, (nBatches - 1).toLong,
        docs.filter(col("doc_id") >= (nBatches - 1) * step))
    }
    reportSoFar(spark, idxPath, k)
  }

  /** Gate surface (`text_source_drift_stream`): the corpus replayed
    * as `nBatches` contiguous doc_id-range micro-batches through the
    * counts index, then the monitor's report — which must equal the
    * one-shot `text_source_drift` oracle exactly (additive counts,
    * identical report stage). */
  def sourceDriftStream(spark: SparkSession, sfDir: String,
      nBatches: Int = 4, k: Int = 3): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val maxId = docs.agg(coalesce(max(col("doc_id")), lit(-1L)))
      .head().getLong(0)
    val idxPath = graft.core.SessionScratch.path(spark, sfDir,
      s"graft_driftstream${runSeq.incrementAndGet()}")
    if (maxId >= 0L) {
      val step = maxId / nBatches + 1
      (0 until nBatches).foreach { b =>
        countBatch(spark, idxPath, b.toLong,
          docs.filter(col("doc_id") >= b * step &&
            col("doc_id") < (b + 1) * step))
      }
    }
    reportSoFar(spark, idxPath, k)
  }
}
