package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED exact-span dedup index — the [[LshIndex]] build-once /
  * append / probe-many lifecycle applied to [[SuffixDedup]]'s
  * maximal-span semantics. A 100 TB corpus is span-deduplicated once;
  * every crawl batch afterwards is checked for ≥ minSpan-token
  * verbatim overlaps WITHOUT re-ranking the corpus: the index stores
  * the corpus' DISTINCT window digests (16-byte md5 of each
  * minSpan-token window — content-addressed, so batches from
  * different runs compose), probing computes only the batch's
  * windows.
  *
  * Exactness note: the one-shot [[SuffixDedup.maximalSpans]] is
  * hash-free; a PERSISTED index must be content-addressed, so this
  * lifecycle accepts md5's 2^-64-ish collision bound — the same trade
  * every digest-keyed stage in the engine makes, documented here
  * because it is the one semantic difference from the one-shot path
  * (SpanIndexSpec still proves probe ≡ one-shot on the gate corpus).
  *
  * Probe semantics: a batch position flags iff its window digest is
  * IN THE INDEX or shared by ≥ 2 distinct batch docs (batch-internal
  * cross-doc duplication) — together exactly the "shared with any
  * other document" rule of the one-shot operator, so
  * probe(batch) ≡ maximalSpans(index ∪ batch) restricted to batch
  * docs (differential-pinned). Index-internal pairs are never
  * generated, and the index never stores offsets or doc ids: probing
  * a tiny batch against a huge index costs the batch's windows plus
  * one digest semi-join.
  *
  * Caller contract: probe BEFORE appending a batch (the crawl-loop
  * order) — bare digests cannot tell "my own window, appended
  * earlier" from a genuine duplicate, so probing an already-appended
  * document reports its whole body as duplicated. */
object SpanIndex {

  /** (doc_id, off, h) — one row per minSpan-token window. */
  private def windows(docs: DataFrame, minSpan: Int): DataFrame =
    docs
      .select(col("doc_id"),
        expr(graft.text.Tok.alphaToks).as("toks"))
      .select(col("doc_id"),
        posexplode(expr(
          s"""CASE WHEN size(toks) >= $minSpan THEN
             |  transform(sequence(0, size(toks) - $minSpan),
             |    i -> md5(concat_ws(' ', slice(toks, i + 1, $minSpan))))
             |ELSE array() END""".stripMargin)).as(Seq("off", "h")))

  /** Build the index: the corpus slice's distinct window digests. */
  def build(docs: DataFrame, indexPath: String, minSpan: Int = 8): Unit =
    windows(docs, minSpan).select(col("h")).distinct()
      .write.mode("overwrite").parquet(indexPath)

  /** Incrementally index another slice — a parquet append of the new
    * batch's distinct digests; cross-file repeats are fine, probes
    * semi-join. SpanIndexSpec pins build(A)+append(B) ≡ build(A∪B). */
  def append(docs: DataFrame, indexPath: String, minSpan: Int = 8): Unit =
    windows(docs, minSpan).select(col("h")).distinct()
      .write.mode("append").parquet(indexPath)

  /** Probe a batch: maximal extents of batch positions whose window
    * is in the index OR duplicated cross-doc inside the batch.
    * Output (doc_id, span_start, span_end), batch docs only. */
  def probe(spark: SparkSession, indexPath: String, batchDocs: DataFrame,
      minSpan: Int = 8): DataFrame = {
    val w = windows(batchDocs, minSpan).localCheckpoint() // 3 consumers
    val idx = spark.read.parquet(indexPath)
    val inIndex = w.join(idx, Seq("h"), "leftsemi")
      .select(col("doc_id"), col("off"))
    val batchCross = w.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("h"))
    val inBatch = w.join(batchCross, Seq("h"), "leftsemi")
      .select(col("doc_id"), col("off"))
    SuffixDedup.mergeExtents(inIndex.union(inBatch).distinct(), minSpan)
  }

  // ── gate surface ───────────────────────────────────────────────────

  /** Gate: docs with doc_id % 10 == 0 are "today's crawl batch", the
    * rest were span-indexed in a previous run (built once per session
    * — build once, probe many). Same split as `dedup_incremental`. */
  def dedupIncrementalSpans(spark: SparkSession, sfDir: String,
      minSpan: Int = 8): DataFrame = {
    val path = graft.core.SessionScratch.path(spark, sfDir, "graft_spanidx")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.core.SessionScratch.buildOnce(spark, path) {
      build(docs.filter(col("doc_id") % 10 =!= 0), path, minSpan)
    }
    probe(spark, path, docs.filter(col("doc_id") % 10 === 0), minSpan)
  }
}
