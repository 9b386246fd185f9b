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

  // ── offset-bearing variant: the matches view ───────────────────────

  /** Per distinct window digest, ONE witness occurrence — the
    * lexicographically smallest (doc_id, off). Min is associative, so
    * re-reducing the union of per-batch minima ([[probeMatches]])
    * equals the minimum over everything ever indexed: append order
    * never changes the witness. */
  private def sampleRows(docs: DataFrame, minSpan: Int): DataFrame =
    windows(docs, minSpan)
      .groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("off"))).as("s"))
      .select(col("h"), col("s.doc_id").as("sdoc"), col("s.off").as("soff"))

  /** Build the OFFSET-BEARING index: distinct window digests, each
    * with its witness (doc, off). ~2× the bare-digest row size — the
    * price of upgrading probe output from extents to the
    * partner/offset/length diagnosis view ([[probeMatches]]). The
    * bare [[build]] remains the space-floor lifecycle. */
  def buildWithSamples(docs: DataFrame, indexPath: String,
      minSpan: Int = 8): Unit =
    sampleRows(docs, minSpan)
      .write.mode("overwrite").parquet(indexPath)

  /** Incrementally index another slice with witnesses (parquet
    * append; probes re-reduce, so cross-file digest repeats are
    * fine — SpanIndexSpec pins append-order independence). */
  def appendWithSamples(docs: DataFrame, indexPath: String,
      minSpan: Int = 8): Unit =
    sampleRows(docs, minSpan)
      .write.mode("append").parquet(indexPath)

  /** Probe a batch for the DIAGNOSIS view: one row per maximal run of
    * batch windows matching the index, as (doc_i = batch doc, doc_j =
    * witness doc, off_i, off_j, match_len) — [[SuffixDedup
    * .maximalMatches]]'s output shape for the crawl loop, without
    * re-ranking the corpus. Every reported row is a TRUE verbatim
    * shared extent (overlapping windows pin each token); lengths are
    * maximal w.r.t. the WITNESS evidence — where a span exists in
    * several index docs, each window names its lexicographically
    * first occurrence, so a run may split into shorter matches
    * against different partners (SpanIndexSpec exercises exactly this
    * switch). Batch-internal duplication is out of scope here (run
    * [[SuffixDedup.maximalMatches]] on the batch for that); extents
    * of this view never exceed [[probe]]'s. */
  def probeMatches(spark: SparkSession, indexPath: String,
      batchDocs: DataFrame, minSpan: Int = 8): DataFrame = {
    val idx = spark.read.parquet(indexPath)
      .groupBy(col("h")) // re-reduce minima across appended files
      .agg(min(struct(col("sdoc"), col("soff"))).as("s"))
      .select(col("h"), col("s.sdoc").as("dj"), col("s.soff").as("oj"))
    val pairs = windows(batchDocs, minSpan)
      .join(idx, "h")
      .select(col("doc_id").as("di"), col("off").as("oi"),
        col("dj"), col("oj"))
    SuffixDedup.diagonalRuns(pairs, minSpan)
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

  /** Gate: the same crawl-batch split probed for MATCHES against the
    * offset-bearing index — partner/offset/length diagnosis without
    * re-ranking the corpus. The DuckDB oracle re-derives the witness
    * rule (first (doc, off) per window) and the diagonal-run merge
    * from raw text, so the whole view is hash-gated. */
  def dedupIncrementalMatches(spark: SparkSession, sfDir: String,
      minSpan: Int = 8): DataFrame = {
    val path = graft.core.SessionScratch.path(spark, sfDir, "graft_spanidx_m")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.core.SessionScratch.buildOnce(spark, path) {
      buildWithSamples(docs.filter(col("doc_id") % 10 =!= 0), path, minSpan)
    }
    probeMatches(spark, path, docs.filter(col("doc_id") % 10 === 0), minSpan)
  }
}
