package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.text.SequencePacking.{DocTokens, PackedDoc}

/** The flagship corpus-prep pipeline (clean → quality floor → exact
  * dedup → sequence packing) running END TO END as one Structured
  * Streaming query — the continuous-ingest twin of
  * `graft.text.CorpusPipeline.prepare`, differential-tested against
  * it on every consumed prefix (StreamingCorpusPipelineSpec).
  *
  * Stage mapping:
  *  - scrub + token count + quality floor: stateless projections,
  *    identical expressions to the batch pipeline (no shuffle);
  *  - exact dedup: `dropDuplicatesWithinWatermark` on the md5
  *    fingerprint — watermark-bounded state, same keep-first-arrival
  *    semantics as the batch min-doc_id rule whenever delivery is in
  *    doc_id order (IngestPipeline's design note applies: duplicates
  *    beyond the delay fall through to periodic batch dedup);
  *  - packing: a SEQUENTIAL cursor by definition (pack k must be full
  *    before pack k+1 opens), so the streaming form is a single
  *    stateful group holding ONE long (the running token total).
  *    That is the honest shape: an arrival-order prefix sum admits no
  *    parallel split at the cut point; the distributed two-pass form
  *    (SequencePacking.packByPrefixSum) exists for batch re-packs.
  *    Per micro-batch the group buffers that BATCH's docs (bounded by
  *    trigger size, not by the stream's history) to order them by
  *    doc_id before folding.
  */
object StreamingCorpusPipeline {

  /** Stateless prep + watermarked dedup. Input must carry
    * (doc_id, text, t); emits (doc_id, t, n_tokens). */
  def prepared(docs: DataFrame, minTokens: Long = 5L,
      watermarkDelay: String = "2 hours"): DataFrame =
    IngestPipeline.cleaned(docs, watermarkDelay)
      .select(col("doc_id"), col("t"),
        expr("size(filter(split(clean_text, '\\\\s+'), x -> x != ''))")
          .cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= minTokens)

  /** Stateful arrival-order prefix-sum packing: state is the running
    * token total (one long); each doc's pack is `floor(before/budget)`
    * at its position in the (batch-sorted) arrival sequence. */
  def packStream(toks: Dataset[DocTokens], budget: Long): Dataset[PackedDoc] = {
    import toks.sparkSession.implicits._
    toks.groupByKey(_ => 0)
      .flatMapGroupsWithState[Long, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, batch, state) =>
          var run = state.getOption.getOrElse(0L)
          val out = batch.toVector.sortBy(_.doc_id).map { d =>
            val before = run
            run += d.n_tokens
            PackedDoc(d.doc_id, d.n_tokens, before / budget)
          }
          state.update(run)
          out.iterator
      }
  }

  /** End-to-end stream: (doc_id, text, t) → (doc_id, n_tokens, pack_id). */
  def prepareStream(docs: DataFrame, budget: Long = 512L,
      minTokens: Long = 5L, watermarkDelay: String = "2 hours"): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    packStream(
      prepared(docs, minTokens, watermarkDelay)
        .select(col("doc_id"), col("n_tokens")).as[DocTokens],
      budget)
  }
}
