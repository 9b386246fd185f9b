package graft.multimodal

import org.apache.spark.sql.DataFrame

/** Shared gate-surface tail for the perceptual near-dup families
  * (image / audio / video): materialize the (doc_id, sig) fingerprint
  * frame ONCE (the decode feeds BOTH the side-dump write and the pair
  * stage — without the checkpoint it would run twice), dump it
  * run-scoped for the DuckDB oracle, record the dump base for the
  * oracle glob, then run the multi-probe banded-Hamming pair
  * machinery. One copy of the cache/dump discipline instead of three. */
private[graft] object SigDump {

  /** Doc count above which the pair tail switches from the 8-bit
    * multi-probe scheme to the collapse + wide-band scale path — the
    * regime boundary MediaIngestBench measured (8-bit twin recall
    * 0.31 at 65 k tiny images; executor OOM at 500 k under the
    * degenerate-clique bucket lists; collapse+wide exact at both) —
    * the [[graft.dedup.Dedup.WideBalancedAbove]] convention applied
    * to the media families. Every gate corpus sits far below it, so
    * registered plans (and the multi-probe oracles) are untouched. */
  private[graft] val MediaWideAbove: Long = 100000L

  /** Which regime the last [[dumpAndPair]] picked (observability for
    * the regime-switch spec, the lastHashMinIters convention). */
  @volatile private[graft] var lastWide: Boolean = false

  def dumpAndPair(sigsRaw: DataFrame, dumpKind: String, sfDir: String,
      maxHamming: Int, maxBucket: Int)(recordBase: String => Unit): DataFrame = {
    val sigs = sigsRaw.localCheckpoint()
    val base = new java.io.File(sfDir).getName
    graft.core.SideDump.write(sigs, dumpKind, base)
    recordBase(base)
    // regime pick: the count is over the already-materialized
    // checkpoint (one cheap job), the WideBalancedAbove convention
    lastWide = sigs.count() >= MediaWideAbove
    if (lastWide)
      graft.dedup.Dedup.simhashPairsWideCollapsedOf(sigs, maxHamming,
        maxBucket)
    else
      graft.dedup.Dedup.simhashPairsMultiProbeOf(sigs, maxHamming, maxBucket)
  }

  /** The SCALE-PATH tail: same dump discipline, pairs via the
    * collapse + wide-band machinery
    * ([[graft.dedup.Dedup.simhashPairsWideCollapsedOf]]) — the
    * formulation that keeps full recall when signatures are
    * low-entropy or the corpus outgrows 8-bit bands. */
  def dumpAndPairWide(sigsRaw: DataFrame, dumpKind: String, sfDir: String,
      maxHamming: Int, maxBucket: Int)(recordBase: String => Unit): DataFrame = {
    val sigs = sigsRaw.localCheckpoint()
    val base = new java.io.File(sfDir).getName
    graft.core.SideDump.write(sigs, dumpKind, base)
    recordBase(base)
    graft.dedup.Dedup.simhashPairsWideCollapsedOf(sigs, maxHamming, maxBucket)
  }
}
