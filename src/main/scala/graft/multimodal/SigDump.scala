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

  def dumpAndPair(sigsRaw: DataFrame, dumpKind: String, sfDir: String,
      maxHamming: Int, maxBucket: Int)(recordBase: String => Unit): DataFrame = {
    val sigs = sigsRaw.localCheckpoint()
    val base = new java.io.File(sfDir).getName
    graft.core.SideDump.write(sigs, dumpKind, base)
    recordBase(base)
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
