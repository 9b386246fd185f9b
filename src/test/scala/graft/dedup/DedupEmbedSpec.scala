package graft.dedup

import graft.SparkSpec

/** The three embedding near-dup formulations, cross-checked:
  *
  *  - [[Dedup.embeddingCosineBlocked]] — exact grid-blocked θ-join,
  *    the gate path (bounded task memory, no driver collect);
  *  - [[Dedup.embeddingCosine]] — broadcast all-pairs, spec-only
  *    differential oracle (collects the corpus → moderate-N only);
  *  - [[Dedup.embeddingCosineIvf]] — approximate IVF-cell-blocked
  *    candidates, the pruned scale path; recall is a MEASURED
  *    property at the loose gate τ and exact-by-construction as
  *    nprobe → k.
  */
class DedupEmbedSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("blocked exact path equals the broadcast all-pairs oracle (tau sweep)") {
    for (tau <- Seq(0.3, 0.45, 0.5)) {
      val blocked = pairs(Dedup.embeddingCosineBlocked(spark, sf(), tau))
      val bcast = pairs(Dedup.embeddingCosine(spark, sf(), tau))
      assert(blocked === bcast, s"tau=$tau")
    }
  }

  test("blocked path is invariant to nBlocks (grid completeness, no duplicates)") {
    val golden = pairs(Dedup.embeddingCosineBlocked(spark, sf(), 0.4, nBlocks = 8))
    for (b <- Seq(1, 3, 16)) {
      val got = Dedup.embeddingCosineBlocked(spark, sf(), 0.4, nBlocks = b).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.distinct.length, s"nBlocks=$b emitted duplicates")
      assert(got.toSet === golden, s"nBlocks=$b")
      assert(got.forall { case (i, j) => i < j })
    }
  }

  test("IVF-blocked path: full recall at nprobe=6 on the gate corpus, exact at nprobe=k") {
    for (dir <- Seq(sf(), sf("sf0.01"))) { // both correctness-gate corpora
      val exact = pairs(Dedup.embeddingCosineBlocked(spark, dir, 0.45))
      val ivf6 = pairs(Dedup.embeddingCosineIvf(spark, dir, 0.45, k = 16, nprobe = 6))
      assert(ivf6.subsetOf(exact), s"$dir: IVF emitted a pair the exact path did not")
      assert(ivf6 === exact, s"$dir: recall < 1 at nprobe=6: missing ${exact -- ivf6}")
    }
    val ivfAll = pairs(Dedup.embeddingCosineIvf(spark, sf(), 0.45, k = 16, nprobe = 16))
    assert(ivfAll === pairs(Dedup.embeddingCosineBlocked(spark, sf(), 0.45)),
      "nprobe=k must be exhaustive over candidate blocks")
  }

  test("IVF-blocked path actually prunes the comparison space") {
    val n = graft.sim.Similarity.loadVectors(spark, sf()).count()
    val comparisons = spark.sparkContext.longAccumulator("ivfComparisons")
    Dedup.embeddingCosineIvf(spark, sf(), 0.45, k = 16, nprobe = 4,
      comparisons = Some(comparisons)).count()
    val allPairs = n * (n - 1) / 2
    assert(comparisons.value > 0)
    assert(comparisons.value < allPairs,
      s"IVF compared ${comparisons.value} of $allPairs pairs — no pruning happened")
  }
}
