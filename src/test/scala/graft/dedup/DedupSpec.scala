package graft.dedup

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("exact dedup partitions the corpus: counts sum to row count") {
    val d = Dedup.exact(spark, sf())
    val total = d.selectExpr("sum(n_copies)").head().getLong(0)
    val rows = spark.read.parquet(s"${sf()}/documents.parquet").count()
    assert(total === rows)
  }

  test("minhash LSH output equals exact n-gram Jaccard output") {
    val exact = Dedup.ngramJaccard(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact, s"missing=${exact -- lsh} spurious=${lsh -- exact}")
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
  }

  test("simhash near-dups recover the near-identical planted pairs") {
    // Hamming ≤ 3 on 64 bits is a much tighter notion of "near" than
    // Jaccard 0.8; only require recall of the near-identical pairs.
    val exact = Dedup.ngramJaccard(spark, sf(), tau = 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall =
      if (exact.isEmpty) 1.0
      else exact.count(sim.contains).toDouble / exact.size
    assert(recall >= 0.8, s"simhash recall $recall over ${exact.size} pairs")
  }

  test("df-capped ngram variant keeps all planted near-dup pairs at this scale") {
    val exact = Dedup.ngramJaccard(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.ngramJaccardCapped(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === exact, s"missing=${exact -- capped} spurious=${capped -- exact}")
  }

  test("pairs are canonical (i < j) and duplicate-free") {
    for (df <- Seq(Dedup.ngramJaccard(spark, sf()), Dedup.simhashPairs(spark, sf()),
        Dedup.embeddingCosine(spark, sf(), tau = 0.4))) {
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.forall { case (i, j) => i < j })
      assert(rows.length === rows.distinct.length)
    }
  }

  test("embedding cosine threshold is monotone") {
    val loose = Dedup.embeddingCosine(spark, sf(), tau = 0.3).count()
    val tight = Dedup.embeddingCosine(spark, sf(), tau = 0.5).count()
    assert(tight <= loose)
  }
}
