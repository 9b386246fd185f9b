package graft.dedup

import graft.SparkSpec

/** In-JVM mirror of the simhash side-dump DuckDB oracles
  * (`SparkEntry.oracleSql`): the dumped per-doc signatures are the
  * only artifact the gates take on faith, so these specs re-derive
  * the banding, bucket caps, radius-1 probes, Hamming filter and
  * pair generation through independent plain-Scala code and prove
  * (a) dump + mechanism reproduces the operators exactly and (b) a
  * tampered dump is detected. */
class SimhashOracleSpec extends SparkSpec {

  private def dumpedSigs(): Map[Long, Long] =
    spark.read.parquet(Dedup.simhashDumpPath(Dedup.lastSimhashBase))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sig")).toMap

  /** (band, byte) postings of a signature set — plain loops, no Spark. */
  private def buckets(sigs: Map[Long, Long]): Map[(Int, Long), Seq[(Long, Long)]] =
    (for ((d, s) <- sigs.toSeq; b <- 0 until 8)
      yield ((b, (s >> (b * 8)) & 255L), (d, s)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  /** The exact-band pair rule: buckets of 2..1000 members, upper
    * triangle, Hamming ≤ maxHamming. */
  private def exactPairs(sigs: Map[Long, Long], maxHamming: Int): Set[(Long, Long)] =
    buckets(sigs).valuesIterator
      .filter(m => m.size >= 2 && m.size <= 1000)
      .flatMap { m =>
        for {
          a <- m; b <- m
          if a._1 < b._1 && java.lang.Long.bitCount(a._2 ^ b._2) <= maxHamming
        } yield (a._1, b._1)
      }.toSet

  /** The multi-probe rule: exact-band pairs UNION radius-1 probe hits
    * (probe fan-out joins buckets of 1..1000), Hamming ≤ maxHamming. */
  private def multiProbePairs(sigs: Map[Long, Long], maxHamming: Int): Set[(Long, Long)] = {
    val bks = buckets(sigs)
    val viaProbe = for {
      (d, s) <- sigs.toSeq
      band <- 0 until 8
      p <- 0 until 8
      probed = ((s >> (band * 8)) & 255L) ^ (1L << p)
      m <- bks.getOrElse((band, probed), Seq.empty)
      if m._1 != d && bks((band, probed)).size <= 1000
      if java.lang.Long.bitCount(s ^ m._2) <= maxHamming
    } yield (math.min(d, m._1), math.max(d, m._1))
    exactPairs(sigs, maxHamming) ++ viaProbe
  }

  test("simhash gate: dumped sigs + independent banding reproduce simhashPairs") {
    val got = Dedup.simhashPairs(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = dumpedSigs()
    assert(sigs.nonEmpty, "signature dump must be readable")
    assert(exactPairs(sigs, 7) === got)
    assert(got.nonEmpty, "gate corpus should produce simhash pairs")
  }

  test("multiprobe gate: dumped sigs + probe fan-out reproduce the operator") {
    val got = Dedup.simhashPairsMultiProbe(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = dumpedSigs()
    assert(multiProbePairs(sigs, 15) === got)
    // the probe radius must actually widen the exact-band set here,
    // or this gate duplicates dedup_simhash instead of testing probes
    assert(exactPairs(sigs, 15).subsetOf(got))
  }

  test("wide-band gate: output IS the Hamming<=15 all-pairs ground truth") {
    // the dedup_simhash_wide oracle is all-pairs, so the spec pins
    // exactly that: the 4x16-bit banding + radius-3 probes recover
    // EVERY qualifying pair (the pigeonhole guarantee), uncapped
    val got = Dedup.simhashPairsWide(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = dumpedSigs().toSeq
    val all = (for {
      (d1, s1) <- sigs; (d2, s2) <- sigs
      if d1 < d2 && java.lang.Long.bitCount(s1 ^ s2) <= 15
    } yield (d1, d2)).toSet
    assert(got === all, "wide banding must achieve full recall at ham<=15")
    assert(got.nonEmpty)
    // and it agrees with the 8-band multiprobe where THAT has full
    // recall (gate scale: caps non-binding for both)
    val mp = Dedup.simhashPairsMultiProbe(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === mp)
  }

  test("simhash oracle can fail: dropping a paired doc's signature is detected") {
    val got = Dedup.simhashPairs(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    val victim = got.head._1
    val tampered = dumpedSigs() - victim
    assert(exactPairs(tampered, 7) !== got,
      s"removing doc $victim's signature must change the derived pairs")
  }
}
