package graft.sim

import graft.SparkSpec
import graft.sim.Similarity.Vec

class PointBlocksSpec extends SparkSpec {

  // deterministic clustered unit vectors (the shape a real embedding
  // corpus has — block pruning thrives on cluster structure, and the
  // EXACTNESS claims must hold regardless of it)
  private def mix(seed: Long, j: Int): Double = {
    var z = seed * 1000003L + j + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }
  private def unit(seed: Long, d: Int): Array[Double] = {
    val v = Array.tabulate(d)(mix(seed, _))
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }
  private def clustered(seed: Long, groups: Int, d: Int, jitter: Double): Array[Double] = {
    val anchor = unit(1000 + seed % groups, d)
    val j = unit(50000 + seed, d)
    val v = anchor.zip(j).map { case (a, b) => a + jitter * b }
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  private def mkCorpus(n: Int, d: Int, groups: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val v = clustered(3000000L + i, groups, d, 0.25)
      Vec(i.toLong, v, 1.0)
    }.toDS()
  }

  test("blocked candidates always contain the exact argmax, and assignment matches the linear scan") {
    val d = 32; val k = 512; val n = 4000; val groups = 16
    val cents = Array.tabulate(k)(i =>
      Kmeans.Centroid(i, clustered(i, groups, d, 0.10)))
    val corpus = mkCorpus(n, d, groups)
    val Some((blocked, model)) = PointBlocks.prepare(corpus, targetBlockSize = 128)
    val rows = blocked.collect()
    assert(rows.length === n)
    var candTotal = 0L
    rows.foreach { b =>
      val cand = PointBlocks.candidates(model, b.block, cents)
      candTotal += cand.length
      val p = Vec(b.vec_id, b.v, b.nrm)
      val lin = Kmeans.nearest(p, cents)
      assert(cand.contains(lin),
        s"block ${b.block} candidates dropped the exact argmax $lin")
      assert(PointBlocks.nearestAmong(p, cents, cand) === lin,
        s"blocked assignment diverged from the linear scan for vec ${b.vec_id}")
    }
    val meanCand = candTotal.toDouble / n
    info(f"mean candidates $meanCand%.0f / $k (clustered fixture)")
    assert(meanCand < k * 0.5,
      s"pruning ineffective on a clustered fixture: $meanCand of $k")
  }

  test("blocked candidates stay exact on an adversarial uniform fixture") {
    // near-uniform centroids and points: pruning may do little, but
    // must never drop the argmax
    val d = 16; val k = 300; val n = 800
    val cents = Array.tabulate(k)(i => Kmeans.Centroid(i, unit(900000L + i, d)))
    import spark.implicits._
    val corpus = (0 until n)
      .map(i => Vec(i.toLong, unit(7000000L + i, d), 1.0)).toDS()
    val Some((blocked, model)) = PointBlocks.prepare(corpus, targetBlockSize = 64)
    blocked.collect().foreach { b =>
      val cand = PointBlocks.candidates(model, b.block, cents)
      val p = Vec(b.vec_id, b.v, b.nrm)
      assert(PointBlocks.nearestAmong(p, cents, cand) === Kmeans.nearest(p, cents))
    }
  }

  test("trainFrom takes the blocked path at large k, the narrow path at gate k, and both agree") {
    val d = 24; val n = 3000; val groups = 12
    val corpus = mkCorpus(n, d, groups).cache()
    corpus.count()

    // gate-sized k: the blocked path must NOT engage (bit-unchanged)
    Kmeans.train(corpus, k = 16, iters = 2)
    assert(!Kmeans.lastTrainBlocked, "k=16 must stay on the narrow path")

    // large k: blocked path engages, and the resulting ASSIGNMENT
    // (per-cell counts under each codebook) matches a forced-unblocked
    // run of the same seeding exactly — same argmax per point each
    // round; centroids may differ only in summation-order ulps, so
    // compare the observable the trainer exists to produce: cell sizes
    val k = 320
    val seeds = corpus.filter(_.vec_id < k).collect().sortBy(_.vec_id)
      .zipWithIndex.map { case (v, i) =>
        val nrm = math.sqrt(v.v.map(x => x * x).sum)
        Kmeans.Centroid(i, v.v.map(_ / nrm))
      }
    val blockedCents = Kmeans.trainFrom(corpus, seeds, iters = 2)
    assert(Kmeans.lastTrainBlocked, "k=320 must take the blocked path")
    val narrowCents = Kmeans.trainFrom(corpus, seeds, iters = 2,
      blockedAbove = Int.MaxValue)
    assert(!Kmeans.lastTrainBlocked)

    val pts = corpus.collect()
    def sizes(cents: Array[Kmeans.Centroid]): Map[Int, Int] =
      pts.map(p => Kmeans.nearest(p, cents)).groupBy(identity)
        .view.mapValues(_.length).toMap
    val sb = sizes(blockedCents); val sn = sizes(narrowCents)
    // ulp-level centroid differences can flip a point sitting exactly
    // between two cells; on this fixture none does — require equality
    assert(sb === sn,
      "blocked and narrow Lloyd must induce the same assignment")
    val cohB = Kmeans.cohesionMicro(corpus, blockedCents)
    val cohN = Kmeans.cohesionMicro(corpus, narrowCents)
    info(s"cohesion micro: blocked=$cohB narrow=$cohN")
    assert(math.abs(cohB - cohN) <= 5L)
  }

  test("prepare returns None on an empty corpus") {
    import spark.implicits._
    val empty = spark.emptyDataset[Vec]
    assert(PointBlocks.prepare(empty).isEmpty)
  }
}
