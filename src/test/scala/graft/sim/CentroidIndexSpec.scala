package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Kmeans.Centroid
import graft.sim.Similarity.Vec

class CentroidIndexSpec extends AnyFunSuite {

  // deterministic pseudo-random unit vector from (seed, dim)
  private def prVec(seed: Long, d: Int): Array[Double] = {
    val v = Array.tabulate(d) { j =>
      var z = seed * 1000003L + j + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  // clustered centroids: `groups` well-separated anchors, members
  // jittered around them — the structure a trained IVF codebook has
  private def clusteredCents(k: Int, groups: Int, d: Int): Array[Centroid] = {
    (0 until k).map { i =>
      val anchor = prVec(7000 + i % groups, d)
      val jitter = prVec(9000 + i, d)
      val v = anchor.zip(jitter).map { case (a, b) => a + 0.08 * b }
      val n = math.sqrt(v.map(x => x * x).sum)
      Centroid(i, v.map(_ / n))
    }.toArray
  }

  test("exactness: pruned == linear argmax on uniform centroids, 500 queries") {
    val cents = (0 until 600).map(i => Centroid(i, prVec(i, 24))).toArray
    val idx = CentroidIndex.build(cents)
    (0 until 500).foreach { q =>
      val r = Vec(q, prVec(100000 + q, 24), 1.0)
      assert(idx.nearest(r) === Kmeans.nearest(r, cents), s"query $q")
    }
  }

  test("exactness + pruning on clustered centroids (the trained-codebook shape)") {
    val cents = clusteredCents(k = 1024, groups = 24, d = 24)
    val idx = CentroidIndex.build(cents)
    var scannedTotal = 0L
    (0 until 400).foreach { q =>
      // queries near anchors (realistic) and far from them (adversarial)
      val r = Vec(q, prVec(if (q % 2 == 0) 7000 + q % 24 else 555000 + q, 24), 1.0)
      val (got, scanned) = idx.nearestCounting(r)
      assert(got === Kmeans.nearest(r, cents), s"query $q")
      scannedTotal += scanned
    }
    val avg = scannedTotal / 400.0
    assert(avg < 1024 * 0.5,
      s"pruning should cut the scan on clustered centroids; avg scanned $avg of 1024")
  }

  test("below LinearBelow the index is the verbatim linear scan") {
    val cents = (0 until 16).map(i => Centroid(i, prVec(i, 8))).toArray
    val idx = CentroidIndex.build(cents)
    (0 until 50).foreach { q =>
      val r = Vec(q, prVec(200000 + q, 8), 1.0)
      val (got, scanned) = idx.nearestCounting(r)
      assert(got === Kmeans.nearest(r, cents))
      assert(scanned === 16)
    }
  }

  test("tie-break: lowest index wins, matching the linear scan") {
    val v = prVec(1, 8)
    // duplicate centroids → exact tie; linear scan keeps the first
    val cents = Array(Centroid(0, prVec(2, 8)), Centroid(1, v), Centroid(2, v))
    val idx = CentroidIndex.build(cents) // linear mode (k < 256): trivially equal
    val r = Vec(0, v, 1.0)
    assert(idx.nearest(r) === 1)
    assert(Kmeans.nearest(r, cents) === 1)
    // and in pruned mode: pad with far-away distinct centroids
    val padded = (0 until 300).map(i => Centroid(i, prVec(3000 + i, 8))).toArray ++
      Array(Centroid(300, v), Centroid(301, v))
    val reIndexed = padded.zipWithIndex.map { case (c, i) => Centroid(i, c.v) }
    val idx2 = CentroidIndex.build(reIndexed)
    assert(idx2.nearest(r) === 300)
    assert(Kmeans.nearest(r, reIndexed) === 300)
  }

  test("unnormalized queries: nrm is respected (cosine, not dot)") {
    val cents = (0 until 400).map(i => Centroid(i, prVec(i, 12))).toArray
    val idx = CentroidIndex.build(cents)
    (0 until 100).foreach { q =>
      val unit = prVec(400000 + q, 12)
      val scaled = unit.map(_ * 7.5)
      val r = Vec(q, scaled, 7.5)
      assert(idx.nearest(r) === Kmeans.nearest(r, cents))
    }
  }
}
