package graft.sim

import graft.SparkSpec
import graft.sim.Similarity.Vec
import org.apache.spark.sql.functions._

class CentroidGraphSpec extends SparkSpec {

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** Deterministic synthetic centroid set: `c` unit vectors in `dim`
    * dimensions, clustered (16 anchor directions + small jitter) so
    * the space has the navigable local structure a trained coarse
    * quantizer has — pure uniform-random directions in high dim are
    * the known worst case for greedy graphs AND for real IVF cells. */
  private def syntheticCentroids(c: Int, dim: Int, seed: Long): Array[Kmeans.Centroid] = {
    val rnd = new scala.util.Random(seed)
    val anchors = Array.fill(16)(normalize(Array.fill(dim)(rnd.nextGaussian())))
    Array.tabulate(c) { i =>
      val a = anchors(rnd.nextInt(anchors.length))
      val v = Array.tabulate(dim)(j => a(j) + 0.35 * rnd.nextGaussian())
      Kmeans.Centroid(i, normalize(v))
    }
  }

  private def exactTop(cents: Array[Kmeans.Centroid], q: Vec, n: Int): Array[Int] =
    cents.map(c => (c.v.zip(q.v).map { case (a, b) => a * b }.sum, c.cell))
      .sortBy { case (s, i) => (-s, i) }.take(n).map(_._2)

  test("1024-cell fixture: beam search finds the right cells at a fraction of the evals") {
    val c = 1024
    val cents = syntheticCentroids(c, dim = 16, seed = 42L)
    val g = CentroidGraph.build(cents, degree = 8)
    val rnd = new scala.util.Random(7L)
    val queries = Array.tabulate(32) { i =>
      Vec(i.toLong, normalize(Array.fill(16)(rnd.nextGaussian())), 1.0)
    }
    val nprobe = 8
    var totEvals = 0L
    var hit = 0; var tot = 0
    queries.foreach { q =>
      val evals = Array(0)
      val got = CentroidGraph.selectCells(g, q, nprobe, beamWidth = 40,
        evalsOut = Some(evals)).toSet
      val want = exactTop(cents, q, nprobe).toSet
      hit += got.intersect(want).size; tot += nprobe
      totEvals += evals(0)
    }
    val recall = hit.toDouble / tot
    val meanEvals = totEvals.toDouble / queries.length
    info(f"recall@$nprobe = $recall%.3f, mean centroid evals = $meanEvals%.0f of $c")
    assert(recall >= 0.95, s"graph probe recall too low: $recall")
    assert(meanEvals < c / 4.0,
      s"beam search touched $meanEvals centroids — not sub-linear vs $c")
  }

  test("exhaustive beam equals brute-force ranking exactly") {
    val cents = syntheticCentroids(256, dim = 8, seed = 3L)
    val g = CentroidGraph.build(cents, degree = 8)
    val rnd = new scala.util.Random(11L)
    (0 until 8).foreach { i =>
      val q = Vec(i.toLong, normalize(Array.fill(8)(rnd.nextGaussian())), 1.0)
      // beamWidth = C: the termination rule can't fire before every
      // centroid is seen (graph connectivity permitting), so the top
      // nprobe must match exact ranking
      val got = CentroidGraph.selectCells(g, q, nprobe = 4, beamWidth = 256)
      val want = exactTop(cents, q, 4)
      assert(got.toSeq === want.toSeq, s"query $i: $got vs $want")
    }
  }

  test("probePqGraph equals probePq on the real index (exhaustive beam at 16 cells)") {
    val path = "/tmp/graft_ivfpq_graph_spec"
    val idx = IvfIndex.buildPq(spark, sf(), path)
    val qs = Similarity.loadVectors(spark, sf())
      .filter(col("vec_id") < 8).collect().sortBy(_.vec_id)
      .map(v => Vec(v.vec_id, Pq.l2normalize(v.v), 1.0))
    val g = CentroidGraph.build(idx.cents)
    val viaGraph = CentroidGraph.probePqGraph(spark, path, qs, idx, g, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaFlat = IvfIndex.probePq(spark, path, qs, idx, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaGraph === viaFlat)
  }

  test("graph is symmetrized: every kNN edge is traversable both ways") {
    val cents = syntheticCentroids(128, dim = 8, seed = 9L)
    val g = CentroidGraph.build(cents, degree = 6)
    g.nbrs.zipWithIndex.foreach { case (ns, i) =>
      ns.foreach { j =>
        assert(g.nbrs(j).contains(i), s"edge $i->$j has no reverse")
      }
    }
  }
}
