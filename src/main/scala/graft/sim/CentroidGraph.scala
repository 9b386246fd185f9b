package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sim.Similarity.{Vec, cosine}

/** Graph-based probe ORDER for IVF indexes — an NSW-style proximity
  * graph over the CELL CENTROIDS (cf. Malkov & Yashunin, "Efficient
  * and robust approximate nearest neighbor search using Hierarchical
  * Navigable Small World graphs", layer-0 of HNSW; Malkov et al.'s
  * original NSW), used to pick which `nprobe` cells to read instead
  * of brute-force ranking every centroid.
  *
  * Why it exists: the flat probe (`IvfIndex.probePq`) scores a query
  * against ALL C centroids — O(C·dim) per query. At the gate's 16
  * cells that is nothing; at the 100 TB regime the coarse quantizer
  * has tens of thousands of cells (the usual sizing ~sqrt(N) cells
  * for N vectors → 1e9 vectors ≈ 32k cells), and centroid ranking
  * becomes a real per-query cost on the serving path. Greedy beam
  * search over a degree-bounded neighbor graph touches
  * O(beam·degree·hops) centroids instead — the measured-in-spec
  * fraction of C (CentroidGraphSpec: <1/4 of C at recall ≥ 0.95 on a
  * 1024-cell fixture).
  *
  * Scale posture: the graph lives where the centroids already live —
  * the DRIVER (k·dim doubles is the established contract of
  * [[Kmeans]]; the graph adds k·degree ints). The O(C²·dim) build is
  * a one-off at index-build time over CELL COUNT, not corpus size
  * (32k cells → ~1e9 centroid dots, seconds on one core), and is
  * embarrassingly parallel if C ever outgrows that. Queries never
  * touch Spark for cell selection; the cluster only sees the pruned
  * `cell IN (...)` scan, identical to the flat prober's.
  */
object CentroidGraph {

  /** `nbrs(i)` = the `degree` nearest other centroids of centroid i
    * (by cosine); `entry` = the centroid nearest the centroid-set
    * mean — a medoid-ish start so greedy search begins near the
    * middle of the space rather than a corner. */
  final case class Graph(cents: Array[Kmeans.Centroid],
      nbrs: Array[Array[Int]], entry: Int)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Build the kNN graph over unit-norm centroids. Symmetrized the
    * NSW way: j is appended to i's list whenever i is in j's top-k,
    * so greedy search can enter a cluster from either side (a pure
    * directed kNN graph strands queries whose entry path only has
    * edges pointing away). */
  def build(cents: Array[Kmeans.Centroid], degree: Int = 8): Graph = {
    val c = cents.length
    require(c > 0, "build: empty centroid set")
    val d = math.min(degree, math.max(1, c - 1))
    val top = Array.tabulate(c) { i =>
      val sims = new Array[(Double, Int)](c - 1)
      var k = 0
      var j = 0
      while (j < c) {
        if (j != i) { sims(k) = (dot(cents(i).v, cents(j).v), j); k += 1 }
        j += 1
      }
      sims.sortBy { case (s, jj) => (-s, jj) }.take(d).map(_._2)
    }
    val sym = Array.fill(c)(scala.collection.mutable.LinkedHashSet.empty[Int])
    var i = 0
    while (i < c) {
      top(i).foreach { j => sym(i) += j; sym(j) += i }
      i += 1
    }
    // entry: centroid most aligned with the mean direction
    val mean = new Array[Double](cents(0).v.length)
    cents.foreach { cc =>
      var k = 0
      while (k < mean.length) { mean(k) += cc.v(k); k += 1 }
    }
    var entry = 0; var bestS = Double.NegativeInfinity
    i = 0
    while (i < c) {
      val s = dot(cents(i).v, mean)
      if (s > bestS) { bestS = s; entry = i }
      i += 1
    }
    Graph(cents, sym.map(_.toArray), entry)
  }

  /** Greedy best-first beam search: expand the closest unexpanded
    * candidate, keep the best `beamWidth` seen, stop when the closest
    * frontier candidate is worse than the beam's worst (the standard
    * ef-search termination). Returns the best `nprobe` cell ids found,
    * sorted by decreasing query affinity (ties by cell id — same
    * deterministic order as the flat prober). `evalsOut(0)`, when
    * supplied, receives the number of centroid distance evaluations —
    * the quantity the graph exists to shrink. */
  def selectCells(g: Graph, q: Vec, nprobe: Int, beamWidth: Int = 32,
      evalsOut: Option[Array[Int]] = None): Array[Int] = {
    val ef = math.max(beamWidth, nprobe)
    val visited = new java.util.BitSet(g.cents.length)
    var evals = 0
    def sim(i: Int): Double = { evals += 1; dot(g.cents(i).v, q.v) / q.nrm }
    // frontier: best-first (max sim); beam: bounded, worst on top
    val frontier = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by { case (s, i) => (s, -i) })
    val beam = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by { case (s, i) => (-s, i) })
    val s0 = sim(g.entry)
    visited.set(g.entry)
    frontier.enqueue((s0, g.entry))
    beam.enqueue((s0, g.entry))
    while (frontier.nonEmpty &&
        (beam.size < ef || frontier.head._1 >= beam.head._1)) {
      val (_, cur) = frontier.dequeue()
      val ns = g.nbrs(cur)
      var a = 0
      while (a < ns.length) {
        val nb = ns(a)
        if (!visited.get(nb)) {
          visited.set(nb)
          val s = sim(nb)
          if (beam.size < ef) { beam.enqueue((s, nb)); frontier.enqueue((s, nb)) }
          else if (s > beam.head._1) {
            beam.dequeue(); beam.enqueue((s, nb)); frontier.enqueue((s, nb))
          }
        }
        a += 1
      }
    }
    evalsOut.foreach(_(0) = evals)
    val found: Seq[(Double, Int)] = beam.dequeueAll
    found.sortBy { case (s, i) => (-s, g.cents(i).cell) }
      .take(nprobe).map { case (_, i) => g.cents(i).cell }.toArray
  }

  /** [[IvfIndex.probePq]] with graph-selected cells: identical scan,
    * ADC, and re-rank machinery — only the probe-order decision
    * changes. With `beamWidth >= nCells` the beam search degenerates
    * to exhaustive ranking and the results equal the flat prober's
    * exactly (CentroidGraphSpec asserts this differentially). */
  def probePqGraph(spark: SparkSession, indexPath: String,
      queries: Array[Vec], idx: IvfIndex.PqIndexModel, g: Graph,
      k: Int = 5, nprobe: Int = 4, beamWidth: Int = 32,
      rerank: Int = 50): DataFrame = {
    val cells = queries.flatMap(q => selectCells(g, q, nprobe, beamWidth))
      .distinct.sorted
    IvfIndex.probePqCells(spark, indexPath, queries, idx, cells, k, rerank)
  }
}
