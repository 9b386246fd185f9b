package graft.sim

import org.apache.spark.sql.Dataset
import graft.sim.Kmeans.Centroid
import graft.sim.Similarity.Vec

/** Corpus-side point blocking for the k-means trainers — the
  * complement of [[CentroidIndex]] (which prunes per POINT, this
  * prunes per BLOCK of points and amortizes the pruning work over
  * every point in the block, Elkan/Hamerly-style bounds adapted to
  * the spherical metric).
  *
  * The idea: cluster the CORPUS once into blocks (a coarse quantizer
  * over a driver-local sample), shuffle the corpus so each block's
  * points are contiguous inside a partition, and localCheckpoint the
  * result — one shuffle, paid once, reused by every Lloyd round. Per
  * round, a block with center b (unit) and angular radius ρ (max
  * member angle to b) admits, for every member point p and every
  * centroid c at angle ψ_c from b,
  *
  *   cos∠(p,c) ∈ [cos(min(π, ψ_c+ρ)), cos(max(0, ψ_c−ρ))]
  *
  * (the geodesic triangle inequality on the sphere; cosine similarity
  * depends only on the angle, so point norms divide out). A centroid
  * whose UPPER bound falls below the best LOWER bound over all
  * centroids — minus a round-off margin AGAINST pruning — is strictly
  * worse than some candidate for EVERY point of the block, so the
  * per-point scan covers only the surviving candidate list. The
  * argmax and the lowest-index tie-break are exactly the linear
  * scan's ([[Kmeans.nearest]]): excluded centroids are strictly
  * worse, so they can neither win nor tie.
  *
  * Cost model (per Lloyd round, block size s, candidates m ≪ k):
  * O(k·d / s + m·d) per point instead of O(k·d) — the O(k·d) bound
  * computation is paid once per block, not once per point. Combined
  * with the one-off prepare (two corpus passes + one shuffle), the
  * break-even is roughly `iters ≥ 2` at any realistic k; the 100 TB
  * trainer runs 3–10 rounds.
  *
  * Scale posture: the blocked corpus is localCheckpointed (executor-
  * local storage — the same materialization MLlib's trainer performs
  * with `cache()`); block count targets ~[[targetBlockSize]] points
  * per block so the per-block bound pass amortizes, capped so the
  * block model (centers + radii) stays a small broadcast. The driver
  * holds only the sampled seed vectors and the block model —
  * O(nBlocks·d), never the corpus.
  */
object PointBlocks {

  /** A corpus row tagged with its block and its angle to the block
    * center (the radius pass folds the max of these per block). */
  final case class Blocked(block: Int, angle: Double, vec_id: Long,
      v: Array[Double], nrm: Double)

  /** Block centers (unit) + angular radii, broadcast per round. */
  final case class Model(centers: Array[Array[Double]],
      radii: Array[Double]) extends Serializable

  /** Same safety discipline as [[CentroidIndex.Margin]]: a centroid is
    * only excluded when it provably cannot win or tie for any point
    * of the block, even under acos/cos round-off. */
  private[sim] val Margin = 1e-9

  private def clip(x: Double): Double =
    if (x > 1.0) 1.0 else if (x < -1.0) -1.0 else x

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(_ / n)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** splitmix64 → [0,1): the deterministic sampling coin (same
    * finalizer as the k-means‖ seeding hash). */
  private def hashUniform(x: Long): Double = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble
  }

  /** Nearest block center by dot (centers unit, point norm divides
    * out of the argmax), lowest index on ties — first-wins scan. */
  private def nearestCenter(v: Array[Double], centers: Array[Array[Double]]): Int = {
    var best = 0; var bestS = Double.NegativeInfinity
    var i = 0
    while (i < centers.length) {
      val s = dot(v, centers(i))
      if (s > bestS) { bestS = s; best = i }
      i += 1
    }
    best
  }

  /** Block the corpus: driver-local spherical Lloyd over a
    * deterministic hash-sample builds ~n/targetBlockSize coarse
    * centers; one pass tags every point; one shuffle groups blocks
    * contiguously; one cheap agg pass folds the radii. Returns None
    * on an empty corpus (callers fall back to the unblocked path).
    *
    * The returned Dataset is localCheckpointed — call sites reuse it
    * across every Lloyd round and let it expire with the session. */
  def prepare(corpus: Dataset[Vec], targetBlockSize: Int = 512,
      sampleCap: Int = 32768): Option[(Dataset[Blocked], Model)] = {
    import corpus.sparkSession.implicits._
    val spark = corpus.sparkSession
    val n = corpus.count()
    if (n == 0) return None
    val p = math.min(1.0, sampleCap.toDouble / n)
    val sample = corpus
      .filter(v => hashUniform(v.vec_id * 0x9e3779b97f4a7c15L + 0xb10cL) < p)
      .collect().sortBy(_.vec_id).map(v => normalize(v.v))
    if (sample.isEmpty) return None
    val nBlocks = math.max(1, math.min(sample.length,
      math.min(65536L, n / math.max(1, targetBlockSize)).toInt))
    // stride seeds over the id-sorted sample, 4 driver Lloyd rounds —
    // the same coarse-quantizer recipe CentroidIndex.build uses
    var centers: Array[Array[Double]] = Array.tabulate(nBlocks)(i =>
      sample(((i.toLong * sample.length) / nBlocks).toInt % sample.length).clone())
    var round = 0
    while (round < 4) {
      val sums = Array.fill(nBlocks)(new Array[Double](sample(0).length))
      val ns = new Array[Int](nBlocks)
      sample.foreach { v =>
        val b = nearestCenter(v, centers)
        var j = 0
        while (j < v.length) { sums(b)(j) += v(j); j += 1 }
        ns(b) += 1
      }
      centers = Array.tabulate(nBlocks)(b =>
        if (ns(b) == 0) centers(b) else normalize(sums(b)))
      round += 1
    }
    val bc = spark.sparkContext.broadcast(centers)
    val blocked = corpus.map { r =>
      val cs = bc.value
      val b = nearestCenter(r.v, cs)
      val nrm = if (r.nrm == 0.0) 1.0 else r.nrm
      Blocked(b, math.acos(clip(dot(r.v, cs(b)) / nrm)), r.vec_id, r.v, r.nrm)
    }
      .repartition(org.apache.spark.sql.functions.col("block"))
      .sortWithinPartitions("block")
      .localCheckpoint(true)
    val radii = new Array[Double](nBlocks)
    blocked.groupByKey(_.block)
      .mapValues(_.angle).reduceGroups((a, b) => math.max(a, b))
      .collect().foreach { case (b, r) => radii(b) = r }
    Some((blocked, Model(centers, radii)))
  }

  /** Candidate centroids for a block: every centroid whose upper
    * bound can still reach the best lower bound (with [[Margin]]
    * against pruning). Ascending index order — the per-point scan
    * over the result preserves the linear scan's first-wins
    * tie-break. */
  def candidates(model: Model, block: Int, cents: Array[Centroid]): Array[Int] = {
    val b = model.centers(block); val rho = model.radii(block)
    val k = cents.length
    val ub = new Array[Double](k)
    var maxLb = Double.NegativeInfinity
    var i = 0
    while (i < k) {
      val psi = math.acos(clip(dot(b, cents(i).v)))
      ub(i) = math.cos(math.max(0.0, psi - rho))
      val lb = math.cos(math.min(math.Pi, psi + rho))
      if (lb > maxLb) maxLb = lb
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    i = 0
    while (i < k) {
      if (ub(i) >= maxLb - Margin) out += i
      i += 1
    }
    out.toArray
  }

  /** Nearest centroid among `cand` (ascending indices) — identical
    * contract to [[Kmeans.nearest]] restricted to the candidate set,
    * which by construction contains the global argmax and every
    * centroid that could tie it. */
  private[sim] def nearestAmong(r: Vec, cents: Array[Centroid],
      cand: Array[Int]): Int = {
    val nrm = if (r.nrm == 0.0) 1.0 else r.nrm
    var best = 0; var bestS = Double.NegativeInfinity
    var m = 0
    while (m < cand.length) {
      val ci = cand(m)
      val s = dot(r.v, cents(ci).v) / nrm
      if (s > bestS) { bestS = s; best = ci }
      m += 1
    }
    best
  }

  /** One blocked Lloyd assignment-and-sum pass: per partition, the
    * candidate list refreshes only on block change (blocks are
    * contiguous after [[prepare]]'s sort), each point scans only the
    * candidates, and per-cell (Σv, n) partials come back tagged with
    * the partition id so the driver merges them in FIXED (cell,
    * partition) order — bit-reproducible for a fixed partitioning,
    * the same discipline as the k-means‖ φ and polish merges. */
  def assignSum(blocked: Dataset[Blocked], model: Model,
      cents: Array[Centroid]): Array[(Int, Array[Double], Long)] = {
    val spark = blocked.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((model, cents))
    val partials = blocked.mapPartitions { it =>
      val (m, cs) = bc.value
      var cur = -1
      var cand: Array[Int] = Array.empty
      val sums = scala.collection.mutable.Map.empty[Int, (Array[Double], Long)]
      it.foreach { b =>
        if (b.block != cur) { cur = b.block; cand = candidates(m, cur, cs) }
        val ci = nearestAmong(Vec(b.vec_id, b.v, b.nrm), cs, cand)
        val (sv, sn) = sums.getOrElseUpdate(ci,
          (new Array[Double](b.v.length), 0L))
        var j = 0
        while (j < b.v.length) { sv(j) += b.v(j); j += 1 }
        sums(ci) = (sv, sn + 1L)
      }
      val pid = org.apache.spark.TaskContext.getPartitionId()
      sums.iterator.map { case (ci, (sv, sn)) => (ci, pid, sv, sn) }
    }.collect().sortBy { case (ci, pid, _, _) => (ci, pid) }
    val merged = scala.collection.mutable.LinkedHashMap.empty[Int, (Array[Double], Long)]
    partials.foreach { case (ci, _, sv, sn) =>
      merged.get(ci) match {
        case None => merged(ci) = (sv, sn)
        case Some((av, an)) =>
          var j = 0
          while (j < sv.length) { av(j) += sv(j); j += 1 }
          merged(ci) = (av, an + sn)
      }
    }
    merged.iterator.map { case (ci, (sv, sn)) => (ci, sv, sn) }.toArray
  }
}
