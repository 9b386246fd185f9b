package graft.sim

import graft.sim.Kmeans.Centroid
import graft.sim.Similarity.Vec

/** Driver-local micro-benchmark for the [[CentroidIndex]] assignment
  * accelerator — measures the per-point nearest-centroid cost at the
  * large-k regime the trainers hit on a 100 TB IVF, where the linear
  * scan is O(k·d) per point. No Spark session: the assignment kernel
  * is the same code the executors run inside the trainer passes, so
  * a single-thread wall-clock ratio transfers directly.
  *
  * args: [k] [d] [nPoints] (defaults 4096, 64, 20000). Prints one
  * line per configuration: linear s, pruned s, speedup, mean scanned.
  * Deterministic (hash-generated clustered data, no RNG state). */
object AssignBench {

  private def mix(seed: Long, j: Int): Double =
    graft.core.Mix.unitDouble(seed * 1000003L + j) - 0.5

  private def unit(seed: Long, d: Int): Array[Double] = {
    val v = Array.tabulate(d)(mix(seed, _))
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** Clustered unit vectors: `groups` anchors, jittered members —
    * the shape a trained codebook (and its corpus) actually has. */
  private def clustered(seed: Long, groups: Int, d: Int, jitter: Double): Array[Double] = {
    val anchor = unit(1000 + seed % groups, d)
    val j = unit(50000 + seed, d)
    val v = anchor.zip(j).map { case (a, b) => a + jitter * b }
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  def main(args: Array[String]): Unit = {
    val k = args.lift(0).map(_.toInt).getOrElse(4096)
    val d = args.lift(1).map(_.toInt).getOrElse(64)
    val n = args.lift(2).map(_.toInt).getOrElse(20000)
    val groups = math.max(8, k / 64)
    val cents = Array.tabulate(k)(i => Centroid(i, clustered(i, groups, d, 0.10)))
    val points = Array.tabulate(n)(i => Vec(i, clustered(3000000L + i, groups, d, 0.25), 1.0))

    // warmup both paths (JIT)
    val idxW = CentroidIndex.build(cents)
    points.take(500).foreach { p => Kmeans.nearest(p, cents); idxW.nearest(p) }

    val tb0 = System.nanoTime()
    val idx = CentroidIndex.build(cents)
    val buildS = (System.nanoTime() - tb0) / 1e9

    val t0 = System.nanoTime()
    var sink = 0
    points.foreach { p => sink ^= Kmeans.nearest(p, cents) }
    val linS = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    var scanned = 0L
    var mismatch = 0
    points.foreach { p =>
      val (got, sc) = idx.nearestCounting(p)
      scanned += sc
      sink ^= got
    }
    val prunedS = (System.nanoTime() - t1) / 1e9
    // exactness re-check inline (the spec pins it; belt and braces here)
    points.take(2000).foreach { p =>
      if (idx.nearest(p) != Kmeans.nearest(p, cents)) mismatch += 1
    }
    println(f"[assign-bench] k=$k d=$d n=$n build=${buildS}%.2fs " +
      f"linear=${linS}%.2fs pruned=${prunedS}%.2fs speedup=${linS / prunedS}%.1fx " +
      f"meanScanned=${scanned.toDouble / n}%.0f/$k mismatches=$mismatch (sink=${sink & 1})")

    // ── blocked pass (PointBlocks kernel, driver-local simulation of
    // one partition's iteration order: points contiguous per block,
    // candidate list recomputed only on block change) ────────────────
    val targetBlock = 512
    val nBlocks = math.max(1, n / targetBlock)
    // coarse centers via the shared driver quantizer — the same
    // recipe PointBlocks.prepare runs on the executor-side sample
    val bCenters = CentroidIndex.driverLloyd(points.map(_.v), nBlocks, rounds = 4)._1
    def blockOf(p: Vec): Int = {
      var bi = 0; var best = 0; var bestS = Double.NegativeInfinity
      while (bi < nBlocks) {
        var dot = 0.0; var j = 0
        while (j < d) { dot += p.v(j) * bCenters(bi)(j); j += 1 }
        if (dot > bestS) { bestS = dot; best = bi }
        bi += 1
      }
      best
    }
    val byBlock = points.map(p => (blockOf(p), p)).sortBy { case (b, p) => (b, p.vec_id) }
    val model = PointBlocks.Model(bCenters)
    def angleOf(b: Int, p: Vec): Double = {
      var dot = 0.0; var j = 0
      while (j < d) { dot += p.v(j) * bCenters(b)(j); j += 1 }
      math.acos(math.max(-1.0, math.min(1.0, dot)))
    }
    // warmup
    {
      val s0 = PointBlocks.blockScan(model, byBlock(0)._1, cents)
      byBlock.take(500).foreach { case (b, p) =>
        PointBlocks.nearestScan(p, angleOf(b, p), cents,
          if (b == byBlock(0)._1) s0 else PointBlocks.blockScan(model, b, cents))
      }
    }
    val t2 = System.nanoTime()
    var scoredTotal = 0L; var blkMismatch = 0
    var cur = -1; var scan: PointBlocks.BlockScan = null
    var lastWin = -1
    byBlock.foreach { case (b, p) =>
      if (b != cur) { cur = b; scan = PointBlocks.blockScan(model, b, cents); lastWin = -1 }
      val (got, scored) =
        PointBlocks.nearestScanCounting(p, angleOf(b, p), cents, scan, lastWin)
      lastWin = got
      scoredTotal += scored
      sink ^= got
    }
    val blockedS = (System.nanoTime() - t2) / 1e9
    byBlock.take(2000).foreach { case (b, p) =>
      if (PointBlocks.nearestScan(p, angleOf(b, p), cents,
          PointBlocks.blockScan(model, b, cents)) != Kmeans.nearest(p, cents))
        blkMismatch += 1
    }
    println(f"[assign-bench] blocked: nBlocks=$nBlocks blocked=${blockedS}%.2fs " +
      f"speedupVsLinear=${linS / blockedS}%.1fx speedupVsPruned=${prunedS / blockedS}%.1fx " +
      f"meanScored=${scoredTotal.toDouble / n}%.0f/$k mismatches=$blkMismatch (sink=${sink & 1})")

    // ── CentroidIndex + block-locality warm start (the multi-
    // directional coarse bound, seeded with the previous same-block
    // point's winner) ─────────────────────────────────────────────────
    byBlock.take(500).foreach { case (_, p) => idx.nearest(p, 0) } // warmup
    val t3 = System.nanoTime()
    var scanned3 = 0L; var mismatch3 = 0
    cur = -1; lastWin = -1
    byBlock.foreach { case (b, p) =>
      if (b != cur) { cur = b; lastWin = -1 }
      val (got, sc) = idx.nearestCounting(p, lastWin)
      lastWin = got
      scanned3 += sc
      sink ^= got
    }
    val warmS = (System.nanoTime() - t3) / 1e9
    byBlock.take(2000).foreach { case (_, p) =>
      if (idx.nearest(p, 0) != Kmeans.nearest(p, cents)) mismatch3 += 1
    }
    println(f"[assign-bench] pruned+warm: warm=${warmS}%.2fs " +
      f"speedupVsLinear=${linS / warmS}%.1fx speedupVsPruned=${prunedS / warmS}%.1fx " +
      f"meanScanned=${scanned3.toDouble / n}%.0f/$k mismatches=$mismatch3 (sink=${sink & 1})")
  }
}
