package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r9 scan-reuse pin: the adaptive prober's output must REMAIN a pure
  * function of (index model, per-query probe depths) — global ADC
  * top-(rerank·depth) per query over the probed-cell union, then the
  * exact re-rank — now that the cut is assembled from the in-loop
  * accumulators instead of a second codes-only scan. The DuckDB
  * `ann_ivfpq_adaptive` oracle re-derives exactly the two-pass
  * formulation from the depth dump, so this equality is what keeps
  * the gate honest: if the accumulator path ever diverges from the
  * explicit union-scan cut (emission cap too small, tie-break drift,
  * missed opportunistic scoring for early-converged queries), it must
  * fail HERE, not as an unexplained gate hash break. */
class AdaptiveProbeIdentitySpec extends SparkSpec {

  test("in-loop accumulated output equals the explicit union-scan global cut") {
    val path = "/tmp/graft_ivfpq_identity_spec"
    val idx = IvfIndex.buildPq(spark, sf(), path)
    val qs = Similarity.loadVectors(spark, sf())
      .filter(col("vec_id") < 10).collect().sortBy(_.vec_id)
      .map(v => Similarity.Vec(v.vec_id, Pq.l2normalize(v.v), 1.0))
    // spread of control knobs: default gate shape; a tight rerank with
    // single-rank rounds (more rounds → more accumulator merges, and
    // early-converged queries must keep scoring later cells); higher
    // patience with a coarse batch (different union shape)
    for ((patience, rerank, batch) <- Seq((1, 50, 2), (1, 20, 1), (2, 50, 3))) {
      val probed = new Array[Int](qs.length)
      val got = IvfIndex.probePqAdaptive(spark, path, qs, idx, k = 5,
        maxProbe = 16, patience = patience, rerank = rerank,
        rankBatch = batch, probedCellsOut = Some(probed))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // reconstruct the probed-cell union from the depths exactly the
      // way the oracle does: each query's first `depth` affinity ranks
      val ranked = qs.map { q =>
        idx.cents.map(c =>
            (Similarity.cosine(q, Similarity.Vec(-1, c.v, 1.0)), c.cell))
          .sortBy { case (s, i) => (-s, i) }.map(_._2)
      }
      val union = qs.indices
        .flatMap(qi => ranked(qi).take(math.max(1, probed(qi))))
        .distinct.sorted.toArray
      val caps = probed.map(p =>
        (math.max(1, p).toLong * rerank).min(Int.MaxValue).toInt)
      val twin = IvfIndex.probePqCellsCapped(spark, path, qs, idx, union, 5, caps)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === twin,
        s"accumulator cut diverged from the union-scan cut at " +
          s"patience=$patience rerank=$rerank rankBatch=$batch")
    }
  }
}
