package graft.streaming

import graft.SparkSpec
import graft.sim.IvfIndex
import graft.sim.Similarity.Vec

class IndexMaintenanceSpec extends SparkSpec {

  // deterministic LCG doubles in [-1, 1)
  private def rng(seed: Long): () => Double = {
    var s = seed
    () => {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble - 0.5) * 2.0
    }
  }

  test("drift loop: in-distribution batches pass, a shifted batch raises retrain") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = "/tmp/graft_idx_maint_spec"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(path))
    // planted-cluster corpus: 16 well-separated centers, points =
    // center + small noise → high in-distribution cohesion. The gate
    // corpus' flat spectrum won't do here: any unit vector scores
    // ~0.2 against its near-isotropic cells, so no batch can "drift".
    val d = 64
    val g = rng(11)
    val centers = Array.fill(16)(Array.fill(d)(g()))
    def point(id: Long, c: Int): Vec = {
      val x = centers(c).map(_ + g() * 0.05)
      Vec(id, x, math.sqrt(x.map(v => v * v).sum))
    }
    val seedVecs = (0 until 250).map(i => point(i.toLong, i % 16))
    val holdout = (250 until 375).map(i => point(i.toLong, i % 16))
    val inDist = (375 until 500).map(i => point(i.toLong, i % 16))
    // the shift: uniform random directions — nothing near the cells
    val shifted = (0 until 125).map { i =>
      val x = Array.fill(d)(g())
      Vec(100000L + i, x, math.sqrt(x.map(v => v * v).sum))
    }
    val idx = IvfIndex.buildPqOf(spark, spark.createDataset(seedVecs), path)
    IvfIndex.saveModel(spark, path, idx)
    // baseline from HELD-OUT in-distribution data, not the training
    // slice (training cohesion is inflated by the fit itself — see
    // baselineCohesion's scaladoc)
    val baseline = IndexMaintenance.baselineCohesion(
      spark.createDataset(holdout), idx)
    val metrics = scala.collection.mutable.ArrayBuffer.empty[IndexMaintenance.BatchMetric]
    val input = MemoryStream[Vec]
    val q = input.toDS().writeStream
      .foreachBatch(IndexMaintenance.maintainBatch(spark, path, idx,
        baseline, driftPpm = 100000L, m => metrics.synchronized { metrics += m; () }) _)
      .start()
    try {
      input.addData(inDist); q.processAllAvailable()
      input.addData(shifted); q.processAllAvailable()
    } finally q.stop()
    assert(metrics.length === 2, s"expected 2 batch metrics, got $metrics")
    val Seq(ok, drifted) = metrics.sortBy(_.batchId).toSeq
    assert(!ok.retrain,
      s"in-distribution batch flagged retrain: $ok (baseline $baseline)")
    assert(drifted.retrain,
      s"shifted batch not flagged: $drifted (baseline $baseline)")
    assert(drifted.cohesionMicro < ok.cohesionMicro)
    // the appended rows are live: both batches landed in the index
    assert(spark.read.parquet(path).count() ===
      seedVecs.length.toLong + inDist.length + shifted.length)
  }
}
