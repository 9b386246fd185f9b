package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.sim.{IvfIndex, Similarity}

/** Closes the index-maintenance loop: streaming micro-batches append
  * into a persisted IVF-PQ index ([[IvfIndex.appendPq]] — frozen
  * centroids, probe-consistent), and each batch's assignment cohesion
  * is compared against the BUILD-TIME baseline. When fresh data stops
  * fitting the cells (cohesion degrades beyond `driftPpm` parts per
  * million of the baseline), the batch is flagged `retrain` — the
  * rebuild itself runs OUT OF BAND via the batch build path: an index
  * rebuild inside a micro-batch would block the stream and tear down
  * the frozen-centroid invariant mid-flight, so the stream only ever
  * raises the signal.
  *
  * The per-batch metric row is pushed to `onMetric` (a metrics sink in
  * production; the spec collects them). State carried between batches:
  * none — the baseline is a constant, every batch is judged
  * independently, so the wrapper adds no state store to the stream.
  */
object IndexMaintenance {

  final case class BatchMetric(batchId: Long, n: Long,
      cohesionMicro: Long, baselineMicro: Long, retrain: Boolean)

  /** Cohesion of a corpus slice against the index's cells — the
    * constant the stream judges every batch against. Measure it on a
    * HELD-OUT in-distribution slice, not the training data: trained
    * centroids fit their own training set markedly better (measured
    * 0.38 vs 0.22 on the gate corpus halves), so a training-set
    * baseline makes every honest batch look drifted. Same
    * normalization as the PQ probe path. */
  def baselineCohesion(corpus: Dataset[Similarity.Vec],
      idx: IvfIndex.PqIndexModel): Long = {
    import corpus.sparkSession.implicits._
    graft.sim.Kmeans.cohesionMicro(
      corpus.map(v => Similarity.Vec(v.vec_id,
        graft.sim.Pq.l2normalize(v.v), 1.0)), idx.cents)
  }

  /** The `foreachBatch` body: append + measure + signal. Empty batches
    * emit no metric (no evidence either way). */
  def maintainBatch(spark: SparkSession, indexPath: String,
      idx: IvfIndex.PqIndexModel, baselineMicro: Long, driftPpm: Long,
      onMetric: BatchMetric => Unit)(
      batch: Dataset[Similarity.Vec], batchId: Long): Unit = {
    // three consumers (count, append's write, cohesion pass) — persist
    // for the body's duration so the micro-batch source is read once,
    // and gate emptiness on the count itself rather than a 4th action
    batch.persist()
    try {
      val n = batch.count()
      if (n > 0) {
        val cohesion = IvfIndex.appendPq(spark, indexPath, idx, batch)
        val retrain =
          (baselineMicro - cohesion) * 1000000L > driftPpm * baselineMicro
        onMetric(BatchMetric(batchId, n, cohesion, baselineMicro, retrain))
      }
    } finally { batch.unpersist(); () }
  }
}
