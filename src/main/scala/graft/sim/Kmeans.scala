package graft.sim

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sim.Similarity.{Vec, cosine}

/** Distributed Lloyd's k-means over the embedding corpus — the
  * codebook trainer behind IVF cells (and, at nsub slices, PQ
  * codebooks). Spherical variant: similarity = cosine, centroids
  * L2-normalized after each update, so "nearest centroid" and the
  * IVF probe metric agree.
  *
  * Scale design (100 TB posture): each iteration is ONE narrow pass —
  * centroids broadcast, per-partition partial sums via
  * `reduceGroups` (map-side combine: k·dim doubles per partition
  * cross the wire, never the vectors). The driver holds k·dim
  * doubles; the corpus is never collected, and lineage is cut per
  * round via localCheckpoint of nothing — centroids live on the
  * driver, so each round's plan is flat (scan → mapPartitions →
  * partial agg), not compounding.
  */
object Kmeans {

  final case class Centroid(cell: Int, v: Array[Double])

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(_ / n)
  }

  private[sim] def nearest(r: Vec, cents: Array[Centroid]): Int = {
    var best = 0; var bestS = Double.NegativeInfinity
    var i = 0
    while (i < cents.length) {
      // cosine against a unit centroid = dot / |r|
      var dot = 0.0; var j = 0
      val cv = cents(i).v; val rv = r.v
      while (j < rv.length) { dot += rv(j) * cv(j); j += 1 }
      val s = dot / r.nrm
      if (s > bestS) { bestS = s; best = i }
      i += 1
    }
    best
  }

  /** `iters` Lloyd rounds from the deterministic seed of the first
    * `k` vectors (by vec_id). Empty cells keep their previous
    * centroid. Returns unit-norm centroids. */
  def train(corpus: Dataset[Vec], k: Int, iters: Int): Array[Centroid] = {
    import corpus.sparkSession.implicits._
    val spark = corpus.sparkSession
    var cents = corpus.filter(col("vec_id") < k).collect().sortBy(_.vec_id)
      .zipWithIndex.map { case (v, i) => Centroid(i, normalize(v.v)) }
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val sums = corpus
        .map { r => (nearest(r, bc.value), (r.v, 1L)) }
        .groupByKey(_._1)
        .reduceGroups { (a, b) =>
          val (av, an) = a._2; val (bv, bn) = b._2
          val out = new Array[Double](av.length)
          var i = 0
          while (i < av.length) { out(i) = av(i) + bv(i); i += 1 }
          (a._1, (out, an + bn))
        }
        .map { case (cell, (_, (sum, n))) => (cell, sum, n) }
        .collect()
      val byCell = sums.map { case (cell, sum, _) => cell -> sum }.toMap
      cents = cents.map { c =>
        byCell.get(c.cell) match {
          case Some(sum) => Centroid(c.cell, normalize(sum))
          case None      => c
        }
      }
      bc.destroy()
    }
    cents
  }

  /** Mean within-cluster cosine (×1e6, integer) — the spherical
    * k-means objective; must be non-decreasing over training. */
  def cohesionMicro(corpus: Dataset[Vec], cents: Array[Centroid]): Long = {
    import corpus.sparkSession.implicits._
    val bc = corpus.sparkSession.sparkContext.broadcast(cents)
    val (s, n) = corpus.map { r =>
      val c = bc.value(nearest(r, bc.value))
      var dot = 0.0; var j = 0
      while (j < r.v.length) { dot += r.v(j) * c.v(j); j += 1 }
      (dot / r.nrm, 1L)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    math.round(s / n * 1e6)
  }

  /** Basenames of the last corpus dirs the two gate surfaces dumped
    * centroids for ([[cellSizes]] / [[topKIvfTrained]]);
    * `SparkEntry.oracleSql` binds the oracle globs to them. Each gate
    * dumps ITS OWN run's centroids under its own kind: `train`'s
    * partial-sum merge order is scheduler-dependent in the last ulp,
    * so two train() calls may not be bit-identical — the run-scoped
    * dump captures exactly the codebook the gate output used. */
  @volatile var lastCellsBase: String = "sf0.01"
  @volatile var lastIvfTrainedBase: String = "sf0.01"

  /** Centroid side-dump paths for the two gate surfaces. */
  def cellsDumpPath(base: String): String =
    graft.core.SideDump.path("kmeans_cells_cents", base)
  def ivfTrainedDumpPath(base: String): String =
    graft.core.SideDump.path("ivf_trained_cents", base)

  private def dumpCents(spark: SparkSession, cents: Array[Centroid],
      kind: String, sfDir: String): String = {
    import spark.implicits._
    graft.core.SideDump.write(
      cents.toSeq.map(c => (c.cell, c.v.toSeq)).toDF("cell", "v"),
      kind, new java.io.File(sfDir).getName)
    new java.io.File(sfDir).getName
  }

  /** IVF search over a TRAINED codebook: Lloyd centroids replace the
    * first-N seed, same probe machinery (Similarity.topKIvf). The
    * trained centroids are side-dumped: the Lloyd iterations are the
    * only thing the DuckDB gate takes on faith — cell assignment,
    * probe selection, cosine scoring, and the top-k rank are all
    * re-derived from the dumped codebook and the raw embeddings
    * (every float op is an exactly-specified IEEE-754 double op in
    * the same order as the Scala scorer, and the output carries no
    * floats — (query_id, neighbor_id, rank) only). */
  def topKIvfTrained(spark: SparkSession, sfDir: String, k: Int = 5,
      numQueries: Int = 10, nCells: Int = 16, nprobe: Int = 4,
      iters: Int = 3): DataFrame = {
    val trained = train(Similarity.loadVectors(spark, sfDir), nCells, iters)
    lastIvfTrainedBase = dumpCents(spark, trained, "ivf_trained_cents", sfDir)
    val cents = trained
      .map(c => Vec(-1L - c.cell, c.v, 1.0)) // unit-norm; id unused in probing
    Similarity.topKIvf(spark, sfDir, k, numQueries, nCells, nprobe, Some(cents))
  }

  /** Cluster-assignment summary (cell sizes): the observable surface
    * of the trainer. Hash-gated via the centroid side dump — DuckDB
    * re-derives the argmax-cosine assignment (dot / ‖r‖ against unit
    * centroids, first-index tie-break) and the per-cell counts. */
  def cellSizes(spark: SparkSession, sfDir: String, k: Int = 16,
      iters: Int = 3): DataFrame = {
    import spark.implicits._
    val corpus = Similarity.loadVectors(spark, sfDir)
    val cents = train(corpus, k, iters)
    lastCellsBase = dumpCents(spark, cents, "kmeans_cells_cents", sfDir)
    val bc = spark.sparkContext.broadcast(cents)
    corpus.map(r => nearest(r, bc.value))
      .toDF("cell")
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
  }
}
