package graft.sim

import graft.SparkSpec

/** In-JVM mirrors of the IVF/k-means DuckDB oracles
  * (`SparkEntry.oracleSql`): the trained centroids are the only
  * artifact taken on faith (run-scoped side dumps; the seed-codebook
  * `ann_ivf` oracle takes nothing at all) — cell assignment, probe
  * selection, cosine scoring and the top-k rank are re-derived here
  * through independent plain-Scala pipelines (sorted lists, not the
  * operators' heaps) and proven to reproduce the gate outputs
  * exactly, with tampered dumps detected. */
class AnnOracleSpec extends SparkSpec {

  private final case class V(id: Long, v: Array[Double], nrm: Double)

  /** Embeddings read directly from parquet — independent of
    * Similarity.loadVectors' expression pipeline. */
  private def vectors(): Seq[V] =
    spark.read.parquet(s"${sf()}/embeddings.parquet").collect().map { r =>
      val v = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      V(r.getAs[Long]("vec_id"), v, math.sqrt(s))
    }.toSeq.sortBy(_.id)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** The probe pipeline as the SQL derives it: argmax-cosine cell
    * (first-cell tie-break), nprobe probe cells per query, exact
    * cosine within probed cells, rank by (sim desc, id). Centroid
    * norms are supplied (trained codebooks are unit by contract). */
  private def mirrorIvf(corpus: Seq[V], cents: Seq[(Array[Double], Double)],
      nprobe: Int, k: Int): Set[(Long, Long, Long)] = {
    def cos(a: V, c: (Array[Double], Double)): Double = dot(a.v, c._1) / (a.nrm * c._2)
    def cellOf(r: V): Int =
      cents.zipWithIndex.map { case (c, i) => (-cos(r, c), i) }.min._2
    val cellIdx = corpus.map(r => r.id -> cellOf(r)).toMap
    val queries = corpus.filter(_.id < 10)
    queries.flatMap { q =>
      val probed = cents.zipWithIndex.map { case (c, i) => (-cos(q, c), i) }
        .sorted.take(nprobe).map(_._2).toSet
      corpus
        .filter(r => r.id != q.id && probed.contains(cellIdx(r.id)))
        .map(r => (-(dot(q.v, r.v) / (q.nrm * r.nrm)), r.id))
        .sorted.take(k).zipWithIndex
        .map { case ((_, id), rk) => (q.id, id, rk + 1L) }
    }.toSet
  }

  private def gateRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("ann_ivf: the seed-codebook derivation from embeddings alone reproduces topKIvf") {
    val got = gateRows(Similarity.topKIvf(spark, sf()))
    val corpus = vectors()
    val seeds = corpus.filter(_.id < 16).map(c => (c.v, c.nrm))
    assert(mirrorIvf(corpus, seeds, nprobe = 4, k = 5) === got)
    assert(got.size === 50)
  }

  test("ann_ivf_trained: dumped centroids + the same derivation reproduce the gate") {
    val got = gateRows(Kmeans.topKIvfTrained(spark, sf())) // trains AND dumps
    val cents = spark.read.parquet(
        Kmeans.ivfTrainedDumpPath(Kmeans.lastIvfTrainedBase))
      .collect().map(r => r.getAs[Int]("cell") -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(c => (c._2, 1.0)) // unit-norm by contract
    assert(cents.length === 16)
    assert(mirrorIvf(vectors(), cents.toSeq, nprobe = 4, k = 5) === got)
  }

  test("ann_kmeans_cells: dumped centroids + independent assignment reproduce cellSizes") {
    val got = Kmeans.cellSizes(spark, sf()).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cents = spark.read.parquet(Kmeans.cellsDumpPath(Kmeans.lastCellsBase))
      .collect().map(r => r.getAs[Int]("cell") -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    // Kmeans.nearest scores dot/|r| against unit centroids — argmax
    // equals argmax cosine; first index wins ties
    val mirror = vectors()
      .map(r => cents.map(c => (-(dot(r.v, c._2) / r.nrm), c._1)).min._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(mirror === got)
    assert(got.values.sum === vectors().size.toLong)
  }

  test("ann oracle can fail: dropping a populated centroid is detected") {
    val got = Kmeans.cellSizes(spark, sf()).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cents = spark.read.parquet(Kmeans.cellsDumpPath(Kmeans.lastCellsBase))
      .collect().map(r => r.getAs[Int]("cell") -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val victim = got.filter(_._2 > 0).keys.head
    val tampered = cents.filterNot(_._1 == victim)
    val mirror = vectors()
      .map(r => tampered.map(c => (-(dot(r.v, c._2) / r.nrm), c._1)).min._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(mirror !== got,
      s"removing populated centroid $victim must change the derived counts")
  }
}
