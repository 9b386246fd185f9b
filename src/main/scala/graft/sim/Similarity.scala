package graft.sim

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (vec_id, embedding array<float>, label) — north-star extension.
  *
  * Scale design (100 TB posture):
  *  - Query vectors are broadcast (the query set is small by
  *    definition); the corpus is streamed once, partition-local.
  *  - Top-k is ALGEBRAIC: each partition keeps a k-size heap per
  *    query (mapPartitions), emitting ≤ |Q|·k rows; the final merge
  *    ranks |Q|·k·numPartitions rows — never shuffling the full
  *    |Q|·N score stream (a window over that stream would funnel
  *    1e10 rows into |Q| reducers at 1000-executor scale).
  *  - IVF variant prunes the scan: vectors are bucketed by nearest
  *    centroid; a query probes only `nprobe` cells. Centroid
  *    assignment is one narrow pass; the probe pass reads the same
  *    partition-local heaps.
  */
object Similarity {

  final case class Vec(vec_id: Long, v: Array[Double], nrm: Double)
  final case class Hit(query_id: Long, neighbor_id: Long, sim: Double)

  /** PriorityQueue ordering whose MAX (head) is the worst candidate:
    * lowest sim, then highest neighbor id. Shared with the embed
    * seam's large-query-set top-k tail ([[graft.text.Embed]]). */
  private[graft] val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** Sequential-summation cosine (engine-parity order; see Dedup). */
  def cosine(a: Vec, b: Vec): Double = {
    var dot = 0.0
    var i = 0
    val av = a.v; val bv = b.v
    while (i < av.length) { dot += av(i) * bv(i); i += 1 }
    dot / (a.nrm * b.nrm)
  }

  def loadVectors(spark: SparkSession, sfDir: String): Dataset[Vec] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"),
        expr("sqrt(aggregate(transform(embedding, x -> cast(x AS double)), 0D, (acc, x) -> acc + x * x))").as("nrm"))
      .as[Vec]
  }

  /** Per-partition top-k accumulation against a broadcast query set,
    * then a final global rank over the tiny candidate union. */
  private[sim] def partialTopK(corpus: Dataset[Vec], queries: Array[Vec], k: Int): Dataset[Hit] = {
    import corpus.sparkSession.implicits._
    val bc = corpus.sparkSession.sparkContext.broadcast(queries)
    corpus.mapPartitions { rows =>
      val qs = bc.value
      // per-query bounded candidate heap; head = worst kept candidate
      val heaps = Array.fill(qs.length)(
        scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
      rows.foreach { r =>
        var qi = 0
        while (qi < qs.length) {
          val q = qs(qi)
          if (r.vec_id != q.vec_id) {
            val s = cosine(q, r)
            val h = heaps(qi)
            if (h.size < k) h.enqueue((s, r.vec_id))
            else {
              val (ws, wid) = h.head
              if (s > ws || (s == ws && r.vec_id < wid)) { h.dequeue(); h.enqueue((s, r.vec_id)) }
            }
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (s, id) => Hit(qs(qi).vec_id, id, s) }
      }
    }
  }

  private[sim] def rankHits(hits: Dataset[Hit], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    hits.toDF()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** Exact brute-force cosine top-k for the first `numQueries` vectors
    * (the correctness baseline; also the honest small-query-set path). */
  def topKExact(spark: SparkSession, sfDir: String, k: Int = 5,
      numQueries: Int = 10): DataFrame = {
    import spark.implicits._
    val corpus = loadVectors(spark, sfDir)
    val queries = corpus.filter(col("vec_id") < numQueries).collect()
      .sortBy(_.vec_id)
    rankHits(partialTopK(corpus, queries, k), k)
  }

  /** IVF-style ANN: corpus bucketed by nearest of `nCells` centroids
    * (default: deterministically the first nCells vectors; pass
    * `centroidsOpt` for a trained codebook — see graft.sim.Kmeans);
    * a query scans only its `nprobe` nearest cells. Approximate w.r.t.
    * exact top-k (recall measured in SimilaritySpec) but DETERMINISTIC
    * as an operator: with the first-N seed every stage — assignment,
    * probe selection, scoring, rank — is a pure function of the
    * embeddings table, so `ann_ivf` carries a full DuckDB hash oracle
    * (ordered-IEEE cosine, first-index tie-breaks, no floats in the
    * output); trained codebooks get the same oracle via a centroid
    * side dump (graft.sim.Kmeans). */
  def topKIvf(spark: SparkSession, sfDir: String, k: Int = 5, numQueries: Int = 10,
      nCells: Int = 16, nprobe: Int = 4,
      centroidsOpt: Option[Array[Vec]] = None): DataFrame = {
    import spark.implicits._
    val corpus = loadVectors(spark, sfDir)
    val centroids = centroidsOpt.getOrElse(
      corpus.filter(col("vec_id") < nCells).collect().sortBy(_.vec_id))
    val bcCent = spark.sparkContext.broadcast(centroids)
    def nearestCells(v: Vec, n: Int): Array[Int] =
      bcCent.value.map(c => cosine(v, c)).zipWithIndex
        .sortBy { case (s, i) => (-s, i) }.take(n).map(_._2)
    val queries = corpus.filter(col("vec_id") < numQueries).collect().sortBy(_.vec_id)
    val probes: Map[Long, Set[Int]] =
      queries.map(q => q.vec_id -> nearestCells(q, nprobe).toSet).toMap
    val bcQ = spark.sparkContext.broadcast(queries)
    val bcProbes = spark.sparkContext.broadcast(probes)
    val hits = corpus.mapPartitions { rows =>
      val qs = bcQ.value
      val pr = bcProbes.value
      val heaps = Array.fill(qs.length)(
        scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
      rows.foreach { r =>
        val cell = {
          val cs = bcCent.value
          var best = 0; var bestS = Double.NegativeInfinity
          var i = 0
          while (i < cs.length) {
            val s = cosine(r, cs(i)); if (s > bestS) { bestS = s; best = i }; i += 1
          }
          best
        }
        var qi = 0
        while (qi < qs.length) {
          val q = qs(qi)
          if (r.vec_id != q.vec_id && pr(q.vec_id).contains(cell)) {
            val s = cosine(q, r)
            val h = heaps(qi)
            if (h.size < k) h.enqueue((s, r.vec_id))
            else {
              val (ws, wid) = h.head
              if (s > ws || (s == ws && r.vec_id < wid)) { h.dequeue(); h.enqueue((s, r.vec_id)) }
            }
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (s, id) => Hit(qs(qi).vec_id, id, s) }
      }
    }
    rankHits(hits, k)
  }
}
