package graft.sim

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import Similarity.{Vec, Hit, cosine}

/** Scalar-quantized (SQ8) ANN — the simpler point on the
  * compression/recall curve next to PQ: one byte PER DIMENSION with a
  * per-dimension affine scale (8× smaller than float64, vs PQ's 64×),
  * no codebook training, and much gentler distortion, so recall stays
  * near-exact while the scan reads a quarter of the float32 bytes.
  *
  * Math: with per-dim ranges (min_j, step_j = (max_j - min_j)/255),
  * the approximate dot product against query q decomposes as
  *   dot(q, dequant(c)) = Σ_j q_j·min_j + Σ_j (q_j·step_j)·c_j
  * so each query precomputes the constant and the weight vector
  * w_j = q_j·step_j once, and the scan is a byte-weighted sum — no
  * per-row dequantization.
  *
  * At 100 TB: the stats pass is one narrow scan producing dim-sized
  * partials per partition; codes are map-only; the scan is the same
  * bounded-heap partition-local top-k as the exact/PQ paths; only the
  * rerank set's float vectors are ever fetched. */
object Sq {

  /** Per-dimension (min, step) of the corpus — the whole "model". */
  final case class SqScale(mins: Array[Double], steps: Array[Double])

  /** One narrow pass: per-partition (min[], max[]) partials, reduced
    * on dim-sized arrays (numPartitions rows of 2·dim doubles). */
  private[sim] def fitScale(corpus: Dataset[Vec]): SqScale = {
    import corpus.sparkSession.implicits._
    val (mins, maxs) = corpus.mapPartitions { rows =>
      var lo: Array[Double] = null
      var hi: Array[Double] = null
      rows.foreach { r =>
        if (lo == null) { lo = r.v.clone; hi = r.v.clone }
        else {
          var i = 0
          while (i < r.v.length) {
            if (r.v(i) < lo(i)) lo(i) = r.v(i)
            if (r.v(i) > hi(i)) hi(i) = r.v(i)
            i += 1
          }
        }
      }
      if (lo == null) Iterator.empty else Iterator.single((lo, hi))
    }.reduce { (a, b) =>
      val lo = a._1.clone; val hi = a._2.clone
      var i = 0
      while (i < lo.length) {
        if (b._1(i) < lo(i)) lo(i) = b._1(i)
        if (b._2(i) > hi(i)) hi(i) = b._2(i)
        i += 1
      }
      (lo, hi)
    }
    SqScale(mins, maxs.zip(mins).map { case (h, l) =>
      val s = (h - l) / 255.0
      if (s == 0.0) 1.0 else s // constant dim: any step works, code = 0
    })
  }

  private[sim] def encode(sc: SqScale, v: Array[Double]): Array[Byte] =
    Array.tabulate(v.length) { j =>
      val q = math.round((v(j) - sc.mins(j)) / sc.steps(j))
      math.max(0L, math.min(255L, q)).toByte
    }

  /** Top-k by SQ8 approximate dot with exact cosine re-rank. Queries
    * are the first `numQueries` corpus vectors, as in the PQ path. */
  def topKSq(spark: SparkSession, sfDir: String, k: Int = 5,
      numQueries: Int = 10, rerank: Int = 50): DataFrame = {
    import spark.implicits._
    val corpus = Similarity.loadVectors(spark, sfDir)
      .map(v => Vec(v.vec_id, Pq.l2normalize(v.v), 1.0))
    val scale = fitScale(corpus)
    val queries = corpus.filter(col("vec_id") < numQueries).collect().sortBy(_.vec_id)
    val bcScale = spark.sparkContext.broadcast(scale)
    val bcQ = spark.sparkContext.broadcast(queries)
    // per-query affine decomposition: constant + byte weights
    val bcW = spark.sparkContext.broadcast(queries.map { q =>
      val w = Array.tabulate(q.v.length)(j => q.v(j) * scale.steps(j))
      val c = q.v.indices.map(j => q.v(j) * scale.mins(j)).sum
      (c, w)
    })
    val candidates = corpus.mapPartitions { rows =>
      val qs = bcQ.value; val ws = bcW.value; val sc = bcScale.value
      val heaps = Array.fill(qs.length)( // min on top: worst candidate first
        scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
          Similarity.worstFirst))
      rows.foreach { r =>
        val code = encode(sc, r.v)
        var qi = 0
        while (qi < qs.length) {
          if (r.vec_id != qs(qi).vec_id) {
            val (c0, w) = ws(qi)
            var d = c0
            var j = 0
            while (j < w.length) { d += w(j) * (code(j) & 0xff); j += 1 }
            val h = heaps(qi)
            if (h.size < rerank) h.enqueue((d, r.vec_id))
            else if (d > h.head._1 || (d == h.head._1 && r.vec_id < h.head._2)) {
              h.dequeue(); h.enqueue((d, r.vec_id))
            }
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (_, id) => (qs(qi).vec_id, id) }
      }
    }.toDF("query_id", "neighbor_id").distinct()
    val rescored = candidates
      .join(corpus.toDF().select(col("vec_id"), col("v")),
        col("neighbor_id") === col("vec_id"))
      .select(col("query_id"), col("neighbor_id"), col("v"))
      .as[(Long, Long, Array[Double])]
      .map { case (q, n, v) =>
        val qv = bcQ.value(bcQ.value.indexWhere(_.vec_id == q))
        Hit(q, n, cosine(qv, Vec(n, v, 1.0)))
      }
    Similarity.rankHits(rescored, k)
  }
}
