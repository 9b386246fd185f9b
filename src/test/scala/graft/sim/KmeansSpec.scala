package graft.sim

import graft.SparkSpec

class KmeansSpec extends SparkSpec {

  private def recallVsExact(df: org.apache.spark.sql.DataFrame): Double = {
    val exact = Similarity.topKExact(spark, sf(), k = 5, numQueries = 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = df.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val rs = exact.map { case (q, ex) =>
      got.get(q).map(g => (ex intersect g).size.toDouble / ex.size).getOrElse(0.0)
    }
    rs.sum / rs.size
  }

  test("Lloyd rounds never decrease the spherical objective") {
    val corpus = Similarity.loadVectors(spark, sf())
    val c0 = Kmeans.train(corpus, k = 8, iters = 0)
    val c1 = Kmeans.train(corpus, k = 8, iters = 1)
    val c3 = Kmeans.train(corpus, k = 8, iters = 3)
    val (m0, m1, m3) = (Kmeans.cohesionMicro(corpus, c0),
      Kmeans.cohesionMicro(corpus, c1), Kmeans.cohesionMicro(corpus, c3))
    info(s"cohesion micro: seed=$m0 1-iter=$m1 3-iter=$m3")
    // tolerance: cross-partition float summation reorders ulps
    assert(m1 >= m0 - 5L)
    assert(m3 >= m1 - 5L)
  }

  test("trained codebook: IVF recall at least matches the naive seed") {
    val naive = recallVsExact(
      Similarity.topKIvf(spark, sf(), k = 5, numQueries = 10))
    val trained = recallVsExact(
      Kmeans.topKIvfTrained(spark, sf(), k = 5, numQueries = 10))
    info(s"IVF recall@5: naive=$naive trained=$trained")
    assert(trained >= naive - 0.1, s"training degraded recall: $trained < $naive")
    assert(trained >= 0.4)
  }

  test("cell sizes partition the corpus") {
    val sizes = Kmeans.cellSizes(spark, sf()).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = Similarity.loadVectors(spark, sf()).count()
    assert(sizes.values.sum === n)
    assert(sizes.keys.forall(c => c >= 0 && c < 16))
  }
}
