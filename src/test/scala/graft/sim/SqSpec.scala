package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** SQ8 scalar quantization: near-exact recall (the distortion is one
  * byte per dimension, far gentler than PQ's 8-bytes-per-vector), and
  * the quantizer round-trips within its step size. */
class SqSpec extends SparkSpec {

  test("encode/dequant round-trip error is within one step per dimension") {
    import spark.implicits._
    val corpus = Similarity.loadVectors(spark, sf())
      .map(v => Similarity.Vec(v.vec_id, Pq.l2normalize(v.v), 1.0))
    val sc = Sq.fitScale(corpus)
    val sample = corpus.filter(col("vec_id") < 50).collect()
    sample.foreach { v =>
      val code = Sq.encode(sc, v.v)
      v.v.indices.foreach { j =>
        val deq = sc.mins(j) + (code(j) & 0xff) * sc.steps(j)
        assert(math.abs(deq - v.v(j)) <= sc.steps(j) + 1e-12,
          s"dim $j off by more than a step")
      }
    }
  }

  test("SQ8 top-k recall vs exact is near-perfect") {
    def topSets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = topSets(Similarity.topKExact(spark, sf(), k = 5, numQueries = 10))
    val sq = topSets(Sq.topKSq(spark, sf(), k = 5, numQueries = 10))
    val recalls = exact.map { case (q, ex) =>
      sq.get(q).map(g => (ex intersect g).size.toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(s"SQ8 mean recall@5 = $mean")
    assert(mean >= 0.95, s"SQ8 should be near-exact, got $mean")
    sq.values.foreach(s => assert(s.size === 5))
  }

  test("SQ8 output is EXACTLY the exact top-k on the gate corpora") {
    // This equality is what lets ann_sq8 share ann_topk's SQL oracle:
    // the candidate budget (rerank = 50 ≫ k = 5) plus ≤1-step/dim
    // distortion keeps every true top-5 neighbor in the candidate set,
    // and the exact-cosine re-rank then reproduces ranks verbatim. If
    // this ever breaks (data change, budget cut), THIS test fails
    // before the driver's hash gate does.
    for (d <- Seq("sf0.001", "sf0.01")) {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val exact = rows(Similarity.topKExact(spark, sf(d), k = 5, numQueries = 10))
      val sq = rows(Sq.topKSq(spark, sf(d), k = 5, numQueries = 10))
      assert(sq === exact, s"SQ8 diverged from exact top-k at $d")
    }
  }
}
