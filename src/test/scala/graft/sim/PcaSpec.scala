package graft.sim

import graft.SparkSpec
import graft.sim.Similarity.Vec

class PcaSpec extends SparkSpec {

  private lazy val corpus = Similarity.loadVectors(spark, sf())
  private lazy val model = Pca.fit(corpus)

  test("basis is orthonormal and eigenvalues are descending, non-negative") {
    val d = model.dim
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(i => model.basis(a)(i) * model.basis(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"basis($a)·basis($b) = $dot")
    }
    model.eigvals.foreach(v => assert(v >= 0.0))
    model.eigvals.sliding(2).foreach {
      case Array(hi, lo) => assert(hi >= lo - 1e-12)
      case _             =>
    }
  }

  test("eigen: basis diagonalizes the covariance (A·b = λ·b)") {
    // reconstruct covariance action from a second fit pass is overkill;
    // instead verify on a small synthetic matrix with known spectrum
    val a = Array(
      Array(4.0, 1.0, 0.0),
      Array(1.0, 3.0, 1.0),
      Array(0.0, 1.0, 2.0))
    val (vals, vecs) = Pca.jacobiEigen(a)
    for (c <- 0 until 3) {
      val v = Array.tabulate(3)(r => vecs(r)(c))
      val av = Array.tabulate(3)(r => (0 until 3).map(k => a(r)(k) * v(k)).sum)
      for (r <- 0 until 3)
        assert(math.abs(av(r) - vals(c) * v(r)) < 1e-10,
          s"eigenpair $c violates A·v = λ·v at row $r")
    }
    // trace preserved
    assert(math.abs(vals.sum - 9.0) < 1e-10)
  }

  test("full-rank projection preserves pairwise Euclidean distances") {
    val orig = corpus.collect().sortBy(_.vec_id).take(40)
    val proj = Pca.project(corpus, model, model.dim).collect()
      .map(v => v.vec_id -> v).toMap
    def d2(x: Array[Double], y: Array[Double]): Double =
      x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum
    for (i <- orig.indices; j <- (i + 1) until orig.length) {
      val before = d2(orig(i).v, orig(j).v)
      val after = d2(proj(orig(i).vec_id).v, proj(orig(j).vec_id).v)
      assert(math.abs(before - after) < 1e-9 * math.max(before, 1.0),
        s"distance not preserved for (${orig(i).vec_id}, ${orig(j).vec_id})")
    }
  }

  test("whitened projection has ~unit variance per kept component") {
    val kdim = 8
    val proj = Pca.project(corpus, model, kdim, whiten = true).collect()
    val n = proj.length.toDouble
    for (c <- 0 until kdim) {
      val xs = proj.map(_.v(c))
      val mu = xs.sum / n
      val varc = xs.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(varc - 1.0) < 1e-6,
        s"whitened component $c variance $varc")
      assert(math.abs(mu) < 1e-9, s"whitened component $c mean $mu")
    }
  }

  test("variance explained is monotone and the energy concentrates up front") {
    val ve = (1 to model.dim).map(model.varianceExplained)
    ve.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-12)
      case _         =>
    }
    assert(math.abs(ve.last - 1.0) < 1e-9)
    // top quarter of components must beat a flat spectrum's share
    assert(ve(model.dim / 4 - 1) > 0.25,
      s"no energy concentration: top-16 share = ${ve(model.dim / 4 - 1)}")
  }

  test("fit is deterministic across repeated runs on the same layout") {
    val again = Pca.fit(corpus)
    assert(again.n === model.n)
    assert(again.mean.toSeq === model.mean.toSeq)
    assert(again.eigvals.toSeq === model.eigvals.toSeq)
    for (c <- 0 until model.dim)
      assert(again.basis(c).toSeq === model.basis(c).toSeq)
  }

  test("hierarchical fold: bit-reproducible at fixed fanIn, agrees with flat") {
    // force the tree path (9 partitions > fanIn 2 → two reduce levels)
    val wide = corpus.repartition(9)
    val a = Pca.fit(wide, fanIn = 2)
    val b = Pca.fit(wide, fanIn = 2)
    assert(a.n === b.n)
    assert(a.mean.toSeq === b.mean.toSeq, "tree fold must be deterministic")
    assert(a.eigvals.toSeq === b.eigvals.toSeq)
    // tree vs flat differ only in float summation grouping — ~1e-12 rel
    val flat = Pca.fit(wide, fanIn = 64)
    a.mean.zip(flat.mean).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)))
    }
    a.eigvals.zip(flat.eigvals).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)))
    }
  }

  test("gate: full-rank PCA L2 top-k equals the raw L2 top-k exactly") {
    val raw = Pca.topKL2(spark, sf(), k = 5, numQueries = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pca = Pca.topKL2Pca(spark, sf(), k = 5, numQueries = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pca === raw)
  }

  test("reduced-dim search beats chance on the gate corpus and reduces dims") {
    // The synthetic embeddings have a near-flat spectrum (top-16
    // variance share ~0.38 vs the flat 0.25), so 16-dim PCA CANNOT
    // preserve neighbors here — measured recall is ~0.12, asserted as
    // a multiple of chance (5/499 ≈ 0.01), not a high bar. The
    // high-recall claim is tested where it's true: the planted
    // low-rank fixture below.
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = sets(Pca.topKL2(spark, sf(), k = 5, numQueries = 10))
    val reduced = sets(Pca.topKL2PcaReduced(spark, sf(), kdim = 16, k = 5, numQueries = 10))
    val hits = exact.keys.toSeq.map(q => (reduced(q) & exact(q)).size).sum
    val recall = hits.toDouble / (exact.size * 5)
    assert(recall >= 0.03, s"reduced-dim recall@5 = $recall (chance ≈ 0.01)")
    val projDim = Pca.project(corpus, model, 16).head().v.length
    assert(projDim === 16)
  }

  test("planted low-rank corpus: 16-dim PCA search recovers exact L2 top-k") {
    import spark.implicits._
    // deterministic rank-8 data + small noise in 64 dims: x = W·z + ε.
    // PCA's job is exactly this — find the 8-dim signal subspace and
    // drop the 56 noise dims — so recall@5 at kdim=16 must be ~1.
    val d = 64; val r = 8; val n = 400
    def rng(seed: Long): () => Double = {
      var s = seed
      () => {
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 11).toDouble / (1L << 53).toDouble - 0.5) * 2.0
      }
    }
    val gw = rng(7)
    val w = Array.fill(r, d)(gw())
    val gz = rng(99)
    val vecs = (0 until n).map { id =>
      val z = Array.fill(r)(gz() * 3.0)
      val x = new Array[Double](d)
      for (c <- 0 until r; i <- 0 until d) x(i) += z(c) * w(c)(i)
      for (i <- 0 until d) x(i) += gz() * 0.01
      Vec(id.toLong, x, math.sqrt(x.map(v => v * v).sum))
    }
    val ds = spark.createDataset(vecs).repartition(4)
    val m = Pca.fit(ds)
    assert(m.varianceExplained(16) > 0.99,
      s"low-rank signal not captured: ${m.varianceExplained(16)}")
    val queries = vecs.take(10).toArray
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = sets(PcaSpecAccess.topKEuclid(ds, queries, 5))
    val proj = Pca.project(ds, m, 16)
    val pq = queries.map(q => Vec(q.vec_id, Pca.projectOne(m, 16, whiten = false, q.v), 0.0))
    val reduced = sets(PcaSpecAccess.topKEuclid(proj, pq, 5))
    val hits = exact.keys.toSeq.map(q => (reduced(q) & exact(q)).size).sum
    val recall = hits.toDouble / (exact.size * 5)
    assert(recall >= 0.95, s"planted low-rank recall@5 = $recall")
  }
}

/** Forwarder for package-private test hooks. */
object PcaSpecAccess {
  def topKEuclid(corpus: org.apache.spark.sql.Dataset[Vec],
      queries: Array[Vec], k: Int): org.apache.spark.sql.DataFrame =
    Pca.topKEuclid(corpus, queries, k)
}
