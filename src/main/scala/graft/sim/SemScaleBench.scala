package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.Similarity.Vec

/** PAPER-SCALE SemDeDup rehearsal — the end-to-end measurement behind
  * the "k ∝ N keeps cells (and so per-task pairwise work) constant"
  * 100 TB claim: run the FULL semantic-dedup pipeline
  * ([[Kmeans.trainParallel]] k-means‖ seeding + blocked Lloyd, then
  * [[graft.dedup.SemDedup.semanticOf]]'s assign + within-cell pairwise)
  * at the SemDeDup paper's operating point shape — k in the tens of
  * thousands over ≥10⁶ vectors (Abbas et al. 2023 run k = 50 000 on
  * LAION; the gates run k ≤ 256, TrainBench stops at the trainer
  * alone) — and record stage walls, the per-cell size distribution,
  * and the capped variant's cap-hit rate. Asserts in-run that BOTH
  * trainer scale paths actually engaged (blocked corpus assignment and
  * the distributed k-means‖ seed reduction) and that every duplicate
  * clique kept ≥ 1 representative is implied by kept > 0 per cell.
  *
  * Also folds in the CONNECTED-COMPONENTS distributed-regime rehearsal
  * (round-9 carry-forward): a 4.8M-undirected-edge graph of known
  * 8-node ring components pushes [[graft.dedup.Dedup
  * .connectedComponents]] past its driver-union-find threshold onto
  * hash-min label propagation; the run records iterations-to-fixpoint
  * and wall and verifies every label exactly.
  *
  * Corpus: deterministic clustered unit vectors (the TrainBench
  * recipe: anchor + 0.25·jitter, [[graft.core.Mix]] coins) with ~9%
  * planted near-duplicates (vec_id ≡ 10 mod 11 re-derives its
  * predecessor's vector plus 0.02 jitter), so the pairwise stage has
  * genuine τ-hits whose count the run reports.
  *
  * args: [n] [d] [k] [iters] [tau] (defaults 1000000, 64, 16384, 3,
  * 0.95). Prints one [sem-scale] line per stage for BENCH_NOTES.
  */
object SemScaleBench {

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(1000000)
    val d = args.lift(1).map(_.toInt).getOrElse(64)
    val k = args.lift(2).map(_.toInt).getOrElse(16384)
    val iters = args.lift(3).map(_.toInt).getOrElse(3)
    val tau = args.lift(4).map(_.toDouble).getOrElse(0.95)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sem-scale] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // ── deterministic clustered corpus with planted near-dups ───────
    val groups = math.max(8, k / 8) // anchors ≪ k so cells subdivide
    val corpus = timed(s"gen n=$n d=$d") {
      val c = spark.range(n).as[Long].map { id =>
        def unit(seed: Long): Array[Double] = {
          val v = Array.tabulate(d)(j =>
            graft.core.Mix.unitDouble(seed * 1000003L + j) - 0.5)
          val nn = math.sqrt(v.map(x => x * x).sum)
          v.map(_ / nn)
        }
        val base = if (id % 11 == 10) id - 1 else id // planted near-dup
        val anchor = unit(1000 + base % groups)
        val jit = unit(50000 + base)
        var v = anchor.zip(jit).map { case (a, b) => a + 0.25 * b }
        if (id % 11 == 10) {
          val wob = unit(90000 + id)
          v = v.zip(wob).map { case (a, b) => a + 0.02 * b }
        }
        val nn = math.sqrt(v.map(x => x * x).sum)
        Vec(id, v.map(_ / nn), 1.0)
      }.localCheckpoint()
      c.count()
      c
    }

    // ── train: k-means‖ seeding + blocked Lloyd at paper-scale k ────
    val cents = timed(s"train k=$k iters=$iters (k-means||)") {
      Kmeans.trainParallel(corpus, k, iters)
    }
    println(s"[sem-scale] trainer flags: blockedAssignment=${Kmeans.lastTrainBlocked} " +
      s"distributedSeedReduction=${Kmeans.lastReductionDistributed}")
    Kmeans.lastTrainStages.foreach { case (l, s) =>
      println(f"[sem-scale]   train stage: $l: $s%.1f s")
    }
    require(Kmeans.lastTrainBlocked, "blocked assignment path must engage at this k")
    require(Kmeans.lastReductionDistributed,
      "distributed seed reduction must engage at this k")

    // ── assign + within-cell pairwise (the semantic core) ───────────
    val out = timed(s"semantic core (assign + pairwise, tau=$tau)") {
      val o = graft.dedup.SemDedup.semanticOf(corpus, cents, tau).localCheckpoint()
      o.count()
      o
    }
    val kept = out.filter(col("kept")).count()
    println(s"[sem-scale] verdicts: n=$n kept=$kept dropped=${n - kept} " +
      f"(${(n - kept) * 100.0 / n}%.1f%% dropped)")
    val sizes = out.groupBy("cell").count().select(col("count"))
      .as[Long].collect().sorted
    def pct(p: Double): Long = sizes((sizes.length * p).toInt.min(sizes.length - 1))
    println(s"[sem-scale] cells: nonempty=${sizes.length} of $k, " +
      s"avg=${n / sizes.length} p50=${pct(0.5)} p99=${pct(0.99)} max=${sizes.last}")

    // ── capped variant: degenerate-cell bound + cap-hit rate ────────
    val cap = 64
    timed(s"semantic core capped (cap=$cap)") {
      graft.dedup.SemDedup.semanticOf(corpus, cents, tau, cap)
        .write.mode("overwrite").format("noop").save()
    }
    val capHit = sizes.count(_ > cap)
    println(f"[sem-scale] cap-hit rate: $capHit of ${sizes.length} cells " +
      f"(${capHit * 100.0 / sizes.length}%.2f%%) exceed cap=$cap")

    // ── connected components: distributed hash-min regime ───────────
    val blocks = 600000 // 8 nodes/ring → 4.8M undirected edges > driver cutoff
    val pairs = spark.range(blocks * 8L).toDF("e")
      .selectExpr("(e DIV 8) * 8 + (e % 8) AS a",
        "(e DIV 8) * 8 + ((e % 8) + 1) % 8 AS b")
      .selectExpr("least(a, b) AS i", "greatest(a, b) AS j")
    val nodes = spark.range(blocks * 8L).toDF("doc_id")
    val cc = timed(s"connected components (${blocks * 8L} edges, ring-8 blocks)") {
      val c = graft.dedup.Dedup.connectedComponents(nodes, "doc_id", pairs)
        .localCheckpoint()
      c.count()
      c
    }
    println(s"[sem-scale] hash-min iterations to fixpoint: " +
      s"${graft.dedup.Dedup.lastHashMinIters}")
    require(graft.dedup.Dedup.lastHashMinIters > 0,
      "the distributed regime must have engaged")
    val wrong = cc.filter(col("cluster_id") =!= (col("doc_id") / 8).cast("long") * 8)
      .count()
    println(s"[sem-scale] component labels wrong: $wrong (must be 0)")
    require(wrong == 0, "hash-min labels must match the known components")

    spark.stop()
  }
}
