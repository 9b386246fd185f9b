package graft.sim

import org.apache.spark.sql.SparkSession
import graft.sim.Similarity.Vec

/** End-to-end trainer benchmark: full Lloyd rounds through Spark on a
  * deterministic clustered corpus, blocked ([[PointBlocks]]) vs
  * narrow ([[CentroidIndex]] per point) assignment paths — the
  * distributed wall-clock complement to [[AssignBench]]'s
  * single-thread kernels (shuffle, broadcast, and the one-off
  * prepare cost included).
  *
  * args: [k] [d] [nPoints] [iters] (defaults 2048, 64, 100000, 3).
  * Prints one line per path: prepare s (blocked only), per-round s,
  * total s, and the per-cell-count agreement between the two paths
  * (both exact ⇒ counts must match).
  */
object TrainBench {

  def main(args: Array[String]): Unit = {
    val k = args.lift(0).map(_.toInt).getOrElse(2048)
    val d = args.lift(1).map(_.toInt).getOrElse(64)
    val n = args.lift(2).map(_.toInt).getOrElse(100000)
    val iters = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val groups = math.max(8, k / 64)
    val corpus = spark.range(n).as[Long].map { i =>
      // same clustered-unit-vector recipe as AssignBench
      def mix(seed: Long, j: Int): Double =
        graft.core.Mix.unitDouble(seed * 1000003L + j) - 0.5
      def unit(seed: Long): Array[Double] = {
        val v = Array.tabulate(d)(mix(seed, _))
        val nn = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / nn)
      }
      val anchor = unit(1000 + i % groups)
      val jit = unit(50000 + i)
      val v = anchor.zip(jit).map { case (a, b) => a + 0.25 * b }
      val nn = math.sqrt(v.map(x => x * x).sum)
      Vec(i, v.map(_ / nn), 1.0)
    }.cache()
    corpus.count()

    val seeds = corpus.filter(_.vec_id < k).collect().sortBy(_.vec_id)
      .zipWithIndex.map { case (v, i) => Kmeans.Centroid(i, v.v) }

    def cellCounts(cents: Array[Kmeans.Centroid]): Map[Int, Long] = {
      val bc = spark.sparkContext.broadcast(CentroidIndex.build(cents))
      val m = corpus.map(r => bc.value.nearest(r))
        .groupByKey(identity).count().collect().toMap
      bc.destroy()
      m
    }

    // warmup JIT on a small run
    Kmeans.trainFrom(corpus, seeds.take(64), 1, blockedAbove = Int.MaxValue)

    val t0 = System.nanoTime()
    val narrow = Kmeans.trainFrom(corpus, seeds, iters, blockedAbove = Int.MaxValue)
    val narrowS = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val blocked = Kmeans.trainFrom(corpus, seeds, iters)
    val blockedS = (System.nanoTime() - t1) / 1e9
    val tookBlocked = Kmeans.lastTrainBlocked

    val agree = cellCounts(narrow) == cellCounts(blocked)
    println(f"[train-bench] k=$k d=$d n=$n iters=$iters cpus=$cpus " +
      f"narrow=${narrowS}%.2fs blocked=${blockedS}%.2fs " +
      f"speedup=${narrowS / blockedS}%.2fx blockedPath=$tookBlocked cellCountsAgree=$agree")
    spark.stop()
  }
}
