package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Measured pruning quality of the layout curves: for uniform 2-D data
  * and random box queries, a min/max stats pruner over
  * Hilbert-clustered files must touch no more files than Z-order
  * (up to range-sampling wobble), and both must beat ingest order by a
  * wide margin; in 3 dims the N-ary Morton interleave must beat
  * single-column range layout, which can only prune one dimension.
  * Counts are compared as AVERAGES over many boxes with slack —
  * repartitionByRange samples bounds with an rddId-derived seed, so
  * exact per-run envelopes wobble. */
class LayoutCurveSpec extends SparkSpec {

  private val nFiles = 32

  test("hilbert unit: curve is a bijective walk of the 2^order x 2^order grid") {
    val order = 4 // 16x16 = 256 cells, exhaustive
    val seen = for { x <- 0 until 16; y <- 0 until 16 }
      yield HilbertCurve.index(x.toLong, y.toLong, order)
    assert(seen.toSet === (0L until 256L).toSet)
    // unit steps: consecutive curve positions are grid neighbors
    val byD = (for { x <- 0 until 16; y <- 0 until 16 }
      yield HilbertCurve.index(x.toLong, y.toLong, order) -> (x, y)).toMap
    for (d <- 0L until 255L) {
      val (x0, y0) = byD(d); val (x1, y1) = byD(d + 1)
      assert(math.abs(x0 - x1) + math.abs(y0 - y1) === 1,
        s"jump at d=$d: ($x0,$y0)->($x1,$y1)")
    }
  }

  test("hilbert expression matches the static function and survives codegen") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("i")
      .select(col("i"), pmod(col("i") * 7919L, lit(1024L)).as("x"),
        pmod(col("i") * 104729L, lit(1024L)).as("y"))
    val got = df.select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), order = 10).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === HilbertCurve.index(r.getLong(0), r.getLong(1), 10))
    }
    graft.core.GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT hilbert_index(CAST(5 AS BIGINT), CAST(9 AS BIGINT))")
      .head().getLong(0)
    assert(viaSql === HilbertCurve.index(5L, 9L, 21))
  }

  test("2-D boxes: hilbert <= z-order (with slack), both beat ingest order") {
    import spark.implicits._
    val n = 40000
    val rnd = new scala.util.Random(7)
    val data = Vector.fill(n)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val dir = Files.createTempDirectory("graft-curves").toString
    Layout.writeKeyClustered(data.repartition(8), rand(42), s"$dir/ingest", nFiles)
    Layout.writeZOrdered(data, "x", "y", s"$dir/z", nFiles)
    Layout.writeKeyClustered(data,
      Layout.hilbertValue(col("x"), col("y"), order = 10), s"$dir/hilbert", nFiles)

    def avgTouched(path: String): Double = {
      val envs = Layout.fileEnvelopes(spark.read.parquet(path), "x", "y")
      assert(envs.length >= nFiles / 2, s"$path produced too few files")
      val qrnd = new scala.util.Random(13)
      val boxes = Vector.fill(40) {
        val (x0, y0) = (qrnd.nextInt(1024 - 128).toLong, qrnd.nextInt(1024 - 128).toLong)
        (x0, x0 + 96L, y0, y0 + 96L)
      }
      boxes.map { case (a, b, c, d) =>
        Layout.filesTouched(envs, a, b, c, d).toDouble
      }.sum / boxes.size
    }

    val ing = avgTouched(s"$dir/ingest")
    val z = avgTouched(s"$dir/z")
    val h = avgTouched(s"$dir/hilbert")
    info(f"avg files touched (of ~$nFiles): ingest=$ing%.1f z=$z%.1f hilbert=$h%.1f")
    assert(ing > nFiles * 0.9, "ingest-order files should span ~everything")
    assert(z < ing / 3, "z-order failed to prune vs ingest order")
    assert(h < ing / 3, "hilbert failed to prune vs ingest order")
    assert(h <= z * 1.25, f"hilbert ($h%.1f) should not lose to z-order ($z%.1f) by >25%%")
  }

  test("hilbertN unit: bijective with unit steps in 2-D and 3-D") {
    // n=2, 16x16 exhaustive
    val seen2 = for { x <- 0 until 16; y <- 0 until 16 }
      yield HilbertN.index(Array(x.toLong, y.toLong), 4)
    assert(seen2.toSet === (0L until 256L).toSet)
    val byD2 = (for { x <- 0 until 16; y <- 0 until 16 }
      yield HilbertN.index(Array(x.toLong, y.toLong), 4) -> (x, y)).toMap
    for (d <- 0L until 255L) {
      val (x0, y0) = byD2(d); val (x1, y1) = byD2(d + 1)
      assert(math.abs(x0 - x1) + math.abs(y0 - y1) === 1, s"2-D jump at d=$d")
    }
    // n=3, 8x8x8 exhaustive
    val all3 = for { x <- 0 until 8; y <- 0 until 8; z <- 0 until 8 }
      yield HilbertN.index(Array(x.toLong, y.toLong, z.toLong), 3) -> (x, y, z)
    assert(all3.map(_._1).toSet === (0L until 512L).toSet)
    val byD3 = all3.toMap
    for (d <- 0L until 511L) {
      val (a, b) = (byD3(d), byD3(d + 1))
      val manhattan = math.abs(a._1 - b._1) + math.abs(a._2 - b._2) + math.abs(a._3 - b._3)
      assert(manhattan === 1, s"3-D jump at d=$d: $a -> $b")
    }
  }

  test("hilbertN expression matches the static function through codegen") {
    import spark.implicits._
    val df = (0L until 500L).toDF("i")
      .select(pmod(col("i") * 7919L, lit(512L)).as("x"),
        pmod(col("i") * 104729L, lit(512L)).as("y"),
        pmod(col("i") * 15485863L, lit(512L)).as("z"))
    df.select(col("x"), col("y"), col("z"),
        Layout.hilbertValueN(Seq(col("x"), col("y"), col("z")), bits = 9).as("h"))
      .collect().foreach { r =>
        assert(r.getLong(3) === HilbertN.index(
          Array(r.getLong(0), r.getLong(1), r.getLong(2)), 9))
      }
    graft.core.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT hilbert_index_n(CAST(5 AS BIGINT), CAST(9 AS BIGINT), CAST(2 AS BIGINT))")
      .head().getLong(0)
    assert(viaSql === HilbertN.index(Array(5L, 9L, 2L), 21))
  }

  test("3-D boxes: zValueN prunes all dimensions; 1-column range layout cannot") {
    import spark.implicits._
    val n = 40000
    val rnd = new scala.util.Random(21)
    val data = Vector.fill(n)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong,
      rnd.nextInt(1024).toLong)).toDF("x", "y", "z")
    val dir = Files.createTempDirectory("graft-curves3").toString
    Layout.writeKeyClustered(data, col("x"), s"$dir/xrange", nFiles)
    Layout.writeKeyClustered(data,
      Layout.zValueN(Seq(col("x"), col("y"), col("z")), bits = 10), s"$dir/z3", nFiles)
    Layout.writeKeyClustered(data,
      Layout.hilbertValueN(Seq(col("x"), col("y"), col("z")), bits = 10),
      s"$dir/h3", nFiles)

    def avgTouched(path: String): Double = {
      val envs = Layout.fileEnvelopesN(spark.read.parquet(path), Seq("x", "y", "z"))
      val qrnd = new scala.util.Random(17)
      val boxes = Vector.fill(40)(Seq.fill(3) {
        val lo = qrnd.nextInt(1024 - 256).toLong
        (lo, lo + 192L)
      })
      boxes.map(b => Layout.filesTouchedN(envs, b).toDouble).sum / boxes.size
    }

    val xr = avgTouched(s"$dir/xrange")
    val z3 = avgTouched(s"$dir/z3")
    val h3 = avgTouched(s"$dir/h3")
    info(f"avg files touched (of ~$nFiles): x-range=$xr%.1f z3=$z3%.1f hilbert3=$h3%.1f")
    // x-range prunes only x: a 192/1024 slice of files, ~6 of 32, but
    // EVERY one of those spans all of y and z; the 3-D interleave
    // must beat it because it prunes the other two dimensions too
    assert(z3 < xr, f"3-D morton ($z3%.1f) should beat 1-col range ($xr%.1f)")
    assert(h3 < xr, f"3-D hilbert ($h3%.1f) should beat 1-col range ($xr%.1f)")
    assert(h3 <= z3 * 1.25, f"3-D hilbert ($h3%.1f) should not lose to morton ($z3%.1f) by >25%%")
  }
}
