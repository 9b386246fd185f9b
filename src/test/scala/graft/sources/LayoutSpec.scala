package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("zValue interleaves bits (known vectors) and stays codegen'd") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y")))
    val rows = df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows((0L, 0L)) === 0L)
    assert(rows((1L, 0L)) === 1L)   // x occupies even bit positions
    assert(rows((0L, 1L)) === 2L)   // y occupies odd bit positions
    // 3=0b11, 5=0b101 -> interleave: y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 0b100111
    assert(rows((3L, 5L)) === 39L)
    assert(rows((255L, 255L)) === 65535L)
    // the interleave must not fall out of whole-stage codegen (checked
    // on a non-literal source; the literal frame above constant-folds
    // into a LocalTableScan, which proves the expression folds too)
    val plan = spark.range(256)
      .select(Layout.zValue(col("id"), col("id")).as("z"))
      .queryExecution.executedPlan.toString
    assert(plan.trim.startsWith("*("), plan) // '*' = whole-stage-codegen stage marker
  }

  test("compaction folds micro-batch file sprawl into size-targeted files") {
    import spark.implicits._
    // simulate 12 micro-batches of 4-partition writes: 48 tiny files
    val src = "/tmp/graft_compact_src"
    val dst = "/tmp/graft_compact_dst"
    scala.reflect.io.Directory(new java.io.File(src)).deleteRecursively()
    for (b <- 0 until 12) {
      (b * 100 until (b + 1) * 100).map(i => (i.toLong, s"row$i"))
        .toDF("id", "payload").repartition(4)
        .write.mode("append").parquet(src)
    }
    val before = spark.read.parquet(src)
    val nSmall = before.inputFiles.length
    assert(nSmall >= 40, s"fixture produced only $nSmall files")
    val (nBefore, nAfter) =
      Layout.compact(before, dst, targetFileBytes = 64 * 1024, sortCols = Seq("id"))
    info(s"compacted $nBefore files -> $nAfter")
    assert(nBefore === nSmall)
    assert(nAfter < nSmall / 4)
    // content is preserved exactly
    val a = spark.read.parquet(src).collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val b = spark.read.parquet(dst).collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(a.toSeq === b.toSeq)
    // sorted compaction keeps disjoint id envelopes (pruning survives)
    val envs = spark.read.parquet(dst).groupBy(input_file_name())
      .agg(min(col("id")), max(col("id"))).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    envs.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, s"overlapping envelopes: ${envs.toSeq}")
      case _ =>
    }
  }

  test("z-order layout prunes box queries that linear order cannot") {
    import spark.implicits._
    // two independent uniform dimensions, 16k rows
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(16384)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val df = rows.toDF("u", "d")
    val nFiles = 16
    Layout.writeZOrdered(df, "u", "d", "/tmp/graft_layout_z", nFiles)
    // contrast: range-layout on u only (the single-column best case)
    df.repartitionByRange(nFiles, col("u")).sortWithinPartitions(col("u"))
      .write.mode("overwrite").parquet("/tmp/graft_layout_u")
    val zEnv = Layout.fileEnvelopes(spark.read.parquet("/tmp/graft_layout_z"), "u", "d")
    val uEnv = Layout.fileEnvelopes(spark.read.parquet("/tmp/graft_layout_u"), "u", "d")
    assert(zEnv.length === nFiles && uEnv.length === nFiles)
    // a box selective in BOTH dims: u in [0,255], d in [0,255] (~1/16 of space)
    val zTouch = Layout.filesTouched(zEnv, 0, 255, 0, 255)
    val uTouch = Layout.filesTouched(uEnv, 0, 255, 0, 255)
    info(s"files touched: z-order=$zTouch/$nFiles, u-range=$uTouch/$nFiles")
    // u-range layout prunes u (reads ~1/4 of files) but every kept file
    // spans all of d; z-order prunes both dims. Bounds are generous:
    // repartitionByRange samples its bounds with an rddId-derived seed,
    // so envelopes wobble by a file or two across suite orderings.
    // on a u-selective box the u-range layout is already optimal (the
    // box can align exactly with file boundaries), so z-order only has
    // to match it; its strict win is the d-only box below
    assert(zTouch <= uTouch)
    assert(zTouch <= 6, s"z-order touched $zTouch of $nFiles files")
    // a d-only box: u-range layout reads EVERYTHING, z-order does not
    val zTouchD = Layout.filesTouched(zEnv, 0, 1023, 0, 127)
    val uTouchD = Layout.filesTouched(uEnv, 0, 1023, 0, 127)
    info(s"d-only box: z-order=$zTouchD/$nFiles, u-range=$uTouchD/$nFiles")
    assert(uTouchD === nFiles)
    assert(zTouchD < nFiles)
    // correctness: both layouts hold exactly the source rows
    assert(spark.read.parquet("/tmp/graft_layout_z").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq === rows.sorted)
  }
}
