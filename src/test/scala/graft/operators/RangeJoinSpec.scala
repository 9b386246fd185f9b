package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("binned range join equals the naive inequality join") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)(rnd.nextLong().abs % 10000L).toDF("x")
    // overlapping, uneven intervals, some empty, some spanning many bins
    val ranges = (0 until 40).map { i =>
      val lo = rnd.nextLong().abs % 9000L
      (i.toLong, lo, lo + 1 + rnd.nextLong().abs % 3000L)
    }.toDF("rid", "lo", "hi")
    val naive = pts.join(ranges, col("x") >= col("lo") && col("x") < col("hi"))
      .select("rid", "x").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val binned = RangeJoin.binned(pts, "x", ranges, "lo", "hi", binWidth = 512L)
      .select("rid", "x").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(binned === naive)
    assert(naive.nonEmpty)
  }

  test("binned plan is a hash join on bins, not a nested loop") {
    import spark.implicits._
    val pts = Seq(1L, 2L, 3L).toDF("x")
    val ranges = Seq((1L, 0L, 5L)).toDF("rid", "lo", "hi")
    val plan = RangeJoin.binned(pts, "x", ranges, "lo", "hi", 2L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("points on interval boundaries: half-open [lo, hi)") {
    import spark.implicits._
    val pts = Seq(10L, 19L, 20L).toDF("x")
    val ranges = Seq((0L, 10L, 20L)).toDF("rid", "lo", "hi")
    val got = RangeJoin.binned(pts, "x", ranges, "lo", "hi", 7L)
      .select("x").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(10L, 19L))
  }
}
