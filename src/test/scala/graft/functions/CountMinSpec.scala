package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._



class CountMinSpec extends SparkSpec {

  private val cms = udaf(CountMin.sketchAgg)

  test("CMS bounds: true <= est <= true + eps*N for every word") {
    import spark.implicits._
    val words = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(explode(expr(
        "filter(split(lower(text), '[^\\\\p{L}]+'), x -> x != '')")).as("word"))
    val exact = words.groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val epsN = math.ceil(math.E / CountMin.Width * n).toLong
    val est = CountMin.wordEstimates(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (w, e) =>
      assert(e >= exact(w), s"underestimate for $w")
      assert(e <= exact(w) + epsN, s"overestimate beyond eps*N for $w")
    }
  }

  test("CMS merge is order/partition invariant (deterministic sketch)") {
    import spark.implicits._
    val data = (1 to 500).map(i => s"w${i % 37}")
    val a = data.toDS().repartition(1)
      .select(cms(col("value"))).head().getSeq[Long](0).toVector
    val b = data.reverse.toDS().repartition(7)
      .select(cms(col("value"))).head().getSeq[Long](0).toVector
    assert(a === b)
  }

  test("streaming sketch (complete mode) equals the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    // global sketch aggregation: partial (map-side) sketches merge into
    // one constant-size state — the shape that holds at any stream rate
    val q = input.toDS().toDF("word")
      .groupBy().agg(cms(col("word")).as("sketch"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_stream").start()
    try {
      val b1 = Seq("a", "b", "a", "c")
      val b2 = Seq("a", "d", "b")
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val streamed = spark.table("cms_stream")
        .head().getSeq[Long](0).toVector
      val batch = (b1 ++ b2).toDF("word")
        .select(cms(col("word"))).head().getSeq[Long](0).toVector
      assert(streamed === batch)
    } finally q.stop()
  }

  test("point estimate of an absent key is bounded by collisions only") {
    import spark.implicits._
    val sketch = (1 to 100).map(_.toString).toDS()
      .select(cms(col("value")))
      .head().getAs[Seq[Long]](0).toArray
    // absent keys can collide but never exceed eps*N with slack
    assert(CountMin.estimate(sketch, "definitely-absent-key") <= 5L)
  }

  test("estimates EQUAL exact counts on the gate corpora (q_wc_cms oracle)") {
    // CMS errors are one-sided and an estimate is exact unless the
    // word collides in ALL 4 rows (~(31/1024)⁴ ≈ 9e-7 per word on the
    // ~31-word vocabulary) — this equality is what lets q_wc_cms carry
    // the exact word-count SQL oracle. If the vocabulary or sketch
    // sizing ever changes enough to collide, THIS fails before the
    // driver's hash gate does.
    for (d <- Seq("sf0.001", "sf0.01")) {
      val exact = graft.queries.MrQueries.wordCount(spark, sf(d)).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      val est = CountMin.wordEstimates(spark, sf(d)).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(est === exact, s"CMS estimates diverged from exact counts at $d")
    }
  }
}
