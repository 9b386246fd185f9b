package graft.kv

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RouteSpec extends SparkSpec {

  test("k_route: every op lands on the group owning its shard in its epoch") {
    val history = ShardCtrler.historyDf(spark,
      ShardCtrler.history(ShardCtrler.cmdsFromNation(spark, sf())))
    val routed = Kv.routeOps(Kv.opsFromEvents(spark, sf()), history, epochLen = 100L)
    val hist = history.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    val maxNum = hist.keys.map(_._1).max
    routed.collect().foreach { r =>
      val seq = r.getAs[Long]("seq")
      val expectedCfg = math.min(seq / 100L, maxNum.toLong).toInt
      assert(r.getAs[Int]("config_num") === expectedCfg)
      assert(r.getAs[Int]("shard") === r.getAs[String]("key").head.toInt % 10)
      assert(r.getAs[Int]("gid") === hist((expectedCfg, r.getAs[Int]("shard"))))
    }
  }

  test("routeOps is streaming-ready unchanged: stream-static join equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val history = graft.kv.ShardCtrler.historyDf(spark,
      graft.kv.ShardCtrler.history(graft.kv.ShardCtrler.cmdsFromNation(spark, sf())))
    val opsAll = Kv.opsFromEvents(spark, sf()).collect().toSeq.sortBy(_.seq).take(400)
    val expected = Kv.routeOps(opsAll.toDS(), history, epochLen = 100L)
      .collect().map(r => (r.getLong(0), r.getAs[Any](4))).toMap
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KvOp]
    // the SAME operator body over a streaming fact side: the config
    // history stays a static broadcast dimension (stream-static join)
    val q = Kv.routeOps(input.toDS(), history, epochLen = 100L)
      .writeStream.outputMode("append").format("memory")
      .queryName("route_stream").start()
    try {
      val (h1, h2) = opsAll.splitAt(200)
      input.addData(h1); q.processAllAvailable()
      input.addData(h2); q.processAllAvailable()
      val got = spark.table("route_stream").collect()
        .map(r => (r.getLong(0), r.getAs[Any](4))).toMap
      assert(got === expected)
    } finally q.stop()
  }

  test("k_route plan broadcasts the config history (no fact shuffle)") {
    val history = ShardCtrler.historyDf(spark,
      ShardCtrler.history(ShardCtrler.cmdsFromNation(spark, sf())))
    val routed = Kv.routeOps(Kv.opsFromEvents(spark, sf()), history, epochLen = 100L)
    val plan = routed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"config join shuffled the ops:\n$plan")
  }
}
