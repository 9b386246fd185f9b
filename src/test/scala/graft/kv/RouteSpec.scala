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

  test("k_route plan broadcasts the config history (no fact shuffle)") {
    val history = ShardCtrler.historyDf(spark,
      ShardCtrler.history(ShardCtrler.cmdsFromNation(spark, sf())))
    val routed = Kv.routeOps(Kv.opsFromEvents(spark, sf()), history, epochLen = 100L)
    val plan = routed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"config join shuffled the ops:\n$plan")
  }
}
