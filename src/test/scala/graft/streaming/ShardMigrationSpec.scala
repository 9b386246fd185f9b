package graft.streaming

import graft.SparkSpec
import graft.kv.Kv
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import ShardMigration._

class ShardMigrationSpec extends SparkSpec {

  private def routed() = {
    val history = graft.kv.ShardCtrler.historyDf(spark,
      graft.kv.ShardCtrler.history(graft.kv.ShardCtrler.cmdsFromNation(spark, sf())))
    Kv.routeOps(Kv.opsFromEvents(spark, sf()), history, epochLen = 100L)
  }

  test("unit: handoffs emit with carried key counts; stable ownership is silent") {
    import spark.implicits._
    val ops = Seq(
      ShardOp(1, 1L, "a", 10L), ShardOp(1, 2L, "b", 10L), // group 10 owns
      ShardOp(1, 3L, "a", 20L),                           // -> 20: carries {a,b}
      ShardOp(1, 4L, "c", 20L),
      ShardOp(1, 5L, "c", 10L),                           // back to 10: carries {a,b,c}
      ShardOp(2, 1L, "z", 10L)                            // other shard, no change
    ).toDS()
    val got = migrations(ops).collect().toSet
    assert(got === Set(
      Migration(1, 3L, 10L, 20L, 2L),
      Migration(1, 5L, 20L, 10L, 3L)))
  }

  test("batch sorted-group scan equals the window oracle and the unit fixture") {
    import spark.implicits._
    // corpus: same handoffs as the lag-window oracle
    val expected = migrationsBatchOracle(routed()).collect()
      .map(r => Migration(r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val got = migrationsBatch(shardOps(routed())).collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // unit fixture: same records as the streaming machine's unit test
    val ops = Seq(
      ShardOp(1, 1L, "a", 10L), ShardOp(1, 2L, "b", 10L),
      ShardOp(1, 3L, "a", 20L), ShardOp(1, 4L, "c", 20L),
      ShardOp(1, 5L, "c", 10L), ShardOp(2, 1L, "z", 10L)).toDS()
    assert(migrationsBatch(ops).collect().toSet === Set(
      Migration(1, 3L, 10L, 20L, 2L),
      Migration(1, 5L, 20L, 10L, 3L)))
    // and the plan really is the sorted-group shape: MapGroups with a
    // per-group [seq ASC] order fed by SortExec, not a user-side buffer
    val plan = migrationsBatch(ops).queryExecution.executedPlan.toString
    assert(plan.contains("MapGroups"), plan.take(400))
    assert(plan.contains("Sort ["), plan.take(400))
  }

  test("streaming migrations equal the batch window oracle on routed corpus ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ops = shardOps(routed()).collect().toSeq.sortBy(_.seq)
    val expected = migrationsBatchOracle(routed()).collect()
      .map(r => Migration(r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val input = MemoryStream[ShardOp]
    val q = migrations(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("migrations").start()
    try {
      // per-shard in-order delivery: feed in global seq order, 3 batches
      ops.grouped(math.max(1, ops.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val got = spark.table("migrations").as[Migration].collect().toSet
      assert(got === expected)
      assert(got.nonEmpty, "fixture produced no reconfigurations — epochLen too large")
    } finally q.stop()
  }
}
