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

  test("unit: evicting machine counts the outgoing owner's era only") {
    import spark.implicits._
    val ops = Seq(
      ShardOp(1, 1L, "a", 10L), ShardOp(1, 2L, "b", 10L), // era of 10: {a,b}
      ShardOp(1, 3L, "a", 20L),                           // handoff: carries 2
      ShardOp(1, 4L, "c", 20L),                           // era of 20: {a,c}
      ShardOp(1, 5L, "c", 10L)                            // handoff: carries 2 (not 3)
    ).toDS()
    assert(migrationsEvictingBatch(ops).collect().toSet === Set(
      Migration(1, 3L, 10L, 20L, 2L),
      Migration(1, 5L, 20L, 10L, 2L)))
    // non-evicting machine still carries the cumulative population
    assert(migrationsBatch(ops).collect().toSet === Set(
      Migration(1, 3L, 10L, 20L, 2L),
      Migration(1, 5L, 20L, 10L, 3L)))
  }

  test("state stays bounded past the exact-set crossover; estimate holds") {
    // walker-level: the state-store row is exactly the walker snapshot
    val w = new Walker(evict = false)
    w.load(ShardState(-1L, Seq.empty, null))
    val n = MaxExactKeys * 20
    (0 until n).foreach(i => w.onOp(1, ShardOp(1, i.toLong, s"key-$i", 10L)))
    val st = w.snapshot
    assert(st.exact.isEmpty, "exact set must be dropped after conversion")
    assert(st.regs != null && st.regs.length === 4096,
      "sketch must be the fixed 4 KiB HLL")
    // the handoff then reports the sketch estimate, within HLL error
    val mig = w.onOp(1, ShardOp(1, n.toLong, "z", 99L)).get
    assert(math.abs(mig.n_keys - n).toDouble / n <= 0.05,
      s"estimate ${mig.n_keys} vs true $n")
    // below the crossover the tally is exact — the hash gates rely on it
    val w2 = new Walker(evict = false)
    w2.load(ShardState(-1L, Seq.empty, null))
    (0 until 100).foreach(i => w2.onOp(1, ShardOp(1, i.toLong, s"k${i % 37}", 10L)))
    assert(w2.onOp(1, ShardOp(1, 100L, "z", 99L)).get.n_keys === 37L)
  }

  test("eviction shrinks state at handoff (Challenge1Delete analogue)") {
    val w = new Walker(evict = true)
    w.load(ShardState(-1L, Seq.empty, null))
    val n = MaxExactKeys * 4
    (0 until n).foreach(i => w.onOp(1, ShardOp(1, i.toLong, s"key-$i", 10L)))
    assert(w.snapshot.regs != null, "pre-handoff state is sketch-sized")
    w.onOp(1, ShardOp(1, n.toLong, "fresh", 20L)) // handoff to gid 20
    val st = w.snapshot
    assert(st.regs == null && st.exact === Seq("fresh"),
      s"state must shrink to the new era: $st")
    // non-evicting keeps the sketch (cumulative semantics)
    val k = new Walker(evict = false)
    k.load(ShardState(-1L, Seq.empty, null))
    (0 until n).foreach(i => k.onOp(1, ShardOp(1, i.toLong, s"key-$i", 10L)))
    k.onOp(1, ShardOp(1, n.toLong, "fresh", 20L))
    assert(k.snapshot.regs != null)
  }

  test("streaming evicting machine equals the batch evicting fold on corpus ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ops = shardOps(routed()).collect().toSeq.sortBy(_.seq)
    val expected = migrationsEvictingBatch(shardOps(routed())).collect().toSet
    val input = MemoryStream[ShardOp]
    val q = migrationsEvicting(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("migrations_evict").start()
    try {
      ops.grouped(math.max(1, ops.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val got = spark.table("migrations_evict").as[Migration].collect().toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
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
