package graft.streaming

import graft.SparkSpec
import graft.kv.Kv
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import ShardMigration.ShardOp
import ShardServe.Applied

class ShardServeSpec extends SparkSpec {

  private def routed() = {
    val history = graft.kv.ShardCtrler.historyDf(spark,
      graft.kv.ShardCtrler.history(graft.kv.ShardCtrler.cmdsFromNation(spark, sf())))
    Kv.routeOps(Kv.opsFromEvents(spark, sf()), history, epochLen = 100L)
  }

  test("unit: only the transferring shard defers; applied at catch-up or hold end") {
    import spark.implicits._
    val ops = Seq(
      ShardOp(1, 1L, "a", 10L), ShardOp(1, 2L, "b", 10L),
      ShardOp(1, 3L, "a", 20L),  // handoff at 3: hold [3, 53)
      ShardOp(1, 10L, "c", 20L), // inside the window
      ShardOp(1, 60L, "d", 20L), // catch-up: flushes 3 and 10
      ShardOp(2, 5L, "z", 10L), ShardOp(2, 20L, "z", 10L), // unaffected
      ShardOp(3, 1L, "x", 10L),
      ShardOp(3, 2L, "x", 20L)   // handoff at 2, log ends inside window
    ).toDS()
    val got = ShardServe.serveBatch(ops).collect().toSet
    assert(got === Set(
      Applied(1, 1L, 0, 1L), Applied(1, 2L, 0, 2L),
      Applied(1, 3L, 1, 60L), Applied(1, 10L, 1, 60L), Applied(1, 60L, 0, 60L),
      Applied(2, 5L, 0, 5L), Applied(2, 20L, 0, 20L),
      Applied(3, 1L, 0, 1L), Applied(3, 2L, 1, 52L)))
  }

  test("availability: unaffected shards are served WHILE a handoff is in flight") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ShardOp]
    val q = ShardServe.serve(input.toDS()).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("serve").start()
    try {
      // round 1: shard 1 enters a handoff; shard 2 sees normal traffic
      input.addData(Seq(
        ShardOp(1, 1L, "a", 10L), ShardOp(1, 3L, "a", 20L),
        ShardOp(1, 10L, "c", 20L), ShardOp(2, 5L, "z", 10L)))
      q.processAllAvailable()
      val r1 = spark.table("serve").as[Applied].collect().toSet
      // the Challenge2 property: shard 2's op emitted THIS round, while
      // shard 1's in-transfer ops are not yet applied
      assert(r1.contains(Applied(2, 5L, 0, 5L)),
        "op on the unaffected shard stalled behind the handoff")
      assert(r1.contains(Applied(1, 1L, 0, 1L)))
      assert(!r1.exists(a => a.shard == 1 && a.seq >= 3L),
        s"in-transfer ops applied too early: $r1")
      // round 2: the shard catches up — buffered ops apply now
      input.addData(Seq(ShardOp(1, 60L, "d", 20L)))
      q.processAllAvailable()
      val r2 = spark.table("serve").as[Applied].collect().toSet
      assert(r2.contains(Applied(1, 3L, 1, 60L)))
      assert(r2.contains(Applied(1, 10L, 1, 60L)))
      assert(r2.contains(Applied(1, 60L, 0, 60L)))
    } finally q.stop()
  }

  test("segmented serve equals the sorted-group walker (corpus + edge fixture)") {
    import spark.implicits._
    // corpus differential — both batch shapes flush at end-of-log
    val corpus = ShardMigration.shardOps(routed())
    val expected = ShardServe.serveBatch(corpus).collect().toSet
    assert(ShardServe.serveBatchSegmented(corpus).collect().toSet === expected)
    assert(expected.exists(_.deferred == 1), "corpus produced no deferrals")
    // edge fixture: (a) handoff exactly AT a window's catch-up op — the
    // flush and a fresh window open on the same op; (b) a second gid
    // change INSIDE an open window is absorbed, not a new window;
    // (c) log ends inside a window — deferred ops apply at the hold
    // boundary, not an op seq
    val edges = Seq(
      ShardOp(1, 1L, "a", 10L),
      ShardOp(1, 3L, "a", 20L),  // handoff: hold [3, 53)
      ShardOp(1, 20L, "b", 30L), // change inside the window: absorbed
      ShardOp(1, 53L, "c", 40L), // catch-up op IS a handoff: new hold [53, 103)
      ShardOp(1, 60L, "d", 40L), // inside second window; log ends here
      ShardOp(2, 7L, "z", 10L)
    ).toDS()
    val walker = ShardServe.serveBatch(edges).collect().toSet
    assert(ShardServe.serveBatchSegmented(edges, ranges = 4).collect().toSet
      === walker)
    assert(walker === Set(
      Applied(1, 1L, 0, 1L),
      Applied(1, 3L, 1, 53L), Applied(1, 20L, 1, 53L),
      Applied(1, 53L, 1, 103L), Applied(1, 60L, 1, 103L),
      Applied(2, 7L, 0, 7L)))
    // literal gid -1 in the input ("unassigned"): the walker opens no
    // window when LEAVING it — the segmented raw-change scan must
    // suppress the same transitions (incl. mid-log, across a range
    // boundary) or the twins diverge
    val unassigned = Seq(
      ShardOp(5, 1L, "a", -1L), ShardOp(5, 2L, "a", 7L), // -1 -> 7: no window
      ShardOp(5, 30L, "b", -1L),                         // 7 -> -1: window opens
      ShardOp(5, 40L, "c", -1L), ShardOp(5, 95L, "d", 9L)
    ).toDS()
    val w2 = ShardServe.serveBatch(unassigned).collect().toSet
    assert(ShardServe.serveBatchSegmented(unassigned, ranges = 4).collect().toSet
      === w2, "gid -1 handling must match the walker")
    assert(w2.contains(Applied(5, 2L, 0, 2L)), "leaving -1 opens no window")
    assert(w2.contains(Applied(5, 30L, 1, 95L)), "entering -1 defers")
  }

  test("streaming equals batch on corpus ops (sentinels force final flush)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = ShardMigration.shardOps(routed()).collect().toSeq.sortBy(_.seq)
    // one sentinel per shard, far past any hold window, same final gid:
    // both modes then flush everything and must agree exactly
    val sentinels = base.groupBy(_.shard).map { case (shard, ops) =>
      val last = ops.maxBy(_.seq)
      ShardOp(shard, 10000000L + shard, "sentinel", last.gid)
    }.toSeq
    val all = base ++ sentinels
    val expected = ShardServe.serveBatch(all.toDS()).collect().toSet
    val input = MemoryStream[ShardOp]
    val q = ShardServe.serve(input.toDS()).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("serve_diff").start()
    try {
      all.sortBy(_.seq).grouped(math.max(1, all.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val got = spark.table("serve_diff").as[Applied].collect().toSet
      assert(got === expected)
      assert(expected.exists(_.deferred == 1), "fixture produced no deferrals")
    } finally q.stop()
  }
}
