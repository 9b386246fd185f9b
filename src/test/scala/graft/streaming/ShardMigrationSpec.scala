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

  test("segmented fold equals the sorted-group walker on corpus ops (both variants)") {
    import spark.implicits._
    val ops = shardOps(routed())
    val plain = migrationsBatch(ops).collect().toSet
    assert(migrationsBatchSegmented(ops).collect().toSet === plain)
    assert(plain.nonEmpty)
    val evict = migrationsEvictingBatch(ops).collect().toSet
    assert(migrationsEvictingBatchSegmented(ops).collect().toSet === evict)
    assert(evict.nonEmpty)
  }

  test("segmented fold matches across the HLL crossover and range-boundary handoffs") {
    import spark.implicits._
    // single shard, 6400 seqs, 3000 distinct keys (> MaxExactKeys, so
    // mid-log tallies live in HLL territory); ranges=8 → width 800.
    // Handoffs: seq 800 lands EXACTLY on a range boundary (the stitch's
    // handoff-at-entry path), 2000 and 4700 land mid-range. Eras of
    // 1200 and 2700 seqs cross MaxExactKeys themselves, so the evict
    // variant also exercises exact→HLL inside an era.
    def gidAt(seq: Long): Long =
      if (seq < 800) 10L else if (seq < 2000) 20L
      else if (seq < 4700) 30L else 40L
    val ops = spark.range(0, 6400).as[Long]
      .map(i => ShardOp(1, i, s"k${i % 3000}", gidAt(i)))
    val plain = migrationsBatch(ops).collect().toSet
    val seg = migrationsBatchSegmented(ops, ranges = 8).collect().toSet
    assert(seg === plain, "segmented and sequential walkers diverged")
    assert(plain.map(_.at_seq) === Set(800L, 2000L, 4700L))
    // the 4700 handoff carries ~3000 distinct keys — sketch territory;
    // HLL registers are a pure function of the key set, so the counts
    // must be BIT-identical between the two execution shapes (asserted
    // by the set equality above), and within the sketch's error band:
    val late = plain.find(_.at_seq == 4700L).get
    assert(math.abs(late.n_keys - 3000L).toDouble / 3000 <= 0.05, late.toString)
    val evict = migrationsEvictingBatch(ops).collect().toSet
    assert(migrationsEvictingBatchSegmented(ops, ranges = 8).collect().toSet === evict)
    // evict eras: [0,800) = 800 exact keys; [800,2000) = 1200 distinct
    // (crosses MaxExactKeys inside the era → HLL estimate)
    assert(evict.find(_.at_seq == 800L).get.n_keys === 800L)
    val era2 = evict.find(_.at_seq == 2000L).get
    assert(math.abs(era2.n_keys - 1200L).toDouble / 1200 <= 0.05, era2.toString)
  }

  test("segmented fold spreads a maximally-skewed log over >10 tasks") {
    import spark.implicits._
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    // ALL ops on one shard — the sorted-group walker's worst case: its
    // one shuffle delivers every record to a single task. The segmented
    // fold must spread the same log over shards × ranges (= 64) groups.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val shuffleKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(coalesceKey)
    val prevShuffle = spark.conf.get(shuffleKey)
    spark.conf.set(coalesceKey, "false")
    // the suite session pins 4 shuffle partitions for speed; the whole
    // point of this probe is fan-out, so widen to the prod default (32)
    spark.conf.set(shuffleKey, "32")
    val perStage = scala.collection.concurrent.TrieMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null &&
            t.taskMetrics.shuffleReadMetrics.recordsRead > 0)
          perStage.updateWith(t.stageId) { c => Some(c.getOrElse(0) + 1) }
    }
    def maxBusyTasks(body: => Unit): Int = {
      perStage.clear()
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        // listener bus is async; poll until the counts go quiet
        var last = -1; var same = 0
        while (same < 3) {
          Thread.sleep(200)
          val now = perStage.values.sum
          if (now == last) same += 1 else { same = 0; last = now }
        }
        if (perStage.isEmpty) 0 else perStage.values.max
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    try {
      val ops = spark.range(0, 20000).as[Long]
        .map(i => ShardOp(3, i, s"k${i % 512}", (i / 5000) * 10))
      val segWidth = maxBusyTasks {
        assert(migrationsBatchSegmented(ops, ranges = 64).collect().toSet ===
          migrationsBatch(ops).collect().toSet)
      }
      val walkerWidth = maxBusyTasks { migrationsBatch(ops).collect() }
      assert(segWidth > 10,
        s"segmented fold used only $segWidth busy tasks in its widest stage")
      assert(walkerWidth <= 1,
        s"single-shard walker should bottleneck on 1 busy task, saw $walkerWidth")
    } finally {
      prev.fold(spark.conf.unset(coalesceKey))(v => spark.conf.set(coalesceKey, v))
      spark.conf.set(shuffleKey, prevShuffle)
    }
  }

  test("streaming machine: micro-batch task spread = busy shards (documented ceiling)") {
    import spark.implicits._
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    implicit val sqlCtx = spark.sqlContext
    // The STREAMING machines key by shard (10 keys): a micro-batch can
    // never spread its stateful stage over more tasks than it has busy
    // shards, whatever spark.sql.shuffle.partitions says. That is the
    // accepted batch/stream asymmetry — per-batch work is bounded by
    // the micro-batch, so the ceiling caps latency, not correctness;
    // the SEGMENTED batch paths exist precisely because a full-log
    // replay must not inherit it. This spec pins both halves: a
    // 10-shard batch spreads over >1 (≤10) tasks, and a single-shard
    // batch serializes to exactly 1 — so the scaladoc's claim stays
    // true in code.
    val shuffleKey = "spark.sql.shuffle.partitions"
    val prevShuffle = spark.conf.getOption(shuffleKey)
    spark.conf.set(shuffleKey, "32")
    val perStage = scala.collection.concurrent.TrieMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null &&
            t.taskMetrics.shuffleReadMetrics.recordsRead > 0)
          perStage.updateWith(t.stageId) { c => Some(c.getOrElse(0) + 1) }
    }
    def maxBusy(body: => Unit): Int = {
      perStage.clear()
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        var last = -1; var same = 0
        while (same < 3) {
          Thread.sleep(200)
          val now = perStage.values.sum
          if (now == last) same += 1 else { same = 0; last = now }
        }
        if (perStage.isEmpty) 0 else perStage.values.max
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    try {
      val input = MemoryStream[ShardOp]
      val q = migrations(input.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("mig_spread").start()
      try {
        // skewed 10-shard batch: 90% of ops on shard 3, with handoffs
        val all = (0 until 10).flatMap { s =>
          val n = if (s == 3) 900 else 10
          (0 until n).map(i => ShardOp(s, s * 100000L + i, s"k${i % 64}", i / (n / 2 + 1) + 1L))
        }
        val wide = maxBusy { input.addData(all); q.processAllAvailable() }
        // single-shard batch: the ceiling serializes it to one task
        val hot = (0 until 1000).map(i => ShardOp(3, 2000000L + i, s"k${i % 64}", 9L))
        val narrow = maxBusy { input.addData(hot); q.processAllAvailable() }
        assert(wide > 1 && wide <= 10,
          s"10-shard micro-batch must spread over >1 and <=10 tasks, saw $wide")
        assert(narrow == 1,
          s"single-shard micro-batch must serialize to 1 busy task, saw $narrow")
      } finally q.stop()
    } finally
      prevShuffle.fold(spark.conf.unset(shuffleKey))(v => spark.conf.set(shuffleKey, v))
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
