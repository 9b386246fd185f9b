package graft.kv

import graft.SparkSpec
import ShardCtrler._

class ShardCtrlerSpec extends SparkSpec {

  private def loads(c: Config): Map[Int, Int] =
    c.groups.keys.map(g => g -> c.shards.count(_ == g)).toMap

  private def checkBalanced(c: Config): Unit = {
    if (c.groups.isEmpty) assert(c.shards.forall(_ == 0))
    else {
      assert(c.shards.forall(c.groups.contains), s"unassigned shard in $c")
      val l = loads(c)
      assert(l.values.max - l.values.min <= 1, s"unbalanced: $l")
    }
  }

  test("join/leave keep every shard assigned and balanced (max-min <= 1)") {
    // mirrors src/shardctrler/test_test.go:36-54 invariants
    val rnd = new scala.util.Random(7)
    var cfg = initial
    var live = Set.empty[Int]
    for (i <- 1 to 60) {
      val cmd =
        if (live.isEmpty || (rnd.nextBoolean() && live.size < 8)) {
          val g = 100 + i
          live += g; Join(Map(g -> Seq(s"s$g-a", s"s$g-b")))
        } else {
          val g = live.toSeq.sorted.apply(rnd.nextInt(live.size))
          live -= g; Leave(Seq(g))
        }
      cfg = step(cfg, cmd)
      assert(cfg.groups.keySet === live)
      checkBalanced(cfg)
    }
  }

  test("randomized join/leave/move sequences keep all invariants (8 seeds)") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed * 13)
      var cfg = initial
      var live = Set.empty[Int]
      for (i <- 1 to 40) {
        val roll = rnd.nextInt(10)
        val cmd: Cmd =
          if (live.isEmpty || (roll < 4 && live.size < 9)) {
            val g = 200 + seed * 100 + i
            live += g; Join(Map(g -> Seq(s"s$g")))
          } else if (roll < 7 && live.size > 1) {
            val g = live.toSeq.sorted.apply(rnd.nextInt(live.size))
            live -= g; Leave(Seq(g))
          } else {
            Move(rnd.nextInt(NShards), live.toSeq.sorted.apply(rnd.nextInt(live.size)))
          }
        val prev = cfg
        cfg = step(cfg, cmd)
        assert(cfg.num === prev.num + 1, s"seed=$seed step=$i must bump num")
        assert(cfg.groups.keySet === live, s"seed=$seed step=$i")
        cmd match {
          case Move(shard, gid) =>
            assert(cfg.shards(shard) === gid, s"seed=$seed move not honored")
          case _ =>
            // rebalance invariants hold after join/leave (a Move may
            // legitimately unbalance until the next join/leave)
            if (cfg.groups.nonEmpty) {
              assert(cfg.shards.forall(cfg.groups.contains), s"seed=$seed step=$i")
              val loads = cfg.groups.keys.map(g => cfg.shards.count(_ == g))
              assert(loads.max - loads.min <= 1, s"seed=$seed step=$i loads=$loads")
            }
        }
      }
    }
  }

  test("minimal movement: a join only moves shards into the new group") {
    // mirrors src/shardctrler/test_test.go:211-231
    var cfg = step(initial, Join(Map(1 -> Seq("a"))))
    cfg = step(cfg, Join(Map(2 -> Seq("b"))))
    val before = cfg.shards
    val after = step(cfg, Join(Map(3 -> Seq("c")))).shards
    val moved = before.indices.filter(i => before(i) != after(i))
    assert(moved.forall(i => after(i) == 3), "shards moved between old groups")
    assert(moved.size == NShards / 3, s"moved ${moved.size}, expected ${NShards / 3}")
  }

  test("minimal movement: a leave only moves the orphaned shards") {
    // mirrors src/shardctrler/test_test.go:234-250
    var cfg = initial
    for (g <- 1 to 4) cfg = step(cfg, Join(Map(g -> Seq(s"s$g"))))
    val before = cfg.shards
    val after = step(cfg, Leave(Seq(2))).shards
    val moved = before.indices.filter(i => before(i) != after(i))
    assert(moved.forall(i => before(i) == 2), "non-orphaned shard moved")
  }

  test("move pins a shard and bumps num; history time travel is stable") {
    // mirrors src/shardctrler/test_test.go:138-180 and :124-136
    val cmds = Seq[Cmd](Join(Map(1 -> Seq("a"), 2 -> Seq("b"))), Move(3, 2), Move(4, 1))
    val h = history(cmds)
    assert(h.map(_.num) === Vector(0, 1, 2, 3))
    assert(query(h, 2).shards(3) === 2)
    assert(query(h, -1).shards(4) === 1)
    assert(query(h, 0) === initial)
    // historical configs are immutable: re-query returns same value
    assert(query(h, 2) === query(h, 2))
  }

  test("rebalance is deterministic regardless of map ordering") {
    val servers1 = Map(5 -> Seq("a"), 9 -> Seq("b"), 2 -> Seq("c"))
    val servers2 = List(9 -> Seq("b"), 2 -> Seq("c"), 5 -> Seq("a")).toMap
    assert(step(initial, Join(servers1)).shards === step(initial, Join(servers2)).shards)
  }

  test("oracle invariant gate: genuine history passes, each injected violation fails") {
    import spark.implicits._
    // the gate SQL is shared verbatim with the DuckDB oracle
    // (SparkEntry's k_config_history); here Spark runs it over a temp
    // view so every invariant is PROVEN able to fail, not just present
    def gate(rows: Seq[(Int, Int, Int, String)]): Long = {
      rows.toDF("config_num", "shard", "gid", "servers")
        .createOrReplaceTempView("h_probe")
      spark.sql(ShardCtrler.invariantGateSql(
        "SELECT config_num, shard, gid, servers FROM h_probe")).count()
    }
    // genuine corpus history (includes a Move step) passes whole
    val h = history(cmdsFromNation(spark, sf()))
    val genuine = h.flatMap(c => c.shards.zipWithIndex.map { case (g, s) =>
      (c.num, s, g, c.groups.getOrElse(g, Seq.empty).mkString(","))
    })
    assert(gate(genuine) === h.length.toLong * NShards)
    // base fixture: config 0 unassigned; config 1 = gids 1,2,3 at 4/3/3
    def gidOf(s: Int): Int = if (s < 4) 1 else if (s < 7) 2 else 3
    val c0 = (0 until NShards).map(s => (0, s, 0, ""))
    val c1 = (0 until NShards).map(s => (1, s, gidOf(s), "srv"))
    assert(gate(c0 ++ c1) === 20L)
    // balance: pile config 1 onto gid 1 (8/1/1)
    val unbal = (0 until NShards).map(s => (1, s, if (s < 8) 1 else s - 6, "srv"))
    assert(gate(c0 ++ unbal) === 0L, "balance violation must zero the gate")
    // liveness: an assigned gid with empty servers
    val dead = c1.updated(0, (1, 0, 1, ""))
    assert(gate(c0 ++ dead) === 0L, "liveness violation must zero the gate")
    // config 0 must be unassigned
    val hot0 = c0.updated(3, (0, 3, 7, "srv"))
    assert(gate(hot0 ++ c1) === 0L, "config-0 violation must zero the gate")
    // shape: a config missing a shard row
    assert(gate(c0 ++ c1.tail) === 0L, "shape violation must zero the gate")
    // minimal movement: config 2 swaps shards 0↔4 between groups that
    // BOTH keep other shards — still balanced, live, well-shaped, but a
    // non-minimal transfer the reference test would flag
    val swap = (0 until NShards).map { s =>
      val g = if (s == 0) 2 else if (s == 4) 1 else gidOf(s)
      (2, s, g, "srv")
    }
    assert(gate(c0 ++ c1 ++ swap) === 0L,
      "non-minimal transfer must zero the gate")
    // ...but a single-shard transition is the Move command's explicit
    // override and stays exempt (1→2 keeps loads at 3/4/3)
    val move = (0 until NShards).map(s =>
      (2, s, if (s == 0) 2 else gidOf(s), "srv"))
    assert(gate(c0 ++ c1 ++ move) === 30L, "a Move-shaped step must pass")
    // ...and a join-shaped transition (new gid 4 fills from the others,
    // loads 3/2/3/2) passes: the receiver held nothing before
    val join4 = (0 until NShards).map { s =>
      val g = if (s == 0 || s == 4) 4 else gidOf(s)
      (2, s, g, "srv")
    }
    assert(gate(c0 ++ c1 ++ join4) === 30L, "a Join-shaped step must pass")
  }

  test("historyDf exposes (config_num, shard, gid) for distributed joins") {
    val h = history(cmdsFromNation(spark, sf()))
    val df = ShardCtrler.historyDf(spark, h)
    assert(df.count() === h.length.toLong * NShards)
    val latest = df.filter(s"config_num = ${h.last.num}")
    assert(latest.count() === NShards.toLong)
    h.foreach(checkBalanced)
  }
}
