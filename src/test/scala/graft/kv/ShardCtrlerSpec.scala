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

  test("historyDf exposes (config_num, shard, gid) for distributed joins") {
    val h = history(cmdsFromNation(spark, sf()))
    val df = ShardCtrler.historyDf(spark, h)
    assert(df.count() === h.length.toLong * NShards)
    val latest = df.filter(s"config_num = ${h.last.num}")
    assert(latest.count() === NShards.toLong)
    h.foreach(checkBalanced)
  }
}
