package graft.kv

import graft.SparkSpec

class KvSpec extends SparkSpec {

  /** Pure reference model: the porcupine step function
    * (`src/models/kv.go:40-54`) applied to a seq-sorted log. */
  private def modelFold(ops: Seq[KvOp]): Map[String, String] =
    ops.sortBy(_.seq).foldLeft(Map.empty[String, String].withDefaultValue("")) {
      (st, o) => o.op match {
        case "put"    => st.updated(o.key, o.value)
        case "append" => st.updated(o.key, st(o.key) + o.value)
        case _        => st
      }
    }

  /** Deterministic random op logs (seeded) — stand-in for the lab's
    * randomized clerk workloads (`src/kvraft/test_test.go:259-297`). */
  private def randomLog(seed: Long, n: Int): List[KvOp] = {
    val rnd = new scala.util.Random(seed)
    val keys = Vector("a", "b", "zz", "k9")
    val opsKinds = Vector("get", "put", "append")
    List.tabulate(n) { i =>
      KvOp(seq = i.toLong, clientId = rnd.nextInt(6).toLong, clientSeq = i.toLong,
        op = opsKinds(rnd.nextInt(3)), key = keys(rnd.nextInt(keys.size)),
        value = s"v${rnd.nextInt(100)}.")
    }
  }

  test("replay equals the KvModel fold for random op logs") {
    import spark.implicits._
    for (seed <- 1L to 8L) {
      val ops = randomLog(seed, 40 + seed.toInt * 17)
      val got = Kv.replay(ops.toDS()).collect().map(s => s.key -> s.state).toMap
      val want = modelFold(ops)
      assert(got === ops.map(_.key).distinct.map(k => k -> want.getOrElse(k, "")).toMap,
        s"seed=$seed")
    }
  }

  test("getLog observations equal running model state at each get") {
    import spark.implicits._
    for (seed <- 1L to 4L) {
      val ops = randomLog(seed * 100, 80)
      val got = Kv.getLog(ops.toDS()).collect()
        .map(g => (g.key, g.seq) -> g.observed).toMap
      var st = Map.empty[String, String].withDefaultValue("")
      ops.sortBy(_.seq).foreach { o =>
        o.op match {
          case "put"    => st = st.updated(o.key, o.value)
          case "append" => st = st.updated(o.key, st(o.key) + o.value)
          case _        => assert(got((o.key, o.seq)) === st(o.key), s"seed=$seed seq=${o.seq}")
        }
      }
    }
  }

  test("exactly-once dedup: duplicated client ops apply once") {
    import spark.implicits._
    val base = List(
      KvOp(0, 1, 0, "put", "k", "A"),
      KvOp(1, 1, 1, "append", "k", "B"),
      KvOp(2, 1, 1, "append", "k", "B"), // duplicate retry of clientSeq=1
      KvOp(3, 2, 0, "append", "k", "C"))
    val got = Kv.replay(base.toDS(), exactlyOnce = true).collect()
    assert(got.head.state === "ABC")
    // without the ledger the duplicate double-applies
    val raw = Kv.replay(base.toDS()).collect()
    assert(raw.head.state === "ABBC")
  }

  test("append integrity: per-client fragments present, unique, in-order") {
    import spark.implicits._
    // the kvraft GenericTest check (src/kvraft/test_test.go:138-179):
    // each client appends "x <client> <i> y"; the final value must
    // contain every client's fragments exactly once, in order.
    val clients = 0L to 3L
    val ops = clients.flatMap { c =>
      (0 until 20).map(i => KvOp(seq = c + clients.size * i, clientId = c,
        clientSeq = i.toLong, op = "append", key = "k", value = s"x $c $i y"))
    }
    val state = Kv.replay(ops.toDS()).collect().head.state
    for (c <- clients) {
      val idx = (0 until 20).map(i => state.indexOf(s"x $c $i y"))
      assert(idx.forall(_ >= 0), s"client $c fragment missing")
      assert(idx === idx.sorted, s"client $c fragments out of order")
      (0 until 20).foreach { i =>
        assert(state.indexOf(s"x $c $i y") === state.lastIndexOf(s"x $c $i y"))
      }
    }
  }

  test("key2shard matches int(key[0]) % 10 on a key population") {
    import spark.implicits._
    val df = Seq("a", "b", "K", "zebra", "9lives").toDF("key")
    val got = Kv.shardAssignment(df, "key").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    for ((k, s) <- got) assert(s === (k.head.toInt % 10))
  }
}
