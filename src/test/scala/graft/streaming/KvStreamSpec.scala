package graft.streaming

import graft.SparkSpec
import graft.kv.{Kv, KvOp}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class Ev(ts: Long, event_type: String, value: Double)

class KvStreamSpec extends SparkSpec {

  private def randomLog(seed: Long, n: Int): Vector[KvOp] = {
    val rnd = new scala.util.Random(seed)
    val keys = Vector("a", "b", "zz", "k9")
    val kinds = Vector("get", "put", "append")
    Vector.tabulate(n) { i =>
      KvOp(i.toLong, rnd.nextInt(5).toLong, i.toLong, kinds(rnd.nextInt(3)),
        keys(rnd.nextInt(keys.size)), s"v$i.")
    }
  }

  private def finalStates(sink: String): Map[String, String] =
    spark.table(sink)
      .groupBy(col("key")).agg(expr("max_by(state, seq)").as("state"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("hot key: 1e6 single-key ops fold in O(state) memory; witness intact") {
    import spark.implicits._
    // the hot-key pathology pinned in replayBatch's scaladoc: one key
    // absorbs the whole log. The compacting fold must stream the
    // sorted group (never buffer it), keep only the 500 B tail, and
    // the FNV witness must equal a driver-side recompute of the
    // dropped prefix — proving no silent loss at 10⁶ appends.
    val n = 1000000
    // one client with increasing clientSeq: the ledger map stays at
    // one entry, so the state bound under test is the value tail alone
    val ops = spark.range(0, n).as[Long]
      .map(i => KvOp(i, 0L, i, "append", "hot", (i % 10).toString))
    val out = KvStream.replayBatchCompacting(ops.toDF().as[KvOp]).collect()
    assert(out.length === 1)
    val s = out.head
    assert(s.total_len === n.toLong)
    assert(s.state_tail.length === 500)
    val full = (0 until n).map(_ % 10).mkString
    assert(s.state_tail === full.substring(n - 500))
    // recompute the dropped-prefix digest with the same seeded fold
    assert(s.dropped_fnv === KvStream.fnv64(0L, full.substring(0, n - 500)))
    // and the plan is the sorted-group scan, not a group buffer
    val plan = KvStream.replayBatchCompacting(ops.toDF().as[KvOp])
      .queryExecution.executedPlan.toString
    assert(plan.contains("MapGroups") && plan.contains("Sort ["), plan.take(400))
  }

  test("batch sorted-group scan (replayBatch) equals the streaming machine and Kv.replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ops = randomLog(17, 120)
    // ledgered batch scan vs plain batch replay (randomLog has unique
    // (clientId, clientSeq) per op, so the ledger drops nothing)
    val batch = KvStream.replayBatch(ops.toDS()).collect()
      .map(s => s.key -> s.state).toMap
    val plain = Kv.replay(ops.toDS()).collect().map(s => s.key -> s.state).toMap
    assert(batch === plain)
    // vs the streaming machine over the same log
    val input = MemoryStream[KvOp]
    val q = KvStream.replayStream(input.toDS()).toDF()
      .writeStream.outputMode("update").format("memory").queryName("kvbatcheq").start()
    try {
      input.addData(ops); q.processAllAvailable()
      assert(finalStates("kvbatcheq") === batch)
    } finally q.stop()
    // ledger semantics preserved: a client retry is dropped by both paths
    val retry = Seq(
      KvOp(0, 1, 0, "put", "k", "A"),
      KvOp(1, 1, 1, "append", "k", "B"),
      KvOp(2, 1, 1, "append", "k", "B")) // same (client, clientSeq): retry
    val ledgered = KvStream.replayBatch(retry.toDS()).collect()
    assert(ledgered.map(s => s.key -> s.state).toMap === Map("k" -> "AB"))
    // plan shape: MapGroups with a per-group sort order fed by SortExec —
    // Spark delivers the group seq-ordered; no user-side buffer exists
    val plan = KvStream.replayBatch(retry.toDS()).queryExecution.executedPlan.toString
    assert(plan.contains("MapGroups") && plan.contains("seq") && plan.contains("Sort ["))
  }

  test("streaming fold equals batch replay on every prefix (3 batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ops = randomLog(11, 90)
    val chunks = ops.grouped(30).toVector
    val input = MemoryStream[KvOp]
    val q = KvStream.replayStream(input.toDS()).toDF()
      .writeStream.outputMode("update").format("memory").queryName("kvout").start()
    try {
      var consumed = Vector.empty[KvOp]
      for (chunk <- chunks) {
        input.addData(chunk)
        q.processAllAvailable()
        consumed ++= chunk
        val batchResult = Kv.replay(consumed.toDS()).collect()
          .map(s => s.key -> s.state).toMap
        // streaming table holds one row per (key, batch-it-saw-traffic);
        // latest row per key must equal the batch fold of the prefix
        val streamResult = finalStates("kvout")
        assert(streamResult === batchResult, s"prefix of ${consumed.size} ops")
      }
    } finally q.stop()
  }

  test("exactly-once ledger drops client retries across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KvOp]
    val q = KvStream.replayStream(input.toDS()).toDF()
      .writeStream.outputMode("update").format("memory").queryName("kvdedup").start()
    try {
      input.addData(Seq(
        KvOp(0, 1, 0, "put", "k", "A"),
        KvOp(1, 1, 1, "append", "k", "B")))
      q.processAllAvailable()
      // retry of clientSeq=1 arrives in a LATER batch with a new seq
      input.addData(Seq(
        KvOp(2, 1, 1, "append", "k", "B"),
        KvOp(3, 2, 0, "append", "k", "C")))
      q.processAllAvailable()
      assert(finalStates("kvdedup")("k") === "ABC")
    } finally q.stop()
  }

  test("compacting fold: bounded state, witnesses reconstruct the full value") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val max = 64
    // append-heavy hot-key log: the uncompacted value grows far past max
    val hot = Vector.tabulate(400) { i =>
      val op = if (i == 0) "put" else if (i % 20 == 7) "get" else "append"
      KvOp(i.toLong, (i % 3).toLong, i.toLong, op, s"h${i % 2}", s"v$i;")
    }
    val full = KvStream.replayBatch(hot.toDS()).collect()
      .map(s => s.key -> s.state).toMap
    assert(full.values.exists(_.length > 4 * max), "fixture must outgrow the cap")
    // batch compacting twin: tail + digest + length witness the value
    val compact = KvStream.replayBatchCompacting(hot.toDS(), max).collect()
    compact.foreach { c =>
      val v = full(c.key)
      assert(c.state_tail.length <= max, s"${c.key}: state not bounded")
      assert(c.state_tail === v.takeRight(math.min(max, v.length)))
      assert(c.total_len === v.length.toLong)
      val droppedLen = v.length - c.state_tail.length
      assert(c.dropped_fnv ===
        (if (droppedLen == 0) 0L else KvStream.fnv64(0L, v.substring(0, droppedLen))))
    }
    // streaming machine agrees with the batch twin, batch by batch
    val input = MemoryStream[KvOp]
    val q = KvStream.replayStreamCompacting(input.toDS(), max).toDF()
      .writeStream.outputMode("update").format("memory").queryName("kvcompact").start()
    try {
      hot.grouped(100).foreach { chunk => input.addData(chunk); q.processAllAvailable() }
      val got = spark.table("kvcompact")
        .groupBy(col("key")).agg(expr("max_by(state_tail, seq)").as("t"),
          expr("max_by(total_len, seq)").as("l"), expr("max_by(dropped_fnv, seq)").as("f"))
        .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      compact.foreach { c =>
        assert(got(c.key) === ((c.state_tail, c.total_len, c.dropped_fnv)))
      }
    } finally q.stop()
    // a put RESETS the logical value (and the dropped prefix with it)
    val reset = Vector(
      KvOp(0, 1, 0, "put", "k", "A" * 100),
      KvOp(1, 1, 1, "append", "k", "B" * 100),
      KvOp(2, 1, 2, "put", "k", "short"))
    val r = KvStream.replayBatchCompacting(reset.toDS(), max).collect().head
    assert(r.state_tail === "short" && r.total_len === 5L && r.dropped_fnv === 0L)
  }

  test("KV state machine runs on the RocksDB state store provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the disk-backed store is the 100 TB state path (key counts far
    // beyond executor memory); same fold, same results
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ops = randomLog(77, 60)
      val input = MemoryStream[KvOp]
      val q = KvStream.replayStream(input.toDS()).toDF()
        .writeStream.outputMode("update").format("memory").queryName("kvrocks").start()
      try {
        ops.grouped(20).foreach { chunk => input.addData(chunk); q.processAllAvailable() }
        val streamResult = finalStates("kvrocks")
        val batchResult = Kv.replay(ops.toDS()).collect().map(s => s.key -> s.state).toMap
        assert(streamResult === batchResult)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("rate-source soak: thousands of ops through RocksDB state equal batch replay") {
    import spark.implicits._
    // ops derived purely from the rate source's monotonic `value`, so
    // the batch side can regenerate exactly the consumed prefix
    def opOf(i: Long): KvOp = KvOp(i, i % 5, i, Seq("put", "append", "get")((i % 3).toInt),
      s"k${i % 7}", s"v$i.")
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ops = spark.readStream.format("rate")
        .option("rowsPerSecond", 5000).option("rampUpTime", "0s")
        .load()
        .select(col("value"))
        .as[Long].map(opOf)
      val q = KvStream.replayStream(ops).toDF()
        .writeStream.outputMode("update").format("memory").queryName("kvsoak").start()
      try {
        // soak until a few thousand ops are committed (bounded wait)
        val deadline = System.nanoTime() + 60L * 1000000000L
        var maxSeq = -1L
        while (maxSeq < 3000 && System.nanoTime() < deadline) {
          Thread.sleep(500)
          q.processAllAvailable()
          val m = spark.table("kvsoak").agg(max(col("seq"))).head()
          if (!m.isNullAt(0)) maxSeq = m.getLong(0)
        }
        q.stop()
        assert(maxSeq >= 3000, s"soak produced only ${maxSeq + 1} ops in 60s")
        // rate batches are offset prefixes: everything <= maxSeq applied
        val batchResult = Kv.replay((0L to maxSeq).map(opOf).toDS())
          .collect().map(s => s.key -> s.state).toMap
        assert(finalStates("kvsoak") === batchResult, s"prefix of ${maxSeq + 1} ops")
      } finally if (q.isActive) q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("watermark drops late events in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600L * 1000000 // µs
    def ev(h: Long): Ev = Ev(h * hour * 1000, "click", 1.0) // ts in ns
    val input = MemoryStream[Ev]
    val agg = input.toDS()
      .withColumn("t", timestamp_micros(expr("ts div 1000")))
      .withWatermark("t", "1 hour")
      .groupBy(window(col("t"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("late").start()
    try {
      input.addData(Seq(ev(1), ev(1), ev(2)))
      q.processAllAvailable()
      // advance event time far enough to close the h=1 and h=2 windows
      input.addData(Seq(ev(6)))
      q.processAllAvailable()
      // a straggler for h=1 arrives after the watermark passed: dropped
      input.addData(Seq(ev(1)))
      input.addData(Seq(ev(9)))
      q.processAllAvailable()
      val counts = spark.table("late")
        .select(hour_of(col("window.start")).as("h"), col("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(counts.get(1L) === Some(2L), s"late event must not reopen h=1: $counts")
      assert(counts.get(2L) === Some(1L))
    } finally q.stop()
  }

  private def hour_of(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (unix_timestamp(c) / 3600).cast("long")

  test("windowed streaming aggregation matches batch on the events table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Ev.ts is raw ns — read the table through the schema-adaptive
    // accessor so the spec survives any physical ts encoding
    val raw = spark.read.parquet(s"${sf()}/events.parquet")
    val evs = raw
      .select((graft.sources.EventTime.tsUs(raw) * 1000).as("ts"),
        col("event_type"), col("value"))
      .as[(Long, String, Double)].collect().map(t => Ev(t._1, t._2, t._3))
    val input = MemoryStream[Ev]
    val agg = input.toDS()
      .withColumn("t", timestamp_micros(expr("ts div 1000")))
      .withWatermark("t", "1 hour")
      .groupBy(window(col("t"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("evagg").start()
    try {
      input.addData(evs.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("evagg")
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = graft.queries.RelQueries.eventsDaily(spark, sf())
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
      assert(streamed === batch)
    } finally q.stop()
  }
}
