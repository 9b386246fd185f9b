package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import Sessionize._

class SessionizeSpec extends SparkSpec {

  // offset well past epoch 0: a timestamp of exactly 0 ms is silently
  // dropped by the event-time watermark machinery (ts < initial watermark)
  private val Base = 1000000L
  private def ts(min: Long): Timestamp = new Timestamp((Base + min) * 60000)

  test("sessions close on gap or watermark timeout; results are final") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = Sessionize.sessions(
        input.toDS().withWatermark("t", "1 minute"))
      .writeStream.outputMode("append").format("memory")
      .queryName("sess").start()
    try {
      // user 1: events at minute 0, 10 (one session), then 60 (new session)
      // user 2: single event at minute 5
      input.addData(Seq(
        SessionEvent(1, ts(0)), SessionEvent(1, ts(10)), SessionEvent(2, ts(5))))
      q.processAllAvailable()
      input.addData(Seq(SessionEvent(1, ts(60))))
      q.processAllAvailable()
      // advance watermark far beyond every open session's gap
      input.addData(Seq(SessionEvent(3, ts(500))))
      q.processAllAvailable()
      input.addData(Seq(SessionEvent(3, ts(1000))))
      q.processAllAvailable()
      val got = spark.table("sess")
        .select(col("user_id"), col("start_ms"), col("end_ms"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1) / 60000 - Base,
          r.getLong(2) / 60000 - Base, r.getLong(3))).toSet
      assert(got.contains((1L, 0L, 10L, 2L)), s"user1 first session: $got")
      assert(got.contains((1L, 60L, 60L, 1L)), s"user1 second session: $got")
      assert(got.contains((2L, 5L, 5L, 1L)), s"user2 session: $got")
    } finally q.stop()
  }

  test("out-of-order event inside the session does not move bounds backward") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = Sessionize.sessions(input.toDS().withWatermark("t", "2 hours"))
      .writeStream.outputMode("append").format("memory")
      .queryName("sessooo").start()
    try {
      input.addData(Seq(SessionEvent(1, ts(0)), SessionEvent(1, ts(20))))
      q.processAllAvailable()
      // a late event at minute 10 (admitted by the 2h watermark) falls
      // INSIDE the open session; lastMs must stay 20
      input.addData(Seq(SessionEvent(1, ts(10))))
      q.processAllAvailable()
      // minute 45: gap vs 20 is 25min <= 30 → SAME session (a buggy
      // fold measuring vs the stale minimum 10 would split here)
      input.addData(Seq(SessionEvent(1, ts(45))))
      q.processAllAvailable()
      input.addData(Seq(SessionEvent(9, ts(5000)))) // flush via watermark
      q.processAllAvailable()
      val got = spark.table("sessooo").filter(col("user_id") === 1)
        .select(col("start_ms"), col("end_ms"), col("n_events")).collect()
        .map(r => (r.getLong(0) / 60000 - Base, r.getLong(1) / 60000 - Base, r.getLong(2)))
      assert(got.toSeq === Seq((0L, 45L, 4L)), got.mkString(","))
    } finally q.stop()
  }

  test("streaming sessions equal RelQueries.sessionize on the real events table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // stream ≡ batch on the driver's events fixture, the rel_ship_attrib
    // pattern. The streaming state machine is ms-granular (Timestamp),
    // the batch operator µs-granular — so both sides consume the SAME
    // ms-truncated instants: a twin fixture written as int64 nanos
    // (also exercising tsUs's ns branch against the real table's read)
    val real = spark.read.parquet(s"${sf()}/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-twin").toString
    real.select(graft.sources.EventTime.tsUs(real).as("us"),
        col("user_id"), col("event_id"))
      // integer div (float would corrupt e15-scale µs); ns = ms * 1e6
      .select((expr("us div 1000") * 1000000L).as("ts"),
        col("user_id"), col("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.queries.RelQueries.sessionize(spark, dir)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("start_us") / 1000,
        r.getAs[Long]("end_us") / 1000, r.getAs[Long]("n_events"))).toSet

    val evs = spark.read.parquet(s"$dir/events.parquet")
      // integer div: ts is ~1.7e18 ns, past double's 2^53 precision
      .select(col("user_id"), expr("ts div 1000000").as("ms"))
      .collect().map(r => SessionEvent(r.getLong(0), new Timestamp(r.getLong(1))))
    val input = MemoryStream[SessionEvent]
    val q = Sessionize.sessions(input.toDS().withWatermark("t", "1 minute"))
      .writeStream.outputMode("append").format("memory")
      .queryName("sessreal").start()
    try {
      input.addData(evs.toSeq)
      q.processAllAvailable()
      // close every still-open session via a far-future sentinel user
      val maxMs = evs.map(_.t.getTime).max
      input.addData(Seq(SessionEvent(Long.MaxValue, new Timestamp(maxMs + 86400000L))))
      q.processAllAvailable()
      val streamed = spark.table("sessreal")
        .filter(col("user_id") =!= Long.MaxValue)
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_ms"),
          r.getAs[Long]("end_ms"), r.getAs[Long]("n_events"))).toSet
      assert(streamed.size === batch.size,
        s"session count: streamed ${streamed.size} vs batch ${batch.size}")
      assert(streamed === batch)
    } finally q.stop()
  }

  test("batch and streaming sessionization agree on session counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deterministic event set: 3 users × sessions separated by >30min
    val evs = for {
      u <- 1L to 3L
      s <- 0 until 4
      i <- 0 until 3
    } yield SessionEvent(u, ts(s * 100 + i * 5 + u))
    val input = MemoryStream[SessionEvent]
    val q = Sessionize.sessions(input.toDS().withWatermark("t", "1 minute"))
      .writeStream.outputMode("append").format("memory")
      .queryName("sess2").start()
    try {
      input.addData(evs)
      q.processAllAvailable()
      // flush the last open session per user with a far-future event
      input.addData(Seq(SessionEvent(99, ts(100000))))
      q.processAllAvailable()
      val streamed = spark.table("sess2")
        .filter(col("user_id") <= 3)
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_ms"),
          r.getAs[Long]("n_events")))
      assert(streamed.length === 12, streamed.mkString(","))
      assert(streamed.forall(_._3 === 3L))
    } finally q.stop()
  }
}
