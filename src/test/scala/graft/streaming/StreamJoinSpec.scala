package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import StreamJoin._

class StreamJoinSpec extends SparkSpec {

  private val Base = 1000000L // minutes; clear of the epoch-0 watermark trap
  private def ts(min: Long): Timestamp = new Timestamp((Base + min) * 60000)

  test("interval join attributes purchases to in-window clicks; streaming == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = StreamJoin.attributed(
      clicks.toDS().withWatermark("click_t", "10 minutes"),
      purchases.toDS().withWatermark("purchase_t", "10 minutes"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("attrib").start()
    try {
      val cs = Seq(Click(1, ts(0)), Click(1, ts(30)), Click(2, ts(5)))
      val ps = Seq(
        Purchase(1, ts(45), 100),  // within 1h of clicks at 0 and 30
        Purchase(1, ts(75), 200),  // within 1h of click at 30 only
        Purchase(2, ts(90), 300),  // 85 min after click at 5 -> no match
        Purchase(3, ts(10), 400))  // no click at all
      clicks.addData(cs)
      purchases.addData(ps)
      q.processAllAvailable()
      val got = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000 - Base,
          r.getTimestamp(2).getTime / 60000 - Base, r.getLong(3))).toSet
      val expected = Set(
        (1L, 0L, 45L, 100L), (1L, 30L, 45L, 100L), (1L, 30L, 75L, 200L))
      assert(got === expected)
      // batch replay of the same inputs through the same plan agrees
      val batch = StreamJoin.attributed(cs.toDS(), ps.toDS()).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000 - Base,
          r.getTimestamp(2).getTime / 60000 - Base, r.getLong(3))).toSet
      assert(batch === expected)
    } finally q.stop()
  }

  test("TPC-H twin: orders x lineitem interval join, streaming == batch on corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the REAL corpus tables as event streams, fed in event-time
    // lockstep (3 rounds over the global date range) — watermark delay
    // of 100 days keeps every order buffered past its whole ship
    // window, so the inner join must emit exactly the batch result
    val orders = StreamJoin.orderEvents(spark, sf()).collect().sortBy(_.o_orderdate.getTime)
    val lines = StreamJoin.shipEvents(spark, sf()).collect().sortBy(_.l_shipdate.getTime)
    val expected = StreamJoin.shippedLinesBatch(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .sorted(Ordering.Tuple4[Long, String, Int, Long])
    assert(expected.nonEmpty, "corpus fixture produced no attributed lines")
    // the window must BITE: some lines ship outside [order, order+90d]
    assert(expected.length < lines.length,
      "every line in-window — the range bound is vacuous on this corpus")
    val times = (orders.map(_.o_orderdate.getTime) ++ lines.map(_.l_shipdate.getTime)).sorted
    val cuts = Seq(times(times.length / 3), times(2 * times.length / 3), Long.MaxValue)
    val oIn = MemoryStream[StreamJoin.OrderEvt]
    val lIn = MemoryStream[StreamJoin.ShipEvt]
    val joined = StreamJoin.shippedLines(
      oIn.toDS().withWatermark("o_orderdate", "100 days"),
      lIn.toDS().withWatermark("l_shipdate", "100 days"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ship_attrib").start()
    try {
      var oPrev = Long.MinValue
      var lPrev = Long.MinValue
      cuts.foreach { cut =>
        oIn.addData(orders.filter(o =>
          o.o_orderdate.getTime > oPrev && o.o_orderdate.getTime <= cut))
        lIn.addData(lines.filter(l =>
          l.l_shipdate.getTime > lPrev && l.l_shipdate.getTime <= cut))
        oPrev = cut; lPrev = cut
        q.processAllAvailable()
      }
      val got = spark.table("ship_attrib").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
        .sorted(Ordering.Tuple4[Long, String, Int, Long])
      assert(got === expected)
    } finally q.stop()
  }

  test("watermark + range bound expires join state (no unbounded buffer)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = StreamJoin.attributed(
      clicks.toDS().withWatermark("click_t", "10 minutes"),
      purchases.toDS().withWatermark("purchase_t", "10 minutes"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("attrib_expire").start()
    try {
      clicks.addData(Seq(Click(1, ts(0))))
      purchases.addData(Seq(Purchase(9, ts(0), 1))) // advance purchase watermark
      q.processAllAvailable()
      // drive both watermarks far past click@0 + 1h + 10m slack
      clicks.addData(Seq(Click(8, ts(500))))
      purchases.addData(Seq(Purchase(8, ts(500), 1)))
      q.processAllAvailable()
      val progress = q.lastProgress
      // a purchase for user 1 arriving now is beyond the click's
      // lifetime: the buffered click must already be evicted, so no
      // new match can appear
      purchases.addData(Seq(Purchase(1, ts(30), 999)))
      q.processAllAvailable()
      val got = spark.table("attrib_expire").collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(!got.contains((1L, 999L)),
        s"late purchase matched an expired click: $got")
      assert(progress != null)
    } finally q.stop()
  }
}
