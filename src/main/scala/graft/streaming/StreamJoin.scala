package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stream-stream INTERVAL join: attribute each purchase to the clicks
  * of the same user within the preceding hour — the canonical
  * streaming join whose state stays bounded because the join
  * condition carries an explicit time range.
  *
  * Scale design: both sides shuffle by user_id (the equi half of the
  * condition); the range half (`purchase_t` within [click_t,
  * click_t + 1h]) plus the watermarks lets Spark EXPIRE buffered rows
  * — without the range bound, each side's state grows forever. Buffer
  * per key ≈ one hour of that user's events, independent of stream
  * length: the property that keeps a 100 TB/day stream joinable. */
object StreamJoin {

  final case class Click(user_id: Long, click_t: Timestamp)
  final case class Purchase(user_id: Long, purchase_t: Timestamp, amount: Long)

  val AttributionWindow = "1 hour"

  /** Inner interval join; inputs must already carry `withWatermark`
    * on their time columns (streaming mode) — in batch mode the same
    * plan runs without watermarks, which the spec uses as the oracle. */
  def attributed(clicks: Dataset[Click], purchases: Dataset[Purchase]): DataFrame =
    purchases.toDF().alias("p")
      .join(clicks.toDF().alias("c"),
        col("p.user_id") === col("c.user_id") &&
          col("p.purchase_t") >= col("c.click_t") &&
          col("p.purchase_t") <= col("c.click_t") + expr(s"INTERVAL $AttributionWindow"))
      .select(col("p.user_id").as("user_id"),
        col("c.click_t").as("click_t"),
        col("p.purchase_t").as("purchase_t"),
        col("p.amount").as("amount"))

  // ── TPC-H-shaped twin: orders × lineitem ───────────────────────────

  final case class OrderEvt(o_orderkey: Long, o_orderdate: Timestamp,
      o_orderpriority: String)
  final case class ShipEvt(l_orderkey: Long, l_shipdate: Timestamp,
      price_cents: Long)

  val ShipWindow = "90 days"

  /** The engine's relational join surface mirrored into streaming:
    * each shipped line attributed to its order iff it ships within
    * [[ShipWindow]] of the order date — orders and shipments as two
    * live streams, the same shape `rel_semi`/`rel_asof` query in
    * batch. The equi half (orderkey) keys the shuffle; the range half
    * plus watermarks bounds each side's buffered state to one window
    * of traffic, independent of stream length. Emits (o_orderkey,
    * o_orderpriority, ship_day, price_cents); `ship_day` is epoch
    * days so the DuckDB oracle compares integers, not local-rendered
    * timestamps. Stream ≡ batch pinned in StreamJoinSpec on the real
    * corpus tables. */
  def shippedLines(orders: Dataset[OrderEvt], lines: Dataset[ShipEvt]): DataFrame =
    lines.toDF().alias("l")
      .join(orders.toDF().alias("o"),
        col("l.l_orderkey") === col("o.o_orderkey") &&
          col("l.l_shipdate") >= col("o.o_orderdate") &&
          col("l.l_shipdate") <= col("o.o_orderdate") + expr(s"INTERVAL $ShipWindow"))
      .select(col("o.o_orderkey").as("o_orderkey"),
        col("o.o_orderpriority").as("o_orderpriority"),
        datediff(col("l.l_shipdate"), lit("1970-01-01")).as("ship_day"),
        col("l.price_cents").as("price_cents"))

  /** Corpus streams for the TPC-H twin (typed, cents-quantized). */
  def orderEvents(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Dataset[OrderEvt] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").cast("long"),
        col("o_orderdate").cast("timestamp"), col("o_orderpriority"))
      .as[OrderEvt]
  }

  def shipEvents(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Dataset[ShipEvt] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").cast("long"),
        col("l_shipdate").cast("timestamp"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
      .as[ShipEvt]
  }

  /** Gate surface (`rel_ship_attrib`): the streaming machine's plan in
    * batch mode over the corpus tables — the k_replay_stream pattern. */
  def shippedLinesBatch(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame =
    shippedLines(orderEvents(spark, sfDir), shipEvents(spark, sfDir))
}
