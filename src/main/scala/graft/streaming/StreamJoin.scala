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
}
