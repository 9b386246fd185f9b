package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Count-Min sketch over a string stream — the mergeable-sketch
  * aggregation pattern that makes frequency queries feasible at
  * 100 TB: the full aggregation state is `depth × width` longs
  * (a few KB) regardless of corpus size, partial sketches combine
  * by elementwise addition (map-side combine does most of the work),
  * and the merged sketch answers any point query with
  * `true ≤ est ≤ true + εN` where ε = e/width.
  *
  * Deterministic by construction (fixed seeded hash family), so the
  * same corpus always yields the same sketch on any cluster layout.
  */
object CountMin {

  val Depth = 4
  val Width = 1024

  private[functions] def cell(row: Int, s: String): Int = {
    val h = MurmurHash3.stringHash(s, 0x9747b28c + row * 0x5bd1e995)
    java.lang.Math.floorMod(h, Width)
  }

  /** Typed Aggregator: BUF = flattened depth×width counter matrix.
    * Usable as a column aggregate via `udaf(CountMin.sketchAgg)`. */
  val sketchAgg: Aggregator[String, Array[Long], Array[Long]] =
    new Aggregator[String, Array[Long], Array[Long]] {
      def zero: Array[Long] = new Array[Long](Depth * Width)
      def reduce(b: Array[Long], s: String): Array[Long] = {
        var r = 0
        while (r < Depth) { b(r * Width + cell(r, s)) += 1L; r += 1 }
        b
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      def finish(b: Array[Long]): Array[Long] = b
      def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }

  /** Point estimate from a finished sketch. */
  def estimate(sketch: Array[Long], s: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val v = sketch(r * Width + cell(r, s))
      if (v < best) best = v
      r += 1
    }
    best
  }

  /** Corpus word-frequency sketch + estimates for every distinct word
    * (the heavy-hitter surface; q_wc is the exact twin). One pass
    * builds the sketch (constant-size state), a second maps the
    * distinct-word table through the broadcast sketch. */
  def wordEstimates(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val words = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(expr(
        "filter(split(lower(text), '[^\\\\p{L}]+'), x -> x != '')")).as("word"))
      .as[String]
    val cms = udaf(sketchAgg)
    val sketch = words.select(cms(col("word")))
      .head().getAs[Seq[Long]](0).toArray
    val bc = spark.sparkContext.broadcast(sketch)
    words.distinct()
      .map(w => (w, estimate(bc.value, w)))
      .toDF("word", "est")
  }
}
