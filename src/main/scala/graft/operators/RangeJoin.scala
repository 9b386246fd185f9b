package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join: join points to (possibly overlapping) intervals
  * WITHOUT an equi key. Spark plans a pure inequality join as a
  * broadcast-nested-loop — O(|points|·|ranges|) compares, the classic
  * 100 TB cliff. The standard fix (used by every interval-join engine)
  * is binning: quantize the domain into fixed-width bins, replicate
  * each interval into every bin it overlaps, map each point to its
  * single bin, hash-join on the bin id, and re-check the exact
  * predicate. Cost drops to O(|points| + Σ interval-spans) with an
  * ordinary shuffled (or broadcast) hash join that AQE can manage like
  * any other.
  *
  * `binWidth` trades replication (wide intervals span many bins)
  * against selectivity (huge bins approach the nested loop); set it
  * near the median interval width so most intervals land in 1-2 bins.
  */
object RangeJoin {

  /** Join `points` to `ranges` on `lo <= pt < hi` (half-open).
    *
    * @param points   point-side rows; `pt` names an integral column
    * @param ranges   interval-side rows (expected the small side; at
    *                 extreme interval counts, swap roles); `lo`/`hi`
    *                 name integral bound columns
    * @param binWidth bin quantum, same unit as `pt` — `div` integer
    *                 arithmetic, so bounds beyond 2^53 stay exact
    */
  def binned(points: DataFrame, pt: String, ranges: DataFrame,
      lo: String, hi: String, binWidth: Long): DataFrame = {
    val binnedRanges = ranges.select(col("*"),
      explode(expr(s"sequence(`$lo` div $binWidth, (`$hi` - 1) div $binWidth)"))
        .as("__bin"))
    val binnedPoints = points.select(col("*"), expr(s"`$pt` div $binWidth").as("__bin"))
    // each point lives in exactly one bin and an interval appears at
    // most once per bin → no post-join dedup needed
    binnedPoints.join(binnedRanges, "__bin")
      .filter(col(pt) >= col(lo) && col(pt) < col(hi))
      .drop("__bin")
  }
}
