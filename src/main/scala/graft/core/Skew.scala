package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot grouping keys — the 100 TB posture
  * for aggregations whose key distribution is Zipfian (a handful of
  * keys holding a large fraction of all rows, e.g. the word "the" in a
  * web-scale word count).
  *
  * Two-phase salted aggregation: phase 1 groups on (key, salt) where
  * salt spreads a hot key's rows over `nSalts` reducers; phase 2
  * combines the per-salt partials. For algebraic aggregates this is
  * semantically identical to the direct groupBy (associativity), which
  * the q_wc_salted oracle asserts by reusing q_wc's SQL verbatim.
  *
  * Note Spark already gives two layers of skew defense for free —
  * map-side partial aggregation and AQE skew handling — so salting is
  * the explicit third lever for when a single post-combine key still
  * exceeds one reducer. */
object Skew {

  /** Deterministic salt: spread rows by a hash of the whole row's
    * position-independent content (here: the grouped VALUE column is
    * unavailable post-projection, so salt on a second column `by`). */
  def saltedCount(df: DataFrame, key: Column, by: Column, nSalts: Int = 16): DataFrame =
    df.groupBy(key.as("key"), pmod(xxhash64(by), lit(nSalts)).as("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("cnt"))

  /** Salted sum over a long column. */
  def saltedSum(df: DataFrame, key: Column, value: Column, nSalts: Int = 16): DataFrame =
    df.groupBy(key.as("key"), pmod(xxhash64(value), lit(nSalts)).as("_salt"))
      .agg(sum(value).as("_partial"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("total"))
}
