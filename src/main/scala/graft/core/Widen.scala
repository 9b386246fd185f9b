package graft.core

import org.apache.spark.sql.DataFrame

/** Scale-adaptive width for heavy map stages over narrow inputs.
  *
  * Gate-scale pathology (r17 stage audits): a small materialized
  * frame — a 1-file parquet scan or a [[Materialize]]/localCheckpoint
  * output — arrives with 1-2 partitions, and any EXPENSIVE map over
  * it (q-gram witness generation, simhash probe explode, image
  * decode) runs 1-2 wide while 30 cores idle. The measured shape is
  * always the same: a stage with task_max ≈ task_sum ≈ wall.
  *
  * [[ifNarrow]] repartitions (round-robin, explicit numPartitions so
  * AQE keeps the width) ONLY when the input is narrower than the
  * cluster's default parallelism. At production scale — many files,
  * many row groups, wide shuffles — the input is already wide and
  * this is a structural no-op: the full-corpus shuffle is never paid
  * where it would hurt. The check reads the plan's partitioning
  * (`df.rdd.getNumPartitions`), not data, so it costs planning time
  * only. */
object Widen {

  /** Inputs below this planner-estimated size are ALWAYS widened: a
    * shuffle of ≤ 64 MB is sub-second, and the partition-count check
    * alone is blind to the single-row-group case — Spark plans a
    * small one-row-group parquet file as np BYTE-RANGE splits, but
    * every row lands in the one split holding the row group's start,
    * so the frame LOOKS wide and runs serial. Plan statistics
    * (file bytes for scans) see through that; frames whose stats are
    * unknown (LogicalRDD defaults to huge) fall back to the honest
    * partition count. */
  val SmallBytes: Long = 64L << 20

  /** Row floor for [[ifNarrow]]'s `minRows`: below this, widening a
    * frame whose DOWNSTREAM maps are cheap costs more than it buys —
    * the r17 series showed the sub-second mm_*_dedup keys paying
    * +0.8–1.0 s for widened signature frames of ~1.7 k rows whose
    * banding/probe maps take milliseconds (r18 stage audit: each
    * post-widen 32-task stage carries a uniform ~0.3–0.9 s/task fixed
    * overhead — scheduling + checkpoint-block fan-out — replicated
    * across every consumer stage). Callers whose downstream compute
    * is heavy PER ROW (pixel decode, q-gram explode, 697-mask probes)
    * must NOT pass a floor: 5 k rows × 20 ms/row is 100 s of serial
    * work that 32 cores should share. */
  val TinyRows: Long = 10000L

  def ifNarrow(df: DataFrame): DataFrame = ifNarrow(df, 0L)

  /** As [[ifNarrow]], but when `minRows > 0` a frame that WOULD be
    * widened is first counted and left alone below the floor — tiny
    * frames with cheap downstream maps can't use the width and the
    * round-robin exchange is pure fixed cost. The count only runs on
    * the already-narrow/small branch (one job over 1-2 partitions —
    * at the call sites that pass a floor the frame is a materialized
    * checkpoint, so the count is a block scan, not a recompute); the
    * production-scale wide branch stays zero-cost. */
  def ifNarrow(df: DataFrame, minRows: Long): DataFrame = {
    val np = df.sparkSession.sparkContext.defaultParallelism
    val small = probeSmall(df.queryExecution.optimizedPlan.stats.sizeInBytes)
    if (small || df.rdd.getNumPartitions < np) {
      if (minRows > 0 && df.count() < minRows) df else df.repartition(np)
    } else df
  }

  /** The stats probe's error contract, isolated so a spec can pin it:
    * stats are best-effort — any NON-fatal planning failure reads as
    * "not small" and the partition-count check decides alone — but a
    * fatal error (OutOfMemoryError, interrupt) must PROPAGATE, not be
    * silently misread as a size verdict (r17 ADVICE). */
  private[core] def probeSmall(sizeInBytes: => BigInt): Boolean =
    try sizeInBytes <= SmallBytes
    catch { case scala.util.control.NonFatal(_) => false }
}
