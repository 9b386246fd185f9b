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

  def ifNarrow(df: DataFrame): DataFrame = {
    val np = df.sparkSession.sparkContext.defaultParallelism
    val small =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes <= SmallBytes
      catch { case _: Throwable => false }
    if (small || df.rdd.getNumPartitions < np) df.repartition(np) else df
  }
}
