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
  def ifNarrow(df: DataFrame): DataFrame = {
    val np = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < np) df.repartition(np) else df
  }
}
