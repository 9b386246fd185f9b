package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Exactly-once effective output under re-delivery — the engine
  * guarantee the reference probes with `jobcount` (exactly 8 effective
  * map executions, `src/mrapps/jobcount.go`) and `early_exit` (output
  * never visible before commit, `src/main/test-mr.sh:227-282`).
  *
  * Batch Spark gets both from the FileOutputCommitter (temp + rename,
  * like the reference's `os.Rename` at `src/mr/worker.go:150-163`).
  * Streaming `foreachBatch` is at-least-once per micro-batch, so the
  * sink must be idempotent BY BATCH ID — the standard pattern wrapped
  * here: each batch lands in `dir/batch=<id>` exactly once; replays of
  * a committed batch are no-ops. */
object IdempotentSink {

  /** For use as `.writeStream.foreachBatch(IdempotentSink.appendOnce(dir) _)`.
    *
    * The commit probe resolves `dir` through the Hadoop FileSystem API,
    * so the guard holds on HDFS/S3A/GCS paths, not just the driver's
    * local disk. Concurrency: Spark runs foreachBatch for a given
    * query serially (one micro-batch at a time) and replays a batch id
    * only after failure recovery, so check-then-write is not racy
    * within a query; two INDEPENDENT queries pointed at the same dir
    * are a caller error (same as two jobs sharing an output path). */
  def appendOnce(dir: String)(df: DataFrame, batchId: Long): Unit = {
    val target = new Path(s"$dir/batch=$batchId")
    val fs = target.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    if (!fs.exists(new Path(target, "_SUCCESS"))) {
      df.write.mode("overwrite").parquet(target.toString)
    }
  }
}
