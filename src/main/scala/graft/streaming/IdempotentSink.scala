package graft.streaming

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

  /** For use as `.writeStream.foreachBatch(IdempotentSink.appendOnce(dir) _)`. */
  def appendOnce(dir: String)(df: DataFrame, batchId: Long): Unit = {
    val target = new java.io.File(s"$dir/batch=$batchId")
    val committed = new java.io.File(target, "_SUCCESS")
    if (!committed.exists()) {
      df.write.mode("overwrite").parquet(target.toString)
    }
  }
}
