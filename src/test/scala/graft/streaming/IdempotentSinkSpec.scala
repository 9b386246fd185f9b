package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class IdempotentSinkSpec extends SparkSpec {

  test("replayed batches write exactly once (jobcount analogue)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val df = Seq(1L, 2L, 3L).toDF("v")
    IdempotentSink.appendOnce(dir)(df, batchId = 0L)
    val firstMtime = new java.io.File(s"$dir/batch=0/_SUCCESS").lastModified()
    // re-delivery of the same batch (restart replay): must be a no-op
    IdempotentSink.appendOnce(dir)(df.withColumn("v", $"v" * 100), batchId = 0L)
    assert(new java.io.File(s"$dir/batch=0/_SUCCESS").lastModified() === firstMtime)
    val back = spark.read.parquet(s"$dir/batch=0").as[Long].collect().sorted
    assert(back.toSeq === Seq(1L, 2L, 3L), "replay must not overwrite committed output")
  }

  test("streaming pipeline through the sink produces complete, unduplicated output") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink2").toString
    val input = MemoryStream[Long]
    val q = input.toDS().toDF("v")
      .writeStream.foreachBatch(IdempotentSink.appendOnce(dir) _)
      .start()
    try {
      input.addData(1L to 10L)
      q.processAllAvailable()
      input.addData(11L to 20L)
      q.processAllAvailable()
      val all = spark.read.parquet(s"$dir/batch=*").as[Long].collect().sorted
      assert(all.toSeq === (1L to 20L))
    } finally q.stop()
  }
}
