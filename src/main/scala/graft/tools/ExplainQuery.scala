package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a registered query's EXECUTED physical plan (AQE final, so
  * coalesced/replanned exchanges show as they actually ran) — the
  * plan-audit companion to Bench's fingerprint: when a fingerprint
  * drifts or a stage runs narrower than expected, this shows why.
  * Usage: runMain graft.tools.ExplainQuery <query> [sfDir]. Not a
  * gate; not registered. */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the same per-stage dump Bench offers behind
    // SPARK_GRAFT_STAGE_DEBUG, always on here: stage widths and the
    // plan must come from ONE execution to correlate
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime}
          yield c - s).getOrElse(-1L)
        System.err.println(f"[stage] id=${i.stageId}%-4d wall=${wall}%6dms " +
          f"planned=${i.numTasks}%4d " +
          s"rdds=${i.rddInfos.map(_.name).filter(_ != null).distinct.mkString("|").take(110)}")
      }
    })
    // SPARK_GRAFT_EXPLAIN_WARMUP=1 replicates the bench's prelude
    // (q_wc noop save + cache clear + GC) to chase state-dependent
    // AQE decisions
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN_WARMUP")) {
      graft.SparkEntry.queries("q_wc")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(150)
    }
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    // drive THIS QueryExecution (df.count()/df.write would plan
    // their own): executing the plan's RDD directly finalizes AQE in
    // place, so the print below shows the real AQEShuffleRead /
    // replanned exchanges. SPARK_GRAFT_EXPLAIN_NOOP=1 instead drives
    // the bench's exact path (noop V2 write) — the write plans its
    // own QueryExecution, so the printed plan is then only the
    // pre-execution shape, but the [stage] lines show what really ran
    val n =
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN_NOOP")) {
        df.write.mode("overwrite").format("noop").save(); -1L
      } else df.queryExecution.executedPlan.execute().count()
    println(s"=== $name executed plan (AQE final; count=$n) ===")
    println(s"fingerprint=${graft.core.PlanFingerprint.of(df)}")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
