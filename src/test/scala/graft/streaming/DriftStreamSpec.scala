package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming source-drift monitor: additive per-batch counts must
  * make the monitor's report equal the one-shot report — for the
  * gate's ordered replay, under foreachBatch, at any batch-count
  * decomposition, at mid-stream prefixes, and under batch retry. */
class DriftStreamSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_driftstream_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def rows(df: DataFrame): Set[(String, Long, String, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet

  test("gate replay equals the one-shot report at 2 and 4 batches") {
    val oneShot = rows(graft.text.TextAnalysis.sourceDrift(spark, sf()))
    assert(rows(DriftStream.sourceDriftStream(spark, sf(), nBatches = 4))
      === oneShot)
    assert(rows(DriftStream.sourceDriftStream(spark, sf(), nBatches = 2))
      === oneShot)
    assert(oneShot.nonEmpty)
  }

  test("mid-stream prefix report equals the one-shot over that prefix; retry is idempotent") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val step = maxId / 4 + 1
    val idxPath = tmp("prefix")
    (0 until 4).foreach { b =>
      DriftStream.countBatch(spark, idxPath, b.toLong,
        docs.filter(col("doc_id") >= b * step && col("doc_id") < (b + 1) * step))
    }
    // report over the committed prefix b<2 == one-shot over those docs
    val prefixReport = rows(DriftStream.reportSoFar(spark, idxPath, before = 2L))
    val prefixOneShot = rows(graft.text.TextAnalysis.driftReport(
      graft.text.TextAnalysis.sourceTokenCounts(
        docs.filter(col("doc_id") < 2 * step))))
    assert(prefixReport === prefixOneShot)
    // retried batch overwrites with identical content: full report stable
    val full = rows(DriftStream.reportSoFar(spark, idxPath))
    DriftStream.countBatch(spark, idxPath, 1L,
      docs.filter(col("doc_id") >= step && col("doc_id") < 2 * step))
    assert(rows(DriftStream.reportSoFar(spark, idxPath)) === full)
  }

  test("foreachBatch drive equals the one-shot report") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id", "source", "text").as[(Long, String, String)]
      .collect().sortBy(_._1)
    val idxPath = tmp("fb")
    val input = MemoryStream[(Long, String, String)]
    val q = input.toDS().toDF("doc_id", "source", "text").writeStream
      .foreachBatch { (ds: DataFrame, bid: Long) =>
        DriftStream.countBatch(spark, idxPath, bid, ds)
        ()
      }.start()
    try {
      docs.grouped(170).foreach { g =>
        input.addData(g.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    assert(rows(DriftStream.reportSoFar(spark, idxPath))
      === rows(graft.text.TextAnalysis.sourceDrift(spark, sf())))
  }

  test("compaction: report invariant, later batches append above it") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val step = maxId / 4 + 1
    val idxPath = tmp("compact")
    (0 until 3).foreach { b =>
      DriftStream.countBatch(spark, idxPath, b.toLong,
        docs.filter(col("doc_id") >= b * step && col("doc_id") < (b + 1) * step))
    }
    val before = rows(DriftStream.reportSoFar(spark, idxPath))
    // compact the COMMITTED prefix b0..b1; b2 may still be in flight
    DriftStream.compact(spark, idxPath, upTo = 2L)
    val subdirs = new java.io.File(idxPath).listFiles()
      .filter(f => f.isDirectory && !f.getName.startsWith("."))
      .map(_.getName).sorted
    assert(subdirs.toSeq === Seq("b2", "c1"),
      "compaction folds the committed prefix into c(upTo-1), leaving b2")
    assert(rows(DriftStream.reportSoFar(spark, idxPath)) === before)
    // a RETRY of the in-flight batch 2 after compaction stays exact
    DriftStream.countBatch(spark, idxPath, 2L,
      docs.filter(col("doc_id") >= 2 * step && col("doc_id") < 3 * step))
    assert(rows(DriftStream.reportSoFar(spark, idxPath)) === before)
    // the remaining batch lands above and composes
    DriftStream.countBatch(spark, idxPath, 3L,
      docs.filter(col("doc_id") >= 3 * step))
    assert(rows(DriftStream.reportSoFar(spark, idxPath))
      === rows(graft.text.TextAnalysis.sourceDrift(spark, sf())))
  }

  test("compact-gate surface equals the one-shot report; 2-batch edge works") {
    val oneShot = rows(graft.text.TextAnalysis.sourceDrift(spark, sf()))
    assert(rows(DriftStream.sourceDriftCompactStream(spark, sf())) === oneShot)
    assert(rows(DriftStream.sourceDriftCompactStream(spark, sf(), nBatches = 2))
      === oneShot)
  }

  test("empty corpus: report is empty, not a throw") {
    val idxPath = tmp("empty")
    assert(DriftStream.reportSoFar(spark, idxPath).collect().isEmpty)
  }

  test("scheme-qualified index path: the whole cycle runs through Hadoop FS") {
    // `file://`-prefixed paths resolve ONLY through the Hadoop
    // FileSystem API (java.io.File would treat the URI as a relative
    // path and list nothing) — the r11 port's proof that the index
    // works where it actually lives at 100 TB (HDFS/S3: any
    // non-local scheme resolves the same way)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val step = maxId / 3 + 1
    val idxPath = s"file://${tmp("scheme")}"
    (0 until 3).foreach { b =>
      DriftStream.countBatch(spark, idxPath, b.toLong,
        docs.filter(col("doc_id") >= b * step && col("doc_id") < (b + 1) * step))
    }
    DriftStream.compact(spark, idxPath, upTo = 2L)
    assert(rows(DriftStream.reportSoFar(spark, idxPath))
      === rows(graft.text.TextAnalysis.sourceDrift(spark, sf())))
  }

  test("compaction crash between input deletes and rename rolls forward at the next read") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val step = maxId / 3 + 1
    val idxPath = tmp("crash")
    (0 until 3).foreach { b =>
      DriftStream.countBatch(spark, idxPath, b.toLong,
        docs.filter(col("doc_id") >= b * step && col("doc_id") < (b + 1) * step))
    }
    val before = rows(DriftStream.reportSoFar(spark, idxPath))
    // reproduce the exact crash state: the fold landed in the hidden
    // staging dir (complete, _SUCCESS-marked), the inputs were
    // deleted, and the process died BEFORE the rename
    DriftStream.readCounts(spark, idxPath, before = 2L)
      .write.mode("overwrite").parquet(s"$idxPath/.compact_b1")
    Seq("b0", "b1").foreach { n =>
      val f = new java.io.File(idxPath, n)
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
        x.delete(); ()
      }
      rm(f)
    }
    // a plain read must roll the completed fold forward — full
    // counts, never a gap (the previous in-place compact LOST the
    // prefix here)
    assert(rows(DriftStream.reportSoFar(spark, idxPath)) === before)
    val subdirs = new java.io.File(idxPath).listFiles()
      .filter(f => f.isDirectory && !f.getName.startsWith("."))
      .map(_.getName).sorted
    assert(subdirs.toSeq === Seq("b2", "c1"),
      "the staged fold must have been renamed into place")
  }

  test("compaction crash mid-delete (stale target still present) rolls forward, never a gap") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val step = maxId / 3 + 1
    val idxPath = tmp("middelete")
    (0 until 3).foreach { b =>
      DriftStream.countBatch(spark, idxPath, b.toLong,
        docs.filter(col("doc_id") >= b * step && col("doc_id") < (b + 1) * step))
    }
    val before = rows(DriftStream.reportSoFar(spark, idxPath))
    // reproduce the ADVICE-r12 crash state: the fold committed
    // (_SUCCESS in staging), the delete loop removed b0 only, and the
    // process died with the STALE TARGET b1 still on disk — the old
    // !exists(target) guard refused the rename here and readers saw a
    // prefix missing b0's counts
    DriftStream.readCounts(spark, idxPath, before = 2L)
      .write.mode("overwrite").parquet(s"$idxPath/.compact_b1")
    locally {
      val f = new java.io.File(idxPath, "b0")
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
        x.delete(); ()
      }
      rm(f)
    }
    assert(rows(DriftStream.reportSoFar(spark, idxPath)) === before,
      "roll-forward must supersede the stale input, not refuse the commit")
    val subdirs = new java.io.File(idxPath).listFiles()
      .filter(f => f.isDirectory && !f.getName.startsWith("."))
      .map(_.getName).sorted
    assert(subdirs.toSeq === Seq("b2", "c1"),
      "the staged fold must have superseded and removed the stale b1")
  }

  test("commit race (ADVICE r13): a lagging committer after a completed commit cannot destroy the fold") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val step = maxId / 3 + 1
    val idxPath = tmp("race")
    (0 until 3).foreach { b =>
      DriftStream.countBatch(spark, idxPath, b.toLong,
        docs.filter(col("doc_id") >= b * step && col("doc_id") < (b + 1) * step))
    }
    val before = rows(DriftStream.reportSoFar(spark, idxPath))
    // stage a durable fold of b0..b1 (the pre-commit state both
    // racers observed: staging exists, _SUCCESS present)
    DriftStream.readCounts(spark, idxPath, before = 2L)
      .write.mode("overwrite").parquet(s"$idxPath/.compact_b1")
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(s"$idxPath/.compact_b1")
    // racer A wins: full commit (rename to c1 + cleanup of b0, b1)
    DeltaIndex.commitCompaction(fs, idxPath, staging, 1L)
    assert(new java.io.File(idxPath, "c1").isDirectory)
    // racer B lags: it saw the _SUCCESS-marked staging BEFORE A's
    // commit and replays the whole commit step now. Under the old
    // delete-then-rename-to-b1 protocol this deleted A's freshly
    // renamed fold (j <= id) and then silently failed its own rename
    // — the committed prefix was lost. The single-winner rename must
    // make this a harmless cleanup replay.
    DeltaIndex.commitCompaction(fs, idxPath, staging, 1L)
    assert(new java.io.File(idxPath, "c1").isDirectory,
      "a lagging committer must never delete the live fold")
    assert(rows(DriftStream.reportSoFar(spark, idxPath)) === before,
      "the committed prefix survives the raced commit intact")
  }
}
