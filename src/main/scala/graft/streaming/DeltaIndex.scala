package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem plumbing for the streaming DELTA-LOG indexes
  * ([[ExactStream]]'s seen-hash index, [[DriftStream]]'s counts
  * index): one `b<id>` parquet subdir per committed micro-batch,
  * listed/compacted through `org.apache.hadoop.fs.FileSystem` — the
  * SAME IO layer Spark reads and writes through — never
  * `java.io.File`. On the 100 TB posture these indexes live on
  * HDFS/S3 where a `java.io.File.listFiles()` returns null and a
  * crawl loop would silently see an EMPTY index (every hash "new",
  * every count "first sighting") — a correctness failure, not a perf
  * one (r11 "What's wrong #1"; every other persisted index here —
  * SemIndex, LshIndex, SpanIndex, IvfIndex — already goes through
  * Spark/Hadoop IO).
  *
  * Also the home of the COMPACTION write protocol both delta logs
  * share (the fold differs — sum vs distinct — the durability rules
  * don't):
  *
  *  1. write the folded frame to `.compact_b<id>` (dot-prefixed:
  *     Spark's file index ignores hidden paths, so readers never see
  *     a half-written fold); the parquet committer's `_SUCCESS`
  *     marker inside the staging dir IS the commit point;
  *  2. delete every input subdir `b<j>` with `j <= id` — by
  *     construction all of them (the fold target id is `upTo - 1`,
  *     itself an input) — then rename the staging dir to `b<id>`.
  *
  * Every moment has a durable on-disk copy of the committed prefix
  * (ADVICE r11: the previous in-place form deleted the inputs while
  * the fold existed only as executor-memory localCheckpoint state — a
  * crash between rm and write lost the whole committed prefix). Step
  * 2 is restart-safe because it is keyed ONLY on the marker, never on
  * which inputs still exist: a crash (or a concurrent reader's
  * [[rollForward]]) at ANY point inside step 2 resumes by deleting
  * whatever `b<j> (j <= id)` remain and renaming (ADVICE r12: the
  * previous form keyed the roll-forward on `!exists(target)`, but the
  * target `b(upTo-1)` is itself an input, so a crash after deleting
  * an EARLIER input left the stale target in place, the guard refused
  * the rename, and readers saw a prefix with a gap). An incomplete
  * staging write has no marker and is simply overwritten by the next
  * compaction attempt. */
object DeltaIndex {

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Batch subdirs `b<id>` with id strictly below `before`, sorted by
    * id, as fully-qualified path strings (empty when the index does
    * not exist yet). Rolls forward any completed-but-unrenamed
    * compaction first, so a reader after a crash sees the folded
    * prefix, not a gap. */
  def listBatches(spark: SparkSession, idxPath: String,
      before: Long = Long.MaxValue): Seq[String] = {
    rollForward(spark, idxPath)
    val (fs, dir) = fsOf(spark, idxPath)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toIndexedSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("b")) n.drop(1).toLongOption
          .filter(_ < before).map(id => (id, st.getPath.toString))
        else None
      }
      .sortBy(_._1).map(_._2)
  }

  /** The staging path of a compaction targeting `b<id>`. */
  private def stagingPath(idxPath: String, id: Long): Path =
    new Path(s"$idxPath/.compact_b$id")

  /** Finish interrupted compactions: a staging dir WITH a `_SUCCESS`
    * marker is a COMMITTED fold whose input deletes and/or rename may
    * not have finished — run [[commitCompaction]] on it now. Any
    * other staging dir is left alone: hidden paths are invisible to
    * readers, and an incomplete write (no marker) is overwritten by
    * the next compaction attempt. Idempotent — and because
    * [[listBatches]] runs this, a reader that arrives inside the
    * delete→rename window completes the commit itself and sees the
    * folded prefix, never a gap (including the partial-delete state
    * where some inputs — possibly the stale target itself — still
    * exist). */
  def rollForward(spark: SparkSession, idxPath: String): Unit = {
    val (fs, dir) = fsOf(spark, idxPath)
    if (!fs.exists(dir)) return
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith(".compact_b")) {
        n.stripPrefix(".compact_b").toLongOption.foreach { id =>
          if (fs.exists(new Path(st.getPath, "_SUCCESS")))
            commitCompaction(fs, idxPath, st.getPath, id)
        }
      }
    }
  }

  /** The commit step shared by [[compact]] and [[rollForward]]: the
    * `_SUCCESS`-marked fold in `staging` supersedes EVERY `b<j>` with
    * `j <= id` (all of them are its inputs by construction — the
    * caller folds the full committed prefix below `id + 1`). Delete
    * them all, then rename the staging dir into place. Keyed only on
    * the marker, so re-running after a crash at any point (some
    * inputs deleted, even the stale target still present) converges
    * to the same end state; the folded copy stays durable in the
    * hidden staging dir until the final rename. */
  private def commitCompaction(fs: FileSystem, idxPath: String,
      staging: Path, id: Long): Unit = {
    fs.listStatus(new Path(idxPath)).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("b")
          && n.drop(1).toLongOption.exists(_ <= id)) {
        fs.delete(st.getPath, true); ()
      }
    }
    fs.rename(staging, new Path(s"$idxPath/b$id"))
    ()
  }

  /** Compact the committed prefix (batch ids strictly below `upTo`)
    * into one subdir `b(upTo-1)` using `fold` (sum for counts,
    * distinct for a seen-key set — any fold the index's read side is
    * invariant under). `upTo` is the caller's committed watermark —
    * never inferred from the directory, because the highest landed
    * subdir may belong to an in-flight batch whose retry overwrites
    * it (folding a partial landing would double-count). Subdirs at or
    * above `upTo` are untouched and keep composing. */
  def compact(spark: SparkSession, idxPath: String, upTo: Long)(
      fold: Seq[String] => org.apache.spark.sql.DataFrame): Unit = {
    val parts = listBatches(spark, idxPath, before = upTo)
    if (parts.length > 1) {
      val (fs, _) = fsOf(spark, idxPath)
      val staging = stagingPath(idxPath, upTo - 1)
      fold(parts).write.mode("overwrite").parquet(staging.toString)
      commitCompaction(fs, idxPath, staging, upTo - 1)
    }
  }
}
