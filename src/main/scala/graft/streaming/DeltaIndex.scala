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
  *     a half-written fold);
  *  2. delete the input subdirs;
  *  3. rename the staging dir to `b<id>`.
  *
  * Every moment has a durable on-disk copy of the committed prefix
  * (ADVICE r11: the previous in-place form deleted the inputs while
  * the fold existed only as executor-memory localCheckpoint state — a
  * crash between rm and write lost the whole committed prefix). A
  * crash between 2 and 3 leaves the fold complete-but-hidden;
  * [[rollForward]] finishes the rename at the next compaction OR
  * read, keyed on the `_SUCCESS` marker (an incomplete staging write
  * has none and is rolled back instead). */
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
    * marker whose target `b<id>` is missing is a completed fold that
    * crashed between its input deletes and its rename — rename it
    * now. Any other staging dir is left alone: hidden paths are
    * invisible to readers, an incomplete write (no marker) is
    * overwritten by the next compaction attempt, and deleting
    * eagerly would race an IN-PROGRESS compaction whose inputs still
    * exist. Idempotent — and because [[listBatches]] runs this, a
    * reader that arrives inside the delete→rename window completes
    * the rename itself and sees the folded prefix, never a gap. */
  def rollForward(spark: SparkSession, idxPath: String): Unit = {
    val (fs, dir) = fsOf(spark, idxPath)
    if (!fs.exists(dir)) return
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith(".compact_b")) {
        val target = new Path(s"$idxPath/${n.stripPrefix(".compact_")}")
        if (fs.exists(new Path(st.getPath, "_SUCCESS")) && !fs.exists(target)) {
          fs.rename(st.getPath, target); ()
        }
      }
    }
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
      parts.foreach(p => fs.delete(new Path(p), true))
      fs.rename(staging, new Path(s"$idxPath/b${upTo - 1}"))
      ()
    }
  }
}
