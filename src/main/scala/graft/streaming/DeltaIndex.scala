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
  *     marker inside the staging dir IS the durability point;
  *  2. atomically rename the staging dir to `c<id>` ("compacted
  *     through id" — a namespace DISJOINT from the raw `b<j>`
  *     landings, so the rename never collides with an input). The
  *     rename IS the commit: filesystem rename is atomic on
  *     HDFS/local (and the object-store committers emulate it), so
  *     exactly ONE actor's rename succeeds — every racer sees
  *     `false` and skips to cleanup;
  *  3. cleanup: delete every superseded dir — `b<j>` with `j <= id`
  *     and `c<j>` with `j < id`. Cleanup NEVER touches `c<id>`
  *     itself, so a lagging racer replaying this step cannot destroy
  *     the live fold.
  *
  * Readers resolve the directory as: the HIGHEST `c<id>` (if any)
  * plus every `b<j>` with `j > id` — superseded dirs that a crashed
  * cleanup left behind are ignored, and the next compaction's
  * cleanup removes them. Every moment has a durable on-disk copy of
  * the committed prefix (ADVICE r11: the original in-place form
  * deleted the inputs while the fold existed only as
  * executor-memory localCheckpoint state), and the commit is
  * SINGLE-WINNER (ADVICE r13: the previous delete-then-rename form —
  * fold renamed to `b<id>`, an input's own name — let a lagging
  * concurrent roll-forward delete the freshly renamed fold as "input
  * j <= id" and then silently fail its own rename, losing the whole
  * committed prefix; with the rename-first `c<id>` scheme there is
  * no window in which the only copy of the fold has a deletable
  * name). An incomplete staging write has no marker and is simply
  * overwritten by the next compaction attempt. */
object DeltaIndex {

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The committed log with ids strictly below `before`, sorted by
    * id, as fully-qualified path strings (empty when the index does
    * not exist yet): the highest compacted fold `c<id>` (if any)
    * followed by the raw batch subdirs `b<j>` above it. Rolls
    * forward any completed-but-unrenamed compaction first, so a
    * reader after a crash sees the folded prefix, not a gap. */
  def listBatches(spark: SparkSession, idxPath: String,
      before: Long = Long.MaxValue): Seq[String] = {
    rollForward(spark, idxPath)
    val (fs, dir) = fsOf(spark, idxPath)
    if (!fs.exists(dir)) return Seq.empty
    val entries = fs.listStatus(dir).toIndexedSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if ((n.startsWith("b") || n.startsWith("c")))
          n.drop(1).toLongOption.filter(_ < before)
            .map(id => (n.head, id, st.getPath.toString))
        else None
      }
    val cMax = entries.collect { case ('c', id, _) => id } match {
      case s if s.isEmpty => -1L
      case s => s.max
    }
    entries
      .filter { case (kind, id, _) =>
        if (kind == 'c') id == cMax else id > cMax
      }
      .sortBy(_._2).map(_._3)
  }

  /** The staging path of a compaction targeting `c<id>`. */
  private def stagingPath(idxPath: String, id: Long): Path =
    new Path(s"$idxPath/.compact_b$id")

  /** Finish interrupted compactions: a staging dir WITH a `_SUCCESS`
    * marker is a DURABLE fold whose commit rename and/or cleanup may
    * not have finished — run [[commitCompaction]] on it now. Any
    * other staging dir is left alone: hidden paths are invisible to
    * readers, and an incomplete write (no marker) is overwritten by
    * the next compaction attempt. Idempotent and race-safe — because
    * [[listBatches]] runs this, a reader that arrives inside the
    * rename→cleanup window completes the commit itself and sees the
    * folded prefix, never a gap. */
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
    * `_SUCCESS`-marked fold in `staging` supersedes every `b<j>` with
    * `j <= id` and every `c<j>` with `j < id` (all of them are its
    * inputs by construction — the caller folds the full committed
    * prefix below `id + 1`). Step 1, the atomic rename to `c<id>`,
    * is the SINGLE-WINNER commit: when two actors race (a compactor
    * plus a reader's roll-forward, or two readers), exactly one
    * rename succeeds — the others observe `false` (source already
    * gone) and fall through to the cleanup, which is idempotent and
    * by construction never deletes `c<id>` itself, so no interleaving
    * can destroy the committed fold (ADVICE r13; raced deliberately
    * in DriftStreamSpec). `private[streaming]` so the spec can drive
    * the lagging-committer interleaving deterministically. */
  private[streaming] def commitCompaction(fs: FileSystem, idxPath: String,
      staging: Path, id: Long): Unit = {
    val target = new Path(s"$idxPath/c$id")
    // a lost race surfaces as either `false` (HDFS contract) or
    // FileNotFoundException on the vanished source (RawLocalFileSystem)
    val won = try fs.rename(staging, target) catch {
      case _: java.io.FileNotFoundException => false
    }
    if (won || fs.exists(target)) {
      fs.listStatus(new Path(idxPath)).foreach { st =>
        val n = st.getPath.getName
        val superseded = st.isDirectory && (
          (n.startsWith("b") && n.drop(1).toLongOption.exists(_ <= id)) ||
          (n.startsWith("c") && n.drop(1).toLongOption.exists(_ < id)))
        if (superseded) { fs.delete(st.getPath, true); () }
      }
    }
  }

  /** Compact the committed prefix (batch ids strictly below `upTo`)
    * into one fold `c(upTo-1)` using `fold` (sum for counts,
    * distinct for a seen-key set — any fold the index's read side is
    * invariant under; its inputs may include the previous fold).
    * `upTo` is the caller's committed watermark — never inferred
    * from the directory, because the highest landed subdir may
    * belong to an in-flight batch whose retry overwrites it (folding
    * a partial landing would double-count). Subdirs at or above
    * `upTo` are untouched and keep composing. */
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
