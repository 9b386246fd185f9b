package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering so that
  * BOX predicates over several columns prune files/row-groups by
  * min-max statistics — the write-side half of predicate pushdown.
  *
  * A 100 TB table laid out in ingest order answers
  * `user BETWEEN a AND b AND day BETWEEN c AND d` by scanning
  * everything: every file spans the whole user range. Range-
  * partitioning by ONE column prunes only that column. Interleaving
  * the bits of both columns gives a single sort key whose contiguous
  * ranges are (approximate) boxes — after `repartitionByRange +
  * sortWithinPartitions` on the z-value, each parquet file covers a
  * small rectangle, and any engine's plain min/max stats pruning
  * (Spark row-group skipping included) drops the rest. No reader
  * cooperation is needed: the z-value never even has to be stored.
  *
  * The interleave is built from shift/AND/OR column expressions, so
  * it stays inside whole-stage codegen.
  */
object Layout {

  /** Morton interleave of two non-negative int-ish columns
    * (`bits` low bits each, default 21 → fits one signed long). */
  def zValue(x: Column, y: Column, bits: Int = 21): Column = {
    val xs = x.cast("long"); val ys = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(xs, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftrightunsigned(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Cluster `df` into `numFiles` files z-ordered on (x, y); the sort
    * key is dropped before the write (pruning works off the data
    * columns' own min/max stats). */
  def writeZOrdered(df: DataFrame, x: String, y: String, outPath: String,
      numFiles: Int): Unit =
    df.withColumn("_z", zValue(col(x), col(y)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(outPath)

  /** Compact a directory of small parquet files (the residue of
    * micro-batched streaming sinks) into ~`targetFileBytes` files,
    * optionally sorted so min/max pruning survives compaction. At
    * scale this is the maintenance job that keeps file counts —
    * and thus driver planning time and open-file pressure — bounded:
    * a day of 1-minute micro-batches is 1440 directories of
    * partition-count files each; compaction folds them into
    * size-targeted files in one job.
    *
    * Reads the CURRENT total size from the file index (no extra
    * pass), writes to `outPath`, returns (filesBefore, filesAfter). */
  def compact(df: DataFrame, outPath: String, targetFileBytes: Long,
      sortCols: Seq[String] = Nil): (Int, Int) = {
    val spark = df.sparkSession
    val files = df.inputFiles
    val totalBytes = {
      val conf = spark.sessionState.newHadoopConf()
      files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(conf).getFileStatus(p).getLen
      }.sum
    }
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val laid =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nOut, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nOut)
    laid.write.mode("overwrite").parquet(outPath)
    (files.length, spark.read.parquet(outPath).inputFiles.length)
  }

  /** Per-file (min, max) envelopes of two columns — the statistics a
    * stats-based pruner consults; used to MEASURE layout quality. */
  def fileEnvelopes(df: DataFrame, x: String, y: String): Array[(Long, Long, Long, Long)] =
    df.groupBy(input_file_name())
      .agg(min(col(x)).cast("long"), max(col(x)).cast("long"),
        min(col(y)).cast("long"), max(col(y)).cast("long"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  /** How many files a min/max pruner must read for a box query. */
  def filesTouched(envs: Array[(Long, Long, Long, Long)],
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): Int =
    envs.count { case (x0, x1, y0, y1) =>
      x1 >= xLo && x0 <= xHi && y1 >= yLo && y0 <= yHi
    }
}
