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
  def zValue(x: Column, y: Column, bits: Int = 21): Column =
    zValueN(Seq(x, y), bits)

  /** N-dimensional Morton interleave: bit `i` of column `j` lands at
    * position `i·N + j`. `N·bits` must fit a signed long (≤ 63) —
    * 3 columns at the default 21 bits exactly fills it; more columns
    * trade per-column resolution (e.g. 6 cols × 10 bits), which is the
    * right trade anyway: beyond ~4 dims every curve's box quality
    * degrades and coarse bits carry all the pruning power. Built from
    * shift/AND/OR column expressions — stays in whole-stage codegen. */
  def zValueN(cols: Seq[Column], bits: Int = 21): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"${cols.size} cols × $bits bits exceeds a signed long")
    val n = cols.size
    cols.zipWithIndex.foldLeft(lit(0L)) { case (acc, (c, j)) =>
      val cl = c.cast("long")
      (0 until bits).foldLeft(acc) { (a, i) =>
        a.bitwiseOR(shiftleft(shiftrightunsigned(cl, i).bitwiseAND(lit(1L)), n * i + j))
      }
    }
  }

  /** Hilbert-curve key of two non-negative int-ish columns — tighter
    * file envelopes than [[zValue]] on box workloads (no Z-diagonal
    * jumps); measured against Z in LayoutCurveSpec. */
  def hilbertValue(x: Column, y: Column, order: Int = 21): Column = {
    import org.apache.spark.sql.graftbridge.bridge
    bridge.column(HilbertIndex(
      bridge.expression(x.cast("long")), bridge.expression(y.cast("long")), order))
  }

  /** N-dimensional Hilbert key (Skilling transform) — the
    * locality-preserving alternative to [[zValueN]] for 3+ clustering
    * columns; `N·bits ≤ 63`. */
  def hilbertValueN(cols: Seq[Column], bits: Int = 21): Column = {
    import org.apache.spark.sql.graftbridge.bridge
    bridge.column(HilbertNIndex(
      cols.map(c => bridge.expression(c.cast("long"))), bits))
  }

  /** Cluster `df` into `numFiles` files ordered by an arbitrary curve
    * key; the key is dropped before the write (pruning works off the
    * data columns' own min/max stats — no reader cooperation). */
  def writeKeyClustered(df: DataFrame, key: Column, outPath: String,
      numFiles: Int): Unit =
    df.withColumn("_ck", key)
      .repartitionByRange(numFiles, col("_ck"))
      .sortWithinPartitions(col("_ck"))
      .drop("_ck")
      .write.mode("overwrite").parquet(outPath)

  /** Cluster `df` into `numFiles` files z-ordered on (x, y). */
  def writeZOrdered(df: DataFrame, x: String, y: String, outPath: String,
      numFiles: Int): Unit =
    writeKeyClustered(df, zValue(col(x), col(y)), outPath, numFiles)

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

  /** Per-file (min, max) envelopes over ANY column set — the N-dim
    * generalization of [[fileEnvelopes]]. envelope(f)(j) = (min, max)
    * of column j in file f. */
  def fileEnvelopesN(df: DataFrame, cols: Seq[String]): Array[Array[(Long, Long)]] =
    df.groupBy(input_file_name())
      .agg(min(col(cols.head)).cast("long"), (max(col(cols.head)).cast("long") +:
        cols.tail.flatMap(c => Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))): _*)
      .collect()
      .map(r => cols.indices.map(j => (r.getLong(1 + 2 * j), r.getLong(2 + 2 * j))).toArray)

  /** How many files a min/max pruner must read for an N-dim box. */
  def filesTouchedN(envs: Array[Array[(Long, Long)]], box: Seq[(Long, Long)]): Int =
    envs.count(env => env.zip(box).forall { case ((lo, hi), (qLo, qHi)) =>
      hi >= qLo && lo <= qHi
    })
}
